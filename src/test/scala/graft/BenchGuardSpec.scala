package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the contention guard's retry SELECTION (VERDICT r15 #1) —
  * pure functions, no Spark session. The r15 artifact was corrupted by
  * sweep-order retry caps: 39 queries flagged, the caps filled on early
  * cheap ones, and the three largest excursions were recorded from a
  * single contended attempt. These pins make that shape impossible:
  * retries go to the worst excess first, and nothing can land in `regr`
  * with a single-element attempt array. */
class BenchGuardSpec extends AnyFunSuite {

  private val thr: String => Double = Map(
    "tiny" -> 1.0, "mid" -> 5.0, "big" -> 10.0, "huge" -> 10.0, "clean" -> 4.0)
    .withDefaultValue(4.0)

  test("retryOrder sorts flagged queries by excess over threshold, descending") {
    // sweep order is alphabetical-ish and adversarial: the biggest
    // excursion ("huge", excess 42) arrives LAST — under the r15 code a
    // take(2) would have selected tiny+mid and starved it
    val results = scala.collection.mutable.LinkedHashMap(
      "tiny" -> 2.5,   // excess 1.5
      "mid"  -> 9.0,   // excess 4.0
      "clean" -> 3.0,  // under threshold
      "big"  -> 22.0,  // excess 12.0
      "huge" -> 52.0)  // excess 42.0
    val order = Bench.retryOrder(results, thr)
    assert(order == Seq("huge", "big", "mid", "tiny"))
    // under ANY cap the largest excursions are the ones retried
    assert(order.take(2) == Seq("huge", "big"))
  }

  test("retryOrder never flags failures or under-threshold queries") {
    val results = scala.collection.mutable.LinkedHashMap(
      "broken" -> -1.0, "clean" -> 3.9, "edge" -> 4.0)
    // -1 failures and exact-threshold values do not flag
    assert(Bench.retryOrder(results, thr).isEmpty)
  }

  test("regr guarantee selects exactly the still-flagged single-attempt queries, in priority order") {
    val flagged = Seq("huge", "big", "mid", "tiny")
    val attempts = Map(
      "huge" -> Vector(52.0),          // zero retries — the r15 defect shape
      "big"  -> Vector(22.0, 21.5),    // already re-measured
      "tiny" -> Vector(2.5))           // zero retries
    // "mid" has no attempts entry at all (a failed retry cleared it):
    // still counts as unretried
    val sel = Bench.unretriedFlagged(flagged, attempts)
    assert(sel == Seq("huge", "mid", "tiny"),
      "every would-be regr entry with one attempt gets a solo re-measure, worst first")
  }

  test("calibration factor: identity on a fast host, ratio on a slow one, clamped at 2x") {
    val ref = Bench.Calib.calRefSec
    // faster-than-reference or exactly-reference windows never TIGHTEN
    // thresholds (factor floors at 1.0 — the guard can only relax)
    assert(Bench.Calib.factorOf(ref * 0.5) == 1.0)
    assert(Bench.Calib.factorOf(ref) == 1.0)
    // a uniformly-1.9x window scales thresholds by 1.9
    assert(math.abs(Bench.Calib.factorOf(ref * 1.9) - 1.9) < 1e-9)
    // past 2x the clamp holds: the guard must not wave real regressions
    // through on a catastrophically degraded host
    assert(Bench.Calib.factorOf(ref * 7.0) == 2.0)
  }

  test("calibration scaling turns a uniformly-slow window's flags into ~none") {
    // the r16 shape: every query ~1.9x its warm ref on a co-loaded host.
    // refs here are the spec's thr map minus the +1s JIT allowance — use
    // values where thr = 2x ref so the arithmetic is transparent.
    val results = scala.collection.mutable.LinkedHashMap(
      "a" -> 7.6,  // thr 8.0 at factor 1 -> under either way
      "b" -> 9.0,  // over thr 8.0 at factor 1, under 8.0*1.9 with cal
      "c" -> 21.0) // over thr 8.0 even at the 2.0 clamp: a REAL regression
    val base: String => Double = _ => 8.0
    assert(Bench.retryOrder(results, base) == Seq("c", "b"))
    val f = Bench.Calib.factorOf(Bench.Calib.calRefSec * 1.9)
    val scaled: String => Double = n => base(n) * f
    assert(Bench.retryOrder(results, scaled) == Seq("c"),
      "only the genuine excess survives host-speed normalization")
  }

  test("calibration reference matches this host (re-baseline CalibProbe on drift)") {
    // a LIVE warmed observation on the build host must land within sane
    // bounds of the checked-in constant: an idle host prices ~1.0x, a
    // co-loaded build host higher, but >6x means the constant is stale
    // (container CPU allocation changed) and the guard would mis-scale.
    // Lower bound 0.55x: the kernel is fixed work, so a future host
    // can't legitimately halve it without a re-baseline.
    val s = Bench.Calib.warmedSample()
    assert(s > Bench.Calib.calRefSec * 0.55,
      f"calibration kernel ran $s%.3f s — far below calRefSec; re-baseline with CalibProbe")
    assert(s < Bench.Calib.calRefSec * 6.0,
      f"calibration kernel ran $s%.3f s — far above calRefSec even allowing co-load; re-baseline")
  }

  test("scheduler run-delay per-mille: arithmetic and sentinels") {
    // 1 s wall on an N-core host with N×0.2 s of summed run-delay => 200 pm
    val n = Runtime.getRuntime.availableProcessors()
    val a = Bench.HostLoad.Snap(1.0, 100, 50, 0, 10, 0, 0, 0L, 0, 0L)
    val b = a.copy(ns = 1000000000L, schedWait = n * 200000000L)
    assert(Bench.HostLoad.schedPm(a, b) == 200L)
    // clamped at 1000 when more runnable threads than cores queue
    val c = a.copy(ns = 1000000000L, schedWait = n * 5000000000L)
    assert(Bench.HostLoad.schedPm(a, c) == 1000L)
    // -1 sentinels: unreadable counter or empty window
    assert(Bench.HostLoad.schedPm(a.copy(schedWait = -1L), b) == -1L)
    assert(Bench.HostLoad.schedPm(a, b.copy(ns = 0L)) == -1L)
  }
}
