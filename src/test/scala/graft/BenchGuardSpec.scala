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
    // ADVICE r17: the constant is tuned to THIS sandbox's 32-thread
    // allocation and the kernel's work is fixed-total, so a build host
    // with materially fewer effective cores (or one running the suite
    // under the demo rigs' deliberate co-load) would fail here
    // spuriously — skip rather than fail when the visible width differs
    // from the baseline, and allow SPARK_GRAFT_SKIP_CALREF=1 for CI on
    // intentionally-degraded hosts.
    val baselineCores = 32
    val n = Runtime.getRuntime.availableProcessors()
    assume(n >= baselineCores / 2 && n <= baselineCores * 2,
      s"host exposes $n cores vs the $baselineCores-core calibration baseline — " +
        "constant not comparable; re-baseline with CalibProbe before trusting cal")
    assume(!sys.env.get("SPARK_GRAFT_SKIP_CALREF").contains("1"),
      "SPARK_GRAFT_SKIP_CALREF=1 — live calibration sanity check skipped")
    val s = Bench.Calib.warmedSample()
    assert(s > Bench.Calib.calRefSec * 0.55,
      f"calibration kernel ran $s%.3f s — far below calRefSec; re-baseline with CalibProbe")
    assert(s < Bench.Calib.calRefSec * 6.0,
      f"calibration kernel ran $s%.3f s — far above calRefSec even allowing co-load; re-baseline")
  }

  test("median calibration: one burst-overlapped sample cannot relax the sweep's bar") {
    val ref = Bench.Calib.calRefSec
    // three sweep-level samples, one hit by a transient co-tenant burst:
    // the r17 worst-of policy would have scaled every threshold to the 2x
    // clamp; the median keeps the global factor at 1.0
    val samples = Seq(ref * 1.0, ref * 7.0, ref * 0.98)
    assert(Bench.Calib.medianOf(samples) == ref * 1.0)
    assert(Bench.Calib.factorOf(Bench.Calib.medianOf(samples)) == 1.0)
    // a genuinely degraded window (2 of 3 samples slow) still scales
    val slow = Seq(ref * 1.9, ref * 1.8, ref * 1.0)
    assert(math.abs(Bench.Calib.factorOf(Bench.Calib.medianOf(slow)) - 1.8) < 1e-9)
    // even-size median is the mid-pair mean
    assert(Bench.Calib.medianOf(Seq(1.0, 3.0)) == 2.0)
  }

  test("minAttemptFactor pairs the recorded min with ITS concurrent stamp (r17 #2)") {
    val ref = Bench.Calib.calRefSec
    def p(cal: Double) = Bench.Prov(0.0, 0, 0, calSec = cal)
    // burst survivor: the min attempt ran under a 1.9x-priced window —
    // its own stamp adjudicates it, regardless of the sweep-level factor
    val att = Vector(9.0, 7.6)
    val provs = Vector(p(-1.0), p(ref * 1.9))
    assert(math.abs(Bench.minAttemptFactor(att, provs, 1.0) - 1.9) < 1e-9,
      "the min attempt's concurrent stamp must adjudicate it")
    // clean solo re-measure on a degraded sweep: the min's stamp reads
    // idle, so the query is judged at the CLEAN bar even though the
    // sweep-level factor is relaxed — a real regression cannot hide
    // behind somebody else's burst
    assert(Bench.minAttemptFactor(Vector(9.0, 7.6),
      Vector(p(-1.0), p(ref * 0.99)), 2.0) == 1.0)
    // unstamped min (initial sweep attempt) falls back to the global
    assert(Bench.minAttemptFactor(Vector(5.0), Vector(p(-1.0)), 1.7) == 1.7)
    assert(Bench.minAttemptFactor(Vector.empty, Vector.empty, 1.3) == 1.3)
    // provs shorter than attempts (failed-retry bookkeeping): no crash,
    // global fallback
    assert(Bench.minAttemptFactor(Vector(5.0, 4.0), Vector(p(-1.0)), 1.2) == 1.2)
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
