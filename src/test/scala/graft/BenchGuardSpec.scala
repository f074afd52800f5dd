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
