package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract over the GENERATED bench reference resource
  * (`graft/bench-ref-sf01.properties`) the contention guard loads: one
  * source of truth for the warm sf0.1 minima (VERDICT r6 #6 — the old
  * hand-maintained in-code map could silently drift from the surface and
  * from docs/SCALING.md). The regeneration command lives in the resource
  * header; this spec makes "surface changed but resource didn't" a test
  * failure rather than a silent 1.5 s-fallback in the guard. */
class BenchRefSpec extends AnyFunSuite {

  test("reference resource covers exactly the registered surface") {
    val refs = Bench.refSf01.keySet
    val queries = SparkEntry.queries.keySet
    val missing = queries -- refs
    val stale = refs -- queries
    assert(missing.isEmpty && stale.isEmpty,
      s"bench-ref-sf01.properties out of sync — missing: $missing, stale: $stale; " +
        "regenerate with the command in the resource header")
  }

  test("reference minima are sane positive wall times") {
    val bad = Bench.refSf01.filter { case (_, v) => !(v > 0.0 && v < 600.0) }
    assert(bad.isEmpty, s"nonsensical reference entries: $bad")
  }

  test("every headline skip still names a registered query") {
    // a query rename must not silently shrink the bench (mirrors the
    // PlanShapeSpec assertion; kept here too since the skip set and the
    // reference resource change together)
    val gone = Bench.headlineSkip -- SparkEntry.queries.keySet
    assert(gone.isEmpty, s"headlineSkip names unknown queries: $gone")
  }
}
