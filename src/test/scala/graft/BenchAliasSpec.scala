package graft

import org.scalatest.funsuite.AnyFunSuite

/** The checked-in bench alias map (VERDICT r12 #3): the tail line's
  * aliased rungs key every per-query field by these short names, so the
  * map must cover the surface bijectively — a missing key would silently
  * emit a full-length name (budget regression), a duplicate value would
  * merge two queries' numbers in the artifact. */
class BenchAliasSpec extends AnyFunSuite {

  test("alias map == queries.keySet, values unique, short, and JSON-key-safe") {
    val a = Bench.aliases
    val missing = SparkEntry.queries.keySet -- a.keySet
    val orphans = a.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"queries without an alias (regenerate the map): $missing")
    assert(orphans.isEmpty, s"aliases without a query: $orphans")
    val dups = a.values.groupBy(identity).collect { case (v, vs) if vs.size > 1 => v }
    assert(dups.isEmpty, s"duplicate aliases: $dups")
    assert(a.values.forall(_.matches("[a-z0-9]{1,8}")), "aliases must be short [a-z0-9]")
  }

  test("aliased rung reports the full surface inside the driver budget") {
    // the reason the map exists: every BENCHED query gets a number in
    // <=1850 chars — qshed must stay 0 at the real headline size. The
    // 1850 budget is the DRIVER's capture window and the driver always
    // runs the headline set; BENCH_ALL profiling runs get an unlimited
    // budget (Bench.main), so the headline set IS the line's contract.
    val fake = (SparkEntry.queries.keySet -- Bench.headlineSkip).toSeq.sorted.zipWithIndex
      .map { case (k, i) => (k, 0.1 * (i % 40) + 0.3) }
    val line = Bench.renderLine(fake, Map.empty, Map.empty, "/root/testdata/sf0.1", 1850)
    assert(line.length <= 1850)
    assert(!line.contains("qshed"), s"shed engaged at ${line.length} chars: $line")
    assert(line.contains(""""alias":1""") || line.contains(SparkEntry.queries.keySet.head),
      "full surface must fit via the aliased rungs (or full names if they fit)")
    val nEntries = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(line)
      .get.group(1).count(_ == ':')
    assert(nEntries == (SparkEntry.queries.keySet -- Bench.headlineSkip).size,
      s"$nEntries entries reported")
  }
}
