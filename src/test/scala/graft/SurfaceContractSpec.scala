package graft

/** Meta-contract over the whole registered surface — the mistakes the
  * driver's gate punishes silently (its compare sorts COLUMNS BY NAME
  * before hashing, so duplicate or mismatched names corrupt the hash
  * even when values are right):
  *  - every oracle key refers to a registered query;
  *  - every query plan ANALYZES against the smallest test data (schema
  *    resolution only — no execution, so the whole 100+ surface checks
  *    in seconds);
  *  - column names are unique within each query (the sort-by-name
  *    compare cannot disambiguate duplicates);
  *  - no column name contains characters the oracle's DuckDB side
  *    cannot reproduce verbatim. */
class SurfaceContractSpec extends SparkSpec {

  test("every oracle entry has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query is oracled (no-oracle set empty since r6)") {
    // q_approx_stats, the long-standing exception, became hashable in r6
    // via the exact-scaffolding + in-row-bounds form (approxStatsChecked)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without an oracle: $noOracle")
  }

  test("surface size matches the documented contract (README / SCALING.md)") {
    // the count the docs state; drifting docs broke round 5's VERDICT
    // bookkeeping, so the number lives HERE and the docs must follow it
    assert(SparkEntry.queries.size == 205,
      s"surface is ${SparkEntry.queries.size} queries — update this spec AND " +
        "README.md / docs/SCALING.md / SURVEY.md §8 together (tools/presnapshot.sh checks)")
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size)
  }

  test("all queries analyze at sf0.001 with unique, oracle-safe column names") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val schema = fn(spark, sfDir).schema // analysis only, no job
        val cols = schema.fieldNames.toSeq
        val dups = cols.groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
        val unsafe = cols.filter(c => !c.matches("[A-Za-z0-9_]+"))
        (if (dups.nonEmpty) Seq(s"$name: duplicate columns $dups") else Nil) ++
          (if (unsafe.nonEmpty) Seq(s"$name: unsafe column names $unsafe") else Nil) ++
          (if (cols.isEmpty) Seq(s"$name: empty schema") else Nil)
      } catch {
        case e: Exception => Seq(s"$name: analysis failed: ${e.getMessage.take(120)}")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
