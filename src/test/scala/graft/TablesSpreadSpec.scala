package graft

import org.apache.spark.sql.catalyst.plans.logical.Repartition

import graft.SparkSpec

/** Pins the `Tables.spread()` trade (VERDICT r2 next #8): single-row-group
  * driver parquet gets exactly one redistribution to default parallelism
  * (scan parallelism for every downstream narrow stage); multi-row-group
  * input — the real-corpus shape — skips it entirely; and the footer memo
  * does not serve stale counts after a file is overwritten in place. */
class TablesSpreadSpec extends SparkSpec {
  import spark.implicits._

  private def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case r: Repartition => r }.nonEmpty

  test("single-row-group input gets exactly one spread() repartition to default parallelism") {
    val docs = Tables.documents(spark, sfDir) // driver parquet: one row group
    assert(hasRepartition(docs), "driver single-row-group parquet must be spread")
    assert(docs.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "spread must deliver default-parallelism populated partitions")
    // exactly one: the loader adds a single Repartition node, nothing else
    assert(docs.queryExecution.analyzed.collect { case r: Repartition => r }.size == 1)
  }

  test("multi-row-group input (real-corpus shape) skips spread; overwrite invalidates the memo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    val path = s"$dir/documents.parquet"
    // 1 row group -> spread applies
    (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(path)
    assert(hasRepartition(Tables.documents(spark, dir)),
      "one row group must trigger spread")
    // OVERWRITE the same path with 2*target row groups -> spread must see
    // the NEW footer counts (memo keyed on (path, mtime, length), not path
    // alone) and skip the repartition
    val wide = 2 * spark.sparkContext.defaultParallelism
    (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(wide).write.mode("overwrite").parquet(path)
    assert(!hasRepartition(Tables.documents(spark, dir)),
      "many row groups must skip spread (and the memo must not serve stale counts)")
  }
}
