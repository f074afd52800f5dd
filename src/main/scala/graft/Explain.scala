package graft

import java.nio.file.{Files, Paths}

/** Plan-audit dump: `.explain("formatted")` for every SparkEntry query
  * (or the comma-separated subset in `SPARK_GRAFT_QUERIES`) into
  * `outDir/<name>.plan.txt`. The audit criteria, per the scale design:
  * dimension joins broadcast, filters/projections reach the parquet scan
  * (PushedFilters / ReadSchema), WholeStageCodegen spans cover the hot
  * path, and no unexpected shuffle (Exchange) appears.
  *
  * Usage: sbt 'runMain graft.Explain <sfDir> <outDir>'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(q => f(q._1)))
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.plan.txt"), plan)
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        // codegen'd operators carry a `*` prefix (or `[codegen id : N]`)
        val codegen = plan.linesIterator.count(l =>
          l.contains("codegen id") || l.trim.startsWith("* ") || l.contains("+- * "))
        val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
        val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
        println(f"[explain] $name%-28s exchanges=$exchanges%-3d codegen=$codegen%-3d bhj=$bhj%-2d smj=$smj%-2d")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
