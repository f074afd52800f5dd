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

  /** The per-plan audit counters: shuffle exchanges, whole-stage-codegen
    * spans, join strategy mix, and the two scale red flags (product
    * plans, unpartitioned windows). Shared by the operational audit
    * ([[main]]) and the golden-snapshot CI contract
    * (`ExplainSnapshotSpec`) so both count the same way. */
  final case class PlanCounters(exchanges: Int, codegen: Int, bhj: Int,
                                smj: Int, prod: Int, gwin: Int) {
    def csv: String = s"$exchanges,$codegen,$bhj,$smj,$prod,$gwin"
  }

  /** Count operators from the executed-plan TREE, not the text:
    * formatted mode prints each operator in both the tree and the
    * details section (doubling text counts), and it carries no `*`
    * codegen markers at all. Meaningful only with AQE DISABLED on the
    * session (with AQE on, codegen collapse happens per query stage at
    * materialization, so an unexecuted plan shows no codegen spans). */
  private[graft] def counters(qe: org.apache.spark.sql.execution.QueryExecution): PlanCounters = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // flatten the physical tree, stepping THROUGH the wrappers that
    // hide their payload from collect(): AdaptiveSparkPlanExec (AQE
    // root — its children list is empty) and materialized QueryStageExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val hidden = p match {
        // executedPlan, not inputPlan: inputPlan predates
        // EnsureRequirements + CollapseCodegenStages, so it shows no
        // inserted exchanges and no codegen spans; before execution
        // executedPlan IS the initial (fully prepared) plan
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => Nil
      }
      p +: (p.children ++ hidden ++ p.subqueries).flatMap(nodes)
    }
    val all = nodes(qe.executedPlan)
    PlanCounters(
      exchanges = all.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      codegen = all.count(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      bhj = all.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      smj = all.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      prod = all.count(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      gwin = all.count {
        case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.isEmpty
        case _ => false
      })
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local()
    // static-plan audit: with AQE on, codegen collapse and join demotion
    // happen per query stage at MATERIALIZATION, so an unexecuted plan
    // shows no WholeStageCodegen spans to count. Auditing the non-adaptive
    // plan shows the full static shape (worst-case exchanges: AQE can only
    // coalesce/convert at runtime, never add). Bench/Verify keep AQE on.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(q => f(q._1)))
    selected.foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.plan.txt"), plan)
        val c = counters(qe)
        println(f"[explain] $name%-28s exchanges=${c.exchanges}%-3d codegen=${c.codegen}%-3d " +
          f"bhj=${c.bhj}%-2d smj=${c.smj}%-2d prod=${c.prod}%-2d gwin=${c.gwin}%-2d")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
