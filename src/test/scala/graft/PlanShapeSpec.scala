package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Physical-plan shape laws — the audit the round verdicts run by hand,
  * pinned as a spec so a refactor can't silently regress the scale
  * design: dimension joins stay broadcast, no accidental cartesian /
  * nested-loop product appears outside the two DOCUMENTED quadratic
  * oracle baselines, windows stay key-partitioned (the one global-order
  * window left relies on Spark's WindowGroupLimit top-k pushdown), and
  * filters keep reaching the parquet scan. Plans are inspected pre-AQE
  * (`sparkPlan`): AQE only coalesces or converts at runtime, never adds
  * a product or removes a pushed filter. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case n => n }

  /** Queries ALLOWED to plan a product: the documented quadratic
    * baselines — the exact oracle forms (scale paths: the LSH/IVF
    * variants next to them) and the SQ8 accuracy baseline, which
    * measures compression loss the way real pipelines do (brute force
    * on a sample). */
  private val quadraticBaselines =
    Set("knn_exact", "dedup_embedding_exact", "knn_quantized",
      // knn_eval joins each ANN rung against the EXACT ground truth, so
      // it embeds knn_exact's documented quadratic by construction — an
      // eval table is priced as a sampled-workload audit, not a serving
      // path (its rungs themselves stay product-free)
      "knn_eval")

  test("no cartesian or nested-loop product anywhere outside the documented baselines") {
    // every registered query EXCEPT the baselines must plan product-free;
    // planning only (no execution), so the whole surface checks at once —
    // queries whose builders run driver-side probe jobs (quartile cutoffs,
    // IVF centroids, cluster rounds) pay those at sf0.001
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticBaselines)
      .flatMap { name =>
        val bad = nodes(planOf(name)).filter(n =>
          n.isInstanceOf[CartesianProductExec] ||
            (n.isInstanceOf[BroadcastNestedLoopJoinExec] &&
              // a broadcast LOOP join with a non-trivial equi-ish condition
              // is the accident this spec hunts; IVF's deliberate
              // broadcast-all-centroids probe (tiny side) is condition-free
              n.asInstanceOf[BroadcastNestedLoopJoinExec].condition.isDefined))
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.map(_.nodeName).distinct}")
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("dimension joins broadcast: the TPC-H analog fact plans carry no shuffle join for dims") {
    for ((name, minBhj) <- Seq("q3_top_orders" -> 1, "q5_nation_revenue" -> 2,
        "q10_returned_cust" -> 2, "q14_promo_share" -> 1, "q19_bracket_revenue" -> 1,
        // the r15 remainder batch: q8's 8-way join broadcasts part,
        // region-pruned customers and supplier-nation (only li⋈orders
        // shuffles); q9 broadcasts parts and supplier-nation
        "q8_market_share" -> 3, "q9_nation_profit" -> 2,
        "q17_small_qty_revenue" -> 1)) {
      val bhj = nodes(planOf(name)).count(_.isInstanceOf[BroadcastHashJoinExec])
      assert(bhj >= minBhj, s"$name: expected >= $minBhj broadcast hash joins, got $bhj")
    }
  }

  test("every window partitions by a key, or its input is limit-bounded") {
    // an unpartitioned window is scale-safe iff its INPUT subtree is
    // already bounded by a limit: sample_weighted's `row_number <= k`
    // optimizes to TakeOrderedAndProject BELOW the window (per-task
    // top-k, k rows to the merge), and the txt_* rank columns window an
    // already-`limit(k)`ed frame. Anything else moving all rows to one
    // partition is the regression this test exists to catch.
    def limitBounded(w: WindowExec): Boolean =
      w.child.collectWithSubqueries {
        case n if n.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.GlobalLimitExec] ||
          n.isInstanceOf[WindowGroupLimitExec] => n
      }.nonEmpty
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticBaselines)
      .flatMap { name =>
        val bad = nodes(planOf(name)).collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w) => w
        }
        if (bad.isEmpty) Nil
        else Seq(s"$name: ${bad.size} unbounded unpartitioned window(s)")
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("filters reach the parquet scan (q6: pushed filters on the lineitem scan)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = nodes(planOf("q6_revenue_filter"))
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet file scan")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
    assert(pushed.exists(p => p != "[]" && p.nonEmpty),
      s"no pushed filters on the q6 scan: $pushed")
    // and column pruning: the scan must not read the full lineitem schema
    val readSchemas = scans.map(_.requiredSchema.fieldNames.length)
    assert(readSchemas.forall(_ <= 4),
      s"q6 scan reads more columns than the query needs: $readSchemas")
  }

  test("BPE encode is a zero-shuffle scan; a trainer round is one vocab-sized shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the 100 TB tokenization pass must stay scan-shaped: the merge chain
    // is per-row string replaces, so the ONLY exchange allowed in
    // txt_bpe_encode's final plan is the output orderBy's range exchange —
    // no aggregation/join shuffle may creep into the encode path
    val encEx = nodes(planOf("txt_bpe_encode"))
      .collect { case e: ShuffleExchangeExec => e }
    assert(encEx.size <= 1,
      s"txt_bpe_encode plans ${encEx.size} shuffles — the encode path must be scan-shaped")
    // and the trainer's per-round pair count shuffles the VOCABULARY
    // state, never documents: its plan is pair-agg over the checkpointed
    // word leaf (LogicalRDD), with no parquet scan left in it
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docsDf = Tables.documents(spark, sfDir)
    val merges = analytics.Bpe.trainMerges(docsDf, rounds = 1)
    assert(merges.nonEmpty) // the round above ran; its plan law is pinned
    // structurally by the golden plan counters (txt_bpe_train row) — here
    // assert the encode scan reads only what it needs
    val scans = nodes(planOf("txt_bpe_encode")).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty && scans.forall(_.requiredSchema.fieldNames.length <= 2),
      "txt_bpe_encode must read only (doc_id, text) from parquet")
  }

  test("bench headline-skip names refer to real queries (a rename cannot silently shrink the bench)") {
    // Bench's skip set is private; reproduce the contract from the env
    // side instead: run the selection logic the way Bench does
    val names = SparkEntry.queries.keySet
    val phantom = Bench.headlineSkip.filterNot(names)
    assert(phantom.isEmpty, s"headlineSkip names not on the surface: $phantom")
  }
}
