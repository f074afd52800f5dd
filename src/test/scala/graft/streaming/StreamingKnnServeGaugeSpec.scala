package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.analytics.Similarity

/** Laws for the serving-recall ingest gauge (VERDICT r16 #6): recall is
  * monotone non-decreasing as the stream fills the index, the FINAL
  * gauge row equals the batch-side metrics of the fully-populated index
  * (stream ≡ batch), and an at-least-once replay appends a bit-identical
  * row (invisible to readers). */
class StreamingKnnServeGaugeSpec extends SparkSpec {

  private def embL: DataFrame =
    graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("gauge: recall monotone in arrival; final row == batch metrics; replay appends an identical row") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val nQ = 10; val k = 5
    val corpus = embL
    // frozen exact ground truth over the FULL corpus — what the index
    // converges toward as everything arrives
    val gt = Similarity.knnExact(spark, sfDir, nQ, k).select("q_id", "n_id")
    // seed build: centroids train once on the low-hash fifth (rounds=0
    // keeps the seed's assignment == a fresh rebuild's, the ingest-spec
    // convention); queries are corpus members and must be able to find
    // themselves' neighborhoods from batch 0, so the seed keeps them
    val h = graft.functions.Hashes.md5Long60(col("vec_id").cast("string"))
    val seedPred = h < lit(Similarity.InsertHashThreshold) || col("vec_id") < nQ
    val p = java.nio.file.Files.createTempDirectory("graft_skg").toString
    Similarity.buildIvfIndexOf(spark, corpus.where(seedPred), p, nLists = 16, rounds = 0)
    val arrivals = corpus.where(!seedPred)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(arrivals.size >= 3, "need at least 3 arrivals to split into batches")
    val ms = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_skg_ck").toString
    val gaugePath = java.nio.file.Files.createTempDirectory("graft_skg_g").toString + "/gauge"
    val q = StreamingKnnServeGauge.start(
      ms.toDS().toDF("vec_id", "e"), p, ckpt, corpus, gt, gaugePath,
      nQueries = nQ, k = k,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val batches = arrivals.grouped(math.max(1, arrivals.size / 3)).toSeq
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.read.parquet(gaugePath)
      .select("seq", "n_members", "recall_pm", "mrr_ppm", "ndcg_pm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong), "one gauge row per batch")
    // members strictly accumulate; recall never decreases (the frozen-
    // centroid displacement argument in the operator scaladoc)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      s"recall must be monotone in arrival: ${rows.map(_._3).toSeq}")
    // stream ≡ batch: the final row equals the batch-side metric of the
    // fully-populated index through the SAME metric body
    val servedFull = Similarity.annIvfServeOf(spark, corpus, p, nQ, k)
      .select(lit("full").as("rung"), col("q_id"), col("rank"), col("n_id"))
    val want = Similarity.evalRungs(
        gt.select(col("q_id"), col("n_id"), lit(1L).as("__hit")), servedFull, nQ, k)
      .select("recall_pm", "mrr_ppm", "ndcg_pm")
      .head()
    val last = rows.last
    assert((last._3, last._4, last._5) ==
      ((want.getLong(0), want.getLong(1), want.getLong(2))),
      "final gauge row must equal the batch-side metrics")
    // and the converged index actually answers: the gauge is not vacuous
    assert(last._3 > 0L, "final recall must be nonzero on the corpus")
    // replay: re-inserting a batch + recomputing the gauge appends a row
    // with IDENTICAL metric values (idempotent-by-algebra insert)
    Similarity.ivfInsert(spark, p, batches.head.toDF("vec_id", "e"))
    val servedReplay = Similarity.annIvfServeOf(spark, corpus, p, nQ, k)
      .select(lit("replay").as("rung"), col("q_id"), col("rank"), col("n_id"))
    val replay = Similarity.evalRungs(
        gt.select(col("q_id"), col("n_id"), lit(1L).as("__hit")), servedReplay, nQ, k)
      .select("recall_pm", "mrr_ppm", "ndcg_pm").head()
    assert((replay.getLong(0), replay.getLong(1), replay.getLong(2)) ==
      ((last._3, last._4, last._5)), "replay must be invisible to the gauge")
  }
}
