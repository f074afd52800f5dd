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

  test("coded gauge (PQ): recall monotone under the RECON ground truth; " +
      "stream-filled index == one-shot batch insert; replay invisible") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val nQ = 10; val k = 5
    val corpus = embL
    // the coded contract (operator scaladoc): the model — codebooks AND
    // centroids — trains once on the seed base and freezes; arrivals are
    // ENCODED at insert against that frozen model. The ground truth for
    // the monotone law is therefore the exact top-k over the DECODED
    // corpus — the best answer the coded index can ever give (the
    // ivf_del precedent: judge against the servable universe).
    val h = graft.functions.Hashes.md5Long60(col("vec_id").cast("string"))
    val seedPred = h < lit(Similarity.InsertHashThreshold) || col("vec_id") < nQ
    val base = corpus.where(seedPred)
    val arrivals = corpus.where(!seedPred)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(arrivals.size >= 3, "need at least 3 arrivals to split into batches")
    // live index the stream fills
    val p = java.nio.file.Files.createTempDirectory("graft_skgc").toString
    Similarity.buildPqIndexOf(spark, base, p, nLists = 16)
    // reference index: SAME base build (deterministic model), then the
    // whole arrival set through ONE batch ivfInsert + compaction — the
    // end state the stream must converge to
    val p2 = java.nio.file.Files.createTempDirectory("graft_skgc2").toString
    Similarity.buildPqIndexOf(spark, base, p2, nLists = 16)
    Similarity.ivfInsert(spark, p2, arrivals.toDF("vec_id", "e"))
    Similarity.ivfCompact(spark, p2)
    val queries = corpus.where(col("vec_id") < nQ)
    // recon ground truth: probing EVERY list on the final index makes the
    // coded serve the EXACT top-k over reconstructions (candidates = all
    // members, and the ADC cosine equals cos(q, x̂) by construction)
    val gtRecon = Similarity.annIvfCodedServeOf(spark, p2, queries, k, nProbe = 16)
      .select("q_id", "n_id")
    val ms = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_skgc_ck").toString
    val gaugePath = java.nio.file.Files.createTempDirectory("graft_skgc_g").toString + "/gauge"
    val q = StreamingKnnServeGauge.startCoded(
      ms.toDS().toDF("vec_id", "e"), p, ckpt, queries, gtRecon, gaugePath,
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
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // the law transfers: frozen codebooks/perm/centroids mean an arrived
    // member's reconstruction — hence its (cos, id) serving key — never
    // changes, so under the recon ground truth hits never decrease
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      s"coded recall must be monotone in arrival: ${rows.map(_._3).toSeq}")
    // stream ≡ batch, row-for-row: the insert-time encode against the
    // frozen model equals the one-shot batch encode (the FAISS add
    // contract at the serving surface)
    val servedStream = Similarity.annIvfCodedServeOf(spark, p, queries, k)
      .select("q_id", "n_id", "rank").collect().map(_.toSeq).toSet
    val servedBatch = Similarity.annIvfCodedServeOf(spark, p2, queries, k)
      .select("q_id", "n_id", "rank").collect().map(_.toSeq).toSet
    assert(servedStream == servedBatch,
      "stream-filled coded index must serve row-identically to the one-shot batch insert")
    // final gauge row == batch metrics of the reference index, same body
    val want = Similarity.evalRungs(
        gtRecon.select(col("q_id"), col("n_id"), lit(1L).as("__hit")),
        Similarity.annIvfCodedServeOf(spark, p2, queries, k)
          .select(lit("full").as("rung"), col("q_id"), col("rank"), col("n_id")),
        nQ, k)
      .select("recall_pm", "mrr_ppm", "ndcg_pm").head()
    val last = rows.last
    assert((last._3, last._4, last._5) ==
      ((want.getLong(0), want.getLong(1), want.getLong(2))),
      "final coded gauge row must equal the batch-side metrics")
    assert(last._3 > 0L, "final coded recall must be nonzero on the corpus")
    // replay: a re-delivered batch re-encodes bit-identically (the
    // stored-model encode is deterministic) — invisible to the serve
    Similarity.ivfInsert(spark, p, batches.head.toDF("vec_id", "e"))
    val servedReplay = Similarity.annIvfCodedServeOf(spark, p, queries, k)
      .select("q_id", "n_id", "rank").collect().map(_.toSeq).toSet
    assert(servedReplay == servedStream, "replay must be invisible to coded serving")
  }
}
