package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.{Dedup, Multimodal}

/** Streaming perceptual-dedup laws: the per-payload JVM dHash is
  * bit-identical to the batch decoded-BMP column (one shared function —
  * the parity root is structural), streamed candidates equal the batch
  * banded-Hamming pairs on the real corpus, and the Hamming gate maps
  * exactly onto the shared core's bit-agreement threshold. */
class StreamingPhashSpec extends SparkSpec {
  import spark.implicits._

  test("local JVM dHash == batch dHash column on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).limit(40).select("doc_id", "text")
    val batch = Multimodal.dHash(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(Multimodal.localDHash(text.getBytes("UTF-8")) === batch(id),
        s"dHash mismatch for doc $id")
    }
    assert(batch.nonEmpty)
  }

  private def runBatches(batches: Seq[Seq[(Long, String)]],
                         maxHamming: Int = 3): Seq[StreamDupCandidate] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"phash_stream_${System.nanoTime()}"
    // capacity ample for the whole corpus: one bucket per 16-bit band
    // value can legitimately hold many residents on 500 docs, and this
    // spec's law is set-equality with the UNBOUNDED batch join
    val q = StreamingPhash.candidates(ms.toDS(), maxHamming = maxHamming,
      capacity = 2048)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[StreamDupCandidate].collect().toSeq
  }

  test("streamed candidates == batch hash64Pairs on the real corpus (pair set)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).select("doc_id", "text")
    val batchPairs = Dedup.hash64Pairs(Multimodal.dHash(spark, docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = docs.as[(Long, String)].collect().toSeq.sortBy(_._1)
    // two micro-batches, capacity ample for the corpus: the streamed
    // pair set (with hamming recovered from the bit agreement) must
    // equal the batch join's
    val streamed = runBatches(Seq(rows.take(rows.size / 2), rows.drop(rows.size / 2)))
      .map(c => (c.doc_a, c.doc_b, 64L - math.round(c.est_jaccard * 64))).toSet
    assert(batchPairs.nonEmpty, "corpus must produce perceptual pairs")
    assert(streamed === batchPairs,
      s"stream/batch divergence: ${streamed.diff(batchPairs)} / ${batchPairs.diff(streamed)}")
  }

  test("audio face: local aHash == batch column; streamed candidates == batch pairs") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).select("doc_id", "text")
    // parity root: one shared function
    val batch = Multimodal.aHash(spark, docs.limit(40)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.limit(40).as[(Long, String)].collect().foreach { case (id, text) =>
      assert(Multimodal.localAHash(text.getBytes("UTF-8")) === batch(id),
        s"aHash mismatch for doc $id")
    }
    // stream ≡ batch pair set through the SAME shared core
    val batchPairs = Dedup.hash64Pairs(Multimodal.aHash(spark, docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = docs.as[(Long, String)].collect().toSeq.sortBy(_._1)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"ahash_stream_${System.nanoTime()}"
    val q = StreamingPhash.ahashCandidates(ms.toDS(), capacity = 2048)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try Seq(rows.take(rows.size / 2), rows.drop(rows.size / 2))
      .foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table(name).as[StreamDupCandidate].collect()
      .map(c => (c.doc_a, c.doc_b, 64L - math.round(c.est_jaccard * 64))).toSet
    assert(batchPairs.nonEmpty, "corpus must produce audio pairs")
    assert(streamed === batchPairs,
      s"audio stream/batch divergence: ${streamed.diff(batchPairs)} / ${batchPairs.diff(streamed)}")
  }

  test("identical payloads collide at full agreement; hamming gate excludes past the bound") {
    val a = "the quick brown fox jumps over the lazy dog " * 6
    val out = runBatches(Seq(Seq(1L -> a), Seq(2L -> a)))
    assert(out.exists(c => c.doc_a == 1L && c.doc_b == 2L && c.est_jaccard == 1.0),
      s"exact payload dup must surface at agreement 1.0: $out")
    // unrelated byte statistics stay silent at maxHamming 0
    val out0 = runBatches(Seq(Seq(1L -> a, 2L -> ("zq9 " * 70))), maxHamming = 0)
    assert(out0.forall(_.est_jaccard == 1.0), s"maxHamming 0 admits only exact hashes: $out0")
  }
}
