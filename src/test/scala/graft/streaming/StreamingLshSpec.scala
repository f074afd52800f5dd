package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming LSH ingest-dedup laws: the per-document JVM signature is
  * bit-identical to the batch minhash columns (the parity root), near-dup
  * pairs surface across micro-batches, unrelated docs stay silent, and
  * bucket state respects its FIFO capacity. */
class StreamingLshSpec extends SparkSpec {
  import spark.implicits._

  test("local JVM signature == batch minhashSignatures on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).limit(30).select("doc_id", "text")
    val batch = graft.analytics.Dedup.minhashSignatures(docs, n = 5, numHashes = 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap
    val local = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      graft.analytics.Dedup.localMinhashSignature(text, 5, 16).map(id -> _.toSeq)
    }.toMap
    // same doc set signs (short docs absent from both) and same values
    assert(local.keySet == batch.keySet,
      s"doc sets differ: ${local.keySet.diff(batch.keySet)} / ${batch.keySet.diff(local.keySet)}")
    local.foreach { case (id, sig) =>
      assert(sig == batch(id), s"signature mismatch for doc $id")
    }
    assert(batch.nonEmpty, "parity test needs signed documents")
  }

  private def runBatches(batches: Seq[Seq[(Long, String)]], threshold: Double,
                         capacity: Int = 256): Seq[StreamDupCandidate] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"lsh_stream_${System.nanoTime()}"
    val q = StreamingLsh.candidates(ms.toDS(), threshold = threshold, capacity = capacity)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[StreamDupCandidate].collect().toSeq
  }

  test("near-dups surface across micro-batches; unrelated docs stay silent") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 37) "CHANGED" else s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val out = runBatches(Seq(Seq(1L -> base, 3L -> other), Seq(2L -> nearDup)),
      threshold = 0.5)
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the near-dup pair, got $out")
    // signature agreement of a one-word edit is high
    assert(out.filter(c => (c.doc_a, c.doc_b) == ((1L, 2L))).forall(_.est_jaccard >= 0.5))
    // an exact duplicate arriving later matches with full agreement
    val out2 = runBatches(Seq(Seq(1L -> base), Seq(2L -> base)), threshold = 0.99)
    assert(out2.nonEmpty && out2.forall(c =>
      c.doc_a == 1L && c.doc_b == 2L && c.est_jaccard == 1.0), s"exact dup: $out2")
  }

  test("FIFO capacity bounds bucket state: evicted docs no longer pair") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    // capacity 1 per bucket: doc 1 is evicted by doc 2, so doc 3 pairs
    // only with doc 2 even though all three are identical
    val out = runBatches(
      Seq(Seq(1L -> text), Seq(2L -> text), Seq(3L -> text)),
      threshold = 0.99, capacity = 1)
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"capacity-1 window must pair only adjacent arrivals, got $pairs")
  }
}
