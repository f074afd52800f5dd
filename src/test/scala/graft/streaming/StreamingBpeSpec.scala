package graft.streaming

import graft.SparkSpec
import graft.analytics.Bpe

/** The frozen-tokenizer ingest law: [[Bpe.encodeWith]] under a merge
  * table trained OFFLINE (the real deployment shape — a tokenizer is
  * trained once on the curated corpus and its merges ship as
  * configuration) is pure stateless projections, so the identical
  * function runs per micro-batch on a streaming frame and its counts
  * are bit-identical to a batch re-run over the same rows. A hidden
  * driver action or non-streamable shape (sort, agg) inside the encode
  * chain would fail the streaming plan at analysis — this is the same
  * pin [[StreamingGateSpec]] holds over the text gates, extended to the
  * tokenizer. */
class StreamingBpeSpec extends SparkSpec {
  import spark.implicits._

  test("frozen-merge BPE encode: identical output batch vs stream") {
    val corpus = graft.Tables.documents(spark, sfDir)
    val merges = Bpe.trainMerges(corpus) // trained offline, now frozen
    assert(merges.size == Bpe.Rounds)
    val docs = corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(20)

    val batch = Bpe.encodeWith(docs.toDF("doc_id", "text"), merges)
      .orderBy("doc_id").collect().toSeq

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"bpe_stream_${System.nanoTime()}"
    val q = Bpe.encodeWith(ms.toDS().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table(name).orderBy("doc_id").collect().toSeq

    assert(batch.nonEmpty && streamed == batch,
      "streamed frozen-tokenizer counts must be bit-identical to batch")
    // and the frozen merges actually bit: some doc compresses below chars
    assert(batch.exists(r => r.getAs[Long]("n_bpe_tokens") < r.getAs[Long]("n_chars")))
  }

  test("frozen deep merges: native bpe_tokenize identical batch vs stream") {
    // the deep-path serving form: merges trained offline by the
    // driver-local trainer, tokenization per micro-batch through the
    // native expression — one plan node, stateless, so Structured
    // Streaming accepts it and the token streams are bit-identical
    val corpus = graft.Tables.documents(spark, sfDir)
    val merges = Bpe.deepMerges(corpus, rounds = 128)
      .map { case (l, r, _) => (l, r) }
    assert(merges.size == 128)
    val docs = corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(20)

    val batch = Bpe.tokenizeWith(docs.toDF("doc_id", "text"), merges)
      .orderBy("doc_id").collect().toSeq

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"bpe_tok_stream_${System.nanoTime()}"
    val q = Bpe.tokenizeWith(ms.toDS().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table(name).orderBy("doc_id").collect().toSeq

    assert(batch.nonEmpty && streamed == batch,
      "streamed native tokenization must be bit-identical to batch")
    // deep merges cross word boundaries: some token must span one
    assert(batch.exists(_.getAs[String]("tokens").split(" ")
      .exists(t => t.length > 1 && t.contains(Bpe.Meta))))
  }
}
