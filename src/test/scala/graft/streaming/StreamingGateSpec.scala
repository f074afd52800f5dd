package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batch text-gate operators are STREAM-COMPATIBLE as-is: every gate
  * in the ingest path (C4 quality gate, quality scoring, language id,
  * token stats, PII redaction) is a stateless projection over `text`, so
  * the identical function applies unchanged to a streaming DataFrame —
  * no retrofit, no second implementation to keep in sync. This spec
  * pins that claim: run the SAME operator on a MemoryStream and on a
  * batch frame of the same rows and require identical output. A hidden
  * driver-side action or non-streamable shape inside any gate would
  * fail the streaming plan at analysis. */
class StreamingGateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, ("The quick brown fox jumps over the lazy dog. " * 5).trim),
    (2L, "short doc."),
    (3L, "Contact me at jane.doe@example.com or +1-555-0100 today! " +
      "This sentence pads the document out to a plausible length for the gate."),
    (4L, ("repeat segment " * 40).trim))

  private def viaStream(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"gate_stream_${System.nanoTime()}"
    val q = op(ms.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    spark.table(name).orderBy("doc_id").collect().toSeq
  }

  test("C4 gate, quality, lang-id, token stats, redaction: identical output batch vs stream") {
    val batchDf = docs.toDF("doc_id", "text")
    val gates: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] =
      Seq(
        "c4Filter" -> (d => graft.analytics.TextAnalysis.c4Filter(d)),
        "quality" -> (d => graft.analytics.TextAnalysis.qualityScore(d)),
        "langId" -> (d => graft.analytics.TextAnalysis.langId(d)),
        "tokenStats" -> (d => graft.analytics.TextAnalysis.tokenStats(d)),
        "redact" -> (d => graft.analytics.TextAnalysis.redact(d)))
    gates.foreach { case (label, op) =>
      val batch = op(batchDf).orderBy("doc_id").collect().toSeq
      val streamed = viaStream(op)
      assert(streamed == batch, s"$label diverges between batch and stream")
      assert(batch.nonEmpty, s"$label produced no rows")
    }
  }
}
