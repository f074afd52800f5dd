package graft.streaming

import graft.SparkSpec
import graft.analytics.Distill

/** The frozen-student ingest law — the [[StreamingBpeSpec]] pin applied
  * to the distilled quality classifier: the student is trained OFFLINE
  * on the teacher-labeled corpus ([[Distill.fit]]) and its stumps ship
  * as plan literals; [[Distill.scoreWith]] is then one stateless
  * projection (features + integer stump compares, no join, no agg), so
  * the identical chain scores a STREAMING frame per micro-batch with
  * bit-identical scores to a batch re-run. This is the deployment shape
  * of classifier-based quality filtering at ingest: the expensive
  * teacher never runs in the hot path, the cheap student always does. */
class StreamingDistillSpec extends SparkSpec {
  import spark.implicits._

  test("frozen-student quality scoring: identical output batch vs stream") {
    val corpus = graft.Tables.documents(spark, sfDir)
    val model = Distill.fit(corpus) // trained offline, now frozen
    assert(model.stumps(0).length == Distill.Rounds)
    val docs = corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(20)

    val batch = Distill.scoreWith(docs.toDF("doc_id", "text"), model)
      .orderBy("doc_id").collect().toSeq

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"distill_stream_${System.nanoTime()}"
    val q = Distill.scoreWith(ms.toDS().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table(name).orderBy("doc_id").collect().toSeq

    assert(batch.nonEmpty && streamed == batch,
      "streamed frozen-student scores must be bit-identical to batch")
  }
}
