package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.{Sampling, Similarity}

/** Laws for the semantic-decontamination ingest face: the stream is
  * EXACT against the frozen eval matrix (≡ the brute-force cross-fold
  * sweep), the batch LSH face is a subset of it (its documented recall
  * trade), the fold assignment is one body with the batch column, and
  * non-train arrivals emit nothing. */
class StreamingContamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, Array[Double], String)] =
    graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .map { case (id, v) => (id, v, Sampling.localFold(id)) }.toSeq

  private def run(rows: Seq[(Long, Array[Double])],
                  frozen: Seq[(Long, Array[Double], String)]): Set[StreamLeak] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Double])]
    val name = s"contam_${System.nanoTime()}"
    val q = StreamingContam.leaks(ms.toDS(), frozen)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(rows: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[StreamLeak].collect().toSet
  }

  test("localFold is one body with the batch split column") {
    val want = Sampling.split(
        graft.Tables.embeddings(spark, sfDir).select(col("vec_id")), col("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    want.foreach { case (id, fold) => assert(Sampling.localFold(id) == fold, s"vec $id") }
  }

  test("stream == the exact cross-fold sweep; batch LSH face is a subset") {
    val all = corpus
    val frozen = all.filter(_._3 != "train")
    val got = run(all.map(r => (r._1, r._2)), frozen)
    // brute-force exact twin
    val want = (for {
      (tid, tv, tf) <- all if tf == "train"
      (eid, ev, ef) <- frozen
      c = Similarity.localCosine4(tv, ev) if c >= 0.4
    } yield StreamLeak(tid, eid, ef, c)).toSet
    assert(got == want, "ingest face must equal the exact sweep against the frozen matrix")
    assert(want.nonEmpty, "corpus must contain at least one cross-fold leak")
    // the LSH batch face can only miss (bucket recall), never invent
    val batch = Similarity.semanticContamination(spark, sfDir).collect()
      .map(r => StreamLeak(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(batch.subsetOf(got), "batch LSH leaks must be a subset of the exact stream")
  }

  test("non-train arrivals and null vectors emit nothing") {
    val all = corpus
    val frozen = all.filter(_._3 != "train")
    val trainId = all.find(_._3 == "train").get._1
    val evalRows = frozen.take(5).map(r => (r._1, r._2))
    // non-train ids pass through silently; a TRAIN id with a null vector
    // must not NPE or emit (the StreamingLsh null-text precedent)
    assert(run(evalRows :+ ((trainId, null: Array[Double])), frozen).isEmpty)
  }
}
