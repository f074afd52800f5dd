package graft.streaming

import graft.SparkSpec
import graft.analytics.Sampling
import org.apache.spark.sql.functions._

/** The importance gate's streaming mirror (`StreamingDsir`): frozen
  * bucket-ratio artifact + row-local scoring, the family law that every
  * batch curation signal has an ingest counterpart. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = graft.Tables.documents(spark, sfDir)
  private lazy val lr = Sampling.dsirRatioTable(corpus)

  test("local mirror is bit-identical to the batch weight column on the real corpus") {
    val batch = Sampling.dsirWeights(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && batch.size == docs.length)
    docs.foreach { case (id, text) =>
      assert(Sampling.localDsirWeight(text, lr) == Some(batch(id)), s"doc $id")
    }
  }

  test("stream scoring: frozen cutoff keeps exactly the batch top set; null text silent; novel vocab scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    // frozen cutoff = the batch top-20 boundary weight
    val topW = Sampling.dsirWeights(corpus).collect().map(_.getLong(1))
      .sorted(Ordering[Long].reverse)
    val keepMin = topW(19)
    val sample = corpus.select("doc_id", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val novel = (900001L, "zzqx wvvkp zzqx") // vocabulary the model never saw
    val ms = MemoryStream[(Long, String)]
    val name = s"dsir_stream_${System.nanoTime()}"
    val q = StreamingDsir.scored(ms.toDS(), lr, keepMin)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(sample.toSeq :+ novel :+ ((900002L, null: String)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // null text emits nothing
    assert(!out.exists(_._1 == 900002L))
    // every streamed weight equals the batch column; keep == weight >= cutoff
    val batch = Sampling.dsirWeights(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (id, _) =>
      val row = out.find(_._1 == id).get
      assert(row._2 == batch(id) && row._3 == (row._2 >= keepMin), s"doc $id")
    }
    // the novel doc scores via the frozen table (sum of its buckets' lr)
    val nv = out.find(_._1 == 900001L).get
    assert(nv._2 == Sampling.localDsirWeight(novel._2, lr).get)
  }
}
