package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming KMV gauge's unification law — the strongest form this
  * engine asserts per family: the streamed sketch state after ANY
  * micro-batch split is bit-identical to the batch aggregate over the
  * same rows (KMV is a pure set function of the distinct inputs), so
  * the final estimates match the batch `q_kmv_distinct` fields exactly. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, String)]], k: Int): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val name = s"kmv_${System.nanoTime()}"
    val q = StreamingKmv.estimates(ms.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[KmvEstimate].collect().toSeq
      .groupBy(_.group).map { case (g, rows) =>
        val last = rows.maxBy(_.seq)
        g -> (last.n_kept, last.n_est)
      }
  }

  test("final streamed estimates == batch kmv_sketch over the same rows, any split") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sh = docs.where(length(trim(col("text"))) > 0)
      .select(col("source"), graft.analytics.TextAnalysis.tokens(col("text")).as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"))
        .as("shingle"))
    val rows = sh.as[(String, String)].collect().toSeq
    val batch = sh.groupBy("source").agg(expr("kmv_sketch(shingle, 64)").as("m"))
      .collect().map { r =>
        val m = r.getSeq[Long](1)
        val est = if (m.size < 64) m.size.toLong
          else math.round(63 * graft.functions.KmvSketch.Hash60Range / m.last)
        r.getString(0) -> (m.size.toLong, est)
      }.toMap
    val n = rows.size
    // single batch AND a 3-way split (also reversed order within one
    // batch — the set state must not care)
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(n / 3), rows.slice(n / 3, 2 * n / 3), rows.drop(2 * n / 3)),
      Seq(rows.reverse))
    splits.foreach { b =>
      assert(run(b.filter(_.nonEmpty), 64) === batch,
        s"split sizes ${b.map(_.size)} diverged from batch")
    }
  }

  test("gauge is monotone in n_kept and exact below k") {
    val b1 = (1 to 10).map(i => ("g", s"a$i"))
    val b2 = (5 to 20).map(i => ("g", s"a$i")) // overlap: only 10 new
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val name = s"kmv_mono_${System.nanoTime()}"
    val q = StreamingKmv.estimates(ms.toDS(), k = 64)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[KmvEstimate].collect().sortBy(_.seq)
    assert(out.map(e => (e.seq, e.n_kept, e.n_est)).toSeq ===
      Seq((1L, 10L, 10L), (2L, 20L, 20L)))
  }
}
