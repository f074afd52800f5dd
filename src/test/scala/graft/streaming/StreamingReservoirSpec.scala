package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Sampling

/** Laws for the per-group reservoir ingest mirror: the reservoir after
  * replaying the corpus in micro-batches equals the batch
  * `sample_group_reservoir` keeper set AND order, regardless of how the
  * rows were split into batches; the local ES key is bit-identical to
  * the batch column; re-arrivals do not double-fill. */
class StreamingReservoirSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Long, Long)]], k: Int = 10)
      : Seq[ReservoirRow] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long)]
    val name = s"resv_${System.nanoTime()}"
    val q = StreamingReservoir.snapshots(ms.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[ReservoirRow].collect().toSeq
  }

  /** The latest emission per group — the live sample. */
  private def latest(rows: Seq[ReservoirRow]): Map[String, Seq[(Long, Long)]] =
    rows.groupBy(_.group).map { case (g, rs) =>
      val last = rs.map(_.seq).max
      g -> rs.filter(_.seq == last).sortBy(_.rank).map(r => (r.rank, r.key))
    }

  test("local ES key is bit-identical to the batch ranking column") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").limit(200)
    val u = (graft.functions.Hashes.md5Long60(
        concat(lit("gr:"), col("doc_id").cast("string"))).cast("double") + 1d) /
      1.152921504606846976e18
    val batchEs = docs.select(col("doc_id"),
        (round(log(u) * 1e8).cast("long").cast("double") /
          greatest(col("n_chars"), lit(1L)).cast("double")).as("es"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    batchEs.foreach { case (id, es) =>
      val w = docs.where(col("doc_id") === id).head().getLong(1)
      assert(Sampling.localGroupEsKey(id, w) == es, s"doc $id")
    }
  }

  test("replayed reservoir == batch sample_group_reservoir, batching-invariant") {
    val rows = graft.Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Sampling.groupReservoirQuery(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(0)))
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(_._2).map(r => (r._2, r._3)).toSeq
      }
    // two different splits: one big batch, and salted-md5 thirds (any
    // split must converge to the same reservoir — top-k by a pure row
    // key is a set function of the arrived rows)
    val oneShot = latest(run(Seq(rows)))
    val thirds = latest(run((0 until 3).map(i =>
      rows.filter(r => math.floorMod(r._2, 3L) == i.toLong))))
    assert(oneShot == want, "single-batch replay must equal the batch window")
    assert(thirds == want, "three-way split must equal the batch window")
  }

  test("re-arrival of a held key does not double-fill; k bounds the state") {
    val got = latest(run(Seq(
      Seq(("s", 1L, 5L), ("s", 2L, 5L), ("s", 3L, 5L)),
      Seq(("s", 1L, 5L), ("s", 2L, 5L)), // re-crawl of held keys
      Seq(("s", 4L, 5L))), k = 3))
    val keeperKeys = got("s").map(_._2)
    assert(keeperKeys.size == 3, "k bounds the reservoir")
    assert(keeperKeys.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(keeperKeys.distinct.size == 3, "no key occupies two slots")
    // the survivors are the ES-top-3 of the four distinct keys
    val want = Seq(1L, 2L, 3L, 4L)
      .map(id => (Sampling.localGroupEsKey(id, 5L), id))
      .sortBy { case (es, id) => (-es, id) }.take(3).map(_._2)
    assert(keeperKeys == want)
  }

  test("same-key weight conflict resolves smallest-weight-wins, batch-split-invariant") {
    // key 1 arrives at weight 9 and again at weight 2 (feed contract
    // violated); the resolution must be the SAME whether the conflict is
    // in one micro-batch or across two in either order (ADVICE r16: the
    // old keep-first rule made the reservoir batch-split-dependent)
    val a = ("s", 1L, 9L); val b = ("s", 1L, 2L); val c = ("s", 2L, 5L)
    val together = latest(run(Seq(Seq(a, b, c))))
    val heavyFirst = latest(run(Seq(Seq(a, c), Seq(b))))
    val lightFirst = latest(run(Seq(Seq(b, c), Seq(a))))
    assert(together == heavyFirst && together == lightFirst,
      s"split-dependent: $together / $heavyFirst / $lightFirst")
    // and the surviving weight for key 1 is the smallest one
    val w1 = run(Seq(Seq(a, c), Seq(b))).groupBy(_.seq).maxBy(_._1)._2
      .find(_.key == 1L).map(_.weight)
    assert(w1.contains(2L), s"held weight for key 1: $w1")
  }
}
