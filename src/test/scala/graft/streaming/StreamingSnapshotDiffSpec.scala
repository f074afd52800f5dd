package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.CurationAudit

/** Laws for the snapshot-diff ingest mirror: replaying v1 then
  * v2-with-tombstones through the stream must reproduce the batch
  * `ds_snapshot_diff` verdicts per source and status, the local digest
  * must be bit-identical to Spark's `md5()`, and the lifecycle edges
  * (re-add after tombstone, unknown-id tombstone) must behave. */
class StreamingSnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String, Option[String], Long)]])
      : Seq[DocChange] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String, Option[String], Long)]
    val name = s"snapdiff_${System.nanoTime()}"
    val q = StreamingSnapshotDiff.changes(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[DocChange].collect().toSeq
  }

  test("local md5Hex is bit-identical to functions.md5") {
    val texts = Seq("", "a", "hello world", "naïve — ünïcode ✓", "x" * 1000)
    val want = texts.toDF("t").select(md5(col("t"))).as[String].collect()
    assert(texts.map(StreamingSnapshotDiff.md5Hex) == want.toSeq)
  }

  test("replay(v1) + replay(v2 + tombstones) == the batch snapshot diff") {
    val docs = graft.Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
      df.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val v1 = rows(CurationAudit.snapshotV1(docs))
    val v2 = rows(CurationAudit.snapshotV2(docs))
    val v1Ids = v1.map(_._1).toSet
    val v2Ids = v2.map(_._1).toSet
    val srcOf = v1.map(r => r._1 -> r._2).toMap
    val batch1 = v1.map { case (id, s, t) => (id, s, Some(t), 1L) }
    val batch2 = v2.map { case (id, s, t) => (id, s, Some(t), 2L) } ++
      (v1Ids -- v2Ids).toSeq.map(id => (id, srcOf(id), None: Option[String], 2L))
    val got = run(Seq(batch1, batch2))
    // phase 1 is all adds
    assert(got.filter(_.crawl == 1L).forall(_.status == "added"))
    assert(got.count(_.crawl == 1L) == v1.size)
    // phase 2 per (source, status) counts == the batch diff table
    val streamCounts = got.filter(_.crawl == 2L)
      .groupBy(c => (c.source, c.status)).view.mapValues(_.size.toLong).toMap
    val want = CurationAudit.snapshotDiff(spark, sfDir).collect().flatMap { r =>
      Seq("added" -> r.getLong(1), "removed" -> r.getLong(2),
        "changed" -> r.getLong(3), "unchanged" -> r.getLong(4))
        .collect { case (st, n) if n > 0 => (r.getString(0), st) -> n }
    }.toMap
    assert(streamCounts == want,
      s"stream vs batch diff:\n  only-stream=${streamCounts.toSet -- want.toSet}" +
        s"\n  only-batch=${want.toSet -- streamCounts.toSet}")
  }

  test("lifecycle edges: re-add after removal, unknown tombstone, same-text unchanged") {
    val got = run(Seq(
      Seq((1L, "s", Some("aa"), 1L), (2L, "s", Some("bb"), 1L)),
      Seq((1L, "s", None, 2L), (3L, "s", None, 2L), (2L, "s", Some("bb"), 2L)),
      Seq((1L, "s", Some("aa2"), 3L))))
    val byKey = got.map(c => (c.doc_id, c.crawl) -> c.status).toMap
    assert(byKey((1L, 1L)) == "added")
    assert(byKey((1L, 2L)) == "removed")
    assert(byKey((1L, 3L)) == "added", "a removed doc re-adds, not 'changes'")
    assert(byKey((2L, 2L)) == "unchanged")
    assert(!byKey.contains((3L, 2L)), "tombstone for an unknown id emits nothing")
  }

  test("source migration attributes changed/unchanged to the RESIDENT source") {
    // the batch diff's coalesce(v1.source, v2.source) picks v1's source
    // for changed/unchanged rows; a doc that moves s1 → s2 between
    // crawls must count under s1 this cycle and under s2 the next
    val got = run(Seq(
      Seq((1L, "s1", Some("aa"), 1L), (2L, "s1", Some("bb"), 1L)),
      Seq((1L, "s2", Some("aa"), 2L), (2L, "s2", Some("bb2"), 2L)),
      Seq((1L, "s2", Some("aa3"), 3L), (2L, "s2", None, 3L))))
    val byKey = got.map(c => (c.doc_id, c.crawl) -> (c.source, c.status)).toMap
    assert(byKey((1L, 2L)) == ("s1", "unchanged"))
    assert(byKey((2L, 2L)) == ("s1", "changed"))
    // state carried the new source: next cycle attributes to s2
    assert(byKey((1L, 3L)) == ("s2", "changed"))
    assert(byKey((2L, 3L)) == ("s2", "removed"))
  }
}
