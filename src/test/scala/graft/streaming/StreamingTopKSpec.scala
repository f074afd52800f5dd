package graft.streaming

import graft.SparkSpec

/** Laws for the streaming CMS top-k: over-count (never under), the true
  * heavy hitters surface in the candidates across micro-batches, per-
  * emission output is bounded by k, and the shard sequence advances. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[String]], k: Int, shards: Int,
                         capacity: Int = 64): Seq[TopKEstimate] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[String]
    val name = s"topk_stream_${System.nanoTime()}"
    val q = StreamingTopK.estimates(ms.toDS(), depth = 4, width = 256,
        k = k, shards = shards, capacity = capacity)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[TopKEstimate].collect().toSeq
  }

  test("heavy hitters surface across micro-batches with over-counted estimates") {
    val hot = Seq.fill(50)("hot1") ++ Seq.fill(30)("hot2")
    val tail = (1 to 40).map(i => s"tail$i")
    // split so both batches interleave hot and tail traffic
    val (b1, b2) = (hot.take(40) ++ tail.take(20), hot.drop(40) ++ tail.drop(20))
    val out = runBatches(Seq(b1, b2), k = 5, shards = 3)
    val truth = (hot ++ tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // latest emission per shard = that shard's final view
    val latest = out.groupBy(_.shard).values.flatMap { rows =>
      val last = rows.map(_.seq).max
      rows.filter(_.seq == last)
    }.toSeq
    // CMS contract: estimates never under-count the true frequency
    latest.foreach { e =>
      assert(e.est >= truth(e.key), s"under-count: $e vs true ${truth(e.key)}")
    }
    // the two real heavy hitters dominate the merged shard views
    val global = latest.sortBy(e => (-e.est, e.key)).take(2).map(_.key).toSet
    assert(global == Set("hot1", "hot2"), s"global top-2: $global from $latest")
    // and their estimates are close at this tiny N (eN/w noise floor ~ 1)
    val byKey = latest.map(e => e.key -> e.est).toMap
    assert(byKey("hot1") >= 50 && byKey("hot1") <= 55)
    assert(byKey("hot2") >= 30 && byKey("hot2") <= 35)
  }

  test("eviction queries live CMS estimates, not stale admission-time snapshots") {
    // width=1 forces total collision: every key's live estimate equals the
    // total arrival count, so a one-off newcomer can never BEAT a tracked
    // key's live estimate — it can only tie. With stale stored snapshots
    // (the pre-fix bug) the newcomer's est (= total) exceeds the tracked
    // minimum's admission-time value and wrongly evicts it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[String]
    val name = s"topk_live_${System.nanoTime()}"
    val q = StreamingTopK.estimates(ms.toDS(), depth = 2, width = 1,
        k = 2, shards = 1, capacity = 2)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData("a", "b"); q.processAllAvailable()
      ms.addData("c"); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[TopKEstimate].collect().toSeq
    val finalKeys = out.filter(_.seq == 2L).map(_.key).toSet
    assert(finalKeys == Set("a", "b"),
      s"newcomer with a merely-tying live estimate evicted a tracked key: $out")
    // and emissions carry end-of-batch estimates (3 total arrivals, width=1)
    assert(out.filter(_.seq == 2L).forall(_.est == 3L), s"stale emission: $out")
  }

  test("checkpoint recovery: a restarted query carries shard state across the stop") {
    // the exactly-once claim in practice: stop the query, start a NEW one
    // on the same checkpoint, and both the emission sequence AND the CMS
    // counts must continue from the persisted state — a reset would show
    // seq=1 again and an estimate that forgot batch 1
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[String]
    val dir = java.nio.file.Files.createTempDirectory("topk_recovery").toString
    def start() = StreamingTopK.estimates(ms.toDS(), k = 3, shards = 1)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/chk")
      .outputMode("append").start()
    val q1 = start()
    try { ms.addData(Seq.fill(7)("hot") :+ "cold": _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start() // brand-new query object, same checkpoint
    try { ms.addData(Seq.fill(5)("hot") :+ "warm": _*); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out").as[TopKEstimate].collect().toSeq
    assert(rows.map(_.seq).max == 2L, s"state reset on restart: $rows")
    val hotAfter = rows.filter(e => e.seq == 2L && e.key == "hot").map(_.est)
    assert(hotAfter.nonEmpty && hotAfter.head >= 12L,
      s"CMS forgot pre-restart mass: $rows")
  }

  test("bounded output and state: k rows per emission, hot key survives candidate churn") {
    // one shard, tiny candidate capacity, way more distinct keys than fit:
    // the frequent key must survive eviction pressure
    val churn = (1 to 200).map(i => s"noise$i")
    val b1 = Seq.fill(20)("signal") ++ churn.take(100)
    val b2 = churn.drop(100) ++ Seq.fill(15)("signal")
    val out = runBatches(Seq(b1, b2), k = 3, shards = 1, capacity = 8)
    // per (shard, seq): at most k rows, ranks 1..n contiguous
    out.groupBy(e => (e.shard, e.seq)).foreach { case ((_, seq), rows) =>
      assert(rows.size <= 3, s"emission seq=$seq has ${rows.size} rows")
      assert(rows.map(_.rank).sorted == (1 to rows.size), s"ranks: $rows")
    }
    // both batches emitted (seq advanced), and the final top-1 is the signal
    assert(out.map(_.seq).max == 2L)
    val finalTop = out.filter(_.seq == 2L).minBy(_.rank)
    assert(finalTop.key == "signal" && finalTop.est >= 35L,
      s"signal lost under churn: $finalTop")
  }
}
