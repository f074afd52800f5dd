package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

class HttpPollSourceSpec extends SparkSpec {

  test("micro-batch stream unit: poll per latestOffset, slice, commit, backoff on failure") {
    val calls = new AtomicInteger(0)
    val script: Seq[Option[Double]] =
      Seq(Some(10.0), Some(11.0), None, Some(12.0), Some(12.0))
    PriceFetchers.register("unit", () => {
      val i = calls.getAndIncrement()
      if (i < script.length) script(i) else None
    })
    val s = new HttpPollMicroBatchStream("T", "unit", backoffMs = 0L,
      dropUnchanged = false)
    val o0 = s.initialOffset()
    val o1 = s.latestOffset() // 10.0
    val o2 = s.latestOffset() // 11.0
    assert(o2.asInstanceOf[PollOffset].n == 2)
    val rows = s.planInputPartitions(o0, o2)
    assert(rows.length == 1)
    assert(rows(0).asInstanceOf[PollPartition].rows.map(_._2).toSeq == Seq(10.0, 11.0))
    s.commit(o2)
    val o3 = s.latestOffset() // None -> backoff (0ms => next succeeds)
    assert(o3.asInstanceOf[PollOffset].n == 2, "failed fetch must not advance")
    val o4 = s.latestOffset() // 12.0
    val o5 = s.latestOffset() // 12.0 again (kept: dropUnchanged=false)
    assert(o5.asInstanceOf[PollOffset].n == 4)
    val tail = s.planInputPartitions(o2, o5).head.asInstanceOf[PollPartition]
    assert(tail.rows.map(_._2).toSeq == Seq(12.0, 12.0))
  }

  test("restart from checkpoint: offsets stay monotone, new ticks get fresh offsets") {
    PriceFetchers.register("restart", () => Some(42.0))
    // a NEW stream instance (restart) sees the checkpointed end offset 5
    val s = new HttpPollMicroBatchStream("T", "restart", backoffMs = 0L,
      dropUnchanged = false)
    val restored = s.deserializeOffset("5")
    assert(restored.asInstanceOf[PollOffset].n == 5)
    // the uncommitted pre-restart range is unreplayable (in-memory poll):
    // it must come back EMPTY, not silently filled with re-numbered rows
    val lost = s.planInputPartitions(s.deserializeOffset("3"), restored)
    assert(lost.head.asInstanceOf[PollPartition].rows.isEmpty)
    // offsets never regress, and fresh ticks continue AFTER the checkpoint
    val o = s.latestOffset()
    assert(o.asInstanceOf[PollOffset].n == 6, "fresh tick must extend the checkpointed offset")
    val fresh = s.planInputPartitions(restored, o).head.asInstanceOf[PollPartition]
    assert(fresh.rows.map(_._2).toSeq == Seq(42.0))
  }

  test("backoff: after a failure, polls are skipped until the window passes (CTL-2)") {
    PriceFetchers.register("fail_once",
      { val n = new AtomicInteger(0)
        () => if (n.getAndIncrement() == 0) None else Some(1.0) })
    val s = new HttpPollMicroBatchStream("T", "fail_once",
      backoffMs = 3600L * 1000, dropUnchanged = false)
    s.latestOffset() // fails -> one hour backoff
    val after = s.latestOffset() // still inside backoff -> no fetch
    assert(after.asInstanceOf[PollOffset].n == 0)
  }

  test("dropUnchanged applies TR-1 at the source") {
    val calls = new AtomicInteger(0)
    val script = Seq(5.0, 5.0, 6.0, 6.0, 7.0)
    PriceFetchers.register("tr1", () => {
      val i = calls.getAndIncrement()
      if (i < script.length) Some(script(i)) else None
    })
    val s = new HttpPollMicroBatchStream("T", "tr1", backoffMs = 0L,
      dropUnchanged = true)
    (1 to 5).foreach(_ => s.latestOffset())
    val end = s.latestOffset()
    val got = s.planInputPartitions(s.initialOffset(), end)
      .head.asInstanceOf[PollPartition].rows.map(_._2).toSeq
    assert(got == Seq(5.0, 6.0, 7.0))
  }

  test("fetch-timeout contract: a hung fetch cannot stall the trigger thread") {
    val calls = new AtomicInteger(0)
    PriceFetchers.register("hang", () => {
      calls.incrementAndGet()
      Thread.sleep(60000) // simulated hang; interrupted by the guard
      Some(1.0)
    })
    val s = new HttpPollMicroBatchStream("T", "hang",
      backoffMs = 3600L * 1000, dropUnchanged = false, fetchTimeoutMs = 200L)
    val t0 = System.nanoTime()
    val o = s.latestOffset()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 10, f"latestOffset blocked $secs%.1f s on a hung fetch")
    assert(o.asInstanceOf[PollOffset].n == 0, "timed-out fetch must not emit a tick")
    s.latestOffset() // timeout routed to CTL-2 backoff → no second fetch
    assert(calls.get == 1, "timeout must back off like a failed fetch")
  }

  test("fetch-timeout recovery: the poll after a hang runs on a fresh thread") {
    val calls = new AtomicInteger(0)
    PriceFetchers.register("hang_once", () => {
      if (calls.getAndIncrement() == 0) Thread.sleep(60000)
      Some(7.0)
    })
    val s = new HttpPollMicroBatchStream("T", "hang_once",
      backoffMs = 0L, dropUnchanged = false, fetchTimeoutMs = 300L)
    s.latestOffset() // hangs → timeout → None (backoff 0: next poll fetches)
    val o = s.latestOffset()
    assert(o.asInstanceOf[PollOffset].n == 1, "fetch after a timeout must succeed")
  }

  test("engine integration: readStream through the V2 source delivers RawTick rows") {
    val calls = new AtomicInteger(0)
    PriceFetchers.register("engine", () => {
      val i = calls.getAndIncrement()
      if (i < 3) Some(100.0 + i) else None
    })
    val df = spark.readStream.format("graft.sources.HttpPollSource")
      .option("ticker", "MC.PA").option("fetcher", "engine").load()
    assert(df.schema.fieldNames.toSeq == Seq("ticker", "timestamp", "price"))
    val name = s"http_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table(name).count() < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
      }
    } finally q.stop()
    import spark.implicits._
    val rows = spark.table(name)
      .select("ticker", "price").as[(String, Double)].collect().sortBy(_._2)
    assert(rows.take(3).toSeq == Seq(("MC.PA", 100.0), ("MC.PA", 101.0), ("MC.PA", 102.0)))
  }
}
