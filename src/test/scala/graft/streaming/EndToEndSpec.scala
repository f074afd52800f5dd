package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.schema.RawTick
import graft.sources.PriceFetchers

/** The complete reference loop in one DAG: HTTP-poll V2 source (scripted
  * fetcher) → flatMapGroupsWithState pipeline → foreachBatch fan-out →
  * CSV export — EP-1 + EP-2 of SURVEY §3 end-to-end, with no MemoryStream
  * shortcut on the ingest side. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("source -> state machine -> sinks: scripted poll drives the full pipeline") {
    // strictly increasing prices: two polls stamped in the same millisecond
    // get re-sorted by (ts, price) inside the state machine, and with all
    // prices distinct no ordering can create a consecutive-duplicate run —
    // the TR-1 acceptance count is ordering-independent (no flake)
    val script: IndexedSeq[Double] = (0 until 30).map(i => 100.0 + i * 0.37)
    val calls = new AtomicInteger(0)
    PriceFetchers.register("e2e", () => {
      val i = calls.getAndIncrement()
      if (i < script.length) Some(script(i)) else None
    })

    val out = Files.createTempDirectory("graft_e2e").toString
    val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString
    val ticks = spark.readStream
      .format("graft.sources.HttpPollSource")
      .option("ticker", "MC.PA")
      .option("fetcher", "e2e")
      .option("backoffMs", "600000") // script exhaustion parks the source
      .load()
      .as[RawTick]
    val q = StreamingPipeline.start(ticks, StreamingPipeline.Config(), out, ckpt,
      Trigger.ProcessingTime(0), console = false)
    // each trigger polls once; wait until the script is fully drained
    val deadline = System.currentTimeMillis() + 120000
    while (calls.get() <= script.length && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q.processAllAvailable()
    val files = StreamingPipeline.stopAndExport(q, spark, out,
      java.time.Instant.parse("2026-02-02T00:00:00Z"))

    assert(calls.get() > script.length, "script was not fully drained")
    val byName = files.map(f => Paths.get(f).getFileName.toString -> f).toMap
    val t1 = Files.readAllLines(Paths.get(byName("price_data_20260202_000000.csv")))
    assert(t1.get(0) == "ticker,timestamp,price,variation")
    // TR-1: one T1 row per price CHANGE in the script
    val accepted = script.foldLeft(Vector.empty[Double]) { (acc, p) =>
      if (acc.lastOption.contains(p)) acc else acc :+ p
    }
    assert(t1.size() - 1 == accepted.length,
      s"expected ${accepted.length} accepted ticks, got ${t1.size() - 1}")
    // forecasts flow once the first refit happens (>= 15 accepted ticks)
    val t3 = Files.readAllLines(Paths.get(byName("forecast_comparison_20260202_000000.csv")))
    if (accepted.length >= 15) assert(t3.size() > 1, "no forecasts reached the sink")
  }
}
