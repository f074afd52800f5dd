package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.schema.RawTick

/** Throughput soak: the reference's ingest envelope is sub-1 tick/s (one
  * HTTP poll per ~20 s loop, `asyncio scraping.py:86-92`); the engine
  * must beat it by orders of magnitude. 50k ticks across 40 tickers
  * stream through the complete state machine (TR-1/TR-2, periodic refit,
  * forecast, FIFO match, RMSE) — wall-clocked end to end. */
class ThroughputSpec extends SparkSpec {
  import spark.implicits._

  test("state machine sustains >1000 ticks/s end-to-end (reference: <1)") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(21)
    val n = 50000
    val ticks = (0 until n).map { i =>
      RawTick(s"T${i % 40}", new Timestamp(1700000000000L + (i / 40) * 1000L),
        math.max(1.0, 100.0 + math.round(rnd.nextGaussian() * 100) / 100.0 * 10))
    }
    def run(): Double = {
      val ms = MemoryStream[RawTick]
      val name = s"tp_${System.nanoTime()}"
      val q = StreamingPipeline.events(ms.toDS(), StreamingPipeline.Config())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        ticks.grouped(10000).foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val processed = spark.table(name).where($"kind" === "tick").count()
      val rate = n / secs
      info(f"$n ticks in $secs%.1f s = $rate%.0f ticks/s (${processed} accepted)")
      assert(processed > 0)
      rate
    }
    // Two-tier perf gate. The loose floor is ALWAYS on: at 50 ticks/s the
    // state machine would be 100× below its measured ~6000/s — that is an
    // order-of-magnitude collapse (a driver-side loop snuck in, a per-tick
    // job), not CI noise, and it should go red everywhere. One retry
    // absorbs a one-off scheduler stall on a contended shared runner (the
    // only way a wall-clock assertion can lie); a genuine collapse fails
    // both attempts. The tight 1000/s gate stays opt-in
    // (GRAFT_PERF_ASSERT=1) because a contended runner can legitimately
    // land between the two.
    val first = run()
    val rate = if (first > 50) first else {
      info(f"floor miss at $first%.0f ticks/s — retrying once (host contention?)")
      run()
    }
    assert(rate > 50, f"throughput collapsed: $rate%.0f ticks/s (floor 50/s, both attempts)")
    if (sys.env.contains("GRAFT_PERF_ASSERT"))
      assert(rate > 1000, f"throughput below perf gate: $rate%.0f ticks/s")
  }

  // The reference's loop refits on FULL history every 10 ticks
  // (`lvmh_forecaster2.py:349-374`), so its per-cycle cost grows
  // linearly and the run degrades quadratically — BASELINE.md's
  // port-specific bar. The engine's production config caps refit
  // history (`maxHistory`, the sliding-refit window), so per-batch
  // latency must NOT trend with stream position. 10k ticks on ONE
  // ticker (maximum retrain pressure: every batch refits 10×) in 100
  // micro-batches, each wall-clocked; the gate compares late-window
  // p95 against the post-warmup window — a sustained 2× drift across
  // 45-batch windows is real degradation, while the reference's
  // linear per-batch growth would show ~2.4× here. Runs once per
  // in-loop model: the flat-latency property must survive the model
  // swap (boost refits cost more per fit but are equally bounded).
  private def retrainSoak(cfg: StreamingPipeline.Config): Unit = {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(22)
    val n = 10000
    val batchSize = 100
    val ticks = (0 until n).map { i =>
      RawTick("SOLO", new Timestamp(1700000000000L + i * 1000L),
        math.max(1.0, 100.0 + math.round(rnd.nextGaussian() * 100) / 100.0 * 10))
    }
    def run(): (Seq[Double], Long) = {
      val ms = MemoryStream[RawTick]
      val name = s"rt_${System.nanoTime()}"
      val q = StreamingPipeline.events(ms.toDS(), cfg)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      val times = Seq.newBuilder[Double]
      try {
        ticks.grouped(batchSize).foreach { b =>
          val t0 = System.nanoTime()
          ms.addData(b); q.processAllAvailable()
          times += (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      (times.result(), spark.table(name).where($"kind" === "forecast").count())
    }
    def p95(xs: Seq[Double]): Double = xs.sorted.apply((xs.size * 95) / 100 - 1)
    def ratioOf(): (Double, Long) = {
      val (times, forecasts) = run()
      val base = times.slice(10, 55) // skip JVM/codegen warmup
      val late = times.slice(55, 100)
      val r = p95(late) / p95(base)
      info(f"p95 base=${p95(base)}%.3f s late=${p95(late)}%.3f s ratio=$r%.2f " +
        f"($forecasts forecasts)")
      (r, forecasts)
    }
    val (r1, f1) = ratioOf()
    // the retrain loop really ran: ~999 refits, each emitting a forecast
    assert(f1 >= 500, s"retrain loop barely fired: $f1 forecasts")
    val ratio = if (r1 <= 2.0) r1 else {
      info(f"ratio miss at $r1%.2f — retrying once (host contention?)")
      ratioOf()._1
    }
    assert(ratio <= 2.0,
      f"per-batch latency trends with stream position: late/base p95 = $ratio%.2f " +
        "(bounded-history refit must stay flat; the reference's full-history " +
        "refit grows linearly per batch)")
  }

  test("retrain loop latency stays flat across 10k ticks (reference degrades quadratically)") {
    retrainSoak(StreamingPipeline.Config(maxHistory = 500))
  }

  test("retrain loop latency stays flat with the NONLINEAR in-loop model (boost mode)") {
    retrainSoak(StreamingPipeline.Config(maxHistory = 500, model = "boost"))
  }
}
