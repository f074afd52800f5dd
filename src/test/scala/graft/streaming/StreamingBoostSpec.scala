package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{StableBoost, StableRidge}

/** The NONLINEAR model in the streaming loop (Config(model = "boost")) —
  * the role the reference's LSTM plays in its own retrain cycle. Pure
  * state-machine tests (no Spark session needed: `cycle` is the whole
  * semantics; the surrounding flatMapGroupsWithState plumbing is covered
  * by StreamingPipelineSpec under the default ridge model).
  *
  * The headline law: a streaming refit is BIT-IDENTICAL to the batch
  * `ml1_boost_forecast_per_key` arithmetic on the same history, because
  * both call the same all-integer `StableBoost.fitLocal`. The spec
  * replays the batch recipe locally (full-history min-max scale → sliding
  * windows → fitLocal → predict latest window → invert) and demands exact
  * doubles from the stream's forecast events. */
class StreamingBoostSpec extends AnyFunSuite {

  private val cfg = StreamingPipeline.Config(model = "boost")

  /** Seeded walk, no repeats (every tick accepted), length chosen so the
    * LAST tick triggers a refit: first fit at tick 15 (>= seqLen+horizon
    * with ticksSinceFit >= 10), then every 10 — 45 ticks ends on one. */
  private def series(n: Int): Vector[Double] = {
    val rnd = new scala.util.Random(77)
    var p = 100.0
    (0 until n).map { _ =>
      p = math.max(1.0, p + rnd.nextGaussian())
      math.round(p * 100) / 100.0
    }.toVector
  }

  private def drive(prices: Vector[Double]): Vector[PipelineEvent] = {
    var st = TickState.empty
    val out = Vector.newBuilder[PipelineEvent]
    prices.zipWithIndex.foreach { case (p, i) =>
      val (next, events) = StreamingPipeline.cycle(
        cfg, st, "T", new Timestamp(1700000000000L + i * 1000L), p)
      st = next
      out ++= events
    }
    out.result()
  }

  /** The batch per-key recipe on a full history — the exact arithmetic of
    * `ForecastQueries.boostForecastPerKey` for one key. */
  private def batchReplay(history: Vector[Double]): Array[Double] = {
    val seqLen = cfg.seqLen; val horizon = cfg.horizon
    val mn = history.min; val mx = history.max
    val scaled = history.map(v => if (mx > mn) (v - mn) / (mx - mn) else 0.0).toArray
    val samples = (0 to scaled.length - seqLen - horizon).map { i =>
      (scaled.slice(i, i + seqLen), scaled.slice(i + seqLen, i + seqLen + horizon))
    }
    val m = StableBoost.fitLocal(samples, seqLen, horizon, cfg.boostRounds)
    m.predict(scaled.takeRight(seqLen)).map(s => if (mx > mn) s * (mx - mn) + mn else mn)
  }

  test("a refit-tick forecast is bit-identical to the batch per-key boost arithmetic") {
    // 45 accepted ticks: refits at 15, 25, 35, 45 — the last tick both
    // refits and forecasts, so its forecast uses the full history exactly
    // like the batch query does
    val prices = series(45)
    val events = drive(prices)
    val lastTs = 1700000000000L + 44 * 1000L
    // steady state emits only the last step; its label ts = tick ts +
    // horizon * labelInterval
    val lastForecasts = events.filter(e => e.kind == "forecast" &&
      e.ts.getTime == lastTs + cfg.horizon * cfg.labelIntervalMs)
    assert(lastForecasts.size == 1, s"expected one steady-state forecast, got $lastForecasts")
    val expected = batchReplay(prices)
    assert(java.lang.Double.doubleToLongBits(lastForecasts.head.forecasted.get) ==
      java.lang.Double.doubleToLongBits(expected(cfg.horizon - 1)),
      s"stream ${lastForecasts.head.forecasted.get} != batch ${expected(cfg.horizon - 1)}")
  }

  test("encode/decode round-trip: the weights-slot encoding reproduces BoostModel.predictQ") {
    val rnd = new scala.util.Random(5)
    val samples = (0 until 300).map(_ =>
      (Array.fill(10)(rnd.nextDouble()), Array.fill(5)(rnd.nextDouble())))
    val m = StableBoost.fitLocal(samples, 10, 5, rounds = 4)
    val enc = StreamingPipeline.encodeBoost(m)
    (0 until 20).foreach { _ =>
      val qx = Array.fill(10)(StableRidge.quantizeLong(rnd.nextDouble()))
      (0 until 5).foreach { h =>
        assert(StreamingPipeline.boostPredictQ(enc(h), qx) == m.predictQ(qx, h),
          s"encoded prediction diverged at h=$h")
      }
    }
  }

  test("boost mode emits the same event cadence as ridge mode (model swap is behavior-compatible)") {
    val prices = series(45)
    val boostEvents = drive(prices)
    var st = TickState.empty
    val ridgeOut = Vector.newBuilder[PipelineEvent]
    prices.zipWithIndex.foreach { case (p, i) =>
      val (next, events) = StreamingPipeline.cycle(
        StreamingPipeline.Config(), st, "T", new Timestamp(1700000000000L + i * 1000L), p)
      st = next
      ridgeOut ++= events
    }
    val ridgeEvents = ridgeOut.result()
    // same kinds in the same order with the same seq numbers — the models
    // differ ONLY in the forecasted values
    assert(boostEvents.map(e => (e.kind, e.step, e.seq, e.ts)) ==
      ridgeEvents.map(e => (e.kind, e.step, e.seq, e.ts)))
  }
}
