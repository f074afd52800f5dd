package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{ForecastModel, ModelColumns, PersistenceModel, RidgeForecaster}
import graft.operators.{SeqWindows, TickOps}
import graft.schema.ScalerParams

/** SURVEY §7.2 — the minimum end-to-end slice: batch replay of the whole
  * reference pipeline over a fixed tick table, answering its one real
  * query: "what are the next `horizon` prices, and how wrong have we
  * been?" (`lvmh_forecaster2.py:106-148`).
  *
  * Dataflow (every §2 operator class except the live source):
  *   ticks → TR-1 change filter → TR-2 anchored return → NRM-1 min-max fit
  *   (full-history `fit_transform`, reproducing the reference's leakage
  *   quirk for parity — SURVEY §4) → WIN-1 sliding samples → ML-1 ridge
  *   fit → backtest: ML-3 predict per anchor + NRM-3 inverse scale → JN-1
  *   alignment (position i's step-h forecast pairs with the value at
  *   position i+h — the rank-join law) → AGG-1/2 cumulative RMSE → T3/T4.
  *
  * Input schema: (ticker string, ts timestamp, price double) — timestamps
  * come from the fixture, not `now()`, so replays are deterministic
  * (SURVEY §7.4 hard part 4). All stages partition by ticker.
  */
object BatchReplay {

  final case class Config(seqLen: Int = 10, horizon: Int = 5)

  final case class Outputs(
      /** T1/T2 — ticks after TR-1 with TR-2 variation. */
      ticks: DataFrame,
      /** T3 — (ticker, ts, step, forecasted_price, actual_price nullable). */
      comparison: DataFrame,
      /** T4 — (ticker, ts, rmse) cumulative after each matched pair. */
      rmseHistory: DataFrame,
      scaler: ScalerParams,
      model: ForecastModel)

  private val keys = Seq("ticker")
  // (ts, price): the price tiebreak makes same-timestamp ticks process in
  // a defined order AND matches the streaming state machine's sort
  // (StreamingPipeline.stateFunc) — the batch/stream unification law
  // (UnificationSpec) holds even when timestamps collide.
  private val order = Seq("ts", "price")

  def run(spark: SparkSession, rawTicks: DataFrame, cfg: Config = Config()): Outputs = {
    // TR-1 + TR-2
    val ticks = TickOps.anchoredReturn(
      TickOps.changeFilter(rawTicks, keys, order, "price"),
      keys, order, "price")

    // NRM-1: global fit+transform over the full (deduped) history
    val statsRow = ticks.agg(min("price"), max("price")).head()
    val scaler =
      if (statsRow.isNullAt(0)) ScalerParams(0.0, 0.0)
      else ScalerParams(statsRow.getDouble(0), statsRow.getDouble(1))
    val scaled = ticks.withColumn("scaled",
      if (scaler.max > scaler.min)
        (col("price") - lit(scaler.min)) / lit(scaler.max - scaler.min)
      else lit(0.0))

    // WIN-1 + ML-1 (persistence fallback below the training threshold,
    // `lvmh_forecaster2.py:75-76`). ONE window pass, cached: the typed
    // A1/A2 view, the emptiness probe, the fit scan, and the backtest all
    // read the same materialized samples instead of re-running the window.
    val samples = SeqWindows.slidingSamples(scaled, keys, order, "scaled",
      cfg.seqLen, cfg.horizon).cache()
    val typed = SeqWindows.typed(samples, "ticker")
    val model: ForecastModel =
      if (typed.isEmpty) new PersistenceModel(cfg.horizon)
      else new RidgeForecaster(cfg.seqLen, cfg.horizon).fit(typed.toDF())

    // Backtest: each anchor's window predicts steps 1..horizon; the
    // step-h forecast aligns with the actual value h rows later (JN-1 by
    // construction: both sides share the anchor's rank). labels are the
    // scaled actuals, inverted back alongside the predictions (NRM-3).
    val predCols = (0 until cfg.horizon).map { h =>
      invert(ModelColumns.scaledPrediction(model, col("features"), cfg.seqLen, h),
        scaler).as(s"__f${h + 1}")
    }
    val actCols = (1 to cfg.horizon).map(h =>
      invert(element_at(col("labels"), h), scaler).as(s"__a$h"))
    val stackArgs = (1 to cfg.horizon)
      .map(h => s"${h}L, __f$h, __a$h").mkString(", ")
    val comparison = samples
      .select((keys ++ order).map(col) ++ predCols ++ actCols: _*)
      .select((keys ++ order).map(col) :+
        expr(s"stack(${cfg.horizon}, $stackArgs) AS (step, forecasted_price, actual_price)"): _*)

    // AGG-1/2: cumulative RMSE after each matched pair, in (anchor, step)
    // order — one row per pair, the reference's rmse_history.
    val wCum = Window.partitionBy(keys.map(col): _*)
      .orderBy((order.map(col) :+ col("step")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rmseHistory = comparison
      .where(col("actual_price").isNotNull && col("forecasted_price").isNotNull)
      .withColumn("rmse",
        sqrt(avg(pow(col("actual_price") - col("forecasted_price"), 2)).over(wCum)))
      .select((keys ++ order).map(col) :+ col("step") :+ col("rmse"): _*)

    Outputs(ticks, comparison, rmseHistory, scaler, model)
  }

  private def invert(c: org.apache.spark.sql.Column, s: ScalerParams) =
    if (s.max > s.min) c * lit(s.max - s.min) + lit(s.min) else lit(s.min)
}
