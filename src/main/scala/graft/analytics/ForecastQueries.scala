package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.StableRidge
import graft.operators.{Metrics, SeqWindows, TickOps}

/** The model-in-the-loop operator surface (SURVEY §2.3/2.5/2.7) as batch
  * queries over `events` — NRM-2 frozen-params transform, ML-1/3 ridge
  * fit+predict, the ML-3+JN-1+AGG-2 backtest composition, and AGG-4's
  * mean-of-RMSE-history.
  *
  * `events.value` plays the price series per `user_id` key. Deterministic
  * parts (persistence backtest, frozen scaling, RMSE history) are
  * DuckDB-oracle-checked; the ridge model's numeric output is checked by
  * contract in `ForecasterSpec` (closed-form fit sums doubles in partition
  * order, so exact values are not cross-engine stable).
  */
object ForecastQueries {

  private val keys = Seq("user_id")
  private val order = Seq("ts_us", "event_id")
  private def w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value")

  /** ML-3 + JN-1 + AGG-2 — multi-step persistence backtest: forecast h
    * steps ahead with the current value (the persistence baseline the
    * pipeline uses below the training threshold), align with the realized
    * value h rows later (the rank-join semantics: position i pairs with
    * position i+h), and score RMSE per horizon step. */
  def persistenceBacktest(spark: SparkSession, dir: String, horizon: Int = 5): DataFrame = {
    val withLeads = ev(spark, dir).select(
      Seq(col("user_id"), col("value")) ++
        (1 to horizon).map(h => lead("value", h).over(w).as(s"l$h")): _*)
    val stackArgs = (1 to horizon).map(h => s"${h}L, l$h").mkString(", ")
    withLeads
      .select(col("value"), expr(s"stack($horizon, $stackArgs) AS (h, actual)"))
      .where(col("actual").isNotNull)
      .groupBy("h")
      .agg(round(Metrics.rmseCol(col("actual"), col("value")), 4).as("rmse"),
        count(lit(1)).as("n"))
      .orderBy("h")
  }

  /** NRM-2 — transform with FROZEN params: min/max fit on a train subset
    * only (even event_ids), then applied unchanged to every row — the
    * "apply stored scaler between refits" semantics. Values outside the
    * train range fall outside [0,1], exactly as a frozen scaler behaves. */
  def frozenScale(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val stats = e.where(col("event_id") % 2 === 0)
      .agg(min("value").as("__mn"), max("value").as("__mx"))
    e.crossJoin(broadcast(stats))
      .select(col("event_id"),
        round(TickOps.minMaxScaleExpr(col("value"), col("__mn"), col("__mx")), 6)
          .as("scaled_frozen"))
  }

  /** AGG-4 — the reference's `avg_rmse = mean(rmse_history)`
    * (`lvmh_forecaster2.py:273`): cumulative RMSE of the one-step
    * persistence forecast recomputed after every tick (the history), then
    * the running mean over that history, per user. */
  def rmseHistoryMean(spark: SparkSession, dir: String): DataFrame = {
    val withPrev = ev(spark, dir).withColumn("prev", lag("value", 1).over(w))
    val cum = withPrev.where(col("prev").isNotNull)
      .withColumn("cum_rmse", sqrt(avg(pow(col("value") - col("prev"), 2))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    cum.groupBy("user_id")
      .agg(round(avg("cum_rmse"), 4).as("avg_rmse"), count(lit(1)).as("n_history"))
  }

  /** Quantized window slot i (1-based) — the 2^-26 grid both engines
    * agree on exactly ([[StableRidge.quantize]] in Column form; Spark's
    * `floor` returns BIGINT, the divide by 2^26 is exact). */
  private def uCol(window: Column, i: Int): Column =
    floor(element_at(window, i) * StableRidge.Q + lit(0.5)) / lit(StableRidge.Q.toDouble)

  /** Inverse-scaled prediction columns from bit-stable weights: the
    * weights become plan literals, so prediction is a pure codegen'd
    * projection — no UDF, no per-row model object. Accumulation shape
    * `((w0 + w1·u1) + w2·u2)…` mirrors [[StableRidge.sqlPredict]]. */
  private def predictCols(weights: Array[Array[Double]], window: Column,
                          mn: Double, mx: Double, seqLen: Int,
                          horizon: Int): Seq[Column] =
    (0 until horizon).map { h =>
      val w = weights(h)
      val scaledPred = (1 to seqLen).foldLeft(lit(w(0)): Column) { (acc, i) =>
        acc + lit(w(i)) * uCol(window, i)
      }
      round(TickOps.minMaxInvert(scaledPred, mn, mx), 4).as(s"p${h + 1}")
    }

  /** ML-1 + ML-3 + NRM-1/2/3 end-to-end — fit one ridge forecaster on all
    * users' sliding windows of the min-max-scaled series, then emit each
    * user's next-5 forecast from their latest window, inverse-scaled back
    * to value space.
    *
    * The fit is [[StableRidge]] (exact integer Gram sums + canonical
    * Cholesky): bit-reproducible regardless of partitioning, so the query
    * hash-matches the generated DuckDB oracle — the plain
    * [[RidgeForecaster]] (order-dependent double sums) stays the generic
    * engine for ad-hoc frames and is contract-tested in ForecasterSpec. */
  def ridgeForecast(spark: SparkSession, dir: String,
                    seqLen: Int = 10, horizon: Int = 5): DataFrame = {
    val e = ev(spark, dir)
    val statsRow = e.agg(min("value"), max("value")).head()
    // empty table: no min/max — degenerate to (0,0) so scaling hits the
    // 0.0 guard and the (already empty) output is produced without an NPE
    val (mn, mx) =
      if (statsRow.isNullAt(0)) (0.0, 0.0)
      else (statsRow.getDouble(0), statsRow.getDouble(1))
    val scaled = e.withColumn("scaled",
      TickOps.minMaxScaleExpr(col("value"), lit(mn), lit(mx)))
    val samples = SeqWindows.slidingSamples(scaled, keys, order, "scaled", seqLen, horizon)
    val sums = StableRidge.gramSums(samples, seqLen, horizon)
    val weights = StableRidge.solve(sums, seqLen, horizon)
    val latest = SeqWindows.latestWindow(scaled, keys, order, "scaled", seqLen)
      .where(size(col("window")) === seqLen)
    latest.select(col("user_id") +:
        predictCols(weights, col("window"), mn, mx, seqLen, horizon): _*)
      .orderBy("user_id")
  }

  /** The NONLINEAR ML-1 rung — same end-to-end contract as
    * [[ridgeForecast]] (global min-max scale → WIN-1 sliding windows →
    * one fit → per-user next-5 forecast from the latest window, inverse
    * scaled), with [[graft.model.StableBoost]] as the model: boosted
    * depth-1 trees over the lag features, the piecewise-constant
    * nonlinear response a linear autoregression cannot represent (the
    * reference capability gap — `lvmh_forecaster2.py:62-71`'s LSTM is
    * nonlinear; ridge is not). The fit is bit-stable (all-integer
    * residual pipeline), so this is a FULL hash-oracle query: the
    * generated DuckDB mirror replays every round's split choice and leaf
    * arithmetic token-for-token. */
  def boostForecast(spark: SparkSession, dir: String, seqLen: Int = 10,
                    horizon: Int = 5, rounds: Int = 4): DataFrame = {
    import graft.model.StableBoost
    val e = ev(spark, dir)
    val statsRow = e.agg(min("value"), max("value")).head()
    val (mn, mx) =
      if (statsRow.isNullAt(0)) (0.0, 0.0)
      else (statsRow.getDouble(0), statsRow.getDouble(1))
    val scaled = e.withColumn("scaled",
      TickOps.minMaxScaleExpr(col("value"), lit(mn), lit(mx)))
    val samples = SeqWindows.slidingSamples(scaled, keys, order, "scaled", seqLen, horizon)
    val model = StableBoost.fit(samples, seqLen, horizon, rounds)
    // the fitted model becomes plan literals: per stump one integer
    // compare + CASE over the quantized window slot — a pure codegen'd
    // projection, same discipline as ModelColumns
    val latest = SeqWindows.latestWindow(scaled, keys, order, "scaled", seqLen)
      .where(size(col("window")) === seqLen)
    val quCol: Int => Column = j =>
      floor(element_at(col("window"), j) * StableRidge.Q + lit(0.5)).cast("long")
    val preds = (0 until horizon).map { h =>
      val sumQ = model.stumps(h).foldLeft(lit(model.base(h)): Column) { (acc, st) =>
        acc + when(quCol(st.j) <= st.thrQ, lit(st.leafL)).otherwise(lit(st.leafR))
      }
      round(TickOps.minMaxInvert(sumQ.cast("double") / lit(StableRidge.Q.toDouble), mn, mx), 4)
        .as(s"p${h + 1}")
    }
    latest.select(col("user_id") +: preds: _*).orderBy("user_id")
  }

  /** Per-key nonlinear ML-1 — one [[graft.model.StableBoost]] fit PER
    * user (the reference's per-ticker semantics with the nonlinear
    * model), same shape as [[ridgeForecastPerKey]]: `groupByKey(user)
    * .flatMapGroups`, each key scales on its OWN history, windows, fits
    * the boosted stumps locally ([[graft.model.StableBoost.fitLocal]] —
    * all-integer, so group iteration order cannot matter), and forecasts
    * from its latest window. Keys with < seqLen+horizon points emit
    * nothing. The per-user fit is bit-identical to what the streaming
    * state machine's boost mode replays per retrain, which is what makes
    * the stream/batch parity spec exact rather than approximate. */
  def boostForecastPerKey(spark: SparkSession, dir: String, seqLen: Int = 10,
                          horizon: Int = 5, rounds: Int = 4): DataFrame = {
    require(horizon == 5, "per-key variant emits a fixed 5-step tuple row")
    import graft.model.StableBoost
    import spark.implicits._
    val rows = ev(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    rows.groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, Double)]) =>
        val vals = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
        if (vals.length < seqLen + horizon) Iterator.empty
        else {
          val mn = vals.min; val mx = vals.max
          val scaled = vals.map(v => if (mx > mn) (v - mn) / (mx - mn) else 0.0)
          val samples = (0 to scaled.length - seqLen - horizon).map { i =>
            (scaled.slice(i, i + seqLen), scaled.slice(i + seqLen, i + seqLen + horizon))
          }
          val m = StableBoost.fitLocal(samples, seqLen, horizon, rounds)
          val p = m.predict(scaled.takeRight(seqLen))
            .map(s => if (mx > mn) s * (mx - mn) + mn else mn) // NRM-3, SQL op order
          Iterator((uid, p(0), p(1), p(2), p(3), p(4)))
        }
      }
      .toDF("user_id", "p1", "p2", "p3", "p4", "p5")
      .select(col("user_id") +: (1 to horizon).map(h =>
        round(col(s"p$h"), 4).as(s"p$h")): _*)
      .orderBy("user_id")
  }

  /** Per-key ML-1 — one ridge model PER user, the honest batch mirror of
    * the reference's per-ticker model (`lvmh_forecaster2.py:90-104`) and
    * of the streaming state machine's per-key refit: each user's series is
    * min-max scaled on its OWN history, windowed, fit with
    * [[StableRidge.fitLocalExact]] (exact integer Gram — group iteration
    * order cannot matter), and forecast from its latest window.
    *
    * Scale shape: `groupByKey(user).flatMapGroups` — one shuffle by key,
    * then each key fits locally exactly like the streaming path; no
    * per-key driver round-trips, no collect. Keys with fewer than
    * seqLen+horizon points emit nothing (no fittable window — the
    * reference returns no samples below this threshold too). */
  def ridgeForecastPerKey(spark: SparkSession, dir: String,
                          seqLen: Int = 10, horizon: Int = 5): DataFrame = {
    require(horizon == 5, "per-key variant emits a fixed 5-step tuple row")
    import spark.implicits._
    val rows = ev(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    rows.groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, Double)]) =>
        val vals = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
        if (vals.length < seqLen + horizon) Iterator.empty
        else {
          val mn = vals.min; val mx = vals.max
          val scaled = vals.map(v => if (mx > mn) (v - mn) / (mx - mn) else 0.0)
          val w = StableRidge.fitLocalExact(scaled.map(StableRidge.quantizeLong),
            seqLen, horizon)
          val u = scaled.takeRight(seqLen).map(StableRidge.quantize)
          val preds = (0 until horizon).map { h =>
            val s = StableRidge.predictScaled(w(h), u)
            if (mx > mn) s * (mx - mn) + mn else mn // NRM-3, same op order as SQL
          }
          Iterator((uid, preds(0), preds(1), preds(2), preds(3), preds(4)))
        }
      }
      .toDF("user_id", "p1", "p2", "p3", "p4", "p5")
      // round via Spark's round (BigDecimal HALF_UP) — the same rounding
      // the global variant and every other oracled query goes through
      .select(col("user_id") +: (1 to horizon).map(h =>
        round(col(s"p$h"), 4).as(s"p$h")): _*)
      .orderBy("user_id")
  }
}
