package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.RawTick

/** Event-time operators for streams — the surface the reference cannot
  * express at all (it is processing-time only; "late data" cannot exist
  * because rows are stamped at ingest, SURVEY §2.10) but that a
  * Spark-native engine must expose the moment ticks carry exchange
  * timestamps: tumbling/sliding event-time windows with watermark-bounded
  * state and late-data drop.
  *
  * Scale: state per (ticker, window) is bounded by the watermark horizon;
  * the aggregate is a standard partial-agg shuffle keyed by (ticker,
  * window) — no unbounded growth, no per-key serialization point.
  */
object EventTimeOps {

  /** Tumbling event-time OHLC-style stats per ticker. Append mode emits a
    * window only once its watermark passes — exactly-once finalized rows. */
  def tumblingStats(ticks: Dataset[RawTick], windowLen: String = "1 minute",
                    watermarkDelay: String = "2 minutes"): DataFrame =
    ticks.withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowLen).as("w"), col("ticker"))
      .agg(count(lit(1)).as("n_ticks"),
        min("price").as("low"), max("price").as("high"),
        avg("price").as("mean_price"))
      .select(col("ticker"), col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n_ticks"),
        col("low"), col("high"), col("mean_price"))

  /** TRUE OHLC bars per ticker — the live counterpart of the batch
    * `ts_ohlc` resample and what the reference's users actually chart
    * from a tick stream: open/close are `min_by`/`max_by` on a
    * zero-padded "(µs, price-cents)" string key — a total order even if
    * two ticks share a timestamp, so a replayed or repartitioned stream
    * finalizes the identical bar (first/last over shuffle order would
    * not). Same watermark-bounded state shape as [[tumblingStats]]:
    * min_by/max_by partials carry ONE (key, value) pair per (ticker,
    * window), append mode emits each bar exactly once when its watermark
    * passes. Prices held in exact integer cents. */
  def tumblingOhlc(ticks: Dataset[RawTick], windowLen: String = "1 minute",
                   watermarkDelay: String = "2 minutes"): DataFrame = {
    val cents = round(col("price") * 100, 0).cast("long")
    val key = format_string("%020d:%020d", unix_micros(col("timestamp")), cents)
    ticks.withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowLen).as("w"), col("ticker"))
      .agg(min_by(cents, key).as("open_c"),
        max(cents).as("high_c"), min(cents).as("low_c"),
        max_by(cents, key).as("close_c"),
        count(lit(1)).as("n_ticks"), sum(cents).as("sum_c"))
      .select(col("ticker"), col("w.start").as("window_start"),
        col("open_c"), col("high_c"), col("low_c"), col("close_c"),
        col("n_ticks"), col("sum_c"))
  }

  /** Streaming exact dedup — the streaming counterpart of
    * [[graft.analytics.Dedup.exact]] for at-least-once ingest (an HTTP
    * poller redelivering a tick, an IPC replay overlapping a batch). Keyed
    * on (ticker, timestamp, price); duplicate-tracking state is dropped
    * once the watermark passes a key, so state is bounded by the watermark
    * horizon × key arrival rate, not by stream length — the property that
    * lets this run forever at corpus scale. */
  def dedupTicks(ticks: Dataset[RawTick],
                 watermarkDelay: String = "2 minutes"): Dataset[RawTick] =
    ticks.withWatermark("timestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark("ticker", "timestamp", "price")

  /** Streaming sessionization via the native `session_window` — the
    * event-time counterpart of the batch gap-sessionize
    * (`SeriesQueries.sessionize`): a session closes when no tick arrives
    * within `gap`, and is emitted once the watermark passes its end.
    * Session state is merged incrementally per (ticker, session) — at
    * scale this is a standard keyed aggregate, not a sort-the-world. */
  def sessionStats(ticks: Dataset[RawTick], gap: String = "30 seconds",
                   watermarkDelay: String = "2 minutes"): DataFrame =
    ticks.withWatermark("timestamp", watermarkDelay)
      .groupBy(session_window(col("timestamp"), gap).as("w"), col("ticker"))
      .agg(count(lit(1)).as("n_ticks"),
        min("price").as("low"), max("price").as("high"))
      .select(col("ticker"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_ticks"), col("low"), col("high"))

  /** Sliding variant (windowLen every slide) — same watermark semantics. */
  def slidingStats(ticks: Dataset[RawTick], windowLen: String = "5 minutes",
                   slide: String = "1 minute",
                   watermarkDelay: String = "2 minutes"): DataFrame =
    ticks.withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowLen, slide).as("w"), col("ticker"))
      .agg(count(lit(1)).as("n_ticks"), avg("price").as("mean_price"))
      .select(col("ticker"), col("w.start").as("window_start"),
        col("n_ticks"), col("mean_price"))

  /** Watermarked stream-stream interval join: each forecast pairs with
    * every actual of the same ticker whose event time falls in
    * [forecast_ts, forecast_ts + tolerance] — the event-time-principled
    * counterpart of the reference's FIFO backfill pairing (SURVEY §2.6,
    * `lvmh_forecaster2.py:168-177` matches by queue order) that the batch
    * side exposes as `jn2_asof_join`/`jn3_asof_tolerance`.
    *
    * Scale: Spark derives each side's state-eviction bound from the
    * time-range predicate plus the watermarks, so buffered state is
    * (tolerance + watermark delay) × arrival rate per side — constant in
    * stream length. The equi-key on ticker keeps the join a hash
    * co-partition, never a broadcast or cross. */
  def intervalJoin(forecasts: Dataset[RawTick], actuals: Dataset[RawTick],
                   tolerance: String = "30 seconds",
                   watermarkDelay: String = "2 minutes"): DataFrame = {
    val f = forecasts.toDF("ticker", "f_ts", "forecast")
      .withWatermark("f_ts", watermarkDelay)
    val a = actuals.toDF("a_ticker", "a_ts", "price")
      .withWatermark("a_ts", watermarkDelay)
    f.join(a,
        col("ticker") === col("a_ticker") &&
          col("a_ts") >= col("f_ts") &&
          col("a_ts") <= col("f_ts") + expr(s"INTERVAL $tolerance"))
      .select(col("ticker"), col("f_ts"), col("forecast"), col("a_ts"), col("price"))
  }
}
