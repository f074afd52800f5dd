package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.RawTick

/** A fired drift alert: `direction` is "up"/"down", `statistic` the
  * CUSUM value that crossed the threshold, `n_obs` the observations
  * since the last reset (or warm-up end), `mu0` the frozen baseline. */
final case class DriftAlert(ticker: String, ts: Timestamp, price: Double,
                            direction: String, statistic: Double,
                            n_obs: Long, mu0: Double)

/** Streaming drift detection — the ONLINE counterpart of the batch
  * [[graft.analytics.SeriesQueries.cusum]] changepoint scan. The batch
  * form centers on the full-series mean (it sees all data); a stream
  * cannot, so this is the standard Page CUSUM: the first `warmup` ticks
  * of each key freeze a baseline `mu0`, then the two one-sided
  * statistics `hi = max(0, hi + (x−mu0) − slack)` and
  * `lo = max(0, lo − (x−mu0) − slack)` accumulate, an alert fires when
  * either crosses `threshold`, and both reset (the classic
  * alert-and-restart protocol).
  *
  * Shape: `flatMapGroupsWithState` keyed by ticker — the same tool the
  * engine's forecaster state machine uses ([[StreamingPipeline]]).
  * State is O(1) per key (seven scalars), no timeout needed; rows are
  * sorted by (timestamp, price) within each micro-batch group because
  * `flatMapGroupsWithState` hands the group iterator unordered — the
  * one subtlety every stateful-streaming fold must handle.
  *
  * Ordering contract: determinism is INTRA-batch only. The fold assumes
  * in-order arrival across micro-batches (the reference's polling source
  * emits monotone timestamps); a late tick landing in a later batch folds
  * after newer ticks, so alert output can depend on micro-batch
  * boundaries for out-of-order sources. Buffering by event time behind a
  * watermark (the [[EventTimeOps]] tools) is the fix when that matters —
  * CUSUM itself has no principled late-data semantics to hide behind.
  * Memory: `rows.toSeq` materializes one key's rows for ONE micro-batch
  * (bounded by batch size / trigger interval, not by history) — the sort
  * needs them all; state across batches stays seven scalars. */
object DriftMonitor {

  final case class CusumState(warmSum: Double, warmN: Int, mu0: Double,
                              warm: Boolean, hi: Double, lo: Double, n: Long)

  def alerts(ticks: Dataset[RawTick], warmup: Int = 10,
             slack: Double = 0.0, threshold: Double = 5.0): Dataset[DriftAlert] = {
    require(warmup > 0 && threshold > 0)
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ticker: String, rows: Iterator[RawTick], state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(
            CusumState(0.0, 0, 0.0, warm = false, 0.0, 0.0, 0L))
          val out = Seq.newBuilder[DriftAlert]
          // deterministic intra-batch order (the iterator is not sorted)
          rows.toSeq.sortBy(t => (t.timestamp.getTime, t.price)).foreach { t =>
            if (!s.warm) {
              val n = s.warmN + 1
              val sum = s.warmSum + t.price
              s = if (n >= warmup)
                s.copy(warmSum = sum, warmN = n, mu0 = sum / warmup, warm = true)
              else s.copy(warmSum = sum, warmN = n)
            } else {
              val dev = t.price - s.mu0
              val hi = math.max(0.0, s.hi + dev - slack)
              val lo = math.max(0.0, s.lo - dev - slack)
              val n = s.n + 1
              if (hi > threshold) {
                out += DriftAlert(ticker, t.timestamp, t.price, "up", hi, n, s.mu0)
                s = s.copy(hi = 0.0, lo = 0.0, n = 0L)
              } else if (lo > threshold) {
                out += DriftAlert(ticker, t.timestamp, t.price, "down", lo, n, s.mu0)
                s = s.copy(hi = 0.0, lo = 0.0, n = 0L)
              } else {
                s = s.copy(hi = hi, lo = lo, n = n)
              }
            }
          }
          state.update(s)
          out.result().iterator
      }
  }
}
