package graft.schema

import java.sql.Timestamp

/** Canonical typed schemas for the ported pipeline (SURVEY.md §1.3).
  *
  * Mirrors the reference's four tables / one stream:
  *  - T1/T2 tick table        -> [[Tick]]        (`asyncio scraping.py:14`, `lvmh_forecaster2.py:29`)
  *  - T3 forecast comparison  -> [[ForecastRow]] (`lvmh_forecaster2.py:34`)
  *  - T4 RMSE history         -> [[RmsePoint]]   (`lvmh_forecaster2.py:205-208`)
  *  - A1/A2 training tensors  -> [[WindowedSample]] (`lvmh_forecaster2.py:84-88`)
  *
  * `ticker` generalizes the reference's hard-coded single symbol
  * (`asyncio scraping.py:12`): all stateful streaming ops key by it so the
  * pipeline partitions across many symbols on a real cluster.
  */
final case class Tick(
    ticker: String,
    timestamp: Timestamp,
    price: Double,
    variation: Double)

final case class RawTick(ticker: String, timestamp: Timestamp, price: Double)

final case class ForecastRow(
    ticker: String,
    timestamp: Timestamp,
    actual_price: Option[Double],
    forecasted_price: Double)

final case class RmsePoint(ticker: String, timestamp: Timestamp, rmse: Double)

final case class WindowedSample(
    ticker: String,
    features: Array[Double], // len = sequenceLength (10)
    labels: Array[Double])   // len = forecastHorizon (5)

/** Min/max scaling parameters (NRM-1..3, `lvmh_forecaster2.py:26,79-80`).
  *
  * Degenerate min==max convention (shared with [[graft.operators.TickOps]]):
  * scale maps everything to 0.0, and invert maps everything back to the
  * constant `min` — the faithful inverse of the scale-to-0.0 guard. */
final case class ScalerParams(min: Double, max: Double) {
  def scale(x: Double): Double = if (max > min) (x - min) / (max - min) else 0.0
  def invert(y: Double): Double = if (max > min) y * (max - min) + min else min
}
