package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AGG-1/2/3/4 — error metrics and scaling aggregates (SURVEY.md §2.7;
  * `lvmh_forecaster2.py:126-148`). All are single-pass partial aggregates
  * (map-side combine, tiny shuffle of one row per group).
  */
object Metrics {

  /** AGG-1 + AGG-2 — cumulative RMSE over all rows where both actual and
    * forecast are non-null: `sqrt(avg((a-f)^2))`. */
  def rmse(df: DataFrame, actual: String, forecast: String,
           keys: Seq[String] = Nil): DataFrame = {
    val filtered = df.na.drop(Seq(actual, forecast))
    val m = sqrt(avg(pow(col(actual) - col(forecast), 2))).as("rmse")
    if (keys.isEmpty) filtered.agg(m)
    else filtered.groupBy(keys.map(col): _*).agg(m)
  }

  /** Column form, usable inside any agg. */
  def rmseCol(actual: Column, forecast: Column): Column =
    sqrt(avg(pow(actual - forecast, 2)))

  /** AGG-3/5 — min/max summary. */
  def minMax(df: DataFrame, value: String, keys: Seq[String] = Nil): DataFrame = {
    val aggs = Seq(min(col(value)).as("min_" + value), max(col(value)).as("max_" + value))
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
