package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch (DataFrame) forms of the reference's stateful per-row transforms
  * (SURVEY.md §2.2) and min-max normalization (§2.3). Streaming forms live
  * in [[graft.streaming]].
  *
  * All operators are keyed: the reference runs a single hard-coded ticker
  * (`asyncio scraping.py:12`) but every transform here partitions by a key
  * column set, so on a cluster each key's state is local to one task after
  * one hash shuffle, and all window functions scale out per key.
  */
object TickOps {

  private def w(keys: Seq[String], order: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)

  /** TR-1 — consecutive-change filter (`asyncio scraping.py:80-83`).
    *
    * Keeps a row iff its value differs from the *previous* row's value in
    * (key, order) sequence; the first row per key is always kept. This is
    * NOT `dropDuplicates` (global): it is dedup on consecutive values only.
    *
    * Plan shape: one shuffle on `keys`, then a single window pass — no
    * self-join. Scales linearly; skew only if one key dominates.
    */
  def changeFilter(df: DataFrame, keys: Seq[String], order: Seq[String],
                   value: String): DataFrame = {
    val prev = lag(col(value), 1).over(w(keys, order))
    df.withColumn("__prev", prev)
      .where(col("__prev").isNull || col(value) =!= col("__prev"))
      .drop("__prev")
  }

  /** TR-2 — anchored-return projection (`asyncio scraping.py:45-52`):
    * `variation = value / first_value − 1` where `first_value` is the first
    * value ever seen for the key. Single window pass, same shuffle as TR-1
    * (Catalyst reuses the exchange when composed).
    */
  def anchoredReturn(df: DataFrame, keys: Seq[String], order: Seq[String],
                     value: String, as: String = "variation"): DataFrame = {
    val firstVal = first(col(value)).over(
      w(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn(as, col(value) / firstVal - lit(1.0))
  }

  /** NRM-1 — min-max fit+transform (`lvmh_forecaster2.py:26,79-80`).
    * Global (or per-key) min/max aggregate broadcast back as a scalar map:
    * `(x − min) / (max − min)`. The aggregate is a partial (map-side)
    * min/max — one tiny shuffle; the join back is a broadcast, so the big
    * side is never re-shuffled. min==max degenerates to 0.0 (guard, matches
    * the `ticks_const` fixture edge case).
    */
  def minMaxScale(df: DataFrame, value: String, as: String = "scaled",
                  keys: Seq[String] = Nil): DataFrame = {
    val scaled = (mn: Column, mx: Column) => minMaxScaleExpr(col(value), mn, mx)
    if (keys.isEmpty) {
      val stats = df.agg(min(value).as("__mn"), max(value).as("__mx"))
      df.crossJoin(broadcast(stats))
        .withColumn(as, scaled(col("__mn"), col("__mx")))
        .drop("__mn", "__mx")
    } else {
      val stats = df.groupBy(keys.map(col): _*)
        .agg(min(value).as("__mn"), max(value).as("__mx"))
      df.join(broadcast(stats), keys)
        .withColumn(as, scaled(col("__mn"), col("__mx")))
        .drop("__mn", "__mx")
    }
  }

  /** The NRM-1 scale formula in Column form, the ONE definition of the
    * min==max degenerate-to-0.0 guard (shared by [[minMaxScale]], the
    * frozen-params transform, and the forecast queries). */
  def minMaxScaleExpr(v: Column, mn: Column, mx: Column): Column =
    when(mx > mn, (v - mn) / (mx - mn)).otherwise(lit(0.0))

  /** NRM-3 — inverse transform (`lvmh_forecaster2.py:122`): back to value
    * space given fit params. Pure projection, no shuffle. */
  def minMaxInvert(c: Column, mn: Double, mx: Double): Column =
    if (mx > mn) c * lit(mx - mn) + lit(mn) else lit(mn)
}
