package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WIN-1 / WIN-2 — count-based sliding-window sequence extraction
  * (SURVEY.md §2.4; `lvmh_forecaster2.py:73-88,112`).
  *
  * The reference windows by ROW COUNT (10 lags -> 5 labels, stride 1), not
  * by event time, so these are `rowsBetween` / `lead` windows, not
  * `window(ts, ...)` time buckets.
  */
object SeqWindows {

  private def w(keys: Seq[String], order: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)

  /** WIN-1 — for every position i (per key, in `order`), emit
    * `features = values[i..i+seqLen)` and `labels = values[i+seqLen..i+seqLen+horizon)`,
    * only when the full seqLen+horizon run exists (`lvmh_forecaster2.py:75-76`).
    * Output columns: keys ++ order ++ features:array<double>, labels:array<double>.
    *
    * Implementation: `lead(value, k)` columns assembled with `array()` — a
    * single window pass per key partition (Spark computes all leads in one
    * frame scan), no self-join, no explode. For n rows per key this emits
    * max(0, n − seqLen − horizon + 1) samples (golden law, FIXTURES.md A).
    */
  def slidingSamples(df: DataFrame, keys: Seq[String], order: Seq[String],
                     value: String, seqLen: Int = 10, horizon: Int = 5): DataFrame = {
    val win = w(keys, order)
    val feats = array((0 until seqLen).map(k => lead(col(value), k).over(win)): _*)
    val labs  = array((seqLen until seqLen + horizon).map(k => lead(col(value), k).over(win)): _*)
    df.withColumn("features", feats)
      .withColumn("labels", labs)
      // the run is complete iff the furthest lead resolved:
      .where(element_at(col("labels"), horizon).isNotNull)
      .select((keys ++ order).map(col) :+ col("features") :+ col("labels"): _*)
  }

  /** WIN-2 — latest-window extraction (`lvmh_forecaster2.py:112`): the last
    * `seqLen` values per key in `order`, returned oldest-first as one array
    * row per key. Descending row_number + filter + sort-in-collect; one
    * window pass. */
  def latestWindow(df: DataFrame, keys: Seq[String], order: Seq[String],
                   value: String, seqLen: Int = 10): DataFrame = {
    val desc_ = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).desc): _*)
    val tail = df.withColumn("__rn", row_number().over(desc_))
      .where(col("__rn") <= seqLen)
    val sortCols = order.map(col) // re-sort ascending inside each key
    tail.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(sortCols :+ col(value).as("__v"): _*)))
        .as("__s"))
      .withColumn("window", transform(col("__s"), s => s.getField("__v")))
      .drop("__s")
  }

  /** [[slidingSamples]] output in typed form
    * ([[graft.schema.WindowedSample]]) — the A1/A2 training-tensor
    * contract of SURVEY §1.1, keyed by a single ticker column. A view
    * over an existing samples frame (no second window pass). */
  def typed(samples: DataFrame, tickerCol: String)
      : org.apache.spark.sql.Dataset[graft.schema.WindowedSample] = {
    import samples.sparkSession.implicits._
    samples.select(col(tickerCol).as("ticker"), col("features"), col("labels"))
      .as[graft.schema.WindowedSample]
  }

  /** WIN-1 + [[typed]] in one call. */
  def typedSamples(df: DataFrame, tickerCol: String, order: Seq[String],
                   value: String, seqLen: Int = 10, horizon: Int = 5)
      : org.apache.spark.sql.Dataset[graft.schema.WindowedSample] =
    typed(slidingSamples(df, Seq(tickerCol), order, value, seqLen, horizon), tickerCol)

  /** WIN-2 flat form: the last `seqLen` rows per key (all columns kept),
    * tagged with their position `pos` (1 = oldest of the window). */
  def latestRows(df: DataFrame, keys: Seq[String], order: Seq[String],
                 seqLen: Int = 10): DataFrame = {
    val desc_ = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(desc_))
      .where(col("__rn") <= seqLen)
      .withColumn("pos", (lit(seqLen + 1) - col("__rn")).cast("long"))
      .drop("__rn")
  }
}
