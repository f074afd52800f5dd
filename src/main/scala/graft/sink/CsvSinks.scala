package graft.sink

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** SNK-1..4 — CSV sinks with the reference's semantics: a single
  * header-ful CSV file whose name embeds a timestamp
  * (`lvmh_price_data_<ts>.csv`, `asyncio scraping.py:64-71`;
  * `lvmh_{actual_data,forecast_comparison,rmse_history}_<ts>.csv`,
  * `lvmh_forecaster2.py:187-211`).
  *
  * The stamp is injected by the caller (replay determinism — SURVEY §7.4
  * hard part 4), defaulting to now. Spark writes a part file per
  * partition, so the single-file contract is: coalesce(1) → write to a
  * scratch dir → rename the part file. These are END-OF-RUN exports of
  * small result tables (the reference dumps its whole in-memory tables on
  * shutdown); the streaming path appends per micro-batch through
  * [[graft.streaming.StreamingPipeline]] instead and never coalesces big
  * data to one file.
  */
object CsvSinks {

  private val stampFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  def stamp(at: Instant): String = stampFmt.format(at)

  /** Write `df` as `<dir>/<prefix>_<stamp>.csv` (header, single file).
    * Returns the written path. */
  def writeTimestampedCsv(df: DataFrame, dir: String, prefix: String,
                          at: Instant): String = {
    val spark = df.sparkSession
    val target = s"$dir/${prefix}_${stamp(at)}.csv"
    // stamp + nanos in the scratch name: concurrent exports with the same
    // prefix must never share in-flight state
    val scratch = s"$dir/.${prefix}_${stamp(at)}_${System.nanoTime()}_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(scratch)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    try {
      val parts = fs.globStatus(new Path(s"$scratch/part-*.csv"))
      require(parts.nonEmpty, s"no part file produced under $scratch")
      val tgt = new Path(target)
      // delete/rename report failure via BOOLEANS — ignoring them would
      // silently lose the only copy of the data (e.g. a leftover non-empty
      // DIRECTORY at the target makes non-recursive delete return false)
      if (fs.exists(tgt) && !fs.delete(tgt, false))
        throw new java.io.IOException(s"cannot replace existing $target")
      if (!fs.rename(parts(0).getPath, tgt))
        throw new java.io.IOException(s"rename to $target failed")
    } finally { fs.delete(new Path(scratch), true); () }
    target
  }

  /** SNK-5 — console progress line, format per `asyncio scraping.py:62`:
    * `Price: <p> | Variation: <v>% | <ts>`. */
  def progressLine(price: Double, variation: Double, ts: java.sql.Timestamp): String =
    f"Price: $price%.2f | Variation: ${variation * 100}%+.2f%% | $ts"
}
