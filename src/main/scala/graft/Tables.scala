package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver-provided parquet tables
  * (`/root/repo/TESTDATA.md`). All queries load through here so that
  * source-level concerns (the nanosecond-timestamp workaround for
  * `events`, column pruning, session config) live in one place.
  */
object Tables {
  val TpchTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's parquet files each ship as ONE row group, so the scan
    * delivers a single POPULATED partition no matter how it is split —
    * every downstream narrow stage (regex, shingling, vector math,
    * map-side join probes, partial aggregates) would run on one core of
    * the cluster. Redistribute up to default parallelism first; the
    * shuffle moves only the raw table bytes once. Guarded on the ROW
    * GROUP count from the parquet footers (not the scan's byte-range
    * split count, which over-reports: a split is populated only if a row
    * group starts inside it), so a real corpus with many row groups/files
    * already scans wide and this is a no-op. Footers are read once per
    * file on the driver and memoized. */
  /** Memo key includes (modificationTime, length) so a file OVERWRITTEN at
    * the same path (regenerated test data in a long-lived session) gets a
    * fresh footer read instead of a stale row-group count; the status
    * lookup is one driver-side RPC per file, far cheaper than the footer
    * parse it guards. */
  private val rowGroupCache = scala.collection.concurrent.TrieMap[(String, Long, Long), Int]()

  private def rowGroups(spark: SparkSession, df: DataFrame): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      rowGroupCache.getOrElseUpdate((f, st.getModificationTime, st.getLen), {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.size finally r.close()
      })
    }.sum
  }

  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (rowGroups(spark, df) * 2 < target) df.repartition(target) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = spread(spark, load(spark, dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = spread(spark, load(spark, dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spread(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spread(spark, load(spark, dir, "embeddings"))

  /** `events.parquet` has shipped with two timestamp layouts across
    * driver generations: INT64 TIMESTAMP(NANOS) (which Spark's parquet
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` —
    * [[Sessions.local]] sets it at construction, so the legacy layout
    * reads as a LongType nanosecond count) and plain TIMESTAMP(MICROS)
    * (read as TimestampNTZType under the default NTZ inference). Both
    * normalize to the same three columns here: raw nanos (`ts_ns`),
    * microseconds (`ts_us`, the parity unit — matches DuckDB's
    * `epoch_us(ts::TIMESTAMP)`, which truncates ns and is identity on
    * µs), and a proper TimestampType `ts` (the session runs UTC, so the
    * NTZ→TZ cast is wall-clock-exact). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spread(spark, load(spark, dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000")) // integer div: ns exceeds double's 2^53
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        // the NTZ→TZ cast interprets the wall clock in the SESSION time
        // zone: only UTC reproduces the oracle's epoch_us. Fail fast with
        // an actionable message rather than silently shifting timestamps
        // (the nanos branch above is timezone-invariant; this one is not).
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events needs spark.sql.session.timeZone=UTC to normalize " +
            "TIMESTAMP(MICROS) events deterministically - build the session " +
            "via graft.Sessions.local or set the conf before loading")
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
    }
  }
}
