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

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects by default. The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` ([[Sessions.local]] sets
    * it at construction — not here: conf mutation inside a loader is a
    * hidden global side effect and racy under concurrent queries). We
    * expose the raw nanos (`ts_ns`), microseconds (`ts_us`, matches
    * DuckDB's `epoch_us(ts::TIMESTAMP)`) and a proper TimestampType `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via graft.Sessions.local (needs nanosAsLong=true for events.parquet)")
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000")) // integer div: ns exceeds double's 2^53
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
