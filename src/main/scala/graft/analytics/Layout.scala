package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HilbertValue, ZValue}

/** Data-layout operators: the write-side organization passes a 100 TB
  * corpus needs so that read-side scans can skip most of it. Sorting by
  * one column gives tight per-file min/max stats on that column only;
  * z-order interleaving gives tight stats on BOTH predicate dimensions
  * at once (see [[graft.functions.ZValue]]). */
object Layout {

  /** The z-order layout key for the events table: user dimension ×
    * event-day dimension — the pair a "user X in week Y" scan predicate
    * filters on. Both dimensions are within 21 bits at every test SF;
    * at corpus scale the quantization step (here: epoch-µs → epoch-day
    * floor-div) is where a wider id would be bucketed down, and
    * [[graft.functions.ZValue]] fails loudly if that step is skipped.
    * Registered as a row-level query so the key itself is cross-engine
    * oracle-checked; the layout pass built on it
    * ([[graft.functions.ZValue.layout]]) is covered by the pruning
    * law in ZValueSpec (partition min/max boxes, the parquet row-group
    * stats analog). */
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("x"),
        expr("ts_us div 86400000000").as("y"))
      .withColumn("zval", ZValue.zvalue(col("x"), col("y")))
      .orderBy("event_id")

  /** The Hilbert layout key over the same (user, event-day) pair —
    * [[zorderKey]]'s continuous-curve sibling ([[graft.functions
    * .HilbertValue]]): better per-file min/max boxes at skewed aspect
    * ratios because consecutive keys are always grid neighbors (no
    * z-curve boundary jumps). Same quantize-first contract, same
    * cross-engine oracle discipline (the 21-step quadrant walk is
    * replayed bit-exactly in generated DuckDB SQL); the layout pass
    * built on it is covered by the pruning law in HilbertSpec. */
  def hilbertKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("x"),
        expr("ts_us div 86400000000").as("y"))
      .withColumn("hkey", HilbertValue.hilbert(col("x"), col("y")))
      .orderBy("event_id")

  /** Bits FREE per dimension inside one zone-map tile: 5 ⇒ every tile is
    * a 32×32 cell of the (x, y) grid. Anchoring tiles to fixed-size cells
    * (not key-space quadrants) keeps the manifest granularity tied to the
    * DATA extent — dimensions whose high bits are constant (epoch-day ≈
    * 19 700 here) would collapse any top-of-key quadrant scheme into a
    * single tile. */
  val CellBits = 5

  /** Zone-map manifest over the z-ordered tile grid — the per-FILE
    * min/max stats a lakehouse layout write emits (the Delta/Iceberg
    * file-stats and parquet row-group stats analog), queryable in-engine:
    * each z-prefix tile is what one [[ZValue.layout]] output file covers
    * at scale, and its manifest row carries the tile's bounding box on
    * BOTH dimensions plus its z-range. A reader prunes by intersecting
    * its predicate box with these boxes — the law ZValueSpec pins on the
    * layout itself, here materialized as the manifest consumers read.
    * Tile id = zval >> 2·[[CellBits]], so all rows in a tile share every
    * x and y bit above the low [[CellBits]] and the box is provably
    * inside one aligned 2^[[CellBits]]-square (asserted in LayoutSpec).
    * One constant-width shuffle on the tile id; partial aggregation does
    * the heavy lifting map-side; manifest row count scales with occupied
    * cells, not key-space. */
  def zoneStats(spark: SparkSession, dir: String): DataFrame = {
    val tileShift = 2 * CellBits
    Tables.events(spark, dir)
      .select(col("user_id").as("x"), expr("ts_us div 86400000000").as("y"))
      .withColumn("zval", ZValue.zvalue(col("x"), col("y")))
      .withColumn("tile", shiftright(col("zval"), tileShift))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("zval").as("z_min"), max("zval").as("z_max"))
      .orderBy("tile")
  }
}
