package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZValueSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: string-interleave the binary expansions. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until ZValue.BITS).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue matches the reference interleave, evaluated through codegen") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      ((1L << ZValue.BITS) - 1, (1L << ZValue.BITS) - 1)) ++
      Seq.fill(200)((rnd.nextLong().abs % (1L << ZValue.BITS),
        rnd.nextLong().abs % (1L << ZValue.BITS)))
    val got = cases.toDF("x", "y")
      .select(ZValue.zvalue($"x", $"y")).as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => mortonRef(x, y) },
      "codegen'd interleave diverges from the reference")
    // unit cases pin the bit convention: x even positions, y odd
    assert(mortonRef(1, 0) == 1L && mortonRef(0, 1) == 2L && mortonRef(3, 5) == 0x27L)
  }

  test("zvalue is registered for SQL and rejects unquantized input loudly") {
    assert(spark.sql("SELECT zvalue(5L, 3L) AS z").as[Long].head() == mortonRef(5, 3))
    val e = intercept[Exception] {
      Seq((1L << ZValue.BITS, 0L)).toDF("x", "y")
        .select(ZValue.zvalue($"x", $"y")).collect()
    }
    assert(e.getMessage != null)
  }

  test("z-order layout gives 2-D pruning a linear sort cannot") {
    // synthetic 256x256 grid; partitions model parquet files and their
    // (min,max) boxes model row-group stats — the pruning a scan does
    val grid = spark.range(256L * 256)
      .select(($"id" % 256).as("x"), expr("id div 256").as("y"))
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .select("x0", "x1", "y0", "y1").as[(Long, Long, Long, Long)].collect().toSeq
    def touched(bs: Seq[(Long, Long, Long, Long)],
        x0: Long, x1: Long, y0: Long, y1: Long): Int =
      bs.count { case (bx0, bx1, by0, by1) =>
        bx1 >= x0 && bx0 <= x1 && by1 >= y0 && by0 <= y1 }
    val linear = boxes(grid.repartitionByRange(16, $"x").sortWithinPartitions("x"))
    val zorder = boxes(ZValue.layout(grid, $"x", $"y", 16))
    assert(linear.size == 16 && zorder.size == 16)
    // y-only box: the linear-by-x layout cannot prune at all (every file
    // spans the full y range); the z-order layout confines it to the
    // tiles of one curve band
    val linY = touched(linear, 0, 255, 100, 115)
    val zY = touched(zorder, 0, 255, 100, 115)
    assert(linY == 16, s"expected zero y-pruning from the linear layout, got $linY")
    assert(zY <= 8, s"z-order should prune a y-box to a curve band, touched $zY/16")
    // 2-D box: both layouts prune, z-order at least as well
    assert(touched(zorder, 40, 55, 100, 115) <= 4)
  }
}
