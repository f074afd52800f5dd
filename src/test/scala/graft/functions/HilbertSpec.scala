package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the xy2d quadrant walk written directly from
    * the published algorithm (rotate/reflect into standard orientation
    * per bit), kept deliberately separate from the expression's code. */
  private def hilbertRef(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (ZValue.BITS - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert matches the reference walk, evaluated through codegen") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      ((1L << ZValue.BITS) - 1, 0L), (0L, (1L << ZValue.BITS) - 1),
      ((1L << ZValue.BITS) - 1, (1L << ZValue.BITS) - 1)) ++
      Seq.fill(200)((rnd.nextLong().abs % (1L << ZValue.BITS),
        rnd.nextLong().abs % (1L << ZValue.BITS)))
    val got = cases.toDF("x", "y")
      .select(HilbertValue.hilbert($"x", $"y")).as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => hilbertRef(x, y) },
      "codegen'd quadrant walk diverges from the reference")
    // the curve starts at the origin and first walks the y edge of the
    // bottom-left quadrant (standard orientation)
    assert(hilbertRef(0, 0) == 0L && hilbertRef(0, 1) == 1L && hilbertRef(1, 1) == 2L
      && hilbertRef(1, 0) == 3L)
  }

  test("hilbert is continuous and bijective on the first-visited subsquare") {
    // The property z-order lacks and the layout argument rests on: the
    // first 4^k indices fill the 2^k x 2^k block at the curve's start
    // corner EXACTLY (bijectivity), and consecutive indices are always
    // grid neighbors (continuity, |dx|+|dy| = 1) - so any contiguous key
    // range is one connected tile run and per-file boxes stay tight.
    val side = 64
    val cells = for (x <- 0 until side; y <- 0 until side)
      yield (x.toLong, y.toLong, hilbertRef(x.toLong, y.toLong))
    val ds = cells.map(_._3)
    assert(ds.toSet == (0L until side.toLong * side).toSet,
      "first 4^k indices are not a bijection onto the start-corner block")
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, d1), (x2, y2, d2)) =>
      assert(d2 == d1 + 1)
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"curve jumps from ($x1,$y1)@$d1 to ($x2,$y2)@$d2")
    }
  }

  test("hilbert is registered for SQL and rejects unquantized input loudly") {
    assert(spark.sql("SELECT hilbert(5L, 3L) AS h").as[Long].head() == hilbertRef(5, 3))
    val e = intercept[Exception] {
      Seq((1L << ZValue.BITS, 0L)).toDF("x", "y")
        .select(HilbertValue.hilbert($"x", $"y")).collect()
    }
    assert(e.getMessage != null)
  }

  test("hilbert layout gives 2-D pruning a linear sort cannot, and holds at skewed aspect ratios") {
    // same harness as the z-order pruning law: partitions model parquet
    // files, per-partition (min,max) boxes model row-group stats
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
    val hilbert = boxes(HilbertValue.layout(grid, $"x", $"y", 16))
    assert(linear.size == 16 && hilbert.size == 16)
    // y-only band: linear-by-x cannot prune at all; the Hilbert layout
    // confines it to the files of one curve band
    assert(touched(linear, 0, 255, 100, 115) == 16)
    assert(touched(hilbert, 0, 255, 100, 115) <= 8,
      "hilbert should prune a y-band to a curve band")
    // 2-D box: strong pruning
    assert(touched(hilbert, 40, 55, 100, 115) <= 4)
    // the advertised Hilbert advantage: a SKEWED box (256:16 aspect) —
    // compare against the z-order layout of the same grid; continuity
    // must make the Hilbert boxes no worse than the z-curve's
    val zorder = boxes(ZValue.layout(grid, $"x", $"y", 16))
    val skewH = touched(hilbert, 0, 255, 120, 135)
    val skewZ = touched(zorder, 0, 255, 120, 135)
    info(s"skewed-box files touched: hilbert=$skewH zorder=$skewZ linear=16")
    assert(skewH <= skewZ,
      s"hilbert pruned worse than z-order on the skewed box: $skewH > $skewZ")
  }
}
