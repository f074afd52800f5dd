package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 2-D Morton (z-order) value of two
  * non-negative BIGINT dimensions — the low [[ZValue.BITS]] bits of each
  * input interleaved (x in even bit positions, y in odd), yielding a
  * 42-bit key whose lexicographic order follows the space-filling
  * z-curve.
  *
  * Why it exists: multi-dimensional data skipping. Sorting a table by
  * ONE column makes that column's per-file min/max ranges tight and every
  * other column's ranges full-width; laying out by the z-value of two
  * predicate columns makes BOTH columns' per-file ranges narrow, so a
  * conjunctive 2-D box predicate prunes most files at scan time (the
  * layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here
  * from a first-principles expression — no table format required).
  *
  * Inputs must already be quantized to [[ZValue.BITS]]-bit range ranks
  * (e.g. a `width_bucket`/floor-div bucket, an epoch-day) — interleaving
  * RAW long values would silently discard high bits; out-of-range inputs
  * fail loudly rather than alias distant rows to near z-values. A custom
  * expression (SURVEY §7.3 ladder, step (b)) because the composed
  * `aggregate(sequence(...))` form is an interpreted higher-order lambda
  * per row on the write path of every layout job; this loop is branch-
  * free, allocation-free, and fuses into whole-stage codegen.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    val x = xa.asInstanceOf[Long]
    val y = ya.asInstanceOf[Long]
    if ((x | y) < 0 || x >= (1L << ZValue.BITS) || y >= (1L << ZValue.BITS))
      throw new IllegalArgumentException(
        s"zvalue inputs must be in [0, 2^${ZValue.BITS}): got ($x, $y) — quantize first")
    var z = 0L
    var i = 0
    while (i < ZValue.BITS) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |if (($x | $y) < 0 || $x >= (1L << ${ZValue.BITS}) || $y >= (1L << ${ZValue.BITS})) {
         |  throw new IllegalArgumentException(
         |    "zvalue inputs must be in [0, 2^${ZValue.BITS}): got (" + $x + ", " + $y + ") — quantize first");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < ${ZValue.BITS}; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: the 2-D Hilbert-curve index of two
  * non-negative BIGINT dimensions — the distance along the order-
  * [[ZValue.BITS]] Hilbert space-filling curve to cell (x, y), a 42-bit
  * key like its sibling [[ZValue]].
  *
  * Why a second curve: the z-curve is cheaper (pure interleave) but
  * takes long diagonal jumps between quadrant boundaries, so a file
  * covering one z-range can span two distant tiles — its min/max box
  * inflates and pruning weakens, worst at skewed aspect ratios (one
  * dimension's range much wider than the other's). The Hilbert curve is
  * CONTINUOUS (consecutive indices are always grid neighbors —
  * spec-asserted), so every contiguous key range is one compact connected
  * tile run and per-file boxes stay tight; it is what Databricks liquid
  * clustering and DuckDB/Iceberg layout literature reach for over
  * z-order at scale. Same quantize-first contract and loud range check
  * as [[ZValue]]; same BITS so the two keys are drop-in siblings.
  *
  * Algorithm: the classic iterative quadrant walk (Hamilton's compact
  * form): from the top bit down, accumulate the quadrant index
  * s²·((3·rx) XOR ry) and rotate/reflect the remaining sub-square into
  * standard orientation. Branch-light, allocation-free, fused into
  * whole-stage codegen via `doGenCode`. */
case class HilbertValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert"

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    var x = xa.asInstanceOf[Long]
    var y = ya.asInstanceOf[Long]
    if ((x | y) < 0 || x >= (1L << ZValue.BITS) || y >= (1L << ZValue.BITS))
      throw new IllegalArgumentException(
        s"hilbert inputs must be in [0, 2^${ZValue.BITS}): got ($x, $y) — quantize first")
    var d = 0L
    var s = 1L << (ZValue.BITS - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xin, yin) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |if (($xin | $yin) < 0 || $xin >= (1L << ${ZValue.BITS}) || $yin >= (1L << ${ZValue.BITS})) {
         |  throw new IllegalArgumentException(
         |    "hilbert inputs must be in [0, 2^${ZValue.BITS}): got (" + $xin + ", " + $yin + ") — quantize first");
         |}
         |long $x = $xin; long $y = $yin; long $d = 0L;
         |for (long $s = 1L << ${ZValue.BITS - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {
  /** Column form: `hilbert(x, y)` via the function registry
    * ([[GraftExtensions]]). */
  def hilbert(x: Column, y: Column): Column = call_function("hilbert", x, y)

  /** Hilbert layout: [[ZValue.layout]]'s continuous-curve sibling —
    * range-partition + sort by the Hilbert key so each output file is
    * one connected curve segment (no diagonal boundary jumps inflating
    * its min/max box). */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    df.withColumn("__h", hilbert(x, y))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }
}

object ZValue {
  /** Bits kept per dimension (2 dims × 21 = 42-bit keys, exact in a
    * BIGINT and in DuckDB's 64-bit arithmetic with room to spare). */
  val BITS = 21

  /** Column form: `zvalue(x, y)` via the function registry
    * ([[GraftExtensions]]). */
  def zvalue(x: Column, y: Column): Column = call_function("zvalue", x, y)

  /** Z-order layout: range-partition by the z-value of the two (already
    * quantized) dimensions and sort within partitions, so each output
    * file covers one compact z-curve segment — tight min/max on BOTH
    * dimensions. `numFiles` sizes the write (one file per partition);
    * on a cluster this is the layout pass before `.write.parquet`. */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val z = zvalue(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
