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
