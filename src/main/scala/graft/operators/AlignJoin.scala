package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JN-1 — stream-stream alignment joins (SURVEY.md §2.6;
  * `lvmh_forecaster2.py:150-185`).
  *
  * The reference pairs each arriving actual with the OLDEST forecast row
  * whose `actual_price` is still NULL — i.e. a FIFO pairing by queue order,
  * not by timestamp. Batch form: rank both sides with `row_number` and
  * equi-join on (key, rank) — a hash join after two window passes, O(n log n)
  * per key partition instead of the reference's O(n) scan per row (O(n²)
  * total). The principled variant ([[asOfJoin]]) matches on event time.
  */
object AlignJoin {

  /** FIFO rank join: left row i pairs with right row i (per key, each side
    * ordered by its own `order` columns). `"left"` join keeps unmatched left
    * rows with NULL right columns (the never-filled forecast tail).
    * Both sides shuffle once on (keys) for the window, then join on
    * (keys, __rn) — with AQE this is a local join when partitioning aligns.
    */
  def rankJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftOrder: Seq[String], rightOrder: Seq[String],
               joinType: String = "left"): DataFrame = {
    def rank(df: DataFrame, order: Seq[String]) = df.withColumn("__rn",
      row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)))
    rank(left, leftOrder)
      .join(rank(right, rightOrder), keys :+ "__rn", joinType)
      .drop("__rn")
  }

  /** As-of join (documented improvement over the reference's FIFO pairing):
    * for each left row, the latest right row with `rightTime <= leftTime`
    * (per key). Composed from built-ins — union both sides, one window pass
    * carrying the last-seen right values forward, then filter back to left
    * rows. One shuffle on keys, no range join explosion, skew-safe per key.
    *
    * `rightCols` are the right-side columns to carry (must exist in right).
    *
    * Determinism at equal `rightTime`: "latest" is ambiguous when several
    * right rows share (keys, rightTime). `rightTiebreak` fixes the
    * convention — the row with the LARGEST tiebreak tuple wins; the others
    * are dropped before the union (a `row_number` pass on the same shuffle
    * key, so no extra exchange). Without it, `last(..., ignoreNulls)` would
    * pick an engine/run-dependent row and break hash-stable results.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               rightTiebreak: Seq[String] = Nil,
               tolerance: Option[Long] = None): DataFrame = {
    val rightDedup =
      if (rightTiebreak.isEmpty) right
      else right.withColumn("__dup_rn", row_number().over(
          Window.partitionBy((keys :+ rightTime).map(col): _*)
            .orderBy(rightTiebreak.map(c => col(c).desc): _*)))
        .where(col("__dup_rn") === 1).drop("__dup_rn")
    // `tolerance` (same numeric unit as the time columns) bounds staleness:
    // a match older than leftTime - tolerance is nulled out, exactly like
    // pandas merge_asof's tolerance. Implemented by carrying the matched
    // right TIME through the same window and masking afterwards — no extra
    // shuffle, the carry is just one more last() over the existing window.
    val carry = rightCols ++ (if (tolerance.isDefined) Seq("__rt") else Nil)
    val rightWithRt = tolerance.fold(rightDedup)(_ =>
      rightDedup.withColumn("__rt", col(rightTime)))
    val lTagged = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(carry.map(c => s"__r_$c" -> lit(null)).toMap)
    val rTagged = rightWithRt.select((keys.map(col) :+ col(rightTime).as("__t")) ++
        carry.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        carry.map(c => col(s"__r_$c")): _*)
      .unionByName(rTagged.withColumns(
        left.columns.filterNot(keys.contains).map(c => s"__l_$c" -> lit(null)).toMap),
        allowMissingColumns = false)
    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val masked = tolerance.fold(carried) { tol =>
      rightCols.foldLeft(carried) { (df, c) =>
        df.withColumn(s"__r_$c",
          when(col("__t") - col("__r___rt") <= tol, col(s"__r_$c")))
      }
    }
    masked.where(col("__side") === 1)
      .select(keys.map(col) ++
        left.columns.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
