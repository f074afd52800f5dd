package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, executed as a bucketed equi-join.
  *
  * Spark's optimizer plans a raw `p.ts BETWEEN i.lo AND i.hi` join as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in a broadcast) — an all-pairs comparison that is quadratic in the
  * input and unusable at corpus scale. The scalable shape quantizes time
  * into fixed-width buckets: every interval is exploded to the buckets it
  * overlaps, every point lands in exactly ONE bucket, and the join becomes
  * a hash equi-join on the bucket id followed by the exact range filter.
  * Because a point belongs to a single bucket, each qualifying
  * (point, interval) pair is produced exactly once — no post-join dedup.
  *
  * Scale properties:
  *   - one shuffle each side, keyed on the bucket id (hash join; AQE's
  *     skew-join split handles a hot bucket — e.g. a flash-crowd hour);
  *   - interval fan-out is `(len / bucketWidth) + 1` rows, so choose
  *     `bucketWidth` near the TYPICAL interval length: the fan-out stays
  *     O(1) per interval while buckets stay selective. A pathological
  *     interval (≫ bucketWidth) degrades gracefully into more replicas,
  *     never into all-pairs;
  *   - both inputs are only projected and filtered before the shuffle, so
  *     column pruning and predicate pushdown reach the scans.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` rows whose
    * `[loCol, hiCol]` (inclusive both ends) contains `ptCol`. All three
    * columns must be integral (e.g. epoch-µs BIGINT); intervals must
    * satisfy `lo <= hi`. Output carries all columns of both inputs
    * except the internal bucket key.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // floor-div bucketing: `div` (integral) — Spark's `/` on longs is
    // DOUBLE division and drifts on values past 2^53. Epoch-µs values are
    // non-negative so floor == truncate; `sequence` is inclusive on both
    // ends, covering every bucket the interval touches.
    // dataset aliases qualify the containment filter, so the operator
    // works even when the two inputs share column names (e.g. both carry
    // a ts or key column); shared names DO surface as duplicate output
    // columns — project the sides before joining if that matters
    // downstream.
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$loCol div ${bucketWidth}L"),
        expr(s"$hiCol div ${bucketWidth}L")))).alias("__ivl")
    val pb = points.withColumn("__bucket", expr(s"$ptCol div ${bucketWidth}L"))
      .alias("__pts")
    pb.join(ib, Seq("__bucket"))
      .where(col(s"__pts.$ptCol") >= col(s"__ivl.$loCol") &&
        col(s"__pts.$ptCol") <= col(s"__ivl.$hiCol"))
      .drop("__bucket")
  }

  /** INTERVAL-OVERLAP join — `[aLo,aHi]` meets `[bLo,bHi]` (inclusive,
    * i.e. `aLo <= bHi AND bLo <= aHi`) — via the same bucket
    * decomposition, with the CANONICAL-BUCKET trick making each
    * qualifying pair appear EXACTLY once without any dedup shuffle: both
    * intervals contain the overlap's start `max(aLo,bLo)`, so both
    * explode the bucket that point falls in, and the pair is kept only
    * there (`__bucket == max(aLo,bLo) div width`). A naive bucket join
    * would emit a pair once per shared bucket and need a `distinct` over
    * the full pair output — a second corpus-scale shuffle this predicate
    * eliminates for free.
    *
    * Same scale properties as [[pointInInterval]] (one bucket-keyed
    * shuffle per side, O(len/width+1) fan-out, AQE-splittable hot
    * buckets). Column names must be disjoint across the two inputs —
    * rename before calling. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ab = a.withColumn("__bucket",
      explode(sequence(expr(s"$aLo div ${bucketWidth}L"),
        expr(s"$aHi div ${bucketWidth}L"))))
    val bb = b.withColumn("__bucket",
      explode(sequence(expr(s"$bLo div ${bucketWidth}L"),
        expr(s"$bHi div ${bucketWidth}L"))))
    ab.join(bb, Seq("__bucket"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("__bucket") === expr(s"greatest($aLo, $bLo) div ${bucketWidth}L"))
      .drop("__bucket")
  }
}
