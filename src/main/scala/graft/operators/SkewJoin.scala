package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-shuffle join sends every row of a key to ONE reduce task; a
  * dominant key (one ticker with half the ticks, one boilerplate document
  * hash) serializes onto a single straggler. Salting splits each left key
  * into `salts` sub-keys and replicates the right side across all salts,
  * so the hot key's rows spread over `salts` tasks at the cost of
  * `salts`× the (small) right side — the classic trade when AQE's skew
  * handling can't apply (e.g. the build side is too big to split, or the
  * join feeds an aggregation that must stay co-partitioned).
  *
  * The left salt is derived from xxhash64 of the whole row (via
  * `struct(*)`), NOT `rand()`: deterministic across retries and replays —
  * a failed task recomputes the same salts, so no row is lost or doubled
  * (exactly-once under retry is non-negotiable; `rand()` salting breaks
  * it). Rows identical in every column hash to the same salt, which is
  * harmless: salting only needs to spread the key's rows approximately
  * evenly, and duplicate full rows land together either way.
  */
object SkewJoin {

  /** Join types where replicating the right side is semantics-preserving:
    * the right side never emits unmatched rows. right/full outer would
    * fabricate one null-padded row per unmatched salt replica. */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(SafeJoinTypes(joinType.toLowerCase),
      s"saltedJoin cannot preserve '$joinType' semantics: the replicated right " +
        "side would emit one spurious unmatched row per salt (use inner/left/semi/anti)")
    // plan aliases (not bare Dataset column refs): when `right` derives
    // from `left` — the common "join a frame to its own aggregate" shape —
    // left(key) and right(key) resolve to the SAME attribute id, tripping
    // Spark's trivially-true-predicate self-join fallback (WARN Column).
    // Aliasing the sides pins each reference to its own subtree, the same
    // pattern BloomPrune uses for its verify join.
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong))).as("__sj_l")
    val rightExploded = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*))).as("__sj_r")
    leftSalted.join(rightExploded,
        col(s"__sj_l.`$key`") === col(s"__sj_r.`$key`") &&
          col("__sj_l.__salt") === col("__sj_r.__salt"), joinType)
      .drop(col(s"__sj_r.`$key`")) // one key column out, like join(right, Seq(key))
      .drop("__salt")
  }
}
