package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.CmsSketch

/** One shard's current heavy-hitter estimates after a micro-batch:
  * `seq` is the shard's batch counter (take the max per shard for "now"),
  * `est` the CMS point estimate (≥ the true count, standard over-count). */
final case class TopKEstimate(shard: Int, seq: Long, rank: Int,
                              key: String, est: Long)

/** Streaming top-k frequency estimation — the ONLINE surface of the
  * native [[graft.functions.CmsSketch]] aggregate (whose batch query is
  * `q_cms_counts` and whose cross-batch merge equivalence is spec'd in
  * CmsSketchSpec): bounded-memory heavy hitters over an unbounded
  * key stream.
  *
  * A CMS alone cannot ENUMERATE keys, so each shard pairs its sketch
  * with a bounded candidate set — the classic "CMS + heap" heavy-hitter
  * construction: every arriving key updates the shard's matrix; a key
  * already tracked refreshes its estimate; an untracked key enters the
  * candidate set if there is room or if its estimate beats the current
  * minimum (which is evicted). Estimates are CMS point queries, so they
  * inherit the sketch contract: never under the true count, over by at
  * most eN/w with probability 1−e^−d — hence the true top-k survive in
  * the candidates whenever their counts clear the noise floor.
  *
  * Scale shape: keys hash into `shards` groups ([[CmsSketch.bucket]]
  * with a dedicated seed row, so sharding is deterministic and
  * engine-portable like everything else in the CMS family), each shard's
  * state is O(d·w + capacity) REGARDLESS of stream length — the
  * `flatMapGroupsWithState` tool [[DriftMonitor]] and the forecaster
  * state machine use, with the same determinism discipline: rows are
  * sorted within the micro-batch group (the iterator arrives unordered;
  * candidate eviction is order-sensitive even though the matrix is not),
  * and cross-batch determinism assumes in-order arrival. Global top-k =
  * merge the shards' latest emissions (k·shards candidate rows), the
  * standard scatter-gather tail.
  */
object StreamingTopK {

  /** `matrix` is the shard's d×w row-major CMS; `candidates` the bounded
    * key→estimate set; `batches` the emission sequence number. */
  final case class ShardState(matrix: Array[Long],
                              candidates: Map[String, Long],
                              batches: Long)

  /** Deterministic shard of a key: seed row `1 << 10` keeps the shard
    * hash disjoint from the matrix rows' seeds 0..d-1. */
  def shardOf(key: String, shards: Int): Int = CmsSketch.bucket(1 << 10, key, shards)

  def estimates(keys: Dataset[String], depth: Int = 4, width: Int = 256,
                k: Int = 10, shards: Int = 4, capacity: Int = 64): Dataset[TopKEstimate] = {
    require(depth > 0 && width > 0 && k > 0 && shards > 0 && capacity >= k)
    import keys.sparkSession.implicits._
    keys.groupByKey(shardOf(_, shards))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String], state: GroupState[ShardState]) =>
          val s = state.getOption.getOrElse(
            ShardState(new Array[Long](depth * width), Map.empty, 0L))
          val m = s.matrix.clone()
          var cand = s.candidates
          def pointEst(key: String): Long = {
            var best = Long.MaxValue
            var j = 0
            while (j < depth) {
              val c = m(j * width + CmsSketch.bucket(j, key, width))
              if (c < best) best = c
              j += 1
            }
            best
          }
          // sorted fold: the matrix is order-insensitive (commutative
          // increments) but candidate admission/eviction is not
          rows.toSeq.sorted.foreach { key =>
            var j = 0
            while (j < depth) {
              m(j * width + CmsSketch.bucket(j, key, width)) += 1L
              j += 1
            }
            val est = pointEst(key)
            if (cand.contains(key) || cand.size < capacity) cand += key -> est
            else {
              // choose the eviction victim by the CMS's CURRENT estimate,
              // not the stored admission-time snapshot: stored values only
              // understate (counts are monotone), so a stale minimum could
              // evict a key whose live count beats the newcomer — the
              // standard CMS+heap construction re-queries before evicting.
              // O(capacity·depth) point queries, only on full-set misses.
              val (minKey, minEst) = cand.keysIterator
                .map(ck => ck -> pointEst(ck))
                .minBy { case (ck, ce) => (ce, ck) }
              if (est > minEst) cand = cand - minKey + (key -> est)
            }
          }
          // refresh every survivor to its end-of-batch estimate so the
          // emitted ranking (and the next batch's starting snapshots) are
          // current, not admission-time values
          cand = cand.map { case (ck, _) => ck -> pointEst(ck) }
          val seq = s.batches + 1
          state.update(ShardState(m, cand, seq))
          cand.toSeq
            .sortBy { case (key, est) => (-est, key) }.take(k)
            .zipWithIndex
            .map { case ((key, est), i) => TopKEstimate(shard, seq, i + 1, key, est) }
            .iterator
      }
  }
}
