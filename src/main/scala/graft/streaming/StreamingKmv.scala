package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.KmvSketch

/** One group's distinct-cardinality gauge after a micro-batch: `seq` the
  * emission counter, `n_kept` the sketch fill (≤ k), `n_est` the KMV
  * estimate — EXACT (= n_kept) while the sketch is not full. */
final case class KmvEstimate(group: String, seq: Long, n_kept: Long, n_est: Long)

/** Streaming counterpart of the `q_kmv_distinct` cardinality signal —
  * a per-group distinct-count gauge over an unbounded stream (vocabulary
  * growth per source, id-space coverage per shard: the ingest-side
  * monitoring that decides when a dedup index or tokenizer sample is
  * stale). State per group is the SAME bounded structure the batch
  * aggregate carries — the k smallest distinct hashes — updated by the
  * identical insert-if-smaller rule, so the streamed sketch after any
  * micro-batch split is BIT-IDENTICAL to the batch aggregate over the
  * same rows (KMV state is a pure set function of the distinct values;
  * no order/batching freedom exists — [[StreamingKmvSpec]] pins the
  * equality, the strongest form of the batch/stream unification law
  * this engine asserts per family). No watermark, no timeout: the gauge
  * is monotone and O(k) per group forever. */
object StreamingKmv {

  def estimates(rows: Dataset[(String, String)], k: Int = 64): Dataset[KmvEstimate] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[(String, String)],
         state: GroupState[(Array[Long], Long)]) =>
          val (prev, seq0) = state.getOption.getOrElse((Array.empty[Long], 0L))
          val set = new java.util.TreeSet[java.lang.Long]()
          prev.foreach(h => { set.add(h); () })
          it.foreach { case (_, v) =>
            if (v != null) {
              val h = KmvSketch.hash60(v)
              if (set.size < k) set.add(h)
              else if (h < set.last()) { if (set.add(h)) set.pollLast() }
              ()
            }
          }
          val arr = new Array[Long](set.size)
          var i = 0
          val iter = set.iterator()
          while (iter.hasNext) { arr(i) = iter.next(); i += 1 }
          state.update((arr, seq0 + 1))
          val est =
            if (arr.length < k) arr.length.toLong
            // clamp the divisor: a value hashing to exactly 0 must
            // saturate the estimate, not emit Infinity (r13 ADVICE; same
            // clamp as the batch estimator and the DuckDB oracle)
            else math.round((k - 1) * KmvSketch.Hash60Range / math.max(arr.last, 1L))
          Iterator.single(KmvEstimate(group, seq0 + 1, arr.length.toLong, est))
      }
  }
}
