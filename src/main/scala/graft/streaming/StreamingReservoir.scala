package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.Sampling

/** One group's full reservoir after a micro-batch: `seq` the emission
  * counter (monotone per group), `rank` 1..min(k,|group so far|) in
  * keeper order — the row set at the group's latest `seq` IS the sample
  * a batch [[graft.analytics.Sampling.groupReservoir]] over the same
  * arrived rows would select. */
final case class ReservoirRow(group: String, seq: Long, rank: Long,
                              key: Long, weight: Long)

/** Streaming counterpart of the `sample_group_reservoir` per-domain
  * weighted sample (VERDICT r15 #5 — the sampling family's first ingest
  * mirror): an Efraimidis–Spirakis reservoir PER GROUP over an unbounded
  * stream. The ES ranking key is a pure row function (salted-md5 u,
  * e8-quantized ln, divided by weight — [[graft.analytics.Sampling
  * .localGroupEsKey]], one body with the batch column), and top-k by a
  * pure row key is a set function of the arrived rows: any micro-batch
  * split, arrival order, or partitioning yields the SAME reservoir the
  * batch window selects — the KMV-strength unification law, pinned in
  * [[StreamingReservoirSpec]] against the real corpus.
  *
  * State per group is k (es, key, weight) triples — O(k) forever, no
  * watermark, no timeout; at corpus scale the state store shards by
  * group and each arriving record costs one bounded merge. Each batch
  * emits the group's CURRENT reservoir with a bumped `seq` (a gauge,
  * like [[StreamingKmv]]): the latest `seq` per group is the live
  * sample. A re-arrival of an already-held key is dropped, so
  * re-crawled rows cannot double-fill a reservoir slot; if the
  * re-arrival carries a DIFFERENT weight (the one-weight-per-key feed
  * contract violated), the smallest weight wins whether the conflict is
  * in-batch or against held state — held entries compete in the same
  * (key, weight) sort as arriving ones, so the resolution is
  * batch-split-invariant (ADVICE r16). Entries already EVICTED (past
  * rank k) are gone — that loss is inherent to O(k) state and outside
  * the contract. */
object StreamingReservoir {

  def snapshots(rows: Dataset[(String, Long, Long)], k: Int = 10): Dataset[ReservoirRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[(String, Long, Long)],
         state: GroupState[(Vector[(Double, Long, Long)], Long)]) =>
          val (prev, seq0) = state.getOption.getOrElse((Vector.empty, 0L))
          // the group iterator arrives UNORDERED; pool held entries WITH
          // the arrivals and sort by (key, weight) before the keep-first
          // dedup, so a same-key conflict resolves to the smallest weight
          // whether it is in-batch or against state — one rule, batch-
          // split-invariant (ADVICE r16; was keep-first-arrival across
          // batches). Then keep the k best by (es desc, key asc) — the
          // batch window's exact ordering. ES is a pure (key, weight)
          // function, so held entries' stored es stays valid in the pool.
          val merged = (prev ++ it.map { case (_, key, w) =>
              (Sampling.localGroupEsKey(key, w), key, w)
            }.toSeq).sortBy(r => (r._2, r._3)).distinctBy(_._2)
            .sortBy { case (es, key, _) => (-es, key) }
            .take(k)
          state.update((merged, seq0 + 1))
          merged.iterator.zipWithIndex.map { case ((_, key, w), i) =>
            ReservoirRow(group, seq0 + 1, i + 1L, key, w)
          }
      }
  }
}
