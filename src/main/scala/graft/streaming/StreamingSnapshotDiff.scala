package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document's reconciliation verdict for one crawl cycle. */
final case class DocChange(doc_id: Long, source: String, status: String, crawl: Long)

/** Streaming counterpart of the batch `ds_snapshot_diff`
  * ([[graft.analytics.CurationAudit.snapshotDiff]]): classify each
  * arriving re-crawled document against the RESIDENT snapshot instead of
  * diffing two materialized corpus versions. Input records are
  * (doc_id, source, Some(text) | None, crawl) — `None` is a tombstone
  * (the new crawl dropped the document), `crawl` the cycle id the feed
  * stamps on every record.
  *
  * Statuses mirror the batch diff exactly: `added` (no resident digest),
  * `changed` (digest differs), `unchanged` (equal), `removed`
  * (tombstone with resident state; a tombstone for an unknown id emits
  * nothing, matching the batch full-outer join where such a row cannot
  * exist). The digest is the SAME md5-hex the batch side compares
  * ([[StreamingSnapshotDiff.md5Hex]] ≡ Spark's `md5()` on UTF-8 bytes,
  * spec-pinned), so stream and batch verdicts are bit-identical.
  *
  * State is one digest + source per resident document — ~50 bytes/doc,
  * the same "digests, never text" bound as the batch join's shuffle; at
  * corpus scale that is a RocksDB-backed state store sharded by doc_id,
  * and the per-batch work is one state lookup per ARRIVING record
  * (latency tracks crawl volume, not corpus size — the `streamkeys`
  * law). Feed contract: at most one record per doc_id per micro-batch
  * (a crawl cycle emits each URL once); [[StreamingSnapshotDiffSpec]]
  * pins replay(v1)+replay(v2+tombstones) ≡ the batch diff of the same
  * two snapshots, per source and per status. */
object StreamingSnapshotDiff {

  final case class DocState(digest: String, source: String)

  /** Hex md5 of the UTF-8 bytes — bit-identical to `functions.md5`. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def changes(docs: Dataset[(Long, String, Option[String], Long)]): Dataset[DocChange] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, String, Option[String], Long)],
         state: GroupState[DocState]) =>
          // crawl cycles are ordered; within one micro-batch the feed
          // contract is one record per doc, so the sort is only a guard
          // against a multi-cycle batch arriving in one group iterator
          rows.toSeq.sortBy(_._4).flatMap { case (_, src, text, crawl) =>
            (text, state.getOption) match {
              case (Some(t), None) =>
                state.update(DocState(md5Hex(t), src))
                Some(DocChange(id, src, "added", crawl))
              case (Some(t), Some(prev)) =>
                val dig = md5Hex(t)
                state.update(DocState(dig, src))
                // the batch diff's coalesce(v1.source, v2.source) picks
                // the RESIDENT source for changed/unchanged rows, so a
                // document that migrates sources between crawls must be
                // attributed to where it lived, not where it arrived;
                // the new source still lands in state for the next cycle
                Some(DocChange(id, prev.source,
                  if (dig == prev.digest) "unchanged" else "changed", crawl))
              case (None, Some(prev)) =>
                state.remove()
                Some(DocChange(id, prev.source, "removed", crawl))
              case (None, None) => None // tombstone for an unknown id
            }
          }.iterator
      }
  }
}
