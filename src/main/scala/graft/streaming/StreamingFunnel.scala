package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user's funnel position after a micro-batch: `seq` is the user's
  * emission counter (take the max per user for "now"), `n_views` the
  * anchor count so far, `depth` the deepest view→click→purchase chain
  * achieved so far under the window bound. */
final case class FunnelSnapshot(user_id: Long, seq: Long, n_views: Long, depth: Long)

/** Streaming counterpart of the batch `q_window_funnel`
  * ([[graft.analytics.SeriesQueries.windowFunnel]] — ClickHouse
  * `windowFunnel` semantics: per user, the deepest view→click→purchase
  * chain whose steps are each STRICTLY later than the previous and whose
  * last step lands within `windowUs` of the chain's first event; every
  * view is a candidate anchor, greedy earliest-next-step is exact for
  * the exists-a-chain question). VERDICT r12 #9 — the one batch curation
  * signal that had no ingest mirror.
  *
  * The state is NOT the user's event history. Two dominance facts shrink
  * it to O(unresolved clicks) per user:
  *  - among views awaiting their first later click, the LATEST view
  *    dominates: every pending view resolves against the same next
  *    click `c`, the depth-2 test `c ≤ t1+W` and the depth-3 deadline
  *    `t1+W` both favor the largest `t1` — so one Long suffices;
  *  - among depth-2 anchors awaiting a purchase, anchors from the same
  *    click share `t2` (max-deadline wins, one survives), anchors from
  *    different clicks have nested-incomparable `(t2, deadline]` windows
  *    — so a LIST, one entry per unresolved click, pruned on every
  *    event: a purchase finalizes every anchor with `t2 < p` (depth 3
  *    if `p ≤ deadline`, dead otherwise), and any anchor whose deadline
  *    has passed the current event time is dropped. State is therefore
  *    bounded by the clicks inside one window span per user — the same
  *    bound ClickHouse's windowFunnel aggregate state carries — not by
  *    stream length.
  *
  * Determinism: rows are sorted by (ts_us, event_type) within the
  * micro-batch group (the iterator arrives unordered); every chain
  * comparison is STRICT (`>` mirrors the batch probe at t+1µs), which
  * makes equal-timestamp processing order irrelevant; cross-batch
  * equality assumes in-order arrival (the [[StreamingTopK]] contract).
  * [[StreamingFunnelSpec]] pins final snapshots == the batch query on
  * the same rows across arbitrary micro-batch splits. */
object StreamingFunnel {

  /** A depth-2 anchor awaiting its purchase: needs p ∈ (t2, deadline]. */
  final case class PendingPurchase(t2: Long, deadline: Long)

  final case class FunnelState(nViews: Long, depth: Long, seq: Long,
                               awaitClick: Option[Long],
                               awaitPurchase: List[PendingPurchase])

  /** Per-user funnel tracking over (user_id, ts_us, event_type) rows;
    * unknown event types pass through untracked. Emits one snapshot per
    * user per micro-batch that carried rows for it. */
  def depths(events: Dataset[(Long, Long, String)],
             windowUs: Long = 21600000000L): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L, None, Nil))
          rows.toSeq.map { case (_, ts, et) => (ts, et) }.sorted.foreach {
            case (ts, et) =>
              // opportunistic prune: an anchor whose deadline precedes the
              // current event time can never see a qualifying purchase
              if (s.awaitPurchase.exists(_.deadline < ts))
                s = s.copy(awaitPurchase = s.awaitPurchase.filter(_.deadline >= ts))
              et match {
                case "view" =>
                  s = s.copy(nViews = s.nViews + 1, depth = math.max(s.depth, 1L),
                    awaitClick = Some(math.max(s.awaitClick.getOrElse(Long.MinValue), ts)))
                case "click" =>
                  s.awaitClick match {
                    case Some(t1) if t1 < ts =>
                      val s2 = s.copy(awaitClick = None)
                      s = if (ts <= t1 + windowUs)
                        s2.copy(depth = math.max(s2.depth, 2L),
                          awaitPurchase = PendingPurchase(ts, t1 + windowUs) :: s2.awaitPurchase)
                      else s2 // the anchor's first later click missed the window: dead at 1
                    case _ => () // no view strictly before this click
                  }
                case "purchase" =>
                  val (resolved, keep) = s.awaitPurchase.partition(_.t2 < ts)
                  val d = if (resolved.exists(ts <= _.deadline)) 3L else s.depth
                  s = s.copy(depth = math.max(s.depth, d), awaitPurchase = keep)
                case _ => ()
              }
          }
          s = s.copy(seq = s.seq + 1)
          state.update(s)
          if (s.nViews > 0)
            Iterator.single(FunnelSnapshot(user, s.seq, s.nViews, s.depth))
          else Iterator.empty
      }
  }
}
