package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One threshold notch's cumulative tuning gauge after a micro-batch:
  * `seq` the emission counter, `n_pairs` distinct near-dup pairs whose
  * signature-agreement estimate reached the notch so far, `n_docs` the
  * distinct documents those pairs touch — the live version of one
  * `dedup_threshold_sweep` row. */
final case class TauGauge(tau_e4: Long, seq: Long, n_pairs: Long, n_docs: Long)

/** Streaming counterpart of the `dedup_threshold_sweep` tuning table
  * (VERDICT r15 #6 — the dedup family's last batch-only signal): a
  * per-notch gauge of how much near-dup mass each candidate threshold τ
  * would catch, maintained AT INGEST over the LSH candidate stream
  * ([[StreamingLsh.candidates]] — the same banded machinery, so the
  * gauge costs nothing the ingest dedup stage doesn't already pay).
  *
  * Semantics note, mirrored from the family split the batch side already
  * makes: the batch sweep prices notches by EXACT n-gram Jaccard (it can
  * re-read both texts); a bounded-state ingest stage holds signatures,
  * not text, so the stream gauge prices notches by the SIGNATURE-
  * AGREEMENT estimate — exactly `dedup_minhash_lsh`'s estimate-vs-exact
  * relationship, and the reason this face is a gauge (tuning signal),
  * not the tuning table's oracle twin. [[StreamingTauSweepSpec]] pins
  * the gauge ≡ a batch-side twin computed from the SAME signatures
  * (per-pair agreement over banded candidates), per notch, under
  * arbitrary batch splits, plus τ-monotonicity.
  *
  * Scale shape: input is the PAIR stream (dup-mass-sized — the LSH
  * premise is that pairs are rare relative to the corpus); ONE state
  * holds each distinct pair ONCE with its e4 estimate, keyed at the
  * sweep floor, and every notch's cumulative counts are DERIVED from
  * that single set at emission (ADVICE r16: the previous per-notch
  * grouping duplicated the pair set into every notch a pair cleared —
  * an O(notches × pairs) state bound for an O(pairs) fact). The
  * derivation is O(pairs × notches) compute per batch over a
  * dup-mass-sized map — arithmetic, not state. The single state group
  * serializes the gauge's merge step, which is the right trade: the
  * pair stream is the rare-event residue of the banded stage (the
  * parallel part), and the per-notch doc-distinct counts could not be
  * sharded without double-counting docs across shards anyway.
  *
  * STATE CEILING (ADVICE r17): the O(pairs) bound above is the
  * dup-mass PREMISE, not a mechanism — a pathological feed (every doc
  * a near-dup of every other) would grow the single pair map without
  * bound inside one state task. `maxPairs` makes the ceiling explicit:
  * the map holds at most that many distinct pairs (~40 bytes/entry in
  * the state store — the 4M default is ~160 MB, comfortably inside one
  * executor), and the floor-clearing pair that would EXCEED it fails
  * the query LOUDLY instead of silently evicting — an evicted pair
  * would undercount every notch invisibly, which is worse than a page;
  * the operator answer to a legitimate overflow is raising the sweep
  * floor (fewer floor-clearing pairs) or re-running the batch sweep,
  * both of which the error message states. */
object StreamingTauSweep {

  def gauge(cands: Dataset[StreamDupCandidate], tausE4: Seq[Long],
            maxPairs: Long = 4000000L): Dataset[TauGauge] = {
    require(tausE4.nonEmpty && tausE4.forall(t => t > 0 && t <= 10000))
    require(maxPairs > 0)
    import cands.sparkSession.implicits._
    val notches = tausE4.distinct.sorted
    val floor = notches.head
    cands.flatMap { c =>
        // the candidate's 4-dp estimate back on the e4 integer grid the
        // batch sweep's notches live on; only floor-clearing pairs enter
        val j4 = math.rint(c.est_jaccard * 10000).toLong
        if (j4 >= floor) Iterator.single((c.doc_a, c.doc_b, j4)) else Iterator.empty
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Map[(Long, Long), Long], Long)]) =>
          val (prev, seq0) = state.getOption.getOrElse((Map.empty[(Long, Long), Long], 0L))
          // distinct pairs: the same pair can surface from several bands
          // (and re-surface across batches) — the gauge counts it once,
          // like the batch sweep's verified-pair input. A re-surfacing
          // pair's estimate is signature-determined, so held == arriving;
          // keep the held entry.
          val pairs = rows.foldLeft(prev) { case (acc, (a, b, j4)) =>
            if (acc.contains((a, b))) acc
            else if (acc.size >= maxPairs)
              sys.error(s"StreamingTauSweep: distinct floor-clearing pairs exceeded " +
                s"maxPairs=$maxPairs — the dup-mass premise does not hold for this " +
                "feed; raise the sweep floor (fewer floor-clearing pairs), raise " +
                "maxPairs, or fall back to the batch dedup_threshold_sweep")
            else acc.updated((a, b), j4)
          }
          state.update((pairs, seq0 + 1))
          notches.iterator.map { t =>
            var nPairs = 0L
            val docs = scala.collection.mutable.LongMap.empty[Unit]
            pairs.foreach { case ((a, b), j4) =>
              if (j4 >= t) { nPairs += 1; docs.update(a, ()); docs.update(b, ()) }
            }
            TauGauge(t, seq0 + 1, nPairs, docs.size.toLong)
          }
      }
  }

  /** Text face: sign + band + bucket-check arriving documents at the
    * sweep FLOOR (the batch sweep's one-pass-at-min-τ design), then
    * gauge every notch from the one candidate stream. The LSH filter
    * runs HALF A GRID UNIT below the floor notch: the candidate stage
    * compares the raw agreement fraction while the gauge counts on the
    * rint·e4 grid, so a fraction that ROUNDS UP to the floor (possible
    * whenever bands·rowsPerBand does not divide 10000, e.g. 15
    * components at τ 4667) must still reach the gauge — at the default
    * 16-component geometry every estimate is an exact multiple of 625
    * and the two cutoffs coincide. */
  def gaugeOverText(docs: Dataset[(Long, String)], tausE4: Seq[Long],
                    n: Int = 5, bands: Int = 4, rowsPerBand: Int = 4,
                    capacity: Int = 256): Dataset[TauGauge] =
    gauge(StreamingLsh.candidates(docs, n, bands, rowsPerBand,
      threshold = (tausE4.min - 0.5) / 10000.0, capacity), tausE4)
}
