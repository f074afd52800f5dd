package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.Dedup

/** A near-dup candidate surfaced at ingest: `doc_a < doc_b`, `band` the
  * LSH band that collided, `est_jaccard` the signature-agreement estimate
  * (fraction of matching minhash components — an unbiased Jaccard
  * estimator; exact verification is a downstream batch concern). The same
  * pair can surface from several bands — dedup downstream if one row per
  * pair matters. */
final case class StreamDupCandidate(doc_a: Long, doc_b: Long, band: Int,
                                    est_jaccard: Double)

/** Streaming MinHash-LSH near-duplicate detection — dedup AT INGEST, the
  * online counterpart of the batch [[graft.analytics.Dedup.minhashLshPairs]]
  * (`dedup_minhash_lsh`): each arriving document is signed with the SAME
  * 16-hash KM signature the batch path computes (bit-identical — the
  * per-document JVM mirror is spec-asserted against the batch columns),
  * banded identically, and checked against the band bucket's recent
  * occupants before joining them.
  *
  * Scale shape: a document fans out to `bands` bucket groups keyed by its
  * band values — the SAME key the batch bucket-join shuffles on — so the
  * stream partitions by bucket, never all-pairs. Per-bucket state is a
  * FIFO window of the last `capacity` (doc_id, signature) pairs: O(capacity
  * × numHashes) longs per bucket REGARDLESS of stream length. A true LSH
  * collision is overwhelmingly likely to recur within any realistic
  * window for genuinely near-duplicate content; the FIFO bound is the
  * documented recall trade every bounded-state ingest dedup makes (the
  * batch sweep remains the exhaustive pass — this stage exists to stop
  * the bulk of dup mass from ever landing).
  *
  * Determinism: rows fold in doc_id order within each micro-batch group
  * (the group iterator arrives unordered; FIFO eviction and pair
  * emission are order-sensitive). Cross-batch determinism assumes
  * in-order arrival, like every stateful operator here. */
object StreamingLsh {

  final case class BucketState(docs: Seq[(Long, Seq[Long])])

  /** Shared stateful core over pre-banded rows `(bucketKey, id,
    * signature-components)`: per bucket, compare each arrival's
    * components against the FIFO window's occupants (est = fraction of
    * equal components), emit pairs at-or-over `threshold`. The bucket
    * key must start with "<band>:"; component semantics belong to the
    * caller (minhash values for text, hyperplane sign bits for
    * embeddings). */
  private[streaming] def candidatesFromBanded(
      banded: Dataset[(String, Long, Seq[Long])], threshold: Double,
      capacity: Int): Dataset[StreamDupCandidate] = {
    require(capacity > 0 && threshold > 0.0 && threshold <= 1.0)
    import banded.sparkSession.implicits._
    banded.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Seq[Long])],
         state: GroupState[BucketState]) =>
          val band = key.takeWhile(_ != ':').toInt
          var stored = state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[StreamDupCandidate]
          rows.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
            // pure FIFO: a RESIDENT id re-arriving is ignored outright —
            // no duplicate pair emissions, no eviction-position refresh
            // (ADVICE r9: the old remove-and-append was LRU-like). An id
            // already evicted is indistinguishable from new — the
            // documented bounded-state recall trade.
            if (!stored.exists(_._1 == id)) {
              stored.foreach { case (oid, osig) =>
                var m = 0; var j = 0
                val k = sig.size
                while (j < k) {
                  if (sig(j) == osig(j)) m += 1
                  j += 1
                }
                val est = m.toDouble / k
                if (est >= threshold)
                  out += StreamDupCandidate(math.min(oid, id), math.max(oid, id),
                    band, math.rint(est * 10000) / 10000)
              }
              stored = (stored :+ (id -> sig)).takeRight(capacity)
            }
          }
          state.update(BucketState(stored))
          out.result().iterator
      }
  }

  /** Text near-dup at ingest. docs: (doc_id, text); emits Append-mode
    * candidates whose estimate is minhash-component agreement. */
  def candidates(docs: Dataset[(Long, String)], n: Int = 5, bands: Int = 4,
                 rowsPerBand: Int = 4, threshold: Double = 0.5,
                 capacity: Int = 256): Dataset[StreamDupCandidate] = {
    require(bands > 0 && rowsPerBand > 0)
    import docs.sparkSession.implicits._
    val numHashes = bands * rowsPerBand
    // fan out: one (bucketKey, doc, signature) row per band — the bucket
    // key is the band's raw minhash values, exactly the batch join key
    val banded = docs.flatMap { case (id, text) =>
      Dedup.localMinhashSignature(text, n, numHashes) match {
        case Some(sig) =>
          (0 until bands).map { b =>
            val key = b.toString + ":" +
              (0 until rowsPerBand).map(r => sig(b * rowsPerBand + r)).mkString(",")
            (key, id, sig.toSeq)
          }
        case None => Nil // fewer than n tokens: no shingles, like the batch path
      }
    }
    candidatesFromBanded(banded, threshold, capacity)
  }

  /** EXACT-duplicate detection at ingest — the streaming counterpart of
    * [[graft.analytics.Dedup.exact]] and the stage a production pipeline
    * puts FIRST (identical boilerplate is the bulk of dup mass): the
    * bucket key is the md5 of the normalized text (the batch digest,
    * JVM mirror spec-asserted), the single signature component is the
    * digest's 60-bit prefix, so a pair emits iff the digests are equal
    * (threshold 1). Unlike the near-dup stages, digest equality is an
    * EQUIVALENCE relation: with in-order arrival each digest group's
    * minimum id is stored first and every later member collides with it,
    * so dropping emitted `doc_b`s at ingest provably leaves the batch
    * sweep behind unchanged — the handoff law StreamingHandoffSpec pins
    * end-to-end through `pipe_prep`. Same bounded FIFO bucket state;
    * buckets are singleton-digest, so `capacity` only matters for
    * pathological same-digest floods. */
  def exactCandidates(docs: Dataset[(Long, String)],
                      capacity: Int = 4096): Dataset[StreamDupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      Dedup.localExactDigest(text) match {
        case Some(hex) =>
          Seq((s"0:$hex", id, Seq(java.lang.Long.parseLong(hex.take(15), 16))))
        case None => Nil // null text: no digest, like the signature stages
      }
    }
    candidatesFromBanded(banded, threshold = 1.0, capacity)
  }

  /** Substring near-dup guard at ingest — the winnowed-fingerprint
    * counterpart of the batch [[Dedup.winnowedFingerprints]] /
    * `substringWinnowPairs` scale path, closing the one signal the
    * ingest family lacked: exact digests catch identical documents,
    * minhash catches shingle-set similarity, but a long VERBATIM SPAN
    * wrapped in fresh boilerplate (the Lee-et-al substring case) slips
    * both. Each arriving document is fingerprinted ROW-LOCALLY with the
    * SAME (k, w) winnowing selection the batch column computes (JVM
    * mirror, spec-asserted bit-identical), and every selected
    * fingerprint keys a bucket — the batch join key — so two documents
    * sharing any substring of ≥ k + w − 1 chars are GUARANTEED a common
    * bucket (the winnowing guarantee), and the pair surfaces the moment
    * the second copy arrives. Fingerprint equality within a bucket is
    * exact (single component, threshold 1), so precision of the bucket
    * signal is 1 at the fingerprint level; the same bounded FIFO bucket
    * state as every other ingest stage caps memory at O(buckets ×
    * capacity). Fingerprints fan out sorted so emission order is
    * deterministic within a batch. */
  def substringCandidates(docs: Dataset[(Long, String)], k: Int = 20, w: Int = 8,
                          capacity: Int = 256): Dataset[StreamDupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      Dedup.localWinnowedFingerprints(text, k, w) match {
        case Some(fps) => fps.toSeq.sorted.map(g => (s"0:$g", id, Seq(g)))
        case None => Nil // null/short/oversized text: no fingerprints, like the batch frame
      }
    }
    candidatesFromBanded(banded, threshold = 1.0, capacity)
  }

  /** CDC shared-chunk guard at ingest — the streaming counterpart of
    * [[Dedup.cdcReport]] (`dedup_cdc`), completing the ingest mirror for
    * the newest batch dedup family member: each arriving document is
    * chunked ROW-LOCALLY with the exact batch boundary arithmetic
    * ([[Dedup.localCdcChunkHashes]], spec-asserted bit-identical), and
    * every chunk digest keys a bucket — the SAME key the batch report
    * groups on. Because boundaries are content-defined, a document
    * sharing a whole chunk with an earlier arrival collides EVEN WHEN
    * the shared bytes sit at a different offset (the shift-resilience
    * law CdcSpec pins on the batch side, live at ingest). Digest
    * equality is exact (single component, threshold 1) — precision 1 at
    * the chunk level; same bounded FIFO bucket state as every ingest
    * stage. Within-doc repeated chunks fan the same bucket once
    * (distinct), and fan-out is the doc's chunk count (~len/divisor). */
  def cdcCandidates(docs: Dataset[(Long, String)], k: Int = 8,
                    divisor: Long = 64,
                    capacity: Int = 256): Dataset[StreamDupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      Dedup.localCdcChunkHashes(text, k, divisor) match {
        case Some(hs) => hs.distinct.sorted.map(h =>
          (s"0:$h", id, Seq(java.lang.Long.parseLong(h.take(15), 16))))
        case None => Nil // null/short text: no chunks, like the batch frame
      }
    }
    candidatesFromBanded(banded, threshold = 1.0, capacity)
  }

  /** A semantic-dup candidate surfaced at ingest: `vec_a < vec_b` landed
    * in the same semantic cluster (`list_id`) with exact rounded cosine
    * ≥ τ. Unlike the signature stages the estimate here IS the exact
    * batch-side similarity, so precision vs the batch dominance join's
    * candidate condition is 1. */
  final case class StreamSemanticCandidate(vec_a: Long, vec_b: Long,
                                           list_id: Long, cos: Double)

  final case class VecBucketState(docs: Seq[(Long, Seq[Double])])

  /** SEMANTIC dedup guard at ingest — the streaming counterpart of
    * [[graft.analytics.Similarity.semanticDedup]] (SemDeDup): paraphrase
    * mass the exact/minhash/substring/embedding-LSH stages cannot see.
    * The cluster index (`cents`) is a MODEL PARAMETER trained by the
    * batch side (hash seeds or Lloyd-refined — both deterministic), the
    * same way the serving ANN paths receive their centroids: each
    * arriving vector is assigned row-locally with the batch argmax
    * mirror ([[graft.analytics.Similarity.localListAssign]], same
    * rounded-cosine fold), buckets on its `list_id` — the SAME key the
    * batch dominance join shuffles on — and compares by EXACT rounded
    * cosine against the cluster's bounded FIFO residents. A pair emits
    * at-or-over `tau`, the batch candidate condition verbatim; the FIFO
    * window is the documented recall trade every bounded-state ingest
    * stage makes (the batch sweep stays exhaustive). Per-cluster state
    * is O(capacity × dims) doubles regardless of stream length; rows
    * fold in vec_id order within a micro-batch for determinism. */
  def semanticCandidates(vecs: Dataset[(Long, Seq[Double])],
                         cents: Array[(Long, Array[Double])],
                         tau: Double = 0.4,
                         capacity: Int = 256): Dataset[StreamSemanticCandidate] = {
    import vecs.sparkSession.implicits._
    import graft.analytics.Similarity
    semanticBucketSweep(vecs.flatMap { case (id, v) =>
      Similarity.localListAssign(if (v == null) null else v.toArray, cents)
        .map { case (listId, _) => (listId, id, v) }
    }, tau, capacity)
  }

  /** MULTI-ASSIGNMENT semantic guard — the ingest mirror of
    * [[graft.analytics.Similarity.semanticDedupMulti]]'s spill band: an
    * arriving vector buckets into its primary list ALWAYS and into its
    * second-nearest list iff the top-2 rounded cosines sit within `eps`
    * (the exact integer decimal-shift predicate, row-local via
    * [[graft.analytics.Similarity.localListAssignTop2]] —
    * spec-asserted bit-identical to the batch assignment columns). A
    * straddling paraphrase pair that single-assignment ingest NEVER
    * compares meets in the list between them here, exactly like the
    * batch operator; the state cost grows by the spilled fraction only
    * (a spilled vector is resident in two FIFO buckets). A pair sharing
    * BOTH lists can emit its candidate from each — consumers dedup on
    * (vec_a, vec_b), the same decision dedup the batch `distinct`
    * applies. */
  def semanticCandidatesSpilled(vecs: Dataset[(Long, Seq[Double])],
                                cents: Array[(Long, Array[Double])],
                                tau: Double = 0.4,
                                eps: Double = 0.05,
                                capacity: Int = 256): Dataset[StreamSemanticCandidate] = {
    import vecs.sparkSession.implicits._
    import graft.analytics.Similarity
    val epsI = math.round(eps * 1e4)
    semanticBucketSweep(vecs.flatMap { case (id, v) =>
      Similarity.localListAssignTop2(if (v == null) null else v.toArray, cents, epsI)
        .toSeq.flatten.map(listId => (listId, id, v))
    }, tau, capacity)
  }

  /** The shared per-cluster FIFO sweep both semantic guards run over
    * their (list_id, vec_id, vec) assignment stream. */
  private def semanticBucketSweep(assigned: Dataset[(Long, Long, Seq[Double])],
                                  tau: Double,
                                  capacity: Int): Dataset[StreamSemanticCandidate] = {
    require(capacity > 0)
    import assigned.sparkSession.implicits._
    import graft.analytics.Similarity
    assigned.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (listId: Long, rows: Iterator[(Long, Long, Seq[Double])],
         state: GroupState[VecBucketState]) =>
          var stored = state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[StreamSemanticCandidate]
          rows.toSeq.sortBy(_._2).foreach { case (_, id, vec) =>
            // pure FIFO, like candidatesFromBanded: resident re-arrivals
            // are ignored (no duplicate emissions, no position refresh)
            if (!stored.exists(_._1 == id)) {
              val va = vec.toArray
              stored.foreach { case (oid, ovec) =>
                val c = Similarity.localCosine4(va, ovec.toArray)
                if (c >= tau)
                  out += StreamSemanticCandidate(math.min(oid, id), math.max(oid, id),
                    listId, c)
              }
              stored = (stored :+ (id -> vec)).takeRight(capacity)
            }
          }
          state.update(VecBucketState(stored))
          out.result().iterator
      }
  }

  /** Embedding near-dup at ingest — the vector counterpart: signatures
    * are the SAME banded hyperplane sign bits the batch `hyperplane_sig`
    * expression computes (JVM mirror, spec-asserted bit-identical), the
    * bucket key is the packed band value (the batch LSH join key), and
    * the estimate is SIGN-BIT agreement — an unbiased angular-similarity
    * estimator (cos ≈ cos(π·(1−agreement))). Same bounded per-bucket
    * FIFO state, same determinism discipline. Vectors whose length ≠
    * `dims` are skipped, like the expression's NULL. */
  def embeddingCandidates(vecs: Dataset[(Long, Seq[Double])], dims: Int = 64,
                          bands: Int = 4, rowsPerBand: Int = 4,
                          threshold: Double = 0.875,
                          capacity: Int = 256): Dataset[StreamDupCandidate] = {
    require(bands > 0 && rowsPerBand > 0)
    import vecs.sparkSession.implicits._
    val banded = vecs.flatMap { case (id, vec) =>
      graft.functions.HyperplaneSig.signatureLocal(vec.toArray, dims, bands, rowsPerBand) match {
        case Some(sig) =>
          // components = individual sign bits (fine-grained agreement);
          // bucket key = the packed band int (coarse collision)
          val bits: Seq[Long] = (0 until bands * rowsPerBand).map { p =>
            ((sig(p / rowsPerBand) >> (p % rowsPerBand)) & 1).toLong
          }
          (0 until bands).map(b => (s"$b:${sig(b)}", id, bits))
        case None => Nil
      }
    }
    candidatesFromBanded(banded, threshold, capacity)
  }
}
