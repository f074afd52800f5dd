package graft.streaming

import org.apache.spark.sql.Dataset

import graft.analytics.Multimodal

/** Perceptual image near-dup detection AT INGEST — the streaming mirror
  * of the batch `mm_phash_dedup` chain ([[Multimodal.dHash]] →
  * [[graft.analytics.Dedup.hash64Pairs]]), completing the r14 rule that
  * every batch curation signal has an ingest counterpart (the image
  * column was the one without): each arriving payload is fingerprinted
  * ROW-LOCALLY with the SAME decoded-BMP dHash the batch pass computes
  * ([[Multimodal.localDHash]] — one shared function, bit-identical by
  * construction), banded into the SAME 4×16-bit buckets the batch join
  * shuffles on, and compared against the bucket's FIFO window through
  * the shared [[StreamingLsh.candidatesFromBanded]] core.
  *
  * The Hamming gate rides the shared core's component-agreement
  * estimator exactly: the signature components are the hash's 64 BITS,
  * so agreement = (64 − hamming)/64 and `hamming ≤ maxHamming` is the
  * threshold `(64 − maxHamming)/64`. The banding keeps the pigeonhole
  * recall guarantee (hamming ≤ 3 ⇒ some 16-bit band equal ⇒ some shared
  * bucket); the FIFO window bound is the documented recall trade every
  * bounded-state ingest stage makes. `est_jaccard` on the emitted
  * candidate is the bit-agreement fraction (hamming = 64·(1 − est)).
  */
object StreamingPhash {

  /** Shared 64-bit-fingerprint ingest core: row-local hash, the batch
    * join's 4×16-bit bands, the FIFO bucket check — parameterized by
    * the fingerprint function so the image (dHash) and audio (aHash)
    * faces are ONE body differing only in the hash, like their batch
    * queries. */
  private def fingerprintCandidates(docs: Dataset[(Long, String)],
      fp: Array[Byte] => (Long, Long), maxHamming: Int,
      capacity: Int): Dataset[StreamDupCandidate] = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16-bit banding is pigeonhole-complete only for maxHamming <= 3")
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      val data = Option(text).map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
      val (h0, h1) = fp(data)
      val bits: Seq[Long] = ((0 until 32).map(j => (h0 >> j) & 1L) ++
        (0 until 32).map(j => (h1 >> j) & 1L)).toList
      val bands = Seq(h0 & 0xFFFFL, h0 >> 16, h1 & 0xFFFFL, h1 >> 16)
      bands.zipWithIndex.map { case (bv, b) => (s"$b:$bv", id, bits) }
    }
    StreamingLsh.candidatesFromBanded(banded,
      threshold = (64 - maxHamming) / 64.0, capacity)
  }

  /** Image near-dup at ingest. docs: (doc_id, text-as-payload, exactly
    * the batch face's stand-in payload); emits Append-mode candidates
    * with bit-agreement ≥ (64 − maxHamming)/64. */
  def candidates(docs: Dataset[(Long, String)], maxHamming: Int = 3,
                 capacity: Int = 256): Dataset[StreamDupCandidate] =
    fingerprintCandidates(docs, Multimodal.localDHash, maxHamming, capacity)

  /** Audio near-dup at ingest — the `mm_ahash_dedup` mirror: the SAME
    * core over [[Multimodal.localAHash]]'s energy-envelope fingerprint. */
  def ahashCandidates(docs: Dataset[(Long, String)], maxHamming: Int = 3,
                      capacity: Int = 256): Dataset[StreamDupCandidate] =
    fingerprintCandidates(docs, Multimodal.localAHash, maxHamming, capacity)
}
