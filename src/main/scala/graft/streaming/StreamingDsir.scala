package graft.streaming

import org.apache.spark.sql.Dataset

import graft.analytics.Sampling

/** A document scored by the importance gate at ingest: the exact batch
  * DSIR weight and the keep/drop decision against the frozen cutoff. */
final case class ScoredIngestDoc(doc_id: Long, dsir_w: Long, keep: Boolean)

/** Streaming counterpart of the `mix_dsir` importance gate — the
  * FROZEN-ARTIFACT serving shape (the `nrm2_frozen_scale` family law:
  * parameters fit once by the batch side, applied unchanged at ingest):
  * the bucket log-ratio table is `buckets` longs of driver-side model
  * state ([[graft.analytics.Sampling.dsirRatioTable]]), each arriving
  * document is scored ROW-LOCALLY by the JVM mirror
  * ([[graft.analytics.Sampling.localDsirWeight]], spec-pinned
  * bit-identical to the batch weight column), and the keep decision
  * compares against a frozen cutoff (e.g. the batch top-k boundary
  * weight). Stateless — no shuffle, no state store, arbitrarily
  * parallel; the 100 TB ingest cost is one scan.
  *
  * Null text emits nothing (the batch explode drops such docs from the
  * weight frame); novel stream-side vocabulary hashing into a bucket the
  * frozen model never saw contributes 0, the batch inner-join skip
  * semantics — both laws spec-asserted. */
object StreamingDsir {

  def scored(docs: Dataset[(Long, String)], lr: Array[Long],
             keepMin: Long): Dataset[ScoredIngestDoc] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, text) =>
      Sampling.localDsirWeight(text, lr).map(w => ScoredIngestDoc(id, w, w >= keepMin))
    }
  }
}
