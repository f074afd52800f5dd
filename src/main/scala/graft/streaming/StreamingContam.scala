package graft.streaming

import org.apache.spark.sql.Dataset

import graft.analytics.{Sampling, Similarity}

/** One semantic-leak verdict surfaced at ingest: an arriving TRAIN-fold
  * document whose embedding sits within cosine ≥ τ of a frozen eval
  * vector. `cos` is the 4-dp verdict the batch side records. */
final case class StreamLeak(train_doc: Long, eval_doc: Long,
                            eval_fold: String, cos: Double)

/** Streaming counterpart of the `dedup_contam_semantic` eval-leakage
  * check — the FROZEN-ARTIFACT serving shape (the `nrm2_frozen_scale` /
  * `StreamingDsir` family law: parameters fit once by the batch side,
  * applied unchanged at ingest): the eval split's embedding matrix is
  * driver-side model state (eval sets are small by premise — this is
  * the same matrix the batch face broadcasts), each arriving document
  * is fold-assigned by the SAME hash split ([[graft.analytics.Sampling
  * .localFold]], one body with the batch column), and every train-fold
  * arrival is scored EXACTLY against the whole frozen matrix
  * ([[graft.analytics.Similarity.localCosine4]], spec-pinned to the
  * `cosine_sim` expression). Stateless — no shuffle, no state store,
  * O(|eval| · dims) per arriving row.
  *
  * Exactness note (spec-pinned in `StreamingContamSpec`): the batch
  * face generates candidates through hyperplane-LSH buckets (corpus-
  * scale, documented recall < 1), while this face is EXACT against the
  * frozen matrix — so stream ≡ the exact cross-fold sweep, and
  * batch-LSH ⊆ stream. The two bracket the true leak set: the batch
  * sweep prices corpus-wide leakage cheaply, the ingest face guarantees
  * no newly-arriving train doc slips past a frozen eval set. Non-train
  * arrivals emit nothing (eval folds are append-only by contract —
  * re-freezing the matrix is a batch-side decision). */
object StreamingContam {

  def leaks(docs: Dataset[(Long, Array[Double])],
            evalVecs: Seq[(Long, Array[Double], String)],
            threshold: Double = 0.4): Dataset[StreamLeak] = {
    import docs.sparkSession.implicits._
    val frozen = evalVecs.toArray
    docs.flatMap { case (id, vec) =>
      if (vec == null || Sampling.localFold(id) != "train") Iterator.empty
      else frozen.iterator.flatMap { case (eid, evec, efold) =>
        val c = Similarity.localCosine4(vec, evec)
        if (c >= threshold) Iterator.single(StreamLeak(id, eid, efold, c))
        else Iterator.empty
      }
    }
  }
}
