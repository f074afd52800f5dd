package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for [[Hybrid]] — RRF fusion of the lexical and vector arms. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("fusion math is exact on a constructed two-arm ranking") {
    // 1 query, 3 neighbors: n=1 is rank 1 in BOTH arms, n=2 vector-only
    // (rank 2), n=3 lexical-only (rank 2 — doc 3's text shares the rare
    // term with the query; doc 2 shares nothing)
    val docs = Seq(
      (0L, "alpha beta zebra"), // the query
      (1L, "alpha beta zebra gamma"),
      (2L, "delta epsilon"),
      (3L, "alpha zebra")
    ).toDF("doc_id", "text")
    val vecRanks = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("q_id", "n_id", "rank")
    val out = Hybrid.hybridRrf(docs, vecRanks, nQueries = 1, armK = 2, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // n_id order
    // hand-computed RRF: n1 = 1/61 + 1/61, n2 = 1/62 (vector only),
    // n3 = 1/62 (lexical only); n2 before n3 on the id tiebreak
    val rrf = out.map(_.getDouble(3))
    assert(math.abs(rrf(0) - math.rint((1.0 / 61 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(rrf(1) - math.rint((1.0 / 62) * 1e6) / 1e6) < 1e-9)
    assert(rrf(1) == rrf(2))
    // arm traces: 0 marks "arm did not surface the pair"
    assert(out.map(r => (r.getLong(4), r.getLong(5))).toSeq ==
      Seq((1L, 1L), (2L, 0L), (0L, 2L)))
  }

  test("lexical arm ranks by idf-weighted overlap with deterministic ties") {
    // rare term beats many common terms: with 6 docs, zebra's df=2 gives
    // iw=1029619 while alpha/beta/gamma (df 6/5/5) give 74108/241162 —
    // so doc 3 (alpha+zebra = 1103727) must outrank the docs sharing
    // three common terms (556432) against query doc 0
    val docs = Seq(
      (0L, "alpha beta gamma zebra"),
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha zebra"),
      (4L, "alpha beta gamma"),
      (5L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val lex = Hybrid.lexicalRanks(docs, nQueries = 1, armK = 3)
      .orderBy("rank_lex").collect()
    assert(lex.head.getLong(1) == 3L,
      s"rare-term overlap must rank first, got n_id=${lex.head.getLong(1)}")
    // identical docs 1/2/4/5 tie exactly -> id order, cut at armK=3
    assert(lex.map(_.getLong(1)).toSeq == Seq(3L, 1L, 2L))
  }

  test("a df cap above every df is the identity on the lexical ranking") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val uncapped = Hybrid.lexicalRanks(docs, 10, 20).orderBy("q_id", "rank_lex").collect().toSeq
    val capped = Hybrid.lexicalRanks(docs, 10, 20, maxDf = Some(n))
      .orderBy("q_id", "rank_lex").collect().toSeq
    assert(capped == uncapped)
  }

  test("registered query: contiguous ranks, both arms contribute, lexical signal shifts the top-5") {
    val out = Hybrid.hybridRrfQuery(spark, sfDir).cache()
    val perQ = out.groupBy("q_id").agg(count(lit(1)).as("n"),
      collect_list("rank").as("ranks")).collect()
    assert(perQ.length == 10)
    perQ.foreach { r =>
      assert(r.getSeq[Long](2).sorted.toSeq == (1L to r.getLong(1)).toSeq,
        s"ranks not contiguous for q=${r.get(0)}")
    }
    // both arms surface pairs somewhere in the fused top-5
    assert(out.where(col("rank_vec") > 0).count() > 0)
    assert(out.where(col("rank_lex") > 0).count() > 0)
    // fusion is not the vector arm alone: some fused top-5 pair was
    // surfaced only by the lexical arm (rank_vec = 0)
    assert(out.where(col("rank_vec") === 0 && col("rank_lex") > 0).count() > 0,
      "lexical arm never changed the fused top-5 — fusion is vacuous")
    out.unpersist()
  }
}
