package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the curation-observability tables (snapshot diff,
  * length-bucket waste, n-gram novelty, source-KL drift) — the oracle
  * gate pins cross-engine equality; these pin the semantics. */
class CurationAuditSpec extends SparkSpec {

  test("snapshot diff statuses partition the id-union and match direct set ops") {
    val docs = graft.Tables.documents(spark, sfDir)
    val v1 = CurationAudit.snapshotV1(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val v2 = CurationAudit.snapshotV2(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val d = CurationAudit.snapshotDiff(spark, sfDir).collect()
    assert(d.map(_.getLong(1)).sum == (v2 -- v1).size, "n_added == |v2 \\ v1|")
    assert(d.map(_.getLong(2)).sum == (v1 -- v2).size, "n_removed == |v1 \\ v2|")
    assert(d.map(_.getLong(5)).sum == (v1 union v2).size, "n_total == |v1 ∪ v2|")
    // changed docs are exactly the chg-bucket survivors present in both
    // whose re-extraction actually shortens the text (a ≤100-char doc's
    // "re-extract" is the identity, so its digest — and status — is
    // unchanged)
    val changed = CurationAudit.snapshotV2(docs)
      .where(graft.analytics.Sampling.hashBucket(
        concat(lit("chg:"), col("doc_id").cast("string")), 1000) < 100 &&
        length(col("text")) === 100)
      .join(docs.where(length(col("text")) > 100).select("doc_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(d.map(_.getLong(3)).sum == (changed intersect v1).size)
    assert(d.forall(r => r.getLong(6) >= 0 && r.getLong(6) <= 1000), "churn_pm in [0,1000]")
  }

  test("length buckets: powers of two, each doc in its tightest bucket, totals add up") {
    val b = CurationAudit.lengthBuckets(spark, sfDir).collect()
    assert(b.forall(r => java.lang.Long.bitCount(r.getLong(0)) == 1),
      "bucket_top must be a power of two")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(b.map(_.getLong(1)).sum == nDocs, "buckets partition the corpus")
    // tightness: a doc of n tokens belongs to bucket_top iff
    // bucket_top/2 < n <= bucket_top — check via per-bucket min/max
    val perDoc = graft.Tables.documents(spark, sfDir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(_.getLong(0))
    for (row <- b) {
      val (top, cnt) = (row.getLong(0), row.getLong(1))
      val inBucket = perDoc.count(n => n <= top && (top == 1L || n > top / 2))
      assert(inBucket == cnt, s"bucket $top: $cnt rows vs direct count $inBucket")
    }
    assert(b.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 1000), "waste_pm in [0,1000)")
  }

  test("n-gram novelty: per-mille bounds, reference docs excluded, one doc re-derived") {
    val nov = CurationAudit.ngramNovelty(spark, sfDir).collect()
    assert(nov.nonEmpty)
    assert(nov.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000))
    assert(nov.forall(r => r.getLong(2) <= r.getLong(1)), "n_novel <= n_tri")
    val refIds = graft.Tables.documents(spark, sfDir)
      .where(graft.analytics.Sampling.hashBucket(
        concat(lit("ref:"), col("doc_id").cast("string")), 1000) < 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nov.forall(r => !refIds(r.getLong(0))), "reference slice never scored")
    // re-derive one document's trigram sets directly
    val docId = nov.head.getLong(0)
    def tris(s: String): Set[String] =
      s.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val byId = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val refTris = refIds.flatMap(id => tris(byId(id)))
    val mine = tris(byId(docId))
    assert(nov.head.getLong(1) == mine.size)
    assert(nov.head.getLong(2) == (mine -- refTris).size)
  }

  test("source KL: nonnegative, token totals recover the corpus, uniform source ~ 0") {
    val kl = CurationAudit.sourceKl(spark, sfDir).collect()
    assert(kl.length == graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count())
    assert(kl.forall(_.getLong(3) >= 0), "KL(p||q) >= 0 (Gibbs)")
    val totalTokens = graft.Tables.documents(spark, sfDir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(kl.map(_.getLong(1)).sum == totalTokens)
    // sanity on the metric itself: a synthetic corpus where one source IS
    // the corpus distribution must score (near-)zero against it
    import spark.implicits._
    val synth = Seq.tabulate(64)(i => (s"w$i w$i common", "a")) ++
      Seq.tabulate(64)(i => (s"w$i w$i common", "b"))
    val df = synth.toDF("text", "source")
    def lnE8(c: org.apache.spark.sql.Column) = round(log(c) * 1e8, 0).cast("long")
    val toks = df.select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val bySrc = toks.groupBy("source", "term").agg(count(lit(1)).as("cs"))
    val byTerm = bySrc.groupBy("term").agg(sum("cs").as("c"))
    val out = bySrc.join(byTerm, "term")
      .groupBy("source")
      .agg(sum(col("cs") * (lnE8(col("cs") * 2) - lnE8(col("c")))).as("s"))
      .collect()
    // identical halves: cs*2 == c for every term, so every dln is ln(1)=0
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("label drift: bounds, coverage, and the single-label / mirror identities") {
    val d = CurationAudit.labelDrift(spark, sfDir).collect()
    val emb = graft.Tables.embeddings(spark, sfDir)
    assert(d.map(_.getLong(1)).sum == emb.count(), "n_vecs partitions the table")
    assert(d.forall(r => r.getDouble(3) >= 0.0), "dist >= 0")
    assert(d.forall(r => math.abs(r.getDouble(4)) <= 1.0 + 1e-9), "|cos| <= 1")
    import spark.implicits._
    // one label == the corpus: its centroid IS the corpus centroid
    val single = Seq((0L, Array(1.0f, 2.0f, -3.0f)), (1L, Array(0.5f, -1.0f, 2.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(7L))
    val s = CurationAudit.labelDriftOf(single).collect()
    assert(s.length == 1 && s.head.getLong(2) == 0L && s.head.getDouble(4) == 1.0)
    // two labels mirrored around zero: corpus centroid 0 per dim, so each
    // label's diff-vector is its own centroid and dist2 matches it exactly
    val mirrored = Seq((0L, Array(1.0f, -2.0f), 0L), (1L, Array(-1.0f, 2.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val m = CurationAudit.labelDriftOf(mirrored).collect()
    val want = 1000000L * 1000000L + 2000000L * 2000000L
    assert(m.forall(_.getLong(2) == want), s"dist2_e12 ${m.map(_.getLong(2)).toSeq}")
    assert(m.forall(_.isNullAt(4)), "zero corpus centroid: cosine undefined, null")
  }
}
