package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Curation observability: the audit tables an iterative training-data
  * pipeline reads between corpus versions — what changed since the last
  * snapshot, how much batch capacity length-bucketing wastes, how novel
  * each document is against a reference slice, and how far each source's
  * token distribution drifts from the corpus mixture.
  *
  * The reference pipeline re-scrapes and re-derives its dataset every
  * cycle (`asyncio scraping.py:80-92` re-polls, `lvmh_forecaster2
  * .py:150-185` appends/patches the accumulated frame in place); at
  * corpus scale that "refresh and reconcile" step becomes an explicit
  * snapshot diff plus drift metrics, which is what this module provides.
  *
  * Scale notes, applied throughout:
  *  - document TEXT never shuffles: diffs compare md5 digests, novelty
  *    compares shingle hashes, KL aggregates token counts;
  *  - every ratio ships on an integer grid (per-mille or ln·1e8), the
  *    repo's cross-engine bit-parity discipline;
  *  - scalar denominators (corpus totals) ride 1-row broadcast frames.
  */
object CurationAudit {

  private def bucket(salt: String, key: Column): Column =
    Sampling.hashBucket(concat(lit(salt), key.cast("string")), 1000)

  /** Deterministic "next crawl" of the documents table, derived in-place
    * so the diff is reproducible on the driver's fixed tables: 5% of
    * doc_ids are new in v2 (absent from v1), a disjoint 5% were dropped,
    * and 10% re-extracted to their first 100 chars (a boilerplate-pass
    * change). Buckets are salted md5 over doc_id — stable across engines
    * and scale factors. */
  private[graft] def snapshotV1(docs: DataFrame): DataFrame =
    docs.where(bucket("v1:", col("doc_id")) >= 50)

  private[graft] def snapshotV2(docs: DataFrame): DataFrame =
    docs.where(!(bucket("v2:", col("doc_id")) >= 950))
      .withColumn("text",
        when(bucket("chg:", col("doc_id")) < 100, substring(col("text"), 1, 100))
          .otherwise(col("text")))

  /** Snapshot diff between corpus versions v1 and v2: per source, how
    * many documents were added, removed, changed (text digest differs)
    * and unchanged, plus churn per-mille. The join carries only
    * (doc_id, source, md5) — text reduces to its digest BEFORE the
    * shuffle, so the diff moves ~50 bytes/doc no matter the corpus
    * size, and the full-outer join is the only wide stage. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiffOf(Tables.documents(spark, dir))

  /** Core over any (doc_id, source, text) frame — the probe feeds this
    * synthetic crawl volume ([[graft.ScaleProbe]] `curation` arm). */
  def snapshotDiffOf(docs: DataFrame): DataFrame = {
    def digested(df: DataFrame, idAs: String, digAs: String) =
      df.select(col("doc_id").as(idAs), col("source"),
        md5(coalesce(col("text"), lit(""))).as(digAs))
    val v1 = digested(snapshotV1(docs), "id1", "dig1")
    val v2 = digested(snapshotV2(docs), "id2", "dig2")
      .withColumnRenamed("source", "source2")
    val joined = v1.join(v2, col("id1") === col("id2"), "full_outer")
      .select(
        coalesce(col("source"), col("source2")).as("src"),
        when(col("id1").isNull, lit("added"))
          .when(col("id2").isNull, lit("removed"))
          .when(col("dig1") =!= col("dig2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    joined.groupBy("src")
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        count(lit(1)).as("n_total"))
      .withColumn("churn_pm",
        expr("((n_added + n_removed + n_changed) * 1000) div n_total"))
      .orderBy("src")
  }

  /** Length-bucket padding audit: documents bucketed to the smallest
    * power-of-two token capacity, with the batch capacity each bucket
    * wastes to padding (the number a batching scheduler trades off when
    * it picks bucket boundaries). All-integer: floor(log2) comes from
    * the binary-string length (`length(bin(n)) - 1`, exact in both
    * engines — no float log near a power-of-two boundary), waste is an
    * integer per-mille. One scan + one tiny aggregation. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket_top", expr(
        """CAST(pow(2, CASE WHEN (n_tokens & (n_tokens - 1)) = 0
          |              THEN length(bin(n_tokens)) - 1
          |              ELSE length(bin(n_tokens)) END) AS BIGINT)""".stripMargin))
      .groupBy("bucket_top")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .withColumn("capacity", col("bucket_top") * col("n_docs"))
      .withColumn("waste_pm",
        expr("((capacity - sum_tokens) * 1000) div capacity"))
      .orderBy("bucket_top")

  /** Per-document n-gram novelty against a reference slice (the held-in
    * 10% by salted hash): the share of a document's distinct word
    * trigrams that appear nowhere in the reference — the "how much new
    * text does this add" signal ranking crawl increments. Shingles ride
    * as the two 32-bit md5 halves ([[Dedup.shingleHashes]] discipline:
    * distinct AFTER hashing so a collision cannot desync set sizes);
    * the reference side collapses to its DISTINCT hash set before the
    * join, so the anti-probe is vocabulary-sized, not corpus-sized. */
  def ngramNovelty(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    ngramNoveltyOf(Tables.documents(spark, dir), n)

  def ngramNoveltyOf(docs: DataFrame, n: Int = 3): DataFrame = {
    val isRef = bucket("ref:", col("doc_id")) < 100
    // ONE materialized hashing pass: the plan feeds three consumers (the
    // reference set, the candidate anti-join, the per-doc totals) and
    // un-materialized replays the md5-per-shingle scan per consumer —
    // 78.5 → 61-72 s at the 2M probe (the remaining cost is the distinct
    // shuffle, paid once either way). (doc_id, h1, h2) longs only, the
    // localCheckpoint idiom.
    val tri = {
      val cp = Dedup.shingleHashes(docs, n).localCheckpoint(false)
      cp.count()
      cp
    }
    val refSet = tri.where(isRef).select("h1", "h2").distinct()
    val cand = tri.where(!isRef)
    val novel = cand.join(refSet, Seq("h1", "h2"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    cand.groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tri"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_pm", expr("(n_novel * 1000) div n_tri"))
      .orderBy("doc_id")
  }

  /** Embedding-space drift per label — the vector-side sibling of
    * [[sourceKl]]: distance and cosine between each label's embedding
    * centroid and the corpus centroid, the "is this slice drifting away
    * from the blend" signal for semantic (rather than lexical) shift.
    * Exactness recipe: components quantize to the 1e6 integer grid BEFORE
    * summation (per-dimension BIGINT sums are order-free), per-dim means
    * come back through one IEEE division each, their difference
    * re-quantizes to the grid, and the final sqrt/divide chain is the
    * same IEEE sequence in both engines. Shuffle profile: one
    * (label, dim)-keyed partial aggregation of n·64 integer rows (map-
    * side combined), the 64-row corpus frame broadcast back. */
  def labelDrift(spark: SparkSession, dir: String): DataFrame =
    labelDriftOf(Tables.embeddings(spark, dir))

  def labelDriftOf(embeddings: DataFrame): DataFrame = {
    val q = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        round(col("x").cast("double") * 1e6, 0).cast("long").as("q"))
    val byLabel = q.groupBy("label", "d")
      .agg(sum("q").as("s"), count(lit(1)).as("nl"))
    val corpus = byLabel.groupBy("d").agg(sum("s").as("cs"), sum("nl").as("cn"))
    byLabel.join(broadcast(corpus), "d")
      .select(col("label"), col("nl"),
        round(col("s").cast("double") / col("nl") -
              col("cs").cast("double") / col("cn"), 0).cast("long").as("md"),
        round(col("s").cast("double") / col("nl"), 0).cast("long").as("ml"),
        round(col("cs").cast("double") / col("cn"), 0).cast("long").as("mc"))
      .groupBy("label")
      .agg(max("nl").as("n_vecs"),
        sum(col("md") * col("md")).as("dist2_e12"),
        sum(col("ml") * col("mc")).as("dot_e12"),
        sum(col("ml") * col("ml")).as("nl2_e12"),
        sum(col("mc") * col("mc")).as("nc2_e12"))
      .select(col("label"), col("n_vecs"), col("dist2_e12"),
        round(sqrt(col("dist2_e12")) / 1e6, 6).as("dist"),
        // a zero centroid (either side) makes the cosine undefined — null,
        // not a division-by-zero (the operator must be total on any input)
        when(col("nl2_e12") > 0 && col("nc2_e12") > 0,
          round(col("dot_e12") /
            (sqrt(col("nl2_e12")) * sqrt(col("nc2_e12"))), 6)).as("cos_sim"))
      .orderBy("label")
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over the
    * whitespace-unigram distributions, the mixture-health metric that
    * tells a data-mixing stage which source is furthest from the blend
    * it feeds. Exact-integer discipline: each term's log-probabilities
    * are quantized to the ln·1e8 BIGINT grid BEFORE any arithmetic (the
    * txt_lm_score recipe), the per-source sum is a BIGINT, and the
    * final division is integer (e8 per-token units). Shuffle profile:
    * one term-keyed aggregation (vocabulary-sized), corpus totals join
    * back by term, source totals broadcast. */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    def lnE8(c: Column): Column = round(log(c) * 1e8, 0).cast("long")
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    // ONE materialized tokenize+count pass: bySrc feeds four consumers
    // (byTerm, the source totals, the corpus total through byTerm, and
    // the final join) — un-materialized, the explode scan replays per
    // consumer. (source, term, count) rows only — vocabulary-sized.
    val bySrc = {
      val cp = toks.groupBy("source", "term").agg(count(lit(1)).as("cs"))
        .localCheckpoint(false)
      cp.count()
      cp
    }
    val byTerm = bySrc.groupBy("term").agg(sum("cs").as("c"))
    val srcTotals = bySrc.groupBy("source").agg(sum("cs").as("ns"))
    val corpusTotal = byTerm.agg(sum("c").as("n"))
    bySrc.join(byTerm, "term")
      .join(broadcast(srcTotals.withColumnRenamed("source", "src2")),
        col("source") === col("src2"))
      .crossJoin(broadcast(corpusTotal)) // 1-row scalar frame
      .select(col("source"), col("cs"),
        (lnE8(col("cs").cast("double") / col("ns")) -
         lnE8(col("c").cast("double") / col("n"))).as("dln_e8"))
      .groupBy("source")
      .agg(sum(col("cs") * col("dln_e8")).as("sum_e8"),
        sum("cs").as("n_tokens"), count(lit(1)).as("n_terms"))
      // KL ≥ 0 (Gibbs) in exact arithmetic, but the per-term ln·1e8
      // quantization (±1 e8-unit each) can push a near-zero-KL source's
      // sum slightly negative — and Spark's `div` truncates toward zero
      // while DuckDB's `//` floors, so a negative sum would read 0 here
      // and -1 in the mirror. Clamp at 0 on BOTH sides to make the
      // nonnegativity explicit instead of load-bearing.
      .withColumn("kl_e8", expr("greatest(sum_e8, 0L) div n_tokens"))
      .withColumn("kl", col("kl_e8") / 1e8)
      .select("source", "n_tokens", "n_terms", "kl_e8", "kl")
      .orderBy("source")
  }
}
