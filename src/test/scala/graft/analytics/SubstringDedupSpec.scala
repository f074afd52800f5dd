package graft.analytics

import graft.SparkSpec

/** Laws for the cross-document exact-substring dedup family
  * ([[Dedup.substringSpans]] / [[Dedup.winnowedFingerprints]] /
  * [[Dedup.substringWinnowPairs]]). The real corpus carries no engineered
  * duplicates, so every law here INJECTS the duplication it asserts on
  * (see memory: dedup specs must inject duplicates). */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 20
  private val W = 8

  // a 40-char shared payload (> K so interior grams exist, > K+W-1 so the
  // winnowing guarantee applies), embedded at different offsets inside
  // otherwise per-doc-unique filler: gram starts fully inside the payload
  // are cross-doc duplicated, straddling grams differ per doc
  private val payload = "the quick brown fox jumps over lazy dog!" // 40 chars
  private val docA = s"AAAAAAAAAAbbbbbbbbbbccccccccccdddddddddd$payload" +
    "eeeeeeeeeeffffffffff"
  private val docB = s"GGGGGGGGGGhhhhhhhhhh$payload" + "iiiiiiiiiijjjjjjjjjj"
  private val docU = "0123456789!@#$%^&*()qwertyuiopasdfghjklzxcvbnmQWERTYUIOP"

  private def docs = Seq(
    (1L, docA), (2L, docB), (3L, docU), (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("substringSpans finds the injected shared substring with exact extent") {
    val got = Dedup.substringSpans(docs, K)
      .select("doc_id", "n_spans", "dup_chars", "max_span")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, n, c, m) => d -> ((n, c, m)) }.toMap
    // one span per doc, covering exactly the 40-char payload
    val expected = (1L, 40L, 40L)
    assert(got.keySet == Set(1L, 2L),
      s"only the two payload carriers may have spans; got ${got.keySet}")
    assert(got(1L) == expected && got(2L) == expected, s"got $got")
  }

  test("intra-document repetition alone is NOT a cross-document span") {
    // doc 10 repeats its own 25-char block twice, but no other doc shares
    // any 20-gram with it: the cross-doc definition must stay silent
    val block = "zZzZzZzZzZzZzZzZzZzZzZzZz" // 25 chars
    val selfRep = Seq((10L, s"$block-0123456789-$block"), (11L, docU))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(selfRep, K).count() == 0)
  }

  test("winnowing guarantee: a shared substring of >= k+w-1 chars shares a fingerprint") {
    val fp = Dedup.winnowedFingerprints(docs, K, W)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    val shared = fp(1L) intersect fp(2L)
    assert(shared.nonEmpty, "payload carriers must share a winnowed fingerprint")
    assert((fp.getOrElse(3L, Set.empty[Long]) intersect fp(1L)).isEmpty,
      "unrelated doc must not collide")
  }

  test("winnowed fingerprints are a subset of the stride-1 gram digests") {
    val all = Dedup.substringWinnowPairs(docs, K, W, minShared = 1, maxDf = 1000)
      .as[(Long, Long, Long)].collect()
    assert(all.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // subset law on the real corpus: selection only ever picks existing grams
    val corpus = graft.Tables.documents(spark, sfDir).where($"doc_id" < 50)
    val fps = Dedup.winnowedFingerprints(corpus, K, W)
      .select($"g").as[Long].collect().toSet
    val grams = corpus
      .where(org.apache.spark.sql.functions.length($"text") >= K)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          s"transform(sequence(0, length(text) - $K), " +
            s"i -> cast(conv(substring(md5(substring(text, i + 1, $K)), 1, 15), 16, 10) as long))"))
        .as("g")).as[Long].collect().toSet
    assert(fps.nonEmpty && fps.subsetOf(grams))
  }

  test("span summary is repartition-invariant and null-text-safe") {
    val base = Dedup.substringSpans(docs, K).orderBy("doc_id").collect().toSeq
    val shuffled = Dedup.substringSpans(docs.repartition(7), K)
      .orderBy("doc_id").collect().toSeq
    assert(base == shuffled)
  }
}
