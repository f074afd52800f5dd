package graft.analytics

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces emails, URLs, and long digit runs; counts are audited") {
    val docs = Seq(
      (1L, "contact bob.smith+x@corp.example.com or see https://ex.com/a?b=1 now"),
      (2L, "call 5551234567 ref 12345678901 ok"),
      (3L, "clean text with short 123 number"),
      (4L, ""),
      (5L, "ref https://ex.com/1234567890 done") // digits INSIDE the url
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redact(docs).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got(0)._2 == "contact <EMAIL> or see <URL> now" && got(0)._3 == 2)
    assert(got(1)._2 == "call <NUM> ref <NUM> ok" && got(1)._3 == 2)
    assert(got(2)._2 == "clean text with short 123 number" && got(2)._3 == 0)
    assert(got(3)._2 == "" && got(3)._3 == 0)
    // one visible tag => count 1, not url+digits double-counted
    assert(got(4)._2 == "ref <URL> done" && got(4)._3 == 1)
  }

  test("tfidf: ubiquitous terms score zero, rare terms outrank common ones") {
    val docs = Seq(
      (1L, "the quick fox"),
      (2L, "the lazy dog"),
      (3L, "the rare unicorn unicorn unicorn")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidf(docs, k = 10)
      .as[(String, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // df == N => idf = ln(1) = 0 => score 0
    assert(rows("the")._5 == 0.0)
    // "unicorn": tf 3, df 1 => 3*ln(3); beats every df>1 term
    val unicorn = rows("unicorn")
    assert(math.abs(unicorn._5 - 3 * math.round(math.log(3.0) * 1e8) / 1e8) < 5e-5)
    assert(unicorn._6 == 1L, "rarest+most-frequent term ranks first")
    // ranks are dense 1..k over the returned rows
    assert(rows.values.map(_._6).toSeq.sorted == (1L to rows.size).toSeq)
  }

  test("rolling fingerprints: exact Horner hashes, shared substrings share fps") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"PREFIX ONE $shared SUFFIX A"),
      (2L, s"totally different lead-in $shared trailing bits"),
      (3L, "short")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.rollingFingerprints(docs)
      .as[(Long, Long, Long)].collect()
    assert(!got.exists(_._1 == 3L), "sub-k doc emits nothing")
    // reference implementation of the same rule
    def fps(text: String, k: Int = 8, w: Int = 16): Seq[(Long, Long)] = {
      val nt = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val hs = (0 to nt.length - k).map { i =>
        nt.substring(i, i + k).foldLeft(0L)((a, c) => (a * 257 + c) % 2147483647L)
      }
      hs.zipWithIndex.collect { case (h, i)
        if h == hs.slice(math.max(0, i - w + 1), i + 1).min => ((i + 1).toLong, h)
      }
    }
    for (id <- Seq(1L, 2L)) {
      val txt = docs.where($"doc_id" === id).select("text").as[String].head()
      val expect = fps(txt).toSet
      val actual = got.filter(_._1 == id).map(r => (r._2, r._3)).toSet
      assert(actual == expect, s"doc $id fingerprint mismatch")
    }
    // content-defined sampling: the shared substring contributes shared
    // hash values to both docs despite different offsets
    val h1 = got.filter(_._1 == 1L).map(_._3).toSet
    val h2 = got.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 intersect h2).nonEmpty, "shared substring must share fingerprints")
  }

  test("c4Filter: each gate fires in priority order; clean docs keep") {
    val en20 = "the order is fast and the scan is in the table of the work we do here now for all good men"
    val docs = Seq(
      (1L, "tiny doc"),                                  // too_short
      (2L, ("w " * 1500).trim),                          // too_long
      (3L, en20.replace(" ", "!!! ") ),                  // too_much_punct
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi omicron pi rho sigma tau upsilon"), // no stopwords
      (5L, "join filter sort the a of and to in is join filter sort zz yy xx ww vv uu tt"), // stopword-rich but French markers
      (6L, en20)                                         // keeps
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Filter(docs)
      .select("doc_id", "n_tokens", "lang_pred", "keep", "reason").orderBy("doc_id")
      .as[(Long, Long, String, Boolean, String)].collect()
    assert(got.map(_._5).toSeq == Seq("too_short", "too_long", "too_much_punct",
      "too_few_stopwords", "non_english", "ok"))
    assert(got.map(_._4).toSeq == Seq(false, false, false, false, false, true))
  }

  test("lmScore: seen bigrams outscore unseen; short docs get null") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a,b) x2, (b,a) x1
      (2L, "a b"),       // the most common bigram only
      (3L, "b z"),       // (b,z) appears once in the corpus (here)
      (4L, "solo"),      // 1 token: no bigrams
      (5L, "a b")        // duplicate of doc 2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs).orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect()
    assert(got.map(_._2).toSeq == Seq(3L, 1L, 1L, 0L, 1L))
    assert(got(3)._3.isEmpty, "no-bigram doc scores null")
    // doc 2 repeats the corpus's most frequent bigram => highest mean
    // log-prob; doc 3's bigram is rarer and starts from a rarer unigram
    assert(got(1)._3.get > got(2)._3.get)
    // identical docs score identically
    assert(got(1)._3 == got(4)._3)
    // hand-check doc 2: V=4 (a,b,z,solo); C(a,b)=4 (2 in doc1 + doc2 +
    // doc5), C(a)=4 => ln((4+1)/(4+4))
    val expected = math.round(math.log(5.0 / 8.0) * 1e8) / 1e8
    assert(math.abs(got(1)._3.get - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("chunkOverlap: stride coverage, clamped tails, lossless reconstruction") {
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")), // 80 toks: 4 chunks
      (2L, "a b c"),                                  // shorter than window
      (3L, (1 to 24).map(i => s"u$i").mkString(" ")), // exactly one stride
      (4L, "  ")                                      // whitespace-only: dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkOverlap(docs, window = 32, stride = 24)
      .orderBy("doc_id", "start_tok")
      .as[(Long, Long, String, Long)].collect()
    // starts advance by the stride; every doc's first chunk starts at 0
    assert(got.filter(_._1 == 1L).map(_._2).toSeq == Seq(0L, 24L, 48L, 72L))
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(0L))
    assert(got.filter(_._1 == 3L).map(_._2).toSeq == Seq(0L))
    assert(!got.exists(_._1 == 4L), "whitespace-only doc must yield no chunks")
    // chunk_tokens is min(window, n - start) and matches the text
    got.foreach { case (_, s, chunk, n) =>
      assert(chunk.split(" ").length == n, s"chunk at $s: token count mismatch")
    }
    assert(got.filter(_._1 == 1L).map(_._4).toSeq == Seq(32L, 32L, 32L, 8L))
    // lossless: the first `stride` tokens of each chunk (all of the last)
    // concatenate back to the original token stream
    val chunks1 = got.filter(_._1 == 1L).map(_._3)
    val rebuilt = chunks1.init.flatMap(_.split(" ").take(24)) ++ chunks1.last.split(" ")
    assert(rebuilt.toSeq == (1 to 80).map(i => s"t$i"))
  }

  test("repetition: crafted docs hit known fractions; corpus replays exactly") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 2-grams: [ab ba ab ba ab] top=3/5; 3-grams: [aba bab aba bab] dup=2/4
      (2L, "x y z"),              // no repeats: top2=1/2, dup3=0/1
      (3L, "w w w w"),            // max repetition: top2=3/3, dup3=2/2... wait 3-grams: www www -> dup 1/2
      (4L, "p q")                 // too short for 3-grams: NULL frac
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs).orderBy("doc_id").collect()
    def row(i: Int) = (got(i).getLong(1), got(i).getLong(2), got(i).getLong(4), got(i).getLong(5))
    assert(row(0) == ((5L, 3L, 4L, 2L))) // doc 1: n2=5 top2=3 n3=4 d3=2
    assert(got(0).getDouble(3) == 3.0 / 5 && got(0).getDouble(6) == 2.0 / 4)
    assert(row(1) == ((2L, 1L, 1L, 1L)) && got(1).getDouble(6) == 0.0)
    assert(row(2) == ((3L, 3L, 2L, 1L)) && got(2).getDouble(3) == 1.0)
    assert(row(3) == ((1L, 1L, 0L, 0L)) && got(3).isNullAt(6), "short doc: NULL 3-gram frac")
    // corpus: replay a sample of real docs in plain Scala
    val real = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val gotReal = TextAnalysis.repetitionQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    real.take(50).foreach { case (id, text) =>
      val t = text.trim.split("\\s+").toSeq
      val g2 = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val g3 = t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val want = (g2.size.toLong,
        if (g2.isEmpty) 0L else g2.groupBy(identity).values.map(_.size).max.toLong,
        g3.size.toLong, g3.distinct.size.toLong)
      assert(gotReal(id) == want, s"doc $id")
    }
  }

  test("bm25: replayed scores match; tf-0 docs score zero; df/idf monotone") {
    val got = TextAnalysis.bm25Query(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) => id -> text.trim.split("\\s+").toSeq }.toMap
    val n = docs.size.toLong
    val sumDl = docs.values.map(_.size.toLong).sum
    val terms = Seq("spark", "join", "window")
    val dfs = terms.map(t => docs.values.count(_.contains(t)).toLong)
    docs.foreach { case (id, toks) =>
      val dl = toks.size.toLong
      val (gDl, gTf0, gTf1, gTf2, gScore) = got(id)
      assert(gDl == dl)
      val tfs = terms.map(t => toks.count(_ == t).toLong)
      assert((gTf0, gTf1, gTf2) == ((tfs(0), tfs(1), tfs(2))))
      val avgdl = sumDl.toDouble / n
      val q = terms.indices.map { i =>
        val idf = BigDecimal(math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        val c = idf * ((tfs(i) * (1.2 + 1)) /
          (tfs(i) + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        math.round(c * 1e6)
      }.sum
      assert(gScore == q / 1e6, s"doc $id: $gScore != ${q / 1e6}")
      if (tfs.forall(_ == 0)) assert(gScore == 0.0)
    }
  }

  test("pmi_bigrams: every row replays from independent unigram/bigram counts") {
    val docs = graft.Tables.documents(spark, sfDir)
    val texts = docs.select("text").collect().map(_.getString(0))
      .filter(t => t != null && t.trim.nonEmpty)
    val tokLists = texts.map(_.trim.split("\\s+").toSeq)
    val uni = tokLists.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tokLists.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    def lnE8(c: Long): Long = math.round(math.log(c.toDouble) * 1e8)
    val rows = TextAnalysis.pmiBigrams(docs).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to 50L))
    rows.foreach { r =>
      val (w1, w2, nPair, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(nPair >= 5 && bi((w1, w2)) == nPair, s"($w1,$w2)")
      assert(pmi == lnE8(nPair) + lnE8(n) - lnE8(uni(w1)) - lnE8(uni(w2)), s"($w1,$w2)")
    }
    // PMI ranks association, not frequency: the top-frequency bigram is
    // not automatically rank 1 unless its parts are rare
    val topFreq = bi.maxBy { case ((a, b), c) => (c, a, b) }
    info(s"top-PMI ${rows.head.getString(0)} ${rows.head.getString(1)} vs " +
      s"top-freq ${topFreq._1}")
  }

  test("phrase_search: hits replay from a brute trigram scan; every query finds itself") {
    val docs = graft.Tables.documents(spark, sfDir)
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (_, t) => t != null && t.trim.nonEmpty }
    def tris(t: String): Seq[String] = {
      val ws = t.trim.split("\\s+").toSeq
      if (ws.size < 3) Nil else ws.sliding(3).map(_.mkString(" ")).toSeq
    }
    val phrases = all.filter(_._1 < 5).map { case (id, t) => id -> tris(t).head }.toMap
    val expect = for {
      (qid, ph) <- phrases.toSeq
      (did, t) <- all
      n = tris(t).count(_ == ph) if n > 0
    } yield ((qid, ph, did), n.toLong)
    val got = TextAnalysis.phraseSearch(docs).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got == expect.toMap)
    // self-hit: each query doc contains its own leading trigram
    phrases.keys.foreach(qid => assert(got.contains((qid, phrases(qid), qid))))
  }
}
