package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeCoder

/** Deep-BPE surface ([[Bpe.trainDeep]] / [[Bpe.tokenizeDeep]] /
  * [[graft.functions.BpeCoder]]). The load-bearing laws:
  *
  *  - the DRIVER-LOCAL merge loop must equal the sequential
  *    replace-chain semantics the 12-round distributed trainer (and the
  *    DuckDB recursive oracle) define — pinned here against an
  *    independent wrapped-string replayer (String.replace is the same
  *    left-to-right non-overlapping primitive as SQL `replace`);
  *  - the heap-walk encoder (lowest rank first, leftmost first) must be
  *    BIT-identical to applying the merge table in rank order — the
  *    equivalence the scaladoc argues, pinned on the real corpus and on
  *    the adversarial self-pair / cascade / stale-heap words;
  *  - the native expression's plan must not grow with vocab depth (the
  *    whole point vs the one-Project-per-merge fold chain).
  */
class BpeDeepSpec extends SparkSpec {
  import spark.implicits._

  private val W1 = "\u0001"; private val W2 = "\u0002"
  private def wrap(s: String): String =
    s.codePoints().toArray.map(cp => W1 + new String(Character.toChars(cp)) + W2).mkString

  /** Independent sequential replayer: per round, split the wrapped state
    * to pairs, argmax (cnt DESC, lhs, rhs in UTF-8 byte order), apply via
    * literal String.replace — the oracle chain's semantics verbatim. */
  private def replayTrain(segs: Seq[(String, Long)], rounds: Int): Seq[(String, String, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    def lt(a: String, b: String) = UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
    var state = segs.map { case (s, f) => (wrap(s), f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      state.foreach { case (seq, f) =>
        val syms = seq.substring(1, seq.length - 1).split(W2 + W1, -1)
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.toSeq.sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
          c1 > c2 || (c1 == c2 && (lt(l1, l2) || (l1 == l2 && lt(r1, r2))))
        }.head
        out += ((l, rr, c))
        state = state.map { case (seq, f) =>
          (seq.replace(W1 + l + W2 + W1 + rr + W2, W1 + l + rr + W2), f)
        }
      }
      r += 1
    }
    out.result()
  }

  /** Rank-order fold encode via literal String.replace — the fold-chain /
    * oracle-encode semantics the heap walk must reproduce. */
  private def foldEncode(seg: String, merges: Seq[(String, String)]): String = {
    val s = merges.foldLeft(wrap(seg)) { case (acc, (l, r)) =>
      acc.replace(W1 + l + W2 + W1 + r + W2, W1 + l + r + W2)
    }
    if (s.isEmpty) "" else s.substring(1, s.length - 1).split(W2 + W1, -1).mkString(" ")
  }

  private lazy val docs = graft.Tables.documents(spark, sfDir)

  test("corpus is free of the wrapper/meta/separator codepoints") {
    val n = docs.where(
      col("text").contains("\u0001") || col("text").contains("\u0002") ||
      col("text").contains("\u0003") || col("text").contains(Bpe.Meta) ||
      col("text").contains(BpeCoder.PairSep) || col("text").contains(BpeCoder.SymSep))
      .count()
    assert(n === 0L)
  }

  test("driver-local merge loop == sequential replace-chain replay, full depth") {
    val segs = Bpe.segmentTable(docs, Bpe.DeepCap)
    assert(segs.nonEmpty && segs.size <= Bpe.DeepCap)
    val local = Bpe.localTrainMerges(segs, 64)
    val replay = replayTrain(segs, 64)
    assert(local === replay)
  }

  test("heap-walk encoder == rank-order fold on every corpus segment at 256 merges") {
    val segs = Bpe.segmentTable(docs, Bpe.DeepCap)
    val merges = Bpe.localTrainMerges(segs, Bpe.DeepRounds).map { case (l, r, _) => (l, r) }
    assert(merges.size === Bpe.DeepRounds, "corpus must support >=256 segment-level merges")
    val coder = new BpeCoder(merges)
    // every doc's segment, not just the capped training set
    val allSegs = docs.where(length(trim(col("text"))) > 0)
      .select(expr(s"replace(trim(text), ' ', '${Bpe.Meta}')")).as[String].collect()
    allSegs.foreach { seg =>
      assert(coder.encodeString(seg) === foldEncode(seg, merges), s"segment: ${seg.take(60)}")
    }
  }

  test("heap-walk encoder: adversarial self-pair, cascade, and stale-heap words") {
    // self-pair greediness: [a,a,a] -> [aa, a]; [a,a,a,a] -> [aa, aa] -> [aaaa]
    val m1 = Seq(("a", "a"))
    assert(new BpeCoder(m1).encodeString("aaa") === "aa a")
    assert(new BpeCoder(m1).encodeString("aaaa") === "aa aa")
    val m2 = Seq(("a", "a"), ("aa", "aa"))
    assert(new BpeCoder(m2).encodeString("aaaa") === "aaaa")
    assert(new BpeCoder(m2).encodeString("aaaaa") === "aaaa a")
    // stale-heap: rank0 (b,c) fires first and invalidates the queued (a,b)
    val m3 = Seq(("b", "c"), ("a", "b"))
    assert(new BpeCoder(m3).encodeString("abc") === "a bc")
    assert(new BpeCoder(m3).encodeString("abd") === "ab d")
    // cascade: later merge consumes an earlier merge's product
    val m4 = Seq(("a", "b"), ("ab", "c"))
    assert(new BpeCoder(m4).encodeString("abc") === "abc")
    // new pair formed leftward after a fuse: (x, ab) ranked, forms only
    // once (a,b) fuses — the offer(prv, p) path
    val m5 = Seq(("a", "b"), ("x", "ab"))
    assert(new BpeCoder(m5).encodeString("xab") === "xab")
    // meta-symbol (multi-byte codepoint) merges like any symbol
    val m6 = Seq((Bpe.Meta, "a"))
    assert(new BpeCoder(m6).encodeString(s"${Bpe.Meta}a${Bpe.Meta}") ===
      s"${Bpe.Meta}a ${Bpe.Meta}")
    // empty / single / no-merge inputs
    assert(new BpeCoder(Seq.empty).encodeString("ab") === "a b")
    assert(new BpeCoder(m1).encodeString("b") === "b")
    assert(new BpeCoder(m1).encodeString("") === "")
    // every fold case agrees with the replayer too
    Seq("aaa", "aaaa", "aaaaa", "abc", "abd", "xab").foreach { w =>
      Seq(m1, m2, m3, m4, m5).foreach { m =>
        assert(new BpeCoder(m).encodeString(w) === foldEncode(w, m), s"$w under $m")
      }
    }
  }

  test("duplicate merge pairs are rejected (a merged pair can never re-form)") {
    intercept[IllegalArgumentException] {
      new BpeCoder(Seq(("a", "b"), ("a", "b"))).encodeString("ab")
    }
  }

  test("merges literal round-trips, rejects separator collisions") {
    val m = Seq(("a", "b"), (Bpe.Meta + "x", "yz"))
    assert(BpeCoder.parse(BpeCoder.literal(m)) === m)
    assert(BpeCoder.parse("") === Seq.empty)
    intercept[IllegalArgumentException] { BpeCoder.literal(Seq((BpeCoder.SymSep, "a"))) }
  }

  test("trainDeep is repartition-invariant and deterministic") {
    val a = Bpe.trainDeep(docs, rounds = 32).collect().map(_.toSeq)
    val b = Bpe.trainDeep(docs.repartition(7), rounds = 32).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("segment sample is hash-determined: repartition/rerun-invariant, freqs within cap") {
    // the VERDICT r12 #1 law: the training sample is decided by the
    // salted md5 alone — not by partitioning, execution order, or (the
    // old defect) binary string order of the text itself
    val a = Bpe.segmentTable(docs, Bpe.DeepCap)
    val b = Bpe.segmentTable(docs.repartition(13), Bpe.DeepCap)
    val c = Bpe.segmentTable(docs, Bpe.DeepCap)
    assert(a === b && a === c)
    assert(a.nonEmpty && a.size <= Bpe.DeepCap)
    // frequencies are counted WITHIN the cap-row sample
    assert(a.map(_._2).sum <= Bpe.DeepCap.toLong)
    assert(a.forall(_._2 >= 1L))
    // hash-order pick, not lexicographic: the sample must NOT be the
    // DeepCap binary-smallest segments of the corpus (the old tie-break)
    val allSegs = docs.where(length(trim(col("text"))) > 0)
      .select(expr(s"replace(trim(text), ' ', '${Bpe.Meta}')")).as[String]
      .collect().sorted
    val lexSmallest = allSegs.take(Bpe.DeepCap).toSet
    assert(!a.map(_._1).forall(lexSmallest.contains),
      "sample must be hash-picked, not the lexicographically smallest docs")
  }

  test("sample-vs-corpus token coverage: sampled alphabet covers the corpus symbol mass") {
    // probe note (VERDICT r12 #1 'done' clause): a representative sample
    // must expose the tokenizer to ~all of the corpus's character mass —
    // characters absent from the sample can never enter a merge and
    // always tokenize as singletons
    val sampleChars = Bpe.segmentTable(docs, Bpe.DeepCap)
      .flatMap(_._1.codePoints().toArray.toSeq).toSet
    val corpus = docs.where(length(trim(col("text"))) > 0)
      .select(expr(s"replace(trim(text), ' ', '${Bpe.Meta}')")).as[String].collect()
    val total = corpus.map(_.codePoints().count()).sum
    val covered = corpus.map(_.codePoints().toArray.count(sampleChars.contains(_)).toLong).sum
    val cov = covered.toDouble / total
    info(f"sample alphabet covers $cov%.4f of corpus character occurrences " +
      f"(${sampleChars.size} sampled codepoints)")
    assert(cov > 0.95, f"coverage $cov%.4f — the hash sample must be representative")
  }

  test("tokenizeDeep: token-count law, roundtrip, and streaming-safe projection shape") {
    val out = Bpe.tokenizeDeep(docs, rounds = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val toks = r.getString(2).split(" ", -1)
      assert(toks.length.toLong === r.getLong(1))
      assert(toks.forall(_.nonEmpty))
      // tokens reassemble to the segment exactly (character conservation)
      val seg = toks.mkString
      assert(!seg.contains(" "))
    }
  }

  test("native tokenize plan size is constant in vocab depth") {
    val merges = Bpe.deepMerges(docs, Bpe.DeepRounds).map { case (l, r, _) => (l, r) }
    def planChars(n: Int): Int =
      Bpe.tokenizeWith(docs, merges.take(n)).queryExecution.executedPlan.toString.length
    val p2 = planChars(2)
    val p256 = planChars(merges.size)
    assert(math.abs(p256 - p2) < 100,
      s"plan must not grow with merge depth: $p2 chars at 2 merges, $p256 at ${merges.size}")
    // the fold chain DOES grow — one Project per merge (the contrast the
    // native expression exists for)
    def foldChars(n: Int): Int =
      Bpe.encodeWith(docs, merges.take(n).map { case (l, r) => (l, r, 0L) })
        .queryExecution.analyzed.toString.length
    assert(foldChars(64) > foldChars(2) + 1000)
  }

  test("delta trainer == naive recount trainer, merge-for-merge") {
    // the real corpus at full depth
    val segs = Bpe.segmentTable(docs, Bpe.DeepCap)
    assert(Bpe.localTrainMergesFast(segs, Bpe.DeepRounds) ===
      Bpe.localTrainMerges(segs, Bpe.DeepRounds))
    // adversarial self-pair / overlap corpora — the delta arithmetic's
    // hard cases (overlapping occurrences change neighbor adjacencies)
    val hard = Seq(
      Seq(("aaaaaaa", 3L), ("aab", 2L)),
      Seq(("abababab", 1L), ("bababa", 2L)),
      Seq(("aaa", 1L), ("aa", 1L), ("a", 5L)),
      Seq(("xyxyx", 2L), ("yxyxy", 2L)))
    hard.foreach { c =>
      assert(Bpe.localTrainMergesFast(c, 20) === Bpe.localTrainMerges(c, 20), s"corpus $c")
    }
    // seeded random corpora over a 3-letter alphabet (dense overlap mass)
    var x = 12345L
    def nextInt(bound: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % bound).toInt)
    }
    (1 to 40).foreach { t =>
      val corpus = (1 to (2 + nextInt(6))).map { _ =>
        val len = 3 + nextInt(18)
        (Seq.fill(len)(('a' + nextInt(3)).toChar).mkString, (1 + nextInt(4)).toLong)
      }.distinct
      assert(Bpe.localTrainMergesFast(corpus, 30) === Bpe.localTrainMerges(corpus, 30),
        s"trial $t corpus $corpus")
    }
    // dry handling: both stop at the same realized depth
    val tiny = Seq(("ab", 1L))
    assert(Bpe.localTrainMergesFast(tiny, 10) === Bpe.localTrainMerges(tiny, 10))
    assert(Bpe.localTrainMergesFast(Seq(("a", 1L)), 10).isEmpty)
  }

  test("vocabDeep: exact totals on a constructed corpus, survivor subwords outrank chars") {
    // two segments: "abab" ×3 docs, "abx" ×2 docs. Merges at rounds=2:
    // (a,b) cnt 3*2+2 = 8 -> ab; then (ab,ab) cnt 3 vs (ab,x) cnt 2 -> abab.
    // Final state: ["abab"]×3, ["ab","x"]×2.
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "abab"), (4L, "abx"), (5L, "abx"))
      .toDF("doc_id", "text")
    val v = Bpe.vocabDeep(docs, rounds = 2, cap = 10, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(v.toSeq === Seq(("abab", 3L, 1L, 1L), ("ab", 2L, 1L, 2L), ("x", 2L, 1L, 3L)))
    // corpus-level consistency at full depth: n_segs bounded by the cap,
    // every n_occ positive, ranks contiguous from 1
    val full = Bpe.vocabDeep(graft.Tables.documents(spark, sfDir), rounds = 64)
      .collect()
    assert(full.nonEmpty)
    assert(full.map(_.getLong(3)).toSeq === (1L to full.length.toLong))
    assert(full.forall(r => r.getLong(1) > 0 && r.getLong(2) >= 1 &&
      r.getLong(2) <= Bpe.DeepCap))
    // a multi-codepoint survivor (merged subword) must appear — the
    // artifact is vocabulary, not a char histogram
    assert(full.exists(r => r.getString(0).codePoints().count() > 1))
  }

  test("fertility: per-source sums replay from an independent tokenize; ratios bounded") {
    val f = Bpe.fertility(docs, rounds = 64).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(f.nonEmpty)
    // independent recomputation: tokenize + per-doc stats, summed by source
    val merges = Bpe.deepMerges(docs, rounds = 64).map { case (l, r, _) => (l, r) }
    val toks = Bpe.tokenizeWith(docs, merges)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val metas = docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .as[(Long, String, Long, Long)].collect()
    val bySrc = metas.groupBy(_._2)
    f.foreach { case (src, (nDocs, ws, bpe, ch, fertPm, cptPm)) =>
      val rows = bySrc(src)
      assert(rows.length.toLong === nDocs, s"$src docs")
      assert(rows.map(_._3).sum === ws, s"$src ws")
      assert(rows.map(_._4).sum === ch, s"$src chars")
      assert(rows.map(r => toks(r._1)).sum === bpe, s"$src bpe")
      assert(fertPm === bpe * 1000 / ws && cptPm === ch * 1000 / bpe, s"$src ratios")
      // a segment of W words and C chars holds C + W - 1 symbols — the
      // token-count ceiling; compression means strictly fewer at depth 64
      assert(bpe < ch + ws, s"$src: tokens must compress below the symbol count")
    }
  }

  test("bpe_tokenize is callable from SQL with a literal merge table") {
    val m = BpeCoder.literal(Seq(("a", "b"), ("ab", "c")))
    val r = spark.sql(s"SELECT bpe_tokenize('abcab', '$m') AS t").as[String].head()
    assert(r === "abc ab")
  }
}
