package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Bpe]] — distributed BPE tokenizer training + encoding. The laws
  * pinned here are the ones the DuckDB hash oracle cannot localize when
  * they break: exact greedy (left-to-right, non-overlapping) merge
  * semantics including the self-pair overlap case, the deterministic
  * argmax tie-break, word-boundary isolation in the encoder, and the
  * dry-corpus early stop. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow weighted pair frequency with deterministic tie-break") {
    // "ab" × 3 docs, "cd" × 2 → (a,b) wins round 1, (c,d) round 2
    val docs = Seq((1L, "ab ab"), (2L, "ab cd"), (3L, "cd zz"))
      .toDF("doc_id", "text")
    // word FREQUENCY weighting: ab appears 3×, cd 2×, zz 1×
    val m = Bpe.trainMerges(docs, rounds = 3)
    assert(m.map(t => (t._1, t._2)) === Seq(("a", "b"), ("c", "d"), ("z", "z")))
    assert(m.map(_._3) === Seq(3L, 2L, 1L))
  }

  test("self-pair merge is greedy left-to-right: [a,a,a] -> [aa, a]") {
    // one word "aaa": round 1 counts (a,a) twice (overlapping adjacency),
    // but APPLIES non-overlapping: [aa, a]. Round 2's top pair must then
    // be (aa, a) — the signature of greedy semantics (a double-consume
    // would leave no pair; right-to-left would also yield (aa,a) here,
    // but "aaaa" below separates those).
    val m1 = Bpe.trainMerges(Seq((1L, "aaa")).toDF("doc_id", "text"), 2)
    assert(m1 === Seq(("a", "a", 2L), ("aa", "a", 1L)))
    // "aaaa" → [aa, aa] after round 1, so round 2 merges (aa, aa)
    val m2 = Bpe.trainMerges(Seq((1L, "aaaa")).toDF("doc_id", "text"), 2)
    assert(m2 === Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("merges never cross word boundaries, in training or encoding") {
    // "a b" has no adjacent pair (two 1-char words); "ab" does
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "ab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, 2)
    assert(m.head._1 == "a" && m.head._2 == "b" && m.head._3 == 1L,
      s"pair count must come only from the joined word: $m")
    val enc = Bpe.encode(docs, 2).orderBy("doc_id")
      .select("n_ws_tokens", "n_bpe_tokens").as[(Long, Long)].collect()
    // docs 1/2: two single-char words stay 2 tokens; doc 3: "ab" merges to 1
    assert(enc === Array((2L, 2L), (2L, 2L), (1L, 1L)))
  }

  test("dry corpus stops early instead of emitting empty merges") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // no pairs at all
    assert(Bpe.trainMerges(docs, 5).isEmpty)
    assert(Bpe.train(docs, 5).count() === 0L)
    // fully-merged-mid-run: "ab" dries after one merge
    assert(Bpe.trainMerges(Seq((1L, "ab")).toDF("doc_id", "text"), 5).size === 1)
  }

  test("encode conserves characters and is bounded by tokens and chars") {
    val docs = graft.Tables.documents(spark, sfDir)
    val enc = Bpe.encode(docs)
    val bad = enc.where(col("n_bpe_tokens") > col("n_chars") ||
        col("n_bpe_tokens") < col("n_ws_tokens")).count()
    assert(bad === 0L, "n_ws_tokens <= n_bpe_tokens <= n_chars must hold per doc")
    // merges strictly compress on this corpus
    val agg = enc.agg(sum("n_bpe_tokens"), sum("n_chars")).as[(Long, Long)].head()
    assert(agg._1 < agg._2)
  }

  test("vocab is the post-merge symbol table with exact totals") {
    // words: ab ×2, cd ×1 → round 1 merges (a,b). Post-merge symbols:
    // ab (2 occurrences, 1 word), c and d (1 occurrence, 1 word each)
    val docs = Seq((1L, "ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val v = Bpe.vocab(docs, rounds = 1).orderBy("rank")
      .select("symbol", "n_occ", "n_words", "rank")
      .as[(String, Long, Long, Long)].collect()
    assert(v === Array(("ab", 2L, 1L, 1L), ("c", 1L, 1L, 2L), ("d", 1L, 1L, 3L)))
    // rank ties break on symbol; the merged subword outranks the chars
  }

  test("training is deterministic across runs and repartitionings") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = Bpe.trainMerges(docs)
    val b = Bpe.trainMerges(docs.repartition(7))
    assert(a === b)
    assert(a.size === Bpe.Rounds, s"driver corpus must sustain ${Bpe.Rounds} rounds")
  }
}
