package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-12 late batch: MMR diversified re-ranking,
  * similarity-graph PageRank, and DSIR importance selection. Each has a
  * DuckDB hash oracle for end-to-end values; these specs pin the
  * engine-side semantics on constructed inputs (hand-replayable) and the
  * corpus-level laws the oracle cannot express. */
class MmrGraphDsirSpec extends SparkSpec {
  import spark.implicits._

  // ---- MMR ----

  test("mmr: lamC=10 degenerates to pure relevance top-k (the IVF ranking)") {
    val mmr = Similarity.mmrRerank(spark, sfDir, kSel = 5, lamC = 10)
      .select($"q_id", $"pick", $"n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val topk = Similarity.annIvfCosine(spark, sfDir, k = 5)
      .select($"q_id", $"rank", $"n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mmr == topk)
  }

  test("mmr greedy loop: hand-computed picks on a constructed candidate frame") {
    // one query, 4 candidates: a(rel 100) b(90) c(80) d(10);
    // a~b nearly identical (pc 95), a~c dissimilar (pc 10), b~c 10, d far (0)
    val cand = Seq((1L, 10L, 100L), (1L, 11L, 90L), (1L, 12L, 80L), (1L, 13L, 10L))
      .toDF("q_id", "n_id", "rel")
    val sims = Seq((10L, 11L, 95L), (10L, 12L, 10L), (11L, 12L, 10L),
        (10L, 13L, 0L), (11L, 13L, 0L), (12L, 13L, 0L))
    val pairs = (sims.map { case (a, b, p) => (1L, a, b, p) } ++
        sims.map { case (a, b, p) => (1L, b, a, p) })
      .toDF("q_id", "a_id", "b_id", "pc")
    val out = Similarity.mmrGreedy(cand, pairs, kSel = 3, lamC = 7)
      .orderBy("pick")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // pick1: a (7*100=700). pick2: b=7*90-3*95=345, c=7*80-3*10=530,
    // d=7*10-3*0=70 -> c. pick3: b=7*90-3*95=345 vs d=70 -> b.
    assert(out.toSeq == Seq((1L, 10L, 700L), (2L, 12L, 530L), (3L, 11L, 345L)))
  }

  test("mmr: every pick's score replays from relevance and the pairwise max to prior picks") {
    val cand = Similarity.mmrCandidates(spark, sfDir)
    val rel = cand._1.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pc = cand._2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val picks = Similarity.mmrRerank(spark, sfDir).orderBy("q_id", "pick")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(picks.nonEmpty)
    picks.groupBy(_._1).foreach { case (q, ps) =>
      val ordered = ps.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, pick, n, mmr), i) =>
        assert(pick == i + 1)
        val prior = ordered.take(i).map(_._3)
        val expected =
          if (i == 0) 7L * rel(q -> n)
          else 7L * rel(q -> n) - 3L * prior.map(s => pc((q, n, s))).max
        assert(mmr == expected, s"q=$q pick=$pick n=$n")
      }
    }
  }

  test("mmr: diversity does not regress — picked set's max pairwise sim <= top-k set's") {
    val pc = Similarity.mmrCandidates(spark, sfDir)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    def maxPair(sel: Map[Long, Seq[Long]]): Long = sel.flatMap { case (q, ns) =>
      for (a <- ns; b <- ns if a != b) yield pc((q, a, b))
    }.max
    val mmrSel = Similarity.mmrRerank(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSeq }
    val topSel = Similarity.annIvfCosine(spark, sfDir, k = 5).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    assert(maxPair(mmrSel) <= maxPair(topSel))
  }

  // ---- PageRank ----

  test("pagerank: a cycle is a fixed point — every node keeps exactly Scale mass") {
    val n = 6
    val pairs = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("vec_a", "vec_b")
    val r = GraphRank.pagerank(pairs, iters = 7).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r.size == n)
    assert(r.values.forall(_ == 1000000000000L))
  }

  test("pagerank: star graph replays the integer recurrence by hand") {
    // star: center 0, leaves 1..4
    val pairs = (1 to 4).map(i => (0L, i.toLong)).toDF("vec_a", "vec_b")
    val S = 1000000000000L
    var center = S; var leaf = S
    for (_ <- 1 to 10) {
      val c2 = (15L * S + 85L * (4L * leaf)) / 100L       // leaves have deg 1
      val l2 = (15L * S + 85L * (center / 4L)) / 100L     // center deg 4, split
      center = c2; leaf = l2
    }
    val r = GraphRank.pagerank(pairs, iters = 10).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(0L) == center)
    assert((1L to 4L).forall(r(_) == leaf))
    assert(r(0L) > r(1L)) // the hub concentrates mass
  }

  test("pagerank query: contiguous ranks over the corpus graph, repartition-invariant") {
    val out = GraphRank.pagerankQuery(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(out.map(_.getLong(2)).toSeq == (1L to out.length).toSeq)
    assert(out.forall(_.getLong(1) > 0L))
    val pairs = Similarity.embeddingDupLsh(spark, sfDir).select("vec_a", "vec_b")
    val a = GraphRank.pagerank(pairs, 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphRank.pagerank(pairs.repartition(13), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // ---- DSIR ----

  test("dsir: engine weights replay exactly from a local log-likelihood-ratio model") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 64
    def bkt(w: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseUnsignedLong(d.take(15), 16) % B).toInt
    }
    val perDoc = docs.map { case (id, lang, text) =>
      (id, lang, text.trim.split("\\s+").toSeq.map(bkt).groupBy(identity).view.mapValues(_.size).toMap)
    }
    val ct = Array.fill(B)(0L); val cr = Array.fill(B)(0L)
    perDoc.foreach { case (_, lang, cnts) =>
      cnts.foreach { case (b, c) =>
        cr(b) += c; if (lang == "en") ct(b) += c
      }
    }
    val nt = ct.sum; val nr = cr.sum
    val lr = Array.tabulate(B) { b =>
      if (cr(b) == 0L) 0L // bucket absent from the model frame
      else math.round(math.log(((ct(b) + 1).toDouble / (nt + B)) /
        ((cr(b) + 1).toDouble / (nr + B))) * 1e8)
    }
    val w = perDoc.map { case (id, _, cnts) =>
      id -> cnts.map { case (b, c) => c.toLong * lr(b) }.sum
    }.toMap
    val expTop = w.toSeq.sortBy { case (id, wv) => (-wv, id) }.take(100)
    val got = Sampling.dsirQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.length == expTop.length)
    got.zip(expTop).zipWithIndex.foreach { case (((gid, gw, grk), (eid, ew)), i) =>
      assert(gid == eid && gw == ew && grk == i + 1, s"rank ${i + 1}")
    }
  }

  test("dsir: target == raw corpus zeroes every weight; ranking falls back to doc_id") {
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("lang", lit("en"))
    val out = Sampling.dsirSelect(docs, targetLang = "en", keepK = 20)
      .orderBy("rank").collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(3) == 0L))
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq.sorted)
  }

  test("dsir: the English target slice outranks the rest on average (the signal works)") {
    val out = Sampling.dsirQuery(spark, sfDir).collect()
      .map(r => (r.getString(2), r.getLong(4)))
    val en = out.filter(_._1 == "en").map(_._2)
    val rest = out.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty)
    // top-100 of a 500-doc corpus: the target language dominates the keep set
    assert(en.length > rest.length)
  }

  test("dsir gumbel: engine resample replays exactly from local weights + salted-hash draws") {
    val docs = graft.Tables.documents(spark, sfDir)
    val w = Sampling.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def md560(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseUnsignedLong(d.take(15), 16)
    }
    val scored = w.map { case (id, wv) =>
      val u = (md560(s"dg:$id") + 1).toDouble / 1.152921504606846976e18
      val g8 = math.round(-math.log(-math.log(u)) * 1e8)
      (id, wv, g8, wv + g8 / 10L)
    }.toSeq
    val expect = scored.sortBy { case (id, _, _, s) => (-s, id) }.take(100)
    val got = Sampling.dsirGumbelQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == expect.length)
    got.zip(expect).zipWithIndex.foreach { case (((gid, gw, gg, gs, grk), (eid, ew, eg, es)), i) =>
      assert(gid == eid && gw == ew && gg == eg && gs == es && grk == i + 1, s"rank ${i + 1}")
    }
    // tempered, not uniform: the resample still prefers weight (kept
    // mean above the corpus mean), but is not the deterministic head
    val keptIds = got.map(_._1).toSet
    val headIds = Sampling.dsirQuery(spark, sfDir).collect().map(_.getLong(0)).toSet
    val meanKept = got.map(_._2).sum.toDouble / got.length
    val meanAll = w.values.sum.toDouble / w.size
    assert(meanKept > meanAll, "the resample must remain weight-driven")
    assert(keptIds != headIds, "the draw must admit below-the-cutoff diversity")
  }
}
