package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming LSH ingest-dedup laws: the per-document JVM signature is
  * bit-identical to the batch minhash columns (the parity root), near-dup
  * pairs surface across micro-batches, unrelated docs stay silent, and
  * bucket state respects its FIFO capacity. */
class StreamingLshSpec extends SparkSpec {
  import spark.implicits._

  test("local JVM signature == batch minhashSignatures on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).limit(30).select("doc_id", "text")
    val batch = graft.analytics.Dedup.minhashSignatures(docs, n = 5, numHashes = 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap
    val local = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      graft.analytics.Dedup.localMinhashSignature(text, 5, 16).map(id -> _.toSeq)
    }.toMap
    // same doc set signs (short docs absent from both) and same values
    assert(local.keySet == batch.keySet,
      s"doc sets differ: ${local.keySet.diff(batch.keySet)} / ${batch.keySet.diff(local.keySet)}")
    local.foreach { case (id, sig) =>
      assert(sig == batch(id), s"signature mismatch for doc $id")
    }
    assert(batch.nonEmpty, "parity test needs signed documents")
  }

  private def runBatches(batches: Seq[Seq[(Long, String)]], threshold: Double,
                         capacity: Int = 256): Seq[StreamDupCandidate] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"lsh_stream_${System.nanoTime()}"
    val q = StreamingLsh.candidates(ms.toDS(), threshold = threshold, capacity = capacity)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[StreamDupCandidate].collect().toSeq
  }

  test("near-dups surface across micro-batches; unrelated docs stay silent") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 37) "CHANGED" else s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val out = runBatches(Seq(Seq(1L -> base, 3L -> other), Seq(2L -> nearDup)),
      threshold = 0.5)
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the near-dup pair, got $out")
    // signature agreement of a one-word edit is high
    assert(out.filter(c => (c.doc_a, c.doc_b) == ((1L, 2L))).forall(_.est_jaccard >= 0.5))
    // an exact duplicate arriving later matches with full agreement
    val out2 = runBatches(Seq(Seq(1L -> base), Seq(2L -> base)), threshold = 0.99)
    assert(out2.nonEmpty && out2.forall(c =>
      c.doc_a == 1L && c.doc_b == 2L && c.est_jaccard == 1.0), s"exact dup: $out2")
  }

  test("null documents are skipped like the batch path, not query-fatal") {
    // batch minhashSignatures drops null text via split semantics; the JVM
    // mirror must match (a null doc in a streaming batch used to NPE and
    // kill the whole query)
    assert(graft.analytics.Dedup.localMinhashSignature(null, 5, 16).isEmpty)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val out = runBatches(Seq(Seq(1L -> base, 9L -> null), Seq(2L -> base)),
      threshold = 0.99)
    assert(out.map(c => (c.doc_a, c.doc_b)).toSet == Set((1L, 2L)),
      s"null doc must vanish, dup pair must still surface: $out")
  }

  test("local winnowed fingerprints == batch winnowedFingerprints on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).limit(50).select("doc_id", "text")
    val batch = graft.analytics.Dedup.winnowedFingerprints(docs, 20, 8)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, v) => d -> v.map(_._2).toSet }
    val local = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      graft.analytics.Dedup.localWinnowedFingerprints(text, 20, 8).map(id -> _)
    }.toMap
    assert(local.keySet == batch.keySet,
      s"doc sets differ: ${local.keySet.diff(batch.keySet)} / ${batch.keySet.diff(local.keySet)}")
    local.foreach { case (id, fps) =>
      assert(fps == batch(id), s"fingerprint set mismatch for doc $id")
    }
    assert(batch.nonEmpty, "parity test needs fingerprinted documents")
  }

  test("substring ingest guard: a boilerplate-wrapped span collides, fresh text stays silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    // doc 2 wraps a 64-char VERBATIM span of doc 1 in fresh boilerplate —
    // the substring case exact digests miss (different documents) and
    // minhash can miss (the surrounding words dominate the shingle set);
    // the winnowing guarantee (64 >= k + w - 1 = 27) makes the collision
    // certain, not probabilistic. doc 3 is unrelated and must stay silent.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val base = (alpha + alpha.toUpperCase + "0123456789!@#$%^&*()[]{}<>,./?;:" +
      alpha.reverse).take(120)
    val span = base.substring(20, 84)
    val wrapped = ("JUNKJUNKJUNKJUNKJUNKJUNKJUNK-" + span + "-PADPADPADPADPADPADPAD")
    val other = "No shared twenty-gram lives anywhere inside this perfectly novel sentence at all."
    val ms = MemoryStream[(Long, String)]
    val name = s"sub_stream_${System.nanoTime()}"
    val q = StreamingLsh.substringCandidates(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(1L -> base, 3L -> other): _*); q.processAllAvailable()
      ms.addData(Seq(2L -> wrapped, 9L -> null): _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[StreamDupCandidate].collect().toSeq
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the wrapped-span pair, got $out")
    assert(out.forall(_.est_jaccard == 1.0), "fingerprint equality is exact")
    // the streamed signal is the batch signal: substringWinnowPairs over
    // the same three docs finds the same (and only the same) pair
    val batchPairs = graft.analytics.Dedup.substringWinnowPairs(
        Seq(1L -> base, 2L -> wrapped, 3L -> other).toDF("doc_id", "text"),
        k = 20, w = 8, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L)), s"batch/stream signal diverged: $batchPairs")
  }

  test("local CDC chunk hashes == batch cdcChunks on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(col("text").isNotNull).limit(30).select("doc_id", "text")
    val batch = graft.analytics.Dedup.cdcChunks(docs)
      .select("doc_id", "c_start", "c_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val local = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      graft.analytics.Dedup.localCdcChunkHashes(text).map(id -> _)
    }.toMap
    assert(local.keySet == batch.keySet,
      s"doc sets differ: ${local.keySet.diff(batch.keySet)} / ${batch.keySet.diff(local.keySet)}")
    local.foreach { case (id, hs) => assert(hs == batch(id), s"doc $id") }
    assert(batch.nonEmpty, "parity test needs chunked documents")
  }

  test("CDC ingest guard: shifted shared bytes collide, fresh text stays silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    // doc 2 is doc 1 behind an inserted prefix: every fixed-size frame
    // moves, every content-defined boundary in the shared suffix holds —
    // the chunks re-align and the digests collide at ingest. doc 3 is
    // fresh content and must stay silent.
    def randText(seed: Long, n: Int): String = {
      val sb = new StringBuilder; var x = seed
      (0 until n).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        val r = ((x >>> 33) % 27).toInt
        sb.append(if (r == 26) ' ' else ('a' + r).toChar)
      }
      sb.toString
    }
    val base = randText(42L, 600)
    val shifted = "completely fresh boilerplate prefix " + base
    val other = randText(99L, 600)
    val ms = MemoryStream[(Long, String)]
    val name = s"cdc_stream_${System.nanoTime()}"
    val q = StreamingLsh.cdcCandidates(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(1L -> base, 3L -> other): _*); q.processAllAvailable()
      ms.addData(Seq(2L -> shifted, 9L -> null): _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[StreamDupCandidate].collect().toSeq
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the shifted pair, got $pairs")
    assert(out.forall(_.est_jaccard == 1.0), "chunk digest equality is exact")
    // several chunks collide, not just one — the suffix re-aligns
    assert(out.size >= 3, s"expected several shared chunks, got ${out.size}")
    // the streamed signal is the batch signal: the report over the same
    // three docs shares exactly the colliding chunk set
    val rep = graft.analytics.Dedup.cdcReport(
        Seq(1L -> base, 2L -> shifted, 3L -> other).toDF("doc_id", "text"))
      .collect()
    assert(rep.length == out.size, s"batch ${rep.length} vs stream ${out.size}")
  }

  test("composed ingest prep: the C4 gate feeds LSH dedup inside ONE streaming query") {
    // the batch gate is a stateless projection (StreamingGateSpec), so it
    // chains in front of the stateful LSH stage with no glue: gated-out
    // docs must never reach candidate generation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val gated = graft.analytics.TextAnalysis
      .c4Filter(ms.toDS().toDF("doc_id", "text"), minTokens = 20)
      .where(col("keep")).select("doc_id", "text").as[(Long, String)]
    val name = s"prep_stream_${System.nanoTime()}"
    val q = StreamingLsh.candidates(gated, threshold = 0.9)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // docs 1/2: identical, pass every gate (>= 20 tokens, stopword-rich,
    // English). docs 3/4: identical but UNDER the token gate — silently
    // dropped, so no (3,4) pair may surface though their signatures match.
    val long = "the order is fast and the scan is in the table of the " +
      "work we do here now for all good men"
    val short = "tiny duplicated doc."
    try {
      ms.addData(Seq(1L -> long, 3L -> short): _*); q.processAllAvailable()
      ms.addData(Seq(2L -> long, 4L -> short): _*); q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table(name).as[StreamDupCandidate]
      .collect().map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)),
      s"gate must stop the short dup pair before dedup, got $pairs")
  }

  test("embedding path: JVM hyperplane signature == batch expression on the real corpus") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(30)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val batch = emb.select(col("vec_id"),
        call_function("hyperplane_sig", col("e"), lit(64), lit(4), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val local = emb.as[(Long, Seq[Double])].collect().map { case (id, v) =>
      id -> graft.functions.HyperplaneSig.signatureLocal(v.toArray, 64, 4, 4).get.toSeq
    }.toMap
    assert(local.nonEmpty && local.keySet == batch.keySet)
    local.foreach { case (id, sig) => assert(sig == batch(id), s"sig mismatch vec $id") }
  }

  test("streaming embedding near-dups: perturbed twin pairs, orthogonal vector stays silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val dims = 64
    val base = Seq.tabulate(dims)(i => math.sin(i + 1.0))
    val twin = base.updated(7, base(7) + 0.01) // tiny perturbation: same signs
    val ortho = Seq.tabulate(dims)(i => if (i % 2 == 0) 1.0 else -1.0)
    val ms = MemoryStream[(Long, Seq[Double])]
    val name = s"elsh_stream_${System.nanoTime()}"
    val q = StreamingLsh.embeddingCandidates(ms.toDS(), dims = dims)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(1L -> base, 3L -> ortho): _*); q.processAllAvailable()
      ms.addData(Seq(2L -> twin): _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[StreamDupCandidate].collect().toSeq
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the twin pair, got $out")
    assert(out.forall(_.est_jaccard >= 0.875), s"twin bit agreement low: $out")
  }

  test("semantic guard: local assignment mirror == batch semanticDedup trace on the real corpus") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val batch = graft.analytics.Similarity.semanticDedupOf(emb, nLists = 16, tau = 0.4)
      .select("vec_id", "list_id", "cent_cos")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cents = graft.analytics.Similarity.hashCentroids(emb, 16)
    val local = emb.as[(Long, Seq[Double])].collect().map { case (id, v) =>
      id -> graft.analytics.Similarity.localListAssign(v.toArray, cents).get
    }.toMap
    assert(local.nonEmpty && local.keySet == batch.keySet)
    local.foreach { case (id, a) =>
      assert(a == batch(id), s"assignment mismatch vec $id: local $a vs batch ${batch(id)}")
    }
  }

  test("streaming semantic guard: paraphrase trio collides in its cluster, unrelated vectors stay silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq }
    val spreadV = (0L until 40L).map(i => i -> unit(Array.fill(16)(rnd.nextGaussian())))
    val proto = Array.fill(16)(rnd.nextGaussian())
    val trio = (100L to 102L).map { i =>
      i -> unit(proto.zipWithIndex.map { case (x, d) => x + 0.02 * rnd.nextGaussian() * (d % 3) })
    }
    // the cluster index is a batch-trained model parameter: centroids come
    // from the batch frame of the same corpus, as serving would load them
    val corpus = (spreadV ++ trio).map { case (i, v) => (i, v) }.toDF("vec_id", "e")
    val cents = graft.analytics.Similarity.hashCentroids(corpus, 4)
    val ms = MemoryStream[(Long, Seq[Double])]
    val name = s"sem_stream_${System.nanoTime()}"
    val q = StreamingLsh.semanticCandidates(ms.toDS(), cents, tau = 0.9)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(spreadV :+ (100L -> trio.head._2): _*); q.processAllAvailable()
      ms.addData(Seq(101L -> trio(1)._2, 102L -> trio(2)._2): _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[StreamingLsh.StreamSemanticCandidate].collect().toSeq
    val pairs = out.map(c => (c.vec_a, c.vec_b)).toSet
    assert(pairs == Set((100L, 101L), (100L, 102L), (101L, 102L)),
      s"expected exactly the trio pairs (cross-batch included), got $out")
    // the emitted cos IS the batch-side exact rounded cosine
    val vecs = (spreadV ++ trio).toMap
    out.foreach { c =>
      val expect = graft.analytics.Similarity.localCosine4(
        vecs(c.vec_a).toArray, vecs(c.vec_b).toArray)
      assert(c.cos == expect && c.cos >= 0.9, s"cos mismatch for $c (expected $expect)")
    }
  }

  test("spill guard: local top-2 mirror == batch semanticDedupMulti assignment on the real corpus") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val cents = graft.analytics.Similarity.hashCentroids(emb, 16)
    val vecs = emb.as[(Long, Seq[Double])].collect()
    for (eps <- Seq(0.05, -1.0)) {
      val batch = graft.analytics.Similarity
        .semanticDedupMultiOf(emb, nLists = 16, tau = 0.4, eps = eps)
        .select("vec_id", "list_id", "list_id2").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      val epsI = math.round(eps * 1e4)
      vecs.foreach { case (id, v) =>
        val local = graft.analytics.Similarity
          .localListAssignTop2(v.toArray, cents, epsI).get
        val (bl, bl2) = batch(id)
        assert(local.head == bl && local.drop(1).headOption == bl2,
          s"eps=$eps vec $id: local $local vs batch ($bl, $bl2)")
      }
    }
  }

  test("spill guard e2e: a list-straddling pair is invisible to the single guard, caught by the spilled one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(31)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val base = (0L until 100L).map(i => i -> unit(Array.fill(16)(rnd.nextGaussian())))
    val baseDf = base.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "e")
    val cents = graft.analytics.Similarity.hashCentroids(baseDf, 4)
    val Array(ca, cb) = Array(cents(0)._2, cents(1)._2)
    def mix(wa: Double, wb: Double): Seq[Double] =
      unit(ca.zip(cb).map { case (x, y) => wa * x + wb * y }).toSeq
    val (v1, v2) = (mix(0.51, 0.49), mix(0.49, 0.51))
    // sanity: the pair truly straddles (different primaries) and both spill
    val a1 = graft.analytics.Similarity.localListAssignTop2(v1.toArray, cents, 500).get
    val a2 = graft.analytics.Similarity.localListAssignTop2(v2.toArray, cents, 500).get
    assert(a1.head != a2.head, "planted pair does not straddle")
    assert(a1.size == 2 && a2.size == 2, "planted pair does not spill")
    def run(spilled: Boolean): Seq[StreamingLsh.StreamSemanticCandidate] = {
      val ms = MemoryStream[(Long, Seq[Double])]
      val name = s"spill_${spilled}_${System.nanoTime()}"
      val src =
        if (spilled) StreamingLsh.semanticCandidatesSpilled(ms.toDS(), cents, tau = 0.9, eps = 0.05)
        else StreamingLsh.semanticCandidates(ms.toDS(), cents, tau = 0.9)
      val q = src.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        ms.addData(Seq(1000L -> v1)); q.processAllAvailable()
        ms.addData(Seq(1001L -> v2)); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[StreamingLsh.StreamSemanticCandidate].collect().toSeq
    }
    assert(run(spilled = false).isEmpty,
      "single-assignment guard saw the straddled pair — the planting is broken")
    val out = run(spilled = true)
    assert(out.map(c => (c.vec_a, c.vec_b)).toSet == Set((1000L, 1001L)),
      s"spilled guard missed the straddled pair: $out")
    // shared-in-both-lists pairs may emit once per shared list; consumers
    // dedup on (vec_a, vec_b) like the batch distinct
    assert(out.size <= 2, s"more emissions than shared lists: $out")
    out.foreach(c => assert(c.cos >= 0.9))
  }

  test("pure FIFO: a resident re-arrival emits nothing and keeps its eviction position") {
    val text = (1 to 20).map(i => s"f$i").mkString(" ")
    // capacity 2: state [1,2]; re-ingesting 1 must NOT re-emit (1,2) nor
    // refresh 1's position (LRU would). Doc 3 then evicts 1 (FIFO), so
    // doc 4 pairs with {2,3} — under the old refresh semantics it would
    // have paired with {1,3} and (1,2) would appear twice per band.
    val out = runBatches(
      Seq(Seq(1L -> text), Seq(2L -> text), Seq(1L -> text), Seq(3L -> text),
        Seq(4L -> text)),
      threshold = 0.99, capacity = 2)
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"FIFO re-arrival semantics violated: $out")
    val perBand = out.groupBy(c => (c.doc_a, c.doc_b, c.band)).view.mapValues(_.size)
    assert(perBand.values.forall(_ == 1),
      s"duplicate emissions on re-arrival: ${perBand.filter(_._2 > 1)}")
  }

  test("FIFO capacity bounds bucket state: evicted docs no longer pair") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    // capacity 1 per bucket: doc 1 is evicted by doc 2, so doc 3 pairs
    // only with doc 2 even though all three are identical
    val out = runBatches(
      Seq(Seq(1L -> text), Seq(2L -> text), Seq(3L -> text)),
      threshold = 0.99, capacity = 1)
    val pairs = out.map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"capacity-1 window must pair only adjacent arrivals, got $pairs")
  }
}
