package graft.analytics

import graft.SparkSpec

/** Frame-sampling laws: bounded per-doc fan-out, strided indexes, and
  * digests that match a hand-computed slice. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("frameSample: bounded fan-out, strided frame indexes, exact slice digests") {
    val text = ("ab" * 400) + "tail" // 804 bytes -> 25 full 32-byte frames
    val docs = Seq(
      (1L, text),
      (2L, "short"),          // < 1 frame: must be absent
      (3L, "x" * 64)          // exactly 2 frames -> 1 sample (ceil(2/4)=1)
    ).toDF("doc_id", "text")
    val rows = Multimodal.frameSample(docs)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    assert(!rows.contains(2L), "sub-frame doc emits nothing")
    val d1 = rows(1L).sortBy(_._2)
    // 25 frames / stride 4 -> ceil = 7 samples, under the cap of 8
    assert(d1.map(_._2).toSeq == Seq(0L, 4L, 8L, 12L, 16L, 20L, 24L))
    assert(d1.forall(_._3 == 25L))
    // digest of frame 4 = md5 of bytes [128, 160)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(128, 160).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.find(_._2 == 4L).get._4 == expected)
    val d3 = rows(3L)
    assert(d3.map(_._2).toSeq == Seq(0L), "2 frames at stride 4 -> one sample")
  }

  test("frameSample: fan-out capped at maxFrames for arbitrarily large payloads") {
    val docs = Seq((1L, "y" * 100000)).toDF("doc_id", "text") // 3125 frames
    val rows = Multimodal.frameSample(docs).collect()
    assert(rows.length == 8, s"cap of 8 samples, got ${rows.length}")
  }

  test("MediaCodec: BMP/WAV build-parse round trip recovers the real header fields") {
    for (len <- Seq(0, 1, 2, 3, 191, 192, 193, 5000)) {
      val data = Array.tabulate(len)(i => (i % 251).toByte)
      val bmp = MediaCodec.probe(MediaCodec.toBmp(data)).get
      val pixels = (len + 2) / 3
      assert(bmp.fmt == "bmp" && bmp.width == 64 &&
        bmp.height == math.max(1, (pixels + 63) / 64), s"bmp len=$len: $bmp")
      val wav = MediaCodec.probe(MediaCodec.toWav(data)).get
      assert(wav.fmt == "wav" && wav.sampleRate == 8000 && wav.channels == 1 &&
        wav.nSamples == (len + 1) / 2, s"wav len=$len: $wav")
    }
  }

  test("MediaCodec: ASCII text never probes as media (validated size fields)") {
    // magic-prefixed text is the trap: 'BM'/'RIFF' starts but ASCII bytes
    // at the size offsets decode to values far above the payload length
    for (s <- Seq("BM" + "x" * 100, "RIFF WAVE is an audio container" * 4,
                  "BMW is a carmaker; RIFFs are in music", "")) {
      assert(MediaCodec.probe(s.getBytes("UTF-8")).isEmpty, s"false positive on: $s")
    }
  }

  test("MediaCodec: hostile WAV size fields neither hang, crash, nor misparse") {
    // probe() runs on arbitrary ingest payloads: a crafted inner-chunk
    // size must not stall the walk (size = -8 advances zero), index out
    // of bounds (negative / oversized sizes), or divide by zero (a
    // valid-looking fmt chunk with bits-per-sample < 8)
    def putLE32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >> 8).toByte
      a(off + 2) = (v >> 16).toByte; a(off + 3) = (v >> 24).toByte
    }
    val base = MediaCodec.toWav(Array.tabulate(64)(_.toByte))
    val zeroAdvance = base.clone();  putLE32(zeroAdvance, 16, -8)        // off += 0 forever
    val negOffset   = base.clone();  putLE32(negOffset, 16, -100)        // off goes negative
    val oversize    = base.clone();  putLE32(oversize, 40, Int.MaxValue) // past the array
    val subByte     = base.clone()
    subByte(34) = 4; subByte(35) = 0                                     // bits-per-sample 4
    for ((bad, name) <- Seq(zeroAdvance -> "zero-advance", negOffset -> "negative-offset",
                            oversize -> "oversize", subByte -> "sub-byte-bits")) {
      assert(MediaCodec.probe(bad).isEmpty, s"hostile wav '$name' must probe as None")
    }
    // and the untouched base still parses — the guards reject only bad fields
    assert(MediaCodec.probe(base).exists(_.fmt == "wav"))
  }

  test("decodeStub: real-media payloads take the header-parse path, text keeps the stub") {
    import org.apache.spark.sql.functions._
    val textBytes = "hello multimodal".getBytes("UTF-8")
    val payloads = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, MediaCodec.toBmp(textBytes)),
        org.apache.spark.sql.Row(2L, MediaCodec.toWav(textBytes)),
        org.apache.spark.sql.Row(3L, textBytes))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val feats = Multimodal.decodeStub(spark, payloads).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    // bmp: [fmt=1, width=64, height=1, -1, -1, -1, nbytes, 0]
    assert(feats(1L).take(3) == Seq(1.0, 64.0, 1.0), s"bmp features: ${feats(1L)}")
    // wav: [fmt=2, -1, -1, rate=8000, ch=1, nSamples=8, nbytes, 0]
    assert(feats(2L)(0) == 2.0 && feats(2L)(3) == 8000.0 && feats(2L)(5) == 8.0,
      s"wav features: ${feats(2L)}")
    // plain text: byte-slice stub, every feature in [0,1]
    assert(feats(3L).forall(f => f >= 0.0 && f <= 1.0), s"stub features: ${feats(3L)}")
    // and the probe stage itself: one typed metadata row per payload
    val probed = Multimodal.probeMedia(spark, payloads).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(probed == Map(1L -> Some("bmp"), 2L -> Some("wav"), 3L -> None))
  }

  test("toBmp with unaligned width: stride pads to 4 bytes, payload byte 3p sits under pixel p") {
    val data = (0 until 100).map(_.toByte).toArray
    val bmp = MediaCodec.toBmp(data, width = 9) // stride 27 -> padded to 28
    val info = MediaCodec.probe(bmp).get
    assert(info.fmt == "bmp" && info.width == 9L)
    assert(info.height == ((100 + 2) / 3 + 8) / 9) // ceil(34 pixels / 9)
    // pixel p's BGR triple is payload bytes 3p..3p+2 at offset
    // 54 + (p/9)*28 + 3*(p%9) — spot-check across a row boundary
    for (p <- Seq(0, 8, 9, 17, 33)) {
      val off = 54 + (p / 9) * 28 + 3 * (p % 9)
      for (k <- 0 until 3) {
        val want = if (3 * p + k < data.length) data(3 * p + k) else 0.toByte
        assert(bmp(off + k) == want, s"pixel $p byte $k")
      }
    }
  }

  test("dHash: identical payloads collide at hamming 0; the hash reads the DECODED grid") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq((1L, t), (2L, t), (3L, t.replace("quick", "slow")),
      (4L, "zzzz " * 60)).toDF("doc_id", "text")
    val hv = Multimodal.dHash(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hv(1L) === hv(2L), "identical payloads must hash identically")
    // halves are 32-bit non-negative (the sign-safe contract)
    hv.values.foreach { case (h0, h1) =>
      assert(h0 >= 0L && h0 < (1L << 32) && h1 >= 0L && h1 < (1L << 32))
    }
    val pairs = Dedup.hash64Pairs(Multimodal.dHash(spark, docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)), s"exact dup pair missing: ${pairs.toSeq}")
  }

  test("hash64Pairs: banded join finds EXACTLY the brute-force hamming<=3 pairs (pigeonhole recall)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val hv = Multimodal.dHash(spark, docs)
    val banded = Dedup.hash64Pairs(hv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = hv.as("a").join(hv.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.h0").bitwiseXOR(col("b.h0"))) +
          bit_count(col("a.h1").bitwiseXOR(col("b.h1")))).cast("long").as("hamming"))
      .where(col("hamming") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute,
      "4x16-bit banding must be recall-exact for hamming <= 3 (pigeonhole)")
  }

  /** The incr law, one body per medium (the engine shares hashIncrQuery
    * the same way): banded verdicts equal the brute-force
    * increment×resident sweep, and the increment exercises both
    * outcomes. */
  private def incrBruteForceLaw(
      hasher: (org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame,
      query: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val v1 = CurationAudit.snapshotV1(docs).select("doc_id", "text")
    val v2 = CurationAudit.snapshotV2(docs).select("doc_id", "text")
    val v1dig = v1.select(col("doc_id"), md5(col("text")).as("dig"))
    val inc = v2.withColumn("dig", md5(col("text")))
      .join(v1dig, Seq("doc_id", "dig"), "left_anti").select("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      hasher(spark, df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (rs, is) = (sigs(v1), sigs(inc))
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // brute-force verdict per increment doc: lexicographic-min
    // (hamming, resident id) among neighbors within 3
    val want = is.map { case (id, s) =>
      val best = rs.iterator.map { case (rid, r) => (ham(r, s), rid) }
        .filter(_._1 <= 3L).minOption
      id -> best
    }
    val got = query(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
                       else Some((r.getLong(2), r.getLong(1))))
    }.toMap
    assert(got.keySet == want.keySet, "one verdict row per increment doc")
    assert(got == want.map { case (k, v) => k -> v },
      "banded verdicts must equal the brute-force sweep")
    // the increment must contain both outcomes for the law to bite
    assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty))
  }

  test("phash_incr: verdicts equal the brute-force increment×resident sweep") {
    incrBruteForceLaw(Multimodal.dHash, Multimodal.phashIncrQuery)
  }

  test("ahash_incr: verdicts equal the brute-force increment×resident sweep") {
    incrBruteForceLaw(Multimodal.aHash, Multimodal.ahashIncrQuery)
  }

  test("ahash_clusters: keepers are the min-reachable-id member of each audio pair component") {
    // local union-find over the engine's own pairs — an independent
    // fixpoint the cluster query must agree with (the dupClusters law,
    // re-pinned on the audio face)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val pairs = graft.analytics.Dedup.hash64Pairs(Multimodal.aHash(spark, docs))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must surface at least one audio near-dup pair")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = Multimodal.ahashClustersQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.keySet == ids.toSet, "one keeper row per document")
    ids.foreach { id => assert(got(id) == find(id), s"doc $id keeper") }
  }

  test("dAHash: the fused pass equals dHash + aHash run separately, row for row (r17 #3)") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val fused = Multimodal.dAHash(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val dh = Multimodal.dHash(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ah = Multimodal.aHash(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fused.keySet == dh.keySet && fused.keySet == ah.keySet)
    assert(fused.nonEmpty)
    fused.foreach { case (id, (d0, d1, a0, a1)) =>
      assert((d0, d1) == dh(id), s"doc $id: fused dHash halves must equal the solo pass")
      assert((a0, a1) == ah(id), s"doc $id: fused aHash halves must equal the solo pass")
    }
  }
}
