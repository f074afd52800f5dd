package graft.analytics

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The persisted-artifact lifecycle for the REMAINING model-parameter
  * families (VERDICT r12 #4/#5 — [[IvfIndexSpec]] covers the flat/refined
  * IVF rung): PQ codebooks+codes, SQ8 codes, the deep-BPE merge table,
  * and the serving COMPOSITIONS (hybrid RRF, MMR, negative mining) that
  * now read the session's persisted rounds-0 IVF index. The laws are the
  * deployment laws:
  *   (1) artifacts round-trip the model parameters bit-exactly and a
  *       rebuild reproduces them (the build is deterministic in its key);
  *   (2) serving from the artifact reproduces the inline-trained results
  *       row-for-row;
  *   (3) the serving plan is provably FREE of the training expressions —
  *       no encode shuffle (`posexplode`), no corpus assignment
  *       (`array_max`) — and reads the persisted membership instead. */
class IndexArtifactsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_art_$tag").toString

  private def rows4(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  // -- PQ --

  private lazy val pqPath: String = {
    val p = tmp("pq"); Similarity.buildPqIndex(spark, sfDir, p); p
  }

  test("PQ codebook artifact round-trips bit-exactly and rebuilds identically") {
    val cb = Similarity.loadPqCodebooks(spark, pqPath)
    assert(cb.length === 16 && cb.forall(_.length === 16))
    val p2 = tmp("pq2"); Similarity.buildPqIndex(spark, sfDir, p2)
    val cb2 = Similarity.loadPqCodebooks(spark, p2)
    cb.zip(cb2).foreach { case (ma, mb) =>
      ma.zip(mb).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), "codewords must round-trip bit-exactly")
      }
    }
  }

  test("PQ serving from the artifact == inline annIvfPq, row for row") {
    val served = rows4(Similarity.annIvfPqServe(spark, sfDir, pqPath))
    val inline = rows4(Similarity.annIvfPq(spark, sfDir))
    assert(served.nonEmpty && served === inline)
  }

  test("PQ serving plan carries no training or assignment expression") {
    val plan = Similarity.annIvfPqServe(spark, sfDir, pqPath)
      .queryExecution.executedPlan.toString
    assert(plan.contains("codes") && plan.contains("assign"),
      "serve must scan the persisted codes + membership")
    assert(!plan.contains("posexplode"),
      "served plan must be free of the encode shuffle")
    assert(!plan.contains("array_max"),
      "served plan must be free of the corpus assignment expression")
    // marker check: the inline plan DOES encode + assign in-plan
    val inlinePlan = Similarity.annIvfPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(inlinePlan.contains("posexplode") || inlinePlan.contains("InMemory"),
      "marker: inline encodes in-plan (or reads its own eager cache)")
  }

  // -- OPQ --

  private lazy val opqPath: String = {
    val p = tmp("opq"); Similarity.buildOpqIndex(spark, sfDir, p); p
  }

  test("OPQ rotation artifact round-trips as a bijection and rebuilds identically") {
    val perm = Similarity.loadOpqPerm(spark, opqPath)
    assert(perm.length === 64 && perm.toSet === (0 until 64).toSet,
      "the stored rotation must be a permutation of the 64 dims")
    val p2 = tmp("opq2"); Similarity.buildOpqIndex(spark, sfDir, p2)
    assert(java.util.Arrays.equals(perm, Similarity.loadOpqPerm(spark, p2)),
      "the fit is deterministic in its inputs")
  }

  test("OPQ serving from the artifact == inline annIvfOpq, row for row") {
    val served = rows4(Similarity.annIvfOpqServe(spark, sfDir, opqPath))
    val inline = rows4(Similarity.annIvfOpq(spark, sfDir))
    assert(served.nonEmpty && served === inline)
    // the gate law on THIS corpus: subspace variances are balanced
    // within the 15% engagement bar, so the rotation is the identity
    // and the rung is bit-identical to plain PQ (the knn_eval rows are
    // equal by construction, not by luck)
    val perm = Similarity.loadOpqPerm(spark, opqPath)
    if (perm.zipWithIndex.forall { case (d, i) => d == i })
      assert(served === rows4(Similarity.annIvfPq(spark, sfDir)),
        "identity rotation must reproduce the PQ rung exactly")
  }

  // -- SQ8 --

  private lazy val sq8Path: String = {
    val p = tmp("sq8"); Similarity.buildSq8Index(spark, sfDir, p); p
  }

  test("SQ8 serving from the artifact == inline annIvfSq8, row for row") {
    val served = rows4(Similarity.annIvfSq8Serve(spark, sfDir, sq8Path))
    val inline = rows4(Similarity.annIvfSq8(spark, sfDir))
    assert(served.nonEmpty && served === inline)
  }

  test("SQ8 serving plan reads persisted codes, no quantize pass or assignment") {
    val plan = Similarity.annIvfSq8Serve(spark, sfDir, sq8Path)
      .queryExecution.executedPlan.toString
    assert(plan.contains("codes") && plan.contains("assign"))
    assert(!plan.contains("array_max"),
      "served plan must be free of the corpus assignment expression")
    assert(!plan.contains("array_min"),
      "served plan must be free of the quantize codebook pass (array_min/max over e)")
    val inlinePlan = Similarity.annIvfSq8(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(inlinePlan.contains("array_max"), "marker: inline assigns in-plan")
  }

  // -- balanced IVF (the penalty map IS part of the artifact) --

  test("balanced index: penalty map round-trips; served == inline; plan assignment-free") {
    val p = tmp("bal")
    Similarity.buildBalancedIvfIndex(spark, sfDir, p)
    val pen = Similarity.loadIvfPenalties(spark, p)
    assert(pen.size === 16 && pen.values.forall(_ >= 0L))
    // a rebuild reproduces centroids AND penalties bit-exactly
    val p2 = tmp("bal2")
    Similarity.buildBalancedIvfIndex(spark, sfDir, p2)
    assert(Similarity.loadIvfPenalties(spark, p2) === pen)
    val c1 = Similarity.loadIvfCentroids(spark, p)
    val c2 = Similarity.loadIvfCentroids(spark, p2)
    c1.zip(c2).foreach { case ((i1, a), (i2, b)) =>
      assert(i1 === i2 && java.util.Arrays.equals(a, b))
    }
    val served = rows4(Similarity.annIvfBalancedServe(spark, sfDir, p))
    val inline = rows4(Similarity.annIvfBalanced(spark, sfDir))
    assert(served.nonEmpty && served === inline)
    val plan = Similarity.annIvfBalancedServe(spark, sfDir, p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("assign") && !plan.contains("array_max"))
  }

  // -- incremental insert + compaction (VERDICT r13 #3) --

  test("ivfInsert: base build + insert by the stored rule == fresh full rebuild; compaction changes nothing") {
    import org.apache.spark.sql.functions.{col, lit}
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val h = graft.functions.Hashes.md5Long60(col("vec_id").cast("string"))
    val p = tmp("ins")
    Similarity.buildIvfIndexOf(spark,
      embL.where(h < lit(Similarity.InsertHashThreshold)), p, nLists = 16, rounds = 0)
    Similarity.ivfInsert(spark, p, embL.where(h >= lit(Similarity.InsertHashThreshold)))
    // the union membership equals a fresh full-corpus build's (the seed
    // set is contained in the base split by construction, so the stored
    // centroids are the full build's centroids)
    val p2 = tmp("insfull")
    Similarity.buildIvfIndexOf(spark, embL, p2, nLists = 16, rounds = 0)
    def assignRows(path: String) = spark.read.parquet(path + "/assign")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a1 = assignRows(p)
    assert(a1.nonEmpty && a1 === assignRows(p2),
      "base+insert membership must equal the fresh rebuild's")
    // serving equality, and compaction is a pure file rewrite
    val before = rows4(Similarity.annIvfServe(spark, sfDir, p))
    Similarity.ivfCompact(spark, p)
    assert(assignRows(p) === a1, "compaction must not change a membership row")
    val after = rows4(Similarity.annIvfServe(spark, sfDir, p))
    val fresh = rows4(Similarity.annIvfServe(spark, sfDir, p2))
    assert(before.nonEmpty && before === after && before === fresh)
  }

  test("ivfDelete: tombstoned residents vanish from serving; compaction applies them physically") {
    import org.apache.spark.sql.functions.{col, lit}
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val h = graft.functions.Hashes.md5Long60(col("vec_id").cast("string"))
    val p = tmp("del")
    Similarity.buildIvfIndexOf(spark, embL, p, nLists = 16, rounds = 0)
    Similarity.ivfDelete(spark, p,
      embL.where(h >= lit(Similarity.InsertHashThreshold)).select(col("vec_id")))
    val served = rows4(Similarity.annIvfServe(spark, sfDir, p))
    // law 1: serving with live tombstones == a fresh index over the
    // survivors (same centroids — the seed set is all low-hash)
    val p2 = tmp("delsurv")
    Similarity.buildIvfIndexOf(spark,
      embL.where(h < lit(Similarity.InsertHashThreshold)), p2, nLists = 16, rounds = 0)
    assert(served.nonEmpty && served === rows4(Similarity.annIvfServe(spark, sfDir, p2)))
    val deleted = embL.where(h >= lit(Similarity.InsertHashThreshold))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty && served.forall { case (_, nId, _, _) => !deleted(nId) },
      "a tombstoned id must never surface as a neighbor")
    // law 2: re-deleting / deleting a never-resident id is harmless
    Similarity.ivfDelete(spark, p,
      spark.range(999999L, 1000002L).select(col("id").as("vec_id")))
    assert(rows4(Similarity.annIvfServe(spark, sfDir, p)) === served)
    // law 3: compaction applies tombstones physically and clears them
    Similarity.ivfCompact(spark, p)
    val tombP = new org.apache.hadoop.fs.Path(p + "/tombstones")
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(tombP), "compaction must clear the tombstone artifact")
    val nAssign = spark.read.parquet(p + "/assign").count()
    val nSurvivors = embL.where(h < lit(Similarity.InsertHashThreshold)).count()
    assert(nAssign === nSurvivors, "compaction must drop tombstoned membership rows")
    assert(rows4(Similarity.annIvfServe(spark, sfDir, p)) === served)
  }

  test("insert into a balanced index assigns by the STORED penalized rule") {
    import org.apache.spark.sql.functions.col
    val p = tmp("balins")
    Similarity.buildBalancedIvfIndex(spark, sfDir, p)
    val cents = Similarity.loadIvfCentroids(spark, p)
    val pen = Similarity.loadIvfPenalties(spark, p)
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // "late arrivals": existing vectors under fresh ids, so the expected
    // assignment is computable from the stored artifacts alone
    val nw = embL.where(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("e"))
    Similarity.ivfInsert(spark, p, nw)
    val got = spark.read.parquet(p + "/assign").where(col("vec_id") >= 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = nw.select(col("vec_id"),
        Similarity.listIdColPenalized(cents, pen)(col("e")).as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === want.size && got === want,
      "balanced inserts must follow the penalty map the artifact ships")
  }

  test("list-stats audit: histogram covers the whole corpus and shares sum to ~1000") {
    val rows = Similarity.ivfListStatsQuery(spark, sfDir).collect()
    assert(rows.length === 16)
    val corpus = graft.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === corpus,
      "every corpus vector must appear in exactly one list")
    val shareSum = rows.map(_.getLong(2)).sum
    // per-list truncating div loses at most 1 per-mille per list
    assert(shareSum <= 1000 && shareSum >= 1000 - rows.length)
  }

  // -- projected-IVF artifact (VERDICT r14 #3: the proj rung's face) --

  test("proj index: sign matrix round-trips; served == inline; corpus projection absent from the serving plan") {
    val p = tmp("proj")
    Similarity.buildProjIndex(spark, sfDir, p)
    // the persisted transform IS the generated ±1 JL matrix, row-exact
    assert(Similarity.loadProjSigns(spark, p).map(_.toVector).toVector ===
      Similarity.rpSignMatrix(64, 16).map(_.toVector).toVector)
    val served = rows4(Similarity.annIvfProjServe(spark, sfDir, p))
    val inline = rows4(Similarity.annIvfProjected(spark, sfDir))
    assert(served.nonEmpty && served === inline,
      "serving from the proj artifacts must reproduce the inline-trained rung")
    val plan = Similarity.annIvfProjServe(spark, sfDir, p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("assign"), "serve must scan the persisted membership")
    assert(!plan.contains("array_max"),
      "served plan must be free of the corpus assignment expression")
  }

  // -- lifecycle guards (r14 ADVICE) --

  test("ivfInsert accepts coded (SQ8/PQ/OPQ) indexes — arrivals encode against the " +
      "frozen model and surface in coded serving; proj stays refused (r17 #1)") {
    import org.apache.spark.sql.functions.{col, lit}
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // the arrival is a CLONE of corpus vector 0 under a fresh id: its
    // insert-time encode against the frozen model must equal the donor's
    // build-time encode, so its reconstruction ties the donor's own and
    // it must surface as a served neighbor of the donor (the r14 hazard —
    // membership-only insert leaving arrivals code-less and invisible —
    // is exactly what this asserts cannot happen anymore)
    val donor = embL.where(col("vec_id") === 0L)
    val arrival = donor.select(lit(777777L).as("vec_id"), col("e"))
    val faces: Seq[(String, String => Unit)] = Seq(
      "sq8" -> (p => Similarity.buildSq8IndexOf(spark, embL, p, nLists = 16)),
      "pq" -> (p => Similarity.buildPqIndexOf(spark, embL, p, nLists = 16)),
      "opq" -> (p => Similarity.buildOpqIndexOf(spark, embL, p, nLists = 16)))
    faces.foreach { case (name, build) =>
      val p = tmp(s"codedins_$name")
      build(p)
      Similarity.ivfInsert(spark, p, arrival)
      def servedIds(): Set[Long] = Similarity.annIvfCodedServeOf(spark, p, donor, k = 5)
        .select("n_id").collect().map(_.getLong(0)).toSet
      assert(servedIds().contains(777777L),
        s"$name: the coded-inserted twin must surface in coded serving")
      // compaction rewrites codes + membership (tombstone-free here) and
      // must leave serving untouched
      val before = rows4(Similarity.annIvfCodedServeOf(spark, p, donor, k = 5))
      Similarity.ivfCompact(spark, p)
      assert(rows4(Similarity.annIvfCodedServeOf(spark, p, donor, k = 5)) === before,
        s"$name: compaction must be invisible to coded serving")
    }
    // the PCA-OPQ face with a LIVE Householder artifact: the real corpus
    // never engages the rotation (gates refuse), so build over the
    // oblique plant (two strong off-axis directions, flat per-dim
    // variance — the SimilaritySpec r17 #5 fixture) where the stored
    // model is hw + perm, and the insert path must rotate-then-permute
    // arrivals by the STORED chain before encoding
    locally {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val oblique = (0L until 400L).map { i =>
        val g = rnd.nextDouble() * 2 - 1; val h = rnd.nextDouble() * 2 - 1
        (i, Array.tabulate(64) { j =>
          g / 8.0 + (if (j % 2 == 0) 0.7 else -0.7) * h / 8.0 +
            (rnd.nextDouble() * 2 - 1) * 0.05
        }.toSeq)
      }.toDF("vec_id", "e")
      val p = tmp("codedins_opqpca")
      Similarity.buildOpqPcaIndexOf(spark, oblique, p, nLists = 16)
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(new org.apache.hadoop.fs.Path(p + "/hw")),
        "the oblique plant must engage the Householder stage")
      val donor = oblique.where(org.apache.spark.sql.functions.col("vec_id") === 0L)
      val arrival = donor.select(
        org.apache.spark.sql.functions.lit(777777L).as("vec_id"),
        org.apache.spark.sql.functions.col("e"))
      Similarity.ivfInsert(spark, p, arrival)
      // the FAISS add contract, asserted directly: the twin's insert-time
      // encode through the STORED hw→perm chain must equal the donor's
      // build-time encode — identical code word in every subspace and the
      // identical list assignment. (Top-5 membership — the proxy the real-
      // corpus faces use above — does not transfer here: the plant's 2-D
      // signal quantizes so coarsely that many vectors share a recon and
      // the donor's own recon ranks ~29th for its exact query.)
      def rowOf(id: Long, art: String) = spark.read.parquet(s"$p/$art")
        .where(org.apache.spark.sql.functions.col("vec_id") === id)
        .collect().map(_.toSeq.tail).toSeq
      assert(rowOf(777777L, "codes") == rowOf(0L, "codes"),
        "opq_pca: insert-time encode must equal the donor's build-time codes")
      assert(rowOf(777777L, "assign") == rowOf(0L, "assign"),
        "opq_pca: the twin must assign to the donor's list by the stored rule")
      // and the twin is genuinely SERVABLE (the r14 hazard was arrivals
      // silently vanishing from coded serving)
      val full = Similarity.annIvfCodedServeOf(spark, p, donor, k = 400)
        .select("n_id").collect().map(_.getLong(0)).toSet
      assert(full.contains(777777L), "opq_pca: the twin must be a serving candidate")
      val before = rows4(Similarity.annIvfCodedServeOf(spark, p, donor, k = 5))
      Similarity.ivfCompact(spark, p)
      assert(rows4(Similarity.annIvfCodedServeOf(spark, p, donor, k = 5)) === before,
        "opq_pca: compaction must be invisible to coded serving")
    }
    // the projected family's centroids live in projected space — a raw
    // full-dim insert would silently mis-assign, so it is refused still
    val pp = tmp("projins")
    Similarity.buildProjIndex(spark, sfDir, pp)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.ivfInsert(spark, pp, embL.limit(1))
    }
    assert(e3.getMessage.contains("proj"), s"proj index must be refused: ${e3.getMessage}")
  }

  test("ivfCompact fails fast on a stale assign_old from an interrupted compaction") {
    import org.apache.spark.sql.functions.{col, lit}
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val p = tmp("stale")
    Similarity.buildIvfIndexOf(spark, embL, p, nLists = 16, rounds = 0)
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "/assign_old"))
    intercept[IllegalArgumentException] { Similarity.ivfCompact(spark, p) }
    // the live membership was never touched by the refused compaction
    assert(spark.read.parquet(p + "/assign").count() ===
      graft.Tables.embeddings(spark, sfDir).count())
    fs.delete(new org.apache.hadoop.fs.Path(p + "/assign_old"), true)
    Similarity.ivfCompact(spark, p) // clean state compacts fine
    assert(rows4(Similarity.annIvfServe(spark, sfDir, p)).nonEmpty)
  }

  test("ivfCompactIfNeeded: no-op under the file threshold, compacts above it, serving invariant") {
    import org.apache.spark.sql.functions.col
    val embL = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val p = tmp("trigger")
    Similarity.buildIvfIndexOf(spark, embL, p, nLists = 16, rounds = 0)
    val before = rows4(Similarity.annIvfServe(spark, sfDir, p))
    val f0 = Similarity.ivfAssignFileCount(spark, p)
    assert(f0 > 0)
    // under threshold: untouched
    assert(!Similarity.ivfCompactIfNeeded(spark, p, maxFiles = f0 + 10))
    assert(Similarity.ivfAssignFileCount(spark, p) === f0)
    // push the file count over with one-file insert batches of fresh ids
    (0 until 4).foreach { b =>
      Similarity.ivfInsert(spark, p,
        embL.where(col("vec_id") < 10)
          .select((col("vec_id") + 5000000L + b * 100L).as("vec_id"), col("e"))
          .coalesce(1))
    }
    assert(Similarity.ivfAssignFileCount(spark, p) >= f0 + 4)
    assert(Similarity.ivfCompactIfNeeded(spark, p, maxFiles = f0 + 3, nFiles = 2))
    assert(Similarity.ivfAssignFileCount(spark, p) <= 2)
    // original members' serving is untouched by the trigger's compaction
    assert(rows4(Similarity.annIvfServe(spark, sfDir, p)) === before)
  }

  // -- deep-BPE model --

  test("BPE merge-table artifact round-trips and serves bit-identically") {
    val docs = graft.Tables.documents(spark, sfDir)
    val p = tmp("bpe")
    Bpe.saveDeepModel(docs, p)
    val loaded = Bpe.loadDeepMerges(spark, p)
    val trained = Bpe.deepMerges(docs).map { case (l, r, _) => (l, r) }
    assert(loaded === trained, "merge sequence must round-trip in rank order")
    val served = Bpe.tokenizeServe(spark, docs, p).collect().map(_.toSeq).toSet
    val inline = Bpe.tokenizeDeep(docs).drop("__ignore").collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served === inline)
  }

  // -- serving compositions over the persisted rounds-0 IVF index --

  test("served vector arm (annIvfServed) == inline annIvfCosine, and its plan reads the artifact") {
    val served = rows4(Similarity.annIvfServed(spark, sfDir))
    val inline = rows4(Similarity.annIvfCosine(spark, sfDir))
    assert(served.nonEmpty && served === inline,
      "rounds-0 artifact centroids must equal the inline hash seeds")
    val plan = Similarity.annIvfServed(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("assign") && !plan.contains("array_max"))
  }

  test("hybrid RRF composed over the artifact == inline-trained hybrid, row for row") {
    val docs = graft.Tables.documents(spark, sfDir)
    val served = Hybrid.hybridRrfQuery(spark, sfDir).collect().map(_.toSeq).toSet
    val inline = Hybrid.hybridRrf(docs,
        Similarity.annIvfCosine(spark, sfDir, nQueries = 10, k = 20))
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served === inline)
  }

  test("MMR composed over the artifact == inline-trained MMR, row for row") {
    val served = Similarity.mmrRerank(spark, sfDir, served = true)
      .collect().map(_.toSeq).toSet
    val inline = Similarity.mmrRerank(spark, sfDir, served = false)
      .collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served === inline)
  }

  test("negative mining composed over the artifact == inline-trained, row for row") {
    val served = Similarity.contrastiveTriplets(spark, sfDir, served = true)
      .collect().map(_.toSeq).toSet
    val inline = Similarity.contrastiveTriplets(spark, sfDir, served = false)
      .collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served === inline)
  }
}
