package graft.analytics

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Laws for the size-penalized (balanced) IVF path. */
class BalancedIvfSpec extends SparkSpec {
  import spark.implicits._

  private def embD = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("lambda = 0 degenerates to the plain Lloyd-refined path exactly") {
    val refined = Similarity.annIvfRefined(spark, sfDir)
      .orderBy("q_id", "rank").collect().toSeq
    val balanced0 = Similarity.annIvfBalanced(spark, sfDir, lambdaI = 0L)
      .orderBy("q_id", "rank").collect().toSeq
    assert(balanced0 == refined,
      "penalized argmax with zero penalties must equal the 4-dp cosine argmax")
  }

  test("penalty strictly shrinks the hot list on a skewed corpus") {
    // two ADJACENT angular clusters of unequal mass on the unit circle
    // (150 across [-0.3, 0.3] rad, 90 across [0.35, 1.1] rad), one seed
    // in each: plain Lloyd keeps the 150/90 split (the plain-cosine
    // boundary sits in the gap), while the load penalty must peel the
    // heavy cluster's boundary band over to the light list — the
    // only-boundary-vectors-move regime balanced k-means is for
    val rows =
      (0 until 150).map { i =>
        val th = -0.3 + 0.6 * i / 149.0
        (i.toLong, Seq(math.cos(th), math.sin(th), 1e-6 * i, 0.0))
      } ++ (0 until 90).map { j =>
        val th = 0.35 + 0.75 * j / 89.0
        ((150 + j).toLong, Seq(math.cos(th), math.sin(th), 0.0, 1e-6 * j))
      }
    val emb = rows.toDF("vec_id", "e")
    val cent0 = Array(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(math.cos(0.8), math.sin(0.8), 0.0, 0.0))
    val plain = Similarity.ivfLloydRefine(emb, cent0, rounds = 3)
    val plainSizes = Similarity.listSizes(emb, plain)
    val (bc, pen) = Similarity.ivfLloydRefineBalanced(emb, cent0, rounds = 3, lambdaI = 5000L)
    val balSizes = emb.withColumn("list_id", Similarity.listIdColPenalized(bc, pen)(col("e")))
      .groupBy("list_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    info(s"plain sizes ${plainSizes.values.toSeq.sorted}, balanced ${balSizes.toSeq.sorted}, pen $pen")
    // plain Lloyd stays skewed (≥ the heavy cluster's 150; the mean
    // drift can even grow it — 154 observed); the penalty must shrink
    // the hot list strictly (116/124 observed)
    val plainMax = plainSizes.values.max
    assert(plainMax >= 150L, s"plain Lloyd unexpectedly balanced: $plainSizes")
    assert(balSizes.max < plainMax,
      s"balanced max ${balSizes.max} not below plain Lloyd max $plainMax (pen=$pen)")
  }

  test("registered query: contiguous ranks and recall at the refined path's level") {
    val out = Similarity.annIvfBalancedQuery(spark, sfDir).cache()
    val perQ = out.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("mx")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach(r => assert(r.getLong(1) == r.getLong(2), s"ranks not contiguous: $r"))
    val exact = Similarity.knnExact(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.select(col("q_id"), col("n_id")).collect()
      .count(r => exact((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / exact.size
    info(f"balanced recall@5 vs exact = $recall%.2f")
    // the penalty trades a little recall for bounded probe cost; it must
    // stay in the refined path's neighborhood, not collapse
    assert(recall >= 0.4, f"balanced recall collapsed: $recall%.2f")
    out.unpersist()
  }
}
