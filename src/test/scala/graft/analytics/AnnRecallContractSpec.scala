package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** The ANN ladder's recall floors as ONE central contract (VERDICT r10
  * #7): each rung's recall@5 vs the exact baseline existed only as a
  * one-off assertion inside its own spec, so an index regression (a bad
  * centroid change, a broken quantizer) could slip past whichever spec
  * didn't exercise the changed path. This spec runs every SERVING-SHAPE
  * rung exactly as registered in `SparkEntry.queries` — the same call the
  * driver verifies and benches — against the one exact ground truth, and
  * fails loudly if any floor is crossed.
  *
  * Floors are the measured-on-this-corpus values minus safety margin
  * (same numbers the per-rung specs assert); they encode the ACCURACY
  * half of each rung's cost/accuracy position on the ladder — PQ (64×
  * compression) is allowed the lowest floor, the quadratic SQ8 accuracy
  * baseline the highest. Raising a rung's recall later should raise its
  * floor here in the same commit. */
class AnnRecallContractSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet

  test("every unfiltered rung clears its recall@5 floor vs knn_exact") {
    val floors = Seq(
      "knn_quantized"        -> 0.8, // SQ8 accuracy baseline (quadratic scan, compression loss only)
      "knn_ann_lsh"          -> 0.5, // banded hyperplane buckets
      "knn_ann_ivf"          -> 0.3, // IVF-Flat, hash-seeded centroids, nProbe=4
      "knn_ann_ivf_refined"  -> 0.3, // + Lloyd rounds (balance, not recall, is its win)
      "knn_ann_ivf_balanced" -> 0.4, // size-penalized Lloyd at the serving asymmetry
      "knn_ann_ivf_sq8"      -> 0.3, // IVF probing over SQ8 residents
      "knn_ann_ivf_pq"       -> 0.1, // IVF + PQ/ADC at 32x compression
      "knn_ann_ivf_proj"     -> 0.4) // coarse stage in 16-dim JL space, exact re-rank (measured 0.58 — matches plain IVF at 4x cheaper assignment)
    val exact = pairs("knn_exact")
    assert(exact.nonEmpty)
    val measured = floors.map { case (name, floor) =>
      val r = (exact intersect pairs(name)).size.toDouble / exact.size
      (name, floor, r)
    }
    measured.foreach { case (name, floor, r) => info(f"$name%-22s recall@5 $r%.3f (floor $floor%.2f)") }
    val broken = measured.filter { case (_, floor, r) => r < floor }
    assert(broken.isEmpty,
      broken.map { case (n, f, r) => f"$n recall $r%.3f < floor $f%.2f" }.mkString("; "))
  }

  test("the filtered rungs clear their floor vs the label-constrained exact top-k") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .as[(Long, Int, Seq[Double])].collect()
    val vecs = rows.map(r => r._1 -> r._3.toArray).toMap
    val labels = rows.map(r => r._1 -> r._2).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (0L until 10L).flatMap { q =>
      vecs.keys.filter(n => n != q && labels(n) == labels(q)).toSeq
        .map(n => (n, r4(cos(vecs(q), vecs(n)))))
        .sortBy { case (n, c) => (-c, n) }.take(5).map(t => (q, t._1))
    }.toSet
    Seq("knn_ann_filtered" -> 0.5, "knn_ann_prefiltered" -> 0.5).foreach { case (name, floor) =>
      val r = (brute intersect pairs(name)).size.toDouble / brute.size
      info(f"$name%-22s filtered recall@5 $r%.3f (floor $floor%.2f)")
      assert(r >= floor, f"$name filtered recall $r%.3f < floor $floor%.2f")
    }
  }
}
