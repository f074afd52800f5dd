package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.ForecastQueries

/** [[StableRidge]] laws: exact integer Gram sums make the fit a function
  * of the sample SET (partitioning-invariant, bit-for-bit), the canonical
  * solve agrees with the plain ridge on well-conditioned data, and the
  * per-key batch query reproduces an independent local per-key fit. */
class StableRidgeSpec extends SparkSpec {
  import spark.implicits._

  private val seqLen = 10
  private val horizon = 5

  /** Seeded scaled-sample fixture: windows of a noiseless linear series so
    * the true mapping is recoverable. */
  private def samples(n: Int): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { _ =>
      val f = Array.fill(seqLen)(rnd.nextDouble())
      val l = Array.tabulate(horizon)(h => 0.1 + 0.3 * f(seqLen - 1) + 0.05 * h * f(0))
      (f, l)
    }
  }

  test("gram sums are exact integers, invariant under repartitioning; weights bit-identical") {
    val data = samples(400)
    def sumsFor(parts: Int): IndexedSeq[BigInt] =
      StableRidge.gramSums(data.toDF("features", "labels").repartition(parts),
        seqLen, horizon)
    val s1 = sumsFor(1)
    val s13 = sumsFor(13)
    assert(s1 == s13, "exact integer sums must not depend on partitioning")
    val w1 = StableRidge.solve(s1, seqLen, horizon)
    val w13 = StableRidge.solve(s13, seqLen, horizon)
    assert(w1.flatten.toSeq == w13.flatten.toSeq, "weights must be bit-identical")
  }

  test("canonical solve agrees with the plain ridge fit on well-conditioned data") {
    val data = samples(500)
    val sums = StableRidge.gramSums(data.toDF("features", "labels"), seqLen, horizon)
    val stable = StableRidge.solve(sums, seqLen, horizon)
    val plain = new RidgeForecaster(seqLen, horizon).fitLocal(data)
      .asInstanceOf[LinearModel].weights
    val window = Array.fill(seqLen)(0.5)
    val u = window.map(StableRidge.quantize)
    (0 until horizon).foreach { h =>
      val ps = StableRidge.predictScaled(stable(h), u)
      val pp = plain(h).head + (0 until seqLen).map(i => plain(h)(i + 1) * window(i)).sum
      assert(math.abs(ps - pp) < 1e-3,
        s"step $h: stable $ps vs plain $pp — quantization+ridge drift too large")
    }
  }

  test("fitLocalExact (per-key path) equals gramAggs+solve (distributed path) on one key") {
    // one key's series: both paths see the same window set and the same
    // exact integer sums, so the weights must agree EXACTLY
    val rnd = new scala.util.Random(21)
    val series = Array.fill(80)(rnd.nextDouble())
    val wins = (0 to series.length - seqLen - horizon).map { i =>
      (series.slice(i, i + seqLen), series.slice(i + seqLen, i + seqLen + horizon))
    }
    val sums = StableRidge.gramSums(
      wins.toDF("features", "labels").repartition(5), seqLen, horizon)
    val distributed = StableRidge.solve(sums, seqLen, horizon)
    val local = StableRidge.fitLocalExact(series.map(StableRidge.quantizeLong), seqLen, horizon)
    assert(distributed.flatten.toSeq == local.flatten.toSeq,
      "local and distributed exact fits must be bit-identical")
  }

  test("per-key query reproduces an independent local per-key fit (reference per-ticker law)") {
    val out = ForecastQueries.ridgeForecastPerKey(spark, sfDir).collect()
    assert(out.nonEmpty, "sf0.001 must yield at least one fittable user")
    val byUser = out.map(r => r.getLong(0) -> (1 to horizon).map(h => r.getDouble(h))).toMap
    val uid = byUser.keys.min
    val vals = graft.Tables.events(spark, sfDir)
      .where(col("user_id") === uid)
      .select("ts_us", "event_id", "value")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).map(_._3)
    val mn = vals.min; val mx = vals.max
    val scaled = vals.map(v => if (mx > mn) (v - mn) / (mx - mn) else 0.0)
    val w = StableRidge.fitLocalExact(scaled.map(StableRidge.quantizeLong), seqLen, horizon)
    val u = scaled.takeRight(seqLen).map(StableRidge.quantize)
    val expected = (0 until horizon).map { h =>
      val s = StableRidge.predictScaled(w(h), u)
      val inv = if (mx > mn) s * (mx - mn) + mn else mn
      new java.math.BigDecimal(inv).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(byUser(uid) == expected,
      s"per-key query for user $uid must equal the local recomputation")
  }
}
