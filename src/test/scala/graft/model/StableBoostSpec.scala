package graft.model

import graft.SparkSpec

/** The nonlinear ML-1 rung: bit-stable boosted stumps ([[StableBoost]]).
  * Inputs are SCALED series (features/labels in [0,1]) — the regime the
  * `ml1_boost_forecast` query feeds after global min-max scaling. */
class StableBoostSpec extends SparkSpec {
  import spark.implicits._

  private def rndSamples(n: Int, seed: Int): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (Array.fill(10)(rnd.nextDouble()), Array.fill(5)(rnd.nextDouble())))
  }

  test("distributed fit is bit-identical to the local replay under any partitioning") {
    val samples = rndSamples(500, seed = 7)
    val local = StableBoost.fitLocal(samples, 10, 5, rounds = 4)
    for (parts <- Seq(1, 7)) {
      val df = samples.toDF("features", "labels").repartition(parts)
      val dist = StableBoost.fit(df, 10, 5, rounds = 4)
      assert(dist.base.toSeq == local.base.toSeq, s"base drift at $parts partitions")
      assert(dist.stumps.map(_.toSeq).toSeq == local.stumps.map(_.toSeq).toSeq,
        s"stump drift at $parts partitions")
    }
  }

  test("stumps bend where ridge cannot: V-shaped response on the last lag") {
    // label = |x10 - 0.5| + small linear term: the best LINEAR fit of a
    // symmetric V is ~constant (zero slope), so ridge is stuck at the
    // response's variance; two stumps already carve the V into steps
    val rnd = new scala.util.Random(11)
    val samples = (0 until 2000).map { _ =>
      val f = Array.fill(10)(rnd.nextDouble())
      val y = math.abs(f(9) - 0.5)
      (f, Array.fill(5)(y))
    }
    def sse(predict: Array[Double] => Array[Double]): Double =
      samples.map { case (f, y) => val p = predict(f); math.pow(p(0) - y(0), 2) }.sum
    val boost = StableBoost.fitLocal(samples, 10, 5, rounds = 6)
    val ridge = new RidgeForecaster(10, 5).fitLocal(samples)
    val sseB = sse(boost.predict)
    val sseR = sse(ridge.predict)
    assert(sseB < 0.7 * sseR,
      f"boost did not beat ridge on the V: boost $sseB%.3f vs ridge $sseR%.3f")
    // and boosting actually helped over the constant base score
    val base = StableBoost.fitLocal(samples, 10, 5, rounds = 0)
    assert(sseB < 0.5 * sse(base.predict), "rounds did not reduce training SSE")
  }

  test("predict contract: horizon length, finite, grid-exact on constant input") {
    val samples = rndSamples(200, seed = 3)
    val m = StableBoost.fitLocal(samples, 10, 5, rounds = 4)
    val pred = m.predict(Array.fill(10)(0.37))
    assert(pred.length == 5)
    pred.foreach(p => assert(!p.isNaN && !p.isInfinite && p > -1.0 && p < 2.0))
    // constant corpus: every split side is empty or whole -> no-op stumps,
    // prediction is exactly the base score
    val const = (0 until 50).map(_ => (Array.fill(10)(0.4), Array.fill(5)(0.4)))
    val cm = StableBoost.fitLocal(const, 10, 5, rounds = 4)
    val q = StableRidge.quantizeLong(0.4)
    assert(cm.base.forall(_ == q))
    // leaves may be nonzero only if both sides were non-empty; with a
    // constant feature every candidate has an empty side -> all no-ops
    assert(cm.stumps.flatten.forall(s => s.leafL == 0L && s.leafR == 0L))
    cm.predict(Array.fill(10)(0.4)).foreach { p =>
      assert(p == q.toDouble / StableRidge.Q)
    }
  }

  test("empty input yields the zero model") {
    val zero = StableBoost.fitLocal(Nil, 10, 5, rounds = 4)
    assert(zero.predict(Array.fill(10)(0.5)).forall(_ == 0.0))
    val df = spark.emptyDataset[(Array[Double], Array[Double])]
      .toDF("features", "labels")
    val zd = StableBoost.fit(df, 10, 5, rounds = 4)
    assert(zd.predict(Array.fill(10)(0.5)).forall(_ == 0.0))
  }
}
