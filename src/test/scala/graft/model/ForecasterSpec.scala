package graft.model

import graft.SparkSpec

class ForecasterSpec extends SparkSpec {
  import spark.implicits._

  private def mkSamples(n: Int, gen: Int => Double): Seq[(Array[Double], Array[Double])] = {
    val series = (0 until n).map(gen)
    (0 to n - 15).map { i =>
      (series.slice(i, i + 10).toArray, series.slice(i + 10, i + 15).toArray)
    }
  }

  test("ridge recovers an exact linear recurrence (noiseless AR fit)") {
    // series: v(t) = 0.5 + 0.3*t  => next values are exact affine
    // functions of the window; closed-form ridge must hit them
    val samples = mkSamples(60, t => 0.5 + 0.3 * t)
    val model = new RidgeForecaster(10, 5).fitLocal(samples)
    val window = (50 until 60).map(t => 0.5 + 0.3 * t).toArray
    val pred = model.predict(window)
    val expect = (60 until 65).map(t => 0.5 + 0.3 * t)
    pred.zip(expect).foreach { case (p, e) => assert(math.abs(p - e) < 1e-4) }
  }

  test("distributed fit and local fit agree on the same samples") {
    val rnd = new scala.util.Random(3)
    val samples = mkSamples(80, _ => rnd.nextDouble())
    val local = new RidgeForecaster(10, 5).fitLocal(samples)
      .asInstanceOf[LinearModel]
    val df = samples.toDF("features", "labels")
    val dist = new RidgeForecaster(10, 5).fit(df).asInstanceOf[LinearModel]
    local.weights.flatMap(_.toSeq).zip(dist.weights.flatMap(_.toSeq)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, "fit/fitLocal weight drift")
    }
  }

  test("constant series (singular normal equations) yields a defined, finite model") {
    // the ticks_const edge case: unpenalized intercept + constant windows
    // makes X'X singular; r1 masked the zero pivot, now we re-solve with
    // full-diagonal ridge — predictions must be finite and ~the constant
    val samples = mkSamples(30, _ => 42.0)
    val model = new RidgeForecaster(10, 5).fitLocal(samples)
    val pred = model.predict(Array.fill(10)(42.0))
    assert(pred.length == 5)
    pred.foreach { p => assert(!p.isNaN && !p.isInfinite && math.abs(p - 42.0) < 1.0) }
  }

  test("predict contract: horizon length, finite, within envelope for smooth series") {
    val samples = mkSamples(100, t => 100.0 + 10 * math.sin(t / 7.0))
    val model = new RidgeForecaster(10, 5).fitLocal(samples)
    val window = (90 until 100).map(t => 100.0 + 10 * math.sin(t / 7.0)).toArray
    val pred = model.predict(window)
    assert(pred.length == 5)
    pred.foreach(p => assert(p > 80 && p < 120 && !p.isNaN))
  }

  test("empty input falls back to zero model; persistence model repeats last value") {
    val zero = new RidgeForecaster(10, 5).fitLocal(Nil)
    assert(zero.predict(Array.fill(10)(3.0)).forall(_ == 0.0))
    val p = new PersistenceModel(5)
    assert(p.predict(Array(1.0, 2.0, 7.5)).toSeq == Seq.fill(5)(7.5))
  }
}
