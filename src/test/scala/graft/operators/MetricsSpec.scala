package graft.operators

import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("AGG-1/2: null pairs dropped; RMSE matches closed form; zero iff equal") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (Some(3.0), Some(1.0)), (None, Some(9.0)),
      (Some(4.0), None)).toDF("a", "f")
    val got = Metrics.rmse(df, "a", "f").as[Double].head()
    assert(math.abs(got - math.sqrt((1.0 + 4.0) / 2)) < 1e-12)
    val eq = Seq((1.0, 1.0), (2.5, 2.5)).toDF("a", "f")
    assert(Metrics.rmse(eq, "a", "f").as[Double].head() == 0.0)
  }

  test("RMSE is non-negative over random inputs (seeded)") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(_ => (rnd.nextGaussian(), rnd.nextGaussian())).toDF("a", "f")
    assert(Metrics.rmse(df, "a", "f").as[Double].head() >= 0.0)
  }

  test("keyed RMSE groups independently") {
    val df = Seq(("x", 1.0, 2.0), ("x", 2.0, 3.0), ("y", 5.0, 5.0))
      .toDF("k", "a", "f")
    val got = Metrics.rmse(df, "a", "f", Seq("k")).orderBy("k")
      .as[(String, Double)].collect().toMap
    assert(got("x") == 1.0 && got("y") == 0.0)
  }
}
