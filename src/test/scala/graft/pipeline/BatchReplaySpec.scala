package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.PersistenceModel

/** SURVEY §7.2 — the batch replay slice on fixture tick tables
  * (FIXTURES.md A: ticks_tiny / ticks_20 / ticks_repeat / ticks_const). */
class BatchReplaySpec extends SparkSpec {
  import spark.implicits._

  private def ticks(prices: Seq[Double]) =
    prices.zipWithIndex.map { case (p, i) =>
      ("T", new Timestamp(1700000000000L + i * 1000L), p)
    }.toDF("ticker", "ts", "price")

  private def walk(n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(99)
    var p = 100.0
    Seq.fill(n) { p += rnd.nextGaussian(); p }
  }

  test("ticks_tiny: below the training threshold the model falls back to persistence") {
    val out = BatchReplay.run(spark, ticks(walk(5)))
    assert(out.model.isInstanceOf[PersistenceModel])
    assert(out.comparison.count() == 0) // no complete window => no samples
  }

  test("ticks_20: comparison has horizon rows per sample and finite forecasts in envelope") {
    val prices = walk(20)
    val out = BatchReplay.run(spark, ticks(prices))
    // 20 rows -> 6 samples (golden law) x 5 steps
    assert(out.comparison.count() == 6 * 5)
    val rows = out.comparison
      .select("step", "forecasted_price", "actual_price").as[(Long, Double, Double)].collect()
    val (mn, mx) = (prices.min, prices.max)
    rows.foreach { case (step, f, a) =>
      assert(step >= 1 && step <= 5)
      assert(!f.isNaN && !f.isInfinite)
      // ridge on scaled data, inverted: stays near the observed envelope
      assert(f > mn - (mx - mn) && f < mx + (mx - mn), s"forecast $f escaped envelope [$mn,$mx]")
      assert(a >= mn - 1e-9 && a <= mx + 1e-9) // actuals are inverted labels
    }
    // T4: cumulative RMSE is non-negative and defined for every matched pair
    val rmse = out.rmseHistory.select("rmse").as[Double].collect()
    assert(rmse.length == 30 && rmse.forall(r => r >= 0 && !r.isNaN))
  }

  test("ticks_repeat: TR-1 removes consecutive duplicates before training") {
    val prices = Seq(100.0, 100.0, 100.0, 101.0, 101.0, 102.0)
    val out = BatchReplay.run(spark, ticks(prices))
    assert(out.ticks.count() == 3) // 100, 101, 102
    val vars = out.ticks.orderBy("ts").select("variation").as[Double].collect()
    assert(vars(0) == 0.0 && math.abs(vars(2) - 0.02) < 1e-12)
  }

  test("ticks_const: min==max scaling degenerates safely; forecasts equal the constant") {
    val out = BatchReplay.run(spark, ticks(Seq.fill(20)(50.0)))
    // TR-1 collapses the constant series to one tick -> persistence path
    assert(out.ticks.count() == 1)
    assert(out.scaler.min == out.scaler.max)
    // no windows -> no comparison rows, and nothing blows up
    assert(out.comparison.count() == 0)
  }

  test("replay is deterministic: same fixture, same outputs") {
    val prices = walk(25)
    val a = BatchReplay.run(spark, ticks(prices)).comparison
      .orderBy("ts", "step").collect().toSeq
    val b = BatchReplay.run(spark, ticks(prices)).comparison
      .orderBy("ts", "step").collect().toSeq
    assert(a == b)
  }
}
