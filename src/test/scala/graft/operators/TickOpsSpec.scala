package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.ScalerParams

class TickOpsSpec extends SparkSpec {
  import spark.implicits._

  private val ticks = Seq(
    // (ticker, ts, price): consecutive repeats at ts 2,3 and 6
    ("A", 1L, 100.0), ("A", 2L, 100.0), ("A", 3L, 100.0), ("A", 4L, 101.0),
    ("A", 5L, 100.0), ("A", 6L, 100.0), ("A", 7L, 102.0),
    ("B", 1L, 50.0), ("B", 2L, 55.0), ("B", 3L, 55.0)
  ).toDF("ticker", "ts", "price")

  test("TR-1 keeps first row and drops only consecutive-equal values, per key") {
    val got = TickOps.changeFilter(ticks, Seq("ticker"), Seq("ts"), "price")
      .orderBy("ticker", "ts").select("ticker", "ts").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("A", 1L), ("A", 4L), ("A", 5L), ("A", 7L),
      ("B", 1L), ("B", 2L)))
  }

  test("TR-2 anchored return: first row 0, later rows price/first - 1") {
    val got = TickOps.anchoredReturn(ticks, Seq("ticker"), Seq("ts"), "price")
      .orderBy("ticker", "ts").select("ticker", "variation").as[(String, Double)].collect()
    val a = got.filter(_._1 == "A").map(_._2)
    assert(a(0) == 0.0 && math.abs(a(3) - 0.01) < 1e-12) // 101/100 - 1
    val b = got.filter(_._1 == "B").map(_._2)
    assert(b(0) == 0.0 && math.abs(b(1) - 0.1) < 1e-12) // 55/50 - 1
  }

  test("NRM-1 min-max scale: [0,1] range; constant series degenerates to 0.0") {
    val scaled = TickOps.minMaxScale(ticks, "price").select("scaled").as[Double].collect()
    assert(math.abs(scaled.min) < 1e-15 && math.abs(scaled.max - 1.0) < 1e-15)
    val const = Seq(("A", 1L, 7.0), ("A", 2L, 7.0)).toDF("ticker", "ts", "price")
    val cs = TickOps.minMaxScale(const, "price").select("scaled").as[Double].collect()
    assert(cs.forall(_ == 0.0)) // ticks_const fixture edge case
  }

  test("NRM-2/3 ScalerParams and TickOps.minMaxInvert agree, incl. degenerate") {
    val p = ScalerParams(10.0, 30.0)
    assert(p.scale(20.0) == 0.5 && p.invert(p.scale(17.0)) == 17.0)
    val inv = Seq(0.35).toDF("y")
      .select(TickOps.minMaxInvert(col("y"), 10.0, 30.0)).as[Double].head()
    assert(inv == p.invert(0.35))
    // degenerate min==max: scale -> 0.0, invert -> constant min, both impls
    val d = ScalerParams(5.0, 5.0)
    assert(d.scale(99.0) == 0.0 && d.invert(0.7) == 5.0)
    val dinv = Seq(0.7).toDF("y")
      .select(TickOps.minMaxInvert(col("y"), 5.0, 5.0)).as[Double].head()
    assert(dinv == 5.0)
  }

  test("NRM round-trip property over seeded random params/values") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val mn = rnd.nextDouble() * 100 - 50
      val mx = mn + rnd.nextDouble() * 100
      val x = mn + rnd.nextDouble() * (mx - mn)
      val p = ScalerParams(mn, mx)
      if (mx > mn) assert(math.abs(p.invert(p.scale(x)) - x) < 1e-9)
      assert(p.scale(x) >= -1e-12 && p.scale(x) <= 1 + 1e-12)
    }
  }
}
