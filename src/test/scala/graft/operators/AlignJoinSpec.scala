package graft.operators

import graft.SparkSpec

class AlignJoinSpec extends SparkSpec {
  import spark.implicits._

  test("JN-1 rank join: k-th left pairs with k-th right; unmatched tail keeps NULLs") {
    // 5 forecasts (bootstrap burst) vs 3 actuals — the reference shapes
    val forecasts = Seq(("T", 1L, 10.0), ("T", 2L, 11.0), ("T", 3L, 12.0),
      ("T", 4L, 13.0), ("T", 5L, 14.0)).toDF("ticker", "f_ts", "f")
    val actuals = Seq(("T", 10L, 10.5), ("T", 20L, 11.5), ("T", 30L, 12.5))
      .toDF("ticker", "a_ts", "a")
    val got = AlignJoin.rankJoin(forecasts, actuals, Seq("ticker"),
        Seq("f_ts"), Seq("a_ts"))
      .orderBy("f_ts").select("f", "a").as[(Double, Option[Double])].collect()
    assert(got.toSeq == Seq((10.0, Some(10.5)), (11.0, Some(11.5)),
      (12.0, Some(12.5)), (13.0, None), (14.0, None)))
  }

  test("JN-1 preserves both sides' orders (matched pairs are monotone)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 50).map(i => ("K", i.toLong, rnd.nextDouble())).toDF("k", "lts", "lv")
    val right = (1 to 30).map(i => ("K", i.toLong * 3, rnd.nextDouble())).toDF("k", "rts", "rv")
    val got = AlignJoin.rankJoin(left, right, Seq("k"), Seq("lts"), Seq("rts"))
      .where($"rts".isNotNull).orderBy("lts")
      .select("lts", "rts").as[(Long, Long)].collect()
    assert(got.length == 30)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
  }

  test("as-of join: latest right at or before left time; equal-ts ties resolve to max tiebreak") {
    val purchases = Seq(("U", 10L, 1L, 100.0), ("U", 20L, 2L, 200.0), ("U", 5L, 3L, 50.0))
      .toDF("user", "t", "id", "amount")
    // two views at t=10 (ids 7 and 8) — tiebreak must pick id 8
    val views = Seq(("U", 10L, 7L, 1.0), ("U", 10L, 8L, 2.0), ("U", 15L, 9L, 3.0))
      .toDF("user", "vt", "vid", "vv")
    val got = AlignJoin.asOfJoin(purchases, views, Seq("user"), "t", "vt",
        Seq("vv"), rightTiebreak = Seq("vid"))
      .orderBy("t").select("t", "asof_vv").as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq((5L, None), (10L, Some(2.0)), (20L, Some(3.0))))
  }

  test("as-of join tolerance: stale matches null out, in-window matches survive") {
    val purchases = Seq(("U", 10L, 1L, 100.0), ("U", 30L, 2L, 200.0))
      .toDF("user", "t", "id", "amount")
    val views = Seq(("U", 8L, 7L, 1.0)).toDF("user", "vt", "vid", "vv")
    def run(tol: Long) = AlignJoin.asOfJoin(purchases, views, Seq("user"), "t", "vt",
        Seq("vv"), rightTiebreak = Seq("vid"), tolerance = Some(tol))
      .orderBy("t").select("t", "asof_vv").as[(Long, Option[Double])].collect().toSeq
    // tol=5: view@8 is within 5 of t=10 but 22 stale for t=30
    assert(run(5L) == Seq((10L, Some(1.0)), (30L, None)))
    // tol=25: both inside the window
    assert(run(25L) == Seq((10L, Some(1.0)), (30L, Some(1.0))))
  }
}
