package graft.operators

import graft.SparkSpec

class SeqWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def series(n: Int) =
    (1 to n).map(i => ("T", i.toLong, i.toDouble)).toDF("ticker", "ts", "v")

  test("WIN-1 golden law: n rows emit max(0, n - seqLen - horizon + 1) samples") {
    for (n <- Seq(0, 5, 14, 15, 20, 40)) {
      val got = SeqWindows.slidingSamples(series(n), Seq("ticker"), Seq("ts"), "v").count()
      assert(got == math.max(0, n - 10 - 5 + 1), s"n=$n")
    }
  }

  test("WIN-1 windows are strictly consecutive and labels follow features") {
    val rows = SeqWindows.slidingSamples(series(20), Seq("ticker"), Seq("ts"), "v")
      .orderBy("ts").select("features", "labels").as[(Seq[Double], Seq[Double])].collect()
    assert(rows.length == 6)
    rows.zipWithIndex.foreach { case ((f, l), i) =>
      assert(f == (i + 1 to i + 10).map(_.toDouble)) // features = v[i..i+10)
      assert(l == (i + 11 to i + 15).map(_.toDouble)) // labels = v[i+10..i+15)
    }
  }

  test("WIN-2 latest window: last seqLen values, oldest first") {
    val w = SeqWindows.latestWindow(series(25), Seq("ticker"), Seq("ts"), "v")
      .select("window").as[Seq[Double]].head()
    assert(w == (16 to 25).map(_.toDouble))
    // short series: returns all rows (fewer than seqLen)
    val short = SeqWindows.latestWindow(series(3), Seq("ticker"), Seq("ts"), "v")
      .select("window").as[Seq[Double]].head()
    assert(short == Seq(1.0, 2.0, 3.0))
  }

  test("WIN-2 flat form tags positions 1..seqLen oldest-to-newest") {
    val rows = SeqWindows.latestRows(series(12), Seq("ticker"), Seq("ts"))
      .orderBy("pos").select("pos", "v").as[(Long, Double)].collect()
    assert(rows.toSeq == (1 to 10).map(p => (p.toLong, (p + 2).toDouble)))
  }
}
