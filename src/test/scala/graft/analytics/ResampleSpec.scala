package graft.analytics

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("q_evt_slide: every event lands in exactly length/slide windows") {
    val ev = graft.Tables.events(spark, sfDir)
    val total = ev.count()
    val windows = SeriesQueries.slidingRollup(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(windows == 3 * total,
      s"3h/1h sliding windows must count each event exactly 3 times " +
        s"($windows != 3 * $total)")
  }

  test("ts_outliers: flags exactly the >3-MAD deviations, exact-integer rule") {
    val got = SeriesQueries.tsOutliers(spark, sfDir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // independent recomputation in plain Scala over exact cents
    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value").as[(Long, Long, Double)].collect()
    val byUser = ev.groupBy(_._1)
    val want = byUser.toSeq.flatMap { case (u, rows) =>
      val cents = rows.map(r => (r._2, math.round(r._3 * 100)))
      val n = cents.length.toLong
      val s = cents.map(_._2).sum
      val devs = cents.map { case (id, c) => (id, math.abs(c * n - s)) }
      val devSum = devs.map(_._2).sum
      devs.filter { case (_, d) => d * n > 3 * devSum }.map { case (id, _) => (u, id) }
    }.toSet
    assert(got == want, s"flag sets differ: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "fixture should contain at least one outlier")
  }

  test("rsmp_ffill: aligned grid, correct carry, nulls only before first obs") {
    val step = 3600L * 1000 * 1000
    val got = SeriesQueries.resampleFfill(spark, sfDir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.nonEmpty)
    // the grid is step-aligned and dense per key
    assert(got.forall(_._2 % step == 0), "grid instants must be step-aligned")
    got.groupBy(_._1).foreach { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      assert(ts.zip(ts.tail).forall { case (a, b) => b - a == step },
        s"user $u: grid must be dense (one point per step)")
    }
    // independent recomputation: latest observation at-or-before each
    // grid instant, ties at one ts broken to the max event_id
    val obs = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._2, r._3))).toMap
    got.foreach { case (u, gts, v) =>
      val want = obs(u).filter(_._2 <= gts).lastOption.map(_._4)
      assert(v == want, s"user $u at $gts: got $v want $want")
    }
    // per key: exactly the pre-first-observation grid points are null
    got.groupBy(_._1).foreach { case (u, rows) =>
      val firstObs = obs(u).head._2
      rows.foreach { case (_, gts, v) =>
        assert(v.isEmpty == (gts < firstObs),
          s"user $u at $gts: null iff before first observation ($firstObs)")
      }
    }
  }
}
