package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 150L), (5L, 250L), (6L, 1000L))
    .toDF("p_id", "ts")
  private val intervals = Seq(
    (10L, 0L, 0L),      // degenerate single-instant interval
    (11L, 50L, 149L),   // spans a bucket boundary (width 100)
    (12L, 100L, 300L),  // multi-bucket
    (13L, 400L, 500L))  // matches nothing
    .toDF("i_id", "lo", "hi")

  test("bucketed result equals the naive inequality join, pairs exactly once") {
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "lo", "hi", 100L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    val naive = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == naive, s"bucketed != naive:\n got=$got\n want=$naive")
    // inclusive bounds, boundary-crossing interval, degenerate interval
    assert(naive.contains((1L, 10L)) && naive.contains((2L, 11L)) &&
      naive.contains((3L, 11L)) && naive.contains((4L, 12L)))
    // exactly-once: no bucket-replica duplicates survive
    assert(got.distinct == got)
  }

  test("plans as a hash equi-join on the bucket, never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "ts", "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to all-pairs:\n$plan")
    // the naive predicate join IS the nested loop — the thing we avoid
    val naivePlan = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }

  test("shared column names between the sides do not break the filter") {
    val pts = Seq((1L, 100L), (2L, 400L)).toDF("k", "ts")
    val ivs = Seq((7L, 50L, 150L), (8L, 300L, 310L)).toDF("k", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi", 100L)
      .select(col("__pts.k"), col("__ivl.k")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L)))
  }

  test("randomized: equals the naive join for any bucket width (seeded)") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextLong().abs % 10000))
      .toDF("p_id", "ts")
    val ivs = Seq.tabulate(120) { i =>
      val lo = rnd.nextLong().abs % 10000
      (i.toLong, lo, lo + rnd.nextLong().abs % 500)
    }.toDF("i_id", "lo", "hi")
    val naive = pts.join(ivs, $"ts" >= $"lo" && $"ts" <= $"hi")
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    for (w <- Seq(1L, 7L, 100L, 512L, 10000L, 1000000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi", w)
        .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == naive, s"width $w diverges from the naive join")
    }
  }

  test("interval overlap: equals the naive theta-join, exactly once, for any width (seeded)") {
    val rnd = new scala.util.Random(17)
    def ivset(n: Int, pre: String) = Seq.tabulate(n) { i =>
      val lo = rnd.nextLong().abs % 10000
      (i.toLong, lo, lo + rnd.nextLong().abs % 800)
    }.toDF(s"${pre}_id", s"${pre}_lo", s"${pre}_hi")
    val a = ivset(150, "a")
    val b = ivset(100, "b")
    val naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 13L, 100L, 999L, 10000L, 1000000L)) {
      val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == naive, s"width $w diverges from the naive overlap join")
      // canonical-bucket uniqueness: no pair appears twice, no dedup ran
      assert(got.distinct == got, s"width $w produced duplicate pairs")
    }
    // plan shape: hash equi-join on the bucket, not a nested loop
    val plan = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join degenerated to all-pairs:\n$plan")
  }

  test("rj_overlap query: symmetric counts, all sessions present, matches naive recount") {
    val got = graft.analytics.SeriesQueries.concurrentSessions(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val sessions = graft.analytics.SeriesQueries.sessionBounds(spark, sfDir)
      .select("user_id", "session_id", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.length == sessions.length, "every session must appear, zeros included")
    // each overlapping pair contributes to both endpoints
    assert(got.map(_._3).sum % 2 == 0, "total overlap mass must be even")
    val naive = sessions.map { case (u, sid, lo, hi) =>
      (u, sid, sessions.count { case (u2, sid2, lo2, hi2) =>
        !(u2 == u && sid2 == sid) && lo <= hi2 && lo2 <= hi
      }.toLong)
    }.sortBy(r => (r._1, r._2))
    assert(got.sortBy(r => (r._1, r._2)) == naive)
  }

  test("rj_sessions query matches a naive recomputation at sf0.001") {
    val got = graft.analytics.SeriesQueries.activeSessions(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val sessions = graft.analytics.SeriesQueries.sessionBounds(spark, sfDir)
      .select("start_us", "end_us")
    val naive = graft.Tables.events(spark, sfDir)
      .where($"event_type" === "purchase").select($"event_id", $"ts_us")
      .join(sessions, $"ts_us" >= $"start_us" && $"ts_us" <= $"end_us")
      .groupBy("event_id").agg(count(lit(1)).as("n_active"))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == naive)
  }
}
