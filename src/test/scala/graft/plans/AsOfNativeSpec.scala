package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native as-of merge join must be RESULT-IDENTICAL to the composed
  * union+window operator (AlignJoin.asOfJoin) — same rows, same nulls,
  * same tie and tolerance semantics — and its physical plan must be the
  * custom exec fed by per-side exchanges, not a union window. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def sides() = {
    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts_us"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    (purchases, views)
  }

  test("native == composed on the corpus (no tolerance)") {
    val (p, v) = sides()
    val composed = graft.operators.AlignJoin.asOfJoin(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().sortBy(r => (r._1, r._3))
    val native = AsOfNative.asOfJoin(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().sortBy(r => (r._1, r._3))
    assert(native.length == composed.length && native.nonEmpty)
    assert(native.toSeq == composed.toSeq)
  }

  test("native == composed with a 1h tolerance (staleness masking)") {
    val (p, v) = sides()
    val tol = Some(3600000000L)
    val composed = graft.operators.AlignJoin.asOfJoin(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), Seq("v_event_id"), tol)
      .as[(Long, Long, Long, Double, Option[Double])].collect().sortBy(r => (r._1, r._3))
    val native = AsOfNative.asOfJoin(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), Seq("v_event_id"), tol)
      .as[(Long, Long, Long, Double, Option[Double])].collect().sortBy(r => (r._1, r._3))
    assert(native.toSeq == composed.toSeq)
    // tolerance must actually mask something on this corpus, or the test
    // is vacuous
    assert(native.count(_._5.isEmpty) > composed.count(_ => false))
  }

  test("physical plan is the merge exec with per-side exchange+sort, no union/window") {
    val (p, v) = sides()
    // no tiebreak: its dedup legitimately plans a Window; the native
    // JOIN itself must not
    val df = AsOfNative.asOfJoin(p, v, Seq("user_id"),
      "ts_us", "v_ts_us", Seq("v_value"))
    df.noop() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"expected custom exec in:\n$plan")
    assert(!plan.contains("!AsOfMergeJoin"), "plan must not flag missing inputs")
    assert(!plan.contains("Window"), "native path must not plan a window")
    assert(!plan.contains("Union"), "native path must not plan a union")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      "exactly one hash exchange per side")
  }

  test("edge cases: empty right, left rows before any right row, null times") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val rEmpty = Seq.empty[(Long, Long, Double)].toDF("k", "rt", "x")
    val gotEmpty = AsOfNative.asOfJoin(l, rEmpty, Seq("k"), "t", "rt", Seq("x"))
      .as[(Long, Long, String, Option[Double])].collect()
    assert(gotEmpty.length == 3 && gotEmpty.forall(_._4.isEmpty))
    val r = Seq((1L, 15L, 1.5), (2L, 99L, 9.9)).toDF("k", "rt", "x")
    val got = AsOfNative.asOfJoin(l, r, Seq("k"), "t", "rt", Seq("x"))
      .as[(Long, Long, String, Option[Double])].collect()
      .map(x => (x._1, x._2) -> x._4).toMap
    assert(got((1L, 10L)).isEmpty)          // before any right row
    assert(got((1L, 20L)).contains(1.5))    // rt=15 <= 20
    assert(got((2L, 5L)).isEmpty)           // right row is in the future
  }

  test("forward as-of: exact local replay on the corpus, inclusive at equal times") {
    val (p, v) = sides()
    val got = AsOfNative.asOfJoinForward(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .as[(Long, Long, Long, Double, Option[Double])].collect()
    assert(got.nonEmpty)
    // local replay: per user, dedup views at equal ts to the largest
    // event_id, then for each purchase the EARLIEST view at-or-after it
    val views = v.as[(Long, Long, Long, Double)].collect()
      .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    got.foreach { case (u, t, id, _, next) =>
      val expect = views.getOrElse(u, Seq.empty)
        .find(_._2 >= t).map(_._4)
      assert(next == expect, s"purchase ($u,$id) at $t: got $next want $expect")
    }
    // forward and backward genuinely differ on this corpus
    val back = AsOfNative.asOfJoin(p, v, Seq("user_id"),
        "ts_us", "v_ts_us", Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .as[(Long, Long, Long, Double, Option[Double])].collect()
      .map(r => (r._1, r._3) -> r._5).toMap
    assert(got.exists(r => back((r._1, r._3)) != r._5))
    // synthetic boundary: a right row exactly AT the left time matches
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 7.0), (1L, 30L, 9.0)).toDF("k", "rt", "x")
    val eq = AsOfNative.asOfJoinForward(l, r, Seq("k"), "t", "rt", Seq("x"))
      .as[(Long, Long, Option[Double])].collect()
    assert(eq.head._3.contains(7.0), "rt == t must match (inclusive)")
  }

  /** noop writer helper: executes the full plan without collecting. */
  private implicit class NoopOps(df: org.apache.spark.sql.DataFrame) {
    def noop(): Unit = df.write.format("noop").mode("overwrite").save()
  }
}
