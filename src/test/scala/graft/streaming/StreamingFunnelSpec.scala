package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the streaming funnel mirror ([[StreamingFunnel.depths]] vs
  * the batch `q_window_funnel`): finalized per-user (n_views, depth)
  * must equal the batch query on the same rows across arbitrary
  * micro-batch boundaries, and the dominance-reduced state must
  * reproduce the per-anchor greedy definition on constructed and
  * randomized streams. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  /** The batch definition verbatim (per-anchor earliest-next-step
    * greedy), brute-forced per user over its full event list. */
  private def brute(evs: Seq[(Long, String)], w: Long): (Long, Long) = {
    val views = evs.collect { case (t, "view") => t }
    val clicks = evs.collect { case (t, "click") => t }.sorted
    val purch = evs.collect { case (t, "purchase") => t }.sorted
    val depths = views.map { t1 =>
      clicks.find(_ > t1) match {
        case Some(t2) if t2 <= t1 + w =>
          purch.find(_ > t2) match {
            case Some(t3) if t3 <= t1 + w => 3L
            case _ => 2L
          }
        case _ => 1L
      }
    }
    (views.size.toLong, if (depths.isEmpty) 0L else depths.max)
  }

  /** Run the op over `batches` of (user, ts, type) rows; returns the
    * final snapshot per user. */
  private def run(batches: Seq[Seq[(Long, Long, String)]],
                  w: Long): Map[Long, (Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val name = s"funnel_${System.nanoTime()}"
    val q = StreamingFunnel.depths(ms.toDS(), w)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[FunnelSnapshot].collect().toSeq
      .groupBy(_.user_id).map { case (u, rows) =>
        val last = rows.maxBy(_.seq)
        u -> (last.n_views, last.depth)
      }
  }

  test("constructed chains: window cutoffs, strictness at equal timestamps, revival") {
    val w = 100L
    val cases: Seq[(String, Seq[(Long, String)], (Long, Long))] = Seq(
      ("full chain in window", Seq((1L, "view"), (5L, "click"), (9L, "purchase")), (1L, 3L)),
      ("purchase outside window", Seq((1L, "view"), (5L, "click"), (200L, "purchase")), (1L, 2L)),
      ("click outside window", Seq((1L, "view"), (200L, "click"), (201L, "purchase")), (1L, 1L)),
      // strictness: equal-timestamp steps do not chain
      ("click at view ts", Seq((5L, "view"), (5L, "click"), (9L, "purchase")), (1L, 1L)),
      ("purchase at click ts", Seq((1L, "view"), (5L, "click"), (5L, "purchase")), (1L, 2L)),
      // greedy earliest click is exact: the early click's purchase window still covers
      ("two clicks, purchase after second", Seq((1L, "view"), (5L, "click"),
        (50L, "click"), (60L, "purchase")), (1L, 3L)),
      // a LATER anchor revives the funnel after the first anchor dies
      ("second anchor completes", Seq((1L, "view"), (200L, "click"), (250L, "view"),
        (260L, "click"), (270L, "purchase")), (2L, 3L)),
      // the earliest purchase after t2 misses the window; later purchases don't resurrect
      ("earliest purchase binds", Seq((1L, "view"), (5L, "click"), (150L, "purchase"),
        (160L, "purchase")), (1L, 2L)),
      ("clicks only", Seq((5L, "click"), (9L, "purchase")), (0L, 0L)),
      ("views only", Seq((5L, "view"), (9L, "view")), (2L, 1L)))
    cases.foreach { case (label, evs, want) =>
      assert(brute(evs, w) === want, s"brute self-check: $label")
      val got = run(Seq(evs.map { case (t, e) => (7L, t, e) }), w).get(7L)
      val wantOpt = if (want._1 == 0) None else Some(want)
      assert(got === wantOpt, s"$label: got $got want $wantOpt")
    }
  }

  test("randomized streams: streaming == brute-force batch definition at every split") {
    var x = 987654321L
    def nxt(bound: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % bound).toInt
    }
    val types = Vector("view", "click", "purchase", "signup")
    (1 to 25).foreach { trial =>
      val w = Seq(3L, 10L, 40L)(nxt(3))
      val nU = 1 + nxt(4)
      val evs = (1 to (10 + nxt(60))).map { _ =>
        (nxt(nU).toLong, (1 + nxt(50)).toLong, types(nxt(4)))
      }.sortBy(e => (e._2, e._3)) // event-time order, deterministic tie order
      val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val (nv, d) = brute(rows.map(r => (r._2, r._3)), w)
        if (nv > 0) Some(u -> (nv, d)) else None
      }
      // one batch, and a random 3-way split at event-time boundaries
      val cut1 = nxt(evs.size); val cut2 = cut1 + nxt(evs.size - cut1 + 1)
      Seq(Seq(evs), Seq(evs.take(cut1), evs.slice(cut1, cut2), evs.drop(cut2)))
        .foreach { batches =>
          val got = run(batches.filter(_.nonEmpty), w)
          assert(got === want,
            s"trial $trial w=$w splits=${batches.map(_.size)}: $got vs $want\n$evs")
        }
    }
  }

  test("real corpus: final snapshots == the batch q_window_funnel, split across batches") {
    val batch = graft.analytics.SeriesQueries.windowFunnel(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .as[(Long, Long, String)].collect().toSeq
      .sortBy(e => (e._2, e._1, e._3)) // global event-time order => per-user in-order
    val n = evs.size
    val batches = Seq(evs.take(n / 3), evs.slice(n / 3, 2 * n / 3), evs.drop(2 * n / 3))
    val got = run(batches, 21600000000L)
    assert(got.nonEmpty && got === batch,
      s"${got.size} streamed users vs ${batch.size} batch users")
  }
}
