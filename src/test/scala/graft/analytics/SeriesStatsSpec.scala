package graft.analytics

import org.apache.spark.sql.functions.{col, round}

import graft.SparkSpec

/** Laws for the round-5 series/stats operators (ts_ewma, ts_autocorr,
  * q_funnel, q_evt_pctl, dedup_containment): each query is recomputed
  * independently in plain Scala over exact integer cents, and the exact
  * dyadic-arithmetic claims (no tolerance needed) are asserted as such. */
class SeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events: Seq[(Long, Long, Long, Long, String)] =
    graft.Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value", "event_type")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
      .map(r => (r._1, r._2, r._3, math.round(r._4 * 100), r._5))

  private def ordered(user: Long): Seq[Long] =
    events.filter(_._1 == user).sortBy(e => (e._2, e._3)).map(_._4)

  test("ts_ewma: exact dyadic fold — Scala recomputation matches bit-for-bit") {
    val got = SeriesQueries.ewma(spark, sfDir)
      .select("user_id", "event_id", "ewma").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val byKey = events.groupBy(_._1)
    assert(byKey.nonEmpty)
    byKey.foreach { case (u, rows) =>
      val ord = rows.sortBy(e => (e._2, e._3))
      ord.indices.foreach { i =>
        val win = ord.slice(math.max(0, i - 9), i + 1).map(_._4.toDouble)
        val want = win.tail.foldLeft(win.head)((acc, x) => acc * 0.75 + x * 0.25) / 100.0
        val g = got((u, ord(i)._3))
        // dyadic weights over integer cents: exact equality, no tolerance
        assert(g == want, s"ewma mismatch user=$u event=${ord(i)._3}: $g != $want")
      }
    }
  }

  test("ts_autocorr: matches exact integer sufficient statistics; r in [-1,1]") {
    val got = SeriesQueries.lagAutocorr(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, n, r) =>
      assert(r >= -1.0 && r <= 1.0, s"user=$u r=$r out of range")
      val xs = ordered(u)
      assert(n == xs.length - 1, s"user=$u pair count $n != ${xs.length - 1}")
      val (x, y) = (xs.init, xs.tail)
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum
      val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val want = math.round(1e6 * (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)) / 1e6
      assert(math.abs(r - want) < 1e-9, s"user=$u r=$r want=$want")
    }
  }

  test("q_funnel: stage counts monotone non-increasing and match replay") {
    val got = SeriesQueries.funnel(spark, sfDir)
      .select("stage", "n_users").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val counts = got.map(_._2)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel must narrow: ${counts.toSeq}")
    // independent replay of the first-occurrence semantics
    val byUser = events.groupBy(_._1)
    def firstAfter(rows: Seq[(Long, Long, Long, Long, String)],
                   typ: String, after: Long): Option[Long] =
      rows.filter(r => r._5 == typ && r._2 > after)
        .sortBy(r => (r._2, r._3)).headOption.map(_._2)
    val views = byUser.flatMap { case (u, rows) =>
      firstAfter(rows, "view", Long.MinValue).map(u -> _)
    }
    val clicks = views.flatMap { case (u, tv) =>
      firstAfter(byUser(u), "click", tv).map(u -> _)
    }
    val purchases = clicks.flatMap { case (u, tc) =>
      firstAfter(byUser(u), "purchase", tc).map(u -> _)
    }
    assert(counts.toSeq == Seq(views.size.toLong, clicks.size.toLong, purchases.size.toLong))
  }

  test("q_window_funnel: brute-force exists-chain replay; depth monotone in window") {
    // independent semantics: depth(u) = max k with a strictly-increasing
    // chain view < click < purchase whose LAST step is within W of the
    // chain's FIRST — brute force over every (v, c, p) triple, no greedy
    def brute(wUs: Long): Map[Long, Long] =
      events.groupBy(_._1).map { case (u, rows) =>
        val v = rows.filter(_._5 == "view").map(_._2)
        val c = rows.filter(_._5 == "click").map(_._2)
        val p = rows.filter(_._5 == "purchase").map(_._2)
        val d3 = v.exists(t1 => c.exists(t2 => t2 > t1 &&
          p.exists(t3 => t3 > t2 && t3 <= t1 + wUs)))
        val d2 = v.exists(t1 => c.exists(t2 => t2 > t1 && t2 <= t1 + wUs))
        u -> (if (d3) 3L else if (d2) 2L else 1L)
      }
    val w = 21600000000L
    val got = SeriesQueries.windowFunnel(spark, sfDir, w)
      .select("user_id", "depth").as[(Long, Long)].collect().toMap
    val want = brute(w)
    assert(got.keySet === want.keySet.filter(u =>
      events.exists(e => e._1 == u && e._5 == "view")))
    got.foreach { case (u, d) => assert(d === want(u), s"user $u") }
    // all three depths realized at the query window (the point of W=6h)
    assert(got.values.toSet === Set(1L, 2L, 3L))
    // depth is monotone non-decreasing in the window size, per user
    val gotWide = SeriesQueries.windowFunnel(spark, sfDir, w * 4)
      .select("user_id", "depth").as[(Long, Long)].collect().toMap
    got.foreach { case (u, d) => assert(gotWide(u) >= d, s"user $u") }
    // n_views is the anchor count
    val nv = SeriesQueries.windowFunnel(spark, sfDir, w)
      .select("user_id", "n_views").as[(Long, Long)].collect().toMap
    nv.foreach { case (u, n) =>
      assert(n === events.count(e => e._1 == u && e._5 == "view").toLong, s"user $u")
    }
  }

  test("q_evt_pctl: quartiles ordered within each band; counts cover the table") {
    val got = SeriesQueries.hourlyPercentiles(spark, sfDir)
      .select("n", "p25", "p50", "p75").as[(Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (n, p25, p50, p75) =>
      assert(n > 0 && p25 <= p50 && p50 <= p75, s"band violated: $n $p25 $p50 $p75")
    }
    assert(got.map(_._1).sum == events.size)
  }

  test("q_transitions: counts replay exactly; probabilities row-normalize to 1") {
    val got = SeriesQueries.transitions(spark, sfDir)
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    // replay: per user ordered by (ts_us, event_id), count adjacent pairs
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ord = rows.sortBy(e => (e._2, e._3)).map(_._5)
      ord.zip(ord.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    // each from-row's probabilities sum to exactly 1 (n_i / N sums to N/N)
    got.groupBy(_._1).foreach { case (from, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { r => assert(r._4 == r._3.toDouble / total) }
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, s"row $from")
    }
    // every user contributes (len-1) transitions
    assert(got.map(_._3).sum ==
      events.size - events.map(_._1).distinct.size)
  }

  test("q_retention: offset-0 rows are full cohorts; matrix replays from raw weeks") {
    val got = SeriesQueries.retention(spark, sfDir)
      .select("cohort_week", "week_offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // replay: per-user distinct weeks -> cohort = min week
    val weeks = events.map(e => (e._1, e._2 / 604800000000L)).distinct
    val cohortOf = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = weeks
      .map { case (u, w) => (cohortOf(u), w - cohortOf(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    got.foreach { case (cw, off, nActive, size, ret) =>
      assert(off >= 0 && nActive <= size)
      assert(ret == nActive.toDouble / size) // one IEEE division, exact
      if (off == 0) assert(nActive == size, s"cohort $cw: week-0 must be everyone")
    }
    // cohort sizes partition the user base
    assert(got.filter(_._2 == 0).map(_._4).sum == cohortOf.size)
  }

  test("ts_cusum: changepoint replays from exact integer deviations") {
    val got = SeriesQueries.cusum(spark, sfDir)
      .select("user_id", "cp_event_id", "cp_ts_us", "max_abs_cusum", "n")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byKey = events.groupBy(_._1)
    assert(got.length == byKey.size)
    got.foreach { case (u, cpEvent, cpTs, maxAbs, n) =>
      val ord = byKey(u).sortBy(e => (e._2, e._3))
      assert(n == ord.size)
      val s = ord.map(_._4).sum
      var acc = 0L
      val cusums = ord.map { e => acc += e._4 * n - s; (e._2, e._3, math.abs(acc)) }
      // argmax with the (abs desc, ts, event_id) tie-break
      val best = cusums.maxBy(c => (c._3, -c._1, -c._2))
      assert((best._2, best._1, best._3) == ((cpEvent, cpTs, maxAbs)),
        s"user $u: got ($cpEvent,$cpTs,$maxAbs) want $best")
      // the full deviation walk returns to zero (sum of c_i*n - S is 0)
      assert(acc == 0L, s"user $u: CUSUM must close at 0, got $acc")
    }
  }

  test("dedup_containment: overlap law (>= jaccard on shared pairs; metric exact)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val cont = Dedup.containmentPairs(docs, threshold = 0.0)
      .select("doc_a", "doc_b", "overlap").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cont.keySet == jac.keySet,
      "shared candidate stage must yield identical verified pair sets")
    assert(cont.nonEmpty)
    cont.foreach { case (k, ov) =>
      assert(ov >= jac(k) - 1e-9,
        s"overlap(min-normalized) must dominate jaccard(union-normalized) at $k")
      assert(ov > 0.0 && ov <= 1.0 + 1e-12, s"overlap out of range at $k: $ov")
    }
  }

  test("ts_trend: exact integer replay of the trailing-12 window from raw events") {
    val rows = SeriesQueries.trendProfile(spark, sfDir)
      .select("user_id", "event_id", "n", "trend_u", "resid_u")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def scaled(num: Long, den: Long): Long =
      (if (num < 0) -1L else 1L) * (math.abs(num) * 10000L / den)
    val raw = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (u, ts, id, v) =>
        (u, ts, id,
          BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    val expect = raw.groupBy(_._1).flatMap { case (u, g) =>
      val ordered = g.sortBy(r => (r._2, r._3))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 11), i + 1)
        val s = frame.map(_._4).sum
        val n = frame.length.toLong
        val c = ordered(i)._4
        (u, ordered(i)._3) -> ((n, scaled(s, n), scaled(c * n - s, n)))
      }
    }
    rows.foreach { case (u, id, n, tu, ru) =>
      val (en, et, er) = expect((u, id))
      assert(n == en && tu == et && ru == er,
        s"($u,$id): got ($n,$tu,$ru) want ($en,$et,$er)")
    }
    // a frame head has n < 12; steady state has n == 12
    assert(rows.exists(_._3 < 12) && rows.exists(_._3 == 12))
  }

  test("ts_seasonal: exact integer replay from raw events; counts cover the table") {
    val rows = SeriesQueries.seasonalProfile(spark, sfDir)
      .select("user_id", "phase", "n", "phase_mean_u", "idx_u")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, p, n, _, _) => assert(p >= 0 && p < 24 && n > 0) }
    val total = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_._3).sum == total, "phase counts must cover every event")
    // exact local replay of the whole integer pipeline from raw events
    val raw = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, ts, v) =>
        (u, (ts / 3600000000L) % 24,
          BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    def scaled(num: Long, den: Long): Long =
      (if (num < 0) -1L else 1L) * (math.abs(num) * 10000L / den)
    val byPhase = raw.groupBy(r => (r._1, r._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val byUser = raw.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    rows.foreach { case (u, p, n, mu, iu) =>
      val (en, es) = byPhase((u, p))
      val (nu, su) = byUser(u)
      assert(n == en, s"($u,$p): n $n != $en")
      assert(mu == scaled(es, en), s"($u,$p): phase_mean_u $mu != ${scaled(es, en)}")
      assert(iu == scaled(es * nu - su * en, en * nu),
        s"($u,$p): idx_u $iu != ${scaled(es * nu - su * en, en * nu)}")
    }
  }

  test("ts_ohlc: bars replay exactly from collected ticks; OHLC bounds; repartition-proof") {
    val bars = SeriesQueries.ohlcBars(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(bars.nonEmpty)
    val ticks = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val grouped = ticks.groupBy(t => (t._1, t._2 / 86400000000L))
    assert(grouped.keySet == bars.keySet)
    grouped.foreach { case (k, ts) =>
      val ordered = ts.sortBy(t => (t._2, t._3))
      val (o, h, l, c, n, s) = bars(k)
      assert(o == ordered.head._4 && c == ordered.last._4, s"bar $k open/close")
      assert(h == ts.map(_._4).max && l == ts.map(_._4).min, s"bar $k high/low")
      assert(n == ts.length && s == ts.map(_._4).sum, s"bar $k count/sum")
      assert(l <= o && o <= h && l <= c && c <= h)
    }
    // determinism under partitioning: the aggregation keys carry a total
    // order, so a different physical layout cannot move an open/close
    val again = SeriesQueries.ohlcBars(spark, sfDir).repartition(13).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(again == bars)
  }
}
