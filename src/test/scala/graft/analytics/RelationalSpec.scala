package graft.analytics

import graft.SparkSpec

/** Grouping-set family, pivot, set-ops, and the approximate sketches
  * (whose error bound vs the exact aggregates is the contract — they
  * have no DuckDB oracle). */
class RelationalSpec extends SparkSpec {

  test("cube emits all four grouping sets and they sum consistently") {
    val rows = Relational.quantityCube(spark, sfDir).collect()
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length == 1, "exactly one grand-total row")
    val perFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(perFlag.map(_.getLong(3)).sum == total.head.getLong(3))
    assert(leaves.map(_.getLong(3)).sum == total.head.getLong(3))
  }

  test("pivot matches the conditional-aggregation formulation") {
    import org.apache.spark.sql.functions._
    val piv = Relational.revenuePivot(spark, sfDir)
    val cond = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_linestatus") === "F",
          col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("rev_f"),
        round(sum(when(col("l_linestatus") === "O",
          col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("rev_o"))
      .orderBy("l_returnflag")
    assert(piv.collect().toSeq == cond.collect().toSeq)
  }

  test("histogram buckets partition all orders") {
    val h = Relational.orderValueHistogram(spark, sfDir).collect()
    val n = graft.Tables.orders(spark, sfDir).count()
    assert(h.map(_.getLong(1)).sum == n)
    assert(h.map(_.getLong(0)).distinct.length == h.length)
  }

  test("intersect is contained in both sides") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir)
    val both = Relational.returnedAndAcceptedParts(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val r = li.where(col("l_returnflag") === "R")
      .select("l_partkey").distinct().collect().map(_.getLong(0)).toSet
    val a = li.where(col("l_returnflag") === "A")
      .select("l_partkey").distinct().collect().map(_.getLong(0)).toSet
    assert(both == (r intersect a))
  }

  test("min-price supplier: one winner per part, and it really is the min") {
    import org.apache.spark.sql.functions._
    val win = Relational.minPriceSupplier(spark, sfDir)
    val perPart = win.groupBy("l_partkey").count().where(col("count") > 1)
    assert(perPart.count() == 0, "exactly one supplier per part")
    // the winner's price must equal the part's global min (rounded alike)
    val partMin = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey").agg(round(min("l_extendedprice"), 2).as("true_min"))
    val mismatched = win.join(partMin, "l_partkey")
      .where(col("min_price") =!= col("true_min"))
    assert(mismatched.count() == 0)
  }

  test("nation trade matrix: no diagonal, and cents-sum equals item total") {
    import org.apache.spark.sql.functions._
    val m = Relational.nationTrade(spark, sfDir).collect()
    assert(m.forall(r => r.getString(0) != r.getString(1)), "diagonal excluded")
    val nItems = m.map(_.getLong(3)).sum
    // recompute the cross-nation item count independently (same joins)
    val nation = graft.Tables.nation(spark, sfDir)
    val expected = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .count()
    assert(nItems == expected)
  }

  test("exact stats bracket the approx sketches") {
    val exact = Relational.exactStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Relational.approxStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, e) =>
      assert(e.getDouble(2) <= e.getDouble(3), s"$flag: median <= p90")
      val err = math.abs(approx(flag).getLong(1) - e.getLong(1)).toDouble / e.getLong(1)
      assert(err <= 0.05, s"$flag: HLL++ vs exact distinct drift $err")
    }
  }

  test("order gaps are non-negative and n_orders matches the order counts") {
    import org.apache.spark.sql.functions._
    val gaps = Relational.orderGaps(spark, sfDir)
    assert(gaps.where(col("max_gap_days") < 0).count() == 0)
    assert(gaps.where(col("avg_gap_days") > col("max_gap_days")).count() == 0)
    val counts = graft.Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val bad = gaps.join(counts, "o_custkey").where(col("n_orders") =!= col("n"))
    assert(bad.count() == 0)
    // customers with a single order have no gap and must be absent
    assert(gaps.where(col("n_orders") < 2).count() == 0)
  }

  test("spend quartiles: balanced buckets, ranks in [0,1], monotone with spend") {
    val rows = Relational.spendQuartiles(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1, s"ntile imbalance: $sizes")
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0 && r._4 > 0.0 && r._4 <= 1.0))
    // higher spend never lands in a later quartile / higher pct_rank
    val bySpend = rows.sortBy(-_._1)
    assert(bySpend.map(_._2).toSeq == bySpend.map(_._2).sorted.toSeq)
  }

  test("scale-safe spend quartiles: bit-identical to the window form, no global window") {
    // the registered q_spend_quartiles is the bucketed two-pass form; the
    // single-window form is the in-engine mirror it must match EXACTLY
    // (same doubles: identical IEEE rank arithmetic, argued in scaladoc)
    val win = Relational.spendQuartiles(spark, sfDir).collect().toSeq
    val scl = Relational.spendQuartilesScalable(spark, sfDir).collect().toSeq
    assert(scl == win)
    // and with a bucket count that forces many tiny buckets (stressing the
    // offset arithmetic across uneven bucket boundaries)
    val scl3 = Relational.spendQuartilesScalable(spark, sfDir, buckets = 3).collect().toSeq
    assert(scl3 == win)
    // plan shape: every window in the scalable plan partitions by a key —
    // the global-order single-partition WindowExec must be gone
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Relational.spendQuartilesScalable(spark, sfDir).queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the per-bucket rank window")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned (single-partition) window in scalable plan: $w"))
  }

  test("TPC-H analogs q10/q14/q18/q19: structural laws replay") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir)
    // q10: descending revenue, and the top row beats any non-returned aggregate
    val q10 = Relational.returnedCustomers(spark, sfDir).collect()
    val revs = q10.map(_.getDouble(3))
    assert(revs.length <= 20 && revs.sameElements(revs.sortBy(-(_: Double))))
    // q14: share within [0,100], promo <= total, years cover the data
    val q14 = Relational.promoShare(spark, sfDir).collect()
    assert(q14.nonEmpty)
    q14.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(3) >= 0 && r.getDouble(3) <= 100)
    }
    val yearsInData = li.select(year(col("l_shipdate"))).distinct().count()
    assert(q14.length == yearsInData)
    // q18: every emitted order's quantity replays above the threshold
    val q18 = Relational.bigOrders(spark, sfDir, minQty = 100).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
    val want18 = li.groupBy("l_orderkey").agg(sum("l_quantity").cast("long").as("q"))
      .where(col("q") > 100).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q18 == want18 && q18.nonEmpty)
    // q19: row count replays from an independent predicate evaluation
    val q19 = Relational.bracketRevenue(spark, sfDir).head()
    val part = graft.Tables.part(spark, sfDir)
    val n = li.join(part, col("l_partkey") === col("p_partkey"))
      .where((col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 25) && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(20, 35) && col("l_quantity").between(20, 35)))
      .count()
    assert(q19.getLong(0) == n && n > 0)
  }

  test("trailing spend: RANGE frame replays; same-day orders share a frame") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Relational.trailingSpend(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val orders = graft.Tables.orders(spark, sfDir).select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_orderdate").cast("timestamp").cast("long") / lit(86400L)).cast("long"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val byCust = orders.groupBy(_._2)
    got.foreach { case (okey, (cust, day, spend, n)) =>
      val frame = byCust(cust).filter(o => o._3 >= day - 30 && o._3 <= day)
      assert(spend == frame.map(_._4).sum && n == frame.size.toLong,
        s"order $okey: frame mismatch")
    }
    assert(got.length == orders.length)
  }

  test("grouping sets: layers sum consistently, flags mark superaggregates") {
    val rows = Relational.groupingSets(spark, sfDir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val leaves = rows.filter(r => r._3 == 0 && r._4 == 0)
    val perFlag = rows.filter(r => r._3 == 0 && r._4 == 1)
    val total = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(total.length == 1 && leaves.nonEmpty && perFlag.nonEmpty)
    assert(leaves.map(_._5).sum == total.head._5 && perFlag.map(_._5).sum == total.head._5)
    assert(leaves.map(_._6).sum == total.head._6)
    perFlag.foreach { f =>
      assert(leaves.filter(_._1 == f._1).map(_._5).sum == f._5)
    }
    // superaggregate rows have NULL rolled-up columns (flag, not value, is the signal)
    assert(total.head._1.isEmpty && total.head._2.isEmpty)
    assert(perFlag.forall(f => f._1.nonEmpty && f._2.isEmpty))
  }

  test("fuzzy_names: exact precision, full recall over the blocked space") {
    // reference unit-cost Levenshtein (same semantics as Spark/DuckDB)
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val got = Relational.fuzzyNames(spark, sfDir)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // precision: every emitted pair really is within edit distance [1,3]
    got.foreach { case (a, b, d, _, _) =>
      assert(lev(a, b) == d && d >= 1 && d <= 3, s"($a,$b) claims dist $d")
    }
    // recall: brute-force the small dictionary; every qualifying pair
    // whose first OR last token matches (the blocking contract) must appear
    val dict = graft.Tables.part(spark, sfDir)
      .groupBy("p_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val names = dict.keys.toArray.sorted
    val want = for {
      i <- names.indices; j <- (i + 1) until names.length
      a = names(i); b = names(j)
      ta = a.split(" "); tb = b.split(" ")
      if ta.head == tb.head || ta.last == tb.last
      d = lev(a, b) if d >= 1 && d <= 3
    } yield (a, b, d.toLong, dict(a), dict(b))
    assert(got.toSet == want.toSet,
      s"blocked-space mismatch: got ${got.length}, want ${want.length}")
  }

  test("approx sketches stay within error bounds of the exact aggregates") {
    import org.apache.spark.sql.functions._
    val approx = Relational.approxStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val parts = e.getLong(1).toDouble
      val approxParts = approx(flag).getLong(1).toDouble
      assert(math.abs(approxParts - parts) / parts <= 0.05,
        s"$flag: HLL++ rsd 0.01 should land within 5% ($approxParts vs $parts)")
      val median = e.getDouble(2)
      val approxMedian = approx(flag).getDouble(2)
      // percentile_approx with accuracy 10000 on ~2k rows/group is exact
      // up to picking a neighbouring sample; allow 1% drift
      assert(math.abs(approxMedian - median) / median <= 0.01,
        s"$flag: approx median $approxMedian vs $median")
    }
  }

  test("bucketedRank core: equals the windowed form on tie-heavy data at every bucket count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values mod 7 => ~70 rows per tie group: the adversarial case for
    // bucketing (ties must never straddle a bucket); id breaks the order
    val df = spark.range(500).select(col("id").as("o_custkey"),
      (col("id") % 7).cast("double").as("total_spend"))
    val want = Relational.quartilesWindowed(df)
      .select("o_custkey", "quartile", "pct_rank", "cume")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    for (b <- Seq(1, 2, 7, 32, 64)) {
      val got = Relational.quartilesBucketed(df, b)
        .select("o_custkey", "quartile", "pct_rank", "cume")
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(got == want, s"buckets=$b diverges from the windowed form")
    }
  }

  test("q8 market share is a valid ratio per year") {
    val rows = Relational.marketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per year")
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q13 distribution partitions customers and recovers the order total") {
    val rows = Relational.custOrderDistribution(spark, sfDir).collect()
    val nCust = graft.Tables.customer(spark, sfDir).count()
    val nOrd = graft.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nCust, "custdist sums to all customers")
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nOrd,
      "sum(c_count*custdist) recovers the order count")
  }

  test("q15 winner really is the max-revenue supplier of the quarter") {
    import org.apache.spark.sql.functions._
    val win = Relational.topSupplier(spark, sfDir).collect()
    assert(win.nonEmpty)
    val all = graft.Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
             col("l_shipdate") < lit("1996-04-01").cast("date"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = all.values.max
    assert(win.forall(r => all(r.getLong(0)) == best), "every returned row is at the max")
    assert(win.length == all.count(_._2 == best), "ALL argmax suppliers returned")
  }

  test("q17 picks exactly the below-20%-of-average rows (windowed reference)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val branded = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir).where(col("p_brand") === "Brand#23")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy("l_partkey")
    val nSmall = branded
      .withColumn("sq", sum(round(col("l_quantity"), 0).cast("long")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .where(round(col("l_quantity"), 0).cast("long") * 5 * col("cnt") < col("sq"))
      .count()
    val got = Relational.smallQtyRevenue(spark, sfDir).collect().head
    assert(got.getLong(1) == nSmall, s"n_small ${got.getLong(1)} vs windowed $nSmall")
  }

  test("q22: every lapsed customer is above average balance with no recent order") {
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_c"))
    val pos = cust.where(col("bal_c") > 0)
      .agg(sum("bal_c").as("s"), count(lit(1)).as("c")).head()
    val (s, c) = (pos.getLong(0), pos.getLong(1))
    val lapsedKeys = cust.where(col("bal_c") * c > s)
      .join(graft.Tables.orders(spark, sfDir)
        .where(col("o_orderdate") >= lit("1999-01-01").cast("date"))
        .select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
    val byNation = lapsedKeys.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val got = Relational.lapsedHighBalance(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == byNation.values.sum)
    assert(got.nonEmpty)
  }
}
