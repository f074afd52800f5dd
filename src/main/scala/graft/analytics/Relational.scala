package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch relational analytics over the driver's TPC-H-ish tables — the
  * north-star batch surface (SURVEY.md §2.10 consequence + §7 step 7).
  *
  * Design notes for 100 TB scale, applied throughout:
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    `broadcast()` so the fact tables (lineitem/orders) never shuffle
  *    for the join;
  *  - every query projects only needed columns before the join/agg, so
  *    parquet scans prune columns and push filters (verify with
  *    `.explain("formatted")` -> PushedFilters / ReadSchema);
  *  - double-typed outputs are `round(...)`ed so results are stable
  *    across summation orders (oracle hash parity).
  */
object Relational {

  /** TPC-H Q1 analog: pricing summary by returnflag/linestatus.
    * Pure scan + partial agg; no shuffle beyond one row per group. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6 analog: predicate-pushdown revenue filter. The three
    * filters all reach the parquet scan. */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** TPC-H Q3 analog: top unshipped-revenue orders for one segment.
    * customer is broadcast; lineitem joins orders on the shuffle. */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 analog: revenue by nation (6-way join). All dims broadcast;
    * only lineitem⋈orders shuffles. */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Top-k customers by total order value; broadcast-joined to names. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    ord.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("total_spend"), count(lit(1)).as("n_orders"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "total_spend", "n_orders")
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(10)
  }

  /** Anti join: customers with no large (>400k) orders. The filter on the
    * orders side is pushed to the scan; the anti join hashes on keys only. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val bigOrd = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 400000).select("o_custkey")
    cust.join(bigOrd, col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")
  }

  /** Semi join + conditional count: order-priority counts for orders with
    * at least one lineitem shipped after the order date (TPC-H Q4 analog). */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** ROLLUP aggregate (grouping-sets family). */
  def returnsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Ranking window: top-3 orders per customer by value. One shuffle on
    * o_custkey; rank computed in-partition. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
  }

  /** Running (cumulative) sum per customer ordered by date — the
    * analytic-window counterpart of the reference's expanding aggregates. */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("running_spend", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "running_spend")
  }

  /** Distinct aggregates: exact distinct parts+suppliers per return flag. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_partkey", "l_suppkey")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** CUBE aggregate: all 4 grouping sets of (returnflag, linestatus) in
    * one pass — same shuffle profile as the plain groupBy (grouping-set
    * expansion happens map-side before the exchange). */
  def quantityCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** PIVOT: revenue by return flag with linestatus spread across columns.
    * Values are enumerated explicitly, so the plan is a single groupBy
    * with conditional aggregates — no extra pass to discover pivot keys. */
  def revenuePivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("rev"), 2))
      .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o"))
      .orderBy("l_returnflag")

  /** Histogram: order values bucketed into fixed 100k-wide bins. The
    * bucket id is computed in the scan projection; one shuffle on ~6
    * bucket keys. */
  def orderValueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 100000).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_orders"))
      .orderBy("bucket")

  /** INTERSECT set-op: part keys that appear both in returned ('R') and
    * accepted ('A') lineitems. Spark plans this as a distinct + hash
    * semi-join on the 8-byte key — payload never shuffles. */
  def returnedAndAcceptedParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_returnflag", "l_partkey")
    li.where(col("l_returnflag") === "R").select("l_partkey")
      .intersect(li.where(col("l_returnflag") === "A").select("l_partkey"))
      .orderBy("l_partkey")
  }

  /** EXCEPT set-op: parts with a high-quantity (>= 48) returned lineitem
    * but no high-quantity accepted one — distinct + hash anti-join on the
    * bare key; both quantity filters reach the parquet scan. */
  def returnedNeverAcceptedParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_quantity") >= 48).select("l_returnflag", "l_partkey")
    li.where(col("l_returnflag") === "R").select("l_partkey")
      .except(li.where(col("l_returnflag") === "A").select("l_partkey"))
      .orderBy("l_partkey")
  }

  /** TPC-H Q2 analog (no partsupp table in the driver set): for each part,
    * the supplier quoting the lowest observed sale price. GroupBy on the
    * composite key, then a rank window partitioned by the part key — the
    * window exchange re-uses nothing from the group exchange but both hash
    * on ≤16-byte keys, never payload. `min` (not `avg`) keys the rank:
    * min is summation-order-independent, so the rank is bit-deterministic
    * across partitionings (oracle hash parity without rounding games). */
  def minPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("min_price"))
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("min_price"), col("l_suppkey"))
    perSupp.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("min_price"), 2).as("min_price"))
  }

  /** TPC-H Q7 analog: trade matrix between customer and supplier nations.
    * Both nation maps broadcast onto the one lineitem⋈orders shuffle; the
    * cross-nation filter drops the diagonal before aggregation. At most
    * |nations|² result rows regardless of fact size. */
  def nationTrade(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .where(col("cust_nation") =!= col("supp_nation"))
      // exact-cents accumulation: round(sum(double),2) is summation-order
      // dependent and DID flip the last digit on 5/600 groups vs the
      // oracle — rounding each item to integer cents first makes the sum
      // a BIGINT (order-independent, exact), and cents/100 is exact in
      // double far past any corpus size (sum < 2^53)
      .groupBy("cust_nation", "supp_nation")
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")) / 100.0).as("volume"),
        count(lit(1)).as("n_items"))
      .orderBy("cust_nation", "supp_nation")
  }

  /** Exact counterpart of [[approxStats]]: true distinct counts and true
    * interpolated percentiles. This is the query whose cost motivates the
    * sketches — exact distinct shuffles every distinct key and exact
    * percentiles sort each group — kept on the surface because at dim-table
    * scale exactness is affordable and it gives the sketch query an
    * in-engine ground truth (RelationalSpec asserts the error bounds). */
  def exactStats(spark: SparkSession, dir: String): DataFrame = {
    // Two branches joined on the 3-row group key, NOT one agg: mixing
    // countDistinct with percentile makes Catalyst's two-level distinct
    // rewrite carry the percentile buffers through the (flag, partkey)
    // stage — one growable double-array buffer PER DISTINCT PART (~200k
    // at sf0.1, measured 5.1 s solo), all merged into 3 groups. Split,
    // each branch is its natural shape: a two-level hash agg over pruned
    // (flag, partkey), and 3 percentile buffers fed straight from the
    // scan (2.1 s solo). The join is 3x3 broadcast — free.
    val li = Tables.lineitem(spark, dir)
    val distinctCounts = li.select("l_returnflag", "l_partkey")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"), count(lit(1)).as("n_rows"))
    // percentiles interpolate on the EXACT CENT GRID, then ONE IEEE
    // division back to price units — not round(percentile(price), 2):
    // an even-count median of 2-dp prices lands on a half-cent, which is
    // not binary-representable, and rounding an inexact double at a
    // decimal tie is exactly where engines diverge (the seasonalProfile
    // lesson; measured: 1 of 6 medians flipped a cent at sf0.001).
    // Integer-valued doubles interpolate exactly (a+b)/2 is dyadic; the
    // 0.9 interpolation a + frac·(b−a) is the same correctly-rounded op
    // sequence in both engines from identical integer operands.
    val pctiles = li
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .groupBy("l_returnflag")
      .agg(
        (expr("percentile(cents, 0.5)") / 100.0).as("median_price"),
        (expr("percentile(cents, 0.9)") / 100.0).as("p90_price"))
    distinctCounts.join(broadcast(pctiles), "l_returnflag")
      .select("l_returnflag", "n_parts", "median_price", "p90_price", "n_rows")
      .orderBy("l_returnflag")
  }

  /** Bloom-pruned semi-join: per-supplier line totals restricted to ONE
    * nation's suppliers (a 1-in-25 selective dimension) — the runtime-
    * filter pattern run explicitly through
    * [[graft.operators.BloomPrune.semiJoin]]: the dimension's key set is
    * aggregated into a Bloom filter, shipped to the fact scan as a
    * codegen'd predicate, and the exact semi-join only sees the pruned
    * stream. Result is bit-identical to the plain `IN (SELECT ...)` the
    * oracle runs — the bloom is an execution detail, never semantics. */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
      // NATION_3 has suppliers at every test SF (sf0.001 carries only 10
      // suppliers over 10 of the 25 nations)
      .where(col("n_name") === "NATION_3").select("n_nationkey")
    val dim = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val fact = Tables.lineitem(spark, dir).select("l_suppkey", "l_quantity")
    graft.operators.BloomPrune
      .semiJoin(fact, "l_suppkey", dim, "s_suppkey", expectedItems = 100000)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"),
        // integer-cents accumulation (order-independent, exact)
        (sum(round(col("l_quantity") * 100, 0).cast("long")) / 100.0).as("total_qty"))
      .orderBy("l_suppkey")
  }

  /** Inter-order gaps: per customer, the mean/max whole-day gap between
    * consecutive orders (lag window → integer day arithmetic → one agg).
    * Gaps are exact BIGINT day counts (epoch-ms floor-div), so the mean is
    * an exact-integer-sum ÷ count — deterministic under any partitioning,
    * no floating-point accumulation to round away. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      // o_orderdate reads as TIMESTAMP_NTZ; the session TZ is pinned UTC
      // (Sessions.local), so the NTZ->TZ cast is the identity wall-clock
      // mapping and unix_millis agrees with DuckDB's epoch_ms on the
      // naive value
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .withColumn("prev_ms", unix_millis(lag(col("o_orderdate"), 1).over(w)))
      .where(col("prev_ms").isNotNull)
      // `div`, not `/`: Spark's `/` is DOUBLE division even on longs, and a
      // correctly-rounded quotient a hair under an integer can cast up —
      // integral `div` matches DuckDB's `//` floor exactly (gaps are >= 0)
      .select(col("o_custkey"),
        expr("(unix_millis(o_orderdate) - prev_ms) div 86400000").as("gap_days"))
      .groupBy("o_custkey")
      .agg(round(avg("gap_days"), 4).as("avg_gap_days"),
        max("gap_days").as("max_gap_days"),
        (count(lit(1)) + 1).as("n_orders"))
      .orderBy("o_custkey")
  }

  /** Distribution windows: spend quartile, percent rank, and cumulative
    * distribution per customer. One aggregation shuffle, then a single
    * GLOBAL-order window — the one window family that genuinely needs a
    * total order. At 100 TB this is the plan to avoid per-row (a single
    * sorted partition); for dashboards over pre-aggregated customers
    * (~millions of rows, 8-byte keys + one double) it stays cheap, and
    * cross-partition alternatives (approx quantile cutoffs) live in
    * [[approxStats]]. Deterministic: ordering tie-breaks on c_custkey and
    * every rank-derived double is exactly representable (k/n ratios
    * rounded alike both engines). */
  private def spendPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
      .groupBy("o_custkey")
      .agg((sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0).as("total_spend"))

  def spendQuartiles(spark: SparkSession, dir: String): DataFrame =
    quartilesWindowed(spendPerCustomer(spark, dir))

  /** The single-global-window form over any (o_custkey, total_spend)
    * frame — kept as the in-engine mirror of [[quartilesBucketed]] and
    * the slow arm of [[graft.ScaleProbe]]. */
  def quartilesWindowed(spend: DataFrame): DataFrame = {
    val w = Window.orderBy(col("total_spend").desc, col("o_custkey"))
    spend.select(col("o_custkey"), col("total_spend"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_custkey")
  }

  /** Scale-safe [[spendQuartiles]] — bit-identical output, NO global-order
    * window (the single-partition WindowExec was round 5's one surviving
    * scale flag). The ordering key (total_spend DESC, o_custkey) is
    * UNIQUE, so ntile/percent_rank/cume_dist are pure arithmetic in
    * (global row_number, n); the global row_number is reconstructed from
    * bounded per-bucket ranks:
    *
    *  1. bucket CUTOFFS: `approxQuantile` over the aggregated spend,
    *     collected once and embedded as plan literals (model-parameter-
    *     sized, the IVF-centroid precedent). Cutoff VALUES affect only
    *     bucket balance, never correctness — per-bucket counts are
    *     measured, not assumed — and rows with equal spend always share a
    *     bucket, so bucketing coarsens (never crosses) the total order;
    *  2. per-bucket COUNTS (≤ `buckets` rows to the driver) give each
    *     bucket's global rank offset and n;
    *  3. per-bucket row_number (hash-partitioned window, partitions of
    *     ~n/buckets rows) + broadcast offset = exact global rank, from
    *     which quartile (ntile's ceil/floor split), pct_rank
    *     ((rn-1)/(n-1)) and cume (rn/n) follow with the same IEEE ops the
    *     window expressions use.
    *
    * At 100 TB: every stage is a hash shuffle or a bounded window; raise
    * `buckets` with the customer count to keep partitions executor-sized.
    * The aggregate is persisted across the probe jobs and the rank job
    * (the Dedup/Similarity shared-intermediate precedent). */
  def spendQuartilesScalable(spark: SparkSession, dir: String,
                             buckets: Int = 32): DataFrame =
    quartilesBucketed(spendPerCustomer(spark, dir), buckets)

  /** The bucketed exact-rank core over ANY (id, value) frame — the
    * scalable replacement for a global-order window (see
    * [[spendQuartilesScalable]] for the full algorithm note). Returns the
    * input plus `__rn` = the exact 1-based global rank under
    * (value DESC-or-ASC, id ASC), and the total row count. Cutoff VALUES
    * come from `approxQuantile` and affect only bucket balance, never
    * correctness; equal values always share a bucket, so bucketing
    * coarsens (never crosses) the total order. Shared by the spend
    * quartiles and [[Sampling.curriculumStages]]' easy→hard staging. */
  private[analytics] def bucketedRank(dfIn: DataFrame, idCol: String,
      valCol: String, buckets: Int, desc: Boolean): (DataFrame, Long) = {
    val df = dfIn.persist()
    // buckets <= 1 degenerates to the single-bucket (windowed) form;
    // approxQuantile NPEs on an empty probability array, so skip it
    val cutoffs = if (buckets <= 1) Array.empty[Double]
      else df.stat
        .approxQuantile(valCol, (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
    // bucket(x): tie-stable strict comparisons against constants; bucket 0
    // holds the rows that come FIRST in the requested order. A codegen'd
    // when-chain over <= `buckets` literals.
    val ordered = if (desc) cutoffs.reverse else cutoffs
    val bucketCol: org.apache.spark.sql.Column =
      if (cutoffs.isEmpty) lit(0)
      else ordered.zipWithIndex.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (c, i)) =>
          val cond = if (desc) col(valCol) > c else col(valCol) < c
          Some(acc.fold(when(cond, i))(_.when(cond, i)))
      }.get.otherwise(cutoffs.length)
    val withB = df.withColumn("__b", bucketCol)
    val counts = withB.groupBy("__b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val wb = Window.partitionBy("__b")
      .orderBy(if (desc) col(valCol).desc else col(valCol).asc, col(idCol))
    (withB.withColumn("__rn",
      element_at(typedLit(offsets), col("__b")) + row_number().over(wb).cast("long")), n)
  }

  /** Exact ntile(tiles) from the reconstructed global rank `__rn`: the
    * first n%tiles tiles take ceil(n/tiles) rows, the rest floor —
    * branch on constants so no div-by-zero path exists when n < tiles. */
  private[analytics] def ntileCol(n: Long, tiles: Int): org.apache.spark.sql.Column = {
    val q = n / tiles; val r = n % tiles
    if (q == 0) col("__rn")
    else expr(s"CASE WHEN __rn <= ${r * (q + 1)} THEN (__rn + $q) div ${q + 1} " +
      s"ELSE $r + (__rn - ${r * (q + 1)} + ${q - 1}) div $q END")
  }

  /** The bucketed exact-rank quartiles over any (o_custkey, total_spend)
    * frame — see [[spendQuartilesScalable]] for the algorithm. */
  def quartilesBucketed(spendIn: DataFrame, buckets: Int = 32): DataFrame = {
    val (ranked, n) = bucketedRank(spendIn, "o_custkey", "total_spend", buckets, desc = true)
    val pctRank =
      if (n <= 1) lit(0.0)
      else round((col("__rn") - 1).cast("double") / lit((n - 1).toDouble), 6)
    ranked.select(col("o_custkey"), col("total_spend"),
        ntileCol(n, 4).as("quartile"),
        pctRank.as("pct_rank"),
        round(col("__rn").cast("double") / lit(n.toDouble), 6).as("cume"))
      .orderBy("o_custkey")
  }

  /** Approximate sketches — the 100 TB workhorses. HLL++ distinct and
    * t-digest-style percentiles shuffle O(sketch) bytes per group instead
    * of O(rows); exactness is traded for a bounded relative error that
    * [[graft.analytics]]'s RelationalSpec asserts against the exact
    * aggregates. Not DuckDB-oracle-able (sketch internals differ per
    * engine), so the driver records the weaker rows-only check. */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_partkey", "l_extendedprice")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.01).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** The ORACLE-facing form of [[approxStats]]: raw sketch outputs can
    * never cross-engine hash (HLL++/t-digest internals differ per
    * engine), so this emits what CAN be hashed — the exact scaffolding
    * (row counts, min/max price) plus in-row BOUNDS CHECKS on the sketch
    * outputs, evaluated in-engine: the HLL estimate must land in
    * [1, n_rows], the t-digest median inside the group's [min, max].
    * DuckDB replays the exact half and the literal-true bounds, so a
    * sketch regression past its range breaks the hash gate; the TIGHT
    * error contract vs the exact aggregates (1% HLL / interpolation-
    * accuracy median) stays in RelationalSpec, where both sides run in
    * one engine. The sketches themselves still execute in this plan —
    * the query costs what the 100 TB workhorse costs. */
  def approxStatsChecked(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_partkey", "l_extendedprice")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.01).as("ap"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("am"),
        count(lit(1)).as("n_rows"),
        min("l_extendedprice").as("mn"),
        max("l_extendedprice").as("mx"))
      // bounds against the RAW min/max (rounding the output only): prices
      // are 2-decimal so it's moot today, but a median equal to the exact
      // min must never fail because the displayed min rounded up
      .select(col("l_returnflag"), col("n_rows"),
        round(col("mn"), 2).as("min_price"), round(col("mx"), 2).as("max_price"),
        (col("ap") >= 1 && col("ap") <= col("n_rows")).as("approx_parts_in_range"),
        (col("am") >= col("mn") && col("am") <= col("mx")).as("approx_median_in_range"))
      .orderBy("l_returnflag")

  /** Exact revenue in units of 1e-4 currency: `cents · (100 − disc·100)`
    * in BIGINT (both factors 2-decimal by construction), divided by 1e4
    * ONCE after the sum — zero summation-order dependence, unlike a
    * rounded DOUBLE sum which diverged by a cent on ~10k-row groups (q14
    * parity note). Shared by q10/q14/q19. */
  private def rev1e4 = round(col("l_extendedprice") * 100, 0).cast("long") *
    (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))

  /** TPC-H Q10 analog — who returned the most value: per-customer revenue
    * over returned lineitems, top 20. The returnflag filter reaches the
    * parquet scan (PushedFilters); customer/nation broadcast; only the
    * filtered fact rows shuffle for the aggregation. Deterministic
    * top-k: revenue desc then custkey — and revenue itself is the exact
    * BIGINT [[rev1e4]] sum, so the cut can't flip on a float ulp. */
  def returnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(rev1e4) / 10000.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
  }

  /** TPC-H Q14 analog — promo revenue share by ship year. Parity note:
    * per-year groups are large enough (~10k rows, 4e8 magnitude) that a
    * rounded DOUBLE sum diverges by a cent between engines, so revenue
    * is summed EXACTLY as `cents·(100 − discount·100)` in BIGINT (both
    * factors are 2-decimal by construction) and divided by 1e4 once —
    * zero order dependence, the integer-cents discipline of the series
    * family applied to money. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(round(sum(when(col("p_type") === "PROMO", rev1e4)) / 10000.0, 2).as("promo_revenue"),
        round(sum(rev1e4) / 10000.0, 2).as("total_revenue"))
      .withColumn("promo_pct",
        round(lit(100) * col("promo_revenue") / col("total_revenue"), 6))
      .orderBy("ship_year")
  }

  /** TPC-H Q18 analog — large-volume orders: orders whose total quantity
    * exceeds the threshold, with their customer. The HAVING filter runs
    * on the first (order-keyed) aggregation, so only qualifying orders
    * ever join; quantities are integral doubles, so the sums (and the
    * BIGINT cast) are exact. */
  def bigOrders(spark: SparkSession, dir: String, minQty: Long = 300): DataFrame = {
    val qty = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").cast("long").as("order_qty"))
      .where(col("order_qty") > minQty)
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    qty.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("order_qty"))
      .orderBy(col("order_qty").desc, col("o_orderkey"))
  }

  /** TPC-H Q19 analog — disjunctive bracket revenue: three (brand, size
    * bracket, quantity bracket) arms OR'd together, the classic test
    * that an optimizer pushes a disjunction of conjunctions down to the
    * scans instead of cross-joining first. Single-row result. */
  def bracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    def arm(brand: String, sizeLo: Int, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(sizeLo, sizeHi) && col("l_quantity").between(qLo, qHi)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(arm("Brand#12", 1, 15, 1, 15) || arm("Brand#23", 10, 25, 10, 25) ||
        arm("Brand#34", 20, 35, 20, 35))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(rev1e4) / 10000.0, 2).as("revenue"))
  }

  /** Trailing 30-day spend per customer — the RANGE-frame window (frame
    * bounded by ORDER-BY VALUE, not row count) the rest of the surface's
    * `rowsBetween` windows don't exercise: same-day orders always share
    * one frame, so the result is tie-insensitive by construction. Cents
    * as BIGINT keep the window sums exact. One shuffle on the customer
    * key. */
  def trailingSpend(spark: SparkSession, dir: String, days: Int = 30): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"),
      // NTZ -> timestamp is wall-clock identity under the UTC session,
      // matching DuckDB's naive epoch()
      (col("o_orderdate").cast("timestamp").cast("long") / lit(86400L)).cast("long").as("day"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-days, 0)
    o.select(col("o_orderkey"), col("o_custkey"), col("day"),
        sum("cents").over(w).as("spend_30d_cents"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy("o_orderkey")
  }

  /** Explicit GROUPING SETS with per-column grouping flags — exercised
    * through `spark.sql` (the engine's one SQL-string entry point; the
    * DataFrame API has no grouping-sets verb). Per-set totals are exact
    * integer cents; the grouping() flags disambiguate real NULL groups
    * from superaggregate rows — the reason the flags, not the NULLs, are
    * part of the contract. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .createOrReplaceTempView("gs_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
                CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
                sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS price_cents,
                count(*) AS n_rows
         FROM gs_lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
  }

  /** Fuzzy entity resolution over the part-name dictionary: distinct
    * name pairs within edit distance 3 (excluding exact equals), with
    * each name's row support. The shape that scales: match the DISTINCT
    * dictionary (orders of magnitude smaller than the fact rows — the
    * distinct-then-verify contract of the dedup family), generate
    * candidates by TWO blocking passes (same first token ∪ same last
    * token — a transposition that changes both tokens at once is by
    * definition > 1 edit per token away, and multi-pass blocking is the
    * standard recall hedge), then verify with the codegen'd
    * `levenshtein`, whose unit-cost semantics DuckDB shares exactly.
    * Never an all-pairs name join. */
  def fuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select("p_name")
      .groupBy("p_name").agg(count(lit(1)).as("n_rows"))
      .withColumn("tok1", split(col("p_name"), " ").getItem(0))
      .withColumn("tok2", element_at(split(col("p_name"), " "), -1))
    def block(tok: String): DataFrame =
      names.select(col("p_name").as("name_a"), col(tok).as("b"))
        .join(names.select(col("p_name").as("name_b"), col(tok).as("b")), "b")
        .where(col("name_a") < col("name_b"))
        .select("name_a", "name_b")
    val cand = block("tok1").union(block("tok2")).distinct()
    val supports = names.select("p_name", "n_rows")
    cand
      // cast: levenshtein is IntegerType; the oracle compare needs BIGINT
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") >= 1 && col("dist") <= 3)
      .join(supports.withColumnRenamed("p_name", "name_a")
        .withColumnRenamed("n_rows", "n_a"), "name_a")
      .join(supports.withColumnRenamed("p_name", "name_b")
        .withColumnRenamed("n_rows", "n_b"), "name_b")
      .select("name_a", "name_b", "dist", "n_a", "n_b")
      .orderBy("name_a", "name_b")
  }

  /** TPC-H Q8 analog — national market share: of all STANDARD-part
    * revenue sold to customers in region EUROPE, the share supplied by
    * one nation, per order year. Eight-way join where only
    * lineitem⋈orders shuffles: part/customer/supplier/nation/region are
    * dimensions and broadcast (customer restricted to the region FIRST,
    * so the broadcast side is pre-shrunk). Share = BIGINT/BIGINT cents
    * sums in one IEEE division, so the ratio is summation-order-free. */
  def marketShare(spark: SparkSession, dir: String,
      region: String = "EUROPE", nation: String = "NATION_3",
      ptype: String = "STANDARD"): DataFrame = {
    val regionCust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir).where(col("r_name") === region)
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val stdPart = Tables.part(spark, dir)
      .where(col("p_type") === ptype).select("p_partkey")
    val suppNation = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(broadcast(stdPart), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === nation, rev1e4).otherwise(0L)).as("nat1e4"),
        sum(rev1e4).as("all1e4"))
      .select(col("o_year"),
        round(col("nat1e4").cast("double") / col("all1e4").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 analog — product-line profit by supplier nation and order
    * year. The driver schema has no partsupp, so unit cost is proxied by
    * the public p_retailprice (documented adaptation; the join/agg shape
    * is Q9's). Profit is kept on the 1e-4-dollar BIGINT grid end to end:
    * rev1e4 − retail_cents·qty·100, summed exactly — and the final
    * 2-decimal rounding is ALSO integer (half-away-from-zero on the
    * grid, then one exact /100.0): `round(double, 2)` diverges between
    * engines on half-cent sums (Spark rounds the shortest decimal
    * rendering, DuckDB the binary value — a real 0.01 mismatch at
    * sf0.001), so no double ever gets rounded. */
  def nationProfit(spark: SparkSession, dir: String,
      nameToken: String = "widget"): DataFrame = {
    val parts = Tables.part(spark, dir)
      .where(col("p_name").contains(nameToken))
      .select("p_partkey", "p_retailprice")
    val suppNation = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "nation")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    val amount1e4 = rev1e4 -
      round(col("p_retailprice") * 100, 0).cast("long") *
      round(col("l_quantity"), 0).cast("long") * lit(100L)
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount1e4).as("s"))
      .select(col("nation"), col("o_year"),
        (when(col("s") >= 0, expr("(s + 50) div 100"))
          .otherwise(-expr("(-s + 50) div 100")) / 100.0).as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  /** TPC-H Q13 analog — customer distribution by order count, zeros
    * included. Shape note for 100 TB: customers are NOT a broadcastable
    * dimension here (the output is per-customer before the histogram),
    * so this is the one relational query that legitimately shuffles the
    * customer table — once, on c_custkey, against the pre-aggregated
    * order counts (orders collapse to ≤1 row per customer map-side
    * before the join). */
  def custOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir).select("o_custkey")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    Tables.customer(spark, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 analog — top supplier(s) by revenue in one quarter. The
    * max-revenue cut is a 1-row aggregate broadcast back over the
    * supplier revenues (the repo's scalar-frame pattern) and compares
    * BIGINT cents, so the winner can't flip on a float ulp. The shipdate
    * window is pushed to the parquet scan. */
  def topSupplier(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(from).cast("date") &&
             col("l_shipdate") < lit(until).cast("date"))
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .groupBy("l_suppkey").agg(sum(rev1e4).as("total1e4"))
    val best = rev.agg(max("total1e4").as("best1e4"))
    rev.join(broadcast(best), col("total1e4") === col("best1e4"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      // 2-decimal rounding stays on the integer grid (Q9 rule):
      // round(double, 2) diverges between engines on half-tie sums, so
      // the 1e-4-dollar total rounds half-up in BIGINT (total1e4 ≥ 0 —
      // prices positive, discount ≤ 100%) and only then divides once
      .select(col("s_suppkey"), col("s_name"),
        (expr("(total1e4 + 50) div 100") / 100.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17 analog — revenue that would be lost by dropping
    * small-quantity (< 20% of the part's average) line items of one
    * brand, per year. The classic correlated scalar subquery, decorrelated
    * the Spark-native way: one groupBy over the brand-filtered fact rows
    * produces (sum_qty, cnt) per part, rejoined to the same filtered
    * rows. The 20%-of-average cut is all-integer (qty·5·cnt < Σqty), so
    * both engines pick identical rows; the revenue sum is exact cents. */
  def smallQtyRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#23"): DataFrame = {
    val branded = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(Tables.part(spark, dir)
        .where(col("p_brand") === brand).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity"), 0).cast("long").as("qty"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("ext_c"))
    val perPart = branded.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    branded.join(perPart, col("l_partkey") === col("a_partkey"))
      .where(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
      .agg(sum("ext_c").as("s_c"), count(lit(1)).as("n_small"))
      // avg_yearly = round(Σcents/700, 2): half-up of Σcents/7 on the
      // BIGINT grid — (2s+7) div 14 = floor(s/7 + 1/2) for s ≥ 0 — then
      // one exact /100.0, so no double is ever rounded (Q9 rule)
      .select(
        (expr("(2 * s_c + 7) div 14") / 100.0).as("avg_yearly"),
        col("n_small"))
  }

  /** TPC-H Q22 analog — lapsed high-balance customers: above the
    * average positive account balance, with no order since the cutoff.
    * The driver schema has no phone country code, so the grouping key is
    * the nation (documented adaptation). The average-balance cut
    * compares bal_cents·cnt > Σcents — two BIGINTs, no float average —
    * and the recency probe is a left-anti join whose date filter reaches
    * the orders scan. */
  def lapsedHighBalance(spark: SparkSession, dir: String,
      since: String = "1999-01-01"): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_c"))
    // the average-balance cut is a driver-side scalar probe (the
    // quartile-cutoff precedent): ONE 1-row aggregate collect, then the
    // threshold is a literal — the balance filter reaches the customer
    // scan instead of riding a nested-loop join. Exact: both sides of
    // bal·cnt > Σ are BIGINTs.
    val pos = cust.where(col("bal_c") > 0)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("cnt"))
      .head()
    val (sumC, cnt) = (pos.getLong(0), pos.getLong(1))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(since).cast("date"))
      .select("o_custkey")
    cust.where(col("bal_c") * lit(cnt) > lit(sumC))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(count(lit(1)).as("numcust"),
        round(sum("bal_c") / 100.0, 2).as("totacctbal"))
      .orderBy("nation")
  }
}
