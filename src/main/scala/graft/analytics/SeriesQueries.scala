package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AlignJoin, Metrics, SeqWindows, TickOps}

/** The reference pipeline's operator surface (SURVEY.md §2) exercised as
  * deterministic batch queries over the driver's `events` table — the
  * oracle-checkable face of [[graft.operators]].
  *
  * `events.value` plays the price series, `user_id` the ticker key (the
  * generalization SURVEY §4 calls for), `(ts_ns, event_id)` the arrival
  * order. Everything partitions by user — one hash shuffle, then per-key
  * window passes; scales linearly in keys on a cluster.
  */
object SeriesQueries {

  private val keys = Seq("user_id")
  private val order = Seq("ts_us", "event_id")

  /** TR-1 — consecutive-change filter per user. */
  def changeFilter(spark: SparkSession, dir: String): DataFrame =
    TickOps.changeFilter(
        Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value"),
        keys, order, "value")
      .select("user_id", "event_id", "value")

  /** TR-2 — anchored return per user (variation vs first-ever value). */
  def anchoredReturn(spark: SparkSession, dir: String): DataFrame =
    TickOps.anchoredReturn(
        Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value"),
        keys, order, "value")
      .select(col("user_id"), col("event_id"), round(col("variation"), 6).as("variation"))

  /** NRM-1 — global min-max scaling of the value column. */
  def minMaxScale(spark: SparkSession, dir: String): DataFrame =
    TickOps.minMaxScale(
        Tables.events(spark, dir).select("event_id", "value"), "value")
      .select(col("event_id"), round(col("scaled"), 6).as("scaled"))

  /** WIN-1 — sliding 10-lag/5-label feature extraction per user,
    * flattened to scalar columns (f01..f10, l1..l5) for oracle parity. */
  def slidingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val samples = SeqWindows.slidingSamples(
      Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value"),
      keys, order, "value", seqLen = 10, horizon = 5)
    val fcols = (1 to 10).map(i => element_at(col("features"), i).as(f"f$i%02d"))
    val lcols = (1 to 5).map(i => element_at(col("labels"), i).as(s"l$i"))
    samples.select(Seq(col("user_id"), col("event_id")) ++ fcols ++ lcols: _*)
  }

  /** WIN-2 — the last 10 events per user, tagged with window position. */
  def latestWindow(spark: SparkSession, dir: String): DataFrame =
    SeqWindows.latestRows(
        Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value"),
        keys, order, seqLen = 10)
      .select("user_id", "pos", "event_id", "value")

  /** JN-1 — FIFO rank join: k-th purchase pairs with k-th view per user
    * (the reference's queue-order forecast/actual alignment). */
  def fifoRankJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("f_event_id"),
        col("value").as("f_value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("a_event_id"),
        col("value").as("a_value"))
    AlignJoin.rankJoin(purchases, views, keys,
        Seq("ts_us", "f_event_id"), Seq("ts_us", "a_event_id"))
      .select("user_id", "f_event_id", "f_value", "a_event_id", "a_value")
  }

  /** As-of join — each purchase picks up the latest prior-or-equal view
    * value for the same user (the principled JN-1 variant, SURVEY §2.6). */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts_us"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    AlignJoin.asOfJoin(purchases, views, keys, "ts_us", "v_ts_us", Seq("v_value"),
        rightTiebreak = Seq("v_event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("asof_v_value").as("last_view_value"))
  }

  /** The as-of join again, through the custom whole-operator plan
    * ([[graft.plans.AsOfNative]] → `AsOfJoinNode`/`AsOfMergeJoinExec`):
    * result-identical to [[asOfJoin]] (same oracle), but planned as one
    * sorted merge pass per co-partitioned key group — no union, no
    * window buffer. The two queries sharing one oracle IS the test that
    * the custom operator preserves the composed operator's semantics
    * under the driver's hash gate. */
  def asOfJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts_us"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    graft.plans.AsOfNative.asOfJoin(purchases, views, keys, "ts_us", "v_ts_us",
        Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("asof_v_value").as("last_view_value"))
  }

  /** FORWARD as-of through the custom plan
    * ([[graft.plans.AsOfNative.asOfJoinForward]]): for each purchase,
    * the NEXT view value at-or-after its timestamp per user — the
    * event-time lookahead shape ("what did the user see right after
    * buying"), merge_asof direction='forward'. Time negation maps it
    * onto the same merge exec as jn4; equal-time ties keep the largest
    * view event_id, the jn2/jn4 convention. */
  def asOfJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts_us"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    graft.plans.AsOfNative.asOfJoinForward(purchases, views, keys, "ts_us", "v_ts_us",
        Seq("v_value"), rightTiebreak = Seq("v_event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("asof_v_value").as("next_view_value"))
      .orderBy("user_id", "event_id")
  }

  /** WINDOWED funnel (`q_window_funnel` — ClickHouse `windowFunnel`
    * semantics): per user, the deepest view→click→purchase chain whose
    * steps are each STRICTLY later than the previous and whose last step
    * lands within `windowUs` of the chain's FIRST event; every view is a
    * candidate anchor. Greedy earliest-next-step from each anchor is
    * exact for the exists-a-chain semantics: the earliest qualifying
    * click leaves maximal room for the purchase, so per-anchor depth =
    * 1 + [t2 ≤ t1+W] + [t2 ≤ t1+W ∧ t3 ≤ t1+W] with t2/t3 the earliest
    * strictly-later next-step times.
    *
    * Spark-first shape: "earliest event strictly after t" is the FORWARD
    * as-of join — each funnel stage is one pass through the custom merge
    * exec ([[graft.plans.AsOfNative.asOfJoinForward]], probe time t+1µs
    * for strictness) instead of ClickHouse's dedicated aggregate: two
    * key-shuffles total, no per-user event buffering, and the chain
    * stages pipeline. Output: (user_id, n_views, depth). */
  def windowFunnel(spark: SparkSession, dir: String,
                   windowUs: Long = 21600000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_type"))
    def stage(name: String) = ev.where(col("event_type") === name)
    val anchors = stage("view")
      .select(col("user_id"), (col("ts_us") + 1).as("probe"), col("ts_us").as("t1"))
    val clicks = stage("click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("ts_us").as("c_pay"))
    val s2 = graft.plans.AsOfNative.asOfJoinForward(
        anchors, clicks, keys, "probe", "c_ts", Seq("c_pay"))
      .select(col("user_id"), col("t1"), col("asof_c_pay").as("t2"))
    val withClick = s2.where(col("t2").isNotNull)
      .select(col("user_id"), col("t1"), col("t2"), (col("t2") + 1).as("probe"))
    val purchases = stage("purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"), col("ts_us").as("p_pay"))
    val s3 = graft.plans.AsOfNative.asOfJoinForward(
        withClick, purchases, keys, "probe", "p_ts", Seq("p_pay"))
      .select(col("user_id"), col("t1"), col("t2"), col("asof_p_pay").as("t3"))
      .unionByName(s2.where(col("t2").isNull).withColumn("t3", lit(null).cast("long")))
    s3.withColumn("depth",
        when(col("t2").isNotNull && col("t2") <= col("t1") + windowUs,
          when(col("t3").isNotNull && col("t3") <= col("t1") + windowUs, 3L)
            .otherwise(2L))
          .otherwise(1L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_views"), max("depth").as("depth"))
      .orderBy("user_id")
  }

  /** As-of join with a 1-hour tolerance (pandas merge_asof's `tolerance`):
    * a matched view older than an hour before the purchase is nulled out —
    * the staleness bound every real market-data as-of join needs. */
  def asOfJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts_us"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    AlignJoin.asOfJoin(purchases, views, keys, "ts_us", "v_ts_us", Seq("v_value"),
        rightTiebreak = Seq("v_event_id"), tolerance = Some(3600000000L)) // 1h in µs
      .select(col("user_id"), col("event_id"), col("value"),
        col("asof_v_value").as("view_value_1h"))
  }

  /** AGG-2 — RMSE of the one-step persistence forecast (prev value),
    * grouped per user, demonstrating the cumulative error aggregate. */
  def persistenceRmse(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val withPrev = Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "value")
      .withColumn("prev", lag(col("value"), 1).over(w))
    Metrics.rmse(withPrev, "value", "prev", keys)
      .select(col("user_id"), round(col("rmse"), 4).as("rmse"))
  }

  /** AGG-3/5 — min/max/avg summary of the value series per event type. */
  def valueSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select("event_type", "value")
      .groupBy("event_type")
      .agg(min("value").as("min_value"), max("value").as("max_value"),
        round(avg("value"), 4).as("avg_value"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** SRC-2 — JSON path extraction from the events `props` payload (the
    * Yahoo-chart-payload analog), aggregated per extracted key bucket. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("value"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("k_bucket")

  /** Event-time tumbling window aggregate (hourly) per event type —
    * the time-window operator the reference lacks (processing-time only)
    * but a Spark-native engine must expose. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("value"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Sliding event-time rollup — Spark's built-in `window(ts, length,
    * slide)` in batch: each event lands in length/slide = 3 epoch-aligned
    * hourly windows (the overlap trend view `hourlyRollup`'s tumbling
    * windows can't express). Values summed as exact integer cents, so
    * the overlap replication in the DuckDB mirror (explode 3 window
    * starts per event) is bit-identical. */
  def slidingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("ts"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(window(col("ts"), "3 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum("cents") / 100.0).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws_us", "event_type")

  /** Gap-based sessionization (30-min inactivity) via windows, reduced to
    * one row per session with its event count and inclusive µs extent —
    * the shared base of [[sessionize]] and the interval side of
    * [[activeSessions]]. */
  def sessionBounds(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val gapUs = 30L * 60 * 1000 * 1000 // 30 min in µs (µs parity with the oracle)
    Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "value")
      .withColumn("new_session",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1)
          .otherwise(when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
  }

  /** Gap-based sessionization (30-min inactivity) via windows — session
    * count/extent per user. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionBounds(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        // integer div: µs diffs stay exact; matches DuckDB's µs timestamps
        expr("(end_us - start_us) div 1000000").as("duration_sec"))
      .orderBy("user_id", "session_id")

  /** Regular-grid resample with forward fill — the reindex/ffill step a
    * timeseries store runs before aligning irregular ticks to a model's
    * fixed cadence. Per key: the hourly grid spans floor(min ts) to
    * max ts (grid fan-out = span/step per key, bounded by the key's own
    * extent, never corpus size), and each grid instant takes the latest
    * observation at-or-before it via [[graft.operators.AlignJoin.asOfJoin]]
    * — one shuffle on the key, no range-join explosion. Grid points
    * before a key's first observation stay NULL (no fabricated values).
    * The observed value is carried verbatim (no arithmetic), so the
    * result hash-matches DuckDB's native ASOF LEFT JOIN exactly. */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val step = 3600L * 1000 * 1000 // 1h in µs
    val ev = Tables.events(spark, dir).select("user_id", "ts_us", "event_id", "value")
    val grid = ev.groupBy("user_id")
      .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      .select(col("user_id"),
        explode(expr(s"sequence((lo div ${step}L) * ${step}L, hi, ${step}L)")).as("grid_ts"))
    graft.operators.AlignJoin
      .asOfJoin(grid, ev, Seq("user_id"), "grid_ts", "ts_us", Seq("value"),
        rightTiebreak = Seq("event_id"))
      .select(col("user_id"), col("grid_ts"), col("asof_value").as("value_ffill"))
      .orderBy("user_id", "grid_ts")
  }

  /** Per-key outlier flagging — the data-quality gate a tick pipeline
    * runs before training on a series: an observation deviating from its
    * key's mean by more than 3 mean-absolute-deviations is flagged.
    * All arithmetic is exact-integer so the flag is bit-identical
    * cross-engine: with cents c_i = round(100·v_i), n and S = Σc_i,
    *   |v − μ| > 3·MAD  ⇔  |c·n − S| · n > 3 · Σ_j |c_j·n − S|
    * (both sides BIGINT; magnitudes stay under 2^63 far past corpus
    * scale — c ~ 1e4, n per key ~ 1e6 ⇒ lhs ~ 1e16). Two aggregation
    * passes on the key (mean terms, then deviation sum) + one join —
    * three shuffles total, each on user_id, no window over the corpus. */
  def tsOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val stats = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val withDev = ev.join(stats, "user_id")
      .withColumn("dev", abs(col("cents") * col("n") - col("s")))
    val madSum = withDev.groupBy("user_id")
      .agg(sum("dev").as("dev_sum"))
    withDev.join(madSum, "user_id")
      .where(col("dev") * col("n") > lit(3) * col("dev_sum"))
      .select(col("user_id"), col("event_id"),
        (col("cents") / 100.0).as("value"),
        col("dev").as("dev_scaled"), col("n"))
      .orderBy("user_id", "event_id")
  }

  /** Concurrency join: for each purchase event, how many sessions (across
    * ALL users) were active at its instant — a point-in-interval join that
    * a naive `BETWEEN` predicate would plan as an all-pairs nested loop.
    * Runs through [[graft.operators.RangeJoin.pointInInterval]]: sessions
    * explode to the 30-min time buckets they overlap, purchases hash-join
    * on their single bucket, and the exact containment filter runs on the
    * joined pairs only. */
  def activeSessions(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select("event_id", "ts_us")
    val sessions = sessionBounds(spark, dir).select("start_us", "end_us")
    // bucket width = the session gap: sessions are gap-bounded, so the
    // typical extent is a small multiple of it — O(1) fan-out per session
    graft.operators.RangeJoin
      .pointInInterval(purchases, sessions, "ts_us", "start_us", "end_us",
        bucketWidth = 30L * 60 * 1000 * 1000)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("event_id")
  }

  /** Session concurrency — for every session, how many OTHER sessions
    * (any user) overlap it in time: the interval-overlap self-join shape
    * (capacity planning / concurrency analytics), executed through
    * [[graft.operators.RangeJoin.intervalOverlap]]'s canonical-bucket
    * decomposition so each overlapping pair is produced exactly once
    * with NO pair-level dedup shuffle — the naive `a.lo <= b.hi AND
    * b.lo <= a.hi` θ-join is a nested-loop product at scale. Zero-overlap
    * sessions are kept via a left join back onto the session frame
    * (count of a nullable side mirrors SQL's LEFT JOIN + count(col)). */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionBounds(spark, dir)
      .select("user_id", "session_id", "start_us", "end_us")
    val a = s.select(col("user_id").as("a_user"), col("session_id").as("a_sid"),
      col("start_us").as("a_lo"), col("end_us").as("a_hi"))
    val b = s.select(col("user_id").as("b_user"), col("session_id").as("b_sid"),
      col("start_us").as("b_lo"), col("end_us").as("b_hi"))
    val counts = graft.operators.RangeJoin
      .intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 30L * 60 * 1000 * 1000)
      .where(!(col("a_user") === col("b_user") && col("a_sid") === col("b_sid")))
      .groupBy("a_user", "a_sid")
      .agg(count(lit(1)).as("n_concurrent"))
    s.join(counts,
        col("user_id") === col("a_user") && col("session_id") === col("a_sid"),
        "left")
      .select(col("user_id"), col("session_id"),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
      .orderBy("user_id", "session_id")
  }

  /** Deterministic EWMA (α = 1/4) over the trailing 10 observations per
    * key — the smoothing pass a tick store exposes next to the raw series
    * (the bounded-window form: at 100 TB an unbounded recurrence would
    * chain every row to the key's full history; 10 taps is where the
    * α=0.25 weight decays below 1e-1 of a tap anyway, 0.75^9 ≈ 0.075).
    *
    * Cross-engine bit parity: the window values are collected in frame
    * order (one per-key window pass) and folded LEFT with the exact
    * recurrence `acc·0.75 + x·0.25` — over integer cents with dyadic
    * weights every fold step is EXACT in double (value·2^18 ≪ 2^53), so
    * Spark's `aggregate` and DuckDB's `list_reduce` don't merely agree to
    * a tolerance, they produce the same dyadic rational bit-for-bit, and
    * NO rounding is applied (a round() at a decimal tie is exactly where
    * half-up-on-binary engines diverge). Both fold from the window's
    * first element as init. */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(-9, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").cast("double").as("cents"))
      .withColumn("arr", collect_list("cents").over(w))
      .select(col("user_id"), col("event_id"),
        expr("aggregate(slice(arr, 2, 9), element_at(arr, 1)," +
          " (acc, x) -> acc * 0.75D + x * 0.25D) / 100.0D").as("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** Lag-1 autocorrelation per key — the "is this series signal or noise"
    * screen a forecasting pipeline runs before spending a model fit on a
    * key. All five sufficient statistics are EXACT BIGINT sums over
    * integer cents (x·y ≲ 2^32·cents² per row; the documented envelope is
    * cents ≤ ~10^6 and rows/key ≤ ~10^6, keeping n·Σxy < 2^63), so the
    * final Pearson formula is one double expression over integers both
    * engines share bit-for-bit. One window pass for the lead, one
    * aggregation shuffle on the key — no corpus-wide sort. Keys with a
    * constant series (zero variance) are excluded on BOTH sides rather
    * than risk ±Inf/NULL division divergence. */
  def lagAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("x"))
      .withColumn("y", lead("x", 1).over(w))
      .where(col("y").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .where(col("vx") > 0 && col("vy") > 0)
      .select(col("user_id"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(col("vx").cast("double") * col("vy").cast("double")), 6).as("r"))
      .orderBy("user_id")
  }

  /** OHLC bar resampling — the finance-native downsample of the
    * reference's tick domain (pandas `resample().ohlc()`): per (user,
    * daily bar) the OPEN (value at the earliest (ts, id)), HIGH, LOW,
    * CLOSE (latest), tick count, and the exact cent sum (vwap-style mean
    * = sum_c / n_ticks, left to the consumer so every output stays an
    * exact integer).
    *
    * Open/close use `min_by`/`max_by` on a zero-padded "(ts_us,
    * event_id)" string key — a TOTAL order even under timestamp
    * collisions, so the bars are engine- and partitioning-deterministic
    * (first/last over an arbitrary-order shuffle are not). DuckDB
    * mirrors with `arg_min`/`arg_max` on the identical printf key.
    *
    * Scale: ONE map-side-combined aggregation keyed (user, bar) — the
    * min_by/max_by partials carry one (key, value) pair each, so the
    * shuffle is bar-count rows regardless of tick volume; no window, no
    * self-join. */
  def ohlcBars(spark: SparkSession, dir: String,
               barUs: Long = 86400000000L): DataFrame = {
    val key = format_string("%020d:%020d", col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("bar", expr(s"ts_us div $barUs"))
      .groupBy("user_id", "bar")
      .agg(
        min_by(col("cents"), key).as("open_c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        max_by(col("cents"), key).as("close_c"),
        count(lit(1)).as("n_ticks"),
        sum(col("cents")).as("sum_c"))
      .orderBy("user_id", "bar")
  }

  /** Hour-of-day seasonal profile per key — the seasonality screen beside
    * [[lagAutocorr]]'s autocorrelation one: per (user, hour-of-day
    * phase) the observation count, phase mean, and the phase's deviation
    * from the user's overall mean (the additive seasonal index — what a
    * decomposition subtracts before fitting trend). Phases are integer
    * µs arithmetic (`ts_us div 3600000000 mod 24`); sufficient
    * statistics are EXACT BIGINT cent sums.
    *
    * Both outputs stay ON THE INTEGER GRID (micro-value units,
    * value = µ/1e6) via floor-scaled exact rationals — `mean = s/(100n)`
    * becomes `s·10000 div n`, and the index's numerator `s·nu − su·n`
    * is BIGINT-exact before the one scaled division — because these
    * small-integer ratios land on decimal ties CONSTANTLY (unlike
    * cosines), and rounding a double at a decimal tie is exactly where
    * half-up-on-binary engines diverge (measured: 2/3365 rows flipped at
    * 6 dp before this formulation). Negative sums take sign·(abs div ·)
    * so truncate-vs-floor divergence can't bite either. Envelope:
    * |cents|·rows-per-user ≤ ~2^31 keeps |idx numerator|·10⁴ < 2^63.
    *
    * Scale shape: one map-side-combined aggregation to (user, phase) —
    * ≤24 rows per user — then a per-user rollup of THAT (24× smaller)
    * joined back; the events scan is touched once, never re-shuffled. */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("(ts_us div 3600000000) % 24").as("phase"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val byPhase = e.groupBy("user_id", "phase")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val byUser = byPhase.groupBy("user_id")
      .agg(sum("n").as("nu"), sum("s").as("su"))
    // no broadcast hint: byUser is one row per DISTINCT user — an
    // unbounded dimension at scale (r11 ADVICE). AQE picks broadcast
    // whenever the rollup is actually small; at 100 TB both sides
    // hash-join on the user key they are already aggregated by.
    byPhase.join(byUser, "user_id")
      .withColumn("idx_n", col("s") * col("nu") - col("su") * col("n"))
      .select(col("user_id"), col("phase"), col("n"),
        expr("(CASE WHEN s < 0 THEN -1L ELSE 1L END) * (abs(s) * 10000 div n)")
          .as("phase_mean_u"),
        expr("(CASE WHEN idx_n < 0 THEN -1L ELSE 1L END)" +
          " * (abs(idx_n) * 10000 div (n * nu))").as("idx_u"))
      .orderBy("user_id", "phase")
  }

  /** Trailing moving-average TREND + residual per key — the trend half
    * of the decomposition beside [[seasonalProfile]]'s seasonal half:
    * per event, the mean of the trailing 12 observations (a BOUNDED
    * frame — an unbounded trend would chain each row to its key's full
    * history, the same scale law as [[ewma]]'s 10 taps) and the event's
    * deviation from it. Exact throughout: the window SUM of cents is
    * BIGINT, `n` is the actual frame size (< 12 at a series head), the
    * residual numerator `cents·n − s` is BIGINT before the one scaled
    * division, and outputs are floor-scaled micro-units via
    * `sign·(abs div ·)` — the [[seasonalProfile]] discipline, because
    * small-integer ratios land on decimal ties constantly. One window
    * pass, one shuffle on the key. */
  def trendProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(-11, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("s", sum("cents").over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("dev_n", col("cents") * col("n") - col("s"))
      .select(col("user_id"), col("event_id"), col("n"),
        expr("(CASE WHEN s < 0 THEN -1L ELSE 1L END) * (abs(s) * 10000 div n)")
          .as("trend_u"),
        expr("(CASE WHEN dev_n < 0 THEN -1L ELSE 1L END)" +
          " * (abs(dev_n) * 10000 div n)").as("resid_u"))
      .orderBy("user_id", "event_id")
  }

  /** Ordered conversion funnel view → click → purchase with first-
    * occurrence semantics: a user converts at a stage only via an event
    * STRICTLY AFTER their previous stage's first qualifying event (the
    * analysis `sessionize` can't express — order across types, not
    * within one). Three min-aggregates and two joins, all keyed on
    * user_id — filters reach the scan, nothing shuffles more than the
    * per-stage user set, and stage latencies are exact integer-µs
    * averages (BIGINT sum div count). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts_us")
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val c = e.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts_us") > col("t_view"))
      .groupBy("user_id", "t_view").agg(min("ts_us").as("t_click"))
    val p = e.where(col("event_type") === "purchase")
      .join(c.select("user_id", "t_click"), "user_id")
      .where(col("ts_us") > col("t_click"))
      .groupBy("user_id", "t_click").agg(min("ts_us").as("t_purchase"))
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit("view").as("step"), col("n_users"),
        lit(null).cast("long").as("avg_us_from_prev"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
        expr("sum(t_click - t_view) div count(1)").as("avg_us_from_prev"))
      .select(lit(2L).as("stage"), lit("click").as("step"), col("n_users"),
        col("avg_us_from_prev"))
    val s3 = p.agg(count(lit(1)).as("n_users"),
        expr("sum(t_purchase - t_click) div count(1)").as("avg_us_from_prev"))
      .select(lit(3L).as("stage"), lit("purchase").as("step"), col("n_users"),
        col("avg_us_from_prev"))
    s1.unionByName(s2).unionByName(s3).orderBy("stage")
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences: for each (from, to) pair, the transition count and its
    * row-normalized probability — the session-flow fingerprint behind
    * funnel design and bot detection. One per-key window pass for the
    * lag, one aggregation to the T×T matrix (25 rows here), then the
    * row normalization windows over the AGGREGATED frame partitioned by
    * `from_type` — never over the corpus. Probability is BIGINT/BIGINT
    * in one IEEE division, identical cross-engine without rounding. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val t = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    t.withColumn("p",
        col("n") / sum("n").over(Window.partitionBy("from_type")))
      .orderBy("from_type", "to_type")
  }

  /** Weekly cohort retention matrix — the product-analytics staple: users
    * cohorted by their first-activity epoch week, then for each
    * (cohort, week-offset) the count and fraction still active. One
    * shuffle on `user_id` does everything: the per-user aggregation
    * carries `min(week)` (the cohort) AND the distinct active weeks
    * (`collect_set` — bounded by weeks of history, not events), so the
    * classic cohort-to-activity self-join disappears. The matrix itself
    * is |weeks|² rows — driver-tiny at any corpus scale. Retention is one
    * BIGINT/BIGINT IEEE division — exact cross-engine. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_us div 604800000000").as("week"))
      .groupBy("user_id")
      .agg(min("week").as("cohort_week"), collect_set("week").as("weeks"))
    val active = perUser
      .select(col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = perUser.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    active.join(sizes, "cohort_week")
      .withColumn("retention", col("n_active") / col("cohort_size"))
      .select("cohort_week", "week_offset", "n_active", "cohort_size", "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** CUSUM changepoint scan per key — where did the level shift? For each
    * user the cumulative sum of mean-deviations is computed in EXACT
    * integer algebra (deviations scaled by n: `d_i = c_i·n − S` over
    * cents, so no division ever enters the running sum), and the row
    * maximizing |CUSUM| is the changepoint candidate. Shape: one key
    * aggregation for (S, n), a key-partitioned running-sum window, and a
    * key-partitioned rank — the join and both windows share the
    * `user_id` hash partitioning, so the whole scan is ONE shuffle of
    * (key, ts, cents) tuples. Scales linearly in keys. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val stats = ev.groupBy("user_id")
      .agg(sum("cents").as("s"), count(lit(1)).as("n"))
    val run = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = ev.join(stats, "user_id")
      .withColumn("cusum", sum(col("cents") * col("n") - col("s")).over(run))
    c.withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(abs(col("cusum")).desc, col("ts_us"), col("event_id"))))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("cp_event_id"),
        col("ts_us").as("cp_ts_us"), abs(col("cusum")).as("max_abs_cusum"), col("n"))
      .orderBy("user_id")
  }

  /** Count-Min-sketched per-key frequencies vs their exact counts — the
    * approximate-counting face of the engine, via the native
    * [[graft.functions.CmsSketch]] aggregate (one 4×256 counter matrix
    * per partition ships to the driver, never per-key rows). Estimates
    * are the classic `min_j M[j][h_j(key)]` probe, computed here for a
    * fixed probe set next to the exact aggregation so the over-count law
    * (est ≥ exact) is visible in the result itself. Counter addition is
    * commutative, so the sketch is merge-order-deterministic and — with
    * engine-portable md5 bucket hashes — fully DuckDB-oracle-able,
    * unlike merge-schedule-dependent heavy-hitter sketches. */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 256
    val ev = Tables.events(spark, dir)
    val sk = ev.select(col("user_id").cast("string").as("k"))
      .agg(expr(s"cms_sketch(k, $d, $w)").as("m"))
    val probes = ev.where(col("user_id") < 10)
      .groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    val est = (0 until d).map { j =>
      col("m").apply((lit(j.toLong * w) +
        graft.functions.Hashes.md5Long60Seeded(j, col("user_id").cast("string")) % w)
        .cast("int"))
    }
    probes.crossJoin(broadcast(sk))
      .withColumn("cms_est", least(est: _*))
      .select("user_id", "exact_n", "cms_est")
      .orderBy("user_id")
  }

  /** Hourly quartile bands (p25/p50/p75) per event type — the latency-
    * dashboard query every event pipeline serves. Exact interpolated
    * percentiles per (hour, type) group: affordable because each group
    * sorts only its own slice (≈ rows/3600/types at corpus scale), the
    * same contract as [[Relational.exactStats]]; the sketch alternative
    * for wide groups lives in [[Relational.approxStats]].
    *
    * Quartiles (not p95) deliberately: over integer cents the rank
    * position (n−1)·k/4 and the linear interpolation between two integer
    * order statistics are all EXACT dyadic arithmetic, so Spark's
    * percentile and DuckDB's quantile_cont — different formula shapes —
    * land on the identical double with NO rounding step to tie-break.
    * A 0.95 fraction is inexact in binary and breaks that guarantee. */
  def hourlyPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(cents, 0.25D) / 100.0D").as("p25"),
        expr("percentile(cents, 0.5D) / 100.0D").as("p50"),
        expr("percentile(cents, 0.75D) / 100.0D").as("p75"))
      .orderBy("hour", "event_type")
}
