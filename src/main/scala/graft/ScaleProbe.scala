package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical scale probe for the global-rank family — the round-6 claim
  * that the bucketed exact-rank quartiles survive a customer dimension
  * the single-window form serializes on, demonstrated on SYNTHETIC data
  * orders of magnitude past the driver's sf0.1 (~1.5k customers):
  *
  *   sbt 'runMain graft.ScaleProbe [nCustomers]'     (default 10,000,000)
  *
  * Generates an already-aggregated (o_custkey, total_spend) frame with
  * `spark.range` (deterministic md5-derived spend, unique ordering key),
  * runs BOTH forms through the noop sink, prints one JSON line with
  * wall times, and cross-checks the results with an order-insensitive
  * aggregate fingerprint (sum over custkey·quartile plus the rank
  * moments — any rank divergence on any row disturbs it). The windowed
  * arm is the known scale-killer: every row through ONE partition; at
  * the default size it still completes on local[32], but the gap (and
  * the single 10M-row sort partition in its plan) is the evidence.
  */
object ScaleProbe {

  // exact-integer moments: the per-row ranks are 6-dp-rounded, so x1e6
  // they are integral — a LONG sum is order-insensitive where a double
  // sum would pick up plan-dependent ulp noise
  private def fingerprint(df: DataFrame): (Long, Long, Long) = {
    val r = df.agg(
      sum(col("o_custkey") * col("quartile")).cast("long"),
      sum(round(col("pct_rank") * 1e6, 0).cast("long")),
      sum(round(col("cume") * 1e6, 0).cast("long"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def run(df: DataFrame): Double =
    timed(df.write.format("noop").mode("overwrite").save())._2

  private def probeQuartiles(spark: org.apache.spark.sql.SparkSession, n: Long): Boolean = {
    import graft.analytics.Relational
    // deterministic synthetic spend: unique custkey, md5-derived 2-decimal
    // spend values (ties ARE present — md5 mod 1e6 collides across 10M
    // rows — exercising the tie-stable bucketing)
    val spend = spark.range(n).select(
      col("id").as("o_custkey"),
      (graft.functions.Hashes.md5Long60(col("id").cast("string")) % 1000000L)
        .cast("double").divide(100.0).as("total_spend"))
    // bucketed first (warming both arms equally is impossible in one JVM
    // order; bucketed-first UNDER-warms the arm we advocate, so the gap
    // it reports is conservative)
    val tBucketed = run(Relational.quartilesBucketed(spend, buckets = 64))
    spark.sharedState.cacheManager.clearCache()
    val tWindowed = run(Relational.quartilesWindowed(spend))
    val (fpB, _) = timed(fingerprint(Relational.quartilesBucketed(spend, 64)))
    spark.sharedState.cacheManager.clearCache()
    val (fpW, _) = timed(fingerprint(Relational.quartilesWindowed(spend)))
    val agree = fpB == fpW
    println(s"""{"probe":"quartiles","n":$n,"bucketed_sec":${f"$tBucketed%.1f"},""" +
      s""""windowed_sec":${f"$tWindowed%.1f"},"fingerprints_agree":$agree}""")
    if (!agree) System.err.println(s"[scaleprobe] MISMATCH bucketed=$fpB windowed=$fpW")
    agree
  }

  /** Native as-of merge join vs the composed union+window form at
    * synthetic tick volume: `n` left ticks against n/2 right quotes over
    * a realistic key cardinality (~1000 ticks per key — instrument/user
    * keys number in the thousands-to-millions in any real as-of
    * workload), epoch-micro long times, rval tiebreak pinning equal-time
    * determinism on both arms (md5 times DO collide at these volumes).
    * The structural claim under test: no union materialization, no
    * whole-partition window carry — one sorted merge per key group. */
  private def probeAsOf(spark: org.apache.spark.sql.SparkSession, n: Long): Boolean = {
    import graft.operators.AlignJoin
    import graft.plans.AsOfNative
    val tickers = math.max(8L, n / 1000L)
    // realistic ROW WIDTH on both sides (a tick/quote carries more than
    // one value column): the composed form's union shuffles every row at
    // the COMBINED width (left columns null-padded onto right rows and
    // vice versa), which is its dominating cost at scale; the native
    // merge shuffles each side at its own width
    def frame(rows: Long, valName: String, pads: Int): DataFrame = {
      val base = spark.range(rows).select(
        concat(lit("T"), (col("id") % tickers).cast("string")).as("ticker"),
        (graft.functions.Hashes.md5Long60(col("id").cast("string")) % 1000000000000L).as("t"),
        col("id").as(valName))
      (1 to pads).foldLeft(base)((df, i) => df.withColumn(s"${valName}_p$i", col(valName) + i))
    }
    val left = frame(n, "lval", pads = 6)
    val right = frame(n / 2, "rval", pads = 3).withColumnRenamed("t", "rt")
    val carry = Seq("rval", "rval_p1", "rval_p2", "rval_p3")
    def composed = AlignJoin.asOfJoin(left, right, Seq("ticker"), "t", "rt",
      carry, rightTiebreak = Seq("rval"))
    def native = AsOfNative.asOfJoin(left, right, Seq("ticker"), "t", "rt",
      carry, rightTiebreak = Seq("rval"))
    def fp(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), count(col("asof_rval")),
        sum(coalesce(col("asof_rval"), lit(-1L))).cast("long")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val tNative = run(native)
    val tComposed = run(composed)
    val (fpN, _) = timed(fp(native))
    val (fpC, _) = timed(fp(composed))
    val agree = fpN == fpC
    println(s"""{"probe":"asof","n":$n,"native_sec":${f"$tNative%.1f"},""" +
      s""""composed_sec":${f"$tComposed%.1f"},"fingerprints_agree":$agree}""")
    if (!agree) System.err.println(s"[scaleprobe] MISMATCH native=$fpN composed=$fpC")
    agree
  }

  /** Cluster-resolution probe: `dupClusters` past the 2^20-edge driver
    * fast path — the round-7 arm evidencing the distributed path-halving
    * rounds the way the other arms evidenced the bucketed quartiles and
    * the native as-of merge. Deterministic synthetic graph over `n`
    * nodes: ids < 65536 form ONE chain (diameter 65535 — ~11 halving
    * rounds at triple-jump coverage, the log-diameter claim under test),
    * the rest form 16-node chain blocks (~15n/16 edges of realistic
    * near-dup clusters). Both arms run the SAME operator; only
    * `localEdgeLimit` differs (MaxValue forces the driver union-find
    * oracle, 0 forces the distributed rounds). Parity via a bounded
    * integer fingerprint: any keeper divergence on any node disturbs the
    * mod-sum with near-certainty, and keeper counts/extremes pin the
    * cluster structure. */
  private def probeClusters(spark: org.apache.spark.sql.SparkSession, n: Long): Boolean = {
    import graft.analytics.Dedup
    val longChain = 65536L
    require(n > longChain, s"clusters probe needs n > $longChain")
    val docs = spark.range(n).select(col("id").as("doc_id"))
    def pairs = spark.range(n - 1)
      .where((col("id") % 16 =!= 15) || (col("id") < longChain - 1))
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val nPairs = pairs.count()
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        // per-row value < 1e6 so the 10M-row sum stays far inside a long
        sum((col("doc_id") * 31 + col("keeper")) % 1000003L),
        count_distinct(col("keeper")),
        sum(col("keeper") % 1000003L)).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // time CONSTRUCTION + execution together: unlike the other arms,
    // dupClusters runs its work (collect+union-find, or the iterative
    // rounds) EAGERLY while building the result frame — timing only the
    // final noop write would credit the distributed arm with ~nothing
    def buildAndRun(mk: => org.apache.spark.sql.DataFrame): Double =
      timed(mk.write.format("noop").mode("overwrite").save())._2
    // distributed rounds first: the union-find arm is the ORACLE here, so
    // under-warming the advocated arm keeps the reported gap conservative
    val tDist = buildAndRun(Dedup.dupClusters(docs, pairs, localEdgeLimit = 0L))
    spark.sharedState.cacheManager.clearCache()
    val tLocal = buildAndRun(Dedup.dupClusters(docs, pairs, localEdgeLimit = Long.MaxValue))
    spark.sharedState.cacheManager.clearCache()
    val (fpD, _) = timed(fp(Dedup.dupClusters(docs, pairs, localEdgeLimit = 0L)))
    spark.sharedState.cacheManager.clearCache()
    val (fpL, _) = timed(fp(Dedup.dupClusters(docs, pairs, localEdgeLimit = Long.MaxValue)))
    val agree = fpD == fpL
    println(s"""{"probe":"clusters","n":$n,"pairs":$nPairs,""" +
      s""""distributed_sec":${f"$tDist%.1f"},"local_sec":${f"$tLocal%.1f"},""" +
      s""""fingerprints_agree":$agree}""")
    if (!agree) System.err.println(s"[scaleprobe] MISMATCH distributed=$fpD local=$fpL")
    agree
  }

  def main(args: Array[String]): Unit = {
    val (which, n) = args.toList match {
      case name :: num :: _ => (name, num.toLong)
      case num :: Nil if num.forall(_.isDigit) => ("all", num.toLong)
      case name :: Nil => (name, 10000000L)
      case Nil => ("all", 10000000L)
    }
    val spark = Sessions.local()
    val ok = which match {
      case "quartiles" => probeQuartiles(spark, n)
      case "asof" => probeAsOf(spark, n)
      case "clusters" => probeClusters(spark, n)
      case _ => probeQuartiles(spark, n) & probeAsOf(spark, n) & probeClusters(spark, n)
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
