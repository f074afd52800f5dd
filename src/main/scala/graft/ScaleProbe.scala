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
      case _ => probeQuartiles(spark, n) & probeAsOf(spark, n)
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
