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

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val spark = Sessions.local()
    import graft.analytics.Relational
    // deterministic synthetic spend: unique custkey, md5-derived 2-decimal
    // spend values (ties ARE present — md5 mod 1e6 collides across 10M
    // rows — exercising the tie-stable bucketing)
    val spend = spark.range(n).select(
      col("id").as("o_custkey"),
      (graft.functions.Hashes.md5Long60(col("id").cast("string")) % 1000000L)
        .cast("double").divide(100.0).as("total_spend"))
    def run(df: DataFrame): Double =
      timed(df.write.format("noop").mode("overwrite").save())._2
    // bucketed first (warm both arms equally is impossible in one JVM
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
    spark.stop()
    if (!agree) {
      System.err.println(s"[scaleprobe] MISMATCH bucketed=$fpB windowed=$fpW")
      sys.exit(1)
    }
  }
}
