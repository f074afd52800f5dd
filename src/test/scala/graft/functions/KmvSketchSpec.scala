package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the native KMV distinct-count aggregate: exact set
  * semantics (the sketch IS the k smallest distinct hashes — the
  * property the DuckDB oracle replays serially), merge/partition
  * invariance, hash parity with the md5 column helpers, the estimator's
  * error bound at scale-ish cardinality, and null handling. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  private def sketchOf(df: org.apache.spark.sql.Dataset[String]): Seq[Long] =
    df.toDF("s").selectExpr(s"kmv_sketch(s, $k) AS m").head().getSeq[Long](0)

  test("JVM hash == Spark md5 column hash (the oracle parity root)") {
    val keys = Seq("0", "alpha", "käse", "", "the fast key")
    val viaCols = keys.toDF("s")
      .select(col("s"), Hashes.md5Long60(concat(lit("kmv:"), col("s"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { s =>
      assert(KmvSketch.hash60(s) == viaCols(s), s"hash mismatch for '$s'")
    }
  }

  test("the sketch is EXACTLY the k smallest distinct hashes, any partitioning") {
    val vals = (1 to 500).map(i => s"v$i") ++ (1 to 500).map(i => s"v$i") // dups
    val expect = vals.distinct.map(KmvSketch.hash60).sorted.take(k)
    Seq(1, 3, 17).foreach { np =>
      val got = sketchOf(spark.createDataset(vals).repartition(np))
      assert(got == expect, s"partitioning $np changed the sketch")
    }
  }

  test("below-k cardinality: the sketch is the full distinct hash set (exact count)") {
    val vals = (1 to 20).flatMap(i => Seq.fill(3)(s"x$i"))
    val got = sketchOf(spark.createDataset(vals))
    assert(got.size == 20)
    assert(got == vals.distinct.map(KmvSketch.hash60).sorted)
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    val withNull = Seq("a", null, "b").toDF("s")
      .selectExpr(s"kmv_sketch(s, $k) AS m").head().getSeq[Long](0)
    assert(withNull.size == 2)
    val empty = Seq.empty[String].toDF("s")
      .selectExpr(s"kmv_sketch(s, $k) AS m").head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("estimator error at 100k distinct values is within 5 standard errors") {
    // std err ~ 1/sqrt(k-2) ~ 12.7% at k=64; 5 sigma gives a
    // non-flaky deterministic bound (the hash is fixed, so this is a
    // one-time check of THIS hash's behavior, not a statistical test)
    val n = 100000
    val sk = sketchOf(spark.range(n).select(concat(lit("id"), col("id")).as("s")).as[String])
    assert(sk.size == k)
    val est = math.round((k - 1) * KmvSketch.Hash60Range / sk.last)
    val relErr = math.abs(est - n).toDouble / n
    info(f"KMV estimate $est vs $n true (rel err $relErr%.4f)")
    assert(relErr < 5.0 / math.sqrt(k - 2.0), f"rel err $relErr%.4f")
  }

  test("registered q_kmv_distinct: estimator fields are internally consistent") {
    val rows = graft.analytics.TextAnalysis
      .kmvDistinct(graft.Tables.documents(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, kept, est, errPm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(kept <= k)
      if (kept < k) assert(est == kept, "below-k sketches count exactly")
      assert(errPm == math.abs(est - exact) * 1000 / exact)
    }
  }
}
