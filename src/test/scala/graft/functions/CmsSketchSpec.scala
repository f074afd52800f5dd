package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the native Count-Min aggregate: the sketch contract
  * (over-count, bounded error), merge-order determinism, hash parity
  * with the engine-portable md5 column helpers, and null handling. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val d = 4
  private val w = 256

  private def matrixOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.selectExpr(s"cms_sketch(k, $d, $w) AS m").head().getSeq[Long](0)

  test("JVM bucket arithmetic == Spark md5 column hash (the oracle parity root)") {
    val keys = Seq("0", "17", "alpha", "käse", "")
    val viaCols = keys.toDF("k").select(
      col("k") +: (0 until d).map(j =>
        (Hashes.md5Long60Seeded(j, col("k")) % w).as(s"b$j")): _*)
      .collect().map(r => r.getString(0) -> (1 to d).map(i => r.getLong(i))).toMap
    keys.foreach { k =>
      (0 until d).foreach { j =>
        assert(CmsSketch.bucket(j, k, w).toLong == viaCols(k)(j),
          s"bucket mismatch key=$k j=$j")
      }
    }
  }

  test("sketch is partition-count invariant (merge order cannot matter)") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("k"))
    val m1 = matrixOf(ev.repartition(1))
    val m13 = matrixOf(ev.repartition(13))
    assert(m1.size == d * w && m1 == m13)
  }

  test("point estimates over-count and respect the eN/w bound on the corpus") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("k"))
    val m = matrixOf(ev)
    val exact = ev.groupBy("k").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    exact.foreach { case (k, truth) =>
      val est = (0 until d).map(j => m(j * w + CmsSketch.bucket(j, k, w))).min
      assert(est >= truth, s"CMS must never under-count: key $k est $est < $truth")
      // Pr[err > eN/w] <= e^-d ~= 1.8%/key; the margin below is 3x that
      // bound so a correct implementation fails it with ~0 probability
      assert(est - truth <= 3.0 * math.E * n / w,
        s"key $k: error ${est - truth} implausible for N=$n w=$w")
    }
    // total mass per matrix row is exactly N (every row counts every item)
    (0 until d).foreach { j =>
      assert((0 until w).map(b => m(j * w + b)).sum == n)
    }
  }

  test("streaming: the sketch maintains incrementally across micro-batches") {
    // commutative merges make the aggregate streaming-ready with no
    // extra code: the final matrix after N micro-batches must equal the
    // batch matrix over the union of all inputs
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[String]
    val name = s"cms_stream_${System.nanoTime()}"
    val q = ms.toDS().toDF("k")
      .selectExpr(s"cms_sketch(k, $d, $w) AS m")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    val batch1 = Seq("a", "b", "a", "c")
    val batch2 = Seq("b", "d", "a")
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).head().getSeq[Long](0)
    val batch = matrixOf((batch1 ++ batch2).toDF("k"))
    assert(streamed == batch)
  }

  test("nulls are not counted") {
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val m = matrixOf(df)
    assert(m.sum == 3L * d, "3 non-null rows x d rows of the matrix")
  }
}
