package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for `emb_pca_power` — the matrix-free integer power iteration.
  * The DuckDB oracle pins cross-engine values; these pin (1) the
  * truncation semantics both engines rely on, (2) exact replay of the
  * whole recurrence from collected data, (3) actual CONVERGENCE on a
  * corpus with a real dominant direction (the property the fixed-round
  * contract is for). */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  private def tdiv(a: Long, b: Long): Long = a / b

  /** The integer recurrence, replayed locally. */
  private def localPower(c: Array[Array[Long]], rounds: Int, dims: Int): Array[Long] = {
    var v = Array.fill(dims)(1000000L)
    for (_ <- 1 to rounds) {
      val u = Array.fill(dims)(0L)
      c.foreach { row =>
        var s = 0L
        var k = 0
        while (k < dims) { s += row(k) * v(k); k += 1 }
        val sp = tdiv(s, 10000000000L)
        var j = 0
        while (j < dims) { u(j) += sp * row(j); j += 1 }
      }
      val m = BigInt(u.map(math.abs).max)
      v = u.map(x => ((BigInt(x) * 1000000) / m).toLong)
    }
    v
  }

  private def centered(rows: Array[Array[Double]], dims: Int): Array[Array[Long]] = {
    val q = rows.map(_.map(x => math.round(x * 1e6)))
    val n = q.length.toLong
    val mu = Array.tabulate(dims)(j => tdiv(q.map(_(j)).sum, n))
    q.map(row => Array.tabulate(dims)(j => row(j) - mu(j)))
  }

  test("integer division truncates toward zero in BOTH engines' idioms (the recurrence's law)") {
    // Spark SQL `div` (the engine's per-row dot truncation)
    val r = spark.sql("SELECT -7 div 2 AS a, 7 div -2 AS b, -7 div -2 AS c").head()
    assert(r.getLong(0) == -3L && r.getLong(1) == -3L && r.getLong(2) == 3L)
    // Java / and BigInt / (the driver-side mean + renormalization)
    assert(-7L / 2L == -3L && (BigInt(-7) / BigInt(2)).toLong == -3L)
  }

  test("engine direction replays the integer recurrence exactly from collected data") {
    val rows = graft.Tables.embeddings(spark, sfDir)
      .orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val expect = localPower(centered(rows, 64), rounds = 12, dims = 64)
    val got = Similarity.pcaPower(spark, sfDir).orderBy("dim")
      .collect().map(_.getLong(1))
    assert(got.toSeq == expect.toSeq)
  }

  test("planted dominant direction: 12 rounds converge to the true top eigenvector") {
    // deterministic corpus: strong direction + small md5-hash noise
    def h(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (java.lang.Long.parseUnsignedLong(
        d.take(7).map("%02x".format(_)).mkString, 16).toDouble /
        Math.pow(16, 14)) - 0.5
    }
    val dims = 16
    val base = Array.tabulate(dims)(j => h(s"b:$j"))
    val bn = math.sqrt(base.map(x => x * x).sum)
    val dirV = base.map(_ / bn)
    val rows = Array.tabulate(400) { i =>
      val a = 3.0 * h(s"a:$i") * 2 // amplitude along the planted direction
      Array.tabulate(dims)(j => a * dirV(j) + 0.1 * h(s"n:$i:$j"))
    }
    val df = rows.zipWithIndex
      .map { case (e, i) => (i.toLong, e.toSeq) }.toSeq
      .toDF("vec_id", "e")
    val got = Similarity.pcaPowerOf(spark, df, rounds = 12, dims = dims)
      .orderBy("dim").collect().map(_.getLong(1).toDouble)
    // reference: double-precision power iteration, 400 rounds (converged)
    val c = centered(rows, dims).map(_.map(_.toDouble))
    var ref = Array.fill(dims)(1.0)
    for (_ <- 1 to 400) {
      val u = Array.fill(dims)(0.0)
      c.foreach { row =>
        val s = row.indices.map(k => row(k) * ref(k)).sum
        row.indices.foreach(j => u(j) += s * row(j))
      }
      val m = math.sqrt(u.map(x => x * x).sum)
      ref = u.map(_ / m)
    }
    val gn = math.sqrt(got.map(x => x * x).sum)
    val cos = math.abs(got.indices.map(j => got(j) / gn * ref(j)).sum)
    assert(cos > 0.9999, s"cos=$cos")
  }

  test("emb_abtt: every coefficient replays as the truncated dot against the local fit") {
    val rows = graft.Tables.embeddings(spark, sfDir)
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val c = centered(rows.map(_._2), 64)
    val v = localPower(c, rounds = 12, dims = 64)
    val expect = rows.map(_._1).zip(c.map { row =>
      var s = 0L
      row.indices.foreach(k => s += row(k) * v(k))
      tdiv(s, 10000000000L)
    }).toMap
    val got = Similarity.abttCoeffs(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the correction is non-degenerate: coefficients spread both signs
    assert(got.values.exists(_ > 0) && got.values.exists(_ < 0))
  }
}
