package graft.streaming

import graft.SparkSpec
import graft.analytics.Dedup

/** Laws for the τ-sweep ingest gauge: the cumulative per-notch counts
  * after replaying the corpus equal a batch-side twin computed from the
  * SAME minhash signatures (banded candidates, per-pair agreement),
  * regardless of batch split; counts are τ-monotone; a pair counts once
  * however many bands or batches surface it. */
class StreamingTauSweepSpec extends SparkSpec {
  import spark.implicits._

  private val taus = Seq(5000L, 7500L, 10000L)

  private def run(batches: Seq[Seq[(Long, String)]]): Map[Long, (Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"tausweep_${System.nanoTime()}"
    // capacity sized past the corpus so the FIFO recall trade is not in
    // play — the law under test is the gauge arithmetic
    val q = StreamingTauSweep.gaugeOverText(ms.toDS(), taus, capacity = 1 << 20)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table(name).as[TauGauge].collect().toSeq
    rows.groupBy(_.tau_e4).map { case (t, rs) =>
      val last = rs.maxBy(_.seq)
      t -> (last.n_pairs, last.n_docs)
    }
  }

  /** Batch twin over the same signatures: banded candidates (4×4 KM
    * minhash buckets), distinct pairs, per-pair agreement on the e4
    * grid, per-notch distinct pair/doc counts. */
  private def localTwin(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val sigs = rows.flatMap { case (id, t) =>
      Dedup.localMinhashSignature(t, 5, 16).map(id -> _.toSeq)
    }
    val pairs = (0 until 4).flatMap { b =>
      sigs.groupBy(_._2.slice(b * 4, (b + 1) * 4)).values.flatMap { bucket =>
        val ids = bucket.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
      }
    }.distinct
    val bySig = sigs.toMap
    val floor = taus.min
    val scored = pairs.map { case (a, b) =>
      val (sa, sb) = (bySig(a), bySig(b))
      val m = sa.zip(sb).count { case (x, y) => x == y }
      (a, b, math.rint(m.toDouble / 16 * 10000).toLong)
    }.filter(_._3 >= floor)
    taus.map { t =>
      val hit = scored.filter(_._3 >= t)
      t -> (hit.size.toLong,
        hit.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }.toMap
  }

  test("replayed gauge == the signature-side batch twin, batching-invariant") {
    val rows = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = localTwin(rows).filter(_._2._1 > 0)
    assert(want.nonEmpty, "corpus must surface at least one near-dup pair")
    val oneShot = run(Seq(rows))
    val thirds = run((0 until 3).map(i =>
      rows.filter(r => math.floorMod(r._1, 3L) == i.toLong)))
    assert(oneShot == want, s"single batch: $oneShot vs $want")
    assert(thirds == want, s"three-way split: $thirds vs $want")
    // τ-monotone: tightening the notch never adds mass
    val ordered = taus.sorted.map(t => oneShot.getOrElse(t, (0L, 0L))._1)
    assert(ordered == ordered.sorted.reverse, s"pair counts not τ-monotone: $ordered")
  }

  test("a pair counts once however many bands and batches surface it") {
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    // identical texts: all 16 components agree → every band collides,
    // est 1.0 clears every notch
    val got = run(Seq(Seq((1L, t), (2L, t)), Seq((1L, t), (2L, t))))
    taus.foreach { tau =>
      assert(got(tau) == ((1L, 2L)), s"tau $tau: ${got(tau)}")
    }
  }

  test("state ceiling: exceeding maxPairs fails the query loudly, never evicts (ADVICE r17)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    // 4 identical docs → 6 distinct floor-clearing pairs; cap at 2
    // (gaugeOverText exposes no cap param — build the candidate stream
    // directly and plumb through gauge() with the tiny cap)
    val ms = MemoryStream[(Long, String)]
    val cands = StreamingLsh.candidates(ms.toDS(), 5, 4, 4,
      threshold = (taus.min - 0.5) / 10000.0, capacity = 1 << 20)
    val name = s"taucap_${System.nanoTime()}"
    val sq = StreamingTauSweep.gauge(cands, taus, maxPairs = 2L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ms.addData((1L, t), (2L, t), (3L, t), (4L, t))
      sq.processAllAvailable()
    }
    sq.stop()
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil else String.valueOf(x.getMessage) +: messages(x.getCause)
    assert(messages(e).exists(_.contains("maxPairs")),
      s"overflow must name the ceiling: ${messages(e)}")
    // and a cap ABOVE the pair mass is invisible: same corpus, cap 6
    val ms2 = MemoryStream[(Long, String)]
    val cands2 = StreamingLsh.candidates(ms2.toDS(), 5, 4, 4,
      threshold = (taus.min - 0.5) / 10000.0, capacity = 1 << 20)
    val name2 = s"taucap2_${System.nanoTime()}"
    val sq2 = StreamingTauSweep.gauge(cands2, taus, maxPairs = 6L)
      .writeStream.format("memory").queryName(name2).outputMode("append").start()
    try { ms2.addData((1L, t), (2L, t), (3L, t), (4L, t)); sq2.processAllAvailable() }
    finally sq2.stop()
    import spark.implicits._
    val rows = spark.table(name2).as[TauGauge].collect()
    assert(rows.map(_.n_pairs).max == 6L, "cap at the exact pair mass must not trip")
  }
}
