package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.schema.RawTick

class EventTimeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned (windows align to wall-clock minutes)
  private def tick(offsetSec: Long, price: Double) =
    RawTick("A", new Timestamp(t0 + offsetSec * 1000), price)

  test("streaming dedup drops redelivered ticks within the watermark, keeps distinct ones") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"dedup_${System.nanoTime()}"
    val q = EventTimeOps.dedupTicks(ms.toDS(), "2 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(tick(0, 10), tick(10, 12))
      q.processAllAvailable()
      // redelivery of (A, t0+10, 12) in a later micro-batch, plus a new
      // row at the same timestamp with a different price (NOT a dup)
      ms.addData(tick(10, 12), tick(10, 13), tick(20, 14))
      q.processAllAvailable()
      ms.addData(tick(0, 10)) // second redelivery, still within watermark
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[RawTick].collect()
      .map(t => (t.timestamp.getTime - t0, t.price)).sorted.toSeq
    assert(rows == Seq((0L, 10.0), (10000L, 12.0), (10000L, 13.0), (20000L, 14.0)))
  }

  test("session window: gap splits sessions; finalized after watermark passes") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"sess_${System.nanoTime()}"
    val q = EventTimeOps.sessionStats(ms.toDS(), "30 seconds", "1 minute")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // session A: ticks at 0s,20s,35s (gaps < 30s); then 80s starts session B
      ms.addData(tick(0, 10), tick(20, 12), tick(35, 11), tick(80, 20))
      q.processAllAvailable()
      // advance watermark far past both sessions to finalize them
      ms.addData(tick(600, 30))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select("session_start", "session_end", "n_ticks", "low", "high")
      .as[(Timestamp, Timestamp, Long, Double, Double)].collect().sortBy(_._1.getTime)
    assert(rows.length == 2)
    val (a, b) = (rows(0), rows(1))
    assert(a._1.getTime == t0 && a._2.getTime == t0 + 65000 && a._3 == 3)
    assert(a._4 == 10.0 && a._5 == 12.0)
    assert(b._1.getTime == t0 + 80000 && b._3 == 1 && b._4 == 20.0)
  }

  test("tumbling window finalizes after watermark and drops too-late rows") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"win_${System.nanoTime()}"
    val q = EventTimeOps.tumblingStats(ms.toDS(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // window [0,60): three on-time rows
      ms.addData(tick(0, 10), tick(10, 12), tick(50, 11))
      q.processAllAvailable()
      // advance event time to 5:00 => watermark 3:00, finalizing [0,60)
      ms.addData(tick(300, 20))
      q.processAllAvailable()
      // a LATE row for [0,60) — behind the watermark, must be dropped
      ms.addData(tick(30, 999))
      q.processAllAvailable()
      // advance to 10:00 to finalize the 5:00 window too
      ms.addData(tick(600, 30))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select("window_start", "n_ticks", "low", "high")
      .as[(Timestamp, Long, Double, Double)].collect().sortBy(_._1.getTime)
    assert(rows.length == 2)
    val (w0, w5) = (rows(0), rows(1))
    assert(w0._1.getTime == t0 && w0._2 == 3, "late row must not reach the finalized window")
    assert(w0._3 == 10.0 && w0._4 == 12.0)
    assert(w5._1.getTime == t0 + 300000 && w5._2 == 1)
  }

  test("stream-stream interval join: tolerance bounds, key isolation, both-side flow") {
    implicit val sql = spark.sqlContext
    val fs = MemoryStream[RawTick]
    val as = MemoryStream[RawTick]
    val name = s"ivj_${System.nanoTime()}"
    val q = EventTimeOps.intervalJoin(fs.toDS(), as.toDS(), "30 seconds", "1 minute")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    def fTick(off: Long, v: Double) = tick(off, v)
    def aTick(off: Long, v: Double, tk: String = "A") =
      RawTick(tk, new Timestamp(t0 + off * 1000), v)
    try {
      // forecast at 0s (window [0s, 30s]); actuals at 10s (in), 30s
      // (inclusive edge), 31s (out), -1s (before forecast: out), and an
      // in-window row under a DIFFERENT ticker (key isolation)
      fs.addData(fTick(0, 100))
      as.addData(aTick(10, 11), aTick(30, 12), aTick(31, 13),
        aTick(-1, 14), aTick(20, 15, tk = "B"))
      q.processAllAvailable()
      // actual arriving in a LATER micro-batch than its forecast still
      // joins while within watermark bounds
      as.addData(aTick(25, 16))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select("f_ts", "a_ts", "price")
      .as[(Timestamp, Timestamp, Double)].collect()
      .map(r => (r._1.getTime - t0, r._2.getTime - t0, r._3)).sorted.toSeq
    assert(rows == Seq((0L, 10000L, 11.0), (0L, 25000L, 16.0), (0L, 30000L, 12.0)),
      s"got $rows")
  }

  test("tumbling OHLC: open/close by arrival-time total order, late row dropped, exact cents") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"ohlc_${System.nanoTime()}"
    val q = EventTimeOps.tumblingOhlc(ms.toDS(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // window [0,60): open=10.50 (t+0), high=12.25 (t+10), low/close=9.75 (t+50)
      ms.addData(tick(0, 10.50), tick(10, 12.25), tick(50, 9.75))
      q.processAllAvailable()
      ms.addData(tick(300, 20.00)) // advance watermark, finalize [0,60)
      q.processAllAvailable()
      ms.addData(tick(30, 999.0)) // late for [0,60): dropped
      q.processAllAvailable()
      ms.addData(tick(600, 30.0)) // finalize the 5:00 bar
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select("window_start", "open_c", "high_c", "low_c", "close_c", "n_ticks", "sum_c")
      .as[(Timestamp, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1.getTime)
    assert(rows.length == 2)
    val b0 = rows(0)
    assert(b0._1.getTime == t0)
    assert((b0._2, b0._3, b0._4, b0._5, b0._6, b0._7) ==
      ((1050L, 1225L, 975L, 975L, 3L, 3250L)),
      s"bar0 $b0 — the late 999 row must not reach the finalized bar")
    assert(rows(1)._2 == 2000L && rows(1)._5 == 2000L && rows(1)._6 == 1L)
    // batch parity: the same aggregation over the same rows as a plain frame
    val batch = EventTimeOps.tumblingOhlc(
      Seq(tick(0, 10.50), tick(10, 12.25), tick(50, 9.75)).toDS(), "1 minute", "2 minutes")
      .select("open_c", "high_c", "low_c", "close_c", "n_ticks", "sum_c")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(batch == Seq((1050L, 1225L, 975L, 975L, 3L, 3250L)))
  }
}
