package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.schema.RawTick

/** Laws for the streaming Page-CUSUM drift monitor: warm-up freezes the
  * baseline, a genuine level shift fires with the replayed statistic,
  * stable keys never alert, state carries across micro-batches, and the
  * alert-and-restart reset holds. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def tick(k: String, i: Int, price: Double) =
    RawTick(k, new Timestamp(t0 + i * 1000L), price)

  test("level shift alerts with the exact replayed statistic; stable key stays silent") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"drift_${System.nanoTime()}"
    // warmup=4 at price 10 -> mu0 = 10.0 exactly; then shift to 13:
    // hi walks 3, 6 -> crosses threshold 5 on the SECOND shifted tick
    val a = Seq.tabulate(4)(i => tick("A", i, 10.0)) ++
      Seq(tick("A", 4, 13.0), tick("A", 5, 13.0), tick("A", 6, 13.0))
    val b = Seq.tabulate(7)(i => tick("B", i, 10.0)) // stable forever
    val q = DriftMonitor.alerts(ms.toDS(), warmup = 4, slack = 0.0, threshold = 5.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // split across micro-batches mid-shift: state must carry
      ms.addData(a.take(5) ++ b.take(5): _*)
      q.processAllAvailable()
      ms.addData(a.drop(5) ++ b.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.table(name).as[DriftAlert].collect().sortBy(_.ts.getTime)
    assert(alerts.map(_.ticker).toSet == Set("A"), "stable key must not alert")
    assert(alerts.length == 1)
    val al = alerts.head
    assert(al.direction == "up" && al.mu0 == 10.0)
    assert(al.statistic == 6.0, s"hi = (13-10) + (13-10) = 6, got ${al.statistic}")
    assert(al.ts.getTime == t0 + 5000L, "fires on the second shifted tick")
    assert(al.n_obs == 2)
  }

  test("downward drift fires 'down'; reset restarts the walk") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"drift_${System.nanoTime()}"
    // warmup=2 at 20 -> mu0=20; drop to 16: lo walks 4, 8 -> alert at
    // second; then 16 again twice -> walks 4, 8 -> SECOND alert (reset held)
    val rows = Seq(tick("C", 0, 20.0), tick("C", 1, 20.0),
      tick("C", 2, 16.0), tick("C", 3, 16.0), tick("C", 4, 16.0), tick("C", 5, 16.0))
    val q = DriftMonitor.alerts(ms.toDS(), warmup = 2, slack = 0.0, threshold = 5.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val alerts = spark.table(name).as[DriftAlert].collect().sortBy(_.ts.getTime)
    assert(alerts.map(a => (a.direction, a.statistic, a.ts.getTime - t0)).toSeq ==
      Seq(("down", 8.0, 3000L), ("down", 8.0, 5000L)))
  }

  test("warm-up rows never alert even on wild values") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"drift_${System.nanoTime()}"
    val rows = Seq(tick("D", 0, 1.0), tick("D", 1, 500.0), tick("D", 2, -40.0))
    val q = DriftMonitor.alerts(ms.toDS(), warmup = 4, slack = 0.0, threshold = 1.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try { ms.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    assert(spark.table(name).isEmpty, "still warming up: no alerts")
  }
}
