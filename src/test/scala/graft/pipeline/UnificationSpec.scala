package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.schema.RawTick
import graft.streaming.{PipelineEvent, StreamingPipeline}

/** Batch/stream unification: the streaming state machine and the batch
  * operator library implement the same TR-1/TR-2 semantics through
  * completely different mechanisms (flatMapGroupsWithState vs window
  * functions). On an identical fixture their T1 must agree row-for-row —
  * the property that lets a user replay any live stream as a batch job
  * (or validate a batch backfill against the live pipeline) at 100 TB. */
class UnificationSpec extends SparkSpec {
  import spark.implicits._

  /** Two tickers interleaved, seeded walk, duplicate runs per ticker, and
    * colliding timestamps (every 13th tick reuses the previous stamp with
    * a different price — the case where only a shared (ts, price)
    * tiebreak keeps the two paths in agreement). */
  private def fixture: Vector[RawTick] = {
    val rnd = new scala.util.Random(77)
    val prices = collection.mutable.Map("AAA" -> 50.0, "BBB" -> 200.0)
    (0 until 60).map { i =>
      val t = if (i % 2 == 0) "AAA" else "BBB"
      if (i % 11 != 3) // every 11th tick repeats the ticker's prior price
        prices(t) = math.max(1.0, prices(t) + rnd.nextGaussian())
      // collisions stay inside one grouped(7) micro-batch: a stream cannot
      // reorder across batches it already processed, so the law is scoped
      // to same-ts ticks that arrive within one trigger
      val tsMs = 1700000000000L + (if (i % 13 == 5 && i < 49) (i - 2) * 500L else i * 500L)
      RawTick(t, new Timestamp(tsMs), math.round(prices(t) * 100) / 100.0)
    }.toVector
  }

  test("streaming T1 equals batch TR-1+TR-2 on the same fixture") {
    // streaming path
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[RawTick]
    val name = s"unify_${System.nanoTime()}"
    val q = StreamingPipeline.events(ms.toDS(), StreamingPipeline.Config())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      fixture.grouped(7).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table(name).as[PipelineEvent].collect()
      .filter(_.kind == "tick")
      .map(e => (e.ticker, e.ts.getTime, e.price.get,
        math.round(e.variation.get * 1e9))) // variation to 1e-9 to dodge fp noise
      .sortBy(t => (t._1, t._2))
      .toSeq

    // batch path over the identical rows
    val raw = fixture.toDF("ticker", "ts", "price")
    val batched = BatchReplay.run(spark, raw).ticks
      .select("ticker", "ts", "price", "variation").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        math.round(r.getDouble(3) * 1e9)))
      .sortBy(t => (t._1, t._2))
      .toSeq

    assert(streamed.nonEmpty && streamed.length < fixture.length,
      "fixture must actually exercise TR-1 drops")
    assert(streamed == batched)
  }
}
