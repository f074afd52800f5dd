package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.schema.RawTick
import graft.streaming.StreamingPipeline

/** The runnable live path (VERDICT r2 missing #1), exercised zero-egress
  * against a local stub HTTP server: real `java.net.http` GET →
  * `chart.result[0].meta.regularMarketPrice` extraction → tick →
  * backoff-on-500 → micro-batch sinks → timestamped CSV export. */
class LiveHttpSpec extends SparkSpec {

  /** Local stub server; `handler(i)` = (status, body) for the i-th call. */
  private def startServer(handler: Int => (Int, String)): (HttpServer, String, AtomicInteger) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/chart", (ex: HttpExchange) => {
      val (code, body) = handler(calls.getAndIncrement())
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/chart", calls)
  }

  private def chartJson(p: Double): String =
    s"""{"chart":{"result":[{"meta":{"regularMarketPrice":$p}}]}}"""

  test("HttpFetcher: 200 -> price; non-200 / malformed JSON / missing field -> None") {
    val bodies = Array(
      (200, chartJson(123.45)),
      (500, "internal error"),
      (200, "{ this is not json"),
      (200, """{"chart":{"result":[{"meta":{}}]}}"""),
      (200, """{"chart":{"result":[]}}"""),
      (200, chartJson(67.0)))
    val (server, url, _) = startServer(i => bodies(math.min(i, bodies.length - 1)))
    try {
      val fetch = HttpFetcher.chartFetcher(url, timeoutMs = 5000)
      assert(fetch() == Some(123.45))
      assert(fetch().isEmpty, "HTTP 500 must map to None")
      assert(fetch().isEmpty, "malformed JSON must map to None")
      assert(fetch().isEmpty, "missing regularMarketPrice must map to None")
      assert(fetch().isEmpty, "empty result array must map to None")
      assert(fetch() == Some(67.0), "fetcher must recover after failures")
    } finally server.stop(0)
  }

  test("HttpFetcher: unreachable endpoint -> None within the timeout") {
    // a port with no listener: connect is refused (or times out) — either
    // way the closure must swallow it and return None, not throw
    val fetch = HttpFetcher.chartFetcher("http://127.0.0.1:1/chart", timeoutMs = 1000)
    assert(fetch().isEmpty)
  }

  test("graft.Live entry point runs the whole live pipeline against a stub endpoint") {
    val (server, url, calls) = startServer(i => (200, chartJson(100.0 + i)))
    val out = java.nio.file.Files.createTempDirectory("graft_live_main").toString
    try {
      // props let the spec drive the REAL entry-point composition (the
      // main only adds session ownership on top of Live.run)
      sys.props("GRAFT_URL") = url
      sys.props("GRAFT_TRIGGER_MS") = "100"
      val files = graft.Live.run(spark, "TST", out, durationSec = Some(3L))
      assert(calls.get() >= 2, "live run must have polled the endpoint repeatedly")
      assert(files.length == 4, s"CTL-1 must export the four reference CSVs, got $files")
      assert(files.exists(_.contains("price_data")) && files.exists(_.contains("rmse_history")))
      val lines = scala.io.Source.fromFile(files.find(_.contains("price_data")).get)
        .getLines().toSeq
      assert(lines.length >= 2, "exported price CSV must carry fetched ticks")
    } finally {
      sys.props -= "GRAFT_URL"
      sys.props -= "GRAFT_TRIGGER_MS"
      server.stop(0)
    }
  }

  test("Live.run on a mid-run query failure: exits early AND still exports") {
    val calls = new AtomicInteger(0)
    PriceFetchers.register("live_fatal", () => {
      val i = calls.getAndIncrement()
      if (i < 3) Some(100.0 + i)
      // fatal (non-NonFatal) error: the fetch guard must rethrow it, the
      // query must fail, and the bounded run must NOT idle out its clock
      else throw new LinkageError("codec blew up")
    })
    val out = java.nio.file.Files.createTempDirectory("graft_live_fail").toString
    val t0 = System.currentTimeMillis()
    try {
      sys.props("GRAFT_FETCHER") = "live_fatal"
      sys.props("GRAFT_TRIGGER_MS") = "50"
      val thrown = intercept[Exception] {
        graft.Live.run(spark, "TST", out, durationSec = Some(120L))
      }
      assert(thrown.isInstanceOf[org.apache.spark.sql.streaming.StreamingQueryException],
        s"failure must surface, got $thrown")
      val elapsed = System.currentTimeMillis() - t0
      assert(elapsed < 60000, s"failed run must return early, took ${elapsed} ms")
      // the finally-path export ran: the pre-failure ticks are on disk
      val priceCsv = new java.io.File(out).listFiles()
        .find(_.getName.startsWith("price_data"))
      assert(priceCsv.isDefined, "finish() must export even when the query failed")
      val lines = scala.io.Source.fromFile(priceCsv.get).getLines().toSeq
      assert(lines.exists(_.contains("100.0")),
        "pre-failure ticks must survive into the export")
    } finally {
      sys.props -= "GRAFT_FETCHER"
      sys.props -= "GRAFT_TRIGGER_MS"
    }
  }

  test("live path end-to-end: GET -> JSON -> tick -> backoff-on-500 -> CSV export") {
    import spark.implicits._
    val script: Int => (Int, String) = {
      case 0 => (200, chartJson(100.0))
      case 1 => (500, "boom") // → CTL-2 backoff
      case 2 => (200, chartJson(101.0))
      case _ => (200, chartJson(102.0))
    }
    val (server, url, calls) = startServer(script)
    val out = java.nio.file.Files.createTempDirectory("graft_live").toString
    try {
      val ticks = spark.readStream.format("graft.sources.HttpPollSource")
        .option("ticker", "TST")
        .option("fetcher", "http") // the REAL java.net.http fetcher
        .option("url", url)
        .option("backoffMs", "50")
        .option("fetchTimeoutMs", "5000")
        .load().as[RawTick]
      val query = StreamingPipeline.start(ticks, StreamingPipeline.Config(),
        out, s"$out/_checkpoint", Trigger.ProcessingTime(25), console = false)
      val deadline = System.currentTimeMillis() + 60000
      def tickCount(): Long =
        try spark.read.parquet(s"$out/t1_ticks").count()
        catch { case _: Throwable => 0L } // table dir not created yet
      while (tickCount() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // bounded drain: a live poll source always has "more" (each trigger
      // fetches a new tick), so an unbounded processAllAvailable would
      // never return — 2 s grace, then stop and export what landed
      val files = StreamingPipeline.stopAndExport(query, spark, out,
        java.time.Instant.now(), drainTimeoutMs = 2000L)
      assert(calls.get() >= 4, "stub must have served the 200/500/200 script")
      val prices = spark.read.parquet(s"$out/t1_ticks")
        .select("price").as[Double].collect().toSet
      assert(Set(100.0, 101.0, 102.0).subsetOf(prices),
        s"all scripted prices must land as ticks, got $prices")
      val priceCsv = files.find(_.contains("price_data")).get
      val lines = scala.io.Source.fromFile(priceCsv).getLines().toSeq
      assert(lines.head.startsWith("ticker,timestamp,price"),
        "SNK-1 export must be a header-ful CSV")
      assert(lines.exists(_.contains("100.0")) && lines.exists(_.contains("101.0")),
        "exported CSV must carry the fetched prices")
    } finally server.stop(0)
  }
}
