package graft.sources

import java.util
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SRC-1 — the HTTP polling streaming source (`asyncio scraping.py:22-43,
  * 86,92`) as a DataSource V2 `MicroBatchStream`: one price fetch per
  * trigger, 20 s backoff after a failed fetch (CTL-2), processing-time
  * stamp assigned ONCE at the source (TR-3 — the reference double-stamps,
  * we don't; SURVEY §2.2).
  *
  * Usage: `spark.readStream.format("graft.sources.HttpPollSource")
  * .option("ticker","MC.PA").option("fetcher","<registered name>").load()`
  * → schema (ticker string, timestamp timestamp, price double), i.e. a
  * streaming `Dataset[RawTick]` boundary — exactly what
  * [[graft.streaming.StreamingPipeline]] consumes.
  *
  * The fetch itself is PLUGGABLE via [[PriceFetchers]]: the default name
  * `"http"` resolves to the real [[HttpFetcher]] GET + JSON extraction
  * (override the endpoint with `.option("url", ...)` — `{ticker}` is
  * substituted); tests register deterministic sequences or point `url` at
  * a local stub server (zero egress). Polling happens on the DRIVER
  * (`latestOffset` is the per-trigger hook), matching the reference's
  * single-endpoint poll loop; many tickers = many source instances, each a
  * trivial driver-side poll feeding an executor-parallel pipeline.
  */
class HttpPollSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPollSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpPollTable(new CaseInsensitiveStringMap(properties))
}

object HttpPollSource {
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("price", DoubleType, nullable = false)))
}

/** Named fetch functions: `() => Option[Double]` (None = fetch failure →
  * backoff, mirroring `fetch_price`'s None returns on non-200/exception).
  * The name `"http"` needs no registration — it resolves to the real
  * [[HttpFetcher]] GET unless a registration overrides it (tests do). */
object PriceFetchers {
  private val registry = TrieMap[String, () => Option[Double]]()
  def register(name: String, f: () => Option[Double]): Unit = registry(name) = f
  def get(name: String): Option[() => Option[Double]] = registry.get(name)
  def apply(name: String): () => Option[Double] =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"no fetcher registered as '$name'"))
}

final class HttpPollTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"http_poll(${options.get("ticker")})"
  override def schema(): StructType = HttpPollSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = HttpPollSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HttpPollMicroBatchStream(
          Option(options.get("ticker")).getOrElse("MC.PA"),
          Option(options.get("fetcher")).getOrElse("http"),
          options.getLong("backoffMs", 20000L), // `asyncio scraping.py:92`
          options.getBoolean("dropUnchanged", false),
          options.getLong("fetchTimeoutMs", 15000L),
          Option(options.get("url")).getOrElse(HttpFetcher.DefaultUrlTemplate))
    }
}

final case class PollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Driver-side buffer of fetched ticks; `latestOffset` performs the poll
  * (one per trigger — the trigger interval IS the poll interval, CTL-2),
  * `planInputPartitions` serves the [start, end) slice, `commit` trims.
  * `dropUnchanged` optionally applies TR-1 at the source (the scraper
  * appends only price CHANGES, `asyncio scraping.py:80-83`); the state
  * machine applies TR-1 anyway, so this is just an ingest-volume saver. */
final class HttpPollMicroBatchStream(ticker: String, fetcherName: String,
                                     backoffMs: Long, dropUnchanged: Boolean,
                                     fetchTimeoutMs: Long = 15000L,
                                     urlTemplate: String = HttpFetcher.DefaultUrlTemplate)
    extends MicroBatchStream {
  private val buf = new java.util.ArrayList[(Long, Double)]() // (micros, price)
  private var base = 0L // offset of buf(0)
  private var backoffUntil = 0L
  private var lastPrice = Double.NaN
  private val fetch: () => Option[Double] =
    PriceFetchers.get(fetcherName).getOrElse {
      if (fetcherName == "http")
        HttpFetcher.chartFetcher(urlTemplate.replace("{ticker}", ticker), fetchTimeoutMs)
      else throw new IllegalArgumentException(s"no fetcher registered as '$fetcherName'")
    }

  /** Cached daemon pool for the timeout guard: a fetch that ignores
    * interruption leaks its thread but never blocks the NEXT poll (a fresh
    * thread is created on demand); threads are reused while fetches behave. */
  private val fetchExec = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r, s"graft-poll-$ticker"); t.setDaemon(true); t })

  /** Fetch-timeout contract: `latestOffset` runs on the driver's trigger
    * thread, so a HUNG fetch (vs a failed one) would stall the whole stream
    * — the reference shares this flaw (blocking `session.get`,
    * `asyncio scraping.py:24`); the engine must not. A fetch that exceeds
    * `fetchTimeoutMs` is cancelled (interrupt), treated as failed, and
    * routed to the same CTL-2 backoff as a None. `fetchTimeoutMs <= 0`
    * disables the guard (trusted in-process fetchers). */
  private def fetchBounded(): Option[Double] =
    if (fetchTimeoutMs <= 0) fetch()
    else {
      val task = fetchExec.submit(new java.util.concurrent.Callable[Option[Double]] {
        override def call(): Option[Double] = fetch()
      })
      try task.get(fetchTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException => task.cancel(true); None
        case e: InterruptedException =>
          // the DRIVER trigger thread was interrupted (stream stopping):
          // don't swallow it into a backoff — restore the flag and bail
          task.cancel(true); Thread.currentThread().interrupt()
          throw e
        case e: java.util.concurrent.ExecutionException =>
          e.getCause match {
            case null => None // no cause recorded: treat as failed fetch
            case scala.util.control.NonFatal(_) => None // fetcher threw = failed fetch
            case fatal => throw fatal // OOM etc must not masquerade as backoff
          }
      }
    }

  override def latestOffset(): Offset = synchronized {
    val now = System.currentTimeMillis()
    if (now >= backoffUntil) {
      fetchBounded() match {
        case Some(p) =>
          if (!(dropUnchanged && p == lastPrice)) {
            buf.add((now * 1000L, p)) // TR-3: single stamp, at the source
            lastPrice = p
          }
        case None => backoffUntil = now + backoffMs
      }
    }
    PollOffset(base + buf.size())
  }

  override def initialOffset(): Offset = PollOffset(0L)

  /** Restart-from-checkpoint contract: the buffer is in-memory, so data
    * fetched before a restart cannot be replayed (the same inherent
    * limitation as Spark's socket source — a live poll is not a durable
    * log; durable ingest = this source + a persistent sink, replayed from
    * the sink). What MUST still hold is offset monotonicity: fast-forward
    * `base` to any checkpointed offset we see, so `latestOffset` never
    * goes backwards and fresh ticks never reuse offsets the commit log
    * already maps to old data. The lost (uncommitted) range replays as an
    * empty slice rather than as silently re-numbered new rows. */
  override def deserializeOffset(json: String): Offset = synchronized {
    val n = json.toLong
    if (n > base + buf.size()) { buf.clear(); base = n }
    PollOffset(n)
  }
  override def commit(end: Offset): Unit = synchronized {
    val n = (end.asInstanceOf[PollOffset].n - base).toInt
    if (n > 0) { buf.subList(0, math.min(n, buf.size())).clear(); base += n }
  }
  override def stop(): Unit = { fetchExec.shutdownNow(); () }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = (start.asInstanceOf[PollOffset].n - base).toInt
      val e = (end.asInstanceOf[PollOffset].n - base).toInt
      val rows = (math.max(s, 0) until math.min(e, buf.size()))
        .map(i => buf.get(i)).toArray
      Array(PollPartition(ticker, rows))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PollPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (micros, price) = p.rows(i)
          InternalRow(UTF8String.fromString(p.ticker), micros, price)
        }
        override def close(): Unit = ()
      }
    }
}

final case class PollPartition(ticker: String, rows: Array[(Long, Double)])
    extends InputPartition
