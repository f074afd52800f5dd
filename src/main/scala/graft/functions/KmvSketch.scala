package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: a K-MINIMUM-VALUES distinct-count sketch
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream") over a string column — the k smallest DISTINCT 60-bit
  * salted-md5 hashes, returned ascending as `array<long>` (size ≤ k).
  *
  * Why KMV and not HyperLogLog here: the KMV state is a pure SET —
  * update is insert-if-smaller, merge is set-union-then-truncate — so
  * the result is EXACTLY determined by the distinct input values,
  * independent of row order, partition count, and merge schedule, and a
  * serial SQL oracle replays it verbatim (`ORDER BY hash LIMIT k` per
  * group). HLL's register maxima share that property in principle, but
  * its estimator's bias-correction branches make cross-engine bit parity
  * a porting exercise; KMV's estimator is one expression:
  * `(k−1) · 2^60 / h_(k)` when the sketch is full, or the sketch size
  * itself (then EXACT) when fewer than k distinct values were seen.
  * Standard error is ~1/√(k−2) (~12.7% at k=64).
  *
  * Why a custom `TypedImperativeAggregate` (SURVEY §7.3 ladder, step
  * (b), the [[CmsSketch]] precedent): the composed form — per-group
  * `row_number() OVER (ORDER BY hash) <= k` — shuffles EVERY distinct
  * value to its group's reducer and sorts there; the native aggregate
  * keeps a bounded k-element tree per (partition, group) and ships ≤ k
  * longs per partial — the sketch contract that makes count-distinct
  * affordable at 100 TB (the exact `count(DISTINCT …)` beside it in the
  * registered query is the accuracy BASELINE, deliberately the
  * expensive form, like [[graft.analytics.Similarity.knnExact]]).
  *
  * Hash: md5("kmv:" ++ x) first 15 hex chars = first 8 digest bytes
  * big-endian >>> 4 — the engine's standard 60-bit md5, which DuckDB
  * replays as `('0x'||substr(md5('kmv:'||x),1,15))::UBIGINT::BIGINT`.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 1 && k <= 4096, s"k must be in [2,4096], got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(set: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) { if (set.add(h)) { set.pollLast(); () } }

  override def update(set: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(set, KmvSketch.hash60(v.asInstanceOf[UTF8String].toString))
    set
  }

  override def merge(set: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(h => offer(set, h))
    set
  }

  override def eval(set: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(set: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(set.size * 8)
    val lb = bb.asLongBuffer()
    set.forEach(h => { lb.put(h.longValue()); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    val lb = ByteBuffer.wrap(bytes).asLongBuffer()
    while (lb.hasRemaining) set.add(lb.get())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** 2^60 as an EXACT double — the estimator numerator's unit. */
  val Hash60Range: Double = 1152921504606846976.0

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** md5Long60("kmv:" ++ s): first 8 digest bytes big-endian >>> 4. */
  private[graft] def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(("kmv:" + s).getBytes("UTF-8"))
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    hi >>> 4
  }
}
