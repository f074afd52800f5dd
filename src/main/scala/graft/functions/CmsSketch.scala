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

/** Native Catalyst aggregate: a Count-Min sketch over a string column,
  * returned as the flattened `depth × width` counter matrix
  * (`array<long>`, row-major).
  *
  * Why a custom `TypedImperativeAggregate` (SURVEY §7.3 ladder, step
  * (b)): the composed form — explode each row into `depth` (j, bucket)
  * pairs and `groupBy(j, bucket).count()` — multiplies the shuffle by
  * `depth` and keys it on the bucket space. The native aggregate updates
  * a fixed `depth×width` long array per partition and merges by
  * ELEMENTWISE ADDITION, so each partition ships exactly one matrix
  * (8·d·w bytes) regardless of row count — the classic sketch contract.
  *
  * Determinism/oracle: counter addition is commutative and associative,
  * so the result is independent of partition count and merge order —
  * unlike Misra-Gries-style heavy-hitter sketches, whose outputs depend
  * on merge schedule and can never hash-match a serial oracle. Bucket
  * choice is the engine-portable seeded md5 ([[Hashes.md5Long60Seeded]]):
  * `h_j(x) = md5("j:" ++ x)` first 15 hex chars (= first 8 digest bytes
  * >>> 4) mod width, which DuckDB replays exactly
  * (`('0x'||substr(md5(j||':'||x),1,15))::UBIGINT::BIGINT % width`).
  *
  * Standard CMS guarantees (w=width, d=depth, N rows): every point
  * estimate `min_j M[j][h_j(x)]` over-counts (est ≥ true) and
  * `est ≤ true + e·N/w` with probability ≥ 1 − e^−d.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width > 0 && width <= (1 << 20), s"width must be in [1,2^20], got $width")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        buffer(j * width + CmsSketch.bucket(j, s, width)) += 1L
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `md5Long60Seeded(j, s) % width` in JVM arithmetic: the first 15 hex
    * chars of md5("j:" ++ s) are the first 8 digest bytes read big-endian
    * then >>> 4 (dropping the 16th nibble) — bit-identical to Spark's
    * `conv(substring(md5(x),1,15),16,10)` and DuckDB's
    * `('0x'||substr(md5(x),1,15))::UBIGINT`. */
  private[graft] def bucket(j: Int, s: String, width: Int): Int = {
    val md = digest.get()
    md.reset()
    val d = md.digest((j.toString + ":" + s).getBytes("UTF-8"))
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    ((hi >>> 4) % width).toInt
  }
}
