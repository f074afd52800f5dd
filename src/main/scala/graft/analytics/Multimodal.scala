package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing (north star: image/audio/video as opaque
  * `binary` columns with typed metadata).
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around
  * it — the binary payload column, the metadata struct, the partition-wise
  * batch decode shape, the feature schema — is real Spark plumbing, tested
  * and oracle-checked where expressible.
  *
  * Scale design: payloads never shuffle (all ops are projections or
  * `mapPartitions`); metadata extraction is codegen'd column work; the
  * decode stage is partition-parallel with constant memory per row.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata to each document —
    * the shape a real corpus table would have (payload = the media bytes;
    * here the UTF-8 bytes of `text` stand in as a deterministic payload). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        // fake raster dims derived from the payload hash — stands in for
        // the width/height a real probe would parse from the media header
        (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("long") % 1920).as("width"),
        (conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("long") % 1080).as("height")))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** DECODE STUB — the real implementation would decode the media bytes
    * (image decode / audio resample / frame sample) with a native codec
    * library; this container has none, so the "decoded features" are a
    * deterministic fake: the mean of each of 8 equal byte-slices of the
    * payload, scaled to [0,1]. The Spark-side contract is the real part:
    * partition-wise batched iteration (one codec init per partition, like
    * a Pandas-UDF batch), binary in, fixed-width double vector out.
    */
  def decodeStub(spark: SparkSession, payloads: DataFrame, nFeatures: Int = 8): DataFrame = {
    val rdd = payloads.select("doc_id", "payload").rdd.mapPartitions { it =>
      // (real codec handle would be initialized once per partition here)
      it.map { r =>
        val id = r.getLong(0)
        // a null payload (null text row) decodes like an empty one
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val feats = Array.tabulate(nFeatures) { i =>
          val lo = (bytes.length.toLong * i / nFeatures).toInt
          val hi = (bytes.length.toLong * (i + 1) / nFeatures).toInt
          if (hi <= lo) 0.0
          else {
            var s = 0L; var j = lo
            while (j < hi) { s += bytes(j) & 0xFF; j += 1 }
            s.toDouble / (hi - lo) / 255.0
          }
        }
        Row(id, bytes.length.toLong, feats)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Oracle-checkable face of the payload plumbing: byte stats + digests
    * computed ON THE BINARY COLUMN (md5/substr over bytes — for the ASCII
    * synthetic corpus these equal DuckDB's text-side md5/substr). */
  def payloadStats(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      md5(col("payload")).as("payload_md5"),
      md5(substring(col("payload"), 1, 64)).as("head_md5"))

  /** Frame sampling — the video/audio counterpart of the decode stub: the
    * payload is treated as `frameSize`-byte frames, every `stride`-th
    * frame is sampled up to `maxFrames` per document, and each sampled
    * frame is emitted with its index and digest. Pure projection +
    * in-partition explode: payload bytes never shuffle, per-doc output is
    * bounded by `maxFrames` regardless of payload size (the property that
    * keeps a 100 TB video corpus's sample pass proportional to documents,
    * not bytes). With a real codec the substring becomes a frame decode —
    * the plumbing (offset arithmetic, bounded fan-out, digest/feature
    * projection) is identical. */
  def frameSample(docs: DataFrame, frameSize: Int = 32, stride: Int = 4,
                  maxFrames: Int = 8): DataFrame =
    withPayload(docs)
      .select(col("doc_id"), col("payload"),
        (col("meta.n_bytes") / frameSize).cast("long").as("n_frames"))
      .where(col("n_frames") > 0)
      // ceil(n_frames/stride) sample slots, capped at maxFrames; guard the
      // upper bound with the where above — Spark's sequence(a, b) happily
      // DESCENDS for b < a, which would fabricate negative frame indexes
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(expr(
          s"sequence(0L, least($maxFrames, (n_frames + ${stride - 1}) div $stride) - 1)"))
          .as("k"))
      .select(col("doc_id"),
        (col("k") * stride).as("frame_idx"),
        col("n_frames"),
        md5(col("payload").substr(
          (col("k") * (stride * frameSize) + 1).cast("int"), lit(frameSize))).as("frame_md5"))

  // -- query entry points --

  /** The DuckDB oracles for these queries replay the BINARY-side digests
    * with TEXT-side md5/substring — parity that holds only while every
    * character is one UTF-8 byte. A non-ASCII document would silently skew
    * byte-vs-char slicing in both engines, so fail loudly instead: one
    * codegen'd per-row check (char length == byte length), zero cost on
    * the happy path. The library operators above stay byte-semantics-only
    * (a real media corpus is binary); only the oracle-facing query entry
    * points carry the guard. */
  private def asciiParityGuard(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("text").isNull || length(col("text")) === octet_length(col("text")),
        col("text"))
        .otherwise(raise_error(concat(
          lit("multimodal oracle parity broken: non-ASCII text in doc_id="),
          col("doc_id")))))

  def payloadStatsQuery(spark: SparkSession, dir: String): DataFrame =
    payloadStats(asciiParityGuard(Tables.documents(spark, dir)))

  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(asciiParityGuard(Tables.documents(spark, dir)))
      .orderBy("doc_id", "frame_idx")

  def decodeFeaturesQuery(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeStub(spark, withPayload(asciiParityGuard(Tables.documents(spark, dir))))
    feats.select(Seq(col("doc_id"), col("n_bytes")) ++
      (1 to 8).map(i => round(element_at(col("features"), i), 6).as(s"f$i")): _*)
  }
}
