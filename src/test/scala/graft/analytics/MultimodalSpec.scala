package graft.analytics

import graft.SparkSpec

/** Frame-sampling laws: bounded per-doc fan-out, strided indexes, and
  * digests that match a hand-computed slice. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("frameSample: bounded fan-out, strided frame indexes, exact slice digests") {
    val text = ("ab" * 400) + "tail" // 804 bytes -> 25 full 32-byte frames
    val docs = Seq(
      (1L, text),
      (2L, "short"),          // < 1 frame: must be absent
      (3L, "x" * 64)          // exactly 2 frames -> 1 sample (ceil(2/4)=1)
    ).toDF("doc_id", "text")
    val rows = Multimodal.frameSample(docs)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    assert(!rows.contains(2L), "sub-frame doc emits nothing")
    val d1 = rows(1L).sortBy(_._2)
    // 25 frames / stride 4 -> ceil = 7 samples, under the cap of 8
    assert(d1.map(_._2).toSeq == Seq(0L, 4L, 8L, 12L, 16L, 20L, 24L))
    assert(d1.forall(_._3 == 25L))
    // digest of frame 4 = md5 of bytes [128, 160)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(128, 160).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.find(_._2 == 4L).get._4 == expected)
    val d3 = rows(3L)
    assert(d3.map(_._2).toSeq == Seq(0L), "2 frames at stride 4 -> one sample")
  }

  test("frameSample: fan-out capped at maxFrames for arbitrarily large payloads") {
    val docs = Seq((1L, "y" * 100000)).toDF("doc_id", "text") // 3125 frames
    val rows = Multimodal.frameSample(docs).collect()
    assert(rows.length == 8, s"cap of 8 samples, got ${rows.length}")
  }
}
