package graft.analytics

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces emails, URLs, and long digit runs; counts are audited") {
    val docs = Seq(
      (1L, "contact bob.smith+x@corp.example.com or see https://ex.com/a?b=1 now"),
      (2L, "call 5551234567 ref 12345678901 ok"),
      (3L, "clean text with short 123 number"),
      (4L, ""),
      (5L, "ref https://ex.com/1234567890 done") // digits INSIDE the url
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redact(docs).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got(0)._2 == "contact <EMAIL> or see <URL> now" && got(0)._3 == 2)
    assert(got(1)._2 == "call <NUM> ref <NUM> ok" && got(1)._3 == 2)
    assert(got(2)._2 == "clean text with short 123 number" && got(2)._3 == 0)
    assert(got(3)._2 == "" && got(3)._3 == 0)
    // one visible tag => count 1, not url+digits double-counted
    assert(got(4)._2 == "ref <URL> done" && got(4)._3 == 1)
  }
}
