package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-gate laws of the HTML boilerplate extraction (VERDICT r14 #6):
  * the link-density and text-density gates must drop chrome and
  * link-farm blocks and keep content, and the extraction must chain into
  * the c4 gate as a curation decision, never a silent empty. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(rows: (Long, String)*) =
    TextAnalysis.htmlExtract(TextAnalysis.htmlOf(rows.toDF("doc_id", "text")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("boilerplate drops, content survives: nav/h1/see-also/footer gated, paragraph kept in order") {
    val content = "alpha beta gamma delta epsilon zeta eta theta words enough here"
    val m = extract(7L -> content)
    val (nBlocks, nKept, text) = m(7L)
    assert(nBlocks === 7L, "the fixture renders 7 blocks")
    assert(nKept === 1L, "only the content paragraph passes both gates")
    assert(text === content, "tag strip must recover the paragraph byte-for-byte")
  }

  test("a link-farm content paragraph is dropped by the link-density gate") {
    // every word is 'spark' -> the fixture wraps each in an anchor, so
    // the block's text is almost entirely anchor text
    val m = extract(1L -> ("spark " * 12).trim)
    val (_, nKept, text) = m(1L)
    assert(nKept === 0L, "link-dense content must drop like nav chrome")
    assert(text === "")
  }

  test("short chrome blocks drop on text density even with zero links") {
    // content below minChars: every block including the paragraph drops
    val m = extract(2L -> "tiny words only")
    assert(m(2L)._2 === 0L)
  }

  test("the chained c4 gate turns extraction failures into curation verdicts") {
    val ex = TextAnalysis.htmlExtractQuery(spark, sfDir).collect()
    assert(ex.nonEmpty)
    ex.foreach { r =>
      val (nKept, reason) = (r.getLong(2), r.getString(7))
      if (nKept == 0L)
        assert(reason === "too_short",
          s"an empty extraction must gate as too_short, got $r")
    }
    // the gate sees the EXTRACTED text: ex_chars and n_tokens are
    // consistent (tokens of '' is the 1-element empty split)
    ex.foreach { r =>
      if (r.getLong(3) == 0L) assert(r.getLong(4) === 1L)
    }
    // both outcomes occur on the real corpus (the fixture's anchor
    // injection makes link density data-dependent)
    assert(ex.exists(_.getLong(2) == 1L) && ex.exists(_.getLong(2) == 0L),
      "fixture must exercise both keep and drop at the block gate")
  }

  test("pipe_prep_html: only extract-surviving, gate-passing docs enter the v7 manifest") {
    val manifest = PrepPipeline.manifestHtml(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    // columns: doc_id, n_blocks, n_kept, ex_chars, n_tokens, lang_pred, keep, reason
    val gate = TextAnalysis.htmlExtractQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(manifest.nonEmpty)
    assert(manifest.forall(gate(_)),
      "a doc that failed the post-extraction c4 gate must never reach the manifest")
    // the manifest is the gate's survivors minus dedup losers and
    // decontaminated train docs — a subset, never a superset
    assert(manifest.subsetOf(gate.filter(_._2).keySet))
  }
}
