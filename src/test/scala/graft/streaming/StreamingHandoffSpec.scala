package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming→batch handoff — the production shape: stop dup mass at
  * ingest ([[StreamingLsh.exactCandidates]]), run the exhaustive batch
  * prep ([[graft.analytics.PrepPipeline]]) behind. The laws:
  *
  *  1. digest parity — the streaming stage drops EXACTLY the batch
  *     [[graft.analytics.Dedup.exact]] non-keepers (same normalized-md5
  *     digest, min-id keeper), across micro-batch boundaries;
  *  2. handoff equivalence — `pipe_prep` over the ingest survivors
  *     produces the IDENTICAL manifest to `pipe_prep` over the full
  *     corpus, because digest equality is an equivalence relation and
  *     in-order arrival keeps each group's minimum.
  *
  * The raw synthetic corpus carries zero duplicate mass (every
  * normalized digest is unique — verified in DuckDB), so the spec
  * injects it: verbatim copies and normalized-equal variants (case and
  * whitespace edits) under fresh ids, exercising both drop paths. */
class StreamingHandoffSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus + injected duplicate mass, in doc_id order: 20 verbatim
    * copies, 10 case-mangled, 10 whitespace-padded (all normalized-equal
    * to their originals), plus one chain where the copy's copy arrives
    * in a later batch than the copy. */
  private lazy val corpus: Seq[(Long, String)] = {
    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val verbatim = base.take(20).map { case (id, t) => (10000L + id, t) }
    val cased = base.slice(20, 30).map { case (id, t) => (20000L + id, t.toUpperCase) }
    // normalized-equal whitespace variant: leading spaces (space-only trim
    // strips them) + doubled internal spaces (collapse restores them); a
    // trailing tab would NOT be equal — trim is space-only, so "t \t"
    // normalizes with a trailing space
    val padded = base.slice(30, 40).map { case (id, t) =>
      (30000L + id, "  " + t.replaceAll(" ", "  "))
    }
    val chain = Seq((40000L, base.head._2), (40001L, base.head._2))
    (base ++ verbatim ++ cased ++ padded ++ chain).sortBy(_._1)
  }

  private def streamDropped(docs: Seq[(Long, String)], nBatches: Int): Set[Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val name = s"handoff_${System.nanoTime()}"
    val q = StreamingLsh.exactCandidates(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val batches = docs.grouped(math.max(1, docs.size / nBatches)).toSeq
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[StreamDupCandidate].collect().map(_.doc_b).toSet
  }

  test("ingest exact-dedup drops exactly the batch non-keepers, across batch boundaries") {
    val docsDF = corpus.toDF("doc_id", "text")
    val dropped = streamDropped(corpus, nBatches = 5)
    val batchKeepers = graft.analytics.Dedup.exact(docsDF)
      .select("keep_doc_id").as[Long].collect().toSet
    val expectDropped = corpus.map(_._1).toSet -- batchKeepers
    assert(dropped == expectDropped,
      s"stream/batch divergence — stream-only: ${dropped -- expectDropped}, " +
        s"batch-only: ${expectDropped -- dropped}")
    // the injected mass was actually exercised: all 42 copies dropped
    assert(dropped.size == 42, s"expected the 42 injected duplicates, got ${dropped.size}")
    // case/whitespace variants dropped via NORMALIZED digest equality
    assert(dropped.exists(_ >= 20000L) && dropped.exists(_ >= 30000L))
  }

  test("pipe_prep over ingest survivors == batch-only pipe_prep (the handoff law)") {
    import graft.analytics.PrepPipeline
    val docsDF = corpus.toDF("doc_id", "text")
    val dropped = streamDropped(corpus, nBatches = 5)
    val survivors = docsDF.join(
      corpus.map(_._1).filterNot(dropped).toDF("doc_id"), "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    val full = rows(PrepPipeline.manifestOf(docsDF))
    val handoff = rows(PrepPipeline.manifestOf(survivors))
    assert(handoff == full,
      "handoff manifest diverged from the batch-only manifest — " +
        s"only-handoff: ${(handoff.toSet -- full.toSet).take(3)}, " +
        s"only-full: ${(full.toSet -- handoff.toSet).take(3)}")
    // the law is non-trivial: the manifests cover the original corpus
    // (injected dup ids all removed by one path or the other)
    assert(full.nonEmpty && full.forall(_._1 < 10000L))
  }
}
