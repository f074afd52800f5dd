package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrepPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipe_prep manifest: stage laws hold end-to-end") {
    val m = PrepPipeline.manifest(spark, sfDir)
      .as[(Long, String, Long, Option[Long], Option[Long])].collect().toSeq
    assert(m.nonEmpty)
    val byId = m.map(r => r._1 -> r).toMap
    assert(byId.size == m.size, "one row per surviving doc")

    val docs = graft.Tables.documents(spark, sfDir)
    // 1. every survivor passed the quality gate
    val keep = TextAnalysis.c4Filter(docs).where($"keep")
      .select("doc_id").as[Long].collect().toSet
    assert(m.forall(r => keep(r._1)), "survivors must pass the c4 gate")
    // 2. every survivor is its digest group's keeper (min doc_id)
    val keepers = Dedup.exact(docs.join(keep.toSeq.toDF("doc_id"), "doc_id"))
      .select("keep_doc_id").as[Long].collect().toSet
    assert(m.forall(r => keepers(r._1)), "survivors must be dedup keepers")
    // 3. packed exactly the train rows; eval rows unpacked but present
    m.foreach { case (id, fold, _, shard, bin) =>
      assert((fold == "train") == (shard.isDefined && bin.isDefined),
        s"doc $id ($fold): shard/bin iff train")
    }
    // 4. no surviving train doc shares a 13-gram with any eval doc
    val folds = Sampling.split(docs.select("doc_id"), col("doc_id"))
      .select("doc_id", "fold")
    val dd = docs.select("doc_id", "text")
      .join(keepers.toSeq.toDF("doc_id"), "doc_id")
    val leakingTrain = Dedup.contaminationPairs(dd, folds)
      .select("train_doc").as[Long].collect().toSet
    assert(m.filter(_._2 == "train").forall(r => !leakingTrain(r._1)),
      "no surviving train doc may leak into eval")
    // 5. eval-fold keepers all survive (decontamination never drops eval)
    val evalKeepers = folds.join(dd, "doc_id").where($"fold" =!= "train")
      .select("doc_id").as[Long].collect().toSet
    assert(evalKeepers.forall(byId.contains), "every eval keeper survives")
  }
}
