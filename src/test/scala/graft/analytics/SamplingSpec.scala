package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash split: deterministic, total, and roughly proportioned") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = Sampling.split(docs, col("doc_id")).select("doc_id", "fold")
      .as[(Long, String)].collect().toMap
    val b = Sampling.split(docs.repartition(7), col("doc_id"))
      .select("doc_id", "fold").as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.size == docs.count())
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1 && math.abs(frac("val") - 0.1) < 0.06,
      s"fold fractions drifted: $frac")
  }

  test("group-aware split: keying by a group column keeps each group in one fold") {
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("author", col("doc_id") % 7)
    val folds = Sampling.split(docs, col("author"))
      .select("author", "fold").distinct().collect()
    assert(folds.length == 7, "each author must map to exactly one fold")
  }

  test("pack_sequences matches the exclusive-running-total law, recomputed exactly") {
    val got = Sampling.packSequences(graft.Tables.documents(spark, sfDir))
      .select("shard", "bin", "doc_id", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.map(_._1).distinct.length > 1)
    got.groupBy(_._1).foreach { case (_, rows) =>
      var running = 0L
      rows.sortBy(_._3).foreach { case (_, bin, id, n) =>
        assert(bin == running / 512, s"doc $id: bin $bin != ${running / 512}")
        running += n
      }
    }
  }
}
