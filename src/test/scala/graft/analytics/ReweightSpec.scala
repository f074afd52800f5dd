package graft.analytics

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Laws for [[Dedup.reweight]] — SoftDedup-style duplicate-aware
  * training weights. */
class ReweightSpec extends SparkSpec {
  import spark.implicits._

  test("constructed clusters: sizes, weights, and singleton passthrough") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // {1,2,3} one cluster (chain), {4,5} another; no singletons in pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.reweight(docs, pairs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 2L), (5L, 4L, 2L)))
    val w = out.map(_.getDouble(3))
    assert(w.take(3).forall(_ == 0.333333) && w.drop(3).forall(_ == 0.5))
  }

  test("total weight equals cluster count; members share size; singletons weigh 1") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.reweight(docs, Dedup.simhashPairs(docs)).cache()
    val nClusters = out.select(countDistinct("cluster")).head().getLong(0)
    // Σ weight = #clusters up to the round-6 quantization (each cluster
    // contributes size * round(1/size, 6))
    val total = out.agg(sum("weight")).head().getDouble(0)
    assert(math.abs(total - nClusters) < 1e-3,
      s"total weight $total vs $nClusters clusters")
    // every member of a cluster carries the same size, and that size is
    // the member count
    val bad = out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), min("cluster_size").as("mn"), max("cluster_size").as("mx"))
      .where(col("n") =!= col("mn") || col("mn") =!= col("mx"))
    assert(bad.isEmpty, "cluster_size inconsistent with member count")
    assert(out.where(col("cluster_size") === 1 && col("weight") =!= 1.0).count() == 0)
    // weights bounded (0, 1]
    assert(out.where(col("weight") <= 0 || col("weight") > 1).count() == 0)
    out.unpersist()
  }
}
