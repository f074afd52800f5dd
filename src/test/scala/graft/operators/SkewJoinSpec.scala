package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val rnd = new scala.util.Random(3)
    // 90% of rows share key 1 — the dominant-key shape
    (1 to 2000).map(i => (if (rnd.nextDouble() < 0.9) 1L else (i % 20) + 2L, i.toLong))
      .toDF("k", "v")
  }
  private lazy val dim = (1L to 21L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted join returns exactly the rows of the plain join") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.length == 2000)
  }

  test("the hot key's rows actually spread across multiple tasks") {
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", salts = 8)
    val hotPartitions = salted.where(col("name") === "name_1")
      .select(spark_partition_id()).distinct().count()
    assert(hotPartitions > 1,
      s"hot key stayed on $hotPartitions task(s) — salting had no effect")
  }
}
