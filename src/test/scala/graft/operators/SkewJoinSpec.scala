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
    // disable broadcast so the join shuffles on (key, salt) — with the dim
    // side broadcast there is no exchange and partition ids would reflect
    // the input layout, making the assertion vacuous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE would coalesce this KB-sized shuffle into one partition; the
    // assertion is about hash distribution, not size-based coalescing
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      def hotPartitions(salts: Int): Long =
        SkewJoin.saltedJoin(skewed, dim, "k", salts = salts)
          .where(col("name") === "name_1")
          .select(spark_partition_id()).distinct().count()
      // negative control: unsalted, the hot key hashes to exactly one task
      assert(hotPartitions(1) == 1, "control: salts=1 must keep the hot key on one task")
      val spread = hotPartitions(8)
      assert(spread > 1, s"hot key stayed on $spread task(s) — salting had no effect")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }
}
