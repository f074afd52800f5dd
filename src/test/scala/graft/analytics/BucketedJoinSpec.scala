package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing — the shuffle-avoidance technique for repeated fact⋈fact
  * joins at corpus scale: both tables bucketed on the join key at write
  * time join WITHOUT an Exchange (each bucket pair joins in place). The
  * lineitem⋈orders join is the one shuffle the TPC-H surface cannot
  * broadcast away; bucketed layout removes it for every downstream run
  * that reuses the tables. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // external tables (explicit path): the static warehouse dir is unused
    val wh = Files.createTempDirectory("graft_wh").toString
    val db = s"bkt_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    try {
      val li = graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/$db/li_b").saveAsTable(s"$db.li_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/$db/ord_b").saveAsTable(s"$db.ord_b")

      // disable broadcast so the join strategy is decided by layout alone
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.li_b")
          .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
        // the join itself must consume the bucketed layout directly: no
        // shuffle on either side (the only allowed Exchange in the WHOLE
        // plan is the final groupBy's, whose key differs from the bucket
        // key — with unbucketed inputs this plan has three)
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toList
        assert(exchanges.length <= 1,
          s"bucketed join must not shuffle its inputs; found ${exchanges.length} exchanges:\n$plan")
        // and the result must match the shuffled formulation — compared
        // with a tolerance: the two plans sum doubles in different orders,
        // and exact equality of round(.,2) would flake when a true sum
        // sits at a rounding boundary
        val reference = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
        val a = joined.orderBy("o_orderpriority")
          .collect().map(r => (r.getString(0), r.getDouble(1)))
        val b = reference.orderBy("o_orderpriority")
          .collect().map(r => (r.getString(0), r.getDouble(1)))
        assert(a.length == b.length)
        a.zip(b).foreach { case ((ka, va), (kb, vb)) =>
          assert(ka == kb && math.abs(va - vb) <= 0.011, s"$ka: $va vs $vb")
        }
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql(s"DROP DATABASE $db CASCADE")
      // CASCADE drops only metadata for external (explicit-path) tables —
      // remove the parquet payload too
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(wh))
    }
  }
}
