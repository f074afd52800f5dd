package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned semi-join is exact and the prefilter actually prunes") {
    val fact = spark.range(10000).select($"id".as("fk"), ($"id" % 97).as("payload"))
    val dim = spark.range(100).select(($"id" * 7).as("dk")) // 0,7,...,693
    val got = BloomPrune.semiJoin(fact, "fk", dim, "dk", expectedItems = 1000, fpp = 0.01)
      .select("fk").as[Long].collect().toSeq.sorted
    val want = (0L until 100L).map(_ * 7).filter(_ < 10000).sorted
    assert(got == want, "bloom-pruned semi-join must equal the exact semi-join")
    // the prefilter alone (no exact verify) passes matches + <= ~fpp
    // residue — far below the full fact cardinality, which is the pruning
    // claim; 3x headroom over the nominal 1% bound avoids flakiness
    val bf = dim.stat.bloomFilter("dk", 1000, 0.01)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    val passed = fact
      .where(call_function("bloom_might_contain", lit(bytes), $"fk")).count()
    assert(passed >= 100 && passed <= 100 + (10000 * 0.03).toLong,
      s"prefilter passed $passed rows; expected ~100 matches + <=1% false positives")
  }

  test("bloom-pruned ANTI join: exact, novel mass bypasses the exchange, edges hold") {
    val fact = spark.range(10000).select($"id".as("fk"), ($"id" % 97).as("payload"))
    val dim = spark.range(100).select(($"id" * 7).as("dk"))
    val got = BloomPrune.antiJoin(fact, "fk", dim, "dk", expectedItems = 1000, fpp = 0.01)
      .select("fk").as[Long].collect().toSeq.sorted
    val want = fact.join(dim, $"fk" === $"dk", "left_anti")
      .select("fk").as[Long].collect().toSeq.sorted
    assert(got == want, "bloom-pruned anti join must equal the plain anti join")
    // empty dim: everything is novel
    val empty = dim.where(lit(false))
    assert(BloomPrune.antiJoin(fact, "fk", empty, "dk", 1000).count() == 10000)
    // null fact keys are treated as novel (no match is possible), the
    // same answer a plain left-anti join gives
    val factN = spark.range(10).select(
      when($"id" % 2 === 0, $"id").as("fk"), $"id".as("payload"))
    val gotN = BloomPrune.antiJoin(factN, "fk", dim, "dk", 1000)
      .select("payload").as[Long].collect().toSeq.sorted
    val wantN = factN.join(dim, $"fk" === $"dk", "left_anti")
      .select("payload").as[Long].collect().toSeq.sorted
    assert(gotN == wantN, s"null-key handling diverged: $gotN vs $wantN")
  }

  test("bloom_semi query equals a plain IN-subquery recomputation at sf0.001") {
    val got = graft.analytics.Relational.bloomSemi(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val nation = graft.Tables.nation(spark, sfDir)
      .where($"n_name" === "NATION_3").select("n_nationkey")
    val dimKeys = graft.Tables.supplier(spark, sfDir)
      .join(nation, $"s_nationkey" === $"n_nationkey").select("s_suppkey")
    val naive = graft.Tables.lineitem(spark, sfDir)
      .join(dimKeys, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"),
        (sum(round($"l_quantity" * 100, 0).cast("long")) / 100.0).as("total_qty"))
      .orderBy("l_suppkey").as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == naive)
  }

  test("same-named keys on both sides resolve (the blocklist shape)") {
    val fact = spark.range(50).select($"id".as("doc_id"))
    val block = spark.range(10).select(($"id" * 5).as("doc_id"))
    val got = BloomPrune.semiJoin(fact, "doc_id", block, "doc_id", expectedItems = 100)
      .as[Long].collect().toSeq.sorted
    assert(got == (0L until 50L by 5).toSeq)
  }

  test("non-integral keys (string digests) are exact, not silently empty/pass-through") {
    // the old bare cast("long") nulled string keys on BOTH sides: semi
    // matched nothing, anti passed everything — wrong answers, no error.
    // Now the bloom hashes xxhash64(key) and the verify join compares the
    // original strings, so both forms must equal their plain-join mirrors.
    val fact = spark.range(2000)
      .select(md5(conv($"id".cast("string"), 10, 16)).as("digest"), $"id".as("payload"))
    val dim = spark.range(300)
      .select(md5(conv(($"id" * 3).cast("string"), 10, 16)).as("digest"))
    val semiGot = BloomPrune.semiJoin(fact, "digest", dim, "digest", expectedItems = 500)
      .select("payload").as[Long].collect().toSeq.sorted
    val semiWant = fact.join(dim.withColumnRenamed("digest", "d2"),
        $"digest" === $"d2", "left_semi")
      .select("payload").as[Long].collect().toSeq.sorted
    assert(semiGot.nonEmpty && semiGot == semiWant,
      s"string-key semi join diverged (${semiGot.size} vs ${semiWant.size} rows)")
    val antiGot = BloomPrune.antiJoin(fact, "digest", dim, "digest", expectedItems = 500)
      .select("payload").as[Long].collect().toSeq.sorted
    val antiWant = fact.join(dim.withColumnRenamed("digest", "d2"),
        $"digest" === $"d2", "left_anti")
      .select("payload").as[Long].collect().toSeq.sorted
    assert(antiGot.size < 2000 && antiGot == antiWant,
      s"string-key anti join diverged (${antiGot.size} vs ${antiWant.size} rows)")
  }

  test("empty dimension yields the empty semi-join, not an NPE") {
    val fact = spark.range(100).select($"id".as("fk"))
    val dim = spark.range(0).select($"id".as("dk"))
    assert(BloomPrune.semiJoin(fact, "fk", dim, "dk", expectedItems = 10).count() == 0)
  }
}
