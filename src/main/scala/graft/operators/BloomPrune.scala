package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Bloom-filter semi-join pruning — the manual form of the runtime
  * filter a warehouse pushes to the fact scan when a selective dimension
  * bounds a much larger fact table.
  *
  * Shape: one distributed aggregation builds a Bloom filter over the
  * dimension keys (`DataFrameStatFunctions.bloomFilter` — only the final
  * KB..MB-sized bitmap ever reaches the driver); the serialized filter
  * ships to every fact partition as a literal, where the codegen'd
  * `bloom_might_contain` predicate drops non-matching rows AT THE SCAN,
  * before any exchange; the exact left-semi join afterwards removes the
  * false-positive residue (≤ fpp of the pruned stream). At 100 TB the
  * win is shuffle volume: the semi-join's exchange sees only
  * `|matching| + fpp × |fact|` rows instead of `|fact|`.
  *
  * Spark's own AQE runtime filter (`InjectRuntimeFilter`) applies the
  * same idea behind cost thresholds it controls; this operator is the
  * explicit, always-on form for when the pipeline KNOWS the dimension is
  * selective (e.g. a decontamination blocklist, a fold's doc-id set), and
  * it reuses Spark's native `BloomFilterMightContain` expression — the
  * codegen'd predicate the optimizer itself injects — rather than a
  * boxed UDF.
  */
object BloomPrune {

  /** Map a key column to the LONG the bloom filter hashes. Integral
    * types cast losslessly; everything else (string digests, decimals,
    * binary) is hashed with the codegen'd `xxhash64` — an explicit,
    * type-safe reduction. The old bare `cast("long")` turned a string
    * digest into NULL on BOTH sides, so the scan predicate and the
    * verify join silently matched nothing (semi → empty, anti → pass-
    * through) — a wrong answer, not an error. The bloom/scan predicate
    * only needs any deterministic long per key; exactness comes from the
    * verify join, which compares the ORIGINAL columns (see below). */
  private def keyAsLong(df: DataFrame, key: String): Column =
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(key).cast("long")
      case _                                             => xxhash64(col(key))
    }

  /** Exact left-semi join of `fact` onto `dim`'s key set, bloom-pruned
    * before the shuffle. `expectedItems`/`fpp` size the filter
    * (`n ln fpp / ln² 2` bits ≈ 1.2 MB at 1M items, 1% fpp). Integral
    * keys hash directly; other types go through `xxhash64` for the bloom
    * while the exact join still compares the original values. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // project + RENAME the dim key up front: with factKey == dimKey (a
    // blocklist keyed like the fact — the common case) the verify join's
    // condition would otherwise be the ambiguous `col(k) === col(k)`.
    // Persisted because the operator evaluates the dim subtree more than
    // once (emptiness probe, bloom aggregation, verify join) and a
    // computed blocklist can be expensive; the returned frame reads the
    // cache lazily, so the entries are reclaimed by the caller's cache
    // sweep (Bench/Verify drop all persisted RDDs per query) or the
    // ContextCleaner — same convention as Dedup.dupClusters' labels.
    val dk0 = dim.select(col(dimKey).as("__dko")).distinct()
    val dk = dk0.withColumn("__dk", keyAsLong(dk0, "__dko")).persist()
    // an empty dimension (a blocklist with nothing on it) has an empty
    // semi-join; stat.bloomFilter NPEs on zero rows, so short-circuit
    // (isEmpty materializes the cache the two later passes reuse)
    if (dk.isEmpty) return fact.where(lit(false))
    val bf = dk.stat.bloomFilter("__dk", expectedItems, fpp)
    val bytes = { val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    fact
      .where(call_function("bloom_might_contain", lit(bytes), keyAsLong(fact, factKey)))
      .join(dk.select("__dko"), col(factKey) === col("__dko"), "left_semi")
  }

  /** Exact left-ANTI join (keep fact rows whose key is NOT in `dim`),
    * bloom-pruned: a bloom filter proves ABSENCE with certainty, so any
    * row it rejects is definitely novel and is emitted STRAIGHT FROM THE
    * SCAN — no shuffle at all; only the bloom-positive sliver (true
    * matches + ≤ fpp of the stream) pays the exact anti join. This is
    * the incremental-ingest dedup shape: at 100 TB of mostly-novel
    * incoming data the exchange sees `|dups| + fpp × |fact|` rows while
    * the overwhelming novel mass streams through scan-side codegen.
    * NULL fact keys route to the exact branch (a null predicate is not
    * a rejection) and survive it — an equi-anti-join keeps rows whose
    * condition can never match — i.e. unknown-key rows are treated as
    * novel, the same answer a plain left-anti join gives. Output row
    * order between the two branches is not defined (union). */
  def antiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val dk0 = dim.select(col(dimKey).as("__dko")).distinct()
    val dk = dk0.withColumn("__dk", keyAsLong(dk0, "__dko")).persist()
    if (dk.isEmpty) return fact // nothing ingested yet: everything is novel
    val bf = dk.stat.bloomFilter("__dk", expectedItems, fpp)
    val bytes = { val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    val might = call_function("bloom_might_contain", lit(bytes), keyAsLong(fact, factKey))
    fact.where(not(coalesce(might, lit(true)))) // bloom-rejected: certainly novel
      .unionByName(
        fact.where(coalesce(might, lit(true)))
          .join(dk.select("__dko"), col(factKey) === col("__dko"), "left_anti"))
  }
}
