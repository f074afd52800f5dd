package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hash helpers.
  *
  * Everything is derived from md5 hex strings because md5 is bit-identical
  * across Spark and any ANSI-ish oracle engine — unlike `hash()` /
  * `xxhash64` whose seeds and algorithms are engine-specific. This is what
  * makes MinHash/SimHash signatures oracle-checkable.
  */
object Hashes {

  /** 60-bit unsigned value from the first 15 hex chars of md5 — fits a
    * signed 64-bit in every engine (DuckDB: `('0x'||substr(md5(x),1,15))::UBIGINT::BIGINT`). */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit value from the first 8 hex chars of md5 (DuckDB:
    * `('0x'||substr(md5(x),1,8))::UBIGINT::BIGINT`). */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: the j-th independent hash function, h_j(x) = md5(j ++ ":" ++ x). */
  def md5Long60Seeded(j: Int, c: Column): Column =
    md5Long60(concat(lit(s"$j:"), c))

  /** j-th hash via Kirsch–Mitzenmacher: h_j(x) = h1(x) + j·h2(x), with h1/h2
    * the two 32-bit halves of ONE md5 — 16 hash functions for the price of
    * one digest (the per-row md5 is the dominant cost of MinHash
    * signatures at corpus scale; codegen's subexpression elimination
    * computes `md5(c)` once per row). Max value < 2^36, so BIGINT-exact in
    * every engine (DuckDB mirror:
    * `('0x'||substr(md5(x),1,8))::UBIGINT::BIGINT + j*('0x'||substr(md5(x),9,8))::UBIGINT::BIGINT`). */
  def md5KmSeeded(j: Int, c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") +
      lit(j.toLong) * conv(substring(md5(c), 9, 8), 16, 10).cast("long")
}
