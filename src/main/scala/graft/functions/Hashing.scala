package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic row hashing used by change tracking and dedup operators.
  *
  * Semantics match the reference (src/spark_fuse/utils/change_tracking.py:24-25,
  * 272-274): each input column is cast to string with nulls normalized to the
  * empty string, joined with the U+241F unit-separator glyph, and SHA-256
  * hashed to lowercase hex. The delimiter + null coalescing are
  * semantics-bearing — they make the hash stable across batches and engines.
  *
  * Scale note: pure codegen'd column expressions (sha2/concat_ws/coalesce) —
  * no UDF, stays inside whole-stage codegen, safe at any scale.
  */
object Hashing {

  /** U+241F SYMBOL FOR UNIT SEPARATOR — concatenation delimiter. */
  val UnitSeparator = "\u241f"

  private def stringify(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** SHA-256 hex hash of the given columns with stable null handling. */
  def rowHash(cols: Seq[Column]): Column =
    sha2(concat_ws(UnitSeparator, cols.map(stringify): _*), 256)

  /** Convenience: hash named columns. */
  def rowHashOf(columnNames: Seq[String]): Column = rowHash(columnNames.map(col))

  /** Null-DISTINGUISHING row hash: like [[rowHash]] but every column also
    * contributes an explicit is-null flag, so NULL and `''` (and NULL vs
    * any value) always hash apart — `IS DISTINCT FROM` comparison
    * semantics. [[rowHash]] deliberately keeps the reference's NULL ≡ `''`
    * contract for change tracking; use THIS where that collision would
    * hide a real difference (e.g. snapshot diffing, where a NULL→`''`
    * change must report as changed).
    */
  def nullAwareRowHash(cols: Seq[Column]): Column =
    sha2(concat_ws(UnitSeparator, cols.flatMap(c => Seq(
      when(c.isNull, lit("n")).otherwise(lit("v")), stringify(c))): _*), 256)

  /** Engine-reproducible bucket in [0, modulus): first 7 hex chars of
    * sha256(key:salt) as a long, mod `modulus`. The shared idiom behind
    * `Sampling.hashBucket` (split/sample assignment) and
    * `Selection.termBucket` (DSIR feature hashing) — the exact expression
    * the DuckDB oracles rebuild as
    * `('0x' || substring(sha256(key || ':salt'), 1, 7))::BIGINT % modulus`,
    * so keep the two in lockstep when changing either.
    */
  def hexPrefixBucket(key: Column, salt: String, modulus: Long): Column =
    VectorFunctions.hexPrefixToLong(
      sha2(concat_ws(":", key, lit(salt)), 256), 7) % modulus

  /** Stable bucket id in [0, numBuckets) from the given key columns.
    *
    * xxhash64 over the same stringified/null-coalesced concatenation as
    * [[rowHash]], so the assignment is deterministic across batches and
    * independent of physical layout. Codegen'd, no UDF.
    */
  def bucketOf(keyColumns: Seq[String], numBuckets: Int): Column = {
    require(numBuckets > 0, "numBuckets must be positive")
    pmod(xxhash64(concat_ws(UnitSeparator, keyColumns.map(c => stringify(col(c))): _*)),
      lit(numBuckets.toLong)).cast("int")
  }
}
