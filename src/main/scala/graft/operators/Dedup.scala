package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.{hash60, shingles, tokens}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: signatures/fingerprints are per-row column expressions (no
  * shuffle); candidate generation shuffles once on band/bucket keys, so the
  * quadratic pair space is never materialized — only same-bucket pairs are
  * joined. Verification runs on candidates only.
  */
object Dedup {

  /** Exact dedup: keep the first row (by `orderCol`) per distinct value of
    * the dedup columns' row hash. A windowed rank, not dropDuplicates, so
    * the survivor choice is deterministic.
    */
  def exactDedup(df: DataFrame, dedupCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window
      .partitionBy(graft.functions.Hashing.rowHashOf(dedupCols))
      .orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature as an array<bigint> of length `numPerms`: permutation
    * p's value is the minimum 60-bit hash of `p:shingle` over the document's
    * word `shingleSize`-gram shingles. Empty docs → null signature.
    */
  def minhashSignature(text: Column, numPerms: Int, shingleSize: Int): Column = {
    require(numPerms >= 1, "numPerms must be >= 1")
    val sh = shingles(text, shingleSize)
    when(size(sh) === 0, lit(null).cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), lit(numPerms - 1)),
        p => array_min(transform(sh,
          s => hash60(concat(p.cast("string"), lit(":"), s))))))
  }

  /** LSH band hashes: the signature is split into `bands` bands of
    * `rowsPerBand` values; each band is hashed to a 60-bit bucket key.
    */
  def lshBandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => hash60(concat_ws(",",
        transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))

  /** MinHash+LSH candidate duplicate pairs with signature-estimated Jaccard.
    *
    * Pipeline: per-row signature (narrow) → explode band hashes → self-join
    * on (band, bucket) → distinct ordered pairs → estimate Jaccard as the
    * fraction of equal signature positions → filter by `threshold`.
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numPerms == bands * (numPerms / bands) && numPerms % bands == 0,
      "numPerms must be divisible by bands")
    val rowsPerBand = numPerms / bands
    val sigs = df
      .select(col(idCol).as("__id"),
        minhashSignature(col(textCol), numPerms, shingleSize).as("__sig"))
      .where(col("__sig").isNotNull)
    val banded = sigs.select(col("__id"), col("__sig"),
      posexplode(lshBandHashes(col("__sig"), bands, rowsPerBand)).as(Seq("__band", "__bucket")))
    val left = banded.select(col("__band"), col("__bucket"),
      col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val right = banded.select(col("__band"), col("__bucket"),
      col("__id").as("id_b"), col("__sig").as("__sig_b"))
    val pairs = left.join(right, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sig_a"), col("__sig_b"))
      .dropDuplicates("id_a", "id_b")
    val est = size(filter(zip_with(col("__sig_a"), col("__sig_b"),
      (a, b) => when(a === b, lit(1)).otherwise(lit(null)))
      , x => x.isNotNull)).cast("double") / numPerms
    pairs
      .withColumn("est_jaccard", round(est, 6))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash fingerprint over whitespace tokens.
    *
    * Bit b of the fingerprint is 1 iff the sum over tokens of ±1 (sign of
    * bit b of the token's 60-bit hash) is positive. Pure expressions; the
    * bit test uses modular arithmetic (`h % 2^(b+1) >= 2^b`) so the same
    * formula runs on any engine. Empty docs → 0.
    */
  def simhash(text: Column, bits: Int = 32): Column = {
    require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")
    val powers = array((0 until bits).map(b => lit(1L << b)): _*)
    val hashes = transform(tokens(text), t => hash60(t))
    val zero = transform(sequence(lit(0), lit(bits - 1)), _ => lit(0L))
    val bitSums = aggregate(hashes, zero, (acc, h) =>
      zip_with(acc, powers, (a, p) =>
        a + when(h % (p * 2) >= p, lit(1L)).otherwise(lit(-1L))))
    aggregate(zip_with(bitSums, powers,
      (s, p) => when(s > 0, p).otherwise(lit(0L))), lit(0L), (a, x) => a + x)
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of the two texts' distinct word n-gram shingle sets. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    val inter = size(array_intersect(sa, sb))
    val uni = size(array_union(sa, sb))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  /** Cosine similarity between two numeric array columns (summed in element
    * order — deterministic).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(ad, lit(0.0), (s, v) => s + v * v))
    val nb = sqrt(aggregate(bd, lit(0.0), (s, v) => s + v * v))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Embedding-cosine near-duplicate pairs within blocking keys.
    *
    * `blockCols` bounds the pair space (at scale: an LSH bucket, coarse
    * cluster id, or shard key — never an unblocked cross join).
    * Output: (id_a, id_b, cos) with id_a < id_b and cos >= threshold.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCols: Seq[String],
      threshold: Double): DataFrame = {
    val a = df.select(
      blockCols.map(col) ++ Seq(col(idCol).as("id_a"), col(vecCol).as("__va")): _*)
    val b = df.select(
      blockCols.map(col) ++ Seq(col(idCol).as("id_b"), col(vecCol).as("__vb")): _*)
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
