package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection and removal — the ExactSubstr
  * deduplication of Lee et al. 2021 ("Deduplicating Training Data Makes
  * Language Models Better"), re-expressed for Spark. Instead of a
  * monolithic suffix array (single-machine, memory-bound at corpus
  * scale), every `w`-token window is hashed in-row and duplicated
  * windows are found with one corpus exchange; any token run of length
  * ≥ w shared between two places in the corpus is guaranteed to produce
  * at least one duplicated window inside it, so maximal repeated runs
  * surface as merged islands of duplicated window positions.
  *
  * Scale shape, per stage:
  *  - window hashing: pure per-row expressions (the [[TextAnalysis]]
  *    shifted-copy fold + posexplode + xxhash64) — no shuffle; the
  *    window STRING dies before the exchange, only (id, pos, h1, h2)
  *    rows travel.
  *  - duplicate marking: ONE hash exchange of those ~28-byte rows,
  *    via `count over (partition by h1, h2)` — deliberately a window
  *    function, not groupBy-count + self-join, which would shuffle the
  *    same stream AND pay a second join exchange.
  *  - island merge: one exchange of the HIT rows only (duplicated
  *    positions — for a mostly-clean corpus a small fraction of the
  *    stream), partitioned by document.
  *
  * Exactness: group identity is the 128-bit composite (xxhash64(win),
  * xxhash64(salt, win)). At 10^13 windows (≈100 TB of text) the
  * collision expectation is n²/2·2⁻¹²⁸ ≈ 10⁻¹³ — no verify-join
  * needed. A single 64-bit hash would already collide ~thousands of
  * times at that scale, which is why the key is a pair.
  */
object ExactSubstrings {

  /** Positions (1-based) of every `w`-token window whose exact token
    * content occurs at least `minCount` times corpus-wide. Columns:
    * `idCol`, `pos`. Documents shorter than `w` tokens contribute no
    * windows (the [[TextAnalysis.shingles]] short-doc truncated shingle
    * is filtered out here — a partial window is not a w-gram).
    */
  def repeatedWindowPositions(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 10,
      minCount: Int = 2,
      salt: String = "graft-es"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val toks = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= w)
    val wins = toks
      .select(col(idCol),
        posexplode(TextAnalysis.shinglesOfTokens(col("__toks"), w))
          .as(Seq("__p0", "__win")))
      .select(col(idCol), (col("__p0") + 1).as("pos"),
        xxhash64(col("__win")).as("__h1"),
        xxhash64(lit(salt), col("__win")).as("__h2"))
    val overHash = Window.partitionBy("__h1", "__h2")
    wins
      .withColumn("__c", count(lit(1)).over(overHash))
      .where(col("__c") >= minCount)
      .select(col(idCol), col("pos"))
  }

  /** Maximal repeated token spans per document: islands of duplicated
    * window positions merged wherever two windows overlap or touch
    * (next start ≤ previous start + w). Columns: `idCol`, `span_start`,
    * `span_end` (1-based token positions, inclusive), `span_tokens`.
    *
    * Every repeated run of ≥ w tokens is covered by one span; spans can
    * over-extend a genuine repeat by at most w−1 tokens on each side
    * only when two distinct repeats overlap — the same granularity
    * trade the suffix-array formulation makes when merging repeated
    * extents.
    */
  def repeatedSpans(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 10,
      minCount: Int = 2,
      salt: String = "graft-es"): DataFrame = {
    val hits = repeatedWindowPositions(df, idCol, textCol, w, minCount, salt)
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val newIsland =
      when(lag("pos", 1).over(byDoc).isNull
        || col("pos") - lag("pos", 1).over(byDoc) > w, 1).otherwise(0)
    hits
      .withColumn("__isl", sum(newIsland).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(w - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .drop("__isl")
  }

  /** Documents with every repeated span cut out of the token stream:
    * columns `idCol`, `kept_text` (surviving tokens joined by single
    * spaces — whitespace runs are NOT preserved; this operator feeds a
    * tokenizer, not a renderer), `removed_tokens`. Every input document
    * appears exactly once — span-free and sub-`w`-token documents pass
    * through with `removed_tokens = 0`.
    *
    * The span table is re-aggregated per document (bounded: spans per
    * doc ≤ tokens/w) and joined back — an equi-join Spark will broadcast
    * while the duplicated fraction is small and shuffle-join once it
    * isn't; both are the right plan at their respective scales.
    */
  def removeRepeatedSpans(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 10,
      minCount: Int = 2,
      salt: String = "graft-es"): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, w, minCount, salt)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        filter(col("__toks"), (t, i) =>
          !coalesce(exists(col("__spans"), s =>
            i + 1 >= s("s") && i + 1 <= s("e")), lit(false)))
          .as("__kept"),
        col("__toks"))
      .select(
        col(idCol),
        concat_ws(" ", col("__kept")).as("kept_text"),
        (size(col("__toks")) - size(col("__kept"))).as("removed_tokens"))
  }
}
