package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` / `hll_union_agg` family — codegen'd
  * aggregates, no UDF).
  *
  * Beyond-reference. The 100 TB pattern this serves: "distinct users per
  * (day, source)" where the daily job must not rescan history. Store one
  * small binary sketch per fine-grained group per run; any coarser
  * rollup — distinct-over-a-month, distinct-over-all-sources — is a
  * merge of the stored sketches, never a recount. Exact
  * `count_distinct` cannot do this: distinct counts are not additive, so
  * every rollup re-shuffles the raw keys. Sketches make the rollup
  * O(groups), with a standard-error of about 1.04/sqrt(2^lgConfigK)
  * (~1.6 % at the default lgConfigK = 12, ~410 bytes per group).
  *
  * Not SQL-expressible in the DuckDB oracle (different HLL
  * implementation) → spec-verified error bounds plus a rows-only
  * `q_distinct_rollup` entry, same contract as `q_ann_ivf`.
  */
object Sketches {

  /** One mergeable sketch per group: (groupCols..., sketch binary).
    * This is the WRITE side of the incremental pattern — persist the
    * result keyed by the finest grouping you will ever roll up from.
    */
  def distinctSketches(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      lgConfigK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"))
  }

  /** Roll stored sketches up to a coarser grouping and estimate:
    * (rollupCols..., distinct_est). `rollupCols` may be empty for a
    * global estimate (one row). Merging never touches raw keys — the
    * input here is the O(groups)-sized sketch table, not the corpus.
    */
  def rollupDistinct(
      sketches: DataFrame,
      rollupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col(sketchCol)))
      .as("distinct_est")
    if (rollupCols.isEmpty) sketches.agg(merged)
    else sketches.groupBy(rollupCols.map(col): _*).agg(merged)
  }
}
