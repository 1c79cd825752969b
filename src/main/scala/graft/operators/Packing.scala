package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign documents to fixed
  * token-budget bins so short documents share a training sequence instead
  * of wasting pad tokens.
  *
  * Beyond-reference. The scalable formulation is cumulative-sum packing:
  * order documents deterministically within a shard, take the running
  * token total, and cut a new bin every time the running total crosses a
  * budget boundary — `bin = floor(exclusive_cumsum / budget)`. This is the
  * standard streaming approximation of bin packing (true first-fit is
  * inherently sequential): each bin's total stays within
  * `budget + max(doc_tokens) - 1`, and a document longer than the budget
  * occupies its own bin(s) worth of space. Everything is windows over the
  * shard key — one shuffle, no driver state, reproducible by any engine.
  */
object Packing {

  /** Adds `bin` (0-based, per shard) and `bin_offset` (the document's
    * exclusive running-token start within its shard).
    *
    * `shardCols` bounds the window: packing is per shard, so at 100 TB
    * each shard's ordered cumsum runs inside one task's partition of the
    * shard — never a single global ordering. Shard by whatever already
    * partitions the corpus (split, source, date bucket).
    */
  def packSequences(
      df: DataFrame,
      tokenCol: String,
      budget: Long,
      orderCols: Seq[Column],
      shardCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(orderCols.nonEmpty,
      "orderCols must be non-empty (packing must be deterministic)")
    require(shardCols.nonEmpty,
      "shardCols must be non-empty: a global ordered cumsum cannot scale; " +
        "shard by a column that already partitions the corpus")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCols: _*)
    val cum = sum(col(tokenCol)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("bin_offset", (cum - col(tokenCol)).cast("long"))
      .withColumn("bin", floor(col("bin_offset") / budget))
  }
}
