package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for keyed shuffles.
  *
  * Spark's partial aggregation (map-side combine) and AQE's skew-join
  * splitting cover most skew; these helpers cover the two cases they don't:
  * a shuffle join where one hot key floods a single reducer and the build
  * side is too large to broadcast, and a distinct-aggregate whose per-key
  * distinct set is itself huge.
  *
  * All salts are deterministic column expressions (xxhash64-based, no
  * rand()), so results are reproducible and retries are safe.
  */
object Skew {

  private def saltCol(from: Column, n: Int): Column =
    pmod(xxhash64(from), lit(n.toLong)).cast("int")

  /** Pre-shuffle skew diagnostics: the top-`k` hottest key combinations
    * with exact counts, micro-unit shares (`cnt·10⁶ ÷ total`, integer
    * division — engine-exact), and rank — what to run BEFORE a big
    * keyed join/aggregate to know whether [[saltedJoin]] (or AQE alone)
    * is enough. One hash aggregate with map-side partials + a
    * TakeOrdered; the corpus never sorts globally. NULL keys count as a
    * real combination (they flood a reducer like any hot key).
    */
  def skewReport(
      df: DataFrame,
      keyCols: Seq[String],
      k: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val total = df.count()
    require(total > 0, "skewReport: empty input — nothing to diagnose")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, struct(keyCols.map(col): _*).asc)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, struct(keyCols.map(col): _*).asc)
      .limit(k)
      // integer `div`, not `/` (Spark divides longs into doubles)
      .withColumn("share_micros",
        expr(s"(cnt * CAST(1000000 AS BIGINT)) div CAST($total AS BIGINT)"))
      .withColumn("rank", row_number().over(w))
  }

  /** Data-driven salt plan for the keys that actually need salting:
    * every key combination whose row count exceeds `targetRowsPerTask`
    * gets `salts = ceil(cnt / target)` — feed the hot keys to an n-way
    * [[saltedJoin]] (n = max salts) or route them separately, and leave
    * the cold tail to AQE. Exact integer arithmetic; one hash
    * aggregate + a count-threshold filter, output is hot-key-sized.
    */
  def saltPlan(
      df: DataFrame,
      keyCols: Seq[String],
      targetRowsPerTask: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(targetRowsPerTask >= 1,
      s"targetRowsPerTask must be >= 1, got $targetRowsPerTask")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > targetRowsPerTask)
      .withColumn("salts", expr(
        s"(cnt + CAST(${targetRowsPerTask - 1L} AS BIGINT)) div " +
          s"CAST($targetRowsPerTask AS BIGINT)"))
  }

  /** Equi-join with an n-way salt on the (skewed) left side.
    *
    * Left rows get a deterministic salt in [0, n) derived from `saltFrom`
    * (default: the whole left row via all left columns — any column with
    * per-row variety works; pick a high-cardinality one for best spread).
    * The right side is replicated n times, and the join runs on
    * `keys :+ salt`, so one hot key's rows spread over n reducers instead
    * of one.
    *
    * Cost model: right side is shuffled n×. Worth it exactly when the hot
    * key's reducer is the stage's critical path and the right side is too
    * big to broadcast. Only join types that cannot duplicate or drop
    * unmatched RIGHT rows are allowed (inner/left/left_semi/left_anti) —
    * a right/full outer over a replicated right side would emit unmatched
    * right rows n times.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner",
      saltFrom: Option[Column] = None): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType'")
    val salt = "__graft_salt"
    val saltSrc = saltFrom.getOrElse(concat_ws(
      graft.functions.Hashing.UnitSeparator, left.columns.map(col).toIndexedSeq: _*))
    val l = left.withColumn(salt, saltCol(saltSrc, saltFactor))
    val r = right.withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ salt, joinType).drop(salt)
  }

  /** Skew-safe `count(DISTINCT valueCol)` per key.
    *
    * Stage 1 groups by (keys, salt(valueCol)) — every distinct value lands
    * in exactly one salt bucket, so per-bucket distinct counts are disjoint
    * and stage 2 can just sum them. Two shuffles, but no reducer ever holds
    * more than ~1/n of a hot key's distinct set (count_distinct on a single
    * hot key otherwise builds the whole set on one reducer).
    */
  def saltedCountDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFactor: Int,
      outputCol: String = "distinct_count"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salt = "__graft_salt"
    df.withColumn(salt, saltCol(col(valueCol), saltFactor))
      .groupBy((keys :+ salt).map(col): _*)
      .agg(count_distinct(col(valueCol)).as("__graft_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__graft_partial")).as(outputCol))
  }
}
