package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval range join.
  *
  * Beyond-reference. Spark has no native range-join strategy: a plain
  * `p.join(i, p("x") >= i("s") && p("x") <= i("e"))` plans as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side is
  * broadcastable) — O(|points| · |intervals|) comparisons, the classic
  * 100 TB cliff for "match events to campaign windows / sessions to
  * maintenance slots / reads to genomic regions" workloads.
  *
  * Mechanism (the standard bucketized rewrite, same family as Databricks'
  * range-join optimization): quantize the domain into `bucketWidth`-wide
  * buckets; each interval fans out to the buckets it covers, each point to
  * exactly one bucket; an equi-join on the bucket id (plus any
  * `extraKeys`) produces candidates and the exact BETWEEN predicate
  * verifies them. Each interval meets each matching point in exactly one
  * bucket (the point's), so no post-join dedup is needed.
  *
  * Scale shape: ONE equi-shuffle on (bucket, extraKeys) instead of a
  * nested loop; candidate count per bucket ≈ points-in-bucket ×
  * intervals-overlapping-bucket. Pick `bucketWidth` near the typical
  * interval length: wider buckets = fewer interval duplicates but more
  * false candidates, narrower = the reverse. Interval fan-out is bounded
  * loudly by `maxBucketsPerInterval` — a degenerate whole-domain interval
  * would otherwise explode into the full bucket range (such intervals
  * belong on a broadcast path, not in the fan-out). With
  * `broadcastWideIntervals = true` that broadcast path actually exists:
  * intervals spanning more buckets than the bound are split off, joined
  * to the points by a broadcast + BETWEEN filter (no fan-out, no
  * shuffle — each point meets each wide interval once by construction),
  * and unioned with the bucketized result. The contract is that such
  * intervals are FEW (global campaign windows, catch-all maintenance
  * slots) — they are literally broadcast. Bucket skew (a hot time
  * window) is AQE skew-join territory, same as any keyed join.
  *
  * Columns: `points` and `intervals` must not share column names except
  * `extraKeys` (checked). Both range columns must be numeric (cast dates/
  * timestamps to epoch numbers upstream; integer-exact below 2^53).
  * Output: all point columns + all interval columns, inner-join semantics
  * on `pointCol BETWEEN startCol AND endCol` (inclusive both ends).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096,
      broadcastWideIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val clash = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(clash.isEmpty,
      s"points and intervals share non-key columns: ${clash.mkString(", ")}")
    require(!points.columns.contains("__bucket")
        && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by rangeJoin")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / bucketWidth).cast("long")
    val bStart = bucketOf(col(startCol))
    val bEnd = bucketOf(col(endCol))
    // inverted (end < start) and NULL-bounded intervals match nothing
    // under BETWEEN — drop them here, exactly as the naive join would,
    // instead of fanning a descending sequence / crashing on a null guard
    val valid = intervals.where(col(startCol) <= col(endCol))
    val isWide = bEnd - bStart >= lit(maxBucketsPerInterval.toLong)
    val narrow = if (broadcastWideIntervals) valid.where(!isWide) else valid
    val fanned = narrow.withColumn("__bucket", explode(sequence(
      bStart,
      // fail loud instead of fanning a degenerate interval across the domain
      when(bEnd - bStart < lit(maxBucketsPerInterval.toLong), bEnd)
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
            s"buckets of width $bucketWidth ("), col(startCol), lit(".."),
          col(endCol), lit(") — route it via broadcastWideIntervals=true"))).cast("long")))))
    val bucketed = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val fromBuckets = bucketed.join(fanned, Seq("__bucket") ++ extraKeys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
    if (!broadcastWideIntervals) fromBuckets
    else {
      // the hot-bucket escape hatch: wide intervals skip the fan-out and
      // meet every point via a broadcast + exact BETWEEN (an equality on
      // extraKeys when present). Disjoint by construction from the
      // bucketized candidates, so a plain unionByName is exact.
      val wide = broadcast(valid.where(isWide))
      val fromWide = (if (extraKeys.isEmpty) points.join(wide)
        else points.join(wide, extraKeys))
        .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      fromBuckets.unionByName(fromWide.select(fromBuckets.columns.map(col): _*))
    }
  }

  /** Bucketized interval-OVERLAP join: every (left, right) pair whose
    * CLOSED intervals intersect — `lStart <= rEnd AND rStart <= lEnd` —
    * the genomics/session-vs-session/window-vs-window sibling of
    * [[pointInInterval]], which Spark would likewise plan as a nested
    * loop.
    *
    * Mechanism: both sides fan out to the buckets they cover and
    * equi-join on (bucket, extraKeys); a pair is kept only in its
    * CANONICAL bucket — the bucket of `greatest(lStart, rStart)`, i.e.
    * where the overlap begins, which both sides provably cover — so an
    * overlapping pair survives exactly once and NO post-join dedup
    * shuffle exists. The exact overlap predicate then discards bucket
    * coincidences.
    *
    * Scale shape: one equi-shuffle on (bucket, extraKeys); fan-out per
    * interval is `span/bucketWidth`, loudly capped by
    * `maxBucketsPerInterval`. Wide RIGHT intervals (catch-all windows)
    * route via `broadcastWideRight = true` — broadcast + exact
    * predicate, disjoint from the bucketized candidates by
    * construction. Wide LEFT intervals always fail loud: put the side
    * that may carry catch-alls on the right. Inverted (end < start)
    * and NULL-bounded intervals match nothing on either side, exactly
    * as the naive predicate would.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      bucketWidth: Long,
      extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096,
      broadcastWideRight: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val clash = left.columns.toSet
      .intersect(right.columns.toSet) -- extraKeys
    require(clash.isEmpty,
      s"left and right share non-key columns: ${clash.mkString(", ")}")
    require(!left.columns.contains("__bucket")
        && !right.columns.contains("__bucket"),
      "__bucket is reserved by rangeJoin")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / bucketWidth).cast("long")
    def fanOut(df: DataFrame, s: String, e: String, side: String): DataFrame = {
      val bs = bucketOf(col(s))
      val be = bucketOf(col(e))
      df.withColumn("__bucket", explode(sequence(
        bs,
        when(be - bs < lit(maxBucketsPerInterval.toLong), be)
          .otherwise(raise_error(concat(
            lit(s"intervalOverlap: $side interval spans more than " +
              s"$maxBucketsPerInterval buckets of width $bucketWidth ("),
            col(s), lit(".."), col(e),
            lit(if (side == "right")
              ") — route it via broadcastWideRight=true"
            else
              ") — wide left intervals are unsupported; swap the sides"))
          ).cast("long")))))
    }
    val overlap =
      col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol)
    val lValid = left.where(col(lStartCol) <= col(lEndCol))
    val rValid = right.where(col(rStartCol) <= col(rEndCol))
    val rWide = bucketOf(col(rEndCol)) - bucketOf(col(rStartCol)) >=
      lit(maxBucketsPerInterval.toLong)
    val rNarrow = if (broadcastWideRight) rValid.where(!rWide) else rValid
    val fromBuckets = fanOut(lValid, lStartCol, lEndCol, "left")
      .join(fanOut(rNarrow, rStartCol, rEndCol, "right"),
        Seq("__bucket") ++ extraKeys)
      .where(overlap &&
        col("__bucket") === bucketOf(greatest(col(lStartCol), col(rStartCol))))
      .drop("__bucket")
    if (!broadcastWideRight) fromBuckets
    else {
      val wide = broadcast(rValid.where(rWide))
      val fromWide = (if (extraKeys.isEmpty) lValid.join(wide)
        else lValid.join(wide, extraKeys))
        .where(overlap)
      fromBuckets.unionByName(fromWide.select(fromBuckets.columns.map(col): _*))
    }
  }
}
