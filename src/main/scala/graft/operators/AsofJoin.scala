package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row nearest in time
  * per join key — the standard event-to-snapshot alignment for feature
  * backfills. Three directions:
  *
  *  - `backward` (default): most recent right row with ts <= left ts —
  *    DuckDB `ASOF LEFT JOIN … l.ts >= r.ts` semantics (a right row at
  *    exactly the left timestamp matches);
  *  - `forward`: earliest right row with ts >= left ts (DuckDB ASOF with
  *    `l.ts <= r.ts`) — "next maintenance window after the event";
  *  - `nearest`: whichever of the two is closer in time, ties to the
  *    BACKWARD match (pandas `merge_asof` convention). Requires a
  *    NUMERIC ordering column (distance needs subtraction — cast
  *    timestamps to epoch numbers upstream, same contract as
  *    [[RangeJoin]]).
  *
  * Beyond-reference operator (the reference has no joins beyond SCD
  * merges); Spark has no native as-of join. Formulated the scalable way:
  * tag and union both sides, ONE shuffle on (key), per-key
  * last/first-non-null carry window — never the O(left × right) range
  * join. `nearest` runs two window passes (one per direction) over the
  * SAME exchange: one shuffle, two in-partition sorts.
  *
  * At 100 TB: the union shuffles each row once on the join keys; the
  * window sorts within key partitions only. Right-side columns ride the
  * shuffle as one struct per row; skew follows key skew (salting does not
  * apply — the carry-forward needs full key ordering — so a pathological
  * single key falls back to per-key sort capacity).
  */
object AsofJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      build side (its matched row is joined);
    *                   must be unique per (keys, tsCol) — pre-aggregate
    *                   duplicates or the tie winner is arbitrary
    * @param keys       equi-join key columns (present on both sides)
    * @param tsCol      ordering column name (present on both sides; any
    *                   orderable type; numeric for `nearest`)
    * @param valueCols  right-side columns to attach (default: all right
    *                   columns except keys + tsCol)
    * @param rightTsAs  when set, also attach the matched right timestamp
    *                   under this name
    * @param direction  `backward` | `forward` | `nearest` (see object doc)
    * @param tolerance  when set, a match farther than this from the left
    *                   timestamp (|left.ts − right.ts| > tolerance) is
    *                   dropped — the row keeps null right columns, pandas
    *                   `merge_asof(tolerance=...)` semantics. A stale
    *                   snapshot is often worse than none for a feature
    *                   backfill. Requires a numeric ordering column (the
    *                   distance needs subtraction), same contract as
    *                   `nearest`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String] = Nil,
      rightTsAs: Option[String] = None,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest" || tolerance.isDefined)
      require(left.schema(tsCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        "nearest/tolerance need a numeric ordering column (distance " +
          "requires subtraction) — cast timestamps to epoch numbers upstream")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val vals =
      if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val missing = (keys :+ tsCol) ++ vals
    require(missing.forall(right.columns.contains),
      s"right side missing columns: ${missing.filterNot(right.columns.contains).mkString(", ")}")
    require((keys :+ tsCol).forall(left.columns.contains),
      s"left side missing columns: ${(keys :+ tsCol).filterNot(left.columns.contains).mkString(", ")}")

    val payload = "__asof_payload"
    val side = "__asof_side" // 0 = right, 1 = left → right sorts first on ties
    // A null-timestamp snapshot never matches (DuckDB ASOF excludes null
    // keys); without this filter nulls sort first ascending and their
    // payload would carry into every row of the key. Null-ts LEFT rows are
    // kept and get a null payload (nothing sorts at-or-before them).
    val rTagged = right.where(col(tsCol).isNotNull).select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as(side) :+
        struct((vals.map(col) :+ col(tsCol).as("__asof_rts")): _*).as(payload)): _*)
    // capture every left column as one struct BEFORE narrowing to the
    // union schema, so the final projection restores the full left row
    val lTagged = left
      .withColumn("__asof_row", struct(left.columns.map(col): _*))
      .select(
        (keys.map(col) :+ col(tsCol) :+ lit(1).as(side) :+
          lit(null).cast(rTagged.schema(payload).dataType).as(payload) :+
          col("__asof_row")): _*)
    val rWithRow = rTagged.withColumn("__asof_row",
      lit(null).cast(lTagged.schema("__asof_row").dataType))

    val unioned = rWithRow.unionByName(lTagged.select(rWithRow.columns.map(col): _*))
    // backward: at equal ts the right row (side 0) sorts BEFORE the left
    // row, so at-or-before includes it; forward mirrors the trick with
    // side DESC so at-or-after includes the same-ts right row
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = (direction match {
      case "backward" => unioned
        .withColumn(payload, last(col(payload), ignoreNulls = true).over(wBack))
      case "forward" => unioned
        .withColumn(payload, first(col(payload), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        val b = last(col(payload), ignoreNulls = true).over(wBack)
        val f = first(col(payload), ignoreNulls = true).over(wFwd)
        unioned
          .withColumn("__asof_b", b)
          .withColumn("__asof_f", f)
          .withColumn(payload,
            when(col("__asof_b").isNull, col("__asof_f"))
              .when(col("__asof_f").isNull, col("__asof_b"))
              // strictly closer forward wins; ties go BACKWARD
              .when(abs(col(tsCol) - col("__asof_f.__asof_rts")) <
                abs(col(tsCol) - col("__asof_b.__asof_rts")), col("__asof_f"))
              .otherwise(col("__asof_b")))
          .drop("__asof_b", "__asof_f")
    }).where(col(side) === 1)

    // A NULL-ts left row must match NOTHING (the contract above, and
    // DuckDB ASOF semantics). Backward gets this for free — nulls sort
    // first ascending, so nothing precedes them — but the forward window
    // [currentRow, unboundedFollowing] from a first-sorted null spans
    // EVERY right row of the key and would attach the earliest snapshot.
    val nullSafe = carried.withColumn(payload,
      when(col(tsCol).isNotNull, col(payload)))

    // tolerance gate AFTER the carry: the nearest in-window match either
    // qualifies or the row has no match at all — a per-row null-out, not
    // a re-search (exactly merge_asof's contract)
    val bounded = tolerance.fold(nullSafe)(tol => nullSafe.withColumn(payload,
      when(abs(col(tsCol) - col(s"$payload.__asof_rts")) <= tol,
        col(payload))))

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__asof_row.$c").as(c)) ++
        vals.map(v => col(s"$payload.$v").as(v)) ++
        rightTsAs.map(n => col(s"$payload.__asof_rts").as(n)).toSeq
    bounded.select(outCols: _*)
  }
}
