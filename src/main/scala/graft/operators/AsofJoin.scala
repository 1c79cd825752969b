package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row whose
  * timestamp is <= the left timestamp, per join key (the standard
  * event-to-snapshot alignment for feature backfills).
  *
  * Beyond-reference operator (the reference has no joins beyond SCD
  * merges); Spark has no native as-of join. Formulated the scalable way:
  * tag and union both sides, ONE shuffle on (key), per-key
  * last-non-null carry-forward window — never the O(left × right) range
  * join. Matches DuckDB `ASOF LEFT JOIN` semantics (ties: right row at
  * exactly the left timestamp matches).
  *
  * At 100 TB: the union shuffles each row once on the join keys; the
  * window sorts within key partitions only. Right-side columns ride the
  * shuffle as one struct per row; skew follows key skew (salting does not
  * apply — the carry-forward needs full key ordering — so a pathological
  * single key falls back to per-key sort capacity).
  */
object AsofJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      build side (its latest-at-or-before row is joined);
    *                   must be unique per (keys, tsCol) — pre-aggregate
    *                   duplicates or the tie winner is arbitrary
    * @param keys       equi-join key columns (present on both sides)
    * @param tsCol      ordering column name (present on both sides; any
    *                   orderable type)
    * @param valueCols  right-side columns to attach (default: all right
    *                   columns except keys + tsCol)
    * @param rightTsAs  when set, also attach the matched right timestamp
    *                   under this name
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String] = Nil,
      rightTsAs: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .where(col(side) === 1)

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__asof_row.$c").as(c)) ++
        vals.map(v => col(s"$payload.$v").as(v)) ++
        rightTsAs.map(n => col(s"$payload.__asof_rts").as(n)).toSeq
    carried.select(outCols: _*)
  }
}
