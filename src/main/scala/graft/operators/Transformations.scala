package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Pure column transformations, re-expressed Spark-Scala-first.
  *
  * Reference semantics: src/spark_fuse/utils/transformations.py (rename /
  * constants / cast / whitespace / date-format split). All operators are
  * single-projection column expressions — narrow, codegen'd, no shuffle —
  * so they scale linearly with input size.
  */
object Transformations {

  /** Rename columns per `mapping`, preserving column order.
    * One `select` projection (not N chained renames).
    * Ref: transformations.py:33-57.
    *
    * @throws IllegalArgumentException on missing sources or resulting duplicates.
    */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    if (mapping.isEmpty) return df
    val missing = mapping.keys.filterNot(df.columns.contains).toSeq
    require(missing.isEmpty, s"Cannot rename missing columns: ${missing.mkString(", ")}")
    val finalNames = df.columns.map(n => mapping.getOrElse(n, n))
    require(finalNames.distinct.length == finalNames.length,
      "Renaming results in duplicate column names")
    df.select(df.columns.map { n =>
      val out = mapping.getOrElse(n, n)
      if (out == n) col(n) else col(n).alias(out)
    }.toIndexedSeq: _*)
  }

  /** Add literal-valued columns. Ref: transformations.py:60-86.
    *
    * @param overwrite replace existing columns when true; otherwise adding an
    *                  existing column name throws.
    */
  def withConstants(
      df: DataFrame,
      constants: Seq[(String, Any)],
      overwrite: Boolean = false): DataFrame = {
    if (constants.isEmpty) return df
    if (!overwrite) {
      val dups = constants.map(_._1).filter(df.columns.contains)
      require(dups.isEmpty, s"Columns already exist: ${dups.mkString(", ")}")
    }
    // single withColumns call → one projection
    df.withColumns(constants.map { case (n, v) => n -> lit(v) }.toMap)
  }

  /** Cast named columns (string type specs), preserving column order.
    * Ref: transformations.py:92-113.
    */
  def castColumns(df: DataFrame, typeMapping: Map[String, String]): DataFrame =
    castColumnsTo(df, typeMapping.map { case (k, v) =>
      k -> org.apache.spark.sql.types.DataType.fromDDL(v)
    })

  /** Cast named columns (DataType specs), preserving column order. */
  def castColumnsTo(df: DataFrame, typeMapping: Map[String, DataType]): DataFrame = {
    if (typeMapping.isEmpty) return df
    val missing = typeMapping.keys.filterNot(df.columns.contains).toSeq
    require(missing.isEmpty, s"Cannot cast missing columns: ${missing.mkString(", ")}")
    df.select(df.columns.map { n =>
      typeMapping.get(n) match {
        case Some(dt) => col(n).cast(dt).alias(n)
        case None => col(n)
      }
    }.toIndexedSeq: _*)
  }

  /** Collapse repeated whitespace in string columns; optionally trim ends.
    * Ref: transformations.py:119-160. Duplicated names are applied once.
    */
  def normalizeWhitespace(
      df: DataFrame,
      columns: Seq[String],
      trimEnds: Boolean = true,
      pattern: String = "\\s+",
      replacement: String = " "): DataFrame = {
    val targets = columns.distinct
    if (targets.isEmpty) return df
    val missing = targets.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Cannot normalize missing columns: ${missing.mkString(", ")}")
    df.withColumns(targets.map { n =>
      val replaced = regexp_replace(col(n), pattern, replacement)
      n -> (if (trimEnds) trim(replaced) else replaced)
    }.toMap)
  }

  /** Result of [[splitByDateFormats]]: all rows with the parsed date column,
    * plus the unmatched subset (parse failed under every format).
    */
  final case class DateSplitResult(df: DataFrame, unmatched: DataFrame)

  /** Parse a string column against an ordered list of date formats.
    *
    * Semantics per format: `to_date(try_to_timestamp(col, fmt))`; the first
    * matching format wins (`coalesce` in declaration order). Unmatched rows
    * are handled per `handleErrors`:
    *  - "null"    keep rows, parsed column null (default)
    *  - "default" substitute `defaultValue` cast to date
    *  - "strict"  throw if any row is unmatched
    *
    * Ref: transformations.py:166-263. The reference splits the frame into
    * per-format partitions and re-unions; this implementation is a single
    * projection over the same expression tree — identical row multiset, one
    * pass, no repeated scan (the reference re-reads the input once per
    * format, which would be pathological at 100 TB).
    */
  def splitByDateFormats(
      df: DataFrame,
      column: String,
      formats: Seq[String],
      handleErrors: String = "null",
      defaultValue: Option[String] = None,
      outputColumn: Option[String] = None): DateSplitResult = {
    require(df.columns.contains(column), s"Column '$column' not found in DataFrame")
    val parsedColumn = outputColumn.getOrElse(s"${column}_date")
    require(!(df.columns.contains(parsedColumn) && parsedColumn != column),
      s"Output column '$parsedColumn' already exists")
    val formatList = formats.distinct
    require(formatList.nonEmpty, "At least one date format must be provided")
    val mode = handleErrors.toLowerCase
    require(Set("null", "strict", "default").contains(mode),
      s"Unsupported handleErrors mode '$handleErrors'")
    require(mode != "default" || defaultValue.isDefined,
      "defaultValue must be provided when handleErrors='default'")

    val parsedExprs: Seq[Column] =
      formatList.map(fmt => to_date(try_to_timestamp(col(column), lit(fmt))))
    val parsedExpr =
      if (parsedExprs.length == 1) parsedExprs.head else coalesce(parsedExprs: _*)
    val matchedExpr = parsedExpr.isNotNull

    val withParsed = df.withColumn(parsedColumn, parsedExpr)
    val unmatched = withParsed.filter(!matchedExpr)

    val combined = mode match {
      case "strict" =>
        if (!unmatched.isEmpty)
          throw new IllegalArgumentException(
            "Unmatched rows detected while handleErrors='strict'")
        withParsed
      case "default" =>
        withParsed.withColumn(
          parsedColumn,
          when(matchedExpr, col(parsedColumn))
            .otherwise(lit(defaultValue.get).cast("date")))
      case _ => withParsed // "null": unmatched rows keep a null parsed column
    }
    DateSplitResult(combined, unmatched)
  }
}
