package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame helpers + calendar/clock dimension generators.
  * Reference semantics: src/spark_fuse/utils/dataframe.py.
  */
object DataFrameUtils {

  /** String preview of head + schema. Ref: dataframe.py:18-22. */
  def preview(df: DataFrame, n: Int = 5): String = {
    val rows = df.limit(n).collect().toSeq.map(_.toString)
    s"rows=${rows.mkString("[", ", ", "]")}\nschema=${df.schema.simpleString}"
  }

  /** Validate that `df` contains all `required` columns. Ref: dataframe.py:25-33. */
  def ensureColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** Contiguous dates in [start, end] with calendar attributes.
    * Ref: dataframe.py:64-97. Built on `spark.range` + codegen'd date
    * functions — distributed generation, no driver-side materialization, so
    * arbitrarily wide ranges are fine.
    *
    * Output columns: dateCol, year, quarter, month, month_name, week, day,
    * day_of_week (1=Sunday..7=Saturday), day_name.
    */
  def createDateDataframe(
      spark: SparkSession,
      startDate: String,
      endDate: String,
      dateCol: String = "date"): DataFrame = {
    val start = LocalDate.parse(startDate)
    val end = LocalDate.parse(endDate)
    require(!end.isBefore(start), "endDate must not be earlier than startDate")
    val numRows = java.time.temporal.ChronoUnit.DAYS.between(start, end) + 1
    val baseDate = lit(start.toString).cast("date")
    spark.range(0, numRows)
      .select(date_add(baseDate, col("id").cast("int")).as(dateCol))
      .withColumn("year", year(col(dateCol)))
      .withColumn("quarter", quarter(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .withColumn("month_name", date_format(col(dateCol), "MMMM"))
      .withColumn("week", weekofyear(col(dateCol)))
      .withColumn("day", dayofmonth(col(dateCol)))
      .withColumn("day_of_week", dayofweek(col(dateCol)))
      .withColumn("day_name", date_format(col(dateCol), "EEEE"))
  }

  private def parseSeconds(value: String): Int = {
    val parts = value.split(":")
    require(parts.length == 2 || parts.length == 3,
      s"Invalid time string '$value'; expected 'HH:MM:SS' or 'HH:MM'")
    val h = parts(0).toInt
    val m = parts(1).toInt
    val s = if (parts.length == 3) parts(2).toInt else 0
    require(h >= 0 && h < 24 && m >= 0 && m < 60 && s >= 0 && s < 60,
      s"Invalid time string '$value'")
    h * 3600 + m * 60 + s
  }

  /** Evenly spaced times in [startTime, endTime] with clock attributes.
    * Ref: dataframe.py:100-153. Output: hour, minute, second (int), timeCol
    * ("HH:mm:ss" string).
    */
  def createTimeDataframe(
      spark: SparkSession,
      startTime: String,
      endTime: String,
      intervalSeconds: Int = 60,
      timeCol: String = "time"): DataFrame = {
    require(intervalSeconds > 0, "intervalSeconds must be a positive integer")
    val startSeconds = parseSeconds(startTime)
    val endSeconds = parseSeconds(endTime)
    require(endSeconds >= startSeconds,
      "endTime must not be earlier than startTime within the same day")
    val span = endSeconds - startSeconds
    require(span % intervalSeconds == 0,
      "Time span must be evenly divisible by intervalSeconds")
    val steps = span / intervalSeconds
    val secs = (col("id") * lit(intervalSeconds) + lit(startSeconds)).cast("int")
    spark.range(0, steps + 1L)
      .select(secs.as("_s"))
      .withColumn("hour", floor(col("_s") / 3600).cast("int"))
      .withColumn("minute", floor((col("_s") % 3600) / 60).cast("int"))
      .withColumn("second", (col("_s") % 60).cast("int"))
      .withColumn(timeCol,
        format_string("%02d:%02d:%02d", col("hour"), col("minute"), col("second")))
      .drop("_s")
  }
}
