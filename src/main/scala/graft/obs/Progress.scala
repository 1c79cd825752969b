package graft.obs

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Progress/log-event tracking with pluggable sinks.
  * Reference: src/spark_fuse/utils/progress.py — validated `LogEventRecord`
  * (:33-56), buffered Delta table sink flushing every 50 records (:66-84),
  * tracker with log_start/end/error/... helpers (:86-409). The table sink
  * writes parquet here (no Delta in this runtime).
  */
final case class LogEventRecord(
    ts: Timestamp,
    level: String,
    event: String,
    message: String,
    context: Map[String, String]) {
  require(LogEventRecord.Levels.contains(level.toUpperCase),
    s"invalid level '$level'")
  /** Validation is case-insensitive, so storage must be too: sinks filter
    * on `level = 'INFO'` and a raw lowercase value would silently miss.
    */
  def normalized: LogEventRecord = copy(level = level.toUpperCase)
}

object LogEventRecord {
  val Levels: Set[String] =
    Set("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
  val Schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("level", StringType),
    StructField("event", StringType),
    StructField("message", StringType),
    StructField("context", MapType(StringType, StringType))))
}

/** Log-verbosity helper (enable_spark_logging, progress.py:412-445):
  * promote Spark's log level so shuffle-spill and scheduler diagnostics
  * surface, both via the public `setLogLevel` and directly on the log4j2
  * categories that emit them.
  */
object Logging {

  val DefaultSparkLoggers: Seq[String] = Seq(
    "org.apache.spark.storage", // shuffle spill diagnostics, memory store
    "org.apache.spark.scheduler", // stage progress
    "org.apache.spark.shuffle") // shuffle write/read details

  def enableSparkLogging(
      spark: SparkSession,
      level: String = "INFO",
      categories: Seq[String] = DefaultSparkLoggers): Unit = {
    spark.sparkContext.setLogLevel(level.toUpperCase)
    val l4jLevel = org.apache.logging.log4j.Level.toLevel(level.toUpperCase)
    categories.foreach { name =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(name, l4jLevel)
    }
  }
}

trait EventSink extends AutoCloseable {
  def emit(record: LogEventRecord): Unit
  def flush(): Unit
  override def close(): Unit = flush()
}

final class ConsoleEventSink extends EventSink {
  override def emit(r: LogEventRecord): Unit =
    // scalastyle:off println
    println(s"[${r.ts}] ${r.level} ${r.event}: ${r.message}")
  // scalastyle:on println
  override def flush(): Unit = ()
}

/** Buffered table sink: appends a batch every `flushEvery` records
  * (DeltaEventSink, progress.py:66-84 — parquet here).
  */
final class BufferedTableSink(
    spark: SparkSession,
    target: String,
    flushEvery: Int = 50) extends EventSink {
  require(flushEvery > 0, "flushEvery must be positive")
  private val buffer = mutable.ArrayBuffer[LogEventRecord]()

  override def emit(record: LogEventRecord): Unit = {
    buffer += record.normalized // sinks filter on 'level = INFO'
    if (buffer.length >= flushEvery) flush()
  }

  override def flush(): Unit = if (buffer.nonEmpty) {
    val rows = buffer.map(r =>
      Row(r.ts, r.level, r.event, r.message, r.context)).toSeq
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LogEventRecord.Schema)
    if (graft.ct.TableStore.isPath(target))
      df.write.mode("append").parquet(target)
    else df.write.mode("append").saveAsTable(target)
    buffer.clear()
  }
}

/** Progress tracker: counts processed units and routes log events to the
  * configured sinks.
  */
final class ProgressTracker(
    name: String,
    total: Option[Long] = None,
    sinks: Seq[EventSink] = Seq(new ConsoleEventSink)) extends AutoCloseable {

  private var processed = 0L

  private def log(level: String, event: String, message: String,
      context: Map[String, String] = Map.empty): Unit = {
    val record = LogEventRecord(
      new Timestamp(System.currentTimeMillis()), level.toUpperCase, event,
      message, context + ("tracker" -> name))
    sinks.foreach(_.emit(record))
  }

  def advance(n: Long = 1): Unit = {
    processed += n
    val pct = total.map(t => f" (${100.0 * processed / t}%.1f%%)").getOrElse("")
    log("DEBUG", "progress", s"$processed${total.map("/" + _).getOrElse("")}$pct")
  }

  def count: Long = processed

  def logStart(message: String): Unit = log("INFO", "start", message)
  def logEnd(message: String): Unit = log("INFO", "end", message)
  def logInfo(message: String): Unit = log("INFO", "info", message)
  def logWarn(message: String): Unit = log("WARN", "warn", message)
  def logError(message: String): Unit = log("ERROR", "error", message)
  def logDebug(message: String): Unit = log("DEBUG", "debug", message)
  def logTrace(message: String): Unit = log("TRACE", "trace", message)
  def logFatal(message: String): Unit = log("FATAL", "fatal", message)
  def logException(message: String, e: Throwable): Unit =
    log("ERROR", "exception", s"$message: ${e.getMessage}",
      Map("exception" -> e.getClass.getName))

  override def close(): Unit = sinks.foreach(_.close())
}
