package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Output-layout control: sized files and clustered (range + sorted) data
  * layout.
  *
  * At 100 TB the dominant failure mode of a long-lived table is not a wrong
  * row but a wrong LAYOUT: millions of kilobyte files (one per task per
  * micro-batch) that turn every downstream scan into a listing + open storm,
  * or rows scattered so that min/max row-group pruning never eliminates
  * anything. These writers fix both at write time:
  *
  *  - [[writeCompacted]]: choose the file count from the data's actual byte
  *    size so files land near `targetFileBytes` (the 100–512 MB sweet spot
  *    for parquet on object storage), instead of inheriting whatever
  *    partition count the upstream shuffle happened to have.
  *  - [[writeClustered]]: additionally range-partition and sort by the
  *    clustering columns, so each file owns a disjoint key range and a
  *    filtered scan prunes to the few files whose min/max overlap the
  *    predicate — the poor man's Z-order, exact for prefix predicates on
  *    the leading cluster column.
  */
object Compaction {

  /** Catalyst's size estimate for the plan's output, in bytes. Exact-ish
    * for file-source scans (sum of file sizes); coarse for computed plans
    * (joins multiply). When the input is a transformed plan, prefer passing
    * an explicit file count to the writers.
    */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** File count targeting `targetFileBytes` per file, clamped to
    * [1, maxFiles]. */
  def targetFileCount(
      df: DataFrame,
      targetFileBytes: Long,
      maxFiles: Int = 1 << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val n = (estimatedBytes(df) + targetFileBytes - 1) / targetFileBytes
    n.min(maxFiles).max(1).toInt
  }

  /** Write `df` as ~`targetFileBytes` parquet files (round-robin
    * repartition — even file sizes, no key skew). `numFiles` overrides the
    * size estimate when the caller knows better.
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetFileBytes: Long = 128L << 20,
      numFiles: Int = -1,
      mode: String = "overwrite"): Unit = {
    val n = if (numFiles > 0) numFiles else targetFileCount(df, targetFileBytes)
    df.repartition(n).write.mode(mode).parquet(path)
  }

  /** Write `df` range-partitioned and sorted by `clusterCols`: each output
    * file owns a disjoint range of the leading cluster column, so filtered
    * scans prune on parquet min/max. One extra range-exchange (with a
    * sampling pass to pick bounds) versus [[writeCompacted]] — the read
    * amplification it saves on every later scan pays that back on the
    * first filtered query.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      numFiles: Int = -1,
      mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    val n = if (numFiles > 0) numFiles else targetFileCount(df, targetFileBytes)
    val cols = clusterCols.map(col)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /** Rewrite an existing parquet directory into ~`targetFileBytes` files,
    * atomically: the compacted copy is staged next to the original and
    * swapped in via [[graft.ct.TableStore]]'s crash-recoverable rename
    * protocol — readers see either the old layout or the new one, never a
    * half-written directory, and a crash mid-swap rolls forward on the
    * next write.
    */
  def compactInPlace(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20,
      clusterCols: Seq[String] = Nil): Unit = {
    // a partitionBy-layout directory (col=value subdirs) must not be
    // rewritten flat: the partition column would become a data column, and
    // the next partitioned append would mix layouts in one directory —
    // partition discovery then fails or misreads. Refuse loudly.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val partitioned = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).filter(n => n.contains("=") && !n.startsWith("."))
      require(partitioned.isEmpty,
        s"'$path' has partitioned layout (${partitioned.take(3).mkString(", ")}" +
          "…) — compactInPlace would flatten it; rewrite partition-aware " +
          "(e.g. per-partition compaction or a fresh partitionBy write) instead")
    }
    val df = spark.read.parquet(path)
    val n = targetFileCount(df, targetFileBytes)
    val shaped =
      if (clusterCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
    graft.ct.TableStore.overwrite(spark, shaped, path)
  }
}
