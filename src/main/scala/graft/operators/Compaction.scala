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
      mode: String = "overwrite",
      bloomFilters: Map[String, Long] = Map.empty): Unit = {
    val n = if (numFiles > 0) numFiles else targetFileCount(df, targetFileBytes)
    withBloomOptions(df.repartition(n).write, bloomFilters)
      .mode(mode).parquet(path)
  }

  /** Parquet write-side bloom filters for the given columns (name →
    * expected distinct values, sizing the filter's bit array). Worth it
    * for high-cardinality POINT-LOOKUP keys — doc ids, url hashes,
    * business keys — where min/max row-group stats prune nothing because
    * every row group spans most of the key domain: the bloom filter lets
    * the reader skip a row group on `key = x` with no false negatives,
    * turning "scan the table for one document" into touching only the
    * row groups whose filter fires (~1% false-positive rate at the
    * default parquet sizing). Range and sort layout are unaffected;
    * readers that ignore bloom filters (DuckDB et al.) read the file
    * normally.
    */
  private def withBloomOptions(
      w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      bloomFilters: Map[String, Long])
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    bloomFilters.foldLeft(w) { case (acc, (c, ndv)) =>
      require(ndv > 0, s"expected NDV for $c must be positive, got $ndv")
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
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
      mode: String = "overwrite",
      bloomFilters: Map[String, Long] = Map.empty): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    val n = if (numFiles > 0) numFiles else targetFileCount(df, targetFileBytes)
    val cols = clusterCols.map(col)
    withBloomOptions(
      df.repartitionByRange(n, cols: _*)
        .sortWithinPartitions(cols: _*)
        .write, bloomFilters)
      .mode(mode).parquet(path)
  }

  /** Morton (Z-order) interleave key over 2-4 numeric/timestamp columns:
    * each value is min-max scaled to `bits` bits (one stats aggregation
    * over `df`, passed in as `stats`), then the bit-planes are interleaved
    * so nearby keys are nearby in EVERY dimension at once. Pure shift/mask
    * expressions — codegen'd, no UDF. NULLs scale to 0 (they cluster
    * together at the low corner rather than breaking the write). Scaled
    * values are CLAMPED to [0, 2^bits-1]: with stats that don't cover the
    * data's actual range (stale, or hand-supplied), an out-of-range value
    * would otherwise bleed its high bits into other dimensions' interleave
    * positions and silently scramble the layout — clamped, it just
    * saturates at the corner ([[writeZOrdered]] computes stats from `df`
    * itself, so clamping matters only for external callers).
    */
  /** Shared min-max scaling for the space-filling-curve keys: each
    * column clamped into [0, 2^bits-1] as a LONG, NULLs to 0.
    */
  private def curveScaled(
      cols: Seq[String],
      stats: Map[String, (Double, Double)],
      bits: Int): Seq[org.apache.spark.sql.Column] = {
    val maxVal = (1L << bits) - 1
    cols.map { c =>
      val (lo, hi) = stats(c)
      val span = if (hi > lo) hi - lo else 1.0
      org.apache.spark.sql.functions.greatest(
        org.apache.spark.sql.functions.lit(0L),
        org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.lit(maxVal),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.round(
              (col(c).cast("double") - lo) / span * maxVal, 0).cast("long"),
            org.apache.spark.sql.functions.lit(0L))))
    }
  }

  def zorderKey(
      zCols: Seq[String],
      stats: Map[String, (Double, Double)],
      bits: Int = 16): org.apache.spark.sql.Column = {
    val k = zCols.size
    require(k >= 2 && k <= 4, s"z-order needs 2-4 columns, got $k")
    require(bits >= 1 && k * bits <= 62, s"k*bits must fit a long: $k*$bits")
    val scaled = curveScaled(zCols, stats, bits)
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftrightunsigned}
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (v, ci)) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(v, i).bitwiseAND(lit(1L)), i * k + ci))
      }
    }
  }

  /** Hilbert index key over 2-6 numeric/timestamp columns: the same
    * clamped min-max scaling as [[zorderKey]], then the Skilling
    * transform ([[graft.functions.HilbertKeyExpr]], codegen'd static
    * call). Consecutive Hilbert keys always differ by ONE unit step in
    * ONE dimension — unlike Morton, which teleports across the space at
    * power-of-two boundaries — so range-partitioned files cover tighter
    * hyper-rectangles and multi-column min/max pruning cuts deeper.
    */
  def hilbertKey(
      hCols: Seq[String],
      stats: Map[String, (Double, Double)],
      bits: Int = 16): org.apache.spark.sql.Column = {
    val k = hCols.size
    require(k >= 2 && k <= 6, s"hilbert needs 2-6 columns, got $k")
    require(bits >= 1 && k * bits <= 62, s"k*bits must fit a long: $k*$bits")
    graft.functions.HilbertKeyExpr(curveScaled(hCols, stats, bits), bits)
  }

  /** Write `df` Z-ORDERED on `zCols`: range-partitioned and sorted by the
    * Morton key, so each file (and row group) covers a small hyper-
    * rectangle in ALL `zCols` at once — min/max pruning works for
    * predicates on ANY of them, where [[writeClustered]] is exact only for
    * the leading column. The cost over writeClustered is one extra stats
    * aggregation (per-column min/max to scale the key); the key itself is
    * a codegen'd shift/mask expression and is dropped before the write.
    *
    * The classic use: a corpus filtered sometimes by time, sometimes by
    * quality score, sometimes by both — one layout serves all three scans.
    */
  /** One min-max stats pass over `cols` (the curve-key scaling input). */
  private def curveStats(
      df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    import org.apache.spark.sql.functions.{max, min}
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"min$i"),
        max(col(c)).cast("double").as(s"max$i"))
    }
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val lo = Option(statsRow.getAs[java.lang.Double](s"min$i"))
        .map(_.toDouble).getOrElse(0.0)
      val hi = Option(statsRow.getAs[java.lang.Double](s"max$i"))
        .map(_.toDouble).getOrElse(0.0)
      c -> ((lo, hi))
    }.toMap
  }

  /** Range-partition + sort by a computed curve key, drop it, write. */
  private def writeByKey(
      df: DataFrame,
      path: String,
      key: org.apache.spark.sql.Column,
      targetFileBytes: Long,
      numFiles: Int,
      mode: String): Unit = {
    val n = if (numFiles > 0) numFiles else targetFileCount(df, targetFileBytes)
    df.withColumn("__curve", key)
      .repartitionByRange(n, col("__curve"))
      .sortWithinPartitions(col("__curve"))
      .drop("__curve")
      .write.mode(mode).parquet(path)
  }

  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      numFiles: Int = -1,
      bits: Int = 16,
      mode: String = "overwrite"): Unit =
    writeByKey(df, path, zorderKey(zCols, curveStats(df, zCols), bits),
      targetFileBytes, numFiles, mode)

  /** Write `df` HILBERT-ordered on `hCols` — [[writeZOrdered]]'s
    * tighter-locality sibling (same one extra stats pass, same dropped
    * key): each file covers a contiguous run of the Hilbert curve,
    * which never teleports, so per-file min/max ranges on every
    * dimension are at least as tight as the Morton layout's and
    * markedly tighter around power-of-two boundaries.
    */
  def writeHilbert(
      df: DataFrame,
      path: String,
      hCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      numFiles: Int = -1,
      bits: Int = 16,
      mode: String = "overwrite"): Unit =
    writeByKey(df, path, hilbertKey(hCols, curveStats(df, hCols), bits),
      targetFileBytes, numFiles, mode)

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

  /** Physical-layout audit of a parquet table: one row per
    * (file, row group, column) with size, stats, bloom and dictionary
    * presence — the table that VERIFIES the layout promises this module
    * makes (row groups near target size, min/max present for pruning,
    * blooms where point lookups need them, dictionary where cardinality
    * allows). Run it after a compaction/cluster job; gate promotion on
    * its aggregates.
    *
    * Footers are read DISTRIBUTED (one task per batch of files — at
    * 100 TB a table has 10⁵ files and footer reads are IO round-trips
    * the driver must not serialize); only the file LISTING is
    * driver-side, bounded by file count.
    */
  def layoutReport(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getLen > 0 && f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.toString
      }
      b.result()
    }
    require(files.nonEmpty, s"layoutReport: no parquet data files under $path")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    files.toDS()
      .repartition(math.min(files.size,
        spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        it.flatMap { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f), conf.value))
          // materialize BEFORE closing — flatMap iterators are lazy
          try reader.getRowGroups.asScala.zipWithIndex.flatMap {
            case (rg, i) =>
              rg.getColumns.asScala.map { c =>
                (f, i.toLong, c.getPath.toDotString, rg.getRowCount,
                  c.getTotalSize, c.getTotalUncompressedSize,
                  c.getStatistics != null && c.getStatistics.hasNonNullValue,
                  c.getBloomFilterOffset >= 0L,
                  c.getEncodings.asScala.exists(_.name.contains("DICTIONARY")))
              }
          }.toList
          finally reader.close()
        }
      }
      .toDF("file", "row_group", "column", "n_rows", "compressed_bytes",
        "uncompressed_bytes", "has_min_max", "has_bloom", "has_dictionary")
  }
}
