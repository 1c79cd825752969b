package graft.ct

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage abstraction for change-tracking targets.
  *
  * The reference addresses Delta tables by path or catalog name
  * (src/spark_fuse/utils/change_tracking.py:218-245). This runtime has no
  * Delta jars, so merge semantics are emulated as a rewrite: compute the new
  * table contents, write them to a staging location, then swap. Single-writer
  * semantics (documented; the reference's Delta MERGE is transactional — at
  * 100 TB you would plug a lakehouse format in behind this same trait).
  */
private[graft] object TableStore {

  /** Physical partition column for hash-bucketed targets. Lives only in the
    * target layout; change tracking strips it from user-facing semantics
    * (row hashes and change detection never include it).
    */
  val BucketCol = "__graft_bucket"

  /** Path-vs-table heuristic, identical to the reference (`/` or `:/`). */
  def isPath(identifier: String): Boolean =
    identifier.contains("/") || identifier.contains(":/")

  def exists(spark: SparkSession, target: String): Boolean =
    if (isPath(target)) {
      val p = new Path(target)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.exists(p)
    } else spark.catalog.tableExists(target)

  def read(spark: SparkSession, target: String): DataFrame =
    if (isPath(target)) spark.read.parquet(target) else spark.table(target)

  def append(df: DataFrame, target: String): Unit =
    if (isPath(target)) df.write.mode("append").parquet(target)
    else df.write.mode("append").saveAsTable(target)

  /** Append `df` (which must carry [[BucketCol]]) partitioned by bucket, so
    * later merges can prune reads and rewrites to the touched buckets.
    */
  def appendBucketed(df: DataFrame, target: String): Unit = {
    require(df.columns.contains(BucketCol), s"appendBucketed needs $BucketCol")
    require(isPath(target), "bucketed targets are path-addressed")
    df.write.mode("append").partitionBy(BucketCol).parquet(target)
  }

  /** Replace ONLY the given buckets of a bucketed path target with `df`'s
    * contents (`df` must carry [[BucketCol]] and contain no rows outside
    * `buckets`). `df` may read from the target itself: contents are staged
    * first, then each `bucket=N` directory is swapped via rename-aside —
    * untouched buckets are never rewritten, which at large scale turns a
    * full-table rewrite into an O(touched fraction) one.
    */
  def overwriteBuckets(
      spark: SparkSession, df: DataFrame, target: String, buckets: Seq[Int]): Unit = {
    require(isPath(target), "bucketed targets are path-addressed")
    if (buckets.isEmpty) return
    val dest = new Path(target)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    val base = target.stripSuffix("/")
    val staging = new Path(base + "__graft_staging__")
    val old = new Path(base + "__graft_old__")
    fs.delete(staging, true)
    fs.delete(old, true) // leftover from a prior crashed swap
    df.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
    fs.mkdirs(old)
    buckets.foreach { b =>
      val part = s"$BucketCol=$b"
      val sdir = new Path(staging, part)
      val ddir = new Path(dest, part)
      val odir = new Path(old, part)
      if (fs.exists(ddir) && !fs.rename(ddir, odir))
        throw new IllegalStateException(
          s"Failed to move bucket '$part' of '$target' aside for overwrite")
      // a bucket absent from the staged output legitimately becomes empty
      if (fs.exists(sdir) && !fs.rename(sdir, ddir)) {
        fs.rename(odir, ddir) // restore; best effort
        throw new IllegalStateException(
          s"Failed to move staged bucket '$part' into place for '$target'")
      }
    }
    fs.delete(old, true)
    fs.delete(staging, true)
  }

  /** Replace the target's contents with `df`.
    *
    * `df` may read from the target itself (merge-emulation reads the current
    * snapshot), so we always materialize to a staging location first, then
    * swap — never overwrite in place while reading.
    */
  def overwrite(spark: SparkSession, df: DataFrame, target: String): Unit =
    if (isPath(target)) {
      val dest = new Path(target)
      val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
      val base = target.stripSuffix("/")
      val staging = new Path(base + "__graft_staging__")
      val old = new Path(base + "__graft_old__")
      fs.delete(staging, true)
      fs.delete(old, true) // leftover from a prior crashed swap
      df.write.mode("overwrite").parquet(staging.toString)
      // Swap via rename-aside so a crash at any point leaves a recoverable
      // snapshot (either dest or dest__graft_old__), never zero copies.
      if (fs.exists(dest) && !fs.rename(dest, old))
        throw new IllegalStateException(s"Failed to move '$target' aside for overwrite")
      if (!fs.rename(staging, dest)) {
        fs.rename(old, dest) // restore; best effort
        throw new IllegalStateException(s"Failed to move staging into place for '$target'")
      }
      fs.delete(old, true)
    } else {
      val staging = Files.createTempDirectory("graft_ct_staging_").toString
      try {
        df.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").saveAsTable(target)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
      }
    }
}
