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

  /** Existence AFTER resolving any crashed swap. A crash between
    * rename(dest, old) and rename(staging, dest) leaves the target dir
    * missing while the data lives in the moved-aside/staged copies — a
    * bare fs.exists would say "no table" and push merge callers onto the
    * create/append branch, duplicating every matched key on top of the
    * subsequently recovered table. Recovery is idempotent and a no-op in
    * the common case (one existence probe on the staging dir).
    */
  def exists(spark: SparkSession, target: String): Boolean =
    if (isPath(target)) {
      val (fs, dest, staging, old) = swapPaths(spark, target)
      recover(fs, staging, dest, old, target)
      fs.exists(dest)
    } else spark.catalog.tableExists(target)

  def read(spark: SparkSession, target: String): DataFrame =
    // mergeSchema: schema evolution on a bucketed target adds columns to
    // only the touched buckets' files; a single sampled footer could miss
    // them and a later merge would silently rewrite those buckets without
    // the evolved columns (footer-only cost — data is not read twice)
    if (isPath(target))
      spark.read.option("mergeSchema", "true").parquet(target)
    else spark.table(target)

  def append(df: DataFrame, target: String): Unit =
    if (isPath(target)) {
      // run crash recovery first: appending must not resurrect/interleave
      // with a half-swapped layout left by a crashed overwrite
      val (fs, dest, staging, old) = swapPaths(df.sparkSession, target)
      recover(fs, staging, dest, old, target)
      df.write.mode("append").parquet(target)
    } else df.write.mode("append").saveAsTable(target)

  /** Append `df` (which must carry [[BucketCol]]) partitioned by bucket, so
    * later merges can prune reads and rewrites to the touched buckets.
    */
  def appendBucketed(df: DataFrame, target: String): Unit = {
    require(df.columns.contains(BucketCol), s"appendBucketed needs $BucketCol")
    require(isPath(target), "bucketed targets are path-addressed")
    // recover a crashed bucket swap before appending: otherwise this append
    // can recreate a bucket dir that a pending roll-forward still wants to
    // rename into, corrupting the partition layout
    val (fs, dest, staging, old) = swapPaths(df.sparkSession, target)
    recover(fs, staging, dest, old, target)
    df.write.mode("append").partitionBy(BucketCol).parquet(target)
  }

  /** The three fixed locations a swap of `target` uses. */
  private def swapPaths(spark: SparkSession, target: String)
      : (org.apache.hadoop.fs.FileSystem, Path, Path, Path) = {
    val dest = new Path(target)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    val base = target.stripSuffix("/")
    (fs, dest, new Path(base + "__graft_staging__"), new Path(base + "__graft_old__"))
  }

  /** Marker file written into the staging dir AFTER its parquet contents are
    * complete; holds the bucket list for bucketed swaps. Its presence means
    * "staged data is a full, committed snapshot — a crashed swap can be
    * rolled FORWARD from it"; its absence means the staging write itself
    * died and staging is safe to discard.
    */
  private val StagedMarker = "_GRAFT_STAGED"

  /** Marker payload: the full bucket list plus the subset that has no staged
    * dir (those buckets are being intentionally emptied). Recovery needs the
    * distinction: for an emptied bucket a leftover dest dir is pre-merge data
    * to retire, while for a staged bucket a dest dir with no staging left
    * means the swap already completed.
    */
  /** Trailing terminator proving the marker was written in full: a truncated
    * bucket list like "12,34" cut to "12,3" still parses as valid ints, and
    * rolling forward only that subset would silently commit a torn merge.
    */
  private val MarkerEnd = "END"

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, staging: Path,
      buckets: Seq[Int]): Set[Int] = {
    val emptied = buckets.filterNot(b =>
      fs.exists(new Path(staging, s"$BucketCol=$b"))).toSet
    // write to a temp name, then rename into place: marker visibility must be
    // atomic, or a crash mid-write leaves a truncated-but-parseable payload
    val tmp = new Path(staging, StagedMarker + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((buckets.mkString(",") + "\n" + emptied.mkString(",") +
      "\n" + MarkerEnd + "\n").getBytes("UTF-8"))
    finally out.close()
    val marker = new Path(staging, StagedMarker)
    if (!fs.rename(tmp, marker))
      throw new IllegalStateException(s"Failed to publish staged marker '$marker'")
    emptied
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path): Option[(Seq[Int], Set[Int])] = {
    val p = new Path(staging, StagedMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.commons.io.IOUtils.copy(in, buf)
        buf.toString("UTF-8")
      } finally in.close()
      val lines = text.split("\n", -1)
      def malformed() = throw new IllegalStateException(
        s"Staged marker '$p' is corrupt (content: '${text.take(200)}') — " +
          "refusing to roll the swap forward from it; inspect and clean up " +
          "manually.")
      def ids(s: String) = s.split(",").filter(_.nonEmpty).map { tok =>
        try tok.toInt catch { case _: NumberFormatException => malformed() }
      }
      // format: buckets \n emptied \n END. Markers without the terminator
      // are rejected — including pre-terminator "legacy" two-line markers:
      // the old writer was non-atomic, so a two-line payload is
      // indistinguishable from a TORN write (e.g. "12,34\n" with the
      // emptied list lost → recovery would silently resurrect an emptied
      // bucket's deleted rows). Rolling forward only from provably-complete
      // markers keeps every ambiguous crash state a loud error; a genuine
      // pre-terminator crash artifact needs one-time manual cleanup
      // (compat break noted in the commit message).
      if (lines.length < 3 || lines(2) != MarkerEnd) malformed()
      Some((ids(lines(0)).toSeq, ids(lines(1)).toSet))
    }
  }

  /** Swap the staged bucket dirs into dest, moving replaced dirs into `old`.
    * Idempotent: safe to re-run over a partially-completed swap (the
    * crash-recovery path replays it) — each bucket's state is derived from
    * which of its three dirs exist.
    */
  private def swapBuckets(
      fs: org.apache.hadoop.fs.FileSystem, staging: Path, dest: Path, old: Path,
      buckets: Seq[Int], emptied: Set[Int], target: String): Unit = {
    fs.mkdirs(old)
    buckets.foreach { b =>
      val part = s"$BucketCol=$b"
      val sdir = new Path(staging, part)
      val ddir = new Path(dest, part)
      val odir = new Path(old, part)
      if (emptied(b)) {
        // intentionally emptied: retire the pre-merge dir (odir present ⟹
        // a prior run already did)
        if (!fs.exists(odir) && fs.exists(ddir) && !fs.rename(ddir, odir))
          throw new IllegalStateException(
            s"Failed to retire emptied bucket '$part' of '$target'")
      } else if (fs.exists(sdir)) {
        if (fs.exists(ddir) && !fs.exists(odir) && !fs.rename(ddir, odir))
          throw new IllegalStateException(
            s"Failed to move bucket '$part' of '$target' aside for overwrite")
        // Hadoop rename(src, existingDir) moves src INTO dst instead of
        // failing — if ddir survived the move-aside (e.g. it was recreated
        // after a crash while odir still held the original), renaming would
        // silently nest the partition dir inside itself. Fail loudly.
        if (fs.exists(ddir))
          throw new IllegalStateException(
            s"Bucket '$part' of '$target' exists alongside both its staged " +
              "and moved-aside copies — three copies is an unrecognized " +
              "state; inspect and clean up manually.")
        if (!fs.rename(sdir, ddir))
          throw new IllegalStateException(
            s"Failed to move staged bucket '$part' into place for '$target'")
      }
      // else: staged bucket already swapped in by a prior (crashed) run
    }
    fs.delete(old, true)
    fs.delete(staging, true)
  }

  /** Crash recovery, run on entry to every write path. The marker's SHAPE
    * picks the replay: a non-empty bucket list is a crashed bucketed swap
    * (replaying it as a flat rename would drop every untouched bucket), an
    * empty one a crashed flat swap (replaying it bucket-wise would no-op the
    * swap and then delete both copies) — so recovery dispatches on the
    * marker, not on which write API happens to run next.
    *
    * Marker in staging → the staged snapshot is complete, finish the swap
    * forward. Marker in DEST → a flat staging→dest rename already happened
    * (the marker rode along) and only the cleanup of `old` was lost — finish
    * the cleanup, deleting the marker LAST (it is the guard that routes a
    * re-crash back here). No marker → the staging write died mid-flight and
    * staging is discardable; a non-empty `old` with dest missing is the
    * between-renames crash of a flat swap (restore it), while `old`
    * alongside a live dest is an unknown state holding what may be the only
    * copy of data — fail loudly rather than delete it.
    */
  private[ct] def recover(
      fs: org.apache.hadoop.fs.FileSystem, staging: Path, dest: Path, old: Path,
      target: String): Unit = {
    readMarker(fs, staging) match {
      case Some((buckets, emptied)) if buckets.nonEmpty =>
        swapBuckets(fs, staging, dest, old, buckets, emptied, target)
      case Some(_) =>
        swapFlat(fs, staging, dest, old, target)
      case None =>
        if (fs.exists(new Path(dest, StagedMarker))) {
          fs.delete(old, true)
          fs.delete(staging, true)
          fs.delete(new Path(dest, StagedMarker), false)
        } else if (fs.exists(old) && fs.listStatus(old).nonEmpty) {
          if (!fs.exists(dest)) {
            // died between dest→old and staging→dest with no usable staging:
            // restore the pre-merge snapshot
            if (!fs.rename(old, dest))
              throw new IllegalStateException(
                s"Failed to restore '$old' to '$target' during crash recovery")
            fs.delete(staging, true)
          } else throw new IllegalStateException(
            s"'$old' exists alongside '$target' without a staged snapshot — " +
              "unrecognized crash state; this directory may hold the only " +
              "copy of some data. Inspect and clean up manually.")
        } else {
          fs.delete(staging, true)
          fs.delete(old, true)
        }
    }
  }

  /** Replace ONLY the given buckets of a bucketed path target with `df`'s
    * contents (`df` must carry [[BucketCol]] and contain no rows outside
    * `buckets`). `df` may read from the target itself: contents are staged
    * first, then each `bucket=N` directory is swapped via rename-aside —
    * untouched buckets are never rewritten, which at large scale turns a
    * full-table rewrite into an O(touched fraction) one. A crash mid-swap is
    * recovered on the next call: the staged snapshot carries a completion
    * marker, so recovery rolls the swap forward instead of dropping buckets.
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
    recover(fs, staging, dest, old, target)
    df.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
    val emptied = writeMarker(fs, staging, buckets)
    swapBuckets(fs, staging, dest, old, buckets, emptied, target)
  }

  /** Swap a complete staged snapshot into dest via rename-aside, so a crash
    * at any point leaves a recoverable snapshot (either dest or
    * dest__graft_old__), never zero copies. Idempotent over a partial swap.
    */
  private def swapFlat(
      fs: org.apache.hadoop.fs.FileSystem, staging: Path, dest: Path, old: Path,
      target: String): Unit = {
    if (fs.exists(staging)) { // absent ⟹ a prior run already renamed it in
      if (fs.exists(dest) && !fs.exists(old) && !fs.rename(dest, old))
        throw new IllegalStateException(s"Failed to move '$target' aside for overwrite")
      // Hadoop rename(src, existingDir) nests src INSIDE dst — if dest still
      // exists here (it was recreated while old held the original), renaming
      // would corrupt the layout. Fail loudly instead.
      if (fs.exists(dest))
        throw new IllegalStateException(
          s"'$target' exists alongside both its staged and moved-aside " +
            "copies — three copies is an unrecognized state; inspect and " +
            "clean up manually.")
      if (!fs.rename(staging, dest)) {
        fs.rename(old, dest) // restore; best effort
        throw new IllegalStateException(s"Failed to move staging into place for '$target'")
      }
    }
    // the marker rode into dest with the staging rename. Delete `old` FIRST,
    // then the marker: the marker is the recovery guard, so at every crash
    // point either it still routes recovery to the dest-marker cleanup
    // branch, or both leftovers are already gone. (Deleting the marker first
    // opens a window — dest committed, no marker, non-empty old — that
    // recovery can only classify as an unrecognized crash state.)
    fs.delete(old, true)
    fs.delete(new Path(dest, StagedMarker), false)
  }

  /** Replace the target's contents with `df`.
    *
    * `df` may read from the target itself (merge-emulation reads the current
    * snapshot), so we always materialize to a staging location first, then
    * swap — never overwrite in place while reading.
    *
    * Path targets only: `partitionBy` writes the staged copy with a
    * `partitionBy` directory layout (the swap itself is layout-agnostic —
    * whole-directory renames), `preserveFiles` copies the named top-level
    * files of the current target (e.g. a params sidecar) into the staged
    * copy before the swap, so metadata that lives NEXT TO the data
    * survives the rewrite, and `stageFiles` writes NEW small files
    * (name → content) into the staged copy so replacement metadata rides
    * the same atomic swap as the data — a crash leaves either the old
    * (data + sidecar) pair or the new one, never a mix.
    */
  def overwrite(
      spark: SparkSession,
      df: DataFrame,
      target: String,
      partitionBy: Seq[String] = Nil,
      preserveFiles: Seq[String] = Nil,
      stageFiles: Map[String, String] = Map.empty): Unit =
    if (isPath(target)) {
      val dest = new Path(target)
      val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
      val base = target.stripSuffix("/")
      val staging = new Path(base + "__graft_staging__")
      val old = new Path(base + "__graft_old__")
      recover(fs, staging, dest, old, target)
      val writer = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(staging.toString)
      preserveFiles.foreach { name =>
        val src = new Path(dest, name)
        if (fs.exists(src))
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new Path(staging, name), false, spark.sessionState.newHadoopConf())
      }
      stageFiles.foreach { case (name, content) =>
        val out = fs.create(new Path(staging, name), true)
        try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      writeMarker(fs, staging, Nil)
      swapFlat(fs, staging, dest, old, target)
    } else {
      require(partitionBy.isEmpty && preserveFiles.isEmpty
          && stageFiles.isEmpty,
        "partitionBy/preserveFiles/stageFiles are path-target-only options")
      // stage on the WAREHOUSE filesystem, not a driver-local temp dir: on
      // a cluster whose default FS is remote (HDFS/S3A), a java.nio temp
      // path would be written through the default FS but deleted as a
      // local java.io.File — leaking the staging dir every call — and with
      // a file:// default FS on multiple nodes, executors would scatter
      // part files across machines
      val warehouse = new Path(spark.sessionState.conf.warehousePath)
      val staging = new Path(warehouse,
        s"__graft_ct_staging_${java.util.UUID.randomUUID().toString.take(8)}__")
      val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
      try {
        df.write.mode("overwrite").parquet(staging.toString)
        spark.read.parquet(staging.toString)
          .write.mode("overwrite").saveAsTable(target)
      } finally fs.delete(staging, true)
    }
}
