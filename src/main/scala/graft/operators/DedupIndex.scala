package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental MinHash+LSH dedup: dedup a NEW batch of documents against a
  * persisted signature index of everything already ingested, without ever
  * re-reading or re-hashing the historical corpus text.
  *
  * This is the shape a continuously-ingesting 100 TB pipeline actually
  * needs: [[Dedup.minhashLshPairs]] answers "find all near-dup pairs inside
  * one corpus snapshot" (O(corpus) re-hash per run), while this object
  * answers "is anything in today's batch a near-dup of the last N months of
  * ingest" at a cost proportional to the BATCH, not the corpus:
  *
  *  - The index stores per-document MinHash signatures exploded into LSH
  *    band buckets — `(id, band, bucket, sig)` — numPerms longs plus a
  *    bucket key per band per document, independent of text length.
  *  - Probing joins the banded BATCH signatures against the index on
  *    `(band, bucket)`. With `broadcastBatch = true` (default) the batch
  *    side is broadcast, so the index — the big side — is streamed in
  *    place: no index shuffle, no index re-hash, touched buckets only
  *    after parquet row-group pruning. A daily batch joining a year of
  *    index this way is one scan of the index and zero wide exchanges.
  *  - Survivors are appended to the index as already-computed signature
  *    rows ([[indexRowsFor]] output unioned by the caller, or
  *    [[ingestBatch]] which returns them) — ingest cost stays O(batch).
  *
  * Parameters (`numPerms`, `bands`, `shingleSize`) must match between index
  * build and probe — a mismatch silently empties the candidate join — so
  * probe entry points validate the index's signature length against
  * `numPerms` with a one-row bounded probe.
  *
  * Empty/whitespace-only documents produce no signature (same contract as
  * [[Dedup.minhashSignatures]]): they are never index candidates and always
  * survive [[dedupAgainstIndex]].
  */
object DedupIndex {

  /** Banded signature rows for `df`: `(__id, __band, __bucket, __sig)`.
    * This IS the index format; it is also the probe-side shape. Persist it
    * with [[writeIndex]] (or any parquet write) and union survivors' rows
    * to it after each batch.
    */
  def indexRowsFor(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    require(bands >= 1 && numPerms % bands == 0,
      "numPerms must be divisible by bands")
    val rowsPerBand = numPerms / bands
    Dedup.minhashSignatures(df, idCol, textCol, numPerms, shingleSize)
      .select(col("__id"),
        posexplode(Dedup.lshBandHashes(col("__sig"), bands, rowsPerBand))
          .as(Seq("__band", "__bucket")),
        col("__sig"))
      .select("__id", "__band", "__bucket", "__sig")
  }

  /** Sidecar filename recording the index's build parameters — the only
    * reliable way to catch a `bands`/`shingleSize` drift between build and
    * probe (`numPerms` is checkable from the stored signatures, the other
    * two are not derivable from the data without a full scan).
    */
  val ParamsFileName = "_graft_index_params.json"

  /** Write index rows laid out for cheap probing: files are partitioned by
    * `__band`, so a probe that broadcasts the batch streams only the
    * matching band directories' row groups. Append mode — each batch's
    * survivor rows are added to the same layout.
    *
    * The build parameters are recorded in a `_graft_index_params.json`
    * sidecar on first write; every later append validates against it and
    * fails loudly on drift — appending rows built with different
    * parameters would silently empty future candidate joins. Read the
    * index back with [[loadIndex]] to get the same check on the probe
    * side. (Pre-sidecar indexes validate signature length only.)
    */
  def writeIndex(
      indexRows: DataFrame,
      path: String,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): Unit = {
    val spark = indexRows.sparkSession
    // The claimed params must describe the ROWS, not just match the
    // sidecar: rows built with other (numPerms, bands) would pass the
    // sidecar check and then silently empty future candidate joins. Both
    // are derivable from the rows themselves — one O(batch) map-side
    // aggregate, paid once next to an O(batch) write. (`shingleSize` is
    // not derivable from signatures and stays caller-asserted.)
    val stats = indexRows.agg(
      min(col("__band")).as("min_band"), max(col("__band")).as("max_band"),
      min(size(col("__sig"))).as("min_perms"),
      max(size(col("__sig"))).as("max_perms")).head()
    if (!stats.isNullAt(0)) {
      require(stats.getAs[Int]("min_band") == 0
          && stats.getAs[Int]("max_band") == bands - 1,
        s"writeIndex: rows carry bands ${stats.getAs[Int]("min_band")}.." +
          s"${stats.getAs[Int]("max_band")} but bands=$bands was claimed ($path)")
      require(stats.getAs[Int]("min_perms") == numPerms
          && stats.getAs[Int]("max_perms") == numPerms,
        s"writeIndex: rows carry ${stats.getAs[Int]("min_perms")}.." +
          s"${stats.getAs[Int]("max_perms")}-perm signatures but " +
          s"numPerms=$numPerms was claimed ($path)")
    }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val sidecar = new org.apache.hadoop.fs.Path(dir, ParamsFileName)
    readParams(fs, sidecar) match {
      case Some(stored) =>
        checkParams(stored, numPerms, bands, shingleSize, path)
      case None =>
        // first sidecar on a PRE-SIDECAR index: the existing rows' band
        // layout is visible as __band= partition directories (every doc
        // writes a row per band, so a non-empty legacy index has all of
        // them) — refuse to stamp params that contradict it
        if (fs.exists(dir)) {
          val legacyBands = fs.listStatus(dir).map(_.getPath.getName)
            .filter(_.startsWith("__band="))
            .map(_.stripPrefix("__band=").toInt)
          require(legacyBands.isEmpty
              || (legacyBands.min == 0 && legacyBands.max == bands - 1),
            s"writeIndex: existing index at $path has band partitions " +
              s"${legacyBands.sorted.mkString(",")} but bands=$bands was claimed")
        }
        // tmp + rename + read-back ([[graft.io.Sidecar]]): a crash leaves
        // no sidecar, and on a concurrent create race whatever content
        // committed is the winner — both racers validate against it, so
        // exactly one parameter set survives.
        val committed = graft.io.Sidecar.commit(fs, dir, ParamsFileName,
          graft.io.Json.toJson(Map(
            "num_perms" -> numPerms, "bands" -> bands,
            "shingle_size" -> shingleSize)),
          overwrite = false)
        checkParams(parseParams(committed), numPerms, bands, shingleSize, path)
    }
    indexRows.write.mode("append").partitionBy("__band").parquet(path)
  }

  /** Compact a persisted index in place. The streaming ingest sink appends
    * a few small files per band per micro-batch, so after thousands of
    * batches the probe's scan cost is dominated by file listings and opens
    * rather than bytes — the classic small-file failure mode of a
    * long-lived table. This rewrites the whole index into
    * ~`targetFileBytes` files:
    *
    *  - the `__band` partition layout is preserved (probe-side band
    *    pruning keeps working),
    *  - rows are range-partitioned and sorted on `(__band, __bucket)`, so
    *    each file owns a disjoint bucket range and a probe's bucket-join
    *    scan also prunes on parquet min/max within the band,
    *  - the params sidecar survives the rewrite,
    *  - the swap is atomic and crash-recoverable
    *    ([[graft.ct.TableStore]]'s rename protocol) — a reader sees the
    *    old layout or the new one, never a half-written directory.
    *
    * Run it as table maintenance (e.g. nightly) BETWEEN ingest batches:
    * an append that commits during the rewrite window is lost to the swap.
    */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val df = spark.read.parquet(path)
    val n = Compaction.targetFileCount(df, targetFileBytes)
    val shaped = df
      .repartitionByRange(n, col("__band"), col("__bucket"))
      .sortWithinPartitions(col("__band"), col("__bucket"))
    graft.ct.TableStore.overwrite(spark, shaped, path,
      partitionBy = Seq("__band"), preserveFiles = Seq(ParamsFileName))
  }

  /** Read a persisted index for probing, validating its recorded build
    * parameters against the probe's — a mismatch is a loud error instead
    * of a silently-empty candidate join. Indexes written before the
    * sidecar existed load with a warning-free fallback to the
    * signature-length check performed by every probe entry point.
    */
  def loadIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    readParams(fs, new org.apache.hadoop.fs.Path(dir, ParamsFileName))
      .foreach(checkParams(_, numPerms, bands, shingleSize, path))
    spark.read.parquet(path)
  }

  private def readParams(
      fs: org.apache.hadoop.fs.FileSystem,
      sidecar: org.apache.hadoop.fs.Path): Option[(Int, Int, Int)] =
    graft.io.Sidecar.read(fs, sidecar.getParent, sidecar.getName)
      .map(parseParams)

  private def parseParams(text: String): (Int, Int, Int) = {
    val node = graft.io.Json.parse(text)
    (node.get("num_perms").asInt(), node.get("bands").asInt(),
      node.get("shingle_size").asInt())
  }

  private def checkParams(
      stored: (Int, Int, Int),
      numPerms: Int, bands: Int, shingleSize: Int, path: String): Unit =
    require(stored == ((numPerms, bands, shingleSize)),
      s"index at $path was built with (numPerms, bands, shingleSize) = " +
        s"$stored but this call uses (${(numPerms, bands, shingleSize)}) — " +
        "build and probe parameters must match or the candidate join is " +
        "silently empty")

  /** Candidate matches between a new batch and the index:
    * `(batch_id, index_id, est_jaccard)` for every (batch doc, indexed doc)
    * pair sharing at least one LSH band bucket with signature-estimated
    * Jaccard >= `threshold`.
    *
    * `broadcastBatch = true` (the default, and the point): the banded batch
    * is broadcast, the index side streams without a shuffle. Set it false
    * only when the batch itself is huge — the join then shuffles both sides
    * on `(band, bucket)`.
    */
  def matchesAgainstIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      broadcastBatch: Boolean = true): DataFrame =
    matchesFromRows(
      indexRowsFor(batch, idCol, textCol, numPerms, bands, shingleSize),
      index, numPerms, threshold, broadcastBatch)

  /** [[matchesAgainstIndex]] core over ALREADY-banded batch rows
    * ([[indexRowsFor]] shape) — lets [[ingestBatch]] hash the batch once
    * and reuse the rows for both the probe and the index delta.
    */
  private def matchesFromRows(
      batchRows: DataFrame,
      index: DataFrame,
      numPerms: Int,
      threshold: Double,
      broadcastBatch: Boolean): DataFrame = {
    validateIndex(index, numPerms)
    val bandedBatch0 = batchRows.select(col("__band"), col("__bucket"),
      col("__id").as("batch_id"), col("__sig").as("__sig_b"))
    val bandedBatch =
      if (broadcastBatch) broadcast(bandedBatch0) else bandedBatch0
    val cand = index
      .select(col("__band"), col("__bucket"),
        col("__id").as("index_id"), col("__sig").as("__sig_i"))
      .join(bandedBatch, Seq("__band", "__bucket"))
      // a doc id may legitimately exist on both sides (re-delivered batch);
      // its self-pair is a perfect match and correctly marks it as a dup
      .dropDuplicates("batch_id", "index_id")
    val est = size(filter(zip_with(col("__sig_b"), col("__sig_i"),
      (a, b) => when(a === b, lit(1)).otherwise(lit(null))),
      x => x.isNotNull)).cast("double") / numPerms
    cand
      .withColumn("est_jaccard", round(est, 6))
      .where(col("est_jaccard") >= threshold)
      .select("batch_id", "index_id", "est_jaccard")
  }

  /** The batch minus every document with a near-dup already in the index
    * (anti-join on [[matchesAgainstIndex]] batch ids). Batch-INTERNAL
    * duplicates are deliberately untouched here — compose with
    * [[Dedup.dedupCorpus]] (or use [[ingestBatch]], which does) when the
    * batch itself may contain dups.
    */
  def dedupAgainstIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      broadcastBatch: Boolean = true): DataFrame = {
    val matched = matchesAgainstIndex(batch, idCol, textCol, index, numPerms,
      bands, shingleSize, threshold, broadcastBatch)
      .select(col("batch_id").as(idCol)).distinct()
    batch.join(matched, Seq(idCol), "left_anti")
  }

  /** One ingest step: dedup the batch against itself
    * ([[Dedup.dedupCorpus]], min-id survivor per cluster), then against the
    * index, and return both the surviving rows and their index rows for
    * the caller to append ([[writeIndex]]).
    *
    * The deduped batch is hashed ONCE: its banded signature rows are
    * persisted and serve both the probe join and the returned index delta
    * (an anti-join on matched ids — no re-tokenize/re-hash). The persisted
    * intermediates (signature rows + matched-id set) live until the
    * session clears them; [[graft.streaming.StreamingOps.dedupIngestSink]]
    * unpersists them per micro-batch.
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      broadcastBatch: Boolean = true): (DataFrame, DataFrame) = {
    val withinBatch = Dedup.dedupCorpus(batch, idCol, textCol, numPerms,
      bands, shingleSize, threshold)
    val batchRows = graft.core.Caches.pin(
      indexRowsFor(withinBatch, idCol, textCol, numPerms, bands, shingleSize))
    // small (matched ids only), read by both anti-joins below
    val matched = graft.core.Caches.pin(
      matchesFromRows(batchRows, index, numPerms, threshold, broadcastBatch)
        .select(col("batch_id")).distinct())
    val survivors = withinBatch.join(
      matched.withColumnRenamed("batch_id", idCol), Seq(idCol), "left_anti")
    val newRows = batchRows.join(
      matched.withColumnRenamed("batch_id", "__id"), Seq("__id"), "left_anti")
    (survivors, newRows)
  }

  /** Bounded one-row probe asserting the index's stored signature length
    * matches `numPerms`. An empty index passes (first-ever batch). */
  private def validateIndex(index: DataFrame, numPerms: Int): Unit = {
    val sample = index.select(size(col("__sig")).as("n")).limit(1).collect()
    sample.headOption.foreach { r =>
      val n = r.getInt(0)
      require(n == numPerms,
        s"index signatures have length $n but numPerms=$numPerms — " +
          "index and probe parameters must match")
    }
  }
}
