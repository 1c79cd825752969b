package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing BM25 inverted index: build once, then answer keyword queries
  * from index buckets alone — no corpus scan per query.
  *
  * [[TextAnalysis.bm25]] is the ad-hoc path (two corpus scans per query
  * set). At 100 TB with repeated retrieval (hard-negative mining rounds,
  * topical subset pulls, eval retrieval), the scans dominate; this object
  * amortizes them into one posting-list build:
  *
  *  - The index stores one row per (doc, term): `(idCol, __dl, __term,
  *    __tf, __tb)`, files partitioned by `__tb` — a stable sha2-prefix
  *    bucket of the term ([[graft.functions.Hashing.hexPrefixBucket]]) —
  *    and range-laid-out/sorted on `(__tb, __term)` so a probe prunes to
  *    its terms' bucket DIRECTORIES and, within them, to row groups whose
  *    term min/max straddle a query term.
  *  - Corpus-level BM25 constants (doc count, exact long token-count sum)
  *    are computed at build time and recorded in the params sidecar, so a
  *    query needs zero corpus access: scores come out bit-identical to
  *    [[TextAnalysis.bm25]] on the indexed corpus (asserted in SearchSpec).
  *  - Query cost ∝ the query terms' posting lists: the pruned scan feeds
  *    one matches-sized per-term window (document frequencies) and one
  *    per-doc regroup — no broadcast of anything corpus-sized.
  *
  * The build is one-shot and sidecar-last: the params file is committed
  * (tmp + rename, [[graft.io.Sidecar]]) only after every posting file is
  * down, so a crashed build leaves a sidecar-less directory that
  * [[searchIndex]] refuses loudly, never a silently-partial index.
  *
  * Growth: a MONOLITHIC index ([[writeIndex]]) cannot be appended to —
  * its sidecar's corpus constants (n_docs, sum_dl) could not be updated
  * atomically with the rows. The SEGMENTED layout ([[appendSegment]])
  * serves the daily-ingest user instead: each batch becomes its own
  * committed segment under `segments/` — posting files plus a sidecar
  * carrying that batch's constants — and [[searchIndex]] merges on read,
  * summing the per-segment (n_docs, sum_dl) into the global BM25
  * constants and unioning the per-segment pruned scans. Scores are
  * bit-identical to a from-scratch rebuild over the concatenated batches
  * (asserted in SearchSpec) because every constant is an exact long sum
  * and per-doc term contributions fold in sorted term order.
  * [[compactSegments]] rewrites many small segments into one (the
  * [[DedupIndex.compactIndex]] pattern) so probe cost doesn't decay into
  * file-listing overhead after months of daily appends. Batches must be
  * doc-disjoint — re-ingesting a doc id would double-count it, same
  * contract as [[DedupIndex]] appends.
  */
object Search {

  /** Sidecar recording bucket layout, normalization, and the corpus BM25
    * constants. Also the build's commit marker — see the object doc.
    */
  val ParamsFileName = "_graft_search_params.json"

  private val BucketSalt = "graft-search-tb"
  private val HexPrefixLen = 7

  /** Driver-side twin of the column-side bucket assignment
    * ([[graft.functions.Hashing.hexPrefixBucket]] with [[BucketSalt]]):
    * sha2-256 of `term:salt`, first 7 hex chars as a long, mod
    * `numBuckets`. Equality with the column implementation is what makes
    * probe-side literal IN pruning sound; SearchSpec asserts it.
    */
  private[operators] def termBucketLocal(term: String, numBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$term:$BucketSalt".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, HexPrefixLen), 16) % numBuckets
  }

  private def termBucketCol(term: Column, numBuckets: Int): Column =
    graft.functions.Hashing.hexPrefixBucket(term, BucketSalt, numBuckets.toLong)

  /** Posting rows for `docs`: `(idCol, __dl, __term, __tf, __tb)`.
    *
    * Term frequencies are computed INSIDE each row — sort the token array,
    * then run-length encode it with pure higher-order expressions — so the
    * generator emits one row per (doc, DISTINCT term), not one per token,
    * and no aggregation (hence no corpus-wide exchange and no 55M-entry
    * hash table) exists at all: a doc-term regroup via explode + groupBy
    * measured 5-6× slower on the same corpus. Everything stays in one
    * whole-stage-codegen'd scan stage.
    */
  def indexRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 64,
      lowercase: Boolean = true,
      stem: Boolean = false): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val toks0 = TextAnalysis.tokens(col(textCol))
    val toks1 = if (lowercase) transform(toks0, t => lower(t)) else toks0
    // analyzer order: lowercase THEN stem (the stemmer's contract is
    // lowercase input); recorded in the sidecar so queries match
    val toks = if (stem)
      transform(toks1, t => graft.functions.PorterStem(t)) else toks1
    val s = col("__s")
    val runStarts = filter(sequence(lit(0), col("__dl") - 1), i =>
      (i === 0) || element_at(s, i + 1) =!= element_at(s, i))
    docs.select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")))
      .where(col("__dl") > 0)
      .withColumn("__s", array_sort(col("__toks")))
      .withColumn("__starts", runStarts)
      // each run is [start, next start); the sentinel __dl closes the last
      .select(col(idCol), col("__dl"), explode(zip_with(
        col("__starts"),
        concat(slice(col("__starts"), lit(2), size(col("__starts"))),
          array(col("__dl"))),
        (a, b) => struct(element_at(s, a + 1).as("t"),
          (b - a).cast("long").as("f")))).as("__p"))
      .select(col(idCol), col("__dl"),
        col("__p.t").as("__term"), col("__p.f").as("__tf"))
      .withColumn("__tb", termBucketCol(col("__term"), numBuckets))
  }

  /** Build the index at `path` (which must not already contain one). The
    * corpus is TOKENIZED exactly once: the posting aggregation is pinned
    * (disk-backed) so the range partitioner's sampling pass and the
    * `sum_dl` constant read the materialized postings instead of
    * re-running the corpus explode (unpinned, the sampler alone would
    * double the build); `n_docs` comes from a column-pruned id scan that
    * never touches the text. The pin is released before returning —
    * nothing outlives the call.
    */
  def writeIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numBuckets: Int = 64,
      lowercase: Boolean = true,
      stem: Boolean = false,
      targetFileBytes: Long = 128L << 20): Unit = {
    val spark = docs.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(new org.apache.hadoop.fs.Path(dir, ParamsFileName)),
      s"writeIndex: $path already holds a committed index — builds are " +
        "one-shot; rebuild into a fresh path or delete the old index first")
    buildSegment(docs, idCol, textCol, path, numBuckets, lowercase, stem,
      targetFileBytes)
  }

  /** One complete mini-index at `path`: postings laid out for pruning,
    * sidecar-last with THIS batch's corpus constants. Shared by the
    * monolithic [[writeIndex]] and the segmented [[appendSegment]] — a
    * committed segment is itself a valid monolithic index.
    */
  private def buildSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numBuckets: Int,
      lowercase: Boolean,
      stem: Boolean,
      targetFileBytes: Long): Unit = {
    val spark = docs.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val postings = graft.core.Caches.pin(
      indexRows(docs, idCol, textCol, numBuckets, lowercase, stem))
    try {
      // Σtf over the postings IS the corpus token count; zero-token docs
      // have no postings but contribute nothing to the sum either
      val sumRow = postings.agg(sum(col("__tf")).as("s")).head()
      val sumDl = if (sumRow.isNullAt(0)) 0L else sumRow.getAs[Long]("s")
      val nDocs = docs.select(col(idCol)).count()
      writePostings(postings, dir, fs, numBuckets, lowercase, stem, idCol,
        docs.schema(idCol).dataType.json, nDocs, sumDl, targetFileBytes)
    } finally postings.unpersist(blocking = false): Unit
  }

  /** Layout + commit for already-computed posting rows: range-laid-out
    * `__tb`-partitioned files, then the sidecar (the commit marker). */
  private def writePostings(
      postings: DataFrame,
      dir: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem,
      numBuckets: Int,
      lowercase: Boolean,
      stem: Boolean,
      idCol: String,
      idTypeJson: String,
      nDocs: Long,
      sumDl: Long,
      targetFileBytes: Long): Unit = {
    val nFiles = Compaction.targetFileCount(postings, targetFileBytes)
    postings
      .repartitionByRange(nFiles, col("__tb"), col("__term"))
      .sortWithinPartitions(col("__tb"), col("__term"))
      .write.mode("errorifexists").partitionBy("__tb").parquet(dir.toString)
    graft.io.Sidecar.commit(fs, dir, ParamsFileName,
      graft.io.Json.toJson(Map(
        "num_buckets" -> numBuckets, "lowercase" -> lowercase,
        "stem" -> stem,
        "id_col" -> idCol,
        // the id's Catalyst type, so a zero-posting index (all docs
        // empty: no data files on disk) can still answer queries with a
        // correctly-typed empty frame instead of a schema-inference crash
        "id_type" -> idTypeJson,
        "n_docs" -> nDocs, "sum_dl" -> sumDl)),
      overwrite = false): Unit
  }

  private val SegmentsDirName = "segments"
  private val SegmentPrefix = "seg_"

  /** Append `docs` as a new committed segment of the index at `path`,
    * creating the segmented index on first call. The top-level sidecar
    * records only the LAYOUT (num_buckets, lowercase, id column/type) —
    * corpus constants live in each segment's own sidecar, so the append
    * never has to update shared state: the batch is built into a hidden
    * temp dir and committed by a single directory rename. A crashed
    * append leaves only a `.tmp-seg-*` dir that readers never look at.
    *
    * Layout parameters must match the index's on every append (loud check
    * against the top sidecar — drifting `numBuckets` would silently break
    * probe-side bucket pruning). Single-writer, like [[DedupIndex]]
    * maintenance; batches must be doc-disjoint (see object doc).
    *
    * `segmentName` (must start with `seg_`) pins the segment's identity
    * instead of taking the next free number — the foreachBatch
    * idempotency hook: name segments by batch id and a replayed batch
    * finds its segment already committed and SKIPS (returns false)
    * instead of double-ingesting. Returns true when this call committed
    * the segment.
    */
  def appendSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numBuckets: Int = 64,
      lowercase: Boolean = true,
      stem: Boolean = false,
      targetFileBytes: Long = 128L << 20,
      segmentName: Option[String] = None): Boolean = {
    val spark = docs.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val idTypeJson = docs.schema(idCol).dataType.json
    graft.io.Sidecar.read(fs, dir, ParamsFileName) match {
      case Some(raw) =>
        val node = graft.io.Json.parse(raw)
        require(!node.has("n_docs"),
          s"appendSegment: $path holds a one-shot monolithic index " +
            "(writeIndex); segmented growth needs an index created by " +
            "appendSegment — rebuild it segmented")
        checkLayout(node, numBuckets, lowercase, stem, idCol, idTypeJson, path)
      case None =>
        val committed = graft.io.Sidecar.commit(fs, dir, ParamsFileName,
          graft.io.Json.toJson(Map(
            "num_buckets" -> numBuckets, "lowercase" -> lowercase,
            "stem" -> stem,
            "id_col" -> idCol, "id_type" -> idTypeJson)),
          overwrite = false)
        // a concurrent creator may have won the commit race: whatever
        // content committed is the layout, and this call must match it
        checkLayout(graft.io.Json.parse(committed), numBuckets, lowercase,
          stem, idCol, idTypeJson, path)
    }
    val segsDir = new org.apache.hadoop.fs.Path(dir, SegmentsDirName)
    listSegments(fs, dir): Unit // refuses a crashed-compaction state loud
    segmentName.foreach(n => require(n.startsWith(SegmentPrefix),
      s"segmentName must start with $SegmentPrefix, got $n"))
    // idempotent named commit: an existing segment means the batch
    // already landed — skip without tokenizing anything
    if (segmentName.exists(n =>
        fs.exists(new org.apache.hadoop.fs.Path(segsDir, n)))) false
    else appendSegmentCommit(docs, idCol, textCol, dir, fs, segsDir,
      numBuckets, lowercase, stem, targetFileBytes, segmentName)
  }

  private def appendSegmentCommit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem,
      segsDir: org.apache.hadoop.fs.Path,
      numBuckets: Int,
      lowercase: Boolean,
      stem: Boolean,
      targetFileBytes: Long,
      segmentName: Option[String]): Boolean = {
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".tmp-seg-${java.util.UUID.randomUUID()}")
    buildSegment(docs, idCol, textCol, tmp.toString, numBuckets, lowercase,
      stem, targetFileBytes)
    fs.mkdirs(segsDir): Unit
    segmentName match {
      case Some(n) =>
        val target = new org.apache.hadoop.fs.Path(segsDir, n)
        // lost a race to a concurrent replay of the same batch: theirs
        // committed, ours is redundant — clean up and report not-committed
        if (!fs.rename(tmp, target)) { fs.delete(tmp, true): Unit; false }
        else true
      case None =>
        // single rename = the commit; retry the target id on a collision
        // (rename onto an existing dir would NEST on posix-like
        // filesystems, so existence is checked first — single-writer
        // makes this safe)
        var attempts = 0
        var renamed = false
        while (!renamed) {
          attempts += 1
          require(attempts <= 1000, s"appendSegment: cannot claim a segment " +
            s"id under $segsDir after $attempts attempts")
          val target = new org.apache.hadoop.fs.Path(segsDir,
            f"$SegmentPrefix${nextSegmentId(fs, segsDir)}%06d")
          renamed = !fs.exists(target) && fs.rename(tmp, target)
        }
        true
    }
  }

  private def checkLayout(
      node: com.fasterxml.jackson.databind.JsonNode,
      numBuckets: Int, lowercase: Boolean, stem: Boolean, idCol: String,
      idTypeJson: String, path: String): Unit = {
    val stored = (node.get("num_buckets").asInt(),
      node.get("lowercase").asBoolean(), stemOf(node),
      node.get("id_col").asText(), node.get("id_type").asText())
    require(stored == ((numBuckets, lowercase, stem, idCol, idTypeJson)),
      s"appendSegment: index at $path has layout $stored but this call " +
        s"uses ${(numBuckets, lowercase, stem, idCol, idTypeJson)} — " +
        "layout must match across appends or bucket pruning (and the " +
        "analyzer) silently breaks")
  }

  /** `stem` from a params sidecar; pre-stemming indexes lack the key. */
  private def stemOf(node: com.fasterxml.jackson.databind.JsonNode): Boolean =
    node.has("stem") && node.get("stem").asBoolean()

  private def nextSegmentId(
      fs: org.apache.hadoop.fs.FileSystem,
      segsDir: org.apache.hadoop.fs.Path): Int = {
    val existing =
      if (fs.exists(segsDir))
        fs.listStatus(segsDir).map(_.getPath.getName)
          .filter(_.startsWith(SegmentPrefix))
          .flatMap(n => scala.util.Try(
            n.stripPrefix(SegmentPrefix).toInt).toOption)
      else Array.empty[Int]
    if (existing.isEmpty) 1 else existing.max + 1
  }

  /** Committed segments of a segmented index, name-sorted. REFUSES a
    * crashed-compaction state: a missing/empty segments dir next to an
    * `.old-segments-*` remnant means the old tree was renamed away but
    * the new one never landed — answering "no segments" there would be a
    * silently EMPTY result (and an append would silently orphan the old
    * data). Recover by renaming `.old-segments-*` back to `segments`.
    */
  private def listSegments(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val segsDir = new org.apache.hadoop.fs.Path(dir, SegmentsDirName)
    val segs =
      if (!fs.exists(segsDir)) Seq.empty
      else fs.listStatus(segsDir).map(_.getPath)
        .filter(_.getName.startsWith(SegmentPrefix))
        .sortBy(_.getName).toSeq
    if (segs.isEmpty && fs.exists(dir)) {
      val orphans = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(".old-segments-"))
      if (orphans.nonEmpty) throw new IllegalStateException(
        s"index at $dir has no committed segments but a crashed " +
          s"compaction left ${orphans.mkString(", ")} — rename it back to " +
          s"'$SegmentsDirName' to recover before querying or appending")
    }
    segs
  }

  /** Rewrite all segments into ONE, preserving results bit-for-bit: the
    * merged segment carries the summed (n_docs, sum_dl) and the unioned
    * postings, so [[searchIndex]] computes identical constants and
    * identical per-(doc, term) rows. Run BETWEEN ingests (single-writer
    * maintenance, like [[DedupIndex.compactIndex]]): the swap is
    * build-new-tree → rename old away → rename new in → delete old, so a
    * reader never sees a half tree. A reader landing in the mid-swap
    * window (segments dir transiently absent next to an
    * `.old-segments-*`) FAILS LOUDLY via `listSegments`' crashed-
    * compaction refusal rather than answering empty — indistinguishable
    * on disk from a crashed compaction, and a silently empty answer
    * would be read as "no matches". Single-writer, no-concurrent-reader
    * is the contract; a crash leaves either the old tree in place or an
    * `.old-segments-*` dir to recover by hand.
    */
  def compactSegments(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val raw = graft.io.Sidecar.read(fs, dir, ParamsFileName).getOrElse(
      throw new IllegalStateException(
        s"compactSegments: no $ParamsFileName at $path"))
    val node = graft.io.Json.parse(raw)
    require(!node.has("n_docs"),
      s"compactSegments: $path is a one-shot monolithic index — already " +
        "one segment by construction")
    val segs = listSegments(fs, dir)
    if (segs.length <= 1) return // nothing to merge
    val numBuckets = node.get("num_buckets").asInt()
    val lowercase = node.get("lowercase").asBoolean()
    val stem = stemOf(node)
    val idCol = node.get("id_col").asText()
    val idTypeJson = node.get("id_type").asText()
    val stats = segs.map(p => segmentStats(fs, p))
    val nDocs = stats.map(_._1).sum
    val sumDl = stats.map(_._2).sum
    val withRows = segs.zip(stats).collect { case (p, (_, s)) if s > 0 => p }
    val tmpTree = new org.apache.hadoop.fs.Path(dir,
      s".tmp-segments-${java.util.UUID.randomUUID()}")
    val mergedSeg = new org.apache.hadoop.fs.Path(tmpTree,
      f"$SegmentPrefix${1}%06d")
    if (withRows.nonEmpty) {
      // a parquet re-scan, not a recompute: no pin needed for the range
      // partitioner's sampling pass
      val postings = withRows.map(p => spark.read.parquet(p.toString))
        .reduce(_ unionByName _)
        .select(col(idCol), col("__dl"), col("__term"), col("__tf"),
          col("__tb")) // normalize column order across segments
      writePostings(postings, mergedSeg, fs, numBuckets, lowercase, stem,
        idCol, idTypeJson, nDocs, sumDl, targetFileBytes)
    } else {
      // all segments empty: a sidecar-only merged segment
      fs.mkdirs(mergedSeg): Unit
      graft.io.Sidecar.commit(fs, mergedSeg, ParamsFileName,
        graft.io.Json.toJson(Map(
          "num_buckets" -> numBuckets, "lowercase" -> lowercase,
          "stem" -> stem,
          "id_col" -> idCol, "id_type" -> idTypeJson,
          "n_docs" -> nDocs, "sum_dl" -> sumDl)),
        overwrite = false): Unit
    }
    val segsDir = new org.apache.hadoop.fs.Path(dir, SegmentsDirName)
    val old = new org.apache.hadoop.fs.Path(dir,
      s".old-segments-${java.util.UUID.randomUUID()}")
    require(fs.rename(segsDir, old),
      s"compactSegments: cannot move $segsDir aside")
    require(fs.rename(tmpTree, segsDir),
      s"compactSegments: cannot install $tmpTree as $segsDir — the old " +
        s"tree is at $old; rename it back to recover")
    fs.delete(old, true): Unit
  }

  /** (n_docs, sum_dl) from a segment's sidecar; loud on an uncommitted
    * segment (should be impossible — commit is by rename). */
  private def segmentStats(
      fs: org.apache.hadoop.fs.FileSystem,
      seg: org.apache.hadoop.fs.Path): (Long, Long) = {
    val raw = graft.io.Sidecar.read(fs, seg, ParamsFileName)
      .getOrElse(throw new IllegalStateException(
        s"segment $seg has no $ParamsFileName — not a committed segment"))
    val node = graft.io.Json.parse(raw)
    (node.get("n_docs").asLong(), node.get("sum_dl").asLong())
  }

  /** BM25 scores for `queryTerms` from the index alone: `(idCol, n_hits,
    * score)`, one row per indexed document containing at least one query
    * term — the same output contract, formula association, and 6-decimal
    * rounding as [[TextAnalysis.bm25]], so results match it bit-for-bit
    * on the indexed corpus. Serves both layouts: monolithic
    * ([[writeIndex]]) reads the path directly; segmented
    * ([[appendSegment]]) sums the per-segment constants and unions the
    * per-segment scans — still bit-identical to a from-scratch rebuild
    * over the concatenated batches.
    *
    * Every scan is pruned two ways before any shuffle: a `__tb IN (...)`
    * literal filter (directory pruning — buckets computed driver-side via
    * [[termBucketLocal]]) and a `__term IN (...)` filter (row-group
    * min/max pruning inside each bucket, thanks to the build's term sort).
    */
  def searchIndex(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val raw = graft.io.Sidecar.read(fs, dir, ParamsFileName).getOrElse(
      throw new IllegalStateException(
        s"searchIndex: no $ParamsFileName at $path — not a committed " +
          "search index (or a crashed build; rebuild it)"))
    val node = graft.io.Json.parse(raw)
    val numBuckets = node.get("num_buckets").asInt()
    val lowercase = node.get("lowercase").asBoolean()
    val stem = stemOf(node)
    val idCol = node.get("id_col").asText()
    // query terms pass through the INDEX's recorded analyzer — a
    // stemmed index probed with unstemmed terms would silently miss
    val qs0 = if (lowercase) queryTerms.map(_.toLowerCase) else queryTerms
    val qs1 = if (stem) qs0.map(graft.functions.PorterStemmer.stem) else qs0
    val qs = qs1.distinct
    val (nDocs, sumDl, scanPaths) =
      if (node.has("n_docs")) // monolithic: constants inline, one scan root
        (node.get("n_docs").asLong(), node.get("sum_dl").asLong(), Seq(path))
      else { // segmented: sum constants, scan each committed segment
        val segs = listSegments(fs, dir)
        val stats = segs.map(p => segmentStats(fs, p))
        (stats.map(_._1).sum, stats.map(_._2).sum,
          // zero-posting segments have no data files to scan
          segs.zip(stats).collect { case (p, (_, s)) if s > 0 => p.toString })
      }
    if (sumDl == 0L) {
      // zero postings anywhere (every doc tokenless, or no segments yet):
      // valid, but no data files exist, so a parquet read would die on
      // schema inference — answer from the sidecar's recorded id type
      val idType = org.apache.spark.sql.types.DataType.fromJson(
        node.get("id_type").asText())
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol, idType),
          org.apache.spark.sql.types.StructField(
            "n_hits", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField(
            "score", org.apache.spark.sql.types.DoubleType))))
    }
    val buckets = qs.map(termBucketLocal(_, numBuckets)).distinct
    // same IEEE division as bm25's sum(long).cast(double) / count
    val avgdl = sumDl.toDouble / nDocs
    val postings = scanPaths
      .map(p => spark.read.parquet(p)
        .where(col("__tb").isin(buckets: _*) && col("__term").isin(qs: _*))
        .select(col(idCol), col("__dl"), col("__term"), col("__tf")))
      .reduce(_ unionByName _)
    // df counts over the UNION, so cross-segment document frequencies
    // are global — identical to a monolithic rebuild's window
    TextAnalysis.bm25Regroup(postings
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__term")))
      .select(col(idCol), col("__term"),
        TextAnalysis.bm25ScoreExpr(lit(nDocs), col("__df"), col("__tf"),
          col("__dl"), lit(avgdl), k1, b).as("__s")), idCol)
  }

  /** Dense 1-based rank of a BOUNDED result set (a top-k list, a scored
    * candidate pool — never a raw corpus: the global row_number window is
    * single-partition by design, bounded by the input's construction,
    * same contract as `TextAnalysis.buildVocab`'s id window). Ties break
    * on `idCol` so ranks are total and engine-reproducible.
    */
  def rankBy(df: DataFrame, idCol: String, orderBy: Column*): DataFrame =
    df.select(col(idCol), row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(orderBy :+ col(idCol).asc: _*)).as("rank"))

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists:
    * `score(d) = Σ_lists 1/(k + rank_list(d))`, the standard way to
    * combine heterogeneous retrieval signals (BM25, embedding similarity,
    * quality priors) without score calibration. Inputs are [[rankBy]]
    * outputs (or any `(idCol, rank)` frames); docs missing from a list
    * simply contribute nothing. Output: `(idCol, n_lists, rrf_score)`,
    * score rounded to 6 decimals.
    *
    * Scale shape: a unionByName of bounded ranked lists and one
    * map-side-combined regroup on the id — nothing corpus-sized.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    require(k >= 0, s"k must be >= 0, got $k")
    rankings
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k) + col("rank"))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        round(sum(col("__c")), 6).as("rrf_score"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
    * models, the RM3 interpolation of Abdul-Jaleel et al. 2004): run the
    * original query, treat the top `fbDocs` results as relevant, build a
    * feedback term distribution from them, keep the top `fbTerms`, and
    * interpolate with the uniform original-query weights at
    * `alphaMicros/1e6`. Returns the expanded weighted query as
    * `(term, weight_picos)` — weights in 1e-12 units so interpolation
    * is exact long arithmetic with NO division anywhere on the Spark
    * side that an oracle could round differently.
    *
    * Exactness contract (every engine must reproduce it bit-for-bit):
    *  - pass-1 scores are [[TextAnalysis.bm25]]'s 6-dp-rounded doubles,
    *    re-quantized to micros; feedback docs are the top `fbDocs` by
    *    `(score DESC, id ASC)` — a total order;
    *  - each feedback doc's term contribution is
    *    `round((tf · score_micros) · 1000.0 / dl)` — one long product,
    *    one double multiply, one double divide, one round — summed as
    *    LONGs; expansion terms are the top `fbTerms` by
    *    `(weight DESC, term ASC)`;
    *  - normalization is `round(w · 1e6 / Σw)` per selected term, and the
    *    RM3 mix is `α_micros·orig_micros + (1e6 − α_micros)·rm_micros`
    *    pico-units, all exact longs.
    *
    * Scale shape: pass 1 is [[TextAnalysis.bm25]] (postings are
    * matches-sized); the feedback frame is `fbDocs` documents (a
    * broadcast-filtered slice), so the relevance-model aggregate is
    * bounded by construction; everything collected is ≤ fbTerms + |Q|
    * rows. The second pass ([[rm3Search]]) is one more matches-sized
    * bm25 with weights riding a map literal — no extra corpus scan
    * beyond bm25's own two.
    */
  def rm3Weights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      fbDocs: Int = 10,
      fbTerms: Int = 10,
      alphaMicros: Long = 500000L,
      k1: Double = 1.2,
      b: Double = 0.75): Seq[(String, Long)] = {
    require(fbDocs >= 1 && fbDocs <= 1000, s"fbDocs out of [1,1000]: $fbDocs")
    require(fbTerms >= 1 && fbTerms <= 10000,
      s"fbTerms out of [1,10000]: $fbTerms")
    require(alphaMicros >= 0L && alphaMicros <= 1000000L,
      s"alphaMicros out of [0,1e6]: $alphaMicros")
    val qs = queryTerms.map(_.toLowerCase).distinct
    val fb = TextAnalysis.bm25(docs, idCol, textCol, qs, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(fbDocs)
      .select(col(idCol), round(col("score") * 1e6).cast("long").as("__smic"))
    // feedback docs are few by construction — broadcast them onto the
    // corpus scan, then aggregate their (term, tf/dl-weighted) counts
    val fbToks = docs
      .join(broadcast(fb), Seq(idCol))
      .select(col(idCol), col("__smic"),
        transform(TextAnalysis.tokens(col(textCol)), t => lower(t))
          .as("__toks"))
      .select(col(idCol), col("__smic"), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__term"))
      // per (doc, term) — NOT per (smic, dl, term): two feedback docs
      // sharing a score and length must contribute separately-rounded
      // terms, or the oracle's per-doc grouping diverges by one ulp
      .groupBy(col(idCol), col("__smic"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val rm = fbToks
      .select(col("__term"),
        round(col("__tf") * col("__smic") * lit(1000.0) / col("__dl"))
          .cast("long").as("__wn"))
      .groupBy(col("__term")).agg(sum(col("__wn")).as("__wn"))
      .orderBy(col("__wn").desc, col("__term"))
      .limit(fbTerms)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(rm.nonEmpty,
      "rm3Weights: no feedback terms — the original query matched nothing")
    val rmSum = rm.map(_._2).sum
    val rmMic = rm.map { case (t, w) =>
      t -> math.round(w * 1000000.0 / rmSum) }.toMap
    val origMic = math.round(1000000.0 / qs.size)
    (qs.toSet ++ rmMic.keySet).toSeq.sorted.map { t =>
      val o = if (qs.contains(t)) origMic else 0L
      val r = rmMic.getOrElse(t, 0L)
      t -> (alphaMicros * o + (1000000L - alphaMicros) * r)
    }.filter(_._2 > 0L)
  }

  /** One-call RM3 retrieval: [[rm3Weights]] then a weighted BM25 pass
    * with the expanded query. Per-(doc, term) contributions are
    * `bm25_term_score · weight_picos / 1e12`, summed in TERM order via
    * the same sorted-fold contract as [[TextAnalysis.bm25]]; output
    * `(idCol, n_hits, score)` with score rounded to 6 decimals.
    */
  def rm3Search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      fbDocs: Int = 10,
      fbTerms: Int = 10,
      alphaMicros: Long = 500000L,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val weights = rm3Weights(docs, idCol, textCol, queryTerms,
      fbDocs, fbTerms, alphaMicros, k1, b)
    bm25WithWeights(docs, idCol, textCol, weights, k1, b)
  }

  /** Weighted-bag BM25: [[TextAnalysis.bm25]]'s exact machinery with a
    * per-term multiplier in pico-units (1e-12). Public so a caller can
    * persist an expanded query and re-run it without re-fitting.
    */
  def bm25WithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weightedTerms: Seq[(String, Long)],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(weightedTerms.nonEmpty, "weightedTerms must be non-empty")
    require(weightedTerms.map(_._1).distinct.size == weightedTerms.size,
      "weightedTerms carries duplicate terms")
    require(weightedTerms.forall(_._2 > 0L),
      "weights must be positive picos")
    val qs = weightedTerms.map(_._1.toLowerCase)
    require(qs.distinct.size == qs.size,
      "weightedTerms terms must be lowercase-distinct")
    val wLit = typedlit(weightedTerms.map(p => p._1.toLowerCase -> p._2).toMap)
    val toks = transform(TextAnalysis.tokens(col(textCol)), t => lower(t))
    val base = docs.select(col(idCol), size(toks).as("__dl"),
      filter(toks, t => t.isInCollection(qs)).as("__hits"))
    val stats = base.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val postings = base
      .where(size(col("__hits")) > 0)
      .select(col(idCol), col("__dl"), explode(col("__hits")).as("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__term")))
    val scored = postings
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("__term"),
        (TextAnalysis.bm25ScoreExpr(col("__n"), col("__df"), col("__tf"),
          col("__dl"), col("__avgdl"), k1, b) *
          element_at(wLit, col("__term")) / lit(1e12)).as("__s"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        round(aggregate(
          array_sort(collect_list(struct(col("__term"), col("__s")))),
          lit(0.0), (acc, x) => acc + x.getField("__s")), 6).as("score"))
  }
}
