package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign documents to fixed
  * token-budget bins so short documents share a training sequence instead
  * of wasting pad tokens.
  *
  * Beyond-reference. The scalable formulation is cumulative-sum packing:
  * order documents deterministically within a shard, take the running
  * token total, and cut a new bin every time the running total crosses a
  * budget boundary — `bin = floor(exclusive_cumsum / budget)`. This is the
  * standard streaming approximation of bin packing (true first-fit is
  * inherently sequential): each bin's total stays within
  * `budget + max(doc_tokens) - 1`, and a document longer than the budget
  * occupies its own bin(s) worth of space. Everything is windows over the
  * shard key — one shuffle, no driver state, reproducible by any engine.
  */
object Packing {

  /** Adds `bin` (0-based, per shard) and `bin_offset` (the document's
    * exclusive running-token start within its shard).
    *
    * `shardCols` bounds the window: packing is per shard, so at 100 TB
    * each shard's ordered cumsum runs inside one task's partition of the
    * shard — never a single global ordering. Shard by whatever already
    * partitions the corpus (split, source, date bucket).
    */
  def packSequences(
      df: DataFrame,
      tokenCol: String,
      budget: Long,
      orderCols: Seq[Column],
      shardCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(orderCols.nonEmpty,
      "orderCols must be non-empty (packing must be deterministic)")
    require(shardCols.nonEmpty,
      "shardCols must be non-empty: a global ordered cumsum cannot scale; " +
        "shard by a column that already partitions the corpus")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCols: _*)
    val cum = sum(col(tokenCol)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("bin_offset", (cum - col(tokenCol)).cast("long"))
      .withColumn("bin", floor(col("bin_offset") / budget))
  }

  /** Assign every document to one of `numShards` output shards with
    * near-equal TOKEN totals (not row counts) — the trainer-facing
    * split: each shard feeds one data-loader worker, so a token-skewed
    * shard is a straggler epoch after epoch.
    *
    * Scale shape — a global ordered cumsum without a global sort:
    *  1. every row gets a 60-bit order hash `h` = sha256(id:salt)
    *     prefix; its value mod `orderBuckets` is the row's order bucket
    *     (the deterministic global order is (bucket, h, id));
    *  2. ONE bounded aggregate collects per-bucket token totals
    *     (`orderBuckets` rows on the driver — never data);
    *  3. bucket-offset prefix sums are folded back in as a map literal,
    *     so within-bucket window cumsum + offset = the row's exclusive
    *     GLOBAL token start, in one window exchange;
    *  4. `shard = min(numShards − 1, global_start div ceil(total /
    *     numShards))` — every shard's total lands within one maximum
    *     document of the target.
    *
    * Deterministic for fixed (ids, salt, numShards, orderBuckets) on
    * any engine and any partitioning; the DuckDB oracle rebuilds it
    * verbatim. Null or negative token counts fail loud in-row (the
    * [[graft.operators.Sampling.tokenBudgetPerGroup]] policy — a null
    * would silently vanish from the balance).
    */
  def assignShards(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      numShards: Int,
      salt: String = "graft-shard",
      orderBuckets: Int = 256): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val (based, total) =
      withGlobalTokenStart(df, idCol, tokenCol, salt, orderBuckets)
    require(total > 0, "assignShards: corpus has zero total tokens")
    val target = (total + numShards - 1) / numShards
    based
      .withColumn("shard",
        least(lit(numShards - 1).cast("long"),
          expr(s"__gc div ${target}L")))
      .drop("__gc")
  }

  /** The two-phase global token cumsum shared by [[assignShards]] and
    * [[appendToShards]]: returns (df + `__gc` exclusive global token
    * start in the deterministic (hash-bucket, hash, id) order, grand
    * total). Driver state is `orderBuckets` longs — never data.
    */
  private def withGlobalTokenStart(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      salt: String,
      orderBuckets: Int): (DataFrame, Long) = {
    require(orderBuckets >= 1, s"orderBuckets must be >= 1, got $orderBuckets")
    val h = graft.functions.VectorFunctions.hexPrefixToLong(
      sha2(concat_ws(":", col(idCol).cast("string"), lit(salt)), 256), 15)
    val tok = when(col(tokenCol).isNotNull && col(tokenCol) >= 0,
        col(tokenCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"assignShards: `$tokenCol` must be non-null and >= 0, got "),
        coalesce(col(tokenCol).cast("string"), lit("NULL")))).cast("long"))
    val based = df.withColumn("__h", h)
      .withColumn("__ob", col("__h") % orderBuckets)
    // bounded driver state: orderBuckets (bucket, token-total) pairs
    val totals = based.groupBy("__ob").agg(sum(tok).as("__t"))
      .collect().map(r => r.getAs[Long]("__ob") -> r.getAs[Long]("__t"))
      .sortBy(_._1)
    val total = totals.map(_._2).sum
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = Window.partitionBy(col("__ob"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    (based
      .withColumn("__gc",
        coalesce(sum(tok).over(w), lit(0L)) +
          element_at(typedlit(offsets), col("__ob")))
      .drop("__h", "__ob"), total)
  }

  /** [[assignShards]] + write: one `shard=<k>` parquet directory per
    * shard and a manifest sidecar (per-shard rows/tokens + the
    * assignment parameters), manifest LAST so a crashed export reads
    * as "no manifest", never as a silently short epoch.
    */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      tokenCol: String,
      numShards: Int,
      salt: String = "graft-shard",
      orderBuckets: Int = 256): Unit = {
    val spark = df.sparkSession
    val assigned = assignShards(df, idCol, tokenCol, numShards, salt,
      orderBuckets)
    assigned.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(path)
    certifyManifest(spark, path, idCol, tokenCol, numShards, salt,
      orderBuckets)
  }

  /** Append a batch into an EXISTING shard layout, deficit-targeted:
    * new documents flow into the currently-lightest shards so the
    * layout re-balances instead of drifting (nightly arrivals never
    * force a full re-export). The batch's deterministic global cumsum
    * ([[assignShards]]' machinery, parameters read from the manifest)
    * is cut at cumulative per-shard DEFICIT boundaries — shard `i`
    * absorbs `max(0, newTarget − currentTokens_i)` of the batch, where
    * `newTarget = ceil((currentTotal + batchTotal) / numShards)` — so
    * after the append every shard again sits within one maximum
    * document of the common target.
    *
    * Crash contract: data files append first, the manifest recertifies
    * LAST from the committed files; a crash mid-append leaves fresh
    * files whose tokens the manifest does not yet certify — re-run the
    * append job (delivery is at-least-once; dedup replayed ids
    * downstream like every append path here).
    */
  def appendToShards(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val manifest = graft.io.Sidecar.read(fs, dir, ShardManifestFileName)
      .getOrElse(throw new IllegalArgumentException(
        s"no shard manifest at $path — not a writeShards layout, or a " +
          "torn export"))
    val node = graft.io.Json.parse(manifest)
    val n = node.get("num_shards").asInt()
    val salt = node.get("salt").asText()
    val orderBuckets = node.get("order_buckets").asInt()
    val tokenCol = node.get("token_col").asText()
    val idCol = node.get("id_col").asText()
    val current = {
      import scala.jdk.CollectionConverters._
      node.get("shards").elements().asScala
        .map(e => e.get("shard").asLong() -> e.get("tokens").asLong()).toMap
    }
    val (based, b) =
      withGlobalTokenStart(batch, idCol, tokenCol, salt, orderBuckets)
    require(b > 0, "appendToShards: batch has zero total tokens")
    val grand = current.values.sum + b
    val newTarget = (grand + n - 1) / n
    val deficits = (0L until n.toLong)
      .map(i => i -> math.max(0L, newTarget - current.getOrElse(i, 0L)))
    val cum = deficits.map(_._2).scanLeft(0L)(_ + _)
    val bounds = deficits.indices
      .map(i => (deficits(i)._1, cum(i), cum(i + 1)))
      .filter { case (_, lo, hi) => hi > lo }
    // Σdeficit = n·newTarget − ΣT ≥ B > 0, so bounds is never empty and
    // every __gc < B falls inside a boundary; the coalesce is armor
    val bLit = typedlit(bounds)
      .cast("array<struct<shard:bigint,lo:bigint,hi:bigint>>")
    val assigned = based.withColumn("shard", coalesce(
      element_at(filter(bLit, x =>
        col("__gc") >= x.getField("lo") && col("__gc") < x.getField("hi")),
        1).getField("shard"),
      lit(bounds.last._1))).drop("__gc")
    assigned.write.mode("append").partitionBy("shard").parquet(path)
    certifyManifest(spark, path, idCol, tokenCol, n, salt, orderBuckets)
  }

  /** Manifest from the COMMITTED files, not the plan — what landed is
    * what the manifest certifies. Column-pruned: the scan reads only
    * the token column and the shard partition value.
    */
  private def certifyManifest(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String,
      tokenCol: String,
      numShards: Int,
      salt: String,
      orderBuckets: Int): Unit = {
    val stats = spark.read.parquet(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("rows"), sum(col(tokenCol)).as("tokens"))
      .collect().map(r => Map(
        "shard" -> r.getAs[Number]("shard").longValue(),
        "rows" -> r.getAs[Long]("rows"),
        "tokens" -> r.getAs[Long]("tokens")))
      .sortBy(_("shard").asInstanceOf[Long])
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val json = graft.io.Json.toJson(Map(
      "num_shards" -> numShards, "salt" -> salt,
      "order_buckets" -> orderBuckets, "token_col" -> tokenCol,
      "id_col" -> idCol, "shards" -> stats.toSeq))
    val committed = graft.io.Sidecar.commit(
      fs, dir, ShardManifestFileName, json, overwrite = true)
    if (committed != json) throw new IllegalStateException(
      s"shard manifest: concurrent writer detected at $path — " +
        "single-writer maintenance only")
  }

  val ShardManifestFileName = "_graft_shards.json"
}
