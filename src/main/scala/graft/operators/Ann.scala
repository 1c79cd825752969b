package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small) query
  *    set against the streamed corpus; one pass, no corpus shuffle.
  *  - [[Ivf]] — the scale path: a KMeans coarse quantizer (IVF); queries
  *    probe only the `nprobe` nearest cells, so the scanned fraction is
  *    ~nprobe/nlist of the corpus. Cell assignment is a narrow projection;
  *    the search join shuffles on cell id only.
  */
object Ann {

  /** Exact cosine top-k: for each query row, the `k` nearest corpus rows.
    *
    * Output: (q_id, id, cos, rank). Cosine is rounded to 6 decimals before
    * ranking (ties broken by corpus id) so results are reproducible across
    * engines. The query side is broadcast — keep it small (≤ ~100k rows);
    * for larger query sets, block both sides instead.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val q = Dedup.cosineSide(queries, Nil, qIdCol, vecCol, "q")
      .withColumnRenamed("id_q", "q_id")
    val c = Dedup.cosineSide(corpus, Nil, idCol, vecCol, "c")
      .withColumnRenamed("id_c", "id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("id").asc)
    c.join(broadcast(q))
      .withColumn("cos", round(
        Dedup.cosineWithNorms(col("__v_q"), col("__v_c"), col("__n_q"), col("__n_c")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "id", "cos", "rank")
  }

  /** IVF (inverted-file) index: corpus rows assigned to KMeans cells.
    * `nassign` > 1 means each row is indexed under its `nassign` nearest
    * cells (multi-assignment), trading index size for recall.
    */
  final case class IvfIndex(
      assigned: DataFrame, // corpus with __cell column
      centroids: Array[(Int, Array[Double])],
      idCol: String,
      vecCol: String,
      nassign: Int = 1)

  object Ivf {

    /** Fit the coarse quantizer and assign every corpus row to a cell.
      * `nlist` ≈ sqrt(corpus size) is the usual choice.
      */
    /** Points per cell in the quantizer-training sample — the conventional
      * IVF training budget (more adds cost, not recall).
      */
    val TrainPointsPerCell = 256

    def build(
        corpus: DataFrame,
        idCol: String,
        vecCol: String,
        nlist: Int,
        seed: Long = 42L,
        maxIter: Int = 20,
        nassign: Int = 1,
        initMode: String = "k-means||"): IvfIndex = {
      require(nassign >= 1 && nassign <= nlist, "nassign must be in [1, nlist]")
      // KMeans needs a VectorUDT column — only the bounded training sample
      // pays for the conversion; full-corpus assignment is expression-based
      val withVec = corpus.withColumn("__ivf_vec",
        org.apache.spark.ml.functions.array_to_vector(col(vecCol)))
      // train the coarse quantizer on a bounded sample (the full corpus
      // would pay maxIter+init passes over 100 TB for no recall gain)
      val targetTrain = nlist.toLong * TrainPointsPerCell
      val n = corpus.count()
      val trainSet =
        if (n <= targetTrain) withVec
        else withVec.sample(withFraction(targetTrain, n), seed)
      val estimator = new org.apache.spark.ml.clustering.KMeans()
        .setK(nlist).setMaxIter(maxIter).setSeed(seed).setInitMode(initMode)
        .setFeaturesCol("__ivf_vec").setPredictionCol("__cell")
      val alreadyCached =
        trainSet.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (!alreadyCached)
        trainSet.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents =
        try {
          // centroids straight off the model: nlist × dim doubles on the
          // driver — never the corpus itself
          estimator.fit(trainSet).clusterCenters.zipWithIndex
            .map { case (v, i) => i -> v.toArray }
        } finally if (!alreadyCached) trainSet.unpersist(blocking = false)
      // Assign each corpus row its top-`nassign` cells by the SAME ranking
      // the query probe uses (cosine to centroid) — KMeans's own Euclidean
      // assignment disagrees with the cosine probe on unnormalized data and
      // measurably costs recall. Codegen'd narrow projection, one pass.
      val assigned = corpus.withColumn("__cell",
        explode(topCells(col(vecCol), centroidsLiteral(cents), nassign)))
      IvfIndex(assigned, cents, idCol, vecCol, nassign)
    }

    /** Fit a SEEDED quantizer: the `nlist` corpus vectors with the
      * smallest sha256(id:seed) become the centroids directly — no KMeans
      * iterations, no count/sample jobs, ONE TakeOrdered job total. Cell
      * quality is that of randomly-seeded unrefined Voronoi cells: wrong
      * for an ANN index (recall depends on centroid polish — use
      * [[build]]), right when the quantizer is only a BLOCKING device
      * ([[Dedup.semanticDedup]]), where near-identical vectors land
      * together under any centroid set and refinement buys nothing.
      *
      * Fully deterministic for a fixed (corpus ids, nlist, seed) — no RNG,
      * no partition-order sensitivity, unlike KMeans's sampled init.
      * All-zero vectors are never chosen as seeds (cosine to them is 0
      * everywhere — every such centroid would tie for every row).
      */
    def buildSeeded(
        corpus: DataFrame,
        idCol: String,
        vecCol: String,
        nlist: Int,
        seed: Long = 42L,
        nassign: Int = 1): IvfIndex = {
      require(nlist >= 1, s"nlist must be >= 1, got $nlist")
      require(nassign >= 1 && nassign <= nlist, "nassign must be in [1, nlist]")
      val vd = transform(col(vecCol), x => x.cast("double"))
      val cents = corpus
        .select(col(idCol).cast("string").as("__id"), vd.as("__v"))
        .where(graft.functions.VectorFunctions.sumSquares(col("__v")) > 0.0)
        .withColumn("__h", sha2(concat_ws(":", col("__id"), lit(seed)), 256))
        .orderBy(col("__h"), col("__id")) // TakeOrdered, never a full sort
        .limit(nlist)
        .collect() // ≤ nlist × dim doubles — never corpus-sized
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](1).toArray }
      require(cents.nonEmpty,
        "buildSeeded: corpus has no non-zero vectors to seed from")
      val assigned = corpus.withColumn("__cell",
        explode(topCells(col(vecCol), centroidsLiteral(cents),
          math.min(nassign, cents.length))))
      IvfIndex(assigned, cents, idCol, vecCol, nassign)
    }

    /** Centroids as ONE array<struct<cell,c>> literal (`typedlit`), not an
      * `array(struct(lit…))` expression tree: the tree form carries
      * nlist × dim literal nodes into analysis and codegen, which blows the
      * generated-method limits right where IVF needs to scale (large
      * nlist). A single Literal is constant-folded and free to broadcast.
      */
    private[operators] def centroidsLiteral(
        centroids: Array[(Int, Array[Double])]): org.apache.spark.sql.Column = {
      val data: Seq[(Int, Seq[Double])] =
        centroids.toSeq.map { case (cell, c) => (cell, c.toSeq) }
      typedlit(data).cast(
        "array<struct<cell:int,c:array<double>>>")
    }

    /** The `n` cell ids nearest to `vec` by cosine (ties by cell id). */
    private[operators] def topCells(
        vec: org.apache.spark.sql.Column,
        centsLit: org.apache.spark.sql.Column,
        n: Int): org.apache.spark.sql.Column =
      slice(
        transform(
          array_sort(
            transform(centsLit, c =>
              struct((-Dedup.cosine(vec, c.getField("c"))).as("negCos"),
                c.getField("cell").as("cell")))),
          s => s.getField("cell")),
        1, n)

    /** Oversampled fraction so the sample almost surely reaches the target
      * size (Bernoulli sampling undershoots at the exact fraction).
      */
    private def withFraction(target: Long, n: Long): Double =
      math.min(1.0, target.toDouble * 1.1 / n)

    /** Probe the `nprobe` nearest cells per query, exact top-k inside them.
      * Centroids ride along as a broadcast literal (nlist × dim doubles).
      *
      * With `pruneScan = true` (the default) this is EAGER: the probed
      * cell set must be known as a literal for partition pruning, so the
      * query-side cell assignment runs as a Spark job at call time. The
      * projected query side is pinned ([[graft.core.Caches.pin]]) so that
      * job and the final search plan read the SAME materialization — a
      * nondeterministic `queries` lineage (sample, unordered limit) cannot
      * probe cells the pruned scan dropped. Long-lived sessions wrap calls
      * in `Caches.collectPins` to release the pin after materializing.
      * `pruneScan = false` keeps the plan fully lazy (no job, no pin).
      */
    def search(
        index: IvfIndex,
        queries: DataFrame,
        qIdCol: String,
        vecCol: String,
        k: Int,
        nprobe: Int,
        pruneScan: Boolean = true): DataFrame = {
      // rank cells by cosine(query, centroid), keep nprobe best
      val q0 = queries.select(col(qIdCol).as("q_id"), col(vecCol).as("__qv"))
        .withColumn("__cell",
          explode(topCells(col("__qv"), centroidsLiteral(index.centroids), nprobe)))
      // restrict the index scan to the probed cells: the distinct cell set
      // is ≤ nlist values (a tiny driver collect — queries are broadcast-
      // small by this operator's contract), and against a [[writeIndex]]-
      // persisted index the IN filter on the __cell partition column
      // prunes to the probed cells' DIRECTORIES — the probe reads nprobe
      // cells' files, not the corpus
      val (q, assigned) =
        if (pruneScan) {
          val pinned = graft.core.Caches.pin(q0)
          val cells = pinned.select("__cell").distinct().collect()
            .map(_.getAs[Int]("__cell"))
          (pinned,
            index.assigned.where(col("__cell").isin(cells.map(Int.box): _*)))
        } else (q0, index.assigned)
      val c = Dedup.cosineSide(assigned, Seq("__cell"), index.idCol,
        index.vecCol, "c").withColumnRenamed("id_c", "id")
      val qSide = Dedup.cosineSide(
        q.withColumnRenamed("__qv", "__rawq"), Seq("__cell"), "q_id", "__rawq", "q")
        .withColumnRenamed("id_q", "q_id")
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("id").asc)
      val scored = c.join(broadcast(qSide), Seq("__cell"))
        .withColumn("cos", round(
          Dedup.cosineWithNorms(col("__v_q"), col("__v_c"), col("__n_q"), col("__n_c")), 6))
      // multi-assigned rows can meet a query in more than one probed cell;
      // collapse to one row per (q_id, id) before ranking. Skipped for
      // nassign=1 so the common path stays a single shuffle.
      val unique =
        if (index.nassign > 1) scored.dropDuplicates("q_id", "id") else scored
      unique
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("q_id", "id", "cos", "rank")
    }

    /** Sidecar recording the quantizer (centroids) and column contract of
      * a persisted index — the index is unreadable without it, so it is
      * written AFTER the data: a crash mid-write leaves no sidecar and
      * [[loadIndex]] fails loud instead of probing a torn index.
      */
    val SidecarFileName = "_graft_ivf_index.json"

    /** Persist an IVF index: assigned rows partitioned by `__cell` (so a
      * probe's cell filter prunes whole directories) + the centroid/param
      * sidecar. Overwrite semantics — this is the "rebuild the index
      * nightly" maintenance shape, not a concurrent append target
      * (signatures append incrementally via [[graft.operators.DedupIndex]]
      * -style layouts; IVF cell assignment depends on the trained
      * centroids, so incremental growth belongs in a rebuild).
      *
      * `quantize = true` stores each cell's vectors as symmetric int8
      * codes + a per-vector scale ([[Quantize]]) instead of the float
      * array — ~4× less probe I/O, the FAISS-SQ8 shape. [[loadIndex]]
      * dequantizes INSIDE the probe projection (a codegen'd `transform`
      * over the scanned codes), so [[search]] is oblivious; the cost is
      * bounded per-component reconstruction error (recall floor
      * spec-asserted vs the exact search in AnnMultimodalSpec).
      */
    def writeIndex(
        index: IvfIndex, path: String, quantize: Boolean = false): Unit = {
      val spark = index.assigned.sparkSession
      val toWrite =
        if (!quantize) index.assigned
        else index.assigned
          .withColumn("__q_scale", Quantize.scaleExpr(col(index.vecCol)))
          .withColumn("__q_codes",
            Quantize.codesExpr(col(index.vecCol), col("__q_scale")))
          .drop(index.vecCol)
      // pin STATIC overwrite: under the common partitionOverwriteMode=
      // dynamic session setting, overwrite would keep (a) the old sidecar
      // alive through the whole data write — a crash mid-write then reads
      // as a VALID index mixing old centroids with partial new data — and
      // (b) stale cell directories that this rebuild assigned no rows to,
      // whose rows a probe would return as silently wrong neighbors
      toWrite.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("__cell").parquet(path)
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val json = graft.io.Json.toJson(Map(
        "id_col" -> index.idCol, "vec_col" -> index.vecCol,
        "nassign" -> index.nassign, "quantized" -> quantize,
        "centroids" -> index.centroids.toSeq.map { case (cell, c) =>
          Map("cell" -> cell, "c" -> c.toSeq) }))
      val committed = graft.io.Sidecar.commit(
        fs, dir, SidecarFileName, json, overwrite = true)
      // single-writer maintenance contract: a concurrent writer whose
      // content won the rename race means the data files are in unknown
      // mixed state too — fail loud rather than leave OUR centroids
      // describing THEIR cell assignment (or vice versa)
      if (committed != json) throw new IllegalStateException(
        s"writeIndex: concurrent writer detected at $path — the committed " +
          "sidecar is not this build's; rebuild the index single-writer")
    }

    /** Load a persisted index. Fails loud when the sidecar is missing —
      * an interrupted [[writeIndex]] leaves data without a sidecar, which
      * must read as "no index", never as a silently wrong one.
      */
    def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val sidecar = new org.apache.hadoop.fs.Path(dir, SidecarFileName)
      require(fs.exists(sidecar),
        s"no IVF sidecar at $path — index missing or torn by a failed write")
      val in = fs.open(sidecar)
      val node =
        try graft.io.Json.parse(new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      val cents = node.get("centroids").elements().asScala.map { e =>
        val cell = e.get("cell").asInt()
        val c = e.get("c").elements().asScala.map(_.asDouble()).toArray
        cell -> c
      }.toArray
      val vecCol = node.get("vec_col").asText()
      val quantized = node.has("quantized") && node.get("quantized").asBoolean()
      val raw = spark.read.parquet(path)
      val assigned =
        if (!quantized) raw
        // dequantize in the probe projection: the scan reads int8 codes
        // (4× fewer bytes), the codegen'd transform reconstructs doubles
        else raw
          .withColumn(vecCol,
            Quantize.dequantizeExpr(col("__q_codes"), col("__q_scale")))
          .drop("__q_codes", "__q_scale")
      IvfIndex(
        assigned,
        cents,
        node.get("id_col").asText(),
        vecCol,
        node.get("nassign").asInt())
    }
  }

  /** Recall of an ANN result against the exact result: fraction of exact
    * top-k pairs the approximate search also returned.
    */
  def recallAgainstExact(exact: DataFrame, approx: DataFrame): Double = {
    val hits = exact.select("q_id", "id")
      .join(approx.select("q_id", "id"), Seq("q_id", "id"), "left_semi").count()
    val total = exact.count()
    if (total == 0) 1.0 else hits.toDouble / total
  }
}
