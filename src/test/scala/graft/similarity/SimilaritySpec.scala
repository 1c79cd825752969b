package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("hashToVector expression matches the stub encoder math") {
    val df = Seq("hello", "", "graft").toDF("text")
    val expr = df.select(
      HashEmbedding.hashToVector(col("text"), dims = 16, normalize = false).as("v"))
      .collect().map(_.getSeq[Double](0))
    val stub = HashStubEncoder(dims = 16, normalize = false)
      .encode(Seq("hello", "", "graft"))
    expr.zip(stub).foreach { case (e, s) =>
      e.zip(s).foreach { case (a, b) => assert(math.abs(a - b.toDouble) < 1e-6) }
    }
    // empty text → zero vector
    assert(expr(1).forall(_ == 0.0))
    // normalized variant has unit length
    val normed = df.filter($"text" =!= "").select(
      HashEmbedding.hashToVector(col("text"), 16, normalize = true).as("v"))
      .collect().map(_.getSeq[Double](0))
    normed.foreach(v => assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9))
  }

  test("batched encoder generator appends vectors with executor-side batching") {
    val df = (1 to 100).map(i => (i.toLong, s"text-$i")).toDF("id", "text")
    val gen = BatchEncoderEmbeddingGenerator(
      () => HashStubEncoder(dims = 8), inputCol = "text", batchSize = 16)
    val out = gen.transform(df)
    assert(out.columns.toSeq == Seq("id", "text", "embedding"))
    val rows = out.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getSeq[Float](2).length == 8))
    // deterministic: same text → same vector
    val v1 = out.filter($"id" === 1).collect()(0).getSeq[Float](2)
    val v2 = gen.transform(df).filter($"id" === 1).collect()(0).getSeq[Float](2)
    assert(v1 == v2)
  }

  test("pipeline clusters separable blobs and picks one representative each") {
    val pts = Seq(
      (1L, Array(0.1f, 0.1f), 1.0), (2L, Array(0.12f, 0.09f), 3.0),
      (3L, Array(0.11f, 0.11f), 2.0), (4L, Array(5.0f, 5.1f), 9.0),
      (5L, Array(5.1f, 5.0f), 4.0), (6L, Array(4.9f, 5.05f), 5.0)
    ).toDF("id", "embedding", "score")
    val pipeline = SimilarityPipeline(
      IdentityEmbeddingGenerator(inputCol = "embedding"),
      KMeansPartitioner(k = 2, seed = Some(42L)),
      similarityMetric = Some(EuclideanDistance()),
      choiceFunction = Some(MaxColumnChoice("score")))
    val clustered = pipeline.run(pts)
    val byCluster = clustered.collect()
      .groupBy(_.getAs[Int]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(byCluster.values.toSet == Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)))
    val reps = pipeline.selectRepresentatives(clustered)
    val repIds = reps.collect().map(_.getAs[Long]("id")).toSet
    assert(repIds == Set(2L, 4L)) // max score in each blob
  }

  test("cosine metric produces unit vectors; auto-kmeans infers k") {
    val pts = Seq((1L, Array(3.0, 4.0)), (2L, Array(0.0, 2.0))).toDF("id", "embedding")
    val (prepared, c) = CosineSimilarity().prepare(pts)
    assert(c == "embedding_unit")
    val v = prepared.select(c).collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    v.foreach(x => assert(math.abs(math.sqrt(x.toArray.map(a => a * a).sum) - 1.0) < 1e-9))

    val auto = AutoKMeansPartitioner(targetPartitionSize = 2, seed = Some(1L),
      maxPartitions = Some(3))
    assert(auto.inferPartitionCount(0) == 1)
    assert(auto.inferPartitionCount(5) == 3)
    assert(auto.inferPartitionCount(100) == 3) // capped by maxPartitions
    val manyPts = (1 to 8).map(i => (i.toLong, Array(i.toDouble, i.toDouble)))
      .toDF("id", "embedding")
    val clustered = auto.partition(manyPts) // k = ceil(8/2) capped at 3
    assert(clustered.columns.contains("cluster_id"))
    assert(clustered.select("cluster_id").distinct().count() == 3)
    intercept[IllegalArgumentException] {
      VectorColumns.ensureVectorColumn(pts.withColumn("bad", lit("x")), "bad", "bad")
    }
  }

  test("seeded pipeline on the embeddings fixture reproduces golden clusters") {
    // The exact pipeline behind SparkEntry's rows-only
    // q_cluster_representatives: seed 42 makes the KMeans partition (and
    // therefore cluster sizes) deterministic, so this is the golden-row
    // assertion that query's oracle cannot express.
    val pipeline = SimilarityPipeline(
      IdentityEmbeddingGenerator(inputCol = "embedding"),
      KMeansPartitioner(k = 8, seed = Some(42L)),
      Some(CosineSimilarity()),
      Some(MaxColumnChoice("label")))
    val clustered = pipeline.run(
      spark.read.parquet(sf("embeddings"))).cache()
    try {
      val sizes = clustered.groupBy("cluster_id").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes == Map(0 -> 1L, 1 -> 100L, 2 -> 76L, 3 -> 129L,
        4 -> 1L, 5 -> 74L, 6 -> 11L, 7 -> 108L))
      val maxLabel = clustered.groupBy("cluster_id")
        .agg(max("label").as("maxl")).collect()
        .map(r => r.getInt(0) -> r.getAs[Number]("maxl").longValue()).toMap
      val reps = pipeline.selectRepresentatives(clustered)
        .select("vec_id", "cluster_id", "label").collect()
      assert(reps.length == 8 && reps.map(_.getInt(1)).toSet == (0 to 7).toSet)
      // every representative attains its cluster's max label
      reps.foreach(r => assert(
        r.getAs[Number]("label").longValue() == maxLabel(r.getInt(1))))
      // clusters whose arg-max is unique pin an exact representative row
      val byCluster = reps.map(r => r.getInt(1) -> r.getLong(0)).toMap
      assert(byCluster(0) == 221L && byCluster(4) == 120L && byCluster(6) == 224L)
    } finally clustered.unpersist()
  }

  test("meanPool: exact nano-unit means, partition-invariant, ragged loud") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (1L, Array(2.0, 4.0, 9.0)),
      (2L, Array(0.5, -0.5, 0.25)),
      (3L, null.asInstanceOf[Array[Double]]),   // null-only group vanishes
      (2L, null.asInstanceOf[Array[Double]]))   // null excluded from mean
      .toDF("doc_id", "vec")
    val out = Pooling.meanPool(df, "doc_id", "vec")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Double](1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == Seq(1.5, 3.0, 6.0))
    assert(out(2L) == Seq(0.5, -0.5, 0.25))
    // partitioning must not change a bit
    val re = Pooling.meanPool(df.repartition(7), "doc_id", "vec")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
    assert(re == out)
    // ragged dims inside a group fail loud
    val ragged = Seq((1L, Array(1.0, 2.0)), (1L, Array(1.0, 2.0, 3.0)))
      .toDF("doc_id", "vec")
    val e = intercept[Exception](
      Pooling.meanPool(ragged, "doc_id", "vec").collect())
    assert(e.getMessage.contains("ragged"))
  }
}
