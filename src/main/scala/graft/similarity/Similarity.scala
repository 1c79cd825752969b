package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.Normalizer
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Similarity metrics, KMeans partitioners, representative choices, and the
  * composing pipeline. Reference: src/spark_fuse/similarity/{metrics,
  * partitioners,choices,pipeline}.py — direct MLlib re-expression.
  */
object VectorColumns {

  /** Ensure `target` is a VectorUDT column derived from `source`
    * (metrics.py:40-58): pass-through for vectors, `array_to_vector` for
    * arrays, TypeError otherwise.
    */
  def ensureVectorColumn(df: DataFrame, source: String, target: String): (DataFrame, String) =
    df.schema(source).dataType match {
      case dt if dt == SQLDataTypes.VectorType =>
        if (source == target) (df, target)
        else (df.withColumn(target, col(source)), target)
      case _: ArrayType =>
        (df.withColumn(target, array_to_vector(col(source))), target)
      case other =>
        throw new IllegalArgumentException(
          s"Column $source must be an array or VectorUDT; found $other")
    }
}

trait SimilarityMetric {
  def embeddingCol: String
  /** Returns (prepared df, feature column downstream ops should use). */
  def prepare(df: DataFrame): (DataFrame, String)
}

/** Unit-normalize embeddings (p=2) so KMeans distance ≈ cosine
  * (metrics.py:78-92).
  */
final case class CosineSimilarity(
    embeddingCol: String = "embedding",
    preparedCol: String = "embedding_unit") extends SimilarityMetric {
  def prepare(df: DataFrame): (DataFrame, String) = {
    val (vectorized, vectorCol) =
      VectorColumns.ensureVectorColumn(df, embeddingCol, embeddingCol)
    val normalized = new Normalizer()
      .setInputCol(vectorCol).setOutputCol(preparedCol).setP(2.0)
      .transform(vectorized)
    (normalized, preparedCol)
  }
}

/** Pass-through metric (metrics.py:95-105). */
final case class EuclideanDistance(embeddingCol: String = "embedding")
    extends SimilarityMetric {
  def prepare(df: DataFrame): (DataFrame, String) =
    VectorColumns.ensureVectorColumn(df, embeddingCol, embeddingCol)
}

trait Partitioner {
  def outputCol: String
  def partition(df: DataFrame, featuresCol: Option[String] = None): DataFrame
}

/** MLlib KMeans wrapper (partitioners.py:52-86). Always pass a seed for
  * deterministic runs.
  */
final case class KMeansPartitioner(
    k: Int = 8,
    maxIter: Int = 20,
    seed: Option[Long] = None,
    featuresCol: Option[String] = None,
    outputCol: String = "cluster_id") extends Partitioner {
  def partition(df: DataFrame, runtimeFeatures: Option[String] = None): DataFrame = {
    val column = runtimeFeatures.orElse(featuresCol).getOrElse("embedding")
    val (vectorized, vectorCol) = VectorColumns.ensureVectorColumn(df, column, column)
    val estimator = new KMeans()
      .setK(k).setMaxIter(maxIter)
      .setFeaturesCol(vectorCol).setPredictionCol(outputCol)
    seed.foreach(estimator.setSeed)
    KMeansPartitioner.fitTransformCached(estimator, vectorized)
  }
}

object KMeansPartitioner {
  /** Persist the prepared input for the iterative fit — without it every
    * KMeans pass (maxIter + init) recomputes the scan→vectorize→normalize
    * chain. Unpersisted after fit; the single transform pass re-derives the
    * input once, which is far cheaper than 20+ recomputes.
    */
  private[graft] def fitTransformCached(
      estimator: KMeans, vectorized: DataFrame): DataFrame = {
    val alreadyCached =
      vectorized.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (!alreadyCached)
      vectorized.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try estimator.fit(vectorized).transform(vectorized)
    finally if (!alreadyCached) vectorized.unpersist(blocking = false)
  }
}

/** KMeans with k inferred from row count / target cluster size
  * (partitioners.py:89-152): k = clamp(ceil(n/targetPartitionSize),
  * minPartitions, maxPartitions).
  */
final case class AutoKMeansPartitioner(
    targetPartitionSize: Long = 5000L,
    minPartitions: Int = 1,
    maxPartitions: Option[Int] = None,
    maxIter: Int = 20,
    seed: Option[Long] = None,
    featuresCol: Option[String] = None,
    outputCol: String = "cluster_id") extends Partitioner {
  require(targetPartitionSize > 0, "targetPartitionSize must be a positive integer")
  require(minPartitions >= 1, "minPartitions must be at least 1")
  maxPartitions.foreach(m =>
    require(m >= minPartitions, "maxPartitions must be >= minPartitions"))

  def inferPartitionCount(rowCount: Long): Int = {
    if (rowCount <= 0) return minPartitions
    val raw = math.ceil(rowCount.toDouble / targetPartitionSize).toInt
    val lower = math.max(minPartitions, raw)
    maxPartitions.map(math.min(lower, _)).getOrElse(lower)
  }

  def partition(df: DataFrame, runtimeFeatures: Option[String] = None): DataFrame = {
    val column = runtimeFeatures.orElse(featuresCol).getOrElse("embedding")
    val (vectorized0, vectorCol) = VectorColumns.ensureVectorColumn(df, column, column)
    val vectorized =
      vectorized0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val k = inferPartitionCount(vectorized.count())
      val estimator = new KMeans()
        .setK(k).setMaxIter(maxIter)
        .setFeaturesCol(vectorCol).setPredictionCol(outputCol)
      seed.foreach(estimator.setSeed)
      estimator.fit(vectorized).transform(vectorized)
    } finally vectorized.unpersist(blocking = false)
  }
}

trait ChoiceFunction {
  def clusterCol: String
  /** One representative row per cluster. */
  def select(df: DataFrame): DataFrame
}

/** First row per cluster by `orderBy` (or cluster id) (choices.py:29-51). */
final case class FirstItemChoice(
    clusterCol: String = "cluster_id",
    orderBy: Seq[String] = Nil) extends ChoiceFunction {
  def select(df: DataFrame): DataFrame = {
    require(df.columns.contains(clusterCol),
      s"cluster column '$clusterCol' missing from DataFrame")
    val orderCols = if (orderBy.isEmpty) Seq(clusterCol) else orderBy
    val w = Window.partitionBy(col(clusterCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}

/** Arg-max row per cluster (choices.py:54-70). */
final case class MaxColumnChoice(
    column: String,
    clusterCol: String = "cluster_id") extends ChoiceFunction {
  def select(df: DataFrame): DataFrame = {
    require(column.nonEmpty, "column must be provided for MaxColumnChoice")
    require(df.columns.contains(column), s"column '$column' missing from DataFrame")
    val w = Window.partitionBy(col(clusterCol)).orderBy(col(column).desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}

/** Embed → (metric.prepare) → partition; then choice.select
  * (pipeline.py:42-67).
  */
final case class SimilarityPipeline(
    embeddingGenerator: EmbeddingGenerator,
    partitioner: Partitioner,
    similarityMetric: Option[SimilarityMetric] = None,
    choiceFunction: Option[ChoiceFunction] = None) {

  def run(df: DataFrame): DataFrame = {
    val embedded = embeddingGenerator.transform(df)
    val (prepared, featuresCol) = similarityMetric match {
      case Some(m) =>
        val (p, c) = m.prepare(embedded)
        (p, Some(c))
      case None => (embedded, None)
    }
    partitioner.partition(prepared, featuresCol)
  }

  def selectRepresentatives(clustered: DataFrame): DataFrame =
    choiceFunction
      .getOrElse(throw new IllegalArgumentException(
        "choiceFunction is not configured for this pipeline"))
      .select(clustered)
}
