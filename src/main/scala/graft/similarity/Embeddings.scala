package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Embedding generation. Reference: src/spark_fuse/similarity/embedding.py.
  *
  * The reference's sentence-transformers path is Python-only; per its own
  * design it falls back to a deterministic SHA-256 hash-to-vector stub
  * (embedding.py:25-65). Here that stub is the primary deterministic
  * generator — implemented as pure Catalyst column expressions (sha2 /
  * substring / conv / transform), fully codegen'd, no UDF — and the
  * pluggable real-model path keeps its Spark plumbing via a batched
  * mapPartitions generator with an executor-lazy encoder.
  */
trait EmbeddingGenerator {
  def outputCol: String
  def transform(df: DataFrame): DataFrame
}

/** Copy/alias an existing column as the embedding column
  * (embedding.py:97-121).
  */
final case class IdentityEmbeddingGenerator(
    inputCol: String = "features",
    outputCol: String = "embedding",
    dropInput: Boolean = false) extends EmbeddingGenerator {
  def transform(df: DataFrame): DataFrame =
    if (inputCol == outputCol) df
    else {
      val out = df.withColumn(outputCol, col(inputCol))
      if (dropInput) out.drop(inputCol) else out
    }
}

object HashEmbedding {

  /** Deterministic hash-to-vector as a pure column expression.
    *
    * Exact port of the reference math (embedding.py:25-51): SHA-256 digest
    * of the UTF-8 text, repeated to dims*4 bytes, each big-endian uint32
    * divided by 0xFFFFFFFF. Null/empty input → zero vector.
    */
  def hashToVector(text: Column, dims: Int = 16, normalize: Boolean = false): Column = {
    require(dims > 0, "dims must be positive")
    // 64 hex chars = 32 bytes per digest; repeat enough for dims*4 bytes.
    // Chunked via a regex-inserted separator + split so the digest is an
    // evaluated-once HOF argument (substr-from-inside-the-lambda would
    // recompute the sha per dimension).
    val repeats = (dims * 4 + 31) / 32
    val hexRep = concat(Seq.fill(repeats)(sha2(text, 256)): _*)
    val chunks = slice(split(regexp_replace(hexRep, "(.{8})", "$1,"), ","), 1, dims)
    val raw = transform(chunks,
      c => conv(c, 16, 10).cast("double") / lit(4294967295.0))
    val vec0 = transform(sequence(lit(0), lit(dims - 1)), _ => lit(0.0))
    val unnormalized = when(text.isNull || text === "", vec0).otherwise(raw)
    if (!normalize) unnormalized
    else {
      val norm = sqrt(aggregate(unnormalized, lit(0.0), (acc, x) => acc + x * x))
      when(norm === 0.0, unnormalized)
        .otherwise(transform(unnormalized, x => x / norm))
    }
  }
}

/** Deterministic hash-stub embedding generator (the JVM-side equivalent of
  * the reference's sentence-transformers fallback, embedding.py:54-65).
  */
final case class HashEmbeddingGenerator(
    inputCol: String = "text",
    outputCol: String = "embedding",
    dims: Int = 16,
    normalize: Boolean = true,
    dropInput: Boolean = false) extends EmbeddingGenerator {
  def transform(df: DataFrame): DataFrame = {
    val out = df.withColumn(outputCol,
      HashEmbedding.hashToVector(col(inputCol), dims, normalize)
        .cast(ArrayType(FloatType)))
    if (dropInput) out.drop(inputCol) else out
  }
}

/** Pluggable batch text encoder (the seam where a real model would sit). */
trait TextEncoder extends Serializable {
  /** Encode a batch of texts; must return one vector per input. */
  def encode(batch: Seq[String]): Seq[Array[Float]]
}

/** Deterministic stub encoder — same math as [[HashEmbedding]], driver/executor
  * agnostic (embedding.py:54-65).
  */
final case class HashStubEncoder(dims: Int = 16, normalize: Boolean = true)
    extends TextEncoder {
  def encode(batch: Seq[String]): Seq[Array[Float]] = batch.map { text =>
    if (text == null || text.isEmpty) Array.fill(dims)(0.0f)
    else {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8"))
      val needed = dims * 4
      val buf = Array.tabulate(needed)(i => digest(i % digest.length))
      val vec = Array.tabulate(dims) { i =>
        val v = ((buf(i * 4) & 0xffL) << 24) | ((buf(i * 4 + 1) & 0xffL) << 16) |
          ((buf(i * 4 + 2) & 0xffL) << 8) | (buf(i * 4 + 3) & 0xffL)
        (v.toDouble / 0xffffffffL.toDouble)
      }
      val out = if (normalize) {
        val n = math.sqrt(vec.map(x => x * x).sum)
        if (n == 0.0) vec else vec.map(_ / n)
      } else vec
      out.map(_.toFloat)
    }
  }
}

/** Batched encoder-backed generator: the Spark plumbing for a "real model"
  * path (embedding.py:186-303) — executor-side lazy encoder instantiation,
  * fixed-size batches inside mapPartitions, one output vector per row.
  *
  * Scale note: mapPartitions keeps model/client initialization per-partition
  * (per-core), and batches amortize per-call overhead exactly like the
  * reference's batch_size=32 pandas UDF.
  */
final case class BatchEncoderEmbeddingGenerator(
    encoderFactory: () => TextEncoder,
    inputCol: String = "text",
    outputCol: String = "embedding",
    batchSize: Int = 32,
    dropInput: Boolean = false) extends EmbeddingGenerator {

  def transform(df: DataFrame): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val inputIdx = df.columns.indexOf(inputCol)
    require(inputIdx >= 0, s"input column '$inputCol' missing from DataFrame")
    val outSchema = StructType(
      df.schema.fields :+ StructField(outputCol, ArrayType(FloatType), nullable = true))
    val factory = encoderFactory
    val bs = batchSize
    val out = df.mapPartitions { rows =>
      lazy val encoder = factory() // one encoder per partition, created lazily
      rows.grouped(bs).flatMap { batch =>
        val texts = batch.map { r =>
          val v = r.get(inputIdx)
          if (v == null) "" else v.toString
        }
        val vecs = encoder.encode(texts)
        require(vecs.length == batch.length,
          s"Encoder returned ${vecs.length} vectors for ${batch.length} texts")
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    if (dropInput) out.drop(inputCol) else out
  }
}

/** Vector aggregation across rows — chunk embeddings → document
  * embeddings ([[graft.operators.TextAnalysis.chunkTokens]] upstream,
  * [[graft.operators.Ann]] downstream).
  */
object Pooling {

  /** Mean-pool `vecCol` per `idCol` group, DETERMINISTICALLY: components
    * are quantized to integer nano-units before the cross-row sum (the
    * PageRank discipline — long addition is order-free, so the pooled
    * vector is bit-identical under any partitioning and in any engine
    * mirroring the arithmetic), then divided back out as doubles.
    * The 1e-9 per-component quantization is far below embedding noise.
    *
    * Shape: one explode → (id, pos)-keyed sum (map-side partials absorb
    * the fan-out) → per-id regroup via sorted collect_list — vectors
    * travel as components, never as whole arrays through a shuffle
    * twice. Ragged dimensions fail LOUD per group (a silently truncated
    * or zero-padded pool would corrupt every downstream similarity).
    * NULL vectors are excluded from the mean (documented; a group of
    * only nulls disappears).
    */
  def meanPool(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outCol: String = "embedding"): DataFrame = {
    val exploded = df
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), size(col(vecCol)).as("__d"),
        posexplode(transform(col(vecCol),
          x => round(x.cast("double") * 1e9).cast("long")))
          .as(Seq("__pos", "__nano")))
    val perPos = exploded
      .groupBy("__id", "__pos")
      .agg(sum(col("__nano")).as("__sum"), count(lit(1)).as("__n"),
        min(col("__d")).as("__dmin"), max(col("__d")).as("__dmax"))
    perPos
      .groupBy("__id")
      .agg(
        min(col("__dmin")).as("__gdmin"), max(col("__dmax")).as("__gdmax"),
        min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"),
        sort_array(collect_list(struct(col("__pos"),
          ((col("__sum").cast("double") / col("__n")) / lit(1e9)).as("__m"))))
          .as("__parts"))
      .select(col("__id").as(idCol),
        when(col("__gdmin") === col("__gdmax") && col("__nmin") === col("__nmax"),
          transform(col("__parts"), p => p.getField("__m")))
          .otherwise(raise_error(concat(
            lit("meanPool: ragged vector dimensions in group "),
            col("__id").cast("string"),
            lit(" (dims "), col("__gdmin").cast("string"),
            lit(".."), col("__gdmax").cast("string"), lit(")")))
            .cast("array<double>"))
          .as(outCol))
  }
}
