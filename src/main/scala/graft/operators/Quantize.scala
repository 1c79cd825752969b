package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization.
  *
  * Beyond-reference. A 100 TB embedding store is dominated by float32
  * vector bytes; symmetric int8 (q = round(v / scale), scale =
  * max|v|/127) cuts storage and scan I/O 4× and is the standard serving
  * format (FAISS SQ8, Qdrant int8, Milvus SQ8). Quantization error is
  * bounded by scale/2 per component, and cosine on dequantized vectors
  * tracks exact cosine closely (spec-asserted on the fixture).
  *
  * Everything is a codegen'd expression — no UDF. Deterministic: the
  * same engine-reproducible arithmetic on both the Spark and the DuckDB
  * oracle side (`q_quantize_embeddings`), with the single float output
  * (`scale`) rounded to 6 decimals on both sides.
  *
  * Zero vectors quantize to scale 0 + all-zero codes and dequantize back
  * to the zero vector.
  */
object Quantize {

  /** max|v| / 127 as double; 0.0 for empty or all-zero vectors. */
  def scaleExpr(vec: Column): Column =
    coalesce(
      array_max(transform(vec, x => abs(x.cast("double")))), lit(0.0)) / 127.0

  /** int8 codes for `vec` given its `scale` (array<byte>). */
  def codesExpr(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast("double") / scale)).cast("byte"))

  /** Reconstruct approximate float values: code · scale (array<double>). */
  def dequantizeExpr(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Quantize `vecCol` into `<out>_scale` (double) + `<out>_codes`
    * (array<byte>) — one narrow projection, the original column dropped.
    */
  def quantize(
      df: DataFrame,
      vecCol: String,
      outPrefix: String = "q"): DataFrame = {
    val withScale = df.withColumn(s"${outPrefix}_scale", scaleExpr(col(vecCol)))
    withScale
      .withColumn(s"${outPrefix}_codes",
        codesExpr(col(vecCol), col(s"${outPrefix}_scale")))
      .drop(vecCol)
  }
}
