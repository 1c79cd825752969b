package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trips within scale/2 per component; zero vector is exact") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-127.0f, 127.0f)),
      (4L, Seq.empty[Float])
    ).toDF("id", "vec")
    val q = Quantize.quantize(df, "vec")
    val back = q.withColumn("deq",
      Quantize.dequantizeExpr(col("q_codes"), col("q_scale")))
    val rows = back.join(df, "id")
      .select("id", "vec", "deq", "q_scale")
      .as[(Long, Seq[Float], Seq[Double], Double)].collect()
    rows.foreach { case (id, orig, deq, scale) =>
      assert(orig.length == deq.length, s"id $id length")
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 + 1e-12,
          s"id $id: $o vs $d at scale $scale")
      }
    }
    // zero and empty vectors: scale 0, exact reconstruction
    val m = rows.map(r => r._1 -> r).toMap
    assert(m(2L)._4 == 0.0 && m(2L)._3 == Seq(0.0, 0.0))
    assert(m(4L)._4 == 0.0 && m(4L)._3.isEmpty)
    // codes stay in the int8 range
    val codes = q.select(explode(col("q_codes"))).as[Byte].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
  }

  test("cosine on dequantized embeddings tracks exact cosine") {
    val e = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), col("embedding"))
    val q = Quantize.quantize(e, "embedding")
      .withColumn("embedding",
        Quantize.dequantizeExpr(col("q_codes"), col("q_scale")))
    // exact vs quantized top-5 neighbors for 5 queries: high overlap
    val queries = e.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(e, queries, "vec_id", "embedding", "vec_id", 5)
    val qQueries = q.filter(col("vec_id") < 5)
    val approx = Ann.bruteForceTopK(q, qQueries, "vec_id", "embedding", "vec_id", 5)
    val recall = Ann.recallAgainstExact(exact, approx)
    assert(recall >= 0.8, s"int8 cosine recall $recall below 0.8 on the fixture")
  }
}
