package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SrpSpec extends SparkTestBase {

  private def emb = spark.read.parquet(sf("embeddings"))
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  test("JL norm preservation on real embeddings at outDim=32") {
    // E[||p||^2] = outDim * ||v||^2 for ±1 projections; with a FIXED
    // salt this is deterministic — bounds are generous vs the ~sqrt(2/32)
    // per-vector std so the assertion never flakes, but a sign-formula
    // regression (biased or degenerate signs) lands far outside them
    val r = emb
      .where(size(col("v")) > 0)
      .select((VectorFunctions.sumSquares(
          VectorFunctions.srpProject(col("v"), 32, salt = 7L)) /
        (lit(32.0) * VectorFunctions.sumSquares(col("v")))).as("ratio"))
    val stats = r.agg(min("ratio"), max("ratio"), avg("ratio")).head()
    val (mn, mx, mean) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    assert(mn > 0.25 && mx < 3.0, s"per-vector ratio out of range: [$mn, $mx]")
    assert(mean > 0.85 && mean < 1.15, s"mean ratio drifted: $mean")
  }

  test("cosine similarity survives the 64->32 shrink on neighbor pairs") {
    val e = emb.where(size(col("v")) > 0).limit(60)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      VectorFunctions.dot(a, b) /
        sqrt(VectorFunctions.sumSquares(a) * VectorFunctions.sumSquares(b))
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"),
      VectorFunctions.srpProject(col("v"), 32, salt = 7L).as("pa"))
    val b = e.select(col("vec_id").as("idb"), col("v").as("vb"),
      VectorFunctions.srpProject(col("v"), 32, salt = 7L).as("pb"))
    val err = a.crossJoin(b).where(col("ida") < col("idb"))
      .select(abs(cos(col("va"), col("vb")) - cos(col("pa"), col("pb"))).as("e"))
      .agg(avg("e"), max("e")).head()
    // K=32 statistical floor: per-pair cosine estimate has std ~1/sqrt(32)
    // = 0.177, so mean |error| ~0.8*std = 0.14 even for a PERFECT sign
    // hash (measured 0.1297 with salt=7, deterministic). The bound has to
    // sit above the floor; a biased/degenerate sign formula lands at 2-3x
    assert(err.getDouble(0) < 0.16,
      s"mean cosine distortion too high: ${err.getDouble(0)}")
    // worst of ~1770 pairs ~ 3.3*std = 0.58 at the same floor (measured
    // 0.579); a degenerate hash pushes single pairs past 1.0
    assert(err.getDouble(1) < 0.75,
      s"worst-pair cosine distortion too high: ${err.getDouble(1)}")
  }

  test("projection is deterministic and salt-sensitive") {
    val e = emb.limit(5)
    val p1 = e.select(col("vec_id"),
      VectorFunctions.srpProject(col("v"), 16, salt = 7L).as("p")).collect()
    val p2 = e.select(col("vec_id"),
      VectorFunctions.srpProject(col("v"), 16, salt = 7L).as("p")).collect()
    assert(p1.map(_.getSeq[Double](1)).toSeq == p2.map(_.getSeq[Double](1)).toSeq)
    val other = e.select(col("vec_id"),
      VectorFunctions.srpProject(col("v"), 16, salt = 8L).as("p")).collect()
    assert(p1.map(_.getSeq[Double](1)).toSeq !=
      other.map(_.getSeq[Double](1)).toSeq)
    // empty vector projects to the zero vector, not null
    import spark.implicits._
    val z = Seq(Tuple1(Seq.empty[Double])).toDF("v")
      .select(VectorFunctions.srpProject(col("v"), 4, salt = 1L)).head()
    assert(z.getSeq[Double](0) == Seq(0.0, 0.0, 0.0, 0.0))
  }
}
