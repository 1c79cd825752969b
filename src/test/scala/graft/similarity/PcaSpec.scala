package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val axes = Seq(
    Seq(2.0f, 0.0f, 0.0f), Seq(-2.0f, 0.0f, 0.0f),
    Seq(0.0f, 1.0f, 0.0f), Seq(0.0f, -1.0f, 0.0f))
    .toDF("embedding")

  test("fit recovers planted axes, variances, and ordering") {
    val m = Pca.fit(axes, "embedding", k = 3)
    assert(m.nRows == 4 && m.dim == 3 && m.k == 3)
    m.mean.foreach(x => assert(math.abs(x) < 1e-9))
    // cov = diag(2, 0.5, 0): eigenvalues descend, components are e1/e2
    assert(m.eigenvalues.zip(Seq(2.0, 0.5, 0.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9)
    // sign canonicalization: leading entries are positive
    assert(m.components.forall(c => c(c.indices.maxBy(i =>
      (math.abs(c(i)), -i))) >= 0))
    assert(math.abs(m.totalVariance - 2.5) < 1e-9)
  }

  test("fit is bit-identical across partitionings") {
    val wide = Seq.tabulate(200)(i =>
      Seq.tabulate(5)(j => ((i * 31 + j * 17) % 19 - 9) / 3.0f))
      .toDF("embedding")
    val a = Pca.fit(wide.repartition(1), "embedding", k = 3)
    val b = Pca.fit(wide.repartition(13), "embedding", k = 3)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("components are orthonormal; projection matches the hand dot product") {
    val wide = Seq.tabulate(100)(i =>
      Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat))
      .toDF("embedding")
    val m = Pca.fit(wide, "embedding", k = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = m.components(i).zip(m.components(j)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components $i,$j not orthonormal: $dot")
    }
    // full-k projection preserves pairwise distance (orthogonal transform)
    val proj = Pca.project(wide, "embedding", m, "p")
      .select("embedding", "p").as[(Seq[Float], Seq[Double])].collect()
    val (x0, p0) = proj(0); val (x1, p1) = proj(1)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    assert(math.abs(
      d2(x0.map(_.toDouble), x1.map(_.toDouble)) - d2(p0, p1)) < 1e-6)
    // projection literally equals W·(x − mean)
    val hand = m.components.map(w =>
      w.zip(x0.map(_.toDouble).zip(m.mean).map(t => t._1 - t._2))
        .map(t => t._1 * t._2).sum)
    assert(hand.zip(p0).forall(t => math.abs(t._1 - t._2) < 1e-9))
    // variance explained sums to the trace at full k
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-9)
  }

  test("rotate is a pure rotation and improves PQ quantization on correlated data") {
    import graft.operators.Ann
    // correlated pairs SPLIT ACROSS PQ subspaces: dims (x, y | x', y')
    // with x' ~ x and y' ~ y — the worst case for independent-subspace
    // codebooks, the exact case OPQ's rotation fixes
    val rows = Seq.tabulate(256) { i =>
      val x = ((i * 37) % 97 - 48) / 10.0f
      val y = ((i * 53) % 89 - 44) / 10.0f
      val nx = ((i * 7) % 5 - 2) / 50.0f
      val ny = ((i * 11) % 5 - 2) / 50.0f
      (i.toLong, Seq(x, y, x + nx, y + ny))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 4)
    val rot = Pca.rotate(df, "embedding", m, "rv")
    // norms and pairwise distances are preserved exactly (orthogonal W)
    val check = rot.select("embedding", "rv")
      .as[(Seq[Float], Seq[Double])].collect()
    check.take(20).foreach { case (x, r) =>
      val nx = x.map(v => v.toDouble * v).sum
      val nr = r.map(v => v * v).sum
      assert(math.abs(nx - nr) < 1e-9, s"norm moved: $nx vs $nr")
    }
    intercept[IllegalArgumentException](
      Pca.rotate(df, "embedding", Pca.fit(df, "embedding", k = 2), "rv"))
    // recall@5 against exact cosine: rotated codebooks must not lose to
    // raw ones on this fixture (they concentrate variance per subspace)
    def recallOf(frame: org.apache.spark.sql.DataFrame, vc: String): Double = {
      val queries = frame.where(col("vec_id") % 64 === 0)
      val approx = Ann.Pq.search(
        Ann.Pq.build(frame, "vec_id", vc, m = 2, ksub = 16),
        queries, "vec_id", vc, 5)
        .select("q_id", "id").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val exact = Ann.bruteForceTopK(frame, queries, "vec_id", vc,
        "vec_id", 5)
        .select("q_id", "id").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val hits = exact.map { case (q, ids) =>
        ids.intersect(approx.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val rawRecall = recallOf(df, "embedding")
    val opq = Pca.opqRotate(df, "embedding", m, 2, "ov")
    val opqRecall = recallOf(
      opq.select(col("vec_id"), col("ov").as("embedding")), "embedding")
    assert(opqRecall >= rawRecall,
      s"allocated rotation must not hurt PQ recall: raw $rawRecall opq $opqRecall")
    // the allocation is load-bearing: it splits the two strong axes
    // across subspaces instead of stacking them in the first
    val alloc = Pca.eigenvalueAllocation(m.eigenvalues, 2)
    assert(alloc.take(2).contains(0) && alloc.drop(2).contains(1),
      s"components 0 and 1 must land in different subspaces: $alloc")
    intercept[IllegalArgumentException](
      Pca.opqRotate(df, "embedding", m, 3, "x"))
  }

  test("gramTable matches the hand-computed nano cells") {
    val g = Pca.gramTable(
      Seq(Seq(1.0f, 2.0f), Seq(3.0f, -1.0f)).toDF("embedding"), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(g((0L, 0L)) == 10000000000L) // 1 + 9
    assert(g((0L, 1L)) == -1000000000L) // 2 - 3
    assert(g((1L, 1L)) == 5000000000L)  // 4 + 1
    assert(g.size == 3)
  }

  test("loud paths: bad k, empty frame, NULL row, length drift") {
    intercept[IllegalArgumentException](Pca.fit(axes, "embedding", k = 4))
    intercept[IllegalArgumentException](Pca.fit(axes, "embedding", k = 0))
    intercept[IllegalArgumentException](
      Pca.fit(axes.limit(0), "embedding", k = 1))
    val withNull = Seq(Some(Seq(1.0f, 2.0f)), None).toDF("embedding")
    assert(intercept[Exception](Pca.fit(withNull, "embedding", k = 1))
      .getMessage.contains("NULL embedding"))
    val drift = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("embedding")
    assert(intercept[Exception](Pca.fit(drift, "embedding", k = 1))
      .getMessage.contains("length"))
    val m = Pca.fit(axes, "embedding", k = 1)
    intercept[IllegalArgumentException](
      Pca.project(axes.withColumn("p", lit(1)), "embedding", m, "p"))
  }
}
