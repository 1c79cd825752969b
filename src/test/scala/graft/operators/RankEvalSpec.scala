package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("rankingMetrics: hand-checked nDCG/MRR/recall, dropped no-qrel queries") {
    val run = Seq(
      // q1 retrieves d1 (irrelevant), d2, d3
      (1L, "d1", 1), (1L, "d2", 2), (1L, "d3", 3),
      // q2 misses its only relevant doc
      (2L, "d10", 1),
      // q3 has no qrels at all -> dropped from the output
      (3L, "d20", 1)
    ).toDF("qid", "doc", "rnk")
    val qrels = Seq(
      (1L, "d2", 1), (1L, "d3", 1), (1L, "d9", 2),
      (2L, "d11", 1)
    ).toDF("qid", "doc", "rel")
    val out = RankEval.rankingMetrics(run, qrels, "qid", "doc", "rnk", "rel",
      k = 10)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    assert(out.keySet == Set(1L, 2L), "q3 (no qrels) must be dropped")
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel") == 3L && q1.getAs[Long]("hits") == 2L)
    assert(q1.getAs[Double]("recall") == 0.666667)
    assert(q1.getAs[Double]("rr") == 0.5)
    // recompute the expected nDCG with the SAME shared discounts and
    // nano quantization (pins formula + quantization; the DuckDB oracle
    // is the independent engine check)
    val d = RankEval.discounts(10)
    def nano(gain: Long, pos: Int) = math.round(gain.toDouble * d(pos - 1) * 1e9)
    val dcg = nano(1, 2) + nano(1, 3) // d2 at rank 2, d3 at rank 3
    val idcg = nano(3, 1) + nano(1, 2) + nano(1, 3) // ideal: d9(rel2), d2, d3
    val expected = BigDecimal(dcg.toDouble / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg") == expected,
      s"ndcg ${q1.getAs[Double]("ndcg")} != $expected")
    val q2 = out(2L)
    assert(q2.getAs[Long]("hits") == 0L && q2.getAs[Double]("recall") == 0.0 &&
      q2.getAs[Double]("rr") == 0.0 && q2.getAs[Double]("ndcg") == 0.0)
    // a rank below 1 is loud, as is a null relevance grade
    intercept[Exception](RankEval.rankingMetrics(
      Seq((1L, "d1", 0)).toDF("qid", "doc", "rnk"), qrels,
      "qid", "doc", "rnk", "rel", 10).collect())
    intercept[Exception](RankEval.rankingMetrics(run,
      Seq((1L, "d2", null: Integer)).toDF("qid", "doc", "rel"),
      "qid", "doc", "rnk", "rel", 10).collect())
  }

  test("rankingMetrics: k truncates both the run and the ideal ranking") {
    // 15 relevant docs, run returns them all in order; at k=10 the ideal
    // and the run both count only 10 positions -> ndcg = 1, recall 10/15
    val run = (1 to 15).map(i => (1L, s"d$i", i)).toDF("qid", "doc", "rnk")
    val qrels = (1 to 15).map(i => (1L, s"d$i", 1)).toDF("qid", "doc", "rel")
    val r = RankEval.rankingMetrics(run, qrels, "qid", "doc", "rnk", "rel",
      k = 10).collect().head
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Long]("hits") == 10L)
    assert(r.getAs[Double]("rr") == 1.0)
  }

  test("aucRoc matches hand pair-counting with the half-tie convention") {
    import spark.implicits._
    // pos scores {3, 2}, neg {1, 2}: pairs >, >, >, = -> (3 + 0.5)/4
    val d = Seq((3L, 1), (2L, 1), (1L, 0), (2L, 0)).toDF("s", "y")
    val out = RankEval.aucRoc(d, "s", "y").head()
    assert(out.getAs[Long]("n_pos") == 2 && out.getAs[Long]("n_neg") == 2)
    assert(out.getAs[Double]("auc") == 0.875)
    // perfect / inverted / all-tied
    val sep = Seq((10L, 1), (9L, 1), (1L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(sep, "s", "y").head().getAs[Double]("auc") == 1.0)
    val inv = Seq((1L, 1), (9L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(inv, "s", "y").head().getAs[Double]("auc") == 0.0)
    val tied = Seq((5L, 1), (5L, 1), (5L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(tied, "s", "y").head().getAs[Double]("auc") == 0.5)
  }

  test("aucRoc equals brute force and is partitioning-invariant") {
    import spark.implicits._
    val rows = Seq.tabulate(300)(i =>
      (((i * 131) % 37).toLong, if ((i * 17) % 5 < 2) 1 else 0))
    val brute = {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      wins.toDouble / (2L * pos.size * neg.size)
    }
    val a = RankEval.aucRoc(rows.toDF("s", "y").repartition(1), "s", "y")
      .head().getAs[Double]("auc")
    val b = RankEval.aucRoc(rows.toDF("s", "y").repartition(11), "s", "y")
      .head().getAs[Double]("auc")
    assert(a == b, "partitioning must not move the value at all")
    assert(math.abs(a - brute) <= 5e-7, s"auc $a vs brute $brute")
  }

  test("aucRocByGroup slices agree with per-slice global aucRoc") {
    import spark.implicits._
    val rows = Seq.tabulate(400)(i =>
      (s"g${i % 3}", ((i * 131) % 37).toLong, if ((i * 17) % 5 < 2) 1 else 0))
    val d = rows.toDF("g", "s", "y")
    val sliced = RankEval.aucRocByGroup(d, "s", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = RankEval.aucRoc(d.where(col("g") === g), "s", "y").head()
      assert(sliced(g) == ((solo.getAs[Long]("n_pos"),
        solo.getAs[Long]("n_neg"), solo.getAs[Double]("auc"))),
        s"slice $g must equal the global computation on its rows")
    }
    // single-class slice -> NULL; NULL group is a group
    val mix = Seq((Some("a"), 1L, 1), (Some("a"), 2L, 0),
      (Some("b"), 1L, 1), (None, 1L, 1), (None, 2L, 0))
      .toDF("g", "s", "y")
    val out = RankEval.aucRocByGroup(mix, "s", "y", Seq("g"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(Some("b")).isEmpty, "one-class slice must be NULL")
    assert(out(None).contains(0.0), "pos scored below neg -> AUC 0")
    intercept[IllegalArgumentException](
      RankEval.aucRocByGroup(mix, "s", "y", Nil))
  }

  test("aucRoc loud paths and single-class NULL") {
    import spark.implicits._
    val badLabel = Seq((1L, 2)).toDF("s", "y")
    assert(intercept[IllegalArgumentException](
      RankEval.aucRoc(badLabel, "s", "y")).getMessage.contains("outside {0, 1}"))
    val nullScore = Seq((Option.empty[Long], 1)).toDF("s", "y")
    assert(intercept[IllegalArgumentException](
      RankEval.aucRoc(nullScore, "s", "y")).getMessage.contains("NULL"))
    val oneClass = Seq((1L, 1), (2L, 1)).toDF("s", "y")
    assert(RankEval.aucRoc(oneClass, "s", "y").head().isNullAt(2))
  }
}
