package graft.operators

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
}
