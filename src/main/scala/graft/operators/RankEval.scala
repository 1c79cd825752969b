package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation (nDCG@k, MRR@k, recall@k) for the search
  * and ANN tier — the harness that says whether a BM25 tweak, an RRF
  * fusion, or a quantized IVF probe actually ranks better, per query
  * and aggregated.
  *
  * Engine-exact by construction, which for ranking metrics takes care:
  *  - DCG discounts `1/log2(rank+1)` are NOT recomputed per engine —
  *    `log2` carries no cross-libm correct-rounding guarantee, so the
  *    discounts for ranks 1..k are embedded as shared double LITERALS
  *    ([[discounts]]); any engine parsing the same decimal literal gets
  *    the same double (shortest-round-trip representation).
  *  - gains are exponential `2^rel − 1` via INTEGER shift, never
  *    `pow`.
  *  - every per-rank term is quantized to nano-units and summed as
  *    longs (order-free), the library-wide discipline; one double
  *    division at the end.
  *
  * Queries with no relevant documents are DROPPED (their metrics are
  * undefined — the trec_eval convention), loud only in the sense that
  * the row count says so.
  */
object RankEval {

  /** `1/log2(r+1)` for ranks 1..k, as the exact doubles this JVM
    * computes — exported so the oracle can embed the same literals.
    */
  def discounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Per-query metrics of `run` (qIdCol, docIdCol, rankCol — rank
    * 1-based) against `qrels` (qIdCol, docIdCol, relCol — integer
    * graded relevance, > 0 means relevant).
    *
    * Returns (qIdCol, n_rel, hits, recall, rr, ndcg):
    *  - `recall` = relevant found in the top k / n_rel
    *  - `rr` = 1/rank of the first relevant hit (0 when none)
    *  - `ndcg` = DCG@k / ideal-DCG@k with exponential gains
    *
    * Shapes: one run⋈qrels equi-join on (query, doc), one window on the
    * qrels side for the ideal ranking, two query-keyed aggregates —
    * everything map-side-combinable, nothing corpus-sized.
    */
  def rankingMetrics(
      run: DataFrame,
      qrels: DataFrame,
      qIdCol: String,
      docIdCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in 1..1000, got $k")
    val discLit = typedlit(discounts(k))
    val topk = run.select(
      col(qIdCol).as("__q"), col(docIdCol).as("__d"),
      when(col(rankCol).isNotNull && col(rankCol) >= 1,
        col(rankCol).cast("int"))
        .otherwise(raise_error(concat(
          lit(s"rankingMetrics: `$rankCol` must be a 1-based rank, got "),
          coalesce(col(rankCol).cast("string"), lit("NULL"))))
          .cast("int")).as("__rank"))
      .where(col("__rank") <= k)
    val rels = qrels.select(
      col(qIdCol).as("__q"), col(docIdCol).as("__d"),
      when(col(relCol).isNotNull && col(relCol).between(0, 30),
        col(relCol).cast("int"))
        .otherwise(raise_error(concat(
          lit(s"rankingMetrics: `$relCol` must be a grade in [0, 30], got "),
          coalesce(col(relCol).cast("string"), lit("NULL"))))
          .cast("int")).as("__rel"))
    // exponential gain 2^rel − 1 as a LOOKUP into an integer literal
    // (never pow — no cross-libm guarantee), then gain·discount
    // quantized to nanos: a LONG sum is order-free
    val gainLit = typedlit((0 to 30).map(r => (1L << r) - 1L))
    def termNanos(rel: org.apache.spark.sql.Column,
        pos: org.apache.spark.sql.Column) =
      round(element_at(gainLit, rel + 1).cast("double") *
        element_at(discLit, pos) * 1e9).cast("long")
    val scored = topk.join(rels, Seq("__q", "__d"), "left")
      .withColumn("__rel0", coalesce(col("__rel"), lit(0)))
      .groupBy(col("__q"))
      .agg(
        sum(termNanos(col("__rel0"), col("__rank"))).as("__dcgN"),
        count(when(col("__rel0") > 0, 1)).as("hits"),
        min(when(col("__rel0") > 0, col("__rank"))).as("__first"))
    val wIdeal = Window.partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__d").asc)
    val ideal = rels.where(col("__rel") > 0)
      .withColumn("__pos", row_number().over(wIdeal))
      .groupBy(col("__q"))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__pos") <= k,
          termNanos(col("__rel"), col("__pos"))).otherwise(lit(0L)))
          .as("__idcgN"))
    ideal.join(scored, Seq("__q"), "left")
      .select(
        col("__q").as(qIdCol),
        col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / col("n_rel").cast("double"), 6)
          .as("recall"),
        round(when(col("__first").isNotNull,
          lit(1.0) / col("__first")).otherwise(lit(0.0)), 6).as("rr"),
        round(coalesce(col("__dcgN"), lit(0L)) /
          col("__idcgN").cast("double"), 6).as("ndcg"))
  }
}
