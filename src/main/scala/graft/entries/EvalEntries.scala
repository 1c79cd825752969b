package graft
package entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{DataFrameUtils, Transformations}

import EntryHelpers._

/** [[graft.SparkEntry]] retrieval, classifier, calibration and MT/summarization eval queries — one `queries` entry per operator,
  * with its DuckDB `oracleSql` twin where SQL-expressible. Split from
  * the single SparkEntry object for reviewability; [[graft.SparkEntry]]
  * composes every domain object's maps (duplicate keys across files are
  * linted by RowsOnlyLedgerSpec).
  */
private[graft] object EvalEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- BM25 lexical retrieval against a bag of query terms ----
    "q_bm25_search" -> ((s, dir) => {
      operators.TextAnalysis.bm25(
        t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge", "shuffle"))
    }),

    // ---- RM3 pseudo-relevance feedback: expand from top-5 docs, top-8
    // terms, α = 0.5, then a weighted second pass — every step exact ----
    "q_rm3_search" -> ((s, dir) => {
      operators.Search.rm3Search(
        t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge", "shuffle"),
        fbDocs = 5, fbTerms = 8, alphaMicros = 500000L)
    }),

    // ---- hybrid retrieval: RRF-fuse the BM25 ranking with a
    // length-prior top-1000 ranking (no score calibration needed) ----
    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val kw = operators.Search.rankBy(
        operators.TextAnalysis.bm25(docs, "doc_id", "text",
          Seq("spark", "window", "merge", "shuffle")),
        "doc_id", col("score").desc)
      val len = operators.Search.rankBy(
        docs.select(col("doc_id"), col("n_chars"))
          .orderBy(col("n_chars").desc, col("doc_id").asc).limit(1000),
        "doc_id", col("n_chars").desc)
      operators.Search.rrfFuse(Seq(kw, len), "doc_id")
    }),

    // ---- the same retrieval served from a standing inverted index:
    // build once, probe from pruned index buckets with zero corpus
    // scans; must agree with q_bm25_search to the last bit ----
    "q_bm25_indexed" -> ((s, dir) => {
      val idx = scratchDir("graft_search_") + "/idx"
      operators.Search.writeIndex(
        t(s, dir, "documents"), "doc_id", "text", idx, numBuckets = 16)
      operators.Search.searchIndex(s, idx,
        Seq("spark", "window", "merge", "shuffle"))
    }),

    // ---- stemmed retrieval: the same standing index with the Porter
    // analyzer recorded in the sidecar — query inflections collapse to
    // index stems; FULL twin since the Porter SQL port landed ----
    "q_bm25_stemmed" -> ((s, dir) => {
      val idx = scratchDir("graft_stemidx_") + "/idx"
      operators.Search.writeIndex(
        t(s, dir, "documents"), "doc_id", "text", idx, numBuckets = 16,
        stem = true)
      operators.Search.searchIndex(s, idx,
        Seq("windows", "merges", "shuffles", "partitions"))
    }),

    // ---- segmented (append-grown) BM25 index: three disjoint batches
    // appended as segments, merged on read — same oracle as the ad-hoc
    // and monolithic paths, which it must match to the last bit ----
    "q_bm25_segmented" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = scratchDir("graft_search_seg_") + "/idx"
      Seq(0, 1, 2).foreach { r =>
        operators.Search.appendSegment(docs.where(col("doc_id") % 3 === r),
          "doc_id", "text", idx, numBuckets = 16)
      }
      operators.Search.searchIndex(s, idx,
        Seq("spark", "window", "merge", "shuffle"))
    }),

    // ---- confident-learning label-error detection: binary labels
    // from lang, deterministic rational pseudo-probabilities from text
    // length; integer cross-multiplied thresholds -> hash-exact ----
    "q_label_errors" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"),
        when(col("lang") === "en", "a").otherwise("b").as("given"),
        ((length(col("text")) % 1000) / lit(1000.0)).as("p_a"))
        .withColumn("p_b", lit(1.0) - col("p_a"))
      operators.Selection.labelErrors(base, "doc_id", "given",
        Seq("a" -> "p_a", "b" -> "p_b"))
    }),

    // ---- hashed-linear classifier scoring: exact integer logits against
    // planted sha-derived weights (the DuckDB twin rebuilds them in SQL)
    "q_classifier_score" -> ((s, dir) => {
      operators.Classifier.TextClassifierModel(plantedWeights(64), 0L)
        .scoreLogit(t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text")
        .select(col("doc_id"), col("logit_micros"),
          col("logit_pos").as("pred"))
    }),

    // ---- weight-of-evidence encoding of lang vs a keyword label ----
    "q_woe" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"),
        when(col("text").contains(" the "), lit(1)).otherwise(lit(0)).as("y"))
      operators.Classifier.woeTable(d, "lang", "y")
    }),

    // rows-only: PAV's sequential pooling has no SQL counterpart
    // (ClassifierSpec pins the hand-worked pooling, monotonicity, and
    // cross-partitioning bit-equality); the derived task reuses
    // q_auc_roc's score/label so the two evals read one contract
    "q_calibrate" -> ((s, dir) => {
      val d = t(s, dir, "embeddings").select(
        (round(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long") +
         round(element_at(col("embedding"), 2).cast("double") * 1e6)
          .cast("long")).as("score_micros"),
        when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      val m = operators.Classifier.fitIsotonic(
        d, "score_micros", "y", maxBins = 64)
      m.apply(d.select(col("score_micros")).distinct(), "score_micros")
        .orderBy(col("score_micros"))
    }),

    // ---- classifier TRAINING end-to-end: learn a token-derivable label
    // (docs mentioning "merge" — the `lang` tag is independent of the
    // synthetic text, so it is unlearnable by design) and output the
    // confusion matrix. FULL DuckDB twin: the integer-exact GD loop
    // (order-free nano gradient sums — the q_pagerank unroll property)
    // replays as 10 materialized weight/bias CTE stages.
    "q_classifier_train" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          array_contains(operators.TextAnalysis.tokens(col("text")), "merge")
            .cast("int").as("label"))
      val model = operators.Classifier.train(
        docs, "text", "label", dim = 1024, iters = 10, lr = 1.0)
      model.scoreLogit(docs, "text")
        .groupBy(col("label"), col("logit_pos").as("pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- dataset cartography (Swayamdipta 2020): per-doc training
    // dynamics over the same integer-exact GD run — confidence /
    // variability / n_correct across the 10 epochs; the oracle replays
    // the unrolled epochs and scores each post-epoch snapshot ----
    "q_training_dynamics" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          array_contains(operators.TextAnalysis.tokens(col("text")), "merge")
            .cast("int").as("label"))
      operators.Classifier.trainingDynamics(
        docs, "doc_id", "text", "label", dim = 1024, iters = 10, lr = 1.0)
    }),

    // ---- TracIn training-data influence (Pruthi 2020) over the same
    // integer-exact GD run as q_classifier_train: top-10 proponents per
    // probe (doc_id < 5) by the exact epoch-summed gradient-dot
    // influence; the oracle replays the unrolled epoch chain and the
    // bucket-join dots ----
    "q_tracin" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          array_contains(operators.TextAnalysis.tokens(col("text")), "merge")
            .cast("int").as("label"))
      operators.Classifier.tracinInfluence(
        docs, docs.where(col("doc_id") < 5), "doc_id", "text", "label",
        dim = 1024, iters = 10, lr = 1.0, topK = 10)
    }),

    // ---- Bradley–Terry ratings (Hunter 2004 MM) over source-vs-source
    // matches: consecutive doc pairs play, the longer (token-count) doc's
    // source wins, 20 MM passes; the oracle unrolls the MM stages ----
    "q_bradley_terry" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(operators.TextAnalysis.tokens(col("text"))).cast("long")
          .as("len"))
      val a = d.where(col("doc_id") % 2 === 0).select(
        expr("doc_id div 2").as("g"), col("source").as("sa"),
        col("len").as("la"))
      val b = d.where(col("doc_id") % 2 === 1).select(
        expr("doc_id div 2").as("g"), col("source").as("sb"),
        col("len").as("lb"))
      val matches = a.join(b, "g")
        .where(col("la") =!= col("lb") && col("sa") =!= col("sb"))
        .select(when(col("la") > col("lb"), col("sa"))
            .otherwise(col("sb")).as("w"),
          when(col("la") > col("lb"), col("sb"))
            .otherwise(col("sa")).as("l"))
      operators.RankEval.bradleyTerry(matches, "w", "l", iters = 20)
    }),

    // ---- paired bootstrap significance (Koehn 2004) between two
    // integral per-doc scorers (token count vs 2× distinct tokens):
    // 1000 sha-seeded replicas, exact LONG totals ----
    "q_paired_bootstrap" -> ((s, dir) => {
      val toks = operators.TextAnalysis.tokens(col("text"))
      val d = t(s, dir, "documents").select(col("doc_id"),
        size(toks).cast("long").as("a"),
        (size(array_distinct(toks)) * 2).cast("long").as("b"))
      operators.RankEval.pairedBootstrap(d, "doc_id", "a", "b",
        replicas = 1000, seed = "graft")
    }),

    // ---- rank-biased overlap (Webber 2010) between two label-free
    // per-source rankers (token count vs distinct-token count), top-10,
    // p = 0.9; the oracle rebuilds the power/tail chains recursively ----
    "q_rbo" -> ((s, dir) => {
      val toks = operators.TextAnalysis.tokens(col("text"))
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        size(toks).as("sa"), size(array_distinct(toks)).as("sb"))
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("sa").desc, col("doc_id"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("sb").desc, col("doc_id"))
      operators.RankEval.rankBiasedOverlap(
        d.withColumn("ra", row_number().over(wA))
          .withColumn("rb", row_number().over(wB)),
        Seq("source"), "ra", "rb", k = 10, p = 0.9)
    }),

    // ---- exact ROC-AUC over a derived binary task on embeddings ----
    "q_auc_roc" -> ((s, dir) => {
      val d = t(s, dir, "embeddings").select(
        (round(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long") +
         round(element_at(col("embedding"), 2).cast("double") * 1e6)
          .cast("long")).as("score_micros"),
        when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      operators.RankEval.aucRoc(d, "score_micros", "y")
    }),

    // ---- calibration diagram over a derived probability column ----
    "q_reliability" -> ((s, dir) => {
      val score = round(element_at(col("embedding"), 1).cast("double") * 1e6)
        .cast("long") +
        round(element_at(col("embedding"), 2).cast("double") * 1e6)
        .cast("long")
      val d = t(s, dir, "embeddings").select(
        ((score % 1000001L + 1000001L) % 1000001L).as("p_micros"),
        when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      operators.Classifier.reliabilityBins(d, "p_micros", "y", bins = 10)
    }),

    // ---- split-conformal threshold over derived nonconformity scores ----
    "q_conformal" -> ((s, dir) => {
      val score = round(element_at(col("embedding"), 1).cast("double") * 1e6)
        .cast("long") +
        round(element_at(col("embedding"), 2).cast("double") * 1e6)
        .cast("long")
      operators.Classifier.conformalThreshold(
        t(s, dir, "embeddings").select(abs(score).as("nc")), "nc",
        alphaMicros = 100000L)
    }),

    "q_ece" -> ((s, dir) => {
      val score = round(element_at(col("embedding"), 1).cast("double") * 1e6)
        .cast("long") +
        round(element_at(col("embedding"), 2).cast("double") * 1e6)
        .cast("long")
      val d = t(s, dir, "embeddings").select(
        ((score % 1000001L + 1000001L) % 1000001L).as("p_micros"),
        when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      operators.Classifier.expectedCalibrationError(d, "p_micros", "y", 10)
    }),

    // ---- Murphy decomposition of the Brier score over the same
    // deterministic forecast fixture: reliability / resolution /
    // uncertainty next to q_ece's single calibration number ----
    "q_brier" -> ((s, dir) => {
      val score = round(element_at(col("embedding"), 1).cast("double") * 1e6)
        .cast("long") +
        round(element_at(col("embedding"), 2).cast("double") * 1e6)
        .cast("long")
      val d = t(s, dir, "embeddings").select(
        ((score % 1000001L + 1000001L) % 1000001L).as("p_micros"),
        when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      operators.Classifier.brierDecomposition(d, "p_micros", "y", 10)
    }),

    // ---- the same eval, sliced per source (fairness-audit form) ----
    "q_auc_by_group" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val d = e.join(t(s, dir, "documents").select(
          col("doc_id").as("vec_id"), col("source")), Seq("vec_id"), "left")
        .select(coalesce(col("source"), lit("none")).as("source"),
          (round(element_at(col("embedding"), 1).cast("double") * 1e6)
            .cast("long") +
           round(element_at(col("embedding"), 2).cast("double") * 1e6)
            .cast("long")).as("score_micros"),
          when(col("label") < 5, lit(1)).otherwise(lit(0)).as("y"))
      operators.RankEval.aucRocByGroup(d, "score_micros", "y", Seq("source"))
    }),

    // ---- DPO-style max-margin preference pairs per source, scored by
    // readability micros — the post-training data-construction step;
    // ties/singletons yield no pair, margin-gated at 2 FRE points ----
    "q_preference_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = operators.TextAnalysis.readabilityScores(
          docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .where(col("fre").isNotNull)
        .select(col("source"), col("doc_id"),
          round(col("fre") * 1e6).cast("long").as("fre_micros"))
      operators.Selection.preferencePairs(scored, "source", "doc_id",
        "fre_micros", minMarginMicros = 2000000L)
    }),

    // ---- min-K% prob membership audit (Shi 2023, n-gram proxy): the
    // held-out fifth scored against the rest — the worst-k bigram
    // NLL mean that exposes memorized text avg_nll washes out ----
    "q_mink_prob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.minKProb(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 5 =!= 0), "text", kPercent = 20)
    }),

    // ---- speculative-decoding acceptance (Leviathan 2023): per-context
    // Σ min(p, q) between the full-corpus target bigram LM and a
    // one-fifth-slice draft LM — exact split numerator sums, three
    // divisions, the "can a small model draft for the big one" audit ----
    "q_spec_acceptance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.speculativeAcceptance(
        docs, docs.where(col("doc_id") % 5 === 0), "text")
    }),

    // ---- corpus BLEU between consecutive-doc pairs (ref = doc,
    // hyp = next doc): the eval-harness staple, one corpus row ----
    "q_bleu" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("text").as("hyp")),
        Seq("doc_id"))
      operators.RankEval.corpusBleu(pairs, "doc_id", "text", "hyp")
    }),

    // ---- sentence-level chrF over the same consecutive-doc pairs ----
    "q_chrf" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("text").as("hyp")),
        Seq("doc_id"))
      operators.RankEval.chrfScore(pairs, "doc_id", "text", "hyp")
    }),

    // ---- per-class report of a hand rule-classifier vs order status ----
    "q_class_report" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val pred = when(col("o_totalprice") < 100000.0, lit("F"))
        .otherwise(when(col("o_custkey") % 2 === 0, lit("O"))
          .otherwise(lit("P")))
      operators.RankEval.classificationReport(
        o.withColumn("pred", pred), "o_orderstatus", "pred")
    }),

    // ---- SQuAD-style token F1 over the consecutive-doc pairs ----
    "q_token_f1" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("text").as("hyp")),
        Seq("doc_id"))
      operators.RankEval.tokenF1(pairs, "doc_id", "text", "hyp")
    }),

    // ---- normalized edit similarity over 400-char prefixes of the
    // consecutive-doc pairs (short-string contract) ----
    "q_edit_sim" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 400).as("a"))
      val pairs = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("a").as("b")),
        Seq("doc_id"))
      operators.RankEval.editSimilarity(pairs, "doc_id", "a", "b",
        maxChars = 400)
    }),

    // ---- ROUGE-L over consecutive-doc pairs: the LCS rides a custom
    // Catalyst expression (graft.functions.LcsLength); the twin replays
    // the identical DP as a recursive CTE with the prefix-max row
    // recurrence — the integer lcs is engine-exact ----
    "q_rouge_l" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 120).as("a"))
      val pairs = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("a").as("b")),
        Seq("doc_id"))
      operators.RankEval.rougeL(pairs, "doc_id", "a", "b", maxTokens = 80)
    }),

    // ---- ranking-quality eval (nDCG/MRR/recall@k) over a deterministic
    // synthetic run + graded qrels — the measurement harness for the
    // BM25 / RRF / ANN tier ----
    "q_rank_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("n_chars").desc, col("doc_id"))
      val run = docs
        .select((col("doc_id") % 3).as("qid"), col("doc_id"), col("n_chars"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 10)
        .select("qid", "doc_id", "rnk")
      val qrels = docs.where(col("n_chars") % 4 === 0)
        .select((col("doc_id") % 3).as("qid"), col("doc_id"),
          (col("doc_id") % 3 + 1).cast("int").as("rel"))
      operators.RankEval.rankingMetrics(run, qrels,
        "qid", "doc_id", "rnk", "rel", k = 10)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_tracin" -> tracinOracle,
    "q_bradley_terry" -> bradleyTerryOracle,
    // paired bootstrap: the identical sha draws over ascending-string-id
    // ranks, exact LONG replica totals, add-one-smoothed one-sided p
    "q_paired_bootstrap" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS a,
        |    CAST(len(list_distinct(toks)) * 2 AS BIGINT) AS b
        |  FROM (SELECT doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |    FROM documents)),
        |r AS MATERIALIZED (
        |  SELECT a - b AS delta,
        |    row_number() OVER (ORDER BY CAST(doc_id AS VARCHAR)) - 1 AS rn
        |  FROM d),
        |nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM r),
        |g AS MATERIALIZED (
        |  SELECT b.b,
        |    ('0x' || substring(sha256('graft:' || b.b || ':' || i.i),
        |      1, 15))::BIGINT % (SELECT n FROM nn) AS rn
        |  FROM range(0, 1000) b(b)
        |  CROSS JOIN (SELECT unnest(range(0, (SELECT n FROM nn))) AS i) i),
        |reps AS MATERIALIZED (
        |  SELECT g.b, CAST(sum(r.delta) AS BIGINT) AS t
        |  FROM g JOIN r USING (rn) GROUP BY g.b)
        |SELECT (SELECT n FROM nn) AS n,
        |  1000::BIGINT AS replicas,
        |  (SELECT CAST(sum(delta) AS BIGINT) FROM r) AS sum_delta,
        |  CAST(count(CASE WHEN t > 0 THEN 1 END) AS BIGINT) AS wins_a,
        |  CAST(count(CASE WHEN t < 0 THEN 1 END) AS BIGINT) AS wins_b,
        |  CAST(count(CASE WHEN t = 0 THEN 1 END) AS BIGINT) AS ties,
        |  round((count(CASE WHEN t <= 0 THEN 1 END) + 1) * 1.0
        |    / 1001.0, 6) AS p_value
        |FROM reps""".stripMargin,
    // SRP: the sign is the low bit of a 2-round xor-shift-multiply
    // avalanche hash — pure int64 arithmetic both engines compute
    // exactly (max intermediate 2^32·0x45d9f3b < 2^59). The hash chain
    // is staged through CTEs as list columns; the final indexed lambda
    // adds +v or -v (no ±1.0 multiply — DuckDB decimal literals would
    // intrude) and list_sum folds the list sequentially, so the doubles
    // match the Spark loop's ascending-j summation
    "q_auc_roc" ->
      """WITH d AS (
        |  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT) AS s,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg
        |  FROM d GROUP BY s),
        |p AS (SELECT pos, neg, coalesce(CAST(sum(neg) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS below
        |  FROM g),
        |t AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(pos * (2 * below + neg)) AS BIGINT) AS num2
        |  FROM p)
        |SELECT n_pos, n_neg,
        |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE CAST(num2 AS DOUBLE) / (2 * n_pos * n_neg) END, 6) AS auc
        |FROM t""".stripMargin,
    "q_woe" ->
      """WITH d AS (
        |  SELECT lang, CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (SELECT lang AS category, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(1 - y) AS BIGINT) AS n_neg
        |  FROM d GROUP BY lang),
        |t AS (SELECT category, n_pos, n_neg,
        |    CAST(sum(n_pos) OVER () AS BIGINT) AS p,
        |    CAST(sum(n_neg) OVER () AS BIGINT) AS n
        |  FROM g)
        |SELECT category, n_pos, n_neg,
        |  round(ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / n)), 6) AS woe,
        |  CAST(round((((n_pos + 0.5) / p) - ((n_neg + 0.5) / n))
        |    * ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / n)) * 1e9) AS BIGINT)
        |    AS iv_nanos
        |FROM t""".stripMargin,
    "q_reliability" ->
      """WITH d AS (
        |  SELECT (((CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT))
        |    % 1000001) + 1000001) % 1000001 AS p,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |g AS (
        |  SELECT least(9, (least(1000000, greatest(0, p)) * 10) // 1000000)
        |      AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(least(1000000, greatest(0, p))) AS BIGINT) AS sp
        |  FROM d GROUP BY 1)
        |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
        |  CAST(sp // n AS BIGINT) AS mean_pred_micros,
        |  round(CAST(n_pos AS DOUBLE) / n, 6) AS obs_rate
        |FROM g""".stripMargin,
    "q_conformal" ->
      """WITH s AS (
        |  SELECT abs(CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT)) AS v
        |  FROM embeddings),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
        |kk AS (SELECT n, ((n + 1) * 900000 + 999999) // 1000000 AS k FROM t),
        |r AS (SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn
        |  FROM s)
        |SELECT n, k,
        |  (SELECT min(v) FROM r, kk WHERE rn >= k) AS threshold
        |FROM kk""".stripMargin,
    "q_ece" ->
      """WITH d AS (
        |  SELECT (((CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT))
        |    % 1000001) + 1000001) % 1000001 AS p,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |g AS (
        |  SELECT least(9, (least(1000000, greatest(0, p)) * 10) // 1000000)
        |      AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(least(1000000, greatest(0, p))) AS BIGINT) AS sp
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT n, round(CAST(n_pos AS DOUBLE) / n, 6) AS obs_rate,
        |    CAST(sp // n AS BIGINT) AS mp
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(n) OVER () AS BIGINT) AS nn, n, obs_rate, mp
        |  FROM r)
        |SELECT nn AS n,
        |  round(CAST(sum(CAST(round(abs(obs_rate - CAST(mp AS DOUBLE) / 1e6)
        |    * n / nn * 1e9) AS BIGINT)) AS BIGINT) / 1e9, 6) AS ece
        |FROM t GROUP BY nn""".stripMargin,

    // Murphy decomposition: per-bin REL/RES terms in the Scala side's
    // exact multiplication order, nano-rounded and BIGINT-summed across
    // bins; the Brier numerator is the HUGEINT-exact sum of squared
    // micro differences.
    "q_brier" ->
      """WITH d AS (
        |  SELECT (((CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT))
        |    % 1000001) + 1000001) % 1000001 AS p,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |g AS (
        |  SELECT least(9, (least(1000000, greatest(0, p)) * 10) // 1000000)
        |      AS bin,
        |    count(*)::BIGINT AS nk,
        |    CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(least(1000000, greatest(0, p))) AS BIGINT) AS sp,
        |    CAST(sum((least(1000000, greatest(0, p)) - y * 1000000)
        |      * (least(1000000, greatest(0, p)) - y * 1000000)) AS HUGEINT)
        |      AS sq
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS post,
        |  CAST(sum(sq) AS HUGEINT) AS sqt FROM g),
        |terms AS (
        |  SELECT g.nk, t.n, t.post, t.sqt,
        |    CAST(round(nk::DOUBLE
        |      * (sp::DOUBLE / (nk::DOUBLE * 1e6) - pos::DOUBLE / nk::DOUBLE)
        |      * (sp::DOUBLE / (nk::DOUBLE * 1e6) - pos::DOUBLE / nk::DOUBLE)
        |      * 1e9) AS BIGINT) AS relt,
        |    CAST(round(nk::DOUBLE
        |      * (pos::DOUBLE / nk::DOUBLE - post::DOUBLE / n::DOUBLE)
        |      * (pos::DOUBLE / nk::DOUBLE - post::DOUBLE / n::DOUBLE)
        |      * 1e9) AS BIGINT) AS rest
        |  FROM g CROSS JOIN t)
        |SELECT max(n) AS n, count(*)::BIGINT AS bins,
        |  round(max(sqt)::DOUBLE / (max(n)::DOUBLE * 1e12), 6) AS brier,
        |  round(CAST(sum(relt) AS BIGINT)::DOUBLE / (max(n)::DOUBLE * 1e9), 6)
        |    AS reliability,
        |  round(CAST(sum(rest) AS BIGINT)::DOUBLE / (max(n)::DOUBLE * 1e9), 6)
        |    AS resolution,
        |  round((max(post)::DOUBLE / max(n)::DOUBLE)
        |    * (1.0 - max(post)::DOUBLE / max(n)::DOUBLE), 6) AS uncertainty
        |FROM terms""".stripMargin,
    "q_auc_by_group" ->
      """WITH d AS (
        |  SELECT coalesce(dd.source, 'none') AS source,
        |    CAST(round(CAST(e.embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
        |    + CAST(round(CAST(e.embedding[2] AS DOUBLE) * 1e6) AS BIGINT) AS s,
        |    CASE WHEN e.label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings e LEFT JOIN documents dd ON dd.doc_id = e.vec_id),
        |g AS (SELECT source, s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg
        |  FROM d GROUP BY source, s),
        |p AS (SELECT source, pos, neg,
        |    coalesce(CAST(sum(neg) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS below
        |  FROM g),
        |t AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(pos * (2 * below + neg)) AS BIGINT) AS num2
        |  FROM p GROUP BY source)
        |SELECT source, n_pos, n_neg,
        |  round(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE CAST(num2 AS DOUBLE) / (2 * n_pos * n_neg) END, 6) AS auc
        |FROM t""".stripMargin,
    "q_classifier_score" ->
      """WITH w AS (
        |  SELECT CAST(j AS BIGINT) AS bucket,
        |    (('0x' || substring(sha256('w:' || CAST(j AS VARCHAR)), 1, 15))
        |      ::BIGINT % 2001) - 1000 AS wt
        |  FROM range(64) t(j)),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |tw AS (
        |  SELECT doc_id, wt FROM toks JOIN w
        |    ON (('0x' || substring(sha256(tok), 1, 15))::BIGINT % 64)
        |       = w.bucket),
        |lg AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS s
        |  FROM tw GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(lg.s, 0)::BIGINT AS logit_micros,
        |  COALESCE(lg.s, 0) > 0 AS pred
        |FROM documents d LEFT JOIN lg USING (doc_id)""".stripMargin,
    "q_bleu" ->
      """WITH pairs AS (
        |  SELECT d.doc_id AS id,
        |    list_filter(string_split_regex(coalesce(d.text, ''), '\s+'),
        |      t -> t <> '') AS rtoks,
        |    list_filter(string_split_regex(coalesce(h.text, ''), '\s+'),
        |      t -> t <> '') AS htoks
        |  FROM documents d JOIN documents h ON h.doc_id = d.doc_id + 1),
        |hg AS (
        |  SELECT id, CAST(n AS INTEGER) AS n,
        |    array_to_string(htoks[CAST(i AS INTEGER):
        |      CAST(i AS INTEGER) + CAST(n AS INTEGER) - 1], ' ') AS g,
        |    count(*)::BIGINT AS hc
        |  FROM pairs CROSS JOIN range(1, 5) t(n)
        |  CROSS JOIN unnest(range(1,
        |    greatest(len(htoks) - CAST(n AS INTEGER) + 1, 0) + 1)) r(i)
        |  GROUP BY id, n, g),
        |rg AS (
        |  SELECT id, CAST(n AS INTEGER) AS n,
        |    array_to_string(rtoks[CAST(i AS INTEGER):
        |      CAST(i AS INTEGER) + CAST(n AS INTEGER) - 1], ' ') AS g,
        |    count(*)::BIGINT AS rc
        |  FROM pairs CROSS JOIN range(1, 5) t(n)
        |  CROSS JOIN unnest(range(1,
        |    greatest(len(rtoks) - CAST(n AS INTEGER) + 1, 0) + 1)) r(i)
        |  GROUP BY id, n, g),
        |mm AS (SELECT hg.n, CAST(sum(least(hc, rc)) AS BIGINT) AS m
        |  FROM hg JOIN rg ON hg.id = rg.id AND hg.n = rg.n AND hg.g = rg.g
        |  GROUP BY hg.n),
        |tt AS (SELECT n, CAST(sum(hc) AS BIGINT) AS t FROM hg GROUP BY n),
        |lens AS (SELECT
        |  CAST(coalesce(sum(len(htoks)), 0) AS BIGINT) AS hl,
        |  CAST(coalesce(sum(len(rtoks)), 0) AS BIGINT) AS rl FROM pairs),
        |cells AS (SELECT
        |  coalesce((SELECT m FROM mm WHERE n = 1), 0) AS m1,
        |  coalesce((SELECT t FROM tt WHERE n = 1), 0) AS t1,
        |  coalesce((SELECT m FROM mm WHERE n = 2), 0) AS m2,
        |  coalesce((SELECT t FROM tt WHERE n = 2), 0) AS t2,
        |  coalesce((SELECT m FROM mm WHERE n = 3), 0) AS m3,
        |  coalesce((SELECT t FROM tt WHERE n = 3), 0) AS t3,
        |  coalesce((SELECT m FROM mm WHERE n = 4), 0) AS m4,
        |  coalesce((SELECT t FROM tt WHERE n = 4), 0) AS t4)
        |SELECT hl AS hyp_tokens, rl AS ref_tokens,
        |  m1, t1, round(CASE WHEN t1 = 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE m1::DOUBLE / t1::DOUBLE END, 6) AS p1,
        |  m2, t2, round(CASE WHEN t2 = 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE m2::DOUBLE / t2::DOUBLE END, 6) AS p2,
        |  m3, t3, round(CASE WHEN t3 = 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE m3::DOUBLE / t3::DOUBLE END, 6) AS p3,
        |  m4, t4, round(CASE WHEN t4 = 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE m4::DOUBLE / t4::DOUBLE END, 6) AS p4,
        |  round(CASE WHEN hl = 0 THEN CAST(0.0 AS DOUBLE)
        |    WHEN hl >= rl THEN CAST(1.0 AS DOUBLE)
        |    ELSE exp(1.0 - rl::DOUBLE / hl::DOUBLE) END, 6) AS bp,
        |  round(CASE WHEN m1 = 0 OR t1 = 0 OR m2 = 0 OR t2 = 0 OR m3 = 0
        |      OR t3 = 0 OR m4 = 0 OR t4 = 0 OR hl = 0
        |    THEN CAST(0.0 AS DOUBLE)
        |    ELSE (CASE WHEN hl >= rl THEN CAST(1.0 AS DOUBLE)
        |        ELSE exp(1.0 - rl::DOUBLE / hl::DOUBLE) END)
        |      * exp((ln(m1::DOUBLE / t1::DOUBLE) + ln(m2::DOUBLE / t2::DOUBLE)
        |        + ln(m3::DOUBLE / t3::DOUBLE) + ln(m4::DOUBLE / t4::DOUBLE))
        |        / 4.0) END, 6) AS bleu
        |FROM cells CROSS JOIN lens""".stripMargin,
    "q_chrf" ->
      """WITH pairs AS (
        |  SELECT d.doc_id AS id,
        |    regexp_replace(coalesce(d.text, ''), '\s+', '', 'g') AS rs,
        |    regexp_replace(coalesce(h.text, ''), '\s+', '', 'g') AS hs
        |  FROM documents d JOIN documents h ON h.doc_id = d.doc_id + 1),
        |hg AS (
        |  SELECT id, CAST(n AS INTEGER) AS n,
        |    substring(hs, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
        |    count(*)::BIGINT AS hc
        |  FROM pairs CROSS JOIN range(1, 7) t(n)
        |  CROSS JOIN unnest(range(1,
        |    greatest(length(hs) - CAST(n AS INTEGER) + 1, 0) + 1)) r(i)
        |  GROUP BY id, n, g),
        |rgg AS (
        |  SELECT id, CAST(n AS INTEGER) AS n,
        |    substring(rs, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
        |    count(*)::BIGINT AS rc
        |  FROM pairs CROSS JOIN range(1, 7) t(n)
        |  CROSS JOIN unnest(range(1,
        |    greatest(length(rs) - CAST(n AS INTEGER) + 1, 0) + 1)) r(i)
        |  GROUP BY id, n, g),
        |mm AS (SELECT hg.id, hg.n, CAST(sum(least(hc, rc)) AS BIGINT) AS m
        |  FROM hg JOIN rgg ON hg.id = rgg.id AND hg.n = rgg.n
        |    AND hg.g = rgg.g
        |  GROUP BY hg.id, hg.n),
        |ht AS (SELECT id, n, CAST(sum(hc) AS BIGINT) AS ht
        |  FROM hg GROUP BY id, n),
        |rt AS (SELECT id, n, CAST(sum(rc) AS BIGINT) AS rt
        |  FROM rgg GROUP BY id, n),
        |cells AS (
        |  SELECT id, n, ht, rt, m
        |  FROM ht FULL JOIN rt USING (id, n) LEFT JOIN mm USING (id, n)),
        |piv AS (
        |  SELECT id,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 1 THEN m END) AS BIGINT), 0) AS m1,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 1 THEN ht END) AS BIGINT), 0) AS ht1,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 1 THEN rt END) AS BIGINT), 0) AS rt1,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 2 THEN m END) AS BIGINT), 0) AS m2,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 2 THEN ht END) AS BIGINT), 0) AS ht2,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 2 THEN rt END) AS BIGINT), 0) AS rt2,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 3 THEN m END) AS BIGINT), 0) AS m3,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 3 THEN ht END) AS BIGINT), 0) AS ht3,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 3 THEN rt END) AS BIGINT), 0) AS rt3,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 4 THEN m END) AS BIGINT), 0) AS m4,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 4 THEN ht END) AS BIGINT), 0) AS ht4,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 4 THEN rt END) AS BIGINT), 0) AS rt4,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 5 THEN m END) AS BIGINT), 0) AS m5,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 5 THEN ht END) AS BIGINT), 0) AS ht5,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 5 THEN rt END) AS BIGINT), 0) AS rt5,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 6 THEN m END) AS BIGINT), 0) AS m6,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 6 THEN ht END) AS BIGINT), 0) AS ht6,
        |    coalesce(CAST(sum(
        |      CASE WHEN n = 6 THEN rt END) AS BIGINT), 0) AS rt6
        |  FROM cells GROUP BY id),
        |sc AS (
        |  SELECT pairs.id,
        |    (CASE WHEN coalesce(ht1, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m1, 0)::DOUBLE / coalesce(ht1, 0)::DOUBLE END
        |     + CASE WHEN coalesce(ht2, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m2, 0)::DOUBLE / coalesce(ht2, 0)::DOUBLE END
        |     + CASE WHEN coalesce(ht3, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m3, 0)::DOUBLE / coalesce(ht3, 0)::DOUBLE END
        |     + CASE WHEN coalesce(ht4, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m4, 0)::DOUBLE / coalesce(ht4, 0)::DOUBLE END
        |     + CASE WHEN coalesce(ht5, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m5, 0)::DOUBLE / coalesce(ht5, 0)::DOUBLE END
        |     + CASE WHEN coalesce(ht6, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m6, 0)::DOUBLE / coalesce(ht6, 0)::DOUBLE END)
        |      / 6.0 AS chrp,
        |    (CASE WHEN coalesce(rt1, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m1, 0)::DOUBLE / coalesce(rt1, 0)::DOUBLE END
        |     + CASE WHEN coalesce(rt2, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m2, 0)::DOUBLE / coalesce(rt2, 0)::DOUBLE END
        |     + CASE WHEN coalesce(rt3, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m3, 0)::DOUBLE / coalesce(rt3, 0)::DOUBLE END
        |     + CASE WHEN coalesce(rt4, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m4, 0)::DOUBLE / coalesce(rt4, 0)::DOUBLE END
        |     + CASE WHEN coalesce(rt5, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m5, 0)::DOUBLE / coalesce(rt5, 0)::DOUBLE END
        |     + CASE WHEN coalesce(rt6, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE coalesce(m6, 0)::DOUBLE / coalesce(rt6, 0)::DOUBLE END)
        |      / 6.0 AS chrr
        |  FROM pairs LEFT JOIN piv ON pairs.id = piv.id)
        |SELECT id AS doc_id, round(chrp, 6) AS chrp, round(chrr, 6) AS chrr,
        |  round(CASE WHEN chrp = 0.0 AND chrr = 0.0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE (CAST(1.0 AS DOUBLE) + 4.0) * chrp * chrr
        |      / (4.0 * chrp + chrr) END, 6) AS chrf
        |FROM sc""".stripMargin,
    "q_class_report" ->
      """WITH base AS (
        |  SELECT CAST(o_orderstatus AS VARCHAR) AS l,
        |    CASE WHEN o_totalprice < 100000.0 THEN 'F'
        |         WHEN o_custkey % 2 = 0 THEN 'O' ELSE 'P' END AS p
        |  FROM orders),
        |tp AS (SELECT l AS clazz, count(*)::BIGINT AS tp
        |  FROM base WHERE l = p GROUP BY l),
        |sup AS (SELECT l AS clazz, count(*)::BIGINT AS support
        |  FROM base GROUP BY l),
        |pt AS (SELECT p AS clazz, count(*)::BIGINT AS pt
        |  FROM base GROUP BY p)
        |SELECT clazz, coalesce(support, 0)::BIGINT AS support,
        |  coalesce(tp.tp, 0)::BIGINT AS tp,
        |  (coalesce(pt.pt, 0) - coalesce(tp.tp, 0))::BIGINT AS fp,
        |  (coalesce(support, 0) - coalesce(tp.tp, 0))::BIGINT AS fn,
        |  round(CASE WHEN coalesce(pt.pt, 0) = 0 THEN NULL
        |    ELSE coalesce(tp.tp, 0)::DOUBLE / coalesce(pt.pt, 0)::DOUBLE
        |    END, 6) AS "precision",
        |  round(CASE WHEN coalesce(support, 0) = 0 THEN NULL
        |    ELSE coalesce(tp.tp, 0)::DOUBLE / coalesce(support, 0)::DOUBLE
        |    END, 6) AS recall,
        |  round(CASE WHEN 2 * coalesce(tp.tp, 0)
        |      + (coalesce(pt.pt, 0) - coalesce(tp.tp, 0))
        |      + (coalesce(support, 0) - coalesce(tp.tp, 0)) = 0 THEN NULL
        |    ELSE (2 * coalesce(tp.tp, 0))::DOUBLE
        |      / (2 * coalesce(tp.tp, 0)
        |        + (coalesce(pt.pt, 0) - coalesce(tp.tp, 0))
        |        + (coalesce(support, 0) - coalesce(tp.tp, 0)))::DOUBLE
        |    END, 6) AS f1
        |FROM sup FULL JOIN pt USING (clazz) LEFT JOIN tp USING (clazz)""".stripMargin,
    "q_token_f1" ->
      """WITH pairs AS (
        |  SELECT d.doc_id,
        |    list_filter(string_split_regex(coalesce(d.text, ''), '\s+'),
        |      t -> t <> '') AS rt,
        |    list_filter(string_split_regex(coalesce(h.text, ''), '\s+'),
        |      t -> t <> '') AS ht
        |  FROM documents d JOIN documents h ON h.doc_id = d.doc_id + 1),
        |rc AS (SELECT doc_id, t, count(*)::BIGINT AS rc
        |  FROM pairs CROSS JOIN unnest(rt) u(t) GROUP BY doc_id, t),
        |hc AS (SELECT doc_id, t, count(*)::BIGINT AS hc
        |  FROM pairs CROSS JOIN unnest(ht) u(t) GROUP BY doc_id, t),
        |ov AS (SELECT rc.doc_id, CAST(sum(least(rc.rc, hc.hc)) AS BIGINT)
        |    AS ov
        |  FROM rc JOIN hc ON rc.doc_id = hc.doc_id AND rc.t = hc.t
        |  GROUP BY rc.doc_id)
        |SELECT p.doc_id, CAST(len(rt) AS BIGINT) AS ref_tokens,
        |  CAST(len(ht) AS BIGINT) AS hyp_tokens,
        |  coalesce(ov.ov, 0)::BIGINT AS overlap,
        |  round(CASE WHEN len(ht) = 0 THEN NULL
        |    ELSE coalesce(ov.ov, 0)::DOUBLE / len(ht)::DOUBLE END, 6)
        |    AS "precision",
        |  round(CASE WHEN len(rt) = 0 THEN NULL
        |    ELSE coalesce(ov.ov, 0)::DOUBLE / len(rt)::DOUBLE END, 6)
        |    AS recall,
        |  round(CASE WHEN len(rt) + len(ht) = 0 THEN NULL
        |    ELSE (2 * coalesce(ov.ov, 0))::DOUBLE
        |      / (len(rt) + len(ht))::DOUBLE END, 6) AS f1,
        |  rt = ht AS exact_match
        |FROM pairs p LEFT JOIN ov ON p.doc_id = ov.doc_id""".stripMargin,
    "q_edit_sim" ->
      """WITH pairs AS (
        |  SELECT d.doc_id, substring(coalesce(d.text, ''), 1, 400) AS a,
        |    substring(coalesce(h.text, ''), 1, 400) AS b
        |  FROM documents d JOIN documents h ON h.doc_id = d.doc_id + 1)
        |SELECT doc_id, CAST(length(a) AS BIGINT) AS len_a,
        |  CAST(length(b) AS BIGINT) AS len_b,
        |  CAST(levenshtein(a, b) AS BIGINT) AS edit_distance,
        |  round(CASE WHEN greatest(length(a), length(b)) = 0
        |    THEN CAST(1.0 AS DOUBLE)
        |    ELSE CAST(1.0 AS DOUBLE) - levenshtein(a, b)::DOUBLE
        |      / greatest(length(a), length(b))::DOUBLE END, 6) AS similarity
        |FROM pairs""".stripMargin,
    // ROUGE-L: the LCS DP replayed as a recursive CTE — per iteration i
    // the new DP row is new[j] = max(prev[j], runmax_{k<=j}(a[i]=b[k] ?
    // prev[k]+1 : 0)) (prefix-max reformulation of the classic
    // recurrence; runmax is a per-pair window over unnested j). The lcs
    // is an exact integer on both engines; P/R/F one rounded division.
    "q_rouge_l" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT d.doc_id,
        |    list_filter(string_split_regex(
        |      substring(coalesce(d.text, ''), 1, 120), '\s+'),
        |      t -> t <> '') AS a,
        |    list_filter(string_split_regex(
        |      substring(coalesce(h.text, ''), 1, 120), '\s+'),
        |      t -> t <> '') AS b
        |  FROM documents d JOIN documents h ON h.doc_id = d.doc_id + 1),
        |live AS (SELECT * FROM pairs WHERE len(a) > 0 AND len(b) > 0),
        |dp AS (
        |  SELECT doc_id, a, b, 0 AS i,
        |    list_transform(range(0, len(b)+1), x -> 0) AS row
        |  FROM live
        |  UNION ALL
        |  SELECT doc_id, a, b, i+1, [0] || list(v ORDER BY j) AS row FROM (
        |    SELECT doc_id, a, b, i, row, j,
        |      greatest(row[CAST(j AS INTEGER)+1],
        |        max(CASE WHEN a[CAST(i AS INTEGER)+1] = b[CAST(j AS INTEGER)]
        |            THEN row[CAST(j AS INTEGER)]+1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY j
        |                ROWS UNBOUNDED PRECEDING)) AS v
        |    FROM dp CROSS JOIN unnest(range(1, len(b)+1)) r(j)
        |    WHERE i < len(a))
        |  GROUP BY doc_id, a, b, i),
        |fin AS (
        |  SELECT doc_id, len(a) AS m, len(b) AS n,
        |    row[len(b)+1] AS lcs
        |  FROM dp WHERE i = len(a)
        |  UNION ALL
        |  SELECT doc_id, len(a), len(b), 0
        |  FROM pairs WHERE len(a) = 0 OR len(b) = 0)
        |SELECT doc_id, CAST(m AS BIGINT) AS ref_tokens,
        |  CAST(n AS BIGINT) AS hyp_tokens, CAST(lcs AS BIGINT) AS lcs,
        |  round(CASE WHEN n = 0 THEN NULL
        |    ELSE lcs::DOUBLE / n::DOUBLE END, 6) AS precision,
        |  round(CASE WHEN m = 0 THEN NULL
        |    ELSE lcs::DOUBLE / m::DOUBLE END, 6) AS recall,
        |  round(CASE WHEN m + n = 0 THEN NULL
        |    ELSE (2 * lcs)::DOUBLE / (m + n)::DOUBLE END, 6) AS f1
        |FROM fin""".stripMargin,
    // Ranking eval: the DCG discounts are SHARED literals (log2 has no
    // cross-libm correct-rounding guarantee); gains are integer shifts;
    // per-rank terms nano-quantized and long-summed on both engines.
    "q_rank_eval" -> {
      val disc = operators.RankEval.discounts(10).zipWithIndex
        .map { case (d, i) =>
          s"(${i + 1}, ${java.lang.Double.toString(d)})" }
        .mkString(", ")
      s"""WITH disc(pos, dv) AS (VALUES $disc),
         |run AS (
         |  SELECT doc_id % 3 AS qid, doc_id,
         |    row_number() OVER (PARTITION BY doc_id % 3
         |      ORDER BY n_chars DESC, doc_id) AS rnk
         |  FROM documents QUALIFY rnk <= 10),
         |qrels AS (
         |  SELECT doc_id % 3 AS qid, doc_id,
         |    CAST(doc_id % 3 + 1 AS INTEGER) AS rel
         |  FROM documents WHERE n_chars % 4 = 0),
         |scored AS (
         |  SELECT r.qid,
         |    CAST(sum(CAST(round(((1::BIGINT << coalesce(q.rel, 0)) - 1)
         |      ::DOUBLE * d.dv * 1e9) AS BIGINT)) AS BIGINT) AS dcgn,
         |    CAST(count(CASE WHEN q.rel > 0 THEN 1 END) AS BIGINT) AS hits,
         |    min(CASE WHEN q.rel > 0 THEN r.rnk END) AS frst
         |  FROM run r
         |  LEFT JOIN qrels q USING (qid, doc_id)
         |  JOIN disc d ON d.pos = r.rnk
         |  GROUP BY r.qid),
         |ideal AS (
         |  SELECT qid, CAST(count(*) AS BIGINT) AS n_rel,
         |    CAST(sum(CASE WHEN i.pos <= 10 THEN
         |      CAST(round(((1::BIGINT << rel) - 1)::DOUBLE * dv * 1e9)
         |        AS BIGINT) ELSE 0 END) AS BIGINT) AS idcgn
         |  FROM (SELECT qid, doc_id, rel,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY rel DESC, doc_id) AS pos
         |    FROM qrels WHERE rel > 0) i
         |  LEFT JOIN disc ON disc.pos = i.pos
         |  GROUP BY qid)
         |SELECT i.qid, i.n_rel, coalesce(s.hits, 0) AS hits,
         |  round(coalesce(s.hits, 0) / i.n_rel::DOUBLE, 6) AS recall,
         |  round(CASE WHEN s.frst IS NOT NULL THEN 1.0 / s.frst
         |    ELSE 0.0 END, 6) AS rr,
         |  round(coalesce(s.dcgn, 0) / i.idcgn::DOUBLE, 6) AS ndcg
         |FROM ideal i LEFT JOIN scored s USING (qid)""".stripMargin
    },
    // Classifier training unrolled epoch-by-epoch: the GD loop is
    // integer-exact (micro-unit weights, nano-unit gradients, one
    // sigmoid per doc rounded to nanos at birth), so 10 epochs replay
    // as 10 materialized CTE stages — weight/bias tables chained, the
    // driver step's math.round as floor(x + 0.5), Spark round() as
    // DuckDB round() (both half-away-from-zero on doubles). The
    // confusion matrix then hash-matches end to end.
    "q_classifier_train" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |lab AS MATERIALIZED (
        |  SELECT d.doc_id, coalesce(l.y, 0) AS y
        |  FROM documents d LEFT JOIN (
        |    SELECT doc_id, 1 AS y FROM toks WHERE tok = 'merge' GROUP BY doc_id) l
        |  USING (doc_id)),
        |feats AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substring(sha256(tok), 1, 15))::BIGINT % 1024 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM toks GROUP BY doc_id, bucket),
        |nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM documents),
        |w0 AS MATERIALIZED (SELECT CAST(unnest(range(0, 1024)) AS BIGINT) AS bucket, 0::BIGINT AS w),
        |bias0 AS MATERIALIZED (SELECT 0::BIGINT AS b),
        |z1 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias0) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w0 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e1 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z1),
        |g1 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e1 e USING (doc_id) GROUP BY f.bucket),
        |w1 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w0 w LEFT JOIN g1 g USING (bucket)),
        |bias1 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e1)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias0),
        |z2 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias1) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w1 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e2 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z2),
        |g2 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e2 e USING (doc_id) GROUP BY f.bucket),
        |w2 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w1 w LEFT JOIN g2 g USING (bucket)),
        |bias2 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e2)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias1),
        |z3 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias2) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w2 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e3 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z3),
        |g3 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e3 e USING (doc_id) GROUP BY f.bucket),
        |w3 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w2 w LEFT JOIN g3 g USING (bucket)),
        |bias3 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e3)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias2),
        |z4 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias3) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w3 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e4 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z4),
        |g4 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e4 e USING (doc_id) GROUP BY f.bucket),
        |w4 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w3 w LEFT JOIN g4 g USING (bucket)),
        |bias4 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e4)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias3),
        |z5 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias4) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w4 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e5 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z5),
        |g5 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e5 e USING (doc_id) GROUP BY f.bucket),
        |w5 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w4 w LEFT JOIN g5 g USING (bucket)),
        |bias5 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e5)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias4),
        |z6 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias5) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w5 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e6 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z6),
        |g6 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e6 e USING (doc_id) GROUP BY f.bucket),
        |w6 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w5 w LEFT JOIN g6 g USING (bucket)),
        |bias6 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e6)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias5),
        |z7 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias6) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w6 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e7 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z7),
        |g7 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e7 e USING (doc_id) GROUP BY f.bucket),
        |w7 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w6 w LEFT JOIN g7 g USING (bucket)),
        |bias7 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e7)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias6),
        |z8 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias7) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w7 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e8 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z8),
        |g8 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e8 e USING (doc_id) GROUP BY f.bucket),
        |w8 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w7 w LEFT JOIN g8 g USING (bucket)),
        |bias8 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e8)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias7),
        |z9 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias8) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w8 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e9 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z9),
        |g9 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e9 e USING (doc_id) GROUP BY f.bucket),
        |w9 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w8 w LEFT JOIN g9 g USING (bucket)),
        |bias9 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e9)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias8),
        |z10 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias9) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w9 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e10 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z10),
        |g10 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e10 e USING (doc_id) GROUP BY f.bucket),
        |w10 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w9 w LEFT JOIN g10 g USING (bucket)),
        |bias10 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e10)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias9),
        |score AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias10) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w10 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id))
        |SELECT CAST(y AS INTEGER) AS label, z > 0 AS pred, count(*)::BIGINT AS n
        |FROM score GROUP BY label, pred""".stripMargin,
    // Cartography twin: the classifier oracle's unrolled epochs, then
    // each post-epoch snapshot (w_k, bias_k) scores the corpus — the
    // logit of snapshot k IS training epoch k+1's z — p_true rounded
    // to micros at birth, confidence/variability from exact BIGINT
    // Σp / Σp² (variance numerator n·Σp² − (Σp)² stays integral).
    "q_training_dynamics" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |lab AS MATERIALIZED (
        |  SELECT d.doc_id, coalesce(l.y, 0) AS y
        |  FROM documents d LEFT JOIN (
        |    SELECT doc_id, 1 AS y FROM toks WHERE tok = 'merge' GROUP BY doc_id) l
        |  USING (doc_id)),
        |feats AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substring(sha256(tok), 1, 15))::BIGINT % 1024 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM toks GROUP BY doc_id, bucket),
        |nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM documents),
        |w0 AS MATERIALIZED (SELECT CAST(unnest(range(0, 1024)) AS BIGINT) AS bucket, 0::BIGINT AS w),
        |bias0 AS MATERIALIZED (SELECT 0::BIGINT AS b),
        |z1 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias0) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w0 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e1 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z1),
        |g1 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e1 e USING (doc_id) GROUP BY f.bucket),
        |w1 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w0 w LEFT JOIN g1 g USING (bucket)),
        |bias1 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e1)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias0),
        |z2 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias1) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w1 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e2 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z2),
        |g2 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e2 e USING (doc_id) GROUP BY f.bucket),
        |w2 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w1 w LEFT JOIN g2 g USING (bucket)),
        |bias2 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e2)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias1),
        |z3 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias2) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w2 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e3 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z3),
        |g3 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e3 e USING (doc_id) GROUP BY f.bucket),
        |w3 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w2 w LEFT JOIN g3 g USING (bucket)),
        |bias3 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e3)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias2),
        |z4 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias3) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w3 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e4 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z4),
        |g4 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e4 e USING (doc_id) GROUP BY f.bucket),
        |w4 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w3 w LEFT JOIN g4 g USING (bucket)),
        |bias4 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e4)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias3),
        |z5 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias4) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w4 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e5 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z5),
        |g5 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e5 e USING (doc_id) GROUP BY f.bucket),
        |w5 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w4 w LEFT JOIN g5 g USING (bucket)),
        |bias5 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e5)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias4),
        |z6 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias5) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w5 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e6 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z6),
        |g6 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e6 e USING (doc_id) GROUP BY f.bucket),
        |w6 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w5 w LEFT JOIN g6 g USING (bucket)),
        |bias6 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e6)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias5),
        |z7 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias6) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w6 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e7 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z7),
        |g7 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e7 e USING (doc_id) GROUP BY f.bucket),
        |w7 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w6 w LEFT JOIN g7 g USING (bucket)),
        |bias7 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e7)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias6),
        |z8 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias7) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w7 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e8 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z8),
        |g8 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e8 e USING (doc_id) GROUP BY f.bucket),
        |w8 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w7 w LEFT JOIN g8 g USING (bucket)),
        |bias8 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e8)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias7),
        |z9 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias8) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w8 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e9 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z9),
        |g9 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e9 e USING (doc_id) GROUP BY f.bucket),
        |w9 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w8 w LEFT JOIN g9 g USING (bucket)),
        |bias9 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e9)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias8),
        |z10 AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias9) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w9 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |e10 AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((1.0 / (1.0 + exp(-z / 1e6)) - y) * 1e9) AS BIGINT) AS e
        |  FROM z10),
        |g10 AS MATERIALIZED (
        |  SELECT f.bucket, sum(f.cnt * e.e)::BIGINT AS g
        |  FROM feats f JOIN e10 e USING (doc_id) GROUP BY f.bucket),
        |w10 AS MATERIALIZED (
        |  SELECT w.bucket,
        |    w.w - CAST(floor(coalesce(g.g, 0) / ((SELECT n FROM nn) * 1000.0)
        |      + 0.5) AS BIGINT) AS w
        |  FROM w9 w LEFT JOIN g10 g USING (bucket)),
        |bias10 AS MATERIALIZED (
        |  SELECT b - CAST(floor((SELECT sum(e)::BIGINT FROM e10)
        |    / ((SELECT n FROM nn) * 1000.0) + 0.5) AS BIGINT) AS b
        |  FROM bias9),
        |zfin AS MATERIALIZED (
        |  SELECT l.doc_id, l.y,
        |    (SELECT b FROM bias10) + coalesce(s.zz, 0) AS z
        |  FROM lab l LEFT JOIN (
        |    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS zz
        |    FROM feats f JOIN w10 w USING (bucket) GROUP BY f.doc_id) s
        |  USING (doc_id)),
        |probs AS MATERIALIZED (
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z2
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z3
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z4
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z5
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z6
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z7
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z8
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z9
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM z10
        |  UNION ALL
        |  SELECT doc_id, y,
        |    CAST(round((CASE WHEN y = 1 THEN 1.0 / (1.0 + exp(-z / 1e6))
        |      ELSE 1.0 - 1.0 / (1.0 + exp(-z / 1e6)) END) * 1e6) AS BIGINT) AS p
        |  FROM zfin)
        |SELECT doc_id, CAST(y AS INTEGER) AS label,
        |  round(CAST(CAST(sum(p) AS BIGINT) AS DOUBLE) / (10 * 1e6), 6)
        |    AS confidence,
        |  round(sqrt(CAST(10 * CAST(sum(p * p) AS BIGINT)
        |      - CAST(sum(p) AS BIGINT) * CAST(sum(p) AS BIGINT) AS DOUBLE))
        |    / (10 * 1e6), 6) AS variability,
        |  sum(CASE WHEN p > 500000 THEN 1 ELSE 0 END)::BIGINT AS n_correct
        |FROM probs GROUP BY doc_id, y""".stripMargin,
    // Stemmed BM25 twin: the Porter SQL pipeline (MATERIALIZED — the
    // optimizer must not push the term filter into the giant CASE
    // chain) feeds the q_bm25 scoring tail; query terms pre-stemmed
    // to window/merg/shuffl/partit by the same verified rules.
    "q_bm25_stemmed" ->
      """WITH stems AS MATERIALIZED (
        |WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
        |         lower(arr[CAST(i AS INTEGER)]) AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                      t -> t <> '') AS arr FROM docs)
        |  CROSS JOIN unnest(range(1, len(arr) + 1)) t(i)),
        |s0 AS (
        |  SELECT doc_id, pos, w,
        |         (len(w) >= 3 AND regexp_matches(w, '^[a-z]+$')) AS ok
        |  FROM toks),
        |s1a AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(w, 'sses') THEN left(w, len(w) - 2)
        |         WHEN ends_with(w, 'ies')  THEN left(w, len(w) - 2)
        |         WHEN ends_with(w, 'ss')   THEN w
        |         WHEN ends_with(w, 's')    THEN left(w, len(w) - 1)
        |         ELSE w END AS wa
        |  FROM s0),
        |s1b0 AS (
        |  SELECT doc_id, pos, w, ok, wa, substr(list_reduce(['#'] + string_split_regex(wa, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS pa FROM s1a),
        |s1b1 AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(wa, 'eed') THEN
        |           (CASE WHEN len(regexp_extract_all(left(pa, len(wa) - 3), 'VC')) > 0
        |                 THEN left(wa, len(wa) - 1) ELSE wa END)
        |         WHEN ends_with(wa, 'ed') AND contains(left(pa, len(wa) - 2), 'V')
        |           THEN left(wa, len(wa) - 2)
        |         WHEN ends_with(wa, 'ing') AND contains(left(pa, len(wa) - 3), 'V')
        |           THEN left(wa, len(wa) - 3)
        |         ELSE wa END AS wb0,
        |    (NOT ends_with(wa, 'eed') AND
        |     ((ends_with(wa, 'ed') AND contains(left(pa, len(wa) - 2), 'V')) OR
        |      (ends_with(wa, 'ing') AND contains(left(pa, len(wa) - 3), 'V')))) AS did,
        |    pa
        |  FROM s1b0),
        |s1b AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN NOT did THEN wb0
        |         WHEN ends_with(wb0, 'at') OR ends_with(wb0, 'bl') OR
        |              ends_with(wb0, 'iz') THEN wb0 || 'e'
        |         WHEN len(wb0) >= 2 AND right(left(pa, len(wb0)), 1) = 'C' AND
        |              substr(wb0, len(wb0), 1) = substr(wb0, len(wb0) - 1, 1) AND
        |              right(wb0, 1) NOT IN ('l', 's', 'z')
        |           THEN left(wb0, len(wb0) - 1)
        |         WHEN len(regexp_extract_all(left(pa, len(wb0)), 'VC')) = 1 AND len(wb0) >= 3 AND
        |              right(left(pa, len(wb0)), 3) = 'CVC' AND
        |              right(wb0, 1) NOT IN ('w', 'x', 'y')
        |           THEN wb0 || 'e'
        |         ELSE wb0 END AS wb
        |  FROM s1b1),
        |s1c0 AS (SELECT doc_id, pos, w, ok, wb, substr(list_reduce(['#'] + string_split_regex(wb, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS pc FROM s1b),
        |s1c AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(wb, 'y') AND contains(left(pc, len(wb) - 1), 'V')
        |         THEN left(wb, len(wb) - 1) || 'i' ELSE wb END AS wc
        |  FROM s1c0),
        |s2p AS (SELECT doc_id, pos, w, ok, wc, substr(list_reduce(['#'] + string_split_regex(wc, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p2 FROM s1c),
        |s2 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(wc, 'ational') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ate' ELSE wc END) WHEN ends_with(wc, 'ization') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ize' ELSE wc END) WHEN ends_with(wc, 'iveness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ive' ELSE wc END) WHEN ends_with(wc, 'fulness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ful' ELSE wc END) WHEN ends_with(wc, 'ousness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ous' ELSE wc END) WHEN ends_with(wc, 'tional') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 6), 'VC')) > 0 THEN left(wc, len(wc) - 6) || 'tion' ELSE wc END) WHEN ends_with(wc, 'biliti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 6), 'VC')) > 0 THEN left(wc, len(wc) - 6) || 'ble' ELSE wc END) WHEN ends_with(wc, 'entli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ent' ELSE wc END) WHEN ends_with(wc, 'ousli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ous' ELSE wc END) WHEN ends_with(wc, 'ation') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ate' ELSE wc END) WHEN ends_with(wc, 'alism') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'al' ELSE wc END) WHEN ends_with(wc, 'aliti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'al' ELSE wc END) WHEN ends_with(wc, 'iviti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ive' ELSE wc END) WHEN ends_with(wc, 'enci') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ence' ELSE wc END) WHEN ends_with(wc, 'anci') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ance' ELSE wc END) WHEN ends_with(wc, 'izer') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ize' ELSE wc END) WHEN ends_with(wc, 'abli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'able' ELSE wc END) WHEN ends_with(wc, 'alli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'al' ELSE wc END) WHEN ends_with(wc, 'ator') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ate' ELSE wc END) WHEN ends_with(wc, 'eli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 3), 'VC')) > 0 THEN left(wc, len(wc) - 3) || 'e' ELSE wc END) ELSE wc END AS w2 FROM s2p),
        |s3p AS (SELECT doc_id, pos, w, ok, w2, substr(list_reduce(['#'] + string_split_regex(w2, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p3 FROM s2),
        |s3 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(w2, 'icate') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ative') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || '' ELSE w2 END) WHEN ends_with(w2, 'alize') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'al' ELSE w2 END) WHEN ends_with(w2, 'iciti') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ical') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 4), 'VC')) > 0 THEN left(w2, len(w2) - 4) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ness') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 4), 'VC')) > 0 THEN left(w2, len(w2) - 4) || '' ELSE w2 END) WHEN ends_with(w2, 'ful') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 3), 'VC')) > 0 THEN left(w2, len(w2) - 3) || '' ELSE w2 END) ELSE w2 END AS w3 FROM s3p),
        |s4p AS (SELECT doc_id, pos, w, ok, w3, substr(list_reduce(['#'] + string_split_regex(w3, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p4 FROM s3),
        |s4 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(w3, 'ement') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 5), 'VC')) > 1 THEN left(w3, len(w3) - 5) ELSE w3 END) WHEN ends_with(w3, 'ance') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ence') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'able') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ible') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ment') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ant') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ent') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ion') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 AND (ends_with(left(w3, len(w3) - 3), 's') OR ends_with(left(w3, len(w3) - 3), 't')) THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ism') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ate') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'iti') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ous') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ive') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ize') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'al') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'er') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'ic') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'ou') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) ELSE w3 END AS w4 FROM s4p),
        |s5p AS (SELECT doc_id, pos, w, ok, w4, substr(list_reduce(['#'] + string_split_regex(w4, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p5 FROM s4),
        |s5a AS (
        |  SELECT doc_id, pos, w, ok, w4, p5,
        |    CASE WHEN ends_with(w4, 'e') AND
        |              (len(regexp_extract_all(left(p5, len(w4) - 1), 'VC')) > 1 OR
        |               (len(regexp_extract_all(left(p5, len(w4) - 1), 'VC')) = 1 AND NOT
        |                (len(w4) - 1 >= 3 AND
        |                 right(left(p5, len(w4) - 1), 3) = 'CVC' AND
        |                 substr(w4, len(w4) - 1, 1) NOT IN ('w', 'x', 'y'))))
        |         THEN left(w4, len(w4) - 1) ELSE w4 END AS w5
        |  FROM s5p),
        |s5b AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN len(regexp_extract_all(left(p5, len(w5)), 'VC')) > 1 AND len(w5) >= 2 AND
        |              right(left(p5, len(w5)), 1) = 'C' AND
        |              substr(w5, len(w5), 1) = substr(w5, len(w5) - 1, 1) AND
        |              ends_with(w5, 'l')
        |         THEN left(w5, len(w5) - 1) ELSE w5 END AS w6
        |  FROM s5a)
        |SELECT doc_id, pos, CASE WHEN ok THEN w6 ELSE w END AS stem
        |FROM s5b
        |),
        |dl AS MATERIALIZED (
        |  SELECT doc_id, CAST(len(list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(dl)::BIGINT::DOUBLE / count(*) AS avgdl FROM dl),
        |post AS (
        |  SELECT s.doc_id, d.dl, s.stem AS term, count(*)::BIGINT AS tf
        |  FROM stems s JOIN dl d USING (doc_id)
        |  WHERE s.stem IN ('window', 'merg', 'shuffl', 'partit')
        |  GROUP BY s.doc_id, d.dl, s.stem),
        |dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term)
        |SELECT p.doc_id, count(*)::BIGINT AS n_hits,
        |  round(sum(
        |    ln(1.0::DOUBLE + (s.n - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) *
        |    (p.tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |    (p.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |       + 0.75::DOUBLE * p.dl / s.avgdl))), 6) AS score
        |FROM post p JOIN dfs d USING (term) CROSS JOIN stats s
        |GROUP BY p.doc_id""".stripMargin,
    // Preference-pairs twin: the readability head scores, micro-cast,
    // the same desc/asc rank-1 windows with id tie-breaks, margin gate.
    "q_preference_pairs" ->
      """WITH base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT)) AS n_sentences,
        |    CAST(coalesce(list_sum(list_transform(toks, t ->
        |      greatest(1, len(regexp_extract_all(t, '[aeiouyAEIOUY]+'))))),
        |      0) AS BIGINT) AS n_syllables
        |  FROM base),
        |fre AS (
        |  SELECT doc_id,
        |    CASE WHEN n_words = 0 THEN NULL ELSE round(206.835::DOUBLE
        |      - 1.015::DOUBLE * (n_words::DOUBLE / n_sentences)
        |      - 84.6::DOUBLE * (n_syllables::DOUBLE / n_words), 6)
        |    END AS fre
        |  FROM c),
        |scored AS (
        |  SELECT d.source, f.doc_id, CAST(round(f.fre * 1e6) AS BIGINT) AS s
        |  FROM fre f JOIN documents d USING (doc_id)
        |  WHERE f.fre IS NOT NULL AND d.source IS NOT NULL),
        |top AS (
        |  SELECT source, doc_id AS chosen_id, s AS chosen_score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY s DESC, doc_id ASC) AS r
        |  FROM scored),
        |bot AS (
        |  SELECT source, doc_id AS rejected_id, s AS rejected_score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY s ASC, doc_id ASC) AS r
        |  FROM scored)
        |SELECT t.source, chosen_id, rejected_id,
        |  chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM (SELECT * FROM top WHERE r = 1) t
        |JOIN (SELECT * FROM bot WHERE r = 1) b USING (source)
        |WHERE chosen_id <> rejected_id
        |  AND chosen_score - rejected_score >= 2000000""".stripMargin,
    // Min-K twin: the ccnet oracle's bigram-NLL head, then per doc the
    // DESC-sorted list's top ceil(n*k/100) slice averaged.
    // RBO: powers and tail sums rebuilt as the IDENTICAL iterated
    // chains (a k-row recursive CTE each — pow() is library-specific in
    // its last bit, the multiply chain is not), nano-rounded per-item
    // terms, one query-keyed LONG sum
    "q_rbo" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |    CAST(len(toks) AS BIGINT) AS sa,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS sb
        |  FROM (SELECT source, doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |    FROM documents)),
        |r AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sa DESC, doc_id) AS ra,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sb DESC, doc_id) AS rb
        |  FROM d),
        |pw(dd, v) AS (
        |  SELECT 1, 1.0::DOUBLE * 0.9
        |  UNION ALL SELECT dd + 1, v * 0.9 FROM pw WHERE dd < 10),
        |ts(dd, t) AS (
        |  SELECT 10, 0.0::DOUBLE + (SELECT v FROM pw WHERE dd = 10) / 10
        |  UNION ALL
        |  SELECT ts.dd - 1, ts.t + pw.v / (ts.dd - 1)
        |  FROM ts JOIN pw ON pw.dd = ts.dd - 1
        |  WHERE ts.dd > 1),
        |terms AS (
        |  SELECT source, CAST(round(ts.t * 1e9) AS BIGINT) AS term
        |  FROM r JOIN ts ON ts.dd = greatest(ra, rb)
        |  WHERE ra <= 10 AND rb <= 10)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_shared,
        |  round((1.0 - 0.9) / 0.9 * CAST(sum(term) AS BIGINT) / 1e9, 6)
        |    AS rbo
        |FROM terms GROUP BY source""".stripMargin,
    // speculative acceptance: both LMs' count tables, the exact
    // cross-product min test (ties to target), split numerator sums per
    // context, three divisions with the addition order pinned
    "q_spec_acceptance" ->
      """WITH tt AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''),
        |    '\s+'), t -> t <> '') AS toks FROM documents),
        |tu AS MATERIALIZED (
        |  SELECT w AS w1, count(*)::BIGINT AS cut
        |  FROM tt CROSS JOIN unnest(toks) u(w) GROUP BY w),
        |du AS MATERIALIZED (
        |  SELECT w AS w1, count(*)::BIGINT AS cud
        |  FROM tt CROSS JOIN unnest(toks) u(w)
        |  WHERE doc_id % 5 = 0 GROUP BY w),
        |v AS MATERIALIZED (SELECT count(*)::BIGINT AS v FROM (
        |  SELECT w1 FROM tu UNION SELECT w1 FROM du)),
        |tb AS MATERIALIZED (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2, count(*)::BIGINT AS cbt
        |  FROM tt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)
        |  GROUP BY 1, 2),
        |db AS MATERIALIZED (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2, count(*)::BIGINT AS cbd
        |  FROM tt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)
        |  WHERE doc_id % 5 = 0 GROUP BY 1, 2),
        |seen AS MATERIALIZED (
        |  SELECT coalesce(tb.w1, db.w1) AS w1,
        |    coalesce(tb.cbt, 0) + 1 AS np, coalesce(db.cbd, 0) + 1 AS nq
        |  FROM tb FULL OUTER JOIN db ON tb.w1 = db.w1 AND tb.w2 = db.w2),
        |j AS MATERIALIZED (
        |  SELECT s.w1, s.np, s.nq,
        |    coalesce(tu.cut, 0) + v.v AS dp,
        |    coalesce(du.cud, 0) + v.v AS dq, v.v AS v
        |  FROM seen s
        |  LEFT JOIN tu ON tu.w1 = s.w1
        |  LEFT JOIN du ON du.w1 = s.w1
        |  CROSS JOIN v)
        |SELECT w1 AS context,
        |  CAST(max(dp) - max(v) AS BIGINT) AS ctx_target,
        |  CAST(max(dq) - max(v) AS BIGINT) AS ctx_draft,
        |  CAST(count(*) AS BIGINT) AS n_seen,
        |  round(
        |    CAST(sum(CASE WHEN np * dq <= nq * dp THEN np ELSE 0 END)
        |      AS DOUBLE) / max(dp) +
        |    CAST(sum(CASE WHEN np * dq <= nq * dp THEN 0 ELSE nq END)
        |      AS DOUBLE) / max(dq) +
        |    CAST(max(v) - count(*) AS DOUBLE) / greatest(max(dp), max(dq)),
        |    6) AS acceptance
        |FROM j GROUP BY w1""".stripMargin,
    "q_mink_prob" ->
      """WITH ref AS (
        |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
        |score_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |rt AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM ref),
        |uni AS (
        |  SELECT w AS w1, count(*)::BIGINT AS cu
        |  FROM rt CROSS JOIN unnest(toks) u(w) GROUP BY w),
        |v AS (SELECT count(*)::BIGINT AS v FROM uni),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT bg, count(*)::BIGINT AS cb FROM rb GROUP BY bg),
        |dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks FROM score_docs),
        |db AS (
        |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM dt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |nll AS (
        |  SELECT db.doc_id,
        |    -ln((coalesce(bi.cb, 0) + 1.0) / (coalesce(uni.cu, 0) + v.v))
        |      AS nll
        |  FROM db LEFT JOIN bi ON db.bg = bi.bg
        |          LEFT JOIN uni ON db.w1 = uni.w1
        |          CROSS JOIN v),
        |g AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |    list(nll ORDER BY nll DESC) AS s
        |  FROM nll GROUP BY doc_id),
        |m AS (
        |  SELECT doc_id, n_bigrams,
        |    round(list_sum(s[1:CAST(greatest(1,
        |        (n_bigrams * 20 + 99) // 100) AS INTEGER)]) /
        |      greatest(1, (n_bigrams * 20 + 99) // 100), 6) AS mink_nll
        |  FROM g)
        |SELECT d.doc_id, coalesce(m.n_bigrams, 0) AS n_bigrams,
        |  m.mink_nll
        |FROM score_docs d LEFT JOIN m USING (doc_id)""".stripMargin,
    // Confident learning: the oracle replays the same floor-micro
    // quantization and the integer cross-multiplied threshold test, so
    // no float division or mean round-off exists in either engine.
    "q_label_errors" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS given,
        |    CAST(floor((length(text) % 1000) / 1000.0 * 1000000.0) AS BIGINT) AS pa,
        |    CAST(floor((1.0 - (length(text) % 1000) / 1000.0) * 1000000.0) AS BIGINT) AS pb
        |  FROM documents),
        |lf AS (
        |  SELECT doc_id, given, 'a' AS cls, pa AS p FROM base
        |  UNION ALL
        |  SELECT doc_id, given, 'b' AS cls, pb AS p FROM base),
        |thr AS (SELECT cls, CAST(sum(p) AS BIGINT) AS tsum,
        |    count(*) AS tcnt FROM lf
        |  WHERE given = cls GROUP BY cls),
        |win AS (
        |  SELECT lf.doc_id, lf.given, lf.cls, lf.p,
        |    row_number() OVER (PARTITION BY lf.doc_id
        |      ORDER BY lf.p DESC, lf.cls ASC) AS rn
        |  FROM lf JOIN thr ON lf.cls = thr.cls
        |  WHERE lf.p * thr.tcnt >= thr.tsum),
        |conf AS (SELECT doc_id, given, cls, p FROM win WHERE rn = 1),
        |selfp AS (SELECT doc_id, p AS sp FROM lf WHERE cls = given)
        |SELECT c.doc_id, c.given AS given_label, c.cls AS confident_label,
        |  c.p AS confident_micros, s.sp AS self_micros,
        |  c.cls <> c.given AS flagged
        |FROM conf c JOIN selfp s ON c.doc_id = s.doc_id""".stripMargin,
    // float literals cast to DOUBLE so DuckDB's decimal arithmetic doesn't
    // diverge from Spark's IEEE-double evaluation of the same formula;
    // the indexed variant must produce the identical result set
    "q_bm25_search" -> bm25Oracle,
    "q_bm25_indexed" -> bm25Oracle,
    "q_bm25_segmented" -> bm25Oracle,
    // RM3: pass-1 bm25 (shared CTEs), top-5 feedback docs by (score DESC,
    // id), per-(doc, term) contributions round((tf*smic)*1000.0/dl) summed
    // as BIGINTs, top-8 terms by (weight DESC, term), micro-normalized,
    // α=0.5 pico-unit interpolation, weighted pass-2 over the SAME global
    // (n, avgdl). Association trees mirror the Spark side exactly.
    "q_rm3_search" ->
      """WITH toks AS (
        |  SELECT doc_id, list_transform(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'), t -> t <> ''),
        |    t -> lower(t)) AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(toks)::BIGINT AS dl,
        |    list_filter(toks,
        |      t -> t IN ('spark', 'window', 'merge', 'shuffle')) AS hits
        |  FROM toks),
        |stats AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(dl)::BIGINT::DOUBLE / count(*) AS avgdl FROM base),
        |post AS (
        |  SELECT doc_id, dl, term, count(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base
        |        WHERE len(hits) > 0)
        |  GROUP BY doc_id, dl, term),
        |dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
        |s1 AS (
        |  SELECT p.doc_id, round(sum(
        |    ln(1.0::DOUBLE + (s.n - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) *
        |    (p.tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |    (p.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |       + 0.75::DOUBLE * p.dl / s.avgdl))), 6) AS score
        |  FROM post p JOIN dfs d USING (term) CROSS JOIN stats s
        |  GROUP BY p.doc_id),
        |fb AS (
        |  SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS smic
        |  FROM s1 ORDER BY score DESC, doc_id LIMIT 5),
        |fbt AS (
        |  SELECT t.doc_id, f.smic, len(t.toks)::BIGINT AS dl,
        |    u.term, count(*)::BIGINT AS tf
        |  FROM fb f JOIN toks t USING (doc_id), unnest(t.toks) AS u(term)
        |  GROUP BY t.doc_id, f.smic, dl, u.term),
        |rw AS (
        |  SELECT term, CAST(sum(CAST(round(tf * smic * 1000.0 / dl)
        |    AS BIGINT)) AS BIGINT) AS wn
        |  FROM fbt GROUP BY term),
        |sel AS (SELECT term, wn FROM rw ORDER BY wn DESC, term LIMIT 8),
        |tot AS (SELECT CAST(sum(wn) AS BIGINT) AS ws FROM sel),
        |rmw AS (
        |  SELECT term, CAST(round(wn * 1000000.0 / ws) AS BIGINT) AS rmmic
        |  FROM sel CROSS JOIN tot),
        |orig AS (
        |  SELECT unnest(['spark', 'window', 'merge', 'shuffle']) AS term,
        |    CAST(round(1000000.0 / 4) AS BIGINT) AS omic),
        |qw AS (
        |  SELECT coalesce(o.term, r.term) AS term,
        |    500000 * coalesce(o.omic, 0) + 500000 * coalesce(r.rmmic, 0) AS wp
        |  FROM orig o FULL OUTER JOIN rmw r ON o.term = r.term),
        |qwp AS (SELECT term, wp FROM qw WHERE wp > 0),
        |post2 AS (
        |  SELECT doc_id, dl, term, count(*)::BIGINT AS tf
        |  FROM (SELECT t.doc_id, len(t.toks)::BIGINT AS dl, u.term
        |        FROM toks t, unnest(t.toks) AS u(term)) x
        |    JOIN qwp USING (term)
        |  GROUP BY doc_id, dl, term),
        |dfs2 AS (SELECT term, count(*)::BIGINT AS df FROM post2 GROUP BY term)
        |SELECT p.doc_id, count(*)::BIGINT AS n_hits,
        |  round(sum(
        |    ln(1.0::DOUBLE + (s.n - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) *
        |    (p.tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |    (p.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |       + 0.75::DOUBLE * p.dl / s.avgdl)) * q.wp / 1e12), 6) AS score
        |FROM post2 p JOIN dfs2 d USING (term) JOIN qwp q USING (term)
        |  CROSS JOIN stats s
        |GROUP BY p.doc_id""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH b AS ($bm25Oracle),
         |kw AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
         |  FROM b),
         |lt AS (
         |  SELECT doc_id, n_chars FROM documents
         |  ORDER BY n_chars DESC, doc_id LIMIT 1000),
         |ln AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM lt),
         |u AS (
         |  SELECT doc_id, 1.0::DOUBLE / (60 + rk) AS rrf_contrib FROM kw
         |  UNION ALL
         |  SELECT doc_id, 1.0::DOUBLE / (60 + rk) AS rrf_contrib FROM ln)
         |SELECT doc_id, count(*)::BIGINT AS n_lists,
         |  round(sum(rrf_contrib), 6) AS rrf_score
         |FROM u GROUP BY doc_id""".stripMargin,
  )
}
