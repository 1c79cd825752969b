package graft
package entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{DataFrameUtils, Transformations}

import EntryHelpers._

/** [[graft.SparkEntry]] statistical validation, drift, privacy and sketch queries — one `queries` entry per operator,
  * with its DuckDB `oracleSql` twin where SQL-expressible. Split from
  * the single SparkEntry object for reviewability; [[graft.SparkEntry]]
  * composes every domain object's maps (duplicate keys across files are
  * linted by RowsOnlyLedgerSpec).
  */
private[graft] object StatsEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- pre-shuffle skew diagnostics + data-driven salt plan ----
    "q_skew_report" -> ((s, dir) => {
      operators.Skew.skewReport(t(s, dir, "documents"),
        Seq("lang", "source"), k = 10)
    }),
    "q_salt_plan" -> ((s, dir) => {
      operators.Skew.saltPlan(t(s, dir, "lineitem"), Seq("l_suppkey"),
        targetRowsPerTask = 400)
    }),

    // ---- robust outlier gate: per-language median/MAD over n_chars
    // with planted 1000x spikes; KLL exact under k -> full twin ----
    "q_mad_outliers" -> ((s, dir) => {
      val spiky = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        when(col("doc_id") % 97 === 0, col("n_chars") * 1000)
          .otherwise(col("n_chars")).as("n_chars"))
      operators.Validation.madOutliers(spiky, "n_chars", Seq("lang"))
        .select("doc_id", "lang", "n_chars", "median", "mad", "is_outlier")
    }),

    // ---- count-min sketch: per-language word-frequency cells over
    // the documents token stream, point estimates for a fixed probe
    // list; fully relational (sha256 buckets) -> FULL DuckDB twin,
    // unlike the HLL/KLL/theta binary blobs ----
    "q_cms_estimates" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents").select(col("lang"),
        explode(operators.TextAnalysis.tokens(col("text"))).as("tok"))
      val cells = operators.Sketches.cmsSketches(toks, Seq("lang"), "tok",
        depth = 4, width = 2048)
      operators.Sketches.cmsPointEstimates(cells,
        Seq("the", "data", "queue", "value", "zzz-absent").toDF("key"),
        "key", depth = 4, width = 2048)
    }),

    // ---- CMS inner-product join-size estimate: size the
    // orders⋈lineitem shuffle from two kilobyte summaries ----
    "q_cms_join_size" -> ((s, dir) => {
      def cells(df: org.apache.spark.sql.DataFrame) =
        operators.Sketches.rollupCms(
          operators.Sketches.cmsSketches(df.withColumn("all", lit(1)),
            Seq("all"), "k", depth = 4, width = 4096), Nil)
      operators.Sketches.cmsJoinSize(
        cells(t(s, dir, "orders")
          .select(col("o_orderkey").cast("string").as("k"))),
        cells(t(s, dir, "lineitem")
          .select(col("l_orderkey").cast("string").as("k"))))
    }),

    // ---- mergeable HLL distinct rollup; rows-only: DataSketches HLL is
    // not reproducible in DuckDB (error bounds asserted in SketchesSpec,
    // same contract as q_ann_ivf) ----
    "q_distinct_rollup" -> ((s, dir) => {
      val ev = streaming.StreamingOps.readEvents(s, s"$dir/events.parquet")
        .withColumn("day", to_date(col("ts")))
      val fine = operators.Sketches.distinctSketches(
        ev, Seq("day", "event_type"), "user_id")
      operators.Sketches.rollupDistinct(fine, Seq("event_type"))
        .orderBy("event_type")
    }),

    // ---- mergeable frequent-items sketches: top-2 langs per source from
    // stored per-source sketches (exact under the map size, so the DuckDB
    // count oracle applies; the purged regime is spec-bounded) ----
    "q_frequent_rollup" -> ((s, dir) => {
      val fine = operators.Sketches.frequentSketches(
        t(s, dir, "documents"), Seq("source"), "lang")
      operators.Sketches.rollupFrequent(fine, Seq("source"), k = 2)
    }),

    // ---- mergeable KLL quantile sketches: doc-length distribution per
    // source from stored sketches (exact while group n <= k=4096, so the
    // DuckDB quantile_disc oracle applies; the compacted regime is
    // spec-bounded by the KLL rank error) ----
    "q_quantile_rollup" -> ((s, dir) => {
      val fine = operators.Sketches.quantileSketches(
        t(s, dir, "documents"), Seq("source"), "n_chars")
      operators.Sketches.rollupQuantiles(
        fine, Seq("source"), Seq(0.25, 0.5, 0.9, 0.99))
    }),

    // ---- winsorize: clamp a value column to its [5%, 95%] quantiles;
    // every 50th doc carries a planted 1000x outlier to tame ----
    "q_clip_quantiles" -> ((s, dir) => {
      val spiky = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 50 === 0, col("n_chars") * 1000)
          .otherwise(col("n_chars")).as("n_chars"))
      // k=16384 keeps the KLL sketch in exact mode over sf0.1's 5,000
      // values (default 4096 retains only ~2,950 items → estimation mode,
      // whose unseeded compaction makes the cut points run-dependent and
      // the exact-quantile oracle intermittently red) — same fix as
      // q_quantile_drift for the same corpus
      operators.Validation.clipToQuantiles(spiky, "n_chars", 0.05, 0.95,
        k = 16384)
    }),

    // ---- snapshot quantile drift: distribution gate between a corpus
    // and its refresh (every 3rd doc 100 chars longer) ----
    "q_quantile_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val after = docs.select(
        (col("n_chars") + when(col("doc_id") % 3 === 0, 100).otherwise(0))
          .as("n_chars"))
      operators.Validation.quantileDrift(
        docs.select(col("n_chars")), after, "n_chars",
        Seq(0.25, 0.5, 0.9, 0.99), k = 16384)
    }),

    // ---- PSI drift gate: order-value distribution before vs after a
    // date split, explicit bin cuts, dedicated null bin ----
    "q_psi_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      operators.Validation.populationStability(
        o.where(col("o_orderdate") < lit("1998-01-01")),
        o.where(col("o_orderdate") >= lit("1998-01-01")),
        "o_totalprice",
        Seq(50000.0, 100000.0, 200000.0, 300000.0))
    }),

    // ---- mutual information between lang and source: how much one
    // metadata column re-encodes the other ----
    "q_mutual_info" -> ((s, dir) => {
      operators.Validation.mutualInformation(
        t(s, dir, "documents"), "lang", "source")
    }),

    // ---- chi-squared independence + Cramér's V on the same pair: the
    // effect-size audit (no transcendentals — full hash-exact twin) ----
    "q_chi_squared" -> ((s, dir) => {
      operators.Validation.chiSquaredIndependence(
        t(s, dir, "documents"), "lang", "source")
    }),

    // ---- Wilson CI + EB-shrunken English-rate per source: the small-
    // sample-honest ranking pair (both full twins, z/z² literals) ----
    "q_wilson_ci" -> ((s, dir) =>
      operators.Validation.wilsonIntervals(
        t(s, dir, "documents")
          .select(col("source"), (col("lang") === "en").as("is_en")),
        Seq("source"), "is_en")),
    "q_shrunken_rates" -> ((s, dir) =>
      operators.Validation.shrunkenRates(
        t(s, dir, "documents")
          .select(col("source"), (col("lang") === "en").as("is_en")),
        Seq("source"), "is_en")),

    // ---- Spearman rank agreement per language between two doc-level
    // integral scores (char length vs token count): tie-averaged ranks
    // at 2× scale, exact BIGINT moments, one portable division ----
    "q_spearman" -> ((s, dir) =>
      operators.Validation.spearmanCorrelation(
        t(s, dir, "documents").select(col("lang"),
          length(coalesce(col("text"), lit(""))).cast("long").as("len_c"),
          operators.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("len_t")),
        Seq("lang"), "len_c", "len_t")),

    // ---- Krippendorff's alpha over a deterministic three-annotator
    // fixture: token-count terciles, char-length terciles (correlated
    // but not identical), and a sha-gated 1-in-7 rotation of the first
    // — the LLM-judge-ensemble agreement gate, sha-replayable in SQL ----
    "q_krippendorff" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ntok = operators.TextAnalysis.tokenCount(col("text"))
      val nchr = length(coalesce(col("text"), lit("")))
      val a1v = when(ntok >= 68, "long").when(ntok >= 39, "mid")
        .otherwise("short")
      val a1 = docs.select(col("doc_id"), a1v.as("value"))
      val a2 = docs.select(col("doc_id"),
        when(nchr >= 373, "long").when(nchr >= 216, "mid")
          .otherwise("short").as("value"))
      val a3 = docs.select(col("doc_id"),
        when(operators.TextAnalysis.hash60(
            concat(lit("kripp:"), col("doc_id").cast("string"))) % 7 === 0,
          when(a1v === "short", "mid").when(a1v === "mid", "long")
            .otherwise("short"))
          .otherwise(a1v).as("value"))
      operators.Validation.krippendorffAlpha(
        a1.unionByName(a2).unionByName(a3), "doc_id", "value")
    }),

    // ---- quantile matching: remap non-English doc lengths onto the
    // English length scale (nearest-rank equating, pure BIGINT) ----
    "q_quantile_match" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.Validation.quantileMatch(
        d.where(col("lang") === "en").select(col("n_chars")),
        d.where(col("lang") =!= "en").select(col("n_chars")),
        "n_chars")
    }),

    // ---- Cliff's delta: did English docs shift the length
    // distribution vs the rest, as an outlier-proof ordinal effect ----
    "q_cliffs_delta" -> ((s, dir) => {
      operators.Validation.cliffsDelta(
        t(s, dir, "documents")
          .select((col("lang") === "en").as("is_en"), col("n_chars")),
        "is_en", "n_chars")
    }),

    // ---- Gini concentration of document lengths ----
    "q_gini" -> ((s, dir) =>
      operators.Validation.giniCoefficient(
        t(s, dir, "documents").select(col("n_chars")), "n_chars")),

    // ---- Benford first-digit audit over order totals ----
    "q_benford" -> ((s, dir) =>
      operators.Validation.benfordAudit(
        t(s, dir, "orders").select(
          floor(col("o_totalprice")).cast("long").as("amount")),
        "amount")),

    // ---- bin-free distribution drift: KS between two event slices ----
    "q_ks_drift" -> ((s, dir) => {
      val e = t(s, dir, "events")
      operators.Validation.ksStatistic(
        e.where(col("event_type") === "view").select(col("value")),
        e.where(col("event_type") === "click").select(col("value")),
        "value")
    }),

    // ---- reproducible ε-DP count release over (lang, source) ----
    "q_dp_counts" -> ((s, dir) =>
      operators.Validation.noisedCounts(
        t(s, dir, "documents"), Seq("lang", "source"),
        epsilon = 1.0, seed = "dp")),

    // ---- inter-rater agreement: stored lang label vs a keyword rater ----
    "q_cohen_kappa" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("lang_kw",
        when(col("text").contains(" the "), lit("en")).otherwise(lit("other")))
      operators.Validation.cohenKappa(d, "lang", "lang_kw")
    }),

    // ---- three heuristic length-raters, Fleiss agreement ----
    "q_fleiss_kappa" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def rater(label: org.apache.spark.sql.Column): DataFrame =
        d.select(col("doc_id"), label.as("label"))
      val ratings = rater(
          when(col("n_chars") >= 306, lit("long")).otherwise(lit("short")))
        .unionByName(rater(
          when(length(col("text")) >= 280, lit("long")).otherwise(lit("short"))))
        .unionByName(rater(
          when(col("n_chars") % 2 === 0, lit("long")).otherwise(lit("short"))))
      operators.Validation.fleissKappa(ratings, "doc_id", "label")
    }),

    // ---- local clustering coefficients over the derived order graph ----
    "q_clustering" -> ((s, dir) => {
      val edges = t(s, dir, "orders").select(
        (col("o_orderkey") % 97).cast("string").as("x"),
        (col("o_custkey") % 97).cast("string").as("y"))
      operators.Graphs.clusteringCoefficients(edges, "x", "y")
    }),

    // ---- slice-level mirror detection: term-count cosine between
    // sources (full twin — integer dot/norms, one portable division) ----
    "q_source_similarity" -> ((s, dir) =>
      operators.TextAnalysis.sourceSimilarity(
        t(s, dir, "documents"), "source", "text")),

    // ---- pairwise Jensen–Shannon divergence between sources' token
    // distributions — the drift companion to the mirror cosine ----
    "q_slice_divergence" -> ((s, dir) =>
      operators.TextAnalysis.sliceDivergence(
        t(s, dir, "documents"), "source", "text")),

    // ---- 10%-trimmed mean price per return flag: the robust central
    // tendency via keyedRangePrefix ranks (never a per-group sort) ----
    "q_trimmed_mean" -> ((s, dir) =>
      operators.Validation.trimmedMean(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        trim = 0.1)),

    // ---- Benjamini–Hochberg FDR over one sha-derived p-value per
    // (source, lang) slice (a seventh of them planted small):
    // rangePrefix ranks + rangeSuffixMin step-up, integer α compare ----
    "q_bh" -> ((s, dir) => {
      val h = functions.VectorFunctions.hexPrefixToLong(
        sha2(concat(col("source"), lit(":"),
          coalesce(col("lang"), lit("und"))), 256), 15)
      val tests = t(s, dir, "documents")
        .select(col("source"), col("lang")).distinct()
        .select(when(h % 7 === 0, (h % 1000001L).cast("double") / 1e9)
          .otherwise((h % 1000001L).cast("double") / 1e6).as("p"))
      operators.Validation.bhAdjust(tests, "p", alpha = 0.05)
    }),

    // ---- exact per-group nearest-rank quantiles (p50/p90/p99 table,
    // no sketch): keyedRangePrefix ranks, ⌈p·n⌉ selection ----
    "q_grouped_quantiles" -> ((s, dir) =>
      operators.Validation.groupedQuantiles(
        t(s, dir, "lineitem").select(
          (col("l_suppkey") % 97).cast("string").as("k"),
          col("l_extendedprice").as("v")),
        Seq("k"), "v", Seq(0.5, 0.9, 0.99))),

    // ---- percentile-rank calibration: per-language percent_rank of
    // doc length (the step before mixing incomparable scores) ----
    "q_pct_rank" -> ((s, dir) => {
      operators.Selection.percentileRank(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        "n_chars", Seq("lang"))
    }),

    // ---- categorical PSI: language-mix drift between two corpus
    // halves, union categories with Laplace smoothing ----
    "q_cat_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Validation.categoricalStability(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "lang")
    }),

    // ---- t-closeness audit: per-combo sensitive-distribution skew vs
    // the corpus (TVD, exact integer numerator) — the leak k-anonymity
    // and l-diversity both miss ----
    "q_t_closeness" -> ((s, dir) => {
      operators.Validation.tCloseness(
        t(s, dir, "documents").select(col("source"), col("lang")),
        Seq("source"), "lang", t = 0.05)
    }),

    // ---- k-anonymity: suppress rows whose quasi-identifier combination
    // is rarer than k (the re-identification failure regex PII redaction
    // cannot see); one window exchange, no self-join. k=8 splits the
    // sf0.01 fixture (combo counts 1..16) so survivors AND suppressions
    // both flow through the hash — k=25 made this a vacuous empty-set
    // match (round-12 verdict finding #3) ----
    "q_k_anonymity" -> ((s, dir) => {
      operators.Validation.kAnonymity(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        Seq("lang", "source"), k = 8L)
    }),

    // ---- l-diversity: drop combos whose sensitive value is homogeneous
    // even at k-anonymous counts (the homogeneity attack) ----
    "q_l_diversity" -> ((s, dir) => {
      operators.Validation.lDiversity(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        Seq("lang"), "source", l = 3L)
    }),

    // ---- fixed-grid resample + LOCF gap-fill over the event stream ----
    "q_resample" -> ((s, dir) => {
      val e = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("event_type"), col("ts_us"), col("value"))
      val grid = operators.Timeseries.resample(
        e, "ts_us", "value", Seq("event_type"), stepUs = 3600000000L)
      operators.Timeseries.locf(
        grid.withColumn("__obs", when(col("n_events") > 0, col("value_micros"))),
        "__obs", "bucket_us", Seq("event_type"), "locf_micros")
        .drop("__obs")
    }),

    // ---- CUSUM mean-shift scores per event type: sustained drift the
    // point-outlier gates miss; prefix-window identity, full twin ----
    "q_cusum" -> ((s, dir) => {
      val e = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
        .where(col("ts_ns").isNotNull && col("value").isNotNull)
        .select(col("event_type"), expr("ts_ns div 1000").as("ts_us"),
          round(col("value") * lit(1e6)).cast("long").as("v_micros"))
      operators.Timeseries.cusumChangepoints(e, Seq("event_type"),
        "ts_us", "v_micros", target = 50000000L, slack = 5000000L,
        threshold = 500000000L)
    }),

    // ---- Kaplan–Meier survival per event type: synthetic durations
    // with 20% right-censoring; the prefix product folds a pinned
    // sorted array, so the DuckDB twin is hash-exact ----
    "q_kaplan_meier" -> ((s, dir) => {
      val subj = t(s, dir, "events").select(col("event_type"),
        (col("event_id") % 500 + 1L).as("dur"),
        when(col("event_id") % 5 === 0, 0L).otherwise(1L).as("ev"))
      operators.Funnels.kaplanMeier(subj, Seq("event_type"), "dur", "ev")
    }),

    // ---- Nelson–Aalen cumulative hazard over the same censored
    // fixture: additive nano-summed d/n steps, no product fold ----
    "q_nelson_aalen" -> ((s, dir) => {
      val subj = t(s, dir, "events").select(col("event_type"),
        (col("event_id") % 500 + 1L).as("dur"),
        when(col("event_id") % 5 === 0, 0L).otherwise(1L).as("ev"))
      operators.Funnels.nelsonAalen(subj, Seq("event_type"), "dur", "ev")
    }),

    // ---- Theil–Sen slope + Mann–Kendall trend per event type over a
    // 1/97 event subsample (the pair set is quadratic per key) ----
    "q_theil_sen" -> ((s, dir) => {
      val e = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
        .where(col("event_id") % 97 === 0 && col("ts_ns").isNotNull &&
          col("value").isNotNull)
        .select(col("event_type"), expr("ts_ns div 1000").as("ts_us"),
          round(col("value") * lit(1e6)).cast("long").as("v_micros"))
      operators.Timeseries.theilSenTrend(e, Seq("event_type"),
        "ts_us", "v_micros")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // slice cosine: integer dot over the term-keyed self-join, norms
    // as integer sums-of-squares, one portable division
    "q_source_similarity" ->
      """WITH toks AS (
        |  SELECT CAST(source AS VARCHAR) AS k,
        |    unnest(list_filter(string_split_regex(coalesce(text, ''),
        |      '\s+'), t -> t <> '')) AS t
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (
        |  SELECT k, t, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY k, t),
        |norms AS (
        |  SELECT k, CAST(sum(c * c) AS BIGINT) AS ss FROM c GROUP BY k),
        |dots AS (
        |  SELECT a.k AS key_a, b.k AS key_b,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |  FROM c a JOIN c b ON a.t = b.t AND a.k < b.k
        |  GROUP BY a.k, b.k)
        |SELECT key_a, key_b, dot,
        |  round(dot::DOUBLE / (sqrt(na.ss::DOUBLE) * sqrt(nb.ss::DOUBLE)),
        |    6) AS cosine
        |FROM dots
        |JOIN norms na ON na.k = key_a
        |JOIN norms nb ON nb.k = key_b""".stripMargin,
    "q_trimmed_mean" ->
      """WITH vc AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS v,
        |    count(*)::BIGINT AS c
        |  FROM lineitem GROUP BY g, v),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY g),
        |pre AS (
        |  SELECT g, v, c, CAST(coalesce(sum(c) OVER (PARTITION BY g
        |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS pre
        |  FROM vc),
        |j AS (
        |  SELECT pre.g, v, c, pre.pre, tot.n,
        |    CAST(floor(tot.n::DOUBLE * CAST(0.1 AS DOUBLE)) AS BIGINT) AS k
        |  FROM pre JOIN tot USING (g)),
        |kept AS (
        |  SELECT g, n, v,
        |    greatest(least(pre + c, n - k) - greatest(pre, k), 0) AS kc
        |  FROM j)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(kc) AS BIGINT) AS n_kept,
        |  round(CASE WHEN sum(kc) = 0 THEN NULL
        |    ELSE CAST(sum(v * kc) AS BIGINT)::DOUBLE
        |      / CAST(sum(kc) AS BIGINT)::DOUBLE / 1e6 END, 6)
        |    AS trimmed_mean
        |FROM kept GROUP BY g""".stripMargin,

    // BH step-up: same sha-derived p fixture, ranks by running count,
    // candidate terms in the Scala side's exact IEEE order
    // (((p·m)/rank)·1e9), suffix min + integer micro collapse.
    "q_bh" ->
      """WITH tests AS (
        |  SELECT DISTINCT source, lang FROM documents),
        |hp AS (
        |  SELECT ('0x' || substring(sha256(
        |    source || ':' || coalesce(lang, 'und')), 1, 15))::BIGINT AS h
        |  FROM tests),
        |ps AS (
        |  SELECT CASE WHEN h % 7 = 0 THEN (h % 1000001)::DOUBLE / 1e9
        |    ELSE (h % 1000001)::DOUBLE / 1e6 END AS p FROM hp),
        |dp AS (SELECT p, count(*)::BIGINT AS c FROM ps GROUP BY p),
        |rk AS (
        |  SELECT p, c,
        |    CAST(sum(c) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS rank,
        |    (SELECT count(*) FROM ps) AS m
        |  FROM dp),
        |tm AS (
        |  SELECT p, c, rank,
        |    CAST(round(p * m::DOUBLE / rank::DOUBLE * 1e9) AS BIGINT) AS t
        |  FROM rk),
        |sf AS (
        |  SELECT p, c, rank,
        |    CAST(min(t) OVER (ORDER BY p DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS q
        |  FROM tm),
        |qq AS (
        |  SELECT p, c, rank,
        |    CAST((least(q, 1000000000) + 500) // 1000 AS BIGINT) AS qm
        |  FROM sf)
        |SELECT p, c AS n_tests, rank,
        |  round(qm::DOUBLE / 1e6, 6) AS q_value, qm <= 50000 AS reject
        |FROM qq""".stripMargin,

    // Exact grouped quantiles: same micro-quantized count-table +
    // running-count discipline as q_trimmed_mean, ⌈p·n⌉ nearest-rank
    // containment (the same IEEE multiply/ceil as the Scala side).
    "q_grouped_quantiles" ->
      """WITH vals AS (
        |  SELECT CAST(l_suppkey % 97 AS VARCHAR) AS k,
        |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS v
        |  FROM lineitem),
        |vc AS (SELECT k, v, count(*)::BIGINT AS c FROM vals GROUP BY k, v),
        |tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY k),
        |run AS (
        |  SELECT k, v, c, CAST(coalesce(sum(c) OVER (PARTITION BY k
        |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS pre
        |  FROM vc),
        |probs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |  CAST(0.99 AS DOUBLE)]) AS p)
        |SELECT r.k, p, n, round(v::DOUBLE / 1e6, 6) AS value
        |FROM run r JOIN tot USING (k) CROSS JOIN probs
        |WHERE pre < CAST(ceil(p * n::DOUBLE) AS BIGINT)
        |  AND pre + c >= CAST(ceil(p * n::DOUBLE) AS BIGINT)""".stripMargin,
    "q_frequent_rollup" ->
      """WITH c AS (
        |  SELECT source, lang, count(*)::BIGINT AS cnt FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, cnt, row_number() OVER (
        |    PARTITION BY source ORDER BY cnt DESC, lang) AS rk
        |  FROM c)
        |SELECT source, rk::INT AS rank, lang AS item, cnt AS est
        |FROM r WHERE rk <= 2""".stripMargin,
    "q_quantile_rollup" ->
      """SELECT source, 0.25::DOUBLE AS prob,
        |  quantile_disc(n_chars, 0.25)::DOUBLE AS quantile
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT source, 0.5::DOUBLE, quantile_disc(n_chars, 0.5)::DOUBLE
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT source, 0.9::DOUBLE, quantile_disc(n_chars, 0.9)::DOUBLE
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT source, 0.99::DOUBLE, quantile_disc(n_chars, 0.99)::DOUBLE
        |FROM documents GROUP BY source""".stripMargin,
    // Winsorize: the cut points are the same quantile_disc values the
    // KLL sketch yields exactly under k; the clamp is pure arithmetic.
    "q_skew_report" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
        |r AS (
        |  SELECT lang, source, cnt, row_number() OVER (
        |    ORDER BY cnt DESC, lang ASC, source ASC) AS rank
        |  FROM c)
        |SELECT lang, source, cnt,
        |  (cnt * 1000000) // total AS share_micros,
        |  CAST(rank AS INTEGER) AS rank
        |FROM r, t WHERE rank <= 10""".stripMargin,
    "q_salt_plan" ->
      """SELECT l_suppkey, cnt, (cnt + 399) // 400 AS salts FROM (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1)
        |WHERE cnt > 400""".stripMargin,
    "q_mad_outliers" ->
      """WITH spiky AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 97 = 0 THEN n_chars * 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents),
        |med AS (
        |  SELECT lang, quantile_disc(n_chars, 0.5)::DOUBLE AS median
        |  FROM spiky GROUP BY lang),
        |dev AS (
        |  SELECT s.doc_id, s.lang, s.n_chars, m.median,
        |    abs(s.n_chars::DOUBLE - m.median) AS d
        |  FROM spiky s JOIN med m ON s.lang = m.lang),
        |mad AS (
        |  SELECT lang, quantile_disc(d, 0.5)::DOUBLE AS mad
        |  FROM dev GROUP BY lang)
        |SELECT v.doc_id, v.lang, v.n_chars, v.median, a.mad,
        |  v.d > a.mad * 3.5 AS is_outlier
        |FROM dev v JOIN mad a ON v.lang = a.lang""".stripMargin,
    "q_clip_quantiles" ->
      """WITH spiky AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 0 THEN n_chars * 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents),
        |cuts AS (
        |  SELECT quantile_disc(n_chars, 0.05)::DOUBLE AS lo,
        |    quantile_disc(n_chars, 0.95)::DOUBLE AS hi
        |  FROM spiky)
        |SELECT s.doc_id, s.n_chars,
        |  greatest(c.lo, least(c.hi, s.n_chars::DOUBLE)) AS n_chars_clipped
        |FROM spiky s CROSS JOIN cuts c""".stripMargin,

    // PSI: identical CASE binning, fractions as long/double division,
    // epsilon-smoothed log terms — pure double arithmetic both engines.
    "q_psi_drift" ->
      """WITH bins(bin, bin_lo, bin_hi) AS (VALUES
        |  (-1, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)),
        |  (0, CAST(NULL AS DOUBLE), 50000.0),
        |  (1, 50000.0, 100000.0),
        |  (2, 100000.0, 200000.0),
        |  (3, 200000.0, 300000.0),
        |  (4, 300000.0, CAST(NULL AS DOUBLE))),
        |b AS (SELECT CASE WHEN o_totalprice IS NULL THEN -1 ELSE
        |    (o_totalprice >= 50000.0)::INT + (o_totalprice >= 100000.0)::INT +
        |    (o_totalprice >= 200000.0)::INT + (o_totalprice >= 300000.0)::INT END AS bin
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |a AS (SELECT CASE WHEN o_totalprice IS NULL THEN -1 ELSE
        |    (o_totalprice >= 50000.0)::INT + (o_totalprice >= 100000.0)::INT +
        |    (o_totalprice >= 200000.0)::INT + (o_totalprice >= 300000.0)::INT END AS bin
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        |bc AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
        |ac AS (SELECT bin, count(*) AS n FROM a GROUP BY bin),
        |j AS (SELECT bins.bin, bins.bin_lo, bins.bin_hi,
        |    coalesce(bc.n, 0) AS n_before, coalesce(ac.n, 0) AS n_after
        |  FROM bins LEFT JOIN bc ON bc.bin = bins.bin
        |  LEFT JOIN ac ON ac.bin = bins.bin),
        |f AS (SELECT bin, bin_lo, bin_hi, n_before, n_after,
        |    n_before / (SELECT sum(n_before)::BIGINT FROM j)::DOUBLE AS frac_before,
        |    n_after / (SELECT sum(n_after)::BIGINT FROM j)::DOUBLE AS frac_after
        |  FROM j)
        |SELECT CAST(bin AS BIGINT) AS bin, bin_lo, bin_hi,
        |  CAST(n_before AS BIGINT) AS n_before,
        |  CAST(n_after AS BIGINT) AS n_after,
        |  frac_before, frac_after,
        |  (greatest(frac_after, 1e-6) - greatest(frac_before, 1e-6))
        |    * ln(greatest(frac_after, 1e-6) / greatest(frac_before, 1e-6))
        |    AS psi_term
        |FROM f""".stripMargin,

    // Quantile drift: exact under k at test SF, so quantile_disc per
    // probe on each side is the oracle; drift is a double subtraction of
    // identical values on both engines.
    "q_quantile_drift" ->
      """WITH b AS (SELECT n_chars FROM documents),
        |a AS (SELECT n_chars + CASE WHEN doc_id % 3 = 0 THEN 100 ELSE 0 END
        |        AS n_chars FROM documents)
        |SELECT 0.25::DOUBLE AS prob,
        |  (SELECT quantile_disc(n_chars, 0.25) FROM b)::DOUBLE AS q_before,
        |  (SELECT quantile_disc(n_chars, 0.25) FROM a)::DOUBLE AS q_after,
        |  (SELECT quantile_disc(n_chars, 0.25) FROM a)::DOUBLE
        |    - (SELECT quantile_disc(n_chars, 0.25) FROM b)::DOUBLE AS drift
        |UNION ALL
        |SELECT 0.5::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.5) FROM b)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.5) FROM a)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.5) FROM a)::DOUBLE
        |    - (SELECT quantile_disc(n_chars, 0.5) FROM b)::DOUBLE
        |UNION ALL
        |SELECT 0.9::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.9) FROM b)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.9) FROM a)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.9) FROM a)::DOUBLE
        |    - (SELECT quantile_disc(n_chars, 0.9) FROM b)::DOUBLE
        |UNION ALL
        |SELECT 0.99::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.99) FROM b)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.99) FROM a)::DOUBLE,
        |  (SELECT quantile_disc(n_chars, 0.99) FROM a)::DOUBLE
        |    - (SELECT quantile_disc(n_chars, 0.99) FROM b)::DOUBLE""".stripMargin,
    "q_mutual_info" ->
      """WITH g AS (
        |  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS nab
        |  FROM documents GROUP BY lang, source),
        |e AS (SELECT a, b, nab,
        |    CAST(sum(nab) OVER (PARTITION BY a) AS BIGINT) AS na,
        |    CAST(sum(nab) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(sum(nab) OVER () AS BIGINT) AS nn
        |  FROM g)
        |SELECT CAST(max(nn) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round((nab::DOUBLE / nn)
        |    * ln((nab::DOUBLE * nn) / (na::DOUBLE * nb)) * 1e9) AS BIGINT))
        |    AS BIGINT) / 1e9, 6) AS mi_nats
        |FROM e""".stripMargin,
    // chi2 via the present-cells identity N·Σ o²/(na·nb) − N; pure IEEE
    // arithmetic from integer counts, nano-quantized cell terms
    "q_chi_squared" ->
      """WITH g AS (
        |  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS nab
        |  FROM documents GROUP BY lang, source),
        |m AS (SELECT a, b, nab,
        |    CAST(sum(nab) OVER (PARTITION BY a) AS BIGINT) AS na,
        |    CAST(sum(nab) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(sum(nab) OVER () AS BIGINT) AS nn
        |  FROM g),
        |agg AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a)
        |      + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r,
        |    CAST(count(DISTINCT b)
        |      + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CAST(round((nab::DOUBLE * nab) / (na::DOUBLE * nb)
        |      * 1e9) AS BIGINT)) AS BIGINT) AS sn
        |  FROM m),
        |f AS (
        |  SELECT n, r, c,
        |    greatest(0.0, n::DOUBLE * sn / 1e9 - n::DOUBLE) AS chi2raw
        |  FROM agg)
        |SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
        |  round(chi2raw, 6) AS chi2,
        |  CASE WHEN least(r, c) <= 1 THEN NULL
        |    ELSE round(sqrt(chi2raw / (n::DOUBLE * (least(r, c) - 1))), 6)
        |  END AS cramers_v
        |FROM f""".stripMargin,
    "q_gini" ->
      """WITH g AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |p AS (
        |  SELECT v, c, coalesce(CAST(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS b
        |  FROM g),
        |s AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(v * c) AS BIGINT) AS sx,
        |    CAST(sum(v * (c * b + (c * (c + 1)) // 2)) AS BIGINT) AS rs
        |  FROM p)
        |SELECT n,
        |  round(CASE WHEN sx = 0 THEN NULL
        |    ELSE 2.0::DOUBLE * rs / CAST(n * sx AS DOUBLE)
        |      - CAST(n + 1 AS DOUBLE) / n END, 6) AS gini
        |FROM s""".stripMargin,
    // Benford: identical log10 double literals on both sides (log10 is
    // not cross-libm portable); floor-then-cast so the double -> long
    // conversion agrees (Spark casts truncate, DuckDB CAST rounds)
    "q_benford" ->
      """WITH d AS (
        |  SELECT CASE WHEN v IS NULL OR v <= 0 THEN 0
        |    ELSE CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INT) END AS digit
        |  FROM (SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders)),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        |t AS (SELECT digit, n,
        |    CAST(sum(CASE WHEN digit > 0 THEN n ELSE 0 END) OVER ()
        |      AS BIGINT) AS nn
        |  FROM g),
        |e AS (SELECT digit, n, nn,
        |    CASE digit
        |      WHEN 1 THEN 0.3010299956639812::DOUBLE
        |      WHEN 2 THEN 0.17609125905568124::DOUBLE
        |      WHEN 3 THEN 0.12493873660829993::DOUBLE
        |      WHEN 4 THEN 0.09691001300805642::DOUBLE
        |      WHEN 5 THEN 0.07918124604762482::DOUBLE
        |      WHEN 6 THEN 0.06694678963061322::DOUBLE
        |      WHEN 7 THEN 0.05799194697768673::DOUBLE
        |      WHEN 8 THEN 0.05115252244738129::DOUBLE
        |      WHEN 9 THEN 0.04575749056067514::DOUBLE END * nn AS ex
        |  FROM t)
        |SELECT digit, n,
        |  CASE WHEN digit = 0 THEN NULL ELSE round(ex, 6) END AS expected,
        |  CASE WHEN digit = 0 THEN NULL
        |    ELSE round((n - ex) * (n - ex) / ex, 6) END AS chi2_term
        |FROM e""".stripMargin,
    "q_ks_drift" ->
      """WITH b AS (SELECT value AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |a AS (SELECT value AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |tb AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM b),
        |ta AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM a),
        |zb AS (SELECT CAST(count(*) AS BIGINT) AS z1 FROM events
        |  WHERE event_type = 'view' AND value IS NULL),
        |za AS (SELECT CAST(count(*) AS BIGINT) AS z2 FROM events
        |  WHERE event_type = 'click' AND value IS NULL),
        |g1 AS (SELECT v, CAST(count(*) AS BIGINT) AS c1 FROM b GROUP BY v),
        |g2 AS (SELECT v, CAST(count(*) AS BIGINT) AS c2 FROM a GROUP BY v),
        |m AS (
        |  SELECT coalesce(g1.v, g2.v) AS v,
        |    coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |  FROM g1 FULL OUTER JOIN g2 ON g1.v = g2.v),
        |p AS (
        |  SELECT CAST(sum(c1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS r1,
        |    CAST(sum(c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS r2
        |  FROM m),
        |d AS (SELECT coalesce(CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT), 0)
        |    AS dn
        |  FROM p, tb, ta)
        |SELECT n1 AS n_before, n2 AS n_after, z1 AS null_before,
        |  z2 AS null_after,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
        |    ELSE CAST(dn AS DOUBLE) / (n1 * n2) END, 6) AS ks
        |FROM d, tb, ta, zb, za""".stripMargin,
    // DP counts: same sha-derived uniform, same inverse-CDF Laplace tree
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c,
        |    (('0x' || substring(sha256('dp' || ':' || coalesce(lang, '')
        |      || ':' || coalesce(source, '')), 1, 7))::BIGINT + 0.5)
        |      / 268435456.0 AS u
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source,
        |  c + CAST(round(-1.0 * sign(u - 0.5)::DOUBLE *
        |    ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT) AS noised_count
        |FROM g""".stripMargin,
    "q_cohen_kappa" ->
      """WITH d AS (
        |  SELECT lang AS a,
        |    CASE WHEN text LIKE '% the %' THEN 'en' ELSE 'other' END AS b
        |  FROM documents),
        |g AS (SELECT a, b, CAST(count(*) AS BIGINT) AS nab FROM d GROUP BY a, b),
        |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM g GROUP BY a),
        |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM g GROUP BY b),
        |pe AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS pe_num
        |  FROM ma JOIN mb ON ma.a IS NOT DISTINCT FROM mb.b),
        |tot AS (SELECT CAST(coalesce(sum(nab), 0) AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN a IS NOT DISTINCT FROM b
        |      THEN nab ELSE 0 END), 0) AS BIGINT) AS agree
        |  FROM g)
        |SELECT n, agree,
        |  round(CASE WHEN n * n - pe_num = 0 THEN NULL
        |    ELSE CAST(n * agree - pe_num AS DOUBLE) / (n * n - pe_num)
        |  END, 6) AS kappa
        |FROM tot, pe""".stripMargin,
    "q_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT doc_id AS i,
        |    CASE WHEN n_chars >= 306 THEN 'long' ELSE 'short' END AS j
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN length(text) >= 280 THEN 'long' ELSE 'short' END
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN n_chars % 2 = 0 THEN 'long' ELSE 'short' END
        |  FROM documents),
        |cells AS (SELECT i, j, CAST(count(*) AS BIGINT) AS nij
        |  FROM r GROUP BY i, j),
        |per_item AS (SELECT i, CAST(sum(nij * nij) AS BIGINT) AS sq
        |  FROM cells GROUP BY i),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(coalesce(sum(sq - 3), 0) AS BIGINT) AS aa
        |  FROM per_item),
        |marg AS (SELECT j, CAST(sum(nij) AS BIGINT) AS cj
        |  FROM cells GROUP BY j),
        |b AS (SELECT CAST(coalesce(sum(cj * cj), 0) AS BIGINT) AS bb FROM marg)
        |SELECT n_items, CAST(3 AS BIGINT) AS n_raters,
        |  round(CASE WHEN 2 * (n_items * n_items * 9 - bb) = 0 THEN NULL
        |    ELSE CAST(aa * n_items * 3 - bb * 2 AS DOUBLE)
        |      / (2 * (n_items * n_items * 9 - bb))
        |  END, 6) AS kappa
        |FROM a, b""".stripMargin,
    "q_clustering" ->
      """WITH raw AS (
        |  SELECT CAST(o_orderkey % 97 AS VARCHAR) AS x,
        |    CAST(o_custkey % 97 AS VARCHAR) AS y
        |  FROM orders),
        |e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
        |  FROM raw WHERE x <> y),
        |tri AS (
        |  SELECT x.a AS u, x.b AS v, y.b AS w
        |  FROM e x
        |  JOIN e y ON x.b = y.a
        |  JOIN e z ON z.a = x.a AND z.b = y.b),
        |tcnt AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS triangles
        |  FROM (SELECT u AS n FROM tri
        |    UNION ALL SELECT v FROM tri
        |    UNION ALL SELECT w FROM tri)
        |  GROUP BY n),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node)
        |SELECT d.node, d.degree, coalesce(t.triangles, 0) AS triangles,
        |  CASE WHEN d.degree <= 1 THEN 0.0
        |    ELSE round(2.0 * coalesce(t.triangles, 0)
        |      / (d.degree * (d.degree - 1)), 6) END AS cc
        |FROM deg d LEFT JOIN tcnt t USING (node)""".stripMargin,
    "q_pct_rank" ->
      """SELECT doc_id, lang, n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars), 6)
        |    AS pct
        |FROM documents""".stripMargin,
    "q_cat_drift" ->
      """WITH b AS (SELECT lang AS category, CAST(count(*) AS BIGINT) AS nb
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
        |a AS (SELECT lang AS category, CAST(count(*) AS BIGINT) AS na
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY lang),
        |j AS (SELECT coalesce(b.category, a.category) AS category,
        |    coalesce(nb, 0) AS n_before, coalesce(na, 0) AS n_after
        |  FROM b FULL OUTER JOIN a
        |    ON b.category IS NOT DISTINCT FROM a.category),
        |t AS (SELECT *,
        |    CAST(sum(n_before) OVER () AS BIGINT) AS tb,
        |    CAST(sum(n_after) OVER () AS BIGINT) AS ta,
        |    CAST(count(*) OVER () AS BIGINT) AS k
        |  FROM j)
        |SELECT category, n_before, n_after,
        |  (n_before + 0.5) / (tb + 0.5 * k) AS frac_before,
        |  (n_after + 0.5) / (ta + 0.5 * k) AS frac_after,
        |  ((n_after + 0.5) / (ta + 0.5 * k)
        |    - (n_before + 0.5) / (tb + 0.5 * k))
        |  * ln(((n_after + 0.5) / (ta + 0.5 * k))
        |    / ((n_before + 0.5) / (tb + 0.5 * k))) AS psi_term
        |FROM t""".stripMargin,
    // t-closeness: identical integer numerator, one double division,
    // both engines round the same quotient.
    "q_t_closeness" ->
      """WITH g AS (
        |  SELECT source, lang AS v, CAST(count(*) AS BIGINT) AS cv
        |  FROM documents GROUP BY source, lang),
        |e AS (
        |  SELECT source, v, cv,
        |    CAST(sum(cv) OVER (PARTITION BY source) AS BIGINT) AS nq,
        |    CAST(sum(cv) OVER (PARTITION BY v) AS BIGINT) AS gv,
        |    CAST(sum(cv) OVER () AS BIGINT) AS nn
        |  FROM g),
        |a AS (
        |  SELECT source, max(nq) AS n,
        |    CAST(sum(abs(cv * nn - gv * nq)) AS BIGINT) AS s1,
        |    max(nq) AS mnq, max(nn) AS mnn,
        |    CAST(sum(gv) AS BIGINT) AS sgv
        |  FROM e GROUP BY source)
        |SELECT source, n,
        |  round((s1 + mnq * mnn - mnq * sgv) / (2.0 * mnq * mnn), 6) AS tvd,
        |  round((s1 + mnq * mnn - mnq * sgv) / (2.0 * mnq * mnn), 6) <= 0.05
        |    AS pass
        |FROM a""".stripMargin,
    // Spearman twin: identical 2x tie-averaged ranks via a per-key
    // lag-window over the distinct-value counts, centered on the exact
    // mean n+1, BIGINT moments, one portable division.
    "q_spearman" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(length(coalesce(text, '')) AS BIGINT) AS x,
        |    CAST(len(list_filter(string_split_regex(coalesce(text, ''),
        |      '\s+'), t -> t <> '')) AS BIGINT) AS y
        |  FROM documents WHERE lang IS NOT NULL),
        |cnt AS (SELECT lang, count(*)::BIGINT AS n FROM d GROUP BY lang),
        |cx AS (SELECT lang, x, count(*)::BIGINT AS c FROM d GROUP BY lang, x),
        |rx AS (SELECT lang, x,
        |  2 * CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) + c + 1 AS r2 FROM cx),
        |cy AS (SELECT lang, y, count(*)::BIGINT AS c FROM d GROUP BY lang, y),
        |ry AS (SELECT lang, y,
        |  2 * CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) + c + 1 AS r2 FROM cy),
        |j AS (
        |  SELECT d.lang, cnt.n,
        |    rx.r2 - cnt.n - 1 AS dx, ry.r2 - cnt.n - 1 AS dy
        |  FROM d
        |  JOIN rx ON rx.lang = d.lang AND rx.x = d.x
        |  JOIN ry ON ry.lang = d.lang AND ry.y = d.y
        |  JOIN cnt ON cnt.lang = d.lang)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(dx * dy) AS BIGINT) AS sum_dxdy,
        |  CASE WHEN CAST(sum(dx * dx) AS BIGINT) = 0
        |      OR CAST(sum(dy * dy) AS BIGINT) = 0 THEN NULL
        |    ELSE round(CAST(CAST(sum(dx * dy) AS BIGINT) AS DOUBLE) /
        |      (sqrt(CAST(CAST(sum(dx * dx) AS BIGINT) AS DOUBLE)) *
        |        sqrt(CAST(CAST(sum(dy * dy) AS BIGINT) AS DOUBLE))), 6)
        |    END AS rho
        |FROM j GROUP BY lang""".stripMargin,
    // JSD twin: only shared terms join (one-sided terms pay their mass
    // times ln 2 in the closed form); per-term summands are logs of
    // exact BIGINT rationals, nano-quantized at birth, LONG-summed.
    "q_slice_divergence" ->
      """WITH toks AS (
        |  SELECT CAST(source AS VARCHAR) AS k,
        |    unnest(list_filter(string_split_regex(coalesce(text, ''),
        |      '\s+'), t -> t <> '')) AS t
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (
        |  SELECT k, t, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY k, t),
        |tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS nt FROM c GROUP BY k),
        |j AS (
        |  SELECT a.k AS key_a, b.k AS key_b, a.c AS ca, b.c AS cb,
        |    ta.nt AS na, tb.nt AS nb
        |  FROM c a JOIN c b ON a.t = b.t AND a.k < b.k
        |  JOIN tot ta ON ta.k = a.k
        |  JOIN tot tb ON tb.k = b.k),
        |g AS (
        |  SELECT key_a, key_b, count(*)::BIGINT AS n_common_terms,
        |    CAST(sum(ca) AS BIGINT) AS cas, CAST(sum(cb) AS BIGINT) AS cbs,
        |    CAST(sum(CAST(round(CAST(ca AS DOUBLE) / na *
        |      ln(2e0 * CAST(ca * nb AS DOUBLE) / (ca * nb + cb * na)) *
        |      1e9) AS BIGINT)) AS BIGINT) AS san,
        |    CAST(sum(CAST(round(CAST(cb AS DOUBLE) / nb *
        |      ln(2e0 * CAST(cb * na AS DOUBLE) / (ca * nb + cb * na)) *
        |      1e9) AS BIGINT)) AS BIGINT) AS sbn,
        |    max(na) AS na, max(nb) AS nb
        |  FROM j GROUP BY key_a, key_b)
        |SELECT key_a, key_b, n_common_terms,
        |  round(0.5e0 * (0.6931471805599453e0 *
        |      (1e0 - CAST(cas AS DOUBLE) / na) + CAST(san AS DOUBLE) / 1e9)
        |    + 0.5e0 * (0.6931471805599453e0 *
        |      (1e0 - CAST(cbs AS DOUBLE) / nb) + CAST(sbn AS DOUBLE) / 1e9),
        |    6) AS jsd
        |FROM g""".stripMargin,
    // Krippendorff twin: the three sha-replayable annotators rebuilt in
    // SQL, unit/value coincidence counts, the per-unit rational
    // disagreement nano-quantized, integer marginals; D_e's n-1 division
    // and alpha assembled with the same IEEE ops as the driver.
    "q_krippendorff" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(coalesce(text, ''),
        |      '\s+'), t -> t <> '')) AS BIGINT) AS ntok,
        |    CAST(length(coalesce(text, '')) AS BIGINT) AS nchr
        |  FROM documents),
        |a1 AS (SELECT doc_id, CASE WHEN ntok >= 68 THEN 'long'
        |  WHEN ntok >= 39 THEN 'mid' ELSE 'short' END AS value FROM base),
        |a2 AS (SELECT doc_id, CASE WHEN nchr >= 373 THEN 'long'
        |  WHEN nchr >= 216 THEN 'mid' ELSE 'short' END AS value FROM base),
        |a3 AS (
        |  SELECT a1.doc_id,
        |    CASE WHEN ('0x' || substring(sha256('kripp:' ||
        |        a1.doc_id::VARCHAR), 1, 15))::BIGINT % 7 = 0
        |      THEN CASE WHEN a1.value = 'short' THEN 'mid'
        |        WHEN a1.value = 'mid' THEN 'long' ELSE 'short' END
        |      ELSE a1.value END AS value
        |  FROM a1),
        |r AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |  UNION ALL SELECT * FROM a3),
        |uv AS (SELECT doc_id AS u, value AS v, count(*)::BIGINT AS c
        |  FROM r GROUP BY u, v),
        |units AS (
        |  SELECT u, CAST(sum(c) AS BIGINT) AS m,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS agree
        |  FROM uv GROUP BY u HAVING CAST(sum(c) AS BIGINT) >= 2),
        |dd AS (
        |  SELECT CAST(sum(CAST(round(CAST(m * (m - 1) - agree AS DOUBLE)
        |      / (m - 1) * 1e9) AS BIGINT)) AS BIGINT) AS don,
        |    CAST(sum(m) AS BIGINT) AS n, count(*)::BIGINT AS units
        |  FROM units),
        |marg AS (
        |  SELECT CAST(sum(nv * nv) AS BIGINT) AS s2 FROM (
        |    SELECT uv.v, CAST(sum(uv.c) AS BIGINT) AS nv
        |    FROM uv JOIN units ON units.u = uv.u GROUP BY uv.v))
        |SELECT units AS n_units, n AS n_ratings,
        |  round(CAST(don AS DOUBLE) / 1e9, 6) AS d_o,
        |  round(CAST(n * n - s2 AS DOUBLE) / (n - 1), 6) AS d_e,
        |  CASE WHEN CAST(n * n - s2 AS DOUBLE) / (n - 1) <= 0e0 THEN NULL
        |    ELSE round(1e0 - (CAST(don AS DOUBLE) / 1e9) /
        |      (CAST(n * n - s2 AS DOUBLE) / (n - 1)), 6) END AS alpha
        |FROM dd CROSS JOIN marg""".stripMargin,
    // Bounded BFS: UNION (not UNION ALL) recursion dedups (node, hops)
    // pairs per level, so cyclic graphs cannot blow up the path count;
    // min(hops) collapses levels exactly like the engine's visited set.
    // Count-min: the oracle rebuilds the cells with the same sha256
    // bucket idiom and takes the same min-over-depth with absent
    // cells as zero — integer arithmetic end to end.
    "q_cms_estimates" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |cells AS (
        |  SELECT lang, d,
        |    ('0x' || substring(sha256(tok || ':graft:' || d::VARCHAR), 1, 7))::BIGINT
        |      % 2048 AS b,
        |    count(*) AS cnt
        |  FROM toks CROSS JOIN ds
        |  GROUP BY lang, d, b),
        |probes AS (SELECT unnest(
        |  ['the', 'data', 'queue', 'value', 'zzz-absent']) AS key),
        |pb AS (
        |  SELECT key, d,
        |    ('0x' || substring(sha256(key || ':graft:' || d::VARCHAR), 1, 7))::BIGINT
        |      % 2048 AS b
        |  FROM probes CROSS JOIN ds),
        |groups AS (SELECT DISTINCT lang FROM cells)
        |SELECT g.lang, p.key,
        |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS freq_est
        |FROM groups g CROSS JOIN pb p
        |LEFT JOIN cells c ON c.lang = g.lang AND c.d = p.d AND c.b = p.b
        |GROUP BY g.lang, p.key""".stripMargin,
    "q_cms_join_size" ->
      """WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |ca AS (
        |  SELECT d,
        |    ('0x' || substring(sha256(o_orderkey::VARCHAR || ':graft:' || d::VARCHAR), 1, 7))::BIGINT
        |      % 4096 AS b,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM orders CROSS JOIN ds GROUP BY d, b),
        |cb AS (
        |  SELECT d,
        |    ('0x' || substring(sha256(l_orderkey::VARCHAR || ':graft:' || d::VARCHAR), 1, 7))::BIGINT
        |      % 4096 AS b,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM lineitem CROSS JOIN ds GROUP BY d, b),
        |ip AS (
        |  SELECT ca.d, CAST(sum(ca.ca * cb.cb) AS BIGINT) AS ip
        |  FROM ca JOIN cb ON ca.d = cb.d AND ca.b = cb.b GROUP BY ca.d)
        |SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS join_size_est
        |FROM ds LEFT JOIN ip ON ip.d = ds.d""".stripMargin,
    "q_k_anonymity" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    count(*) OVER (PARTITION BY lang, source) AS c
        |  FROM documents) WHERE c >= 8""".stripMargin,
    "q_l_diversity" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    count(DISTINCT source) OVER (PARTITION BY lang) AS d
        |  FROM documents) WHERE d >= 3""".stripMargin,
    "q_resample" ->
      """WITH e AS (
        |  SELECT event_type AS k, epoch_us(ts) AS us, value
        |  FROM events WHERE ts IS NOT NULL),
        |a AS (
        |  SELECT k, us // 3600000000 AS b, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |      AS value_micros
        |  FROM e GROUP BY k, b),
        |r AS (SELECT k, min(b) AS minb, max(b) AS maxb FROM a GROUP BY k),
        |spine AS (
        |  SELECT k, unnest(generate_series(minb, maxb)) AS b FROM r),
        |j AS (
        |  SELECT s.k, s.b, coalesce(a.n_events, 0) AS n_events,
        |    coalesce(a.value_micros, 0) AS value_micros
        |  FROM spine s LEFT JOIN a
        |    ON s.k IS NOT DISTINCT FROM a.k AND s.b = a.b)
        |SELECT k AS event_type, b * 3600000000 AS bucket_us, n_events,
        |  value_micros,
        |  last_value(CASE WHEN n_events > 0 THEN value_micros END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_micros
        |FROM j""".stripMargin,
    // Wilson interval: the identical IEEE expression with z and z*z as
    // shortest-round-trip literals (no distribution function anywhere)
    "q_wilson_ci" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
        |      AS successes
        |  FROM documents GROUP BY source),
        |e AS (
        |  SELECT source, n, successes,
        |    successes::DOUBLE / n::DOUBLE AS p,
        |    n::DOUBLE AS nd
        |  FROM g),
        |f AS (
        |  SELECT source, n, successes, p,
        |    (p + 3.8414588206941254::DOUBLE / (2.0::DOUBLE * nd))
        |      / (1.0::DOUBLE + 3.8414588206941254::DOUBLE / nd) AS center,
        |    (1.959963984540054::DOUBLE * sqrt(p * (1.0::DOUBLE - p) / nd
        |      + 3.8414588206941254::DOUBLE / (4.0::DOUBLE * nd * nd)))
        |      / (1.0::DOUBLE + 3.8414588206941254::DOUBLE / nd) AS half
        |  FROM e)
        |SELECT source, n, successes, round(p, 6) AS rate,
        |  round(greatest(0.0::DOUBLE, center - half), 6) AS ci_low,
        |  round(least(1.0::DOUBLE, center + half), 6) AS ci_high
        |FROM f""".stripMargin,
    // EB shrinkage: micro-LONG moment sums (order-free), beta-binomial
    // MoM prior, portable posterior expression
    "q_shrunken_rates" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
        |      AS successes
        |  FROM documents GROUP BY source),
        |p AS (SELECT source, n, successes,
        |    (successes * 1000000) // n AS pm FROM g),
        |mm AS (
        |  SELECT source, n, successes,
        |    CAST(count(*) OVER () AS BIGINT) AS gcnt,
        |    CAST(sum(pm) OVER () AS BIGINT) AS s1,
        |    CAST(sum(pm * pm) OVER () AS BIGINT) AS s2
        |  FROM p),
        |ab AS (
        |  SELECT source, n, successes,
        |    (s1 / gcnt::DOUBLE / 1e6)
        |      * ((s1 / gcnt::DOUBLE / 1e6)
        |          * (1.0::DOUBLE - s1 / gcnt::DOUBLE / 1e6)
        |          / (s2 / gcnt::DOUBLE / 1e12
        |             - (s1 / gcnt::DOUBLE / 1e6)
        |               * (s1 / gcnt::DOUBLE / 1e6))
        |        - 1.0::DOUBLE) AS alpha,
        |    (1.0::DOUBLE - s1 / gcnt::DOUBLE / 1e6)
        |      * ((s1 / gcnt::DOUBLE / 1e6)
        |          * (1.0::DOUBLE - s1 / gcnt::DOUBLE / 1e6)
        |          / (s2 / gcnt::DOUBLE / 1e12
        |             - (s1 / gcnt::DOUBLE / 1e6)
        |               * (s1 / gcnt::DOUBLE / 1e6))
        |        - 1.0::DOUBLE) AS beta
        |  FROM mm)
        |SELECT source, n, successes,
        |  round(successes::DOUBLE / n, 6) AS rate,
        |  round((successes + alpha) / (n + alpha + beta), 6)
        |    AS shrunk_rate,
        |  round(alpha, 6) AS alpha, round(beta, 6) AS beta
        |FROM ab""".stripMargin,
    // quantile matching: inclusive ranks from prefix sums, ceiling in
    // BIGINT, matched = smallest reference value at rank >= k
    "q_quantile_match" ->
      """WITH ref AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE lang = 'en' GROUP BY 1),
        |refc AS (
        |  SELECT v, CAST(coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c AS BIGINT) AS cum
        |  FROM ref),
        |nrt AS (SELECT CAST(count(*) AS BIGINT) AS nr
        |  FROM documents WHERE lang = 'en'),
        |tgt AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE lang <> 'en' GROUP BY 1),
        |tgtc AS (
        |  SELECT v, c, CAST(coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS nt
        |  FROM tgt),
        |probe AS (
        |  SELECT v AS value, c AS n,
        |    (cum * (SELECT nr FROM nrt) + nt - 1) // nt AS k
        |  FROM tgtc)
        |SELECT value, n,
        |  (SELECT min(r.v) FROM refc r WHERE r.cum >= probe.k) AS matched
        |FROM probe""".stripMargin,
    // Cliff's delta from values-sized prefix sums — exact LONG
    // win/tie/loss totals, two final portable divisions
    "q_cliffs_delta" ->
      """WITH g AS (
        |  SELECT n_chars AS v,
        |    CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS ca,
        |    CAST(count(CASE WHEN NOT (lang = 'en') THEN 1 END) AS BIGINT)
        |      AS cb
        |  FROM documents GROUP BY 1),
        |p AS (
        |  SELECT ca, cb,
        |    coalesce(CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS bb,
        |    coalesce(CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS ab
        |  FROM g),
        |s AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca * bb) AS BIGINT) AS wins,
        |    CAST(sum(ca * cb) AS BIGINT) AS ties,
        |    CAST(sum(cb * ab) AS BIGINT) AS losses
        |  FROM p)
        |SELECT na AS n_a, nb AS n_b, wins, ties, losses,
        |  round((wins - losses)::DOUBLE / (na * nb), 6) AS cliffs_delta,
        |  round((wins::DOUBLE + ties / 2.0) / (na * nb), 6) AS auc
        |FROM s""".stripMargin,
    // CUSUM replay: the max(0, ·) recursion as prefix-sum minus
    // clamped prefix-min, all BIGINT
    "q_cusum" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 1e6) AS BIGINT) AS v_micros
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |p AS (
        |  SELECT event_type, ts_us, v_micros,
        |    CAST(sum(v_micros - 50000000 - 5000000) OVER (
        |      PARTITION BY event_type ORDER BY ts_us, v_micros
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pu,
        |    CAST(sum(50000000 - v_micros - 5000000) OVER (
        |      PARTITION BY event_type ORDER BY ts_us, v_micros
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pd
        |  FROM e),
        |s AS (
        |  SELECT event_type, ts_us, v_micros,
        |    pu - least(CAST(min(pu) OVER (PARTITION BY event_type
        |      ORDER BY ts_us, v_micros ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT), 0) AS cusum_pos,
        |    pd - least(CAST(min(pd) OVER (PARTITION BY event_type
        |      ORDER BY ts_us, v_micros ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT), 0) AS cusum_neg
        |  FROM p)
        |SELECT event_type, ts_us, v_micros, cusum_pos, cusum_neg,
        |  (cusum_pos > 500000000 OR cusum_neg > 500000000) AS alarm
        |FROM s""".stripMargin,
    // Kaplan–Meier replay: risk sets from prefix counts, factors
    // list-collected in time order, survival = left-to-right
    // list_reduce over the i-prefix (identical IEEE sequence to the
    // engine's sorted-array fold)
    "q_kaplan_meier" ->
      """WITH base AS (
        |  SELECT event_type AS k, (event_id % 500) + 1 AS t,
        |    CASE WHEN event_id % 5 = 0 THEN 0 ELSE 1 END AS e
        |  FROM events),
        |tms AS (
        |  SELECT k, t, CAST(sum(e) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY k, t),
        |risk AS (
        |  SELECT k, t, d,
        |    CAST(sum(c) OVER (PARTITION BY k) AS BIGINT)
        |      - coalesce(CAST(sum(c) OVER (PARTITION BY k ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS BIGINT), 0) AS n
        |  FROM tms),
        |ev AS (
        |  SELECT k, t, d, n, 1.0::DOUBLE - d::DOUBLE / n AS f
        |  FROM risk WHERE d > 0),
        |arr AS (
        |  SELECT k,
        |    list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
        |    list(n ORDER BY t) AS ns, list(f ORDER BY t) AS fs
        |  FROM ev GROUP BY k),
        |idx AS (
        |  SELECT k, ts, ds, ns, fs,
        |    unnest(range(1, len(ts) + 1)) AS i
        |  FROM arr)
        |SELECT k AS event_type, ts[CAST(i AS INTEGER)] AS t,
        |  ns[CAST(i AS INTEGER)] AS n_risk,
        |  ds[CAST(i AS INTEGER)] AS n_events,
        |  round(list_reduce(fs[1:CAST(i AS INTEGER)], (a, b) -> a * b), 6)
        |    AS survival
        |FROM idx""".stripMargin,

    // Nelson–Aalen: same risk sets, nano-rounded d/n steps summed as
    // BIGINTs over an inclusive window — order-free, no fold pinning.
    "q_nelson_aalen" ->
      """WITH base AS (
        |  SELECT event_type AS k, (event_id % 500) + 1 AS t,
        |    CASE WHEN event_id % 5 = 0 THEN 0 ELSE 1 END AS e
        |  FROM events),
        |tms AS (
        |  SELECT k, t, CAST(sum(e) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY k, t),
        |risk AS (
        |  SELECT k, t, d,
        |    CAST(sum(c) OVER (PARTITION BY k) AS BIGINT)
        |      - coalesce(CAST(sum(c) OVER (PARTITION BY k ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS BIGINT), 0) AS n
        |  FROM tms),
        |steps AS (
        |  SELECT k, t, d, n,
        |    CASE WHEN d > 0
        |      THEN CAST(round(d::DOUBLE / n * 1e9) AS BIGINT)
        |      ELSE 0 END AS hn
        |  FROM risk),
        |cum AS (
        |  SELECT k, t, d, n,
        |    CAST(sum(hn) OVER (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS hh
        |  FROM steps)
        |SELECT k AS event_type, t, n AS n_risk, d AS n_events,
        |  round(((hh + 500) // 1000)::DOUBLE / 1e6, 6) AS cum_hazard
        |FROM cum WHERE d > 0""".stripMargin,
    // Theil–Sen/Mann–Kendall replay: the identical pair join, slopes
    // as one portable IEEE division each, median as order statistics
    "q_theil_sen" ->
      """WITH e AS (
        |  SELECT event_type AS k, epoch_us(ts) AS t,
        |    CAST(round(value * 1e6) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_id % 97 = 0 AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |p AS (
        |  SELECT a.k, (b.v - a.v)::DOUBLE / (b.t - a.t) AS slope,
        |    CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
        |      AS sgn
        |  FROM e a JOIN e b ON a.k = b.k AND a.t < b.t),
        |r AS (
        |  SELECT k, slope, sgn,
        |    row_number() OVER (PARTITION BY k ORDER BY slope) AS rn,
        |    count(*) OVER (PARTITION BY k) AS cnt
        |  FROM p),
        |n AS (SELECT k, CAST(count(*) AS BIGINT) AS np FROM e GROUP BY k),
        |agg AS (
        |  SELECT k, CAST(max(cnt) AS BIGINT) AS n_pairs,
        |    CAST(sum(sgn) AS BIGINT) AS s_statistic,
        |    min(CASE WHEN rn = (cnt + 1) // 2 THEN slope END) AS lo,
        |    min(CASE WHEN rn = (cnt + 2) // 2 THEN slope END) AS hi
        |  FROM r GROUP BY k)
        |SELECT agg.k AS event_type, n.np AS n_points, n_pairs,
        |  s_statistic,
        |  round(s_statistic::DOUBLE / (np * (np - 1) / 2), 6) AS tau,
        |  (lo + hi) / 2.0 AS slope
        |FROM agg JOIN n ON agg.k = n.k""".stripMargin,
  )
}
