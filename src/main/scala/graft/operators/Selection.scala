package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by hashed n-gram importance resampling (DSIR-style:
  * Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169).
  *
  * Beyond-reference. Given a huge RAW corpus and a small TARGET corpus
  * that exemplifies the distribution you want (a reference Wikipedia dump,
  * an in-domain eval set, an underrepresented language), score every raw
  * document by how much more likely its hashed n-gram features are under
  * the target distribution than under the raw distribution, then keep the
  * top-k. This is the published, scale-proven alternative to training a
  * quality classifier: two counting passes and a broadcast join.
  *
  * Determinism contract (same discipline as [[Sampling.hashBucket]]):
  * features hash through sha256 so any engine reproduces the buckets, and
  * the per-bucket log-ratio is rounded ONCE to integer log-micros so the
  * per-document score is an exact BIGINT sum — no float accumulation
  * order anywhere in the hot path, which is what lets the DuckDB oracle
  * hash-match the result (`q_importance_weights`).
  *
  * Scale shape (100 TB raw corpus):
  *  - the two distribution passes explode to token level but aggregate
  *    into at most `buckets` cells with map-side partial aggregation, so
  *    the shuffle is bounded by `buckets`, not the corpus;
  *  - the log-ratio table is ≤ `buckets` rows and broadcast;
  *  - per-document scoring is one shuffle (partial sums by id);
  *  - top-k select is a TakeOrdered, never a full sort.
  * The raw corpus is scanned twice (distribution + scoring) — inherent to
  * the method; persist upstream if the scan itself is the bottleneck.
  */
object Selection {

  /** Stable feature bucket for one term: first 7 hex chars of
    * sha256(lower(term):salt) mod `buckets`. Mirrors the oracle SQL
    * idiom exactly (see `q_importance_weights`).
    */
  private def termBucket(term: Column, salt: String, buckets: Int): Column =
    graft.functions.Hashing.hexPrefixBucket(lower(term), salt, buckets)

  /** Word n-gram features of `text`: whitespace unigrams, plus
    * space-joined bigrams when `maxNgram` = 2 (the DSIR paper's feature
    * set). Narrow, expression-only.
    */
  private[operators] def terms(text: Column, maxNgram: Int): Column = {
    require(maxNgram == 1 || maxNgram == 2, s"maxNgram must be 1 or 2, got $maxNgram")
    val toks = TextAnalysis.tokens(text)
    if (maxNgram == 1) toks
    else {
      val m = greatest(size(toks) - 1, lit(0))
      val bigrams = zip_with(
        slice(toks, lit(1), m), slice(toks, lit(2), m),
        (a, b) => concat(a, lit(" "), b))
      concat(toks, bigrams)
    }
  }

  /** Hashed-feature distribution of a corpus: (bucket, cnt), ≤ `buckets`
    * rows. Token-level explode, but the aggregation is map-side combined
    * into the bounded bucket space before any shuffle.
    */
  private def bucketCounts(
      df: DataFrame, textCol: String, buckets: Int, salt: String,
      maxNgram: Int): DataFrame =
    df.select(explode(terms(col(textCol), maxNgram)).as("__term"))
      .select(termBucket(col("__term"), salt, buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket importance weight in integer log-micros:
    * round(1e6 · ln(p_target(b) / p_raw(b))) with add-one smoothing over
    * the `buckets`-cell space. One small table (≤ `buckets` rows); the
    * totals ride along as a 1-row broadcast scalar. The expression is
    * written in the exact association the oracle uses so both engines
    * compute bit-identical doubles before the single rounding.
    */
  def bucketLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      salt: String = "graft",
      maxNgram: Int = 1): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val cr = bucketCounts(raw, textCol, buckets, salt, maxNgram)
      .withColumnRenamed("cnt", "c_r")
    val ct = bucketCounts(target, textCol, buckets, salt, maxNgram)
      .withColumnRenamed("cnt", "c_t")
    val joined = cr.join(ct, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_r"), lit(0L)).as("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
    val totals = joined.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    val b = lit(buckets.toDouble)
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(lit(1000000.0) *
          ((log(col("c_t") + lit(1.0)) - log(col("n_t") + b)
            - log(col("c_r") + lit(1.0))) + log(col("n_r") + b)))
          .cast("long").as("w"))
  }

  /** Importance weight of every raw document: the exact BIGINT sum of its
    * term buckets' log-micro ratios (each occurrence counts, as in the
    * paper's product of per-feature ratios). Documents with no tokens
    * weigh 0. Output: (idCol, weight).
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096,
      salt: String = "graft",
      maxNgram: Int = 1): DataFrame = {
    val ratios = bucketLogRatios(raw, target, textCol, buckets, salt, maxNgram)
    val docBuckets = raw
      .select(col(idCol), explode(terms(col(textCol), maxNgram)).as("__term"))
      .select(col(idCol), termBucket(col("__term"), salt, buckets).as("bucket"))
    // every raw bucket is in `ratios` by construction → inner join is total
    val summed = docBuckets.join(broadcast(ratios), Seq("bucket"))
      .groupBy(idCol).agg(sum("w").as("weight"))
    raw.select(col(idCol)).join(summed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("weight"), lit(0L)).as("weight"))
  }

  /** Per-group quantile bands over a score column — the CCNet bucketing
    * step (Wenzek et al. 2020, arXiv:1911.00359): score every document
    * with a reference-corpus LM ([[TextAnalysis.lmQualityScore]]), then
    * split each language into head/middle/tail perplexity thirds and
    * sample the mixture downstream (head-heavy for quality, tail kept for
    * coverage).
    *
    * Adds `<outCol>` (ntile index, 1-based) and `<outCol>_label` (from
    * `labels`, sized `buckets`). Ordering is (scoreCol asc, tieBreakCols)
    * — pass a unique tie-break (the doc id) so bucket membership is
    * deterministic under equal scores. Rows with a NULL score get bucket
    * NULL/label NULL (unscorable ≠ worst; filter or coalesce downstream).
    *
    * Scale shape: one window shuffle partitioned by `groupCols` — at
    * 100 TB the groups (languages) must be the partition key; calling
    * with `groupCols = Nil` computes a GLOBAL ntile on a single partition
    * and is rejected above [[MaxUngroupedBucketRows]] rows (count-guarded)
    * rather than silently funneling a corpus through one task.
    */
  /** Percentile rank of `scoreCol` within each group — SQL
    * `percent_rank` semantics (`(rank − 1)/(n − 1)`, ties share a
    * value, single-row groups score 0): the calibration step before
    * MIXING heterogeneous quality signals (a perplexity and a
    * classifier logit live on incomparable scales; their per-language
    * percentile ranks do not). Null scores fail LOUD in-row — under
    * engine-specific null ordering they would land at opposite ends of
    * the ranking. One group-keyed window exchange; group the corpus
    * (per language/source) so no window funnels everything.
    */
  def percentileRank(
      df: DataFrame,
      scoreCol: String,
      groupCols: Seq[String],
      outCol: String = "pct"): DataFrame = {
    require(groupCols.nonEmpty,
      "groupCols must be non-empty: an ungrouped percent_rank funnels the " +
        "corpus through one partition; pass a bounded grouping")
    val checked = when(col(scoreCol).isNotNull, col(scoreCol))
      .otherwise(raise_error(lit(
        s"percentileRank: `$scoreCol` must be non-null — null order is " +
          "engine-specific")).cast(df.schema(scoreCol).dataType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(checked)
    df.withColumn(outCol, round(percent_rank().over(w), 6))
  }

  def quantileBuckets(
      df: DataFrame,
      scoreCol: String,
      tieBreakCols: Seq[String],
      groupCols: Seq[String] = Nil,
      buckets: Int = 3,
      labels: Seq[String] = Seq("head", "middle", "tail"),
      outCol: String = "bucket"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(labels.isEmpty || labels.length == buckets,
      s"labels must be empty or size $buckets, got ${labels.length}")
    require(tieBreakCols.nonEmpty,
      "tieBreakCols must include a unique key (e.g. the doc id) — equal " +
        "scores would otherwise land in engine-dependent buckets")
    if (groupCols.isEmpty) {
      val n = df.count()
      require(n <= MaxUngroupedBucketRows,
        s"quantileBuckets without groupCols funnels all $n rows through " +
          s"one window partition (> $MaxUngroupedBucketRows); pass " +
          "groupCols or pre-aggregate")
    }
    val w0 = if (groupCols.isEmpty)
      org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    else org.apache.spark.sql.expressions.Window.partitionBy(
      groupCols.map(col): _*)
    val w = w0.orderBy(col(scoreCol).asc +: tieBreakCols.map(col(_).asc): _*)
    // NULL-scored rows are excluded from the window entirely: masking them
    // after ntile would still let them occupy tile slots (shifting every
    // real row's band), and engines disagree on NULL sort order anyway
    val scored = df.where(col(scoreCol).isNotNull)
      .withColumn(outCol, ntile(buckets).over(w))
    val unscored = df.where(col(scoreCol).isNull)
      .withColumn(outCol, lit(null).cast("int"))
    if (labels.isEmpty) scored.unionByName(unscored)
    else {
      // label per branch: ntile is never null, so element_at sees only a
      // valid 1-based index (feeding it the unscored branch's null index
      // trips a codegen nullability bug in ConvertToLocalRelation)
      val labelCol = s"${outCol}_label"
      scored.withColumn(labelCol,
        element_at(array(labels.map(lit): _*), col(outCol)))
        .unionByName(unscored.withColumn(labelCol, lit(null).cast("string")))
    }
  }

  /** Ungrouped [[quantileBuckets]] ceiling — one window partition must
    * stay a bounded driver-adjacent task, never a corpus funnel.
    */
  val MaxUngroupedBucketRows: Long = 10L * 1000 * 1000

  /** Keep the `k` raw documents whose hashed-feature distribution is most
    * target-like: top-k by (weight desc, id asc) — deterministic, and a
    * TakeOrdered at scale, never a global sort materialization.
    */
  def importanceResample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 4096,
      salt: String = "graft",
      maxNgram: Int = 1): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val wts = importanceWeights(raw, target, idCol, textCol, buckets, salt, maxNgram)
    raw.join(wts, Seq(idCol))
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(k)
  }

  /** Confident-learning label-error detection (Northcutt, Jiang & Chuang
    * 2021, "Confident Learning: Estimating Uncertainty in Dataset
    * Labels", JAIR 70) — the data-centric cleaning step for labeled
    * training corpora: given each example's NOISY label and a model's
    * per-class predicted probabilities (e.g. [[Classifier.scoreLogit]]
    * out-of-fold scores), find the examples whose prediction
    * CONFIDENTLY disagrees with their given label.
    *
    * The method: per-class confidence threshold `t_j` = mean predicted
    * probability of class j over examples GIVEN label j; an example
    * counts as confidently-class-j when `p_j ≥ t_j`; its confident
    * label is the argmax-probability class among those it qualifies
    * for. Off-diagonal examples (confident ≠ given) are the label-error
    * candidates; the (given, confident) count matrix ([[confidentJoint]])
    * estimates the label-noise transition structure.
    *
    * Engine-exact discipline: probabilities quantize ONCE to floor
    * micro-units, and the threshold test `p_j ≥ sum_j / count_j` is the
    * INTEGER cross-multiplication `p_micros · count_j ≥ sum_micros_j` —
    * no float division, no mean round-off, so a SQL oracle reproduces
    * the flag set bit-for-bit (exact through count_j < 9.2e12 — beyond
    * any labeled corpus). Argmax ties break by class name ascending.
    *
    * Scale shape: one explode to (example × class) rows — the class
    * count is small and fixed — one class-sized threshold aggregate
    * (broadcast back), one filter, one per-example min-struct argmax
    * (hash aggregate, map-side partials; no window, no skew pin).
    *
    * Returns `(idCol, given_label, confident_label, confident_micros,
    * self_micros, flagged)`: every example that qualified for at least
    * one class, its argmax confident class, that class's quantized
    * probability, the given class's quantized probability, and whether
    * they disagree. Examples qualifying for NO class are omitted (the
    * paper's pruning — the model is not confident enough anywhere to
    * accuse the label). A given label outside `classProbs` is a loud
    * error: its rows would silently skew every threshold. The REVERSE
    * direction is cleanlab's own semantics, not an error: a class
    * listed in `classProbs` but absent from the given labels has no
    * examples to average, hence NO threshold `t_j` — its rows drop at
    * the threshold join, so it can never be qualified for and never
    * becomes a `confident_label`. Supply hand thresholds upstream (or
    * plant one labeled example) if an unseen class must be reachable.
    */
  def labelErrors(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      classProbs: Seq[(String, String)]): DataFrame = {
    require(classProbs.size >= 2,
      s"classProbs needs >= 2 (class, probColumn) entries, got ${classProbs.size}")
    require(classProbs.map(_._1).distinct.size == classProbs.size,
      "classProbs has duplicate class values")
    val classes = classProbs.map(_._1).toSet
    val strayLabels = df.select(col(labelCol).cast("string").as("__g"))
      .where(col("__g").isNotNull).distinct()
      .collect().map(_.getString(0)).filterNot(classes)
    require(strayLabels.isEmpty,
      s"labelErrors: given labels ${strayLabels.toSeq.sorted.mkString(", ")} " +
        "have no probability column — every class in the label column " +
        "must appear in classProbs (thresholds would silently skew)")
    val longDf = df.select(col(idCol),
      col(labelCol).cast("string").as("__given"),
      explode(array(classProbs.map { case (cls, pc) =>
        struct(lit(cls).as("cls"),
          floor(col(pc) * 1e6).cast("long").as("p"))
      }: _*)).as("__e"))
      .select(col(idCol), col("__given"),
        col("__e.cls").as("__cls"), col("__e.p").as("__p"))
    val thr = longDf.where(col("__given") === col("__cls"))
      .groupBy("__cls")
      .agg(sum(col("__p")).as("__tsum"), count(lit(1)).as("__tcnt"))
    longDf
      .join(broadcast(thr), Seq("__cls"))
      .withColumn("__q", col("__p") * col("__tcnt") >= col("__tsum"))
      .groupBy(col(idCol), col("__given"))
      .agg(
        // min-struct over QUALIFYING classes only (nulls skipped):
        // argmax p, ties to the lexically smallest class
        min(when(col("__q"),
          struct((-col("__p")).as("np"), col("__cls").as("cls")))).as("__m"),
        // self-confidence from the UNfiltered rows — the given class's
        // probability whether or not it qualified
        max(when(col("__cls") === col("__given"), col("__p"))).as("__selfq"))
      .where(col("__m").isNotNull)
      .select(col(idCol), col("__given").as("given_label"),
        col("__m.cls").as("confident_label"),
        (-col("__m.np")).as("confident_micros"),
        col("__selfq").as("self_micros"),
        (col("__m.cls") =!= col("__given")).as("flagged"))
  }

  /** The confident joint of [[labelErrors]]: `(given_label,
    * confident_label, n)` — the estimated label-noise co-occurrence
    * matrix (class-count-sized; its off-diagonal mass is the estimated
    * error rate per (true, noisy) pair).
    */
  def confidentJoint(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      classProbs: Seq[(String, String)]): DataFrame =
    labelErrors(df, idCol, labelCol, classProbs)
      .groupBy("given_label", "confident_label")
      .agg(count(lit(1)).as("n"))

  /** Max-margin preference-pair construction for DPO/RLHF post-training
    * data (Rafailov et al. 2023 consumes exactly this shape): per group
    * (a prompt, a query, a task), pair the TOP-scored candidate
    * (chosen) with the BOTTOM-scored one (rejected), gated on a
    * minimum score margin — pairs below the margin carry more label
    * noise than signal (score ties produce NO pair: both ranks land on
    * the same row and self-pairs drop, which is the correct reading of
    * "no preference").
    *
    * Determinism: integral micro scores BY CONTRACT (the scoreLogit /
    * calibrate convention — double scores are not engine-portable
    * through a rank), rank ties break on id, so the chosen/rejected
    * assignment is total and the DuckDB twin hash-matches.
    *
    * Scale shape: two `row_number` windows partitioned by group with
    * rank = 1 filters (Spark 3.5+ WindowGroupLimit keeps only the
    * per-group top row BEFORE the exchange), one group-keyed join.
    * NULL ids/scores are refused loudly; NULL-group rows drop (the
    * equality-join convention). Output: `(group, chosen_id,
    * rejected_id, chosen_score, rejected_score, margin)`, margin ≥
    * `minMarginMicros`.
    */
  def preferencePairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      minMarginMicros: Long = 0L): DataFrame = {
    require(minMarginMicros >= 0L,
      s"minMarginMicros must be >= 0, got $minMarginMicros")
    df.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"preferencePairs: `$scoreCol` is $other — scores must be " +
          "INTEGRAL micros (quantize upstream; double scores are not " +
          "engine-portable through a rank)")
    }
    val bad = df.agg(count(when(col(idCol).isNull || col(scoreCol).isNull,
      1)).as("__nl")).head().getAs[Long]("__nl")
    require(bad == 0L,
      s"preferencePairs: $bad NULL id/score row(s) — filter upstream")
    val keyed = df.where(col(groupCol).isNotNull)
      .select(col(groupCol), col(idCol), col(scoreCol).cast("long")
        .as("__s"))
    val w = org.apache.spark.sql.expressions.Window
    val top = keyed.withColumn("__r", row_number().over(
        w.partitionBy(col(groupCol))
          .orderBy(col("__s").desc, col(idCol).asc)))
      .where(col("__r") === 1)
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col("__s").as("chosen_score"))
    val bot = keyed.withColumn("__r", row_number().over(
        w.partitionBy(col(groupCol))
          .orderBy(col("__s").asc, col(idCol).asc)))
      .where(col("__r") === 1)
      .select(col(groupCol), col(idCol).as("rejected_id"),
        col("__s").as("rejected_score"))
    top.join(bot, Seq(groupCol))
      // a single-candidate group (or an all-tied one) self-pairs: no
      // preference signal, drop
      .where(col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .where(col("margin") >= minMarginMicros)
  }
}
