package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage / entity resolution over structured
  * rows — the classic Fellegi–Sunter (1969) match-weight model, the
  * workhorse behind deduplicating customer/author/business registries
  * before they feed a pipeline (the structured-record sibling of the
  * text tier's MinHash family: there the signal is content overlap,
  * here it is field-level agreement patterns).
  *
  * Candidate pairs come from equality BLOCKING (the standard scale
  * device: only rows sharing every block key are compared, so the
  * quadratic explosion is per-block, not global); each compare field
  * then contributes its agreement weight `log2(m/u)` when the two rows
  * agree (null-safely) and its disagreement weight
  * `log2((1−m)/(1−u))` when they do not, where `m` = P(agree | same
  * entity) and `u` = P(agree | different entities). The pair score is
  * the sum — the log-likelihood ratio of the match hypothesis under
  * field independence. m/u are caller-supplied (estimated offline via
  * EM or domain knowledge — this operator is the scoring engine, not
  * the fit).
  *
  * Engine-exact: the weights are computed ONCE driver-side (`log2`
  * has no cross-libm guarantee — the [[RankEval]] discount
  * discipline), QUANTIZED to integer micro-bits, and embedded as LONG
  * literals; agreement is codegen'd null-safe equality and the score
  * is an integer sum — no floating rounding anywhere, so a SQL oracle
  * reproduces it bit-for-bit (a double sum + `round(_, 6)` was
  * measured to split on a decimal-vs-binary half-way boundary between
  * engines).
  *
  * Scale shape: one self-join shuffling on the block keys (choose keys
  * selective enough that a block fits a task — a mega-block is the
  * caller's skew to salt or sub-block; the join itself is
  * AQE-skew-splittable), per-pair work is a handful of codegen'd
  * comparisons, and the output is threshold-filtered. Rows with a NULL
  * block key never pair (equality blocking drops them — the SQL
  * convention on both engines).
  */
object Linkage {

  /** One compare field with its conditional agreement probabilities:
    * `m` = P(fields agree | records match), `u` = P(fields agree |
    * records differ). `m > u` (an informative field), both in (0, 1).
    */
  final case class FieldWeight(column: String, m: Double, u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0,
      s"m and u must be in (0, 1), got m=$m u=$u for `$column`")
    require(m > u,
      s"m must exceed u (an agreeing field must favor the match " +
        s"hypothesis), got m=$m <= u=$u for `$column`")
    /** log2(m/u), the agreement weight. */
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    /** log2((1-m)/(1-u)), the disagreement weight (negative). */
    def disagreeWeight: Double = math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
    /** The weights in integer micro-bits — what the score sums. */
    def agreeMicros: Long = math.round(agreeWeight * 1e6)
    def disagreeMicros: Long = math.round(disagreeWeight * 1e6)
  }

  /** Score every blocked candidate pair; keep pairs with
    * `score_micros >= threshold × 1e6`. Output:
    * `(id_a, id_b, n_agree, score_micros)` with `id_a < id_b` and the
    * log-likelihood-ratio score in integer micro-bits.
    */
  def scorePairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldWeight],
      threshold: Double = 0.0): DataFrame = {
    require(blockCols.nonEmpty,
      "blockCols must be non-empty — unblocked linkage is a global " +
        "cartesian product; block on something (and salt/sub-block hot keys)")
    require(fields.nonEmpty, "fields must be non-empty")
    val allCols = (Seq(idCol) ++ blockCols ++ fields.map(_.column)).distinct
    val left = df.select(allCols.map(c => col(c).as(s"${c}_a")): _*)
    val right = df.select(allCols.map(c => col(c).as(s"${c}_b")): _*)
    val joined = left.join(right,
      blockCols.map(c => col(s"${c}_a") === col(s"${c}_b"))
        .reduce(_ && _) &&
        col(s"${idCol}_a") < col(s"${idCol}_b"))
    // integer sum of per-field micro-bit literals — order-free and
    // rounding-free, so any engine agrees term-for-term
    val agrees = fields.map(f =>
      col(s"${f.column}_a") <=> col(s"${f.column}_b"))
    val score = fields.zip(agrees).map { case (f, a) =>
      when(a, lit(f.agreeMicros)).otherwise(lit(f.disagreeMicros))
    }.reduce(_ + _)
    val nAgree = agrees.map(a => when(a, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    joined
      .withColumn("score_micros", score)
      .withColumn("n_agree", nAgree)
      .where(col("score_micros") >= lit(math.round(threshold * 1e6)))
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"),
        col("n_agree"), col("score_micros"))
  }
}
