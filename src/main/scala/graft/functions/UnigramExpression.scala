package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi-best segmentation of a word under a unigram piece model
  * (Kudo 2018's SentencePiece decoding): maximize the sum of piece
  * log-probabilities over all segmentations, DP over code-point
  * boundaries with piece length capped at `maxPieceLen`. Any single
  * code point absent from the model falls back to `unkScore`, so every
  * word is segmentable (the coverage guarantee SentencePiece gets from
  * always retaining characters).
  *
  * Ties take the SMALLEST split start — i.e. the longest piece —
  * scanned deterministically, so two engines/partitionings agree.
  *
  * The piece table rides in the OPERATOR (the [[BpeApplyMerges]]
  * discipline): a vocab-sized map serialized once with the plan, never
  * a 10⁴-entry literal bloating codegen. `CodegenFallback` for the
  * same reason — this runs over the DISTINCT-word table, never the
  * corpus.
  */
case class UnigramViterbi(
    child: Expression,
    pieces: Seq[(String, Double)],
    maxPieceLen: Int,
    unkScore: Double)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_viterbi"

  @transient private lazy val scoreOf: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    // code-point boundaries: bounds(k) = UTF-16 index of code point k
    val nChars = word.length
    val boundsBuf = new Array[Int](nChars + 1)
    var np = 0
    var ci = 0
    while (ci < nChars) {
      boundsBuf(np) = ci
      ci += Character.charCount(word.codePointAt(ci))
      np += 1
    }
    boundsBuf(np) = nChars
    val best = new Array[Double](np + 1)
    val back = new Array[Int](np + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= np) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val sub = word.substring(boundsBuf(j), boundsBuf(i))
          val s = scoreOf.get(sub)
          val sc: Double =
            if (s != null) s.doubleValue()
            else if (i - j == 1) unkScore
            else Double.NaN
          if (!sc.isNaN) {
            val cand = best(j) + sc
            // strict > with ascending j keeps the smallest j on ties —
            // the longest piece wins deterministically
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // single-char unk fallback guarantees reachability
    val out = new scala.collection.mutable.ArrayBuffer[String](np)
    var k = np
    while (k > 0) {
      val j = back(k)
      out += word.substring(boundsBuf(j), boundsBuf(k))
      k = j
    }
    val res = new Array[Any](out.length)
    var r = 0
    val last = out.length - 1
    while (r < out.length) {
      res(r) = UTF8String.fromString(out(last - r)); r += 1
    }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  def apply(
      word: Column,
      pieces: Seq[(String, Double)],
      maxPieceLen: Int,
      unkScore: Double): Column =
    GraftSqlBridge.column(new UnigramViterbi(
      GraftSqlBridge.expression(word), pieces, maxPieceLen, unkScore))
}
