package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first tokenization of a word (the
  * BERT tokenizer's `WordpieceTokenizer`, Devlin et al. 2019; original
  * algorithm Schuster & Nakajima 2012): starting at the word head, take
  * the LONGEST vocabulary piece matching at the cursor (continuation
  * positions try the `contPrefix`-marked form, e.g. `##able`), advance,
  * repeat. If no piece matches at any position — or the word exceeds
  * `maxInputChars` code points — the WHOLE word becomes `unkToken`
  * (BERT's is-bad semantics: a word either segments completely or not
  * at all, so downstream counts are never half-segmented).
  *
  * Deterministic by construction — longest-match scanning has no ties.
  * Boundaries are CODE POINTS (surrogate pairs never split), matching
  * the Bpe/Unigram symbol discipline.
  *
  * The vocabulary rides in the OPERATOR (the [[BpeApplyMerges]] /
  * [[UnigramViterbi]] discipline): a hash set serialized once with the
  * plan, never a 10⁴-entry literal bloating plan text or codegen.
  * `CodegenFallback` for the same reason — this evaluates over the
  * DISTINCT-word table, never the corpus.
  */
case class WordPieceEncodeExpr(
    child: Expression,
    vocab: Seq[String],
    contPrefix: String,
    unkToken: String,
    maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "WordPiece vocabulary must be non-empty")
  require(maxInputChars >= 1,
    s"maxInputChars must be >= 1, got $maxInputChars")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(p => s.add(p): Unit)
    s
  }
  @transient private lazy val maxPieceCp: Int = {
    // longest piece in CODE POINTS (sans marker) bounds the inner scan
    var m = 1
    vocab.foreach { p =>
      val body = if (p.startsWith(contPrefix) && contPrefix.nonEmpty)
        p.substring(contPrefix.length) else p
      m = math.max(m, body.codePointCount(0, body.length))
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    val nChars = word.length
    // code-point boundaries, the UnigramViterbi layout
    val boundsBuf = new Array[Int](nChars + 1)
    var np = 0
    var ci = 0
    while (ci < nChars) {
      boundsBuf(np) = ci
      ci += Character.charCount(word.codePointAt(ci))
      np += 1
    }
    boundsBuf(np) = nChars
    if (np > maxInputChars)
      return new GenericArrayData(Array[Any](UTF8String.fromString(unkToken)))
    val out = new scala.collection.mutable.ArrayBuffer[String](np)
    var start = 0
    while (start < np) {
      var end = math.min(np, start + maxPieceCp)
      var matched: String = null
      while (matched == null && end > start) {
        val sub0 = word.substring(boundsBuf(start), boundsBuf(end))
        val sub = if (start > 0) contPrefix + sub0 else sub0
        if (vocabSet.contains(sub)) matched = sub else end -= 1
      }
      if (matched == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(unkToken)))
      out += matched
      start = end
    }
    val res = new Array[Any](out.length)
    var r = 0
    while (r < out.length) { res(r) = UTF8String.fromString(out(r)); r += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

object WordPieceEncodeExpr {
  def apply(
      word: Column,
      vocab: Seq[String],
      contPrefix: String,
      unkToken: String,
      maxInputChars: Int): Column =
    GraftSqlBridge.column(new WordPieceEncodeExpr(
      GraftSqlBridge.expression(word), vocab, contPrefix, unkToken,
      maxInputChars))
}
