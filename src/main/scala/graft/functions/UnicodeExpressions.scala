package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene for web-crawl text: canonical (NFC) normalization and
  * accent/mark stripping. Crawled text arrives in mixed normalization
  * forms — `é` as one code point or as `e` + combining acute — which
  * silently splits exact-dedup hash keys, vocabulary entries, and shingle
  * sets for byte-identical-looking text. Normalizing BEFORE
  * [[graft.operators.Dedup]] / [[graft.operators.TextAnalysis.buildVocab]]
  * is the standard first step of a corpus pipeline.
  *
  * Spark has no built-in normalization function, so these are native
  * expressions over `java.text.Normalizer`. `CodegenFallback` is
  * deliberate (the [[DeflateSize]] precedent): the work IS the ICU-style
  * char-class scan inside `Normalizer`; both expressions first take an
  * ASCII fast path (one byte scan, no allocation) that short-circuits the
  * overwhelmingly-ASCII common case, so the Janino-vs-interpreted
  * difference is noise against the per-row work.
  *
  * [[StripMarks]] follows utf8proc's STRIPMARK semantics (the engine
  * behavior DuckDB's `strip_accents` exposes, so the oracle can check it
  * exactly): canonically decompose, drop ALL combining marks — categories
  * Mn (non-spacing), Mc (spacing) and Me (enclosing) — then recompose to
  * NFC. Note Mc removal is destructive for Indic scripts (a dependent
  * vowel sign is a mark); that is the documented utf8proc behavior, not
  * an accident of this implementation. Characters without a canonical
  * decomposition (`ø`, `ß`, `Ǆ`) pass through unchanged.
  */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (UnicodeText.isAscii(u)) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** See [[NormalizeNfc]]'s scaladoc for the exact STRIPMARK contract. */
case class StripMarks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_marks"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (UnicodeText.isAscii(u)) u
    else UTF8String.fromString(UnicodeText.stripMarks(u.toString))
  }

  override protected def withNewChildInternal(newChild: Expression): StripMarks =
    copy(child = newChild)
}

private[functions] object UnicodeText {

  /** ASCII bytes are fixed points of NFC and carry no marks — one scan,
    * no String materialization.
    */
  def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  def stripMarks(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      val cp = d.codePointAt(i)
      if (isMark(cp)) hasMark = true
      i += Character.charCount(cp)
    }
    // mark-free after decomposition: recompose and be done (usually the
    // original string itself, e.g. pure CJK / Cyrillic text)
    val kept =
      if (!hasMark) d
      else {
        val b = new java.lang.StringBuilder(d.length)
        var j = 0
        while (j < d.length) {
          val cp = d.codePointAt(j)
          if (!isMark(cp)) b.appendCodePoint(cp)
          j += Character.charCount(cp)
        }
        b.toString
      }
    Normalizer.normalize(kept, Normalizer.Form.NFC)
  }
}

object UnicodeFunctions {

  /** Canonical composition (NFC) of the string; null in, null out. */
  def normalizeNfc(text: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(text)))

  /** Accent/mark stripping with utf8proc STRIPMARK semantics (matches
    * DuckDB `strip_accents`): NFD, drop Mn/Mc/Me, NFC.
    */
  def stripMarks(text: Column): Column =
    GraftSqlBridge.column(StripMarks(GraftSqlBridge.expression(text)))

  /** The normalization for dedup/vocab keys ("école" == "école" ==
    * "ecole"). Exactly [[stripMarks]]: the once-composed chain
    * stripMarks(normalizeNfc(x)) was a redundant pass — stripMarks opens
    * with NFD, and NFD(NFC(x)) == NFD(x) by canonical-normalization
    * idempotence — so the inner NFC could never change the output while
    * costing a normalization scan per row. Kept as a named entry point
    * because "fold for keying" and "strip accents" are different intents
    * with the same implementation.
    */
  def foldMarks(text: Column): Column = stripMarks(text)
}
