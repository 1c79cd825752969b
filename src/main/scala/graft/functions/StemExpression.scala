package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemming algorithm (Porter 1980, "An algorithm for
  * suffix stripping", Program 14(3)) — implemented from the original
  * paper's rule tables (steps 1a–5b, longest-match-wins within a
  * step, measure/vowel/double-consonant/cvc conditions as published).
  *
  * Contract: lowercase ASCII words stem; anything else (mixed case,
  * digits, punctuation, non-ASCII) and words under 3 letters return
  * UNCHANGED — the tokenizer tier lowercases upstream, and stemming a
  * URL or number would corrupt it silently.
  *
  * A standalone object (no companion class) so scalac emits STATIC
  * forwarders that the generated Janino code calls directly.
  */
object PorterStemmer {

  private def isCons(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m of `s`: the number of VC sequences in [C](VC)^m[V]. */
  private def measure(s: CharSequence): Int = {
    val n = s.length
    var m = 0
    var i = 0
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: CharSequence): Boolean = {
    var i = 0
    while (i < s.length) { if (!isCons(s, i)) return true; i += 1 }
    false
  }

  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && isCons(s, n - 3) && !isCons(s, n - 2) && isCons(s, n - 1) && {
      val c = s.charAt(n - 1); c != 'w' && c != 'x' && c != 'y'
    }
  }

  /** Longest-match rule application: find the longest listed suffix of
    * `s`; if found, the step is DECIDED by that rule alone — rewrite
    * when its condition holds on the stem, else leave `s` unchanged
    * (the paper's "longest match wins" semantics).
    */
  private def ruleStep(
      s: String,
      rules: Seq[(String, String)],
      cond: String => Boolean): String = {
    var best: (String, String) = null
    rules.foreach { r =>
      if (s.endsWith(r._1) && (best == null || r._1.length > best._1.length))
        best = r
    }
    if (best == null) s
    else {
      val stem = s.substring(0, s.length - best._1.length)
      if (cond(stem)) stem + best._2 else s
    }
  }

  private val Step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "biliti" -> "ble")

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(w: String): String = {
    if (w.length < 3) return w
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return w
      i += 1
    }
    var s = w
    // step 1a
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ies")) s = s.dropRight(2)
    else if (s.endsWith("ss")) ()
    else if (s.endsWith("s")) s = s.dropRight(1)
    // step 1b
    var didEdIng = false
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s = s.dropRight(1)
    } else if (s.endsWith("ed") && hasVowel(s.dropRight(2))) {
      s = s.dropRight(2); didEdIng = true
    } else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) {
      s = s.dropRight(3); didEdIng = true
    }
    if (didEdIng) {
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s += "e"
      else if (endsDoubleC(s) && !"lsz".contains(s.charAt(s.length - 1)))
        s = s.dropRight(1)
      else if (measure(s) == 1 && endsCvc(s)) s += "e"
    }
    // step 1c
    if (s.endsWith("y") && hasVowel(s.dropRight(1)))
      s = s.dropRight(1) + "i"
    // steps 2-3: condition m(stem) > 0
    s = ruleStep(s, Step2Rules, stem => measure(stem) > 0)
    s = ruleStep(s, Step3Rules, stem => measure(stem) > 0)
    // step 4: delete when m(stem) > 1; ion additionally needs *S or *T
    s = run4(s)
    // step 5a
    if (s.endsWith("e")) {
      val stem = s.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) s = stem
    }
    // step 5b
    if (measure(s) > 1 && endsDoubleC(s) && s.endsWith("l"))
      s = s.dropRight(1)
    s
  }

  private def run4(s: String): String = {
    var best: String = null
    Step4Suffixes.foreach { suf =>
      if (s.endsWith(suf) && (best == null || suf.length > best.length))
        best = suf
    }
    if (best == null) s
    else {
      val stem = s.substring(0, s.length - best.length)
      val ok = measure(stem) > 1 &&
        (best != "ion" || stem.endsWith("s") || stem.endsWith("t"))
      if (ok) stem else s
    }
  }
}

/** Column/SQL face of [[PorterStemmer.stem]] — codegen'd (one static
  * call), null-safe, applied per token. The search tier's stemming
  * switch ([[graft.operators.Search]]) and SQL's `graft_porter_stem`
  * both route here.
  */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_porter_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PorterStemmer.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}

object PorterStem {
  def apply(word: Column): Column =
    GraftSqlBridge.column(PorterStem(GraftSqlBridge.expression(word)))
}
