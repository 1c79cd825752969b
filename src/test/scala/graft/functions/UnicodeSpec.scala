package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UnicodeSpec extends SparkTestBase {
  import spark.implicits._

  private def fold(s: String): (String, String) = {
    val r = Seq(Tuple1(s)).toDF("t").select(
      UnicodeFunctions.normalizeNfc(col("t")).as("nfc"),
      UnicodeFunctions.foldMarks(col("t")).as("folded")).head()
    (r.getString(0), r.getString(1))
  }

  test("NFC composes decomposed sequences and is identity on composed text") {
    // e + COMBINING ACUTE -> precomposed \u00E9
    assert(fold("cafe\u0301")._1 == "caf\u00E9")
    assert(fold("caf\u00E9")._1 == "caf\u00E9")
    // Hangul jamo recompose to the syllable
    assert(fold("\u1100\u1161")._1 == "\uAC00")
    // ASCII fast path is an exact identity
    assert(fold("plain ascii text!")._1 == "plain ascii text!")
  }

  test("foldMarks strips Mn, Mc and Me marks (utf8proc STRIPMARK semantics)") {
    assert(fold("\u00E9cole")._2 == "ecole") // Mn via decomposition
    assert(fold("cafe\u0301")._2 == "cafe") // already-decomposed Mn
    assert(fold("\u00F1and\u00FA")._2 == "nandu")
    // Devanagari dependent vowel (Mc) is stripped - documented utf8proc
    // behavior, destructive for Indic scripts by design
    assert(fold("\u0915\u0940")._2 == "\u0915")
    // enclosing mark (Me)
    assert(fold("a\u20DD")._2 == "a")
    // no canonical decomposition -> untouched
    assert(fold("\u00F8")._2 == "\u00F8") // o-slash
    assert(fold("stra\u00DFe")._2 == "stra\u00DFe") // sharp s
    assert(fold("\uFB01sh")._2 == "\uFB01sh") // fi ligature (compat-only)
    // U+1E9B decomposes to long-s + dot above; the dot is stripped
    assert(fold("\u1E9B")._2 == "\u017F")
  }

  test("null and empty flow through") {
    val r = Seq(Tuple1(null.asInstanceOf[String]), Tuple1("")).toDF("t")
      .select(UnicodeFunctions.foldMarks(col("t")).as("f"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq(null, ""))
  }
}
