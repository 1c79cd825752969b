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

  // mojibake happens through the WHATWG windows-1252 decode (browsers'
  // table, total over all 256 bytes) — Java's charset would lose 0x9D
  private def mangle(s: String): String =
    FixMojibake.decodeCp1252(s.getBytes("UTF-8"))

  test("fixMojibake unwinds cp1252-mangled UTF-8, including double encoding") {
    val originals = Seq("Café — déjà vu", "naïve “quotes” …", "日本語 mixed — ok")
    val rows = originals.map(o => (o, mangle(o))) ++
      originals.take(1).map(o => (o, mangle(mangle(o)))) // double-encoded
    val out = rows.toDF("want", "broken")
      .select(col("want"),
        MojibakeFunctions.fixMojibake(col("broken")).as("got"))
      .as[(String, String)].collect()
    out.foreach { case (want, got) => assert(got == want, s"$got != $want") }
  }

  test("fixMojibake never touches text that is not provably mojibake") {
    val untouched = Seq(
      "plain ascii text.",
      "proper unicode: é — ü ☃",
      "SÃO PAULO em maiúsculas",   // genuine Ã: cp1252 bytes are NOT valid UTF-8
      "â alone before 日本",        // marker but unmappable to cp1252
      "")
    val out = untouched.toDF("t")
      .select(col("t"), MojibakeFunctions.fixMojibake(col("t")).as("got"))
      .as[(String, String)].collect()
    out.foreach { case (t, got) => assert(got == t, s"changed: $t -> $got") }
    // null flows through
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(MojibakeFunctions.fixMojibake(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
