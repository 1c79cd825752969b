package graft.functions

import java.nio.charset.{CharacterCodingException, CodingErrorAction}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repair UTF-8-decoded-as-windows-1252 mojibake ("ftfy-lite"): the
  * classic crawl corruption where `é` arrives as `Ã©`, `—` as `â€”`,
  * `’` as `â€™` — a page served as UTF-8 but transcoded by something
  * that believed it was cp1252.
  *
  * The byte↔char mapping is the WHATWG windows-1252 table (the one
  * browsers — and therefore real mojibake — actually use), NOT Java's
  * charset: Java maps the five undefined bytes 0x81/0x8D/0x8F/0x90/0x9D
  * to U+FFFD while the web maps them to the C1 controls, and `”`
  * (U+201D, UTF-8 `E2 80 9D`) mangles through 0x9D — with Java's table
  * the round-trip would be lossy and the repair impossible.
  *
  * Algorithm (conservative by construction — a string is only changed
  * when the fix is PROVABLY consistent):
  *  1. the string must show a mojibake marker (`Ã`/`Â`/`â`, the UTF-8
  *     lead bytes 0xC3/0xC2/0xE2 seen as cp1252 chars);
  *  2. every char must map back to a cp1252 byte (else the text was not
  *     cp1252-decoded — abort);
  *  3. the recovered bytes must STRICT-decode as UTF-8 (random Latin-1
  *     prose is not valid UTF-8 — this is what makes the repair
  *     near-false-positive-free);
  *  4. the result must carry strictly fewer markers than the input.
  * Up to `maxPasses` rounds unwind doubly-encoded text. Deterministic,
  * engine-independent (the table below is normative), no shuffle.
  */
case class FixMojibake(child: Expression, maxPasses: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxPasses >= 1 && maxPasses <= 4,
    s"maxPasses must be in 1..4, got $maxPasses")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var pass = 0
    var changed = true
    while (pass < maxPasses && changed) {
      changed = false
      val fixed = FixMojibake.repairOnce(s)
      if (fixed != null) { s = fixed; changed = true }
      pass += 1
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  /** WHATWG windows-1252: Latin-1 identity except 0x80–0x9F, where the
    * cp1252 punctuation block lives and the five undefined bytes map to
    * their C1 controls.
    */
  private val ByteToChar: Array[Char] = {
    val t = Array.tabulate[Char](256)(_.toChar)
    val m = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    m.foreach { case (b, c) => t(b) = c.toChar }
    t
  }

  private val CharToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var i = 0
    while (i < 256) { m.put(ByteToChar(i), i.toByte); i += 1 }
    m
  }

  /** Decode bytes as WHATWG windows-1252 (total — every byte maps). */
  private[functions] def decodeCp1252(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Encode via the same table; null when any char has no cp1252 byte. */
  private[functions] def encodeCp1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = CharToByte.get(s.charAt(i))
      if (b == null) return null
      out(i) = b
      i += 1
    }
    out
  }

  private[functions] def markerCount(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 'Ã' || c == 'Â' || c == 'â') n += 1
      i += 1
    }
    n
  }

  /** One repair pass; null when the input is not provably mojibake. */
  private[functions] def repairOnce(s: String): String = {
    val markers = markerCount(s)
    if (markers == 0) return null
    val bytes = encodeCp1252(s)
    if (bytes == null) return null
    val decoded =
      try {
        val dec = UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      } catch { case _: CharacterCodingException => return null }
    if (markerCount(decoded) < markers) decoded else null
  }
}

object MojibakeFunctions {

  /** Repair cp1252-mangled UTF-8 (see [[FixMojibake]]); untouched text
    * passes through unchanged.
    */
  def fixMojibake(text: Column, maxPasses: Int = 2): Column =
    GraftSqlBridge.column(FixMojibake(GraftSqlBridge.expression(text), maxPasses))

  /** Driver-side corruption twin of the repair — UTF-8 bytes re-read
    * through the WHATWG windows-1252 table. For building fixtures and
    * planted-oracle corpora; `fixMojibake` inverts it for any string
    * whose mangled form round-trips (it does for all of Unicode).
    */
  def cp1252Mangled(s: String): String =
    FixMojibake.decodeCp1252(s.getBytes(UTF_8))
}
