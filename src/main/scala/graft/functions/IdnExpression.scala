package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Punycode (RFC 3492 via IDNA, RFC 3490) encoding of an
  * internationalized hostname — `münchen.de` → `xn--mnchen-3ya.de`.
  * DNS, robots fetching and dedup-by-host all operate on the ASCII
  * form, while crawled hrefs and sitemaps routinely carry the Unicode
  * form: canonicalize BEFORE keying anything by host or the same site
  * splits in two.
  *
  * Per-label processing via the JDK's `java.net.IDN` (the RFC
  * implementation every engine can reproduce), `ALLOW_UNASSIGNED` so
  * post-2003 scripts survive. Labels that IDNA rejects outright
  * (illegal length/characters) pass through UNCHANGED rather than
  * nulling the whole host — a quarantine-able oddity, not silent data
  * loss; already-ASCII hosts are returned byte-identical.
  * `CodegenFallback` ([[DeflateSize]] discipline): the work is the IDNA
  * library call.
  */
case class PunycodeHost(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_punycode_host"

  override def nullSafeEval(input: Any): Any = {
    val host = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(PunycodeHost.encode(host))
  }

  override protected def withNewChildInternal(newChild: Expression): PunycodeHost =
    copy(child = newChild)
}

object PunycodeHost {
  private[functions] def encode(host: String): String =
    host.split('.').map { label =>
      if (label.forall(_ < 0x80)) label // ASCII label: byte-identical
      else
        try java.net.IDN.toASCII(label, java.net.IDN.ALLOW_UNASSIGNED)
        catch { case _: IllegalArgumentException => label }
    }.mkString(".")
}

object IdnFunctions {

  /** ASCII (punycode) form of a lowercased hostname column. */
  def punycodeHost(host: Column): Column =
    GraftSqlBridge.column(PunycodeHost(GraftSqlBridge.expression(host)))
}
