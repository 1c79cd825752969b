package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for graft's custom Catalyst expressions: every scalar the
  * Scala API exposes as a Column is also a named SQL function, so a
  * `spark.sql(…)` / JDBC / notebook-SQL user gets the same codegen'd
  * implementations with zero Scala.
  *
  * Two registration paths, one function list:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.sql.GraftExtensions`
  *    (the [[org.apache.spark.sql.SparkSessionExtensions]] hook — applies
  *    to every session of the context);
  *  - per-session: [[GraftFunctions.register]] on a live session (what
  *    [[graft.core.Sessions]]' factory does).
  *
  * Literal parameters (prefix lengths, deflate level, chunk bounds …)
  * must be foldable int/long literals — anything else fails loudly at
  * analysis with the function's usage string, not at runtime.
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case Literal(v: Long, org.apache.spark.sql.types.LongType)
        if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String, fn: String): Long = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    require(ns.contains(args.length),
      s"$fn expects ${ns.mkString(" or ")} argument(s), got ${args.length}")

  /** (name, usage, builder) for every exposed function — ONE list feeds
    * both registration paths.
    */
  val functions: Seq[(String, String, FunctionBuilder)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - order-stable dot product of two double arrays",
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProduct(args(0), args(1))
      }),
    ("graft_sumsq",
      "graft_sumsq(a) - squared L2 norm of a double array",
      (args: Seq[Expression]) => {
        arity("graft_sumsq", args, 1); SumSquares(args(0))
      }),
    ("graft_hex_prefix",
      "graft_hex_prefix(hex, len) - first len hex chars as BIGINT",
      (args: Seq[Expression]) => {
        arity("graft_hex_prefix", args, 2)
        HexPrefixToLong(args(0),
          litInt(args(1), "len", "graft_hex_prefix"))
      }),
    ("graft_srp",
      "graft_srp(vec, outDim[, salt]) - deterministic ±1 random projection",
      (args: Seq[Expression]) => {
        arity("graft_srp", args, 2, 3)
        SrpProject(args(0), litInt(args(1), "outDim", "graft_srp"),
          if (args.length == 3) litLong(args(2), "salt", "graft_srp") else 0L)
      }),
    ("graft_deflate_size",
      "graft_deflate_size(text[, level]) - DEFLATE-compressed byte count",
      (args: Seq[Expression]) => {
        arity("graft_deflate_size", args, 1, 2)
        DeflateSize(args(0),
          if (args.length == 2) litInt(args(1), "level", "graft_deflate_size")
          else 6)
      }),
    ("graft_gear_chunks",
      "graft_gear_chunks(payload[, min, avg, max]) - content-defined chunks",
      (args: Seq[Expression]) => {
        arity("graft_gear_chunks", args, 1, 4)
        if (args.length == 1) GearChunks(args(0), 2048, 8192, 65536)
        else GearChunks(args(0),
          litInt(args(1), "min", "graft_gear_chunks"),
          litInt(args(2), "avg", "graft_gear_chunks"),
          litInt(args(3), "max", "graft_gear_chunks"))
      }),
    ("graft_fix_mojibake",
      "graft_fix_mojibake(text[, maxPasses]) - repair cp1252-mangled UTF-8",
      (args: Seq[Expression]) => {
        arity("graft_fix_mojibake", args, 1, 2)
        FixMojibake(args(0),
          if (args.length == 2)
            litInt(args(1), "maxPasses", "graft_fix_mojibake")
          else 2)
      }),
    ("graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization",
      (args: Seq[Expression]) => {
        arity("graft_nfc", args, 1); NormalizeNfc(args(0))
      }),
    ("graft_strip_marks",
      "graft_strip_marks(text) - strip combining marks (utf8proc STRIPMARK)",
      (args: Seq[Expression]) => {
        arity("graft_strip_marks", args, 1); StripMarks(args(0))
      }),
    ("graft_punycode_host",
      "graft_punycode_host(host) - ASCII (IDNA/punycode) form of a hostname",
      (args: Seq[Expression]) => {
        arity("graft_punycode_host", args, 1); PunycodeHost(args(0))
      }),
    ("graft_porter_stem",
      "graft_porter_stem(word) - Porter 1980 stem of a lowercase word",
      (args: Seq[Expression]) => {
        arity("graft_porter_stem", args, 1); PorterStem(args(0))
      }),
    ("graft_hilbert",
      "graft_hilbert(bits, x0, x1[, ...x5]) - Hilbert index of scaled LONG coords",
      (args: Seq[Expression]) => {
        arity("graft_hilbert", args, 3, 4, 5, 6, 7)
        HilbertKeyExpr(args.tail, litInt(args.head, "bits", "graft_hilbert"))
      }))

  private[sql] def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.sql.GraftFunctions", null, name, usage, "")

  /** Register every function on a LIVE session (idempotent overwrite). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }
}

/** The `spark.sql.extensions` entry point (context-wide registration). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftFunctions.info(name, usage), builder))
    }
}
