package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The generic `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation runs
  * interpreted (higher-order functions have no codegen) and allocates a
  * boxed intermediate array per call — measured ~115µs per 64-dim pair.
  * These expressions are tight primitive loops over ArrayData with full
  * codegen: same left-to-right summation order (bit-identical results),
  * ~1000× less overhead. Array elements must be non-null doubles.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on mismatched lengths (so is the HOF formulation this replaces:
  // zip_with null-pads, the aggregate goes null) - silently truncating to
  // the shorter vector produced prefix-cosines that could EXCEED a
  // near-dup threshold and emit false pairs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sum of squared elements (the squared L2 norm). */
case class SumSquares(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sumsq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSquares =
    copy(child = newChild)
}

/** Parse the first `prefixLen` lowercase-hex chars of a string as a long.
  * Replaces `conv(substring(...), 16, 10)` — the generic radix converter
  * (NumberConverter) dominated profiles of hash-heavy aggregations.
  * Produces identical values for identical input.
  */
case class HexPrefixToLong(child: Expression, prefixLen: Int)
    extends UnaryExpression {
  require(prefixLen > 0 && prefixLen <= 15, "prefixLen must be in [1,15]")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hex_prefix"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = math.min(prefixLen, s.length)
    var v = 0L
    var i = 0
    while (i < n) {
      val c = s(i)
      val d = if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else 0
      v = (v << 4) | d
      i += 1
    }
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |byte[] $b = $x.getBytes();
         |int $n = Math.min($prefixLen, $b.length);
         |long $v = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $c = $b[$i];
         |  int $d = ($c >= '0' && $c <= '9') ? $c - '0'
         |    : ($c >= 'a' && $c <= 'f') ? $c - 'a' + 10
         |    : ($c >= 'A' && $c <= 'F') ? $c - 'A' + 10 : 0;
         |  $v = ($v << 4) | $d;
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexPrefixToLong =
    copy(child = newChild)
}

object VectorFunctions {

  /** First `prefixLen` hex chars of a string column as a long. */
  def hexPrefixToLong(c: Column, prefixLen: Int): Column =
    GraftSqlBridge.column(HexPrefixToLong(GraftSqlBridge.expression(c), prefixLen))
  /** Dot product of two array<double> columns (order-stable summation). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Squared L2 norm of an array<double> column. */
  def sumSquares(a: Column): Column =
    GraftSqlBridge.column(SumSquares(GraftSqlBridge.expression(a)))
}
