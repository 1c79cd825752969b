package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve transform core (Skilling 2004, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707): n-dimensional coordinates of
  * `bits` bits each → the scalar Hilbert index. A standalone object
  * (no companion class) so scalac emits a STATIC `encode` forwarder —
  * what the generated Janino code calls directly, keeping the
  * expression inside whole-stage codegen.
  */
object HilbertCurve {
  /** `x` is consumed (mutated); callers pass a fresh array per row. */
  def encode(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // inverse-undo pass: per bit plane msb→lsb+1, exchange/invert the
    // low planes so each level's sub-cube enters in Gray order
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across dimensions
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // collapse the transposed form: msb-first across planes, dim 0 most
    // significant within each plane
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        h = (h << 1) | ((x(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    h
  }
}

/** The Hilbert index of 2–6 scaled LONG coordinates — the
  * locality-layout sibling of the Morton key (`Compaction.zorderKey`):
  * consecutive Hilbert indices ALWAYS differ by one unit step in one
  * dimension (Morton jumps corners at power-of-two boundaries), so
  * range-partitioned files cover tighter hyper-rectangles and min/max
  * pruning cuts deeper on multi-column scans.
  *
  * Full `doGenCode` — this sits in the WRITE hot path over the whole
  * corpus, where a `CodegenFallback` would break the projection's
  * whole-stage span; the generated code is one static call into
  * [[HilbertCurve.encode]]. NULL coordinates index as 0 (they cluster
  * at the low corner — the `zorderKey` NULL convention). Inputs must
  * already be scaled/clamped to `bits` bits (`Compaction.hilbertKey`
  * does this with the shared min-max machinery).
  */
case class HilbertKeyExpr(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2 && children.size <= 6,
    s"hilbert key needs 2-6 coordinates, got ${children.size}")
  require(bits >= 1 && children.size * bits <= 62,
    s"dims*bits must fit a long: ${children.size}*$bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hilbert_key"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.filterNot(_.dataType == LongType)
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"all hilbert coordinates must be LONG, got ${bad.map(_.dataType).mkString(", ")}")
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      x(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    HilbertCurve.encode(x, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hcoords")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    val body =
      s"""
         |$childCode
         |long[] $arr = new long[${children.size}];
         |$assigns
         |long ${ev.value} = graft.functions.HilbertCurve.encode($arr, $bits);
       """.stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertKeyExpr =
    copy(children = newChildren)
}

object HilbertKeyExpr {
  /** Column face over already-scaled LONG coordinate columns. */
  def apply(coords: Seq[Column], bits: Int): Column =
    GraftSqlBridge.column(
      new HilbertKeyExpr(coords.map(GraftSqlBridge.expression), bits))
}
