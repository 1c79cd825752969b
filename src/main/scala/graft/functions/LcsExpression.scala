package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Length of the longest common subsequence of two token arrays — the
  * integer core of ROUGE-L (Lin 2004): the classic two-row O(m·n) DP,
  * `L[i][j] = max(L[i-1][j], L[i][j-1], L[i-1][j-1]+1 on match)`.
  * Tokens compare as exact strings (UTF8String equality — no folding);
  * an empty side scores 0. The result is an exact integer, so any
  * engine running the same DP over the same token lists reproduces it
  * bit-for-bit (the DuckDB twin replays the row recurrence as a
  * recursive CTE with the prefix-max reformulation
  * `new[j] = max(prev[j], runmax_{k≤j}(match_k ? prev[k-1]+1 : 0))`).
  *
  * The DP is quadratic PER PAIR — the calling operator owns the
  * short-string contract ([[graft.operators.RankEval.rougeL]] refuses
  * token counts above its `maxTokens` eagerly, the
  * [[graft.operators.RankEval.editSimilarity]] discipline).
  *
  * `CodegenFallback` is deliberate ([[GearChunks]] discipline): the
  * work IS the DP loop; wrapping it in generated null-checks buys
  * nothing.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcs_length"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) 0
    else {
      val as = new Array[UTF8String](m)
      var i = 0
      while (i < m) { as(i) = a.getUTF8String(i); i += 1 }
      val bs = new Array[UTF8String](n)
      var j = 0
      while (j < n) { bs(j) = b.getUTF8String(j); j += 1 }
      var prev = new Array[Int](n + 1)
      var cur = new Array[Int](n + 1)
      i = 0
      while (i < m) {
        j = 1
        while (j <= n) {
          val d = if (as(i) == bs(j - 1)) prev(j - 1) + 1 else 0
          var v = prev(j)
          if (cur(j - 1) > v) v = cur(j - 1)
          if (d > v) v = d
          cur(j) = v
          j += 1
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
        i += 1
      }
      prev(n)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsFunctions {

  /** LCS length of two `array<string>` token columns (see [[LcsLength]]). */
  def lcsLength(a: Column, b: Column): Column =
    GraftSqlBridge.column(LcsLength(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
