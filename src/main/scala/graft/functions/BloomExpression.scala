package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(key)` as a codegen'd Catalyst predicate.
  *
  * Spark's own runtime bloom pruning (InjectRuntimeFilter) only fires on
  * shuffle-join shapes the optimizer recognizes; this expression lets an
  * operator prune a scan with ANY driver-built bloom — the pre-shuffle
  * semi-join reduction used by [[graft.operators.RuntimeFilters]].
  *
  * The filter object rides the serialized plan: it is shipped to executors
  * once per stage via the task-binary broadcast, not per row or per task.
  * NULL keys evaluate to `false` (an inner/semi join drops them anyway), so
  * the predicate never widens a join's null semantics.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral or string key, got ${t.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case StringType =>
        bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case _ => bloom.mightContainLong(v.asInstanceOf[Number].longValue())
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val childGen = child.genCode(ctx)
    val call = child.dataType match {
      case StringType => s"$ref.mightContainBinary(${childGen.value}.getBytes())"
      case _ => s"$ref.mightContainLong((long) ${childGen.value})"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $call;
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Predicate column: true iff `bloom` might contain the key. */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bloom))
}
