package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a full BPE merge list to a symbol array in ONE expression.
  *
  * The declarative alternative — one `aggregate` fold per merge, chained
  * with `withColumn` — carries the merge count into the PLAN: 24 merges
  * is 24 nested fold expressions (already needing lineage checkpoints
  * every 8 to keep analysis bounded), and a production 32k–64k-merge
  * tokenizer is flatly unreachable (thousands of checkpoint jobs, codegen
  * far past method limits). This expression carries the merge list in the
  * OPERATOR instead: one plan node, one pass over the vocabulary, the
  * rank loop as a tight JVM loop.
  *
  * Semantics are exactly the chained-fold semantics (spec-pinned against
  * the same single-node reference in BpeSpec): merges apply in rank
  * order, each as one greedy left-to-right pass where the accumulator's
  * last symbol merges with the current one ("aaaa" + (a,a) → [aa, aa]).
  * A per-word symbol-presence set skips ranks that cannot apply — the
  * common case for long merge lists, making per-word cost
  * O(|merges| set-lookups + |applicable| · |word|).
  *
  * `CodegenFallback` is deliberate: this evaluates over the DISTINCT-word
  * table (vocabulary-sized, never corpus-sized), and generating a
  * 32k-iteration merge loop into Janino would burst method limits for no
  * gain. Null input → null; symbols must be non-null strings (the
  * contract of `Bpe.initialSymbols`).
  *
  * `contPrefix` (empty for plain BPE) is the continuation marker of
  * WordPiece-style symbol alphabets: when set, the merge PRODUCT strips
  * the right symbol's leading marker (`"un" + "##able" → "unable"`,
  * `"##a" + "##b" → "##ab"`) — the left symbol keeps its own marker, so
  * word-initial and word-internal pieces stay distinct.
  */
case class BpeApplyMerges(
    child: Expression,
    merges: Seq[(String, String)],
    contPrefix: String = "")
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val mergeArr: Array[(String, String, String)] =
    merges.map { case (l, r) =>
      val product =
        if (contPrefix.nonEmpty && r.startsWith(contPrefix))
          l + r.substring(contPrefix.length)
        else l + r
      (l, r, product)
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var syms = new java.util.ArrayList[String](n)
    val present = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      syms.add(s)
      present.add(s): Unit
      i += 1
    }
    var m = 0
    while (m < mergeArr.length) {
      val l = mergeArr(m)._1
      val r = mergeArr(m)._2
      val prod = mergeArr(m)._3
      // necessary condition only — stale `present` entries (symbols fully
      // consumed by earlier merges) cost a wasted pass, never wrong output
      if (syms.size > 1 && present.contains(l) && present.contains(r)) {
        val out = new java.util.ArrayList[String](syms.size)
        var merged = false
        var j = 0
        while (j < syms.size) {
          val x = syms.get(j)
          if (!out.isEmpty && out.get(out.size - 1) == l && x == r) {
            out.set(out.size - 1, prod)
            merged = true
          } else out.add(x): Unit
          j += 1
        }
        if (merged) {
          syms = out
          present.add(prod): Unit
        }
      }
      m += 1
    }
    val res = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { res(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

object BpeApplyMerges {
  /** Column face: `syms` rewritten under `merges` in rank order. */
  def apply(syms: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeApplyMerges(GraftSqlBridge.expression(syms), merges))

  /** Column face with a WordPiece-style continuation marker. */
  def apply(syms: Column, merges: Seq[(String, String)], contPrefix: String): Column =
    GraftSqlBridge.column(
      BpeApplyMerges(GraftSqlBridge.expression(syms), merges, contPrefix))
}
