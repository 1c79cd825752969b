package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the engine side of
  * the compression-ratio quality signal (Gopher / RedPajama-style):
  * machine-generated and template text compresses far below natural
  * prose, so `deflated / raw` separates boilerplate floods from real
  * documents with one scan and no vocabulary.
  *
  * `CodegenFallback` is deliberate: the work IS `Deflater` (a JNI zlib
  * call); generating the surrounding null-check into Janino would save
  * nanoseconds around a microsecond-scale call. One Deflater per
  * evaluation, always `end()`ed — Deflater holds native memory, and
  * pooling across rows would leak it on task retry.
  *
  * Raw deflate (nowrap) at a FIXED level: zlib output depends on level
  * and strategy, so the level is part of the signal's identity — compare
  * ratios only across columns built with the same level.
  */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 1 && level <= 9, s"deflate level must be in 1..9, got $level")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_size"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object CompressFunctions {

  /** DEFLATE(level)-compressed byte count of the UTF-8 text. */
  def deflateSize(text: Column, level: Int = 6): Column =
    GraftSqlBridge.column(DeflateSize(GraftSqlBridge.expression(text), level))
}
