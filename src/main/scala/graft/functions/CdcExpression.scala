package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunking by Gear rolling hash (the LBFS idea with the
  * Gear/FastCDC boundary function — Xia et al., USENIX ATC 2016): a
  * boundary lands where the rolling fingerprint of the last ~63 bytes
  * hits a mask, so chunk edges follow CONTENT, not offsets. Insert 100
  * bytes at the front of a file and every chunk after the edit window
  * realigns — the property that makes chunk-hash dedup work across
  * shifted/patched binary payloads where fixed-size blocks share
  * nothing.
  *
  * Output: `array<struct<offset:int, size:int, hash:binary>>` tiling the
  * payload exactly (offsets contiguous, sizes sum to the payload
  * length); empty payload → empty array. `hash` is the first 16 bytes of
  * sha-256 of the chunk — 128 bits, collision-safe at 100 TB corpus
  * chunk counts where a 64-bit key would already expect collisions.
  *
  * Boundary rule: after `minSize` bytes, cut where
  * `(fp & mask) == 0` with one mask bit per `log2(avgSize)` (expected
  * chunk ≈ avgSize); a cut is forced at `maxSize`. The gear table is
  * derived from sha-256 of its index — any engine reproduces the exact
  * same chunking from this spec, no RNG state to ship.
  *
  * `CodegenFallback` is deliberate ([[DeflateSize]] discipline): the work
  * is the byte loop + per-chunk MessageDigest; wrapping it in generated
  * null-checks buys nothing.
  */
case class GearChunks(
    child: Expression, minSize: Int, avgSize: Int, maxSize: Int)
    extends UnaryExpression with CodegenFallback {
  require(minSize >= 1, s"minSize must be >= 1, got $minSize")
  require(avgSize >= minSize && (avgSize & (avgSize - 1)) == 0,
    s"avgSize must be a power of two >= minSize, got $avgSize")
  require(maxSize >= avgSize, s"maxSize $maxSize must be >= avgSize $avgSize")

  private val maskBits = java.lang.Integer.numberOfTrailingZeros(avgSize)
  // high-order mask: the shifted-left gear fingerprint accumulates its
  // window history upward, so the top bits see the most context
  private val mask: Long = ((1L << maskBits) - 1) << (63 - maskBits)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("hash", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_gear_chunks"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var i = 0
    var fp = 0L
    while (i < bytes.length) {
      fp = (fp << 1) + GearChunks.Gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if (i == bytes.length || len >= maxSize ||
          (len >= minSize && (fp & mask) == 0L)) {
        md.reset()
        md.update(bytes, start, len)
        out += InternalRow(start, len,
          java.util.Arrays.copyOf(md.digest(), 16))
        start = i
        fp = 0L // window resets per chunk: chunking is local to the chunk
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {
  /** 256 gear constants, each the first 8 bytes of sha-256("graft-gear:i")
    * — fixed by this spec, reproducible in any engine.
    */
  val Gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until 256).map { i =>
      val d = md.digest(s"graft-gear:$i".getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }.toArray
  }
}

object CdcFunctions {

  /** Content-defined chunks of a binary column (see [[GearChunks]]). */
  def gearChunks(
      payload: Column,
      minSize: Int = 2048,
      avgSize: Int = 8192,
      maxSize: Int = 65536): Column =
    GraftSqlBridge.column(GearChunks(
      GraftSqlBridge.expression(payload), minSize, avgSize, maxSize))
}
