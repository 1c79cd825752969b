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

/** Signed random projection (Achlioptas 2003 / the JL-lemma ±1 scheme):
  * out[k] = Σ_j sgn(k,j)·v[j] over a deterministic ±1 matrix derived
  * from closed-form integer arithmetic — no RNG state to ship, no
  * matrix to SHIP (executors rebuild the signs from (k, j, salt) alone;
  * a per-task bit-packed cache avoids re-hashing per row — determinism
  * comes from the formula, not from recomputation), and (crucially for
  * the oracle) a formula DuckDB evaluates bit-identically. sgn is the
  * parity of a 32-bit avalanche hash
  * (two xor-shift-multiply rounds, the standard lowbias finalizer) of
  * (k·73856093 + j·19349663 + salt) masked to 32 bits; a LINEAR
  * formula mod a prime is NOT enough here — for fixed k it walks an
  * arithmetic progression, rows come out heavily correlated, and
  * measured cosine distortion was ~3× the JL bound before the
  * avalanche. All intermediates stay within int64 (32-bit value ×
  * 27-bit multiplier). Summation is ascending-j, so equal inputs
  * produce EQUAL doubles across engines and runs.
  *
  * The projection is unscaled (true JL scales by 1/√outDim): cosine —
  * what the dedup/ANN pipeline compares — is scale-invariant, and the
  * caller can scale when norms matter. This is the 100 TB shrink step:
  * project 1024-dim embeddings to 32–64 dims BEFORE
  * [[graft.operators.Dedup.cosineNearDupPairs]] / ANN, cutting shuffle
  * and probe I/O by the dim ratio at a distance-distortion cost the JL
  * bound controls.
  */
case class SrpProject(child: Expression, outDim: Int, salt: Long)
    extends UnaryExpression {
  require(outDim > 0 && outDim <= 4096, s"outDim must be in [1,4096], got $outDim")
  require(salt >= 0 && salt < (1L << 32), s"salt must be in [0,2^32), got $salt")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_srp"

  // The ±1 sign of cell (k, j) depends only on (k, j, salt) — ROW-
  // INVARIANT — yet the original inline form re-ran the ~8-op avalanche
  // hash for every cell of every row (outDim·inDim hashes per row,
  // dominating the adds on the 1024→64 shrink path). The signs are
  // cached as a bit-packed matrix, built lazily at the first row of each
  // task and grown if a later row is wider (ragged inputs). Caching
  // preserves bit-identical output: the bits ARE the same hash values.
  // Both fields are volatile: the expression instance is shared across
  // local-mode task threads, and an unordered (matrix, dim) read pair
  // could otherwise return a matrix narrower than the dim check claims.
  @volatile @transient private var signWords: Array[Array[Long]] = _
  @volatile @transient private var signDim: Int = -1

  /** Bit k×j set ⟺ cell (k, j) is NEGATED. Public: codegen calls it. */
  def signMatrix(d: Int): Array[Array[Long]] = {
    val dimSeen = signDim // read dim FIRST: matrix is never older than it
    val m = signWords
    if (m != null && d <= dimSeen) m
    else this.synchronized {
      if (signWords == null || d > signDim) {
        val words = (d + 63) >>> 6
        val fresh = Array.ofDim[Long](outDim, words)
        var k = 0
        while (k < outDim) {
          val kTerm = k * 73856093L + salt
          var j = 0
          while (j < d) {
            var h = (kTerm + j * 19349663L) & 0xFFFFFFFFL
            h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
            h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
            h = h ^ (h >>> 16)
            if ((h & 1L) != 0L) fresh(k)(j >>> 6) |= (1L << (j & 63))
            j += 1
          }
          k += 1
        }
        signWords = fresh
        signDim = d
      }
      signWords
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = x.numElements()
    val signs = signMatrix(d)
    val out = new Array[Double](outDim)
    var k = 0
    while (k < outDim) {
      val row = signs(k)
      var s = 0.0
      var j = 0
      while (j < d) {
        val v = x.getDouble(j)
        s += (if (((row(j >>> 6) >>> (j & 63)) & 1L) == 0L) v else -v)
        j += 1
      }
      out(k) = s
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refExpr = ctx.addReferenceObj("graftSrp", this, classOf[SrpProject].getName)
    val signs = ctx.addMutableState("long[][]", "graftSrpSigns")
    val signsDim = ctx.addMutableState("int", "graftSrpSignsDim",
      v => s"$v = -1;")
    nullSafeCodeGen(ctx, ev, x => {
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val row = ctx.freshName("row")
      s"""
         |int $d = $x.numElements();
         |if ($signs == null || $d > $signsDim) {
         |  $signs = $refExpr.signMatrix($d);
         |  $signsDim = $d;
         |}
         |double[] $out = new double[$outDim];
         |for (int $k = 0; $k < $outDim; $k++) {
         |  long[] $row = $signs[$k];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    double $v = $x.getDouble($j);
         |    $s += ((($row[$j >>> 6] >>> ($j & 63)) & 1L) == 0L) ? $v : -$v;
         |  }
         |  $out[$k] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpProject =
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

  /** Deterministic ±1 signed random projection of an array<double> to
    * `outDim` dims (see [[SrpProject]]).
    */
  def srpProject(vec: Column, outDim: Int, salt: Long = 0L): Column =
    GraftSqlBridge.column(SrpProject(GraftSqlBridge.expression(vec), outDim, salt))
}
