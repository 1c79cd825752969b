package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Principal component analysis over an embedding column — the standard
  * dimension shrink BEFORE the ANN tier (a 64→16 PCA keeps ~the top
  * variance directions and cuts IVF/PQ scan cost 4×; pair with
  * [[graft.operators.Ann]] the way [[graft.functions.VectorFunctions.srpProject]]
  * pairs, but data-adapted instead of data-oblivious), and the audit
  * behind "how many dimensions does this embedding actually use".
  *
  * Spark-first shape (the same plan MLlib's RowMatrix Gramian uses, made
  * engine-exact): ONE corpus pass accumulates, per partition, the count,
  * the per-dimension sums, and the upper-triangle second-moment sums —
  * each per-row term quantized to nano-units THE MOMENT IT IS BORN and
  * accumulated into LONGs with `Math.addExact` (overflow is loud, never
  * a silent wrap; sums of longs are order-free, so the fit is
  * bit-reproducible on any partitioning). The per-partition partial rows
  * (#partitions × (d(d+1)/2 + d + 1) longs) merge through one map-side-
  * combined `groupBy(pos)` — never a driver-sized collect of partials —
  * and only the final ≤ d(d+3)/2 + 1 cells land on the driver, where the
  * d×d eigensolve (cyclic Jacobi, deterministic sweep order, sign-
  * canonicalized eigenvectors) is O(d³) driver math, d ≤ 1024 by loud
  * bound.
  *
  * `mapPartitions` is deliberate here: a relational explode of d(d+1)/2
  * per-row terms would shuffle-combine to the same 2 k cells but pay
  * corpus × d² row materialization; the tight accumulator loop is the
  * genuine per-partition imperative case.
  *
  * Overflow envelope: a gram cell accumulates n·max|xᵢxⱼ|·1e9 — with
  * unit-scale embeddings that is ≈ n·1e9 < 2⁶³, i.e. safe beyond 1e9
  * rows; `addExact` guards the rest. NULL embeddings and length drift
  * fail loudly (silently dropping rows would bias every moment).
  */
object Pca {

  /** A fitted PCA basis: `components(j)` is the j-th principal axis
    * (unit length, rows orthonormal), `eigenvalues(j)` its population
    * variance, both sorted by eigenvalue descending; `mean` is the
    * per-dimension data mean; `totalVariance` the covariance trace
    * (so `eigenvalues.take(k).sum / totalVariance` is variance
    * explained).
    */
  final case class PcaModel(
      dim: Int,
      k: Int,
      nRows: Long,
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double)

  /** Exact raw moments of `vecCol`: `(n, sumNanos, gramNanos)` with
    * `gramNanos` the upper triangle in row-major (i ≤ j) order. Shared
    * by [[fit]] and [[gramTable]] so the oracle-checked table IS the
    * fit's aggregate.
    */
  /** Half-away-from-zero to match SQL `round` on BOTH engines —
    * `Math.round` is half-toward-+inf and disagrees on negative halves.
    */
  private def rnd(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** The raw-moment LONG cells as a `(pos, __kcnt)` frame — position 0
    * is the row count, 1..dim the nano sums, the rest the upper-triangle
    * gram nanos in row-major order. Every cell is an order-free LONG sum,
    * so cells are SUM-MERGEABLE across arbitrary splits of the corpus:
    * `cells(A ∪ B) = cells(A) +cellwise cells(B)` exactly — the property
    * [[graft.streaming.StreamingOps.pcaMomentSink]] logs under the
    * stat-log sum fold law, and the reason an incremental fit is
    * bit-identical to the batch fit. Every position is present (zeros
    * included), so `count = dim(dim+3)/2 + 1` always — validated by
    * consumers.
    */
  private[graft] def momentCells(
      df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = dim * (dim + 1) / 2
    val partials = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
      .mapPartitions { it =>
        var n = 0L
        val sums = new Array[Long](dim)
        val gram = new Array[Long](pairs)
        it.foreach { v =>
          require(v != null, "fit: NULL embedding row — filter upstream " +
            "(silently dropping rows would bias every moment)")
          require(v.length == dim,
            s"fit: embedding length ${v.length} != first-row length $dim")
          n += 1
          var i = 0
          var p = 0
          while (i < dim) {
            sums(i) = Math.addExact(sums(i), rnd(v(i) * 1e9))
            var j = i
            while (j < dim) {
              gram(p) = Math.addExact(gram(p), rnd(v(i) * v(j) * 1e9))
              p += 1
              j += 1
            }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, sums, gram))
      }
    // two-level merge: partials posexplode to (pos, val) cells, one
    // map-side-combined groupBy — the driver (or log) sees
    // <= pairs + dim + 1 rows no matter how many partitions the corpus
    // has. An EMPTY frame still yields every position (a zero-row seed
    // partial), so empty batches fold as exact zeros.
    val seed = Seq((0L, new Array[Long](dim), new Array[Long](pairs)))
      .toDF("__n", "__s", "__g")
    partials.toDF("__n", "__s", "__g").unionByName(seed)
      .select(posexplode(concat(array(col("__n")), col("__s"), col("__g"))))
      .groupBy(col("pos")).agg(sum(col("col")).as("__kcnt"))
  }

  private def moments(
      df: DataFrame, vecCol: String, dim: Int): (Long, Array[Long], Array[Long]) = {
    val cells = momentCells(df, vecCol, dim)
      .collect().map(r => r.getAs[Int]("pos") -> r.getAs[Long]("__kcnt")).toMap
    momentsOf(cells, dim)
  }

  private def momentsOf(
      cells: Map[Int, Long], dim: Int): (Long, Array[Long], Array[Long]) = {
    val pairs = dim * (dim + 1) / 2
    require(cells.size == pairs + dim + 1,
      s"moment cells carry ${cells.size} positions, expected " +
        s"${pairs + dim + 1} for dim $dim — wrong dim or a foreign log")
    val n = cells(0)
    val sums = Array.tabulate(dim)(i => cells(1 + i))
    val gram = Array.tabulate(pairs)(p => cells(1 + dim + p))
    (n, sums, gram)
  }

  /** Rebuild a [[PcaModel]] from summed moment cells (a
    * [[graft.streaming.StreamingOps.pcaMomentSink]] log, or any
    * cell-wise sum of [[momentCells]] outputs). `dim` must be the dim
    * the cells were built with — validated against the cell count.
    * Bit-identical to [[fit]] over the union of the logged frames.
    */
  def fitFromMomentCells(
      cells: DataFrame, dim: Int, k: Int): PcaModel = {
    require(dim >= 1 && dim <= 1024, s"dim $dim outside [1, 1024]")
    require(k >= 1 && k <= dim, s"k $k outside [1, $dim]")
    val m = cells.groupBy(col("pos")).agg(sum(col("__kcnt")).as("__kcnt"))
      .collect().map(r => r.getAs[Int]("pos") -> r.getAs[Long]("__kcnt")).toMap
    val (n, sums, gram) = momentsOf(m, dim)
    require(n > 0, "fitFromMomentCells: zero logged rows")
    fitFromRawMoments(n, sums, gram, dim, k)
  }

  private def vecDim(df: DataFrame, vecCol: String): Int = {
    val first = df.select(size(col(vecCol))).where(col(vecCol).isNotNull).head(1)
    require(first.nonEmpty, s"fit: no non-null rows in $vecCol")
    first.head.getInt(0)
  }

  /** Fit a `k`-component PCA on `vecCol` (array of numerics; dimension
    * taken from the first row, drift is loud). See object doc for the
    * execution shape and determinism contract.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val dim = vecDim(df, vecCol)
    require(dim >= 1 && dim <= 1024,
      s"fit: dim $dim outside [1, 1024] — the d×d eigensolve is driver " +
        "math; shrink with srpProject first for wider vectors")
    require(k >= 1 && k <= dim, s"fit: k $k outside [1, $dim]")
    val (n, sums, gram) = moments(df, vecCol, dim)
    require(n > 0, "fit: empty input")
    fitFromRawMoments(n, sums, gram, dim, k)
  }

  private def fitFromRawMoments(
      n: Long, sums: Array[Long], gram: Array[Long],
      dim: Int, k: Int): PcaModel = {
    val mean = sums.map(_ / 1e9 / n)
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(p) / 1e9 / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }
    val totalVar = (0 until dim).map(d => cov(d)(d)).sum
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(idx => (-evals(idx), idx))
    val top = order.take(k)
    val components = top.map { idx =>
      val v = Array.tabulate(dim)(r => evecs(r)(idx))
      // sign canonicalization: the largest-|component| entry (first on
      // ties) is made positive, so the basis is unique and reruns match
      val m = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(dim, k, n, mean, components, top.map(evals).toArray, totalVar)
  }

  /** The fit's second-moment aggregate as an auditable table
    * `(i, j, gram_nanos)` (upper triangle, i ≤ j): exactly the LONG
    * cells [[fit]] consumes, so an external engine summing
    * `round(xᵢ·xⱼ·1e9)` per row must match bit-for-bit.
    */
  def gramTable(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val dim = vecDim(df, vecCol)
    val (_, _, gram) = moments(df, vecCol, dim)
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield (i.toLong, j.toLong, gram(i * dim - i * (i - 1) / 2 + (j - i)))
    import spark.implicits._
    rows.toDF("i", "j", "gram_nanos")
  }

  /** Project `vecCol` onto `model`'s basis: `out_j = Wⱼ·(x − mean)`,
    * computed as the codegen'd [[VectorFunctions.dot]] against a
    * broadcast-literal axis plus a precomputed scalar offset — narrow,
    * no shuffle, ~k·d FMAs per row.
    */
  def project(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca"): DataFrame =
    applyBasis(df, vecCol, model, outCol, center = true)

  /** Uncentered full-rank change of basis: `out = W·x` with the
    * complete eigenvector matrix — a pure ROTATION (orthogonal, norm-
    * and cosine-preserving), which is the OPQ-style preprocessing for
    * [[graft.operators.Ann.Pq]]: product quantization splits dims into
    * independent subspaces, and rotating onto the principal axes
    * decorrelates them so per-subspace codebooks stop wasting codes on
    * cross-subspace correlation (Ge et al. 2013's OPQ, with the PCA
    * rotation instead of the iterated R — the classical Eigenvalue
    * baseline from that paper). Rotate corpus AND queries with the SAME
    * model; distances are bit-for-bit unchanged, so exact consumers
    * need no migration.
    *
    * Centering is deliberately OFF: `W·(x − μ)` shifts norms, and PQ
    * normalizes vectors — a centered "rotation" would silently change
    * every cosine. Requires a full-rank fit (`k == dim`), loudly.
    */
  def rotate(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "rotated"): DataFrame = {
    require(model.k == model.dim,
      s"rotate needs a full-rank basis (k == dim); fit with k = ${model.dim}")
    applyBasis(df, vecCol, model, outCol, center = false)
  }

  /** OPQ-style rotation for [[graft.operators.Ann.Pq]] with `m`
    * subspaces: [[rotate]]'s basis PERMUTED by eigenvalue allocation
    * (Ge et al. 2013 §4.1, the non-parametric OPQ baseline) — principal
    * axes are dealt greedily to the subspace with the smallest current
    * log-variance product, so every subspace quantizes a comparable
    * share of the energy. A plain variance-ordered rotation
    * concentrates ALL the signal in the first subspace and hands the
    * others noise — measurably WORSE than no rotation on balanced data
    * (PcaSpec pins both effects); the allocation is what makes the
    * rotation pay. Rotate corpus and queries with the same call.
    */
  def opqRotate(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      m: Int,
      outCol: String = "rotated"): DataFrame = {
    require(model.k == model.dim,
      s"opqRotate needs a full-rank basis (k == dim); fit with k = ${model.dim}")
    require(m >= 1 && model.dim % m == 0,
      s"m must divide dim ${model.dim}, got $m")
    applyBasis(df, vecCol, model, outCol, center = false,
      order = eigenvalueAllocation(model.eigenvalues, m))
  }

  /** Greedy balanced-log-variance assignment of components (sorted by
    * eigenvalue descending on entry) into `m` equal buckets; returns
    * component indices in bucket-concatenated order.
    */
  private[similarity] def eigenvalueAllocation(
      eigenvalues: Array[Double], m: Int): Seq[Int] = {
    val dsub = eigenvalues.length / m
    val sums = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    eigenvalues.indices.foreach { i =>
      val open = (0 until m).filter(b => buckets(b).length < dsub)
      val b = open.minBy(b => (sums(b), b))
      sums(b) += math.log(math.max(eigenvalues(i), Double.MinPositiveValue))
      buckets(b) += i
    }
    buckets.toSeq.flatten
  }

  private def applyBasis(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String,
      center: Boolean,
      order: Seq[Int] = Seq.empty): DataFrame = {
    require(!df.columns.contains(outCol), s"output column $outCol exists")
    val ordered =
      if (order.isEmpty) model.components.toSeq
      else order.map(model.components)
    val comps: Seq[Column] = ordered.map { w =>
      val base = VectorFunctions.dot(
        col(vecCol).cast("array<double>"),
        typedlit(w.toIndexedSeq))
      if (center)
        base + lit(-w.zip(model.mean).map { case (a, b) => a * b }.sum)
      else base
    }.toIndexedSeq
    df.withColumn(outCol, array(comps: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic sweep order, converges when every off-diagonal is
    * below `tol` relative to the Frobenius scale. Returns (eigenvalues,
    * eigenvector matrix V with eigenvectors as COLUMNS), unordered.
    */
  private def jacobiEigen(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-13): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(math.sqrt(
      a.map(_.map(x => x * x).sum).sum), Double.MinPositiveValue)
    var sweep = 0
    var done = d <= 1
    while (!done && sweep < maxSweeps) {
      var off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off = math.max(off, math.abs(a(p)(q)))
          if (math.abs(a(p)(q)) > tol * scale) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      done = off <= tol * scale
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
