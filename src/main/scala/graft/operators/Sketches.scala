package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` / `hll_union_agg` family — codegen'd
  * aggregates, no UDF).
  *
  * Beyond-reference. The 100 TB pattern this serves: "distinct users per
  * (day, source)" where the daily job must not rescan history. Store one
  * small binary sketch per fine-grained group per run; any coarser
  * rollup — distinct-over-a-month, distinct-over-all-sources — is a
  * merge of the stored sketches, never a recount. Exact
  * `count_distinct` cannot do this: distinct counts are not additive, so
  * every rollup re-shuffles the raw keys. Sketches make the rollup
  * O(groups), with a standard-error of about 1.04/sqrt(2^lgConfigK)
  * (~1.6 % at the default lgConfigK = 12, ~410 bytes per group).
  *
  * Not SQL-expressible in the DuckDB oracle (different HLL
  * implementation) → spec-verified error bounds plus a rows-only
  * `q_distinct_rollup` entry, same contract as `q_ann_ivf`.
  */
object Sketches {

  /** One mergeable sketch per group: (groupCols..., sketch binary).
    * This is the WRITE side of the incremental pattern — persist the
    * result keyed by the finest grouping you will ever roll up from.
    */
  def distinctSketches(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      lgConfigK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"))
  }

  /** Roll stored sketches up to a coarser grouping and estimate:
    * (rollupCols..., distinct_est). `rollupCols` may be empty for a
    * global estimate (one row). Merging never touches raw keys — the
    * input here is the O(groups)-sized sketch table, not the corpus.
    */
  def rollupDistinct(
      sketches: DataFrame,
      rollupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col(sketchCol)))
      .as("distinct_est")
    if (rollupCols.isEmpty) sketches.agg(merged)
    else sketches.groupBy(rollupCols.map(col): _*).agg(merged)
  }

  // ---- frequent items (heavy hitters), same store-fine/roll-up-coarse
  // pattern as the HLL sketches above ----

  private val StringSerDe = new org.apache.datasketches.common.ArrayOfStringsSerDe

  /** Phase-1 partial building shared by [[frequentSketches]] and
    * [[quantileSketches]]: fold a partition's rows into one sketch per
    * group, FLUSHING the accumulator whenever admitting a new group would
    * exceed `maxGroups` live sketches. Without the bound, a partition
    * containing millions of distinct groups (100 TB reality: group by
    * URL domain, by user, …) would hold millions of sketches in one hash
    * map; with it, memory is ≤ maxGroups × sketch size and the merge
    * phase simply sees a few more partials per group (`BufferedIterator`
    * so rows of an already-live group never trigger a flush). Correctness
    * is unaffected — phase 2 merges any number of partials per group.
    */
  private def partialsIterator[S](
      rows: Iterator[org.apache.spark.sql.Row],
      newSketch: () => S,
      update: (S, org.apache.spark.sql.Row) => Unit,
      toBytes: S => Array[Byte],
      maxGroups: Int): Iterator[org.apache.spark.sql.Row] = {
    val buf = rows.buffered
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[org.apache.spark.sql.Row, S]
    new Iterator[Iterator[org.apache.spark.sql.Row]] {
      def hasNext: Boolean = buf.hasNext || acc.nonEmpty
      def next(): Iterator[org.apache.spark.sql.Row] = {
        while (buf.hasNext && (acc.size < maxGroups
            || acc.contains(buf.head.getStruct(0)))) {
          val r = buf.next()
          update(acc.getOrElseUpdate(r.getStruct(0), newSketch()), r)
        }
        val snap = acc.iterator.map { case (k, s) =>
          org.apache.spark.sql.Row.fromSeq(k.toSeq :+ toBytes(s))
        }.toVector
        acc.clear()
        snap.iterator
      }
    }.flatten
  }

  /** One mergeable DataSketches frequent-items sketch per group:
    * (groupCols..., fsketch binary). "Top URLs per (day, source) — and
    * any coarser rollup — without ever recounting": the sketch is
    * `maxMapSize` entries regardless of item cardinality, estimates carry
    * a documented error bound, and groups whose distinct-item count stays
    * under ~0.75·maxMapSize are EXACT (what the oracle-checked query
    * exploits at test SF). Spark exposes no frequency-sketch aggregate, so
    * the classic partial-aggregation shape is built by hand: phase 1
    * folds each input partition into one sketch per group it sees
    * (`mapPartitions`, no shuffle), phase 2 shuffles ONLY those partial
    * sketches — at most partitions × groups rows of ~maxMapSize entries
    * each — and merges them per group. At 100 TB that is the difference
    * between exchanging the corpus and exchanging kilobytes per
    * (partition, group); it is exactly what Spark's codegen'd aggregates
    * get from partial/final split, recovered for a sketch type Spark
    * doesn't ship. Exactness under ~0.75·maxMapSize distinct items per
    * group survives the split: merging never-purged sketches just adds
    * counts.
    *
    * Driver/executor memory: phase 1 holds one sketch per DISTINCT group
    * in the partition (each bounded by maxMapSize entries) — the same
    * working set a hash aggregate would hold.
    */
  def frequentSketches(
      df: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      maxMapSize: Int = 1024,
      flushEveryGroups: Int = 8192): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
      s"maxMapSize must be a power of two >= 8, got $maxMapSize")
    require(flushEveryGroups >= 1,
      s"flushEveryGroups must be >= 1, got $flushEveryGroups")
    val keySchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => df.schema(c)))
    val outSchema = keySchema.add("fsketch",
      org.apache.spark.sql.types.BinaryType, nullable = false)
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val pairs = df.select(struct(groupCols.map(col): _*).as("__k"),
      col(itemCol).cast("string").as("__v"))
    // phase 1 — map-side partials: one sketch per group per partition
    // (bounded live set; see partialsIterator)
    val partials = pairs.mapPartitions {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        partialsIterator[org.apache.datasketches.frequencies.ItemsSketch[String]](
          rows,
          () => new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize),
          (sk, r) => if (!r.isNullAt(1)) sk.update(r.getString(1)),
          _.toByteArray(StringSerDe),
          flushEveryGroups)
    }(outEnc)
    // phase 2 — shuffle the partials (sketch bytes, not items) and merge
    partials.groupByKey((r: org.apache.spark.sql.Row) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1)))(keyEnc)
      .mapGroups { (k: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val merged = new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)
        rows.foreach { r =>
          merged.merge(
            org.apache.datasketches.frequencies.ItemsSketch.getInstance(
              org.apache.datasketches.memory.Memory.wrap(
                r.getAs[Array[Byte]](r.length - 1)),
              StringSerDe))
        }
        org.apache.spark.sql.Row.fromSeq(k.toSeq :+ merged.toByteArray(StringSerDe))
      }(outEnc)
  }

  // ---- theta sketches: the SET-OPERATION member of the family. HLL
  // answers "how many distinct" but cannot intersect; theta sketches
  // support union AND intersection, so "how much does train shard A
  // overlap eval set B" — the contamination-estimate question
  // crossCorpusOverlap answers exactly by shuffling raw keys — becomes a
  // join of kilobyte summaries. EXACT while a group's distinct keys fit
  // the nominal entry count (2^lgK; default 2^14 covers the test SFs),
  // the standard theta error envelope beyond. ----

  /** One theta sketch per group: (groupCols..., tsketch binary). Same
    * two-phase/flush-bounded shape as [[frequentSketches]].
    */
  def thetaSketches(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      lgK: Int = 14,
      flushEveryGroups: Int = 8192): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")
    require(flushEveryGroups >= 1,
      s"flushEveryGroups must be >= 1, got $flushEveryGroups")
    val keySchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => df.schema(c)))
    val outSchema = keySchema.add("tsketch",
      org.apache.spark.sql.types.BinaryType, nullable = false)
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val pairs = df.select(struct(groupCols.map(col): _*).as("__k"),
      col(keyCol).cast("string").as("__v"))
    val partials = pairs.mapPartitions {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        partialsIterator[org.apache.datasketches.theta.UpdateSketch](
          rows,
          () => org.apache.datasketches.theta.UpdateSketch.builder()
            .setLogNominalEntries(lgK).build(),
          (sk, r) => if (!r.isNullAt(1)) { sk.update(r.getString(1)): Unit },
          _.compact().toByteArray,
          flushEveryGroups)
    }(outEnc)
    partials.groupByKey((r: org.apache.spark.sql.Row) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1)))(keyEnc)
      .mapGroups { (key: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val union = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(lgK).buildUnion()
        rows.foreach { r =>
          union.union(org.apache.datasketches.theta.Sketches.wrapSketch(
            org.apache.datasketches.memory.Memory.wrap(
              r.getAs[Array[Byte]](r.length - 1))))
        }
        org.apache.spark.sql.Row.fromSeq(
          key.toSeq :+ union.getResult.toByteArray)
      }(outEnc)
  }

  /** Union stored theta sketches up to `rollupCols` and estimate:
    * (rollupCols..., distinct_est DOUBLE). Exact-regime estimates are
    * integral. Like every rollup here, the input is the sketch table.
    */
  def rollupThetaDistinct(
      sketches: DataFrame,
      rollupCols: Seq[String],
      lgK: Int = 14,
      sketchCol: String = "tsketch"): DataFrame = {
    val global = rollupCols.isEmpty
    val keyCols = if (global) Seq(lit(0).as("__g")) else rollupCols.map(col)
    val keySchema =
      if (global) org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "__g", org.apache.spark.sql.types.IntegerType, nullable = false)))
      else org.apache.spark.sql.types.StructType(
        rollupCols.map(c => sketches.schema(c)))
    val outSchema = org.apache.spark.sql.types.StructType(
      (if (global) Nil else keySchema.fields.toSeq) :+
        org.apache.spark.sql.types.StructField("distinct_est",
          org.apache.spark.sql.types.DoubleType, nullable = false))
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    sketches.select(struct(keyCols: _*).as("__k"), col(sketchCol).as("__s"))
      .groupByKey((r: org.apache.spark.sql.Row) => r.getStruct(0))(keyEnc)
      .mapGroups { (key: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val union = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(lgK).buildUnion()
        rows.foreach { r =>
          union.union(org.apache.datasketches.theta.Sketches.wrapSketch(
            org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]](1))))
        }
        org.apache.spark.sql.Row.fromSeq(
          (if (global) Nil else key.toSeq) :+ union.getResult.getEstimate)
      }(outEnc)
  }

  /** Set estimates for every row carrying TWO theta sketches (`aCol`,
    * `bCol`): the sketch columns are replaced by `est_a`, `est_b`,
    * `est_intersection`, `est_union` doubles. The caller shapes the
    * pairing — a self-join of a [[thetaSketches]] table for pairwise
    * group overlap, a join of two different sketch stores for
    * train-vs-eval contamination. Exact-regime estimates are integral.
    */
  def thetaSetEstimates(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      lgK: Int = 14): DataFrame = {
    val keep = pairs.columns.filter(c => c != aCol && c != bCol).toSeq
    val outSchema = org.apache.spark.sql.types.StructType(
      keep.map(c => pairs.schema(c)) ++ Seq("est_a", "est_b",
        "est_intersection", "est_union").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val projected = pairs.select((keep.map(col) ++
      Seq(col(aCol).as("__a"), col(bCol).as("__b"))): _*)
    projected.mapPartitions { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.map { r =>
        val a = org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(
            r.getAs[Array[Byte]](keep.length)))
        val b = org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(
            r.getAs[Array[Byte]](keep.length + 1)))
        val inter = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(lgK).buildIntersection()
        inter.intersect(a)
        inter.intersect(b)
        val union = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(lgK).buildUnion()
        union.union(a)
        union.union(b)
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.dropRight(2) ++ Seq(a.getEstimate, b.getEstimate,
            inter.getResult.getEstimate, union.getResult.getEstimate))
      }
    }(outEnc)
  }

  // ---- quantiles (KLL), completing the mergeable-summary family:
  // distinct counts (HLL), heavy hitters (frequent items), and
  // distributions (quantiles) all share the store-fine/roll-up-coarse
  // pattern ----

  /** One mergeable KLL doubles sketch per group: (groupCols..., qsketch
    * binary). "p50/p95/p99 doc length per (day, source) — and any coarser
    * rollup — without ever re-sorting": the sketch is O(k·log n) bytes
    * with a ~1.65% (k=200) normalized rank error, EXACT while a group's
    * non-null count stays ≤ k (what the oracle-checked query exploits at
    * test SF — default k=4096 keeps sf0.1 groups exact). Same two-phase
    * shape as [[frequentSketches]]: per-partition partials via
    * `mapPartitions`, then a merge shuffle of sketch bytes only.
    *
    * NULL values carry no rank information and are skipped; a group with
    * zero non-null values yields an empty sketch, and [[rollupQuantiles]]
    * emits no rows for it (where SQL's quantile would emit NULL).
    */
  def quantileSketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 4096,
      flushEveryGroups: Int = 8192): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
    require(flushEveryGroups >= 1,
      s"flushEveryGroups must be >= 1, got $flushEveryGroups")
    val keySchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => df.schema(c)))
    val outSchema = keySchema.add("qsketch",
      org.apache.spark.sql.types.BinaryType, nullable = false)
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val pairs = df.select(struct(groupCols.map(col): _*).as("__k"),
      col(valueCol).cast("double").as("__v"))
    val partials = pairs.mapPartitions {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        partialsIterator[org.apache.datasketches.kll.KllDoublesSketch](
          rows,
          () => org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k),
          (sk, r) => if (!r.isNullAt(1)) sk.update(r.getDouble(1)),
          _.toByteArray,
          flushEveryGroups)
    }(outEnc)
    partials.groupByKey((r: org.apache.spark.sql.Row) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1)))(keyEnc)
      .mapGroups { (key: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val merged =
          org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        rows.foreach { r =>
          merged.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(
              r.getAs[Array[Byte]](r.length - 1))))
        }
        org.apache.spark.sql.Row.fromSeq(key.toSeq :+ merged.toByteArray)
      }(outEnc)
  }

  /** Merge stored quantile sketches up to `rollupCols` and evaluate the
    * requested ranks: (rollupCols..., prob, quantile), one row per group
    * per prob, INCLUSIVE rank semantics — the smallest stored value whose
    * cumulative fraction ≥ prob, i.e. SQL `percentile_disc`/DuckDB
    * `quantile_disc` exactly while the sketches are in exact range.
    * Empty (all-null) groups emit nothing. Like [[rollupDistinct]], the
    * input is the sketch table — raw values are never rescanned.
    */
  def rollupQuantiles(
      sketches: DataFrame,
      rollupCols: Seq[String],
      probs: Seq[Double],
      k: Int = 4096,
      sketchCol: String = "qsketch"): DataFrame = {
    require(probs.nonEmpty, "probs must be non-empty")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1], got $probs")
    val global = rollupCols.isEmpty
    val keyCols = if (global) Seq(lit(0).as("__g")) else rollupCols.map(col)
    val keySchema =
      if (global) org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "__g", org.apache.spark.sql.types.IntegerType, nullable = false)))
      else org.apache.spark.sql.types.StructType(
        rollupCols.map(c => sketches.schema(c)))
    val outSchema = org.apache.spark.sql.types.StructType(
      (if (global) Nil else keySchema.fields.toSeq) ++ Seq(
        org.apache.spark.sql.types.StructField(
          "prob", org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "quantile", org.apache.spark.sql.types.DoubleType, nullable = false)))
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val sortedProbs = probs.distinct.sorted
    val pairs = sketches.select(struct(keyCols: _*).as("__k"),
      col(sketchCol).as("__s"))
    pairs.groupByKey((r: org.apache.spark.sql.Row) => r.getStruct(0))(keyEnc)
      .flatMapGroups { (key: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val merged =
          org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        rows.foreach { r =>
          merged.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(
              r.getAs[Array[Byte]](1))))
        }
        if (merged.isEmpty) Iterator.empty
        else sortedProbs.iterator.map { p =>
          org.apache.spark.sql.Row.fromSeq(
            (if (global) Nil else key.toSeq) ++ Seq(p,
              merged.getQuantile(p,
                org.apache.datasketches.quantilescommon
                  .QuantileSearchCriteria.INCLUSIVE)))
        }
      }(outEnc)
  }

  /** Merge stored frequency sketches up to `rollupCols` and emit the
    * top-`k` items per rollup group: (rollupCols..., rank, item, est) with
    * the deterministic (estimate desc, item asc) tie-break. Like
    * [[rollupDistinct]], the input is the sketch table — raw items are
    * never rescanned.
    */
  def rollupFrequent(
      sketches: DataFrame,
      rollupCols: Seq[String],
      k: Int,
      maxMapSize: Int = 1024,
      sketchCol: String = "fsketch"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // an empty grouping is routed through a constant key (MapGroupsExec
    // rejects a Nil clustering) and the key is dropped from the output
    val global = rollupCols.isEmpty
    val keyCols = if (global) Seq(lit(0).as("__g")) else rollupCols.map(col)
    val keySchema =
      if (global) org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "__g", org.apache.spark.sql.types.IntegerType, nullable = false)))
      else org.apache.spark.sql.types.StructType(
        rollupCols.map(c => sketches.schema(c)))
    val outSchema = org.apache.spark.sql.types.StructType(
      (if (global) Nil else keySchema.fields.toSeq) ++ Seq(
        org.apache.spark.sql.types.StructField(
          "rank", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "item", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "est", org.apache.spark.sql.types.LongType, nullable = false)))
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val pairs = sketches.select(struct(keyCols: _*).as("__k"),
      col(sketchCol).as("__s"))
    pairs.groupByKey((r: org.apache.spark.sql.Row) => r.getStruct(0))(keyEnc)
      .flatMapGroups { (key: org.apache.spark.sql.Row,
          rows: Iterator[org.apache.spark.sql.Row]) =>
        val merged = new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)
        rows.foreach { r =>
          merged.merge(org.apache.datasketches.frequencies.ItemsSketch.getInstance(
            org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]](1)),
            StringSerDe))
        }
        merged
          .getFrequentItems(
            org.apache.datasketches.frequencies.ErrorType.NO_FALSE_POSITIVES)
          .toSeq
          .map(r => (r.getItem, r.getEstimate))
          .sortBy { case (item, est) => (-est, item) }
          .take(k)
          .zipWithIndex
          .map { case ((item, est), i) =>
            org.apache.spark.sql.Row.fromSeq(
              (if (global) Nil else key.toSeq) ++ Seq(i + 1, item, est))
          }
          .iterator
      }(outEnc)
  }

  // ---- count-min sketch (Cormode & Muthukrishnan 2005): the
  // POINT-FREQUENCY member of the family. Frequent-items answers "what
  // are the top keys"; count-min answers "how often did THIS key occur"
  // for ANY key, in width×depth counters per group however many
  // distinct keys flowed through. Kept fully RELATIONAL — cells are
  // (group, row, bucket, cnt) ROWS, not a binary blob — which buys
  // three things at once: rollups are a plain additive groupBy-sum
  // (the same fold law as the combo-count stat logs — trivially
  // sum-mergeable, batch-appendable), map-side partial aggregation
  // bounds the shuffle at groups×depth×width cells whatever the corpus
  // size, and the sha256 bucket idiom is reproducible in ANY engine —
  // so unlike the HLL/KLL/theta blobs this sketch has a FULL DuckDB
  // oracle twin, not a rows-only entry. Standard guarantees: estimates
  // never undercount; overcount ≤ (e/width)·N with probability
  // ≥ 1 − e^(−depth). ----

  private def cmsBuckets(
      key: Column, depth: Int, width: Int, salt: String): Column =
    array((0 until depth).map(i =>
      graft.functions.Hashing.hexPrefixBucket(key, s"$salt:$i", width)): _*)

  /** Build count-min cells per group: `(groupCols..., __d, __b, cnt)`
    * — at most groups × depth × width rows. `weightCol` (optional,
    * cast to long) weights each occurrence; null keys are skipped.
    * Persist keyed by the finest grouping (the [[distinctSketches]]
    * write-side contract); any coarser view is [[rollupCms]].
    */
  def cmsSketches(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      depth: Int = 4,
      width: Int = 2048,
      salt: String = "graft",
      weightCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(depth >= 1 && depth <= 16, s"depth must be in 1..16, got $depth")
    require(width >= 16 && width <= (1 << 22),
      s"width must be in 16..${1 << 22}, got $width")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.where(col(keyCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        posexplode(cmsBuckets(col(keyCol).cast("string"), depth, width, salt))
          .as(Seq("__d", "__b")),
        w.as("__w")): _*)
      .groupBy((groupCols :+ "__d" :+ "__b").map(col): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Roll cells up to a coarser grouping (empty `rollupCols` = one
    * global sketch): the additive fold — cells are sum-mergeable by
    * construction, so this never touches raw keys.
    */
  def rollupCms(cells: DataFrame, rollupCols: Seq[String]): DataFrame =
    cells.groupBy((rollupCols :+ "__d" :+ "__b").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Equi-join cardinality estimate from two GLOBAL cell tables — the
    * count-min inner product (Cormode & Muthukrishnan 2005 §4.2; the
    * AGMS family): `est = min over rows d of Σ_b cntA(d,b)·cntB(d,b)`.
    * Never underestimates the true join size; expected overestimate is
    * bounded by `(e/width)·|A|·|B|`. The 100 TB use: size a shuffle
    * join from two kilobyte summaries BEFORE launching it (route to
    * broadcast/salt/abort on the answer), no scan of either side.
    *
    * Both cell tables must be global (rolled with `rollupCms(_, Nil)`)
    * and built with the SAME depth/width/salt — cells carry no sidecar,
    * the geometry is the caller's contract. LONG arithmetic throughout:
    * exact while every per-cell product and the per-row sum stay under
    * 2⁶³ (corpora into the billions of rows per side). Returns one row
    * `(join_size_est)`.
    */
  def cmsJoinSize(
      cellsA: DataFrame, cellsB: DataFrame, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in 1..16, got $depth")
    val a = cellsA.select(col("__d"), col("__b"), col("cnt").as("__ca"))
    val b = cellsB.select(col("__d"), col("__b"), col("cnt").as("__cb"))
    val ip = a.join(b, Seq("__d", "__b"))
      .groupBy("__d").agg(sum(col("__ca") * col("__cb")).as("__ip"))
    // a depth row with NO overlapping cells has inner product 0 — the
    // inner join dropped it, so refill against the full 0..depth-1
    // range (disjoint key sets must estimate 0, not min-of-the-rest)
    cellsA.sparkSession.range(depth)
      .select(col("id").cast("int").as("__d"))
      .join(ip, Seq("__d"), "left")
      .agg(min(coalesce(col("__ip"), lit(0L))).as("join_size_est"))
  }

  /** Point-frequency estimates for a probe key list against stored
    * cells: `(groupCols..., key, freq_est)` for every (group, probe)
    * pair — min over the depth rows, absent cells counting 0. The
    * probe side is distinct-deduped and broadcast (probe lists are
    * small by contract); `depth`/`width`/`salt` must match the build
    * (cells carry no sidecar — they are a table, not a store).
    * Integer sums and mins only: engine-exact.
    */
  def cmsPointEstimates(
      cells: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 2048,
      salt: String = "graft"): DataFrame = {
    val groupCols = cells.columns.filterNot(Set("__d", "__b", "cnt")).toSeq
    require(groupCols.nonEmpty,
      "cells must carry at least one group column (got only sketch columns)")
    val probes = keys.select(col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
      .select(col("key"),
        posexplode(cmsBuckets(col("key"), depth, width, salt))
          .as(Seq("__d", "__b")))
    val groups = cells.select(groupCols.map(col): _*).distinct()
    groups.crossJoin(broadcast(probes))
      .join(cells, groupCols ++ Seq("__d", "__b"), "left")
      .withColumn("__c", coalesce(col("cnt"), lit(0L)))
      .groupBy((groupCols :+ "key").map(col): _*)
      .agg(min(col("__c")).as("freq_est"))
  }
}
