package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val raw = Seq(
    (1L, "der hund läuft schnell"),
    (2L, "the cat sits quietly here"),
    (3L, "der hund und die katze"),
    (4L, "machine learning at scale"),
    (5L, ""),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  // target distribution: the German-looking docs
  private val target = raw.where(col("doc_id").isin(1L, 3L))

  test("importanceWeights favors target-like docs, zero for empty docs") {
    val w = Selection.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(w(5L) == 0L && w(6L) == 0L)
    // German docs score strictly above the English ones
    assert(Seq(w(1L), w(3L)).min > Seq(w(2L), w(4L)).max,
      s"expected target-like docs to outrank: $w")
  }

  // replicate the contract in plain Scala: bucket = sha256 prefix mod B,
  // w(b) = round(1e6*((ln(ct+1)-ln(nt+B)-ln(cr+1))+ln(nr+B))), doc
  // weight = exact integer sum over term occurrences
  private def expectedWeights(maxNgram: Int): Map[Long, Long] = {
    val buckets = 4096
    def bucket(term: String): Long = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${term.toLowerCase}:graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % buckets
    }
    def terms(t: String): Seq[String] = {
      val toks = Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
      if (maxNgram == 1) toks
      else toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val rawDocs = raw.as[(Long, String)].collect().toSeq
    val targetIds = Set(1L, 3L)
    val cr = rawDocs.flatMap(d => terms(d._2)).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val ct = rawDocs.filter(d => targetIds(d._1)).flatMap(d => terms(d._2))
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (cr.values.sum, ct.values.sum)
    def wOf(b: Long): Long = math.round(1000000.0 *
      ((math.log(ct.getOrElse(b, 0L) + 1.0) - math.log(nt + buckets.toDouble)
        - math.log(cr.getOrElse(b, 0L) + 1.0)) + math.log(nr + buckets.toDouble)))
    rawDocs.map { case (id, t) => id -> terms(t).map(w => wOf(bucket(w))).sum }.toMap
  }

  test("importanceWeights matches the hand-computed formula exactly") {
    val actual = Selection.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(actual == expectedWeights(maxNgram = 1))
  }

  test("importanceWeights with bigrams matches the hand-computed formula exactly") {
    val actual = Selection.importanceWeights(raw, target, "doc_id", "text",
      maxNgram = 2).as[(Long, Long)].collect().toMap
    assert(actual == expectedWeights(maxNgram = 2))
  }

  test("maxNgram=2 hashes bigrams too and changes the scores") {
    val uni = Selection.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val bi = Selection.importanceWeights(raw, target, "doc_id", "text",
      maxNgram = 2).as[(Long, Long)].collect().toMap
    assert(bi.keySet == uni.keySet)
    assert(bi(1L) != uni(1L), "bigram features should shift a multi-token doc's score")
    assert(bi(5L) == 0L, "empty doc stays 0 with bigrams")
    // ordering property still holds
    assert(Seq(bi(1L), bi(3L)).min > Seq(bi(2L), bi(4L)).max)
  }

  test("importanceResample keeps top-k deterministically") {
    val top2 = Selection.importanceResample(raw, target, "doc_id", "text", k = 2)
    assert(top2.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val again = Selection.importanceResample(raw, target, "doc_id", "text", k = 2)
    assert(top2.except(again).isEmpty && again.except(top2).isEmpty)
  }

  test("semanticDedup removes planted exact duplicates, keeps distinct vectors") {
    val e = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = e.unionAll(planted)
    val kept = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      nclusters = 8, threshold = 0.995)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    // every planted copy collapses onto its original (min id survives,
    // and the planted id is always the larger one)
    val plantedIds = planted.select("vec_id").as[Long].collect().toSet
    assert(plantedIds.nonEmpty && plantedIds.forall(id => !keptIds.contains(id)),
      "planted duplicate ids must be dropped")
    // planted copies join existing singletons/clusters → survivor count is
    // exactly what deduping the originals alone yields
    val baseline = Dedup.semanticDedup(e, "vec_id", "embedding",
      nclusters = 8, threshold = 0.995).count()
    assert(kept.count() == baseline)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
  }

  test("seeded quantizer is deterministic and cells cover the corpus") {
    val e = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), col("embedding"))
    val a = Ann.Ivf.buildSeeded(e, "vec_id", "embedding", nlist = 8, seed = 7L)
    val b = Ann.Ivf.buildSeeded(e, "vec_id", "embedding", nlist = 8, seed = 7L)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
    // every row gets exactly one cell; identical vectors share a cell
    assert(a.assigned.count() == e.count())
    val cells = a.assigned.select("__cell").distinct().count()
    assert(cells > 1 && cells <= 8)
    // a different seed picks different centroids (not a constant function)
    val c = Ann.Ivf.buildSeeded(e, "vec_id", "embedding", nlist = 8, seed = 8L)
    assert(c.centroids.map(_._2.toSeq).toSeq != a.centroids.map(_._2.toSeq).toSeq)
  }

  test("semanticDedup keepBy prefers the flagged survivor") {
    // one-hot 8-dim vectors: distinct ids are exactly orthogonal, copies
    // are exact duplicates — fully deterministic clustering input
    val originals = (0 until 8).map { i =>
      val v = Array.fill(8)(0.0f); v(i) = 1.0f
      (i.toLong, v.toSeq, 1)
    }
    val copies = originals.map { case (id, v, _) => (id + 500L, v, 0) }
    val corpus = (originals ++ copies).toDF("vec_id", "embedding", "pref")
    // quantizer="kmeans" keeps the MLlib path exercised alongside the
    // seeded default the other tests run
    val kept = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      nclusters = 4, threshold = 0.995, keepBy = Seq(col("pref").asc),
      quantizer = "kmeans")
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    assert(keptIds == copies.map(_._1).toSet,
      s"with keepBy on pref asc the pref=0 copy must survive, got $keptIds")
  }

  test("percentileRank: percent_rank per group, ties share, single-row group scores 0, nulls loud") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 20.0), ("en", 4L, 40.0),
      ("de", 5L, 7.0)).toDF("lang", "id", "score")
    val out = Selection.percentileRank(df, "score", Seq("lang"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct")).toMap
    // en: ranks 1, 2, 2, 4 of n=4 -> (r-1)/3
    assert(out(1L) == 0.0 && out(4L) == 1.0)
    assert(out(2L) == out(3L) && out(2L) == 0.333333)
    assert(out(5L) == 0.0, "single-row group is 0 by percent_rank definition")
    intercept[IllegalArgumentException](
      Selection.percentileRank(df, "score", Nil))
    val withNull = Seq(("en", 1L, java.lang.Double.valueOf(1.0)),
      ("en", 2L, null: java.lang.Double)).toDF("lang", "id", "score")
    intercept[Exception](
      Selection.percentileRank(withNull, "score", Seq("lang")).collect())
  }

  test("quantileBuckets splits each group into labeled ntile bands") {
    val df = Seq(
      (1L, "en", 1.0), (2L, "en", 2.0), (3L, "en", 3.0),
      (4L, "en", 4.0), (5L, "en", 5.0), (6L, "en", 6.0),
      (7L, "de", 10.0), (8L, "de", 20.0), (9L, "de", 30.0), (10L, "de", 40.0)
    ).toDF("doc_id", "lang", "score")
    val out = Selection.quantileBuckets(df, "score",
      tieBreakCols = Seq("doc_id"), groupCols = Seq("lang"))
      .select("doc_id", "bucket", "bucket_label")
      .as[(Long, Int, String)].collect()
      .map { case (id, b, l) => id -> (b, l) }.toMap
    // en: 6 rows / 3 tiles -> 2 per band
    assert(out(1L) == (1, "head") && out(2L) == (1, "head"))
    assert(out(3L) == (2, "middle") && out(4L) == (2, "middle"))
    assert(out(5L) == (3, "tail") && out(6L) == (3, "tail"))
    // de: 4 rows -> first tile gets the extra row
    assert(out(7L) == (1, "head") && out(8L) == (1, "head"))
    assert(out(9L) == (2, "middle") && out(10L) == (3, "tail"))
  }

  test("quantileBuckets breaks score ties by the tie-break key, keeps NULLs out of tiles") {
    val df = Seq[(Long, java.lang.Double)](
      (3L, 1.0), (1L, 1.0), (2L, 1.0), (4L, null)
    ).toDF("doc_id", "score")
    val out = Selection.quantileBuckets(df, "score",
      tieBreakCols = Seq("doc_id"), buckets = 3)
      .select("doc_id", "bucket", "bucket_label").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[Integer]("bucket")), Option(r.getAs[String]("bucket_label"))))
      .toMap
    // equal scores: doc_id ordering decides the tile, not engine whim
    assert(out(1L)._1.contains(1) && out(2L)._1.contains(2)
      && out(3L)._1.contains(3))
    // NULL score never occupies a tile slot nor shifts the others
    assert(out(4L) == (None, None))
  }

  test("quantileBuckets rejects a missing tie-break and bad label arity") {
    val df = Seq((1L, 1.0)).toDF("doc_id", "score")
    intercept[IllegalArgumentException] {
      Selection.quantileBuckets(df, "score", tieBreakCols = Nil)
    }
    intercept[IllegalArgumentException] {
      Selection.quantileBuckets(df, "score", tieBreakCols = Seq("doc_id"),
        buckets = 4)
    }
  }

  test("labelErrors: matches a single-node confident-learning reference; joint; loud paths") {
    // (id, given, p_a); p_b = 1 - p_a. Mix of confident agreements,
    // confident DISAGREEMENTS (the label-error candidates), borderline
    // threshold-equality, and a nowhere-qualifying example.
    val fixture = Seq(
      (1L, "a", 0.95), (2L, "a", 0.20), (3L, "b", 0.10),
      (4L, "b", 0.85), (5L, "a", 0.97), (6L, "b", 0.05),
      (7L, "a", 0.55), (8L, "b", 0.45), (9L, "a", 0.96),
      (10L, "b", 0.08))
    val df = fixture.toDF("id", "given", "p_a")
      .withColumn("p_b", lit(1.0) - col("p_a"))
    // single-node reference with the operator's exact quantization
    def q(x: Double): Long = math.floor(x * 1e6).toLong
    val micros = fixture.map { case (id, g, pa) =>
      (id, g, Map("a" -> q(pa), "b" -> q(1.0 - pa)))
    }
    val thr = Seq("a", "b").map { c =>
      val own = micros.filter(_._2 == c).map(_._3(c))
      c -> ((own.sum, own.size.toLong))
    }.toMap
    val expected = micros.flatMap { case (id, g, ps) =>
      val qual = Seq("a", "b").filter(c =>
        ps(c) * thr(c)._2 >= thr(c)._1)
      if (qual.isEmpty) None
      else {
        val conf = qual.minBy(c => (-ps(c), c))
        Some((id, g, conf, ps(conf), ps(g), conf != g))
      }
    }.toSet
    val got = Selection.labelErrors(df, "id", "given",
      Seq("a" -> "p_a", "b" -> "p_b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // the planted disagreements are flagged, agreements are not
    assert(got.filter(_._6).map(_._1) == expected.filter(_._6).map(_._1))
    assert(got.exists(_._6), "fixture must produce at least one flag")
    // the 0.55/0.45 borderline must be PRESENT (threshold equality
    // qualifies — the >= contract) in both reference and operator
    assert(got.exists(_._1 == 7L) == expected.exists(_._1 == 7L))
    // confident joint equals the reference aggregation
    val gotJoint = Selection.confidentJoint(df, "id", "given",
      Seq("a" -> "p_a", "b" -> "p_b"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expJoint = expected.toSeq.groupBy(e => (e._2, e._3))
      .map { case (k, v) => k -> v.size.toLong }
    assert(gotJoint == expJoint, s"joint $gotJoint vs $expJoint")
    // loud: stray given label, too few classes, duplicate class
    intercept[IllegalArgumentException](
      Selection.labelErrors(df.withColumn("given", lit("zz")), "id",
        "given", Seq("a" -> "p_a", "b" -> "p_b")))
    intercept[IllegalArgumentException](
      Selection.labelErrors(df, "id", "given", Seq("a" -> "p_a")))
    intercept[IllegalArgumentException](
      Selection.labelErrors(df, "id", "given",
        Seq("a" -> "p_a", "a" -> "p_b")))
  }

  test("preferencePairs: max-margin pair per group, ties and singletons yield none, margin gate, loud contracts") {
    val rows = Seq(
      ("g1", 1L, 900L), ("g1", 2L, 100L), ("g1", 3L, 500L), // margin 800
      ("g2", 4L, 700L),                                     // singleton
      ("g3", 5L, 5L), ("g3", 6L, 5L),                       // all tied
      ("g4", 7L, 9L), ("g4", 8L, 9L), ("g4", 9L, 1L),       // tie at top
      ("g5", 10L, 300L), ("g5", 11L, 150L))                 // margin 150
      .toDF("g", "id", "s")
    def run(min: Long) = Selection.preferencePairs(rows, "g", "id", "s",
      minMarginMicros = min)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin")))).toMap
    val all = run(0L)
    assert(all == Map(
      "g1" -> ((1L, 2L, 800L)),
      "g4" -> ((7L, 9L, 8L)), // top tie breaks to the smaller id
      "g5" -> ((10L, 11L, 150L))), all.toString)
    // margin gate drops the weak pair, keeps the strong ones
    assert(run(300L).keySet == Set("g1"))
    // NULL group drops; NULL id/score and double scores are loud
    val withNullG = rows.unionByName(
      Seq((null.asInstanceOf[String], 12L, 999L)).toDF("g", "id", "s"))
    assert(Selection.preferencePairs(withNullG, "g", "id", "s")
      .count() == 3L)
    intercept[IllegalArgumentException](Selection.preferencePairs(
      Seq(("a", 1L, 0.5)).toDF("g", "id", "s"), "g", "id", "s"))
    intercept[IllegalArgumentException](Selection.preferencePairs(
      Seq(("a", 1L, Option.empty[Long])).toDF("g", "id", "s"),
      "g", "id", "s"))
    intercept[IllegalArgumentException](Selection.preferencePairs(
      rows, "g", "id", "s", minMarginMicros = -1L))
    // plan pin: the rank-1 filters must ride WindowGroupLimit (each map
    // task keeps only the per-group top row BEFORE the exchange) and
    // shuffle on the group hash only — a skewed prompt never floods
    // the exchange with its full candidate list
    val plan = Selection.preferencePairs(rows, "g", "id", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-1 windows lost the WindowGroupLimit pushdown:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no sort-based exchange expected:\n$plan")
  }
}
