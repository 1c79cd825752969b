package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def wordDoc(i: Int): String =
    Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .drop(i % 3).mkString(" ") + s" omega theta iota"

  private def junkDoc(i: Int): String =
    Seq("x9", "77", "q2q", "0z0", "##", "8y8").drop(i % 3).mkString(" ") +
      s" 42 1337 zz9"

  test("docFeatures run-length groups buckets in-row, empty docs kept") {
    val df = Seq((1, "a b a b a"), (0, "")).toDF("y", "text")
    val rows = Classifier.docFeatures(df, "text", "y", 16)
      .collect().map(r => r.getAs[Int]("__y") ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(f => f.getAs[Long]("bucket") -> f.getAs[Long]("cnt")).toMap)
      .toMap
    val feats = rows(1)
    assert(feats.values.sum == 5, "counts must cover every token instance")
    assert(feats.size == 2, "two distinct tokens -> two buckets (no collision at dim 16 for a/b)")
    assert(rows(0).isEmpty, "empty doc -> empty feature array, row kept")
  }

  test("logitMicros is the exact integer sum of bucket weights") {
    val dim = 8
    val w = (0 until dim).map(j => (j * 10 + 1).toLong)
    val out = Seq(("a a b", 1)).toDF("text", "i")
      .select(Classifier.logitMicros(col("text"), w, 7L).as("z"))
      .head().getAs[Long]("z")
    // recompute driver-side with the same hash
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % dim).toInt
    }
    val want = 7L + 2 * w(bucket("a")) + w(bucket("b"))
    assert(out == want)
  }

  test("warm start composes exactly: train(a+b) == train(b, init = train(a))") {
    val docs = (0 until 40).map(i => (wordDoc(i), 0)) ++
      (0 until 40).map(i => (junkDoc(i), 1))
    val df = docs.toDF("text", "label")
    val full = Classifier.train(df, "text", "label", dim = 128, iters = 8, lr = 1.0)
    val half = Classifier.train(df, "text", "label", dim = 128, iters = 4, lr = 1.0)
    val resumed = Classifier.train(df, "text", "label", dim = 128, iters = 4,
      lr = 1.0, init = Some(half))
    assert(resumed.weightsMicros.toSeq == full.weightsMicros.toSeq
      && resumed.biasMicros == full.biasMicros,
      "integer-exact GD must make warm-start composition bit-identical")
    intercept[IllegalArgumentException](Classifier.train(
      df, "text", "label", dim = 64, init = Some(half)))
  }

  test("saveModel/loadModel round-trips bit-for-bit; crashed save is loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_").toString
    val m = Classifier.TextClassifierModel(
      Array.tabulate(32)(i => (i * 7 - 100).toLong), biasMicros = 42L)
    Classifier.saveModel(spark, m, s"$dir/model")
    val back = Classifier.loadModel(spark, s"$dir/model")
    assert(back.weightsMicros.toSeq == m.weightsMicros.toSeq
      && back.biasMicros == m.biasMicros)
    val df = Seq(("alpha beta gamma", 1)).toDF("text", "i")
    val a = m.scoreLogit(df, "text").head().getAs[Long]("logit_micros")
    val b = back.scoreLogit(df, "text").head().getAs[Long]("logit_micros")
    assert(a == b)
    // parquet present but sidecar missing = crashed save -> loud
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/model/${Classifier.ParamsFileName}"), false)
    val e = intercept[IllegalStateException] {
      Classifier.loadModel(spark, s"$dir/model")
    }
    assert(e.getMessage.contains("no committed classifier model"))
  }

  test("train separates planted classes and is run-to-run deterministic") {
    val docs = (0 until 60).map(i => (wordDoc(i), 0)) ++
      (0 until 60).map(i => (junkDoc(i), 1))
    val df = docs.toDF("text", "label")
    val m1 = Classifier.train(df, "text", "label", dim = 256, iters = 15, lr = 1.0)
    val m2 = Classifier.train(df, "text", "label", dim = 256, iters = 15, lr = 1.0)
    assert(m1.weightsMicros.toSeq == m2.weightsMicros.toSeq &&
      m1.biasMicros == m2.biasMicros,
      "integer-unit training must be bit-identical across runs")
    val scored = m1.scoreLogit(df, "text")
    val acc = scored.where((col("logit_pos") === (col("label") === 1))).count() /
      docs.size.toDouble
    assert(acc >= 0.95, s"train-set accuracy $acc below 0.95")
  }

  test("trainingDynamics: easy examples confident, mislabeled twin hard, stats replay the snapshots exactly") {
    // planted geometry: two cleanly separable classes, plus ONE junk doc
    // mislabeled as class 0 — the classic label-noise case cartography
    // exists to surface (low confidence on its TRUE-class probability)
    val docs = (0 until 30).map(i => (i.toLong, wordDoc(i), 0)) ++
      (0 until 30).map(i => ((100 + i).toLong, junkDoc(i), 1)) :+
      ((999L, junkDoc(3), 0))
    val df = docs.toDF("id", "text", "label")
    val dyn = Classifier.trainingDynamics(
      df, "id", "text", "label", dim = 256, iters = 15, lr = 1.0)
    val rows = dyn.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Double]("confidence"), r.getAs[Double]("variability"),
        r.getAs[Long]("n_correct")))).toMap
    graft.core.Caches.releaseCheckpoint(dyn)
    assert(rows.size == docs.size)
    val clean = rows.filter(_._1 != 999L).values
    val noisy = rows(999L)
    // the mislabeled twin must sit BELOW every clean doc's confidence:
    // the model sees 30 identical-shaped docs pulling the other way
    assert(noisy._1 < clean.map(_._1).min,
      s"mislabeled doc confidence ${noisy._1} not the minimum")
    assert(noisy._3 <= 2L, s"mislabeled doc correct in ${noisy._3}/15 epochs")
    // easy examples: confident and mostly correct
    assert(clean.count(_._1 > 0.8) >= 50,
      "most clean docs should be high-confidence")
    // stats replay: confidence/variability/n_correct recompute from the
    // per-epoch snapshot probabilities of one doc (driver replay of the
    // exact integer pipeline via scoreLogit on each snapshot)
    val feats = df.where(col("id") === 0L)
    val probs = (1 to 15).map { k =>
      val m = Classifier.train(df, "text", "label", dim = 256, iters = k,
        lr = 1.0)
      val z = m.scoreLogit(feats, "text").head().getAs[Long]("logit_micros")
      math.round((1.0 / (1.0 + math.exp(-z / 1e6))) * 1e6) // y=0 doc? id 0 has label 0
    }
    // id 0 label is 0 -> p_true = 1 - sigmoid
    val pTrue = probs.map(p => 1000000L - p)
    val s1 = pTrue.sum
    val s2 = pTrue.map(p => p * p).sum
    val wantConf = BigDecimal(s1.toDouble / (15 * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantVar = BigDecimal(math.sqrt((15L * s2 - s1 * s1).toDouble) /
      (15 * 1e6)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0L)._1 == wantConf, s"${rows(0L)._1} != $wantConf")
    assert(rows(0L)._2 == wantVar, s"${rows(0L)._2} != $wantVar")
    assert(rows(0L)._3 == pTrue.count(_ > 500000L))
    // loud contracts
    intercept[IllegalArgumentException](Classifier.trainingDynamics(
      df, "id", "text", "label", dim = 256, iters = 65))
    // dim·iters > 2^22 builds a multi-GB literal plan — refused eagerly
    // even though each axis alone is inside its bound
    val eCombo = intercept[IllegalArgumentException](
      Classifier.trainingDynamics(
        df, "id", "text", "label", dim = 1 << 20, iters = 8))
    assert(eCombo.getMessage.contains("PLAN LITERALS"), eCombo.getMessage)
    intercept[IllegalArgumentException](Classifier.trainingDynamics(
      Seq((1L, "a", 2)).toDF("id", "text", "label"), "id", "text", "label",
      dim = 64, iters = 2))
  }

  test("train rejects null and out-of-range labels loudly") {
    // a null label would silently drop the doc from every gradient while
    // still inflating n; a label of 2 would silently shift the target
    val withNull = Seq(("a b c", Some(1)), ("d e f", None))
      .toDF("text", "label")
    val eNull = intercept[IllegalArgumentException](
      Classifier.train(withNull, "text", "label", dim = 64, iters = 1))
    assert(eNull.getMessage.contains("null or outside"))
    val uncastable = Seq(("a b c", "1"), ("d e f", "yes"))
      .toDF("text", "label") // "yes" casts to null int
    intercept[IllegalArgumentException](
      Classifier.train(uncastable, "text", "label", dim = 64, iters = 1))
    val outOfRange = Seq(("a b c", 1), ("d e f", 2)).toDF("text", "label")
    intercept[IllegalArgumentException](
      Classifier.train(outOfRange, "text", "label", dim = 64, iters = 1))
  }

  test("conformalThreshold picks the exact order statistic") {
    // n = 9, alpha = 0.1: k = ceil(10 * 0.9) = 9 -> the 9th smallest
    val scores = (1L to 9L).map(_ * 10L)
    val out = Classifier.conformalThreshold(
      scores.toDF("s"), "s", alphaMicros = 100000L).head()
    assert(out.getAs[Long]("n") == 9 && out.getAs[Long]("k") == 9)
    assert(out.getAs[Long]("threshold") == 90L)
    // alpha = 0.5: k = ceil(10 * .5) = 5 -> the median-ish statistic
    val mid = Classifier.conformalThreshold(
      scores.toDF("s"), "s", alphaMicros = 500000L).head()
    assert(mid.getAs[Long]("k") == 5 && mid.getAs[Long]("threshold") == 50L)
    // ties: duplicate scores still count positions
    val tied = Seq(10L, 10L, 10L, 20L).toDF("s")
    val t = Classifier.conformalThreshold(tied, "s", 500000L).head()
    assert(t.getAs[Long]("k") == 3 && t.getAs[Long]("threshold") == 10L)
    // k > n: coverage not certifiable -> NULL threshold, not +inf
    val tiny = Seq(1L, 2L).toDF("s")
    val small = Classifier.conformalThreshold(tiny, "s", 100000L).head()
    assert(small.getAs[Long]("k") == 3 && small.isNullAt(2))
    // partitioning invariance on a bigger pool
    val big = Seq.tabulate(500)(i => ((i * 37) % 211).toLong)
    val a = Classifier.conformalThreshold(big.toDF("s").repartition(1), "s")
      .head().getAs[Long]("threshold")
    val b = Classifier.conformalThreshold(big.toDF("s").repartition(11), "s")
      .head().getAs[Long]("threshold")
    assert(a == b)
    intercept[IllegalArgumentException](
      Classifier.conformalThreshold(tiny, "s", 0L))
    intercept[IllegalArgumentException](Classifier.conformalThreshold(
      Seq(Option.empty[Long]).toDF("s"), "s"))
  }

  test("reliabilityBins: exact bin mean and observed rate, edge clamping") {
    val rows = Seq(
      (50000L, 0), (150000L, 0), (250000L, 1),   // bins 0, 1, 2
      (950000L, 1), (999999L, 1), (1000000L, 0), // bin 9 (1e6 clamps in)
      (-5L, 0), (2000000L, 1))                   // clamp to bins 0 and 9
      .toDF("p", "y")
    val out = Classifier.reliabilityBins(rows.toDF("p", "y"), "p", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((2L, 0L, 25000L, 0.0)))   // 50000 and clamped 0
    assert(out(1L) == ((1L, 0L, 150000L, 0.0)))
    assert(out(2L) == ((1L, 1L, 250000L, 1.0)))
    // bin 9: 950000, 999999, 1000000, clamped 1000000 -> mean floor-div
    assert(out(9L)._1 == 4L && out(9L)._2 == 3L)
    assert(out(9L)._3 == (950000L + 999999L + 1000000L + 1000000L) / 4)
    assert(out(9L)._4 == 0.75)
    intercept[IllegalArgumentException](
      Classifier.reliabilityBins(rows.toDF("p", "y"), "p", "y", bins = 1))
    intercept[IllegalArgumentException](
      Classifier.reliabilityBins(Seq((1L, 2)).toDF("p", "y"), "p", "y"))
    // ECE over the same fixture, hand-summed from the bins above
    val ece = Classifier.expectedCalibrationError(
      rows.toDF("p", "y"), "p", "y").head()
    assert(ece.getAs[Long]("n") == 8)
    assert(ece.getAs[Double]("ece") == 0.2375,
      s"got ${ece.getAs[Double]("ece")}")
    // a perfectly calibrated constant scorer has ECE ~ 0
    val perfect = Seq((500000L, 1), (500000L, 0)).toDF("p", "y")
    assert(Classifier.expectedCalibrationError(perfect, "p", "y")
      .head().getAs[Double]("ece") == 0.0)
  }

  test("brierDecomposition: hand Murphy terms on the three textbook poles, loud guards") {
    def run(rows: Seq[(Long, Int)]) =
      Classifier.brierDecomposition(rows.toDF("p", "y"), "p", "y").head()
    def vals(r: org.apache.spark.sql.Row) =
      (r.getAs[Double]("brier"), r.getAs[Double]("reliability"),
        r.getAs[Double]("resolution"), r.getAs[Double]("uncertainty"))
    // perfect sharp forecasts: brier 0, fully resolved (res = unc)
    val sharp = run(Seq((1000000L, 1), (1000000L, 1), (0L, 0), (0L, 0)))
    assert(vals(sharp) == ((0.0, 0.0, 0.25, 0.25)), sharp.toString)
    assert(sharp.getAs[Long]("n") == 4L && sharp.getAs[Long]("bins") == 2L)
    // constant base-rate forecast: calibrated but zero resolution —
    // brier equals the uncertainty floor
    val flat = run(Seq((500000L, 1), (500000L, 0)))
    assert(vals(flat) == ((0.25, 0.0, 0.0, 0.25)), flat.toString)
    // miscalibrated constant forecast: p̄=0.25 vs ō=0.5 in one bin —
    // rel = (0.25−0.5)² = 0.0625, brier = rel + unc (within-bin var 0)
    val off = run(Seq((250000L, 0), (250000L, 1)))
    assert(vals(off) == ((0.3125, 0.0625, 0.0, 0.25)), off.toString)
    intercept[IllegalArgumentException](run(Seq((100000L, 2))))
    intercept[IllegalArgumentException](
      Classifier.brierDecomposition(
        Seq((Option.empty[Long], 1)).toDF("p", "y"), "p", "y"))
    intercept[IllegalArgumentException](run(Seq.empty))
  }

  test("woeTable matches hand arithmetic; IV sums the nano terms") {
    // cat a: 3 pos 1 neg; cat b: 1 pos 3 neg; P = 4, N = 4
    val rows = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0))
    val t = Classifier.woeTable(rows.toDF("f", "y"), "f", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val woeA = math.log((3.5 / 4.0) / (1.5 / 4.0))
    assert(t("a")._1 == 3 && t("a")._2 == 1)
    assert(t("a")._3 == math.rint(woeA * 1e6) / 1e6 ||
      math.abs(t("a")._3 - woeA) < 1e-6)
    // symmetry: b is a mirrored so woe_b = -woe_a, iv terms equal
    assert(math.abs(t("a")._3 + t("b")._3) < 1e-9)
    assert(t("a")._4 == t("b")._4)
    val iv = Classifier.informationValue(rows.toDF("f", "y"), "f", "y").head()
    assert(iv.getAs[Long]("n_categories") == 2)
    val expIv = (3.5 / 4 - 1.5 / 4) * woeA * 2
    assert(math.abs(iv.getAs[Double]("iv") - expIv) < 1e-6)
    // NULL category is a category; bad labels loud
    val withNull = Seq((Some("a"), 1), (None, 0)).toDF("f", "y")
    assert(Classifier.woeTable(withNull, "f", "y").count() == 2)
    intercept[IllegalArgumentException](
      Classifier.woeTable(Seq(("a", 2)).toDF("f", "y"), "f", "y"))
  }

  test("fitIsotonic pools adjacent violators exactly (hand-worked)") {
    // per-score (pos, n): rates .2 .4 0 .6 .4 1 -> PAV blocks
    // [s1]=.2, [s2,s3]=.2, [s4,s5]=.5, [s6]=1
    val rows = for {
      (s, pos, n) <- Seq((1L, 1, 5), (2L, 2, 5), (3L, 0, 5),
        (4L, 3, 5), (5L, 2, 5), (6L, 5, 5))
      i <- 0 until n
    } yield (s, if (i < pos) 1 else 0)
    val m = Classifier.fitIsotonic(rows.toDF("s", "y"), "s", "y", maxBins = 16)
    assert(m.minScore == 1L && m.binWidth == 1L)
    assert(m.probMicrosByBin.toSeq == Seq(
      200000L, 200000L, 200000L, 500000L, 500000L, 1000000L))
    // apply: exact lookups, clamped outside the observed range
    val applied = m.apply(
      Seq(0L, 1L, 3L, 6L, 99L).toDF("s"), "s", "p")
      .orderBy("s").select("p").as[Long].collect().toSeq
    assert(applied == Seq(200000L, 200000L, 200000L, 1000000L, 1000000L))
  }

  test("fitIsotonic is monotone, bin-bounded, and partitioning-exact") {
    val rows = Seq.tabulate(500)(i =>
      (((i * 97) % 250).toLong, if ((i * 31) % 7 < 3) 1 else 0))
    val a = Classifier.fitIsotonic(
      rows.toDF("s", "y").repartition(1), "s", "y", maxBins = 10)
    val b = Classifier.fitIsotonic(
      rows.toDF("s", "y").repartition(13), "s", "y", maxBins = 10)
    assert(a.probMicrosByBin.toSeq == b.probMicrosByBin.toSeq)
    assert(a.binWidth == 25L, "250-wide range over 10 bins")
    assert(a.probMicrosByBin.length <= 10)
    assert(a.probMicrosByBin.sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)), "PAV output must be monotone")
    assert(a.probMicrosByBin.forall(v => v >= 0L && v <= 1000000L))
  }

  test("fitIsotonic loud paths") {
    val bad = Seq((1L, 3)).toDF("s", "y")
    assert(intercept[IllegalArgumentException](
      Classifier.fitIsotonic(bad, "s", "y")).getMessage
      .contains("outside {0, 1}"))
    val nullScore = Seq((Option.empty[Long], 1)).toDF("s", "y")
    intercept[IllegalArgumentException](
      Classifier.fitIsotonic(nullScore, "s", "y"))
    intercept[IllegalArgumentException](
      Classifier.fitIsotonic(bad.limit(0), "s", "y"))
    val ok = Seq((1L, 1), (2L, 0)).toDF("s", "y")
    intercept[IllegalArgumentException](
      Classifier.fitIsotonic(ok, "s", "y", maxBins = 1))
    val m = Classifier.fitIsotonic(ok, "s", "y")
    intercept[IllegalArgumentException](
      m.apply(ok.withColumn("p", lit(1)), "s", "p"))
  }

  test("tracinInfluence: exact replay of epoch-summed gradient dots, top-k, absent disjoint pairs") {
    val corpus = Seq(
      (0L, "alpha alpha beta", 1),
      (1L, "alpha gamma", 0),
      (2L, "beta beta delta", 1),
      (3L, "gamma delta", 0),
      (4L, "alpha beta gamma delta", 1),
      (5L, "", 0)) // empty probe: no buckets -> no pairs, absent
    val docs = corpus.toDF("doc_id", "text", "label")
    val dim = 64; val iters = 3; val lr = 1.0
    val out = Classifier.tracinInfluence(docs,
        docs.where(col("doc_id") === 0L || col("doc_id") === 5L),
        "doc_id", "text", "label", dim = dim, iters = iters, lr = lr,
        topK = 3)
      .collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("train_id")) ->
        ((r.getAs[Long]("dot"), r.getAs[Long]("influence_micros"),
          r.getAs[Int]("rank")))).toMap
    // ---- pure-Scala replay of the whole computation ----
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % dim).toInt
    }
    val feats: Map[Long, Map[Int, Long]] = corpus.map { case (id, t, _) =>
      id -> t.split("\\s+").filter(_.nonEmpty).groupBy(bucket)
        .map { case (b, g) => b -> g.length.toLong }
    }.toMap
    val labels = corpus.map { case (id, _, y) => id -> y }.toMap
    val n = corpus.size
    val w = Array.fill(dim)(0L); var b = 0L
    val errs = scala.collection.mutable.Map.empty[(Long, Int), Long]
    for (t <- 0 until iters) {
      corpus.foreach { case (id, _, y) =>
        val z = b + feats(id).map { case (bk, c) => c * w(bk) }.sum
        errs((id, t)) = math.round(
          (1.0 / (1.0 + math.exp(-z / 1e6)) - y) * 1e9)
      }
      val g = scala.collection.mutable.Map.empty[Int, Long]
      var gb = 0L
      corpus.foreach { case (id, _, _) =>
        feats(id).foreach { case (bk, c) =>
          g(bk) = g.getOrElse(bk, 0L) + c * errs((id, t)) }
        gb += errs((id, t))
      }
      g.foreach { case (bk, gv) =>
        w(bk) -= math.round(lr * gv / (n * 1000.0)) }
      b -= math.round(lr * gb / (n * 1000.0))
    }
    val want = for {
      pr <- Seq(0L, 5L)
      tr <- corpus.map(_._1)
      dot = feats(pr).keySet.intersect(feats(tr).keySet).toSeq
        .map(bk => feats(pr)(bk) * feats(tr)(bk)).sum
      if dot > 0
    } yield (pr, tr) -> ((dot, (0 until iters).map(t =>
      math.round(lr * dot.toDouble * errs((tr, t)) * errs((pr, t)) / 1e12))
      .sum))
    val ranked = want.groupBy(_._1._1).flatMap { case (_, ps) =>
      ps.sortBy { case ((_, tr), (_, i)) => (-i, tr) }.take(3).zipWithIndex
        .map { case (((pr, tr), (d, i)), k) => (pr, tr) -> ((d, i, k + 1)) }
    }
    assert(out == ranked, s"\ngot  $out\nwant $ranked")
    assert(!out.keys.exists(_._1 == 5L), "empty probe must be absent")
    // self-influence of probe 0 should top its list (it taught itself)
    assert(out((0L, 0L))._3 == 1)
    // loud contracts
    intercept[IllegalArgumentException](Classifier.tracinInfluence(
      docs, docs, "doc_id", "text", "label", maxProbes = 2L))
    intercept[IllegalArgumentException](Classifier.tracinInfluence(
      docs, docs.limit(1), "doc_id", "text", "label",
      dim = 1 << 20, iters = 16))
  }
}
