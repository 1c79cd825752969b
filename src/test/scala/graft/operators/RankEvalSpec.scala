package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("rankingMetrics: hand-checked nDCG/MRR/recall, dropped no-qrel queries") {
    val run = Seq(
      // q1 retrieves d1 (irrelevant), d2, d3
      (1L, "d1", 1), (1L, "d2", 2), (1L, "d3", 3),
      // q2 misses its only relevant doc
      (2L, "d10", 1),
      // q3 has no qrels at all -> dropped from the output
      (3L, "d20", 1)
    ).toDF("qid", "doc", "rnk")
    val qrels = Seq(
      (1L, "d2", 1), (1L, "d3", 1), (1L, "d9", 2),
      (2L, "d11", 1)
    ).toDF("qid", "doc", "rel")
    val out = RankEval.rankingMetrics(run, qrels, "qid", "doc", "rnk", "rel",
      k = 10)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    assert(out.keySet == Set(1L, 2L), "q3 (no qrels) must be dropped")
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel") == 3L && q1.getAs[Long]("hits") == 2L)
    assert(q1.getAs[Double]("recall") == 0.666667)
    assert(q1.getAs[Double]("rr") == 0.5)
    // recompute the expected nDCG with the SAME shared discounts and
    // nano quantization (pins formula + quantization; the DuckDB oracle
    // is the independent engine check)
    val d = RankEval.discounts(10)
    def nano(gain: Long, pos: Int) = math.round(gain.toDouble * d(pos - 1) * 1e9)
    val dcg = nano(1, 2) + nano(1, 3) // d2 at rank 2, d3 at rank 3
    val idcg = nano(3, 1) + nano(1, 2) + nano(1, 3) // ideal: d9(rel2), d2, d3
    val expected = BigDecimal(dcg.toDouble / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg") == expected,
      s"ndcg ${q1.getAs[Double]("ndcg")} != $expected")
    val q2 = out(2L)
    assert(q2.getAs[Long]("hits") == 0L && q2.getAs[Double]("recall") == 0.0 &&
      q2.getAs[Double]("rr") == 0.0 && q2.getAs[Double]("ndcg") == 0.0)
    // a rank below 1 is loud, as is a null relevance grade
    intercept[Exception](RankEval.rankingMetrics(
      Seq((1L, "d1", 0)).toDF("qid", "doc", "rnk"), qrels,
      "qid", "doc", "rnk", "rel", 10).collect())
    intercept[Exception](RankEval.rankingMetrics(run,
      Seq((1L, "d2", null: Integer)).toDF("qid", "doc", "rel"),
      "qid", "doc", "rnk", "rel", 10).collect())
  }

  test("rankingMetrics: k truncates both the run and the ideal ranking") {
    // 15 relevant docs, run returns them all in order; at k=10 the ideal
    // and the run both count only 10 positions -> ndcg = 1, recall 10/15
    val run = (1 to 15).map(i => (1L, s"d$i", i)).toDF("qid", "doc", "rnk")
    val qrels = (1 to 15).map(i => (1L, s"d$i", 1)).toDF("qid", "doc", "rel")
    val r = RankEval.rankingMetrics(run, qrels, "qid", "doc", "rnk", "rel",
      k = 10).collect().head
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Long]("hits") == 10L)
    assert(r.getAs[Double]("rr") == 1.0)
  }

  test("aucRoc matches hand pair-counting with the half-tie convention") {
    import spark.implicits._
    // pos scores {3, 2}, neg {1, 2}: pairs >, >, >, = -> (3 + 0.5)/4
    val d = Seq((3L, 1), (2L, 1), (1L, 0), (2L, 0)).toDF("s", "y")
    val out = RankEval.aucRoc(d, "s", "y").head()
    assert(out.getAs[Long]("n_pos") == 2 && out.getAs[Long]("n_neg") == 2)
    assert(out.getAs[Double]("auc") == 0.875)
    // perfect / inverted / all-tied
    val sep = Seq((10L, 1), (9L, 1), (1L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(sep, "s", "y").head().getAs[Double]("auc") == 1.0)
    val inv = Seq((1L, 1), (9L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(inv, "s", "y").head().getAs[Double]("auc") == 0.0)
    val tied = Seq((5L, 1), (5L, 1), (5L, 0)).toDF("s", "y")
    assert(RankEval.aucRoc(tied, "s", "y").head().getAs[Double]("auc") == 0.5)
  }

  test("aucRoc equals brute force and is partitioning-invariant") {
    import spark.implicits._
    val rows = Seq.tabulate(300)(i =>
      (((i * 131) % 37).toLong, if ((i * 17) % 5 < 2) 1 else 0))
    val brute = {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      wins.toDouble / (2L * pos.size * neg.size)
    }
    val a = RankEval.aucRoc(rows.toDF("s", "y").repartition(1), "s", "y")
      .head().getAs[Double]("auc")
    val b = RankEval.aucRoc(rows.toDF("s", "y").repartition(11), "s", "y")
      .head().getAs[Double]("auc")
    assert(a == b, "partitioning must not move the value at all")
    assert(math.abs(a - brute) <= 5e-7, s"auc $a vs brute $brute")
  }

  test("aucRocByGroup slices agree with per-slice global aucRoc") {
    import spark.implicits._
    val rows = Seq.tabulate(400)(i =>
      (s"g${i % 3}", ((i * 131) % 37).toLong, if ((i * 17) % 5 < 2) 1 else 0))
    val d = rows.toDF("g", "s", "y")
    val sliced = RankEval.aucRocByGroup(d, "s", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = RankEval.aucRoc(d.where(col("g") === g), "s", "y").head()
      assert(sliced(g) == ((solo.getAs[Long]("n_pos"),
        solo.getAs[Long]("n_neg"), solo.getAs[Double]("auc"))),
        s"slice $g must equal the global computation on its rows")
    }
    // single-class slice -> NULL; NULL group is a group
    val mix = Seq((Some("a"), 1L, 1), (Some("a"), 2L, 0),
      (Some("b"), 1L, 1), (None, 1L, 1), (None, 2L, 0))
      .toDF("g", "s", "y")
    val out = RankEval.aucRocByGroup(mix, "s", "y", Seq("g"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(Some("b")).isEmpty, "one-class slice must be NULL")
    assert(out(None).contains(0.0), "pos scored below neg -> AUC 0")
    intercept[IllegalArgumentException](
      RankEval.aucRocByGroup(mix, "s", "y", Nil))
  }

  test("aucRoc loud paths and single-class NULL") {
    import spark.implicits._
    val badLabel = Seq((1L, 2)).toDF("s", "y")
    assert(intercept[IllegalArgumentException](
      RankEval.aucRoc(badLabel, "s", "y")).getMessage.contains("outside {0, 1}"))
    val nullScore = Seq((Option.empty[Long], 1)).toDF("s", "y")
    assert(intercept[IllegalArgumentException](
      RankEval.aucRoc(nullScore, "s", "y")).getMessage.contains("NULL"))
    val oneClass = Seq((1L, 1), (2L, 1)).toDF("s", "y")
    assert(RankEval.aucRoc(oneClass, "s", "y").head().isNullAt(2))
  }

  test("bradleyTerry: two-item closed form, MM replay, transitive ordering, loud guards") {
    def run(ms: Seq[(String, String)], iters: Int = 20) =
      RankEval.bradleyTerry(ms.toDF("w", "l"), "w", "l", iters)
        .collect().map(r => r.getAs[String]("item") ->
          ((r.getAs[Long]("wins"), r.getAs[Long]("losses"),
            r.getAs[Double]("theta"), r.getAs[Int]("rank")))).toMap
    // two items, 3:1 record: closed form P(a>b) = 3/4 -> theta_a/theta_b
    // = 3, normalized to mean 1 -> (1.5, 0.5); one MM pass already lands
    // there and stays (fixed point)
    val two = run(Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a")))
    assert(two("a") == ((3L, 1L, 1.5, 1)) && two("b") == ((1L, 3L, 0.5, 2)),
      two.toString)
    // pure-Scala MM replay on a 3-item cycle-free tournament
    val ms = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"),
      ("a", "c"), ("c", "a"), ("b", "a"), ("c", "b"))
    val got = run(ms, iters = 20)
    val items = Seq("a", "b", "c")
    val wins = Array(3L, 3L, 2L); val losses = Array(2L, 3L, 3L)
    val pn = Map((0, 1) -> 3L, (1, 2) -> 3L, (0, 2) -> 2L)
    val th = Array(1.0, 1.0, 1.0)
    for (_ <- 1 to 20) {
      val den = Array(0.0, 0.0, 0.0)
      pn.toSeq.sortBy(_._1).foreach { case ((i, j), n) =>
        val d = n / (th(i) + th(j)); den(i) += d; den(j) += d
      }
      var s = 0.0
      (0 until 3).foreach { i => th(i) = wins(i) / den(i); s += th(i) }
      (0 until 3).foreach(i => th(i) = th(i) * 3 / s)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    items.zipWithIndex.foreach { case (it, i) =>
      assert(got(it) == ((wins(i), losses(i), r6(th(i)),
        Seq(0, 1, 2).sortBy(j => (-th(j), items(j))).indexOf(i) + 1)),
        s"$it: ${got(it)}")
    }
    // dominance orders ratings: a (3-2, beat both) above c
    assert(got("a")._3 > got("c")._3)
    // loud: winless item, NULL item, self-match, too many items
    val e = intercept[IllegalArgumentException](
      run(Seq(("a", "b"), ("a", "b"))))
    assert(e.getMessage.contains("wins"), e.getMessage)
    intercept[IllegalArgumentException](RankEval.bradleyTerry(
      Seq(("a", Option.empty[String])).toDF("w", "l"), "w", "l"))
    intercept[IllegalArgumentException](
      run(Seq(("a", "a"), ("a", "b"), ("b", "a"))))
    intercept[IllegalArgumentException](RankEval.bradleyTerry(
      Seq(("a", "b"), ("b", "a")).toDF("w", "l"), "w", "l", maxItems = 1))
  }

  test("rankBiasedOverlap: identical-ranking pole, hand tail sums, disjoint absent, loud guards") {
    def run(rows: Seq[(String, Int, Int)], k: Int = 10, p: Double = 0.9) =
      RankEval.rankBiasedOverlap(rows.toDF("q", "ra", "rb"),
        Seq("q"), "ra", "rb", k, p)
        .collect().map(r => r.getAs[String]("q") ->
          ((r.getAs[Long]("n_shared"), r.getAs[Double]("rbo")))).toMap
    // replicate the operator's tail sums (iterated powers, descending
    // accumulation) for the expectations
    def tails(k: Int, p: Double): Array[Double] = {
      val pd = new Array[Double](k + 1); var a = 1.0
      (1 to k).foreach { d => a = a * p; pd(d) = a }
      val ts = new Array[Double](k + 1); var t = 0.0
      (k to 1 by -1).foreach { d => t = t + pd(d) / d; ts(d) = t }
      ts
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ts = tails(10, 0.9)
    // identical top-10 rankings -> RBO_min = 1 − p^k (≈ 0.651322)
    val ident = run((1 to 10).map(d => ("q1", d, d)))
    val wantIdent = r6(0.1 / 0.9 *
      (1 to 10).map(d => math.round(ts(d) * 1e9)).sum / 1e9)
    assert(ident == Map("q1" -> ((10L, wantIdent))), ident.toString)
    assert(math.abs(wantIdent - (1.0 - math.pow(0.9, 10))) < 1e-5)
    // one shared item at depths (1, 3): term = T[3]
    val one = run(Seq(("q2", 1, 3), ("q2", 11, 2), ("q2", 2, 12)))
    val wantOne = r6(0.1 / 0.9 * math.round(ts(3) * 1e9) / 1e9)
    assert(one == Map("q2" -> ((1L, wantOne))), one.toString)
    // disjoint top-k lists: no row (RBO_min exactly 0)
    assert(run(Seq(("q3", 1, 11), ("q3", 11, 1))).isEmpty)
    // loud: float ranks, rank 0, NULL, bad k/p
    intercept[IllegalArgumentException](RankEval.rankBiasedOverlap(
      Seq(("q", 1.5, 1.0)).toDF("q", "ra", "rb"), Seq("q"), "ra", "rb"))
    intercept[IllegalArgumentException](run(Seq(("q", 0, 1))))
    intercept[IllegalArgumentException](RankEval.rankBiasedOverlap(
      Seq(("q", Option.empty[Int], 1)).toDF("q", "ra", "rb"),
      Seq("q"), "ra", "rb"))
    intercept[IllegalArgumentException](run(Seq(("q", 1, 1)), k = 0))
    intercept[IllegalArgumentException](run(Seq(("q", 1, 1)), p = 1.0))
  }

  test("classificationReport: hand multi-class counts, never-predicted/never-labeled classes") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),  // a: tp=2 fn=1
      ("b", "a"), ("b", "b"),              // b: tp=1 fn=1; a gains fp=1
      ("c", "d")                           // c never predicted; d never labeled
    ).toDF("y", "yhat")
    val out = RankEval.classificationReport(df, "y", "yhat")
      .collect().map(r => r.getAs[String]("clazz") ->
        ((r.getAs[Long]("support"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Long]("fn"), Option(r.getAs[java.lang.Double]("precision")),
          Option(r.getAs[java.lang.Double]("recall")),
          Option(r.getAs[java.lang.Double]("f1"))))).toMap
    assert(out("a") == ((3L, 2L, 1L, 1L, Some(0.666667), Some(0.666667),
      Some(0.666667))), out("a").toString)
    assert(out("b") == ((2L, 1L, 1L, 1L, Some(0.5), Some(0.5), Some(0.5))))
    // never predicted: precision undefined (NULL), recall 0
    assert(out("c") == ((1L, 0L, 0L, 1L, None, Some(0.0), Some(0.0))))
    // never labeled: support 0, recall undefined, precision 0
    assert(out("d") == ((0L, 0L, 1L, 0L, Some(0.0), None, Some(0.0))))
    intercept[IllegalArgumentException](RankEval.classificationReport(
      Seq((Option.empty[String], "a")).toDF("y", "yhat"), "y", "yhat"))
  }

  test("tokenF1: SQuAD-style overlap, exact match, empty poles") {
    val df = Seq(
      (1L, "the quick brown fox", "the quick brown fox"), // identical
      (2L, "a b c d", "a b x"),  // overlap 2: P=2/3 R=2/4 F1=4/7
      (3L, "a a b", "a a a"),    // clipped: min counts -> overlap 2
      (4L, "x y", "p q"),        // disjoint
      (5L, "", "")               // empty pair
    ).toDF("id", "ref", "hyp")
    val out = RankEval.tokenF1(df, "id", "ref", "hyp")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("overlap"), Option(r.getAs[java.lang.Double]("f1")),
          r.getAs[Boolean]("exact_match")))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((4L, Some(1.0), true)))
    assert(out(2L) == ((2L, Some(r6(4.0 / 7.0)), false)), out(2L).toString)
    assert(out(3L) == ((2L, Some(r6(4.0 / 6.0)), false)))
    assert(out(4L) == ((0L, Some(0.0), false)))
    assert(out(5L) == ((0L, None, true))) // both empty: EM true, F1 NULL
  }

  test("editSimilarity: textbook distances, empty pole, loud length bound") {
    val df = Seq(
      (1L, "kitten", "sitting"),  // classic d=3
      (2L, "abc", "abc"),
      (3L, "abc", ""),
      (4L, "", "")
    ).toDF("id", "a", "b")
    val out = RankEval.editSimilarity(df, "id", "a", "b")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("edit_distance"), r.getAs[Double]("similarity"))))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, r6(1.0 - 3.0 / 7.0))), out(1L).toString)
    assert(out(2L) == ((0L, 1.0)))
    assert(out(3L) == ((3L, 0.0)))
    assert(out(4L) == ((0L, 1.0))) // empty-vs-empty: identical
    val e = intercept[IllegalArgumentException](RankEval.editSimilarity(
      Seq((1L, "x" * 50, "y")).toDF("id", "a", "b"), "id", "a", "b",
      maxChars = 10))
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("rougeL: hand LCS cases, order sensitivity, empty poles, loud token bound") {
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat on mat"), // lcs 4
      (2L, "a b c d", "d c b a"),                       // reorder -> lcs 1
      (3L, "a a b a", "a b a a"),                       // repeats -> lcs 3
      (4L, "a b c d", ""),                              // empty hyp
      (5L, "", "")                                      // both empty
    ).toDF("id", "ref", "hyp")
    val out = RankEval.rougeL(df, "id", "ref", "hyp")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("ref_tokens"), r.getAs[Long]("hyp_tokens"),
          r.getAs[Long]("lcs"), Option(r.getAs[java.lang.Double]("precision")),
          Option(r.getAs[java.lang.Double]("recall")),
          Option(r.getAs[java.lang.Double]("f1"))))).toMap
    assert(out(1L) == ((6L, 4L, 4L, Some(1.0), Some(r6(4.0 / 6.0)),
      Some(0.8))), out(1L).toString)
    assert(out(2L) == ((4L, 4L, 1L, Some(0.25), Some(0.25), Some(0.25))))
    assert(out(3L) == ((4L, 4L, 3L, Some(0.75), Some(0.75), Some(0.75))))
    // empty hyp: precision undefined (NULL), recall/f1 zero
    assert(out(4L) == ((4L, 0L, 0L, None, Some(0.0), Some(0.0))))
    // both empty: everything undefined
    assert(out(5L) == ((0L, 0L, 0L, None, None, None)))
    // bag-equality blindness check: tokenF1 sees identical bags for the
    // reorder case (f1 = 1), ROUGE-L's order sensitivity is the point
    val bag = RankEval.tokenF1(df.where($"id" === 2L), "id", "ref", "hyp")
      .head().getAs[Double]("f1")
    assert(bag == 1.0 && out(2L)._6.get < 1.0)
    val e = intercept[IllegalArgumentException](RankEval.rougeL(
      Seq((1L, ("x " * 50).trim, "y")).toDF("id", "ref", "hyp"),
      "id", "ref", "hyp", maxTokens = 10))
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("corpusBleu: hand clipped precisions, brevity penalty, zero-order pole") {
    // seg1 identical, seg2 partial: totals m=(6,4,2,1), t=(7,5,3,1)
    val df = Seq((1L, "a b c d", "a b c d"), (2L, "a b c", "a b x"))
      .toDF("id", "ref", "hyp")
    val r = RankEval.corpusBleu(df, "id", "ref", "hyp").head()
    assert(r.getAs[Long]("hyp_tokens") == 7L &&
      r.getAs[Long]("ref_tokens") == 7L)
    assert((1 to 4).map(n => (r.getAs[Long](s"m$n"), r.getAs[Long](s"t$n")))
      == Seq((6L, 7L), (4L, 5L), (2L, 3L), (1L, 1L)))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("bp") == 1.0)
    val want = 1.0 * math.exp((math.log(6.0 / 7.0) + math.log(4.0 / 5.0) +
      math.log(2.0 / 3.0) + math.log(1.0)) / 4.0)
    assert(r.getAs[Double]("bleu") == r6(want), r.toString)
    assert(r.getAs[Double]("p1") == r6(6.0 / 7.0))
    // identical corpus -> BLEU 1
    val perfect = RankEval.corpusBleu(
      Seq((1L, "a b c d e", "a b c d e")).toDF("id", "ref", "hyp"),
      "id", "ref", "hyp").head()
    assert(perfect.getAs[Double]("bleu") == 1.0)
    // clipping: "the the the" vs "the cat" caps unigram matches at 1
    val clipped = RankEval.corpusBleu(
      Seq((1L, "the cat", "the the the")).toDF("id", "ref", "hyp"),
      "id", "ref", "hyp").head()
    assert(clipped.getAs[Long]("m1") == 1L && clipped.getAs[Long]("t1") == 3L)
    assert(clipped.getAs[Double]("bleu") == 0.0) // no bigram match -> pole
    // brevity penalty on a short hypothesis
    val short = RankEval.corpusBleu(
      Seq((1L, "a b c", "a b")).toDF("id", "ref", "hyp"),
      "id", "ref", "hyp").head()
    assert(short.getAs[Double]("bp") == r6(math.exp(1.0 - 3.0 / 2.0)))
    assert(short.getAs[Double]("bleu") == 0.0) // no 3-gram in a 2-token hyp
  }

  test("chrfScore: identical/partial/disjoint/empty poles with hand averages") {
    val df = Seq(
      (1L, "abcd", "abcd"),   // identical, 4 chars: orders 1-4 perfect
      (2L, "ab c", "abc"),    // whitespace-stripped identical, 3 chars
      (3L, "abc", "xyz"),     // disjoint
      (4L, "", "")            // empty pair
    ).toDF("id", "ref", "hyp")
    val out = RankEval.chrfScore(df, "id", "ref", "hyp")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("chrp"), r.getAs[Double]("chrr"),
          r.getAs[Double]("chrf")))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // 4 perfect orders of 6: P=R=4/6; F=(1+4)PR/(4P+R)=P
    val p4 = (1.0 + 1.0 + 1.0 + 1.0 + 0.0 + 0.0) / 6.0
    assert(out(1L) == ((r6(p4), r6(p4),
      r6(5.0 * p4 * p4 / (4.0 * p4 + p4)))), out(1L).toString)
    val p3 = (1.0 + 1.0 + 1.0 + 0.0 + 0.0 + 0.0) / 6.0
    assert(out(2L)._1 == r6(p3), out(2L).toString)
    assert(out(3L) == ((0.0, 0.0, 0.0)))
    assert(out(4L) == ((0.0, 0.0, 0.0)))
    intercept[IllegalArgumentException](
      RankEval.chrfScore(df, "id", "ref", "hyp", beta = 0.0))
  }

  test("pairedBootstrap: exact draw replay, dominant system at floor p, loud guards") {
    // A beats B on every item -> every replica total is positive
    val dom = (1L to 20L).map(i => (i, (i + 100).toInt, i.toInt))
      .toDF("id", "a", "b")
    val d = RankEval.pairedBootstrap(dom, "id", "a", "b", replicas = 200,
      seed = "s").head()
    assert(d.getAs[Long]("n") == 20L && d.getAs[Long]("wins_a") == 200L &&
      d.getAs[Long]("ties") == 0L)
    assert(d.getAs[Double]("p_value") ==
      BigDecimal(1.0 / 201.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d.getAs[Long]("sum_delta") == 2000L) // delta 100 per item
    // exact replay of the sha draws on a tiny mixed case
    val rows = Seq((1L, 10, 0), (2L, 0, 10), (3L, 3, 0)) // deltas 10,-10,3
    val df = rows.toDF("id", "a", "b")
    val out = RankEval.pairedBootstrap(df, "id", "a", "b", replicas = 50,
      seed = "z").head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def draw(b: Long, i: Long): Int = {
      val hex = md.digest(s"z:$b:$i".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 3).toInt
    }
    val deltas = Seq(10L, -10L, 3L) // ascending id order
    val totals = (0L until 50L).map(b =>
      (0L until 3L).map(i => deltas(draw(b, i))).sum)
    assert(out.getAs[Long]("wins_a") == totals.count(_ > 0))
    assert(out.getAs[Long]("wins_b") == totals.count(_ < 0))
    assert(out.getAs[Long]("ties") == totals.count(_ == 0))
    assert(out.getAs[Long]("sum_delta") == 3L)
    assert(out.getAs[Double]("p_value") == BigDecimal(
      (totals.count(_ <= 0) + 1).toDouble / 51.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // loud: double scores, NULLs, single row, oversized grid
    intercept[IllegalArgumentException](RankEval.pairedBootstrap(
      Seq((1L, 1.5, 1.0)).toDF("id", "a", "b"), "id", "a", "b"))
    intercept[IllegalArgumentException](RankEval.pairedBootstrap(
      Seq((1L, Option.empty[Int], 1)).toDF("id", "a", "b"), "id", "a", "b"))
    intercept[IllegalArgumentException](RankEval.pairedBootstrap(
      Seq((1L, 1, 1)).toDF("id", "a", "b"), "id", "a", "b"))
    intercept[IllegalArgumentException](RankEval.pairedBootstrap(
      dom, "id", "a", "b", replicas = 200000))
    // the replicas × n grid bound: 100k replicas over a 20-row set is
    // fine (2e6), but the same replicas over a fake 10k-row set is not
    val wide = (1L to 10000L).map(i => (i, 2, 1)).toDF("id", "a", "b")
    intercept[IllegalArgumentException](RankEval.pairedBootstrap(
      wide, "id", "a", "b", replicas = 100000))
  }
}
