package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the round-6 corpus operators: SimHash near-dup pairs, PII
  * redaction, deterministic global shuffle, TF-IDF top terms per group.
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("simhashNearDupPairs equals brute-force hamming filter (pigeonhole exactness)") {
    // overlapping word-salad docs so simhashes land close but not equal
    val docs = (0L until 60L).map { i =>
      val words = (0 until 20).map(j => s"w${(i * 7 + j * 3) % 31}")
      (i, words.mkString(" "))
    }.toDF("id", "text")
    val banded = Dedup.simhashNearDupPairs(docs, "id", "text",
      bits = 48, bands = 4, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    // brute force over the same fingerprints
    val sigs = docs.select(col("id"), Dedup.simhash(col("text"), 48).as("sh"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Dedup.hammingDistance(col("a.sh"), col("b.sh")).as("h"))
      .where(col("h") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "test corpus should produce at least one close pair")
  }

  test("simhashNearDupPairs rejects maxHamming >= bands") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "id", "text", bands = 4, maxHamming = 4)
    }
  }

  test("redactPii replaces urls, emails and ipv4 addresses") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@sub.example.co.uk or visit https://x.io/p?q=1 from 192.168.0.1"),
      (2L, "no pii here, just 1.2 version numbers and a@b (not an email)"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.redactPii(col("text")).as("r"),
      TextAnalysis.urlCount(col("text")).as("u"),
      TextAnalysis.emailCount(col("text")).as("e"),
      TextAnalysis.ipv4Count(col("text")).as("ip")).orderBy("id").collect()
    assert(out(0).getAs[String]("r") ==
      "mail me at <EMAIL> or visit <URL> from <IP>")
    assert(out(0).getAs[Int]("u") == 1 && out(0).getAs[Int]("e") == 1
      && out(0).getAs[Int]("ip") == 1)
    assert(out(1).getAs[String]("r") ==
      "no pii here, just 1.2 version numbers and a@b (not an email)")
    assert(out(2).getAs[String]("r") == "")
  }

  test("deterministicShuffle assigns each row a unique stable global position") {
    val df = spark.range(500).toDF("id")
    val a = Sampling.deterministicShuffle(df, "id", seed = "s1")
      .select("id", "pos").as[(Long, Long)].collect()
    // positions are a permutation of 0..n-1
    assert(a.map(_._2).sorted.toSeq == (0L until 500L))
    // reproducible across runs
    val b = Sampling.deterministicShuffle(df, "id", seed = "s1")
      .select("id", "pos").as[(Long, Long)].collect()
    assert(a.toSet == b.toSet)
    // position equals the rank in (sha256(seed:id), id) order
    val expected = a.map { case (id, _) => id }.map { id =>
      id -> java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"s1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.sortBy { case (id, h) => (h, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => (id, i.toLong) }.toSet
    assert(a.toSet == expected)
    // a different seed produces a different order
    val c = Sampling.deterministicShuffle(df, "id", seed = "s2")
      .select("id", "pos").as[(Long, Long)].collect()
    assert(c.toSet != a.toSet)
  }

  test("winnowing fingerprints overlap on shared runs and match a reference impl") {
    val shared = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, s"prefix words here $shared"),
      (2L, s"$shared completely different tail text"),
      (3L, "nothing in common with the others at all whatsoever today"),
      (4L, "")
    ).toDF("id", "text")
    val fps = df.select(col("id"),
      TextAnalysis.winnowingFingerprints(col("text"), n = 3, w = 2).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    // docs 1 and 2 share a 10-word run >= w + n - 1 = 4 words -> guaranteed
    // common fingerprint; doc 3 shares nothing; empty doc -> empty set
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
    assert(fps(4L).isEmpty)
    // reference implementation: sliding-window min over shingle hashes
    def ref(text: String, n: Int, w: Int): Set[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) return Set.empty
      val sh = (0 until math.max(toks.length - (n - 1), 1))
        .map(i => toks.slice(i, i + n).mkString(" "))
      val hs = sh.map { s =>
        val d = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      }
      (0 until math.max(hs.length - (w - 1), 1))
        .map(i => hs.slice(i, i + w).min).toSet
    }
    for (r <- Seq((1L, s"prefix words here $shared"),
      (2L, s"$shared completely different tail text"),
      (3L, "nothing in common with the others at all whatsoever today")))
      assert(fps(r._1).toSet == ref(r._2, 3, 2), s"doc ${r._1}")
  }

  test("stratifiedSample keeps hash-stable per-group fractions") {
    val df = spark.range(3000).select(col("id"),
      when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "de")
        .otherwise("fr").as("lang"))
    val out = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.05)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 rows per group; hash-uniform so expect frac +- a loose band
    assert(out("en") > 400 && out("en") < 600)
    assert(out("de") > 130 && out("de") < 270)
    assert(out.getOrElse("fr", 0L) < 110)
    // deterministic: the same call selects the same rows
    val a = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 0.5))
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // and it agrees with hashSample on the matching group
    val hs = Sampling.hashSample(df.where(col("lang") === "en"), "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == hs)
  }

  test("dedupCorpus removes near-duplicates, keeping the min-id survivor by default") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base + " extra"), (3L, base),
      (10L, "completely different text about large scale data processing pipelines"),
      (11L, "another unrelated document mentioning neither foxes nor dogs at all once")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 1,2,3 cluster together -> survivor 1; 10 and 11 are untouched
    assert(kept == Set(1L, 10L, 11L))
    // keepBy: prefer the highest doc_id instead
    val keptDesc = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5,
      keepBy = Seq(col("doc_id").desc))
      .select("doc_id").as[Long].collect().toSet
    assert(keptDesc == Set(3L, 10L, 11L))
  }

  test("hyperplaneLshPairs finds same-direction vectors with perfect recall") {
    val dim = 16
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    // plant exact-direction duplicates (scaled copies) of every 10th vector
    val planted = vecs.filter(_._1 % 10 == 0)
      .map { case (i, v) => (i + 1000L, v.map(_ * 3.0f)) }
    val df = (vecs ++ planted).toDF("id", "vec")
    val pairs = Dedup.hyperplaneLshPairs(df, "id", "vec", dim = dim,
      planesPerTable = 6, tables = 6, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // scaled copies share every table signature -> always candidates, cos=1
    val expected = planted.map { case (i, _) => (i - 1000L, i) }.toSet
    assert(expected.subsetOf(pairs))
    // everything reported really is >= threshold (verification step works):
    // brute-force check of each reported pair
    val byId = (vecs ++ planted).toMap
    pairs.foreach { case (a, b) =>
      val (va, vb) = (byId(a).map(_.toDouble), byId(b).map(_.toDouble))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum))
      assert(cos >= 0.999 - 1e-6, s"pair ($a,$b) cos=$cos below threshold")
    }
  }

  test("chooseHyperplanePlan: pinned operating points, budget refusal, measured recall") {
    // pinned plan choices (hand-derived from q = (1 − acos(s)/π)^p and
    // t = ceil(ln(1−R)/ln(1−q))): the most-planes split inside budget
    assert(Dedup.chooseHyperplanePlan(0.99, 0.9, 64)._1 == 4)
    assert(Dedup.chooseHyperplanePlan(0.99, 0.9, 64)._2 == 16)
    assert(Dedup.chooseHyperplanePlan(0.9, 0.9, 64) match {
      case (7, 8, p) => p >= 0.9; case _ => false
    })
    assert(Dedup.chooseHyperplanePlan(0.8, 0.9, 32) match {
      case (5, 4, p) => p >= 0.9; case _ => false
    })
    // every table row's pAtThreshold meets the recall by construction
    Dedup.hyperplanePlan(0.95, 0.85).foreach { case (p, t, pAt, pOrth) =>
      assert(pAt >= 0.85, s"planes=$p tables=$t pAt=$pAt")
      assert(pOrth > 0.0 && pOrth < 1.0)
    }
    // loud when the budget cannot carry the recall
    val e = intercept[IllegalArgumentException](
      Dedup.chooseHyperplanePlan(0.5, 0.99, 2))
    assert(e.getMessage.contains("budget"), e.getMessage)
    // tiny-q regime (ADVICE r16): at threshold 0.12 the per-table
    // collision prob underflows 1.0−q at high plane counts; the old
    // ln(1−q)=0 path collapsed the table count to 1 and the chooser
    // picked planes=62 with ~zero actual recall. log1p keeps the
    // S-curve exact and the chooser re-validates pAt >= targetRecall.
    val (tTiny, pTiny, pAtTiny) = Dedup.chooseHyperplanePlan(0.12, 0.9, 4096)
    assert(pAtTiny >= 0.9,
      s"tables=$tTiny planes=$pTiny pAt=$pAtTiny below target")
    assert(tTiny.toLong * pTiny <= 4096)
    // and the raw table's high-plane rows report astronomically many
    // tables needed (saturated), never a silent t=1 with pAt=0
    val tail = Dedup.hyperplanePlan(0.12, 0.9, maxPlanes = 62).last
    assert(tail._2 > 1000000, s"p=62 tables=${tail._2} should saturate")
    // measured recall floor: planted near-duplicates of every 5th vector
    // must surface at >= the advertised target through the AUTO path
    val dim = 16
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val planted = vecs.filter(_._1 % 5 == 0)
      .map { case (i, v) => (i + 1000L, v.map(_ * 2.0f)) }
    val df = (vecs ++ planted).toDF("id", "vec")
    val pairs = Dedup.hyperplaneLshPairsAtRecall(df, "id", "vec",
      dim = dim, threshold = 0.999, targetRecall = 0.9, budget = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = planted.map { case (i, _) => (i - 1000L, i) }.toSet
    val recall = want.count(pairs.contains).toDouble / want.size
    assert(recall >= 0.9,
      s"measured recall $recall below the 0.9 target (${pairs.size} pairs)")
  }

  test("dedupCorpus with no near-duplicates returns the corpus unchanged") {
    val docs = Seq(
      (1L, "completely unique first document with plenty of distinct words"),
      (2L, "second text sharing nothing with anything else in the corpus"),
      (3L, "third entry again entirely different from its two predecessors")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("hyperplaneLshPairs never pairs a zero vector and rejects wrong dims") {
    val dim = 8
    val df = Seq(
      (1L, Seq.fill(dim)(0.0f)),
      (2L, Seq.fill(dim)(0.0f)),
      (3L, Seq.tabulate(dim)(_.toFloat + 1))
    ).toDF("id", "vec")
    // zero vectors share every signature but cos is defined as 0 -> filtered
    val pairs = Dedup.hyperplaneLshPairs(df, "id", "vec", dim = dim,
      planesPerTable = 4, tables = 2, threshold = 0.5)
      .collect()
    assert(pairs.isEmpty)
    // a wrong-length vector fails loudly instead of degenerating the join
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Dedup.hyperplaneLshPairs(bad, "id", "vec", dim = dim).collect()
    }
    assert(e.getMessage.contains("expected 8-dim")
      || Option(e.getCause).exists(_.getMessage.contains("expected 8-dim")))
  }

  test("removeBoilerplate drops cross-document repeated lines, keeps order") {
    val docs = Seq(
      (1L, "unique first line\ncookie banner\nsecond unique line"),
      (2L, "cookie banner\nanother document body"),
      (3L, "cookie banner\nthird body text\ncookie banner"),
      (4L, "cookie banner") // all-boilerplate doc -> empty text, row kept
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique first line\nsecond unique line")
    assert(out(2L) == "another document body")
    assert(out(3L) == "third body text")
    assert(out(4L) == "")
    assert(out.size == 4)
    // below the threshold nothing is removed (order + content intact)
    val loose = TextAnalysis.removeBoilerplate(docs, "doc_id", "text", maxDocs = 4)
      .as[(Long, String)].collect().toMap
    assert(loose(1L) == "unique first line\ncookie banner\nsecond unique line")
  }

  test("dedupLinesWithinDoc keeps first occurrences in order, per doc") {
    val docs = Seq(
      (1L, Some("a\nb\na\nc\nb")),
      (2L, Some("only line")),
      (3L, Some("x\nx\nx")),
      (4L, None)
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.dedupLinesWithinDoc(col("text")).as("clean"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a\nb\nc"))
    assert(out(2L).contains("only line"))
    assert(out(3L).contains("x"))
    assert(out(4L).isEmpty) // NULL stays NULL
    // exact equality: whitespace variants are distinct lines
    val ws = Seq((5L, "a\na ")).toDF("doc_id", "text")
      .select(TextAnalysis.dedupLinesWithinDoc(col("text")))
      .as[String].head()
    assert(ws == "a\na ")
  }

  test("lmQualityScore scores reference-like text lower than gibberish") {
    val ref = Seq(
      "the cat sat on the mat",
      "the dog sat on the rug",
      "the cat and the dog sat"
    ).toDF("text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),   // in-distribution
      (2L, "zz qq vv xx yy ww"),        // out-of-distribution
      (3L, "one"),                       // < 2 tokens -> no score
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmQualityScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.getAs[java.lang.Double]("avg_nll")))).toMap
    assert(out(1L)._1 == 5)
    assert(out(3L) == (0L, None))
    assert(out(4L) == (0L, None))
    val inDist = out(1L)._2.get
    val gibberish = out(2L)._2.get
    assert(inDist < gibberish,
      s"in-distribution $inDist should beat gibberish $gibberish")
    // smoothing keeps everything finite
    assert(!gibberish.isInfinite && !gibberish.isNaN)
  }

  test("knQualityScore: hand-computed Kneser-Ney probabilities; continuation mass beats raw frequency") {
    // reference: "san francisco" pathology — "francisco" is FREQUENT but
    // follows only "san"; "york" is rarer but follows two histories.
    val ref = Seq(
      "san francisco", "san francisco", "san francisco",
      "new york", "old york"
    ).toDF("text")
    val docs = Seq(
      (1L, "a francisco"), // unseen history "a" -> pure continuation backoff
      (2L, "a york"),
      (3L, "san francisco"), // seen bigram
      (4L, "solo")           // < 2 tokens -> no score
    ).toDF("doc_id", "text")
    val out = TextAnalysis.knQualityScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Double]("avg_nll")))).toMap
    assert(out(4L) == (0L, None))
    // model stats: bigram types {san francisco, new york, old york} = 3,
    // V = {san, francisco, new, york, old} = 5, so Pc denominator = 9.
    // Pc(francisco) = (1+1)/9, Pc(york) = (2+1)/9 — york carries MORE
    // continuation mass despite "francisco" being 3x more frequent
    def nll(p: Double) = math.round(-math.log(p) * 1e6) / 1e6
    assert(out(1L)._2.get == nll(2.0 / 9.0), s"got ${out(1L)._2.get}")
    assert(out(2L)._2.get == nll(3.0 / 9.0), s"got ${out(2L)._2.get}")
    assert(out(2L)._2.get < out(1L)._2.get,
      "promiscuous continuation (york) must out-score frequent-but-bound (francisco)")
    // seen bigram: c(san francisco)=3, c(san)=3, N1+(san.)=1 ->
    // P = (3-0.75)/3 + 0.75*(1/3)*(2/9)
    val pSeen = (3.0 - 0.75) / 3.0 + 0.75 * 1.0 / 3.0 * (2.0 / 9.0)
    assert(out(3L)._2.get == nll(pSeen), s"got ${out(3L)._2.get}")
    intercept[IllegalArgumentException](
      TextAnalysis.knQualityScore(docs, "doc_id", "text", ref, "text", 1.5))
  }

  test("kn3QualityScore: hand-computed three-level backoff chain") {
    val ref = Seq("a b c", "a b c", "a b d", "x b c").toDF("text")
    val docs = Seq(
      (1L, "a b c"),  // fully seen trigram
      (2L, "q b c"),  // unseen history (q,b) -> middle-level backoff
      (3L, "a b z"),  // unseen continuation under a seen history
      (4L, "q q c"),  // both upper levels unseen -> unigram continuation
      (5L, "a b"),    // < 3 tokens -> no trigram, NULL score
      (6L, "a b c d") // two trigrams, the second doubly backed off
    ).toDF("doc_id", "text")
    val out = TextAnalysis.kn3QualityScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_trigrams"),
          Option(r.getAs[java.lang.Double]("avg_nll"))))).toMap
    assert(out(5L) == ((0L, None)))
    // model stats: V=5; bigram types {a b, b c, b d, x b} -> n1pall=4,
    // Pc denominator 10; N1+(.c)=N1+(.d)=1, unseen word -> 1/10.
    // trigram types {(a,b,c),(a,b,d),(x,b,c)}: hist(a,b) c12=3 n1pl3=2;
    // mid(b) kn2den=3 n1pl2=2; kn2(b,c)=2, kn2(b,d)=1.
    // Replicate the exact expression order (left-to-right, as built).
    val pcC = (1.0 + 1.0) / (4.0 + 5.0 + 1.0)
    val pcZ = (0.0 + 1.0) / (4.0 + 5.0 + 1.0)
    val p2C = math.max(2.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * pcC
    val p2Z = math.max(0.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * pcZ
    val p3Seen = math.max(2.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p2C
    val p3Z = math.max(0.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p2Z
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((1L, Some(r6(-math.log(p3Seen))))), out(1L).toString)
    assert(out(2L) == ((1L, Some(r6(-math.log(p2C))))), out(2L).toString)
    assert(out(3L) == ((1L, Some(r6(-math.log(p3Z))))), out(3L).toString)
    assert(out(4L) == ((1L, Some(r6(-math.log(pcC))))), out(4L).toString)
    // doc 6: seen (a,b,c) + (b,c,d) with no (b,c) history and no c-mid
    // continuation -> falls all the way to Pc(d) = Pc(c)'s value
    assert(out(6L) ==
      ((2L, Some(r6((-math.log(p3Seen) + -math.log(pcC)) / 2)))),
      out(6L).toString)
    // backoff ordering: more of the chain seen -> higher probability
    assert(out(1L)._2.get < out(2L)._2.get)
    assert(out(3L)._2.get > out(2L)._2.get)
    intercept[IllegalArgumentException](
      TextAnalysis.kn3QualityScore(docs, "doc_id", "text", ref, "text", 1.5))
  }

  test("mattr: hand window averages, short-doc TTR fallback, empty NULL") {
    val docs = Seq((1L, "a b a b a"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a a"), (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.mattr(docs, "doc_id", "text", window = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_windows"),
          Option(r.getAs[java.lang.Double]("mattr"))))).toMap
    // windows of 3 over "a b a b a": distinct counts 2,2,2 -> 6/(3*3)
    assert(out(1L) == ((5L, 3L, Some(0.666667))), out(1L).toString)
    assert(out(2L) == ((4L, 2L, Some(1.0))))
    // shorter than the window: plain TTR, n_windows 0
    assert(out(3L) == ((2L, 0L, Some(1.0))))
    assert(out(4L) == ((2L, 0L, Some(0.5))))
    assert(out(5L) == ((0L, 0L, None)))
    // length independence: repeated text keeps its MATTR while its
    // plain TTR would collapse
    val rep = Seq((1L, Seq.fill(40)("x y z w v").mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextAnalysis.mattr(rep, "doc_id", "text", window = 5)
      .head().getAs[Double]("mattr")
    assert(m == 1.0, s"periodic 5-token text at window 5 is all-distinct: $m")
    intercept[IllegalArgumentException](
      TextAnalysis.mattr(docs, "doc_id", "text", window = 1))
  }

  test("bigramEntropyRate: hand nano-ln terms, zero-entropy pole, empty corpus") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val r = TextAnalysis.bigramEntropyRate(docs, "text").head()
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("n_bigram_types") == 2L)
    assert(r.getAs[Long]("n_contexts") == 1L)
    val s = 2L * math.round(math.log(2.0 / 3.0) * 1e9) +
      1L * math.round(math.log(1.0 / 3.0) * 1e9)
    val want = BigDecimal(s.toDouble / (3.0 * 1e9) * -1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("entropy_rate") == want, r.toString)
    // fully predictable corpus: next token always determined -> 0
    val pole = TextAnalysis.bigramEntropyRate(
      Seq("a a a a").toDF("text"), "text").head()
    assert(pole.getAs[Double]("entropy_rate") == 0.0)
    // no bigrams -> NULL rate
    val empty = TextAnalysis.bigramEntropyRate(
      Seq("solo").toDF("text"), "text").head()
    assert(empty.getAs[Long]("n_bigrams") == 0L &&
      empty.isNullAt(empty.fieldIndex("entropy_rate")))
  }

  test("termBurstiness: hand VMR/adaptation; bursty beats spread-out at equal totals") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "b"), (4L, "c c c c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs, "doc_id", "text", minDocs = 1L)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total"),
          r.getAs[Double]("vmr"), r.getAs[Double]("adaptation")))).toMap
    // N=4. a: counts (2,1,0,0) -> VMR=(4*5-9)/(4*3)=11/12; P(c>=2|c>=1)=1/2
    assert(out("a") == ((2L, 3L, 0.916667, 0.5)), out("a").toString)
    // b: (1,1,1,0) -> (12-9)/12 = 0.25 (sub-Poisson: spread out), adapt 0
    assert(out("b") == ((3L, 3L, 0.25, 0.0)), out("b").toString)
    // c: (0,0,0,4) -> (64-16)/16 = 3.0 (bursty), adapt 1
    assert(out("c") == ((1L, 4L, 3.0, 1.0)), out("c").toString)
    // same total, burstier wins
    assert(out("c")._3 > out("b")._3)
    // minDocs prunes
    assert(TextAnalysis.termBurstiness(docs, "doc_id", "text", minDocs = 3L)
      .collect().map(_.getAs[String]("term")).toSet == Set("b"))
    intercept[IllegalArgumentException](TextAnalysis.termBurstiness(
      spark.emptyDataFrame.selectExpr("1L as doc_id", "'x' as text")
        .where(lit(false)), "doc_id", "text"))
  }

  test("distinctNgrams: hand ratios per order; mode collapse scores low") {
    val docs = Seq(("A", "a b a b"), ("A", "a b"), ("B", "x"),
      (null.asInstanceOf[String], "dropped")).toDF("src", "text")
    val out = TextAnalysis.distinctNgrams(docs, "src", "text", maxN = 3)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Int]("n")) ->
        ((r.getAs[Long]("total_ngrams"), r.getAs[Long]("distinct_ngrams"),
          r.getAs[Double]("distinct_ratio")))).toMap
    assert(out(("A", 1)) == ((6L, 2L, 0.333333)), out.toString)
    assert(out(("A", 2)) == ((4L, 2L, 0.5)))
    assert(out(("A", 3)) == ((2L, 2L, 1.0)))
    assert(out(("B", 1)) == ((1L, 1L, 1.0)))
    // B has no bigrams/trigrams -> no rows; NULL slice dropped
    assert(out.keySet == Set(("A", 1), ("A", 2), ("A", 3), ("B", 1)))
    // a collapsed slice scores below a diverse one at order 2
    val collapse = Seq(("gen", "yes yes yes yes yes")).toDF("src", "text")
    val c = TextAnalysis.distinctNgrams(collapse, "src", "text", maxN = 2)
      .collect().map(r => r.getAs[Int]("n") ->
        r.getAs[Double]("distinct_ratio")).toMap
    assert(c(2) == 0.25 && c(2) < out(("A", 2))._3)
  }

  test("ngramNovelty: copied text scores 0, fresh text 1, short docs NULL") {
    val ref = Seq("a b c d").toDF("text")
    val docs = Seq((1L, "a b x"), (2L, "a b c"), (3L, "z"),
      (4L, "p q r s")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", ref, "text",
        n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ngrams"), r.getAs[Long]("novel_ngrams"),
          Option(r.getAs[java.lang.Double]("novelty"))))).toMap
    assert(out(1L) == ((2L, 1L, Some(0.5)))) // "b x" novel, "a b" seen
    assert(out(2L) == ((2L, 0L, Some(0.0)))) // fully copied
    assert(out(3L) == ((0L, 0L, None)))      // too short for a bigram
    assert(out(4L) == ((3L, 3L, Some(1.0)))) // fully novel
  }

  test("heapsLaw: exact OLS replay on a hand curve; loud degenerate guards") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "d e f"), (4L, "   "))
      .toDF("doc_id", "text")
    val row = TextAnalysis.heapsLaw(docs, "doc_id", "text", maxPoints = 16)
      .head()
    // zero-token doc 4 skipped; curve (tokens, types): (2,2),(4,3),(7,6)
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(row.getAs[Long]("n_points") == 3L)
    assert(row.getAs[Long]("n_tokens") == 7L)
    assert(row.getAs[Long]("n_types") == 6L)
    val xs = Seq(2L, 4L, 7L).map(t => math.round(math.log(t.toDouble) * 1e6))
    val ys = Seq(2L, 3L, 6L).map(v => math.round(math.log(v.toDouble) * 1e6))
    val k = 3L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val num = BigInt(k) * BigInt(sxy) - BigInt(sx) * BigInt(sy)
    val den = BigInt(k) * BigInt(sxx) - BigInt(sx) * BigInt(sx)
    val beta = num.toDouble / den.toDouble
    val bigK = math.exp(
      (sy.toDouble / 1e6 - beta * (sx.toDouble / 1e6)) / k.toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("beta") == r6(beta), row.toString)
    assert(row.getAs[Double]("k") == r6(bigK), row.toString)
    // vocabulary grows sublinearly-ish but the fit is sane
    assert(beta > 0.0 && beta < 2.0)
    // loud: single doc (no curve), all-identical curve impossible here
    intercept[IllegalArgumentException](TextAnalysis.heapsLaw(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text"))
    intercept[IllegalArgumentException](TextAnalysis.heapsLaw(
      docs, "doc_id", "text", maxPoints = 1))
  }

  test("collocations: PMI separates a bound phrase from free co-occurrence; minCount prunes hapax pairs") {
    // "new york" always together (bound phrase); "the" pairs freely
    val docs = Seq(
      "new york is big", "new york is old", "new york never sleeps",
      "the cat", "the dog", "the bird", "rare pair"
    ).toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n12"), r.getAs[Double]("pmi"))).toMap
    // N = 13 bigrams; "new york": n12=3, n1(new)=3, n2(york)=3
    // pmi = ln(3*13/(3*3)) = ln(13/3)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("new", "york")) == (3L, r6(math.log(13.0 / 3.0))),
      s"got ${out(("new", "york"))}")
    // "york is": n12=2, n1(york)=3 ("york is" x2 + "york never"),
    // n2(is)=2 -> ln(2*13/6)
    assert(out(("york", "is")) == (2L, r6(math.log(2.0 * 13.0 / 6.0))))
    // hapax pairs pruned by minCount
    assert(!out.contains(("rare", "pair")))
    assert(!out.contains(("the", "cat")))
    // both surviving pairs carry positive association (ln of >1 ratios)
    assert(out.values.forall(_._2 > 0))
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(docs, "text", minCount = 0L))
  }

  test("dunningCollocations: hand 2x2 G², bound phrase dominates, zero cells fold to 0, minCount prunes") {
    val docs = Seq(
      "new york is big", "new york is old", "new york never sleeps",
      "the cat", "the dog", "the bird", "rare pair"
    ).toDF("text")
    val out = TextAnalysis.dunningCollocations(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n12"), r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Double]("g2")))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // hand 2x2 for "new york": N=13, o11=3, o12=0, o21=0, o22=10 —
    // the two zero cells contribute 0 by the x·ln(x) limit
    def t(o: Double, row: Double, colM: Double, nn: Double) =
      if (o == 0.0) 0.0 else o * math.log(o / (row * colM / nn))
    val g2ny = 2.0 * (t(3, 3, 3, 13) + t(0, 3, 10, 13) +
      t(0, 10, 3, 13) + t(10, 10, 10, 13))
    assert(out(("new", "york")) == ((3L, 3L, 3L, r6(g2ny))),
      s"got ${out(("new", "york"))}")
    // "york is": o11=2, o12=1, o21=0, o22=10 — one zero cell
    val g2yi = 2.0 * (t(2, 3, 2, 13) + t(1, 3, 11, 13) +
      t(0, 10, 2, 13) + t(10, 10, 11, 13))
    assert(out(("york", "is")) == ((2L, 3L, 2L, r6(g2yi))))
    // the always-bound phrase scores strictly above the partial one
    assert(out(("new", "york"))._4 > out(("york", "is"))._4)
    // hapax pairs pruned by minCount
    assert(!out.contains(("rare", "pair")) && !out.contains(("the", "cat")))
    intercept[IllegalArgumentException](
      TextAnalysis.dunningCollocations(docs, "text", minCount = 0L))
  }

  test("goodTuringCounts: hand count-of-counts, Turing r*, loud NULL at frequency gaps") {
    // "a a a b b c d": freqs a:3 b:2 c:1 d:1 -> N1=2, N2=1, N3=1
    val docs = Seq("a a a b b", "c d").toDF("text")
    val out = TextAnalysis.goodTuringCounts(docs, "text")
      .collect().map(r => r.getAs[Long]("r") ->
        ((r.getAs[Long]("n_r"),
          Option(r.getAs[java.lang.Double]("r_star"))))).toMap
    // r*=1: 2·N2/N1 = 1.0 (the hapax discount — rare words are
    // over-counted); r*=2: 3·N3/N2 = 3.0; r=3 has no N4 -> NULL gap
    assert(out == Map(
      1L -> ((2L, Some(1.0))),
      2L -> ((1L, Some(3.0))),
      3L -> ((1L, None))), out.toString)
    // a smooth Zipf-ish corpus: every r* defined until the top gap
    val zipf = Seq((1 to 12).flatMap(i =>
      Seq.fill(13 - i)(s"w$i")).mkString(" ")).toDF("text")
    val z = TextAnalysis.goodTuringCounts(zipf, "text").collect()
    assert(z.length == 12 &&
      z.count(_.isNullAt(2)) == 1, z.mkString(", "))
  }

  test("topTermsPerGroup ranks distinctive vocabulary by tf-idf") {
    val df = Seq(
      ("a", "apple apple apple shared shared"),
      ("a", "apple shared"),
      ("b", "banana banana shared shared shared"),
      ("c", "cherry shared")
    ).toDF("src", "text")
    val out = TextAnalysis.topTermsPerGroup(df, "src", "text", k = 2)
      .orderBy("group", "rank")
      .select("group", "term", "tf", "rank").as[(String, String, Long, Int)]
      .collect()
    // 'shared' appears in every group -> idf = ln(1) = 0, never ranks first
    assert(out.filter(_._4 == 1).map(r => (r._1, r._2)).toSeq ==
      Seq(("a", "apple"), ("b", "banana"), ("c", "cherry")))
    assert(out.find(r => r._1 == "a" && r._2 == "apple").get._3 == 4L)
    // every group gets at most k rows, ranks are 1..k
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
  }

  test("withGopherRules computes each signal and the composite gate") {
    val longGood = Seq.fill(5)(
      "the quick brown fox jumps over that lazy dog with style and grace")
      .mkString(" ")
    val df = Seq(
      (1L, longGood),                                      // passes every rule
      (2L, "the cat and dog"),                             // too short
      (3L, "- alpha one\n- beta two\n• gamma three\n* delta four"), // bullets
      (4L, "first line...\nsecond line…\nthird line"),     // ellipsis lines
      (5L, "see # tag # and more... stuff..."),            // symbol-heavy
      (6L, "12345 67890 11111 22222"),                     // no alpha words
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withGopherRules(df, "text").orderBy("doc_id")
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "stop_hits", "gopher_pass")
      .collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_words") == 65L)
    // 13 distinct words of total length 53, repeated 5 times
    assert(d1.getAs[Double]("mean_word_len") ==
      math.rint(53.0 / 13.0 * 1e6) / 1e6)
    assert(d1.getAs[Double]("alpha_word_frac") == 1.0)
    assert(d1.getAs[Long]("stop_hits") == 4L) // the, that, with, and
    assert(d1.getAs[Boolean]("gopher_pass"))
    val d2 = out(1)
    assert(d2.getAs[Long]("n_words") == 4L && !d2.getAs[Boolean]("gopher_pass"))
    assert(d2.getAs[Long]("stop_hits") == 2L)
    assert(out(2).getAs[Double]("bullet_line_frac") == 1.0)
    assert(out(3).getAs[Double]("ellipsis_line_frac") ==
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
    // 7 tokens, 2 '#' + 2 '...' occurrences
    assert(out(4).getAs[Double]("symbol_ratio") ==
      math.rint(4.0 / 7.0 * 1e6) / 1e6)
    assert(out(5).getAs[Double]("alpha_word_frac") == 0.0)
    val d7 = out(6)
    assert(d7.getAs[Long]("n_words") == 0L
      && d7.getAs[Double]("mean_word_len") == 0.0
      && !d7.getAs[Boolean]("gopher_pass"))
    // no doc except #1 passes
    assert(out.count(_.getAs[Boolean]("gopher_pass")) == 1)
  }

  test("tokenEntropy matches hand-computed H and ttr, zeros for empty docs") {
    val df = Seq(
      (1L, "a a b"),      // H = ln3 - round(2ln2*1e6)/1e6/3
      (2L, "x y z"),      // uniform -> H = ln3
      (3L, "w w w w"),    // single type -> H ~ 0 (micro-rounded)
      (4L, "A a"),        // lowercased -> one type
      (5L, ""),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "n_tok", "n_types", "entropy", "ttr")
      .as[(Long, Long, Long, Double, Double)].collect()
    def h(n: Long, counts: Seq[Long]): Double = {
      val s = counts.filter(_ > 1)
        .map(c => math.round(c * math.log(c.toDouble) * 1e6)).sum
      math.rint((math.log(n.toDouble) - (s / 1e6) / n) * 1e6) / 1e6
    }
    assert(out(0) == ((1L, 3L, 2L, h(3, Seq(2L, 1L)), 0.666667)))
    assert(out(1) == ((2L, 3L, 3L, h(3, Seq(1L, 1L, 1L)), 1.0)))
    assert(out(2) == ((3L, 4L, 1L, 0.0, 0.25)))
    assert(out(3) == ((4L, 2L, 1L, 0.0, 0.5)))
    assert(out(4) == ((5L, 0L, 0L, 0.0, 0.0)))
    assert(out(5) == ((6L, 0L, 0L, 0.0, 0.0)))
    // ordering property: uniform beats skewed beats constant
    assert(out(1)._4 > out(0)._4 && out(0)._4 > out(2)._4)
  }

  test("c4Clean keeps terminal-punctuated long lines, gates pages") {
    val good = Seq(
      "this first sentence has enough words to survive.",
      "does the second line also carry its weight today?",
      "a third decent sentence rounds out the page!").mkString("\n")
    val df = Seq(
      (1L, good),                                              // keep
      (2L, good + "\nshort one."),                             // short line dropped
      (3L, good + "\nplease enable javascript to view content."), // js line dropped
      (4L, good + "\nlorem ipsum dolor sit amet consectetur."), // page gate
      (5L, good + "\nvar config = { mode: 1 } and such."),      // brace gate
      (6L, good + "\nthis gratuitous spamword line reads fine."), // badword gate
      (7L, "only two sentences here which is sad. one more makes two!"),
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(df, "text", badWords = Seq("SpamWord"))
      .orderBy("doc_id")
      .select("doc_id", "text_clean", "n_lines_kept", "n_sentences", "c4_keep")
      .collect()
    assert(out(0).getAs[String]("text_clean") == good)
    assert(out(0).getAs[Long]("n_lines_kept") == 3L
      && out(0).getAs[Long]("n_sentences") == 3L
      && out(0).getAs[Boolean]("c4_keep"))
    // line filters drop the offending line but the page still passes
    assert(out(1).getAs[String]("text_clean") == good
      && out(1).getAs[Boolean]("c4_keep"))
    assert(out(2).getAs[String]("text_clean") == good
      && out(2).getAs[Boolean]("c4_keep"))
    // page gates: the kept text retains 4 lines but the page is rejected
    assert(out(3).getAs[Long]("n_lines_kept") == 4L
      && !out(3).getAs[Boolean]("c4_keep"))
    assert(!out(4).getAs[Boolean]("c4_keep"))
    assert(!out(5).getAs[Boolean]("c4_keep"), "badWords match is case-insensitive")
    // one line, two sentence runs -> fails the 3-sentence floor
    assert(out(6).getAs[Long]("n_sentences") == 2L
      && !out(6).getAs[Boolean]("c4_keep"))
    assert(out(7).getAs[String]("text_clean") == ""
      && out(7).getAs[Long]("n_lines_kept") == 0L
      && !out(7).getAs[Boolean]("c4_keep"))
  }

  test("bm25 matches the hand-computed Okapi/Lucene formula") {
    val docs = Seq(
      (1L, "a B a c"), // query-term case-insensitivity: B counts as b
      (2L, "a d"),
      (3L, "x y z"),   // no hits -> no output row
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("A", "b"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, h, s) => id -> ((h, s)) }.toMap
    // N=4 docs, dl = 4,2,3,0 -> avgdl = 9/4; df(a)=2, df(b)=1
    val avgdl = 9.0 / 4
    def idf(df: Long) = math.log(1 + (4 - df + 0.5) / (df + 0.5))
    def w(tf: Long, dl: Long, df: Long) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp1 = w(2, 4, 2) + w(1, 4, 1)
    val exp2 = w(1, 2, 2)
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L)
    assert(math.abs(out(1L)._2 - exp1) < 1e-6)
    assert(math.abs(out(2L)._2 - exp2) < 1e-6)
  }

  test("bm25 rejects empty query and bad params") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", Seq("a"), b = 1.5)
    }
  }

  test("subsampleFrequent thins stopwords, keeps rare words, preserves order") {
    // "the" dominates (f = 398/400 >> t) so ~90% of its occurrences
    // drop; quartz/feldspar appear once each (f = 1/400 < t) so their
    // discard probability is exactly 0
    val docs = (Seq.tabulate(49)(i =>
      (i.toLong, "the the the the the the the the")) :+
      (49L, "the quartz the feldspar the the the the"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.subsampleFrequent(docs, "doc_id", "text", t = 0.01)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 50, "every doc id survives, possibly empty")
    val allText = out.values.mkString(" ")
    val theKept = allText.split("\\s+").count(_ == "the")
    assert(theKept < 150, s"'the' (398 occurrences, f~1) barely thinned: $theKept")
    // f <= t words have discard probability 0 -> always kept
    assert(allText.split("\\s+").count(_ == "quartz") == 1)
    assert(allText.split("\\s+").count(_ == "feldspar") == 1)
    // order within a doc is preserved (quartz before feldspar)
    out.values.filter(_.contains("quartz")).foreach { s =>
      assert(s.indexOf("quartz") < s.indexOf("feldspar")) }
    // determinism across partitionings
    val again = TextAnalysis.subsampleFrequent(
      docs.repartition(7), "doc_id", "text", t = 0.01)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
    intercept[IllegalArgumentException](
      TextAnalysis.subsampleFrequent(docs, "doc_id", "text", t = 0.0))
    intercept[IllegalArgumentException](
      TextAnalysis.subsampleFrequent(docs, "doc_id", "text", seed = "a:b"))
  }

  test("zipfFit recovers ~-1 on a planted Zipf corpus; exact and loud edges") {
    // word_r appears floor(600/r) times: a textbook Zipf profile
    val words = (1 to 40).flatMap(r => Seq.fill(600 / r)(s"w$r"))
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(docs, "text").head()
    assert(fit.getAs[Long]("n_terms") == 40)
    val slope = fit.getAs[Double]("slope")
    assert(slope > -1.2 && slope < -0.8, s"planted Zipf slope was $slope")
    // partitioning cannot move a single nano
    val fit2 = TextAnalysis.zipfFit(docs.repartition(7), "text").head()
    assert(fit.getAs[Double]("slope") == fit2.getAs[Double]("slope"))
    assert(fit.getAs[Double]("intercept") == fit2.getAs[Double]("intercept"))
    // single-term corpus: undefined -> NULL, not NaN
    val one = Seq((1L, "same same same")).toDF("doc_id", "text")
    assert(TextAnalysis.zipfFit(one, "text").head().isNullAt(1))
    intercept[IllegalArgumentException](
      TextAnalysis.zipfFit(docs, "text", minCount = 0))
  }

  test("withLicenseDetection: SPDX tag wins, phrases fall back, tri-state gate") {
    val d = Seq(
      (1L, "// SPDX-License-Identifier: MIT\nfn main() {}"),
      (2L, "Licensed under the Apache License, Version 2.0 (the License)"),
      (3L, "This program is free software under the GNU General Public License"),
      (4L, "Permission is hereby granted, free of charge, to any person"),
      (5L, "just some ordinary text"),
      (6L, "// SPDX-License-Identifier: GPL-3.0-only\nint x;"),
      (7L, "Redistribution and use in source and binary forms, with or without"))
      .toDF("id", "text")
    val out = TextAnalysis.withLicenseDetection(d, "text")
      .collect().map { r =>
        val pi = r.fieldIndex("is_permissive")
        r.getLong(0) ->
          ((Option(r.getAs[String]("spdx_id")),
            Option(r.getAs[String]("license_guess")),
            if (r.isNullAt(pi)) None else Some(r.getBoolean(pi))))
      }.toMap
    assert(out(1L) == ((Some("MIT"), Some("mit"), Some(true))))
    assert(out(2L) == ((None, Some("apache-2.0"), Some(true))))
    assert(out(3L) == ((None, Some("gpl-3.0"), Some(false))))
    assert(out(4L) == ((None, Some("mit"), Some(true))))
    assert(out(5L) == ((None, None, None)), "unknown must stay NULL, not false")
    assert(out(6L) == ((Some("GPL-3.0-only"), Some("gpl-3.0-only"), Some(false))))
    assert(out(7L) == ((None, Some("bsd-3-clause"), Some(true))))
  }

  test("skipGramPairs: windowed, symmetric, exact counts") {
    val d = Seq((1L, "a b c"), (2L, "x y x")).toDF("doc_id", "text")
    val p = TextAnalysis.skipGramPairs(d, "doc_id", "text", window = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 fwd: (a,b) (a,c) (b,c); doc2 fwd: (x,y) (y,x) (x,x @dist2)
    assert(p(("a", "b")) == 1 && p(("b", "a")) == 1)
    assert(p(("a", "c")) == 1 && p(("c", "a")) == 1)
    assert(p(("b", "c")) == 1 && p(("c", "b")) == 1)
    // (x,y): fwd x@0->y@1 once, fwd y@1->x@2 gives (y,x) once; each
    // orientation appears once forward + once mirrored = 2
    assert(p(("x", "y")) == 2 && p(("y", "x")) == 2)
    assert(p(("x", "x")) == 2, "self-pair at distance 2, both orientations")
    assert(p.values.sum == 12)
    // window 1 drops the distance-2 pairs
    val w1 = TextAnalysis.skipGramPairs(d, "doc_id", "text", window = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(!w1.contains(("a", "c")) && !w1.contains(("x", "x")))
    intercept[IllegalArgumentException](
      TextAnalysis.skipGramPairs(d, "doc_id", "text", window = 0))
  }

  test("textRankKeywords ranks the connective hub word first") {
    val d = Seq(
      (1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "hub delta"), (5L, "alpha beta")).toDF("doc_id", "text")
    val kw = TextAnalysis.textRankKeywords(d, "doc_id", "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(kw.head._1 == "hub", s"expected hub first, got ${kw.toSeq}")
    assert(kw.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(kw.length == 3)
  }

  test("readabilityScores: hand-computed Flesch/FKGL, vowel-group syllables, degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "Extraordinarily complicated terminology necessitates consideration."),
      (3L, ""),                 // zero words -> NULL scores
      (4L, "xyz qrst"),         // no vowels: 1-syllable floor per word
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readabilityScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // simple prose: 6 words, 2 sentences, 6 syllables
    assert(out(1L) == ((6L, 2L, 6L, Some(119.19), Some(-2.62))),
      out(1L).toString)
    // polysyllabic words sink the ease score and raise the grade
    assert(out(2L) == ((5L, 1L, 25L, Some(-221.24), Some(45.36))),
      out(2L).toString)
    // empty / null text: 0 words, sentence floor 1, NULL scores
    assert(out(3L)._1 == 0L && out(3L)._2 == 1L && out(3L)._4.isEmpty)
    assert(out(5L)._1 == 0L && out(5L)._5.isEmpty)
    // vowel-less words still count 1 syllable each
    assert(out(4L)._3 == 2L)
  }

  test("sourceSimilarity: hand-computed cosine, disjoint slices absent, multi-row slices fold") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x x"), ("A", "y"),      // A folds across rows: {x:2, y:1}
      ("B", "x y y"),                // {x:1, y:2}
      ("C", "z z"),                  // disjoint from A and B
      (null.asInstanceOf[String], "x y z")) // null slice drops
      .toDF("src", "text")
    val out = TextAnalysis.sourceSimilarity(docs, "src", "text")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3)))).toMap
    graft.core.Caches.releaseCheckpoint(out)
    // dot(A,B) = 2*1 + 1*2 = 4; norms sqrt(5) each -> cos 0.8
    assert(rows == Map(("A", "B") -> ((4L, 0.8))), rows.toString)
  }

  test("sourceSimilarity: loud slice-cardinality guard — a doc-granularity key with a universal term is refused, not detonated") {
    import spark.implicits._
    // universal term "the" across every slice: the self-join fan-out
    // for that term alone is slices² — the guard must fire EAGERLY on
    // the distinct-key count, before any join is built
    val docLevel = (1 to 5).map(i => (s"doc_$i", "the quick fox"))
      .toDF("src", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.sourceSimilarity(docLevel, "src", "text",
        maxSlices = 4)
    }
    assert(e.getMessage.contains("quadratic") &&
      e.getMessage.contains("dedup tier"), e.getMessage)
    // at exactly maxSlices the operator runs; all pairs share "the"
    val ok = TextAnalysis.sourceSimilarity(docLevel.limit(4), "src",
      "text", maxSlices = 4)
    assert(ok.count() == 6L) // C(4,2) pairs, every slice identical
    graft.core.Caches.releaseCheckpoint(ok)
    intercept[IllegalArgumentException](TextAnalysis.sourceSimilarity(
      docLevel, "src", "text", maxSlices = 1))
  }

  test("spanCorruption: sha-replayed spans, sentinel order, lossless reconstruction, tail/short/empty docs, loud params") {
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val n = 45
    val toks = (0 until n).map(i => s"t$i")
    val docs = Seq((7L, toks.mkString(" ")), (8L, "a b c"), (9L, ""),
      (10L, null.asInstanceOf[String])).toDF("id", "text")
    val out = TextAnalysis.spanCorruption(docs, "id", "text",
      blockSize = 20, maxSpan = 5, seed = "t5")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("input_text"), r.getAs[String]("target_text"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("n_masked")))).toMap
    // driver replay of the block draws for id 7 (two full blocks;
    // the 5-token tail is never corrupted)
    val spans = (0 until 2).map { b =>
      val len = (1 + h60(s"t5:7:$b:len") % 5).toInt
      val off = (h60(s"t5:7:$b:off") % (20 - len + 1)).toInt
      (b * 20 + off, b * 20 + off + len)
    }
    val input = (0 until n).flatMap { p =>
      spans.zipWithIndex.find { case ((s, e), _) => p >= s && p < e } match {
        case Some(((s, _), k)) if p == s => Some(s"<extra_id_$k>")
        case Some(_) => None
        case None => Some(toks(p))
      }
    }.mkString(" ")
    val target = spans.zipWithIndex.map { case ((s, e), k) =>
      s"<extra_id_$k> " + (s until e).map(toks).mkString(" ")
    }.mkString(" ")
    assert(out(7L) == ((input, target, 2L,
      spans.map(se => se._2 - se._1).sum.toLong)), out(7L).toString)
    // lossless: splicing each sentinel's target tokens back into the
    // input reproduces the original document
    var recon = input
    spans.zipWithIndex.foreach { case ((s, e), k) =>
      recon = recon.replace(s"<extra_id_$k>",
        (s until e).map(toks).mkString(" "))
    }
    assert(recon == toks.mkString(" "), recon)
    // short / empty / NULL docs: row kept, nothing masked
    assert(out(8L) == (("a b c", "", 0L, 0L)))
    assert(out(9L) == (("", "", 0L, 0L)))
    assert(out(10L) == (("", "", 0L, 0L)))
    // loud params
    intercept[IllegalArgumentException](TextAnalysis.spanCorruption(
      docs, "id", "text", blockSize = 2))
    intercept[IllegalArgumentException](TextAnalysis.spanCorruption(
      docs, "id", "text", blockSize = 20, maxSpan = 11))
  }

  test("minKProb: hand-computed top-k NLL means, member vs novel separation, degenerate docs, loud k") {
    import spark.implicits._
    val ref = Seq("x y x y").toDF("text")
    val docs = Seq((1L, "x y"), (2L, "z w"), (3L, "x y z"), (4L, "x"))
      .toDF("id", "text")
    // ref: bigrams {x y: 2, y x: 1}, cu(x)=2, cu(y)=2, V=2
    // "x y": -ln((2+1)/(2+2)) = 0.287682; "y z": -ln(1/(2+2)) = ln 4;
    // "z w": -ln(1/(0+2)) = ln 2
    val out = TextAnalysis.minKProb(docs, "id", "text", ref, "text",
      kPercent = 20)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Double]("mink_nll"))
            .map(_.doubleValue)))).toMap
    assert(out(1L) == ((1L, Some(0.287682))), out(1L).toString)
    assert(out(2L) == ((1L, Some(0.693147))), out(2L).toString)
    // top-20% of 2 bigrams = the single WORST one: ln 4, not the mean
    assert(out(3L) == ((2L, Some(1.386294))), out(3L).toString)
    assert(out(4L) == ((0L, None)))
    // the member doc scores BELOW the novel one — the statistic's point
    assert(out(1L)._2.get < out(2L)._2.get)
    intercept[IllegalArgumentException](TextAnalysis.minKProb(
      docs, "id", "text", ref, "text", kPercent = 0))
    intercept[IllegalArgumentException](TextAnalysis.minKProb(
      docs, "id", "text", ref, "text", kPercent = 101))
  }

  test("fimTransform: sha-replayed PSM layout, reconstruction, rate gate, degenerate docs, loud params") {
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val toks = (0 until 12).map(i => s"w$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, toks.mkString(" ")),
      (3L, "")).toDF("id", "text")
    // rate 1.0: every doc transforms; replay the cuts for each id
    val out = TextAnalysis.fimTransform(docs, "id", "text",
      rateMicros = 1000000L, seed = "fim")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("fim_text"), r.getAs[Boolean]("is_fim"),
          r.getAs[Long]("n_prefix"), r.getAs[Long]("n_middle"),
          r.getAs[Long]("n_suffix")))).toMap
    Seq(1L, 2L).foreach { id =>
      val c1 = (h60(s"fim:$id:1") % 13).toInt
      val c2 = (h60(s"fim:$id:2") % 13).toInt
      val (lo, hi) = (math.min(c1, c2), math.max(c1, c2))
      val want = (Seq("<fim_prefix>") ++ toks.slice(0, lo) ++
        Seq("<fim_suffix>") ++ toks.slice(hi, 12) ++
        Seq("<fim_middle>") ++ toks.slice(lo, hi)).mkString(" ")
      assert(out(id) == ((want, true, lo.toLong, (hi - lo).toLong,
        (12 - hi).toLong)), out(id).toString)
      // invertible: P + M + S in document order is the original
      val parts = out(id)._1.split(" <fim_suffix> | <fim_middle> ", -1)
      val p = parts(0).stripPrefix("<fim_prefix>").trim
      val sfx = parts(1).trim
      val m = parts(2).trim
      assert(Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
        == toks.mkString(" "))
    }
    // empty doc: transforms to the three markers, zero-token segments
    assert(out(3L)._1 == "<fim_prefix> <fim_suffix> <fim_middle>")
    // rate 0: everything passes through with NULL counts
    val off = TextAnalysis.fimTransform(docs, "id", "text",
      rateMicros = 0L)
      .collect().map(r => (r.getAs[Boolean]("is_fim"),
        r.getAs[String]("fim_text"), r.isNullAt(r.fieldIndex("n_prefix"))))
    assert(off.forall(t => !t._1 && t._3))
    assert(off.map(_._2).toSet == Set(toks.mkString(" "), ""))
    // the gate is sha-deterministic: an intermediate rate picks a
    // stable subset
    val half = TextAnalysis.fimTransform(docs, "id", "text",
      rateMicros = 500000L).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_fim")).toMap
    val wantGate = Seq(1L, 2L, 3L).map(id =>
      id -> (h60(s"fim:$id:gate") % 1000000L < 500000L)).toMap
    assert(half == wantGate, half.toString)
    intercept[IllegalArgumentException](TextAnalysis.fimTransform(
      docs, "id", "text", rateMicros = -1L))
  }

  test("sliceDivergence: identical slices at 0, hand-quantized pins, disjoint absent, loud slice guard") {
    import spark.implicits._
    def run(rows: Seq[(String, String)], maxSlices: Int = 1024) = {
      val out = TextAnalysis.sliceDivergence(rows.toDF("src", "text"),
        "src", "text", maxSlices)
      val m = out.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_common_terms"), r.getAs[Double]("jsd")))).toMap
      graft.core.Caches.releaseCheckpoint(out)
      m
    }
    // identical distributions -> JSD exactly 0 (every shared-term
    // summand is ln 1, coverage is total)
    val same = run(Seq(("A", "x x y"), ("B", "x x y")))
    assert(same == Map(("A", "B") -> ((2L, 0.0))), same.toString)
    // hand-quantized pin: A = {x:2, y:1}, B = {x:1, y:2}
    val hand = run(Seq(("A", "x x y"), ("B", "x y y")))
    assert(hand == Map(("A", "B") -> ((2L, 0.056633))), hand.toString)
    // partial overlap: A = {x, z}, B = {x, w} -> one shared term,
    // half the mass on each side pays ln 2
    val part = run(Seq(("A", "x z"), ("B", "x w")))
    assert(part == Map(("A", "B") -> ((1L, 0.346574))), part.toString)
    // disjoint slices share nothing and are ABSENT (JSD would be ln 2)
    val dis = run(Seq(("A", "x"), ("B", "y"), ("C", "x y")))
    assert(dis.keySet == Set(("A", "C"), ("B", "C")), dis.toString)
    // multi-row slices fold before comparing
    val folded = run(Seq(("A", "x x"), ("A", "y"), ("B", "x x y")))
    assert(folded == Map(("A", "B") -> ((2L, 0.0))), folded.toString)
    // loud: doc-granularity key refused eagerly
    val e = intercept[IllegalArgumentException] {
      run((1 to 5).map(i => (s"doc_$i", "the fox")), maxSlices = 4)
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    // loud: a slice holding > 2e9 tokens would overflow the exact LONG
    // cross term ca·nb + cb·na — refused eagerly via the pre-aggregated
    // entry point (the only way to plant the total cheaply)
    val big = intercept[IllegalArgumentException] {
      TextAnalysis.sliceDivergenceFromCounts(
        Seq(("A", "x", 3000000000L), ("B", "x", 5L))
          .toDF("__k", "__t", "__c")).collect()
    }
    assert(big.getMessage.contains("2e9"), big.getMessage)
  }

  test("speculativeAcceptance: hand fractions, identical-corpora invariant at 1, loud token guards") {
    import spark.implicits._
    def run(tgt: Seq[String], drf: Seq[String]) = {
      val out = TextAnalysis.speculativeAcceptance(
        tgt.toDF("text"), drf.toDF("text"), "text")
      val m = out.collect().map(r => r.getAs[String]("context") ->
        ((r.getAs[Long]("ctx_target"), r.getAs[Long]("ctx_draft"),
          r.getAs[Long]("n_seen"), r.getAs[Double]("acceptance")))).toMap
      graft.core.Caches.releaseCheckpoint(out)
      m
    }
    // hand case: target "a b a c", draft "a b b"; V = {a,b,c} = 3
    //  context a: dp=5, dq=4 -> 2/5 (a b, target min) + 1/4 (a c, draft)
    //             + 1/5 unseen tail = 0.85
    //  context b: dp=4, dq=5 -> 1/5 (b a, draft) + 1/4 (b b, target)
    //             + 1/5 unseen = 0.65
    val hand = run(Seq("a b a c"), Seq("a b b"))
    assert(hand == Map(
      "a" -> ((2L, 1L, 2L, 0.85)), "b" -> ((1L, 2L, 2L, 0.65))),
      hand.toString)
    // identical corpora: Σ_w min(p, p) = Σ_w p — exactly 1 for a
    // context that never ends a document (x: both occurrences continue),
    // and (c_bi + V)/(c_uni + V) for one that does (y ends the doc once:
    // (1+3)/(2+3) = 0.8 — the add-one bigram's doc-final mass deficit,
    // a property of the LM, not of the acceptance math)
    val same = run(Seq("x y x z y"), Seq("x y x z y"))
    assert(same("x")._4 == 1.0 && same("z")._4 == 1.0 &&
      same("y")._4 == 0.8, same.toString)
    assert(same.values.forall(_._4 <= 1.0))
    // loud: sub-bigram corpora
    intercept[IllegalArgumentException](run(Seq("solo"), Seq("a b")))
    intercept[IllegalArgumentException](TextAnalysis.speculativeAcceptance(
      Seq("a b").toDF("text"), Seq("a b").toDF("text"), "text",
      maxTokens = 0L))
  }

  test("vocabularyCoverage: hand Chao1/Good-Turing, NULL keys drop, empty slices absent") {
    import spark.implicits._
    val out = TextAnalysis.vocabularyCoverage(
      Seq(("x", "a a b c"), ("y", "p p"), ("y", "q"),
        (null.asInstanceOf[String], "dropped"))
        .toDF("src", "text"), Seq("src"), "text")
    val m = out.collect().map(r => r.getAs[String]("src") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
        r.getAs[Long]("f1"), r.getAs[Long]("f2"),
        r.getAs[Double]("chao1"), r.getAs[Double]("coverage")))).toMap
    graft.core.Caches.releaseCheckpoint(out)
    // x: N=4, V=3, f1=2 (b,c), f2=1 (a): chao1 = 3 + 2·1/(2·2) = 3.5,
    // coverage = 1 − 2/4 = 0.5
    assert(m("x") == ((4L, 3L, 2L, 1L, 3.5, 0.5)), m.toString)
    // y (multi-row slice folds): N=3, V=2, f1=1 (q), f2=1 (p):
    // chao1 = 2 + 0 = 2.0, coverage = 1 − 1/3
    assert(m("y") == ((3L, 2L, 1L, 1L, 2.0, 0.666667)), m.toString)
    assert(m.keySet == Set("x", "y"))
    intercept[IllegalArgumentException](TextAnalysis.vocabularyCoverage(
      Seq(("x", "a")).toDF("src", "text"), Nil, "text"))
  }
}
