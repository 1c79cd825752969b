package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts, ratios, language id") {
    val df = Seq(
      (1L, "The cat and the dog, in a house."),
      (2L, "el perro y el gato no es una casa"),
      (3L, ""),
      (4L, "zzz qqq vvv")
    ).toDF("id", "text")
    val out = df.select(
      col("id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"),
      round(TextAnalysis.punctRatio(col("text")), 4).as("punct"),
      TextAnalysis.languageId(col("text")).as("lang")
    ).orderBy("id").collect()
    assert(out(0).getAs[Int]("n_tok") == 8)
    assert(out(0).getAs[Int]("n_bpe") == 10) // 8 words + comma + period
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(1).getAs[String]("lang") == "es")
    assert(out(2).getAs[Int]("n_tok") == 0)
    assert(out(3).getAs[String]("lang") == "und")
  }

  test("trainLangId: planted multilingual corpus, heuristic confusion cases, determinism, loud guards") {
    // 24 docs/lang of signature-rich pseudo text with shared noise; the
    // holdout (id % 4 == 0 within each lang block) never trains
    val sigs = Map(
      "en" -> "the house and the garden is of stone to the end",
      "de" -> "der hund und die katze ist nicht ein mit haus",
      "fr" -> "le chien et la maison est pas une dans les arbres",
      "es" -> "el perro y la casa es no una por los arboles")
    val noise = Vector("alpha beta", "gamma delta", "epsilon zeta",
      "eta theta", "iota kappa", "lambda mu")
    val docs = sigs.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((l, sig), li) => (0 until 24).map { i =>
        (li * 24L + i, l, s"$sig ${noise(i % noise.size)} $sig")
      }
    }.toDF("id", "lang", "text")
    val model = TextAnalysis.trainLangId(
      docs.where($"id" % 4 =!= 0), "text", "lang",
      dim = 512, iters = 8, ns = Seq(3))
    assert(model.langs == Seq("de", "en", "es", "fr"))
    val holdout = model.predict(docs.where($"id" % 4 === 0), "text")
      .select($"lang", $"lang_pred").collect()
    val acc = holdout.count(r => r.getString(0) == r.getString(1)).toDouble /
      holdout.length
    assert(acc >= 0.9, s"holdout accuracy $acc below floor")
    // the heuristic's confusion case: a Spanish sentence whose only
    // stopword hits ("la") tie between fr and es — languageId breaks the
    // tie by LIST ORDER and answers fr; the trained char-3-gram model
    // reads casa/mesa/silla and answers es
    val confused = Seq((1L, "la casa la mesa la silla grande"))
      .toDF("id", "text")
    val heur = confused.select(TextAnalysis.languageId($"text"))
      .head().getString(0)
    assert(heur == "fr", s"expected the heuristic tie-break to fr, got $heur")
    val trained = model.predict(confused, "text").select($"lang_pred")
      .head().getString(0)
    assert(trained == "es", s"trained model said $trained")
    // and an out-of-stopword-list text the heuristic calls und
    val und = Seq((1L, "perro gato arboles grande casa"))
      .toDF("id", "text")
    assert(und.select(TextAnalysis.languageId($"text"))
      .head().getString(0) == "und")
    assert(model.predict(und, "text").select($"lang_pred")
      .head().getString(0) == "es")
    // integer-exact GD: retraining reproduces the model bit for bit
    val again = TextAnalysis.trainLangId(
      docs.where($"id" % 4 =!= 0), "text", "lang",
      dim = 512, iters = 8, ns = Seq(3))
    assert(model.langs == again.langs &&
      model.models.zip(again.models).forall { case (a, b) =>
        a.biasMicros == b.biasMicros &&
          java.util.Arrays.equals(a.weightsMicros, b.weightsMicros) })
    // loud guards: NULL labels, degenerate label sets
    intercept[IllegalArgumentException](TextAnalysis.trainLangId(
      Seq((1L, "x", Option.empty[String]), (2L, "y", Some("en")))
        .toDF("id", "text", "lang"), "text", "lang"))
    intercept[IllegalArgumentException](TextAnalysis.trainLangId(
      Seq((1L, "x", "en"), (2L, "y", "en")).toDF("id", "text", "lang"),
      "text", "lang"))
    intercept[IllegalArgumentException](
      TextAnalysis.charNgramTokens(lit("x"), Seq(0)))
  }

  test("trainLangId: fused one-vs-rest GD and shared-bucket predict " +
      "equal the per-language train/score path bit for bit") {
    val docs = Seq(
      (1L, "en", "the house and the stone end the house"),
      (2L, "de", "der hund und die katze mit haus der hund"),
      (3L, "en", "the garden is of stone to the end"),
      (4L, "de", "die katze ist nicht ein mit haus"),
      (5L, "en", "the end of the house and the garden"),
      (6L, "de", "der haus und der hund ist nicht ein")
    ).toDF("id", "lang", "text")
    val fused = TextAnalysis.trainLangId(
      docs, "text", "lang", dim = 128, iters = 5, ns = Seq(3))
    // the sequential reference: one Classifier.train per language over
    // the identical joined n-gram text
    val base = docs.select(
      array_join(TextAnalysis.charNgramTokens(col("text"), Seq(3)), " ")
        .as("__cng"),
      col("lang").as("__lang"))
    val seqModels = Seq("de", "en").map { l =>
      Classifier.train(
        base.withColumn("__y", (col("__lang") === l).cast("int")),
        "__cng", "__y", dim = 128, iters = 5, lr = 1.0)
    }
    fused.models.zip(seqModels).foreach { case (a, b) =>
      assert(a.biasMicros == b.biasMicros)
      assert(java.util.Arrays.equals(a.weightsMicros, b.weightsMicros))
    }
    // shared-bucket predict equals per-language scoreLogit on __cng
    val viaScore = seqModels.zip(Seq("de", "en")).foldLeft(
      docs.withColumn("__cng", array_join(
        TextAnalysis.charNgramTokens(col("text"), Seq(3)), " "))) {
      case (d, (m, l)) => m.scoreLogit(d, "__cng", s"ref_$l")
    }.select(col("id"), col("ref_de_micros"), col("ref_en_micros"))
    val viaPredict = fused.predict(docs, "text")
      .select(col("id"), col("lang_pred_de_micros"),
        col("lang_pred_en_micros"))
    val joined = viaPredict.join(viaScore, "id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("lang_pred_de_micros") ==
        r.getAs[Long]("ref_de_micros"))
      assert(r.getAs[Long]("lang_pred_en_micros") ==
        r.getAs[Long]("ref_en_micros"))
    }
  }

  test("quality score is in [0,1] and favors clean prose") {
    val df = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog " * 6).trim),
      (2L, "!!! ??? ### $$$ %%%")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.qualityScore(col("text")).as("q")).orderBy("id").collect()
    val clean = out(0).getAs[Double]("q")
    val junk = out(1).getAs[Double]("q")
    assert(clean > 0.9 && clean <= 1.0)
    assert(junk < clean - 0.3 && junk >= 0.0)
  }

  test("fingerprint is stable and shingle-based") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "totally different words here now ok")
    ).toDF("id", "text")
    val fp = df.select(col("id"),
      TextAnalysis.fingerprint(col("text"), 3).as("fp")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("fp")).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("containment pairs flag an excerpt that Jaccard misses") {
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"zzz$i").mkString(" ")
    val tiny = "a b c" // 1 shingle — below minSize, contained in nothing here
    val df = Seq((1L, big), (2L, excerpt), (3L, other), (4L, tiny))
      .toDF("id", "text").withColumn("blk", lit("x"))
    val cont = Dedup.ngramContainmentPairs(df, "id", "text", Seq("blk"),
      n = 3, threshold = 0.5, minSize = 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("containment")))
    assert(cont.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0, "every excerpt shingle is in the source")
    // the same pair is invisible to Jaccard at any useful threshold
    val jac = Dedup.ngramJaccardPairs(df, "id", "text", Seq("blk"),
      n = 3, threshold = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("exact dedup keeps first by order col") {
    val df = Seq((1L, "same"), (5L, "same"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exactDedup(df, Seq("text"), "id").collect()
      .map(_.getAs[Long]("id")).toSet
    assert(out == Set(1L, 3L))
  }

  test("minhash LSH finds near-duplicate pairs, skips distinct docs") {
    val base = "spark fuse data pipeline with many shared tokens in common sequence order"
    val df = Seq(
      (1L, base),
      (2L, base + " extra"),                   // near-dup of 1
      (3L, "completely unrelated content about cooking pasta with tomato sauce basil"),
      (4L, base)                               // exact dup of 1
    ).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text",
      numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("auditPairs reports exact jaccard next to the LSH estimate") {
    val base = "spark fuse data pipeline with many shared tokens in common sequence order"
    val df = Seq(
      (1L, base),
      (2L, base),  // exact dup: exact_jaccard 1.0
      (3L, "completely unrelated content about cooking pasta with tomato sauce basil")
    ).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text",
      numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.4)
    val audited = Dedup.auditPairs(pairs, df, "id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("exact_jaccard")).toMap
    assert(audited((1L, 2L)) == 1.0)
    assert(audited.keySet == Set((1L, 2L))) // audit adds no pairs
  }

  test("simhash: identical docs same hash, near docs small hamming distance") {
    val df = Seq(
      (1L, "spark is a distributed compute engine for big data workloads"),
      (2L, "spark is a distributed compute engine for big data workloads"),
      (3L, "spark is a distributed compute engine for huge data workloads"),
      (4L, "bananas apples oranges pears grapes melons kiwis plums")
    ).toDF("id", "text")
    val sh = df.select(col("id"), Dedup.simhash(col("text")).as("sh")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("sh")).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
    assert(ham(sh(1L), sh(3L)) <= 8)
  }

  test("ngram jaccard and cosine expressions") {
    val df = Seq(
      ("a b c d e", "a b c d e", Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      ("a b c d e", "v w x y z", Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      ("a b c d e", "a b c d x", Array(3.0f, 4.0f), Array(3.0f, 4.0f))
    ).toDF("t1", "t2", "v1", "v2")
    val out = df.select(
      round(Dedup.ngramJaccard(col("t1"), col("t2"), 2), 4).as("j"),
      round(Dedup.cosine(col("v1"), col("v2")), 4).as("c")).collect()
    assert(out(0).getAs[Double]("j") == 1.0 && out(0).getAs[Double]("c") == 1.0)
    assert(out(1).getAs[Double]("j") == 0.0 && out(1).getAs[Double]("c") == 0.0)
    assert(out(2).getAs[Double]("j") == 0.6 && out(2).getAs[Double]("c") == 1.0) // 3 of 4 bigrams shared? -> 3/5
  }

  test("cosine near-dup pairs within blocks") {
    val df = Seq(
      (1L, "x", Array(1.0f, 0.0f)), (2L, "x", Array(0.99f, 0.01f)),
      (3L, "x", Array(0.0f, 1.0f)), (4L, "y", Array(1.0f, 0.0f))
    ).toDF("id", "blk", "vec")
    val pairs = Dedup.cosineNearDupPairs(df, "id", "vec", Seq("blk"), 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L))) // 4 is blocked away from 1 despite identical vec
  }

  test("repetition fractions and pattern counts match hand computation") {
    val df = Seq(
      (1L, "a b\na b\nc d"), // 3 lines, one duplicate pair
      (2L, "x x x y"), // 4 tokens, 2 distinct; bigrams: "x x","x x","x y" -> 2/3 distinct
      (3L, ""),
      (4L, "see https://a.io/x and https://b.io mail me@ex.com now"))
      .toDF("id", "text")
    val ta = TextAnalysis
    val out = df.select(col("id"),
      ta.repetitionFrac(ta.lines(col("text"))).as("dl"),
      ta.repetitionFrac(ta.tokens(col("text"))).as("dt"),
      ta.repetitionFrac(ta.shingles(col("text"), 2)).as("db"),
      ta.urlCount(col("text")).as("u"),
      ta.emailCount(col("text")).as("e"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getAs[Double]("dl") - (1.0 - 2.0 / 3)) < 1e-9)
    // tokens a,b,a,b,c,d -> 4 of 6 distinct
    assert(math.abs(out(0).getAs[Double]("dt") - (1.0 - 4.0 / 6)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("dt") - 0.5) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("db") - (1.0 - 2.0 / 3)) < 1e-9)
    assert(out(2).getAs[Double]("dl") == 0.0 && out(2).getAs[Double]("dt") == 0.0)
    assert(out(3).getAs[Int]("u") == 2 && out(3).getAs[Int]("e") == 1)
  }

  test("crossCorpusOverlap finds contaminated docs with probe coverage") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // contains probe
      (2L, "completely different text about spark and scala engines"),
      (3L, "the quick brown fox sat still")) // partial overlap
      .toDF("id", "text")
    val probe = Seq((100L, "the quick brown fox jumps")).toDF("pid", "ptext")
    // probe has 3 distinct trigram shingles
    val out = Dedup.crossCorpusOverlap(corpus, "id", "text",
      probe, "pid", "ptext", n = 3, minShared = 1)
      .orderBy("corpus_id").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L, 3L))
    val full = out.head
    assert(full.getAs[Long]("n_shared") == 3L)
    assert(full.getAs[Double]("probe_frac") == 1.0) // fully contained
    val partial = out(1) // shares "the quick brown" and "quick brown fox"
    assert(partial.getAs[Long]("n_shared") == 2L)
    assert(math.abs(partial.getAs[Double]("probe_frac") - 2.0 / 3) < 1e-6)
    // minShared prunes weak overlaps; broadcastProbe=false matches
    val strict = Dedup.crossCorpusOverlap(corpus, "id", "text",
      probe, "pid", "ptext", n = 3, minShared = 3, broadcastProbe = false)
      .collect()
    assert(strict.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L))
  }

  test("buildVocab ranks by frequency with deterministic tie-break ids") {
    val df = Seq(
      (1L, "the cat and the dog and the bird"),
      (2L, "The DOG and a cat"),
      (3L, "")
    ).toDF("id", "text")
    val vocab = TextAnalysis.buildVocab(df, "text", maxSize = 4, minCount = 2L)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"),
        r.getAs[Int]("token_id")))
    // counts: the=4 (The lowercased), and=3, cat=2, dog=2 (DOG lowercased);
    // a/bird fall below minCount; cat < dog alphabetically on the tie
    assert(vocab.sortBy(_._3).toSeq == Seq(
      ("the", 4L, 0), ("and", 3L, 1), ("cat", 2L, 2), ("dog", 2L, 3)))
    // maxSize truncates after ranking
    val top2 = TextAnalysis.buildVocab(df, "text", maxSize = 2, minCount = 1L)
    assert(top2.count() == 2)
    // lowercase=false keeps case-distinct terms apart
    val cased = TextAnalysis.buildVocab(df, "text", maxSize = 10,
      minCount = 1L, lowercase = false).collect()
      .map(_.getAs[String]("term")).toSet
    assert(cased.contains("The") && cased.contains("the") && cased.contains("DOG"))
  }

  test("vocabCoverage: per-doc OOV rate; tokenless docs report zero") {
    val df = Seq(
      (1L, "the cat and the dog and the bird"),
      (2L, "The DOG and a cat"),
      (3L, "")
    ).toDF("id", "text")
    val vocab = TextAnalysis.buildVocab(df, "text", maxSize = 4, minCount = 2L)
    val out = TextAnalysis.vocabCoverage(df, vocab, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_frac"))).toMap
    // vocab = {the, and, cat, dog}; doc 1 has 8 tokens, 1 OOV (bird);
    // doc 2 has 5 tokens, 1 OOV (a); doc 3 is tokenless
    assert(out(1L) == ((8L, 1L, 0.125)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((5L, 1L, 0.2)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0.0)), "tokenless doc reports zeros")
    assert(out.size == 3, "every doc appears exactly once")
  }

  test("encodeTokens maps to vocab ids in order, OOV to the sentinel") {
    val df = Seq(
      (1L, "the cat saw the dog"),
      (2L, "aardvark the"),
      (3L, "")
    ).toDF("id", "text")
    val vocab = TextAnalysis.buildVocab(df, "text", maxSize = 3, minCount = 1L)
    // ids: the=0 (cnt 3); aardvark=1, cat=2 (cnt-1 ties, alphabetic); dog/saw cut
    val enc = TextAnalysis.encodeTokens(df, vocab, "id", "text")
      .as[(Long, Seq[Int])].collect().toMap
    assert(enc(1L) == Seq(0, 2, -1, 0, -1), enc.toString)
    assert(enc(2L) == Seq(1, 0))
    assert(enc(3L) == Seq.empty)
  }

  test("sharedFingerprintPairs finds span containment that Jaccard misses") {
    val sharedSpan = (1 to 20).map(i => s"copied$i").mkString(" ")
    val hostPadding = (1 to 200).map(i => s"host$i").mkString(" ")
    val df = Seq(
      (1L, s"short source doc $sharedSpan end"),
      // long host: the copied span is a tiny fraction of its tokens
      (2L, s"$hostPadding $sharedSpan"),
      (3L, "unrelated words entirely different content here now")
    ).toDF("id", "text")
    val pairs = Dedup.sharedFingerprintPairs(df, "id", "text", minShared = 2)
      .collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
      == Seq((1L, 2L)))
    assert(pairs.head.getAs[Long]("shared_fps") >= 2,
      "a 20-token copied run must share multiple winnowed fingerprints")
    // the same pair is invisible to Jaccard at any useful threshold:
    // shared trigrams / union is tiny because the host is long
    val jac = Dedup.ngramJaccardPairs(df, "id", "text", Nil, n = 3,
      threshold = 0.2).collect()
    assert(jac.isEmpty, "Jaccard goes quiet on containment — the case this operator exists for")
  }

  test("sharedFingerprintPairs drops boilerplate fingerprints above the cap") {
    // 5 identical docs: every fingerprint is in exactly 5 docs, so the
    // frequency cap either drops all of them or none — exact semantics,
    // no boundary-window subset sharing to reason about
    val boiler = "standard footer text appears in every single document always and forever"
    val df = (1L to 5L).map(i => (i, boiler)).toDF("id", "text")
    val capped = Dedup.sharedFingerprintPairs(df, "id", "text",
      minShared = 1, maxDocsPerFingerprint = 4).collect()
    assert(capped.isEmpty,
      "fingerprints present in all 5 docs exceed the cap of 4 and must not pair")
    val uncapped = Dedup.sharedFingerprintPairs(df, "id", "text",
      minShared = 1, maxDocsPerFingerprint = 50)
    assert(uncapped.count() == 10, "without the cap all 5-choose-2 pairs appear")
  }

  test("dedupSentenceSpansGlobal removes later occurrences of 3-sentence spans") {
    val span = "One two. Three four. Five six."
    val df = Seq(
      (1L, s"Intro here. $span Outro final"),
      (2L, s"$span Trailing bit."),
      (3L, "Nothing shared at all. Second sentence only.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSentenceSpansGlobal(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) ==
      s"Intro here. $span Outro final".replaceAll("\\s+", " ")
      && out(0).getInt(2) == 0, s"first occurrence keeps all: ${out(0)}")
    assert(out(1).getString(1) == "Trailing bit." && out(1).getInt(2) == 3)
    assert(out(2).getInt(2) == 0)
  }

  test("htmlToText strips tags/script/style/comments and decodes entities") {
    val html = """<html><head><title> My  Page </title>
      |<style type="text/css">body { margin: 0; }</style>
      |<script>if (1 < 2) { alert("x"); }</script></head>
      |<body><!-- header --><h1>Hello &amp; welcome</h1>
      |<p>A &lt;b&gt; is &quot;bold&quot;; it&#39;s &nbsp;markup.</p>
      |<p>Escaped entity: &amp;lt; stays literal.</p></body></html>""".stripMargin
    val out = Seq((1L, html)).toDF("id", "html").select(
      TextAnalysis.htmlToText(col("html")).as("text"),
      TextAnalysis.htmlTitle(col("html")).as("title")).head
    assert(out.getString(0) == "My Page Hello & welcome " +
      "A <b> is \"bold\"; it's markup. Escaped entity: &lt; stays literal.")
    assert(out.getString(1) == "My Page")
    // unclosed script strips to end-of-document; null html -> ''
    val rows = Seq((1L, "before<script>var x = 1;"),
      (2L, null.asInstanceOf[String])).toDF("id", "html")
      .select(col("id"), TextAnalysis.htmlToText(col("html")))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "before")
    assert(rows(1).getString(1) == "")
  }

  test("compressionRatio separates repetitive floods from prose") {
    val prose = "The committee reviewed seventeen distinct proposals before " +
      "lunch, rejecting most for budget reasons nobody could quite explain."
    val df = Seq(
      (1L, "spam spam " * 100),
      (2L, prose),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.compressionRatio(col("text")).as("r"))
      .orderBy("id").collect()
    val flood = out(0).getDouble(1)
    val clean = out(1).getDouble(1)
    assert(flood < 0.1, s"repetitive flood should compress hard, got $flood")
    assert(clean > 0.3 && clean < 1.0, s"prose ratio out of band: $clean")
    assert(flood < clean / 3)
    assert(out(2).getDouble(1) == 0.0 && out(3).getDouble(1) == 0.0)
    // deterministic across evaluations (fixed level, fixed zlib settings)
    val again = df.select(TextAnalysis.compressionRatio(col("text")))
      .orderBy("text").collect().map(_.getDouble(0)).sorted
    assert(again.toSeq == out.map(_.getDouble(1)).sorted.toSeq)
  }

  test("dedupLinesGlobal keeps exactly the first occurrence of each line") {
    val df = Seq(
      (1L, "alpha\nshared footer\nbeta"),
      (2L, "shared footer\ngamma\nshared footer"),
      (3L, "shared footer"),
      (4L, "  \n\n")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesGlobal(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 4, "every document survives, even fully-deduped ones")
    assert(out(0).getString(1) == "alpha\nshared footer\nbeta")
    // doc 2 loses BOTH its copies (doc 1 owns the first occurrence)
    assert(out(1).getString(1) == "gamma")
    assert(out(2).getString(1) == "")
    assert(out(3).getString(1) == "")
  }

  test("prefixJaccardPairs equals unblocked ngramJaccardPairs exactly") {
    // boilerplate-heavy corpus: every doc shares the frequent header
    // tokens, so a naive token self-join would fan out on them — the
    // prefix filter must still return the exact answer
    val header = "terms of service apply to this site"
    val df = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta"),
      (2L, s"$header alpha beta gamma delta epsilon eta"),
      (3L, s"$header completely different body text here now"),
      (4L, s"$header completely different body text here now"),
      (5L, "no shared material with anything else at all"),
      (6L, "")
    ).toDF("id", "text")
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).sortBy(t => (t._1, t._2)).toSeq
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val pp = key(Dedup.prefixJaccardPairs(df, "id", "text", n = 3,
        threshold = t).collect())
      val ref = key(Dedup.ngramJaccardPairs(df, "id", "text", Nil, n = 3,
        threshold = t).collect())
      assert(pp == ref, s"threshold $t: prefix-filtered != exhaustive")
    }
    // sanity on content: the identical pair verifies at 1.0
    val atHalf = Dedup.prefixJaccardPairs(df, "id", "text", n = 3, threshold = 0.5)
      .collect()
    assert(atHalf.exists(r => r.getAs[Long]("id_a") == 3L &&
      r.getAs[Long]("id_b") == 4L && r.getAs[Double]("jaccard") == 1.0))
  }

  test("prefixJaccardPairs candidate pruning: prefixes hold the rare tail") {
    // the prefix of a doc under threshold 0.8 is |S| - ceil(0.8|S|) + 1
    // ≈ 20% of its shingles — the RAREST ones. Docs that only share
    // universal boilerplate never meet in the join at a high threshold.
    val boiler = "one two three four five six seven eight nine ten"
    val df = (1L to 6L).map(i =>
      (i, s"$boiler unique$i only$i content$i words$i here$i stuff$i pad$i more$i extra$i tail$i"))
      .toDF("id", "text")
    val out = Dedup.prefixJaccardPairs(df, "id", "text", n = 3, threshold = 0.8)
    assert(out.collect().isEmpty,
      "40%-boilerplate docs are far below jaccard 0.8 and must not pair")
  }

  test("markdownCodeBlocks extracts fences with tags; strip leaves prose") {
    val md =
      """Intro prose.
        |```scala
        |val x = 1
        |val y = 2
        |```
        |Middle words.
        |```
        |plain block
        |```
        |Trailing ``` unterminated fence
        |""".stripMargin
    val df = Seq((1L, md), (2L, "no code at all"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val blocks = TextAnalysis.markdownCodeBlocks(df, "id", "text")
      .orderBy("id", "block_idx")
      .select("id", "block_idx", "lang", "code")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(blocks == Seq(
      (1L, 0L, "scala", "val x = 1\nval y = 2\n"),
      (1L, 1L, "", "plain block\n")))
    val prose = df.where(col("id") === 1L)
      .select(TextAnalysis.stripCodeBlocks(col("text"))).as[String].head()
    assert(prose.contains("Intro prose.") && prose.contains("Middle words."))
    assert(!prose.contains("val x") && !prose.contains("plain block"))
    assert(prose.contains("unterminated"), "unterminated fence is not a block")
  }

  test("lshPlan matches the S-curve formula and brackets the threshold") {
    val plans = Dedup.lshPlan(16, 0.5)
    assert(plans.map(_._1) == Seq(1, 2, 4, 8, 16), "all divisors, ascending")
    plans.foreach { case (b, r, p, infl) =>
      assert(b * r == 16)
      assert(math.abs(p - (1.0 - math.pow(1.0 - math.pow(0.5, r), b))) < 1e-12)
      assert(math.abs(infl - math.pow(1.0 / b, 1.0 / r)) < 1e-12)
    }
    // more bands -> higher candidate probability at any fixed s
    assert(plans.map(_._3) == plans.map(_._3).sorted)
    // the default operating point (16 perms, 4 bands) turns on below 0.5
    val four = plans.find(_._1 == 4).get
    assert(four._4 < 0.75 && four._3 > 0.2)
    intercept[IllegalArgumentException](Dedup.lshPlan(16, 1.0))
  }

  test("minhashLshPairsAtRecall: cheapest qualifying plan chosen; measured recall meets the target") {
    // plan selection: fewest bands whose collision prob at the threshold
    // reaches the target (candidate volume grows with bands)
    val (b85, r85, p85) = Dedup.chooseLshPlan(16, 0.5, 0.85)
    assert((b85, r85) == (8, 2) && p85 >= 0.85 && p85 < 0.9,
      s"got ($b85, $r85, $p85)")
    val (b90, _, p90) = Dedup.chooseLshPlan(16, 0.5, 0.9)
    assert(b90 == 16 && p90 >= 0.9)
    // unreachable target is loud, naming the best available point
    val e = intercept[IllegalArgumentException](
      Dedup.chooseLshPlan(4, 0.1, 0.99))
    assert(e.getMessage.contains("raise numPerms"))
    // planted corpus: 20 near-dup pairs (one-token tail) + distractors;
    // the chosen operating point's measured recall must reach the target
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      .split(" ")
    def doc(i: Int) = (0 until 12)
      .map(j => words((i * 7 + j * 3) % words.length) + (i % 5))
      .mkString(" ")
    val planted = (0 until 20).flatMap { i =>
      Seq((i.toLong, doc(i)), (1000L + i, doc(i) + " tail")) }
    val distract = (2000 until 2010).map(i => (i.toLong, doc(i + 57)))
    val df = (planted ++ distract).toDF("id", "text")
    val out = Dedup.minhashLshPairsAtRecall(df, "id", "text",
      threshold = 0.4, targetRecall = 0.9, numPerms = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val found = (0 until 20).count(i => out.contains((i.toLong, 1000L + i)))
    assert(found >= 18, s"measured recall ${found / 20.0} below target 0.9")
  }

  test("chunkTokens windows overlap by window-stride; short docs one chunk; empty none") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than window
      (3L, "")).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(df, "id", "text", window = 4, stride = 3)
      .orderBy("id", "chunk_idx").collect()
    val d1 = out.filter(_.getAs[Long]("id") == 1L)
    // starts 0,3,6 cover to token 10; start 9 not needed (6+4 >= 10)
    assert(d1.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 3L, 6L))
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L))
    val d2 = out.filter(_.getAs[Long]("id") == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "a b"
      && d2(0).getAs[Long]("n_tokens") == 2L)
    assert(!out.exists(_.getAs[Long]("id") == 3L), "empty doc -> no chunks")
    // a doc needing a truncated tail window: 11 tokens, starts 0,3,6,9
    val tail = TextAnalysis.chunkTokens(
      Seq((9L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("id", "text"),
      "id", "text", window = 4, stride = 3).orderBy("chunk_idx").collect()
    assert(tail.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L, 2L))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkTokens(df, "id", "text", window = 4, stride = 5))
  }

  test("fleschReadingEase matches hand-computed scores; silent-e rule applied") {
    def flesch(s: String): Option[Double] =
      Option(Seq(Tuple1(s)).toDF("t")
        .select(TextAnalysis.fleschReadingEase(col("t")).as("f"))
        .collect()(0).getAs[Any]("f")).map(_.asInstanceOf[Double])
    // 6 one-syllable words, 1 sentence: 206.835 - 1.015*6 - 84.6*1
    assert(math.abs(flesch("The cat sat on the mat.").get -
      (206.835 - 1.015 * 6 - 84.6)) < 1e-9)
    // silent e: plate=1 syllable; -le keeps its syllable: table=2
    // words=2 sents=1 syls=3: 206.835 - 1.015*2 - 84.6*1.5
    assert(math.abs(flesch("plate table").get -
      (206.835 - 1.015 * 2 - 84.6 * 1.5)) < 1e-9)
    assert(flesch("").isEmpty, "empty text has no readability")
  }

  test("noveltyFrac: first arriver novel, copy borrowed, ties don't see each other") {
    val df = Seq(
      (1L, "a b c d"),          // shingles {abc, bcd} — first, fully novel
      (2L, "a b c d"),          // exact copy — fully seen
      (3L, "a b c x y z"),      // {abc, bcx, cxy, xyz}: 1 of 4 seen
      (4L, ""),                 // empty — no shingles, novelty NULL
      (5L, "m n o p"),          // tie pair at order 5 …
      (5L + 1000, "m n o p")    // … ordered by id % 1000 ⇒ SAME order: neither sees the other
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyFrac(df, "doc_id", "text",
      col("doc_id") % 1000, shingleSize = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen"),
          Option(r.getAs[Any]("novelty_frac"))))).toMap
    assert(out(1L) == ((2L, 0L, Some(1.0))))
    assert(out(2L) == ((2L, 2L, Some(0.0))))
    assert(out(3L) == ((4L, 1L, Some(0.75))))
    assert(out(4L) == ((0L, 0L, None)), "no shingles -> novelty undefined")
    assert(out(5L) == ((2L, 0L, Some(1.0))), "order tie is not 'earlier'")
    assert(out(1005L) == ((2L, 0L, Some(1.0))))
    assert(out.size == 6, "every input doc appears exactly once")
  }

  test("sentence language segmentation flags mixed docs that doc-level ID misses") {
    val docs = Seq(
      (1L, "The cat is on the mat. The dog is in the house. " +
        "Der hund ist nicht mit der katze."), // 2 en + 1 de -> mixed, majority en
      (2L, "Le chat est dans la maison. Le chien est dans le jardin."), // pure fr
      (3L, "xyzzy plugh. qwerty asdf."), // unidentifiable -> und, not mixed
      (4L, "")) // no sentences -> no row
      .toDF("doc_id", "text")
    val sents = TextAnalysis.sentenceLanguages(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    assert(sents((1L, 0)) == "en" && sents((1L, 1)) == "en"
      && sents((1L, 2)) == "de", s"got $sents")
    val mix = TextAnalysis.languageMixture(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(mix(1L) == ((3L, 2L, "en", 2.0 / 3.0, true)), s"got ${mix(1L)}")
    assert(mix(2L) == ((2L, 1L, "fr", 1.0, false)))
    assert(mix(3L) == ((2L, 0L, "und", 1.0, false)))
    assert(!mix.contains(4L), "empty doc emits no mixture row")
    // the signal doc-level ID misses: doc 1 reads as plain 'en' whole
    val docLevel = docs.where(col("doc_id") === 1L)
      .select(TextAnalysis.languageId(col("text"))).collect().head.getString(0)
    assert(docLevel == "en", "doc-level ID sees only the majority language")
  }

  test("semanticDecontaminate flags planted eval copies, not the rest") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.7f, 0.7f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("id", "v")
    // eval: a scaled copy of train 1 (cos 1.0) and an orthogonal probe
    val eval = Seq((100L, Seq(2.0f, 0.0f)), (101L, Seq(0.0f, -3.0f)))
      .toDF("eid", "v")
    val hits = Dedup.semanticDecontaminate(
      train, "id", eval, "eid", "v", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.toSet == Set((1L, 100L, 1.0)),
      s"expected only the planted copy, got ${hits.toSeq}")
    // lowering the threshold admits the 45-degree neighbor
    val loose = Dedup.semanticDecontaminate(
      train, "id", eval, "eid", "v", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((3L, 100L)) && loose.contains((1L, 100L)))
    // oversized eval side is loud, never a silent executor OOM
    assert(intercept[IllegalArgumentException](
      Dedup.semanticDecontaminate(train, "id", eval, "eid", "v",
        0.9, maxEvalRows = 1)).getMessage.contains("broadcast"))
    intercept[IllegalArgumentException](
      Dedup.semanticDecontaminate(train, "id", eval, "eid", "v", 0.0))
  }
}
