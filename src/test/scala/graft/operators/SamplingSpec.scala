package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("hash split is exhaustive, deterministic, and near the fractions") {
    val df = ids(5000)
    val split = Sampling.withHashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000)
    assert(math.abs(counts("train") - 4000) < 200, counts.toString)
    assert(math.abs(counts("val") - 500) < 120, counts.toString)
    // rerun → identical assignment
    val again = Sampling.withHashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
  }

  test("a row's split never changes when the dataset grows") {
    val small = Sampling.withHashSplit(ids(100), "id", Seq("a" -> 0.5, "b" -> 0.5))
    val large = Sampling.withHashSplit(ids(10000), "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(small.join(large.withColumnRenamed("split", "split2"), "id")
      .where(col("split") =!= col("split2")).isEmpty)
  }

  test("hash sample keeps roughly the fraction, stable across runs") {
    val s1 = Sampling.hashSample(ids(5000), "id", 0.2)
    assert(math.abs(s1.count() - 1000) < 150)
    assert(s1.except(Sampling.hashSample(ids(5000), "id", 0.2)).isEmpty)
  }

  test("limitPerGroup keeps the first n rows per group deterministically") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, 0.1), ("a", 1L, 0.9), ("a", 2L, 0.5),
      ("b", 7L, 0.2), ("b", 9L, 0.8),
      ("c", 5L, 0.3)).toDF("grp", "id", "score")
    val capped = Sampling.limitPerGroup(df, Seq("grp"), 2, Seq(col("id")))
      .orderBy("grp", "id").as[(String, Long, Double)].collect().toSeq
    assert(capped.map(r => (r._1, r._2)) ==
      Seq("a" -> 1L, "a" -> 2L, "b" -> 7L, "b" -> 9L, "c" -> 5L))
    // "best 2 by score": rank descending on score
    val best = Sampling.limitPerGroup(df, Seq("grp"), 2,
      Seq(col("score").desc, col("id")))
      .orderBy("grp", "id").as[(String, Long, Double)].collect().toSeq
    assert(best.filter(_._1 == "a").map(_._2) == Seq(1L, 2L)) // 0.9 and 0.5
    intercept[IllegalArgumentException](
      Sampling.limitPerGroup(df, Seq("grp"), 2, Nil))
  }

  test("tokenBudgetPerGroup greedy-fills: straddler kept, short groups whole") {
    import spark.implicits._
    val df = Seq(
      // group a: 40 + 40 + 40 tokens against budget 100 -> exclusive
      // cumsums 0, 40, 80 all < 100 -> ALL kept (total 120, the
      // straddler crosses the line); id 4 starts at 120 -> dropped
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), ("a", 4L, 40L),
      // group b: under budget entirely
      ("b", 5L, 30L), ("b", 6L, 30L),
      // group c: single huge doc still kept (cumsum 0 < budget)
      ("c", 7L, 999L)).toDF("grp", "id", "n_tok")
    val out = Sampling.tokenBudgetPerGroup(df, Seq("grp"), "n_tok", 100L,
      Seq(col("id"))).orderBy("id").as[(String, Long, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L, 5L, 6L, 7L))
    // best-first fill: order by score desc changes which rows make the cut
    val scored = Seq(
      ("a", 1L, 60L, 0.1), ("a", 2L, 60L, 0.9), ("a", 3L, 60L, 0.5))
      .toDF("grp", "id", "n_tok", "q")
    val best = Sampling.tokenBudgetPerGroup(scored, Seq("grp"), "n_tok",
      100L, Seq(col("q").desc, col("id")))
      .as[(String, Long, Long, Double)].collect().map(_._2).toSet
    assert(best == Set(2L, 3L), "0.9 fills first, 0.5 straddles, 0.1 out")
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetPerGroup(df, Seq("grp"), "n_tok", 100L, Nil))
    // a null/negative token count must fail loudly, not ride along free
    val dirty = Seq(("a", 1L, Some(40L)), ("a", 2L, None))
      .toDF("grp", "id", "n_tok")
    val eNull = intercept[Exception](
      Sampling.tokenBudgetPerGroup(dirty, Seq("grp"), "n_tok", 100L,
        Seq(col("id"))).collect())
    assert(eNull.getMessage.contains("non-null"))
    val neg = Seq(("a", 1L, -5L)).toDF("grp", "id", "n_tok")
    intercept[Exception](
      Sampling.tokenBudgetPerGroup(neg, Seq("grp"), "n_tok", 100L,
        Seq(col("id"))).collect())
  }

  test("packSequences bins respect budget + max-doc slack and shard isolation") {
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd", 30L + (i % 7) * 10))
      .toDF("doc_id", "source", "n_tok")
    val packed = Packing.packSequences(docs, "n_tok", budget = 100L,
      orderCols = Seq(col("doc_id")), shardCols = Seq("source"))
    val rows = packed.select("source", "doc_id", "n_tok", "bin", "bin_offset")
      .as[(String, Long, Long, Long, Long)].collect()
    // offsets are exclusive running sums within each shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      var running = 0L
      sorted.foreach { r =>
        assert(r._5 == running, s"offset mismatch at ${r._2}")
        assert(r._4 == running / 100L)
        running += r._3
      }
    }
    // bins are contiguous from 0 and every bin's span stays within
    // budget + max token count - 1
    val maxTok = rows.map(_._3).max
    rows.groupBy(r => (r._1, r._4)).foreach { case ((_, bin), rs) =>
      val span = rs.map(r => r._5 + r._3).max - (bin * 100L)
      assert(span <= 100L + maxTok - 1)
    }
    intercept[IllegalArgumentException](
      Packing.packSequences(docs, "n_tok", 100L, Seq(col("doc_id")), Nil))
  }

  test("sampleToMixture lands near the target proportions and drops others") {
    val df = spark.range(30000).select(col("id"),
      concat(lit("g"), (col("id") % 3).cast("string")).as("grp"))
    // g0/g1/g2 each 10k rows; ask for 60/30/10 — g0 is the scarcest
    // relative to its weight, so n = floor(10000/0.6) = 16666
    val out = Sampling.sampleToMixture(df, "id", "grp",
      Map("g0" -> 0.6, "g1" -> 0.3, "g2" -> 0.1))
    val byGrp = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.keySet == Set("g0", "g1", "g2"))
    val total = byGrp.values.sum.toDouble
    assert(math.abs(byGrp("g0") / total - 0.6) < 0.02)
    assert(math.abs(byGrp("g1") / total - 0.3) < 0.02)
    assert(math.abs(byGrp("g2") / total - 0.1) < 0.02)
    // near the max achievable total
    assert(math.abs(total - 16666.0) / 16666.0 < 0.05)
    // the scarcest group is taken (almost) whole
    assert(byGrp("g0") > 9800)
  }

  test("sampleToMixture is deterministic and validates its inputs") {
    val df = spark.range(1000).select(col("id"),
      when(col("id") % 4 === 0, "a").otherwise("b").as("grp"))
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val r1 = Sampling.sampleToMixture(df, "id", "grp", w)
      .agg(sum("id")).head().getLong(0)
    val r2 = Sampling.sampleToMixture(df, "id", "grp", w)
      .agg(sum("id")).head().getLong(0)
    assert(r1 == r2)
    // weights must sum to 1
    intercept[IllegalArgumentException](
      Sampling.sampleToMixture(df, "id", "grp", Map("a" -> 0.5, "b" -> 0.2)))
    // a weighted group with no rows is unachievable
    intercept[IllegalArgumentException](
      Sampling.sampleToMixture(df, "id", "grp",
        Map("a" -> 0.5, "missing" -> 0.5)))
    // totalRows beyond the achievable bound is rejected
    intercept[IllegalArgumentException](
      Sampling.sampleToMixture(df, "id", "grp", w, totalRows = 1000000L))
  }

  test("sampleToMixture survives the binding group's one-ulp fraction overflow") {
    // counts a=77, b=10000 with weights 0.07/0.93: floor(77/0.07) = 1100
    // and 1100 * 0.07 / 77 = 1.0000000000000002 — must clamp, not throw
    val df = spark.range(10077).select(col("id"),
      when(col("id") < 77, "a").otherwise("b").as("grp"))
    val out = Sampling.sampleToMixture(df, "id", "grp",
      Map("a" -> 0.07, "b" -> 0.93))
    val byGrp = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("a") == 77) // fraction clamps to 1.0: whole group kept
    assert(byGrp("b") > 0)
  }

  test("alphaMixtureWeights matches the micro-rounded formula; alpha=1 is natural") {
    val df = ((1 to 800).map(i => (i.toLong, "en"))
      ++ (801 to 900).map(i => (i.toLong, "de"))
      ++ (901 to 1000).map(i => (i.toLong, "fr"))).toDF("id", "lang")
    def expected(alpha: Double): Map[String, Double] = {
      val micros = Map("en" -> 800L, "de" -> 100L, "fr" -> 100L)
        .map { case (g, c) => g -> math.round(math.pow(c.toDouble, alpha) * 1e6) }
      val s = micros.values.sum
      micros.map { case (g, pw) => g -> pw.toDouble / s.toDouble }
    }
    assert(Sampling.alphaMixtureWeights(df, "lang", alpha = 0.3)
      == expected(0.3))
    val natural = Sampling.alphaMixtureWeights(df, "lang", alpha = 1.0)
    assert(math.abs(natural("en") - 0.8) < 1e-9)
    // smoothing flattens: low-resource share strictly grows as alpha drops
    assert(expected(0.3)("de") > natural("de"))
    intercept[IllegalArgumentException] {
      Sampling.alphaMixtureWeights(df, "lang", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.alphaMixtureWeights(df, "id", maxGroups = 10)
    }
  }

  test("sampleToAlphaMixture output proportions sit near the smoothed targets") {
    val df = ((1 to 3000).map(i => (i.toLong, "en"))
      ++ (3001 to 3500).map(i => (i.toLong, "de"))).toDF("id", "lang")
    val w = Sampling.alphaMixtureWeights(df, "lang", alpha = 0.5)
    val out = Sampling.sampleToAlphaMixture(df, "id", "lang", alpha = 0.5)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byLang.values.sum.toDouble
    // hash-uniform, so ±5pp at this size; determinism is oracle-checked
    assert(math.abs(byLang("en") / total - w("en")) < 0.05,
      s"got ${byLang("en") / total}, want ~${w("en")}")
    assert(byLang("de") > 0)
  }

  test("weightedSample matches the reference E-S draw exactly and is deterministic") {
    def u(id: Long, salt: String): Double = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 7), 16) + 1).toDouble / 268435456.0
    }
    val rows = (1L to 30L).map(i => ("g", i, (i % 5 + 1).toDouble))
    val df = rows.toDF("grp", "id", "w")
    val expect = rows.map { case (_, i, wt) => (i, math.log(u(i, "s1")) / wt) }
      .sortBy { case (i, key) => (-key, i) }.take(5).map(_._1).toSet
    def draw() = Sampling.weightedSample(df, Seq("grp"), "id", "w", 5, "s1")
      .select("id").as[Long].collect().toSet
    assert(draw() == expect)
    assert(draw() == expect) // stable across runs
  }

  test("assignShards balances token totals within one max-doc of target, deterministically") {
    val docs = (1L to 500L).map(i => (i, 50L + (i * 37) % 400))
      .toDF("doc_id", "n_tok")
    val n = 8
    val out = Packing.assignShards(docs, "doc_id", "n_tok", n,
      orderBuckets = 16)
    val totals = out.groupBy("shard").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("t")).toMap
    assert(totals.keySet == (0L until n.toLong).toSet,
      s"all $n shards must be populated, got ${totals.keySet}")
    val grand = docs.agg(sum("n_tok")).as[Long].head()
    val target = (grand + n - 1) / n
    val maxDoc = 449L
    totals.foreach { case (s, t) =>
      assert(t <= target + maxDoc && t >= target - maxDoc,
        s"shard $s total $t outside target $target ± $maxDoc")
    }
    // deterministic across partitionings
    val a = out.select("doc_id", "shard").collect().map(_.toString).sorted.toSeq
    val b = Packing.assignShards(docs.repartition(7), "doc_id", "n_tok", n,
      orderBuckets = 16).select("doc_id", "shard")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // null token counts are loud
    val bad = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long))
      .toDF("doc_id", "n_tok")
    intercept[Exception](
      Packing.assignShards(bad, "doc_id", "n_tok", 2).collect())
  }

  test("writeShards lands shard directories + manifest; torn export has no manifest") {
    val root = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val docs = (1L to 200L).map(i => (i, 10L + i % 90)).toDF("doc_id", "n_tok")
    Packing.writeShards(docs, s"$root/out", "doc_id", "n_tok", numShards = 4)
    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 200)
    assert(back.select("shard").distinct().count() == 4)
    // manifest certifies what landed
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/out", Packing.ShardManifestFileName)),
      "UTF-8")
    assert(manifest.contains("\"num_shards\":4") ||
      manifest.contains("\"num_shards\" : 4"))
    val node = graft.io.Json.parse(manifest)
    val shardTokens = {
      import scala.jdk.CollectionConverters._
      node.get("shards").elements().asScala.map(_.get("tokens").asLong()).toSeq
    }
    assert(shardTokens.sum == docs.agg(sum("n_tok")).as[Long].head(),
      "manifest token totals must sum to the corpus total")
  }

  test("appendToShards: deficit-targeted growth re-balances and recertifies the manifest") {
    val root = java.nio.file.Files.createTempDirectory("graft_shards_app_").toString
    val base = (1L to 300L).map(i => (i, 20L + i % 80)).toDF("doc_id", "n_tok")
    Packing.writeShards(base, s"$root/out", "doc_id", "n_tok", numShards = 4)
    val batch = (1000L to 1150L).map(i => (i, 30L + i % 60)).toDF("doc_id", "n_tok")
    Packing.appendToShards(batch, s"$root/out")
    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 300 + 151)
    // every shard sits within one max-doc of the common post-append target
    val totals = back.groupBy("shard").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getAs[Number]("shard").longValue() ->
        r.getAs[Long]("t")).toMap
    val grand = totals.values.sum
    val target = (grand + 3) / 4
    val maxDoc = 99L
    totals.foreach { case (s, t) =>
      assert(math.abs(t - target) <= maxDoc,
        s"shard $s total $t strays from target $target by > $maxDoc")
    }
    // the manifest recertified to the committed state
    val node = graft.io.Json.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/out", Packing.ShardManifestFileName)),
      "UTF-8"))
    val manTokens = {
      import scala.jdk.CollectionConverters._
      node.get("shards").elements().asScala.map(_.get("tokens").asLong()).sum
    }
    assert(manTokens == grand, "manifest must certify the appended totals")
    // appending to a non-layout path is loud
    intercept[IllegalArgumentException](
      Packing.appendToShards(batch, s"$root/nope"))
  }

  test("waterfillAllocations: shared cap funds small groups, throttles big ones") {
    val counts = Seq(("a", 1L), ("b", 5L), ("c", 5L)).toDF("grp", "n")
    val out = Sampling.waterfillAllocations(counts, "grp", "n", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    // cap = 3: a fully funded (1), b and c throttled to 3 — sum exactly 7
    assert(out == Map("a" -> 1L, "b" -> 3L, "c" -> 3L), s"got $out")
    // budget beyond the total funds everyone
    val all = Sampling.waterfillAllocations(counts, "grp", "n", 100L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(all == Map("a" -> 1L, "b" -> 5L, "c" -> 5L))
    // zero budget allocates zero; div-remainder slack stays under #capped
    val zero = Sampling.waterfillAllocations(counts, "grp", "n", 0L)
      .collect().map(_.getAs[Long]("alloc")).sum
    assert(zero == 0L)
    val odd = Sampling.waterfillAllocations(counts, "grp", "n", 6L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    // cap = 2: sum 5 <= 6, slack 1 < 2 capped groups
    assert(odd == Map("a" -> 1L, "b" -> 2L, "c" -> 2L), s"got $odd")
    // null counts are loud
    val bad = Seq(("a", java.lang.Long.valueOf(3L)), ("b", null: java.lang.Long))
      .toDF("grp", "n")
    intercept[Exception](
      Sampling.waterfillAllocations(bad, "grp", "n", 5L).collect())
  }

  test("weightedSample favors heavy weights and excludes zero-mass rows") {
    val df = Seq[(String, Long, java.lang.Double)](
      ("g", 1L, 50.0), ("g", 2L, 1.0), ("g", 3L, 0.0), ("g", 4L, null))
      .toDF("grp", "id", "w")
    val wins = (0 until 40).count { s =>
      Sampling.weightedSample(df, Seq("grp"), "id", "w", 1, s"salt$s")
        .select("id").as[Long].head() == 1L
    }
    assert(wins >= 30, s"heavy item won only $wins/40 draws")
    // zero/null weight never sampled even with k above group size
    val all = Sampling.weightedSample(df, Seq("grp"), "id", "w", 10, "sx")
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L))
  }

  private def negDraw(seed: String, c: String, x: String, j: Int, w: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$seed:$c:$x:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % w
  }

  test("negativeSamples replays the documented cumulative-line draws") {
    val vocab = Seq(("a", 1L), ("b", 2L), ("c", 1L)).toDF("t", "w")
    val pairs = Seq(("x", "y")).toDF("center", "context")
    val out = Sampling.negativeSamples(pairs, "center", "context",
      vocab, "t", "w", k = 4, seed = "s")
      .collect().map(r => r.getAs[Int]("j") -> r.getAs[String]("neg_term"))
      .toMap
    // cumulative line (term order a,b,c): a=[0,0], b=[1,2], c=[3,3], W=4
    def expected(j: Int): String = negDraw("s", "x", "y", j, 4L) match {
      case 0 => "a"
      case 1 | 2 => "b"
      case 3 => "c"
    }
    (1 to 4).foreach(j => assert(out(j) == expected(j), s"draw $j"))
    assert(out.size == 4, "exactly one negative per (pair, j)")
  }

  test("negativeSamples tracks the weight distribution and stays stable") {
    val vocab = Seq(("rare", 1L), ("common", 9L)).toDF("t", "w")
    val pairs = Seq.tabulate(300)(i => (s"c$i", s"x$i"))
      .toDF("center", "context")
    val draws = Sampling.negativeSamples(pairs, "center", "context",
      vocab, "t", "w", k = 1)
      .groupBy("neg_term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = draws.getOrElse("common", 0L).toDouble / 300
    assert(frac > 0.8 && frac < 0.98, s"9:1 weights drew common at $frac")
    val a = Sampling.negativeSamples(pairs.repartition(1), "center",
      "context", vocab, "t", "w", 2).collect().map(_.toString).sorted.toSeq
    val b = Sampling.negativeSamples(pairs.repartition(7), "center",
      "context", vocab, "t", "w", 2).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.length == 600, "pairs x k rows, always")
    intercept[IllegalArgumentException](Sampling.negativeSamples(
      pairs, "center", "context", vocab, "t", "w", 0))
    intercept[IllegalArgumentException](Sampling.negativeSamples(
      pairs, "center", "context", vocab, "t", "w", 1, seed = "a:b"))
    intercept[IllegalArgumentException](Sampling.negativeSamples(
      pairs, "center", "context", vocab.where(col("w") < 0), "t", "w", 1))
  }

  test("dataConstrainedPlan: fresh-token domain at efficiency 1, repeated domain on the published decay") {
    val docs = Seq(
      ("tiny", Seq.fill(10)("a").mkString(" ")),      // U = 10
      ("big", Seq.fill(1000)("b").mkString(" ")),     // U = 1000
      (null.asInstanceOf[String], "dropped dropped")) // NULL domain drops
      .toDF("src", "text")
    val out = Sampling.dataConstrainedPlan(docs, "src", "text",
        budget = 400L)
      .collect().map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("unique_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Double]("epochs"), r.getAs[Double]("effective_tokens"),
          r.getAs[Double]("efficiency")))).toMap
    assert(out.keySet == Set("tiny", "big"))
    // k = 2 -> alloc = 200 each. big: alloc <= U, every token fresh.
    assert(out("big") == ((1000L, 200L, 0.2, 200.0, 1.0)), out("big").toString)
    // tiny: R = 200/10 - 1 = 19 repetitions through the Eq. 5 decay
    val dP = 10.0 + 10.0 * 15.39 * (1.0 - math.exp(-(200.0 / 10.0 - 1.0) / 15.39))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("tiny") == ((10L, 200L, 20.0, r6(dP), r6(dP / 200.0))),
      out("tiny").toString)
    // repetition past ~16 epochs is nearly worthless: efficiency collapses
    assert(out("tiny")._5 < 0.6 && out("big")._5 == 1.0)
    // loud contracts
    intercept[IllegalArgumentException](
      Sampling.dataConstrainedPlan(docs, "src", "text", budget = 0L))
    intercept[IllegalArgumentException](Sampling.dataConstrainedPlan(
      docs.where(col("src") === "nope"), "src", "text", budget = 10L))
  }
}
