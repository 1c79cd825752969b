package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val name = Linkage.FieldWeight("name", 0.95, 0.001)
  private val phone = Linkage.FieldWeight("phone", 0.9, 0.01)

  test("scorePairs: hand-computed Fellegi-Sunter weights; blocking scopes candidates; null semantics") {
    val rows = Seq(
      // block "A": a planted twin pair (name agrees, phone differs), one stranger
      (1L, "A", "alice", "555-01"),
      (2L, "A", "alice", "555-99"),
      (3L, "A", "bob", "555-02"),
      // block "B": same name as alice but a DIFFERENT block — never compared
      (4L, "B", "alice", "555-01"),
      // null block key: never pairs with anyone
      (5L, null.asInstanceOf[String], "alice", "555-01"),
      // block "C": both fields NULL on both sides — null-safe equality
      // counts them as agreement (identical missingness IS signal here)
      (6L, "C", null.asInstanceOf[String], null.asInstanceOf[String]),
      (7L, "C", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "block", "name", "phone")
    val out = Linkage.scorePairs(rows, "id", Seq("block"),
      Seq(name, phone), threshold = -100.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("n_agree"), r.getAs[Long]("score_micros"))).toMap
    // twin: name agrees + phone disagrees
    assert(out((1L, 2L)) ==
      (1L, name.agreeMicros + phone.disagreeMicros))
    // strangers in one block: both disagree
    assert(out((1L, 3L)) ==
      (0L, name.disagreeMicros + phone.disagreeMicros))
    // cross-block / null-block rows never pair
    assert(!out.keySet.exists { case (a, b) =>
      a == 4L || b == 4L || a == 5L || b == 5L })
    // identical missingness agrees null-safely on both fields
    assert(out((6L, 7L)) == (2L, name.agreeMicros + phone.agreeMicros))
    assert(out.size == 4, s"blocks bound the candidates: ${out.keySet}")
    // threshold keeps only match-favoring pairs
    val kept = Linkage.scorePairs(rows, "id", Seq("block"),
      Seq(name, phone), threshold = 5.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (6L, 7L)), s"kept: $kept")
  }

  test("Index: incremental ingest equals one-shot linkage; replays are no-ops; config pinned") {
    val root = java.nio.file.Files.createTempDirectory("graft_linkidx_").toString
    val idx = s"$root/idx"
    def rows(s: Seq[(Long, String, String, String)]) =
      s.toDF("id", "block", "name", "phone")
    val base = rows(Seq((1L, "A", "alice", "p1"), (2L, "A", "bob", "p2"),
      (3L, "B", "carol", "p3")))
    Linkage.Index.create(base, idx, "id", Seq("block"),
      Seq(name, phone), threshold = 5.0)
    // batch 1: a dirty twin of alice (pairs across batch/index), a stranger
    val b1 = rows(Seq((10L, "A", "alice", "p9"), (11L, "B", "dave", "p4")))
    val p1 = Linkage.Index.ingestBatch(spark, idx, b1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 10L)), s"cross-batch twin expected: $p1")
    // batch 2: twin of batch-1's dave (cross vs an EARLIER batch) plus a
    // within-batch twin pair
    val b2 = rows(Seq((20L, "B", "dave", "p5"), (21L, "A", "eve", "p6"),
      (22L, "A", "eve", "p7")))
    val p2 = Linkage.Index.ingestBatch(spark, idx, b2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((11L, 20L), (21L, 22L)), s"got $p2")
    def entityMap() = Linkage.Index.entities(spark, idx)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("entity_id")).toMap
    val expected = Map(1L -> 1L, 10L -> 1L, 2L -> 2L, 3L -> 3L,
      11L -> 11L, 20L -> 11L, 21L -> 21L, 22L -> 21L)
    assert(entityMap() == expected, s"got ${entityMap()}")
    // one-shot over the union agrees (the incremental decomposition is
    // exact: within-batch + batch-vs-standing covers every pair once)
    val all = base.unionByName(b1).unionByName(b2)
    val oneShot = Linkage.scorePairs(all, "id", Seq("block"),
      Seq(name, phone), threshold = 5.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oneShot == p1 ++ p2, s"one-shot $oneShot vs incremental ${p1 ++ p2}")
    // at-least-once replay: re-ingesting batch 2 re-derives the same
    // pairs (identical ids never self-pair) and the entity map is unchanged
    val replayed = Linkage.Index.ingestBatch(spark, idx, b2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(replayed == p2, s"replay must re-derive the same pairs: $replayed")
    assert(entityMap() == expected, "replay must not change entities")
    // missing sidecar is loud
    intercept[IllegalStateException](
      Linkage.Index.ingestBatch(spark, s"$root/nope", b1))
    intercept[IllegalStateException](
      Linkage.Index.entities(spark, s"$root/nope"))
    // schema drift against the standing records is loud BEFORE any
    // append (a mismatched parquet footer would silently corrupt later
    // cross-pair scoring): missing, extra, and retyped columns all refuse
    val preRecords = spark.read.parquet(s"$idx/records").count()
    val dropped = intercept[IllegalArgumentException](
      Linkage.Index.ingestBatch(spark, idx, b1.drop("phone")))
    assert(dropped.getMessage.contains("missing [phone]"), dropped.getMessage)
    val widened = intercept[IllegalArgumentException](
      Linkage.Index.ingestBatch(spark, idx, b1.withColumn("note", lit("x"))))
    assert(widened.getMessage.contains("extra [note]"), widened.getMessage)
    val retyped = intercept[IllegalArgumentException](
      Linkage.Index.ingestBatch(spark, idx,
        b1.withColumn("id", col("id").cast("int"))))
    assert(retyped.getMessage.contains("retyped [id"), retyped.getMessage)
    assert(spark.read.parquet(s"$idx/records").count() == preRecords,
      "a refused batch must append nothing")
    // column ORDER is normalized, not rejected — a reordered replay is
    // still the no-op it should be
    val reordered = Linkage.Index.ingestBatch(spark, idx,
      b2.select("phone", "name", "block", "id"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(reordered == p2, s"reordered replay: $reordered")
    assert(entityMap() == expected, "reordered replay must not change entities")
  }

  test("agreementPatterns: bit-packed null-safe histogram, blocking scoped, loud contracts") {
    val rows = Seq(
      // block A: (1,2) agree on name only -> pattern 1; (1,3)/(2,3)
      // disagree on both -> pattern 0
      (1L, "A", "alice", "555-01"),
      (2L, "A", "alice", "555-99"),
      (3L, "A", "bob", "555-02"),
      // block B: identical missingness agrees null-safely on both
      // fields -> pattern 3
      (4L, "B", null.asInstanceOf[String], null.asInstanceOf[String]),
      (5L, "B", null.asInstanceOf[String], null.asInstanceOf[String]),
      // null block key: never pairs
      (6L, null.asInstanceOf[String], "alice", "555-01"))
      .toDF("id", "block", "name", "phone")
    val hist = Linkage.agreementPatterns(rows, "id", Seq("block"),
      Seq("name", "phone"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(0L -> 2L, 1L -> 1L, 3L -> 1L), hist.toString)
    // field order defines the bit: phone-first flips pattern 1 -> 2
    val flipped = Linkage.agreementPatterns(rows, "id", Seq("block"),
      Seq("phone", "name"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped == Map(0L -> 2L, 2L -> 1L, 3L -> 1L), flipped.toString)
    intercept[IllegalArgumentException] {
      Linkage.agreementPatterns(rows, "id", Nil, Seq("name"))
    }
    intercept[IllegalArgumentException] {
      Linkage.agreementPatterns(rows, "id", Seq("block"), Nil)
    }
    // planted HOT BLOCK: one block holding > maxBlockRows rows is
    // refused eagerly (B²/2 pairs from a single degenerate key), with
    // the salting remedy in the message
    val hotE = intercept[IllegalArgumentException] {
      Linkage.agreementPatterns(rows, "id", Seq("block"),
        Seq("name", "phone"), maxBlockRows = 2L)
    }
    assert(hotE.getMessage.contains("salt"), hotE.getMessage)
    // NULL block keys never pair, so a fat NULL block is exempt —
    // the guard must not refuse rows that cannot participate
    val nullFat = rows.unionByName(Seq(
      (7L, null.asInstanceOf[String], "x", "y"),
      (8L, null.asInstanceOf[String], "x", "y"),
      (9L, null.asInstanceOf[String], "x", "y"))
      .toDF("id", "block", "name", "phone"))
    val nf = Linkage.agreementPatterns(nullFat, "id", Seq("block"),
      Seq("name", "phone"), maxBlockRows = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf == Map(0L -> 2L, 1L -> 1L, 3L -> 1L), nf.toString)
  }

  test("fitEM recovers planted m/u, beats hand weights, is deterministic, loud on degenerate inputs") {
    // planted two-record entities: name agrees between twins w.p. 0.9
    // (pool of 400 per corpus -> cross-entity u ~ 1/400), phone w.p.
    // 0.6 (pool 2000 -> u ~ 1/2000), city w.p. 0.75 (pool 300);
    // blocks of ~120 records give a realistic match prior (~0.8% of
    // candidate pairs are twins). THREE fields because the 2-class
    // latent-class model is only identified at k >= 3 (the fitEM
    // require) — with 2 fields EM provably lands on a ridge.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 1500).flatMap { i =>
      val block = i % 25
      val name = s"n${rnd.nextInt(400)}"
      val phone = s"p${rnd.nextInt(2000)}"
      val city = s"c${rnd.nextInt(300)}"
      val nameB = if (rnd.nextDouble() < 0.9) name else s"$name!"
      val phoneB = if (rnd.nextDouble() < 0.6) phone else s"$phone!"
      val cityB = if (rnd.nextDouble() < 0.75) city else s"$city!"
      Seq((2L * i, block, name, phone, city),
        (2L * i + 1, block, nameB, phoneB, cityB))
    }
    val df = rows.toDF("id", "block", "name", "phone", "city")
    // empirical planted rates (what EM should recover)
    val twins = rows.grouped(2).toSeq.map { case Seq(a, b) => (a, b) }
    val mName = twins.count(t => t._1._3 == t._2._3).toDouble / twins.size
    val mPhone = twins.count(t => t._1._4 == t._2._4).toDouble / twins.size
    val mCity = twins.count(t => t._1._5 == t._2._5).toDouble / twins.size
    val fit = Linkage.fitEM(df, "id", Seq("block"),
      Seq("name", "phone", "city"), iters = 100)
    val byField = fit.fields.map(f => f.column -> f).toMap
    assert(math.abs(byField("name").m - mName) < 0.05,
      s"m_name: fitted ${byField("name").m}, planted $mName")
    assert(math.abs(byField("phone").m - mPhone) < 0.05,
      s"m_phone: fitted ${byField("phone").m}, planted $mPhone")
    assert(math.abs(byField("city").m - mCity) < 0.05,
      s"m_city: fitted ${byField("city").m}, planted $mCity")
    assert(byField("name").u < 0.01 && byField("phone").u < 0.01 &&
      byField("city").u < 0.015,
      s"u must land near the pool collision rates: ${fit.fields}")
    val truePairs = twins.map(t => (t._1._1, t._2._1)).toSet
    // the match prior lands within 2x of the planted twin fraction
    val candPairs = (0 until 25).map { b =>
      val k = rows.count(_._2 == b); k.toLong * (k - 1) / 2 }.sum
    val planted = truePairs.size.toDouble / candPairs
    assert(fit.pMatch > planted / 2 && fit.pMatch < planted * 2,
      s"pMatch ${fit.pMatch} vs planted fraction $planted")
    // fitted weights at the Fellegi-Sunter posterior-0.5 cutoff
    // (log2((1-p)/p)) classify at least as well as the generic hand
    // weights at the q_record_linkage convention (threshold 5.0)
    def f1(pairs: Set[(Long, Long)]): Double = {
      val tp = pairs.intersect(truePairs).size.toDouble
      if (tp == 0) 0.0
      else {
        val prec = tp / pairs.size
        val rec = tp / truePairs.size
        2 * prec * rec / (prec + rec)
      }
    }
    def score(fields: Seq[Linkage.FieldWeight], thr: Double) =
      Linkage.scorePairs(df, "id", Seq("block"), fields, thr)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cutoff = math.log((1 - fit.pMatch) / fit.pMatch) / math.log(2.0)
    val fittedF1 = f1(score(fit.fields, cutoff))
    val handF1 = f1(score(Seq(
      Linkage.FieldWeight("name", 0.95, 0.001),
      Linkage.FieldWeight("phone", 0.9, 0.01),
      Linkage.FieldWeight("city", 0.8, 0.01)), 5.0))
    assert(fittedF1 >= handF1,
      s"fitted F1 $fittedF1 must not lose to hand F1 $handF1")
    assert(fittedF1 > 0.7, s"fitted F1 $fittedF1 is implausibly low")
    // deterministic: same data, same fit, bit for bit
    val fit2 = Linkage.fitEM(df, "id", Seq("block"),
      Seq("name", "phone", "city"), iters = 100)
    assert(fit2 == fit, "fitEM must be deterministic")
    // loud: no candidates under the blocking; under-identified k < 3
    intercept[IllegalArgumentException](
      Linkage.fitEM(df.limit(0), "id", Seq("block"),
        Seq("name", "phone", "city")))
    intercept[IllegalArgumentException](
      Linkage.fitEM(df, "id", Nil, Seq("name", "phone", "city")))
    intercept[IllegalArgumentException](
      Linkage.fitEM(df, "id", Seq("block"), Seq("name", "phone")))
    // a constant field agrees on EVERY pair: m = u -> uninformative
    intercept[IllegalArgumentException](
      Linkage.fitEM(df.withColumn("k", lit("x")), "id", Seq("block"),
        Seq("name", "phone", "k")))
  }

  test("editDistancePairs: exact vs brute force at k=1 and k=2; minLength guards; loud caps") {
    val words = Seq(
      "alice", "alise", "alyse",      // chain: 1-apart links, ends 2 apart
      "bob", "bobb", "blob",          // insert + substitute around bob
      "carol", "karol",               // substitution twin
      "dave",                         // isolated
      "hello", "hxllo", "hell",       // sub + delete
      "xy", "xz",                     // minimum-length pair
      "mississippi", "mississippe")   // long-string twin
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "w")
    def brute(k: Int, minLen: Int) = (for {
      (ia, wa) <- words; (ib, wb) <- words
      if ia < ib && wa.length >= minLen && wb.length >= minLen
      d = {
        // textbook DP Levenshtein as the independent oracle
        val m = Array.tabulate(wa.length + 1, wb.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to wa.length; j <- 1 to wb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (wa(i - 1) == wb(j - 1)) 0 else 1))
        m(wa.length)(wb.length)
      }
      if d <= k
    } yield (ia, ib, d)).toSet
    def fast(k: Int, minLen: Int) =
      Linkage.editDistancePairs(df, "id", "w", k, minLen)
        .as[(Long, Long, Int)].collect()
        .map { case (a, b, d) => (a, b, d) }.toSet
    assert(fast(1, 2) == brute(1, 2), s"k=1: ${fast(1, 2)} vs ${brute(1, 2)}")
    assert(fast(2, 2) == brute(2, 2), s"k=2: ${fast(2, 2)} vs ${brute(2, 2)}")
    assert(brute(2, 2).size > brute(1, 2).size,
      "fixture must exercise distance-2 pairs")
    // minLength excludes short strings entirely (their neighborhoods
    // collapse into the \"\" hot bucket) — both sides of the compare
    assert(fast(2, 3) == brute(2, 3))
    assert(!fast(2, 3).exists { case (a, b, _) => a == 12L || b == 12L },
      "xy/xz must be gone at minLength=3")
    // nulls never pair
    val withNull = df.unionByName(Seq((99L, null.asInstanceOf[String]))
      .toDF("id", "w"))
    assert(Linkage.editDistancePairs(withNull, "id", "w", 1, 2)
      .where($"id_a" === 99L || $"id_b" === 99L).isEmpty)
    // long strings: the k=2 neighborhood is O(|s|²/2) wide, not
    // exponential — a 40-char twin pair still resolves exactly
    val longTwins = Seq(
      (0L, "abcdefghijklmnopqrstuvwxyz0123456789abcd"),
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789abdc"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789zzzz")).toDF("id", "w")
    assert(Linkage.editDistancePairs(longTwins, "id", "w", 2)
      .as[(Long, Long, Int)].collect().toSet == Set((0L, 1L, 2)),
      "only the transposed tail (2 substitutions) is within k=2")
    // caps are loud
    intercept[IllegalArgumentException](
      Linkage.editDistancePairs(df, "id", "w", maxDist = 3))
    intercept[IllegalArgumentException](
      Linkage.editDistancePairs(df, "id", "w", maxDist = 0))
    intercept[IllegalArgumentException](
      Linkage.editDistancePairs(df, "id", "w", minLength = 0))
  }

  test("scorePairs: loud on uninformative fields and unblocked calls") {
    intercept[IllegalArgumentException](Linkage.FieldWeight("x", 0.5, 0.5))
    intercept[IllegalArgumentException](Linkage.FieldWeight("x", 1.0, 0.5))
    intercept[IllegalArgumentException](
      Linkage.scorePairs(Seq((1L, "a")).toDF("id", "v"), "id",
        Nil, Seq(name)))
    intercept[IllegalArgumentException](
      Linkage.scorePairs(Seq((1L, "a")).toDF("id", "v"), "id",
        Seq("v"), Nil))
  }
}
