package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // events fixture: (day, source) groups with overlapping user sets
  private lazy val events = {
    val rows = for {
      day <- 1 to 4
      src <- Seq("a", "b")
      i <- 1 to 500
    } yield (day, src, (i * day) % 700L) // overlapping users across groups
    rows.toDF("day", "src", "user")
  }

  test("per-group estimates sit inside the HLL error envelope") {
    val sk = Sketches.distinctSketches(events, Seq("day", "src"), "user")
    val est = Sketches.rollupDistinct(sk, Seq("day", "src"))
      .withColumnRenamed("distinct_est", "est")
    val exact = events.groupBy("day", "src")
      .agg(countDistinct("user").as("exact"))
    val rows = est.join(exact, Seq("day", "src"))
      .select("est", "exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, x) =>
      assert(math.abs(e - x).toDouble / x < 0.05,
        s"estimate $e vs exact $x breaks the ~1.6% (3σ ≈ 5%) envelope")
    }
  }

  test("rollup of stored sketches tracks exact distincts (no raw rescan)") {
    val fine = Sketches.distinctSketches(events, Seq("day", "src"), "user")
    // roll up to day level from SKETCHES ONLY — note the union may promote
    // exact-mode (LIST/SET) sketches to estimating HLL mode, so the merged
    // estimate is bound by the error envelope, not bit-equal to a direct
    // day-level sketch
    val byDay = Sketches.rollupDistinct(fine, Seq("day"))
      .withColumnRenamed("distinct_est", "rolled")
    val exact = events.groupBy("day")
      .agg(countDistinct("user").as("exact"))
    val rows = byDay.join(exact, "day")
      .select("rolled", "exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, x) =>
      assert(math.abs(r - x).toDouble / x < 0.05, s"rolled $r vs exact $x")
    }
    // and the global rollup (empty groupCols) stays inside the envelope
    val global = Sketches.rollupDistinct(fine, Nil).as[Long].head()
    val exactGlobal = events.select(countDistinct("user")).as[Long].head()
    assert(math.abs(global - exactGlobal).toDouble / exactGlobal < 0.05)
  }

  test("frequent-items rollup is exact under the map size and matches counts") {
    val rows = for {
      g <- Seq("a", "b"); i <- 0 until 40
    } yield (g, s"item_${i % (if (g == "a") 5 else 7)}")
    val df = rows.toDF("grp", "item")
    val fine = Sketches.frequentSketches(df, Seq("grp"), "item", maxMapSize = 64)
    // per-group top-2 from the stored sketches
    val top = Sketches.rollupFrequent(fine, Seq("grp"), k = 2, maxMapSize = 64)
      .as[(String, Int, String, Long)].collect().toSet
    // exact: 40 items over 5 (resp. 7) values -> counts 8 (resp. 6/5),
    // ties broken item-asc
    assert(top == Set(("a", 1, "item_0", 8L), ("a", 2, "item_1", 8L),
      ("b", 1, "item_0", 6L), ("b", 2, "item_1", 6L)))
    // global rollup merges the two sketches without touching raw items
    val global = Sketches.rollupFrequent(fine, Nil, k = 1, maxMapSize = 64)
    assert(global.columns.toSeq == Seq("rank", "item", "est"))
    assert(global.as[(Int, String, Long)].collect().toSeq
      == Seq((1, "item_0", 14L)))
  }

  test("quantile sketches are exact under k and match percentile_disc semantics") {
    // reference: smallest value whose cumulative fraction >= p
    def refQ(vals: Seq[Double], p: Double): Double = {
      val s = vals.sorted
      s(math.max(0, math.ceil(p * s.length).toInt - 1))
    }
    val rows = for {
      g <- Seq("a", "b"); i <- 1 to 40
    } yield (g, if (g == "a") i.toDouble else (i * 7 % 41).toDouble)
    val df = rows.toDF("grp", "v").repartition(8) // partials must merge
    val probs = Seq(0.25, 0.5, 0.9, 0.99)
    val fine = Sketches.quantileSketches(df, Seq("grp"), "v", k = 64)
    val got = Sketches.rollupQuantiles(fine, Seq("grp"), probs, k = 64)
      .as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    for (g <- Seq("a", "b"); p <- probs) {
      val vals = rows.collect { case (`g`, _) => }.length // 40 each
      assert(vals == 40)
      val expect = refQ(rows.collect { case (gg, v) if gg == g => v }, p)
      assert(got((g, p)) == expect, s"group $g p=$p: ${got((g, p))} != $expect")
    }
    // global rollup merges the stored sketches only
    val all = rows.map(_._2)
    val global = Sketches.rollupQuantiles(fine, Nil, Seq(0.5), k = 64)
      .as[(Double, Double)].collect()
    assert(global.toSeq == Seq((0.5, refQ(all, 0.5))))
    // all-null groups emit nothing
    val withNull = Seq(("c", null.asInstanceOf[java.lang.Double]))
      .toDF("grp", "v")
    val empty = Sketches.rollupQuantiles(
      Sketches.quantileSketches(withNull, Seq("grp"), "v", k = 64),
      Seq("grp"), Seq(0.5), k = 64)
    assert(empty.count() == 0)
  }

  test("an over-capacity quantile sketch stays inside the KLL rank error bound") {
    val n = 5000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("grp", "v")
      .repartition(8)
    val k = 64 // far under n: the sketch must compact
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(k, false)
    val got = Sketches.rollupQuantiles(
      Sketches.quantileSketches(df, Seq("grp"), "v", k = k),
      Seq("grp"), Seq(0.5, 0.9), k = k)
      .as[(String, Double, Double)].collect()
    got.foreach { case (_, p, q) =>
      val trueRank = q / n // values are 1..n, so rank(q) = q/n
      assert(math.abs(trueRank - p) <= 2 * eps,
        s"estimated p$p quantile $q has true rank $trueRank (eps=$eps)")
    }
  }

  test("frequentSketches shuffles partial sketches, not the raw item stream") {
    val rows = for {
      g <- Seq("a", "b"); i <- 0 until 40
    } yield (g, s"item_${i % (if (g == "a") 5 else 7)}")
    // every hash exchange in the plan must sit ABOVE the per-partition
    // partial phase: what crosses the wire is (group, sketch) rows, never
    // the raw (group, item) stream. (repartition(8) makes the input
    // multi-partition so the merge-phase shuffle is actually planned —
    // a single-partition input satisfies any clustering and elides it)
    // AQE off for the probe: executedPlan then holds real Exchange nodes
    // (sparkPlan is pre-EnsureRequirements; the adaptive wrapper hides them)
    val plan = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try Sketches.frequentSketches(
        rows.toDF("grp", "item").repartition(8), Seq("grp"), "item",
        maxMapSize = 64).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val hashExchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashExchanges.nonEmpty, "expected a hash exchange for the merge phase")
    hashExchanges.foreach { e =>
      assert(e.collectFirst {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }.nonEmpty,
        s"shuffle input must be the partial-sketch MapPartitions, got:\n$e")
    }
    // and the two-phase result stays exact across a many-partition input
    // (partials from 8 partitions merge to the same counts)
    val fine = Sketches.frequentSketches(
      rows.toDF("grp", "item").repartition(8), Seq("grp"), "item", maxMapSize = 64)
    val top = Sketches.rollupFrequent(fine, Seq("grp"), k = 2, maxMapSize = 64)
      .as[(String, Int, String, Long)].collect().toSet
    assert(top == Set(("a", 1, "item_0", 8L), ("a", 2, "item_1", 8L),
      ("b", 1, "item_0", 6L), ("b", 2, "item_1", 6L)))
  }

  test("theta sketches: exact set estimates under lgK, union/intersection") {
    // two groups with a known overlap: a = {0..39}, b = {20..59}
    val rows = (0 until 40).map(i => ("a", i.toLong)) ++
      (20 until 60).map(i => ("b", i.toLong))
    val sk = Sketches.thetaSketches(
      rows.toDF("grp", "k").repartition(8), Seq("grp"), "k", lgK = 12)
    // per-group distinct estimates are exact in the exact regime
    val per = Sketches.rollupThetaDistinct(sk, Seq("grp"), lgK = 12)
      .as[(String, Double)].collect().toMap
    assert(per == Map("a" -> 40.0, "b" -> 40.0))
    // global union from stored sketches only: |a ∪ b| = 60
    val global = Sketches.rollupThetaDistinct(sk, Nil, lgK = 12)
      .as[Double].collect().toSeq
    assert(global == Seq(60.0))
    // pairwise set estimates: |a ∩ b| = 20, |a ∪ b| = 60
    val a = sk.where(col("grp") === "a").select(col("tsketch").as("__a"))
    val b = sk.where(col("grp") === "b").select(col("tsketch").as("__b"))
    val est = Sketches.thetaSetEstimates(a.crossJoin(b), "__a", "__b", lgK = 12)
      .as[(Double, Double, Double, Double)].collect().head
    assert(est == ((40.0, 40.0, 20.0, 60.0)))
  }

  test("an over-capacity theta sketch estimates inside the error envelope") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("grp", "k")
      .repartition(8)
    val est = Sketches.rollupThetaDistinct(
      Sketches.thetaSketches(df, Seq("grp"), "k", lgK = 10), // 1024 << n
      Seq("grp"), lgK = 10).as[(String, Double)].collect().head._2
    // theta RSE ≈ 1/sqrt(2^lgK) ≈ 3.1%; assert a 3-sigma envelope
    assert(math.abs(est - n) / n < 0.10, s"estimate $est vs exact $n")
  }

  test("partial flushing (bounded live groups per partition) changes nothing") {
    // 6 groups through a single partition with a flush bound of 2: phase 1
    // must spill partials repeatedly, phase 2 must merge them exactly
    val rows = for { g <- 'a' to 'f'; i <- 0 until 30 }
      yield (g.toString, s"item_${i % 3}")
    val df = rows.toDF("grp", "item").coalesce(1)
    val top = Sketches.rollupFrequent(
      Sketches.frequentSketches(df, Seq("grp"), "item",
        maxMapSize = 64, flushEveryGroups = 2),
      Seq("grp"), k = 1, maxMapSize = 64)
      .as[(String, Int, String, Long)].collect().toSet
    assert(top == ('a' to 'f').map(g => (g.toString, 1, "item_0", 10L)).toSet)
    val vals = for { g <- 'a' to 'f'; i <- 1 to 20 } yield (g.toString, i.toDouble)
    val q = Sketches.rollupQuantiles(
      Sketches.quantileSketches(vals.toDF("grp", "v").coalesce(1),
        Seq("grp"), "v", k = 64, flushEveryGroups = 2),
      Seq("grp"), Seq(0.5), k = 64)
      .as[(String, Double, Double)].collect().toSet
    assert(q == ('a' to 'f').map(g => (g.toString, 0.5, 10.0)).toSet)
  }

  test("a purged sketch still surfaces the heavy hitter with bounded error") {
    val skewed = (Seq.fill(500)("whale") ++ (0 until 400).map(i => s"m_$i"))
    val df = skewed.zipWithIndex.map { case (v, i) => (i % 4, v) }.toDF("grp", "item")
    val out = Sketches.rollupFrequent(
      Sketches.frequentSketches(df, Seq("grp"), "item", maxMapSize = 16),
      Nil, k = 1, maxMapSize = 16)
      .as[(Int, String, Long)].collect()
    assert(out.head._2 == "whale")
    // NO_FALSE_POSITIVES estimate: true count <= est <= true + accumulated error
    assert(out.head._3 >= 500L && out.head._3 <= 900L)
  }

  test("count-min: never undercounts, exact when wide, additive rollup, weighted, zero absents") {
    // zipfian-ish keys per group
    val rows = for {
      g <- Seq("x", "y")
      (k, n) <- Seq(("alpha", 40), ("beta", 20), ("gamma", 10), ("delta", 5))
      i <- 1 to (if (g == "x") n else n * 2)
    } yield (g, k, i)
    val df = rows.toDF("grp", "key", "i")
    val exact = rows.groupBy(r => (r._1, r._2)).map { case (k, v) =>
      k -> v.size.toLong }
    val probes = Seq("alpha", "beta", "gamma", "delta", "absent").toDF("key")
    // narrow sketch: estimates must NEVER undercount
    val narrow = Sketches.cmsSketches(df, Seq("grp"), "key",
      depth = 3, width = 16)
    val estN = Sketches.cmsPointEstimates(narrow, probes, "key",
      depth = 3, width = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    exact.foreach { case (k, n) =>
      assert(estN(k) >= n, s"undercount at $k: ${estN(k)} < $n")
    }
    // wide sketch with 5 keys: collision-free -> exact, absents 0
    val wide = Sketches.cmsSketches(df, Seq("grp"), "key",
      depth = 4, width = 2048)
    val estW = Sketches.cmsPointEstimates(wide, probes, "key",
      depth = 4, width = 2048)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    exact.foreach { case (k, n) => assert(estW(k) == n, s"$k: ${estW(k)} != $n") }
    assert(estW(("x", "absent")) == 0L && estW(("y", "absent")) == 0L)
    // additive rollup == building global directly (the fold law)
    val global = Sketches.cmsSketches(
      df.withColumn("all", lit(1)), Seq("all"), "key",
      depth = 4, width = 2048)
      .select("__d", "__b", "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rolled = Sketches.rollupCms(wide, Nil)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rolled == global, "rollup must equal the directly-built global cells")
    // weighted build counts weights, not rows
    val wdf = Seq(("x", "alpha", 7L), ("x", "alpha", 3L), ("x", "beta", 5L))
      .toDF("grp", "key", "w")
    val west = Sketches.cmsPointEstimates(
      Sketches.cmsSketches(wdf, Seq("grp"), "key", depth = 4, width = 2048,
        weightCol = Some("w")),
      Seq("alpha", "beta").toDF("key"), "key", depth = 4, width = 2048)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(west == Map("alpha" -> 10L, "beta" -> 5L), s"got $west")
    // loud params
    intercept[IllegalArgumentException](
      Sketches.cmsSketches(df, Nil, "key"))
    intercept[IllegalArgumentException](
      Sketches.cmsSketches(df, Seq("grp"), "key", depth = 0))
    intercept[IllegalArgumentException](
      Sketches.cmsSketches(df, Seq("grp"), "key", width = 8))
  }

  test("cmsJoinSize: never under, exact when wide, zero on disjoint keys") {
    def cellsOf(rows: Seq[(String, Int)], w: Int = 2048) =
      Sketches.rollupCms(Sketches.cmsSketches(
        rows.toDF("key", "i").withColumn("all", lit(1)),
        Seq("all"), "key", depth = 4, width = w), Nil)
    val left = Seq.fill(30)("x") ++ Seq.fill(10)("y") ++ Seq.fill(5)("z")
    val right = Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq.fill(20)("w")
    val exact = 30L * 7 + 10L * 3 // x and y join; z/w don't
    def est(w: Int) = Sketches.cmsJoinSize(
      cellsOf(left.map((_, 1)), w), cellsOf(right.map((_, 1)), w))
      .collect().head.getLong(0)
    assert(est(2048) == exact, s"wide sketch must be exact, got ${est(2048)}")
    assert(est(16) >= exact, "narrow sketch must never underestimate")
    // disjoint key sets -> 0 (the refilled-depth-row case)
    val z = Sketches.cmsJoinSize(
      cellsOf(Seq(("a", 1), ("b", 1))), cellsOf(Seq(("c", 1), ("d", 1))))
      .collect().head.getLong(0)
    assert(z == 0L, s"disjoint keys must estimate 0, got $z")
    intercept[IllegalArgumentException](
      Sketches.cmsJoinSize(cellsOf(Seq(("a", 1))), cellsOf(Seq(("a", 1))),
        depth = 0))
  }
}
