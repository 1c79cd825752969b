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
}
