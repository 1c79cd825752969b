package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TimeseriesSpec extends SparkTestBase {
  import spark.implicits._

  private def grid(rows: Seq[(Option[String], Long, Double)], step: Long) =
    Timeseries.resample(
      rows.toDF("k", "ts_us", "v"), "ts_us", "v", Seq("k"), step)

  test("resample snaps, sums micro-exactly, and materializes gap buckets") {
    val out = grid(Seq(
      (Some("a"), 0L, 1.25), (Some("a"), 10L, 2.0), (Some("a"), 350L, 0.5),
      (Some("b"), 50L, 4.0)), step = 100)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("bucket_us")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("value_micros")))).toMap
    // key a spans buckets 0..3: 1 and 2 are explicit zero-filled gaps
    assert(out((("a", 0L))) == ((2L, 3250000L)))
    assert(out((("a", 100L))) == ((0L, 0L)))
    assert(out((("a", 200L))) == ((0L, 0L)))
    assert(out((("a", 300L))) == ((1L, 500000L)))
    assert(out((("b", 0L))) == ((1L, 4000000L)))
    assert(out.size == 5)
  }

  test("NULL key is its own series; NULL ts rows drop") {
    val out = Timeseries.resample(
      Seq((Option.empty[String], Some(120L), 1.0),
        (Option.empty[String], Some(130L), 2.0),
        (Some("a"), None, 9.0),
        (Some("a"), Some(0L), 1.0)).toDF("k", "ts_us", "v"),
      "ts_us", "v", Seq("k"), 100)
      .collect()
      .map(r => (Option(r.getAs[String]("k")), r.getAs[Long]("bucket_us")) ->
        r.getAs[Long]("value_micros")).toMap
    assert(out((None, 100L)) == 3000000L, "null key keeps its observations")
    assert(out((Some("a"), 0L)) == 1000000L, "null-ts row contributes nothing")
    assert(out.size == 2)
  }

  test("locf carries the last observation; leading gaps stay NULL") {
    val g = grid(Seq(
      (Some("a"), 0L, 1.0), (Some("a"), 350L, 2.0)), step = 100)
      .withColumn("obs", when(col("n_events") > 0, col("value_micros")))
    val filled = Timeseries.locf(g, "obs", "bucket_us", Seq("k"), "locf")
      .orderBy("bucket_us")
      .select("bucket_us", "locf").as[(Long, Long)].collect().toSeq
    assert(filled == Seq(
      (0L, 1000000L), (100L, 1000000L), (200L, 1000000L), (300L, 2000000L)))
    // leading NULL: no prior observation to carry
    val lead = Timeseries.locf(
      Seq((1L, Option.empty[Long]), (2L, Some(7L))).toDF("o", "v"),
      "v", "o", Nil, "f")
      .orderBy("o").select("f").collect()
    assert(lead(0).isNullAt(0) && lead(1).getLong(0) == 7L)
  }

  test("loud paths: negative ts, spine blowup, bad step, NULL order key") {
    intercept[IllegalArgumentException](
      grid(Seq((Some("a"), 0L, 1.0)), step = 0))
    val neg = intercept[Exception](
      grid(Seq((Some("a"), -5L, 1.0)), step = 100).collect())
    assert(neg.getMessage.contains("negative timestamp"))
    val blow = intercept[Exception](
      Timeseries.resample(
        Seq(("a", 0L, 1.0), ("a", 1000000L, 1.0)).toDF("k", "ts_us", "v"),
        "ts_us", "v", Seq("k"), stepUs = 1, maxBucketsPerKey = 10).collect())
    assert(blow.getMessage.contains("buckets"))
    val nullOrder = intercept[Exception](
      Timeseries.locf(
        Seq((Option.empty[Long], Some(1L))).toDF("o", "v"),
        "v", "o", Nil, "f").collect())
    assert(nullOrder.getMessage.contains("null ordering is not engine-portable")
      || nullOrder.getMessage.contains("NULL in order column"))
  }

  test("cusumChangepoints equals the direct max(0,·) recursion; alarms fire on a planted shift; loud contracts") {
    // planted upward shift: mean 10 for 20 points, then mean 14
    val xs = (Seq.fill(10)(Seq(9L, 11L)).flatten ++
      Seq.fill(10)(Seq(13L, 15L)).flatten).zipWithIndex
      .map { case (v, i) => ("m", i.toLong, v) }
    val df = xs.toDF("k", "t", "v")
    val out = Timeseries.cusumChangepoints(df, Seq("k"), "t", "v",
      target = 10L, slack = 1L, threshold = 20L)
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("cusum_pos"), r.getAs[Long]("cusum_neg"),
          r.getAs[Boolean]("alarm")))).toMap
    // direct recursion reference
    var sp = 0L
    var sn = 0L
    xs.foreach { case (_, t, v) =>
      sp = math.max(0L, sp + (v - 10L - 1L))
      sn = math.max(0L, sn + (10L - v - 1L))
      assert(out(t) == ((sp, sn, sp > 20L || sn > 20L)),
        s"t=$t got ${out(t)} want ($sp, $sn)")
    }
    // the shifted tail must alarm; the in-control head must not
    assert(!out(5L)._3 && out(39L)._3)
    // keys are independent series
    val two = Timeseries.cusumChangepoints(
      Seq(("a", 0L, 100L), ("b", 0L, 0L)).toDF("k", "t", "v"),
      Seq("k"), "t", "v", target = 10L, slack = 0L, threshold = 5L)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("cusum_pos"), r.getAs[Long]("cusum_neg")))).toMap
    assert(two("a") == ((90L, 0L)) && two("b") == ((0L, 10L)))
    // loud: double value column, NULL rows, bad params
    intercept[IllegalArgumentException](Timeseries.cusumChangepoints(
      Seq(("a", 0L, 1.5)).toDF("k", "t", "v"),
      Seq("k"), "t", "v", 0L, 0L, 1L))
    intercept[IllegalArgumentException](Timeseries.cusumChangepoints(
      Seq(("a", Some(0L), Option.empty[Long])).toDF("k", "t", "v"),
      Seq("k"), "t", "v", 0L, 0L, 1L))
    intercept[IllegalArgumentException](Timeseries.cusumChangepoints(
      df, Nil, "t", "v", 0L, 0L, 1L))
    intercept[IllegalArgumentException](Timeseries.cusumChangepoints(
      df, Seq("k"), "t", "v", 0L, -1L, 1L))
    intercept[IllegalArgumentException](Timeseries.cusumChangepoints(
      df, Seq("k"), "t", "v", 0L, 0L, 0L))
  }

  test("theilSenTrend: hand-computed slopes/tau, outlier robustness, loud quadratic guard") {
    def run(pts: Seq[(String, Long, Long)], maxPoints: Long = 1000L) =
      Timeseries.theilSenTrend(pts.toDF("k", "t", "v"), Seq("k"), "t", "v",
        maxPoints)
        .collect().map(r => r.getAs[String]("k") ->
          ((r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
            r.getAs[Long]("s_statistic"), r.getAs[Double]("tau"),
            r.getAs[Double]("slope")))).toMap
    // perfect line v = 3t: every pairwise slope 3, S = n(n-1)/2, tau 1
    val line = (0L to 4L).map(t => ("a", t, 3 * t))
    assert(run(line)("a") == ((5L, 10L, 10L, 1.0, 3.0)))
    // one wild outlier cannot move the median slope off ~3:
    // points t=0..4, v=3t except v(4)=1000 — 4 contaminated pairs of
    // 10; median slope stays 3
    val outlier = (0L to 3L).map(t => ("b", t, 3 * t)) :+ (("b", 4L, 1000L))
    val ob = run(outlier)("b")
    assert(ob._5 == 3.0, ob.toString)
    assert(ob._3 == 10L && ob._4 == 1.0) // still monotone: MK is rank-only
    // hand case, even pair count: points (0,0),(1,2),(2,2),(3,3):
    // slopes 2,1,1,0,0.5,1 sorted 0,0.5,1,1,1,2 -> median 1;
    // S = 5 (one tie), tau = 5/6
    val h = run(Seq(("c", 0L, 0L), ("c", 1L, 2L), ("c", 2L, 2L),
      ("c", 3L, 3L)))("c")
    assert(h == ((4L, 6L, 5L, 0.833333, 1.0)), h.toString)
    // keys independent; descending series: negative slope, tau -1
    val down = (0L to 3L).map(t => ("d", t, -2 * t))
    assert(run(down)("d") == ((4L, 6L, -6L, -1.0, -2.0)))
    // loud contracts: quadratic guard, dup timestamps, doubles, nulls
    val big = (1L to 11L).map(t => ("e", t, t))
    assert(intercept[IllegalArgumentException] {
      Timeseries.theilSenTrend(big.toDF("k", "t", "v"), Seq("k"), "t", "v",
        maxPoints = 10L)
    }.getMessage.contains("quadratic"))
    assert(intercept[IllegalArgumentException] {
      Timeseries.theilSenTrend(
        Seq(("f", 1L, 1L), ("f", 1L, 2L)).toDF("k", "t", "v"),
        Seq("k"), "t", "v")
    }.getMessage.contains("duplicate timestamps"))
    intercept[IllegalArgumentException](Timeseries.theilSenTrend(
      Seq(("g", 1L, 1.5)).toDF("k", "t", "v"), Seq("k"), "t", "v"))
    intercept[IllegalArgumentException](Timeseries.theilSenTrend(
      Seq(("g", Some(1L), Option.empty[Long])).toDF("k", "t", "v"),
      Seq("k"), "t", "v"))
    intercept[IllegalArgumentException](Timeseries.theilSenTrend(
      Seq(("g", 1L, 1L)).toDF("k", "t", "v"), Nil, "t", "v"))
    // NULL-keyed rows never reach the pair-join, so an oversized or
    // dup-stamped NULL-key group must not trip the guards either
    val nullKeyed = (1L to 20L).map(t =>
      (null.asInstanceOf[String], t, t)) ++
      Seq((null.asInstanceOf[String], 1L, 99L)) ++ // dup ts, NULL key
      (0L to 4L).map(t => ("h", t, 3 * t))
    val nk = run(nullKeyed, maxPoints = 10L)
    assert(nk == Map("h" -> ((5L, 10L, 10L, 1.0, 3.0))), nk.toString)
  }
}
