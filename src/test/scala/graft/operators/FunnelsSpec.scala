package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunnelsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1 completes the whole funnel in order
    (1L, ts("2026-01-01 10:00:00"), "view"),
    (1L, ts("2026-01-01 10:05:00"), "click"),
    (1L, ts("2026-01-01 10:10:00"), "purchase"),
    // user 2 clicks BEFORE viewing — click only counts at/after the view
    (2L, ts("2026-01-01 09:00:00"), "click"),
    (2L, ts("2026-01-01 09:30:00"), "view"),
    (2L, ts("2026-01-01 09:45:00"), "purchase"),
    // user 3 views only
    (3L, ts("2026-01-01 08:00:00"), "view"),
    // user 4 never views — not in the funnel at all
    (4L, ts("2026-01-01 07:00:00"), "purchase"),
    // user 5: simultaneous view+click (inclusive >= reaches both)
    (5L, ts("2026-01-01 06:00:00"), "view"),
    (5L, ts("2026-01-01 06:00:00"), "click")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq(
    "view" -> (col("event_type") === "view"),
    "click" -> (col("event_type") === "click"),
    "purchase" -> (col("event_type") === "purchase"))

  test("funnelUsers: order-sensitive reach, inclusive ties, monotone nulls") {
    val out = Funnels.funnelUsers(events, "user_id", "ts", steps)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L), "only view-ers enter")
    assert(out(1L).getAs[Long]("steps_completed") == 3L)
    // user 2's pre-view click does not count; no click after the view
    assert(out(2L).getAs[Long]("steps_completed") == 1L)
    assert(out(2L).getAs[Timestamp]("click_ts") == null)
    assert(out(2L).getAs[Timestamp]("purchase_ts") == null,
      "monotone: purchase can't be reached without click")
    assert(out(3L).getAs[Long]("steps_completed") == 1L)
    assert(out(5L).getAs[Long]("steps_completed") == 2L,
      "simultaneous events reach inclusively")
    // reach times are the earliest valid ones
    assert(out(1L).getAs[Timestamp]("purchase_ts") == ts("2026-01-01 10:10:00"))
  }

  test("withinSeconds anchors the conversion window at funnel entry") {
    // user 1: click +300s, purchase +600s after entry. The boundary is
    // inclusive: a 600s window keeps the purchase, a 599s window cuts it
    val out = Funnels.funnelUsers(events, "user_id", "ts", steps,
      withinSeconds = Some(600L))
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("steps_completed")).toMap
    assert(out(1L) == 3L, "purchase at exactly +600s is INSIDE (<=)")
    val tight = Funnels.funnelUsers(events, "user_id", "ts", steps,
      withinSeconds = Some(599L))
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("steps_completed")).toMap
    assert(tight(1L) == 2L, "at a 599s window the +600s purchase is OUT")
    // a tiny window still keeps simultaneous-entry reaches (user 5)
    assert(tight(5L) == 2L)
    intercept[IllegalArgumentException](
      Funnels.funnelUsers(events, "user_id", "ts", steps, Some(0L)))
  }

  test("funnelCounts summarizes steps; validation is loud") {
    val out = Funnels.funnelCounts(events, "user_id", "ts", steps)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
    intercept[IllegalArgumentException](
      Funnels.funnelUsers(events, "user_id", "ts", steps.take(1)))
    intercept[IllegalArgumentException](
      Funnels.funnelUsers(events, "user_id", "ts",
        Seq("a" -> lit(true), "a" -> lit(false))))
  }

  test("cohortRetention: epoch-anchored periods, fractions of cohort size") {
    val ev = Seq(
      // two users first active in week A; one returns next week
      (1L, ts("2026-01-05 10:00:00")), (2L, ts("2026-01-06 10:00:00")),
      (1L, ts("2026-01-12 10:00:00")),
      // one user first active the following week
      (3L, ts("2026-01-13 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Funnels.cohortRetention(ev, "user_id", "ts", periodDays = 7)
      .orderBy("cohort_period", "offset")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byCohort = out.groupBy(_._1)
    assert(byCohort.size == 2)
    val cohA = out.head._1
    val a = byCohort(cohA).map(t => (t._2, t._3, t._4))
    assert(a == Seq((0L, 2L, 1.0), (1L, 1L, 0.5)),
      s"cohort A: both at offset 0, one retained at offset 1; got $a")
    val cohB = byCohort.keys.max
    assert(byCohort(cohB).map(t => (t._2, t._3, t._4)) == Seq((0L, 1L, 1.0)))
  }

  test("associationRules: hand-worked support/confidence/lift") {
    // sessions: s1{A,B}, s2{A,B}, s3{A,C}, s4{B} -> N = 4
    // n_A = 3, n_B = 3, n_C = 1, n_AB = 2, n_AC = 1
    val ev = Seq((1L, "A"), (1L, "B"), (1L, "A"), // dup A collapses
      (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("s", "i")
    val out = Funnels.associationRules(ev, "s", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // A -> B: support 2/4, confidence 2/3, lift (2*4)/(3*3)
    assert(out(("A", "B")) ==
      ((2L, 500000L, 666666L, math.rint(8.0 / 9 * 1e6) / 1e6)))
    // B -> A: same support/lift, confidence 2/3 too (n_B = 3)
    assert(out(("B", "A"))._2 == 500000L && out(("B", "A"))._3 == 666666L)
    // A -> C: support 1/4, confidence 1/3; C -> A confidence 1/1
    assert(out(("A", "C"))._3 == 333333L)
    assert(out(("C", "A"))._3 == 1000000L)
    assert(!out.contains(("B", "C")), "never co-occur")
    // min support prunes the tail pair
    val pruned = Funnels.associationRules(ev, "s", "i",
      minSupportMicros = 400000L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("A", "B"), ("B", "A")))
    intercept[IllegalArgumentException](
      Funnels.associationRules(ev, "s", "i", minSupportMicros = -1L))
  }

  test("pathNgrams counts consecutive per-user sub-sequences exactly") {
    val ev = Seq(
      (1L, 1L, 1L, Some("A")), (1L, 2L, 2L, Some("B")),
      (1L, 3L, 3L, Some("C")), (1L, 4L, 4L, Some("D")),
      (2L, 1L, 5L, Some("A")), (2L, 2L, 6L, Some("B")))
      .toDF("u", "ts", "eid", "t")
    def counts(n: Int) = Funnels.pathNgrams(ev, "u", "ts", "eid", "t", n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(2) == Map("A > B" -> 2, "B > C" -> 1, "C > D" -> 1))
    assert(counts(3) == Map("A > B > C" -> 1, "B > C > D" -> 1))
    // equal timestamps: orderCol breaks the tie deterministically
    val tied = Seq((1L, 5L, 1L, Some("X")), (1L, 5L, 2L, Some("Y")))
      .toDF("u", "ts", "eid", "t")
    assert(Funnels.pathNgrams(tied, "u", "ts", "eid", "t", 2)
      .head().getString(0) == "X > Y")
    // NULL type is a visible category, not a splice
    val withNull = Seq((1L, 1L, 1L, Some("A")),
      (1L, 2L, 2L, Option.empty[String]), (1L, 3L, 3L, Some("B")))
      .toDF("u", "ts", "eid", "t")
    assert(Funnels.pathNgrams(withNull, "u", "ts", "eid", "t", 2)
      .collect().map(_.getString(0)).toSet == Set("A > (null)", "(null) > B"))
    // NULL order key is loud
    val badTs = Seq((1L, Option.empty[Long], 1L, "A")).toDF("u", "ts", "eid", "t")
    intercept[Exception](
      Funnels.pathNgrams(badTs, "u", "ts", "eid", "t", 2).collect())
    intercept[IllegalArgumentException](
      Funnels.pathNgrams(ev, "u", "ts", "eid", "t", 1))
  }

  test("kaplanMeier matches the textbook product-limit curve; censoring shapes the risk set; loud contracts") {
    // classic worked example: events at 6 (d=2, n=7), 7 (d=1, n=4),
    // 13 (d=1, n=2); censored at 6, 10, 16
    val subjects = Seq((6L, 1L), (6L, 1L), (6L, 0L), (7L, 1L),
      (10L, 0L), (13L, 1L), (16L, 0L))
      .map { case (t, e) => ("a", t, e) }.toDF("k", "t", "e")
    val out = Funnels.kaplanMeier(subjects, Seq("k"), "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("survival")))).toMap
    assert(out.keySet == Set(6L, 7L, 13L)) // event times only
    assert(out(6L) == ((7L, 2L, 0.714286)))   // 5/7
    assert(out(7L) == ((4L, 1L, 0.535714)))   // 5/7 * 3/4
    assert(out(13L) == ((2L, 1L, 0.267857)))  // ... * 1/2
    // no censoring: survival is the plain empirical tail
    val pure = Seq(1L, 2L, 3L, 4L).map(t => ("b", t, 1L))
      .toDF("k", "t", "e")
    val p = Funnels.kaplanMeier(pure, Seq("k"), "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("survival")).toMap
    assert(p == Map(1L -> 0.75, 2L -> 0.5, 3L -> 0.25, 4L -> 0.0))
    // keys are independent curves
    val two = Funnels.kaplanMeier(
      subjects.unionByName(pure), Seq("k"), "t", "e")
    assert(two.where(col("k") === "a").count() == 3L)
    assert(two.where(col("k") === "b").count() == 4L)
    // loud: double durations, bad event flags, NULLs, maxTimes
    intercept[IllegalArgumentException](Funnels.kaplanMeier(
      Seq(("a", 1.5, 1L)).toDF("k", "t", "e"), Seq("k"), "t", "e"))
    intercept[IllegalArgumentException](Funnels.kaplanMeier(
      Seq(("a", 1L, 2L)).toDF("k", "t", "e"), Seq("k"), "t", "e"))
    intercept[IllegalArgumentException](Funnels.kaplanMeier(
      Seq(("a", -1L, 1L)).toDF("k", "t", "e"), Seq("k"), "t", "e"))
    intercept[IllegalArgumentException](Funnels.kaplanMeier(
      subjects, Seq("k"), "t", "e", maxTimes = 2L))
    intercept[IllegalArgumentException](Funnels.kaplanMeier(
      subjects, Nil, "t", "e"))
  }

  test("nelsonAalen: textbook cumulative hazard on the KM fixture, exp(-H) bounds survival, loud contracts") {
    // same worked example as the KM spec: events at 6 (d=2, n=7),
    // 7 (d=1, n=4), 13 (d=1, n=2) with censoring at 6, 10, 16
    val subjects = Seq((6L, 1L), (6L, 1L), (6L, 0L), (7L, 1L),
      (10L, 0L), (13L, 1L), (16L, 0L))
      .map { case (t, e) => ("a", t, e) }.toDF("k", "t", "e")
    val out = Funnels.nelsonAalen(subjects, Seq("k"), "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("cum_hazard")))).toMap
    assert(out.keySet == Set(6L, 7L, 13L))
    assert(out(6L) == ((7L, 2L, 0.285714)))            // 2/7
    assert(out(7L) == ((4L, 1L, 0.535714)))            // + 1/4
    assert(out(13L) == ((2L, 1L, 1.035714)))           // + 1/2
    // Fleming–Harrington: exp(−H) dominates the KM survival pointwise
    val km = Funnels.kaplanMeier(subjects, Seq("k"), "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("survival")).toMap
    out.foreach { case (t, (_, _, h)) =>
      assert(math.exp(-h) >= km(t) - 1e-9, s"t=$t exp(-H) < KM") }
    // partition invariance (window over bounded distinct-times table)
    val shuffled = Funnels.nelsonAalen(subjects.repartition(5),
      Seq("k"), "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("cum_hazard")).toMap
    assert(shuffled == out.map { case (t, (_, _, h)) => t -> h })
    intercept[IllegalArgumentException](Funnels.nelsonAalen(
      Seq(("a", 1.5, 1L)).toDF("k", "t", "e"), Seq("k"), "t", "e"))
    intercept[IllegalArgumentException](Funnels.nelsonAalen(
      Seq(("a", 1L, 2L)).toDF("k", "t", "e"), Seq("k"), "t", "e"))
    intercept[IllegalArgumentException](Funnels.nelsonAalen(
      subjects, Seq("k"), "t", "e", maxTimes = 2L))
    intercept[IllegalArgumentException](Funnels.nelsonAalen(
      subjects, Nil, "t", "e"))
  }
}
