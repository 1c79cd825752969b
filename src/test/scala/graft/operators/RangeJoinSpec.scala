package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, 250L), (6L, -7L)
  ).toDF("pid", "x")

  private val intervals = Seq(
    (10L, 0L, 10L),     // catches 5, 10, -? no: [0,10] → pids 1,2
    (11L, 10L, 99L),    // inclusive both ends → pids 2,3
    (12L, 100L, 300L),  // pids 4,5
    (13L, -10L, -1L),   // pid 6
    (14L, 400L, 500L)   // nothing
  ).toDF("iid", "s", "e")

  private def naive = points.join(intervals,
    col("x") >= col("s") && col("x") <= col("e"))
    .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the naive BETWEEN join exactly") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
        "x", "s", "e", bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.toSet == naive, s"bucketWidth=$w")
      assert(got.length == got.toSet.size, s"no duplicate matches at w=$w")
    }
  }

  test("extraKeys restricts matches to the same key") {
    val p = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("pid", "x", "k")
    val i = Seq((10L, 0L, 10L, "a")).toDF("iid", "s", "e", "k")
    val got = RangeJoin.pointInInterval(p, i, "x", "s", "e",
      bucketWidth = 8L, extraKeys = Seq("k"))
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L), "only the matching key joins")
  }

  test("degenerate whole-domain interval fails loud") {
    val i = Seq((10L, 0L, 10000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, i, "x", "s", "e",
        bucketWidth = 16L, maxBucketsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("rangeJoin")
      || e.getCause != null && e.getCause.getMessage.contains("rangeJoin"))
  }

  test("broadcastWideIntervals routes whole-domain intervals instead of throwing") {
    // one degenerate catch-all window among normal ones: the default path
    // throws (previous test); the broadcast path answers, exactly naive
    val mixed = intervals.unionByName(
      Seq((15L, -1000000L, 1000000L)).toDF("iid", "s", "e"))
    val naiveMixed = points.join(mixed,
      col("x") >= col("s") && col("x") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.pointInInterval(points, mixed, "x", "s", "e",
      bucketWidth = 16L, maxBucketsPerInterval = 100,
      broadcastWideIntervals = true)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.toSet == naiveMixed)
    assert(got.length == got.toSet.size, "no duplicate matches across paths")
    // every point hits the catch-all window exactly once
    assert(got.count(_._2 == 15L) == 6)
    // extraKeys apply on the broadcast path too
    val p = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("pid", "x", "k")
    val iw = Seq((10L, -1000000L, 1000000L, "a")).toDF("iid", "s", "e", "k")
    val keyed = RangeJoin.pointInInterval(p, iw, "x", "s", "e",
      bucketWidth = 8L, maxBucketsPerInterval = 10,
      extraKeys = Seq("k"), broadcastWideIntervals = true)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(keyed == Set((1L, 10L)))
  }

  test("inverted and null-bounded intervals match nothing, like naive BETWEEN") {
    val i = Seq(
      (10L, Some(10L), Some(0L)),   // inverted
      (11L, None, Some(50L)),       // null start
      (12L, Some(0L), None),        // null end
      (13L, Some(0L), Some(10L))    // normal → pids 1,2
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, i, "x", "s", "e",
      bucketWidth = 8L).select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 13L), (2L, 13L)))
  }

  test("a pre-existing __bucket column is rejected, not clobbered") {
    val p = points.withColumn("__bucket", lit(9L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, intervals, "x", "s", "e", bucketWidth = 8L)
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("clashing non-key columns are rejected up front") {
    val i = Seq((10L, 0L, 10L)).toDF("pid", "s", "e") // pid clashes
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, i, "x", "s", "e", bucketWidth = 8L)
    }
    assert(e.getMessage.contains("share"))
  }

  // ---- interval-overlap join ----

  private val ivA = (0 until 60).map { i =>
    (i.toLong, i.toLong * 13 % 200, i.toLong * 13 % 200 + i % 9 * 7)
  }.toDF("aid", "as", "ae")
  private val ivB = (0 until 50).map { i =>
    (i.toLong, i.toLong * 17 % 210, i.toLong * 17 % 210 + i % 7 * 11)
  }.toDF("bid", "bs", "be")

  private def naiveOverlap = ivA.join(ivB,
    col("as") <= col("be") && col("bs") <= col("ae"))
    .select("aid", "bid").as[(Long, Long)].collect().toSet

  test("intervalOverlap matches the naive inequality join exactly, no duplicates") {
    for (w <- Seq(1L, 8L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(ivA, ivB, "as", "ae", "bs", "be",
        bucketWidth = w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.toSet == naiveOverlap, s"bucketWidth=$w")
      assert(got.length == got.toSet.size,
        s"canonical-bucket dedup failed at w=$w")
    }
  }

  test("intervalOverlap: extraKeys partition the match space") {
    val a = Seq((1L, 0L, 10L, "x"), (2L, 0L, 10L, "y")).toDF("aid", "as", "ae", "k")
    val b = Seq((9L, 5L, 6L, "x")).toDF("bid", "bs", "be", "k")
    val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
      bucketWidth = 4L, extraKeys = Seq("k"))
      .select("aid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("intervalOverlap: wide right broadcasts when routed, wide left always loud") {
    val wideB = ivB.unionByName(
      Seq((999L, -1000000L, 1000000L)).toDF("bid", "bs", "be"))
    intercept[Exception] {
      RangeJoin.intervalOverlap(ivA, wideB, "as", "ae", "bs", "be",
        bucketWidth = 8L).count()
    }
    val got = RangeJoin.intervalOverlap(ivA, wideB, "as", "ae", "bs", "be",
      bucketWidth = 8L, broadcastWideRight = true)
      .select("aid", "bid").as[(Long, Long)].collect()
    val want = naiveOverlap ++ ivA.select("aid").as[Long].collect()
      .map(_ -> 999L) // the catch-all overlaps every valid left interval
    assert(got.toSet == want && got.length == got.toSet.size)
    // wide LEFT: no escape hatch, loud either way
    intercept[Exception] {
      RangeJoin.intervalOverlap(wideB.select(col("bid").as("aid"),
        col("bs").as("as"), col("be").as("ae")), ivB,
        "as", "ae", "bs", "be", bucketWidth = 8L,
        broadcastWideRight = true).count()
    }
  }

  test("intervalOverlap: inverted and null-bounded intervals match nothing") {
    val a = Seq((1L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(0L)),
      (2L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)),
      (3L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(5L)))
      .toDF("aid", "as", "ae")
    val b = Seq((9L, 0L, 100L)).toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
      bucketWidth = 16L)
      .select("aid").as[Long].collect().toSeq
    assert(got == Seq(3L), s"got $got")
  }
}
