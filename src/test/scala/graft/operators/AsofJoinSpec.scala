package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 7L), (5L, "b", 3L)
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("a", 1L, "a@1"), ("a", 10L, "a@10"), ("a", 15L, "a@15"),
      ("b", 6L, "b@6")
    ).toDF("k", "ts", "snap")

    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      rightTsAs = Some("snap_ts"))
      .select("event_id", "snap", "snap_ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)

    assert(got.toSeq == Seq(
      (1L, "a@1", Some(1L)), // between 1 and 10
      (2L, "a@10", Some(10L)), // tie: right at exactly left ts matches
      (3L, "a@15", Some(15L)),
      (4L, "b@6", Some(6L)),
      (5L, null, None))) // before any right row → null
  }

  test("null-ts left rows match nothing in EVERY direction") {
    val left = Seq((1L, "a", Some(15L)), (2L, "a", None: Option[Long]))
      .toDF("event_id", "k", "ts")
    val right = Seq(("a", 10L, "a@10"), ("a", 20L, "a@20"))
      .toDF("k", "ts", "snap")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
        direction = dir)
        .select("event_id", "snap").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got(2L).isEmpty,
        s"direction=$dir must give the null-ts row a null payload " +
          s"(got ${got(2L)})")
      assert(got(1L).nonEmpty, s"direction=$dir real row still matches")
    }
  }

  test("tolerance nulls stale matches without re-searching") {
    val left = Seq(
      (1L, "a", 5L), (2L, "a", 50L), (3L, "a", 12L)
    ).toDF("event_id", "k", "ts")
    val right = Seq(("a", 1L, "a@1"), ("a", 10L, "a@10"))
      .toDF("k", "ts", "snap")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      tolerance = Some(4L))
      .select("event_id", "snap").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(
      1L -> Some("a@1"),  // |5-1| = 4 <= 4
      2L -> None,         // nearest-backward a@10 is 40 stale -> nulled
      3L -> Some("a@10"))) // |12-10| = 2
    // tolerance requires a numeric ts
    val sLeft = left.withColumn("ts", col("ts").cast("string"))
    val sRight = right.withColumn("ts", col("ts").cast("string"))
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      sLeft, sRight, Seq("k"), "ts", tolerance = Some(1L)))
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      left, right, Seq("k"), "ts", tolerance = Some(-1L)))
  }

  test("asof join preserves every left column and row") {
    val left = Seq((1L, "a", 5L, "x")).toDF("event_id", "k", "ts", "extra")
    val right = Seq(("a", 1L, 9.5)).toDF("k", "ts", "v")
    val row = AsofJoin.asofJoin(left, right, Seq("k"), "ts").collect().head
    assert(row.getAs[String]("extra") == "x")
    assert(row.getAs[Double]("v") == 9.5)
    assert(AsofJoin.asofJoin(left, right, Seq("k"), "ts").columns.toSeq ==
      Seq("event_id", "k", "ts", "extra", "v"))
  }

  test("forward direction picks the earliest right row at or after each left ts") {
    val left = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 7L), (5L, "b", 3L)
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("a", 1L, "a@1"), ("a", 10L, "a@10"), ("a", 15L, "a@15"),
      ("b", 6L, "b@6")
    ).toDF("k", "ts", "snap")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      rightTsAs = Some("snap_ts"), direction = "forward")
      .select("event_id", "snap", "snap_ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a@10", Some(10L)), // next at-or-after 5
      (2L, "a@10", Some(10L)), // tie: right at exactly left ts matches
      (3L, null, None), // after the last right row → null
      (4L, null, None), // b@6 is before 7; nothing after
      (5L, "b@6", Some(6L))))
  }

  test("nearest direction picks the closer side, ties to backward") {
    val left = Seq(
      (1L, "a", 5L),  // b=a@1 (d=4) vs f=a@10 (d=5) → backward
      (2L, "a", 8L),  // b=a@1 (d=7) vs f=a@10 (d=2) → forward
      (3L, "a", 12L), // b=a@10 (d=2) vs f=a@14 (d=2) → TIE → backward
      (4L, "a", 99L), // only backward exists
      (5L, "b", 1L)   // only forward exists
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("a", 1L, "a@1"), ("a", 10L, "a@10"), ("a", 14L, "a@14"),
      ("b", 6L, "b@6")
    ).toDF("k", "ts", "snap")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      direction = "nearest")
      .select("event_id", "snap").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a@1"), (2L, "a@10"), (3L, "a@10"), (4L, "a@14"), (5L, "b@6")))
    // non-numeric ordering column refuses nearest up front
    val badLeft = Seq((1L, "a", "2024-01-01")).toDF("event_id", "k", "ts")
    val badRight = Seq(("a", "2024-01-01", "s")).toDF("k", "ts", "snap")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(badLeft, badRight, Seq("k"), "ts", direction = "nearest")
    }
  }

  test("right rows with a null timestamp never match") {
    val left = Seq((1L, "a", 5L)).toDF("event_id", "k", "ts")
    val right = Seq(
      ("a", Some(3L), "good"),
      ("a", None, "null-ts-snapshot")
    ).toDF("k", "ts", "snap")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts").collect().head
    assert(got.getAs[String]("snap") == "good")
    // key whose ONLY right row has a null ts → no match at all
    val right2 = Seq(("a", None: Option[Long], "null-ts")).toDF("k", "ts", "snap")
    val got2 = AsofJoin.asofJoin(left, right2, Seq("k"), "ts").collect().head
    assert(got2.getAs[String]("snap") == null)
  }
}
