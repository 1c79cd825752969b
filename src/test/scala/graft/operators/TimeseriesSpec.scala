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
}
