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
}
