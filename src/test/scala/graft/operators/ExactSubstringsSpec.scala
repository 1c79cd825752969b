package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExactSubstringsSpec extends SparkTestBase {
  import spark.implicits._

  // Shared 12-token phrase planted in docs 1 and 2 at different offsets;
  // doc 3 repeats a 10-gram twice WITHIN itself; docs 4-5 are unique prose.
  private val phrase = "one two three four five six seven eight nine ten eleven twelve"
  private def fixture = Seq(
    (1L, s"alpha beta $phrase gamma delta"),
    (2L, s"$phrase omega"),
    (3L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 sep r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"),
    (4L, "the unique quick brown fox jumps over a lazy dog near the riverbank today quietly"),
    (5L, "short doc")
  ).toDF("doc_id", "text")

  test("repeatedSpans finds the planted cross-doc and within-doc repeats") {
    val spans = ExactSubstrings.repeatedSpans(fixture, w = 10)
      .orderBy("doc_id", "span_start").collect()
    // doc 1: phrase occupies tokens 3..14 -> windows at 3,4,5 -> span 3..14
    // doc 2: phrase occupies tokens 1..12 -> span 1..12
    // doc 3: both copies of the 10-gram repeat (positions 1 and 12);
    //        windows at 1 and 12 don't touch (12 - 1 > 10) -> two spans
    assert(spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 3, 14), (2L, 1, 12), (3L, 1, 10), (3L, 12, 21)))
    // every span is >= w tokens by construction
    spans.foreach(r => assert(r.getInt(3) >= 10))
  }

  test("adjacent repeated windows merge into one maximal span") {
    // 14-token repeat -> duplicated windows at positions 1..5 of each copy,
    // all within w of each other -> ONE span covering the full 14 tokens
    val rep = (1 to 14).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, s"$rep x y z"), (2L, s"p q $rep")).toDF("doc_id", "text")
    val spans = ExactSubstrings.repeatedSpans(df, w = 10)
      .orderBy("doc_id").collect()
    assert(spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 1, 14), (2L, 3, 16)))
  }

  test("removeRepeatedSpans keeps every doc once and cuts only span tokens") {
    val out = ExactSubstrings.removeRepeatedSpans(fixture, w = 10)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getInt(2))).toMap
    assert(byId(1L) == ("alpha beta gamma delta", 12))
    assert(byId(2L) == ("omega", 12))
    assert(byId(3L) == ("sep", 20))
    // untouched docs: identical token stream, zero removed
    assert(byId(4L)._2 == 0)
    assert(byId(5L) == ("short doc", 0))
  }

  test("sub-minCount windows and short docs produce no spans") {
    val df = Seq((1L, "only one copy of this long sentence exists here today"),
      (2L, "tiny")).toDF("doc_id", "text")
    assert(ExactSubstrings.repeatedSpans(df, w = 5).count() == 0)
    // raising minCount above the occurrence count silences a real repeat
    assert(ExactSubstrings.repeatedSpans(fixture, w = 10, minCount = 3)
      .where(col("doc_id").isin(1L, 2L)).count() == 0)
  }

  test("duplicate marking pays one corpus exchange, islands only reshuffle hits") {
    // AQE off for the probe: executedPlan then holds real Exchange nodes
    val plan = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try ExactSubstrings.repeatedSpans(fixture.repartition(4), w = 10)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    // exactly two hash exchanges: (h1,h2) count window over the full
    // window stream, then per-doc islands over the hit rows. A groupBy+
    // self-join formulation would plan three. (The repartition(4) above
    // is round-robin, not hash — excluded by the pattern.)
    assert(exchanges.length == 2,
      s"expected 2 hash exchanges (dup count + islands), got ${exchanges.length}:\n$plan")
  }
}
