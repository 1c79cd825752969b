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

  test("contaminatedSpans cuts benchmark overlaps, not within-train repeats") {
    val bench = Seq((99L, s"intro words $phrase closing words")).toDF("bid", "btext")
    // train doc 1 carries the benchmark phrase; docs 3-5 don't (doc 3's
    // self-repeat must NOT count — contamination is vs the benchmark only)
    val train = fixture.where(col("doc_id") =!= 2)
    val spans = ExactSubstrings.contaminatedSpans(
      train, "doc_id", "text", bench, "btext", w = 10)
      .orderBy("doc_id", "span_start").collect()
    assert(spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 3, 14)))
    val out = ExactSubstrings.removeContaminatedSpans(
      train, bench, benchTextCol = "btext", w = 10).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getInt(2))).toMap
    assert(out.length == 4, "every training doc survives, clean or cut")
    assert(byId(1L)._1 == "alpha beta gamma delta" && byId(1L)._2 == 12)
    assert(byId(3L)._2 == 0, "self-repeats are not contamination")
    assert(byId(5L) == ("short doc", 0), "sub-w docs pass through")
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

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_substr_").toString
  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit

  test("ingestBatch: bootstrap, cross-batch dedup, re-delivery, param drift") {
    val dir = tempDir() + "/idx"
    try {
      val phrase = "w1 w2 w3 w4 w5 w6 w7"
      val b1 = Seq(
        (1L, s"intro $phrase outro"),
        (2L, "totally original first batch content here today")
      ).toDF("doc_id", "text")
      val c1 = ExactSubstrings.ingestBatch(b1, dir, w = 5)
        .orderBy("doc_id").collect()
      // bootstrap: nothing repeated within batch 1, everything survives
      assert(c1.map(_.getInt(2)).sum == 0)

      val b2 = Seq(
        (10L, s"prefix tokens then $phrase and a tail"),
        (11L, "completely novel second batch document nothing shared"),
        (12L, "totally original first batch content here today")
      ).toDF("doc_id", "text")
      val c2 = ExactSubstrings.ingestBatch(b2, dir, w = 5)
        .orderBy("doc_id").collect()
      val byId = c2.map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      // doc 10 loses exactly the 7-token phrase from batch 1
      assert(byId(10L) == ("prefix tokens then and a tail", 7))
      // novel doc untouched
      assert(byId(11L)._2 == 0)
      // re-delivered doc 2 content is fully indexed -> fully cut
      assert(byId(12L) == ("", 7))

      // parameter drift is loud, not silently empty
      val e = intercept[IllegalArgumentException] {
        ExactSubstrings.ingestBatch(b2, dir, w = 6)
      }
      assert(e.getMessage.contains("must match"))
    } finally cleanup(new java.io.File(dir).getParent)
  }

  test("sidecar-committed but data-less index loads empty; compact no-ops") {
    val dir = tempDir() + "/idx"
    try {
      // a batch of only sub-w docs appends ZERO rows but commits params
      val b = Seq((1L, "tiny")).toDF("doc_id", "text")
      ExactSubstrings.writeSubstrIndex(
        ExactSubstrings.indexRowsFor(b, w = 5), dir, w = 5)
      val ix = ExactSubstrings.loadSubstrIndex(spark, dir, w = 5)
      assert(ix.isEmpty, "data-less index must load as a valid empty frame")
      ExactSubstrings.compactSubstrIndex(spark, dir) // must not crash
      // probing the empty index degrades to within-batch-only semantics
      val probe = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
      assert(ExactSubstrings.repeatedSpansAgainstIndex(probe, ix, w = 5)
        .count() == 0)
      // and param drift on the data-less index is still loud
      intercept[IllegalArgumentException] {
        ExactSubstrings.loadSubstrIndex(spark, dir, w = 7)
      }
    } finally cleanup(new java.io.File(dir).getParent)
  }

  test("compactSubstrIndex: distincts duplicate appends, probe unchanged") {
    val dir = tempDir() + "/idx"
    try {
      val b = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
      ExactSubstrings.writeSubstrIndex(
        ExactSubstrings.indexRowsFor(b, w = 5), dir, w = 5)
      ExactSubstrings.writeSubstrIndex(
        ExactSubstrings.indexRowsFor(b, w = 5), dir, w = 5)
      val before = spark.read.parquet(dir).count()
      ExactSubstrings.compactSubstrIndex(spark, dir)
      val after = spark.read.parquet(dir).count()
      assert(before == 2 * after, s"double append $before should halve to $after")
      // probe against the compacted index still finds the content
      val probe = Seq((9L, "x y a b c d e f g h z")).toDF("doc_id", "text")
      val spans = ExactSubstrings.repeatedSpansAgainstIndex(
        probe, ExactSubstrings.loadSubstrIndex(spark, dir, w = 5),
        w = 5).collect()
      assert(spans.map(r => (r.getInt(1), r.getInt(2))).toSeq == Seq((3, 10)))

      // the probe streams the index and broadcasts the BATCH (build
      // right) — the whole point of the persisted form is no index
      // shuffle and no history re-hash
      val plan = {
        val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try ExactSubstrings.repeatedSpansAgainstIndex(
          probe, ExactSubstrings.loadSubstrIndex(spark, dir, w = 5),
          w = 5, includeBatchInternal = false)
          .queryExecution.executedPlan
        finally spark.conf.set("spark.sql.adaptive.enabled", prev)
      }
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, s"expected a broadcast hash join:\n$plan")
      assert(bhj.forall(_.buildSide ==
        org.apache.spark.sql.catalyst.optimizer.BuildRight),
        "batch must be the broadcast build side; the index streams")
    } finally cleanup(new java.io.File(dir).getParent)
  }
}
