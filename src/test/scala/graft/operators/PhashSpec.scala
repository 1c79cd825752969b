package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PhashSpec extends SparkTestBase {
  import spark.implicits._

  private def hashOf(payloads: Seq[(Long, String)]): Map[Long, Long] =
    payloads.toDF("id", "s")
      .select(col("id"),
        Multimodal.perceptualHash(col("s").cast("binary")).as("h"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("h")).toMap

  test("perceptualHash: deterministic, sign-free, degenerate payloads hash to 0") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val h = hashOf(Seq(1L -> base, 2L -> base, 3L -> "", 4L -> "aaaaaaaaaa"))
    assert(h(1L) == h(2L))
    assert(h(1L) >= 0L, "60-cell hash must stay in non-negative long range")
    assert(h(3L) == 0L, "empty payload")
    // constant payload: every cell equals the median, strict > sets no bit
    assert(h(4L) == 0L)
    val hNull = Seq((5L, null: String)).toDF("id", "s")
      .select(Multimodal.perceptualHash(col("s").cast("binary")).as("h"))
      .head().getAs[Long]("h")
    assert(hNull == 0L)
  }

  test("perceptualHash is locality-preserving for equal-length byte edits") {
    val base = "The cat sat on the mat while rain fell on the tin roof all day " * 4
    val mutated = base.dropRight(3) + "xyz" // same length, 3-byte tail edit
    val other = "completely unrelated content with different byte statistics!! " * 4
    val h = hashOf(Seq(1L -> base, 2L -> mutated, 3L -> other))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 5,
      s"tail edit should flip few bits, got ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 10,
      s"unrelated payloads should differ widely, got ${ham(h(1L), h(3L))}")
  }

  test("hashNearDupPairs matches a brute-force Hamming scan exactly") {
    val docs = (0L until 40L).map { i =>
      val base = s"document number $i with some repeated filler text payload " * 3
      i -> base
    } ++ Seq( // planted near-dups: equal-length tail edits of doc 7 and 13
      100L -> ((s"document number 7 with some repeated filler text payload " * 3)
        .dropRight(3) + "xyz"),
      101L -> ((s"document number 13 with some repeated filler text payload " * 3)
        .dropRight(2) + "qq"))
    val df = docs.toDF("id", "s")
      .select(col("id"), Multimodal.perceptualHash(col("s").cast("binary")).as("h"))
    val got = Dedup.hashNearDupPairs(df, "id", col("h"),
      bits = 60, bands = 6, maxHamming = 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val hs = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("h"))
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 5
    } yield (ia, ib)).toSet
    assert(got == want, s"banded join must be exact; got=$got want=$want")
    assert(want.contains((7L, 100L)) && want.contains((13L, 101L)),
      "planted tail-edit near-dups must be within the Hamming budget")
  }

  test("dropZero keeps degenerate zero-fingerprints out of the pair space") {
    val df = Seq((1L, ""), (2L, ""), (3L, "aaaa"), (4L, "real content here ok"))
      .toDF("id", "s")
      .select(col("id"), Multimodal.perceptualHash(col("s").cast("binary")).as("h"))
    val kept = Dedup.hashNearDupPairs(df, "id", col("h"), 60, 6, 5,
      dropZero = true).collect()
    assert(kept.isEmpty, "empty/constant payloads must not pair as near-dups")
    val loose = Dedup.hashNearDupPairs(df, "id", col("h"), 60, 6, 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "default keeps historical zero-pairs-like-any-value semantics")
  }
}
