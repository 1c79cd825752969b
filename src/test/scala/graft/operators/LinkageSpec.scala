package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val name = Linkage.FieldWeight("name", 0.95, 0.001)
  private val phone = Linkage.FieldWeight("phone", 0.9, 0.01)

  test("scorePairs: hand-computed Fellegi-Sunter weights; blocking scopes candidates; null semantics") {
    val rows = Seq(
      // block "A": a planted twin pair (name agrees, phone differs), one stranger
      (1L, "A", "alice", "555-01"),
      (2L, "A", "alice", "555-99"),
      (3L, "A", "bob", "555-02"),
      // block "B": same name as alice but a DIFFERENT block — never compared
      (4L, "B", "alice", "555-01"),
      // null block key: never pairs with anyone
      (5L, null.asInstanceOf[String], "alice", "555-01"),
      // block "C": both fields NULL on both sides — null-safe equality
      // counts them as agreement (identical missingness IS signal here)
      (6L, "C", null.asInstanceOf[String], null.asInstanceOf[String]),
      (7L, "C", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "block", "name", "phone")
    val out = Linkage.scorePairs(rows, "id", Seq("block"),
      Seq(name, phone), threshold = -100.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("n_agree"), r.getAs[Long]("score_micros"))).toMap
    // twin: name agrees + phone disagrees
    assert(out((1L, 2L)) ==
      (1L, name.agreeMicros + phone.disagreeMicros))
    // strangers in one block: both disagree
    assert(out((1L, 3L)) ==
      (0L, name.disagreeMicros + phone.disagreeMicros))
    // cross-block / null-block rows never pair
    assert(!out.keySet.exists { case (a, b) =>
      a == 4L || b == 4L || a == 5L || b == 5L })
    // identical missingness agrees null-safely on both fields
    assert(out((6L, 7L)) == (2L, name.agreeMicros + phone.agreeMicros))
    assert(out.size == 4, s"blocks bound the candidates: ${out.keySet}")
    // threshold keeps only match-favoring pairs
    val kept = Linkage.scorePairs(rows, "id", Seq("block"),
      Seq(name, phone), threshold = 5.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (6L, 7L)), s"kept: $kept")
  }

  test("scorePairs: loud on uninformative fields and unblocked calls") {
    intercept[IllegalArgumentException](Linkage.FieldWeight("x", 0.5, 0.5))
    intercept[IllegalArgumentException](Linkage.FieldWeight("x", 1.0, 0.5))
    intercept[IllegalArgumentException](
      Linkage.scorePairs(Seq((1L, "a")).toDF("id", "v"), "id",
        Nil, Seq(name)))
    intercept[IllegalArgumentException](
      Linkage.scorePairs(Seq((1L, "a")).toDF("id", "v"), "id",
        Seq("v"), Nil))
  }
}
