package graft.similarity

import graft.SparkTestBase

class CoresetSpec extends SparkTestBase {
  import spark.implicits._

  private val line = Seq(
    ("a", Seq(0.0f)), ("b", Seq(1.0f)), ("c", Seq(10.0f)), ("d", Seq(11.0f)))
    .toDF("id", "v")

  test("kCenter walks the farthest-first traversal exactly") {
    val out = Coreset.kCenter(line, "id", "v", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    // seed = lexicographically-first id; then 11 (d=121); then the
    // d=1 tie (b vs c) broken by ascending id
    assert(out.toSeq == Seq((0, "a", 0.0), (1, "d", 121.0), (2, "b", 1.0)))
  }

  test("kCenter stops early on exhausted distinct points; is partition-stable") {
    val dup = Seq(("x", Seq(1.0f)), ("y", Seq(1.0f)), ("z", Seq(1.0f)))
      .toDF("id", "v")
    val out = Coreset.kCenter(dup, "id", "v", k = 3).collect()
    assert(out.length == 1 && out.head.getString(1) == "x",
      "identical points cannot yield more than one center")
    val a = Coreset.kCenter(line.repartition(1), "id", "v", 4)
      .collect().map(_.toString).toSeq
    val b = Coreset.kCenter(line.repartition(5), "id", "v", 4)
      .collect().map(_.toString).toSeq
    assert(a == b)
    // radii are non-increasing after the seed row
    val radii = Coreset.kCenter(line, "id", "v", 4)
      .collect().map(_.getDouble(2)).drop(1)
    assert(radii.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("kCenter loud paths") {
    intercept[IllegalArgumentException](Coreset.kCenter(line, "id", "v", 0))
    intercept[IllegalArgumentException](Coreset.kCenter(line, "id", "v", 257))
    intercept[IllegalArgumentException](
      Coreset.kCenter(line.limit(0), "id", "v", 2))
    val withNull = Seq(("a", Some(Seq(1.0f))), ("b", None)).toDF("id", "v")
    assert(intercept[IllegalArgumentException](
      Coreset.kCenter(withNull, "id", "v", 2)).getMessage.contains("NULL"))
  }
}
