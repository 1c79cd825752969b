package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("hash split is exhaustive, deterministic, and near the fractions") {
    val df = ids(5000)
    val split = Sampling.withHashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000)
    assert(math.abs(counts("train") - 4000) < 200, counts.toString)
    assert(math.abs(counts("val") - 500) < 120, counts.toString)
    // rerun → identical assignment
    val again = Sampling.withHashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
  }

  test("a row's split never changes when the dataset grows") {
    val small = Sampling.withHashSplit(ids(100), "id", Seq("a" -> 0.5, "b" -> 0.5))
    val large = Sampling.withHashSplit(ids(10000), "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(small.join(large.withColumnRenamed("split", "split2"), "id")
      .where(col("split") =!= col("split2")).isEmpty)
  }

  test("hash sample keeps roughly the fraction, stable across runs") {
    val s1 = Sampling.hashSample(ids(5000), "id", 0.2)
    assert(math.abs(s1.count() - 1000) < 150)
    assert(s1.except(Sampling.hashSample(ids(5000), "id", 0.2)).isEmpty)
  }
}
