package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{CompressFunctions, MojibakeFunctions, VectorFunctions}

class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL functions equal their Column-API twins") {
    Seq((1L, Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0),
      "graft text graft text graft text"))
      .toDF("id", "a", "b", "text")
      .createOrReplaceTempView("g")
    val sql = spark.sql(
      """SELECT graft_dot(a, b) AS dot, graft_sumsq(a) AS ss,
        |  graft_hex_prefix(sha2(text, 256), 7) AS hp,
        |  graft_srp(a, 2) AS srp,
        |  graft_deflate_size(text) AS dz,
        |  graft_fix_mojibake(text) AS fixed
        |FROM g""".stripMargin).collect()(0)
    val api = spark.table("g").select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.sumSquares(col("a")).as("ss"),
      VectorFunctions.hexPrefixToLong(sha2(col("text"), 256), 7).as("hp"),
      VectorFunctions.srpProject(col("a"), 2).as("srp"),
      CompressFunctions.deflateSize(col("text")).as("dz"),
      MojibakeFunctions.fixMojibake(col("text")).as("fixed")).collect()(0)
    assert(sql.getAs[Double]("dot") == api.getAs[Double]("dot"))
    assert(sql.getAs[Double]("ss") == api.getAs[Double]("ss"))
    assert(sql.getAs[Long]("hp") == api.getAs[Long]("hp"))
    assert(sql.getSeq[Double](3) == api.getSeq[Double](3))
    assert(sql.getAs[Int]("dz") == api.getAs[Int]("dz"))
    assert(sql.getAs[String]("fixed") == api.getAs[String]("fixed"))
  }

  test("gear chunks + unicode functions work from SQL; defaults apply") {
    val row = spark.sql(
      """SELECT size(graft_gear_chunks(encode('abcdef', 'utf-8'), 2, 4, 8)) AS nc,
        |  graft_nfc('café') AS nfc,
        |  graft_strip_marks('café') AS stripped""".stripMargin)
      .collect()(0)
    assert(row.getAs[Int]("nc") >= 1)
    assert(row.getAs[String]("nfc") == "café")
    assert(row.getAs[String]("stripped") == "cafe")
  }

  test("the extensions entry point injects the same function list") {
    // the cluster-wide path shares the builders with register(); this
    // pins that apply() wires every function without throwing
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.functions.nonEmpty)
    assert(GraftFunctions.functions.map(_._1).distinct.size ==
      GraftFunctions.functions.size, "function names must be unique")
  }

  test("non-literal parameters fail loudly at analysis") {
    Seq(Tuple1("x")).toDF("t").createOrReplaceTempView("g2")
    val e = intercept[Exception](
      spark.sql("SELECT graft_deflate_size(t, length(t)) FROM g2").collect())
    assert(e.getMessage.contains("literal"),
      s"expected a loud literal-parameter error, got: ${e.getMessage}")
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0)) FROM g2").collect())
    assert(e2.getMessage.contains("argument"))
  }
}
