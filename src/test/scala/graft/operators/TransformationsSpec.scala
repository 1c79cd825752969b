package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Hashing

class TransformationsSpec extends SparkTestBase {
  import spark.implicits._

  test("renameColumns preserves order and renames") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    val out = Transformations.renameColumns(df, Map("y" -> "why"))
    assert(out.columns.toSeq == Seq("x", "why", "z"))
    assert(out.collect().head.getString(1) == "a")
  }

  test("renameColumns rejects missing and colliding names") {
    val df = Seq((1, "a")).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Transformations.renameColumns(df, Map("nope" -> "n"))
    }
    intercept[IllegalArgumentException] {
      Transformations.renameColumns(df, Map("x" -> "y"))
    }
  }

  test("withConstants adds literals; collision needs overwrite") {
    val df = Seq((1, "a")).toDF("x", "y")
    val out = Transformations.withConstants(df, Seq("src" -> "s", "v" -> 7))
    val row = out.collect().head
    assert(row.getAs[String]("src") == "s" && row.getAs[Int]("v") == 7)
    intercept[IllegalArgumentException] {
      Transformations.withConstants(df, Seq("x" -> 9))
    }
    val over = Transformations.withConstants(df, Seq("x" -> 9), overwrite = true)
    assert(over.collect().head.getAs[Int]("x") == 9)
  }

  test("castColumns casts in place preserving order") {
    val df = Seq((1, "2.5")).toDF("x", "y")
    val out = Transformations.castColumns(df, Map("y" -> "double", "x" -> "bigint"))
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.schema("y").dataType.typeName == "double")
    assert(out.schema("x").dataType.typeName == "long")
    intercept[IllegalArgumentException] {
      Transformations.castColumns(df, Map("nope" -> "int"))
    }
  }

  test("normalizeWhitespace collapses and trims") {
    val df = Seq(("  a   b\t c  ", 1)).toDF("s", "i")
    val out = Transformations.normalizeWhitespace(df, Seq("s"))
    assert(out.collect().head.getString(0) == "a b c")
    val noTrim = Transformations.normalizeWhitespace(df, Seq("s"), trimEnds = false)
    assert(noTrim.collect().head.getString(0) == " a b c ")
  }

  test("splitByDateFormats parses per-format with first-match-wins") {
    val df = Seq(
      (1L, "2024-03-01"), (2L, "03/02/2024"), (3L, "01.04.2024"), (4L, "garbage")
    ).toDF("id", "d")
    val res = Transformations.splitByDateFormats(
      df, "d", Seq("yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy"))
    val got = res.df.orderBy("id").collect()
      .map(r => Option(r.getAs[java.sql.Date]("d_date")).map(_.toString).orNull)
    assert(got.toSeq == Seq("2024-03-01", "2024-03-02", "2024-04-01", null))
    assert(res.unmatched.count() == 1)
  }

  test("splitByDateFormats default and strict modes") {
    val df = Seq((1L, "2024-03-01"), (2L, "zzz")).toDF("id", "d")
    val dflt = Transformations.splitByDateFormats(
      df, "d", Seq("yyyy-MM-dd"), handleErrors = "default",
      defaultValue = Some("1970-01-01"))
    val byId = dflt.df.orderBy("id").collect()
    assert(byId(1).getAs[java.sql.Date]("d_date").toString == "1970-01-01")
    intercept[IllegalArgumentException] {
      Transformations.splitByDateFormats(df, "d", Seq("yyyy-MM-dd"),
        handleErrors = "strict")
    }
  }

  test("rowHash is sha256 of U+241F-joined null-coalesced strings") {
    val df = Seq((Some("a"), Some(1)), (None, Some(2))).toDF("s", "i")
    val got = df.select(Hashing.rowHashOf(Seq("s", "i")).as("h")).collect()
      .map(_.getString(0))
    def ref(parts: Seq[String]): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(parts.mkString("␟").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got(0) == ref(Seq("a", "1")))
    assert(got(1) == ref(Seq("", "2")))
  }

  test("date and time dims have expected shape") {
    val d = DataFrameUtils.createDateDataframe(spark, "2024-01-01", "2024-01-07")
    assert(d.count() == 7)
    val first = d.orderBy("date").collect().head
    assert(first.getAs[Int]("year") == 2024 && first.getAs[String]("day_name") == "Monday")
    val tm = DataFrameUtils.createTimeDataframe(spark, "00:00", "01:00", 900)
    val times = tm.collect().map(_.getAs[String]("time")).toSeq
    assert(times == Seq("00:00:00", "00:15:00", "00:30:00", "00:45:00", "01:00:00"))
  }
}
