package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StemSpec extends SparkTestBase {
  import spark.implicits._

  test("Porter 1980: the paper's per-step examples stem exactly") {
    val vectors = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b + fixups
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // full cascades (the paper's showcase examples)
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // the famous cascades
      "generalizations" -> "gener", "oscillators" -> "oscil")
    vectors.foreach { case (in, want) =>
      val got = PorterStemmer.stem(in)
      assert(got == want, s"stem($in) = $got, want $want")
    }
  }

  test("contract: short words, non-ASCII, digits, mixed case pass through") {
    Seq("a", "is", "at", "Run", "RUNNING", "häuser", "x86", "a.b",
      "run-time", "123").foreach { w =>
      assert(PorterStemmer.stem(w) == w, s"$w must pass through unchanged")
    }
  }

  test("stemTokens transform and SQL face agree with the static stemmer; codegen'd") {
    val df = Seq((1L, "the ponies were running and hopping happily"))
      .toDF("id", "text")
    val out = df.select(
      graft.operators.TextAnalysis.stemTokens(col("text")).as("stems"))
    assert(out.collect().head.getSeq[String](0) ==
      Seq("the", "poni", "were", "run", "and", "hop", "happili"))
    // SQL face
    graft.sql.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_porter_stem('generalizations') AS s")
      .collect().head.getString(0) == "gener")
    // codegen: the projection keeps its star (PorterStem has doGenCode);
    // a non-foldable child so the optimizer can't constant-fold it away
    val ranged = spark.range(4).select(PorterStem(
      when(col("id") % 2 === 0, "running").otherwise("ponies")).as("s"))
    assert(ranged.collect().map(_.getString(0)).toSet == Set("run", "poni"))
    val plan = ranged.queryExecution.executedPlan.toString
    val line = plan.linesIterator
      .find(_.contains("graft_porter_stem")).getOrElse("")
    assert(line.replaceFirst("^[\\s+-]*", "").startsWith("*("),
      s"stem projection not codegen'd:\n$plan")
  }
}
