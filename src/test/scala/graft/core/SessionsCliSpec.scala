package graft.core

import java.io.ByteArrayOutputStream

import graft.SparkTestBase
import graft.operators.DataFrameUtils

class SessionsCliSpec extends SparkTestBase {
  import spark.implicits._

  test("environment detection keys off well-known env vars") {
    assert(Sessions.detectEnvironment(Map.empty) == Sessions.Local)
    assert(Sessions.detectEnvironment(
      Map("DATABRICKS_RUNTIME_VERSION" -> "15.4")) == Sessions.Databricks)
    assert(Sessions.detectEnvironment(
      Map("FABRIC_WORKSPACE" -> "x")) == Sessions.Fabric)
    assert(Sessions.detectEnvironment(
      Map("SYNAPSE_POOL" -> "x")) == Sessions.Fabric)
  }

  test("ensureColumns passes through or fails with the missing names") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(DataFrameUtils.ensureColumns(df, Seq("id", "name")) eq df)
    val e = intercept[IllegalArgumentException] {
      DataFrameUtils.ensureColumns(df, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("preview returns rows and schema text") {
    val out = DataFrameUtils.preview(Seq((1, "a"), (2, "b")).toDF("id", "name"), 1)
    assert(out.contains("[1,a]") && out.contains("schema=struct<id:int,name:string>"))
  }

  test("enableSparkLogging sets the session log level and categories") {
    graft.obs.Logging.enableSparkLogging(spark, "info")
    val logger =
      org.apache.logging.log4j.LogManager.getLogger("org.apache.spark.storage")
    assert(logger.getLevel == org.apache.logging.log4j.Level.INFO)
    // restore the quiet test default
    spark.sparkContext.setLogLevel("WARN")
    graft.obs.Logging.enableSparkLogging(spark, "WARN")
  }

  test("CLI lists the registered datasource formats") {
    val buf = new ByteArrayOutputStream()
    Console.withOut(buf) { graft.tools.Cli.main(Array("datasources")) }
    val out = buf.toString
    Seq("graft-rest", "graft-sparql", "graft-qdrant", "graft-warc").foreach { f =>
      assert(out.contains(f), s"missing $f in:\n$out")
    }
  }

  test("CLI shards audit prints manifest balance without a data scan") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cli_sh_").toString
    val docs = (1L to 100L).map(i => (i, 10L + i % 30)).toDF("doc_id", "n_tok")
    graft.operators.Packing.writeShards(docs, s"$root/out", "doc_id", "n_tok",
      numShards = 3)
    val buf = new ByteArrayOutputStream()
    Console.withOut(buf) {
      graft.tools.Cli.main(Array("shards", "--path", s"$root/out"))
    }
    val out = buf.toString
    assert(out.contains("num_shards=3") && out.contains("total_tokens="))
    assert((0 to 2).forall(s => out.contains(s"shard=$s")), s"got:\n$out")
  }

  test("factory sessions carry the SQL surface") {
    val s = Sessions.createSession("graft-test") // getOrCreate + register
    val v = s.sql("SELECT graft_sumsq(array(3.0d, 4.0d)) AS ss")
      .collect()(0).getDouble(0)
    assert(v == 25.0)
  }
}
