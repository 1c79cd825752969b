package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase

/** REST DSv2 connector e2e against an in-process HTTP server (mirrors the
  * reference's threaded mock-server tests, tests/io/test_rest_api.py).
  */
class RestApiConnectorSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val requests = new ConcurrentLinkedQueue[String]()

  private def respond(ex: HttpExchange, body: String, status: Int = 200): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv => val p = kv.split("=", 2); p(0) -> java.net.URLDecoder.decode(p.lift(1).getOrElse(""), "UTF-8") }
      .toMap

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // query pagination: /paged?page=N → 2 pages of 2 records
    server.createContext("/paged", (ex: HttpExchange) => {
      requests.add(ex.getRequestURI.toString)
      val page = query(ex).getOrElse("page", "1").toInt
      val body =
        s"""{"data": [{"id": ${page * 10 + 1}, "name": "r${page * 10 + 1}"},
           |          {"id": ${page * 10 + 2}, "name": "r${page * 10 + 2}"}],
           | "meta": {"page": $page}}""".stripMargin
      respond(ex, body)
    })

    // link pagination: /linked?p=N with relative next link until p=3
    server.createContext("/linked", (ex: HttpExchange) => {
      requests.add(ex.getRequestURI.toString)
      val p = query(ex).getOrElse("p", "1").toInt
      val next = if (p < 3) s""", "next": "/linked?p=${p + 1}"""" else ""
      respond(ex, s"""{"results": [{"name": "item$p", "url": "/thing/$p"}]$next}""")
    })

    // token pagination: /tokened?after=T — 3 pages keyed by token
    server.createContext("/tokened", (ex: HttpExchange) => {
      requests.add(ex.getRequestURI.toString)
      val after = query(ex).get("after")
      val (ids, nextTok) = after match {
        case None => (Seq(1, 2), """, "paging": {"next": {"after": 20}}""")
        case Some("20") => (Seq(21, 22), """, "paging": {"next": {"after": 40}}""")
        case Some("40") => (Seq(41), "")
        case _ => (Seq.empty[Int], "")
      }
      val recs = ids.map(i => s"""{"id": $i}""").mkString("[", ",", "]")
      respond(ex, s"""{"results": $recs$nextTok}""")
    })

    // POST search with body echo + raw payload column
    server.createContext("/search", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      requests.add(s"POST /search $body")
      respond(ex, """{"results": [{"id": 7, "term": "fuse"}], "total": 1}""")
    })

    // multi-source fan-out
    server.createContext("/src", (ex: HttpExchange) => {
      requests.add(ex.getRequestURI.toString)
      val n = ex.getRequestURI.getPath.stripPrefix("/src/")
      respond(ex, s"""[{"id": $n}]""")
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def load(configJson: String) =
    spark.read.format("graft-rest")
      .option("graft.rest.config", configJson)
      .load()

  test("query pagination expands pages into parallel single fetches") {
    val df = load(
      s"""{"sources": "$base/paged",
         | "pagination": {"mode": "query", "param": "page", "start": 1, "stop": 2},
         | "records_field": "data", "parallelism": 2}""".stripMargin)
    val rows = df.select("id", "name").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
    assert(rows == Set((11L, "r11"), (12L, "r12"), (21L, "r21"), (22L, "r22")))
    assert(df.rdd.getNumPartitions == 2)
  }

  test("response/link pagination follows relative next links") {
    val df = load(
      s"""{"sources": "$base/linked?p=1",
         | "pagination": {"mode": "response", "field": "next"},
         | "records_field": "results"}""".stripMargin)
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("item1", "item2", "item3"))
  }

  test("token pagination follows cursor field across pages") {
    val df = load(
      s"""{"sources": "$base/tokened",
         | "pagination": {"mode": "token", "param": "after",
         |                "field": "paging.next.after"},
         | "records_field": "results"}""".stripMargin)
    val ids = df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 21L, 22L, 41L))
  }

  test("pushed limit stops token pagination early and prunes columns") {
    val df = load(
      s"""{"sources": "$base/tokened",
         | "pagination": {"mode": "token", "param": "after",
         |                "field": "paging.next.after"},
         | "records_field": "results"}""".stripMargin)
    // inference at load() pages on the driver; only count the scan's requests
    requests.clear()
    // limit 2 is satisfied by the first page → no ?after= requests
    val two = df.select("id").limit(2).collect()
    assert(two.length == 2)
    val paged = requests.asScala.count(_.contains("after="))
    assert(paged == 0, s"limit should stop paging, saw $paged paged requests")
    val plan = df.select("id").limit(2).queryExecution.executedPlan.toString
    assert(plan.contains("limit=2"), plan)
    assert(plan.contains("cols=id"), plan)
  }

  test("POST body with raw response payload column") {
    val df = load(
      s"""{"sources": "$base/search", "request_type": "POST",
         | "request_kwargs": {"json": {"term": "fuse"}},
         | "records_field": "results",
         | "include_response_payload": true,
         | "response_payload_field": "raw_payload"}""".stripMargin)
    val row = df.collect().head
    assert(row.getAs[Long]("id") == 7L)
    assert(row.getAs[String]("term") == "fuse")
    val raw = row.getAs[org.apache.spark.sql.Row]("raw_payload")
    assert(raw.getAs[Long]("total") == 1L)
    assert(requests.asScala.exists(r =>
      r.startsWith("POST /search") && r.contains(""""term":"fuse"""")))
  }

  test("multi-source fan-out with explicit schema skips inference") {
    val df = spark.read.format("graft-rest")
      .schema("id LONG")
      .option("graft.rest.config",
        s"""{"sources": ["$base/src/1", "$base/src/2", "$base/src/3"],
           | "parallelism": 3}""".stripMargin)
      .load()
    assert(df.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(df.rdd.getNumPartitions == 3)
  }

  test("streaming read polls the endpoint one micro-batch at a time") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rest_ckpt_").toString
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"name","type":"string","nullable":true,"metadata":{}}]}"""
        .stripMargin.replaceAll("\n", "")
    val out = java.nio.file.Files.createTempDirectory("graft_rest_out_").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-rest")
        .schema(org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .option("graft.rest.config",
          s"""{"sources": "$base/paged",
             | "pagination": {"mode": "query", "param": "page", "start": 1, "stop": 2},
             | "records_field": "data", "parallelism": 2}""".stripMargin)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
    assert(got == Set((11L, "r11"), (12L, "r12"), (21L, "r21"), (22L, "r22")))
    // restart from the same checkpoint: offsets advance, one more poll runs
    runOnce()
    assert(spark.read.parquet(out).count() == 8)
  }

  test("missing fields project to null; extra response fields dropped") {
    val df = spark.read.format("graft-rest")
      .schema("id LONG, name STRING, missing_col STRING")
      .option("graft.rest.config",
        s"""{"sources": "$base/paged?page=1", "records_field": "data"}""")
      .load()
    val r = df.collect().head
    assert(r.getAs[Long]("id") == 11L && r.getAs[String]("missing_col") == null)
  }
}
