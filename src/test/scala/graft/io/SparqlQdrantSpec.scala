package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase

/** SPARQL + Qdrant DSv2 connectors e2e against in-process HTTP fixtures
  * (mirrors tests/io/test_sparql.py and tests/io/test_qdrant.py).
  */
class SparqlQdrantSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val requests = new ConcurrentLinkedQueue[String]()
  private val upserts = new ConcurrentLinkedQueue[String]()
  @volatile private var collectionExists = false
  @volatile private var createdCollection: String = null

  private def respond(ex: HttpExchange, body: String, status: Int = 200): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val selectPayload =
    """{"head": {"vars": ["name", "population", "species"]},
      | "results": {"bindings": [
      |   {"name": {"type": "literal", "value": "Earth", "xml:lang": "en"},
      |    "population": {"type": "literal", "value": "8000000000",
      |      "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
      |    "species": {"type": "uri", "value": "http://ex/human"}},
      |   {"name": {"type": "literal", "value": "Mars", "xml:lang": "en"},
      |    "population": {"type": "literal", "value": "0",
      |      "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
      |    "species": {"type": "uri", "value": "http://ex/robot"}}
      | ]}}""".stripMargin

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    server.createContext("/sparql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      requests.add(s"${ex.getRequestMethod} /sparql auth=$auth body=$body " +
        s"q=${Option(ex.getRequestURI.getQuery).getOrElse("")}")
      val text = body + Option(ex.getRequestURI.getQuery).getOrElse("")
      if (text.contains("ASK")) respond(ex, """{"boolean": true}""")
      else respond(ex, selectPayload)
    })

    // Qdrant scroll: two pages
    server.createContext("/collections/things/points/scroll", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      requests.add(s"scroll $body")
      val page2 = body.contains("\"offset\"")
      val points =
        if (!page2)
          """[{"id": 1, "vector": [0.1, 0.2], "payload": {"name": "a"}},
            | {"id": 2, "vector": [0.3, 0.4], "payload": {"name": "b"}}]""".stripMargin
        else """[{"id": 3, "vector": [0.5, 0.6], "payload": {"name": "c"}}]"""
      val next = if (!page2) """, "next_page_offset": 3""" else ""
      respond(ex,
        s"""{"status": "ok", "result": {"points": $points$next}}""")
    })

    // Qdrant sharded collection: per-shard scroll (s1 pages twice, s2
    // once); an unkeyed scroll sees the union — the single-partition
    // equivalence fixture
    server.createContext("/collections/sharded/points/scroll", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      requests.add(s"shardscroll $body")
      def pt(id: Int, name: String) =
        s"""{"id": $id, "payload": {"name": "$name"}}"""
      val resp =
        if (body.contains("\"shard_key\":\"s1\"")) {
          if (!body.contains("\"offset\""))
            s"""{"status":"ok","result":{"points":[${pt(1, "a")}],
               | "next_page_offset": 2}}""".stripMargin
          else s"""{"status":"ok","result":{"points":[${pt(2, "b")}]}}"""
        } else if (body.contains("\"shard_key\":\"s2\""))
          s"""{"status":"ok","result":{"points":[${pt(3, "c")}]}}"""
        else
          s"""{"status":"ok","result":{"points":
             | [${pt(1, "a")}, ${pt(2, "b")}, ${pt(3, "c")}]}}""".stripMargin
      respond(ex, resp)
    })

    // Qdrant collection check/create + upsert for the write path
    server.createContext("/collections/newcol", (ex: HttpExchange) => {
      ex.getRequestURI.getPath match {
        case "/collections/newcol/points" =>
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          upserts.add(s"${ex.getRequestMethod} $body")
          respond(ex, """{"status": "ok", "result": {}}""")
        case "/collections/newcol" =>
          ex.getRequestMethod match {
            case "GET" =>
              if (collectionExists) respond(ex, """{"status":"ok","result":{}}""")
              else respond(ex, """{"status":{"error":"not found"}}""", 404)
            case "PUT" =>
              createdCollection =
                new String(ex.getRequestBody.readAllBytes(), "UTF-8")
              collectionExists = true
              respond(ex, """{"status":"ok","result":true}""")
            case _ => respond(ex, "{}", 405)
          }
        case _ => respond(ex, "{}", 404)
      }
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("SPARQL SELECT with metadata columns, coercion, POST form, basic auth") {
    val df = spark.read.format("graft-sparql")
      .option("graft.sparql.config",
        s"""{"endpoint": "$base/sparql",
           | "queries": "SELECT ?name ?population ?species WHERE { }",
           | "include_metadata": true, "auth": ["user", "pass"]}""".stripMargin)
      .load()
    assert(df.schema("population").dataType.typeName == "long")
    assert(df.schema("name__xml:lang").dataType.typeName == "string")
    val rows = df.orderBy("name").collect()
    assert(rows.length == 2)
    val earth = rows.head
    assert(earth.getAs[String]("name") == "Earth")
    assert(earth.getAs[Long]("population") == 8000000000L)
    assert(earth.getAs[String]("name__xml:lang") == "en")
    assert(earth.getAs[String]("population__datatype")
      == "http://www.w3.org/2001/XMLSchema#integer")
    // POST form with basic auth header
    assert(requests.asScala.exists(r => r.startsWith("POST /sparql")
      && r.contains("auth=Basic ") && r.contains("query=SELECT")))
  }

  test("SPARQL multi-query list unions results, one partition per query") {
    requests.clear()
    val df = spark.read.format("graft-sparql")
      .option("graft.sparql.config",
        s"""{"endpoint": "$base/sparql",
           | "queries": ["SELECT ?name WHERE { } # a",
           |             "SELECT ?name WHERE { } # b"]}""".stripMargin)
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4) // both queries return the 2 fixture rows
    val posts = requests.asScala.count(_.startsWith("POST /sparql"))
    assert(posts >= 2)
  }

  test("SPARQL ASK returns one boolean row; GET request mode") {
    val df = spark.read.format("graft-sparql")
      .option("graft.sparql.config",
        s"""{"endpoint": "$base/sparql", "queries": "ASK { }",
           | "request_type": "GET"}""".stripMargin)
      .load()
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[Boolean]("boolean"))
    assert(requests.asScala.exists(r =>
      r.startsWith("GET /sparql") && r.contains("q=query=ASK")))
  }

  test("Qdrant scroll read paginates and flattens points") {
    val df = spark.read.format("graft-qdrant")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things",
           | "with_vectors": true, "api_key": "sekret"}""".stripMargin)
      .load()
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    val payload = rows.head.getAs[org.apache.spark.sql.Row]("payload")
    assert(payload.getAs[String]("name") == "a")
    assert(rows.head.getSeq[Double](rows.head.fieldIndex("vector"))
      .toSeq == Seq(0.1, 0.2))
  }

  test("Qdrant sharded scroll: one partition per shard key, rows equal the single-partition read") {
    requests.clear()
    val single = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "sharded"}""")
      .load()
    val sharded = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "sharded",
           | "shard_keys": ["s1", "s2"]}""".stripMargin)
      .load()
    assert(single.rdd.getNumPartitions == 1)
    assert(sharded.rdd.getNumPartitions == 2,
      "one input partition per shard key")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val shardedRows = rows(sharded)
    assert(shardedRows == rows(single),
      "sharded read must return exactly the single-partition rows")
    assert(shardedRows.length == 3)
    // each shard's cursor carried its key server-side; s1 paged twice
    val scrolls = requests.toArray.map(_.toString)
      .filter(_.startsWith("shardscroll"))
    assert(scrolls.count(_.contains("\"shard_key\":\"s1\"")) == 2)
    assert(scrolls.count(_.contains("\"shard_key\":\"s2\"")) == 1)
    // a pushed limit is declined on sharded scans (it would multiply per
    // partition) — Spark's own Limit produces the exact row count
    assert(sharded.limit(2).count() == 2)
    // duplicate shard keys would duplicate rows: loud
    intercept[Exception] {
      spark.read.format("graft-qdrant")
        .schema("id LONG")
        .option("graft.qdrant.config",
          s"""{"endpoint": "$base", "collection": "sharded",
             | "shard_keys": ["s1", "s1"]}""".stripMargin)
        .load().collect()
    }
  }

  test("Qdrant read respects client-side limit") {
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things", "limit": 2}""")
      .load()
    assert(df.count() == 2)
  }

  test("Qdrant scan pushes Spark's limit and column pruning to the server") {
    requests.clear()
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG, vector ARRAY<DOUBLE>, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things",
           | "with_vectors": true}""".stripMargin)
      .load()
    val got = df.select("id").limit(2).collect()
    assert(got.length == 2)
    val scrolls = requests.toArray.map(_.toString).filter(_.startsWith("scroll"))
    assert(scrolls.length == 1, s"expected one page, got:\n${scrolls.mkString("\n")}")
    // the pruned projection (id only) turns off both server-side fetches,
    // and the pushed limit caps the page size
    assert(scrolls.head.contains("\"limit\":2"))
    assert(scrolls.head.contains("\"with_payload\":false"))
    assert(scrolls.head.contains("\"with_vectors\":false"))
  }

  test("Qdrant scan translates Catalyst filters into the scroll body") {
    requests.clear()
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things"}""")
      .load()
    val rows = df.filter(org.apache.spark.sql.functions.col("payload.name") === "a")
      .collect()
    // server saw the translated condition; Spark still re-applied the
    // predicate, so the (filter-ignoring) fixture's extra rows are dropped
    assert(rows.length == 1 && rows.head.getAs[Long]("id") == 1L)
    val scroll = requests.asScala.find(_.startsWith("scroll")).get
    // the equality itself plus Spark's implied IsNotNull both reach the server
    assert(scroll.contains("""{"key":"name","match":{"value":"a"}}"""), scroll)
    assert(scroll.contains(""""must_not":[{"is_null":{"key":"name"}}]"""), scroll)
  }

  test("Qdrant IS NULL pushes is_empty (is_null would drop missing-key points)") {
    requests.clear()
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things"}""")
      .load()
    // Qdrant's is_null matches only keys PRESENT with a null value; this
    // connector's writer strips nulls, so Spark-null fields are MISSING
    // keys server-side. is_empty covers missing ∪ null ∪ [] — a superset
    // the residual Spark filter trims; the fixture ignores filters and the
    // residual drops every named row, proving re-application.
    val rows = df.filter(
      org.apache.spark.sql.functions.col("payload.name").isNull).collect()
    assert(rows.isEmpty)
    val scroll = requests.asScala.find(_.startsWith("scroll")).get
    assert(scroll.contains(""""is_empty":{"key":"name"}"""), scroll)
    assert(!scroll.contains(""""is_null":{"key":"name"}}"""), scroll)
  }

  test("Qdrant id IN pushes has_id and merges with a config filter") {
    requests.clear()
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things",
           | "filter": {"must": [{"key": "kept", "match": {"value": true}}]}}"""
          .stripMargin)
      .load()
    val ids = df.filter(org.apache.spark.sql.functions.col("id").isin(1L, 3L))
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(ids == Seq(1L, 3L))
    val scroll = requests.asScala.find(_.startsWith("scroll")).get
    // config-supplied must condition survives, pushed has_id appended
    assert(scroll.contains(""""key":"kept""""), scroll)
    assert(scroll.contains(""""has_id":[1,3]"""), scroll)
  }

  test("Qdrant leaves untranslatable predicates entirely Spark-side") {
    requests.clear()
    val df = spark.read.format("graft-qdrant")
      .schema("id LONG, payload STRUCT<name: STRING>")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "things"}""")
      .load()
    // string range: Qdrant ranges are numeric-only, so the comparison stays
    // Spark-side (only the implied IsNotNull reaches the server)
    val rows = df.filter(org.apache.spark.sql.functions.col("payload.name") >= "b")
      .collect()
    assert(rows.map(_.getAs[Long]("id")).sorted.toSeq == Seq(2L, 3L))
    val scroll = requests.asScala.find(_.startsWith("scroll")).get
    assert(!scroll.contains(""""range""""), scroll)
  }

  test("SPARQL streaming read re-runs the query per micro-batch") {
    val out = java.nio.file.Files.createTempDirectory("graft_sp_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sp_ck_").toString
    val q = spark.readStream.format("graft-sparql")
      .schema("name STRING, population LONG, species STRING")
      .option("graft.sparql.config",
        s"""{"endpoint": "$base/sparql", "queries": "SELECT 1"}""")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination(60000)
    val rows = spark.read.parquet(out).collect()
    assert(rows.map(_.getAs[String]("name")).sorted.toSeq == Seq("Earth", "Mars"))
  }

  test("Qdrant streaming read performs one full scroll per micro-batch") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_qd_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_qd_ck_").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-qdrant")
        .schema("id LONG")
        .option("graft.qdrant.config",
          s"""{"endpoint": "$base", "collection": "things"}""")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).select("id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L, 3L))
    // restart from the same checkpoint: the poll offset advances past the
    // committed one and the second poll re-scrolls (at-least-once contract)
    runOnce()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("Qdrant write batches points and auto-creates the collection") {
    import spark.implicits._
    collectionExists = false
    upserts.clear()
    val df = (1 to 5).map(i => (i.toLong, Array(0.1f * i, 0.2f * i), s"n$i"))
      .toDF("id", "vector", "name").coalesce(1)
    df.write.format("graft-qdrant")
      .option("graft.qdrant.config",
        s"""{"endpoint": "$base", "collection": "newcol", "batch_size": 2}""")
      .mode("append").save()
    // collection created with vector size derived from first point
    assert(createdCollection != null && createdCollection.contains("\"size\":2"))
    // 5 points in batches of 2 → 3 upsert requests
    assert(upserts.size == 3)
    val first = upserts.asScala.head
    assert(first.startsWith("PUT") && first.contains("\"points\":")
      && first.contains("\"payload\":{\"name\":\"n1\"}"))
  }
}
