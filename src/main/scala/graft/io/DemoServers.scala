package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Self-contained deterministic HTTP fixtures so the connectors can be
  * exercised end-to-end inside `SparkEntry.queries` (zero-egress harness:
  * everything binds 127.0.0.1). Servers run on daemon executors and live
  * for the JVM's lifetime — each call starts a fresh ephemeral-port server.
  */
object DemoServers {

  private def respond(ex: HttpExchange, body: String, status: Int = 200): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def start(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv =>
        val p = kv.split("=", 2)
        p(0) -> java.net.URLDecoder.decode(p.lift(1).getOrElse(""), "UTF-8")
      }.toMap

  /** Paged REST endpoint: /items?page=N (1..3), 3 records per page. */
  def restServer(): String = {
    val server = start()
    server.createContext("/items", (ex: HttpExchange) => {
      val page = query(ex).getOrElse("page", "1").toInt
      val recs = (1 to 3).map { i =>
        val id = page * 100 + i
        s"""{"id": $id, "name": "item$id", "score": ${id % 7}}"""
      }.mkString("[", ",", "]")
      respond(ex, s"""{"data": $recs, "meta": {"page": $page}}""")
    })
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  /** SPARQL endpoint returning a fixed 3-binding SELECT result. */
  def sparqlServer(): String = {
    val server = start()
    val payload =
      """{"head": {"vars": ["city", "population"]},
        | "results": {"bindings": [
        |  {"city": {"type": "literal", "value": "Berlin"},
        |   "population": {"type": "literal", "value": "3700000",
        |     "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
        |  {"city": {"type": "literal", "value": "Paris"},
        |   "population": {"type": "literal", "value": "2100000",
        |     "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
        |  {"city": {"type": "literal", "value": "Madrid"},
        |   "population": {"type": "literal", "value": "3200000",
        |     "datatype": "http://www.w3.org/2001/XMLSchema#integer"}}
        | ]}}""".stripMargin
    server.createContext("/sparql", (ex: HttpExchange) => respond(ex, payload))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  /** Minimal in-memory Qdrant: upsert + scroll for one collection. */
  def qdrantServer(): String = {
    val server = start()
    val store = new ConcurrentHashMap[Long, (Seq[Double], String)]()
    server.createContext("/collections/demo", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      path match {
        case "/collections/demo/points" =>
          val node = Json.parse(body)
          val points = Option(node.get("points")).filter(_.isArray)
          points match {
            case Some(arr) =>
              arr.forEach { p =>
                val id = p.get("id").asLong
                val vec = {
                  val b = Seq.newBuilder[Double]
                  p.get("vector").forEach(v => b += v.asDouble)
                  b.result()
                }
                val name = Option(p.get("payload"))
                  .flatMap(pl => Option(pl.get("name"))).map(_.asText).getOrElse("")
                store.put(id, (vec, name))
              }
              respond(ex, """{"status": "ok", "result": {}}""")
            case None =>
              respond(ex, """{"status": {"error": "missing field `points`"}}""", 400)
          }
        case "/collections/demo/points/scroll" =>
          import scala.jdk.CollectionConverters._
          val offset = {
            val n = Json.parse(if (body.isEmpty) "{}" else body).get("offset")
            if (n == null || n.isNull) 0L else n.asLong
          }
          val all = store.asScala.toSeq.sortBy(_._1)
          val pageItems = all.filter(_._1 >= offset).take(2)
          val next = all.map(_._1).find(id => id > pageItems.map(_._1).maxOption.getOrElse(Long.MaxValue - 1))
          val pts = pageItems.map { case (id, (vec, name)) =>
            s"""{"id": $id, "vector": ${vec.mkString("[", ",", "]")},
               | "payload": {"name": "$name"}}""".stripMargin
          }.mkString("[", ",", "]")
          val nextPart = next.map(n => s""", "next_page_offset": $n""").getOrElse("")
          respond(ex, s"""{"status": "ok", "result": {"points": $pts$nextPart}}""")
        case "/collections/demo" =>
          respond(ex, """{"status": "ok", "result": {}}""")
        case _ => respond(ex, "{}", 404)
      }
    })
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }
}
