package graft.io.rest

import scala.collection.mutable

import com.fasterxml.jackson.databind.JsonNode

import graft.io.{Http, Json}

/** REST connector core: config, work-item planning, and the three
  * pagination fetchers. Pure JVM — shared by the DSv2 glue in
  * [[RestApiConnector]].
  *
  * Reference semantics: src/spark_fuse/io/rest_api.py — resolved config
  * (:317-385), work items (:388-445), page values (:88-114), fetchers
  * (:150-289), chunking (:448-456).
  */
object RestApi {

  val ConfigOption = "graft.rest.config"
  val SchemaOption = "graft.rest.schema"

  final case class Config(
      sources: Seq[String],
      params: Map[String, Any],
      pagination: Option[Map[String, Any]],
      recordsField: Option[Seq[String]],
      requestType: String,
      bodyJson: Option[String], // pre-serialized body ("json" kwarg)
      bodyForm: Option[Map[String, Any]], // "data"/form kwarg
      bodyRaw: Option[String], // "content"/raw kwarg
      headers: Map[String, String],
      timeout: Double,
      maxRetries: Int,
      backoffFactor: Double,
      includeResponsePayload: Boolean,
      responsePayloadField: Option[String],
      parallelism: Int,
      inferSchema: Boolean,
      inferMaxRecords: Int)

  object Config {

    private[rest] def asPath(v: Any): Option[Seq[String]] = v match {
      case null | None => None
      case s: String if s.trim.isEmpty => None
      case s: String => Some(s.trim.split("\\.").toSeq)
      case s: Seq[_] => Some(s.map(_.toString))
      case other => Some(Seq(other.toString))
    }

    def fromJson(raw: String): Config = {
      val node = Json.parse(raw)
      val data = Json.nodeToScala(node).asInstanceOf[Map[String, Any]]
      val sources = data.getOrElse("sources", Seq.empty) match {
        case s: String => Seq(s)
        case s: Seq[_] => s.map(_.toString)
        case null => Seq.empty
        case other => throw new IllegalArgumentException(
          s"sources must be a string or a sequence of URLs, got $other")
      }
      val params = data.get("params") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
        case _ => Map.empty[String, Any]
      }
      val pagination = data.get("pagination") match {
        case Some(m: Map[_, _]) => Some(m.map { case (k, v) => k.toString -> v })
        case Some(null) | None => None
        case Some(other) => throw new IllegalArgumentException(
          s"pagination configuration must be a mapping when provided, got $other")
      }
      val requestKwargs = data.get("request_kwargs") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
        case _ => Map.empty[String, Any]
      }
      val headers = data.get("headers") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
        case _ => Map.empty[String, String]
      }
      val bodyJson = requestKwargs.get("json").map(Json.toJson)
      val bodyForm = requestKwargs.get("data") match {
        case Some(m: Map[_, _]) => Some(m.map { case (k, v) => k.toString -> v })
        case _ => None
      }
      val bodyRaw = requestKwargs.get("content").map(_.toString)
        .orElse(requestKwargs.get("data") match {
          case Some(s: String) => Some(s)
          case _ => None
        })
      def num(key: String, default: Double): Double =
        data.get(key).filter(_ != null) // explicit JSON null -> default
          .map(v => v.toString.toDouble).getOrElse(default)
      Config(
        sources = sources,
        params = params,
        pagination = pagination,
        recordsField = asPath(data.getOrElse("records_field", null)),
        requestType = data.getOrElse("request_type", "GET").toString.toUpperCase,
        bodyJson = bodyJson,
        bodyForm = bodyForm,
        bodyRaw = bodyRaw,
        headers = headers,
        timeout = num("timeout", 30.0),
        maxRetries = num("max_retries", 3).toInt,
        backoffFactor = num("backoff_factor", 0.5),
        includeResponsePayload =
          data.getOrElse("include_response_payload", false) == true,
        responsePayloadField =
          data.get("response_payload_field").filter(_ != null).map(_.toString),
        parallelism = math.max(num("parallelism", math.max(sources.length, 1)).toInt, 1),
        inferSchema = data.getOrElse("infer_schema", true) != false,
        inferMaxRecords = num("infer_max_records", 1000).toInt)
    }
  }

  /** Serializable unit of fetch work. */
  sealed trait WorkItem extends Serializable
  final case class SingleUrl(url: String) extends WorkItem
  final case class TokenPaged(
      url: String,
      baseParams: Map[String, String],
      tokenParam: String,
      tokenField: Seq[String],
      maxPages: Option[Int]) extends WorkItem
  final case class ResponsePaged(
      url: String,
      nextField: Option[Seq[String]],
      maxPages: Option[Int]) extends WorkItem

  private def asIntOpt(v: Option[Any]): Option[Int] =
    v.filter(_ != null).map(x => x.toString.toDouble.toInt)

  /** Page-number expansion (rest_api.py:88-114): explicit values, else
    * start/step bounded by stop and/or maxPages.
    */
  def iterPageValues(pagination: Map[String, Any]): Seq[Any] =
    pagination.get("values").filter(_ != null) match {
      case Some(vs: Seq[_]) => vs
      case _ =>
        val start = asIntOpt(pagination.get("start")).getOrElse(1)
        val stop = asIntOpt(pagination.get("stop"))
        val step = asIntOpt(pagination.get("step")).getOrElse(1)
        val maxPages = asIntOpt(pagination.get("max_pages"))
        require(stop.isDefined || maxPages.isDefined,
          "query pagination requires 'stop', 'max_pages', or explicit 'values'")
        // step=0 with only 'stop' set would never advance toward the bound
        // and loop forever (a step of the wrong sign terminates at once via
        // the stop check below, yielding zero pages — harmless).
        require(step != 0, "query pagination 'step' must be non-zero")
        val out = mutable.ArrayBuffer[Any]()
        var value = start
        var count = 0
        var done = false
        while (!done) {
          if (maxPages.exists(count >= _)) done = true
          else if (stop.exists(s => (step > 0 && value > s) || (step < 0 && value < s)))
            done = true
          else {
            out += value
            count += 1
            value += step
          }
        }
        out.toSeq
    }

  /** Work-item planning (rest_api.py:388-445). */
  def planWorkItems(config: Config): Seq[WorkItem] = {
    require(config.sources.nonEmpty, "REST connector requires at least one source URL")
    // multi-URL fan-out must carry config.params too — the single-source
    // branches below all merge them, and dropping them here would send
    // e.g. api_key-less requests that fail into empty partitions
    if (config.sources.length > 1)
      return config.sources.map(u => SingleUrl(Http.mergeQueryParams(u, config.params)))
    val baseUrl = config.sources.head
    config.pagination match {
      case Some(p) =>
        val mode = p.getOrElse("mode", "query").toString.toLowerCase
        val extraParams: Map[String, Any] = {
          val base = p.get("extra_params") match {
            case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
            case _ => Map.empty[String, Any]
          }
          (p.get("page_size_param").filter(_ != null), p.get("page_size")) match {
            case (Some(psp), Some(ps)) => base + (psp.toString -> ps)
            case _ => base
          }
        }
        mode match {
          case "query" | "page" =>
            val pageParam = p.getOrElse("param", "page").toString
            iterPageValues(p).map { v =>
              SingleUrl(Http.mergeQueryParams(baseUrl,
                config.params ++ extraParams + (pageParam -> v)))
            }
          case "token" | "cursor" =>
            val tokenParam = p.get("param").filter(_ != null).map(_.toString)
              .getOrElse(throw new IllegalArgumentException(
                "token pagination requires 'param'"))
            val field = Config.asPath(p.getOrElse("field", null))
              .getOrElse(throw new IllegalArgumentException(
                "token pagination requires 'field'"))
            val baseParams = (config.params ++ extraParams)
              .map { case (k, v) => k -> String.valueOf(v) } ++
              p.get("start").filter(_ != null).map(s => tokenParam -> String.valueOf(s))
            Seq(TokenPaged(baseUrl, baseParams, tokenParam, field,
              asIntOpt(p.get("max_pages"))))
          case "response" | "link" =>
            Seq(ResponsePaged(Http.mergeQueryParams(baseUrl, config.params),
              Config.asPath(p.getOrElse("field", null)), asIntOpt(p.get("max_pages"))))
          case other =>
            throw new IllegalArgumentException(s"Unsupported pagination mode: $other")
        }
      case None => Seq(SingleUrl(Http.mergeQueryParams(baseUrl, config.params)))
    }
  }

  /** Chunk work items into ceil(n/parallelism)-sized partitions
    * (rest_api.py:448-456).
    */
  def chunkWorkItems(items: Seq[WorkItem], parallelism: Int): Seq[Seq[WorkItem]] = {
    if (items.isEmpty) return Seq.empty
    val p = math.max(parallelism, 1)
    val chunkSize = math.max(math.ceil(items.length.toDouble / p).toInt, 1)
    items.grouped(chunkSize).toSeq
  }

  private def httpSpec(config: Config, url: String): Http.Spec = {
    val (body, contentType) =
      if (config.requestType == "POST") {
        config.bodyJson.map(b => (Some(b), Some("application/json")))
          .orElse(config.bodyForm.map(f =>
            (Some(Http.formEncode(f)), Some("application/x-www-form-urlencoded"))))
          .orElse(config.bodyRaw.map(r => (Some(r), None)))
          .getOrElse((None, None))
      } else (None, None)
    Http.Spec(config.requestType, url, config.headers, body, contentType,
      config.timeout, config.maxRetries, config.backoffFactor)
  }

  /** Records of one payload, with optional raw-payload column value. */
  private def payloadRecords(config: Config, payload: JsonNode): Iterator[JsonNode] = {
    val records = Json.extractRecords(payload, config.recordsField)
    (config.includeResponsePayload, config.responsePayloadField) match {
      case (true, Some(field)) =>
        records.iterator.map { r =>
          // copy: the record is a child of the payload, so attaching the
          // payload in place would create a cycle
          val obj =
            if (r.isObject)
              r.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
            else {
              val o = Json.mapper.createObjectNode()
              o.set[com.fasterxml.jackson.databind.node.ObjectNode]("value", r)
              o
            }
          obj.set[com.fasterxml.jackson.databind.node.ObjectNode](field, payload)
          obj
        }
      case _ => records.iterator
    }
  }

  /** Execute one work item, yielding record nodes. Exhausted retries on a
    * page → that page contributes nothing (single) or stops the walk
    * (paged), matching the reference's `payload is None` handling.
    */
  def fetchItem(config: Config, item: WorkItem): Iterator[JsonNode] = item match {
    case SingleUrl(url) =>
      Http.requestWithRetry(httpSpec(config, url)) match {
        case Some(body) => payloadRecords(config, Json.parse(body))
        case None => Iterator.empty
      }

    case ResponsePaged(startUrl, nextField, maxPages) =>
      new Iterator[JsonNode] {
        private var currentUrl: Option[String] = Some(startUrl)
        private var page = 0
        private var buffer: Iterator[JsonNode] = Iterator.empty
        private def advance(): Unit = {
          while (!buffer.hasNext && currentUrl.isDefined) {
            page += 1
            if (maxPages.exists(page > _)) { currentUrl = None }
            else {
              val url = currentUrl.get
              Http.requestWithRetry(httpSpec(config, url)) match {
                case None => currentUrl = None
                case Some(body) =>
                  val payload = Json.parse(body)
                  buffer = payloadRecords(config, payload)
                  val nextVal = nextField.flatMap(f => Json.getNested(payload, f))
                  currentUrl = nextVal match {
                    case Some(n) if n.isTextual && n.asText.nonEmpty =>
                      val next = n.asText
                      if (next.startsWith("http://") || next.startsWith("https://"))
                        Some(next)
                      else Some(java.net.URI.create(url).resolve(next).toString)
                    case _ => None
                  }
              }
            }
          }
        }
        def hasNext: Boolean = { advance(); buffer.hasNext }
        def next(): JsonNode = { advance(); buffer.next() }
      }

    case TokenPaged(baseUrl, baseParams, tokenParam, tokenField, maxPages) =>
      new Iterator[JsonNode] {
        private var token: Option[String] = baseParams.get(tokenParam).filter(_.nonEmpty)
        private var page = 0
        private var done = false
        private var buffer: Iterator[JsonNode] = Iterator.empty
        private def advance(): Unit = {
          while (!buffer.hasNext && !done) {
            page += 1
            if (maxPages.exists(page > _)) done = true
            else {
              val params = token match {
                case Some(t) => baseParams + (tokenParam -> t)
                case None => baseParams - tokenParam
              }
              val url = Http.mergeQueryParams(baseUrl,
                params.map { case (k, v) => (k, v: Any) })
              Http.requestWithRetry(httpSpec(config, url)) match {
                case None => done = true
                case Some(body) =>
                  val payload = Json.parse(body)
                  buffer = payloadRecords(config, payload)
                  Json.getNested(payload, tokenField) match {
                    case Some(n) if !n.isNull && n.asText.nonEmpty =>
                      token = Some(n.asText)
                    case _ => done = true
                  }
              }
            }
          }
        }
        def hasNext: Boolean = { advance(); buffer.hasNext }
        def next(): JsonNode = { advance(); buffer.next() }
      }
  }

  /** All records across a set of items (executor-side partition read). */
  def fetchItems(config: Config, items: Seq[WorkItem]): Iterator[JsonNode] =
    items.iterator.flatMap(item => fetchItem(config, item))
}
