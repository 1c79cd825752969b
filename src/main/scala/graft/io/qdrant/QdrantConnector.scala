package graft.io.qdrant

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{Http, Json}

/** Qdrant vector-collection connector: scroll-based read and batched
  * point-upsert write over the HTTP API.
  *
  * Reference semantics: src/spark_fuse/io/qdrant/ — scroll loop with
  * `next_page_offset` pagination, server-side filter, payload/vector
  * projection flags, client-side limit (reader.py:219-295); write batching
  * (128), payload-format fallbacks points→batch→flat-batch, PUT→POST
  * method fallback, collection auto-create from the first point
  * (writer.py:162-199, 388-509).
  */
object Qdrant {

  val ConfigOption = "graft.qdrant.config"
  val SchemaOption = "graft.qdrant.schema"
  val DefaultPageSize = 128

  final case class ReadConfig(
      endpoint: String,
      collection: String,
      apiKey: Option[String],
      headers: Map[String, String],
      timeout: Double,
      maxRetries: Int,
      backoffFactor: Double,
      withPayload: Any, // true/false/field list/filter map — forwarded verbatim
      withVectors: Any,
      includePayload: Boolean,
      includeVectors: Boolean,
      limit: Option[Int],
      pageSize: Int,
      maxPages: Option[Int],
      filter: Option[Map[String, Any]],
      offset: Option[Any],
      inferSchema: Boolean,
      inferMaxRecords: Int,
      /** Custom shard keys (`shard_keys` option) — when non-empty the
        * scan plans ONE PARTITION PER KEY, each scrolling only its
        * shard (Qdrant's `shard_key` scroll parameter, available on
        * custom-sharded collections). The single-cursor scroll is
        * inherently sequential; this is the one way to parallelize a
        * collection read, so a 100×-sized collection stops being a
        * single-threaded connector path. Empty → one partition (the
        * reference behavior, and the only option on default-sharded
        * collections).
        */
      shardKeys: Seq[Any] = Nil,
      /** The one shard this reader instance scrolls (runtime-internal:
        * set per input partition, never from user config).
        */
      shardKey: Option[Any] = None)

  object ReadConfig {
    def fromJson(raw: String): ReadConfig = {
      val data = Json.nodeToScala(Json.parse(raw)).asInstanceOf[Map[String, Any]]
      def num(key: String, default: Double): Double =
        data.get(key).filter(_ != null).map(_.toString.toDouble).getOrElse(default)
      val endpoint = data.getOrElse("endpoint",
        throw new IllegalArgumentException("Qdrant endpoint must be provided"))
        .toString.stripSuffix("/")
      require(endpoint.startsWith("http://") || endpoint.startsWith("https://"),
        "Qdrant endpoint must start with http:// or https://")
      val collection = data.getOrElse("collection", "").toString.trim
      require(collection.nonEmpty, "Qdrant collection name must be provided")

      // payload flag: None→true, bool, string→[s], list; vectors default false
      val withPayload = data.get("with_payload") match {
        case None | Some(null) => true
        case Some(b: Boolean) => b
        case Some(s: String) => if (s.trim.isEmpty) false else Seq(s.trim)
        case Some(s: Seq[_]) => s.map(_.toString)
        case Some(m: Map[_, _]) => m
        case Some(other) => other != false
      }
      val withVectors = data.get("with_vectors") match {
        case None | Some(null) => false
        case Some(b: Boolean) => b
        case Some(s: String) => if (s.trim.isEmpty) false else Seq(s.trim)
        case Some(s: Seq[_]) => s.map(_.toString)
        case Some(other) => other == true
      }
      val limit = data.get("limit").filter(_ != null).map(_.toString.toDouble.toInt)
      limit.foreach(l => require(l > 0, "limit must be positive when provided"))
      var pageSize = num("page_size", DefaultPageSize).toInt
      require(pageSize > 0, "page_size must be a positive integer")
      limit.foreach(l => pageSize = math.min(pageSize, l))
      val maxPages = data.get("max_pages").filter(_ != null).map(_.toString.toDouble.toInt)
      maxPages.foreach(m => require(m > 0, "max_pages must be positive when provided"))
      ReadConfig(
        endpoint = endpoint,
        collection = collection,
        apiKey = data.get("api_key").filter(_ != null).map(_.toString),
        headers = data.get("headers") match {
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
          case _ => Map.empty
        },
        timeout = num("timeout", 30.0),
        maxRetries = num("max_retries", 3).toInt,
        backoffFactor = num("backoff_factor", 0.5),
        withPayload = withPayload,
        withVectors = withVectors,
        includePayload = withPayload != false,
        includeVectors = withVectors != false,
        limit = limit,
        pageSize = pageSize,
        maxPages = maxPages,
        filter = data.get("filter") match {
          case Some(m: Map[_, _]) => Some(m.map { case (k, v) => k.toString -> v })
          case _ => None
        },
        offset = data.get("offset").filter(_ != null),
        inferSchema = data.getOrElse("infer_schema", true) != false,
        inferMaxRecords = num("infer_max_records", 1000).toInt,
        shardKeys = data.get("shard_keys") match {
          case Some(s: Seq[_]) =>
            val keys = s.filter(_ != null)
            require(keys.distinct.length == keys.length,
              "shard_keys must be distinct — a repeated key would scroll " +
                "its shard twice and duplicate every row in it")
            keys
          case Some(null) | None => Nil
          case Some(v) => Seq(v)
        })
    }
  }

  def scrollUrl(c: ReadConfig): String =
    s"${c.endpoint}/collections/${c.collection}/points/scroll"

  /** One input partition per configured shard key (parallel scroll),
    * falling back to the reference's single sequential partition.
    */
  def planPartitions(config: ReadConfig)
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    if (config.shardKeys.nonEmpty)
      config.shardKeys.map(k =>
        QdrantInputPartition(Some(k))
          : org.apache.spark.sql.connector.read.InputPartition).toArray
    else Array(QdrantInputPartition(None))

  private def baseHeaders(headers: Map[String, String], apiKey: Option[String])
      : Map[String, String] =
    headers ++ apiKey.filterNot(_ => headers.contains("api-key")).map("api-key" -> _)

  /** Scroll the collection, normalizing points to row maps: top-level point
    * keys become columns; payload/vector dropped client-side when excluded
    * (reader.py:68-83, 219-295).
    */
  def iterPoints(config: ReadConfig): Iterator[JsonNode] = new Iterator[JsonNode] {
    private val headers = baseHeaders(config.headers, config.apiKey)
    private var remaining: Option[Int] = config.limit
    private var offset: Option[Any] = config.offset
    private var page = 0
    private var done = false
    private var buffer: Iterator[JsonNode] = Iterator.empty

    private def advance(): Unit = {
      while (!buffer.hasNext && !done) {
        if (remaining.exists(_ <= 0)) { done = true; return }
        val requestLimit = remaining.map(math.min(config.pageSize, _))
          .getOrElse(config.pageSize)
        val payload = mutable.LinkedHashMap[String, Any](
          "limit" -> requestLimit,
          "with_payload" -> config.withPayload,
          "with_vectors" -> config.withVectors)
        config.shardKey.foreach(k => payload += "shard_key" -> k)
        config.filter.foreach(f => payload += "filter" -> f)
        offset.foreach(o => payload += "offset" -> o)
        val body = Http.requestWithRetryOrThrow(Http.Spec(
          "POST", scrollUrl(config), headers, Some(Json.toJson(payload.toMap)),
          Some("application/json"),
          config.timeout, config.maxRetries, config.backoffFactor))
        val response = Json.parse(body)
        Option(response.get("status")).filter(_.isTextual).map(_.asText).foreach { s =>
          if (s.toLowerCase != "ok")
            throw new RuntimeException(s"Qdrant returned a non-ok status: $s")
        }
        val result = Option(response.get("result")).filter(_.isObject).getOrElse(
          throw new IllegalArgumentException(
            "Invalid Qdrant response: missing result object"))
        val points = Option(result.get("points")).filter(_.isArray)
          .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        val taken = remaining.map(r => points.take(r)).getOrElse(points)
        remaining = remaining.map(_ - taken.length)
        buffer = taken.iterator.map(normalizePoint(_, config))
        val nextOffset = Seq("next_page_offset", "next_offset", "next_page")
          .iterator.map(result.get)
          .collectFirst { case n if n != null && !n.isNull => n }
        page += 1
        if (nextOffset.isEmpty || remaining.exists(_ <= 0) ||
          config.maxPages.exists(page >= _)) done = true
        else offset = nextOffset.map(Json.nodeToScala)
      }
    }
    def hasNext: Boolean = { advance(); buffer.hasNext }
    def next(): JsonNode = { advance(); buffer.next() }
  }

  private def normalizePoint(point: JsonNode, config: ReadConfig): JsonNode =
    if (!point.isObject) {
      val o = Json.mapper.createObjectNode()
      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("value", point)
      o
    } else {
      val o = point.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      if (!config.includePayload) o.remove("payload")
      if (!config.includeVectors) o.remove("vector")
      o
    }

  // ----- write path -----

  final case class WriteConfig(
      endpoint: String,
      collection: String,
      apiKey: Option[String],
      headers: Map[String, String],
      timeout: Double,
      maxRetries: Int,
      backoffFactor: Double,
      idField: Option[String],
      vectorField: String,
      payloadFields: Option[Seq[String]],
      batchSize: Int,
      waitWrites: Boolean,
      createCollection: Boolean,
      distance: String,
      payloadFormat: String, // auto | points | batch | flat-batch
      writeMethod: String) // auto | put | post

  object WriteConfig {
    def fromJson(raw: String): WriteConfig = {
      val data = Json.nodeToScala(Json.parse(raw)).asInstanceOf[Map[String, Any]]
      def num(key: String, default: Double): Double =
        data.get(key).filter(_ != null).map(_.toString.toDouble).getOrElse(default)
      val endpoint = data.getOrElse("endpoint",
        throw new IllegalArgumentException("Qdrant endpoint must be provided"))
        .toString.stripSuffix("/")
      val collection = data.getOrElse("collection", "").toString.trim
      require(collection.nonEmpty, "Qdrant collection name must be provided")
      WriteConfig(
        endpoint = endpoint,
        collection = collection,
        apiKey = data.get("api_key").filter(_ != null).map(_.toString),
        headers = data.get("headers") match {
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
          case _ => Map.empty
        },
        timeout = num("timeout", 30.0),
        maxRetries = num("max_retries", 3).toInt,
        backoffFactor = num("backoff_factor", 0.5),
        idField = data.get("id_field").filter(_ != null).map(_.toString)
          .orElse(Some("id")),
        vectorField = data.getOrElse("vector_field", "vector").toString,
        payloadFields = data.get("payload_fields") match {
          case Some(s: Seq[_]) => Some(s.map(_.toString))
          case _ => None
        },
        batchSize = num("batch_size", 128).toInt,
        waitWrites = data.getOrElse("wait", true) != false,
        createCollection = data.getOrElse("create_collection", true) != false,
        distance = data.getOrElse("distance", "Cosine").toString,
        payloadFormat = data.getOrElse("payload_format", "auto").toString.toLowerCase,
        writeMethod = data.getOrElse("write_method", "auto").toString.toLowerCase)
    }
  }

  def pointsUrl(c: WriteConfig): String =
    s"${c.endpoint}/collections/${c.collection}/points"

  /** Row value → vector payload: Seq of numbers, ml Vector, or map of named
    * vectors (writer.py:47-72).
    */
  def normalizeVectorValue(v: Any): Any = v match {
    case null => throw new IllegalArgumentException("vector value cannot be null")
    case vec: org.apache.spark.ml.linalg.Vector => vec.toArray.toSeq
    case s: scala.collection.Seq[_] => s.map(coerceFloat)
    case a: Array[_] => a.toSeq.map(coerceFloat)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k.toString -> normalizeVectorValue(x) }.toMap
    case r: Row => // struct of named vectors
      r.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> normalizeVectorValue(r.get(i)) }.toMap
    case other => throw new IllegalArgumentException(
      s"Unsupported vector value type: ${other.getClass.getName}")
  }

  private def coerceFloat(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue() // includes BigDecimal
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(
      s"Cannot coerce vector entry to float: $other")
  }

  /** Row → point map {id, vector, payload} (writer.py:361-385): payload =
    * explicitly listed fields, or every remaining column.
    */
  def pointFromRow(row: Row, config: WriteConfig): Map[String, Any] = {
    val fieldNames = row.schema.fieldNames.toSeq
    val vectorRaw = row.getAs[Any](config.vectorField)
    require(vectorRaw != null,
      s"Missing vector field '${config.vectorField}' in record")
    val point = mutable.LinkedHashMap[String, Any](
      "vector" -> normalizeVectorValue(vectorRaw))
    config.idField.foreach { idf =>
      require(fieldNames.contains(idf), s"Missing id field '$idf' in record")
      val id = row.getAs[Any](idf)
      require(id != null, s"ID field '$idf' cannot be null for Qdrant writes")
      point += "id" -> id
    }
    val payloadNames = config.payloadFields.getOrElse(
      fieldNames.filterNot(n =>
        config.idField.contains(n) || n == config.vectorField))
    val payload = payloadNames.filter(fieldNames.contains)
      .map(n => n -> row.getAs[Any](n)).filter(_._2 != null)
    if (payload.nonEmpty) point += "payload" -> payload.toMap
    point.toMap
  }

  /** Collection auto-create: GET; on 404 PUT with a vectors schema derived
    * from the first point (writer.py:162-199).
    */
  def ensureCollectionExists(
      config: WriteConfig, samplePoint: Map[String, Any]): Unit = {
    if (!config.createCollection) return
    val headers = baseHeaders(config.headers, config.apiKey)
    val url = s"${config.endpoint}/collections/${config.collection}"
    val check = Http.requestOnce(Http.Spec("GET", url, headers,
      timeoutSeconds = config.timeout))
    if (check.status < 300) return
    if (check.status != 404)
      throw new RuntimeException(
        s"Failed to check Qdrant collection '${config.collection}': " +
          s"HTTP ${check.status} ${check.body.take(200)}")
    val vectorsPayload = samplePoint("vector") match {
      case m: scala.collection.Map[_, _] =>
        require(m.nonEmpty, "No named vectors provided for collection creation")
        m.map { case (name, v) =>
          name.toString -> Map(
            "size" -> v.asInstanceOf[scala.collection.Seq[_]].length,
            "distance" -> config.distance)
        }
      case s: scala.collection.Seq[_] =>
        require(s.nonEmpty, "Vector cannot be empty for collection creation")
        Map("size" -> s.length, "distance" -> config.distance)
      case other => throw new IllegalArgumentException(
        s"Unable to derive vectors schema from provided point: $other")
    }
    val create = Http.requestOnce(Http.Spec("PUT", url, headers,
      Some(Json.toJson(Map("vectors" -> vectorsPayload))),
      Some("application/json"), config.timeout))
    if (create.status < 200 || create.status >= 300) {
      // concurrent writer tasks race to create: every partition sees the
      // initial 404 and PUTs; treat "someone else won" as success by
      // re-checking existence before failing the task
      val recheck = Http.requestOnce(Http.Spec("GET", url, headers,
        timeoutSeconds = config.timeout))
      if (recheck.status >= 300)
        throw new RuntimeException(
          s"Failed to create Qdrant collection '${config.collection}': " +
            s"HTTP ${create.status} ${create.body.take(500)}")
    }
  }

  /** Send one batch with payload-format and method fallbacks
    * (writer.py:388-467).
    */
  def sendPointsBatch(config: WriteConfig, batch: Seq[Map[String, Any]]): Unit = {
    val headers = baseHeaders(config.headers, config.apiKey)
    val pointsPayload = Map("points" -> batch)
    val batchInner = mutable.LinkedHashMap[String, Any](
      "ids" -> batch.map(_.getOrElse("id", null)),
      "vectors" -> batch.map(_.getOrElse("vector", null)))
    if (batch.exists(_.contains("payload")))
      batchInner += "payloads" -> batch.map(_.getOrElse("payload", null))
    val batchPayload = Map("batch" -> batchInner.toMap)
    val flatBatchPayload = batchInner.toMap

    val payloadAttempts: Seq[(String, Map[String, Any])] = config.payloadFormat match {
      case "points" => Seq("points" -> pointsPayload)
      case "batch" => Seq("batch" -> batchPayload,
        "flat-batch" -> flatBatchPayload, "points" -> pointsPayload)
      case _ => Seq("points" -> pointsPayload, "batch" -> batchPayload,
        "flat-batch" -> flatBatchPayload)
    }
    val methodAttempts = config.writeMethod match {
      case "post" => Seq("POST")
      case "put" => Seq("PUT")
      case _ => Seq("PUT", "POST")
    }

    var lastError: Option[Throwable] = None
    val attempts = for (m <- methodAttempts; p <- payloadAttempts) yield (m, p)
    var succeeded = false
    val it = attempts.iterator
    while (!succeeded && it.hasNext) {
      val (method, (_, payload)) = it.next()
      try {
        val body = Http.requestWithRetryOrThrow(Http.Spec(
          // wait is a QUERY parameter in the Qdrant points API; a body
          // field is ignored, silently acknowledging writes before they
          // apply even with waitWrites=true
          method, s"${pointsUrl(config)}?wait=${config.waitWrites}",
          headers, Some(Json.toJson(payload)),
          Some("application/json"),
          config.timeout, config.maxRetries, config.backoffFactor))
        val response = Json.parse(body)
        Option(response.get("status")).filter(_.isTextual)
          .map(_.asText).foreach { s =>
            if (s.toLowerCase != "ok")
              throw new RuntimeException(s"Qdrant returned a non-ok status: $s")
          }
        succeeded = true
      } catch {
        case e: Exception => lastError = Some(e)
      }
    }
    if (!succeeded)
      throw lastError.getOrElse(
        new RuntimeException("Qdrant points write failed: no payload attempt succeeded"))
  }
}

class QdrantTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-qdrant"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    options.asScala.get(Qdrant.SchemaOption) match {
      case Some(json) => DataType.fromJson(json).asInstanceOf[StructType]
      case None =>
        val config = Qdrant.ReadConfig.fromJson(
          options.asScala.getOrElse(Qdrant.ConfigOption,
            throw new IllegalArgumentException(
              s"Qdrant data source requires the '${Qdrant.ConfigOption}' option")))
        require(config.inferSchema,
          "infer_schema is disabled; provide an explicit schema")
        val records = Qdrant.iterPoints(config)
          .take(config.inferMaxRecords).map(_.toString).toSeq
        Json.inferSchema(SparkSession.active, records)
    }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QdrantTable(schema, properties.asScala.getOrElse(Qdrant.ConfigOption,
      throw new IllegalArgumentException(
        s"Qdrant data source requires the '${Qdrant.ConfigOption}' option")))
}

class QdrantTable(tableSchema: StructType, rawConfig: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-qdrant"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      private var config = Qdrant.ReadConfig.fromJson(rawConfig)
      private var prunedSchema = tableSchema
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

      /** Predicates on `id` / `payload.*` become server-side `must`
        * conditions so only matching points cross the wire. ALL filters are
        * returned as residual — Spark re-applies them, so the server filter
        * is purely a transfer optimization and partial translation (e.g.
        * one side of an AND) is sound.
        */
      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        val conds = filters.toSeq.flatMap(QdrantFilters.toMustConditions)
        if (conds.nonEmpty)
          config = config.copy(filter =
            Some(QdrantFilters.mergeIntoFilter(config.filter, conds)))
        pushed = filters.filter(QdrantFilters.isPushed)
        filters
      }

      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        pushed

      /** Spark's LIMIT shrinks the scroll budget server-side: the reader
        * stops paging once `limit` points arrived, and pages never exceed
        * it. Exact (single sequential partition), so Spark may drop its
        * own Limit node.
        */
      override def pushLimit(limit: Int): Boolean = {
        // sharded scans run one scroll PER shard — a pushed limit would
        // apply per partition (limit × shards rows), so decline and let
        // Spark keep its own Limit node in that case
        if (config.shardKeys.nonEmpty) return false
        config = config.copy(
          limit = Some(config.limit.fold(limit)(math.min(_, limit))),
          pageSize = math.min(config.pageSize, math.max(limit, 1)))
        true
      }

      /** Unreferenced vector/payload columns turn off the corresponding
        * server-side fetch — the dominant payload weight for vector
        * collections (beyond-reference: reader.py only honors explicit
        * config flags).
        */
      override def pruneColumns(requiredSchema: StructType): Unit = {
        val required = requiredSchema.fieldNames.toSet
        if (!required.contains("vector") && !required.contains("vectors"))
          config = config.copy(withVectors = false, includeVectors = false)
        if (!required.contains("payload"))
          config = config.copy(withPayload = false, includePayload = false)
        // the reader projects JSON onto schema field names (nested structs
        // included), so the pruned schema is usable verbatim
        prunedSchema = requiredSchema
      }

      override def build(): Scan = new QdrantScan(prunedSchema, config)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new QdrantBatchWrite(info.schema(), Qdrant.WriteConfig.fromJson(rawConfig))
      }
    }
}

class QdrantScan(schema: StructType, config: Qdrant.ReadConfig)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  // one scroll cursor is inherently sequential (reference reader.py:
  // 317-318 scrolls one partition — kept as the fallback); configured
  // shard_keys parallelize: one partition per shard, each with its own
  // server-side-restricted cursor
  override def planInputPartitions(): Array[InputPartition] =
    Qdrant.planPartitions(config)
  override def createReaderFactory(): PartitionReaderFactory =
    QdrantReaderFactory(schema, config)
  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new QdrantMicroBatchStream(schema, config)
}

/** Streaming Qdrant source: each micro-batch performs one full scroll of
  * the collection (single sequential partition, same as the batch scan —
  * the scroll cursor paginates within one snapshot, it is NOT a change
  * feed). Offset/repeat semantics are [[graft.io.PollMicroBatchStream]]'s:
  * a wall-clock poll stamp, at-least-once, points repeat across polls —
  * compose with streaming dedup keyed on `id` for incremental reads.
  * Filter/limit/projection options in the config apply to every poll.
  */
class QdrantMicroBatchStream(schema: StructType, config: Qdrant.ReadConfig)
    extends graft.io.PollMicroBatchStream {
  override protected def pollPartitions(): Array[InputPartition] =
    Qdrant.planPartitions(config)
  override def createReaderFactory(): PartitionReaderFactory =
    QdrantReaderFactory(schema, config)
}

final case class QdrantInputPartition(shardKey: Option[Any] = None)
    extends InputPartition

final case class QdrantReaderFactory(schema: StructType, config: Qdrant.ReadConfig)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sk = partition.asInstanceOf[QdrantInputPartition].shardKey
    new QdrantPartitionReader(schema,
      if (sk.isDefined) config.copy(shardKey = sk) else config)
  }
}

class QdrantPartitionReader(schema: StructType, config: Qdrant.ReadConfig)
    extends PartitionReader[InternalRow] {
  private val serializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  private lazy val points = Qdrant.iterPoints(config)
  private var current: InternalRow = _
  override def next(): Boolean =
    if (points.hasNext) {
      current = serializer(Json.recordToRow(points.next(), schema)).copy()
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class QdrantBatchWrite(schema: StructType, config: Qdrant.WriteConfig)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new QdrantDataWriterFactory(schema, config)
  // at-least-once, non-transactional (reference writer.py:505-509)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class QdrantDataWriterFactory(schema: StructType, config: Qdrant.WriteConfig)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new QdrantDataWriter(schema, config)
}

/** Executor-side writer: buffers `batchSize` points per upsert request;
  * collection existence ensured once from the first point.
  */
class QdrantDataWriter(schema: StructType, config: Qdrant.WriteConfig)
    extends DataWriter[InternalRow] {
  private val deserializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind().createDeserializer()
  private val buffer = mutable.ArrayBuffer[Map[String, Any]]()
  private var collectionChecked = false

  override def write(record: InternalRow): Unit = {
    val point = Qdrant.pointFromRow(deserializer(record), config)
    if (!collectionChecked) {
      Qdrant.ensureCollectionExists(config, point)
      collectionChecked = true
    }
    buffer += point
    if (buffer.length >= config.batchSize) flush()
  }

  private def flush(): Unit =
    if (buffer.nonEmpty) {
      Qdrant.sendPointsBatch(config, buffer.toSeq)
      buffer.clear()
    }

  override def commit(): WriterCommitMessage = {
    flush()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = buffer.clear()
  override def close(): Unit = ()
}
