package graft.io.sparql

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{Http, Json}

/** SPARQL endpoint connector: executes SELECT/ASK queries against an
  * HTTP(S) endpoint and parses `application/sparql-results+json`.
  *
  * Reference semantics: src/spark_fuse/io/sparql.py — XSD literal coercion
  * (:58-85, priority bool > long > double > string), SELECT binding parse +
  * optional per-variable metadata columns (:101-143), ASK (:145-151),
  * multi-query chunk partitions (:273-278), GET/POST × form/json/raw with
  * basic auth (:156-212).
  */
object Sparql {

  val ConfigOption = "graft.sparql.config"
  val SchemaOption = "graft.sparql.schema"
  val MetadataKeys: Seq[String] = Seq("type", "datatype", "xml:lang")

  private val NumericTypes = Set("integer", "int", "long", "short", "byte",
    "nonpositiveinteger", "negativeinteger", "nonnegativeinteger",
    "positiveinteger", "unsignedbyte", "unsignedshort", "unsignedint",
    "unsignedlong")
  private val FloatingTypes = Set("decimal", "double", "float")

  final case class Config(
      endpoint: String,
      queries: Seq[String],
      params: Map[String, Any],
      headers: Map[String, String],
      auth: Option[(String, String)],
      requestType: String,
      payloadMode: String,
      queryParam: String,
      includeMetadata: Boolean,
      metadataSuffix: String,
      coerceTypes: Boolean,
      timeout: Double,
      maxRetries: Int,
      backoffFactor: Double,
      parallelism: Int,
      inferMaxRecords: Int)

  object Config {
    def fromJson(raw: String): Config = {
      val data = Json.nodeToScala(Json.parse(raw)).asInstanceOf[Map[String, Any]]
      val queries = data.getOrElse("queries", Seq.empty) match {
        case s: String => Seq(s)
        case s: Seq[_] => s.map(_.toString)
        case _ => Seq.empty
      }
      def num(key: String, default: Double): Double =
        data.get(key).filter(_ != null).map(_.toString.toDouble).getOrElse(default)
      Config(
        endpoint = data("endpoint").toString,
        queries = queries,
        params = data.get("params") match {
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
          case _ => Map.empty
        },
        headers = (data.get("headers") match {
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
          case _ => Map.empty[String, String]
        }),
        auth = data.get("auth") match {
          case Some(s: Seq[_]) if s.length == 2 =>
            Some((s.head.toString, s(1).toString))
          case _ => None
        },
        requestType = data.getOrElse("request_type", "POST").toString.toUpperCase,
        payloadMode = data.getOrElse("payload_mode", "form").toString.toLowerCase,
        queryParam = data.getOrElse("query_param", "query").toString,
        includeMetadata = data.getOrElse("include_metadata", false) == true,
        metadataSuffix = data.getOrElse("metadata_suffix", "__").toString,
        coerceTypes = data.getOrElse("coerce_types", true) != false,
        timeout = num("timeout", 30.0),
        maxRetries = num("max_retries", 3).toInt,
        backoffFactor = num("backoff_factor", 0.5),
        parallelism =
          math.max(num("parallelism", math.max(queries.length, 1)).toInt, 1),
        inferMaxRecords = math.max(num("infer_max_records", 1000).toInt, 1))
    }
  }

  /** XSD-typed literal → bool/long/double; None = keep the string
    * (sparql.py:58-85).
    */
  def coerceLiteral(value: String, datatype: Option[String]): Option[Any] =
    datatype.flatMap { raw =>
      val dt = { val l = raw.toLowerCase; if (l.contains("#")) l.split("#", 2)(1) else l }
      if (dt == "boolean") value.trim.toLowerCase match {
        case "true" | "1" => Some(true)
        case "false" | "0" => Some(false)
        case _ => None
      }
      else if (NumericTypes.contains(dt)) value.toLongOption
      else if (FloatingTypes.contains(dt)) value.toDoubleOption
      else None
    }

  /** Execute one query: GET (query param) or POST (form/json/raw body). */
  def performRequest(config: Config, query: String): JsonNode = {
    val authHeader = config.auth
      .map { case (u, p) => "Authorization" -> Http.basicAuth(u, p) }
    val headers = config.headers ++ authHeader +
      ("Accept" -> config.headers.getOrElse("Accept", "application/sparql-results+json"))
    val spec =
      if (config.requestType == "GET")
        Http.Spec("GET",
          Http.mergeQueryParams(config.endpoint,
            config.params + (config.queryParam -> query)),
          headers, None, None,
          config.timeout, config.maxRetries, config.backoffFactor)
      else config.payloadMode match {
        case "json" =>
          Http.Spec("POST", config.endpoint, headers,
            Some(Json.toJson(config.params + (config.queryParam -> query))),
            Some("application/json"),
            config.timeout, config.maxRetries, config.backoffFactor)
        case "raw" =>
          Http.Spec("POST", config.endpoint, headers, Some(query),
            Some(headers.getOrElse("Content-Type", "application/sparql-query")),
            config.timeout, config.maxRetries, config.backoffFactor)
        case _ => // form
          Http.Spec("POST", config.endpoint, headers,
            Some(Http.formEncode(config.params + (config.queryParam -> query))),
            Some("application/x-www-form-urlencoded"),
            config.timeout, config.maxRetries, config.backoffFactor)
      }
    Json.parse(Http.requestWithRetryOrThrow(spec))
  }

  /** Parse a SPARQL JSON payload into rows + first-seen column order
    * (sparql.py:101-151).
    */
  def parseResults(config: Config, payload: JsonNode)
      : (Seq[Map[String, Any]], Seq[String]) = {
    if (payload.has("results")) {
      val columns = mutable.LinkedHashSet[String]()
      Option(payload.get("head")).flatMap(h => Option(h.get("vars"))).foreach { vars =>
        if (vars.isArray) vars.elements().asScala.foreach(v => columns += v.asText)
      }
      val bindings = Option(payload.get("results"))
        .flatMap(r => Option(r.get("bindings")))
        .filter(_.isArray).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      val rows = bindings.filter(_.isObject).map { binding =>
        val row = mutable.LinkedHashMap[String, Any]()
        binding.properties().asScala.foreach { e =>
          val name = e.getKey
          val entry = e.getValue
          columns += name
          val value: Any =
            if (!entry.isObject) Json.nodeToScala(entry)
            else if (!entry.has("value")) null
            else {
              val v = entry.get("value").asText
              if (config.coerceTypes)
                coerceLiteral(v,
                  Option(entry.get("datatype")).map(_.asText)).getOrElse(v)
              else v
            }
          row += name -> value
          if (config.includeMetadata && entry.isObject) {
            MetadataKeys.foreach { mk =>
              val metaCol = s"$name${config.metadataSuffix}$mk"
              columns += metaCol
              row += metaCol -> Option(entry.get(mk)).map(_.asText).orNull
            }
          }
        }
        row.toMap
      }
      (rows, columns.toSeq)
    } else if (payload.has("boolean")) {
      val b = payload.get("boolean")
      val value =
        if (b.isTextual) Set("true", "1").contains(b.asText.trim.toLowerCase)
        else b.asBoolean
      (Seq(Map("boolean" -> value)), Seq("boolean"))
    } else throw new IllegalArgumentException(
      "SPARQL response must contain either 'results' or 'boolean'")
  }

  /** Run queries sequentially, merge column order first-seen. */
  def collectRows(config: Config, queries: Seq[String])
      : (Seq[Map[String, Any]], Seq[String]) = {
    val rows = mutable.ArrayBuffer[Map[String, Any]]()
    val columns = mutable.LinkedHashSet[String]()
    queries.foreach { q =>
      val (qRows, qCols) = parseResults(config, performRequest(config, q))
      qCols.foreach(columns += _)
      rows ++= qRows
    }
    (rows.toSeq, columns.toSeq)
  }

  /** Run queries sequentially only until `maxRecords` rows are gathered —
    * the schema-inference fetch. The reference re-executes every query IN
    * FULL on the driver to infer types (sparql.py:243-270), which is
    * pathological at scale; the bound is the fix, the inference contract is
    * kept (same REST-connector treatment, `infer_max_records`). Queries past
    * the bound are not issued, so columns appearing only in them need an
    * explicit schema.
    */
  def collectRowsBounded(config: Config, queries: Seq[String], maxRecords: Int)
      : (Seq[Map[String, Any]], Seq[String]) = {
    val rows = mutable.ArrayBuffer[Map[String, Any]]()
    val columns = mutable.LinkedHashSet[String]()
    val it = queries.iterator
    while (it.hasNext && rows.length < maxRecords) {
      val (qRows, qCols) = parseResults(config, performRequest(config, it.next()))
      qCols.foreach(columns += _)
      rows ++= qRows.take(maxRecords - rows.length)
    }
    (rows.toSeq, columns.toSeq)
  }

  /** Column-by-column inference, priority bool > long > double > string;
    * metadata columns always string (sparql.py:243-270).
    */
  def buildSchema(
      config: Config,
      columns: Seq[String],
      rows: Seq[Map[String, Any]]): StructType =
    StructType(columns.map { c =>
      val isMeta = MetadataKeys.exists(mk => c.endsWith(s"${config.metadataSuffix}$mk"))
      val dt: DataType =
        if (isMeta) StringType
        else rows.iterator.flatMap(_.get(c)).collectFirst {
          case v if v != null => v match {
            case _: Boolean => BooleanType
            case _: Long | _: Int => LongType
            case _: Double | _: Float => DoubleType
            case _ => StringType
          }
        }.getOrElse(StringType)
      StructField(c, dt, nullable = true)
    })

  def chunkQueries(queries: Seq[String], parallelism: Int): Seq[Seq[String]] = {
    if (queries.isEmpty) return Seq.empty
    val p = math.max(parallelism, 1)
    val chunkSize = math.max(math.ceil(queries.length.toDouble / p).toInt, 1)
    queries.grouped(chunkSize).toSeq
  }

  /** Project a parsed row map onto the schema (missing → null).
    *
    * The schema is inferred from the first non-null value per column over
    * a BOUNDED sample, so later values can disagree with the column type
    * (a LongType column meeting "N/A", an untyped literal, an
    * xsd:decimal). Such values are best-effort parsed into the column
    * type and become null when unparseable — falling through with the raw
    * object would put a String in a LongType field and crash the whole
    * scan with ClassCastException at encode time.
    */
  def projectRow(row: Map[String, Any], schema: StructType): org.apache.spark.sql.Row = {
    val values = schema.fields.map { f =>
      row.getOrElse(f.name, null) match {
        case null => null
        case v => (f.dataType, v) match {
          case (StringType, x) => x.toString
          case (LongType, x: Long) => x
          case (LongType, x: Int) => x.toLong
          case (LongType, x: Double) if x.isWhole => x.toLong
          case (LongType, x) => x.toString.toLongOption.map(Long.box).orNull
          case (DoubleType, x: Double) => x
          case (DoubleType, x: Long) => x.toDouble
          case (DoubleType, x: Int) => x.toDouble
          case (DoubleType, x) => x.toString.toDoubleOption.map(Double.box).orNull
          case (BooleanType, x: Boolean) => x
          case (BooleanType, x) =>
            x.toString.toBooleanOption.map(Boolean.box).orNull
          case (_, x) => x.toString
        }
      }
    }
    new GenericRowWithSchema(values.toArray[Any], schema)
  }
}

class SparqlTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sparql"
  override def supportsExternalMetadata(): Boolean = true

  private def parseConfig(options: util.Map[String, String]): Sparql.Config =
    Sparql.Config.fromJson(options.asScala.getOrElse(Sparql.ConfigOption,
      throw new IllegalArgumentException(
        s"SPARQL data source requires the '${Sparql.ConfigOption}' option")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    options.asScala.get(Sparql.SchemaOption) match {
      case Some(json) => DataType.fromJson(json).asInstanceOf[StructType]
      case None =>
        val config = parseConfig(options)
        val (rows, columns) = Sparql.collectRowsBounded(
          config, config.queries, config.inferMaxRecords)
        Sparql.buildSchema(config, columns, rows)
    }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SparqlTable(schema, parseConfig(properties))
}

class SparqlTable(schema: StructType, config: Sparql.Config)
    extends Table with SupportsRead {
  override def name(): String = s"graft-sparql(${config.endpoint})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SparqlScan(schema, config)
    }
}

class SparqlScan(schema: StructType, config: Sparql.Config) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val chunks = Sparql.chunkQueries(config.queries, config.parallelism)
    if (chunks.isEmpty) Array(SparqlInputPartition(Seq.empty))
    else chunks.map(SparqlInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SparqlReaderFactory(schema, config)
  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SparqlMicroBatchStream(schema, config)
}

/** Streaming SPARQL source: each micro-batch re-runs the configured
  * queries (same chunked planning as the batch scan). Offset/repeat
  * semantics are [[graft.io.PollMicroBatchStream]]'s: wall-clock poll
  * stamp, at-least-once, rows repeat across polls — compose with
  * streaming dedup for incremental semantics.
  */
class SparqlMicroBatchStream(schema: StructType, config: Sparql.Config)
    extends graft.io.PollMicroBatchStream {
  override protected def pollPartitions(): Array[InputPartition] = {
    val chunks = Sparql.chunkQueries(config.queries, config.parallelism)
    if (chunks.isEmpty) Array(SparqlInputPartition(Seq.empty))
    else chunks.map(SparqlInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SparqlReaderFactory(schema, config)
}

final case class SparqlInputPartition(queries: Seq[String]) extends InputPartition

final case class SparqlReaderFactory(schema: StructType, config: Sparql.Config)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SparqlPartitionReader(schema, config,
      partition.asInstanceOf[SparqlInputPartition].queries)
}

class SparqlPartitionReader(
    schema: StructType,
    config: Sparql.Config,
    queries: Seq[String]) extends PartitionReader[InternalRow] {
  private val serializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  private lazy val rows: Iterator[Map[String, Any]] =
    Sparql.collectRows(config, queries)._1.iterator
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) {
      current = serializer(Sparql.projectRow(rows.next(), schema)).copy()
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
