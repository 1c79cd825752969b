package graft.io

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

/** JSON plumbing shared by the connectors: parse, nested-path access,
  * record extraction, JsonNode→Row projection, and schema inference.
  *
  * Mirrors the reference's record handling (rest_api.py:46-86) with
  * inference delegated to Spark's own JSON inference (`spark.read.json`
  * over the prefetched records), which reproduces the per-record
  * infer+merge semantics of PySpark's `_infer_schema`/`_merge_type`.
  */
object Json {

  val mapper = new ObjectMapper()

  /** Default payload keys probed for the record list (rest_api.py:23). */
  val DefaultRecordKeys: Seq[String] = Seq("data", "results", "items", "value")

  def parse(s: String): JsonNode = mapper.readTree(s)

  def toJson(v: Any): String = mapper.writeValueAsString(anyToJava(v))

  /** Scala value → Jackson-friendly Java structure. */
  def anyToJava(v: Any): Any = v match {
    case null => null
    case m: scala.collection.Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => out.put(k.toString, anyToJava(x)) }
      out
    case s: scala.collection.Seq[_] => s.map(anyToJava).asJava
    case a: Array[_] => a.toSeq.map(anyToJava).asJava
    case r: Row => rowToJava(r)
    case other => other
  }

  /** Row → ordered map using the row's schema (for JSON serialization). */
  def rowToJava(row: Row): java.util.LinkedHashMap[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    row.schema.fields.zipWithIndex.foreach { case (f, i) =>
      out.put(f.name, anyToJava(row.get(i)))
    }
    out
  }

  /** Follow a dotted path through nested objects; None when any hop is not
    * an object or the key is absent (rest_api.py:46-53).
    */
  def getNested(node: JsonNode, path: Seq[String]): Option[JsonNode] = {
    var current = node
    for (part <- path) {
      if (current == null || !current.isObject) return None
      current = current.get(part)
    }
    Option(current)
  }

  /** Extract the record list from a payload (rest_api.py:56-77):
    * explicit path → its value; else the payload itself if it's an array;
    * else the first default key holding an array; else the payload as a
    * single record. Scalars become one record.
    */
  def extractRecords(payload: JsonNode, recordsField: Option[Seq[String]]): Seq[JsonNode] = {
    val data: Option[JsonNode] = recordsField match {
      case Some(path) => getNested(payload, path)
      case None =>
        if (payload.isArray) Some(payload)
        else if (payload.isObject) {
          DefaultRecordKeys.iterator
            .map(payload.get)
            .collectFirst { case n if n != null && n.isArray => n }
            .orElse(Some(payload))
        } else Some(payload)
    }
    data match {
      case None => Seq.empty
      case Some(n) if n.isNull => Seq.empty
      case Some(a: ArrayNode) => a.elements().asScala.toSeq
      case Some(o) => Seq(o)
    }
  }

  /** Project a JSON record onto a schema: field-by-field by name, missing →
    * null, extras dropped, non-object records → {"value": record}
    * (rest_api.py:79-86, 552-554).
    */
  def recordToRow(record: JsonNode, schema: StructType): Row = {
    val obj: JsonNode =
      if (record.isObject) record
      else {
        val o = mapper.createObjectNode()
        o.set[ObjectNode]("value", record)
        o
      }
    val values = schema.fields.map(f => nodeToValue(obj.get(f.name), f.dataType))
    new GenericRowWithSchema(values.toArray[Any], schema)
  }

  /** JsonNode → external-Row value for the target Spark type (best-effort
    * cast, null when absent or incompatible).
    */
  def nodeToValue(node: JsonNode, dataType: DataType): Any = {
    if (node == null || node.isNull) return null
    dataType match {
      case StringType =>
        if (node.isTextual) node.asText
        else mapper.writeValueAsString(node) // objects/arrays/numbers as JSON text
      case LongType => if (node.isNumber) node.asLong else node.asText.toLongOption.orNull
      case IntegerType => if (node.isNumber) node.asInt else node.asText.toIntOption.orNull
      case DoubleType =>
        if (node.isNumber) node.asDouble else node.asText.toDoubleOption.orNull
      case FloatType =>
        if (node.isNumber) node.floatValue else node.asText.toFloatOption.orNull
      case BooleanType => if (node.isBoolean) node.asBoolean else null
      case dt: DecimalType =>
        if (node.isNumber) new java.math.BigDecimal(node.asText) else null
      case TimestampType =>
        try java.sql.Timestamp.valueOf(node.asText.replace("T", " ").stripSuffix("Z"))
        catch { case _: Exception => null }
      case ArrayType(elem, _) =>
        if (node.isArray) node.elements().asScala.map(nodeToValue(_, elem)).toSeq
        else null
      case st: StructType =>
        if (node.isObject) recordToRow(node, st) else null
      case MapType(StringType, valueType, _) =>
        if (node.isObject)
          node.properties().asScala.map(e => e.getKey -> nodeToValue(e.getValue, valueType)).toMap
        else null
      case _ => null
    }
  }

  /** JsonNode → plain Scala values (Map/Seq/primitives). */
  def nodeToScala(node: JsonNode): Any = {
    if (node == null || node.isNull) return null
    if (node.isObject)
      node.properties().asScala.map(e => e.getKey -> nodeToScala(e.getValue)).toMap
    else if (node.isArray) node.elements().asScala.map(nodeToScala).toSeq
    else if (node.isTextual) node.asText
    else if (node.isBoolean) node.asBoolean
    else if (node.isIntegralNumber) node.asLong
    else if (node.isNumber) node.asDouble
    else node.asText
  }

  /** Infer a schema from raw JSON record strings using Spark's JSON
    * inference (bounded by the caller — never feed it an unbounded fetch).
    */
  def inferSchema(spark: SparkSession, records: Seq[String]): StructType = {
    if (records.isEmpty) return StructType(Seq.empty)
    import spark.implicits._
    spark.read.json(records.toDS()).schema match {
      // Spark marks corrupt-record columns; strip if present
      case s => StructType(s.fields.filterNot(_.name == "_corrupt_record"))
    }
  }
}
