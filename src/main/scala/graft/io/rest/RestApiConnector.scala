package graft.io.rest

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 glue for the REST connector: `spark.read.format("graft-rest")
  * .option("graft.rest.config", json).load()`.
  *
  * Planning happens on the driver (work items chunked into partitions by
  * `parallelism`); HTTP happens on executors inside
  * [[RestPartitionReader]]. Schema: user-supplied via `.schema(...)` /
  * the `graft.rest.schema` option, else inferred from a driver-side
  * prefetch bounded by `infer_max_records` (the reference fetches
  * everything on the driver — rest_api.py:581-588 — which would be
  * pathological at scale; the bound is the fix, the contract is kept).
  */
class RestApiTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-rest"
  override def supportsExternalMetadata(): Boolean = true

  private def parseConfig(options: util.Map[String, String]): RestApi.Config = {
    val raw = options.asScala.getOrElse(RestApi.ConfigOption,
      throw new IllegalArgumentException(
        s"REST data source requires the '${RestApi.ConfigOption}' option"))
    RestApi.Config.fromJson(raw)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    options.asScala.get(RestApi.SchemaOption) match {
      case Some(json) => DataType.fromJson(json).asInstanceOf[StructType]
      case None =>
        val config = parseConfig(options)
        require(config.inferSchema,
          "infer_schema is disabled; provide an explicit schema")
        val records = RestApi
          .fetchItems(config, RestApi.planWorkItems(config))
          .take(config.inferMaxRecords)
          .map(_.toString)
          .toSeq
        graft.io.Json.inferSchema(SparkSession.active, records)
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestApiTable(schema, parseConfig(properties))
}

class RestApiTable(schema: StructType, config: RestApi.Config)
    extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${config.sources.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new RestScan(schema, config)
    }
}

class RestScan(schema: StructType, config: RestApi.Config) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val chunks = RestApi.chunkWorkItems(RestApi.planWorkItems(config), config.parallelism)
    if (chunks.isEmpty) Array(RestInputPartition(Seq.empty))
    else chunks.map(RestInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, config)
}

final case class RestInputPartition(items: Seq[RestApi.WorkItem]) extends InputPartition

class RestReaderFactory(schema: StructType, config: RestApi.Config)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(schema, config,
      partition.asInstanceOf[RestInputPartition].items)
}

/** Executor-side reader: one HTTP pass over the partition's work items. */
class RestPartitionReader(
    schema: StructType,
    config: RestApi.Config,
    items: Seq[RestApi.WorkItem]) extends PartitionReader[InternalRow] {

  private val serializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  private val records = RestApi.fetchItems(config, items)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (records.hasNext) {
      current = serializer(graft.io.Json.recordToRow(records.next(), schema)).copy()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
