package graft.io.rest

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
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
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, config)
}

/** Limit and column pruning pushdown. A pushed LIMIT caps each partition's
  * record iterator, which stops HTTP pagination early (the page iterators
  * are lazy end-to-end); it is per-partition, so Spark still applies the
  * global limit (pushLimit returns false). Pruned columns are dropped
  * before row serialization — the server still sends full JSON records
  * (REST has no projection protocol), but the rows entering Spark carry
  * only what the query needs.
  */
class RestScanBuilder(schema: StructType, config: RestApi.Config)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {
  private var prunedSchema: StructType = schema
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }
  override def pruneColumns(required: StructType): Unit =
    // keep declared field order; an empty projection (count(*)) keeps none
    prunedSchema = StructType(schema.fields.filter(f => required.fieldNames.contains(f.name)))
  override def build(): Scan = new RestScan(prunedSchema, config, limit)
}

class RestScan(schema: StructType, config: RestApi.Config, limit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val chunks = RestApi.chunkWorkItems(RestApi.planWorkItems(config), config.parallelism)
    if (chunks.isEmpty) Array(RestInputPartition(Seq.empty))
    else chunks.map(RestInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, config, limit)
  override def description(): String =
    s"graft-rest limit=${limit.getOrElse(-1)} cols=${schema.fieldNames.mkString(",")}"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RestMicroBatchStream(schema, config)
}

/** Streaming REST source: each micro-batch performs one full poll of the
  * configured endpoints (same driver-side work-item planning and
  * executor-side fetching as the batch scan). Offset/repeat semantics are
  * [[graft.io.PollMicroBatchStream]]'s — a wall-clock poll stamp,
  * at-least-once, compose with streaming dedup for incremental reads.
  */
class RestMicroBatchStream(schema: StructType, config: RestApi.Config)
    extends graft.io.PollMicroBatchStream {
  override protected def pollPartitions(): Array[InputPartition] = {
    val chunks =
      RestApi.chunkWorkItems(RestApi.planWorkItems(config), config.parallelism)
    if (chunks.isEmpty) Array(RestInputPartition(Seq.empty))
    else chunks.map(RestInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, config)
}

final case class RestInputPartition(items: Seq[RestApi.WorkItem]) extends InputPartition

class RestReaderFactory(
    schema: StructType, config: RestApi.Config, limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(schema, config,
      partition.asInstanceOf[RestInputPartition].items, limit)
}

/** Executor-side reader: one HTTP pass over the partition's work items. */
class RestPartitionReader(
    schema: StructType,
    config: RestApi.Config,
    items: Seq[RestApi.WorkItem],
    limit: Option[Int] = None) extends PartitionReader[InternalRow] {

  private val serializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  private val records = {
    val it = RestApi.fetchItems(config, items)
    limit.map(it.take).getOrElse(it)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (records.hasNext) {
      current = serializer(graft.io.Json.recordToRow(records.next(), schema)).copy()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
