package graft.io.warc

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DSv2 surface for WARC archives:
  * `spark.read.format("graft-warc").load(path)` — the connector-tier
  * twin of [[Warc.readWarc]], giving SQL/catalog users (`CREATE TABLE …
  * USING graft-warc`) the same streamed one-file-per-task parse.
  *
  * Planning lists files on the driver (glob + recursive directory
  * expansion, bounded by file count); parsing happens on executors, one
  * partition per archive (the WARC split unit — see [[Warc]]). Column
  * pruning drops fields before row serialization — pruning `payload`
  * skips copying record bodies into Spark rows entirely (the bytes are
  * still read off the stream: gzip members must be walked to find
  * record boundaries). A pushed LIMIT caps each partition's record
  * iterator, which stops the stream mid-file.
  */
class WarcTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-warc"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTableProvider.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(WarcTableProvider.paths(properties.asScala.toMap))
}

object WarcTableProvider {
  /** The fixed record schema ([[Warc.WarcRecord]]). */
  val Schema: StructType =
    org.apache.spark.sql.Encoders.product[Warc.WarcRecord].schema

  private[warc] def paths(props: Map[String, String]): Seq[String] =
    props.get("paths") match {
      case Some(json) =>
        graft.io.Json.parse(json).elements().asScala.map(_.asText()).toSeq
      case None => props.get("path") match {
        case Some(p) => Seq(p)
        case None => throw new IllegalArgumentException(
          "graft-warc requires a path: spark.read.format(\"graft-warc\").load(path)")
      }
    }
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcTableProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths)
}

class WarcScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {
  private var pruned: StructType = WarcTableProvider.Schema
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }
  override def pruneColumns(required: StructType): Unit =
    pruned = StructType(WarcTableProvider.Schema.fields
      .filter(f => required.fieldNames.contains(f.name)))
  override def build(): Scan = new WarcScan(paths, pruned, limit)
}

class WarcScan(paths: Seq[String], schema: StructType, limit: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val files = paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      require(matches.nonEmpty, s"graft-warc: no files match '$p'")
      matches.flatMap { st =>
        if (!st.isDirectory) Seq(st.getPath.toString)
        else {
          val it = fs.listFiles(st.getPath, true)
          val b = Seq.newBuilder[String]
          while (it.hasNext) {
            val f = it.next()
            val n = f.getPath.getName
            if (f.getLen > 0 && !n.startsWith("_") && !n.startsWith(".") &&
                (n.endsWith(".warc") || n.endsWith(".warc.gz") || n.endsWith(".wgz")))
              b += f.getPath.toString
          }
          b.result()
        }
      }
    }
    files.distinct.sorted.map(WarcInputPartition.apply).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(schema, limit, new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf()))
  override def description(): String =
    s"graft-warc limit=${limit.getOrElse(-1)} cols=${schema.fieldNames.mkString(",")}"
}

final case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(
    schema: StructType, limit: Option[Int], conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].file, schema, limit, conf)
}

/** Executor-side reader: one streamed parse of one archive. */
class WarcPartitionReader(
    file: String,
    schema: StructType,
    limit: Option[Int],
    conf: SerializableConfiguration) extends PartitionReader[InternalRow] {

  private val serializer =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  // per-field extractors resolved ONCE against the pruned schema
  private val getters: Array[Warc.WarcRecord => Any] =
    schema.fieldNames.map[Warc.WarcRecord => Any] {
      case "warc_file" => _.warc_file
      case "record_offset" => _.record_offset
      case "warc_type" => _.warc_type
      case "record_id" => _.record_id
      case "target_uri" => _.target_uri
      case "warc_date" => _.warc_date
      case "content_type" => _.content_type
      case "http_status" => _.http_status.map(Int.box).orNull
      case "http_content_type" => _.http_content_type
      case "payload" => _.payload
      case other => throw new IllegalArgumentException(
        s"graft-warc: unknown column '$other'")
    }

  private val (recordsAll, resource) = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    Warc.recordsWithResource(file, fs.open(p))
  }
  private val records = limit.map(recordsAll.take).getOrElse(recordsAll)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (records.hasNext) {
      val r = records.next()
      current = serializer(
        org.apache.spark.sql.Row.fromSeq(getters.map(_.apply(r)).toSeq)).copy()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit =
    try resource.close() catch { case _: Throwable => () }
}
