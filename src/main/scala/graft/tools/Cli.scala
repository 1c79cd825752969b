package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal CLI mirroring the reference's Typer commands
  * (src/spark_fuse/tools/cli.py): `datasources` lists the registered
  * formats, `read` previews a connector load — extended with the
  * round-10 ops audits: `layout` prints the parquet layout report,
  * `fingerprint` the order-free corpus digest (compare two tables'
  * lines to verify a replication).
  *
  * Usage:
  *   graft.tools.Cli datasources
  *   graft.tools.Cli read --format rest|sparql|qdrant --config <json> [--n 10]
  *   graft.tools.Cli layout --path <parquet-dir> [--n 50]
  *   graft.tools.Cli fingerprint --path <parquet-dir> --cols a,b,c
  */
object Cli {

  private val Formats = Map(
    "rest" -> ("graft-rest", graft.io.rest.RestApi.ConfigOption),
    "sparql" -> ("graft-sparql", graft.io.sparql.Sparql.ConfigOption),
    "qdrant" -> ("graft-qdrant", graft.io.qdrant.Qdrant.ConfigOption),
    "warc" -> ("graft-warc", "path"))

  private def optMap(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("datasources") =>
      Formats.foreach { case (name, (format, opt)) =>
        // scalastyle:off println
        println(f"$name%-8s format=$format%-14s configOption=$opt")
      // scalastyle:on println
      }
    case Some("read") =>
      val opts = optMap(args.drop(1))
      val fmt = opts.getOrElse("format",
        sys.error("--format is required (rest|sparql|qdrant|warc)"))
      val (format, configOption) = Formats.getOrElse(fmt,
        sys.error(s"unknown format '$fmt'"))
      val config = opts.getOrElse("config", sys.error("--config is required"))
      val n = opts.getOrElse("n", "10").toInt
      val spark = graft.core.Sessions.createSession("graft-cli")
      try {
        val df = spark.read.format(format).option(configOption, config).load()
        df.show(n, truncate = false)
        df.printSchema()
      } finally spark.stop()
    case Some("layout") =>
      val opts = optMap(args.drop(1))
      val path = opts.getOrElse("path", sys.error("--path is required"))
      val n = opts.getOrElse("n", "50").toInt
      val spark = graft.core.Sessions.createSession("graft-cli")
      try graft.operators.Compaction.layoutReport(spark, path)
        .orderBy("file", "row_group", "column").show(n, truncate = false)
      finally spark.stop()
    case Some("fingerprint") =>
      val opts = optMap(args.drop(1))
      val path = opts.getOrElse("path", sys.error("--path is required"))
      val cols = opts.getOrElse("cols", sys.error("--cols is required"))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val spark = graft.core.Sessions.createSession("graft-cli")
      try graft.operators.Validation
        .corpusFingerprint(spark.read.parquet(path), cols)
        .show(truncate = false)
      finally spark.stop()
    case Some("shards") =>
      // balance audit of a writeShards/appendToShards layout, straight
      // off the manifest — no Spark session, no data scan
      val opts = optMap(args.drop(1))
      val path = opts.getOrElse("path", sys.error("--path is required"))
      val conf = new org.apache.hadoop.conf.Configuration()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val manifest = graft.io.Sidecar.read(fs, dir,
        graft.operators.Packing.ShardManifestFileName)
        .getOrElse(sys.error(s"no shard manifest at $path"))
      val node = graft.io.Json.parse(manifest)
      val shards = {
        import scala.jdk.CollectionConverters._
        node.get("shards").elements().asScala.map(e =>
          (e.get("shard").asLong(), e.get("rows").asLong(),
            e.get("tokens").asLong())).toSeq
      }
      // scalastyle:off println
      println(s"num_shards=${node.get("num_shards").asInt()} " +
        s"token_col=${node.get("token_col").asText()} " +
        s"salt=${node.get("salt").asText()}")
      shards.foreach { case (s, r, t) =>
        println(f"shard=$s%-4d rows=$r%-10d tokens=$t%d")
      }
      if (shards.nonEmpty) {
        val toks = shards.map(_._3)
        println(s"total_tokens=${toks.sum} min=${toks.min} max=${toks.max} " +
          s"spread=${toks.max - toks.min}")
      }
      // scalastyle:on println
    case Some("compact") =>
      val opts = optMap(args.drop(1))
      val kind = opts.getOrElse("kind", sys.error(
        "--kind is required (" +
          graft.operators.Maintenance.Kinds.keys.toSeq.sorted.mkString("|") +
          ")"))
      val path = opts.getOrElse("path", sys.error("--path is required"))
      val target = opts.get("target").map(_.toLong).getOrElse(128L << 20)
      val spark = graft.core.Sessions.createSession("graft-cli")
      try graft.operators.Maintenance.compact(spark, kind, path, target)
      finally spark.stop()
    case _ =>
      System.err.println(
        "usage: graft.tools.Cli datasources | read --format f --config json " +
          "[--n 10] | layout --path p [--n 50] | fingerprint --path p " +
          "--cols a,b | shards --path p | compact --kind k --path p " +
          "[--target bytes]")
      sys.exit(2)
  }
}
