package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal CLI mirroring the reference's Typer commands
  * (src/spark_fuse/tools/cli.py): `datasources` lists the registered
  * formats, `read` previews a connector load.
  *
  * Usage:
  *   graft.tools.Cli datasources
  *   graft.tools.Cli read --format rest|sparql|qdrant --config <json> [--n 10]
  */
object Cli {

  private val Formats = Map(
    "rest" -> ("graft-rest", graft.io.rest.RestApi.ConfigOption),
    "sparql" -> ("graft-sparql", graft.io.sparql.Sparql.ConfigOption),
    "qdrant" -> ("graft-qdrant", graft.io.qdrant.Qdrant.ConfigOption))

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("datasources") =>
      Formats.foreach { case (name, (format, opt)) =>
        // scalastyle:off println
        println(f"$name%-8s format=$format%-14s configOption=$opt")
      // scalastyle:on println
      }
    case Some("read") =>
      val opts = args.drop(1).sliding(2, 2).collect {
        case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      }.toMap
      val fmt = opts.getOrElse("format",
        sys.error("--format is required (rest|sparql|qdrant)"))
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
    case _ =>
      System.err.println("usage: graft.tools.Cli datasources | read --format f --config json [--n 10]")
      sys.exit(2)
  }
}
