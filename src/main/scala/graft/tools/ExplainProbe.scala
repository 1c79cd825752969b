package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of named
  * `SparkEntry.queries` entries. The FINAL query is not executed, but
  * building a query's DataFrame runs whatever preparatory jobs its
  * operator performs eagerly (KMeans fits, compaction writes,
  * connected-components iterations, …) — probing such queries on a large
  * sfDir costs real time; prefer sf0.001/sf0.01 for plan shape.
  *
  * Usage: `runMain graft.tools.ExplainProbe <sfDir> <q_name>[,<q_name>...]`
  *
  * What to look for (the 100 TB checklist): `PushedFilters` non-empty on
  * parquet scans under a filter, `ReadSchema` pruned to the projected
  * columns, `WholeStageCodegen` spans covering the hot expressions, no
  * `CartesianProduct`, small join sides `BroadcastExchange`d, shuffle
  * count no higher than the operator's documented minimum.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExplainProbe <sfDir> <q_name>[,<q_name>...]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try names.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
