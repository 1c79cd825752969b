package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool (guide §7.1 substitute — the UI is disabled in this sandbox):
  * run a SparkEntry query, time it, and dump the EXECUTED plan tree with
  * each operator's runtime SQL metrics (rows, time, spill, broadcast …),
  * so per-operator cost is attributable without the SQL tab.
  *
  * Usage: runMain graft.Profile <sfDir> <queryName> [<queryName> ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: Profile <sfDir> <query> [...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job wall clock: iterative operators split into many jobs whose
    // cost the final plan's metrics cannot see — log each as it ends
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobStart.put(js.jobId, (System.nanoTime(), site)): Unit
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = jobStart.remove(je.jobId)
          if (v != null) {
            val sec = (System.nanoTime() - v._1) / 1e9
            if (sec > 0.05)
              println(f"  [job ${je.jobId}%4d] $sec%7.3f s  ${v._2}")
          }
        }
      })
    def dump(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter(_._2.value > 0)
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(", ")
      println(("  " * depth) + p.nodeName + (if (ms.isEmpty) "" else s"  [$ms]"))
      p match {
        case a: AdaptiveSparkPlanExec => dump(a.executedPlan, depth + 1)
        case q: QueryStageExec => dump(q.plan, depth + 1)
        case _ => p.children.foreach(dump(_, depth + 1))
      }
      p.subqueries.foreach { sq =>
        println(("  " * (depth + 1)) + "SUBQUERY:")
        dump(sq, depth + 2)
      }
    }
    names.foreach { name =>
      println(s"\n========== $name ==========")
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"wall: $sec%.2f s")
      val phases = df.queryExecution.tracker.phases
      println(phases.toSeq.sortBy(_._1).map { case (ph, s) =>
        f"$ph=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2fs"
      }.mkString("driver phases: ", ", ", ""))
      dump(df.queryExecution.executedPlan, 0)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
