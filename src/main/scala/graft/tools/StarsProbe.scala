package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: breaks q_dedup_clusters_stars' wall time into pair
  * generation, edge materialization, and the per-round loop, to localize
  * cold-start cost. Not part of the library surface.
  */
object StarsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.unionAll(docs.where(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" extra extra")).as("text")))
    val pairs = graft.operators.Dedup.minhashLshPairs(
      corpus, "doc_id", "text",
      numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.5)
    time("pairs.count")(println("pairs: " + pairs.count()))
    time("pairs.count again")(pairs.count())
    val edges = time("edges.checkpoint") {
      val e = pairs.select(col("id_a").as("s"), col("id_b").as("d"))
        .union(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
        .distinct()
        .localCheckpoint(true)
      println("edges: " + e.count())
      e
    }
    time("edges via pre-checkpoint") {
      val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
      val e = p.select(col("id_a").as("s"), col("id_b").as("d"))
        .union(p.select(col("id_b").as("s"), col("id_a").as("d")))
        .distinct()
        .localCheckpoint(true)
      println("edges2: " + e.count())
      e
    }
    // ---- replicate starsLoop with per-step timing ----
    val sigExprs = {
      val h = xxhash64(col("u"), col("v"))
      Seq(count(lit(1)).as("n"), bit_xor(h).as("x"),
        sum(pmod(h, lit(1000000007L))).as("s"))
    }
    val allNodes = time("allNodes") {
      edges.select(col("s").as("node")).distinct().localCheckpoint(true)
    }
    var cur = time("orient+distinct") {
      edges.select(greatest(col("s"), col("d")).as("u"), least(col("s"), col("d")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct().localCheckpoint(true)
    }
    time("initial sig")(cur.agg(sigExprs.head, sigExprs.tail: _*).head())
    for (i <- 0 until 4) {
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(least(col("u"), col("v"))).as("m"))
      val large = sym.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      val obs = org.apache.spark.sql.Observation(s"probe_$i")
      val mins2 = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(mins2, "u")
        .select(col("v").as("n"), col("m"))
        .union(mins2.select(col("u").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
        .observe(obs, sigExprs.head, sigExprs.tail: _*)
      val next = time(s"round $i checkpoint")(small.localCheckpoint(true))
      time(s"round $i obs.get")(obs.get)
      cur = next
    }
    spark.stop()
    sys.exit(0)
  }
}
