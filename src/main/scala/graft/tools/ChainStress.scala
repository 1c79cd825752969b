package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stress probe backing SCALE.md's adversarial-topology claim:
  * connected components over a single N-node chain (diameter N — the
  * worst case for label propagation, the motivating case for stars).
  * Prints rounds-equivalent wall time and validates the result shape.
  * Usage: runMain graft.tools.ChainStress [nNodes]
  */
object ChainStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2L * 1000 * 1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // chain i -> i+1, shuffled ids so locality doesn't trivialize it:
    // node id = (i * PRIME) % n keeps the chain structure but scatters ids
    val prime = 1000003L
    require(BigInt(n).gcd(BigInt(prime)) == 1,
      s"n=$n shares a factor with the scrambling prime $prime - ids would " +
        "collide and the probe's own asserts would fire on a correct result")
    val edges = spark.range(n - 1).select(
      ((col("id") * prime) % n).as("a"),
      (((col("id") + 1) * prime) % n).as("b"))
    val t0 = System.nanoTime()
    val comps = graft.operators.Dedup.connectedComponents(
      edges.toDF(), "a", "b", algorithm = "stars")
    val distinct = comps.select("comp").distinct().count()
    val nodes = comps.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[chain-stress] n=$n nodes=$nodes components=$distinct took $sec%.1f s")
    assert(distinct == 1, s"one chain must collapse to one component, got $distinct")
    assert(nodes == n, s"every node labeled, got $nodes of $n")
    println("[chain-stress] OK")
    spark.stop()
    sys.exit(0)
  }
}
