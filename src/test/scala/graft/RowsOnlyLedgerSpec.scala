package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the rows-only ledger: the queries that ship WITHOUT a DuckDB
  * oracle twin (the driver records a weaker rows-only check for them)
  * must be exactly the documented SQL-inexpressible set. Round 15's
  * close notes drifted (prose said 22, the driver record had 20)
  * because the set lived only in prose — this spec makes the ledger a
  * compile-checked artifact: adding a query without an oracle, or
  * documenting one that has an oracle, fails here with the exact diff.
  *
  * Every name in the pinned set carries scalatest coverage in its
  * operator spec (reference vectors, planted fixtures, recall floors,
  * round-trips) — rows-only means "DuckDB cannot express it", never
  * "unchecked".
  */
class RowsOnlyLedgerSpec extends AnyFunSuite {

  /** The documented SQL-inexpressible families:
    * - KMeans-seeded (driver kmeans/eigensolve loops): q_ann_ivf,
    *   q_ivfpq_topk, q_pq_topk, q_opq_topk, q_semantic_dedup,
    *   q_cluster_representatives, q_pca_project
    * - tokenizer training loops (BPE/WordPiece/Unigram):
    *   q_bpe_merges, q_bpe_merges_fast, q_bpe_encode, q_bpe_bytes,
    *   q_unigram_vocab, q_unigram_encode, q_wordpiece_vocab,
    *   q_wordpiece_encode, q_tokenizer_roundtrip
    * - PAV isotonic loop: q_calibrate
    * - sketch/codec blobs: q_distinct_rollup (HLL),
    *   q_compression_signal (deflate), q_cdc_dedup (gear hash)
    */
  private val documented = Set(
    "q_ann_ivf", "q_ivfpq_topk", "q_pq_topk", "q_opq_topk",
    "q_semantic_dedup", "q_cluster_representatives", "q_pca_project",
    "q_bpe_merges", "q_bpe_merges_fast", "q_bpe_encode", "q_bpe_bytes",
    "q_unigram_vocab", "q_unigram_encode", "q_wordpiece_vocab",
    "q_wordpiece_encode", "q_tokenizer_roundtrip",
    "q_calibrate", "q_distinct_rollup", "q_compression_signal",
    "q_cdc_dedup")

  test("rows-only queries are exactly the documented SQL-inexpressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = rowsOnly -- documented
    val stale = documented -- rowsOnly
    assert(undocumented.isEmpty,
      s"queries without an oracle twin that the ledger does not " +
        s"document: ${undocumented.toSeq.sorted.mkString(", ")} — add a " +
        "DuckDB twin or document the inexpressibility here AND in SCALE.md")
    assert(stale.isEmpty,
      s"ledger entries that now HAVE an oracle twin (or left the " +
        s"query set): ${stale.toSeq.sorted.mkString(", ")} — update this " +
        "spec and SCALE.md")
    assert(rowsOnly.size == 20, s"rows-only count drifted: ${rowsOnly.size}")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no duplicate keys in the SparkEntry source maps") {
    // a Scala Map literal keeps only the LAST binding for a duplicated
    // key — a duplicate would silently shadow an existing query or
    // oracle (round 16 nearly shipped a second q_gini this way). The
    // runtime map cannot see the collision, so lint the source.
    val src = {
      val s = scala.io.Source.fromFile(
        "src/main/scala/graft/SparkEntry.scala", "UTF-8")
      try s.mkString finally s.close()
    }
    val oracleStart = src.indexOf("def oracleSql")
    assert(oracleStart > 0)
    val key = """"(q[0-9a-z_]+)"\s*->""".r
    def dups(block: String): Seq[String] = {
      val keys = key.findAllMatchIn(block).map(_.group(1)).toSeq
      keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    }
    val qDups = dups(src.substring(0, oracleStart))
    val oDups = dups(src.substring(oracleStart))
    assert(qDups.isEmpty, s"duplicate query keys (later shadows " +
      s"earlier): ${qDups.mkString(", ")}")
    assert(oDups.isEmpty, s"duplicate oracle keys (later shadows " +
      s"earlier): ${oDups.mkString(", ")}")
  }
}
