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
    *   q_cluster_representatives, q_pca_project, q_ann_recall_table
    *   (the recall regression table builds all four index kinds)
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
    "q_ann_recall_table",
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
    assert(rowsOnly.size == 21, s"rows-only count drifted: ${rowsOnly.size}")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no duplicate keys across the entry source maps") {
    // a Scala Map literal keeps only the LAST binding for a duplicated
    // key — a duplicate would silently shadow an existing query or
    // oracle (round 16 nearly shipped a second q_gini this way), and
    // since the split into per-domain entry objects the same shadowing
    // can happen ACROSS files through SparkEntry's `++` composition.
    // The runtime map cannot see the collision, so lint the sources:
    // keys are collected GLOBALLY over every file, per map kind.
    val files = new java.io.File("src/main/scala/graft/entries")
      .listFiles().toSeq.filter(_.getName.endsWith("Entries.scala"))
      .sortBy(_.getName)
    assert(files.size >= 8, s"expected the 8 domain entry files, got " +
      s"${files.map(_.getName).mkString(", ")}")
    val key = """"(q[0-9a-z_]+)"\s*->""".r
    def keysOf(block: String): Seq[String] =
      key.findAllMatchIn(block).map(_.group(1)).toSeq
    val (qKeys, oKeys) = files.foldLeft(
      (Seq.empty[String], Seq.empty[String])) { case ((qs, os), f) =>
      val src = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.mkString finally s.close()
      }
      val oracleStart = src.indexOf("def oracleSql")
      assert(oracleStart > 0, s"${f.getName}: no oracleSql map")
      (qs ++ keysOf(src.substring(0, oracleStart)),
        os ++ keysOf(src.substring(oracleStart)))
    }
    def dups(keys: Seq[String]): Seq[String] =
      keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups(qKeys).isEmpty, s"duplicate query keys (later shadows " +
      s"earlier): ${dups(qKeys).mkString(", ")}")
    assert(dups(oKeys).isEmpty, s"duplicate oracle keys (later shadows " +
      s"earlier): ${dups(oKeys).mkString(", ")}")
    // and the source census must equal the runtime maps: an entry that
    // never reaches SparkEntry's composition (forgotten `++` operand)
    // would otherwise vanish silently
    assert(qKeys.toSet == SparkEntry.queries.keySet,
      s"source/runtime query-key drift: only-in-source ${
        (qKeys.toSet -- SparkEntry.queries.keySet).toSeq.sorted.mkString(", ")
      }; only-in-runtime ${
        (SparkEntry.queries.keySet -- qKeys.toSet).toSeq.sorted.mkString(", ")}")
    assert(oKeys.toSet == SparkEntry.oracleSql.keySet,
      s"source/runtime oracle-key drift: only-in-source ${
        (oKeys.toSet -- SparkEntry.oracleSql.keySet).toSeq.sorted.mkString(", ")
      }; only-in-runtime ${
        (SparkEntry.oracleSql.keySet -- oKeys.toSet).toSeq.sorted.mkString(", ")}")
  }
}
