package graft.operators

import org.apache.spark.sql.SparkSession

/** One policy-driven entry point for the append-log family's
  * small-file decay: every incremental layout in the library (MinHash
  * dedup index segments, BM25 search segments, substring window-hash
  * indexes, funnel/retention stat logs) accretes per-batch files that
  * eventually want folding, each with its own compactor and its own
  * safety contract. This dispatcher gives operations ONE nightly loop
  * over `(kind, path)` pairs instead of four bespoke jobs.
  *
  * The per-kind contracts still apply (notably: segment-index
  * compaction only when the stream's checkpoint has advanced past every
  * ingested batch — see [[Search.compactSegments]] /
  * [[DedupIndex.compactIndex]]; stat logs are safe at any time).
  * Unknown kinds fail loud — a typo must not silently skip maintenance.
  */
object Maintenance {

  /** kind → compactor. All compactors share the (spark, path,
    * targetFileBytes) shape and the crash-safe staging-swap discipline.
    */
  val Kinds: Map[String, (SparkSession, String, Long) => Unit] = Map(
    "dedup-index" -> ((s, p, t) => DedupIndex.compactIndex(s, p, t)),
    "search-index" -> ((s, p, t) => Search.compactSegments(s, p, t)),
    "substr-index" -> ((s, p, t) => ExactSubstrings.compactSubstrIndex(s, p, t)),
    "stat-log" -> ((s, p, t) =>
      graft.streaming.StreamingOps.compactStatLog(s, p, t)),
    // cell balance, not file size: the byte target does not apply (an
    // IVF-PQ layout's decay dial is appendBatch drift, measured by
    // cellStats ratios); defaults split > 4x-mean cells, <= 16 a night
    "ivfpq-balance" -> ((s, p, _) => { Ann.IvfPq.splitOversizedCells(s, p); () }))

  def compact(
      spark: SparkSession,
      kind: String,
      path: String,
      targetFileBytes: Long = 128L << 20): Unit =
    Kinds.getOrElse(kind, sys.error(
      s"Maintenance.compact: unknown kind `$kind` — " +
        s"one of ${Kinds.keys.toSeq.sorted.mkString(", ")}"))(
      spark, path, targetFileBytes)

  /** The nightly loop: compact every listed layout in order, failing
    * loud on the FIRST error (a half-maintained fleet should page, not
    * limp).
    */
  def compactAll(
      spark: SparkSession,
      layouts: Seq[(String, String)],
      targetFileBytes: Long = 128L << 20): Unit =
    layouts.foreach { case (kind, path) =>
      compact(spark, kind, path, targetFileBytes)
    }
}
