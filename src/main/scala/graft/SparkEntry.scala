package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.entries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets a `queries` entry exercising it on
  * the driver testdata, plus (where SQL-expressible) a DuckDB `oracleSql`
  * equivalent. Column names are aliased identically on both sides — the
  * driver's comparator sorts columns by name before hashing.
  *
  * The entries themselves live in per-domain objects under
  * [[graft.entries]] (ReferenceEntries, TextEntries, DedupEntries,
  * AnnEntries, EvalEntries, GraphEntries, StatsEntries,
  * PipelineEntries) — this object composes their maps. Duplicate keys
  * across files would shadow silently under `++`, so
  * RowsOnlyLedgerSpec lints the sources for global key uniqueness.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  private[graft] def warmSharedArtifacts(s: SparkSession, dir: String): Unit =
    EntryHelpers.warmSharedArtifacts(s, dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceEntries.queries ++ TextEntries.queries ++
      DedupEntries.queries ++ AnnEntries.queries ++ EvalEntries.queries ++
      GraphEntries.queries ++ StatsEntries.queries ++ PipelineEntries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ReferenceEntries.oracleSql ++ TextEntries.oracleSql ++
      DedupEntries.oracleSql ++ AnnEntries.oracleSql ++
      EvalEntries.oracleSql ++ GraphEntries.oracleSql ++
      StatsEntries.oracleSql ++ PipelineEntries.oracleSql
}
