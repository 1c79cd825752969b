package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle/engine *type* contract: DuckDB widens `sum()` over any
  * integer column to HUGEINT (which surfaces as float64/object in the
  * driver's comparison and hash-mismatches Spark's BIGINT), so every
  * integer-summing aggregate in [[SparkEntry.oracleSql]] must carry an
  * explicit cast — `CAST(sum(..) .. AS BIGINT)` or `(..sum(..)..)::BIGINT`.
  * Sums over double-typed columns keep DOUBLE on both engines and are
  * exempt via an explicit allowlist. This lint exists because the class of
  * bug it catches (values identical, hashes diverging on width alone)
  * cost two red CORRECTNESS rows before being diagnosed.
  */
class OracleTypeContractSpec extends AnyFunSuite {

  /** Sum arguments known to be DOUBLE-typed in the test tables (TPC-H
    * monetary/quantity columns, the events `value` column, per-doc double
    * scores, vector components) — DuckDB sums these as DOUBLE, no cast
    * needed. Extend CONSCIOUSLY: adding an integer column here re-opens
    * the HUGEINT hole this spec plugs.
    */
  private val doubleArg =
    ("""l_quantity|l_extendedprice|l_discount|o_totalprice|value""" +
      """|x \* s|\d\.\d|rrf_contrib""" +
      // q_pagerank_weighted's edge weight: built as count(*)::DOUBLE in
      // its pairs CTE, so DuckDB sums DOUBLE — anchored to the bare
      // column so no other integer arg can ride this exemption
      """|^w$""" +
      // q_betweenness: σ path counts are DOUBLE by design (2^53-guarded
      // integer-valued doubles) — anchored to the bare column
      """|^sigma$""").r

  /** (start, argument, tail) for each `sum(`/top-level aggregate call —
    * `list_sum` etc. are DuckDB list ops over doubles, excluded by the
    * lookbehind. `tail` is the 60 chars after the balanced close, enough
    * to see a trailing `::BIGINT` even through a `coalesce(...)` wrapper.
    */
  private def sums(sql: String): Seq[(Int, String, String)] = {
    val m = """(?i)(?<![A-Za-z0-9_])sum\s*\(""".r
    m.findAllMatchIn(sql).map { hit =>
      val open = sql.indexOf('(', hit.start)
      var depth = 1
      var i = open + 1
      while (depth > 0 && i < sql.length) {
        sql(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val arg = sql.substring(open + 1, i - 1)
      // 120 chars: enough to see the cast terminator through a full
      // window clause (OVER (ORDER BY .. ROWS BETWEEN ..) AS BIGINT)
      val tail = sql.substring(i, math.min(sql.length, i + 120))
      (hit.start, arg, tail)
    }.toSeq
  }

  private def isCast(sql: String, start: Int, arg: String, tail: String): Boolean = {
    val before = sql.substring(0, start).replaceAll("\\s+$", "").toLowerCase
    val t = tail.toLowerCase.replaceAll("\\s+", " ")
    before.endsWith("cast(") ||
      t.contains("::bigint") || t.contains("as bigint") ||
      // an explicit HUGEINT cast marks a DELIBERATE decimal(38,0) twin —
      // the Spark side sums decimal(38,0) (q_brier's squared-micros
      // numerator), so the widths agree by construction; the cast makes
      // the intent grep-able instead of riding DuckDB's silent widening
      t.contains("::hugeint") || t.contains("as hugeint") ||
      // CAST(sum(..) OVER (..) .. AS BIGINT): the close lands before OVER,
      // so look for the cast terminator through the window clause too
      (before.contains("cast(") &&
        (t.contains(" as bigint") || t.contains(" as hugeint")))
  }

  test("every integer sum() in oracleSql is explicitly cast to BIGINT") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        sums(sql).collect {
          case (start, arg, tail)
            if doubleArg.findFirstIn(arg).isEmpty &&
              !isCast(sql, start, arg, tail) =>
            s"$name: sum($arg) — integer sum without an explicit BIGINT " +
              "cast (DuckDB widens to HUGEINT and the value-hash diverges)"
        }
    }
    assert(violations.isEmpty, "\n" + violations.mkString("\n"))
  }

  test("queries and oracleSql stay aligned (every oracle names a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
