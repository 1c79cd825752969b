package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309, "Robots Exclusion Protocol") — the
  * politeness gate at the very front of a crawl pipeline: parse each
  * site's robots.txt ONCE into a rule table, then evaluate millions of
  * candidate URLs against it relationally (no per-URL re-parsing, no
  * driver loops).
  *
  * Semantics implemented from the public RFC:
  *  - groups: consecutive `User-agent:` lines open a group; `Allow:` /
  *    `Disallow:` lines attach to the most recent group. Other fields
  *    and `#` comments are ignored.
  *  - group selection: the group naming the crawler's product token
  *    (case-insensitive exact) wins over the `*` group; absent both, the
  *    site is unrestricted.
  *  - rule matching: path patterns support `*` (any span) and a trailing
  *    `$` (end anchor), matched from the path start.
  *  - decision: the LONGEST matching pattern (by octets, the RFC's
  *    specificity rule) wins; a length tie resolves to Allow; no match
  *    ⇒ allowed; `Disallow:` with an empty value ⇒ allow-all.
  *
  * Scale shape: rules-per-domain is tiny (robots files are KBs); the URL
  * table is the big side. [[evaluate]] joins URLs to rules on the domain
  * key — one URL-table exchange (or none when the rule side broadcasts)
  * — and resolves the longest-match winner with a per-URL max_by, not a
  * window over the corpus.
  */
object Robots {

  /** Parse a (domain, robots.txt text) table into an applicable rule
    * table `(domain, pattern, allow, pattern_len, matches_re)` for
    * `userAgent`. Domains whose selected group has no rules (or that
    * have no applicable group) contribute NO rows — absent rows mean
    * unrestricted, exactly the RFC default.
    */
  /** Parsed relevant lines: `(__dom, __ln, __field, __value)` for the
    * fields this module understands (directive lines like `Crawl-delay`
    * count as group members — a user-agent line after one starts a NEW
    * group, the conventional reading).
    */
  private def relevantLines(
      robots: DataFrame,
      domainCol: String,
      textCol: String): DataFrame =
    robots.select(col(domainCol).as("__dom"),
        posexplode(split(coalesce(col(textCol), lit("")), "\r?\n"))
          .as(Seq("__ln", "__raw")))
      // strip a leading UTF-8 BOM (robots.txt in the wild routinely
      // starts with one — it would glue onto the first field name),
      // then comments; "field: value" (field names case-insensitive)
      .withColumn("__line", trim(regexp_replace(
        regexp_replace(col("__raw"), "^\\uFEFF", ""), "#.*$", "")))
      .withColumn("__field",
        lower(trim(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1))))
      .withColumn("__value",
        trim(regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .where(col("__field").isin(
        "user-agent", "allow", "disallow", "crawl-delay", "sitemap"))

  /** Group lines by the RFC's consecutive-user-agent rule; `Sitemap`
    * lines are site-wide per convention and carry NO group binding, so
    * they are excluded here.
    */
  private def groupedLines(lines: DataFrame): DataFrame = {
    val groupable = lines.where(col("__field") =!= "sitemap")
    // a group starts at a user-agent line NOT preceded by another
    // user-agent line: running count of group starts = group id
    val byDomain = Window.partitionBy("__dom").orderBy("__ln")
    groupable
      .withColumn("__prevField", lag(col("__field"), 1).over(byDomain))
      .withColumn("__gstart",
        (col("__field") === "user-agent" &&
          (col("__prevField").isNull ||
            col("__prevField") =!= "user-agent")).cast("int"))
      .withColumn("__gid", sum(col("__gstart")).over(
        byDomain.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("__gid") >= 1) // rules before any user-agent line are orphans
  }

  /** Applicable group ids per domain for `userAgent`: the named level
    * beats the `*` level, and ALL groups at the winning level merge
    * their rules (RFC 9309: "the matching groups' rules MUST be
    * combined").
    */
  private def applicableGroups(grouped: DataFrame, ua: String): DataFrame = {
    val groupUa = grouped.where(col("__field") === "user-agent")
      .groupBy("__dom", "__gid")
      .agg(
        max(when(lower(col("__value")) === ua, 1).otherwise(0)).as("__named"),
        max(when(col("__value") === "*", 1).otherwise(0)).as("__star"))
    val domLevel = groupUa.groupBy("__dom")
      .agg(max(col("__named")).as("__useNamed"))
    groupUa.join(domLevel, "__dom")
      .where((col("__useNamed") === 1 && col("__named") === 1) ||
        (col("__useNamed") === 0 && col("__star") === 1))
      .select(col("__dom"), col("__gid"))
  }

  private def requireUa(userAgent: String): String = {
    require(userAgent.nonEmpty && userAgent != "*",
      "userAgent must be a concrete product token (the * group is the fallback)")
    userAgent.toLowerCase
  }

  def parseRobots(
      robots: DataFrame,
      domainCol: String,
      textCol: String,
      userAgent: String): DataFrame = {
    val ua = requireUa(userAgent)
    val grouped = groupedLines(relevantLines(robots, domainCol, textCol))
    val rules = grouped
      .where(col("__field").isin("allow", "disallow"))
      .join(applicableGroups(grouped, ua), Seq("__dom", "__gid"))
      // empty Disallow value = allow-all (contributes no restriction);
      // empty Allow likewise matches nothing per the RFC
      .where(col("__value") =!= "")
      .select(col("__dom").as("domain"),
        col("__value").as("pattern"),
        (col("__field") === "allow").as("allow"),
        octet_length(col("__value")).cast("long").as("pattern_len"))
    rules.withColumn("matches_re", patternToRegex(col("pattern")))
  }

  /** Per-domain crawl delay for `userAgent` (the non-RFC but universal
    * politeness directive): the MAX delay across the applicable groups
    * — the conservative reading when merged groups disagree.
    * Non-numeric values drop; domains without an applicable delay are
    * absent (crawl at your default rate).
    */
  def crawlDelays(
      robots: DataFrame,
      domainCol: String,
      textCol: String,
      userAgent: String): DataFrame = {
    val ua = requireUa(userAgent)
    val grouped = groupedLines(relevantLines(robots, domainCol, textCol))
    grouped.where(col("__field") === "crawl-delay")
      .join(applicableGroups(grouped, ua), Seq("__dom", "__gid"))
      // try_cast: junk values drop (ANSI cast would abort the whole job
      // over one malformed robots line on a remote site)
      .withColumn("__delay", expr("try_cast(__value AS double)"))
      .where(col("__delay").isNotNull && col("__delay") >= 0)
      .groupBy(col("__dom").as("domain"))
      .agg(max(col("__delay")).as("crawl_delay_s"))
  }

  /** Site-wide `Sitemap:` directives — one row per (domain, sitemap
    * URL), group-independent per the sitemaps.org convention; feed them
    * to [[Urls.extractSitemapUrls]] after fetching.
    */
  def sitemapDirectives(
      robots: DataFrame,
      domainCol: String,
      textCol: String): DataFrame =
    relevantLines(robots, domainCol, textCol)
      .where(col("__field") === "sitemap" && col("__value") =!= "")
      .select(col("__dom").as("domain"), col("__value").as("sitemap"))
      .distinct()

  /** robots path pattern → anchored Java regex: regex metacharacters
    * escaped, `*` → `.*`, one trailing `$` restored as an end anchor.
    */
  private[operators] def patternToRegex(pattern: Column): Column = {
    val escaped = regexp_replace(pattern,
      "[\\\\.\\[\\]\\{\\}\\(\\)\\<\\>\\+\\-\\=\\!\\?\\^\\$\\|]", "\\\\$0")
    val endAnchored = regexp_replace(escaped, "\\\\\\$$", "\\$")
    concat(lit("^"), regexp_replace(endAnchored, "\\*", ".*"))
  }

  /** Path (+ `?query`) of a URL — the byte sequence robots rules match
    * against; `/` when the URL has no path.
    */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(trim(coalesce(url, lit(""))),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Evaluate `urls` against parsed rules: appends `robots_allowed`.
    * URLs of hosts with no rules are allowed (the RFC default). The join
    * key is the HOST of `urlCol` ([[Urls.host]]) — robots.txt scope is
    * the authority, not the registrable domain (crawl.example.com and
    * www.example.com each have their own file); key the robots table by
    * the same normalized host. Fully identical input rows regroup to one
    * output row (keep an id column, the corpus-wide convention, if exact
    * multiplicity matters).
    */
  def evaluate(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame): DataFrame = {
    val keyed = urls
      .withColumn("__dom", Urls.host(col(urlCol)))
      .withColumn("__path", urlPath(col(urlCol)))
    // longest matching rule per URL via max_by over (len, allow-tiebreak):
    // rank = len * 2 + allow, so an equal-length Allow outranks Disallow
    val matched = keyed
      .join(rules, keyed("__dom") === rules("domain"), "left")
      .withColumn("__hit", col("matches_re").isNotNull &&
        regexp_like(col("__path"), col("matches_re")))
      .groupBy(keyed.columns.map(col): _*)
      .agg(max_by(
        when(col("__hit"), col("allow")),
        when(col("__hit"),
          col("pattern_len") * 2 + col("allow").cast("long"))).as("__verdict"))
    matched
      .withColumn("robots_allowed", coalesce(col("__verdict"), lit(true)))
      .drop("__dom", "__path", "__verdict")
  }

  /** One-call politeness filter: keep only fetchable URLs. */
  def filterAllowed(
      urls: DataFrame,
      urlCol: String,
      robots: DataFrame,
      domainCol: String,
      textCol: String,
      userAgent: String): DataFrame =
    evaluate(urls, urlCol, parseRobots(robots, domainCol, textCol, userAgent))
      .where(col("robots_allowed")).drop("robots_allowed")
}
