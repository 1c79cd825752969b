package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora: canonicalization, host/domain
  * extraction, and per-domain quotas. Crawl dedup lives or dies on URL
  * identity — the same page arrives as `HTTP://Example.com/a?utm_source=x`
  * and `http://example.com/a` — so canonicalization runs BEFORE
  * [[Dedup.exactDedup]] on the URL key, and domain extraction feeds the
  * "cap pages per site" step ([[Sampling.limitPerGroup]]).
  *
  * Everything here is pure codegen'd string expressions (regexp over a
  * handful of anchored, RE2-compatible patterns — each has an exact
  * DuckDB twin in the oracle), no UDFs, no shuffles. The per-domain
  * quota pays the one group-key exchange [[Sampling.limitPerGroup]]
  * documents.
  *
  * Deliberate limits, documented as contract:
  *  - inputs without a `scheme://` pass through trimmed but untouched
  *    (canonicalizing a relative reference needs a base URL this
  *    operator doesn't have);
  *  - percent-encoding is NOT normalized (`%2F` vs `/` can change which
  *    resource a server resolves — rewriting it is not safe);
  *  - [[registrableDomain]] approximates the public-suffix list with
  *    the dominant two-level suffixes (`co.uk`-style); the full Mozilla
  *    PSL is a data file, not an algorithm, and callers that need exact
  *    PSL semantics should map it in as a join table.
  */
object Urls {

  /** Query parameters that identify a click, not a resource — the usual
    * tracking families (utm_*, ad-click ids, mail/social share ids).
    */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port, leading `www.` stripped. Empty string when the input has no
    * `scheme://` authority.
    */
  def host(url: Column): Column = {
    val auth = regexp_extract(trim(coalesce(url, lit(""))),
      SchemeRe + "([^/?#]*)", 2)
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth), "^[^@]*@", ""),
        ":[0-9]+$", ""),
      "^www\\.", "")
  }

  /** Registrable ("site") domain of a URL: the last two host labels, or
    * three when the penultimate label is a common second-level suffix
    * (`example.co.uk`, `foo.com.au`). NULL when the input has no host.
    */
  def registrableDomain(url: Column): Column = domainOfHost(host(url))

  /** [[registrableDomain]] from an already-extracted host column. */
  def domainOfHost(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    val twoLevel = sld.isin("co", "com", "net", "org", "gov", "ac", "edu") &&
      length(tld) <= lit(3)
    when(h === "", lit(null).cast("string"))
      .when(n <= 2, h)
      .when(twoLevel, concat_ws(".",
        element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** Canonical form of an absolute URL:
    * scheme and host lowercased, userinfo and fragment dropped, default
    * ports (`:80` http, `:443` https) and leading `www.` removed, empty
    * path normalized to `/`, tracking parameters
    * ([[TrackingParamPattern]]) dropped, and surviving query parameters
    * sorted byte-wise so parameter order stops mattering. Path case and
    * percent-encoding are preserved (see the object doc for why).
    * Inputs without `scheme://` are returned trimmed, unchanged.
    */
  def canonicalizeUrl(url: Column): Column = {
    val raw = trim(coalesce(url, lit("")))
    val u = regexp_replace(raw, "#.*", "")
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val auth = lower(regexp_replace(
      regexp_extract(u, SchemeRe + "([^/?#]*)", 2), "^[^@]*@", ""))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val bareHost = regexp_replace(
      regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val hostPart = when(keepPort, concat(bareHost, lit(":"), port))
      .otherwise(bareHost)
    val pathq = regexp_extract(u, SchemeRe + "[^/?#]*([^#]*)", 2)
    val path = when(regexp_replace(pathq, "\\?.*", "") === "", lit("/"))
      .otherwise(regexp_replace(pathq, "\\?.*", ""))
    val params = array_sort(filter(
      split(regexp_extract(pathq, "\\?(.*)", 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern)))
    val qstr = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    // no-scheme inputs pass through with the FRAGMENT intact too — a
    // relative reference's '#' is still part of its identity, and the
    // contract is "trimmed, unchanged"
    when(scheme === "", raw)
      .otherwise(concat(scheme, lit("://"), hostPart, path, qstr))
  }

  /** Drop rows whose URL's host IS one of `blocked` or lives under one
    * (label-boundary suffix match: blocking `example.com` blocks
    * `a.example.com` but NOT `notexample.com`). The crawl blocklist /
    * allowlist-complement step. `blocked` entries are hosts or domains,
    * lowercased here; rows with no parseable host are KEPT (they are not
    * on the list — filter them separately if non-URLs should go too).
    * Pure per-row expressions against a literal array — list sizes in
    * the thousands stay well inside codegen; for list sizes in the
    * millions use an anti-join on [[registrableDomain]] instead.
    */
  def filterBlockedDomains(
      df: DataFrame,
      urlCol: String,
      blocked: Seq[String]): DataFrame = {
    // normalize entries the way blocklist FILES actually arrive:
    // whitespace-padded, leading-dot (".example.com") convention, mixed
    // case — un-normalized, such entries silently match nothing
    val norm = blocked.map(_.trim.toLowerCase.dropWhile(_ == '.'))
      .filter(_.nonEmpty).distinct
    if (norm.isEmpty) df
    else {
      val list = array(norm.map(lit(_)): _*)
      val h = host(col(urlCol))
      df.where(!exists(list, b =>
        h === b || h.endsWith(concat(lit("."), b))))
    }
  }

  /** Keep at most `n` rows per registrable domain of `urlCol`, best
    * first by `orderCols` — [[Sampling.limitPerGroup]] keyed on
    * [[registrableDomain]]. Rows whose URL yields no domain share one
    * NULL group (capped together; filter them first if that's wrong for
    * the pipeline). Adds the `domain` column to the output; an input
    * that ALREADY carries a `domain` column is refused loudly —
    * silently overwriting it would re-key the quota on the PSL-lite
    * approximation while the caller's column (say, an exact-PSL join)
    * still looks authoritative downstream. Cap on your own column with
    * [[Sampling.limitPerGroup]] directly.
    */
  def perDomainQuota(
      df: DataFrame,
      urlCol: String,
      n: Int,
      orderCols: Seq[Column]): DataFrame = {
    require(!df.columns.contains("domain"),
      "perDomainQuota derives and emits its own 'domain' column; the " +
        "input already has one — rename it, or cap on it directly with " +
        "Sampling.limitPerGroup")
    Sampling.limitPerGroup(
      df.withColumn("domain", registrableDomain(col(urlCol))),
      Seq("domain"), n, orderCols)
  }

  /** Raw `href` attribute values of the HTML, double- then single-quoted
    * attributes, in document order within each quoting style. Case
    * insensitive on the attribute name; whitespace around `=` allowed.
    */
  def hrefs(html: Column): Column = concat(
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1)),
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*'([^']*)'"), lit(1)))

  /** Resolve one href against its page's base URL — the crawl frontier /
    * link-graph edge step. Pure codegen'd string expressions with an
    * exact DuckDB twin; deliberately NOT full RFC 3986:
    *  - `&amp;` is entity-decoded (the one entity that routinely appears
    *    inside attribute values), fragments are dropped;
    *  - empty, fragment-only, and non-navigational schemes
    *    (javascript/mailto/data/tel) resolve to NULL;
    *  - absolute links pass through; `//` takes the base scheme; `/`
    *    takes scheme+authority; anything else appends to the base URL's
    *    directory (no `..` segment folding — crawl URLs that need it are
    *    rare enough to not be worth the expression-tree blowup);
    *  - the base's authority is used VERBATIM (no canonicalization) —
    *    run [[canonicalizeUrl]] on the output, exactly like any other
    *    crawled URL. A base without `scheme://` yields NULL.
    */
  def resolveLink(base: Column, href: Column): Column = {
    val l = regexp_replace(
      replace(trim(coalesce(href, lit(""))), lit("&amp;"), lit("&")),
      "#.*", "")
    val b = trim(coalesce(base, lit("")))
    val scheme = lower(regexp_extract(b, SchemeRe, 1))
    val auth = regexp_extract(b, SchemeRe + "([^/?#]*)", 2)
    val path = regexp_extract(b, SchemeRe + "[^/?#]*([^?#]*)", 2)
    val dir = when(path === "", lit("/"))
      .otherwise(regexp_replace(path, "[^/]*$", ""))
    when(scheme === "" || l === "" ||
        l.rlike("(?i)^(javascript|mailto|data|tel):"), lit(null).cast("string"))
      .when(l.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), l)
      .when(l.startsWith("//"), concat(scheme, lit(":"), l))
      .when(l.startsWith("/"), concat(scheme, lit("://"), auth, l))
      .otherwise(concat(scheme, lit("://"), auth, dir, l))
  }

  /** One row per resolvable link in `htmlCol`: all other columns pass
    * through, plus `outCol` with the [[resolveLink]]-resolved URL.
    * Dropped hrefs (NULL under [[resolveLink]]'s contract) emit no row.
    * Feeds the link graph ([[Graphs.pageRank]] on
    * (page domain, link domain) edges) and the crawl frontier. Narrow:
    * one Generate over the scan, zero exchanges.
    */
  def extractLinks(
      df: DataFrame,
      htmlCol: String,
      baseUrlCol: String,
      outCol: String = "link"): DataFrame = {
    val keep = df.columns.filterNot(_ == htmlCol).map(col)
    df.select(keep :+ explode(hrefs(col(htmlCol))).as("__rawhref"): _*)
      .withColumn(outCol, resolveLink(col(baseUrlCol), col("__rawhref")))
      .where(col(outCol).isNotNull)
      .drop("__rawhref")
  }

  /** ASCII (punycode) form of a URL's host
    * ([[graft.functions.IdnFunctions.punycodeHost]] over [[host]]) —
    * canonicalize internationalized hostnames BEFORE keying robots
    * evaluation, per-domain quotas, or host-level dedup; `münchen.de`
    * and `xn--mnchen-3ya.de` are the same site.
    */
  def asciiHost(url: Column): Column =
    graft.functions.IdnFunctions.punycodeHost(host(url))

  /** `<loc>` values of a sitemaps.org XML document as an array — both
    * urlset and sitemapindex entries. Handles CDATA wrappers and XML
    * entities (`&amp;` decoded LAST, the [[TextAnalysis.htmlToText]]
    * ordering rule — sitemap URLs legally carry `&amp;` in queries).
    * Pure regexp chain, mirrorable in SQL.
    */
  def sitemapLocs(xml: Column): Column =
    transform(
      regexp_extract_all(coalesce(xml, lit("")),
        lit("(?s)<loc>\\s*(.*?)\\s*</loc>"), lit(1)),
      l => {
        val noCdata = regexp_replace(l,
          "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$", "$1")
        Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
          .foldLeft(noCdata) { case (c, (pat, rep)) =>
            regexp_replace(c, pat, rep)
          }
      })

  /** Sitemap URL table: one row per `<loc>` — `(…, url, is_index)` with
    * `is_index` marking entries of a `<sitemapindex>` (pointers to MORE
    * sitemaps — feed them back through the fetcher; urlset entries feed
    * the crawl frontier). One projection + explode, no shuffle; the
    * crawl-frontier sibling of [[extractLinks]] and
    * [[graft.operators.Robots]].
    */
  def extractSitemapUrls(
      df: DataFrame,
      xmlCol: String,
      outCol: String = "url"): DataFrame = {
    val keep = df.columns.filterNot(_ == xmlCol).map(col)
    df.select(keep ++ Seq(
        explode(sitemapLocs(col(xmlCol))).as(outCol),
        coalesce(col(xmlCol), lit("")).rlike("(?s)<sitemapindex[\\s>]")
          .as("is_index")): _*)
      .where(col(outCol) =!= "")
  }
}
