package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val robotsTxt =
    """# example robots
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok$
      |
      |User-agent: *
      |Disallow: /
      |
      |User-agent: otherbot
      |User-agent: graftbot
      |Disallow: /archive/*.zip
      |""".stripMargin

  private def rules(ua: String = "graftbot") =
    Robots.parseRobots(
      Seq(("example.com", robotsTxt)).toDF("domain", "robots"),
      "domain", "robots", ua)

  test("group selection: named groups MERGE and beat the * group") {
    val r = rules().select("pattern", "allow").as[(String, Boolean)]
      .collect().toSet
    // both graftbot groups contribute; the * group's Disallow: / does not
    assert(r == Set(
      ("/private/", false),
      ("/private/ok$", true),
      ("/archive/*.zip", false)))
    // an unknown crawler falls back to the * group
    val star = rules("strangerbot").select("pattern", "allow")
      .as[(String, Boolean)].collect().toSeq
    assert(star == Seq(("/", false)))
  }

  test("longest-match decision with wildcards, end anchors, allow ties") {
    val urls = Seq(
      (1L, "https://example.com/"),                 // no match vs graftbot rules -> allowed
      (2L, "https://example.com/private/page"),     // Disallow /private/
      (3L, "https://example.com/private/ok"),       // Allow .../ok$ (longer) wins
      (4L, "https://example.com/private/okno"),     // $ anchor must NOT match
      (5L, "https://example.com/archive/a.zip"),    // wildcard disallow
      (6L, "https://example.com/archive/a.txt"),    // wildcard miss -> allowed
      (7L, "https://unlisted.org/anything")         // no robots -> allowed
    ).toDF("id", "url")
    val out = Robots.evaluate(urls, "url", rules())
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> true))
  }

  test("RFC details: empty Disallow allows all; orphan rules ignored; case-insensitive fields") {
    val txt =
      """DISALLOW: /orphan-before-any-group/
        |user-AGENT: graftbot
        |disallow:
        |ALLOW: /x
        |""".stripMargin
    val r = Robots.parseRobots(
      Seq(("site.org", txt)).toDF("domain", "robots"),
      "domain", "robots", "graftbot")
      .select("pattern", "allow").as[(String, Boolean)].collect().toSeq
    assert(r == Seq(("/x", true)),
      "empty disallow drops, orphan rule drops, lowercase fields parse")
    val verdict = Robots.evaluate(
      Seq((1L, "https://site.org/orphan-before-any-group/z")).toDF("id", "url"),
      "url", Robots.parseRobots(
        Seq(("site.org", txt)).toDF("domain", "robots"),
        "domain", "robots", "graftbot"))
      .select("robots_allowed").as[Boolean].head()
    assert(verdict, "orphan disallow must not bind")
  }

  test("a UTF-8 BOM before the first field does not break parsing") {
    val txt = "﻿" + "User-agent: graftbot\nDisallow: /x/\n"
    val r = Robots.parseRobots(
      Seq(("bom.org", txt)).toDF("domain", "robots"),
      "domain", "robots", "graftbot")
      .select("pattern", "allow").as[(String, Boolean)].collect().toSeq
    assert(r == Seq(("/x/", false)))
  }

  test("urlPath covers query strings and bare hosts; * userAgent rejected") {
    val paths = Seq(
      ("https://a.com", "/"),
      ("https://a.com/p/q?x=1", "/p/q?x=1"),
      ("https://a.com/#frag", "/")).toDF("url", "want")
      .select(Robots.urlPath(col("url")).as("got"), col("want"))
      .as[(String, String)].collect()
    paths.foreach { case (got, want) => assert(got == want, s"$got != $want") }
    intercept[IllegalArgumentException](rules("*"))
  }

  test("crawlDelays: applicable-group scope, conservative max, junk drops") {
    val txt =
      """Sitemap: https://example.com/sitemap.xml
        |User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x/
        |
        |User-agent: graftbot
        |Crawl-delay: 7
        |
        |User-agent: *
        |Crawl-delay: 99
        |
        |User-agent: otherbot
        |Crawl-delay: not-a-number
        |""".stripMargin
    val robots = Seq(("example.com", txt), ("nodelay.org", "User-agent: *\nDisallow:\n"))
      .toDF("domain", "robots")
    val d = Robots.crawlDelays(robots, "domain", "robots", "graftbot")
      .as[(String, Double)].collect().toMap
    assert(d == Map("example.com" -> 7.0),
      "merged graftbot groups take the MAX; the * group's 99 must not bind")
    val star = Robots.crawlDelays(robots, "domain", "robots", "strangerbot")
      .as[(String, Double)].collect().toMap
    assert(star == Map("example.com" -> 99.0))
    // sitemap directives are site-wide and group-independent
    val sm = Robots.sitemapDirectives(robots, "domain", "robots")
      .as[(String, String)].collect().toSeq
    assert(sm == Seq(("example.com", "https://example.com/sitemap.xml")))
  }

  test("filterAllowed keeps only fetchable URLs end to end") {
    val robots = Seq(("example.com", robotsTxt)).toDF("domain", "robots")
    val urls = Seq(
      (1L, "https://example.com/fine"),
      (2L, "https://example.com/private/x")).toDF("id", "url")
    val kept = Robots.filterAllowed(urls, "url", robots,
      "domain", "robots", "graftbot").select("id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }
}
