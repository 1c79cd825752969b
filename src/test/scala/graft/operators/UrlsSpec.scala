package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Urls.canonicalizeUrl(col("u"))).head.getString(0)
  private def dom(u: String): Option[String] =
    Option(Seq(u).toDF("u").select(Urls.registrableDomain(col("u"))).head.getString(0))

  test("canonicalizeUrl: case, ports, www, fragment, tracking, param order") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/1?utm_source=x&b=2&a=1#frag")
      == "https://example.com/Path/1?a=1&b=2")
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    // non-default port survives; userinfo does not
    assert(canon("http://user:pw@example.com:8080/x?z=1&y=2&gclid=abc")
      == "http://example.com:8080/x?y=2&z=1")
    // empty path -> "/", all-tracking query -> dropped entirely
    assert(canon("https://example.org?fbclid=1") == "https://example.org/")
    // path case and percent-encoding preserved
    assert(canon("https://example.com/A%2Fb") == "https://example.com/A%2Fb")
    // no scheme -> trimmed passthrough, FRAGMENT INCLUDED (a relative
    // reference's '#' is part of its identity)
    assert(canon("  not a url 42 ") == "not a url 42")
    assert(canon("page.html#section2") == "page.html#section2")
  }

  test("registrableDomain: two-level suffixes, subdomains, no host") {
    assert(dom("https://cdn.a.example.org/x").contains("example.org"))
    assert(dom("http://a.b.example.co.uk/").contains("example.co.uk"))
    assert(dom("http://example.com").contains("example.com"))
    assert(dom("http://localhost/x").contains("localhost"))
    assert(dom("plain text").isEmpty)
  }

  test("filterBlockedDomains blocks hosts and subdomains at label boundaries") {
    val df = Seq(
      (1L, "https://example.com/a"),
      (2L, "https://a.b.example.com/x"),
      (3L, "https://notexample.com/y"),
      (4L, "https://WWW.Example.COM/z"),
      (5L, "plain text no host"),
      (6L, "https://other.org/")
    ).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url", Seq("Example.com"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(3L, 5L, 6L))
    // blocklist-file conventions normalize: leading dot, padding, case
    val kept2 = Urls.filterBlockedDomains(df, "url", Seq(" .Example.COM "))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept2.toSeq == Seq(3L, 5L, 6L))
    // empty blocklist (and all-empty entries) is the identity
    assert(Urls.filterBlockedDomains(df, "url", Nil).count() == 6)
    assert(Urls.filterBlockedDomains(df, "url", Seq(" . ", "")).count() == 6)
  }

  test("perDomainQuota caps per registrable domain, best-first") {
    val df = (1 to 10).map { i =>
      (i.toLong, s"https://h$i.example.com/p")
    }.toDF("id", "url")
      .union(Seq((99L, "https://only.example.org/")).toDF("id", "url"))
    val out = Urls.perDomainQuota(df, "url", 3, Seq(col("id")))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 99L))
    assert(out.map(_.getString(2)).distinct.sorted.toSeq ==
      Seq("example.com", "example.org"))
  }

  test("resolveLink: every resolution class and every drop class") {
    val base = "https://www.site.example/docs/guide/page.html?q=1#sec"
    val cases = Seq(
      ("https://other.example/x", "https://other.example/x"), // absolute
      ("HTTP://UP.example/y", "HTTP://UP.example/y"), // absolute, odd case
      ("//cdn.example/lib.js", "https://cdn.example/lib.js"), // proto-rel
      ("/root/a", "https://www.site.example/root/a"), // root-rel
      ("sibling.html", "https://www.site.example/docs/guide/sibling.html"),
      ("a/b.html", "https://www.site.example/docs/guide/a/b.html"),
      ("x?a=1&amp;b=2", "https://www.site.example/docs/guide/x?a=1&b=2"),
      ("x#frag", "https://www.site.example/docs/guide/x"), // fragment cut
      ("#top", null), ("", null), ("   ", null),
      ("javascript:void(0)", null), ("MAILTO:a@b.c", null),
      ("data:text/plain,hi", null), ("tel:+1555", null))
    val df = cases.zipWithIndex
      .map { case ((href, want), i) => (i, base, href, want) }
      .toDF("i", "base", "href", "want")
    val got = df.select(col("i"), col("want"),
      Urls.resolveLink(col("base"), col("href")).as("got")).collect()
    got.foreach { r =>
      assert(r.getAs[String]("got") == r.getAs[String]("want"),
        s"case ${r.getInt(0)}")
    }
    // base with an empty path resolves relatives against "/"
    val rootBase = Seq((1, "https://site.example", "a.html"))
      .toDF("i", "base", "href")
      .select(Urls.resolveLink(col("base"), col("href"))).head().getString(0)
    assert(rootBase == "https://site.example/a.html")
    // a base without scheme:// cannot anchor anything
    val noScheme = Seq((1, "not a url", "https://abs.example/x"))
      .toDF("i", "base", "href")
      .select(Urls.resolveLink(col("base"), col("href"))).head()
    assert(noScheme.isNullAt(0))
  }

  test("extractLinks explodes both quoting styles and drops dead hrefs") {
    val html = """<a href="https://a.example/1">one</a>""" +
      """<A Href = '/two'>two</A><a href="#skip">s</a>""" +
      """<a href='javascript:x()'>j</a>"""
    val df = Seq((7L, "https://page.example/dir/p.html", html))
      .toDF("id", "url", "html")
    val out = Urls.extractLinks(df, "html", "url").orderBy("link").collect()
    assert(out.map(_.getAs[String]("link")).toSeq ==
      Seq("https://a.example/1", "https://page.example/two"))
    assert(out.forall(_.getAs[Long]("id") == 7L))
    assert(!out.head.schema.fieldNames.contains("html"))
  }

  test("asciiHost punycodes unicode labels, passes ASCII byte-identical") {
    val cases = Seq(
      ("https://münchen.de/p", "xn--mnchen-3ya.de"),
      ("https://пример.испытание/x", "xn--e1afmkfd.xn--80akhbyknj4f"),
      ("https://日本語.jp/", "xn--wgv71a119e.jp"),
      ("https://sub.münchen.example.com/", "sub.xn--mnchen-3ya.example.com"),
      ("https://plain.example.com/a", "plain.example.com"),
      ("https://www.Mixed-Case.COM/", "mixed-case.com"))
    val out = cases.toDF("url", "want")
      .select(Urls.asciiHost(col("url")).as("got"), col("want"))
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want, s"$got != $want") }
    // null flows through
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("url")
      .select(Urls.asciiHost(col("url"))).collect()(0)
    assert(n.getString(0) == "", "no-host input keeps host()'s empty result")
  }

  test("extractSitemapUrls: urlset locs, index flag, CDATA and entity decode") {
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> https://a.example/p?x=1&amp;y=2 </loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc><![CDATA[https://a.example/cdata?q=1&amp;r=2]]></loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.example/sitemap-1.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val df = Seq((1L, urlset), (2L, index),
      (3L, "<urlset></urlset>"), (4L, null.asInstanceOf[String]))
      .toDF("id", "xml")
    val out = Urls.extractSitemapUrls(df, "xml")
      .orderBy("id", "url")
      .select("id", "url", "is_index")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "https://a.example/cdata?q=1&r=2", false),
      (1L, "https://a.example/p?x=1&y=2", false),
      (2L, "https://a.example/sitemap-1.xml.gz", true)))
  }
}
