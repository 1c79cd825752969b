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
}
