package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Url

class UrlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def norm(urls: (Long, String)*) =
    Url.normalize(urls.toDF("doc_id", "url"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getBoolean(6)))
      .toMap

  test("url_normalize: hand-computed canonicalization across the messy families") {
    val out = norm(
      1L -> "HTTPS://WWW.A-News.Example.CO.UK:443/Articles//item?id=7&utm_source=feed&utm_campaign=x#frag",
      2L -> "http://sub.example.com/path/to/page/?utm_medium=email&gclid=abc",
      3L -> "  https://blog.example.com.au/post/9?a=1&fbclid=xyz&b=2  ",
      4L -> "http://user:pw@example.org:8080/x%20y?ref=tw&id=3",
      5L -> "Example.net./no-scheme//x",
      6L -> "http://example.com:80/",
      7L -> "http://localhost/admin",
      8L -> (null: String),
      9L -> "   ")
    assert(out(1L) == (("https", "a-news.example.co.uk", "example.co.uk",
      "https://a-news.example.co.uk/Articles/item?id=7", true)))
    assert(out(2L) == (("http", "sub.example.com", "example.com",
      "http://sub.example.com/path/to/page", true)))
    assert(out(3L) == (("https", "blog.example.com.au", "example.com.au",
      "https://blog.example.com.au/post/9?a=1&b=2", true)))
    assert(out(4L) == (("http", "example.org", "example.org",
      "http://example.org:8080/x%20y?id=3", true)))
    assert(out(5L) == (("http", "example.net", "example.net",
      "http://example.net/no-scheme/x", true)))
    // default port drops; root path stays "/"
    assert(out(6L) == (("http", "example.com", "example.com",
      "http://example.com/", true)))
    // single-label host registers as itself
    assert(out(7L) == (("http", "localhost", "localhost",
      "http://localhost/admin", false)))
    // null / blank url → all-empty fields, row kept (membership rule)
    assert(out(8L) == (("", "", "", "", false)))
    assert(out(9L) == (("", "", "", "", false)))
  }

  test("opaque (no-authority) URIs canonicalize empty — no fabricated host (ADVICE r10)") {
    // mailto: would otherwise strip `mailto:a@` as userinfo and read
    // "b.example.com" as a host; news:/tel:/javascript: would read
    // their scheme as a single-label host. All must yield empty
    // fields, like a blank url.
    val out = norm(
      1L -> "mailto:a@b.example.com",
      2L -> "news:latest.html",
      3L -> "javascript:void(0)",
      4L -> "tel:+1-555-0100",
      5L -> "v1.2:notes")
    Seq(1L, 2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id)._2 == "" && out(id)._3 == "" && out(id)._4 == "",
        s"doc $id: ${out(id)}")
    }
    // withDomain applies the same guard
    val doms = Url.withDomain(
      Seq((1L, "news:latest.html"), (2L, "https://real.example.com/x"))
        .toDF("doc_id", "url"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(doms(1L) == "")
    assert(doms(2L) == "example.com")
  }

  test("url_normalize: already-canonical urls report changed = false") {
    val out = norm(1L -> "https://example.com/a?b=1")
    assert(out(1L) == (("https", "example.com", "example.com",
      "https://example.com/a?b=1", false)))
  }

  test("domain_cap: lowest doc_ids survive per registered domain; no window in the plan") {
    val docs = Seq(
      (5L, "https://a.example.com/1"),
      (2L, "http://www.example.com/2"),
      (9L, "https://example.com/3"),
      (1L, "https://b.other.net/x"),
      (7L, "https://other.net/y"),
      (3L, "http://localhost/z"))
      .toDF("doc_id", "url")
    val out = Url.domainCap(docs, maxDocs = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq(
      (1L, "other.net", 1), (2L, "example.com", 1), (3L, "localhost", 1),
      (5L, "example.com", 2), (7L, "other.net", 2)), out.toString)
    // Scale contract: bounded TopKStruct aggregate, never a
    // domain-partitioned window (a mega-domain = one task otherwise).
    val plan = Url.domainCap(docs, maxDocs = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"domain_cap must not window-rank:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"domain_cap must rank via the bounded aggregate:\n$plan")
  }

  test("withDomain wires the per-domain tier: sourceQuality groups by registered domain") {
    // Two crawl URLs of the same registered domain, one of another —
    // the #47t rollup must see TWO sources after the swap (and the
    // #40q per-source strip composes the same way: swap `source` for
    // `registered_domain` and the grain follows).
    val docs = Seq(
      (1L, "the market rallied and the traders cheered today", "en",
        "https://www.news.example.co.uk/a", 48L),
      (2L, "the market fell and the traders watched in fear", "en",
        "http://news.example.co.uk/b?utm_source=x", 47L),
      (3L, "the quick brown fox jumps over the lazy dog", "en",
        "https://blog.other.net/post/1", 43L))
      .toDF("doc_id", "text", "lang", "url", "n_chars")
    val byDomain = graft.operators.TextSignals.sourceQuality(
        Url.withDomain(docs, "url")
          .withColumn("source", col("registered_domain")))
      .select(col("source"), col("n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("example.co.uk" -> 2L, "other.net" -> 1L),
      byDomain.toString)
  }

  test("resolveCol: hand-computed RFC-3986-lite resolution table") {
    val base = "https://site.example.com/dir/sub/page.html?q=1#frag"
    val cases = Seq(
      // absolute and scheme-ful pass as-is
      1L -> "https://other.example/x",
      2L -> "mailto:a@b.example",
      // protocol-relative takes the base scheme
      3L -> "//cdn.example/lib.js",
      // root-relative takes the origin
      4L -> "/top/x",
      // path-relative joins the base directory
      5L -> "img/logo.png",
      // ./ and ../ collapse (within the documented passes)
      6L -> "./a/./b",
      7L -> "../up.html",
      8L -> "../../root.html",
      // fragment-only and empty resolve to the base (core)
      9L -> "#sec",
      10L -> "",
      // query-only replaces the base query, keeps the path
      11L -> "?p=2",
      // over-popping past the root stays (documented)
      12L -> "../../../far.html")
    val out = cases.toDF("doc_id", "href")
      .select(col("doc_id"),
        Url.resolveCol(col("href"),
          org.apache.spark.sql.functions.lit(base)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "https://other.example/x")
    assert(out(2L) == "mailto:a@b.example")
    assert(out(3L) == "https://cdn.example/lib.js")
    assert(out(4L) == "https://site.example.com/top/x")
    assert(out(5L) == "https://site.example.com/dir/sub/img/logo.png")
    assert(out(6L) == "https://site.example.com/dir/sub/a/b")
    assert(out(7L) == "https://site.example.com/dir/up.html")
    assert(out(8L) == "https://site.example.com/root.html")
    assert(out(9L) == "https://site.example.com/dir/sub/page.html")
    assert(out(10L) == "https://site.example.com/dir/sub/page.html")
    assert(out(11L) == "https://site.example.com/dir/sub/page.html?p=2")
    assert(out(12L) == "https://site.example.com/../far.html")
  }

  test("resolveCol feeds withDomain: relative crawl edges land on the base's domain") {
    val docs = Seq(
      (1L, "https://a.one.example/p", "/local"),
      (2L, "https://a.one.example/p", "//hub.example/x"),
      (3L, "https://a.one.example/p", "https://two.example/y"))
      .toDF("doc_id", "base", "href")
    val doms = Url.withDomain(
        docs.select(col("doc_id"),
          Url.resolveCol(col("href"), col("base")).as("url")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(doms == Map(1L -> "one.example", 2L -> "hub.example",
      3L -> "two.example"), doms.toString)
  }
}
