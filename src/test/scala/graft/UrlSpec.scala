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
}
