package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain canonicalization — the zero-shuffle projection that makes
  * the per-source tier ([[TextSignals.sourceQuality]], the #40q
  * per-source boilerplate strip, per-domain capping/blocklists)
  * deployable on real crawl data, where `source` arrives as a raw URL,
  * not a clean label (VERDICT r8 "What's missing" #2; the C4/RefinedWeb
  * practice of grouping and filtering at the registered-domain grain).
  *
  * Canonicalization rules, in order (each a chained codegen'd regex
  * projection — zero shuffle, zero join, streaming-safe; Java∩RE2
  * syntax only, the [[TextAnalysis.piiScrub]] portability discipline):
  *
  *  1. trim; a blank/NULL url canonicalizes to all-empty fields
  *     (row membership never depends on url nullability — ADVICE r6).
  *  2. fragment (`#…`) stripped.
  *  3. scheme extracted and lowercased; scheme-less URLs default to
  *     `http` (crawl lists routinely omit it).
  *  4. userinfo (`user:pass@`) stripped.
  *  5. host lowercased, trailing dot stripped, leading `www.` stripped.
  *  6. port kept ONLY when non-default for the scheme (http:80 /
  *     https:443 drop — same origin by RFC 6454).
  *  7. path: duplicate slashes collapse, trailing slash strips (root
  *     stays `/`), empty → `/`. Percent-escapes are NOT decoded
  *     (decoding changes identity for reserved characters).
  *  8. query: tracking parameters removed (utm_*, gclid, fbclid,
  *     msclkid, mc_cid, mc_eid, ref, ref_src, igshid), dangling `&`
  *     trimmed; parameters are NOT reordered (reordering changes
  *     semantics for duplicate keys); empty query drops its `?`.
  *  9. registered domain: last two host labels, or last three when the
  *     public suffix is a known second-level TLD ([[SecondLevelTlds]] —
  *     a deliberately small, driver-literal subset of the public-suffix
  *     list; the full PSL swaps in as a bigger literal, same plan).
  *     Single-label hosts (e.g. `localhost`) register as themselves.
  *
  * Scale shape: one projection pass, filters/pruning reach the scan,
  * no UDF, no HOF — every step `regexp_extract`/`regexp_replace`/
  * `lower`, all inside whole-stage codegen.
  */
object Url {

  /** Known second-level public suffixes (subset; see scaladoc #9).
    * Shared verbatim by the Column expression and the generated DuckDB
    * oracle so the two cannot drift.
    */
  val SecondLevelTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.kr",
    "com.br", "com.mx", "co.in", "com.cn", "com.tw", "com.sg",
    "co.nz", "co.za")

  /** `\.(?:co\.uk|…)$` — anchor for the three-label rule. */
  val SecondLevelPattern: String =
    SecondLevelTlds.map(_.replace(".", "\\.")).mkString("\\.(?:", "|", ")$")

  /** Tracking-parameter strip pattern: the parameter together with its
    * leading `&` (or start-of-query) so removal never splices two
    * neighbors together.
    */
  val TrackingParamPattern: String =
    "(?:^|&)(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)=[^&]*"

  // Every component regex is a named constant the DuckDB oracle
  // interpolates VERBATIM — the two engines run the same pattern
  // bytes (Java∩RE2 syntax), so they cannot drift.
  val SchemePattern = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
  val SchemeStripPattern = "^[A-Za-z][A-Za-z0-9+.\\-]*://"
  val FragmentPattern = "#.*$"
  val UserinfoPattern = "^[^/@?#]*@"
  val HostPattern = "^([^/:?#]+)"
  val TrailingDotPattern = "\\.$"
  val WwwPattern = "^www\\."
  val PortPattern = "^[^/:?#]+:([0-9]+)"
  val PathPattern = "^[^/?#]*(/[^?#]*)"
  val SlashRunPattern = "/{2,}"
  val TrailingSlashPattern = "/$"
  val QueryPattern = "\\?([^#]*)"
  val DanglingAmpPattern = "^&+|&+$"
  val TwoLabelPattern = "([^.]+\\.[^.]+)$"
  val ThreeLabelPattern = "([^.]+\\.[^.]+\\.[^.]+)$"

  // --- reference resolution (RFC-3986-lite, r10 — VERDICT r9 missing
  // #2: relative hrefs are the majority of real markup edges; without
  // resolution they drop or feed junk domains into pagerank). Shared
  // constants, same Java∩RE2 discipline as the canonicalizer.
  val AbsoluteRefPattern = "^[A-Za-z][A-Za-z0-9+.\\-]*:"
  val OriginPattern = "^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)"
  val BasePathPattern = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*(/[^?#]*)"
  val QueryStripPattern = "\\?[^#]*"
  val LastSegmentPattern = "/[^/]*$"
  val DotSegPattern = "/\\./"
  val DotEndPattern = "/\\.$"
  val ParentSegPattern = "/[^/.][^/]*/\\.\\./"
  val ParentEndPattern = "/[^/.][^/]*/\\.\\.$"

  /** Resolve an href against the document's base URL — the glue
    * between [[Html.linksCol]] and [[withDomain]] that turns raw
    * markup references into absolute crawl-frontier URLs.
    *
    * Rules (RFC 3986 §5.3, the lite subset a link graph needs):
    * scheme-ful references pass as-is (including mailto:/javascript: —
    * filtering non-http schemes is the caller's policy); `//host/...`
    * takes the base scheme; `/path` takes the base origin; `#frag`
    * and the empty reference resolve to the base (fragment/query
    * stripped); `?query` replaces the base query; everything else
    * joins the base path's directory, then dot segments collapse.
    *
    * Documented bounds (both engines degrade identically — the SQL
    * twin interpolates the same constants): `./` runs collapse within
    * two passes and `seg/../` within three, so a ≥4-deep `../` chain
    * resolves partially; a `../` popping a dot-leading segment (e.g.
    * `/.well-known/../`) stays; over-popping past the root stays as a
    * literal `/../` (the collapse runs on the PATH alone, before the
    * origin prepends — a joined-string collapse would let an
    * over-popped path eat the authority); scheme-ful and
    * protocol-relative references pass through UNcollapsed (strict
    * RFC also dot-collapses absolute refs; a link graph reads only
    * their authority, which collapse never changes); a `/./` inside a
    * RELATIVE href's own query string would collapse (no real encoder
    * emits one). The base is assumed an absolute `scheme://host[/path]`
    * URL — a schemeless base yields '' origin and the reference passes
    * through joined to '/'. A reference whose FIRST segment contains a
    * colon (`news:latest.html`, `v1.2:notes`) is scheme-ful under the
    * RFC 3986 grammar (`news` and `v1.2` are valid schemes) and passes
    * through unresolved — the same reading every browser applies; an
    * author who meant a relative path must write `./v1.2:notes` (RFC
    * 3986 §4.2's own prescription). The consequence for the link graph
    * is bounded by construction: such refs carry no `//authority`, so
    * the opaque-URI guard in [[withDomain]]/[[normalize]] extracts no
    * host from them and they drop out of the domain/pagerank tiers
    * rather than fabricating a junk authority.
    */
  def resolveCol(href: Column, base: Column): Column = {
    val h = coalesce(href, lit(""))
    val b = coalesce(base, lit(""))
    val bCore = regexp_replace(regexp_replace(b, FragmentPattern, ""),
      QueryStripPattern, "")
    val scheme = regexp_extract(b, SchemePattern, 1)
    val origin = regexp_extract(bCore, OriginPattern, 1)
    val bPath = regexp_extract(bCore, BasePathPattern, 1)
    val bDir = when(bPath === "", lit("/"))
      .otherwise(regexp_replace(bPath, LastSegmentPattern, "/"))
    def collapse(p: Column): Column = {
      val d1 = regexp_replace(p, DotSegPattern, "/")
      val d2 = regexp_replace(d1, DotSegPattern, "/")
      val e = regexp_replace(d2, DotEndPattern, "/")
      val p1 = regexp_replace(e, ParentSegPattern, "/")
      val p2 = regexp_replace(p1, ParentSegPattern, "/")
      val p3 = regexp_replace(p2, ParentSegPattern, "/")
      regexp_replace(p3, ParentEndPattern, "/")
    }
    when(h === "", bCore)
      .when(h.rlike(AbsoluteRefPattern), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"), concat(origin, collapse(h)))
      .when(h.startsWith("#"), bCore)
      .when(h.startsWith("?"),
        concat(origin, when(bPath === "", lit("/")).otherwise(bPath), h))
      .otherwise(concat(origin, collapse(concat(bDir, h))))
  }

  /** [[resolveCol]] as DuckDB SQL over expressions `href`/`base` —
    * generated from the same constants and CASE chain (the
    * zorderKeySql rule), with DuckDB's explicit 'g' flag supplying the
    * replace-all semantics Spark applies by default.
    */
  def resolveSql(href: String, base: String): String = {
    val bCore = s"regexp_replace(regexp_replace($base, '$FragmentPattern', ''), '$QueryStripPattern', '')"
    val scheme = s"regexp_extract($base, '$SchemePattern', 1)"
    val origin = s"regexp_extract($bCore, '$OriginPattern', 1)"
    val bPath = s"regexp_extract($bCore, '$BasePathPattern', 1)"
    val bDir = s"CASE WHEN $bPath = '' THEN '/' ELSE regexp_replace($bPath, '$LastSegmentPattern', '/') END"
    val pats = Seq(DotSegPattern, DotSegPattern, DotEndPattern,
      ParentSegPattern, ParentSegPattern, ParentSegPattern, ParentEndPattern)
    def collapse(p: String): String =
      pats.foldLeft(s"($p)") { (acc, pt) =>
        s"regexp_replace($acc, '$pt', '/', 'g')"
      }
    s"""CASE WHEN $href = '' THEN $bCore
       |      WHEN regexp_matches($href, '$AbsoluteRefPattern') THEN $href
       |      WHEN $href LIKE '//%' THEN $scheme || ':' || $href
       |      WHEN $href LIKE '/%' THEN $origin || ${collapse(href)}
       |      WHEN $href LIKE '#%' THEN $bCore
       |      WHEN $href LIKE '?%' THEN $origin ||
       |        (CASE WHEN $bPath = '' THEN '/' ELSE $bPath END) || $href
       |      ELSE $origin || ${collapse(s"($bDir) || $href")} END""".stripMargin
  }

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, SchemePattern, 1))

  /** url with fragment, scheme and userinfo stripped:
    * `host[:port][/path][?query]`.
    */
  private def restOf(u: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(u, FragmentPattern, ""),
        SchemeStripPattern, ""),
      UserinfoPattern, "")

  /** Scheme-ful URI with NO authority component — `mailto:a@b`,
    * `news:latest.html`, `javascript:void(0)`, `tel:+1...`: a scheme
    * prefix present but not followed by `//`. Such URIs carry no host
    * (RFC 3986 §3: the authority only exists after `//`), so the
    * domain tier must extract NOTHING from them — without this guard
    * `news:latest.html` fabricates host "news" and `mailto:a@b.com`
    * strips `mailto:a@` as userinfo and fabricates host "b.com"
    * (ADVICE r10). Both patterns are shared constants the oracles
    * interpolate; no lookahead (Java∩RE2 — the opaque test is
    * "matches scheme-colon AND NOT scheme-colon-slash-slash").
    */
  private def isOpaque(u: Column): Column =
    u.rlike(AbsoluteRefPattern) && !u.rlike(SchemeStripPattern)

  /** Appending form: adds `registered_domain` (plus nothing else) —
    * the composable front for the per-domain tier
    * (`sourceQuality(withDomain(df, "url").withColumn("source",
    * col("registered_domain")))`).
    */
  def withDomain(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = trim(coalesce(col(urlCol), lit("")))
    val host = when(isOpaque(u), lit("")).otherwise(hostOf(restOf(u)))
    df.withColumn("registered_domain", registeredDomainOf(host))
  }

  private def hostOf(rest: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(rest, HostPattern, 1)),
        TrailingDotPattern, ""),
      WwwPattern, "")

  private def registeredDomainOf(host: Column): Column =
    when(host.rlike(SecondLevelPattern),
      regexp_extract(host, ThreeLabelPattern, 1))
      .otherwise(
        when(host.rlike("\\."), regexp_extract(host, TwoLabelPattern, 1))
          .otherwise(host))

  /** Per-domain document cap — the Gopher/Dolma crawl-balance rule: a
    * handful of hosts dominate any web crawl, so each registered
    * domain keeps at most `maxDocs` documents (lowest doc_ids —
    * deterministic, and docs already kept stay kept as the corpus
    * grows). Output: the surviving (doc_id, registered_domain,
    * domain_rank) rows.
    *
    * Scale shape: ranking via the bounded [[TopK.groupedWithRank]]
    * TopKStruct aggregate — map-side truncation to `maxDocs` per
    * domain, NEVER a domain-partitioned window (a mega-domain would
    * otherwise serialize into one task); the domain derivation is the
    * [[withDomain]] projection, so the whole operator is one
    * aggregate over (doc_id, domain) pairs.
    */
  def domainCap(df: DataFrame, urlCol: String = "url",
                maxDocs: Int = 2): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    TopK.groupedWithRank(
      withDomain(df, urlCol).select(col("doc_id"), col("registered_domain")),
      Seq(col("registered_domain")), maxDocs, Seq(col("doc_id")),
      "domain_rank")
      .select(col("doc_id"), col("registered_domain"), col("domain_rank"))
  }

  /** Doc-grain canonicalization report: (doc_id, url, scheme, host,
    * registered_domain, url_norm, changed). `changed` compares the
    * canonical form against the trimmed input.
    */
  def normalize(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = trim(coalesce(col(urlCol), lit("")))
    val rest = restOf(u)
    // Opaque (no-authority) URIs canonicalize to all-empty fields, the
    // same degradation as a blank url — see [[isOpaque]].
    val host = when(isOpaque(u), lit("")).otherwise(hostOf(rest))
    val schemeRaw = schemeOf(u)
    val scheme = when(schemeRaw === "", lit("http")).otherwise(schemeRaw)
    val port = regexp_extract(rest, PortPattern, 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(rest, PathPattern, 1)
    val path1 = regexp_replace(path0, SlashRunPattern, "/")
    val path = when(path1 === "" || path1 === "/", lit("/"))
      .otherwise(regexp_replace(path1, TrailingSlashPattern, ""))
    val q0 = regexp_extract(rest, QueryPattern, 1)
    val query = regexp_replace(
      regexp_replace(q0, TrackingParamPattern, ""),
      DanglingAmpPattern, "")
    val dom = registeredDomainOf(host)
    val norm = when(host === "", lit(""))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
    df.select(col("doc_id"), u.as("url"),
      when(host === "", lit("")).otherwise(scheme).as("scheme"),
      host.as("host"),
      dom.as("registered_domain"),
      norm.as("url_norm"),
      (norm =!= u).as("changed"))
  }
}
