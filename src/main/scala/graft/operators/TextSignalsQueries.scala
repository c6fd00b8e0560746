package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver-contract wrappers + DuckDB oracles for the [[TextSignals]]
  * corpus-signal operators (SURVEY §2 #45c–45f/46b/47o–47t). Every row
  * is a full rows/schema/hash cross-engine check: hashing goes through
  * the portable md5 fold, means fold exact integer micro-units, and
  * rank/verdict keys compare rounded values.
  */
object TextSignalsQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Shared token CTE: the DuckDB replay of [[Dedup.tokens]] + empty
    * filter (the [[Dsir]] oracle's `t` block).
    */
  private val tokCte: String =
    """t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(regexp_replace(lower(text), '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'),
      |      x -> x <> '') AS tk
      |  FROM documents)""".stripMargin

  /** Shared Gopher rule-battery CTE chain (whitespace words → metrics →
    * fail-code list in `f.fl`) — the front of the `gopher_filter` and
    * `source_quality` oracles.
    */
  private val gopherCte: String = {
    val stops = graft.operators.TextAnalysis.Stopwords.values.flatten
      .toSeq.distinct.sorted.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""w AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
       |      x -> x <> '') AS wl,
       |    list_filter(string_split_regex(lower(text), '[^\\p{L}]+'),
       |      x -> x <> '') AS lt
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, len(wl) AS n_words,
       |    CASE WHEN len(wl) > 0 THEN round(
       |      length(regexp_replace(text, '[ \\t\\n\\r\\f]+', '', 'g')) / len(wl), 6)
       |      ELSE 0.0 END AS mean_word_len,
       |    coalesce(list_max(list_transform(wl, x -> length(x))), 0) AS max_word_len,
       |    CASE WHEN len(wl) > 0 THEN round(
       |      len(list_filter(wl, x -> regexp_matches(x, '\\p{L}'))) / len(wl), 6)
       |      ELSE 0.0 END AS alpha_share,
       |    len(list_filter(lt, x -> list_contains($stops, x))) AS stop_hits,
       |    CASE WHEN length(text) > 0 THEN round(
       |      length(regexp_replace(text, '[\\p{L}\\p{N} \\t\\n\\r\\f]', '', 'g'))
       |        / length(text), 6)
       |      ELSE 0.0 END AS symbol_share
       |  FROM w),
       |f AS (
       |  SELECT *, list_filter([
       |    CASE WHEN n_words < 5 THEN 'too_short' END,
       |    CASE WHEN n_words > 100000 THEN 'too_long' END,
       |    CASE WHEN mean_word_len < 2 OR mean_word_len > 12 THEN 'word_len' END,
       |    CASE WHEN max_word_len > 30 THEN 'long_word' END,
       |    CASE WHEN alpha_share < 0.7 THEN 'low_alpha' END,
       |    CASE WHEN stop_hits < 2 THEN 'no_stop' END,
       |    CASE WHEN symbol_share > 0.2 THEN 'symbol' END], x -> x IS NOT NULL) AS fl
       |  FROM m)""".stripMargin
  }

  /** Shared classifier CTE chain (tokens → hashed buckets → integer
    * weight fold) — the front of the `quality_classifier` and
    * `source_quality` oracles.
    */
  private val clsCte: String =
    s"""$tokCte,
       |p AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 4096 AS b
       |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t)),
       |a AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    sum((b * 2654435761) % 2000001 - 1000000) AS ws
       |  FROM p GROUP BY 1)""".stripMargin

  /** Generated train ladder for the `quality_classifier_trained` /
    * `quality_classifier_scored` oracles — the DuckDB replay of
    * [[Classifier.trainQualityClassifier]] on the Gopher weak-label
    * seed, one (score → update → weights) CTE triple per perceptron
    * round (the bpe_vocab generated-ladder pattern). Every step is
    * BIGINT arithmetic: round 0 is the smoothed-rate closed form via
    * integer `//`, each round's delta a plain integer fold — so the
    * weights compare EXACTLY, round for round. Assumes `f` (gopherCte)
    * and `t` (tokCte) are in scope.
    */
  private def trainLadderCte(rounds: Int, buckets: Int, lrMicro: Long): String = {
    val head =
      s"""lab AS (
         |  SELECT doc_id, CASE WHEN len(fl) = 0 THEN 1 ELSE 0 END AS y FROM f),
         |tp AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $buckets AS b
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t)),
         |feat AS (
         |  SELECT tp.doc_id, tp.b, CAST(count(*) AS BIGINT) AS cnt, lab.y
         |  FROM tp JOIN lab USING (doc_id) GROUP BY tp.doc_id, tp.b, lab.y),
         |w0 AS (
         |  SELECT b,
         |    (2000000 * (CAST(sum(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS BIGINT) + 1)
         |      + (CAST(sum(cnt) AS BIGINT) + 2))
         |      // (2 * (CAST(sum(cnt) AS BIGINT) + 2)) - 500000 AS wt
         |  FROM feat GROUP BY b)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""s$r AS (
         |  SELECT ft.doc_id, ft.y,
         |    CAST(sum(ft.cnt * coalesce(w.wt, 0)) AS BIGINT) AS sc
         |  FROM feat ft LEFT JOIN w${r - 1} w USING (b)
         |  GROUP BY ft.doc_id, ft.y),
         |u$r AS (
         |  SELECT ft.b,
         |    $lrMicro * CAST(sum((s.y * 2 - 1) * ft.cnt) AS BIGINT) AS dw
         |  FROM feat ft JOIN s$r s ON ft.doc_id = s.doc_id
         |  WHERE (CASE WHEN s.sc >= 0 THEN 1 ELSE 0 END) <> s.y
         |  GROUP BY ft.b),
         |w$r AS (
         |  SELECT w.b, w.wt + coalesce(u.dw, 0) AS wt
         |  FROM w${r - 1} w LEFT JOIN u$r u ON w.b = u.b)""".stripMargin
    }
    (head +: rs).mkString(",\n")
  }

  /** Shared winnowing CTE chain (tokens → positioned grams → packed
    * keys → window minima → distinct picks) — the front of both the
    * `winnow_fingerprint` and `winnow_pairs` oracles.
    */
  private val winnowSelCte: String =
    s"""$tokCte,
       |g AS (
       |  SELECT doc_id, len(tk) - 3 AS n,
       |    unnest(range(1, len(tk) - 2)) AS pos,
       |    unnest(list_transform(range(1, len(tk) - 2),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS gr
       |  FROM t WHERE len(tk) >= 4),
       |e AS (
       |  SELECT doc_id, n, pos,
       |    CAST(concat('0x', substr(md5(gr), 1, 8)) AS BIGINT) * 2097152
       |      + (2097151 - pos) AS kc
       |  FROM g),
       |m AS (
       |  SELECT doc_id, n, pos,
       |    min(kc) OVER (PARTITION BY doc_id ORDER BY pos
       |                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn
       |  FROM e),
       |sel AS (
       |  SELECT DISTINCT doc_id, mn // 2097152 AS fp_hash,
       |    2097151 - (mn % 2097152) AS fp_pos
       |  FROM m WHERE pos >= least(4, n))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "winnow_fingerprint" -> ((s, d) =>
      TextSignals.winnowFingerprints(docs(s, d)).orderBy(col("doc_id"))),

    "winnow_pairs" -> ((s, d) =>
      TextSignals.winnowPairs(docs(s, d)).orderBy(col("id1"), col("id2"))),

    "dup_ngram_frac" -> ((s, d) =>
      TextSignals.dupNgramFrac(docs(s, d)).orderBy(col("doc_id"))),

    "quality_classifier" -> ((s, d) =>
      TextSignals.qualityClassifier(docs(s, d)).orderBy(col("doc_id"))),

    "oov_rate" -> ((s, d) =>
      TextSignals.oovRate(docs(s, d)).orderBy(col("doc_id"))),

    "tfidf_keywords" -> ((s, d) =>
      TextSignals.tfidfKeywords(docs(s, d)).orderBy(col("doc_id"), col("rk"))),

    "sentence_stats" -> ((s, d) =>
      TextSignals.sentenceStats(docs(s, d)).orderBy(col("doc_id"))),

    "gopher_filter" -> ((s, d) =>
      TextSignals.gopherFilter(docs(s, d)).orderBy(col("doc_id"))),

    "source_quality" -> ((s, d) =>
      TextSignals.sourceQuality(docs(s, d)).orderBy(col("source"))),

    // Classifier-vs-Gopher agreement per prob decile — the
    // threshold-picking read before wiring either gate into the
    // curation DAG.
    "quality_calibration" -> ((s, d) =>
      TextSignals.qualityCalibration(docs(s, d)).orderBy(col("decile"))),

    // The in-Spark classifier FIT on the Gopher weak-label seed — the
    // full weight ladder, oracle-checked round for round.
    "quality_classifier_trained" -> ((s, d) =>
      Classifier.trainOnGopher(docs(s, d)).orderBy(col("round"), col("bucket"))),

    // End-to-end: documents scored by the trained (final-round)
    // weights through qualityClassifierWeighted — proves the trained
    // artifact plugs into the deployment scorer unchanged.
    "quality_classifier_scored" -> ((s, d) => {
      val dd = docs(s, d)
      TextSignals.qualityClassifierWeighted(dd,
          Classifier.gopherTrainedWeights(dd))
        .orderBy(col("doc_id"))
    }),

    "chunk_split" -> ((s, d) =>
      TextSignals.chunkSplit(docs(s, d)).orderBy(col("doc_id"), col("chunk_id"))),

    // The synthetic corpus has clean `source` labels and no URL column,
    // so the row plants deterministic MESSY crawl URLs (uppercase
    // scheme/host, www, default and non-default ports, userinfo,
    // duplicate slashes, trailing slash, tracking params, fragments,
    // trailing dot, scheme-less, surrounding whitespace — one family
    // per doc_id%5) that the oracle rebuilds verbatim — the pii_scrub
    // pattern: the check exercises real canonicalization, not a no-op.
    "url_normalize" -> ((s, d) =>
      Url.normalize(docs(s, d).withColumn("url", messyUrl))
        .orderBy(col("doc_id"))),

    // Per-domain cap over the same fixture (five registered domains ×
    // sf/5 docs each): cap 20 exercises real truncation on every
    // domain at sf0.01+.
    "domain_cap" -> ((s, d) =>
      Url.domainCap(docs(s, d).withColumn("url", messyUrl), maxDocs = 20)
        .orderBy(col("doc_id"))),

    "text_normalize" -> ((s, d) =>
      TextSignals.textNormalize(docs(s, d)).orderBy(col("doc_id"))),

    // #47aa text_fix_encoding (r11, VERDICT r10 next-round #3): the
    // synthetic corpus is clean ASCII, so the row plants REAL
    // cp1252-in-UTF-8 mojibake — computed by the actual round trip
    // (Encoding.mojibakeOf), never hand-typed — plus an
    // already-clean-unicode family that must pass through UNTOUCHED
    // (confidence exactly 1.0), the pii_scrub planting discipline. The
    // oracle interpolates the same Scala constants and replays the
    // same generated replace chain.
    "text_fix_encoding" -> ((s, d) => {
      val aug = docs(s, d).withColumn("text",
        concat(col("text"), mojiSuffix))
      Encoding.withFixedEncoding(aug)
        .select(col("doc_id"), col("n_mojibake_chars"),
          col("charset_confidence"), col("text_fixed"))
        .orderBy(col("doc_id"))
    }),

    // #47ab charset_report (r11): the per-source damage rollup over the
    // same planted fixture — the CCNet per-shard read deciding which
    // feeds need the repair pass. Same suffix constants, same chain.
    "charset_report" -> ((s, d) =>
      Encoding.charsetReport(docs(s, d).withColumn("text",
          concat(col("text"), mojiSuffix)))
        .orderBy(col("source"))),

    // Link-graph authority ladder (#47t5): PageRank over a
    // deterministic source→source edge fixture (the synthetic corpus
    // has no URL column, so edges derive from real table columns:
    // src = the doc's source label, dst = the label its id hashes to —
    // deployment wires Html.linksCol → Url registered domains into the
    // same operator). The oracle replays every round.
    "pagerank" -> ((s, d) =>
      Graph.pageRankLadder(fixtureEdges(docs(s, d)))
        .orderBy(col("round"), col("node"))),

    // The stochastic-form option (#47t5b, r10 — VERDICT r9 #4): the
    // same fixture graph with per-round dangling-mass redistribution
    // (the fixture's 15 sink-only dst labels carry real dangling
    // mass), oracle-replayed round for round — the near-conservation
    // invariant (Σ rank = micro − bounded floor losses) IS the test.
    "pagerank_stochastic" -> ((s, d) =>
      Graph.pageRankLadder(fixtureEdges(docs(s, d)),
          redistributeDangling = true)
        .orderBy(col("round"), col("node"))),

    // The weighted option (#47t5c, r10): per-doc edges carry weight 1
    // and the operator SUMS parallel edges, so the effective per-edge
    // weight is the (src, dst) link multiplicity — exactly the
    // crawl-graph shape where an edge counts how many links point
    // domain→domain. Oracle replays the weighted ladder with
    // count(*)-weighted edges from the same fixture.
    "pagerank_weighted" -> ((s, d) =>
      Graph.pageRankLadder(fixtureEdges(docs(s, d)).withColumn("w", lit(1L)),
          weightCol = Some("w"))
        .orderBy(col("round"), col("node"))),

    // The synthetic corpus is already clean text, so the row plants
    // deterministic MESSY markup (full page with script/style/comment
    // blocks, a title, entities incl. double-encoding, block and inline
    // tags, a markup-free family — one per doc_id%4) that the oracle
    // rebuilds verbatim — the url_normalize pattern: the check
    // exercises real extraction, not a no-op.
    "html_extract" -> ((s, d) =>
      Html.extract(docs(s, d).withColumn("html", messyHtml))
        .orderBy(col("doc_id"))),

    // Outlink extraction (#47t6) — the crawl-frontier / link-graph
    // front feeding `pagerank`. r10 (VERDICT r9 missing #2): all three
    // quote forms captured (double, single, bare) and every href
    // RESOLVED against the doc's base URL (Url.resolveCol — root-,
    // path- and protocol-relative, ../ collapse, fragment-only).
    // Fixture families: mixed-case spaced HREF + entity-encoded & +
    // single-quoted root-relative + bare ../ path-relative; a
    // script-buried link (excluded) next to a kept bare href, a
    // protocol-relative CDN link and a fragment-only link; a linkless
    // doc (emits no rows).
    "html_links" -> ((s, d) =>
      docs(s, d).withColumn("html", messyLinks)
        .select(col("doc_id"),
          explode(Html.linksCol(col("html"))).as("link"))
        .withColumn("resolved", Url.resolveCol(col("link"), docBase))
        .orderBy(col("doc_id"), col("link"))),
  )

  /** Clean strings whose mojibake forms the `text_fix_encoding` row
    * plants (families over doc_id%4): punctuation-class damage,
    * accented-letter damage, and an ALREADY-CLEAN unicode sample that
    * the repair must not touch. The planted bytes are
    * [[Encoding.mojibakeOf]] of these — the real corruption round
    * trip, shared with the oracle.
    */
  private val MojiPunctSample =
    " — don’t “quote… the café’s rosé — €9"
  private val MojiAccentSample =
    " àâäçèéêëîïôöùûüñ ÀÉÜ über señor œuvre"
  private val CleanUnicodeSample =
    " résumé – naïve fiancée"

  /** The per-family planted suffix (Spark side). */
  private def mojiSuffix: org.apache.spark.sql.Column = {
    val m = pmod(col("doc_id"), lit(4L)).cast("int")
    when(m === 0, lit(Encoding.mojibakeOf(MojiPunctSample)))
      .when(m === 1, lit(Encoding.mojibakeOf(MojiAccentSample)))
      .when(m === 2, lit(CleanUnicodeSample))
      .otherwise(lit(""))
  }

  /** The same suffix in DuckDB — identical Scala constants, SQL-escaped. */
  private val mojiSuffixSql: String =
    s"""CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN ${Encoding.sqlLit(Encoding.mojibakeOf(MojiPunctSample))}
       |      WHEN 1 THEN ${Encoding.sqlLit(Encoding.mojibakeOf(MojiAccentSample))}
       |      WHEN 2 THEN ${Encoding.sqlLit(CleanUnicodeSample)}
       |      ELSE '' END""".stripMargin

  /** Deterministic messy-URL fixture for `url_normalize` — five
    * families over doc_id%5 (see the query row's comment), built from
    * real table columns so the planting itself is engine-replayable.
    */
  private def messyUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(5L)).cast("int")
    when(m === 0, concat(lit("HTTPS://WWW."), col("source"),
        lit("-News.Example.CO.UK:443/Articles//item?id="), id,
        lit("&utm_source=feed&utm_campaign=x#frag")))
      .when(m === 1, concat(lit("http://"), col("source"),
        lit(".example.com/path/to/page/?utm_medium=email&gclid=abc"), id))
      .when(m === 2, concat(lit("  https://blog."), col("source"),
        lit(".example.com.au/post/"), id, lit("?a=1&fbclid=xyz&b=2  ")))
      .when(m === 3, concat(lit("http://user:pw@"), col("source"),
        lit(".example.org:8080/x%20y?ref=tw&id="), id))
      .otherwise(when(pmod(col("doc_id"), lit(10L)) === 9,
        // Opaque (no-authority) family — mailto: URIs exercise the
        // isOpaque guard: without it `mailto:userN@` strips as
        // userinfo and "source.example.net" fabricates a domain.
        concat(lit("mailto:user"), id, lit("@"), col("source"),
          lit(".example.net")))
        .otherwise(concat(col("source"), lit(".Example.net./no-scheme//"), id)))
  }

  /** The same fixture in DuckDB. */
  private val messyUrlSql: String =
    """CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '-News.Example.CO.UK:443/Articles//item?id=' || CAST(doc_id AS VARCHAR) || '&utm_source=feed&utm_campaign=x#frag'
      |      WHEN 1 THEN 'http://' || source || '.example.com/path/to/page/?utm_medium=email&gclid=abc' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN '  https://blog.' || source || '.example.com.au/post/' || CAST(doc_id AS VARCHAR) || '?a=1&fbclid=xyz&b=2  '
      |      WHEN 3 THEN 'http://user:pw@' || source || '.example.org:8080/x%20y?ref=tw&id=' || CAST(doc_id AS VARCHAR)
      |      ELSE CASE WHEN doc_id % 10 = 9
      |        THEN 'mailto:user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.net'
      |        ELSE source || '.Example.net./no-scheme//' || CAST(doc_id AS VARCHAR) END END""".stripMargin

  /** Deterministic messy-markup fixture for `html_extract` — four
    * families over doc_id%4 (see the query row's comment), wrapping the
    * real `text` column so the planting is engine-replayable.
    */
  private def messyHtml: org.apache.spark.sql.Column = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(4L)).cast("int")
    when(m === 0, concat(
      lit("<!DOCTYPE html>\n<html><head><title> Doc "), id,
      lit(" &amp; Friends </title>\n<style type=\"text/css\">\n body { color: #333; }\n</style></head>\n<body><nav><ul><li><a href=\"/home\">Home</a></li></ul></nav>\n<h1>Doc "),
      id, lit("</h1>\n<p>"), col("text"),
      lit("</p>\n<script>\nvar x = 1 < 2 && \"</p>\";\n</script>\n<footer>&copy; 2026 Example &lt;Corp&gt;</footer></body></html>")))
      .when(m === 1, concat(
        lit("<div class=\"post\">\n<!-- ad: <script>alert(1)</script> -->\n"),
        col("text"),
        lit("<br/>\n<br>More &quot;quoted&quot; &#39;here&#39;</div>")))
      .when(m === 2, concat(lit("<table><tr><td>"), col("text"),
        lit("</td></tr></table>\n<p>Tail &amp;&amp; done &amp;lt;escaped&amp;gt;</p><p>price < 100 and > 50</p>")))
      .otherwise(concat(col("text"),
        lit(" &lt;raw&gt;&nbsp;tail &#8220;q&#8221; &#x3c;nn&#x3e;&#160;end&#8230;")))
  }

  /** Deterministic anchor fixture for `html_links` — three families
    * over doc_id%3 (see the query row's comment); r10 adds the
    * single-quoted, bare, path-relative (`../`), protocol-relative and
    * fragment-only forms.
    */
  private def messyLinks: org.apache.spark.sql.Column = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(3L)).cast("int")
    when(m === 0, concat(
      lit("<p><a href=\"https://example.com/a?id="), id,
      lit("&amp;ref=x\">one</a> text <a class='b' HREF = '/rel/"), id,
      lit("'>two</a> <a href=../up/"), id, lit(">three</a></p>")))
      .when(m === 1, concat(
        lit("<script><a href=\"https://dead.example/x\"></script>"),
        lit("<a href=bare/"), id,
        lit(">kept</a><a href=\"//cdn.example/lib/"), id,
        lit("\">c</a><a href='#top'>t</a>")))
      .otherwise(col("text"))
  }

  /** The same fixture in DuckDB. */
  private val messyLinksSql: String =
    """CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '<p><a href="https://example.com/a?id=' || CAST(doc_id AS VARCHAR) || '&amp;ref=x">one</a> text <a class=''b'' HREF = ''/rel/' || CAST(doc_id AS VARCHAR) || '''>two</a> <a href=../up/' || CAST(doc_id AS VARCHAR) || '>three</a></p>'
      |      WHEN 1 THEN '<script><a href="https://dead.example/x"></script><a href=bare/' || CAST(doc_id AS VARCHAR) || '>kept</a><a href="//cdn.example/lib/' || CAST(doc_id AS VARCHAR) || '">c</a><a href=''#top''>t</a>'
      |      ELSE text END""".stripMargin

  /** The per-doc base URL the `html_links` resolution runs against —
    * deterministic from doc_id, rebuilt verbatim by the oracle.
    */
  private def docBase: org.apache.spark.sql.Column =
    concat(lit("https://site"), pmod(col("doc_id"), lit(5L)).cast("string"),
      lit(".example.com/dir/sub/page"), col("doc_id").cast("string"),
      lit(".html"))

  /** The same base in DuckDB. */
  private val docBaseSql: String =
    "'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.com/dir/sub/page' || CAST(doc_id AS VARCHAR) || '.html'"

  /** The same fixture in DuckDB (chr(10) = the Scala side's \n). */
  private val messyHtmlSql: String =
    """CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN '<!DOCTYPE html>' || chr(10) || '<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; Friends </title>' || chr(10) || '<style type="text/css">' || chr(10) || ' body { color: #333; }' || chr(10) || '</style></head>' || chr(10) || '<body><nav><ul><li><a href="/home">Home</a></li></ul></nav>' || chr(10) || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) || '<p>' || text || '</p>' || chr(10) || '<script>' || chr(10) || 'var x = 1 < 2 && "</p>";' || chr(10) || '</script>' || chr(10) || '<footer>&copy; 2026 Example &lt;Corp&gt;</footer></body></html>'
      |      WHEN 1 THEN '<div class="post">' || chr(10) || '<!-- ad: <script>alert(1)</script> -->' || chr(10) || text || '<br/>' || chr(10) || '<br>More &quot;quoted&quot; &#39;here&#39;</div>'
      |      WHEN 2 THEN '<table><tr><td>' || text || '</td></tr></table>' || chr(10) || '<p>Tail &amp;&amp; done &amp;lt;escaped&amp;gt;</p><p>price < 100 and > 50</p>'
      |      ELSE text || ' &lt;raw&gt;&nbsp;tail &#8220;q&#8221; &#x3c;nn&#x3e;&#160;end&#8230;' END""".stripMargin

  /** Escape a shared regex constant for embedding in a DuckDB
    * single-quoted literal (LinkPattern/QuoteTrimPattern carry `'`).
    */
  private def sqlPat(p: String): String = p.replace("'", "''")

  /** [[Html]]'s block strip (comments → script → style, the order the
    * Column chain runs) in DuckDB — shared by the html_extract and
    * html_links oracles (one definition, no drift).
    */
  private def htmlNoBlocksSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
       |      '${Html.CommentPattern}', ' ', 'g'),
       |      '${Html.ScriptPattern}', ' ', 'g'),
       |      '${Html.StylePattern}', ' ', 'g')""".stripMargin

  /** [[Html.Entities]] decode chain in DuckDB — generated from the same
    * table the Column chain folds over, in the same order.
    */
  private def htmlDecodeSql(e: String): String =
    Html.Entities.foldLeft(e) { case (acc, (ent, ch)) =>
      val rep = if (ch == "'") "chr(39)" else "'" + ch + "'"
      s"replace($acc, '$ent', $rep)"
    }

  /** [[Html]]'s whitespace normalization in DuckDB — same constants,
    * same stage order.
    */
  private def htmlNormSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      $e,
       |      '${Html.HSpacePattern}', ' ', 'g'),
       |      '${Html.NewlinePadPattern}', chr(10), 'g'),
       |      '${Html.NewlineRunPattern}', chr(10), 'g'),
       |      '${Html.EdgeTrimPattern}', '', 'g')""".stripMargin

  /** The `pagerank` / `pagerank_stochastic` edge fixture: the
    * synthetic corpus has no URL column, so edges derive from real
    * table columns (src = source label, dst = the label the id hashes
    * to — 15 of the 20 dst labels are sink-only and dangle);
    * deployment wires Html.linksCol → Url.resolveCol → registered
    * domains into the same operator.
    */
  private def fixtureEdges(docs: DataFrame): DataFrame =
    docs.select(col("source").as("src"),
      concat(lit("src"), pmod(col("doc_id") * 7, lit(20L)).cast("string"))
        .as("dst"))

  /** The [[Graph.pageRankLadder]] update replayed round for round —
    * generated from the same constants (rounds/damping/micro), all
    * integer floor divisions, so the trajectories are bit-equal.
    * `stochastic` adds the per-round dangling-mass CTE + uniform
    * redistribution term, generated from the same shape the engine
    * runs.
    */
  private def pagerankSql(stochastic: Boolean = false,
                          weighted: Boolean = false): String = {
    val p = Graph.DefaultDampingPct
    val m = Graph.DefaultMicro
    val contribExpr =
      if (weighted) s"sum((r#.rank_micro * e.w) // deg.outdeg)"
      else s"sum(r#.rank_micro // deg.outdeg)"
    val roundsSql = (1 to Graph.DefaultRounds).map { k =>
      val dmCte = if (!stochastic) ""
      else
        s"""dm${k - 1} AS (
           |  SELECT coalesce(sum(rank_micro), 0) AS dm
           |  FROM r${k - 1} WHERE node NOT IN (SELECT src FROM deg)),
           |""".stripMargin
      val dmTerm = if (!stochastic) ""
      else s"""
           |      + (($p * dm${k - 1}.dm) // (100 * nn.n))""".stripMargin
      val dmFrom = if (!stochastic) "" else s" CROSS JOIN dm${k - 1}"
      s"""${dmCte}r$k AS (
         |  SELECT nodes.node,
         |    CAST(((${100 - p} * CAST($m AS BIGINT)) // (100 * nn.n))
         |      + (($p * coalesce(s.c, 0)) // 100)$dmTerm AS BIGINT) AS rank_micro
         |  FROM nodes CROSS JOIN nn$dmFrom
         |  LEFT JOIN (
         |    SELECT e.dst AS node, ${contribExpr.replace("r#", s"r${k - 1}")} AS c
         |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |    JOIN deg ON e.src = deg.src
         |    GROUP BY e.dst) s ON s.node = nodes.node)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to Graph.DefaultRounds).map { k =>
      s"SELECT CAST($k AS INT) AS round, node, CAST(rank_micro AS BIGINT) AS rank_micro FROM r$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH d0 AS (
       |  SELECT source AS src,
       |    'src' || CAST((doc_id * 7) % 20 AS VARCHAR) AS dst
       |  FROM documents WHERE source IS NOT NULL),
       |e AS (${
        if (weighted)
          "SELECT src, dst, count(*) AS w FROM d0 WHERE src <> dst GROUP BY src, dst"
        else "SELECT DISTINCT src, dst FROM d0 WHERE src <> dst"}),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |deg AS (SELECT src, ${
        if (weighted) "sum(w)" else "count(*)"} AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST(CAST($m AS BIGINT) // nn.n AS BIGINT) AS rank_micro
       |       FROM nodes CROSS JOIN nn),
       |$roundsSql
       |SELECT * FROM (
       |$unions
       |) ORDER BY round, node""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "pagerank" -> pagerankSql(),

    "pagerank_stochastic" -> pagerankSql(stochastic = true),

    "pagerank_weighted" -> pagerankSql(weighted = true),

    // Same block-strip chain as html_extract (comments first), then
    // the SAME LinkPattern (three quote forms) + quote trim + entity
    // decode per extracted href, and the SAME generated resolution
    // chain (Url.resolveSql) against the rebuilt per-doc base.
    "html_links" ->
      s"""WITH h0 AS (
         |  SELECT doc_id, $messyLinksSql AS html, $docBaseSql AS base
         |  FROM documents),
         |nb AS (
         |  SELECT doc_id, base,
         |    ${htmlNoBlocksSql("coalesce(html, '')")} AS h
         |  FROM h0),
         |l AS (
         |  SELECT doc_id, base,
         |    unnest(regexp_extract_all(h, '${sqlPat(Html.LinkPattern)}', 1)) AS raw
         |  FROM nb),
         |lk AS (
         |  SELECT doc_id, base,
         |    ${htmlDecodeSql(
              s"regexp_replace(raw, '${sqlPat(Html.QuoteTrimPattern)}', '', 'g')")} AS link
         |  FROM l)
         |SELECT doc_id, link, ${Url.resolveSql("link", "base")} AS resolved
         |FROM lk ORDER BY doc_id, link""".stripMargin,

    // The [[Html]] extraction chain replayed with the SAME pattern
    // constants and entity table interpolated verbatim (Java∩RE2 — the
    // two engines run identical pattern bytes; the decode/normalize SQL
    // is GENERATED from the Scala-side tables, so the stages cannot
    // drift).
    "html_extract" ->
      s"""WITH h0 AS (
         |  SELECT doc_id, $messyHtmlSql AS html
         |  FROM documents),
         |nb AS (
         |  SELECT doc_id,
         |    ${htmlNoBlocksSql("coalesce(html, '')")} AS h
         |  FROM h0),
         |ex AS (
         |  SELECT doc_id,
         |    ${htmlNormSql(htmlDecodeSql(s"regexp_extract(h, '${Html.TitlePattern}', 1)"))} AS title,
         |    ${htmlNormSql(htmlDecodeSql(
                s"regexp_replace(regexp_replace(regexp_replace(h, '${Html.HeadPattern}', ' ', 'g'), '${Html.BreakTagPattern}', chr(10), 'g'), '${Html.TagPattern}', ' ', 'g')"))} AS text
         |  FROM nb)
         |SELECT doc_id, title, text, CAST(length(text) AS INT) AS n_chars
         |FROM ex ORDER BY doc_id""".stripMargin,

    // The [[Url]] regex chain replayed with the SAME pattern constants
    // interpolated verbatim (Java∩RE2 — the two engines run identical
    // pattern bytes). DuckDB regexp_replace needs the explicit 'g'
    // flag wherever Spark's always-global semantics matter.
    "url_normalize" ->
      s"""WITH u0 AS (
         |  SELECT doc_id, $messyUrlSql AS url
         |  FROM documents),
         |uu AS (SELECT doc_id, trim(url) AS u FROM u0),
         |r AS (
         |  SELECT doc_id, u,
         |    regexp_replace(regexp_replace(regexp_replace(u,
         |      '${Url.FragmentPattern}', ''),
         |      '${Url.SchemeStripPattern}', ''),
         |      '${Url.UserinfoPattern}', '') AS rest,
         |    lower(regexp_extract(u, '${Url.SchemePattern}', 1)) AS scheme_raw
         |  FROM uu),
         |h AS (
         |  SELECT *,
         |    CASE WHEN regexp_matches(u, '${Url.AbsoluteRefPattern}')
         |           AND NOT regexp_matches(u, '${Url.SchemeStripPattern}') THEN ''
         |    ELSE regexp_replace(regexp_replace(
         |      lower(regexp_extract(rest, '${Url.HostPattern}', 1)),
         |      '${Url.TrailingDotPattern}', ''), '${Url.WwwPattern}', '') END AS host,
         |    CASE WHEN scheme_raw = '' THEN 'http' ELSE scheme_raw END AS scheme,
         |    regexp_extract(rest, '${Url.PortPattern}', 1) AS port,
         |    regexp_replace(regexp_extract(rest, '${Url.PathPattern}', 1),
         |      '${Url.SlashRunPattern}', '/', 'g') AS path1,
         |    regexp_replace(regexp_replace(
         |      regexp_extract(rest, '${Url.QueryPattern}', 1),
         |      '${Url.TrackingParamPattern}', '', 'g'),
         |      '${Url.DanglingAmpPattern}', '', 'g') AS query
         |  FROM r),
         |n AS (
         |  SELECT doc_id, u, host, scheme, port, query,
         |    CASE WHEN path1 = '' OR path1 = '/' THEN '/'
         |         ELSE regexp_replace(path1, '${Url.TrailingSlashPattern}', '') END AS path,
         |    CASE WHEN regexp_matches(host, '${Url.SecondLevelPattern}')
         |           THEN regexp_extract(host, '${Url.ThreeLabelPattern}', 1)
         |         WHEN regexp_matches(host, '\\.')
         |           THEN regexp_extract(host, '${Url.TwoLabelPattern}', 1)
         |         ELSE host END AS registered_domain
         |  FROM h),
         |o AS (
         |  SELECT doc_id, u, host, registered_domain,
         |    CASE WHEN host = '' THEN '' ELSE scheme END AS scheme,
         |    CASE WHEN host = '' THEN ''
         |         ELSE scheme || '://' || host ||
         |           CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
         |                  OR (scheme = 'https' AND port = '443'))
         |                THEN ':' || port ELSE '' END ||
         |           path ||
         |           CASE WHEN query <> '' THEN '?' || query ELSE '' END END AS url_norm
         |  FROM n)
         |SELECT doc_id, u AS url, scheme, host, registered_domain, url_norm,
         |  url_norm <> u AS changed
         |FROM o ORDER BY doc_id""".stripMargin,
    // Winnowing replay: zipped unnests carry (pos, gram) in lockstep;
    // the packed key makes "min hash, rightmost pos on ties" a plain
    // window min with the same 4-row frame.
    "winnow_fingerprint" ->
      s"""WITH $winnowSelCte,
         |a AS (
         |  SELECT doc_id, count(*) AS n_fps, sum(fp_hash) AS cks
         |  FROM sel GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(greatest(len(tk) - 3, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(a.n_fps, 0) AS BIGINT) AS n_fps,
         |  CASE WHEN len(tk) - 3 > 0
         |    THEN round(coalesce(a.n_fps, 0) / (len(tk) - 3), 6)
         |    ELSE 0.0 END AS fp_density,
         |  CAST(coalesce(a.cks, 0) AS BIGINT) AS fp_checksum
         |FROM t LEFT JOIN a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Pair replay: star-capping reproduced via the bucket-size CTE (the
    // dedup_minhash oracle pattern), UNION ALL because shared-hash
    // OCCURRENCES are counted per pair, not deduped.
    "winnow_pairs" ->
      s"""WITH $winnowSelCte,
         |hh AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
         |sz AS (SELECT doc_id, count(*) AS nf FROM hh GROUP BY 1),
         |bsz AS (
         |  SELECT fp_hash, count(*) AS bn, min(doc_id) AS root
         |  FROM hh GROUP BY 1),
         |cand AS (
         |  SELECT a.doc_id AS id1, b2.doc_id AS id2
         |  FROM hh a JOIN hh b2 USING (fp_hash) JOIN bsz USING (fp_hash)
         |  WHERE bn <= 1024 AND a.doc_id < b2.doc_id
         |  UNION ALL
         |  SELECT root AS id1, doc_id AS id2
         |  FROM hh JOIN bsz USING (fp_hash)
         |  WHERE bn > 1024 AND doc_id <> root),
         |p AS (
         |  SELECT id1, id2, count(*) AS n_shared
         |  FROM cand GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT id1, id2, CAST(n_shared AS BIGINT) AS n_shared,
         |  round(n_shared / least(s1.nf, s2.nf), 6) AS overlap
         |FROM p JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         |ORDER BY id1, id2""".stripMargin,

    "dup_ngram_frac" ->
      s"""WITH $tokCte,
         |g AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(gr), 1, 8)) AS BIGINT) AS h
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 6),
         |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
         |        || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gr
         |    FROM t WHERE len(tk) >= 8)),
         |dg AS (SELECT doc_id, h, count(*) AS m FROM g GROUP BY 1, 2),
         |nd AS (SELECT h, count(*) AS ndocs FROM dg GROUP BY 1),
         |a AS (
         |  SELECT doc_id, sum(m) AS n_grams,
         |    sum(CASE WHEN ndocs >= 2 THEN m ELSE 0 END) AS n_dup
         |  FROM dg JOIN nd USING (h) GROUP BY 1)
         |SELECT t.doc_id,
         |  CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |    THEN round(a.n_dup / a.n_grams, 6) ELSE 0.0 END AS dup_frac
         |FROM t LEFT JOIN a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Integer weight fold: Σ w_int is exact in both engines; the only
    // float steps are the final divide and the sigmoid.
    "quality_classifier" ->
      s"""WITH $clsCte
         |SELECT t.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  coalesce(round(a.ws / (a.n_tokens * 1000000.0), 6), 0.0) AS score,
         |  coalesce(round(1.0 / (1.0 + exp(-(a.ws / (a.n_tokens * 1000000.0)))), 6),
         |    0.5) AS prob,
         |  coalesce(a.ws >= 0, TRUE) AS keep
         |FROM t LEFT JOIN a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "oov_rate" ->
      s"""WITH $tokCte,
         |tc AS (
         |  SELECT doc_id, tok, count(*) AS m
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1, 2),
         |v AS (
         |  SELECT tok FROM (SELECT tok, sum(m) AS cnt FROM tc GROUP BY 1)
         |  ORDER BY cnt DESC, tok LIMIT 500),
         |a AS (
         |  SELECT tc.doc_id, sum(m) AS n_tokens,
         |    sum(CASE WHEN v.tok IS NULL THEN m ELSE 0 END) AS n_oov
         |  FROM tc LEFT JOIN v ON tc.tok = v.tok GROUP BY 1)
         |SELECT t.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
         |  CASE WHEN coalesce(a.n_tokens, 0) > 0
         |    THEN round(a.n_oov / a.n_tokens, 6) ELSE 0.0 END AS oov_rate
         |FROM t LEFT JOIN a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "sentence_stats" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?。！？؟…]+'),
        |      x -> trim(x)), x -> x <> '') AS sl
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, len(sl) AS n_sents,
        |    list_transform(sl, x -> len(list_filter(
        |      string_split_regex(x, '[ \t\n\r\f]+'), y -> y <> ''))) AS wc
        |  FROM s)
        |SELECT doc_id, CAST(n_sents AS INT) AS n_sents,
        |  CASE WHEN n_sents > 0 THEN round(
        |    CAST(list_reduce(wc, (a, x) -> a + x) AS DOUBLE) / n_sents, 6)
        |    ELSE 0.0 END AS avg_sent_words,
        |  CAST(coalesce(list_max(wc), 0) AS INT) AS max_sent_words,
        |  CASE WHEN n_sents > 0 THEN round(
        |    len(list_filter(wc, x -> x < 4)) / CAST(n_sents AS DOUBLE), 6)
        |    ELSE 0.0 END AS short_share
        |FROM w ORDER BY doc_id""".stripMargin,

    // Rule thresholds compare the ROUNDED metrics on both sides, so the
    // verdict flags are exactly as portable as the metrics themselves.
    "gopher_filter" ->
      s"""WITH $gopherCte
         |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
         |  CAST(max_word_len AS INT) AS max_word_len, alpha_share,
         |  CAST(stop_hits AS INT) AS stop_hits, symbol_share,
         |  CAST(len(fl) AS INT) AS n_fail, len(fl) = 0 AS keep,
         |  coalesce(array_to_string(fl, ','), '') AS reasons
         |FROM f ORDER BY doc_id""".stripMargin,

    // The sourceQuality composition at prob-decile grain: classifier
    // keep + prob joined to the gopher verdict on doc_id, bucketed on
    // the 6-ROUNDED prob (edges exactly as portable as the metric).
    "quality_calibration" ->
      s"""WITH $gopherCte,
         |$clsCte,
         |cls AS (
         |  SELECT t.doc_id,
         |    coalesce(round(1.0 / (1.0 + exp(-(a.ws / (a.n_tokens * 1000000.0)))), 6),
         |      0.5) AS prob,
         |    coalesce(a.ws >= 0, TRUE) AS ck
         |  FROM t LEFT JOIN a USING (doc_id)),
         |j AS (
         |  SELECT least(CAST(floor(cls.prob * 10) AS INT), 9) AS decile,
         |    cls.ck, len(f.fl) = 0 AS gk
         |  FROM cls JOIN f USING (doc_id))
         |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ck THEN 1 ELSE 0 END) AS BIGINT) AS n_cls_keep,
         |  CAST(sum(CASE WHEN gk THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_keep,
         |  CAST(sum(CASE WHEN ck AND gk THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
         |  round(sum(CASE WHEN gk THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         |    AS gopher_keep_rate
         |FROM j GROUP BY decile ORDER BY decile""".stripMargin,

    // The classifier FIT replayed round for round: Gopher weak labels
    // → hashed-feature counts → integer closed-form init → generated
    // perceptron rounds. The ladder compares EXACTLY (every value
    // BIGINT — no float enters the fit).
    "quality_classifier_trained" ->
      s"""WITH $gopherCte,
         |$tokCte,
         |${trainLadderCte(Classifier.DefaultRounds, Classifier.DefaultBuckets,
        Classifier.DefaultLrMicro)}
         |SELECT round, bucket, weight_int FROM (
         |${(0 to Classifier.DefaultRounds).map(r =>
        s"  SELECT $r AS round, b AS bucket, wt AS weight_int FROM w$r")
        .mkString("\n  UNION ALL\n")}
         |)
         |ORDER BY round, bucket""".stripMargin,

    // The trained artifact driven through the deployment scorer: final
    // round weights joined per token occurrence, classifierTail's
    // integer fold + one divide + sigmoid (the quality_classifier
    // tail, weights swapped).
    "quality_classifier_scored" ->
      s"""WITH $gopherCte,
         |$tokCte,
         |${trainLadderCte(Classifier.DefaultRounds, Classifier.DefaultBuckets,
        Classifier.DefaultLrMicro)},
         |sa AS (
         |  SELECT tp.doc_id, count(*) AS n_tokens,
         |    CAST(sum(coalesce(w.wt, 0)) AS BIGINT) AS ws
         |  FROM tp LEFT JOIN w${Classifier.DefaultRounds} w ON tp.b = w.b
         |  GROUP BY tp.doc_id)
         |SELECT t.doc_id,
         |  CAST(coalesce(sa.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  coalesce(round(sa.ws / (sa.n_tokens * 1000000.0), 6), 0.0) AS score,
         |  coalesce(round(1.0 / (1.0 + exp(-(sa.ws / (sa.n_tokens * 1000000.0)))), 6),
         |    0.5) AS prob,
         |  coalesce(sa.ws >= 0, TRUE) AS keep
         |FROM t LEFT JOIN sa USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Domain derivation replayed (host → registered domain over the
    // same fixture), cap as a plain partitioned row_number ≤ 20 — the
    // oracle may window; the engine side must not (TopKStruct).
    "domain_cap" ->
      s"""WITH u0 AS (
         |  SELECT doc_id, $messyUrlSql AS url
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, trim(url) AS u,
         |    regexp_replace(regexp_replace(regexp_replace(trim(url),
         |      '${Url.FragmentPattern}', ''),
         |      '${Url.SchemeStripPattern}', ''),
         |      '${Url.UserinfoPattern}', '') AS rest
         |  FROM u0),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN regexp_matches(u, '${Url.AbsoluteRefPattern}')
         |           AND NOT regexp_matches(u, '${Url.SchemeStripPattern}') THEN ''
         |    ELSE regexp_replace(regexp_replace(
         |      lower(regexp_extract(rest, '${Url.HostPattern}', 1)),
         |      '${Url.TrailingDotPattern}', ''), '${Url.WwwPattern}', '') END AS host
         |  FROM r),
         |dm AS (
         |  SELECT doc_id,
         |    CASE WHEN regexp_matches(host, '${Url.SecondLevelPattern}')
         |           THEN regexp_extract(host, '${Url.ThreeLabelPattern}', 1)
         |         WHEN regexp_matches(host, '\\.')
         |           THEN regexp_extract(host, '${Url.TwoLabelPattern}', 1)
         |         ELSE host END AS registered_domain
         |  FROM h),
         |rk AS (
         |  SELECT doc_id, registered_domain,
         |    CAST(row_number() OVER (PARTITION BY registered_domain
         |      ORDER BY doc_id) AS INT) AS domain_rank
         |  FROM dm)
         |SELECT doc_id, registered_domain, domain_rank
         |FROM rk WHERE domain_rank <= 20 ORDER BY doc_id""".stripMargin,

    // Per-source rollup: gopher verdicts + classifier probabilities
    // joined at doc grain, folded to source grain over exact integer
    // micro-units (mean_prob), corpus share against the 1-row total.
    "source_quality" ->
      s"""WITH $gopherCte,
         |$clsCte,
         |cls AS (
         |  SELECT t.doc_id,
         |    coalesce(round(1.0 / (1.0 + exp(-(a.ws / (a.n_tokens * 1000000.0)))), 6),
         |      0.5) AS prob
         |  FROM t LEFT JOIN a USING (doc_id)),
         |sig AS (
         |  SELECT d.doc_id, d.source, f.n_words,
         |    CAST(len(f.fl) = 0 AS INT) AS kept, cls.prob
         |  FROM documents d JOIN f USING (doc_id) JOIN cls USING (doc_id)),
         |tot AS (SELECT count(*) AS n FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(count(*) / CAST(tot.n AS DOUBLE), 6) AS corpus_share,
         |  round(sum(kept) / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
         |  round(CAST(sum(CAST(round(prob * 1000000, 0) AS BIGINT)) AS DOUBLE)
         |    / (count(*) * 1000000.0), 6) AS mean_prob,
         |  round(CAST(sum(n_words) AS DOUBLE) / count(*), 6) AS mean_words
         |FROM sig CROSS JOIN tot
         |GROUP BY source, tot.n
         |ORDER BY source""".stripMargin,

    // Chunk replay: DuckDB list slices are 1-based with INCLUSIVE ends,
    // so window c covers tk[c*96+1 : c*96+128] (clamped past the doc
    // end, matching Spark's slice overflow behavior).
    "chunk_split" ->
      s"""WITH $tokCte,
         |d AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
         |c AS (
         |  SELECT doc_id,
         |    unnest(range(0, 1 + CASE WHEN n > 128
         |      THEN (n - 128 + 95) // 96 ELSE 0 END)) AS chunk_id,
         |    tk, n
         |  FROM d),
         |s AS (
         |  SELECT doc_id, chunk_id,
         |    tk[chunk_id * 96 + 1 : least(chunk_id * 96 + 128, n)] AS ck
         |  FROM c)
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |  CAST(chunk_id * 96 + 1 AS INT) AS start_tok,
         |  CAST(len(ck) AS INT) AS n_tokens,
         |  CAST(concat('0x', substr(md5(array_to_string(ck, ' ')), 1, 8))
         |    AS BIGINT) AS chunk_hash,
         |  array_to_string(ck, ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // Same Java∩RE2 patterns the Spark plan runs, with DuckDB's 'g'
    // flag supplying the replace-all Spark applies by default.
    // The generated replace chain replayed verbatim (same MojibakeTable
    // constants in the same order — the html_extract discipline); the
    // signal columns are pure length arithmetic over it.
    "text_fix_encoding" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text || $mojiSuffixSql AS text
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, text,
         |    ${Encoding.fixEncodingSql("text")} AS text_fixed
         |  FROM aug)
         |SELECT doc_id,
         |  CAST(length(text) - length(text_fixed) AS BIGINT) AS n_mojibake_chars,
         |  round(1.0 - (length(text) - length(text_fixed)) * 1.0 /
         |    greatest(length(text), 1), 6) AS charset_confidence,
         |  text_fixed
         |FROM f ORDER BY doc_id""".stripMargin,

    // Per-source rollup over the identical planted chain; the mean
    // confidence averages the per-doc ROUNDED values (the engine's
    // published column) and re-rounds — the corpus_stats avg policy.
    "charset_report" ->
      s"""WITH aug AS (
         |  SELECT doc_id, source, text || $mojiSuffixSql AS text
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, source, text,
         |    ${Encoding.fixEncodingSql("text")} AS text_fixed
         |  FROM aug),
         |g AS (
         |  SELECT source,
         |    length(text) - length(text_fixed) AS nm,
         |    length(text) AS n
         |  FROM f)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN nm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged,
         |  CAST(sum(nm) AS BIGINT) AS chars_repaired,
         |  round(avg(round(1.0 - nm * 1.0 / greatest(n, 1), 6)), 6) AS avg_confidence
         |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    lower(trim(regexp_replace(
        |      regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |      ' +', ' ', 'g'))) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_raw,
        |  CAST(length(norm) AS INT) AS n_chars_norm,
        |  norm <> text AS changed,
        |  norm AS norm_text
        |FROM n ORDER BY doc_id""".stripMargin,

    // Rank key is the ROUNDED score then term — pre-rounding keeps a
    // 1-ulp ln() divergence from flipping near-tied ranks cross-engine.
    "tfidf_keywords" ->
      s"""WITH $tokCte,
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS term FROM t) GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS nd FROM documents),
         |s AS (
         |  SELECT doc_id, term, tf, df,
         |    round(tf * (ln((nd + 1.0) / (df + 1)) + 1), 6) AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, term, tf, df, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, term) AS rk
         |  FROM s)
         |SELECT doc_id, rk, term, tf, df, score
         |FROM r WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin,
  )
}
