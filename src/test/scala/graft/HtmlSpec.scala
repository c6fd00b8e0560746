package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Html

class HtmlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def extract(rows: (Long, String)*) =
    Html.extract(rows.toDF("doc_id", "html"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getInt(3))))
      .toMap

  test("html_extract: full page — blocks stripped, title captured, structure kept") {
    val page =
      "<!DOCTYPE html>\n<html><head><title> The &amp; Title </title>\n" +
        "<style type=\"text/css\">\n body { color: red; }\n</style></head>\n" +
        "<body><nav><a href=\"/x\">Home</a></nav>\n" +
        "<h1>Heading</h1>\n<p>First para.</p><p>Second   para.</p>\n" +
        "<script>\nvar x = 1 < 2 && \"</p>\";\n</script>\n" +
        "<footer>&copy; 2026 &lt;Corp&gt;</footer></body></html>"
    val (title, text, n) = extract(1L -> page)(1L)
    assert(title == "The & Title")
    // style/script payloads gone — including the </p> hidden inside a
    // script string (lazy dotall match to the real close tag)
    assert(!text.contains("color") && !text.contains("var x"))
    // block tags became newlines, inline tags spaces, runs collapsed
    assert(text == "Home\nHeading\nFirst para.\nSecond para.\n&copy; 2026 <Corp>")
    assert(n == text.length)
  }

  test("html_extract: entities — one decode level, &amp; last, unknown pass through") {
    val (_, text, _) =
      extract(1L -> "<p>a &lt;b&gt; c &quot;d&quot; &#39;e&apos; f&nbsp;g &amp;&amp; &amp;lt;kept&amp;gt; &copy;</p>")(1L)
    // entity-encoded markup decodes to literal text AFTER tag stripping
    // — it is content, not tags; double-encoding decodes exactly once.
    assert(text == "a <b> c \"d\" 'e' f g && &lt;kept&gt; &copy;")
  }

  test("html_extract: comments, null markup, unclosed script degrade safely") {
    val out = extract(
      1L -> "<div><!-- hidden <script>x()</script> -->shown</div>",
      2L -> (null: String),
      3L -> "<p>before</p><script>var y = 1;",
      4L -> "plain text, no markup at all")
    assert(out(1L) == (("", "shown", 5)))
    // NULL markup keeps the row with empty fields (ADVICE r6 rule)
    assert(out(2L) == (("", "", 0)))
    // unclosed script: content survives as tag-stripped text rather
    // than eating the rest of the document
    assert(out(3L)._2 == "before\nvar y = 1;")
    assert(out(4L) == (("", "plain text, no markup at all", 28)))
  }

  test("html_extract: commented-out script opener never eats real content") {
    // Comments strip before script blocks: the <script> inside the
    // comment must not pair with the later real </script>.
    val out = extract(
      1L -> "<!-- ad disabled: <script> -->Hello world.<script>track()</script>",
      // and a comment fully inside a script dies with the script
      2L -> "<p>keep</p><script>/* <!-- x --> */ y()</script>")
    assert(out(1L)._2 == "Hello world.")
    assert(out(2L)._2 == "keep")
  }

  test("html_links: all three quote forms, block-dead links excluded, entities decoded") {
    import org.apache.spark.sql.functions.col
    val html =
      "<a HREF = \"https://x.example/a?b=1&amp;c=2\">A</a>" +
        "<script><a href=\"https://dead.example/x\"></script>" +
        "<!-- <a href=\"https://commented.example/y\"> -->" +
        "<a href=bare>B</a><a class=\"z\" href=\"/rel\">R</a>" +
        "<a href='/single'>S</a><a href=\"it's\">Q</a>" +
        "<a data-href=\"https://tracker.example/t\">no real href</a>"
    val links = Seq((1L, html)).toDF("doc_id", "html")
      .select(Html.linksCol(col("html")).as("l"))
      .collect().head.getSeq[String](0)
    // data-href is an attribute that merely ENDS in href — it must
    // never leak a tracker URL into the edge set. Bare and
    // single-quoted forms capture (r10); a quoted value whose interior
    // holds the OTHER quote keeps it (the anchored-pair trim).
    assert(links == Seq("https://x.example/a?b=1&c=2", "bare", "/rel",
      "/single", "it's"))
  }

  test("html_extract: bare angle brackets in prose are content, not tags") {
    // ADVICE r9: `<[^>]*>` silently ate ' 100 and ' — the tag strip
    // now requires a tag-start character after '<'.
    val out = extract(
      1L -> "<p>price < 100 and > 50</p>",
      2L -> "<p>a <b>bold</b> 2<3 end</p>")
    assert(out(1L)._2 == "price < 100 and > 50")
    assert(out(2L)._2 == "a bold 2<3 end")
  }

  test("html_extract: numeric entities — decimal and hex forms of the shared table") {
    val out = extract(
      1L -> "<p>q &#34;x&#x22; s &#39;y&#x27; amp &#38;&#x26; sp&#160;z</p>",
      2L -> "<p>curly &#8220;a&#8221; dash &#8211; ell &#8230; lt &#x3c;nn&#x3e;</p>",
      // the long numeric tail beyond the table passes through verbatim
      3L -> "<p>&#9731; &#x1F600;</p>")
    assert(out(1L)._2 == "q \"x\" s 'y' amp && sp z")
    assert(out(2L)._2 == "curly “a” dash – ell … lt <nn>")
    assert(out(3L)._2 == "&#9731; &#x1F600;")
  }

  test("html_extract: whitespace normalization is the documented chain") {
    val (_, text, _) =
      extract(1L -> "<p>  a\t\tb </p>\n\n\n<p> c </p>  ")(1L)
    assert(text == "a b\nc")
  }
}
