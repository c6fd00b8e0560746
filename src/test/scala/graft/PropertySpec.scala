package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.operators.{Dedup, Similarity, Snapshot, TopK}

/** Randomized property tests with INDEPENDENT brute-force oracles —
  * fixed seeds, so every run checks the same fixtures (no flaky
  * shrinking). Where the fixture specs pin hand-computed cases, these
  * pin the operator against a from-scratch reimplementation on many
  * random shapes: span marking vs a substring-count oracle, kmeans
  * assignment vs an argmin in plain Scala, snapshot diff vs set
  * algebra, bounded ranking vs sort-and-take.
  */
class PropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("exactSpans + removeSpans equal a brute-force substring oracle") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val minLen = 3 + rnd.nextInt(3) // 3..5
      val docs = (0 until 6).map { i =>
        val len = rnd.nextInt(25)
        (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }
      // Oracle: count every minLen-char window across the corpus; a
      // position is marked iff its window occurs >= 2 times; marked
      // positions merge into islands (break iff p > prev + minLen).
      val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      docs.foreach { case (_, t) =>
        (0 to t.length - minLen).foreach(p => counts(t.substring(p, p + minLen)) += 1)
      }
      def spansOf(id: Long, t: String): Seq[(Long, Long, Long)] = {
        val marked = (0 to t.length - minLen)
          .filter(p => counts(t.substring(p, p + minLen)) >= 2)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        var start = -1
        var prev = -1000
        marked.foreach { p =>
          if (start < 0) start = p
          else if (p > prev + minLen) {
            out += ((id, start.toLong, (prev + minLen).toLong)); start = p
          }
          prev = p
        }
        if (start >= 0) out += ((id, start.toLong, (prev + minLen).toLong))
        out.toSeq
      }
      val expected = docs.flatMap { case (id, t) => spansOf(id, t) }
        .map { case (d, s, e) => (d, s, e, e - s) }
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.exactSpans(df, minLen = minLen)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(out == expected, s"trial $trial minLen=$minLen docs=$docs")
      // The cleaner removes exactly the span bytes: clean_text equals
      // the oracle's gap concatenation and the length arithmetic holds.
      val clean = Dedup.removeSpans(df, minLen = minLen)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      clean.foreach { case (id, ct, nSpans, nRemoved) =>
        val t = docs.find(_._1 == id).get._2
        val sp = spansOf(id, t)
        val expClean = {
          val sb = new StringBuilder
          var cur = 0
          sp.foreach { case (_, s, e) =>
            sb.append(t.substring(cur, s.toInt)); cur = e.toInt
          }
          sb.append(t.substring(cur)); sb.toString
        }
        assert(ct == expClean && nSpans == sp.size.toLong &&
          nRemoved == sp.map(x => x._3 - x._2).sum &&
          ct.length == t.length - nRemoved,
          s"trial $trial doc $id text='$t' spans=$sp clean='$ct'")
      }
    }
  }

  test("kmeans: assignments are true argmins; output invariant to partitioning") {
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(20)
      val dim = 3
      val k = 4
      val emb = (1 to n).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextInt(21) - 10).toFloat), 0))
      val df = emb.toDF("vec_id", "embedding", "label")
      val cents = Similarity.kmeansFit(df, k = k, iters = 2)
      val got = Similarity.kmeansAssign(df, cents).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      emb.filter(_._2.exists(_ != 0f)).foreach { case (id, v, _) =>
        val d2 = cents.map(c =>
          c.zip(v.map(_.toDouble)).map { case (ci, vi) => (vi - ci) * (vi - ci) }.sum)
        val sorted = d2.zipWithIndex.sortBy(t => (t._1, t._2))
        // Skip near-ties: the operator computes |c|²−2⟨v,c⟩, a different
        // floating expression from the oracle's |v−c|²−|v|².
        if (sorted.length < 2 || sorted(1)._1 - sorted(0)._1 > 1e-9)
          assert(got(id) == sorted.head._2,
            s"trial $trial vec $id: got ${got(id)} want ${sorted.head._2} d2=${d2.toSeq}")
      }
      // Bit-determinism under any partitioning — the integer micro-unit
      // claim: repartitioned input must yield the identical profile.
      def profile(d: org.apache.spark.sql.DataFrame) =
        Similarity.kmeansClusters(d, k = k, iters = 2).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
          .sortBy(_._1).toSeq
      assert(profile(df) == profile(df.repartition(7)),
        s"trial $trial: kmeans profile changed under repartition")
    }
  }

  test("connected components equal a driver union-find oracle under any partitioning") {
    // Pins the r11 partition-local-contraction rewrite: final labels are
    // the min reachable id, independent of how edges land in partitions
    // (the contraction's local roots differ per layout; the result must
    // not).
    val rnd = new Random(1311)
    for (trial <- 1 to 6) {
      val n = 20 + rnd.nextInt(30)
      val m = 10 + rnd.nextInt(40)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L))
      // driver oracle: plain union-find by min
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        parent.getOrElseUpdate(x, x)
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      for (parts <- Seq(1, 3, 8); pj <- Seq(false, true)) {
        val df = edges.toDF("id1", "id2").repartition(parts)
        val got = graft.operators.Components
          .connectedComponents(df, "id1", "id2", pointerJump = pj)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want,
          s"trial $trial parts=$parts pj=$pj: labels diverge from the UF oracle")
      }
    }
  }

  test("corpus diff: statuses partition the id universe, stats roll up exactly") {
    val rnd = new Random(13)
    for (trial <- 1 to 5) {
      def corpus(): Map[Long, String] = (1 to 30).collect {
        case i if rnd.nextBoolean() =>
          i.toLong -> (0 until rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.toMap
      val o = corpus()
      val n = corpus()
      val out = Snapshot.corpusDiff(
        o.toSeq.toDF("doc_id", "text"), n.toSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert(out.keySet == o.keySet ++ n.keySet, s"trial $trial universe")
      out.foreach { case (id, (st, co, cn)) =>
        val exp =
          if (!o.contains(id)) "added"
          else if (!n.contains(id)) "removed"
          else if (o(id) == n(id)) "unchanged" else "changed"
        assert(st == exp, s"trial $trial id $id: $st vs $exp")
        assert(co == o.get(id).map(_.length.toLong).getOrElse(0L) &&
          cn == n.get(id).map(_.length.toLong).getOrElse(0L), s"trial $trial id $id chars")
      }
      val stats = Snapshot.diffStats(Snapshot.corpusDiff(
        o.toSeq.toDF("doc_id", "text"), n.toSeq.toDF("doc_id", "text")))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val byStatus = out.toSeq.groupBy(_._2._1)
      assert(stats.keySet == byStatus.keySet, s"trial $trial stats keys")
      byStatus.foreach { case (st, rows) =>
        assert(stats(st) == ((rows.size.toLong,
          rows.map(_._2._2).sum, rows.map(_._2._3).sum)), s"trial $trial $st")
      }
    }
  }

  test("BPE: batched merge rounds equal sequential training on random corpora") {
    import graft.operators.Bpe
    val rnd = new Random(21)
    for (trial <- 1 to 4) {
      val words = (1 to 12).map(_ =>
        (2 + rnd.nextInt(3) to 0 by -1).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = (1 to 6).map(i =>
        (i.toLong, (1 to 8).map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val seq = Bpe.train(docs, merges = 6)
      val (bat, rounds) = Bpe.trainBatched(docs, merges = 6)
      assert(bat.map(m => (m.lhs, m.rhs, m.merged, m.pair_count)) ==
        seq.map(m => (m.lhs, m.rhs, m.merged, m.pair_count)),
        s"trial $trial: batched=$bat sequential=$seq")
      assert(rounds <= seq.size, s"trial $trial: $rounds rounds for ${seq.size} merges")
    }
  }

  test("BPE: vocab-grain tokenization equals the projection on random corpora") {
    import graft.operators.Bpe
    val rnd = new Random(33)
    for (trial <- 1 to 4) {
      val words = (1 to 10).map(_ =>
        (1 + rnd.nextInt(4) to 0 by -1).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = (1 to 8).map { i =>
        val n = rnd.nextInt(9) // 0 words possible — the empty-doc row rule
        (i.toLong, (1 to n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val merges = Bpe.train(docs, merges = 4)
      val a = Bpe.tokenize(docs, merges).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
      val b = Bpe.tokenizeByVocab(docs, merges).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
      assert(a == b, s"trial $trial merges=$merges")
    }
  }

  test("BPE packed sequences reconstruct the corpus token stream exactly") {
    import graft.operators.Bpe
    val rnd = new Random(55)
    for (trial <- 1 to 3) {
      val words = (1 to 8).map(_ =>
        (1 + rnd.nextInt(3) to 0 by -1).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = (1 to 10).map { i =>
        (i.toLong, (1 to rnd.nextInt(7)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val merges = Bpe.train(docs, merges = 3)
      val seqLen = 3L + rnd.nextInt(6)
      val packed = Bpe.packedSequences(docs, merges, seqLen = seqLen)
        .orderBy("seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      // Conservation: sequences in seq_id order concatenate to exactly
      // the doc_id-order corpus token stream — nothing lost, nothing
      // reordered, nothing duplicated.
      val stream = packed.map(_._3).filter(_.nonEmpty).mkString(" ")
      val expected = Bpe.tokenize(docs, merges).orderBy("doc_id").collect()
        .flatMap(r => r.getSeq[String](1)).mkString(" ")
      assert(stream == expected, s"trial $trial seqLen=$seqLen")
      // Fullness: every sequence except the tail is exactly seqLen.
      packed.dropRight(1).foreach { case (sid, n, _) =>
        assert(n == seqLen, s"trial $trial seq $sid has $n != $seqLen") }
      // Sequence ids are contiguous from 0.
      assert(packed.map(_._1) == packed.indices.map(_.toLong), packed.map(_._1).toString)
    }
  }

  test("sentence dedup clean equals a brute-force count-and-strip oracle") {
    val rnd = new Random(77)
    for (trial <- 1 to 6) {
      val pool = (1 to 6).map(i => s"s$i ${('a' + rnd.nextInt(3)).toChar}")
      val docs = (1 to 7).map { i =>
        val n = rnd.nextInt(6)
        (i.toLong, (1 to n).map(_ => pool(rnd.nextInt(pool.size))).mkString(". ") +
          (if (n > 0) "." else ""))
      }
      // Brute force: split on the operator's terminator runs, trim,
      // drop empties; count occurrences corpus-wide; cut count>=2.
      val sentsOf = docs.map { case (id, t) =>
        id -> t.split("[.!?。！？؟…]+").map(_.trim).filter(_.nonEmpty).toSeq
      }
      val counts = sentsOf.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.size }
      val expected = sentsOf.map { case (id, ss) =>
        (id, ss.size.toLong, ss.count(s => counts(s) >= 2).toLong,
          ss.filter(s => counts(s) < 2).mkString(" "))
      }
      val out = Dedup.sentenceDedupClean(docs.toDF("doc_id", "text"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(out == expected, s"trial $trial docs=$docs")
    }
  }

  test("maximal spans: sound, window-complete, PD-identical on random corpora") {
    val rnd = new Random(5)
    for (trial <- 1 to 5) {
      val minLen = 4
      val docs = (0 until 5).map { i =>
        val len = 8 + rnd.nextInt(18)
        (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
      }
      val df = docs.toDF("doc_id", "text")
      val all = docs.map(_._2)
      def occurrences(s: String): Int =
        all.map(t => Iterator.range(0, t.length - s.length + 1)
          .count(p => t.regionMatches(p, s, 0, s.length))).sum
      val ms = Dedup.maximalSpans(df, minLen = minLen)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // Soundness: every reported span's substring occurs >= 2 times.
      ms.foreach { case (id, s, e) =>
        val t = docs.find(_._1 == id).get._2
        val sub = t.substring(s.toInt, e.toInt)
        assert(occurrences(sub) >= 2, s"trial $trial span ($id,$s,$e)='$sub' unique")
      }
      // Window-completeness: maximal spans cover exactly the bytes the
      // window-exact islands cover (every duplicated window lives
      // inside some maximal repeat and vice versa).
      def bytes(spans: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
        spans.flatMap { case (id, s, e) => (s until e).map(id -> _) }.toSet
      val we = Dedup.exactSpans(df, minLen = minLen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(bytes(ms) == bytes(we), s"trial $trial byte cover mismatch")
      // The prefix-doubling twin is output-identical on arbitrary data.
      val pd = Dedup.maximalSpansPD(df, minLen = minLen)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(pd == ms, s"trial $trial PD twin diverged")
    }
  }

  test("groupedWithRank equals per-group sort-and-take on random data") {
    val rnd = new Random(99)
    for (trial <- 1 to 5) {
      val rows = (1 to 120).map(i =>
        (rnd.nextInt(5), rnd.nextInt(20).toDouble, i.toLong)) // id unique → total order
      val k = 1 + rnd.nextInt(4)
      val df = rows.toDF("grp", "v", "id")
      val out = TopK.groupedWithRank(df, Seq(col("grp")), k,
        Seq(col("v"), col("id"))).collect()
        .map(r => (r.getAs[Int]("grp"), r.getAs[Int]("rk"),
          r.getAs[Double]("v"), r.getAs[Long]("id"))).toSeq.sorted
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(t => (t._2, t._3)).take(k).zipWithIndex.map {
          case ((_, v, id), i) => (g, i + 1, v, id)
        }
      }.sorted
      assert(out == exp, s"trial $trial k=$k")
    }
  }

  test("range join equals the brute-force range predicate on random event streams") {
    import java.sql.Timestamp
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      // Random µs-grain timestamps clustered tightly enough that
      // same-bin, bin-straddling, boundary-equal, and empty-window
      // shapes all occur; window width varies per trial.
      val windowSec = Seq(60L, 300L, 3600L)(rnd.nextInt(3))
      val base = 1704067200000000L // 2024-01-01 in µs
      val events = (1 to 200).map { i =>
        val tpe = if (rnd.nextBoolean()) "click" else "purchase"
        val us = base + rnd.nextInt(4) * windowSec * 1000000L +
          (rnd.nextLong() % (2 * windowSec * 1000000L)).abs
        (i.toLong, (rnd.nextInt(6) + 1).toLong, tpe, us)
      }
      val df = events.map { case (e, u, t, us) =>
        val ts = new Timestamp(us / 1000L)
        ts.setNanos(((us % 1000000L) * 1000L).toInt)
        (e, u, t, ts)
      }.toDF("event_id", "user_id", "event_type", "ts")
      val out = graft.operators.Analytics.rangeJoin(df, windowSec = windowSec)
        .collect()
        .map(r => (r.getAs[Long]("right_id"), r.getAs[Long]("left_id"),
          r.getAs[Long]("lag_us"))).toSeq.sorted
      // Brute force: every (purchase, click) pair, same user, half-open
      // window — stated directly, no bins.
      val w = windowSec * 1000000L
      val exp = (for {
        (re, ru, rt, rus) <- events if rt == "purchase"
        (le, lu, lt, lus) <- events
        if lt == "click" && lu == ru && lus >= rus - w && lus < rus
      } yield (re, le, rus - lus)).sorted
      assert(out == exp, s"trial $trial w=$windowSec: got ${out.size}, want ${exp.size}")
      assert(exp.nonEmpty, s"trial $trial degenerate fixture")
    }
  }

  test("url resolution is idempotent and absolute on random references") {
    import org.apache.spark.sql.functions.col
    // A crawl frontier re-resolves URLs it already resolved (a page
    // links to a URL another page's extraction produced) — resolution
    // must be a NO-OP on its own outputs: every output is scheme-ful,
    // and scheme-ful references pass through unchanged.
    val rnd = new Random(11)
    val segs = Seq("a", "bb", "x1", "img", "..", ".")
    def path(n: Int) = (1 to n).map(_ => segs(rnd.nextInt(segs.size))).mkString("/")
    val hrefs = (1 to 120).map { i =>
      rnd.nextInt(7) match {
        case 0 => s"https://h$i.example/${path(2)}"
        case 1 => s"//cdn$i.example/${path(1)}"
        case 2 => s"/${path(3)}"
        case 3 => path(3)
        case 4 => s"#frag$i"
        case 5 => s"?q=$i"
        case _ => ""
      }
    }
    val base = "https://site.example.com/dir/sub/page.html?q=1#top"
    val df = hrefs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "href")
      .withColumn("r1", graft.operators.Url.resolveCol(col("href"),
        org.apache.spark.sql.functions.lit(base)))
    val out = df
      .withColumn("r2", graft.operators.Url.resolveCol(col("r1"),
        org.apache.spark.sql.functions.lit(base)))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    out.foreach { case (h, r1, r2) =>
      assert(r1 == r2, s"not idempotent: '$h' -> '$r1' -> '$r2'")
      assert(r1.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*"),
        s"not absolute: '$h' -> '$r1'")
    }
  }

  test("encoding repair inverts the mojibake round trip on random target mixes") {
    import graft.operators.Encoding
    // Random sentences mixing ASCII with repair-table targets: the
    // planted corruption is the REAL round trip (utf8 → cp1252), and
    // one chain pass must invert it exactly; clean strings that avoid
    // the marker characters must pass through untouched (confidence 1).
    val rnd = new Random(29)
    val targets = Encoding.MojibakeTable.map(_._2)
    val ascii = "the quick brown fox 42 jumps".split(" ")
    def sentence(): String = (1 to 12).map { _ =>
      if (rnd.nextInt(3) == 0) targets(rnd.nextInt(targets.size))
      else ascii(rnd.nextInt(ascii.size))
    }.mkString(" ")
    val rows = (1 to 80).map(i => (i.toLong, sentence()))
    val planted = rows.map { case (i, s) => (i, Encoding.mojibakeOf(s), s) }
      .toDF("doc_id", "text", "expected")
    val fixed = Encoding.withFixedEncoding(planted)
      .collect().map(r => (r.getAs[String]("expected"),
        r.getAs[String]("text_fixed"), r.getAs[Long]("n_mojibake_chars")))
    fixed.foreach { case (exp, got, n) =>
      assert(got == exp, s"repair diverged:\n  expected '$exp'\n  got      '$got'")
      // every non-ASCII target char cost exactly its mojibake surplus
      val surplus = Encoding.mojibakeOf(exp).length - exp.length
      assert(n == surplus, s"n_mojibake_chars $n != planted surplus $surplus")
    }
    // ASCII-only strings are fixpoints with confidence exactly 1.0
    val clean = (1 to 20).map(i => (i.toLong, (1 to 8).map(_ =>
      ascii(rnd.nextInt(ascii.size))).mkString(" "))).toDF("doc_id", "text")
    val cleanOut = Encoding.withFixedEncoding(clean).collect()
    cleanOut.foreach { r =>
      assert(r.getAs[String]("text_fixed") == r.getAs[String]("text"))
      assert(r.getAs[Double]("charset_confidence") == 1.0)
    }
  }

  test("media near-dup banding equals brute-force hamming <= 3 on random corpora") {
    import graft.ops.Multimodal
    // The pigeonhole claim on random data: the banded candidate join
    // (chunk-bucket collect + exact verify) must enumerate EXACTLY the
    // all-pairs set within hamming 3 — including planted twins and
    // whatever collisions the random corpus produces.
    val rnd = new Random(47)
    val words = "alpha beta gamma delta epsilon zeta eta theta".split(" ")
    def text(): String = (1 to (20 + rnd.nextInt(120)))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val base = (1 to 60).map(i => (i.toLong, text()))
    val planted = base.filter(_._1 % 10 == 0).map { case (i, t) => (i + 100L, t) } ++
      base.filter(_._1 % 10 == 5).map { case (i, t) =>
        (i + 200L, "Q" + t.substring(1)) }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val banded = Multimodal.mediaNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Multimodal.perceptualSig(media).collect()
      .map(s => s.doc_id -> Seq(s.k0, s.k1, s.k2, s.k3)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = (sigs(a) zip sigs(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs != brute ${brute.size}")
    // the planted exact twins are all present at hamming 0
    base.filter(_._1 % 10 == 0).foreach { case (i, _) =>
      assert(banded.contains((i, i + 100L, 0)), s"missing twin pair for $i")
    }
  }
}
