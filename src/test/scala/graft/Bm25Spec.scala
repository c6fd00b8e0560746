package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "cat dog"),      // dl=2
    (2L, "cat cat cat"),  // dl=3
    (3L, "bird")          // dl=1
  ).toDF("doc_id", "text")

  private def bm25(tf: Int, dl: Int, df: Int, n: Int, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("single term: hand-computed scores, tf and length normalization") {
    val out = Bm25.topk(docs, Seq("cat"), k = 10).orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L)) // d3 absent
    // N=3, avgdl=2, df(cat)=2.
    assert(out(0).getAs[Double]("score") == r6(bm25(3, 3, 2, 3, 2.0)))
    assert(out(1).getAs[Double]("score") == r6(bm25(1, 2, 2, 3, 2.0)))
    assert(out.forall(_.getAs[Long]("n_terms_matched") == 1L))
  }

  test("multi-term: per-term contributions sum; matched-term count") {
    val out = Bm25.topk(docs, Seq("cat", "dog"), k = 10).orderBy("rk").collect()
    val d1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(d1.getAs[Long]("n_terms_matched") == 2L)
    // df(dog)=1: the rarer term carries the larger idf.
    assert(d1.getAs[Double]("score") ==
      r6(bm25(1, 2, 2, 3, 2.0) + bm25(1, 2, 1, 3, 2.0)))
  }

  test("terms absent from the corpus match nothing; empty query rejected") {
    assert(Bm25.topk(docs, Seq("zebra")).count() == 0)
    intercept[IllegalArgumentException] { Bm25.topk(docs, Seq.empty) }
  }

  test("ranks are dense and deterministic on ties") {
    val tie = Seq((1L, "cat"), (2L, "cat")).toDF("doc_id", "text")
    val out = Bm25.topk(tie, Seq("cat")).orderBy("rk").collect()
    assert(out.map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"))).toSeq ==
      Seq((1, 1L), (2, 2L)))  // equal scores tie-break on doc_id
  }

  test("hybrid RRF: hand-computed fusion of lexical and dense ranks") {
    // Lexical arm: equal dl ⇒ rank by tf: doc2 (tf=2) then doc1 (tf=1).
    val hdocs = Seq(
      (0L, "query doc body"),
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "zeta eta theta"),
      (4L, "iota kappa mu")
    ).toDF("doc_id", "text")
    // Dense arm vs query vec (1,0): doc1 cos≈0.995, doc3 cos≈0.707,
    // doc2 cos=0, doc4 cos=−1 ⇒ top-3 = doc1, doc3, doc2.
    val hemb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0.1f), 0),
      (2L, Array(0f, 1f), 0), (3L, Array(1f, 1f), 0),
      (4L, Array(-1f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Hybrid
      .topk(hdocs, hemb, Seq("alpha"), queryVecId = 0L, k = 4, poolK = 3)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("lex_rk")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("dense_rk")).map(_.toLong),
        r.getAs[Double]("rrf_score"))).toSeq
    def rrf(rks: Seq[Long]) = r6(rks.map(r => 1.0 / (60 + r)).sum)
    assert(out == Seq(
      (1, 1L, Some(2L), Some(1L), rrf(Seq(2L, 1L))),
      (2, 2L, Some(1L), Some(3L), rrf(Seq(1L, 3L))),
      (3, 3L, None, Some(2L), rrf(Seq(2L)))), out.toString)

    // The ANN plug point: Hybrid.fuse with a hand-supplied dense list
    // matching the brute arm's ranking reproduces topk exactly.
    val lex = graft.operators.Bm25
      .topk(hdocs.filter($"doc_id" =!= 0L), Seq("alpha"), 3)
      .select($"doc_id", $"rk".cast("long").as("lex_rk"))
    val dense = Seq((1L, 1L), (3L, 2L), (2L, 3L)).toDF("doc_id", "dense_rk")
    val fused = graft.operators.Hybrid.fuse(lex, dense, k = 4)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("lex_rk")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("dense_rk")).map(_.toLong),
        r.getAs[Double]("rrf_score"))).toSeq
    assert(fused == out, s"fuse must replay topk: $fused")

    // Fail-loudly guard (ADVICE r7, lazy per ADVICE r8): a missing or
    // zero-norm query embedding must raise AT ACTION TIME (the guard
    // rides the plan as a broadcast 1-row raise_error — construction
    // stays lazy, no eager scan), not silently return lexical-only
    // results.
    def guardMsg(body: => Unit): String = {
      val e = intercept[Throwable](body)
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    }
    val mMissing = guardMsg {
      graft.operators.Hybrid.topk(hdocs, hemb, Seq("alpha"), queryVecId = 99L)
        .collect()
    }
    assert(mMissing.contains("found 0"), mMissing)
    val zeroEmb = Seq((0L, Array(0f, 0f), 0), (1L, Array(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val mZero = guardMsg {
      graft.operators.Hybrid.topk(hdocs, zeroEmb, Seq("alpha"), queryVecId = 0L)
        .collect()
    }
    assert(mZero.contains("found 0"), mZero)
    // r9 review finding: the guard must fire even when the CANDIDATE
    // arm is ALSO empty (all embeddings zero-norm) — it rides the
    // broadcast side's projection, which builds regardless of streamed
    // rows. repartition keeps the local fixture from being folded away
    // at plan time (ConvertToLocalRelation would bypass execution).
    val allZero = Seq((0L, Array(0f, 0f), 0), (1L, Array(0f, 0f), 0))
      .toDF("vec_id", "embedding", "label").repartition(2)
    val mEmpty = guardMsg {
      graft.operators.Hybrid.topk(hdocs, allZero, Seq("alpha"), queryVecId = 0L)
        .collect()
    }
    assert(mEmpty.contains("found 0"), mEmpty)
    // ...and even when the LEXICAL arm is ALSO empty (terms matching no
    // document): an empty fused frame must not prune the guard away
    // (the union-sentinel shape — second r9 review finding).
    val mNoLex = guardMsg {
      graft.operators.Hybrid.topk(hdocs, allZero, Seq("zzz_unmatched_term"),
          queryVecId = 0L)
        .collect()
    }
    assert(mNoLex.contains("found 0"), mNoLex)
  }
}
