package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Bpe

/** Ground-truth BPE fixtures — the classic Sennrich vocabulary
  * {low:5, lower:2, newest:6, widest:3}, hand-traced merge rounds under
  * the documented (count DESC, lhs ASC, rhs ASC) tie-break.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sennrich = {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("bpePairs ranks first-round pair counts with lexicographic tie-break") {
    val out = Bpe.bpePairs(sennrich, k = 6).orderBy(col("rk"))
      .collect().map(r => (r.getAs[Int]("rk"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count")))
    // count-9 tie (e,s) (s,t) (t,</w>) resolves lexicographically.
    assert(out.toSeq == Seq(
      (1, "e", "s", 9L), (2, "s", "t", 9L), (3, "t", Bpe.Eow, 9L),
      (4, "w", "e", 8L), (5, "l", "o", 7L), (6, "o", "w", 7L)))
  }

  test("train reproduces the classic merge sequence") {
    val merges = Bpe.train(sennrich, merges = 5)
    assert(merges.map(m => (m.lhs, m.rhs, m.pair_count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.Eow, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.round) == Seq(1, 2, 3, 4, 5))
  }

  test("tokenize segments an unseen word with trained merges") {
    val merges = Bpe.train(sennrich, merges = 5)
    val row = Bpe.tokenize(Seq((7L, "lowest")).toDF("doc_id", "text"), merges)
      .collect().head
    val toks = row.getSeq[String](row.fieldIndex("bpe_tokens"))
    assert(toks == Seq("low", "est" + Bpe.Eow))
  }

  test("merge application is greedy leftmost on overlaps") {
    val m = Seq(Bpe.Merge(1, "a", "a", "aa", 0L))
    val row = Bpe.tokenize(Seq((1L, "aaa")).toDF("doc_id", "text"), m)
      .collect().head
    val toks = row.getSeq[String](row.fieldIndex("bpe_tokens"))
    assert(toks == Seq("aa", "a", Bpe.Eow))
  }

  test("train stops early when the vocabulary is fully merged") {
    val merges = Bpe.train(Seq((1L, "ab ab")).toDF("doc_id", "text"), merges = 10)
    // "ab" → a b </w>: two pairs, then one, then none.
    assert(merges.length == 2)
    assert(merges.map(m => (m.lhs, m.rhs)) ==
      Seq(("a", "b"), ("ab", Bpe.Eow)))
  }

  test("train on an empty/blank corpus yields no merges") {
    assert(Bpe.train(Seq((1L, "")).toDF("doc_id", "text")).isEmpty)
  }
}
