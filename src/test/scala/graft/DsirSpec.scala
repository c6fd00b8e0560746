package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("n_grams counts unigrams plus bigrams") {
    val out = Dsir.weights(docs((1L, "a b c", "en")), col("lang") === "en")
      .collect().head
    assert(out.getAs[Long]("n_grams") == 5L)  // 3 unigrams + 2 bigrams
  }

  test("target-like documents outscore off-target ones") {
    val d = docs(
      (1L, "good clean prose", "en"),
      (2L, "good clean prose", "en"),
      (3L, "good clean prose", "xx"),   // candidate matching the target
      (4L, "junk spam words", "xx"))    // candidate far from the target
    val w = Dsir.weights(d, col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    assert(w.size == 4)                 // every doc weighted, target included
    assert(w(3L) > w(4L))
    assert(w(3L) == w(1L))              // same features ⇒ same weight
  }

  test("weights are deterministic across runs") {
    val d = docs((1L, "alpha beta", "en"), (2L, "gamma delta", "xx"))
    val r1 = Dsir.weights(d, col("lang") === "en").orderBy("doc_id").collect().toSeq
    val r2 = Dsir.weights(d, col("lang") === "en").orderBy("doc_id").collect().toSeq
    assert(r1 == r2)
  }

  test("resample: deterministic Gumbel top-k with dense ranks") {
    val d = docs(
      (1L, "good clean prose", "en"), (2L, "good clean text", "en"),
      (3L, "junk spam words", "xx"), (4L, "other noise here", "xx"),
      (5L, "good clean here", "xx"))
    val w = Dsir.weights(d, col("lang") === "en")
    val s1 = Dsir.resample(w, 3).orderBy("rk").collect().toSeq
    val s2 = Dsir.resample(w, 3).orderBy("rk").collect().toSeq
    assert(s1 == s2)                                  // hash-Gumbel: replayable
    assert(s1.map(_.getAs[Int]("rk")) == Seq(1, 2, 3))
    assert(s1.map(_.getAs[Long]("doc_id")).distinct.size == 3)
  }

  test("resample keeps every row when k exceeds the pool") {
    val d = docs((1L, "a b", "en"), (2L, "c d", "xx"))
    assert(Dsir.resample(Dsir.weights(d, col("lang") === "en"), 10).count() == 2)
  }
}
