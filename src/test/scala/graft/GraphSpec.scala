package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pagerank ladder: hand-computed integer rounds on a 3-node graph") {
    // a→b, b→a, a→c (c dangling, plus a self-loop and a null that must
    // drop). micro 1e6, damping 50%, N=3.
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"),
      ("b", "b"),            // self-loop → dropped
      ("a", "b"),            // parallel edge → collapsed
      (null.asInstanceOf[String], "a")) // null endpoint → dropped
      .toDF("src", "dst")
    val out = Graph.pageRankLadder(edges, rounds = 2, dampingPct = 50,
        micro = 1000000L)
      .collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("node")) ->
        r.getAs[Long]("rank_micro"))
      .toMap
    // r0 = 1e6 // 3 everywhere
    assert(Seq("a", "b", "c").forall(n => out((0, n)) == 333333L))
    // round 1: base = 50·1e6 // 300 = 166666; a←b: 333333 whole;
    // b,c←a: 333333 // 2 = 166666 each
    assert(out((1, "a")) == 166666L + 50L * 333333L / 100L)      // 333332
    assert(out((1, "b")) == 166666L + 50L * 166666L / 100L)      // 249999
    assert(out((1, "c")) == out((1, "b")))
    // round 2: a←b(249999 whole); b,c←a(333332 // 2 = 166666)
    assert(out((2, "a")) == 166666L + 50L * 249999L / 100L)      // 291665
    assert(out((2, "b")) == 166666L + 50L * 166666L / 100L)
    assert(out((2, "c")) == out((2, "b")))
    // dangling c keeps receiving base but redistributes nothing —
    // total mass decays below micro (documented deviation)
    assert(Seq("a", "b", "c").map(n => out((2, n))).sum < 1000000L)
    // bit-deterministic across runs
    val again = Graph.pageRankLadder(edges, rounds = 2, dampingPct = 50,
      micro = 1000000L).collect().map(_.toSeq).toSet
    assert(again == Graph.pageRankLadder(edges, rounds = 2, dampingPct = 50,
      micro = 1000000L).collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](Graph.pageRankLadder(edges, rounds = 0))
    intercept[IllegalArgumentException](Graph.pageRankLadder(edges, dampingPct = 101))
  }

  test("pagerank: authority flows to the hub — sink of a star outranks leaves") {
    val star = (1 to 9).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val ranks = Graph.pageRankLadder(star, rounds = 5)
      .filter($"round" === 5)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(ranks("hub") > ranks("leaf1") * 5,
      s"hub should dominate: $ranks")
  }
}
