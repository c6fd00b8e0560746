package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Fundamentals}

class AnalyticsFundSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  test("max drawdown: running-peak ratio, worst vs current") {
    val bars = Seq(
      (1L, d("2024-01-01"), 10.0), (1L, d("2024-01-02"), 12.0),
      (1L, d("2024-01-03"), 9.0), (1L, d("2024-01-04"), 11.0))
      .toDF("user_id", "date", "close")
    val out = Analytics.maxDrawdown(bars).collect().head
    assert(out.getAs[Long]("n_days") == 4L)
    // peaks 10,12,12,12 → drawdowns 0, 0, −0.25, 11/12−1
    assert(out.getAs[Double]("max_drawdown") == -0.25)
    assert(math.abs(out.getAs[Double]("current_drawdown") - (11.0 / 12 - 1)) < 1e-12)
  }

  test("beta vs market: proportional return series recover exact betas") {
    // r1 = (4/3)·market, r2 = (2/3)·market by construction → betas
    // 4/3 and 2/3, alphas 0.
    val bars = Seq(
      (1L, d("2024-01-01"), 100.0), (1L, d("2024-01-02"), 110.0),
      (1L, d("2024-01-03"), 99.0), (1L, d("2024-01-04"), 108.9),
      (2L, d("2024-01-01"), 100.0), (2L, d("2024-01-02"), 105.0),
      (2L, d("2024-01-03"), 99.75), (2L, d("2024-01-04"), 104.7375))
      .toDF("user_id", "date", "close")
    val out = Analytics.betaVsMarket(bars, minDays = 2)
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_days") == 3L))
    assert(math.abs(out(0).getAs[Double]("beta") - 4.0 / 3) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("beta") - 2.0 / 3) < 1e-9)
    assert(out.forall(r => math.abs(r.getAs[Double]("alpha")) < 1e-9))
  }

  test("date gaps: missing days inside the span only, none for contiguous series") {
    val bars = Seq(
      (1L, d("2024-01-01"), 1.0), (1L, d("2024-01-02"), 1.0),
      (1L, d("2024-01-05"), 1.0),                       // gap: 3rd, 4th
      (2L, d("2024-01-01"), 1.0), (2L, d("2024-01-02"), 1.0)) // contiguous
      .toDF("user_id", "date", "close")
    val out = Analytics.dateGaps(bars).orderBy("user_id", "missing_date")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("missing_date").toString))
    assert(out.toSeq == Seq((1L, "2024-01-03"), (1L, "2024-01-04")))
  }

  test("similar series: correlated pair ranks first, both directions emitted") {
    // u1/u2 move together (+,-,+); u3 moves opposite — for u1 the top
    // neighbor must be u2 (corr 1) then u3 (corr -1), and symmetric.
    def series(u: Long, closes: Seq[Double]) =
      closes.zipWithIndex.map { case (c, i) =>
        (u, d(f"2024-01-${i + 1}%02d"), c, 100L) }
    val bars = (series(1L, Seq(10, 11, 10, 11.5)) ++
      series(2L, Seq(20, 22, 20, 23)) ++
      series(3L, Seq(30, 27, 30, 27))).toDF("user_id", "date", "close", "volume")
    val out = Analytics.similarSeries(bars, topK = 3, k = 2, minDays = 2)
      .orderBy("user_id", "rk").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("correlation")))
    assert(out.length == 6, s"3 symbols x 2 neighbors, got ${out.toSeq}")
    assert(out(0) == ((1L, 1, 2L, 1.0)) && out(1)._3 == 3L)
    assert(out(2) == ((2L, 1, 1L, 1.0)))
    assert(out(4)._1 == 3L && out(4)._4 < 0, "u3's best is still negative")
  }

  test("risk metrics: hand-computed annualized volatility and sharpe") {
    // returns 0.1, -0.1, 0.1 → avg = 1/30, sd = sqrt(sum((r-avg)^2)/2)
    val bars = Seq(
      (1L, d("2024-01-01"), 100.0), (1L, d("2024-01-02"), 110.0),
      (1L, d("2024-01-03"), 99.0), (1L, d("2024-01-04"), 108.9))
      .toDF("user_id", "date", "close")
    val out = Analytics.riskMetrics(bars, minDays = 2).collect().head
    assert(out.getAs[Long]("n_days") == 3L)
    val rets = Seq(0.1, -0.1, 0.1)
    val avg = rets.sum / 3
    val sd = math.sqrt(rets.map(r => (r - avg) * (r - avg)).sum / 2)
    assert(math.abs(out.getAs[Double]("ann_volatility") - sd * math.sqrt(252)) < 1e-9)
    assert(math.abs(out.getAs[Double]("sharpe") - avg / sd * math.sqrt(252)) < 1e-9)
  }

  test("sessionize splits on >30min gaps and aggregates sessions") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 10:10:00"), 1.0),
      (3L, 1L, ts("2024-01-01 11:00:00"), 1.0), // 50min gap → new session
      (4L, 2L, ts("2024-01-01 09:00:00"), 1.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.sessionize(events).orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 2 && s1.getAs[Double]("duration_sec") == 600.0)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("range join: half-open window, per-user, every pair exactly once") {
    val events = Seq(
      (1L, 1L, "click", ts("2024-01-01 10:00:00")),    // lag = window → in
      (2L, 1L, "click", ts("2024-01-01 10:30:00")),    // straddles the bin edge
      (3L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      (4L, 1L, "click", ts("2024-01-01 11:00:00")),    // lag 0 → out (half-open)
      (5L, 2L, "click", ts("2024-01-01 09:59:59")),    // 1s past window → out
      (6L, 2L, "purchase", ts("2024-01-01 11:00:00")),
      (7L, 3L, "click", ts("2024-01-01 10:45:00")),    // other user → out
      (8L, 4L, "click", ts("2024-01-01 10:10:00")),    // same-bin pair
      (9L, 4L, "purchase", ts("2024-01-01 10:50:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val joined = Analytics.rangeJoin(events, windowSec = 3600L)
    val out = joined.collect()
      .map(r => (r.getAs[Long]("right_id"), r.getAs[Long]("left_id"),
        r.getAs[Long]("lag_us")))
    // exactly once per true pair, despite the ×2 left replication —
    // both the straddling and the same-bin shapes
    assert(out.length == 3)
    assert(out.toSet == Set(
      (3L, 1L, 3600L * 1000000L),
      (3L, 2L, 1800L * 1000000L),
      (9L, 8L, 2400L * 1000000L)))
    // plan contract: an equi join on (user, bin) — never a cartesian /
    // nested-loop fallback, which is what a bare range predicate gets
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"range join fell back:\n$p")
    assert(p.contains("__bin"), s"expected the time-bin equi key:\n$p")
    // window bound (ADVICE r9): wUs must stay exact and overflow-free
    intercept[IllegalArgumentException](
      Analytics.rangeJoin(events, windowSec = 0L))
    intercept[IllegalArgumentException](
      Analytics.rangeJoin(events,
        windowSec = Analytics.MaxRangeWindowSec + 1))
  }

  test("funnel requires strict view→click→purchase ordering") {
    val events = Seq(
      // u1 completes the funnel in order.
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2 clicks BEFORE viewing — click must not count.
      (2L, "click", ts("2024-01-01 09:00:00")), (2L, "view", ts("2024-01-01 10:00:00")),
      // u3 views only.
      (3L, "view", ts("2024-01-01 08:00:00"))
    ).map { case (u, t, time) => (u, t, time, 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val out = Analytics.eventFunnel(events).orderBy("user_id").collect()
    assert(out.map(_.getAs[Int]("stage")).toSeq == Seq(3, 1, 1))
  }

  test("zscore flags the outlier") {
    val events = (1 to 10).map(i => (i.toLong, 1L, ts(f"2024-01-01 10:$i%02d:00"), 10.0)) :+
      (11L, 1L, ts("2024-01-01 11:00:00"), 1000.0)
    val out = Analytics.anomalyZscore(events.toDF("event_id", "user_id", "ts", "value"),
      threshold = 2.5).collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 1000.0)
  }

  test("correlation: identical series → 1, inverted → −1") {
    val bars = (1 to 10).flatMap { i =>
      val v = 10.0 + i + (i % 3) // non-monotone so returns vary
      Seq((1L, d(f"2024-01-$i%02d"), v, 100L), (2L, d(f"2024-01-$i%02d"), v, 90L),
        (3L, d(f"2024-01-$i%02d"), 100.0 / v, 80L))
    }.toDF("user_id", "date", "close", "volume")
    val out = Analytics.correlationPairs(bars, topK = 3, minDays = 5).collect()
      .map(r => (r.getAs[Long]("u1"), r.getAs[Long]("u2")) -> r.getAs[Double]("correlation"))
      .toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-9)
    assert(out((1L, 3L)) < 0, "reciprocal series must anti-correlate")
  }

  test("asof join picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 101.0),
      (2L, ts("2024-01-01 10:00:00"), 200.0)
    ).toDF("user_id", "ts", "price")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), 99.0),
      (1L, ts("2024-01-01 11:59:00"), 100.5),
      (1L, ts("2024-01-01 12:00:00"), 100.7), // equal ts → inclusive match
      (2L, ts("2024-01-01 11:00:00"), 999.0)  // after the trade → no match
    ).toDF("user_id", "ts", "quote")
    val out = Analytics.asofJoin(trades, quotes, "user_id", "ts", Seq("quote"))
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Row]("__match").getAs[Double]("quote") == 99.0)
    assert(out(1).getAs[Row]("__match").getAs[Double]("quote") == 100.7)
    assert(out(2).getAs[Row]("__match") == null, "no quote at or before the trade")
  }

  test("DCF fair value: PV of the quarterly series at 10%") {
    val orders = Seq(
      (1L, d("2024-01-15"), 50.0), (1L, d("2024-02-15"), 50.0), // Q1: 100
      (1L, d("2024-04-15"), 110.0)                              // Q2: 110
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Fundamentals.fairValueDcf(orders).collect().head
    val fv = 100.0 / 1.1 + 110.0 / (1.1 * 1.1)
    assert(math.abs(out.getAs[Double]("fair_value") - fv) < 1e-9)
    assert(out.getAs[Double]("price") == 110.0)
    assert(math.abs(out.getAs[Double]("delta") - (fv - 110.0) / 110.0) < 1e-9)
  }

  test("red flags: strict 3-quarter decline and negative-growth streak") {
    val declining = Seq( // 4 quarters strictly declining
      (1L, d("2024-01-15"), 100.0), (1L, d("2024-04-15"), 90.0),
      (1L, d("2024-07-15"), 80.0), (1L, d("2024-10-15"), 70.0),
      // customer 2 grows — no flags
      (2L, d("2024-01-15"), 50.0), (2L, d("2024-04-15"), 60.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, 100.0), (2L, 200.0)).toDF("c_custkey", "c_acctbal")
    val out = Fundamentals.redFlags(customer, declining).collect()
    assert(out.length == 1 && out.head.getAs[Long]("custkey") == 1L)
    assert(out.head.getAs[Int]("flag_revenue_decline") == 1)
    assert(out.head.getAs[Int]("flag_negative_growth") == 1)
    assert(out.head.getAs[Int]("flag_negative_balance") == 0)
  }

  test("financial ratios: hand-computed quarter table and faithful scoring") {
    val customer = Seq((1L, "AUTO", 50.0)).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val orders = Seq(
      (10L, 1L, d("2024-01-15"), "F"),
      (11L, 1L, d("2024-04-15"), "O")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")
    val lineitem = Seq(
      (10L, 100.0, 0.1), // Q1: gross 100, earnings 90
      (11L, 200.0, 0.0)  // Q2: gross 200, earnings 200, open → debt 200
    ).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val out = Fundamentals.financialRatios(customer, orders, lineitem)
      .orderBy("quarter").collect()
    assert(out.length == 2)
    val q1 = out(0)
    assert(q1.getAs[Double]("gross") == 100.0 && q1.getAs[Double]("earnings") == 90.0)
    assert(q1.getAs[Double]("debt") == 0.0)
    assert(math.abs(q1.getAs[Double]("pe") - 100.0 / 90.0) < 1e-12)
    assert(q1.getAs[Double]("roe") == 90.0 / 50.0)
    assert(q1.getAs[Double]("current_ratio") == 0.5) // 50 / (100/1)
    assert(math.abs(q1.getAs[Double]("gross_margin") - 0.9) < 1e-12)
    assert(q1.isNullAt(q1.fieldIndex("revenue_growth")))
    val q2 = out(1)
    assert(q2.getAs[Double]("debt_to_equity") == 4.0) // 200 / 50
    assert(math.abs(q2.getAs[Double]("revenue_growth") - (200.0 / 90.0 - 1)) < 1e-12)
    // Scoring reads the latest quarter: growth 122% passes, the four
    // other checks fail (sector avgs equal own values; d/e = 4; cr 0.25).
    val score = Fundamentals.scoreFromRatios(
      Fundamentals.financialRatios(customer, orders, lineitem)).collect().head
    assert(score.getAs[Int]("f_growth") == 1 && score.getAs[Int]("score") == 1)
    assert(score.getAs[String]("recommendation") == "hold")
  }
}
