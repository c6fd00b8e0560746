package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Breadth, Screener}

class BreadthScreenerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  /** u1: 10, 12, 11, (gap), 13 — u2: 5, 5, 6. */
  private def fixtureBars: DataFrame = Seq(
    (1L, d("2024-01-01"), 10.0), (1L, d("2024-01-02"), 12.0),
    (1L, d("2024-01-03"), 11.0), (1L, d("2024-01-05"), 13.0),
    (2L, d("2024-01-01"), 5.0), (2L, d("2024-01-02"), 5.0),
    (2L, d("2024-01-03"), 6.0)
  ).toDF("user_id", "date", "close")

  test("breadth_daily: adv/dec/unchanged counts, calendar gap fill, ratios") {
    val rows = Breadth.breadthDaily(fixtureBars).orderBy("date").collect()
    assert(rows.length == 5, "calendar spine must include the gap day")
    val byDate = rows.map(r => r.getAs[Date]("date").toString -> r).toMap
    val d1 = byDate("2024-01-01")
    assert(d1.getAs[Long]("advancers") == 0 && d1.getAs[Long]("total_issues") == 0)
    assert(d1.isNullAt(d1.fieldIndex("breadth_percent")), "0-total day → null percent")
    assert(d1.getAs[Double]("adv_dec_ratio") == 0.0)
    val d2 = byDate("2024-01-02") // u1 up, u2 flat
    assert(d2.getAs[Long]("advancers") == 1 && d2.getAs[Long]("unchanged") == 1)
    assert(d2.getAs[Double]("breadth_percent") == 50.0)
    val d3 = byDate("2024-01-03") // u1 down, u2 up
    assert(d3.getAs[Long]("advancers") == 1 && d3.getAs[Long]("decliners") == 1)
    assert(d3.getAs[Double]("breadth_percent") == 0.0)
    assert(d3.getAs[Double]("adv_dec_ratio") == 1.0)
    val d4 = byDate("2024-01-04") // gap: zero-filled
    assert(d4.getAs[Long]("total_issues") == 0)
  }

  test("market regime bands") {
    val breadth = Seq(
      (d("2024-01-01"), 75.0), (d("2024-01-02"), 55.0), (d("2024-01-03"), 45.0),
      (d("2024-01-04"), 25.0), (d("2024-01-05"), -10.0)
    ).toDF("date", "breadth_percent")
    val out = Breadth.marketRegime(breadth).orderBy("date").collect()
      .map(_.getAs[String]("regime")).toSeq
    assert(out == Seq("strong bullish", "bullish", "neutral", "bearish", "strong bearish"))
  }

  test("foreign flows: per-day buy/sell values, counts, and net") {
    val events = Seq(
      (1L, d("2024-01-01"), "purchase", 10.0),
      (2L, d("2024-01-01"), "purchase", 20.0),
      (3L, d("2024-01-01"), "view", 5.0),
      (4L, d("2024-01-01"), "click", 99.0), // other types excluded
      (5L, d("2024-01-02"), "view", 7.0)
    ).toDF("event_id", "date", "event_type", "value")
    val out = Breadth.foreignFlows(events).orderBy("date").collect()
    assert(out.length == 2)
    val day1 = out(0)
    assert(day1.getAs[Double]("value_buy") == 30.0)
    assert(day1.getAs[Double]("value_sell") == 5.0)
    assert(day1.getAs[Double]("net_value") == 25.0)
    assert(day1.getAs[Long]("volume_buy") == 2 && day1.getAs[Long]("volume_sell") == 1)
    assert(day1.getAs[Long]("volume") == 3)
    val day2 = out(1)
    assert(day2.getAs[Double]("value_buy") == 0.0 && day2.getAs[Double]("net_value") == -7.0)
  }

  test("top movers ranks last-day returns both ways") {
    val out = Breadth.topMovers(fixtureBars, k = 1).collect()
    val gain = out.find(_.getAs[String]("side") == "gainer").get
    val lose = out.find(_.getAs[String]("side") == "loser").get
    // Last-day returns: u1 13/11−1 ≈ +18.2% (from 01-03 to 01-05), u2 6/5−1 = +20%.
    assert(gain.getAs[Long]("user_id") == 2L)
    assert(lose.getAs[Long]("user_id") == 1L)
    assert(math.abs(gain.getAs[Double]("return_pct") - 20.0) < 1e-9)
  }

  test("breakout: MA cross with volume spike, scanning all bars") {
    val bars = Seq(
      (1L, d("2024-01-01"), 10.0, 10L),
      (1L, d("2024-01-02"), 9.0, 10L),
      (1L, d("2024-01-03"), 12.0, 40L)
    ).toDF("user_id", "date", "close", "volume")
    val out = Screener.breakouts(bars, maPeriod = 2, volPeriod = 2, volMultiplier = 1.5)
      .collect()
    assert(out.length == 1)
    val b = out.head
    assert(b.getAs[Date]("date") == d("2024-01-03"))
    assert(b.getAs[Double]("ma") == 10.5)       // (9+12)/2
    assert(b.getAs[Double]("vol_sma") == 25.0)  // (10+40)/2
    assert(math.abs(b.getAs[Double]("vol_mult") - 1.6) < 1e-12)
  }

  test("trend check classifies an uptrend with higher highs") {
    val closes = Seq(10.0, 10.5, 11.2, 12.0, 13.0)
    val bars = closes.zipWithIndex.map { case (c, i) =>
      (1L, d(f"2024-01-${i + 1}%02d"), c, c + 0.5, c - 0.5)
    }.toDF("user_id", "date", "close", "high", "low")
    val t = Screener.trendCheck(bars, maFast = 2, maSlow = 3).collect().head
    assert(t.getAs[String]("trend_type") == "uptrend")
    assert(t.getAs[Int]("higher_highs") == 1)
    assert(t.getAs[Int]("lower_lows") == 0)
    // slopes: ma2 12.5−11.6 = 0.9, ma3 12.07−11.23 = 0.83 → strength 1.73 → conf 1.0
    assert(t.getAs[Double]("confidence") == 1.0)
  }

  test("divergence flags opposing price/indicator trends, never the last bar") {
    val rows = (1 to 5).map(i =>
      (1L, d(f"2024-01-$i%02d"), i.toDouble, 80.0 - 10 * i))
    val df = rows.toDF("user_id", "date", "close", "rsi")
    val out = Screener.divergence(df, lookback = 3).orderBy("date").collect()
    assert(out.length == 2, "rn in [lookback, n) → rows 3 and 4 only")
    assert(out.forall(_.getAs[String]("div_type") == "regular"))
    assert(out.map(_.getAs[Date]("date")).toSeq == Seq(d("2024-01-03"), d("2024-01-04")))
  }

  test("signal score composites RSI + MA cross + MACD cross + volume") {
    val df = Seq(
      (1L, d("2024-01-01"), 9.0, 10L, 50.0, 9.5, -1.0, 0.5),
      (1L, d("2024-01-02"), 11.0, 40L, 25.0, 10.0, 1.0, 0.6)
    ).toDF("user_id", "date", "close", "volume", "rsi", "ma_10", "macd", "macd_signal")
    val s = Screener.signalScore(df, volPeriod = 2).collect().head
    assert(s.getAs[Int]("rsi_pts") == 2)   // rsi 25 < 30
    assert(s.getAs[Int]("ma_pts") == 2)    // 9 <= 9.5 < 11
    assert(s.getAs[Int]("macd_pts") == 2)  // -1 <= 0.5 < 1
    assert(s.getAs[Int]("vol_pts") == 1)   // 40 > avg(10,40)=25
    assert(s.getAs[Int]("score") == 7)
    assert(s.getAs[String]("overall_signal") == "buy")
    assert(s.getAs[Double]("confidence") == 1.0)
  }

  test("support/resistance: last-3 distinct channel levels, null-padded") {
    val bars = Seq(
      (1L, d("2024-01-01"), 11.0, 9.0), (1L, d("2024-01-02"), 12.0, 8.0),
      (1L, d("2024-01-03"), 12.0, 8.0), (1L, d("2024-01-04"), 13.0, 7.0)
    ).toDF("user_id", "date", "high", "low")
    val r = Screener.supportResistance(bars, window = 2).collect().head
    // Rolling-2 highs: 12, 12, 13 → distinct desc 13, 12, null-padded.
    assert(r.getAs[Double]("res_1") == 13.0 && r.getAs[Double]("res_2") == 12.0)
    assert(r.isNullAt(r.fieldIndex("res_3")))
    assert(r.getAs[Double]("latest_high") == 13.0 && r.getAs[Double]("latest_low") == 7.0)
  }
}
