package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cleaning, Indicators}
import graft.sources.Tables

class CleaningFinancialSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("financial value parsing: percent, Vietnamese units, garbage") {
    // Commas are thousands separators (stripped before the cast), as in
    // the reference's `cleaned.replace(',', '')`.
    val df = Seq(
      ("12.5%", "1.5 tỷ", "300 triệu", "1,250", "n/a x"),
      ("-3%", "2 tỷ", "1.2 tr", "-7.5", "")
    ).toDF("Pct Col", "Big-Unit", "Mid Unit", "Plain", "Junk")
    val out = Cleaning.cleanFinancial(df).collect()
    val r = out.head
    assert(r.getAs[Double]("pct_col") == 0.125)
    assert(r.getAs[Double]("big_unit") == 1.5e9)
    assert(r.getAs[Double]("mid_unit") == 3e8)
    assert(r.getAs[Double]("plain") == 1250.0)
    assert(r.isNullAt(r.fieldIndex("junk")))
    val r2 = out(1)
    assert(r2.getAs[Double]("pct_col") == -0.03)
    assert(r2.getAs[Double]("mid_unit") == 1.2e6)
    assert(r2.getAs[Double]("plain") == -7.5)
  }

  test("cleanFinancial sorts newest year first and drops all-null rows") {
    val df = Seq(("2022", "10"), ("2024", "x"), ("2023", "30"))
      .toDF("Year", "Revenue")
    val out = Cleaning.cleanFinancial(df).collect()
    assert(out.map(_.getAs[Double]("year")).toSeq == Seq(2024.0, 2023.0, 2022.0))
    assert(out.head.isNullAt(out.head.fieldIndex("revenue")))
  }

  test("enrichAll stacks every indicator family in one pipeline") {
    val bars = operators.Bars.daily(
      Cleaning.cleanEvents(Tables.events(spark, "/root/testdata/sf0.001")))
    val enriched = Indicators.enrichAll(bars,
      smaPeriods = Seq(5), emaSpans = Seq(5), rsiPeriod = 5,
      macd = (5, 10, 4), bollinger = (5, 2.0), atrPeriod = 5,
      momentumHorizons = Seq(5))
    val cols = enriched.columns.toSet
    val expected = Set("ma_5", "dist_ma_5", "ema_5", "rsi", "rsi_signal",
      "macd", "macd_signal", "macd_hist", "bb_middle", "bb_upper", "bb_lower",
      "bb_width", "bb_position", "atr", "close_std", "volatility_ratio",
      "vol_sma_10", "vol_sma_20", "volume_ratio", "obv", "volume_price_trend",
      "daily_return_pct", "daily_return_abs", "cumulative_return",
      "momentum_5", "momentum_mtd")
    assert(expected.subsetOf(cols), s"missing: ${expected -- cols}")
    val n = enriched.count()
    assert(n == bars.count(), "enrichment must preserve bar grain")
  }
}
