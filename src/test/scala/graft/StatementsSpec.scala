package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cleaning, Statements}

class StatementsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  // One customer, two quarters; Q1 has one fulfilled order with two
  // items, Q2 one open order with one item.
  private def ordersDf = Seq(
    (100L, 1L, "F", 300.0, ts("2024-01-15 00:00:00")),
    (101L, 1L, "O", 200.0, ts("2024-04-10 00:00:00"))
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")

  private def lineitemDf = Seq(
    (100L, 100.0, 0.10, 0.05), // net 90, tax 4.5
    (100L, 200.0, 0.00, 0.10), // net 200, tax 20
    (101L, 200.0, 0.50, 0.00)  // net 100, tax 0
  ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")

  private def customerDf = Seq((1L, 50.0)).toDF("c_custkey", "c_acctbal")

  test("income statement aggregates gross/net/tax per quarter") {
    val out = Statements.incomeStatement(ordersDf, lineitemDf)
      .orderBy("period").collect()
    assert(out.length == 2)
    val q1 = out(0)
    assert(q1.getAs[Double]("gross_revenue") == 300.0)
    assert(math.abs(q1.getAs[Double]("discounts") - 10.0) < 1e-9)
    assert(math.abs(q1.getAs[Double]("net_revenue") - 290.0) < 1e-9)
    assert(math.abs(q1.getAs[Double]("tax_expense") - 24.5) < 1e-9)
    assert(math.abs(q1.getAs[Double]("net_income") - 265.5) < 1e-9)
    assert(q1.getAs[Long]("n_items") == 2L)
    val q2 = out(1)
    assert(math.abs(q2.getAs[Double]("net_revenue") - 100.0) < 1e-9)
  }

  test("balance sheet accumulates retained position and balances equity") {
    val out = Statements.balanceSheet(customerDf, ordersDf)
      .orderBy("period").collect()
    val q1 = out(0)
    assert(q1.getAs[Double]("receivables") == 0.0)
    assert(q1.getAs[Double]("retained") == 300.0)
    assert(q1.getAs[Double]("total_assets") == 350.0) // cash 50 + retained 300
    assert(q1.getAs[Double]("equity") == 350.0)
    val q2 = out(1)
    assert(q2.getAs[Double]("receivables") == 200.0)
    assert(q2.getAs[Double]("retained") == 300.0) // nothing fulfilled in Q2
    assert(q2.getAs[Double]("total_assets") == 550.0)
    assert(q2.getAs[Double]("liabilities") == 200.0)
    assert(q2.getAs[Double]("equity") == 350.0)
  }

  test("cash flow nets inflow/outflow and accumulates; latestOnly keeps newest period") {
    val all = Statements.cashFlow(ordersDf).orderBy("period").collect()
    assert(all.map(_.getAs[Double]("net_cash_flow")).toSeq == Seq(300.0, -200.0))
    assert(all.map(_.getAs[Double]("cumulative_cash")).toSeq == Seq(300.0, 100.0))
    val latest = Statements.cashFlow(ordersDf, latestOnly = true).collect()
    assert(latest.length == 1)
    assert(latest.head.getAs[Timestamp]("period") == ts("2024-04-01 00:00:00"))
  }

  test("annual period buckets both quarters into one year") {
    val out = Statements.incomeStatement(ordersDf, lineitemDf, period = "annual").collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Double]("net_revenue") - 390.0) < 1e-9)
  }

  test("financialReport dispatches aliases and falls back to income") {
    val bs = Statements.financialReport(customerDf, ordersDf, lineitemDf, "bs")
    assert(bs.columns.contains("equity"))
    val cf = Statements.financialReport(customerDf, ordersDf, lineitemDf, "cashflow")
    assert(cf.columns.contains("net_cash_flow"))
    val fallback = Statements.financialReport(customerDf, ordersDf, lineitemDf, "bogus")
    assert(fallback.columns.contains("net_income"))
  }

  test("corporate events parse dates, rank newest-first per entity") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00"), 7L, "dividend", 1.5, ""),
      (2L, ts("2024-05-01 10:00:00"), 7L, "agm", 0.0, ""),
      (3L, ts("2024-01-01 10:00:00"), 8L, "split", 2.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Statements.corporateEvents(events).orderBy("entity_id", "rk").collect()
    assert(out.map(_.getAs[Date]("date")).toSeq ==
      Seq(d("2024-05-01"), d("2024-03-01"), d("2024-01-01")))
    assert(out.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 1))
    assert(out(0).getAs[String]("event_type") == "agm")
  }

  test("cleanEvents positivity: null mode nulls non-positive, error mode throws") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 5.0),
      (2L, 1L, ts("2024-01-01 10:01:00"), -3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val kept = Cleaning.cleanEvents(events).orderBy("event_id").collect()
    assert(kept.map(_.getAs[Double]("value")).toSeq == Seq(5.0, -3.0))
    val nulled = Cleaning.cleanEvents(events, positivity = "null")
      .orderBy("event_id").collect()
    assert(nulled(0).getAs[Double]("value") == 5.0 && nulled(1).isNullAt(
      nulled(1).fieldIndex("value")))
    val ex = intercept[Exception] {
      Cleaning.cleanEvents(events, positivity = "error").collect()
    }
    assert(ex.getMessage.contains("non-positive") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-positive")))
  }
}
