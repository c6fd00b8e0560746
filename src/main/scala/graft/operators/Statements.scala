package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Financial-statement frames — Spark re-expression of the reference's
  * statement surface (/root/reference/src/extractors/
  * fundamental_extractor.py:190 `get_income_statement`, :218
  * `get_balance_sheet`, :246 `get_cash_flow`, :133
  * `get_financial_report` dispatch) on the TPC-H mapping. The reference
  * fetches per-symbol statements from an API and normalizes them
  * (snake_case, numeric coercion, period sort desc — data_cleaner.py:59
  * `clean_financial`); here the statements are DERIVED from the order
  * book, so extraction and normalization collapse into one aggregation
  * per statement.
  *
  * Proxy mapping (consistent with [[Fundamentals.financialRatios]]):
  * gross revenue = Σ l_extendedprice, discounts carve net revenue, l_tax
  * carves net income, open-order ('O') commitments play
  * receivables/liabilities, fulfilled ('F') orders play operating cash,
  * c_acctbal plays cash on hand.
  *
  * Scale shape: each statement is ONE fact-scale shuffle (the
  * (custkey, period) rollup) followed by per-key windows over the small
  * period series; the customer dim joins broadcast. `period` is the
  * reference's quarterly/annual parameter; `latestOnly` its
  * `get_all=False`.
  */
object Statements {

  /** quarterly/annual period bucket (the reference's `period` param;
    * anything else falls back to quarterly, mirroring
    * `_fetch_financial_statement`'s normalization).
    */
  private def periodOf(period: String, dateCol: Column): Column =
    date_trunc(if (period.trim.toLowerCase == "annual") "year" else "quarter",
      dateCol)

  private val byCustPeriodDesc =
    Window.partitionBy(col("custkey")).orderBy(col("period").desc)
  private val byCustPeriodCum = Window.partitionBy(col("custkey"))
    .orderBy(col("period"))
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Newest-first sort + optional latest-period cut — `clean_financial`'s
    * descending period sort and the extractor's `get_all=False` branch.
    */
  private def finish(df: DataFrame, latestOnly: Boolean): DataFrame = {
    val ranked = df.withColumn("__rn", row_number().over(byCustPeriodDesc))
    (if (latestOnly) ranked.filter(col("__rn") === 1) else ranked)
      .drop("__rn")
  }

  /** Income statement per (entity, period): gross revenue, discounts,
    * net revenue, tax expense, net income, item count. Line-item grain
    * in, statement grain out — one shuffle.
    */
  def incomeStatement(orders: DataFrame, lineitem: DataFrame,
                      period: String = "quarterly",
                      latestOnly: Boolean = false): DataFrame = {
    val df = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"),
        periodOf(period, col("o_orderdate")).as("period"))
      .agg(
        sum(col("l_extendedprice")).as("gross_revenue"),
        sum(col("l_extendedprice") * col("l_discount")).as("discounts"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_revenue"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * col("l_tax"))
          .as("tax_expense"),
        count(lit(1)).as("n_items"))
      .withColumn("net_income", col("net_revenue") - col("tax_expense"))
    finish(df, latestOnly)
  }

  /** Balance sheet per (entity, period): cash (account balance),
    * receivables (open-order commitments of the period), retained
    * position (cumulative fulfilled revenue through the period), total
    * assets, liabilities, equity. The cumulative column runs over
    * PERIOD-grain rows (bounded series per key), not the fact table.
    */
  def balanceSheet(customer: DataFrame, orders: DataFrame,
                   period: String = "quarterly",
                   latestOnly: Boolean = false): DataFrame = {
    val perPeriod = orders
      .groupBy(col("o_custkey").as("custkey"),
        periodOf(period, col("o_orderdate")).as("period"))
      .agg(
        sum(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("__recv"),
        sum(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("__fulf"))
      .withColumn("receivables", coalesce(col("__recv"), lit(0.0)))
      .withColumn("retained",
        sum(coalesce(col("__fulf"), lit(0.0))).over(byCustPeriodCum))
      .drop("__recv", "__fulf")
    val df = perPeriod
      .join(customer.select(col("c_custkey").as("custkey"),
        col("c_acctbal").as("cash")), Seq("custkey"))
      .withColumn("total_assets",
        col("cash") + col("receivables") + col("retained"))
      .withColumn("liabilities", col("receivables"))
      .withColumn("equity", col("total_assets") - col("liabilities"))
    finish(df, latestOnly)
  }

  /** Cash-flow statement per (entity, period): operating inflow
    * (fulfilled orders), committed outflow (open orders), net flow, and
    * the cumulative cash position across periods.
    */
  def cashFlow(orders: DataFrame, period: String = "quarterly",
               latestOnly: Boolean = false): DataFrame = {
    val df = orders
      .groupBy(col("o_custkey").as("custkey"),
        periodOf(period, col("o_orderdate")).as("period"))
      .agg(
        sum(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("__in"),
        sum(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("__out"),
        count(lit(1)).as("n_orders"))
      .withColumn("operating_inflow", coalesce(col("__in"), lit(0.0)))
      .withColumn("committed_outflow", coalesce(col("__out"), lit(0.0)))
      .withColumn("net_cash_flow",
        col("operating_inflow") - col("committed_outflow"))
      .withColumn("cumulative_cash",
        sum(col("operating_inflow") - col("committed_outflow"))
          .over(byCustPeriodCum))
      .drop("__in", "__out")
    finish(df, latestOnly)
  }

  /** `get_financial_report` dispatch (fundamental_extractor.py:133):
    * statement-type aliases route to the three frames; anything
    * unrecognized falls back to the income statement, mirroring the
    * reference's warning-then-fallback branch.
    */
  def financialReport(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, reportType: String = "income_statement",
                      period: String = "quarterly",
                      latestOnly: Boolean = false,
                      notify: graft.Pipeline.Notifier = graft.Pipeline.Notify.log): DataFrame =
    reportType.trim.toLowerCase match {
      case "balance" | "balance_sheet" | "bs" =>
        balanceSheet(customer, orders, period, latestOnly)
      case "cash_flow" | "cashflow" | "cf" =>
        cashFlow(orders, period, latestOnly)
      case "income" | "income_statement" | "is" =>
        incomeStatement(orders, lineitem, period, latestOnly)
      case other =>
        // The reference logs a warning before this fallback — a typo'd
        // reportType must not silently ship the wrong statement.
        notify("warning",
          s"financialReport: unrecognized reportType '$other' — falling back to income_statement")
        incomeStatement(orders, lineitem, period, latestOnly)
    }

  /** Corporate events (fundamental_extractor.py:345 `get_events`): the
    * per-entity event calendar — date-parsed, typed, newest first. The
    * reference returns the raw per-symbol frame with `date` coerced and
    * unparseable dates kept as NaT; an engine frame drops them (they
    * sort nowhere) and ranks per entity so "recent events per entity"
    * is one distributed pass, not a per-symbol loop.
    */
  def corporateEvents(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .select(col("user_id").as("entity_id"),
        to_date(col("ts")).as("date"),
        col("event_type"), col("value"), col("event_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("entity_id"))
          .orderBy(col("date").desc, col("event_id"))))
}
