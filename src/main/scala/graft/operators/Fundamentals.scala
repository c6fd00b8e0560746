package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fundamental analysis — Spark re-expression of the reference's
  * `FundamentalAnalyzer` (/root/reference/src/analyzers/fundamental_analyzer.py)
  * on the TPC-H mapping: customers play companies, per-quarter order
  * revenue plays the financial-statement series, c_mktsegment plays the
  * sector, c_acctbal plays the balance-sheet position.
  *
  * Scale shape: the quarterly series is one groupBy on (custkey,
  * quarter); per-customer metrics are windows over that small series;
  * sector statistics are a per-segment aggregate broadcast back onto
  * customers. The only fact-scale shuffle is the initial revenue rollup.
  */
object Fundamentals {

  private val byCustQ = Window.partitionBy(col("custkey")).orderBy(col("quarter"))
  private val byCustQDesc = Window.partitionBy(col("custkey")).orderBy(col("quarter").desc)

  /** #32 fund_quarterly_revenue: per-customer quarterly revenue from the
    * order book (lineitem net revenue), with quarter-over-quarter growth
    * (fundamental_extractor's period series + clean_financial's
    * period sort, re-expressed as one aggregation + one window).
    */
  def quarterlyRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val qrev = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("quarter", col("o_orderdate")).as("quarter"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
    qrev.withColumn("growth",
      col("revenue") / nullif(lag(col("revenue"), 1).over(byCustQ), lit(0.0)) - 1)
  }

  /** Orders-grain quarterly revenue (o_totalprice) — the statement series
    * for scoring/red-flag/DCF operators.
    */
  def quarterlySeries(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey").as("custkey"),
      date_trunc("quarter", col("o_orderdate")).as("quarter"))
      .agg(sum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  /** Per-customer rollup + segment membership (the "company profile"). */
  def customerProfile(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey").as("custkey"), col("c_name"),
        col("c_mktsegment"), col("c_acctbal"))
      .agg(sum(col("o_totalprice")).as("total_rev"),
        avg(col("o_totalprice")).as("avg_order"),
        count(lit(1)).as("n_orders"))

  /** company_overview (fundamental_extractor.py:319 get_company_overview
    * — name / industry / exchange / cap fields, `_normalize_dict`): the
    * per-entity profile row. Segment plays the industry role, nation the
    * exchange role, lifetime order aggregates the cap proxies. Left join
    * keeps order-less entities (the reference returns an overview even
    * when other endpoints are empty); the nation dim broadcasts.
    */
  def companyOverview(customer: DataFrame, orders: DataFrame,
                      nation: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("industry"), col("c_nationkey"),
        col("c_acctbal").as("acctbal"))
      .agg(
        sum(col("o_totalprice")).as("total_rev"),
        count(col("o_orderkey")).as("n_orders"),
        max(col("o_orderdate")).as("last_order"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("exchange"))), Seq("c_nationkey"))
      .select(col("custkey"), col("name"), col("industry"), col("exchange"),
        col("acctbal"), col("total_rev"), col("n_orders"), col("last_order"))

  /** dividend_history (fundamental_extractor.py:328 get_dividends —
    * ex_date parse, numeric coerce, sort desc, head(limit)): last
    * `limit` payout events per entity, newest first. Per-key recent-N
    * via window rank — key-parallel, never a global sort; the
    * reference's per-symbol head(10) loop becomes one distributed pass.
    */
  def dividendHistory(orders: DataFrame, limit: Int = 10): DataFrame =
    orders
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey"))))
      .filter(col("rk") <= limit)
      .select(col("o_custkey").as("custkey"), col("rk"),
        col("o_orderdate").as("ex_date"), col("o_totalprice").as("dividend"))

  /** #33 fund_score (fundamental_analyzer.py:46 score_fundamentals):
    * five binary checks — latest-quarter growth > 10%, positive balance,
    * above-segment average order value, above-segment total revenue,
    * order-count stability — summed into a score with a buy/hold
    * recommendation at ≥4.
    */
  def score(customer: DataFrame, orders: DataFrame): DataFrame = {
    val series = quarterlySeries(orders)
      .withColumn("growth",
        col("revenue") / nullif(lag(col("revenue"), 1).over(byCustQ), lit(0.0)) - 1)
      .withColumn("__rn", row_number().over(byCustQDesc))
    val lastGrowth = series.filter(col("__rn") === 1)
      .select(col("custkey"), col("growth").as("last_growth"))
    // Company-grain, referenced by the segment rollup AND the final join
    // — persist cuts the second orders-scan derivation (see
    // fairValueRelative's note).
    val profile = customerProfile(customer, orders)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segAvg = profile.groupBy(col("c_mktsegment")).agg(
      avg(col("total_rev")).as("seg_rev"),
      avg(col("avg_order")).as("seg_avg_order"))
    profile
      .join(broadcast(segAvg), Seq("c_mktsegment"))
      .join(lastGrowth, Seq("custkey"), "left")
      .withColumn("f_growth", (col("last_growth") > 0.1).cast("int"))
      .withColumn("f_balance", (col("c_acctbal") > 0).cast("int"))
      .withColumn("f_avg_order", (col("avg_order") > col("seg_avg_order")).cast("int"))
      .withColumn("f_scale", (col("total_rev") > col("seg_rev")).cast("int"))
      .withColumn("f_activity", (col("n_orders") >= 5).cast("int"))
      .select(col("custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("f_growth"), lit(0)).as("f_growth"),
        col("f_balance"), col("f_avg_order"), col("f_scale"), col("f_activity"))
      .withColumn("score",
        col("f_growth") + col("f_balance") + col("f_avg_order") +
          col("f_scale") + col("f_activity"))
      .withColumn("recommendation",
        when(col("score") >= 4, "buy").otherwise("hold"))
  }

  /** #34 fund_red_flags (fundamental_analyzer.py:77 check_red_flags):
    * strict revenue decline over the last 3 quarters, negative balance,
    * and ≥3 negative-growth quarters among the last 5. Customers with at
    * least one flag.
    */
  def redFlags(customer: DataFrame, orders: DataFrame): DataFrame = {
    val series = quarterlySeries(orders)
      .withColumn("growth",
        col("revenue") / nullif(lag(col("revenue"), 1).over(byCustQ), lit(0.0)) - 1)
      .withColumn("__rn", row_number().over(byCustQDesc))
    val recent = series.filter(col("__rn") <= 5)
      .groupBy(col("custkey"))
      .agg(
        max(when(col("__rn") === 1, col("revenue"))).as("r1"),
        max(when(col("__rn") === 2, col("revenue"))).as("r2"),
        max(when(col("__rn") === 3, col("revenue"))).as("r3"),
        count(when(col("growth") < 0, 1)).as("neg_quarters"))
    customer
      .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      .join(recent, Seq("custkey"))
      // coalesce: under-3-quarter customers yield a null comparison in
      // Spark where SQL CASE yields 0 — normalize to 0 on both sides.
      .withColumn("flag_revenue_decline",
        coalesce((col("r1") < col("r2") && col("r2") < col("r3")).cast("int"), lit(0)))
      .withColumn("flag_negative_balance", (col("c_acctbal") < 0).cast("int"))
      .withColumn("flag_negative_growth", (col("neg_quarters") >= 3).cast("int"))
      .withColumn("n_flags",
        col("flag_revenue_decline") +
          col("flag_negative_balance") + col("flag_negative_growth"))
      .filter(col("n_flags") > 0)
      .select(col("custkey"), col("flag_revenue_decline"),
        col("flag_negative_balance"), col("flag_negative_growth"), col("n_flags"))
  }

  /** #35 fund_sector_compare (fundamental_analyzer.py:90
    * compare_with_sector): customer metrics vs segment median, relative
    * position in percent.
    */
  def sectorCompare(customer: DataFrame, orders: DataFrame): DataFrame = {
    val profile = customerProfile(customer, orders)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segMed = profile.groupBy(col("c_mktsegment")).agg(
      expr("percentile(total_rev, 0.5)").as("med_rev"),
      expr("percentile(avg_order, 0.5)").as("med_avg_order"))
    profile.join(broadcast(segMed), Seq("c_mktsegment"))
      .withColumn("rel_rev",
        (col("total_rev") - col("med_rev")) / nullif(col("med_rev"), lit(0.0)) * 100)
      .withColumn("rel_avg_order",
        (col("avg_order") - col("med_avg_order")) / nullif(col("med_avg_order"), lit(0.0)) * 100)
      .select(col("custkey"), col("c_mktsegment"), col("total_rev"),
        col("n_orders"), col("rel_rev"), col("avg_order"), col("rel_avg_order"))
  }

  /** Relative fair value (fundamental_analyzer.py:33, the
    * 'pe_relative' branch of calculate_fair_value): multiple = price /
    * earnings-proxy, fair value = price scaled by the segment-average
    * multiple ratio, delta vs price. On the TPC-H mapping price = latest
    * quarter revenue and the earnings proxy = average quarterly revenue.
    */
  def fairValueRelative(customer: DataFrame, orders: DataFrame): DataFrame = {
    val series = quarterlySeries(orders)
      .withColumn("__rd", row_number().over(byCustQDesc))
    val perCust = series.groupBy(col("custkey")).agg(
      max(when(col("__rd") === 1, col("revenue"))).as("price"),
      avg(col("revenue")).as("earnings_proxy"))
    // Persisted: referenced by BOTH the segment-average branch and the
    // final probe side — without the cut the whole orders scan + quarter
    // rollup + window subplan is planned (and executed) twice; Spark's
    // exchange reuse does not collapse it (verified via explain). The
    // frame is company-grain (one row per customer with orders) —
    // bounded at any corpus scale.
    val withSeg = customer
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      .join(perCust, Seq("custkey"))
      .withColumn("pe", col("price") / nullif(col("earnings_proxy"), lit(0.0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segAvg = withSeg.groupBy(col("c_mktsegment"))
      .agg(avg(col("pe")).as("sector_pe"))
    withSeg.join(broadcast(segAvg), Seq("c_mktsegment"))
      .withColumn("fair_value",
        col("pe") / nullif(col("sector_pe"), lit(0.0)) * col("price"))
      .withColumn("delta",
        (col("fair_value") - col("price")) / nullif(col("price"), lit(0.0)))
      .select(col("custkey"), col("c_mktsegment"), col("price"), col("pe"),
        col("sector_pe"), col("fair_value"), col("delta"))
  }

  /** Ratio table (fundamental_extractor.py:274 `get_financial_ratios` —
    * the pe/pb/ps/roe/... numeric normalization feeding the analyzer):
    * per-(customer, quarter) ratio columns derived from the order book.
    * Proxies on the TPC-H mapping, one role each:
    * price = gross transacted value (Σ l_extendedprice);
    * earnings = discount-net revenue; debt = open-order ('O')
    * commitments; equity = account balance. Derived columns are exactly
    * the ones `score_fundamentals` consumes (roe, debt_to_equity,
    * current_ratio, revenue_growth, gross_margin) plus pe/ps for the
    * sector-compare surface. One fact-scale shuffle (the quarter
    * rollup); the customer join carries one row per customer.
    */
  def financialRatios(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame): DataFrame = {
    val q = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("quarter", col("o_orderdate")).as("quarter"))
      .agg(
        sum(col("l_extendedprice")).as("gross"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("earnings"),
        sum(when(col("o_orderstatus") === "O", col("l_extendedprice"))).as("__debt_raw"),
        count(lit(1)).as("n_items"))
    q.join(customer.select(col("c_custkey").as("custkey"),
        col("c_mktsegment"), col("c_acctbal")), Seq("custkey"))
      .withColumn("debt", coalesce(col("__debt_raw"), lit(0.0)))
      .withColumn("pe", col("gross") / nullif(col("earnings"), lit(0.0)))
      .withColumn("ps", col("gross") / col("n_items"))
      .withColumn("roe", col("earnings") / nullif(col("c_acctbal"), lit(0.0)))
      .withColumn("debt_to_equity", col("debt") / nullif(col("c_acctbal"), lit(0.0)))
      .withColumn("current_ratio",
        col("c_acctbal") / nullif(col("gross") / col("n_items"), lit(0.0)))
      .withColumn("gross_margin", col("earnings") / nullif(col("gross"), lit(0.0)))
      .withColumn("revenue_growth",
        col("earnings") / nullif(lag(col("earnings"), 1).over(byCustQ), lit(0.0)) - 1)
      .select(col("custkey"), col("quarter"), col("c_mktsegment"),
        col("gross"), col("earnings"), col("debt"),
        col("c_acctbal").as("equity"), col("n_items"),
        col("pe"), col("ps"), col("roe"), col("debt_to_equity"),
        col("current_ratio"), col("gross_margin"), col("revenue_growth"))
  }

  /** Reference-faithful `score_fundamentals` (fundamental_analyzer.py:46)
    * over the ratio table: latest quarter per customer, five checks —
    * roe above sector average, debt_to_equity < 1, current_ratio > 1.5,
    * revenue_growth > 10%, gross_margin above sector average — summed
    * into a score, 'buy' at ≥ 4 else 'hold'. Sector averages are
    * computed from the same latest-quarter rows (the reference receives
    * them precomputed) and broadcast back.
    */
  def scoreFromRatios(ratios: DataFrame): DataFrame = {
    val latest = ratios
      .withColumn("__rd", row_number().over(byCustQDesc))
      .filter(col("__rd") === 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segAvg = latest.groupBy(col("c_mktsegment")).agg(
      avg(col("roe")).as("seg_roe"),
      avg(col("gross_margin")).as("seg_margin"))
    latest.join(broadcast(segAvg), Seq("c_mktsegment"))
      .withColumn("f_roe",
        coalesce((col("roe") > col("seg_roe")).cast("int"), lit(0)))
      .withColumn("f_de",
        coalesce((col("debt_to_equity") < 1).cast("int"), lit(0)))
      .withColumn("f_current",
        coalesce((col("current_ratio") > 1.5).cast("int"), lit(0)))
      .withColumn("f_growth",
        coalesce((col("revenue_growth") > 0.1).cast("int"), lit(0)))
      .withColumn("f_margin",
        coalesce((col("gross_margin") > col("seg_margin")).cast("int"), lit(0)))
      .withColumn("score",
        col("f_roe") + col("f_de") + col("f_current") +
          col("f_growth") + col("f_margin"))
      .withColumn("recommendation",
        when(col("score") >= 4, "buy").otherwise("hold"))
      .select(col("custkey"), col("c_mktsegment"), col("f_roe"), col("f_de"),
        col("f_current"), col("f_growth"), col("f_margin"), col("score"),
        col("recommendation"))
  }

  /** #36 fund_fair_value_dcf (fundamental_analyzer.py:17
    * calculate_fair_value): PV of the quarterly revenue series at a 10%
    * discount rate (term i discounted by 1.1^i, i = 1-based chronological
    * position, exactly the reference's (i+1) exponent over enumerate),
    * price proxied by the latest quarter, delta = (fv − price)/price.
    */
  def fairValueDcf(orders: DataFrame, discountRate: Double = 0.1): DataFrame = {
    val series = quarterlySeries(orders)
      .withColumn("__i", row_number().over(byCustQ))
      .withColumn("__rd", row_number().over(byCustQDesc))
    val fv = series.groupBy(col("custkey"))
      .agg(sum(col("revenue") / pow(lit(1.0 + discountRate), col("__i"))).as("fair_value"))
    val price = series.filter(col("__rd") === 1)
      .select(col("custkey"), col("revenue").as("price"))
    fv.join(price, Seq("custkey"))
      .withColumn("delta",
        (col("fair_value") - col("price")) / nullif(col("price"), lit(0.0)))
  }
}
