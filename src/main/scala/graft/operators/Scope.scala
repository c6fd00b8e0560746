package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Universe scope filtering — Spark re-expression of the reference's
  * `MarketScopeFilter` (/root/reference/src/scanners/market_scope_filter.py):
  * restrict the symbol universe by listing/exchange membership and by
  * top-N activity before running expensive analytics.
  *
  * Scale shape: scope sets are tiny → always broadcast into the feed
  * filter; activity ranking is one aggregate over bars (already
  * day-grain). Filtering FIRST is what keeps downstream indicator/
  * screener passes proportional to the scoped universe, not the full
  * feed.
  */
object Scope {

  /** Top-N users by summed bar volume (deterministic id tie-break).
    * TakeOrderedAndProject via [[TopK.withRank]] — no global window, so
    * the universe-sized aggregate never lands on a single partition.
    */
  def topNByActivity(bars: DataFrame, n: Int): DataFrame =
    TopK.withRank(
      bars.groupBy(col("user_id")).agg(sum(col("volume")).as("total_volume")),
      n, Seq(TopK.descNum(col("total_volume")), col("user_id")))
      .select(col("user_id"), col("total_volume"), col("rk"))

  /** Users whose modal event_type falls in `allowed` (event_type plays
    * the exchange/board role of the reference's scope config).
    */
  def usersInScope(cleanEvents: DataFrame, allowed: Seq[String]): DataFrame = {
    val byCount = cleanEvents.groupBy(col("user_id"), col("event_type")).count()
    byCount
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("count").desc, col("event_type"))))
      .filter(col("rk") === 1 && col("event_type").isin(allowed: _*))
      .select(col("user_id"), col("event_type").as("modal_type"))
  }

  /** Restrict a keyed feed to a scoped universe (broadcast semi join). */
  def restrict(df: DataFrame, universe: DataFrame): DataFrame =
    df.join(broadcast(universe.select(col("user_id"))), Seq("user_id"), "left_semi")

  /** Valid-symbol predicate on a string column (Cleaning.isValidSymbol
    * re-exported next to the scope ops for discoverability).
    */
  def validSymbol(c: Column): Column = Cleaning.isValidSymbol(c)
}
