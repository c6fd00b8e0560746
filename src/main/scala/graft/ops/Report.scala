package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markdown report generation — Spark re-expression of the reference's
  * `ReportGenerator` (/root/reference/src/utils/report_generator.py):
  * daily market summary assembled from the (already tiny) analytic
  * outputs.
  *
  * Reports are driver-side BY DESIGN: every input here is an aggregate
  * of at most a few rows (one summary row, top-k movers, one regime
  * row). The 100 TB of ticks never reach this code — the collect()
  * boundary sits strictly after the day-grain aggregation.
  */
object Report {

  private def fmt(v: Any): String = v match {
    case null => "n/a"
    case d: java.lang.Double => f"$d%.2f"
    case x => x.toString
  }

  /** Daily markdown summary from market_summary + top_movers + regime
    * outputs (each already aggregated; rows: 1, ≤2k, 1).
    */
  def dailyMarkdown(summary: DataFrame, movers: DataFrame, regime: DataFrame): String = {
    val s = summary.collect().headOption
    val latestRegime = regime.orderBy(regime("date").desc).limit(1).collect().headOption
    val mv = movers.collect()
    val sb = new StringBuilder
    sb.append("# Daily Market Report\n\n")
    s.foreach { r =>
      sb.append(s"**Date:** ${r.getAs[Any]("date")}\n\n")
      sb.append(s"- Advancers: ${r.getAs[Long]("advancers")}, ")
      sb.append(s"Decliners: ${r.getAs[Long]("decliners")}\n")
      sb.append(s"- Breadth: ${fmt(r.getAs[Any]("breadth_percent"))}%\n")
      sb.append(s"- Volume vs 20d avg: ${fmt(r.getAs[Any]("volume_vs_avg"))}\n")
      sb.append(s"- Sentiment: ${fmt(r.getAs[Any]("market_sentiment"))}/100\n\n")
    }
    latestRegime.foreach { r =>
      sb.append(s"**Regime:** ${r.getAs[String]("regime")}\n\n")
    }
    def side(name: String, rows: Array[Row]): Unit = {
      sb.append(s"## Top $name\n\n| rank | user | close | return % |\n|---|---|---|---|\n")
      rows.sortBy(_.getAs[Int]("rk")).foreach { r =>
        sb.append(s"| ${r.getAs[Int]("rk")} | ${r.getAs[Long]("user_id")} | ")
        sb.append(s"${fmt(r.getAs[Any]("close"))} | ${fmt(r.getAs[Any]("return_pct"))} |\n")
      }
      sb.append("\n")
    }
    side("gainers", mv.filter(_.getAs[String]("side") == "gainer"))
    side("losers", mv.filter(_.getAs[String]("side") == "loser"))
    sb.toString
  }

  /** Per-user trailing-week performance (report_generator.py:217
    * generate_weekly_summary's per-symbol tail(5) loop, distributed):
    * return over the last `lookback` bars and the last close, per user.
    * One window + one aggregate on user grain; under-2-bar users are
    * skipped exactly as the reference's `len(df) < 2` guard.
    */
  def weeklyPerformance(bars: DataFrame, lookback: Int = 5): DataFrame =
    bars
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("date").desc)))
      .filter(col("__rn") <= lookback)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_days"),
        min_by(col("close"), col("date")).as("__start_close"),
        max_by(col("close"), col("date")).as("last_close"),
        max(col("date")).as("date"))
      .filter(col("n_days") >= 2)
      .withColumn("weekly_return_pct",
        round((col("last_close") / nullif(col("__start_close"), lit(0.0)) - 1) * 100, 2))
      .withColumn("last_close", round(col("last_close"), 2))
      .select(col("user_id"), col("weekly_return_pct"), col("last_close"),
        col("date"), col("n_days"))

  /** Weekly markdown summary (report_generator.py:217): full performance
    * table sorted by weekly return (nulls last), top-5 performers,
    * bottom-5 underperformers. The collect() boundary sits on the
    * user-grain performance table — the caller scopes the universe
    * first (Scope.restrict), the same role as the reference's config
    * symbol list.
    */
  def weeklyMarkdown(perf: DataFrame, yearWeek: String): String = {
    val rows = perf.collect().sortBy { r =>
      val v = r.getAs[Any]("weekly_return_pct")
      if (v == null) (1, 0.0) else (0, -v.asInstanceOf[Double])
    }
    def table(rs: Array[Row]): String =
      if (rs.isEmpty) "_N/A_"
      else ("| user | weekly_return_pct | last_close |\n| --- | --- | --- |\n" +
        rs.map(r => s"| ${r.getAs[Long]("user_id")} | " +
          s"${fmt(r.getAs[Any]("weekly_return_pct"))} | " +
          s"${fmt(r.getAs[Any]("last_close"))} |").mkString("\n"))
    val sb = new StringBuilder
    sb.append(s"# Weekly Summary ($yearWeek)\n\n")
    sb.append("## Weekly Performance\n\n").append(table(rows)).append("\n\n")
    sb.append("## Top Performers\n\n").append(table(rows.take(5))).append("\n\n")
    // Reverse only the RANKED rows: nulls sort last, so a blind
    // rows.reverse would list n/a users as the "worst performers" and
    // push genuine losers out of the table.
    val ranked = rows.filter(_.getAs[Any]("weekly_return_pct") != null)
    sb.append("## Underperformers\n\n").append(table(ranked.reverse.take(5))).append("\n")
    sb.toString
  }

  private def kvSection(sb: StringBuilder, title: String, items: Seq[(String, Any)]): Unit = {
    sb.append(s"## $title\n\n")
    items.foreach { case (k, v) => sb.append(s"- **$k**: ${fmt(v)}\n") }
    sb.append("\n")
  }

  private def get(r: Row, k: String): Any =
    if (r.schema.fieldNames.contains(k)) r.getAs[Any](k) else null

  /** Per-symbol technical report (report_generator.py:147
    * generate_technical_report): snapshot, indicator values, support/
    * resistance levels, trend, signal summary and the risk-assessment
    * block (:357 — ATR/close > 5% high volatility, > 2% medium).
    * Inputs are the per-user rows of the already-aggregated analytic
    * frames; each collect() touches at most one row per frame.
    */
  def technicalMarkdown(userId: Long, enriched: DataFrame, supRes: DataFrame,
                        trend: DataFrame, signal: DataFrame): String = {
    val latest = enriched.filter(col("user_id") === userId)
      .orderBy(col("date").desc).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no enriched rows for user $userId — cannot build technical report"))
    val sr = supRes.filter(col("user_id") === userId).limit(1).collect().headOption
    val tr = trend.filter(col("user_id") === userId).limit(1).collect().headOption
    val sig = signal.filter(col("user_id") === userId).limit(1).collect().headOption
    val sb = new StringBuilder
    sb.append(s"# Technical Report: $userId\n\n")
    kvSection(sb, "Snapshot", Seq(
      "Date" -> get(latest, "date"), "Close" -> get(latest, "close"),
      "Volume" -> get(latest, "volume"), "RSI" -> get(latest, "rsi"),
      "MACD" -> get(latest, "macd")))
    val indicatorKeys = Seq("ma_5", "ma_10", "ma_20", "ema_5", "ema_12",
      "ema_26", "bb_upper", "bb_middle", "bb_lower", "atr")
      .filter(latest.schema.fieldNames.contains)
    kvSection(sb, "Indicators", indicatorKeys.map(k => k -> get(latest, k)))
    kvSection(sb, "Support / Resistance", Seq(
      "Resistances" -> sr.map(r => Seq("res_1", "res_2", "res_3")
        .map(k => fmt(get(r, k))).mkString(", ")).orNull,
      "Supports" -> sr.map(r => Seq("sup_1", "sup_2", "sup_3")
        .map(k => fmt(get(r, k))).mkString(", ")).orNull))
    kvSection(sb, "Trend", Seq(
      "Trend" -> tr.map(get(_, "trend_type")).orNull,
      "Strength" -> tr.map(get(_, "trend_strength")).orNull,
      "Confidence" -> tr.map(get(_, "confidence")).orNull))
    kvSection(sb, "Signal Summary", Seq(
      "Overall" -> sig.map(get(_, "overall_signal")).orNull,
      "Score" -> sig.map(get(_, "score")).orNull,
      "Confidence" -> sig.map(get(_, "confidence")).orNull))
    sb.append("## Risk Assessment\n\n")
    val risk = (get(latest, "atr"), get(latest, "close")) match {
      case (atr: java.lang.Double, close: java.lang.Double) if close != 0 =>
        val ratio = atr / close
        if (ratio > 0.05)
          "High volatility (ATR/close > 5%): consider reducing position size or tightening stops."
        else if (ratio > 0.02)
          "Moderate volatility: ATR-based stop-loss management applies."
        else "Low volatility."
      case _ => "n/a"
    }
    sb.append(risk).append("\n")
    sb.toString
  }
}
