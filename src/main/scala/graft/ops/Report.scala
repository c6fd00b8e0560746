package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

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
}
