package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bars, Breadth, Cleaning, Scope}
import graft.ops.{Export, Report}
import graft.sources.Tables

class OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scope: top-N by activity and modal-type membership") {
    val bars = Seq(
      (1L, d("2024-01-01"), 10L), (1L, d("2024-01-02"), 10L),
      (2L, d("2024-01-01"), 5L), (3L, d("2024-01-01"), 50L)
    ).toDF("user_id", "date", "volume")
    val top = Scope.topNByActivity(bars, 2).collect()
    assert(top.map(_.getAs[Long]("user_id")).toSeq == Seq(3L, 1L))
    val events = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),
      (2L, "error"), (2L, "error")
    ).toDF("user_id", "event_type")
    val scoped = Scope.usersInScope(events, Seq("view", "click")).collect()
    assert(scoped.length == 1 && scoped.head.getAs[Long]("user_id") == 1L)
    val restricted = Scope.restrict(events, scoped.map(r =>
      Tuple1(r.getAs[Long]("user_id"))).toSeq.toDF("user_id"))
    assert(restricted.count() == 3)
  }

  test("export: partitioned parquet round-trips with pruned layout") {
    val dir = Files.createTempDirectory("graft-export").toString
    val df = Seq((d("2024-01-01"), 1L, 10.0), (d("2024-01-02"), 1L, 11.0))
      .toDF("date", "user_id", "close")
    Export.parquet(df, s"$dir/bars", partitionCols = Seq("date"))
    val back = spark.read.parquet(s"$dir/bars")
    assert(back.count() == 2)
    assert(back.filter($"date" === d("2024-01-02")).count() == 1)
    Export.csv(df, Export.snapshotPath(s"$dir/csv", "2024-01-02"))
    val csv = spark.read.option("header", "true").csv(s"$dir/csv/snapshot=2024-01-02")
    assert(csv.count() == 2)
  }

  test("report: daily markdown assembles summary, regime and movers") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val bars = Bars.daily(Cleaning.cleanEvents(events))
    val breadth = Breadth.breadthDaily(bars)
    val md = Report.dailyMarkdown(
      Breadth.marketSummary(breadth, bars),
      Breadth.topMovers(bars, 3),
      Breadth.marketRegime(breadth))
    assert(md.contains("# Daily Market Report"))
    assert(md.contains("**Regime:**"))
    assert(md.contains("## Top gainers") && md.contains("## Top losers"))
    assert(md.split("\n").count(_.startsWith("| ")) >= 6, "movers tables populated")
  }
}
