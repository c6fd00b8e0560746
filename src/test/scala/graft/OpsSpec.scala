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

  test("salted join: identical result set, shuffle key carries the salt") {
    val fact = (1 to 100).map(i => (if (i <= 90) 1L else i.toLong, i.toDouble))
      .toDF("user_id", "value") // key 1 carries 90% of rows
    val dim = Seq((1L, "hot"), (95L, "cold")).toDF("user_id", "tag")
    val plain = fact.join(dim, Seq("user_id")).collect()
    val salted = operators.Skew.saltedJoin(fact, dim, "user_id", salts = 4)
    val out = salted.collect()
    assert(out.length == plain.length)
    assert(out.map(_.getAs[Double]("value")).sorted.sameElements(
      plain.map(_.getAs[Double]("value")).sorted))
    val plan = salted.queryExecution.executedPlan.toString()
    assert(plan.contains("__salt"), "join key must include the salt column")
    val profile = operators.Skew.keyProfile(fact, "user_id", 1).collect()
    assert(profile.head.getAs[Long]("user_id") == 1L &&
      profile.head.getAs[Long]("count") == 90L)
  }

  test("bucketed table: co-located self-join plans without an exchange") {
    // A previous JVM's warehouse files survive while the in-memory
    // catalog does not — clear both so Overwrite can create the table.
    spark.sql("DROP TABLE IF EXISTS bars_bucketed")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir") + "/bars_bucketed"))
    if (loc.exists) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("user_id", "v")
    Export.bucketedTable(df, "bars_bucketed", Seq("user_id"), buckets = 8,
      sortCols = Seq("user_id"))
    val t = spark.table("bars_bucketed")
    val agg = t.groupBy("user_id").count()
    val aggPlan = agg.queryExecution.executedPlan.toString()
    assert(!aggPlan.contains("Exchange"),
      s"bucketed groupBy must not shuffle:\n$aggPlan")
    assert(agg.count() == 50)
    val joined = t.as("a").join(spark.table("bars_bucketed").as("b"), "user_id")
    assert(joined.count() == 1000 * 20)
  }

  test("pipeline: daily snapshot writes every output and renders the report") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val md = Pipeline.runDaily(spark, "/root/testdata/sf0.001", out, "2024-01-31")
    assert(md.contains("# Daily Market Report"))
    val base = s"$out/snapshot=2024-01-31"
    Seq("bars", "indicators", "breadth", "health", "movers", "signals", "breakouts")
      .foreach { name =>
        val df = spark.read.parquet(s"$base/$name")
        assert(df.columns.nonEmpty, s"$name must have a schema")
      }
    assert(spark.read.parquet(s"$base/bars").count() ==
      spark.read.parquet(s"$base/indicators").count(),
      "enrichment preserves bar grain")
    assert(spark.read.parquet(s"$base/health").count() == 1)
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
