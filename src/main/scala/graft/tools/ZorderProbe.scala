package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Layout
import graft.sources.Tables

/** Measures the Z-order layout's PAYOFF, not just its key math
  * (VERDICT r9 next-round #5 — the SpanProbe rule: measure, don't
  * argue): writes the sf events table twice — Z-ordered on
  * (user_id, day) vs the same file count laid out by arrival order —
  * reads each back under a two-dimensional box filter, and reports the
  * parquet scan's OWN metrics (rows surfaced by the reader after
  * row-group/page pruning, files read, bytes read). Row-group min/max
  * stats only prune when the layout makes them TIGHT; the arrival
  * layout scatters both dimensions across every row group, so its
  * scan must surface nearly everything and filter row-by-row.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ZorderProbe
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder("graft-zorder")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Small row groups so one file holds MANY groups — at production
    // scale a 128 MB row group in a 1 GB file gives the same
    // groups-per-file shape this forces at sf0.1.
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 64 * 1024)
    val out = "/tmp/graft_zorder_probe"
    val ev0 = Tables.events(spark, d).select(col("event_id"), col("user_id"),
      datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
        .cast("long").as("day"), col("value"))
    // The zorderLayout contract: map raw values onto COMPACT,
    // COMPARABLE-WIDTH ranks first. The raw dimensions here are ~10
    // bits of user vs ~5 bits of day — interleaved as-is, every day
    // bit sits below the user bits and a day filter prunes NOTHING
    // (measured: a 3-day slice surfaced 97% of the table). Normalizing
    // both to the same width is what makes the curve square.
    val spans = ev0.agg(min("user_id"), max("user_id"),
      min("day"), max("day")).head
    val (uLo0, uHi0, dLo0, dHi0) =
      (spans.getLong(0), spans.getLong(1), spans.getLong(2), spans.getLong(3))
    val bits = 10
    val side = (1L << bits) - 1
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      ((c - lit(lo)) * lit(side) / lit(math.max(1L, hi - lo))).cast("long")
    val ev = ev0
      .withColumn("__zu", norm(col("user_id"), uLo0, uHi0))
      .withColumn("__zd", norm(col("day"), dLo0, dHi0))
    val nFiles = 32
    ev.transform(df => Layout.zorderLayout(df, col("__zu"), col("__zd"),
        numFiles = nFiles, bits = bits))
      .drop("__zu", "__zd")
      .write.mode("overwrite").parquet(s"$out/zordered")
    // Control 1: identical data, identical file count, arrival order.
    ev0.repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/arrival")
    // Control 2: single-dimension sort (the naive alternative) — it
    // prunes user-filters perfectly and day-filters not at all; the
    // Z-order claim is that BOTH dimensions prune partially.
    ev0.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(s"$out/byuser")
    val (uLo, uHi, dLo, dHi) = (uLo0, uHi0, dLo0, dHi0)
    // A ~1/8 × 1/8 box in (user, day) — the "this symbol slice, this
    // date slice" scan shape both dimensions' consumers run.
    val uMid = uLo + (uHi - uLo) / 2
    val dMid = dLo + (dHi - dLo) / 2
    val uW = math.max(1L, (uHi - uLo) / 8)
    val dW = math.max(1L, (dHi - dLo) / 8)
    def probe(path: String, pred: org.apache.spark.sql.Column): (Long, Long, Long, Long) = {
      val df = spark.read.parquet(path).filter(pred)
      // Execute and inspect the SAME QueryExecution — a separate
      // count() runs its own plan and leaves these metrics at zero.
      val qe = df.queryExecution
      val n = qe.executedPlan.executeCollect().length.toLong
      val scans = qe.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      val surfaced = scans.map(_.metrics("numOutputRows").value).sum
      val files = scans.map(_.metrics("numFiles").value).sum
      val bytes = scans.map(m => m.metrics.get("filesSize").map(_.value)
        .getOrElse(0L)).sum
      (n, surfaced, files, bytes)
    }
    val boxPred = col("user_id") >= uMid && col("user_id") < uMid + uW &&
      col("day") >= dMid && col("day") < dMid + dW
    val userPred = col("user_id") >= uMid && col("user_id") < uMid + uW
    val dayPred = col("day") >= dMid && col("day") < dMid + dW
    val layouts = Seq("zordered", "arrival", "byuser")
    val filters = Seq("box2d" -> boxPred, "user_slice" -> userPred,
      "day_slice" -> dayPred)
    // Warm every read once (footer cache, codegen), then measure.
    for (l <- layouts; (_, p) <- filters) probe(s"$out/$l", p)
    filters.foreach { case (fname, p) =>
      val rows = layouts.map(l => l -> probe(s"$out/$l", p)).toMap
      val answers = rows.values.map(_._1).toSet
      require(answers.size == 1, s"layouts disagree on $fname: $rows")
      val cells = layouts.map { l =>
        val (_, surfaced, _, _) = rows(l)
        s""""$l":$surfaced"""
      }.mkString(",")
      println(s"""{"probe":"zorder","filter":"$fname","matching_rows":${answers.head},"rows_surfaced":{$cells}}""")
    }
  }
}
