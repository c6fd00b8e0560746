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
    val ev = Tables.events(spark, d).select(col("event_id"), col("user_id"),
      datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
        .cast("long").as("day"), col("value"))
    val nFiles = 32
    ev.transform(df => Layout.zorderLayout(df, col("user_id"), col("day"),
        numFiles = nFiles))
      .write.mode("overwrite").parquet(s"$out/zordered")
    // The control: identical data, identical file count, arrival order.
    ev.repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/arrival")
    val (uLo, uHi) = {
      val r = ev.agg(min("user_id"), max("user_id")).head
      (r.getLong(0), r.getLong(1))
    }
    val (dLo, dHi) = {
      val r = ev.agg(min("day"), max("day")).head
      (r.getLong(0), r.getLong(1))
    }
    // A ~1/8 × 1/8 box in (user, day) — the "this symbol slice, this
    // date slice" scan shape both dimensions' consumers run.
    val uMid = uLo + (uHi - uLo) / 2
    val dMid = dLo + (dHi - dLo) / 2
    val uW = math.max(1L, (uHi - uLo) / 8)
    val dW = math.max(1L, (dHi - dLo) / 8)
    def probe(path: String): (Long, Long, Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("user_id") >= uMid && col("user_id") < uMid + uW &&
          col("day") >= dMid && col("day") < dMid + dW)
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
    // Warm both reads once (footer cache, codegen), then measure.
    probe(s"$out/zordered"); probe(s"$out/arrival")
    val (nz, sz, fz, _) = probe(s"$out/zordered")
    val (na, sa, fa, _) = probe(s"$out/arrival")
    require(nz == na, s"layouts disagree on the answer: $nz vs $na")
    println(f"""{"probe":"zorder","matching_rows":$nz,""" +
      f""""zordered":{"rows_surfaced":$sz,"files_read":$fz},""" +
      f""""arrival":{"rows_surfaced":$sa,"files_read":$fa},""" +
      f""""surfaced_ratio":${sa.toDouble / math.max(1L, sz)}%.2f}""")
  }
}
