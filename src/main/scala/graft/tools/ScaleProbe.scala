package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._
import graft.sources.Tables

/** Scaling sweep (dev diagnostics): times the dominant pipelines on
  * 1×/2×/4× the sf0.1 event feed, each copy user-shifted so key
  * cardinality grows with the data (more symbols, same per-key history —
  * the real 100 TB shape). Linear wall-time across the sweep is the
  * empirical check behind SURVEY §5's partition-parallel claims.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder("graft-scale")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noopTime(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val base = Tables.events(spark, d)
    base.count() // warm scan
    // First k=1 pass is codegen/JIT warmup — discard its line.
    Seq(1, 1, 2, 4).foreach { k =>
      val events = (0 until k).map(i =>
        base.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
      val clean = Cleaning.cleanEvents(events)
      val bars = Bars.daily(clean)
      val tClean = noopTime(clean)
      val tBars = noopTime(bars)
      val tInd = noopTime(Indicators.withRsi(Indicators.withSma(bars, Seq(5, 10)), 14))
      val tBreadth = noopTime(Breadth.breadthDaily(bars))
      val tMacd = noopTime(Indicators.withMacd(bars, 5, 10, 4))
      println(f"[scale] k=$k rows=${k * 1000000L} clean=$tClean%.2f bars=$tBars%.2f " +
        f"indicators=$tInd%.2f breadth=$tBreadth%.2f macd=$tMacd%.2f")
    }
    spark.stop()
  }
}
