package graft.tools

import graft.GraftSession
import graft.sources.Tables

/** One-off (r8): verify AQE reuses the guarded-posting exchange across
  * the self-join's two sides + the sizes aggregate at runtime.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-reuse-probe")
      .master("local[4]").config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.operators.Dedup.ngramJaccardInvertedIndex(Tables.documents(spark, d))
    q.write.format("noop").mode("overwrite").save()
    val p = q.queryExecution.executedPlan.toString
    val reused = "ReusedExchange".r.findAllIn(p).size
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    println(s"[reuseprobe] ReusedExchange=$reused liveShuffles=$shuffles")
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Window") || l.contains("HashAggregate")).map(_.take(140)).mkString("\n"))
    spark.stop()
  }
}
