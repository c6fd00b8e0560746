package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Ad-hoc single-query timing (dev diagnostics): times the named
  * SparkEntry queries on SPARK_GRAFT_SF_DIR with Bench's methodology
  * (noop sink, untimed warm scan, min of 2 passes) — the tool for
  * seeding a new query's BASELINE.md row without a full bench run.
  *
  *   sbt "runMain graft.tools.Probe realtime_snapshot dedup_clusters"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder("graft-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    graft.sources.Tables.all.foreach { t =>
      try {
        (if (t == "events") graft.sources.Tables.events(spark, d)
         else graft.sources.Tables.load(spark, d, t)).count()
      } catch { case _: Throwable => () }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[probe] $name: no such query")
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[probe] $name: ${times.min}%.3f s (passes: ${times.map(t => f"$t%.3f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
