package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Ad-hoc scheduling-vs-compute profile (dev diagnostics): runs the named
  * SparkEntry queries with Bench's methodology (noop sink, warm pass,
  * timed second pass) and reports per query how many Spark jobs/stages/
  * tasks it launched and the summed executor task time — the tool that
  * tells a round-dominated query (many tiny jobs, wall >> task time)
  * from a compute-bound one (task time ≈ wall × cores).
  *
  *   sbt "runMain graft.tools.JobProbe dedup_clusters semantic_dedup"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.builder("graft-job-probe")
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val gcMillis = new AtomicLong(0L)
    // per-stage: (tasks, summed ms, max task ms, name) — finds the serial /
    // skewed stages inside a slow query
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, String)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '(').trim)
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          val ms = t.taskMetrics.executorRunTime
          taskNanos.addAndGet(ms * 1000000L)
          gcMillis.addAndGet(t.taskMetrics.jvmGCTime)
          stageAgg.merge(t.stageId, (1, ms, ms, ""), (a, b) =>
            (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3), ""))
        }
        ()
      }
    })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    graft.sources.Tables.all.foreach { t =>
      try {
        (if (t == "events") graft.sources.Tables.events(spark, d)
         else graft.sources.Tables.load(spark, d, t)).count()
      } catch { case _: Throwable => () }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[jobprobe] $name: no such query")
        case Some(fn) =>
          // warm pass (codegen/JIT), then the measured pass
          fn(spark, d).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          Thread.sleep(300) // let the async listener bus drain the warm pass
          jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L); gcMillis.set(0L)
          stageAgg.clear(); stageNames.clear()
          val t0 = System.nanoTime()
          fn(spark, d).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"[jobprobe] $name%-28s wall=$wall%7.3fs jobs=${jobs.get}%3d " +
            f"stages=${stages.get}%4d tasks=${tasks.get}%5d " +
            f"taskTime=${taskNanos.get / 1e9}%8.2fs gc=${gcMillis.get / 1e3}%6.2fs")
          import scala.jdk.CollectionConverters._
          stageAgg.asScala.toSeq.sortBy(-_._2._2).take(6).foreach {
            case (sid, (n, sum, max, _)) =>
              val nm = Option(stageNames.get(sid)).getOrElse("?")
              println(f"[jobprobe]   stage $sid%4d $nm%-24s tasks=$n%4d sum=${sum / 1e3}%7.2fs max=${max / 1e3}%6.2fs")
          }
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
