package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of wall-times.
  *
  * Each query is materialized through the noop sink so the full plan
  * (windows, folds, final sort) executes — a bare `count()` lets Catalyst
  * prune unreferenced projections and under-measures indicator work.
  * Failures are recorded as -1 (and logged), never as a fast success.
  *
  * Regression gate: BASELINE.md's fenced `baseline` block freezes the
  * best demonstrated per-query time at sf0.1. A query slower than
  * max(2 × baseline, baseline + 1 s) fails the run (rc=2) AFTER the
  * JSON line prints, so the driver's parse survives a gated round.
  * Armed only on the sf0.1 testdata; `SPARK_GRAFT_BASELINE=off` skips.
  */
object Bench {
  /** name → frozen seconds, from BASELINE.md's ```baseline fence. */
  def loadBaseline(path: String = "BASELINE.md"): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val lines = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
    try {
      lines.getLines()
        .dropWhile(!_.startsWith("```baseline")).drop(1)
        .takeWhile(!_.startsWith("```"))
        .flatMap { l =>
          l.trim.split("\\s+") match {
            case Array(name, secs) => secs.toDoubleOption.map(name -> _)
            case _ => None
          }
        }.toMap
    } finally lines.close()
  }

  def regressionThreshold(base: Double): Double = math.max(2 * base, base + 1.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed steady-state warmup: JIT, codegen cache, parquet footers.
    // Without it the alphabetically-first query absorbs several seconds
    // of one-time JVM cost and the per-query numbers lie.
    graft.sources.Tables.all.foreach { t =>
      try {
        (if (t == "events") graft.sources.Tables.events(spark, sfDir)
         else graft.sources.Tables.load(spark, sfDir, t)).count()
      } catch { case _: Throwable => () }
    }
    var failures = 0
    // Two passes, report the per-query minimum: steady-state numbers,
    // not first-run codegen compilation. A failure in either pass is a
    // failure.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          failures += 1
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).map(_ => timeOnce(name, fn))
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
    val gateArmed = sfDir.contains("sf0.1") &&
      !sys.env.get("SPARK_GRAFT_BASELINE").contains("off")
    if (gateArmed) {
      val baseline = loadBaseline()
      val regressions = results.collect {
        case (name, t) if t >= 0 && baseline.contains(name) &&
          t > regressionThreshold(baseline(name)) =>
          f"$name: ${t}%.2fs vs baseline ${baseline(name)}%.2fs"
      }
      if (regressions.nonEmpty) {
        regressions.foreach(r => System.err.println(s"[bench] REGRESSION $r"))
        sys.exit(2)
      }
    }
  }
}
