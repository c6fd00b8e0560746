package graft.tools

import graft.GraftSession

/** Runtime re-derivation audit (r8): executes the named SparkEntry
  * queries (all by default) and reports, from the POST-RUN adaptive
  * plan, how many times the corpus is re-scanned and how many live
  * shuffles ran — the static explain cannot show this, because AQE
  * decides exchange reuse at runtime and (verified r8) reuses NOTHING
  * across self-join branches built from separate DataFrame
  * instantiations. A query whose FileScan count exceeds its table
  * count is re-deriving a shared subplan per consumer; the fix is the
  * localCheckpoint idiom (the maximal-span LCP-pairs / guarded-posting
  * lesson) WHEN the subplan is expensive relative to its output size.
  *
  *   sbt "runMain graft.tools.ReuseProbe ngram_jaccard,sentence_dedup"
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-reuse-probe")
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.headOption.map(_.split(",").toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val q = graft.SparkEntry.queries(name)(spark, d)
        q.write.format("noop").mode("overwrite").save()
        val p = q.queryExecution.executedPlan.toString
        def c(pat: String) = pat.r.findAllIn(p).size
        val scans = c("FileScan parquet")
        val rddScans = c("Scan ExistingRDD")
        val shuffles = c("Exchange (hash|range|Single)")
        val reused = c("ReusedExchange")
        val windows = c("Window ")
        // A persisted frame PRINTS its full lineage under each
        // InMemoryTableScan but executes it once — a high scan count
        // with imts > 0 is (mostly) printing, not re-derivation.
        val imts = c("InMemoryTableScan")
        println(f"[reuse] $name%-28s scans=$scans%2d rddScans=$rddScans%2d " +
          f"liveShuffles=$shuffles%2d reused=$reused%2d windows=$windows%2d " +
          f"cacheReads=$imts%2d")
      } catch {
        case e: Throwable => println(s"[reuse] $name FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
