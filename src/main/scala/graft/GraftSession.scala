package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration graft assumes everywhere.
  *
  * Local runs use `local[N]`; on a real cluster the same builder applies —
  * only master/shuffle-partitions change (config, not code). AQE is on so
  * skewed joins and over-partitioned shuffles self-correct at runtime.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.ts is parquet TIMESTAMP(NANOS); read as long (Tables.events
      // truncates to micros). Set here so loaders never mutate session conf.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  /** Local session for tests and ad-hoc runs. */
  def local(appName: String = "graft", cores: Int = 4): SparkSession = {
    val s = builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.warehouse.dir", s"/tmp/graft-warehouse-${sys.props("user.name")}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
