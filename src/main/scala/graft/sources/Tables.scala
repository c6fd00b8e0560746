package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the graft table universe (one parquet file/dir per table).
  *
  * Plays the role of the reference's extractor layer
  * (`/root/reference/src/extractors/`): there the data comes from a
  * networked market-data API per symbol in a thread pool; here every table
  * is a distributed columnar scan — filters and column pruning push down
  * into the parquet reader, and parallelism is per-split, not per-symbol.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and truncate to
    * microsecond timestamps (`div 1000` = the same truncation DuckDB's
    * `CAST(ts_ns AS TIMESTAMP)` applies — both engines agree on values).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * GraftSession.builder — loaders never mutate session conf.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
