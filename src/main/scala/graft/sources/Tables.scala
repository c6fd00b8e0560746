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
  /** `events.ts` arrives in whatever physical type the generator used —
    * parquet TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * GraftSession.builder; truncated here to micros, the same truncation
    * DuckDB's `CAST(ts_ns AS TIMESTAMP)` applies) or TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (Spark reads TIMESTAMP_NTZ; cast to
    * session-time TIMESTAMP — value-preserving under the UTC session
    * timezone and identical to DuckDB's naive read). Downstream
    * operators always see a plain TIMESTAMP column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
