package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema-enforced JSONL corpus ingest with corrupt-record isolation —
  * the read twin of [[graft.ops.Export.jsonlShards]], closing the
  * export → re-ingest loop (a corpus release must be consumable by the
  * same engine that produced it, the reference's `import_from_parquet`
  * discipline applied to the JSONL interchange format).
  *
  * Malformed lines never kill the job and never silently vanish:
  * PERMISSIVE mode routes them to a quarantine column, [[documents]]
  * returns only fully-parsed rows, and [[corrupt]] returns the raw
  * offending lines for audit. At 100 TB an ingest that throws on line
  * 40 billion — or drops it without a trace — is operationally useless;
  * quarantine-and-continue is the only shape that survives.
  *
  * Scale shape: the JSON scan is splittable per file and parses inside
  * the scan operator; both views are one filter over the same scan, no
  * shuffle.
  */
object Jsonl {

  /** The documents-table interchange schema ([[Tables.documents]]). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val CorruptCol = "_corrupt_record"

  /** Raw PERMISSIVE read: parsed columns plus the quarantine column
    * (null for well-formed rows). Partition columns a sharded layout
    * adds (e.g. `shard_id=N` directories) are appended by Spark after
    * the schema columns and tolerated.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType = DocumentsSchema): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Well-formed document rows only, in the canonical column order
    * (whatever extra partition columns the layout added are dropped).
    * A row is well-formed when it parsed AND carries the two columns
    * nothing downstream can work without (doc_id, text).
    */
  def documents(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col(CorruptCol).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(DocumentsSchema.fieldNames.map(col): _*)

  /** Quarantined lines: raw text of every row that failed to parse or
    * lacked doc_id/text — the audit trail an ingest run ships to its
    * operator instead of silently shrinking the corpus.
    */
  def corrupt(spark: SparkSession, path: String): DataFrame = {
    val r = read(spark, path)
    r.filter(col(CorruptCol).isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(col(CorruptCol).as("raw_line"), col("doc_id"), col("text"))
  }
}
