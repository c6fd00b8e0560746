package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Dataset export — Spark re-expression of the reference's
  * `DataExporter` (/root/reference/src/utils/data_exporter.py): parquet/
  * csv snapshot writes with partition layout and overwrite-by-snapshot
  * semantics.
  *
  * The reference writes one pandas file per symbol per day; here a write
  * is one distributed job, with directory partitioning carrying the
  * (date, symbol) layout and parquet stats enabling pruned reads back.
  */
object Export {

  /** Partitioned parquet snapshot. `partitionBy` date-ish columns keeps
    * downstream scans prunable; coalesce caps small-file count for
    * day-grain outputs.
    */
  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
              maxFiles: Int = 0): Unit = {
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    val w = out.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** CSV export with header (for the reference's spreadsheet outputs). */
  def csv(df: DataFrame, path: String, maxFiles: Int = 1): Unit =
    df.coalesce(maxFiles).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** Versioned snapshot path (the reference suffixes files with a date
    * stamp; here the stamp is a directory level so readers can pin or
    * `latest` by lexical max).
    */
  def snapshotPath(base: String, stamp: String): String = s"$base/snapshot=$stamp"

  /** Training-corpus release: token-budget shards as directory-
    * partitioned JSON-lines — the wire format corpus snapshots ship in.
    * [[graft.operators.Shard.shardPack]] assigns `shard_id` by a global
    * running token total (two-phase prefix sum, no corpus-wide window);
    * `partitionBy(shard_id)` turns each budget bucket into its own
    * directory so a trainer streams shard-by-shard without a planner.
    * One `repartition(shard_id)` before the write: without it every
    * task holds a sliver of every shard and the sink fans out
    * tasks × shards small files; with it each shard is one writer task
    * → one file, which is exactly the shard-sized object a data loader
    * wants.
    */
  def jsonlShards(documents: DataFrame, path: String,
                  budgetTokens: Long = 2000L): Unit = {
    import org.apache.spark.sql.functions.col
    val packed = graft.operators.Shard.shardPack(documents, budgetTokens)
      .select(col("doc_id"), col("shard_id"))
    documents.join(packed, Seq("doc_id"))
      .repartition(col("shard_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard_id").json(path)
  }

  /** Read-back validation report — see [[validateRoundTrip]]. */
  final case class RoundTrip(path: String, sourceRows: Long, readRows: Long,
                             issues: Seq[String]) {
    def ok: Boolean = issues.isEmpty
  }

  /** Read-back validation twin of a snapshot write — the engine
    * counterpart of the reference's `import_from_parquet`
    * (data_exporter.py:168), which re-opens what was exported and
    * checks the columns it expects. Here the check is against the
    * SOURCE frame: every source column must come back with the same
    * type (by name — a partitionBy write reorders columns, which is
    * layout, not loss; partition-value type inference rewriting a
    * column's type IS reported, that's exactly the silent corruption
    * this catches), no extra columns appear, and row counts match.
    * For JSON (the jsonl shard format) types are lossy by design, so
    * only column presence and row count are checked. A write that ADDS
    * columns the source lacks — [[jsonlShards]]' `shard_id` partition
    * column — declares them via `addedCols` so they don't read as
    * corruption. Returns a report rather than throwing — a daily
    * pipeline wants to notify-and-continue per stage
    * ([[graft.Pipeline.withRetries]] wraps the write; this validates
    * it landed whole).
    */
  def validateRoundTrip(spark: SparkSession, source: DataFrame, path: String,
                        format: String = "parquet",
                        addedCols: Set[String] = Set.empty): RoundTrip = {
    val back = format match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    val src = source.schema.fields.map(f => f.name -> f.dataType).toMap
    val dst = back.schema.fields.map(f => f.name -> f.dataType).toMap
    val typed = format == "parquet"
    val issues =
      (src.keySet -- dst.keySet).toSeq.sorted.map(c => s"missing column: $c") ++
      (dst.keySet -- src.keySet -- addedCols).toSeq.sorted
        .map(c => s"unexpected column: $c") ++
      (if (typed)
        (src.keySet & dst.keySet).toSeq.sorted.collect {
          case c if src(c) != dst(c) =>
            s"type changed: $c ${src(c).simpleString} -> ${dst(c).simpleString}"
        }
      else Seq.empty)
    val (srcRows, dstRows) = (source.count(), back.count())
    val rowIssue = if (srcRows == dstRows) Seq.empty
                   else Seq(s"row count: wrote $srcRows, read back $dstRows")
    RoundTrip(path, srcRows, dstRows, issues ++ rowIssue)
  }

  /** Bucketed managed table: pre-shuffles once at write so every later
    * join/aggregation on `bucketCols` is exchange-free (co-located).
    * The 100 TB pattern for a fact table joined on the same key by many
    * downstream queries — pay the shuffle once, reuse it forever.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }
}
