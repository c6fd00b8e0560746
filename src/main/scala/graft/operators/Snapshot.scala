package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-grain corpus management: diff two corpus versions by
  * content identity. The incremental-curation companion of
  * [[Dedup.dedupIncremental]] — before re-running expensive curation
  * (span dedup, decontamination, quality scoring) on a refreshed
  * crawl, compute WHAT changed so the pipeline touches only the delta
  * (reference analogue: pipeline.py:90's `force_refresh` flag re-pulls
  * a full universe per run — the refresh-everything shape; at 100 TB a
  * full re-curation per snapshot is the difference between hours and
  * weeks).
  */
object Snapshot {

  /** #47v corpus_diff: per-document diff of two corpus snapshots keyed
    * by `doc_id` — `added` (new only), `removed` (old only), `changed`
    * (both, content differs), `unchanged`.
    *
    * Shape: both sides reduce to `(doc_id, xxhash64(text), length)`
    * BEFORE the join, so the full-outer join shuffles ~24-byte rows on
    * a unique key (no skew possible) — never document bytes; the
    * text comparison is 64-bit hash equality (a collision can only
    * relabel one `changed` row `unchanged`; at 10^10 same-id pairs the
    * odds are ~n·2⁻⁶⁴ ≈ 10⁻⁹). Presence is detected on the hash
    * columns, which are non-null whenever the row exists (Spark hash
    * functions fold NULL input to the seed) — so NULL-text documents
    * diff correctly: NULL vs NULL is `unchanged`, NULL vs text is
    * `changed`.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"), xxhash64(col("text")).as(s"__h_$tag"),
        length(col("text")).cast("long").as(s"n_chars_$tag"))
    side(oldDocs, "old").join(side(newDocs, "new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("n_chars_old"), lit(0L)).as("n_chars_old"),
        coalesce(col("n_chars_new"), lit(0L)).as("n_chars_new"))
  }

  /** #47w corpus_diff_stats: the one-screen rollup of [[corpusDiff]] —
    * per status, document count and total chars on each side; the
    * number a scheduler reads to decide whether the delta is worth an
    * incremental pass or the snapshot changed enough to re-curate
    * whole. One hash aggregate over diff rows (4 groups).
    */
  def diffStats(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars_old")).as("chars_old"),
      sum(col("n_chars_new")).as("chars_new"))
}
