package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key data-quality report — the Spark re-expression of the
  * reference's `Pipeline.validate_data_quality`
  * (/root/reference/src/pipeline.py:377): per symbol it counts missing
  * business days, duplicate timestamps, non-positive prices and zero/null
  * values, reports freshness, and scores `max(0, 100 − 10·issues)`.
  *
  * Differences from the reference, by design:
  *  - the reference loads ONE symbol's parquet per call and loops;
  *    this runs every key in one distributed pass (one groupBy shuffle);
  *  - the expected trading-day window is derived from the corpus span
  *    (global min/max date) instead of a config file — same check, no
  *    config dependency; the window is a 1-row broadcast, never a
  *    second scan of the feed.
  *
  * Scale: one map-side-combinable aggregate over the feed + a broadcast
  * of the 1-row global frame. No windows, no per-key loops; the
  * business-day sequence materializes once on the global row (years of
  * days = thousands of elements, driver-trivial).
  */
object Quality {

  def dataQuality(events: DataFrame): DataFrame = {
    val e = events.filter(col("ts").isNotNull)
      .withColumn("date", to_date(col("ts")))
    // Mon–Fri count over the corpus span: Spark dayofweek is 1=Sunday,
    // 7=Saturday — exclude both ends.
    val global = e.agg(min(col("date")).as("g_min"), max(col("date")).as("g_max"))
      .withColumn("expected_days",
        size(filter(sequence(col("g_min"), col("g_max")),
          d => !dayofweek(d).isin(1, 7))).cast("long"))
    val per = e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("date")).as("n_days"),
      (count(lit(1)) - countDistinct(col("ts"))).as("n_dup_ts"),
      count(when(col("value").isNull, 1)).as("n_null_value"),
      count(when(col("value") <= 0, 1)).as("n_nonpos_value"),
      max(col("ts")).as("last_ts"),
      max(col("date")).as("last_date"))
    per.crossJoin(broadcast(global))
      .withColumn("n_missing_days",
        greatest(lit(0L), col("expected_days") - col("n_days")))
      .withColumn("days_stale",
        datediff(col("g_max"), col("last_date")).cast("long"))
      .withColumn("n_issues",
        ((col("n_missing_days") > 0).cast("long")
          + (col("n_dup_ts") > 0).cast("long")
          + (col("n_nonpos_value") > 0).cast("long")
          + (col("n_null_value") > 0).cast("long")))
      .withColumn("quality_score",
        greatest(lit(0L), lit(100L) - lit(10L) * col("n_issues")))
      .select(col("user_id"), col("n_rows"), col("n_days"), col("expected_days"),
        col("n_missing_days"), col("n_dup_ts"), col("n_null_value"),
        col("n_nonpos_value"), col("last_ts"), col("days_stale"),
        col("n_issues"), col("quality_score"))
  }
}
