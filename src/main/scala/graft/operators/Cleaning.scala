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
    *
    * `positivity` mirrors the reference's post-ffill check
    * (data_cleaner.py:49 raises when any OHLCV value ≤ 0):
    *  - "keep" (default): propagate non-positive values — downstream
    *    operators guard with nullif;
    *  - "null": validate-or-null — non-positive prices become null;
    *  - "error": reference parity — the job fails on the first
    *    non-positive value (codegen'd `raise_error`, zero cost on the
    *    good-row path).
    */
  def cleanEvents(events: DataFrame, positivity: String = "keep"): DataFrame = {
    val dedup = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val ffill = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = events
      .filter(col("ts").isNotNull)
      .withColumn("rn", row_number().over(dedup))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("value", last(col("value"), ignoreNulls = true).over(ffill))
    val validated = positivity match {
      case "null" =>
        filled.withColumn("value", when(col("value") > 0, col("value")))
      case "error" =>
        filled.withColumn("value",
          when(col("value") <= 0, raise_error(concat(
            lit("non-positive value after forward-fill for user_id="),
            col("user_id").cast("string"))))
            .otherwise(col("value")))
      case _ => filled
    }
    validated.withColumn("date", to_date(col("ts")))
  }

  /** Normalize a symbol-ish string column: trim, uppercase, validity flag
    * (reference `normalize_symbols`, data_cleaner.py:147).
    */
  def normalizeSymbol(c: Column): Column = upper(trim(c))

  def isValidSymbol(c: Column): Column =
    normalizeSymbol(c).rlike("^[A-Z0-9]{3,5}$")

  /** snake_case a column name (reference `_snake_case`,
    * data_cleaner.py:172).
    */
  def snakeCase(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** Parse a financial value string (reference `_parse_financial_value`,
    * data_cleaner.py:176): "12.5%" → 0.125; Vietnamese units "1.5 tỷ" →
    * 1.5e9, "300 triệu" / "300 tr" → 3e8; plain numerics pass through;
    * unparseable → null. Commas are THOUSANDS separators and are
    * stripped ("1,250" → 1250 — and so "1,5 tỷ" → 15e9, faithfully
    * mirroring the reference's comma-strip; it does not treat the
    * comma as a Vietnamese decimal mark either). Pure Catalyst
    * (regexp + conditionals) — no UDF.
    */
  def parseFinancialValue(c: Column): Column = {
    val t = lower(trim(c))
    val digits = regexp_replace(regexp_replace(t, "[^0-9\\-,\\.]+", ""), ",", "")
    val num = when(digits.rlike("^-?(\\d+\\.?\\d*|\\.\\d+)$"), digits.cast("double"))
    val mult = when(t.contains("tỷ"), lit(1e9))
      .when(t.rlike("triệu|tr"), lit(1e6))
      .otherwise(lit(1.0))
    when(t.rlike("%$"), num / 100).otherwise(num * mult)
  }

  /** Clean a financial-statement frame (reference `clean_financial`,
    * data_cleaner.py:59): snake_case headers, parse every string column's
    * units, drop all-null rows, sort newest period first. Column renames
    * and parsing are projections — one pass, no shuffle; the sort is the
    * caller-facing presentation order.
    */
  def cleanFinancial(df: DataFrame): DataFrame = {
    val renamed = df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, snakeCase(c)))
    val parsed = renamed.schema.fields.foldLeft(renamed) { (acc, f) =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        acc.withColumn(f.name, parseFinancialValue(col(f.name)))
      else acc
    }
    val nonEmpty = parsed.na.drop("all")
    if (nonEmpty.columns.contains("year")) nonEmpty.orderBy(col("year").desc)
    else if (nonEmpty.columns.contains("period")) nonEmpty.orderBy(col("period").desc)
    else nonEmpty
  }
}
