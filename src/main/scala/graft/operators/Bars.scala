package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tick → OHLCV bar resampling.
  *
  * The reference consumes pre-built OHLCV from its market-data API
  * (/root/reference/src/extractors/price_extractor.py); at 100 TB the
  * engine has to build bars from the raw tick feed itself. This is a
  * single hash aggregation on (key, day): min/max/min_by/max_by/count/avg
  * all combine map-side, so the exchange carries one row per (key, day)
  * — bar grain, not tick grain.
  */
object Bars {

  /** Daily OHLCV bars from a (user_id, ts, value) feed.
    * open/close = value at first/last tick (min_by/max_by on ts; ts is
    * unique per key after [[Cleaning.cleanEvents]]).
    * volume = tick count, vwap = mean tick value.
    */
  def daily(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), to_date(col("ts")).as("date"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("volume"),
        avg(col("value")).as("vwap"))

  /** Arbitrary-interval OHLCV resample (the reference's resolution /
    * interval parameter on its extractors — "1 hour", "15 minutes", …):
    * same single hash aggregation, keyed on the event-time bucket start.
    * This is also the batch twin of streaming.WindowedAggs' tumbling
    * window.
    */
  def resample(events: DataFrame, interval: String): DataFrame =
    events
      .groupBy(col("user_id"), window(col("ts"), interval))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("volume"),
        avg(col("value")).as("vwap"))
      .select(col("user_id"), col("window.start").as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("vwap"))

  /** realtime_snapshot (price_extractor.py:109 `get_realtime`, record
    * shape at :147-154; tz normalization per `_validate_and_clean`:97-101):
    * the reference polls its quote API per symbol (≤50 at a time, cached
    * 60 s) into a board of {symbol, price, change, pct_change, volume,
    * time}; the engine derives the same board from the tick feed itself —
    * last tick value/time per user, last-day volume and previous-day
    * close from the daily bars. Both inputs aggregate to user grain
    * before joining, so the join carries one row per symbol and the
    * symbol-count cap becomes irrelevant. Quote time is normalized to
    * the exchange timezone (`from_utc_timestamp` — the tz_convert the
    * reference applies to every quote frame).
    */
  def realtimeSnapshot(cleanEvents: DataFrame,
                       tz: String = "Asia/Ho_Chi_Minh"): DataFrame = {
    // One (user, day) aggregate carrying close + last tick time + count
    // — the last day's close IS the last tick value, so the board needs
    // no second tick-grain scan and no join; the trailing window runs on
    // day-grain rows only.
    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("date").desc)
    cleanEvents
      .groupBy(col("user_id"), col("date"))
      .agg(
        max_by(col("value"), col("ts")).as("close"),
        max(col("ts")).as("ts_last"),
        count(lit(1)).as("volume"))
      .withColumn("prev_close", lead(col("close"), 1).over(wDesc))
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("close").as("price"),
        (col("close") - col("prev_close")).as("change"),
        when(col("prev_close") =!= 0.0,
          (col("close") / col("prev_close") - lit(1.0)) * 100).as("pct_change"),
        col("volume"),
        from_utc_timestamp(col("ts_last"), tz).as("time_local"))
  }
}
