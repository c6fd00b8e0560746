package graft.operators

import org.apache.spark.sql.DataFrame
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
}
