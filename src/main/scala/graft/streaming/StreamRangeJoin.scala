package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch range join
  * ([[graft.operators.Analytics.rangeJoin]] #31d): live attribution —
  * every purchase event joins the same user's click events in the
  * preceding half-open window [t − W, t), as the events arrive.
  *
  * Unlike the as-of family (one latest match → custom single-row
  * state, [[StreamAsOf]]), the range join wants EVERY pair in the
  * interval — exactly what Spark's built-in watermarked stream-stream
  * inner join with an event-time range condition provides, so this is
  * deliberately a thin declaration over the native operator rather
  * than a hand-rolled stateful stage (the design brief's preference
  * order: compose built-ins first).
  *
  * Scale/state story: the range predicate itself is what bounds the
  * state — from `left_ts >= right_ts − W` Spark derives that a
  * buffered click is unmatchable once the purchase-side watermark
  * passes `click_ts + W` (and a buffered purchase once the click side
  * passes its ts), so per-side state is events-per-(watermark+window)
  * horizon × active keys, independent of stream length. The batch twin
  * bins the time axis because an offline equi shuffle needs a finite
  * key; the stream derives the same bound from time itself. Inner
  * join ⇒ rows emit as they match, no watermark wait.
  *
  * Emits one row per (purchase, click) pair with the batch twin's
  * schema: (user_id, right_id, right_ts, left_id, left_ts, lag_us) —
  * spec-pinned pair-for-pair equal to `Analytics.rangeJoin` on the
  * same events.
  */
object StreamRangeJoin {

  def attribution(clicks: DataFrame, purchases: DataFrame,
                  windowSec: Long = graft.operators.Analytics.DefaultRangeWindowSec,
                  watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowSec > 0 &&
        windowSec <= graft.operators.Analytics.MaxRangeWindowSec,
      s"StreamRangeJoin: windowSec must be in (0, " +
        s"${graft.operators.Analytics.MaxRangeWindowSec}] (the batch " +
        s"twin's overflow-safe bound), got $windowSec")
    val l = clicks
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", watermarkDelay)
    val r = purchases
      .select(col("user_id").as("__r_user"), col("event_id").as("right_id"),
        col("ts").as("right_ts"))
      .withWatermark("right_ts", watermarkDelay)
    l.join(r,
        col("user_id") === col("__r_user") &&
          col("left_ts") >= col("right_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
          col("left_ts") < col("right_ts"))
      .select(col("user_id"), col("right_id"), col("right_ts"),
        col("left_id"), col("left_ts"),
        (unix_micros(col("right_ts")) - unix_micros(col("left_ts"))).as("lag_us"))
  }
}
