package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the live tier of the as-of join family
  * (batch composed `Analytics.asofJoin`, batch native `plans.AsOf`):
  * enrich a left event stream (trades) with the LATEST right event
  * (quote) at or before each left event's time, per key.
  *
  * Both streams union into one keyed stateful stage (the tagged-union
  * pattern): per key the state is ONE row — the latest right event —
  * so state size is O(#keys), independent of stream length and
  * watermark horizon. Within a micro-batch events fold in event-time
  * order (ties: right before left, so an equal-timestamp quote matches
  * its trade — the batch forms' inclusive convention); across batches
  * the monotone guard drops sub-state stragglers exactly like
  * [[StreamIndicators]].
  *
  * This is deliberately NOT Spark's built-in stream-stream interval
  * join: that buffers BOTH sides over the watermark horizon and emits
  * every pair in the interval; as-of wants exactly one match — the
  * latest — which the single-row state gives directly.
  */
object StreamAsOf {

  /** A tagged event: side 0 = right (quote, the reference stream),
    * side 1 = left (trade, the enriched stream).
    */
  case class Tagged(user_id: Long, ts: Timestamp, side: Int, value: Double)

  /** Latest right event per key; `tsUs` in MICROSECONDS since epoch —
    * events carry µs timestamps, and a ms-grain fold would both order
    * same-millisecond events wrongly and truncate the emitted
    * `asof_ts` (the exact defect class the stream_sessionize driver
    * row caught in the sessionizer: ms-vs-µs truncation).
    *
    * STATE-FORMAT BREAK (v1 → v2, r10): v1 stored milliseconds in a
    * field named `ts`; v2 stores microseconds in `tsUs`. The rename is
    * deliberate and load-bearing — Spark's state-store schema
    * validation compares field NAMES, so a streaming query restarted
    * from a v1 checkpoint fails loudly at start instead of silently
    * reinterpreting stored ms values as µs (which would make every
    * held quote look ~1000× older than it is while still matching).
    * Do not rename `tsUs` back or alias it to `ts` without a state
    * migration; a future unit change must change the field name again
    * for the same reason.
    */
  case class LatestRight(tsUs: Long, value: Double)

  /** One enriched left event: the matched right event's time/value, or
    * None when no right event preceded it.
    */
  case class Enriched(user_id: Long, ts: Timestamp, value: Double,
                      asof_ts: Option[Timestamp], asof_value: Option[Double])

  def tag(left: Dataset[(Long, Timestamp, Double)],
          right: Dataset[(Long, Timestamp, Double)]): Dataset[Tagged] = {
    implicit val enc = Encoders.product[Tagged]
    val l = left.map { case (u, t, v) => Tagged(u, t, 1, v) }
    val r = right.map { case (u, t, v) => Tagged(u, t, 0, v) }
    l.unionByName(r)
  }

  /** Enrich the side-1 events of a tagged union with the latest side-0
    * event at or before them, per key.
    *
    * Cross-batch disorder policy (round 6, closing two ADVICE findings):
    * a right straggler replaces state iff it is newer than the HELD
    * right row — how trades interleaved is irrelevant to which quote is
    * freshest — so a late-but-fresher quote is never discarded. EVERY
    * left event emits exactly one enriched row (the batch twins enrich
    * every row; dropping late trades was silent data loss): an on-time
    * left matches the held right exactly; a left older than the held
    * right cannot be matched retroactively from one-row state and emits
    * unmatched — correct-or-stale, never a fabricated future quote.
    *
    * `idleTimeout`: optional event-time expiry for keys idle past the
    * watermark horizon (the [[Sessionize]] pattern) — without it, state
    * for a churning key space grows without bound. Requires a
    * `withWatermark` on the tagged stream; the per-key deadline re-arms
    * at (newest folded event + idleTimeout).
    */
  def enrich(tagged: Dataset[Tagged],
             idleTimeout: Option[java.time.Duration] = None): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[LatestRight]
    implicit val longEnc = Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Tagged], state: GroupState[LatestRight]) =>
          if (state.hasTimedOut) {
            // Idle past the horizon: drop the held row. A later event for
            // this key starts from empty state (trades unmatched until a
            // fresh quote arrives) — the documented expiry semantics.
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.orNull
            val out = Seq.newBuilder[Enriched]
            var maxMs = Long.MinValue
            // Event-time order at µs grain ([[Sessionize.usOf]] — the
            // fold must see the precision the events carry) with rights
            // before lefts on ties, so an equal-timestamp quote is
            // visible to its trade.
            it.toSeq.sortBy(e => (Sessionize.usOf(e.ts), e.side)).foreach { e =>
              val us = Sessionize.usOf(e.ts)
              maxMs = math.max(maxMs, e.ts.getTime)
              if (e.side == 0) {
                if (st == null || us >= st.tsUs)
                  st = LatestRight(us, e.value)
              } else {
                val matched = st != null && st.tsUs <= us
                out += Enriched(uid, e.ts, e.value,
                  if (matched) Some(Sessionize.tsOfUs(st.tsUs)) else None,
                  if (matched) Some(st.value) else None)
              }
            }
            if (st != null) {
              state.update(st)
              // Timers attach to defined state only (no held row means
              // nothing to expire). The deadline anchors on the newest
              // of: this batch's events, the HELD row (a batch of only
              // late stragglers must never shorten a deadline the held
              // row already armed), and the watermark (a deadline at or
              // below it would have already fired). Timer grain is ms
              // (setTimeoutTimestamp's unit); µs state floors onto it.
              idleTimeout.foreach { d =>
                state.setTimeoutTimestamp(
                  math.max(math.max(maxMs, st.tsUs / 1000L),
                    state.getCurrentWatermarkMs()) + d.toMillis)
              }
            }
            out.result().iterator
          }
      }
  }
}
