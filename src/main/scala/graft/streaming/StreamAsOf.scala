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

  /** Latest right event per key + the newest event time folded so far. */
  case class LatestRight(ts: Long, value: Double, lastMs: Long)

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
    */
  def enrich(tagged: Dataset[Tagged]): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[LatestRight]
    implicit val longEnc = Encoders.scalaLong
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Tagged], state: GroupState[LatestRight]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Enriched]
          // Event-time order with rights before lefts on ties, so an
          // equal-timestamp quote is visible to its trade.
          it.toSeq.sortBy(e => (e.ts.getTime, e.side)).foreach { e =>
            val lastMs = if (st == null) Long.MinValue else st.lastMs
            if (e.side == 0) {
              // A right straggler older than the newest folded event
              // cannot be retro-matched to already-emitted lefts; it
              // may only replace state if it is newer than the held
              // right row (which it is, when it passed the guard).
              if (e.ts.getTime >= lastMs)
                st = LatestRight(e.ts.getTime, e.value,
                  math.max(e.ts.getTime, lastMs))
            } else if (e.ts.getTime >= lastMs) {
              // st.ts == Long.MinValue is the no-right-seen sentinel
              // (left events also advance lastMs through the state row).
              val matched = st != null && st.ts != Long.MinValue &&
                st.ts <= e.ts.getTime
              out += Enriched(uid, e.ts, e.value,
                if (matched) Some(new Timestamp(st.ts)) else None,
                if (matched) Some(st.value) else None)
              if (st == null) st = LatestRight(Long.MinValue, 0.0, e.ts.getTime)
              else st = st.copy(lastMs = math.max(st.lastMs, e.ts.getTime))
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
