package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming technical indicators — the continuous twin of the batch
  * `operators/Indicators` chain (reference technical_indicators.py:17
  * add_moving_averages, :44 add_ema), for the live path the reference
  * serves with its 60 s-cached realtime polling loop
  * (price_extractor.py:109): each finalized bar updates per-symbol
  * indicator state and emits one enriched row, instead of recomputing
  * the whole history every poll.
  *
  * Indicator recursions are order-sensitive, so this is genuine
  * `flatMapGroupsWithState` territory (not a windowed agg): EMA is a
  * fold over the bar sequence, SMA needs the trailing p closes. State
  * per symbol is O(p) doubles — #symbols × p, watermark-independent and
  * tiny; 100 TB of history never enters state, only the running
  * recursion does.
  *
  * Ordering contract: bars must advance in event time per symbol.
  * Within a micro-batch the group iterator is sorted; ACROSS batches a
  * straggler older than already-folded state cannot be retro-fitted
  * into a recursion whose later values were already emitted — it is
  * dropped by the monotone guard (`ts > lastMs`), the streaming
  * equivalent of the batch job's sort-before-fold. Feed this operator
  * from a watermarked upstream (e.g. [[WindowedAggs.ohlcvBars]]) whose
  * finalized append output is naturally time-ordered per key.
  */
object StreamIndicators {

  /** A finalized per-symbol bar (what ohlcvBars emits, close-only). */
  case class Bar(user_id: Long, ts: Timestamp, close: Double)

  /** Per-symbol recursion state: bars seen, EMA value, last folded
    * event time, trailing closes (most-recent first, ≤ p).
    */
  case class IndState(nSeen: Long, ema: Double, lastMs: Long,
                      window: List[Double])

  /** One enriched bar: SMA/EMA null (None) until their min_periods —
    * p and span observations respectively — matching the batch
    * operators and pandas `rolling(p, min_periods=p)` /
    * `ewm(span, adjust=False)`.
    */
  case class IndRow(user_id: Long, ts: Timestamp, close: Double,
                    sma: Option[Double], ema: Option[Double])

  /** Streaming SMA(p) + EMA(span) per symbol, append mode. EMA seeds at
    * the first bar and folds αx + (1−α)prev with α = 2/(span+1) — the
    * identical recursion (same operation order, bit-identical doubles)
    * as the batch `emaFoldSql`.
    */
  def smaEma(bars: Dataset[Bar], p: Int = 5, span: Int = 5): Dataset[IndRow] = {
    val alpha = 2.0 / (span + 1)
    implicit val rowEnc = Encoders.product[IndRow]
    implicit val stateEnc = Encoders.product[IndState]
    implicit val longEnc = Encoders.scalaLong
    bars
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Bar], state: GroupState[IndState]) =>
          var st = state.getOption.getOrElse(IndState(0L, 0.0, Long.MinValue, Nil))
          val out = Seq.newBuilder[IndRow]
          it.toSeq.sortBy(_.ts.getTime).foreach { b =>
            if (b.ts.getTime > st.lastMs) {
              val n = st.nSeen + 1
              val ema = if (st.nSeen == 0L) b.close
                        else alpha * b.close + (1 - alpha) * st.ema
              val win = (b.close :: st.window).take(p)
              st = IndState(n, ema, b.ts.getTime, win)
              out += IndRow(uid, b.ts, b.close,
                if (n >= p) Some(win.sum / p) else None,
                if (n >= span) Some(ema) else None)
            }
          }
          if (st.nSeen > 0L) state.update(st)
          out.result().iterator
      }
  }
}
