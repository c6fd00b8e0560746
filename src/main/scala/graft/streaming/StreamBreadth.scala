package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamIndicators.Bar

/** Streaming market breadth — the live twin of `Breadth.breadthDaily`
  * (#16; reference breadth_analyzer.py:18 reads a pre-built daily
  * breadth table, extractors/breadth_extractor.py:146 builds it in
  * batch). Two chained stateful stages, the shape Structured Streaming
  * supports since multiple-stateful-operator queries landed:
  *
  *  1. per-symbol direction vs previous close — O(1) state per symbol
  *     (`flatMapGroupsWithState`), the streaming `lag(close, 1)`;
  *  2. watermarked window aggregation of direction counts — the same
  *     advancers/decliners/unchanged/breadth_percent arithmetic as the
  *     batch plan, finalized per window as the watermark passes.
  *
  * A symbol's FIRST bar has no previous close and emits no direction
  * row, matching the batch `lag`-null behavior (it falls out of all
  * three count(when …) branches).
  */
object StreamBreadth {

  /** Per-bar direction: +1 advance, −1 decline, 0 unchanged. */
  case class Dir(user_id: Long, ts: Timestamp, direction: Int)

  /** Previous-close state per symbol. */
  case class PrevClose(close: Double, lastMs: Long)

  /** The shared stateful prev-close fold behind [[directions]] and
    * [[moves]]: per symbol, sort the micro-batch, drop sub-state
    * stragglers (monotone event-time guard as in [[StreamIndicators]] —
    * a straggler older than folded state cannot be retro-fitted into an
    * already-emitted comparison chain), and emit whatever `emit` derives
    * from (previous close, current bar). One loop, two row shapes.
    */
  private def prevCloseFold[T <: Product : org.apache.spark.sql.Encoder](
      bars: Dataset[Bar])(emit: (Long, Double, Bar) => Option[T]): Dataset[T] = {
    implicit val stateEnc = Encoders.product[PrevClose]
    implicit val longEnc = Encoders.scalaLong
    bars
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Bar], state: GroupState[PrevClose]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[T]
          it.toSeq.sortBy(_.ts.getTime).foreach { b =>
            if (st == null) {
              st = PrevClose(b.close, b.ts.getTime)
            } else if (b.ts.getTime > st.lastMs) {
              emit(uid, st.close, b).foreach(out += _)
              st = PrevClose(b.close, b.ts.getTime)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Stage 1: stateful per-symbol close-over-close direction. */
  def directions(bars: Dataset[Bar]): Dataset[Dir] = {
    implicit val dirEnc = Encoders.product[Dir]
    prevCloseFold(bars) { (uid, prev, b) =>
      Some(Dir(uid, b.ts, java.lang.Double.compare(b.close, prev).sign))
    }
  }

  /** A per-bar return observation (stage-1 output for [[topMovers]]).
    * `ret_pct` is a PERCENTAGE (×100), matching the batch twin
    * `Breadth.topMovers`' return_pct unit.
    */
  case class Move(user_id: Long, ts: Timestamp, ret_pct: Double)

  /** Stage 1 variant: per-symbol close-over-close percent return (not
    * just its sign) — same fold as [[directions]]; a zero previous
    * close yields no observation (the batch plans' nullif convention).
    */
  def moves(bars: Dataset[Bar]): Dataset[Move] = {
    implicit val moveEnc = Encoders.product[Move]
    prevCloseFold(bars) { (uid, prev, b) =>
      if (prev != 0.0) Some(Move(uid, b.ts, (b.close / prev - 1) * 100))
      else None
    }
  }

  /** Live top movers — the streaming twin of `Breadth.topMovers` (#20):
    * per finalized event-time window, the k best and k worst returns.
    * The ranking runs INSIDE the windowed aggregation via the bounded
    * [[graft.functions.TopKStruct]] aggregate (a TypedImperativeAggregate,
    * so streaming state holds ≤ 2k rows per open window — the same
    * map-side truncation the batch rankers use, now as store state).
    */
  def topMovers(bars: Dataset[Bar], k: Int = 5, windowDur: String = "1 day",
                watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.TopKStruct.topk_struct
    import graft.operators.TopK.descNum
    moves(bars)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        topk_struct(struct(descNum(col("ret_pct")).as("__k0"),
          struct(col("user_id"), col("ret_pct")).as("__p")), k).as("__gain"),
        topk_struct(struct(col("ret_pct").as("__k0"),
          struct(col("user_id"), col("ret_pct")).as("__p")), k).as("__loss"))
      .select(col("window.start").as("bucket_start"),
        expr("transform(__gain, x -> x.__p)").as("gainers"),
        expr("transform(__loss, x -> x.__p)").as("losers"))
  }

  /** Stage 2: breadth counts per event-time window — advancers,
    * decliners, unchanged, total_issues, null-gated clipped
    * breadth_percent and adv_dec_ratio, identical arithmetic to the
    * batch `breadthDaily` columns. State per open window is five
    * counters; the watermark bounds how many windows stay open.
    */
  def breadth(bars: Dataset[Bar], windowDur: String = "1 day",
              watermark: String = "10 minutes"): DataFrame =
    directions(bars)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        count(when(col("direction") > 0, 1)).as("advancers"),
        count(when(col("direction") < 0, 1)).as("decliners"),
        count(when(col("direction") === 0, 1)).as("unchanged"))
      .select(col("window.start").as("bucket_start"),
        col("advancers"), col("decliners"), col("unchanged"))
      .withColumn("total_issues",
        col("advancers") + col("decliners") + col("unchanged"))
      .withColumn("breadth_percent",
        when(col("total_issues") > 0,
          least(greatest(
            (col("advancers") - col("decliners")) / col("total_issues") * 100,
            lit(-100.0)), lit(100.0))))
      .withColumn("adv_dec_ratio",
        coalesce(col("advancers") / nullif(col("decliners"), lit(0L)), lit(0.0)))
}
