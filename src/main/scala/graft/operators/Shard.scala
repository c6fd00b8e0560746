package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing for training-data export: assign each
  * document (in doc_id order) to the shard whose running token total it
  * falls in — the layout step that turns a curated corpus into
  * fixed-size training shards.
  *
  * Scale design: a running total over a global ORDER BY is the textbook
  * way to collapse a job to one task (`Window.orderBy` with no
  * partitionBy = Exchange SinglePartition over the full corpus). This
  * implementation is the two-phase distributed prefix sum instead:
  *
  *  1. range-partition by doc_id (contiguous, ordered ranges),
  *  2. per-partition running totals — a window PARTITIONED by the range
  *     id, so every task sums only its own slice,
  *  3. per-partition totals (one row per range) prefix-summed into
  *     exclusive offsets — the only single-partition window runs over
  *     ≤ `parts` metadata rows, never corpus rows,
  *  4. offsets broadcast back; global running total = offset + local.
  *
  * The result is partitioning-invariant: any contiguous ordered ranges
  * give the same global totals, so range-boundary sampling does not
  * affect values. Per-partition work is bounded by the range size; the
  * driver never sees a row.
  */
object Shard {

  /** doc_id → (n_tokens, cum_tokens, shard_id) with shards cut every
    * `budgetTokens` whitespace tokens (a document lands in the shard its
    * PRECEDING running total falls in, so documents are never split).
    * Token convention matches `token_count`'s ws_tokens.
    */
  /** (doc_id, n_tokens, cum_tokens) — the two-phase global running
    * total documented above, shared by [[shardPack]] and
    * [[sequencePack]].
    */
  private def withGlobalCum(documents: DataFrame, parts: Int,
                            orderKey: Option[Column] = None): DataFrame =
    // Null text folds to '' (the ADVICE-r6 row-membership rule every
    // text op honors): without the coalesce a null-text doc gets null
    // n_tokens, sequence() returns null, explode DROPS the doc from
    // the manifest and shardPack emits a null shard_id row — both
    // violating the "nothing dropped" contract. '' counts as one
    // (empty) ws token, matching token_count's ws_tokens convention.
    globalCum(documents.select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), "\\s+"))
        .cast("bigint").as("n_tokens")),
      parts, orderKey)

  /** The two-phase prefix sum over an arbitrary (doc_id, n_tokens)
    * frame — [[withGlobalCum]] for callers that count something other
    * than whitespace tokens (e.g. [[Bpe.packedSequences]]' BPE counts).
    */
  private[operators] def globalCum(toks0: DataFrame, parts: Int,
                                   orderKey: Option[Column] = None): DataFrame = {
    // Optional ordering key ahead of doc_id (doc_id stays the
    // tie-break, so the total order is always strict).
    val toks = orderKey.fold(toks0)(k => toks0.withColumn("__k", k))
    val sortCols = if (orderKey.isDefined) Seq(col("__k"), col("doc_id"))
                   else Seq(col("doc_id"))
    val ranged = toks.repartitionByRange(parts, sortCols: _*)
      .withColumn("pid", spark_partition_id())
    val byPid = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
    val local = ranged.withColumn("local_cum", sum(col("n_tokens")).over(byPid))
    // Exclusive prefix offsets over the per-range totals: ≤ `parts` rows,
    // so the unpartitioned window is metadata-sized by construction.
    val offsets = ranged.groupBy(col("pid")).agg(sum(col("n_tokens")).as("ptot"))
      .withColumn("offset", coalesce(
        sum(col("ptot")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_tokens", (col("offset") + col("local_cum")).cast("bigint"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }

  /** doc_id → (n_tokens, cum_tokens, shard_id) with shards cut every
    * `budgetTokens` whitespace tokens (a document lands in the shard its
    * PRECEDING running total falls in, so documents are never split).
    * Token convention matches `token_count`'s ws_tokens.
    */
  def shardPack(documents: DataFrame, budgetTokens: Long = 2000L,
                parts: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    withGlobalCum(documents, parts)
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / budgetTokens)
          .cast("bigint"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("shard_id"))
  }

  /** #47z sequence_pack: the TRAINER-grain layout — pack the doc_id
    * stream into fixed `seqLen`-token training sequences, SPLITTING
    * documents across sequence boundaries ([[shardPack]] keeps docs
    * whole per shard; a trainer's data loader wants dense fixed-length
    * rows with nothing dropped). Emits the packing manifest: one row
    * per (document, sequence) overlap with the doc-relative token
    * slice [tok_start, tok_end) that sequence consumes — every
    * sequence except the corpus tail is exactly full by construction
    * (spec-asserted), and concatenating each doc's slices in seq order
    * reconstructs the doc exactly.
    *
    * Scale shape: the same two-phase prefix sum (no corpus-wide
    * single-partition window), then a per-doc `sequence()` explode
    * bounded by n_tokens/seqLen + 2 rows — output is corpus positions
    * over seqLen, the manifest a loader shards by seq_id range.
    */
  def sequencePack(documents: DataFrame, seqLen: Long = 512L,
                   parts: Int = 32, shuffled: Boolean = false): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // shuffled packs the DERANDOMIZED-shuffle doc order (xxhash64 of
    // doc_id, doc_id tie-break) instead of doc_id order: adjacent docs
    // in a crawl are correlated (same source/site/day), and packing
    // them into the same training sequence concentrates that
    // correlation — hash order decorrelates deterministically, stays
    // partition-invariant, and reproduces bit-identically run to run.
    // doc_id order stays the default (and the oracle row): it is the
    // inspectable layout, and a loader can always shuffle sequences.
    val key = if (shuffled) Some(xxhash64(col("doc_id"))) else None
    withGlobalCum(documents, parts, key)
      // A zero-token doc occupies no slice of the packed stream — and
      // its sequence(start, start-1) would be DESCENDING (sequence()
      // auto-steps -1), emitting two phantom manifest rows. The ws
      // front never yields 0 (split('') = ['']), but globalCum callers
      // with real token counts do (Bpe.packedSequences guards the same
      // way, Bpe.scala).
      .filter(col("n_tokens") > 0)
      .withColumn("__o", col("cum_tokens") - col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        floor(col("__o").cast("double") / seqLen).cast("bigint"),
        floor((col("cum_tokens") - 1).cast("double") / seqLen).cast("bigint"))))
      .select(col("doc_id"), col("seq_id"),
        greatest(lit(0L), col("seq_id") * seqLen - col("__o")).as("tok_start"),
        least(col("n_tokens"), (col("seq_id") + lit(1L)) * seqLen - col("__o"))
          .as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }
}
