package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-Spark quality-classifier FIT (#45d's missing training half) —
  * the CCNet/RefinedWeb-style distributed fit of the hashed
  * bag-of-words linear gate every web-corpus curation pipeline runs.
  * [[TextSignals.qualityClassifierWeighted]] consumes a trained
  * (bucket, weight_int) artifact; this operator produces one, from
  * inside the engine, on a deterministic weak-label seed (the Gopher
  * rule-battery verdicts — the [[TextSignals.qualityCalibration]] read
  * already cross-grades the two) or on any caller-supplied
  * (doc_id, label) frame (e.g. human-curated seed data).
  *
  * Reference anchor: the reference's quality scoring is a fixed
  * heuristic battery (`src/quality.py`-style thresholds); the trained
  * gate is the beyond-reference curation component VERDICT r8 ranked
  * first.
  *
  * The fit, chosen so every step is EXACT INTEGER arithmetic (the
  * kmeans #43f micro-unit precedent — bit-deterministic under
  * repartitioning and replayable round-for-round by the DuckDB
  * oracle):
  *
  *  - Features: token occurrences hashed into `buckets` slots
  *    ([[TextSignals.h32]] % buckets — the exact feature space the
  *    scorer folds), per-doc counts.
  *  - Round 0 (closed form, naive-Bayes-flavored): per bucket the
  *    add-one-smoothed positive-occurrence rate in micro-units,
  *    centered at 0 —
  *    `w0 = round_half_up(10^6 · (pos+1)/(tot+2)) − 500000`,
  *    computed as `(2·10^6·(pos+1) + (tot+2)) div (2·(tot+2)) −
  *    500000` in BIGINT (no float division anywhere).
  *  - Rounds 1..R (batch perceptron): score every doc with the current
  *    weights (`Σ cnt·w`, BIGINT), predict `score ≥ 0`, and for each
  *    misclassified doc push every one of its buckets by
  *    `(2·label−1) · cnt · lrMicro`. Updates fold as map-side
  *    combinable integer sums — order-independent, hence
  *    partitioning-invariant.
  *
  * Output is the full WEIGHT LADDER — one row per (round, bucket) for
  * every bucket present in the labeled corpus, rounds 0..R — so the
  * oracle checks the weights round-for-round, not just final scores
  * (the bpe_vocab #47y2 pattern for iterative fits).
  *
  * Scale shape: the corpus-sized work is ONE feature extraction
  * (explode + count, map-side combinable), localCheckpointed because
  * 2R+1 downstream aggregates consume it (the ReuseProbe rule). Each
  * round is two scans of that (doc_id, bucket, cnt, label) frame —
  * far narrower than text — with the current weights joined BROADCAST
  * (≤ `buckets` rows by contract). Weights live on the driver between
  * rounds: a bounded model artifact (the quantizer-fit collect
  * policy), never corpus rows. 100 TB cost = R+1 passes over the
  * hashed-feature frame.
  */
object Classifier {

  /** Default hyper-parameters — shared by the query row, the oracle
    * generator and the specs so the three can never drift.
    */
  val DefaultBuckets = 4096
  val DefaultRounds = 2
  val DefaultLrMicro = 100000L

  /** Fit the ladder on caller-supplied labels. `labels`: (doc_id,
    * label) with label ∈ {0, 1}. Docs without a label row (or with no
    * tokens) contribute nothing to the fit — a token-less doc scores 0
    * in any linear model and cannot move a weight. Returns (round,
    * bucket, weight_int), rounds 0..`rounds`, for every bucket
    * occurring in the labeled corpus (absent buckets are implicitly 0:
    * round 0's formula gives `(2·10^6+2) div 4 − 500000 = 0` for
    * pos=tot=0, matching [[TextSignals.qualityClassifierWeighted]]'s
    * missing-bucket-weighs-0 rule).
    */
  def trainQualityClassifier(documents: DataFrame, labels: DataFrame,
                             buckets: Int = DefaultBuckets,
                             rounds: Int = DefaultRounds,
                             lrMicro: Long = DefaultLrMicro): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(rounds >= 0, "rounds must be >= 0")
    val spark = documents.sparkSession
    import spark.implicits._
    val lab = labels.select(col("doc_id"), col("label").cast("int").as("__y"))
    // The one corpus-sized pass: hashed-feature counts per (doc,
    // bucket), labels joined on. Checkpointed — the init aggregate and
    // every round's score + delta aggregates all re-read it.
    val feat = documents
      .select(col("doc_id"),
        explode(TextSignals.tokensCol(col("text"))).as("__tok"))
      .select(col("doc_id"),
        (TextSignals.h32(col("__tok")) % lit(buckets.toLong)).as("__b"))
      .groupBy(col("doc_id"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .join(lab, Seq("doc_id"))
      .transform(graft.Ckpt.frame)
    // Round 0: the closed-form smoothed-rate init, pure BIGINT.
    val w0 = feat.groupBy(col("__b")).agg(
        sum(when(col("__y") === 1, col("__cnt")).otherwise(lit(0L))).as("__pos"),
        sum(col("__cnt")).as("__tot"))
      .withColumn("__num",
        lit(2000000L) * (col("__pos") + lit(1L)) + (col("__tot") + lit(2L)))
      .withColumn("__den", lit(2L) * (col("__tot") + lit(2L)))
      .select(col("__b"), (expr("__num div __den") - lit(500000L)).as("__w"))
    // Bounded model artifact (≤ buckets rows) — the quantizer-fit
    // collect policy, never corpus rows.
    var w: Map[Long, Long] =
      w0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ladder = Seq.newBuilder[(Int, Long, Long)]
    w.foreach { case (b, wt) => ladder += ((0, b, wt)) }
    for (r <- 1 to rounds) {
      val wDf = broadcast(w.toSeq.toDF("__b", "__w"))
      // Misclassified docs this round: err = 2·label − 1 ∈ {−1, +1}.
      val errs = feat.join(wDf, Seq("__b"), "left")
        .groupBy(col("doc_id"), col("__y"))
        .agg(sum(col("__cnt") * coalesce(col("__w"), lit(0L))).as("__sc"))
        .filter((col("__sc") >= 0).cast("int") =!= col("__y"))
        .select(col("doc_id"), (col("__y") * 2 - 1).cast("long").as("__e"))
      val delta = feat.join(errs, Seq("doc_id"))
        .groupBy(col("__b"))
        .agg((sum(col("__e") * col("__cnt")) * lit(lrMicro)).as("__dw"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      w = w.map { case (b, wt) => b -> (wt + delta.getOrElse(b, 0L)) }
      w.foreach { case (b, wt) => ladder += ((r, b, wt)) }
    }
    ladder.result().toDF("round", "bucket", "weight_int")
  }

  /** The weak-label seed fit: labels = the Gopher rule battery's keep
    * verdicts ([[TextSignals.withGopher]]) — the deterministic
    * bootstrap every heuristics-to-classifier distillation starts
    * from (train a cheap linear gate to generalize the rule battery,
    * then gate with the model where the rules are too blunt).
    */
  def trainOnGopher(documents: DataFrame,
                    buckets: Int = DefaultBuckets,
                    rounds: Int = DefaultRounds,
                    lrMicro: Long = DefaultLrMicro): DataFrame =
    trainQualityClassifier(documents,
      TextSignals.withGopher(documents)
        .select(col("doc_id"), col("gopher_keep").cast("int").as("label")),
      buckets, rounds, lrMicro)

  /** Final-round weights in [[TextSignals.qualityClassifierWeighted]]'s
    * artifact schema: (bucket, weight_int).
    */
  def finalWeights(ladder: DataFrame, rounds: Int = DefaultRounds): DataFrame =
    ladder.filter(col("round") === rounds)
      .select(col("bucket"), col("weight_int"))

  /** Gopher-trained weights end-to-end — the artifact the scored query
    * row and the [[graft.CorpusPipeline]] trained gate consume.
    */
  def gopherTrainedWeights(documents: DataFrame,
                           buckets: Int = DefaultBuckets,
                           rounds: Int = DefaultRounds,
                           lrMicro: Long = DefaultLrMicro): DataFrame =
    finalWeights(trainOnGopher(documents, buckets, rounds, lrMicro), rounds)

  /** A (bucket, weight_int) artifact as the dense bucket-indexed array
    * [[TextSignals.classifierKeepColWeighted]] embeds — absent buckets
    * weigh 0, the scorer's missing-bucket rule. Bounded collect
    * (`buckets` entries by contract).
    */
  def denseWeights(weights: DataFrame, buckets: Int = DefaultBuckets): Array[Long] = {
    val arr = Array.fill(buckets)(0L)
    weights
      .select(col("bucket").cast("int").as("b"),
        col("weight_int").cast("long").as("w"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < buckets,
          s"weight bucket $b outside [0, $buckets) — artifact/bucket-count mismatch")
        arr(b) = r.getLong(1)
      }
    arr
  }
}
