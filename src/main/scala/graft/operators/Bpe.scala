package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * tokenizer-fitting stage of a training-data pipeline, Spark-first.
  *
  * BPE trains on the WORD-FREQUENCY table, not corpus positions: the
  * only corpus-scale pass is one word count (a single map-side-
  * combinable shuffle); every merge round then works on a vocabulary-
  * sized frame — at 100 TB the vocabulary is millions of rows where the
  * corpus is trillions, so rounds cost vocab-scans, not corpus-scans.
  * Each round: count adjacent symbol pairs weighted by word frequency,
  * pick the max on the driver (a 1-row TakeOrdered — the merge table is
  * a model artifact, bounded by contract), apply the merge as a
  * left-fold `aggregate` over each word's symbol array, localCheckpoint
  * to cut the growing lineage. Merge choice is deterministic:
  * (count DESC, lhs ASC, rhs ASC) — Sennrich's reference breaks ties by
  * insertion order; a distributed count has no such order, so the
  * lexicographic rule is the documented, engine-replayable policy.
  */
object Bpe {

  val Eow = "</w>"

  case class Merge(round: Int, lhs: String, rhs: String,
                   merged: String, pair_count: Long)

  /** Word-frequency vocabulary over [[Dedup.tokens]] words. */
  def wordFreqs(documents: DataFrame): DataFrame =
    documents.select(explode(Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial segmentation: characters plus the end-of-word marker. */
  private def initSymbols(w: Column): Column =
    concat(split(w, ""), array(lit(Eow)))

  /** Adjacent-pair counts over a (syms, freq) vocabulary — one explode
    * + map-side-combinable count. Fully-merged single-symbol words have
    * no pairs and drop out before the explode (`sequence(1, 0)` would
    * otherwise count DESCENDING).
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("lhs"),
          element_at(col("syms"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))

  /** #47l bpe_pairs: the first merge round's pair statistics — top-k
    * adjacent symbol pairs over the character-split vocabulary. The
    * oracle-checkable face of the trainer: later rounds differ only by
    * the merges already applied.
    */
  def bpePairs(documents: DataFrame, k: Int = 20): DataFrame = {
    val vocab = wordFreqs(documents)
      .select(initSymbols(col("w")).as("syms"), col("freq"))
    TopK.withRank(pairCounts(vocab), k,
        Seq(TopK.descNum(col("pair_count")), col("lhs"), col("rhs")))
      .select(col("rk"), col("lhs"), col("rhs"), col("pair_count"))
  }

  /** Greedy left-to-right single-merge application as a left-fold
    * `aggregate`: state (out, prev); (prev, s) = (a, b) emits the merged
    * symbol, anything else flushes prev. Overlaps resolve leftmost
    * ("aaa" + (a,a) → [aa, a]) — standard BPE greediness.
    */
  private def mergeSyms(syms: Column, a: String, b: String): Column = {
    val nil = array().cast("array<string>")
    aggregate(syms,
      struct(nil.as("out"), lit(null).cast("string").as("prev")),
      (acc, s) =>
        when(acc.getField("prev").isNull,
          struct(acc.getField("out").as("out"), s.as("prev")))
        .when(acc.getField("prev") === lit(a) && s === lit(b),
          struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
            lit(null).cast("string").as("prev")))
        .otherwise(
          struct(concat(acc.getField("out"), array(acc.getField("prev"))).as("out"),
            s.as("prev"))),
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev")))))
  }

  /** Train `merges` rounds; returns the merge table (the model
    * artifact). Stops early when no pair remains. Each round is one
    * vocabulary-scale job: pair count → driver argmax → fold-in.
    */
  def train(documents: DataFrame, merges: Int = 10): Seq[Merge] = {
    var vocab = wordFreqs(documents)
      .select(initSymbols(col("w")).as("syms"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(TopK.descNum(col("pair_count")), col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top.head.getAs[String]("lhs"),
          top.head.getAs[String]("rhs"), top.head.getAs[Long]("pair_count"))
        out += Merge(round, a, b, a + b, n)
        vocab = vocab
          .withColumn("syms", mergeSyms(col("syms"), a, b))
          .localCheckpoint()
        round += 1
      }
    }
    out.result()
  }

  /** Segment documents with a trained merge table: the merges fold into
    * one nested column expression (model-artifact-sized by contract), so
    * tokenization is a single corpus projection — no join, no shuffle.
    * Output: (doc_id, bpe_tokens).
    */
  def tokenize(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val segmented = documents
      .select(col("doc_id"), Dedup.tokens(col("text")).as("__w"))
      .select(col("doc_id"), filter(col("__w"), w => w =!= "").as("__w"))
      .select(col("doc_id"), transform(col("__w"), w =>
        merges.foldLeft(initSymbols(w))((s, m) => mergeSyms(s, m.lhs, m.rhs))
      ).as("__s"))
    segmented.select(col("doc_id"), flatten(col("__s")).as("bpe_tokens"))
  }
}
