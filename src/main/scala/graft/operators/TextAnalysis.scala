package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines (SURVEY §2 #44–47):
  * language identification, quality scoring, token counting and document
  * fingerprinting. All pure Catalyst expressions (regex + HOF folds) —
  * codegen'd, embarrassingly parallel across documents, no per-row UDFs.
  */
object TextAnalysis {

  /** Stopword profiles per language (tiny fixed lists — the n-gram
    * heuristic from the brief: hit counts over language-characteristic
    * function words).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "mit", "von"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "un", "que"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "dans"))

  private def letterTokens(text: Column): Column = split(lower(text), "[^a-z]+")

  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** #44 lang_id: stopword-profile hit counts per language; prediction =
    * argmax with alphabetical tie-break (de, en, es, fr order).
    */
  def langId(documents: DataFrame): DataFrame = {
    val t = letterTokens(col("text"))
    val withHits = documents.select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        Stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
          hits(t, ws).as(s"${l}_hits")
        }): _*)
    val Seq(de, en, es, fr) = Seq("de", "en", "es", "fr").map(l => col(s"${l}_hits"))
    withHits.withColumn("pred_lang",
      when(de >= en && de >= es && de >= fr, "de")
        .when(en >= es && en >= fr, "en")
        .when(es >= fr, "es")
        .otherwise("fr"))
  }

  /** Quality columns appended in place (originals kept) — the composable
    * form [[CorpusPipeline]] gates on without a doc-grain self-join.
    * NOTE: replaces any incoming `n_chars` with length(text).
    */
  def withQuality(documents: DataFrame): DataFrame = {
    val nChars = length(col("text"))
    val words = split(col("text"), "\\s+")
    val nWords = size(words)
    val punct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))
    val uppers = length(regexp_replace(col("text"), "[^A-Z]", ""))
    val stops = hits(letterTokens(col("text")), Stopwords("en"))
    documents
      .withColumn("n_chars", nChars)
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len",
        length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          nullif(nWords.cast("double"), lit(0.0)))
      .withColumn("punct_ratio", punct.cast("double") / nullif(nChars.cast("double"), lit(0.0)))
      .withColumn("upper_ratio", uppers.cast("double") / nullif(nChars.cast("double"), lit(0.0)))
      .withColumn("stop_ratio", stops.cast("double") / nullif(nWords.cast("double"), lit(0.0)))
      .withColumn("quality_score",
        round(least(lit(1.0), nWords.cast("double") / 50) * 0.4 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(lit(1.0), col("stop_ratio") * 5) * 0.3, 6))
  }

  /** #45 text_quality: length/punctuation/stopword/case ratios combined
    * into a 0–1 quality score (quality heuristics in the spirit of
    * C4/Gopher-style filters, deterministic arithmetic only).
    */
  def textQuality(documents: DataFrame): DataFrame =
    withQuality(documents)
      .select(col("doc_id"), col("n_chars"), col("n_words"), col("avg_word_len"),
        col("punct_ratio"), col("upper_ratio"), col("stop_ratio"),
        col("quality_score"))

  /** #46 token_count: whitespace tokens, BPE-ish regex tokens (letter
    * runs | digit runs | single punctuation), and the chars/4 estimate.
    */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(split(col("text"), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("regex_tokens"),
      ceil(length(col("text")) / 4.0).as("est_bpe"))

  /** Deterministic train/val/test assignment by key hash — the standard
    * reproducible corpus split (no RNG state, stable across runs and
    * cluster sizes, new documents never reshuffle old assignments).
    * Fractions are cumulative cuts of the 10k-bucket hash space.
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  valFrac: Double = 0.05, testFrac: Double = 0.05): DataFrame = {
    val bucket = pmod(xxhash64(col(keyCol)), lit(10000L))
    df.withColumn("split",
      when(bucket < (valFrac * 10000).toLong, "val")
        .when(bucket < ((valFrac + testFrac) * 10000).toLong, "test")
        .otherwise("train"))
  }

  /** Deterministic sub-sampling by key hash (rate ∈ [0,1]) — corpus
    * downsampling that composes with splitByHash (independent salts).
    */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol), lit("sample")), lit(10000L)) <
      (rate * 10000).toLong)

  /** #45b doc_repetition: boilerplate detection in the spirit of the
    * Gopher repetition filters — per document, the share of bigram
    * occurrences taken by the single most frequent bigram (`rep_ratio`,
    * high for templated/repeated text) and lexical diversity
    * (`uniq_token_ratio`). Token diversity is pure array algebra in one
    * projection; bigram concentration runs on NON-distinct posting rows
    * (posexplode + lead, the [[Dedup.shinglePostings]] plan without the
    * distinct) through two per-doc-bounded, map-side-combinable
    * aggregations — no per-row arrays of counts, no window over corpus
    * rows.
    */
  def docRepetition(documents: DataFrame): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = documents
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(concat_ws(" ", col("w"), col("w2"))).as("h"))
    val rep = grams.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("nb"), max(col("c")).as("tb"))
    val toks = Dedup.tokens(col("text"))
    documents
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("bigint").as("n_tokens"),
        round(size(array_distinct(col("__toks"))).cast("double") /
          nullif(size(col("__toks")).cast("double"), lit(0.0)), 6)
          .as("uniq_token_ratio"))
      .join(rep, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("uniq_token_ratio"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("tb"), lit(0L)).as("top_bigram_n"),
        round(col("tb").cast("double") /
          nullif(col("nb").cast("double"), lit(0.0)), 6).as("rep_ratio"))
  }

  /** #47e stratified_sample: deterministic corpus rebalancing — every
    * stratum (language here) is downsampled to ≈ the smallest stratum's
    * size, the standard anti-dominance step before training-mix export.
    * Membership is a pure-arithmetic multiplicative hash of doc_id
    * (engine-portable, no RNG state): a document's fate never changes
    * with cluster size, partitioning, or corpus growth within its
    * stratum threshold.
    *
    * Scale shape: stratum counts are a tiny aggregate joined back by
    * BROADCAST; the corpus side is one scan + filter — no shuffle, no
    * sort, no window.
    */
  def stratifiedSample(documents: DataFrame, stratumCol: String = "lang",
                       buckets: Int = 1000): DataFrame =
    sampleByStratumRate(documents, stratumCol, buckets,
      ratio => ratio)

  /** Shared shape of the stratum resamplers ([[stratifiedSample]],
    * [[corpusMix]]): per-stratum counts → broadcast threshold table
    * keyed by `rateOf(n_min / n_stratum)` → one corpus scan filtered by
    * the multiplicative doc_id hash. The hash, bucket arithmetic and
    * output projection live HERE once, so the two policies cannot drift
    * apart; `rateOf` maps the floor-stratum ratio (∈ (0, 1]) to the
    * keep rate — identity for the hard floor, a tempering curve for
    * soft rebalancing.
    */
  private def sampleByStratumRate(documents: DataFrame, stratumCol: String,
                                  buckets: Int,
                                  rateOf: Column => Column): DataFrame = {
    val counts = documents.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_stratum"))
    val minC = counts.agg(min(col("n_stratum")).as("n_min"))
    val thr = counts.crossJoin(broadcast(minC))
      .select(col(stratumCol), col("n_stratum"),
        floor(lit(buckets.toDouble) *
          rateOf(col("n_min").cast("double") / col("n_stratum").cast("double")))
          .cast("bigint").as("keep_thr"))
    documents
      .select(col("doc_id"), col(stratumCol))
      .join(broadcast(thr), Seq(stratumCol))
      .filter(pmod(pmod(col("doc_id"), lit(99991L)) * lit(2654435761L),
        lit(buckets.toLong)) < col("keep_thr"))
      .select(col("doc_id"), col(stratumCol), col("n_stratum"), col("keep_thr"))
  }

  /** #47f corpus_mix: temperature-based rebalancing — the multinomial
    * α-smoothing used to set multilingual pretraining mixes (α = 0.5
    * here, i.e. T = 2): post-sample stratum sizes follow n_s^α instead
    * of [[stratifiedSample]]'s hard floor at the smallest stratum.
    * Keep rate per stratum is (n_min/n_s)^(1−α) = sqrt(n_min/n_s) — the
    * smallest stratum is kept whole and larger ones shrink toward (not
    * to) it. The formula is deliberately a pairwise ratio, never a
    * cross-stratum Σw^α normalizer: divide, sqrt and multiply are all
    * IEEE-754 correctly-rounded, so the threshold is bit-identical on
    * any engine, while a floating SUM over strata would depend on
    * aggregation order. Membership reuses the multiplicative doc_id
    * hash (engine-portable, growth-stable).
    *
    * Scale shape: identical to stratifiedSample — a tiny broadcast
    * threshold table against one corpus scan + filter; no shuffle of
    * corpus rows.
    */
  def corpusMix(documents: DataFrame, stratumCol: String = "lang",
                buckets: Int = 1000): DataFrame =
    sampleByStratumRate(documents, stratumCol, buckets,
      ratio => sqrt(ratio))

  /** #47g vocab_topk: per-language top-k token frequencies — the
    * vocabulary-coverage diagnostic published with a corpus snapshot
    * (tokenizer fit, stopword drift, boilerplate tokens surface here).
    *
    * Scale shape: one posting explode → (lang, token) count with map-side
    * combine, then the bounded [[TopK.groupedWithRank]] aggregate — the
    * partial aggregate truncates to k per language BEFORE the shuffle,
    * so the final exchange moves ≤ k·partitions rows per language
    * instead of the whole vocabulary, and there is no per-language
    * window pinning a vocabulary-sized slice to one task.
    */
  def vocabTopK(documents: DataFrame, k: Int = 20): DataFrame = {
    val counts = documents
      .select(col("lang"), explode(Dedup.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    TopK.groupedWithRank(counts, Seq(col("lang")), k,
      Seq(TopK.descNum(col("n_occurrences")), col("token")))
      .select(col("lang"), col("rk"), col("token"), col("n_occurrences"))
  }

  /** Corpus composition report: per-language document counts, size and
    * quality aggregates — what a training-data pipeline publishes with
    * every corpus snapshot.
    */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("__words", size(split(col("text"), "\\s+")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        avg(col("__words")).as("avg_words"),
        countDistinct(col("source")).as("n_sources"))

  /** #47 doc_fingerprint: polynomial rolling hash over word tokens —
    * term(w) = 131·len(w) + code(first char), fingerprint = left fold
    * h ← (31·h + term) mod 1e9+7. Bounded intermediates (< 2⁶³), engine-
    * portable integer arithmetic.
    */
  def docFingerprint(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val terms = transform(toks,
      w => (length(w) * 131 + ascii(w)).cast("bigint"))
    documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      aggregate(terms, lit(0L),
        (h, v) => (h * 31 + v) % 1000000007L).as("fingerprint"))
  }
}
