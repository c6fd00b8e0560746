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
