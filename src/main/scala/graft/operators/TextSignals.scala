package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-signal operators for training-data curation, rounding out the
  * text-analysis surface (SURVEY §2 #45c/45d/45e/46b/47o–47r): winnowing
  * fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS local
  * fingerprinting scheme), corpus-level duplicate n-gram fraction (the
  * Gopher/Dolma repetition filter at corpus grain), a hashed-feature
  * linear quality classifier (the fastText-style scoring shape), vocab
  * OOV-rate profiling, and per-document TF-IDF keyword extraction.
  *
  * Every operator hashes through the portable md5 32-bit fold shared
  * with [[Dsir]] / [[Dedup.minhashPairsPortable]], so each carries a
  * full cross-engine DuckDB oracle (no seeded-JVM-hash rows). Float
  * policy matches the repo round-6 rule: integer/exact arithmetic as
  * far as possible (the classifier folds integer weights and divides
  * once), `round(_, 6)` at the output boundary, and rank keys are
  * pre-rounded so cross-engine 1-ulp `ln` drift cannot flip an order.
  */
object TextSignals {

  /** Portable 32-bit hash: first 8 hex digits of md5 as an unsigned
    * BIGINT — replayable in any engine with md5 (DuckDB:
    * `CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT)`).
    */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The canonical token-array expression every signal folds over:
    * [[Dedup.tokens]] with empties removed. Public so composition sites
    * (the [[graft.CorpusPipeline]] classifier gate) use THIS expression
    * rather than re-deriving it — a tokenizer change must move every
    * consumer together. NULL text tokenizes as the EMPTY ARRAY, not
    * null: a null array would explode to zero rows and silently drop
    * the document from every signal, while the DuckDB oracles LEFT
    * JOIN from the full documents table and would still emit its
    * zero-token row (ADVICE r6 — cross-engine row-membership must not
    * depend on text nullability).
    */
  def tokensCol(text: Column): Column =
    filter(Dedup.tokens(coalesce(text, lit(""))), t => t =!= "")

  private def tokens(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), tokensCol(col("text")).as("__t"))

  /** Winnowing packs (hash, position) into one BIGINT so a plain window
    * `min` implements "min hash, rightmost position on ties": the low
    * [[PosBits]] bits carry (2^21−1 − pos), so among equal hashes the
    * LARGEST position wins the min. Positions are guarded below.
    */
  private val PosBits = 21
  private val PosCap = 1L << PosBits

  /** #47o winnow_fingerprint: winnowing document fingerprints
    * (Schleimer, Wilkerson, Aiken 2003) — hash every k-token gram, slide
    * a w-hash window, record the minimum of each window (rightmost on
    * ties); the distinct (position, hash) picks are the fingerprint set.
    * Guarantees a shared run of w+k−1 tokens always yields a shared
    * fingerprint — the local-fingerprint dual of [[Dedup]]'s global
    * minhash. Output is one row per document: gram count, fingerprint
    * count, density and an order-free checksum (Σ selected hashes, tie
    * duplicates included per the (pos,hash) set semantics).
    *
    * Scale shape: one projection fans tokens→grams (explicit positions,
    * no self-join), the window partitions by doc_id ordered by pos —
    * per-doc frames bounded by document length (the indicator-window
    * shape: key cardinality ≫ executors, skew-safe at bar... doc grain).
    * The encode guard raises past 2^21 grams per document rather than
    * silently corrupting the packed key.
    */
  def winnowFingerprints(documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    val toks = tokens(documents)
    val nG = size(col("__t")) - (k - 1)
    val agg = winnowSelect(documents, k, w).groupBy("doc_id").agg(
      count(lit(1)).as("n_fps"), sum(col("fp_hash")).as("fp_checksum"))
    toks.select(col("doc_id"), greatest(nG, lit(0)).cast("long").as("n_grams"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        when(col("n_grams") > 0,
          round(coalesce(col("n_fps"), lit(0L)).cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("fp_density"),
        coalesce(col("fp_checksum"), lit(0L)).as("fp_checksum"))
  }

  /** The selected fingerprint set behind [[winnowFingerprints]]: one row
    * per distinct (fp_pos, fp_hash) pick — the frame a plagiarism /
    * local-overlap matcher would band-join on (winnowing's guarantee:
    * any shared run of w+k−1 tokens shares at least one pick's hash).
    */
  def winnowSelect(documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    val toks = tokens(documents)
    val nG = size(col("__t")) - (k - 1)
    val grams = toks.filter(size(col("__t")) >= k)
      .select(col("doc_id"),
        when(nG >= lit(PosCap), raise_error(concat(
          lit(s"winnowFingerprints: doc "), col("doc_id").cast("string"),
          lit(s" exceeds $PosCap grams — packed (hash,pos) key would overflow"))))
          .otherwise(nG).as("__n"),
        // r11: TokenKgrams in positional order — posexplode recovers the
        // gram position the packed (hash, pos) key needs.
        posexplode(graft.functions.TokenKgrams.tokenKgrams(col("__t"), k,
          distinct = false)).as(Seq("__p0", "__g")))
      .select(col("doc_id"), col("__n"), (col("__p0") + 1).as("pos"),
        h32(col("__g")).as("h"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    val enc = col("h") * lit(PosCap) + (lit(PosCap - 1) - col("pos"))
    grams
      .withColumn("__mn", min(enc).over(byPos))
      // Only fully-formed windows select (first w−1 prefixes are covered
      // by the window ending at w); short docs (< w grams) keep their
      // one whole-doc window, so every non-empty doc fingerprints.
      .filter(col("pos") >= least(lit(w), col("__n")))
      .select(col("doc_id"), shiftright(col("__mn"), PosBits).as("fp_hash"),
        (lit(PosCap - 1) - col("__mn") % lit(PosCap)).as("fp_pos"))
      .distinct()
  }

  /** #47s winnow_pairs: partial-overlap pair detection over the
    * winnowing fingerprint sets — the MOSS use of winnowing (Schleimer
    * et al. 2003 §5): documents sharing ≥ `minShared` selected hashes
    * are reported with the shared count and an overlap score
    * n_shared / min(|fps|) (containment-normalized, so a short quote
    * inside a long doc still scores high). Complements the dedup
    * family: minhash sees whole-document similarity, winnow pairs see
    * LOCAL overlap — the license header, the quoted paragraph.
    *
    * Scale shape: the fingerprint frame (≈ n_grams/w rows per doc, a
    * 4× reduction) groups by hash — bucket-collect + [[Dedup.cappedPairs]]
    * star-capping, the minhash-candidate argument: one degenerate
    * boilerplate fingerprint cannot go quadratic. Shared counts fold
    * map-side per pair; sizes join back on the id keys. Capped buckets
    * undercount star-external pairs by design (documented trade).
    */
  def winnowPairs(documents: DataFrame, k: Int = 4, w: Int = 4,
                  minShared: Int = 2, maxBucket: Int = 1024): DataFrame = {
    val byHash = winnowSelect(documents, k, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
    val sizes = byHash.groupBy("doc_id").agg(count(lit(1)).as("__nf"))
    val pairs = byHash.groupBy("fp_hash")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Dedup.cappedPairs(col("ids"), maxBucket)).as("p"))
      .select(col("p.a").as("id1"), col("p.b").as("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("id1"), col("__nf").as("__n1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("__nf").as("__n2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("__n1"), col("__n2")).cast("double"), 6).as("overlap"))
  }

  /** #45c dup_ngram_frac: corpus-level duplicate n-gram fraction — per
    * document, the share of its n-gram OCCURRENCES whose gram also
    * appears in at least one other document (the cross-document twin of
    * [[TextAnalysis.docRepetition]]'s within-doc rate; the Gopher-rules
    * "duplicate n-gram fraction" filter at corpus scale).
    *
    * Scale shape: grams shuffle as 8-byte hashes, never strings; the
    * per-(doc, gram) fold combines map-side, the gram-grain doc count is
    * a second bounded fold, and the join back runs on the hash key. A
    * gram repeated millions of times corpus-wide is ONE row at gram
    * grain — no skew amplification (the chunk_dedup argument).
    */
  def dupNgramFrac(documents: DataFrame, n: Int = 8): DataFrame = {
    val toks = tokens(documents)
    // r11: TokenKgrams (ordered, non-distinct — multiplicity feeds __m)
    // replaces the interpreted transform/element_at lambda per gram;
    // fanOutScan spreads the gram+md5 work when the scan is narrow.
    val grams = Skew.fanOutScan(toks, "doc_id")
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(
        graft.functions.TokenKgrams.tokenKgrams(col("__t"), n,
          distinct = false)).as("__g"))
      .select(col("doc_id"), h32(col("__g")).as("h"))
    // The (doc, gram) fold feeds BOTH the join left side and the
    // gram-grain doc count, so the corpus is scanned and exploded twice.
    // Deliberate: persisting the gram-grain intermediate was measured 2×
    // SLOWER at sf0.1 (4.99 s vs 2.60 s — materialization dwarfs the
    // codegen'd re-scan), and the alternative one-pass collect_list-per-
    // gram shape concentrates a boilerplate gram's million-doc posting
    // list in one task. Two cheap scans + the hash-keyed join is the
    // skew-safe shape at 100 TB.
    val perDocGram = grams.groupBy("doc_id", "h").agg(count(lit(1)).as("__m"))
    val gramDocs = perDocGram.groupBy("h").agg(count(lit(1)).as("__nd"))
    val agg = perDocGram.join(gramDocs, "h")
      .groupBy("doc_id").agg(
        sum(col("__m")).as("n_grams"),
        sum(when(col("__nd") >= 2, col("__m")).otherwise(lit(0L))).as("n_dup"))
    toks.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          round(col("n_dup").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Demo weight for a hash bucket: an affine integer scramble of the
    * bucket id into [−10^6, 10^6] (Knuth multiplicative constant). A
    * TRAINED model would be a broadcast `buckets`-row table joined on
    * the bucket id; the plan shape (one posting pass, integer fold per
    * doc) is identical — the pure-function weight just makes the row
    * engine-replayable without shipping a model artifact.
    */
  private def bucketWeight(b: Column): Column =
    (b * lit(2654435761L)) % lit(2000001L) - lit(1000000L)

  /** #45d quality_classifier: hashed bag-of-words linear scorer — the
    * fastText-style quality-classifier shape every web-corpus pipeline
    * runs (hash tokens into `buckets` features, fold feature weights,
    * squash to a keep probability). Weights fold as EXACT integers
    * (Σ w_int, one double division at the end), so the only float steps
    * are one divide and one sigmoid — cross-engine-stable under the
    * round-6 policy. Empty docs score 0 → prob 0.5 → kept.
    *
    * Scale shape: the weight is computed inline from the bucket id, so
    * the whole operator is one posting explode + map-side-combinable
    * groupBy(doc_id) — no model join, no broadcast, no shuffle wider
    * than (doc_id, partial sums). A null sentinel rides the explode so
    * token-less documents keep a group — no join back to the corpus
    * just to emit their zero rows.
    */
  def qualityClassifier(documents: DataFrame, buckets: Int = 4096): DataFrame = {
    val toks = tokens(documents)
    val agg = toks
      .select(col("doc_id"),
        explode(concat(array(lit(null).cast("string")), col("__t"))).as("__tok"))
      .groupBy("doc_id").agg(
        count(col("__tok")).as("n_tokens"), // count() skips the sentinel
        sum(when(col("__tok").isNotNull,
          bucketWeight(h32(col("__tok")) % lit(buckets))).otherwise(lit(0L))).as("__ws"))
    classifierTail(agg)
  }

  /** Shared scoring tail of the two classifier fronts: integer weight
    * sum → mean score → sigmoid keep probability (one divide + one exp,
    * the only float steps — round-6 cross-engine policy).
    */
  private def classifierTail(agg: DataFrame): DataFrame = {
    val score = col("__ws").cast("double") / (col("n_tokens") * lit(1000000.0))
    agg.select(col("doc_id"), col("n_tokens"),
      when(col("n_tokens") > 0, round(score, 6)).otherwise(lit(0.0)).as("score"),
      when(col("n_tokens") > 0, round(lit(1.0) / (lit(1.0) + exp(-score)), 6))
        .otherwise(lit(0.5)).as("prob"),
      (col("__ws") >= 0).as("keep"))
  }

  /** The inline demo model as an explicit (bucket, weight_int) frame —
    * what a TRAINED artifact looks like to [[qualityClassifierWeighted]];
    * the spec feeds it back to prove the two fronts agree bit-for-bit.
    */
  def demoWeights(spark: org.apache.spark.sql.SparkSession,
                  buckets: Int = 4096): DataFrame = {
    import spark.implicits._
    spark.range(buckets.toLong).toDF("bucket")
      .select(col("bucket").cast("int").as("bucket"),
        bucketWeight(col("bucket")).as("weight_int"))
  }

  /** #45d trained-model entry point: [[qualityClassifier]] with the
    * weights taken from a (bucket, weight_int) DataFrame — the swap the
    * inline row's scaladoc promises ("a trained model swaps in as a
    * broadcast `buckets`-row table, same plan shape"). A distilled
    * fastText-style gate exports its hashed-feature weights as integers
    * at 10⁻⁶ grain and hands them here; scoring semantics, rounding and
    * the keep rule are byte-identical to the inline front
    * ([[classifierTail]] is shared).
    *
    * Scale shape: the model is bounded by contract (`buckets` rows), so
    * it BROADCASTS — the posting explode gains one broadcast-hash join
    * and no new Exchange; the per-doc fold still combines map-side.
    * Buckets absent from the frame weigh 0 (a sparse model is fine);
    * the null explode sentinel keeps token-less docs without a join
    * back to the corpus.
    */
  def qualityClassifierWeighted(documents: DataFrame, weights: DataFrame,
                                buckets: Int = 4096): DataFrame = {
    val toks = tokens(documents)
    val w = broadcast(weights.select(col("bucket").cast("int").as("__b"),
      col("weight_int").cast("long").as("__w")))
    val agg = toks
      .select(col("doc_id"),
        explode(concat(array(lit(null).cast("string")), col("__t"))).as("__tok"))
      .withColumn("__b",
        when(col("__tok").isNotNull, h32(col("__tok")) % lit(buckets)).cast("int"))
      .join(w, Seq("__b"), "left_outer") // null-sentinel rows keep no match
      .groupBy("doc_id").agg(
        count(col("__tok")).as("n_tokens"),
        sum(when(col("__tok").isNotNull, coalesce(col("__w"), lit(0L)))
          .otherwise(lit(0L))).as("__ws"))
    classifierTail(agg)
  }

  /** #46b oov_rate: vocabulary-coverage profile — build the corpus
    * top-`vocabSize` token vocabulary (count desc, token asc — total
    * order) and report each document's out-of-vocabulary token fraction.
    * The tokenizer-coverage check run before committing a vocab to a
    * training run; high OOV flags misencoded or off-domain documents.
    *
    * Scale shape: the (doc, token) fold combines map-side and feeds both
    * the vocab derivation and the coverage fold — recomputed, not
    * persisted (the [[dupNgramFrac]] decision: a second codegen'd scan
    * is cheaper than materializing a corpus-sized intermediate, and a
    * bare persist inside an operator leaks — the caller holds no handle
    * to unpersist). The vocab is `orderBy.limit` (TakeOrderedAndProject:
    * per-partition heaps, no global window) and joins back BROADCAST —
    * corpus rows never reshuffle for membership.
    */
  def oovRate(documents: DataFrame, vocabSize: Int = 500): DataFrame = {
    val toks = tokens(documents)
    val tokCounts = toks.select(col("doc_id"), explode(col("__t")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__m"))
    val vocab = tokCounts.groupBy("tok").agg(sum(col("__m")).as("__cnt"))
      .orderBy(col("__cnt").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    val agg = tokCounts.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id").agg(
        sum(col("__m")).as("n_tokens"),
        sum(when(col("__in").isNull, col("__m")).otherwise(lit(0L))).as("n_oov"))
    toks.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          round(col("n_oov").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Rule codes in report order — fixed so `reasons` strings are
    * deterministic and machine-parseable.
    */
  val GopherRules: Seq[String] = Seq("too_short", "too_long", "word_len",
    "long_word", "low_alpha", "no_stop", "symbol")

  /** #45e gopher_filter: the Gopher repetition-free quality-rule battery
    * (Rae et al. 2021 §A1.1, the rule set Dolma/RefinedWeb descend
    * from), adapted to this corpus's scale: word-count bounds [5, 10^5],
    * mean word length [2, 12], max word length ≤ 30, ≥70% words contain
    * a letter, ≥2 stopword hits (union of the [[TextAnalysis.Stopwords]]
    * profiles — the corpus is multilingual), symbol share ≤ 20%. Emits
    * every metric, each failed rule's code in fixed [[GopherRules]]
    * order, and the keep verdict — the auditable form a curation run
    * logs, where a bare boolean hides WHY a document died.
    *
    * Scale shape: one projection over a materialized whitespace-word
    * array — no shuffle, no join; ratio thresholds are single int/int
    * IEEE divisions, portable cross-engine. The within-doc repetition
    * rules live in [[TextAnalysis.docRepetition]] and the corpus-grain
    * one in [[dupNgramFrac]] — composable, not duplicated here.
    */
  def gopherFilter(documents: DataFrame): DataFrame =
    withGopher(documents)
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("max_word_len"), col("alpha_share"), col("stop_hits"),
        col("symbol_share"), col("n_fail"), col("gopher_keep").as("keep"),
        col("reasons"))

  /** [[gopherFilter]] as an APPENDING projection (originals kept, keep
    * verdict in `gopher_keep`) — the composable form [[graft.CorpusPipeline]]
    * gates on without a doc-grain self-join, the
    * [[TextAnalysis.withQuality]] pattern.
    */
  def withGopher(documents: DataFrame): DataFrame = {
    val allStops = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    val base = documents
      .withColumn("__w", filter(split(col("text"), "[ \\t\\n\\r\\f]+"), w => w =!= ""))
      .withColumn("__lt", filter(split(lower(col("text")), "[^\\p{L}]+"), t => t =!= ""))
    val nWords = size(col("__w"))
    val wordChars = length(regexp_replace(col("text"), "[ \\t\\n\\r\\f]+", ""))
    val m = base
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len",
        when(nWords > 0, round(wordChars.cast("double") / nWords, 6))
          .otherwise(lit(0.0)))
      .withColumn("max_word_len",
        coalesce(array_max(transform(col("__w"), w => length(w))), lit(0)))
      .withColumn("alpha_share",
        when(nWords > 0,
          round(size(filter(col("__w"), w => w.rlike("\\p{L}"))).cast("double") / nWords, 6))
          .otherwise(lit(0.0)))
      .withColumn("stop_hits",
        size(filter(col("__lt"), t => t.isin(allStops: _*))))
      .withColumn("symbol_share",
        when(length(col("text")) > 0,
          round(length(regexp_replace(col("text"), "[\\p{L}\\p{N} \\t\\n\\r\\f]", ""))
            .cast("double") / length(col("text")), 6))
          .otherwise(lit(0.0)))
    val fails = array(
      when(col("n_words") < 5, lit("too_short")),
      when(col("n_words") > 100000, lit("too_long")),
      when(col("mean_word_len") < 2 || col("mean_word_len") > 12, lit("word_len")),
      when(col("max_word_len") > 30, lit("long_word")),
      when(col("alpha_share") < 0.7, lit("low_alpha")),
      when(col("stop_hits") < 2, lit("no_stop")),
      when(col("symbol_share") > 0.2, lit("symbol")))
    m.withColumn("__f", filter(fails, f => f.isNotNull))
      .withColumn("n_fail", size(col("__f")))
      .withColumn("gopher_keep", size(col("__f")) === 0)
      .withColumn("reasons", array_join(col("__f"), ","))
      .drop("__w", "__lt", "__f")
  }

  /** Inline (projection-form) classifier keep verdict over a MATERIALIZED
    * token-array column: the integer weight fold as an `aggregate` HOF —
    * interpreted per row, but ZERO shuffle, which is the right trade
    * inside a gate predicate ([[qualityClassifier]]'s explode+fold stays
    * the reporting form; same weights, same verdict — spec-asserted).
    */
  def classifierKeepCol(tokensCol: Column, buckets: Int = 4096): Column =
    aggregate(tokensCol, lit(0L),
      (acc, t) => acc + bucketWeight(h32(t) % lit(buckets))) >= 0

  /** [[classifierKeepCol]] with TRAINED weights — the projection-form
    * gate [[graft.CorpusPipeline]] ANDs in when a fitted artifact
    * ([[Classifier.trainQualityClassifier]]) is supplied. The model
    * rides as a dense bucket-indexed driver literal (micro-unit longs,
    * bounded by contract at `buckets` entries), so the verdict stays a
    * per-row expression: zero shuffle, zero join, streaming-safe —
    * identical keep rule to [[qualityClassifierWeighted]] (Σ w ≥ 0,
    * missing/empty folds to 0 ≥ 0 = keep), spec-asserted.
    */
  def classifierKeepColWeighted(tokensCol: Column, weights: Array[Long]): Column = {
    val w = typedLit(weights.toSeq)
    aggregate(tokensCol, lit(0L),
      (acc, t) => acc +
        element_at(w, (h32(t) % lit(weights.length.toLong)).cast("int") + 1)) >= 0
  }

  /** #45f sentence_stats: sentence-grain shape signals — the grain the
    * word/doc-level batteries miss (terminal-punctuation segmentation,
    * sentence length distribution, fragment share). Machine-translated
    * and boilerplate text skews short-and-uniform; OCR noise skews
    * fragmentary — both show up here before any model-based scorer
    * runs. Sentences split on [[Dedup.SentenceClass]] terminator runs
    * (ASCII + CJK/Arabic marks); a "short" sentence has
    * under 4 words.
    *
    * Scale shape: one projection over per-doc bounded arrays (HOF word
    * counts are interpreted but doc-bounded), zero shuffle.
    */
  def sentenceStats(documents: DataFrame): DataFrame = {
    val sents = filter(transform(split(col("text"), Dedup.SentenceClass), s => trim(s)),
      s => s =!= "")
    val wc = transform(col("__s"),
      s => size(filter(split(s, "[ \\t\\n\\r\\f]+"), w => w =!= "")))
    val m = documents
      .withColumn("__s", sents)
      .withColumn("__wc", wc)
      .withColumn("n_sents", size(col("__s")))
    m.select(col("doc_id"), col("n_sents"),
      when(col("n_sents") > 0, round(
        aggregate(col("__wc"), lit(0L), (a, x) => a + x).cast("double") / col("n_sents"), 6))
        .otherwise(lit(0.0)).as("avg_sent_words"),
      coalesce(array_max(col("__wc")), lit(0)).as("max_sent_words"),
      when(col("n_sents") > 0, round(
        size(filter(col("__wc"), x => x < 4)).cast("double") / col("n_sents"), 6))
        .otherwise(lit(0.0)).as("short_share"))
  }

  /** #47t source_quality: per-source quality rollup — the domain-grain
    * report a web pipeline publishes to decide which sources to keep,
    * cap or drop (the C4-blocklist / RefinedWeb per-domain view):
    * document count, corpus share, gopher pass rate, mean classifier
    * probability, mean document length. Means fold EXACT integer
    * micro-units (Σ of 6-rounded values × 10^6 — the
    * [[Similarity.embedOutliers]] determinism pattern: float partial
    * sums are shuffle-order-dependent and CAN land on a rounding
    * boundary), so every published figure is engine- and run-stable.
    *
    * Scale shape: the signal columns ride the per-doc passes
    * ([[withGopher]] projection + the classifier fold); the rollup is
    * one map-side-combinable groupBy(source) over source-grain keys —
    * bounded output, no join wider than the broadcast corpus total.
    */
  /** #45g quality_calibration: agreement matrix of the two quality
    * signals at classifier-probability grain — per prob decile
    * (floor(prob·10), the 1.0 edge folded into 9): doc count,
    * classifier keeps, Gopher keeps, both-keep count, Gopher keep
    * rate. THE threshold-picking read before wiring either gate into
    * [[graft.CorpusPipeline]]: a calibrated classifier shows
    * gopher_keep_rate rising with the decile; mass in a
    * high-prob/low-gopher cell means the classifier is blind to a rule
    * (or the rule is too strict for that register of text).
    *
    * Shape: the [[sourceQuality]] composition at a different grain —
    * classifier fold + Gopher projection joined ONCE on the unique
    * doc_id (no skew possible), then one 10-group hash aggregate; the
    * Gopher side is column-pruned to (doc_id, verdict) before the
    * join. Deciles bucket the 6-ROUNDED prob, so the bucket edges are
    * exactly as portable as the metric (the gopher_filter policy).
    */
  def qualityCalibration(documents: DataFrame): DataFrame = {
    val cls = qualityClassifier(documents)
      .select(col("doc_id"), col("prob"), col("keep"))
    val gop = withGopher(documents).select(col("doc_id"), col("gopher_keep"))
    cls.join(gop, Seq("doc_id"))
      .withColumn("decile", least(floor(col("prob") * 10).cast("int"), lit(9)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_cls_keep"),
        sum(col("gopher_keep").cast("long")).as("n_gopher_keep"),
        sum((col("keep") && col("gopher_keep")).cast("long")).as("n_both_keep"))
      .withColumn("gopher_keep_rate",
        round(col("n_gopher_keep").cast("double") / col("n_docs"), 6))
  }

  def sourceQuality(documents: DataFrame): DataFrame = {
    val cls = qualityClassifier(documents).select(col("doc_id"), col("prob"))
    val sig = withGopher(documents)
      .select(col("doc_id"), col("source"), col("n_words"), col("gopher_keep"))
      .join(cls, Seq("doc_id"))
    val probMicro = round(col("prob") * 1e6, 0).cast("long")
    val total = documents.agg(count(lit(1)).as("__N"))
    sig.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("gopher_keep").cast("long")).as("__kept"),
        sum(probMicro).as("__pm"),
        sum(col("n_words").cast("long")).as("__words"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") / col("__N"), 6).as("corpus_share"),
        round(col("__kept").cast("double") / col("n_docs"), 6).as("keep_rate"),
        round(col("__pm").cast("double") / (col("n_docs") * 1e6), 6).as("mean_prob"),
        round(col("__words").cast("double") / col("n_docs"), 6).as("mean_words"))
  }

  /** #47q chunk_split: overlapping token-window chunking — the
    * RAG-retrieval / context-window sequence-prep primitive (split every
    * document into `chunkTokens`-token windows advancing by `stride`,
    * overlap = chunkTokens − stride). Chunk 0 starts at token 1; the
    * last chunk is the first window that reaches the document's end
    * (shorter than `chunkTokens` only when the doc itself is). Each
    * chunk carries its token span, the portable 32-bit hash (the key
    * [[Dedup]]'s exact pass would dedup chunks on) and the normalized
    * text.
    *
    * Scale shape: a pure projection + explode off the one materialized
    * token array — zero shuffle, zero join; output partitioning follows
    * the scan. The per-doc fan-out is n/stride rows, bounded by doc
    * length.
    */
  def chunkSplit(documents: DataFrame, chunkTokens: Int = 128,
                 stride: Int = 96): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val toks = tokens(documents)
    val nT = size(col("__t"))
    // Extra strides past the first window, integer-exact in both engines:
    // (n - chunk + stride - 1) div stride.
    val nExtra = when(nT > chunkTokens,
      floor(((nT - chunkTokens + (stride - 1)).cast("double")) / stride).cast("int"))
      .otherwise(lit(0))
    toks.filter(nT > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nExtra),
          c => slice(col("__t"), c * stride + 1, lit(chunkTokens)))).as(Seq("chunk_id", "__c")))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("start_tok"),
        size(col("__c")).as("n_tokens"),
        h32(concat_ws(" ", col("__c"))).as("chunk_hash"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** #47r text_normalize: deterministic text canonicalization — the
    * first pass of every corpus release (control chars → space,
    * whitespace-run collapse, trim, lowercase) plus before/after stats
    * and a changed flag. Patterns stay inside the Java∩RE2 syntax
    * subset (explicit classes, no `\\s` — Java and RE2 disagree on
    * vertical tab) so the oracle replays them verbatim, the
    * [[TextAnalysis.piiScrub]] policy.
    *
    * Scale shape: embarrassingly parallel — one chained-regex
    * projection, no shuffle, stays inside whole-stage codegen.
    */
  /** The canonicalization expression itself — shared by [[textNormalize]]
    * and [[graft.CorpusPipeline]]'s `normalizeFirst` stage.
    */
  def normalizeExpr(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), " +", " ")))

  def textNormalize(documents: DataFrame): DataFrame = {
    val norm = normalizeExpr(col("text"))
    documents.select(col("doc_id"),
      length(col("text")).as("n_chars_raw"),
      length(norm).as("n_chars_norm"),
      (norm =!= col("text")).as("changed"),
      norm.as("norm_text"))
  }

  /** #47p tfidf_keywords: per-document top-k TF-IDF terms — keyword
    * extraction for corpus browsing/routing. idf is the smoothed
    * `ln((N+1)/(df+1)) + 1` (never negative, never divides by zero);
    * the rank key is the ROUNDED score (desc) then term (asc), so a
    * 1-ulp cross-engine `ln` difference cannot reorder near-ties.
    *
    * Scale shape: tf folds map-side per (doc, term); df is a bounded
    * term-grain fold joined back on the term key; N rides a broadcast
    * 1-row aggregate (the [[Relational]] share-of-total shape). Ranking
    * is the bounded [[TopK.groupedWithRank]] partial-aggregate top-k —
    * the map side truncates to k per doc BEFORE the shuffle, the same
    * no-window shape as the ANN rankers.
    */
  def tfidfKeywords(documents: DataFrame, k: Int = 3): DataFrame = {
    val toks = tokens(documents)
    val tf = toks.select(col("doc_id"), explode(col("__t")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("__N"))
    val scored = tf.join(dfq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("__N") + 1).cast("double") / (col("df") + 1)) + 1), 6))
    TopK.groupedWithRank(scored, Seq(col("doc_id")), k,
      Seq(TopK.descNum(col("score")), col("term")))
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("score"))
  }
}
