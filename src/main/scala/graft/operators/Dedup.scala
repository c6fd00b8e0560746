package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM-training-data pipelines (SURVEY §2
  * #37–40): exact hashing, MinHash-LSH banding, SimHash, and n-gram
  * Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB): no operator here ever
  * joins on raw text or enumerates the full document cross product.
  * - exact: one hash-groupBy (map-side combinable).
  * - minhash: per-doc signatures are fixed-size (Perms longs) regardless
  *   of document length; the candidate join runs on (band, band_key)
  *   keys; exact Jaccard runs only on candidate pairs.
  * - simhash: per-doc 64-bit signature; candidates via 16-bit chunk
  *   collisions (hamming ≤ 3 within any chunk guarantee needs 4 chunks).
  * - ngram_jaccard: candidates pre-bucketed by (source, lang) metadata.
  * All signature work is Catalyst HOFs (transform/filter/aggregate) over
  * token arrays — codegen'd, no Scala UDFs, parallel across documents.
  */
object Dedup {

  /** Word tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "[^a-z0-9]+")

  /** Distinct word-bigram shingles ("w1 w2"). Empty for 1-token docs. */
  def bigramShingles(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 2,
      array_distinct(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard of two distinct-element arrays (|∩| / |∪|). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / nullif((size(a) + size(b) - inter).cast("double"), lit(0.0))
  }

  /** #37 dedup_exact: group identical texts by sha2-256; canonical id =
    * lowest doc_id, with the copy count per content group.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        min(length(col("text"))).as("n_chars"))

  /** Number of MinHash permutations and LSH bands (Perms/Bands rows per
    * band). 32 perms × 8 bands of 4 ⇒ candidate recall ~1−(1−J⁴)⁸.
    */
  val Perms = 32
  val Bands = 8
  private val RowsPerBand = Perms / Bands

  /** MinHash signature: per permutation i, the minimum salted xxhash64
    * over the shingle set. Salting (shingle ⧺ "#i") replaces the classic
    * (a·h+b mod p) permutation family — same independence, no 128-bit
    * multiply.
    */
  def minhashSignature(shingles: Column): Column =
    array((0 until Perms).map { i =>
      array_min(transform(shingles, s => xxhash64(concat(s, lit(s"#$i")))))
    }: _*)

  /** #38 dedup_minhash: LSH candidate pairs verified by exact Jaccard.
    * Signatures band into Bands keys; docs sharing any (band, key) bucket
    * become candidates; candidates are verified against the true shingle
    * Jaccard. The join carries only (band, key, doc_id) — never text.
    */
  def minhashPairs(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    val sig = documents
      .select(col("doc_id"), bigramShingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mh", minhashSignature(col("sh")))
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("mh"), b * RowsPerBand + 1, RowsPerBand).cast("array<string>")))
            .as("band_key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    candidates
      .join(sig.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sig.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit j is set when more than half
    * the token hashes have bit j set. Token hashes computed once per doc;
    * the 64 bit-counts are codegen'd array scans.
    */
  def simhash(text: Column): Column = {
    val thash = transform(tokens(text), w => xxhash64(w))
    val n = size(thash)
    val bits = (0 until 64).map { j =>
      val cnt = size(filter(thash, h => shiftright(h, j).bitwiseAND(lit(1L)) === 1))
      when(cnt * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** #39 dedup_simhash: candidate pairs share at least one of four
    * 16-bit signature chunks (exact for hamming ≤ 3 by pigeonhole);
    * verified by full hamming distance ≤ maxHamming.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 8): DataFrame = {
    val sig = documents.select(col("doc_id"), simhash(col("text")).as("sim"))
    val chunked = sig.select(
      col("doc_id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk_key"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("sim"),
        col("ck.chunk").as("chunk"), col("ck.chunk_key").as("chunk_key"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_key") === col("b.chunk_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sim").as("sim1"), col("b.sim").as("sim2"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** #40 ngram_jaccard: exact bigram-shingle Jaccard for candidate pairs
    * sharing (source, lang) metadata buckets, at or above minJaccard.
    */
  def ngramJaccard(documents: DataFrame, minJaccard: Double = 0.05): DataFrame = {
    val d = documents.select(col("doc_id"), col("source"), col("lang"),
      bigramShingles(col("text")).as("sh"))
    d.as("a").join(d.as("b"),
        col("a.source") === col("b.source") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("n_common"),
        (size(col("a.sh")) + size(col("b.sh")) -
          size(array_intersect(col("a.sh"), col("b.sh")))).as("n_union"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
