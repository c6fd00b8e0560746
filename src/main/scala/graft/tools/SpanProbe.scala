package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Long-island crossover probe (dev diagnostics, r7 verdict item 3):
  * MEASURES the documented [[Dedup.maximalSpans]] (string suffix sort)
  * vs [[Dedup.maximalSpansPD]] (Manber–Myers prefix-doubling) crossover
  * on the shape the argument predicts it for — multi-KB repeated blocks
  * (license texts / boilerplate headers), where the string plan ships
  * O(L²/2) suffix chars per island through the range sort while PD
  * ships O(L·log L) fixed-width rows.
  *
  * Corpus: `nDocs` documents, each = unique filler + one of `nBlocks`
  * shared blocks of `blockLen` chars (each block repeated in
  * nDocs/nBlocks docs) + unique filler. Filler is doc-seeded so only
  * the planted blocks duplicate. Both plans are asserted row-identical
  * per shape before timing is trusted.
  */
object SpanProbe {
  private def mulberry(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 16 }
  }

  /** Deterministic printable gibberish, distinct per (seed). */
  private def fill(seed: Long, n: Int): String = {
    val r = mulberry(seed)
    val sb = new StringBuilder(n)
    while (sb.length < n) sb.append(('a' + (r() % 26)).toChar)
    sb.toString
  }

  def corpus(spark: SparkSession, nDocs: Int, nBlocks: Int,
             blockLen: Int, fillerLen: Int): DataFrame = {
    import spark.implicits._
    val blocks = (0 until nBlocks).map(b => fill(0xB10C000L + b, blockLen))
    (0 until nDocs).map { i =>
      val txt = fill(0xF111000L + i * 2, fillerLen) +
        blocks(i % nBlocks) + fill(0xF111000L + i * 2 + 1, fillerLen)
      (i.toLong, txt)
    }.toDF("doc_id", "text").repartition(32)
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.builder("graft-span-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Sweep: island length rising, doc count falling, so the string
    // plan's suffix payload (nDocs · L²/2 chars) climbs 17 MB → 800 MB
    // while PD's fixed-width rows (nDocs · L · log L) stay ~flat.
    // levels sized per shape (cap 2^levels−1 > blockLen).
    // (blockLen, nBlocks, nDocs, levels)
    val shapes = Seq(
      (256, 16, 512, 9),
      (1024, 8, 256, 11),
      (4096, 4, 96, 13),
      (8192, 2, 24, 14),
      (16384, 2, 32, 15))
    // warmup (JIT + codegen caches) — discard
    locally {
      val d = corpus(spark, 64, 4, 256, 256)
      time(Dedup.maximalSpans(d, 40, 9)); time(Dedup.maximalSpansPD(d, 40, 9))
    }
    shapes.foreach { case (blockLen, nBlocks, nDocs, levels) =>
      val d = corpus(spark, nDocs, nBlocks, blockLen, 512).cache()
      d.count()
      val sortT = time(Dedup.maximalSpans(d, 40, levels))
      val pdT = time(Dedup.maximalSpansPD(d, 40, levels))
      // trust the timing only if the twins agree on this shape
      val a = Dedup.maximalSpans(d, 40, levels)
        .orderBy("doc_id", "span_start").collect().toSeq
      val b = Dedup.maximalSpansPD(d, 40, levels)
        .orderBy("doc_id", "span_start").collect().toSeq
      require(a == b, s"twins disagree at blockLen=$blockLen")
      val suffixMB = nDocs.toLong * blockLen * blockLen / 2 / 1e6
      println(f"[spanprobe] blockLen=$blockLen%6d nDocs=$nDocs levels=$levels " +
        f"stringSort=$sortT%7.2fs pd=$pdT%7.2fs spans=${a.size}%6d " +
        f"suffixPayload=$suffixMB%9.1fMB")
      d.unpersist()
    }
    spark.stop()
  }
}
