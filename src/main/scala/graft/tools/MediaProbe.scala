package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Scaling sweep for the r11 media/encoding tier (dev diagnostics, the
  * ScaleProbe discipline): times the dHash signature pass, the full
  * perceptual near-dup join, the CC resolution, and the encoding-repair
  * chain on 1×/2×/4× the sf0.1 document corpus — each copy id-shifted
  * so the pair/banding key space grows with the data (more documents,
  * same near-dup density: the real multimodal-corpus shape). Linear
  * wall-time across the sweep is the empirical check behind the §5
  * claims: signatures are payload-local mapPartitions work, the banding
  * shuffles 20-byte rows, and the repair is a pure projection.
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder("graft-media-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noopTime(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    base.count() // warm scan
    // First k=1 line is codegen/JIT warmup — discard it.
    Seq(1, 1, 2, 4).foreach { k =>
      // Each copy's text is prefixed with a copy tag: the id-shifted
      // copies must NOT be exact/near dups of each other (a shift-only
      // copy is content-identical, so pair density would grow with k²
      // instead of staying constant — the wrong shape to sweep).
      val docs = (0 until k).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text", concat(lit("copy" + i + " "), col("text"))))
        .reduce(_ unionByName _)
      val media = graft.ops.Multimodal.asMedia(docs)
      val tSig = noopTime(graft.ops.Multimodal.perceptualSig(media).toDF())
      val tPairs = noopTime(graft.ops.Multimodal.mediaNearDup(media))
      val tClusters = noopTime(graft.operators.Components.dedupClusters(
        graft.ops.Multimodal.mediaNearDup(media).select(col("id1"), col("id2")),
        "id1", "id2"))
      val tFix = noopTime(graft.operators.Encoding.withFixedEncoding(docs))
      println(f"[media-scale] k=$k docs=${k * 5000L} sig=$tSig%.2f " +
        f"pairs=$tPairs%.2f clusters=$tClusters%.2f fix_encoding=$tFix%.2f")
    }
    spark.stop()
  }
}
