package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage timing for the dedup operators (dev diagnostics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val docs = Tables.documents(spark, d)
    time("warmup scan")(docs.count())
    time("scan again")(docs.count())
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
    time("tokens noop")(noop(toks))
    val sh = toks.select(col("doc_id"), Dedup.bigramShinglesFromTokens(col("t")).as("sh"))
    time("shingles noop")(noop(sh))
    val hs = sh.select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
    time("hashed noop")(noop(hs))
    val full = Dedup.withHashedShingles(docs)
    time("withHashedShingles noop")(noop(full))
    val mh = full.select(col("doc_id"), col("hs")).filter(size(col("hs")) > 0)
      .withColumn("mh", Dedup.minhashSignature(col("hs")))
    time("minhash sig noop")(noop(mh))
    spark.stop()
  }
}
