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
    time("warmup")(docs.count())
    val postings = Dedup.shinglePostings(docs).select(col("doc_id"), col("h"))
    time("postings noop")(noop(postings))
    val sig = Dedup.minhashSignatures(postings)
    time("signatures noop")(noop(sig))
    time("minhash full 1st")(Dedup.minhashPairs(docs).count())
    time("minhash full 2nd")(Dedup.minhashPairs(docs).count())
    time("ngram full 1st")(Dedup.ngramJaccard(docs).count())
    time("ngram full 2nd")(Dedup.ngramJaccard(docs).count())
    spark.stop()
  }
}
