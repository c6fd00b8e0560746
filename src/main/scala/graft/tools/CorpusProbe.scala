package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.operators.{Components, Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev diagnostic: corpus_pipeline stage cost split at sf0.1 —
  * quality gate, exact dedup, pair emission, CC resolution, final join.
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-corpus-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noopTime(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, d)
    docs.count()
    (1 to 2).foreach { pass =>
      val gated = TextAnalysis.withQuality(docs)
        .filter(col("lang").isin("en", "de", "es", "fr") && col("quality_score") >= 0.55)
      val tGate = noopTime(gated)
      val exactDeduped = gated
        .withColumn("__rn", row_number().over(
          Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1).drop("__rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tDedup = noopTime(exactDeduped)
      val pairs = Dedup.ngramJaccardInvertedIndex(exactDeduped, minJaccard = 0.5)
      val tPairs = noopTime(pairs)
      val t0 = System.nanoTime()
      val drops = Components.dedupClusters(pairs, "id1", "id2")
        .filter(col("is_canonical") === 0).select(col("id").as("doc_id"))
      val tCc = (System.nanoTime() - t0) / 1e9 + noopTime(drops)
      val tJoin = noopTime(
        TextAnalysis.splitByHash(
          exactDeduped.join(drops, Seq("doc_id"), "left_anti"), "doc_id", 0.05, 0.05))
      exactDeduped.unpersist()
      println(f"[corpus-probe] pass=$pass gate=$tGate%.2f dedup=$tDedup%.2f " +
        f"pairs=$tPairs%.2f cc=$tCc%.2f finaljoin=$tJoin%.2f")
    }
    spark.stop()
  }
}
