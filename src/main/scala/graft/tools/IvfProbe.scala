package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Dev diagnostic: where does ann_ivf_topk spend its time — the k-means
  * fit or the assign+probe+rank query? Round-5 tuning probe.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-ivf-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    emb.count()
    (1 to 2).foreach { pass =>
      var t0 = System.nanoTime()
      val feat = emb.withColumn("v", col("embedding").cast("array<double>"))
        .select(array_to_vector(col("v")).as("features"))
      val model = new KMeans().setK(16).setSeed(42L)
        .setFeaturesCol("features").fit(feat)
      val tFit = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      Similarity.ivfTopK(emb).write.format("noop").mode("overwrite").save()
      val tFull = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val modelS = new KMeans().setK(16).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features")
        .fit(feat.sample(withReplacement = false, 0.1, 42L))
      val tFitSample = (System.nanoTime() - t0) / 1e9
      println(f"[ivf-probe] pass=$pass fit=$tFit%.2f full_query=$tFull%.2f " +
        f"fit_sample10pct_iter10=$tFitSample%.2f centers_moved=${
          model.clusterCenters.zip(modelS.clusterCenters).map { case (a, b) =>
            math.sqrt(a.toArray.zip(b.toArray).map(t => (t._1 - t._2) * (t._1 - t._2)).sum)
          }.max}%.3f")
    }
    spark.stop()
  }
}
