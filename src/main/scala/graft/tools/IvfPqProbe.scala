package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("ivfpq-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val exact = pairs(Similarity.cosineTopK(emb, nQueries = 10, k = 5))
      val seeded = pairs(Similarity.ivfpqTopKSeeded(emb))
      val fit = pairs(Similarity.ivfpqTopK(emb))
      val allProbeFullRefine = pairs(Similarity.ivfpqTopKSeeded(emb, nProbe = 16, refine = 1000))
      println(s"== $sf recall seeded=${(exact intersect seeded).size / 5.0 / 10}" +
        s" fit=${(exact intersect fit).size / 5.0 / 10}" +
        s" allprobe_fullrefine_eq=${allProbeFullRefine == exact}")
    }
    spark.stop()
  }
}
