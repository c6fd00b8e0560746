package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("pq-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      println(s"== $sf rows=${emb.count()}")
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val exact = pairs(Similarity.cosineTopK(emb, nQueries = 10, k = 5))
      val seeded = pairs(Similarity.pqTopKSeeded(emb))
      val fit = pairs(Similarity.pqTopK(emb))
      println(s"recall seeded=${(exact intersect seeded).size / exact.size.toDouble}")
      println(s"recall fit   =${(exact intersect fit).size / exact.size.toDouble}")
      // full-refine must equal brute force
      val full = Similarity.pqTopKSeeded(emb, refine = 1000)
        .select("query_id","rk","neighbor_id","cos_sim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val bf = Similarity.cosineTopK(emb).select("query_id","rk","neighbor_id","cos_sim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      println(s"fullRefine==bruteForce: ${full == bf}")
    }
    spark.stop()
  }
}
