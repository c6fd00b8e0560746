package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Dev diagnostic: dumps the formatted physical plans of the ANN
  * rankers so the shuffle/exchange shape can be eyeballed — the
  * round-5 de-skew check (no corpus-wide Window exchange into
  * nQueries partitions; no Exchange between the scan and the IVF cell
  * assignment).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-plan-audit")
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, d)
    println("=== cosineTopK ===")
    Similarity.cosineTopK(emb).explain("formatted")
    println("=== lshTopK ===")
    Similarity.lshTopK(emb).explain("formatted")
    println("=== ivfTopK ===")
    Similarity.ivfTopK(emb).explain("formatted")
    spark.stop()
  }
}
