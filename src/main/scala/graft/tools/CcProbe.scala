package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession
import graft.operators._
import graft.sources.Tables

/** Dev diagnostic: times the CC resolution paths (plain hash-min vs
  * pointer-jump) on the sf0.1 embeddings — the round-5 regression probe.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-cc-probe")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noopTime(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val emb = Tables.embeddings(spark, d)
    emb.count()
    (1 to 2).foreach { pass =>
      val tEmitLabel = noopTime(Similarity.nearDupPairs(emb, minCosine = 0.3))
      val tEmitLsh = noopTime(Similarity.nearDupPairsLsh(emb, minCosine = 0.3))
      val tPlain = noopTime(Components.dedupClusters(
        Similarity.nearDupPairs(emb, minCosine = 0.3), "id1", "id2"))
      val tJump = noopTime(Components.dedupClusters(
        Similarity.nearDupPairs(emb, minCosine = 0.3), "id1", "id2",
        pointerJump = true))
      val tLshPlain = noopTime(Components.dedupClusters(
        Similarity.nearDupPairsLsh(emb, minCosine = 0.3), "id1", "id2"))
      val tLshJump = noopTime(Components.dedupClusters(
        Similarity.nearDupPairsLsh(emb, minCosine = 0.3), "id1", "id2",
        pointerJump = true))
      println(f"[cc-probe] pass=$pass emit_label=$tEmitLabel%.2f " +
        f"emit_lsh=$tEmitLsh%.2f plain=$tPlain%.2f jump=$tJump%.2f " +
        f"lsh_plain=$tLshPlain%.2f lsh_jump=$tLshJump%.2f")
    }
    spark.stop()
  }
}
