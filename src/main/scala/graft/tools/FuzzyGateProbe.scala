package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Focused timing of the #49h streaming fuzzy gate vs bench-artifact
  * size (dev diagnostic): the literal gate's per-row cost is
  * O(benchKeys + candidates·|shingles|) by design — this measures
  * where that stops being "benchmark-bounded ≈ free" as the bench
  * carve grows, separating artifact build from gate eval.
  */
object FuzzyGateProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark: SparkSession = GraftSession.builder("graft-fuzzy-probe")
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spread the gate projection across cores (one small parquet file
    // reads as ONE partition — the exactSpans lesson); the operator
    // itself stays a pure projection so streaming stays legal.
    val docs = Tables.documents(spark, d).repartition(8, col("doc_id"))
    docs.count()
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fuzzy-probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // benchMod sweep: smaller mod = bigger bench carve.
    Seq(400, 100, 40, 20).foreach { mod =>
      val (fk, fs) = t(s"artifact mod=$mod")(
        Dedup.benchFuzzyArtifact(docs, benchMod = mod))
      println(s"[fuzzy-probe] mod=$mod keys=${fk.length} benches=${fs.length} " +
        s"shingleTotal=${fs.map(_._2.length.toLong).sum}")
      val gate = Dedup.withContaminationFuzzy(docs, fk, fs)
      t(s"gate eval mod=$mod")(gate.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
