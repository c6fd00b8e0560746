package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Ad-hoc plan dump (dev diagnostics): prints the formatted physical
  * plan of the named SparkEntry queries on SPARK_GRAFT_SF_DIR — the
  * tool for checking pushdown / broadcast / exchange-reuse claims
  * without timing anything.
  *
  *   sbt "runMain graft.tools.Explain fund_fair_value_relative"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark: SparkSession = GraftSession.builder("graft-explain")
      .master("local[4]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[explain] $name: no such query")
        case Some(fn) =>
          println(s"===== $name =====")
          println(fn(spark, d).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
