package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for test suites (one JVM-wide session). */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session

  /** The repo-wide float publication rule (round(x, 6), HALF_UP — what
    * Spark's `round` and the DuckDB oracles both apply), for
    * hand-computed spec expectations.
    */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", 4)
}
