package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for test suites (one JVM-wide session). */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", 4)
}
