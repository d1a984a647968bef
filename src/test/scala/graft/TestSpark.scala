package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (sbt runs suites in one JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
}
