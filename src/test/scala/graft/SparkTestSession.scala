package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs. */
object SparkTestSession {
  lazy val spark: SparkSession = Udfs.newSession("local[4]", 8, "graft-test")
}
