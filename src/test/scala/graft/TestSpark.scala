package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run. */
object TestSpark {
  lazy val spark: SparkSession = Sessions
    .builder("4")
    .appName("graft-test")
    .getOrCreate()

  def init(): SparkSession = {
    val s = spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
