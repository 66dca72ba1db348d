package graft.tools
import graft.{Sessions, SparkEntry}
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"########## $name")
      SparkEntry.allQueries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
