package graft.tools

import graft.{Sessions, Tables}
import graft.ops
import org.apache.spark.sql.functions._

/** Scratch: where does a BM25 segment write spend — and how many files
  * does it produce (guide §6 small-files check).
  */
object ProfBm25Build {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profb] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def countFiles(p: String): Long = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try w.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally w.close()
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      val tmp = java.nio.file.Files.createTempDirectory("profb")
      try {
        timed("writeBm25Index(full)")(
          ops.Bm25Index.writeBm25Index(docs, tmp.toString))
        println(s"[profb] postings files: ${countFiles(s"$tmp/v0/postings")}")
        println(s"[profb] terms files:    ${countFiles(s"$tmp/v0/terms")}")
        timed("search")(
          ops.Bm25Index.searchBm25Index(
            spark, tmp.toString, Seq("dup", "spark", "join"))
            .write.format("noop").mode("overwrite").save())
      } finally {
        val w = java.nio.file.Files.walk(tmp)
        try w.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
        finally w.close()
      }
    }
    spark.stop()
  }
}
