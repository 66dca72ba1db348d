package graft.tools

import graft.{Sessions, Tables}
import graft.ops
import org.apache.spark.sql.functions._

/** Scratch step-level breakdown of the persisted-index lifecycle
  * queries (guide §1: decide where the time goes before touching the
  * code): times each maintenance step of the ColBERT / BM25 / band
  * lifecycles separately, so job-count overhead vs shuffle cost vs
  * write cost is a number per step, not a guess per query.
  */
object ProfIdx {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profidx] $what%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def deleteTree(tmp: java.nio.file.Path): Unit = {
      val w = java.nio.file.Files.walk(tmp)
      try w.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm
    val which = if (args.isEmpty) Set("colbert", "bm25", "band") else args.toSet

    for (rep <- 1 to reps) {
      println(s"== rep $rep ==")
      if (which("colbert")) {
        val tmp = java.nio.file.Files.createTempDirectory("profidx-colbert")
        try {
          val half = timed("colbert:count-half")(docs.count() / 2)
          timed("colbert:build(half)")(
            ops.ColbertIndex.writeColbertIndex(
              docs.filter(col("doc_id") < half), tmp.toString,
              dfCapPermille = 750))
          timed("colbert:append")(
            ops.ColbertIndex.appendColbertIndex(
              docs.filter(col("doc_id") >= half), tmp.toString,
              tag = Some("b0")))
          timed("colbert:delete")(
            ops.ColbertIndex.deleteFromColbertIndex(tmp.toString,
              docs.filter(pmod(col("doc_id"), lit(10L)) === 3L)
                .select("doc_id"), spark))
          timed("colbert:compact")(
            ops.ColbertIndex.compactColbertIndex(tmp.toString, spark))
          val out = timed("colbert:search") {
            val o = ops.ColbertIndex.searchColbertIndex(
              spark, tmp.toString,
              docs.filter(col("doc_id") < 8 &&
                  pmod(col("doc_id"), lit(10L)) =!= 3L)
                .select(col("doc_id").as("query_id"), col("text")),
              k = 5)
              .orderBy("query_id", "rank")
            o.write.format("noop").mode("overwrite").save()
            o
          }
          graft.ops.Dedup.releaseCheckpoints(out)
        } finally deleteTree(tmp)
      }
      if (which("bm25")) {
        val tmp = java.nio.file.Files.createTempDirectory("profidx-bm25")
        try {
          val half = docs.count() / 2
          timed("bm25:build(half)")(
            ops.Bm25Index.writeBm25Index(
              docs.filter(col("doc_id") < half), tmp.toString))
          timed("bm25:append")(
            ops.Bm25Index.appendBm25Index(
              docs.filter(col("doc_id") >= half), tmp.toString))
          timed("bm25:delete")(
            ops.Bm25Index.deleteFromBm25Index(tmp.toString,
              docs.filter(pmod(col("doc_id"), lit(10L)) === 3L)
                .select("doc_id"), spark))
          timed("bm25:compact")(
            ops.Bm25Index.compactBm25Index(tmp.toString, spark))
          timed("bm25:search")(
            ops.Bm25Index.searchBm25Index(
              spark, tmp.toString, Seq("spark", "data", "join"), k = 20)
              .write.format("noop").mode("overwrite").save())
        } finally deleteTree(tmp)
      }
      if (which("band")) {
        val tmp = java.nio.file.Files.createTempDirectory("profidx-band")
        try {
          timed("band:build(<200)")(
            ops.BandIndex.writeBandIndex(
              docs.filter(col("doc_id") < 200L).select("doc_id", "text"),
              tmp.toString, storeTexts = true))
          timed("band:increment") {
            val o = ops.BandIndex.dedupAgainstBandIndex(
              docs.filter(col("doc_id") >= 200L && col("doc_id") < 260L)
                .select("doc_id", "text"),
              tmp.toString,
              ops.BandIndex.storedTexts(spark, tmp.toString))
            o.write.format("noop").mode("overwrite").save()
            graft.ops.Dedup.releaseCheckpoints(o)
          }
        } finally deleteTree(tmp)
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
