package graft.tools

import graft.{Sessions, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Scratch: which half of embeddingDupsUnion owns q_embed_recall_union's
  * found-side cost (byCell hier chain vs portable RHP-LSH), and how much
  * the exact truth side costs beside them.
  */
object ProfUnion {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profu] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    val emb = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 2000L)
    emb.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      timed("truth exact all-pairs") {
        Dedup.embeddingDups(emb.withColumn("label", lit(0)), 0.35)
          .select("a_id", "b_id")
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
      timed("byCell (auto, probe2)") {
        Dedup.embeddingDupsByCell(emb, 0.35, nCells = 0,
          targetPerCell = 128L)
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
      timed("lsh portable") {
        Dedup.embeddingDupsByLshPortable(emb, 0.35)
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
      timed("union (both)") {
        Dedup.embeddingDupsUnion(emb, 0.35, nCells = 0,
          targetPerCell = 128L)
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
    }
    spark.stop()
  }
}
