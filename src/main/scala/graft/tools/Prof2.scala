package graft.tools

import graft.{Sessions, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Scratch breakdown of q_dedup_groups: pair-verify cost vs CC-loop cost. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 500)
    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("a_id"))
      .crossJoin(ids.select(col("doc_id").as("b_id")))
      .filter(col("a_id") < col("b_id"))
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof2] $what%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 2).foreach { _ =>
      time("jaccard-verify") {
        Dedup.ngramJaccardPairs(docs, pairs).filter(col("jaccard") >= 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      // cache + materialize OUTSIDE the timed block, or cc-loop's first
      // checkpoint re-runs the whole pair verification and the breakdown
      // misattributes verify cost to the CC loop
      val verified = Dedup.ngramJaccardPairs(docs, pairs)
        .filter(col("jaccard") >= 0.5).cache()
      verified.count()
      time("cc-loop") {
        Dedup.duplicateGroups(verified).write.format("noop").mode("overwrite").save()
      }
      println(s"[prof2] n_edges = ${verified.count()}")
    }
    spark.stop()
  }
}
