package graft.tools

import graft.{Sessions, Tables}
import graft.ops
import graft.ops.{ColbertIndex, Retrieval, TextAnalysis, Dedup}
import org.apache.spark.sql.functions._

/** Scratch stage-level breakdown of the ColBERT persisted search and
  * the in-memory late-interaction build+serve (guide §1): which of the
  * driver collects / pruned reads / serve joins owns the 3.2 s.
  */
object ProfColbert {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profc] $what%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm
    val tmp = java.nio.file.Files.createTempDirectory("profc")
    try {
      ColbertIndex.writeColbertIndex(docs, tmp.toString, dfCapPermille = 750)
      val queries = docs.filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"), col("text"))
      for (rep <- 1 to 3) {
        println(s"== rep $rep ==")
        // replicate searchColbertIndex stage by stage
        val ver = ColbertIndex.currentVersionDir(tmp.toString)
        val segs = Seq(0L) // fresh build: one committed segment
        val metaRows = timed("meta read+params+ndocs") {
          spark.read.parquet(s"$ver/meta")
            .filter(col("seg").isin(segs: _*)).collect()
        }
        val qtoks = timed("qtoks collect") {
          queries.select(explode(array_distinct(slice(
            TextAnalysis.normTokens(coalesce(col("text"), lit(""))),
            1, 16))).as("tok")).distinct().collect().map(_.getString(0)).toSeq
        }
        import spark.implicits._
        val tokBuckets = timed("bucketsOf(qtoks)") {
          qtoks.toDF("tok")
            .select(col("tok"), pmod(hash(col("tok")), lit(16)).as("b"))
            .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
        }
        val probed = tokBuckets.values.toSeq.distinct
        val nDocs = metaRows.map(_.getAs[Long]("n_docs")).sum
        val kept = timed("df pruned read -> kept") {
          spark.read.parquet(s"$ver/df")
            .filter(col("tok_bucket").isin(probed: _*) &&
              col("tok").isin(qtoks: _*) && col("seg").isin(segs: _*))
            .groupBy("tok").agg(sum("df").as("df"))
            .filter(col("df") * 1000 <= lit(750L) * lit(nDocs))
            .select("tok").collect().map(_.getString(0)).toSeq
        }
        val kb = kept.map(tokBuckets).distinct
        val ctokDF = spark.read.parquet(s"$ver/ctok")
          .filter(col("tok_bucket").isin(kb: _*) &&
            col("tok").isin(kept: _*) && col("seg").isin(segs: _*))
          .select("tok", "cand_id")
        val masksDF = spark.read.parquet(s"$ver/masks")
          .filter(col("seg").isin(segs: _*))
          .select("cand_id", "csv")
        timed("ctok pruned read (count)")(ctokDF.count())
        timed("masks read (count)")(masksDF.count())
        val out = timed("serve (noop)") {
          val o = Retrieval.lateInteractionServe(queries,
            Retrieval.LateInteractionIndex(
              kept.toDF("tok"), ctokDF, masksDF, 16, 16, 64),
            5, "text")
          o.write.format("noop").mode("overwrite").save()
          o
        }
        timed("full searchColbertIndex (noop)") {
          val o = ColbertIndex.searchColbertIndex(
            spark, tmp.toString, queries, k = 5)
          o.write.format("noop").mode("overwrite").save()
          Dedup.releaseCheckpoints(o)
        }
        // in-memory build+serve split for q_late_interaction
        timed("lateInteractionIndex build") {
          val idx = Retrieval.lateInteractionIndex(docs, dfCapPermille = 750)
          val o = timed("  serve only (noop)") {
            val o = Retrieval.lateInteractionServe(queries, idx, 5, "text")
            o.write.format("noop").mode("overwrite").save()
            o
          }
          Dedup.releaseCheckpoints(o)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        }
        Dedup.releaseCheckpoints(out)
      }
    } finally {
      val w = java.nio.file.Files.walk(tmp)
      try w.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    spark.stop()
  }
}
