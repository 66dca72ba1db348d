package graft.tools

import graft.{Sessions, Tables}

/** Explain-dump of an OP-LEVEL frame (not a declared query) — for plan
  * evidence on pipelines whose declared queries checkpoint-truncate
  * their final explain (the banding/signing projections materialize at
  * plan-build time and show up as `Scan ExistingRDD`). Currently knows
  * the portable MinHash banding frame.
  */
object PlanOf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    args.foreach {
      case "minhash_banding" =>
        println("########## minhash_banding")
        graft.ops.Dedup.minHashBandsPortable(docs).explain("formatted")
      case other => sys.error(s"unknown frame: $other")
    }
    spark.stop()
  }
}
