package graft.tools

/** Prints the physical plan of the hierarchical assignment itself
  * (pre-checkpoint — the checkpointed consumers hide it behind a
  * LogicalRDD scan).
  */
object HierPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    graft.ops.Similarity.ivfAssignHierProbe(emb, 16, nProbe = 2)
      .explain("formatted")
    spark.stop()
  }
}
