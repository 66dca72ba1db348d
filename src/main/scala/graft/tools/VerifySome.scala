package graft.tools

import graft.{Sessions, SparkEntry, Verify}

/** Iteration twin of [[graft.Verify]]: dump only the NAMED queries (plus
  * their oracle SQL) so a new operator can be oracle-checked in seconds
  * instead of re-running all of them. Same dump path as the driver run —
  * [[graft.Verify.dump]] — so the two can never drift.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <name...>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    require(names.nonEmpty, "pass at least one query name")
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.dump(spark, sfDir, outDir, names)
    // report honestly: dump() deletes the output dir of a failed query
    // (stale-result protection), so existence == success
    names.toSeq.sorted.foreach { n =>
      val ok = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/$n"))
      println(s"[verifysome] ${if (ok) "dumped" else "FAILED"} $n")
    }
    spark.stop()
  }
}
