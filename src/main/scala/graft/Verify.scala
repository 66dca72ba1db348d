package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir, SparkEntry.queries.keySet)
    spark.stop()
  }

  /** Dump the named queries' results and their oracle SQL — shared by the
    * full driver run above and the subset iteration tool
    * ([[graft.tools.VerifySome]]). A failing query is reported and
    * skipped, never aborting the rest of the batch.
    */
  def dump(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      names: Set[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // release any localCheckpoint blocks the plan pinned, success or
        // not — 153 queries in one session would otherwise accumulate
        // every checkpointed intermediate until sessions end
        finally graft.ops.Dedup.releaseCheckpoints(df)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any STALE output from a previous run into the same dir:
        // a plan-time failure throws BEFORE overwrite clears the target,
        // and a leftover good result would make the compare report a
        // false PASS for a query that no longer runs
        deleteRecursively(Paths.get(s"$outDir/$name"))
      }
    }
    // shared fixtures (co-purchase edges) are deliberate cross-query pins
    // with an explicit lifecycle — free them now that the batch is done
    SparkEntry.releaseSharedFixtures()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
