package graft.tools

import graft.Sessions
import graft.ops.Dedup
import org.apache.spark.sql.functions.col

/** Scale-checkpoint probe: demonstrates that the quadratic-within-block
  * operators stay linear at 10× ONLY when the block count scales with the
  * corpus — the codebook-sizing rule (`nCells ∝ N / target cell size`)
  * that a fixed-parameter bench query can't show. Times
  * [[Dedup.embeddingDupsByCell]] on the scaled embeddings at the
  * bench-default cell count vs. a corpus-proportional one.
  *
  * Usage: `runMain graft.tools.ScaleProbe [sfDir] [nCellsSmall] [nCellsScaled]`
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val small = if (args.length > 1) args(1).toInt else 8
    val scaled = if (args.length > 2) args(2).toInt else 64
    val spark = Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    println(s"[scaleprobe] embeddings rows: ${emb.count()}")
    def time(nCells: Int): Unit = {
      // best-of-2, same protocol as Bench
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = Dedup.embeddingDupsByCell(emb, threshold = 0.95, nCells = nCells)
        df.write.format("noop").mode("overwrite").save()
        Dedup.releaseCheckpoints(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaleprobe] nCells=$nCells%-4d best=${secs.min}%6.2fs runs=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    time(small)
    time(scaled)
    spark.stop()
  }
}
