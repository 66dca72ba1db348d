package graft.tools

import graft.{Sessions, Tables}
import graft.ops.{Dedup, Similarity}

/** Round-11 assignment-cost probe: FLAT vs HIERARCHICAL IVF assignment
  * across the cell-count band the round-10 probe measured (157 / 391 /
  * 783 cells at sf1). Flat assignment is O(N·k) — the band probe showed
  * it overtaking the pair join it shrinks once k grows past ~160 at
  * sf1 (391 cells = 22.4 s end-to-end). The hierarchical path is
  * O(N·(√k + p·√k)) and its per-vector cost should stay ~flat as k
  * grows — this probe prints exactly that comparison, assignment
  * only (noop-materialized), best of 2.
  *
  * Usage: runMain graft.tools.HierProbe [sfDir] [cells...]
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val cells =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(157, 391, 783)
    val spark = Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-hierprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    println(s"[hierprobe] embeddings rows: ${emb.count()}")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        Dedup.releaseCheckpoints(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hierprobe] $label%-28s best=${secs.min}%6.2fs " +
        f"runs=${secs.map(s => f"$s%.2f").mkString(",")}")
      secs.min
    }
    cells.foreach { k =>
      time(s"flat  assign k=$k")(
        Similarity.ivfAssignProbe(emb, k, nProbe = 2))
      time(s"hier  assign k=$k")(
        Similarity.ivfAssignHierProbe(emb, k, nProbe = 2).drop("cell_sim"))
    }
    spark.stop()
  }
}
