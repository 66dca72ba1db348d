package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch per-query profiler: times each named declared query N times on
  * a chosen sf dir (noop sink, same materialization rule as Bench).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.allQueries("q_stream_counts")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm-up
    args.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.allQueries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
