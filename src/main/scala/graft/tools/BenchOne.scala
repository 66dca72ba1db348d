package graft.tools

import graft.{Sessions, SparkEntry}

object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allQueries("q_stream_counts")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    var times = Seq.empty[Double]
    for (i <- 1 to reps) {
      val keepBefore = SparkEntry.sharedFixtureRddIds
      val persisted = spark.sparkContext.getPersistentRDDs.keySet
      println(s"BENCHONE pre-rep$i keep=$keepBefore persisted=${persisted.toSeq.sorted}")
      val t0 = System.nanoTime()
      val df = SparkEntry.allQueries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.Dedup.releaseCheckpoints(df)
      val keep = SparkEntry.sharedFixtureRddIds
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id))
        .foreach(_.unpersist(blocking = true))
      println(f"BENCHONE $name rep$i=$sec%.2fs keepAfter=$keep")
      times :+= sec
    }
    // machine-readable rep times for Bench.freshJvmMin (ADVICE r13: the
    // stdout-regex scrape is fragile — a truncated pipe or interleaved
    // log line silently drops reps); human-readable stdout stays
    sys.env.get("SPARK_GRAFT_BENCHONE_OUT").foreach { path =>
      val json = times.map(t =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
        .mkString(s"""{"name":"$name","reps":[""", ",", "]}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path), json.getBytes("UTF-8"))
    }
    SparkEntry.releaseSharedFixtures()
    spark.stop()
  }
}
