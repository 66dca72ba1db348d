package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch sequence timer: run the given queries IN ORDER in one JVM,
  * timing each (noop sink, per-query release + sweep — the Bench
  * execOnce discipline), to localize cross-query JVM-state effects
  * (e.g. the r13 q_fuzzy_join in-suite inflation). Args: query names;
  * a name may be suffixed `xN` to repeat it N times.
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allQueries("q_stream_counts")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val plan = args.toSeq.flatMap { a =>
      if (a.startsWith("prefix:")) {
        // all headline queries before the named one; an optional
        // `prefix:name:a:b` slices that list to [a, b)
        val parts = a.stripPrefix("prefix:").split(":")
        val upTo = graft.Bench.headline.takeWhile(_ != parts(0))
        if (parts.length == 3) upTo.slice(parts(1).toInt, parts(2).toInt)
        else upTo
      } else "^(.*)x([0-9]+)$".r.findFirstMatchIn(a) match {
        case Some(m) => Seq.fill(m.group(2).toInt)(m.group(1))
        case None => Seq(a)
      }
    }
    plan.foreach { name =>
      if (name == "gc") {
        System.gc(); Thread.sleep(2000); System.gc()
        println("BENCHSEQ [forced full GC]")
      } else if (name == "diag") {
        import scala.jdk.CollectionConverters._
        val pools = java.lang.management.ManagementFactory
          .getMemoryPoolMXBeans.asScala
        pools.foreach { p =>
          val u = p.getUsage
          println(f"BENCHSEQ [diag] pool=${p.getName}%-28s used=${u.getUsed >> 20}%5dMB max=${u.getMax >> 20}%6dMB")
        }
        println(s"BENCHSEQ [diag] threads=${Thread.activeCount()} " +
          s"loadedClasses=${java.lang.management.ManagementFactory.getClassLoadingMXBean.getLoadedClassCount}")
        Thread.getAllStackTraces.keySet.asScala.toSeq
          .groupBy(_.getName.replaceAll("[0-9]+", "N"))
          .view.mapValues(_.size).toSeq.sortBy(-_._2).take(12)
          .foreach { case (n, c) =>
            println(f"BENCHSEQ [diag] thread $n%-48s x$c") }
      } else {
      val t0 = System.nanoTime()
      val df = SparkEntry.allQueries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t1) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.Dedup.releaseCheckpoints(df)
      val keep = SparkEntry.sharedFixtureRddIds
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(blocking = true))
      println(f"BENCHSEQ $name%-28s $sec%7.3fs build=$tBuild%6.3fs plan=$tPlan%6.3fs")
      }
    }
    SparkEntry.releaseSharedFixtures()
    spark.stop()
  }
}
