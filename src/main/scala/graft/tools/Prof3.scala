package graft.tools

import graft.{Sessions, Tables}
import graft.ops.{Dedup, FuzzyMatch}
import org.apache.spark.sql.functions._

/** Scratch breakdown of q_fuzzy_join: join volume vs each scorer's cost. */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val labelsSrc = Tables.load(spark, sfDir, "part").select(
      concat(col("p_name"), lit(" "), lower(col("p_type")), lit(" "),
        col("p_brand")).as("label"))
    def time(what: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof3] $what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    FuzzyMatch.ensureRegistered(spark)
    val labels = labelsSrc
      .where(col("label").isNotNull)
      .dropDuplicates("label")
      .select(col("label"),
        split_part(col("label"), lit(" "), lit(1)).as("_f"),
        floor(length(col("label")) / 8).as("_lb"))
    import org.apache.spark.sql.expressions.Window
    val blocked = labels
      .withColumn("_bucket_n",
        count(lit(1)).over(Window.partitionBy("_f", "_lb")))
      .filter(col("_bucket_n") <= 100000)
      .drop("_bucket_n")
      .localCheckpoint()
    val a = blocked.repartition(col("label"))
      .select(col("_f"), col("_lb"), col("label").as("a_label"))
    val b = blocked.select(col("_f"), col("_lb"), col("label").as("b_label"))
    val joined = a.join(b, Seq("_f", "_lb"))
    val octf = abs(octet_length(col("a_label")) - octet_length(col("b_label"))) <= 4
    val dlb = FuzzyMatch.damerauLevenshtein(col("a_label"), col("b_label"), 4)
    (1 to 2).foreach { _ =>
      time("join-count")(joined.count())
      time("join+octet")(joined.filter(octf).count())
      time("join+octet+ab")(joined.filter(octf && col("a_label") < col("b_label")).count())
      time("join+octet+ab+dl")(joined.filter(octf && col("a_label") < col("b_label") && dlb <= 4).count())
      time("full")(FuzzyMatch.fuzzyPairs(labelsSrc, maxDist = 4)
        .select("a_label", "b_label", "lev", "dl")
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

/** Driver-side tight-loop micro-benchmark of the DP kernels. */
object Prof3Kernel {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val calc = new graft.plans.EditSimilarity.Calc
    val rnd = new scala.util.Random(7)
    val words = Array("small", "red", "blue", "green", "golden", "large")
    val types = Array("economy", "small", "medium", "large", "standard", "promo")
    val labels = Array.fill(4000)(
      u8(s"${words(rnd.nextInt(6))} widget ${types(rnd.nextInt(6))} Brand#${rnd.nextInt(25)}"))
    def bench(what: String)(f: (Int, Int) => Int): Unit = {
      var sink = 0
      val n = 2000000
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        sink += f(i % 4000, math.abs(i * 7919) % 4000)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kernel] $what%-16s $n calls in $sec%.2f s (${sec * 1e9 / n}%.0f ns/call) sink=$sink")
    }
    (1 to 2).foreach { _ =>
      bench("dl-banded4")((a, b) => calc.damerauBounded(labels(a), labels(b), 4))
      bench("dl-full")((a, b) => calc.damerau(labels(a), labels(b)))
      bench("jw")((a, b) => calc.jaroWinkler(labels(a), labels(b)).toInt)
    }
  }
}
