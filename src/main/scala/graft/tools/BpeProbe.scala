package graft.tools
import org.apache.spark.sql.functions._
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 16
    val b0 = if (args.length > 1) args(1).toInt else 64
    val mx = if (args.length > 2) args(2).toInt else 1024
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val table = if (args.length > 4) args(4) else "customer"
    val colName = if (args.length > 5) args(5) else "c_name"
    val spark = graft.Sessions.builder("16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, table).select(col(colName).as("text"))
    val t0 = System.nanoTime()
    val out = graft.ops.TextAnalysis.bpeTrainAdaptive(docs, rounds = rounds, batch0 = b0, maxBatch = mx)
    val n = out.count()
    println(f"[bpeprobe] adaptive rounds=$rounds b0=$b0 mx=$mx table=$table merges=$n took=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
