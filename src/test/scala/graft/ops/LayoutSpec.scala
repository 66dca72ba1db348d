package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LayoutSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()

  test("clustered write: hive layout, partition pruning, content intact") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/ev"
    Layout.writeClustered(ev.select("event_id", "event_type", "user_id"),
      dir, partCols = Seq("event_type"), sortCols = Seq("user_id"))

    // hive-style partition directories exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    dirs.count(_.startsWith("event_type=")) should be >= 2

    // read-back is lossless
    val back = spark.read.parquet(dir)
    back.count() shouldBe ev.count()

    // a partition filter reaches the scan as PartitionFilters, so the
    // directories for other event types are never read
    val plan = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("event_type")
    back.filter(col("event_type") === "click").count() shouldBe
      ev.filter(col("event_type") === "click").count()

    // files per partition are bounded by the range distribution
    val clickFiles = new java.io.File(s"$dir/event_type=click")
      .listFiles().count(_.getName.endsWith(".parquet"))
    clickFiles should be <= 8
  }
}
