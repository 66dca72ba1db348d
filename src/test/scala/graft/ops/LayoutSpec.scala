package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LayoutSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
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

  test("planCompaction bins by start offset, independent per group") {
    import spark.implicits._
    val files = Seq(
      ("a", 1L, 3000L), ("a", 2L, 3000L), ("a", 3L, 3000L),
      ("b", 1L, 5000L), ("b", 2L, 100L)
    ).toDF("grp", "path", "bytes")
    val plan = Layout.planCompaction(files, "grp", "path", "bytes", 4096L)
      .select("grp", "path", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: starts 0, 3000, 6000 -> bins 0, 0, 1;  b: starts 0, 5000 -> 0, 1
    plan shouldBe Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("b", 1L) -> 0L, ("b", 2L) -> 1L)
  }

  test("zorderAddress matches a reference bit-interleave") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L),
      (512L, 7L), (1024L + 3L, 2048L + 5L)) // out-of-range bits masked off
    val got = cases.toDF("x", "y")
      .select(Layout.zorderAddress(Seq(col("x"), col("y")), 10).as("z"))
      .as[Long].collect()
    got.toSeq shouldBe cases.map { case (x, y) => ref(x & 1023, y & 1023, 10) }
  }

  test("z-order buckets confine every dimension to a narrow window") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(pmod(col("l_partkey"), lit(1024L)).as("px"),
        pmod(col("l_suppkey"), lit(1024L)).as("sx"))
    val spans = li
      .withColumn("z", Layout.zorderAddress(Seq(col("px"), col("sx")), 10))
      .groupBy(shiftright(col("z"), 14).as("bucket"))
      .agg((max("px") - min("px")).as("pspan"), (max("sx") - min("sx")).as("sspan"))
      .agg(max("pspan"), max("sspan"))
      .head()
    // top-6 z-bits fix 3 high bits of EACH dim: span <= 127 of 1023.
    // a lexicographic (px, sx) bucketing would leave sspan ~ 1023.
    spans.getLong(0) should be <= 127L
    spans.getLong(1) should be <= 127L
  }

  test("z-ordered write: files own contiguous z-ranges on both dims") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"),
        pmod(col("l_partkey"), lit(1024L)).as("px"),
        pmod(col("l_suppkey"), lit(1024L)).as("sx"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/li"
    Layout.writeZOrdered(li, dir, Seq("px", "sx"), bits = 10, targetFiles = 8)
    val back = spark.read.parquet(dir)
    back.count() shouldBe li.count()
    // per-file min/max of the z-address do not overlap across files
    // (== contiguous ranges): that is exactly what row-group pruning uses
    val ranges = back
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .withColumn("z", Layout.zorderAddress(Seq(col("px"), col("sx")), 10))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .collect()
    ranges.sliding(2).foreach {
      case Array(a, b) => a.getAs[Long]("hi") should be <= b.getAs[Long]("lo")
      case _           =>
    }
  }

  test("bucketed tables join and aggregate with zero Exchanges, result intact") {
    import spark.implicits._
    val cust = (1L to 200L).map(i => (i, s"cust_$i")).toDF("c_custkey", "c_name")
    val ord = (1L to 2000L).map(i => (i % 180 + 1, i.toDouble)).toDF("o_custkey", "o_totalprice")
    Layout.writeBucketed(cust, "spec_bucket_customer", Seq("c_custkey"),
      numBuckets = 4, sortCols = Seq("c_custkey"))
    Layout.writeBucketed(ord, "spec_bucket_orders", Seq("o_custkey"),
      numBuckets = 4, sortCols = Seq("o_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // disable broadcast so a shuffle-free plan can only come from the
      // bucketed layout, not from a broadcast join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("spec_bucket_customer")
        .join(spark.table("spec_bucket_orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(sum("o_totalprice").as("spent"), count(lit(1)).as("n"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      // same result as the un-bucketed formulation
      val plain = cust.join(ord, col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(sum("o_totalprice").as("spent"), count(lit(1)).as("n"))
        .collect()
      rows.map(_.toSeq).toSet shouldBe plain.map(_.toSeq).toSet
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS spec_bucket_customer")
      spark.sql("DROP TABLE IF EXISTS spec_bucket_orders")
    }
  }
}
