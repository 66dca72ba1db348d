package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewAggSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("salted aggregation equals the direct groupBy exactly") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val salted = SkewAgg.saltedStats(ev, "event_type", "value", col("event_id"))
      .orderBy("event_type").collect().map(_.toSeq)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect().map(_.toSeq)
    salted shouldBe direct
  }

  test("salted join equals the plain join exactly") {
    val fact = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "k")
    val dim = Seq(("a", 10L), ("b", 20L)).toDF("k", "v")
    val salted = SkewAgg.saltedJoin(fact, dim, "k", col("id"), buckets = 4)
      .select("id", "k", "v").orderBy("id").collect().map(_.toSeq)
    val plain = fact.join(dim, "k")
      .select("id", "k", "v").orderBy("id").collect().map(_.toSeq)
    salted shouldBe plain
    salted.length shouldBe 3  // 'c' has no dim row: inner join drops it
  }

  test("buckets=1 degrades to the plain two-step aggregation") {
    val df = Seq(("a", 1.5, 1L), ("a", 2.5, 2L), ("b", 3.0, 3L))
      .toDF("k", "v", "id")
    val out = SkewAgg.saltedStats(df, "k", "v", col("id"), buckets = 1)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(("a", 2L, 4.0), ("b", 1L, 3.0))
  }

  test("skewKeys flags only keys above factor x median") {
    // counts: a=1, b=2, c=3, hot=10 -> median 2.5; factor 2 -> cutoff 5
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(10)("hot")
    val out = SkewAgg.skewKeys(rows.toDF("k"), "k", factor = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(("hot", 10L, 4000L)) // 1000*10/2.5
  }
}
