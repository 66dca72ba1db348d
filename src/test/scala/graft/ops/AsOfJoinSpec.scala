package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:00:10"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:07"), 50.0),
    (4L, "C", ts("2024-01-01 10:00:01"), 7.0) // key with no quotes at all
  ).toDF("trade_id", "sym", "ts", "px")
    .withColumnRenamed("sym", "key")

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:03"), 99.5),
    ("A", ts("2024-01-01 10:00:10"), 100.5), // equal-ts: matches trade 2
    ("B", ts("2024-01-01 10:00:09"), 49.0)   // after trade 3: no match
  ).toDF("key", "ts", "quote")

  test("backward as-of: latest at-or-before match per key; misses stay null") {
    val out = AsOfJoin.asOfBackward(trades, quotes, "ts", Seq("key"), Seq("quote"))
      .orderBy("trade_id")
      .select("trade_id", "quote").as[(Long, Option[Double])].collect()
    out shouldBe Array(
      1L -> Some(99.5),  // 10:00:03 quote
      2L -> Some(100.5), // equal timestamp is inclusive
      3L -> None,        // B's only quote is later
      4L -> None)        // key never quoted
  }

  test("tolerance nulls out stale matches but keeps the row") {
    val out = AsOfJoin.asOfBackward(
      trades, quotes, "ts", Seq("key"), Seq("quote"),
      tolerance = Some(expr("INTERVAL 1 SECOND")))
      .orderBy("trade_id")
      .select("trade_id", "quote").as[(Long, Option[Double])].collect()
    // trade 1 is 2s after its quote -> stale under 1s tolerance
    out.map(_._2) shouldBe Array(None, Some(100.5), None, None)
    out.length shouldBe 4 // left-join row count preserved
  }

  test("forward as-of: earliest at-or-after match per key, tolerance bounds lookahead") {
    val out = AsOfJoin.asOfForward(trades, quotes, "ts", Seq("key"), Seq("quote"))
      .orderBy("trade_id")
      .select("trade_id", "quote").as[(Long, Option[Double])].collect()
    out shouldBe Array(
      1L -> Some(100.5), // next A quote at 10:00:10
      2L -> Some(100.5), // equal timestamp is inclusive forward too
      3L -> Some(49.0),  // B's later quote now matches
      4L -> None)
    val tight = AsOfJoin.asOfForward(trades, quotes, "ts", Seq("key"), Seq("quote"),
      tolerance = Some(expr("INTERVAL 2 SECONDS")))
      .orderBy("trade_id")
      .select("trade_id", "quote").as[(Long, Option[Double])].collect()
    // trade 1's next quote is 5s ahead -> beyond 2s lookahead; trade 3's is 2s
    tight.map(_._2) shouldBe Array(None, Some(100.5), Some(49.0), None)
  }

  test("matched right timestamp surfaces as asof_<timeCol>") {
    val row = AsOfJoin.asOfBackward(trades, quotes, "ts", Seq("key"), Seq("quote"))
      .filter(col("trade_id") === 1L).head
    row.getAs[Timestamp]("asof_ts") shouldBe ts("2024-01-01 10:00:03")
    row.getAs[Double]("px") shouldBe 100.0 // left payload passthrough
  }

  test("payload name collisions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(trades, quotes.withColumnRenamed("quote", "px"),
        "ts", Seq("key"), Seq("px"))
    }
    e.getMessage should include("collides")
  }
}
