package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
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

  test("randomized: window-carry result equals the naive argmax join, both directions") {
    val rnd = new scala.util.Random(7)
    val ls = (1 to 150).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toString, rnd.nextInt(500).toLong))
    val rs = (1 to 80).map(i =>
      ((rnd.nextInt(5) + 1).toString, rnd.nextInt(500).toLong, i.toDouble))
    // dedup right per (key, t) like the operator contract expects a
    // deterministic right side: keep max payload
    val rMap = rs.groupBy(r => (r._1, r._2)).map { case (k, v) =>
      k -> v.map(_._3).max
    }
    val l = ls.toDF("id", "key", "t")
    val r = rMap.toSeq.map { case ((k, t), p) => (k, t, p) }.toDF("key", "t", "p")
    def naive(forward: Boolean): Map[Long, Option[Double]] = ls.map { case (id, k, t) =>
      val cands = rMap.collect {
        case ((rk, rt), p) if rk == k && (if (forward) rt >= t else rt <= t) => (rt, p)
      }
      id -> (if (cands.isEmpty) None
             else Some((if (forward) cands.minBy(_._1) else cands.maxBy(_._1))._2))
    }.toMap
    val back = AsOfJoin.asOfBackward(l, r, "t", Seq("key"), Seq("p"))
      .select("id", "p").as[(Long, Option[Double])].collect().toMap
    back shouldBe naive(forward = false)
    val fwd = AsOfJoin.asOfForward(l, r, "t", Seq("key"), Seq("p"))
      .select("id", "p").as[(Long, Option[Double])].collect().toMap
    fwd shouldBe naive(forward = true)
  }

  test("NULL keys and NULL timestamps follow SQL join semantics: never match, left rows kept") {
    val l = Seq(
      (10L, null.asInstanceOf[String], ts("2024-01-01 10:00:05"), 1.0), // NULL key
      (11L, "A", null.asInstanceOf[Timestamp], 2.0),                    // NULL left ts
      (12L, "A", ts("2024-01-01 10:00:06"), 3.0)
    ).toDF("trade_id", "key", "ts", "px")
    val r = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 10:00:01"), 9.0), // NULL key: matches nothing
      ("A", null.asInstanceOf[Timestamp], 8.0),                    // NULL right ts: matches nothing
      ("A", ts("2024-01-01 10:00:02"), 99.5)
    ).toDF("key", "ts", "quote")
    val back = AsOfJoin.asOfBackward(l, r, "ts", Seq("key"), Seq("quote"))
      .orderBy("trade_id").select("trade_id", "quote")
      .as[(Long, Option[Double])].collect()
    back shouldBe Array(10L -> None, 11L -> None, 12L -> Some(99.5))
    val fwd = AsOfJoin.asOfForward(l, r, "ts", Seq("key"), Seq("quote"))
      .orderBy("trade_id").select("trade_id", "quote")
      .as[(Long, Option[Double])].collect()
    // forward: only non-null A row at 10:00:06 has no later quote
    fwd shouldBe Array(10L -> None, 11L -> None, 12L -> None)
  }

  test("payload name collisions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(trades, quotes.withColumnRenamed("quote", "px"),
        "ts", Seq("key"), Seq("px"))
    }
    e.getMessage should include("collides")
  }
}
