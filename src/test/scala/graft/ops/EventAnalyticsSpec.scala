package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventAnalyticsSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))

  test("funnel: ordered first-touch semantics") {
    val events = ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L), // full
      (2L, "view", 100L), (2L, "click", 200L),                          // 2 steps
      (3L, "click", 100L), (3L, "view", 200L),    // out of order: view only
      (4L, "purchase", 50L), (4L, "view", 100L),  // purchase BEFORE view
      (5L, "error", 10L))                         // no funnel event at all
    val r = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .collect().head
    r.getAs[Long]("n_users") shouldBe 4L       // user 5 filtered out
    r.getAs[Long]("step0_view") shouldBe 4L
    r.getAs[Long]("step1_click") shouldBe 2L   // users 1, 2
    r.getAs[Long]("step2_purchase") shouldBe 1L
  }

  test("sequence match: greedy subsequence beats first-touch; partial prefixes scored") {
    val events = Seq(
      // user 1: full chain with interleaving noise
      (1L, 10L, "view"), (1L, 11L, "error"), (1L, 12L, "click"), (1L, 13L, "purchase"),
      // user 2: purchase BEFORE click -> only 2 steps
      (2L, 20L, "view"), (2L, 21L, "purchase"), (2L, 22L, "click"),
      // user 3: funnel's first-touch would fail (click before first view
      // has a later retry); greedy finds view(31) -> click(33) -> purchase(34)
      (3L, 30L, "click"), (3L, 31L, "view"), (3L, 33L, "click"), (3L, 34L, "purchase"),
      // user 4: never views -> absent from output
      (4L, 40L, "click"), (4L, 41L, "purchase")
    ).map { case (u, id, t) => (id, new java.sql.Timestamp(id * 1000), u, t, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.matchSequence(events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    out.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
    out.map(_.getAs[Long]("steps_matched")) shouldBe Array(3L, 2L, 3L)
    out.map(_.getAs[Boolean]("matched")) shouldBe Array(true, false, true)
    out(2).getAs[Long]("k1") shouldBe 33L  // the RETRY click, after the view
  }

  test("rate anomalies: exact z on integer moments; degenerate types excluded") {
    val hour = 3600000000L
    val rows = Seq.newBuilder[(Long, String, Long)]
    // type a: hours 0..18 at 10 events, hour 19 spikes to 40
    for (h <- 0 until 19; i <- 0 until 10) rows += ((i.toLong, "a", h * hour + i))
    for (i <- 0 until 40) rows += ((i.toLong, "a", 19 * hour + i))
    rows += ((1L, "b", 0L))                      // single bucket: n < 2, dropped
    rows += ((1L, "c", 0L)); rows += ((1L, "c", hour)) // zero variance, dropped
    val out = EventAnalytics.rateAnomalies(ev(rows.result(): _*))
      .orderBy("event_type", "bucket").collect()
    out.map(_.getString(0)).distinct shouldBe Array("a")
    out.length shouldBe 20
    val spike = out.last
    spike.getAs[Long]("cnt") shouldBe 40L
    spike.getAs[Boolean]("is_anomaly") shouldBe true
    spike.getAs[Double]("z") should be > 4.0
    // n=20, sx=230, sxx=3500 -> mean 11.5, var 45: z = -1.5/sqrt(45) for the 10s
    out.head.getAs[Double]("z") shouldBe
      BigDecimal((10 - 11.5) / math.sqrt(45.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("retention cohorts count distinct active users per (cohort, age)") {
    val day = 86400000000L
    val events = ev(
      (1L, "view", 0L), (1L, "view", day + 1L), (1L, "view", 2 * day), // d0,d1,d2
      (2L, "view", 0L), (2L, "view", 2 * day),                          // d0,d2
      (2L, "click", 2 * day + 5L),                // same day: no double count
      (3L, "view", day))                          // cohort d1
    val out = EventAnalytics.retentionCohorts(events)
      .orderBy("cohort_day", "age_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L), (1L, 0L, 1L))
  }

  test("histogram bins values with clamped edges") {
    val df = Seq(-5.0, 0.0, 0.5, 9.999999, 10.0, 25.0, 99.0, 250.0)
      .toDF("value")
    val out = EventAnalytics.histogram(df, "value", lo = 0.0, hi = 100.0, nBins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      (0L, 0L, 4L),          // -5 clamps in; 0, 0.5, 9.999999
      (1L, 10000000L, 1L),   // 10.0 -> second bin (left-closed)
      (2L, 20000000L, 1L),
      (9L, 90000000L, 2L))   // 99 + clamped overflow 250
  }

  test("histogram: NULLs land in no bin, extremes clamp to the correct edge") {
    val df = Seq[java.lang.Double](null, null, 5.0, -1e13, 1e13, Double.NaN)
      .toDF("value")
    val out = EventAnalytics.histogram(df, "value", lo = 0.0, hi = 100.0, nBins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // NULL is not a value: excluded entirely (not silently bin 0);
    // -1e13 would overflow the micro cast — the double-space clamp puts
    // it in bin 0 (underflow), +1e13 and NaN in the top bin
    out shouldBe Array((0L, 2L), (9L, 2L))
  }

  test("funnel rejects repeated step names loudly") {
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev((1L, "view", 100L)),
        Seq("view", "purchase", "purchase"))
    }
    e.getMessage should include("distinct")
  }
}
