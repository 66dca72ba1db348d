package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class EventStreamOpsSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def tsEpoch(s: String): Long = ts(s).toInstant.getEpochSecond

  private val batchEvents = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0),
    (3L, ts("2024-01-01 10:59:00"), 8L, "view", 3.0),
    (4L, ts("2024-01-01 12:00:00"), 7L, "click", 4.0) // >30min gap for user 7
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("windowed counts on batch: tumbling 1h buckets") {
    val out = EventStreamOps.windowedCounts(batchEvents)
      .orderBy("window_start", "event_type").collect()
    out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe Seq(
      (1704103200L, "click", 2L), // 10:00 UTC bucket
      (1704103200L, "view", 1L),
      (1704110400L, "click", 1L)) // 12:00 bucket
    out.head.getDouble(3) shouldBe 3.0 // 1.0 + 2.0
  }

  test("batch sessionization: gap splits sessions, counts are per session") {
    val out = EventStreamOps.sessionizeBatch(batchEvents, gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    out.toSeq shouldBe Seq((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L))
  }

  test("windowed counts on a stream honor the watermark and emit finals") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.windowedCounts(df, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:30:00"), 7L, "click", 2.0))
    q.processAllAvailable()
    // advance event time far enough to close the 10:00 window
    mem.addData((3L, ts("2024-01-01 12:00:00"), 8L, "view", 3.0))
    q.processAllAvailable()
    val finals = spark.table("wc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    q.stop()
    finals should contain((1704103200L, "click", 2L))
  }

  test("session_window formulation matches sessionizeBatch, including the exact-gap boundary") {
    val boundary = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:30:00"), 7L, "click", 1.0), // exactly 1800s -> merges
      (3L, ts("2024-01-01 11:00:01"), 7L, "click", 1.0)  // 1801s -> new session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    for (df <- Seq(boundary, batchEvents,
      graft.Tables.load(spark, "/root/testdata/sf0.001", "events"))) {
      val a = EventStreamOps.sessionizeBatch(df)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      val b = EventStreamOps.sessionizeWindowed(df)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      a shouldBe b
    }
  }

  test("streaming dedup drops at-least-once replays within the watermark") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.dedupEvents(df, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("dedup_ev").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0)) // same-batch replay
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:01:00"), 7L, "click", 1.0)) // cross-batch replay
    mem.addData((2L, ts("2024-01-01 10:02:00"), 7L, "view", 2.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_ev").collect().map(_.getLong(0)).sorted
    q.stop()
    ids.toSeq shouldBe Seq(1L, 2L)
    // batch path: same semantics through dropDuplicates
    EventStreamOps.dedupEvents(batchEvents.union(batchEvents)).count() shouldBe 4L
  }

  test("attribution joins each purchase to all prior clicks in the lookback") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0),
      (3L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.0),  // matches clicks 1,2
      (4L, ts("2024-01-01 09:00:00"), 8L, "click", 1.0),
      (5L, ts("2024-01-01 12:00:00"), 8L, "purchase", 5.0)   // click 4 too old
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreamOps.attribution(ev, lookbackSeconds = 3600)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    out shouldBe Set((3L, 1L), (3L, 2L))
  }

  test("streaming attribution emits matched pairs with bounded state") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.attribution(df, lookbackSeconds = 3600,
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.0))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 13:00:00"), 8L, "view", 0.0)) // advance watermark
    q.processAllAvailable()
    val pairs = spark.table("attr").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    q.stop()
    pairs shouldBe Set((2L, 1L))
  }

  test("batch sessionize emits trailing sessions: boundaries match sessionizeBatch") {
    val viaState = EventStreamOps.sessionize(batchEvents, gapSeconds = 1800)
      .collect().map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).sorted
    val viaWindow = EventStreamOps.sessionizeBatch(batchEvents, gapSeconds = 1800)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    viaState shouldBe viaWindow
    viaState.length shouldBe 3 // including user 7's trailing 12:00 session and user 8's only session
  }

  test("streaming sessionization flushes idle sessions once the watermark passes the gap") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.sessionize(df, gapSeconds = 1800, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_idle").outputMode("append").start()
    mem.addData((1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    // ANOTHER user's event advances the watermark past user 7's last+gap;
    // the event-time timeout flushes user 7's open session with no further
    // user-7 events
    mem.addData((2L, ts("2024-01-01 12:00:00"), 9L, "view", 1.0))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 12:00:05"), 9L, "view", 1.0))
    q.processAllAvailable()
    val sessions = spark.table("sess_idle").as[EventStreamOps.Session].collect()
    q.stop()
    sessions.map(s => (s.user_id, s.n_events)).toSeq shouldBe Seq((7L, 1L))
  }

  test("streaming sessionization with custom state closes sessions on gap") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.sessionize(df, gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0))
    q.processAllAvailable()
    // an event past the gap closes the first session and emits it
    mem.addData((3L, ts("2024-01-01 12:00:00"), 7L, "click", 3.0))
    q.processAllAvailable()
    val sessions = spark.table("sess").as[EventStreamOps.Session].collect()
    q.stop()
    sessions.map(s => (s.user_id, s.n_events)).toSeq shouldBe Seq((7L, 2L))
  }

  test("in-watermark late event does not regress the open session's end") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.sessionize(df, gapSeconds = 1800, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:05:00"), 7L, "click", 2.0))
    q.processAllAvailable()
    // late but within the 10-min watermark: older than the session's last
    mem.addData((3L, ts("2024-01-01 10:02:00"), 7L, "click", 3.0))
    q.processAllAvailable()
    // 29 min after the TRUE last (10:05) but 32 min after the late event:
    // if last regressed to 10:02 this would wrongly open a new session
    mem.addData((4L, ts("2024-01-01 10:34:00"), 7L, "click", 4.0))
    q.processAllAvailable()
    mem.addData((5L, ts("2024-01-01 13:00:00"), 8L, "view", 0.0)) // close it
    q.processAllAvailable()
    val sessions = spark.table("sess_late").as[EventStreamOps.Session]
      .collect().filter(_.user_id == 7L)
    q.stop()
    sessions.map(s => (s.session_start, s.session_end, s.n_events)).toSeq shouldBe
      Seq((tsEpoch("2024-01-01 10:00:00"), tsEpoch("2024-01-01 10:34:00"), 4L))
  }

  test("in-watermark late event a full gap earlier closes as its own session, not a merge") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.sessionize(df, gapSeconds = 600, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("sess_gap").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:00:50"), 7L, "click", 2.0))
    q.processAllAvailable()
    // 50 min earlier than the open session with a 10-min gap: in-watermark
    // but unjoinable — gluing it in would span a silent 50-min hole
    mem.addData((3L, ts("2024-01-01 09:10:00"), 7L, "click", 3.0))
    q.processAllAvailable()
    mem.addData((4L, ts("2024-01-01 14:00:00"), 8L, "view", 0.0)) // flush
    q.processAllAvailable()
    val sessions = spark.table("sess_gap").as[EventStreamOps.Session]
      .collect().filter(_.user_id == 7L)
      .map(s => (s.session_start, s.session_end, s.n_events)).sortBy(_._1)
    q.stop()
    sessions.toSeq shouldBe Seq(
      (tsEpoch("2024-01-01 09:10:00"), tsEpoch("2024-01-01 09:10:00"), 1L),
      (tsEpoch("2024-01-01 10:00:00"), tsEpoch("2024-01-01 10:00:50"), 2L))
  }

  test("transformWithState running stats: state carries across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
      val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStreamOps.runningUserStats(df)
        .writeStream.format("memory").queryName("running")
        .outputMode("update").start()
      mem.addData((1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.5))
      q.processAllAvailable()
      mem.addData(
        (2L, ts("2024-01-01 10:01:00"), 7L, "view", 2.0),
        (3L, ts("2024-01-01 10:02:00"), 8L, "view", 4.25))
      q.processAllAvailable()
      val rows = spark.table("running").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      q.stop()
      // update mode: user 7 appears once per batch, second emission cumulative
      rows should contain((7L, 1L, 1500000L))
      rows should contain((7L, 2L, 3500000L))   // 1.5 + 2.0, state carried
      rows should contain((8L, 1L, 4250000L))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("running stats batch twin equals the direct aggregation") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val twin = EventStreamOps.runningUserStats(ev).collect()
      .map(u => (u.user_id, u.n_events, u.value_micro)).sorted
    val direct = ev.groupBy("user_id")
      .agg(count(lit(1)), sum(round(col("value") * 1e6).cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    twin shouldBe direct
  }

  test("running stats: NULL value counts as an event contributing 0, stream does not crash") {
    val batch = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", Some(2.0)),
      (2L, ts("2024-01-01 10:01:00"), 7L, "click", None) // NULL value
    ).map { case (a, b, c, d, e) => (a, b, c, d, e.map(Double.box).orNull) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val twin = EventStreamOps.runningUserStats(batch).collect().head
    (twin.n_events, twin.value_micro) shouldBe ((2L, 2000000L))
    // streaming path: the primitive tuple encoder previously died with
    // 'Null value appeared in non-nullable field' on the NULL value
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Long, String, java.lang.Double)](spark)
      val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStreamOps.runningUserStats(df)
        .writeStream.format("memory").queryName("run_null").outputMode("update").start()
      mem.addData((1L, ts("2024-01-01 10:00:00"), 7L, "click", 2.0),
        (2L, ts("2024-01-01 10:01:00"), 7L, "click", null.asInstanceOf[java.lang.Double]))
      q.processAllAvailable()
      val rows = spark.table("run_null").as[UserRunning].collect()
      q.stop()
      rows.map(u => (u.n_events, u.value_micro)).toSeq shouldBe Seq((2L, 2000000L))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("rate anomaly stream on batch input matches the batch scorer") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val stats = graft.ops.EventAnalytics.rateMoments(ev)
    // window_start/3600 is exactly the batch scorer's epoch-hour bucket
    val twin = EventStreamOps.rateAnomalyStream(ev, stats)
      .select(col("event_type"), (col("window_start") / 3600).cast("long").as("bucket"),
        col("cnt"), col("z"), col("is_anomaly"))
      .collect().map(_.toSeq).toSet
    val batchSet = graft.ops.EventAnalytics.rateAnomalies(ev)
      .collect().map(_.toSeq).toSet
    twin shouldBe batchSet
  }

  test("rate anomaly stream scores live windows against static moments") {
    // 1 event on even hours, 3 on odd: nonzero variance, mean 2/hour
    val history = (0 until 20).flatMap { h =>
      Seq.tabulate(if (h % 2 == 0) 1 else 3)(i =>
        ((h * 10 + i).toLong, ts(f"2024-01-01 $h%02d:00:10"), 7L, "click", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = graft.ops.EventAnalytics.rateMoments(history)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreamOps.rateAnomalyStream(df, stats, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("ranom").outputMode("append").start()
    // one live hour with a 30-event burst, then advance the watermark
    mem.addData(Seq.tabulate(30)(i =>
      (100L + i, ts("2024-02-01 10:00:30"), 7L, "click", 1.0)): _*)
    q.processAllAvailable()
    mem.addData((999L, ts("2024-02-01 13:00:00"), 8L, "view", 0.0))
    q.processAllAvailable()
    val rows = spark.table("ranom").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt"),
        r.getAs[Boolean]("is_anomaly")))
    q.stop()
    // history: 2/hour for 20 hours -> a 30-event hour is a huge spike
    rows should contain(("click", 30L, true))
  }
}
