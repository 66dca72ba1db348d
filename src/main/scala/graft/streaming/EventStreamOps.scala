package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events(event_id, ts, user_id,
  * event_type, value, props)` shape — the Structured Streaming layer the
  * harness mandates beyond reference parity (watermarks, windowed
  * aggregation, custom state via `flatMapGroupsWithState`).
  *
  * Every transform here is source-agnostic: the same code runs on a batch
  * DataFrame (for the DuckDB-checkable declared queries) and on a
  * `readStream` DataFrame (where the watermark bounds state). That is the
  * idiomatic Spark shape — semantics in one place, incremental execution
  * chosen by the source.
  */
/** Per-user sessionization state (top-level: Catalyst's encoder codegen
  * needs a publicly instantiable class, which private nested case classes
  * are not).
  */
final case class SessionState(start: Long, last: Long, n: Long)

/** Running per-user aggregate row (top-level for Catalyst encoders). */
final case class UserRunning(user_id: Long, n_events: Long, value_micro: Long)

/** Spark-4 `transformWithState` processor: per-user running (count,
  * micro-quantized value sum) in a `ValueState`, emitting the refreshed
  * row each micro-batch (Update mode) — the always-current feature-store
  * row. State per user is two longs; no TTL (a production deployment
  * passes a `TTLConfig` to age out dormant users).
  */
final class RunningStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), UserRunning] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)]("running",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserRunning] = {
    var (n, tot) = if (state.exists()) state.get() else (0L, 0L)
    rows.foreach { case (_, v) => n += 1; tot += v }
    state.update((n, tot))
    Iterator.single(UserRunning(key, n, tot))
  }
}

object EventStreamOps {

  /** Tumbling-window event counts per type. On a stream the watermark
    * bounds the aggregation state: windows older than `watermarkDelay`
    * close and emit finals; state size is O(open windows × types), not
    * O(history). Keyed shuffle is (window, type) — balanced as long as
    * event time advances.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Exactly-once event dedup on the id column. On a stream this is
    * `dropDuplicatesWithinWatermark`: state holds only ids younger than
    * the watermark (bounded), so a replayed/at-least-once source (Kafka,
    * the Singer stream) collapses to exactly-once downstream — the state
    * that grows forever under plain `dropDuplicates` on a stream. Batch
    * input keeps identical semantics through `dropDuplicates`.
    */
  def dedupEvents(
      events: DataFrame,
      idCol: String = "event_id",
      watermarkDelay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(idCol)
    else events.dropDuplicates(idCol)

  /** Click→purchase attribution: every (purchase, prior click) pair by
    * the same user within `lookbackSeconds` — the stream-stream
    * time-interval join (vs [[graft.ops.AsOfJoin]]'s single latest
    * match). On a stream both filtered branches carry the source
    * watermark and the range condition bounds join state: clicks older
    * than watermark − lookback can never match a future purchase and are
    * evicted — state is O(events in the lookback window), not O(history).
    * Batch input plans the same code as a plain equi-join on user_id with
    * the range as a residual filter.
    */
  def attribution(
      events: DataFrame,
      lookbackSeconds: Long = 3600,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val wm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    val purchases = wm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $lookbackSeconds SECONDS"))
      .drop("c_user_id")
  }

  /** One user session: ordered activity separated by gaps ≤ the timeout. */
  final case class Session(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): per-user state carries (start, last, n);
    * an event past the gap closes the session and emits it. State is
    * O(active users) — the canonical unbounded-stream pattern the SDK's
    * single-threaded reference loop cannot express.
    *
    * Trailing sessions are NOT withheld: on a stream, an event-time
    * timeout fires once the watermark passes `last + gap`, flushing the
    * idle session without waiting for that user's next event; on batch
    * input there is no future data, so the final open session per user is
    * emitted directly. Output therefore matches [[sessionizeBatch]]'s
    * boundaries exactly (streams: once the watermark advances past the
    * final gap).
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    // the watermarked column itself must survive the projection feeding
    // the stateful operator, or the streaming checker rejects the
    // event-time timeout as "no watermark"
    val typed = src
      .select(col("user_id"), unix_timestamp(col("ts")).as("epoch"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        case (user, rows0, state: GroupState[SessionState]) =>
          val rows = rows0.map(r => (r._1, r._2))
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the open
            // session can never be extended — flush it
            val out = state.getOption.map(s => Session(user, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            // interval-merge, with the carried state as one more interval:
            // each event is [t, t] and the open session is [start, last];
            // sorting by interval start and merging whenever the next
            // interval starts within gapSeconds of the current one's end
            // is EXACTLY batch gap-sessionization over the information
            // this group has. This handles in-watermark late events from
            // previous micro-batches uniformly: one older than the open
            // session merges only if it truly chains within the gap
            // (possibly extending session_start backward), and one more
            // than a gap earlier closes as its own session instead of
            // being glued across the silent gap. (An event arriving after
            // such an early session was already emitted still fragments —
            // the price of single-interval state; the watermark bounds it.)
            val items = (rows.map(r => SessionState(r._2, r._2, 1)).toSeq ++
              state.getOption.toSeq).sortBy(s => (s.start, s.last))
            var cur: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            items.foreach { it =>
              cur match {
                case Some(c) if it.start - c.last <= gapSeconds =>
                  // sorted by start, so c.start is already the minimum
                  cur = Some(SessionState(
                    c.start, math.max(c.last, it.last), c.n + it.n))
                case Some(c) =>
                  closed += Session(user, c.start, c.last, c.n)
                  cur = Some(it)
                case None =>
                  cur = Some(it)
              }
            }
            if (streaming) {
              cur.foreach { s =>
                state.update(s)
                // timeout timestamps must stay ahead of the watermark;
                // a late straggler session already past it flushes on the
                // very next watermark advance
                state.setTimeoutTimestamp(math.max(
                  (s.last + gapSeconds) * 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
              }
            } else {
              // batch: no future data exists, the trailing session is final
              cur.foreach(s => closed += Session(user, s.start, s.last, s.n))
            }
            closed.result().iterator
          }
      }
  }

  /** Sessionization via the BUILT-IN `session_window` — the third
    * formulation of the same semantics (vs the custom-state
    * [[sessionize]] and the lag-window [[sessionizeBatch]]).
    *
    * BATCH-ONLY: the per-user ordinal `session_id` is stamped with a
    * non-time row_number window, which streaming rejects. (The
    * session_window AGGREGATE itself is the one Spark merges natively in
    * streaming state — a streaming variant would emit the window bounds
    * instead of an ordinal; use [[sessionize]] for streams here.)
    *
    * Boundary alignment: `session_window` merges windows that TOUCH
    * (`next.start <= prev.end`, i.e. `t - prev <= gap` — verified on the
    * exact-1801s-gap pair in the corpus), which is precisely the
    * `t - prev <= gap` keep-rule of the other two formulations, so the
    * same gap value yields identical sessions (hash-checked against the
    * same oracle as [[sessionizeBatch]]).
    */
  def sessionizeWindowed(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    require(!events.isStreaming,
      "sessionizeWindowed is batch-only (ordinal session ids need a batch " +
        "sort); use sessionize() for streaming input")
    import org.apache.spark.sql.expressions.Window
    val byStart = Window.partitionBy("user_id").orderBy("session_start")
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("epoch"))
      .groupBy(col("user_id"),
        session_window(timestamp_seconds(col("epoch")), s"$gapSeconds seconds"))
      .agg(
        min("epoch").as("session_start"),
        max("epoch").as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("session_id", row_number().over(byStart).cast("long"))
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
  }

  /** Batch sessionization with identical boundaries: gap detection via a
    * lag window, session id = running count of gap-starts, then one
    * aggregate per (user, session). Two keyed shuffles, both on user_id —
    * co-partitioned, so the second is a no-op exchange under AQE.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("epoch"))
      .withColumn("prev", lag("epoch", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("epoch") - col("prev") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min("epoch").as("session_start"),
        max("epoch").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Per-user running stats through the MODERN stateful API
    * (`transformWithState`, Spark 4): on a stream each micro-batch
    * updates the user's `ValueState` and emits the refreshed row
    * (Update mode; requires the RocksDB state store). On batch input the
    * IDENTICAL result comes from one aggregation — the oracle-checked
    * twin. Values are micro-quantized per row before summing, so both
    * paths and the oracle are exact-integer equal.
    */
  def runningUserStats(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    // coalesce: a NULL value contributes 0 to the sum (sum() skipping
    // NULLs is arithmetically the same) but the row still counts — and
    // the streaming path's primitive (Long, Long) tuple encoder would
    // otherwise CRASH on deserialization ('Null value appeared in
    // non-nullable field') while the batch twin silently counted it
    val typed = events.select(
        col("user_id"),
        coalesce(round(col("value") * 1e6).cast("long"), lit(0L))
          .as("value_micro"))
      .as[(Long, Long)]
    if (events.isStreaming)
      typed.groupByKey(_._1)
        .transformWithState(new RunningStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
    else
      // batch twin as a DataFrame aggregate — partial aggregation before
      // the shuffle, unlike a typed mapGroups which would move raw rows
      typed.toDF("user_id", "value_micro")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value_micro").as("value_micro"))
        .select(col("user_id"), col("n_events"), col("value_micro"))
        .as[UserRunning]
  }

  /** Online anomaly scoring: z-score each live (window, event_type)
    * count against BATCH-TRAINED rate moments — the train-offline /
    * score-online split. `stats` is
    * [[graft.ops.EventAnalytics.rateMoments]] output (computed on
    * history, small: one row per event type); on a stream the join is
    * stream-static — Spark broadcasts the static side into every
    * micro-batch, no stateful join, and the windowed count's state is
    * watermark-bounded exactly as in [[windowedCounts]].
    *
    * Batch input gives the identical DataFrame (the batch-twin test
    * pins streaming semantics to [[graft.ops.EventAnalytics
    * .rateAnomalies]]'s oracle-checked scoring).
    */
  def rateAnomalyStream(
      events: DataFrame,
      stats: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      zThreshold: Double = 3.0): DataFrame = {
    import graft.ops.EventAnalytics
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(stats), "event_type")
      .filter(EventAnalytics.rateVariance > 0)
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("cnt"),
        EventAnalytics.rateZ(col("cnt")).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > zThreshold)
  }
}
