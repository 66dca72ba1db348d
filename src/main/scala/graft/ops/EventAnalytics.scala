package graft.ops

import graft.functions.ColumnOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch analytics over the `events(event_id, ts, user_id, event_type,
  * value, props)` table: funnel conversion and retention cohorts — the
  * product-analytics queries an event warehouse answers daily.
  *
  * All time arithmetic happens on integer epoch values (µs / days), never
  * raw timestamps, so results replay bit-identically in any engine (see
  * SparkEntry's determinism notes).
  */
object EventAnalytics {

  private val MicrosPerDay = 86400000000L

  /** Ordered funnel conversion: how many users reached step 1, step 1→2,
    * 1→2→3 … where each step's event must occur strictly AFTER the
    * previous step's first occurrence (first-touch semantics — the
    * standard product-funnel definition).
    *
    * One aggregation per user computes the first time of each step with
    * a conditional `min` — no self-joins, no explode: the per-user state
    * is |steps| longs regardless of event volume, and the final count is
    * a single broadcastable row per step. Shuffle carries (user, steps)
    * only.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // first-touch semantics key on min(ts) PER TYPE: a repeated step name
    // would compare a timestamp with itself (t_i < t_i is false) and
    // count zero conversions forever — reject loudly; matchSequence
    // handles repeated steps via its ordered-subsequence scan
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct (got $steps); use matchSequence " +
        "for funnels with repeated steps")
    val us = unix_micros(col("ts"))
    val perUser = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === steps.head, us)).as("t0"),
        steps.indices.tail.map(i =>
          min(when(col("event_type") === steps(i), us)).as(s"t$i")): _*)
    // step i reached iff t0 < t1 < ... < ti (strictly increasing firsts)
    val reached = steps.indices.map { i =>
      steps.indices.take(i + 1).map(j => col(s"t$j").isNotNull).reduce(_ && _) &&
        (0 until i).map(j => col(s"t$j") < col(s"t${j + 1}"))
          .foldLeft(lit(true))(_ && _)
    }
    perUser.agg(
      count(lit(1)).as("n_users"),
      reached.zipWithIndex.map { case (r, i) =>
        sum(when(r, 1L).otherwise(0L)).as(s"step${i}_${steps(i)}")
      }: _*)
  }

  /** Retention cohorts: users grouped by their first-seen epoch day, and
    * for each (cohort, days-since-signup) cell, how many distinct users
    * were active that day — the triangle every growth dashboard draws.
    *
    * Two aggregations and one join, all keyed on user_id: first-seen day
    * per user (agg), join back to the user's activity days (dedup'd
    * agg), then count per (cohort_day, age). The join is user_id ⋈
    * user_id — co-partitioned by the same shuffle key, no skew beyond a
    * single user's event count, and the cohort matrix output is
    * O(days²) regardless of input size.
    */
  def retentionCohorts(events: DataFrame, maxAgeDays: Int = 30): DataFrame = {
    val day = ColumnOps.fdiv(unix_micros(col("ts")), MicrosPerDay)
    val activeDays = events
      .select(col("user_id"), day.as("day"))
      .distinct()
    val cohorts = activeDays
      .groupBy("user_id")
      .agg(min("day").as("cohort_day"))
    activeDays.join(cohorts, "user_id")
      .select(
        col("cohort_day"),
        (col("day") - col("cohort_day")).as("age_days"))
      .filter(col("age_days") <= maxAgeDays)
      .groupBy("cohort_day", "age_days")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Fixed-width histogram of a numeric column: `nBins` equal bins over
    * [lo, hi), underflow/overflow clamped into the edge bins so every
    * value lands somewhere. Bin edges are computed in exact integer
    * µ-units (value quantized at 1e-6) — float bin boundaries are the
    * classic cross-engine off-by-one — and the whole thing is one narrow
    * projection plus one aggregation on the bin id.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram spec: [$lo, $hi) x $nBins")
    val loMicro = math.round(lo * 1e6)
    // Integer bin width: floor(span / nBins) micro-units. Edges are exact
    // multiples of this width (what `lo_micro` reports); the ≤ nBins-µ
    // division residue folds into the TOP bin via the clamp below, so
    // bins are equal at micro precision, not at real precision.
    val width = (math.round(hi * 1e6) - loMicro) / nBins
    require(width > 0,
      s"span/nBins must be at least 1 micro-unit: span=${math.round(hi * 1e6) - loMicro}µ, nBins=$nBins")
    // clamp in DOUBLE space BEFORE the micro cast: an extreme value
    // (|v| ≳ 9.2e12) would overflow the long cast — ANSI would throw on
    // data the doc promises to clamp into an edge bin. After the clamp
    // vMicro is provably in [loMicro, hiMicro], so the cast is safe and
    // in-range values bin exactly as before. NULL is not a value and
    // lands in NO bin (greatest/least skip NULL args, which would
    // otherwise silently fold every NULL into bin 0).
    val vClamped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val vMicro = round(vClamped * 1e6, 0).cast("long")
    val rawBin = ColumnOps.fdiv(vMicro - loMicro, width)
    df.filter(col(valueCol).isNotNull)
      .select(
        least(greatest(rawBin, lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(
        col("bin"),
        (lit(loMicro) + col("bin") * width).as("lo_micro"),
        col("n"))
  }

  /** Ordered-subsequence match (MATCH_RECOGNIZE-lite): per user, the
    * greedy earliest-occurrence scan for `steps` as a SUBSEQUENCE of
    * their event stream — "did this user view, then (any time later)
    * click, then later purchase", interleaved events allowed. Differs
    * from [[funnel]]'s first-touch rule: greedy matching finds a valid
    * chain whenever one exists (first-touch can miss a later re-try).
    *
    * Stream order is the `event_id` (globally unique arrival sequence —
    * the deterministic total order the synthetic stream guarantees).
    * One aggregation round per step, every round keyed on `user_id`, so
    * rounds after the first reuse the same partitioning (AQE no-op
    * exchanges) — m supersteps of the same Pregel shape as
    * [[graft.ops.Graph.pageRank]]. Per-user state is m longs.
    */
  def matchSequence(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    // non-step events can never satisfy a when-condition: drop them ONCE
    // so every superstep joins/aggregates only the relevant slice
    val ev = events.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"), col("event_id").as("k"))
    var cur = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("k")).as("k0"))
    for (i <- 1 until steps.length) {
      val prevCols = (0 until i).map(j => max(col(s"k$j")).as(s"k$j"))
      // superstep i only needs events of type steps(i): joining the full
      // multi-type slice every round would shuffle m× the useful rows.
      // LEFT join so a user with no steps(i) events keeps their row
      // (k_i = null), preserving the one-row-per-step0-user contract.
      cur = cur.join(
          ev.filter(col("event_type") === steps(i)).drop("event_type"),
          Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(prevCols.head, prevCols.tail :+
          min(when(col("k") > col(s"k${i - 1}"), col("k"))).as(s"k$i"): _*)
    }
    // ascending fold → the OUTERMOST when checks the deepest step, so the
    // longest matched prefix wins
    val matchedCount = steps.indices.foldLeft[Column](lit(0L)) {
      (acc, i) => when(col(s"k$i").isNotNull, lit(i + 1L)).otherwise(acc)
    }
    cur.select(col("user_id") +:
      steps.indices.map(i => col(s"k$i")) :+
      matchedCount.as("steps_matched") :+
      col(s"k${steps.length - 1}").isNotNull.as("matched"): _*)
  }

  /** Volume-anomaly detection: z-score each (event_type, time-bucket)
    * count against that event type's own rate distribution — the
    * monitoring query behind "error volume spiked 4σ this hour".
    *
    * Determinism across engines: the count moments (`n, Σx, Σx²`) are
    * EXACT longs, and the z-score is one fixed double expression over
    * them — `(x − Σx/n) / sqrt((Σx² − Σx·(Σx/n)) / (n−1))` evaluated in
    * exactly this operation order in both Spark and the DuckDB oracle,
    * so every intermediate is the same IEEE double; `round(z, 6)` is
    * then bit-identical. (A distributed `stddev` would NOT replay:
    * partial-aggregate merge order changes the float result.)
    *
    * Scale shape: one data-sized shuffle groups counts by (type,
    * bucket); the per-type moments are a SECOND aggregation over the
    * already-tiny bucket counts and come back as a broadcast (event-type
    * cardinality is small by construction). Constant-degenerate types
    * (zero variance) are excluded — no z-score exists for them.
    */
  def rateAnomalies(
      events: DataFrame,
      bucketUs: Long = 3600000000L,
      zThreshold: Double = 3.0): DataFrame = {
    val cnts = bucketCounts(events, bucketUs)
    cnts.join(broadcast(momentsOf(cnts)), "event_type")
      .filter(rateVariance > 0)
      .select(col("event_type"), col("bucket"), col("cnt"),
        rateZ(col("cnt")).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > zThreshold)
  }

  private def bucketCounts(events: DataFrame, bucketUs: Long): DataFrame =
    events
      .select(col("event_type"),
        ColumnOps.fdiv(unix_micros(col("ts")), bucketUs).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))

  // the SECOND aggregation: input is the already-tiny bucket-count table,
  // so moments never rescan the raw events when the caller shares `cnts`
  // Σx² stays a long deliberately: under ANSI mode (on in every graft
  // session) cnt*cnt and its sum FAIL LOUDLY on overflow rather than
  // wrapping, which mirrors the oracle's CAST(sum(...) AS BIGINT) erroring
  // out of hugeint — consistent fail-loud parity for >2^31 events/bucket
  private def momentsOf(cnts: DataFrame): DataFrame =
    cnts.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("cnt").as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
      .filter(col("n") >= 2)

  /** The per-type rate moments `(event_type, n, Σx, Σx²)` behind
    * [[rateAnomalies]] — exposed so a STREAMING scorer can join the
    * batch-trained table against live windows
    * ([[graft.streaming.EventStreamOps.rateAnomalyStream]]): train
    * offline, score online, one definition of "normal".
    */
  def rateMoments(events: DataFrame, bucketUs: Long = 3600000000L): DataFrame =
    momentsOf(bucketCounts(events, bucketUs))

  /** Sample variance over the moment columns, in the FIXED operation
    * order both engines replay (see [[rateAnomalies]]'s determinism
    * note).
    */
  def rateVariance: org.apache.spark.sql.Column =
    (col("sxx") - col("sx") * (col("sx") / col("n"))) / (col("n") - 1)

  /** Rounded z-score of a count against the moment columns — same fixed
    * operation order.
    */
  def rateZ(cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round((cnt - col("sx") / col("n")) / sqrt(rateVariance), 6)
}
