package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-proof aggregation: the two-phase salted groupBy.
  *
  * A plain `groupBy(key)` over a hot-keyed table (one event type = 40%
  * of a 100 TB stream) lands the hot key's entire volume on one reducer.
  * Salting splits each key into `buckets` sub-keys for a partial
  * aggregate — every reducer gets ≤ 1/buckets of the hot key — then a
  * second, tiny aggregation over (keys × buckets) rows folds the
  * partials. Spark's map-side partial aggregation already does this
  * WITHIN a task; salting does it ACROSS reducers, which is what matters
  * when one key exceeds a single reducer's capacity.
  *
  * Results are EXACTLY those of the direct aggregation — counts are
  * integers, sums run in decimal (associative, no float reorder drift) —
  * so the DuckDB oracle is simply the unsalted GROUP BY.
  */
object SkewAgg {

  /** Count + exact decimal sum of `valueCol` per `keyCol`, salted on a
    * unique id column (NEVER a random: replays must land each row in the
    * same bucket).
    */
  def saltedStats(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: Column,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!df.columns.exists(Set("_salt", "_n", "_s")),
      "input already has a _salt/_n/_s working column")
    df
      .groupBy(col(keyCol), pmod(xxhash64(saltFrom), lit(buckets.toLong)).as("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(keyCol))
      .agg(
        sum("_n").as("n"),
        sum("_s").cast("double").as("sum_value"))
  }

  /** Skew-proof equi-join: the fact side's hot key no longer lands on
    * one reducer — each fact row picks a deterministic salt bucket, the
    * dim side is replicated `buckets`× (explode, one row per bucket),
    * and the join runs on (key, salt). Use when the dim side is too big
    * to broadcast but small enough that `buckets`× replication is cheap
    * — the standard middle ground between broadcast and a skew-limited
    * shuffle join. Output equals the plain join exactly (the oracle IS
    * the unsalted join).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: Column,
      buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt working column")
    fact
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
      .join(dim.withColumn("_salt",
        explode(sequence(lit(0L), lit(buckets - 1L)))), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Hot-key detector — the diagnosis step BEFORE [[saltedStats]] /
    * [[saltedJoin]]: keys whose row count exceeds `factor` × the median
    * key count, with their load ratio in milli-units. One counting
    * aggregation plus a one-row median broadcast back onto the (already
    * key-sized) count table; at 100 TB this is the cheap profiling pass
    * that tells you WHICH keys need salting and how many buckets.
    */
  def skewKeys(df: DataFrame, keyCol: String, factor: Double): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    val med = counts.agg(percentile(col("cnt"), lit(0.5)).as("med"))
    counts.crossJoin(broadcast(med))
      .filter(col("cnt") > col("med") * factor)
      .select(col(keyCol), col("cnt"),
        floor(lit(1000.0) * col("cnt") / col("med")).cast("long").as("ratio_milli"))
  }
}
