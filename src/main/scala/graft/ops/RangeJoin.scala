package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match point rows to the interval rows that
  * contain them. Spark plans a raw `p BETWEEN s AND e` join as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in a broadcast): O(points × intervals) comparisons. This operator
  * uses the standard BUCKETIZATION rewrite instead — the same idea as
  * Databricks' range-join bin optimization and the interval-join binning
  * in stream processors:
  *
  *   - each interval explodes to the fixed-width buckets it overlaps
  *     (`floor(start/b) .. floor(end/b)` — typically 1-2 rows for
  *     `bucketSize` on the order of the interval length);
  *   - each point maps to exactly ONE bucket, so the equi-join on
  *     (keys..., bucket) meets every qualifying pair exactly once — no
  *     post-join dedup — and the residual `BETWEEN` filter removes
  *     same-bucket near-misses.
  *
  * The join becomes a plain shuffled hash/sort-merge equi-join on short
  * keys: cost scales with data + true matches, not data². Pick
  * `bucketSize` near the typical interval length: too small explodes the
  * interval side, too large piles unrelated rows into one bucket.
  * Degenerate inputs (an interval spanning ≫ `bucketSize` buckets) grow
  * the explosion factor linearly — cap upstream if intervals are
  * user-supplied.
  *
  * Bucket ids use [[graft.functions.ColumnOps.fdiv]] — exact floor
  * division over the full long range (decimal-routed), correct for
  * negative epochs and for ~1e18 nanosecond epochs that a double
  * mantissa would round.
  */
object RangeJoin {

  /** Inner point-in-interval join.
    *
    * @param points     rows with `pointCol`; all columns pass through
    * @param intervals  rows with `[startCol, endCol]` (inclusive both
    *                   ends); all non-key columns pass through and must
    *                   not collide with point column names
    * @param keys       optional equality key(s) present in both inputs
    * @param bucketSize bucket width in `pointCol` units
    */
  def pointInRange(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketSize: Long = 3600L): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    val collisions = intervals.columns
      .filterNot(keys.contains).filter(points.columns.contains)
    require(collisions.isEmpty,
      s"interval columns collide with point columns: ${collisions.mkString(", ")} " +
        "— rename before joining")
    // reserve the working column like SkewAgg/capPerGroup do: a
    // one-sided _bucket would be silently clobbered and then dropped
    Seq(points, intervals).foreach(df =>
      require(!df.columns.contains("_bucket"),
        "pointInRange reserves the working column name '_bucket'"))
    def bucketOf(c: Column): Column =
      graft.functions.ColumnOps.fdiv(c, bucketSize)
    val burst = intervals.withColumn(
      "_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    points
      .withColumn("_bucket", bucketOf(col(pointCol)))
      .join(burst, keys :+ "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
