package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators: cardinality estimation and snapshot
  * merging — the bookkeeping layer of a training-data pipeline (how many
  * distinct tokens/urls/ids do we have; which version of a document wins
  * when crawl snapshots overlap).
  */
object CorpusOps {

  /** Distinct-count estimate by KEY-SPACE sampling: count exactly the
    * distinct keys whose portable hash lands in bucket 0 of `rate`
    * buckets, and scale by `rate`. Because the sample is in HASH space
    * (not row space), duplicates of a key collapse to one vote and the
    * estimator is unbiased for distinct counts — row-sampling is not.
    *
    * The scale story is the point: the bucket filter is a narrow
    * predicate applied BEFORE the distinct's shuffle, so only ~1/`rate`
    * of the key space ever shuffles, vs a full `count(distinct)` moving
    * every key. Std error ≈ sqrt(rate / true_distinct) — rate 64 on a
    * million-key group is ±0.8%. Deterministic (no randomness), so any
    * engine replays the same estimate exactly.
    */
  def approxDistinct(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      rate: Int = 64): DataFrame = {
    require(rate >= 1, s"rate must be >= 1, got $rate")
    df.filter(pmod(PortableHash.h28(col(keyCol)), lit(rate.toLong)) === 0L)
      .groupBy(groupCols.map(col): _*)
      .agg((countDistinct(col(keyCol)) * rate).as("est_distinct"))
  }

  /** Merge two corpus snapshots, keeping ONE version per key: the
    * `preferred` side's row when the key appears in both, else whichever
    * side has it; ties within a side broken by the greatest `scoreCol`
    * then the smallest `tieCol`.
    *
    * The survivor is unique and replay-deterministic only when
    * (side, `scoreCol`, `tieCol`) is unique per key — pass a per-side
    * unique id (row id, fetch timestamp) as `tieCol` when a side can
    * carry duplicate keys; on a full tie `row_number` keeps an arbitrary
    * row.
    *
    * One shuffle on the key (the window's partitioning); no join — the
    * union is a zero-cost plan node, so cost is a single per-key
    * top-1, skew-bounded by versions-per-key (small by construction).
    */
  def mergeBestVersion(
      preferred: DataFrame,
      other: DataFrame,
      keyCol: String,
      scoreCol: String,
      tieCol: String): DataFrame = {
    Seq("_pri", "_rk").foreach(c =>
      require(!preferred.columns.contains(c) && !other.columns.contains(c),
        s"mergeBestVersion reserves the working column name '$c'"))
    val u = preferred.withColumn("_pri", lit(1))
      .unionByName(other.withColumn("_pri", lit(0)))
    val w = Window.partitionBy(keyCol)
      .orderBy(desc("_pri"), desc(scoreCol), asc(tieCol))
    u.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_pri", "_rk")
  }
}
