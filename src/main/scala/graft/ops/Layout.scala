package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Storage-layout operators: how a 100 TB table gets WRITTEN decides
  * every downstream scan's cost. One clustered write buys partition
  * pruning (directory-level skips on the partition columns) plus parquet
  * row-group skipping (min/max stats on the sort columns) for every
  * query that follows.
  */
object Layout {

  /** Write `df` clustered for downstream scans: Hive-partitioned on
    * `partCols`, range-distributed then sorted within files on
    * `sortCols`.
    *
    * `repartitionByRange` bounds file count (`targetFiles` range
    * buckets, not one file per in-memory partition — the classic
    * small-files explosion) and makes each output file own a contiguous
    * sort-key range, so parquet min/max stats actually EXCLUDE row
    * groups: a random distribution gives every file min≈global-min /
    * max≈global-max and stats prune nothing.
    *
    * Range boundaries come from Spark's reservoir sampling — fine for
    * layout (skew only shifts file sizes, never correctness), which is
    * why this is a SINK decision and not part of any oracle-checked
    * query result.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      sortCols: Seq[String],
      targetFiles: Int = 8): Unit = {
    require(partCols.nonEmpty || sortCols.nonEmpty, "nothing to cluster on")
    val keys = (partCols ++ sortCols).map(col)
    df.repartitionByRange(targetFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .partitionBy(partCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
