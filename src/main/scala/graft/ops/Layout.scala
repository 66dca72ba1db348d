package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, floor, lit, shiftleft, shiftright, sum}

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

  /** Small-file compaction plan: assign each file to a rewrite bin of
    * ~`targetBytes` by its cumulative byte offset within its group
    * (`bin = floor(start_offset / targetBytes)` over files ordered by
    * `orderCol`) — the table-maintenance pass every long-lived 100 TB
    * table needs, because streaming/append writers accrete kilobyte
    * files until listing + open overhead dominates scans.
    *
    * Deterministic (pure function of the listing, no bin-packing
    * heuristics), so the plan is oracle-replayable; each bin's size is
    * bounded by `targetBytes + max_file_bytes`. The window is sequential
    * per GROUP (partition dir) but parallel across groups — and it runs
    * over the file LISTING, which is metadata-sized (one row per file,
    * millions at most), never over table data.
    */
  def planCompaction(
      files: DataFrame,
      groupCol: String,
      orderCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be positive, got $targetBytes")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_start", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin",
        floor(col("_start").cast("double") / targetBytes).cast("long"))
      .drop("_start")
  }

  /** Z-order (Morton) address: interleaves the low `bits` bits of each
    * dimension — bit `i` of dimension `d` lands at position
    * `i * dims.size + d` — so sorting by the address clusters rows that
    * are close in EVERY dimension, not just the leading sort key.
    *
    * That is the multi-dimensional analogue of [[writeClustered]]'s
    * lexicographic sort: a lexicographic (a, b) sort gives parquet
    * min/max pruning on `a` only (each file spans all of `b`), while a
    * z-address range confines every dimension to a power-of-two window —
    * a filter on ANY clustered column skips files. The standard layout
    * trick for 100 TB tables queried along several independent axes.
    *
    * Dimensions are masked to `bits` (callers bucket values into
    * `[0, 2^bits)` first — e.g. `pmod(key, 1 << bits)`); the unrolled
    * shift/mask/or chain is plain codegen'd built-ins, no UDF.
    */
  def zorderAddress(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zorderAddress needs at least one dimension")
    require(bits >= 1 && dims.size * bits <= 63,
      s"dims * bits must fit a signed long: ${dims.size} * $bits")
    val d = dims.size
    val terms = for {
      (dim, di) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(dim.cast("long"), i).bitwiseAND(lit(1L)), i * d + di)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as a BUCKETED table: rows hash-distribute into
    * `numBuckets` file groups by `bucketCols` (sorted within each bucket
    * on `sortCols`), and the layout is recorded in the catalog — which
    * is why this is `saveAsTable`, not a path write: bucket metadata
    * lives in the table catalog, not the parquet footers.
    *
    * This is the "pay the shuffle once" layout decision: every later
    * equi-join between two tables bucketed the same way (same columns,
    * same count) plans WITHOUT an Exchange on either side, and an
    * aggregation keyed on the bucket columns skips its exchange too
    * ([[graft.ops.LayoutSpec]] asserts both executed plans are
    * Exchange-free). At 100 TB the repeated join shuffle is the
    * dominant cost a fact table pays; bucketing moves it to write time,
    * once, amortized over every downstream query.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int = 8,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "nothing to bucket on")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    // the session catalog is in-memory (fresh every JVM) but the managed
    // location on disk is not: SaveMode.Overwrite only replaces a table
    // the CATALOG knows about, so an orphaned directory from a previous
    // session fails CREATE with LOCATION_ALREADY_EXISTS — drop both the
    // entry and any leftover location before writing
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Write `df` z-order-clustered on `dimCols` (each already bucketed to
    * `[0, 2^bits)`): range-distribute then sort by the interleaved
    * address, so each output file owns a contiguous z-range — a bounded
    * min/max window on EVERY dimension at once.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimCols: Seq[String],
      bits: Int = 16,
      targetFiles: Int = 8): Unit = {
    require(dimCols.nonEmpty, "nothing to cluster on")
    df.withColumn("_zaddr", zorderAddress(dimCols.map(col), bits))
      .repartitionByRange(targetFiles, col("_zaddr"))
      .sortWithinPartitions(col("_zaddr"))
      .drop("_zaddr")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
