package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Persisted MinHash-LSH band index — the "build once, query many"
  * treatment for the DEDUP side, completing the index-family symmetry
  * (dense: [[Similarity.writeIvfIndex]]; lexical: [[Bm25Index]];
  * near-dup fingerprints: HERE). The expensive pass a continuous-ingest
  * dedup repeats is SIGNING the corpus — shingle → md5 → 32 seeded
  * min-mixes → banded buckets per document; this layout runs it once at
  * write time, so each increment signs only its own batch and joins the
  * stored `(band, bucket, doc_id)` table
  * ([[Dedup.dropNearDuplicatesIncrementalPortable]]'s decision, shared
  * code, never re-signing the corpus).
  *
  * Unlike the IVF/BM25 layouts this index serves a JOIN, not a point
  * probe — a batch's buckets can land anywhere, so there is no
  * partition filter to win; the scale lever is what is NOT recomputed
  * (the corpus signing pass) and what is never read (document text —
  * the layout holds fingerprints only; exact-Jaccard verification
  * fetches text for COLLIDING ids alone, from the corpus table the
  * caller already has). Rows are Hive-partitioned by `band` purely as
  * the compaction unit (one file per band after a compact).
  *
  * Layout under `dir` (the [[SegmentStore]] protocol — every crash
  * window inherits the BM25 spec's proofs):
  *
  *   - `v<N>/bands/band=<b>/` — `(bucket, doc_id, seg)` rows;
  *   - `v<N>/meta/` — `(n_hashes, bands, shingle_size, seg)`: the
  *     layout is SELF-DESCRIBING, appends and queries sign new text
  *     with the stored parameters (a mismatched signing family would
  *     silently never collide — checked loudly instead);
  *   - `v<N>/deletes/` — `(doc_id, seg)` tombstones: a forgotten doc's
  *     fingerprints must stop matching immediately, but its band rows
  *     scatter across bucket space, so the rewrite defers to compact;
  *   - `v<N>/commits/` — per-segment `.pending`/`.commit` markers.
  */
object BandIndex {
  import SegmentStore.{claimSeg, commitSeg, committedSegs, versions}

  private[graft] def currentVersionDir(dir: String): String =
    SegmentStore.currentVersionDir(dir, "band index")

  /** Committed tombstones `(doc_id)` — empty frame if none written. */
  private def committedDeletes(
      spark: SparkSession, ver: String, segs: Seq[Long]): DataFrame = {
    val path = java.nio.file.Paths.get(s"$ver/deletes")
    if (!java.nio.file.Files.isDirectory(path))
      spark.range(0).select(col("id").as("doc_id"))
    else spark.read.parquet(path.toString)
      .filter(col("seg").isin(segs: _*))
      .select("doc_id").distinct()
  }

  /** The stored signing parameters (loud on drift across segments). */
  private def readParams(spark: SparkSession, ver: String,
      segs: Seq[Long]): (Int, Int, Int) = {
    val rows = spark.read.parquet(s"$ver/meta")
      .filter(col("seg").isin(segs: _*))
      .select("n_hashes", "bands", "shingle_size").distinct().collect()
    require(rows.length == 1,
      s"band index at $ver has inconsistent signing parameters")
    (rows(0).getInt(0), rows(0).getInt(1), rows(0).getInt(2))
  }

  private def writeSegment(docs: DataFrame, ver: String, seg: Long,
      numHashes: Int, bands: Int, shingleSize: Int): Unit = {
    import docs.sparkSession.implicits._
    Seq((numHashes, bands, shingleSize, seg))
      .toDF("n_hashes", "bands", "shingle_size", "seg")
      .coalesce(1).write.mode("append").parquet(s"$ver/meta")
    Dedup.minHashBandsPortable(docs, numHashes, bands, shingleSize)
      .select(col("bucket"), col("doc_id"), lit(seg).as("seg"),
        col("band").cast("int").as("band"))
      .write.mode("append").partitionBy("band").parquet(s"$ver/bands")
  }

  /** Build the band index over `corpus` at `dir` — the one corpus
    * signing pass, written as version `v0`, segment 0.
    */
  def writeBandIndex(
      corpus: DataFrame,
      dir: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3): Unit = {
    val ver = s"$dir/v0"
    SegmentStore.initVersion(ver)
    writeSegment(corpus, ver, 0L, numHashes, bands, shingleSize)
    commitSeg(ver, 0L)
    SegmentStore.markCommitted(ver)
  }

  /** INCREMENTALLY index new documents (UNSEEN doc_ids) as one
    * commit-marked delta segment, signed with the layout's OWN stored
    * parameters. Crash-atomic exactly like [[Bm25Index.appendBm25Index]]
    * (rows invisible until the final `.commit`; a crashed retry's seg id
    * is burned). Cost is O(new docs) signing + write — existing band
    * files are never rewritten.
    */
  def appendBandIndex(newDocs: DataFrame, dir: String): Unit = {
    val ver = currentVersionDir(dir)
    val spark = newDocs.sparkSession
    val (nh, nb, sh) = readParams(spark, ver, committedSegs(ver))
    val seg = claimSeg(ver)
    writeSegment(newDocs, ver, seg, nh, nb, sh)
    commitSeg(ver, seg)
  }

  /** DELETE documents — right-to-be-forgotten on the dedup side: one
    * commit-marked tombstone segment; band rows rewrite at the next
    * compact (a doc's buckets scatter, an eager rewrite would touch
    * ~every band file). Readers anti-join the (deletion-sized,
    * broadcast) tombstones, so a deleted doc stops producing candidates
    * immediately and the decision equals a rebuild without it (spec'd).
    * Deleting an absent or already-deleted id is a no-op. Returns the
    * number of docs newly deleted.
    */
  def deleteFromBandIndex(
      dir: String, deleteIds: DataFrame, spark: SparkSession): Long = {
    val ver = currentVersionDir(dir)
    val segs = committedSegs(ver)
    val ids = deleteIds.select(col("doc_id")).distinct()
    val present = spark.read.parquet(s"$ver/bands")
      .filter(col("seg").isin(segs: _*))
      .join(broadcast(committedDeletes(spark, ver, segs)),
        Seq("doc_id"), "left_anti")
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select("doc_id").distinct()
    val nDeleted = present.count()
    val seg = claimSeg(ver)
    present.select(col("doc_id"), lit(seg).as("seg"))
      .write.mode("append").parquet(s"$ver/deletes")
    commitSeg(ver, seg)
    nDeleted
  }

  /** COMPACT: materialize tombstones, merge segments, one file per band
    * (`repartition` on the partition key), vacuum strandings, retire
    * older versions — single `_COMMITTED` commit point, the
    * [[Bm25Index.compactBm25Index]] protocol verbatim. Returns the
    * post-compact band data-file count.
    */
  def compactBandIndex(dir: String, spark: SparkSession,
      onStep: String => Unit = _ => ()): Long = {
    val ver = currentVersionDir(dir)
    val segs = committedSegs(ver)
    val (nh, nb, sh) = readParams(spark, ver, segs)
    SegmentStore.clearUncommitted(dir)
    val next = s"$dir/v${versions(dir).map(_._1).max + 1}"
    SegmentStore.initVersion(next)
    spark.read.parquet(s"$ver/bands")
      .filter(col("seg").isin(segs: _*))
      .join(broadcast(committedDeletes(spark, ver, segs)),
        Seq("doc_id"), "left_anti")
      .select(col("bucket"), col("doc_id"), lit(0L).as("seg"),
        col("band").cast("int").as("band"))
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$next/bands")
    import spark.implicits._
    Seq((nh, nb, sh, 0L)).toDF("n_hashes", "bands", "shingle_size", "seg")
      .coalesce(1).write.mode("overwrite").parquet(s"$next/meta")
    commitSeg(next, 0L)
    onStep("written")
    SegmentStore.markCommitted(next)
    onStep("committed")
    SegmentStore.retireOthers(dir, next)
    onStep("retired")
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$next/bands"))
    try w.iterator().asScala.count(p =>
      p.getFileName.toString.endsWith(".parquet"))
    finally w.close()
  }

  /** The incremental near-dedup DECISION against the persisted index:
    * survivors of `newDocs` after dropping every doc with a verified
    * (exact Jaccard ≥ `threshold`) near-duplicate in the index's LIVE
    * corpus — EXACTLY
    * [[Dedup.dropNearDuplicatesIncrementalPortable]]`(newDocs,
    * corpus minus deleted)`, by shared code
    * ([[Dedup.incrementalNearDedupCore]]): only the batch is signed
    * (with the layout's stored parameters), the corpus side reads
    * back `(band, bucket, doc_id)` rows, and `corpusTexts` is touched
    * only to verify colliding ids. New-side doc ids must be strictly
    * greater than every corpus id (the batch twin's contract).
    */
  def dedupAgainstBandIndex(
      newDocs: DataFrame,
      dir: String,
      corpusTexts: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame = {
    val spark = newDocs.sparkSession
    val ver = currentVersionDir(dir)
    val segs = committedSegs(ver)
    val (nh, nb, sh) = readParams(spark, ver, segs)
    val corpusBands = spark.read.parquet(s"$ver/bands")
      .filter(col("seg").isin(segs: _*))
      .join(broadcast(committedDeletes(spark, ver, segs)),
        Seq("doc_id"), "left_anti")
      .select("doc_id", "band", "bucket")
    Dedup.incrementalNearDedupCore(newDocs, corpusTexts,
      Dedup.minHashBandsPortable(newDocs, nh, nb, sh),
      corpusBands, threshold, sh, maxBucket)
  }
}
