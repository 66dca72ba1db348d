package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-corpus operators: continuous-ingest twins of
  * [[graft.ops.Dedup]]'s batch snapshot operators, for the "documents
  * arrive as a feed" deployment (crawler output, Singer document taps).
  */
object DocStreamOps {

  /** Streaming incremental exact dedup — the continuous form of
    * [[graft.ops.Dedup.dedupIncremental]]. Survivors are documents whose
    * content digest ([[graft.ops.Dedup.contentKey]] — the SAME rule as
    * every batch dedup operator, so the two paths cannot disagree on what
    * "identical" means) is:
    *
    *   1. new within the stream — `dropDuplicatesWithinWatermark` keyed
    *      on the digest collapses in-batch dups, cross-batch dups, and
    *      at-least-once replays, with state bounded by the watermark
    *      rather than corpus history (the accumulated corpus lives in
    *      `index`, not in stream state); and
    *   2. absent from the accumulated `index` (a `content_key` column
    *      from prior snapshots) — a stream-static left-anti join, planned
    *      per micro-batch.
    *
    * First-arrival-wins replaces batch's lowest-id-wins: a stream has an
    * arrival order, not a total id order. Batch input delegates to the
    * deterministic [[graft.ops.Dedup.dedupIncremental]].
    *
    * Expects `ts` (event time) on streaming input. At 100 TB/day the
    * shapes hold: digest state is only the watermark window, the index
    * anti-join shuffles (digest, id) pairs, and the index itself is a
    * one-column parquet scan refreshed per run.
    */
  def dedupIncrementalStream(
      docs: DataFrame,
      index: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    if (!docs.isStreaming) Dedup.dedupIncremental(docs, index)
    else docs
      .withColumn("content_key", Dedup.contentKey(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_key")
      .join(index, Seq("content_key"), "left_anti")
      .drop("content_key")
}
