package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One changelog entry for the streaming snapshot view: `op` is
  * `upsert` / `delete`, `seq` the change-stream offset (unique per key).
  */
final case class DocChange(
    doc_id: Long, op: String, seq: Long,
    lang: String, source: String, n_chars: Long)

/** The materialized-view changelog row [[DocStreamOps.snapshotStream]]
  * emits: `present = false` is a tombstone (the key was deleted).
  */
final case class DocSnapshotRow(
    doc_id: Long, present: Boolean, seq: Long,
    lang: String, source: String, n_chars: Long)

/** `transformWithState` processor behind [[DocStreamOps.snapshotStream]]:
  * per-key `ValueState` holds the winning (seq, op, payload); a
  * micro-batch's rows fold to their max-seq entry, and only a strictly
  * newer seq updates state — late/replayed changes are no-ops, which is
  * what makes the view safe under at-least-once delivery. State per key
  * is one row; production passes a TTL to age out retired keys.
  */
final class SnapshotProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, DocChange, DocSnapshotRow] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var state: ValueState[DocChange] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DocChange]("latest",
      Encoders.product[DocChange], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[DocChange],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[DocSnapshotRow] = {
    val incoming = rows.maxBy(_.seq)
    val current = if (state.exists()) Some(state.get()) else None
    if (current.forall(_.seq < incoming.seq)) {
      state.update(incoming)
      Iterator.single(DocSnapshotRow(
        key, incoming.op != "delete", incoming.seq,
        incoming.lang, incoming.source, incoming.n_chars))
    } else Iterator.empty
  }
}

/** Streaming document-corpus operators: continuous-ingest twins of
  * [[graft.ops.Dedup]]'s batch snapshot operators, for the "documents
  * arrive as a feed" deployment (crawler output, Singer document taps).
  */
object DocStreamOps {

  /** Continuously-maintained snapshot view — the streaming twin of
    * [[graft.ops.CorpusOps.applyChanges]]: a changelog stream folds into
    * a latest-per-key materialized view, emitting one changelog row per
    * actual change (tombstones for deletes) in Update mode. Batch input
    * produces the IDENTICAL view rows from one window — the
    * oracle-checkable twin (`q_cdc_apply` exercises the shared
    * semantics through `applyChanges`).
    */
  def snapshotStream(changes: Dataset[DocChange]): Dataset[DocSnapshotRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    if (changes.isStreaming)
      changes.groupByKey(_.doc_id)
        .transformWithState(new SnapshotProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
    else
      changes.toDF()
        .withColumn("_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("seq").desc)))
        .filter(col("_rn") === 1)
        .select(col("doc_id"), (col("op") =!= "delete").as("present"),
          col("seq"), col("lang"), col("source"), col("n_chars"))
        .as[DocSnapshotRow]
  }

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
