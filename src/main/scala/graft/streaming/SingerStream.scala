package graft.streaming

import graft.pipeline.{SingerConfig, SingerPipeline}
import graft.schema.SchemaMapper.StreamSchema
import graft.validate.Validator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Unbounded variant of the Singer ingest (SURVEY.md §1 "Streams vs batch"):
  * the reference reads stdin until EOF — logically an unbounded stream
  * processed in 10k-row micro-batches (`sinks.py:118`). Structured Streaming
  * is the native Spark expression of exactly that model: micro-batch
  * triggers replace the SDK's batch drain, checkpointing replaces the
  * writer-singleton registry (`writers.py:14-33`), and batchId-idempotent
  * partition writes replace its open-file append (foreachBatch is
  * at-least-once; idempotency in batchId makes the pipeline effectively
  * exactly-once end to end).
  *
  * Schemas must be registered up front (Singer taps emit SCHEMA before the
  *   first RECORD of a stream; a driver can pre-scan or pass them in). Each
  * micro-batch routes records per stream through the same coercion
  * projection as the batch path and appends to one parquet dataset per
  * stream — so the batch and streaming paths share all semantics.
  */
object SingerStream {

  /** Start the ingest over a directory of growing JSON-line files.
    *
    * @param schemas per-stream registry (from
    *                [[graft.schema.SchemaMapper.fromSchemaMessage]])
    * @param maxFilesPerTrigger cap source files per micro-batch — the
    *                knob that forces a bounded input through MULTIPLE
    *                append batches (the parity query pins it to 1 so
    *                the appended union, not a single batch, is what
    *                the oracle checks)
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      schemas: Map[String, StreamSchema],
      config: SingerConfig,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {

    val registry = schemas.map { case (s, ss) =>
      s -> ss.select(config.fixedHeaders.get(s))
    }

    val reader = spark.readStream
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .text(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // foreachBatch is AT-LEAST-ONCE: a batch can replay after a crash
        // between the write and the checkpoint commit. Both effects here
        // are therefore idempotent in batchId — data lands in a
        // per-batch partition directory that a replay OVERWRITES, and
        // metrics go to a per-batch file with totals recomputed
        // (writeBatchMetrics), never accumulated twice.
        // STATE passthrough rides an Observation on the first stream's
        // scan of the batch (same zero-extra-pass trick as the batch
        // path); the per-batch state file is idempotent in batchId too.
        val stateObs = org.apache.spark.sql.Observation(s"b$batchId-state")
        var stateObserved = false
        def observeState(df: org.apache.spark.sql.DataFrame) =
          if (stateObserved) df
          else {
            stateObserved = true
            SingerPipeline.withLineId(df)
              .observe(stateObs, SingerPipeline.lastStateAgg.as("last_state"))
              .select(col("value"))
          }
        val counts = registry.toSeq.sortBy(_._1).map { case (stream, ss) =>
          val typed0 = SingerPipeline.typedRecordsFromLines(observeState(batch), ss)
          val typed =
            if (config.strictValidation) Validator.enforce(typed0, ss) else typed0
          val obs = org.apache.spark.sql.Observation(s"b$batchId-$stream")
          typed.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("records"))
            .write.mode("overwrite")
            .parquet(s"${config.outDir}/$stream.parquet/_batch=$batchId")
          stream -> obs.get("records").asInstanceOf[Long]
        }.toMap
        SingerPipeline.writeBatchMetrics(config.outDir, batchId, counts)
        if (stateObserved)
          Option(stateObs.get("last_state")).foreach(line =>
            SingerPipeline.writeBatchState(
              config.outDir, batchId, SingerPipeline.stateValue(line.toString)))
        ()
      }
      .start()
  }
}
