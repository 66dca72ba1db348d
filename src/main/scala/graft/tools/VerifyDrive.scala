package graft.tools

import graft.pipeline.{SingerConfig, SingerPipeline}
import graft.Sessions

/** Scratch driver used by /verify: consumes the library API end-to-end. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("verifydrive").toString
    val input = s"$dir/input.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(input),
      """{"type": "SCHEMA", "stream": "metrics", "schema": {"type": "object", "properties": {"id": {"type": ["string", "null"]}, "count": {"type": ["integer", "null"]}, "price": {"type": ["number", "null"]}, "active": {"type": ["boolean", "null"]}, "created_at": {"type": ["string", "null"], "format": "date-time"}, "meta": {"type": ["object", "null"]}, "status": {"type": ["string", "null"], "enum": ["ok", "warn"]}}}, "key_properties": ["id"]}
{"type": "SCHEMA", "stream": "empty_stream", "schema": {"type": "object", "properties": {"x": {"type": ["string", "null"]}}}, "key_properties": []}
{"type": "RECORD", "stream": "metrics", "record": {"id": 7, "count": "42", "price": "3.14", "active": true, "created_at": "2024-01-15T10:30:00Z", "meta": {"k": [1, 2]}, "status": "ok"}}
{"type": "RECORD", "stream": "metrics", "record": {"id": "x", "count": "", "price": 2.5, "active": false, "created_at": "NOT A DATE", "extra_field": "dropped", "status": "warn"}}
{"type": "STATE", "value": {"bookmarks": {}}}
""")

    // Full pipeline: registry -> demux -> coerce -> validate -> parquet + metrics
    val res = SingerPipeline.run(spark, input,
      SingerConfig(s"$dir/out", fixedHeaders = Map.empty, strictValidation = true))
    SingerPipeline.writeJobMetrics(s"$dir/out", res.recordCounts)
    println(s"RESULT: $res")
    println("METRICS: " + java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out/job_metrics.json")))
    res.paths.foreach { case (stream, path) =>
      println(s"== $stream ($path)")
      val df = spark.read.parquet(path)
      df.printSchema()
      df.show(truncate = false)
    }
    println("OUTDIR: " + s"$dir/out")
    spark.stop()
  }
}
