package graft.tools

import graft.functions.Coercions
import graft.schema.SchemaMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver used by /verify: consumes the library API end-to-end. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("verifydrive").toString
    val input = s"$dir/input.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(input),
      """{"type": "SCHEMA", "stream": "metrics", "schema": {"type": "object", "properties": {"id": {"type": ["string", "null"]}, "count": {"type": ["integer", "null"]}, "price": {"type": ["number", "null"]}, "active": {"type": ["boolean", "null"]}, "created_at": {"type": ["string", "null"], "format": "date-time"}, "meta": {"type": ["object", "null"]}}}, "key_properties": ["id"]}
{"type": "RECORD", "stream": "metrics", "record": {"id": 7, "count": "42", "price": "3.14", "active": true, "created_at": "2024-01-15T10:30:00Z", "meta": {"k": [1, 2]}}}
{"type": "RECORD", "stream": "metrics", "record": {"id": "x", "count": "", "price": 2.5, "active": false, "created_at": "NOT A DATE", "extra_field": "dropped"}}
{"type": "STATE", "value": {"bookmarks": {}}}
""")
    // Probed separately: an uncastable value ("not-a-number" under integer)
    // raises CAST_INVALID_INPUT under Spark 4 ANSI — matches the reference,
    // whose Python int() call likewise kills the pipeline (sinks.py:93-94).

    // Consumer flow: schema message -> registry entry -> parse + coerce -> parquet
    val lines = spark.read.text(input)
    val schemaJson = lines
      .filter(get_json_object(col("value"), "$.type") === "SCHEMA")
      .collect().map(_.getString(0))
    val ss = SchemaMapper.fromSchemaMessage(schemaJson.head)
    println("RESOLVED STRUCT: " + ss.struct.treeString)

    val records = lines
      .filter(get_json_object(col("value"), "$.type") === "RECORD" &&
        get_json_object(col("value"), "$.stream") === ss.stream)
      .select(from_json(get_json_object(col("value"), "$.record"), ss.parseStruct).as("r"))
      .select(ss.properties.map(p => Coercions.coerce(col("r").getField(p.name), p)): _*)

    records.show(truncate = false)
    records.write.mode("overwrite").parquet(s"$dir/metrics.parquet")
    println("WROTE: " + s"$dir/metrics.parquet")
    spark.stop()
  }
}
