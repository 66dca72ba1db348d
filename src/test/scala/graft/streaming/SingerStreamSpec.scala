package graft.streaming

import graft.TestSpark
import graft.pipeline.SingerConfig
import graft.schema.SchemaMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

class SingerStreamSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()

  test("streaming ingest: micro-batches append per-stream parquet with the same coercions") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/batch1.jsonl"),
      """{"type": "RECORD", "stream": "m", "record": {"id": "a", "n": "1"}}
        |{"type": "RECORD", "stream": "m", "record": {"id": "b", "n": 2}}
        |{"type": "STATE", "value": {"bookmarks": {"m": {"id": "b"}}}}
        |""".stripMargin)
    val schemas = Map("m" -> SchemaMapper.fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "m", "schema": {"type": "object", "properties": {"id": {"type": ["string", "null"]}, "n": {"type": ["integer", "null"]}}}, "key_properties": ["id"]}"""))
    val q = SingerStream.start(
      spark, s"$dir/in", schemas, SingerConfig(s"$dir/out"), s"$dir/chk")
    q.awaitTermination(60000)
    val out = spark.read.parquet(s"$dir/out/m.parquet")
    out.schema("n").dataType.typeName shouldBe "long"
    out.count() shouldBe 2
    // STATE passthrough: batch's last state value lands in state.json
    Files.readString(java.nio.file.Paths.get(s"$dir/out/state.json")) shouldBe
      """{"bookmarks":{"m":{"id":"b"}}}"""
    // second file appears -> next incremental run picks up only the delta
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/batch2.jsonl"),
      """{"type": "RECORD", "stream": "m", "record": {"id": "c", "n": 3}}""" + "\n")
    val q2 = SingerStream.start(
      spark, s"$dir/in", schemas, SingerConfig(s"$dir/out"), s"$dir/chk")
    q2.awaitTermination(60000)
    spark.read.parquet(s"$dir/out/m.parquet").count() shouldBe 3
    // metrics recomputed from per-batch files across both runs (A1),
    // idempotent under batch replay
    Files.readString(java.nio.file.Paths.get(s"$dir/out/job_metrics.json")) shouldBe
      """{"recordCount":{"m":3}}"""
  }
}
