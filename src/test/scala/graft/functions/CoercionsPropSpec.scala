package graft.functions

import graft.TestSpark
import graft.schema.SchemaMapper
import org.json4s.jackson.JsonMethods
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the coercion layer (E1–E8, `sinks.py:72-112`):
  * arbitrary scalar values serialized into Singer RECORD JSON must
  * round-trip through the full single-parse pipeline to their
  * schema-resolved Spark values.
  */
class CoercionsPropSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong * 7 + 1)))

  private val schemaMsg = SchemaMapper.fromSchemaMessage(
    """{"type": "SCHEMA", "stream": "p", "schema": {"type": "object", "properties": {
      |"i": {"type": ["integer", "null"]},
      |"d": {"type": ["number", "null"]},
      |"b": {"type": ["boolean", "null"]},
      |"s": {"type": ["string", "null"]}
      |}}, "key_properties": []}""".stripMargin)

  private def runPipeline(records: Seq[String]) = {
    val lines = records
      .map(r => s"""{"type": "RECORD", "stream": "p", "record": $r}""")
      .toDF("value")
    graft.pipeline.SingerPipeline.typedRecordsFromLines(lines, schemaMsg).collect()
  }

  test("longs round-trip exactly, bare and quoted (E4)") {
    val vals = samples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    val rows = runPipeline(vals.map(v => s"""{"i": $v}""") ++
      vals.map(v => s"""{"i": "$v"}"""))
    rows.map(_.getLong(0)).toSeq shouldBe (vals ++ vals)
  }

  test("doubles round-trip through JSON text (E3)") {
    val vals = samples(Gen.chooseNum(-1e12, 1e12)).map(v => math.rint(v * 100) / 100)
    val rows = runPipeline(vals.map(v => s"""{"d": $v}"""))
    rows.map(_.getDouble(1)).toSeq shouldBe vals
  }

  test("booleans and strings keep identity; falsy values are not null") {
    val rows = runPipeline(Seq(
      """{"b": false, "s": ""}""",
      """{"b": true, "s": "0"}""",
      """{"i": 0, "d": 0.0}"""))
    rows(0).getBoolean(2) shouldBe false
    rows(0).getString(3) shouldBe "" // E2 applies only to NON-string types
    rows(1).getString(3) shouldBe "0"
    rows(2).getLong(0) shouldBe 0L
    rows(2).getDouble(1) shouldBe 0.0
  }

  test("arbitrary strings survive JSON escaping (E6)") {
    val printable = samples(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', '!', '-', '_'))).map(_.mkString), 60)
    val json = printable.map(s =>
      JsonMethods.compact(JsonMethods.render(org.json4s.JObject("s" -> org.json4s.JString(s)))))
    val rows = runPipeline(json)
    rows.map(_.getString(3)).toSeq shouldBe printable
  }

  test("integer coercion matches Python int(): truncation, bools, errors (E4)") {
    val rows = runPipeline(Seq(
      """{"i": 3.9}""", """{"i": -3.9}""", """{"i": true}""", """{"i": false}""",
      """{"i": "1e3"}"""))
    rows.map(_.getLong(0)).toSeq shouldBe Seq(3L, -3L, 1L, 0L, 1000L)
    // garbage still kills the pipeline, like the reference's int("abc")
    intercept[Exception](runPipeline(Seq("""{"i": "abc"}""")))
  }

  test("null in any position stays null across all types") {
    val rows = runPipeline(Seq("""{"i": null, "d": null, "b": null, "s": null}""", """{}"""))
    rows.foreach { r => (0 to 3).foreach(i => r.isNullAt(i) shouldBe true) }
  }
}
