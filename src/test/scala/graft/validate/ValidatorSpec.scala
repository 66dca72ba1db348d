package graft.validate

import graft.TestSpark
import graft.schema.SchemaMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Constraint predicates (SURVEY.md §2.5 V1–V3;
  * `/root/reference/target_parquet/validator.py`).
  */
class ValidatorSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def prop(json: String) =
    SchemaMapper.resolve("x", org.json4s.jackson.JsonMethods.parse(json))

  private def violated(propJson: String, values: Seq[Any]): Seq[Boolean] = {
    val p = prop(propJson)
    val df = values.map(v => Option(v).map(_.toString)).toDF("raw")
    val c = graft.functions.Coercions.coerce($"raw", p)
    val checks = Validator.constraints(c, p)
    val combined = checks.map(_._2).reduceOption(_ || _).getOrElse(lit(false))
    df.select(coalesce(combined, lit(false))).collect().map(_.getBoolean(0)).toSeq
  }

  test("enum violation (validator exercised path, tests/test_sinks.py:301)") {
    violated("""{"type": "string", "enum": ["a", "b"]}""",
      Seq("a", "b", "z", null)) shouldBe Seq(false, false, true, false)
  }

  test("inclusive maximum / minimum (draft-7)") {
    violated("""{"type": "integer", "maximum": 10}""",
      Seq(10L, 11L, 9L)) shouldBe Seq(false, true, false)
    violated("""{"type": "integer", "minimum": 2}""",
      Seq(2L, 1L)) shouldBe Seq(false, true)
  }

  test("exclusive numeric bounds fail on equality (validator.py:23-48)") {
    violated("""{"type": "number", "exclusiveMaximum": 5}""",
      Seq(5.0, 4.9)) shouldBe Seq(true, false)
    violated("""{"type": "number", "exclusiveMinimum": 5}""",
      Seq(5.0, 5.1)) shouldBe Seq(true, false)
  }

  test("multipleOf: integer divisor exact; float divisor vacuous (validator.py:8-20)") {
    violated("""{"type": "integer", "multipleOf": 3}""",
      Seq(9L, 10L)) shouldBe Seq(false, true)
    // the reference's float branch compares a value to itself — never fails
    violated("""{"type": "number", "multipleOf": 0.5}""",
      Seq(1.3, 1.0)) shouldBe Seq(false, false)
  }

  test("minLength / maxLength / pattern on strings") {
    violated("""{"type": "string", "maxLength": 3}""",
      Seq("abc", "abcd")) shouldBe Seq(false, true)
    violated("""{"type": "string", "minLength": 2}""",
      Seq("ab", "a")) shouldBe Seq(false, true)
    violated("""{"type": "string", "pattern": "^[a-z]+$"}""",
      Seq("abc", "Abc")) shouldBe Seq(false, true)
  }

  test("minItems / maxItems count JSON-array elements of nested text (E7 layer)") {
    violated("""{"type": ["array", "null"], "minItems": 2}""",
      Seq("[1, 2]", "[1]", null)) shouldBe Seq(false, true, false)
    violated("""{"type": ["array", "null"], "maxItems": 2}""",
      Seq("[1, 2]", "[1, 2, 3]")) shouldBe Seq(false, true)
  }

  test("rowViolation: canonical min label over the full keyword set, null-safe") {
    val schema = org.json4s.jackson.JsonMethods.parse(
      """{"type": "object", "properties": {
        |  "tags": {"type": "array", "uniqueItems": true},
        |  "value": {"oneOf": [{"maximum": 150}, {"minimum": 100}]}
        |}}""".stripMargin)
    val df = Seq(
      """{"tags": ["a", "b"], "value": 50}""",  // valid
      """{"tags": ["a", "a"], "value": 120}""", // two violations → min label
      """{"tags": ["a"], "value": 120}""",      // oneOf only
      "not json",                                // parse error label
      null.asInstanceOf[String]                  // null → null
    ).toDF("rec")
    val out = Validator.annotateRows(df, schema, $"rec")
      .select("_violation").collect().map(_.getString(0))
    out shouldBe Array(null, "$.tags: uniqueItems", "$.value: oneOf", "$: parse-error", null)
  }

  test("required fires only for schema-listed fields, not every non-nullable one") {
    val ss = SchemaMapper.fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "s", "schema": {"type": "object",
        | "required": ["id"],
        | "properties": {
        |   "id": {"type": "integer"},
        |   "age": {"type": "integer"}}}, "key_properties": []}""".stripMargin)
    // age is non-nullable but NOT required: omitting it must pass
    // (draft-7 + the reference's jsonschema validator accept it)
    val df = Seq(
      (Some(1L), Some(30L)), // valid
      (Some(2L), None),      // optional age missing -> still valid
      (None, Some(40L))      // required id missing -> violation
    ).map { case (a, b) =>
      (a.map(Long.box).orNull, b.map(Long.box).orNull)
    }.toDF("id", "age")
    val out = Validator.annotate(df, ss).select("_violation").collect().map(_.getString(0))
    out shouldBe Array(null, null, "id: required")
  }

  test("anyOf branch-0 keywords are NOT enforced by the column layer") {
    // anyOf[integer max=10, number]: 50 violates branch 0 but satisfies
    // branch 1 — the reference validates the full schema and accepts it;
    // the row-level fallback owns anyOf, so the column layer must emit
    // no constraints at all for this property
    val p = prop("""{"anyOf": [{"type": "integer", "maximum": 10}, {"type": "number"}]}""")
    p.fromAnyOf shouldBe true
    Validator.constraints(lit(50L), p) shouldBe empty
    // and the row validator does accept the branch-1 value
    import org.json4s.jackson.JsonMethods
    val schema = JsonMethods.parse(
      """{"properties": {"x": {"anyOf": [{"type": "integer", "maximum": 10}, {"type": "number"}]}}}""")
    JsonSchemaValidator.compile(schema)(
      JsonMethods.parse("""{"x": 50.5}"""), "$") shouldBe Nil
  }

  test("required keys on the PRE-coercion parse when raw-null columns are present") {
    val ss = SchemaMapper.fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "s", "schema": {"type": "object",
        | "required": ["ts"],
        | "properties": {"ts": {"type": "string", "format": "date-time"}}},
        | "key_properties": []}""".stripMargin)
    // "garbage" is PRESENT: coercion nulls it (E8 repair) but draft-7
    // required is satisfied — only the truly-absent row violates
    val df = Seq(
      ("2024-01-01 10:00:00", false),
      ("garbage", false),
      (null.asInstanceOf[String], true)
    ).toDF("raw", "absent")
      .select(
        graft.functions.Coercions.coerce(col("raw"), ss.properties.head).as("ts"),
        col("absent").as(s"${Validator.RawNullPrefix}ts"))
    val out = Validator.annotate(df, ss).select("_violation").collect().map(_.getString(0))
    out shouldBe Array(null, null, "ts: required")
    // without the raw-null column the old approximation still applies
    val noRaw = Seq(("garbage", 0)).toDF("raw", "ignore")
      .select(graft.functions.Coercions.coerce(col("raw"), ss.properties.head).as("ts"))
    Validator.annotate(noRaw, ss).select("_violation").collect()
      .map(_.getString(0)) shouldBe Array("ts: required")
  }

  test("violation column labels the first failing property") {
    val ss = SchemaMapper.fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "s", "schema": {"type": "object", "properties": {"status": {"type": ["string", "null"], "enum": ["on", "off"]}, "n": {"type": ["integer", "null"], "maximum": 5}}}, "key_properties": []}""")
    val df = Seq(("on", 3L), ("bad", 3L), ("on", 9L)).toDF("status", "n")
    val out = Validator.annotate(df, ss).select("_violation").collect().map(_.getString(0))
    out shouldBe Array(null, "status: enum", "n: maximum")
  }
}
