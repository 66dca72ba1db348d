package graft.validate

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Row-level draft-7 fallback (SURVEY.md §2.5 "keep a row-level Scala
  * validator for the rest"; full keyword table assembled by the reference
  * at `target_parquet/validator.py:51-89`). Pure-Scala tests — the Spark
  * seam ([[Validator.rowViolation]]) is covered in [[ValidatorSpec]] and
  * the pipeline integration in SingerPipelineSpec.
  */
class JsonSchemaValidatorSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {

  private def check(schemaJson: String, valueJson: String): List[String] =
    JsonSchemaValidator.compile(JsonMethods.parse(schemaJson))(
      JsonMethods.parse(valueJson), "$")

  private def valid(schemaJson: String, valueJson: String): Boolean =
    check(schemaJson, valueJson).isEmpty

  test("uniqueItems: JSON equality is key-order-insensitive and 1 == 1.0") {
    valid("""{"uniqueItems": true}""", """[1, 2, 3]""") shouldBe true
    check("""{"uniqueItems": true}""", """[1, 2, 1]""") shouldBe List("$: uniqueItems")
    // 1 and 1.0 are the same JSON number
    valid("""{"uniqueItems": true}""", """[1, 1.0]""") shouldBe false
    // object equality ignores key order
    valid("""{"uniqueItems": true}""",
      """[{"a": 1, "b": 2}, {"b": 2, "a": 1}]""") shouldBe false
    valid("""{"uniqueItems": true}""",
      """[{"a": 1}, {"a": 2}]""") shouldBe true
    valid("""{"uniqueItems": false}""", """[1, 1]""") shouldBe true
  }

  test("oneOf: exactly one branch must match") {
    val s = """{"oneOf": [{"maximum": 150}, {"minimum": 100}]}"""
    valid(s, "50") shouldBe true    // first only
    valid(s, "200") shouldBe true   // second only
    check(s, "120") shouldBe List("$: oneOf") // both
  }

  test("anyOf validates the ORIGINAL schema even though resolution takes anyOf[0] (sinks.py:47-48 vs validator.py)") {
    val s = """{"anyOf": [{"type": "string"}, {"type": "integer"}]}"""
    valid(s, "\"x\"") shouldBe true
    valid(s, "3") shouldBe true
    check(s, "3.5") shouldBe List("$: anyOf")
  }

  test("allOf / not") {
    val s = """{"allOf": [{"minimum": 0}, {"maximum": 10}]}"""
    valid(s, "5") shouldBe true
    check(s, "11") shouldBe List("$: allOf")
    check("""{"not": {"type": "string"}}""", "\"x\"") shouldBe List("$: not")
    valid("""{"not": {"type": "string"}}""", "1") shouldBe true
  }

  test("if/then/else") {
    val s =
      """{"if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
        | "then": {"required": ["aField"]},
        | "else": {"required": ["bField"]}}""".stripMargin
    valid(s, """{"kind": "a", "aField": 1}""") shouldBe true
    check(s, """{"kind": "a"}""") shouldBe List("$.aField: required")
    valid(s, """{"kind": "b", "bField": 1}""") shouldBe true
    check(s, """{"kind": "b"}""") shouldBe List("$.bField: required")
  }

  test("dependencies: property-list and schema forms") {
    val s = """{"dependencies": {"credit_card": ["billing_address"]}}"""
    valid(s, """{"credit_card": 1, "billing_address": "x"}""") shouldBe true
    check(s, """{"credit_card": 1}""") shouldBe List("$.credit_card: dependencies")
    valid(s, """{"name": "y"}""") shouldBe true // key absent → no dependency

    val s2 = """{"dependencies": {"a": {"required": ["b"]}}}"""
    check(s2, """{"a": 1}""") shouldBe List("$.a: dependencies")
    valid(s2, """{"a": 1, "b": 2}""") shouldBe true
  }

  test("patternProperties + additionalProperties") {
    val s =
      """{"properties": {"name": {"type": "string"}},
        | "patternProperties": {"^n_": {"type": "integer"}},
        | "additionalProperties": false}""".stripMargin
    valid(s, """{"name": "x", "n_count": 3}""") shouldBe true
    check(s, """{"n_count": "not-int"}""") shouldBe List("$.n_count: type")
    // unmatched key hits additionalProperties: false
    check(s, """{"other": 1}""") shouldBe List("$.other: false-schema")
  }

  test("propertyNames / minProperties / maxProperties") {
    val s = """{"propertyNames": {"pattern": "^[a-z]+$"}}"""
    valid(s, """{"abc": 1}""") shouldBe true
    check(s, """{"Bad": 1}""") shouldBe List("$.Bad: propertyNames")
    check("""{"minProperties": 2}""", """{"a": 1}""") shouldBe List("$: minProperties")
    check("""{"maxProperties": 1}""", """{"a": 1, "b": 2}""") shouldBe List("$: maxProperties")
  }

  test("contains reports at the array; items extend the path per element") {
    val s = """{"contains": {"const": "click"}}"""
    valid(s, """["view", "click"]""") shouldBe true
    check(s, """["view", "scroll"]""") shouldBe List("$: contains")
    check("""{"items": {"type": "integer"}}""", """[1, "x", 3]""") shouldBe
      List("$[1]: type")
  }

  test("tuple-form items + additionalItems") {
    val s =
      """{"items": [{"type": "integer"}, {"type": "string"}],
        | "additionalItems": {"type": "boolean"}}""".stripMargin
    valid(s, """[1, "a", true]""") shouldBe true
    check(s, """[1, "a", 3]""") shouldBe List("$[2]: type")
    check(s, """["x", "a"]""") shouldBe List("$[0]: type")
  }

  test("$ref: local pointers and recursion terminate") {
    val s =
      """{"definitions": {"pos": {"type": "integer", "minimum": 1}},
        | "properties": {"n": {"$ref": "#/definitions/pos"}}}""".stripMargin
    valid(s, """{"n": 3}""") shouldBe true
    check(s, """{"n": 0}""") shouldBe List("$.n: minimum")
    // recursive: a linked list of {next: {next: ...}}
    val rec =
      """{"properties": {"next": {"$ref": "#"}, "v": {"type": "integer"}}}"""
    valid(rec, """{"v": 1, "next": {"v": 2, "next": {"v": 3}}}""") shouldBe true
    check(rec, """{"v": 1, "next": {"v": "bad"}}""") shouldBe
      List("$.next.v: type")
    // unresolvable ref fails loudly
    check("""{"$ref": "#/nope"}""", "1") shouldBe List("$: false-schema")
  }

  test("type: integer accepts whole-valued numbers (draft-7)") {
    valid("""{"type": "integer"}""", "3.0") shouldBe true
    valid("""{"type": "integer"}""", "3.5") shouldBe false
    valid("""{"type": ["integer", "null"]}""", "null") shouldBe true
  }

  test("house rules kept from validator.py: numeric exclusives fail on equality; float multipleOf vacuous") {
    check("""{"exclusiveMaximum": 5}""", "5") shouldBe List("$: exclusiveMaximum")
    check("""{"exclusiveMinimum": 5}""", "5") shouldBe List("$: exclusiveMinimum")
    valid("""{"multipleOf": 0.5}""", "1.3") shouldBe true // validator.py:8-20
    check("""{"multipleOf": 3}""", "10") shouldBe List("$: multipleOf")
  }

  test("required uses presence (JSON null satisfies it), unlike the post-parse Column check") {
    valid("""{"required": ["a"]}""", """{"a": null}""") shouldBe true
    check("""{"required": ["a"]}""", """{"b": 1}""") shouldBe List("$.a: required")
  }

  test("boolean schemas and violation determinism") {
    valid("true", """{"anything": 1}""") shouldBe true
    check("false", "1") shouldBe List("$: false-schema")
    // multiple violations: full set returned, min() is the canonical label
    val s =
      """{"properties": {"tags": {"uniqueItems": true},
        |                "value": {"oneOf": [{"maximum": 150}, {"minimum": 100}]}}}""".stripMargin
    val vs = check(s, """{"tags": [1, 1], "value": 120}""")
    vs.toSet shouldBe Set("$.tags: uniqueItems", "$.value: oneOf")
    vs.min shouldBe "$.tags: uniqueItems"
  }

  test("needsRowValidator gates the fallback") {
    def needs(s: String) = Validator.needsRowValidator(JsonMethods.parse(s))
    needs("""{"type": "object", "properties": {"a": {"type": "integer", "maximum": 5}}}""") shouldBe false
    needs("""{"properties": {"t": {"type": "array", "uniqueItems": true}}}""") shouldBe true
    needs("""{"properties": {"v": {"oneOf": [{"type": "string"}]}}}""") shouldBe true
    needs("""{"properties": {"p": {"items": [{"type": "integer"}]}}}""") shouldBe true
    needs("""{"properties": {"p": {"items": {"type": "integer"}}}}""") shouldBe false
    // a DATA-SIDE property literally named like a keyword is a column
    // name, not a keyword — must not drag the stream off the fast path
    needs("""{"properties": {"anyOf": {"type": "string"}}}""") shouldBe false
    needs("""{"properties": {"not": {"type": "integer"}, "if": {"type": "string"}}}""") shouldBe false
    // but a real keyword nested INSIDE such a property's schema still counts
    needs("""{"properties": {"anyOf": {"type": "array", "uniqueItems": true}}}""") shouldBe true
  }
}
