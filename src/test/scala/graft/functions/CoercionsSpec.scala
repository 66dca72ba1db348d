package graft.functions

import graft.TestSpark
import graft.schema.SchemaMapper
import org.apache.spark.sql.functions._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference `parse_record_value` truth table
  * (`tests/test_sinks.py:135-229`) against the Column-expression coercions.
  *
  * Raw inputs are the JSON-literal text a `from_json` all-string parse
  * produces (numbers as "42", booleans as "true", nested as raw JSON,
  * JSON null as SQL NULL).
  */
class CoercionsSpec extends AnyFunSuite
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()

  private def coerceOne(raw: String, propJson: String): Any = {
    val p = SchemaMapper.resolve("f", JsonMethods.parse(propJson))
    val df = spark
      .createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(raw)),
        org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("raw",
            org.apache.spark.sql.types.StringType, nullable = true))))
      .select(Coercions.coerce(col("raw"), p))
    df.collect()(0).get(0)
  }

  test("null returns null (E1)") {
    assert(coerceOne(null, """{"type": "string"}""") == null)
  }
  test("number coercion from int literal (E3)") {
    assert(coerceOne("42", """{"type": "number"}""") == 42.0)
  }
  test("number coercion from string (E3)") {
    assert(coerceOne("3.14", """{"type": "number"}""") == 3.14)
  }
  test("integer coercion from string (E4)") {
    assert(coerceOne("42", """{"type": "integer"}""") == 42L)
  }
  test("boolean under number → 1.0/0.0 like Python float(True) (E3)") {
    assert(coerceOne("true", """{"type": "number"}""") == 1.0)
    assert(coerceOne("false", """{"type": "number"}""") == 0.0)
  }
  test("int value under string schema → text (E6)") {
    assert(coerceOne("42", """{"type": "string"}""") == "42")
  }
  test("float value under string schema → text (E6)") {
    assert(coerceOne("3.14", """{"type": "string"}""") == "3.14")
  }
  test("boolean value under string schema → JSON spelling (E6 divergence: ref gives Python 'True')") {
    assert(coerceOne("true", """{"type": "string"}""") == "true")
  }
  test("string passthrough (E6)") {
    assert(coerceOne("hello", """{"type": "string"}""") == "hello")
  }
  test("empty string under non-string → null (E2)") {
    assert(coerceOne("", """{"type": "integer"}""") == null)
    assert(coerceOne("", """{"type": "number"}""") == null)
  }
  test("empty string under string preserved (E2)") {
    assert(coerceOne("", """{"type": "string"}""") == "")
  }
  test("datetime string parsed (E5)") {
    val ts = coerceOne("2024-01-15T10:30:00Z",
      """{"type": "string", "format": "date-time"}""")
    assert(ts == java.sql.Timestamp.valueOf("2024-01-15 10:30:00"))
  }
  test("malformed datetime → null, record survives (E8 repair)") {
    assert(coerceOne("not-a-date",
      """{"type": "string", "format": "date-time"}""") == null)
  }
  test("empty datetime → null (E5/E8)") {
    assert(coerceOne("",
      """{"type": "string", "format": "date-time"}""") == null)
  }
  test("list of primitives kept as JSON text (E7)") {
    assert(coerceOne("[1,2,3]", """{"type": "array"}""") == "[1,2,3]")
  }
  test("object kept as JSON text (E7)") {
    assert(coerceOne("""{"key":"value","count":42}""", """{"type": "object"}""")
      == """{"key":"value","count":42}""")
  }
  test("stringified object under string type passes through (E6)") {
    assert(coerceOne("""{"key": "value"}""", """{"type": "string"}""")
      == """{"key": "value"}""")
  }
  test("anyOf uses first variant (E1)") {
    assert(coerceOne("42", """{"anyOf": [{"type": "number"}]}""") == 42.0)
  }
  test("no type defaults to string (E1)") {
    assert(coerceOne("42", """{}""") == "42")
  }
  test("fuzzy [number,null] parses as number (E1)") {
    assert(coerceOne("42", """{"type": ["number", "null"]}""") == 42.0)
  }
  test("boolean cast from JSON literal") {
    assert(coerceOne("true", """{"type": ["boolean", "null"]}""") == true)
    assert(coerceOne("false", """{"type": ["boolean", "null"]}""") == false)
  }
  test("BUG-3 fix: [number,string] coerces to the string COLUMN type (ref crashes)") {
    assert(coerceOne("1.5", """{"type": ["number", "string"]}""") == "1.5")
  }

  test("from_json all-string parse captures scalars and nested values as text") {
    // Pins the parse convention the pipeline relies on.
    import spark.implicits._
    val json = """{"a": 42, "b": 3.14, "c": true, "d": "s", "e": null,
                   "f": {"k": 1}, "g": [1, 2], "missing2": null}"""
    val schema = "a string, b string, c string, d string, e string, f string, g string, missing string"
    val row = Seq(json).toDF("v")
      .select(from_json($"v", org.apache.spark.sql.types.StructType.fromDDL(schema)).as("r"))
      .select("r.*").collect()(0)
    assert(row.getString(0) == "42")
    assert(row.getString(1) == "3.14")
    assert(row.getString(2) == "true")
    assert(row.getString(3) == "s")
    assert(row.get(4) == null)
    assert(row.getString(5) == """{"k":1}""")
    assert(row.getString(6) == "[1,2]")
    assert(row.get(7) == null) // absent field → null (P2)
  }
}
