package graft.schema

import graft.schema.SchemaMapper._
import org.apache.spark.sql.types._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference truth tables for the pure schema-mapping functions
  * (reference `tests/test_sinks.py:27-132`): remove_null_string (C1),
  * get_pyarrow_type (C2), build_pyarrow_field (C3).
  */
class SchemaMapperSpec extends AnyFunSuite
    with graft.CleanSessionCheck {

  private def prop(json: String): ResolvedProperty =
    resolve("f", JsonMethods.parse(json))

  // --- C1 remove_null_string (tests/test_sinks.py:27-44) ---

  test("removes null from list") {
    assert(removeNullString(List("string", "null")) == List("string"))
  }
  test("preserves non-null types") {
    assert(removeNullString(List("string", "number")) == List("string", "number"))
  }
  test("only null → empty") {
    assert(removeNullString(List("null")) == Nil)
  }
  test("multiple nulls stripped") {
    assert(removeNullString(List("null", "string", "null")) == List("string"))
  }

  // --- C2 type table (tests/test_sinks.py:47-70) ---

  test("type table") {
    assert(sparkType("null", None) == NullType)
    assert(sparkType("number", None) == DoubleType)
    assert(sparkType("integer", None) == LongType)
    assert(sparkType("boolean", None) == BooleanType)
    assert(sparkType("string", None) == StringType)
    assert(sparkType("string", Some("date-time")) == TimestampType)
    assert(sparkType("array", None) == StringType)
    assert(sparkType("object", None) == StringType)
  }
  test("format checked after primitive types (integer+date-time stays integer)") {
    assert(sparkType("integer", Some("date-time")) == LongType)
  }

  // --- C3 build field (tests/test_sinks.py:73-132) ---

  test("simple nullable string") {
    val p = prop("""{"type": ["string", "null"]}""")
    assert(p.sparkType == StringType && p.nullable)
  }
  test("non-nullable integer (scalar type)") {
    val p = prop("""{"type": "integer"}""")
    assert(p.sparkType == LongType && !p.nullable)
  }
  test("non-nullable string (scalar type)") {
    val p = prop("""{"type": "string"}""")
    assert(p.sparkType == StringType && !p.nullable)
  }
  test("anyOf uses first variant") {
    val p = prop("""{"anyOf": [{"type": "number"}, {"type": "null"}]}""")
    assert(p.sparkType == DoubleType)
    // BUG-1 fidelity: the null variant is dropped → NOT nullable.
    assert(!p.nullable)
  }
  test("fuzzy string/number → string wins either order") {
    assert(prop("""{"type": ["string", "number"]}""").sparkType == StringType)
    assert(prop("""{"type": ["number", "string"]}""").sparkType == StringType)
  }
  test("fuzzy boolean/string → boolean wins") {
    assert(prop("""{"type": ["boolean", "string"]}""").sparkType == BooleanType)
  }
  test("date-time always nullable") {
    val p = prop("""{"type": "string", "format": "date-time"}""")
    assert(p.sparkType == TimestampType && p.nullable)
    val p2 = prop("""{"type": ["string", "null"], "format": "date-time"}""")
    assert(p2.sparkType == TimestampType && p2.nullable)
  }
  test("array/object types nullable, stored as string") {
    val a = prop("""{"type": ["array", "null"]}""")
    assert(a.nullable && a.sparkType == StringType && a.isNested)
    val o = prop("""{"type": ["object", "null"]}""")
    assert(o.nullable && o.sparkType == StringType && o.isNested)
  }
  test("missing type defaults to [string, null]") {
    val p = prop("""{}""")
    assert(p.sparkType == StringType && p.nullable)
  }
  test("[null] list resolves to NullType (documented fix — ref crashes)") {
    val p = prop("""{"type": ["null"]}""")
    assert(p.sparkType == NullType && p.nullable)
  }
  test("multi-type without boolean/string → first element") {
    val p = prop("""{"type": ["number", "integer"]}""")
    assert(p.sparkType == DoubleType)
  }

  // --- C4 stream schema assembly + key metadata + P1 pruning ---

  test("SCHEMA message → StreamSchema with key metadata, field order kept") {
    val ss = fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "users",
         "schema": {"type": "object", "properties": {
           "id": {"type": ["string", "null"]},
           "count": {"type": ["integer", "null"]}}},
         "key_properties": ["id"]}""")
    assert(ss.stream == "users")
    assert(ss.struct.fieldNames.toSeq == Seq("id", "count"))
    assert(ss.struct("id").dataType == StringType)
    assert(ss.struct("count").dataType == LongType)
    assert(ss.struct("id").metadata.getBoolean("key_property"))
    assert(!ss.struct("count").metadata.contains("key_property"))
    assert(ss.keyProperties == Vector("id"))
  }
  test("fixed_headers pruning keeps listed columns only") {
    val ss = fromSchemaMessage(
      """{"type": "SCHEMA", "stream": "contacts",
         "schema": {"type": "object", "properties": {
           "id": {"type": ["string", "null"]},
           "name": {"type": ["string", "null"]}}},
         "key_properties": []}""")
    assert(ss.select(Some(Seq("id"))).struct.fieldNames.toSeq == Seq("id"))
    assert(ss.select(None).struct.fieldNames.toSeq == Seq("id", "name"))
  }

  test("schemaDiff reports added/removed/retyped/nullability after resolution") {
    def msg(props: String) = fromSchemaMessage(
      s"""{"type": "SCHEMA", "stream": "s",
          "schema": {"type": "object", "properties": {$props}},
          "key_properties": []}""")
    val before = msg(
      """"id": {"type": ["integer", "null"]},
         "gone": {"type": ["string", "null"]},
         "price": {"type": ["number", "null"]},
         "flag": {"type": ["boolean", "null"]}""")
    val after = msg(
      """"id": {"type": ["string", "null"]},
         "fresh": {"type": ["string", "null"]},
         "price": {"type": ["number", "null"]},
         "flag": {"type": "boolean"}""")
    val diff = SchemaMapper.schemaDiff(before, after)
    assert(diff == Vector(
      SchemaMapper.FieldChange("flag", "nullability", Some("true"), Some("false")),
      SchemaMapper.FieldChange("fresh", "added", None, Some("string")),
      SchemaMapper.FieldChange("gone", "removed", Some("string"), None),
      SchemaMapper.FieldChange("id", "retyped", Some("bigint"), Some("string"))))
  }

  test("schemaDiff is clean when raw forms differ but resolve identically") {
    def msg(props: String) = fromSchemaMessage(
      s"""{"type": "SCHEMA", "stream": "s",
          "schema": {"type": "object", "properties": {$props}},
          "key_properties": []}""")
    val a = msg(""""v": {"type": ["null", "string"]}""")
    val b = msg(""""v": {"anyOf": [{"type": ["string", "null"]}]}""")
    assert(SchemaMapper.schemaDiff(a, b).isEmpty)
  }
}
