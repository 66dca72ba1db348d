package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON-Schema (draft-7 subset) → Spark schema mapping.
  *
  * Re-expresses the schema-resolution rules of the reference Singer target
  * (hotgluexyz/target-parquet, `target_parquet/sinks.py:21-69`) against
  * Spark's type system:
  *
  *   - `anyOf[0]` wins; later variants (including `{"type":"null"}`) are
  *     ignored (`sinks.py:47-48`). We replicate the resolution rule but not
  *     the corrupted-file outcome it can cause in the reference (BUG-1/BUG-2,
  *     SURVEY.md §2.10).
  *   - A missing `type` defaults to `["string","null"]` (`sinks.py:49`).
  *   - Nullable iff `"null"`/`"array"`/`"object"` appears in the type
  *     array or `format == "date-time"` (`sinks.py:51`).
  *   - Multi-type arrays resolve with priority: single element → itself,
  *     else `boolean` > `string` > first element (`sinks.py:56-65`).
  *   - Type table (`sinks.py:27-43`): null→NullType, number→DoubleType,
  *     integer→LongType, boolean→BooleanType, `format:date-time`→
  *     TimestampType (µs in Spark vs ms in Arrow — values embed losslessly),
  *     everything else (string/array/object) → StringType.
  *
  * All of this is pure driver-side Scala: schemas arrive in-band as Singer
  * SCHEMA messages (tiny), so there is no reason to distribute this work.
  */
object SchemaMapper {

  /** A stream property after the reference's resolution rules have fired.
    *
    * `typeId` is the resolved JSON-Schema type id; `raw` keeps the
    * (post-anyOf) property object so the validation layer can read draft-7
    * constraint keywords (`enum`, `maximum`, `pattern`, ...).
    * `fromAnyOf` records that `raw` is only branch 0 of an `anyOf` — the
    * reference RESOLVES types from anyOf[0] but VALIDATES against the full
    * schema, so branch-0 keywords must not be enforced unconditionally
    * (the row-level validator owns anyOf semantics).
    */
  final case class ResolvedProperty(
      name: String,
      typeId: String,
      format: Option[String],
      nullable: Boolean,
      raw: JObject,
      fromAnyOf: Boolean = false) {

    def sparkType: DataType = SchemaMapper.sparkType(typeId, format)

    /** Column is timestamp-typed (E5/E8 coercion applies). */
    def isDateTime: Boolean = sparkType == TimestampType

    /** The raw value is nested JSON kept as text (E7 degradation). */
    def isNested: Boolean = typeId == "array" || typeId == "object"
  }

  /** Type table, `sinks.py:27-43`. Note the reference checks `format`
    * only after null/number/integer/boolean — an `integer` property with
    * `format: date-time` stays integer. Replicated here.
    */
  def sparkType(typeId: String, format: Option[String]): DataType = typeId match {
    case "null"    => NullType
    case "number"  => DoubleType
    case "integer" => LongType
    case "boolean" => BooleanType
    case _ if format.contains("date-time") => TimestampType
    case _ => StringType
  }

  /** C1, `sinks.py:21-24`. */
  def removeNullString(types: List[String]): List[String] =
    types.filterNot(_ == "null")

  /** C3, `sinks.py:46-69`: property object → resolved property. */
  def resolve(key: String, prop0: JValue): ResolvedProperty = {
    val obj0: JObject = prop0 match {
      case o: JObject => o
      case _          => JObject()
    }
    // anyOf[0] wins (sinks.py:47-48).
    val fromAnyOf = (obj0 \ "anyOf") match {
      case JArray(_ :: _) => true
      case _              => false
    }
    val obj: JObject = obj0 \ "anyOf" match {
      case JArray(head :: _) =>
        head match { case o: JObject => o; case _ => JObject() }
      case _ => obj0
    }
    // `type` may be a scalar string or an array; missing defaults to
    // ["string","null"] (sinks.py:49).
    val typesRaw: Either[String, List[String]] = obj \ "type" match {
      case JString(s) => Left(s)
      case JArray(vs) => Right(vs.collect { case JString(s) => s })
      case _          => Right(List("string", "null"))
    }
    val format = obj \ "format" match {
      case JString(f) => Some(f)
      case _          => None
    }
    val members = typesRaw.fold(List(_), identity)
    // Nullability triple + date-time rule (sinks.py:51).
    val nullable =
      members.exists(Set("null", "array", "object")) || format.contains("date-time")
    // "null" entries are stripped only when the field is nullable and the
    // type is an array (remove_null_string passes scalars through).
    val afterStrip = typesRaw match {
      case Left(s)  => List(s)
      case Right(l) => if (nullable) removeNullString(l) else l
    }
    // Priority chain (sinks.py:56-65). A `["null"]` *array* crashes the
    // reference (IndexError after stripping); we resolve it to NullType,
    // matching the scalar `"null"` behavior — documented fix.
    val typeId = afterStrip match {
      case Nil                                  => "null"
      case one :: Nil                           => one
      case many if many.contains("boolean")     => "boolean"
      case many if many.contains("string")      => "string"
      case head :: _                            => head
    }
    ResolvedProperty(key, typeId, format, nullable, obj, fromAnyOf)
  }

  /** One Singer stream's resolved schema: the driver-side registry entry.
    * `rawSchema` keeps the stream's full original JSON-Schema object so the
    * row-level validator ([[graft.validate.JsonSchemaValidator]]) can
    * compile object-level keywords (`dependencies`, `patternProperties`,
    * `oneOf`, ...) that per-property resolution discards.
    */
  final case class StreamSchema(
      stream: String,
      properties: Vector[ResolvedProperty],
      keyProperties: Vector[String],
      rawSchema: JValue = JNothing) {

    /** Typed output schema (C4, `sinks.py:152-155`). `key_properties` ride
      * along in field metadata on the key columns (Spark has no schema-level
      * key/value metadata; the parquet footer carries the full StructType).
      */
    def struct: StructType = StructType(properties.map { p =>
      val md =
        if (keyProperties.contains(p.name))
          new MetadataBuilder().putBoolean("key_property", true).build()
        else Metadata.empty
      StructField(p.name, p.sparkType, p.nullable, md)
    })

    /** All-string schema for the single-pass raw extraction: `from_json`
      * with StringType fields captures scalars as their JSON text and nested
      * objects/arrays as raw JSON (the reference's E7 degradation for free).
      */
    def parseStruct: StructType =
      StructType(properties.map(p => StructField(p.name, StringType, nullable = true)))

    /** P1 `fixed_headers` pruning (`sinks.py:147-153`): keep listed columns,
      * untouched when the stream is not configured.
      */
    def select(cols: Option[Seq[String]]): StreamSchema = cols match {
      case None       => this
      case Some(keep) => copy(properties = properties.filter(p => keep.contains(p.name)))
    }

    /** The draft-7 object-level `required` list (empty when absent) —
      * what the validation layer's required check keys on.
      */
    def requiredFields: Set[String] = rawSchema \ "required" match {
      case JArray(vs) => vs.collect { case JString(s) => s }.toSet
      case _          => Set.empty
    }
  }

  /** One field's change between two SCHEMA messages of a stream. `kind`
    * is `added` / `removed` / `retyped` / `nullability`; for `retyped`
    * the before/after carry the resolved Spark type names.
    */
  final case class FieldChange(
      field: String,
      kind: String,
      before: Option[String],
      after: Option[String])

  /** Mid-stream schema drift report: what changed between consecutive
    * SCHEMA messages for a stream. The reference CRASHES on any change
    * at the second flush (BUG-4, `writers.py:27-29`,
    * `tests/test_integration.py:232-275`); this pipeline resolves
    * last-wins — the report is what an operator alerts/logs on so that
    * resolution is never silent. Type comparison runs AFTER the C3
    * resolution rules, so two raw schemas that resolve identically
    * (e.g. `["null","string"]` vs `anyOf` order shuffles) report clean.
    */
  def schemaDiff(before: StreamSchema, after: StreamSchema): Vector[FieldChange] = {
    val b = before.properties.map(p => p.name -> p).toMap
    val a = after.properties.map(p => p.name -> p).toMap
    val added = after.properties.filterNot(p => b.contains(p.name)).map(p =>
      FieldChange(p.name, "added", None, Some(p.sparkType.catalogString)))
    val removed = before.properties.filterNot(p => a.contains(p.name)).map(p =>
      FieldChange(p.name, "removed", Some(p.sparkType.catalogString), None))
    val common = before.properties.flatMap { bp =>
      a.get(bp.name).toSeq.flatMap { ap =>
        val retyped =
          if (bp.sparkType != ap.sparkType)
            Seq(FieldChange(bp.name, "retyped",
              Some(bp.sparkType.catalogString), Some(ap.sparkType.catalogString)))
          else Nil
        val renull =
          if (bp.nullable != ap.nullable)
            Seq(FieldChange(bp.name, "nullability",
              Some(bp.nullable.toString), Some(ap.nullable.toString)))
          else Nil
        retyped ++ renull
      }
    }
    (added ++ removed ++ common).sortBy(c => (c.field, c.kind))
  }

  /** Parse a Singer SCHEMA message (driver side, one per stream). */
  def fromSchemaMessage(json: String): StreamSchema = {
    val msg = JsonMethods.parse(json)
    val stream = msg \ "stream" match {
      case JString(s) => s
      case _          => sys.error(s"SCHEMA message without stream: $json")
    }
    val props = msg \ "schema" \ "properties" match {
      case JObject(fields) => fields.toVector.map { case (k, v) => resolve(k, v) }
      case _               => Vector.empty[ResolvedProperty]
    }
    val keys = msg \ "key_properties" match {
      case JArray(vs) => vs.collect { case JString(s) => s }.toVector
      case _          => Vector.empty[String]
    }
    StreamSchema(stream, props, keys, msg \ "schema")
  }
}
