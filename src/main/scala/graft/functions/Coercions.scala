package graft.functions

import graft.schema.SchemaMapper.ResolvedProperty
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-field scalar coercion layer — the reference's `parse_record_value`
  * dispatcher and timestamp-repair pass re-expressed as Catalyst `Column`
  * expressions (reference `target_parquet/sinks.py:72-112,177-208`;
  * SURVEY.md §2.4 E1–E8).
  *
  * Input convention: every raw column is the property's JSON value captured
  * as TEXT by `from_json` with an all-string struct — scalars arrive as
  * their JSON literal text (`42`, `3.14`, `true`), nested objects/arrays as
  * their raw JSON (`{"k":1}`), and JSON `null` as SQL NULL. The coercions
  * below turn that uniform text layer into the schema-resolved Spark type.
  *
  * Whole pipeline = one `select` of these expressions: codegen'd, no UDFs,
  * no driver-side per-record loop (the reference coerces each record in an
  * interpreted Python loop, `sinks.py:165-166`).
  *
  * Deliberate divergences from the reference (documented, SURVEY.md §7.4):
  *   - Coercion targets the SCHEMA-resolved type (boolean>string>first
  *     priority), not `parse_record_value`'s first-element rule, so column
  *     type and value type always agree — this fixes reference BUG-3 where
  *     `["number","string"]` resolved to a string column but float values,
  *     crashing the writer (`sinks.py:56-65` vs `80-81`).
  *   - A JSON boolean under a string-typed property renders as JSON spelling
  *     `"true"`/`"false"`, not Python's `str(True) == "True"`.
  *   - Nested values serialize via Jackson (compact JSON) rather than
  *     Python's `json.dumps` (spaced separators) — parse-equal, not
  *     byte-equal.
  */
object Coercions {

  /** E2 (`sinks.py:87-88`): empty string under a non-string type → null. */
  def emptyToNull(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** E1 dispatcher: raw text column → schema-typed column, aliased to the
    * property name.
    *
    *   - E3 number: cast to double ("3.14" → 3.14)
    *   - E4 integer: cast to long ("42" → 42)
    *   - E5/E8 date-time: `try_to_timestamp` — malformed input becomes null,
    *     the record survives (DatetimeErrorTreatmentEnum.NULL,
    *     `sinks.py:141-143`)
    *   - E6 string: passthrough (already text)
    *   - E7 nested: passthrough (already raw JSON text)
    *   - boolean: cast ("true"/"false" → true/false; the reference has no
    *     boolean branch and relies on Arrow accepting native bools)
    *   - null type: always-null column
    */
  def coerce(raw: Column, p: ResolvedProperty): Column = {
    val c = if (p.typeId != "string") emptyToNull(raw) else raw
    val out = p.sparkType match {
      // physical string, not VOID: parquet rejects NullType columns, and
      // the reference's pa.null() column is likewise only representable
      // as an all-null typed column on the Spark side
      case NullType      => lit(null).cast(StringType)
      case DoubleType    => numberCast(c)
      case LongType      => integerCast(c)
      case BooleanType   => c.cast(BooleanType)
      case TimestampType => try_to_timestamp(c)
      case _             => c
    }
    out.as(p.name)
  }

  /** E3 with Python `float()` fidelity under ANSI: booleans map to
    * 1.0 / 0.0 first (`float(True) == 1.0` — mirrors [[integerCast]]'s
    * boolean branch; a bare double cast would throw CAST_INVALID_INPUT on
    * the JSON literal text), everything else casts, with garbage still
    * raising like the reference's `float("abc")`.
    */
  def numberCast(c: Column): Column =
    when(c === lit("true"), lit(1.0d))
      .when(c === lit("false"), lit(0.0d))
      .otherwise(c.cast(DoubleType))

  /** E4 with Python `int()` fidelity under ANSI: exact long text casts
    * directly; booleans map to 0/1 (`int(True) == 1` — Python bool IS an
    * int); decimal text truncates toward zero (`int(3.9) == 3`); anything
    * else still raises, like the reference's `int("abc")`
    * (`sinks.py:93-94`). The exact-long branch comes first so 19-digit ids
    * never round-trip through a double.
    */
  def integerCast(c: Column): Column =
    when(c.isNull, lit(null).cast(LongType))
      .when(c === lit("true"), lit(1L))
      .when(c === lit("false"), lit(0L))
      // integer text wider than 64 bits throws CAST_OVERFLOW under ANSI —
      // deliberate parity: the reference parses Python bignums fine but
      // dies identically at the parquet write (pyarrow int64 conversion
      // raises OverflowError, writers.py:44-50), so both engines fail the
      // job loudly rather than silently truncating an oversized id
      .when(c.rlike("^[+-]?[0-9]+$"), c.cast(LongType))
      .otherwise(c.cast(DoubleType).cast(LongType))
}
