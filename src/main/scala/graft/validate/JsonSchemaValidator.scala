package graft.validate

import org.json4s._

import java.util.regex.Pattern

/** Row-level draft-7 validator for the keyword set OUTSIDE the
  * SQL-expressible subset that [[Validator]] compiles to Catalyst
  * predicates.
  *
  * The reference assembles the FULL draft-7 keyword table
  * (`target_parquet/validator.py:51-89`): `$ref, additionalItems/Properties,
  * allOf, anyOf, const, contains, dependencies, enum, if/then/else, items,
  * max/minItems, max/minLength, max/minProperties, maximum/minimum,
  * multipleOf, not, oneOf, pattern, patternProperties, properties,
  * propertyNames, required, type, uniqueItems` — with two house rules kept
  * here for parity:
  *
  *   - numeric draft-4-style `exclusiveMaximum`/`exclusiveMinimum`
  *     (`validator.py:23-48`): fail on `>=` / `<=`;
  *   - float `multipleOf` is vacuous (`validator.py:8-20` compares a value
  *     to itself — it can never fail); integer divisors use exact modulo.
  *
  * The schema compiles ONCE on the driver into a serializable tree of
  * case-class checks; executors evaluate it per parsed record with zero
  * reflection or re-parsing of the schema. This is the deliberate
  * mapPartitions-class seam SURVEY.md §2.5 prescribes ("keep a row-level
  * Scala validator for the rest") — tree-shaped keywords (`oneOf` over
  * object shapes, `uniqueItems` on arrays of objects, `$ref` recursion)
  * have no honest Column encoding, and validation is not the scan hot path.
  *
  * Violations are returned ALL-at-once as `"path: keyword"` labels (path in
  * `$.a.b[3]` form). Deterministic: label set depends only on the value, so
  * `min()` of the set is engine-replayable (the DuckDB oracle of the
  * declared query recomputes the same labels).
  */
object JsonSchemaValidator {

  /** A compiled, serializable draft-7 check. */
  sealed trait Check extends Serializable {
    /** All violations of `v` at `path` ("$" for the root). */
    def apply(v: JValue, path: String): List[String]
  }

  /** Compile a schema (object or boolean form) against itself as $ref root. */
  def compile(schema: JValue): Check = compile(schema, schema)

  private def compile(schema: JValue, root: JValue): Check = schema match {
    case JBool(true)  => Pass
    case JBool(false) => Fail
    case o: JObject   => buildObject(o, root)
    case _            => Pass
  }

  // ── structural equality (enum / const / uniqueItems) ──────────────────
  // JSON equality is key-order-insensitive and 1 == 1.0; normalize before
  // comparing: numbers → BigDecimal, object fields sorted, recursively.
  private[validate] def norm(v: JValue): JValue = v match {
    case JInt(i)         => JDecimal(BigDecimal(i))
    case JLong(l)        => JDecimal(BigDecimal(l))
    case JDouble(d)      => JDecimal(BigDecimal(d))
    case JDecimal(d)     => JDecimal(d)
    case JArray(vs)      => JArray(vs.map(norm))
    case JObject(fields) => JObject(fields.map { case (k, fv) => k -> norm(fv) }.sortBy(_._1))
    case other           => other
  }

  private def asNumber(v: JValue): Option[BigDecimal] = v match {
    case JInt(i)     => Some(BigDecimal(i))
    case JLong(l)    => Some(BigDecimal(l))
    case JDouble(d)  => Some(BigDecimal(d))
    case JDecimal(d) => Some(d)
    case _           => None
  }

  // ── leaf checks ───────────────────────────────────────────────────────

  case object Pass extends Check {
    def apply(v: JValue, path: String): List[String] = Nil
  }

  /** `false` schema: everything fails. */
  case object Fail extends Check {
    def apply(v: JValue, path: String): List[String] = List(s"$path: false-schema")
  }

  /** `type`: scalar or array form. draft-7: integer ⊇ whole-valued number. */
  final case class TypeCheck(types: Set[String]) extends Check {
    def apply(v: JValue, path: String): List[String] = {
      val ok = types.exists { t =>
        (t, v) match {
          case ("null", JNull)        => true
          case ("boolean", JBool(_))  => true
          case ("string", JString(_)) => true
          case ("object", JObject(_)) => true
          case ("array", JArray(_))   => true
          case ("number", _)          => asNumber(v).isDefined
          case ("integer", _)         => asNumber(v).exists(_.isWhole)
          case _                      => false
        }
      }
      if (ok) Nil else List(s"$path: type")
    }
  }

  final case class EnumCheck(values: List[JValue]) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (values.contains(norm(v))) Nil else List(s"$path: enum")
  }

  final case class ConstCheck(value: JValue) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (norm(v) == value) Nil else List(s"$path: const")
  }

  /** Numeric bounds; draft-4-style numeric exclusives per validator.py. */
  final case class NumberChecks(
      minimum: Option[BigDecimal],
      maximum: Option[BigDecimal],
      exclusiveMinimum: Option[BigDecimal],
      exclusiveMaximum: Option[BigDecimal],
      multipleOfInt: Option[Long]) extends Check {
    def apply(v: JValue, path: String): List[String] = asNumber(v) match {
      case None => Nil // non-numbers never violate numeric keywords
      case Some(n) =>
        val out = List.newBuilder[String]
        minimum.foreach(m => if (n < m) out += s"$path: minimum")
        maximum.foreach(m => if (n > m) out += s"$path: maximum")
        exclusiveMinimum.foreach(m => if (n <= m) out += s"$path: exclusiveMinimum")
        exclusiveMaximum.foreach(m => if (n >= m) out += s"$path: exclusiveMaximum")
        multipleOfInt.foreach(d => if (n % d != 0) out += s"$path: multipleOf")
        out.result()
    }
  }

  /** String length (code points, like Python len on str) + pattern. The
    * compiled `Pattern` is JVM-local (`@transient lazy`): only the regex
    * text ships to executors.
    */
  final case class StringChecks(
      minLength: Option[Long],
      maxLength: Option[Long],
      pattern: Option[String]) extends Check {
    @transient private lazy val compiled: Option[Pattern] = pattern.map(Pattern.compile)
    def apply(v: JValue, path: String): List[String] = v match {
      case JString(s) =>
        val n = s.codePointCount(0, s.length).toLong
        val out = List.newBuilder[String]
        minLength.foreach(m => if (n < m) out += s"$path: minLength")
        maxLength.foreach(m => if (n > m) out += s"$path: maxLength")
        compiled.foreach(p => if (!p.matcher(s).find()) out += s"$path: pattern")
        out.result()
      case _ => Nil
    }
  }

  /** Array keywords: items (schema or tuple+additionalItems), bounds,
    * uniqueItems, contains. `contains` reports at the array, not per
    * element; element checks extend the path with `[i]`.
    */
  final case class ArrayChecks(
      itemsAll: Option[Check],
      itemsTuple: Vector[Check],
      additionalItems: Option[Check],
      minItems: Option[Long],
      maxItems: Option[Long],
      uniqueItems: Boolean,
      contains: Option[Check]) extends Check {
    def apply(v: JValue, path: String): List[String] = v match {
      case JArray(vs) =>
        val out = List.newBuilder[String]
        minItems.foreach(m => if (vs.length < m) out += s"$path: minItems")
        maxItems.foreach(m => if (vs.length > m) out += s"$path: maxItems")
        if (uniqueItems) {
          val normed = vs.map(norm)
          if (normed.distinct.length != normed.length) out += s"$path: uniqueItems"
        }
        itemsAll.foreach(c =>
          vs.zipWithIndex.foreach { case (e, i) => out ++= c(e, s"$path[$i]") })
        if (itemsTuple.nonEmpty) {
          vs.zipWithIndex.foreach { case (e, i) =>
            if (i < itemsTuple.length) out ++= itemsTuple(i)(e, s"$path[$i]")
            else additionalItems.foreach(c => out ++= c(e, s"$path[$i]"))
          }
        }
        contains.foreach { c =>
          if (!vs.zipWithIndex.exists { case (e, i) => c(e, s"$path[$i]").isEmpty })
            out += s"$path: contains"
        }
        out.result()
      case _ => Nil
    }
  }

  /** Object keywords. `required` is the exact draft-7 reading — the key
    * must be PRESENT (a JSON null satisfies it); the Column-layer
    * [[Validator.requiredViolation]] also keys on the `required` list but
    * checks post-parse null (it cannot see raw presence), documented
    * there. `dependencies` supports both the property-list and schema
    * forms. Pattern text compiles lazily per JVM like [[StringChecks]].
    */
  final case class ObjectChecks(
      properties: Map[String, Check],
      patternProperties: Vector[(String, Check)],
      additionalProperties: Option[Check],
      required: Vector[String],
      propertyNames: Option[Check],
      minProperties: Option[Long],
      maxProperties: Option[Long],
      dependencies: Vector[(String, Either[Vector[String], Check])]) extends Check {
    @transient private lazy val patterns: Vector[(Pattern, Check)] =
      patternProperties.map { case (re, c) => Pattern.compile(re) -> c }
    def apply(v: JValue, path: String): List[String] = v match {
      case JObject(fields) =>
        val present = fields.map(_._1).toSet
        val out = List.newBuilder[String]
        minProperties.foreach(m => if (fields.length < m) out += s"$path: minProperties")
        maxProperties.foreach(m => if (fields.length > m) out += s"$path: maxProperties")
        required.foreach(k => if (!present.contains(k)) out += s"$path.$k: required")
        fields.foreach { case (k, fv) =>
          val childPath = s"$path.$k"
          val propC = properties.get(k)
          val patC = patterns.collect { case (p, c) if p.matcher(k).find() => c }
          propC.foreach(c => out ++= c(fv, childPath))
          patC.foreach(c => out ++= c(fv, childPath))
          if (propC.isEmpty && patC.isEmpty)
            additionalProperties.foreach(c => out ++= c(fv, childPath))
          propertyNames.foreach(c =>
            if (c(JString(k), childPath).nonEmpty) out += s"$childPath: propertyNames")
        }
        dependencies.foreach { case (k, dep) =>
          if (present.contains(k)) dep match {
            case Left(requiredKeys) =>
              requiredKeys.foreach(r =>
                if (!present.contains(r)) out += s"$path.$k: dependencies")
            case Right(c) =>
              if (c(v, path).nonEmpty) out += s"$path.$k: dependencies"
          }
        }
        out.result()
      case _ => Nil
    }
  }

  /** Combinators report at their own level — a failing branch's inner
    * labels are not violations of THIS value.
    */
  final case class AllOf(cs: Vector[Check]) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (cs.forall(_(v, path).isEmpty)) Nil else List(s"$path: allOf")
  }
  final case class AnyOf(cs: Vector[Check]) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (cs.exists(_(v, path).isEmpty)) Nil else List(s"$path: anyOf")
  }
  final case class OneOf(cs: Vector[Check]) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (cs.count(_(v, path).isEmpty) == 1) Nil else List(s"$path: oneOf")
  }
  final case class NotCheck(c: Check) extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (c(v, path).isEmpty) List(s"$path: not") else Nil
  }
  final case class IfThenElse(ifC: Check, thenC: Option[Check], elseC: Option[Check])
      extends Check {
    def apply(v: JValue, path: String): List[String] =
      if (ifC(v, path).isEmpty) thenC.map(_(v, path)).getOrElse(Nil)
      else elseC.map(_(v, path)).getOrElse(Nil)
  }

  /** Local `$ref` (`#`, `#/definitions/...`): the pointer resolves and
    * compiles LAZILY per JVM, which is what makes recursive schemas
    * (`{"$ref": "#"}` inside itself) terminate at compile time.
    */
  final case class Ref(root: JValue, pointer: String) extends Check {
    @transient private lazy val resolved: Check = {
      val target =
        if (pointer == "#" || pointer.isEmpty) root
        else if (pointer.startsWith("#/"))
          pointer.drop(2).split("/").foldLeft(root) { (acc, seg0) =>
            val seg = seg0.replace("~1", "/").replace("~0", "~")
            acc match {
              case JObject(fields) => fields.find(_._1 == seg).map(_._2).getOrElse(JNothing)
              case JArray(vs)      => seg.toIntOption.flatMap(vs.lift).getOrElse(JNothing)
              case _               => JNothing
            }
          }
        else JNothing
      target match {
        case JNothing => Fail // unresolvable ref: fail loudly, not silently pass
        case t        => compile(t, root)
      }
    }
    def apply(v: JValue, path: String): List[String] = resolved(v, path)
  }

  /** All checks of one schema object, evaluated in sequence. */
  final case class Group(cs: Vector[Check]) extends Check {
    def apply(v: JValue, path: String): List[String] = cs.toList.flatMap(_(v, path))
  }

  // ── compiler ──────────────────────────────────────────────────────────

  private def buildObject(o: JObject, root: JValue): Check = {
    val kw = o.obj.toMap
    val cs = Vector.newBuilder[Check]

    // draft-7: when $ref is present, siblings are ignored.
    kw.get("$ref") match {
      case Some(JString(p)) => return Ref(root, p)
      case _                => ()
    }

    kw.get("type").foreach {
      case JString(t) => cs += TypeCheck(Set(t))
      case JArray(ts) =>
        val set = ts.collect { case JString(t) => t }.toSet
        if (set.nonEmpty) cs += TypeCheck(set)
      case _ => ()
    }
    kw.get("enum").foreach {
      case JArray(vs) => cs += EnumCheck(vs.map(norm))
      case _          => ()
    }
    kw.get("const").foreach(v => cs += ConstCheck(norm(v)))

    val multipleOfInt = kw.get("multipleOf").flatMap {
      case JInt(i) if i != 0  => Some(i.toLong)
      case JLong(l) if l != 0 => Some(l)
      case _                  => None // float divisor: vacuous (validator.py:8-20)
    }
    val numeric = NumberChecks(
      kw.get("minimum").flatMap(asNumber),
      kw.get("maximum").flatMap(asNumber),
      kw.get("exclusiveMinimum").flatMap(asNumber),
      kw.get("exclusiveMaximum").flatMap(asNumber),
      multipleOfInt)
    if (numeric != NumberChecks(None, None, None, None, None)) cs += numeric

    def asLong(v: JValue): Option[Long] = v match {
      case JInt(i)  => Some(i.toLong)
      case JLong(l) => Some(l)
      case _        => None
    }
    val strings = StringChecks(
      kw.get("minLength").flatMap(asLong),
      kw.get("maxLength").flatMap(asLong),
      kw.get("pattern").collect { case JString(re) => re })
    if (strings != StringChecks(None, None, None)) cs += strings

    val (itemsAll, itemsTuple) = kw.get("items") match {
      case Some(JArray(ts)) => (None, ts.map(compile(_, root)).toVector)
      case Some(s)          => (Some(compile(s, root)), Vector.empty[Check])
      case None             => (None, Vector.empty[Check])
    }
    val arrays = ArrayChecks(
      itemsAll,
      itemsTuple,
      kw.get("additionalItems").map(compile(_, root)),
      kw.get("minItems").flatMap(asLong),
      kw.get("maxItems").flatMap(asLong),
      kw.get("uniqueItems").contains(JBool(true)),
      kw.get("contains").map(compile(_, root)))
    if (arrays != ArrayChecks(None, Vector.empty, None, None, None, uniqueItems = false, None))
      cs += arrays

    val objects = ObjectChecks(
      kw.get("properties") match {
        case Some(JObject(fields)) =>
          fields.map { case (k, s) => k -> compile(s, root) }.toMap
        case _ => Map.empty
      },
      kw.get("patternProperties") match {
        case Some(JObject(fields)) =>
          fields.map { case (re, s) => re -> compile(s, root) }.toVector
        case _ => Vector.empty
      },
      kw.get("additionalProperties").map(compile(_, root)),
      kw.get("required") match {
        case Some(JArray(vs)) => vs.collect { case JString(s) => s }.toVector
        case _                => Vector.empty
      },
      kw.get("propertyNames").map(compile(_, root)),
      kw.get("minProperties").flatMap(asLong),
      kw.get("maxProperties").flatMap(asLong),
      kw.get("dependencies") match {
        case Some(JObject(fields)) =>
          fields.map {
            case (k, JArray(vs)) =>
              k -> Left(vs.collect { case JString(s) => s }.toVector)
            case (k, s) => k -> Right(compile(s, root))
          }.toVector
        case _ => Vector.empty
      })
    if (objects != ObjectChecks(Map.empty, Vector.empty, None, Vector.empty, None, None, None,
        Vector.empty))
      cs += objects

    kw.get("allOf").foreach {
      case JArray(ss) => cs += AllOf(ss.map(compile(_, root)).toVector)
      case _          => ()
    }
    kw.get("anyOf").foreach {
      case JArray(ss) => cs += AnyOf(ss.map(compile(_, root)).toVector)
      case _          => ()
    }
    kw.get("oneOf").foreach {
      case JArray(ss) => cs += OneOf(ss.map(compile(_, root)).toVector)
      case _          => ()
    }
    kw.get("not").foreach(s => cs += NotCheck(compile(s, root)))
    kw.get("if").foreach { ifS =>
      cs += IfThenElse(
        compile(ifS, root),
        kw.get("then").map(compile(_, root)),
        kw.get("else").map(compile(_, root)))
    }

    val all = cs.result()
    if (all.isEmpty) Pass else if (all.length == 1) all.head else Group(all)
  }
}
