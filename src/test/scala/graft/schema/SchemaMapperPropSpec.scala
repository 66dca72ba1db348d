package graft.schema

import org.json4s._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the schema-resolution rules (reference
  * `sinks.py:21-69`): the truth tables in SchemaMapperSpec pin exact cases,
  * these pin the INVARIANTS over arbitrary schema shapes. ScalaCheck `Gen`
  * is driven directly with deterministic seeds (the scalatest-scalacheck
  * bridge isn't on the offline classpath).
  */
class SchemaMapperPropSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {

  private def samples[T](gen: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private val typeIds =
    Gen.oneOf("null", "number", "integer", "boolean", "string", "array", "object")
  private val typeArrays = Gen.nonEmptyListOf(typeIds)
  private val formats = Gen.option(Gen.oneOf("date-time", "email", "uri"))

  private def propJson(types: List[String], format: Option[String]): JObject = {
    val base = JObject("type" -> JArray(types.map(JString(_))))
    format.fold(base)(f => JObject(base.obj :+ ("format" -> JString(f): (String, JValue))))
  }

  private val cases: Seq[(List[String], Option[String])] =
    samples(Gen.zip(typeArrays, formats))

  test("resolve never throws and yields a type from the input set (plus defaults)") {
    cases.foreach { case (types, fmt) =>
      val r = SchemaMapper.resolve("f", propJson(types, fmt))
      withClue(s"types=$types fmt=$fmt: ")(
        (types :+ "null").contains(r.typeId) shouldBe true)
    }
  }

  test("nullability triple: null/array/object in types or date-time format (sinks.py:51)") {
    cases.foreach { case (types, fmt) =>
      val r = SchemaMapper.resolve("f", propJson(types, fmt))
      val expected = types.exists(Set("null", "array", "object")) ||
        fmt.contains("date-time")
      withClue(s"types=$types fmt=$fmt: ")(r.nullable shouldBe expected)
    }
  }

  test("priority chain: boolean > string > first remaining (sinks.py:56-65)") {
    cases.collect { case (types, _) if types.exists(_ != "null") => types }.foreach { types =>
      val r = SchemaMapper.resolve("f", propJson(types, None))
      val stripped =
        if (types.exists(Set("null", "array", "object"))) types.filterNot(_ == "null")
        else types
      val expected =
        if (stripped.sizeIs == 1) stripped.head
        else if (stripped.contains("boolean")) "boolean"
        else if (stripped.contains("string")) "string"
        else stripped.head
      withClue(s"types=$types: ")(r.typeId shouldBe expected)
    }
  }

  test("anyOf always wins over a sibling type (sinks.py:47-48)") {
    samples(Gen.zip(typeIds, typeIds)).foreach { case (inner, outer) =>
      val json = JObject(
        "anyOf" -> JArray(List(JObject("type" -> JString(inner)))),
        "type" -> JString(outer))
      SchemaMapper.resolve("f", json).typeId shouldBe inner
    }
  }

  test("removeNullString strips exactly the nulls, preserving order") {
    samples(Gen.listOf(typeIds)).foreach { types =>
      val out = SchemaMapper.removeNullString(types)
      out should not contain "null"
      out shouldBe types.filterNot(_ == "null")
    }
  }
}
