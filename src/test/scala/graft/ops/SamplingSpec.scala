package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SamplingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("curriculum stages: quartiles per group by descending score") {
    val df = (1 to 8).map(i => (i.toLong, "en", (100 - i) * 1000L)) ++
      Seq((9L, "fr", 5L), (10L, "fr", 3L))
    val out = Sampling.curriculumStages(
      df.toDF("doc_id", "lang", "score_micro"),
      stages = 4, scoreCol = "score_micro", groupCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // en: ids 1..8 have strictly descending scores -> 2 per quartile
    out(1L) shouldBe 1L; out(2L) shouldBe 1L
    out(3L) shouldBe 2L; out(4L) shouldBe 2L
    out(7L) shouldBe 4L; out(8L) shouldBe 4L
    // fr: only 2 docs -> first (higher score) lands stage 1, other stage 2
    out(9L) shouldBe 1L
    out(10L) shouldBe 2L
  }
}
