package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RollHashSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val fallback =
    expr("aggregate(split(s, ''), 0L, (h, c) -> (h * 31 + ascii(c)) % 1000000007)")

  test("native rolling hash equals the HOF fallback, including multi-byte input") {
    val inputs = Seq(
      "", "a", "hello world", "Hello  World",
      "café crème",          // 2-byte UTF-8
      "€ 100 世界",       // 3-byte UTF-8 (euro, CJK)
      "emoji 😀 tail",       // 4-byte UTF-8 (astral)
      "x" * 5000)                       // long run: accumulator bound
    val df = inputs.toDF("s")
    val rows = df.select(
      col("s"),
      call_function("graft_roll_hash", col("s")).as("native"),
      fallback.as("hof")).collect()
    rows.foreach { r =>
      withClue(s"input=${r.getString(0).take(30)}: ") {
        r.getLong(1) shouldBe r.getLong(2)
      }
    }
  }

  test("order-sensitive and stable") {
    val out = Seq("ab", "ba", "ab").toDF("s")
      .select(call_function("graft_roll_hash", col("s"))).collect().map(_.getLong(0))
    out(0) should not be out(1)
    out(0) shouldBe out(2)
  }
}
