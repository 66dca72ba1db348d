package graft.plans

import graft.TestSpark
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TokenCountSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val tricky = Seq(
    "hello world",
    "abc123def",           // letter/digit run boundaries
    "a_b-c.d",             // symbols split runs
    "  leading   internal  ", // whitespace runs
    "tab\tnewline\ncr\r",
    "",                    // empty
    "café naïve",   // 2-byte UTF-8 inside words
    "你好世界", // CJK: one token per code point
    "emoji 😀😀 end", // 4-byte code points
    "price: $9.99 (50% off!)",
    "...!!!???")

  test("native bpe/punct counts equal the regex fallback on tricky inputs") {
    val df = tricky.toDF("text")
    val out = df.select(
      TextAnalysis.bpeTokenCount(col("text"), native = true).as("nb"),
      TextAnalysis.bpeTokenCount(col("text"), native = false).as("rb"),
      TextAnalysis.punctCount(col("text"), native = true).as("np"),
      TextAnalysis.punctCount(col("text"), native = false).as("rp")).collect()
    out.zip(tricky).foreach { case (r, t) =>
      withClue(s"input '$t': ") {
        r.getLong(0) shouldBe r.getLong(1)
        r.getLong(2) shouldBe r.getLong(3)
      }
    }
  }

  test("null text propagates null") {
    val df = Seq(Option.empty[String]).toDF("text")
    df.select(TextAnalysis.bpeTokenCount(col("text"), native = true))
      .head.isNullAt(0) shouldBe true
  }

  test("callable from SQL; bad mode is rejected") {
    spark.sql("SELECT graft_token_count('ab 12 +', 'bpe') AS n").head.getLong(0) shouldBe 3L
    spark.sql("SELECT graft_token_count('ab 12 +', 'punct') AS n").head.getLong(0) shouldBe 1L
    val e = intercept[Exception] { spark.sql("SELECT graft_token_count('x', 'words')") }
    e.getMessage should include("mode must be 'bpe' or 'punct'")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(concat(lit("doc "), col("id").cast("string")).as("t"))
      .select(call_function("graft_token_count", col("t"), lit("bpe")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_token_count")
  }
}
