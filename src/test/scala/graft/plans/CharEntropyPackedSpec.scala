package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CharEntropyPackedSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  /** The Column fallback from TextAnalysis.charEntropy, inlined so this
    * spec pins native == fallback independent of the dispatch.
    */
  private val fallback = {
    import graft.functions.ColumnOps
    import org.apache.spark.sql.{functions => F}
    ColumnOps.bind(split(col("s"), "")) { chars =>
      ColumnOps.bind(array_sort(array_distinct(chars))) { uniq =>
        shiftleft(F.size(uniq).cast("long"), 20).bitwiseOR(
          round(aggregate(uniq, lit(0.0d), (acc, c) =>
            acc - ColumnOps.bind(
              F.size(F.filter(chars, x => x === c)).cast("double") /
                F.size(chars).cast("double")) { p => p * log2(p) })
            * 1000d, 0).cast("long"))
      }
    }
  }

  test("native packed entropy equals the Column fallback, incl. multi-byte") {
    val inputs = Seq(
      "a", "aaaa", "ab", "abcd", "aab",
      "hello world tokens here and more tokens",
      "café crème brûlée",     // 2-byte UTF-8
      "€ 100 世界 漢字",        // 3-byte UTF-8
      "emoji 😀 mixed 😈 tail", // 4-byte (astral; split('') is code-point aware)
      "QWxhZGRpbjpvcGVuIHNlc2FtZQ==",   // base64ish
      "x" * 4096,
      (0 until 512).map(i => ('a' + i % 26).toChar).mkString)
    val rows = inputs.toDF("s").select(
      col("s"),
      call_function("graft_char_entropy", col("s")).as("native"),
      fallback.as("col")).collect()
    rows.foreach { r =>
      withClue(s"input=${r.getString(0).take(30)}: ") {
        r.getLong(1) shouldBe r.getLong(2)
      }
    }
  }

  test("native equals fallback across the sf0.001 document corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bad = docs.select(col("text").as("s"))
      .select(call_function("graft_char_entropy", col("s")).as("native"),
        fallback.as("cf"))
      .filter(col("native") =!= col("cf"))
    bad.count() shouldBe 0L
  }

  test("packed fields decode to known entropies") {
    val out = Seq("aaaa", "ab", "abcd").toDF("s")
      .select(call_function("graft_char_entropy", col("s")).as("pk"))
      .select(shiftright(col("pk"), 20).as("u"),
        col("pk").bitwiseAND(lit((1L << 20) - 1L)).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.toSeq shouldBe Seq((1L, 0L), (2L, 1000L), (4L, 2000L))
  }
}
