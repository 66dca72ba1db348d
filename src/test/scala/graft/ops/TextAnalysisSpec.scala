package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq((1L, "hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head
    r.getAs[Long]("n_ws_tokens") shouldBe 4L
    // hello | world | , | 42 | times | !
    r.getAs[Long]("n_bpe_tokens") shouldBe 6L
    r.getAs[Long]("n_chars") shouldBe 22L
  }

  test("quality score ratios") {
    val df = Seq((1L, "the the the the")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df).head
    r.getAs[Long]("n_tokens") shouldBe 4L
    r.getAs[Double]("uniq_ratio") shouldBe 0.25
    r.getAs[Double]("stopword_ratio") shouldBe 1.0
    r.getAs[Double]("punct_ratio") shouldBe 0.0
  }

  test("language id picks the dominant marker language") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "le chat et la maison et les chiens"),
      (4L, "el gato y los perros y las casas"),
      (5L, "no markers here whatsoever")
    ).toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("?"))
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out shouldBe Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh")
  }

  test("corpus stats aggregate exactly from integer sums") {
    val df = Seq(
      (1L, "a b c", "en"), (2L, "d e", "en"), (3L, "x", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.corpusStats(df).orderBy("lang").collect()
    out(0).getAs[Long]("n_docs") shouldBe 2L
    out(0).getAs[Long]("total_tokens") shouldBe 5L
    out(0).getAs[Double]("avg_chars") shouldBe 4.0 // (5 + 3) / 2
    out(1).getAs[Long]("max_tokens") shouldBe 1L
  }

  test("fingerprints: md5 matches normalization; rolling hash is stable and order-sensitive") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "world hello")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe out(2L) // case+whitespace normalization
    out(2L)._1 should not be out(3L)._1
    out(2L)._2 should not be out(3L)._2 // rolling hash sees order
  }
}
