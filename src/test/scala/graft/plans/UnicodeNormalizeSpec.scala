package graft.plans

import java.text.Normalizer

import graft.TestSpark
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class UnicodeNormalizeSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val composed = "caf\u00e9 r\u00e9sum\u00e9"   // U+00E9
  private val decomposed = "cafe\u0301 re\u0301sume\u0301" // e + U+0301

  test("NFC maps decomposed onto composed; ASCII is zero-copy identity") {
    val df = Seq(
      ("ascii only", "ascii only"),
      (composed, composed),
      (decomposed, composed),
      // NFKC-only differences survive NFC: the ligature ﬁ stays
      ("\ufb01le","\ufb01le")
    ).toDF("in", "want")
    val out = df.select(
      TextAnalysis.normalizeUnicode(col("in")).as("got"), col("want"))
      .collect()
    out.foreach(r => r.getString(0) shouldBe r.getString(1))
  }

  test("NFKC folds compatibility forms; null propagates; forms validated") {
    val got = Seq("\ufb01le").toDF("in")
      .select(TextAnalysis.normalizeUnicode(col("in"), "NFKC"))
      .head().getString(0)
    got shouldBe "file"
    Seq(null.asInstanceOf[String]).toDF("in")
      .select(TextAnalysis.normalizeUnicode(col("in"))).head().isNullAt(0) shouldBe true
    an[Exception] should be thrownBy
      Seq("x").toDF("in")
        .select(TextAnalysis.normalizeUnicode(col("in"), "NFX")).collect()
  }

  test("kernel agrees with java.text.Normalizer on mixed content and " +
    "returns the input reference on the ASCII fast path") {
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("", "plain ascii", composed, decomposed,
      "mixed ascii cafe\u0301 tail", "ÅÅ", // Å vs Angstrom sign
      "😀 emoji")
    for (s <- samples; f <- Seq(Normalizer.Form.NFC, Normalizer.Form.NFKC)) {
      val in = UTF8String.fromString(s)
      UnicodeNormalize.normalize(in, f).toString shouldBe
        Normalizer.normalize(s, f)
    }
    val ascii = UTF8String.fromString("just ascii")
    // eq: the fast path must not copy
    (UnicodeNormalize.normalize(ascii, Normalizer.Form.NFC) eq ascii) shouldBe true
  }

  test("normalized digests unify cross-form duplicates (the dedup key rule)") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val ks = df.select(md5(TextAnalysis.normalizeUnicode(col("t"))))
      .collect().map(_.getString(0))
    ks(0) shouldBe ks(1)
    // raw digests differ — the bug this expression exists to fix
    val raw = df.select(md5(col("t"))).collect().map(_.getString(0))
    raw(0) should not be raw(1)
  }
}
