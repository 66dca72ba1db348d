package graft.plans

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Runs every native expression under `spark.sql.codegen.fallback=false` +
  * `factoryMode=CODEGEN_ONLY`, so a Janino compile failure in any
  * `doGenCode` FAILS the suite instead of silently falling back to
  * interpreted execution (the BENCH_r04 RollHash regression: tests stayed
  * green while every production stage containing the expression quietly
  * lost codegen). Results are cross-checked against a fully-interpreted
  * session (`NO_CODEGEN`, whole-stage off) to pin eval == codegen.
  */
class CodegenOnlySpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {

  private lazy val strict: SparkSession = {
    val s = TestSpark.init().newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  private lazy val interpreted: SparkSession = {
    val s = TestSpark.init().newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s
  }

  private val texts = Seq(
    "", "a", "hello world tokens here", "Hello,  World!  42x",
    "café crème brûlée", "€ 100 世界 漢字", "emoji 😀 mixed 😈 tail",
    "x" * 4096)

  private def textDf(s: SparkSession): DataFrame = {
    import s.implicits._
    texts.toDF("s")
  }

  private def vecDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (Array(1L, -2L, 3L, 4L), Array(5L, 6L, -7L, 8L)),
      (Array(0L, 0L, 0L, 0L), Array(1L, 1L, 1L, 1L)),
      (Array(1000L, 2000L, -3000L, 123L), Array(-1L, 2L, -3L, 4L)))
      .toDF("a", "b")
  }

  private def check(query: SparkSession => DataFrame): Unit = {
    val got = query(strict).collect().map(_.toSeq)
    val want = query(interpreted).collect().map(_.toSeq)
    got should contain theSameElementsInOrderAs want
  }

  test("graft_roll_hash compiles and matches interpreted eval") {
    check(s => textDf(s).select(call_function("graft_roll_hash", col("s"))))
  }

  test("graft_char_entropy compiles and matches interpreted eval") {
    check(s => textDf(s).select(call_function("graft_char_entropy", col("s"))))
  }

  test("graft_token_count (both modes) compiles and matches interpreted eval") {
    check(s => textDf(s).select(
      call_function("graft_token_count", col("s"), lit("bpe")),
      call_function("graft_token_count", col("s"), lit("punct"))))
  }

  test("graft_simhash compiles and matches interpreted eval") {
    check(s => textDf(s).select(
      call_function("graft_simhash",
        transform(split(col("s"), " "), t => xxhash64(t)))))
  }

  test("graft_minhash compiles and matches interpreted eval") {
    check(s => textDf(s).select(
      call_function("graft_minhash",
        transform(split(col("s"), " "), t => xxhash64(t)), lit(16))))
  }

  test("graft_qdot compiles and matches interpreted eval") {
    check(s => vecDf(s).select(
      call_function("graft_qdot", col("a"), col("b")),
      call_function("graft_qdot", col("a"), col("a"))))
  }

  test("graft_rhp_sig compiles and matches interpreted eval") {
    check(s => vecDf(s).select(
      call_function("graft_rhp_sig",
        transform(col("a"), x => x.cast("double") / 100.0), lit(16))))
  }

  test("graft_unicode_normalize compiles and matches interpreted eval") {
    // decomposed forms added explicitly: the shared texts are composed
    val probes = Seq("café résumé", "ﬁle",
      "Å ring", "ascii only")
    for (form <- Seq("NFC", "NFKC", "NFD")) {
      check { s =>
        import s.implicits._
        (texts ++ probes).toDF("s")
          .select(call_function("graft_unicode_normalize", col("s"), lit(form)))
      }
    }
  }

  test("roll hash clamps truncated UTF-8 instead of crashing") {
    // A lead byte promising continuation bytes that are not there —
    // reachable via binary->string casts on malformed input.
    check { s =>
      import s.implicits._
      Seq(Array('a'.toByte, 0xE2.toByte), Array(0xF0.toByte))
        .toDF("b")
        .select(call_function("graft_roll_hash", col("b").cast("string")))
    }
  }
}
