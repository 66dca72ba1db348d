package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MaxSimScoreSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val dim = 16

  // the interpreted higher-order form graft_maxsim replaces — the
  // serving fallback path, and the equality oracle here
  private def hofScore = {
    aggregate($"q", lit(0L), (acc, t) =>
      acc + lit(dim.toLong) - lit(2L) *
        array_min(transform($"c", s =>
          bit_count(t.bitwiseXOR(s)).cast("long"))))
  }

  test("registered via extensions and callable from SQL") {
    // q = [0b1111], c = [[0b1111, 0b0000]]: best hamming 0 → 16 − 0
    spark.sql(
      "SELECT graft_maxsim(array(15L), array(15L, 0L), 16) AS s")
      .head.getLong(0) shouldBe 16L
  }

  test("matches the interpreted higher-order form on random masks " +
    "(the exact expression lateInteractionServe's fallback runs)") {
    val rnd = new scala.util.Random(42)
    val df = Seq.tabulate(200) { _ =>
      (Seq.fill(1 + rnd.nextInt(16))(rnd.nextLong() & 0xFFFFL),
        Seq.fill(1 + rnd.nextInt(64))(rnd.nextLong() & 0xFFFFL))
    }.toDF("q", "c")
    val native = df
      .select(call_function("graft_maxsim", $"q", $"c", lit(dim)))
      .collect().map(_.getLong(0))
    val folded = df.select(hofScore).collect().map(_.getLong(0))
    native.toSeq shouldBe folded.toSeq
  }

  test("null/empty contract matches the fold: null→null, empty q→0, " +
    "empty c with tokens→null") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (None, Some(Seq(1L))),
      (Some(Seq.empty[Long]), Some(Seq(1L))),
      (Some(Seq(1L)), Some(Seq.empty[Long]))
    ).toDF("q", "c")
    val native = df
      .select(call_function("graft_maxsim", $"q", $"c", lit(dim)))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val folded = df.select(hofScore)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    native.toSeq shouldBe folded.toSeq
    native.toSeq shouldBe Seq(None, None, Some(0L), None)
  }

  test("wrong arity raises a descriptive error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_maxsim(array(1L), array(1L))")
    }
    e.getMessage should include(
      "graft_maxsim requires exactly 3 argument(s), got 2")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(transform(sequence(lit(0L), lit(9L)), x => x + col("id")).as("v"))
      .select(call_function("graft_maxsim", col("v"), col("v"), lit(dim)).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_maxsim")
  }
}
