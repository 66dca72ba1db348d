package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LongDotProductSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("registered via extensions and callable from SQL") {
    spark.sql("SELECT graft_qdot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head.getLong(0) shouldBe 32L
  }

  test("matches the interpreted higher-order fold on random data") {
    val df = Seq.tabulate(100) { i =>
      (Seq.tabulate(64)(j => ((i * 31 + j * 7) % 2001 - 1000).toLong),
        Seq.tabulate(64)(j => ((i * 17 + j * 13) % 2001 - 1000).toLong))
    }.toDF("a", "b")
    val native = df.select(call_function("graft_qdot", $"a", $"b")).collect().map(_.getLong(0))
    val folded = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .collect().map(_.getLong(0))
    native.toSeq shouldBe folded.toSeq
  }

  test("null array propagates; mismatched length takes common prefix") {
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    df.select(call_function("graft_qdot", $"a", $"b")).head.isNullAt(0) shouldBe true
    spark.sql("SELECT graft_qdot(array(1L, 2L, 3L), array(10L)) AS d")
      .head.getLong(0) shouldBe 10L
  }

  test("wrong arity raises a descriptive error, not IndexOutOfBounds") {
    val e = intercept[Exception] { spark.sql("SELECT graft_qdot(array(1L))") }
    e.getMessage should include("graft_qdot requires exactly 2 argument(s), got 1")
    val e2 = intercept[Exception] { spark.sql("SELECT graft_rhp_sig(array(1.0))") }
    e2.getMessage should include("graft_rhp_sig requires exactly 2 argument(s), got 1")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(transform(sequence(lit(0L), lit(9L)), x => x + col("id")).as("v"))
      .select(call_function("graft_qdot", col("v"), col("v")).as("d"))
    // the starred node prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_qdot")
  }
}
