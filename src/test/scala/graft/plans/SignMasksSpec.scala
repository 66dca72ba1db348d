package graft.plans

import graft.TestSpark
import graft.ops.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SignMasksSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("native masks equal the portable HOF form bit for bit " +
    "(md5 h28 + seeded mix parity, several dims)") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(100) { i =>
      Seq.fill(1 + rnd.nextInt(20))(
        rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString) ++
        (if (i % 5 == 0) Seq("tök-ünïcode", "") else Nil)
    }.toDF("toks")
    for (dim <- Seq(1, 16, 62)) {
      val native = docs
        .select(Retrieval.tokenSignMasks($"toks", dim, native = true))
        .collect().map(_.getSeq[Long](0))
      val hof = docs
        .select(Retrieval.tokenSignMasks($"toks", dim, native = false))
        .collect().map(_.getSeq[Long](0))
      native.toSeq shouldBe hof.toSeq
    }
  }

  test("null contract matches the HOF form: null array → null, " +
    "null element → mask 0") {
    val docs = Seq(
      (1L, Some(Seq(Some("a"), None, Some("b")))),
      (2L, None: Option[Seq[Option[String]]])
    ).toDF("id", "toks")
    val native = docs.orderBy("id")
      .select(Retrieval.tokenSignMasks($"toks", 16, native = true))
      .collect()
    val hof = docs.orderBy("id")
      .select(Retrieval.tokenSignMasks($"toks", 16, native = false))
      .collect()
    native(1).isNullAt(0) shouldBe true
    hof(1).isNullAt(0) shouldBe true
    native(0).getSeq[Long](0) shouldBe hof(0).getSeq[Long](0)
    native(0).getSeq[Long](0)(1) shouldBe 0L
  }

  test("registered via extensions; dim must be a literal") {
    spark.sql("SELECT graft_sign_masks(array('x'), 16) AS m")
      .head.getSeq[Long](0).length shouldBe 1
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sign_masks(array('x'))")
    }
    e.getMessage should include(
      "graft_sign_masks requires exactly 2 argument(s), got 1")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("toks"))
      .select(call_function("graft_sign_masks", col("toks"), lit(16)).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_sign_masks")
  }
}
