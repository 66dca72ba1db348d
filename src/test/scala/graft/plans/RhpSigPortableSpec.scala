package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RhpSigPortableSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val planes = 32
  private val dim = 8

  // the folded-literal HOF form the native expression replaces
  private def hofSig = {
    val signs: Seq[Seq[Long]] = (0 until planes).map { p =>
      (0 until dim).map { j =>
        if (graft.functions.PortableHash.h28Local(s"$p,$j") % 2 == 0) 1L
        else -1L
      }
    }
    val mat = typedlit(signs)
    transform(
      sequence(lit(0), lit(planes - 1)),
      p => {
        val dot = aggregate(
          zip_with($"qv", element_at(mat, p.cast("int") + 1), (x, s) => x * s),
          lit(0L),
          (acc, x) => acc + x)
        when(dot >= 0, lit(1L)).otherwise(lit(0L))
      })
  }

  test("native signature equals the folded-literal HOF form on random " +
    "quantized vectors") {
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(200)(_ =>
      Seq.fill(dim)((rnd.nextInt(20001) - 10000).toLong)).toDF("qv")
    val native = df
      .select(call_function("graft_rhp_sig_portable", $"qv",
        lit(planes), lit(dim)))
      .collect().map(_.getSeq[Long](0))
    val hof = df.select(hofSig).collect().map(_.getSeq[Long](0))
    native.toSeq shouldBe hof.toSeq
  }

  test("null vector and length mismatch both → all-zero bits, exactly " +
    "like the HOF form (its outer transform runs over a constant " +
    "sequence, so nulls poison only the dot)") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L))), // shorter than dim
      (2L, None: Option[Seq[Long]])
    ).toDF("id", "qv")
    val rows = df.orderBy("id")
      .select(call_function("graft_rhp_sig_portable", $"qv",
        lit(planes), lit(dim)))
      .collect()
    val hof = df.orderBy("id").select(hofSig).collect()
    for (i <- 0 to 1) {
      rows(i).getSeq[Long](0) shouldBe Seq.fill(planes)(0L)
      hof(i).getSeq[Long](0) shouldBe Seq.fill(planes)(0L)
    }
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(transform(sequence(lit(1L), lit(dim.toLong)),
        x => x * col("id")).as("qv"))
      .select(call_function("graft_rhp_sig_portable", col("qv"),
        lit(planes), lit(dim)).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_rhp_sig_portable")
  }
}
