package graft.plans

import graft.TestSpark
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MinHashBucketsPortableSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("native banded buckets equal the portable HOF form bit for bit " +
    "(md5 h28 + seeded mixes, several band shapes)") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(120) { i =>
      val words = Seq.fill(1 + rnd.nextInt(30))(
        rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val extra = if (i % 7 == 0) " tök ünïcode" else ""
      (i.toLong, words.mkString(" ") + extra)
    }.toDF("doc_id", "text") union
      Seq((1000L, Some("")), (1001L, Some("one")), (1002L, Some("two words")),
        (1003L, None: Option[String])).toDF("doc_id", "text")
    for ((nh, nb, sh) <- Seq((32, 8, 3), (16, 4, 2), (8, 8, 5))) {
      val native = Dedup.minHashBandsPortable(docs, nh, nb, sh, native = true)
        .orderBy("doc_id", "band").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val hof = Dedup.minHashBandsPortable(docs, nh, nb, sh, native = false)
        .orderBy("doc_id", "band").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      native.toSeq shouldBe hof.toSeq
    }
  }

  test("null/empty element contract matches the HOF form on raw arrays: " +
    "null array → \"\" buckets (the outer transform runs over the constant " +
    "band sequence), null elements skipped, all-null/empty array → \"\" buckets") {
    // reach the expression directly (Dedup.shingles never emits these)
    val raw = Seq(
      (1L, Some(Seq(Some("a"), None, Some("b")))),
      (2L, Some(Seq.empty[Option[String]])),
      (3L, Some(Seq(None: Option[String]))),
      (4L, None: Option[Seq[Option[String]]])
    ).toDF("id", "sh")
    import graft.functions.PortableHash._
    val rowsPerBand = 2
    val hofCol = {
      val sig = transform(sequence(lit(0), lit(3)),
        i => array_min(transform(col("sh"), p => mix(h28(p), i))))
      transform(sequence(lit(0), lit(1)),
        b => array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ","))
    }
    val nat = raw.orderBy("id")
      .select(call_function("graft_minhash_buckets", col("sh"), lit(4), lit(2)))
      .collect()
    val hof = raw.orderBy("id").select(hofCol).collect()
    for (i <- 0 until 4) {
      nat(i).isNullAt(0) shouldBe hof(i).isNullAt(0)
      if (!nat(i).isNullAt(0))
        nat(i).getSeq[String](0) shouldBe hof(i).getSeq[String](0)
    }
    nat(3).getSeq[String](0) shouldBe Seq("", "")
    nat(1).getSeq[String](0) shouldBe Seq("", "")
    nat(2).getSeq[String](0) shouldBe Seq("", "")
  }

  test("registered via extensions; params must be int literals and divide") {
    spark.sql("SELECT graft_minhash_buckets(array('x','y'), 8, 4) AS b")
      .head.getSeq[String](0).length shouldBe 4
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_buckets(array('x'), 8)")
    }
    e.getMessage should include(
      "graft_minhash_buckets requires exactly 3 argument(s), got 2")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_buckets(array('x'), 8, 3)").collect()
    }
    e2.getMessage should include("must divide")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("sh"))
      .select(call_function(
        "graft_minhash_buckets", col("sh"), lit(8), lit(4)).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(")
    plan should include("graft_minhash_buckets")
  }
}
