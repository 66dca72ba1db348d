package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SamplingSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("shuffleOrder stamps a deterministic permutation of 1..N") {
    val df = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val out = Sampling.shuffleOrder(df, "doc_id", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    out.values.toSeq.sorted shouldBe (1L to 200L)
    // keyed, not random: a second run is the identical permutation
    val again = Sampling.shuffleOrder(df, "doc_id", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    again shouldBe out
    // hash order, not key order: the permutation is not the identity
    out.count { case (k, v) => k == v } should be < 20
  }

  test("shuffleOrder realizes the (bucket, hash, key) total order") {
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Sampling.shuffleOrder(df, "doc_id", buckets = 4)
      .orderBy("shuffle_pos").select("doc_id").as[Long].collect().toSeq
    val expected = df
      .withColumn("h", graft.functions.PortableHash.h28(
        concat(lit(Sampling.ShuffleSalt), col("doc_id").cast("string"))))
      .orderBy(pmod(col("h"), lit(4L)), col("h"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    got shouldBe expected
  }

  test("shuffleOrder stamps NULL-keyed rows instead of dropping them") {
    val df = (Seq[java.lang.Long](null, null) ++ (1L to 48L).map(Long.box))
      .map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.shuffleOrder(df, "doc_id", buckets = 8).collect()
    out.length shouldBe 50 // the contract: EVERY row gets a position
    out.map(_.getAs[Long]("shuffle_pos")).sorted shouldBe (1L to 50L)
  }

  test("curriculum stages: quartiles per group by descending score") {
    val df = (1 to 8).map(i => (i.toLong, "en", (100 - i) * 1000L)) ++
      Seq((9L, "fr", 5L), (10L, "fr", 3L))
    val out = Sampling.curriculumStages(
      df.toDF("doc_id", "lang", "score_micro"),
      stages = 4, scoreCol = "score_micro", groupCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // en: ids 1..8 have strictly descending scores -> 2 per quartile
    out(1L) shouldBe 1L; out(2L) shouldBe 1L
    out(3L) shouldBe 2L; out(4L) shouldBe 2L
    out(7L) shouldBe 4L; out(8L) shouldBe 4L
    // fr: only 2 docs -> first (higher score) lands stage 1, other stage 2
    out(9L) shouldBe 1L
    out(10L) shouldBe 2L
  }

  test("weightedSample: deterministic, k rows, heavy rows overrepresented") {
    import spark.implicits._
    // weight 1000 vs 1: ln(u)/1000 is ~1000x closer to zero, so heavy
    // keys should dominate the top-k
    val df = (1L to 400L).map(i => (i, if (i <= 200) 1000L else 1L))
      .toDF("k", "w")
    val got = Sampling.weightedSample(df, "k", "w", k = 50)
      .select("k").as[Long].collect()
    got.length shouldBe 50
    got.count(_ <= 200L) should be >= 45
    val again = Sampling.weightedSample(df, "k", "w", k = 50)
      .select("k").as[Long].collect()
    again.toSeq shouldBe got.toSeq
  }

  test("weightedSample drops non-positive weights instead of letting them dominate") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, -5L), (3L, 0L), (4L, 10L)).toDF("k", "w")
    val got = Sampling.weightedSample(df, "k", "w", k = 4)
      .select("k").as[Long].collect().sorted
    got.toSeq shouldBe Seq(1L, 4L)
  }

  test("weightedSampleStratified: native graft_top_k ≡ rank-window " +
    "twin row-for-row; per-stratum k; non-positive weights dropped") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (i, (i % 13) + 1L, Seq("en", "de", "fr")((i % 3).toInt)))
      .toDF("k", "w", "lang")
    def draw(native: Boolean) =
      Sampling.weightedSampleStratified(df, "k", "w", "lang", k = 10,
        native = native)
        .orderBy("stratum", "rank").collect().map(_.toSeq).toSeq
    val nat = draw(native = true)
    nat shouldBe draw(native = false)
    nat.groupBy(_.head).values.foreach(_.size shouldBe 10)
    nat.map(_(1)).grouped(10).foreach(_ shouldBe (1L to 10L))
    val dirty = Seq((1L, 10L, "en"), (2L, -1L, "en"), (3L, 0L, "en"))
      .toDF("k", "w", "lang")
    Sampling.weightedSampleStratified(dirty, "k", "w", "lang", k = 5)
      .select("key").as[String].collect().toSeq shouldBe Seq("1")
  }

  test("weightedSampleStratified's native heap partial-aggregates " +
    "BEFORE the exchange — per-partition ≤ k entries per stratum " +
    "cross, not every row") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 5L, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "w", "lang")
    val out = Sampling.weightedSampleStratified(
      df, "k", "w", "lang", k = 3, native = true)
    out.collect()
    out.queryExecution.executedPlan.toString should
      include("partial_graft_top_k")
  }
}
