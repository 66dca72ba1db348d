package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val points = Seq(
    (1L, "u1", 100L),
    (2L, "u1", 250L),  // inside both of u1's overlapping intervals
    (3L, "u2", 100L),  // right user, time inside u1's interval only
    (4L, "u1", 999L)   // no containing interval
  ).toDF("point_id", "user", "t")

  private val intervals = Seq(
    ("u1", 50L, 150L, "a"),
    ("u1", 200L, 300L, "b"),
    ("u1", 240L, 260L, "c"), // overlaps b — point 2 matches both
    ("u2", 500L, 600L, "d")
  ).toDF("user", "s", "e", "tag")

  test("point-in-interval with keys: exact containment, overlaps yield both") {
    val out = RangeJoin.pointInRange(points, intervals, "t", "s", "e", Seq("user"),
        bucketSize = 100L)
      .select("point_id", "tag").as[(Long, String)].collect().toSet
    out shouldBe Set((1L, "a"), (2L, "b"), (2L, "c"))
  }

  test("bucket boundaries are inclusive and floor-divided (negative times too)") {
    val p = Seq((1L, -150L), (2L, 0L), (3L, 100L)).toDF("point_id", "t")
    val iv = Seq((-200L, -100L, "neg"), (0L, 0L, "zero"), (1L, 100L, "pos"))
      .toDF("s", "e", "tag")
    val out = RangeJoin.pointInRange(p, iv, "t", "s", "e", Nil, bucketSize = 60L)
      .select("point_id", "tag").as[(Long, String)].collect().toSet
    out shouldBe Set((1L, "neg"), (2L, "zero"), (3L, "pos"))
  }

  test("no duplicate matches when an interval spans many buckets") {
    val p = Seq((1L, 500L)).toDF("point_id", "t")
    val iv = Seq((0L, 1000L, "wide")).toDF("s", "e", "tag")
    RangeJoin.pointInRange(p, iv, "t", "s", "e", Nil, bucketSize = 10L)
      .count() shouldBe 1L
  }

  test("nanosecond-scale epochs bucket exactly (beyond double's 53-bit mantissa)") {
    // regression: (c - pmod(c,b))/b is double division in Spark and
    // rounds ~1e18 values into the wrong bucket, silently dropping
    // matches; fdiv must keep them exact
    val base = 1776000000000000000L // ~2026 in ns
    val p = (0L until 200L).map(i => (i, base + i * 7919L)).toDF("point_id", "t")
    val iv = Seq((base, base + 200L * 7919L, "all")).toDF("s", "e", "tag")
    RangeJoin.pointInRange(p, iv, "t", "s", "e", Nil, bucketSize = 3600L)
      .count() shouldBe 200L
    // fdiv itself: exact across the long range, negatives included
    import graft.functions.ColumnOps
    val vals = Seq(base, base + 1, -base, Long.MaxValue - 7, 0L, -1L)
      .toDF("v")
      .select(col("v"), ColumnOps.fdiv(col("v"), 3600L).as("q"))
      .collect()
    vals.foreach { r =>
      r.getLong(1) shouldBe Math.floorDiv(r.getLong(0), 3600L)
    }
  }

  test("randomized: bucketized result equals the naive BETWEEN join") {
    // deterministic pseudo-random corpus (seeded) — compare against the
    // quadratic reference implementation across bucket sizes, including
    // sizes much smaller and larger than the interval lengths
    val rnd = new scala.util.Random(42)
    val ps = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toString, rnd.nextInt(1000).toLong - 200))
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(900).toLong - 200
      (i.toLong, (rnd.nextInt(4) + 1).toString, s, s + rnd.nextInt(120))
    }
    val p = ps.toDF("point_id", "key", "t")
    val iv = ivs.toDF("iv_id", "key", "s", "e")
    val naive = p.as("p").join(iv.as("v"),
        col("p.key") === col("v.key") &&
          col("p.t") >= col("v.s") && col("p.t") <= col("v.e"))
      .select(col("point_id"), col("iv_id")).as[(Long, Long)].collect().toSet
    for (b <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInRange(p, iv, "t", "s", "e", Seq("key"), b)
        .select("point_id", "iv_id").as[(Long, Long)].collect().toSet
      got shouldBe naive
    }
  }

  test("column collisions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(points, intervals.withColumnRenamed("tag", "t"),
        "t", "s", "e", Seq("user"))
    }
    e.getMessage should include("collide")
  }
}
