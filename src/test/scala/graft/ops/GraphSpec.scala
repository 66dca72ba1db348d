package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraphSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("co-purchase edges: per-order pairs, both directions, deduplicated") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),  // order 1: 10-20-30 triangle
      (2L, 10L), (2L, 20L),             // order 2: repeats the 10-20 edge
      (3L, 40L)                         // singleton: no edges
    ).toDF("l_orderkey", "l_partkey")
    val edges = Graph.coPurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    edges shouldBe Set(
      (10L, 20L), (20L, 10L), (10L, 30L), (30L, 10L), (20L, 30L), (30L, 20L))
  }

  test("pageRank: one superstep matches the hand-computed integer recurrence") {
    // triangle a(1) b(2) c(3) plus pendant d(4)-a; undirected
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (1L, 4L), (4L, 1L)
    ).toDF("src", "dst")
    val rDf = Graph.pageRank(edges, iterations = 1)
    val r = rDf.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    Dedup.releaseCheckpoints(rDf) // the returned frame is its own checkpoint
    // outdeg a=3 b=2 c=2 d=1; contribs 333333/500000/500000/1000000
    r(1L) shouldBe 150000L + 850000L * 2000000L / 1000000L
    r(2L) shouldBe 150000L + 850000L * 833333L / 1000000L
    r(3L) shouldBe r(2L)
    r(4L) shouldBe 150000L + 850000L * 333333L / 1000000L
  }

  test("pageRank: more connected nodes rank higher after convergence-ish iterations") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (1L, 4L), (4L, 1L)
    ).toDF("src", "dst")
    val rDf = Graph.pageRank(edges, iterations = 3)
    val r = rDf.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    Dedup.releaseCheckpoints(rDf)
    r(1L) should be > r(2L)   // hub above triangle peers
    r(2L) should be > r(4L)   // triangle peers above the pendant
    r.values.sum.toDouble shouldBe (4e6 +- 4e5)  // mass roughly conserved
  }

  test("triangleCount: 4-clique has 4 triangles; hub cap removes them") {
    import spark.implicits._
    // 4-clique {1,2,3,4} (C(4,3) = 4 triangles) + pendant 4-5; edges in
    // mixed orientation with a duplicate to exercise canonicalization
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)
    ).toDF("src", "dst")
    val outDf = Graph.triangleCount(edges)
    val out = outDf.head()
    Dedup.releaseCheckpoints(outDf) // frees the edge-list pin (Graph.scala:132)
    out.getLong(0) shouldBe 7L // canonical simple edges
    out.getLong(1) shouldBe 4L
    // every clique vertex has degree >= 3: a cap of 2 leaves only an
    // empty/pendant graph -> no triangles
    val cappedDf = Graph.triangleCount(edges, maxDegree = 2L)
    val capped = cappedDf.head()
    Dedup.releaseCheckpoints(cappedDf)
    capped.getLong(1) shouldBe 0L
  }
}
