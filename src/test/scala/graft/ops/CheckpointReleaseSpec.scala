package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Checkpoint hygiene over the WHOLE bench query set: every
  * `localCheckpoint()` an operator pins must be either released inside the
  * operator (once a downstream checkpoint re-roots the lineage and makes it
  * unreachable — see Dedup.bandedCandidates) or reachable from the returned
  * plan so `Dedup.releaseCheckpoints(result)` frees it. In a long-lived
  * session — exactly the 100 TB service shape — a single leaked block per
  * query accumulates until it evicts useful cache.
  *
  * Method: snapshot the persistent-RDD id set, execute each bench query to
  * completion (noop write, full materialization), release, and assert no
  * NEW persistent RDD survives. Delta-based (not `isEmpty`) so leftovers
  * from other suites sharing the session can't fail this one; suites run
  * sequentially in the forked test JVM (sbt's `testForkedParallel` default),
  * so no concurrent suite can add ids mid-query.
  */
class CheckpointReleaseSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  private val sfDir = "/root/testdata/sf0.001"

  test("every declared query releases all checkpoint blocks it pinned") {
    // ALL queries, not just the bench headline: the round-7 tfidf leak
    // lived exactly in the then-uncovered 111.
    val leaked = scala.collection.mutable.ListBuffer.empty[(String, Int)]
    graft.SparkEntry.allQueries.keys.toSeq.sorted.foreach { name =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = graft.SparkEntry.allQueries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      Dedup.releaseCheckpoints(df)
      val after = spark.sparkContext.getPersistentRDDs.keySet
      // shared fixtures (co-purchase edges) are DELIBERATE cross-query
      // pins with their own release path, asserted below — not leaks
      (after -- before -- graft.SparkEntry.sharedFixtureRddIds)
        .foreach(id => leaked += name -> id)
    }
    withClue(s"queries leaking persistent RDD blocks: $leaked") {
      leaked shouldBe empty
    }
    // the fixture lifecycle itself must be leak-free: releasing the
    // shared fixtures leaves the session with no surviving pin of theirs
    val fixtureIds = graft.SparkEntry.sharedFixtureRddIds
    fixtureIds should not be empty // q_pagerank/q_triangles ran above
    graft.SparkEntry.releaseSharedFixtures()
    graft.SparkEntry.sharedFixtureRddIds shouldBe empty
    spark.sparkContext.getPersistentRDDs.keySet
      .intersect(fixtureIds) shouldBe empty
  }
}
