package graft

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Per-suite checkpoint-hygiene sweep: snapshot the persistent-RDD id set
  * when the suite starts, and FAIL THIS SUITE (afterAll) if any id it
  * added is still pinned when it ends — so an ownership-protocol leak is
  * reported at the leaking suite, not suites later when some global
  * `isEmpty` assertion happens to run (the round-11 failure shape: a
  * SimilaritySpec hygiene test caught blocks pinned by earlier suites).
  *
  * Delta-based so residue from an earlier, already-flagged suite can't
  * cascade a second failure; suites run sequentially in the forked test
  * JVM (sbt's `testForkedParallel` default is off), so no concurrent
  * suite can add ids mid-run. Shared bench fixtures
  * ([[SparkEntry.sharedFixtureRddIds]]) have their own asserted lifecycle
  * (CheckpointReleaseSpec) and are exempt.
  */
trait CleanSessionCheck extends BeforeAndAfterAll { this: Suite =>
  private var preexisting: Set[Int] = Set.empty

  override def beforeAll(): Unit = {
    preexisting = TestSpark.spark.sparkContext.getPersistentRDDs.keySet.toSet
    super.beforeAll()
  }

  override def afterAll(): Unit =
    try super.afterAll()
    finally {
      def residue: Set[Int] =
        TestSpark.spark.sparkContext.getPersistentRDDs.keySet.toSet --
          preexisting -- SparkEntry.sharedFixtureRddIds
      var left = residue
      if (left.nonEmpty) {
        // releaseCheckpoints unpersists with blocking = false, so an id
        // can legitimately still be in flight when the suite's last test
        // returns; one grace window separates that transient from a real
        // leak (a genuine ownership-protocol miss pins FOREVER, so it
        // survives any wait — observed as a rare order-dependent abort
        // at full-suite scale, r15)
        Thread.sleep(2000)
        left = residue
      }
      if (left.nonEmpty)
        throw new IllegalStateException(
          s"${getClass.getName} leaked persistent RDD blocks " +
            left.toSeq.sorted.mkString("[", ", ", "]") +
            " — a test materialized a checkpointing operator's result " +
            "without Dedup.releaseCheckpoints (ownership protocol: the " +
            "caller frees what the returned plan pins)")
    }
}
