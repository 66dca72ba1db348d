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
      val residue =
        TestSpark.spark.sparkContext.getPersistentRDDs.keySet.toSet --
          preexisting -- SparkEntry.sharedFixtureRddIds
      if (residue.nonEmpty)
        throw new IllegalStateException(
          s"${getClass.getName} leaked persistent RDD blocks " +
            residue.toSeq.sorted.mkString("[", ", ", "]") +
            " — a test materialized a checkpointing operator's result " +
            "without Dedup.releaseCheckpoints (ownership protocol: the " +
            "caller frees what the returned plan pins)")
    }
}
