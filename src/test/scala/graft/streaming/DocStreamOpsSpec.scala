package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class DocStreamOpsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming incremental dedup: index hits, in-stream dups, and replays all drop") {
    val index = Seq("already indexed content")
      .toDF("text").select(graft.ops.Dedup.contentKey($"text").as("content_key"))
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = mem.toDF.toDF("doc_id", "ts", "text")
    val q = DocStreamOps.dedupIncrementalStream(docs, index, "5 minutes")
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").start()
    mem.addData(
      (10L, ts("2024-01-01 10:00:00"), "already  INDEXED content"), // vs index (normalized)
      (11L, ts("2024-01-01 10:00:10"), "fresh document one"),
      (12L, ts("2024-01-01 10:00:20"), "fresh document one"))       // in-batch dup of 11
    q.processAllAvailable()
    mem.addData(
      (13L, ts("2024-01-01 10:01:00"), "fresh  document ONE"),      // cross-batch dup of 11
      (14L, ts("2024-01-01 10:01:30"), "fresh document two"))
    q.processAllAvailable()
    val ids = spark.table("doc_dedup").collect().map(_.getLong(0)).sorted
    q.stop()
    ids.toSeq shouldBe Seq(11L, 14L)
  }

  test("batch input delegates to the deterministic lowest-id rule") {
    val index = Seq("seen").toDF("text")
      .select(graft.ops.Dedup.contentKey($"text").as("content_key"))
    val batch = Seq(
      (5L, "seen"), (9L, "novel"), (3L, "novel")
    ).toDF("doc_id", "text")
    DocStreamOps.dedupIncrementalStream(batch, index)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(3L)
  }
}
