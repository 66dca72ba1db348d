package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class DocStreamOpsSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
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

  test("snapshot stream: last-seq wins, tombstones emit, stale replays are no-ops") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[DocChange](spark)
      val q = DocStreamOps.snapshotStream(mem.toDS())
        .writeStream.format("memory").queryName("snap")
        .outputMode("update").start()
      mem.addData(
        DocChange(1L, "upsert", 1L, "en", "s0", 100L),
        DocChange(2L, "upsert", 1L, "de", "s1", 200L))
      q.processAllAvailable()
      mem.addData(
        DocChange(1L, "upsert", 3L, "en", "s0", 150L), // newer seq wins
        DocChange(2L, "delete", 2L, "de", "s1", 200L), // tombstone
        DocChange(1L, "upsert", 2L, "en", "s0", 999L)) // folded out (seq < 3)
      q.processAllAvailable()
      mem.addData(
        DocChange(1L, "upsert", 2L, "en", "s0", 777L)) // stale replay: no-op
      q.processAllAvailable()
      val rows = spark.table("snap").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(5)))
      q.stop()
      rows should contain((1L, true, 1L, 100L))
      rows should contain((1L, true, 3L, 150L))
      rows should contain((2L, false, 2L, 200L))
      // the stale replay emitted nothing and did not clobber state
      rows.filter(_._1 == 1L).map(_._4) should not contain 777L
      rows.length shouldBe 4
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("snapshot batch twin equals applyChanges on an empty base") {
    val changes = Seq(
      DocChange(1L, "upsert", 1L, "en", "s0", 100L),
      DocChange(1L, "upsert", 2L, "en", "s0", 150L),
      DocChange(2L, "upsert", 1L, "de", "s1", 200L),
      DocChange(2L, "delete", 2L, "de", "s1", 200L),
      DocChange(3L, "upsert", 1L, "fr", "s2", 300L)).toDS()
    val view = DocStreamOps.snapshotStream(changes)
      .filter(_.present)
      .collect().map(r => (r.doc_id, r.n_chars)).sorted
    val base = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "lang", "source", "n_chars")
    val twin = graft.ops.CorpusOps.applyChanges(
        base, changes.toDF(), Seq("doc_id"), "seq")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).sorted
    view.toSeq shouldBe twin.toSeq
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
