package graft.streaming

import graft.TestSpark
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EmbedStreamOpsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def fixture() = {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") < 250L)
    val fresh = emb.filter(col("vec_id") >= 250L)
    val k = 16
    val codebook = Similarity.seedCodebook(corpus, k)
    val index = Similarity.ivfAssignProbe(corpus, k, nProbe = 2, Some(codebook))
    (corpus, fresh, k, codebook, index)
  }

  test("batch input equals the deterministic batch incremental (same " +
    "pinned codebook, both sides probe-2)") {
    val (corpus, fresh, k, codebook, index) = fixture()
    val stream = EmbedStreamOps.semanticDedupStream(
      fresh, index, codebook, threshold = 0.35, nProbe = 2)
      .select("vec_id").as[Long].collect().sorted
    val batchDf = Dedup.dropSemanticDuplicatesIncremental(
      fresh, corpus, threshold = 0.35, nCells = k,
      centroids = Some(codebook), nProbe = 2)
    val batch = batchDf.select("vec_id").as[Long].collect().sorted
    Dedup.releaseCheckpoints(batchDf)
    stream.toSeq shouldBe batch.toSeq
    // discriminating: some dropped, some survive
    stream.length should be < fresh.count().toInt
    stream.length should be > 0
  }

  test("streaming input through a MemoryStream reaches the same survivor " +
    "set, across micro-batch boundaries") {
    val (_, fresh, _, codebook, index) = fixture()
    val expect = EmbedStreamOps.semanticDedupStream(
      fresh, index, codebook, threshold = 0.35, nProbe = 2)
      .select("vec_id").as[Long].collect().sorted
    val rows = fresh.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (first, rest) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val vecs = mem.toDF.toDF("vec_id", "embedding")
    val q = EmbedStreamOps.semanticDedupStream(
      vecs, index, codebook, threshold = 0.35, nProbe = 2)
      .writeStream.format("memory").queryName("embed_dedup")
      .outputMode("append").start()
    mem.addData(first.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    val got = spark.table("embed_dedup")
      .select("vec_id").as[Long].collect().sorted
    q.stop()
    got.toSeq shouldBe expect.toSeq
  }
}
