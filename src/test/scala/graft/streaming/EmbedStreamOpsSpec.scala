package graft.streaming

import graft.TestSpark
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EmbedStreamOpsSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
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

  test("ANN serving twin: batch run equals searchIvfIndex exactly, and a " +
    "MemoryStream run reaches the same top-k across micro-batches") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf-serve").toString
    Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    val queries = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cand_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    // batch twin ≡ the partition-pruned batch search, bit-exact
    val batch = key(EmbedStreamOps.searchIvfIndexStream(
      queries, dir, k = 5, nProbe = 2))
    val direct = key(Similarity.searchIvfIndex(queries, dir, k = 5, nProbe = 2))
    batch.toSeq shouldBe direct.toSeq
    batch.length should be > 0
    // the same transform over a MemoryStream, split across two batches
    val rows = queries.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (first, rest) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = EmbedStreamOps.searchIvfIndexStream(
      mem.toDF.toDF("vec_id", "embedding"), dir, k = 5, nProbe = 2)
      .writeStream.format("memory").queryName("ivf_serve")
      .outputMode("append").start()
    mem.addData(first.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    val got = key(spark.table("ivf_serve"))
    q.stop()
    got.toSeq shouldBe direct.toSeq
  }
}
