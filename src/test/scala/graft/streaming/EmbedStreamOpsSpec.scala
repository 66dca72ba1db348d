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

  test("a PINNED serving index is loaded once: no micro-batch's executed " +
    "plan re-scans the index files, answers unchanged") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf-serve-pin").toString
    Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    val queries = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cand_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val direct = key(Similarity.searchIvfIndex(queries, dir, k = 5, nProbe = 2))
    // the deployment shape: load + pin ONCE (the materializing scan
    // happens here), then serve every micro-batch from the pinned rows
    val pinned = EmbedStreamOps.loadServingIndex(spark, dir).localCheckpoint()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def indexFileScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains(dir)) =>
        sc
    }
    val rows = queries.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (first, rest) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = EmbedStreamOps.searchIvfIndexStream(
      mem.toDF.toDF("vec_id", "embedding"), dir, k = 5, nProbe = 2,
      servingIndex = Some(pinned))
      .writeStream.format("memory").queryName("ivf_serve_pinned")
      .outputMode("append").start()
    val exec = q.asInstanceOf[
      org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery
    def batchPlan(): SparkPlan = exec.lastExecution.executedPlan
    mem.addData(first.toIndexedSeq)
    q.processAllAvailable()
    val plan1 = batchPlan()
    mem.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    val plan2 = batchPlan()
    val got = key(spark.table("ivf_serve_pinned"))
    q.stop()
    // NO file scan of the layout in ANY micro-batch: the static side is
    // the checkpointed RDD (one scan total, at pin time), so batch N+1
    // provably does not re-read the index
    indexFileScans(plan1) shouldBe empty
    indexFileScans(plan2) shouldBe empty
    (plan1.toString + plan2.toString) should include("ExistingRDD")
    got.toSeq shouldBe direct.toSeq
    Dedup.releaseCheckpoints(pinned)
  }
}
