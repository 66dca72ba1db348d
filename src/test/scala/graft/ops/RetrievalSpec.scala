package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RetrievalSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("rrfFuse sums integer micro-points across lists") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), rrfK = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: floor(1e6/62) + floor(1e6/61) = 16129 + 16393 = 32522 from 2 lists
    out.head shouldBe ((2L, 32522L, 2L))
    // docs 1 and 3 each have one list; rank-1 doc 1 beats rank-2 doc 3
    out(1) shouldBe ((1L, 16393L, 1L))
    out(2) shouldBe ((3L, 16129L, 1L))
  }

  test("denseTopK is deterministic and ranked by descending cosine") {
    val out = Retrieval.denseTopK(docs, "dup spark join", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    out.length shouldBe 10
    out.map(_._2).toSeq.sliding(2).foreach {
      case Seq(x, y) => x should be >= y
      case _         =>
    }
    val again = Retrieval.denseTopK(docs, "dup spark join", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    again.toSeq shouldBe out.toSeq
  }

  test("booleanSearch keeps only docs containing every term") {
    val df = Seq(
      (1L, "spark join dup here"),
      (2L, "spark only"),
      (3L, "dup and join but no s-word"),
      (4L, "Dup Spark Join upper case")).toDF("doc_id", "text")
    val out = Retrieval.booleanSearch(df, Seq("dup", "spark", "join"))
      .collect().map(_.getLong(0)).sorted
    out.toSeq shouldBe Seq(1L, 4L) // tokens are lowercased first
    // query terms normalize too: "Spark" must not silently match nothing
    val mixed = Retrieval.booleanSearch(df, Seq("Dup", "SPARK", " join "))
      .collect().map(_.getLong(0)).sorted
    mixed.toSeq shouldBe Seq(1L, 4L)
  }

  test("bm25 normalizes case on both corpus and terms: the lexical leg can't silently go empty") {
    val df = Seq(
      (1L, "Spark joins the Data"),
      (2L, "spark spark spark"),
      (3L, "unrelated words entirely")).toDF("doc_id", "text")
    val lower = TextAnalysis.bm25(df, Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mixed = TextAnalysis.bm25(df, Seq("SPARK"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    lower.map(_._1).sorted.toSeq shouldBe Seq(1L, 2L) // "Spark" doc matches
    mixed.toSeq shouldBe lower.toSeq                  // term case is irrelevant
  }

  test("hybridRrf fuses both legs: scores non-increasing, lists in {1,2}") {
    val out = Retrieval.hybridRrf(docs, Seq("dup", "spark", "join"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 20
    out.map(_._2).toSeq.sliding(2).foreach {
      case Seq(x, y) => x should be >= y
      case _         =>
    }
    all(out.map(_._3)) should (be(1L) or be(2L))
    // at least one document should be found by both retrievers
    out.map(_._3) should contain(2L)
  }

  test("late interaction: the stopword gate prunes candidates and the " +
    "bit-packed MaxSim replays in plain scala") {
    // 'common' is in 4/5 docs (800‰ > cap 700): doc 2, which shares
    // ONLY the stopword with the query, must generate NO candidate;
    // docs 1/4 qualify through their rare shared token
    val docs = Seq(
      (0L, "alpha beta common"),
      (1L, "alpha gamma common"),
      (2L, "common common common"),
      (3L, "delta epsilon zeta"),
      (4L, "beta common zeta")).toDF("doc_id", "text")
    val plan = Retrieval.lateInteractionTopK(
      docs, queryMaxId = 1, k = 10, dfCapPermille = 700)
    val out = plan.orderBy("rank").collect()
    Dedup.releaseCheckpoints(plan) // ownership: the caller frees the pin
    out.map(_.getLong(1)).sorted.toSeq shouldBe Seq(1L, 4L)
    // independent replay: portable hash family in plain JVM arithmetic
    def mask(tok: String): Long = {
      val p = graft.functions.PortableHash.h28Local(tok)
      (0 until 16).foldLeft(0L) { (acc, j) =>
        val mixed = (p * (2L * j + 1) + j * graft.functions.PortableHash.Salt) %
          graft.functions.PortableHash.Prime
        acc | (if (mixed % 2 == 0) 1L << j else 0L)
      }
    }
    def maxSim(q: Seq[String], c: Seq[String]): Long =
      q.map { qt =>
        16L - 2L * c.map(ct =>
          java.lang.Long.bitCount(mask(qt) ^ mask(ct)).toLong).min
      }.sum
    val qtoks = Seq("alpha", "beta", "common")
    val expect = Map(
      1L -> maxSim(qtoks, Seq("alpha", "gamma", "common")),
      4L -> maxSim(qtoks, Seq("beta", "common", "zeta")))
    out.foreach { r =>
      r.getLong(2) shouldBe expect(r.getLong(1))
    }
    // rank order: score DESC, cand_id ASC
    out.map(r => (-r.getLong(2), r.getLong(1))).toSeq shouldBe
      out.map(r => (-r.getLong(2), r.getLong(1))).sorted.toSeq
  }

  test("late interaction serving: a query micro-batch stream against " +
    "the cached postings+masks index scores identically to batch, " +
    "across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (0L, "alpha beta common"),
      (1L, "alpha gamma common"),
      (2L, "common common common"),
      (3L, "delta epsilon zeta"),
      (4L, "beta common zeta")).toDF("doc_id", "text")
    val idx = Retrieval.lateInteractionIndex(corpus, dfCapPermille = 700)
    val queries = Seq((0L, "alpha beta common"), (3L, "delta zeta beta"))
    val batch = Retrieval.lateInteractionServe(
      queries.toDF("query_id", "text"), idx, k = 10)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    // the split itself must preserve the one-shot path's ranking
    val oneShotDf = Retrieval.lateInteractionTopK(
      corpus, queryMaxId = 1, k = 10, dfCapPermille = 700)
    val oneShot = oneShotDf.orderBy("rank").collect().map(_.toSeq)
    Dedup.releaseCheckpoints(oneShotDf) // it built its own index pins
    batch.filter(_.head == 0L) shouldBe oneShot
    // stream the same queries in TWO micro-batches through foreachBatch
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val mem = MemoryStream[(Long, String)](spark)
    val q = Retrieval.lateInteractionServeStream(
      mem.toDF.toDF("query_id", "text"), idx, k = 10) { (scored, _) =>
        got ++= scored.collect().map(_.toSeq)
      }.start()
    mem.addData(queries.head)
    q.processAllAvailable()
    mem.addData(queries(1))
    q.processAllAvailable()
    q.stop()
    got.sortBy(r => (r.head.asInstanceOf[Long],
      r(3).asInstanceOf[Long])).toSeq shouldBe batch.toSeq
    Dedup.releaseCheckpoints(
      Retrieval.lateInteractionServe(
        queries.toDF("query_id", "text"), idx, k = 10))
  }
}
