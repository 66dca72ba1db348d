package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The operators composed as a real training-data pipeline would chain
  * them, over the real documents table: quality filter → exact dedup →
  * near-dedup → chunk → split. Each stage's output feeds the next
  * untouched — proving the column contracts line up, not just that each
  * operator works in isolation.
  */
class PipelineCompositionSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("filter -> dedup -> near-dedup -> chunk -> split composes end to end") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.count()

    // 1. quality gate: keep docs in a sane token range with low punct
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("n_tokens") >= 5 && col("punct_ratio") < 0.3)
      .select("doc_id")
    val kept = docs.join(quality, "doc_id")
    val nKept = kept.count()
    nKept should be > 0L
    nKept should be <= total

    // 2. exact dedup, then near-dedup over the survivors
    val exact = Dedup.dropExactDuplicates(kept)
    val near = Dedup.dropNearDuplicates(exact, threshold = 0.6)
    val nNear = near.count()
    nNear should be <= exact.count()
    nNear should be > 0L

    // 3. chunk the deduped corpus
    val chunks = TextAnalysis.chunk(near, chunkTokens = 32, strideTokens = 24)
    chunks.count() should be >= nNear // every doc yields >= 1 chunk
    chunks.select("doc_id").distinct().count() shouldBe nNear

    // 4. deterministic split stamped on the chunks (key = doc so all of a
    // document's chunks land in the same split — no train/val leakage)
    val split = Sampling.assignSplit(chunks, "doc_id", valPermille = 100)
    split.count() shouldBe chunks.count()
    val leaks = split.groupBy("doc_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    leaks shouldBe 0L
    // pipeline is deterministic end to end
    val again = Sampling.assignSplit(
      TextAnalysis.chunk(
        Dedup.dropNearDuplicates(
          Dedup.dropExactDuplicates(kept), threshold = 0.6),
        chunkTokens = 32, strideTokens = 24),
      "doc_id", valPermille = 100)
    again.select("doc_id", "chunk_id", "split").collect().toSet shouldBe
      split.select("doc_id", "chunk_id", "split").collect().toSet
    // ownership protocol: each dropNearDuplicates pinned its banded
    // candidate table; both pins are reachable from the chained plans
    Seq(split, again).foreach(Dedup.releaseCheckpoints)
  }
}
