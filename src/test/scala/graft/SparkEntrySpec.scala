package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver-contract invariants that keep the correctness gate honest:
  * every DECLARED query must have a DuckDB oracle (no rows-only entries —
  * native-hash variants whose outputs no external engine can replay live
  * in `benchOnlyQueries` instead), and every bench headline name must
  * resolve.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {

  test("every declared query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    withClue(s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without query: ${(o -- q).toSeq.sorted}") {
      q shouldBe o
    }
  }

  test("bench-only queries never shadow declared queries") {
    (SparkEntry.benchOnlyQueries.keySet & SparkEntry.queries.keySet) shouldBe empty
  }

  test("every bench headline name resolves") {
    val all = SparkEntry.allQueries.keySet
    Bench.headline.filterNot(all) shouldBe empty
  }

  test("the 2x gate covers the whole sf0.1 surface: no headline query " +
    "without a firstSeen base") {
    // a headline entry missing from firstSeen is silently UNGATED — the
    // exact hole the per-query gate exists to close
    Bench.headline.filterNot(Bench.firstSeen.contains) shouldBe empty
  }

  test("the sf1 gate covers its whole surface: no sf1-benched query " +
    "without a firstSeenSf1 base") {
    Bench.headline.filterNot(Bench.sf1Exclude)
      .filterNot(Bench.firstSeenSf1.contains) shouldBe empty
  }

  test("baseline maps and exclusions name only real queries") {
    val names = SparkEntry.allQueries.keySet + "ingest_full"
    Bench.firstSeen.keySet.filterNot(names) shouldBe empty
    Bench.firstSeenSf1.keySet.filterNot(names) shouldBe empty
    Bench.sf1Exclude.filterNot(Bench.headline.contains) shouldBe empty
  }

  test("trap vocab: the optimal DP's win over greedy is MEASURED > 0 on " +
    "the real corpus, and the trained costs are well-formed") {
    val spark = TestSpark.init()
    val gain = SparkEntry
      .queries("q_tokenize_viterbi_gain")(spark, "/root/testdata/sf0.001")
      .head()
    gain.getAs[Long]("n_differ") should be > 0L
    gain.getAs[Long]("n_strictly_fewer") should be > 0L
    gain.getAs[Long]("tokens_saved") should be > 0L
    gain.getAs[Long]("unks_avoided") should be > 0L
    // trained unigram-LM costs: one per entry, all positive (every trap
    // entry occurs in the corpus), the most frequent entry (space) is
    // the cheapest — the SentencePiece-shaped price structure
    val costs = SparkEntry.trainedTrapCosts(spark, "/root/testdata/sf0.001")
    costs.size shouldBe SparkEntry.trapVocab.size
    costs.foreach(_ should be > 0)
    costs(SparkEntry.trapVocab.indexOf(" ")) shouldBe costs.min
  }
}
