package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq((1L, "hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head
    r.getAs[Long]("n_ws_tokens") shouldBe 4L
    // hello | world | , | 42 | times | !
    r.getAs[Long]("n_bpe_tokens") shouldBe 6L
    r.getAs[Long]("n_chars") shouldBe 22L
  }

  test("quality score ratios") {
    val df = Seq((1L, "the the the the")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df).head
    r.getAs[Long]("n_tokens") shouldBe 4L
    r.getAs[Double]("uniq_ratio") shouldBe 0.25
    r.getAs[Double]("stopword_ratio") shouldBe 1.0
    r.getAs[Double]("punct_ratio") shouldBe 0.0
  }

  test("language id picks the dominant marker language") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "le chat et la maison et les chiens"),
      (4L, "el gato y los perros y las casas"),
      (5L, "no markers here whatsoever")
    ).toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("?"))
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out shouldBe Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh")
  }

  test("language id: sentence-initial capitals count, NULL text stays NULL") {
    val df = Seq(
      (1L, "The cat And The dog Of the house"), // capitalized markers vote
      (2L, null.asInstanceOf[String])           // NULL in -> NULL out, not 'zh'
    ).toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("?"))
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    out shouldBe Map(1L -> Some("en"), 2L -> None)
  }

  test("chunk keeps its >=1-chunk contract for NULL-text documents") {
    val df = Seq((1L, "some real text right here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.chunk(df, chunkTokens = 4, strideTokens = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    ids shouldBe Set(1L, 2L)
  }

  test("hashEmbed: NULL text embeds like empty text (no NULL vector slots)") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashEmbed(df, dim = 8).collect()
    val vecs = rows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs(1L) shouldBe vecs(2L)                // identical embeddings
    vecs(1L).forall(_ != null) shouldBe true  // no NULL slots
    vecs(1L).map(_.toDouble).sum shouldBe 1.0 // the single "" token counted
  }

  test("greedy tokenize: native trie and Column fallback agree exactly") {
    import org.apache.spark.sql.functions.col
    val vocab = Seq("the", "of", "ing", "er", "th", "a", "e", "i", "t", "n", " ")
    val df = Seq(
      (1L, "the thing"),        // longest match beats prefixes: the > th > t
      (2L, ""),                 // empty -> zero tokens
      (3L, "xyz"),              // nothing matches -> all unknown
      (4L, "therther"),         // greedy: the+r(unk) then th+er
      (5L, "café 😀 ok"), // multi-byte + astral code point
      (6L, null.asInstanceOf[String]) // NULL text -> NULL ids on BOTH paths
    ).toDF("doc_id", "text")
    def ids(native: Boolean) = df.select(col("doc_id"),
      TextAnalysis.greedyTokenizeIds(col("text"), vocab, native).as("ids"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    val nat = ids(native = true)
    val fb = ids(native = false)
    nat shouldBe fb
    nat(1L) shouldBe Some(Seq(0, 10, 4, 2))   // the | ' ' | th | ing
    nat(2L) shouldBe Some(Seq())
    nat(3L) shouldBe Some(Seq(-1, -1, -1))
    nat(4L) shouldBe Some(Seq(0, -1, 0, -1))  // the | r? | the | r?
    nat(5L) shouldBe Some(Seq(-1, 5, -1, -1, 10, -1, 10, -1, -1)) // only a + spaces known
    nat(6L) shouldBe None
  }

  test("viterbi tokenize: native DP and Column fallback agree exactly") {
    import org.apache.spark.sql.functions.col
    val vocab = Seq("ab", "a", "bcd", "the", "th", "e", " ")
    val ones = Seq.fill(vocab.size)(1)
    val df = Seq(
      (1L, "abcd"),             // greedy ab|c|d = 3; optimal a|bcd = 2
      (2L, ""),                 // empty -> zero tokens
      (3L, "xyz"),              // nothing matches -> all unknown
      (4L, "the e"),            // exact cover
      (5L, "café 😀 ab"),      // multi-byte + astral code point
      (6L, null.asInstanceOf[String]) // NULL -> NULL ids on BOTH paths
    ).toDF("doc_id", "text")
    def ids(native: Boolean) = df.select(col("doc_id"),
      TextAnalysis.viterbiTokenizeIds(col("text"), vocab, ones, 1, native).as("ids"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    val nat = ids(native = true)
    val fb = ids(native = false)
    nat shouldBe fb
    nat(1L) shouldBe Some(Seq(1, 2))          // a | bcd beats ab | unk | unk
    nat(2L) shouldBe Some(Seq())
    nat(3L) shouldBe Some(Seq(-1, -1, -1))
    nat(4L) shouldBe Some(Seq(3, 6, 5))       // the | ' ' | e
    nat(5L) shouldBe Some(Seq(-1, 1, -1, -1, 6, -1, 6, 0)) // c,a,f,é,' ',😀,' ',ab
    nat(6L) shouldBe None
  }

  test("viterbi: weighted costs steer the segmentation; ties prefer longer then real tokens") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val vocab = Seq("ab", "c", "abc")
    def run(costs: Seq[Int], unk: Int, native: Boolean) = df.select(
      TextAnalysis.viterbiTokenizeIds(col("text"), vocab, costs, unk, native).as("ids"))
      .head.getSeq[Int](0)
    for (native <- Seq(true, false)) {
      // equal totals (1+2 vs 3, unk priced out): tie prefers the LONGER token
      run(Seq(1, 2, 3), 9, native) shouldBe Seq(2)
      // make the split strictly cheaper
      run(Seq(1, 1, 9), 9, native) shouldBe Seq(0, 1)
      // a cheap unknown edge undercuts an expensive real token
      run(Seq(9, 9, 9), 1, native) shouldBe Seq(-1, -1, -1)
      // cost ties against unknown edges resolve to the REAL token
      run(Seq(9, 1, 9), 1, native) shouldBe Seq(-1, -1, 1)
    }
  }

  test("viterbi n_tokens is never above greedy's at all-ones costs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val vocab = graft.SparkEntry.demoVocab
    val g = TextAnalysis.greedyTokenize(docs, vocab)
      .selectExpr("doc_id", "n_tokens AS g").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = TextAnalysis.viterbiTokenize(docs, vocab)
      .selectExpr("doc_id", "n_tokens AS v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    v.keySet shouldBe g.keySet
    v.foreach { case (id, n) => n should be <= g(id) }
  }

  test("greedy tokenize query shape summarizes to scalars") {
    val df = Seq((7L, "the end")).toDF("doc_id", "text")
    val r = TextAnalysis.greedyTokenize(df, Seq("the", "e", "n", "d", " ")).head
    // the | ' ' | e | n | d -> 5 tokens, 0 unknown
    r.getAs[Long]("n_tokens") shouldBe 5L
    r.getAs[Long]("n_unk") shouldBe 0L
    r.getAs[String]("ids_str") shouldBe "0 4 1 2 3"
  }

  test("corpus stats aggregate exactly from integer sums") {
    val df = Seq(
      (1L, "a b c", "en"), (2L, "d e", "en"), (3L, "x", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.corpusStats(df).orderBy("lang").collect()
    out(0).getAs[Long]("n_docs") shouldBe 2L
    out(0).getAs[Long]("total_tokens") shouldBe 5L
    out(0).getAs[Double]("avg_chars") shouldBe 4.0 // (5 + 3) / 2
    out(1).getAs[Long]("max_tokens") shouldBe 1L
  }

  test("chunking covers every token with the configured overlap") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "short")                                   // 1 token -> 1 chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, chunkTokens = 4, strideTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // starts at 0,3,6,9: ceil((10-4)/3)+1 = 3 chunks... 0,3,6 cover t1..t10
    out((1L, 0L)) shouldBe ("t1 t2 t3 t4", 4L)
    out((1L, 1L)) shouldBe ("t4 t5 t6 t7", 4L)
    out((1L, 2L)) shouldBe ("t7 t8 t9 t10", 4L)
    out.keys.count(_._1 == 1L) shouldBe 3
    out((2L, 0L)) shouldBe ("short", 1L)
    // a final partial chunk keeps its true (shorter) token count
    val tail = TextAnalysis.chunk(df.filter($"doc_id" === 1L),
      chunkTokens = 4, strideTokens = 4).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    tail shouldBe Map(0L -> 4L, 1L -> 4L, 2L -> 2L)
  }

  test("semanticChunks: a boundary opens exactly at the vocabulary shift; " +
    "threshold extremes give whole-doc and per-window chunks") {
    // two windows of REPEATED single words: window vectors are
    // concentrated in one hash bucket each, so the seam cosine is 0
    // (different words → almost surely different buckets) while any
    // within-topic pair would be 1
    val doc = (("alpha " * 12) + ("omega " * 12)).trim
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val out = TextAnalysis.semanticChunks(df, windowWords = 12)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getString(3))).toMap
    out.keySet shouldBe Set(0L, 1L)
    out(0L) shouldBe ((1L, ("alpha " * 12).trim))
    out(1L) shouldBe ((1L, ("omega " * 12).trim))
    // threshold 0: nothing dips below -> one chunk per document
    TextAnalysis.semanticChunks(df, windowWords = 12, thresholdMicro = 0L)
      .count() shouldBe 1L
    // threshold > 1e6: every window opens its own chunk
    TextAnalysis.semanticChunks(df, windowWords = 12,
      thresholdMicro = 1000001L).count() shouldBe 2L
    // every real document yields >= 1 chunk and chunk ids are dense 0..n
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val chunks = TextAnalysis.semanticChunks(real).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    chunks.map(_._1).distinct.length shouldBe real.count().toInt
    chunks.groupBy(_._1).values.foreach { cs =>
      cs.map(_._2).sorted.toSeq shouldBe (0L until cs.length).toSeq
    }
  }

  test("hash split is deterministic, complete, and roughly proportioned") {
    val df = (1L to 1000L).toDF("doc_id")
    val a = Sampling.assignSplit(df, "doc_id", valPermille = 100, testPermille = 50)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.values.sum shouldBe 1000L
    a("val").toDouble shouldBe 100.0 +- 40.0
    a("test").toDouble shouldBe 50.0 +- 30.0
    // stability: same assignment on rerun and on a grown corpus
    val b = Sampling.assignSplit(df, "doc_id", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Sampling.assignSplit((1L to 2000L).toDF("doc_id"), "doc_id", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 1000L).forall(id => grown(id) == b(id)) shouldBe true
    Sampling.sampleByHash(df, "doc_id", 0).count() shouldBe 0L
    Sampling.sampleByHash(df, "doc_id", 1000).count() shouldBe 1000L
  }

  test("repetition stats: degenerate repeated text scores high, clean text zero") {
    val df = Seq(
      (1L, "a b a b a"),   // 2-grams: (a b)x2, (b a)x2
      (2L, "u v w x y"),   // all distinct
      (3L, "z")            // shorter than n: one whole-text gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, n = 2).orderBy("doc_id").collect()
    val r1 = out(0)
    r1.getLong(1) shouldBe 4L        // n_grams
    r1.getLong(2) shouldBe 2L        // n_distinct
    r1.getLong(3) shouldBe 2L        // top_count
    r1.getDouble(4) shouldBe 0.5     // dup_fraction
    r1.getDouble(5) shouldBe 0.5     // top_share
    out(1).getDouble(4) shouldBe 0.0
    out(2).getLong(1) shouldBe 1L
  }

  test("sequence packing: concat-and-cut placement from the running sum") {
    val df = Seq(
      (1L, "en", ("w " * 300).trim),   // 300 toks: seq 0, offset 0
      (2L, "en", ("w " * 300).trim),   // seq 0 @300, spans the 512 cut
      (3L, "en", ("w " * 100).trim),   // cum 600 -> seq 1 @88
      (4L, "fr", ("w " * 50).trim)     // own group: seq 0 @0
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.packSequences(df, seqTokens = 512)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    out shouldBe Array(
      (1L, 0L, 0L, false),
      (2L, 0L, 300L, true),
      (3L, 1L, 88L, false),
      (4L, 0L, 0L, false))
  }

  test("vocabulary keeps grams at or above the document-frequency cut") {
    val df = Seq(
      (1L, "apple banana apple"),   // distinct per doc: apple, banana
      (2L, "apple cherry"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(df, minDf = 2).orderBy("gram")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    out shouldBe Array("apple" -> 3L, "banana" -> 2L) // cherry df=1 pruned
  }

  test("quality classifier: integer features and threshold label") {
    val df = Seq(
      (1L, "the cat and the dog ran to a tree"),  // natural text
      (2L, "$$ ## !! %% ^^ && ** (( )) @@"),      // symbol soup
      (3L, "123456 789012 345678 901234")         // digit dump
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifier(df).orderBy("doc_id").collect()
    val r1 = out(0)
    r1.getAs[Long]("n_tokens") shouldBe 9L
    // 5 stopwords (the, and, the, to, a) of 9 tokens
    r1.getAs[Long]("stop_micro") shouldBe (1000000L * 5 - (1000000L * 5) % 9) / 9
    r1.getAs[Long]("sym_micro") shouldBe 0L
    r1.getAs[Boolean]("keep") shouldBe true
    out(1).getAs[Boolean]("keep") shouldBe false  // symbol penalty dominates
    out(2).getAs[Boolean]("keep") shouldBe false  // digit penalty dominates
  }

  test("tfidf: rare terms outrank common ones; weights are exact integers") {
    val df = Seq(
      (1L, "alpha alpha shared"),
      (2L, "beta shared"),
      (3L, "gamma shared"),
      (4L, "delta other")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, k = 1).orderBy("doc_id").collect()
    // per doc the unique term wins; 'shared' (df=3) carries less idf
    top.map(_.getString(2)) shouldBe Array("alpha", "beta", "gamma", "delta")
    // alpha: tf=2, idf_milli = round(ln(4/1)*1000) = 1386 -> 2772
    top(0).getAs[Long]("w_milli") shouldBe 2L * 1386L
  }

  test("tfidf pairs: only term-sharing docs appear, self/reverse pairs don't") {
    val df = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana durian"),
      (3L, "xylophone zebra")
    ).toDF("doc_id", "text")
    val pairsDf = TextAnalysis.tfidfPairs(df, maxDf = 50L, minSim = 0.0)
    val pairs = pairsDf.collect()
    // release tfidfPairs' pinned weight-table checkpoint so the hygiene
    // assertion in the bpe-train test (and CheckpointReleaseSpec) stays honest
    Dedup.releaseCheckpoints(pairsDf)
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    val sim = pairs(0).getDouble(2)
    sim should be > 0.0
    sim should be < 1.0
  }

  test("stripOverlapSpans: longest shared span removed from the higher id only") {
    val df = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 s5 y1"),
      (2L, "z1 s1 s2 s3 s4 s5 z2 z3"),
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val outDf = TextAnalysis.stripOverlapSpans(df, pairs, n = 3, minSpanTokens = 5)
    val out = outDf.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // release the span-join pin so the shared-session hygiene assertions stay honest
    Dedup.releaseCheckpoints(outDf)
    // a-side (lowest id) keeps its occurrence verbatim
    out(1L) shouldBe ("x1 x2 s1 s2 s3 s4 s5 y1", 0L)
    // b-side loses exactly the 5-token shared run
    out(2L) shouldBe ("z1 z2 z3", 5L)
    // non-candidate docs pass through (normalized re-join)
    out(3L) shouldBe ("unrelated words entirely here", 0L)
  }

  test("stripOverlapSpans: spans under minSpanTokens survive; ties break to earliest start") {
    val df = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 a3"),              // shares 4-token run with 2
      (2L, "b1 s1 s2 s3 s4 b2"),
      (3L, "t1 t2 t3 t4 t5 mid u1 u2 u3 u4 u5"), // two 5-token runs vs 4
      (4L, "t1 t2 t3 t4 t5 xxx u1 u2 u3 u4 u5")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val outDf = TextAnalysis.stripOverlapSpans(df, pairs, n = 3, minSpanTokens = 5)
    val out = outDf.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    Dedup.releaseCheckpoints(outDf)
    out(2L) shouldBe ("b1 s1 s2 s3 s4 b2", 0L) // 4 < minSpanTokens
    // equal-length spans: the earlier one (t-run at start 0) is stripped,
    // and only ONE span per pass
    out(4L) shouldBe ("xxx u1 u2 u3 u4 u5", 5L)
    out(3L)._2 shouldBe 0L
  }

  test("pii scan: luhn separates valid cards from random digit runs") {
    val df = Seq(
      // 4532015112830366 passes Luhn; 1234567812345678 does not
      (1L, "call +1-555-123-4567 from 10.0.0.1 card 4532015112830366"),
      (2L, "fake card 1234567812345678 and ip 192.168.1.100"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(df).orderBy("doc_id").collect()
    out(0).getAs[Long]("n_phones") shouldBe 1L
    out(0).getAs[Long]("n_ips") shouldBe 1L
    out(0).getAs[Long]("n_cards") shouldBe 1L
    out(0).getAs[Long]("n_valid") shouldBe 1L
    out(1).getAs[Long]("n_cards") shouldBe 1L
    out(1).getAs[Long]("n_valid") shouldBe 0L
    out(1).getAs[Long]("n_ips") shouldBe 1L
    out(2).getAs[Long]("n_phones") shouldBe 0L
    out(2).getAs[Long]("n_cards") shouldBe 0L
  }

  test("hash embedding: bucket counts, identical texts identical vectors") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "apple banana apple"),
      (3L, "zebra xylophone")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hashEmbed(df, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out(1L) shouldBe out(2L)                      // deterministic
    out(1L).map(_.toDouble).sum shouldBe 3.0      // one count per token
    out(3L).map(_.toDouble).sum shouldBe 2.0
    out(1L) should not be out(3L)
    out(1L).length shouldBe 16
  }

  test("collocations: PMI in milli-units with min-count pruning") {
    val df = Seq((1L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, minCount = 5L, k = 10).collect()
    out.length shouldBe 1  // (b,a) occurs only 4 times -> pruned
    val r = out.head
    (r.getString(0), r.getString(1), r.getLong(2)) shouldBe ("a", "b", 5L)
    // N_bi=9, c_a=c_b=5, N_uni=10: pmi = ln(5*10*10 / (9*5*5))
    r.getLong(3) shouldBe
      BigDecimal(math.log(5.0 * 10 * 10 / (9.0 * 5 * 5)) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("bpe pair stats count in-word adjacent char pairs") {
    val df = Seq((1L, "aab ab x")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(df, k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // 'aab' -> aa, ab; 'ab' -> ab; 'x' too short
    out shouldBe Map(("a", "b") -> 2L, ("a", "a") -> 1L)
  }

  test("bpe train: iterated merges with greedy left-to-right application") {
    // words (len>=2): abab x2, ab x1
    // iter1 pairs: abab=|a||b||a||b| -> (a,b)x2,(b,a)x1 each weight 2; ab -> (a,b)x1
    //   => (a,b)=5, (b,a)=2 -> merge1 = (a,b,5); reps: |ab||ab|, |ab|
    // iter2: (ab,ab)=2 -> merge2 = (ab,ab,2); reps: |abab|, |ab|
    // iter3: no pairs left -> early stop at 2 merges
    val df = Seq((1L, "abab ab abab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, numMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1, "a", "b", 5L), (2, "ab", "ab", 2L))
    // no leaked checkpoint blocks after training
    spark.sparkContext.getPersistentRDDs shouldBe empty
  }

  test("bpe train: tie-break is (count desc, left asc, right asc)") {
    // (b,a) and (b,c) both count 2 -> (b,a) wins round 1; then bc merges
    val df = Seq((1L, "ba bc"), (2L, "ba bc")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1, "b", "a", 2L), (2, "b", "c", 2L))
  }

  test("bpe train: same-letter runs merge greedily left to right") {
    // 'aaaa': pairs (a,a)x3 -> merge (a,a); replace is non-overlapping
    // left-to-right so |a||a||a||a| -> |aa||aa| (NOT |aa||a||a|)
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L))
  }

  test("bpe train batched: symbol-disjoint batch per round, conflict blocked by rank") {
    // round-1 pairs over {abab x2, ab, cd x3, ce x2}:
    //   (a,b)=5, (c,d)=3, (b,a)=2, (c,e)=2
    // ranked: (a,b),(c,d),(b,a),(c,e). (b,a) is blocked by rank-1 (a,b)
    // (shares both symbols); (c,e) is blocked by rank-2 (c,d) (shares c)
    // -> round 1 learns [(a,b,5), (c,d,3)] in ONE pass
    // round-2 pairs over {|ab||ab| x2, |ab|, |cd| x3, |c||e| x2}:
    //   (ab,ab)=2, (c,e)=2 -> disjoint, both survive
    val df = Seq((1L, "abab ab abab cd cd cd ce ce")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainBatched(df, rounds = 4, batch = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      (1, "a", "b", 5L), (2, "c", "d", 3L),
      (3, "ab", "ab", 2L), (4, "c", "e", 2L))
    spark.sparkContext.getPersistentRDDs shouldBe empty
  }

  test("bpe train batched: single-symbol vocabulary degenerates to bpeTrain") {
    // with batch = 1 every round is exactly one argmax merge — the
    // sequential trainer's schedule
    val df = Seq((1L, "abab ab abab")).toDF("doc_id", "text")
    val seq = TextAnalysis.bpeTrain(df, numMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bat = TextAnalysis.bpeTrainBatched(df, rounds = 5, batch = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    bat.toSeq shouldBe seq.toSeq
  }

  test("bpe train adaptive: greedy matching keeps every disjoint pair the " +
    "round offers; batch0 = maxBatch = 1 degenerates to the sequential " +
    "trainer") {
    // greedy vs candidate-blocked on a crafted top list: ranked pairs
    // (a,b),(b,c),(c,d) — candidate rule keeps (a,b) and blocks BOTH
    // others ((b,c) shares b with rank 1; (c,d) shares c with the
    // already-BLOCKED rank 2). Greedy keeps (a,b), skips (b,c), then
    // keeps (c,d): symbols of a blocked candidate stay free.
    val df = Seq((1L, "abab abab abc abc cd")).toDF("doc_id", "text")
    // round-1 pair counts: (a,b)=4 from abab x2... craft instead via
    // direct frequency: ab appears most, bc next, cd next
    val crafted = Seq(
      (1L, "ab ab ab ab ab bc bc bc cd cd")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainAdaptive(crafted, rounds = 1, batch0 = 8,
      maxBatch = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1, "a", "b", 5L), (2, "c", "d", 2L))
    spark.sparkContext.getPersistentRDDs shouldBe empty
    // sequential degeneration: depth-1 candidate lists make the greedy
    // rule vacuous — the adaptive trainer IS bpeTrain
    val seq = TextAnalysis.bpeTrain(df, numMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val ada = TextAnalysis.bpeTrainAdaptive(df, rounds = 5, batch0 = 1,
      maxBatch = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    ada.toSeq shouldBe seq.toSeq
  }

  test("bpe encode: applies merges in rank order, one subword stream per doc") {
    // merges: (a,b) then (ab,ab). "ab cd aab" -> |ab| |c||d| |a||ab|
    // (second merge finds no |ab||ab| adjacency) -> "ab c d a ab"
    val df = Seq((1L, "ab cd aab"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(df, Seq(("a", "b"), ("ab", "ab")))
      .orderBy("doc_id").collect()
    (out(0).getLong(1), out(0).getString(2)) shouldBe ((5L, "ab c d a ab"))
    (out(1).getLong(1), out(1).getString(2)) shouldBe ((0L, ""))
    out(2).isNullAt(1) shouldBe true
    out(2).isNullAt(2) shouldBe true
  }

  test("scriptProfile: counts by code-point range, null text yields nulls") {
    val df = Seq(
      (1L, "plain ascii 42"),
      (2L, "caf\u00e9 \u041f\u0440\u0438\u0432\u0435\u0442"), // e-acute + Cyrillic
      (3L, "\u4f60\u597d \u0645\u0631"),  // CJK + Arabic
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(df).orderBy("doc_id").collect()
    // (latin, cyrillic, cjk, arabic, digit)
    (1 to 5).map(out(0).getLong) shouldBe Seq(10L, 0L, 0L, 0L, 2L)
    (1 to 5).map(out(1).getLong) shouldBe Seq(4L, 6L, 0L, 0L, 0L)
    (1 to 5).map(out(2).getLong) shouldBe Seq(0L, 0L, 2L, 2L, 0L)
    (1 to 5).foreach(i => out(3).isNullAt(i) shouldBe true)
  }

  test("bpe encode vocab path equals the fold path on tricky documents") {
    val docs = Seq(
      (1L, "ab cd aab"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "ab ab ab"),          // repeated words hit the vocab cache
      (5L, "Mixed CASE and 123 numbers"),
      (6L, "   whitespace   only   gaps  "),
      (7L, "!!! punctuation only ???")
    ).toDF("doc_id", "text")
    for (merges <- Seq(Seq(("a", "b"), ("ab", "ab")), Seq.empty[(String, String)])) {
      val fold = TextAnalysis.bpeEncode(docs, merges).orderBy("doc_id").collect()
      val vocab = TextAnalysis.bpeEncodeVocab(docs, merges).orderBy("doc_id").collect()
      withClue(s"merges=$merges: ") {
        vocab.map(_.toSeq).toSeq shouldBe fold.map(_.toSeq).toSeq
      }
    }
  }

  test("bpe encode round-trips bpeTrain's merges") {
    val df = Seq((1L, "abab ab abab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, numMerges = 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeEncode(df, merges).head
    (out.getLong(1), out.getString(2)) shouldBe ((3L, "abab ab abab"))
  }

  test("overlap spans: longest shared token run via the diagonal-island trick") {
    val docs = Seq(
      (1L, "x1 x2 c1 c2 c3 c4 c5 y1"),
      (2L, "z1 c1 c2 c3 c4 c5 z2 z3 z4"),
      (3L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val out = TextAnalysis.overlapSpans(docs, pairs, n = 3)
      .orderBy("a_id", "b_id").collect()
    // pair (1,2): shared run c1..c5 = 3 consecutive trigrams -> 5 tokens
    out.length shouldBe 1 // (1,3) shares no trigram at all -> no row
    (out(0).getLong(0), out(0).getLong(1)) shouldBe (1L, 2L)
    out(0).getAs[Long]("max_span_tokens") shouldBe 5L
    out(0).getAs[Long]("n_shared_positions") shouldBe 3L
  }

  test("freq spectrum counts distinct grams per occurrence count") {
    val df = Seq(
      (1L, "a a a b b c"),   // unigrams: a->3, b->2, c->1
      (2L, "c d")            // c->+1 => c:2, d:1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.freqSpectrum(df, n = 1).orderBy("freq")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    out shouldBe Array(1L -> 1L, 2L -> 2L, 3L -> 1L) // d:1 ; b,c:2 ; a:3
  }

  test("markup strip removes tags, decodes entities in order, collapses space") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "x &amp;lt; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b"),
      (3L, "plain text")).toDF("doc_id", "text")
    val out = TextAnalysis.stripMarkup(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    out(0) shouldBe (4L, "hello world")
    // &amp; decodes last: "&amp;lt;" is the LITERAL "&lt;", not "<"
    out(1) shouldBe (0L, "x &lt; y <tag> \"q\" 's' a b")
    out(2) shouldBe (0L, "plain text")
  }

  test("bm25 ranks matching docs; rare terms outweigh common ones") {
    val df = Seq(
      (1L, "cat dog bird fish mouse"),        // one 'cat'
      (2L, "cat cat dog bird fish"),          // two 'cat's -> higher
      (3L, "dog bird fish mouse mouse"),      // no query term
      (4L, "rare dog bird fish mouse"),       // 'rare' appears once in corpus
      (5L, "dog dog dog dog dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, Seq("cat", "rare"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(1L, 2L, 4L)      // only docs with a query term
    out(2L) should be > out(1L)              // higher tf wins
    out(4L) should be > out(1L)              // rarer term carries more idf
  }

  test("hash sampling is independent of split assignment") {
    // Unsalted, a 150-permille sample would select exactly the test+val
    // buckets of a 100/50 split — a debug sample with zero training rows.
    val df = (1L to 1000L).toDF("doc_id")
    val sampled = Sampling.sampleByHash(df, "doc_id", 150)
    val bySplit = Sampling.assignSplit(sampled, "doc_id", 100, 50)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySplit.getOrElse("train", 0L).toDouble shouldBe
      (sampled.count() * 0.85) +- (sampled.count() * 0.10)
  }

  test("stratified sampling applies per-stratum rates; full/zero rates are exact") {
    val df = (1L to 600L).map(i =>
      (i, if (i <= 200) "en" else if (i <= 400) "fr" else "zh"))
      .toDF("doc_id", "lang")
    val out = Sampling.sampleStratified(df, "doc_id", "lang",
      Map("en" -> 0, "zh" -> 1000), defaultPermille = 500)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.get("en") shouldBe None       // rate 0 -> dropped entirely
    out("zh") shouldBe 200L           // rate 1000 -> kept entirely
    out("fr").toDouble shouldBe 100.0 +- 45.0 // ~half of 200
    // per-key stability: a kept fr doc stays kept under a wider sample
    val kept = Sampling.sampleStratified(df, "doc_id", "lang",
      Map.empty, defaultPermille = 300).select("doc_id").as[Long].collect().toSet
    val wider = Sampling.sampleStratified(df, "doc_id", "lang",
      Map.empty, defaultPermille = 700).select("doc_id").as[Long].collect().toSet
    kept.subsetOf(wider) shouldBe true
  }

  test("top n-grams rank per language by distinct-document frequency") {
    val df = Seq(
      (1L, "a b a b", "en"), // distinct bigrams: "a b", "b a"
      (2L, "a b c", "en"),   // "a b", "b c"
      (3L, "x", "fr")        // < n tokens -> the whole string
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.topNgrams(df, n = 2, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    out should contain(("en", 1L, "a b", 2L)) // in both en docs
    out.filter(_._1 == "fr").map(_._3).toSeq shouldBe Seq("x")
    // per-doc distinct: doc 1's repeated "a b" counts once
    out.find(t => t._1 == "en" && t._3 == "a b").get._4 shouldBe 2L
  }

  test("PII redaction masks URLs, emails, and long digit runs with typed tokens") {
    val df = Seq(
      (1L, "mail me at a.b+c@test.org or see https://ex.org/p?q=1 id 12345678"),
      (2L, "digits 123456 stay; https://a.io/x@y.z eats the email inside it"),
      (3L, "clean text, nothing to redact")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_urls") shouldBe 1L
    out(1L).getAs[Long]("n_emails") shouldBe 1L
    out(1L).getAs[Long]("n_numbers") shouldBe 1L
    out(1L).getAs[String]("redacted") shouldBe
      "mail me at <EMAIL> or see <URL> id <NUM>"
    // 6 digits < minDigits=7 survives; the in-URL email is consumed by <URL>
    out(2L).getAs[Long]("n_emails") shouldBe 0L
    out(2L).getAs[String]("redacted") shouldBe
      "digits 123456 stay; <URL> eats the email inside it"
    out(3L).getAs[String]("redacted") shouldBe "clean text, nothing to redact"
  }

  test("winnowing: overlapping docs share fingerprints, unrelated docs none") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, shared),
      (2L, "unrelated prefix words then " + shared), // contains the full run
      (3L, "completely different content matching nothing else at all")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def of(id: Long) = fps.filter(_._1 == id).map(_._2).toSet
    // guarantee: any shared token run of length >= w + k - 1 = 6 shares
    // at least one selected fingerprint
    (of(1L) intersect of(2L)) should not be empty
    (of(1L) intersect of(3L)) shouldBe empty
    // winnowing stores fewer fingerprints than raw shingles (8 for doc 1)
    of(1L).size should be < 8
  }

  test("length quantiles: exact interpolated percentiles per language") {
    val df = Seq(
      (1L, "a", "en"), (2L, "a b", "en"), (3L, "a b c", "en"), (4L, "a b c d", "en"),
      (5L, "x", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lengthQuantiles(df).orderBy("lang").collect()
    // en lengths 1,2,3,4 -> p50 at (n-1)*0.5 = 1.5 -> 2.5 interpolated
    out(0).getAs[Double]("p50_tokens") shouldBe 2.5 +- 1e-9
    out(0).getAs[Long]("n_docs") shouldBe 4L
    out(1).getAs[Double]("p50_tokens") shouldBe 1.0 +- 1e-9
  }

  test("fingerprints: md5 matches normalization; rolling hash is stable and order-sensitive") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "world hello")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe out(2L) // case+whitespace normalization
    out(2L)._1 should not be out(3L)._1
    out(2L)._2 should not be out(3L)._2 // rolling hash sees order
  }

  test("tfidfPairs survives a degenerate repeated-term document (no ANSI overflow)") {
    // rare term repeated massively: tf 3e6 × idf_milli ~1099 gives
    // w_milli ~ 3.3e9, so w² ~ 1.1e19 > Long.MaxValue — squared in longs
    // this ARITHMETIC_OVERFLOWs under ANSI; the decimal route stays exact
    val blob = Seq.fill(3000000)("rareterm").mkString(" ")
    val df = Seq(
      (1L, blob + " shared"),
      (2L, "shared words here"),
      (3L, "other shared words")).toDF("doc_id", "text")
    val outDf = TextAnalysis.tfidfPairs(df, maxDf = 3L, minSim = 0.0)
    val out = outDf.collect()
    Dedup.releaseCheckpoints(outDf)
    out.foreach { r =>
      val s = r.getDouble(2)
      s should be >= 0.0
      s should be <= 1.000001
    }
  }

  test("charEntropy: zero for runs, exact bits for uniform alphabets") {
    val df = Seq(
      (1L, "aaaa"),     // one symbol -> 0 bits
      (2L, "ab"),       // two equiprobable -> 1 bit
      (3L, "abcd"),     // four equiprobable -> 2 bits
      (4L, "aab")       // H = -(2/3 log 2/3 + 1/3 log 1/3) = 0.9183
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out(1L) shouldBe (4L, 1L, 0L)
    out(2L) shouldBe (2L, 2L, 1000L)
    out(3L) shouldBe (4L, 4L, 2000L)
    out(4L) shouldBe (3L, 2L, 918L)
    // empty text is pinned to (0, 0, 0) regardless of dispatch path
    val empty = TextAnalysis.charEntropy(Seq((9L, "")).toDF("doc_id", "text"))
      .head()
    (empty.getLong(1), empty.getLong(2), empty.getLong(3)) shouldBe ((0L, 0L, 0L))
  }

  test("blocklist gate: case-insensitive token hits, keep flag at threshold") {
    val df = Seq(
      (1L, "clean text here"),
      (2L, "SPAM and more Spam spam"),
      (3L, "one spam only")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(df, Seq("spam"), maxHits = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out(1L) shouldBe (0L, true)
    out(2L) shouldBe (3L, false)
    out(3L) shouldBe (1L, true)
  }

  test("cdcChunks: boundaries are content-local - edits before a boundary " +
    "never move chunks after it") {
    // 'sort' hashes to 0 mod 8 over the portable family (a boundary
    // token); 'small'/'group'/'line'/'batch'/'data' do not
    val docs = Seq(
      (1L, "small group sort line batch"),
      (2L, "data data small group sort line batch") // edit BEFORE the boundary
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(docs, divisor = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: [small group sort][line batch]; doc 2 grows chunk 0 only
    out((1L, 0L))._1 shouldBe 3L
    out((1L, 1L))._1 shouldBe 2L
    out((2L, 0L))._1 shouldBe 5L
    // the chunk after the boundary is IDENTICAL across the edit
    out((2L, 1L)) shouldBe out((1L, 1L))
  }

  test("cdcChunks: trailing boundary yields no empty chunk; no boundary " +
    "yields one whole-doc chunk") {
    val docs = Seq(
      (1L, "small group sort"), // ends on a boundary
      (2L, "small group line")  // no boundary at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(docs, divisor = 8).collect()
      .groupBy(_.getLong(0))
    out(1L).map(_.getLong(2)).toSeq shouldBe Seq(3L)
    out(2L).map(_.getLong(2)).toSeq shouldBe Seq(3L)
  }

  test("encodingQuality counts each corruption signature and verdicts") {
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "caf\u00C3\u00A9 mojibake twice \u00C3\u00A8"),
      (3L, "bad\uFFFD repl and ctrl\u0007")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingQuality(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
    out(1L) shouldBe ((0L, 0L, 0L, true))
    out(2L) shouldBe ((0L, 0L, 2L, false))
    out(3L) shouldBe ((1L, 1L, 0L, false))
  }


  test("cdcDedupChunks: first corpus occurrence of a chunk wins; exact-dup " +
    "doc loses everything to its twin") {
    // 'sort' is a boundary token (mod 8); docs 1 and 3 are exact dups,
    // doc 2 shares only the first chunk with doc 1
    val docs = Seq(
      (1L, "small group sort line batch"),
      (2L, "small group sort data data"),
      (3L, "small group sort line batch")
    ).toDF("doc_id", "text")
    val outDf = TextAnalysis.cdcDedupChunks(docs, divisor = 8)
    val out = outDf
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // ownership protocol: the caller frees the decision-side checkpoint
    // the returned plan pins (CleanSessionCheck asserts no leaked blocks)
    Dedup.releaseCheckpoints(outDf)
    out(1L) shouldBe ((2L, 2L, "small group sort line batch"))
    // doc 2: chunk [small group sort] seen in doc 1 -> only the tail survives
    out(2L) shouldBe ((2L, 1L, "data data"))
    // doc 3: every chunk seen earlier -> empty but row kept
    out(3L) shouldBe ((2L, 0L, ""))
  }

}
