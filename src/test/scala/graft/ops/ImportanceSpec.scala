package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ImportanceSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("importance weights favor documents that look like the target slice") {
    // target (en) talks about cats; off-target (de) about stocks; the
    // probe docs each use one vocabulary exclusively
    val docs = Seq(
      (1L, "en", "the cat sat on the mat with the cat"),
      (2L, "en", "a cat and the mat and a cat again"),
      (3L, "de", "stock price index fund yield curve"),
      (4L, "de", "bond yield stock fund price index"),
      (5L, "zz", "the cat sat on the mat"), // cat-like: should score high
      (6L, "zz", "stock fund yield price")  // stock-like: should score low
    ).toDF("doc_id", "lang", "text")
    val out = Importance.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // absolute signs depend on corpus-size smoothing; the ORDER is the
    // contract: cat-flavored probe above stock-flavored probe, and the
    // in-target docs above the off-target docs
    out(5L) should be > out(6L)
    out(1L) should be > out(3L)
    out(2L) should be > out(4L)
  }

  test("n_feats counts bigram occurrences (tokens - 1)") {
    val docs = Seq((1L, "en", "a b c d"), (2L, "en", "x")).toDF("doc_id", "lang", "text")
    val out = Importance.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 3L  // 4 tokens -> 3 bigrams
    out(2L) shouldBe 1L  // short doc degrades to the whole-text shingle
  }

  test("unigram surprisal: rare-token docs score higher; exact integer mean") {
    val docs = Seq(
      (1L, "the the the the"),          // all common tokens
      (2L, "the zyzzyva qoph xylyl")    // three hapaxes
    ).toDF("doc_id", "text")
    val out = Importance.unigramSurprisal(docs)
      .orderBy("doc_id").collect()
    val common = out(0); val rare = out(1)
    common.getAs[Long]("n_tokens") shouldBe 4L
    rare.getAs[Long]("avg_micro") should be > common.getAs[Long]("avg_micro")
    // 'the' occurs 5 times of 8 total: s = round(ln(8/5) * 1e6); doc1 = 4 of them
    val sThe = BigDecimal(math.log(8.0 / 5.0) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    common.getAs[Long]("sum_micro") shouldBe 4L * sThe
    common.getAs[Long]("avg_micro") shouldBe sThe
  }

  test("scores are an exact sum: doubling a document's features doubles nothing unseen") {
    // one doc repeated twice under different ids must get IDENTICAL scores
    val docs = Seq(
      (1L, "en", "the cat sat"), (2L, "en", "the cat sat"),
      (3L, "de", "stock fund yield")
    ).toDF("doc_id", "lang", "text")
    val out = Importance.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").collect().map(r => r.getLong(2))
    out(0) shouldBe out(1)
  }

  test("bigram surprisal: exact interpolated scores; single-token and NULL docs keep rows") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a"),
      (3L, "b a b"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Importance.bigramSurprisal(docs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def q(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lam = 700000L / 1e6
    // uni: a=4, b=4, ''=1 (the NULL doc's empty token) of N=9
    // pairs: (a,b)=3, (b,a)=2
    val sAb = q(-math.log(lam * (3.0 / 4) + (1.0 - lam) * (4.0 / 9)))
    val sBa = q(-math.log(lam * (2.0 / 4) + (1.0 - lam) * (4.0 / 9)))
    val sA = q(math.log(9.0 / 4))
    val sEmpty = q(math.log(9.0 / 1))
    out(1L).getAs[Long]("n_tokens") shouldBe 4L // 1 first + 3 bigrams
    out(1L).getAs[Long]("sum_micro") shouldBe sA + 2 * sAb + sBa
    // single-token doc: unigram term only, no bigram context
    out(2L).getAs[Long]("n_tokens") shouldBe 1L
    out(2L).getAs[Long]("sum_micro") shouldBe sA
    out(2L).getAs[Long]("avg_micro") shouldBe sA
    out(3L).getAs[Long]("sum_micro") shouldBe sA + sBa + sAb // s_b = s_a
    // NULL text keeps its row as the empty token (one-row-per-doc contract)
    out(4L).getAs[Long]("n_tokens") shouldBe 1L
    out(4L).getAs[Long]("sum_micro") shouldBe sEmpty
    // boilerplate signal: corpus-frequent bigrams score LOW even though
    // every unigram is equally common — doc1's mean under the bigram
    // model sits below its unigram surprisal
    out(1L).getAs[Long]("avg_micro") should be < sA
  }

  test("NULL-text docs keep their row like empty-text docs (no silent drop)") {
    val docs = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", null.asInstanceOf[String]),
      (3L, "en", "")
    ).toDF("doc_id", "lang", "text")
    Importance.importanceWeights(docs, col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(1L, 2L, 3L)
    Importance.unigramSurprisal(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(1L, 2L, 3L)
  }

  test("trigram stupid backoff: every tier fires and totals are exact " +
    "micro sums (hand-computed)") {
    // train = doc 0 ("a b c a b c"): c_abc=2, c_ab=c_bc=2, c_ca=1,
    // c_a=c_b=c_c=2, N=6, V=3. Scored doc 1 ("a b c b c x") exercises
    // tier1 (abc), tier2 (cbc via bigram bc), tier3 seen-unigram (bcb:
    // bigram cb unseen, c_b=2) and tier3 OOV (bcx: c_x=0).
    val docs = Seq(
      (0L, "a b c a b c"),
      (1L, "a b c b c x")).toDF("doc_id", "text")
    val out = Importance.trigramBackoffSurprisal(
      docs, trainPred = col("doc_id") === 0)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0 under its own counts: first a = -ln(3/9), bca = -ln(1/2),
    // everything else ln(1) = 0
    out(0L) shouldBe ((6L, 1098612L + 693147L))
    // doc 1: -ln(3/9) + 0 + 0 + tier3(c_b=2) + tier2(0.4*2/2) + tier3(OOV)
    out(1L) shouldBe ((6L, 1098612L + 2931194L + 916291L + 4029806L))
  }

  test("perplexity buckets: per-language terciles follow the value " +
    "rule, native sketch ≡ portable twin, gibberish lands in tail") {
    // two "languages" with six docs each (evens train); within each,
    // fluent docs repeat trained phrases, gibberish docs carry unseen
    // tokens — surprisal must separate them and the tercile thresholds
    // must follow the integer-exact value rule
    val docs = Seq(
      (0L, "aa", "the cat sat on the mat the cat sat on the mat"),
      (2L, "aa", "the dog sat on the mat the dog sat on the rug"),
      (4L, "aa", "a cat and a dog sat on a mat and a rug"),
      (1L, "aa", "the cat sat on the mat the cat sat on the mat"),
      (3L, "aa", "zq wx kj qq zz plor gnar blip"),
      (5L, "aa", "the cat zq wx on kj mat"),
      (10L, "bb", "alpha beta gamma alpha beta gamma alpha beta"),
      (12L, "bb", "beta gamma delta beta gamma delta beta gamma"),
      (14L, "bb", "alpha delta beta gamma alpha delta"),
      (11L, "bb", "alpha beta gamma alpha beta gamma"),
      (13L, "bb", "xx yy zz ww vv uu"),
      (15L, "bb", "alpha xx beta yy gamma")).toDF("doc_id", "lang", "text")
    val even = pmod(col("doc_id"), lit(2)) === 0
    val exact = Importance.perplexityBuckets(docs, even, native = false)
      .orderBy("doc_id").collect()
    val nat = Importance.perplexityBuckets(docs, even, native = true)
      .orderBy("doc_id").collect()
    nat.map(_.toSeq) shouldBe exact.map(_.toSeq)
    exact.length shouldBe 12
    val byLang = exact.groupBy(_.getString(1))
    byLang.keySet shouldBe Set("aa", "bb")
    for ((_, rows) <- byLang) {
      // replay the threshold rule: t_p = smallest observed avg_micro
      // whose cumulative row count reaches p‰ of the language
      val n = rows.length
      val sorted = rows.map(_.getLong(3)).sorted
      def thr(p: Int): Long = sorted.distinct
        .find(v => sorted.count(_ <= v).toLong * 1000 >= p.toLong * n).get
      val (t333, t667) = (thr(333), thr(667))
      rows.foreach { r =>
        val v = r.getLong(3)
        val expect =
          if (v <= t333) "head" else if (v <= t667) "middle" else "tail"
        r.getString(4) shouldBe expect
      }
      rows.map(_.getString(4)).toSet shouldBe Set("head", "middle", "tail")
    }
    // the all-unseen docs must be their language's worst bucket
    exact.find(_.getLong(0) == 3L).get.getString(4) shouldBe "tail"
    exact.find(_.getLong(0) == 13L).get.getString(4) shouldBe "tail"
  }

  test("naive bayes quality: OOV-only doc scores prior + n*unseen " +
    "(hand-computed micro constants)") {
    // train: d1/d2 positive (6 tokens), d3 negative (3 tokens); shared
    // vocab V=7. Held-out d4 is all-OOV: score must be exactly
    // prior + 2*unseen with prior = round(ln(2/1)*1e6) = 693147 and
    // unseen = round(ln((3+7)/(6+7))*1e6) = -262364.
    val docs = Seq(
      (1L, 1, true, "good clean prose"),
      (2L, 1, true, "clean text here"),
      (3L, 0, true, "spam spam offer"),
      (4L, 1, false, "zzz yyy")).toDF("doc_id", "label", "is_train", "text")
    val out = Importance.naiveBayesQuality(
      docs, labelPred = col("label") === 1, trainPred = col("is_train"))
      .orderBy("doc_id").collect()
    val d4 = out.find(_.getLong(0) == 4L).get
    d4.getAs[Long]("n_tokens") shouldBe 2L
    d4.getAs[Long]("score_micro") shouldBe (693147L + 2L * -262364L)
    d4.getAs[Int]("pred") shouldBe 1
    // a train doc dominated by the spam marker classifies negative:
    // llr("spam") = ln(1/13) - ln(3/10) < 0, twice, plus "offer"
    out.find(_.getLong(0) == 3L).get.getAs[Int]("pred") shouldBe 0
  }

  test("naive bayes quality: held-out spam/clean separation is perfect " +
    "on the synthesized-boilerplate shape") {
    // mirrors q_quality_nb: every doc shares a clean base vocabulary;
    // doc_id%3==0 docs get marker tails (negative class); train on the
    // even half, judge ONLY the held-out odd half
    val docs = (0L until 60L).map { i =>
      val base = s"the quick brown fox tok${i % 7} jumps over the lazy dog"
      val text =
        if (i % 3 == 0) base + " free click winner prize" * (1 + (i % 4)).toInt
        else base
      (i, text)
    }.toDF("doc_id", "text")
    val out = Importance.naiveBayesQuality(docs,
      labelPred = pmod(col("doc_id"), lit(3)) =!= 0,
      trainPred = pmod(col("doc_id"), lit(2)) === 0)
      .filter(pmod(col("doc_id"), lit(2)) === 1) // held-out only
      .collect()
    out.length shouldBe 30
    // perfect precision AND recall on held-out docs: marker tokens are
    // decisive evidence, base tokens + the ln(2) prior keep clean docs
    // positive
    out.foreach { r =>
      r.getAs[Int]("pred") shouldBe r.getAs[Int]("label")
    }
  }

  test("lm serving: un-pruned export scores exactly like the batch " +
    "trigram scorer, native and fallback") {
    // the trigram spec's corpus: train = doc 0; doc 1 exercises every
    // tier (tri hit, bigram tier, unigram floor, OOV); doc 2 is all-OOV
    val docs = Seq(
      (0L, "a b c a b c"),
      (1L, "a b c b c x"),
      (2L, "zz yy")).toDF("doc_id", "text")
    val train = col("doc_id") === 0
    val batch = Importance.trigramBackoffSurprisal(docs, train)
      .orderBy("doc_id").collect().map(_.toSeq)
    val model = Importance.trainLmServing(docs, train)
    for (native <- Seq(false, true)) {
      val served = Importance.lmServingScored(docs, model, native = native)
        .orderBy("doc_id").collect().map(_.toSeq)
      withClue(s"native=$native: ") { served shouldBe batch }
    }
  }

  test("lm serving: a pruned trigram falls to the NEXT backoff tier, " +
    "never the OOV cliff (hand-computed)") {
    // train trigrams of "a b c a b c": abc ×2, bca ×1, cab ×1. maxTri=2
    // keeps abc (count 2) and bca (count-1 tie broken by key: b < c);
    // cab is DROPPED, so position 5 of doc 0 must score the C tier
    // α·c_ab/c_a = 0.4 → 916291 micro — NOT an OOV constant.
    //   pos1 a: -ln(3/9) = 1098612;  pos2 (a,b): -ln(2/2) = 0
    //   abc: 0;  bca: -ln(1/2) = 693147;  cab→C(a,b): 916291;  abc: 0
    val docs = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val model = Importance.trainLmServing(docs, lit(true), maxTri = 2)
    model.keys.count(_.startsWith("T")) shouldBe 2
    for (native <- Seq(false, true)) {
      val out = Importance.lmServingScored(docs, model, native = native)
        .collect().head
      withClue(s"native=$native: ") {
        out.getLong(1) shouldBe 6L
        out.getLong(2) shouldBe (1098612L + 693147L + 916291L)
      }
    }
  }

  test("lm serving: maxUni prunes the unigram tier to a cap-bounded " +
    "artifact; dropped words floor to the per-position OOV constants") {
    // train "a a a b": uni a×3, b×1. maxUni=1 keeps only a (most
    // frequent); maxBig=1 keeps (a,a)×2 over (a,b)×1. b is absent from
    // every unigram-tier table (U/F/G), so a b-only doc scores pure OOV
    // at each position — the unigram tier's "next tier" IS the OOV
    // constant, by design.
    val docs = Seq((0L, "a a a b")).toDF("doc_id", "text")
    val model = Importance.trainLmServing(docs, lit(true),
      maxUni = 1, maxBig = 1)
    model.keys.count(_.startsWith("U")) shouldBe 1
    model.keys.size shouldBe (3 + 2 + model.keys.count(_.startsWith("T")))
    val probe = Seq((0L, "b b b")).toDF("doc_id", "text")
    for (native <- Seq(false, true)) {
      val out = Importance.lmServingScored(probe, model, native = native)
        .collect().head
      withClue(s"native=$native: ") {
        out.getLong(2) shouldBe (model.oov1 + model.oov2 + model.oov3)
      }
    }
  }

  test("lm serving: a train token carrying the U+0001 key separator " +
    "fails LOUDLY at train time; at serve time it can only miss") {
    val sep = graft.plans.LmScore.Sep
    val bad = Seq((0L, s"a x${sep}y a")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Importance.trainLmServing(bad, lit(true))
    }
    ex.getMessage should include("U+0001")
    // clean model + Sep-carrying QUERY token: the composite key's part
    // count matches no trained key in its tier, so it scores exactly
    // like any unseen token — never another n-gram's score
    val clean = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val model = Importance.trainLmServing(clean, lit(true))
    for (native <- Seq(false, true)) {
      val smuggled = Importance.lmServingScored(
        Seq((0L, s"a${sep}b qq rr")).toDF("doc_id", "text"),
        model, native = native).collect().head.getLong(2)
      val unseen = Importance.lmServingScored(
        Seq((0L, "pp qq rr")).toDF("doc_id", "text"),
        model, native = native).collect().head.getLong(2)
      withClue(s"native=$native: ") { smuggled shouldBe unseen }
    }
  }

  test("ppl thresholds: NULL group rows are dropped from the shipped " +
    "table (no NPE) and bucket as tail at serving") {
    val corpus = Seq(
      (0L, Some("aa"), "a b c a b c"),
      (1L, Some("aa"), "a b c b c x"),
      (2L, None, "zz yy zz yy"),
      (3L, Some("aa"), "p q r p q r")).toDF("doc_id", "lang", "text")
    val model = Importance.trainLmServing(corpus, col("doc_id") === 0)
    val thr = Importance.trainPplThresholds(corpus, model, native = true)
    thr.map(_._1) shouldBe Seq("aa") // null group absent, no NPE
    val served = Importance.perplexityBucketsServing(
      corpus, model, thr, native = true).orderBy("doc_id").collect()
    served(2).getString(1) shouldBe null
    served(2).getString(4) shouldBe "tail"
  }

  test("lm serving scores a memory stream identically to batch " +
    "(one stateless projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (0L, "a b c a b c"),
      (1L, "a b c b c x")).toDF("doc_id", "text")
    val model = Importance.trainLmServing(corpus, col("doc_id") === 0)
    val batch = Importance.lmServingScored(corpus, model, native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    val mem = MemoryStream[(Long, String)](spark)
    val q = Importance.lmServingScored(
      mem.toDF.toDF("doc_id", "text"), model, native = true)
      .writeStream.format("memory").queryName("lm_serve")
      .outputMode("append").start()
    mem.addData((0L, "a b c a b c"))
    q.processAllAvailable()
    mem.addData((1L, "a b c b c x"))
    q.processAllAvailable()
    val streamed = spark.table("lm_serve").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    q.stop()
    spark.sql("DROP TABLE IF EXISTS lm_serve")
    streamed shouldBe batch
  }

  test("nb serving: un-pruned export scores exactly like the batch " +
    "classifier, native and fallback") {
    val docs = (0L until 60L).map { i =>
      val base = s"the quick brown fox tok${i % 7} jumps over the lazy dog"
      val text =
        if (i % 3 == 0) base + " free click winner prize" * (1 + (i % 4)).toInt
        else base
      (i, text)
    }.toDF("doc_id", "text")
    val label = pmod(col("doc_id"), lit(3)) =!= 0
    val train = pmod(col("doc_id"), lit(2)) === 0
    val batch = Importance.naiveBayesQuality(docs, label, train)
      .orderBy("doc_id").collect().map(_.toSeq)
    val model = Importance.trainNbServing(docs, label, train)
    for (native <- Seq(false, true)) {
      val served = Importance.nbServingScored(docs, model, label, native = native)
        .orderBy("doc_id").collect().map(_.toSeq)
      withClue(s"native=$native: ") { served shouldBe batch }
    }
  }

  test("nb serving: pruning drops weak tokens to the OOV constant " +
    "(hand-computed)") {
    // same counts as the OOV test: V=7, n_pos=6, n_neg=3, prior=693147,
    // unseen=-262364. |llr| is maximal for "spam" (-1360977), so a
    // 1-entry export keeps exactly it; every other token now scores the
    // OOV constant.
    val docs = Seq(
      (1L, 1, true, "good clean prose"),
      (2L, 1, true, "clean text here"),
      (3L, 0, true, "spam spam offer"),
      (4L, 1, false, "zzz yyy")).toDF("doc_id", "label", "is_train", "text")
    val model = Importance.trainNbServing(
      docs, labelPred = col("label") === 1, trainPred = col("is_train"),
      maxEntries = 1)
    model.words shouldBe Seq("spam")
    model.scores shouldBe Seq(-1360977L)
    model.unseenMicro shouldBe -262364L
    model.priorMicro shouldBe 693147L
    val out = Importance.nbServingScored(
      docs, model, labelPred = col("label") === 1, native = true)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("score_micro")).toMap
    out(1L) shouldBe (693147L + 3L * -262364L)   // all pruned -> OOV
    out(3L) shouldBe (693147L + 2L * -1360977L + -262364L)
  }

  test("nb serving scores a memory stream identically to batch " +
    "(one stateless projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = Importance.NbServing(
      Seq("good", "spam"), Seq(1000000L, -2000000L), -500000L, 100000L)
    val rows = Seq((1L, "good spam"), (2L, "other stuff"), (3L, "good good"))
    val mem = MemoryStream[(Long, String)](spark)
    val stream = mem.toDF.toDF("doc_id", "text")
    val q = Importance.nbServingScored(
      stream, model, labelPred = lit(true), native = true)
      .writeStream.format("memory").queryName("nb_serve")
      .outputMode("append").start()
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("nb_serve").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    q.stop()
    spark.sql("DROP TABLE IF EXISTS nb_serve")
    val batch = Importance.nbServingScored(
      rows.toDF("doc_id", "text"), model, labelPred = lit(true), native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    streamed shouldBe batch
    // hand-check one: doc 1 = good(+1e6) + spam(-2e6) + prior(1e5)
    batch(0)(3) shouldBe -900000L
  }

  test("naive bayes langid: hand-computed scores, OOV collapse, and " +
    "prior-only tie-break") {
    // train: one doc per class, one bigram each; V=2, n_aa=n_bb=1,
    // priors ln(1)=0. Held-out doc 4 ("xy"): score_aa = ln(2/3) =
    // -405465 beats score_bb = unseen ln(1/3) = -1098612. Doc 3 has no
    // bigrams -> prior-only tie -> lexicographic tie-break picks "aa".
    val docs = Seq(
      (1L, "aa", true, "xy"),
      (2L, "bb", true, "zw"),
      (3L, "aa", false, "q"),
      (4L, "aa", false, "xy")).toDF("doc_id", "lang", "is_train", "text")
    val out = Importance.naiveBayesLangId(
      docs, labelCol = "lang", trainPred = col("is_train"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getAs[Long]("score_micro"), r.getAs[Int]("ok")))).toMap
    out(4L) shouldBe (("aa", -405465L, 1))
    out(3L) shouldBe (("aa", 0L, 1))    // prior-only, tie broken to "aa"
    out(1L)._1 shouldBe "aa"            // train docs classify themselves
    out(2L)._1 shouldBe "bb"
  }

  test("nb langid serving: un-pruned export matches the batch " +
    "classifier, native and fallback, and streams identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0L until 36L).map { i =>
      val lang = Seq("de", "en", "zh")((i % 3).toInt)
      val body = s"word tok${i % 5} line data"
      val text = lang match {
        case "de" => body.map {
          case 'a' => 'ä'; case 'o' => 'ö'; case 'u' => 'ü'
          case c => c
        }
        case "zh" => body.map(c =>
          if (c >= 'a' && c <= 'z') (0x4E00 + (c - 'a')).toChar else c)
          .filterNot(_ == ' ')
        case _ => body
      }
      (i, lang, text)
    }
    val docs = rows.toDF("doc_id", "lang", "text")
    val train = pmod(col("doc_id"), lit(2)) === 0
    val batch = Importance.naiveBayesLangId(docs, "lang", train)
      .orderBy("doc_id").collect().map(_.toSeq)
    val model = Importance.trainNbLangServing(docs, "lang", train)
    model.classes.map(_._1) shouldBe Seq("de", "en", "zh")
    for (native <- Seq(false, true)) {
      val served = Importance.nbLangServingScored(
        docs, model, "lang", native = native)
        .orderBy("doc_id").collect().map(_.toSeq)
      withClue(s"native=$native: ") { served shouldBe batch }
    }
    // the same projection over a MemoryStream emits the same rows
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = Importance.nbLangServingScored(
      mem.toDF.toDF("doc_id", "lang", "text"), model, "lang", native = true)
      .writeStream.format("memory").queryName("nb_lang_serve")
      .outputMode("append").start()
    mem.addData(rows.take(5): _*)
    q.processAllAvailable()
    val streamed = spark.table("nb_lang_serve").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    q.stop()
    spark.sql("DROP TABLE IF EXISTS nb_lang_serve")
    streamed shouldBe batch.take(5)
  }

  test("nb langid serving: per-class pruning floors dropped grams to " +
    "the class OOV constant") {
    // two classes, tiny vocab; prune to ONE gram per class (the most
    // frequent, ties by gram asc) and hand-check a served score
    val docs = Seq(
      (1L, "aa", true, "xyxy"),   // grams xy,yx,xy -> xy c=2, yx c=1
      (2L, "bb", true, "zwzw"),
      (3L, "aa", false, "yx")).toDF("doc_id", "lang", "is_train", "text")
    val model = Importance.trainNbLangServing(
      docs, "lang", col("is_train"), maxEntriesPerClass = 1)
    val aa = model.classes.toMap.apply("aa")
    aa.words shouldBe Seq("xy") // kept: highest likelihood in class
    // doc 3 "yx": its one gram was pruned from aa's table -> scores
    // aa's OOV constant; batch would have scored yx's real llr
    val out = Importance.nbLangServingScored(docs, model, "lang", native = true)
      .filter(col("doc_id") === 3).collect()(0)
    // n_aa=3 grams, V=4 distinct -> unseen_aa = ln(1/7); prior ln(1)=0
    out.getAs[Long]("score_micro") shouldBe
      math.round(math.log(1.0 / 7.0) * 1e6)
  }

  test("nb model persistence: parquet round-trip restores both model " +
    "kinds exactly; truncation fails loudly") {
    val docs = Seq(
      (1L, "aa", true, "xy xy zz"),
      (2L, "bb", true, "pq rs tt"),
      (3L, "aa", false, "xy")).toDF("doc_id", "lang", "is_train", "text")
    val dir = java.nio.file.Files.createTempDirectory("nb-model").toString
    val m = Importance.trainNbServing(
      docs, labelPred = col("lang") === "aa", trainPred = col("is_train"))
    Importance.writeNbModel(spark, m, dir)
    Importance.readNbModel(spark, dir) shouldBe m
    // serve-after-read ≡ serve-before (same artifact, same projection)
    val before = Importance.nbServingScored(
      docs, m, labelPred = col("lang") === "aa", native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    val after = Importance.nbServingScored(
      docs, Importance.readNbModel(spark, dir),
      labelPred = col("lang") === "aa", native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    after shouldBe before
    val lm = Importance.trainNbLangServing(docs, "lang", col("is_train"))
    val ldir = java.nio.file.Files.createTempDirectory("nb-langmodel").toString
    Importance.writeNbLangModel(spark, lm, ldir)
    Importance.readNbLangModel(spark, ldir) shouldBe lm
    // a truncated entries file must not serve a silently weaker model
    import spark.implicits._
    Seq((m.unseenMicro, m.priorMicro, m.words.size.toLong + 1))
      .toDF("unseen_micro", "prior_micro", "n_entries")
      .write.mode("overwrite").parquet(s"$dir/meta")
    an[IllegalArgumentException] should be thrownBy
      Importance.readNbModel(spark, dir)
  }

  test("ppl bucket serving: shipped thresholds bucket a stream exactly " +
    "like batch; unknown groups fall to tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (0L, "aa", "a b c a b c"),
      (1L, "aa", "a b c b c x"),
      (2L, "aa", "zz yy zz yy"),
      (3L, "bb", "p q r p q r"),
      (4L, "bb", "p q r q r s"),
      (5L, "bb", "ww vv ww vv")).toDF("doc_id", "lang", "text")
    val model = Importance.trainLmServing(corpus, pmod(col("doc_id"), lit(2)) === 0)
    val thr = Importance.trainPplThresholds(corpus, model, native = true)
    thr.map(_._1) shouldBe Seq("aa", "bb")
    val batch = Importance.perplexityBucketsServing(
      corpus, model, thr, native = true)
      .orderBy("doc_id").collect()
    batch.length shouldBe 6
    // replay the value rule against the served scores
    val scores = Importance.lmServingScored(corpus, model,
        native = true, keep = Seq("lang"))
      .select("doc_id", "lang", "avg_micro").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = scores.groupBy(_._2)
    batch.foreach { r =>
      val (lang, v) = (r.getString(1), r.getLong(3))
      val vals = byLang(lang).map(_._3).sorted
      def t(p: Int) = vals.distinct.find(x =>
        vals.count(_ <= x).toLong * 1000 >= p.toLong * vals.length).get
      val expect =
        if (v <= t(333)) "head" else if (v <= t(667)) "middle" else "tail"
      r.getString(4) shouldBe expect
    }
    // a group with NO shipped threshold buckets conservatively as tail
    val zz = Importance.perplexityBucketsServing(
      Seq((9L, "zz", "a b c")).toDF("doc_id", "lang", "text"),
      model, thr, native = true).collect()
    zz.head.getString(4) shouldBe "tail"
    // the same projection over a MemoryStream emits the same rows
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = Importance.perplexityBucketsServing(
      mem.toDF.toDF("doc_id", "lang", "text"), model, thr, native = true)
      .writeStream.format("memory").queryName("ppl_serve")
      .outputMode("append").start()
    mem.addData((0L, "aa", "a b c a b c"), (3L, "bb", "p q r p q r"))
    q.processAllAvailable()
    val streamed = spark.table("ppl_serve").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    q.stop()
    spark.sql("DROP TABLE IF EXISTS ppl_serve")
    streamed shouldBe batch.filter(r => Set(0L, 3L)(r.getLong(0))).map(_.toSeq)
  }

  test("lm model persistence: parquet round-trip restores the exact " +
    "model; truncation fails loudly") {
    val docs = Seq(
      (0L, "a b c a b c"),
      (1L, "a b c b c x")).toDF("doc_id", "text")
    val m = Importance.trainLmServing(docs, col("doc_id") === 0)
    val dir = java.nio.file.Files.createTempDirectory("lm-model").toString
    Importance.writeLmModel(spark, m, dir)
    Importance.readLmModel(spark, dir) shouldBe m
    // serve-after-read ≡ serve-before (same artifact, same projection)
    val before = Importance.lmServingScored(docs, m, native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    val after = Importance.lmServingScored(
      docs, Importance.readLmModel(spark, dir), native = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    after shouldBe before
    // a truncated entries file must not serve a silently weaker model
    import spark.implicits._
    Seq((m.oov1, m.oov2, m.oov3, m.keys.size.toLong + 1))
      .toDF("oov1_micro", "oov2_micro", "oov3_micro", "n_entries")
      .write.mode("overwrite").parquet(s"$dir/meta")
    an[IllegalArgumentException] should be thrownBy
      Importance.readLmModel(spark, dir)
  }

  test("naive bayes langid: orthography-localized classes separate on " +
    "held-out docs") {
    // mirrors q_langid_nb's shape: per-class orthography markers
    // (umlauts vs CJK vs plain) make char bigrams decisive
    val docs = (0L until 48L).map { i =>
      val lang = Seq("de", "en", "zh")((i % 3).toInt)
      val body = s"word tok${i % 5} line data"
      val text = lang match {
        case "de" => body.map {
          case 'a' => 'ä'; case 'o' => 'ö'; case 'u' => 'ü'
          case c => c
        }
        case "zh" => body.map(c =>
          if (c >= 'a' && c <= 'z') (0x4E00 + (c - 'a')).toChar else c)
          .filterNot(_ == ' ')
        case _ => body
      }
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = Importance.naiveBayesLangId(docs, labelCol = "lang",
      trainPred = pmod(col("doc_id"), lit(2)) === 0)
      .filter(pmod(col("doc_id"), lit(2)) === 1)
      .collect()
    out.length shouldBe 24
    out.foreach(r => r.getAs[Int]("ok") shouldBe 1)
  }

}
