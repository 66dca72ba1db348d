package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests over randomized corpora for the operators whose
  * correctness is an INVARIANT, not a point case: permutation-ness of the
  * deterministic shuffle, two-phase-vs-window equality of quota capping,
  * line conservation of line dedup, and bloom/exact decontamination
  * equality. ScalaCheck `Gen` is driven with deterministic seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath), so every
  * run sees the same corpora.
  */
class OpsPropSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(seed + i)))

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val sentence = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("shuffleOrder is a permutation of 1..N for arbitrary key sets and bucket counts") {
    for (buckets <- Seq(1, 7, 64); seed <- Seq(11L, 42L)) {
      val keys = samples(Gen.chooseNum(0L, 100000L), 150, seed).distinct
      val df = keys.map(Tuple1(_)).toDF("doc_id")
      val pos = Sampling.shuffleOrder(df, "doc_id", buckets)
        .select("shuffle_pos").as[Long].collect().sorted
      withClue(s"buckets=$buckets seed=$seed: ")(
        pos.toSeq shouldBe (1L to keys.length))
    }
  }

  test("capPerGroup equals the single-window formulation on random skewed data") {
    import org.apache.spark.sql.expressions.Window
    val rows = samples(
      Gen.zip(Gen.chooseNum(1L, 400L), Gen.oneOf("a", "b", "c", "hot"),
        Gen.chooseNum(0L, 50L)),
      250, 7L).distinctBy(_._1)
    val df = rows.toDF("doc_id", "source", "n_chars")
    for (cap <- Seq(1, 5, 40)) {
      val twoPhase = CorpusOps.capPerGroup(df, "source", "n_chars", cap)
        .select("doc_id").as[Long].collect().sorted
      val oneWindow = df.withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))))
        .filter(col("rk") <= cap).select("doc_id").as[Long].collect().sorted
      withClue(s"cap=$cap: ")(twoPhase shouldBe oneWindow)
    }
  }

  test("WavDecoder round-trips arbitrary PCM: synthesize container -> parse -> same facts") {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val pcmGen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(2 * n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    val rateGen = Gen.oneOf(8000, 16000, 22050, 44100, 48000)
    val chGen = Gen.chooseNum(1, 4)
    for (seed <- 0L until 40L) {
      val pcm = samples(pcmGen, 1, seed).head.map(_.toByte).toArray
      val rate = samples(rateGen, 1, seed + 1000).head
      val ch = samples(chGen, 1, seed + 2000).head
      val payload =
        "RIFF".getBytes("US-ASCII") ++ le32(36 + pcm.length) ++
          "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++
          le16(1) ++ le16(ch) ++ le32(rate) ++
          le32(rate * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
          "data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm
      val info = Multimodal.WavDecoder.parse(payload)
      withClue(s"seed=$seed rate=$rate ch=$ch n=${pcm.length}: ") {
        // sub-44-byte containers (empty data) still parse; all facts exact
        val w = info.get
        w.sampleRate shouldBe rate
        w.channels shouldBe ch
        w.bitsPerSample shouldBe 16
        w.dataLen shouldBe pcm.length
        payload.slice(w.dataOffset, w.dataOffset + w.dataLen) shouldBe pcm
        // any single-byte truncation of the data chunk must reject, not
        // half-parse (the fallback contract)
        if (pcm.length > 0)
          Multimodal.WavDecoder.parse(payload.dropRight(1)) shouldBe None
      }
    }
  }

  test("cellsFor: ceiling sizing, never zero, clamps to Int range") {
    Similarity.cellsFor(0L) shouldBe 1
    Similarity.cellsFor(1L) shouldBe 1
    Similarity.cellsFor(4096L) shouldBe 1
    Similarity.cellsFor(4097L) shouldBe 2
    Similarity.cellsFor(1000L, 100L) shouldBe 10
    Similarity.cellsFor(1001L, 100L) shouldBe 11
    Similarity.cellsFor(Long.MaxValue, 1L) shouldBe Int.MaxValue
    // the scale invariant: per-cell population never exceeds the target
    for (n <- Seq(1L, 999L, 123457L, 10000000L); t <- Seq(64L, 4096L)) {
      val cells = Similarity.cellsFor(n, t)
      withClue(s"n=$n target=$t cells=$cells: ")(
        (n + cells - 1) / cells should be <= t)
    }
  }

  test("dedupLines conserves lines: each distinct line survives exactly once, none invented") {
    val docs = samples(sentence, 40, 3L).zipWithIndex
      .map { case (s, i) => (i.toLong, Seq(s, "shared footer", s"sec ${i % 3}").mkString("\n")) }
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs).collect()
    val inLines = docs.select("text").as[String].collect()
      .flatMap(_.split("\n")).toSet
    val outLines = out.flatMap(_.getString(1).split("\n"))
    // exactly once each, and only lines that existed in the input
    outLines.toSet shouldBe inLines
    outLines.length shouldBe outLines.distinct.length
    // n_lines bookkeeping agrees with the reassembled text
    out.foreach(r => r.getLong(2) shouldBe r.getString(1).split("\n").length.toLong)
  }

  test("bloom decontamination equals exact decontamination on random corpora") {
    for (seed <- Seq(5L, 23L)) {
      val texts = samples(sentence, 60, seed)
      val corpus = texts.zipWithIndex.map { case (s, i) => (100L + i, s) }
        .toDF("doc_id", "text")
      val bench = texts.take(8).zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val exact = Dedup.decontaminate(corpus, bench)
        .orderBy("doc_id").collect().toSeq
      val bloom = Dedup.decontaminateBloom(corpus, bench)
        .orderBy("doc_id").collect().toSeq
      withClue(s"seed=$seed: ")(bloom shouldBe exact)
    }
  }

  test("zorder: a shared z-prefix confines every dimension on random points") {
    for (seed <- Seq(3L, 19L)) {
      val pts = samples(
        Gen.zip(Gen.chooseNum(0L, 1023L), Gen.chooseNum(0L, 1023L)), 300, seed)
      val spans = pts.toDF("x", "y")
        .withColumn("z", Layout.zorderAddress(Seq(col("x"), col("y")), 10))
        .groupBy(shiftright(col("z"), 12).as("bucket"))
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .agg(max("xs"), max("ys")).head()
      // top-8 z-bits fix 4 high bits per dim: spans <= 63 of 1023
      withClue(s"seed=$seed: ") {
        spans.getLong(0) should be <= 63L
        spans.getLong(1) should be <= 63L
      }
    }
  }

  test("histogramQuantiles brackets the exact quantile on random data") {
    for (seed <- Seq(13L, 77L); w <- Seq(5L, 32L)) {
      val vals = samples(Gen.chooseNum(0L, 5000L), 400, seed)
      val qs = CorpusOps.histogramQuantiles(
        vals.map(Tuple1(_)).toDF("v"), "v", w, Seq(250, 500, 900))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val sorted = vals.sorted
      for ((p, (lo, hi)) <- qs) {
        // the exact p-quantile (ceil rank definition) falls inside the bin
        val exact = sorted((p * sorted.size + 999).toInt / 1000 - 1)
        withClue(s"seed=$seed w=$w p=$p exact=$exact: ") {
          exact should be >= lo
          exact should be <= hi
        }
      }
    }
  }

  test("applyChanges is idempotent: re-applying the same changelog is a no-op") {
    for (seed <- Seq(9L, 31L)) {
      val base = samples(Gen.zip(Gen.chooseNum(1L, 60L), Gen.chooseNum(0L, 999L)),
        80, seed).distinctBy(_._1).toDF("id", "v")
      val changes = samples(
        Gen.zip(Gen.chooseNum(1L, 80L), Gen.chooseNum(0L, 999L),
          Gen.oneOf("upsert", "delete")),
        50, seed + 1).zipWithIndex
        .map { case ((id, v, op), i) => (id, v, op, i.toLong) } // unique seq
        .toDF("id", "v", "op", "seq")
      val once = CorpusOps.applyChanges(base, changes, Seq("id"), "seq")
      val twice = CorpusOps.applyChanges(once, changes, Seq("id"), "seq")
      val a = once.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = twice.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      withClue(s"seed=$seed: ")(b shouldBe a)
    }
  }

  test("unicode normalization is idempotent and form-correct on random " +
    "codepoint soup") {
    import java.text.Normalizer
    import org.apache.spark.unsafe.types.UTF8String
    // codepoints chosen to exercise every interesting class: ASCII,
    // precomposed latin, combining marks, compatibility forms (ligature,
    // fullwidth, Angstrom), CJK, and an astral-plane emoji
    val cp = Gen.oneOf(
      Gen.chooseNum(0x20, 0x7e),                      // ASCII
      Gen.oneOf(0xe9, 0xc5, 0xf1, 0xe4),              // precomposed
      Gen.oneOf(0x301, 0x308, 0x30a),                 // combining marks
      Gen.oneOf(0xfb01, 0xff21, 0x212b),              // compatibility
      Gen.oneOf(0x4f60, 0x597d, 0x1f600))             // CJK + emoji
    val str = Gen.chooseNum(0, 24)
      .flatMap(n => Gen.listOfN(n, cp))
      .map(cps => new String(cps.toArray, 0, cps.length))
    for (seed <- Seq(3L, 99L); form <- Seq(Normalizer.Form.NFC, Normalizer.Form.NFKC)) {
      samples(str, 200, seed).foreach { s =>
        val once = graft.plans.UnicodeNormalize
          .normalize(UTF8String.fromString(s), form)
        withClue(s"'$s' ($form): ") {
          // matches the reference implementation...
          once.toString shouldBe Normalizer.normalize(s, form)
          // ...and is a fixpoint
          graft.plans.UnicodeNormalize.normalize(once, form) shouldBe once
        }
      }
    }
  }

  test("batched BPE rounds select symbol-disjoint merges and match the " +
    "sequential trainer under batch = 1 on random corpora") {
    for (seed <- Seq(5L, 21L)) {
      val docs = samples(sentence, 60, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bat = TextAnalysis.bpeTrainBatched(docs, rounds = 3, batch = 6)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      // global ranks are 1..n with no gaps
      bat.map(_._1).toSeq shouldBe (1 to bat.length)
      // schedule-equivalence at batch = 1: with one merge per counting
      // pass the batched trainer IS the sequential trainer, on any
      // corpus (the within-round disjointness rule is vacuous at M = 1,
      // so this pins the shared rank/tie-break/apply machinery)
      val seqTrain = TextAnalysis.bpeTrain(docs, numMerges = 4)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      val batOne = TextAnalysis.bpeTrainBatched(docs, rounds = 4, batch = 1)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      withClue(s"seed=$seed: ")(batOne.toSeq shouldBe seqTrain.toSeq)
    }
  }

  test("graft_top_k is partitioning-invariant: the k-bounded heap over " +
    "randomized data and partition counts equals the rank window for " +
    "every k — the mergeability claim as a property, not a point case") {
    for (seed <- Seq(3L, 77L); parts <- Seq(1, 3, 13)) {
      val rows = samples(
        Gen.zip(Gen.oneOf("a", "b"), word, Gen.chooseNum(1L, 20L)),
        400, seed)
      // duplicate (grp, key) pairs collapse first (the aggregate's
      // documented input is an already-aggregated table)
      val df = rows.toDF("grp", "key", "v")
        .groupBy("grp", "key").agg(sum("v").as("v"))
        .repartition(parts)
        .localCheckpoint() // pin ONE layout for both selection paths
      for (k <- Seq(1, 3, 8)) {
        val heap = df.groupBy("grp")
          .agg(call_function("graft_top_k", col("key"), col("v"), lit(k))
            .as("tk"))
          .select(col("grp"), posexplode(col("tk")).as(Seq("p", "e")))
          .select(col("grp"), (col("p") + 1).cast("long").as("rank"),
            col("e.key").as("key"), col("e.cnt").as("v"))
          .orderBy("grp", "rank").collect().map(_.toSeq).toSeq
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(desc("v"), asc("key"))
        val window = df
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select("grp", "rank", "key", "v")
          .orderBy("grp", "rank").collect().map(_.toSeq).toSeq
        withClue(s"seed=$seed parts=$parts k=$k: ")(heap shouldBe window)
      }
      Dedup.releaseCheckpoints(df)
    }
  }

  test("media triage is total: arbitrary, magic-prefixed, truncated, " +
    "and null payloads all yield exactly one row and never throw") {
    // the triage parsers run inside mapPartitions over whatever bytes a
    // crawl actually contains — adversarial garbage must classify (as
    // `unknown` at worst), not kill the task. Magic prefixes steer the
    // fuzz INTO each parser's deep path instead of bouncing off the
    // first signature check.
    val magics: Seq[Array[Byte]] = Seq(
      "II", "MM", "BM", "GIF89a", "GIF87a", "RIFF", "P6", "fLaC",
      "ID3", "OggS").map(_.getBytes("ISO-8859-1")) ++ Seq(
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
      Array(0xff.toByte, 0xfb.toByte),
      "RIFF1234WEBPVP8 ".getBytes("ISO-8859-1"),
      "RIFF1234WEBPVP8L".getBytes("ISO-8859-1"),
      "RIFF1234WEBPVP8X".getBytes("ISO-8859-1"),
      "RIFF1234WAVEfmt ".getBytes("ISO-8859-1"))
    val tail = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))
    val payloadGen: Gen[Array[Byte]] = Gen.oneOf(
      tail, // pure garbage
      Gen.zip(Gen.oneOf(magics), tail).map { case (m, t) => m ++ t },
      Gen.zip(Gen.oneOf(magics), tail, Gen.chooseNum(0, 130))
        .map { case (m, t, cut) => (m ++ t).take(cut) })
    for (seed <- Seq(7L, 99L)) {
      val payloads = samples(payloadGen, 300, seed) :+ null :+
        Array.empty[Byte]
      val media = spark.createDataFrame(
        payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) })
        .toDF("media_id", "payload")
      withClue(s"seed=$seed image: ")(
        Multimodal.imageHeaderMeta(media).count() shouldBe
          payloads.length.toLong)
      withClue(s"seed=$seed audio: ")(
        Multimodal.audioHeaderMeta(media).count() shouldBe
          payloads.length.toLong)
    }
  }
}
