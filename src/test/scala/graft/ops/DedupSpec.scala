package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class DedupSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup of 0
    (3L, "completely different text about spark engines and shuffles"),
    (4L, "THE  Quick   Brown fox jumps over the lazy dog") // dup after normalize
  ).toDF("doc_id", "text")

  test("exact dedup keys on normalized content; keeps lowest id") {
    val out = Dedup.exact(docs).collect()
    out.length shouldBe 3 // {0,1,4}, {2}, {3}
    val dupGroup = out.find(_.getAs[Long]("copies") == 3).get
    dupGroup.getAs[Long]("keep_id") shouldBe 0L
  }

  test("incremental dedup: a NULL-digest (NULL-text) index entry blocks NULL-text newcomers") {
    val index = Seq(Tuple1(null.asInstanceOf[String])).toDF("content_key")
    val batch = Seq(
      (20L, null.asInstanceOf[String]), // digest NULL: already indexed
      (21L, "real content here")
    ).toDF("doc_id", "text")
    Dedup.dedupIncremental(batch, index)
      .select("doc_id").as[Long].collect().toSeq shouldBe Seq(21L)
  }

  test("incremental dedup: index filters known content, batch self-dedups") {
    val index = Dedup.exact(docs.filter(col("doc_id") <= 0)).select("content_key")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // already indexed
      (11L, "brand new content one"),
      (12L, "brand  NEW content one"),                      // in-batch dup of 11
      (13L, "brand new content two")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupIncremental(batch, index)
      .select("doc_id").as[Long].collect().sorted
    out shouldBe Array(11L, 13L)
    // empty index: pure in-batch dedup
    Dedup.dedupIncremental(batch, index.limit(0))
      .count() shouldBe 3L
  }

  test("minhash LSH surfaces the near-duplicate pair and skips unrelated docs") {
    val pairs = Dedup.minHashLsh(docs, threshold = 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 1L)) // identical
    pairs should contain((0L, 4L)) // identical after normalization
    // near-dup 0-2 shares most shingles; must be a candidate at jaccard≥0.3
    pairs should contain((0L, 2L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("bucket cap drops degenerate over-populated LSH buckets (skew insurance)") {
    // 8 identical docs: every (band, bucket) key holds all 8 -> 28 pairs
    // without the cap, quadratic at scale. Cap 4 drops those buckets whole.
    val flood = (0L until 8L).map(i => (i, "same boilerplate text everywhere here"))
      .toDF("doc_id", "text")
    Dedup.minHashLsh(flood, threshold = 0.3).count() shouldBe 28L
    Dedup.minHashLsh(flood, threshold = 0.3, maxBucket = 4).count() shouldBe 0L
    // a mixed corpus keeps its small-bucket pairs under the same cap
    val mixed = flood.union(docs.filter(col("doc_id").isin(0L, 2L, 3L))
      .withColumn("doc_id", col("doc_id") + 100L))
    val capped = Dedup.minHashLsh(mixed, threshold = 0.3, maxBucket = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    capped should contain((100L, 102L)) // near-dup pair survives
    capped.exists(p => p._1 < 8L) shouldBe false // flood pairs gone
    // same guard on the simhash hamming join
    Dedup.simHashDups(flood).count() shouldBe 28L
    Dedup.simHashDups(flood, maxBucket = 4).count() shouldBe 0L
  }

  test("near-dedup apply keeps only the lowest-id representative per near-group") {
    val out = Dedup.dropNearDuplicatesPortable(docs, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    out should contain(0L) // lowest of the near-group {0,1,2,4}
    out should contain(3L) // unrelated doc untouched
    Set(1L, 2L, 4L).intersect(out) shouldBe Set.empty
  }

  test("minHashLsh requires bands to divide numHashes") {
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashLsh(docs, numHashes = 32, bands = 5)
    }
    e.getMessage should include("divide")
  }

  test("jaccard is exact set similarity") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    df.select(Dedup.jaccard(col("a"), col("b"))).head.getDouble(0) shouldBe 0.5 +- 1e-9
  }

  test("simhash: identical (normalized) docs agree; unrelated docs differ") {
    val out = Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(0L) shouldBe out(1L)
    out(0L) shouldBe out(4L)
    out(0L) should not be out(3L)
    // near-dup: small hamming distance between doc 0 and doc 2
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    hamming(out(0L), out(2L)) should be < hamming(out(0L), out(3L))
  }

  test("simhash banded join finds identical and near docs, skips unrelated") {
    val pairs = Dedup.simHashDups(docs, maxHamming = 7, bandBits = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 1L)) // identical -> hamming 0
    pairs should contain((0L, 4L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
    // guard: a (maxHamming, bandBits) pair beyond the pigeonhole guarantee
    // would silently miss qualifying pairs — must be rejected
    intercept[IllegalArgumentException](
      Dedup.simHashDups(docs, maxHamming = 16, bandBits = 8))
  }

  test("ngram jaccard pairs verifies an explicit candidate set") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("a_id", "b_id")
    val out = Dedup.ngramJaccardPairs(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out((0L, 1L)) shouldBe 1.0 +- 1e-9
    out((0L, 3L)) shouldBe 0.0 +- 1e-9
  }

  test("ngram jaccard pairs is orientation-agnostic and handles self-pairs") {
    // reversed orientation (b_id < a_id) and a self-pair: the contract
    // states no ordering precondition, so both must score their true
    // similarity, not a silent 0.0
    val pairs = Seq((1L, 0L), (3L, 0L), (2L, 2L)).toDF("a_id", "b_id")
    val out = Dedup.ngramJaccardPairs(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out((1L, 0L)) shouldBe 1.0 +- 1e-9 // identical docs, reversed pair
    out((3L, 0L)) shouldBe 0.0 +- 1e-9
    out((2L, 2L)) shouldBe 1.0 +- 1e-9 // self-pair
  }

  test("decontamination flags corpus docs overlapping the benchmark set") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // shares 3-grams with bench 1
      (101L, "totally unrelated content here now")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(100L)
    out.head.getAs[Long]("max_overlap") shouldBe 2L // two shared 3-grams
  }

  test("line dedup: first occurrence survives, docs reassemble in order, empty docs vanish") {
    val multi = Seq(
      (1L, "alpha\nfooter\nbeta"),
      (2L, "gamma\nfooter"),   // footer already seen in doc 1
      (3L, "footer"),          // ONLY line already seen -> doc disappears
      (4L, "alpha\ndelta")     // alpha seen in doc 1; delta survives
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe ("alpha\nfooter\nbeta", 3L)
    out(2L) shouldBe ("gamma", 1L)
    out(4L) shouldBe ("delta", 1L)
    out.keySet shouldBe Set(1L, 2L, 4L)
  }

  test("line dedup keeps blank separator lines unconditionally") {
    val multi = Seq(
      (1L, "alpha\n\nbeta"),   // blank paragraph separator
      (2L, "gamma\n\ndelta"),  // its own blank must NOT collapse into doc 1's
      (3L, "alpha\n\nepsilon") // alpha dedups away; blank + epsilon survive
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe ("alpha\n\nbeta", 3L)
    out(2L) shouldBe ("gamma\n\ndelta", 3L)
    out(3L) shouldBe ("\nepsilon", 2L)
  }

  test("minWords exempts short lines from dedup but still dedups real content") {
    val multi = Seq(
      (1L, "Home\nthe quick brown fox\nSection 1"),
      (2L, "Home\nthe quick brown fox\nSection 1"), // fox line dedups away
      (3L, "Home\nunique content line here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi, minWords = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe ("Home\nthe quick brown fox\nSection 1", 3L)
    // 2-word "Section 1" and 1-word "Home" survive everywhere; only the
    // 4-word content line participates in the corpus-wide decision
    out(2L) shouldBe ("Home\nSection 1", 2L)
    out(3L) shouldBe ("Home\nunique content line here", 2L)
  }

  test("containment separates doc-inside-doc from mere overlap") {
    val cdocs = Seq(
      (0L, "a b c d e"),                 // 3 shingles: abc bcd cde
      (1L, "a b c d e x y z w q"),       // contains all of doc 0's shingles
      (2L, "completely different words") // no overlap
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("a_id", "b_id")
    val out = Dedup.ngramContainmentPairs(cdocs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    out((0L, 1L))._1 shouldBe 1.0 +- 1e-9           // all of A inside B
    out((0L, 1L))._2 shouldBe (3.0 / 8.0) +- 1e-9   // B is mostly new
    out((0L, 2L)) shouldBe ((0.0, 0.0))
    // jaccard on the same pair is small: containment sees what it misses
    val j = Dedup.ngramJaccardPairs(cdocs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    j((0L, 1L)) shouldBe (3.0 / 8.0) +- 1e-9
  }

  test("bloom decontamination is bit-identical to the exact join") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "totally unrelated content here now"),
      (102L, "alpha beta gamma something else entirely different")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "another benchmark prompt with words")).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench)
      .orderBy("doc_id").collect().toSeq
    val bloom = Dedup.decontaminateBloom(corpus, bench)
      .orderBy("doc_id").collect().toSeq
    bloom shouldBe exact
    bloom.map(_.getLong(0)) shouldBe Seq(100L)
  }

  test("star-contraction components equal label propagation on chains, cliques, random graphs") {
    def labels(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.duplicateGroupsContract(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def propag(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.duplicateGroups(pairs, maxIter = 30).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // long chain (diameter 19 — the propagation worst case)
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    labels(chain) shouldBe propag(chain)
    labels(chain).values.toSet shouldBe Set(1L)
    // two cliques + an isolated pair + a self-pair
    val cliques = ((10L to 13L).combinations(2).map(s => (s(0), s(1))) ++
      (20L to 24L).combinations(2).map(s => (s(0), s(1))) ++
      Seq((30L, 31L), (40L, 40L))).toSeq.toDF("a_id", "b_id")
    labels(cliques) shouldBe propag(cliques)
    labels(cliques)(40L) shouldBe 40L
    // seeded random graph, reversed orientations included
    val rnd = new scala.util.Random(7)
    val rand = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .toDF("a_id", "b_id")
    labels(rand) shouldBe propag(rand)
    // one row per node even UNCONVERGED (maxIter = 0 leaves raw edges):
    // the contract holds, only the labels may be wrong
    val raw = Dedup.duplicateGroupsContract(chain, maxIter = 0).collect()
    raw.map(_.getLong(0)).toSeq.sorted shouldBe (1L to 20L)
  }

  test("bloom decontamination with an empty benchmark flags nothing") {
    val corpus = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = corpus.limit(0)
    Dedup.decontaminateBloom(corpus, bench).count() shouldBe 0L
  }

  test("duplicate groups: label propagation closes transitive chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a_id", "b_id")
    val groups = Dedup.duplicateGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    groups(1L) shouldBe 1L
    groups(2L) shouldBe 1L
    groups(3L) shouldBe 1L // transitively via 2, never paired with 1
    groups(7L) shouldBe 7L
    groups(9L) shouldBe 7L
  }

  test("dupSizeHistogram: conserves the corpus and reports removable rows") {
    val docs = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"),     // size-3 cluster
      (4L, "Beta  beta"), (5L, "beta beta"),           // size-2 via normText
      (6L, "gamma"), (7L, "delta")                     // singletons
    ).toDF("doc_id", "text")
    val h = Dedup.dupSizeHistogram(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    h shouldBe Map(3L -> (1L, 3L), 2L -> (1L, 2L), 1L -> (2L, 2L))
    h.values.map(_._2).sum shouldBe 7L // n_docs sums back to the corpus
  }

  test("contaminationPairs: per-benchmark attribution with bounded sorted evidence") {
    val corpus = Seq(
      (100L, "aa bb cc dd ee"),          // shares 3 shingles with bench 1
      (101L, "zz yy xx")                 // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "aa bb cc dd qq")).toDF("doc_id", "text")
    val out = Dedup.contaminationPairs(corpus, bench, evidenceK = 2).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((100L, 1L, 2L))
    // shared 3-grams of the pair: "aa bb cc", "bb cc dd" — sorted, top 2
    r.getString(3) shouldBe "aa bb cc | bb cc dd"
  }

  test("embedding dups by IVF cell: derived blocking finds co-located near-dups") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid 0
      (1L, Array(0.0f, 1.0f)),   // centroid 1
      (2L, Array(0.99f, 0.01f)), // cell 0, near-dup of 0
      (3L, Array(0.01f, 0.99f)), // cell 1, near-dup of 1
      (4L, Array(-1.0f, 0.0f))   // cell 1 (orthogonal beats negative), no dup
    ).toDF("vec_id", "embedding")
    val outDf = Dedup.embeddingDupsByCell(emb, threshold = 0.9, nCells = 2)
    val out = outDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    Dedup.releaseCheckpoints(outDf)
    out shouldBe Set((0L, 2L), (1L, 3L))
    // APPLY: the b-side of each pair is dropped, lowest id survives
    val applied = Dedup.dropSemanticDuplicates(emb, threshold = 0.9, nCells = 2)
    applied.select("vec_id").as[Long].collect().sorted shouldBe Array(0L, 1L, 4L)
    Dedup.releaseCheckpoints(applied)
    // nCells = 0 auto-sizes via cellsFor: 5 rows -> 1 cell, every pair
    // co-located, so at least the per-cell pairs above still surface
    val autoDf = Dedup.embeddingDupsByCell(emb, threshold = 0.9, nCells = 0)
    val auto = autoDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    Dedup.releaseCheckpoints(autoDf)
    auto should contain allOf ((0L, 2L), (1L, 3L))
    // targetPerCell drives the derived count: 5 rows at 2/cell -> 3 cells
    // (seeds 0, 1, 2). Vector 2 becomes its own centroid, so (0, 2) now
    // STRADDLES cells 0/2 — the standard single-assignment recall loss —
    // and only the still-co-located (1, 3) pair survives. nProbe = 1
    // pins the single-assignment baseline (the probe-2 DEFAULT exists
    // exactly to recover this pair — asserted below)
    val tightDf = Dedup.embeddingDupsByCell(
      emb, threshold = 0.9, nCells = 0, targetPerCell = 2L, nProbe = 1)
    val tight = tightDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    Dedup.releaseCheckpoints(tightDf)
    tight shouldBe Set((1L, 3L))
    // the probe-2 DEFAULT recovers the straddling pair: vector 0 (and 2)
    // probes both of cells 0/2, so (0, 2) meets in a shared cell again
    val probeDf = Dedup.embeddingDupsByCell(
      emb, threshold = 0.9, nCells = 0, targetPerCell = 2L)
    val probed = probeDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    Dedup.releaseCheckpoints(probeDf)
    probed should contain allOf ((0L, 2L), (1L, 3L))
  }

  test("embedding dups by cell accepts a trained codebook") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.99f, 0.01f)),
      (3L, Array(0.01f, 0.99f)),
      (4L, Array(0.98f, 0.02f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, k = 2, iters = 2)
    val outDf = Dedup.embeddingDupsByCell(
      emb, threshold = 0.9, nCells = 2, centroids = Some(cents))
    val out = outDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    Dedup.releaseCheckpoints(outDf)
    Dedup.releaseCheckpoints(cents)
    // trained cells keep the two axis clusters apart: the x-axis trio
    // pairs among themselves, the y-axis pair pairs, nothing crosses
    out shouldBe Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L))
  }

  test("incremental near-dedup equals the full-union cross-pair decision") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") < 250L)
    val fresh = docs.filter(col("doc_id") >= 250L)
    val inc = Dedup.dropNearDuplicatesIncrementalPortable(fresh, corpus)
      .select("doc_id").as[Long].collect().sorted
    // reference decision: run the WHOLE union through the batch pipeline
    // and drop new docs with a verified cross-side pair
    val crossHit = Dedup.minHashLshPortable(docs, threshold = 0.5)
      .filter(col("a_id") < 250L && col("b_id") >= 250L)
      .select(col("b_id")).distinct().as[Long].collect().toSet
    val expect = fresh.select("doc_id").as[Long].collect()
      .filterNot(crossHit).sorted
    inc.toSeq shouldBe expect.toSeq
    // and at least one near-dup must actually have been dropped for the
    // test to mean anything
    expect.length should be < fresh.count().toInt
  }

  test("incremental semantic dedup equals the full-union cross-pair decision") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") < 250L)
    val fresh = emb.filter(col("vec_id") >= 250L)
    val incDf = Dedup.dropSemanticDuplicatesIncremental(
      fresh, corpus, threshold = 0.35, targetPerCell = 128L)
    val inc = incDf.select("vec_id").as[Long].collect().sorted
    // the incremental path checkpoints its combined assignment; release
    // it or the block leaks into the shared session (hygiene assertions
    // in other suites count leaked blocks)
    Dedup.releaseCheckpoints(incDf)
    // reference decision: the batch pipeline over the WHOLE union (same
    // auto-sized hier chain; its self-seeded codebook equals the corpus
    // seed because the corpus holds every low id), restricted to
    // cross-side pairs — new-vs-new pairs must NOT drop anything here
    val pairsDf = Dedup.embeddingDupsByCell(
      emb, threshold = 0.35, nCells = 0, targetPerCell = 128L)
    val crossHit = pairsDf
      .filter(col("a_id") < 250L && col("b_id") >= 250L)
      .select(col("b_id")).distinct().as[Long].collect().toSet
    Dedup.releaseCheckpoints(pairsDf)
    val expect = fresh.select("vec_id").as[Long].collect()
      .filterNot(crossHit).sorted
    inc.toSeq shouldBe expect.toSeq
    // discriminating on this data: some dropped, some survive
    expect.length should be < fresh.count().toInt
    expect.length should be > 0
  }

  test("embedding dup union: superset of both axes, pairs verified at the " +
    "threshold, sim identical from either arm") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val cellDf = Dedup.embeddingDupsByCell(
      emb, threshold = 0.35, nCells = 0, targetPerCell = 128L)
    val cells = pairs(cellDf)
    Dedup.releaseCheckpoints(cellDf)
    val lshDf = Dedup.embeddingDupsByLshPortable(emb, threshold = 0.35)
    val lsh = pairs(lshDf)
    Dedup.releaseCheckpoints(lshDf)
    val uniDf = Dedup.embeddingDupsUnion(
      emb, threshold = 0.35, nCells = 0, targetPerCell = 128L)
    val uni = pairs(uniDf)
    Dedup.releaseCheckpoints(uniDf)
    uni shouldBe (cells union lsh)
    // the axes genuinely differ on this data (the union exists for this)
    (lsh -- cells) should not be empty
    // every union pair is a TRUE pair: verification is exact cosine
    val truthDf = Dedup.embeddingDups(
      emb.withColumn("label", lit(0)), threshold = 0.35)
    val truth = pairs(truthDf)
    Dedup.releaseCheckpoints(truthDf)
    (uni -- truth) shouldBe empty
  }

  test("incremental semantic dedup ignores new-vs-new pairs and keeps " +
    "cross-side losers out (explicit small codebook, flat probe path)") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),  // corpus centroid/cell seed
      (1L, Array(0.0f, 1.0f)),  // corpus
      (10L, Array(0.99f, 0.01f)), // new: near-dup of corpus 0 -> dropped
      (11L, Array(0.01f, 0.99f)), // new: near-dup of corpus 1 -> dropped
      (12L, Array(-0.9f, 0.44f)), // new: far from corpus -> survives
      (13L, Array(-0.9f, 0.43f))  // new: near-dup of NEW 12 only -> survives
    ).toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 10L)
    val fresh = emb.filter(col("vec_id") >= 10L)
    val outDf = Dedup.dropSemanticDuplicatesIncremental(
      fresh, corpus, threshold = 0.9, nCells = 2)
    val out = outDf.select("vec_id").as[Long].collect().sorted
    Dedup.releaseCheckpoints(outDf)
    out.toSeq shouldBe Seq(12L, 13L)
  }

  test("embedding dups finds same-label near-identical vectors") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.01f, 0.0f), 1),  // same label, near-dup
      (2L, Array(0.0f, 1.0f, 0.0f), 1),    // same label, orthogonal
      (3L, Array(1.0f, 0.0f, 0.0f), 2)     // dup of 0 but different label
    ).toDF("vec_id", "embedding", "label")
    val outDf = Dedup.embeddingDups(emb, threshold = 0.9)
    val out = outDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // release the pre-self-join pin so the shared-session hygiene assertions stay honest
    Dedup.releaseCheckpoints(outDf)
    out shouldBe Set((0L, 1L))
  }

  test("keepBestInGroups: highest quality survives per group, ties break " +
    "to lowest id, ungrouped docs pass through") {
    val scored = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (5L, 7L)
    ).toDF("doc_id", "quality")
    val groups = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)
    ).toDF("id", "group_id")
    val out = Dedup.keepBestInGroups(scored, groups)
      .select("doc_id").as[Long].collect().toSet
    // group 1: ids 1,2,3 with q 5,9,9 -> winner 2 (tie 2 vs 3 -> lowest)
    // group 4: singleton 4 survives; 5 is ungrouped
    out shouldBe Set(2L, 4L, 5L)
  }

}
