package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SimilaritySpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  /** Ownership protocol for checkpointing searchers/trainers (ivfTopK,
    * pqTopK, ivfPqTopK, trainCentroids*, pqTrainCodebooks, knnGraph):
    * the result plan reaches every block the call pinned, so releasing
    * the result frees them. Every consumer in this suite routes through
    * here; [[graft.CleanSessionCheck]] asserts nothing survives the
    * suite.
    */
  private def withReleased[T](df: => org.apache.spark.sql.DataFrame)(
      body: org.apache.spark.sql.DataFrame => T): T = {
    val d = df
    try body(d) finally Dedup.releaseCheckpoints(d)
  }

  // small corpus with known geometry
  private val emb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 0),
    (3L, Array(-1.0f, 0.0f), 0),
    (4L, Array(0.7f, 0.7f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by exact cosine") {
    val out = Similarity.bruteTopK(emb, queryMaxId = 1L, k = 4)
      .select("cand_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    // neighbors of [1,0]: closest 1 (~0.994), then 4 (0.707), then 2 (0), then 3 (-1)
    out.map(_._1).toSeq shouldBe Seq(1L, 4L, 2L, 3L)
  }

  test("top-k sim values match hand-computed cosine") {
    val sims = Similarity.bruteTopK(emb, queryMaxId = 1L, k = 4)
      .select("cand_id", "sim").as[(Long, Double)].collect().toMap
    sims(2L) shouldBe 0.0 +- 1e-6
    sims(3L) shouldBe -1.0 +- 1e-6
    sims(4L) shouldBe math.sqrt(2.0) / 2 +- 1e-4
  }

  test("hard negatives: only cross-label candidates, nearest first") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),   // same label: excluded
      (2L, Array(0.8f, 0.2f), 1),   // hardest negative
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(-1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(labeled, queryMaxId = 1L, k = 3)
      .select("cand_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    out.map(_._1).toSeq shouldBe Seq(2L, 3L, 4L)
  }

  test("NULL-labeled vectors participate: different-label negatives and their own outlier group") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), Some(0)),
      (1L, Array(0.9f, 0.2f), None), // unlabeled: still a valid negative for label-0 queries
      (2L, Array(0.0f, 1.0f), Some(1))
    ).map { case (id, e, l) => (id, e, l.map(Int.box).orNull) }
      .toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(labeled, queryMaxId = 1L, k = 5)
      .select("cand_id").as[Long].collect().toSet
    negs shouldBe Set(1L, 2L) // the NULL-labeled vector is NOT silently dropped
    val outl = Similarity.labelOutliers(labeled, k = 10)
      .select("vec_id").as[Long].collect().toSet
    outl shouldBe Set(0L, 1L, 2L) // NULL label scores against its own centroid
  }

  test("label outliers: the vector far from its label centroid ranks worst") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(1.0f, 0.1f), 0),
      (3L, Array(-0.9f, 0.2f), 0),  // flipped: the outlier in label 0
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.1f, 0.9f), 1)
    ).toDF("vec_id", "embedding", "label")
    val worst = Similarity.labelOutliers(labeled, k = 2)
      .select("vec_id").as[Long].collect()
    worst.head shouldBe 3L
  }

  test("LSH top-k recall vs brute force on the real embeddings table") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    // LSH is approximate: require non-trivial overlap with the exact answer
    val recall = (brute intersect lsh).size.toDouble / brute.size
    recall should be >= 0.2
    lsh.size shouldBe 25 // 5 queries × k=5 (enough candidates exist)
  }

  test("PQ-ADC top-k: recall vs brute force; full-corpus rerank equals brute") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val pq = withReleased(Similarity.pqTopK(real, queryMaxId = 5L, k = 5))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    pq.size shouldBe 25
    val recall = (brute intersect pq).size.toDouble / brute.size
    recall should be >= 0.4  // compressed-domain candidates, exact rerank
    // rerank >= corpus size: PQ candidates cover everything -> exact answer
    val n = real.count().toInt
    val pqFull = withReleased(
      Similarity.pqTopK(real, queryMaxId = 5L, k = 5, rerank = n))(
      _.select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet)
    val bruteFull = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet
    pqFull shouldBe bruteFull
  }

  test("SQ8 top-k: high recall vs brute force; full-corpus rerank " +
    "equals brute; constant dims code to zero harmlessly") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val sq = withReleased(Similarity.sq8TopK(real, queryMaxId = 5L, k = 5))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    sq.size shouldBe 25
    // 8-bit affine reconstruction is tight: near-perfect shortlisting
    val recall = (brute intersect sq).size.toDouble / brute.size
    recall should be >= 0.9
    // rerank >= corpus: the shortlist covers everything -> exact answer
    val n = real.count().toInt
    val sqFull = withReleased(
      Similarity.sq8TopK(real, queryMaxId = 5L, k = 5, rerank = n))(
      _.select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet)
    val bruteFull = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet
    sqFull shouldBe bruteFull
    // a constant dimension (hi == lo) must not divide by zero and must
    // reconstruct exactly
    val const = Seq(
      (0L, Array(0.5f, 1.0f, 0.2f), 0),
      (1L, Array(0.5f, 0.9f, 0.3f), 0),
      (2L, Array(0.5f, -0.4f, 0.9f), 0)).toDF("vec_id", "embedding", "label")
    val out = withReleased(Similarity.sq8TopK(const, queryMaxId = 1L, k = 2))(
      _.orderBy("rank").collect())
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L)
  }

  test("trained PQ: per-subspace L2 Lloyd's codebook is deterministic, " +
    "well-shaped, and the full-rerank cascade still equals brute force") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cbs = Similarity.pqTrainCodebooks(real, m = 4, codebookSize = 16, iters = 1)
    val rows = cbs.collect()
    // shape: subspaces 0..3, <= 16 codewords each, every codeword 16-dim
    rows.map(_.getInt(0)).toSet shouldBe Set(0, 1, 2, 3)
    rows.groupBy(_.getInt(0)).values.foreach(_.length should be <= 16)
    rows.foreach(r => r.getSeq[Long](2).length shouldBe 16)
    // deterministic: a second training run yields the identical codebook
    val cbs2 = Similarity.pqTrainCodebooks(real, m = 4, codebookSize = 16, iters = 1)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getLong(1), r.getSeq[Long](2))
    cbs2.collect().map(key).toSet shouldBe rows.map(key).toSet
    // compressed-domain candidates from the trained codebook, exact rerank
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val pq = withReleased(Similarity.pqTopK(real, queryMaxId = 5L, k = 5,
      codebooks = Some(cbs), encodeL2 = true))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    pq.size shouldBe 25
    val recall = (brute intersect pq).size.toDouble / brute.size
    recall should be >= 0.4
    // rerank >= corpus: candidates cover everything -> exact answer, with
    // ANY codebook (the rerank stage reads full-precision vectors)
    val n = real.count().toInt
    val pqFull = withReleased(
      Similarity.pqTopK(real, queryMaxId = 5L, k = 5, rerank = n,
        codebooks = Some(cbs2), encodeL2 = true))(
      _.select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet)
    val bruteFull = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet
    pqFull shouldBe bruteFull
    graft.ops.Dedup.releaseCheckpoints(cbs)
    graft.ops.Dedup.releaseCheckpoints(cbs2)
  }

  test("IVF-PQ: compressed-domain candidates with decent recall; full " +
    "probe + full rerank equals brute force") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivfpq = withReleased(Similarity.ivfPqTopK(real, queryMaxId = 5L, k = 5))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    ivfpq.size shouldBe 25
    val recall = (brute intersect ivfpq).size.toDouble / brute.size
    recall should be >= 0.4
    // probing EVERY cell with rerank >= corpus covers all candidates ->
    // the exact answer, regardless of the PQ approximation
    val n = real.count().toInt
    val full = withReleased(Similarity.ivfPqTopK(real, queryMaxId = 5L, k = 5,
      nCells = 4, nProbe = 4, rerank = n))(
      _.select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet)
    val bruteFull = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet
    full shouldBe bruteFull
  }

  test("IVF-SQ8: cell-bounded compressed-domain candidates with SQ8's " +
    "high recall; full probe + full rerank equals brute force") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivfsq = withReleased(
      Similarity.ivfSq8TopK(real, queryMaxId = 5L, k = 5))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    ivfsq.size shouldBe 25
    // recall bounded by the 2-of-8 probe, not the tight SQ8 codes —
    // the IVF twin's regime (cells decide candidates, codes only rank)
    val recall = (brute intersect ivfsq).size.toDouble / brute.size
    recall should be >= 0.4
    // probing EVERY cell with rerank >= corpus covers all candidates ->
    // the exact answer, regardless of the scalar approximation
    val n = real.count().toInt
    val full = withReleased(Similarity.ivfSq8TopK(real, queryMaxId = 5L,
      k = 5, nCells = 4, nProbe = 4, rerank = n))(
      _.select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet)
    val bruteFull = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "sim").collect().map(_.toSeq).toSet
    full shouldBe bruteFull
  }

  test("IVF with full probe equals brute force; partial probe is a subset") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Long)].collect().toSet
    // probing every cell searches the whole corpus -> exact equality
    val full = withReleased(
      Similarity.ivfTopK(real, queryMaxId = 5L, k = 5, nCells = 4, nProbe = 4))(
      _.select("query_id", "cand_id", "rank").as[(Long, Long, Long)].collect().toSet)
    full shouldBe brute
    // partial probe: approximate, still k rows per query with decent recall
    val part = withReleased(
      Similarity.ivfTopK(real, queryMaxId = 5L, k = 5, nCells = 8, nProbe = 2))(
      _.select("query_id", "cand_id").as[(Long, Long)].collect().toSet)
    part.size shouldBe 25
    val bruteIds = brute.map(t => (t._1, t._2))
    ((bruteIds intersect part).size.toDouble / bruteIds.size) should be >= 0.2
  }

  test("trained centroids: deterministic, dimension-preserving, exact under full probe") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val c1 = withReleased(Similarity.trainCentroids(real, k = 4, iters = 2))(
      _.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
    val c2 = withReleased(Similarity.trainCentroids(real, k = 4, iters = 2))(
      _.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
    c1 shouldBe c2
    c1.size should be <= 4
    import org.apache.spark.sql.functions.col
    val dim = real.head.getSeq[Float](real.schema.fieldIndex("embedding")).length
    c1.values.forall(_.length == dim) shouldBe true
    // refinement moves the centroids off the raw seed vectors
    val seeds = real.filter(col("vec_id") < 4)
      .select(Similarity.quantize(col("embedding"))).collect()
      .map(_.getSeq[Long](0)).toSet
    c1.values.toSet should not be seeds
    // any codebook probed in full searches the whole corpus -> exact
    val brute = Similarity.bruteTopK(real, queryMaxId = 5L, k = 5)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Long)].collect().toSet
    // the trained codebook's checkpoint lives inside the ivfTopK plan,
    // so releasing the search result frees BOTH pins
    val trained = withReleased(Similarity.ivfTopK(real, queryMaxId = 5L, k = 5,
      nCells = 4, nProbe = 4,
      centroids = Some(Similarity.trainCentroids(real, k = 4, iters = 2))))(
      _.select("query_id", "cand_id", "rank").as[(Long, Long, Long)].collect().toSet)
    trained shouldBe brute
  }

  test("IVF assignment is deterministic and respects nProbe <= nCells") {
    val a = withReleased(Similarity.ivfTopK(
      emb, queryMaxId = 1L, k = 3, nCells = 2, nProbe = 2))(_.collect().toSeq)
    val b = withReleased(Similarity.ivfTopK(
      emb, queryMaxId = 1L, k = 3, nCells = 2, nProbe = 2))(_.collect().toSeq)
    a shouldBe b
    intercept[IllegalArgumentException](
      Similarity.ivfTopK(emb, queryMaxId = 1L, k = 3, nCells = 2, nProbe = 3))
  }

  test("hierarchical assignment degenerates to flat multi-probe when the " +
    "coarse codebook covers the fine one (c >= pCoarse covers all groups)") {
    // real table slice: k = 4 cells, c = ceil(sqrt(4)) = 2 <= pCoarse = 2,
    // so every vector probes BOTH coarse groups and sees every fine
    // centroid — the hier result must equal the flat probe-2 assignment
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val flat = Similarity.ivfAssignProbe(real, 4, nProbe = 2)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toSet
    val hier = Similarity.ivfAssignHierProbe(real, 4, nProbe = 2)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toSet
    hier shouldBe flat
  }

  test("hierarchical assignment: nProbe distinct fine cells per vector, " +
    "all from probed coarse groups; cell_sim matches the exact cosine") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 16 // c = 4 > pCoarse = 2: genuinely hierarchical
    val out = Similarity.ivfAssignHierProbe(real, k, nProbe = 2)
      .collect()
    val n = real.count()
    // every vector appears, with <= 2 distinct cells, every cell id a
    // valid fine centroid id
    val byVec = out.groupBy(_.getAs[Long]("vec_id"))
    byVec.size shouldBe n
    byVec.values.foreach { rows =>
      rows.length should be <= 2
      rows.map(_.getAs[Long]("cell_id")).distinct.length shouldBe rows.length
      rows.foreach(r => r.getAs[Long]("cell_id") should be < k.toLong)
    }
    // spot-check cell_sim: recompute the quantized cosine for one row
    val r0 = out.minBy(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell_id")))
    val fineVecs = real.filter(org.apache.spark.sql.functions.col("vec_id") < k)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val vq = real.filter(org.apache.spark.sql.functions.col("vec_id") ===
      r0.getAs[Long]("vec_id"))
      .select("embedding").as[Array[Float]].head()
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 10000))
    val (a, b) = (q(vq), q(fineVecs(r0.getAs[Long]("cell_id"))))
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val exp = BigDecimal(dot / math.sqrt(
      a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r0.getAs[Double]("cell_sim") shouldBe exp +- 1e-9
  }

  test("trainCentroidsHier: deterministic two-level codebook — ids encode " +
    "the coarse group, dims preserved, no leaked blocks") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 9 // c = 3, m = 3
    val a = Similarity.trainCentroidsHier(real, k, iters = 1)
    val rowsA = a.collect()
    val b = Similarity.trainCentroidsHier(real, k, iters = 1)
    val rowsB = b.collect()
    // deterministic across runs
    rowsA.map(_.toString).sorted.toSeq shouldBe rowsB.map(_.toString).sorted.toSeq
    rowsA.length should be <= k
    rowsA.length should be >= 3 // at least one fine cell per live coarse group
    val dim = real.head().getAs[Seq[Float]]("embedding").length
    rowsA.foreach { r =>
      r.getAs[Seq[Long]]("cv").length shouldBe dim
      // id encodes the group: cell_id in [0, c*m)
      r.getAs[Long]("cell_id") should (be >= 0L and be < 9L)
    }
    // returned codebooks are checkpointed — release both and assert the
    // session is clean (the ownership protocol every trainer follows)
    graft.ops.Dedup.releaseCheckpoints(a)
    graft.ops.Dedup.releaseCheckpoints(b)
    spark.sparkContext.getPersistentRDDs shouldBe empty
  }

  test("knnGraph: every vector gets up to k within-cell neighbors, symmetric edges agree") {
    // nCells = 2 -> centroids are vecs 0 and 1 (nearly parallel). By
    // cosine, vec 0 wins only itself; 1..4 all assign to cell 1 — so
    // vec 0 is a singleton cell with NO neighbors (the documented
    // recall trade), and the rest draw neighbors from {1,2,3,4}.
    val g = withReleased(Similarity.knnGraph(emb, k = 2, nCells = 2))(
      _.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap)
    g.keys.map(_._1).toSet shouldBe Set(1L, 2L, 3L, 4L)
    g.keys.map(_._2).toSet should not contain 0L
    // an edge present in both directions carries the same similarity
    for (((a, b), s) <- g; sBa <- g.get((b, a))) sBa shouldBe s +- 1e-9
    // no self-edges, ranks bounded by k
    g.keys.foreach { case (a, b) => a should not be b }
    val counts = g.keys.groupBy(_._1).view.mapValues(_.size)
    counts.values.foreach(_ should be <= 2)
  }

  test("marginPairs: ratio margin keeps uniquely-aligned pairs and " +
    "suppresses the hub that is merely close to everything") {
    // A: two orthogonal queries. B: b100 aligned with a0 alone; b101 a
    // hub equally close to both. Raw cosine ranks (a0,b101) at 0.707 —
    // respectable — but its margin is ~0.91 (the hub's neighborhood
    // average is itself high), while (a0,b100) margins ~1.42 and
    // (a1,b101) ~1.27 (the hub IS a1's uniquely best match).
    val A = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val B = Seq((100L, Array(0.99f, 0.1f)), (101L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val out = withReleased(
      Similarity.marginPairs(A, B, k = 2, marginFloorMilli = 1050L))(
      _.select("a_id", "b_id", "margin_milli")
        .as[(Long, Long, Long)].collect().toSeq)
    out.map(t => (t._1, t._2)).toSet shouldBe Set((0L, 100L), (1L, 101L))
    out.foreach(_._3 should be >= 1050L)
    // determinism: exact integer margins
    val again = withReleased(
      Similarity.marginPairs(A, B, k = 2, marginFloorMilli = 1050L))(
      _.select("a_id", "b_id", "margin_milli")
        .as[(Long, Long, Long)].collect().toSeq)
    again.sorted shouldBe out.sorted
  }

  test("marginPairsBlocked: one shared cell reduces to the exact " +
    "unblocked criterion; auto cells keep only cell-sharing pairs") {
    import org.apache.spark.sql.functions.col
    val full = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val A = full.filter(col("vec_id") % 2 === 0)
    val B = full.filter(col("vec_id") % 2 === 1)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "sim", "margin_milli")
        .as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._2))
    // nCells=1: every vector lands in the single cell, so the blocked
    // candidate set IS the full cross product — exact equality with the
    // unblocked operator on the same sides
    val one = withReleased(Similarity.marginPairsBlocked(
      A, B, k = 4, marginFloorMilli = 1050L, nCells = 1))(key)
    val flat = withReleased(Similarity.marginPairs(
      A, B, k = 4, marginFloorMilli = 1050L))(key)
    one.toSeq shouldBe flat.toSeq
    one.length should be > 0
    // auto (corpus-proportional) cells: a strict SUBSET relationship is
    // not guaranteed (blocked neighborhoods change the denominators),
    // but every kept pair must share a cell: a's probes ∩ b's home
    val blocked = withReleased(Similarity.marginPairsBlocked(
      A, B, k = 4, marginFloorMilli = 1050L, nCells = 0,
      targetPerCell = 128L, nProbe = 2))(key)
    blocked.foreach(_._4 should be >= 1050L)
    val kc = Similarity.cellsFor(full.count(), 128L)
    val book = Similarity.seedCodebook(full.select("vec_id", "embedding"), kc)
    val aCells = Similarity.ivfAssignHierProbe(A, kc, 2,
      centroids = Some(book))
      .select("vec_id", "cell_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bCell = Similarity.ivfAssignHierProbe(B, kc, 1,
      centroids = Some(book))
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    blocked.foreach { case (a, b, _, _) =>
      aCells(a) should contain(bCell(b))
    }
    // determinism
    val again = withReleased(Similarity.marginPairsBlocked(
      A, B, k = 4, marginFloorMilli = 1050L, nCells = 0,
      targetPerCell = 128L, nProbe = 2))(key)
    again.toSeq shouldBe blocked.toSeq
  }

  test("signatures are deterministic across evaluations") {
    val a = Similarity.lshTopK(emb, queryMaxId = 1L, k = 3).collect().toSeq
    val b = Similarity.lshTopK(emb, queryMaxId = 1L, k = 3).collect().toSeq
    a shouldBe b
  }

  test("randomProjection: seed-derived, linear, deterministic") {
    import spark.implicits._
    // basis vector e_0 scaled: proj(j) = 10000 * s(0, j), so the doubled
    // vector projects to exactly 2x — linearity pins the sign matrix use
    val one = Seq((1L, Array(1.0f) ++ Array.fill(63)(0.0f)),
      (2L, Array(2.0f) ++ Array.fill(63)(0.0f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.randomProjection(one, outDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    p.size shouldBe 16
    (0L until 8L).foreach { j =>
      math.abs(p((1L, j))) shouldBe 10000L
      p((2L, j)) shouldBe 2L * p((1L, j))
    }
    // not all signs equal (the matrix actually varies with j)
    (0L until 8L).map(j => p((1L, j))).toSet.size shouldBe 2
    val again = Similarity.randomProjection(one, outDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    again shouldBe p
  }

  test("cellMedoids: one prototype per cell, closest to centroid, lowest id on ties") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),    // centroid 0
      (1L, Array(0.0f, 1.0f)),    // centroid 1
      (2L, Array(0.9f, 0.1f)),    // cell 0, sim < vec 0's self-sim 1.0
      (3L, Array(0.0f, 0.5f)),    // cell 1, parallel to centroid 1 -> sim 1.0
      (4L, Array(0.1f, 0.9f))     // cell 1, sim < 1.0
    ).toDF("vec_id", "embedding")
    val out = Similarity.cellMedoids(emb, nCells = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cell 0: the centroid itself is its own best member (sim 1.0)
    out(0L)._1 shouldBe 0L
    // cell 1: vec 3 is PARALLEL to the centroid (cosine 1.0, scale
    // invariant) and ties with the centroid's self-sim — lowest id wins
    out(1L)._1 shouldBe 1L
    out(1L)._2 shouldBe 1.0
    // auto sizing: 5 rows at 2/cell -> 3 cells -> 3 medoids
    Similarity.cellMedoids(emb, nCells = 0, targetPerCell = 2L)
      .count() shouldBe 3L
  }

  test("randomProjection: mismatched embedding dim fails loudly") {
    import spark.implicits._
    // zip_with would silently NULL-pad a short vector; the hoisted guard
    // must still fail loudly (it is planned once per row, upstream of the
    // per-dimension transform)
    val bad = Seq((1L, Array.fill(32)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Throwable] {
      Similarity.randomProjection(bad, outDim = 4).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    chain should include("embedding dim")
  }
}
