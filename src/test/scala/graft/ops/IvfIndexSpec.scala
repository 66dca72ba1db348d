package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The persisted-IVF-layout contract ([[Similarity.writeIvfIndex]] /
  * [[Similarity.searchIvfIndex]]): persistence changes WHERE the work
  * happens (assignment at write time, probes as partition-pruned reads),
  * never the answer.
  */
class IvfIndexSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("persisted search equals the in-session auto path exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx-eq").toString
    Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    val persisted = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), dir, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val directDf = Similarity.ivfTopK(emb, queryMaxId = 10L, k = 5,
      nCells = 0, targetPerCell = 128L)
    val direct = directDf.orderBy("query_id", "rank").collect().toSeq
    // the auto path pins its assignment checkpoint; release per protocol
    Dedup.releaseCheckpoints(directDf)
    persisted shouldBe direct
  }

  test("incremental append equals a one-shot build under the same " +
    "codebook: identical layout rows and identical search answers") {
    import org.apache.spark.sql.functions.lit
    val n = emb.count()
    val half = n / 2
    val kCells = Similarity.cellsFor(half, 128L)
    // incremental: base half builds (and pins the codebook), rest appends
    val dirInc = java.nio.file.Files.createTempDirectory("ivf-inc").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < half), dirInc,
      nCells = kCells)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= half), dirInc)
    // one-shot: the union written in one pass under the SAME codebook
    val dirOne = java.nio.file.Files.createTempDirectory("ivf-one").toString
    val book = spark.read.parquet(s"$dirInc/codebook")
    Similarity.writeIvfIndex(emb, dirOne, nCells = kCells,
      centroids = Some(book))
    def layout(d: String) = spark.read.parquet(s"$d/index")
      .select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    layout(dirInc) shouldBe layout(dirOne)
    layout(dirInc).size shouldBe n.toInt
    def search(d: String) = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), d, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    search(dirInc) shouldBe search(dirOne)
    // the append actually landed in EXISTING partitions (no new cells)
    spark.read.parquet(s"$dirInc/codebook").count() shouldBe kCells.toLong
  }

  test("compaction collapses accumulated per-cell files to one and never " +
    "changes a search answer") {
    val n = emb.count()
    val third = n / 3
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < third), dir,
      nCells = Similarity.cellsFor(third, 128L))
    Similarity.appendIvfIndex(
      emb.filter(col("vec_id") >= third && col("vec_id") < 2 * third), dir)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 2 * third), dir)
    def files() = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/index"))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(
          _.getFileName.toString.endsWith(".parquet")).toSeq
      } finally w.close()
    }
    def cellDirs() = files().map(_.getParent.getFileName.toString).distinct
    val before = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), dir, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    // three writes -> at least one cell carries multiple files
    files().size should be > cellDirs().size
    val rows = spark.read.parquet(s"$dir/index").count()
    val after = Similarity.compactIvfIndex(dir, spark)
    // exactly one file per non-empty cell; rows preserved; answer equal
    after shouldBe cellDirs().size.toLong
    files().size shouldBe cellDirs().size
    spark.read.parquet(s"$dir/index").count() shouldBe rows
    Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), dir, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq shouldBe before
  }

  test("compaction swap is crash-safe: a complete, lossless tree exists " +
    "at every intermediate step (delete runs last, on the retired copy)") {
    val n = emb.count()
    val half = n / 2
    val dir = java.nio.file.Files.createTempDirectory("ivf-swapsafe").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < half), dir,
      nCells = Similarity.cellsFor(half, 128L))
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= half), dir)
    val rows = spark.read.parquet(s"$dir/index").count()
    def complete(sub: String): Boolean = {
      val p = java.nio.file.Paths.get(s"$dir/$sub")
      java.nio.file.Files.isDirectory(p) &&
        spark.read.parquet(s"$dir/$sub").count() == rows
    }
    var steps = Seq.empty[String]
    Similarity.compactIvfIndex(dir, spark, onSwapStep = { step =>
      steps :+= step
      step match {
        case "written" =>
          // both trees complete: a crash here loses nothing, a reader
          // still sees the old index
          assert(complete("index") && complete("index_compacting"))
        case "retired" =>
          // the documented transient window: index briefly absent, but
          // BOTH complete copies exist — a crash strands recoverable
          // trees, never a partial one
          assert(!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dir/index")))
          assert(complete("index_old") && complete("index_compacting"))
        case "swapped" =>
          // new index live; the retired copy still whole until the
          // final delete
          assert(complete("index") && complete("index_old"))
        case other => fail(s"unexpected swap step $other")
      }
    })
    steps shouldBe Seq("written", "retired", "swapped")
    complete("index") shouldBe true
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/index_old")) shouldBe false
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/index_compacting")) shouldBe false
  }

  test("append/search derive the coarse grouping from the RECORDED build " +
    "cell count, not the codebook row count") {
    // an EXTERNAL codebook with MORE rows (9) than the build cell count
    // (4): ceil(sqrt(9))=3 vs ceil(sqrt(4))=2, so deriving nCells from
    // codebook.count() would assign appends under a DIFFERENT coarse
    // grouping than the build — the divergence `meta/` guards against
    val cents = Similarity.seedCodebook(emb, 9)
    val n = emb.count()
    val half = n / 2
    val dirInc = java.nio.file.Files.createTempDirectory("ivf-meta-inc").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < half), dirInc,
      nCells = 4, centroids = Some(cents))
    spark.read.parquet(s"$dirInc/meta").collect()(0).getInt(0) shouldBe 4
    spark.read.parquet(s"$dirInc/codebook").count() shouldBe 9L
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= half), dirInc)
    val dirOne = java.nio.file.Files.createTempDirectory("ivf-meta-one").toString
    val book = spark.read.parquet(s"$dirInc/codebook")
    Similarity.writeIvfIndex(emb, dirOne, nCells = 4, centroids = Some(book))
    def layout(d: String) = spark.read.parquet(s"$d/index")
      .select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    layout(dirInc) shouldBe layout(dirOne)
    layout(dirInc).size shouldBe n.toInt
    def search(d: String) = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), d, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    search(dirInc) shouldBe search(dirOne)
  }

  test("delete rewrites ONLY touched cells (untouched files byte-" +
    "identical) and equals a one-shot rebuild without the deleted rows") {
    val n = emb.count()
    val kCells = Similarity.cellsFor(n, 128L)
    val dir = java.nio.file.Files.createTempDirectory("ivf-del").toString
    Similarity.writeIvfIndex(emb, dir, nCells = kCells)
    def layout(d: String) = spark.read.parquet(s"$d/index")
      .select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val beforeLayout = layout(dir)
    // delete HALF of one cell's members: exactly one touched cell, so
    // the untouched-files property is observable (a corpus-wide delete
    // predicate touches every cell at this fixture's 4-cell size)
    val targetCell = beforeLayout.map(_._2).max
    val cellMembers = beforeLayout.filter(_._2 == targetCell).map(_._1)
      .toSeq.sorted
    val delIds = cellMembers.take(cellMembers.size / 2).toSet
    delIds should not be empty
    val delPred = col("vec_id").isin(delIds.toSeq.map(Long.box): _*)
    val touchedCells = Set(targetCell)
    touchedCells.size should be < kCells // some cells stay untouched
    def files(d: String) = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$d/index"))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => p.toString ->
            (java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p)))
          .toMap
      } finally w.close()
    }
    val beforeFiles = files(dir)
    val deleted = Similarity.deleteFromIvfIndex(
      dir, emb.filter(delPred).select("vec_id"), spark)
    deleted shouldBe delIds.size.toLong
    // untouched cells' data files: same paths, sizes AND mtimes
    val afterFiles = files(dir)
    val untouched = beforeFiles.filter { case (p, _) =>
      !touchedCells.exists(c => p.contains(s"cell_id=$c/")) }
    untouched.foreach { case (p, meta) => afterFiles.get(p) shouldBe Some(meta) }
    // delete ≡ one-shot rebuild of the remainder under the SAME codebook
    val dirOne = java.nio.file.Files.createTempDirectory("ivf-del-one").toString
    val book = spark.read.parquet(s"$dir/codebook")
    Similarity.writeIvfIndex(emb.filter(!delPred), dirOne, nCells = kCells,
      centroids = Some(book))
    layout(dir) shouldBe layout(dirOne)
    def search(d: String) = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), d, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    search(dir) shouldBe search(dirOne)
  }

  test("deleting every member of a cell removes its partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-del-all").toString
    Similarity.writeIvfIndex(emb, dir, nCells = Similarity.cellsFor(emb.count(), 128L))
    val onecell = spark.read.parquet(s"$dir/index")
      .select(col("cell_id").cast("long")).orderBy("cell_id")
      .limit(1).collect()(0).getLong(0)
    val members = spark.read.parquet(s"$dir/index")
      .filter(col("cell_id") === onecell).select("vec_id")
    val m = members.count()
    m should be > 0L
    Similarity.deleteFromIvfIndex(dir, members, spark) shouldBe m
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/index/cell_id=$onecell")) shouldBe false
    // the layout still reads and serves the remaining cells
    spark.read.parquet(s"$dir/index")
      .select(col("cell_id").cast("long")).distinct()
      .collect().map(_.getLong(0)) should not contain onecell
  }

  test("retrain migrates the layout to equal a fresh build under the " +
    "trained codebook: identical codebook, layout rows, and search answers") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-retrain").toString
    Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    val k = Similarity.retrainIvfIndex(dir, spark, nCells = 0,
      targetPerCell = 128L, iters = 1)
    k shouldBe Similarity.cellsFor(emb.count(), 128L)
    spark.read.parquet(s"$dir/meta").collect()(0).getInt(0) shouldBe k
    // fresh build under the same trained codebook, from the ORIGINAL
    // embeddings — the dequantize round-trip must not move anything
    val trainedDf = Similarity.trainCentroidsHier(emb, k, iters = 1)
    val dirOne = java.nio.file.Files.createTempDirectory("ivf-retrain-one").toString
    Similarity.writeIvfIndex(emb, dirOne, nCells = k,
      centroids = Some(trainedDf))
    Dedup.releaseCheckpoints(trainedDf)
    def book(d: String) = spark.read.parquet(s"$d/codebook")
      .select("cell_id", "cv", "cn").collect().map(_.toString).toSet
    book(dir) shouldBe book(dirOne)
    def layout(d: String) = spark.read.parquet(s"$d/index")
      .select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    layout(dir) shouldBe layout(dirOne)
    layout(dir).size shouldBe emb.count().toInt
    def search(d: String) = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), d, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    search(dir) shouldBe search(dirOne)
    // no swap residue
    Seq("index_old", "index_compacting", "codebook_new", "codebook_old",
      "meta_new", "meta_old").foreach { n =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$n")) shouldBe false
    }
  }

  test("retrain swap killed at any intermediate step recovers to a " +
    "consistent layout on the next lifecycle entry") {
    case class Killed(step: String) extends RuntimeException(step)
    def search(d: String) = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), d, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    def freshDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("ivf-retrain-kill").toString
      Similarity.writeIvfIndex(emb, d, nCells = 0, targetPerCell = 128L)
      d
    }
    // the two reference answers: pre-retrain (seeded) and post-retrain
    val seededDir = freshDir()
    val preAnswer = search(seededDir)
    val doneDir = freshDir()
    Similarity.retrainIvfIndex(doneDir, spark, nCells = 0,
      targetPerCell = 128L, iters = 1)
    val postAnswer = search(doneDir)
    postAnswer should not be preAnswer // the migration is observable
    // kill BEFORE the commit point: the old layout keeps serving, and a
    // later retrain completes from the stranded-asides state
    val d1 = freshDir()
    intercept[Killed] {
      Similarity.retrainIvfIndex(d1, spark, nCells = 0,
        targetPerCell = 128L, iters = 1,
        onSwapStep = s => if (s == "written") throw Killed(s))
    }
    search(d1) shouldBe preAnswer
    Similarity.retrainIvfIndex(d1, spark, nCells = 0,
      targetPerCell = 128L, iters = 1)
    search(d1) shouldBe postAnswer
    // kill AT or AFTER the commit point: every later entry rolls the
    // swap FORWARD — codebook and index can never serve mismatched
    Seq("retired", "sides-swapped", "swapped").foreach { at =>
      val d = freshDir()
      intercept[Killed] {
        Similarity.retrainIvfIndex(d, spark, nCells = 0,
          targetPerCell = 128L, iters = 1,
          onSwapStep = s => if (s == at) throw Killed(s))
      }
      withClue(s"killed at $at: ") {
        search(d) shouldBe postAnswer // searchIvfIndex recovers on entry
        search(d) shouldBe postAnswer // and recovery is idempotent
      }
    }
  }

  test("compaction swap killed between its renames recovers: the next " +
    "entry finishes the swap and the answer is unchanged") {
    case class Killed(step: String) extends RuntimeException(step)
    val n = emb.count()
    val half = n / 2
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact-kill").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < half), dir,
      nCells = Similarity.cellsFor(half, 128L))
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= half), dir)
    def search() = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 10), dir, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val before = search()
    val rows = spark.read.parquet(s"$dir/index").count()
    intercept[Killed] {
      Similarity.compactIvfIndex(dir, spark,
        onSwapStep = s => if (s == "retired") throw Killed(s))
    }
    // the ADVICE-r13 crash state: no index/ at the path, data stranded
    // in index_old + index_compacting — recovery must roll forward
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/index")) shouldBe false
    search() shouldBe before
    spark.read.parquet(s"$dir/index").count() shouldBe rows
    Seq("index_old", "index_compacting").foreach { s =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$s")) shouldBe false
    }
    // and a fresh compact over the recovered layout still works
    Similarity.compactIvfIndex(dir, spark)
    search() shouldBe before
  }

  test("index layout: every corpus vector in exactly one cell partition") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx-layout").toString
    val cells = Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    val dirs = new java.io.File(s"$dir/index").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell_id="))
    dirs.length should be <= cells
    dirs.length should be >= 2
    val back = spark.read.parquet(s"$dir/index")
    back.count() shouldBe emb.count()
    back.select("vec_id").distinct().count() shouldBe emb.count()
    // codebook row count = the returned cell count
    spark.read.parquet(s"$dir/codebook").count() shouldBe cells.toLong
  }

  test("probe reads are partition-pruned: unprobed cells never scanned") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx-prune").toString
    val cells = Similarity.writeIvfIndex(emb, dir, nCells = 0, targetPerCell = 128L)
    // ONE query at nProbe=2 probes at most 2 of the 4 cells this
    // fixture yields — strictly fewer than the layout, so the pruning
    // is observable in the selected-partition count
    val out = Similarity.searchIvfIndex(
      emb.filter(col("vec_id") < 1), dir, k = 5, nProbe = 2)
    val plan = out.queryExecution.executedPlan.toString
    // the cell filter must reach the scan as a PARTITION filter (prunes
    // directory listings), not a post-scan data filter
    plan should include("PartitionFilters")
    plan should include("cell_id")
    // the scan's selected partitions are the probed cells only
    // AQE wraps the tree and materialized stages (QueryStageExec) hide
    // their subtrees from plain collect — execute, then walk manually
    out.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case sc: FileSourceScanExec => Seq(sc)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allScans(r.child)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(out.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/index")))
    scans should not be empty
    val readParts = scans.map(sc =>
      sc.relation.location.listFiles(sc.partitionFilters, Nil).length).max
    readParts should be < cells
    readParts should be <= 2
  }
}
