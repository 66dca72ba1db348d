package graft.tools

import graft.TestSpark
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The honesty invariant behind the sf1 scale checkpoint (VERDICT r8 #5):
  * `ScaleUp`'s content perturbation must keep each copy's internal dup
  * distribution identical to the original's while introducing ZERO
  * cross-copy near-dup pairs — otherwise the scaled corpus measures the
  * copying artifact (every doc gains copies-1 near-twins, pair ops grow
  * quadratically in the copy count), not real scaling. Round 8's first
  * sf1 pass measured exactly that artifact before the perturbation was
  * added; this spec pins the invariant so a future content table can't
  * silently scale verbatim.
  */
class ScaleUpSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  lazy val spark = TestSpark.init()
  private val sfDir = "/root/testdata/sf0.001"
  private val OFF = ScaleUp.OFF

  test("scaledDocuments: copy sizes, disjoint key domains, exact-dup " +
    "group-size distribution identical in every copy") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val out = ScaleUp.scaledDocuments(docs, 3)
    out.count() shouldBe 3 * n

    val perCopy = out
      .groupBy(floor(col("doc_id") / OFF).cast("int").as("copy"))
      .agg(count(lit(1)).as("rows"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    perCopy.map(_._1).toSeq shouldBe Seq(0, 1, 2)
    all(perCopy.map(_._2)) shouldBe n
    // key domains disjoint: every copy's ids live inside its own offset band
    perCopy.foreach { case (k, _, lo, hi) =>
      lo should be >= k * OFF
      hi should be < (k + 1) * OFF
    }

    // exact-dup structure: the multiset of duplicate-group sizes (by text
    // digest) must be the SAME in every copy — per-token rewriting maps
    // equal texts to equal texts and distinct texts to distinct texts
    val dist = out
      .groupBy(floor(col("doc_id") / OFF).cast("int").as("copy"),
        md5(coalesce(col("text"), lit(""))).as("digest"))
      .agg(count(lit(1)).as("sz"))
      .groupBy("copy", "sz").agg(count(lit(1)).as("groups"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
    dist(1) shouldBe dist(0)
    dist(2) shouldBe dist(0)
  }

  test("scaledDocuments: within-copy shingle Jaccard preserved exactly, " +
    "cross-copy Jaccard exactly 0") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .where(functions.length(coalesce(col("text"), lit(""))) > 0)
      .orderBy("doc_id").limit(40)
    val out = ScaleUp.scaledDocuments(docs, 2)

    // 3-token shingle sets per (copy, base doc)
    val sh = out
      .select(floor(col("doc_id") / OFF).cast("int").as("copy"),
        pmod(col("doc_id"), lit(OFF)).as("base"),
        split(trim(col("text")), "\\s+").as("toks"))
      .where(functions.size(col("toks")) >= 3)
      .select(col("copy"), col("base"),
        array_distinct(transform(sequence(lit(0), functions.size(col("toks")) - 3),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(3))))).as("grams"))

    val a = sh.select(col("copy"), col("base").as("ba"), col("grams").as("ga"))
    val b = sh.select(col("copy"), col("base").as("bb"), col("grams").as("gb"))
    // all within-copy pairs over the 40-doc sample: jaccard must be a pure
    // function of the base pair, independent of the copy
    val within = a.join(b, Seq("copy")).where(col("ba") < col("bb"))
      .select(col("copy"), col("ba"), col("bb"),
        (functions.size(array_intersect(col("ga"), col("gb"))).cast("double") /
          functions.size(array_union(col("ga"), col("gb")))).as("j"))
      .groupBy("ba", "bb")
      .agg(countDistinct(col("j")).as("nj"), count(lit(1)).as("copies"))
      .collect()
    within.length should be > 0
    all(within.map(_.getLong(3))) shouldBe 2L // both copies produced the pair
    all(within.map(_.getLong(2))) shouldBe 1L // identical jaccard across copies

    // cross-copy: the SAME base doc in copy 0 vs copy 1 shares no shingle
    val cross = sh.where(col("copy") === 0)
      .select(col("base"), col("grams").as("g0"))
      .join(sh.where(col("copy") === 1)
        .select(col("base"), col("grams").as("g1")), "base")
      .select(functions.size(array_intersect(col("g0"), col("g1"))).as("common"))
      .agg(max(col("common"))).head().getInt(0)
    cross shouldBe 0
  }

  test("scaledEmbeddings: counts/labels preserved per copy, cross-copy " +
    "cosine far below any near-dup threshold") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val out = ScaleUp.scaledEmbeddings(emb, 2)
    out.count() shouldBe 2 * n
    // label histogram identical per copy
    val lh = out
      .groupBy(floor(col("vec_id") / OFF).cast("int").as("copy"), col("label"))
      .count().collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.map(r => (r.getInt(1), r.getLong(2))).toSet
      }
    lh(1) shouldBe lh(0)

    def cosine = {
      val dot = aggregate(zip_with(col("e0"), col("e1"),
        (x, y) => (x * y).cast("double")), lit(0.0), (acc, v) => acc + v)
      def nrm(c: String) = sqrt(aggregate(
        transform(col(c), x => (x * x).cast("double")), lit(0.0),
        (acc, v) => acc + v))
      dot / (nrm("e0") * nrm("e1"))
    }
    // cross-copy: a vector vs its own rotated twin behaves like an
    // UNRELATED pair — random-signs sum, mean 0, std ≈ 1/√d. Mean |cos|
    // near the 2/√(2πd) ≈ 0.1 noise level (d = 64) is the decorrelation
    // signal; anything near 1 means the transform silently degraded to
    // verbatim copying
    val stats = out.where(col("vec_id") < OFF)
      .select(col("vec_id").as("base"), col("embedding").as("e0"))
      .join(out.where(col("vec_id") >= OFF)
        .select((col("vec_id") - OFF).as("base"), col("embedding").as("e1")),
        "base")
      .select(abs(cosine).as("cos"))
      .agg(avg(col("cos")).as("mean"), max(col("cos")).as("max")).head()
    stats.getDouble(0) should be < 0.2
    stats.getDouble(1) should be < 0.75

    // within-copy geometry EXACTLY preserved (signed permutation is
    // orthogonal): every sampled pair's cosine in copy 1 equals its copy-0
    // cosine up to float summation order — this is the per-copy-dup-rate
    // invariant itself (same near-dup pair set at any threshold)
    def copyPairs(k: Int) = {
      val base = out
        .where(col("vec_id") >= k * OFF && col("vec_id") < k * OFF + 60)
        .select(pmod(col("vec_id"), lit(OFF)).as("base"), col("embedding"))
      base.select(col("base").as("ba"), col("embedding").as("e0"))
        .join(base.select(col("base").as("bb"), col("embedding").as("e1")),
          col("ba") < col("bb"))
        .select(col("ba"), col("bb"), cosine.as(s"cos$k"))
    }
    val drift = copyPairs(0).join(copyPairs(1), Seq("ba", "bb"))
      .select(max(abs(col("cos0") - col("cos1")))).head().getDouble(0)
    drift should be < 1e-5
  }

  test("recall slice (vec_id < 2000) is invariant under scaling: " +
    "copy-0 only, bit-identical rows") {
    // q_embed_recall / q_embed_recall_probe2 / q_semantic_apply_recall
    // bound their quadratic truth leg to vec_id < 2000. For the sf1
    // checkpoint's recall rows to be comparable to sf0.1's, that slice
    // must select EXACTLY the unscaled corpus's slice at any copy count:
    // (a) the copy offset must clear the slice bound, so no rotated twin
    // can leak in and shift measured recall; (b) copy 0 must carry the
    // original rows verbatim. Both are structural properties of ScaleUp,
    // pinned here so a future offset/remap change can't silently turn
    // the sf1 recall row into a measurement of the scaling artifact.
    OFF should be > 2000L
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val out = ScaleUp.scaledEmbeddings(emb, 3)
    val origSlice = emb.where(col("vec_id") < 2000)
    val scaledSlice = out.where(col("vec_id") < 2000)
    scaledSlice.count() shouldBe origSlice.count()
    // bit-identical in both directions (except is exact on float arrays)
    scaledSlice.exceptAll(origSlice).count() shouldBe 0
    origSlice.exceptAll(scaledSlice).count() shouldBe 0
  }
}
