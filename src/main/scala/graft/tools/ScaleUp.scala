package graft.tools

import graft.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off sf1 generator for the scale checkpoint: key-shifted copies of
  * the sf0.1 tables (default ×10 → ~6M lineitem rows), written OUTSIDE
  * the read-only testdata tree. Referential integrity is preserved by
  * shifting every key of a domain by the same per-copy offset (copy k's
  * orders reference copy k's customers, etc.); the small dims
  * (region/nation) are copied once, exactly like a real warehouse where
  * dimensions don't grow with fact volume.
  *
  * The content transforms (`scaledDocuments`/`scaledEmbeddings`) are
  * exposed as pure DataFrame→DataFrame functions so `ScaleUpSpec` can
  * assert the honesty invariant that keeps the scale measurement valid:
  * each copy's internal near-dup rate matches the original's, and NO
  * cross-copy near-dup pairs are introduced. A verbatim ×10 hands every
  * document 9 exact twins and every embedding 9 zero-distance neighbors,
  * so pair-producing operators (minhash verify, embedding dedup, overlap
  * spans) would measure the quadratic artifact, not scaling — round 8's
  * first sf1 pass measured exactly that before the perturbation was added.
  *
  * Each table lands as a SINGLE parquet file (`<dst>/<t>.parquet`) so
  * the DuckDB oracle tooling (`tools/compare_oracle.py`) can read the
  * scaled dir exactly like a driver sfDir.
  *
  * Usage: `runMain graft.tools.ScaleUp [srcDir] [dstDir] [copies]`
  */
object ScaleUp {
  /** Per-copy key offset: max key at sf0.1 is ~6e5; 1e8 per copy keeps
    * key domains disjoint between copies.
    */
  val OFF = 100000000L

  private def copyIds(df: DataFrame, copies: Int): DataFrame =
    df.sparkSession.range(copies).select(col("id").as("_k"))

  /** ×copies with every key column shifted by the same per-copy offset. */
  def shifted(df: DataFrame, keys: Seq[String], copies: Int): DataFrame =
    df.crossJoin(copyIds(df, copies)).select(df.columns.toSeq.map {
      case c if keys.contains(c) => (col(c) + col("_k") * OFF).as(c)
      case c                     => col(c)
    }: _*)

  /** ×copies of the documents table with copy 0 verbatim and every other
    * copy's text PERTURBED per token: one changed shingle would leave
    * cross-copy Jaccard ≈ (n-1)/(n+1) — still a "near-dup" to any
    * shingle-based operator — whereas suffixing EVERY token with the copy
    * id drops cross-copy shingle Jaccard to 0 while preserving
    * length/token-count/frequency shape (and therefore the per-copy dup
    * distribution).
    */
  def scaledDocuments(docs: DataFrame, copies: Int): DataFrame =
    docs.crossJoin(copyIds(docs, copies)).select(
      (col("doc_id") + col("_k") * OFF).as("doc_id"),
      when(col("_k") === 0, col("text"))
        .otherwise(regexp_replace(coalesce(col("text"), lit("")),
          lit("(\\S+)"), concat(lit("$1c"), col("_k")))).as("text"),
      col("lang"), col("source"), col("n_chars"))
    // perturbed copies got ~2 chars per token longer: restamp n_chars
    // from the actual text so the metadata stays consistent with what
    // it describes (copy 0 keeps the original stamp)
    .withColumn("n_chars",
      when(col("doc_id") < OFF, col("n_chars"))
        .otherwise(length(col("text")).cast("long")))

  /** ×copies of the embeddings table with copy 0 verbatim and every other
    * copy transformed by a deterministic per-copy SIGNED PERMUTATION of
    * the dimensions (`x_i → s_i · x_{π_k(i)}`). A signed permutation is
    * orthogonal, so it preserves every within-copy norm and cosine EXACTLY
    * — each copy has the same near-dup pair set as the original at any
    * threshold (the per-copy-dup-rate honesty invariant) — while
    * decorrelating cross-copy pairs: the cosine of `v` against its own
    * rotated twin is a random-signs sum with mean 0 and std ≈ 1/√d, the
    * same as an unrelated pair. (The previous additive-noise perturbation
    * failed BOTH properties: it left a systematic ≈1/|noise| cross-copy
    * cosine AND collapsed the planted within-copy near-dup clusters to
    * noise level, so the scaled corpus had almost no embedding dups.)
    */
  def scaledEmbeddings(emb: DataFrame, copies: Int): DataFrame = {
    val spark = emb.sparkSession
    val d = emb.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head().getInt(0)
    val perms = (0 until copies).map { k =>
      // copy 0 is the identity (verbatim); others seeded by copy id only,
      // so the transform is reproducible run-to-run
      val rnd = new scala.util.Random(0x5ca1ab1eL * 31 + k)
      val p =
        if (k == 0) (0 until d).toVector else rnd.shuffle((0 until d).toVector)
      val s = Vector.fill(d)(if (k != 0 && rnd.nextBoolean()) -1 else 1)
      (k.toLong, p, s)
    }
    import spark.implicits._
    val permDf = perms.toDF("_k", "_perm", "_sign")
    emb.crossJoin(copyIds(emb, copies))
      .join(broadcast(permDf), "_k")
      .select(
        (col("vec_id") + col("_k") * OFF).as("vec_id"),
        when(col("_k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (_, i) =>
            (element_at(col("_sign"), i + 1) *
              element_at(col("embedding"), element_at(col("_perm"), i + 1) + 1))
              .cast("float")))
          .as("embedding"),
        col("label"))
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val spark = Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // single-file landing: write to a scratch dir, move the one part file
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles.find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $tmp"))
      val target = java.nio.file.Paths.get(s"$dst/$name.parquet")
      java.nio.file.Files.deleteIfExists(target)
      java.nio.file.Files.move(part.toPath, target)
      dir.listFiles.foreach(_.delete()); dir.delete()
      println(s"[scaleup] $name -> $target")
    }

    new java.io.File(dst).mkdirs()
    Seq("region", "nation").foreach(t => writeOne(read(t), t))
    Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part"     -> Seq("p_partkey"),
      "orders"   -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events"   -> Seq("event_id", "user_id")
    ).foreach { case (t, keys) => writeOne(shifted(read(t), keys, copies), t) }
    writeOne(scaledDocuments(read("documents"), copies), "documents")
    writeOne(scaledEmbeddings(read("embeddings"), copies), "embeddings")
    spark.stop()
  }
}
