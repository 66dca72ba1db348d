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
  * Each table lands as a SINGLE parquet file (`<dst>/<t>.parquet`) so
  * the DuckDB oracle tooling (`tools/compare_oracle.py`) can read the
  * scaled dir exactly like a driver sfDir.
  *
  * Usage: `runMain graft.tools.ScaleUp [srcDir] [dstDir] [copies]`
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, s"copies must be >= 1, got $copies")
    // max key at sf0.1 is ~6e5; 1e8 per copy keeps domains disjoint
    val OFF = 100000000L
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

    val ks = spark.range(copies).select(col("id").as("_k"))

    def shifted(df: DataFrame, keys: Seq[String]): DataFrame =
      df.crossJoin(ks).select(df.columns.toSeq.map {
        case c if keys.contains(c) => (col(c) + col("_k") * OFF).as(c)
        case c                     => col(c)
      }: _*)

    // Copies of content-bearing tables are PERTURBED (copy 0 stays
    // verbatim): a verbatim ×10 would hand every document 9 exact twins
    // and every embedding 9 zero-distance neighbors, so pair-producing
    // operators (minhash verify, embedding dedup, overlap spans) would
    // measure the quadratic artifact, not scaling — the per-copy dup
    // distribution is what a real 10× corpus has.
    def scaledDocuments(): DataFrame =
      read("documents").crossJoin(ks).select(
        (col("doc_id") + col("_k") * OFF).as("doc_id"),
        // suffix EVERY token with the copy id: one changed shingle would
        // leave cross-copy Jaccard ≈ (n-1)/(n+1) — still a "near-dup" to
        // any shingle-based operator — whereas per-token rewrites drop it
        // to 0 while preserving length/token-count/frequency shape
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

    def scaledEmbeddings(): DataFrame =
      read("embeddings").crossJoin(ks).select(
        (col("vec_id") + col("_k") * OFF).as("vec_id"),
        when(col("_k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            // deterministic per-(vector, dim, copy) uniform noise in [-1, 1]
            (x + (pmod(xxhash64(col("vec_id"), i, col("_k")), lit(2001L))
              .cast("double") / 1000.0 - 1.0)).cast("float")))
          .as("embedding"),
        col("label"))

    new java.io.File(dst).mkdirs()
    Seq("region", "nation").foreach(t => writeOne(read(t), t))
    Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part"     -> Seq("p_partkey"),
      "orders"   -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events"   -> Seq("event_id", "user_id")
    ).foreach { case (t, keys) => writeOne(shifted(read(t), keys), t) }
    writeOne(scaledDocuments(), "documents")
    writeOne(scaledEmbeddings(), "embeddings")
    spark.stop()
  }
}
