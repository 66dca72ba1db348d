package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching over a label vocabulary: the entity-resolution
  * shape (canonicalize a bounded vocabulary of names/titles, then map the
  * corpus through the resolved vocabulary), built on the native
  * [[graft.plans.JaroWinkler]] / [[graft.plans.DamerauLevenshtein]]
  * kernels plus Spark's built-in `levenshtein`.
  *
  * Scale shape: the quadratic DP never sees the corpus — `fuzzyPairs`
  * first reduces to DISTINCT labels (corpus-sized shuffle of short
  * strings, the cheap part), then self-joins within linguistic blocks
  * (first token × length band). Edit distance ≤ k implies length
  * difference ≤ k, so a band of width ≥ 2k+1 never splits a true pair
  * across more than two bands — callers chasing full recall at distance k
  * run the join once per band offset; the single-band default is the
  * standard blocking trade. Degenerate blocks (one token dominating the
  * vocabulary) are dropped by the same `capBuckets` guard the dedup
  * family uses, keeping Σ block² bounded.
  */
object FuzzyMatch {

  /** Register the edit-similarity expressions into a VANILLA session's
    * live function registry (idempotent). Graft sessions get them via
    * `spark.sql.extensions`; unlike the hash-family expressions these are
    * deterministic algorithms with one portable definition, so runtime
    * registration on a foreign session cannot create cross-corpus
    * mismatches.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.plans.GraftExtensions.functions
      .filter { case (ident, _, _) =>
        ident.funcName == "graft_jaro_winkler" ||
          ident.funcName == "graft_damerau_levenshtein"
      }
      .foreach { case (ident, info, builder) =>
        if (!reg.functionExists(ident))
          reg.registerFunction(ident, info, builder)
      }
  }

  /** Jaro-Winkler similarity (DuckDB/RapidFuzz conventions: 0 on empty,
    * boost only above 0.7). Requires the graft extensions or a prior
    * [[ensureRegistered]] on the frame's session.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** Full (unrestricted) Damerau-Levenshtein distance. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    call_function("graft_damerau_levenshtein", a, b)

  /** All label pairs within a (first-token, length-band) block, scored by
    * the three classic measures. Input: any frame with `labelCol`; the
    * vocabulary is `dropDuplicates`-reduced internally. Output columns:
    * `a_label, b_label, lev, dl, jw` with `a_label < b_label`.
    *
    * @param lenBand   width of the length-band blocking key (code points)
    * @param maxBucket drop blocks larger than this (skew guard)
    */
  def fuzzyPairs(
      df: DataFrame,
      labelCol: String = "label",
      lenBand: Int = 8,
      maxBucket: Int = 100000): DataFrame = {
    require(lenBand > 0, s"lenBand must be positive, got $lenBand")
    ensureRegistered(df.sparkSession)
    val labels = df
      .select(col(labelCol).as("label"))
      .where(col("label").isNotNull)
      .dropDuplicates("label")
      .select(col("label"),
        split_part(col("label"), lit(" "), lit(1)).as("_f"),
        floor(length(col("label")) / lenBand).as("_lb"))
    val blocked = Dedup.capBuckets(labels, Seq("_f", "_lb"), maxBucket)
    val a = blocked.select(col("_f"), col("_lb"), col("label").as("a_label"))
    val b = blocked.select(col("_f"), col("_lb"), col("label").as("b_label"))
    a.join(b, Seq("_f", "_lb"))
      .filter(col("a_label") < col("b_label"))
      .select(
        col("a_label"), col("b_label"),
        levenshtein(col("a_label"), col("b_label")).as("lev"),
        damerauLevenshtein(col("a_label"), col("b_label")).as("dl"),
        jaroWinkler(col("a_label"), col("b_label")).as("jw"))
  }
}
