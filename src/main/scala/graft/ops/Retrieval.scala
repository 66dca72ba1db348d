package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: a lexical ranking (BM25) and a dense-embedding
  * ranking of the same query, fused by reciprocal-rank fusion (RRF,
  * Cormack et al.) — the standard recipe for finding the documents
  * "about" a topic when neither sparse nor dense retrieval alone is
  * trustworthy (e.g. mining a 100 TB corpus for benchmark-adjacent or
  * topic-targeted documents).
  *
  * Scale shape: each leg produces a TOP-K list (tiny) by its own
  * scale-safe plan — BM25 is one counting aggregation, the dense leg a
  * 1-row broadcast against the corpus (swap in [[Similarity.lshTopK]] /
  * [[Similarity.ivfTopK]] for the ANN path at scale; the fuse contract
  * is just `(doc_id, rank)`). The fusion itself touches only the k-row
  * lists — never data.
  */
object Retrieval {

  /** Dense cosine top-k of the corpus against a LITERAL query text:
    * hash-embed the query ([[TextAnalysis.hashEmbed]]), broadcast the
    * single query row against the hash-embedded corpus, exact quantized
    * cosine, top-k. One narrow corpus pass + a k-row TakeOrdered — the
    * brute oracle path; ANN variants share the output contract.
    */
  def denseTopK(
      docs: DataFrame,
      queryText: String,
      k: Int,
      dim: Int = 64): DataFrame = {
    require(queryText.trim.nonEmpty, "query text must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val native = graft.plans.GraftExtensions.available(spark)
    val q = TextAnalysis.hashEmbed(Seq((-1L, queryText)).toDF("doc_id", "text"), dim)
      .select(Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.qdot(col("qv"), col("qv"), native))
    val corpus = TextAnalysis.hashEmbed(docs, dim)
      .select(col("vec_id").as("doc_id"),
        Similarity.quantize(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.qdot(col("cv"), col("cv"), native))
    corpus.join(broadcast(q))
      .select(col("doc_id"),
        Similarity.qcosinePre(
          Similarity.qdot(col("qv"), col("cv"), native),
          col("qn"), col("cn")).as("sim"))
      .orderBy(desc("sim"), asc("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion: each ranking contributes
    * `floor(1e6 / (rrfK + rank))` micro-points per document; documents
    * are ordered by total points. Integer micro-units (not the textbook
    * float `1/(k+r)`) so the fused score is exactly replayable in any
    * engine. Inputs are top-k lists — the union/agg runs over k·lists
    * rows, never the corpus.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      rrfK: Int = 60,
      topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings.map(_.select(col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
      .select(col("doc_id"),
        floor(lit(1000000.0) / (col("rank") + rrfK)).cast("long").as("pts"))
      .groupBy("doc_id")
      .agg(sum("pts").as("rrf_micro"), count(lit(1)).as("lists"))
      .orderBy(desc("rrf_micro"), asc("doc_id"))
      .limit(topN)
  }

  /** Boolean AND retrieval: documents whose token set contains EVERY
    * query term. ONE narrow codegen'd filter (an `array_contains` per
    * term over the tokenized text — no explode, no shuffle), so the
    * plan is a pruned scan with the conjunction pushed against it; at
    * 100 TB this is the cheap pre-filter in front of BM25/RRF ranking.
    */
  def booleanSearch(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "booleanSearch needs at least one term")
    // normalize terms like the tokens (a raw "Spark" would match
    // nothing); Locale.ROOT so a tr_TR JVM's dotless-i lowering can't
    // diverge from Spark's locale-independent lower()
    val normed = terms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
    require(normed.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"terms must be single non-empty words, got $terms")
    val toks = TextAnalysis.normTokens(col(textCol))
    docs
      .filter(normed.map(t => array_contains(toks, t)).reduce(_ && _))
      .select(col("doc_id"))
  }

  /** BM25 + dense-cosine hybrid for a term query, RRF-fused. The dense
    * leg embeds the query terms joined as one text. Both legs rank with
    * ties broken on doc_id, so the fused list is fully deterministic.
    */
  def hybridRrf(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val lex = TextAnalysis.bm25(docs, terms, k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(desc("bm25_micro"), asc("doc_id"))).cast("long"))
    val dense = denseTopK(docs, terms.mkString(" "), k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(desc("sim"), asc("doc_id"))).cast("long"))
    rrfFuse(Seq(lex, dense), rrfK, k)
  }
}
