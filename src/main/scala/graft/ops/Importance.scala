package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection scoring for pretraining corpora: hashed n-gram
  * importance weights (DSIR-style — Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling").
  *
  * Each document is scored by how much its hashed n-gram distribution
  * looks like a TARGET slice of the corpus versus the corpus as a
  * whole: per feature bucket `f`,
  *
  *   λ_f = ln((tgt_f + 1)/(tgtTotal + B)) − ln((raw_f + 1)/(rawTotal + B))
  *
  * (add-one smoothing over `B` buckets), and a document's score is the
  * sum of λ over its feature OCCURRENCES. Documents whose score is high
  * read like the target domain; resampling by this weight tilts a
  * 100 TB crawl toward it.
  *
  * Determinism: buckets come from [[PortableHash.h28]] (md5-prefix, both
  * engines identical); λ is quantized to micro-units ONCE PER BUCKET
  * (≤ B roundings total, not per document), and per-doc scores are then
  * EXACT long sums of those integers — independent of partitioning,
  * addition order, and engine (same argument as
  * [[TextAnalysis.bm25]]'s quantized scoring).
  *
  * Plan shape at 100 TB: the feature stream is a narrow
  * explode-project; the λ table is ONE aggregate over at most `B`
  * buckets (map-side partials make the shuffle `O(partitions × B)`),
  * broadcast back onto the feature stream — so the only data-sized
  * shuffle is the final per-doc sum, keyed on `doc_id`. Two passes over
  * the text, inherent to corpus-global statistics.
  */
object Importance {

  /** Per-document importance score against `targetPred` (e.g.
    * `col("lang") === "en"`: score every document by how English-like
    * its hashed bigram profile is).
    *
    * Output: `doc_id, n_feats, score_micro` — `score_micro` is the
    * exact long sum of micro-quantized λ over the document's n-gram
    * occurrences.
    */
  def importanceWeights(
      df: DataFrame,
      targetPred: Column,
      buckets: Int = 4096,
      n: Int = 2,
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val feats = df.select(
        col("doc_id"), targetPred.as("is_tgt"),
        // coalesce: NULL text keeps its row via the empty shingle, same
        // contract as unigramSurprisal
        explode(Dedup.shingles(coalesce(col(textCol), lit("")), n)).as("gram"))
      .select(
        col("doc_id"), col("is_tgt"),
        pmod(PortableHash.h28(col("gram")), lit(buckets.toLong)).as("bucket"))
    val stats = feats.groupBy("bucket").agg(
      count(lit(1)).as("raw_f"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_f"))
    val tot = stats.agg(
      sum("raw_f").as("raw_total"), sum("tgt_f").as("tgt_total"))
    val b = lit(buckets.toDouble)
    val lam = stats.crossJoin(broadcast(tot)).select(
      col("bucket"),
      round(
        (log((col("tgt_f") + lit(1.0)) / (col("tgt_total") + b))
          - log((col("raw_f") + lit(1.0)) / (col("raw_total") + b))) * 1e6)
        .cast("long").as("lam_micro"))
    feats.join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_feats"),
        sum("lam_micro").as("score_micro"))
  }

  /** Unigram language-model surprisal — the perplexity PROXY the CCNet
    * pipeline uses to split a crawl into head/middle/tail quality
    * buckets: score each document by the mean negative log-probability
    * of its tokens under the corpus's own unigram distribution. Low
    * surprisal = common, fluent text; high = rare-token soup (OCR junk,
    * code dumps, other languages).
    *
    * Per vocabulary word `w`: `s_w = round(ln(N/c_w)·1e6)` — quantized
    * ONCE per word (the [[importanceWeights]] / bm25 argument), then
    * document totals are exact long sums and the mean is an exact floor
    * division. Replays bit-for-bit in the oracle.
    *
    * Plan: one token-counting shuffle builds the vocab table; the token
    * stream joins it ON THE WORD (vocab-sized build side, data-sized
    * stream side) and folds per document. Same two-pass shape as
    * [[graft.ops.TextAnalysis.tfidfWeights]].
    */
  def unigramSurprisal(df: DataFrame, textCol: String = "text"): DataFrame = {
    // coalesce: a NULL-text doc must keep its row (as the empty-string
    // token) like an empty-text doc does — explode(NULL) would silently
    // drop it from the output, violating the one-row-per-doc contract
    val toks = df.select(col("doc_id"),
      explode(TextAnalysis.normTokens(coalesce(col(textCol), lit(""))))
        .as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum("c").as("n_total"))
    val scored = vocab.crossJoin(broadcast(tot)).select(
      col("w"),
      round(log(col("n_total").cast("double") / col("c")) * 1e6)
        .cast("long").as("s_micro"))
    toks.join(scored, Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("s_micro").as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"), col("sum_micro"),
        graft.functions.ColumnOps.fdivCol(col("sum_micro"), col("n_tokens"))
          .as("avg_micro"))
  }
}
