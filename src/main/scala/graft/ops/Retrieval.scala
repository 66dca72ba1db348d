package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-token ±1 sign embeddings for a token array, BIT-PACKED: bit
    * `j` of token `t`'s mask is set iff the portable seeded hash
    * `mix(h28(t), j)` is even — the [[Similarity.rhpSignature]] trick
    * applied per TOKEN, md5-based so the oracle replays it bit-exactly.
    * ±1 components make every token vector the SAME norm, so the
    * integer dot `dim − 2·popcount(a XOR b)` ranks exactly like cosine
    * — and packing `dim` signs into ONE long turns each token×token
    * comparison into one XOR + one popcount instead of a `dim`-element
    * fold (the binary-MaxSim trick; ~20× on the scoring loop, measured).
    *
    * The mask accumulates high-bit-first (`acc·2 + bit`), numerically
    * equal to `Σ bit_j·2^j` — the form the oracle computes with `<<`.
    */
  def tokenSignMasks(toks: Column, dim: Int): Column =
    tokenSignMasks(toks, dim, native = false)

  /** `native = true` routes through the registered
    * [[graft.plans.SignMasks]] expression — the identical md5-prefix +
    * seeded-mix arithmetic as one static loop instead of this
    * CodegenFallback transform→aggregate chain (interpreted boxed
    * lambdas per token×bit; profiled as the ColBERT build's hot path
    * at sf0.1). Same hash family, same bits, same oracle replay —
    * only the evaluation engine differs, like [[Similarity.qdot]].
    */
  def tokenSignMasks(toks: Column, dim: Int, native: Boolean): Column = {
    require(dim >= 1 && dim <= 62, s"dim must be in [1, 62], got $dim")
    if (native) call_function("graft_sign_masks", toks, lit(dim))
    else transform(toks, t =>
      graft.functions.ColumnOps.bind(graft.functions.PortableHash.h28(t)) {
        p =>
          aggregate(sequence(lit(dim - 1), lit(0), lit(-1)), lit(0L),
            (acc, j) => acc * 2 +
              when(graft.functions.PortableHash.mix(p, j) % 2 === 0, lit(1L))
                .otherwise(lit(0L)))
      })
  }

  /** Late-interaction retrieval — ColBERT's MaxSim criterion (Khattab &
    * Zaharia 2020) on deterministic token sign-embeddings:
    *
    *   score(q, d) = Σ_{t ∈ q.tokens}  max_{s ∈ d.tokens}  ⟨e(t), e(s)⟩
    *
    * Every query token finds its best-matching document token, so a doc
    * scores high by covering ALL the query's terms somewhere — the
    * fine-grained relevance bag-of-words dense vectors blur away.
    * Exact-integer end to end (±1 embeddings: dot ≡ cosine rank).
    *
    * Scale shape (the deployed ColBERT recipe): candidates come from an
    * INVERTED-INDEX equi-join on shared tokens — with a self-calibrating
    * stopword guard (tokens in > `dfCapPermille`‰ of docs generate no
    * candidates; the [[TextAnalysis.winnowPairs]] lesson) — so candidate
    * volume, not corpus size, sets the cost; the MaxSim itself runs
    * IN-ROW over the pair's two sign-vector arrays (one codegen'd
    * expression, ≤ maxQueryToks×maxDocToks×dim integer mults per pair),
    * never as a token×token row explosion. The query side broadcasts;
    * the corpus-scale shuffles are the token equi-join and the per-query
    * top-k window, both inherent. Token lists cap POSITIONALLY
    * (first-N, slice) so both engines see identical lists.
    */
  def lateInteractionTopK(
      docs: DataFrame,
      queryMaxId: Long,
      k: Int,
      dim: Int = 16,
      maxQueryToks: Int = 16,
      maxDocToks: Int = 64,
      dfCapPermille: Int = 200,
      textCol: String = "text"): DataFrame = {
    val idx = lateInteractionIndex(docs, dim, maxQueryToks, maxDocToks,
      dfCapPermille, textCol)
    lateInteractionServe(
      docs.filter(col("doc_id") < queryMaxId)
        .select(col("doc_id").as("query_id"), col(textCol)),
      idx, k, textCol)
  }

  /** The SERVING structures behind [[lateInteractionTopK]], built ONCE
    * from the corpus and reused across query batches (the
    * [[graft.ops.Similarity.writeIvfIndex]] "build once, query many"
    * split applied to late interaction): the df-capped token whitelist,
    * the inverted `(tok, cand_id)` candidate postings, and the per-doc
    * bit-packed sign masks. All three are pinned with `localCheckpoint`
    * so a stream of query micro-batches re-reads cached blocks instead
    * of re-deriving the corpus pass per batch; release via
    * [[Dedup.releaseCheckpoints]] on any serve output (the pins sit in
    * its plan) when the serving session retires the index.
    */
  final case class LateInteractionIndex(
      keep: DataFrame,
      ctok: DataFrame,
      masks: DataFrame,
      dim: Int,
      maxQueryToks: Int,
      maxDocToks: Int)

  /** Build a [[LateInteractionIndex]] — one corpus pass feeding the df
    * counts, the candidate postings, and the scoring masks (parameter
    * semantics exactly [[lateInteractionTopK]]'s, which now builds one
    * of these per call).
    */
  def lateInteractionIndex(
      docs: DataFrame,
      dim: Int = 16,
      maxQueryToks: Int = 16,
      maxDocToks: Int = 64,
      dfCapPermille: Int = 200,
      textCol: String = "text"): LateInteractionIndex = {
    require(dim > 0 && maxQueryToks > 0 && maxDocToks > 0,
      "dims and caps must be positive")
    val toks = TextAnalysis.normTokens(coalesce(col(textCol), lit("")))
    // feeds the df counts, the candidate legs and the scoring arrays —
    // checkpoint so the corpus scans once (the distributionDrift rule)
    val base = docs.select(col("doc_id"),
      slice(toks, 1, maxDocToks).as("ctoks"))
      .localCheckpoint()
    val dfTab = base
      .select(col("doc_id"), explode(array_distinct(col("ctoks"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val keep = dfTab
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n_docs"))))
      .filter(col("df") * 1000 <= lit(dfCapPermille.toLong) * col("n_docs"))
      .select("tok")
      .localCheckpoint()
    val ctok = base
      .select(col("doc_id").as("cand_id"),
        explode(array_distinct(col("ctoks"))).as("tok"))
      .join(keep, Seq("tok"))
      .localCheckpoint()
    val masks = base.select(col("doc_id").as("cand_id"),
      tokenSignMasks(col("ctoks"), dim,
        graft.plans.GraftExtensions.available(docs.sparkSession)).as("csv"))
      .localCheckpoint()
    // base fed the three eager checkpoints above and appears in NO
    // serve plan — release it here or the pin outlives every caller's
    // releaseCheckpoints (which only sees LogicalRDDs in the final plan)
    Dedup.releaseCheckpoints(base)
    LateInteractionIndex(keep, ctok, masks, dim, maxQueryToks, maxDocToks)
  }

  /** Score a batch of queries `(query_id, <textCol>)` against a built
    * [[LateInteractionIndex]] — the per-batch half of the serving
    * split, and exactly [[lateInteractionTopK]]'s ranking (shared
    * oracle): inverted-index candidates from the query's kept tokens,
    * in-row bit-packed MaxSim, (score DESC, cand_id ASC) top-k.
    * Query token lists cap at `min(maxQueryToks, maxDocToks)` — the
    * identical positional slice the self-query batch path takes.
    * A candidate equal to the query id is excluded (self-match).
    */
  def lateInteractionServe(
      queries: DataFrame,
      idx: LateInteractionIndex,
      k: Int,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = TextAnalysis.normTokens(coalesce(col(textCol), lit("")))
    val qbase = queries.select(col("query_id"),
      slice(toks, 1, math.min(idx.maxQueryToks, idx.maxDocToks)).as("qtoks"))
    val qtok = qbase
      .select(col("query_id"), explode(array_distinct(col("qtoks"))).as("tok"))
      .join(idx.keep, Seq("tok"))
    val cand = qtok.join(idx.ctok, Seq("tok"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()
    val native = graft.plans.GraftExtensions.available(queries.sparkSession)
    val qv = qbase.select(col("query_id"),
      tokenSignMasks(col("qtoks"), idx.dim, native).as("qsv"))
    // max dot = dim − 2·min hamming: one XOR + popcount per token pair.
    // Native path: the higher-order-function form below is
    // CodegenFallback — interpreted lambda closures per candidate pair
    // owned ~2 s of every serve at sf0.1 (profiled r15-opt); the
    // registered [[graft.plans.MaxSimScore]] computes the identical
    // integer as one codegen'd loop. Fallback keeps vanilla sessions
    // working (same exact semantics, either engine).
    val maxSim: Column =
      if (native)
        call_function("graft_maxsim", col("qsv"), col("csv"), lit(idx.dim))
      else
        aggregate(col("qsv"), lit(0L), (acc, q) =>
          acc + lit(idx.dim.toLong) - lit(2L) *
            array_min(transform(col("csv"), c =>
              bit_count(q.bitwiseXOR(c)).cast("long"))))
    val scored = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(idx.masks, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), maxSim.as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** STREAMING serving twin: queries arrive as a micro-batch stream and
    * each batch scores against the cached postings+masks index through
    * `foreachBatch` — the standard Structured Streaming shape when the
    * per-batch plan needs batch-only operators (the candidate
    * `distinct` and the per-query rank window here), and the same
    * at-least-once contract as [[graft.streaming.SingerStream]]:
    * serving is STATELESS and pure in the batch, so a crash-replayed
    * batch hands `sink` identical rows — idempotent for any
    * keyed/overwrite sink. Batch ≡ stream is spec'd
    * ([[graft.ops.RetrievalSpec]], MemoryStream across two batches) and
    * the batch twin `q_late_interaction_stream` shares
    * `q_late_interaction`'s oracle.
    */
  def lateInteractionServeStream(
      queryStream: DataFrame,
      idx: LateInteractionIndex,
      k: Int,
      textCol: String = "text")(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(lateInteractionServe(batch, idx, k, textCol), batchId)
    }
}
