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

  /** Interpolated bigram language-model surprisal — the next rung of the
    * perplexity-proxy ladder above [[unigramSurprisal]]: score each token
    * by `−ln(λ·p(w|u) + (1−λ)·p(w))` under the corpus's own bigram and
    * unigram distributions (Jelinek–Mercer interpolation, the classic
    * smoothing for count-based LMs), with a document's first token scored
    * by the unigram term alone (it has no context). Repetitive boilerplate
    * scores LOW (its bigrams are corpus-frequent) even when its unigrams
    * are rare — the signal the unigram proxy cannot see.
    *
    * `lambdaMicro` is the interpolation weight in micro-units
    * (700000 = λ 0.7); kept integral so query and oracle derive the same
    * double as `lambdaMicro / 1e6` — one exactly-representable division.
    *
    * Determinism: per distinct context pair `(u, w)` the interpolated
    * probability is computed in one fixed double expression —
    * `λ·(c_uw/c_u) + (1−λ)·(c_w/N)` — and quantized ONCE (≤ #distinct
    * bigrams roundings total); per-doc totals are then exact long sums,
    * same argument as [[unigramSurprisal]]. One stated shortcut: `c_u`
    * is the corpus-global count of `u`, INCLUDING occurrences as a
    * document-final token that emit no bigram, so `p(·|u)` sums to
    * slightly under 1 — the standard count-based-LM simplification,
    * shared with the oracle so the two engines agree exactly.
    *
    * Plan shape at 100 TB: the pair stream is a NARROW in-row transform
    * (`transform` over token positions — no window, no shuffle to form
    * bigrams); corpus statistics are keyed aggregations of the token and
    * pair streams (map-side partials shrink each exchange toward its
    * distinct-key count, but the bigram one is still keyed on the pair
    * stream); the score table joins back on `(u, w)` — a vocab-sized
    * build side that AQE broadcasts when it fits, a pair-keyed shuffle
    * when it doesn't — and the per-doc sum is the final shuffle. Same
    * two-pass-over-the-text shape as [[unigramSurprisal]].
    */
  def bigramSurprisal(
      df: DataFrame,
      lambdaMicro: Long = 700000L,
      textCol: String = "text"): DataFrame = {
    require(lambdaMicro >= 0 && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    val lam = lambdaMicro / 1e6
    // coalesce: NULL text keeps its row (normTokens('') = ['']), same
    // one-row-per-doc contract as unigramSurprisal
    val docToks = df.select(col("doc_id"),
      TextAnalysis.normTokens(coalesce(col(textCol), lit(""))).as("ws"))
    val toks = docToks.select(col("doc_id"), explode(col("ws")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c_w"))
    val tot = uni.agg(sum("c_w").as("n_total"))
    // adjacent-pair stream: transform over positions 1..len-1 keeps the
    // whole extraction inside one codegen'd projection. sequence(1, 0)
    // would step BACKWARD for single-token docs, so guard to an empty
    // pair array instead.
    val pairs = docToks.select(col("doc_id"),
      explode(
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(
              element_at(col("ws"), i).as("u"),
              element_at(col("ws"), i + 1).as("w"))))
          .otherwise(array().cast("array<struct<u:string,w:string>>")))
        .as("p"))
      .select(col("doc_id"), col("p.u"), col("p.w"))
    val big = pairs.groupBy("u", "w").agg(count(lit(1)).as("c_uw"))
    val pairScored = big
      .join(uni.select(col("w").as("u"), col("c_w").as("c_u")), Seq("u"))
      .join(uni, Seq("w"))
      .crossJoin(broadcast(tot))
      .select(col("u"), col("w"),
        round(-log(
          lit(lam) * (col("c_uw").cast("double") / col("c_u"))
            + lit(1.0 - lam) * (col("c_w").cast("double") / col("n_total")))
          * 1e6).cast("long").as("s_micro"))
    val uniScored = uni.crossJoin(broadcast(tot)).select(
      col("w"),
      round(log(col("n_total").cast("double") / col("c_w")) * 1e6)
        .cast("long").as("s_micro"))
    // first token of every doc (normTokens is never empty, so exactly one
    // row per doc survives into the union → the output keeps every doc)
    val firstScored = docToks
      .select(col("doc_id"), element_at(col("ws"), 1).as("w"))
      .join(uniScored, Seq("w"))
      .select(col("doc_id"), col("s_micro"))
    val pairStream = pairs.join(pairScored, Seq("u", "w"))
      .select(col("doc_id"), col("s_micro"))
    firstScored.unionAll(pairStream)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("s_micro").as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"), col("sum_micro"),
        graft.functions.ColumnOps.fdivCol(col("sum_micro"), col("n_tokens"))
          .as("avg_micro"))
  }

  /** Stupid-backoff trigram surprisal (Brants et al. 2007, "Large
    * Language Models in Machine Translation") scored under a HELD-OUT
    * training slice (`trainPred` rows) — the production LM-filter shape:
    * train counts once on a reference corpus, score every incoming shard
    * against them. Held-out training is also the regime where backoff
    * actually FIRES: scoring a corpus under its own counts never meets an
    * unseen n-gram, which would reduce this to a plain conditional-
    * probability table.
    *
    *   S(w₃|w₁w₂) = c₁₂₃/c₁₂              if the trigram was seen
    *              = α · c₂₃/c₂            else if the bigram was seen
    *              = α² · (c₃+1)/(N+V)     otherwise (add-one floor; OOV ok)
    *
    * A document's first token scores `S(w₁) = (c₁+1)/(N+V)`, its second
    * the bigram chain `c₁₂/c₁ | α·(c₂+1)/(N+V)`. Surprisal is `−ln S`.
    * α is `alphaMicro/1e6` (0.4 is Brants' published constant), kept
    * integral so both engines derive the identical double.
    *
    * Determinism: each distinct scored key — trigram, leading pair,
    * leading token — gets its probability computed in ONE fixed double
    * expression over exact integer counts and quantized ONCE to
    * micro-units; per-doc totals are exact long sums (the
    * [[bigramSurprisal]] argument). Counts include doc-final occurrences
    * (the same stated denominator shortcut, shared with the oracle).
    *
    * Plan shape at 100 TB: n-gram extraction is a narrow in-row
    * `transform`; training statistics are keyed aggregations of the
    * train slice (map-side combine shrinks them toward distinct-key
    * counts); score tables join back on their n-gram keys — the trigram
    * table is the one data-sized build side (pair-keyed exchange when it
    * outgrows AQE's broadcast threshold) — and the per-doc sum is the
    * final keyed shuffle. The scored corpus streams once; training
    * streams once.
    */
  def trigramBackoffSurprisal(
      df: DataFrame,
      trainPred: Column,
      alphaMicro: Long = 400000L,
      textCol: String = "text"): DataFrame = {
    require(alphaMicro >= 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in [0, 1e6], got $alphaMicro")
    val alpha = alphaMicro / 1e6
    val docToks = df.select(col("doc_id"),
      TextAnalysis.normTokens(coalesce(col(textCol), lit(""))).as("ws"))
    val trainToks = df.filter(trainPred).select(
      TextAnalysis.normTokens(coalesce(col(textCol), lit(""))).as("ws"))

    def pairsOf(toks: DataFrame, cols: Seq[Column]) = toks.select(
      (cols :+ explode(
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(
              element_at(col("ws"), i).as("u"),
              element_at(col("ws"), i + 1).as("w"))))
          .otherwise(array().cast("array<struct<u:string,w:string>>")))
        .as("p")): _*)
    def trisOf(toks: DataFrame, cols: Seq[Column]) = toks.select(
      (cols :+ explode(
        when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2), i =>
            struct(
              element_at(col("ws"), i).as("u"),
              element_at(col("ws"), i + 1).as("v"),
              element_at(col("ws"), i + 2).as("w"))))
          .otherwise(array().cast("array<struct<u:string,v:string,w:string>>")))
        .as("p")): _*)

    // training statistics (counts include doc-final occurrences)
    val uni = trainToks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val totals = uni.agg(
      sum("c_w").as("n_total"), count(lit(1)).as("v_size"))
    val big = pairsOf(trainToks, Seq.empty)
      .select(col("p.u"), col("p.w"))
      .groupBy("u", "w").agg(count(lit(1)).as("c_uw"))
    val tri = trisOf(trainToks, Seq.empty)
      .select(col("p.u"), col("p.v"), col("p.w"))
      .groupBy("u", "v", "w").agg(count(lit(1)).as("c_uvw"))

    // the add-one unigram floor, shared by every tier
    def uniFloor(cw: Column) =
      (coalesce(cw, lit(0L)).cast("double") + 1.0) /
        (col("n_total") + col("v_size")).cast("double")

    // scored-corpus streams
    val triStream = trisOf(docToks, Seq(col("doc_id")))
      .select(col("doc_id"), col("p.u"), col("p.v"), col("p.w"))
    val triScored = triStream.dropDuplicates("u", "v", "w")
      .select("u", "v", "w")
      .join(tri, Seq("u", "v", "w"), "left")
      .join(big.select(col("u"), col("w").as("v"), col("c_uw").as("c_uv")),
        Seq("u", "v"), "left")
      .join(big.select(col("u").as("v"), col("w"), col("c_uw").as("c_vw")),
        Seq("v", "w"), "left")
      .join(uni.select(col("w").as("v"), col("c_w").as("c_v")), Seq("v"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("u"), col("v"), col("w"),
        round(-log(
          when(col("c_uvw").isNotNull,
            col("c_uvw").cast("double") / col("c_uv"))
            .when(col("c_vw").isNotNull,
              lit(alpha) * (col("c_vw").cast("double") / col("c_v")))
            .otherwise(lit(alpha * alpha) * uniFloor(col("c_w"))))
          * 1e6).cast("long").as("s_micro"))
    val secondStream = docToks
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"),
        element_at(col("ws"), 1).as("u"), element_at(col("ws"), 2).as("w"))
    val secondScored = secondStream.dropDuplicates("u", "w").select("u", "w")
      .join(big, Seq("u", "w"), "left")
      .join(uni.select(col("w").as("u"), col("c_w").as("c_u")), Seq("u"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("u"), col("w"),
        round(-log(
          when(col("c_uw").isNotNull,
            col("c_uw").cast("double") / col("c_u"))
            .otherwise(lit(alpha) * uniFloor(col("c_w"))))
          * 1e6).cast("long").as("s_micro"))
    val firstStream = docToks
      .select(col("doc_id"), element_at(col("ws"), 1).as("w"))
    val firstScored = firstStream.dropDuplicates("w").select("w")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("w"),
        round(-log(uniFloor(col("c_w"))) * 1e6).cast("long").as("s_micro"))

    firstStream.join(firstScored, Seq("w")).select("doc_id", "s_micro")
      .unionAll(secondStream.join(secondScored, Seq("u", "w"))
        .select("doc_id", "s_micro"))
      .unionAll(triStream.join(triScored, Seq("u", "v", "w"))
        .select("doc_id", "s_micro"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("s_micro").as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"), col("sum_micro"),
        graft.functions.ColumnOps.fdivCol(col("sum_micro"), col("n_tokens"))
          .as("avg_micro"))
  }

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.1):
    * score every document with the held-out Stupid-Backoff trigram LM
    * ([[trigramBackoffSurprisal]]), then split EACH language into
    * perplexity terciles against its own distribution — the
    * self-calibrating cut that makes "well-written" mean the same thing
    * in every language (an absolute threshold tuned on English would
    * discard half of Chinese). `head` feeds pretraining as-is, `middle`
    * survives with sampling, `tail` is the candidate discard — the
    * labels downstream mixture planning consumes.
    *
    * The tercile thresholds come from [[CorpusOps.quantileSketch]] (the
    * mergeable compactor sketch): ONE bounded summary per partition per
    * language crosses the shuffle, and the languages-sized threshold
    * table broadcasts back onto the scored stream — the corpus is never
    * re-shuffled for the split. In the exact regime (docs per language
    * < capacity) the thresholds are the exact lower terciles and the
    * whole split replays verbatim in SQL; past capacity they carry the
    * sketch's ε-rank guarantee.
    *
    * Bucket rule, integer-exact on the micro-quantized surprisal:
    * `head` iff `avg_micro ≤ t333`, `middle` iff `≤ t667`, else `tail`,
    * where `t_p` is the smallest observed avg_micro whose cumulative
    * doc count reaches `p`‰ of the language (ties share a bucket — the
    * rule depends on the VALUE, never on row order).
    */
  def perplexityBuckets(
      df: DataFrame,
      trainPred: Column,
      groupCol: String = "lang",
      alphaMicro: Long = 400000L,
      textCol: String = "text",
      capacity: Int = 32768,
      native: Boolean = false): DataFrame = {
    // the scored table feeds BOTH the threshold sketch and the final
    // bucket join — without the (docs-sized, 4-column) checkpoint each
    // consumer re-derives the whole 5-join LM scoring pass from scratch
    // (the distributionDrift rule); callers free the blocks with
    // Dedup.releaseCheckpoints like every checkpointing operator here
    val ppl = trigramBackoffSurprisal(df, trainPred, alphaMicro, textCol)
      .join(df.select(col("doc_id"), col(groupCol)), Seq("doc_id"))
      .localCheckpoint()
    val thr = CorpusOps.quantileSketch(ppl, "avg_micro", groupCol,
        probsPermille = Seq(333, 667), capacity = capacity, native = native)
      .select(col(groupCol), col("p333").as("__t333"), col("p667").as("__t667"))
    ppl.join(broadcast(thr), Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("n_tokens"), col("avg_micro"),
        when(col("avg_micro") <= col("__t333"), lit("head"))
          .when(col("avg_micro") <= col("__t667"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Exported Stupid-Backoff serving model: six score tables in ONE
    * prefixed key space (see [[graft.plans.LmScore]]) + the three
    * per-position OOV constants. A bounded driver artifact like
    * [[NbServing]] — the KenLM shape CCNet ships to its filter workers.
    */
  final case class LmServing(
      keys: Seq[String], scores: Seq[Long],
      oov1: Long, oov2: Long, oov3: Long) {
    require(keys.size == scores.size, "one score per key")
  }

  /** Train the Stupid-Backoff trigram LM and EXPORT it for serving —
    * the train half of the train → export → serve lifecycle the NB
    * classifiers already have, applied to the CCNet perplexity filter.
    * Counting and quantization replicate [[trigramBackoffSurprisal]]
    * EXACTLY (same count tables, same one-double-per-distinct-key
    * micro rounding, computed in-engine before the vocab-sized
    * collect), so un-pruned serving is answer-equal to the in-plan
    * scorer by construction.
    *
    * Pruning (`maxTri`/`maxBig`/`maxUni`, most-frequent-first, ties by
    * key) is KenLM-style: a DROPPED n-gram is simply absent, so serving
    * falls to the NEXT BACKOFF TIER — the model degrades smoothly,
    * never cliffs to the OOV constant (contrast [[trainNbServing]],
    * where dropped tokens floor to OOV because NB has no lower tier —
    * a pruned unigram here likewise floors to the per-position OOV
    * constants, which IS its next tier). `maxUni` bounds the unigram
    * tier too, so the driver artifact is genuinely cap-bounded
    * (`3·maxUni + 2·maxBig + maxTri` entries), not vocab-sized.
    *
    * Training FAILS LOUDLY if any train token contains the key
    * separator [[graft.plans.LmScore.Sep]] (U+0001 — not whitespace, so
    * a hostile document could smuggle it through the whitespace split):
    * such a token would let two distinct n-grams share a composite key.
    * Serving-side the check is unnecessary — with a Sep-free trained
    * vocabulary, a Sep-carrying query token builds a key whose part
    * count matches no trained key in its tier, so it can only MISS and
    * fall through the backoff chain like any unseen token.
    *
    * At 100 TB the full trigram table is corpus-sized — pruning is what
    * makes the artifact shippable, exactly as in the deployed systems.
    */
  def trainLmServing(
      df: DataFrame,
      trainPred: Column,
      alphaMicro: Long = 400000L,
      textCol: String = "text",
      maxTri: Int = 1 << 20,
      maxBig: Int = 1 << 20,
      maxUni: Int = 1 << 20): LmServing = {
    require(alphaMicro >= 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in [0, 1e6], got $alphaMicro")
    require(maxTri > 0 && maxBig > 0 && maxUni > 0,
      "prune budgets must be positive")
    val alpha = alphaMicro / 1e6
    val sep = graft.plans.LmScore.Sep
    val trainToks = df.filter(trainPred).select(
      TextAnalysis.normTokens(coalesce(col(textCol), lit(""))).as("ws"))

    val uni = trainToks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val totals = uni.agg(
      sum("c_w").as("n_total"), count(lit(1)).as("v_size"))
    val big = trainToks.select(explode(
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(
              element_at(col("ws"), i).as("u"),
              element_at(col("ws"), i + 1).as("w"))))
          .otherwise(array().cast("array<struct<u:string,w:string>>")))
        .as("p"))
      .select(col("p.u"), col("p.w"))
      .groupBy("u", "w").agg(count(lit(1)).as("c_uw"))
    val tri = trainToks.select(explode(
        when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2), i =>
            struct(
              element_at(col("ws"), i).as("u"),
              element_at(col("ws"), i + 1).as("v"),
              element_at(col("ws"), i + 2).as("w"))))
          .otherwise(array().cast("array<struct<u:string,v:string,w:string>>")))
        .as("p"))
      .select(col("p.u"), col("p.v"), col("p.w"))
      .groupBy("u", "v", "w").agg(count(lit(1)).as("c_uvw"))

    // the one fixed double per distinct key, quantized IN-ENGINE — the
    // EXACT expressions trigramBackoffSurprisal scores with
    def uniFloor(cw: Column) =
      (coalesce(cw, lit(0L)).cast("double") + 1.0) /
        (col("n_total") + col("v_size")).cast("double")
    val uniRows = uni.crossJoin(broadcast(totals)).select(col("w"),
        round(-log(uniFloor(col("c_w"))) * 1e6).cast("long").as("s_u"),
        round(-log(lit(alpha) * uniFloor(col("c_w"))) * 1e6).cast("long")
          .as("s_f"),
        round(-log(lit(alpha * alpha) * uniFloor(col("c_w"))) * 1e6)
          .cast("long").as("s_g"),
        col("c_w"))
      .orderBy(desc("c_w"), asc("w"))
      .limit(maxUni).collect()
    val bigRows = big
      .join(uni.select(col("w").as("u"), col("c_w").as("c_u")), Seq("u"))
      .select(col("u"), col("w"),
        round(-log(col("c_uw").cast("double") / col("c_u")) * 1e6)
          .cast("long").as("s_b"),
        round(-log(lit(alpha) * (col("c_uw").cast("double") / col("c_u")))
          * 1e6).cast("long").as("s_c"),
        col("c_uw"))
      .orderBy(desc("c_uw"), asc("u"), asc("w"))
      .limit(maxBig).collect()
    val triRows = tri
      .join(big.select(col("u"), col("w").as("v"), col("c_uw").as("c_uv")),
        Seq("u", "v"))
      .select(col("u"), col("v"), col("w"),
        round(-log(col("c_uvw").cast("double") / col("c_uv")) * 1e6)
          .cast("long").as("s_t"),
        col("c_uvw"))
      .orderBy(desc("c_uvw"), asc("u"), asc("v"), asc("w"))
      .limit(maxTri).collect()
    val consts = totals.select(
        round(-log(uniFloor(lit(null).cast("long"))) * 1e6).cast("long")
          .as("o1"),
        round(-log(lit(alpha) * uniFloor(lit(null).cast("long"))) * 1e6)
          .cast("long").as("o2"),
        round(-log(lit(alpha * alpha) * uniFloor(lit(null).cast("long")))
          * 1e6).cast("long").as("o3"))
      .collect().head
    require(!consts.isNullAt(0),
      "trainLmServing: empty train slice — no tokens to count")

    // loud train-time rejection of separator-carrying tokens: every key
    // part must be Sep-free or two distinct n-grams could share a
    // composite key (a serving-only collision would be SILENT)
    def ck(w: String): String = {
      require(!w.contains(sep),
        s"trainLmServing: train token ${w.replace(sep, "<U+0001>")} " +
          "contains the key separator U+0001 — composite model keys " +
          "would collide; clean the train slice")
      w
    }
    val keys = Seq.newBuilder[String]
    val scores = Seq.newBuilder[Long]
    uniRows.foreach { r =>
      val w = ck(r.getString(0))
      keys += s"U$sep$w"; scores += r.getLong(1)
      keys += s"F$sep$w"; scores += r.getLong(2)
      keys += s"G$sep$w"; scores += r.getLong(3)
    }
    bigRows.foreach { r =>
      val (u, w) = (ck(r.getString(0)), ck(r.getString(1)))
      keys += s"B$sep$u$sep$w"
      scores += r.getLong(2)
      keys += s"C$sep$u$sep$w"
      scores += r.getLong(3)
    }
    triRows.foreach { r =>
      val (u, v, w) =
        (ck(r.getString(0)), ck(r.getString(1)), ck(r.getString(2)))
      keys += s"T$sep$u$sep$v$sep$w"
      scores += r.getLong(3)
    }
    LmServing(keys.result(), scores.result(),
      consts.getLong(0), consts.getLong(1), consts.getLong(2))
  }

  /** Serving-side LM scoring against an exported [[LmServing]] model:
    * ONE stateless projection per document — no train-table joins, no
    * shuffle beyond the scan, so it runs unchanged over a micro-batch
    * stream (each batch is a pure map stage with nothing to re-derive).
    * Output schema matches [[trigramBackoffSurprisal]] exactly —
    * un-pruned, the rows are EQUAL (shared oracle).
    *
    * `native` picks [[graft.plans.LmScore]] (one hash table per task,
    * O(tokens)/row with the backoff chain in-row); the fallback chains
    * `try_element_at` lookups on a map literal — identical sums,
    * linear-scan lookups (Catalyst map literals are array-backed).
    */
  def lmServingScored(
      df: DataFrame,
      model: LmServing,
      textCol: String = "text",
      native: Boolean = false,
      keep: Seq[String] = Nil): DataFrame = {
    val scoreOf: Column => Column =
      if (native) ws => call_function("graft_lm_score", ws,
        array(model.keys.map(lit): _*),
        array(model.scores.map(s => lit(s)): _*),
        lit(model.oov1), lit(model.oov2), lit(model.oov3))
      else ws => portableLmScore(ws, model)
    df.select(col("doc_id") +: keep.map(col) :+
      graft.functions.ColumnOps.bind(
        TextAnalysis.normTokens(coalesce(col(textCol), lit("")))) { ws =>
        struct(
          size(ws).cast("long").as("n_tokens"),
          scoreOf(ws).as("sum_micro"))
      }.as("q"): _*)
      .select(col("doc_id") +: keep.map(col) :+
        col("q.n_tokens") :+ col("q.sum_micro") :+
        graft.functions.ColumnOps.fdivCol(col("q.sum_micro"),
          col("q.n_tokens")).as("avg_micro"): _*)
  }

  /** The map-literal twin of [[graft.plans.LmScore]] for sessions
    * without the extensions: same prefixed key space, same backoff
    * chain via `coalesce`, exact long sums. `concat` (NOT `concat_ws`)
    * builds the lookup keys so a NULL part keeps propagating to a miss,
    * mirroring the native table's null rule.
    *
    * Scale note: the model ships as `map_from_arrays` LITERALS in the
    * expression tree — each `try_element_at` on a Catalyst map literal
    * is a LINEAR scan, and the analyzed plan carries O(model) literals.
    * That is fine for the capped fixtures this path serves; for large
    * vocabularies use the native [[graft.plans.LmScore]] path, which
    * ships the table once per task as a codegen reference object
    * (hash lookups, no plan-embedded literals).
    */
  private def portableLmScore(ws: Column, m: LmServing): Column = {
    val sep = lit(graft.plans.LmScore.Sep)
    val mapLit = map_from_arrays(
      array(m.keys.map(lit): _*), array(m.scores.map(s => lit(s)): _*))
    def lk(parts: Column*): Column =
      try_element_at(mapLit, concat(parts: _*))
    graft.functions.ColumnOps.bind(ws) { t =>
      val n = size(t)
      val p1 = coalesce(lk(lit("U"), sep, element_at(t, 1)), lit(m.oov1))
      val p2 = coalesce(
        lk(lit("B"), sep, element_at(t, 1), sep, element_at(t, 2)),
        lk(lit("F"), sep, element_at(t, 2)), lit(m.oov2))
      val rest = aggregate(sequence(lit(3), n), lit(0L), (acc, i) =>
        acc + coalesce(
          lk(lit("T"), sep, element_at(t, i - 2), sep,
            element_at(t, i - 1), sep, element_at(t, i)),
          lk(lit("C"), sep, element_at(t, i - 1), sep, element_at(t, i)),
          lk(lit("G"), sep, element_at(t, i)),
          lit(m.oov3)))
      when(n === 0, lit(0L)).otherwise(
        p1 + when(n >= 2, p2).otherwise(lit(0L)) +
          when(n >= 3, rest).otherwise(lit(0L)))
    }
  }

  /** Trained quality classifier: multinomial Naive Bayes over word
    * tokens, the CCNet/GPT-3 corpus-filtering shape (Wenzek et al. 2020
    * "CCNet"; Brown et al. 2020 §A) — train a cheap linear classifier on
    * a labeled slice (curated = positive, boilerplate/crawl = negative),
    * then score every incoming document and keep what classifies as
    * curated. fastText's supervised mode is the same log-linear family;
    * multinomial NB is its closed-form, one-pass-trainable instance, so
    * training is pure counting — no driver-iterated epochs.
    *
    * Per train-vocab token `w` (add-one smoothing over the SHARED train
    * vocabulary `V` = distinct tokens across both classes):
    *
    *   llr(w) = ln((c_pos_w + 1)/(n_pos + V)) − ln((c_neg_w + 1)/(n_neg + V))
    *
    * a document's log-odds = ln(d_pos) − ln(d_neg) (train doc-count
    * prior) + Σ llr over its token OCCURRENCES; tokens never seen in
    * training score the constant `ln((n_neg+V)/(n_pos+V))` (both class
    * likelihoods floor to 1/(n+V), so the ratio collapses — OOV is
    * handled exactly, not dropped).
    *
    * Determinism: llr is quantized to micro-units ONCE PER DISTINCT
    * TOKEN (vocab-sized roundings, each ONE fixed double expression over
    * exact integer counts — [[bigramSurprisal]]'s argument); the prior
    * and the unseen constant are each quantized once; per-doc scores are
    * then exact long sums, independent of partitioning and engine.
    *
    * Plan shape at 100 TB: training is one groupBy over the train
    * slice's tokens (map-side partials absorb per-doc repetition before
    * the shuffle; the result is vocab-sized, NOT corpus-sized); scoring
    * is the token stream left-joined to the vocab table and one per-doc
    * sum — the only corpus-scale shuffles are token-keyed and
    * doc_id-keyed, both inherent. No collect: the model stays a
    * DataFrame end-to-end, so a 10⁹-token vocab would still distribute.
    *
    * Output: `doc_id, label, n_tokens, score_micro, pred` — `pred` is
    * `1` where the doc classifies positive (score > 0), and `label` the
    * supervised label (`1`/`0`) for downstream precision/recall.
    */
  def naiveBayesQuality(
      df: DataFrame,
      labelPred: Column,
      trainPred: Column,
      textCol: String = "text"): DataFrame = {
    val (toks, llr, consts) = nbTables(df, labelPred, trainPred, textCol)
    toks.join(llr, Seq("w"), "left")
      .groupBy("doc_id", "label")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("llr_micro").as("seen_micro"),
        sum(when(col("llr_micro").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), col("label"), col("n_tokens"),
        (coalesce(col("seen_micro"), lit(0L))
          + col("n_unseen") * col("unseen_micro")
          + col("prior_micro")).as("score_micro"))
      .select(col("doc_id"), col("label"), col("n_tokens"), col("score_micro"),
        (col("score_micro") > 0).cast("int").as("pred"))
  }

  /** The shared NB training tables ([[naiveBayesQuality]]'s math,
    * factored so [[trainNbServing]] exports the identical model):
    * `(token stream, vocab llr table, consts row)`.
    */
  private def nbTables(
      df: DataFrame,
      labelPred: Column,
      trainPred: Column,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    // coalesce: NULL text keeps its row (normTokens('') = ['']), same
    // one-row-per-doc contract as unigramSurprisal
    val docToks = df.select(
      col("doc_id"), labelPred.cast("int").as("label"), trainPred.as("is_train"),
      TextAnalysis.normTokens(coalesce(col(textCol), lit(""))).as("ws"))
    val toks = docToks.select(
      col("doc_id"), col("label"), col("is_train"), explode(col("ws")).as("w"))
    // one aggregate produces both classes' counts (vocab-sized result)
    val vocab = toks.filter(col("is_train")).groupBy("w").agg(
      sum(col("label").cast("long")).as("c_pos"),
      sum(lit(1L) - col("label").cast("long")).as("c_neg"))
    val totals = vocab.agg(
      sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
      count(lit(1)).as("v_size"))
    val docTotals = docToks.filter(col("is_train")).agg(
      sum(col("label").cast("long")).as("d_pos"),
      sum(lit(1L) - col("label").cast("long")).as("d_neg"))
    // each scored value is ONE fixed double expression over exact integer
    // counts, quantized once per distinct key
    val llr = vocab.crossJoin(broadcast(totals)).select(
      col("w"),
      round((log((col("c_pos") + 1).cast("double")
          / (col("n_pos") + col("v_size")).cast("double"))
        - log((col("c_neg") + 1).cast("double")
          / (col("n_neg") + col("v_size")).cast("double"))) * 1e6)
        .cast("long").as("llr_micro"))
    val consts = totals.crossJoin(docTotals).select(
      round(log((col("n_neg") + col("v_size")).cast("double")
          / (col("n_pos") + col("v_size")).cast("double")) * 1e6)
        .cast("long").as("unseen_micro"),
      round((log(col("d_pos").cast("double"))
          - log(col("d_neg").cast("double"))) * 1e6)
        .cast("long").as("prior_micro"))
    (toks, llr, consts)
  }

  /** An exported NB quality model — the SHIPPED-ARTIFACT half of the
    * classifier lifecycle (train once, serve everywhere): the pruned
    * vocab table as parallel arrays plus the two scoring constants.
    * Bounded driver data (≤ `maxEntries` rows), like a BPE merge table
    * or an IVF codebook.
    */
  final case class NbServing(
      words: Seq[String],
      scores: Seq[Long],
      unseenMicro: Long,
      priorMicro: Long)

  /** Train [[naiveBayesQuality]]'s model and EXPORT it for serving,
    * pruned to the `maxEntries` highest-|llr| tokens (ties by token
    * ascending — deterministic). Pruning is the standard serving
    * trade-off (fastText quantize/cutoff): dropped tokens score the
    * OOV constant instead of their llr, so with `maxEntries` ≥ vocab
    * size serving is EXACTLY the batch classifier ([[nbServingScored]]
    * spec'd equal), and below it the agreement is measurable, not
    * assumed.
    *
    * The collect is model-sized (≤ maxEntries rows) — the shipped-
    * artifact pattern ([[graft.ops.TextAnalysis.bpeTrain]] merge
    * tables), never corpus-sized.
    */
  def trainNbServing(
      df: DataFrame,
      labelPred: Column,
      trainPred: Column,
      textCol: String = "text",
      maxEntries: Int = 4096): NbServing = {
    require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")
    val (_, llr, consts) = nbTables(df, labelPred, trainPred, textCol)
    val kept = llr
      .orderBy(abs(col("llr_micro")).desc, col("w").asc)
      .limit(maxEntries)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val c = consts.collect()(0)
    NbServing(kept.map(_._1).toSeq, kept.map(_._2).toSeq,
      c.getLong(0), c.getLong(1))
  }

  /** Serving-side scoring against an exported [[NbServing]] model: ONE
    * stateless codegen'd projection per row — no join, no shuffle, no
    * state — so the same call serves a batch DataFrame and a streaming
    * micro-batch identically (the [[graft.streaming.EmbedStreamOps]]
    * rule: mid-stream stages must be re-expressed stream-natively; here
    * the model is a plan literal, so there is nothing to re-scan per
    * batch at all). Output schema and values match [[naiveBayesQuality]]
    * exactly when the model was exported un-pruned.
    *
    * `native` picks [[graft.plans.NbScore]] (hash-table lookups, O(tokens)
    * per row) over the map-literal fallback (identical sums, O(tokens ×
    * model) — Catalyst map literals scan linearly); pure speed knob.
    */
  def nbServingScored(
      df: DataFrame,
      model: NbServing,
      labelPred: Column,
      textCol: String = "text",
      native: Boolean = false): DataFrame = {
    val toksCol = TextAnalysis.normTokens(coalesce(col(textCol), lit("")))
    val tokenSum: Column => Column =
      if (native)
        ws => call_function("graft_nb_score", ws,
          array(model.words.map(lit): _*),
          array(model.scores.map(lit): _*),
          lit(model.unseenMicro))
      else
        ws => aggregate(ws, lit(0L), (acc, w) =>
          acc + coalesce(
            try_element_at(
              typedlit(model.words.zip(model.scores).toMap), w),
            lit(model.unseenMicro)))
    df.select(
        col("doc_id"), labelPred.cast("int").as("label"),
        graft.functions.ColumnOps.bind(toksCol) { ws =>
          struct(
            size(ws).cast("long").as("n_tokens"),
            (tokenSum(ws) + lit(model.priorMicro)).as("score_micro"))
        }.as("q"))
      .select(col("doc_id"), col("label"),
        col("q.n_tokens"), col("q.score_micro"),
        (col("q.score_micro") > 0).cast("int").as("pred"))
  }

  /** Trained multiclass language identifier: multinomial Naive Bayes
    * over CHARACTER BIGRAMS — the langid.py / fastText-langid feature
    * family (Lui & Baldwin 2012), where script and orthography
    * (umlauts, accents, CJK codepoints, boundary loss) dominate and
    * word-level features fail exactly when languages stop sharing
    * whitespace conventions. [[naiveBayesQuality]] is the binary
    * word-token instance of the same model; this one is per-class:
    *
    *   score_c(doc) = ln(d_c) + Σ_g ln((c_{g,c} + 1)/(n_c + V))
    *
    * over the doc's bigram occurrences (add-one smoothing over the
    * shared train bigram vocabulary V); a (g, c) pair with zero train
    * count collapses to the per-class constant `ln(1/(n_c + V))`, which
    * also scores grams never seen in training — OOV is exact, and a
    * doc too short to produce bigrams still classifies by prior alone.
    * The prediction is the argmax over EXACT long micro-scores, ties
    * broken by class name ascending — fully deterministic.
    *
    * Determinism: every log value (per-(gram, class) likelihood, each
    * class's unseen constant and prior) is ONE fixed double expression
    * over exact integer counts, micro-quantized once per distinct key;
    * per-doc per-class scores are exact long sums ([[bigramSurprisal]]'s
    * argument), so the argmax is engine- and partitioning-independent.
    *
    * Plan shape at 100 TB: training is one groupBy over the train
    * slice's (gram, class) pairs — map-side partials absorb per-doc
    * repetition, the result is vocab×classes-sized, never corpus-sized.
    * Scoring fans the gram stream out by |C| classes (the inherent
    * multiclass cost), joins the vocab table gram-keyed, and reduces
    * per (doc, class); the argmax window partitions by doc_id (≤ |C|
    * rows per partition key — no global sort). No collect anywhere.
    *
    * Output: `doc_id, lang, pred_lang, score_micro, ok` — `lang` is the
    * supervised label, `score_micro` the winning class's score, `ok`
    * 1 where they agree.
    */
  def naiveBayesLangId(
      df: DataFrame,
      labelCol: String = "lang",
      trainPred: Column,
      textCol: String = "text"): DataFrame = {
    val (base, grams, classes, llr) =
      nbLangTables(df, labelCol, trainPred, textCol)
    // fan the gram stream out by class; a missing (g, cls) row IS the
    // c=0 case, so coalescing to unseen_micro applies the same formula
    val scored = grams.select("doc_id", "g")
      .crossJoin(broadcast(classes.select("cls", "unseen_micro")))
      .join(llr, Seq("g", "cls"), "left")
      .select(col("doc_id"), col("cls"),
        coalesce(col("s_micro"), col("unseen_micro")).as("s_micro"))
      .groupBy("doc_id", "cls")
      .agg(sum("s_micro").as("sum_micro"))
    // doc spine keeps gram-less docs (prior-only classification)
    val spine = base.select("doc_id", "lang")
      .crossJoin(broadcast(classes.select("cls", "prior_micro")))
      .join(scored, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("lang"), col("cls"),
        (coalesce(col("sum_micro"), lit(0L)) + col("prior_micro"))
          .as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("cls").asc)
    spine.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred_lang"),
        col("score_micro"), (col("cls") === col("lang")).cast("int").as("ok"))
  }

  /** In-row char-bigram extraction shared by [[naiveBayesLangId]] and
    * its serving twin. `sequence(1, 0)` steps BACKWARD for sub-bigram
    * text, so guard to an empty gram array (bigramSurprisal's
    * pair-stream caveat).
    */
  private def charBigrams(t: Column): Column =
    when(length(t) >= 2,
      transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** The shared multiclass NB training tables ([[naiveBayesLangId]]'s
    * math, factored so [[trainNbLangServing]] exports the identical
    * model): `(doc spine, gram stream, per-class consts, per-(gram,
    * class) likelihood table)`.
    */
  private def nbLangTables(
      df: DataFrame,
      labelCol: String,
      trainPred: Column,
      textCol: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = df.select(
      col("doc_id"), col(labelCol).as("lang"), trainPred.as("is_train"),
      lower(coalesce(col(textCol), lit(""))).as("t"))
    val grams = base.select(
      col("doc_id"), col("lang"), col("is_train"),
      explode(charBigrams(col("t"))).as("g"))
    val train = grams.filter(col("is_train"))
    val counts = train.groupBy("g", "lang").agg(count(lit(1)).as("c"))
    val classTotals = train.groupBy("lang").agg(count(lit(1)).as("n_c"))
    val vsize = counts.select("g").distinct().agg(count(lit(1)).as("v_size"))
    val docCounts = base.filter(col("is_train"))
      .groupBy("lang").agg(count(lit(1)).as("d_c"))
    // per-class constants, each quantized once (classes-sized table)
    val classes = classTotals.join(docCounts, Seq("lang"))
      .crossJoin(broadcast(vsize))
      .select(
        col("lang").as("cls"),
        round(log(col("d_c").cast("double")) * 1e6)
          .cast("long").as("prior_micro"),
        round(log(lit(1.0) / (col("n_c") + col("v_size")).cast("double")) * 1e6)
          .cast("long").as("unseen_micro"))
    // seen-(gram, class) likelihoods, each quantized once
    val llr = counts.join(classTotals, Seq("lang")).crossJoin(broadcast(vsize))
      .select(
        col("g"), col("lang").as("cls"),
        round(log((col("c") + 1).cast("double")
            / (col("n_c") + col("v_size")).cast("double")) * 1e6)
          .cast("long").as("s_micro"))
    (base, grams, classes, llr)
  }

  /** An exported multiclass NB language-ID model: per class, its pruned
    * (gram → micro-likelihood) table plus the two scoring constants —
    * the shipped-artifact form of [[naiveBayesLangId]]'s model, bounded
    * driver data like [[NbServing]].
    */
  final case class NbLangServing(classes: Seq[(String, NbServing)]) {
    require(classes.nonEmpty, "NbLangServing needs at least one class")
  }

  /** Train [[naiveBayesLangId]]'s model and EXPORT it for serving,
    * pruned per class to the `maxEntriesPerClass` HIGHEST-likelihood
    * grams (= most frequent in that class; ties by gram ascending).
    * Dropping a rare gram floors it to the class's OOV constant — the
    * value it already sits near (`ln((c+1)/(n+V))` → `ln(1/(n+V))` as
    * c→0) — so pruning degrades smoothly; with `maxEntriesPerClass` ≥
    * every class's seen-gram count, serving is EXACTLY the batch
    * classifier (spec'd equal). Collects are model-sized, never
    * corpus-sized.
    */
  def trainNbLangServing(
      df: DataFrame,
      labelCol: String = "lang",
      trainPred: Column,
      textCol: String = "text",
      maxEntriesPerClass: Int = 4096): NbLangServing = {
    require(maxEntriesPerClass > 0,
      s"maxEntriesPerClass must be positive, got $maxEntriesPerClass")
    val (_, _, classes, llr) = nbLangTables(df, labelCol, trainPred, textCol)
    val consts = classes.orderBy("cls").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cls")
      .orderBy(col("s_micro").desc, col("g").asc)
    val kept = llr.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxEntriesPerClass)
      .orderBy("cls", "rn")
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2)))
      .groupBy(_._1)
    NbLangServing(consts.map { case (cls, prior, unseen) =>
      val rows = kept.getOrElse(cls, Array.empty)
      cls -> NbServing(
        rows.map(_._2).toSeq, rows.map(_._3).toSeq, unseen, prior)
    }.toSeq)
  }

  /** Serving-side language ID against an exported [[NbLangServing]]
    * model: ONE stateless projection per row — per class, a
    * [[graft.plans.NbScore]] hash-table pass over the in-row bigram
    * array (map-literal fallback identical), then an in-row argmax via
    * `array_sort` over `(-score, class)` structs — exactly the batch
    * classifier's (score DESC, class ASC) tie-break. No join, no
    * shuffle, no state: serves batch and micro-batch streams
    * identically, like [[nbServingScored]].
    *
    * Every trained class carries ≥1 table entry (a class exists only if
    * its train slice produced grams, and pruning keeps at least one),
    * satisfying [[graft.plans.NbScore]]'s non-empty requirement.
    */
  def nbLangServingScored(
      df: DataFrame,
      model: NbLangServing,
      labelCol: String = "lang",
      textCol: String = "text",
      native: Boolean = false): DataFrame = {
    val gramsCol = charBigrams(lower(coalesce(col(textCol), lit(""))))
    def tokenSum(ws: Column, m: NbServing): Column =
      if (native)
        call_function("graft_nb_score", ws,
          array(m.words.map(lit): _*),
          array(m.scores.map(lit): _*),
          lit(m.unseenMicro))
      else
        aggregate(ws, lit(0L), (acc, w) =>
          acc + coalesce(
            try_element_at(typedlit(m.words.zip(m.scores).toMap), w),
            lit(m.unseenMicro)))
    df.select(
        col("doc_id"), col(labelCol).as("lang"),
        graft.functions.ColumnOps.bind(gramsCol) { ws =>
          // ascending struct sort on (-score, cls) == (score DESC, cls
          // ASC) — the batch argmax's window order
          element_at(array_sort(array(model.classes.map { case (cls, m) =>
            struct(
              (-(tokenSum(ws, m) + lit(m.priorMicro))).as("ns"),
              lit(cls).as("cls"))
          }: _*)), 1)
        }.as("top"))
      .select(col("doc_id"), col("lang"),
        col("top.cls").as("pred_lang"),
        (-col("top.ns")).as("score_micro"),
        (col("top.cls") === col("lang")).cast("int").as("ok"))
  }

  /** Persist an exported [[NbServing]] model as a parquet artifact —
    * the step that makes the classifier outlive its training session
    * (the [[graft.ops.Similarity]] persisted-IVF-layout rule: a 100 TB
    * deployment trains in one job and serves from many; the JVM cache
    * alone cannot cross that boundary). Layout under `dir`:
    *
    *   - `entries/` — (rank, w, s_micro), ONE file, rank preserving the
    *     pruning order so the round-trip restores the exact Seq (the
    *     model is already bounded driver data, so coalesce(1) is free);
    *   - `meta/` — one row (unseen_micro, prior_micro, n_entries).
    *
    * `n_entries` cross-checks the read ([[readNbModel]] fails loudly on
    * a truncated entries file rather than serving a silently weaker
    * model).
    */
  def writeNbModel(
      spark: org.apache.spark.sql.SparkSession,
      model: NbServing,
      dir: String): Unit = {
    import spark.implicits._
    model.words.indices.map(i => (i, model.words(i), model.scores(i)))
      .toDF("rank", "w", "s_micro")
      .coalesce(1).sortWithinPartitions("rank")
      .write.mode("overwrite").parquet(s"$dir/entries")
    Seq((model.unseenMicro, model.priorMicro, model.words.size.toLong))
      .toDF("unseen_micro", "prior_micro", "n_entries")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Read back a [[writeNbModel]] artifact; the result is EQUAL to the
    * written model (spec'd), so serve-after-read ≡ serve-before.
    */
  def readNbModel(
      spark: org.apache.spark.sql.SparkSession, dir: String): NbServing = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    val rows = spark.read.parquet(s"$dir/entries")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    require(rows.length.toLong == meta.getLong(2),
      s"NB model at $dir is truncated: ${rows.length} entries, " +
        s"meta says ${meta.getLong(2)}")
    NbServing(rows.map(_._1).toSeq, rows.map(_._2).toSeq,
      meta.getLong(0), meta.getLong(1))
  }

  /** Train the per-group perplexity tercile thresholds over the SERVED
    * score distribution (the deployed CCNet shape: thresholds are
    * computed once on a reference corpus and shipped with the pruned
    * model, so filter workers never aggregate). Value rule identical to
    * [[perplexityBuckets]] (smallest observed avg_micro with cum·1000 ≥
    * p·total), but over [[lmServingScored]]'s pruned-model scores — the
    * distribution the filter will actually see.
    *
    * NULL group values are dropped from the threshold table (a null key
    * has no String ordering and [[perplexityBucketsServing]]'s equality
    * CASE could never match it anyway — null groups bucket as `tail`
    * at serving, the conservative unknown-language default).
    */
  def trainPplThresholds(
      df: DataFrame,
      model: LmServing,
      groupCol: String = "lang",
      textCol: String = "text",
      capacity: Int = 32768,
      native: Boolean = false): Seq[(String, Long, Long)] = {
    val ppl = lmServingScored(df, model, textCol, native,
      keep = Seq(groupCol))
      .filter(col(groupCol).isNotNull)
    CorpusOps.quantileSketch(ppl, "avg_micro", groupCol,
        probsPermille = Seq(333, 667), capacity = capacity, native = native)
      .select(col(groupCol), col("p333"), col("p667"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
  }

  /** The SERVING form of [[perplexityBuckets]] — the complete deployed
    * CCNet filter in ONE stateless projection: score with the shipped
    * pruned LM ([[lmServingScored]] — the whole backoff chain in-row)
    * and bucket against the shipped per-group thresholds (a
    * languages-sized literal CASE chain; groups absent from the
    * threshold table bucket as `tail`, the conservative default for an
    * unknown language). No joins, no aggregation, no state — batch and
    * micro-batch streams run the same plan, so this is what a 100 TB
    * filter fleet executes per document.
    */
  def perplexityBucketsServing(
      df: DataFrame,
      model: LmServing,
      thresholds: Seq[(String, Long, Long)],
      groupCol: String = "lang",
      textCol: String = "text",
      native: Boolean = false): DataFrame = {
    require(thresholds.nonEmpty, "need at least one group threshold")
    require(thresholds.map(_._1).distinct.size == thresholds.size,
      "one threshold row per group")
    val t333 = thresholds.foldLeft(lit(null).cast("long")) {
      case (acc, (g, lo, _)) =>
        when(col(groupCol) === g, lit(lo)).otherwise(acc)
    }
    val t667 = thresholds.foldLeft(lit(null).cast("long")) {
      case (acc, (g, _, hi)) =>
        when(col(groupCol) === g, lit(hi)).otherwise(acc)
    }
    lmServingScored(df, model, textCol, native, keep = Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("n_tokens"), col("avg_micro"),
        when(col("avg_micro") <= t333, lit("head"))
          .when(col("avg_micro") <= t667, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Persist an exported [[LmServing]] model — the artifact-shipping
    * leg of the LM-filter lifecycle ([[writeNbModel]]'s layout on the
    * perplexity axis): `entries/` carries the rank-ordered prefixed
    * keys, `meta/` the three OOV constants plus an `n_entries`
    * cross-check so a truncated artifact fails LOUDLY instead of
    * serving a silently weaker model.
    */
  def writeLmModel(
      spark: org.apache.spark.sql.SparkSession,
      model: LmServing,
      dir: String): Unit = {
    import spark.implicits._
    model.keys.indices.map(i => (i, model.keys(i), model.scores(i)))
      .toDF("rank", "k", "s_micro")
      .coalesce(1).sortWithinPartitions("rank")
      .write.mode("overwrite").parquet(s"$dir/entries")
    Seq((model.oov1, model.oov2, model.oov3, model.keys.size.toLong))
      .toDF("oov1_micro", "oov2_micro", "oov3_micro", "n_entries")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Read back a [[writeLmModel]] artifact; the result is EQUAL to the
    * written model (spec'd), so serve-after-read ≡ serve-before.
    */
  def readLmModel(
      spark: org.apache.spark.sql.SparkSession, dir: String): LmServing = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    val rows = spark.read.parquet(s"$dir/entries")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    require(rows.length.toLong == meta.getLong(3),
      s"LM model at $dir is truncated: ${rows.length} entries, " +
        s"meta says ${meta.getLong(3)}")
    LmServing(rows.map(_._1).toSeq, rows.map(_._2).toSeq,
      meta.getLong(0), meta.getLong(1), meta.getLong(2))
  }

  /** Persist an exported [[NbLangServing]] model: `entries/` carries
    * (cls, rank, w, s_micro) and `meta/` one row per class
    * (cls, unseen_micro, prior_micro, n_entries); class order restores
    * from the meta table's `cls` sort (training emits classes sorted,
    * so the round-trip is exact).
    */
  def writeNbLangModel(
      spark: org.apache.spark.sql.SparkSession,
      model: NbLangServing,
      dir: String): Unit = {
    import spark.implicits._
    model.classes.flatMap { case (cls, m) =>
      m.words.indices.map(i => (cls, i, m.words(i), m.scores(i)))
    }.toDF("cls", "rank", "w", "s_micro")
      .coalesce(1).sortWithinPartitions("cls", "rank")
      .write.mode("overwrite").parquet(s"$dir/entries")
    model.classes.map { case (cls, m) =>
      (cls, m.unseenMicro, m.priorMicro, m.words.size.toLong)
    }.toDF("cls", "unseen_micro", "prior_micro", "n_entries")
      .coalesce(1).sortWithinPartitions("cls")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Read back a [[writeNbLangModel]] artifact (equal to the written
    * model, spec'd — serve-after-read ≡ serve-before).
    */
  def readNbLangModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): NbLangServing = {
    val metas = spark.read.parquet(s"$dir/meta")
      .orderBy("cls").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCls = spark.read.parquet(s"$dir/entries")
      .orderBy("cls", "rank").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    NbLangServing(metas.map { case (cls, unseen, prior, n) =>
      val rows = byCls.getOrElse(cls, Array.empty)
      require(rows.length.toLong == n,
        s"NB langid model at $dir: class '$cls' truncated " +
          s"(${rows.length} entries, meta says $n)")
      cls -> NbServing(rows.map(_._2).toSeq, rows.map(_._3).toSeq,
        unseen, prior)
    }.toSeq)
  }
}
