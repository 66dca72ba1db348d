package graft.ops

import graft.functions.ColumnOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over a
  * `documents(doc_id, text, lang, source, n_chars)` table (FIXTURES.md §B).
  *
  * Everything here is built from codegen'd higher-order `Column` functions —
  * no UDFs, no driver round-trips — so each operator is one narrow
  * projection that scales linearly with input splits and keeps whole-stage
  * codegen intact. At 100 TB these are pure map stages: no shuffle, no
  * skew sensitivity, parquet column pruning reads only `doc_id, text`.
  */
object TextAnalysis {

  /** Whitespace tokens. The synthetic corpus is single-space separated;
    * real-world use passes a custom pattern.
    */
  def tokens(text: Column, pattern: String = " "): Column = split(text, pattern)

  /** THE shared normalized tokenizer — whitespace collapsed, lowercased,
    * single-space split. One definition so retrieval ([[bm25]],
    * [[graft.ops.Retrieval.booleanSearch]], [[hashEmbed]]) and the
    * surprisal/importance features can never diverge on tokenization;
    * [[graft.ops.Dedup]]'s `normText` is the same normalization pre-split
    * (shingles need the joined form). A tweak here must be mirrored in
    * every dependent DuckDB oracle
    * (`string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ')`).
    */
  def normTokens(text: Column): Column =
    split(lower(regexp_replace(text, "\\s+", " ")), " ")

  /** BPE-ish token count: word pieces, digit runs, or single non-space
    * symbols — the shape GPT-style byte-pair pretokenizers produce. Native
    * [[graft.plans.TokenCount]] (one allocation-free byte scan) when the
    * graft extensions are registered; `regexp_extract_all` fallback with
    * IDENTICAL counts otherwise (pure speed knob — 5× on sf0.1).
    */
  def bpeTokenCount(textCol: Column, native: Boolean): Column =
    if (native) call_function("graft_token_count", textCol, lit("bpe"))
    else size(regexp_extract_all(textCol,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Count of `[^A-Za-z0-9\s]` code points — [[bpeTokenCount]]'s sibling
    * for punctuation density.
    */
  def punctCount(textCol: Column, native: Boolean): Column =
    if (native) call_function("graft_token_count", textCol, lit("punct"))
    else size(regexp_extract_all(textCol, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Unicode normalization ([[graft.plans.UnicodeNormalize]]): the
    * canonicalization that must precede any digest-keyed dedup on real
    * crawl text (composed vs decomposed accents hash differently raw).
    * Deterministic algorithm with one portable definition, so runtime
    * registration on a foreign session is safe (the
    * [[FuzzyMatch.ensureRegistered]] rule).
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    call_function("graft_unicode_normalize", c, lit(form))

  /** Register the normalization expression into a VANILLA session's live
    * function registry (idempotent; graft sessions get it via
    * `spark.sql.extensions`).
    */
  def ensureNormalizeRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.plans.GraftExtensions.ensureRegistered(
      spark, Set("graft_unicode_normalize"))

  /** Per-document script profile: code-point counts per writing system
    * (Latin incl. the accented Latin-1/Extended ranges, Cyrillic, CJK
    * unified, Arabic, ASCII digits) — the corpus-QC signal behind
    * language routing and mixed-script/mojibake triage that a heuristic
    * language-ID ([[languageId]]) alone can't give. Counts are by
    * explicit code-point RANGES, not `\p{Script}` classes, so the Java
    * regex here and the oracle's RE2 agree by construction (script
    * classes differ subtly between engines; ranges don't). One narrow
    * codegen'd projection — nothing shuffles.
    */
  def scriptProfile(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def cnt(pattern: String) =
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0))).cast("long")
    df.select(
      col(idCol),
      cnt("[A-Za-z\\u00c0-\\u024f]").as("n_latin"),
      cnt("[\\u0400-\\u04ff]").as("n_cyrillic"),
      cnt("[\\u4e00-\\u9fff]").as("n_cjk"),
      cnt("[\\u0600-\\u06ff]").as("n_arabic"),
      cnt("[0-9]").as("n_digit"))
  }

  /** Token counting, whitespace + the BPE-ish variant. */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    df.select(
      col("doc_id"),
      // counts surface as long: `size` is int32 in Spark but every other
      // engine's len() is int64 — long keeps results schema-portable
      size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      bpeTokenCount(col(textCol), native).as("n_bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))
  }

  /** Quality scoring: length, lexical diversity, stopword density,
    * punctuation ratio — the standard cheap pre-training filters. All
    * ratios guarded against empty documents (ANSI mode: division by zero
    * throws).
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    // let-bind the token array: five outputs reference it, and without the
    // binding CollapseProject re-runs the split per reference
    val packed = ColumnOps.bind(tokens(col(textCol))) { toks =>
      val nTok = size(toks)
      val safeTok = greatest(nTok, lit(1)).cast("double")
      struct(
        nTok.cast("long").as("n_tokens"),
        round(size(array_distinct(toks)) / safeTok, 6).as("uniq_ratio"),
        round(length(col(textCol)) / safeTok, 6).as("avg_token_len"),
        round(
          size(filter(toks, t => lower(t).isin("the", "a", "of", "and", "to"))) / safeTok,
          6).as("stopword_ratio"),
        round(
          punctCount(col(textCol), native)
            / greatest(length(col(textCol)), lit(1)).cast("double"),
          6).as("punct_ratio"))
    }
    df.select(col("doc_id"), explode(array(packed)).as("q"))
      .select(col("doc_id"), col("q.n_tokens"), col("q.uniq_ratio"),
        col("q.avg_token_len"), col("q.stopword_ratio"), col("q.punct_ratio"))
  }

  /** Exact floor division of two non-negative long columns — delegates
    * to the decimal-routed [[graft.functions.ColumnOps.fdivCol]] so
    * exactness holds for ANY magnitude, not just numerators inside a
    * double's 53-bit mantissa (the weaker double-division form was only
    * correct under a per-call-site magnitude argument).
    */
  private def idiv(a: Column, b: Column): Column = ColumnOps.fdivCol(a, b)

  /** Model-based quality filter: a fixed-weight linear classifier over
    * cheap lexical features — the distributed-inference half of a
    * fasttext-style quality gate (weights here are hand-set stand-ins;
    * production swaps in trained ones, the plan is identical).
    *
    * Every feature is an EXACT integer in micro-units (ratios via
    * floor-division of micro-scaled counts), and the score is integer
    * arithmetic over them — zero floating point anywhere, so the result
    * is bit-identical across engines, partitionings, and replays.
    * Features: token count (capped length credit), stopword density
    * (natural-language signal), symbol and digit density (boilerplate /
    * data-dump penalty), deviation of mean token length from the
    * English-typical ~4.5 chars.
    *
    * One narrow codegen'd projection per row: no shuffle, no UDF; at
    * 100 TB this is a pure map stage pruned to `doc_id, text`.
    */
  def qualityClassifier(
      df: DataFrame,
      threshold: Long = 300000L,
      textCol: String = "text"): DataFrame = {
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    val t = col(textCol)
    val packed = ColumnOps.bind(tokens(t)) { toks =>
      val nTokRaw = size(toks).cast("long")
      val nTok = greatest(nTokRaw, lit(1L))
      val nChar = greatest(length(t), lit(1)).cast("long")
      val m = lit(1000000L)
      val sumTokChars = aggregate(
        toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
      val stopMicro = idiv(
        m * size(filter(toks, x => lower(x).isin("the", "a", "of", "and", "to")))
          .cast("long"), nTok)
      val symMicro = idiv(m * punctCount(t, native), nChar)
      val digitMicro = idiv(
        m * size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long"),
        nChar)
      val meanLenMicro = idiv(m * sumTokChars, nTok)
      struct(
        nTokRaw.as("n_tokens"),
        stopMicro.as("stop_micro"),
        symMicro.as("sym_micro"),
        digitMicro.as("digit_micro"),
        meanLenMicro.as("mean_len_micro"))
    }
    df.select(col("doc_id"), explode(array(packed)).as("f"))
      .select(
        col("doc_id"),
        col("f.n_tokens"), col("f.stop_micro"), col("f.sym_micro"),
        col("f.digit_micro"), col("f.mean_len_micro"),
        (lit(200000L)
          + least(col("f.n_tokens"), lit(400L)) * 1000L
          + col("f.stop_micro") * 2L
          - col("f.sym_micro") * 3L
          - col("f.digit_micro") * 2L
          - idiv(abs(col("f.mean_len_micro") - 4500000L), lit(5L)))
          .as("score_micro"))
      .withColumn("keep", col("score_micro") > threshold)
  }

  /** N-gram-heuristic language ID: score each candidate language by its
    * marker-token density, take the argmax with a fixed precedence order
    * (en > de > fr > es > zh default). Deterministic and SQL-expressible,
    * so DuckDB can replay it as the oracle.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    // double let-binding: the split feeds four marker counts, and each
    // count is referenced twice in the decision chain — unbound, the
    // split would re-run per reference (8×)
    val predicted = ColumnOps.bind(tokens(col(textCol))) { toks =>
      def hits(markers: String*): Column =
        size(filter(toks, t => lower(t).isin(markers.map(_.asInstanceOf[Any]): _*)))
      ColumnOps.bind(array(
        hits("the", "of", "and"), hits("der", "die", "das", "und"),
        hits("le", "la", "et", "les"), hits("el", "los", "las", "y"))) { h =>
        val Seq(en, de, fr, es) = (1 to 4).map(i => element_at(h, i))
        when(en >= greatest(de, fr, es) && en > 0, "en")
          .when(de >= greatest(fr, es) && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("zh")
      }
    }
    df.select(
      col("doc_id"),
      col("lang").as("actual_lang"),
      // NULL in → NULL out: without the guard every marker count is NULL,
      // the whole decision chain's conditions are NULL, and a NULL
      // document would be confidently "classified" as the fallback 'zh'
      when(col(textCol).isNull, lit(null).cast("string"))
        .otherwise(predicted).as("predicted_lang"))
  }

  /** Greedy leftmost-longest tokenizer application (WordPiece/BPE
    * inference): per position emit the vocab index of the longest matching
    * entry, or -1 and advance one code point. Native
    * [[graft.plans.GreedyTokenize]] (one prebuilt-trie pass) when the
    * graft extensions are registered; a pure-Column `aggregate` loop with
    * IDENTICAL ids otherwise — greedy matching has no hash family, so the
    * two paths are a speed knob, not a semantics switch, and the result
    * replays exactly in any engine.
    *
    * The fallback costs O(len × vocab) lambda steps per row — fine for
    * bounded probes; the native trie is the 100 TB path.
    */
  def greedyTokenizeIds(textCol: Column, vocab: Seq[String], native: Boolean): Column =
    if (native)
      call_function("graft_greedy_tokenize", textCol, array(vocab.map(lit): _*))
    else {
      require(vocab.nonEmpty && vocab.forall(_.nonEmpty) &&
        vocab.distinct.size == vocab.size,
        "vocab entries must be non-empty and distinct")
      val varr = array(vocab.map(lit): _*)
      // longest entry matching at pos (ties impossible: entries distinct);
      // scanning ids ascending with a strict > keeps the lowest id among
      // equal lengths, matching the ORDER BY len DESC, id LIMIT 1 replay
      def bestAt(text: Column, pos: Column): Column =
        aggregate(
          sequence(lit(0), lit(vocab.size - 1)),
          struct(lit(0).as("bl"), lit(-1).as("bi")),
          (acc, i) => ColumnOps.bind(element_at(varr, i + 1)) { v =>
            when(length(v) > acc.getField("bl") &&
                text.substr(pos, length(v)) === v,
              struct(length(v).as("bl"), i.cast("int").as("bi")))
              .otherwise(acc)
          })
      // NULL text -> NULL ids, matching the native expression's
      // null-safe eval (without the guard the aggregate loop would run
      // one vacuous step and emit [-1] for a NULL row)
      when(textCol.isNull, lit(null).cast("array<int>")).otherwise(
        ColumnOps.bind(textCol) { text =>
          aggregate(
            // each step advances >= 1 code point, so length(text) steps
            // always reach the end; surplus steps pass the state through
            sequence(lit(1), greatest(length(text), lit(1))),
            struct(lit(1).as("pos"), lit(Array.empty[Int]).as("ids")),
            (st, _) =>
              when(st.getField("pos") > length(text), st)
                .otherwise(ColumnOps.bind(bestAt(text, st.getField("pos"))) { b =>
                  when(b.getField("bi") >= 0,
                    struct(
                      (st.getField("pos") + b.getField("bl")).as("pos"),
                      concat(st.getField("ids"), array(b.getField("bi"))).as("ids")))
                    .otherwise(struct(
                      (st.getField("pos") + lit(1)).as("pos"),
                      concat(st.getField("ids"), array(lit(-1))).as("ids")))
                }),
            st => st.getField("ids"))
        })
    }

  /** [[greedyTokenizeIds]] over a documents table, summarized to scalars
    * (token count, unknown count, the id sequence as text) so the result
    * is engine-comparable. `maxChars` bounds the per-document work — the
    * inference shape tokenizes chunks, not whole documents, anyway.
    */
  def greedyTokenize(
      df: DataFrame,
      vocab: Seq[String],
      maxChars: Int = 80,
      textCol: String = "text"): DataFrame = {
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    val s = col(textCol).substr(lit(1), lit(maxChars))
    df.select(
      col("doc_id"),
      ColumnOps.bind(greedyTokenizeIds(s, vocab, native)) { ids =>
        struct(
          size(ids).cast("long").as("n_tokens"),
          size(filter(ids, x => x === -1)).cast("long").as("n_unk"),
          array_join(transform(ids, x => x.cast("string")), " ").as("ids_str"))
      }.as("q"))
      .select(col("doc_id"), col("q.n_tokens"), col("q.n_unk"), col("q.ids_str"))
  }

  /** Viterbi (OPTIMAL-segmentation) token ids — the unigram-LM /
    * SentencePiece decoding shape: minimize total integer cost
    * (`costs(id)` per token, `unkCost` per unmatched code point → -1)
    * instead of greedy's leftmost-longest heuristic. Per-position
    * tie-break: cost asc, token length desc, id desc (the id leg only
    * ever decides unknown-vs-length-1-token — two distinct vocab entries
    * of equal length cannot both match one span), so the backpointer is
    * unique and the sequence replays in SQL. Native
    * [[graft.plans.ViterbiTokenize]] (shared prebuilt trie,
    * O(len × maxTokenLen) like greedy) when extensions are registered;
    * a pure-Column DP with IDENTICAL ids otherwise (O(len × vocab)
    * lambda steps — the bounded-probe fallback, same contract as
    * [[greedyTokenizeIds]]).
    */
  def viterbiTokenizeIds(
      textCol: Column,
      vocab: Seq[String],
      costs: Seq[Int],
      unkCost: Int,
      native: Boolean): Column =
    if (native)
      call_function("graft_viterbi_tokenize", textCol,
        array(vocab.map(lit): _*), array(costs.map(lit): _*), lit(unkCost))
    else {
      require(vocab.nonEmpty && vocab.forall(_.nonEmpty) &&
        vocab.distinct.size == vocab.size,
        "vocab entries must be non-empty and distinct")
      require(costs.size == vocab.size, "one cost per vocab entry")
      val varr = array(vocab.map(lit): _*)
      val carr = array(costs.map(lit): _*)
      // best candidate edge ENDING at prefix length p: fold the vocab,
      // seeded with the always-available unknown edge; element_at(best,
      // k) is the optimal cost of the length-(k-1) prefix
      def bestEdge(text: Column, best: Column, p: Column): Column =
        aggregate(
          sequence(lit(0), lit(vocab.size - 1)),
          struct(
            (element_at(best, p) + lit(unkCost)).as("c"),
            lit(1).as("bl"), lit(-1).as("bi")),
          (acc, i) => ColumnOps.bind(length(element_at(varr, i + 1))) { li =>
            ColumnOps.bind(
              when(li <= p &&
                  text.substr(p - li + 1, li) === element_at(varr, i + 1),
                element_at(best, p - li + 1) + element_at(carr, i + 1))
                .otherwise(lit(null).cast("int"))) { c =>
              when(c.isNotNull &&
                  (c < acc.getField("c") ||
                    (c === acc.getField("c") && (li > acc.getField("bl") ||
                      (li === acc.getField("bl") && i > acc.getField("bi"))))),
                struct(c.as("c"), li.as("bl"), i.cast("int").as("bi")))
                .otherwise(acc)
            }
          })
      when(textCol.isNull, lit(null).cast("array<int>")).otherwise(
        ColumnOps.bind(textCol) { text =>
          ColumnOps.bind(
            // forward DP: append (cost, backpointer len, backpointer id)
            // per prefix length; surplus steps pass the state through
            aggregate(
              sequence(lit(1), greatest(length(text), lit(1))),
              struct(
                array(lit(0)).as("best"),
                array(lit(0)).as("bplen"), array(lit(0)).as("bpid")),
              (st, p) =>
                when(p > length(text), st)
                  .otherwise(ColumnOps.bind(
                    bestEdge(text, st.getField("best"), p)) { b =>
                    struct(
                      concat(st.getField("best"),
                        array(b.getField("c"))).as("best"),
                      concat(st.getField("bplen"),
                        array(b.getField("bl"))).as("bplen"),
                      concat(st.getField("bpid"),
                        array(b.getField("bi"))).as("bpid"))
                  }))) { fin =>
            // backtrack: n steps max, prepend the backpointer id at pos,
            // hop back by its length; surplus steps pass through
            aggregate(
              sequence(lit(1), greatest(length(text), lit(1))),
              struct(length(text).as("pos"), lit(Array.empty[Int]).as("ids")),
              (st, _) =>
                when(st.getField("pos") <= 0, st)
                  .otherwise(struct(
                    (st.getField("pos") -
                      element_at(fin.getField("bplen"), st.getField("pos") + 1)).as("pos"),
                    concat(
                      array(element_at(fin.getField("bpid"), st.getField("pos") + 1)),
                      st.getField("ids")).as("ids"))),
              st => st.getField("ids"))
          }
        })
    }

  /** [[viterbiTokenizeIds]] over a documents table, summarized exactly
    * like [[greedyTokenize]] (token count, unknown count, id sequence as
    * text) so the two segmentations are directly comparable — with
    * all-ones costs `n_tokens` is MINIMAL by construction, and
    * `q_tokenize_viterbi` vs `q_tokenize_greedy` measures what the
    * greedy heuristic leaves on the table at identical vocab.
    */
  def viterbiTokenize(
      df: DataFrame,
      vocab: Seq[String],
      costs: Seq[Int] = Seq.empty,
      unkCost: Int = 1,
      maxChars: Int = 80,
      textCol: String = "text"): DataFrame = {
    val cs = if (costs.isEmpty) Seq.fill(vocab.size)(1) else costs
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    val s = col(textCol).substr(lit(1), lit(maxChars))
    df.select(
      col("doc_id"),
      ColumnOps.bind(viterbiTokenizeIds(s, vocab, cs, unkCost, native)) { ids =>
        struct(
          size(ids).cast("long").as("n_tokens"),
          size(filter(ids, x => x === -1)).cast("long").as("n_unk"),
          array_join(transform(ids, x => x.cast("string")), " ").as("ids_str"))
      }.as("q"))
      .select(col("doc_id"), col("q.n_tokens"), col("q.n_unk"), col("q.ids_str"))
  }

  /** Corpus-level summary statistics — the sanity dashboard over a
    * training corpus: one partial-aggregated pass, constant-size output.
    */
  def corpusStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol))).cast("long")
    df.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        sum(nTok).as("total_tokens"),
        min(nTok).as("min_tokens"),
        max(nTok).as("max_tokens"))
      // avg from the exact integer sums, not avg(): engines differ in the
      // internal accumulation type of avg over integers; sum/count of
      // exact longs divides identically everywhere
      .withColumn("avg_chars",
        round(col("total_chars") / col("n_docs").cast("double"), 4))
  }

  /** Overlapping token-window chunking — the document→training-example
    * splitter of an embedding/pretraining pipeline: chunk `i` covers
    * tokens `[i·stride, i·stride + chunkTokens)`, so consecutive chunks
    * overlap by `chunkTokens - strideTokens` tokens; the final chunk is
    * whatever remains (≤ chunkTokens). Every document yields ≥ 1 chunk.
    *
    * One narrow Generate per document — chunk count is integer arithmetic
    * on the token count (exact in any engine), the slices index one
    * let-bound token array, and nothing shuffles: 100 TB chunks exactly
    * like 100 MB.
    */
  def chunk(
      df: DataFrame,
      chunkTokens: Int = 64,
      strideTokens: Int = 48,
      textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    import graft.functions.ColumnOps
    // exact integer ceil-div on non-negative operands (no double round-trip)
    def idivCeil(a: Column, b: Int): Column = ColumnOps.fdiv(a + (b - 1), b.toLong)
    // coalesce: the documented contract is "every document yields >= 1
    // chunk" — transform(NULL tokens) would posexplode to zero rows and
    // silently drop NULL-text doc_ids; NULL behaves like empty text
    val pieces = ColumnOps.bind(tokens(coalesce(col(textCol), lit("")))) { toks =>
      ColumnOps.bind(size(toks)) { n =>
        val nChunks = when(n <= chunkTokens, lit(1))
          .otherwise(idivCeil(n - chunkTokens, strideTokens) + 1)
        transform(
          sequence(lit(0), nChunks.cast("int") - 1),
          i =>
            struct(
              array_join(slice(toks, i * strideTokens + 1, lit(chunkTokens)), " ")
                .as("chunk_text"),
              least(lit(chunkTokens), n - i * strideTokens).cast("long")
                .as("n_tokens")))
      }
    }
    df.select(col("doc_id"), posexplode(pieces))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col.chunk_text"),
        col("col.n_tokens"))
  }

  /** SEMANTIC chunking — boundaries where the CONTENT drifts, not at
    * fixed offsets (the TextTiling idea, Hearst 1997, as modern RAG
    * ingestion practices it with embeddings): the document is cut into
    * fixed `windowWords` word windows, each window gets a `dims`-bucket
    * hashed bag-of-words vector ([[graft.functions.PortableHash.h28]]
    * buckets — the doc_clusters embedding, per window), and a chunk
    * boundary falls BEFORE every window whose cosine against its
    * predecessor drops below `thresholdMicro` (micro-quantized, the
    * qcosinePre rule, so both engines compare the identical integer).
    * Fixed-window chunking ([[chunk]]) cuts mid-topic; CDC ([[
    * cdcChunks]]) cuts at hash-lucky tokens; THIS cuts where the word
    * distribution shifts — the boundary a retrieval index wants.
    *
    * Everything happens in ONE codegen'd projection per row (windowing,
    * hashing, consecutive cosines, prefix-summed chunk ids, per-chunk
    * reassembly) followed by a posexplode — no shuffle, no state; 100 TB
    * chunks exactly like 100 MB. Window counts are document-sized, so
    * the in-row O(windows²) prefix sums are bounded by ~len/W.
    *
    * Output: `(doc_id, chunk_id, n_windows, chunk_text)`; every
    * non-empty document yields ≥ 1 chunk; `thresholdMicro = 0` returns
    * whole documents, `> 1e6` one chunk per window.
    */
  def semanticChunks(
      df: DataFrame,
      windowWords: Int = 12,
      dims: Int = 16,
      thresholdMicro: Long = 450000L,
      textCol: String = "text"): DataFrame = {
    require(windowWords > 0, s"windowWords must be positive, got $windowWords")
    require(dims > 0, s"dims must be positive, got $dims")
    import graft.functions.{ColumnOps, PortableHash}
    val W = windowWords
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val pieces = ColumnOps.bind(
      filter(normTokens(coalesce(col(textCol), lit(""))), w => w =!= "")) {
      ws =>
        // >= 1 window even for empty text (the chunk() one-row contract)
        ColumnOps.bind(greatest(lit(1),
          floor((size(ws) + lit(W - 1)) / lit(W)).cast("int"))) { nWin =>
          ColumnOps.bind(transform(sequence(lit(0), nWin - 1),
            i => slice(ws, i * W + 1, lit(W)))) { wins =>
            // ONE md5 per word (let-bound bucket array), then windows of
            // BUCKETS feed the per-dim counts — without this the per-dim
            // filter re-hashes every word `dims` times (measured 10×)
            ColumnOps.bind(ColumnOps.bind(
              transform(ws, w => pmod(PortableHash.h28(w), lit(dims.toLong)))) {
              bs =>
                transform(sequence(lit(0), nWin - 1),
                  i => slice(bs, i * W + 1, lit(W)))
            }) { bwins =>
            ColumnOps.bind(transform(bwins, wn =>
              transform(sequence(lit(0), lit(dims - 1)), d =>
                size(filter(wn, b => b === d.cast("long")))
                  .cast("long")))) { vs =>
              // boundary flag per window: 1 iff the micro-cosine against
              // the previous window dips under the threshold (window 0
              // never opens a boundary)
              ColumnOps.bind(transform(sequence(lit(0), nWin - 1), i =>
                when(i === 0, lit(0L)).otherwise(
                  when(
                    round(
                      dot(element_at(vs, i), element_at(vs, i + 1)) /
                        sqrt(
                          dot(element_at(vs, i), element_at(vs, i))
                            .cast("double") *
                          dot(element_at(vs, i + 1), element_at(vs, i + 1))
                            .cast("double")) * lit(1e6)).cast("long")
                      < thresholdMicro, lit(1L)).otherwise(lit(0L))))) { b =>
                // chunk id = prefix sum of boundary flags (in-row,
                // O(windows²) on a bounded window count)
                ColumnOps.bind(transform(sequence(lit(0), nWin - 1), i =>
                  aggregate(slice(b, lit(1), i + 1), lit(0L), (acc, x) => acc + x))) {
                  ids =>
                    transform(array_distinct(ids), c =>
                      ColumnOps.bind(filter(sequence(lit(0), nWin - 1),
                        i => element_at(ids, i + 1) === c)) { members =>
                        struct(
                          c.as("chunk_id"),
                          size(members).cast("long").as("n_windows"),
                          array_join(
                            flatten(transform(members,
                              i => element_at(wins, i + 1))), " ")
                            .as("chunk_text"))
                      })
                }
              }
            }
          }
          }
        }
    }
    df.select(col("doc_id"), explode(pieces).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_windows"),
        col("c.chunk_text"))
  }

  /** Content-defined chunking at token granularity (the gear/FastCDC idea
    * applied to text): a chunk boundary falls AFTER every token whose
    * portable hash is ≡ 0 (mod `divisor`), so boundaries are decided by
    * LOCAL content only — insert or delete a paragraph and every chunk
    * outside it keeps its exact span and hash, which is what makes
    * chunk-level dedup/CDC storage stable under edits (fixed-size chunking
    * shifts every downstream boundary). Expected chunk length = `divisor`
    * tokens; no min/max clamp (the clamp would make the scan sequential —
    * at the corpus level the geometric tail is harmless and both engines
    * replay the unclamped rule exactly).
    *
    * Output: `doc_id, chunk_id, n_tokens, chunk_md5` — identical token
    * runs anywhere in the corpus yield identical `chunk_md5`, the
    * dedup/changed-chunk key.
    *
    * Plan shape: ONE narrow Generate per document — boundary positions,
    * segment spans, and hashes are all in-row array algebra over a
    * let-bound token array ([[graft.functions.ColumnOps.bind]]); nothing
    * shuffles. 100 TB chunks like 100 MB.
    */
  def cdcChunks(
      df: DataFrame,
      divisor: Int = 16,
      textCol: String = "text"): DataFrame =
    chunkSpans(df, divisor, textCol)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_md5")

  /** Shared CDC segmentation: one narrow Generate per document yielding
    * `(doc_id, chunk_id, n_tokens, chunk_text, chunk_md5)`. Callers that
    * don't reference `chunk_text` pay nothing extra — the md5 expression
    * inlines the slice, and column pruning drops the text column.
    */
  private def chunkSpans(
      df: DataFrame,
      divisor: Int,
      textCol: String): DataFrame = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    import graft.functions.{ColumnOps, PortableHash}
    // The whole segmentation — boundary scan AND chunk-text slicing —
    // lives inside ONE let-bound generator expression: the token array
    // is bound once per DOCUMENT. The earlier shape aliased the spans
    // only and sliced `ws` in the post-Generate projection, where
    // CollapseProject inlined the tokenization into every chunk row —
    // the corpus re-tokenized once per CHUNK (~n_tokens/divisor times
    // per doc; measured 1.7× on q_cdc_chunks, 1.5× on q_cdc_dedup at
    // sf0.1 removing it).
    val segs = ColumnOps.bind(normTokens(coalesce(col(textCol), lit("")))) { ws =>
      ColumnOps.bind2(
        size(ws),
        filter(sequence(lit(1), size(ws)),
          i => PortableHash.h28(element_at(ws, i)) % divisor === 0)) { (n, bps) =>
        ColumnOps.bind(size(bps)) { nb =>
          transform(
            filter(
              transform(sequence(lit(0), nb), k =>
                struct(
                  when(k === 0, lit(1)).otherwise(element_at(bps, k) + 1)
                    .as("start"),
                  when(k < nb, element_at(bps, k + 1)).otherwise(n)
                    .as("end"))),
              seg => seg("start") <= seg("end")),
            seg =>
              struct(
                (seg("end") - seg("start") + 1).cast("long").as("n_tokens"),
                array_join(
                  slice(ws, seg("start"), seg("end") - seg("start") + 1),
                  " ").as("chunk_text")))
        }
      }
    }
    df.select(col("doc_id"), posexplode(segs))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col.n_tokens").as("n_tokens"),
        col("col.chunk_text").as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }

  /** Chunk-level dedup APPLY — the C4 line-dedup rule at content-defined
    * granularity: each distinct chunk survives only at its FIRST corpus
    * occurrence (lowest doc_id, then chunk_id — duplicates within one
    * document dedup too); documents are reassembled from their surviving
    * chunks in order. Content-defined boundaries mean a boilerplate block
    * shared mid-paragraph dedups even when surrounding line breaks
    * differ — the case line-level dedup misses.
    *
    * Output: `doc_id, n_chunks, n_kept, text_kept` (empty string when
    * every chunk was seen earlier; every document keeps its row).
    *
    * Scale shape: the winner rank shuffles `(digest, doc_id, chunk_id)`
    * only — chunk TEXT never rides the dedup decision (column pruning
    * splits the shared Generate); text moves once, in the per-doc
    * reassembly exchange, bounded by document size.
    */
  def cdcDedupChunks(
      df: DataFrame,
      divisor: Int = 8,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = chunkSpans(df, divisor, textCol)
    // The DECISION side (winner rank + per-doc chunk counts) reads a
    // MATERIALIZED narrow chunk table — (doc_id, chunk_id, chunk_md5),
    // ~24 bytes/chunk — instead of re-deriving the chunking subtree per
    // consumer: before this checkpoint the corpus tokenized three times
    // (winners, counts, reassembly). Text still never rides a dedup
    // shuffle, and the reassembly pass below re-derives it once.
    val meta = ch.select(col("doc_id"), col("chunk_id"), col("chunk_md5"))
      .localCheckpoint()
    val winners = meta
      .withColumn("rn", row_number().over(
        Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("chunk_id"))
    val kept = ch.join(winners, Seq("doc_id", "chunk_id"), "left_semi")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
            p => p("chunk_text")), " ").as("text_kept"))
    meta.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Encoding-quality scan — the byte-hygiene gate of a crawl pipeline:
    * documents that survived a charset mis-detection carry U+FFFD
    * replacement characters, stray C0 control bytes, or classic
    * UTF-8-read-as-Latin-1 mojibake ('é' → 'Ã©', i.e. 'Ã' followed by a
    * Latin-1 high character). Counts each signal, the ASCII ratio, and a
    * `keep` verdict (no corruption markers at all).
    *
    * One codegen'd projection per row — four regex counts over the text,
    * no shuffle; the downstream filter is `WHERE keep`.
    */
  def encodingQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    def cnt(c: Column, pattern: String): Column =
      size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")
    val t = coalesce(col(textCol), lit(""))
    df.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      cnt(t, "\\x{FFFD}").as("n_replacement"),
      cnt(t, "[\\x{00}-\\x{08}\\x{0E}-\\x{1F}\\x{7F}]").as("n_control"),
      cnt(t, "\\x{C3}[\\x{80}-\\x{FF}]").as("n_mojibake"),
      round(cnt(t, "[\\x{00}-\\x{7F}]").cast("double") /
        greatest(length(t), lit(1)), 6).as("ascii_ratio"))
      .withColumn("keep",
        col("n_replacement") === 0 && col("n_control") === 0 &&
          col("n_mojibake") === 0)
  }

  /** Corpus-level top-K n-grams per language — the vocabulary/boilerplate
    * dashboard over a training corpus (and the input to stopword/cliché
    * filters). Shape: explode each doc's distinct n-grams (distinct per
    * doc so boilerplate repetition inside one document doesn't dominate),
    * count per (lang, gram) with map-side combine, then per-language top-K
    * via `WindowGroupLimit` — the per-partition rank filter prunes before
    * the final shuffle, so the full gram distribution never sorts
    * globally. Ties break lexicographically for cross-engine determinism.
    *
    * `native = true` replaces the rank window with the EXACT mergeable
    * [[graft.plans.TopKAgg]] aggregate (`graft_top_k`): identical rows
    * under the same (n_docs DESC, gram ASC) order — spec'd, and the
    * shared oracle pins both — but selection runs as a k-bounded heap
    * inside ObjectHashAggregate instead of WindowGroupLimit's full
    * per-partition sort of the gram table (O(D log k) vs O(D log D)
    * per partition over corpus-sized distinct grams), and as an
    * ordinary aggregate it also serves complete-mode streams where
    * rank windows are unsupported.
    */
  def topNgrams(df: DataFrame, n: Int = 2, k: Int = 10, textCol: String = "text",
      native: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col("lang"),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("gram"))
      .groupBy("lang", "gram")
      .agg(count(lit(1)).as("n_docs"))
    if (native) {
      counts.groupBy("lang")
        .agg(call_function("graft_top_k",
          col("gram"), col("n_docs"), lit(k)).as("__tk"))
        .select(col("lang"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("lang"), (col("__pos") + 1).cast("long").as("rank"),
          col("__e.key").as("gram"), col("__e.cnt").as("n_docs"))
    } else {
      val w = Window.partitionBy("lang").orderBy(desc("n_docs"), asc("gram"))
      counts
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("lang", "rank", "gram", "n_docs")
    }
  }

  /** PII redaction: mask emails, URLs, and long digit runs (phone/account
    * numbers) with typed placeholder tokens, reporting per-document match
    * counts — the standard scrub pass before pretraining on web text.
    *
    * One narrow codegen'd projection (three `regexp_replace` + three
    * `regexp_extract_all` counts); patterns are RE2-compatible (no
    * backreferences/lookahead) so the SAME expressions replay in any
    * engine. Order matters and is fixed: URLs first (emails and digit runs
    * embed in URLs), then emails, then digit runs of `minDigits`+.
    */
  def redactPii(df: DataFrame, textCol: String = "text", minDigits: Int = 7): DataFrame = {
    val urlPat = "https?://[^\\s]+"
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numPat = s"[0-9]{$minDigits,}"
    def count(c: Column, pat: String): Column =
      size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")
    val t = col(textCol)
    // explode(array(struct)) Generate barrier: the URL- and email-stripped
    // intermediates evaluate ONCE per row and feed all four outputs —
    // without it CollapseProject would re-run the replacement chain per
    // referencing column (see memory: collapseproject-bind-trick)
    import graft.functions.ColumnOps
    val packed = ColumnOps.bind(regexp_replace(t, urlPat, "<URL>")) { noUrl =>
      ColumnOps.bind(regexp_replace(noUrl, emailPat, "<EMAIL>")) { noEmail =>
        struct(
          count(t, urlPat).as("n_urls"),
          // emails/numbers counted on the stripped text, matching what the
          // sequential replacement actually redacts
          count(noUrl, emailPat).as("n_emails"),
          count(noEmail, numPat).as("n_numbers"),
          regexp_replace(noEmail, numPat, "<NUM>").as("redacted"))
      }
    }
    df.select(col("doc_id"), explode(array(packed)).as("q"))
      .select(col("doc_id"), col("q.n_urls"), col("q.n_emails"),
        col("q.n_numbers"), col("q.redacted"))
  }

  /** C4-style blocklist gate: per-document count of tokens on a blocked
    * word list (case-insensitive) and a keep flag at `maxHits` — the
    * "bad words" filter every public crawl pipeline applies before
    * training. The list compiles into the plan as an `isin` literal set
    * (hash-set probe per token in codegen), so the filter is one narrow
    * pass: no join, no broadcast, nothing at any corpus size. Use a
    * broadcast join instead only if the list outgrows a plan literal
    * (~thousands of entries).
    */
  def blocklistFilter(
      df: DataFrame,
      blocked: Seq[String],
      maxHits: Int = 0,
      textCol: String = "text"): DataFrame = {
    require(blocked.nonEmpty, "blocked word list must not be empty")
    require(maxHits >= 0, s"maxHits must be >= 0, got $maxHits")
    val lowered = blocked.map(_.toLowerCase)
    df.select(
      col("doc_id"),
      ColumnOps.bind(
        size(filter(tokens(lower(col(textCol))), t => t.isin(lowered: _*)))
          .cast("long")) { hits =>
        struct(
          hits.as("blocked_hits"),
          (hits <= maxHits).as("keep"))
      }.as("_b"))
      .select(col("doc_id"), col("_b.blocked_hits"), col("_b.keep"))
  }

  /** Structured PII scan — the detection half of a redaction pipeline,
    * with CHECKSUM validation: phone numbers, IPv4 addresses, and
    * 16-digit card candidates, where candidates are verified with the
    * Luhn algorithm (Spark's codegen'd `luhn_check`) so that random
    * digit runs don't count as card exposure. The valid/seen split is
    * what a compliance dashboard needs — raw pattern hits overcount
    * wildly on numeric data.
    *
    * One narrow projection; the Luhn filter runs inside a higher-order
    * `filter` over the extracted candidates — no explode, no UDF.
    */
  def piiScan(df: DataFrame, textCol: String = "text"): DataFrame = {
    val phonePat = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ipPat = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val cardPat = "[0-9]{16}"
    val t = col(textCol)
    // explode(array(struct)) Generate barrier: without it CollapseProject
    // inlines the card extraction + Luhn filter into EACH referencing
    // output column (see memory: collapseproject-bind-trick)
    val packed = ColumnOps.bind(regexp_extract_all(t, lit(cardPat), lit(0))) {
      cards =>
        struct(
          size(regexp_extract_all(t, lit(phonePat), lit(0))).cast("long")
            .as("n_phones"),
          size(regexp_extract_all(t, lit(ipPat), lit(0))).cast("long")
            .as("n_ips"),
          size(cards).cast("long").as("n_cards"),
          size(filter(cards, c => call_function("luhn_check", c)))
            .cast("long").as("n_valid"))
    }
    df.select(col("doc_id"), explode(array(packed)).as("p"))
      .select(col("doc_id"), col("p.n_phones"), col("p.n_ips"),
        col("p.n_cards"), col("p.n_valid"))
  }

  /** Per-language document-length quantiles — the distribution dashboard
    * behind length-filter thresholds. EXACT interpolated percentiles
    * (Spark `percentile`, not `percentile_approx`): both Spark and
    * standard engines implement the same (n−1)·p linear interpolation,
    * so the numbers are comparable across systems — approximate sketches
    * are not. One sort-based aggregate per language; at 100 TB switch the
    * call to `percentile_approx` for a mergeable sketch, same query shape.
    */
  def lengthQuantiles(df: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol))).cast("long")
    df.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(nTok, lit(0.5)).as("p50_tokens"),
        percentile(nTok, lit(0.9)).as("p90_tokens"),
        percentile(nTok, lit(0.99)).as("p99_tokens"))
  }

  /** The SCALE form of [[lengthQuantiles]] — same dashboard (per-language
    * document-length quantiles), routed through the mergeable
    * [[graft.plans.QuantileSketchAgg]] compactor instead of the exact
    * `percentile` sort. The wire-volume difference is the point at
    * 100 TB: `percentile` ships EVERY per-document length through the
    * shuffle and sorts per group; the sketch ships one bounded
    * O(capacity·log(N/capacity)) summary per partition per group
    * (partial aggregation verified in-plan, the `q_heavy_hitters`
    * proof pattern), then reads the quantiles off the merged summary.
    *
    * Quantile rule is the sketch family's integer-exact DISCRETE one
    * (smallest observed value with cum·1000 ≥ p·total) — always an
    * observed length, replayable verbatim in ANSI SQL — where
    * [[lengthQuantiles]] interpolates; in the exact regime (lengths per
    * language < capacity) the summary is the exact multiset, so the
    * discrete answers are exact, not approximate. NULL text counts as
    * the empty document (1 whitespace token), same as the exact twin's
    * grouping sees through `coalesce`.
    */
  def lengthQuantilesSketch(
      df: DataFrame,
      textCol: String = "text",
      capacity: Int = 32768,
      native: Boolean = false): DataFrame = {
    val vals = df.select(col("lang"),
      size(tokens(coalesce(col(textCol), lit("")))).cast("long").as("__n"))
    CorpusOps.quantileSketch(vals, valueCol = "__n", groupCol = "lang",
      probsPermille = Seq(500, 900, 990), capacity = capacity,
      native = native)
      .select(col("lang"), col("n_values").as("n_docs"),
        col("p500").as("p500_tokens"), col("p900").as("p900_tokens"),
        col("p990").as("p990_tokens"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash each k-gram, slide a window of `w` consecutive
    * hashes, keep each window's minimum — guaranteeing any match of
    * length ≥ w+k−1 shares a fingerprint while storing only ~2/(w+1) of
    * the hashes. The robust-to-insertion middle ground between one
    * whole-document hash and storing every shingle; output is the
    * exploded (doc_id, fingerprint) set ready for an inverted-index
    * self-join (same shape as [[Dedup.ngramJaccardPairs]]'s gram join).
    *
    * Hashes use the portable md5-prefix family so the whole selection
    * replays in the oracle; one narrow Generate per document, no shuffle.
    */
  def winnow(df: DataFrame, k: Int = 3, w: Int = 4, textCol: String = "text"): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    import graft.functions.{ColumnOps, PortableHash}
    val fps = ColumnOps.bind(
      transform(Dedup.shingles(col(textCol), k), s => PortableHash.h28(s))) { hs =>
      ColumnOps.bind(size(hs)) { n =>
        // fewer than w windows -> a single window over everything (the
        // standard small-document degeneration: keep the global min)
        when(n <= w, array(array_min(hs)))
          .otherwise(array_distinct(
            transform(
              sequence(lit(1), n - (w - 1)),
              i => array_min(slice(hs, i, lit(w))))))
      }
    }
    // both branches already emit per-document-distinct values
    // (array_distinct / single element), so the exploded set needs no
    // dedup shuffle — the operator stays one narrow Generate per doc.
    // Callers with duplicate doc_id rows must dedup upstream.
    df.select(col("doc_id"), explode(fps).as("fingerprint"))
  }

  /** Candidate near-dup pairs from [[winnow]] fingerprints: documents
    * sharing ≥ `minShared` selected fingerprints, with the shared count —
    * the inverted-index join over the winnowed (not full) gram set, so
    * the shuffle carries ~2/(w+1) of the rows the full-shingle join
    * would. Feed survivors to [[Dedup.ngramJaccardPairs]] for exact
    * verification.
    */
  def winnowPairs(
      df: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      textCol: String = "text",
      maxBucket: Int = 100000): DataFrame = {
    // capBuckets: a boilerplate fingerprint shared by N docs (headers,
    // license text) would make that one join key O(N²) — same skew
    // insurance as every other LSH-style self-join in the library
    // pin before the self-join: the renamed sides defeat static exchange
    // reuse, so the whole winnow pipeline would otherwise run twice
    val fps = Dedup.capBuckets(
      winnow(df, k, w, textCol), Seq("fingerprint"), maxBucket)
      .localCheckpoint()
    fps.select(col("doc_id").as("a_id"), col("fingerprint"))
      .join(fps.select(col("doc_id").as("b_id"), col("fingerprint")), "fingerprint")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Document fingerprinting.
    *
    *   - `fp_md5`: content hash of whitespace-normalized, lowercased text —
    *     the exact-dedup key.
    *   - `fp_roll`: 64-bit-safe polynomial rolling hash (base 31, mod 1e9+7)
    *     over characters, computed as a codegen'd `aggregate` fold. The
    *     modulus keeps the accumulator < 2^60, so ANSI overflow checking
    *     never fires, and the fold is sequential → bit-identical in any
    *     engine that replays it.
    */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val native = graft.plans.GraftExtensions.available(df.sparkSession)
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    // native [[graft.plans.RollHash]] and the HOF fallback compute the
    // SAME hash (code-point fold; equality proven by RollHashSpec and the
    // DuckDB oracle) — this is a speed knob, not a hash-family switch
    val roll =
      if (native) call_function("graft_roll_hash", norm)
      else expr(
        s"aggregate(split(lower(regexp_replace($textCol, '\\\\s+', ' ')), ''), " +
          "0L, (h, c) -> (h * 31 + ascii(c)) % 1000000007)")
    df.select(
      col("doc_id"),
      md5(norm).as("fp_md5"),
      roll.as("fp_roll"))
  }

  /** Sequence packing, GPT-pretraining style: concatenate documents in
    * deterministic (group, doc_id) order and cut every `seqTokens`
    * tokens. Each document's placement — which training sequence it
    * starts in, at what offset, whether it spans a cut — falls out of an
    * exclusive running token sum; no iteration, no driver loop.
    *
    * Packing happens WITHIN `groupCol` shards (language here; any
    * bounded hash-bucket key in production): the window sort is per
    * shard, so no global single-partition ordering bottleneck exists at
    * corpus scale — shard sizes bound the sort, and shards pack in
    * parallel.
    */
  def packSequences(
      df: DataFrame,
      seqTokens: Int,
      groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(groupCol), col("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(
        col(groupCol), col("doc_id"), col("n_tokens"),
        ColumnOps.fdiv(col("cum_before"), seqTokens.toLong).as("seq_id"),
        (col("cum_before") % seqTokens).as("offset"),
        ((col("cum_before") % seqTokens) + col("n_tokens") > seqTokens)
          .as("spans_cut"))
  }

  /** Vocabulary pruning report: the n-grams worth keeping — document
    * frequency ≥ `minDf` — with their corpus stats. The inverse filter
    * (df < minDf) is the OOV cut pretraining tokenizer prep applies; at
    * corpus scale this is one (gram → partial-agg) shuffle, the same
    * shape as [[topNgrams]] without the per-language window.
    */
  def vocabulary(
      df: DataFrame,
      minDf: Int = 2,
      n: Int = 1,
      textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Per-(document, term) TF-IDF weights in exact integer milli-units.
    *
    * `w = tf · round(ln(N/df)·1000)`: the idf factor is quantized ONCE
    * PER TERM (vocab-sized rounding count), after which every weight,
    * norm, and dot product downstream is exact long arithmetic —
    * engine- and partitioning-independent. Milli (not micro) keeps the
    * worst case inside a long: `tf ≤ 10^6, idf_milli < 2·10^4` →
    * `w < 2·10^10`, `w² < 4·10^20`... so callers that square (see
    * [[tfidfPairs]]) prune with `maxDf` first, which also bounds tf
    * in practice.
    *
    * Plan shape: explode → (doc, term) partial-agg [the one data-sized
    * shuffle] → vocab-sized df agg → join back ON TERM. The df side is
    * vocab-sized, not corpus-sized — far smaller than the tf stream but
    * not broadcastable at web scale, so it stays a shuffle join keyed on
    * the term; N folds in as a broadcast single-row aggregate.
    *
    * `maxDf` drops terms appearing in more than that many documents —
    * stopword-class terms carry ~zero idf signal and produce the
    * quadratic posting lists, so capping df is both the relevance AND
    * the scale knob (classic impact-ordered index pruning).
    */
  def tfidfWeights(
      df: DataFrame,
      maxDf: Long = Long.MaxValue,
      textCol: String = "text"): DataFrame = {
    val tf = df.select(
        col("doc_id"),
        explode(normTokens(col(textCol)))
          .as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
      .filter(col("df_t") <= maxDf)
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"), col("tf"), col("df_t"),
        (col("tf") *
          round(log(col("n_docs").cast("double") / col("df_t")) * 1000)
            .cast("long")).as("w_milli"))
  }

  /** Top-`k` most characteristic terms per document by TF-IDF weight,
    * ties broken lexicographically — the "what is this document about"
    * extractor. One ranking window per doc on top of [[tfidfWeights]].
    */
  def tfidfTopTerms(
      df: DataFrame,
      k: Int = 5,
      maxDf: Long = Long.MaxValue,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("w_milli").desc, col("term"))
    tfidfWeights(df, maxDf, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df_t"), col("w_milli"))
  }

  /** Lexical near-duplicate / related-document pairs: cosine similarity
    * over TF-IDF vectors, computed SPARSELY through the inverted index —
    * a self-join on the term, never on documents, so only pairs that
    * SHARE a term are ever materialized (document-at-a-time sparse
    * retrieval, the textbook scale-out for pairwise text similarity).
    *
    * `maxDf` caps posting-list length: join fan-out is Σ_term df², so
    * the cap turns a quadratic blow-up on stopwords into a bounded
    * cost — at 100 TB you'd set it so the hottest surviving posting
    * list still fits a partition. Norms are computed over the SAME
    * pruned vectors, keeping cosine internally consistent.
    *
    * Dot products and norms are exact long sums of milli-unit weights;
    * the only floating point is the final `dot/(√na·√nb)` (sqrt is
    * IEEE-correctly-rounded in both engines), rounded to 6 places —
    * the [[graft.ops.Similarity.qcosine]] determinism argument.
    */
  def tfidfPairs(
      df: DataFrame,
      maxDf: Long = 50L,
      minSim: Double = 0.2,
      textCol: String = "text"): DataFrame = {
    // the pruned weight stream feeds BOTH self-join sides and the norms:
    // pin it once (Dedup.duplicateGroups' measured pattern) or the whole
    // tokenize→tf→df→join pipeline replays three times
    val w = tfidfWeights(df, maxDf, textCol)
      .select(col("doc_id"), col("term"), col("w_milli"))
      .localCheckpoint()
    // Products route through decimal: w_milli is bounded by PER-DOCUMENT
    // term frequency (maxDf bounds document frequency, not tf), so a
    // degenerate repeated-term doc can push w² past Long.MaxValue —
    // ANSI overflow — while decimal(38,0) sums stay exact.
    def dprod(a: Column, b: Column): Column =
      (a.cast("decimal(18,0)") * b.cast("decimal(18,0)")).cast("decimal(38,0)")
    val norms = w.groupBy("doc_id")
      .agg(sum(dprod(col("w_milli"), col("w_milli"))).as("n2"))
    val dots = w.as("a").join(w.as("b"), Seq("term"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(sum(dprod(col("a.w_milli"), col("b.w_milli"))).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("a_id"), col("n2").as("na2")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("n2").as("nb2")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Exact shared-substring spans for candidate document pairs — the
    * exact tier of substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): for each candidate
    * pair, the LONGEST run of consecutive shared `n`-gram positions,
    * i.e. the longest common token substring, found with the
    * gaps-and-islands window trick instead of suffix arrays:
    *
    * matching n-gram occurrences (posA, posB) that belong to one
    * contiguous shared span all lie on one DIAGONAL (posA − posB
    * constant) at consecutive posA — so island id = posA − row_number
    * per (pair, diagonal), and the longest island's length `L` gives a
    * shared span of `L + n − 1` tokens. Pure integer window arithmetic:
    * replayed exactly by the oracle.
    *
    * Scale shape: candidates come from a BANDED generator
    * ([[winnowPairs]] / MinHash) — never all pairs; the position join
    * touches only candidate documents (semi-join pruned) and joins on
    * the GRAM VALUE, so each pair's cost is its shared-gram count, not
    * its length product.
    */
  def overlapSpans(
      df: DataFrame,
      pairs: DataFrame,
      n: Int = 3,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id")))
      .distinct()
    // pin: g feeds BOTH renamed sides of the position join, and renames
    // defeat static exchange reuse — without the checkpoint the semi-join
    // + shingle posexplode pipeline executes once per side (the
    // embeddingDups pattern); released via the caller's
    // releaseCheckpoints(result), reachable from the returned plan
    val g = df.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(Dedup.shingles(col(textCol), n)).as(Seq("pos", "gram")))
      .localCheckpoint()
    val matches = pairs.select(col("a_id"), col("b_id"))
      .join(g.select(col("doc_id").as("a_id"), col("pos").as("pa"),
        col("gram")), "a_id")
      .join(g.select(col("doc_id").as("b_id"), col("pos").as("pb"),
        col("gram")), Seq("b_id", "gram"))
    matches
      .withColumn("island", col("pa") - row_number().over(
        Window.partitionBy(col("a_id"), col("b_id"), col("pa") - col("pb"))
          .orderBy("pa")))
      .groupBy(col("a_id"), col("b_id"),
        (col("pa") - col("pb")).as("diag"), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy("a_id", "b_id")
      .agg(
        (max("run") + (n - 1)).as("max_span_tokens"),
        sum("run").as("n_shared_positions"))
  }

  /** The APPLY tier of exact-substring dedup — the remove-the-duplicated-
    * substring step of Lee et al. 2022 completing the [[overlapSpans]]
    * detect tier: for every candidate pair the longest shared token span
    * is located (same diagonal gaps-and-islands arithmetic), and each
    * document that appears as the HIGHER id of a pair has its single
    * longest qualifying span (`≥ minSpanTokens` tokens) removed from its
    * normalized token sequence — lowest-id-wins keeps one occurrence of
    * the duplicated text in the corpus, the same survivor rule as every
    * other dedup operator here. One span per document per pass (the
    * longest; ties broken by earliest start, then lowest partner id,
    * then diagonal — a total order, so output is deterministic);
    * iterating to a fixpoint is a driver loop over this operator.
    *
    * Output: `doc_id, text, n_removed_tokens` — every input document
    * keeps its row; `text` is the whitespace-normalized token sequence
    * re-joined (the same normalization every comparison ran under, so
    * "unchanged" documents are normalized too, not byte-identical).
    *
    * Scale shape: identical to [[overlapSpans]] (banded candidates, a
    * position join on the gram value touching candidate docs only) plus
    * one window keyed on the stripped document and a final left join
    * back to the corpus — both keyed on doc_id, both data-sized at most
    * once.
    */
  def stripOverlapSpans(
      df: DataFrame,
      pairs: DataFrame,
      n: Int = 3,
      minSpanTokens: Int = 5,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be positive, got $n")
    require(minSpanTokens >= n,
      s"minSpanTokens must be >= n ($n): a shorter span is below gram resolution")
    val ids = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id")))
      .distinct()
    // pin: same double-execution defense as overlapSpans (g feeds both
    // renamed join sides); released via releaseCheckpoints(result)
    val g = df.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(Dedup.shingles(col(textCol), n)).as(Seq("pos", "gram")))
      .localCheckpoint()
    val matches = pairs.select(col("a_id"), col("b_id"))
      .join(g.select(col("doc_id").as("a_id"), col("pos").as("pa"),
        col("gram")), "a_id")
      .join(g.select(col("doc_id").as("b_id"), col("pos").as("pb"),
        col("gram")), Seq("b_id", "gram"))
    val spans = matches
      .withColumn("island", col("pa") - row_number().over(
        Window.partitionBy(col("a_id"), col("b_id"), col("pa") - col("pb"))
          .orderBy("pa")))
      .groupBy(col("a_id"), col("b_id"),
        (col("pa") - col("pb")).as("diag"), col("island"))
      .agg(count(lit(1)).as("run"), min("pb").as("start_b"))
      .withColumn("span_tokens", col("run") + lit(n - 1))
      .filter(col("span_tokens") >= minSpanTokens)
    val winners = spans
      .withColumn("rk", row_number().over(
        Window.partitionBy("b_id").orderBy(
          col("span_tokens").desc, col("start_b").asc,
          col("a_id").asc, col("diag").asc)))
      .filter(col("rk") === 1)
      .select(col("b_id").as("doc_id"), col("start_b"), col("span_tokens"))
    val toks = df.select(col("doc_id"), normTokens(col(textCol)).as("ws"))
    toks.join(winners, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("span_tokens").isNull, array_join(col("ws"), " "))
          .otherwise(array_join(concat(
            slice(col("ws"), lit(1), col("start_b").cast("int")),
            slice(col("ws"),
              (col("start_b") + col("span_tokens") + 1).cast("int"),
              greatest(size(col("ws")) - col("start_b").cast("int")
                - col("span_tokens").cast("int"), lit(0)))), " "))
          .as("text"),
        // clamp: a below-gram-resolution document's whole-text "gram"
        // claims n tokens it may not have
        coalesce(least(col("span_tokens"),
          size(col("ws")).cast("long") - col("start_b")), lit(0L))
          .as("n_removed_tokens"))
  }

  /** Adjacent-character pair frequencies within words — the statistic a
    * BPE tokenizer trainer computes for its FIRST merge decision (and,
    * iterated with merges applied, every one after). Distributed pair
    * counting is the scalable half of BPE training; the merge loop
    * itself is a driver-side fold over this table's top rows.
    *
    * Plan: explode words → explode in-word char pairs → one counting
    * shuffle keyed on the pair → TakeOrderedAndProject. Pair cardinality
    * is alphabet², so the aggregation output is tiny no matter the
    * corpus.
    */
  def bpePairStats(
      df: DataFrame,
      k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val words = normTokens(col(textCol))
    df.select(explode(words).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => struct(
          col("w").substr(i, lit(1)).as("a"),
          col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Real byte-pair-encoding merge TRAINING: `numMerges` iterations of
    * "count adjacent symbol pairs corpus-wide, merge the most frequent
    * pair everywhere". Output is the ordered merge table — the artifact
    * a BPE tokenizer ships ([[bpePairStats]] is this loop's first
    * iteration; [[greedyTokenize]] applies the trained vocabulary).
    *
    * Architecture is the split industrial trainers use: the corpus is
    * touched ONCE — a counting shuffle that collapses anything TB-sized
    * into a distinct-word frequency table (vocabulary-bounded — tens of
    * millions of rows at web scale, never corpus-sized). That table is
    * `localCheckpoint()`ed, and each merge iteration is one distributed
    * pair-count aggregation over it plus a 1-row `collect` (the argmax —
    * the only driver traffic per iteration). Merge application is a
    * single codegen'd `replace` on the symbol string, so iteration k's
    * job is k narrow string ops over the checkpointed base — no second
    * corpus scan ever, no growing checkpoint chain.
    *
    * Words are represented with every symbol pipe-wrapped (`abc` →
    * `|a||b||c|`); pretokenization keeps only lowercased letter/digit
    * runs (the [[bpeTokenCount]] pretokenizer family), so `|` can never
    * occur inside a symbol and replacing `|a||b|` with `|ab|` is exactly
    * the greedy left-to-right merge (`replace` consumes matches left to
    * right without overlap, so `aaa` merges to `(aa)a`). Ties break
    * (count desc, left asc, right asc); the DuckDB oracle unrolls the
    * same N iterations as chained CTEs with the identical tie-break.
    * Stops early (fewer output rows) if the corpus runs out of pairs.
    */
  def bpeTrain(
      df: DataFrame,
      numMerges: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges must be in [1,64], got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val rep0 = concat(lit("|"),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), "||"),
      lit("|"))
    // the one corpus-sized job: distinct-word frequencies, materialized so
    // the merge iterations rescan a vocabulary, not a corpus
    val words = df
      .select(explode(regexp_extract_all(
        lower(col(textCol)), lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .filter(length(col("w")) >= 2) // 1-char words can never pair
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), rep0.as("rep"))
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var cur = words
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val syms = split(
        col("rep").substr(lit(2), length(col("rep")) - 2), "\\|\\|")
      val top = cur
        .select(col("freq"), syms.as("s"))
        .filter(size(col("s")) >= 2) // sequence(1, 0) would run DOWNWARD
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          i => struct(
            element_at(col("s"), i).as("a"),
            element_at(col("s"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, a, b, cnt))
        cur = cur.withColumn("rep",
          replace(col("rep"), lit(s"|$a||$b|"), lit(s"|$a$b|")))
        k += 1
      }
    }
    // the merge table lives on the driver now — the checkpoint has no
    // remaining consumer
    Dedup.releaseCheckpoints(words)
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** BATCHED BPE training — the job-count fix that takes merge learning
    * past toy scale. [[bpeTrain]] runs ONE distributed pair-count job per
    * merge; real tokenizers need 10⁴–10⁵ merges, and 10⁵ sequential
    * Spark jobs is the bottleneck (per-iteration cost is vocab-sized and
    * fine). The standard production answer (SentencePiece's BPE trainer
    * does the same) is to apply a BATCH of non-interfering merges per
    * counting pass: take the top-`batch` pairs by count, keep a
    * candidate only if NO higher-ranked candidate shares a symbol with
    * it (symbol-disjoint merges have non-overlapping `|a||b|` match
    * sites, so applying them in one pass commutes), and fold all
    * survivors into the representation in one narrow projection. Each
    * round = 1 distributed job + a `batch`-row collect, so 64+ merges
    * cost ~8 jobs instead of 64+.
    *
    * The blocked-by-rank rule is deliberately "blocked by any
    * higher-ranked CANDIDATE" (not "by any higher-ranked SURVIVOR"):
    * both yield valid batches, but the candidate form is order-free and
    * therefore replayable as a plain NOT EXISTS self-join in the DuckDB
    * oracle, where greedy-over-survivors would need a sequential fold.
    * The top-ranked pair always survives, so every round with any pair
    * left learns at least one merge. Merge ranks are assigned globally
    * in (round, within-round rank) order; a batched schedule can differ
    * from the 1-at-a-time schedule (that is the documented trade — both
    * are deterministic), and ties break (count desc, left asc, right
    * asc) exactly like [[bpeTrain]].
    */
  def bpeTrainBatched(
      df: DataFrame,
      rounds: Int = 8,
      batch: Int = 16,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    require(batch >= 1 && batch <= 256, s"batch must be in [1,256], got $batch")
    bpeTrainLoop(df, rounds, textCol, (_, _) => batch)
  }

  /** ADAPTIVE BPE training — the merge-count fix on top of
    * [[bpeTrainBatched]]'s job-count fix, two rule changes deep:
    *
    *   1. GREEDY (blocked-by-SURVIVOR) conflict rule: a candidate
    *      survives iff it shares no symbol with a higher-ranked
    *      SURVIVOR — greedy maximal matching on the symbol-conflict
    *      graph. The batched trainer's blocked-by-CANDIDATE rule
    *      cascades on the hottest symbols (the top pair blocks dozens of
    *      candidates that were themselves already blocked), measured at
    *      ~4 survivors/round on this corpus regardless of batch size;
    *      greedy matching learns every disjoint pair the round offers.
    *      The price is a sequential selection — replayed in the oracle
    *      as a bounded recursive CTE stepping the ranked candidate list
    *      with an accumulated used-symbol list
    *      (`SparkEntry.bpeAdaptiveOracle`), where the order-free
    *      NOT-EXISTS form sufficed for the candidate rule.
    *   2. GEOMETRIC batch growth: round k's candidate-list depth is
    *      `batch(k) = min(maxBatch, batch0 · 2^(k-1))` — top-M grows as
    *      the hot pairs thin out, reaching the cap by round
    *      log2(maxBatch/batch0)+1. The survivor-FEEDBACK variant
    *      (`batch(k) = max(batch0, 2·survivors(k-1))`) was measured to a
    *      dead end: survivor yield is CONCAVE in depth (64 candidates →
    *      ~7 survivors, 1024 → ~15-27), so 2·survivors never escapes the
    *      floor and the trainer plateaus. The data-independent geometric
    *      schedule replays in the oracle as one literal per round.
    *
    * Everything else — the (count desc, a, b) rank, the one-projection
    * fold per round, the every-4-rounds lineage checkpoint — is
    * [[bpeTrainBatched]]'s, verbatim. On the sf0.01 `customer` name
    * vocabulary this reaches production-class merge counts (660 merges)
    * in 32 distributed jobs, where the fixed-batch candidate rule
    * plateaus at ~117; the `documents` corpus saturates at 89 TOTAL
    * learnable merges (30 distinct words) — the trainer drains it fully
    * in 12 rounds and stops.
    */
  def bpeTrainAdaptive(
      df: DataFrame,
      rounds: Int = 32,
      batch0: Int = 64,
      maxBatch: Int = 1024,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    require(batch0 >= 1, s"batch0 must be >= 1, got $batch0")
    require(maxBatch >= batch0,
      s"maxBatch ($maxBatch) must be >= batch0 ($batch0)")
    bpeTrainLoop(
      df, rounds, textCol,
      (k, _) =>
        if (k - 1 >= 31) maxBatch
        else math.min(maxBatch.toLong, batch0.toLong << (k - 1)).toInt,
      greedySurvivors)
  }

  /** Greedy maximal matching over the ranked candidate list: walk in
    * rank order, keep a pair iff neither symbol is already used by a
    * KEPT pair, claim its symbols. (The blocked-by-candidate rule in
    * [[candidateSurvivors]] blocks on pairs that never survived.)
    */
  private def greedySurvivors(
      top: Array[(String, String, Long)]): Array[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    top.filter { case (a, b, _) =>
      if (used(a) || used(b)) false
      else { used += a; used += b; true }
    }
  }

  /** Order-free blocked-by-candidate rule (see [[bpeTrainBatched]]):
    * candidate i survives iff no candidate j < i shares a symbol.
    */
  private def candidateSurvivors(
      top: Array[(String, String, Long)]): Array[(String, String, Long)] =
    top.zipWithIndex.filter { case ((a, b, _), i) =>
      top.take(i).forall { case (pa, pb, _) =>
        pa != a && pa != b && pb != a && pb != b
      }
    }.map(_._1)

  /** Shared batched-training loop: `batchFor(round, prevSurvivors)` sizes
    * each round's ranked candidate list (1-based round; `prevSurvivors`
    * is the count the previous round actually folded — 0 for round 1);
    * `selectSurvivors` is the intra-round conflict rule.
    */
  private def bpeTrainLoop(
      df: DataFrame,
      rounds: Int,
      textCol: String,
      batchFor: (Int, Int) => Int,
      selectSurvivors: Array[(String, String, Long)] => Array[(String, String, Long)] =
        candidateSurvivors): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rep0 = concat(lit("|"),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), "||"),
      lit("|"))
    val words = df
      .select(explode(regexp_extract_all(
        lower(col(textCol)), lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), rep0.as("rep"))
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var cur = words
    // the checkpointed frame cur's lineage currently roots at — rolled
    // forward every few rounds so round k's count job never replays all
    // prior rounds' folded replace projections from `words` (O(rounds²)
    // replace work and an ever-deepening codegen tree otherwise; ADVICE
    // r10). Ownership follows the trainCentroids pattern: eagerly
    // materialize the new generation first, then release only the
    // generation THIS loop superseded.
    var lastCkpt = words
    // EVERY round (round-15, was every 4): the count job's data is
    // vocab-sized either way, but between checkpoints each round's plan
    // re-carries every unfolded replace projection — re-analyzed,
    // re-optimized and re-codegen'd per round on the driver. At 32
    // rounds the depth-capped cadence measured 7.1 s vs 9.5 s (Prof
    // steady reps, sf0.1); the per-round materialization it adds is one
    // vocab-sized job. Driver-paced rounds are the scaling bottleneck
    // for production merge counts, so plan depth — a per-round driver
    // cost — is the honest lever (AQE/codegen toggles inside the loop
    // were measured ~4% each locally and rejected: they only make
    // sense at local vocab sizes).
    val checkpointEvery = 1
    var k = 1
    var exhausted = false
    var prevSurvivors = 0
    while (k <= rounds && !exhausted) {
      val roundT0 = System.nanoTime()
      val syms = split(
        col("rep").substr(lit(2), length(col("rep")) - 2), "\\|\\|")
      // ONE distributed job per ROUND: the full ranked top-`batch`
      // candidate list (not just the argmax) comes back in one collect
      val top = cur
        .select(col("freq"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          i => struct(
            element_at(col("s"), i).as("a"),
            element_at(col("s"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchFor(k, prevSurvivors))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val countSec = (System.nanoTime() - roundT0) / 1e9
      if (top.isEmpty) exhausted = true
      else {
        // intra-round conflict rule: candidate-blocked (order-free NOT
        // EXISTS replay) for the fixed-batch trainer, greedy matching
        // (recursive-CTE replay) for the adaptive one
        val survivors = selectSurvivors(top)
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          System.err.println(
            f"[bpe] round=$k batch=${batchFor(k, prevSurvivors)} " +
              f"candidates=${top.length} survivors=${survivors.length} " +
              f"count=$countSec%.3fs")
        survivors.foreach { case (a, b, cnt) =>
          merges += ((merges.size + 1, a, b, cnt))
        }
        prevSurvivors = survivors.length
        // symbol-disjoint ⇒ non-overlapping match sites ⇒ one folded
        // projection applies the whole batch (order irrelevant; rank
        // order kept for determinism of the expression tree)
        cur = cur.withColumn("rep",
          survivors.foldLeft(col("rep")) { case (acc, (a, b, _)) =>
            replace(acc, lit(s"|$a||$b|"), lit(s"|$a$b|"))
          })
        if (k % checkpointEvery == 0) {
          val superseded = lastCkpt
          cur = cur.localCheckpoint()
          lastCkpt = cur
          Dedup.releaseCheckpoints(superseded)
        }
        k += 1
      }
    }
    // release whatever generation still roots cur's lineage (== `words`
    // when the loop never re-checkpointed); the returned merge table is a
    // driver-side localSeq, so nothing reachable from it is freed here
    Dedup.releaseCheckpoints(lastCkpt)
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** BPE ENCODING with a trained merge list ([[bpeTrain]]'s output): each
    * document's words are segmented by applying the merges in rank order,
    * exactly as GPT-style tokenizers do. Output per document: the
    * space-joined subword sequence and its length — the "how many tokens
    * is this corpus under MY tokenizer" question that drives packing,
    * quota, and cost planning.
    *
    * The merge list is a driver-side constant (the trained artifact —
    * tens of thousands of rows in real tokenizers, 8 here), so encoding
    * is ONE narrow codegen'd projection: build the pipe-wrapped symbol
    * string per document (word reps joined by a space, which no merge
    * pattern can cross), then a fold of `replace` calls — no shuffle, no
    * UDF, no per-row driver traffic; scales linearly with input splits.
    * Greedy left-to-right `replace` semantics match training. The
    * oracle replays the training CTE chain and applies each learned
    * merge through scalar subqueries over the `m{k}` CTEs.
    */
  def bpeEncode(
      df: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val rep0 = array_join(transform(
      regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+"), lit(0)),
      w => concat(lit("|"),
        array_join(transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))), "||"),
        lit("|"))), " ")
    val mergedRep = merges.foldLeft(rep0) { case (acc, (a, b)) =>
      replace(acc, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    // "||" boundaries become spaces, remaining pipes vanish: each word
    // gap contributes exactly one space, so subwords = split on ' '
    val bpeText = replace(replace(mergedRep, lit("||"), lit(" ")),
      lit("|"), lit(""))
    df.select(col("doc_id"),
      ColumnOps.bind(bpeText) { bt =>
        struct(
          when(bt === "", lit(0))
            .otherwise(size(split(bt, " "))).cast("long").as("n_subwords"),
          bt.as("bpe_text"))
      }.as("r"))
      .select(col("doc_id"), col("r.n_subwords"), col("r.bpe_text"))
  }

  /** [[bpeEncode]] with the merge fold applied to the DISTINCT
    * VOCABULARY instead of every document — identical output, different
    * cost model, and the one that survives real merge counts. The fold
    * path scans every corpus byte once PER MERGE (69 merges = 69 passes
    * over 100 TB; 10⁴ merges is infeasible), because each document
    * re-derives every word's segmentation. But segmentation is a pure
    * function of the word: encode each distinct word ONCE (vocab-sized
    * fold — millions of short rows, not terabytes), then map the corpus
    * through the word→subwords table with a join and reassemble in
    * token order. Corpus-side cost becomes ONE tokenize + exchange,
    * independent of merge count — exactly how production tokenizers
    * cache per-word encodings. The join is AQE-broadcast when the vocab
    * fits and a plain word-keyed exchange when it doesn't (web-scale
    * vocabularies don't broadcast; that is the honest shape).
    *
    * Parity with [[bpeEncode]] is structural: word reps are joined by a
    * space in the fold path and no merge pattern can cross `| |`, so
    * per-word encoding equals whole-string encoding (spec-asserted, and
    * `q_bpe_encode_batched` pins it against the fold-semantics oracle).
    */
  def bpeEncodeVocab(
      df: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val toksOf = regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+"), lit(0))
    val rep0 = concat(lit("|"),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), "||"),
      lit("|"))
    def fold(acc: Column, chunk: Seq[(String, String)]): Column =
      chunk.foldLeft(acc) { case (c, (a, b)) =>
        replace(c, lit(s"|$a||$b|"), lit(s"|$a$b|"))
      }
    // Production merge tables are hundreds-to-10⁵ deep, and one nested
    // replace chain that size blows the analyzer/codegen recursion
    // budget (StackOverflow at ~600 at default stack). Apply the fold
    // in bounded chunks with a vocab-sized localCheckpoint between
    // them — the trainCentroids ownership rule (release only the
    // generation THIS loop superseded; the LAST checkpoint is reachable
    // from the returned plan and is freed by the caller's
    // releaseCheckpoints).
    val chunkSize = 96
    val encoded: DataFrame =
      if (merges.size <= chunkSize)
        df.select(explode(toksOf).as("w")).where(col("w") =!= "").distinct()
          .select(col("w"), fold(rep0, merges).as("rep"))
      else {
        var words = df
          .select(explode(toksOf).as("w")).where(col("w") =!= "").distinct()
          .select(col("w"), rep0.as("rep"))
        var owned = false
        merges.grouped(chunkSize).foreach { chunk =>
          val prev = words
          val prevOwned = owned
          words = words.withColumn("rep", fold(col("rep"), chunk))
            .localCheckpoint()
          if (prevOwned) Dedup.releaseCheckpoints(prev)
          owned = true
        }
        words
      }
    val enc = encoded
      .select(col("w"),
        ColumnOps.bind(
          replace(replace(col("rep"), lit("||"), lit(" ")), lit("|"), lit(""))) { ws =>
          struct(ws.as("ws"), size(split(ws, " ")).cast("long").as("nw"))
        }.as("e"))
      .select(col("w"), col("e.ws"), col("e.nw"))
    // posexplode_outer keeps empty/NULL documents as a (null, null)
    // token row, so they survive the aggregation with the fold path's
    // exact semantics: NULL text -> NULL outputs, empty -> ('' , 0)
    df.select(col("doc_id"), isnull(col(textCol)).as("_nl"),
        posexplode_outer(toksOf).as(Seq("pos", "w")))
      .join(enc, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(first("_nl").as("_nl"), sum("nw").as("_n"),
        array_sort(collect_list(struct(col("pos"), col("ws")))).as("pw"))
      .select(col("doc_id"),
        when(col("_nl"), lit(null)).otherwise(coalesce(col("_n"), lit(0L)))
          .cast("long").as("n_subwords"),
        when(col("_nl"), lit(null).cast("string"))
          .otherwise(array_join(transform(col("pw"), p => p("ws")), " "))
          .as("bpe_text"))
  }

  /** Feature-hashed bag-of-words embedding (the hashing trick): tokens
    * hash into `dim` buckets, the per-bucket counts ARE the vector. No
    * model, no vocabulary table — the canonical "text → fixed-width
    * vector" step that plugs documents straight into every embedding
    * operator in the library ([[graft.ops.Similarity.bruteTopK]] /
    * `ivfTopK` / `pqTopK`, [[graft.ops.Dedup.embeddingDups]]), and the
    * portable hash makes the whole downstream ANN stack oracle-checkable
    * on TEXT input.
    *
    * One narrow codegen'd projection; assembly is O(dim·tokens) per row
    * via a counting `filter` per bucket — right for small dims (the
    * hashing-trick sweet spot). A 10k-dim variant would explode tokens
    * and pivot through a (doc, bucket) aggregation instead.
    */
  def hashEmbed(
      df: DataFrame,
      dim: Int = 64,
      textCol: String = "text"): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    df.select(
      col("doc_id").as("vec_id"),
      ColumnOps.bind(
        transform(
          // coalesce: NULL text must embed like empty text (one count at
          // bucket h28("")) — a dim-length array of NULL floats would
          // violate LongDotProduct's non-null element contract and make
          // the native and fallback qdot paths diverge (NaN vs NULL sim)
          normTokens(coalesce(col(textCol), lit(""))),
          t => pmod(graft.functions.PortableHash.h28(t), lit(dim.toLong)))) {
        hs =>
          transform(sequence(lit(0L), lit(dim - 1L)),
            i => size(filter(hs, h => h === i)).cast("float"))
      }.as("embedding"))
  }

  /** Top collocations by pointwise mutual information — which word
    * pairs co-occur far beyond chance ("hong kong", "machine learning").
    * The corpus-linguistics tool for finding multi-word units worth
    * treating as single tokens.
    *
    *   pmi = ln( (c_ab · N_uni²) / (N_bi · c_a · c_b) )
    *
    * quantized to milli-units per surviving bigram. All counts are exact
    * longs; the one double expression is written in the same operation
    * order in the DuckDB oracle. `minCount` kills the hapax noise PMI
    * is notorious for (a pair seen twice in a 100 TB crawl is not a
    * collocation — it's a typo).
    *
    * Plan: two counting shuffles (bigrams, unigrams) + two joins of the
    * `minCount`-pruned bigram table against the vocab-sized unigram
    * table, then a TakeOrderedAndProject for the top-k — nothing is
    * ever corpus-sized after the first aggregation.
    */
  def collocations(
      df: DataFrame,
      minCount: Long = 5L,
      k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val toks = normTokens(col(textCol))
    val pairs = df.select(explode(ColumnOps.bind(toks) { tk =>
        when(size(tk) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(tk) - 1),
            i => struct(
              element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"))))
      }).as("p"))
      .select(col("p.w1"), col("p.w2"))
    // n_bi folds out of the UNFILTERED bigram counts — recounting the
    // corpus-sized pair explode for one scalar would be a second pass
    val biAll = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val bi = biAll.filter(col("c_ab") >= minCount)
    val uni = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // both sides are 1-row aggregates: hint the broadcast explicitly for
    // plan determinism (every sibling stats crossJoin in this file hints
    // it; AQE would usually rescue an unhinted one, but only at runtime)
    val tot = biAll.agg(sum("c_ab").as("n_bi"))
      .crossJoin(broadcast(uni.agg(sum("c").as("n_uni"))))
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log(
          col("c_ab").cast("double") * col("n_uni") * col("n_uni")
            / (col("n_bi").cast("double") * col("c_a") * col("c_b"))) * 1000)
          .cast("long").as("pmi_milli"))
      .orderBy(col("pmi_milli").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Token frequency-of-frequencies spectrum — the Zipf health check: for
    * each occurrence count `freq`, how many distinct n-grams occur exactly
    * that often. A natural corpus slopes smoothly; template/boilerplate
    * contamination shows up as spikes at high `freq`.
    *
    * Output stays unbucketed because it is SELF-bounding: the number of
    * distinct frequencies is O(√total-tokens) (frequencies 1..k need
    * k(k+1)/2 tokens), so even a 100 TB corpus yields only ~millions of
    * rows. Two hash aggregations, both map-side combined; the gram
    * shuffle carries (gram, partial count) only.
    */
  def freqSpectrum(df: DataFrame, n: Int = 1, textCol: String = "text"): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("freq"))
      .groupBy("freq")
      .agg(count(lit(1)).as("n_grams"))

  /** Markup stripping — the boilerplate-removal pass for web-crawl text:
    * drop HTML/XML tags, decode the common entities, collapse the
    * whitespace the removals leave behind. One narrow codegen'd
    * projection (RE2-safe patterns, so any engine replays it); reports
    * the tag count so a quality filter can drop markup-dominated docs.
    */
  def stripMarkup(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tagPat = "<[^>]*>"
    val noTags = regexp_replace(col(textCol), tagPat, " ")
    // &amp; decodes LAST so "&amp;lt;" yields the literal "&lt;", not "<"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(tagPat), lit(0)))
        .cast("long").as("n_tags"),
      trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
  }

  /** Per-document n-gram repetition statistics — the Gopher-style quality
    * signal (Rae et al. 2021 §A1.1: "fraction of duplicate n-grams" /
    * "fraction in most common n-gram") that catches boilerplate and
    * degenerate repeated text exact-dedup misses.
    *
    *   - `dup_fraction`: 1 − distinct/total n-grams (0 = no repetition).
    *   - `top_share`: occurrences of the most frequent n-gram / total.
    *
    * Two-level hash aggregation — (doc_id, gram) then doc_id — so the
    * map-side partial combine absorbs per-doc repetition BEFORE the
    * shuffle: shuffled bytes are O(distinct grams), not O(tokens), and
    * both keys are fine-grained (no skew: a hot document is still one
    * doc_id, bounded by document length, not corpus size).
    */
  /** Character-distribution Shannon entropy per document, in milli-bits
    * — the classic gibberish/boilerplate detector: natural prose sits
    * near 4 bits/char, base64 blobs and `aaaa…` runs far off it. Whole
    * computation is ONE narrow codegen'd projection (no explode/shuffle).
    *
    * Under a graft session the native one-pass
    * [[graft.plans.CharEntropyPacked]] does the work (single UTF-8 byte
    * scan); the Column fallback is bit-compatible — its distinct list is
    * SORTED before the fold so both paths and the oracle accumulate the
    * float sum in the same (code-point) order. Packed transport:
    * `(n_uniq << 20) | entropy_milli`, unpacked here.
    */
  def charEntropy(df: DataFrame, textCol: String = "text"): DataFrame = {
    val packedInner: Column =
      if (graft.plans.GraftExtensions.available(df.sparkSession))
        call_function("graft_char_entropy", col(textCol))
      else
        ColumnOps.bind(split(col(textCol), "")) { chars =>
          ColumnOps.bind(array_sort(array_distinct(chars))) { uniq =>
            shiftleft(size(uniq).cast("long"), 20).bitwiseOR(
              round(aggregate(uniq, lit(0.0d), (acc, c) =>
                acc - ColumnOps.bind(
                  size(filter(chars, x => x === c)).cast("double") /
                    size(chars).cast("double")) { p => p * log2(p) })
                * 1000d, 0).cast("long"))
          }
        }
    // Empty text is pinned to packed 0 (no distinct chars, zero entropy)
    // OUTSIDE the dispatch: Spark's split('', '') yields [""] (one bogus
    // element) while the native scan and DuckDB's string_split see zero
    // — without the guard the three paths would disagree.
    val packed = when(length(col(textCol)) === 0, lit(0L)).otherwise(packedInner)
    df.select(col("doc_id"), length(col(textCol)).cast("long").as("len"),
      ColumnOps.bind(packed) { pk =>
        struct(
          shiftright(pk, 20).as("n_uniq"),
          pk.bitwiseAND(lit((1L << 20) - 1L)).as("entropy_milli"))
      }.as("m"))
      .select(col("doc_id"), col("len"),
        col("m.n_uniq").as("n_uniq"), col("m.entropy_milli").as("entropy_milli"))
  }

  def repetition(df: DataFrame, n: Int = 2, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("top_count"))
      .select(
        col("doc_id"), col("n_grams"), col("n_distinct"), col("top_count"),
        round(lit(1.0) - col("n_distinct") / col("n_grams"), 6).as("dup_fraction"),
        round(col("top_count") / col("n_grams"), 6).as("top_share"))

  /** BM25 ranking of documents against a bag of query terms (k1/b are the
    * textbook Robertson defaults) — the lexical-retrieval scorer for
    * "find the docs most about X" over a pretraining corpus.
    *
    * Scores are summed in QUANTIZED micro-units (`round(s·1e6)` per
    * (doc, term), then an exact long sum) so the total is independent of
    * float addition order — reproducible across partitionings and
    * engines (see PortableHash for the same determinism argument).
    *
    * Plan shape (the part that matters at 100 TB): term frequencies are
    * NARROW array ops — `size(filter(toks, _ == t))` per term over one
    * let-bound token array behind a Generate barrier — so there is no
    * explode, no posting shuffle, and no join. Corpus N/avgdl AND all
    * per-term document frequencies fold into ONE single-row aggregate
    * that cross-joins back as a broadcast; the final top-k is
    * TakeOrderedAndProject. Two passes over the text column total (the
    * stats row, then scoring) — the corpus-global constants make a
    * second pass inherent. Pivoting tf into columns bounds `terms` to
    * "a query", tens of terms, not thousands.
    */
  def bm25(
      df: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // normalize terms AND tokenize with the shared normalized tokenizer
    // (normTokens): the dense leg of hybrid retrieval lowercases via
    // hashEmbed, and an unnormalized lexical leg would silently score 0
    // for every mixed-case term, degrading "hybrid" to dense-only
    val normed = terms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
    val perDoc = df.select(
        col("doc_id"),
        explode(array(ColumnOps.bind(normTokens(col(textCol))) { toks =>
          struct(size(toks).cast("long").as("dl") +:
            normed.zipWithIndex.map { case (t, i) =>
              size(filter(toks, x => x === t)).cast("double").as(s"tf$i")
            }: _*)
        })).as("m"))
      .select(col("doc_id") +: col("m.dl").as("dl") +:
        terms.indices.map(i => col(s"m.tf$i").as(s"tf$i")): _*)
    val stats = perDoc.agg(
      sum("dl").as("sum_dl"),
      count(lit(1)).as("n_docs") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    val avgdl = col("sum_dl") / col("n_docs")
    val total = terms.indices.map { i =>
      val tf = col(s"tf$i")
      val dfq = col(s"df$i")
      val idf = log(lit(1.0) + (col("n_docs") - dfq + 0.5) / (dfq + 0.5))
      val s = idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
      when(tf > 0, round(s * 1e6, 0).cast("long")).otherwise(0L)
    }.reduce(_ + _)
    perDoc
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), total.as("bm25_micro"))
      .orderBy(desc("bm25_micro"), asc("doc_id"))
      .limit(k)
  }
}
