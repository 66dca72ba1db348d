package graft.ops

import graft.functions.ColumnOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, over
  * `documents(doc_id, text, ...)` (FIXTURES.md §B).
  *
  * Five tiers, cheapest first — the standard corpus-dedup ladder:
  *
  *   1. [[exact]] — hash-groupBy on normalized content. One shuffle on a
  *      content hash (NOT the full text: at 100 TB shuffling raw documents
  *      as keys would move the whole corpus; a 128-bit digest moves ~nothing
  *      and collisions are negligible).
  *   2. [[minHashLsh]] — MinHash signatures over word shingles + banded LSH
  *      self-join for near-duplicate *candidates*, verified with exact
  *      Jaccard. The self-join is on short (band, bucket) keys; candidate
  *      volume, not corpus², drives cost.
  *   3. [[simHash]] — 64-bit SimHash fingerprints; near-dups have small
  *      Hamming distance. Cheapest signal per byte: one long per document.
  *   4. [[ngramJaccardPairs]] — exact n-gram Jaccard on a candidate pair
  *      set (use after 2/3 at scale; standalone only for small blocks).
  *   5. [[embeddingDups]] — semantic near-dups via quantized cosine over a
  *      blocking key (label/cluster), catching paraphrases the lexical
  *      tiers miss.
  *
  * All operators are built-ins end to end (`xxhash64`, higher-order array
  * functions, hash aggregates) — codegen'd, no UDFs, deterministic across
  * runs and cluster sizes.
  */
object Dedup {

  /** Whitespace-collapsed lowercased text — the pre-split form of
    * [[graft.ops.TextAnalysis.normTokens]]. DELIBERATELY not trimmed:
    * every persisted fingerprint (content keys, MinHash/SimHash
    * signatures) and every DuckDB oracle replays this exact expression,
    * so adding trim() would invalidate all of them at once. Callers with
    * edge-whitespace-dirty corpora should strip leading/trailing
    * whitespace upstream (a leading/trailing blank shifts shingles and
    * produces a distinct content key).
    */
  private def normText(textCol: Column): Column =
    lower(regexp_replace(textCol, "\\s+", " "))

  /** The content digest every exact-dedup operator keys on (md5 of
    * whitespace-normalized lowercased text) — shared so the batch and
    * streaming incremental paths can never diverge on what "identical
    * content" means.
    */
  def contentKey(textCol: Column): Column = md5(normText(textCol))

  /** Exact dedup: keep the lowest-id representative per identical
    * (normalized) text. Aggregation key is the md5 digest, so the shuffle
    * carries (digest, id) pairs only; the text itself stays columnar in
    * place and is re-read only for the survivors.
    */
  def exact(docs: DataFrame): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      contentKey(col("text")).as("content_key"))
    keyed
      .groupBy("content_key")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
  }

  /** Duplication profile: the cluster-size histogram of exact-duplicate
    * groups — the "how duplicated is this corpus" QC number read before
    * choosing a dedup strategy (a corpus that is 40% size-2 clusters
    * wants exact dedup; a long tail of size-1000 clusters wants URL/
    * boilerplate triage first). Output per distinct cluster size:
    * `(group_size, n_groups, n_docs)`; `n_docs` sums back to the corpus
    * and `n_docs - n_groups` over sizes ≥ 2 is the removable-row count.
    * Two digest-keyed aggregations — text never shuffles.
    */
  def dupSizeHistogram(docs: DataFrame): DataFrame =
    docs.select(contentKey(col("text")).as("content_key"))
      .groupBy("content_key")
      .agg(count(lit(1)).as("group_size"))
      .groupBy("group_size")
      .agg(count(lit(1)).as("n_groups"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_docs"))

  /** Apply exact dedup to the corpus: the surviving rows themselves (one
    * representative per identical normalized text, lowest doc_id wins) —
    * the operation a pipeline actually runs, with [[exact]] as its group
    * report. Implemented as min-id-per-digest joined back as a semi-join
    * filter: the shuffle carries (digest, id), never the documents.
    */
  def dropExactDuplicates(docs: DataFrame): DataFrame = {
    val keep = exact(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Incremental exact dedup: filter a NEW batch of documents against an
    * existing fingerprint index (a `content_key` md5 column from previous
    * snapshots), then dedup within the batch itself (lowest id wins).
    * This is how dedup actually runs at 100 TB — each crawl snapshot
    * anti-joins the accumulated index instead of re-deduping the whole
    * corpus; append the survivors' keys to the index afterwards.
    *
    * Both joins key on the digest, so the shuffles carry (digest, id)
    * pairs — never document text; the index side is a one-column scan.
    */
  def dedupIncremental(newDocs: DataFrame, index: DataFrame): DataFrame = {
    val keyed = newDocs.select(
      col("doc_id"), contentKey(col("text")).as("content_key"))
    // <=> anti-join: a NULL digest (NULL-text doc) in the index must
    // still match a NULL-digest newcomer — the equi-join's NULL = NULL
    // would let one null-text doc through EVERY snapshot, diverging from
    // the batch twin whose groupBy treats NULL keys as one group
    val novel = keyed.join(
      index.select(col("content_key").as("__idx_key")),
      col("content_key") <=> col("__idx_key"), "left_anti")
    val keep = novel
      .groupBy("content_key")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    newDocs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Apply near-dedup: drop every doc that MinHash-LSH pairs (at ≥
    * `threshold` verified Jaccard) with a lower-id doc. The pair graph's
    * "keep lowest endpoint" rule is the standard greedy approximation of
    * connected-component dedup — one candidate-pair pass, no iterative
    * driver loop; exact CC (e.g. label propagation to a fixpoint) can be
    * layered on the same pair output when chains matter.
    */
  def dropNearDuplicates(docs: DataFrame, threshold: Double = 0.6): DataFrame =
    dropNearDuplicatesFrom(docs, minHashLsh(docs, threshold))

  /** [[dropNearDuplicates]] on the portable hash family
    * ([[minHashLshPortable]]) — the oracle-replayable twin of the APPLY
    * operator: the survivors themselves, not just the pair report.
    */
  def dropNearDuplicatesPortable(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    dropNearDuplicatesFrom(docs, minHashLshPortable(docs, threshold))

  /** The shared survivor rule: drop every doc that pairs with a lower-id
    * doc — ONE definition so the xxhash64 and portable twins can never
    * diverge (the simHashDupsFrom pattern).
    */
  private def dropNearDuplicatesFrom(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("b_id").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** C4-style LINE-level dedup: each distinct line survives only at its
    * first occurrence corpus-wide (lowest doc_id, then line position) —
    * the rule that strips boilerplate headers/footers/navigation repeated
    * across pages. Documents are reassembled from their surviving lines
    * in original order; documents whose every line was seen earlier
    * disappear (C4's behavior).
    *
    * Scale shape, two keyed exchanges — neither carries text through the
    * dedup decision: (1) lines rank by `row_number` over md5(line) — the
    * shuffle moves (16-byte digest, doc_id, line_no); (2) winning
    * (doc_id, line_no) pairs semi-join back to the exploded lines and
    * reassemble with an ordered collect per doc. The per-doc collect is
    * bounded by document size, not corpus size.
    *
    * Blank (whitespace-only) lines are EXEMPT from the dedup decision and
    * kept unconditionally: they are paragraph structure, not boilerplate
    * content, and collapsing every empty line corpus-wide to its first
    * occurrence would strip separators from every other document (C4
    * itself only dedups lines with real content).
    *
    * `minWords` widens that exemption to C4's actual rule — C4 dedups
    * only "three-sentence spans" of real content: a line with fewer than
    * `minWords` whitespace-separated words ("Home", "1.", a date) is
    * structure/navigation, not quotable content, and deduping it
    * corpus-wide would delete legitimate short lines from every document
    * but one. Exemption is content-determined, so identical lines are
    * either all deduped or all kept — the decision stays deterministic.
    * Default 0 preserves the blank-only exemption.
    */
  def dedupLines(
      docs: DataFrame,
      delimiter: String = "\n",
      minWords: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(
      col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(delimiter)))
        .as(Seq("line_no", "line")))
    def exempt(line: Column): Column =
      if (minWords <= 0) trim(line) === ""
      else trim(line) === "" || size(split(trim(line), "\\s+")) < minWords
    val winners = lines
      .filter(!exempt(col("line")))
      .select(col("doc_id"), col("line_no"), md5(col("line")).as("_lk"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("_lk").orderBy("doc_id", "line_no")))
      .filter(col("_rk") === 1)
      .select("doc_id", "line_no")
    lines.join(winners, Seq("doc_id", "line_no"), "left_semi")
      .unionByName(lines.filter(exempt(col("line"))))
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line")),
          delimiter).as("text"),
        count(lit(1)).as("n_lines"))
  }

  /** Word shingles (n-gram windows joined back to strings). The token
    * array is let-bound ([[ColumnOps.bind]]) so the regex tokenization runs
    * once per row, not once per reference.
    */
  def shingles(textCol: Column, n: Int = 3): Column =
    ColumnOps.bind(split(normText(textCol), " ")) { toks =>
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(
          transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => array_join(slice(toks, i, lit(n)), " ")))
    }

  /** MinHash signature: `numHashes` simulated permutations; component i =
    * min hash over the shingle set.
    *
    * Fast path (graft extensions installed): shingles are string-hashed
    * ONCE, then the native [[graft.plans.MinHashSig]] applies k wrapping
    * universal-hash mixes per shingle — k× less string hashing. Fallback:
    * per-seed `xxhash64` over the shingle strings. Different (equally
    * valid) hash families — use one consistently within a corpus.
    *
    * The two-arg form always uses the fallback family: it resolves in ANY
    * session, so the produced fingerprints never depend on which session
    * analyzes the plan. Pass `native` explicitly (keyed on the DataFrame's
    * own session) to opt into the native family.
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    minHashSignature(shinglesCol, numHashes, native = false)

  def minHashSignature(shinglesCol: Column, numHashes: Int, native: Boolean): Column = {
    if (native)
      call_function("graft_minhash",
        transform(shinglesCol, s => xxhash64(s)), lit(numHashes))
    else
      transform(
        sequence(lit(0), lit(numHashes - 1)),
        h => array_min(transform(shinglesCol, s => xxhash64(s, h))))
  }

  /** MinHash + banded LSH near-dup pairs with exact-Jaccard verification.
    *
    * Pipeline: per-doc signature (narrow) → explode `bands` band keys →
    * self-join on (band, bucket) → distinct candidate pairs → exact Jaccard
    * on shingle sets → filter ≥ `threshold`.
    *
    * With numHashes = bands × rowsPerBand, the usual S-curve applies; the
    * defaults (32 = 8×4) catch Jaccard ≳ 0.6 with high probability.
    * Skew note: a degenerate bucket (e.g. thousands of empty or boilerplate
    * docs) would quadratically blow up the self-join; `maxBucket` drops
    * (band, bucket) groups above that population before the join — the
    * standard LSH-dedup guard (oversized buckets are boilerplate, not
    * near-dup signal) — so one pathological key can never produce
    * O(bucket²) join rows. AQE skew splitting still smooths moderate skew.
    */
  def minHashLsh(
      docs: DataFrame,
      threshold: Double = 0.6,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      maxBucket: Int = 100000): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): trailing signature " +
        "components outside a full band would silently never join")
    val rowsPerBand = numHashes / bands
    // One let-bound expression chain per row — shingles evaluated once,
    // signature once, then the 8 band buckets sliced off it. Without the
    // binding, CollapseProject inlines shingles into all 32 seed lambdas
    // and the signature into all 8 band lambdas: 256× the work (measured
    // 123 s vs ~2 s on sf0.1).
    val native =
      graft.plans.GraftExtensions.availableOrWarn(docs.sparkSession, "minHashLsh")
    val bandBuckets = ColumnOps.bind(shingles(col("text"), shingleSize)) { sh =>
      ColumnOps.bind(minHashSignature(sh, numHashes, native)) { sig =>
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))
      }
    }
    // Band join carries ONLY (band, bucket, doc_id): shuffling the shingle
    // arrays themselves would move ~the whole corpus 2 × bands times. The
    // (typically few) candidate pairs re-join their shingles afterwards.
    val banded = docs.select(col("doc_id"), posexplode(bandBuckets))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
    jaccardVerify(docs, bandedCandidates(banded, maxBucket), threshold, shingleSize)
  }

  /** Drop key groups whose population exceeds `cap` — skew insurance for
    * LSH-style self-joins, where one degenerate bucket of n members costs
    * O(n²) join rows.
    *
    * Shape: a windowed per-key count + filter — ONE pass over the input,
    * one shuffle of the (short-key) banded rows. The alternative (sizing
    * aggregate + anti-join) consumes its input twice, which forced every
    * caller to pre-checkpoint the banding pipeline and then release that
    * checkpoint once the capped result materialized — an extra job, extra
    * pinned blocks, and a measured slowdown from the release traffic.
    * (Under AQE the checkpoint's LogicalRDD reports UnknownPartitioning,
    * so the downstream self-join still re-exchanges the capped rows —
    * narrow (id, band, bucket) tuples, the cheap part of the pipeline.)
    *
    * Skew note: a degenerate key's rows land in one window task, but the
    * task only counts and filters (WindowExec's buffer spills past memory),
    * and those are exactly the rows the filter then drops — bounded, not
    * quadratic.
    */
  private[ops] def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    require(cap > 0, s"maxBucket must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    banded
      .withColumn("_bucket_n",
        count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("_bucket_n") <= cap)
      .drop("_bucket_n")
  }

  /** Distinct (a_id, b_id) pairs sharing at least one (band, bucket) key
    * with bucket population ≤ `maxBucket` (see [[capBuckets]]).
    */
  private def bandedCandidates(banded: DataFrame, maxBucket: Int): DataFrame = {
    // Materialize before the self-join: the renamed side defeats static
    // exchange reuse, and without the checkpoint the tokenize→sign→band
    // pipeline — the dominant cost of MinHash dedup — would run once per
    // side. capBuckets is a single windowed pass, so this is the ONLY
    // checkpoint (narrow (id, band, bucket) rows, clustered by join key).
    val capped = capBuckets(banded, Seq("band", "bucket"), maxBucket)
      .localCheckpoint()
    capped
      .join(capped.withColumnRenamed("doc_id", "b_id"), Seq("band", "bucket"))
      .filter(col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Exact-Jaccard verification of a candidate pair set at `threshold`.
    * Only documents the candidate set references are (re-)shingled: at
    * scale candidates are a vanishing fraction of the corpus, so the
    * semi-join prunes the second tokenization pass from O(corpus) to
    * O(candidate docs) — and, crucially, keeps the verify join's shuffle
    * from carrying every document's shingle array. The candidate pairs
    * are localCheckpoint'd first: the id set and the verify join both
    * consume them, and without the materialization the whole banded
    * candidate-generation pipeline would execute twice (pairs are tiny —
    * the one thing in this pipeline that is ALWAYS cheap to hold).
    */
  private[ops] def jaccardVerify(
      docs: DataFrame,
      candidates0: DataFrame,
      threshold: Double,
      shingleSize: Int): DataFrame = {
    val candidates = candidates0.localCheckpoint()
    // The candidate-generation pipeline behind `candidates0` may itself be
    // rooted at a checkpoint (bandedCandidates' capped bands, the
    // incremental path's combined band table). Once `candidates` has
    // eagerly materialized, those upstream blocks are unreachable from the
    // returned plan — free them now (no-op when candidates0 is plain).
    releaseCheckpoint(candidates0)
    val ids = candidates.select(col("a_id").as("doc_id"))
      .union(candidates.select(col("b_id").as("doc_id"))).distinct()
    val sh = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text"), shingleSize).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jaccard", round(jaccard(col("a_sh"), col("b_sh")), 6))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** [[minHashLsh]] on the engine-portable hash family
    * ([[graft.functions.PortableHash]]): md5-prefix base hash per shingle
    * (hashed ONCE), `numHashes` cheap universal-hash mixes, band buckets as
    * the joined signature-slice STRING (no second hash — a few bytes more
    * per key buys DuckDB replayability). Same banding/verify pipeline and
    * scale shape as the xxhash64 path; use that one when an external oracle
    * isn't needed — this family exists so the driver can hash-match the
    * full candidate-generation + verification pipeline, not just count rows.
    */
  def minHashLshPortable(
      docs: DataFrame,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      maxBucket: Int = 100000): DataFrame =
    jaccardVerify(docs,
      bandedCandidates(
        minHashBandsPortable(docs, numHashes, bands, shingleSize), maxBucket),
      threshold, shingleSize)

  /** The portable banded signatures `(doc_id, band, bucket)` — the
    * PERSISTED index form of portable MinHash LSH: store this table for
    * a corpus snapshot and incremental runs join new documents' bands
    * against it instead of re-signing the corpus
    * ([[dropNearDuplicatesIncrementalPortable]]).
    */
  def minHashBandsPortable(
      docs: DataFrame,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3): DataFrame =
    minHashBandsPortable(docs, numHashes, bands, shingleSize,
      graft.plans.GraftExtensions.available(docs.sparkSession))

  /** Explicit-dispatch form (the spec pins native ≡ HOF with it). */
  private[graft] def minHashBandsPortable(
      docs: DataFrame,
      numHashes: Int,
      bands: Int,
      shingleSize: Int,
      native: Boolean): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): trailing signature " +
        "components outside a full band would silently never join")
    import graft.functions.PortableHash._
    val rowsPerBand = numHashes / bands
    // native fast path (the graft_maxsim pattern): one codegen'd
    // MessageDigest + k-mix loop per document replaces the interpreted
    // transform→array_min→array_join chain — IDENTICAL buckets
    // (MinHashBucketsPortableSpec pins native ≡ HOF bit-for-bit), so
    // the portable family's oracle replay is unchanged; vanilla
    // sessions keep the HOF form
    val bandBuckets =
      if (native)
        call_function("graft_minhash_buckets",
          shingles(col("text"), shingleSize), lit(numHashes), lit(bands))
      else ColumnOps.bind(shingles(col("text"), shingleSize)) { sh =>
        ColumnOps.bind(transform(sh, s => h28(s))) { hs =>
          ColumnOps.bind(
            transform(
              sequence(lit(0), lit(numHashes - 1)),
              i => array_min(transform(hs, p => mix(p, i))))) { sig =>
            transform(
              sequence(lit(0), lit(bands - 1)),
              b => array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ","))
          }
        }
      }
    docs.select(col("doc_id"), posexplode(bandBuckets))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  /** Verified incremental NEAR-dedup — the continuous-ingest production
    * shape: only `newDocs` are signed and banded; their buckets join the
    * (precomputable, persisted) corpus band index, collisions are
    * verified with exact Jaccard against the colliding corpus documents
    * only, and new documents with a verified near-duplicate in the
    * corpus are dropped. New-side doc ids must be STRICTLY GREATER than every corpus id (ids disjoint is not enough: the survivor rule keeps the lower id, and this path always drops the NEW member of a cross pair — with interleaved ids the batch twin could keep the new doc instead).
    *
    * Scale shape: per increment the cost is O(new) signing + a join
    * keyed on (band, bucket) + verification shingling of collision
    * participants — the corpus is never re-signed, never re-shingled
    * beyond verified candidates. Exact twin of what
    * [[minHashLshPortable]] + [[dropNearDuplicatesPortable]] would
    * decide given the full union, restricted to cross-side pairs.
    */
  def dropNearDuplicatesIncrementalPortable(
      newDocs: DataFrame,
      corpus: DataFrame,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      maxBucket: Int = 100000): DataFrame =
    incrementalNearDedupCore(newDocs, corpus,
      minHashBandsPortable(newDocs, numHashes, bands, shingleSize),
      minHashBandsPortable(corpus, numHashes, bands, shingleSize),
      threshold, shingleSize, maxBucket)

  /** The post-signing half of the incremental decision, shared with the
    * PERSISTED band layout ([[BandIndex.dedupAgainstBandIndex]], which
    * reads `corpusBands` back from disk instead of re-signing): the
    * shared code IS the equality argument between the two paths.
    */
  private[ops] def incrementalNearDedupCore(
      newDocs: DataFrame,
      corpus: DataFrame,
      newBands: DataFrame,
      corpusBands: DataFrame,
      threshold: Double,
      shingleSize: Int,
      maxBucket: Int): DataFrame = {
    // the bucket-frequency cap counts the COMBINED population, exactly as
    // the full-union batch pipeline would — capping each side separately
    // could keep a bucket that is over cap only jointly, making the
    // incremental decision diverge from the batch twin
    // one checkpoint AFTER the (single-pass, windowed) cap: both filtered
    // sides below consume it, and without the materialization both
    // signature pipelines would run once per side
    val bandsAll = capBuckets(
      newBands.withColumn("_new", lit(true))
        .unionByName(corpusBands.withColumn("_new", lit(false))),
      Seq("band", "bucket"), maxBucket)
      .localCheckpoint()
    val newB = bandsAll.filter(col("_new")).drop("_new")
    val oldB = bandsAll.filter(!col("_new")).drop("_new")
    val cand = newB
      .join(oldB.withColumnRenamed("doc_id", "a_id"), Seq("band", "bucket"))
      .select(col("a_id"), col("doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val verified =
      jaccardVerify(corpus.unionByName(newDocs), cand, threshold, shingleSize)
    newDocs.join(
      verified.select(col("b_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Exact Jaccard over the distinct-element view of two arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** 64-bit SimHash over word tokens, packed as two 32-bit halves
    * (`simhash_hi` = bits 0..31, `simhash_lo` = bits 32..63; one signed
    * long would overflow ANSI arithmetic). Hamming distance =
    * popcount(hi ⊕ hi') + popcount(lo ⊕ lo').
    *
    * Fast path: the native [[graft.plans.SimHash64]] expression — one
    * `xxhash64` per token, one pass with free bit shifts (registered via
    * the graft session extensions). Fallback (vanilla sessions): pure
    * Column formulation voting with 64 separately-SEEDED hashes per token,
    * because a variable bit shift is not expressible in the lambda API.
    * The two paths are different (equally valid) hash families — use one
    * consistently within a corpus.
    */
  def simHash(docs: DataFrame): DataFrame = {
    val native =
      graft.plans.GraftExtensions.availableOrWarn(docs.sparkSession, "simHash")
    val packed =
      if (native)
        ColumnOps.bind(
          call_function("graft_simhash",
            transform(split(normText(col("text")), " "), t => xxhash64(t)))) { s =>
          struct(
            element_at(s, 1).as("simhash_hi"),
            element_at(s, 2).as("simhash_lo"))
        }
      else {
        def bits(toks: Column, from: Int, until: Int) = transform(
          sequence(lit(from), lit(until)),
          b =>
            when(
              aggregate(
                toks,
                lit(0L),
                (acc, t) => acc + when(xxhash64(t, b) % 2 === 0, 1L).otherwise(-1L))
                >= 0,
              lit(1L)).otherwise(lit(0L)))
        def pack(bs: Column) = aggregate(bs, lit(0L), (acc, bit) => acc * 2 + bit)
        ColumnOps.bind(split(normText(col("text")), " ")) { toks =>
          struct(
            pack(bits(toks, 0, 31)).as("simhash_hi"),
            pack(bits(toks, 32, 63)).as("simhash_lo"))
        }
      }
    // explode(array(...)) = Generate barrier: both output columns extract
    // from ONE evaluation of the packed struct.
    docs.select(col("doc_id"), explode(array(packed)).as("q"))
      .select(col("doc_id"), col("q.simhash_hi"), col("q.simhash_lo"))
  }

  /** [[simHash]] on the engine-portable hash family: one md5-prefix base
    * hash per token, 64 cheap seeded mixes vote the bits. Slower than the
    * native path (md5 vs xxhash64) but exactly replayable in DuckDB —
    * the oracle twin for the fingerprint and its Hamming-join downstream.
    */
  def simHashPortable(docs: DataFrame): DataFrame = {
    import graft.functions.PortableHash._
    def bits(hs: Column, from: Int, until: Int) = transform(
      sequence(lit(from), lit(until)),
      b =>
        when(
          aggregate(
            hs,
            lit(0L),
            (acc, p) => acc + when(mix(p, b) % 2 === 0, 1L).otherwise(-1L))
            >= 0,
          lit(1L)).otherwise(lit(0L)))
    def pack(bs: Column) = aggregate(bs, lit(0L), (acc, bit) => acc * 2 + bit)
    val packed =
      ColumnOps.bind(transform(split(normText(col("text")), " "), t => h28(t))) { hs =>
        struct(
          pack(bits(hs, 0, 31)).as("simhash_hi"),
          pack(bits(hs, 32, 63)).as("simhash_lo"))
      }
    docs.select(col("doc_id"), explode(array(packed)).as("q"))
      .select(col("doc_id"), col("q.simhash_hi"), col("q.simhash_lo"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word n-grams with ANY benchmark document — the
    * standard eval-set leak check run before pretraining.
    *
    * Shape: both sides explode to (ngram, id) pairs and join on the ngram
    * VALUE (a short string; the shuffle never carries documents), then a
    * per-(corpus,benchmark) distinct-overlap count filters at the
    * threshold. The benchmark side is tiny in practice — Spark broadcasts
    * it — so the corpus side streams through without moving.
    */
  /** Shared gram projection + overlap scoring of the decontamination
    * twins — ONE definition so [[decontaminate]] and
    * [[decontaminateBloom]] (documented as bit-identical, sharing one
    * oracle) can never drift on the gram rule or the overlap threshold.
    */
  private def contaminationGrams(df: DataFrame, idAs: String, n: Int): DataFrame =
    df.select(
      col("doc_id").as(idAs),
      explode(array_distinct(shingles(col("text"), n))).as("gram"))

  private def contaminationReport(
      corpusGrams: DataFrame,
      benchGrams: DataFrame,
      minOverlap: Int): DataFrame =
    corpusGrams.join(benchGrams, "gram")
      .groupBy("doc_id", "bench_id")
      .agg(countDistinct("gram").as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_benchmarks_hit"),
        max("overlap").as("max_overlap"))

  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minOverlap: Int = 2): DataFrame =
    contaminationReport(
      contaminationGrams(corpus, "doc_id", n),
      contaminationGrams(benchmark, "bench_id", n),
      minOverlap)

  /** Contamination ATTRIBUTION: the per-(corpus doc, benchmark doc) pair
    * report an audit actually reads — [[decontaminate]] aggregates away
    * WHICH benchmark was hit, but a release review needs the pair, its
    * overlap size, and evidence. `evidence` carries the first `evidenceK`
    * shared grams in lexicographic order (a bounded, deterministic
    * sample, joined to one string so the report stays scalar-typed).
    *
    * Scale: identical join shape to [[decontaminate]] (benchmark side is
    * tiny; pair with [[decontaminateBloom]]'s prefilter when the corpus
    * gram exchange dominates); the evidence aggregation collects at most
    * the shared grams of true pairs — audit-sized, not corpus-sized.
    */
  def contaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minOverlap: Int = 2,
      evidenceK: Int = 3): DataFrame = {
    require(evidenceK >= 1, s"evidenceK must be >= 1, got $evidenceK")
    contaminationGrams(corpus, "doc_id", n)
      .join(contaminationGrams(benchmark, "bench_id", n), "gram")
      .groupBy("doc_id", "bench_id")
      .agg(
        countDistinct("gram").as("overlap"),
        concat_ws(" | ",
          slice(array_sort(collect_set(col("gram"))), 1, evidenceK))
          .as("evidence"))
      .filter(col("overlap") >= minOverlap)
  }

  /** [[decontaminate]] with a Bloom-filter prefilter — the 100 TB shape.
    *
    * Plain decontamination shuffles EVERY corpus n-gram into the join,
    * but almost none of them occur in the benchmark: at scale the shuffle
    * of (gram, doc_id) pairs for a 100 TB corpus dominates the job while
    * contributing ~nothing to the answer. Here the benchmark's gram set
    * is first folded into a Bloom filter (one tiny aggregate — the
    * benchmark side is MBs), which ships to every task as a plan literal;
    * corpus grams that can't be in the benchmark die inside the scan
    * stage, before any exchange. The surviving sliver (true matches +
    * `fpp` false positives) flows into the SAME exact join as
    * [[decontaminate]], so false positives are eliminated and the result
    * is bit-identical — the oracle for both is one SQL statement.
    *
    * This is the same BloomFilterAggregate / might_contain machinery
    * Spark's own AQE runtime-filter injection uses (exposed as
    * `graft_bloom_agg` / `graft_bloom_mc` by
    * [[graft.plans.GraftExtensions]]), applied where the optimizer can't
    * see it: the join key is generated by an explode. The filter is sized
    * from the benchmark's ACTUAL distinct-gram count (one cheap count
    * over the small side — sizing by guess either bloats a literal that
    * ships with every task or blows the false-positive rate), via
    * `m = -n·ln p / ln²2`; the aggregate enforces the session's
    * runtime-filter caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `maxNumBits`). In a session without the graft extensions this falls
    * back to plain [[decontaminate]] — same rows either way, just without
    * the scan-stage kill.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minOverlap: Int = 2,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    if (!graft.plans.GraftExtensions.available(corpus.sparkSession))
      return decontaminate(corpus, benchmark, n, minOverlap)

    val b = contaminationGrams(benchmark, "bench_id", n)

    val items = math.max(b.select(countDistinct("gram")).head().getLong(0), 1L)
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomBytes = b.select(
        call_function("graft_bloom_agg",
          xxhash64(col("gram")), lit(items), lit(numBits)))
      .head().getAs[Array[Byte]](0)

    val c = contaminationGrams(corpus, "doc_id", n)
    // Null bloom = empty benchmark: nothing can be contaminated.
    val prefiltered =
      if (bloomBytes == null) c.filter(lit(false))
      else c.filter(call_function("graft_bloom_mc",
        lit(bloomBytes), xxhash64(col("gram"))))
    contaminationReport(prefiltered, b, minOverlap)
  }

  /** Transitive duplicate groups from a near-dup pair list: smallest-label
    * propagation to a fixpoint (connected components). Chains a-b, b-c
    * collapse to one group even when (a, c) was never a candidate pair —
    * the exactness layer over [[dropNearDuplicates]]'s one-pass greedy rule.
    * [[keepBestInGroups]] turns the labeling into a quality-aware APPLY.
    *
    * Scale shape: each iteration is one shuffle keyed on doc_id (edges are
    * kept symmetric once, labels re-join them); iterations needed =
    * graph diameter, which for dup clusters is tiny (≤ ~5). Convergence is
    * checked with a cheap count of label changes; `localCheckpoint`
    * truncates the growing lineage so iteration N doesn't replay 1..N-1.
    */
  def duplicateGroups(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // Materialize the pair list ONCE: edges are re-joined every iteration,
    // and without the checkpoint each iteration would replay the entire
    // upstream candidate-generation pipeline (measured 13.5 s -> ~2 s on
    // the sf0.1 SimHash pair graph).
    val edges = pairs.select(col("a_id"), col("b_id"))
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint()
    // Seed with the FIRST propagation step folded into one aggregation:
    // label₀ = min(id, min neighbor). Identical to initializing label = id
    // and running an iteration, but costs a groupBy instead of a
    // join + checkpoint cycle — hash-min converges from any upper bound.
    var labels = edges.groupBy(col("a_id").as("id"))
      .agg(least(col("a_id"), min("b_id")).as("label"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b_id").withColumnRenamed("label", "b_label"), "b_id")
        .groupBy(col("a_id").as("id"))
        .agg(min("b_label").as("n_label"))
      // convergence rides the SAME job via Observation — a separate
      // join+count per iteration would double the per-iteration job count
      val obs = org.apache.spark.sql.Observation(s"cc-iter-$iter")
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("n_label"), col("label"))).as("label"),
          (coalesce(col("n_label"), col("label")) < col("label")).cast("long").as("chg"))
        .observe(obs, sum("chg").as("changed"))
        .select("id", "label")
        .localCheckpoint()
      changed = obs.get("changed").asInstanceOf[Long]
      // `next` is EAGERLY materialized by localCheckpoint, so the previous
      // iteration's checkpoint blocks are dead — release them now, or at
      // 100 TB pair graphs the leaked blocks evict useful cache.
      releaseCheckpoint(labels)
      labels = next
      iter += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"duplicateGroups stopped at maxIter=$maxIter with $changed labels " +
          "still changing: group ids are UNCONVERGED (clusters with diameter " +
          s"> $maxIter are split). Re-run with a larger maxIter.")
    // edges' checkpoint is unreachable from the returned plan (labels is
    // its own materialized checkpoint), so the caller's releaseCheckpoints
    // protocol can never free it — release here or the blocks leak for
    // the session lifetime
    releaseCheckpoint(edges)
    labels.withColumnRenamed("label", "group_id")
  }

  /** [[duplicateGroups]] by ALTERNATING STAR CONTRACTION (the
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the O(log n)-round scale
    * path. Label propagation shuffles the FULL label table once per
    * graph-diameter hop; star contraction instead rewrites the EDGE set,
    * which both converges in logarithmically many rounds on long chains
    * and SHRINKS as components collapse toward stars — at a 100 TB pair
    * graph the per-round shuffle gets cheaper as it proceeds.
    *
    *   - large-star: every node links its larger neighbors to the min of
    *     its closed neighborhood;
    *   - small-star: every node links its smaller neighbors (and itself)
    *     to that min.
    *
    * Fixpoint = the edge set is a stable star forest (child → component
    * min). Output contract is identical to [[duplicateGroups]]: one
    * `(id, group_id)` row per node appearing in `pairs`, `group_id` =
    * the component's smallest id ([[DedupSpec]] proves equality on
    * chain/clique/random graphs).
    */
  /** Quality-aware canonical selection over duplicate groups — the APPLY
    * rule production dedup wants instead of keep-lowest-id: within each
    * group, the member with the HIGHEST `quality` survives (ties → lowest
    * id); documents in no group pass through untouched. `scored` carries
    * `(doc_id, quality, …)`; `groups` is [[duplicateGroups]] /
    * [[duplicateGroupsContract]] output (`id, group_id`).
    *
    * Scale shape: the winner window runs over GROUP MEMBERS only —
    * dup-cluster-sized, a vanishing fraction of the corpus — and the
    * survivors come back via one `left_anti` on doc_id. The corpus itself
    * is never windowed.
    */
  def keepBestInGroups(scored: DataFrame, groups: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("group_id").orderBy(desc("quality"), asc("id"))
    val losers = groups
      .join(scored.select(col("doc_id").as("id"), col("quality")), Seq("id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("id").as("doc_id"))
    scored.join(losers, Seq("doc_id"), "left_anti")
  }

  def duplicateGroupsContract(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the RAW pair list first: `nodes` (consumed by the final
    // join, AFTER the loop) must not replay the entire upstream
    // candidate-generation pipeline a second time — at bench scale that
    // recompute cost more than the contraction rounds themselves
    val raw = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .localCheckpoint()
    val nodes = raw.select(col("src").as("id"))
      .union(raw.select(col("dst").as("id"))).distinct()
    var edges: DataFrame = null

    def largeStar(e: DataFrame): DataFrame = {
      val both = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = both.groupBy("src")
        .agg(least(min("dst"), col("src")).as("m"))
      // no distinct here: output multiplicity is bounded by |both| = 2|E|
      // (one row per directed edge), min() in smallStar is multiplicity-
      // blind, and smallStar's own distinct restores the set invariant the
      // xor signature needs — dropping it saves a shuffle per round
      both.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      val mins = oriented.groupBy("u").agg(min("v").as("m"))
      oriented.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins.select(col("u").as("src"), col("m").as("dst")))
        .distinct()
    }

    // convergence = stable (count, order-invariant xor-fold) signature —
    // edges are distinct, so the xor is a set fingerprint (and, unlike a
    // sum, cannot overflow under ANSI mode). The signature RIDES the
    // checkpoint's materialization job via Observation (the
    // duplicateGroups trick): no separate aggregate job per round.
    val sigCols = Seq(
      count(lit(1)).as("cnt"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("sig"))
    def observedCheckpoint(e: DataFrame, name: String): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation(name)
      val out = e.observe(obs, sigCols.head, sigCols.tail: _*).localCheckpoint()
      (out, (obs.get("cnt").asInstanceOf[Long], obs.get("sig").asInstanceOf[Long]))
    }

    val (edges0, sig0) = observedCheckpoint(
      raw.filter(col("src") =!= col("dst")).distinct(), "cc-sig-init")
    edges = edges0
    var sig = sig0
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val (next, nextSig) =
        observedCheckpoint(smallStar(largeStar(edges)), s"cc-sig-$iter")
      releaseCheckpoint(edges)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"duplicateGroupsContract stopped at maxIter=$maxIter without a " +
          "stable star forest: group ids may be UNCONVERGED.")
    // groupBy(min) preserves the one-row-per-node contract even when the
    // loop hit maxIter with a node still holding several outgoing edges
    // (converged runs have exactly one, so the aggregate is a no-op)
    nodes.join(edges.withColumnRenamed("src", "id"), Seq("id"), "left")
      .groupBy("id")
      .agg(min(coalesce(col("dst"), col("id"))).as("group_id"))
  }

  /** Unpersist the checkpointed RDDs backing a `localCheckpoint()`ed
    * DataFrame (the `LogicalRDD` leaves hold them). No-op on plans
    * without checkpoints. PUBLIC because several operators return
    * checkpoint-backed results ([[minHashLsh]]'s verified pairs,
    * [[duplicateGroups]]' labels, [[Similarity.trainCentroids]]) whose
    * blocks live until released — long-running sessions that construct
    * many such queries should call this once a result is consumed, or
    * the accumulated blocks evict useful cache.
    */
  def releaseCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  private def releaseCheckpoint(df: DataFrame): Unit = releaseCheckpoints(df)

  /** SimHash near-dup pairs: Hamming distance ≤ `maxHamming` over the
    * 64-bit fingerprint, found via banded blocking — the fingerprint is
    * split into `64 / bandBits` bands; by pigeonhole, any pair within
    * distance (bands - 1) shares at least one exact band, so the self-join
    * keys on (band, value) and only candidates pay the popcount check.
    * With 16-bit bands that guarantees distance ≤ 3; lower `bandBits` to
    * catch larger distances at higher candidate volume.
    *
    * The join carries three longs per row; the verify is two xor+popcounts
    * — this is the cheapest near-dup join per byte, ideal as a pre-filter
    * before [[minHashLsh]]'s exact-Jaccard verification at 100 TB.
    */
  def simHashDups(
      docs: DataFrame, maxHamming: Int = 3, bandBits: Int = 16,
      maxBucket: Int = 100000): DataFrame =
    simHashDupsFrom(simHash(docs), maxHamming, bandBits, maxBucket)

  /** [[simHashDups]] on portable fingerprints ([[simHashPortable]]) — the
    * DuckDB-replayable twin of the whole banded Hamming join.
    */
  def simHashDupsPortable(
      docs: DataFrame, maxHamming: Int = 3, bandBits: Int = 16,
      maxBucket: Int = 100000): DataFrame =
    simHashDupsFrom(simHashPortable(docs), maxHamming, bandBits, maxBucket)

  /** Banded Hamming self-join over a precomputed fingerprint table
    * `(doc_id, simhash_hi, simhash_lo)` — see [[simHashDups]] for the
    * pigeonhole recall argument.
    */
  def simHashDupsFrom(
      fp: DataFrame, maxHamming: Int = 3, bandBits: Int = 16,
      maxBucket: Int = 100000): DataFrame = {
    require(32 % bandBits == 0, "bandBits must divide 32")
    require(maxHamming <= 64 / bandBits - 1,
      s"pigeonhole guarantee: ${64 / bandBits} bands of $bandBits bits only " +
        s"guarantee recall for hamming <= ${64 / bandBits - 1}, got $maxHamming " +
        "(a qualifying pair could differ in one bit per band and share no key)")
    val perHalf = 32 / bandBits
    val mask = (1L << bandBits) - 1
    val bands = (0 until 2 * perHalf).map { i =>
      val half = if (i < perHalf) col("simhash_hi") else col("simhash_lo")
      val off = (i % perHalf) * bandBits
      struct(lit(i).as("band"), (shiftrightunsigned(half, off).bitwiseAND(mask)).as("bv"))
    }
    // capBuckets: identical-fingerprint floods (boilerplate) would make one
    // (band, value) key quadratic; dropping over-populated keys bounds the
    // join. NOTE this also caps recall for such floods — by design.
    // one checkpoint after the (single-pass, windowed) cap — reused by
    // both self-join sides (see bandedCandidates); one fingerprint pass
    // total
    val banded = capBuckets(
      fp.select(
        col("doc_id"), col("simhash_hi"), col("simhash_lo"),
        explode(array(bands: _*)).as("b"))
        .select(col("doc_id"), col("simhash_hi"), col("simhash_lo"),
          col("b.band"), col("b.bv")),
      Seq("band", "bv"), maxBucket)
      .localCheckpoint()
    val other = banded.select(
      col("band"), col("bv"), col("doc_id").as("b_id"),
      col("simhash_hi").as("b_hi"), col("simhash_lo").as("b_lo"))
    banded
      .join(other, Seq("band", "bv"))
      .filter(col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        (bit_count(col("simhash_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("simhash_lo").bitwiseXOR(col("b_lo")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
  }

  /** Exact n-gram Jaccard similarity for an explicit pair set — the
    * verification stage after candidate generation, or a standalone
    * all-pairs check within small blocks.
    *
    * Shape: inverted-index join, not array-vs-array. Exploding each doc's
    * distinct grams once and self-joining on the gram VALUE computes every
    * co-occurring pair's intersection size with a shuffle that carries
    * (gram, id) rows — the array-join alternative copies each doc's whole
    * shingle array into every candidate pair (O(pairs × doc_len) bytes
    * moved; measured 6 s vs 0.5 s on a 500-doc all-pairs block at sf0.1).
    * Pairs with empty intersection never meet in the gram join and come
    * back via the left join at jaccard = 0. Per-doc distinct-gram counts
    * (one tiny aggregate, broadcast) convert intersections to unions.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      pairs: DataFrame, // (a_id, b_id)
      n: Int = 3): DataFrame =
    ngramOverlapPairs(docs, pairs, n).select("a_id", "b_id", "jaccard")

  /** Asymmetric n-gram CONTAINMENT for an explicit pair set:
    * `containment_a` = |A∩B| / |A| (how much of A is inside B) and the
    * mirror `containment_b`. The near-dup signal symmetric Jaccard
    * misses: a short document quoted whole inside a much longer one has
    * tiny Jaccard (the union is dominated by the long doc) but
    * containment ≈ 1 on the short side — the decision rule for "drop the
    * contained copy" dedup tiers (Broder's resemblance/containment
    * distinction). Same inverted-index shape and NULL semantics as
    * [[ngramJaccardPairs]].
    */
  def ngramContainmentPairs(
      docs: DataFrame,
      pairs: DataFrame, // (a_id, b_id)
      n: Int = 3): DataFrame =
    ngramOverlapPairs(docs, pairs, n)
      .select("a_id", "b_id", "containment_a", "containment_b")

  /** All three overlap metrics — `jaccard`, `containment_a`,
    * `containment_b` — from ONE inverted-index pass. This is the entry
    * point for pipelines that want more than one metric:
    * [[ngramJaccardPairs]] and [[ngramContainmentPairs]] are thin
    * projections of it, so calling THEM separately builds the overlap
    * plan twice, while a single call here pays the gram join once and
    * Catalyst prunes whichever metric columns go unused.
    */
  def ngramOverlapPairs(
      docs: DataFrame,
      pairs: DataFrame, // (a_id, b_id)
      n: Int = 3): DataFrame = {
    def metric(d: Column): Column =
      when(col("a_n").isNull || col("b_n").isNull, lit(null).cast("double"))
        .otherwise(round(col("_ni").cast("double") / d, 6))
    pairGramOverlap(docs, pairs, n).select(
      col("a_id"),
      col("b_id"),
      metric((col("a_n") + col("b_n") - col("_ni")).cast("double")).as("jaccard"),
      metric(col("a_n").cast("double")).as("containment_a"),
      metric(col("b_n").cast("double")).as("containment_b"))
  }

  /** Shared overlap core of [[ngramJaccardPairs]] / [[ngramContainmentPairs]]:
    * per-pair `(a_n, b_n, _ni)` = distinct-gram counts and intersection
    * size, computed via the inverted-index join documented on
    * [[ngramJaccardPairs]].
    */
  private def pairGramOverlap(
      docs: DataFrame,
      pairs: DataFrame,
      n: Int): DataFrame = {
    // only docs the pair set references contribute gram rows
    val ids = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    val grams = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(array_distinct(shingles(col("text"), n))).as("g"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n_g"))
    val inter = grams.select(col("doc_id").as("a_id"), col("g"))
      .join(grams.select(col("doc_id").as("b_id"), col("g")), "g")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_inter"))
    // pairs referencing a doc absent from `docs` drop (inner-join parity
    // with the old shape); a null-text doc is PRESENT but contributes no
    // grams — its pairs surface with jaccard = null, again like the old
    // array expressions. The contract accepts pairs in ANY orientation
    // (and self-pairs): the inverted index only materializes lo < hi, so
    // intersections are looked up on (least, greatest) while the caller's
    // own (a_id, b_id) columns pass through untouched; a self-pair's
    // intersection is definitionally its own gram count.
    val present = docs.select(col("doc_id"))
    pairs
      .join(present.withColumnRenamed("doc_id", "a_id"), Seq("a_id"), "left_semi")
      .join(present.withColumnRenamed("doc_id", "b_id"), Seq("b_id"), "left_semi")
      .withColumn("_lo", least(col("a_id"), col("b_id")))
      .withColumn("_hi", greatest(col("a_id"), col("b_id")))
      .join(
        inter.select(col("a_id").as("_lo"), col("b_id").as("_hi"), col("n_inter")),
        Seq("_lo", "_hi"), "left")
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n_g", "a_n"), Seq("a_id"), "left")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n_g", "b_n"), Seq("b_id"), "left")
      .withColumn("_ni",
        when(col("a_id") === col("b_id"), col("a_n"))
          .otherwise(coalesce(col("n_inter"), lit(0L))))
  }

  /** Semantic near-dups: quantized cosine over pairs sharing a blocking
    * key (here `label`, standing in for a cluster id). Blocking bounds the
    * pair count; at scale the blocking key comes from coarse clustering or
    * LSH ([[Similarity.rhpSignature]]).
    *
    * BOUNDED-INPUT REQUIREMENT (ADVICE r15): the join below BROADCASTS
    * the entire b side — the right call for this function's actual
    * callers (bounded exact-truth slices passing one constant label,
    * where a label-hash shuffle join collapsed to a single partition),
    * but a corpus-scale input would hit the broadcast relation cap /
    * driver memory where a shuffle join worked. For large blocked
    * corpora use [[embeddingDupsByCell]] (cell-blocked, shuffle-join)
    * instead.
    */
  def embeddingDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val native = graft.plans.GraftExtensions.available(embeddings.sparkSession)
    // Checkpoint before the self-join: the renamed a/b projections defeat
    // static exchange reuse, so without it the scan→quantize→norm pipeline
    // executes once per side (the embeddingDupsByCell fix, measured 2.2→0.93 s).
    val q = embeddings.select(
      col("label"),
      col("vec_id"),
      Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.qdot(col("qv"), col("qv"), native))
      .localCheckpoint()
    val a = q.select(
      col("label"), col("vec_id").as("a_id"),
      col("qv").as("a_qv"), col("qn").as("a_qn"))
    val b = q.select(
      col("label"), col("vec_id").as("b_id"),
      col("qv").as("b_qv"), col("qn").as("b_qn"))
    // BROADCAST the b side and spread a by id: the callers pass a
    // single constant label (the bounded exact-truth slices), so a
    // shuffle join on `label` hash-partitions BOTH sides into ONE
    // partition and a single task scores the whole quadratic pair
    // volume — measured as the dominant stage of every q_embed_recall*
    // row (10.3 s single-task, StageProf). The b side is bounded by
    // this operator's own contract (didactic exact baseline over a
    // capped slice), so the broadcast is small. The repartition width
    // is EXPLICIT: with a bare repartition(col) AQE coalesces the
    // ~0.5 MB exchange back to one partition and the single-task stage
    // returns (measured).
    val width = embeddings.sparkSession.sparkContext.defaultParallelism
    a.repartition(width, col("a_id")).join(broadcast(b), Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim",
        Similarity.qcosinePre(
          Similarity.qdot(col("a_qv"), col("b_qv"), native), col("a_qn"), col("b_qn")))
      .filter(col("sim") >= threshold)
      .select("label", "a_id", "b_id", "sim")
  }

  /** SemDeDup-style APPLY: the embeddings that SURVIVE semantic pruning —
    * every vector pairing above `threshold` with a lower-id vector in its
    * IVF cell is dropped (same lowest-id-wins survivor rule as
    * [[dropNearDuplicates]], same anti-join shape, so the whole dedup
    * ladder — exact, lexical-near, semantic — applies identically).
    * Defaults to multi-probe blocking (`nProbe = 2`) — the measured
    * 402‰→915‰ pair-recall lever of [[embeddingDupsByCell]]; a semantic
    * dedup that silently misses 60% of true pairs is not a dedup.
    */
  def dropSemanticDuplicates(
      embeddings: DataFrame,
      threshold: Double,
      nCells: Int = 8,
      maxBucket: Int = 100000,
      targetPerCell: Long = 4096L,
      centroids: Option[DataFrame] = None,
      nProbe: Int = 2): DataFrame = {
    val losers = embeddingDupsByCell(
      embeddings, threshold, nCells, maxBucket, targetPerCell, centroids,
      nProbe)
      .select(col("b_id").as("vec_id")).distinct()
    embeddings.join(losers, Seq("vec_id"), "left_anti")
  }

  /** [[embeddingDups]] with the blocking key DERIVED from the embeddings
    * themselves — IVF coarse cells ([[Similarity.ivfAssign]]) — instead of
    * a pre-existing label column. This is the 100 TB shape: no corpus has
    * ready-made balanced blocks, but a coarse codebook (here the
    * deterministic lowest-id stand-in; in production a trained k-means)
    * always exists, and blocking on the cell bounds the pair join to
    * within-cell pairs. Single-assignment blocking can miss a pair
    * straddling a cell boundary — the standard recall/cost tradeoff,
    * MEASURED by `q_embed_recall` at 402‰ pair recall on the sf0.01
    * slice — so the DEFAULT is multi-probe `nProbe = 2` (each vector in
    * its top-2 cells, [[Similarity.ivfAssignProbe]]): boundary pairs
    * meet as soon as any probed cell is shared, lifting measured recall
    * to 915‰ at ≤ 2× the candidate volume (`q_embed_recall_probe2`).
    * Pass `nProbe = 1` to reproduce the single-assignment baseline.
    * `maxBucket` drops degenerate cells ([[capBuckets]]) so one hot cell
    * can never go quadratic.
    */
  def embeddingDupsByCell(
      embeddings: DataFrame,
      threshold: Double,
      nCells: Int = 8,
      maxBucket: Int = 100000,
      targetPerCell: Long = 4096L,
      centroids: Option[DataFrame] = None,
      nProbe: Int = 2): DataFrame = {
    // nCells = 0: derive the codebook size from the corpus count
    // (Similarity.cellsFor) — the sizing that keeps within-cell work
    // constant per cell as N grows (PLANS.md round-8 scale probe). One
    // count() pass, trivial next to the self-join it bounds.
    val cellCount =
      if (nCells == 0) Similarity.cellsFor(embeddings.count(), targetPerCell)
      else nCells
    val native = graft.plans.GraftExtensions.available(embeddings.sparkSession)
    // The AUTO path (corpus-proportional codebook) assigns through the
    // two-level hierarchical probe: flat assignment is O(N·k), and with
    // k ∝ N that term is quadratic in N — the one scale-killer the
    // round-10 band probe left on this surface
    // ([[Similarity.ivfAssignHierProbe]]; O(N·√k)). Explicit small
    // codebooks keep the exact flat argmax.
    val assigned =
      if (nCells == 0)
        Similarity.ivfAssignHierProbe(embeddings, cellCount, nProbe,
          centroids = centroids).drop("cell_sim", "probe_rank")
      else Similarity.ivfAssignProbe(embeddings, cellCount, nProbe, centroids)
    // Checkpoint before the self-join: the renamed a/b projections defeat
    // static exchange reuse, so without it the scan→assign→cap pipeline
    // executes once per side (see Similarity.knnGraph). A trained codebook
    // ([[Similarity.trainCentroids]]) slots in via `centroids` — the
    // q_sim_ivf → q_sim_ivf_trained ladder, applied to dedup blocking.
    val cells = capBuckets(assigned, Seq("cell_id"), maxBucket)
      .localCheckpoint()
    // The pair verify stays INLINE in the cell join (payloads stream
    // through the join stage; the only pair-keyed exchange below is
    // the post-filter groupBy over SURVIVORS — small rows). Two
    // restructures were A/B-measured and REJECTED here (r15-opt):
    // ids-only candidates + payload re-attach joins (probe-5 1.8→3.0s —
    // the attach exchanges cost more than the streamed duplication,
    // which never crosses a shuffle), and pair-dedup before verify
    // (probe-5 →5.4s — the threshold filter is the selective step and
    // must precede any candidate-volume shuffle).
    val a = cells.select(
      col("cell_id"), col("vec_id").as("a_id"),
      col("qv").as("a_qv"), col("qn").as("a_qn"))
    val b = cells.select(
      col("cell_id"), col("vec_id").as("b_id"),
      col("qv").as("b_qv"), col("qn").as("b_qn"))
    val scored = a.join(b, Seq("cell_id"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim",
        Similarity.qcosinePre(
          Similarity.qdot(col("a_qv"), col("b_qv"), native), col("a_qn"), col("b_qn")))
      .filter(col("sim") >= threshold)
      .select("cell_id", "a_id", "b_id", "sim")
    // multi-probe pairs can meet in more than one shared cell — dedup to
    // the lowest cell (sim is a pure function of the two vectors, so
    // max() just re-reads the identical value)
    if (nProbe == 1) scored
    else scored.groupBy("a_id", "b_id")
      .agg(min("cell_id").as("cell_id"), max("sim").as("sim"))
      .select("cell_id", "a_id", "b_id", "sim")
  }

  /** Semantic near-dup PAIRS via portable RHP-LSH bands — the SECOND,
    * independent blocking axis for the embedding family. IVF cells and
    * hyperplane bands fail differently: a pair straddling every probed
    * cell boundary can still collide in a sign-bit band, and vice versa
    * — the fuzzy-matching multi-axis ladder lesson
    * ([[FuzzyMatch]]'s blocks ∪ sorted-neighbor ∪ reversed ∪ q-gram),
    * applied to embeddings. Measured on the hard sf0.1 recall slice
    * (threshold 0.35): bands alone 738‰ at 814k candidates vs cell
    * probe-3's 723‰ at 988k; the UNION with cell probe-2
    * ([[embeddingDupsUnion]]) reaches 864‰ at 1.11M — past probe-4's
    * 855‰ at 1.36M. Candidates are verified with exact quantized cosine,
    * `capBuckets` bounds degenerate bands, and every stage (portable
    * hash family) replays in DuckDB.
    */
  def embeddingDupsByLshPortable(
      embeddings: DataFrame,
      threshold: Double,
      bands: Int = 8,
      bandBits: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    val native = graft.plans.GraftExtensions.available(embeddings.sparkSession)
    // checkpoint: the renamed a/b projections of the self-join below
    // defeat static exchange reuse (the embeddingDupsByCell lesson)
    val banded = Similarity
      .rhpBandedPortable(embeddings, bands, bandBits, maxBucket)
      .localCheckpoint()
    // VERIFY EARLY, DEDUP LAST (guide §8 / §2.3): the cross-band pair
    // dedup used to run BEFORE the cosine verify, so the dropDuplicates
    // exchange shuffled every candidate pair WITH both payload vectors —
    // measured 303 MB (3-task map stage) for a 10 MB corpus slice
    // (StageProf, q_embed_recall_union). Scoring inside the join stage
    // (payloads stream, never crossing a pair-keyed exchange) and
    // deduping the (a_id, b_id, sim) SURVIVORS moves the selective
    // filter in front of the shuffle; sim is a pure function of the
    // pair, so the multi-band re-verify returns the identical value and
    // the deduped rows are unchanged. Same pairs, same sims, same oracle.
    val a = banded.select(
      col("band"), col("bucket"), col("vec_id").as("a_id"),
      col("qv").as("a_qv"), col("qn").as("a_qn"))
    val b = banded.select(
      col("band"), col("bucket"), col("vec_id").as("b_id"),
      col("qv").as("b_qv"), col("qn").as("b_qn"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim",
        Similarity.qcosinePre(
          Similarity.qdot(col("a_qv"), col("b_qv"), native),
          col("a_qn"), col("b_qn")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
      .dropDuplicates("a_id", "b_id")
  }

  /** Union of the two semantic blocking axes — IVF cell probes
    * ([[embeddingDupsByCell]]) ∪ RHP bands
    * ([[embeddingDupsByLshPortable]]): each axis is one corpus-linear
    * pass, their candidate sets overlap but their MISSES don't (the
    * measured 485‰ ∪ 738‰ → 864‰ on the hard slice), so the union is
    * the recall-critical configuration. `sim` is a pure function of the
    * pair, identical from either arm — max() just re-reads it.
    */
  def embeddingDupsUnion(
      embeddings: DataFrame,
      threshold: Double,
      nCells: Int = 0,
      maxBucket: Int = 100000,
      targetPerCell: Long = 4096L,
      centroids: Option[DataFrame] = None,
      nProbe: Int = 2,
      bands: Int = 8,
      bandBits: Int = 4): DataFrame =
    embeddingDupsByCell(embeddings, threshold, nCells, maxBucket,
      targetPerCell, centroids, nProbe)
      .select("a_id", "b_id", "sim")
      .unionByName(embeddingDupsByLshPortable(
        embeddings, threshold, bands, bandBits, maxBucket))
      .groupBy("a_id", "b_id")
      .agg(max("sim").as("sim"))

  /** Incremental SEMANTIC dedup — the embedding twin of
    * [[dropNearDuplicatesIncrementalPortable]], the continuous-ingest
    * production shape for the SemDeDup family: only `newVecs` are
    * assigned per increment; their cells join the (precomputable,
    * persisted) corpus cell index, and new vectors with a cosine ≥
    * `threshold` against ANY corpus member sharing a probed cell are
    * dropped. New-side vec ids must be STRICTLY GREATER than every
    * corpus id (the cross-pair survivor is always the corpus side).
    *
    * The codebook is PINNED from the corpus ([[Similarity.seedCodebook]],
    * or a trained one via `centroids`) — under the id contract the
    * corpus seed EQUALS the union seed, so the decision is the exact
    * cross-side restriction of [[dropSemanticDuplicates]] on the full
    * union with the same codebook (spec'd). Cells are capped on the
    * COMBINED population, exactly as the batch twin would — capping each
    * side separately could keep a jointly-over-cap cell and diverge (the
    * minhash-incremental lesson). `nCells = 0` sizes the codebook from
    * the UNION count ([[Similarity.cellsFor]]) and assigns both sides
    * through the hierarchical O(N·√k) chain.
    *
    * Scale shape: per increment the assignment cost is O(new·√k); the
    * corpus index is precomputable and the candidate join is bounded by
    * shared capped cells — the corpus embeddings are never re-scored
    * against each other.
    */
  def dropSemanticDuplicatesIncremental(
      newVecs: DataFrame,
      corpus: DataFrame,
      threshold: Double,
      nCells: Int = 0,
      maxBucket: Int = 100000,
      targetPerCell: Long = 4096L,
      centroids: Option[DataFrame] = None,
      nProbe: Int = 2): DataFrame = {
    val native = graft.plans.GraftExtensions.available(newVecs.sparkSession)
    val cellCount =
      if (nCells == 0)
        Similarity.cellsFor(corpus.count() + newVecs.count(), targetPerCell)
      else nCells
    val codebook = centroids.getOrElse(Similarity.seedCodebook(corpus, cellCount))
    def assign(side: DataFrame): DataFrame =
      if (nCells == 0)
        Similarity.ivfAssignHierProbe(side, cellCount, nProbe,
          centroids = Some(codebook)).drop("cell_sim", "probe_rank")
      else Similarity.ivfAssignProbe(side, cellCount, nProbe, Some(codebook))
    // one checkpoint after the combined cap: both filtered sides below
    // consume it, and without the materialization both assignment
    // pipelines would run once per side
    val assigned = capBuckets(
      assign(newVecs).withColumn("_new", lit(true))
        .unionByName(assign(corpus).withColumn("_new", lit(false))),
      Seq("cell_id"), maxBucket)
      .localCheckpoint()
    val newB = assigned.filter(col("_new"))
      .select(col("cell_id"), col("vec_id"), col("qv"), col("qn"))
    val oldB = assigned.filter(!col("_new"))
      .select(col("cell_id"), col("qv").as("b_qv"), col("qn").as("b_qn"))
    val losers = newB.join(oldB, Seq("cell_id"))
      .filter(
        Similarity.qcosinePre(
          Similarity.qdot(col("qv"), col("b_qv"), native),
          col("qn"), col("b_qn")) >= threshold)
      .select("vec_id").distinct()
    newVecs.join(losers, Seq("vec_id"), "left_anti")
  }
}
