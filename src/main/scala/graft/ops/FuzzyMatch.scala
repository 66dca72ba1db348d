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
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.plans.GraftExtensions.ensureRegistered(spark,
      Set("graft_jaro_winkler", "graft_damerau_levenshtein"))

  /** Jaro-Winkler similarity (DuckDB/RapidFuzz conventions: 0 on empty,
    * boost only above 0.7). Requires the graft extensions or a prior
    * [[ensureRegistered]] on the frame's session.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** Full (unrestricted) Damerau-Levenshtein distance. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    call_function("graft_damerau_levenshtein", a, b)

  /** Bounded Damerau-Levenshtein: exact when ≤ `maxDist`, `maxDist + 1`
    * otherwise — banded DP, O(len·maxDist).
    */
  def damerauLevenshtein(a: Column, b: Column, maxDist: Int): Column =
    call_function("graft_damerau_levenshtein", a, b, lit(maxDist))

  /** Sorted-neighborhood fuzzy candidates — the classic second blocking
    * pass of entity resolution (Hernández & Stolfo's merge/purge):
    * sort the DISTINCT vocabulary lexicographically and score each label
    * against its next `window` neighbors. Catches near-pairs that
    * token/length blocking splits (a typo in the FIRST token moves a
    * label to a different `fuzzyPairs` block but rarely far in sort
    * order); production runs both passes and unions the candidates.
    *
    * Output: `a_label, b_label, gap, dl` with `a_label < b_label`
    * (lexicographic adjacency implies orientation), `gap` = rank
    * distance (1..window), only rows with `dl <= maxDist`.
    *
    * Scale shape: NO single-partition global sort — the global
    * lexicographic rank is computed as range-partitioned within-partition
    * ranks plus broadcast partition offsets (the shuffleOrder pattern;
    * the rank is a pure function of the label set, so any range boundary
    * choice yields the same answer and the oracle replays a plain
    * `row_number() OVER (ORDER BY label)`). Neighbor candidates come
    * from a rank-band equi-join (band = rank div window, each left row
    * probing its own and the next band) — vocabulary-sized throughout.
    *
    * The `dl` kernel is evaluated twice per SURVIVING row (once in the
    * filter, once in the projection — subexpression elimination does not
    * span the Filter/Project boundary, and alias-substituting predicate
    * pushdown re-inlines any pre-projected column back into the filter).
    * Accepted deliberately: the filter-side evaluation over ALL
    * candidates is the unavoidable dominant cost, and survivors (the
    * only rows paying the second evaluation) are a tiny fraction of the
    * band join.
    */
  def sortedNeighborPairs(
      df: DataFrame,
      labelCol: String = "label",
      window: Int = 8,
      maxDist: Int = 4): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    ensureRegistered(df.sparkSession)
    val spark = df.sparkSession
    val parallelism = spark.sessionState.conf.numShufflePartitions
    val labels = df.select(col(labelCol).as("label"))
      .where(col("label").isNotNull)
      .dropDuplicates("label")
      .repartitionByRange(parallelism, col("label"))
      .withColumn("_p", spark_partition_id())
    val ranked = labels.withColumn("_rk",
      row_number().over(Window.partitionBy("_p").orderBy("label"))
        .cast("long"))
    val offsets = labels.groupBy("_p").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum("_n").over(Window.orderBy("_p")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_p", "_off")
    val r = ranked.join(broadcast(offsets), "_p")
      .select(col("label"), (col("_off") + col("_rk")).as("rank"))
      // both the band-replicated probe side and the build side read this
      // (bandedCandidates lesson); released via the caller's
      // releaseCheckpoints — reachable from both sides of the join
      .localCheckpoint()
    val a = r.select(col("label").as("a_label"), col("rank").as("ra"))
      .withColumn("_g", explode(array(
        floor((col("ra") - 1) / window), floor((col("ra") - 1) / window) + 1)))
    val b = r.select(col("label").as("b_label"), col("rank").as("rb"),
      floor((col("rank") - 1) / window).as("_g"))
    a.join(b, Seq("_g"))
      .filter(col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= window &&
        (abs(octet_length(col("a_label")) - octet_length(col("b_label")))
          <= maxDist) &&
        damerauLevenshtein(col("a_label"), col("b_label"), maxDist) <= maxDist)
      .select(col("a_label"), col("b_label"),
        (col("rb") - col("ra")).as("gap"),
        damerauLevenshtein(col("a_label"), col("b_label"), maxDist).as("dl"))
  }

  /** End-to-end entity resolution over a label column: blocked fuzzy
    * candidates at `dl <= maxDist` from THREE passes — [[fuzzyPairs]]'
    * (first-token × length-band) blocks ∪ forward [[sortedNeighborPairs]]
    * ∪ the reversed-label sorted pass (the measured 796‰→890‰→915‰
    * recall ladder, `q_fuzzy_recall*`) → connected
    * components ([[Dedup.duplicateGroups]] — variant chains a~b~c
    * collapse even when (a, c) was never a candidate) → canonical label =
    * the group's most FREQUENT spelling in the corpus (ties →
    * lexicographically smallest). Every corpus label maps to its
    * canonical form; labels in no group map to themselves.
    *
    * Output: `label, canonical, n_rows` (corpus occurrences of `label`).
    * Joining this mapping back onto the corpus is the apply step —
    * a broadcast-sized table for any realistic vocabulary.
    *
    * Scale shape: frequency table and candidate generation are
    * vocabulary-sized; CC runs on the candidate graph (dup-cluster
    * sized); the corpus itself is touched only by the initial
    * per-label count.
    */
  /** Q-GRAM blocking pass — the fourth candidate axis of the recall
    * ladder (round-11), catching the DL≤k pairs that are neither
    * prefix- nor suffix-adjacent (a typo early AND late in the label
    * defeats both sorted passes, and a first-token typo defeats the
    * block pass). Classic prefix-filtered q-gram blocking: extract each
    * DISTINCT label's distinct `q`-grams, rank every label's grams by
    * GLOBAL document frequency (rarest first, ties lexicographic), keep
    * the `keep` rarest per label, and candidates are label pairs
    * sharing at least one kept gram. Two edits destroy at most `2q`
    * grams, so near-pairs almost always share a rare gram; ranking by
    * rarity keeps the posting lists short (the hot grams that would go
    * quadratic are exactly the ones rank > `keep` prunes). Measured on
    * the q_fuzzy_recall vocabulary: q=5/keep=3 finds 996‰ of exact
    * DL≤2 pairs ALONE at ~2% of the all-pairs volume
    * (`q_fuzzy_recall_qgram`).
    *
    * Output: `a_label, b_label, dl` with `a_label < b_label`, only
    * rows with `dl <= maxDist`. Scale shape: vocabulary-sized
    * throughout — gram explode (≈ len·|vocab| rows), df count, per-label
    * rank window, posting-list self-join under `capBuckets`.
    */
  def qgramPairs(
      df: DataFrame,
      labelCol: String = "label",
      q: Int = 5,
      keep: Int = 3,
      maxBucket: Int = 100000,
      maxDist: Int = 2): DataFrame = {
    require(q >= 1, s"q must be >= 1, got $q")
    require(keep >= 1, s"keep must be >= 1, got $keep")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    ensureRegistered(df.sparkSession)
    val labels = df.select(col(labelCol).as("label"))
      .where(col("label").isNotNull)
      .dropDuplicates("label")
    // distinct q-grams per label; labels shorter than q contribute the
    // whole label as their single gram (greatest(len-q+1, 1))
    val grams = labels
      .select(col("label"), explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col("label")) - (q - 1), lit(1))),
        i => col("label").substr(i, lit(q))))).as("g"))
    val gdf = grams.groupBy("g").agg(count(lit(1)).as("df"))
    // per-label rarest-`keep` grams under the (df, gram) global order —
    // the prefix-filter selection; the join back to df counts is
    // gram-keyed and AQE-broadcast when the gram table is small
    val kept = Dedup.capBuckets(
      grams.join(gdf, Seq("g"))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("label").orderBy(asc("df"), asc("g"))))
        .filter(col("_rn") <= keep)
        .select("label", "g"),
      Seq("g"), maxBucket)
      .localCheckpoint()
    kept.select(col("g"), col("label").as("a_label"))
      .join(kept.select(col("g"), col("label").as("b_label")), Seq("g"))
      .filter(col("a_label") < col("b_label") &&
        abs(octet_length(col("a_label")) - octet_length(col("b_label"))) <= maxDist &&
        damerauLevenshtein(col("a_label"), col("b_label"), maxDist) <= maxDist)
      .select("a_label", "b_label")
      .dropDuplicates("a_label", "b_label")
      .withColumn("dl", damerauLevenshtein(col("a_label"), col("b_label"), maxDist))
  }

  def resolveEntities(
      df: DataFrame,
      labelCol: String = "label",
      maxDist: Int = 2,
      lenBand: Int = 8,
      maxBucket: Int = 100000,
      window: Int = 8): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(window >= 1, s"window must be >= 1, got $window")
    import org.apache.spark.sql.expressions.Window
    val freq = df.select(col(labelCol).as("label"))
      .where(col("label").isNotNull)
      .groupBy("label").agg(count(lit(1)).as("n_rows"))
    // candidate generation runs ALL FOUR blocking passes (the measured
    // recall ladder — token/length blocks alone 796‰ of exact DL≤2
    // pairs, + forward sorted-neighborhood 890‰, + the REVERSED-label
    // pass 915‰ (DL is invariant under simultaneous reversal, so
    // reversed candidates verify identically and are re-oriented on the
    // original labels), + round-11's rarest-q-gram pass 999‰
    // (`q_fuzzy_recall_qgram`) — the axis that catches pairs with edits
    // both early AND late, which no sort adjacency sees). An apply
    // operator that silently misses true pairs is not entity
    // resolution — the probe-2 default's rule, applied here.
    val labels = df.select(col(labelCol).as("label"))
    val blk = fuzzyPairs(df, labelCol, lenBand, maxBucket, maxDist)
      .select(col("a_label").as("a_id"), col("b_label").as("b_id"))
    val fwd = sortedNeighborPairs(labels, "label", window, maxDist)
      .select(col("a_label").as("a_id"), col("b_label").as("b_id"))
    val rev = sortedNeighborPairs(
      labels.where(col("label").isNotNull)
        .select(reverse(col("label")).as("label")), "label", window, maxDist)
      .select(reverse(col("a_label")).as("x"), reverse(col("b_label")).as("y"))
      .select(least(col("x"), col("y")).as("a_id"),
        greatest(col("x"), col("y")).as("b_id"))
    val qg = qgramPairs(df, labelCol, maxBucket = maxBucket, maxDist = maxDist)
      .select(col("a_label").as("a_id"), col("b_label").as("b_id"))
    val pairs = blk.unionByName(fwd).unionByName(rev).unionByName(qg).distinct()
    val groups = Dedup.duplicateGroups(pairs)
    // duplicateGroups EAGERLY materialized its own edge checkpoint, so the
    // candidate pipeline's pin (fuzzyPairs' blocked vocabulary) is dead —
    // and unreachable from the returned plan, so the caller's
    // releaseCheckpoints could never free it (the q_embed_dups_trained
    // lesson; without this, cleanup rides ContextCleaner GC timing)
    Dedup.releaseCheckpoints(pairs)
    val w = Window.partitionBy("group_id").orderBy(desc("n_rows"), asc("id"))
    val canon = groups
      .join(freq.select(col("label").as("id"), col("n_rows")), Seq("id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("group_id"), col("id").as("canonical"))
    freq
      .join(groups.select(col("id").as("label"), col("group_id")),
        Seq("label"), "left")
      .join(canon, Seq("group_id"), "left")
      .select(col("label"),
        coalesce(col("canonical"), col("label")).as("canonical"),
        col("n_rows"))
  }

  /** All label pairs within a (first-token, length-band) block, scored by
    * the three classic measures. Input: any frame with `labelCol`; the
    * vocabulary is `dropDuplicates`-reduced internally. Output columns:
    * `a_label, b_label, lev, dl, jw` with `a_label < b_label`.
    *
    * `maxDist >= 0` is the thresholded-join fast path: the output keeps
    * ONLY pairs with `dl <= maxDist` (identical to filtering the
    * unbounded call — don't add your own `dl` filter, it would push back
    * into the join ahead of the cheap predicates). Three levers, ordered
    * cheap-to-expensive inside ONE conjunction so codegen short-circuits
    * in that order (Catalyst preserves conjunct order within an And
    * tree, but merges separately-added filters in arbitrary order —
    * measured: the DP ran before `a < b`, doubling its volume):
    * byte-length prefilter (safe — every byte edit changes the length by
    * at most one, so `dl >= |bytes(a)| − |bytes(b)|`), the `a < b`
    * orientation cut, then the banded O(len·maxDist) `dl` kernel. `lev`
    * on the survivors uses Spark's thresholded levenshtein at
    * `2·maxDist` (a transposition is two substitutions, so survivors
    * always satisfy `lev <= 2·dl`, keeping their `lev` exact).
    *
    * String-unit caveat: `dl`/`jw` and the `octet_length` prefilter are
    * UTF-8 BYTE-based (DuckDB `damerau_levenshtein` /
    * `jaro_winkler_similarity` parity — both operate on bytes), while
    * `lev` is Spark's CODE-POINT levenshtein. On ASCII vocabularies
    * (this corpus) the units coincide; on non-ASCII labels the columns
    * mix units and `lev` diverges from DuckDB's byte-based levenshtein
    * — callers needing byte-consistent `lev` on such data should derive
    * it from `dl` bounds or add a byte-level kernel.
    *
    * @param lenBand   width of the length-band blocking key (code points)
    * @param maxBucket drop blocks larger than this (skew guard)
    * @param maxDist   thresholded fast path (see above); -1 = exact/unbounded
    */
  def fuzzyPairs(
      df: DataFrame,
      labelCol: String = "label",
      lenBand: Int = 8,
      maxBucket: Int = 100000,
      maxDist: Int = -1): DataFrame = {
    require(lenBand > 0, s"lenBand must be positive, got $lenBand")
    ensureRegistered(df.sparkSession)
    val labels = df
      .select(col(labelCol).as("label"))
      .where(col("label").isNotNull)
      .dropDuplicates("label")
      .select(col("label"),
        split_part(col("label"), lit(" "), lit(1)).as("_f"),
        floor(length(col("label")) / lenBand).as("_lb"))
    // materialize the blocked vocabulary once: the renamed a/b sides
    // defeat static exchange reuse, so without the checkpoint the whole
    // scan→dedup→window pipeline executes once per side (the
    // bandedCandidates lesson); released by the caller's
    // releaseCheckpoints — the LogicalRDD is reachable from both sides
    // of the returned plan
    val blocked = Dedup.capBuckets(labels, Seq("_f", "_lb"), maxBucket)
      .localCheckpoint()
    // probe side re-partitioned by LABEL hash with an EXPLICIT partition
    // count: the vocabulary is tiny in bytes, so AQE coalesces an
    // advisory repartition down to 1-2 partitions — but each probe row
    // fans out into its whole block's pair volume in the join stage, so
    // the DP work is output-sized, not input-sized, and ran near-serial
    // (measured: 3.7 s for ~5 core-seconds of kernel work). An explicit N
    // pins the stage's parallelism; label hash spreads unequal blocks
    // uniformly.
    val parallelism =
      df.sparkSession.sessionState.conf.numShufflePartitions
    val a = blocked.repartition(parallelism, col("label"))
      .select(col("_f"), col("_lb"), col("label").as("a_label"))
    val b = blocked.select(col("_f"), col("_lb"), col("label").as("b_label"))
    val joined = a.join(b, Seq("_f", "_lb"))
    val dl =
      if (maxDist < 0) damerauLevenshtein(col("a_label"), col("b_label"))
      else damerauLevenshtein(col("a_label"), col("b_label"), maxDist)
    val lev =
      if (maxDist < 0) levenshtein(col("a_label"), col("b_label"))
      else levenshtein(col("a_label"), col("b_label"), 2 * maxDist)
    val pairs =
      if (maxDist < 0) joined.filter(col("a_label") < col("b_label"))
      else joined.filter(
        (abs(octet_length(col("a_label")) - octet_length(col("b_label")))
          <= maxDist) && (col("a_label") < col("b_label")) &&
          dl <= maxDist)
    pairs.select(
      col("a_label"), col("b_label"),
      lev.as("lev"), dl.as("dl"),
      jaroWinkler(col("a_label"), col("b_label")).as("jw"))
  }
}
