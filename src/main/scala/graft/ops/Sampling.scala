package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and splitting — keyed on a content hash,
  * never on randomness or row position, so assignments are reproducible
  * across runs, engines, partitionings, and cluster sizes, and GROWING the
  * corpus never reassigns an existing key (the property that keeps a held-
  * out set held out across dataset versions). The hash is the portable
  * md5-prefix family ([[graft.functions.PortableHash]]), so any engine can
  * recompute the same assignment.
  *
  * Both operators are pure narrow projections/filters — no shuffle, no
  * state; a parquet scan with the split filter pushed into it is the whole
  * plan at any scale.
  */
object Sampling {

  /** Purpose salts: split assignment and sampling hash DIFFERENT strings,
    * so the two bucketings are independent — an unsalted shared hash made
    * `sampleByHash(df, k, 100)` select exactly the test+val buckets of
    * [[assignSplit]] (a debug sample with zero training rows). Oracle
    * replay of a bucket: `('0x' || substr(md5('<salt>' || CAST(k AS
    * VARCHAR)), 1, 7))::BIGINT % 1000`.
    */
  val SplitSalt = "split:"
  val SampleSalt = "sample:"
  val ShuffleSalt = "shuffle:"

  private[ops] def bucket1000(salt: String, keyCol: String) =
    pmod(PortableHash.h28(concat(lit(salt), col(keyCol).cast("string"))), lit(1000L))

  /** Stamp each row with a `split` column (`train` / `val` / `test`) by
    * hash bucket of `keyCol`: buckets `[0, testPermille)` → test,
    * `[testPermille, testPermille + valPermille)` → val, rest → train.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      valPermille: Int = 100,
      testPermille: Int = 0): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0,
      s"permilles must be non-negative: val=$valPermille test=$testPermille")
    require(valPermille + testPermille <= 1000,
      s"val + test permille must be <= 1000, got ${valPermille + testPermille}")
    df.withColumn("split",
      graft.functions.ColumnOps.bind(bucket1000(SplitSalt, keyCol)) { b =>
        when(b < testPermille, "test")
          .when(b < testPermille + valPermille, "val")
          .otherwise("train")
      })
  }

  /** Keep a deterministic ~`permille`/1000 sample of the rows by hash
    * bucket of `keyCol` — the "take 1% of the corpus" debug/estimate
    * operator, stable under reruns and data growth.
    */
  def sampleByHash(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0, 1000], got $permille")
    df.filter(bucket1000(SampleSalt, keyCol) < permille)
  }

  val WeightedSalt = "wsample:"

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-Res): each row gets priority `ln(u) / w` with a
    * hash-derived uniform `u = (h28(salt‖key) + 1) / 2^28 ∈ (0, 1]`, and
    * the top-k priorities are the sample — inclusion probability
    * proportional to the row's weight (e.g. sample documents
    * length-proportionally), yet fully replayable: no RNG, so any
    * engine draws the SAME sample. Plan is a narrow projection plus a
    * TakeOrdered — no shuffle beyond the k-row top-k.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val u = (PortableHash.h28(concat(lit(WeightedSalt),
      col(keyCol).cast("string"))) + 1L) / lit(268435456.0d) // 2^28
    // A-Res is defined for w > 0 only: a negative weight would flip
    // ln(u) positive and deterministically crowd out every valid row,
    // and w = 0 can reach NaN (sorts FIRST under desc) — drop both.
    df.filter(col(weightCol) > 0)
      .withColumn("priority", log(u) / col(weightCol))
      .orderBy(desc("priority"), col(keyCol))
      .limit(k)
      .withColumn("priority", round(col("priority"), 6))
  }

  /** Stratified deterministic sampling: a different permille per value of
    * `stratumCol` (e.g. re-balance languages: downsample English, keep
    * all of a rare language), `defaultPermille` for unlisted strata.
    * Same hash-bucket mechanics as [[sampleByHash]] — per-key stability
    * and growth-safety hold per stratum — and still a pure narrow filter:
    * the rate table compiles into the predicate, so nothing shuffles or
    * broadcasts at any corpus size.
    */
  def sampleStratified(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int = 1000): DataFrame = {
    (permilleByStratum.values ++ Seq(defaultPermille)).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille must be in [0, 1000], got $p"))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(bucket1000(SampleSalt, keyCol) < rate)
  }

  /** Deterministic global shuffle: stamp each row with `shuffle_pos`, its
    * 1-based position in a pseudorandom — but fully reproducible — total
    * order of the corpus (order by salted key hash). This is the "shuffle
    * the training data" step run before [[graft.ops.TextAnalysis.packSequences]]:
    * hash order decorrelates neighboring documents, and because it is
    * keyed (not random), every rerun, engine, and cluster size produces
    * the SAME permutation.
    *
    * A naive `row_number() OVER (ORDER BY hash)` is a single-partition
    * global sort — the one plan shape that cannot scale. Instead the
    * order is bucketized: rows rank within `buckets` hash buckets in
    * parallel (one partitioned window), bucket offsets come from a
    * bucket-count aggregate (`buckets` rows — window over that is free),
    * and `shuffle_pos = offset(bucket) + rank`. The global order realized
    * is (bucket, hash, key) — exactly what the oracle replays.
    *
    * `keyCol` must be unique per row (a doc id): duplicate keys hash to
    * the same sort position and their relative order would be
    * tie-broken arbitrarily.
    */
  def shuffleOrder(
      df: DataFrame,
      keyCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    Seq("_h", "_b", "_rk", "_off").foreach(c =>
      require(!df.columns.contains(c),
        s"shuffleOrder reserves the working column name '$c'"))
    import org.apache.spark.sql.expressions.Window
    val withB = df
      // coalesce: a NULL key must still get a position — concat(…, NULL)
      // is NULL, NULL _b never matches the offsets equi-join, and the row
      // would silently vanish from an operator whose contract is "stamp
      // EACH row". The NUL-prefixed sentinel (chr(0) || 'null' in the
      // oracle side) cannot collide with any realistic cast key string.
      .withColumn("_h", PortableHash.h28(
        concat(lit(ShuffleSalt),
          coalesce(col(keyCol).cast("string"), lit("\u0000null")))))
      .withColumn("_b", pmod(col("_h"), lit(buckets.toLong)))
    val ranked = withB.withColumn("_rk",
      row_number().over(
        Window.partitionBy("_b").orderBy(col("_h"), col(keyCol))))
    val offsets = withB.groupBy("_b").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum("_n").over(Window.orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_b", "_off")
    ranked.join(broadcast(offsets), "_b")
      .withColumn("shuffle_pos", col("_off") + col("_rk"))
      .drop("_h", "_b", "_rk", "_off")
  }

  /** PER-STRATUM deterministic weighted sampling without replacement —
    * [[weightedSample]]'s A-Res priorities (`ln(u)/w`, hash-derived `u`,
    * no RNG) selected top-k WITHIN each value of `stratumCol`: the
    * "sample 10k docs per language, length-proportionally" rebalancing
    * draw, replayable by any engine.
    *
    * Two selection paths, identical rows (the [[graft.ops.TextAnalysis.topNgrams]]
    * twin pattern):
    *
    *   - `native = true` — ONE [[graft.plans.TopKAgg]] (`graft_top_k`)
    *     pass: a k-bounded heap per stratum inside ObjectHashAggregate,
    *     partial-aggregated below the exchange, so the shuffle carries
    *     ≤ k entries per partition per stratum instead of the window
    *     path's every-row sort — the difference between "sample each
    *     language" being a top-k heap and being a per-language sort of
    *     the corpus at 100 TB;
    *   - `native = false` — the rank-window twin for vanilla sessions.
    *
    * Priorities are micro-quantized (`round(ln(u)/w · 1e6)` as a long)
    * so both paths and the oracle rank by integers; ties break by the
    * key's STRING form ASC ([[graft.plans.TopKAgg]]'s key type — the
    * window twin matches it so the two paths stay row-identical).
    * Rows with `w ≤ 0` are dropped exactly as [[weightedSample]] drops
    * them. Output: `(stratum, rank, key, prio_micro)`, rank 1..k per
    * stratum — join `key` back to fetch sampled rows.
    */
  def weightedSampleStratified(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      stratumCol: String,
      k: Int,
      native: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (PortableHash.h28(concat(lit(WeightedSalt),
      col(keyCol).cast("string"))) + 1L) / lit(268435456.0d) // 2^28
    val base = df.filter(col(weightCol) > 0)
      .select(col(stratumCol).as("stratum"),
        col(keyCol).cast("string").as("key"),
        round(log(u) / col(weightCol) * 1e6, 0).cast("long")
          .as("prio_micro"))
    if (native) {
      base.groupBy("stratum")
        .agg(call_function("graft_top_k",
          col("key"), col("prio_micro"), lit(k)).as("__tk"))
        .select(col("stratum"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("stratum"), (col("__pos") + 1).cast("long").as("rank"),
          col("__e.key").as("key"), col("__e.cnt").as("prio_micro"))
    } else {
      val w = Window.partitionBy("stratum")
        .orderBy(desc("prio_micro"), asc("key"))
      base.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("stratum", "rank", "key", "prio_micro")
    }
  }

  /** Curriculum staging: split each group's documents into `stages`
    * equal-ish buckets by descending score (stage 1 = highest quality) —
    * the "train on clean data first" ordering. `ntile` over a TOTAL
    * order (score desc, then id) is deterministic and ANSI-standard, so
    * the oracle replays stage boundaries exactly.
    *
    * The window partitions by `groupCol` (language/source shard), never
    * globally — per-shard sorts bound the work exactly as in
    * [[graft.ops.TextAnalysis.packSequences]].
    */
  def curriculumStages(
      df: DataFrame,
      stages: Int,
      scoreCol: String,
      groupCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(stages >= 1, s"stages must be >= 1, got $stages")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("stage",
      ntile(stages).over(Window.partitionBy(groupCol)
        .orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
  }
}
