package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators: cardinality estimation and snapshot
  * merging — the bookkeeping layer of a training-data pipeline (how many
  * distinct tokens/urls/ids do we have; which version of a document wins
  * when crawl snapshots overlap).
  */
object CorpusOps {

  /** Distinct-count estimate by KEY-SPACE sampling: count exactly the
    * distinct keys whose portable hash lands in bucket 0 of `rate`
    * buckets, and scale by `rate`. Because the sample is in HASH space
    * (not row space), duplicates of a key collapse to one vote and the
    * estimator is unbiased for distinct counts — row-sampling is not.
    *
    * The scale story is the point: the bucket filter is a narrow
    * predicate applied BEFORE the distinct's shuffle, so only ~1/`rate`
    * of the key space ever shuffles, vs a full `count(distinct)` moving
    * every key. Std error ≈ sqrt(rate / true_distinct) — rate 64 on a
    * million-key group is ±0.8%. Deterministic (no randomness), so any
    * engine replays the same estimate exactly.
    */
  def approxDistinct(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      rate: Int = 64): DataFrame = {
    require(rate >= 1, s"rate must be >= 1, got $rate")
    df.filter(pmod(PortableHash.h28(col(keyCol)), lit(rate.toLong)) === 0L)
      .groupBy(groupCols.map(col): _*)
      .agg((countDistinct(col(keyCol)) * rate).as("est_distinct"))
  }

  /** HyperLogLog distinct-count estimate per group — the canonical
    * fixed-size mergeable cardinality sketch (Flajolet et al.), on the
    * portable hash so the whole computation replays in any engine:
    *
    *   - 64 registers from the top 6 bits of `h28(key)`; register value
    *     ρ = leading-zero count of the remaining 22 bits + 1 (a
    *     `max` per bucket — registers of two shards merge by max, which
    *     is what makes the sketch shard-foldable at 100 TB);
    *   - the indicator sum is kept in INTEGERS: Σ 2^(23−ρ) over the 64
    *     registers (empty register → 2^23), so the only float op is the
    *     final `α·m²·2^23 / S` division — no summation-order drift;
    *   - standard small-range correction: linear counting `m·ln(m/V)`
    *     when the raw estimate ≤ 2.5m and V registers are empty.
    *
    * Relative error ≈ 1.04/√64 ≈ 13% — the trade for 64 longs of state
    * per group vs an exact distinct's full shuffle of every key.
    */
  def hllEstimate(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String]): DataFrame =
    hllFromRegisters(hllRegisters(df, keyCol, groupCols), groupCols)

  /** The HLL register table `(group…, _bucket, _m)` — the PERSISTED form
    * of the sketch: 64 rows per group, register = max ρ per bucket.
    * Registers of any number of shards merge by `groupBy(bucket).max(_m)`
    * over their union — the shard-fold a 1000-executor pipeline does —
    * and [[hllFromRegisters]] reads the estimate off any merged table.
    */
  def hllRegisters(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String]): DataFrame = {
    val h = PortableHash.h28(col(keyCol))
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .withColumn("_bucket", shiftright(col("_h"), 22))
      .withColumn("_w", col("_h").bitwiseAND(lit((1L << 22) - 1L)))
      .withColumn("_rho",
        when(col("_w") === 0L, lit(23L))
          .otherwise(lit(22L) - floor(log2(col("_w"))).cast("long")))
      .groupBy(groupCols.map(col) :+ col("_bucket"): _*)
      .agg(max("_rho").as("_m"))
  }

  /** Estimate from a register table ([[hllRegisters]] output or any
    * max-merge of such tables).
    */
  def hllFromRegisters(
      registers: DataFrame,
      groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(pow(lit(2.0d), lit(23L) - col("_m")).cast("long")).as("_s_present"),
        count(lit(1)).as("_nb"))
      .withColumn("_s",
        col("_s_present") + (lit(64L) - col("_nb")) * lit(1L << 23))
      .withColumn("_v", lit(64L) - col("_nb"))
      .withColumn("_raw",
        lit(0.709d * 64d * 64d * 8388608d) / col("_s").cast("double"))
      .withColumn("est_distinct",
        round(when(col("_raw") <= 160d && col("_v") > 0L,
          lit(64d) * log(lit(64d) / col("_v").cast("double")))
          .otherwise(col("_raw")), 3))
      .select(groupCols.map(col) :+ col("est_distinct"): _*)

  /** Merge two corpus snapshots, keeping ONE version per key: the
    * `preferred` side's row when the key appears in both, else whichever
    * side has it; ties within a side broken by the greatest `scoreCol`
    * then the smallest `tieCol`.
    *
    * The survivor is unique and replay-deterministic only when
    * (side, `scoreCol`, `tieCol`) is unique per key — pass a per-side
    * unique id (row id, fetch timestamp) as `tieCol` when a side can
    * carry duplicate keys; on a full tie `row_number` keeps an arbitrary
    * row.
    *
    * One shuffle on the key (the window's partitioning); no join — the
    * union is a zero-cost plan node, so cost is a single per-key
    * top-1, skew-bounded by versions-per-key (small by construction).
    */
  def mergeBestVersion(
      preferred: DataFrame,
      other: DataFrame,
      keyCol: String,
      scoreCol: String,
      tieCol: String): DataFrame = {
    Seq("_pri", "_rk").foreach(c =>
      require(!preferred.columns.contains(c) && !other.columns.contains(c),
        s"mergeBestVersion reserves the working column name '$c'"))
    val u = preferred.withColumn("_pri", lit(1))
      .unionByName(other.withColumn("_pri", lit(0)))
    val w = Window.partitionBy(keyCol)
      .orderBy(desc("_pri"), desc(scoreCol), asc(tieCol))
    u.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_pri", "_rk")
  }

  /** Snapshot diff: classify every key across two corpus snapshots as
    * `added` / `removed` / `changed` / `unchanged` — the bookkeeping step
    * between crawls that decides what re-enters the pipeline (only
    * `added`+`changed` need re-processing; `removed` tombstones
    * downstream artifacts).
    *
    * One full-outer join keyed on `keyCol`, carrying md5 digests instead
    * of documents — at 100 TB the shuffle moves 16-byte hashes, the texts
    * never leave their scans. Raw-content digest (no normalization): a
    * whitespace edit IS a change at this layer; near-dup tolerance
    * belongs to [[graft.ops.Dedup]].
    */
  def snapshotDiff(
      current: DataFrame,
      previous: DataFrame,
      keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // Presence is a flag, not digest-null: a present row with NULL text
    // must not read as an absent key (and <=> keeps null = null text
    // "unchanged" instead of a spurious "changed").
    val c = current.select(
      col(keyCol), md5(col(textCol)).as("_cd"), lit(true).as("_cp"))
    val p = previous.select(
      col(keyCol), md5(col(textCol)).as("_pd"), lit(true).as("_pp"))
    // <=> on the key: a NULL-keyed doc present in both snapshots must
    // read as one matched row (unchanged/changed), not a spurious
    // added+removed pair — same NULL-key discipline as applyChanges
    val pR = p.withColumnRenamed(keyCol, "__p_key")
    c.join(pR, col(keyCol) <=> col("__p_key"), "full_outer")
      .select(
        coalesce(col(keyCol), col("__p_key")).as(keyCol),
        when(col("_pp").isNull, "added")
          .when(col("_cp").isNull, "removed")
          .when(col("_cd") <=> col("_pd"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Per-group quota capping: keep at most `cap` rows per value of
    * `groupCol`, preferring high `scoreCol` (ties to low `idCol`) — the
    * per-domain document cap every crawl pipeline applies so no single
    * domain dominates the corpus.
    *
    * Two-phase, because a plain `row_number` window ranks EVERY group:
    * at 100 TB almost all domains are under the cap, yet each would pay
    * a full partition-and-sort. Here a count aggregate (partial map-side
    * combine, (group, count) pairs only) first finds the over-cap groups;
    * under-cap rows pass through with NO sort, and only the over-cap
    * slice — the skewed head, a small fraction of rows — is ranked. AQE
    * broadcasts the over-cap group list when it is small (the usual
    * case: ≤ rows/cap groups can exceed the cap). The output equals the
    * single-window formulation row for row, which is the oracle.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      cap: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    Seq("_over", "_ogrp", "_rk").foreach(c =>
      require(!df.columns.contains(c),
        s"capPerGroup reserves the working column name '$c'"))
    val over = df.groupBy(groupCol).count()
      .filter(col("count") > cap)
      .select(col(groupCol).as("_ogrp"), lit(true).as("_over"))
    // null-safe match: a NULL group is a group like any other (the window
    // formulation puts nulls in one partition); a plain equi-join would
    // let an over-cap null group slip through uncapped
    val flagged = df.join(over, col(groupCol) <=> col("_ogrp"), "left")
      .drop("_ogrp")
    val under = flagged.filter(col("_over").isNull).drop("_over")
    val w = Window.partitionBy(groupCol)
      .orderBy(desc(scoreCol), asc(idCol))
    val capped = flagged.filter(col("_over").isNotNull).drop("_over")
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk")
    under.unionByName(capped)
  }

  /** Training-mixture plan: α-scaled sampling weights and per-domain
    * epoch counts for a token budget — the "how often do we repeat each
    * language/source" table every multilingual pretraining run starts
    * from (α < 1 upsamples the tail, α = 1 is natural sampling).
    *
    * Per domain `l` with `T_l` tokens: weight ∝ `T_l^α`, epochs =
    * `weight · budget / T_l`. The α-power is quantized to micro-units
    * ONCE per domain, after which shares and weights are exact integer
    * floor-divisions; only `epochs` is a double, computed by one fixed
    * expression over exact integers (cross-engine identical — the
    * [[graft.ops.EventAnalytics.rateAnomalies]] argument). Residual
    * risk, as with every `ln`-quantized operator here: `pow` is only
    * 1-ulp-accurate in Java, so a domain whose `T^α·1e6` sits within
    * ~1e-10 of a .5 boundary could round differently across engines —
    * one rounding per DOMAIN (a handful), not per row, which is why the
    * quantize-once-then-integer design bounds the exposure.
    *
    * One data-sized aggregation (domain token counts); everything after
    * operates on a domain-cardinality table.
    */
  /** Exact numeric column profile — count / nulls / distincts / min /
    * max per column, the data-quality dashboard a warehouse runs after
    * every load. ONE aggregation pass over the table (per-column
    * aggregates computed side by side, then unpivoted to rows with a
    * Generate — no per-column rescans; `countDistinct` expands to a
    * single multi-distinct aggregate).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__dist"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"${c}__cnt").as("n_present"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__dist").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_present"),
        col("p.n_null"), col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
  }

  /** The SCALE form of [[profileNumeric]] — the same per-column profile
    * with every corpus-sized aggregate replaced by a bounded mergeable
    * sketch, plus the quantiles the exact profile cannot afford at all:
    *
    *   - `n_distinct` (exact `countDistinct` ships every distinct value
    *     through the shuffle) → the 64-register portable HLL
    *     ([[hllRegisters]]: fixed 64 longs of state per column,
    *     register max-merge across shards);
    *   - quantiles → [[quantileSketch]] (one
    *     O(capacity·log(N/capacity)) compactor summary per partition
    *     per column crosses the wire — the `q_heavy_hitters` in-plan
    *     partial-agg proof pattern — instead of `percentile`'s
    *     every-value shuffle + per-group sort);
    *   - count/null/min/max keep their exact O(1)-state aggregates
    *     (already mergeable — nothing to trade).
    *
    * Columns unpivot into ONE narrow `(col_name, value)` frame (one
    * projection, no per-column passes); values quantize by
    * `round(value·scale)` into exact longs (100 for two-decimal money
    * columns), which is what makes both sketches integer-exact and
    * oracle-replayable — the ROUND is load-bearing on double-typed
    * columns, where `x·100` lands at `…99999998` and a bare cast's
    * truncation disagrees across engines.
    * Two aggregation passes total, both map-side combined; every
    * post-shuffle table is O(columns · capacity), never corpus-sized.
    */
  def profileNumericSketch(
      df: DataFrame,
      cols: Seq[String],
      scale: Long = 1L,
      probsPermille: Seq[Int] = Seq(500, 900, 990),
      capacity: Int = 32768,
      native: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(scale > 0, s"scale must be positive, got $scale")
    val unpivoted = df
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        round(col(c) * scale).cast("long").as("value"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.value"))
    val base = unpivoted.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      count(col("value")).as("n_present"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
      min("value").as("min_val"),
      max("value").as("max_val"))
    val present = unpivoted.filter(col("value").isNotNull)
    val quants = quantileSketch(present, "value", "col_name",
      probsPermille, capacity, native).drop("n_values")
    val distinct = hllEstimate(present, "value", Seq("col_name"))
    // both right sides are columns-sized — broadcast by construction
    base
      .join(broadcast(quants), Seq("col_name"), "left")
      .join(broadcast(distinct), Seq("col_name"), "left")
  }

  /** One-pass approximate quantiles by fixed-width binning: count rows
    * per `floor(value / binWidth)` bin, then read each requested
    * permille off the cumulative bin histogram. The answer is exact to
    * ±`binWidth` (reported as the `[q_lo, q_hi]` bin bounds), which is
    * the right trade at 100 TB: ONE narrow aggregation whose state is
    * O(value_range / binWidth) and MERGEABLE across shards (bins are
    * just counts that add), vs an exact percentile's global sort. The
    * cumulative window runs over the already-aggregated bin table —
    * hundreds of rows — never over data.
    *
    * Deterministic: the threshold test is the integer cross-multiply
    * `1000 * cum >= permille * n` (no float ceil), so any engine picks
    * the identical bin.
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: String,
      binWidth: Long,
      permilles: Seq[Int]): DataFrame =
    histogramQuantiles(df, valueCol, binWidth, permilles, Nil)
      .drop("__g")

  /** Per-group variant — the production shape (p50/p99 document length
    * PER language/source): bins keyed on (group, bin), the cumulative
    * window per group (parallel across groups), totals joined back on
    * the group key. Empty `groupCols` degrades to the global form.
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: String,
      binWidth: Long,
      permilles: Seq[Int],
      groupCols: Seq[String]): DataFrame = {
    require(binWidth >= 1, s"binWidth must be positive, got $binWidth")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    val spark = df.sparkSession
    import spark.implicits._
    // a constant pseudo-group keeps the grouped and global forms ONE
    // code path (the window just has a single partition value)
    val gcols = if (groupCols.nonEmpty) groupCols else Seq("__g")
    val base = if (groupCols.nonEmpty) df else df.withColumn("__g", lit(0L))
    val bins = base
      // NULLs are not values: unfiltered they'd form a bin that sorts
      // first, inflating every cumulative count and dragging all
      // quantiles toward the minimum. fdiv (not double floor-div) keeps
      // bins exact past 2^53 (ns-epoch inputs); floor() BEFORE the long
      // cast keeps floor semantics for fractional inputs (a bare long
      // cast truncates toward zero: -0.5 would land in bin 0, not -1).
      // floor is exact here: it accepts LongType unchanged, so ns-epoch
      // longs never round-trip through double.
      .filter(col(valueCol).isNotNull)
      .select(gcols.map(col) :+
        graft.functions.ColumnOps.fdiv(floor(col(valueCol)).cast("long"), binWidth)
          .as("bin"): _*)
      .groupBy(gcols.map(col) :+ col("bin"): _*).agg(count(lit(1)).as("c"))
    val cum = bins.withColumn("cum",
      sum("c").over(Window.partitionBy(gcols.map(col): _*).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = bins.groupBy(gcols.map(col): _*).agg(sum("c").as("n"))
    val ps = permilles.map(_.toLong).toDF("permille")
    // null-safe join back to totals: a NULL-valued group (common in crawl
    // lang/source columns) must keep its quantile rows, matching the
    // window side where partitionBy groups NULL keys together
    val totalR = gcols.foldLeft(total)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val joinCond = gcols.map(c => col(c) <=> col(s"__t_$c")).reduce(_ && _)
    cum.join(broadcast(totalR), joinCond)
      .drop(gcols.map(c => s"__t_$c"): _*)
      .crossJoin(broadcast(ps))
      .filter(col("cum") * 1000L >= col("permille") * col("n"))
      .groupBy(gcols.map(col) :+ col("permille"): _*).agg(min("bin").as("qbin"))
      .select(gcols.map(col) ++ Seq(col("permille"),
        (col("qbin") * binWidth).as("q_lo"),
        ((col("qbin") + 1L) * binWidth - 1L).as("q_hi")): _*)
      .orderBy(gcols.map(col) :+ col("permille"): _*)
  }

  /** Distribution drift between two corpus snapshots — the PSI
    * (population stability index) monitor a crawl pipeline runs before
    * accepting a new batch: bin `valueCol` on both sides, compare the
    * per-bin shares, and score each bin's contribution
    * `(pA − pB)·ln(pA/pB)` in micro-units. Add-one smoothing on the bin
    * counts keeps one-sided bins finite (the standard epsilon rule,
    * made exact-integer so both engines agree); `Σ psi_micro` over the
    * output is the classic PSI × 1e6, with the usual 0.1/0.25
    * watch/act thresholds at 100000/250000.
    *
    * Scale: one count aggregation per side (map-side combined), a
    * bins-sized full outer join, totals as 1-row broadcasts — the
    * corpora stream once and never shuffle rows.
    */
  def distributionDrift(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be positive, got $binWidth")
    def bins(df: DataFrame, as: String) = df
      .filter(col(valueCol).isNotNull)
      .select(graft.functions.ColumnOps
        .fdiv(floor(col(valueCol)).cast("long"), binWidth).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    val joined = bins(a, "n_a").join(bins(b, "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // add-one smoothing BEFORE the totals so shares still sum to 1.
    // The bins table feeds BOTH the output projection and the totals
    // aggregate — without the (tiny, bins-sized) checkpoint each
    // consumer re-derives it from scratch and the corpora are scanned
    // 4× instead of 2× (verified in the physical plan); callers free
    // the blocks with Dedup.releaseCheckpoints like every
    // checkpointing operator here
    val sm = joined.select(col("bin"), col("n_a"), col("n_b"),
      (col("n_a") + 1L).as("sa"), (col("n_b") + 1L).as("sb"))
      .localCheckpoint()
    val tot = sm.agg(sum("sa").as("ta"), sum("sb").as("tb"))
    sm.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        graft.functions.ColumnOps
          .fdivCol(lit(1000000L).cast("decimal(38,0)") * col("sa"), col("ta"))
          .as("share_a_micro"),
        graft.functions.ColumnOps
          .fdivCol(lit(1000000L).cast("decimal(38,0)") * col("sb"), col("tb"))
          .as("share_b_micro"),
        // both engines derive the double from the SAME exact integers
        // ((sa, ta, sb, tb) are counts) with the SAME operation order —
        // the q_pmi discipline: IEEE log is not correctly-rounded, so a
        // last-ulp engine difference could in principle flip a value
        // sitting exactly on the rounding boundary; same-order
        // evaluation over identical integer inputs is the accepted
        // (and, for PMI, driver-proven) mitigation
        round(
          ((col("sa").cast("double") / col("ta").cast("double")) -
            (col("sb").cast("double") / col("tb").cast("double"))) *
            log((col("sa").cast("double") * col("tb").cast("double")) /
              (col("sb").cast("double") * col("ta").cast("double"))) * 1e6)
          .cast("long").as("psi_micro"))
  }

  /** Dynamic per-group quality gate: keep rows whose `valueCol` reaches
    * their OWN group's `permille` quantile bin — Gopher-style
    * per-language length thresholds derived from the corpus itself
    * instead of hand-set constants (a threshold tuned for English
    * deletes half of Chinese; per-group quantiles self-calibrate).
    * The cut is the quantile bin's LOWER bound ([[histogramQuantiles]]'
    * `q_lo`), so the gate is exact-integer and engine-portable.
    *
    * Rows with a NULL value fail the gate (nothing to compare — same
    * rule as the quantile stats, which exclude them from bins).
    *
    * Scale: one mergeable-bin stats pass over the corpus, then the
    * hundreds-of-rows threshold table broadcasts back onto the scan —
    * the corpus never shuffles.
    */
  def quantileGate(
      df: DataFrame,
      valueCol: String,
      binWidth: Long,
      permille: Int,
      groupCols: Seq[String]): DataFrame = {
    require(!df.columns.contains("__thr"),
      "quantileGate reserves the working column name '__thr'")
    // the renamed broadcast threshold columns use the same reserved
    // namespace — a caller column literally named '__t_<groupCol>' would
    // otherwise produce an ambiguous-reference failure mid-join
    groupCols.foreach(c => require(!df.columns.contains(s"__t_$c"),
      s"quantileGate reserves the working column name '__t_$c'"))
    val thr = histogramQuantiles(df, valueCol, binWidth, Seq(permille), groupCols)
      .select(groupCols.map(col) :+ col("q_lo").as("__thr"): _*)
    val renamed = groupCols.foldLeft(thr)(
      (d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val joinCond = groupCols.map(c => col(c) <=> col(s"__t_$c")).reduce(_ && _)
    df.join(broadcast(renamed), joinCond)
      .filter(col(valueCol) >= col("__thr"))
      .drop(groupCols.map(c => s"__t_$c") :+ "__thr": _*)
  }

  /** Quasi-identifier combinations shared by fewer than `k` rows — the
    * k-anonymity audit a governed training corpus runs before release:
    * any surviving combo is a potential re-identification handle. One
    * hash aggregation on the quasi columns, then a count filter; the
    * output is the (tiny) violation list, never the data.
    */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 to be a constraint, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Declarative data-quality report: each rule is `(name, predicate a
    * GOOD row satisfies)`; a null predicate result counts as a violation
    * (unknown is not good). ALL rules evaluate in ONE scan — one
    * conditional sum per rule inside a single aggregate — so a 50-rule
    * suite over 100 TB costs exactly one pass, not 50. Output is the
    * long-format `(rule, n_rows, n_violations)` audit table.
    */
  def dqReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "dqReport needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col("__n").as("n_rows"),
          col(s"__v$i").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"))
  }

  /** CDC snapshot apply — the lakehouse MERGE shape: fold a changelog of
    * `upsert` / `delete` rows into a base snapshot. `changes` carries the
    * base columns plus `opCol` and `seqCol`; the highest `seqCol` wins
    * per key (callers must make it unique per key — a change stream's
    * offset/LSN is), deletes drop the key, upserts replace or insert.
    *
    * Plan shape: one window over the CHANGELOG (change-sized, not
    * table-sized), one anti-join of base against the touched keys, one
    * union — base rows that aren't touched stream through untouched,
    * which is what makes incremental maintenance of a 100 TB snapshot
    * cheaper than rebuilding it.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    // null-safe anti-join: a NULL-keyed changelog row must still claim the
    // NULL-keyed base row (the window side already groups NULL keys
    // together — <=> keeps both halves of the operator consistent)
    val touched = latest.select(keyCols.map(c => col(c).as(s"__k_$c")): _*)
    val antiCond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    val untouched = base.join(touched, antiCond, "left_anti")
    // anything not literally 'delete' re-inserts as an upsert — a NULL
    // or misspelled op must NOT silently delete the key (the anti-join
    // above already removed the base row; dropping the change row too
    // would be indistinguishable from an intentional delete)
    untouched.unionByName(
      latest.filter(coalesce(col(opCol) =!= "delete", lit(true)))
        .drop("_rn", opCol, seqCol))
  }

  /** Count-min sketch over a key column: `d` hash rows × `w` buckets of
    * EXACT counter sums — the mergeable fixed-size summary for "how
    * often does any key occur" over a stream too big to count exactly.
    * Mergeability is the scale point: sketches of two corpus shards add
    * cell-wise (they're just counts), so a 1000-executor pipeline folds
    * per-shard sketches into one d×w table no matter the data size.
    *
    * Deterministic: rows are [[PortableHash.mix]] seeds over the
    * portable base hash, so the sketch — and any estimate read from it —
    * replays exactly in the DuckDB oracle. Estimates carry the standard
    * CMS guarantee (overestimate only, ε ≈ e/w at δ ≈ e^-d).
    */
  def countMinSketch(
      df: DataFrame,
      keyCol: String,
      w: Int = 256,
      d: Int = 4): DataFrame = {
    require(w >= 1 && d >= 1, s"bad sketch shape: $w x $d")
    df.select(PortableHash.h28(col(keyCol)).as("h"))
      .select(posexplode(array((0 until d).map(r =>
        pmod(PortableHash.mix(col("h"), r), lit(w.toLong))): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimate for `keys` against a [[countMinSketch]]: min over
    * the key's `d` cells (absent cell = 0). The sketch side is d×w rows
    * — always broadcastable.
    */
  def cmsEstimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      w: Int = 256,
      d: Int = 4): DataFrame =
    keys.select(col(keyCol), PortableHash.h28(col(keyCol)).as("h"))
      .select(col(keyCol), posexplode(array((0 until d).map(r =>
        pmod(PortableHash.mix(col("h"), r), lit(w.toLong))): _*))
        .as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Crawl-frontier URL hygiene in one operator: canonicalize (lowercase
    * scheme+host, strip fragment, strip tracking params, drop default
    * ports, trim trailing slash), drop blocklisted hosts (broadcast
    * anti-join — the robots/spam list), and keep ONE doc per canonical
    * URL (lowest doc_id wins — crawl-order dedup).
    *
    * Canonicalization is pure sequenced regex rewrites (RE2-safe, so the
    * oracle replays them identically); the dedup is one shuffle keyed on
    * the canonical URL; the blocklist is a broadcast anti-join, never a
    * filter scan per pattern.
    */
  def canonicalizeUrls(
      df: DataFrame,
      blockedHosts: DataFrame,
      urlCol: String = "url"): DataFrame = {
    // Schemeless input (crawl frontiers carry plenty) gets a scheme
    // BEFORE canonicalization — otherwise both extraction regexes fail
    // and every schemeless URL collapses to the same empty canonical
    // string (silent corpus-wide data loss).
    val u0 = when(col(urlCol).contains("://"), col(urlCol))
      .otherwise(concat(lit("http://"), col(urlCol)))
    val canon =
      // order matters; each step feeds the next. Tracking params strip in
      // three forms so the '?' survives when real params follow: interior
      // '&p=v' first, then a leading '?p=v&' (keeping '?'), then a sole
      // '?p=v'. Default ports strip scheme-AWARE and anchored to the
      // authority (':80' is only default for http, ':443' for https; a
      // global ':80/' rewrite would also mangle path/query content).
      Seq[Column => Column](
        u => regexp_replace(u, "#.*$", ""),                 // fragment
        u => regexp_replace(u, "&(utm_[a-z]+|ref|fbclid)=[^&#]*", ""),
        u => regexp_replace(u, "\\?(utm_[a-z]+|ref|fbclid)=[^&#]*&", "?"),
        u => regexp_replace(u, "\\?(utm_[a-z]+|ref|fbclid)=[^&#]*$", ""),
        u => regexp_replace(u, "\\?$", ""),                 // bare '?'
        u => regexp_replace(u, "^(http://[^/:]+):80(/|$)", "$1$2"),
        u => regexp_replace(u, "^(https://[^/:]+):443(/|$)", "$1$2"),
        u => regexp_replace(u, "/$", "")                    // trailing slash
      ).foldLeft[Column](
        // lowercase scheme+host only: split at the first path slash
        concat(
          lower(regexp_extract(u0, "^[^/]*//[^/]*", 0)),
          regexp_extract(u0, "^[^/]*//[^/]*(.*)$", 1))
      )((acc, f) => f(acc))
    val withCanon = df
      .withColumn("canonical_url", canon)
      .withColumn("host",
        regexp_extract(col("canonical_url"), "^[a-z]+://([^/:]+)", 1))
    withCanon
      .join(broadcast(blockedHosts), Seq("host"), "left_anti")
      .groupBy("canonical_url")
      .agg(
        min(col("doc_id")).as("doc_id"),
        // host is a pure function of canonical_url; min = deterministic
        // spelling of "the" host in any engine
        min(col("host")).as("host"),
        count(lit(1)).as("n_dupes"))
  }

  def mixturePlan(
      df: DataFrame,
      budgetTokens: Long,
      alpha: Double = 0.3,
      groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val t = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        // coalesce: NULL text counts as empty (the repo-wide NULL-text
        // parity rule) — an all-NULL group would otherwise emit NULL
        // weights AND silently shift every other group's share
        sum(size(split(coalesce(col(textCol), lit("")), " ")).cast("long"))
          .as("tokens"))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        round(pow(col("tokens"), alpha) * 1e6).cast("long").as("pw"))
    val tot = t.agg(
      sum("tokens").as("tok_total"), sum("pw").as("pw_total"))
    t.crossJoin(broadcast(tot))
      .select(
        col(groupCol), col("n_docs"), col("tokens"),
        // decimal BEFORE the multiply: 1e6 * tokens as Long*Long passes
        // Long.MaxValue at ~9.2e12 tokens — a 100 TB corpus is ~25e12,
        // so the design-point input would die on ANSI overflow (fdivCol's
        // decimal cast happens only after the product)
        graft.functions.ColumnOps
          .fdivCol(lit(1000000L).cast("decimal(38,0)") * col("tokens"),
            col("tok_total"))
          .as("share_micro"),
        graft.functions.ColumnOps
          .fdivCol(lit(1000000L).cast("decimal(38,0)") * col("pw"),
            col("pw_total"))
          .as("weight_micro"))
      .withColumn("epochs",
        round(col("weight_micro") / 1e6 * budgetTokens / col("tokens"), 6))
  }

  /** APPLY step of [[mixturePlan]]: down-sample each group to its
    * planned token share by deterministic key-hash sampling (the
    * [[Sampling.sampleByHash]] rule, so any engine draws the same
    * rows). A group's keep rate is its planned tokens over its actual
    * tokens, in exact-integer permille (capped at 1000 — groups the
    * temperature weighting would UPSAMPLE keep everything; epoch
    * multiplicity is a training-loader concern, not a corpus filter).
    *
    * Scale: the plan is a groups-sized broadcast back onto the scan
    * (null-safe on the group key — crawl `lang` columns have NULLs);
    * the corpus streams once through a codegen'd hash filter. No
    * shuffle of corpus rows at all.
    */
  def applyMixture(
      df: DataFrame,
      budgetTokens: Long,
      alpha: Double = 0.3,
      groupCol: String = "lang",
      textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    require(!df.columns.contains(s"__t_$groupCol") &&
      !df.columns.contains("__keep_pm"),
      s"applyMixture reserves '__t_$groupCol' and '__keep_pm'")
    val plan = mixturePlan(df, budgetTokens, alpha, groupCol, textCol)
      .select(col(groupCol).as(s"__t_$groupCol"),
        least(lit(1000L), graft.functions.ColumnOps.fdivCol(
          lit(1000L).cast("decimal(38,0)") * col("weight_micro") * lit(budgetTokens),
          lit(1000000L).cast("decimal(38,0)") * col("tokens")))
          .as("__keep_pm"))
    df.join(broadcast(plan), col(groupCol) <=> col(s"__t_$groupCol"))
      .filter(Sampling.bucket1000(Sampling.SampleSalt, keyCol) < col("__keep_pm"))
      .drop(s"__t_$groupCol", "__keep_pm")
  }

  /** Per-group heavy hitters: the top-`k` most frequent values of
    * `keyCol` within each `groupCol` group, as
    * `(groupCol, rank, key, cnt)`.
    *
    * `native = true` aggregates with [[graft.plans.HeavyHittersAgg]]
    * (mergeable Misra-Gries): ONE ≤`capacity`-entry summary per
    * partition per group crosses the shuffle — O(partitions × capacity)
    * wire volume, independent of how many distinct keys the corpus
    * holds, which is THE difference at 100 TB where `groupBy(key)`
    * ships every distinct token. In the exact regime (distinct keys per
    * group ≤ capacity) the summary is the exact count table, so both
    * paths return IDENTICAL rows (spec'd) and the oracle pins them; the
    * sub-capacity approximation guarantees (undercount ≤ N/(capacity+1),
    * no true heavy hitter missing) are spec'd separately.
    *
    * `native = false` is the exact `groupBy(group, key)` + rank window
    * twin — the portable path for sessions without the extensions.
    *
    * Ranking ties break by key ascending in BOTH paths (the aggregate's
    * eval sort and the window's ORDER BY are the same (cnt DESC, key
    * ASC) rule), so the output is deterministic.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      k: Int,
      capacity: Int = 4096,
      native: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    if (native) {
      df.groupBy(col(groupCol))
        .agg(call_function("graft_heavy_hitters",
          col(keyCol), lit(capacity)).as("__hh"))
        .select(col(groupCol), posexplode(col("__hh")).as(Seq("__pos", "__e")))
        .filter(col("__pos") < k)
        .select(col(groupCol), (col("__pos") + 1).cast("int").as("rank"),
          col("__e.key").as("key"), col("__e.cnt").as("cnt"))
    } else {
      val w = Window.partitionBy(groupCol)
        .orderBy(col("cnt").desc, col("key").asc)
      df.groupBy(col(groupCol), col(keyCol).as("key"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col(groupCol), col("rank"), col("key"), col("cnt"))
    }
  }

  /** Per-group quantiles from a MERGEABLE sketch — the bounded-memory
    * rank primitive completing the sketch family (HLL cardinality, CMS
    * frequency, KMV distinct-sample, Misra-Gries heavy hitters,
    * quantiles HERE).
    *
    * `native = true` aggregates with [[graft.plans.QuantileSketchAgg]]
    * (MRL/KLL compactor ladder, deterministic alternating offsets): ONE
    * bounded summary per partition per group crosses the shuffle —
    * O(partitions × capacity × log(N/capacity)) wire volume vs the
    * exact path's every-distinct-value, which is THE difference at
    * 100 TB. In the exact regime (values per group < capacity) no
    * compaction fires, the summary is the exact value multiset, and
    * both paths return IDENTICAL rows (spec'd; the oracle pins them);
    * past capacity the MRL rank-error bound is spec'd separately.
    *
    * `native = false` is the exact `groupBy(group, value)` + cumulative
    * window twin — the portable path for sessions without the
    * extensions.
    *
    * Quantile rule, shared by both paths and integer-exact: `p‰` is the
    * smallest value whose cumulative weight `cum` satisfies
    * `cum·1000 ≥ p·total` (the lower/discrete quantile — no
    * interpolation, so the result is always an observed value and the
    * rule replays verbatim in ANSI SQL). The windows run over the
    * summary table (≤ capacity·levels rows per group), not the corpus.
    *
    * Output: one row per group — `n_values` (total aggregated weight;
    * = exact count in the exact regime) and one `p{permille}` column
    * per requested quantile.
    */
  def quantileSketch(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      probsPermille: Seq[Int] = Seq(500, 900, 990),
      capacity: Int = 32768,
      native: Boolean = false): DataFrame = {
    require(probsPermille.nonEmpty, "need at least one quantile")
    require(probsPermille.forall(p => p > 0 && p <= 1000),
      s"quantiles are permille in (0, 1000], got $probsPermille")
    val summary =
      if (native)
        df.groupBy(col(groupCol))
          .agg(call_function("graft_quantile_sketch",
            col(valueCol).cast("long"), lit(capacity)).as("__qs"))
          .select(col(groupCol), explode(col("__qs")).as("__e"))
          .select(col(groupCol), col("__e.value").as("value"),
            col("__e.weight").as("weight"))
      else
        df.groupBy(col(groupCol), col(valueCol).cast("long").as("value"))
          .agg(count(lit(1)).as("weight"))
    val cumW = Window.partitionBy(groupCol).orderBy(col("value").asc)
    val allW = Window.partitionBy(groupCol)
    val ranked = summary
      .withColumn("cum", sum("weight").over(cumW))
      .withColumn("total", sum("weight").over(allW))
    ranked.groupBy(col(groupCol))
      .agg(
        max(col("total")).as("n_values"),
        probsPermille.map(p =>
          min(when(col("cum") * 1000 >= col("total") * p, col("value")))
            .as(s"p$p")): _*)
  }

  /** Per-group ROBUST outlier gate — median/MAD instead of mean/stddev,
    * the filter a quality pipeline wants when the contamination it is
    * hunting would corrupt a moment-based threshold (one 10M-token spam
    * doc moves a language's mean length; it cannot move the median).
    * A row is an outlier when
    *
    *   `1000 · |value − median| > cMilli · MAD`
    *
    * with median and MAD (the median absolute deviation,
    * `median(|value − median|)`) per `groupCol` under the sketch
    * family's integer-exact DISCRETE quantile rule (smallest observed
    * value with cum·1000 ≥ 500·total — see [[quantileSketch]]), so the
    * whole gate is integer arithmetic end to end and replays verbatim
    * in ANSI SQL. `cMilli` is the robust-z cutoff in milli-units
    * (3500 ≈ the classic 3.5·MAD rule, Iglewicz & Hoaglin's
    * recommendation up to the 1.4826 consistency constant, which a
    * threshold-only use can fold into c). A degenerate group
    * (MAD = 0: over half the mass on the median) flags every
    * off-median row — the inequality yields that with no special case.
    *
    * Scale shape: two grouped quantile passes (each `native = true` →
    * one bounded [[graft.plans.QuantileSketchAgg]] summary per
    * partition per group across the shuffle; `native = false` → the
    * exact distinct-value twin) and two broadcast joins of
    * group-cardinality tables back onto the rows — never a window over
    * the corpus, never a corpus-sized collect. In the exact regime the
    * two paths return identical rows (the [[quantileSketch]]
    * guarantee), which is what lets one oracle pin both.
    *
    * Output: the OUTLIER rows only — `df`'s columns plus `med`, `mad`,
    * `dev` (= |value − median|).
    */
  def robustOutliers(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      cMilli: Long = 3500L,
      capacity: Int = 32768,
      native: Boolean = false): DataFrame = {
    require(cMilli >= 0, s"cMilli must be non-negative, got $cMilli")
    val med = quantileSketch(df.select(col(groupCol), col(valueCol)),
      valueCol, groupCol, probsPermille = Seq(500),
      capacity = capacity, native = native)
      .select(col(groupCol), col("p500").as("med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col(valueCol).cast("long") - col("med")))
    val mad = quantileSketch(withDev.select(col(groupCol), col("dev")),
      "dev", groupCol, probsPermille = Seq(500),
      capacity = capacity, native = native)
      .select(col(groupCol), col("p500").as("mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .filter(col("dev") * 1000 > lit(cMilli) * col("mad"))
  }
}
