package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bulk-synchronous graph analytics over edge lists — the Pregel-on-
  * DataFrames shape: one shuffle-keyed join per superstep, no driver
  * loops over data, state materialized between supersteps.
  */
object Graph {

  /** Co-purchase edge list from an order-lines table: parts are linked
    * when some order contains both. Both directions are emitted (the
    * graph is undirected), deduplicated to simple edges.
    *
    * Plan shape: a self-join ON THE ORDER KEY — fan-out is Σ_order
    * lines², bounded by per-order basket size (TPC-H ≤ 7), never by
    * catalog size — then a distinct over CANONICAL (src < dst) pairs
    * only, with the reverse direction re-derived by a free narrow swap
    * afterward: deduplicating one orientation halves the rows through
    * the distinct exchange, the dominant shuffle of the whole build. At
    * 100 TB both shuffles are on uniformly distributed keys; a
    * pathological mega-basket would need a per-order line cap upstream.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(
      col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val canon = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
  }


  /** PageRank with a FIXED iteration count, entirely in integer
    * micro-units — every engine and partitioning produces bit-identical
    * ranks, so the whole iterative computation is DuckDB-replayable
    * (unrolled CTEs) for the correctness gate:
    *
    *   contrib(e: u→v) = rank_u // outdeg_u
    *   rank'_v = (1e6 − d) + (d · Σ contrib) // 1e6,   d = 850000
    *
    * Floor-division error is < 1 micro-unit per term — irrelevant for
    * ranking, decisive for determinism (float PageRank differs by
    * partition-sum order).
    *
    * Scale shape: each superstep is ONE join keyed on `src` (edges ⋈
    * ranks; outdeg pre-joined once) and ONE aggregation keyed on `dst`
    * — the canonical Pregel message pattern. Edges and degrees are
    * checkpoint-pinned once and reused every superstep ([[Dedup
    * .duplicateGroups]]'s measured pattern); each superstep's ranks are
    * pinned and the previous generation released, keeping block-manager
    * footprint at O(nodes), not O(nodes × iterations). Dangling mass is
    * not redistributed (nodes with no inbound sit at 150000) — fine for
    * relative ranking, documented divergence from normalized PageRank.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 3,
      dampingMicro: Long = 850000L): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(dampingMicro > 0 && dampingMicro < 1000000L,
      s"dampingMicro must be in (0, 1e6), got $dampingMicro")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    var rank = nodes.withColumn("rank_micro", lit(1000000L))
    // only PINNED generations may be released — rank₀'s plan reaches into
    // nodes' checkpoint, which later supersteps still need
    var pinned: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          graft.functions.ColumnOps.fdivCol(col("rank_micro"), col("outdeg"))
            .as("contrib"))
        .groupBy("node")
        .agg(sum("contrib").as("in_sum"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1000000L - dampingMicro) +
            graft.functions.ColumnOps.fdiv(
              // decimal BEFORE the multiply: damping * in_sum as Long*Long
              // overflows once a hub holds ~1e13 micro-units of in-mass
              // (~1% of a 1e9-node graph) — ANSI would kill the job on
              // exactly the graphs the 100 TB path exists for
              lit(dampingMicro).cast("decimal(38,0)") *
                coalesce(col("in_sum"), lit(0L)),
              1000000L)).as("rank_micro"))
        .localCheckpoint()
      // previous generation's blocks are dead once the new one is pinned
      pinned.foreach(Dedup.releaseCheckpoints)
      pinned = Some(rank)
    }
    // the returned frame is its own (final) checkpoint; the graph pins are dead
    Seq(e, withDeg, nodes).foreach(Dedup.releaseCheckpoints)
    rank
  }

  /** Exact triangle count over an undirected edge list, with the
    * standard hub cap: vertices above `maxDegree` are dropped first
    * (a single degree-1000 hub alone contributes ~half a million
    * wedges — capping is what keeps the join volume Σ deg² bounded at
    * scale; set 0 to disable). Edges are canonicalized to `a < b`, so
    * each triangle is counted exactly once as the ordered path
    * `a < b < c` closed by the `(a, c)` edge — two joins over the
    * capped edge list, no explosion beyond wedge count.
    */
  def triangleCount(edges: DataFrame, maxDegree: Long = 0L): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val kept = if (maxDegree > 0) {
      val ok = canon.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .filter(col("d") <= maxDegree).select("v")
      canon
        .join(ok.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(ok.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
    } else canon
    // pin once: the edge list feeds three consumers (two join sides and
    // the edge count) — without the checkpoint the degree-cap pipeline
    // would recompute per consumer
    val pinned = kept.localCheckpoint()
    val wedges = pinned.as("e1")
      .join(pinned.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e2.b").as("z"))
    val tris = wedges
      .join(pinned.select(col("a").as("x"), col("b").as("z")),
        Seq("x", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    pinned.agg(count(lit(1)).as("n_edges")).crossJoin(tris)
  }
}
