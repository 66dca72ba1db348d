package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming embedding operators: the continuous-ingest twins of the
  * batch semantic-dedup family ([[graft.ops.Dedup]]), for the
  * "embeddings arrive as a feed" deployment (an embedding service
  * publishing vectors for freshly crawled documents).
  */
object EmbedStreamOps {

  /** Streaming incremental SEMANTIC dedup — the continuous form of
    * [[graft.ops.Dedup.dropSemanticDuplicatesIncremental]]: vectors
    * stream in, and any vector whose cosine against a corpus-index
    * member sharing a probed cell reaches `threshold` is dropped.
    *
    * Mid-stream, neither window functions nor aggregations are
    * available, so the two stages are re-expressed stream-natively:
    *
    *   1. CELL PROBING is a PURE PROJECTION: the codebook is collected
    *      to a driver-side literal (k rows of `(cell_id, cv, cn)` — the
    *      shipped-tokenizer pattern; a codebook is broadcast-sized by
    *      construction), and each row's top-`nProbe` cells come from
    *      `array_sort` over the k scored structs — bit-identical
    *      ordering to [[Similarity.ivfAssignProbe]]'s
    *      (cosine DESC, cell_id ASC) window rule.
    *   2. THE DROP DECISION is a chain of `nProbe` stream-static LEFT
    *      ANTI equi-joins on cell_id (threshold as residual condition):
    *      a vector survives iff probe 1's cell holds no match AND …
    *      AND probe P's cell holds no match — exactly the batch rule,
    *      cross-side pairs only, no state, no watermark.
    *
    * `corpusIndex` must be the MULTI-PROBE assignment of the corpus
    * under the SAME codebook (`Similarity.ivfAssignProbe(corpus, k,
    * nProbe, Some(codebook))`) — with both sides probed, a pair meets
    * iff their probe sets intersect, which is the batch twin's decision
    * (spec'd equal on batch input). The bucket cap is an OFFLINE index
    * concern here (cap when building/refreshing the index); the
    * per-micro-batch side has no global view to cap against.
    *
    * Works identically on batch input (the whole pipeline is
    * deterministic projections + joins), which is what the driver
    * oracle checks; the streaming spec runs the same decision through
    * a MemoryStream.
    */
  def semanticDedupStream(
      vecs: DataFrame,
      corpusIndex: DataFrame,
      codebook: DataFrame,
      threshold: Double,
      nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val native = graft.plans.GraftExtensions.available(vecs.sparkSession)
    // driver-side codebook literal: k rows, sorted for determinism
    val cb = codebook.select("cell_id", "cv", "cn").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    require(cb.nonEmpty, "codebook is empty")
    require(nProbe <= cb.length,
      s"nProbe=$nProbe exceeds codebook size ${cb.length}")
    // scored struct per codeword: (-cosine, cell_id) so the ascending
    // array_sort yields (cosine DESC, cell_id ASC) — the ivfAssignProbe
    // window order
    def scored(qv: Column, qn: Column): Column = array(cb.map {
      case (id, cv, cn) =>
        struct(
          (-Similarity.qcosinePre(
            Similarity.qdot(qv, typedlit(cv), native), qn, lit(cn))).as("ns"),
          lit(id).as("cell_id"))
    }: _*)
    val in = vecs
      .withColumn("_qv", Similarity.quantize(col("embedding")))
      .withColumn("_qn", Similarity.qdot(col("_qv"), col("_qv"), native))
      .withColumn("_probes",
        slice(array_sort(scored(col("_qv"), col("_qn"))), 1, nProbe))
    val out = (0 until nProbe).foldLeft(in) { (cur, p) =>
      val idx = corpusIndex.select(
        col("cell_id").as(s"_c$p"),
        col("qv").as(s"_iqv$p"), col("qn").as(s"_iqn$p"))
      cur.join(idx,
        element_at(col("_probes"), p + 1)("cell_id") === col(s"_c$p") &&
          Similarity.qcosinePre(
            Similarity.qdot(col("_qv"), col(s"_iqv$p"), native),
            col("_qn"), col(s"_iqn$p")) >= threshold,
        "left_anti")
    }
    out.drop("_probes", "_qv", "_qn")
  }

  /** STREAMING ANN serving over a persisted [[Similarity.writeIvfIndex]]
    * layout — the query-side twin of [[semanticDedupStream]]: queries
    * arrive as a (micro-batch) stream and probe the cell-partitioned
    * index, answer ≡ [[Similarity.searchIvfIndex]] on the same layout
    * and parameters (same hier probes, same exact cosine, same ranking;
    * spec'd equal, and the declared `q_sim_ivf_stream` replays it
    * against the very oracle that pins the batch paths).
    *
    * Mid-stream there is no window, no aggregation, and no per-batch
    * driver collect, so every stage is re-expressed stream-natively:
    *
    *   1. HIER PROBING is a PURE PROJECTION: the persisted codebook is
    *      read ONCE at plan time; the fine→coarse group map is computed
    *      with the exact [[Similarity.ivfAssignHierProbe]] expressions
    *      (a codebook-sized batch job) and collected to driver
    *      literals. Each query row scores the √k coarse entries in-row
    *      (array_sort ≡ the (cell_sim DESC, cell_id ASC) window rule),
    *      keeps `pCoarse` groups, then ranks only fine cells of probed
    *      groups — bit-identical probe cells to the batch hier chain.
    *   2. CANDIDATES are `nProbe` stream-static LEFT equi-joins against
    *      the index grouped into per-cell member ARRAYS (a probe that
    *      matched no cell contributes nothing). A stream cannot turn
    *      its probes into partition-filter literals the way the batch
    *      search does — the serving deployment instead keeps the
    *      cell-array table cached (it IS the in-memory ANN index); at
    *      `targetPerCell` sizing each row carries a bounded member
    *      list, so the per-row work is O(nProbe × cellCap).
    *   3. TOP-K is an IN-ROW array sort over the concatenated
    *      candidates ((sim DESC, cand_id ASC) via the negated-sim
    *      struct trick), sliced to `k` and posexploded to the
    *      (query_id, cand_id, sim, rank) contract.
    */
  /** The persisted [[Similarity.writeIvfIndex]] layout regrouped as
    * per-cell member ARRAYS — the serving-side in-memory ANN index
    * [[searchIvfIndexStream]] equi-joins each micro-batch against. A
    * deployment loads this ONCE, pins it (persist/localCheckpoint), and
    * passes it to every serving plan: the static side of a
    * stream-static join is otherwise RE-READ at each micro-batch's
    * re-plan — a corpus-sized parquet scan + regroup PER BATCH.
    * [[EmbedStreamOpsSpec]] proves a pinned serving index leaves ZERO
    * file scans of `indexDir` in any micro-batch's executed plan (the
    * one materializing scan happens at pin time), with answers
    * unchanged.
    */
  def loadServingIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/index")
      .withColumn("cell_id", col("cell_id").cast("long"))
      .groupBy("cell_id")
      .agg(collect_list(struct(col("vec_id"), col("qv"), col("qn")))
        .as("members"))

  def searchIvfIndexStream(
      queries: DataFrame,
      indexDir: String,
      k: Int,
      nProbe: Int = 2,
      pCoarse: Int = 2,
      servingIndex: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(pCoarse >= 1, s"pCoarse must be >= 1, got $pCoarse")
    val spark = queries.sparkSession
    val native = graft.plans.GraftExtensions.available(spark)
    import org.apache.spark.sql.expressions.Window
    val book = spark.read.parquet(s"$indexDir/codebook")
    // the BUILD-TIME cell count from the layout's meta (not
    // `book.count()`: a trained hier codebook's row count can exceed
    // the build k, and ceil(sqrt(·)) of the two can differ — the batch
    // search derives its grouping from the same recorded value)
    val coarseCount = math.ceil(math.sqrt(math.max(1,
      Similarity.readIndexCells(spark, indexDir)).toDouble)).toInt
    // fine→coarse map, computed with ivfAssignHierProbe's own
    // expressions over the codebook (k rows — plan-time, not per batch)
    val coarseDf = book
      .withColumn("_r", row_number().over(Window.orderBy(asc("cell_id"))))
      .filter(col("_r") <= coarseCount)
      .select(col("cell_id").as("coarse_id"),
        col("cv").as("ccv"), col("cn").as("ccn"))
    val fineMap = book.select("cell_id", "cv", "cn")
      .join(broadcast(coarseDf))
      .withColumn("_cs", Similarity.qcosinePre(
        Similarity.qdot(col("cv"), col("ccv"), native), col("cn"), col("ccn")))
      .groupBy("cell_id")
      .agg(
        max_by(col("coarse_id"),
          struct(col("_cs"), (-col("coarse_id")).as("tb"))).as("coarse_id"),
        first("cv").as("cv"), first("cn").as("cn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
      .sortBy(_._1)
    require(fineMap.nonEmpty, "persisted codebook is empty")
    val coarseRows = coarseDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // (-cosine, id) structs: ascending array_sort = the hier probe's
    // (cell_sim DESC, cell_id ASC) window order
    def negScored(qv: Column, qn: Column,
        rows: Seq[(Long, Seq[Long], Long)]): Column = array(rows.map {
      case (id, cv, cn) =>
        struct(
          (-Similarity.qcosinePre(
            Similarity.qdot(qv, typedlit(cv), native), qn, lit(cn))).as("ns"),
          lit(id).as("cid"))
    }: _*)
    // fine entries NESTED per coarse group as ONE map literal — the
    // probed-group lookup selects a group's cells BEFORE any cosine is
    // built, so per-row scoring is O(pCoarse·√k·dim) (only probed
    // groups' fine cells), not O(k·dim), and the plan carries a single
    // literal node instead of k cosine subtrees (the expression tree no
    // longer grows with the codebook)
    val fineByGroup: Map[Long, Seq[(Long, Seq[Long], Long)]] =
      fineMap.groupBy(_._2).map { case (g, rows) =>
        g -> rows.map(r => (r._1, r._3, r._4)).toSeq
      }
    val groupMap = typedlit(fineByGroup)
    val emptyGroup =
      array().cast("array<struct<_1:bigint,_2:array<bigint>,_3:bigint>>")
    val in = queries
      .withColumn("_qv", Similarity.quantize(col("embedding")))
      .withColumn("_qn", Similarity.qdot(col("_qv"), col("_qv"), native))
      .withColumn("_pg",
        transform(
          slice(array_sort(negScored(col("_qv"), col("_qn"), coarseRows)),
            1, pCoarse),
          p => p("cid")))
      .withColumn("_pc",
        slice(
          array_sort(transform(
            flatten(transform(col("_pg"), g =>
              coalesce(element_at(groupMap, g), emptyGroup))),
            f => struct(
              (-Similarity.qcosinePre(
                Similarity.qdot(col("_qv"), f("_2"), native),
                col("_qn"), f("_3"))).as("ns"),
              f("_1").as("cid")))),
          1, nProbe))
    // static side: the persisted layout as per-cell member arrays — the
    // in-memory serving index (member order is irrelevant: the final
    // ranking re-sorts by (sim, cand_id))
    val memberType = "array<struct<vec_id:bigint,qv:array<bigint>,qn:bigint>>"
    val cellsArr = servingIndex.getOrElse(loadServingIndex(spark, indexDir))
    val joined = (0 until nProbe).foldLeft(in) { (cur, p) =>
      cur.join(
        cellsArr.select(col("cell_id").as(s"_c$p"),
          col("members").as(s"_m$p")),
        element_at(col("_pc"), p + 1)("cid") === col(s"_c$p"), "left")
    }
    val allMembers = concat((0 until nProbe).map(p =>
      coalesce(col(s"_m$p"), array().cast(memberType))): _*)
    joined
      .withColumn("_top",
        slice(
          array_sort(transform(
            filter(allMembers, m => m("vec_id") =!= col("vec_id")),
            m => struct(
              (-Similarity.qcosinePre(
                Similarity.qdot(col("_qv"), m("qv"), native),
                col("_qn"), m("qn"))).as("ns"),
              m("vec_id").as("cand_id")))),
          1, k))
      .select(col("vec_id").as("query_id"), posexplode(col("_top")))
      .select(
        col("query_id"),
        col("col")("cand_id").as("cand_id"),
        (-col("col")("ns")).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
