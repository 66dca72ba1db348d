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
}
