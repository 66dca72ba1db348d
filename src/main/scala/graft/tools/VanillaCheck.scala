package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the public entry points from a PLAIN SparkSession — no graft
  * extensions, no nanosAsLong, default shuffle partitions — to prove the
  * harness smoke path (which constructs its own session) works: the
  * events loader self-configures and every op falls back to built-in
  * formulations when the native expressions aren't registered.
  */
object VanillaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"VANILLA entry rows: $n")
    require(n > 0, "entry must return rows")
    for (q <- Seq("q_sim_topk", "q_dedup_simhash", "q_dedup_minhash",
      "q_sim_ivf", "q_sim_ivf_trained", "q_asof_join", "q_range_join",
      "q_decontaminate_bloom", "q_char_entropy", "q_fingerprint",
      "q_text_tokens", "q_tokenize_greedy", "q_tokenize_viterbi",
      // exercises FuzzyMatch.ensureRegistered: the edit-similarity
      // expressions must self-register into a plain session's registry
      "q_fuzzy_join", "q_text_nfc", "q_dedup_nfc",
      // exact-groupBy fallback for the MG heavy-hitters aggregate and
      // map-literal fallback for the NB serving projections
      "q_heavy_hitters", "q_quality_nb_stream", "q_langid_nb_stream",
      // exact cumulative-window fallback for the compactor quantile
      // sketch, alone and under the CCNet tercile split; map-literal
      // fallback for the LM serving projection
      "q_quantile_sketch", "q_ppl_buckets", "q_ppl_serving",
      "q_ppl_persist", "q_ppl_buckets_serve",
      // round-15 third wave: the graft_top_k sample and the sketch-
      // routed MAD gate must fall back on a plain session
      "q_weighted_sample_strat", "q_outlier_mad_sketch")) {
      val c = graft.SparkEntry.allQueries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"VANILLA $q rows: $c (fallback path)")
      require(c > 0, s"$q must return rows without extensions")
    }
    spark.stop()
  }
}
