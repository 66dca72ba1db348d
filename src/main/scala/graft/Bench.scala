package graft

object Bench {
  /** The benchmark query set — factored out so the checkpoint-hygiene spec
    * can execute exactly what the bench executes.
    */
  val headline: Seq[String] = Seq(
    "q_singer_pipeline", "q1_agg", "q_join_agg", "q_window", "q_topk",
    "q_windowed_counts", "q_sessionize", "q_attribution",
    "q_asof_join", "q_range_join",
    "q_dedup_exact", "q_dedup_apply", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_groups", "q_dedup_groups_contract",
    "q_decontaminate", "q_decontaminate_bloom",
    "q_pipeline_e2e",
    "q_embed_dups", "q_embed_dups_cell", "q_sim_topk", "q_sim_lsh", "q_sim_ivf",
    "q_sim_ivf_trained",
    "q_text_tokens", "q_text_quality", "q_text_langid", "q_text_redact",
    "q_top_ngrams", "q_text_chunk", "q_tokenize_greedy", "q_bpe_train",
    "q_bpe_encode", "q_split", "q_fingerprint",
    "q_corpus_stats",
    "q_multimodal_meta", "q_multimodal_features", "q_multimodal_frames",
    "q_multimodal_phash", "q_multimodal_decode", "q_multimodal_audio",
    "q_multimodal_resize_ppm",
    "q_zorder", "q_hist_quantile", "q_hybrid_rrf", "q_rand_proj",
    // the expensive tail: the slowest non-headline operators, gated here so
    // regressions in them are visible to the 2× check instead of anecdotal
    "q_pagerank", "q_triangles", "q_split_leakage", "q_dedup_incr_near",
    "q_overlap_spans", "q_seq_match",
    // round-8 additions: WAV container tier, snapshot-view fold, bigram LM,
    // exact-substring dedup apply
    "q_multimodal_wav", "q_snapshot_stream", "q_bigram_ppl", "q_strip_spans",
    // round-9 additions: corpus-proportional cell sizing (cellsFor) and
    // trained-codebook dedup blocking on the graded surface
    "q_embed_dups_cell_auto", "q_embed_dups_trained", "q_knn_graph_auto",
    // round-9 operators: fuzzy matching, trigram LM, CDC chunking,
    // encoding hygiene, quality-aware dedup apply
    "q_fuzzy_join", "q_jaro_pairs", "q_trigram_ppl", "q_cdc_chunks",
    "q_encoding_quality", "q_dedup_keep_best", "q_entity_resolve",
    "q_cdc_dedup", "q_multimodal_keep_best", "q_fuzzy_sorted",
    "q_quality_gate", "q_embed_recall", "q_embed_recall_probe2",
    // round-10: apply-path and fuzzy-blocking recall measurements,
    // batched BPE training at production merge counts, and the
    // streaming parquet-append parity path
    "q_semantic_apply_recall", "q_fuzzy_recall", "q_bpe_train_batched",
    "q_singer_stream_append", "q_bpe_encode_batched",
    // round-10 second wave: coreset prototypes, Unicode canonicalization
    "q_coreset_medoids", "q_text_nfc", "q_dedup_nfc",
    "q_contamination_pairs", "q_script_profile", "q_corpus_drift",
    "q_doc_clusters", "q_dup_histogram", "q_mixture_apply",
    "q_neardup_histogram", "q_singer_partitioned", "q_fuzzy_recall_w16",
    "q_fuzzy_recall_rev",
    // round-11: the probe cost/recall curve's third point; adaptive BPE
    // at production merge counts (645 merges / 32 jobs); the rarest-
    // q-gram fourth blocking pass (four-pass union recall 1000‰)
    "q_embed_recall_probe3", "q_bpe_train_adaptive", "q_fuzzy_recall_qgram",
    "q_bpe_encode_adaptive", "q_sim_ivf_auto", "q_embed_dups_trained_auto",
    "q_embed_recall_trained",
    // round-11 fourth wave: incremental semantic dedup (new batch vs the
    // pinned-codebook corpus index on the hier chain); trained PQ
    // sub-quantizers (per-subspace L2 Lloyd's + L2 encode)
    "q_dedup_incr_semantic", "q_sim_pq_trained", "q_embed_recall_probe5",
    "q_embed_recall_union", "q_dedup_incr_sem_stream",
    "q_sim_ivf_trained_auto", "q_sim_ivf_pq", "q_sim_ivf_pq_auto",
    "q_index_health", "q_index_health_trained",
    // round-11 sixth wave: persisted cell-partitioned IVF layout
    // (write-time assignment + partition-pruned probe reads), Viterbi
    // optimal-segmentation tokenizer (native DP twin of greedy)
    "q_sim_ivf_persisted", "q_tokenize_viterbi",
    // round-12: trap-vocab Viterbi-vs-greedy (per-doc + corpus gain),
    // weighted (trained unigram-LM) decoding, persisted-IVF SEARCH-ONLY
    // (cached layout), streaming ANN serving twin
    "q_tokenize_viterbi_trap", "q_tokenize_viterbi_gain",
    "q_tokenize_viterbi_weighted", "q_sim_ivf_search", "q_sim_ivf_stream",
    // incremental index maintenance: append under the persisted codebook,
    // then small-file compaction (the full lifecycle on the gate);
    // margin-based cross-corpus pair mining (the bitext criterion)
    "q_sim_ivf_append", "q_sim_ivf_compact", "q_sim_margin_pairs",
    // tokenizer evaluation: per-language fertility/compression table
    "q_tokenizer_fertility",
    // round-13: TextTiling semantic chunking (registered late — it
    // shipped r12 with oracle+spec but missed the gate surface);
    // cell-blocked corpus×corpus margin mining (shared hier codebook,
    // within-cell margins — the full-corpora bitext deployment shape);
    // production-vocab weighted Viterbi (BPE train → unigram-LM costs →
    // optimal re-decode, end to end); the BUG-4 merged-read close-out
    "q_semantic_chunks", "q_sim_margin_blocked",
    "q_tokenize_viterbi_vocab", "q_singer_schema_merge",
    // the index lifecycle's DELETE maintenance step (build + delete +
    // search — only touched cells rewrite)
    "q_sim_ivf_delete",
    // round-14: codebook RETRAIN migration (seeded build + trained
    // re-train + full re-assign + atomic multi-side swap + search);
    // PNG/JPEG/PPM/unknown header-tier triage (real magic-byte parsers)
    "q_sim_ivf_retrain", "q_multimodal_decode_png",
    // trained NB quality classifier (counting train + token-join score),
    // its multiclass char-bigram langid sibling (gram stream fanned
    // out by |C| classes, argmax per doc), and the serving half (cached
    // exported model, ONE codegen'd hash-lookup projection)
    "q_quality_nb", "q_langid_nb", "q_quality_nb_stream",
    "q_langid_nb_stream",
    // artifact persistence leg: read the parquet-shipped model + serve
    "q_quality_nb_persist",
    // mergeable Misra-Gries heavy hitters (custom TypedImperativeAggregate)
    "q_heavy_hitters",
    // mergeable MRL/KLL quantile sketch (custom TypedImperativeAggregate)
    "q_quantile_sketch",
    // CCNet head/middle/tail terciles (trigram LM + sketch thresholds)
    "q_ppl_buckets",
    // the remaining TPC-H shapes (fixture has no partsupp; each notes
    // its stand-in): correlated-min, profit rollup, share HAVING,
    // anti-join distinct count, nested-IN decorrelation
    "q2_min_cost_supplier", "q9_nation_profit", "q11_important_parts",
    "q16_supplier_cnt", "q20_part_promotion",
    // LM-filter serving leg: pruned Stupid-Backoff artifact, in-row
    // backoff chain (graft_lm_score), model cached per sf dir — plus
    // the parquet artifact-persistence leg (read + serve)
    "q_ppl_serving", "q_ppl_persist",
    // ColBERT MaxSim late-interaction retrieval (bit-packed sign masks)
    "q_late_interaction",
    // SQ8 scalar-quantized search (compressed-domain scan + exact rerank)
    "q_sim_sq8",
    // deployed CCNet filter: pruned LM + shipped thresholds, one
    // stateless projection
    "q_ppl_buckets_serve",
    // round-15: persisted BM25 postings index — build (tokenize/explode
    // + one (term,doc) shuffle + bucket-partitioned write) + pruned
    // search; and the maintenance lifecycle (half-build + delta-segment
    // append + compact + search) under the same oracle
    "q_bm25_persisted", "q_bm25_index_append",
    // GIF logical-screen + WebP VP8/VP8L/VP8X header triage (real
    // magic-byte parsers, the q_multimodal_decode_png pattern)
    "q_multimodal_decode_gif",
    // the exact-percentile dashboards routed through the mergeable
    // compactor sketch (one bounded summary per partition per group
    // crosses the shuffle) + the HLL-distinct scale profile
    "q_length_quantiles_sketch", "q_profile_sketch",
    // streaming late-interaction serving twin (build-once postings+
    // masks index, per-batch scoring — run as its batch twin)
    "q_late_interaction_stream",
    // BM25 index DELETE: tombstone segment + negative meta partials,
    // postings files untouched until compact (build + delete + search)
    "q_bm25_index_delete",
    // SEARCH-ONLY against the cached persisted BM25 layout (the
    // q_sim_ivf_search pattern: the gated number is serving latency)
    "q_bm25_search",
    // round-15 second wave: exact mergeable top-k aggregate (k-bounded
    // heap replaces the rank window, no per-partition sort)
    "q_top_ngrams_agg",
    // positional postings + phrase search (pruned position-list
    // intersection; build + search, the q_bm25_persisted shape)
    "q_bm25_phrase",
    // multi-query serving against the cached layout: ONE pruned scan of
    // the batch's term union serves three queries (serving latency row)
    "q_bm25_multi",
    // audio-container triage: FLAC/MP3(ID3)/OggVorbis/WAV header walks
    "q_multimodal_decode_audio",
    // persisted band index: increment decision against the cached
    // layout (sign batch + join stored bands + verify — the corpus
    // signing pass runs once per JVM per sf dir, like q_bm25_search)
    "q_dedup_index",
    // the band-index maintenance lifecycle: build + append + tombstone
    // delete + compact + increment
    "q_dedup_index_lifecycle",
    // IVF×SQ8: coarse cells bound candidates, per-dim scalar codes
    // bound bytes per candidate (FAISS IVF...,SQ8), exact rerank
    "q_sim_ivf_sq8",
    // round-15 third wave: impact-ordered pruned BM25 serving (each
    // term reads only its top-quota postings via a pushed imp_rank
    // predicate; df from the terms/ dictionary)
    "q_bm25_pruned",
    // exactly-once streaming index ingest (batch id rides in the
    // segment commit marker; build half + two file-source micro-batch
    // segments + search ≡ the full-corpus answer)
    "q_bm25_stream_ingest",
    // Jaccard top-k search over the cached persisted band index (the
    // layout's retrieval face; serving-side cost like q_bm25_search)
    "q_dedup_index_search",
    // TIFF (both byte orders, real IFD walk) + BMP (CORE/INFO) tiers
    "q_multimodal_decode_tiff",
    // per-stratum A-Res weighted sampling through the graft_top_k
    // mergeable heap (≤ k entries per partition per stratum shuffle)
    "q_weighted_sample_strat",
    // median/MAD robust outlier gate: exact path and the
    // compactor-sketch-routed scale form
    "q_outlier_mad", "q_outlier_mad_sketch",
    // round-15 fourth wave: streaming continuous-ingest dedup (decide →
    // tagged append → sink, exactly-once; two real file-source batches)
    "q_dedup_stream_ingest",
    // pruned multi-query serving (one impact-prefix scan of the batch's
    // term union) and the layout-derived index health row
    "q_bm25_pruned_multi", "q_bm25_index_health",
    // round-15 fifth wave: the persisted ColBERT (late-interaction)
    // index — build+search, search-only serving against the cached
    // layout, and the append/delete/compact lifecycle
    "q_colbert_persisted", "q_colbert_search", "q_colbert_lifecycle")

  /** Queries EXCLUDED from the sf1 (10×-data) checkpoint surface.
    * EMPTY since round 12: `q_embed_dups` — the one former member, the
    * deliberately quadratic didactic baseline (fixed label blocks, 39×-
    * class scaling measured at sf1) — now caps its declared input at
    * the sf0.1 slice (`vec_id < 2000`, a no-op at ≤ sf0.1), so no sf
    * dir can run it quadratic and it rejoined the sf1 surface as a
    * constant-size row. The mechanism stays for future didactic shapes.
    */
  val sf1Exclude: Set[String] = Set.empty

  /** First-seen gated time per query (sec, sf0.1, driver bench): the r1
    * value where the query was in the r1 bench, else the value from the
    * first round that gated it (r4/r5/r6/r7/r8 per BENCH_r*.json). The 2×
    * regression gate runs per query against THIS map, not just against the
    * grand total — r8's `q_sim_topk` slipped past the total-only gate.
    */
  val firstSeen: Map[String, Double] = Map(
    "ingest_full" -> 1.490, "q_singer_pipeline" -> 3.014, "q1_agg" -> 1.344,
    "q_join_agg" -> 0.748, "q_window" -> 0.849, "q_topk" -> 0.197,
    "q_windowed_counts" -> 0.581, "q_sessionize" -> 1.043,
    "q_dedup_exact" -> 1.306, "q_dedup_apply" -> 0.487,
    "q_dedup_minhash" -> 2.631, "q_dedup_simhash" -> 0.440,
    "q_dedup_groups" -> 3.982, "q_decontaminate" -> 1.007,
    "q_embed_dups" -> 1.021, "q_sim_topk" -> 0.555, "q_sim_lsh" -> 2.506,
    "q_text_tokens" -> 4.072, "q_text_quality" -> 0.647,
    "q_text_langid" -> 1.008, "q_fingerprint" -> 0.906,
    "q_corpus_stats" -> 0.294, "q_multimodal_meta" -> 0.224,
    "q_multimodal_features" -> 0.260, "q_multimodal_frames" -> 0.231,
    "q_attribution" -> 0.726, "q_asof_join" -> 1.261, "q_range_join" -> 1.604,
    "q_sim_ivf" -> 1.114,
    "q_sim_ivf_trained" -> 2.465, "q_text_redact" -> 0.912,
    "q_top_ngrams" -> 0.865, "q_text_chunk" -> 0.500, "q_split" -> 0.271,
    "q_multimodal_phash" -> 1.240, "q_decontaminate_bloom" -> 1.798,
    "q_pipeline_e2e" -> 3.813, "q_zorder" -> 0.449, "q_hist_quantile" -> 0.490,
    "q_hybrid_rrf" -> 1.607, "q_rand_proj" -> 0.871,
    "q_dedup_groups_contract" -> 3.647, "q_tokenize_greedy" -> 0.565,
    "q_bpe_train" -> 1.179, "q_bpe_encode" -> 2.549,
    "q_multimodal_decode" -> 0.212, "q_multimodal_audio" -> 0.201,
    "q_multimodal_resize_ppm" -> 0.200, "q_pagerank" -> 8.391,
    "q_triangles" -> 4.135, "q_split_leakage" -> 3.422,
    "q_dedup_incr_near" -> 4.289, "q_overlap_spans" -> 3.130,
    "q_seq_match" -> 0.422, "q_multimodal_wav" -> 0.260,
    "q_snapshot_stream" -> 0.426, "q_bigram_ppl" -> 1.122,
    "q_strip_spans" -> 3.947,
    // round-9 first-gated values (local sf0.1 bench, post-optimization
    // for the fuzzy pair: the pre-fix 20.5 s was a bug, not a baseline).
    // The three cell-blocked dedup entries live ONLY in the round-10
    // block below (their r9 single-probe values are superseded, and a
    // duplicate Map key would silently last-entry-win)
    "q_fuzzy_join" -> 1.310,
    "q_jaro_pairs" -> 0.630, "q_trigram_ppl" -> 2.066,
    "q_cdc_chunks" -> 1.728, "q_encoding_quality" -> 0.588,
    "q_dedup_keep_best" -> 1.434,
    "q_cdc_dedup" -> 1.980, "q_multimodal_keep_best" -> 1.800,
    "q_fuzzy_sorted" -> 1.280, "q_quality_gate" -> 0.910,
    "q_embed_recall" -> 2.180, "q_embed_recall_probe2" -> 2.080,
    // round-10 first-gated values (local sf0.1 bench). The three cell-
    // blocked dedup queries are RE-BASELINED here: their r9 bases were
    // single-probe, and the probe-2 default deliberately buys ~2x
    // candidate volume for the 402->915 per-mille recall — a quality
    // choice, not a regression the gate should hide behind
    "q_embed_dups_cell" -> 1.067, "q_embed_dups_trained" -> 2.212,
    "q_semantic_apply_recall" -> 1.604, "q_fuzzy_recall" -> 2.692,
    "q_bpe_train_batched" -> 1.792, "q_singer_stream_append" -> 2.498,
    "q_bpe_encode_batched" -> 6.190,
    "q_coreset_medoids" -> 1.310, "q_text_nfc" -> 0.380,
    "q_dedup_nfc" -> 0.520, "q_contamination_pairs" -> 1.220,
    "q_script_profile" -> 0.660, "q_corpus_drift" -> 0.820,
    "q_doc_clusters" -> 2.390, "q_dup_histogram" -> 0.670,
    "q_mixture_apply" -> 0.900, "q_neardup_histogram" -> 3.880,
    "q_singer_partitioned" -> 1.830, "q_fuzzy_recall_w16" -> 2.700,
    "q_fuzzy_recall_rev" -> 3.970,
    // (q_entity_resolve's r10 three-pass base 6.29 superseded below by
    // the four-pass re-baseline — kept single-keyed to avoid the silent
    // last-entry-wins duplicate)
    // round-11: the corpus-proportional auto paths assign through the
    // two-level HIERARCHICAL codebook (O(N·√k) instead of the
    // quadratic-in-N flat O(N·k) — HierProbe: flat 5.8→33 s across the
    // 157→783 cell band at sf1, hier flat at ~2-3 s). At sf0.1 the two
    // extra window stages cost ~1 s of fixed latency against a
    // sub-second flat assignment — the measured price of the scale
    // shape, re-baselined like the probe-2 recall default was; their
    // sf1 entries KEEP the flat bases (hier runs 0.5× them)
    "q_embed_dups_cell_auto" -> 2.150, "q_knn_graph_auto" -> 1.560,
    "q_embed_recall_probe3" -> 2.520,
    // adaptive BPE: 32 driver-paced rounds over the name vocabulary —
    // wall time is round-trip latency, not data (sf1 runs ~the same)
    "q_bpe_train_adaptive" -> 8.690,
    // the rarest-q-gram fourth pass: vocabulary-sized, measured recall
    // 996‰ alone / 1000‰ in the four-pass union
    "q_fuzzy_recall_qgram" -> 4.740,
    // re-baselined AGAIN for the fourth blocking pass (915‰→1000‰
    // union recall — the probe-2 rule: deliberately bought quality)
    "q_entity_resolve" -> 8.780,
    // 645-merge train + vocab-cached encode round trip (train rounds
    // dominate; corpus-side cost is merge-count independent).
    // RE-SEEDED r12 (ADVICE r11): the r11 single-run seed (11.15) was
    // best-case — three spaced r12 reps measured 15.1/17.4/22.8 under
    // a 1.0–1.35x-calibrated host (q1_agg canary), so the base is the
    // drift-corrected median, not the one lucky run
    "q_bpe_encode_adaptive" -> 15.500,
    // ANN search on the hierarchical auto codebook (one pass serves
    // index + probes)
    "q_sim_ivf_auto" -> 1.880,
    // two-level TRAINED codebook at corpus-proportional k (train AND
    // assign both O(N·√k))
    "q_embed_dups_trained_auto" -> 4.230,
    // codebook-quality recall axis (trained vs seeded at same k/probes)
    "q_embed_recall_trained" -> 5.440,
    // incremental semantic dedup: batch-side hier assignment + a
    // corpus-index cell join (corpus side is the 250-vector slice)
    "q_dedup_incr_semantic" -> 1.690,
    // trained PQ: one L2 Lloyd's pass over m*N sub-vectors + the encode
    // chain (the train pass roughly doubles the seeded q_sim_pq cost)
    "q_sim_pq_trained" -> 2.350,
    // the probe curve's knee (905 per-mille on the hard slice)
    "q_embed_recall_probe5" -> 3.130,
    // multi-axis union recall (cells P2 + RHP bands, both arms verified;
    // the 814k-pair LSH-arm verify dominates on the bounded slice).
    // RE-SEEDED r12 (ADVICE r11): r11's 6.62 single-run seed never
    // reproduced (r12 spaced reps 13.8/18.8 at canary drift 1.0–1.35x)
    "q_embed_recall_union" -> 11.000,
    // streaming-twin decision: literal-codebook probes + anti-join chain
    "q_dedup_incr_sem_stream" -> 1.100,
    // trained search auto: hier train (O(N*sqrt(k))) + hier search split
    "q_sim_ivf_trained_auto" -> 3.580,
    // IVF-PQ: probed-cells-only compressed-domain candidates + rerank
    "q_sim_ivf_pq" -> 1.850,
    // IVF-PQ on the hierarchical auto chain (one pass: index + probes)
    "q_sim_ivf_pq_auto" -> 2.980,
    // index-health reports (seeded hier layout / hier-trained codebook)
    "q_index_health" -> 1.670, "q_index_health_trained" -> 4.420,
    // persisted IVF layout: index write + partition-pruned search
    "q_sim_ivf_persisted" -> 3.300,
    // Viterbi optimal tokenization (native trie DP, greedy's twin)
    "q_tokenize_viterbi" -> 0.600,
    // round-12 first-gated values (3 spaced BenchOne reps, steady state)
    // trap DP pair: both segmentations in ONE codegen'd projection
    "q_tokenize_viterbi_trap" -> 1.050,
    "q_tokenize_viterbi_gain" -> 1.100,
    // weighted decoding: + the one-row cost-training collect
    "q_tokenize_viterbi_weighted" -> 2.600,
    // SEARCH-ONLY against the cached persisted layout (build absorbed
    // into run 1 by best-of-2; this row is the serving latency)
    "q_sim_ivf_search" -> 2.700,
    // streaming serving twin run as its batch twin (driver-literal
    // probes + static cell-array join; no partition pruning by design)
    "q_sim_ivf_stream" -> 1.800,
    // base-half build + second-half partition-append + search
    "q_sim_ivf_append" -> 4.500,
    // build third + two appends + per-cell one-file rewrite + search
    "q_sim_ivf_compact" -> 6.500,
    // one broadcast cross product + two candidate-pruned window ranks
    "q_sim_margin_pairs" -> 2.000,
    // one narrow projection pass + a 5-group aggregate
    "q_tokenizer_fertility" -> 1.000,
    // one projection pass + per-doc boundary scan (BenchOne r13 warm)
    "q_semantic_chunks" -> 2.300,
    // two hier assignment passes + cell-join + margin tail (r13 warm)
    "q_sim_margin_blocked" -> 7.700,
    // full tokenizer pipeline: 645-merge adaptive train (the dominant
    // cost, vocab-sized) + encode-derived costs + one decode projection
    "q_tokenize_viterbi_vocab" -> 13.500,
    // two pipeline ingests to scratch parquet + the merged union read
    "q_singer_schema_merge" -> 2.200,
    // build + semi-join + touched-cell rewrite + search (r13 warm)
    "q_sim_ivf_delete" -> 5.500,
    // seeded build + hier re-train + full re-assign + swap + search
    // (r14 steady-state BenchOne reps 6.3-7.1)
    "q_sim_ivf_retrain" -> 6.500,
    // four synthesized payload tiers + the mapPartitions header walk
    "q_multimodal_decode_png" -> 0.700,
    // one counting aggregate (train) + token-keyed join + per-doc sum
    // (r14 steady-state BenchOne reps 0.9-1.5)
    "q_quality_nb" -> 1.600,
    // localization + ×|C| gram fanout + argmax window (r14 steady 1.8-2.2)
    "q_langid_nb" -> 2.200,
    // serving projection over the cached exported model (r14 steady
    // 0.45-0.74; train absorbed into the per-dir cache like the viterbi
    // vocab)
    "q_quality_nb_stream" -> 0.900,
    // |C| per-class hash passes + in-row argmax (r14 steady 1.4-1.55)
    "q_langid_nb_stream" -> 1.700,
    // model read-back + the same serving projection (r14 steady
    // 0.74-0.84; train+write absorbed into the per-dir cache)
    "q_quality_nb_persist" -> 1.100,
    // one MG-summary aggregation pass (r14 steady 0.49-0.76)
    "q_heavy_hitters" -> 1.000,
    // one compactor-summary aggregation pass (r14 steady 0.68-1.0)
    "q_quantile_sketch" -> 1.200,
    // trigram scoring + sketch thresholds + broadcast bucket join
    // (r14 steady 3.2-4.5; ~2.2× q_trigram_ppl, the extra leg is the
    // lang join + tercile split)
    "q_ppl_buckets" -> 4.500,
    // TPC-H-shape additions (r14 steady, broadcast-dim star joins; q2/
    // q11 carry an eager scan-once checkpoint, priced in)
    "q2_min_cost_supplier" -> 2.000, "q9_nation_profit" -> 1.100,
    "q11_important_parts" -> 1.200, "q16_supplier_cnt" -> 0.800,
    "q20_part_promotion" -> 0.900,
    // one stateless scoring projection over the cached pruned model
    // (r14 steady 1.3; the train is a per-dir cached artifact)
    "q_ppl_serving" -> 1.600,
    // model read-back + the same projection (r14 steady 1.2-1.4)
    "q_ppl_persist" -> 1.700,
    // inverted-index candidates + in-row bit-packed MaxSim (r14 steady
    // 4.0-4.2; the fixture's flat 31-token vocabulary makes candidates
    // near-all-pairs — a real corpus's df cap bounds them)
    "q_late_interaction" -> 5.000,
    // per-dim stats + compressed-domain scan + 32-row exact rerank
    // (r14 steady 1.1-1.4)
    "q_sim_sq8" -> 1.700,
    // scoring projection + literal threshold CASE (r14 steady 1.0-1.1;
    // model + thresholds are per-dir cached artifacts)
    "q_ppl_buckets_serve" -> 1.400,
    // round-15: persisted BM25 index build (explode + (term,doc)
    // shuffle + bucket-partitioned write) + pruned search (r15 steady
    // 2.8-3.5)
    "q_bm25_persisted" -> 4.000,
    // half-build + delta-segment append + compact rewrite + search
    // (r15 steady 6.3)
    "q_bm25_index_append" -> 7.500,
    // four synthesized header tiers + the mapPartitions walk (r15
    // steady 0.67-0.86)
    "q_multimodal_decode_gif" -> 1.200,
    // one sketch-aggregated pass over per-doc lengths (r15 steady 0.65)
    "q_length_quantiles_sketch" -> 1.000,
    // 4-column unpivot → sketch pass + portable-HLL pass (r15 steady
    // 2.3-2.6)
    "q_profile_sketch" -> 3.200,
    // index build (3 checkpointed corpus passes) + one served batch
    // (r15 steady 3.8-4.0; ~q_late_interaction's shape, the split adds
    // the mask/postings pins)
    "q_late_interaction_stream" -> 4.800,
    // build + tombstone-delete (one pruned adjustment scan) + search
    // (r15 steady 4.2-4.3)
    "q_bm25_index_delete" -> 5.200,
    // SEARCH-ONLY serving latency against the cached layout (build
    // absorbed into the per-dir cache; r15 steady 1.16-1.41)
    "q_bm25_search" -> 1.800,
    // round-15 second wave, seeded from two full local sf0.1 passes
    // (a mildly steal-noisy host window — the canary held 1.00 but
    // heavy driver-paced queries ran ~1.3× the committed-morning
    // levels; seeds keep the usual ~1.3× headroom over steady):
    // exact top-k aggregate dashboard (steady 0.65-0.76)
    "q_top_ngrams_agg" -> 1.000,
    // positional build + phrase intersection (steady 1.98-2.36)
    "q_bm25_phrase" -> 2.800,
    // three-query serving batch against the cached layout (steady 0.86-0.88)
    "q_bm25_multi" -> 1.200,
    // five synthesized audio tiers + the mapPartitions walk (steady 0.34-0.38)
    "q_multimodal_decode_audio" -> 0.550,
    // increment vs the cached band layout: sign batch + join + verify
    // (steady 4.1-4.7; ~q_dedup_incr_near's shape minus corpus signing
    // plus the layout read)
    "q_dedup_index" -> 5.500,
    // build + delta append + tombstone delete + compact + increment
    // (steady 6.8-7.7)
    "q_dedup_index_lifecycle" -> 9.000,
    // assignment (corpus x 8 cells) + stats + coded probe-join +
    // rerank (fresh-JVM steady 4.0-4.2)
    "q_sim_ivf_sq8" -> 5.000,
    // round-15 third wave, seeded from clean-host BenchSeq steady reps
    // (rep2, the cached-layout regime the best-of-2 gate lands in):
    // pruned serving 1.35, stream ingest 8.2 (builds its index every
    // run by design), band search 3.1, tiff/bmp triage 0.47, stratified
    // draw 0.27, MAD gate 0.66/0.59
    "q_bm25_pruned" -> 1.800, "q_bm25_stream_ingest" -> 10.000,
    "q_dedup_index_search" -> 4.000, "q_multimodal_decode_tiff" -> 0.700,
    "q_weighted_sample_strat" -> 0.450, "q_outlier_mad" -> 0.900,
    "q_outlier_mad_sketch" -> 0.800,
    // fourth wave (clean-host BenchSeq steady reps): the ingest loop
    // builds + decides + appends twice per run (11.2); pruned batch
    // serving 1.2 cached; health row 0.56
    "q_dedup_stream_ingest" -> 14.000, "q_bm25_pruned_multi" -> 1.800,
    "q_bm25_index_health" -> 0.800,
    // fifth wave (clean-host steady reps): build+search 6.7, cached
    // serving 3.4, full lifecycle 9.3
    "q_colbert_persisted" -> 8.500, "q_colbert_search" -> 4.500,
    "q_colbert_lifecycle" -> 12.000)

  /** First-seen per-query seconds at the sf1 (10× data) checkpoint —
    * r9 BENCH_sf1.json values, plus the round-10 additions seeded from
    * this round's checkpoint runs (the probe-2-changed cell trio is
    * re-baselined on the probe-2 values, same rationale as firstSeen).
    * The sf1 run gates per query against THIS map exactly like the
    * sf0.1 gate: a quadratic trend at 10× (the `q_embed_dups` class)
    * surfaces here first, and before round 10 it was only visible by
    * manually diffing BENCH_sf1.json files.
    */
  val firstSeenSf1: Map[String, Double] = Map(
    "ingest_full" -> 1.870, "q_singer_pipeline" -> 20.353, "q1_agg" -> 6.078,
    "q_join_agg" -> 1.246, "q_window" -> 1.885, "q_topk" -> 0.311,
    "q_windowed_counts" -> 0.707, "q_sessionize" -> 2.062, "q_attribution" -> 2.038,
    "q_asof_join" -> 1.066, "q_range_join" -> 1.786, "q_dedup_exact" -> 0.868,
    "q_dedup_apply" -> 0.971, "q_dedup_minhash" -> 5.522, "q_dedup_simhash" -> 2.704,
    "q_dedup_groups" -> 1.854, "q_dedup_groups_contract" -> 2.258, "q_decontaminate" -> 3.131,
    "q_decontaminate_bloom" -> 3.477, "q_pipeline_e2e" -> 3.704,
    "q_sim_topk" -> 1.115, "q_sim_lsh" -> 4.518,
    "q_sim_ivf" -> 1.211, "q_sim_ivf_trained" -> 2.470, "q_text_tokens" -> 0.776,
    "q_text_quality" -> 1.825, "q_text_langid" -> 2.247, "q_text_redact" -> 7.470,
    "q_top_ngrams" -> 3.953, "q_text_chunk" -> 1.325, "q_tokenize_greedy" -> 1.535,
    "q_bpe_train" -> 1.510, "q_bpe_encode" -> 16.727, "q_split" -> 0.263,
    "q_fingerprint" -> 1.272, "q_corpus_stats" -> 0.463, "q_multimodal_meta" -> 0.364,
    "q_multimodal_features" -> 0.485, "q_multimodal_frames" -> 0.466, "q_multimodal_phash" -> 6.589,
    "q_multimodal_decode" -> 0.421, "q_multimodal_audio" -> 0.329, "q_multimodal_resize_ppm" -> 0.385,
    "q_zorder" -> 0.503, "q_hist_quantile" -> 0.212, "q_hybrid_rrf" -> 5.920,
    "q_rand_proj" -> 4.758, "q_pagerank" -> 20.199, "q_triangles" -> 4.105,
    "q_split_leakage" -> 17.442, "q_dedup_incr_near" -> 19.857, "q_overlap_spans" -> 12.370,
    "q_seq_match" -> 0.491, "q_multimodal_wav" -> 0.592, "q_snapshot_stream" -> 0.452,
    "q_bigram_ppl" -> 10.773, "q_strip_spans" -> 12.058,
    "q_knn_graph_auto" -> 4.805, "q_fuzzy_join" -> 1.191,
    "q_jaro_pairs" -> 0.651, "q_trigram_ppl" -> 7.259, "q_cdc_chunks" -> 17.789,
    "q_encoding_quality" -> 5.166, "q_dedup_keep_best" -> 1.429,
    "q_cdc_dedup" -> 16.826, "q_multimodal_keep_best" -> 10.008, "q_fuzzy_sorted" -> 0.989,
    "q_quality_gate" -> 0.401, "q_embed_recall" -> 1.741, "q_embed_recall_probe2" -> 1.542,
    // round-10 first-seen sf1 values (builder checkpoint run): the cell
    // dedup trio re-baselined on the probe-2 default (the measured price
    // of 402->915 per-mille recall: frozen-8 2.5x, trained 2.4x, auto
    // 1.34x vs their single-probe r9 values), plus the round-10 queries
    "q_embed_dups_cell" -> 15.866, "q_embed_dups_cell_auto" -> 5.708,
    "q_embed_dups_trained" -> 17.211, "q_semantic_apply_recall" -> 1.772,
    "q_fuzzy_recall" -> 3.162, "q_bpe_train_batched" -> 3.059,
    "q_singer_stream_append" -> 9.078,
    // round-10 second-wave first-seen sf1 values (final checkpoint run)
    "q_bpe_encode_batched" -> 8.460, "q_coreset_medoids" -> 3.358,
    "q_text_nfc" -> 0.519, "q_dedup_nfc" -> 0.529,
    "q_contamination_pairs" -> 3.642, "q_script_profile" -> 4.974,
    "q_corpus_drift" -> 0.280, "q_doc_clusters" -> 10.403,
    "q_dup_histogram" -> 0.775, "q_mixture_apply" -> 0.585,
    "q_neardup_histogram" -> 24.841,
    "q_singer_partitioned" -> 6.480, "q_fuzzy_recall_w16" -> 3.220,
    "q_fuzzy_recall_rev" -> 4.000,
    // (r10 three-pass sf1 base 6.85 superseded by the four-pass
    // re-baseline below)
    // round-11: probe-3 recall row, first-seen at the hier default;
    // adaptive BPE (vocabulary-bound — ~flat vs its sf0.1 time); the
    // q-gram fourth pass (vocabulary-sized, ~flat); entity resolution
    // re-baselined on the four-pass ladder
    "q_embed_recall_probe3" -> 1.850,
    "q_bpe_train_adaptive" -> 10.230,
    "q_fuzzy_recall_qgram" -> 4.590,
    "q_entity_resolve" -> 9.660,
    // RE-SEEDED r12 (ADVICE r11, same rationale as the sf0.1 entry):
    // spaced reps 24.1/33.6 under a 1.0–1.35x-calibrated host
    "q_bpe_encode_adaptive" -> 22.000,
    "q_sim_ivf_auto" -> 2.730,
    "q_embed_dups_trained_auto" -> 8.910,
    "q_embed_recall_trained" -> 5.860,
    "q_dedup_incr_semantic" -> 2.700,
    "q_sim_pq_trained" -> 5.620,
    "q_embed_recall_probe5" -> 3.000,
    // RE-SEEDED r12 (ADVICE r11): spaced reps 7.9/9.6/14.8
    "q_embed_recall_union" -> 9.000,
    "q_dedup_incr_sem_stream" -> 1.860,
    "q_sim_ivf_trained_auto" -> 8.440,
    "q_sim_ivf_pq" -> 2.270,
    "q_sim_ivf_pq_auto" -> 5.060,
    "q_index_health" -> 1.990, "q_index_health_trained" -> 8.910,
    "q_sim_ivf_persisted" -> 8.400,
    "q_tokenize_viterbi" -> 1.750,
    // round-12 first-seen sf1 values (steady-state BenchOne reps).
    // q_sim_ivf_search is the headline number: 2.2–3.0 s at sf0.1 →
    // 3.0–3.4 s at 10× data — search cost ~flat because the probe is a
    // partition filter (the build, absorbed by best-of-2, is what grows)
    "q_tokenize_viterbi_trap" -> 3.750,
    "q_tokenize_viterbi_gain" -> 2.250,
    "q_tokenize_viterbi_weighted" -> 5.000,
    "q_sim_ivf_search" -> 3.400,
    "q_sim_ivf_stream" -> 3.400,
    "q_sim_ivf_append" -> 7.500,
    "q_sim_ivf_compact" -> 9.000,
    "q_sim_margin_pairs" -> 5.000,
    "q_tokenizer_fertility" -> 2.200,
    "q_semantic_chunks" -> 13.700,
    // ~flat sf0.1→sf1 (7.6→7.1 s BenchOne r13): the cell-blocked
    // candidate volume, not the corpus, sets the cost
    "q_sim_margin_blocked" -> 7.300,
    // ~flat at 10× (13.3→14.8 s): the vocab-sized BPE train dominates
    "q_tokenize_viterbi_vocab" -> 15.000,
    "q_singer_schema_merge" -> 11.000,
    "q_sim_ivf_delete" -> 13.000,
    // sub-linear at 10× (6.5→13.3 s steady): train and re-assign are
    // both O(N·√k), and the swap is rename-bound
    "q_sim_ivf_retrain" -> 13.500,
    "q_multimodal_decode_png" -> 1.100,
    // sub-linear at 10× (1.1-1.5 → 3.0-3.9 s steady): vocab-keyed
    // aggregates + token join, both shuffle-bound on token volume
    "q_quality_nb" -> 4.000,
    // ~7× at 10× (1.8-2.2 → 13.5-19 s steady): the ×|C| gram fanout is
    // the inherent multiclass cost, all joins vocab-broadcast
    "q_langid_nb" -> 15.000,
    // ~4× at 10× (0.45-0.74 → 1.9-2.2 s steady): pure projection,
    // corpus-linear
    "q_quality_nb_stream" -> 2.600,
    // ~7× at 10× (1.4-1.55 → 9.3-11 s steady): localization + bigram
    // extraction dominate; still one stateless map stage
    "q_langid_nb_stream" -> 11.500,
    // ~3× at 10× (0.74-0.84 → 2.3-2.4 s steady): read-back is
    // model-sized, serving corpus-linear
    "q_quality_nb_persist" -> 2.900,
    // ~3× at 10× (0.49-0.76 → 1.6-2.2 s steady): summary size is fixed,
    // the pass is token-linear
    "q_heavy_hitters" -> 2.700,
    // ~2× at 10× (0.68-1.0 → 1.0-3.1 s): summary size is fixed, the
    // pass is row-linear (one long per doc vs heavy hitters' per-token)
    "q_quantile_sketch" -> 3.000,
    // ~3× at 10× (3.2-4.5 → 8.6-16.6 s): LM-table joins are train-
    // vocab-sized, the sketch summary fixed — the growth is the scored
    // token stream, same slope as q_trigram_ppl's 2.1→7.3
    "q_ppl_buckets" -> 17.000,
    // ~2-4× at 10×: dims broadcast at both scales, fact-side shuffles
    // grow linearly (r14 steady 1.1-4.2)
    "q2_min_cost_supplier" -> 4.300, "q9_nation_profit" -> 4.300,
    "q11_important_parts" -> 2.200, "q16_supplier_cnt" -> 2.600,
    "q20_part_promotion" -> 1.700,
    // ~5× at 10× (1.3 → 6.3-6.9 s steady): the model is prune-bounded
    // (17.3k keys at sf1 vs 288k un-pruned — which served at 18.6 s),
    // so the growth is the scored token stream; beats the in-plan
    // batch scorer's 7.3 s with zero train-table joins
    "q_ppl_serving" -> 8.500,
    // read-back is model-sized, serving corpus-linear (1.2 → 5.0 s)
    "q_ppl_persist" -> 7.000,
    // ~4× at 10× (4.0 → 16.3-18.4 s): candidate volume scales with the
    // corpus HERE because the fixture's degenerate vocabulary defeats
    // the df cap; the per-pair cost is already one XOR+popcount per
    // token pair
    "q_late_interaction" -> 20.000,
    // ~3× at 10× (1.1-1.4 → 3.7-5.0 s): stats/codes corpus-linear,
    // rerank fixed at 32 rows per query
    "q_sim_sq8" -> 6.000,
    // ~5× at 10× (1.0-1.1 → 5.5-5.9 s): same slope as q_ppl_serving —
    // the bucket CASE adds nothing measurable
    "q_ppl_buckets_serve" -> 7.500,
    // capped didactic baseline, back on the sf1 surface as a
    // constant-size row (input = the sf0.1 slice at every scale)
    "q_embed_dups" -> 1.400,
    // ~3.5× at 10× (2.8-3.5 → 10.0-10.3 s steady): the one-pass index
    // BUILD is corpus-linear; the pruned search stays ~flat (the
    // q_sim_ivf_persisted shape on the lexical axis)
    "q_bm25_persisted" -> 11.500,
    // ~2× at 10× (6.3 → 14.0-14.9 s steady): build + append + compact
    // are each one corpus-linear pass, searches flat
    "q_bm25_index_append" -> 16.500,
    // ~1.5× at 10× (0.67-0.86 → 1.0-1.2 s steady): header synthesis +
    // parse, one map stage
    "q_multimodal_decode_gif" -> 1.800,
    // ~1.4× at 10× (0.65 → 0.86-0.94 s steady): summary size fixed,
    // the pass row-linear
    "q_length_quantiles_sketch" -> 1.500,
    // ~7× at 10× (2.25-2.6 → 16.5-18 s steady): 24M unpivoted values
    // through the compactor + HLL passes — value-linear, summaries
    // still fixed-size on the wire
    "q_profile_sketch" -> 19.000,
    // ~3.4× at 10× (3.8-4.0 → 13-14 s steady): candidate volume grows
    // with the flat-vocab fixture's near-all-pairs postings, the served
    // batch itself is query-sized
    "q_late_interaction_stream" -> 15.500,
    // ~2.4× at 10× (4.2-4.3 → 9.8-10.5 s steady): build corpus-linear,
    // the delete itself one postings pass, the search pruned
    "q_bm25_index_delete" -> 11.500,
    // ~FLAT at 10× (1.16-1.41 → 1.47-1.69 s steady): the probe is a
    // partition filter — serving cost tracks posting-list length of the
    // queried terms, not corpus size (the q_sim_ivf_search story on the
    // lexical axis)
    "q_bm25_search" -> 2.200,
    // round-15 second wave, seeded from ONE full sf1 pass under a
    // DEGRADED host window (canary drift 1.52, 368 s total GC — the
    // same run put q_top_ngrams at 1.55× and q_dedup_incr_near at
    // 1.38× their own clean bases), so these carry that inflation as
    // their headroom; a clean-host run should land well under:
    // ~9× at 10× (0.65-0.76 → 5.7 noisy): the gram count table is
    // corpus-linear; the heap summary is not the cost, counting is
    "q_top_ngrams_agg" -> 6.500,
    // ~6× at 10× (2.0-2.4 → 12.9 noisy): positional build is one
    // corpus-linear pass (the q_bm25_persisted slope), intersection flat
    "q_bm25_phrase" -> 14.000,
    // ~flat-2× at 10× (0.86-0.88 → 1.4 noisy): three queries' term
    // union prunes the same buckets regardless of corpus size
    "q_bm25_multi" -> 2.000,
    // ~3× at 10× (0.34-0.38 → 1.1 noisy): synthesis + parse, one map
    "q_multimodal_decode_audio" -> 1.500,
    // ~6× at 10× (4.1-4.7 → 29.0 noisy / 26.0 isolated): the increment
    // signs the 10×-bigger batch (corpus-linear md5+mix chain); the
    // layout-read side is the join, not a scan
    "q_dedup_index" -> 30.000,
    // ~5× at 10× (6.8-7.7 → 37.9 noisy / 28.6 isolated): build +
    // append + compact are each one corpus-linear signing/write pass
    "q_dedup_index_lifecycle" -> 40.000,
    // ~FLAT at 10× (4.0 → 3.6-4.6 fresh-JVM): candidates bounded by
    // the probed cells; the corpus-linear stats/coding passes are the
    // cheap part
    "q_sim_ivf_sq8" -> 6.000,
    // round-15 third wave, clean-host BenchSeq steady reps at /tmp/sf1.
    // ~FLAT at 10× (1.35 → 1.60): the whole point — quota bounds the
    // bytes a pruned query reads, not the posting lists
    "q_bm25_pruned" -> 2.500,
    // ~1.8× at 10× (8.2 → 14.6): build + two micro-batch segments are
    // each one corpus-linear pass (the q_bm25_persisted slope)
    "q_bm25_stream_ingest" -> 18.000,
    // ~7× at 10× (3.1 → 21.5): signing the 10×-bigger query batch is
    // the corpus-linear md5+mix chain (the q_dedup_index slope); the
    // stored-layout side stays a join
    "q_dedup_index_search" -> 27.000,
    // ~4× at 10× (0.47 → 2.0): synthesis + one mapPartitions parse
    "q_multimodal_decode_tiff" -> 3.000,
    // ~FLAT at 10× (0.27 → 0.41): the k-bounded heap per stratum
    "q_weighted_sample_strat" -> 0.700,
    // ~FLAT at 10× (0.66 → 0.78, 0.59 → 0.77): group-sized quantile
    // tables, never a corpus window
    "q_outlier_mad" -> 1.200, "q_outlier_mad_sketch" -> 1.200,
    // ~3.3× at 10× (11.2 → 36.9): build + two decide/sign/append
    // passes, each corpus-linear (the q_dedup_index_lifecycle slope)
    "q_dedup_stream_ingest" -> 45.000,
    // ~FLAT at 10× (1.2 → 1.9 post-build): quota bounds the batch scan
    "q_bm25_pruned_multi" -> 3.000,
    // ~FLAT at 10× (0.56 → 0.74): dictionary-sized aggregates
    "q_bm25_index_health" -> 1.200,
    // ~3.2× at 10× (6.7 → 21.2): build is one corpus-linear
    // tokenize/write pass
    "q_colbert_persisted" -> 27.000,
    // ~1.6× at 10× (3.4 → 5.5 cached): pruned df/candidate reads;
    // candidate volume grows with matching docs, not the corpus scan
    "q_colbert_search" -> 7.000,
    // 41-76 at 10× across heap states (corpus-linear build + append +
    // compact rewrite; the q_dedup_index_lifecycle noise family)
    "q_colbert_lifecycle" -> 55.000)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    val gcBeans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMs(): Long = gcBeans.map(_.getCollectionTime).sum
    // JIT code-cache telemetry (round-15, the r14 sf1 postmortem lead):
    // the suspected driver of the sf1-only in-process drift on iterative
    // queries (q_pagerank/q_triangles — fresh-JVM clean, in-suite 2-3.5x)
    // is code-cache pressure late in a 149-query session: a full cache
    // stalls/flushes C2 compilation exactly where sf1's 10x-longer hot
    // loops need it (sf0.1's shorter loops coast on C1, which is why the
    // warm pass cured that scale but not this one). Record usage per rep
    // and the peak in the artifact, so the diagnosis is a number.
    val codePools =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
    def codeCacheMb(): Long =
      codePools.map(_.getUsage.getUsed).sum >> 20
    def codeCachePeakMb(): Long =
      codePools.map(_.getPeakUsage.getUsed).sum >> 20
    // Force FULL materialization through the noop sink: count() would let
    // Catalyst prune away the very projections being measured (md5/minhash/
    // cosine columns don't survive column pruning under a count).
    def execOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.allQueries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // free any localCheckpoint blocks the query's plan pinned — in a
        // long-lived session every unreleased checkpoint accumulates for
        // the session lifetime (and here would distort later queries'
        // memory headroom)
        graft.ops.Dedup.releaseCheckpoints(df)
        // then sweep EVERYTHING still pinned, blocking until the blocks are
        // actually gone: releaseCheckpoints only sees LogicalRDDs in the
        // final plan (superseded intra-op generations escape it) and
        // unpersists async — r8's q_embed_dups_cell/q_sim_topk "regressions"
        // were exactly this cross-query residue (both ran fast in isolation).
        // Shared fixtures (the co-purchase edge build q_pagerank and
        // q_triangles both consume) are exempt — they are deliberate
        // cross-query pins, released once at end of run.
        val keep = SparkEntry.sharedFixtureRddIds
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => keep(r.id))
          .foreach(_.unpersist(blocking = true))
        // DEAD-BROADCAST REAPING (round-13): finished queries' broadcast
        // relations stay live until ContextCleaner sees their driver
        // references COLLECTED — and an 8 GB heap under light allocation
        // can go minutes without a full GC, so retained UnsafeRow arrays
        // piled to ~2 GB by the heavy tail (measured via class
        // histogram: 24M rows across 48 live broadcasts; q_pagerank at
        // sf1 then GC-thrashed 225 s vs 28 s). One explicit GC whenever
        // used heap crosses 3 GB lets the cleaner reap between queries
        // instead of inside one.
        val used = Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
        if (used > (3L << 30)) System.gc()
        sec
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
    }
    // Back-to-back best-of-2 with per-run GC telemetry — the
    // RE-MEASUREMENT primitive (isolation + canary passes). The MAIN
    // pass does NOT use it: two back-to-back runs share any contention
    // window (r12's trained-family inflation: q_sim_ivf_trained_auto
    // committed 50.4 s best-of-2 against 2.6 s isolated because both
    // reps sat inside one slow segment) — the gate pass instead runs
    // two FULL-SURFACE-SPACED reps below, minutes apart per query.
    def exec(name: String): Double = {
      val g0 = gcMs()
      val t1 = execOnce(name)
      if (t1 < 0) return -1.0
      val g1 = gcMs()
      val t2 = execOnce(name)
      val g2 = gcMs()
      val heapMb =
        (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
      System.err.println(
        f"[bench] $name%-24s run1=$t1%7.3fs gc1=${g1 - g0}%4dms " +
          f"run2=$t2%7.3fs gc2=${g2 - g1}%4dms heap=${heapMb}MB")
      if (t2 < 0) t1 else math.min(t1, t2)
    }
    // Warm the JVM/codegen/file-listing paths once with a cheap query, so
    // measured numbers reflect steady-state execution, not first-job setup.
    execOnce("q_stream_counts")
    // Pre-build the shared edge fixture and report its cost as its own
    // number: before round 11 the build (~7 s at sf0.1) landed inside
    // q_pagerank's run-1 window, and a noisy run-2 then read as a
    // pagerank "drift" (8.4→11.4 s r10) that isolation re-timed at ~4 s.
    // The consumers' gate entries now measure steady-state; the build
    // stays visible as fixture_build_sec.
    val fxT0 = System.nanoTime()
    SparkEntry.warmSharedFixtures(spark, sfDir)
    val fixtureSec = (System.nanoTime() - fxT0) / 1e9
    System.err.println(f"[bench] fixture_build=$fixtureSec%.3fs")
    // Full ingest benchmark: events serialized to Singer JSON lines
    // (setup, untimed), then the COMPLETE pipeline — schema registry,
    // single-parse demux, coercion, validation wiring, parquet write,
    // observed metrics — timed end to end.
    def ingestFull(): Double = {
      import org.apache.spark.sql.functions._
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
      val ev = Tables.load(spark, sfDir, "events")
      ev.select(concat(
        lit("""{"type": "RECORD", "stream": "events", "record": """),
        to_json(struct(col("event_id"), col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").as("k"))),
        lit("}")).as("value"))
        .write.mode("overwrite").text(s"$tmp/in")
      val schema = graft.schema.SchemaMapper.fromSchemaMessage(
        """{"type": "SCHEMA", "stream": "events", "schema": {"type": "object", "properties": {"event_id": {"type": ["integer", "null"]}, "event_type": {"type": ["string", "null"]}, "value": {"type": ["number", "null"]}, "k": {"type": ["integer", "null"]}}}, "key_properties": ["event_id"]}""")
      val t0 = System.nanoTime()
      val lines = spark.read.text(s"$tmp/in")
      graft.pipeline.SingerPipeline.typedRecordsFromLines(lines, schema)
        .write.mode("overwrite").parquet(s"$tmp/out")
      val sec = (System.nanoTime() - t0) / 1e9
      // scratch cleanup: the full events table as text + parquet would
      // otherwise accumulate in /tmp per bench run
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
      sec
    }
    // best-of-2 for the ingest pipeline too (setup is untimed either way)
    val ingestSec = try {
      val a = ingestFull(); val b = ingestFull()
      System.err.println(f"[bench] ingest_full run1=$a%7.3fs run2=$b%7.3fs")
      math.min(a, b)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ingest_full failed: ${e.getMessage}"); -1.0 }
    // Scale detection by the dir's BASENAME, exactly: substring matching
    // ("sf1" in "/data/sf10") would gate a 100x run against the 10x
    // baselines and exit 1 on a wall of phantom "violations"
    val dirName = new java.io.File(sfDir).getName
    val isSf01 = dirName == "sf0.1"
    val isSf1 = dirName == "sf1"
    // ONLY sf1 checkpoint runs drop the deliberately-quadratic didactic
    // shapes from the scale surface (sf1Exclude) — the linear cell/
    // trained twins beside them are the graded 10x plans; any other dir
    // runs the full surface
    val surface =
      if (isSf1) headline.filterNot(sf1Exclude) else headline
    // PRE-WARM pass (round-14, the round-13 postmortem's fix): run every
    // gated query ONCE, untimed, before any timed rep. The drift mode
    // this kills: a query whose FIRST compilation lands late in a
    // long-lived session (after ~60 prior queries' generated classes
    // seeded the JIT's type profiles) can stick ~2× slower across all
    // its reps (q_fuzzy_join 1.3 s fresh vs 2.4-3.6 s in-suite, bisected
    // to cumulative prefix size) — but a query warmed BEFORE the prefix
    // stays fast after it. Warming the whole surface up front pins every
    // query's first-compile JIT state early, so the fresh-JVM
    // arbitration tier should sit idle. Cost: one extra surface pass
    // (~100 s clean at sf0.1), reported as warm_pass_sec.
    val warmT0 = System.nanoTime()
    surface.foreach { n =>
      val t = execOnce(n)
      if (t < 0) System.err.println(s"[bench] WARM-PASS FAILURE: $n")
    }
    val warmSec = (System.nanoTime() - warmT0) / 1e9
    System.err.println(f"[bench] warm_pass=$warmSec%.3fs (${surface.size} queries)")
    // Two SPACED full-surface reps (round-13): rep 2 of any query runs
    // after the ENTIRE remaining surface — minutes later — so a
    // sustained host-contention window covering one segment inflates at
    // most ONE rep; the min survives. Per-rep stderr lines carry GC
    // delta + live heap so a contaminated rep stays self-evident.
    def repPass(rep: Int): Seq[Double] = surface.map { n =>
      val g0 = gcMs()
      val t = execOnce(n)
      val g1 = gcMs()
      val heapMb =
        (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
      System.err.println(
        f"[bench] rep$rep $n%-24s t=$t%7.3fs gc=${g1 - g0}%4dms " +
          f"heap=${heapMb}MB cc=${codeCacheMb()}MB")
      t
    }
    val pass1 = repPass(1)
    // residue sweep audit between the reps: after a full surface pass,
    // every non-shared-fixture block should already be gone (execOnce
    // sweeps per query) — a nonzero count here is a leak in some
    // query's release path, reported as `leaked_blocks` in the artifact
    val leakedBlocks = {
      val keep = SparkEntry.sharedFixtureRddIds
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).size
    }
    if (leakedBlocks > 0)
      System.err.println(s"[bench] WARNING: $leakedBlocks leaked persistent RDD(s) after rep 1")
    val pass2 = repPass(2)
    val results: Seq[(String, Double)] = ("ingest_full" -> ingestSec) +:
      surface.zipWithIndex.map { case (n, i) =>
        val (a, b) = (pass1(i), pass2(i))
        n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
      }
    // Millisecond precision keeps the single JSON line short: the invoking
    // harness captures a bounded output tail, and full-precision doubles ×
    // 38 queries pushed the line past the capture window (unparseable).
    // Locale.ROOT: the default locale may use non-ASCII decimal digits.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Per-query 2× gate vs the first-seen baseline of the matching data
    // scale: sf0.1 runs gate against `firstSeen`, sf1 checkpoint runs
    // against `firstSeenSf1` (round-10 — a quadratic trend at 10× data
    // is exactly what a per-query sf1 gate catches first; before this it
    // required manually diffing BENCH_sf1.json files). Any other dir
    // skips the gate rather than flagging every query as a phantom
    // regression. The full ratio table goes to stderr + bench_full.json
    // (the driver's stdout capture window is bounded, so the JSON line
    // carries only the violations).
    val baseline: Map[String, Double] =
      if (isSf01) firstSeen
      else if (isSf1) firstSeenSf1
      else Map.empty
    val ratios = results.collect {
      case (k, v) if v >= 0 && baseline.contains(k) => (k, v, v / baseline(k))
    }
    ratios.sortBy(-_._3).foreach { case (k, v, r) =>
      val flag = if (r > 2.0) "  <-- OVER 2x BASELINE" else ""
      System.err.println(
        f"[bench] ratio $k%-24s now=$v%7.3fs base=${baseline(k)}%7.3fs x=$r%5.2f$flag")
    }
    // Isolation re-run of every flagged query (round-10): a SUSTAINED
    // host-interference window defeats back-to-back best-of-2 — r9's
    // driver artifact flagged 8 contiguous phantom regressions that all
    // cleared when re-timed later. Re-measuring flagged queries at the
    // END of the run (minutes later, after the window has moved on)
    // separates "the code got slower" from "the host was busy": only a
    // flag that REPRODUCES in the isolation pass is a confirmed
    // violation, and only confirmed violations fail the process.
    //
    // ingest_full is not a SparkEntry.allQueries key — exec() on it
    // would swallow a NoSuchElementException into -1, and the "failed
    // isolation confirms" rule below would then turn every transient
    // interference hit on the ingest pipeline into a confirmed
    // regression (ADVICE r10). Re-measure it through its own runner.
    def isolate(name: String): Double =
      if (name == "ingest_full") {
        try { val a = ingestFull(); val b = ingestFull(); math.min(a, b) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ingest_full isolation failed: ${e.getMessage}")
          -1.0 }
      } else exec(name)
    // HOST-DRIFT CANARY (round-12): the r11 gate was defeated by a
    // contention window that OUTLIVED the end-of-run isolation pass — 8
    // phantom "confirmed" regressions (the whole multimodal block at
    // 8–11 s isolated vs 0.5–1.2 s steady state) because the isolation
    // re-run re-measured inside the same slow window. Re-running the
    // same shape more times cannot fix that; a CONTROL can: a panel of
    // fixed sub-second queries whose code never changes, re-timed beside
    // the flagged re-runs. The panel's median ratio vs its own bases is
    // pure host signal (a code regression in a flagged query cannot
    // inflate the canaries), so confirmation divides by it — a window
    // that doubles everything doubles the canaries too and normalizes
    // out, while a genuine 2× regression stands against flat canaries.
    val canaryNames =
      Seq("q_topk", "q_split", "q_corpus_stats").filter(baseline.contains)
    def canaryDrift(): Double = {
      val rs = canaryNames.map { c =>
        val v = exec(c)
        if (v <= 0) 1.0 else v / baseline(c)
      }.sorted
      val med = if (rs.isEmpty) 1.0 else rs(rs.size / 2)
      // never normalize UP: a fast-host panel must not inflate ratios
      math.max(1.0, med)
    }
    val flagged = ratios.filter(_._3 > 2.0)
    // Round-11: the heavy tail is ALSO isolation re-measured every run,
    // flag or no flag. A real 1.3–2.0× drift on an expensive query hides
    // under the 2× gate indefinitely (q_pagerank's sf0.1 8.4→11.4 s was
    // only caught by a human diffing rounds) — carrying `isolated` for
    // the top-10 by cost in bench_full.json makes sub-gate drift on the
    // queries that dominate the total a recorded number, not an anecdote.
    val topByCost = results.filter(_._2 >= 0).sortBy(-_._2).take(10).map(_._1)
    val isoNames = (flagged.map(_._1) ++ topByCost).distinct
    val isolated: Map[String, Double] = isoNames.map { k =>
      val why = if (flagged.exists(_._1 == k)) "flagged" else "top-cost"
      System.err.println(s"[bench] isolation re-run of $why $k")
      k -> isolate(k)
    }.toMap
    // a FAILED isolation re-run (exec -1) confirms, never clears: a
    // query that flags >2x and then crashes during confirmation is a
    // regression plus a crash, not a phantom.
    //
    // Everything else confirms only against the canary control: the
    // isolation ratio is divided by the host drift the canary panel
    // measures right after the flagged re-runs. Queries still over 2×
    // after normalization get ONE time-spaced second rep (after the
    // top-cost isolation block has burned more minutes), again
    // canary-normalized — confirmation requires the regression to
    // reproduce in BOTH drift-corrected reps.
    // FRESH-JVM ARBITRATION (round-13): a third confirmation tier for a
    // drift mode the canary panel CANNOT see. Measured this round: a
    // query whose FIRST compilation happens late in a long-lived
    // session (after ~60 prior queries' generated classes have seeded
    // the JIT's type profiles) can land ~2× slower and STICK — repeats
    // plateau (q_fuzzy_join 1.3 s fresh vs 2.4-3.6 s in-suite, bisected
    // to cumulative prefix size, surviving forced full GC, larger
    // codegen cache, and larger code cache; a query warmed BEFORE the
    // prefix stays fast after it, pinning first-compile JIT state, not
    // ambient load). Canaries are early-compiled and stay fast, so
    // canary normalization cannot clear it, and it reproduces across
    // in-suite isolation reps — but it is NOT a code regression: the
    // same code at the same data meets its baseline in a fresh JVM.
    // So: a canary-normalized, twice-reproduced flag gets ONE fresh-JVM
    // BenchOne subprocess (same flags, classpath, sf dir); meeting the
    // 2× bar there reclassifies the flag as in-process JIT-state drift
    // (recorded in the artifact as `fresh`), while a true code
    // regression reproduces everywhere and stays fatal.
    def freshJvmMin(name: String, reps: Int = 3): Double = {
      import scala.jdk.CollectionConverters._
      try {
        val javaBin = System.getProperty("java.home") + "/bin/java"
        // cap the CHILD heap (ADVICE r13): the parent's -Xmx8g is live
        // at ~16 GB process peak during arbitration, and a child
        // inheriting the full cap can fail allocation under host memory
        // pressure — returning -1 and leaving the flag fatal. One query
        // + one warm query fit comfortably under the smaller cap at
        // sf0.1 — but NOT at the sf1 checkpoint, where a 4g child GC-
        // thrashes iterative queries into phantom confirmations (r14:
        // q_pagerank fresh=90 s at 4g vs ~30 s cold at a proper heap,
        // while the gate itself documents needing SPARK_DRIVER_MEM=14g).
        // Scale the default with the data instead of the parent's peak.
        val childDefault = if (isSf1) "10g" else "4g"
        val childMx = "-Xmx" +
          sys.env.getOrElse("SPARK_GRAFT_FRESHJVM_MEM", childDefault)
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
          .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
        val repFile = java.nio.file.Files.createTempFile("benchone", ".json")
        java.nio.file.Files.delete(repFile) // child recreates it on success
        val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(childMx) ++
          Seq("-cp", System.getProperty("java.class.path"),
            "graft.tools.BenchOne", name, reps.toString)
        val pb = new ProcessBuilder(cmd.asJava)
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        pb.environment().put("SPARK_GRAFT_BENCHONE_OUT", repFile.toString)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val out = new String(p.getInputStream.readAllBytes, "UTF-8")
        p.waitFor()
        // primary channel: the child's rep-times JSON file (ADVICE r13 —
        // stdout regex-scraping is fragile); stdout stays as fallback
        // for an older BenchOne on the classpath
        val times =
          if (java.nio.file.Files.exists(repFile)) {
            val s = new String(java.nio.file.Files.readAllBytes(repFile), "UTF-8")
            java.nio.file.Files.delete(repFile)
            "[0-9]+\\.[0-9]+".r.findAllIn(s).map(_.toDouble).toSeq
          } else "rep[0-9]+=([0-9.]+)s".r
            .findAllMatchIn(out).map(_.group(1).toDouble).toSeq
        if (times.isEmpty) -1.0 else times.min
      } catch { case e: Throwable =>
        System.err.println(s"[bench] fresh-JVM check failed for $name: ${e.getMessage}")
        -1.0
      }
    }
    val drift1 = if (flagged.isEmpty) 1.0 else canaryDrift()
    if (flagged.nonEmpty)
      System.err.println(f"[bench] canary drift (isolation pass) = $drift1%5.2f")
    val rep1 = flagged.collect {
      case (k, _, r0) if isolated(k) < 0 => (k, r0, true)
      case (k, _, _) if isolated(k) / baseline(k) / drift1 > 2.0 =>
        (k, isolated(k) / baseline(k) / drift1, false)
    }
    val confirmed = if (rep1.isEmpty) Seq.empty[(String, Double)] else {
      val drift2 = canaryDrift()
      System.err.println(f"[bench] canary drift (second rep) = $drift2%5.2f")
      rep1.flatMap {
        case (k, r, true) => Some((k, r)) // crashed: confirmed as-is
        case (k, _, false) =>
          System.err.println(s"[bench] second-chance re-run of flagged $k")
          val v2 = isolate(k)
          val r2 = if (v2 < 0) Double.MaxValue else v2 / baseline(k) / drift2
          if (r2 > 2.0) Some((k, math.min(isolated(k) / baseline(k) / drift1, r2)))
          else None
      }
    }
    // fresh-JVM arbitration of twice-reproduced flags (see freshJvmMin):
    // ingest_full has no BenchOne entry — it stays fatal if confirmed
    val freshChecked: Map[String, Double] = confirmed.collect {
      case (k, _) if k != "ingest_full" => k -> freshJvmMin(k)
    }.toMap
    val (reclassified, fatal) = confirmed.partition { case (k, _) =>
      freshChecked.get(k).exists(f => f > 0 && f / baseline(k) <= 2.0)
    }
    reclassified.foreach { case (k, r) =>
      System.err.println(
        f"[bench] flag RECLASSIFIED as in-process JIT-state drift: $k in-suite x=$r%5.2f fresh=${freshChecked(k)}%7.3fs = ${freshChecked(k) / baseline(k)}%4.2fx of base in a fresh JVM")
    }
    fatal.foreach { case (k, r) =>
      System.err.println(f"[bench] CONFIRMED >2x regression: $k x=$r%5.2f (canary-normalized, 2 reps, reproduces in a fresh JVM)")
    }
    flagged.filterNot(f => confirmed.exists(_._1 == f._1)).foreach { case (k, _, r0) =>
      System.err.println(
        f"[bench] flag cleared in isolation: $k initial=$r0%5.2f isolated=${isolated(k) / baseline(k)}%5.2f drift=$drift1%5.2f")
    }
    val over2x = fatal
      .map { case (k, r) => "\"" + k + "\":" + fmt(r) }
      .mkString("{", ",", "}")
    val flaggedJson = flagged
      .map { case (k, _, r) =>
        val fresh = freshChecked.get(k).map(f => ",\"fresh\":" + fmt(f)).getOrElse("")
        "\"" + k + "\":{\"initial\":" + fmt(r) + ",\"isolated\":" +
          fmt(isolated(k)) + fresh + "}" }
      .mkString("{", ",", "}")
    // gc_ms: total collector time over the whole run — a contaminated run
    // (host interference, heap pressure) shows up as an outsized value
    // relative to the ~61 s clean-run shape.
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs_per_query":2,"gc_ms":${gcMs()},"fixture_build_sec":${fmt(fixtureSec)},"warm_pass_sec":${fmt(warmSec)},"canary_drift":${fmt(drift1)},"leaked_blocks":$leakedBlocks,"code_cache_peak_mb":${codeCachePeakMb()},"over2x":$over2x,"flagged":$flaggedJson,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // full artifact for the repo: per-query seconds, plus base/ratio
    // where the scale's baseline map has an entry (new queries
    // re-baseline on their first gated run), plus the isolation
    // re-measurement for flagged queries AND the fresh-JVM arbitration
    // time when it ran (r14 VERDICT task 7: a reader of a >2x raw row
    // must see the adjudication inside the artifact, not in PLANS.md)
    val full = results.map { case (k, v) =>
      val base = baseline.get(k).map(b =>
        s""","base":${fmt(b)},"ratio":${fmt(v / b)}""").getOrElse("")
      val iso = isolated.get(k).map(i => s""","isolated":${fmt(i)}""").getOrElse("")
      val fr = freshChecked.get(k).map(f => s""","fresh":${fmt(f)}""").getOrElse("")
      s""""$k":{"sec":${fmt(v)}$base$iso$fr}"""
    }.mkString("{", ",", "}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      s"""{"total":${fmt(total)},"gc_ms":${gcMs()},"fixture_build_sec":${fmt(fixtureSec)},"warm_pass_sec":${fmt(warmSec)},"canary_drift":${fmt(drift1)},"leaked_blocks":$leakedBlocks,"code_cache_peak_mb":${codeCachePeakMb()},"sf":"$sfDir","confirmed_over2x":${fatal.size},"reclassified_jit_drift":${reclassified.size},"queries":$full}""".getBytes("UTF-8"))
    SparkEntry.releaseSharedFixtures()
    spark.stop()
    // the gate BITES (round-10): rc != 0 on confirmed violations only —
    // phantom interference flags clear themselves in the isolation pass
    if (fatal.nonEmpty) sys.exit(1)
  }
}
