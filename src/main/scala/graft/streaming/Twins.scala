package graft.streaming

/** The declared batch ↔ streaming TWIN REGISTRY.
  *
  * Every `SparkEntry.queries` key is classified here, exactly once:
  * either it has a streaming twin (a method on [[Streaming]] proven
  * bit-equal to the batch operator under scrambled replay by
  * `TwinSweepSpec`), or it is a declared no-twin with the reason. The
  * sweep spec asserts totality in both directions, so adding a batch
  * operator WITHOUT deciding its streaming story — or adding a
  * streaming operator without registering it — fails the build
  * visibly instead of rotting silently.
  *
  * This is the at-scale design ledger: on a 1000-executor deployment
  * the twinned operators run as Structured Streaming jobs over the
  * live feed, the `no-twin` operators run as batch passes over
  * manifest snapshots, and nothing falls between the two by accident.
  */
object Twins {

  /** batch `SparkEntry.queries` key → streaming twin method on
    * [[Streaming]]. Where a reorder-hardened `...Ordered` variant
    * exists it is the registered twin (the production arrival
    * contract); the in-order base variant is listed in [[variants]]. */
  val twinned: Map[String, String] = Map(
    "stream_windowed_counts"      -> "windowedCounts",
    "range_session_count"         -> "viewClickJoin",
    "ihc_attribution"             -> "attributeIhcOrdered",
    "channel_reporting"           -> "channelReporting",
    "markov_attribution"          -> "transitionCounts",
    "markov2_attribution"         -> "transitionCounts2",
    "time_to_convert"             -> "timeToConvertOrdered",
    "channel_overlap"             -> "channelOverlapIncsOrdered",
    "journey_length_distribution" -> "journeyLengthsOrdered",
    "scd2_user_state"             -> "scd2StateOrdered",
    "events_anomaly"              -> "anomalyZ",
    "events_sessionize"           -> "sessionize",
    "events_window_funnel"        -> "funnelProgress",
    "sketch_kmv_distinct"         -> "kmvCounts",
    "sketch_hll_distinct"         -> "hllCounts",
    "sketch_hist_quantiles"       -> "histQuantiles",
    "channel_hits"                -> "topHitters",
    "orders_ewma"                 -> "ewmaSmooth",
    "lm_doc_score"                -> "lmFilteredIngest",
    "dedup_exact"                 -> "dedupExactOrdered",
    "ngram_novelty"               -> "noveltyMarksOrdered",
    "dedup_simhash_near"          -> "simhashNearMarksOrdered",
    "corpus_curation"             -> "admitDocuments",
    "quality_classifier_score"    -> "qualityScores",
    "dedup_embedding_incremental" -> "semanticNearMarks",
    "sketch_join_size"            -> "amsGrid")

  /** Streaming methods that are arrival-contract VARIANTS of a
    * registered twin (in-order base form of a hardened `Ordered`
    * twin). Each maps to the registered twin it shadows. */
  val variants: Map[String, String] = Map(
    "attributeIhc"       -> "attributeIhcOrdered",
    "timeToConvert"      -> "timeToConvertOrdered",
    "channelOverlapIncs" -> "channelOverlapIncsOrdered",
    "journeyLengths"     -> "journeyLengthsOrdered",
    "scd2State"          -> "scd2StateOrdered",
    "dedupExact"         -> "dedupExactOrdered",
    "noveltyMarks"       -> "noveltyMarksOrdered",
    "simhashNearMarks"   -> "simhashNearMarksOrdered",
    // the state-fed production entry point: same gate, quantizer+cells
    // read from one committed manifest snapshot instead of caller frames
    "semanticNearMarksFromState" -> "semanticNearMarks")

  /** Streaming surface with no single gated batch key: infrastructure
    * and API-level twins, spec-gated directly. */
  val auxiliary: Map[String, String] = Map(
    "dedupEvents" ->
      "exactly-once event replay suppression; batch analog is the distinct-on-event_id inside integrity_audit",
    "ingestMicroBatch" ->
      "idempotent micro-batch commit — the streaming twin of Corpus.ingestIncremental",
    "corpusIngestSink" ->
      "foreachBatch wiring of ingestMicroBatch into a running query",
    "stateMetrics" ->
      "state-store observability over a running query; no batch counterpart",
    "droppedLateRows" ->
      "cumulative watermark-drop count — the degraded-mode signal for every Ordered twin; no batch counterpart",
    "dropCounter" ->
      "listener-accumulated EXACT drop total (DropCounter) — the unbounded form of droppedLateRows, immune to the recentProgress ring-buffer retention")

  private def group(reason: String)(keys: String*): Seq[(String, String)] =
    keys.map(_ -> reason)

  /** Batch keys with NO streaming twin, each with the reason the
    * omission is a design decision rather than a gap. */
  val noTwin: Map[String, String] = (
    group("full-relation TPC-H-style report; recomputed per manifest snapshot, not streamed")(
      "q1_pricing_summary", "q2_min_price_supplier", "q3_top_unshipped",
      "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
      "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation",
      "q10_returned_items", "q11_important_parts", "q12_shipping_priority",
      "q13_custdist", "q14_promo_revenue", "q15_top_supplier",
      "q16_supplier_counts", "q17_small_quantity_revenue", "q18_large_volume",
      "q19_discounted_revenue", "q20_promo_suppliers", "q21_waiting_suppliers",
      "q22_global_sales", "nation_trade_balance", "supplier_hhi") ++
    group("window/rank/percentile/pivot over the complete relation; a streaming form would buffer the whole input")(
      "order_value_percentiles", "orders_abc_pareto", "orders_moving_avg",
      "orders_yoy_growth", "orders_seasonality", "orders_autocorrelation",
      "orders_enrich_denorm", "top_customers_window", "running_total_window",
      "customer_ltv_deciles", "user_rfm_segments", "user_purchase_histogram",
      "user_channel_profile", "user_stickiness", "cohort_retention",
      "basket_lift", "ab_test_welch", "revenue_trend_ols", "data_profile",
      "integrity_audit", "scd2_enrich", "salted_channel_agg", "events_cube",
      "events_pivot", "events_rollup", "events_grouping_sets",
      "events_daily_dense", "events_dow_hour_heatmap", "events_hour_profile",
      "events_json_extract", "events_latest_per_user", "events_quality_audit",
      "events_funnel", "events_session_window", "clickers_no_purchase",
      "clickers_who_purchased", "channel_conversion_rate",
      "touch_gap_quantiles", "sessionize_gap_sweep") ++
    group("iterative graph computation over the full edge set; converges per snapshot")(
      "channel_pagerank", "channel_communities", "channel_triangles") ++
    group("batch stage/model variant of the attribution pipeline; its streaming path is the registered IHC and journey twins")(
      "conversions_extract", "sessions_extract", "journey_build",
      "journey_flag", "journey_paths", "journey_stats", "journey_validate",
      "journey_hashed_features", "journey_lag_by_opener",
      "channel_position_bias", "channel_transitions", "attribution_sum_check",
      "attribution_incremental", "attribution_model_compare",
      "first_touch_attribution", "last_touch_attribution",
      "linear_attribution", "time_decay_attribution", "position_attribution",
      "shapley_attribution", "ihc_redistributed", "ihc_lookback",
      "channel_reporting_metrics", "channel_reporting_window",
      "training_data_export", "asof_last_session", "asof_next_session") ++
    group("merge/eval form of a sketch whose streaming accumulation twin is registered (kmv/hll/hist) or whose merge is a batch reduce")(
      "sketch_kmv_merged", "sketch_kmv_intersection", "sketch_cms_frequency",
      "sketch_cms_merged", "sketch_hll_merged", "sketch_hist_merged",
      "sketch_bloom_prune", "sketch_bloom_merged") ++
    group("global pairwise/cluster dedup over the full corpus; the online forms are the registered admission gates (dedupExactOrdered, simhashNearMarksOrdered, noveltyMarksOrdered, Corpus.ingestNearDup)")(
      "dedup_minhash_lsh", "dedup_minhash_eval", "dedup_minhash_incremental",
      "dedup_embedding_eval", "dedup_gate_probe_sweep",
      "dedup_clusters", "dedup_hybrid_clusters", "dedup_semantic",
      "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding",
      "dedup_containment", "dedup_edit_verified", "dedup_keep_best",
      "dedup_chunks_exact", "chunk_dup_stats", "dedup_cluster_sizes",
      "dedup_hot_spans", "dedup_exact_substring", "dedup_substring_runs",
      "dedup_substring_scrub", "dedup_threshold_sweep",
      "shingle_df_histogram", "dup_rate_by_source", "winnow_fingerprints",
      "winnow_overlap", "contamination_check", "contamination_semantic",
      "split_leakage_free",
      "multimodal_phash_neardup", "quality_dup_grid", "minhash_s_curve",
      "source_quality_profile") ++
    group("index build/evaluation over a frozen embedding snapshot; online serving is the VectorStore API, not a stream transform")(
      "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
      "ann_ivf_trained_topk", "ann_ivfpq_topk", "ann_pq_topk", "ann_sq_topk",
      "ann_range_search", "ann_knn_graph", "ann_recall_lsh", "ann_recall_ivf",
      "ann_recall_pq", "ann_recall_sq", "ann_recall_ivfpq", "ann_ndcg_ivf",
      "ann_ndcg_lsh", "ann_nprobe_sweep", "ann_nprobe_sweep_ivfpq",
      "ann_filtered_topk", "ann_filtered_ivf_topk", "ann_recall_filtered",
      "ann_index_compare", "ann_adaptive_probe",
      "ann_graph_search", "ann_recall_graph", "ann_beam_sweep",
      "ann_ivfpq_residual_topk", "ann_recall_ivfpq_residual",
      "ann_filtered_graph", "ann_recall_filtered_graph",
      "corpus_semantic_adc", "corpus_filtered_topk",
      "corpus_filtered_adc", "corpus_filtered_two_col", "corpus_adc_residual",
      "search_rrf_fusion", "search_mmr_rerank", "search_ndcg_rrf",
      "knn_classify", "label_centroids", "topic_assign", "contrastive_pairs",
      "embed_rp_project", "embed_center_norm", "embed_dim_stats",
      "embed_whiten", "embed_outliers", "embed_matryoshka_recall") ++
    group("global model training / corpus statistics over the complete corpus; frozen models serve streams (lmFilteredIngest)")(
      "bigram_lm", "bigram_kn_lm", "bpe_top_merges", "bpe_encode",
      "bpe_coverage", "unigram_pieces", "unigram_encode", "unigram_fertility",
      "tfidf_top_terms", "bm25_search", "bm25_search_indexed", "token_pmi",
      "token_zipf", "vocab_growth", "lang_confusion", "top_ngrams",
      "nb_lang_classify", "lm_ppl_buckets", "lm_heldout_score",
      "quality_classifier_eval") ++
    group("stateless per-document map, directly applicable inside any stream (admitDocuments applies quality+fingerprint); gated as batch scoring")(
      "text_langid", "text_quality", "text_normalize", "text_pii_scrub",
      "text_repetition", "text_entropy", "token_count", "doc_fingerprint",
      "doc_chunking", "doc_len_histogram", "quality_length_grid",
      "multimodal_meta", "multimodal_features", "multimodal_frame_sample",
      "multimodal_ahash", "multimodal_dhash") ++
    group("epoch-level global selection/packing/sharding; materialized per training run, not streamed")(
      "sample_stratified", "sample_priority", "data_mixture_sample",
      "quality_curriculum", "dsir_select", "corpus_budget_select",
      "corpus_budget_by_lang", "classifier_budget_select",
      "classifier_threshold_select",
      "corpus_datasheet", "corpus_mixture_entropy",
      "sequence_packing", "packing_efficiency", "training_shards",
      "training_shards_balanced",
      "shard_skew", "shard_checksums", "mixture_temperature",
      "domain_cap_sample", "quality_ablation") ++
    group("batch drift diagnostic; its admission-control form is Corpus.ingestNearDup's drift gate")(
      "corpus_drift", "corpus_drift_summary")
  ).toMap
}
