package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  *
  * Every `queries` entry is a self-contained (spark, sfDir) => DataFrame;
  * every SQL-expressible entry has a DuckDB oracle in `oracleSql` with
  * identical output column names and cross-engine-stable value encoding
  * (fixed-point bigints instead of raw doubles — see functions.Cols).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01 _),
    "q02_stats_agg"       -> (Relational.q02 _),
    "q03_topk_revenue"    -> (Relational.q03 _),
    "q04_semijoin_exists" -> (Relational.q04 _),
    "q05_multijoin_volume"-> (Relational.q05 _),
    "q06_filter_agg"      -> (Relational.q06 _),
    "q07_window_rank"     -> (Relational.q07 _),
    "q08_sort_limit"      -> (Relational.q08 _),
    "q09_distinct_agg"    -> (Relational.q09 _),
    "q10_returned_items"  -> (Relational.q10 _),
    "q11_setops"          -> (Relational.q11 _),
    "q12_pivot"           -> (Relational.q12 _),
    "q13_outer_join_agg"  -> (Relational.q13 _),
    "q14_case_ratio"      -> (Relational.q14 _),
    "q15_full_outer"      -> (Relational.q15 _),
    "q16_antijoin"        -> (Relational.q16 _),
    "q17_avg_subquery"    -> (Relational.q17 _),
    "q18_having"          -> (Relational.q18 _),
    "q19_disjunctive"     -> (Relational.q19 _),
    "q20_grouping_sets"   -> (Relational.q20 _),
    "q21_rollup"          -> (Relational.q21 _),
    "q22_cube"            -> (Relational.q22 _),
    "q23_hash_sample"     -> (Relational.q23 _),
    "q24_string_funcs"    -> (Relational.q24 _),
    "q25_date_arith"      -> (Relational.q25 _),
    "q26_explode_words"   -> (Relational.q26 _),
    "q27_regex"           -> (Relational.q27 _),
    "q28_percentiles"     -> (Relational.q28 _),
    "q29_salted_join"     -> (Relational.q29 _),
    "q30_tumbling_window" -> (Events.q30 _),
    "q31_sessionize"      -> (Events.q31 _),
    "q32_topk_per_group"  -> (Events.q32 _),
    "q33_asof_join"       -> (Events.q33 _),
    "q34_json_extract"    -> (Events.q34 _),
    "q35_funnel"          -> (Events.q35 _),
    "q36_retention"       -> (Events.q36 _),
    "q37_rolling_window"  -> (Events.q37 _),
    "q38_histogram"       -> (Events.q38 _),
    "q39_range_join"      -> (Events.q39 _),
    "q40_token_stats"     -> (Text.q40 _),
    "q41_quality_score"   -> (Text.q41 _),
    "q42_langid"          -> (Text.q42 _),
    "q43_fingerprint"     -> (Text.q43 _),
    "q44_ngram_freq"      -> (Text.q44 _),
    "q45_tfidf"           -> (Text.q45 _),
    "q46_normalize_dedup" -> (Text.q46 _),
    "q47_stratified_sample" -> (Text.q47 _),
    "q48_pii_scrub"       -> (Text.q48 _),
    "q49_repetition"      -> (Text.q49 _),
    "q50_dedup_exact"     -> (Dedup.q50 _),
    "q51_dedup_ngram_jaccard" -> (Dedup.q51 _),
    "q52_dedup_minhash_lsh"   -> (Dedup.q52 _),
    "q53_dedup_simhash"   -> (Dedup.q53 _),
    "q54_dedup_embedding" -> (Dedup.q54 _),
    "q55_dedup_clusters"  -> (Dedup.q55 _),
    "q56_topk_aggregate"  -> (Events.q56 _),
    "q57_bloom_semijoin"  -> (Relational.q57 _),
    "q58_window_surface"  -> (Relational.q58 _),
    "q59_string_agg"      -> (Relational.q59 _),
    "q60_ann_bruteforce"  -> (Similarity.q60 _),
    "q61_ann_lsh"         -> (Similarity.q61 _),
    "q62_ann_ivf"         -> (Similarity.q62 _),
    "q63_ann_pq"          -> (Similarity.q63 _),
    "q144_ann_ivf_index"  -> (Similarity.q144 _),
    "q145_ann_pq_index"   -> (Similarity.q145 _),
    "q68_copurchase"      -> (Relational.q68 _),
    "q69_transitions"     -> (Events.q69 _),
    "q146_bm25"           -> (Text.q146 _),
    "q147_pagerank"       -> (Dedup.q147 _),
    "q148_cumulative_actives" -> (Events.q148 _),
    "q149_seasonal_spikes"    -> (Events.q149 _),
    "q150_event_paths"        -> (Events.q150 _),
    "q151_cusum"              -> (Events.q151 _),
    "q152_schema_drift"       -> (Changes.q152 _),
    "q153_boilerplate"        -> (Text.q153 _),
    "q154_oov_rate"           -> (Text.q154 _),
    "q155_ann_filtered"       -> (Similarity.q155 _),
    "q156_ewma"               -> (Events.q156 _),
    "q157_negative_sample"    -> (Similarity.q157 _),
    "q158_length_batches"     -> (Text.q158 _),
    "q159_hll_uniques"        -> (Events.q159 _),
    "q160_bigram_surprisal"   -> (Text.q160 _),
    "q161_keywords"           -> (Text.q161 _),
    "q162_knn_classify"       -> (Similarity.q162 _),
    "q163_burstiness"         -> (Events.q163 _),
    "q164_centroid_outliers"  -> (Similarity.q164 _),
    "q165_copurchase_lift"    -> (Relational.q165 _),
    "q166_jw_name_pairs"      -> (Dedup.q166 _),
    "q167_scene_detect"       -> (Multimodal.q167 _),
    "q168_ann_ivf_append"     -> (Similarity.q168 _),
    "q169_cjk_tokens"         -> (Text.q169 _),
    "q171_dict_segment"       -> (Text.q171 _),
    "q172_url_normalize"      -> (Text.q172 _),
    "q174_kmv_uniques"        -> (Events.q174 _),
    "q175_kmv_store"          -> (Events.q175 _),
    "q173_domain_quota"       -> (Text.q173 _),
    "q170_ann_ivf_compact"    -> (Similarity.q170 _),
    "q70_multimodal_meta" -> (Multimodal.q70 _),
    "q76_audio_windows"   -> (Multimodal.q76 _),
    "q78_label_centroids" -> (Similarity.q78 _),
    "q79_gap_fill"        -> (Events.q79 _),
    "q80_filtered_aggs"   -> (Relational.q80 _),
    "q81_null_semantics"  -> (Relational.q81 _),
    "q82_argmax"          -> (Relational.q82 _),
    "q83_unpivot"         -> (Relational.q83 _),
    "q85_monthly_trend"   -> (Relational.q85 _),
    "q86_setops_all"      -> (Relational.q86 _),
    "q84_dedup_keep_best" -> (Dedup.q84 _),
    "q72_asof_forward"    -> (Events.q72 _),
    "q73_asof_native"     -> (Events.q73 _),
    "q87_asof_outer"      -> (Events.q87 _),
    "q88_dedup_incremental" -> (Dedup.q88 _),
    "q89_dedup_containment" -> (Dedup.q89 _),
    "q90_unigram_surprisal" -> (Text.q90 _),
    "q91_embed_clusters"    -> (Similarity.q91 _),
    "q92_range_frame"       -> (Relational.q92 _),
    "q93_corr_stats"        -> (Relational.q93 _),
    "q94_semantic_search"   -> (Similarity.q94 _),
    "q95_diversity_sample"  -> ((s, d) => Similarity.q95(s, d)),
    "q96_dedup_apply"       -> (Dedup.q96 _),
    "q97_weighted_sample"   -> (Text.q97 _),
    "q98_seq_pack"          -> (Text.q98 _),
    "q99_quality_gate"      -> (Text.q99 _),
    "q100_split_assign"     -> (Text.q100 _),
    "q101_profile"          -> (Relational.q101 _),
    "q102_heavy_hitters"    -> (Relational.q102 _),
    "q103_decontaminate"    -> (Dedup.q103 _),
    "q104_mixture_sample"   -> (Text.q104 _),
    "q105_audio_decode"     -> (Multimodal.q105 _),
    "q106_passage_dedup"    -> (Dedup.q106 _),
    "q107_lateral_topk"     -> (Relational.q107 _),
    "q108_concurrency"      -> (Events.q108 _),
    "q109_attribution"      -> (Events.q109 _),
    "q110_token_entropy"    -> (Text.q110 _),
    "q111_nfc_normalize"    -> (Text.q111 _),
    "q112_name_dedup"       -> (Dedup.q112 _),
    "q113_sparse_cosine"    -> (Text.q113 _),
    "q114_semdedup"         -> (Similarity.q114 _),
    "q115_latest_state"     -> (Changes.q115 _),
    "q116_scd2"             -> (Changes.q116 _),
    "q117_trailing_actives" -> (Events.q117 _),
    "q118_band_lookup"      -> (Relational.q118 _),
    "q119_corpus_drift"     -> (Text.q119 _),
    "q120_expectations"     -> (Relational.q120 _),
    "q121_snapshot_diff"    -> (Changes.q121 _),
    "q122_pmi_collocations" -> (Text.q122 _),
    "q123_rate_anomaly"     -> (Events.q123 _),
    "q124_image_dedup"      -> (Multimodal.q124 _),
    "q125_temporal_join"    -> (Changes.q125 _),
    "q126_cms_counts"       -> (Text.q126 _),
    "q127_interpolate"      -> (Events.q127 _),
    "q128_mad_outliers"     -> (Events.q128 _),
    "q129_rank_normalize"   -> (Relational.q129 _),
    "q130_chisq"            -> (Relational.q130 _),
    "q131_rfm"              -> (Relational.q131 _),
    "q132_cohort_value"     -> (Relational.q132 _),
    "q133_hopping"          -> (Events.q133 _),
    "q134_time_to_convert"  -> (Events.q134 _),
    "q135_dup_graph"        -> (Dedup.q135 _),
    "q136_entity_resolution"-> (Dedup.q136 _),
    "q137_incremental_agg"  -> (Changes.q137 _),
    "q138_dense_ids"        -> (Relational.q138 _),
    "q139_dynamic_pivot"    -> (Relational.q139 _),
    "q140_hierarchy"        -> (Relational.q140 _),
    "q141_bpe_vocab"        -> (Text.q141 _),
    "q142_bpe_tokenize"     -> (Text.q142 _),
    "q143_video_frames"     -> (Multimodal.q143 _),
    "q64_streaks"           -> (Events.q64 _),
    "q65_crossmodal_dedup"  -> (Dedup.q65 _),
    "q66_crossmodal_keep"   -> (Dedup.q66 _),
    "q67_robust_scale"      -> (Events.q67 _),
    "q74_stopword_filter" -> (Text.q74 _),
    "q77_session_window"  -> (Events.q77 _),
    "q75_corpus_pipeline" -> (Text.q75 _),
    "q71_frame_sample"    -> (Multimodal.q71 _),
    "q176_decontaminate"  -> (Dedup.q176 _),
    "q177_quantile_sketch" -> (Events.q177 _),
    "q178_twap"           -> (Events.q178 _),
    "q179_stat_segment"   -> (Text.q179 _),
    "q180_derepeat"       -> (Text.q180 _),
    "q181_exact_substring" -> (Dedup.q181 _),
    "q182_bm25_index"     -> (Text.q182 _),
    "q183_k_anonymity"    -> (Relational.q183 _),
    "q184_event_lag"      -> (Events.q184 _),
    "q185_kmv_overlap"    -> (Events.q185 _),
    "q186_mixture_weights" -> (Text.q186 _),
    "q187_rrf_fusion"     -> (Text.q187 _),
    "q188_skew_audit"     -> (Relational.q188 _),
    "q189_semdedup_store" -> (Similarity.q189 _),
    "q190_triangles"      -> (Relational.q190 _),
    "q191_chunk_windows"  -> (Text.q191 _),
    "q192_ann_recall"     -> (Similarity.q192 _),
    "q193_trigram_lm"     -> (Text.q193 _),
    "q194_domain_blocklist" -> (Text.q194 _),
    "q195_embedding_drift" -> (Similarity.q195 _),
    "q196_join_fanout"    -> (Relational.q196 _),
    "q197_label_balance"  -> (Text.q197 _),
    "q198_phrase_search"  -> (Text.q198 _),
    "q199_rendezvous_reshard" -> (Relational.q199 _),
    "q200_psi_drift"      -> (Relational.q200 _),
    "q201_ranking_metrics" -> (Similarity.q201 _),
    "q202_rebalance_plan" -> (Text.q202 _),
    "q203_benford"        -> (Relational.q203 _),
    "q204_trend_regression" -> (Relational.q204 _),
    "q205_weighted_median" -> (Relational.q205 _),
    "q206_dp_counts"      -> (Relational.q206 _),
    "q207_correlated_sample" -> (Relational.q207 _),
    "q208_bootstrap_ci"   -> (Relational.q208 _),
    "q209_ab_test"        -> (Events.q209 _),
    "q210_label_window"   -> (Events.q210 _),
    "q211_fk_audit"       -> (Relational.q211 _),
    "q212_target_encoding" -> (Events.q212 _),
    "q213_feature_hash"   -> (Text.q213 _),
    "q214_quantile_map"   -> (Text.q214 _),
    "q215_session_features" -> (Events.q215 _),
    "q216_term_categories" -> (Text.q216 _),
    "q217_winnowing"      -> (Text.q217 _),
    "q218_effective_tokens" -> (Text.q218 _),
    "q219_fd_audit"       -> (Relational.q219 _),
    "q220_mutual_info"    -> (Relational.q220 _),
    "q221_diversified_topk" -> (Relational.q221 _),
    "q222_survival"       -> (Events.q222 _),
    "q223_conformal"      -> (Text.q223 _),
    "q224_gini"           -> (Relational.q224 _),
    "q248_gini_buckets"   -> (Relational.q248 _),
    "q225_holt_trend"     -> (Events.q225 _),
    "q226_kcore"          -> (Relational.q226 _),
    "q227_merge_upsert"   -> (Changes.q227 _),
    "q228_dedup_eval"     -> (Dedup.q228 _),
    "q229_bpe_fertility"  -> (Text.q229 _),
    "q230_novelty"        -> (Text.q230 _),
    "q231_langid_eval"    -> (Text.q231 _),
    "q232_zipf"           -> (Text.q232 _),
    "q233_epoch_shuffle"  -> (Text.q233 _),
    "q234_split_leakage"  -> (Similarity.q234 _),
    "q235_seg_gap"        -> (Text.q235 _),
    "q236_dataset_card"   -> (Text.q236 _),
    "q237_silhouette"     -> (Similarity.q237 _),
    "q238_card_diff"      -> (Text.q238 _),
    "q239_image_dhash"    -> (Multimodal.q239 _),
    "q240_batch_novelty"  -> (Text.q240 _),
    "q244_novelty_store"  -> (Text.q244 _),
    "q245_embedding_norms" -> (Similarity.q245 _),
    "q241_dup_sources"    -> (Dedup.q241 _),
    "q242_cluster_sizes"  -> (Dedup.q242 _),
    "q243_shard_balance"  -> (Text.q243 _),
    "q246_shard_index"    -> (Text.q246 _),
    "q249_kmv_retention"  -> (Events.q249 _),
    "q247_repeat_spans"   -> (Dedup.q247 _),
    "q250_ann_graph"      -> (Similarity.q250 _),
    "q251_lsh_tuning"     -> (Dedup.q251 _),
    "q252_pad_waste"      -> (Text.q252 _),
    "q253_dedup_savings"  -> (Dedup.q253 _),
    "q254_acf"            -> (Events.q254 _),
    "q255_ccf"            -> (Events.q255 _),
    "q256_changepoint"    -> (Events.q256 _),
    "q257_l_diversity"    -> (Relational.q257 _),
    "q258_temporal_split" -> (Events.q258 _),
    "q259_props_coverage" -> (Events.q259 _),
    "q260_dup_explain"    -> (Dedup.q260 _),
    "q261_cut_curve"      -> (Dedup.q261 _),
    "q262_novelty_decay"  -> (Dedup.q262 _),
    "q263_dup_quality"    -> (Dedup.q263 _),
    "q264_label_noise"    -> (Similarity.q264 _),
    "q265_activity_calendar" -> (Events.q265 _),
    "q266_winsor_audit"   -> (Events.q266 _),
    "q267_script_audit"   -> (Text.q267 _),
    "q268_pipeline_yield" -> (Text.q268 _),
    "q269_boilerplate_hotspots" -> (Dedup.q269 _),
    "q270_mixture_quota"  -> (Text.q270 _),
    "q271_cell_balance"   -> (Similarity.q271 _),
    "q272_communities"    -> (Relational.q272 _),
    "q273_assortativity"  -> (Relational.q273 _),
    "q274_clustering_coeff" -> (Relational.q274 _),
    "q275_cohens_kappa"   -> (Text.q275 _),
    "q276_calibration"    -> (Text.q276 _),
    "q277_hill_tail"      -> (Text.q277 _),
    "q278_auc"            -> (Text.q278 _),
    "q279_mcnemar"        -> (Text.q279 _),
    "q280_vocab_overlap"  -> (Text.q280 _),
    "q281_anisotropy"     -> (Similarity.q281 _),
    "q282_pii_eval"       -> (Text.q282 _),
    "q283_ks_test"        -> (Relational.q283 _),
    "q284_hapax"          -> (Text.q284 _),
    "q285_markov_stationary" -> (Events.q285 _),
    "q286_spearman"       -> (Relational.q286 _),
    "q287_mann_whitney"   -> (Relational.q287 _),
    "q288_vocab_richness" -> (Text.q288 _),
    "q289_stl_decompose"  -> (Events.q289 _),
    "q290_bfs_hops"       -> (Relational.q290 _),
    "q291_mattr"          -> (Text.q291 _),
    "q292_cramers_v"      -> (Relational.q292 _),
    "q293_jl_distortion"  -> (Similarity.q293 _),
    "q294_theil_u"        -> (Relational.q294 _),
    "q295_qq_drift"       -> (Relational.q295 _),
    "q296_runs_test"      -> (Events.q296 _),
    "q297_simpson"        -> (Relational.q297 _),
    "q298_entropy_rate"   -> (Events.q298 _),
    "q299_incremental_read" -> (Changes.q299 _),
    "q300_holt_winters"   -> (Events.q300 _),
    "q301_user_surprisal" -> (Events.q301 _),
    "q302_nprobe_curve"   -> (Similarity.q302 _),
    "q303_engagement_bands" -> (Events.q303 _),
    "q304_file_audit"     -> (Changes.q304 _),
    "q305_item_cf"        -> (Relational.q305 _),
    "q306_decay_score"    -> (Events.q306 _),
    "q307_forecast_eval"  -> (Events.q307 _),
    "q308_pr_auc"         -> (Text.q308 _),
    "q309_edge_embeddedness" -> (Relational.q309 _),
    "q310_lsh_tables_curve" -> (Similarity.q310 _),
    "q311_semdedup_sweep" -> (Similarity.q311 _),
    "q312_pq_distortion"  -> (Similarity.q312 _),
    "q313_bpe_merge_curve" -> (Text.q313 _),
    "q314_dispersion"     -> (Events.q314 _),
    "q315_user_flows"     -> (Events.q315 _),
    "q316_ann_graph_index" -> (Similarity.q316 _),
    "q317_ann_ivfpq"      -> (Similarity.q317 _),
    "q318_ann_ivfpq_index" -> (Similarity.q318 _),
    "q319_unigram_train"  -> (Text.q319 _),
    "q320_unigram_apply"  -> (Text.q320 _),
    "q321_unigram_fertility" -> (Text.q321 _),
    "q322_kendall_tau"    -> (Relational.q322 _),
    "q323_kruskal_wallis" -> (Relational.q323 _),
    "q324_hits"           -> (Relational.q324 _),
    "q325_mmr_rerank"     -> (Similarity.q325 _),
    "q326_hard_negatives" -> (Similarity.q326 _),
    "q327_srm_check"      -> (Relational.q327 _),
    "q328_theil_sen"      -> (Relational.q328 _),
    "q329_benford"        -> (Relational.q329 _),
    "q330_cohort_ltv"     -> (Events.q330 _),
    "q331_schema_drift"   -> (Events.q331 _),
    "q332_textrank"       -> (Text.q332 _),
    "q333_logrank"        -> (Events.q333 _),
    "q334_pacf"           -> (Events.q334 _),
    "q335_freq_triples"   -> (Relational.q335 _),
    "q336_ann_hnsw_index" -> (Similarity.q336 _),
    "q337_welch_t"        -> (Events.q337 _),
    "q340_t_closeness"    -> (Relational.q340 _),
    "q338_anova_f"        -> (Relational.q338 _),
    "q339_cuped"          -> (Events.q339 _),
    "q341_mann_kendall"   -> (Relational.q341 _),
    "q342_periodogram"    -> (Events.q342 _),
    "q343_gopher_rules"   -> (Text.q343 _),
    "q344_isotonic"       -> (Text.q344 _),
    "q347_stratified_ate" -> (Events.q347 _),
    "q348_power_mde"      -> (Events.q348 _),
    "q349_term_burstiness" -> (Text.q349 _),
    "q350_jsd_drift"      -> (Text.q350 _),
    "q351_wordpiece"      -> (Text.q351 _),
    "q352_threshold_pick" -> (Text.q352 _),
    "q353_dup_transitivity" -> (Dedup.q353 _),
    "q354_rouge_pairs"    -> (Dedup.q354 _),
    "q355_cluster_purity" -> (Dedup.q355 _),
    "q356_log_odds_terms" -> (Text.q356 _),
    "q357_rbo"            -> (Similarity.q357 _),
    "q346_link_prediction" -> (Relational.q346 _),
    "q345_wasserstein"    -> (Relational.q345 _),
    "q358_ann_filtered_index" -> (Similarity.q358 _),
    "q359_brown_forsythe" -> (Relational.q359 _),
    "q360_cochran_armitage" -> (Relational.q360 _),
    "q361_k_map"          -> (Relational.q361 _),
    "q362_good_turing"    -> (Text.q362 _),
    "q363_cdc_chunking"   -> (Dedup.q363 _),
    "q364_minhash_calibration" -> (Dedup.q364 _),
    "q365_hurst"          -> (Events.q365 _),
    "q366_ann_delete"     -> (Similarity.q366 _),
    "q367_sq8_distortion" -> (Similarity.q367 _),
    "q368_bh_fdr"         -> (Relational.q368 _),
    "q369_woe_iv"         -> (Relational.q369 _),
    "q370_gain_curve"     -> (Text.q370 _),
    "q371_kneser_ney"     -> (Text.q371 _),
    "q372_brier_decomp"   -> (Text.q372 _),
    "q373_sig_erase"      -> (Dedup.q373 _),
    "q374_bm25_erase"     -> (Text.q374 _),
    "q375_ivf_erase"      -> (Similarity.q375 _),
    "q376_hnsw_filtered"  -> (Similarity.q376 _),
    "q377_kneser_ney_tri" -> (Text.q377 _),
    "q378_wilcoxon"       -> (Relational.q378 _),
    "q379_friedman"       -> (Relational.q379 _),
    "q380_readability"    -> (Text.q380 _),
    "q381_cvm"            -> (Relational.q381 _),
    "q382_jackknife"      -> (Relational.q382 _),
    "q383_tost"           -> (Events.q383 _),
    "q384_sprt"           -> (Events.q384 _),
    "q385_bland_altman"   -> (Text.q385 _),
    "q386_luhn"           -> (Text.q386 _),
    "q387_homoglyphs"     -> (Text.q387 _),
    "q388_markup_scrub"   -> (Text.q388 _),
    "q389_dunn"           -> (Relational.q389 _),
    "q390_effect_size"    -> (Events.q390 _),
    "q391_yuen"           -> (Events.q391 _),
    "q392_delta_ratio"    -> (Relational.q392 _),
    "q393_ratio_mde"      -> (Relational.q393 _),
    "q394_aa_calibration" -> (Events.q394 _),
    "q395_ordinal_assoc"  -> (Relational.q395 _),
    "q396_vad"            -> (Multimodal.q396 _),
    "q397_hnsw_erase"     -> (Similarity.q397 _),
    "q398_l_diversity"    -> (Relational.q398 _),
    "q399_t_closeness"    -> (Relational.q399 _),
    "q400_group_sequential" -> (Events.q400 _),
    "q401_fleiss_kappa"   -> (Text.q401 _),
    "q402_cochran_q"      -> (Text.q402 _),
    "q403_did"            -> (Events.q403 _),
    "q404_qte"            -> (Events.q404 _),
    "q405_ols_two"        -> (Relational.q405 _),
    "q406_ppl_buckets"    -> (Text.q406 _),
    "q407_dtw"            -> (Events.q407 _),
    "q408_audio_clipping" -> (Multimodal.q408 _),
    "q409_icc"            -> (Text.q409 _),
    "q410_mcc"            -> (Events.q410 _),
    "q411_ppr"            -> (Relational.q411 _),
    "q412_chao1"          -> (Text.q412 _),
    "q413_edit_pairs"     -> (Dedup.q413 _),
    "q414_mantel_haenszel" -> (Events.q414 _),
    "q415_removal_effect" -> (Events.q415 _),
    "q416_dedup_capture"  -> (Dedup.q416 _),
    "q417_audio_bands"    -> (Multimodal.q417 _),
    "q418_holm"           -> (Relational.q418 _),
    "q419_png_integrity"  -> (Multimodal.q419 _),
    "q420_neyman"         -> (Relational.q420 _),
    "q421_heaps"          -> (Text.q421 _),
  )

  // DuckDB SQL oracles. Fixed-point helper mirrored from Cols.sqlCents:
  private def C(e: String)  = s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"

  /** Shared by q146 (scan-time BM25) and q182 (persisted-index BM25) —
    * the two are row-identical by construction. */
  /** The BM25 scoring CTE chain (through `sc`), shared by the q146/q182
    * oracle and the q187 fusion oracle. */
  private def bm25Cte: String = bm25CteOver("TRUE")

  /** The same chain over a corpus-predicate subset — q374 replays the
    * post-erasure index as a fresh build over the survivors. */
  private def bm25CteOver(pred: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks
         FROM documents WHERE $pred),
       dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS total_len FROM dl),
       tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM tok
              WHERE tok IN ('query', 'join', 'data') GROUP BY 1, 2),
       dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       sc AS (SELECT tf.doc_id,
              ${BP("ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * ((tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / (st.total_len / st.n_docs)))))")} AS term_bp
              FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), st)"""

  private def bm25Oracle: String = bm25OracleOver("TRUE")

  private def bm25OracleOver(pred: String): String =
    s"""WITH ${bm25CteOver(pred)}
       SELECT doc_id, CAST(sum(term_bp) AS BIGINT) AS score_bp,
              count(*) AS n_terms_hit
       FROM sc GROUP BY 1 ORDER BY score_bp DESC, doc_id LIMIT 20"""
  private def BP(e: String) = s"CAST(floor(($e) * 10000 + 0.5) AS BIGINT)"

  /** q41's quality score — shared verbatim by q223's calibration leg
    * so the conformal oracle cannot drift from the score it
    * thresholds. */
  private def q41OracleSql: String =
    s"""SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
       ${BP("nstop / nt")} AS stop_ratio_bp,
       ${BP("(nchars - (nt - 1)) / nt")} AS mean_word_len_bp,
       ${BP("0.5 * least(nt / 100.0, 1.0) + 0.3 * (1.0 - nstop / nt) + 0.2 * least(((nchars - (nt - 1)) / nt) / 8.0, 1.0)")} AS quality_bp
       FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS nstop,
             CAST(length(text) AS DOUBLE) AS nchars FROM documents)"""

  /** q60's exact brute-force top-10 — shared verbatim by q192's truth
    * leg so the recall oracle cannot drift from the ANN ground truth. */
  private def q60OracleSql: String =
    s"""WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
         FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         WHERE q.vec_id < 10),
       r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
       SELECT query_id, rank, neighbor_id, ${BP("cos")} AS cos_bp FROM r WHERE rank <= 10"""

  /** q325's MMR replay: exact top-pool per query, pairwise pool sims,
    * then TopK unrolled greedy steps — each one anti-join against the
    * selected set, one max-sim lookup, one per-query argmax window
    * with the (mmr DESC, cand ASC) tie order. Every sel/step CTE is
    * MATERIALIZED (referenced twice — the q250 discipline). */
  private def q325OracleSql: String = {
    val pool = graft.ops.Similarity.MmrPool
    val k = graft.ops.Similarity.TopK
    val lam = graft.ops.Similarity.MmrLambdaBp
    val steps = (1 to k).map { t =>
      s"""w$t AS (
        SELECT query_id, CAST($t AS INT) AS rank, cand, rel_bp FROM (
          SELECT r.query_id, r.cand, r.rel_bp,
            row_number() OVER (PARTITION BY r.query_id
              ORDER BY ($lam * r.rel_bp - ${10000 - lam} * COALESCE(m.msim, 0)) DESC,
                r.cand ASC) AS rn
          FROM (SELECT p.* FROM pool p ANTI JOIN s${t - 1} s
                ON s.query_id = p.query_id AND s.cand = p.cand) r
          LEFT JOIN (SELECT pr.query_id, pr.ca AS cand,
                       max(pr.sim_bp) AS msim
                     FROM pairs pr JOIN s${t - 1} ss
                       ON ss.query_id = pr.query_id AND ss.cand = pr.cb
                     GROUP BY pr.query_id, pr.ca) m
            ON m.query_id = r.query_id AND m.cand = r.cand)
        WHERE rn = 1),
      s$t AS MATERIALIZED (SELECT * FROM s${t - 1} UNION ALL SELECT * FROM w$t)"""
    }.mkString(",\n      ")
    s"""WITH pool AS MATERIALIZED (
      SELECT query_id, cand, ${BP("cos")} AS rel_bp FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, cand ASC) AS rn FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS cand,
            list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
              CAST(e.embedding AS DOUBLE[])) AS cos
          FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
          WHERE q.vec_id < 10))
      WHERE rn <= $pool),
    pairs AS MATERIALIZED (
      SELECT x.query_id, x.cand AS ca, y.cand AS cb,
        ${BP("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} AS sim_bp
      FROM pool x JOIN pool y
        ON y.query_id = x.query_id AND y.cand <> x.cand
      JOIN embeddings a ON a.vec_id = x.cand
      JOIN embeddings b ON b.vec_id = y.cand),
    s0 AS (SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS INT) AS rank,
           CAST(NULL AS BIGINT) AS cand, CAST(NULL AS BIGINT) AS rel_bp
           WHERE FALSE),
    $steps
    SELECT query_id, rank, cand AS neighbor_id, rel_bp FROM s$k"""
  }

  /** q334's replay: the q254 ACF chain on the TOTAL daily series,
    * pivoted to one row, then Durbin–Levinson unrolled as nested
    * one-step-per-layer subqueries (every φ is a COLUMN of its layer —
    * the lateral-alias copy trap from the unigram oracle applies). */
  private def q334OracleSql: String = {
    val maxLag = 7
    var inner = "SELECT r1, r2, r3, r4, r5, r6, r7, r1 AS p1_1 FROM pv"
    for (k <- 2 to maxLag) {
      val sumN = (1 until k).map(j => s"p${k - 1}_$j * r${k - j}").mkString(" + ")
      val sumD = (1 until k).map(j => s"p${k - 1}_$j * r$j").mkString(" + ")
      inner = s"SELECT *, 10000 * r$k - ($sumN) AS n$k, 100000000 - ($sumD) AS d$k FROM ($inner)"
      inner = s"SELECT *, CASE WHEN d$k = 0 THEN 0 ELSE (n$k * 10000) // d$k END AS p${k}_$k FROM ($inner)"
      val pjs = (1 until k).map(j =>
        s"p${k - 1}_$j - (p${k}_$k * p${k - 1}_${k - j}) // 10000 AS p${k}_$j")
        .mkString(", ")
      inner = s"SELECT *, $pjs FROM ($inner)"
    }
    val acfCase = (1 to maxLag).map(k => s"WHEN $k THEN r$k").mkString(" ")
    val pacfCase = (1 to maxLag).map(k => s"WHEN $k THEN p${k}_$k").mkString(" ")
    s"""WITH dly AS (SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx FROM dly),
       xb AS (SELECT n, 1000 * sx // n AS xbar_milli FROM st),
       dev AS MATERIALIZED (SELECT day, 1000 * x - xbar_milli AS d
           FROM dly, xb),
       den AS (SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS dn
           FROM dev),
       lgs AS (SELECT unnest(range(1, ${maxLag + 1})) AS lag),
       nums AS (SELECT l.lag,
           CAST(sum(CAST(a.d AS HUGEINT) * b.d) AS HUGEINT) AS nm
           FROM lgs l JOIN dev a ON TRUE
           JOIN dev b ON b.day = a.day + CAST(l.lag AS INT)
           GROUP BY 1),
       acf AS (SELECT lag, CAST(10000 * nm // dn AS BIGINT) AS r
           FROM nums, den),
       pv AS (SELECT ${(1 to maxLag).map(k =>
             s"max(CASE WHEN lag = $k THEN r END) AS r$k").mkString(", ")}
           FROM acf)
       SELECT CAST(lag AS BIGINT) AS lag,
         CASE lag $acfCase END AS acf_bp,
         CASE lag $pacfCase END AS pacf_bp
       FROM ($inner) CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS lag)"""
  }

  /** Shared oracle fragments for the dedup-policy family (q55/q84/q96):
    * one definition of the near-dup cluster labeling, the quality score,
    * and the keep-best pack, so the oracles can't drift apart from each
    * other (the Spark side shares Dedup.q55/electKeepers the same way). */
  /** The q42 marker-argmax predictor chain (through `r`; rn = 1 is the
    * prediction) — shared by the q42 oracle and the q231 eval. Markers
    * mirror Text.langMarkers literally. */
  private val LangIdCtes =
    """sc AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS nt
           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         u AS (
           SELECT doc_id, 'en' AS lang, 0 AS rnk, len(list_filter(toks, t -> t IN ('the','a','is'))) / nt AS score FROM sc
           UNION ALL SELECT doc_id, 'de', 1, len(list_filter(toks, t -> t IN ('der','und','table'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'es', 2, len(list_filter(toks, t -> t IN ('el','y','data'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'fr', 3, len(list_filter(toks, t -> t IN ('le','et','row'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'zh', 4, len(list_filter(toks, t -> t IN ('scan','hash','join'))) / nt FROM sc),
         r AS (SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, rnk ASC) AS rn FROM u)"""

  /** The structured-PNG generator replayed to per-image CELL SUMS
    * (`oc(img_id, cell, cs)`, 8×8 grid, uniform 16-px cells): base
    * images from the mix64 cell values, perturbed copies (+10⁷ ids)
    * with the 3-pixel noise overlay. Shared by the aHash (q124) and
    * dHash (q239) oracles — one definition of the pixel truth. */
  private lazy val PngCellCtes: String =
    s"""cl AS (SELECT doc_id AS base, unnest(range(64)) AS cell FROM documents),
         ${Mix64Ctes("c", "base, cell", "cl", "base*64 + cell")},
         bv AS (SELECT base, cell,
                  CAST((((xor(z, z >> 31)::HUGEINT - CASE WHEN xor(z, z >> 31) >= 9223372036854775808::UBIGINT
                          THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) % 251) + 251) % 251 AS BIGINT) AS v
                FROM c5),
         ni AS (SELECT doc_id AS base, unnest(range(3)) AS i FROM documents),
         ${Mix64Ctes("n", "base, i", "ni", "base*3 + i")},
         nz AS (SELECT base, i, xor(z, z >> 31) AS z FROM n5),
         nv AS (SELECT base, i, CAST(z & 1023 AS BIGINT) AS npx, CAST((z >> 32) % 251 AS BIGINT) AS val FROM nz),
         nk AS (SELECT base, npx, val, ((npx // 32) // 4) * 8 + (npx % 32) // 4 AS cell
                FROM (SELECT *, row_number() OVER (PARTITION BY base, npx ORDER BY i DESC) AS rn FROM nv)
                WHERE rn = 1),
         oc AS (SELECT base, base AS img_id, cell, 16*v AS cs FROM bv
                UNION ALL
                SELECT b.base, b.base + 10000000 AS img_id, b.cell,
                       16*(b.v+4) + coalesce(sum(n.val - (b.v+4)), 0) AS cs
                FROM bv b LEFT JOIN nk n ON n.base = b.base AND n.cell = b.cell
                GROUP BY b.base, b.cell, b.v)"""

  /** The q236 card metrics over `documents d JOIN q` under a
    * predicate — shared by the card and its q238 build-to-build diff. */
  private def CardSelect(pred: String): String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT md5(d.text)) AS BIGINT) AS n_distinct_texts,
           CAST(sum(q.quality_bp) // count(*) AS BIGINT) AS mean_quality_bp,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d.n_chars) AS BIGINT) AS p50_chars,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY d.n_chars) AS BIGINT) AS p90_chars,
           CAST((10000 * (count(*) - count(DISTINCT md5(d.text)))) // count(*) AS BIGINT) AS dup_rate_bp
         FROM documents d JOIN q USING (doc_id) WHERE $pred"""

  private val CardMetrics = Seq("n_docs", "n_langs", "n_sources",
    "n_tokens", "n_distinct_texts", "mean_quality_bp", "p50_chars",
    "p90_chars", "dup_rate_bp")

  private def CardUnpivot(src: String, v: String): String =
    CardMetrics.map(m => s"SELECT '$m' AS metric, $m AS $v FROM $src")
      .mkString(" UNION ALL ")

  private val ShingleCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t)"""
  private val ClusterCtes =
    s"""$ShingleCtes,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
       good AS (SELECT ida, idb FROM pair
                JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
       edges AS (SELECT ida AS a, idb AS b FROM good UNION SELECT idb, ida FROM good),
       reach(node, r) AS (SELECT a, a FROM edges
                          UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
       lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)"""
  private val QualityCte =
    s"""q AS (SELECT doc_id,
           ${BP("0.5 * least(nt / 100.0, 1.0) + 0.3 * (1.0 - nstop / nt) + 0.2 * least(((nchars - (nt - 1)) / nt) / 8.0, 1.0)")} AS quality_bp
         FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
               CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS nstop,
               CAST(length(text) AS DOUBLE) AS nchars FROM documents))"""
  private val KeepPack = "q.quality_bp * 10000000 + (10000000 - lab.node)"

  /** Six-stage splitmix64 (mix64) emulation as chained CTEs: wrapping
    * 64-bit multiplies via HUGEINT hi/lo decomposition reduced mod 2^64,
    * xor/shift on UBIGINT. One definition for every oracle that mirrors
    * a mix64-derived generator (q143/q167/q124) — the consumer reads the
    * finalized value as xor(z, z >> 31) from `<stage>5`. */
  private def Mix64Ctes(stage: String, carry: String, src: String, seed: String): String =
    s"""${stage}0 AS (SELECT $carry, CAST($seed AS UBIGINT) AS z FROM $src),
         ${stage}1 AS (SELECT $carry, CAST((z::HUGEINT + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM ${stage}0),
         ${stage}2 AS (SELECT $carry, xor(z, z >> 30) AS z FROM ${stage}1),
         ${stage}3 AS (SELECT $carry, CAST(((z >> 32)::HUGEINT * 13787848793156543929 % 4294967296 * 4294967296
                                     + (z & 4294967295)::HUGEINT * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM ${stage}2),
         ${stage}4 AS (SELECT $carry, xor(z, z >> 27) AS z FROM ${stage}3),
         ${stage}5 AS (SELECT $carry, CAST(((z >> 32)::HUGEINT * 10723151780598845931 % 4294967296 * 4294967296
                                     + (z & 4294967295)::HUGEINT * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM ${stage}4)"""

  /** The deterministic URL construction (Text.urlTable) mirrored once
    * for both q172 and q173 — query and oracle stay in lockstep. */
  private val UrlCte =
    """u AS (SELECT doc_id,
           'https://' ||
           CASE WHEN doc_id % 5 = 0 THEN upper('www.' || source || tld) ELSE 'www.' || source || tld END ||
           CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END ||
           '/docs/' || (doc_id % 50) || CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END ||
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN '?utm_source=feed&id=' || doc_id || '&utm_campaign=c'
             WHEN 1 THEN '?id=' || doc_id || '&ref=rss'
             WHEN 2 THEN ''
             ELSE '?b=2&a=1&fbclid=F' || doc_id END AS url
           FROM (SELECT doc_id, source, ['.com','.org','.net'][CAST(doc_id % 3 AS INT) + 1] AS tld FROM documents))"""

  // The k-means/ANN family oracles (q61/q62/q63/q91/q95/q114/q144/q145/
  // q168/q170) are GENERATED — unrolled integer-Lloyd training CTEs —
  // and live in AnnOracleSql; merged below.
  def oracleSql: Map[String, String] = AnnOracleSql.all ++ BpeOracleSql.all ++
    UnigramOracleSql.all ++ Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${C("sum(l_quantity)")} AS sum_qty,
         ${C("sum(l_extendedprice)")} AS sum_base_price,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS sum_disc_price,
         ${C("sum(l_extendedprice*(1-l_discount)*(1+l_tax))")} AS sum_charge,
         ${C("avg(l_quantity)")} AS avg_qty,
         ${C("avg(l_extendedprice)")} AS avg_price,
         ${BP("avg(l_discount)")} AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_stats_agg" ->
      s"""SELECT l_returnflag, ${C("min(l_extendedprice)")} AS min_price,
         ${C("max(l_extendedprice)")} AS max_price,
         ${C("stddev_samp(l_extendedprice)")} AS stddev_price,
         ${C("quantile_cont(l_extendedprice, 0.5)")} AS median_price,
         count(*) AS cnt FROM lineitem GROUP BY l_returnflag""",

    "q15_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer
                    WHERE c_acctbal > 7500 GROUP BY 1),
         s AS (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier
               WHERE s_acctbal > 7500 GROUP BY 1)
         SELECT coalesce(nk_c, nk_s) AS nationkey, coalesce(n_cust, 0) AS n_cust,
                coalesce(n_supp, 0) AS n_supp
         FROM c FULL OUTER JOIN s ON nk_c = nk_s""",

    "q20_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         ${C("sum(l_quantity)")} AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",

    "q23_hash_sample" ->
      s"""SELECT count(*) AS n_sampled, ${C("sum(o_totalprice)")} AS sum_price,
         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders
         WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) IN ('0', '7')""",

    "q35_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
         v AS (SELECT user_id, min(t_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(t_us) AS t2 FROM ev e JOIN v USING (user_id)
               WHERE event_type = 'click' AND t_us > t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(t_us) AS t3 FROM ev e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND t_us > t2 GROUP BY 1)
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click,
                (SELECT count(*) FROM p) AS n_purchase""",

    "q36_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         cohort AS (SELECT DISTINCT user_id FROM ev WHERE day = DATE '2024-01-01')
         SELECT datediff('day', DATE '2024-01-01', day) AS day_n,
                count(DISTINCT user_id) AS n_retained
         FROM ev JOIN cohort USING (user_id)
         WHERE datediff('day', DATE '2024-01-01', day) BETWEEN 1 AND 7
         GROUP BY 1""",

    "q45_tfidf" ->
      """WITH terms AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT lang, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         j AS (SELECT tf.lang, tf.term, tf.tf, df.df,
               tf.tf * ln(1.0 + 5.0 / df.df) AS score FROM tf JOIN df USING (term)),
         r AS (SELECT lang, term, tf, df,
               row_number() OVER (PARTITION BY lang ORDER BY score DESC, term ASC) AS rank FROM j)
         SELECT lang, rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
         FROM r WHERE rank <= 10""",

    "q03_topk_revenue" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate  > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q04_semijoin_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority""",

    "q05_multijoin_volume" ->
      s"""SELECT n_name, ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",

    "q06_filter_agg" ->
      s"""SELECT ${C("sum(l_extendedprice*l_discount)")} AS revenue, count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q07_window_rank" ->
      s"""SELECT * FROM (
           SELECT c_custkey, c_nationkey, ${C("c_acctbal")} AS acctbal,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
             ${C("sum(c_acctbal) OVER (PARTITION BY c_nationkey)")} AS nation_total
           FROM customer) WHERE rn <= 5""",

    "q08_sort_limit" ->
      s"""SELECT o_orderkey, ${C("o_totalprice")} AS totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS odate
         FROM orders ORDER BY totalprice DESC, o_orderkey ASC LIMIT 25""",

    "q09_distinct_agg" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status, count(*) AS n_rows
         FROM lineitem""",

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM lineitem, orders, customer, nation
         WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q11_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996),
              b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997)
         SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
         UNION ALL
         SELECT 'only_1996' AS tag, custkey FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
         UNION ALL
         SELECT 'only_1997' AS tag, custkey FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)""",

    "q12_pivot" ->
      s"""SELECT l_returnflag,
         ${C("sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)")} AS qty_f,
         ${C("sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)")} AS qty_o
         FROM lineitem GROUP BY l_returnflag""",

    "q13_outer_join_agg" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
           GROUP BY c_custkey)
         GROUP BY c_count""",

    "q14_case_ratio" ->
      s"""SELECT ${BP("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) / sum(l_extendedprice*(1-l_discount))")} AS promo_pct
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",

    "q16_antijoin" ->
      """SELECT p_brand, p_type, count(*) AS part_cnt
         FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 40)
         GROUP BY p_brand, p_type""",

    "q17_avg_subquery" ->
      s"""SELECT ${C("sum(l_extendedprice) / 7.0")} AS avg_yearly, count(*) AS cnt
         FROM lineitem, part,
           (SELECT l_partkey AS ap_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey) a
         WHERE p_partkey = l_partkey AND p_size <= 5
           AND ap_partkey = l_partkey AND l_quantity < half_avg_qty""",

    "q18_having" ->
      s"""SELECT c_name, c_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS odate,
         ${C("o_totalprice")} AS totalprice, ${C("bo.total_qty")} AS total_qty
         FROM (SELECT l_orderkey AS bo_orderkey, sum(l_quantity) AS total_qty
               FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) bo,
              orders, customer
         WHERE bo_orderkey = o_orderkey AND o_custkey = c_custkey""",

    "q19_disjunctive" ->
      s"""SELECT ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue, count(*) AS cnt
         FROM lineitem, part
         WHERE l_partkey = p_partkey AND (
           (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11) OR
           (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) OR
           (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""",

    "q21_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         ${C("sum(l_quantity)")} AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q22_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
         coalesce(o_orderpriority, 'ALL') AS orderpriority,
         ${C("sum(o_totalprice)")} AS sum_price, count(*) AS cnt
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "q24_string_funcs" ->
      """SELECT p_brand, count(*) AS n_parts,
         CAST(sum(length(p_name)) AS BIGINT) AS sum_name_len,
         max(upper(p_name)) AS max_upper_name,
         min(concat_ws('-', p_type, p_name)) AS min_type_name,
         count(DISTINCT substring(p_name, 1, 3)) AS n_prefixes,
         min(lpad(reverse(p_name), 12, '_')) AS min_rev_pad
         FROM part GROUP BY p_brand""",

    "q25_date_arith" ->
      """SELECT year(o_orderdate) AS o_year, quarter(o_orderdate) AS o_quarter,
         count(*) AS n_orders, count(DISTINCT month(o_orderdate)) AS n_months,
         count(DISTINCT isodow(o_orderdate)) AS n_isodows,
         min(strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')) AS min_plus30,
         max(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')) AS max_days_to_eoy
         FROM orders GROUP BY 1, 2""",

    "q26_explode_words" ->
      s"""SELECT word, count(*) AS n_occurrences,
         count(DISTINCT p_partkey) AS n_parts, ${BP("avg(pos)")} AS avg_pos_bp
         FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
               unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS pos FROM part)
         GROUP BY word""",

    "q27_regex" ->
      """SELECT lang,
         CAST(sum(CASE WHEN regexp_matches(text, 'join [a-z]+ hash') THEN 1 ELSE 0 END) AS BIGINT) AS n_join_hash,
         CAST(sum(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS sum_novowel_len,
         CAST(sum(len(regexp_extract_all(text, '\b(scan|join|merge)\b'))) AS BIGINT) AS n_op_mentions,
         count(*) AS n_docs
         FROM documents GROUP BY lang""",

    "q28_percentiles" ->
      s"""SELECT l_returnflag,
         ${C("quantile_cont(l_extendedprice, 0.25)")} AS p25,
         ${C("quantile_cont(l_extendedprice, 0.50)")} AS p50,
         ${C("quantile_cont(l_extendedprice, 0.75)")} AS p75,
         ${C("quantile_cont(l_extendedprice, 0.95)")} AS p95,
         count(*) AS cnt FROM lineitem GROUP BY l_returnflag""",

    "q29_salted_join" ->
      s"""SELECT p_brand, CAST(sum(${C("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue,
         count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",

    "q37_rolling_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events)
         SELECT user_id, event_id, ts_us,
           CAST(sum(vc) OVER w_cum AS BIGINT) AS cum_value_c,
           CAST(sum(vc) OVER w3 AS BIGINT) AS sum3_c,
           count(*) OVER w3 AS n3,
           CAST(floor(CAST(sum(vc) OVER w3 AS DOUBLE) / (count(*) OVER w3)) AS BIGINT) AS avg3_c
         FROM e
         WINDOW w_cum AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING),
                w3 AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",

    "q38_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bucket,
         count(*) AS n_orders, ${C("sum(o_totalprice)")} AS sum_price,
         ${C("min(o_totalprice)")} AS min_price, ${C("max(o_totalprice)")} AS max_price
         FROM orders GROUP BY 1""",

    "q39_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
         FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id <> b.event_id
           AND b.us BETWEEN a.us AND a.us + 300000000
         GROUP BY 1, 2""",

    "q47_stratified_sample" ->
      """SELECT lang, rn, doc_id, source FROM (
           SELECT lang, doc_id, source,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
           FROM documents) WHERE rn <= 20""",

    "q48_pii_scrub" ->
      """SELECT source, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS n_num_runs,
         CAST(sum(length(regexp_replace(regexp_replace(text,
           '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g'), '[0-9]+', '<num>', 'g'))) AS BIGINT) AS sum_scrub_len,
         CAST(sum(length(text)) AS BIGINT) AS sum_raw_len
         FROM documents GROUP BY 1""",

    // Generator-replay of the planted emails + the exact q48 scrub
    // chain; caught = the planted token normalizes to exactly <email>.
    "q282_pii_eval" ->
      """WITH pl AS (SELECT doc_id % 4 AS variant,
           CASE doc_id % 4
             WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR) || '@mail.com'
             WHEN 1 THEN 'User' || CAST(doc_id AS VARCHAR) || '@mail.com'
             WHEN 2 THEN 'user.' || CAST(doc_id AS VARCHAR) || '+tag@mail.com'
             ELSE CAST(doc_id AS VARCHAR) || '_user@mail.com' END AS email,
           text FROM documents),
         sc AS (SELECT variant,
           regexp_replace(regexp_replace(text || ' ' || email,
             '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g'),
             '[0-9]+', '<num>', 'g') AS s FROM pl),
         lt AS (SELECT variant, ts[len(ts)] AS last_tok
               FROM (SELECT variant, string_split(s, ' ') AS ts FROM sc))
         SELECT CAST(variant AS BIGINT) AS variant,
           CASE variant WHEN 0 THEN 'plain' WHEN 1 THEN 'upper_local'
                WHEN 2 THEN 'plus_tag' ELSE 'underscore' END AS variant_name,
           count(*) AS n_planted,
           CAST(sum(CASE WHEN last_tok = '<email>' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_caught,
           CAST(10000 * sum(CASE WHEN last_tok = '<email>' THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS recall_bp
         FROM lt GROUP BY 1, 2""",

    "q49_repetition" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
         b AS (SELECT lang, len(toks) - 1 AS total,
               len(list_distinct(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1]))) AS nd
               FROM t WHERE len(toks) >= 2),
         r AS (SELECT lang, 1.0 - nd / CAST(total AS DOUBLE) AS rep FROM b)
         SELECT lang, count(*) AS n_docs, ${BP("avg(rep)")} AS avg_rep_bp,
           ${BP("max(rep)")} AS max_rep_bp,
           CAST(sum(CASE WHEN rep > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
         FROM r GROUP BY 1""",

    "q46_normalize_dedup" ->
      """SELECT md5(norm) AS norm_hash, min(doc_id) AS keep_id,
         count(*) AS n_copies, min(length(norm)) AS norm_len
         FROM (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM documents)
         GROUP BY 1""",

    "q55_dedup_clusters" ->
      s"""WITH RECURSIVE $ClusterCtes,
         cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         SELECT lab.node AS doc_id, lab.cluster_id, cs.cluster_size
         FROM lab JOIN cs USING (cluster_id)""",

    // Keeper = cluster label (min member id); savings = non-keeper
    // token mass per source, bp by truncating division.
    "q253_dedup_savings" ->
      s"""WITH RECURSIVE $ClusterCtes,
         tk AS (SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         j AS (SELECT tk.source, tk.n_tokens,
               CASE WHEN lab.cluster_id IS NOT NULL AND lab.cluster_id <> tk.doc_id
                    THEN 1 ELSE 0 END AS red
               FROM tk LEFT JOIN lab ON lab.node = tk.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(red) AS BIGINT) AS n_redundant,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(sum(n_tokens * red) AS BIGINT) AS tokens_saved,
           CAST(10000 * sum(n_tokens * red) // sum(n_tokens) AS BIGINT) AS savings_bp
         FROM j GROUP BY 1""",

    "q83_unpivot" ->
      s"""WITH w AS (SELECT l_returnflag, ${C("sum(l_quantity)")} AS sum_qty,
             ${C("sum(l_extendedprice)")} AS sum_price, count(*) AS n_rows
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
         UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
         UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w""",

    "q84_dedup_keep_best" ->
      s"""WITH RECURSIVE $ClusterCtes,
         cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1),
         $QualityCte
         SELECT lab.cluster_id, cs.cluster_size,
           arg_max(lab.node, $KeepPack) AS keep_id,
           arg_max(q.quality_bp, $KeepPack) AS keep_quality_bp
         FROM lab JOIN q ON q.doc_id = lab.node JOIN cs USING (cluster_id)
         GROUP BY 1, 2""",

    "q97_weighted_sample" ->
      """WITH t AS (SELECT doc_id, lang, length(text) AS w,
           ((((doc_id % 1000003) * 427799) % 1000003) + 1) / 1000004.0 AS u
           FROM documents),
         r AS (SELECT doc_id, lang,
               row_number() OVER (ORDER BY ln(u) / w DESC, doc_id ASC) AS rank FROM t)
         SELECT rank, doc_id, lang FROM r WHERE rank <= 20""",

    "q96_dedup_apply" ->
      s"""WITH RECURSIVE $ClusterCtes,
         $QualityCte,
         keep AS (SELECT arg_max(lab.node, $KeepPack) AS keep_id
                  FROM lab JOIN q ON q.doc_id = lab.node GROUP BY lab.cluster_id)
         SELECT d.doc_id, d.lang, d.source FROM documents d
         WHERE d.doc_id IN (SELECT keep_id FROM keep)
            OR d.doc_id NOT IN (SELECT node FROM lab)""",

    "q98_seq_pack" ->
      """WITH t AS (SELECT doc_id, doc_id % 16 AS bucket,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok FROM t)
         SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(floor(start_tok / 512.0) AS BIGINT) AS bin_id,
           CAST(start_tok % 512 AS BIGINT) AS bin_offset, n_tokens FROM c""",

    // Shard audit = q98's CTE composed with per-bucket ceil-division
    // bin counts; every bin full except each bucket's last.
    "q246_shard_index" ->
      """WITH t AS (SELECT doc_id, doc_id % 16 AS bucket,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok FROM t),
         l AS (SELECT doc_id, bucket, start_tok // 512 AS bin_id FROM c),
         pb AS (SELECT bucket, sum(n_tokens) AS t_b,
                (sum(n_tokens) + 511) // 512 AS n_bins FROM t GROUP BY 1),
         bins AS (SELECT bucket, t_b, n_bins,
                unnest(range(0, CAST(n_bins AS BIGINT))) AS bin_id FROM pb),
         bf AS (SELECT bucket, bin_id,
                CASE WHEN bin_id < n_bins - 1 THEN 512
                     ELSE t_b - (n_bins - 1) * 512 END AS n_fill FROM bins),
         st AS (SELECT bucket, bin_id, count(*) AS n_docs_start FROM l GROUP BY 1, 2)
         SELECT CAST(bf.bucket AS BIGINT) AS bucket, CAST(bf.bin_id AS BIGINT) AS bin_id,
           CAST(COALESCE(st.n_docs_start, 0) AS BIGINT) AS n_docs_start,
           CAST(bf.n_fill AS BIGINT) AS n_fill,
           CAST(512 - bf.n_fill AS BIGINT) AS n_pad
         FROM bf LEFT JOIN st ON st.bucket = bf.bucket AND st.bin_id = bf.bin_id""",

    "q99_quality_gate" ->
      s"""WITH $QualityCte,
         ql AS (SELECT q.doc_id, d.lang, q.quality_bp
                FROM q JOIN documents d USING (doc_id)),
         thr AS (SELECT lang,
                   percentile_disc(0.10) WITHIN GROUP (ORDER BY quality_bp) AS thr_bp
                 FROM ql GROUP BY 1)
         SELECT ql.doc_id, ql.lang, ql.quality_bp, thr.thr_bp
         FROM ql JOIN thr USING (lang) WHERE ql.quality_bp >= thr.thr_bp""",

    "q100_split_assign" ->
      """SELECT doc_id, lang,
           CASE WHEN ((doc_id % 1000003) * 427799) % 1000003 % 10 < 8 THEN 'train'
                WHEN ((doc_id % 1000003) * 427799) % 1000003 % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
         FROM documents""",

    "q101_profile" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS o_orderdate FROM orders)
         SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
           count(o_orderkey) AS n_vals, count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
         FROM o
         UNION ALL SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM o
         UNION ALL SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM o
         UNION ALL SELECT 'o_orderdate', count(*), count(o_orderdate), count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM o""",

    "q102_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
         t AS (SELECT sum(n) AS total FROM c)
         SELECT user_id, n, CAST(floor(n * 10000.0 / total) AS BIGINT) AS share_bp
         FROM c CROSS JOIN t
         ORDER BY n DESC, user_id ASC LIMIT 10""",

    "q103_decontaminate" ->
      s"""WITH $ShingleCtes,
         bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
         SELECT sh.doc_id, count(*) AS n_hits
         FROM sh JOIN bs USING (shingle) WHERE sh.doc_id % 10 <> 0
         GROUP BY 1""",

    // q100's knuth split: shard < 8 train, = 8 val, > 8 test; distinct
    // 3-token windows from the shared ShingleCtes; count(tr.shingle)
    // counts matched (non-null) windows under the left join.
    "q230_novelty" ->
      s"""WITH $ShingleCtes,
         sp AS (SELECT doc_id, ((doc_id % 1000003) * 427799) % 1000003 % 10 AS shard
                FROM documents),
         tr AS (SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id) WHERE sp.shard < 8),
         te AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN sp USING (doc_id) WHERE sp.shard > 8)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(tr.shingle) AS BIGINT) AS n_seen,
           CAST((10000 * (count(*) - count(tr.shingle))) // count(*) AS BIGINT) AS novelty_bp
         FROM te LEFT JOIN tr ON te.shingle = tr.shingle
         GROUP BY doc_id""",

    // sources AND docs swap together into the canonical cell (mirrors
    // dupSourceMatrix): n_docs_a counts documents OF source_a.
    "q241_dup_sources" ->
      s"""WITH RECURSIVE $ClusterCtes,
         j AS (SELECT CASE WHEN da.source <= db.source THEN da.source ELSE db.source END AS source_a,
                      CASE WHEN da.source <= db.source THEN db.source ELSE da.source END AS source_b,
                      CASE WHEN da.source <= db.source THEN g.ida ELSE g.idb END AS da_doc,
                      CASE WHEN da.source <= db.source THEN g.idb ELSE g.ida END AS db_doc
               FROM good g JOIN documents da ON da.doc_id = g.ida
               JOIN documents db ON db.doc_id = g.idb)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT da_doc) AS BIGINT) AS n_docs_a,
           CAST(count(DISTINCT db_doc) AS BIGINT) AS n_docs_b
         FROM j GROUP BY 1, 2""",

    "q242_cluster_sizes" ->
      s"""WITH RECURSIVE $ClusterCtes,
         lsz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                 FROM lab GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST((10000 * cluster_size * count(*)) // n AS BIGINT) AS doc_share_bp
         FROM lsz CROSS JOIN tot GROUP BY cluster_size, n""",

    // q244 audits through the persisted hash store but is row-identical
    // to the direct q240 scan by construction — same oracle.
    "q244_novelty_store" ->
      s"""WITH $ShingleCtes,
         ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
         te AS (SELECT sh.doc_id, sh.shingle FROM sh WHERE doc_id % 2 = 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(ref.shingle) AS BIGINT) AS n_seen,
           CAST((10000 * (count(*) - count(ref.shingle))) // count(*) AS BIGINT) AS novelty_bp
         FROM te LEFT JOIN ref ON te.shingle = ref.shingle
         GROUP BY doc_id""",

    // norms on the quantizer grid (floor(x·2^14), integer squares) —
    // exact in any engine; bucket = norm²_q div 2^26.
    "q245_embedding_norms" ->
      """WITH nq AS (SELECT vec_id,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT)
                  * CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT))) AS BIGINT) AS n2
           FROM embeddings)
         SELECT n2 // 67108864 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(min(n2) AS BIGINT) AS min_norm2_q,
           CAST(max(n2) AS BIGINT) AS max_norm2_q
         FROM nq GROUP BY 1""",

    "q240_batch_novelty" ->
      s"""WITH $ShingleCtes,
         ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
         te AS (SELECT sh.doc_id, sh.shingle FROM sh WHERE doc_id % 2 = 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(ref.shingle) AS BIGINT) AS n_seen,
           CAST((10000 * (count(*) - count(ref.shingle))) // count(*) AS BIGINT) AS novelty_bp
         FROM te LEFT JOIN ref ON te.shingle = ref.shingle
         GROUP BY doc_id""",

    // Per-term bp(ln) fixed point (the q90 discipline), then exact
    // integer least squares; r² rides HUGEINT (num² ~ 5·10²⁴ worst
    // case outruns BIGINT — mirrors the Spark side's decimal(38,0)).
    "q232_zipf" ->
      """WITH tk AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1, 2),
         st AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS vocab FROM tf GROUP BY 1),
         rk AS (SELECT lang, tok, cnt,
                  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS rank
                FROM tf QUALIFY rank <= 16),
         fx AS (SELECT lang,
                  CAST(floor(ln(rank) * 10000 + 0.5) AS BIGINT) AS lx,
                  CAST(floor(ln(cnt) * 10000 + 0.5) AS BIGINT) AS ly FROM rk),
         rg AS (SELECT lang, CAST(count(*) AS BIGINT) AS k,
                  sum(lx) AS sx, sum(ly) AS sy, sum(lx * lx) AS sxx,
                  sum(lx * ly) AS sxy, sum(ly * ly) AS syy
                FROM fx GROUP BY 1)
         SELECT rg.lang, n_tokens, vocab, k AS k_ranks,
           CAST(CASE WHEN k * sxx - sx * sx = 0 THEN 0 ELSE
             (10000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx)
             END AS BIGINT) AS zipf_slope_bp,
           CAST(CASE WHEN k * syy - sy * sy = 0 THEN 0 ELSE
             (10000::HUGEINT * (k * sxy - sx * sy)::HUGEINT * (k * sxy - sx * sy)::HUGEINT)
               // ((k * sxx - sx * sx)::HUGEINT * (k * syy - sy * sy)::HUGEINT)
             END AS BIGINT) AS r2_bp
         FROM rg JOIN st USING (lang)""",

    // distinct counts compare as cardinalities, so the engines' md5
    // representations never meet; percentile_disc parity is the q99
    // precedent (actual member of the integer domain, exact long).
    "q236_dataset_card" ->
      s"""WITH $QualityCte
         ${CardSelect("TRUE")}""",

    "q238_card_diff" ->
      s"""WITH $QualityCte,
         o AS (${CardSelect("d.doc_id % 2 = 0")}),
         n AS (${CardSelect("TRUE")}),
         ol AS (${CardUnpivot("o", "old_v")}),
         nl AS (${CardUnpivot("n", "new_v")})
         SELECT ol.metric, ol.old_v, nl.new_v,
           nl.new_v - ol.old_v AS delta
         FROM ol JOIN nl USING (metric)""",

    // md5_number_upper is the little-endian 64-bit mirror of the
    // codegen'd Md5Hash64; % 32 keeps low bits (power-of-two modulus —
    // signed/unsigned cannot disagree) and UBIGINT ASC order equals the
    // Spark side's sign-bit-flipped long order.
    "q233_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
             md5_number_upper('ep1:' || CAST(doc_id AS VARCHAR)) AS h FROM documents)
         SELECT doc_id, CAST(h % 32 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 32 ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos
         FROM h""",

    "q243_shard_balance" ->
      """WITH h AS (SELECT doc_id,
             CAST(md5_number_upper('ep1:' || CAST(doc_id AS VARCHAR)) % 32 AS BIGINT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
         per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(n_toks) AS BIGINT) AS n_tokens
                 FROM h GROUP BY 1),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_toks FROM per)
         SELECT shard, n_docs, n_tokens,
           CAST((10000 * (n_tokens * 32 - total_toks)) // total_toks AS BIGINT) AS dev_bp
         FROM per CROSS JOIN tot""",

    "q106_passage_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         ix AS (SELECT doc_id, words,
           unnest(generate_series(0, greatest(CAST(ceil(len(words) / 20.0) AS BIGINT), 1) - 1)) AS pass_idx
           FROM w),
         p AS (SELECT doc_id, pass_idx,
           array_to_string(words[(pass_idx * 20 + 1):(pass_idx * 20 + 20)], ' ') AS passage
           FROM ix),
         r AS (SELECT doc_id, pass_idx,
           row_number() OVER (PARTITION BY passage ORDER BY doc_id, pass_idx) AS rn
           FROM p)
         SELECT doc_id, count(*) AS n_passages,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages
         FROM r GROUP BY 1""",

    "q104_mixture_sample" ->
      """WITH tk AS (SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         tot AS (SELECT source, sum(n_tokens) AS total_toks FROM tk GROUP BY 1),
         b AS (SELECT min(total_toks) AS budget FROM tot),
         thr AS (SELECT source, (budget * 1000003) // total_toks AS keep_thr
                 FROM tot CROSS JOIN b)
         SELECT tk.doc_id, tk.source, tk.n_tokens
         FROM tk JOIN thr USING (source)
         WHERE ((tk.doc_id % 1000003) * 815781) % 1000003 < thr.keep_thr""",

    "q30_tumbling_window" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
         count(*) AS n_events, ${C("sum(value)")} AS sum_value, ${C("avg(value)")} AS avg_value
         FROM events GROUP BY 1, 2""",

    "q31_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
         l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
         ss AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
         count(*) AS n_events, ${C("sum(value)")} AS sum_value FROM ss GROUP BY 1, 2""",

    "q32_topk_per_group" ->
      s"""SELECT user_id, event_id, value_c, rn FROM (
           SELECT user_id, event_id, ${C("value")} AS value_c,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
           FROM events) WHERE rn <= 3""",

    "q56_topk_aggregate" ->
      s"""SELECT user_id, event_id, value_c, rn FROM (
           SELECT user_id, event_id, ${C("value")} AS value_c,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
           FROM events) WHERE rn <= 3""",

    "q57_bloom_semijoin" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         ${C("sum(o_totalprice)")} AS sum_price
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
         GROUP BY 1""",

    "q58_window_surface" ->
      s"""SELECT o_orderkey, o_orderpriority,
         ${C("lag(o_totalprice, 1) OVER w")} AS prev_price_c,
         ${C("lead(o_totalprice, 1) OVER w")} AS next_price_c,
         ntile(4) OVER w AS tile,
         ${BP("percent_rank() OVER w")} AS pr_bp,
         ${BP("cume_dist() OVER w")} AS cd_bp
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice ASC, o_orderkey ASC)""",

    "q59_string_agg" ->
      """WITH t AS (SELECT s_nationkey, s_name,
           row_number() OVER (PARTITION BY s_nationkey
                              ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
         FROM supplier)
         SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS top_suppliers,
                count(*) AS n_top
         FROM t WHERE rn <= 5 GROUP BY 1""",

    "q72_asof_forward" ->
      """WITH j AS (SELECT o.o_orderkey, o.o_custkey, epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS od_us,
                           e.ts, e.event_id
                    FROM orders o JOIN events e ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
         m AS (SELECT o_orderkey, o_custkey, od_us, min(ts) AS mt FROM j GROUP BY 1, 2, 3)
         SELECT m.o_orderkey, m.o_custkey AS custkey, m.od_us,
                max(j.event_id) AS next_event_id, epoch_us(m.mt) AS next_event_us
         FROM m JOIN j ON j.o_orderkey = m.o_orderkey AND j.ts = m.mt
         GROUP BY 1, 2, 3, 5""",

    "q74_stopword_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         f AS (SELECT doc_id, len(toks) AS n_raw,
                 list_filter(toks, x -> NOT list_contains(['the','a','of','and','to','in','is','it'], x)) AS kept
               FROM t)
         SELECT doc_id, n_raw, len(kept) AS n_kept,
                array_to_string(kept[1:5], ' ') AS kept_head
         FROM f""",

    "q75_corpus_pipeline" ->
      """WITH q AS (SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
             CAST(len(list_filter(string_split(text, ' '),
               x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE) AS nstop,
             CAST(length(text) AS DOUBLE) AS nchars
           FROM documents),
         f AS (SELECT * FROM q
               WHERE 0.5 * least(nt / 100.0, 1.0) + 0.3 * (1.0 - nstop / nt)
                     + 0.2 * least(((nchars - (nt - 1)) / nt) / 8.0, 1.0) >= 0.5),
         d AS (SELECT *, row_number() OVER (
                 PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
                 ORDER BY doc_id ASC) AS dup_rn FROM f),
         r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
               FROM d WHERE dup_rn = 1)
         SELECT lang, rn, doc_id FROM r WHERE rn <= 10""",

    // Boundary semantics: session_window merges an event iff it lands
    // STRICTLY inside the previous [start, last+gap) window, so the
    // oracle starts a new session at diff >= gap (q31's hand-rolled rule
    // is inclusive; the synthetic micro-timestamps never hit the exact
    // boundary, but the oracle mirrors the built-in's definition).
    "q77_session_window" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value, event_id FROM events),
         l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
         ss AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
                count(*) AS n_events, ${C("sum(value)")} AS sum_value
         FROM ss GROUP BY user_id, sid""",

    "q78_label_centroids" ->
      s"""WITH x AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                            unnest(embedding) AS val FROM embeddings)
         SELECT label, CAST(i - 1 AS INT) AS dim,
                ${BP("avg(CAST(val AS DOUBLE))")} AS mean_bp
         FROM x GROUP BY 1, 2""",

    "q79_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
                        FROM events GROUP BY 1, 2),
         spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         cal AS (SELECT s.user_id, gs.day FROM spans s
                 JOIN (SELECT CAST(unnest(generate_series(
                         (SELECT min(d0) FROM spans), (SELECT max(d1) FROM spans),
                         INTERVAL 1 DAY)) AS DATE) AS day) gs
                   ON gs.day BETWEEN s.d0 AND s.d1)
         SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
                coalesce(d.n_events, 0) AS n_events
         FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day""",

    "q80_filtered_aggs" ->
      s"""SELECT l_returnflag,
         count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
         count(DISTINCT l_orderkey) FILTER (WHERE l_quantity > 25) AS n_bulk_orders,
         count(DISTINCT l_orderkey) AS n_orders,
         ${C("sum(l_extendedprice * (1 - l_discount)) FILTER (WHERE l_discount > 0.05)")} AS disc_revenue,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1""",

    "q81_null_semantics" ->
      s"""WITH t AS (SELECT o_orderpriority,
             nullif(o_orderstatus, 'O') AS st,
             CASE WHEN o_totalprice > 150000 THEN o_totalprice END AS big_price
           FROM orders)
         SELECT o_orderpriority, count(*) AS n_rows,
           count(st) AS n_nonnull_status,
           count(big_price) AS n_big,
           ${C("avg(big_price)")} AS avg_big,
           CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status,
           CAST(sum(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f_status
         FROM t GROUP BY 1""",

    "q82_argmax" ->
      s"""SELECT o_orderpriority,
         arg_max(o_orderkey, ${C("o_totalprice")} * 10000000 + o_orderkey) AS max_price_order,
         arg_min(o_orderkey, ${C("o_totalprice")} * 10000000 + o_orderkey) AS min_price_order,
         ${C("max(o_totalprice)")} AS max_price,
         ${C("min(o_totalprice)")} AS min_price
         FROM orders GROUP BY 1""",

    "q85_monthly_trend" ->
      s"""WITH m AS (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             ${C("sum(o_totalprice)")} AS revenue, count(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT month, revenue, n_orders,
           CAST(sum(revenue) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue
         FROM m""",

    "q86_setops_all" ->
      """WITH a AS (SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity >= 30),
         b AS (SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_discount >= 0.05),
         i AS (SELECT l_returnflag, count(*) AS n_intersect
               FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
         e AS (SELECT l_returnflag, count(*) AS n_except
               FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
         SELECT coalesce(i.l_returnflag, e.l_returnflag) AS l_returnflag,
                coalesce(n_intersect, 0) AS n_intersect,
                coalesce(n_except, 0) AS n_except
         FROM i FULL OUTER JOIN e ON i.l_returnflag = e.l_returnflag""",

    "q73_asof_native" ->
      """WITH j AS (SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, o.o_orderdate, o.o_orderkey
                    FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
         m AS (SELECT event_id, user_id, ts_us, max(o_orderdate) AS md FROM j GROUP BY 1, 2, 3)
         SELECT m.event_id, m.user_id, m.ts_us, max(j.o_orderkey) AS last_orderkey,
                epoch_us(m.md) AS last_order_us
         FROM m JOIN j ON j.event_id = m.event_id AND j.o_orderdate = m.md
         GROUP BY 1, 2, 3, 5""",

    "q33_asof_join" ->
      """WITH j AS (SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, o.o_orderdate, o.o_orderkey
                    FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
         m AS (SELECT event_id, user_id, ts_us, max(o_orderdate) AS md FROM j GROUP BY 1, 2, 3)
         SELECT m.event_id, m.user_id, m.ts_us, max(j.o_orderkey) AS last_orderkey,
                epoch_us(m.md) AS last_order_us
         FROM m JOIN j ON j.event_id = m.event_id AND j.o_orderdate = m.md
         GROUP BY 1, 2, 3, 5""",

    "q87_asof_outer" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, ts FROM events),
         j AS (SELECT e.event_id, o.o_orderdate, o.o_orderkey FROM e JOIN orders o
               ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
         m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY 1),
         b AS (SELECT m.event_id, epoch_us(m.md) AS last_order_us,
                      max(j.o_orderkey) AS last_orderkey
               FROM m JOIN j ON j.event_id = m.event_id AND j.o_orderdate = m.md
               GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, e.ts_us, b.last_orderkey, b.last_order_us
         FROM e LEFT JOIN b USING (event_id)""",

    "q34_json_extract" ->
      s"""SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, ${C("avg(k)")} AS avg_k,
         count(DISTINCT k) AS n_distinct_k, count(*) AS cnt
         FROM (SELECT event_type, CAST(json_extract(props, '$$.k') AS BIGINT) AS k FROM events)
         GROUP BY event_type""",

    "q40_token_stats" ->
      s"""SELECT lang, CAST(sum(n_ws) AS BIGINT) AS sum_ws_tokens,
         CAST(sum(n_bpe) AS BIGINT) AS sum_bpe_tokens,
         ${C("avg(n_ws)")} AS avg_ws_tokens, max(n_ws) AS max_ws_tokens, count(*) AS n_docs
         FROM (SELECT lang, len(string_split(text, ' ')) AS n_ws,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe FROM documents)
         GROUP BY lang""",

    "q41_quality_score" -> q41OracleSql,

    "q42_langid" ->
      s"""WITH $LangIdCtes
         SELECT doc_id, lang AS pred_lang, ${BP("score")} AS top_score_bp FROM r WHERE rn = 1""",

    // q42's predictor joined back to the lang label: confusion-matrix
    // cells with row-share bp (diagonal = per-language recall).
    "q231_langid_eval" ->
      s"""WITH $LangIdCtes,
         p AS (SELECT doc_id, lang AS pred_lang FROM r WHERE rn = 1),
         j AS (SELECT d.lang AS lang_true, p.pred_lang
               FROM documents d JOIN p USING (doc_id)),
         c AS (SELECT lang_true, pred_lang, CAST(count(*) AS BIGINT) AS n
               FROM j GROUP BY 1, 2),
         t AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS n_true FROM c GROUP BY 1)
         SELECT c.lang_true, c.pred_lang, n,
           CAST((10000 * n) // n_true AS BIGINT) AS share_bp
         FROM c JOIN t USING (lang_true)""",

    // Cohen's kappa over the q42-vs-label pairs: confusion cells →
    // marginals → κ_bp = 10⁴(N·agree − Σrc)/(N² − Σrc), HUGEINT
    // products mirroring the decimal(38,0) Spark side, null when
    // pe = 1 (both raters constant).
    "q275_cohens_kappa" ->
      s"""WITH $LangIdCtes,
         p AS (SELECT doc_id, lang AS pred_lang FROM r WHERE rn = 1),
         j AS (SELECT d.lang AS ra, p.pred_lang AS rb
               FROM documents d JOIN p USING (doc_id)),
         cells AS MATERIALIZED (SELECT ra, rb, count(*) AS n FROM j GROUP BY 1, 2),
         rm AS (SELECT ra AS cls, sum(n) AS r FROM cells GROUP BY 1),
         cm AS (SELECT rb AS cls, sum(n) AS c FROM cells GROUP BY 1),
         pe AS (SELECT sum(CAST(coalesce(r, 0) AS HUGEINT)
                         * CAST(coalesce(c, 0) AS HUGEINT)) AS rc
                FROM rm FULL OUTER JOIN cm USING (cls)),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_items,
                 CAST(sum(CASE WHEN ra = rb THEN n ELSE 0 END) AS BIGINT) AS n_agree
                 FROM cells)
         SELECT n_items, n_agree,
           CAST(10000 * n_agree // n_items AS BIGINT) AS po_bp,
           CAST(10000 * rc // (CAST(n_items AS HUGEINT) * n_items) AS BIGINT) AS pe_bp,
           CAST(CASE WHEN CAST(n_items AS HUGEINT) * n_items = rc THEN NULL
                ELSE 10000 * (CAST(n_items AS HUGEINT) * n_agree - rc)
                     // (CAST(n_items AS HUGEINT) * n_items - rc) END AS BIGINT)
             AS kappa_bp
         FROM tot, pe""",

    // Reliability bins over q42's bp confidence: bin = s·10 // 10⁴
    // clamped to 9, truncating per-bin mean/accuracy, ECE as the
    // n-weighted |gap| fold carried per row.
    "q276_calibration" ->
      s"""WITH $LangIdCtes,
         p AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j AS (SELECT s, CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
               FROM documents d JOIN p USING (doc_id)),
         b AS (SELECT LEAST(s * 10 // 10000, 9) AS bin, count(*) AS n,
               sum(ok) AS n_correct, sum(CAST(s AS HUGEINT)) AS ss
               FROM j GROUP BY 1),
         g AS MATERIALIZED (SELECT bin, n, n_correct, ss // n AS conf_bp,
               10000 * n_correct // n AS acc_bp FROM b),
         t AS (SELECT sum(CAST(n AS HUGEINT) * abs(acc_bp - conf_bp))
                      // sum(n) AS ece FROM g)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_docs,
           CAST(n_correct AS BIGINT) AS n_correct,
           CAST(conf_bp AS BIGINT) AS conf_bp, CAST(acc_bp AS BIGINT) AS acc_bp,
           CAST(acc_bp - conf_bp AS BIGINT) AS gap_bp,
           CAST(t.ece AS BIGINT) AS ece_bp
         FROM g, t""",

    // Stratified ATE: user-grain rollup, per-stratum floored milli
    // diffs, mass-weighted ALL row over both-armed strata.
    "q347_stratified_ate" ->
      s"""WITH bands AS (SELECT user_id AS u, least(count(*) // 10, 5) AS band
           FROM events GROUP BY 1),
         pu AS (SELECT e.user_id AS u, max(e.user_id % 2) AS a,
             max(b.band) AS s,
             sum(CASE WHEN e.event_type = 'purchase'
               THEN ${C("e.value")} ELSE 0 END) AS y
           FROM events e JOIN bands b ON b.u = e.user_id GROUP BY 1),
         ps AS (SELECT s AS stratum,
             sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN a = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS s1,
             sum(CASE WHEN a = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS s0
           FROM pu GROUP BY 1),
         r AS (SELECT stratum, n1, n0,
             CASE WHEN n1 = 0 THEN NULL ELSE (1000 * s1) // n1 END AS m1,
             CASE WHEN n0 = 0 THEN NULL ELSE (1000 * s0) // n0 END AS m0,
             CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
               ELSE (1000 * (s1 * n0 - s0 * n1))
                 // (CAST(n1 AS HUGEINT) * n0) END AS dm
           FROM ps),
         ate AS (SELECT CAST(NULL AS BIGINT) AS stratum,
             coalesce(sum(n1), 0) AS n1, coalesce(sum(n0), 0) AS n0,
             CAST(NULL AS HUGEINT) AS m1, CAST(NULL AS HUGEINT) AS m0,
             CASE WHEN coalesce(sum(n1) + sum(n0), 0) = 0 THEN NULL
               ELSE sum(CAST(n1 + n0 AS HUGEINT) * dm)
                 // (sum(n1) + sum(n0)) END AS dm
           FROM r WHERE dm IS NOT NULL)
         SELECT CAST(stratum AS BIGINT) AS stratum, CAST(n1 AS BIGINT) AS n1,
           CAST(n0 AS BIGINT) AS n0, CAST(m1 AS BIGINT) AS mean1_milli,
           CAST(m0 AS BIGINT) AS mean0_milli, CAST(dm AS BIGINT) AS diff_milli
         FROM (SELECT * FROM r UNION ALL SELECT * FROM ate)""",

    // MDE: the q337 moment machinery with the pinned 2.802 multiplier
    // (z_0.025 + z_0.20 as one parsed literal on both sides).
    "q348_power_mde" ->
      s"""WITH m AS (SELECT
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE CAST(${C("value")} AS HUGEINT) END) AS sb,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS HUGEINT) * ${C("value")} ELSE 0 END) AS ssa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE CAST(${C("value")} AS HUGEINT) * ${C("value")} END) AS ssb
           FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
         d AS (SELECT *,
             CAST(CAST(n_a AS HUGEINT) * ssa - sa * sa AS DOUBLE)
               / CAST(CAST(n_a AS HUGEINT) * n_a * (n_a - 1) AS DOUBLE) AS qa,
             CAST(CAST(n_b AS HUGEINT) * ssb - sb * sb AS DOUBLE)
               / CAST(CAST(n_b AS HUGEINT) * n_b * (n_b - 1) AS DOUBLE) AS qb
           FROM m)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n_a < 2 OR n_b < 2
                  OR (CAST(n_a AS HUGEINT) * ssa - sa * sa)
                   + (CAST(n_b AS HUGEINT) * ssb - sb * sb) = 0 THEN NULL
                ELSE floor(2.802 * sqrt(qa + qb) * 1000 + 0.5)
                END AS BIGINT) AS mde_milli,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR sa + sb = 0
                  OR (CAST(n_a AS HUGEINT) * ssa - sa * sa)
                   + (CAST(n_b AS HUGEINT) * ssb - sb * sb) = 0 THEN NULL
                ELSE floor(2.802 * sqrt(qa + qb)
                  / (CAST(sa + sb AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * 10000 + 0.5) END AS BIGINT) AS mde_rel_bp
         FROM d""",

    // Term burstiness: (term, doc) grain then vocabulary rollup,
    // cf/df milli, df floor, top-20 total order.
    "q349_term_burstiness" ->
      """WITH pd AS (SELECT tok, doc_id, count(*) AS c FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents) GROUP BY 1, 2),
         t AS (SELECT tok, sum(c) AS cf, count(*) AS df FROM pd
           GROUP BY 1 HAVING count(*) >= 5)
         SELECT tok, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
           CAST((1000 * cf) // df AS BIGINT) AS burst_milli
         FROM (SELECT *, row_number() OVER (ORDER BY (1000 * cf) // df DESC,
             cf DESC, tok ASC) AS rn FROM t)
         WHERE rn <= 20""",

    // JSD: per-term integer surprisal via the shared 64*log2 CTE over
    // the distinct log arguments, count-weighted, one idiv per leg.
    "q350_jsd_drift" -> {
      s"""WITH tk AS (SELECT doc_id % 2 = 0 AS is_ref,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT tok, sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS b
           FROM tk GROUP BY 1),
         tt AS (SELECT sum(a) AS ta, sum(b) AS tb FROM tf),
         args AS (SELECT DISTINCT v AS k, v AS n FROM (
             SELECT 2 * a * tb AS v FROM tf, tt WHERE a > 0
             UNION ALL SELECT 2 * b * ta FROM tf, tt WHERE b > 0
             UNION ALL SELECT a * tb + b * ta FROM tf, tt)
           WHERE v > 0),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "args", "k", "k")},
         terms AS (SELECT tf.a, tf.b, tt.ta, tt.tb,
             CASE WHEN tf.a > 0 THEN CAST(tf.a AS HUGEINT)
               * (l1.lg - l2.lg) ELSE 0 END AS tp,
             CASE WHEN tf.b > 0 THEN CAST(tf.b AS HUGEINT)
               * (l3.lg - l2.lg) ELSE 0 END AS tq
           FROM tf CROSS JOIN tt
           LEFT JOIN lgt l1 ON l1.k = 2 * tf.a * tt.tb
           LEFT JOIN lgt l2 ON l2.k = tf.a * tt.tb + tf.b * tt.ta
           LEFT JOIN lgt l3 ON l3.k = 2 * tf.b * tt.ta),
         m AS (SELECT count(*) AS n_terms, max(ta) AS n_ref,
             max(tb) AS n_cur, sum(tp) AS sp, sum(tq) AS sq FROM terms)
         SELECT CAST(n_terms AS BIGINT) AS n_terms,
           CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           CAST(sp // n_ref AS BIGINT) AS klp_q,
           CAST(sq // n_cur AS BIGINT) AS klq_q,
           CAST((1000 * (sp // n_ref + sq // n_cur)) // 128 AS BIGINT)
             AS jsd_mbits
         FROM m""" },

    // RBO: the shared quantized depth weights, a match at (ra, rb)
    // enters every depth >= max, per-(query, depth) floored terms.
    "q357_rbo" -> {
      val wRows = ops.Similarity.rboWeights
        .map { case (dd, w) => s"($dd, $w)" }.mkString(", ")
      s"""WITH ea AS ($q60OracleSql),
         eb AS (${AnnOracleSql.all("q61_ann_lsh")}),
         dw(d, w) AS (VALUES $wRows),
         mm AS MATERIALIZED (SELECT ea.query_id,
             greatest(ea.rank, eb.rank) AS m
           FROM ea JOIN eb ON eb.query_id = ea.query_id
             AND eb.neighbor_id = ea.neighbor_id),
         t AS (SELECT query_id, sum((w * od) // d) AS rbo FROM (
             SELECT mm.query_id, dw.d, dw.w, count(*) AS od
             FROM mm JOIN dw ON mm.m <= dw.d GROUP BY 1, 2, 3)
           GROUP BY 1),
         nm AS (SELECT query_id, count(*) AS nc FROM mm GROUP BY 1),
         qq AS (SELECT query_id FROM ea UNION SELECT query_id FROM eb)
         SELECT qq.query_id,
           CAST(coalesce(nm.nc, 0) AS BIGINT) AS n_common,
           CAST(coalesce(t.rbo, 0) AS BIGINT) AS rbo_e8
         FROM qq LEFT JOIN nm USING (query_id)
         LEFT JOIN t USING (query_id)""" },

    // Monroe log-odds distinctive terms: exact 64*log2 deltas via the
    // shared lgCte over the distinct smoothed-count arguments, one
    // pinned-double z boundary, top-5 per slice.
    "q356_log_odds_terms" -> {
      s"""WITH tk AS (SELECT lang AS sl,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS MATERIALIZED (SELECT sl, tok, count(*) AS a
           FROM tk GROUP BY 1, 2),
         bt AS (SELECT tok, sum(a) AS g FROM tf GROUP BY 1),
         bs AS (SELECT sl, sum(a) AS ta FROM tf GROUP BY 1),
         tt AS (SELECT sum(a) AS n, count(DISTINCT tok) AS v FROM tf),
         base AS MATERIALIZED (SELECT tf.sl, tf.tok, tf.a,
             bt.g - tf.a AS b,
             tf.a + 1 AS arg_a,
             greatest(bs.ta + tt.v - tf.a - 1, 1) AS arg_da,
             bt.g - tf.a + 1 AS arg_b,
             greatest(tt.n - bs.ta + tt.v - (bt.g - tf.a) - 1, 1) AS arg_db
           FROM tf JOIN bt USING (tok) JOIN bs USING (sl) CROSS JOIN tt),
         args AS (SELECT DISTINCT v2 AS k, v2 AS n FROM (
             SELECT arg_a AS v2 FROM base
             UNION ALL SELECT arg_da FROM base
             UNION ALL SELECT arg_b FROM base
             UNION ALL SELECT arg_db FROM base)),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "args", "k", "k")},
         fin AS (SELECT base.sl, base.tok, base.a, base.b,
             l1.lg - l2.lg - l3.lg + l4.lg AS delta_q,
             CAST(floor((CAST(l1.lg - l2.lg - l3.lg + l4.lg AS DOUBLE) / 64)
               / sqrt(1.0 / base.arg_a + 1.0 / base.arg_b) * 1000 + 0.5)
               AS BIGINT) AS z_milli
           FROM base JOIN lgt l1 ON l1.k = base.arg_a
           JOIN lgt l2 ON l2.k = base.arg_da
           JOIN lgt l3 ON l3.k = base.arg_b
           JOIN lgt l4 ON l4.k = base.arg_db)
         SELECT sl, tok, CAST(a AS BIGINT) AS n_in,
           CAST(b AS BIGINT) AS n_out, CAST(delta_q AS BIGINT) AS delta_q,
           z_milli
         FROM (SELECT *, row_number() OVER (PARTITION BY sl
             ORDER BY z_milli DESC, tok ASC) AS rn FROM fin)
         WHERE rn <= 5""" },

    // ROUGE-1/2 F1 (set form) over the shared jaccard candidate
    // pairs: per-doc unigram/bigram sets, per-pair intersections,
    // F1 = 2*overlap/(|A|+|B|) by one idiv.
    "q354_rouge_pairs" ->
      s"""WITH p AS ($jaccardOracle),
         g AS (SELECT doc_id,
             list_distinct(string_split(text, ' ')) AS g1,
             list_distinct(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' '
                 || string_split(text, ' ')[i + 1])) AS g2
           FROM documents),
         j AS (SELECT p.doc_a, p.doc_b,
             len(list_filter(a.g1, x -> list_contains(b.g1, x))) AS o1,
             len(list_filter(a.g2, x -> list_contains(b.g2, x))) AS o2,
             len(a.g1) + len(b.g1) AS d1,
             len(a.g2) + len(b.g2) AS d2
           FROM p JOIN g a ON a.doc_id = p.doc_a
           JOIN g b ON b.doc_id = p.doc_b)
         SELECT doc_a, doc_b, CAST(o1 AS BIGINT) AS overlap1,
           CAST((20000 * o1) // d1 AS BIGINT) AS rouge1_f_bp,
           CAST(o2 AS BIGINT) AS overlap2,
           CAST(CASE WHEN d2 = 0 THEN NULL
                ELSE (20000 * o2) // d2 END AS BIGINT) AS rouge2_f_bp
         FROM j""",

    // Cluster label purity: the shared connected-components CTEs +
    // one (cluster, lang) rollup; majority label by (count DESC,
    // label ASC); corpus purity as the ALL row.
    "q355_cluster_purity" ->
      s"""WITH RECURSIVE $ClusterCtes,
         cl AS (SELECT lab.cluster_id, d.lang AS lbl, count(*) AS c
           FROM lab JOIN documents d ON d.doc_id = lab.node GROUP BY 1, 2),
         per AS MATERIALIZED (SELECT cluster_id, sum(c) AS n,
             max(CASE WHEN rn = 1 THEN lbl END) AS top_label,
             max(CASE WHEN rn = 1 THEN c END) AS top_n
           FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
               ORDER BY c DESC, lbl ASC) AS rn FROM cl)
           GROUP BY 1),
         al AS (SELECT CAST(NULL AS BIGINT) AS cluster_id, sum(n) AS n,
             CAST(NULL AS VARCHAR) AS top_label, sum(top_n) AS top_n
           FROM per)
         SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(n AS BIGINT) AS n, top_label,
           CAST(top_n AS BIGINT) AS top_n,
           CAST((10000 * top_n) // n AS BIGINT) AS purity_bp
         FROM (SELECT * FROM per UNION ALL SELECT * FROM al)""",

    // Threshold pick: descending cumulative TP/FP on the score grid,
    // exact integer F1/Youden, one deterministic argmax per criterion.
    "q352_threshold_pick" ->
      s"""WITH $LangIdCtes,
         p AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j0 AS (SELECT s, CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
               FROM documents d JOIN p USING (doc_id)),
         g AS (SELECT s AS t, sum(ok) AS pos, sum(1 - ok) AS neg
               FROM j0 GROUP BY 1),
         tt AS (SELECT sum(pos) AS p, sum(neg) AS n FROM g),
         cv AS MATERIALIZED (SELECT g.t,
               sum(g.pos) OVER (ORDER BY g.t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               sum(g.neg) OVER (ORDER BY g.t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
               tt.p, tt.n
             FROM g CROSS JOIN tt),
         cu AS MATERIALIZED (SELECT t, tp, fp, p - tp AS fn,
               (20000 * tp) // (2 * tp + fp + (p - tp)) AS f1_bp,
               CASE WHEN p = 0 OR n = 0 THEN NULL
                 ELSE (1000 * (CAST(tp AS HUGEINT) * n
                   - CAST(fp AS HUGEINT) * p))
                   // (CAST(p AS HUGEINT) * n) END AS youden_milli
             FROM cv)
         SELECT criterion, CAST(t AS BIGINT) AS threshold_bp,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(f1_bp AS BIGINT) AS f1_bp,
           CAST(youden_milli AS BIGINT) AS youden_milli
         FROM (
           SELECT 'f1_max' AS criterion, * FROM cu
           QUALIFY row_number() OVER (ORDER BY f1_bp DESC, t ASC) = 1
           UNION ALL
           SELECT 'youden_max' AS criterion, * FROM cu
           QUALIFY row_number() OVER (ORDER BY youden_milli DESC, t ASC) = 1)""",

    // Dup transitivity: the q52 pair relation's open-wedge share —
    // pairs CTE is the shared jaccard oracle, wedges + closure probe.
    "q353_dup_transitivity" ->
      s"""WITH base AS ($jaccardOracle),
         pr AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM base),
         und AS MATERIALIZED (SELECT a, b FROM pr
           UNION ALL SELECT b, a FROM pr),
         w AS MATERIALIZED (SELECT DISTINCT x.a AS u, y.b AS v
           FROM und x JOIN und y ON y.a = x.b WHERE x.a < y.b),
         cl AS (SELECT count(*) AS n_closed
           FROM w JOIN pr ON pr.a = w.u AND pr.b = w.v),
         cnts AS (SELECT (SELECT count(*) FROM pr) AS n_pairs,
           (SELECT count(*) FROM w) AS n_wedge_pairs,
           (SELECT n_closed FROM cl) AS n_closed)
         SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_wedge_pairs AS BIGINT) AS n_wedge_pairs,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(n_wedge_pairs - n_closed AS BIGINT) AS n_open,
           CAST(CASE WHEN n_wedge_pairs = 0 THEN NULL
                ELSE (10000 * (n_wedge_pairs - n_closed)) // n_wedge_pairs
                END AS BIGINT) AS open_bp
         FROM cnts""",

    // Isotonic calibration: the max-min identity over the binned
    // score grid — per-interval floored rates from prefix sums, then
    // min over k >= j and a prefix max (monotone by construction).
    "q344_isotonic" ->
      s"""WITH $LangIdCtes,
         p AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j0 AS (SELECT s, CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
               FROM documents d JOIN p USING (doc_id)),
         g AS (SELECT s // 100 AS level, count(*) AS n_docs,
               sum(ok) AS n_ok FROM j0 GROUP BY 1),
         cm AS MATERIALIZED (SELECT level, n_docs, n_ok,
               sum(n_docs) OVER (ORDER BY level ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
               sum(n_ok) OVER (ORDER BY level ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
             FROM g),
         mj AS (SELECT lo.level AS jl,
               min((10000 * (CAST(hi.cc AS HUGEINT) - (lo.cc - lo.n_ok)))
                 // (hi.cn - (lo.cn - lo.n_docs))) AS m
             FROM cm lo JOIN cm hi ON lo.level <= hi.level
             GROUP BY 1),
         iso AS (SELECT jl AS level,
               max(m) OVER (ORDER BY jl ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iso_bp
             FROM mj)
         SELECT cm.level, CAST(cm.n_docs AS BIGINT) AS n_docs,
           CAST(10000 * cm.n_ok // cm.n_docs AS BIGINT) AS acc_bp,
           CAST(iso.iso_bp AS BIGINT) AS iso_bp
         FROM cm JOIN iso USING (level)""",

    // Hill plot over the token-length tail: per-value bp-grid ln then
    // exact integer sums (order-free), H at the i=k+1 cutoff row,
    // α = 10⁷ // H milli. Ties at the cutoff are value-identical, so
    // the windowed cumsum is deterministic.
    "q277_hill_tail" ->
      """WITH x AS (SELECT len(string_split(text, ' ')) AS x FROM documents),
         o AS (SELECT x, CAST(floor(ln(x) * 10000 + 0.5) AS BIGINT) AS l,
               row_number() OVER (ORDER BY x DESC) AS i
               FROM x WHERE x >= 1 ORDER BY x DESC LIMIT 257),
         c AS (SELECT x, l, i, coalesce(sum(l) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
               FROM o)
         SELECT CAST(i - 1 AS BIGINT) AS k, CAST(x AS BIGINT) AS x_tail,
           CAST((cum - (i - 1) * l) // (i - 1) AS BIGINT) AS hill_q,
           CAST(CASE WHEN (cum - (i - 1) * l) // (i - 1) <= 0 THEN NULL
                ELSE 10000000 // ((cum - (i - 1) * l) // (i - 1)) END AS BIGINT)
             AS alpha_milli
         FROM c WHERE i - 1 IN (16, 64, 256)""",

    // Mann–Whitney 2U over the bounded bp-score grid: cumulative
    // negatives below each score, ties at half weight, one HUGEINT
    // division; null when a class is empty.
    "q278_auc" ->
      s"""WITH $LangIdCtes,
         pp AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j AS (SELECT s, CASE WHEN pp.pred_lang = d.lang THEN 1 ELSE 0 END AS y
               FROM documents d JOIN pp USING (doc_id)),
         g AS (SELECT s, sum(y) AS p, sum(1 - y) AS n FROM j GROUP BY 1),
         cg AS (SELECT s, p, n, coalesce(sum(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn
               FROM g),
         a AS (SELECT sum(p) AS n_pos, sum(n) AS n_neg,
               sum(CAST(p AS HUGEINT) * (2 * CAST(cn AS HUGEINT) + n)) AS u2
               FROM cg)
         SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(u2 AS BIGINT) AS u2,
           CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE 10000 * u2 // (2 * CAST(n_pos AS HUGEINT) * n_neg)
                END AS BIGINT) AS auc_bp
         FROM a""",

    // Average precision over the same grid: descending cumulative
    // tp/fp, per-cut terms floored before the sum (q201 discipline),
    // one idiv by n_pos; prevalence baseline alongside.
    "q308_pr_auc" ->
      s"""WITH $LangIdCtes,
         pp AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j AS (SELECT s, CASE WHEN pp.pred_lang = d.lang THEN 1 ELSE 0 END AS y
               FROM documents d JOIN pp USING (doc_id)),
         g AS (SELECT s, sum(y) AS p, sum(1 - y) AS n FROM j GROUP BY 1),
         cg AS (SELECT s, p, n,
               sum(p) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               sum(n) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
               FROM g),
         t AS (SELECT p, n,
               (1000000 * CAST(p AS HUGEINT) * tp)
                 // (CAST(tp AS HUGEINT) + fp) AS term FROM cg),
         a AS (SELECT sum(p) AS n_pos, sum(n) AS n_neg,
               sum(term) AS term_sum FROM t)
         SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(CASE WHEN n_pos = 0 THEN NULL
                ELSE term_sum // n_pos END AS BIGINT) AS ap_micro,
           CAST(CASE WHEN n_pos + n_neg = 0 THEN NULL
                ELSE (1000000 * n_pos) // (n_pos + n_neg) END AS BIGINT)
             AS prevalence_micro
         FROM a""",

    // McNemar over paired correctness of the full q42 profile vs the
    // first-marker-only variant: the same LangId CTEs plus a second
    // single-marker chain (u2/r2), four counters, χ² in milli with
    // HUGEINT squares, null on zero discordant pairs.
    "q279_mcnemar" ->
      s"""WITH $LangIdCtes,
         u2 AS (
           SELECT doc_id, 'en' AS lang, 0 AS rnk, len(list_filter(toks, t -> t IN ('the'))) / nt AS score FROM sc
           UNION ALL SELECT doc_id, 'de', 1, len(list_filter(toks, t -> t IN ('der'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'es', 2, len(list_filter(toks, t -> t IN ('el'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'fr', 3, len(list_filter(toks, t -> t IN ('le'))) / nt FROM sc
           UNION ALL SELECT doc_id, 'zh', 4, len(list_filter(toks, t -> t IN ('scan'))) / nt FROM sc),
         r2 AS (SELECT doc_id, lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, rnk ASC) AS rn FROM u2),
         pr AS (SELECT d.doc_id,
               CASE WHEN pa.lang = d.lang THEN 1 ELSE 0 END AS oa,
               CASE WHEN pb.lang = d.lang THEN 1 ELSE 0 END AS ob
               FROM documents d
               JOIN (SELECT doc_id, lang FROM r WHERE rn = 1) pa USING (doc_id)
               JOIN (SELECT doc_id, lang FROM r2 WHERE rn = 1) pb USING (doc_id)),
         m AS (SELECT count(*) AS n_items, sum(oa * ob) AS n_both,
               sum(oa * (1 - ob)) AS a_only, sum((1 - oa) * ob) AS b_only,
               sum((1 - oa) * (1 - ob)) AS n_neither FROM pr)
         SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(a_only AS BIGINT) AS a_only, CAST(b_only AS BIGINT) AS b_only,
           CAST(n_neither AS BIGINT) AS n_neither,
           CAST(CASE WHEN a_only + b_only = 0 THEN NULL
                ELSE 1000 * (CAST(a_only AS HUGEINT) - b_only)
                     * (CAST(a_only AS HUGEINT) - b_only)
                     // (CAST(a_only AS HUGEINT) + b_only) END AS BIGINT)
             AS chi2_milli
         FROM m""",

    // Type-space overlap per language pair: one DISTINCT (lang, token)
    // set, self-joined on token under ga < gb; Jaccard and small-side
    // containment in exact bp.
    "q280_vocab_overlap" ->
      """WITH ty AS MATERIALIZED (
           SELECT DISTINCT g, tok FROM (
             SELECT lang AS g, unnest(string_split(text, ' ')) AS tok
             FROM documents)),
         sz AS (SELECT g, count(*) AS nv FROM ty GROUP BY 1),
         cm AS (SELECT a.g AS lang_a, b.g AS lang_b, count(*) AS n_common
               FROM ty a JOIN ty b ON a.tok = b.tok AND a.g < b.g
               GROUP BY 1, 2)
         SELECT lang_a, lang_b,
           CAST(sa.nv AS BIGINT) AS vocab_a, CAST(sb.nv AS BIGINT) AS vocab_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(10000 * n_common // (sa.nv + sb.nv - n_common) AS BIGINT)
             AS jaccard_bp,
           CAST(10000 * n_common // LEAST(sa.nv, sb.nv) AS BIGINT)
             AS containment_bp
         FROM cm JOIN sz sa ON sa.g = cm.lang_a
           JOIN sz sb ON sb.g = cm.lang_b""",

    "q284_hapax" ->
      """WITH tf AS (SELECT lang, tok, count(*) AS cnt FROM (
             SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1, 2)
         SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS vocab,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
           CAST(10000 * sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS hapax_vocab_bp,
           CAST(10000 * sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                // sum(cnt) AS BIGINT) AS hapax_mass_bp
         FROM tf GROUP BY 1""",

    // Chao1 (bias-corrected) + Good–Turing coverage from the same
    // term-frequency rollup as q284 — all truncating integer idivs.
    "q288_vocab_richness" ->
      """WITH tf AS (SELECT lang, tok, count(*) AS cnt FROM (
             SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1, 2),
         b AS (SELECT lang, sum(cnt) AS n_tokens, count(*) AS vocab,
               sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS f1,
               sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS f2
               FROM tf GROUP BY 1),
         c AS (SELECT *, vocab + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS chao1
               FROM b)
         SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab, CAST(f1 AS BIGINT) AS f1,
           CAST(f2 AS BIGINT) AS f2, CAST(chao1 AS BIGINT) AS chao1,
           CAST(10000 * vocab // chao1 AS BIGINT) AS observed_share_bp,
           CAST(10000 * f1 // n_tokens AS BIGINT) AS unseen_mass_bp
         FROM c""",

    // MATTR via the exact link identity: Σ_windows distinct = nwin·w −
    // Σ_links overlap(link, [w, L]) — same 1-based positions, lag over
    // (doc, token), truncating idivs; docs shorter than w -> NULL.
    "q291_mattr" ->
      """WITH tp AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
              FROM documents),
         lk AS (SELECT doc_id, tok, pos,
                lag(pos) OVER (PARTITION BY doc_id, tok ORDER BY pos) AS prev
              FROM tp),
         pd AS (SELECT doc_id, max(pos) AS n_tokens,
                count(DISTINCT tok) AS vocab FROM lk GROUP BY 1),
         du AS (SELECT lk.doc_id, sum(greatest(0,
                  least(lk.prev + 19, pd.n_tokens)
                  - greatest(lk.pos, 20) + 1)) AS dup_sum
                FROM lk JOIN pd USING (doc_id)
                WHERE lk.prev IS NOT NULL GROUP BY 1)
         SELECT pd.doc_id, CAST(pd.n_tokens AS BIGINT) AS n_tokens,
           CAST(pd.vocab AS BIGINT) AS vocab,
           CAST(greatest(pd.n_tokens - 19, 0) AS BIGINT) AS n_windows,
           CAST(10000 * pd.vocab // pd.n_tokens AS BIGINT) AS ttr_bp,
           CAST(CASE WHEN pd.n_tokens < 20 THEN NULL
                ELSE (10000 * ((pd.n_tokens - 19) * 20
                      - coalesce(du.dup_sum, 0)))
                     // ((pd.n_tokens - 19) * 20) END AS BIGINT) AS mattr_bp
         FROM pd LEFT JOIN du USING (doc_id)""",

    "q44_ngram_freq" ->
      """WITH b AS (SELECT lang, unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                    FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)),
         c AS (SELECT lang, bigram, count(*) AS cnt FROM b GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram ASC) AS rn FROM c)
         SELECT lang, bigram, cnt, rn FROM r WHERE rn <= 5""",

    // Mirrors RollingHash64 (h = h*31 + byte, wrapping int64) with
    // HUGEINT arithmetic reduced mod 2^64 each step, then re-signed.
    // char codepoints == UTF-8 bytes because the corpus is pure ASCII
    // (asserted in spec); a non-ASCII corpus would need a byte-level
    // fold instead.
    "q43_fingerprint" ->
      """SELECT doc_id,
           CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                     THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fingerprint
         FROM (
           SELECT doc_id,
             list_reduce(
               list_prepend(1125899906842597::HUGEINT,
                 list_transform(string_split(text, ''), c -> unicode(c)::HUGEINT)),
               (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS h
           FROM documents)""",

    // q105 decodes REAL WAV payloads, but those payloads are generated
    // from the spec-pinned PCM formula (Multimodal.sampleAt/wavSamples),
    // so the oracle recomputes the decoded features directly from the
    // generator contract: a WAV container/codec bug on the Spark side
    // surfaces as a mismatch here. All operands are non-negative, so
    // Java floorMod == SQL %; sum of squares is exact in int64 and IEEE
    // sqrt is correctly rounded in both engines.
    "q105_audio_decode" ->
      """WITH n AS (SELECT doc_id, 800 + (doc_id * 2654435761) % 1600 AS ns FROM documents),
         s AS (SELECT doc_id, ns, unnest(range(ns)) AS i FROM n),
         v AS (SELECT doc_id, ns, ((i*127 + doc_id*31) % 65536) - 32768 AS v FROM s)
         SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(ns AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(floor(sqrt(CAST(sum(v*v) AS DOUBLE) / ns) * 100) AS BIGINT) AS rms_q
         FROM v GROUP BY doc_id, ns""",

    // q70 decodes REAL PNG payloads; like q105/q143 the oracle replays
    // the generator contract — md5-hex metadata dims scaled 1/8 and the
    // (31x+17y+13·id) mod 256 raster, mean in exact integer arithmetic
    // (sum·100 with floor division; both sides' operands non-negative).
    // Only n_bytes (the JDK PNG encoder's output length) has no SQL
    // twin; it lives outside this projection under the q70_full_decode
    // golden pin. Dims parse the md5 hex prefix via the '0x' cast
    // (md5_number_upper is LITTLE-endian in DuckDB — it reverses the
    // digest bytes — so the hex-substring route is the faithful one).
    "q70_multimodal_meta" ->
      """WITH dims AS (
           SELECT doc_id,
             greatest(CAST(((('0x' || substr(md5(text),1,8))::UBIGINT % 1024) + 64) // 8 AS INTEGER), 8) AS width,
             greatest(CAST(((('0x' || substr(md5(text),9,8))::UBIGINT % 768) + 64) // 8 AS INTEGER), 8) AS height
           FROM documents),
         px AS (
           SELECT doc_id, width, height,
                  unnest(range(0, CAST(width AS BIGINT) * height)) AS k
           FROM dims)
         SELECT doc_id, 'png' AS format, width, height,
           CAST(sum(((k % width) * 31 + (k // width) * 17 + doc_id * 13) % 256) * 100
                // (CAST(width AS BIGINT) * height) AS BIGINT) AS mean_pixel_q
         FROM px GROUP BY doc_id, width, height""",

    // q419: dims replay via the shared metadata formulas; the IHDR
    // constants (grayscale, 8-bit) and all-green flags are the
    // generator contract — the corruption detectors are spec-proven.
    "q419_png_integrity" ->
      """WITH dims AS (
           SELECT doc_id,
             greatest(CAST(((('0x' || substr(md5(text),1,8))::UBIGINT % 1024) + 64) // 8 AS INTEGER), 8) AS width,
             greatest(CAST(((('0x' || substr(md5(text),9,8))::UBIGINT % 768) + 64) // 8 AS INTEGER), 8) AS height
           FROM documents)
         SELECT doc_id, CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(8 AS INT) AS bit_depth, CAST(0 AS INT) AS color_type,
           CAST(1 AS INT) AS sig_ok, CAST(1 AS INT) AS crc_ok,
           CAST(1 AS INT) AS structure_ok
         FROM dims""",

    // DuckDB's double-precision jaro_winkler_similarity vs the exact
    // rational jaro_winkler_bp: floor(jw*10000) agrees unless the exact
    // score sits within ~1e-12 of a basis-point boundary — no corpus
    // name pair does (verified at sf0.01: nearest boundary distance is
    // ~0.33 bp), and the 9200 threshold is far from every score.
    "q166_jw_name_pairs" ->
      """WITH dict AS (SELECT DISTINCT p_name AS n FROM part)
         SELECT x.n AS name_a, y.n AS name_b,
                CAST(floor(jaro_winkler_similarity(x.n, y.n) * 10000) AS BIGINT) AS jw_bp
         FROM dict x JOIN dict y ON x.n < y.n
         WHERE floor(jaro_winkler_similarity(x.n, y.n) * 10000) >= 9200""",

    // q143/q167/q124 decode REAL containers (animated GIF / PNG) on the
    // Spark side, but the payloads are generated from the spec-pinned
    // splitmix64 pixel formulas, so DuckDB recomputes the decoded
    // features from the generator contract — a codec bug (frame order,
    // palette roundtrip, raster band mixup) surfaces as a mismatch.
    // mix64's wrapping 64-bit multiplies are emulated with HUGEINT
    // arithmetic split at 2^32 (a*b mod 2^64 via hi/lo decomposition of
    // a), reduced mod 2^64 each step; xor/shift run on UBIGINT.
    "q143_video_frames" ->
      s"""WITH
         ${Mix64Ctes("m", "doc_id", "documents", "doc_id*7+3")},
         nf AS (SELECT doc_id, 4 + CAST(xor(z, z >> 31) & 7 AS INT) AS n_frames FROM m5),
         fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 2)) AS f FROM nf),
         px AS (SELECT doc_id, n_frames, f, unnest(range(256)) AS p FROM fr),
         ${Mix64Ctes("p", "doc_id, n_frames, f, p", "px", "doc_id*1024 + f*256 + p")},
         pv AS (SELECT doc_id, n_frames, f, CAST(xor(z, z >> 31) & 255 AS BIGINT) AS pix FROM p5)
         SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(n_frames AS INT) AS n_frames,
                CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
                CAST(sum(pix) * 100 // 256 AS BIGINT) AS mean_pixel_q
         FROM pv GROUP BY doc_id, f, n_frames""",

    "q167_scene_detect" ->
      s"""WITH
         ${Mix64Ctes("m", "doc_id", "documents", "doc_id*7+3")},
         nf AS (SELECT doc_id, 4 + CAST(xor(z, z >> 31) & 7 AS INT) AS n_frames FROM m5),
         fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS f FROM nf),
         px AS (SELECT doc_id, n_frames, f, unnest(range(256)) AS p FROM fr),
         ${Mix64Ctes("p", "doc_id, n_frames, f, p", "px", "doc_id*1024 + f*256 + p")},
         pv AS (SELECT doc_id, n_frames, f, p, CAST(xor(z, z >> 31) & 255 AS BIGINT) AS pix FROM p5),
         lg AS (SELECT doc_id, n_frames, f, pix,
                       lag(pix) OVER (PARTITION BY doc_id, p ORDER BY f) AS prev FROM pv),
         sad AS (SELECT doc_id, n_frames, f, sum(abs(pix - prev)) AS sad
                 FROM lg WHERE prev IS NOT NULL GROUP BY doc_id, n_frames, f)
         SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(n_frames AS INT) AS n_frames,
                CAST(sad * 100 // 256 AS BIGINT) AS diff_q,
                CAST(CASE WHEN sad * 100 // 256 > 8000 THEN 1 ELSE 0 END AS BIGINT) AS scene_change
         FROM sad""",

    // aHash works cell-wise here: the structured image is CONSTANT on
    // each 4x4 cell (floorMod_signed(mix64(base*64+cell), 251) — the
    // CASE re-signs the UBIGINT before the non-power-of-2 modulus, since
    // Java floorMod works on the signed value), so cellSum = 16*value
    // plus the copy's +4 brightness and its 3 noise-pixel overwrites
    // (last write wins per pixel → row_number DESC). Bit c is the
    // division-free compare cellSum*64 >= total at 16x16 cells; pairs
    // are the brute-force hamming<=3 join over all 1000 hashes.
    "q124_image_dedup" ->
      s"""WITH $PngCellCtes,
         tot AS (SELECT img_id, sum(cs) AS total FROM oc GROUP BY img_id),
         hs AS (SELECT oc.img_id,
                       sum(CASE WHEN oc.cs * 64 >= t.total THEN (1::UBIGINT << oc.cell) ELSE 0::UBIGINT END)::UBIGINT AS h
                FROM oc JOIN tot t ON oc.img_id = t.img_id GROUP BY oc.img_id)
         SELECT a.img_id AS doc_a, b.img_id AS doc_b,
                CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
         FROM hs a JOIN hs b ON a.img_id < b.img_id
         WHERE bit_count(xor(a.h, b.h)) <= 3""",

    // dHash over the same generator-replayed cell sums: strict > on
    // adjacent-column cell means (uniform 16-px cells, so the raw sum
    // compare equals the Spark side's cross-multiply); bit layout
    // (row·7 + col) mirrors dHashImages.
    "q239_image_dhash" ->
      s"""WITH $PngCellCtes,
         hs AS (SELECT l.img_id,
                  sum(CASE WHEN l.cs > r.cs
                      THEN (1::UBIGINT << ((l.cell // 8) * 7 + (l.cell % 8)))
                      ELSE 0::UBIGINT END)::UBIGINT AS h
                FROM oc l JOIN oc r
                  ON r.img_id = l.img_id AND r.cell = l.cell + 1
                WHERE l.cell % 8 < 7
                GROUP BY l.img_id)
         SELECT a.img_id AS doc_a, b.img_id AS doc_b,
                CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
         FROM hs a JOIN hs b ON a.img_id < b.img_id
         WHERE bit_count(xor(a.h, b.h)) <= 3""",

    // q71/q76 window the mediaTable payload, which is the UTF-8 bytes of
    // the document text — on the ASCII corpus DuckDB's substring over the
    // VARCHAR sees the same bytes, and md5 matches byte-for-byte. The
    // declared dims mirror metaWidth/metaHeight (md5 hex prefix, mod,
    // +64). Spark's `/` on the dim scaling is double division, exact for
    // these magnitudes, truncated toward zero on cast — `//` matches for
    // the non-negative operands here.
    "q71_frame_sample" ->
      """WITH m AS (SELECT doc_id, text,
           CAST(('0x' || md5(text)[1:8])::UBIGINT % 1024 + 64 AS BIGINT) AS width,
           CAST(('0x' || md5(text)[9:16])::UBIGINT % 768 + 64 AS BIGINT) AS height FROM documents),
         f AS (SELECT doc_id, text, width, height,
           greatest(CAST(ceil(length(text) / 64.0) AS INT), 1) AS n_frames,
           greatest(width, height) AS le FROM m),
         s AS (SELECT doc_id, text, n_frames,
           CAST(width * least(le, 256) // le AS INT) AS out_w,
           CAST(height * least(le, 256) // le AS INT) AS out_h,
           unnest(range(0, n_frames, 2)) AS fi FROM f)
         SELECT doc_id, CAST(fi AS INT) AS frame_idx, n_frames, out_w, out_h,
           CAST(length(substring(text, fi*64 + 1, 64)) AS INT) AS frame_bytes,
           md5(substring(text, fi*64 + 1, 64)) AS frame_hash
         FROM s""",

    "q76_audio_windows" ->
      """WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
         w AS (SELECT doc_id, text,
           CASE WHEN n < 256 THEN 1 ELSE CAST(floor((n - 256) / 128.0) AS INT) + 1 END AS n_windows FROM m),
         s AS (SELECT doc_id, text, n_windows, unnest(range(0, n_windows)) AS wi FROM w)
         SELECT doc_id, CAST(wi AS INT) AS win_idx, n_windows,
           CAST(wi * 128 AS INT) AS start_byte,
           CAST(length(substring(text, wi*128 + 1, 256)) AS INT) AS win_bytes,
           md5(substring(text, wi*128 + 1, 256)) AS win_md5
         FROM s""",

    "q50_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",

    "q51_dedup_ngram_jaccard" -> jaccardOracle,

    // S-curve audit: the q51 inverted-index pairs down to J = 0.3
    // (prefix/length filters are lossless, so the plain index join is
    // the same pair set), detection probability via the identical
    // multiply chain — J⁴ left-assoc, then five explicit squarings —
    // fixed-point per pair before any sum.
    "q251_lsh_tuning" -> {
      val sstar = math.floor(math.pow(1.0 / 32, 0.25) * 10000 + 0.5).toLong
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         jj AS (SELECT common / CAST(na.n + nb.n - common AS DOUBLE) AS j
                FROM pair JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb),
         f0 AS (SELECT j, 1.0 - j * j * j * j AS y FROM jj WHERE j >= 0.3),
         f1 AS (SELECT j, y * y AS y FROM f0),
         f2 AS (SELECT j, y * y AS y FROM f1),
         f3 AS (SELECT j, y * y AS y FROM f2),
         f4 AS (SELECT j, y * y AS y FROM f3),
         f5 AS (SELECT j, y * y AS y FROM f4),
         p AS (SELECT CAST(floor(j * 10) AS BIGINT) AS j_decile,
               CAST(floor((1.0 - y) * 10000 + 0.5) AS BIGINT) AS prob_bp FROM f5),
         g AS (SELECT j_decile, count(*) AS n_pairs, sum(prob_bp) AS s,
               sum(10000 - prob_bp) AS miss FROM p GROUP BY 1)
         SELECT j_decile, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(s // n_pairs AS BIGINT) AS mean_detect_bp,
           CAST(miss AS BIGINT) AS miss_mass_bp, $sstar AS sstar_bp FROM g
         UNION ALL
         SELECT -1, CAST(count(*) AS BIGINT),
           CAST(CASE WHEN count(*) = 0 THEN 0
                ELSE sum(prob_bp) // count(*) END AS BIGINT),
           CAST(coalesce(sum(10000 - prob_bp), 0) AS BIGINT), $sstar FROM p"""
    },

    // Recomputes SimHashMd5 bit-exactly: md5_number_upper(token) IS the
    // little-endian read of the first 8 MD5 digest bytes (verified vs
    // hashlib), the per-bit vote is majority-of-distinct-tokens (c >= 0
    // keeps ties at 1, matching counts >= 0 in the expression), and the
    // brute-force a<b self-join replaces the pigeonhole blocking (exact
    // at oracle scale; blocking only changes WHERE pairs are found).
    "q53_dedup_simhash" -> simhashOracle,

    "q68_copurchase" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
               FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2)
         SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders FROM p
         ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",

    "q69_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         l AS (SELECT event_type AS from_type,
                      lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
               FROM e),
         c AS (SELECT from_type, to_type, count(*) AS n FROM l
               WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
                CAST((c.n * 10000) // t.tot AS BIGINT) AS prob_bp
         FROM c JOIN t USING (from_type)""",

    // q182 answers the same query from the persisted index and is
    // row-identical by construction — one oracle serves both.
    "q146_bm25" -> bm25Oracle,
    "q182_bm25_index" -> bm25Oracle,
    // q374: the erased index IS a fresh build over the survivors —
    // the oracle scores the odd documents only.
    "q374_bm25_erase" -> bm25OracleOver("doc_id % 2 = 1"),

    "q147_pagerank" -> pageRankOracle,

    "q148_cumulative_actives" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
         d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n_new AS BIGINT) AS n_new,
                CAST(sum(n_new) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
         FROM d""",

    "q149_seasonal_spikes" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
                        FROM events GROUP BY 1, 2),
         d2 AS (SELECT event_type, day, n_events, isodow(day) AS dow FROM daily),
         base AS (SELECT event_type, dow, sum(n_events) AS dow_total, count(*) AS dow_days
                  FROM d2 GROUP BY 1, 2)
         SELECT d2.event_type, strftime(d2.day, '%Y-%m-%d') AS day,
                CAST(d2.dow AS BIGINT) AS dow, CAST(d2.n_events AS BIGINT) AS n_events,
                CAST(base.dow_total AS BIGINT) AS dow_total,
                CAST(base.dow_days AS BIGINT) AS dow_days,
                CAST(CASE WHEN d2.n_events * base.dow_days > 2 * base.dow_total
                     THEN 1 ELSE 0 END AS BIGINT) AS spike
         FROM d2 JOIN base USING (event_type, dow)""",

    // Classical decomposition replayed on the same day table: RANGE
    // window trend over epoch-day index, per-isodow detrended means,
    // truncating integer idivs throughout (milli fixed point).
    "q289_stl_decompose" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
                        FROM events GROUP BY 1),
         d2 AS (SELECT day, n_events,
                date_diff('day', DATE '1970-01-01', day) AS day_idx,
                isodow(day) AS dow FROM daily),
         tr AS (SELECT day, dow, n_events,
                (1000 * sum(n_events) OVER (ORDER BY day_idx
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))
                // (count(*) OVER (ORDER BY day_idx
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS trend_milli
                FROM d2),
         dt AS (SELECT *, 1000 * n_events - trend_milli AS detr_milli FROM tr),
         se AS (SELECT dow, sum(detr_milli) // count(*) AS seasonal_milli
                FROM dt GROUP BY 1)
         SELECT strftime(dt.day, '%Y-%m-%d') AS day, CAST(dt.dow AS BIGINT) AS dow,
           CAST(dt.n_events AS BIGINT) AS n_events,
           CAST(dt.trend_milli AS BIGINT) AS trend_milli,
           CAST(se.seasonal_milli AS BIGINT) AS seasonal_milli,
           CAST(dt.detr_milli - se.seasonal_milli AS BIGINT) AS remainder_milli
         FROM dt JOIN se USING (dow)""",

    // Runs test on the same day table: median-excluded signs, one lag,
    // exact HUGEINT moments, the q287 pinned double z assembly.
    "q296_runs_test" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
                        FROM events GROUP BY 1),
         m AS (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt) AS m
               FROM daily),
         s AS (SELECT day, CASE WHEN cnt > m.m THEN 1 ELSE 0 END AS b
               FROM daily, m WHERE cnt <> m.m),
         l AS (SELECT b, lag(b) OVER (ORDER BY day ASC) AS prev FROM s),
         r AS (SELECT count(*) AS n, sum(b) AS n_above,
               sum(CASE WHEN prev IS NULL OR prev <> b THEN 1 ELSE 0 END)
                 AS n_runs FROM l),
         d AS (SELECT n, n_above, n - n_above AS n_below, n_runs,
               CAST(n AS HUGEINT) * (n_runs - 1)
                 - 2 * CAST(n_above AS HUGEINT) * (n - n_above) AS num,
               2 * CAST(n_above AS HUGEINT) * (n - n_above)
                 * (2 * CAST(n_above AS HUGEINT) * (n - n_above) - n) AS va,
               CAST(n AS HUGEINT) * n * (n - 1) AS vb FROM r)
         SELECT CAST(n AS BIGINT) AS n, CAST(n_above AS BIGINT) AS n_above,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(n_runs AS BIGINT) AS n_runs,
           CAST(CASE WHEN n_above = 0 OR n_below = 0 OR n < 2 OR va = 0
                THEN NULL
                ELSE floor((CAST(num AS DOUBLE) / n)
                  / sqrt(CAST(va AS DOUBLE) / CAST(vb AS DOUBLE))
                  * 1000 + 0.5) END AS BIGINT) AS z_milli,
           CAST(CASE WHEN n_above = 0 OR n_below = 0 OR n < 2 OR va = 0
                THEN NULL
                WHEN abs(floor((CAST(num AS DOUBLE) / n)
                  / sqrt(CAST(va AS DOUBLE) / CAST(vb AS DOUBLE))
                  * 1000 + 0.5)) > 1960 THEN 1 ELSE 0 END AS INT)
             AS is_nonrandom
         FROM d""",

    // Simpson audit: per-stratum integer cross-product directions +
    // the pooled ALL row with the strict all-strata-opposed flag.
    "q297_simpson" ->
      """WITH p AS (SELECT event_type AS st,
                sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                sum(CASE WHEN user_id % 2 = 0 AND value > 150 THEN 1 ELSE 0 END) AS conv_a,
                sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b,
                sum(CASE WHEN user_id % 2 <> 0 AND value > 150 THEN 1 ELSE 0 END) AS conv_b
              FROM events GROUP BY 1),
         r AS (SELECT st AS event_type, n_a, conv_a, n_b, conv_b,
                CASE WHEN n_a = 0 THEN NULL ELSE (10000 * conv_a) // n_a END AS rate_a_bp,
                CASE WHEN n_b = 0 THEN NULL ELSE (10000 * conv_b) // n_b END AS rate_b_bp,
                sign(CAST(conv_a AS HUGEINT) * n_b
                   - CAST(conv_b AS HUGEINT) * n_a) AS dir
               FROM p),
         g AS (SELECT sum(n_a) AS n_a, sum(conv_a) AS conv_a,
                sum(n_b) AS n_b, sum(conv_b) AS conv_b,
                max(dir) AS max_d, min(dir) AS min_d FROM r),
         a AS (SELECT 'ALL' AS event_type, n_a, conv_a, n_b, conv_b,
                CASE WHEN n_a = 0 THEN NULL ELSE (10000 * conv_a) // n_a END AS rate_a_bp,
                CASE WHEN n_b = 0 THEN NULL ELSE (10000 * conv_b) // n_b END AS rate_b_bp,
                sign(CAST(conv_a AS HUGEINT) * n_b
                   - CAST(conv_b AS HUGEINT) * n_a) AS dir,
                max_d, min_d FROM g)
         SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
           CAST(conv_a AS BIGINT) AS conv_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_b AS BIGINT) AS conv_b,
           CAST(rate_a_bp AS BIGINT) AS rate_a_bp,
           CAST(rate_b_bp AS BIGINT) AS rate_b_bp,
           CAST(dir AS BIGINT) AS dir,
           CAST(NULL AS INT) AS is_paradox
         FROM r
         UNION ALL
         SELECT event_type, CAST(n_a AS BIGINT), CAST(conv_a AS BIGINT),
           CAST(n_b AS BIGINT), CAST(conv_b AS BIGINT),
           CAST(rate_a_bp AS BIGINT), CAST(rate_b_bp AS BIGINT),
           CAST(dir AS BIGINT),
           CAST(CASE WHEN dir > 0 AND max_d <= 0 AND min_d < 0 THEN 1
                WHEN dir < 0 AND min_d >= 0 AND max_d > 0 THEN 1
                ELSE 0 END AS INT)
         FROM a""",

    // Entropy rate over q69's transition cells: micro-nat terms with
    // the q294 floor-before-sum discipline, one idiv for the share.
    "q298_entropy_rate" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                event_id FROM events),
         tr AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts_us ASC, event_id ASC) AS to_type FROM e),
         c AS (SELECT from_type, to_type, count(*) AS n FROM tr
               WHERE to_type IS NOT NULL GROUP BY 1, 2),
         f AS (SELECT from_type, sum(n) AS nf FROM c GROUP BY 1),
         g AS (SELECT to_type, sum(n) AS nc FROM c GROUP BY 1),
         t AS (SELECT sum(n) AS nt FROM c),
         hc AS (SELECT sum(CAST(floor(
                  (-(CAST(c.n AS DOUBLE) / nt)) * ln(CAST(c.n AS DOUBLE) / nf)
                  * 1000000 + 0.5) AS BIGINT)) AS h_cond_unat
               FROM c JOIN f USING (from_type) CROSS JOIN t),
         hn AS (SELECT sum(CAST(floor(
                  (-(CAST(nc AS DOUBLE) / nt)) * ln(CAST(nc AS DOUBLE) / nt)
                  * 1000000 + 0.5) AS BIGINT)) AS h_next_unat
               FROM g CROSS JOIN t)
         SELECT CAST(t.nt AS BIGINT) AS n_transitions,
           CAST(hn.h_next_unat AS BIGINT) AS h_next_unat,
           CAST(hc.h_cond_unat AS BIGINT) AS h_cond_unat,
           CAST(hn.h_next_unat - hc.h_cond_unat AS BIGINT) AS gain_unat,
           CAST(CASE WHEN hn.h_next_unat = 0 THEN NULL
                ELSE (10000 * (hn.h_next_unat - hc.h_cond_unat))
                     // hn.h_next_unat END AS BIGINT) AS gain_share_bp
         FROM t, hn, hc""",

    // Growth accounting: distinct (user, week), 7-day self-join for
    // retained, first-week for new/resurrected, lagged churn with the
    // consecutive-week guard.
    "q315_user_flows" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
                date_trunc('week', CAST(ts AS DATE)) AS week FROM events),
         fw AS (SELECT u, min(week) AS first_week FROM uw GROUP BY 1),
         fl AS (SELECT uw.week,
                CASE WHEN p.u IS NOT NULL THEN 'retained'
                     WHEN uw.week = fw.first_week THEN 'new'
                     ELSE 'resurrected' END AS status
                FROM uw LEFT JOIN uw p ON p.u = uw.u
                  AND p.week = uw.week - 7
                JOIN fw ON fw.u = uw.u),
         pw AS (SELECT week, count(*) AS n_active,
                sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS n_retained,
                sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS n_new,
                sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
                FROM fl GROUP BY 1),
         lg AS (SELECT *, lag(week) OVER (ORDER BY week ASC) AS prev_week,
                lag(n_active) OVER (ORDER BY week ASC) AS prev_active FROM pw)
         SELECT strftime(CAST(week AS DATE), '%Y-%m-%d') AS week,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_retained AS BIGINT) AS n_retained,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_resurrected AS BIGINT) AS n_resurrected,
           CAST(CASE WHEN prev_week IS NOT NULL
                  AND date_diff('day', prev_week, week) = 7
                THEN prev_active - n_retained END AS BIGINT) AS n_churned,
           CAST(CASE WHEN prev_week IS NOT NULL
                  AND date_diff('day', prev_week, week) = 7
                THEN (10000 * n_retained) // prev_active END AS BIGINT)
             AS retention_bp
         FROM lg""",

    // Kendall τ-b on the daily (orders, revenue) series: sign-compared
    // day pairs, tie-pair counts from value groups, the q286
    // pinned-double sqrt boundary.
    "q322_kendall_tau" ->
      s"""WITH u AS MATERIALIZED (
           SELECT o_orderdate AS k, CAST(count(*) AS BIGINT) AS xv,
             CAST(sum(${C("o_totalprice")}) AS BIGINT) AS yv
           FROM orders GROUP BY 1),
         cd AS (SELECT
             CAST(sum(CASE WHEN (a.xv > b.xv AND a.yv > b.yv)
               OR (a.xv < b.xv AND a.yv < b.yv) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN (a.xv > b.xv AND a.yv < b.yv)
               OR (a.xv < b.xv AND a.yv > b.yv) THEN 1 ELSE 0 END) AS BIGINT) AS nd
           FROM u a JOIN u b ON a.k < b.k),
         tx AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS HUGEINT) AS n1
                FROM (SELECT count(*) AS t FROM u GROUP BY xv)),
         ty AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS HUGEINT) AS n2
                FROM (SELECT count(*) AS t FROM u GROUP BY yv)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u)
         SELECT n AS n_units, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs,
           nc AS concordant, nd AS discordant,
           CASE WHEN n * (n - 1) // 2 - n1 = 0 OR n * (n - 1) // 2 - n2 = 0
             THEN NULL
             ELSE CAST(floor(10000.0 * (nc - nd) /
               (sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE)) *
                sqrt(CAST(n * (n - 1) // 2 - n2 AS DOUBLE))) + 0.5) AS BIGINT)
           END AS tau_b_bp
         FROM cd, tx, ty, nn""",

    // Kruskal–Wallis on the cent lattice across event types: 2×mid
    // ranks on the bounded grid, per-group 10⁶-floored terms, pinned
    // H_milli division order, tie adjustment.
    "q323_kruskal_wallis" ->
      s"""WITH pb AS (SELECT ${C("value")} AS v, event_type AS g,
             CAST(count(*) AS BIGINT) AS ng
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         pv AS (SELECT v, CAST(sum(ng) AS BIGINT) AS t FROM pb GROUP BY v),
         rk AS (SELECT v, 2 * (sum(t) OVER (ORDER BY v ASC
             ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS r2 FROM pv),
         bg AS (SELECT g, CAST(sum(ng) AS BIGINT) AS n_g,
             CAST(sum(CAST(ng AS HUGEINT) * r2) AS HUGEINT) AS rg2
           FROM pb JOIN rk USING (v) GROUP BY g),
         tm AS (SELECT n_g, 1000000 * rg2 * rg2 // n_g AS term FROM bg),
         tie AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
             AS tie3 FROM pv),
         ag AS (SELECT CAST(sum(n_g) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS k_groups,
             CAST(sum(term) AS HUGEINT) AS s FROM tm)
         SELECT CAST(n AS BIGINT) AS n, k_groups,
           CAST(3000 * s // (1000000 * n * (n + 1)) - 3000 * (n + 1) AS BIGINT)
             AS h_milli,
           CASE WHEN n * n * n - n - tie3 = 0 THEN NULL
             ELSE CAST((3000 * s // (1000000 * n * (n + 1)) - 3000 * (n + 1))
               * (n * n * n - n) // (n * n * n - n - tie3) AS BIGINT)
           END AS h_adj_milli
         FROM ag, tie""",

    // HITS: 4 unrolled sweeps over the sampled customer→part edges,
    // each side renormalized to max = 10⁶ by truncating division.
    "q324_hits" -> {
      val sweeps = (1 to graft.ops.Relational.HitsIters).map { i =>
        s"""a${i}r AS (SELECT t, CAST(sum(hs) AS HUGEINT) AS sc
             FROM e JOIN h${i - 1} USING (s) GROUP BY t),
           a${i}m AS (SELECT max(sc) AS mx FROM a${i}r),
           a$i AS MATERIALIZED (SELECT t,
             CAST(1000000 * sc // mx AS BIGINT) AS ascore
             FROM a${i}r CROSS JOIN a${i}m),
           h${i}r AS (SELECT s, CAST(sum(ascore) AS HUGEINT) AS sc
             FROM e JOIN a$i USING (t) GROUP BY s),
           h${i}m AS (SELECT max(sc) AS mx FROM h${i}r),
           h$i AS MATERIALIZED (SELECT s,
             CAST(1000000 * sc // mx AS BIGINT) AS hs
             FROM h${i}r CROSS JOIN h${i}m)"""
      }.mkString(",\n         ")
      val last = graft.ops.Relational.HitsIters
      s"""WITH e AS MATERIALIZED (
           SELECT DISTINCT o_custkey AS s, l_partkey AS t
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           WHERE l_orderkey % 8 = 0),
         h0 AS (SELECT DISTINCT s, CAST(1000000 AS BIGINT) AS hs FROM e),
         $sweeps,
         hub AS (SELECT 'hub' AS side, s AS node, hs AS score FROM h$last
                 ORDER BY hs DESC, s ASC LIMIT 10),
         aut AS (SELECT 'authority' AS side, t AS node, ascore AS score
                 FROM a$last ORDER BY ascore DESC, t ASC LIMIT 10),
         uu AS (SELECT * FROM hub UNION ALL SELECT * FROM aut)
         SELECT side, CAST(row_number() OVER (PARTITION BY side
             ORDER BY score DESC, node ASC) AS BIGINT) AS rank, node, score
         FROM uu"""
    },

    "q325_mmr_rerank" -> q325OracleSql,

    // Hard negatives: the q60 exact leg with the label INEQUALITY in
    // the join condition, top-5.
    "q326_hard_negatives" ->
      s"""WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
             CAST(e.embedding AS DOUBLE[])) AS cos
           FROM embeddings q JOIN embeddings e ON e.label <> q.label
           WHERE q.vec_id < 10),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
         SELECT query_id, rank, neighbor_id, ${BP("cos")} AS cos_bp
         FROM r WHERE rank <= 5""",

    // Theil–Sen: per-pair milli slopes over the daily revenue series,
    // lower-median selection for slope and intercept.
    "q328_theil_sen" ->
      s"""WITH u AS MATERIALIZED (
           SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
             AS BIGINT) AS xv,
             CAST(sum(${C("o_totalprice")}) AS BIGINT) AS yv
           FROM orders GROUP BY o_orderdate),
         sl AS MATERIALIZED (
           SELECT 1000 * (b.yv - a.yv) // (b.xv - a.xv) AS sl
           FROM u a JOIN u b ON a.xv < b.xv),
         np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM sl),
         ndc AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM u),
         med AS (SELECT sl FROM (SELECT sl,
             row_number() OVER (ORDER BY sl ASC) AS rn FROM sl)
           CROSS JOIN np WHERE rn = (np + 1) // 2),
         ic AS (SELECT 1000 * u.yv - med.sl * u.xv AS ic
                FROM u CROSS JOIN med),
         icm AS (SELECT ic FROM (SELECT ic,
             row_number() OVER (ORDER BY ic ASC) AS rn FROM ic)
           CROSS JOIN ndc WHERE rn = (nd + 1) // 2)
         SELECT nd AS n_units, np AS n_pairs, med.sl AS slope_milli,
           icm.ic AS intercept_milli
         FROM ndc, np, med, icm""",

    // Benford: first decimal digit of positive cent amounts vs the
    // literal log10(1+1/d) milli masses; χ² with per-digit floors.
    "q329_benford" ->
      s"""WITH d0 AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
             AS digit, CAST(count(*) AS BIGINT) AS n_obs
           FROM (SELECT ${C("o_totalprice")} AS v FROM orders)
           WHERE v > 0 GROUP BY 1),
         nn AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM d0),
         ex AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125),
             (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
           t(digit, p_milli)),
         grid AS MATERIALIZED (
           SELECT CAST(e.digit AS BIGINT) AS digit,
             COALESCE(d0.n_obs, 0) AS n_obs,
             CAST(nn.n * e.p_milli // 1000 AS BIGINT) AS n_expected
           FROM ex e CROSS JOIN nn LEFT JOIN d0 ON d0.digit = e.digit),
         chi AS (SELECT CAST(sum(CASE WHEN n_expected = 0 THEN 0
             ELSE 1000 * CAST(n_obs - n_expected AS HUGEINT)
               * (n_obs - n_expected) // n_expected END) AS BIGINT)
             AS chi2_milli FROM grid)
         SELECT digit, n_obs, n_expected, chi2_milli FROM grid, chi""",

    // Cohort LTV triangle: (user, week) revenue rollup, first-week
    // cohorts, cumulative revenue by week index, per-user idiv.
    "q330_cohort_ltv" ->
      s"""WITH uw AS (SELECT user_id AS u,
             date_trunc('week', CAST(ts AS DATE)) AS week,
             CAST(sum(CASE WHEN event_type = 'purchase'
               THEN ${C("value")} ELSE 0 END) AS BIGINT) AS rev
           FROM events GROUP BY 1, 2),
         fw AS (SELECT u, min(week) AS cohort FROM uw GROUP BY 1),
         sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
                FROM fw GROUP BY 1),
         tri AS (SELECT fw.cohort,
             CAST(date_diff('day', fw.cohort, uw.week) // 7 AS BIGINT)
               AS week_index,
             CAST(sum(uw.rev) AS BIGINT) AS rev_cents
           FROM uw JOIN fw USING (u) GROUP BY 1, 2),
         cum AS (SELECT cohort, week_index, rev_cents,
             CAST(sum(rev_cents) OVER (PARTITION BY cohort
               ORDER BY week_index ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_rev_cents
           FROM tri)
         SELECT strftime(CAST(cohort AS DATE), '%Y-%m-%d') AS cohort,
           week_index, n_users, rev_cents, cum_rev_cents,
           CAST(cum_rev_cents // n_users AS BIGINT) AS ltv_per_user_cents
         FROM cum JOIN sz USING (cohort)""",

    // Schema drift: weekly distinct props-key inventory, full-outer
    // diff against the prior week, consecutive-week guard.
    "q331_schema_drift" ->
      """WITH inv AS MATERIALIZED (
           SELECT DISTINCT date_trunc('week', CAST(ts AS DATE)) AS week,
             unnest(json_keys(CAST(props AS JSON))) AS key
           FROM events WHERE props IS NOT NULL),
         wk AS (SELECT DISTINCT week FROM inv),
         j AS (SELECT coalesce(c.week, p.week) AS week,
             CASE WHEN c.key IS NOT NULL THEN 1 END AS c,
             CASE WHEN p.key IS NOT NULL THEN 1 END AS p
           FROM inv c FULL JOIN
             (SELECT week + 7 AS week, key FROM inv) p
             ON p.week = c.week AND p.key = c.key),
         drift AS (SELECT week,
             CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keys,
             CAST(sum(CASE WHEN c IS NOT NULL AND p IS NOT NULL THEN 1
               ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(sum(CASE WHEN c IS NOT NULL AND p IS NULL THEN 1
               ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN c IS NULL AND p IS NOT NULL THEN 1
               ELSE 0 END) AS BIGINT) AS n_gone
           FROM j GROUP BY 1)
         SELECT strftime(CAST(d.week AS DATE), '%Y-%m-%d') AS week,
           n_keys,
           CASE WHEN pv.week IS NULL THEN NULL ELSE n_shared END AS n_shared,
           CASE WHEN pv.week IS NULL THEN NULL ELSE n_new END AS n_new,
           CASE WHEN pv.week IS NULL THEN NULL ELSE n_gone END AS n_gone,
           CASE WHEN pv.week IS NULL THEN NULL
             ELSE CAST(10000 * n_shared // (n_shared + n_new + n_gone)
               AS BIGINT) END AS jaccard_bp
         FROM drift d JOIN wk ON wk.week = d.week
         LEFT JOIN (SELECT week + 7 AS week FROM wk) pv
           ON pv.week = d.week""",

    // TextRank: window-2 co-occurrence edges, the q147 integer
    // PageRank unroll on the word graph, top-20.
    "q332_textrank" -> {
      val iters = (1 to 5).map { i =>
        s""",
         s$i AS (SELECT e0.y AS node, sum(r${i - 1}.r // deg.d) AS sc
                 FROM e0 JOIN r${i - 1} ON r${i - 1}.node = e0.x
                 JOIN deg ON deg.x = e0.x GROUP BY 1),
         r$i AS (SELECT node, (150000000000 // c) + (85 * sc) // 100 AS r FROM s$i, nn)"""
      }.mkString
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         p0 AS (SELECT unnest(flatten(list_transform(range(1, len(toks) + 1),
             i -> list_transform(range(i + 1, least(i + 3, len(toks) + 1)),
               j -> [toks[i], toks[j]])))) AS pr FROM t),
         pp AS (SELECT pr[1] AS wa, pr[2] AS wb FROM p0
                WHERE pr[1] <> '' AND pr[2] <> '' AND pr[1] <> pr[2]),
         g AS (SELECT DISTINCT least(wa, wb) AS x0, greatest(wa, wb) AS y0
               FROM pp),
         e0 AS MATERIALIZED (SELECT x0 AS x, y0 AS y FROM g
               UNION ALL SELECT y0, x0 FROM g),
         deg AS MATERIALIZED (SELECT x, count(*) AS d FROM e0 GROUP BY 1),
         nn AS (SELECT count(*) AS c FROM deg),
         r0 AS (SELECT x AS node, 1000000000000 // c AS r FROM deg, nn)""" +
      iters +
      """
         SELECT node AS word, CAST(r AS BIGINT) AS rank_e12 FROM (
           SELECT *, row_number() OVER (ORDER BY r DESC, node ASC) AS rn
           FROM r5) WHERE rn <= 20"""
    },

    // Log-rank: q222's entry/departure construction per arm on the
    // shared day grid, 10⁶-floored per-day E/V terms, pinned z.
    "q333_logrank" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         u AS (SELECT user_id, min(us) AS entry_us,
               min(CASE WHEN event_type = 'purchase' THEN us END) AS conv_us
               FROM e GROUP BY 1),
         h AS (SELECT max(us) AS h_us FROM e),
         obs AS MATERIALIZED (SELECT (user_id % 2 = 0) AS is_a,
               CASE WHEN conv_us IS NOT NULL
                 THEN (conv_us - entry_us) // 86400000000
                 ELSE (h.h_us - entry_us) // 86400000000 END AS t_day,
               CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END AS converted
               FROM u, h),
         tot AS (SELECT is_a, CAST(count(*) AS BIGINT) AS n_tot
                 FROM obs GROUP BY 1),
         pda AS (SELECT t_day, is_a, CAST(sum(converted) AS BIGINT) AS d_conv,
                 CAST(count(*) AS BIGINT) AS n_leaving
                 FROM obs GROUP BY 1, 2),
         grid AS (SELECT d.t_day, a.is_a,
                 coalesce(pda.d_conv, 0) AS d_conv,
                 coalesce(pda.n_leaving, 0) AS n_leaving
                 FROM (SELECT DISTINCT t_day FROM obs) d
                 CROSS JOIN (SELECT unnest([TRUE, FALSE]) AS is_a) a
                 LEFT JOIN pda ON pda.t_day = d.t_day AND pda.is_a = a.is_a),
         rk AS (SELECT g.*, tot.n_tot,
                 sum(n_leaving) OVER (PARTITION BY g.is_a ORDER BY t_day
                   ROWS UNBOUNDED PRECEDING) AS left_through
                 FROM grid g JOIN tot ON tot.is_a = g.is_a),
         rr AS (SELECT t_day, is_a, d_conv,
                 n_tot - left_through + n_leaving AS n_risk FROM rk),
         pd AS (SELECT t_day,
                 sum(CASE WHEN is_a THEN n_risk ELSE 0 END) AS n1,
                 sum(CASE WHEN NOT is_a THEN n_risk ELSE 0 END) AS n2,
                 sum(CASE WHEN is_a THEN d_conv ELSE 0 END) AS d1,
                 sum(d_conv) AS d
                 FROM rr GROUP BY 1 HAVING sum(d_conv) > 0),
         m AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
                 CAST(sum(1000000 * CAST(d AS HUGEINT) * n1 // (n1 + n2))
                   AS HUGEINT) AS e1u,
                 CAST(sum(CASE WHEN n1 + n2 > 1 THEN
                   1000000 * CAST(d AS HUGEINT) * n1 * n2 * (n1 + n2 - d)
                     // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2 - 1))
                   ELSE 0 END) AS HUGEINT) AS vu
                 FROM pd),
         ab AS (SELECT
                 CAST(max(CASE WHEN is_a THEN n_tot END) AS BIGINT) AS n_a,
                 CAST(max(CASE WHEN NOT is_a THEN n_tot END) AS BIGINT) AS n_b
                 FROM tot)
         SELECT n_a, n_b, o1 AS obs_a, CAST(e1u AS BIGINT) AS exp_a_micro,
           CAST(vu AS BIGINT) AS var_micro,
           CASE WHEN vu = 0 THEN NULL
             ELSE CAST(floor(CAST(1000000 * CAST(o1 AS HUGEINT) - e1u AS DOUBLE)
               / sqrt(CAST(vu AS DOUBLE)) + 0.5) AS BIGINT) END AS z_milli,
           CASE WHEN vu = 0 THEN NULL
             ELSE CAST(CASE WHEN abs(CAST(floor(
               CAST(1000000 * CAST(o1 AS HUGEINT) - e1u AS DOUBLE)
               / sqrt(CAST(vu AS DOUBLE)) + 0.5) AS BIGINT)) > 1960
               THEN 1 ELSE 0 END AS INT) END AS is_significant
         FROM m, ab""",

    "q334_pacf" -> q334OracleSql,

    // Welch t: exact HUGEINT moments per arm, t/df assembled in the
    // pinned double order (q_a = (n·ss − s²)/(n²(n−1)) mirrored
    // term for term).
    "q337_welch_t" ->
      s"""WITH m AS (SELECT
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE CAST(${C("value")} AS HUGEINT) END) AS sb,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS HUGEINT) * ${C("value")} ELSE 0 END) AS ssa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE CAST(${C("value")} AS HUGEINT) * ${C("value")} END) AS ssb
           FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
         d AS (SELECT *,
             CAST(n_a AS HUGEINT) * ssa - sa * sa AS num_a,
             CAST(n_b AS HUGEINT) * ssb - sb * sb AS num_b,
             CAST(CAST(n_a AS HUGEINT) * ssa - sa * sa AS DOUBLE)
               / CAST(CAST(n_a AS HUGEINT) * n_a * (n_a - 1) AS DOUBLE) AS qa,
             CAST(CAST(n_b AS HUGEINT) * ssb - sb * sb AS DOUBLE)
               / CAST(CAST(n_b AS HUGEINT) * n_b * (n_b - 1) AS DOUBLE) AS qb
           FROM m),
         t AS (SELECT *,
             (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)) / sqrt(qa + qb) AS tv,
             (qa + qb) * (qa + qb)
               / (qa * qa / CAST(n_a - 1 AS DOUBLE)
                  + qb * qb / CAST(n_b - 1 AS DOUBLE)) AS dfv,
             (n_a < 2 OR n_b < 2 OR num_a + num_b = 0) AS bad
           FROM d)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(sa // n_a AS BIGINT) AS mean_a_c,
           CAST(sb // n_b AS BIGINT) AS mean_b_c,
           CAST(CASE WHEN bad THEN NULL
                ELSE floor(tv * 1000 + 0.5) END AS BIGINT) AS t_milli,
           CAST(CASE WHEN bad THEN NULL
                ELSE floor(dfv * 1000 + 0.5) END AS BIGINT) AS df_milli,
           CAST(CASE WHEN bad THEN NULL
                WHEN abs(floor(tv * 1000 + 0.5)) > 1960 THEN 1 ELSE 0
                END AS INT) AS is_significant
         FROM t""",

    // One-way ANOVA F: per-group HUGEINT moments, between-term floored
    // per group at micro scale before the sum (the q323 discipline).
    // Hurst R/S: complete-calendar milli series, per-width block
    // range/variance on exact integers, (R/S)^2 on the 10^6 grid,
    // lg64 endpoints slope over the literal 384 denominator.
    "q365_hurst" -> {
      s"""WITH dd AS (SELECT epoch_us(ts) // 3600000000 AS hr, count(*) AS x
           FROM events GROUP BY 1),
         spn AS (SELECT min(hr) AS ha, max(hr) AS hb FROM dd),
         cal AS (SELECT unnest(range(ha, hb + 1)) AS hr FROM spn),
         hourly AS (SELECT cal.hr, coalesce(1000 * dd.x, 0) AS v
           FROM cal LEFT JOIN dd USING (hr)),
         b0 AS (SELECT min(hr) AS h0, count(*) AS nd FROM hourly),
         base AS (SELECT hourly.hr - b0.h0 AS t,
             hourly.v, b0.nd FROM hourly CROSS JOIN b0),
         wd(n) AS (VALUES (8), (16), (32), (64)),
         blocks AS (SELECT wd.n, base.t // wd.n AS b, base.t, base.v
           FROM base CROSS JOIN wd
           WHERE base.t // wd.n < base.nd // wd.n),
         dv AS (SELECT n, b, t, v,
             sum(v) OVER (PARTITION BY n, b) // n AS mu FROM blocks),
         dv2 AS (SELECT n, b, t, v - mu AS d FROM dv),
         dv3 AS (SELECT n, b, d,
             sum(d) OVER (PARTITION BY n, b ORDER BY t) AS z FROM dv2),
         pb AS (SELECT n, b, max(z) - min(z) AS r,
             sum(CAST(d AS HUGEINT) * d) // CAST(n AS HUGEINT) AS s2
           FROM dv3 GROUP BY 1, 2),
         rs AS (SELECT n, (1000000 * CAST(r AS HUGEINT) * r) // s2 AS rs2
           FROM pb WHERE s2 > 0),
         pn AS (SELECT n, count(*) AS n_blocks,
             sum(rs2) // count(*) AS rs2_mean_q FROM rs GROUP BY 1),
         args AS (SELECT DISTINCT CAST(rs2_mean_q AS BIGINT) AS k,
             CAST(rs2_mean_q AS BIGINT) AS n FROM pn WHERE rs2_mean_q > 0),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "args", "k", "k")},
         pn2 AS (SELECT pn.n, pn.n_blocks, pn.rs2_mean_q, lgt.lg AS lg_rs2
           FROM pn LEFT JOIN lgt ON lgt.k = pn.rs2_mean_q)
         SELECT CAST(n AS BIGINT) AS n, CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(rs2_mean_q AS BIGINT) AS rs2_mean_q,
           CAST(lg_rs2 AS BIGINT) AS lg_rs2,
           CAST(NULL AS BIGINT) AS hurst_milli FROM pn2
         UNION ALL
         SELECT 0, NULL, NULL, NULL,
           CAST(CASE WHEN lh IS NULL OR ll IS NULL THEN NULL
                ELSE (1000 * (lh - ll)) // 384 END AS BIGINT)
         FROM (SELECT max(CASE WHEN n = 64 THEN lg_rs2 END) AS lh,
               max(CASE WHEN n = 8 THEN lg_rs2 END) AS ll FROM pn2)""" },

    // CDC chunking: content-defined cut points (md5 hex sliver), the
    // tail-closed boundary array, chunk hashes, two chunk-grain folds.
    "q363_cdc_chunking" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tks
           FROM documents WHERE len(string_split(text, ' ')) >= 1),
         wb AS (SELECT doc_id, tks,
             list_filter(range(1, len(tks) + 1), i -> i >= 4 AND
               substring(md5(array_to_string(
                 list_slice(tks, i - 3, i), ' ')), 1, 1) = '0') AS cuts
           FROM tk),
         bb AS (SELECT doc_id, tks,
             CASE WHEN len(cuts) > 0 AND cuts[-1] = len(tks) THEN cuts
                  ELSE list_concat(cuts, [len(tks)]) END AS bnds FROM wb),
         ch AS (SELECT doc_id,
             md5(array_to_string(list_slice(tks,
               CASE WHEN j = 1 THEN 1 ELSE bnds[j - 1] + 1 END,
               bnds[j]), ' ')) AS h,
             bnds[j] - CASE WHEN j = 1 THEN 0 ELSE bnds[j - 1] END AS len
           FROM bb, unnest(range(1, len(bnds) + 1)) AS u(j)),
         uq AS (SELECT h, max(len) AS len FROM ch GROUP BY 1),
         a1 AS (SELECT count(*) AS n_chunks, sum(len) AS total_tokens FROM ch),
         a2 AS (SELECT count(*) AS n_unique_chunks, sum(len) AS unique_tokens
           FROM uq)
         SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_unique_chunks AS BIGINT) AS n_unique_chunks,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(unique_tokens AS BIGINT) AS unique_tokens,
           CAST((1000 * total_tokens) // n_chunks AS BIGINT)
             AS mean_chunk_milli,
           CAST((10000 * (total_tokens - unique_tokens)) // total_tokens
             AS BIGINT) AS savings_bp
         FROM a1, a2""",

    // MinHash calibration: md5-permutation signatures for pair docs
    // only, per-pair match share vs exact J, decile rollup.
    "q364_minhash_calibration" -> {
      s"""WITH p AS ($jaccardOracle),
         ds AS (SELECT doc_a AS did FROM p UNION SELECT doc_b FROM p),
         t2 AS (SELECT doc_id, string_split(text, ' ') AS tks
           FROM documents JOIN ds ON ds.did = documents.doc_id
           WHERE len(string_split(text, ' ')) >= 3),
         s2 AS (SELECT doc_id AS did,
             unnest(list_distinct(list_transform(range(1, len(tks) - 1),
               i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2]))) AS sh
           FROM t2),
         pr AS (SELECT unnest(range(0, ${ops.Dedup.CalibPerms})) AS p16),
         sig AS (SELECT did, p16,
             min(md5(CAST(p16 AS VARCHAR) || ':' || sh)) AS mh
           FROM s2 CROSS JOIN pr GROUP BY 1, 2),
         est AS (SELECT p.jaccard_bp,
             (10000 * sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END))
               // ${ops.Dedup.CalibPerms} AS est_bp
           FROM p JOIN sig a ON a.did = p.doc_a
           JOIN sig b ON b.did = p.doc_b AND b.p16 = a.p16
           GROUP BY p.doc_a, p.doc_b, p.jaccard_bp)
         SELECT CAST(jaccard_bp // 1000 AS BIGINT) AS j_decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(est_bp) // count(*) AS BIGINT) AS mean_est_bp,
           CAST(sum(abs(est_bp - jaccard_bp)) // count(*) AS BIGINT)
             AS mean_abs_err_bp
         FROM est GROUP BY 1""" },

    // WoE/IV: Laplace-smoothed band counts, 64*log2 WoE via the
    // shared lgCte, e6 share deltas, IV as the descaled sum.
    "q369_woe_iv" -> {
      s"""WITH g AS (SELECT least(CAST(floor(o_totalprice / 50000)
               AS BIGINT), 9) AS band, count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS nb
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
           GROUP BY 1),
         t AS (SELECT sum(n - nb) AS gt, sum(nb) AS bt, count(*) AS k
           FROM g),
         j AS (SELECT g.band, g.n, g.nb, g.n - g.nb + 1 AS gp,
             g.nb + 1 AS bp, t.gt + t.k AS gtp, t.bt + t.k AS btp
           FROM g CROSS JOIN t),
         args AS (SELECT DISTINCT v AS k, v AS n FROM (
             SELECT gp * btp AS v FROM j
             UNION ALL SELECT bp * gtp FROM j) WHERE v > 0),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "args", "k", "k")},
         rw AS (SELECT j.band, j.n, j.nb, l1.lg - l2.lg AS woe_q,
             (1000000 * (CAST(j.gp AS HUGEINT) * j.btp
               - CAST(j.bp AS HUGEINT) * j.gtp))
               // (CAST(j.gtp AS HUGEINT) * j.btp) AS d_e6
           FROM j JOIN lgt l1 ON l1.k = j.gp * j.btp
           JOIN lgt l2 ON l2.k = j.bp * j.gtp)
         SELECT CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
           CAST(nb AS BIGINT) AS n_bad, CAST(woe_q AS BIGINT) AS woe_q,
           CAST(NULL AS BIGINT) AS iv_q FROM rw
         UNION ALL
         SELECT -1, CAST(sum(n) AS BIGINT), CAST(sum(nb) AS BIGINT), NULL,
           CAST(sum(d_e6 * woe_q) // 1000000 AS BIGINT) FROM rw""" },

    // Gain/lift curve: score-level rollup, cumulative-from-the-top
    // windows over the bounded bp grid, exact idiv boundaries.
    "q370_gain_curve" ->
      s"""WITH $LangIdCtes,
         pp AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j AS (SELECT s AS score_bp,
               CASE WHEN pp.pred_lang = d.lang THEN 1 ELSE 0 END AS y
               FROM documents d JOIN pp USING (doc_id)),
         lv AS (SELECT score_bp, count(*) AS n, sum(y) AS pos
               FROM j GROUP BY 1),
         t AS (SELECT sum(n) AS tn, sum(pos) AS tp FROM lv),
         c AS (SELECT score_bp, n, pos,
               sum(n) OVER (ORDER BY score_bp DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
               sum(pos) OVER (ORDER BY score_bp DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
               FROM lv)
         SELECT CAST(score_bp AS BIGINT) AS score_bp, CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS pos, CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST((10000 * cum_pos) // tp AS BIGINT) AS gain_bp,
           CAST((10000 * cum_n) // tn AS BIGINT) AS depth_bp,
           CAST(CASE WHEN tp = 0 THEN NULL
                ELSE (1000 * cum_pos * tn) // (cum_n * tp) END AS BIGINT)
             AS lift_milli
         FROM c CROSS JOIN t""",

    // Brier decomposition: exact per-bin squared numerators, one
    // floor per bin, the rel - res + unc identity on the e8 grid.
    "q372_brier_decomp" ->
      s"""WITH $LangIdCtes,
         pp AS (SELECT doc_id, lang AS pred_lang,
               ${BP("score")} AS s FROM r WHERE rn = 1),
         j AS (SELECT s, CASE WHEN pp.pred_lang = d.lang THEN 1 ELSE 0 END AS y
               FROM documents d JOIN pp USING (doc_id)),
         b AS (SELECT least((s * 10) // 10000, 9) AS bin, count(*) AS n,
               sum(y) AS y, sum(s) AS ss FROM j GROUP BY 1),
         t AS (SELECT sum(n) AS nn, sum(y) AS yy FROM b),
         tm AS (SELECT b.n, t.nn, t.yy,
             (CAST(b.ss - 10000 * b.y AS HUGEINT)
               * (b.ss - 10000 * b.y)) // b.n AS relt,
             (100000000 * (CAST(b.y AS HUGEINT) * t.nn
                 - CAST(t.yy AS HUGEINT) * b.n)
               * (CAST(b.y AS HUGEINT) * t.nn
                 - CAST(t.yy AS HUGEINT) * b.n))
               // (CAST(b.n AS HUGEINT) * t.nn * t.nn) AS rest
           FROM b CROSS JOIN t)
         SELECT CAST(nn AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(relt) // nn AS BIGINT) AS reliability_e8,
           CAST(sum(rest) // nn AS BIGINT) AS resolution_e8,
           CAST((100000000 * CAST(yy AS HUGEINT) * (nn - yy))
             // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS uncertainty_e8,
           CAST(sum(relt) // nn - sum(rest) // nn
             + (100000000 * CAST(yy AS HUGEINT) * (nn - yy))
               // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS brier_e8
         FROM tm GROUP BY nn, yy""",

    // Kneser-Ney: bigram/continuation rollups, the quarters discount,
    // each factor its own idiv in the pinned composition.
    "q371_kneser_ney" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tks FROM documents),
         bg AS (SELECT w1, w2, count(*) AS c12 FROM (
             SELECT tks[i] AS w1, tks[i + 1] AS w2
             FROM tk, unnest(range(1, len(tks))) AS u(i)) GROUP BY 1, 2),
         c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p FROM bg GROUP BY 1),
         ct AS (SELECT w2, count(*) AS ncont FROM bg GROUP BY 1),
         tt AS (SELECT count(*) AS tt FROM bg),
         r AS (SELECT bg.w1, bg.w2, bg.c12, c1.c1, ct.ncont,
             (1000000 * (4 * bg.c12 - 3)) // (4 * c1.c1)
               + (((1000000 * 3 * c1.n1p) // (4 * c1.c1))
                 * ((1000000 * ct.ncont) // tt.tt)) // 1000000 AS pkn_e6
           FROM bg JOIN c1 USING (w1) JOIN ct USING (w2) CROSS JOIN tt)
         SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
           CAST(ncont AS BIGINT) AS ncont, CAST(pkn_e6 AS BIGINT) AS pkn_e6
         FROM r QUALIFY row_number()
           OVER (ORDER BY c12 DESC, w1 ASC, w2 ASC) <= 20""",

    // Trigram Kneser-Ney: the q371 CTE chain one order up — every
    // continuation count from one trigram type table, the quarters
    // discount at both levels, each factor its own idiv.
    "q377_kneser_ney_tri" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tks FROM documents),
         tg AS MATERIALIZED (SELECT w1, w2, w3, count(*) AS c123 FROM (
             SELECT tks[i] AS w1, tks[i + 1] AS w2, tks[i + 2] AS w3
             FROM tk, unnest(range(1, len(tks) - 1)) AS u(i)) GROUP BY 1, 2, 3),
         c12 AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n3
           FROM tg GROUP BY 1, 2),
         t23 AS MATERIALIZED (SELECT w2, w3, count(*) AS nc23 FROM tg GROUP BY 1, 2),
         mid AS (SELECT w2, count(*) AS nmid2 FROM tg GROUP BY 1),
         n2 AS (SELECT w2, count(*) AS n2 FROM t23 GROUP BY 1),
         c3 AS (SELECT w3, count(*) AS ncont3 FROM t23 GROUP BY 1),
         tt AS (SELECT count(*) AS tt FROM t23),
         r AS (SELECT tg.w1, tg.w2, tg.w3, tg.c123, c12.c12,
             (1000000 * (4 * tg.c123 - 3)) // (4 * c12.c12)
               + (((1000000 * 3 * c12.n3) // (4 * c12.c12))
                 * ((1000000 * (4 * t23.nc23 - 3)) // (4 * mid.nmid2)
                   + (((1000000 * 3 * n2.n2) // (4 * mid.nmid2))
                     * ((1000000 * c3.ncont3) // tt.tt)) // 1000000))
                 // 1000000 AS pkn_e6
           FROM tg JOIN c12 USING (w1, w2) JOIN t23 USING (w2, w3)
           JOIN mid USING (w2) JOIN n2 USING (w2) JOIN c3 USING (w3)
           CROSS JOIN tt)
         SELECT w1, w2, w3, CAST(c123 AS BIGINT) AS c123,
           CAST(c12 AS BIGINT) AS c12, CAST(pkn_e6 AS BIGINT) AS pkn_e6
         FROM r QUALIFY row_number()
           OVER (ORDER BY c123 DESC, w1 ASC, w2 ASC, w3 ASC) <= 20""",

    // BH-FDR: two-proportion z in the exact-integer algebraic form,
    // p via the shared driver-quantized erfc table, integer step-up.
    "q368_bh_fdr" -> {
      val zp = ops.Relational.ZpTable
        .map { case (b, pv) => s"($b, $pv)" }.mkString(", ")
      s"""WITH g AS (SELECT c_nationkey AS g, count(*) AS n,
             sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS k
           FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
         t AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g),
         zp(b, p_e6) AS (VALUES $zp),
         sc AS (SELECT g.g, g.n, g.k,
             CAST(floor(1000 * CAST(CAST(g.k AS HUGEINT) * t.nn
                 - CAST(t.kk AS HUGEINT) * g.n AS DOUBLE)
               / sqrt(CAST(CAST(g.n AS HUGEINT) * t.kk * (t.nn - t.kk)
                 AS DOUBLE)) + 0.5) AS BIGINT) AS z_milli
           FROM g CROSS JOIN t
           WHERE CAST(g.n AS HUGEINT) * t.kk * (t.nn - t.kk) > 0),
         jp AS (SELECT sc.*, zp.p_e6 FROM sc
           JOIN zp ON zp.b = least(abs(sc.z_milli) // 10, 400)),
         mm AS (SELECT count(*) AS m FROM jp),
         rk AS (SELECT jp.*, mm.m,
             CAST(row_number() OVER (ORDER BY jp.p_e6 ASC, jp.g ASC)
               AS BIGINT) AS rank
           FROM jp CROSS JOIN mm),
         ct AS (SELECT max(CASE WHEN p_e6 * m <= 100000 * rank
               THEN rank END) AS cut FROM rk)
         SELECT rk.g AS nation, rk.n, CAST(rk.k AS BIGINT) AS k,
           rk.z_milli, CAST(rk.p_e6 AS BIGINT) AS p_e6, rk.rank,
           CAST(CASE WHEN rk.rank <= coalesce(ct.cut, 0) THEN 1 ELSE 0 END
             AS INT) AS is_discovery
         FROM rk CROSS JOIN ct""" },

    // q421: hash-order ranks, earliest-prefix buckets for docs and
    // token first-occurrences, cumulative grid, lg64 lattice betas.
    "q421_heaps" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
               doc_id) AS rn
           FROM documents),
         nn AS (SELECT count(*) AS n FROM d),
         kb AS (SELECT d.rn, d.tk,
             (5 * (rn - 1)) // nn.n + 1 AS k FROM d, nn),
         ti AS (SELECT k, sum(len(tk)) AS ti, count(*) AS di
           FROM kb GROUP BY 1),
         tm AS (SELECT tok, min(rn) AS mr FROM
           (SELECT rn, unnest(tk) AS tok FROM kb) GROUP BY 1),
         vi AS (SELECT (5 * (mr - 1)) // nn.n + 1 AS k, count(*) AS vi
           FROM tm, nn GROUP BY 1),
         grid AS (SELECT unnest(range(1, 6)) AS k),
         cum AS MATERIALIZED (SELECT g.k,
             sum(coalesce(ti.di, 0)) OVER (ORDER BY g.k) AS n_docs,
             sum(coalesce(ti.ti, 0)) OVER (ORDER BY g.k) AS n_tokens,
             sum(coalesce(vi.vi, 0)) OVER (ORDER BY g.k) AS vocab
           FROM grid g LEFT JOIN ti ON ti.k = g.k
           LEFT JOIN vi ON vi.k = g.k),
         args AS (SELECT DISTINCT v AS k, v AS n FROM (
             SELECT n_tokens AS v FROM cum
             UNION ALL SELECT vocab FROM cum) WHERE v > 0),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "args", "k", "k")},
         j AS (SELECT cum.*, lt.lg AS lg_t, lv.lg AS lg_v,
             lag(lt.lg) OVER (ORDER BY cum.k) AS plg_t,
             lag(lv.lg) OVER (ORDER BY cum.k) AS plg_v
           FROM cum LEFT JOIN lgt lt ON lt.k = cum.n_tokens
           LEFT JOIN lgt lv ON lv.k = cum.vocab)
         SELECT k AS prefix, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           CAST(CASE WHEN plg_t IS NULL OR lg_t - plg_t = 0 THEN NULL
             ELSE (1000 * (lg_v - plg_v)) // (lg_t - plg_t) END AS BIGINT)
             AS beta_milli
         FROM j""",

    // q420: cents moments per priority, variance floor, corrected
    // isqrt, then both allocations at budget 10000.
    "q420_neyman" ->
      s"""WITH g AS (SELECT o_orderpriority AS stratum, count(*) AS n,
             sum(${C("o_totalprice")}) AS s,
             sum(CAST(${C("o_totalprice")} AS HUGEINT)
               * ${C("o_totalprice")}) AS ss
           FROM orders
           WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY 1),
         v AS (SELECT stratum, n, CASE WHEN n < 2 THEN NULL
             ELSE (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
               // (CAST(n AS HUGEINT) * (n - 1)) END AS vf FROM g),
         c AS (SELECT stratum, n, vf,
             CAST(floor(sqrt(CAST(vf AS DOUBLE))) AS BIGINT) AS s0 FROM v),
         i AS (SELECT stratum, n, CASE WHEN vf IS NULL THEN NULL
             WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= vf THEN s0 + 1
             WHEN CAST(s0 AS HUGEINT) * s0 > vf THEN s0 - 1
             ELSE s0 END AS sd FROM c),
         w AS (SELECT stratum, n, sd, coalesce(n * sd, 0) AS weight FROM i),
         t AS (SELECT sum(weight) AS tw, sum(n) AS tn FROM w)
         SELECT w.stratum, CAST(w.n AS BIGINT) AS n_units,
           CAST(sd AS BIGINT) AS sd_cents, CAST(weight AS BIGINT) AS weight,
           CAST(CASE WHEN t.tw = 0 THEN NULL
             ELSE (10000 * CAST(weight AS HUGEINT)) // t.tw END AS BIGINT)
             AS alloc_neyman,
           CAST((10000 * CAST(w.n AS HUGEINT)) // t.tn AS BIGINT)
             AS alloc_prop
         FROM w, t""",

    // q418: the q368 z/p chain on suppliers with the Holm step-down
    // cut — min failing rank, strict-below rejection.
    "q418_holm" -> {
      val zp = ops.Relational.ZpTable
        .map { case (b, pv) => s"($b, $pv)" }.mkString(", ")
      s"""WITH g AS (SELECT s_nationkey AS g, count(*) AS n,
             sum(CASE WHEN s_acctbal > 4500 THEN 1 ELSE 0 END) AS k
           FROM supplier WHERE s_nationkey IS NOT NULL GROUP BY 1),
         t AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g),
         zp(b, p_e6) AS (VALUES $zp),
         sc AS (SELECT g.g, g.n, g.k,
             CAST(floor(1000 * CAST(CAST(g.k AS HUGEINT) * t.nn
                 - CAST(t.kk AS HUGEINT) * g.n AS DOUBLE)
               / sqrt(CAST(CAST(g.n AS HUGEINT) * t.kk * (t.nn - t.kk)
                 AS DOUBLE)) + 0.5) AS BIGINT) AS z_milli
           FROM g CROSS JOIN t
           WHERE CAST(g.n AS HUGEINT) * t.kk * (t.nn - t.kk) > 0),
         jp AS (SELECT sc.*, zp.p_e6 FROM sc
           JOIN zp ON zp.b = least(abs(sc.z_milli) // 10, 400)),
         mm AS (SELECT count(*) AS m FROM jp),
         rk AS (SELECT jp.*, mm.m,
             CAST(row_number() OVER (ORDER BY jp.p_e6 ASC, jp.g ASC)
               AS BIGINT) AS rank
           FROM jp CROSS JOIN mm),
         ct AS (SELECT min(CASE WHEN p_e6 * (m - rank + 1) > 50000
               THEN rank END) AS stop FROM rk)
         SELECT rk.g AS nation, rk.n, CAST(rk.k AS BIGINT) AS k,
           rk.z_milli, CAST(rk.p_e6 AS BIGINT) AS p_e6, rk.rank,
           CAST(CASE WHEN rk.rank < coalesce(ct.stop, rk.m + 1)
             THEN 1 ELSE 0 END AS INT) AS is_reject
         FROM rk CROSS JOIN ct""" },

    // Brown-Forsythe: exact per-group percentile_disc medians, |x-med|
    // deviations on the cents grid, then the q338 exact-moment F.
    "q359_brown_forsythe" ->
      s"""WITH v AS (SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice + 0.5) AS BIGINT) AS v
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
         med AS (SELECT g, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
             AS BIGINT) AS med FROM v GROUP BY 1),
         z AS (SELECT v.g, abs(v.v - med.med) AS zv
           FROM v JOIN med USING (g)),
         g AS (SELECT z.g AS gr, count(*) AS ng,
             sum(CAST(zv AS HUGEINT)) AS sg,
             sum(CAST(zv AS HUGEINT) * zv) AS ssg FROM z GROUP BY 1),
         m AS (SELECT count(*) AS k_groups, sum(ng) AS n, sum(sg) AS s,
             sum(ssg) AS ss,
             sum((1000000 * sg * sg) // CAST(ng AS HUGEINT)) AS t1q
           FROM g),
         d AS (SELECT *,
             t1q - (1000000 * s * s) // CAST(n AS HUGEINT) AS ssbq,
             1000000 * ss - t1q AS sswq FROM m)
         SELECT CAST(n AS BIGINT) AS n, CAST(k_groups AS BIGINT) AS k_groups,
           CAST(ssbq // 1000000 AS BIGINT) AS ssb_c2,
           CAST(sswq // 1000000 AS BIGINT) AS ssw_c2,
           CAST(CASE WHEN k_groups < 2 OR n <= k_groups OR sswq = 0 THEN NULL
                ELSE floor(1000 * (CAST(ssbq AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
                  / (CAST(sswq AS DOUBLE) / CAST(n - k_groups AS DOUBLE)) + 0.5)
                END AS BIGINT) AS f_milli
         FROM d""",

    // Cochran-Armitage: exact HUGEINT moments at the score grain, z
    // assembled in the pinned double order.
    "q360_cochran_armitage" ->
      """WITH rw AS (SELECT CAST(year(o_orderdate) - 1992 AS BIGINT) AS w,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS c
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL),
         g AS (SELECT w, count(*) AS ng, sum(c) AS rg FROM rw GROUP BY 1),
         m AS (SELECT count(*) AS k_groups, sum(ng) AS n, sum(rg) AS r,
             sum(CAST(w AS HUGEINT) * ng) AS w1,
             sum(CAST(w AS HUGEINT) * w * ng) AS w2,
             sum(CAST(w AS HUGEINT) * rg) AS t FROM g)
         SELECT CAST(n AS BIGINT) AS n, CAST(k_groups AS BIGINT) AS k_groups,
           CAST(r AS BIGINT) AS n_cases, CAST(t AS BIGINT) AS t_stat,
           CAST(CASE WHEN k_groups < 2 OR r = 0 OR r = n
                  OR n * w2 = w1 * w1 THEN NULL
                ELSE floor(1000 * CAST(n * t - r * w1 AS DOUBLE)
                  / sqrt(CAST(r * (n - r) * (n * w2 - w1 * w1) AS DOUBLE)
                    / CAST(n - 1 AS DOUBLE)) + 0.5)
                END AS BIGINT) AS z_milli
         FROM m""",

    // k-map: QI-grain sample and population rollups, one join, bands
    // + the ALL row's at-risk share.
    "q361_k_map" ->
      """WITH pop AS (SELECT c_nationkey, c_mktsegment, count(*) AS k_pop
           FROM customer GROUP BY 1, 2),
         smp AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_rows
           FROM customer WHERE c_acctbal >= 9000 GROUP BY 1, 2),
         b AS (SELECT CASE WHEN k_pop = 1 THEN 'k=1'
               WHEN k_pop <= 4 THEN 'k=2-4'
               WHEN k_pop <= 19 THEN 'k=5-19' ELSE 'k>=20' END AS band,
             n_rows, k_pop
           FROM smp JOIN pop USING (c_nationkey, c_mktsegment))
         SELECT band, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_rows) AS BIGINT) AS n_released,
           CAST(NULL AS BIGINT) AS at_risk_bp
         FROM b GROUP BY 1
         UNION ALL
         SELECT 'ALL', CAST(NULL AS BIGINT),
           CAST(sum(n_rows) AS BIGINT),
           CAST((10000 * sum(CASE WHEN k_pop <= 4 THEN n_rows ELSE 0 END))
             // sum(n_rows) AS BIGINT)
         FROM b""",

    // Good-Turing over BIGRAMS: count-of-counts at the 10 smallest
    // observed r, one idiv per ratio, the r=0 row carrying the
    // unseen-mass estimate.
    "q362_good_turing" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tks FROM documents),
         tf AS (SELECT g, count(*) AS rr FROM (
             SELECT unnest(list_transform(range(1, len(tks)),
               i -> tks[i] || ' ' || tks[i + 1])) AS g FROM tk)
           GROUP BY 1),
         nr AS (SELECT rr, count(*) AS n_r FROM tf GROUP BY 1),
         tot AS (SELECT sum(rr * n_r) AS nn FROM nr),
         rk AS (SELECT *, row_number() OVER (ORDER BY rr ASC) AS rk FROM nr)
         SELECT CAST(rk.rr AS BIGINT) AS r, CAST(rk.n_r AS BIGINT) AS n_r,
           CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_next,
           CAST((1000 * (rk.rr + 1) * coalesce(nx.n_r, 0)) // rk.n_r
             AS BIGINT) AS rstar_milli,
           CAST((10000 * rk.rr * rk.n_r) // nn AS BIGINT) AS mass_bp
         FROM rk LEFT JOIN nr nx ON nx.rr = rk.rr + 1 CROSS JOIN tot
         WHERE rk.rk <= 10
         UNION ALL
         SELECT 0, NULL, CAST(n_r AS BIGINT), NULL,
           CAST((10000 * n_r) // nn AS BIGINT)
         FROM nr CROSS JOIN tot WHERE rr = 1""",

    "q338_anova_f" ->
      s"""WITH g AS (SELECT event_type AS gr, count(*) AS ng,
             sum(CAST(${C("value")} AS HUGEINT)) AS sg,
             sum(CAST(${C("value")} AS HUGEINT) * ${C("value")}) AS ssg
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1),
         m AS (SELECT count(*) AS k_groups, sum(ng) AS n, sum(sg) AS s,
             sum(ssg) AS ss,
             sum((1000000 * sg * sg) // CAST(ng AS HUGEINT)) AS t1q
           FROM g),
         d AS (SELECT *,
             t1q - (1000000 * s * s) // CAST(n AS HUGEINT) AS ssbq,
             1000000 * ss - t1q AS sswq FROM m)
         SELECT CAST(n AS BIGINT) AS n, CAST(k_groups AS BIGINT) AS k_groups,
           CAST(ssbq // 1000000 AS BIGINT) AS ssb_c2,
           CAST(sswq // 1000000 AS BIGINT) AS ssw_c2,
           CAST(CASE WHEN k_groups < 2 OR n <= k_groups OR sswq = 0 THEN NULL
                ELSE floor(1000 * (CAST(ssbq AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
                  / (CAST(sswq AS DOUBLE) / CAST(n - k_groups AS DOUBLE)) + 0.5)
                END AS BIGINT) AS f_milli
         FROM d""",

    // CUPED: per-user pre/post spend split at the integer calendar
    // midpoint, exact HUGEINT moments, integer milli theta, adjusted
    // means by one idiv; 10^4*rho^2 is the pinned double boundary.
    "q339_cuped" ->
      s"""WITH b AS (SELECT min(CAST(ts AS DATE)) AS d_min,
             max(CAST(ts AS DATE)) AS d_max FROM events),
         p AS (SELECT CAST(d_min + CAST(date_diff('day', d_min, d_max) // 2
               AS INT) AS DATE) AS pivot FROM b),
         pu AS (SELECT user_id AS u, max(user_id % 2) AS a,
             sum(CASE WHEN CAST(ts AS DATE) <= p.pivot
                 THEN ${C("value")} ELSE 0 END) AS x,
             sum(CASE WHEN CAST(ts AS DATE) > p.pivot
                 THEN ${C("value")} ELSE 0 END) AS y
           FROM events CROSS JOIN p GROUP BY 1),
         m AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy FROM pu),
         gl AS (SELECT n, sx,
             CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx = 0 THEN NULL
               ELSE (1000 * (CAST(n AS HUGEINT) * sxy - sx * sy))
                 // (CAST(n AS HUGEINT) * sxx - sx * sx) END AS theta_milli,
             CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx = 0
                    OR CAST(n AS HUGEINT) * syy - sy * sy = 0 THEN NULL
               ELSE floor(10000
                 * (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE))
                 / (CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
                 + 0.5) END AS var_reduction_bp
           FROM m),
         ar AS (SELECT a AS arm, count(*) AS n_arm,
             sum(CAST(x AS HUGEINT)) AS sxa, sum(CAST(y AS HUGEINT)) AS sya
           FROM pu GROUP BY 1)
         SELECT CAST(ar.arm AS BIGINT) AS arm,
           CAST(ar.n_arm AS BIGINT) AS n_arm,
           CAST((1000 * sya) // CAST(n_arm AS HUGEINT) AS BIGINT)
             AS mean_y_milli,
           CAST(CASE WHEN gl.theta_milli IS NULL THEN NULL
                ELSE (1000 * (1000 * sya * CAST(gl.n AS HUGEINT)
                  - CAST(gl.theta_milli AS HUGEINT)
                    * (sxa * CAST(gl.n AS HUGEINT)
                       - gl.sx * CAST(ar.n_arm AS HUGEINT))))
                  // (1000 * CAST(ar.n_arm AS HUGEINT) * gl.n)
                END AS BIGINT) AS mean_adj_milli,
           CAST(gl.theta_milli AS BIGINT) AS theta_milli,
           CAST(gl.var_reduction_bp AS BIGINT) AS var_reduction_bp
         FROM ar CROSS JOIN gl""",

    // Adamic-Adar link prediction: basket pairs -> support-2 edges ->
    // wedge join, per-center term 64e6 // lg64(deg) (the shared
    // integer-log CTE), existing edges anti-joined, top-20.
    "q346_link_prediction" -> {
      s"""WITH b AS (SELECT l_orderkey AS bk,
             list_sort(list(DISTINCT l_partkey)) AS arr
           FROM lineitem GROUP BY 1),
         pr AS (SELECT unnest(flatten(
             list_transform(range(1, len(arr) + 1), i ->
               list_transform(range(i + 1, len(arr) + 1), j ->
                 [arr[i], arr[j]])))) AS p FROM b),
         e AS MATERIALIZED (SELECT p[1] AS a, p[2] AS b, count(*) AS n
           FROM pr GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS MATERIALIZED (SELECT a, b FROM e
           UNION ALL SELECT b, a FROM e),
         dg AS (SELECT a AS z, count(*) AS dz FROM und GROUP BY 1),
         dd AS (SELECT DISTINCT dz AS k, dz AS n FROM dg),
         pw AS (SELECT unnest(range(0, 63)) AS p),
         ${UnigramOracleSql.lgCte("lgt", "dd", "k", "k")},
         w AS (SELECT x.b AS z, x.a AS u, y.b AS v
           FROM und x JOIN und y ON y.a = x.b WHERE x.a < y.b),
         sc AS (SELECT w.u, w.v, count(*) AS common_neighbors,
             sum(64000000 // lgt.lg) AS aa_q
           FROM w JOIN dg ON dg.z = w.z JOIN lgt ON lgt.k = dg.dz
           GROUP BY 1, 2),
         fin AS (SELECT sc.* FROM sc LEFT JOIN e
           ON e.a = sc.u AND e.b = sc.v WHERE e.a IS NULL)
         SELECT u AS item_a, v AS item_b,
           CAST(common_neighbors AS BIGINT) AS common_neighbors,
           CAST(aa_q AS BIGINT) AS aa_q
         FROM (SELECT *, row_number() OVER (ORDER BY aa_q DESC, u ASC, v ASC)
             AS rn FROM fin)
         WHERE rn <= 20""" },

    // Gopher rule battery: per-document integer metrics (row-local
    // list arithmetic), one fail-counter aggregation, per-rule rows.
    "q343_gopher_rules" ->
      """WITH m AS (SELECT
             len(string_split(text, ' ')) AS n_tok,
             (1000 * (length(text) - (len(string_split(text, ' ')) - 1)))
               // len(string_split(text, ' ')) AS mwl,
             len(list_filter(string_split(text, ' '), t -> t IN
               ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS n_stop,
             len(list_filter(string_split(text, ' '),
               t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
             list_max(list_transform(list_distinct(string_split(text, ' ')),
               t -> len(list_filter(string_split(text, ' '),
                 x -> x = t)))) AS top_cnt
           FROM documents),
         f AS (SELECT
             CASE WHEN n_tok < 50 OR n_tok > 100000 THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN mwl < 3000 OR mwl > 10000 THEN 1 ELSE 0 END AS f_mwl,
             CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN 10000 * n_alpha < 8000 * n_tok THEN 1 ELSE 0 END AS f_alpha,
             CASE WHEN 10000 * top_cnt > 2000 * n_tok THEN 1 ELSE 0 END AS f_rep
           FROM m),
         a AS (SELECT count(*) AS n_docs, sum(f_wc) AS s_wc,
             sum(f_mwl) AS s_mwl, sum(f_stop) AS s_stop,
             sum(f_alpha) AS s_alpha, sum(f_rep) AS s_rep,
             sum(CASE WHEN f_wc + f_mwl + f_stop + f_alpha + f_rep > 0
               THEN 1 ELSE 0 END) AS s_any FROM f),
         u AS (SELECT 'word_count' AS rule, n_docs, s_wc AS n_failed FROM a
           UNION ALL SELECT 'mean_word_len', n_docs, s_mwl FROM a
           UNION ALL SELECT 'stopwords', n_docs, s_stop FROM a
           UNION ALL SELECT 'alpha_words', n_docs, s_alpha FROM a
           UNION ALL SELECT 'repetition', n_docs, s_rep FROM a
           UNION ALL SELECT 'any_rule', n_docs, s_any FROM a)
         SELECT rule, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_failed AS BIGINT) AS n_failed,
           CAST((10000 * n_failed) // n_docs AS BIGINT) AS fail_bp
         FROM u""",

    // q417: the PCM generator replayed at the sample grain (the q408
    // convention) projected onto the shared quantized basis literals;
    // HUGEINT products, one idiv per power, shares in HUGEINT.
    "q417_audio_bands" -> {
      val rows = ops.Multimodal.audioBandTable
        .map { case (p, k, cq, sq) => s"($p, $k, $cq, $sq)" }
        .mkString(",\n             ")
      s"""WITH tb(p, k, cq, sq) AS (VALUES
             $rows),
         n AS (SELECT doc_id,
             800 + (doc_id * 2654435761) % 1600 AS ns FROM documents),
         s AS (SELECT doc_id, unnest(range(ns)) AS i FROM n),
         v AS (SELECT doc_id, i,
             ((i * 127 + doc_id * 31) % 65536) - 32768 AS x FROM s),
         pr AS (SELECT v.doc_id, tb.p,
             sum(CAST(v.x AS HUGEINT) * tb.cq) AS sc,
             sum(CAST(v.x AS HUGEINT) * tb.sq) AS ss
           FROM v JOIN tb ON tb.k = v.i % tb.p GROUP BY 1, 2),
         pw AS (SELECT doc_id, p,
             (sc * sc + ss * ss) // 1000000000000 AS bp_ FROM pr),
         tot AS (SELECT doc_id, sum(bp_) AS t FROM pw GROUP BY 1)
         SELECT pw.doc_id, CAST(pw.p AS INT) AS period,
           CAST(bp_ AS BIGINT) AS band_power,
           CAST(CASE WHEN t = 0 THEN NULL
             ELSE (10000 * CAST(bp_ AS HUGEINT)) // t END AS BIGINT)
             AS share_bp,
           CAST(CASE WHEN row_number() OVER (PARTITION BY pw.doc_id
               ORDER BY bp_ DESC, pw.p ASC) = 1 THEN 1 ELSE 0 END AS INT)
             AS is_peak
         FROM pw JOIN tot USING (doc_id)"""
    },

    // Integer periodogram: the shared quantized trig literals (the
    // same Scala-generated table the Spark plan embeds), milli
    // residuals, HUGEINT projections, one idiv back to count^2.
    "q342_periodogram" -> {
      val rows = ops.Events.periodogramTable
        .map { case (p, k, cq, sq) => s"($p, $k, $cq, $sq)" }
        .mkString(",\n             ")
      s"""WITH tb(p, k, cq, sq) AS (VALUES
             $rows),
         dd AS (SELECT CAST(ts AS DATE) AS dy, count(*) AS x
           FROM events GROUP BY 1),
         spn AS (SELECT min(dy) AS da, max(dy) AS db FROM dd),
         cal AS (SELECT CAST(unnest(generate_series(da, db,
             INTERVAL '1 day')) AS DATE) AS dy FROM spn),
         daily AS (SELECT cal.dy, coalesce(dd.x, 0) AS x
           FROM cal LEFT JOIN dd USING (dy)),
         base AS (SELECT min(dy) AS d0, count(*) AS nd,
             (1000 * sum(x)) // count(*) AS xbar FROM daily),
         rt AS (SELECT date_diff('day', b.d0, d.dy) AS t, b.nd,
             1000 * d.x - b.xbar AS r FROM daily d CROSS JOIN base b),
         sc AS (SELECT tb.p, max(rt.nd) AS n_days,
             sum(CAST(rt.r AS HUGEINT) * tb.cq) AS sc,
             sum(CAST(rt.r AS HUGEINT) * tb.sq) AS ss
           FROM rt JOIN tb ON tb.k = rt.t % tb.p GROUP BY 1),
         pw AS (SELECT p, n_days,
             (sc * sc + ss * ss) // 1000000000000000000::HUGEINT AS power_c2
           FROM sc)
         SELECT CAST(p AS BIGINT) AS period, CAST(n_days AS BIGINT) AS n_days,
           CAST(power_c2 AS BIGINT) AS power_c2,
           CAST(CASE WHEN row_number() OVER (ORDER BY power_c2 DESC, p ASC) = 1
                THEN 1 ELSE 0 END AS INT) AS is_peak
         FROM pw""" },

    // t-closeness: per-class variational distance to the global
    // sensitive distribution on the exact integer grid, the class x
    // value grid completed so absent values contribute global mass.
    "q340_t_closeness" ->
      """WITH cells AS (SELECT CAST(c_nationkey AS INT) AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_mktsegment AS sv, count(*) AS c
           FROM customer GROUP BY 1, 2, 3),
         cl AS (SELECT nation, bal_band, sum(c) AS n_c FROM cells GROUP BY 1, 2),
         gv AS (SELECT sv, sum(c) AS n_v FROM cells GROUP BY 1),
         tt AS (SELECT sum(c) AS n FROM cells),
         j AS (SELECT g.nation, g.bal_band, g.n_c, g.n_v,
             coalesce(c.c, 0) AS c_cv
           FROM (SELECT cl.*, gv.sv, gv.n_v FROM cl CROSS JOIN gv) g
           LEFT JOIN cells c ON c.nation = g.nation
             AND c.bal_band = g.bal_band AND c.sv = g.sv),
         d AS (SELECT j.nation, j.bal_band, max(j.n_c) AS n_c,
             sum(abs(CAST(j.c_cv AS HUGEINT) * t.n
               - CAST(j.n_v AS HUGEINT) * j.n_c)) AS dist
           FROM j CROSS JOIN tt t GROUP BY 1, 2)
         SELECT d.nation, d.bal_band, CAST(d.n_c AS BIGINT) AS n,
           CAST((10000 * d.dist) // (2 * CAST(d.n_c AS HUGEINT) * t.n)
             AS BIGINT) AS t_bp,
           CAST(CASE WHEN (10000 * d.dist)
             // (2 * CAST(d.n_c AS HUGEINT) * t.n) <= 2500
             THEN 1 ELSE 0 END AS INT) AS is_t_close
         FROM d CROSS JOIN tt t""",

    // Mann-Kendall: sign pairs over the day lattice, tie-corrected
    // 18*var as an exact integer, z with the +-1 continuity correction
    // in the pinned double order.
    "q341_mann_kendall" ->
      s"""WITH u AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
               o_orderdate) AS BIGINT) AS xv,
             sum(${C("o_totalprice")}) AS yv
           FROM orders GROUP BY o_orderdate),
         sp AS (SELECT coalesce(sum(CASE WHEN b.yv > a.yv THEN 1
                  WHEN b.yv < a.yv THEN -1 ELSE 0 END), 0) AS s
           FROM u a JOIN u b ON a.xv < b.xv),
         nn AS (SELECT count(*) AS n FROM u),
         tt AS (SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
                  AS tie_term
           FROM (SELECT count(*) AS t FROM u GROUP BY yv)),
         v AS (SELECT s, n,
             CAST(n AS HUGEINT) * (n - 1) * (2 * CAST(n AS HUGEINT) + 5)
               - tie_term AS var18
           FROM sp, nn, tt)
         SELECT CAST(n AS BIGINT) AS n_units, CAST(s AS BIGINT) AS s_stat,
           CAST(var18 AS BIGINT) AS var18,
           CAST(CASE WHEN var18 <= 0 THEN NULL
                WHEN s > 0 THEN floor((CAST(s AS DOUBLE) - 1)
                  / sqrt(CAST(var18 AS DOUBLE) / 18) * 1000 + 0.5)
                WHEN s < 0 THEN floor((CAST(s AS DOUBLE) + 1)
                  / sqrt(CAST(var18 AS DOUBLE) / 18) * 1000 + 0.5)
                ELSE 0 END AS BIGINT) AS z_milli,
           CAST(CASE WHEN var18 <= 0 THEN NULL
                WHEN abs(CASE WHEN s > 0 THEN floor((CAST(s AS DOUBLE) - 1)
                    / sqrt(CAST(var18 AS DOUBLE) / 18) * 1000 + 0.5)
                  WHEN s < 0 THEN floor((CAST(s AS DOUBLE) + 1)
                    / sqrt(CAST(var18 AS DOUBLE) / 18) * 1000 + 0.5)
                  ELSE 0 END) > 1960 THEN 1 ELSE 0 END AS INT) AS is_trending
         FROM v""",

    // Wasserstein-1 on the cent lattice: cumulative-gap area between
    // consecutive present bins, exact integers, one milli-cent idiv.
    "q345_wasserstein" ->
      s"""WITH pb AS (SELECT ${C("value")} AS bin,
             sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS n_cur
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         cm AS (SELECT bin,
             sum(n_ref) OVER (ORDER BY bin ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
             sum(n_cur) OVER (ORDER BY bin ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             lead(bin, 1) OVER (ORDER BY bin ASC) AS nxt
           FROM pb),
         t AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc,
             count(*) AS n_bins FROM pb),
         a AS (SELECT max(t.nr) AS n_ref, max(t.nc) AS n_cur,
             max(t.n_bins) AS n_bins,
             sum(abs(CAST(cm.cr AS HUGEINT) * t.nc
               - CAST(cm.cc AS HUGEINT) * t.nr)
               * CAST(cm.nxt - cm.bin AS HUGEINT)) AS area
           FROM cm CROSS JOIN t WHERE cm.nxt IS NOT NULL)
         SELECT CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           CAST(n_bins AS BIGINT) AS n_bins,
           CAST(CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
                ELSE (1000 * area)
                  // (CAST(n_ref AS HUGEINT) * n_cur) END AS BIGINT)
             AS w1_milli_cents
         FROM a""",

    // Frequent triples: C(m,3) combinations inside each sorted basket
    // array, support floor 2, top-20 by (count DESC, items ASC).
    "q335_freq_triples" ->
      """WITH b AS (SELECT l_orderkey AS bk,
             list_sort(list(DISTINCT l_partkey % 100)) AS arr
           FROM lineitem WHERE l_orderkey % 8 = 0 GROUP BY 1),
         tri AS (SELECT unnest(flatten(flatten(
             list_transform(range(1, len(arr) + 1), i ->
               list_transform(range(i + 1, len(arr) + 1), j ->
                 list_transform(range(j + 1, len(arr) + 1), k ->
                   [arr[i], arr[j], arr[k]])))))) AS t FROM b),
         cnt AS (SELECT t[1] AS item_a, t[2] AS item_b, t[3] AS item_c,
             CAST(count(*) AS BIGINT) AS n_baskets
           FROM tri GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         SELECT item_a, item_b, item_c, n_baskets FROM (
           SELECT *, row_number() OVER (ORDER BY n_baskets DESC,
             item_a ASC, item_b ASC, item_c ASC) AS rn FROM cnt)
         WHERE rn <= 20""",

    // SRM: knuth-hash 50/50 assignment over distinct users, exact
    // χ² = (2n_a − N)²/N in milli, df=1 α=0.05 critical 3.841.
    "q327_srm_check" ->
      """WITH au AS (SELECT DISTINCT user_id AS u FROM events
             WHERE user_id IS NOT NULL),
         ar AS (SELECT ((u % 1000003) * 427799) % 1000003 % 2 AS arm FROM au),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM ar)
         SELECT n_units, n_a, n_b,
           CAST(1000 * (2 * CAST(n_a AS HUGEINT) - n_units)
             * (2 * CAST(n_a AS HUGEINT) - n_units) // n_units AS BIGINT)
             AS chi2_milli,
           CAST(CASE WHEN 1000 * (2 * CAST(n_a AS HUGEINT) - n_units)
             * (2 * CAST(n_a AS HUGEINT) - n_units) // n_units > 3841
             THEN 1 ELSE 0 END AS INT) AS srm_flag
         FROM m""",

    // Fano factor over the zero-completed (type, day) grid: HUGEINT
    // moments, D_milli one truncating idiv, NULL on a silent group.
    "q314_dispersion" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
                count(*) AS x FROM events GROUP BY 1, 2),
         cal AS (SELECT DISTINCT day FROM d0),
         gs AS (SELECT DISTINCT g FROM d0),
         grid AS (SELECT gs.g, cal.day, coalesce(d0.x, 0) AS x
                  FROM gs CROSS JOIN cal LEFT JOIN d0 USING (g, day)),
         m AS (SELECT g, count(*) AS n_days, sum(x) AS n_events,
               sum(CAST(x AS HUGEINT) * x) AS sxx FROM grid GROUP BY 1)
         SELECT g AS event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(n_events AS BIGINT) AS n_events,
           CAST((1000 * n_events) // n_days AS BIGINT) AS mean_milli,
           CAST(CASE WHEN n_events = 0 THEN NULL
                ELSE (1000 * (CAST(n_days AS HUGEINT) * sxx
                  - CAST(n_events AS HUGEINT) * n_events))
                  // (CAST(n_days AS HUGEINT) * n_events)
                END AS BIGINT) AS dispersion_milli
         FROM m""",

    // Step-decay weights 2²⁰ >> age_weeks (exact integers both
    // engines), per-user sums, top-20 by (score desc, user asc).
    "q306_decay_score" ->
      """WITH a AS (SELECT max(CAST(ts AS DATE)) AS as_of FROM events),
         w AS (SELECT user_id,
                1048576 >> CAST(least(date_diff('day', CAST(ts AS DATE),
                  a.as_of) // 7, 40) AS INT) AS w
               FROM events, a),
         s AS (SELECT user_id, count(*) AS n_events, sum(w) AS score_q
               FROM w GROUP BY 1),
         r AS (SELECT *, row_number() OVER (ORDER BY score_q DESC,
                 user_id ASC) AS rank FROM s)
         SELECT CAST(rank AS BIGINT) AS rank, user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(score_q AS BIGINT) AS score_q
         FROM r WHERE rank <= 20""",

    // Weekly engagement bands: exact percentile_disc cuts per week +
    // a lag over the bounded week table for the WoW median delta.
    "q303_engagement_bands" ->
      """WITH w AS (SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
                user_id, count(*) AS n FROM events GROUP BY 1, 2),
         b AS (SELECT week, count(*) AS n_users, sum(n) AS n_events,
                CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p10,
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p50,
                CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p90
               FROM w GROUP BY 1)
         SELECT strftime(CAST(week AS DATE), '%Y-%m-%d') AS week,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_events AS BIGINT) AS n_events, p10, p50, p90,
           CAST(CASE WHEN date_diff('day',
                  lag(week) OVER (ORDER BY week ASC), week) = 7
                THEN p50 - lag(p50) OVER (ORDER BY week ASC)
                END AS BIGINT) AS p50_wow_delta
         FROM b""",

    // Per-user mean surprisal under the global transition model:
    // one micro-nat term per (from,to) cell, exact weighted sums,
    // top-20 by (mean desc, user asc).
    "q301_user_surprisal" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                event_id FROM events),
         tr0 AS (SELECT user_id, event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts_us ASC, event_id ASC) AS to_type FROM e),
         tr AS (SELECT user_id AS ent, from_type, to_type, count(*) AS u_n
               FROM tr0 WHERE to_type IS NOT NULL GROUP BY 1, 2, 3),
         c AS (SELECT from_type, to_type, sum(u_n) AS n FROM tr GROUP BY 1, 2),
         f AS (SELECT from_type, sum(n) AS nf FROM c GROUP BY 1),
         tm AS (SELECT c.from_type, c.to_type, CAST(floor(
                  -ln(CAST(c.n AS DOUBLE) / nf) * 1000000 + 0.5) AS BIGINT)
                  AS term
               FROM c JOIN f USING (from_type)),
         pu AS (SELECT ent, sum(u_n) AS n_transitions,
                sum(u_n * term) AS surprisal_unat
               FROM tr JOIN tm USING (from_type, to_type) GROUP BY 1),
         r AS (SELECT ent, n_transitions, surprisal_unat,
                surprisal_unat // n_transitions AS mean_surprisal_unat,
                row_number() OVER (ORDER BY surprisal_unat // n_transitions
                  DESC, ent ASC) AS rank FROM pu)
         SELECT CAST(rank AS BIGINT) AS rank, ent AS user_id,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST(surprisal_unat AS BIGINT) AS surprisal_unat,
           CAST(mean_surprisal_unat AS BIGINT) AS mean_surprisal_unat
         FROM r WHERE rank <= 20""",

    // One file per bucket by construction, so per-file stats equal
    // per-bucket stats: the oracle derives both layouts from the ids.
    "q304_file_audit" ->
      """WITH h AS (SELECT event_id % 8 AS b, count(*) AS n,
                min(event_id) AS mn, max(event_id) AS mx
              FROM events GROUP BY 1),
         hr AS (SELECT 'hash' AS layout,
                CAST(row_number() OVER (ORDER BY mn ASC) AS BIGINT) AS file_rank,
                CAST(n AS BIGINT) AS n_rows, mn AS min_key, mx AS max_key,
                coalesce(CAST(mn <= lag(mx) OVER (ORDER BY mn ASC) AS INT), 0)
                  AS overlaps_prev FROM h),
         r AS (SELECT event_id // 2000 AS b, count(*) AS n,
                min(event_id) AS mn, max(event_id) AS mx
              FROM events GROUP BY 1),
         rr AS (SELECT 'range' AS layout,
                CAST(row_number() OVER (ORDER BY mn ASC) AS BIGINT) AS file_rank,
                CAST(n AS BIGINT) AS n_rows, mn AS min_key, mx AS max_key,
                coalesce(CAST(mn <= lag(mx) OVER (ORDER BY mn ASC) AS INT), 0)
                  AS overlaps_prev FROM r)
         SELECT * FROM hr UNION ALL SELECT * FROM rr""",

    // The v1→v2 increment is exactly the odd-id append: the oracle
    // aggregates that half directly (file-level CDF exactness).
    "q299_incremental_read" ->
      s"""SELECT event_type, count(*) AS n_rows,
         CAST(sum(${C("value")}) AS BIGINT) AS sum_cents
         FROM events WHERE event_id % 2 = 1 GROUP BY 1""",

    "q150_event_paths" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type AS t1 FROM events),
         p AS (SELECT t1,
           lead(t1, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS t2,
           lead(t1, 2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS t3 FROM e),
         c AS (SELECT t1, t2, t3, count(*) AS n_paths FROM p
               WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3),
         r AS (SELECT t1, t2, t3, CAST(n_paths AS BIGINT) AS n_paths,
           CAST(row_number() OVER (ORDER BY n_paths DESC, t1, t2, t3) AS BIGINT) AS rn FROM c)
         SELECT * FROM r WHERE rn <= 20""",

    "q151_cusum" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events GROUP BY 1),
         t AS (SELECT sum(n_events) AS total, count(*) AS days FROM d),
         p AS (SELECT day, n_events, n_events * days - total AS dev, total FROM d CROSS JOIN t),
         s AS (SELECT day, n_events, total,
           sum(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pp FROM p),
         m AS (SELECT *, least(min(pp) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS runmin FROM s)
         SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n_events AS BIGINT) AS n_events,
           CAST(pp - runmin AS BIGINT) AS cusum,
           CAST(CASE WHEN pp - runmin > total THEN 1 ELSE 0 END AS BIGINT) AS alarm
         FROM m""",

    "q152_schema_drift" ->
      s"""WITH p AS (SELECT o_orderdate >= TIMESTAMP '1998-07-01' AS is_new,
           o_custkey, o_orderstatus, ${C("o_totalprice")} AS price_c FROM orders),
         a AS (SELECT
           count(*) FILTER (WHERE NOT is_new) AS rows_old,
           count(*) FILTER (WHERE is_new) AS rows_new,
           count(DISTINCT o_custkey) FILTER (WHERE NOT is_new) AS cust_old,
           count(DISTINCT o_custkey) FILTER (WHERE is_new) AS cust_new,
           count(DISTINCT o_orderstatus) FILTER (WHERE NOT is_new) AS stat_old,
           count(DISTINCT o_orderstatus) FILTER (WHERE is_new) AS stat_new,
           min(price_c) FILTER (WHERE NOT is_new) AS minp_old,
           min(price_c) FILTER (WHERE is_new) AS minp_new,
           max(price_c) FILTER (WHERE NOT is_new) AS maxp_old,
           max(price_c) FILTER (WHERE is_new) AS maxp_new,
           sum(price_c) FILTER (WHERE NOT is_new) AS sump_old,
           sum(price_c) FILTER (WHERE is_new) AS sump_new FROM p)
         SELECT metric, CAST(old_value AS BIGINT) AS old_value,
           CAST(new_value AS BIGINT) AS new_value,
           CAST(new_value - old_value AS BIGINT) AS delta FROM (
           SELECT 'n_rows' AS metric, rows_old AS old_value, rows_new AS new_value FROM a
           UNION ALL SELECT 'n_customers', cust_old, cust_new FROM a
           UNION ALL SELECT 'n_statuses', stat_old, stat_new FROM a
           UNION ALL SELECT 'min_price_c', minp_old, minp_new FROM a
           UNION ALL SELECT 'max_price_c', maxp_old, maxp_new FROM a
           UNION ALL SELECT 'sum_price_c', sump_old, sump_new FROM a)""",

    "q156_ewma" ->
      """WITH RECURSIVE d0 AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
             FROM events GROUP BY 1),
         d AS (SELECT day, CAST(n_events AS BIGINT) AS n_events,
             row_number() OVER (ORDER BY day) AS idx FROM d0),
         e(idx, day, n_events, ewma) AS (
           SELECT idx, day, n_events, n_events FROM d WHERE idx = 1
           UNION ALL
           SELECT d.idx, d.day, d.n_events, (e.ewma + d.n_events) // 2
           FROM d JOIN e ON d.idx = e.idx + 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_events,
           CAST(ewma AS BIGINT) AS ewma FROM e""",

    "q163_burstiness" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         l AS (SELECT user_id,
             ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS g
           FROM e),
         gg AS (SELECT user_id, CAST(g AS HUGEINT) AS g FROM l WHERE g IS NOT NULL),
         a AS (SELECT user_id, count(*) AS n_gaps, sum(g) AS s1, sum(g * g) AS s2
           FROM gg GROUP BY 1)
         SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(10000 * (n_gaps * s2 - s1 * s1) // (s1 * s1) AS BIGINT) AS cv2_bp
         FROM a WHERE n_gaps >= 2 AND s1 > 0""",

    "q164_centroid_outliers" ->
      """WITH ix AS (SELECT vec_id, label, embedding,
           unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
         dims AS (SELECT vec_id, label, i - 1 AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5) AS BIGINT) + 10000 AS vb
           FROM ix),
         cent AS (SELECT label, dim, sum(vb) // count(*) AS cb FROM dims GROUP BY 1, 2),
         d2 AS (SELECT d.label, d.vec_id, sum((vb - cb) * (vb - cb)) AS d2
           FROM dims d JOIN cent USING (label, dim) GROUP BY 1, 2),
         r AS (SELECT label, vec_id, d2,
           CAST(row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id ASC) AS BIGINT) AS rank
           FROM d2)
         SELECT label, rank, vec_id, CAST(d2 AS BIGINT) AS d2 FROM r WHERE rank <= 5""",

    "q165_copurchase_lift" ->
      """WITH di AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
         nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM di),
         ic AS (SELECT it, count(*) AS n_it FROM di GROUP BY 1),
         p AS (SELECT a.it AS part_a, b.it AS part_b, count(*) AS n_ab
           FROM di a JOIN di b ON a.bk = b.bk AND a.it < b.it
           GROUP BY 1, 2 HAVING count(*) >= 3),
         lf AS (SELECT part_a, part_b, n_ab,
             CAST(1000 * CAST(n_baskets AS HUGEINT) * n_ab
               // (CAST(n_a.n_it AS HUGEINT) * n_b.n_it) AS BIGINT) AS lift_milli
           FROM p JOIN ic n_a ON n_a.it = p.part_a
                  JOIN ic n_b ON n_b.it = p.part_b
                  CROSS JOIN nb)
         SELECT part_a, part_b, n_ab, lift_milli FROM lf
         ORDER BY lift_milli DESC, part_a ASC, part_b ASC LIMIT 20""",

    // Item-item CF: symmetric pair table, co-occurrence cosine with
    // one pinned double boundary, top-3 per item by (cos desc, id).
    "q305_item_cf" ->
      """WITH di AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
         ic AS (SELECT it, count(*) AS n_it FROM di GROUP BY 1),
         p AS (SELECT a.it AS part_a, b.it AS part_b, count(*) AS n_ab
           FROM di a JOIN di b ON a.bk = b.bk AND a.it < b.it
           GROUP BY 1, 2 HAVING count(*) >= 3),
         sym AS (SELECT part_a, part_b, n_ab FROM p
           UNION ALL SELECT part_b, part_a, n_ab FROM p),
         sc AS (SELECT s.part_a AS part, s.part_b AS neighbor, s.n_ab,
             CAST(floor(10000 * CAST(s.n_ab AS DOUBLE)
               / (sqrt(CAST(na.n_it AS DOUBLE)) * sqrt(CAST(nb.n_it AS DOUBLE)))
               + 0.5) AS BIGINT) AS cos_bp
           FROM sym s JOIN ic na ON na.it = s.part_a
                      JOIN ic nb ON nb.it = s.part_b),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY part
                 ORDER BY cos_bp DESC, neighbor ASC) AS BIGINT) AS rank
               FROM sc)
         SELECT part, rank, neighbor, n_ab, cos_bp FROM r WHERE rank <= 3""",

    "q160_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         ix AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i FROM w),
         b AS (SELECT doc_id, words[i] AS w1, words[i + 1] AS w2 FROM ix),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
         c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(floor(sum(CAST(floor((-ln(c2 / CAST(c1 AS DOUBLE))) * 10000 + 0.5) AS BIGINT))
             / count(*)) AS BIGINT) AS mean_surprisal_bp
         FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         GROUP BY 1""",

    "q161_keywords" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         nn AS (SELECT count(*) AS n_docs FROM documents),
         w AS (SELECT doc_id, tok,
             CAST(floor((tf * ln(n_docs / CAST(df AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS wm
           FROM tf JOIN dfx USING (tok) CROSS JOIN nn),
         r AS (SELECT doc_id, tok, wm,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wm DESC, tok ASC) AS BIGINT) AS rank
           FROM w WHERE wm <> 0)
         SELECT doc_id, rank, tok, wm FROM r WHERE rank <= 3""",

    // The persisted-store range query: per-day rows recomputed from the
    // raws (the store holds exactly these), RANGE row = sum of per-day
    // exacts (the store cannot recover cross-day distincts — documented
    // upper bound) + the merged-sketch estimate, which equals the
    // global k-minimum set of the range (any overall k-smallest hash is
    // a fortiori in its own day's k minima).
    "q175_kmv_store" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events
                    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'),
         d AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM e GROUP BY day),
         hh AS (SELECT DISTINCT day, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM hh),
         sk AS (SELECT day, count(*) AS n_in, max(CASE WHEN rn = 256 THEN h END) AS vk
                FROM rk WHERE rn <= 256 GROUP BY day),
         pd AS (SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_exact,
                CASE WHEN sk.n_in < 256 THEN sk.n_in
                     ELSE CAST(255 * 18446744073709551616::HUGEINT // vk AS BIGINT) END AS n_est
                FROM d JOIN sk USING (day)),
         gu AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n_exact FROM d),
         gh AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gh),
         gs AS (SELECT count(*) AS n_in, max(CASE WHEN rn = 256 THEN h END) AS vk FROM gr WHERE rn <= 256)
         SELECT day, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_est AS BIGINT) AS n_est,
                1 AS is_exact FROM pd
         UNION ALL
         SELECT 'RANGE' AS day, gu.n_exact,
           CAST(CASE WHEN gs.n_in < 256 THEN gs.n_in
                ELSE CAST(255 * 18446744073709551616::HUGEINT // gs.vk AS BIGINT) END AS BIGINT) AS n_est,
           0 AS is_exact
         FROM gu, gs""",

    // md5-register HLL replayed register-for-register (r11; the last
    // rows-only entry closed): register = h % 1024 (low bits agree
    // with Spark's signed &), rho = 55 − bit_count(smear(h // 1024)),
    // per-register MAX, harmonic sum as exact HUGEINT Σ 2^(55−M_j)
    // (+ 2^55 per empty register), one double division for the raw
    // estimate, and the same linear-counting branch on identical
    // doubles. The ALL row merges REGISTERS (elementwise max), exactly
    // as the Spark side merges the stored sketches.
    "q159_hll_uniques" -> {
      val m = 1024; val rhoMax = 55; val pow2top = 1L << rhoMax
      val alpha = s"(0.7213 / (1.0 + 1.079 / $m.0))"
      def estCtes(pre: String, src: String) =
        s"""${pre}1 AS (SELECT day, sum(CAST(1::BIGINT << ($rhoMax - mx) AS HUGEINT)) AS sp,
                count(*) AS cnt FROM $src GROUP BY day),
         ${pre}2 AS (SELECT day, sp + ($m - cnt)::HUGEINT * $pow2top::HUGEINT AS s2,
                $m - cnt AS v FROM ${pre}1),
         ${pre}3 AS (SELECT day, $alpha * $m.0 * $m.0 * $pow2top.0 / CAST(s2 AS DOUBLE) AS raw, v FROM ${pre}2),
         ${pre}4 AS (SELECT day, CAST(floor(
                CASE WHEN raw <= ${2.5 * m} AND v > 0
                     THEN $m.0 * ln($m.0 / CAST(v AS DOUBLE)) ELSE raw END + 0.5) AS BIGINT) AS n_est
                FROM ${pre}3)"""
      s"""WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         hh AS (SELECT day, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         w0 AS (SELECT day, CAST(h % $m AS BIGINT) AS reg, CAST(h // $m AS BIGINT) AS w FROM hh),
         w1 AS (SELECT day, reg, w | (w >> 1) AS w FROM w0),
         w2 AS (SELECT day, reg, w | (w >> 2) AS w FROM w1),
         w3 AS (SELECT day, reg, w | (w >> 4) AS w FROM w2),
         w4 AS (SELECT day, reg, w | (w >> 8) AS w FROM w3),
         w5 AS (SELECT day, reg, w | (w >> 16) AS w FROM w4),
         w6 AS (SELECT day, reg, w | (w >> 32) AS w FROM w5),
         mx AS (SELECT day, reg, max($rhoMax - bit_count(w)) AS mx FROM w6 GROUP BY 1, 2),
         ${estCtes("pe", "mx")},
         d AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM e GROUP BY day),
         pd AS (SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_exact, pe4.n_est
                FROM d JOIN pe4 USING (day)),
         gm AS (SELECT 'ALL' AS day, reg, max(mx) AS mx FROM mx GROUP BY 1, 2),
         ${estCtes("ge", "gm")},
         ga AS (SELECT count(DISTINCT user_id) AS n_exact FROM e)
         SELECT day, CAST(n_exact AS BIGINT) AS n_exact, n_est FROM pd
         UNION ALL
         SELECT 'ALL' AS day, CAST(ga.n_exact AS BIGINT) AS n_exact, ge4.n_est
         FROM ga, ge4"""
    },

    // Theta-cut retention replayed slot-for-slot: per-day k-minimum
    // hash sets, consecutive-day union's first k slots flagged by
    // membership side, every Venn region scaled by the HUGEINT union
    // estimate over keff; exact audit via per-(pair, user) membership.
    "q249_kmv_retention" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         dd AS (SELECT DISTINCT day, user_id FROM e),
         hh AS (SELECT DISTINCT day, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM hh),
         sk AS (SELECT day, h FROM rk WHERE rn <= 256),
         d2 AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM e GROUP BY day),
         days AS (SELECT DISTINCT day FROM e),
         prs AS (SELECT a.day AS day_a, b.day AS day_b
                 FROM days a JOIN days b ON b.day = a.day + 1),
         uu AS (SELECT p.day_a, s.h,
                max(CASE WHEN s.day = p.day_a THEN 1 ELSE 0 END) AS in_a,
                max(CASE WHEN s.day = p.day_b THEN 1 ELSE 0 END) AS in_b
                FROM prs p JOIN sk s ON s.day IN (p.day_a, p.day_b) GROUP BY 1, 2),
         ur AS (SELECT day_a, h, in_a, in_b,
                row_number() OVER (PARTITION BY day_a ORDER BY h) AS rn FROM uu),
         us AS (SELECT day_a, count(*) AS keff,
                sum(in_a * in_b) AS c_both,
                sum(in_a * (1 - in_b)) AS c_a_only,
                sum((1 - in_a) * in_b) AS c_b_only,
                max(CASE WHEN rn = 256 THEN h END) AS vk
                FROM ur WHERE rn <= 256 GROUP BY 1),
         ue AS (SELECT day_a, keff, c_both, c_a_only, c_b_only,
                CASE WHEN keff < 256 THEN keff::HUGEINT
                     ELSE 255 * 18446744073709551616::HUGEINT // vk END AS n_union_est
                FROM us),
         ab AS (SELECT p.day_a, dd.user_id,
                max(CASE WHEN dd.day = p.day_a THEN 1 ELSE 0 END) AS in_a,
                max(CASE WHEN dd.day = p.day_b THEN 1 ELSE 0 END) AS in_b
                FROM prs p JOIN dd ON dd.day IN (p.day_a, p.day_b) GROUP BY 1, 2),
         exs AS (SELECT day_a, sum(in_a * in_b) AS retained_exact,
                 sum(in_a * (1 - in_b)) AS churned_exact,
                 sum((1 - in_a) * in_b) AS new_exact FROM ab GROUP BY 1)
         SELECT strftime(p.day_a, '%Y-%m-%d') AS day,
           CAST(da.n_exact AS BIGINT) AS n_a_exact,
           CAST(db.n_exact AS BIGINT) AS n_b_exact,
           CAST(exs.retained_exact AS BIGINT) AS retained_exact,
           CAST(exs.churned_exact AS BIGINT) AS churned_exact,
           CAST(exs.new_exact AS BIGINT) AS new_exact,
           CAST(ue.n_union_est AS BIGINT) AS n_union_est,
           CAST(ue.c_both::HUGEINT * ue.n_union_est // ue.keff AS BIGINT) AS retained_est,
           CAST(ue.c_a_only::HUGEINT * ue.n_union_est // ue.keff AS BIGINT) AS churned_est,
           CAST(ue.c_b_only::HUGEINT * ue.n_union_est // ue.keff AS BIGINT) AS new_est
         FROM prs p
         JOIN d2 da ON da.day = p.day_a
         JOIN d2 db ON db.day = p.day_b
         JOIN ue ON ue.day_a = p.day_a
         JOIN exs ON exs.day_a = p.day_a""",

    // Recomputes the KMV store EXACTLY: the k smallest DISTINCT
    // md5_number_upper values per day (unsigned order = UBIGINT order)
    // and the (k-1)*2^64 // v_k estimate in HUGEINT — sketch contents
    // and estimates are engine-independent by construction, unlike HLL
    // (q159). The ALL row merges per-day sketches on the Spark side and
    // equals the global k-minimum set the oracle computes directly.
    "q174_kmv_uniques" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         d AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM e GROUP BY day),
         hh AS (SELECT DISTINCT day, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM hh),
         sk AS (SELECT day, count(*) AS n_in, max(CASE WHEN rn = 256 THEN h END) AS vk
                FROM rk WHERE rn <= 256 GROUP BY day),
         pd AS (SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_exact,
                CASE WHEN sk.n_in < 256 THEN sk.n_in
                     ELSE CAST(255 * 18446744073709551616::HUGEINT // vk AS BIGINT) END AS n_est
                FROM d JOIN sk USING (day)),
         ga AS (SELECT count(DISTINCT user_id) AS n_exact FROM e),
         gh AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gh),
         gs AS (SELECT count(*) AS n_in, max(CASE WHEN rn = 256 THEN h END) AS vk FROM gr WHERE rn <= 256)
         SELECT day, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_est AS BIGINT) AS n_est FROM pd
         UNION ALL
         SELECT 'ALL' AS day, CAST(ga.n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN gs.n_in < 256 THEN gs.n_in
                ELSE CAST(255 * 18446744073709551616::HUGEINT // gs.vk AS BIGINT) END AS BIGINT) AS n_est
         FROM ga, gs""",

    // Chains the q172 domain extraction with the q41 quality formula
    // and the quota window — same tie order on (quality DESC, doc_id).
    "q173_domain_quota" ->
      s"""WITH ${UrlCte},
         d AS (SELECT doc_id, regexp_extract(
             regexp_replace(lower(regexp_extract(url, '^https?://([^/?]+)', 1)), ':(443|80)$$', ''),
             '([^.]+\\.[^.]+)$$', 1) AS domain FROM u),
         q AS (SELECT doc_id,
           ${BP("0.5 * least(nt / 100.0, 1.0) + 0.3 * (1.0 - nstop / nt) + 0.2 * least(((nchars - (nt - 1)) / nt) / 8.0, 1.0)")} AS quality_bp
           FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS nstop,
                 CAST(length(text) AS DOUBLE) AS nchars FROM documents)),
         r AS (SELECT d.domain, q.doc_id, q.quality_bp,
               row_number() OVER (PARTITION BY d.domain ORDER BY q.quality_bp DESC, q.doc_id ASC) AS rank
               FROM d JOIN q USING (doc_id))
         SELECT domain, CAST(rank AS BIGINT) AS rank, doc_id, quality_bp FROM r WHERE rank <= 5""",

    // Mirrors urlTable's deterministic construction literally, then
    // canonicalizes with the same regexes (Java and RE2 agree on these
    // patterns) and the same filter+sort list pipeline.
    "q172_url_normalize" ->
      s"""WITH ${UrlCte},
         n AS (SELECT doc_id,
           regexp_replace(lower(regexp_extract(url, '^https?://([^/?]+)', 1)), ':(443|80)$$', '') AS host,
           regexp_replace(regexp_extract(url, '^https?://[^/?]+([^?]*)', 1), '/+$$', '') AS p0,
           regexp_extract(url, '\\?(.*)$$', 1) AS q FROM u),
         l AS (SELECT doc_id, host, CASE WHEN p0 = '' THEN '/' ELSE p0 END AS pth,
           list_filter(string_split(q, '&'), x -> x <> '') AS ne FROM n),
         k AS (SELECT doc_id, host, pth, ne,
           list_sort(list_filter(ne, x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|ref)='))) AS keep FROM l)
         SELECT doc_id,
           'https://' || host || pth ||
             CASE WHEN len(keep) = 0 THEN '' ELSE '?' || array_to_string(keep, '&') END AS canon_url,
           regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
           CAST(len(ne) - len(keep) AS BIGINT) AS n_stripped
         FROM k""",

    // The FMM segmentation of the two CONSTANT snippets under the
    // built-in lexicon is itself a constant, so the oracle concatenates
    // the whitespace-split ASCII prefix (empty tokens dropped, matching
    // the flatten-of-empty-arrays on the Spark side) with the known
    // segment lists — pinning greedy-longest-match behavior end to end.
    "q171_dict_segment" ->
      """WITH b AS (SELECT doc_id,
           list_filter(string_split(substr(text, 1, 60), ' '), t -> t <> '') AS pre FROM documents),
         t AS (SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN list_concat(pre, ['你好','世界','今天','天氣','很','好'])
             WHEN 1 THEN list_concat(pre, ['สวัสดี','ชาวโลก','วันนี้'])
             ELSE pre END AS toks,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 6 WHEN 1 THEN 3 ELSE 0 END AS n_seg
           FROM b)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(n_seg AS BIGINT) AS n_seg,
           md5(coalesce(array_to_string(toks, '|'), '')) AS tok_md5
         FROM t""",

    "q169_cjk_tokens" ->
      // RE2 script classes (\p{Han}) mirror the Java spellings
      // (\p{IsHan}) in Cols.tokens — same Unicode script property.
      """WITH m AS (SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN substr(text, 1, 60) || ' 你好世界今天天氣很好'
             WHEN 1 THEN substr(text, 1, 60) || ' สวัสดีชาวโลกวันนี้'
             ELSE substr(text, 1, 60) END AS t FROM documents),
         seg AS (SELECT doc_id,
           CASE WHEN regexp_matches(t, '[\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}]')
             THEN trim(regexp_replace(regexp_replace(t,
               '([\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}])', ' \1 ', 'g'),
               ' {2,}', ' ', 'g'))
             ELSE t END AS s FROM m),
         tk AS (SELECT doc_id, string_split(s, ' ') AS toks FROM seg)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x ->
             regexp_matches(x, '[\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}]'))) AS BIGINT) AS n_seg,
           md5(array_to_string(toks, '|')) AS tok_md5
         FROM tk""",

    "q162_knn_classify" ->
      """WITH s AS (SELECT q.vec_id AS query_id, q.label AS true_label, e.vec_id AS neighbor_id,
           e.label AS nbr_label,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
           FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s),
         v AS (SELECT query_id, true_label, nbr_label, count(*) AS n_votes
           FROM r WHERE rank <= 10 GROUP BY 1, 2, 3),
         p AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, nbr_label ASC) AS rk FROM v)
         SELECT query_id, true_label, nbr_label AS pred_label, n_votes,
           CAST(CASE WHEN nbr_label = true_label THEN 1 ELSE 0 END AS BIGINT) AS agree
         FROM p WHERE rk = 1""",

    "q157_negative_sample" ->
      """WITH nn AS (SELECT count(*) AS n FROM embeddings),
         s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
           FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         r AS (SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s),
         top AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 10),
         slots AS (SELECT vec_id AS query_id, unnest(generate_series(0, 14)) AS slot
                   FROM embeddings WHERE vec_id < 10),
         cand AS (SELECT query_id, CAST(slot AS BIGINT) AS slot,
             CAST((CAST(query_id AS HUGEINT) * 31 + slot) * 815781
               % 2305843009213693951 % n AS BIGINT) AS cand
           FROM slots CROSS JOIN nn),
         ok AS (SELECT c.query_id, c.cand, min(c.slot) AS slot
           FROM cand c LEFT JOIN top t
             ON t.query_id = c.query_id AND t.neighbor_id = c.cand
           WHERE t.neighbor_id IS NULL AND c.cand <> c.query_id
           GROUP BY 1, 2),
         rk AS (SELECT query_id, cand AS neg_id,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY slot) AS BIGINT) AS rank
           FROM ok)
         SELECT query_id, rank, neg_id FROM rk WHERE rank <= 5""",

    "q158_length_batches" ->
      """WITH tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents),
         thr AS (SELECT
           CAST(percentile_disc(0.125) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t1,
           CAST(percentile_disc(0.25)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t2,
           CAST(percentile_disc(0.375) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t3,
           CAST(percentile_disc(0.5)   WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t4,
           CAST(percentile_disc(0.625) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t5,
           CAST(percentile_disc(0.75)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t6,
           CAST(percentile_disc(0.875) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t7
           FROM tk),
         b AS (SELECT doc_id, n_tokens,
             1 + (CASE WHEN n_tokens > t1 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t2 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t3 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t4 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t5 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t6 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t7 THEN 1 ELSE 0 END) AS bucket,
             doc_id % 8 AS shard
           FROM tk CROSS JOIN thr),
         r AS (SELECT *, row_number() OVER (PARTITION BY bucket, shard
             ORDER BY n_tokens, doc_id) AS rn FROM b)
         SELECT doc_id, n_tokens, CAST(bucket AS BIGINT) AS bucket,
           CAST(shard AS BIGINT) AS shard,
           CAST((rn - 1) // 4 AS BIGINT) AS batch_idx FROM r""",

    // Batch side = the q158 CTEs rolled up per batch then per bucket;
    // pack side = the q246 ceil-division arithmetic; waste in bp of
    // the padded stream via truncating division.
    "q252_pad_waste" ->
      """WITH tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents),
         thr AS (SELECT
           CAST(percentile_disc(0.125) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t1,
           CAST(percentile_disc(0.25)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t2,
           CAST(percentile_disc(0.375) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t3,
           CAST(percentile_disc(0.5)   WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t4,
           CAST(percentile_disc(0.625) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t5,
           CAST(percentile_disc(0.75)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t6,
           CAST(percentile_disc(0.875) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS t7
           FROM tk),
         b AS (SELECT doc_id, n_tokens,
             1 + (CASE WHEN n_tokens > t1 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t2 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t3 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t4 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t5 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t6 THEN 1 ELSE 0 END)
               + (CASE WHEN n_tokens > t7 THEN 1 ELSE 0 END) AS bucket,
             doc_id % 8 AS shard
           FROM tk CROSS JOIN thr),
         r AS (SELECT *, row_number() OVER (PARTITION BY bucket, shard
             ORDER BY n_tokens, doc_id) AS rn FROM b),
         pb AS (SELECT bucket, shard, (rn - 1) // 4 AS batch_idx,
                count(*) AS n_docs, max(n_tokens) AS mx, sum(n_tokens) AS sm
                FROM r GROUP BY 1, 2, 3),
         br AS (SELECT bucket, count(*) AS n_units, sum(sm) AS tokens_real,
                sum(n_docs * mx - sm) AS tokens_pad FROM pb GROUP BY 1),
         pk AS (SELECT doc_id % 16 AS pb, sum(n_tokens) AS t_b FROM tk GROUP BY 1),
         pr AS (SELECT sum((t_b + 511) // 512) AS n_units, sum(t_b) AS tokens_real,
                sum(((t_b + 511) // 512) * 512 - t_b) AS tokens_pad FROM pk)
         SELECT 'batch' AS strategy, CAST(bucket AS BIGINT) AS bucket,
           CAST(n_units AS BIGINT) AS n_units, CAST(tokens_real AS BIGINT) AS tokens_real,
           CAST(tokens_pad AS BIGINT) AS tokens_pad,
           CAST(10000 * tokens_pad // (tokens_real + tokens_pad) AS BIGINT) AS waste_bp
         FROM br
         UNION ALL
         SELECT 'pack', -1, CAST(n_units AS BIGINT), CAST(tokens_real AS BIGINT),
           CAST(tokens_pad AS BIGINT),
           CAST(10000 * tokens_pad // (tokens_real + tokens_pad) AS BIGINT)
         FROM pr""",

    "q153_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         ix AS (SELECT doc_id, words,
           unnest(generate_series(0, greatest(CAST(ceil(len(words) / 5.0) AS BIGINT), 1) - 1)) AS pass_idx
           FROM w),
         p AS (SELECT doc_id, pass_idx,
           array_to_string(words[(pass_idx * 5 + 1):(pass_idx * 5 + 5)], ' ') AS passage
           FROM ix),
         b AS (SELECT passage FROM
           (SELECT passage, count(DISTINCT doc_id) AS nd FROM p GROUP BY 1) WHERE nd >= 2),
         m AS (SELECT p.doc_id, p.pass_idx, p.passage,
           b.passage IS NOT NULL AS boiler FROM p LEFT JOIN b USING (passage))
         SELECT doc_id, count(*) AS n_passages,
           CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           md5(coalesce(string_agg(passage, ' ' ORDER BY pass_idx)
             FILTER (WHERE NOT boiler), '')) AS clean_md5
         FROM m GROUP BY 1""",

    "q154_oov_rate" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk WHERE len(tok) > 0 GROUP BY 1, 2),
         v AS (SELECT tok FROM (SELECT tok, sum(tf) AS cnt,
             row_number() OVER (ORDER BY sum(tf) DESC, tok ASC) AS rk
           FROM tf GROUP BY tok) WHERE rk <= 25)
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN v.tok IS NULL THEN tf ELSE 0 END) * 10000
             // CAST(sum(tf) AS BIGINT) AS BIGINT) AS oov_bp
         FROM tf LEFT JOIN v ON tf.tok = v.tok GROUP BY 1""",

    "q155_ann_filtered" ->
      s"""WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
           FROM embeddings q JOIN embeddings e
             ON e.vec_id <> q.vec_id AND e.label = q.label
           WHERE q.vec_id < 10),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
         SELECT query_id, rank, neighbor_id, ${BP("cos")} AS cos_bp FROM r WHERE rank <= 10""",

    // Incremental dedup: store = even ids, batch = odd ids; every true
    // pair except even-even must surface (LSH misses are ~2e-11 at
    // these similarity levels, as for q52).
    "q88_dedup_incremental" ->
      (jaccardOracle + " AND (ida % 2 = 1 OR idb % 2 = 1)"),

    // q373: q88's incremental pair set after GDPR-erasing every
    // doc_id % 4 == 0 from the store — erased ids cannot appear on
    // either side (odd ids are never % 4 == 0, so the extra predicate
    // only removes erased STORE docs).
    "q373_sig_erase" ->
      (jaccardOracle + " AND (ida % 2 = 1 OR idb % 2 = 1)" +
        " AND ida % 4 <> 0 AND idb % 4 <> 0"),

    "q89_dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT ida AS doc_a, idb AS doc_b, CAST(common AS BIGINT) AS n_common,
         ${BP("common / CAST(least(na.n, nb.n) AS DOUBLE)")} AS containment_bp
         FROM pair JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
         WHERE common / CAST(least(na.n, nb.n) AS DOUBLE) >= 0.8""",

    "q94_semantic_search" ->
      s"""WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
           FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
         SELECT query_id, rank, neighbor_id, ${BP("cos")} AS cos_bp, d.lang, d.source
         FROM r JOIN documents d ON d.doc_id = r.neighbor_id WHERE rank <= 5""",

    "q93_corr_stats" ->
      s"""SELECT l_returnflag,
         ${C("covar_samp(l_quantity, l_extendedprice)")} AS covar_c,
         ${BP("corr(l_quantity, l_extendedprice)")} AS corr_bp,
         ${C("regr_slope(l_extendedprice, l_quantity)")} AS slope_c,
         ${C("regr_intercept(l_extendedprice, l_quantity)")} AS intercept_c,
         CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
         FROM lineitem GROUP BY 1""",

    "q92_range_frame" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c FROM orders)
         SELECT o_orderkey, o_orderpriority, price_c,
           count(*) OVER wr AS n_within_100,
           CAST(sum(price_c) OVER wr AS BIGINT) AS sum_within_100,
           first_value(o_orderkey) OVER wo AS cheapest_key,
           nth_value(o_orderkey, 2) OVER wo AS second_key
         FROM t
         WINDOW wr AS (PARTITION BY o_orderpriority ORDER BY price_c
                       RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW),
                wo AS (PARTITION BY o_orderpriority
                       ORDER BY price_c ASC, o_orderkey ASC)""",

    "q90_unigram_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
         tt AS (SELECT count(*) AS total FROM tk)
         SELECT doc_id, count(*) AS n_tokens,
         CAST(floor(sum(${BP("-ln(cnt / CAST(total AS DOUBLE))")}) / count(*)) AS BIGINT) AS mean_surprisal_bp
         FROM tk JOIN f USING (tok) CROSS JOIN tt
         GROUP BY 1""",
    "q107_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.acctbal_c
         FROM nation n, LATERAL (
           SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
           FROM customer WHERE c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) t""",

    "q108_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
         ss AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
         sess AS (SELECT user_id, session_idx, min(ts_us) AS s0, max(ts_us) AS s1 FROM ss GROUP BY 1, 2)
         SELECT b * 3600 AS bucket_ts, count(*) AS n_active
         FROM (SELECT unnest(generate_series(s0 // 3600000000, s1 // 3600000000)) AS b FROM sess)
         GROUP BY 1""",

    "q109_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         a AS (SELECT *,
           sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) OVER w AS n_touches,
           min(CASE WHEN event_type IN ('view','click') THEN ts_us END) OVER w AS first_touch_us,
           max(CASE WHEN event_type IN ('view','click') THEN ts_us END) OVER w AS last_touch_us
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, ts_us, CAST(n_touches AS BIGINT) AS n_touches,
           first_touch_us, last_touch_us
         FROM a WHERE event_type = 'purchase'""",

    "q110_token_entropy" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 10000 + 0.5)
             - (CAST(sum(CAST(floor((c * ln(CAST(c AS DOUBLE))) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                // CAST(sum(c) AS BIGINT)) AS BIGINT) AS entropy_bp
         FROM c GROUP BY 1""",

    "q111_nfc_normalize" ->
      """SELECT doc_id,
           md5(nfc_normalize(substring(text, 1, 24) || 'e' || chr(769))) AS nfc_md5,
           length(nfc_normalize(substring(text, 1, 24) || 'e' || chr(769))) AS nfc_len,
           length(substring(text, 1, 24) || 'e' || chr(769)) AS raw_len
         FROM documents""",

    "q112_name_dedup" ->
      """WITH p AS (SELECT p_partkey, p_name, p_brand FROM part),
         pr AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                  levenshtein(a.p_name, b.p_name) AS lev
                FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
                  AND abs(length(a.p_name) - length(b.p_name)) <= 2
                  AND a.p_name <> b.p_name)
         SELECT name_a, name_b, CAST(lev AS BIGINT) AS lev, count(*) AS n_pairs
         FROM pr WHERE lev BETWEEN 1 AND 2 GROUP BY 1, 2, 3""",

    "q113_sparse_cosine" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         nn AS (SELECT count(*) AS n_docs FROM documents),
         w AS (SELECT doc_id, tok,
                 CAST(floor((tf * ln(n_docs / CAST(df AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS wm
               FROM tf JOIN dfx USING (tok) CROSS JOIN nn),
         nrm AS (SELECT doc_id, CAST(sum(wm * wm) AS BIGINT) AS m2 FROM w GROUP BY 1),
         dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    CAST(sum(a.wm * b.wm) AS BIGINT) AS dot
                  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           CAST(floor((dot / (sqrt(na.m2) * sqrt(nb.m2))) * 10000 + 0.5) AS BIGINT) AS cos_bp
         FROM dots JOIN nrm na ON na.doc_id = doc_a JOIN nrm nb ON nb.doc_id = doc_b
         WHERE dot / (sqrt(na.m2) * sqrt(nb.m2)) >= 0.8""",

    // q52's LSH candidates at these similarity levels recover the exact
    // pair set (miss prob ~2e-11 per 0.97-similar pair), so the verified
    // output is graded against the same exact-Jaccard oracle.
    "q52_dedup_minhash_lsh" -> jaccardOracle,

    "q54_dedup_embedding" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         ${BP("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} AS cos_bp
         FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35""",

    "q60_ann_bruteforce" -> q60OracleSql,

    // SemDeDup τ sweep: one intra-cell pair pass to per-vector maxima,
    // bounded cuts per τ — the unrolled Lloyd trainer underneath.
    "q311_semdedup_sweep" ->
      AnnOracleSql.semDedupSweepSql(16, graft.ops.Similarity.SemTauSweep),

    // PQ distortion: min integer L2 to the unrolled per-subspace
    // codebook, grid norms, (m+1)-row report with the ALL fold.
    "q312_pq_distortion" -> AnnOracleSql.pqDistortionSql,

    // LSH recall-vs-tables: candidates keep their first colliding
    // table, sweep points prefix-filter; recall vs the q60 truth.
    "q310_lsh_tables_curve" ->
      s"""WITH truth AS ($q60OracleSql),
         approx AS (${AnnOracleSql.lshSweepSql(
           graft.ops.Similarity.LshTableSweep)}),
         pts AS (SELECT unnest([${graft.ops.Similarity.LshTableSweep
           .mkString(", ")}]) AS n_tables),
         j AS (SELECT p.n_tables, t.query_id, t.neighbor_id,
                CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
               FROM truth t CROSS JOIN pts p
               LEFT JOIN approx a ON a.n_tables = p.n_tables
                 AND a.query_id = t.query_id
                 AND a.neighbor_id = t.neighbor_id)
         SELECT CAST(n_tables AS BIGINT) AS n_tables,
           count(DISTINCT query_id) AS n_queries, count(*) AS n_truth,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           CAST((10000 * sum(hit)) // count(*) AS BIGINT) AS recall_bp
         FROM j GROUP BY 1""",

    // IVF recall-vs-nprobe: the sweep leg scores once at max probes
    // and prefix-slices (AnnOracleSql.ivfSweepSql mirrors
    // ivfProbeCurve); recall joins against the shared q60 truth.
    "q302_nprobe_curve" ->
      s"""WITH truth AS ($q60OracleSql),
         approx AS (${AnnOracleSql.ivfSweepSql(
           graft.ops.Similarity.IvfCells, graft.ops.Similarity.ProbeSweep,
           graft.ops.Similarity.TopK, graft.ops.Similarity.NumQueries)}),
         pts AS (SELECT unnest([${graft.ops.Similarity.ProbeSweep
           .mkString(", ")}]) AS nprobe),
         j AS (SELECT p.nprobe, t.query_id, t.neighbor_id,
                CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
               FROM truth t CROSS JOIN pts p
               LEFT JOIN approx a ON a.nprobe = p.nprobe
                 AND a.query_id = t.query_id
                 AND a.neighbor_id = t.neighbor_id)
         SELECT CAST(nprobe AS BIGINT) AS nprobe,
           count(DISTINCT query_id) AS n_queries, count(*) AS n_truth,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           CAST((10000 * sum(hit)) // count(*) AS BIGINT) AS recall_bp
         FROM j GROUP BY 1""",

    // JL sign projection replayed exactly: ±1 from md5_number_upper
    // low bit (the Md5Hash64 mirror), quantizer-grid integer sums,
    // q60's list_cosine_similarity + BP for the original space, one
    // pinned double boundary for the projected cosine.
    "q293_jl_distortion" ->
      s"""WITH sg AS (SELECT i, j,
                CASE WHEN md5_number_upper('jl:' || CAST(i AS VARCHAR)
                  || '#' || CAST(j AS VARCHAR)) % 2 = 0
                THEN 1 ELSE -1 END AS s
              FROM (SELECT unnest(range(0, 64)) AS i),
                   (SELECT unnest(range(0, 16)) AS j)),
         ex AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 16384)
                  AS BIGINT) AS xq FROM embeddings),
         pj AS MATERIALIZED (SELECT ex.vec_id, sg.j, sum(sg.s * ex.xq) AS yq
               FROM ex JOIN sg USING (i) GROUP BY 1, 2),
         pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                ${BP("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} AS cos_orig_bp
               FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
               WHERE a.vec_id % 8 = 0),
         dp AS (SELECT pr.vec_a, pr.vec_b,
                sum(pa.yq * pb.yq) AS dab,
                sum(pa.yq * pa.yq) AS daa,
                sum(pb.yq * pb.yq) AS dbb
               FROM pr JOIN pj pa ON pa.vec_id = pr.vec_a
                 JOIN pj pb ON pb.vec_id = pr.vec_b AND pb.j = pa.j
               GROUP BY 1, 2),
         f AS (SELECT pr.vec_a, pr.vec_b, pr.cos_orig_bp,
                CASE WHEN dp.daa = 0 OR dp.dbb = 0 THEN 0
                ELSE ${BP("CAST(dp.dab AS DOUBLE) / (sqrt(CAST(dp.daa AS DOUBLE)) * sqrt(CAST(dp.dbb AS DOUBLE)))")}
                END AS cos_proj_bp
               FROM pr JOIN dp USING (vec_a, vec_b))
         SELECT vec_a, vec_b, cos_orig_bp, cos_proj_bp,
           cos_proj_bp - cos_orig_bp AS err_bp
         FROM f""",

    // Theil's U: the q220 MI terms + per-marginal entropy terms, each
    // floor(·10⁶+½) before its exact sum; both directions one idiv.
    "q294_theil_u" ->
      """WITH c AS (SELECT event_type AS x, isodow(CAST(ts AS DATE)) AS y,
                count(*) AS n FROM events GROUP BY 1, 2),
         mx AS (SELECT x, sum(n) AS nx FROM c GROUP BY 1),
         my AS (SELECT y, sum(n) AS ny FROM c GROUP BY 1),
         t AS (SELECT sum(n) AS nt FROM c),
         mi AS (SELECT sum(n) AS n, sum(CAST(floor(
                  (CAST(c.n AS DOUBLE) / nt) * ln((CAST(c.n AS DOUBLE) / nt)
                    / ((CAST(nx AS DOUBLE) / nt) * (CAST(ny AS DOUBLE) / nt)))
                  * 1000000 + 0.5) AS BIGINT)) AS mi_unat
               FROM c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t),
         hx AS (SELECT sum(CAST(floor(
                  (-(CAST(nx AS DOUBLE) / nt)) * ln(CAST(nx AS DOUBLE) / nt)
                  * 1000000 + 0.5) AS BIGINT)) AS h_x_unat
               FROM mx CROSS JOIN t),
         hy AS (SELECT sum(CAST(floor(
                  (-(CAST(ny AS DOUBLE) / nt)) * ln(CAST(ny AS DOUBLE) / nt)
                  * 1000000 + 0.5) AS BIGINT)) AS h_y_unat
               FROM my CROSS JOIN t)
         SELECT CAST(n AS BIGINT) AS n, CAST(mi_unat AS BIGINT) AS mi_unat,
           CAST(h_x_unat AS BIGINT) AS h_x_unat,
           CAST(h_y_unat AS BIGINT) AS h_y_unat,
           CAST(CASE WHEN h_x_unat = 0 THEN NULL
                ELSE (10000 * mi_unat) // h_x_unat END AS BIGINT)
             AS u_x_given_y_bp,
           CAST(CASE WHEN h_y_unat = 0 THEN NULL
                ELSE (10000 * mi_unat) // h_y_unat END AS BIGINT)
             AS u_y_given_x_bp
         FROM mi, hx, hy""",

    // Q-Q decile table: percentile_disc cuts per side (data members,
    // exact in both engines), difference + truncating ratio idiv.
    "q295_qq_drift" -> {
      val refs = (1 to 9).map(j =>
        s"percentile_disc(0.$j) WITHIN GROUP (ORDER BY v) AS p$j")
        .mkString(", ")
      s"""WITH b AS (SELECT ${C("value")} AS v,
                event_type = 'purchase' AS is_ref
              FROM events WHERE value IS NOT NULL),
         r AS (SELECT count(*) AS n, $refs FROM b WHERE is_ref),
         c AS (SELECT count(*) AS n, $refs FROM b WHERE NOT is_ref),
         d AS (SELECT unnest(range(1, 10)) AS decile),
         g AS (SELECT d.decile,
                CAST(CASE d.decile ${(1 to 9).map(j =>
                  s"WHEN $j THEN r.p$j").mkString(" ")} END AS BIGINT)
                  AS ref_cents,
                CAST(CASE d.decile ${(1 to 9).map(j =>
                  s"WHEN $j THEN c.p$j").mkString(" ")} END AS BIGINT)
                  AS cur_cents
               FROM d, r, c)
         SELECT decile, ref_cents, cur_cents,
           cur_cents - ref_cents AS diff_cents,
           CAST(CASE WHEN ref_cents IS NULL OR ref_cents = 0
                  OR cur_cents IS NULL THEN NULL
                ELSE (10000 * cur_cents) // ref_cents END AS BIGINT)
             AS ratio_bp
         FROM g"""
    },

    "q115_latest_state" ->
      s"""WITH e AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id FROM events),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_changes FROM e)
         SELECT user_id, event_type AS last_type, ${C("value")} AS last_value_cents,
           ts_us AS last_ts_us, n_changes
         FROM r WHERE rn = 1 AND event_type <> 'error'""",

    "q116_scd2" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
         o AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e),
         c AS (SELECT *, sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS version FROM o),
         runs AS (SELECT user_id, CAST(version AS BIGINT) AS version, min(event_type) AS state,
                  min(ts_us) AS valid_from_us, count(*) AS n_events FROM c GROUP BY user_id, version)
         SELECT user_id, version, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
           n_events FROM runs""",

    "q117_trailing_actives" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
         days AS (SELECT DISTINCT day FROM d)
         SELECT days.day AS rday, count(DISTINCT d.user_id) AS active_users
         FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
         GROUP BY 1""",

    "q118_band_lookup" ->
      s"""WITH b AS (SELECT o_totalprice,
           CAST((o_totalprice >= 50000) AS INT) + CAST((o_totalprice >= 100000) AS INT)
           + CAST((o_totalprice >= 200000) AS INT) + CAST((o_totalprice >= 300000) AS INT) AS band
           FROM orders)
         SELECT CAST(band AS BIGINT) AS band,
           CASE band WHEN 0 THEN 'lt50k' WHEN 1 THEN '50-100k' WHEN 2 THEN '100-200k'
                     WHEN 3 THEN '200-300k' ELSE 'gte300k' END AS band_name,
           count(*) AS n_orders, ${C("sum(o_totalprice)")} AS sum_cents
         FROM b GROUP BY band""",

    "q119_corpus_drift" ->
      """WITH t AS (SELECT lang,
           source IN ('src0','src1','src2','src3','src4') AS is_a,
           unnest(string_split(text, ' ')) AS tok FROM documents),
         c AS (SELECT lang, tok, sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb FROM t GROUP BY 1, 2),
         n AS (SELECT lang, sum(ca) AS na, sum(cb) AS nb, count(*) AS vocab FROM c GROUP BY 1)
         SELECT c.lang, max(vocab) AS vocab,
           CAST(sum(CAST(floor( ((ca+1.0)/(na+vocab)) * ln( ((ca+1.0)/(na+vocab)) / ((cb+1.0)/(nb+vocab)) ) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS kl_nano,
           CAST(sum(CAST(floor( -((ca+1.0)/(na+vocab)) * ln( (cb+1.0)/(nb+vocab) ) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS ce_nano
         FROM c JOIN n ON c.lang = n.lang GROUP BY c.lang""",

    "q120_expectations" ->
      """WITH s AS (SELECT count(*) AS n_rows,
           sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) - count(DISTINCT o_orderkey) AS u,
           sum(CASE WHEN o_totalprice <= 400000 THEN 0 ELSE 1 END) AS r1,
           sum(CASE WHEN o_orderdate <= TIMESTAMP '2000-12-31' THEN 0 ELSE 1 END) AS r2,
           sum(CASE WHEN o_orderstatus IN ('O','F') THEN 0 ELSE 1 END) AS r3,
           sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS r4
           FROM orders)
         SELECT r.rule, r.n_violations, s.n_rows,
           CAST(r.n_violations = 0 AS INT) AS pass
         FROM s, LATERAL (VALUES
           ('o_orderkey_unique', CAST(u AS BIGINT)),
           ('totalprice_le_400k', CAST(r1 AS BIGINT)),
           ('orderdate_le_2000', CAST(r2 AS BIGINT)),
           ('status_in_domain', CAST(r3 AS BIGINT)),
           ('custkey_not_null', CAST(r4 AS BIGINT))) r(rule, n_violations)""",

    "q122_pmi_collocations" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
         uc AS (SELECT lang, unnest(toks) AS tok FROM t) ,
         ucc AS (SELECT lang, tok, count(*) AS c FROM uc GROUP BY 1, 2),
         un AS (SELECT lang, sum(c) AS n1 FROM ucc GROUP BY 1),
         bi AS (SELECT lang, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t),
         bc AS (SELECT lang, bigram, count(*) AS cxy FROM bi GROUP BY 1, 2),
         bn AS (SELECT lang, sum(cxy) AS n2 FROM bc GROUP BY 1),
         j AS (SELECT bc.lang, bigram, cxy, string_split(bigram, ' ')[1] AS ta,
                 string_split(bigram, ' ')[2] AS tb FROM bc WHERE cxy >= 5),
         p AS (SELECT j.lang, bigram, cxy,
                 CAST(floor( ln( (cxy / CAST(n2 AS DOUBLE)) / ((ca.c / CAST(n1 AS DOUBLE)) * (cb.c / CAST(n1 AS DOUBLE))) ) * 1000 + 0.5) AS BIGINT) AS pmi_milli
               FROM j JOIN un ON un.lang = j.lang JOIN bn ON bn.lang = j.lang
               JOIN ucc ca ON ca.lang = j.lang AND ca.tok = j.ta
               JOIN ucc cb ON cb.lang = j.lang AND cb.tok = j.tb),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pmi_milli DESC, bigram ASC) AS rank FROM p)
         SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, cxy AS n_pair, pmi_milli
         FROM r WHERE rank <= 10""",

    "q123_rate_anomaly" ->
      """WITH c AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n FROM events GROUP BY 1, 2),
         s AS (SELECT day, sum(n) AS sn, sum(n*n) AS sq, count(*) AS m FROM c GROUP BY 1 HAVING count(*) >= 2)
         SELECT c.day, user_id, n,
           CAST(floor( ((n*m - sn) / CAST(m AS DOUBLE)) / sqrt((sq*m - sn*sn) / (m*(m-1.0))) * 10000 + 0.5) AS BIGINT) AS z_bp
         FROM c JOIN s ON c.day = s.day
         WHERE (m-1) * (n*m - sn) * (n*m - sn) > 4 * m * (sq*m - sn*sn) AND n*m > sn""",

    // est_cnt == cnt is the correctness claim here: the 31-token vocab
    // is collision-free in a 4096x4 sketch (P(collision) ~ 1.7e-12 under
    // the fixed hash), and CMS never undercounts - so the sketched
    // estimate must equal the exact count on this corpus.
    "q126_cms_counts" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT 20)
         SELECT tok, cnt, cnt AS est_cnt FROM c""",

    "q127_interpolate" ->
      s"""WITH e0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             ${C("value")} AS v0 FROM events),
         e AS (SELECT user_id, ts_us, max_by(v0, event_id) AS v_cents
               FROM e0 GROUP BY 1, 2),
         b AS (SELECT user_id, ((min(ts_us) + 21599999999) // 21600000000) * 21600000000 AS g0,
               (max(ts_us) // 21600000000) * 21600000000 AS g1 FROM e GROUP BY 1),
         g AS (SELECT user_id, unnest(generate_series(g0, g1, 21600000000)) AS ts_us
               FROM b WHERE g0 <= g1),
         u AS (SELECT user_id, ts_us, v_cents, 1 AS is_e FROM e
               UNION ALL SELECT user_id, ts_us, NULL, 0 FROM g),
         w AS (SELECT *,
           last_value(CASE WHEN is_e = 1 THEN ts_us END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts_us, is_e DESC ROWS UNBOUNDED PRECEDING) AS ta,
           last_value(CASE WHEN is_e = 1 THEN v_cents END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts_us, is_e DESC ROWS UNBOUNDED PRECEDING) AS va,
           first_value(CASE WHEN is_e = 1 THEN ts_us END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts_us, is_e DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tb,
           first_value(CASE WHEN is_e = 1 THEN v_cents END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts_us, is_e DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vb
           FROM u)
         SELECT user_id, ts_us AS grid_us,
           CAST(CASE WHEN ta = ts_us THEN va
                ELSE (va * (tb - ts_us) + vb * (ts_us - ta)) // (tb - ta) END AS BIGINT) AS interp_cents
         FROM w WHERE is_e = 0""",

    "q128_mad_outliers" ->
      s"""WITH v AS (SELECT event_type, ${C("value")} AS v FROM events),
         med AS (SELECT event_type, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS median_cents
                 FROM v GROUP BY 1),
         dev AS (SELECT v.event_type, abs(v - median_cents) AS ad, median_cents
                 FROM v JOIN med ON v.event_type = med.event_type),
         mad AS (SELECT event_type, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT) AS mad_cents
                 FROM dev GROUP BY 1)
         SELECT dev.event_type, max(dev.median_cents) AS median_cents,
           max(mad.mad_cents) AS mad_cents,
           CAST(sum(CASE WHEN ad > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           count(*) AS n
         FROM dev JOIN mad ON dev.event_type = mad.event_type
         GROUP BY 1""",

    "q135_dup_graph" ->
      s"""WITH $ShingleCtes,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         good AS (SELECT ida, idb FROM pair
                  JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                  WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
         e AS (SELECT ida AS x, idb AS y FROM good),
         deg AS (SELECT n, count(*) AS d FROM
                 (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e) GROUP BY 1)
         SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT max(d) FROM deg) AS max_degree,
           (SELECT count(*) FROM e e1 JOIN e e2 ON e1.y = e2.x
              JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles""",

    "q136_entity_resolution" ->
      """WITH RECURSIVE p AS (SELECT p_partkey AS k, p_name AS nm, p_brand AS b FROM part),
         ex AS (SELECT a.k AS ka, b2.k AS kb FROM p a JOIN p b2
                ON a.b = b2.b AND a.nm = b2.nm AND a.k < b2.k),
         lv AS (SELECT a.k AS ka, b2.k AS kb FROM p a JOIN p b2
                ON a.b = b2.b AND a.k < b2.k
                  AND abs(length(a.nm) - length(b2.nm)) <= 2 AND a.nm <> b2.nm
                WHERE levenshtein(a.nm, b2.nm) BETWEEN 1 AND 2),
         ed AS (SELECT ka, kb FROM ex UNION SELECT ka, kb FROM lv),
         edges AS (SELECT ka AS a, kb AS b FROM ed UNION SELECT kb, ka FROM ed),
         reach(node, r) AS (SELECT a, a FROM edges
                            UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
         lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY 1),
         mem AS (SELECT p.k, p.nm, coalesce(lab.cluster_id, p.k) AS cluster_id
                 FROM p LEFT JOIN lab ON lab.node = p.k),
         nc AS (SELECT cluster_id, nm, count(*) AS cnt FROM mem GROUP BY 1, 2),
         canon AS (SELECT cluster_id, nm AS canonical_name FROM
                   (SELECT *, row_number() OVER (PARTITION BY cluster_id
                      ORDER BY cnt DESC, nm ASC) AS rn FROM nc) WHERE rn = 1)
         SELECT m.cluster_id, canon.canonical_name, count(*) AS n_records,
           count(DISTINCT m.nm) AS n_names
         FROM mem m JOIN canon ON m.cluster_id = canon.cluster_id
         GROUP BY 1, 2""",

    "q137_incremental_agg" ->
      s"""SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(${C("o_totalprice")}) AS BIGINT) AS sum_cents
         FROM orders GROUP BY 1""",

    "q140_hierarchy" ->
      """WITH RECURSIVE h(k, root_key, depth) AS (
           SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey < 10
           UNION ALL
           SELECT n.c_custkey, h.root_key, h.depth + 1
           FROM customer n JOIN h ON n.c_custkey // 10 = h.k
           WHERE n.c_custkey >= 10
         ) SELECT k AS c_custkey, root_key, depth FROM h""",

    "q138_dense_ids" ->
      """SELECT c_custkey, c_mktsegment,
         CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS dense_id
         FROM customer""",

    "q139_dynamic_pivot" ->
      s"""SELECT l_linestatus,
         ${C("sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END)")} AS A,
         ${C("sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END)")} AS N,
         ${C("sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)")} AS R
         FROM lineitem GROUP BY 1""",

    "q65_crossmodal_dedup" ->
      s"""WITH RECURSIVE $ShingleCtes,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         tgood AS (SELECT ida, idb FROM pair
                   JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                   WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
         egood AS (SELECT a.vec_id AS ida, b.vec_id AS idb
                   FROM embeddings a JOIN embeddings b
                   ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])) >= 0.35),
         allg AS (SELECT * FROM tgood UNION SELECT * FROM egood),
         edges AS (SELECT ida AS a, idb AS b FROM allg UNION SELECT idb, ida FROM allg),
         reach(node, r) AS (SELECT a, a FROM edges
                            UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
         lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
         SELECT cluster_id, count(*) AS n_members FROM lab GROUP BY 1""",

    "q66_crossmodal_keep" ->
      s"""WITH RECURSIVE $ShingleCtes,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         tgood AS (SELECT ida, idb FROM pair
                   JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                   WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
         egood AS (SELECT a.vec_id AS ida, b.vec_id AS idb
                   FROM embeddings a JOIN embeddings b
                   ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])) >= 0.35),
         allg AS (SELECT * FROM tgood UNION SELECT * FROM egood),
         edges AS (SELECT ida AS a, idb AS b FROM allg UNION SELECT idb, ida FROM allg),
         reach(node, r) AS (SELECT a, a FROM edges
                            UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
         lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
         cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1),
         $QualityCte
         SELECT lab.cluster_id, cs.cluster_size,
           arg_max(lab.node, $KeepPack) AS keep_id,
           arg_max(q.quality_bp, $KeepPack) AS keep_quality_bp
         FROM lab JOIN q ON q.doc_id = lab.node JOIN cs USING (cluster_id)
         GROUP BY 1, 2""",

    "q67_robust_scale" ->
      s"""WITH v AS (SELECT event_type, event_id, ${C("value")} AS v FROM events),
         med AS (SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS med,
             CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS BIGINT) AS lo,
             CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS BIGINT) AS hi
           FROM v GROUP BY 1),
         dev AS (SELECT v.*, med, lo, hi, abs(v - med) AS ad
                 FROM v JOIN med ON v.event_type = med.event_type),
         mad AS (SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT) AS mad
           FROM dev GROUP BY 1)
         SELECT event_id, dev.event_type,
           greatest(lo, least(hi, v)) AS winsorized_cents,
           CASE WHEN mad = 0 THEN 0
                ELSE CAST(((v - med) * 10000) // mad AS BIGINT) END AS robust_z_bp
         FROM dev JOIN mad ON dev.event_type = mad.event_type""",

    "q64_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
         i AS (SELECT user_id, day,
                 day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
               FROM d),
         runs AS (SELECT user_id, island, count(*) AS len, max(day) AS run_end
                  FROM i GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY len DESC, run_end DESC) AS rn
               FROM runs)
         SELECT user_id, CAST(len AS BIGINT) AS longest_streak,
           (SELECT CAST(count(*) AS BIGINT) FROM runs r2 WHERE r2.user_id = r.user_id) AS n_streaks,
           run_end AS best_streak_end
         FROM r WHERE rn = 1""",

    "q133_hopping" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         x AS (SELECT user_id, unnest(generate_series(
             ((t - 3600000000) // 900000000 + 1) * 900000000,
             (t // 900000000) * 900000000, 900000000)) AS window_us FROM e)
         SELECT window_us, count(*) AS n_events,
           count(DISTINCT user_id) AS n_keys
         FROM x GROUP BY 1""",

    "q134_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         w AS (SELECT *, max(CASE WHEN event_type IN ('view','click') THEN ts_us END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch_us
               FROM e),
         lags AS (SELECT (ts_us - last_touch_us) // 1000000 AS lag_s FROM w
                  WHERE event_type = 'purchase' AND last_touch_us IS NOT NULL)
         SELECT count(*) AS n_conversions,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lag_s) AS BIGINT) AS p25_s,
           CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY lag_s) AS BIGINT) AS p50_s,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY lag_s) AS BIGINT) AS p75_s,
           CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY lag_s) AS BIGINT) AS p90_s
         FROM lags""",

    "q131_rfm" ->
      s"""WITH mx AS (SELECT max(o_orderdate) AS max_d FROM orders),
         rfm AS (SELECT o_custkey,
             CAST(min(datediff('day', o_orderdate, max_d)) AS BIGINT) AS recency_days,
             count(*) AS frequency,
             ${C("sum(o_totalprice)")} AS monetary_cents
           FROM orders CROSS JOIN mx GROUP BY 1),
         c AS (SELECT
             CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS BIGINT) AS r25,
             CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY recency_days) AS BIGINT) AS r50,
             CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS BIGINT) AS r75,
             CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS BIGINT) AS f25,
             CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY frequency) AS BIGINT) AS f50,
             CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS BIGINT) AS f75,
             CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary_cents) AS BIGINT) AS m25,
             CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY monetary_cents) AS BIGINT) AS m50,
             CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary_cents) AS BIGINT) AS m75
           FROM rfm)
         SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST((4 - (CAST(recency_days >= r25 AS INT) + CAST(recency_days >= r50 AS INT) + CAST(recency_days >= r75 AS INT))) * 100
            + (1 + CAST(frequency >= f25 AS INT) + CAST(frequency >= f50 AS INT) + CAST(frequency >= f75 AS INT)) * 10
            + (1 + CAST(monetary_cents >= m25 AS INT) + CAST(monetary_cents >= m50 AS INT) + CAST(monetary_cents >= m75 AS INT)) AS BIGINT) AS segment
         FROM rfm CROSS JOIN c""",

    "q132_cohort_value" ->
      s"""WITH o AS (SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS m,
             o_totalprice FROM orders),
         f AS (SELECT o_custkey, CAST(min(m) AS BIGINT) AS cohort_m FROM o GROUP BY 1)
         SELECT cohort_m, CAST(o.m - cohort_m AS BIGINT) AS age_months,
           count(DISTINCT o.o_custkey) AS n_customers, count(*) AS n_orders,
           ${C("sum(o_totalprice)")} AS sum_cents
         FROM o JOIN f ON o.o_custkey = f.o_custkey
         GROUP BY 1, 2""",

    "q129_rank_normalize" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rank,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderkey, o_orderpriority, CAST(rank AS BIGINT) AS rank,
           CAST(((rank - 1) * 10000) // greatest(n - 1, 1) AS BIGINT) AS rank_bp
         FROM r""",

    "q130_chisq" ->
      """WITH c AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
         ra AS (SELECT lang, sum(obs) AS rt FROM c GROUP BY 1),
         rb AS (SELECT source, sum(obs) AS ct FROM c GROUP BY 1),
         n AS (SELECT sum(obs) AS n FROM c),
         t AS (SELECT CAST(floor( (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS term,
                 c.lang, c.source
               FROM c JOIN ra USING (lang) JOIN rb USING (source) CROSS JOIN n)
         SELECT count(*) AS cells,
           CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
           CAST(sum(term) AS BIGINT) AS chi2_micro
         FROM t""",

    // Cramér's V from the q130 term discipline on orders with the
    // r×c grid COMPLETED (zero cells contribute exp): exact long
    // χ²_micro, one pinned double boundary √((χ²/10⁶)/(n·(min−1))).
    "q292_cramers_v" ->
      """WITH c AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                count(*) AS obs FROM orders GROUP BY 1, 2),
         ra AS (SELECT a, sum(obs) AS rt FROM c GROUP BY 1),
         rb AS (SELECT b, sum(obs) AS ct FROM c GROUP BY 1),
         n AS (SELECT sum(obs) AS n FROM c),
         g AS (SELECT ra.a, rb.b, ra.rt, rb.ct, coalesce(c.obs, 0) AS obs
               FROM ra CROSS JOIN rb LEFT JOIN c USING (a, b)),
         t AS (SELECT CAST(floor( (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS term,
                 g.a, g.b, g.obs
               FROM g CROSS JOIN n),
         m AS (SELECT sum(obs) AS n, count(*) AS cells,
                count(DISTINCT a) AS r_levels, count(DISTINCT b) AS c_levels,
                sum(term) AS chi2_micro FROM t)
         SELECT CAST(n AS BIGINT) AS n, CAST(cells AS BIGINT) AS cells,
           CAST(r_levels AS BIGINT) AS r_levels,
           CAST(c_levels AS BIGINT) AS c_levels,
           CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
           CAST(chi2_micro AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN least(r_levels, c_levels) <= 1 THEN NULL
                ELSE floor(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000)
                  / (CAST(n AS DOUBLE)
                     * CAST(least(r_levels, c_levels) - 1 AS DOUBLE)))
                  * 10000 + 0.5) END AS BIGINT) AS cramers_v_bp
         FROM m""",

    "q125_temporal_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
         o AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e),
         c AS (SELECT *, sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS version FROM o),
         runs AS (SELECT user_id, CAST(version AS BIGINT) AS version, min(event_type) AS state,
                  min(ts_us) AS valid_from_us FROM c GROUP BY user_id, version),
         scd AS (SELECT user_id, version, state, valid_from_us,
                 lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us
                 FROM runs)
         SELECT e.event_id, e.user_id, e.ts_us - 3600000000 AS probe_us,
           s.version, s.state AS state_then
         FROM e LEFT JOIN scd s ON s.user_id = e.user_id
           AND s.valid_from_us <= e.ts_us - 3600000000
           AND (s.valid_to_us IS NULL OR e.ts_us - 3600000000 < s.valid_to_us)""",

    "q121_snapshot_diff" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
         o AS (SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
               FROM e WHERE ts_us < 1705881600000000),
         n AS (SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
               FROM e WHERE ts_us >= 1704672000000000),
         oo AS (SELECT user_id, event_type AS old_type FROM o WHERE rn = 1),
         nn AS (SELECT user_id, event_type AS new_type FROM n WHERE rn = 1)
         SELECT coalesce(oo.user_id, nn.user_id) AS user_id,
           CASE WHEN old_type IS NULL THEN 'added' WHEN new_type IS NULL THEN 'removed'
                WHEN old_type <> new_type THEN 'changed' ELSE 'same' END AS status,
           old_type, new_type
         FROM oo FULL OUTER JOIN nn ON oo.user_id = nn.user_id""",

    // Recomputes Md5WindowHashes verbatim: per doc the DISTINCT
    // md5_number_upper hashes of the space-joined 4-token sliding
    // windows (whole doc when shorter), benchmark slice doc_id%23=0,
    // per-train-doc hit counts against the distinct benchmark set.
    "q176_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         idx AS (SELECT doc_id, ts,
                 unnest(range(1, CASE WHEN len(ts) >= 4 THEN len(ts) - 2 ELSE 2 END)) AS i
                 FROM tk),
         wins AS (SELECT DISTINCT doc_id,
                  md5_number_upper(array_to_string(list_slice(ts, i, LEAST(i + 3, len(ts))), ' ')) AS h
                  FROM idx),
         bench AS (SELECT DISTINCT h FROM wins WHERE doc_id % 23 = 0),
         tw AS (SELECT doc_id, h FROM wins WHERE doc_id % 23 <> 0)
         SELECT t.doc_id, count(*) AS n_windows,
           CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(CASE WHEN sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) > 0
                THEN 1 ELSE 0 END AS INT) AS contaminated
         FROM tw t LEFT JOIN bench b USING (h) GROUP BY t.doc_id""",

    // Recomputes the bottom-k-by-hash sample EXACTLY (the k (h, v)-
    // lexicographically-smallest pairs per day under the signed
    // md5_number_upper hash) and the nearest-rank picks from the
    // value-sorted sample; the RANGE row re-selects the bottom k of
    // the union of the daily samples (bottom-k mergeability).
    "q177_quantile_sketch" ->
      """WITH e AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(CASE WHEN md5_number_upper(CAST(event_id AS VARCHAR)) >= 9223372036854775808::HUGEINT
                THEN md5_number_upper(CAST(event_id AS VARCHAR))::HUGEINT - 18446744073709551616::HUGEINT
                ELSE md5_number_upper(CAST(event_id AS VARCHAR))::HUGEINT END AS BIGINT) AS h,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events
           WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'),
         sel AS (SELECT day, h, v FROM e
                 QUALIFY row_number() OVER (PARTITION BY day ORDER BY h, v) <= 256),
         mg AS (SELECT 'RANGE' AS day, h, v FROM sel
                QUALIFY row_number() OVER (ORDER BY h, v) <= 256),
         u AS (SELECT day, v FROM sel UNION ALL SELECT day, v FROM mg),
         n AS (SELECT day, count(*) AS n FROM u GROUP BY day),
         rk AS (SELECT day, v, row_number() OVER (PARTITION BY day ORDER BY v) AS rv FROM u)
         SELECT n.day, CAST(n.n AS BIGINT) AS n_sample,
           max(CASE WHEN rk.rv = ((n.n - 1) * 50) // 100 + 1 THEN rk.v END) AS p50_cents,
           max(CASE WHEN rk.rv = ((n.n - 1) * 90) // 100 + 1 THEN rk.v END) AS p90_cents
         FROM n JOIN rk ON rk.day = n.day GROUP BY n.day, n.n""",

    // Exact integer TWAP: cents at the row, micros holding gaps via
    // lead(), HUGEINT products (a week of micros x cents crosses
    // 2^63), truncating // on the non-negative operands = IntegralDivide.
    "q178_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v, event_id FROM events),
         g AS (SELECT user_id, v,
               lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS gap
               FROM e),
         h AS (SELECT user_id, CAST(v AS HUGEINT) AS v, CAST(gap AS HUGEINT) AS gap
               FROM g WHERE gap IS NOT NULL),
         a AS (SELECT user_id, count(*) AS n_intervals, sum(gap) AS span,
               sum(v * gap) AS wsum FROM h GROUP BY user_id)
         SELECT user_id, n_intervals, CAST(span AS BIGINT) AS span_us,
           CAST(wsum // span AS BIGINT) AS twap_cents
         FROM a WHERE span > 0""",

    "q179_stat_segment" ->
      // Full recomputation of the statistical segmenter: the cycling-
      // vocab corpus, corpus-wide unigram/bigram counts over script
      // runs, the exact integer PMI cross-multiplication (HUGEINT =
      // the decimal(38,0) twin), and ordered token reassembly.
      """WITH m AS (SELECT doc_id,
           substr(text, 1, 40) || ' ' ||
           (['你好','世界','天氣'])[CAST(doc_id % 3 AS INT) + 1] ||
           (['你好','世界','天氣'])[CAST((doc_id // 3) % 3 AS INT) + 1] ||
           (['你好','世界','天氣'])[CAST((doc_id // 9) % 3 AS INT) + 1] ||
           (['你好','世界','天氣'])[CAST((doc_id // 27) % 3 AS INT) + 1] ||
           CASE WHEN doc_id % 2 = 0 THEN ' ' ||
             (['สวด','ชาก','โลน'])[CAST((doc_id // 2) % 3 AS INT) + 1] ||
             (['สวด','ชาก','โลน'])[CAST((doc_id // 6) % 3 AS INT) + 1] ||
             (['สวด','ชาก','โลน'])[CAST((doc_id // 18) % 3 AS INT) + 1]
           ELSE '' END AS t FROM documents),
         ra AS (SELECT doc_id, regexp_extract_all(t,
             '[\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}]+') AS arr FROM m),
         runs AS (SELECT doc_id, ri AS run_idx, arr[ri] AS run
                  FROM ra, UNNEST(range(1, len(arr) + 1)) AS u(ri)),
         chars AS (SELECT doc_id, run_idx, ci AS cpos, substr(run, ci, 1) AS c
                   FROM runs, UNNEST(range(1, length(run) + 1)) AS u(ci)),
         pairs AS (SELECT doc_id, run_idx, ci + 1 AS pos,
                     substr(run, ci, 1) AS a, substr(run, ci + 1, 1) AS b
                   FROM runs, UNNEST(range(1, length(run))) AS u(ci)),
         uni AS (SELECT c, count(*) AS cnt FROM chars GROUP BY 1),
         bi AS (SELECT a, b, count(*) AS cnt_ab FROM pairs GROUP BY 1, 2),
         tot AS (SELECT (SELECT count(*) FROM chars) AS nu,
                        (SELECT count(*) FROM pairs) AS nb),
         flags AS (SELECT a, b,
             (1 * CAST(cnt_ab AS HUGEINT) * nu * nu <
              8 * CAST(ua.cnt AS HUGEINT) * ub.cnt * nb) AS boundary
           FROM bi JOIN uni ua ON ua.c = bi.a
                   JOIN uni ub ON ub.c = bi.b CROSS JOIN tot),
         cs AS (SELECT ch.doc_id, ch.run_idx, ch.cpos, ch.c,
             sum(CASE WHEN f.boundary THEN 1 ELSE 0 END)
               OVER (PARTITION BY ch.doc_id, ch.run_idx ORDER BY ch.cpos) AS seg
           FROM chars ch LEFT JOIN
             (SELECT p.doc_id, p.run_idx, p.pos, fl.boundary
              FROM pairs p JOIN flags fl ON fl.a = p.a AND fl.b = p.b) f
             ON f.doc_id = ch.doc_id AND f.run_idx = ch.run_idx
                AND f.pos = ch.cpos),
         toks AS (SELECT doc_id, run_idx, seg,
                    string_agg(c, '' ORDER BY cpos) AS tok
                  FROM cs GROUP BY 1, 2, 3)
         SELECT doc_id, CAST(count(DISTINCT run_idx) AS BIGINT) AS n_runs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, '|' ORDER BY run_idx, seg)) AS tok_md5
         FROM toks GROUP BY 1""",

    "q180_derepeat" ->
      // Repeated-3-gram span removal: windows ranked per (doc, gram) by
      // start, starts past the first are repeated, their ≤k covered
      // positions drop, survivors reassemble in order.
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tks FROM documents),
         w AS (SELECT doc_id, i AS p, array_to_string(tks[i:i+2], ' ') AS g
               FROM t, UNNEST(range(1, len(tks) - 1)) AS u(i)),
         r AS (SELECT doc_id, p,
                 row_number() OVER (PARTITION BY doc_id, g ORDER BY p) AS rn
               FROM w),
         cov AS (SELECT DISTINCT doc_id, p + d AS pos
                 FROM r, UNNEST(range(0, 3)) AS v(d) WHERE rn > 1),
         tp AS (SELECT doc_id, i AS pos, tks[i] AS tok
                FROM t, UNNEST(range(1, len(tks) + 1)) AS u(i)),
         kept AS (SELECT tp.doc_id, tp.pos, tp.tok
                  FROM tp LEFT JOIN cov
                    ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
                  WHERE cov.pos IS NULL),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
                 FROM kept GROUP BY 1)
         SELECT t.doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
           CAST(len(tks) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(kept_md5, md5('')) AS kept_md5
         FROM t LEFT JOIN agg USING (doc_id)""",

    "q181_exact_substring" ->
      // Corpus-wide exact 8-token-substring dedup: per window hash, the
      // globally first occurrence (by doc_id, pos) survives; every
      // later occurrence's covered positions drop.
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tks FROM documents),
         w AS (SELECT doc_id, i AS p, md5(array_to_string(tks[i:i+7], ' ')) AS h
               FROM t, UNNEST(range(1, len(tks) - 6)) AS u(i)),
         r AS (SELECT doc_id, p,
                 count(*) OVER (PARTITION BY h) AS cnt,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
               FROM w),
         cov AS (SELECT DISTINCT doc_id, p + d AS pos
                 FROM r, UNNEST(range(0, 8)) AS v(d)
                 WHERE cnt > 1 AND rn > 1),
         tp AS (SELECT doc_id, i AS pos, tks[i] AS tok
                FROM t, UNNEST(range(1, len(tks) + 1)) AS u(i)),
         kept AS (SELECT tp.doc_id, tp.pos, tp.tok
                  FROM tp LEFT JOIN cov
                    ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
                  WHERE cov.pos IS NULL),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
                 FROM kept GROUP BY 1)
         SELECT t.doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
           CAST(len(tks) - coalesce(n_kept, 0) AS BIGINT) AS n_cut,
           coalesce(kept_md5, md5('')) AS kept_md5
         FROM t LEFT JOIN agg USING (doc_id)""",

    // q186's isqrt-weight chain + the integer quota / ceil-milli-epoch
    // arithmetic at target 200000.
    "q270_mixture_quota" ->
      """WITH p AS (SELECT lang, count(*) AS n_docs,
                sum(len(string_split(text, ' '))) AS n_tokens
                FROM documents GROUP BY 1),
         c AS (SELECT lang, n_tokens,
                CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0 FROM p),
         i AS (SELECT lang, n_tokens,
                CASE WHEN (s0+1)*(s0+1) <= n_tokens THEN s0+1
                     WHEN s0*s0 > n_tokens THEN s0-1 ELSE s0 END AS isq FROM c),
         t AS (SELECT sum(isq) AS ti FROM i),
         w AS (SELECT lang, n_tokens, 10000 * isq // ti AS weight_bp FROM i, t),
         q AS (SELECT lang, n_tokens, weight_bp,
               weight_bp * 200000 // 10000 AS quota_tokens FROM w)
         SELECT lang, CAST(n_tokens AS BIGINT) AS available_tokens,
           CAST(weight_bp AS BIGINT) AS weight_bp,
           CAST(quota_tokens AS BIGINT) AS quota_tokens,
           CAST((1000 * quota_tokens + n_tokens - 1) // n_tokens AS BIGINT) AS epochs_milli,
           CAST(CASE WHEN quota_tokens > n_tokens THEN 1 ELSE 0 END AS INT) AS is_exhausted
         FROM q""",

    // Hash rollup, (count DESC, hex-hash ASC) rank, text from the
    // canonical min-(doc, pos) occurrence.
    "q269_boilerplate_hotspots" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         wn AS (SELECT doc_id, i AS p, md5(array_to_string(toks[i:i+7], ' ')) AS h
                FROM t, UNNEST(range(1, len(toks) - 6)) AS u(i)),
         g AS (SELECT h, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
               FROM wn GROUP BY 1 HAVING count(*) > 1),
         fo AS (SELECT h, doc_id AS fdoc, p AS fp FROM
               (SELECT h, doc_id, p,
                row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn FROM wn)
               WHERE rn = 1),
         r AS (SELECT g.h, g.n_occurrences, g.n_docs, fo.fdoc, fo.fp,
               row_number() OVER (ORDER BY g.n_occurrences DESC, g.h ASC) AS rank
               FROM g JOIN fo USING (h) QUALIFY rank <= 20)
         SELECT CAST(r.rank AS BIGINT) AS rank,
           CAST(r.n_occurrences AS BIGINT) AS n_occurrences,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           array_to_string(t.toks[CAST(r.fp AS INT):CAST(r.fp AS INT) + 7], ' ') AS span_text
         FROM r JOIN t ON t.doc_id = r.fdoc""",

    // Funnel = cluster labels (full corpus) -> keep-first survivors ->
    // per-lang percentile_disc gate over SURVIVORS; yields vs ingest.
    "q268_pipeline_yield" ->
      s"""WITH RECURSIVE $ClusterCtes,
         $QualityCte,
         tk AS (SELECT d.doc_id, d.lang,
                CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
                FROM documents d),
         s1 AS (SELECT tk.* FROM tk LEFT JOIN lab ON lab.node = tk.doc_id
                WHERE lab.cluster_id IS NULL OR lab.cluster_id = tk.doc_id),
         sq AS (SELECT s1.*, q.quality_bp FROM s1 JOIN q USING (doc_id)),
         thr AS (SELECT lang,
                 CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY quality_bp) AS BIGINT) AS thr_bp
                 FROM sq GROUP BY 1),
         s2 AS (SELECT sq.* FROM sq JOIN thr USING (lang)
                WHERE sq.quality_bp >= thr.thr_bp),
         tot AS (SELECT sum(n_tokens) AS t0 FROM tk),
         st AS (SELECT '1_ingest' AS stage, count(*) AS n_docs, sum(n_tokens) AS n_tokens FROM tk
                UNION ALL SELECT '2_dedup', count(*), sum(n_tokens) FROM s1
                UNION ALL SELECT '3_quality', count(*), sum(n_tokens) FROM s2)
         SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(10000 * n_tokens // t0 AS BIGINT) AS yield_bp
         FROM st, tot""",

    // Character classes only (both engines are RE2-family); printable
    // ASCII stripped with the 'g' flag; truncating bp.
    "q267_script_audit" ->
      """WITH p AS (SELECT lang, length(text) AS nc,
             length(regexp_replace(text, '[ -~]', '', 'g')) AS na,
             CASE WHEN regexp_matches(text, '�') THEN 1 ELSE 0 END AS hr,
             CASE WHEN regexp_matches(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS hc
             FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           CAST(10000 * sum(na) // sum(nc) AS BIGINT) AS non_ascii_bp,
           CAST(sum(hr) AS BIGINT) AS n_replacement_docs,
           CAST(sum(hc) AS BIGINT) AS n_control_docs
         FROM p GROUP BY 1""",

    // Discrete-percentile caps replayed via the cume_dist window (the
    // q248 convention), then the one-pass clip audit.
    "q266_winsor_audit" ->
      s"""WITH y AS (SELECT event_type AS g, ${C("value")} AS y FROM events),
         cd AS (SELECT g, y, cume_dist() OVER (PARTITION BY g ORDER BY y) AS cd FROM y),
         caps AS (SELECT g,
           min(CASE WHEN cd >= 0.01 THEN y END) AS cap_lo,
           min(CASE WHEN cd >= 0.99 THEN y END) AS cap_hi
           FROM cd GROUP BY 1)
         SELECT y.g AS event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(max(caps.cap_lo) AS BIGINT) AS cap_lo_cents,
           CAST(max(caps.cap_hi) AS BIGINT) AS cap_hi_cents,
           CAST(sum(CASE WHEN y.y < caps.cap_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN y.y > caps.cap_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           CAST(sum(CASE WHEN y.y < caps.cap_lo THEN caps.cap_lo - y.y
                WHEN y.y > caps.cap_hi THEN y.y - caps.cap_hi
                ELSE 0 END) AS BIGINT) AS clip_mass_cents
         FROM y JOIN caps USING (g) GROUP BY 1""",

    // DuckDB dayofweek: Sunday=0 vs Spark's Sunday=1 — shift by one.
    "q265_activity_calendar" ->
      """WITH c AS (SELECT event_type AS s,
             CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n
             FROM events GROUP BY 1, 2, 3),
         t AS (SELECT s, sum(n) AS n_tot FROM c GROUP BY 1)
         SELECT c.s AS event_type, c.dow, c.hod, CAST(c.n AS BIGINT) AS n,
           CAST(10000 * (c.n * 168 - t.n_tot) // t.n_tot AS BIGINT) AS dev_bp
         FROM c JOIN t USING (s)""",

    // Keeper/redundant/unique roles from the recursive cluster labels,
    // q41 quality per doc, truncating mean per role.
    "q263_dup_quality" ->
      s"""WITH RECURSIVE $ClusterCtes,
         $QualityCte,
         tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents),
         j AS (SELECT q.doc_id, q.quality_bp, tk.n_tokens,
               CASE WHEN lab.cluster_id IS NULL THEN 'unique'
                    WHEN lab.cluster_id = q.doc_id THEN 'keeper'
                    ELSE 'redundant' END AS role
               FROM q JOIN tk USING (doc_id)
               LEFT JOIN lab ON lab.node = q.doc_id)
         SELECT role, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(quality_bp) // count(*) AS BIGINT) AS mean_quality_bp
         FROM j GROUP BY 1""",

    // Exact 5-NN per vector (the q60 tie order), per-vector disagree
    // counts, label-grain rollup.
    "q264_label_noise" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, embedding, label FROM embeddings),
         sc AS (SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS nid, c.label AS nl,
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos
                FROM ev q JOIN ev c ON c.vec_id <> q.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk FROM sc),
         d AS (SELECT qid, ql, sum(CASE WHEN nl <> ql THEN 1 ELSE 0 END) AS nd
               FROM r WHERE rk <= 5 GROUP BY 1, 2)
         SELECT ql AS label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN nd >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
           CAST(10000 * sum(CASE WHEN nd >= 4 THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS suspect_bp
         FROM d GROUP BY 1""",

    // q233's shard deal + distinct (shard, window-hash) grain;
    // first-seen = min shard per hash; bounded cumulative window.
    "q262_novelty_decay" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         b AS (SELECT CAST(md5_number_upper('ep1:' || CAST(doc_id AS VARCHAR)) % 32 AS BIGINT) AS shard,
               toks FROM t WHERE len(toks) >= 8),
         wins AS (SELECT DISTINCT shard,
                  md5(array_to_string(toks[i:i+7], ' ')) AS h
                  FROM b, UNNEST(range(1, len(toks) - 6)) AS u(i)),
         ps AS (SELECT shard, count(*) AS d_s FROM wins GROUP BY 1),
         fs AS (SELECT shard, count(*) AS f_s FROM
                (SELECT h, min(shard) AS shard FROM wins GROUP BY 1) GROUP BY 1),
         j AS (SELECT ps.shard, ps.d_s, coalesce(fs.f_s, 0) AS f_s
               FROM ps LEFT JOIN fs USING (shard)),
         c AS (SELECT shard, d_s, f_s,
               sum(f_s) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) AS cum_f,
               sum(f_s) OVER () AS tot_f FROM j)
         SELECT shard, CAST(d_s AS BIGINT) AS n_distinct_windows,
           CAST(f_s AS BIGINT) AS n_first_seen,
           CAST(10000 * f_s // d_s AS BIGINT) AS novelty_bp,
           CAST(10000 * cum_f // tot_f AS BIGINT) AS cum_share_bp
         FROM c""",

    // The q247 doubling chain + per-width q181 coverage (cnt/rn over
    // the hash partition, distinct covered positions), one totals row.
    "q261_cut_curve" -> {
      val w = 8; val rounds = 4
      val dbl = (1 until rounds).map { j =>
        val shift = w * (1 << (j - 1))
        s"""h$j AS (SELECT a.doc_id, a.p, md5(a.h || ':' || b.h) AS h
           FROM h${j - 1} a JOIN h${j - 1} b ON b.doc_id = a.doc_id AND b.p = a.p + $shift)"""
      }.mkString(",\n         ")
      val cuts = (0 until rounds).map { j =>
        val width = w * (1 << j)
        s"""SELECT $width AS width, count(DISTINCT doc_id) AS n_docs_hit,
           count(*) AS tokens_cut FROM (
             SELECT DISTINCT doc_id, p + d AS pos
             FROM (SELECT doc_id, p,
                   count(*) OVER (PARTITION BY h) AS cnt,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
                   FROM h$j) r, UNNEST(range(0, $width)) AS v(d)
             WHERE cnt > 1 AND rn > 1)"""
      }.mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         h0 AS (SELECT doc_id, i AS p, md5(array_to_string(toks[i:i+${w - 1}], ' ')) AS h
                FROM t, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)),
         $dbl,
         cw AS ($cuts),
         tot AS (SELECT sum(len(toks)) AS total_tokens FROM t)
         SELECT CAST(width AS BIGINT) AS width, CAST(n_docs_hit AS BIGINT) AS n_docs_hit,
           CAST(tokens_cut AS BIGINT) AS tokens_cut,
           CAST(10000 * tokens_cut // total_tokens AS BIGINT) AS cut_bp
         FROM cw, tot"""
    },

    // q51's pair CTEs + the q247 doubling chain, matches per width
    // restricted by the left join to actual pairs; max width per pair.
    "q260_dup_explain" -> {
      val w = 8; val rounds = 5
      val dbl = (1 until rounds).map { j =>
        val shift = w * (1 << (j - 1))
        s"""h$j AS (SELECT a.doc_id, a.p, md5(a.h || ':' || b.h) AS h
           FROM h${j - 1} a JOIN h${j - 1} b ON b.doc_id = a.doc_id AND b.p = a.p + $shift)"""
      }.mkString(",\n         ")
      val ms = (0 until rounds).map { j =>
        val width = w * (1 << j)
        s"""SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb, $width AS width
           FROM h$j a JOIN h$j b ON a.h = b.h AND a.doc_id < b.doc_id"""
      }.mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         good AS (SELECT ida, idb,
                ${BP("common / CAST(na.n + nb.n - common AS DOUBLE)")} AS jaccard_bp
                FROM pr JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
         h0 AS (SELECT doc_id, i AS p, md5(array_to_string(toks[i:i+${w - 1}], ' ')) AS h
                FROM t, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)),
         $dbl,
         mm AS ($ms),
         mx AS (SELECT ida, idb, max(width) AS mw FROM mm GROUP BY 1, 2)
         SELECT good.ida AS doc_a, good.idb AS doc_b, good.jaccard_bp,
           CAST(coalesce(mx.mw, 0) AS BIGINT) AS max_shared_width
         FROM good LEFT JOIN mx ON mx.ida = good.ida AND mx.idb = good.idb"""
    },

    // Suffix-doubling replayed round-for-round: h0 = the q181 window
    // hash, h_{j+1}(p) = md5(h_j(p) || ':' || h_j(p + w·2^j)) via the
    // same positional self-joins, per-round duplicate counts from the
    // hash-partition window, then the per-doc rollup.
    "q247_repeat_spans" -> {
      val w = 8; val rounds = 5
      val dbl = (1 until rounds).map { j =>
        val shift = w * (1 << (j - 1))
        s"""h$j AS (SELECT a.doc_id, a.p, md5(a.h || ':' || b.h) AS h
           FROM h${j - 1} a JOIN h${j - 1} b ON b.doc_id = a.doc_id AND b.p = a.p + $shift)"""
      }.mkString(",\n         ")
      val stats = (0 until rounds).map { j =>
        val width = w * (1 << j)
        s"""s$j AS (SELECT doc_id, $width AS width, count(*) AS n_dup
           FROM (SELECT doc_id, count(*) OVER (PARTITION BY h) AS cnt FROM h$j)
           WHERE cnt > 1 GROUP BY 1)"""
      }.mkString(",\n         ")
      val un = (0 until rounds).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tks FROM documents),
         h0 AS (SELECT doc_id, i AS p, md5(array_to_string(tks[i:i+${w - 1}], ' ')) AS h
                FROM t, UNNEST(range(1, len(tks) - ${w - 2})) AS u(i)),
         $dbl,
         $stats,
         alls AS ($un),
         pd AS (SELECT doc_id, max(width) AS max_dup_width,
                sum(CASE WHEN width = $w THEN n_dup ELSE 0 END) AS n_dup_w
                FROM alls GROUP BY 1)
         SELECT t.doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
           CAST(coalesce(max_dup_width, 0) AS BIGINT) AS max_dup_width,
           CAST(coalesce(n_dup_w, 0) AS BIGINT) AS n_dup_w
         FROM t LEFT JOIN pd USING (doc_id)"""
    },

    "q183_k_anonymity" ->
      """SELECT CAST(c_nationkey AS INT) AS nation, c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           count(*) AS n,
           CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS INT) AS is_k_anon
         FROM customer GROUP BY 1, 2, 3""",

    "q184_event_lag" ->
      """WITH p AS (SELECT event_type, count(*) AS n_events,
                      max(epoch_us(ts)) AS max_us
                    FROM events GROUP BY 1),
         f AS (SELECT max(max_us) AS feed_max FROM p)
         SELECT event_type, n_events, max_us, feed_max - max_us AS lag_us
         FROM p CROSS JOIN f""",

    // Recomputes the whole KMV overlap algebra: per-segment k-minima
    // under md5 (UBIGINT order = the Spark side's XOR-2^63-flipped
    // signed order), union sketch = k smallest of the concat, c = slots
    // present in BOTH sketches, then the same truncating integer
    // estimators. Exact intersections come from a distinct-pair
    // self-join (the oracle can afford it at sf0.01; the Spark side
    // uses the linear per-key set explosion).
    "q185_kmv_overlap" ->
      """WITH e AS (SELECT DISTINCT event_type AS seg, user_id FROM events),
         d AS (SELECT seg, count(*) AS n_exact FROM e GROUP BY seg),
         hh AS (SELECT DISTINCT seg, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM e),
         rk AS (SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rn FROM hh),
         sk AS (SELECT seg, list(h ORDER BY h) AS mins FROM rk WHERE rn <= 256 GROUP BY seg),
         pr AS (SELECT a.seg AS seg_a, b.seg AS seg_b, a.mins AS ma, b.mins AS mb
                FROM sk a JOIN sk b ON a.seg < b.seg),
         un AS (SELECT seg_a, seg_b, ma, mb,
                list_sort(list_distinct(list_concat(ma, mb))) AS u FROM pr),
         cc AS (SELECT seg_a, seg_b, u, least(256, len(u)) AS keff,
                len(list_filter(u[1:256], h -> list_contains(ma, h) AND list_contains(mb, h))) AS c
                FROM un),
         es AS (SELECT seg_a, seg_b, keff, c,
                CASE WHEN len(u) < 256 THEN len(u)
                     ELSE CAST(255 * 18446744073709551616::HUGEINT // u[256] AS BIGINT) END AS n_union_est
                FROM cc),
         ex AS (SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS n_int_exact
                FROM e a JOIN e b ON a.user_id = b.user_id AND a.seg < b.seg GROUP BY 1, 2)
         SELECT es.seg_a, es.seg_b,
           CAST(da.n_exact AS BIGINT) AS n_exact_a, CAST(db.n_exact AS BIGINT) AS n_exact_b,
           CAST(coalesce(ex.n_int_exact, 0) AS BIGINT) AS n_int_exact,
           CAST(es.n_union_est AS BIGINT) AS n_union_est,
           CAST(es.c::HUGEINT * es.n_union_est // es.keff AS BIGINT) AS n_int_est,
           CAST(10000 * es.c // es.keff AS BIGINT) AS jaccard_bp
         FROM es JOIN d da ON da.seg = es.seg_a JOIN d db ON db.seg = es.seg_b
         LEFT JOIN ex ON ex.seg_a = es.seg_a AND ex.seg_b = es.seg_b""",

    // Same one-step-corrected integer sqrt (exact s² ≤ n < (s+1)²
    // independent of libm) and truncating bp divisions as the Spark
    // side — every column integer end to end.
    "q186_mixture_weights" ->
      """WITH p AS (SELECT lang, count(*) AS n_docs,
                sum(len(string_split(text, ' '))) AS n_tokens
                FROM documents GROUP BY 1),
         c AS (SELECT lang, n_docs, n_tokens,
                CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0 FROM p),
         i AS (SELECT lang, n_docs, n_tokens,
                CASE WHEN (s0+1)*(s0+1) <= n_tokens THEN s0+1
                     WHEN s0*s0 > n_tokens THEN s0-1 ELSE s0 END AS isq FROM c),
         t AS (SELECT sum(n_tokens) AS tt, sum(isq) AS ti FROM i)
         SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(isq AS BIGINT) AS isqrt_tokens,
           CAST(10000 * n_tokens // tt AS BIGINT) AS share_bp,
           CAST(10000 * isq // ti AS BIGINT) AS weight_bp,
           CAST(10000 * isq // ti - 10000 * n_tokens // tt AS BIGINT) AS boost_bp
         FROM i, t""",

    // Composes the shared BM25 CTE chain (sparse leg, same top-20 as
    // q146) with q94's dense cosine ranking restricted to the vec_id-0
    // query, then the scaled-integer RRF combine — rank arithmetic all
    // BIGINT, same (score desc, id) tie-breaks as the Spark side.
    "q187_rrf_fusion" ->
      s"""WITH $bm25Cte,
         bm AS (SELECT doc_id, CAST(sum(term_bp) AS BIGINT) AS score_bp
                FROM sc GROUP BY 1 ORDER BY score_bp DESC, doc_id LIMIT 20),
         sp AS (SELECT doc_id, row_number() OVER (ORDER BY score_bp DESC, doc_id) AS rs FROM bm),
         dc AS (SELECT e.vec_id AS doc_id,
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
                FROM embeddings q JOIN embeddings e ON q.vec_id = 0 AND e.vec_id <> 0),
         dr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rd FROM dc),
         dn AS (SELECT doc_id, rd FROM dr WHERE rd <= 20),
         f AS (SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id,
               coalesce(rs, 0) AS rank_sparse, coalesce(rd, 0) AS rank_dense,
               coalesce(1000000000 // (60 + rs), 0) +
               coalesce(1000000000 // (60 + rd), 0) AS rrf_score
               FROM sp FULL JOIN dn ON sp.doc_id = dn.doc_id)
         SELECT doc_id, CAST(rank_sparse AS BIGINT) AS rank_sparse,
           CAST(rank_dense AS BIGINT) AS rank_dense,
           CAST(rrf_score AS BIGINT) AS rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
         FROM f""",

    // Buckets are the low 5 bits of the md5 hash (p = 32 is a power of
    // two, so unsigned % and signed pmod agree); top key per bucket by
    // (count desc, key asc) mirrors the struct-max on the Spark side.
    "q188_skew_audit" ->
      """WITH kc AS (SELECT user_id AS k, count(*) AS n,
                md5_number_upper(CAST(user_id AS VARCHAR)) % 32 AS bucket
                FROM events GROUP BY 1),
         r AS (SELECT *, row_number() OVER (PARTITION BY bucket
               ORDER BY n DESC, k ASC) AS rn FROM kc),
         tk AS (SELECT bucket, k AS top_key, n AS top_key_n FROM r WHERE rn = 1),
         pb AS (SELECT bucket, sum(n) AS n_rows, count(*) AS n_keys FROM kc GROUP BY 1),
         t AS (SELECT sum(n_rows) AS total FROM pb)
         SELECT CAST(pb.bucket AS BIGINT) AS bucket,
           CAST(pb.n_rows AS BIGINT) AS n_rows,
           CAST(pb.n_keys AS BIGINT) AS n_keys,
           CAST(tk.top_key AS BIGINT) AS top_key,
           CAST(tk.top_key_n AS BIGINT) AS top_key_n,
           CAST(10000 * pb.n_rows // t.total AS BIGINT) AS share_bp,
           CAST(10000 * 32 * pb.n_rows // t.total AS BIGINT) AS hot_bp
         FROM pb JOIN tk USING (bucket), t""",

    // Degree-oriented triangle enumeration: orient each co-purchase
    // edge by the (degree, id) tuple, wedge on the common source with
    // the out-edges tuple-ordered, close with one equality join —
    // the same three joins the Spark plan runs.
    "q190_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem WHERE l_orderkey % 8 = 0),
         e AS (SELECT a.it AS pa, b.it AS pb
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
         und AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1),
         o AS (SELECT un.u, un.v, dv.d AS dv
               FROM und un JOIN deg du ON du.u = un.u JOIN deg dv ON dv.u = un.v
               WHERE (du.d, un.u) < (dv.d, un.v)),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM o e1 JOIN o e2 ON e1.u = e2.u
                   AND (e1.dv, e1.v) < (e2.dv, e2.v)
                 JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
         nodes AS (SELECT a AS part FROM tri UNION ALL
                   SELECT b FROM tri UNION ALL SELECT c FROM tri),
         pn AS (SELECT part, count(*) AS n_triangles FROM nodes GROUP BY 1)
         SELECT CAST(pn.part AS BIGINT) AS part,
           CAST(pn.n_triangles AS BIGINT) AS n_triangles,
           CAST(deg.d AS BIGINT) AS degree
         FROM pn JOIN deg ON deg.u = pn.part
         ORDER BY n_triangles DESC, part ASC LIMIT 20""",

    // q190's enumeration; each triangle sheds its three edges in
    // canonical id order, left-join zero-fill, bounded histogram.
    "q309_edge_embeddedness" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem WHERE l_orderkey % 8 = 0),
         e AS (SELECT a.it AS pa, b.it AS pb
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
         und AS MATERIALIZED (
               SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1),
         o AS MATERIALIZED (SELECT un.u, un.v, dv.d AS dv
               FROM und un JOIN deg du ON du.u = un.u JOIN deg dv ON dv.u = un.v
               WHERE (du.d, un.u) < (dv.d, un.v)),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM o e1 JOIN o e2 ON e1.u = e2.u
                   AND (e1.dv, e1.v) < (e2.dv, e2.v)
                 JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
         te AS (SELECT least(a, b) AS pa, greatest(a, b) AS pb FROM tri
                UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
                UNION ALL SELECT least(b, c), greatest(b, c) FROM tri),
         sp AS (SELECT pa, pb, count(*) AS support FROM te GROUP BY 1, 2),
         pe AS (SELECT e.pa, e.pb, coalesce(sp.support, 0) AS support
                FROM e LEFT JOIN sp USING (pa, pb)),
         h AS (SELECT support, count(*) AS n_edges FROM pe GROUP BY 1),
         t AS (SELECT sum(n_edges) AS t FROM h)
         SELECT CAST(support AS BIGINT) AS support,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST((10000 * n_edges) // t.t AS BIGINT) AS share_bp
         FROM h, t""",

    // q190's orientation + wedge + closing chain, then per-node
    // rollup with cc = 20000·t // d(d−1) (null below degree 2) and the
    // global transitivity 60000·n_tri // Σd(d−1) in HUGEINT.
    "q274_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem WHERE l_orderkey % 8 = 0),
         e AS (SELECT a.it AS pa, b.it AS pb
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
         und AS MATERIALIZED (
               SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         deg AS MATERIALIZED (SELECT u, count(*) AS d FROM und GROUP BY 1),
         o AS MATERIALIZED (SELECT un.u, un.v, dv.d AS dv
               FROM und un JOIN deg du ON du.u = un.u JOIN deg dv ON dv.u = un.v
               WHERE (du.d, un.u) < (dv.d, un.v)),
         tri AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c
               FROM o e1 JOIN o e2 ON e1.u = e2.u
                 AND (e1.dv, e1.v) < (e2.dv, e2.v)
               JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
         pn AS (SELECT u, count(*) AS t FROM
               (SELECT a AS u FROM tri UNION ALL
                SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY 1),
         tot AS (SELECT (SELECT count(*) FROM tri) AS n_tri,
               (SELECT sum(CAST(d * (d - 1) AS HUGEINT)) FROM deg) AS wedges2),
         top AS (SELECT deg.u, deg.d, coalesce(pn.t, 0) AS t
               FROM deg LEFT JOIN pn ON pn.u = deg.u
               ORDER BY deg.d DESC, deg.u ASC LIMIT 20)
         SELECT CAST(top.u AS BIGINT) AS node, CAST(top.d AS BIGINT) AS degree,
           CAST(top.t AS BIGINT) AS n_triangles,
           CAST(CASE WHEN top.d < 2 THEN NULL
                ELSE 20000 * top.t // (top.d * (top.d - 1)) END AS BIGINT) AS cc_bp,
           CAST(CASE WHEN tot.wedges2 = 0 THEN NULL
                ELSE 60000 * tot.n_tri // tot.wedges2 END AS BIGINT) AS transitivity_bp
         FROM top, tot""",

    // Sliding 32-token windows at stride 16: k_max = ceil(max(n-32,0)/16)
    // via integer arithmetic; char_start = joined length of the tokens
    // before the window plus the separator; the chunk text itself is
    // compared verbatim.
    "q191_chunk_windows" ->
      """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS ts
                     FROM documents WHERE length(text) > 0),
         ks AS (SELECT doc_id, ts,
                unnest(range(0, (GREATEST(len(ts) - 32, 0) + 15) // 16 + 1)) AS chunk_id
                FROM tk)
         SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 16 AS BIGINT) AS start_tok,
           CAST(CASE WHEN chunk_id = 0 THEN 0 ELSE
             length(array_to_string(list_slice(ts, 1, chunk_id * 16), ' ')) + 1
             END AS BIGINT) AS char_start,
           array_to_string(list_slice(ts, chunk_id * 16 + 1, chunk_id * 16 + 32), ' ') AS chunk,
           CAST(LEAST(len(ts) - chunk_id * 16, 32) AS BIGINT) AS n_tok
         FROM ks""",

    // Recall@10: the q60 truth leg verbatim (nested CTE) against the
    // q61 LSH leg (AnnOracleSql) — per-query hit count over the two
    // O(queries·k) lists, recall in exact basis points.
    "q192_ann_recall" ->
      s"""WITH truth AS ($q60OracleSql),
         approx AS (${AnnOracleSql.all("q61_ann_lsh")})
         SELECT t.query_id, count(*) AS n_truth,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(10000 * sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             // count(*) AS BIGINT) AS recall_bp
         FROM truth t LEFT JOIN
           (SELECT DISTINCT query_id, neighbor_id FROM approx) a
           ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         GROUP BY t.query_id""",

    // Stupid-backoff trigram LM: counts from even docs, odd docs scored;
    // the division/multiply order mirrors trigramLmScore exactly
    // (c3/DOUBLE(c2), 0.4·(c2/DOUBLE(c1)), 0.16·((c1+1)/DOUBLE(N+V)));
    // per-position floor(-ln(p)·10⁴+½) then integer floor-mean (q160).
    "q193_trigram_lm" ->
      """WITH tr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE doc_id % 2 = 0),
         sc AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id % 2 = 1),
         c3 AS (SELECT ts[i] AS w1, ts[i+1] AS w2, ts[i+2] AS w3, count(*) AS c3
                FROM (SELECT ts, unnest(range(1, len(ts) - 1)) AS i FROM tr) GROUP BY 1, 2, 3),
         c2 AS (SELECT ts[i] AS w1, ts[i+1] AS w2, count(*) AS c2
                FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM tr) GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(ts) AS w1 FROM tr) GROUP BY 1),
         tot AS (SELECT sum(c1) AS n_total, count(*) AS v_vocab FROM c1),
         st AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, ts[i+2] AS w3
                FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM sc)),
         j AS (SELECT st.doc_id,
               CASE WHEN c3.c3 IS NOT NULL THEN c3.c3 / CAST(p2.c2 AS DOUBLE)
                 WHEN n2.c2 IS NOT NULL THEN CAST(0.4 AS DOUBLE) * (n2.c2 / CAST(u2.c1 AS DOUBLE))
                 ELSE CAST(0.16 AS DOUBLE) * ((COALESCE(u3.c1, 0) + 1) / CAST(t.n_total + t.v_vocab AS DOUBLE))
               END AS p
               FROM st
               LEFT JOIN c3 ON c3.w1 = st.w1 AND c3.w2 = st.w2 AND c3.w3 = st.w3
               LEFT JOIN c2 p2 ON p2.w1 = st.w1 AND p2.w2 = st.w2
               LEFT JOIN c2 n2 ON n2.w1 = st.w2 AND n2.w2 = st.w3
               LEFT JOIN c1 u2 ON u2.w1 = st.w2
               LEFT JOIN c1 u3 ON u3.w1 = st.w3, tot t)
         SELECT doc_id, count(*) AS n_trigrams,
           CAST(floor(sum(CAST(floor(-ln(p) * 10000 + 0.5) AS BIGINT)) / count(*)) AS BIGINT)
             AS mean_surprisal_bp
         FROM j GROUP BY 1""",

    // Suffix semantics re-derived: the host's ancestor chain joined
    // against the blocklist VALUES; longest match then lexicographically
    // last (the struct-max tie-break on the Spark side).
    "q194_domain_blocklist" ->
      s"""WITH ${UrlCte},
         h AS (SELECT doc_id,
               regexp_replace(lower(regexp_extract(url, '^https?://([^/?]+)', 1)), ':(443|80)$$', '') AS host
               FROM u),
         bl AS (SELECT * FROM (VALUES ('src3.com'), ('src12.net'), ('www.src1.org'), ('rc3.com')) AS t(sfx)),
         chain AS (SELECT doc_id, host,
               array_to_string(list_slice(string_split(host, '.'), k, len(string_split(host, '.'))), '.') AS sfx
               FROM (SELECT doc_id, host, unnest(range(1, len(string_split(host, '.')) + 1)) AS k FROM h)),
         hit AS (SELECT doc_id, sfx,
               row_number() OVER (PARTITION BY doc_id ORDER BY length(sfx) DESC, sfx DESC) AS rn
               FROM chain JOIN bl USING (sfx))
         SELECT h.doc_id, h.host, m.sfx AS matched_suffix,
           CAST(CASE WHEN m.sfx IS NOT NULL THEN 1 ELSE 0 END AS INT) AS blocked
         FROM h LEFT JOIN (SELECT doc_id, sfx FROM hit WHERE rn = 1) m USING (doc_id)""",

    // Integer-grid centroids (2¹⁴ quantization, exact elementwise sums),
    // one double division per dim + the float cast, then the q60
    // list_cosine_similarity convention and Euclidean list_distance.
    "q195_embedding_drift" ->
      s"""WITH q AS (SELECT label, vec_id % 2 = 0 AS is_old,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT)) AS qe
             FROM embeddings),
         ex AS (SELECT label, is_old, i, qe[i] AS v
                FROM (SELECT label, is_old, qe, unnest(range(1, len(qe) + 1)) AS i FROM q)),
         sm AS (SELECT label, is_old, i, sum(v) AS sv FROM ex GROUP BY 1, 2, 3),
         cnt AS (SELECT label, is_old, count(*) AS n FROM q GROUP BY 1, 2),
         m AS (SELECT sm.label, sm.is_old, cnt.n,
               list(CAST(CAST(CAST(sv AS DOUBLE) / CAST(cnt.n AS DOUBLE) / 16384 AS FLOAT) AS DOUBLE)
                    ORDER BY i) AS mean
               FROM sm JOIN cnt ON cnt.label = sm.label AND cnt.is_old = sm.is_old
               GROUP BY 1, 2, 3)
         SELECT o.label, o.n AS n_old, nw.n AS n_new,
           ${BP("list_cosine_similarity(o.mean, nw.mean)")} AS cos_bp,
           ${BP("list_distance(o.mean, nw.mean)")} AS shift_bp
         FROM m o JOIN m nw ON o.label = nw.label AND o.is_old AND NOT nw.is_old""",

    // Exact join-output cardinality from the key-count tables alone:
    // Σ n_a(k)·n_b(k), top-10 contributors + the ALL total row.
    "q196_join_fanout" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
         p AS (SELECT key, n AS n_a, n AS n_b, n * n AS n_pairs FROM c),
         t AS (SELECT sum(n_pairs) AS total FROM p),
         top AS (SELECT CAST(key AS VARCHAR) AS key, n_a, n_b, n_pairs,
                 CAST(10000 * n_pairs // t.total AS BIGINT) AS share_bp
                 FROM p, t ORDER BY n_pairs DESC, CAST(key AS VARCHAR) ASC LIMIT 10)
         SELECT key, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_pairs AS BIGINT) AS n_pairs, share_bp FROM top
         UNION ALL
         SELECT 'ALL', NULL, NULL, CAST(total AS BIGINT), CAST(10000 AS BIGINT) FROM t""",

    // Per-(attr, value) share + entropy term floor(-ln(p)·p·10⁶+½)
    // (micro-nats); the ALL row sums the integer terms exactly.
    "q197_label_balance" ->
      """WITH st AS (SELECT 'lang' AS attr, lang AS value FROM documents
                     UNION ALL SELECT 'source', source FROM documents),
         c AS (SELECT attr, value, count(*) AS n FROM st GROUP BY 1, 2),
         t AS (SELECT attr, sum(n) AS nt FROM c GROUP BY 1),
         r AS (SELECT c.attr, c.value, CAST(c.n AS BIGINT) AS n,
               CAST(10000 * c.n // t.nt AS BIGINT) AS share_bp,
               CAST(floor(-ln(CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
                 * (CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                 AS h_term_unat
               FROM c JOIN t USING (attr))
         SELECT * FROM r
         UNION ALL
         SELECT attr, 'ALL', CAST(sum(n) AS BIGINT), CAST(10000 AS BIGINT),
           CAST(sum(h_term_unat) AS BIGINT)
         FROM r GROUP BY attr""",

    // Relational phrase alignment: token positions (0-based) join the
    // (phrase, j, term) dictionary; anchor = pos - j; an anchor with
    // all m distinct slots is an occurrence. Mirrors phraseSearch.
    "q198_phrase_search" ->
      """WITH ph AS (SELECT * FROM (VALUES
             ('table hash'), ('order fast'), ('key agg row'), ('order order'))
             AS t(phrase)),
         terms AS (SELECT phrase, CAST(j - 1 AS BIGINT) AS j, w AS tok,
               CAST(len(string_split(phrase, ' ')) AS BIGINT) AS m
               FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
                     unnest(range(1, len(string_split(phrase, ' ')) + 1)) AS j FROM ph)),
         pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS tok
               FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
                     FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))),
         starts AS (SELECT phrase, doc_id, m, pos - j AS start,
               count(DISTINCT j) AS nj
               FROM pos JOIN terms USING (tok)
               WHERE pos - j >= 0
               GROUP BY 1, 2, 3, 4)
         SELECT phrase, doc_id, count(*) AS n_occ,
           CAST(min(start) AS BIGINT) AS first_pos
         FROM starts WHERE nj = m GROUP BY 1, 2""",

    // Highest-random-weight assignment under both node sets: per key,
    // rank nodes by (SIGNED md5(key#node) DESC, node DESC) — the
    // two's-complement reinterpretation matches the Spark struct-max.
    "q199_rendezvous_reshard" ->
      """WITH ks AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events),
         oldn AS (SELECT 'n' || CAST(i AS VARCHAR) AS node FROM range(0, 8) t(i)),
         newn AS (SELECT 'n' || CAST(i AS VARCHAR) AS node FROM range(0, 10) t(i)),
         ho AS (SELECT k, node,
               row_number() OVER (PARTITION BY k ORDER BY
                 CAST(CASE WHEN md5_number_upper(k || '#' || node) >= 9223372036854775808::HUGEINT
                   THEN md5_number_upper(k || '#' || node)::HUGEINT - 18446744073709551616::HUGEINT
                   ELSE md5_number_upper(k || '#' || node)::HUGEINT END AS BIGINT) DESC,
                 node DESC) AS rn
               FROM ks CROSS JOIN oldn),
         hn AS (SELECT k, node,
               row_number() OVER (PARTITION BY k ORDER BY
                 CAST(CASE WHEN md5_number_upper(k || '#' || node) >= 9223372036854775808::HUGEINT
                   THEN md5_number_upper(k || '#' || node)::HUGEINT - 18446744073709551616::HUGEINT
                   ELSE md5_number_upper(k || '#' || node)::HUGEINT END AS BIGINT) DESC,
                 node DESC) AS rn
               FROM ks CROSS JOIN newn),
         a AS (SELECT o.k, o.node AS node_old, n.node AS node_new
               FROM (SELECT k, node FROM ho WHERE rn = 1) o
               JOIN (SELECT k, node FROM hn WHERE rn = 1) n USING (k)),
         m AS (SELECT node_old, node_new, count(*) AS n_keys FROM a GROUP BY 1, 2),
         t AS (SELECT sum(n_keys) AS total FROM m)
         SELECT node_old, node_new, CAST(n_keys AS BIGINT) AS n_keys,
           CAST(10000 * n_keys // t.total AS BIGINT) AS share_bp,
           CAST(CASE WHEN node_old <> node_new THEN 1 ELSE 0 END AS INT) AS moved
         FROM m, t""",

    // $25 cents-bands, Laplace-smoothed shares over the union bin set,
    // per-bin floor((p-q)·ln(p/q)·10⁶+½), ALL row (bin -1) = exact sum.
    // KS over the exact cent lattice: cumulative CDF gap as HUGEINT
    // cross-products, argmax bin with smallest-bin tie-break, the
    // 1.358·sqrt critical value as the only double.
    "q283_ks_test" ->
      s"""WITH b AS (SELECT ${C("value")} AS bin, event_id % 2 = 0 AS is_ref
               FROM events),
         pb AS (SELECT bin, sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur FROM b GROUP BY 1),
         cm AS (SELECT bin,
                sum(n_ref) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cr,
                sum(n_cur) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cc FROM pb),
         t AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc FROM pb),
         g AS (SELECT bin, abs(CAST(cr AS HUGEINT) * t.nc
                 - CAST(cc AS HUGEINT) * t.nr) AS gap FROM cm, t
               ORDER BY gap DESC, bin ASC LIMIT 1)
         SELECT CAST(t.nr AS BIGINT) AS n_ref, CAST(t.nc AS BIGINT) AS n_cur,
           CAST(g.bin AS BIGINT) AS argmax_bin,
           CAST(CASE WHEN t.nr = 0 OR t.nc = 0 THEN NULL
                ELSE 10000 * g.gap // (CAST(t.nr AS HUGEINT) * t.nc)
                END AS BIGINT) AS ks_bp,
           CAST(CASE WHEN t.nr = 0 OR t.nc = 0 THEN NULL
                ELSE floor(13580 * sqrt(CAST(t.nr + t.nc AS DOUBLE)
                  / (CAST(t.nr AS DOUBLE) * t.nc)) + 0.5) END AS BIGINT)
             AS crit_bp,
           CAST(CASE WHEN t.nr = 0 OR t.nc = 0 THEN NULL
                WHEN 10000 * g.gap // (CAST(t.nr AS HUGEINT) * t.nc)
                  > floor(13580 * sqrt(CAST(t.nr + t.nc AS DOUBLE)
                    / (CAST(t.nr AS DOUBLE) * t.nc)) + 0.5)
                THEN 1 ELSE 0 END AS INT) AS is_drifted
         FROM g, t""",

    // Spearman on 2×mid-ranks over the two bounded value lattices:
    // r2 = 2·cumBefore + cnt + 1 per lattice point, HUGEINT moment
    // sums, one boundary rounding floor(10⁴·num/√(dx·dy) + ½) in IEEE
    // doubles (the q283 crit_bp convention).
    "q286_spearman" ->
      s"""WITH pr AS (SELECT ${C("value")} AS xv,
                CAST(json_extract(props, '$$.k') AS BIGINT) AS yv,
                count(*) AS n_xy
              FROM events
              WHERE value IS NOT NULL
                AND json_extract(props, '$$.k') IS NOT NULL
              GROUP BY 1, 2),
         rx AS (SELECT xv, 2 * (sum(cnt) OVER (ORDER BY xv ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                  + cnt + 1 AS r2x
                FROM (SELECT xv, sum(n_xy) AS cnt FROM pr GROUP BY 1)),
         ry AS (SELECT yv, 2 * (sum(cnt) OVER (ORDER BY yv ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                  + cnt + 1 AS r2y
                FROM (SELECT yv, sum(n_xy) AS cnt FROM pr GROUP BY 1)),
         m AS (SELECT sum(n_xy) AS n,
                count(DISTINCT pr.xv) AS n_x, count(DISTINCT pr.yv) AS n_y,
                sum(CAST(n_xy AS HUGEINT) * r2x) AS sx,
                sum(CAST(n_xy AS HUGEINT) * r2y) AS sy,
                sum(CAST(n_xy AS HUGEINT) * r2x * r2x) AS sxx,
                sum(CAST(n_xy AS HUGEINT) * r2y * r2y) AS syy,
                sum(CAST(n_xy AS HUGEINT) * r2x * r2y) AS sxy
               FROM pr JOIN rx USING (xv) JOIN ry USING (yv)),
         d AS (SELECT n, n_x, n_y,
                n * sxy - sx * sy AS num,
                n * sxx - sx * sx AS dx,
                n * syy - sy * sy AS dy FROM m)
         SELECT CAST(n AS BIGINT) AS n, CAST(n_x AS BIGINT) AS n_x,
           CAST(n_y AS BIGINT) AS n_y,
           CAST(CASE WHEN dx = 0 OR dy = 0 THEN NULL
                ELSE floor(10000 * CAST(num AS DOUBLE)
                  / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)))
                  + 0.5) END AS BIGINT) AS rho_bp
         FROM d""",

    // Mann–Whitney on the same lattice mid-ranks: 2×rank sums and the
    // tie-corrected variance rebuilt as exact HUGEINTs, z assembled in
    // the pinned double order (num/2) / sqrt(na*nb*cube/den12).
    "q287_mann_whitney" ->
      s"""WITH pb AS (SELECT ${C("value")} AS v,
                sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS nb
              FROM events
              WHERE event_type = 'purchase' AND value IS NOT NULL
              GROUP BY 1),
         rk AS (SELECT v, na, nb, na + nb AS t,
                2 * (sum(na + nb) OVER (ORDER BY v ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (na + nb)) + (na + nb) + 1 AS r2 FROM pb),
         m AS (SELECT sum(na) AS n_a, sum(nb) AS n_b,
                sum(CAST(na AS HUGEINT) * r2) AS ra2,
                sum(CAST(t AS HUGEINT) * t * t - t) AS tie3 FROM rk),
         d AS (SELECT n_a, n_b,
                ra2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
                ra2 - CAST(n_a AS HUGEINT) * (n_a + 1)
                  - CAST(n_a AS HUGEINT) * n_b AS num,
                CAST(n_a + n_b AS HUGEINT) * (n_a + n_b) * (n_a + n_b)
                  - (n_a + n_b) - tie3 AS cube,
                12 * CAST(n_a + n_b AS HUGEINT) * (n_a + n_b - 1) AS den12
               FROM m)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(u2 // 2 AS BIGINT) AS u_a,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE (10000 * num) // (CAST(n_a AS HUGEINT) * n_b)
                END AS BIGINT) AS rank_biserial_bp,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 OR cube = 0 THEN NULL
                ELSE floor((CAST(num AS DOUBLE) / 2)
                  / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * CAST(cube AS DOUBLE) / CAST(den12 AS DOUBLE))
                  * 1000 + 0.5) END AS BIGINT) AS z_milli,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 OR cube = 0 THEN NULL
                WHEN abs(floor((CAST(num AS DOUBLE) / 2)
                  / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * CAST(cube AS DOUBLE) / CAST(den12 AS DOUBLE))
                  * 1000 + 0.5)) > 1960 THEN 1 ELSE 0 END AS INT)
             AS is_significant
         FROM d""",

    "q200_psi_drift" ->
      s"""WITH b AS (SELECT ${C("value")} // 2500 AS bin, event_id % 2 = 0 AS is_ref FROM events),
         pb AS (SELECT bin, sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur FROM b GROUP BY 1),
         t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc, count(*) AS nb FROM pb),
         r AS (SELECT bin, n_ref, n_cur,
               CAST(floor((CAST(n_ref + 1 AS DOUBLE) / CAST(t.tr + t.nb AS DOUBLE)
                         - CAST(n_cur + 1 AS DOUBLE) / CAST(t.tc + t.nb AS DOUBLE))
                 * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(t.tr + t.nb AS DOUBLE))
                    / (CAST(n_cur + 1 AS DOUBLE) / CAST(t.tc + t.nb AS DOUBLE)))
                 * 1000000 + 0.5) AS BIGINT) AS psi_term_u
               FROM pb, t)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur, psi_term_u FROM r
         UNION ALL
         SELECT -1, CAST(sum(n_ref) AS BIGINT), CAST(sum(n_cur) AS BIGINT),
           CAST(sum(psi_term_u) AS BIGINT) FROM r""",

    // Graded relevance from the truth ranking; per-position DCG terms
    // floor(rel·ln(2)/ln(r+1)·10⁶+½) summed exactly; integer MRR/NDCG.
    "q201_ranking_metrics" ->
      s"""WITH truth AS ($q60OracleSql),
         approx AS (${AnnOracleSql.all("q61_ann_lsh")}),
         km AS (SELECT query_id, max(rank) AS kmax FROM truth GROUP BY 1),
         rel AS (SELECT t.query_id, t.neighbor_id,
                 km.kmax + 1 - t.rank AS rel, t.rank
                 FROM truth t JOIN km USING (query_id)),
         hits AS (SELECT a.query_id, a.rank AS a_rank, rel.rel
                  FROM approx a JOIN rel ON rel.query_id = a.query_id
                    AND rel.neighbor_id = a.neighbor_id),
         dcg AS (SELECT query_id,
                 sum(CAST(floor(CAST(rel AS DOUBLE) * ln(2) / ln(CAST(a_rank AS DOUBLE) + 1.0)
                   * 1000000 + 0.5) AS BIGINT)) AS dcg_u,
                 min(a_rank) AS first_rank
                 FROM hits GROUP BY 1),
         idcg AS (SELECT query_id,
                 sum(CAST(floor(CAST(rel AS DOUBLE) * ln(2) / ln(CAST(rank AS DOUBLE) + 1.0)
                   * 1000000 + 0.5) AS BIGINT)) AS idcg_u
                 FROM rel GROUP BY 1)
         SELECT i.query_id,
           CAST(coalesce(d.first_rank, 0) AS BIGINT) AS first_hit_rank,
           CAST(coalesce(1000000 // d.first_rank, 0) AS BIGINT) AS mrr_u,
           CAST(coalesce(d.dcg_u, 0) AS BIGINT) AS dcg_u,
           CAST(i.idcg_u AS BIGINT) AS idcg_u,
           CAST(coalesce(10000 * d.dcg_u // i.idcg_u, 0) AS BIGINT) AS ndcg_bp
         FROM idcg i LEFT JOIN dcg d USING (query_id)""",

    // Integer plan: budget = total tokens // 2, ideal = target·budget
    // // 10⁴, feasible = min(supply, ideal), rate/shortfall exact.
    "q202_rebalance_plan" ->
      """WITH s AS (SELECT lang AS grp, count(*) AS n_docs,
             sum(len(string_split(text, ' '))) AS n_tokens
             FROM documents GROUP BY 1),
         t AS (SELECT sum(n_tokens) AS tt FROM s),
         tg AS (SELECT * FROM (VALUES ('en', 2000), ('zh', 2000), ('fr', 2000),
                ('es', 2000), ('de', 2000)) AS v(grp, target_bp))
         SELECT s.grp, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(target_bp AS BIGINT) AS target_bp,
           CAST(target_bp * (t.tt // 2) // 10000 AS BIGINT) AS ideal_tokens,
           CAST(LEAST(n_tokens, target_bp * (t.tt // 2) // 10000) AS BIGINT) AS feasible_tokens,
           CAST(10000 * LEAST(n_tokens, target_bp * (t.tt // 2) // 10000) // n_tokens AS BIGINT) AS rate_bp,
           CAST(GREATEST(target_bp * (t.tt // 2) // 10000 - n_tokens, 0) AS BIGINT) AS shortfall_tokens
         FROM s JOIN tg USING (grp), t""",

    // First digit of the cents string (= first significant digit of the
    // price); observed share vs floor(ln(1+1/d)/ln(10)·10⁶+½); digit-0
    // ALL row sums the absolute deviations.
    "q203_benford" ->
      s"""WITH d AS (SELECT CAST(substr(CAST(${C("l_extendedprice")} AS VARCHAR), 1, 1) AS BIGINT) AS digit
             FROM lineitem WHERE ${C("l_extendedprice")} > 0),
         c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         t AS (SELECT sum(n) AS nt FROM c),
         r AS (SELECT digit, n, 1000000 * n // t.nt AS share_u,
               CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000 + 0.5) AS BIGINT) AS benford_u
               FROM c, t)
         SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
           CAST(share_u AS BIGINT) AS share_u, benford_u,
           CAST(abs(share_u - benford_u) AS BIGINT) AS dev_u FROM r
         UNION ALL
         SELECT 0, CAST(sum(n) AS BIGINT), 1000000, 1000000,
           CAST(sum(abs(share_u - benford_u)) AS BIGINT) FROM r""",

    // Exact integer OLS: HUGEINT sufficient statistics, slope as
    // sign(num)·(10⁶·|num| // den) — the nonnegative magnitude makes
    // the result independent of either engine's negative-division
    // convention (both happen to truncate).
    "q204_trend_regression" ->
      s"""WITH p AS (SELECT event_type, epoch_us(ts) // 86400000000 AS x,
             ${C("value")} AS y FROM events),
         s AS (SELECT event_type, count(*) AS n,
               sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
               sum((x * y)::HUGEINT) AS sxy, sum((x * x)::HUGEINT) AS sxx
               FROM p GROUP BY 1),
         f AS (SELECT event_type, n,
               n::HUGEINT * sxy - sx * sy AS num,
               n::HUGEINT * sxx - sx * sx AS den, sy
               FROM s)
         SELECT event_type, CAST(n AS BIGINT) AS n,
           CASE WHEN den <= 0 THEN NULL
                WHEN num < 0 THEN -CAST(1000000::HUGEINT * (-num) // den AS BIGINT)
                ELSE CAST(1000000::HUGEINT * num // den AS BIGINT) END AS slope_u,
           CAST(sy // n::HUGEINT AS BIGINT) AS mean_cents
         FROM f""",

    // Nearest-rank weighted quantiles: cumulative token weight in
    // (value, id) order; smallest v with den·cum ≥ num·total.
    "q205_weighted_median" ->
      """WITH b AS (SELECT lang AS grp, n_chars AS v,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS wt, doc_id AS rid
             FROM documents),
         c AS (SELECT grp, v, wt,
               sum(wt) OVER (PARTITION BY grp ORDER BY v, rid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(wt) OVER (PARTITION BY grp) AS total
               FROM b)
         SELECT grp, CAST(max(total) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN cum * 2 >= total THEN v END) AS BIGINT) AS w_median,
           CAST(min(CASE WHEN cum * 10 >= total * 9 THEN v END) AS BIGINT) AS w_p90
         FROM c GROUP BY 1""",

    // Seeded Laplace: u = low-53-bits(md5('dp-epoch-1:'||grp))/2⁵³
    // (power-of-two modulus — signed and unsigned reads agree),
    // x = -sign(½-u)·ln(1-2|u-½|)/ε (positive noise on the low uniform
    // half, matching dpCountRelease) with the shared floor(x+½) rounding.
    "q206_dp_counts" ->
      """WITH c AS (SELECT lang AS grp, count(*) AS n_true FROM documents GROUP BY 1),
         u AS (SELECT grp, n_true,
               CAST(md5_number_upper('dp-epoch-1:' || grp) % 9007199254740992 AS DOUBLE)
                 / 9007199254740992 AS u FROM c),
         x AS (SELECT grp, n_true, u - 0.5 AS ctr,
               -ln(1.0 - 2.0 * abs(u - 0.5)) / (1000.0 / 1000.0) AS mag FROM u),
         n AS (SELECT grp, n_true,
               CASE WHEN ctr < 0 THEN mag ELSE -mag END AS noise FROM x)
         SELECT grp, CAST(n_true AS BIGINT) AS n_true,
           CAST(floor(noise * 1000.0 + 0.5) AS BIGINT) AS noise_milli,
           CAST(n_true + CAST(floor(noise + 0.5) AS BIGINT) AS BIGINT) AS released_n,
           CAST(1000 AS BIGINT) AS eps_milli
         FROM n""",

    // Both tables sampled independently by the same md5-mod-8 predicate
    // on the join key; the forced-zero orphan count is the proof.
    "q207_correlated_sample" ->
      """WITH so AS (SELECT o_orderkey FROM orders
             WHERE md5_number_upper(CAST(o_orderkey AS VARCHAR)) % 8 = 0),
         sl AS (SELECT l_orderkey FROM lineitem
             WHERE md5_number_upper(CAST(l_orderkey AS VARCHAR)) % 8 = 0)
         SELECT (SELECT count(*) FROM so) AS orders_sampled,
           (SELECT count(*) FROM sl) AS lineitem_sampled,
           (SELECT count(*) FROM sl JOIN so ON l_orderkey = o_orderkey) AS joined_rows,
           (SELECT count(*) FROM sl ANTI JOIN so ON l_orderkey = o_orderkey) AS orphan_lineitems""",

    // Poisson(1) weights from seeded md5 low-53 bits vs the literal
    // cumulative thresholds; replicate means and their variance are
    // exact integer arithmetic; one sqrt at the boundary.
    "q208_bootstrap_ci" ->
      s"""WITH p AS (SELECT event_type AS grp, ${C("value")} AS y,
               md5_number_upper('boot-epoch-1:' || CAST(event_id AS VARCHAR)) AS h FROM events),
         e AS (SELECT grp, y, h, unnest(range(0, 32)) AS bi FROM p),
         sd AS (SELECT grp, y, bi,
               CAST((h::HUGEINT + bi::HUGEINT * 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS seed
               FROM e),
         ${Mix64Ctes("bx", "grp, y, bi", "sd", "seed")},
         uu AS (SELECT grp, y, bi,
               CAST((xor(z, z >> 31) & 9007199254740991) AS DOUBLE) / 9007199254740992 AS u FROM bx5),
         w AS (SELECT grp, y, bi,
               CASE WHEN u < 0.36787944117144233 THEN 0
                    WHEN u < 0.7357588823428847 THEN 1
                    WHEN u < 0.9196986029286058 THEN 2
                    WHEN u < 0.9810118431238463 THEN 3
                    WHEN u < 0.9963401531726563 THEN 4
                    WHEN u < 0.9994058151824183 THEN 5
                    WHEN u < 0.999916758850712 THEN 6
                    WHEN u < 0.9999897508033253 THEN 7
                    WHEN u < 0.999998874797402 THEN 8
                    ELSE 9 END AS w FROM uu),
         reps AS (SELECT grp, bi, sum(w::HUGEINT) AS sw, sum((w * y)::HUGEINT) AS swy
                  FROM w GROUP BY 1, 2),
         m AS (SELECT grp, swy // sw AS m FROM reps WHERE sw > 0),
         st AS (SELECT grp, count(*) AS b_eff, sum(m) AS sm, sum(m * m) AS smm
                FROM m GROUP BY 1),
         tr AS (SELECT event_type AS grp, count(*) AS n,
                sum(${C("value")}::HUGEINT) // count(*) AS mean_cents
                FROM events GROUP BY 1)
         SELECT tr.grp, CAST(n AS BIGINT) AS n, CAST(mean_cents AS BIGINT) AS mean_cents,
           CAST(b_eff AS BIGINT) AS b_eff,
           CAST(floor(sqrt(CAST(b_eff * smm - sm * sm AS DOUBLE)
             / CAST(b_eff * b_eff AS DOUBLE)) * 1000.0) AS BIGINT) AS std_milli
         FROM tr JOIN st ON st.grp = tr.grp""",

    // Unit-level conversion flags first (events→users), then the
    // pooled two-proportion z in the identical expression order.
    "q209_ab_test" ->
      s"""WITH u AS (SELECT user_id,
             CAST(max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS arm_,
             max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
             FROM events GROUP BY 1),
         ar AS (SELECT arm_, count(*) AS n, sum(conv) AS k FROM u GROUP BY 1),
         j AS (SELECT a.n AS n_a, a.k AS conv_a, b.n AS n_b, b.k AS conv_b
               FROM (SELECT n, k FROM ar WHERE arm_ = 0) a,
                    (SELECT n, k FROM ar WHERE arm_ = 1) b)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           ${BP("CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)")} AS rate_a_bp,
           ${BP("CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)")} AS rate_b_bp,
           CAST(floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             * 1000.0 + 0.5) AS BIGINT) AS z_milli
         FROM j""",

    // One conditional-aggregation pass: features strictly ≤ cutoff,
    // label strictly inside (cutoff, cutoff+7d] — no self-join to leak.
    "q210_label_window" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type, value FROM events),
         g AS (SELECT user_id,
               sum(CASE WHEN us <= 1705276800000000 THEN 1 ELSE 0 END) AS n_events_past,
               sum(CASE WHEN us <= 1705276800000000 THEN ${C("value")} ELSE 0 END) AS sum_value_past_cents,
               max(CASE WHEN us <= 1705276800000000 THEN us END) AS last_seen_us,
               sum(CASE WHEN us > 1705276800000000 AND us <= 1705881600000000
                    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS n_future
               FROM e GROUP BY 1)
         SELECT user_id, CAST(n_events_past AS BIGINT) AS n_events_past,
           CAST(sum_value_past_cents AS BIGINT) AS sum_value_past_cents,
           CAST(last_seen_us AS BIGINT) AS last_seen_us,
           CAST(CASE WHEN n_future > 0 THEN 1 ELSE 0 END AS INT) AS label
         FROM g WHERE n_events_past > 0""",

    // One row per declared FK edge: child mass, null FKs, anti-join
    // orphans, parent mass, duplicate parent keys.
    "q211_fk_audit" -> Seq(
      ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .map { case (name, c, fk, p, pk) =>
        s"""SELECT '$name' AS relation,
           (SELECT count(*) FROM $c) AS child_rows,
           (SELECT count(*) FROM $c WHERE $fk IS NULL) AS null_fk_rows,
           (SELECT count(*) FROM $c WHERE $fk IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM $p WHERE $p.$pk = $c.$fk)) AS orphan_rows,
           (SELECT count(*) FROM $p) AS parent_rows,
           (SELECT count(*) FROM (SELECT $pk FROM $p GROUP BY 1
              HAVING count(*) > 1)) AS dup_parent_keys"""
      }.mkString("\nUNION ALL\n"),

    // LOO: (S_c − yᵢ)/(n_c − 1) in exact milli fixed point; smoothing
    // folds the idiv'd global-mean constant in with pseudo-count m=10.
    "q212_target_encoding" ->
      s"""WITH e AS (SELECT event_id AS row_id, event_type, ${C("value")} AS y FROM events),
         c AS (SELECT event_type, sum(y) AS s_c, count(*) AS n_c FROM e GROUP BY 1),
         g AS (SELECT 1000 * sum(y) // count(*) AS gmean_milli FROM e)
         SELECT row_id, e.event_type, CAST(y AS BIGINT) AS y_cents,
           CASE WHEN n_c > 1
             THEN CAST(1000 * (s_c - y) // (n_c - 1) AS BIGINT) END AS enc_loo_milli,
           CAST((1000 * (s_c - y) + 10 * g.gmean_milli) // (n_c - 1 + 10) AS BIGINT)
             AS enc_smooth_milli
         FROM e JOIN c USING (event_type), g""",

    // Signed hashing trick: bucket = md5(tok) mod 64, sign = bit 6 via
    // mod 128 (power-of-two moduli — signed/unsigned reads agree).
    "q213_feature_hash" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         hb AS (SELECT doc_id,
               md5_number_upper(tok) % 64 AS bucket,
               CASE WHEN md5_number_upper(tok) % 128 >= 64 THEN 1 ELSE -1 END AS sgn
               FROM tk WHERE tok <> '')
         SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(sum(sgn) AS BIGINT) AS weight
         FROM hb GROUP BY 1, 2 HAVING sum(sgn) <> 0""",

    // Nearest-rank percentiles both sides; the reference grid keeps
    // max value per bp, and the map picks the largest grid bp ≤ r_bp.
    "q214_quantile_map" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rank,
             count(*) OVER (PARTITION BY lang) AS n
             FROM documents),
         p AS (SELECT doc_id, lang, n_chars,
               10000 * (rank - 1) // GREATEST(n - 1, 1) AS r_bp FROM r),
         grid AS (SELECT r_bp AS g_bp, max(n_chars) AS rv
                  FROM p WHERE lang = 'en' GROUP BY 1),
         m AS (SELECT p.doc_id, p.lang, p.n_chars, p.r_bp,
               max_by(grid.rv, grid.g_bp) AS mapped_chars
               FROM p JOIN grid ON grid.g_bp <= p.r_bp
               GROUP BY 1, 2, 3, 4)
         SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(r_bp AS BIGINT) AS r_bp,
           CAST(mapped_chars AS BIGINT) AS mapped_chars
         FROM m""",

    // q31's session CTEs rolled up per user; recency against the
    // feed's own max timestamp (reproducible, never wall-clock).
    "q215_session_features" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
         l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
         ss AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
         sess AS (SELECT user_id, session_idx, min(ts_us) AS s0, max(ts_us) AS s1,
                  count(*) AS ne FROM ss GROUP BY 1, 2),
         h AS (SELECT max(ts_us) AS feed_max_us FROM e)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(ne) AS BIGINT) AS n_events,
           CAST(sum(s1 - s0) // count(*) AS BIGINT) AS mean_session_dur_us,
           CAST(1000 * sum(ne) // count(*) AS BIGINT) AS mean_events_milli,
           CAST(max(ne) AS BIGINT) AS max_session_events,
           CAST(max(s1) AS BIGINT) AS last_seen_us,
           CAST(h.feed_max_us - max(s1) AS BIGINT) AS recency_us
         FROM sess, h GROUP BY user_id, h.feed_max_us""",

    // Broadcast-dictionary category scoring: token stream joined to the
    // (term, category, severity) VALUES, per-(doc, category) rollup.
    "q216_term_categories" ->
      """WITH dict AS (SELECT * FROM (VALUES
             ('error', 'ops-noise', 1), ('slow', 'ops-noise', 2),
             ('row', 'jargon', 1), ('hash', 'jargon', 1), ('spark', 'jargon', 3))
             AS v(tok, category, severity)),
         tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         SELECT doc_id, category, count(*) AS n_hits,
           CAST(sum(severity) AS BIGINT) AS severity_sum
         FROM tk JOIN dict USING (tok) GROUP BY 1, 2""",

    // Winnowing: per window start p (full windows only) pick the min
    // 53-bit k-gram hash, rightmost on ties; DISTINCT selected
    // (pos, fp) pairs are the fingerprint.
    "q217_winnowing" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
         g AS (SELECT doc_id, i,
               md5_number_upper(array_to_string(list_slice(ts, i, i + 2), ' '))
                 % 9007199254740992 AS h
               FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM t)),
         n AS (SELECT doc_id, count(*) AS nh FROM g GROUP BY 1),
         win AS (SELECT a.doc_id, a.i AS p, b.i AS j, b.h
                 FROM g a JOIN g b ON b.doc_id = a.doc_id
                   AND b.i BETWEEN a.i AND a.i + 3),
         sel AS (SELECT doc_id, p, j, h,
                 row_number() OVER (PARTITION BY doc_id, p ORDER BY h ASC, j DESC) AS rn
                 FROM win)
         SELECT DISTINCT s.doc_id, CAST(s.j AS BIGINT) AS pos,
           CAST(s.h AS BIGINT) AS fp
         FROM sel s JOIN n ON n.doc_id = s.doc_id
         WHERE s.rn = 1 AND s.p <= n.nh - 3""",

    // Keep-first exact dedup (md5 groups, smallest id wins) rolled up
    // per source: raw vs unique-content doc/token mass.
    "q218_effective_tokens" ->
      """WITH b AS (SELECT doc_id AS rid, source AS src,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             md5(text) AS h FROM documents),
         k AS (SELECT h, min(rid) AS keep_id FROM b GROUP BY 1),
         j AS (SELECT b.*, CASE WHEN b.rid = k.keep_id THEN 1 ELSE 0 END AS kept
               FROM b JOIN k USING (h))
         SELECT src, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(kept) AS BIGINT) AS n_unique_docs,
           CAST(sum(kept * toks) AS BIGINT) AS effective_tokens,
           CAST(sum(toks) - sum(kept * toks) AS BIGINT) AS dup_tokens,
           CAST(10000 * (sum(toks) - sum(kept * toks)) // sum(toks) AS BIGINT) AS dup_share_bp
         FROM j GROUP BY 1""",

    // Per declared A→B dependency: distinct-pair keys, keys mapping to
    // >1 B, and the fact-row mass under violating keys.
    "q219_fd_audit" -> Seq(
      ("nation->region", "nation", "n_nationkey", "n_regionkey"),
      ("user->event_type", "events", "user_id", "event_type"),
      ("cust_nation->segment", "customer", "c_nationkey", "c_mktsegment"))
      .map { case (name, t, a, b) =>
        s"""SELECT '$name' AS dependency,
           (SELECT count(*) FROM $t) AS n_rows,
           (SELECT count(*) FROM (SELECT DISTINCT $a FROM $t)) AS n_keys,
           (SELECT count(*) FROM (SELECT $a FROM (SELECT DISTINCT $a, $b FROM $t)
              GROUP BY 1 HAVING count(*) > 1)) AS n_violating_keys,
           (SELECT count(*) FROM $t WHERE $a IN
              (SELECT $a FROM (SELECT DISTINCT $a, $b FROM $t)
               GROUP BY 1 HAVING count(*) > 1)) AS n_violating_rows,
           CAST(CASE WHEN (SELECT count(*) FROM (SELECT $a FROM
              (SELECT DISTINCT $a, $b FROM $t) GROUP BY 1 HAVING count(*) > 1)) = 0
              THEN 1 ELSE 0 END AS INT) AS holds"""
      }.mkString("\nUNION ALL\n"),

    // Per-cell MI terms floor(p_xy·ln(p_xy/(p_x·p_y))·10⁶+½); the
    // ALL row is the exact integer sum.
    "q220_mutual_info" ->
      """WITH c AS (SELECT lang AS x_, source AS y_, count(*) AS n FROM documents GROUP BY 1, 2),
         mx AS (SELECT x_, sum(n) AS nx FROM c GROUP BY 1),
         my AS (SELECT y_, sum(n) AS ny FROM c GROUP BY 1),
         t AS (SELECT sum(n) AS nt FROM c),
         r AS (SELECT c.x_, c.y_, c.n,
               CAST(floor((CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
                 * ln((CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
                   / ((CAST(mx.nx AS DOUBLE) / CAST(t.nt AS DOUBLE))
                    * (CAST(my.ny AS DOUBLE) / CAST(t.nt AS DOUBLE))))
                 * 1000000 + 0.5) AS BIGINT) AS mi_term_unat
               FROM c JOIN mx USING (x_) JOIN my USING (y_), t)
         SELECT x_ AS lang, y_ AS source, CAST(n AS BIGINT) AS n, mi_term_unat FROM r
         UNION ALL
         SELECT 'ALL', 'ALL', CAST(sum(n) AS BIGINT), CAST(sum(mi_term_unat) AS BIGINT) FROM r""",

    // Per-brand rank cut at 2, then the global top-12, both ties on id.
    "q221_diversified_topk" ->
      s"""WITH rev AS (SELECT l_partkey,
             ${C("sum(l_extendedprice * (1 - l_discount))")} AS revenue_cents
             FROM lineitem GROUP BY 1),
         j AS (SELECT rev.l_partkey, p.p_brand, rev.revenue_cents,
               row_number() OVER (PARTITION BY p.p_brand
                 ORDER BY rev.revenue_cents DESC, rev.l_partkey ASC) AS group_rank
               FROM rev JOIN part p ON p.p_partkey = rev.l_partkey),
         cut AS (SELECT * FROM j WHERE group_rank <= 2
                 ORDER BY revenue_cents DESC, l_partkey ASC LIMIT 12)
         SELECT CAST(row_number() OVER (ORDER BY revenue_cents DESC, l_partkey ASC) AS BIGINT) AS rank,
           l_partkey AS part, p_brand, revenue_cents,
           CAST(group_rank AS BIGINT) AS group_rank
         FROM cut""",

    // KM: per-user (t_day, converted), day-level d/n, ln terms with an
    // explicit absorbing zero when d = n (mirrors kaplanMeier).
    "q222_survival" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         u AS (SELECT user_id, min(us) AS entry_us,
               min(CASE WHEN event_type = 'purchase' THEN us END) AS conv_us
               FROM e GROUP BY 1),
         h AS (SELECT max(us) AS h_us FROM e),
         obs AS (SELECT CASE WHEN conv_us IS NOT NULL
                 THEN (conv_us - entry_us) // 86400000000
                 ELSE (h.h_us - entry_us) // 86400000000 END AS t_day,
               CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END AS converted
               FROM u, h),
         t AS (SELECT count(*) AS n_total FROM obs),
         pd AS (SELECT t_day, sum(converted) AS d_conv, count(*) AS n_leaving
                FROM obs GROUP BY 1),
         w AS (SELECT pd.*, t.n_total,
               sum(n_leaving) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS left_through
               FROM pd, t),
         r AS (SELECT t_day, n_total - left_through + n_leaving AS n_risk,
               d_conv, n_leaving FROM w),
         lt AS (SELECT *, CASE WHEN d_conv < n_risk
               THEN CAST(floor(ln(1.0 - CAST(d_conv AS DOUBLE) / CAST(n_risk AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT) END AS ln_term_u FROM r),
         z AS (SELECT *, max(CASE WHEN d_conv = n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS zeroed,
               sum(ln_term_u) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS cum_raw
               FROM lt)
         SELECT CAST(t_day AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_conv AS BIGINT) AS d_conv, CAST(n_leaving AS BIGINT) AS n_leaving,
           ln_term_u,
           CASE WHEN zeroed = 0 THEN CAST(cum_raw AS BIGINT) END AS cum_ln_u,
           CASE WHEN zeroed = 1 THEN 0
                ELSE CAST(floor(exp(CAST(cum_raw AS DOUBLE) / 1000000) * 10000 + 0.5) AS BIGINT)
           END AS survival_bp
         FROM z""",

    // Split conformal: k = ⌊α(n_cal+1)⌋, threshold = k-th smallest
    // even-id calibration score, flag rate realized on the odd split.
    "q223_conformal" ->
      s"""WITH sc AS ($q41OracleSql),
         cal AS (SELECT doc_id, quality_bp,
               row_number() OVER (ORDER BY quality_bp ASC, doc_id ASC) AS rn
               FROM sc WHERE doc_id % 2 = 0),
         nk AS (SELECT count(*) AS n_cal, (count(*) + 1) * 1000 // 10000 AS k FROM cal),
         thr AS (SELECT max(quality_bp) AS threshold FROM cal, nk WHERE cal.rn <= nk.k),
         test AS (SELECT quality_bp FROM sc WHERE doc_id % 2 <> 0)
         SELECT CAST(nk.n_cal AS BIGINT) AS n_cal, CAST(nk.k AS BIGINT) AS k,
           CAST(thr.threshold AS BIGINT) AS threshold,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN test.quality_bp < thr.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(10000 * sum(CASE WHEN test.quality_bp < thr.threshold THEN 1 ELSE 0 END)
             // count(*) AS BIGINT) AS flag_rate_bp
         FROM test, thr, nk GROUP BY nk.n_cal, nk.k, thr.threshold""",

    // Exact Gini: holders sorted ascending by (mass, id);
    // Σ(2i−n−1)·x over n·Σx in basis points; per-holder Lorenz rows.
    "q224_gini" ->
      """WITH h AS (SELECT source AS holder,
             sum(len(string_split(text, ' '))) AS x
             FROM documents GROUP BY 1),
         r AS (SELECT holder, x,
               row_number() OVER (ORDER BY x ASC, holder ASC) AS i,
               count(*) OVER () AS n,
               sum(x) OVER (ORDER BY x ASC, holder ASC ROWS UNBOUNDED PRECEDING) AS cum,
               sum(x) OVER () AS total
               FROM h)
         SELECT holder, CAST(i AS BIGINT) AS rank, CAST(x AS BIGINT) AS x,
           CAST(10000 * cum // total AS BIGINT) AS cum_mass_bp,
           CAST((2 * i - n - 1) * x AS BIGINT) AS gini_num_term
         FROM r
         UNION ALL
         SELECT 'ALL', 0, CAST(max(total) AS BIGINT), 10000,
           CAST(10000::HUGEINT * sum((2 * i - n - 1) * x)
             // (max(n)::HUGEINT * max(total)) AS BIGINT)
         FROM r""",

    // Bucket-grid Gini at the user grain: cuts are Spark's
    // percentile_disc (= smallest value with cume_dist ≥ j/32, an
    // actual data point — replayed here by the cume_dist window),
    // bucket = count of cuts ≤ x (SearchSortedBucket), then the
    // grouped-run numerator Σ m_j·(2·C_j − c_j − n) in HUGEINT.
    "q248_gini_buckets" ->
      s"""WITH ph AS (SELECT user_id AS holder, sum(${C("value")}) AS x FROM events GROUP BY 1),
         cd AS (SELECT x, cume_dist() OVER (ORDER BY x) AS cd FROM ph),
         cuts AS (SELECT CAST((SELECT min(x) FROM cd WHERE cd.cd >= j / 32.0) AS DOUBLE) AS cut
                  FROM range(1, 32) t(j)),
         bb AS (SELECT holder, x,
                (SELECT count(*) FROM cuts WHERE cuts.cut <= CAST(ph.x AS DOUBLE)) AS b FROM ph),
         g AS (SELECT b, count(*) AS c, sum(x) AS m FROM bb GROUP BY 1),
         cm AS (SELECT b, c, m,
                sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum_c,
                sum(m) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum_m,
                sum(c) OVER () AS n, sum(m) OVER () AS t FROM g),
         rw AS (SELECT 'b' || CAST(b AS VARCHAR) AS holder, b + 1 AS rank, m AS x,
                10000 * cum_m // t AS cum_mass_bp,
                m::HUGEINT * (2 * cum_c - c - n)::HUGEINT AS gn, n, t FROM cm)
         SELECT holder, CAST(rank AS BIGINT) AS rank, CAST(x AS BIGINT) AS x,
           CAST(cum_mass_bp AS BIGINT) AS cum_mass_bp, CAST(gn AS BIGINT) AS gini_num_term
         FROM rw
         UNION ALL
         SELECT 'ALL', 0, CAST(max(t) AS BIGINT), 10000,
           CAST(10000::HUGEINT * sum(gn) // (max(n)::HUGEINT * max(t)::HUGEINT) AS BIGINT)
         FROM rw""",

    // Dynamic keys via json_keys + dynamic-path extraction; numeric
    // flag by the same integer regex; truncating coverage bp.
    "q259_props_coverage" ->
      """WITH e AS (SELECT event_type, props FROM events),
         tot AS (SELECT event_type, count(*) AS cnt FROM e GROUP BY 1),
         kv AS (SELECT event_type, k.key AS field,
                json_extract_string(e.props, '$.' || k.key) AS v
                FROM (SELECT * FROM e WHERE json_valid(props)) e,
                UNNEST(json_keys(e.props)) AS k(key)),
         g AS (SELECT event_type, field, count(*) AS n_present,
               count(DISTINCT v) AS n_distinct_vals,
               min(CASE WHEN regexp_matches(v, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS all_numeric,
               min(CASE WHEN regexp_matches(v, '^-?[0-9]+$') THEN CAST(v AS BIGINT) END) AS mn,
               max(CASE WHEN regexp_matches(v, '^-?[0-9]+$') THEN CAST(v AS BIGINT) END) AS mx
               FROM kv GROUP BY 1, 2)
         SELECT g.event_type, g.field, CAST(n_present AS BIGINT) AS n_present,
           CAST(10000 * n_present // cnt AS BIGINT) AS coverage_bp,
           CAST(n_distinct_vals AS BIGINT) AS n_distinct_vals,
           CAST(all_numeric AS INT) AS all_numeric,
           CASE WHEN all_numeric = 1 THEN mn END AS min_num,
           CASE WHEN all_numeric = 1 THEN mx END AS max_num
         FROM g JOIN tot USING (event_type)""",

    // (class, sensitive) cells then the class rollup; dominant share
    // by truncating bp division.
    "q257_l_diversity" ->
      """WITH cells AS (SELECT CAST(c_nationkey AS INT) AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_mktsegment AS sv, count(*) AS c
             FROM customer GROUP BY 1, 2, 3)
         SELECT nation, bal_band, CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS l_distinct,
           CAST(10000 * max(c) // sum(c) AS BIGINT) AS top_share_bp,
           CAST(CASE WHEN sum(c) >= 5 THEN 1 ELSE 0 END AS INT) AS is_k_anon,
           CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS INT) AS is_l_diverse
         FROM cells GROUP BY 1, 2""",

    // Day-grain CASE tagging, per-split masses, per-user presence
    // flags, and the three pairwise overlaps as first-class rows.
    "q258_temporal_split" ->
      """WITH t AS (SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-19' THEN 'train'
                     WHEN CAST(ts AS DATE) < DATE '2024-01-25' THEN 'val'
                     ELSE 'test' END AS segment, user_id AS u FROM events),
         base AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM t GROUP BY 1),
         fl AS (SELECT u,
                max(CASE WHEN segment = 'train' THEN 1 ELSE 0 END) AS tr,
                max(CASE WHEN segment = 'val' THEN 1 ELSE 0 END) AS va,
                max(CASE WHEN segment = 'test' THEN 1 ELSE 0 END) AS te
                FROM (SELECT DISTINCT segment, u FROM t) GROUP BY 1)
         SELECT * FROM base
         UNION ALL SELECT 'train^val', 0, CAST(sum(tr * va) AS BIGINT) FROM fl
         UNION ALL SELECT 'train^test', 0, CAST(sum(tr * te) AS BIGINT) FROM fl
         UNION ALL SELECT 'val^test', 0, CAST(sum(va * te) AS BIGINT) FROM fl""",

    // ACF replayed exactly: milli residuals off the truncating mean,
    // HUGEINT num/den products, signed truncating bp division.
    "q254_acf" ->
      """WITH d0 AS (SELECT event_type AS s, CAST(ts AS DATE) AS day, count(*) AS x
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, count(*) AS n, 1000 * sum(x) // count(*) AS xbar_milli
                FROM d0 GROUP BY 1),
         dev AS (SELECT d0.s, st.n, d0.day,
                 1000 * d0.x - st.xbar_milli AS d
                 FROM d0 JOIN st USING (s)),
         den AS (SELECT s, sum(d::HUGEINT * d::HUGEINT) AS den, max(n) AS n
                 FROM dev GROUP BY 1),
         lg AS (SELECT a.s, k.lag, a.d, b.d AS d2
                FROM dev a
                CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k
                JOIN dev b ON b.s = a.s AND b.day = a.day + CAST(k.lag AS INT)),
         num AS (SELECT s, lag, sum(d::HUGEINT * d2::HUGEINT) AS num
                 FROM lg GROUP BY 1, 2)
         SELECT num.s AS event_type, CAST(num.lag AS BIGINT) AS lag,
           CAST(den.n AS BIGINT) AS n_days,
           CAST(10000::HUGEINT * num.num // den.den AS BIGINT) AS acf_bp
         FROM num JOIN den USING (s)""",

    // CCF: per-series milli residuals, calendar-day alignment, the
    // ±1-corrected integer sqrt normalizer convention.
    "q255_ccf" ->
      """WITH d0 AS (SELECT event_type AS s, CAST(ts AS DATE) AS day, count(*) AS x
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, 1000 * sum(x) // count(*) AS xbar FROM d0 GROUP BY 1),
         dev AS (SELECT d0.s, d0.day, 1000 * d0.x - st.xbar AS d
                 FROM d0 JOIN st USING (s)),
         dn0 AS (SELECT s, sum(d::HUGEINT * d::HUGEINT) AS ss FROM dev GROUP BY 1),
         dn1 AS (SELECT s, ss, CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT) AS c FROM dn0),
         den AS (SELECT s, CASE WHEN (c + 1)::HUGEINT * (c + 1)::HUGEINT <= ss THEN c + 1
                      WHEN c::HUGEINT * c::HUGEINT > ss THEN c - 1 ELSE c END AS isq FROM dn1),
         lg AS (SELECT a.s AS sa, b.s AS sb, k.lag, count(*) AS n_overlap,
                sum(a.d::HUGEINT * b.d::HUGEINT) AS num
                FROM dev a
                CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) k
                JOIN dev b ON a.s < b.s AND b.day = a.day + CAST(k.lag AS INT)
                GROUP BY 1, 2, 3)
         SELECT sa AS series_a, sb AS series_b, CAST(lg.lag AS BIGINT) AS lag,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           CAST(10000::HUGEINT * num // (qa.isq::HUGEINT * qb.isq::HUGEINT) AS BIGINT) AS ccf_bp
         FROM lg JOIN den qa ON qa.s = lg.sa JOIN den qb ON qb.s = lg.sb""",

    // One-split segmentation: prefix sums, the exact-integer gain
    // 10^6(Sl^2*nr + Sr^2*nl)//(nl*nr), argmax ties to earliest day.
    "q256_changepoint" ->
      """WITH d0 AS (SELECT event_type AS s, CAST(ts AS DATE) AS day, count(*) AS x
             FROM events GROUP BY 1, 2),
         pre AS (SELECT s, day, x,
                 row_number() OVER (PARTITION BY s ORDER BY day) AS i,
                 sum(x) OVER (PARTITION BY s ORDER BY day ROWS UNBOUNDED PRECEDING) AS sl,
                 count(*) OVER (PARTITION BY s) AS n,
                 sum(x) OVER (PARTITION BY s) AS st
                 FROM d0),
         sc AS (SELECT s, day, i, n, sl, st - sl AS sr FROM pre WHERE i < n),
         g AS (SELECT s, day, i, n, sl, sr,
               (1000000::HUGEINT * (sl::HUGEINT * sl::HUGEINT * (n - i)::HUGEINT
                  + sr::HUGEINT * sr::HUGEINT * i::HUGEINT))
                 // (i::HUGEINT * (n - i)::HUGEINT) AS gain_micro FROM sc),
         r AS (SELECT *, row_number() OVER (PARTITION BY s
               ORDER BY gain_micro DESC, day ASC) AS rk FROM g)
         SELECT s AS event_type, strftime(day, '%Y-%m-%d') AS split_day,
           CAST(i AS BIGINT) AS n_left, CAST(n - i AS BIGINT) AS n_right,
           CAST(1000 * sl // i AS BIGINT) AS mean_left_milli,
           CAST(1000 * sr // (n - i) AS BIGINT) AS mean_right_milli,
           CAST(gain_micro AS BIGINT) AS gain_micro
         FROM r WHERE rk = 1""",

    // Holt level+trend: the q156 sequential-recursion shape with two
    // carried registers; ×256 fixed point, TRUNCATING division on both
    // engines (Scala Long `/` == DuckDB `//` — trend goes negative on
    // declines, where floor-vs-truncate would diverge). b_i needs l_i,
    // so the recursive term inlines the l recurrence twice.
    "q225_holt_trend" -> holtOracle,

    "q226_kcore" -> kCoreOracle,
    "q272_communities" -> lpaOracle,
    "q285_markov_stationary" -> markovOracle,
    "q290_bfs_hops" -> bfsOracle,
    "q300_holt_winters" -> holtWintersOracle,
    "q307_forecast_eval" -> forecastEvalOracle,

    // Degree assortativity (Newman's r) as exact integer arithmetic:
    // over the both-direction edge list the endpoint-degree marginals
    // coincide, so r = (m·Σxy − (Σx)²)/(m·Σxx − (Σx)²); HUGEINT sums
    // mirror the Spark side's decimal(38,0), one `//` at the boundary,
    // NULL on the regular-graph zero denominator (q204 convention).
    "q273_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem WHERE l_orderkey % 8 = 0),
         e AS (SELECT a.it AS pa, b.it AS pb
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
         und AS MATERIALIZED (
               SELECT pa AS src, pb AS dst FROM e
               UNION ALL SELECT pb, pa FROM e),
         deg AS MATERIALIZED (SELECT src AS u, count(*) AS d FROM und GROUP BY 1),
         st AS (SELECT count(*) AS m,
                  sum(CAST(du.d AS HUGEINT)) AS sx,
                  sum(CAST(du.d AS HUGEINT) * CAST(du.d AS HUGEINT)) AS sxx,
                  sum(CAST(du.d AS HUGEINT) * CAST(dv.d AS HUGEINT)) AS sxy
                FROM und ed JOIN deg du ON du.u = ed.src
                  JOIN deg dv ON dv.u = ed.dst),
         n AS (SELECT count(*) AS n_nodes FROM deg)
         SELECT CAST(n.n_nodes AS BIGINT) AS n_nodes,
           CAST(st.m // 2 AS BIGINT) AS n_edges,
           CAST(CASE WHEN st.m * st.sxx - st.sx * st.sx = 0 THEN NULL
                ELSE (10000 * (st.m * st.sxy - st.sx * st.sx))
                     // (st.m * st.sxx - st.sx * st.sx) END AS BIGINT)
             AS assortativity_bp
         FROM st, n""",

    // MERGE row contract: full outer join on the key; change rows win,
    // deletes drop, target-only rows pass through. The change batch is
    // the same deterministic mod-arithmetic derivation as the Spark
    // side (delete %11, upsert %7, insert %13 at key+10^7).
    "q227_merge_upsert" ->
      """WITH cust AS (SELECT c_custkey, c_name,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
             c_mktsegment FROM customer),
         ch AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 11 = 0 THEN 'delete' ELSE 'upsert' END AS op,
                  c_name, acctbal_cents + 12345 AS acctbal_cents, c_mktsegment
           FROM cust WHERE c_custkey % 11 = 0 OR c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 'upsert',
                  'Customer#new' || c_custkey, c_custkey, 'NEW'
           FROM cust WHERE c_custkey % 13 = 0)
         SELECT coalesce(c.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN c.c_custkey IS NOT NULL THEN c.c_name ELSE t.c_name END AS c_name,
           CAST(CASE WHEN c.c_custkey IS NOT NULL THEN c.acctbal_cents
                ELSE t.acctbal_cents END AS BIGINT) AS acctbal_cents,
           CASE WHEN c.c_custkey IS NOT NULL THEN c.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment
         FROM cust t FULL OUTER JOIN ch c ON t.c_custkey = c.c_custkey
         WHERE coalesce(c.op, 'keep') <> 'delete'""",

    // Dedup P/R/F1 harness: q54's label-blocked pairs vs the blockless
    // cosine truth at the same τ; bp integer divisions, F1 = 2PR/(P+R).
    "q228_dedup_eval" ->
      """WITH ap AS (SELECT a.vec_id AS pa, b.vec_id AS pb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])) >= 0.35),
         tp AS (SELECT a.vec_id AS pa, b.vec_id AS pb
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])) >= 0.35),
         c AS (SELECT (SELECT count(*) FROM ap) AS n_approx,
                      (SELECT count(*) FROM tp) AS n_truth,
                      (SELECT count(*) FROM ap JOIN tp USING (pa, pb)) AS n_hit),
         pr AS (SELECT CAST(n_approx AS BIGINT) AS n_approx,
                       CAST(n_truth AS BIGINT) AS n_truth,
                       CAST(n_hit AS BIGINT) AS n_hit,
                       CAST(CASE WHEN n_approx = 0 THEN 0
                         ELSE 10000 * n_hit // n_approx END AS BIGINT) AS precision_bp,
                       CAST(CASE WHEN n_truth = 0 THEN 0
                         ELSE 10000 * n_hit // n_truth END AS BIGINT) AS recall_bp
                FROM c)
         SELECT *, CAST(CASE WHEN precision_bp + recall_bp = 0 THEN 0
           ELSE 2 * precision_bp * recall_bp
             // (precision_bp + recall_bp) END AS BIGINT) AS f1_bp FROM pr""",

    // Wilcoxon signed-rank: q339's calendar-midpoint split into per-
    // user diffs, |d|-lattice mid-ranks in 2x units, tie-exact
    // variance sum(t*r2^2)/4, one pinned double order for z.
    "q378_wilcoxon" ->
      s"""WITH d0 AS (SELECT user_id AS u, CAST(ts AS DATE) AS dy,
             ${C("value")} AS vc FROM events WHERE event_type = 'purchase'),
         b AS (SELECT min(dy) AS d_min, max(dy) AS d_max FROM d0),
         p AS (SELECT CAST(d_min + CAST(date_diff('day', d_min, d_max) // 2
               AS INT) AS DATE) AS pivot FROM b),
         pu AS (SELECT u,
             sum(CASE WHEN dy > p.pivot THEN vc ELSE 0 END)
           - sum(CASE WHEN dy <= p.pivot THEN vc ELSE 0 END) AS diff
           FROM d0 CROSS JOIN p GROUP BY 1),
         pb AS (SELECT abs(diff) AS ad,
             sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS np, count(*) AS t
           FROM pu WHERE diff <> 0 GROUP BY 1),
         rk AS (SELECT ad, np, t,
             2 * (sum(t) OVER (ORDER BY ad ASC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - t) + t + 1 AS r2 FROM pb),
         z AS (SELECT count(*) AS nzero FROM pu WHERE diff = 0),
         m AS (SELECT sum(t) AS n_nonzero,
             sum(CAST(np AS HUGEINT) * r2) AS w2,
             sum(CAST(t AS HUGEINT) * r2 * r2) AS s2 FROM rk)
         SELECT CAST(coalesce(n_nonzero, 0) AS BIGINT) AS n_nonzero,
           CAST(z.nzero AS BIGINT) AS n_zero,
           CAST(coalesce(w2, 0) // 2 AS BIGINT) AS w_plus,
           CAST(CASE WHEN n_nonzero IS NULL OR s2 = 0 THEN NULL
             ELSE floor(2 * CAST(w2 - (CAST(n_nonzero AS HUGEINT)
                 * (n_nonzero + 1)) // 2 AS DOUBLE)
               / sqrt(CAST(s2 AS DOUBLE)) * 1000 + 0.5) END AS BIGINT)
             AS z_milli,
           CAST(CASE WHEN n_nonzero IS NULL OR s2 = 0 THEN NULL
             WHEN abs(floor(2 * CAST(w2 - (CAST(n_nonzero AS HUGEINT)
                 * (n_nonzero + 1)) // 2 AS DOUBLE)
               / sqrt(CAST(s2 AS DOUBLE)) * 1000 + 0.5)) > 1960
             THEN 1 ELSE 0 END AS INT) AS is_significant
         FROM m CROSS JOIN z""",

    // Friedman: 0-filled complete design, within-block mid-ranks from
    // two RANGE windows, Conover tie-exact Q in 2x units (the /4
    // cancels between A2 and B2).
    "q379_friedman" ->
      """WITH cells AS (SELECT user_id AS blk, event_type AS trt,
             count(*) AS v FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         blocks AS (SELECT DISTINCT blk FROM cells),
         trts AS (SELECT DISTINCT trt FROM cells),
         kk AS (SELECT count(*) AS k_trt FROM trts),
         fl AS (SELECT b.blk, t.trt, coalesce(c.v, 0) AS v
           FROM blocks b CROSS JOIN trts t
           LEFT JOIN cells c ON c.blk = b.blk AND c.trt = t.trt),
         rk AS (SELECT blk, trt, v,
             2 * count(*) OVER (PARTITION BY blk ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             + count(*) OVER (PARTITION BY blk ORDER BY v
               RANGE BETWEEN CURRENT ROW AND CURRENT ROW) + 1 AS r2
           FROM fl),
         pt AS (SELECT trt, max(kk.k_trt) AS k_trt, count(*) AS n_blocks,
             sum(CAST(r2 AS HUGEINT))
               - CAST(count(*) AS HUGEINT) * (max(kk.k_trt) + 1) AS dev
           FROM rk CROSS JOIN kk GROUP BY trt),
         a2 AS (SELECT max(k_trt) AS k_trt, max(n_blocks) AS n_blocks,
             sum(dev * dev) AS a2 FROM pt),
         b2 AS (SELECT sum((CAST(r2 AS HUGEINT) - (kk.k_trt + 1))
               * (CAST(r2 AS HUGEINT) - (kk.k_trt + 1))) AS b2
           FROM rk CROSS JOIN kk)
         SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(k_trt AS BIGINT) AS k_treatments,
           CAST(CASE WHEN k_trt < 2 OR b2.b2 = 0 THEN NULL
             ELSE (1000 * (CAST(k_trt AS HUGEINT) - 1) * a2.a2) // b2.b2
             END AS BIGINT) AS q_milli
         FROM a2 CROSS JOIN b2""",

    // Readability: the three RE2 character-class counts per document,
    // exact idiv fixed point for wps/spw and both formulas, truncating
    // per-language means (both engines truncate toward zero).
    "q380_readability" ->
      """WITH pd AS (SELECT lang,
             len(regexp_extract_all(text, '\S+')) AS w,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
           FROM documents),
         fx AS (SELECT lang, (1000 * w) // s AS wps_milli,
             (1000 * y) // w AS spw_milli FROM pd WHERE w > 0),
         sc AS (SELECT lang,
             206835 - (1015 * wps_milli) // 1000
               - (84600 * spw_milli) // 1000 AS fre_milli,
             (390 * wps_milli) // 1000 + (11800 * spw_milli) // 1000
               - 15590 AS fkg_milli FROM fx)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(fre_milli) // count(*) AS BIGINT) AS mean_fre_milli,
           CAST(sum(fkg_milli) // count(*) AS BIGINT) AS mean_fkg_milli,
           CAST(min(fre_milli) AS BIGINT) AS min_fre_milli,
           CAST(max(fre_milli) AS BIGINT) AS max_fre_milli
         FROM sc GROUP BY 1""",

    // Cramer-von Mises: cent-lattice bin counts, cumulative CDFs, the
    // cross-multiplied integer gap squared, one exact floor division.
    "q381_cvm" ->
      s"""WITH pb AS (SELECT ${C("value")} AS v,
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS nb
           FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
           GROUP BY 1),
         cm AS (SELECT v, na, nb,
             sum(na) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS ca,
             sum(nb) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cb FROM pb),
         t AS (SELECT sum(na) AS n_a, sum(nb) AS n_b FROM pb),
         s AS (SELECT t.n_a, t.n_b,
             sum(CAST(na + nb AS HUGEINT)
               * (CAST(ca AS HUGEINT) * t.n_b - CAST(cb AS HUGEINT) * t.n_a)
               * (CAST(ca AS HUGEINT) * t.n_b - CAST(cb AS HUGEINT) * t.n_a))
               AS ssum
           FROM cm CROSS JOIN t GROUP BY 1, 2)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
             ELSE (1000000 * ssum) // (CAST(n_a + n_b AS HUGEINT)
               * (n_a + n_b) * n_a * n_b) END AS BIGINT) AS t_micro,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
             WHEN (1000000 * ssum) // (CAST(n_a + n_b AS HUGEINT)
               * (n_a + n_b) * n_a * n_b) > 461000 THEN 1 ELSE 0
             END AS INT) AS is_significant
         FROM s""",

    // Jackknife ratio SE: delete-one ratios on the micro lattice by
    // one truncating idiv each, the one-pass variance identity, and
    // the corrected-isqrt convention (q186) for se_micro.
    "q382_jackknife" ->
      s"""WITH pu AS (SELECT user_id AS u, CAST(user_id % 2 = 0 AS INT)
               AS arm, count(*) AS x, sum(${C("value")}) AS y
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         tot AS (SELECT arm, count(*) AS n_units, sum(x) AS tx,
             sum(y) AS ty FROM pu GROUP BY 1),
         ri AS (SELECT pu.arm, t.n_units, t.tx, t.ty,
             CASE WHEN t.tx - pu.x > 0 THEN
               (1000000 * (CAST(t.ty AS HUGEINT) - pu.y))
                 // (CAST(t.tx AS HUGEINT) - pu.x) END AS r
           FROM pu JOIN tot t ON t.arm = pu.arm),
         mom AS (SELECT arm, max(n_units) AS n_units, max(tx) AS tx,
             max(ty) AS ty,
             sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS n_excluded,
             count(r) AS n_j, sum(r) AS s, sum(CAST(r AS HUGEINT) * r) AS ss
           FROM ri GROUP BY 1),
         vr AS (SELECT arm, n_units, n_excluded, n_j, tx, ty,
             CASE WHEN n_j < 2 THEN 0 ELSE
               ((CAST(n_j AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
                 * (n_j - 1))
               // greatest(CAST(n_j AS HUGEINT) * n_j, 1) END AS q
           FROM mom),
         c0 AS (SELECT *, CAST(floor(sqrt(CAST(q AS DOUBLE))) AS HUGEINT)
             AS s0 FROM vr),
         iq AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= q THEN s0 + 1
             WHEN s0 * s0 > q THEN s0 - 1 ELSE s0 END AS isq FROM c0),
         fin AS (SELECT CAST(arm AS BIGINT) AS arm,
             CAST(n_units AS BIGINT) AS n_units,
             CAST(n_excluded AS BIGINT) AS n_excluded,
             CAST((1000000 * CAST(ty AS HUGEINT)) // tx AS BIGINT)
               AS ratio_micro,
             CASE WHEN n_j < 2 THEN NULL
               ELSE CAST(isq AS BIGINT) END AS se_micro
           FROM iq)
         SELECT arm, n_units, n_excluded, ratio_micro, se_micro,
           CASE WHEN se_micro IS NULL THEN NULL
             ELSE ratio_micro - (196 * se_micro) // 100 END AS ci95_lo_micro,
           CASE WHEN se_micro IS NULL THEN NULL
             ELSE ratio_micro + (196 * se_micro) // 100 END AS ci95_hi_micro
         FROM fin ORDER BY arm""",

    // TOST equivalence: the welch moment chain, an exact integer
    // margin (relative thousandths of the pooled mean), and two
    // pinned-double one-sided z's.
    "q383_tost" ->
      s"""WITH m AS (SELECT
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS
               HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE
               CAST(${C("value")} AS HUGEINT) END) AS sb,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS
               HUGEINT) * ${C("value")} ELSE 0 END) AS ssa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE
               CAST(${C("value")} AS HUGEINT) * ${C("value")} END) AS ssb
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         d AS (SELECT n_a, n_b, sa, sb,
             CAST(n_a AS HUGEINT) * ssa - sa * sa AS num_a,
             CAST(n_b AS HUGEINT) * ssb - sb * sb AS num_b,
             (100 * (sa + sb)) // (1000 * CAST(n_a + n_b AS HUGEINT))
               AS margin_c FROM m),
         z AS (SELECT n_a, n_b, sa, sb, margin_c,
             num_a, num_b,
             CAST(num_a AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * n_a
               * (n_a - 1) AS DOUBLE) AS qa,
             CAST(num_b AS DOUBLE) / CAST(CAST(n_b AS HUGEINT) * n_b
               * (n_b - 1) AS DOUBLE) AS qb FROM d),
         f AS (SELECT n_a, n_b,
             CAST(sa // CAST(n_a AS HUGEINT) AS BIGINT) AS mean_a_c,
             CAST(sb // CAST(n_b AS HUGEINT) AS BIGINT) AS mean_b_c,
             CAST(margin_c AS BIGINT) AS margin_c,
             num_a, num_b,
             CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff,
             sqrt(qa + qb) AS se FROM z)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a_c, mean_b_c, margin_c,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_a + num_b = 0
             THEN NULL ELSE floor((diff + CAST(margin_c AS DOUBLE)) / se
               * 1000 + 0.5) END AS BIGINT) AS z_lo_milli,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_a + num_b = 0
             THEN NULL ELSE floor((diff - CAST(margin_c AS DOUBLE)) / se
               * 1000 + 0.5) END AS BIGINT) AS z_hi_milli,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_a + num_b = 0
             THEN NULL
             WHEN floor((diff + CAST(margin_c AS DOUBLE)) / se * 1000
                 + 0.5) > 1645
               AND floor((diff - CAST(margin_c AS DOUBLE)) / se * 1000
                 + 0.5) < -1645 THEN 1 ELSE 0 END AS INT) AS is_equivalent
         FROM f""",

    // SPRT: hypotheses from the control arm's exact-bp rate, the two
    // llr constants discretized once to micro (the only doubles), and
    // every cumulative value exact integer arithmetic.
    "q384_sprt" ->
      """WITH d0 AS (SELECT user_id % 2 = 1 AS trt, value > 150.0 AS ok,
             CAST(ts AS DATE) AS dy FROM events
           WHERE event_type = 'purchase'),
         ctl AS (SELECT greatest(least((10000 * sum(CASE WHEN ok THEN 1
             ELSE 0 END)) // count(*), 9999), 1) AS p0_bp
           FROM d0 WHERE NOT trt),
         c AS (SELECT p0_bp, greatest(least((12 * p0_bp) // 10, 9999), 1)
             AS p1_bp FROM ctl),
         cc AS (SELECT p0_bp, p1_bp,
             CAST(floor((ln(CAST(p1_bp AS DOUBLE))
               - ln(CAST(p0_bp AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)
               AS c1,
             CAST(floor((ln(10000 - CAST(p1_bp AS DOUBLE))
               - ln(10000 - CAST(p0_bp AS DOUBLE))) * 1000000 + 0.5)
               AS BIGINT) AS c0 FROM c),
         pd AS (SELECT dy, count(*) AS n_d,
             sum(CASE WHEN ok THEN 1 ELSE 0 END) AS k_d
           FROM d0 WHERE trt GROUP BY 1),
         cum AS (SELECT dy,
             sum(n_d) OVER (ORDER BY dy ASC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS n_cum,
             sum(k_d) OVER (ORDER BY dy ASC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS k_cum FROM pd),
         r AS (SELECT CAST(dy AS VARCHAR) AS day,
             CAST(n_cum AS BIGINT) AS n_cum,
             CAST(k_cum AS BIGINT) AS k_cum,
             CAST(p0_bp AS BIGINT) AS p0_bp,
             CAST(p1_bp AS BIGINT) AS p1_bp,
             CAST(CAST(k_cum AS HUGEINT) * c1
               + CAST(n_cum - k_cum AS HUGEINT) * c0 AS BIGINT)
               AS llr_micro
           FROM cum CROSS JOIN cc)
         SELECT day, n_cum, k_cum, p0_bp, p1_bp, llr_micro,
           CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
             WHEN llr_micro <= -2944439 THEN 'accept_h0'
             ELSE 'continue' END AS decision
         FROM r""",

    // Bland-Altman of the two token meters: integer diffs, exact
    // moments, corrected-isqrt sd, and the outside count from the
    // same diff definition rejoined to the 1-row stats.
    "q385_bland_altman" ->
      """WITH df AS (SELECT len(regexp_extract_all(text,
             '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             - len(string_split(text, ' ')) AS d FROM documents),
         m AS (SELECT count(*) AS n, sum(CAST(d AS HUGEINT)) AS sd_,
             sum(CAST(d AS HUGEINT) * d) AS ssd FROM df),
         v AS (SELECT n, sd_,
             (1000000 * (CAST(n AS HUGEINT) * ssd - sd_ * sd_))
               // greatest(CAST(n AS HUGEINT) * (n - 1), 1) AS q FROM m),
         c0 AS (SELECT *, CAST(floor(sqrt(CAST(q AS DOUBLE)))
             AS HUGEINT) AS s0 FROM v),
         iq AS (SELECT n, sd_,
             CASE WHEN (s0 + 1) * (s0 + 1) <= q THEN s0 + 1
               WHEN s0 * s0 > q THEN s0 - 1 ELSE s0 END AS isq FROM c0),
         st AS (SELECT CAST(n AS BIGINT) AS n_docs,
             CAST((1000 * sd_) // CAST(n AS HUGEINT) AS BIGINT)
               AS bias_milli,
             CASE WHEN n < 2 THEN NULL ELSE CAST(isq AS BIGINT) END
               AS sd_milli FROM iq),
         lo AS (SELECT n_docs, bias_milli, sd_milli,
             CASE WHEN sd_milli IS NULL THEN NULL
               ELSE bias_milli - (196 * sd_milli) // 100 END
               AS loa_lo_milli,
             CASE WHEN sd_milli IS NULL THEN NULL
               ELSE bias_milli + (196 * sd_milli) // 100 END
               AS loa_hi_milli FROM st),
         outc AS (SELECT count(*) AS n_outside FROM df CROSS JOIN lo
           WHERE loa_lo_milli IS NOT NULL
             AND (1000 * d < loa_lo_milli OR 1000 * d > loa_hi_milli))
         SELECT n_docs, bias_milli, sd_milli, loa_lo_milli, loa_hi_milli,
           CAST(outc.n_outside AS BIGINT) AS n_outside,
           CAST((10000 * outc.n_outside) // n_docs AS BIGINT) AS outside_bp
         FROM lo CROSS JOIN outc""",

    // Luhn detection: generator-replay of the plant (same integer
    // check-digit chain), then the blind validator over every digit
    // run — 1-based i mirrors the Spark side's 0-based pos exactly.
    "q386_luhn" ->
      """WITH pl AS (SELECT doc_id AS docid, text AS t,
             lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR),
               15, '0') AS base FROM documents),
         bd AS (SELECT docid, i,
             ascii(substr(base, CAST(i AS INT), 1)) - 48 AS dg
           FROM pl, unnest(range(1, 16)) AS u(i)),
         bs AS (SELECT docid, sum(CASE WHEN (i - 1) % 2 = 0 THEN
               2 * dg - CASE WHEN 2 * dg > 9 THEN 9 ELSE 0 END
             ELSE dg END) AS s FROM bd GROUP BY 1),
         cp AS (SELECT pl.docid, pl.base, pl.docid % 3 = 0 AS pv,
             pl.t || ' ' || pl.base || CAST(
               CASE WHEN pl.docid % 3 = 0 THEN (10 - bs.s % 10) % 10
                 ELSE ((10 - bs.s % 10) % 10 + 1) % 10 END AS VARCHAR)
               AS tt FROM pl JOIN bs USING (docid)),
         ar AS (SELECT docid, base, pv,
             regexp_extract_all(tt, '[0-9]{13,19}') AS arr FROM cp),
         rr AS (SELECT docid, base, pv, i AS run_i,
             arr[CAST(i AS INT)] AS run
           FROM ar, unnest(range(1, len(arr) + 1)) AS u(i)),
         rd AS (SELECT docid, run_i, len(run) AS rl, j,
             ascii(substr(run, CAST(j AS INT), 1)) - 48 AS dg
           FROM rr, unnest(range(1, len(run) + 1)) AS u(j)),
         ds AS (SELECT docid, run_i,
             sum(CASE WHEN (rl - (j - 1)) % 2 = 0 THEN
                 2 * dg - CASE WHEN 2 * dg > 9 THEN 9 ELSE 0 END
               ELSE dg END) % 10 = 0 AS luhn_ok
           FROM rd GROUP BY 1, 2),
         cl AS (SELECT CASE
               WHEN starts_with(run, base) AND pv THEN 'planted_valid'
               WHEN starts_with(run, base) THEN 'planted_invalid'
               ELSE 'natural' END AS cls, luhn_ok
           FROM rr JOIN ds USING (docid, run_i))
         SELECT cls, count(*) AS n_runs,
           CAST(sum(CASE WHEN luhn_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_luhn_valid,
           CAST((10000 * sum(CASE WHEN luhn_ok THEN 1 ELSE 0 END))
             // count(*) AS BIGINT) AS valid_bp
         FROM cl GROUP BY 1""",

    // Homoglyph audit: same plant, RE2 \p{Cyrillic} mirroring Java
    // \p{IsCyrillic}, same two-stage non-ASCII prescan.
    "q387_homoglyphs" ->
      """WITH pl AS (SELECT lang, CASE WHEN doc_id % 5 = 0
             THEN text || ' d' || chr(1072) || 't' || chr(1072) || CAST(doc_id AS VARCHAR)
             ELSE text END AS t2 FROM documents),
         m AS (SELECT lang, CASE WHEN regexp_matches(t2, '[^\x00-\x7f]')
             THEN len(regexp_extract_all(t2,
               '[a-zA-Z][^ ]*\p{Cyrillic}|\p{Cyrillic}[^ ]*[a-zA-Z]'))
             ELSE 0 END AS n_mixed FROM pl)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_mixed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_docs,
           CAST(sum(n_mixed) AS BIGINT) AS n_mixed_tokens,
           CAST((10000 * sum(CASE WHEN n_mixed > 0 THEN 1 ELSE 0 END))
             // count(*) AS BIGINT) AS flagged_bp
         FROM m GROUP BY 1""",

    // Markup scrub: same plant, tag strip + entity decode with the 'g'
    // flag (DuckDB replaces first-only by default), amp decoded LAST,
    // expected shrink from per-type counts on the tag-stripped text.
    "q388_markup_scrub" ->
      """WITH pl AS (SELECT lang, text || ' <a href="http://x/'
             || CAST(doc_id AS VARCHAR) || '">link'
             || CAST(doc_id AS VARCHAR) || '</a> &amp; <b>b'
             || CAST(doc_id AS VARCHAR)
             || '</b> &lt;&gt;&quot;&#39;' AS t2 FROM documents),
         s1 AS (SELECT lang, t2,
             regexp_replace(t2, '<[^>]*>', '', 'g') AS ts_ FROM pl),
         s2 AS (SELECT lang, t2, ts_,
             regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(ts_,
                 '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                 '&quot;', '"', 'g'), '&#39;', '''', 'g'),
                 '&amp;', '&', 'g') AS clean FROM s1),
         r AS (SELECT lang, len(t2) AS raw_len, len(clean) AS clean_len,
             len(regexp_extract_all(t2, '<[^>]*>')) AS n_tags,
             len(t2) - len(ts_) AS tag_len,
             len(regexp_extract_all(ts_, '&(amp|lt|gt|quot|#39);'))
               AS n_entities,
             4 * len(regexp_extract_all(ts_, '&amp;'))
               + 3 * len(regexp_extract_all(ts_, '&lt;'))
               + 3 * len(regexp_extract_all(ts_, '&gt;'))
               + 5 * len(regexp_extract_all(ts_, '&quot;'))
               + 4 * len(regexp_extract_all(ts_, '&#39;')) AS ent_shrink
           FROM s2)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(raw_len) AS BIGINT) AS sum_raw_len,
           CAST(sum(clean_len) AS BIGINT) AS sum_clean_len,
           CAST(sum(n_tags) AS BIGINT) AS n_tags,
           CAST(sum(n_entities) AS BIGINT) AS n_entities,
           CAST(sum(raw_len - clean_len - tag_len - ent_shrink)
             AS BIGINT) AS residual
         FROM r GROUP BY 1""",

    // Dunn post-hoc: the q323 pooled mid-rank chain, k-row pair
    // self-join, tie-corrected pooled variance, one pinned double
    // order per pair; Bonferroni z for k=5's 10 comparisons.
    "q389_dunn" ->
      s"""WITH pb AS (SELECT ${C("value")} AS v, event_type AS g,
             count(*) AS ng FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         pv AS (SELECT v, sum(ng) AS t FROM pb GROUP BY 1),
         rk AS (SELECT v, 2 * (sum(t) OVER (ORDER BY v ASC ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS r2
           FROM pv),
         bg AS (SELECT g, sum(ng) AS n_g,
             sum(CAST(ng AS HUGEINT) * r2) AS rg2
           FROM pb JOIN rk USING (v) GROUP BY 1),
         tot AS (SELECT sum(n_g) AS n FROM bg),
         tie AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie3
           FROM pv),
         pr AS (SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a,
             b.n_g AS n_b, a.rg2 AS ra2, b.rg2 AS rb2
           FROM bg a, bg b WHERE a.g < b.g),
         zz AS (SELECT g_a, g_b, n_a, n_b, tot.n, tie.tie3,
             (CAST(ra2 AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(rb2 AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2 AS num,
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
               - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) - 1)) / 12
               AS vt
           FROM pr CROSS JOIN tot CROSS JOIN tie)
         SELECT g_a, g_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n < 2 OR vt <= 0 THEN NULL
             ELSE floor(num / sqrt(vt * (1.0 / CAST(n_a AS DOUBLE)
               + 1.0 / CAST(n_b AS DOUBLE))) * 1000 + 0.5)
             END AS BIGINT) AS z_milli,
           CAST(CASE WHEN n < 2 OR vt <= 0 THEN NULL
             WHEN abs(floor(num / sqrt(vt * (1.0 / CAST(n_a AS DOUBLE)
               + 1.0 / CAST(n_b AS DOUBLE))) * 1000 + 0.5)) > 2807
             THEN 1 ELSE 0 END AS INT) AS is_significant
         FROM zz ORDER BY g_a, g_b""",

    // Effect sizes on the welch moment chain: pooled-sd Cohen d,
    // Hedges small-n correction, Glass control-side delta.
    "q390_effect_size" ->
      s"""WITH m AS (SELECT
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS
               HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE
               CAST(${C("value")} AS HUGEINT) END) AS sb,
             sum(CASE WHEN user_id % 2 = 0 THEN CAST(${C("value")} AS
               HUGEINT) * ${C("value")} ELSE 0 END) AS ssa,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE
               CAST(${C("value")} AS HUGEINT) * ${C("value")} END) AS ssb
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         d AS (SELECT n_a, n_b, sa, sb,
             CAST(n_a AS HUGEINT) * ssa - sa * sa AS num_a,
             CAST(n_b AS HUGEINT) * ssb - sb * sb AS num_b FROM m),
         f AS (SELECT n_a, n_b, num_a, num_b,
             CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff,
             CAST(num_a AS DOUBLE) / CAST(CAST(n_a AS HUGEINT)
               * (n_a - 1) AS DOUBLE) AS var_a,
             CAST(num_b AS DOUBLE) / CAST(CAST(n_b AS HUGEINT)
               * (n_b - 1) AS DOUBLE) AS var_b FROM d),
         g AS (SELECT n_a, n_b, num_a, num_b, diff, var_b,
             sqrt(((CAST(n_a AS DOUBLE) - 1) * var_a
               + (CAST(n_b AS DOUBLE) - 1) * var_b)
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2)) AS sp
           FROM f)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_a + num_b = 0
             THEN NULL ELSE floor(diff / sp * 1000 + 0.5)
             END AS BIGINT) AS cohen_d_milli,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_a + num_b = 0
             THEN NULL ELSE floor(diff / sp * (1 - 3 /
               (4 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) - 9))
               * 1000 + 0.5) END AS BIGINT) AS hedges_g_milli,
           CAST(CASE WHEN n_a < 2 OR n_b < 2 OR num_b = 0
             THEN NULL ELSE floor(diff / sqrt(var_b) * 1000 + 0.5)
             END AS BIGINT) AS glass_delta_milli
         FROM g""",

    // Yuen: per-arm quantile_disc cuts (members, exact), tie-inclusive
    // trim + winsorized clamp, exact moments, pinned t/df doubles.
    "q391_yuen" ->
      s"""WITH v0 AS (SELECT ${C("value")} AS v,
             CAST(user_id % 2 = 0 AS INT) AS arm FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         c AS (SELECT arm, quantile_disc(v, 0.2) AS p20,
             quantile_disc(v, 0.8) AS p80 FROM v0 GROUP BY 1),
         tg AS (SELECT v0.arm, v,
             greatest(least(v, c.p80), c.p20) AS wv,
             v >= c.p20 AND v <= c.p80 AS kept
           FROM v0 JOIN c ON c.arm = v0.arm),
         m AS (SELECT arm, count(*) AS n,
             sum(CASE WHEN kept THEN 1 ELSE 0 END) AS h,
             sum(CASE WHEN kept THEN CAST(v AS HUGEINT) ELSE 0 END)
               AS st,
             sum(CAST(wv AS HUGEINT)) AS sw,
             sum(CAST(wv AS HUGEINT) * wv) AS ssw FROM tg GROUP BY 1),
         j AS (SELECT a.n AS n_a, a.h AS h_a, a.st AS st_a,
             a.sw AS sw_a, a.ssw AS ssw_a,
             b.n AS n_b, b.h AS h_b, b.st AS st_b, b.sw AS sw_b,
             b.ssw AS ssw_b
           FROM (SELECT * FROM m WHERE arm = 1) a,
                (SELECT * FROM m WHERE arm = 0) b),
         w AS (SELECT *,
             CAST(CAST(n_a AS HUGEINT) * ssw_a - sw_a * sw_a AS DOUBLE)
               / CAST(CAST(n_a AS HUGEINT) * (n_a - 1) AS DOUBLE)
               * (CAST(n_a AS DOUBLE) - 1)
               / (CAST(h_a AS DOUBLE) * (CAST(h_a AS DOUBLE) - 1)) AS da,
             CAST(CAST(n_b AS HUGEINT) * ssw_b - sw_b * sw_b AS DOUBLE)
               / CAST(CAST(n_b AS HUGEINT) * (n_b - 1) AS DOUBLE)
               * (CAST(n_b AS DOUBLE) - 1)
               / (CAST(h_b AS DOUBLE) * (CAST(h_b AS DOUBLE) - 1)) AS db,
             (CAST(n_a AS HUGEINT) * ssw_a - sw_a * sw_a)
               + (CAST(n_b AS HUGEINT) * ssw_b - sw_b * sw_b) AS vsum
           FROM j)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(h_a AS BIGINT) AS h_a, CAST(h_b AS BIGINT) AS h_b,
           CAST(st_a // CAST(h_a AS HUGEINT) AS BIGINT) AS tmean_a_c,
           CAST(st_b // CAST(h_b AS HUGEINT) AS BIGINT) AS tmean_b_c,
           CAST(CASE WHEN h_a < 2 OR h_b < 2 OR vsum = 0 THEN NULL
             ELSE floor((CAST(st_a AS DOUBLE) / CAST(h_a AS DOUBLE)
               - CAST(st_b AS DOUBLE) / CAST(h_b AS DOUBLE))
               / sqrt(da + db) * 1000 + 0.5) END AS BIGINT) AS t_milli,
           CAST(CASE WHEN h_a < 2 OR h_b < 2 OR vsum = 0 THEN NULL
             ELSE floor((da + db) * (da + db)
               / (da * da / (CAST(h_a AS DOUBLE) - 1)
                 + db * db / (CAST(h_b AS DOUBLE) - 1)) * 1000 + 0.5)
             END AS BIGINT) AS df_milli,
           CAST(CASE WHEN h_a < 2 OR h_b < 2 OR vsum = 0 THEN NULL
             WHEN abs(floor((CAST(st_a AS DOUBLE) / CAST(h_a AS DOUBLE)
               - CAST(st_b AS DOUBLE) / CAST(h_b AS DOUBLE))
               / sqrt(da + db) * 1000 + 0.5)) > 1960 THEN 1 ELSE 0
             END AS INT) AS is_significant
         FROM w""",

    // Delta-method ratio SE: one moment pass per arm, the q382 point
    // estimate bit-equal by the shared idiv, the linearized variance
    // in one pinned double order (epsilon-negative guarded).
    "q392_delta_ratio" ->
      s"""WITH pu AS (SELECT user_id AS u, CAST(user_id % 2 = 0 AS INT)
               AS arm, count(*) AS x, sum(${C("value")}) AS y
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         m AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy FROM pu GROUP BY 1),
         f AS (SELECT arm, n, sx, sy,
             CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
             CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cyy,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cxy,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cxx FROM m),
         v AS (SELECT arm, n, sx, sy,
             (cyy - 2 * r * cxy + r * r * cxx) * CAST(n AS DOUBLE)
               / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS var_r
           FROM f),
         o AS (SELECT CAST(arm AS BIGINT) AS arm,
             CAST(n AS BIGINT) AS n_units,
             CAST((1000000 * CAST(sy AS HUGEINT)) // CAST(sx AS HUGEINT)
               AS BIGINT) AS ratio_micro,
             CAST(CASE WHEN n < 2 OR sx = 0 THEN NULL
               ELSE floor(sqrt(greatest(var_r, 0)) * 1000000 + 0.5)
               END AS BIGINT) AS se_micro FROM v)
         SELECT arm, n_units, ratio_micro, se_micro,
           CASE WHEN se_micro IS NULL THEN NULL
             ELSE ratio_micro - (196 * se_micro) // 100 END
             AS ci95_lo_micro,
           CASE WHEN se_micro IS NULL THEN NULL
             ELSE ratio_micro + (196 * se_micro) // 100 END
             AS ci95_hi_micro
         FROM o ORDER BY arm""",

    // Ratio-metric MDE: the q392 chain for both arms, combined at
    // the fixed 2.8016 (5%/80%) constant.
    "q393_ratio_mde" ->
      s"""WITH pu AS (SELECT user_id AS u, CAST(user_id % 2 = 0 AS INT)
               AS arm, count(*) AS x, sum(${C("value")}) AS y
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         m AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy FROM pu GROUP BY 1),
         f AS (SELECT arm, n, sx, sy,
             CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
             CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cyy,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cxy,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
               AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
               AS cxx FROM m),
         v AS (SELECT arm, n, sx, sy,
             (cyy - 2 * r * cxy + r * r * cxx) * CAST(n AS DOUBLE)
               / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS var_r
           FROM f),
         o AS (SELECT arm, CAST(n AS BIGINT) AS n_units,
             CAST((1000000 * CAST(sy AS HUGEINT)) // CAST(sx AS HUGEINT)
               AS BIGINT) AS ratio_micro,
             CAST(CASE WHEN n < 2 OR sx = 0 THEN NULL
               ELSE floor(sqrt(greatest(var_r, 0)) * 1000000 + 0.5)
               END AS BIGINT) AS se_micro FROM v),
         ab AS (SELECT a.n_units AS n_a, b.n_units AS n_b,
             a.ratio_micro AS r_a, b.ratio_micro AS r_b,
             a.se_micro AS se_a, b.se_micro AS se_b
           FROM (SELECT * FROM o WHERE arm = 1) a,
                (SELECT * FROM o WHERE arm = 0) b),
         x AS (SELECT n_a, n_b, r_a, r_b,
             CASE WHEN se_a IS NULL OR se_b IS NULL THEN NULL
               ELSE CAST(floor(2.8016 * sqrt(CAST(se_a AS DOUBLE) * se_a
                 + CAST(se_b AS DOUBLE) * se_b) + 0.5) AS BIGINT)
               END AS mde_abs_micro,
             CAST((CAST(n_a AS HUGEINT) * r_a + CAST(n_b AS HUGEINT)
               * r_b) // (CAST(n_a AS HUGEINT) + n_b) AS BIGINT)
               AS pooled_micro FROM ab)
         SELECT n_a, n_b, r_a, r_b, mde_abs_micro, pooled_micro,
           CAST(CASE WHEN mde_abs_micro IS NULL OR pooled_micro = 0
             THEN NULL ELSE (10000 * mde_abs_micro) // pooled_micro
             END AS BIGINT) AS mde_rel_bp
         FROM x""",

    // A/A calibration: the q208 mix64 deal (one md5 per unit, B
    // splitmix expansions, low bit = arm), then the pooled
    // two-proportion z per replicate and the bi=-1 summary row.
    "q394_aa_calibration" ->
      s"""WITH uc AS (SELECT user_id AS u,
             max(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS conv
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         up AS (SELECT u, conv,
             md5_number_upper('aa-epoch-1:' || CAST(u AS VARCHAR)) AS h
           FROM uc),
         e AS (SELECT u, conv, h, unnest(range(0, 32)) AS bi FROM up),
         sd AS (SELECT u, conv, bi,
             CAST((h::HUGEINT + bi::HUGEINT * 11400714819323198485)
               % 18446744073709551616 AS UBIGINT) AS seed FROM e),
         ${"ax0 AS (SELECT u, conv, bi, CAST(seed AS UBIGINT) AS z FROM sd)"},
         ax1 AS (SELECT u, conv, bi, CAST((z::HUGEINT + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM ax0),
         ax2 AS (SELECT u, conv, bi, xor(z, z >> 30) AS z FROM ax1),
         ax3 AS (SELECT u, conv, bi, CAST(((z >> 32)::HUGEINT * 13787848793156543929 % 4294967296 * 4294967296
               + (z & 4294967295)::HUGEINT * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM ax2),
         ax4 AS (SELECT u, conv, bi, xor(z, z >> 27) AS z FROM ax3),
         ax5 AS (SELECT u, conv, bi, CAST(((z >> 32)::HUGEINT * 10723151780598845931 % 4294967296 * 4294967296
               + (z & 4294967295)::HUGEINT * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM ax4),
         ar AS (SELECT u, conv, bi,
             CAST(xor(z, z >> 31) & 1 AS BIGINT) AS arm FROM ax5),
         rp AS (SELECT bi,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS k_a,
             sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS k_b
           FROM ar GROUP BY 1),
         zz AS (SELECT CAST(bi AS BIGINT) AS bi,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
             CAST(CASE WHEN n_a = 0 OR n_b = 0 OR k_a + k_b = 0
                 OR k_a + k_b = n_a + n_b THEN NULL
               ELSE floor((CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(k_a + k_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                   * (1 - CAST(k_a + k_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE)))
                 * 1000 + 0.5) END AS BIGINT) AS z_milli
           FROM rp),
         pr AS (SELECT bi, n_a, n_b, k_a, k_b, z_milli,
             CAST(CASE WHEN z_milli IS NULL THEN NULL
               WHEN abs(z_milli) > 1960 THEN 1 ELSE 0 END AS INT)
               AS is_fp FROM zz)
         SELECT * FROM pr
         UNION ALL
         SELECT CAST(-1 AS BIGINT), CAST(sum(n_a) AS BIGINT),
           CAST(sum(n_b) AS BIGINT), CAST(sum(k_a) AS BIGINT),
           CAST(sum(k_b) AS BIGINT), CAST(NULL AS BIGINT),
           CAST(sum(is_fp) AS INT) FROM pr
         ORDER BY bi""",

    // Gamma + Somers' D: the q322 pair-count CTEs; all three outputs
    // are pure integer idiv ratios (no doubles — unlike tau-b's sqrt).
    "q395_ordinal_assoc" ->
      s"""WITH u AS MATERIALIZED (
           SELECT o_orderdate AS k, CAST(count(*) AS BIGINT) AS xv,
             CAST(sum(${C("o_totalprice")}) AS BIGINT) AS yv
           FROM orders GROUP BY 1),
         cd AS (SELECT
             CAST(sum(CASE WHEN (a.xv > b.xv AND a.yv > b.yv)
               OR (a.xv < b.xv AND a.yv < b.yv) THEN 1 ELSE 0 END)
               AS HUGEINT) AS nc,
             CAST(sum(CASE WHEN (a.xv > b.xv AND a.yv < b.yv)
               OR (a.xv < b.xv AND a.yv > b.yv) THEN 1 ELSE 0 END)
               AS HUGEINT) AS nd
           FROM u a JOIN u b ON a.k < b.k),
         tx AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS HUGEINT)
             AS ntx FROM (SELECT count(*) AS t FROM u GROUP BY xv)),
         ty AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS HUGEINT)
             AS nty FROM (SELECT count(*) AS t FROM u GROUP BY yv)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u)
         SELECT n AS n_units, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs,
           CAST(nc AS BIGINT) AS concordant, CAST(nd AS BIGINT)
             AS discordant,
           CAST(CASE WHEN nc + nd = 0 THEN NULL
             ELSE (10000 * (nc - nd)) // (nc + nd) END AS BIGINT)
             AS gamma_bp,
           CAST(CASE WHEN CAST(n AS HUGEINT) * (n - 1) // 2 - ntx = 0
             THEN NULL ELSE (10000 * (nc - nd))
               // (CAST(n AS HUGEINT) * (n - 1) // 2 - ntx)
             END AS BIGINT) AS somers_d_yx_bp,
           CAST(CASE WHEN CAST(n AS HUGEINT) * (n - 1) // 2 - nty = 0
             THEN NULL ELSE (10000 * (nc - nd))
               // (CAST(n AS HUGEINT) * (n - 1) // 2 - nty)
             END AS BIGINT) AS somers_d_xy_bp
         FROM cd, tx, ty, nn""",

    // VAD: the q105 generator replayed with the window gate, window
    // mean-square threshold (no sqrt), run/segment accounting via
    // lag + the gaps-and-islands trick — exact integers end to end.
    "q396_vad" ->
      """WITH n AS (SELECT doc_id,
             800 + (doc_id * 2654435761) % 1600 AS ns FROM documents),
         s AS (SELECT doc_id, unnest(range(ns)) AS i FROM n),
         v0 AS (SELECT doc_id, i // 160 AS w,
             ((i * 127 + doc_id * 31) % 65536) - 32768 AS raw FROM s),
         v AS (SELECT doc_id, w,
             CASE WHEN (w + doc_id) % 4 = 0 THEN (raw % 257) - 128
               ELSE raw END AS v FROM v0),
         ww AS (SELECT doc_id, w, count(*) AS nw,
             sum(CAST(v AS HUGEINT) * v) AS ss FROM v GROUP BY 1, 2),
         fl AS (SELECT doc_id, w, (ss // nw) < 1000000 AS silent FROM ww),
         rr AS (SELECT doc_id, w, silent,
             lag(silent, 1, TRUE) OVER (PARTITION BY doc_id ORDER BY w)
               AS prev FROM fl),
         seg AS (SELECT doc_id,
             sum(CASE WHEN NOT silent AND prev THEN 1 ELSE 0 END)
               AS n_segments FROM rr GROUP BY 1),
         sil AS (SELECT doc_id,
             w - row_number() OVER (PARTITION BY doc_id ORDER BY w)
               AS grp FROM fl WHERE silent),
         ls AS (SELECT doc_id, max(c) AS longest FROM
             (SELECT doc_id, grp, count(*) AS c FROM sil GROUP BY 1, 2)
           GROUP BY 1),
         ag AS (SELECT doc_id, count(*) AS n_windows,
             sum(CASE WHEN silent THEN 1 ELSE 0 END) AS n_silent
           FROM fl GROUP BY 1)
         SELECT ag.doc_id, CAST(n_windows AS BIGINT) AS n_windows,
           CAST(n_silent AS BIGINT) AS n_silent,
           CAST(coalesce(seg.n_segments, 0) AS BIGINT) AS n_segments,
           CAST((10000 * (n_windows - n_silent)) // n_windows AS BIGINT)
             AS active_bp,
           CAST(coalesce(ls.longest, 0) AS BIGINT) AS longest_silence
         FROM ag JOIN seg USING (doc_id)
         LEFT JOIN ls USING (doc_id)""",

    // q398: distinct l-diversity of the q361 release slice; the $1000
    // balance band (cents-lattice, +100000 offset so the idiv never
    // truncates a negative) is the sensitive attribute. Sums CAST to
    // BIGINT (the DuckDB HUGEINT widening trap).
    "q398_l_diversity" ->
      s"""WITH rel AS (SELECT c_nationkey, c_mktsegment,
             (${C("c_acctbal")} + 100000) // 100000 AS sens
           FROM customer WHERE c_acctbal >= 9000),
         g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_rows,
             count(DISTINCT sens) AS l FROM rel GROUP BY 1, 2),
         bands AS (SELECT CASE WHEN l = 1 THEN 'l=1'
               WHEN l <= 3 THEN 'l=2-3' ELSE 'l>=4' END AS band,
             n_rows, l FROM g),
         per AS (SELECT band, CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n_rows) AS BIGINT) AS n_released,
             CAST(min(l) AS BIGINT) AS min_l,
             CAST(NULL AS BIGINT) AS at_risk_bp
           FROM bands GROUP BY 1),
         allr AS (SELECT 'ALL' AS band,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n_rows) AS BIGINT) AS n_released,
             CAST(min(l) AS BIGINT) AS min_l,
             CAST((10000 * sum(CASE WHEN l = 1 THEN n_rows ELSE 0 END))
               // sum(n_rows) AS BIGINT) AS at_risk_bp
           FROM g)
         SELECT * FROM per UNION ALL SELECT * FROM allr""",

    // q399: t-closeness over the ordered balance band — EMD as the
    // cumulative-share-difference sum on the bp lattice, normalized
    // by m-1; top-20 worst groups + the ALL row.
    "q399_t_closeness" ->
      s"""WITH rel AS (SELECT c_nationkey, c_mktsegment,
             (${C("c_acctbal")} + 100000) // 100000 AS sens
           FROM customer),
         tot AS (SELECT count(*) AS n FROM rel),
         gdist AS (SELECT sens, count(*) AS cnt_g FROM rel GROUP BY 1),
         mm AS (SELECT count(*) AS m FROM gdist),
         grp AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_grp
           FROM rel GROUP BY 1, 2),
         cell AS (SELECT c_nationkey, c_mktsegment, sens,
             count(*) AS cnt FROM rel GROUP BY 1, 2, 3),
         grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.n_grp,
             gl.sens, gl.cnt_g, coalesce(c.cnt, 0) AS cnt
           FROM grp g CROSS JOIN gdist gl
           LEFT JOIN cell c ON c.c_nationkey = g.c_nationkey
             AND c.c_mktsegment = g.c_mktsegment AND c.sens = gl.sens),
         cum AS (SELECT c_nationkey, c_mktsegment, n_grp,
             sum((10000 * cnt) // n_grp) OVER w AS cum_p,
             sum((10000 * cnt_g) // (SELECT n FROM tot)) OVER w AS cum_q
           FROM grid WINDOW w AS (
             PARTITION BY c_nationkey, c_mktsegment ORDER BY sens)),
         pg AS (SELECT c_nationkey, c_mktsegment,
             CAST(n_grp AS BIGINT) AS n_rows,
             CAST(sum(abs(cum_p - cum_q))
               // (SELECT m - 1 FROM mm) AS BIGINT) AS t_bp
           FROM cum GROUP BY 1, 2, 3),
         worst AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
             c_mktsegment, n_rows, t_bp,
             CAST(NULL AS BIGINT) AS n_over_2000bp
           FROM pg
           ORDER BY t_bp DESC, c_nationkey, c_mktsegment LIMIT 20),
         allr AS (SELECT CAST(NULL AS BIGINT) AS c_nationkey,
             CAST(NULL AS VARCHAR) AS c_mktsegment,
             CAST(sum(n_rows) AS BIGINT) AS n_rows,
             CAST(max(t_bp) AS BIGINT) AS t_bp,
             CAST(sum(CASE WHEN t_bp > 2000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_over_2000bp
           FROM pg)
         SELECT * FROM worst UNION ALL SELECT * FROM allr""",

    // q400: group-sequential boundary audit — accrual-ordered looks,
    // the q394 pooled-z assembly per look, boundary constants are the
    // SAME driver literals the Scala side pins (Events.PocockMilliK5 /
    // ObfMilliK5).
    "q400_group_sequential" ->
      s"""WITH uc AS (SELECT user_id AS u,
             max(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS conv,
             min(ts) AS t0,
             max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS arm
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         rk AS (SELECT *, row_number() OVER (ORDER BY t0, u) AS r
           FROM uc),
         nn AS (SELECT count(*) AS n FROM uc),
         lk AS (SELECT unnest(range(1, 6)) AS look),
         sub AS (SELECT l.look, rk.conv, rk.arm FROM lk l CROSS JOIN rk
           WHERE rk.r <= (l.look * (SELECT n FROM nn) + 4) // 5),
         rp AS (SELECT look,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS k_a,
             sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS k_b
           FROM sub GROUP BY 1),
         zz AS (SELECT CAST(look AS BIGINT) AS look,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
             CAST(CASE WHEN n_a = 0 OR n_b = 0 OR k_a + k_b = 0
                 OR k_a + k_b = n_a + n_b THEN NULL
               ELSE floor((CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(k_a + k_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                   * (1 - CAST(k_a + k_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE)))
                 * 1000 + 0.5) END AS BIGINT) AS z_milli
           FROM rp)
         SELECT look, n_a, n_b, k_a, k_b, z_milli,
           CAST(${Events.PocockMilliK5} AS BIGINT) AS pocock_milli,
           CAST(CASE look ${Events.ObfMilliK5.zipWithIndex.map {
             case (c, i) => s"WHEN ${i + 1} THEN $c" }.mkString(" ")}
             END AS BIGINT) AS obf_milli,
           CAST(CASE WHEN z_milli IS NULL THEN NULL
             WHEN abs(z_milli) >= ${Events.PocockMilliK5} THEN 1
             ELSE 0 END AS INT) AS pocock_stop,
           CAST(CASE WHEN z_milli IS NULL THEN NULL
             WHEN abs(z_milli) >= (CASE look ${Events.ObfMilliK5.zipWithIndex
               .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }
               .mkString(" ")} END) THEN 1
             ELSE 0 END AS INT) AS obf_stop
         FROM zz""",

    // q401: Fleiss' kappa — the three size-rater bands replayed, the
    // exact-integer kappa reduction (x10000, one idiv) shared with the
    // Scala side; tertile cut literals identical in both engines.
    "q401_fleiss_kappa" ->
      """WITH raw AS (SELECT doc_id AS i,
             CASE WHEN n_chars < 216 THEN 0
                  WHEN n_chars < 380 THEN 1 ELSE 2 END AS r_len,
             CASE WHEN length(text) - length(replace(text, ' ', '')) < 38 THEN 0
                  WHEN length(text) - length(replace(text, ' ', '')) < 68 THEN 1
                  ELSE 2 END AS r_ws,
             CASE WHEN length(text) - length(replace(text, 'e', '')) < 17 THEN 0
                  WHEN length(text) - length(replace(text, 'e', '')) < 29 THEN 1
                  ELSE 2 END AS r_e
           FROM documents),
         longf AS (SELECT i, r_len AS label FROM raw
           UNION ALL SELECT i, r_ws FROM raw
           UNION ALL SELECT i, r_e FROM raw),
         cell AS (SELECT i, label AS j, count(*) AS nij FROM longf GROUP BY 1, 2),
         per AS (SELECT i, sum(nij * nij) AS sq, sum(nij) AS nv FROM cell GROUP BY 1),
         a AS (SELECT count(*) AS n_items, sum(sq - 3) AS a_sum,
             max(CASE WHEN nv <> 3 THEN 1 ELSE 0 END) AS ragged FROM per),
         cats AS (SELECT j, sum(nij) AS c_total FROM cell GROUP BY 1),
         s AS (SELECT sum(c_total * c_total) AS s_sum FROM cats)
         SELECT CAST(j AS VARCHAR) AS category,
           CAST(c_total AS BIGINT) AS c_total,
           CAST(10000 * c_total // (n_items * 3) AS BIGINT) AS share_bp,
           CAST(NULL AS BIGINT) AS p_bar_bp, CAST(NULL AS BIGINT) AS p_e_bp,
           CAST(NULL AS BIGINT) AS kappa_bp
         FROM cats, a
         UNION ALL
         SELECT 'ALL', CAST(n_items * 3 AS BIGINT), NULL,
           CAST(10000 * a_sum // (n_items * 6) AS BIGINT),
           CAST(10000 * s_sum // (n_items * n_items * 9) AS BIGINT),
           CAST(CASE WHEN ragged = 1 THEN NULL
             WHEN n_items * n_items * 9 = s_sum THEN NULL
             ELSE 10000 * (a_sum * 3 * n_items - s_sum * 2)
               // (n_items * n_items * 18 - s_sum * 2) END AS BIGINT)
         FROM a, s""",

    // q402: Cochran's Q — detector totals + the discordant-row count,
    // q on the exact lattice, chi-sq(2) critical literal shared with
    // Text.ChiSqCritMilliDf2.
    "q402_cochran_q" ->
      s"""WITH f AS (SELECT doc_id,
             CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS d_len,
             CASE WHEN length(text) - length(replace(text, ' ', '')) > 55
               THEN 1 ELSE 0 END AS d_ws,
             CASE WHEN contains(text, 'window') THEN 1 ELSE 0 END AS d_marker
           FROM documents),
         m AS (SELECT count(*) AS n_items,
             sum(d_len + d_ws + d_marker) AS t,
             sum((d_len + d_ws + d_marker) * (d_len + d_ws + d_marker)) AS r_sq,
             sum(CASE WHEN d_len + d_ws + d_marker IN (1, 2) THEN 1 ELSE 0 END)
               AS n_discord,
             sum(d_len) AS c_len, sum(d_ws) AS c_ws, sum(d_marker) AS c_mk
           FROM f),
         q AS (SELECT *, 3 * t - r_sq AS den,
             2000 * (3 * (c_len * c_len + c_ws * c_ws + c_mk * c_mk) - t * t)
               AS num FROM m)
         SELECT detector, CAST(hits AS BIGINT) AS hits,
           CAST(rate_bp AS BIGINT) AS rate_bp,
           CAST(n_discord AS BIGINT) AS n_discord,
           CAST(q_milli AS BIGINT) AS q_milli, CAST(df AS BIGINT) AS df,
           CAST(reject AS INT) AS reject
         FROM (
           SELECT 'd_len' AS detector, c_len AS hits,
             10000 * c_len // n_items AS rate_bp,
             NULL AS n_discord, NULL AS q_milli, NULL AS df, NULL AS reject
           FROM q
           UNION ALL
           SELECT 'd_ws', c_ws, 10000 * c_ws // n_items, NULL, NULL, NULL, NULL FROM q
           UNION ALL
           SELECT 'd_marker', c_mk, 10000 * c_mk // n_items, NULL, NULL, NULL, NULL FROM q
           UNION ALL
           SELECT 'ALL', t, NULL, n_discord,
             CASE WHEN den = 0 THEN NULL ELSE num // den END, 2,
             CASE WHEN den = 0 THEN NULL
               WHEN num // den >= ${Text.ChiSqCritMilliDf2} THEN 1 ELSE 0 END
           FROM q)""",

    // q403: DiD — per-user pre/post cents pivot, the four cells, the
    // arm-pooled milli-cent deltas, and the q337 Welch assembly over
    // the per-user deltas, verbatim.
    "q403_did" ->
      s"""WITH pu AS (SELECT user_id AS u,
             max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS treat,
             sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
               THEN ${C("value")} ELSE 0 END) AS c_post,
             sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
               THEN 0 ELSE ${C("value")} END) AS c_pre
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         cells AS (SELECT treat, post, count(*) AS n_units,
             sum(c) AS total_cents
           FROM (SELECT treat, 0 AS post, c_pre AS c FROM pu
             UNION ALL SELECT treat, 1, c_post FROM pu)
           GROUP BY 1, 2),
         del AS (SELECT treat, c_post - c_pre AS d FROM pu),
         pt AS (SELECT
             sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN treat = 1 THEN CAST(d AS HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN treat = 0 THEN CAST(d AS HUGEINT) ELSE 0 END) AS sb,
             sum(CASE WHEN treat = 1 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS ssa,
             sum(CASE WHEN treat = 0 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS ssb
           FROM del),
         w AS (SELECT *,
             CAST(n_a AS HUGEINT) * ssa - sa * sa AS num_a,
             CAST(n_b AS HUGEINT) * ssb - sb * sb AS num_b,
             CAST(CAST(n_a AS HUGEINT) * ssa - sa * sa AS DOUBLE)
               / CAST(CAST(n_a AS HUGEINT) * n_a * (n_a - 1) AS DOUBLE) AS qa,
             CAST(CAST(n_b AS HUGEINT) * ssb - sb * sb AS DOUBLE)
               / CAST(CAST(n_b AS HUGEINT) * n_b * (n_b - 1) AS DOUBLE) AS qb
           FROM pt),
         wt AS (SELECT *,
             (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)) / sqrt(qa + qb) AS tv,
             (n_a < 2 OR n_b < 2 OR num_a + num_b = 0) AS bad
           FROM w)
         SELECT CAST(treat AS INT) AS treat, CAST(post AS INT) AS post,
           CAST(n_units AS BIGINT) AS n_units,
           CAST(total_cents AS BIGINT) AS total_cents,
           CAST(1000 * total_cents // n_units AS BIGINT) AS mean_cents_milli,
           CAST(NULL AS BIGINT) AS did_milli,
           CAST(NULL AS BIGINT) AS t_milli, CAST(NULL AS INT) AS is_significant
         FROM cells
         UNION ALL
         SELECT NULL, NULL, CAST(wt.n_a + wt.n_b AS BIGINT), NULL, NULL,
           CAST(1000 * wt.sa // wt.n_a - 1000 * wt.sb // wt.n_b AS BIGINT),
           CAST(CASE WHEN bad THEN NULL
             ELSE floor(tv * 1000 + 0.5) END AS BIGINT),
           CAST(CASE WHEN bad THEN NULL
             WHEN abs(floor(tv * 1000 + 0.5)) > 1960 THEN 1 ELSE 0 END AS INT)
         FROM wt""",

    // q404: QTE — exact decile order statistics per arm, the 1-based
    // ceil(p*n/10) rank over the (value, unit) total order.
    "q404_qte" ->
      s"""WITH pu AS (SELECT user_id AS u,
             max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS treat,
             sum(${C("value")}) AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         rk AS (SELECT treat, c, u,
             row_number() OVER (PARTITION BY treat ORDER BY c, u) AS r FROM pu),
         arms AS (SELECT treat, count(*) AS n FROM pu GROUP BY 1),
         tgt AS (SELECT a.treat, a.n, p.p, (p.p * a.n + 9) // 10 AS r
           FROM arms a CROSS JOIN (SELECT unnest(range(1, 10)) AS p) p),
         pick AS (SELECT t.p, t.treat, t.n, rk.c
           FROM tgt t JOIN rk ON rk.treat = t.treat AND rk.r = t.r)
         SELECT CAST(p * 10 AS BIGINT) AS pct,
           CAST(sum(CASE WHEN treat = 1 THEN n ELSE 0 END) AS BIGINT) AS n_treat,
           CAST(sum(CASE WHEN treat = 0 THEN n ELSE 0 END) AS BIGINT) AS n_ctrl,
           CAST(sum(CASE WHEN treat = 1 THEN c ELSE 0 END) AS BIGINT) AS q_treat_c,
           CAST(sum(CASE WHEN treat = 0 THEN c ELSE 0 END) AS BIGINT) AS q_ctrl_c,
           CAST(sum(CASE WHEN treat = 1 THEN c ELSE 0 END)
             - sum(CASE WHEN treat = 0 THEN c ELSE 0 END) AS BIGINT) AS qte_c
         FROM pick GROUP BY 1""",

    // q405: two-regressor OLS — HUGEINT product moments (the decimal
    // twin of the Spark side), centered sums, one pinned-order double
    // Cramer solve.
    "q405_ols_two" ->
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS m, sum(${C("o_totalprice")}) AS y
           FROM orders GROUP BY 1),
         ix AS (SELECT y, m, row_number() OVER (ORDER BY day) AS t FROM daily),
         mo AS (SELECT count(*) AS n, sum(t) AS sx, sum(m) AS sz, sum(y) AS sy,
             sum(CAST(t AS HUGEINT) * t) AS sxx,
             sum(CAST(m AS HUGEINT) * m) AS szz,
             sum(CAST(t AS HUGEINT) * m) AS sxz,
             sum(CAST(t AS HUGEINT) * y) AS sxy,
             sum(CAST(m AS HUGEINT) * y) AS szy,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM ix),
         ctr AS (SELECT *,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS cxx,
             CAST(CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz AS DOUBLE) AS czz,
             CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz AS DOUBLE) AS cxz,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
             CAST(CAST(n AS HUGEINT) * szy - CAST(sz AS HUGEINT) * sy AS DOUBLE) AS czy,
             CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy
           FROM mo),
         sol AS (SELECT *,
             cxx * czz - cxz * cxz AS det,
             (cxy * czz - czy * cxz) / (cxx * czz - cxz * cxz) AS b1,
             (czy * cxx - cxy * cxz) / (cxx * czz - cxz * cxz) AS b2
           FROM ctr),
         fin AS (SELECT *,
             (CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)
               - b2 * CAST(sz AS DOUBLE)) / CAST(n AS DOUBLE) AS b0,
             (b1 * cxy + b2 * czy) / cyy AS r2,
             (det = 0 OR n < 3 OR cyy = 0) AS bad
           FROM sol)
         SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
           CAST(sz AS BIGINT) AS sz, CAST(sy AS BIGINT) AS sy,
           CAST(CASE WHEN bad THEN NULL ELSE floor(b1 * 1000 + 0.5) END AS BIGINT) AS b1_milli,
           CAST(CASE WHEN bad THEN NULL ELSE floor(b2 * 1000 + 0.5) END AS BIGINT) AS b2_milli,
           CAST(CASE WHEN bad THEN NULL ELSE floor(b0 * 1000 + 0.5) END AS BIGINT) AS b0_milli,
           CAST(CASE WHEN bad THEN NULL ELSE floor(r2 * 10000 + 0.5) END AS BIGINT) AS r2_bp
         FROM fin""",

    // q406: CCNet perplexity buckets — the q160 scorer chain, exact
    // tercile ranks over (surprisal, doc_id), unscored docs kept as
    // their own bucket, per-source share by window.
    "q406_ppl_buckets" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         ix AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i FROM w),
         b AS (SELECT doc_id, words[i] AS w1, words[i + 1] AS w2 FROM ix),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
         c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
         sc AS (SELECT doc_id, count(*) AS nb,
             CAST(floor(sum(CAST(floor((-ln(c2 / CAST(c1 AS DOUBLE))) * 10000 + 0.5) AS BIGINT))
               / count(*)) AS BIGINT) AS s
           FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1),
         dg AS (SELECT d.doc_id, d.source AS g, sc.s, sc.nb
           FROM documents d LEFT JOIN sc USING (doc_id)),
         nn AS (SELECT count(*) AS n FROM dg WHERE s IS NOT NULL),
         rk AS (SELECT g, s, nb,
             row_number() OVER (ORDER BY s, doc_id) AS r
           FROM dg WHERE s IS NOT NULL),
         bk AS (SELECT g, CASE WHEN r <= (n + 2) // 3 THEN 'head'
               WHEN r <= (2 * n + 2) // 3 THEN 'middle' ELSE 'tail'
             END AS bucket, nb, s FROM rk CROSS JOIN nn
           UNION ALL
           SELECT g, 'unscored', 0, NULL FROM dg WHERE s IS NULL),
         agg AS (SELECT g AS source, bucket, count(*) AS n_docs,
             sum(nb) AS n_bigrams, min(s) AS min_s_bp, max(s) AS max_s_bp
           FROM bk GROUP BY 1, 2)
         SELECT source, bucket, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(min_s_bp AS BIGINT) AS min_s_bp,
           CAST(max_s_bp AS BIGINT) AS max_s_bp,
           CAST(10000 * n_docs // (sum(n_docs) OVER (PARTITION BY source))
             AS BIGINT) AS share_bp
         FROM agg""",

    // q408: clipping audit — the PCM generator replayed (the q396
    // convention, ungated), gaps-and-islands for the run structure.
    "q408_audio_clipping" ->
      """WITH n AS (SELECT doc_id,
             800 + (doc_id * 2654435761) % 1600 AS ns FROM documents),
         s AS (SELECT doc_id, unnest(range(ns)) AS i FROM n),
         v AS (SELECT doc_id, i,
             ((i * 127 + doc_id * 31) % 65536) - 32768 AS raw FROM s),
         c AS (SELECT doc_id, i FROM v WHERE abs(raw) >= 32700),
         g AS (SELECT doc_id, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
           FROM c),
         runs AS (SELECT doc_id, grp, count(*) AS len FROM g GROUP BY 1, 2),
         agg AS (SELECT doc_id, count(*) AS n_runs, max(len) AS max_run,
             sum(len) AS n_clipped FROM runs GROUP BY 1)
         SELECT n.doc_id, CAST(n.ns AS BIGINT) AS n_samples,
           CAST(coalesce(agg.n_clipped, 0) AS BIGINT) AS n_clipped,
           CAST(10000 * coalesce(agg.n_clipped, 0) // n.ns AS BIGINT)
             AS clipped_bp,
           CAST(coalesce(agg.n_runs, 0) AS BIGINT) AS n_runs,
           CAST(coalesce(agg.max_run, 0) AS BIGINT) AS max_run
         FROM n LEFT JOIN agg USING (doc_id)""",

    // q409: one-way ICC — the three meter columns unpivoted, HUGEINT
    // moment sums, the same pinned double assembly.
    "q409_icc" ->
      """WITH mt AS (SELECT doc_id,
             len(string_split(text, ' ')) AS m1,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS m2,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS m3
           FROM documents),
         lf AS (SELECT doc_id, m1 AS x FROM mt
           UNION ALL SELECT doc_id, m2 FROM mt
           UNION ALL SELECT doc_id, m3 FROM mt),
         per AS (SELECT doc_id, sum(x) AS ti,
             sum(CAST(x AS HUGEINT) * x) AS bi, count(*) AS nv
           FROM lf GROUP BY 1),
         m AS (SELECT count(*) AS n_items, sum(ti) AS t, sum(bi) AS b,
             sum(CAST(ti AS HUGEINT) * ti) AS a,
             max(CASE WHEN nv <> 3 THEN 1 ELSE 0 END) AS ragged FROM per),
         d AS (SELECT *,
             CAST(a AS DOUBLE) / 3.0
               - CAST(CAST(t AS HUGEINT) * t AS DOUBLE)
                 / (CAST(n_items AS DOUBLE) * 3.0) AS ssb,
             CAST(b AS DOUBLE) - CAST(a AS DOUBLE) / 3.0 AS ssw FROM m),
         e AS (SELECT *, ssb / (CAST(n_items AS DOUBLE) - 1.0) AS msb,
             ssw / (CAST(n_items AS DOUBLE) * 2.0) AS msw FROM d),
         f AS (SELECT *,
             (ragged = 1 OR n_items < 2 OR msb + 2.0 * msw = 0) AS bad
           FROM e)
         SELECT CAST(n_items AS BIGINT) AS n_items, CAST(3 AS BIGINT) AS k,
           CAST(1000 * CAST(t AS HUGEINT) // (n_items * 3) AS BIGINT)
             AS grand_mean_milli,
           CAST(CASE WHEN bad THEN NULL
             ELSE floor(msb * 1000 + 0.5) END AS BIGINT) AS msb_milli,
           CAST(CASE WHEN bad THEN NULL
             ELSE floor(msw * 1000 + 0.5) END AS BIGINT) AS msw_milli,
           CAST(CASE WHEN bad THEN NULL
             ELSE floor((msb - msw) / (msb + 2.0 * msw) * 1000 + 0.5)
             END AS BIGINT) AS icc_milli
         FROM f""",

    // q410: MCC — four exact counters, HUGEINT numerator, double
    // marginal products under the single correctly-rounded sqrt.
    "q410_mcc" ->
      """WITH u AS (SELECT user_id, count(*) AS ne,
             max(CASE WHEN event_type = 'purchase' AND value > 150.0
               THEN 1 ELSE 0 END) AS y FROM events GROUP BY 1),
         m AS (SELECT
             sum(CASE WHEN y = 1 AND ne > 67 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN y = 0 AND ne > 67 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN y = 1 AND ne <= 67 THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN y = 0 AND ne <= 67 THEN 1 ELSE 0 END) AS tn
           FROM u),
         d AS (SELECT *,
             CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
               AS DOUBLE) AS num,
             sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
               * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) AS den,
             (tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0 OR tn + fn = 0)
               AS bad
           FROM m)
         SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(CASE WHEN bad THEN NULL
             ELSE floor(num / den * 1000000 + 0.5) END AS BIGINT)
             AS mcc_micro,
           CAST(10000 * (tp + tn) // (tp + fp + fn + tn) AS BIGINT)
             AS accuracy_bp,
           CAST(10000 * (tp + fn) // (tp + fp + fn + tn) AS BIGINT)
             AS prevalence_bp
         FROM d""",

    // q411: PPR — the q147 unroll with seed-only teleport over the
    // support-thinned co-purchase graph; seeds = top-2 degree (ties by
    // id), node universe preserved by left joins.
    "q411_ppr" -> pprOracle,

    // q412: Chao1 — per-source and pooled (tok)-grain frequency folds;
    // the bias-corrected estimator and Good coverage are single idivs.
    "q412_chao1" ->
      """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         pg AS (SELECT source AS g, tok, count(*) AS c FROM tk GROUP BY 1, 2),
         al AS (SELECT 'ALL' AS g, tok, count(*) AS c FROM tk GROUP BY 2),
         ri AS (SELECT g, count(*) AS v, sum(c) AS n_tokens,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
           FROM (SELECT * FROM pg UNION ALL SELECT * FROM al) GROUP BY 1)
         SELECT g AS source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS v, CAST(f1 AS BIGINT) AS f1,
           CAST(f2 AS BIGINT) AS f2,
           CAST(v + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS chao1,
           CAST(10000 - (10000 * f1) // n_tokens AS BIGINT) AS coverage_bp
         FROM ri""",

    // q413: the shared q52 candidate CTE + two text joins; DuckDB's
    // unbanded levenshtein with the band applied as a CASE (the -1
    // sentinel and the 256 band literal shared with the Scala side).
    "q413_edit_pairs" ->
      s"""WITH p AS ($jaccardOracle),
         t AS (SELECT doc_id, text, length(text) AS ln FROM documents),
         j AS (SELECT p.doc_a, p.doc_b, a.ln AS len_a, b.ln AS len_b,
             levenshtein(a.text, b.text) AS lv
           FROM p JOIN t a ON a.doc_id = p.doc_a
           JOIN t b ON b.doc_id = p.doc_b)
         SELECT doc_a, doc_b, CAST(len_a AS BIGINT) AS len_a,
           CAST(len_b AS BIGINT) AS len_b,
           CAST(CASE WHEN lv > 256 THEN -1 ELSE lv END AS BIGINT) AS lev,
           CAST(CASE WHEN lv > 256 THEN NULL
             WHEN greatest(len_a, len_b) = 0 THEN 10000
             ELSE 10000 - (10000 * lv) // greatest(len_a, len_b)
             END AS BIGINT) AS sim_bp
         FROM j""",

    // q414: user-grain 2x2 cells per activity band; per-stratum/crude
    // ORs as exact HUGEINT products under one idiv, MH terms as
    // per-stratum micro floors summed exactly.
    "q414_mantel_haenszel" ->
      """WITH u AS (SELECT user_id, count(*) AS ne,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
           FROM events GROUP BY 1),
         cl AS (SELECT CAST(least(ne // 20, 3) AS VARCHAR) AS stratum,
             sum(CASE WHEN nc > 13 AND np > 13 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN nc > 13 AND np <= 13 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN nc <= 13 AND np > 13 THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN nc <= 13 AND np <= 13 THEN 1 ELSE 0 END) AS d
           FROM u GROUP BY 1),
         per AS (SELECT stratum, a, b, c, d,
             CASE WHEN b * c = 0 THEN NULL
               ELSE (1000000 * CAST(a AS HUGEINT) * d)
                 // (CAST(b AS HUGEINT) * c) END AS or_micro FROM cl),
         f AS (SELECT sum(a) AS a, sum(b) AS b, sum(c) AS c, sum(d) AS d,
             sum((1000000 * CAST(a AS HUGEINT) * d) // (a + b + c + d))
               AS r,
             sum((1000000 * CAST(b AS HUGEINT) * c) // (a + b + c + d))
               AS s
           FROM cl),
         cr AS (SELECT 'CRUDE' AS stratum, a, b, c, d,
             CASE WHEN b * c = 0 THEN NULL
               ELSE (1000000 * CAST(a AS HUGEINT) * d)
                 // (CAST(b AS HUGEINT) * c) END AS or_micro FROM f),
         mh AS (SELECT 'MH' AS stratum, a, b, c, d,
             CASE WHEN s = 0 THEN NULL
               ELSE (1000000 * CAST(r AS HUGEINT)) // s END AS or_micro
           FROM f)
         SELECT stratum, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST(or_micro AS BIGINT) AS or_micro
         FROM (SELECT * FROM per UNION ALL SELECT * FROM cr
               UNION ALL SELECT * FROM mh)""",

    // q415: the generated unrolled absorption sweeps (base + one chain
    // per removed channel) over the first-conversion-truncated
    // transition counts — see removalOracle.
    "q415_removal_effect" -> removalOracle,

    // q416: the two shared detector CTEs (q52 jaccard, q53 simhash)
    // as capture occasions; Chapman's (n1+1)(n2+1)/(m+1) - 1 exact.
    "q416_dedup_capture" ->
      s"""WITH p1 AS MATERIALIZED ($jaccardOracle),
         p2 AS MATERIALIZED ($simhashOracle),
         c AS (SELECT
             (SELECT count(*) FROM p1) AS n1,
             (SELECT count(*) FROM p2) AS n2,
             (SELECT count(*) FROM p1 JOIN p2 USING (doc_a, doc_b)) AS m)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(m AS BIGINT) AS m_both,
           CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m + 1) - 1
             AS BIGINT) AS est_total,
           CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m + 1) - 1
             - (n1 + n2 - m) AS BIGINT) AS est_missed,
           CAST(CASE WHEN n2 = 0 THEN NULL
             ELSE (10000 * m) // n2 END AS BIGINT) AS recall1_bp,
           CAST(CASE WHEN n1 = 0 THEN NULL
             ELSE (10000 * m) // n1 END AS BIGINT) AS recall2_bp
         FROM c""",

    // q407: banded DTW — the anti-diagonal wavefront replayed with two
    // carried LIST columns (diagonal k from k-1 and k-2, elementwise);
    // band literal 7 and the Big sentinel 2^62 shared with the Scala
    // side. Series are the observed-day grid (absent (type, day) reads
    // 0), lists ordered by day.
    "q407_dtw" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS s, CAST(ts AS DATE) AS d,
             count(*) AS n FROM events GROUP BY 1, 2),
         dys AS (SELECT DISTINCT d FROM daily),
         typ AS (SELECT DISTINCT s FROM daily),
         grid AS (SELECT t.s, dy.d, coalesce(dl.n, 0) AS v
           FROM typ t CROSS JOIN dys dy
           LEFT JOIN daily dl ON dl.s = t.s AND dl.d = dy.d),
         vecs AS (SELECT s, list(v ORDER BY d) AS vec FROM grid GROUP BY 1),
         pairs AS (SELECT a.s AS ta, b.s AS tb, a.vec AS va, b.vec AS vb,
             len(a.vec) AS t FROM vecs a JOIN vecs b ON a.s < b.s),
         wf(ta, tb, va, vb, t, k, cur, prev) AS (
           SELECT ta, tb, va, vb, t, 0,
             list_transform(range(t), i -> CASE WHEN i = 0
               THEN abs(va[1] - vb[1])
               ELSE 4611686018427387904 END),
             list_transform(range(t), i -> 4611686018427387904)
           FROM pairs
           UNION ALL
           SELECT ta, tb, va, vb, t, k + 1,
             list_transform(range(t), i -> CASE
               WHEN k + 1 - i BETWEEN 0 AND t - 1
                 AND abs(2 * i - (k + 1)) <= 7 THEN
                 CASE WHEN least(
                     CASE WHEN i > 0 THEN cur[i] ELSE 4611686018427387904 END,
                     cur[i + 1],
                     CASE WHEN i > 0 THEN prev[i] ELSE 4611686018427387904 END)
                   >= 4611686018427387904 THEN 4611686018427387904
                 ELSE abs(va[i + 1] - vb[k + 2 - i]) + least(
                     CASE WHEN i > 0 THEN cur[i] ELSE 4611686018427387904 END,
                     cur[i + 1],
                     CASE WHEN i > 0 THEN prev[i] ELSE 4611686018427387904 END)
                 END
               ELSE 4611686018427387904 END),
             cur
           FROM wf WHERE k < 2 * (t - 1)),
         dtw AS (SELECT ta, tb, t, cur[t] AS dtw_cost FROM wf
           WHERE k = 2 * (t - 1)),
         l1 AS (SELECT ta, tb,
             list_sum(list_transform(range(t), i ->
               abs(va[i + 1] - vb[i + 1]))) AS l1_cost FROM pairs)
         SELECT d.ta AS type_a, d.tb AS type_b, CAST(d.t AS BIGINT) AS n_days,
           CAST(d.dtw_cost AS BIGINT) AS dtw_cost,
           CAST(l1.l1_cost AS BIGINT) AS l1_cost,
           CAST(CASE WHEN l1.l1_cost > 0
             THEN 10000 * (l1.l1_cost - d.dtw_cost) // l1.l1_cost
             ELSE 0 END AS BIGINT) AS warp_gain_bp
         FROM dtw d JOIN l1 ON d.ta = l1.ta AND d.tb = l1.tb""",
  )

  /** q226 oracle: the sampled co-purchase edge set + KCorePeelRounds
    * UNROLLED peel stages. Peeling is idempotent past the fixpoint, so
    * a fixed unroll ≥ the true depth reproduces the exact core (and
    * the Spark side caps at the SAME constant, so the two agree even
    * if a pathological graph peeled deeper). Stages are MATERIALIZED —
    * the BpeOracleSql lesson: DuckDB 1.0 inlines a multiply-referenced
    * CTE chain exponentially. */
  /** Synchronous LPA unrolled round-for-round (the kCoreOracle
    * convention): each sweep joins the both-direction edge list to the
    * previous round's labels and takes the (count DESC, label ASC)
    * argmax per node via a windowed row_number — the same total order
    * the Spark side packs into min(struct(-cnt, lab)). */
  /** q225's Holt recursion (shared by the q307 backtest): the q156
    * sequential-recursion shape with two carried registers; ×256
    * fixed point, TRUNCATING division on both engines. */
  private def holtOracle: String =
    """WITH RECURSIVE d0 AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
             FROM events GROUP BY 1),
         d AS (SELECT day, CAST(n_events AS BIGINT) AS n_events,
             row_number() OVER (ORDER BY day) AS idx FROM d0),
         e(idx, day, n_events, l, b) AS (
           SELECT idx, day, n_events, 256 * n_events, CAST(0 AS BIGINT)
           FROM d WHERE idx = 1
           UNION ALL
           SELECT d.idx, d.day, d.n_events,
             (256 * d.n_events + 3 * (e.l + e.b)) // 4,
             (((256 * d.n_events + 3 * (e.l + e.b)) // 4) - e.l + 3 * e.b) // 4
           FROM d JOIN e ON d.idx = e.idx + 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_events,
           CAST(l AS BIGINT) AS level_q, CAST(b AS BIGINT) AS trend_q,
           CAST((l + b) // 256 AS BIGINT) AS forecast_next FROM e"""

  /** Mirror of Events.forecastEval: each model's forecast_next paired
    * with the next observed day's actual across calendar-consecutive
    * pairs only; exact integer MAE. */
  private def forecastEvalOracle: String = {
    def score(src: String, model: String) =
      s"""SELECT '$model' AS model, CAST(count(*) AS BIGINT) AS n_days,
          CAST(sum(abs(forecast_next - next_actual)) AS BIGINT) AS sum_abs_err,
          CAST((1000 * sum(abs(forecast_next - next_actual))) // count(*)
            AS BIGINT) AS mae_milli
          FROM (SELECT day, forecast_next,
                lead(day) OVER (ORDER BY day ASC) AS next_day,
                lead(n_events) OVER (ORDER BY day ASC) AS next_actual
                FROM $src)
          WHERE next_day IS NOT NULL
            AND date_diff('day', CAST(day AS DATE), CAST(next_day AS DATE)) = 1"""
    s"""WITH nv AS (SELECT strftime(day0, '%Y-%m-%d') AS day, n_events,
             n_events AS forecast_next
           FROM (SELECT CAST(ts AS DATE) AS day0, count(*) AS n_events
                 FROM events GROUP BY 1)),
       ho AS ($holtOracle),
       hw AS ($holtWintersOracle)
       ${score("nv", "naive")}
       UNION ALL ${score("ho", "holt")}
       UNION ALL ${score("hw", "holt_winters")}"""
  }

  /** Mirror of Events.holtWintersDaily: the q225 recursive-CTE shape
    * widened to 9 carried registers (l, b, s1..s7). l_new appears in
    * b and every seasonal CASE arm, so it inlines repeatedly (the
    * q225 inline-twice precedent); `//` truncates toward zero exactly
    * like the driver fold's Long division. */
  private def holtWintersOracle: String = {
    def sPrev(q: String) =
      s"(CASE d.dow ${(1 to 7).map(k => s"WHEN $k THEN $q.s$k").mkString(" ")} END)"
    val lNew =
      s"((256 * d.n_events - ${sPrev("e")} + 3 * (e.l + e.b)) // 4)"
    val bNew = s"(($lNew - e.l + 3 * e.b) // 4)"
    val sUpd = s"(((256 * d.n_events - $lNew) + 3 * ${sPrev("e")}) // 4)"
    val sCols = (1 to 7).map(k =>
      s"CASE WHEN d.dow = $k THEN $sUpd ELSE e.s$k END").mkString(",\n             ")
    val sBase = (1 to 7).map(_ => "CAST(0 AS BIGINT)").mkString(", ")
    def sPick(alias: String, dowExpr: String) =
      s"(CASE $dowExpr ${(1 to 7).map(k => s"WHEN $k THEN $alias.s$k").mkString(" ")} END)"
    s"""WITH RECURSIVE d0 AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
             FROM events GROUP BY 1),
         d AS (SELECT day, isodow(day) AS dow,
             CAST(n_events AS BIGINT) AS n_events,
             row_number() OVER (ORDER BY day) AS idx FROM d0),
         e(idx, day, dow, n_events, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
           SELECT idx, day, dow, n_events, 256 * n_events, CAST(0 AS BIGINT),
             $sBase
           FROM d WHERE idx = 1
           UNION ALL
           SELECT d.idx, d.day, d.dow, d.n_events,
             $lNew,
             $bNew,
             $sCols
           FROM d JOIN e ON d.idx = e.idx + 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, CAST(dow AS BIGINT) AS dow,
           n_events, CAST(l AS BIGINT) AS level_q, CAST(b AS BIGINT) AS trend_q,
           CAST(${sPick("e", "e.dow")} AS BIGINT) AS season_q,
           CAST((l + b + ${sPick("e", "(e.dow % 7) + 1")}) // 256 AS BIGINT)
             AS forecast_next
         FROM e"""
  }

  /** Mirror of Relational.bfsHops: BfsRounds synchronized relaxations
    * unrolled CTE-for-CTE (the lpaOracle convention) over the same
    * sampled co-purchase edge list; least() skips NULLs in both
    * engines, unreached nodes fold to hop −1. */
  private def bfsOracle: String = {
    val rounds = graft.ops.Relational.BfsRounds
    val base =
      """li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
               FROM lineitem WHERE l_orderkey % 8 = 0),
  e AS (SELECT a.it AS pa, b.it AS pb
        FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
  und AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e),
  d0 AS MATERIALIZED (
        SELECT DISTINCT src AS node,
          CASE WHEN src % 32 = 0 THEN 0 END AS dist FROM und)"""
    val sweeps = (1 to rounds).map { i =>
      val p = i - 1
      s"""d$i AS MATERIALIZED (
    SELECT n.node, least(n.dist, p.pd) AS dist
    FROM d$p n LEFT JOIN (
      SELECT ed.src, min(pl.dist + 1) AS pd
      FROM und ed JOIN d$p pl ON pl.node = ed.dst
      WHERE pl.dist IS NOT NULL GROUP BY ed.src) p ON p.src = n.node)"""
    }
    val tail =
      s"""h AS (SELECT coalesce(dist, -1) AS hop, count(*) AS n_nodes
        FROM d$rounds GROUP BY 1),
  t AS (SELECT sum(n_nodes) AS tt FROM h)
  SELECT CAST(hop AS BIGINT) AS hop, CAST(n_nodes AS BIGINT) AS n_nodes,
    CAST(10000 * n_nodes // t.tt AS BIGINT) AS share_bp
  FROM h, t"""
    ((base +: sweeps).mkString("WITH ", ",\n", ",\n")) + tail
  }

  private def lpaOracle: String = {
    val rounds = graft.ops.Relational.LpaRounds
    val base =
      """li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
               FROM lineitem WHERE l_orderkey % 8 = 0),
  e AS (SELECT a.it AS pa, b.it AS pb
        FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2),
  und AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e),
  l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM und)"""
    val sweeps = (1 to rounds).map { i =>
      val p = i - 1
      s"""l$i AS MATERIALIZED (
    SELECT node, lab FROM (
      SELECT ed.src AS node, pl.lab AS lab,
        row_number() OVER (PARTITION BY ed.src
                           ORDER BY count(*) DESC, pl.lab ASC) AS rn
      FROM und ed JOIN l$p pl ON pl.node = ed.dst
      GROUP BY ed.src, pl.lab) WHERE rn = 1)"""
    }
    val tail =
      s"""sizes AS (SELECT lab, count(*) AS n_nodes FROM l$rounds GROUP BY 1),
  internal AS (SELECT la.lab AS lab, count(*) // 2 AS ie
        FROM und ed JOIN l$rounds la ON la.node = ed.src
          JOIN l$rounds lb ON lb.node = ed.dst
        WHERE la.lab = lb.lab GROUP BY 1)
  SELECT CAST(row_number() OVER (ORDER BY s.n_nodes DESC, s.lab ASC) AS BIGINT) AS rank,
    CAST(s.lab AS BIGINT) AS community,
    CAST(s.n_nodes AS BIGINT) AS n_nodes,
    CAST(coalesce(i.ie, 0) AS BIGINT) AS n_internal_edges
  FROM sizes s LEFT JOIN internal i USING (lab)
  ORDER BY s.n_nodes DESC, s.lab ASC LIMIT 20"""
    ((base +: sweeps).mkString("WITH ", ",\n", ",\n")) + tail
  }

  /** Mirror of Events.markovStationary: q69's transition counts, P in
    * Q14 by truncating division, MarkovIters power sweeps unrolled
    * (the lpaOracle/kCoreOracle convention) with Σ=2¹⁴ renormalization
    * each sweep; types with no incoming mass drop to implicit zero
    * rows, exactly the driver array's zeros. */
  private def markovOracle: String = {
    val iters = graft.ops.Events.MarkovIters
    val base =
      """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
  l AS (SELECT event_type AS ft,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS tt
        FROM e),
  c AS MATERIALIZED (SELECT ft, tt, count(*) AS n FROM l
        WHERE tt IS NOT NULL GROUP BY 1, 2),
  rt AS MATERIALIZED (SELECT ft, sum(n) AS tot FROM c GROUP BY 1),
  ty AS MATERIALIZED (SELECT DISTINCT event_type AS j FROM events),
  p AS MATERIALIZED (SELECT c.ft AS i, c.tt AS j, c.n * 16384 // rt.tot AS pq
        FROM c JOIN rt USING (ft)),
  pi0 AS (SELECT j, CAST(16384 AS HUGEINT) AS x FROM ty)"""
    val sweeps = (1 to iters).map { k =>
      val pr = k - 1
      s"""w$k AS (SELECT p.j, sum(pi$pr.x * p.pq) AS y
    FROM pi$pr JOIN p ON p.i = pi$pr.j GROUP BY 1),
  pi$k AS MATERIALIZED (SELECT j, y * 16384 // (sum(y) OVER ()) AS x FROM w$k)"""
    }
    val tail =
      s"""tt AS (SELECT sum(tot) AS t FROM rt),
  ps AS (SELECT sum(x) AS s FROM pi$iters)
  SELECT ty.j AS event_type,
    CAST(coalesce(rt.tot, 0) AS BIGINT) AS n_out,
    CAST(CASE WHEN coalesce(tt.t, 0) = 0 THEN 0
         ELSE 10000 * coalesce(rt.tot, 0) // tt.t END AS BIGINT) AS empirical_bp,
    CAST(CASE WHEN coalesce(ps.s, 0) = 0 THEN 0
         ELSE 10000 * coalesce(pi.x, 0) // ps.s END AS BIGINT) AS stationary_bp
  FROM ty LEFT JOIN rt ON rt.ft = ty.j
    LEFT JOIN pi$iters pi ON pi.j = ty.j, tt, ps"""
    ((base +: sweeps).mkString("WITH ", ",\n  ", ",\n  ")) + tail
  }

  private def kCoreOracle: String = {
    val k = graft.ops.Relational.KCoreK
    val rounds = graft.ops.Relational.KCorePeelRounds
    val base =
      """w0 AS MATERIALIZED (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 8 = 0) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 8 = 0) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)"""
    val stages = (1 to rounds).map { i =>
      val p = i - 1
      s"""w$i AS MATERIALIZED (
    SELECT e.src, e.dst FROM w$p e
    JOIN (SELECT src FROM w$p GROUP BY src HAVING count(*) >= $k) ks ON e.src = ks.src
    JOIN (SELECT src AS dst FROM w$p GROUP BY src HAVING count(*) >= $k) kd ON e.dst = kd.dst)"""
    }
    (base +: stages).mkString("WITH ", ",\n", "\n") +
      s"SELECT src AS node, CAST(count(*) AS BIGINT) AS deg_in_core FROM w$rounds GROUP BY src"
  }

  /** PageRank oracle: the q51 edge derivation + 5 UNROLLED integer
    * power-iteration stages, mirroring Dedup.pageRank's exact fixed
    * point (scale 10¹², damping 85/100, truncating `//` on nonnegative
    * values — identical to Spark's IntegralDivide here). */
  private def pageRankOracle: String = {
    val base =
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         good AS (SELECT ida, idb FROM pair
                  JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
                  WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6),
         e0 AS (SELECT ida AS x, idb AS y FROM good UNION SELECT idb, ida FROM good),
         deg AS (SELECT x, count(*) AS d FROM e0 GROUP BY 1),
         nn AS (SELECT count(*) AS c FROM deg),
         r0 AS (SELECT x AS node, 1000000000000 // c AS r FROM deg, nn)"""
    val iters = (1 to 5).map { i =>
      s""",
         s$i AS (SELECT e0.y AS node, sum(r${i - 1}.r // deg.d) AS sc
                 FROM e0 JOIN r${i - 1} ON r${i - 1}.node = e0.x
                 JOIN deg ON deg.x = e0.x GROUP BY 1),
         r$i AS (SELECT node, (150000000000 // c) + (85 * sc) // 100 AS r FROM s$i, nn)"""
    }.mkString
    base + iters +
      "\n SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_e12 FROM r5"
  }

  /** q411 oracle: the pageRankOracle unroll shape with SEED-ONLY
    * teleport over the support-≥2 co-purchase graph. Node universe
    * preserved per round by LEFT JOINs from the degree table (a node
    * the mass has not reached reads 0, never drops). Constants:
    * r0 = 10¹²/2 on each of the 2 seeds, teleport 0.15·10¹²/2. */
  private def pprOracle: String = {
    val base =
      """WITH b AS (SELECT l_orderkey AS bk,
             list_sort(list_distinct(list(l_partkey))) AS arr
           FROM lineitem GROUP BY 1),
         pr AS (SELECT a AS pa, b2 AS pb FROM
             (SELECT unnest(arr) AS a, arr FROM b), unnest(arr) AS u(b2)
           WHERE b2 > a),
         e1 AS (SELECT pa AS x, pb AS y FROM
             (SELECT pa, pb, count(*) AS n FROM pr GROUP BY 1, 2)
           WHERE n >= 2),
         e0 AS (SELECT x, y FROM e1 UNION ALL SELECT y, x FROM e1),
         deg AS (SELECT x, count(*) AS d FROM e0 GROUP BY 1),
         sd AS (SELECT x AS node FROM deg ORDER BY d DESC, x ASC LIMIT 2),
         r0 AS (SELECT deg.x AS node,
             CASE WHEN sd.node IS NOT NULL THEN 500000000000 ELSE 0 END AS r
           FROM deg LEFT JOIN sd ON sd.node = deg.x)"""
    val iters = (1 to 4).map { i =>
      s""",
         s$i AS (SELECT e0.y AS node, sum(r${i - 1}.r // deg.d) AS sc
                 FROM e0 JOIN r${i - 1} ON r${i - 1}.node = e0.x
                 JOIN deg ON deg.x = e0.x GROUP BY 1),
         r$i AS (SELECT deg.x AS node,
             (CASE WHEN sd.node IS NOT NULL THEN 75000000000 ELSE 0 END)
               + (85 * coalesce(s$i.sc, 0)) // 100 AS r
           FROM deg LEFT JOIN s$i ON s$i.node = deg.x
           LEFT JOIN sd ON sd.node = deg.x)"""
    }.mkString
    base + iters + """
       SELECT r4.node AS node, CAST(r4.r AS BIGINT) AS rank_e12,
         CAST(CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS is_seed
       FROM r4 LEFT JOIN sd ON sd.node = r4.node
       ORDER BY rank_e12 DESC, r4.node ASC LIMIT 20"""
  }

  /** q415 oracle: journeys truncated at the first conversion (rank +
    * min-conversion-rank per user), transition counts with START/CONV/
    * DROP, then Events.RemovalSteps synchronized absorption sweeps on
    * the 10¹² HUGEINT lattice — one unrolled CTE chain per variant
    * (base + each removed channel; channel literals are the verify
    * corpus's event types, the per-corpus-replay convention). Entering
    * the removed channel values 0 — the walk dies there, exactly the
    * Scala fold's contract. */
  private def removalOracle: String = {
    val steps = 16 // = Events.RemovalSteps, shared literal
    val channels = Seq("click", "error", "signup", "view")
    val variants = "NONE" +: channels
    def sweep(v: String): String = {
      val dead = if (v == "NONE") "tr.t = 'DROP'"
        else s"tr.t = 'DROP' OR tr.t = '$v'"
      (1 to steps).map { k =>
        s""",
         a${v}_$k AS (SELECT tr.f AS s,
             sum(tr.n * CASE WHEN tr.t = 'CONV'
                 THEN CAST(1000000000000 AS HUGEINT)
               WHEN $dead THEN 0
               ELSE coalesce(p.v, 0) END) // o.o AS v
           FROM tr JOIN outs o ON o.s = tr.f
           LEFT JOIN a${v}_${k - 1} p ON p.s = tr.t
           GROUP BY tr.f, o.o)"""
      }.mkString
    }
    val base =
      """WITH rk AS (SELECT user_id AS u, event_type AS k,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events),
         fp AS (SELECT u, min(CASE WHEN cv = 1 THEN rn END) AS f,
             max(rn) AS mx FROM rk GROUP BY 1),
         kp AS (SELECT rk.u, rk.rn,
             CASE WHEN rk.cv = 1 THEN 'CONV' ELSE rk.k END AS st, fp.f, fp.mx
           FROM rk JOIN fp USING (u)
           WHERE rk.rn <= coalesce(fp.f, fp.mx)),
         t0 AS (SELECT coalesce(lag(st) OVER (PARTITION BY u ORDER BY rn),
             'START') AS f, st AS t FROM kp),
         dr AS (SELECT st AS f, 'DROP' AS t FROM kp
           WHERE f IS NULL AND rn = mx),
         tr AS MATERIALIZED (SELECT f, t, count(*) AS n FROM
           (SELECT * FROM t0 UNION ALL SELECT * FROM dr) GROUP BY 1, 2),
         outs AS MATERIALIZED (SELECT f AS s, sum(n) AS o
           FROM tr GROUP BY 1)""" +
      variants.map(v => s""",
         a${v}_0 AS (SELECT s, CAST(0 AS HUGEINT) AS v FROM outs)""").mkString
    val chanVals = channels.map(c =>
      s"""SELECT '$c' AS ch,
          coalesce((SELECT v FROM a${c}_$steps WHERE s = 'START'), 0) AS p"""
    ).mkString("\n           UNION ALL ")
    base + variants.map(sweep).mkString + s""",
         bb AS (SELECT coalesce((SELECT v FROM aNONE_$steps
             WHERE s = 'START'), 0) AS b),
         vals AS ($chanVals),
         tt AS (SELECT sum(bb.b - vals.p) AS tot FROM vals, bb)
       SELECT 'BASE' AS channel, CAST(bb.b // 1000000 AS BIGINT)
           AS p_conv_micro, CAST(NULL AS BIGINT) AS removal_effect_bp,
           CAST(NULL AS BIGINT) AS share_bp FROM bb
       UNION ALL
       SELECT vals.ch AS channel,
         CAST(vals.p // 1000000 AS BIGINT) AS p_conv_micro,
         CAST(CASE WHEN bb.b = 0 THEN NULL
           ELSE (10000 * (bb.b - vals.p)) // bb.b END AS BIGINT)
           AS removal_effect_bp,
         CAST(CASE WHEN tt.tot = 0 THEN NULL
           ELSE (10000 * (bb.b - vals.p)) // tt.tot END AS BIGINT)
           AS share_bp
       FROM vals, bb, tt"""
  }

  /** Shared by q53 and q416 (the capture-recapture second detector). */
  private def simhashOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
       th AS (SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
       votes AS (SELECT doc_id, k.k, sum(CASE WHEN (h >> k.k) & 1 = 1 THEN 1 ELSE -1 END) AS c
                 FROM th CROSS JOIN (SELECT unnest(range(64)) AS k) k
                 GROUP BY doc_id, k.k),
       sigs AS (SELECT doc_id, sum(CASE WHEN c >= 0 THEN (1::UBIGINT << k) ELSE 0::UBIGINT END)::UBIGINT AS sig
                FROM votes GROUP BY doc_id)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sig, b.sig)) <= 3"""

  private def jaccardOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle FROM t),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pair AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
       SELECT ida AS doc_a, idb AS doc_b,
       ${BP("common / CAST(na.n + nb.n - common AS DOUBLE)")} AS jaccard_bp
       FROM pair JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb
       WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.6"""
}
