package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (approx sketches, LSH
  * banding, mapPartitions plumbing) — those get the driver's rows-only
  * check. Column names are aliased identically on both sides; doubles
  * rounded to 2; `events.ts` flows through as a ns-epoch long
  * (`spark.sql.legacy.parquet.nanosAsLong`) matched by DuckDB
  * `epoch_us(ts)` — exact integer parity.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Cdc.current(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC core (§2 #1-7)
    "cdc_classify" -> (Cdc.classify _),
    "cdc_history" -> (Cdc.history _),
    "cdc_current" -> (Cdc.current _),
    "cdc_stats" -> (Cdc.stats _),
    "cdc_dedup_redelivery" -> (Cdc.dedupRedelivery _),
    "cdc_scd2" -> (Cdc.scd2 _),
    "cdc_compact" -> (Cdc.compact _),
    "cdc_envelope_parse" -> (Cdc.envelopeParse _),
    "cdc_avro_parse" -> (Cdc.avroParse _),
    "cdc_maxwell_parse" -> (Cdc.maxwellParse _),
    "cdc_snapshot_diff" -> (Cdc.snapshotDiff _),
    "q_json_extract" -> (Analytics.jsonExtract _),
    // Warehouse/OLAP analytics (§2 #9-20)
    "q_filter_scan" -> (Analytics.filterScan _),
    "q1_pricing_summary" -> (Analytics.pricingSummary _),
    "q3_top_orders" -> (Analytics.topOrders _),
    "q5_region_revenue" -> (Analytics.regionRevenue _),
    "q_top_parts_per_brand" -> (Analytics.topPartsPerBrand _),
    "q_customer_ltv" -> (Analytics.customerLtv _),
    "q_rollup_orders" -> (Analytics.rollupOrders _),
    "q_sessionize" -> (Analytics.sessionize _),
    "q_running_totals" -> (Analytics.runningTotals _),
    "q_funnel" -> (Analytics.funnel _),
    "q_anti_join" -> (Analytics.antiJoin _),
    "q_approx_distinct" -> (Analytics.approxDistinct _),
    "q_cms_counts" -> ((s: SparkSession, d: String) => Analytics.cmsCounts(s, d)),
    "q_cohort_retention" -> (Analytics.cohortRetention _),
    "q_value_histogram" -> ((s: SparkSession, d: String) => Profile.valueHistogram(s, d)),
    // Extended warehouse ops (§2 #35-41)
    "q_asof_join" -> (AnalyticsExt.asofJoin _),
    "q_range_join" -> (AnalyticsExt.rangeJoin _),
    "q_percentiles" -> (AnalyticsExt.percentiles _),
    "q_cube_orders" -> (AnalyticsExt.cubeOrders _),
    "q_pivot_orders" -> (AnalyticsExt.pivotOrders _),
    "q_ntile_customers" -> (AnalyticsExt.ntileCustomers _),
    "q_moment_stats" -> (AnalyticsExt.momentStats _),
    "q_grouping_sets" -> (AnalyticsExt.groupingSets _),
    "q_trailing_7d" -> (AnalyticsExt.trailing7d _),
    "q_percent_rank" -> (AnalyticsExt.percentRank _),
    "q_freq_items" -> (AnalyticsExt.freqItems _),
    "q_copurchase" -> ((s: SparkSession, d: String) => AnalyticsExt.copurchase(s, d)),
    // Connected components (§2 #166)
    "q_components" -> ((s: SparkSession, d: String) => AnalyticsExt.components(s, d)),
    // Personalized PageRank (§2 #227)
    "q_ppr" -> ((s: SparkSession, d: String) => AnalyticsExt.personalizedPageRank(s, d)),
    // Incremental components: delta fold ≡ batch (§2 #225)
    "q_components_incremental" ->
      ((s: SparkSession, d: String) => AnalyticsExt.componentsIncremental(s, d)),
    // HITS hubs/authorities on the bipartite purchase graph (§2 #228)
    "q_hits" -> ((s: SparkSession, d: String) => AnalyticsExt.hits(s, d)),
    // Degree assortativity of the co-purchase graph (§2 #229)
    "q_assortativity" -> ((s: SparkSession, d: String) => AnalyticsExt.assortativity(s, d)),
    "q_mad_outliers" -> (Scale.madOutliers _),
    // Scale techniques (§2 #43-46)
    "q_salted_join" -> (Scale.saltedJoin(_, _)),
    "q_key_skew" -> (Scale.keySkew _),
    // Rendezvous sharding (§2 #155)
    "q_shard_rendezvous" -> ((s: SparkSession, d: String) => Scale.rendezvousShards(s, d)),
    // Join-size estimation from hashed sketches (§2 #162)
    "q_join_size_est" -> ((s: SparkSession, d: String) => Scale.joinSizeEstimate(s, d)),
    "cdc_merge_incremental" -> (Scale.mergeIncremental _),
    "q_resample_daily" -> (Scale.resampleDaily _),
    "q_approx_percentiles" -> (Scale.approxPercentiles _),
    "q_winsorize" -> (Scale.winsorize _),
    "q_zorder_stats" -> ((s: SparkSession, d: String) => Scale.zorderStats(s, d)),
    "q_curve_compare" -> ((s: SparkSession, d: String) => Scale.curveCompare(s, d)),
    "q_bloom_join" -> ((s: SparkSession, d: String) => Scale.bloomJoin(s, d)),
    // Sampling (§2 #54-56)
    "q_split_assign" -> (Sampling.splitAssign _),
    "q_stratified_sample" -> (Sampling.stratifiedSample _),
    // Neyman-allocation stratified sampling (§2 #226)
    "q_neyman_alloc" -> ((s: SparkSession, d: String) => Sampling.neymanAlloc(s, d)),
    "q_hash_sample" -> ((s: SparkSession, d: String) => Sampling.hashSample(s, d)),
    "q_shuffle_order" -> ((s: SparkSession, d: String) => Sampling.shuffleOrder(s, d)),
    // Multi-epoch shuffle schedule (§2 #167)
    "q_epoch_shuffle" -> ((s: SparkSession, d: String) => Sampling.multiEpochShuffle(s, d)),
    "q_pack_sequences" -> ((s: SparkSession, d: String) => Sampling.packSequences(s, d)),
    "q_pack_composite" -> ((s: SparkSession, d: String) => Sampling.packComposite(s, d)),
    "q_source_cap" -> ((s: SparkSession, d: String) => Sampling.sourceCap(s, d)),
    "q_mixture_weights" -> ((s: SparkSession, d: String) => Sampling.mixtureWeights(s, d)),
    "q_token_budget" -> ((s: SparkSession, d: String) => Sampling.tokenBudget(s, d)),
    // Priority sampling with unbiased subset-sum estimator (§2 #153)
    "q_priority_sample" -> ((s: SparkSession, d: String) => Sampling.prioritySample(s, d)),
    // Quota-filling document selection (§2 #158)
    "q_quota_fill" -> ((s: SparkSession, d: String) => Sampling.quotaFill(s, d)),
    // Length-bucketed batching (§2 #165)
    "q_length_batching" -> ((s: SparkSession, d: String) => Sampling.lengthBatching(s, d)),
    "q_neg_sample" -> ((s: SparkSession, d: String) => Sampling.negSample(s, d)),
    // Dedup (§2 #21-26)
    "dedup_exact" -> (Dedup.exact _),
    "text_fingerprint" -> (Dedup.fingerprint _),
    "dedup_minhash" -> (Dedup.minhash _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_simhash_idf" -> (Dedup.simhashIdf _),
    "dedup_jaccard" -> (Dedup.jaccardVerify _),
    // Exact prefix-filter similarity join (§2 #163)
    "dedup_prefix_join" -> (Dedup.prefixJoin _),
    // Sorted-neighborhood near-dup (§2 #170)
    "dedup_snm" -> ((s: SparkSession, d: String) => Dedup.snm(s, d)),
    "dedup_clusters" -> (Dedup.clusters _),
    // Cluster-recovery P/R vs the planted truth (§2 #362)
    "dedup_cluster_eval" -> ((s: SparkSession, d: String) => Dedup.clusterEval(s, d)),
    "dedup_apply" -> (Dedup.applyKeepList _),
    "dedup_report" -> (Dedup.report _),
    "dedup_incremental" -> (Dedup.incremental _),
    "dedup_spans" -> ((s: SparkSession, d: String) => Dedup.spans(s, d)),
    // Misaligned exact-substring dedup (§2 #219)
    "dedup_substring" -> ((s: SparkSession, d: String) => Dedup.substringSpans(s, d)),
    // Misaligned-substring corpus rewrite (§2 #220)
    "dedup_substring_rewrite" -> ((s: SparkSession, d: String) => Dedup.substringRewrite(s, d)),
    "dedup_embedding" -> (Dedup.embedding _),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Dedup.semantic(s, d)),
    // Similarity search (§2 #27-29)
    "ann_bruteforce" -> (Similarity.bruteForce _),
    "ann_exact_knn_graph" -> ((s, d) => Similarity.exactKnnGraph(s, d)),
    "ann_matryoshka_recall" -> ((s, d) => Similarity.matryoshkaRecall(s, d)),
    "ann_nsw_search" -> ((s, d) => Similarity.nswSearch(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.lsh(s, d)),
    "ann_rrf_fusion" -> ((s, d) => Similarity.rrfFusion(s, d)),
    "ann_lsh_multiprobe" -> ((s, d) => Similarity.lshMultiProbe(s, d)),
    // Range (threshold) ANN search (§2 #224)
    "ann_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    // LSH-DBSCAN density clustering (§2 #146)
    "ann_dbscan" -> ((s: SparkSession, d: String) => Similarity.dbscan(s, d)),
    // Triplet mining (§2 #152)
    "ann_triplets" -> ((s: SparkSession, d: String) => Similarity.tripletMine(s, d)),
    "ann_centroid_assign" -> (Similarity.centroidAssign _),
    "ann_ivf" -> ((s, d) => Similarity.ivf(s, d)),
    // Text analysis (§2 #30-32)
    "text_tokens" -> (TextOps.tokenCounts _),
    // Document chunking with overlap (§2 #154)
    "text_chunks" -> ((s: SparkSession, d: String) => TextOps.chunkDocs(s, d)),
    "text_quality" -> (TextOps.qualityScore _),
    "text_curriculum" -> ((s: SparkSession, d: String) => TextOps.curriculum(s, d)),
    "text_lang_id" -> (TextOps.langId _),
    "text_repetition" -> (TextOps.repetition _),
    "text_contamination" -> (TextOps.contamination _),
    "text_pii" -> (TextOps.piiRedact _),
    "text_unigram_lp" -> (TextOps.unigramLogProb _),
    // Bigram-LM cross-entropy per doc (§2 #343)
    "text_bigram_ppl" -> ((s: SparkSession, d: String) => TextStats.bigramPerplexity(s, d)),
    // Character-level entropy per doc (§2 #344)
    "text_char_entropy" -> ((s: SparkSession, d: String) => TextStats.charEntropy(s, d)),
    // Mean Segmental TTR lexical diversity (§2 #345)
    "text_msttr" -> ((s: SparkSession, d: String) => TextOps.msttr(s, d)),
    "text_filter_pipeline" -> ((s: SparkSession, d: String) => TextOps.filterPipeline(s, d)),
    // Corpus text statistics (§2 #47-50)
    "text_top_terms" -> ((s: SparkSession, d: String) => TextStats.topTerms(s, d)),
    "text_tfidf" -> (TextStats.tfidf _),
    "text_bm25" -> ((s: SparkSession, d: String) => TextStats.bm25(s, d)),
    "text_qnorm" -> ((s: SparkSession, d: String) => TextStats.quantileNormalize(s, d)),
    "text_bigrams" -> ((s: SparkSession, d: String) => TextStats.topBigrams(s, d)),
    // Positional-index exact phrase search (§2 #222)
    "text_phrase_search" -> ((s: SparkSession, d: String) => TextStats.phraseSearch(s, d)),
    // Collocation mining by integer Dice (§2 #157)
    "text_collocations" -> ((s: SparkSession, d: String) => TextStats.collocations(s, d)),
    // KMV/theta overlap sketch (§2 #148)
    "text_kmv_overlap" -> ((s: SparkSession, d: String) => TextStats.kmvOverlap(s, d)),
    "dedup_fuzzy" -> (TextStats.fuzzyVerify _),
    // Multimodal (§2 #33-34, #53)
    "mm_manifest" -> (Multimodal.manifest _),
    "mm_features" -> (Multimodal.featuresFlat _),
    "mm_feature_stats" -> (Multimodal.featureStatsFlat _),
    "mm_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    // Profiling + quantization (§2 #51-52)
    "q_profile_customer" -> (Profile.profileCustomer _),
    "ann_quantize" -> (Similarity.quantizeFlat _),
    "ann_project" -> ((s: SparkSession, d: String) => Similarity.randomProjection(s, d)),
    "ann_project_search" -> ((s: SparkSession, d: String) => Similarity.projectSearch(s, d)),
    "ann_project_indexed" -> ((s: SparkSession, d: String) => Similarity.projectSearchViaIndex(s, d)),
    // Correlated-subquery warehouse depth (§2 #100-102)
    "q2_min_cost_supplier" -> (Warehouse.minCostSupplier _),
    "q17_small_qty_revenue" -> (Warehouse.smallQtyRevenue _),
    "q21_waiting_suppliers" -> (Warehouse.waitingSuppliers _),
    "q20_dominant_supplier" -> (Warehouse.dominantSupplier _),
    // Window/audit depth (§2 #105-107)
    "q_event_gaps" -> ((s: SparkSession, d: String) => AnalyticsExt.eventGaps(s, d)),
    "q_percentile_disc" -> (AnalyticsExt.percentileDisc _),
    // Equi-depth histogram (§2 #156)
    "q_equidepth_hist" -> ((s: SparkSession, d: String) => AnalyticsExt.equidepthHist(s, d)),
    // Per-key OLS trend (§2 #159)
    "q_ols_trend" -> (AnalyticsExt.olsTrend _),
    // Weighted discrete percentiles (§2 #160)
    "q_weighted_percentile" -> (AnalyticsExt.weightedPercentile _),
    // Theil-Sen robust trend (§2 #161)
    "q_theil_sen" -> (AnalyticsExt.theilSen _),
    "text_lang_confusion" -> (TextOps.langConfusion _),
    "q_rolling_median" -> (AnalyticsExt.rollingMedian _),
    "q_asof_nearest" -> (AnalyticsExt.asofNearest _),
    // Warehouse depth, second batch (§2 #111-116)
    "q4_late_priority" -> (Warehouse.latePriority _),
    "q11_important_stock" -> (Warehouse.importantStock _),
    "q13_cust_distribution" -> (Warehouse.custDistribution _),
    "q15_top_supplier" -> (Warehouse.topSupplier _),
    "q19_disjunctive_revenue" -> (Warehouse.disjunctiveRevenue _),
    "q22_idle_customers" -> (Warehouse.idleCustomers _),
    // LLM-pipeline depth, round-4 continuation (§2 #117-119)
    "text_boilerplate" -> ((s: SparkSession, d: String) => TextOps.boilerplate(s, d)),
    "q_pps_sample" -> ((s: SparkSession, d: String) => Sampling.ppsSample(s, d)),
    "text_kl_drift" -> (TextStats.klDrift _),
    // Product quantization (§2 #120-121)
    "ann_pq_codes" -> ((s: SparkSession, d: String) => Similarity.pqCodes(s, d)),
    "ann_pq_search" -> ((s: SparkSession, d: String) => Similarity.pqSearch(s, d)),
    // OPQ rotation ahead of PQ (§2 #142)
    "ann_opq_search" -> ((s: SparkSession, d: String) => Similarity.opqSearch(s, d)),
    // Forward fill (§2 #122)
    "q_locf_fill" -> (Scale.locfFill _),
    // Data-quality constraint audit (§2 #123)
    "q_dq_audit" -> (Profile.dqAudit _),
    // Co-purchase PageRank (§2 #124)
    "q_pagerank" -> ((s: SparkSession, d: String) => AnalyticsExt.pageRank(s, d)),
    // IVFADC (§2 #125, #138)
    "ann_ivfadc" -> ((s: SparkSession, d: String) => Similarity.ivfAdcSearch(s, d)),
    "ann_ivfadc_indexed" -> ((s: SparkSession, d: String) => Similarity.ivfAdcViaIndex(s, d)),
    // SCD family completion (§2 #133-134)
    "cdc_scd3" -> (Cdc.scd3 _),
    "cdc_scd2_lookup" -> (Cdc.scd2Lookup _),
    // Incremental z-order recluster (§2 #135)
    "q_zorder_recluster" -> ((s: SparkSession, d: String) => Scale.zorderRecluster(s, d)),
    // Warehouse depth, third batch (§2 #126-132)
    "q7_volume_shipping" -> (Warehouse.volumeShipping _),
    "q8_market_share" -> (Warehouse.marketShare _),
    "q10_returned_items" -> (Warehouse.returnedItems _),
    "q12_ship_priority" -> (Warehouse.shipPriorityClasses _),
    "q14_promo_share" -> (Warehouse.promoShare _),
    "q16_supplier_relationship" -> (Warehouse.supplierRelationship _),
    "q18_large_volume" -> (Warehouse.largeVolumeCustomers _),
    // TPC-H morphology completion (§2 #139-140)
    "q6_forecast_revenue" -> (Warehouse.forecastRevenue _),
    "q9_product_profit" -> (Warehouse.productProfit _),
    // Grouped weighted median (§2 #168)
    "q_weighted_median" -> (AnalyticsExt.weightedMedian _),
    // Batch Misra-Gries merge (§2 #169)
    "text_heavy_hitters" -> ((s: SparkSession, d: String) => TextStats.mgMerge(s, d)),
    // Sparse inverted-index document similarity (§2 #171)
    "text_sparse_sim" -> ((s: SparkSession, d: String) => TextStats.sparseSim(s, d)),
    // Top-p nucleus corpus selection (§2 #172)
    "q_top_p_select" -> ((s: SparkSession, d: String) => TextOps.topPSelect(s, d)),
    // Event-type transition matrix (§2 #174)
    "q_event_transitions" -> (AnalyticsExt.eventTransitions _),
    // Source-diversity diagnostics (§2 #175)
    "q_source_diversity" -> (Sampling.sourceDiversity _),
    // Triangle count + clustering coefficient (§2 #176)
    "q_triangles" -> ((s: SparkSession, d: String) => AnalyticsExt.triangles(s, d)),
    // RFM segmentation (§2 #177)
    "q_rfm" -> (Warehouse.rfm _),
    // U-shape multi-touch attribution (§2 #178)
    "q_attribution" -> ((s: SparkSession, d: String) => AnalyticsExt.attribution(s, d)),
    // Association rules by lift (§2 #179)
    "q_basket_lift" -> ((s: SparkSession, d: String) => AnalyticsExt.basketLift(s, d)),
    // Gini spend inequality (§2 #180)
    "q_gini" -> ((s: SparkSession, d: String) => AnalyticsExt.gini(s, d)),
    // Shingle-novelty scoring (§2 #181)
    "text_novelty" -> (TextStats.novelty _),
    // CUSUM changepoint detection (§2 #182)
    "q_changepoint" -> (AnalyticsExt.changepoint _),
    // Changelog sequence audit (§2 #184)
    "cdc_sequence_audit" -> (Cdc.sequenceAudit _),
    // Incremental view maintenance (§2 #185)
    "cdc_ivm_agg" -> ((s: SparkSession, d: String) => Cdc.ivmAgg(s, d)),
    // Zone-map pruning simulator (§2 #186)
    "q_zonemap_prune" -> ((s: SparkSession, d: String) => Scale.zonemapPrune(s, d)),
    // Streaming state sizing under TTL (§2 #187)
    "cdc_state_ttl" -> (Cdc.stateTtlAudit _),
    // Watermark lateness audit (§2 #188)
    "cdc_watermark_lateness" -> ((s: SparkSession, d: String) => Cdc.watermarkLateness(s, d)),
    // Out-of-order repair audit with planted late delivery (§2 #237)
    "cdc_ooo_repair" ->
      ((s: SparkSession, d: String) => Cdc.outOfOrderRepair(s, d, OooDelayOffsets)),
    // ANN recall/MRR evaluation harness (§2 #238)
    "ann_eval_recall" -> ((s: SparkSession, d: String) => Similarity.evalRecall(s, d)),
    // Binary 1-bit quantization + Hamming shortlist + rerank (§2 #346)
    "ann_binary_quant" -> ((s: SparkSession, d: String) => Similarity.binaryQuant(s, d)),
    // Binary-quantization recall scorecard (§2 #347)
    "ann_binary_recall" -> ((s: SparkSession, d: String) => Similarity.evalBinaryRecall(s, d)),
    // IVF recall-vs-nprobe curve (§2 #378)
    "ann_ivf_nprobe_curve" -> ((s: SparkSession, d: String) => Similarity.ivfNprobeCurve(s, d)),
    // Int8 search + recall scorecard for #52 (§2 #379)
    "ann_sq_recall" -> (Similarity.sqRecall _),
    // LSH recall-vs-tables curve (§2 #388)
    "ann_lsh_tables_curve" -> (Similarity.lshTablesCurve _),
    // MinHash banding advisor over the (b,r) factorizations (§2 #389)
    "dedup_banding_advisor" -> ((s: SparkSession, _: String) => Dedup.bandingAdvisor(s)),
    // OTIF on-time-in-full monthly trend (§2 #390)
    "q_otif" -> (Warehouse.otif _),
    // Backlog aging waterfall over open orders (§2 #391)
    "q_backlog_aging" -> (Warehouse.backlogAging _),
    // Whale-dependency monthly revenue share (§2 #392)
    "q_whale_dependency" -> ((s: SparkSession, d: String) => Warehouse.whaleDependency(s, d)),
    // MMR diversified top-k re-ranking (§2 #350)
    "ann_mmr" -> ((s: SparkSession, d: String) => Similarity.mmr(s, d)),
    // Chi-square categorical association (§2 #189)
    "q_chi2_assoc" -> (AnalyticsExt.chi2Assoc _),
    "text_ks_drift" -> (TextStats.ksDrift _),
    "text_bh_fdr" -> ((s: SparkSession, d: String) => TextStats.bhFdr(s, d)),
    "q_abc_pareto" -> ((s: SparkSession, d: String) => AnalyticsExt.abcPareto(s, d)),
    // Skyline / Pareto-frontier preference query (§2 #192)
    "q_skyline" -> ((s: SparkSession, d: String) => AnalyticsExt.skyline(s, d)),
    // Rolling 7-day active users: sliding exact count-distinct (§2 #193)
    "q_rolling_mau" -> (AnalyticsExt.rollingMau _),
    // SCD2 interval-align join: bitemporal attribute alignment (§2 #194)
    "cdc_scd2_align" -> (Cdc.scd2Align _),
    // Event-sequence regex match, MATCH_RECOGNIZE shape (§2 #195)
    "q_event_regex" -> (AnalyticsExt.eventRegex _),
    // EWMA trailing smoothing, dyadic-exact (§2 #196)
    "q_ewma" -> (AnalyticsExt.ewma _),
    // Hapax-legomena vocabulary health (§2 #197)
    "text_hapax" -> (TextStats.hapax _),
    // Corpus checksum manifest (§2 #198)
    "q_corpus_checksum" -> (Profile.corpusChecksum _),
    // Perceptual-hash near-dup over payloads (§2 #199)
    "mm_phash_neardup" -> ((s: SparkSession, d: String) => Multimodal.phashNearDup(s, d)),
    // K-core decomposition by fixed-round peeling (§2 #200)
    "q_kcore" -> ((s: SparkSession, d: String) => AnalyticsExt.kcore(s, d)),
    // Quantile normalization across sources (§2 #201)
    "q_quantile_norm" -> ((s: SparkSession, d: String) => AnalyticsExt.quantileNormalize(s, d)),
    // Lag-1 autocorrelation per series (§2 #202)
    "q_autocorr" -> (AnalyticsExt.autocorr _),
    // Interval union coverage per supplier (§2 #230)
    "q_interval_union" -> (AnalyticsExt.intervalUnion _),
    // Lagged cross-correlation matrix (§2 #231)
    "q_crosscorr" -> ((s: SparkSession, d: String) => AnalyticsExt.crossCorr(s, d)),
    // Mann-Whitney AUC with exact tie handling (§2 #232)
    "q_auc" -> ((s: SparkSession, d: String) => AnalyticsExt.auc(s, d)),
    // Calibration / reliability bins (§2 #233)
    "q_calibration" -> ((s: SparkSession, d: String) => AnalyticsExt.calibration(s, d)),
    // Kaplan-Meier survival curve with right-censoring (§2 #234)
    "q_kaplan_meier" ->
      ((s: SparkSession, d: String) => AnalyticsExt.kaplanMeier(s, d, KmCensorMonths)),
    // SAX motif discovery over daily series (§2 #235)
    "q_sax_motifs" -> (AnalyticsExt.saxMotifs _),
    // Time-constrained funnel (§2 #236)
    "q_funnel_windowed" ->
      ((s: SparkSession, d: String) => AnalyticsExt.funnelWindowed(s, d, FunnelWindowDays)),
    // Seasonal-trend decomposition (§2 #221)
    "q_seasonal_decomp" -> (AnalyticsExt.seasonalDecomp _),
    // Seasonal-remainder MAD anomaly flags (§2 #223)
    "q_anomaly_flags" -> (AnalyticsExt.anomalyFlags _),
    // Poisson-bootstrap confidence interval (§2 #203)
    "q_bootstrap_ci" -> ((s: SparkSession, d: String) => Scale.bootstrapCi(s, d, b = BootstrapB)),
    // Zipf octave-ratio diagnostic (§2 #204)
    "text_zipf" -> (TextStats.zipfOctaves _),
    // Containment join: excerpt/quotation detection (§2 #206)
    "dedup_containment" -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    // Conversion-lag percentiles (§2 #207)
    "q_conversion_lag" -> ((s: SparkSession, d: String) => AnalyticsExt.conversionLag(s, d)),
    // Cross-modal retrieval top-k (§2 #208)
    "mm_crossmodal_topk" -> ((s: SparkSession, d: String) => Multimodal.crossModalTopK(s, d)),
    // Late-arriving-dimension restatement (§2 #209)
    "cdc_restatement" -> (Cdc.restatement _),
    // Changelog balance curve: deltas integrated to a daily series (§2 #210)
    "cdc_balance_curve" -> (Cdc.balanceCurve _),
    // Benford first-digit audit (§2 #211)
    "q_benford" -> (Profile.benford _),
    // FIFO inventory allocation via cumulative interval join (§2 #212)
    "q_fifo_allocation" -> (Warehouse.fifoAllocation _),
    // Eventually-follows matrix, process mining (§2 #213)
    "q_eventually_follows" -> (Warehouse.eventuallyFollows _),
    // SCD2 version compaction: islands merge of no-op churn (§2 #214)
    "cdc_scd2_compact" -> (Cdc.scd2Compact _),
    // Gram matrix: distributed X'X for PCA prep (§2 #215)
    "ann_gram_matrix" -> (Similarity.gramMatrix _),
    // Cohort LTV curve (§2 #216)
    "q_ltv_curve" -> (Warehouse.ltvCurve _),
    // Tombstone GC / retention reclaim audit (§2 #217)
    "cdc_tombstone_gc" -> (Cdc.tombstoneGc _),
    // RAKE keyword extraction (§2 #218)
    "text_rake" -> ((s: SparkSession, d: String) => TextStats.rake(s, d)),
    // Local clustering coefficient per vertex (§2 #239)
    "q_clustering_coeff" -> ((s: SparkSession, d: String) => AnalyticsExt.localClustering(s, d)),
    // Growth accounting: new/retained/resurrected/churned (§2 #240)
    "q_growth_accounting" -> (AnalyticsExt.growthAccounting _),
    // Precision-recall curve at equi-depth thresholds (§2 #241)
    "q_pr_curve" ->
      ((s: SparkSession, d: String) => AnalyticsExt.prCurve(s, d, nBins = PrCurveBins)),
    // Mann-Kendall trend test per daily series (§2 #242)
    "q_mann_kendall" -> (AnalyticsExt.mannKendall _),
    // NDCG@10 ranking-quality evaluation (§2 #244)
    "ann_eval_ndcg" ->
      ((s: SparkSession, d: String) => Similarity.evalNdcg(s, d, NdcgWeightsE6)),
    // Spearman rank correlation with exact tie ranks (§2 #243)
    "q_spearman" -> ((s: SparkSession, d: String) => AnalyticsExt.spearman(s, d)),
    // MinHash estimator calibration audit (§2 #245)
    "dedup_eval" -> (Dedup.estimatorEval _),
    // Herfindahl-Hirschman market concentration (§2 #246)
    "q_hhi" -> (Warehouse.hhi _),
    // TextRank keyword extraction (§2 #247)
    "text_textrank" -> ((s: SparkSession, d: String) => TextStats.textRank(s, d)),
    // WebDataset-style shard packing manifest (§2 #248)
    "mm_shard_pack" ->
      ((s: SparkSession, d: String) => Multimodal.shardPack(s, d, MmShardBudgetBytes)),
    // Shard-balance scorecard over the packer output (§2 #394)
    "mm_shard_balance" ->
      ((s: SparkSession, d: String) => Multimodal.shardBalance(s, d, MmShardBudgetBytes)),
    // AOV mix-shift decomposition by market segment (§2 #393)
    "q_mix_shift" -> (AnalyticsExt.mixShift _),
    // GDPR erasure / purge-manifest audit (§2 #249)
    "cdc_erasure_audit" ->
      ((s: SparkSession, d: String) => Cdc.erasureAudit(s, d, ErasureHorizonDays)),
    // Holt double-exponential smoothing (§2 #250)
    "q_holt" -> (AnalyticsExt.holt _),
    // Top session opening paths (§2 #251)
    "q_top_paths" -> ((s: SparkSession, d: String) => AnalyticsExt.topPaths(s, d)),
    // Two-proportion z-test A/B read-out (§2 #252)
    "q_ab_test" -> (AnalyticsExt.abTest _),
    // Markov stationary distribution (§2 #253)
    "q_markov_stationary" -> ((s: SparkSession, d: String) => AnalyticsExt.markovStationary(s, d)),
    // p-chart control limits without sqrt (§2 #254)
    "q_control_chart" -> (AnalyticsExt.controlChart _),
    // Farthest-point k-center landmark selection (§2 #255)
    "ann_fps" -> ((s: SparkSession, d: String) => Similarity.fps(s, d, FpsK)),
    // Safety stock / reorder point with exact isqrt (§2 #256)
    "q_safety_stock" -> (AnalyticsExt.safetyStock _),
    // ABC-XYZ inventory planning matrix (§2 #257)
    "q_xyz_matrix" -> ((s: SparkSession, d: String) => AnalyticsExt.xyzMatrix(s, d)),
    // Nation basket Jaccard similarity (§2 #258)
    "q_nation_similarity" -> (AnalyticsExt.nationSimilarity _),
    // Half-life discounted LTV (§2 #259)
    "q_discounted_ltv" -> (AnalyticsExt.discountedLtv _),
    // Burstiness / Fano factor per event type (§2 #260)
    "q_burstiness" -> (AnalyticsExt.burstiness _),
    // Functional-dependency discovery (§2 #261)
    "q_fd_check" -> (Profile.fdCheck _),
    // 2-D density heatmap on the integer grid (§2 #262)
    "q_heatmap_2d" -> ((s: SparkSession, d: String) => Profile.heatmap2d(s, d)),
    // Rolling-origin forecast backtest of the Holt model (§2 #264)
    "q_forecast_backtest" -> (AnalyticsExt.forecastBacktest _),
    // Linear gap interpolation between observations (§2 #265)
    "q_interpolate_gaps" -> (AnalyticsExt.interpolateGaps _),
    // Experiment power analysis / sample-size table (§2 #266)
    "q_power_analysis" ->
      ((s: SparkSession, d: String) => AnalyticsExt.powerAnalysis(s, d, PowerZsumE3)),
    // Peak session concurrency sweep (§2 #267)
    "q_peak_concurrency" -> (AnalyticsExt.peakConcurrency _),
    // Physical partition-skew audit (§2 #268)
    "q_partition_skew" -> ((s: SparkSession, d: String) => Scale.partitionSkew(s, d)),
    // New-vs-repeat revenue split (§2 #269)
    "q_new_vs_repeat" -> (AnalyticsExt.newVsRepeat _),
    // DAU/WAU stickiness ratio (§2 #270)
    "q_stickiness" -> (AnalyticsExt.stickiness _),
    // Repurchase cycle: per-customer median order gap (§2 #271)
    "q_repurchase_cycle" -> (AnalyticsExt.repurchaseCycle _),
    // Heaps-law vocabulary growth curve (§2 #272)
    "text_heaps" -> (TextStats.heapsCurve _),
    // Term clumping / Church-Gale burstiness (§2 #273)
    "text_clumping" -> ((s: SparkSession, d: String) => TextStats.termClumping(s, d)),
    // Duplicate-payment forensic screen (§2 #274)
    "q_dup_payments" -> (AnalyticsExt.dupPayments _),
    // Structuring / split-ticket screen (§2 #275)
    "q_structuring" -> ((s: SparkSession, d: String) => AnalyticsExt.structuring(s, d)),
    // IVF cell-balance index-health audit (§2 #276)
    "ann_cell_balance" -> (Similarity.cellBalance _),
    // Point-in-time lag feature generation (§2 #277)
    "q_lag_features" -> (AnalyticsExt.lagFeatures _),
    // Leave-one-out smoothed target encoding (§2 #278)
    "q_target_encoding" -> ((s: SparkSession, d: String) => AnalyticsExt.targetEncoding(s, d)),
    // Feature-hashing collision audit (§2 #279)
    "q_hash_collisions" -> (AnalyticsExt.hashCollisions _),
    // PQ distortion / code-utilization audit (§2 #280)
    "ann_pq_distortion" -> ((s: SparkSession, d: String) => Similarity.pqDistortion(s, d)),
    // Catalog breadth / assortment growth (§2 #281)
    "q_catalog_breadth" -> (AnalyticsExt.catalogBreadth _),
    // Ship-delay SLA percentiles per priority (§2 #282)
    "q_ship_delay" -> (AnalyticsExt.shipDelay _),
    // Common-neighbor link prediction on the co-purchase graph (§2 #283)
    "q_link_prediction" -> ((s: SparkSession, d: String) => AnalyticsExt.linkPrediction(s, d)),
    // Weighted label-propagation communities (§2 #366)
    "q_label_prop" -> ((s: SparkSession, d: String) => AnalyticsExt.labelProp(s, d)),
    // LPA modularity scorecard vs the brand partition (§2 #367)
    "q_label_prop_eval" -> (AnalyticsExt.labelPropEval _),
    // Adamic-Adar hub-discounted link prediction (§2 #368)
    "q_adamic_adar" -> ((s: SparkSession, d: String) => AnalyticsExt.adamicAdar(s, d)),
    // Individuals & moving-range Shewhart chart (§2 #369)
    "q_imr_chart" -> (AnalyticsExt.imrChart _),
    "q_binseg_gain" -> ((s: SparkSession, d: String) => AnalyticsExt.binsegSplit(s, d)),
    "q_woe_iv" -> ((s: SparkSession, d: String) => AnalyticsExt.woeIv(s, d)),
    "q_markov_prediction" ->
      ((s: SparkSession, d: String) => AnalyticsExt.markovPrediction(s, d)),
    "q_permutation_test" ->
      ((s: SparkSession, d: String) => AnalyticsExt.permutationTest(s, d)),
    // X̄-R grouped Shewhart chart over weekly subgroups (§2 #370)
    "q_xbar_r" -> (AnalyticsExt.xbarRChart _),
    // Net / gross revenue retention by base month (§2 #371)
    "q_nrr" -> (AnalyticsExt.nrr _),
    // Heuristics-miner dependency measure (§2 #372)
    "q_hm_dependency" -> (AnalyticsExt.hmDependency _),
    // Cross-source near-dup contamination matrix (§2 #373)
    "dedup_source_matrix" -> (Dedup.sourceMatrix _),
    // Candidate-key discovery over the fixed combo list (§2 #375)
    "q_key_discovery" -> (Profile.keyDiscovery _),
    // Next-event entropy per state (§2 #376)
    "q_markov_entropy" -> (AnalyticsExt.markovEntropy _),
    // Alpha-miner footprint relation matrix (§2 #377)
    "q_alpha_footprint" -> (AnalyticsExt.alphaFootprint _),
    // Hill tail-index estimator of customer revenue (§2 #380)
    "q_hill_tail" -> ((s: SparkSession, d: String) => AnalyticsExt.hillTail(s, d)),
    // Top whole-journey trace variants (§2 #381)
    "q_trace_variants" -> ((s: SparkSession, d: String) => AnalyticsExt.traceVariants(s, d)),
    "q_footprint_conformance" ->
      ((s: SparkSession, d: String) => AnalyticsExt.footprintConformance(s, d)),
    // Monthly CR4/CR8 customer concentration (§2 #382)
    "q_cr_concentration" -> (AnalyticsExt.crConcentration _),
    // Purchase-streak gaps-and-islands histogram (§2 #383)
    "q_purchase_streaks" -> (AnalyticsExt.purchaseStreaks _),
    // Markov removal-effect attribution (§2 #384)
    "q_markov_attribution" -> ((s: SparkSession, d: String) => AnalyticsExt.markovAttribution(s, d)),
    "q_shapley_attribution" ->
      ((s: SparkSession, d: String) => AnalyticsExt.shapleyAttribution(s, d)),
    // Edge embeddedness / tie strength (§2 #385)
    "q_edge_embeddedness" -> ((s: SparkSession, d: String) => AnalyticsExt.edgeEmbeddedness(s, d)),
    // Temperature-scaled mixture sweep (§2 #386)
    "q_alpha_mixture" -> (Sampling.alphaMixture _),
    // Syntetos-Boylan demand-class quadrants (§2 #387)
    "q_demand_classes" -> (AnalyticsExt.demandClasses _),
    // CUSUM drift chart on daily revenue (§2 #284)
    "q_cusum" -> (AnalyticsExt.cusumChart _),
    // Lorenz curve by customer decile (§2 #285)
    "q_lorenz" -> ((s: SparkSession, d: String) => AnalyticsExt.lorenzCurve(s, d)),
    // Promo diff-in-differences (§2 #286)
    "q_did" -> (AnalyticsExt.diffInDiff _),
    // Inclusion-dependency discovery (§2 #287)
    "q_ind_discovery" -> (Profile.indCheck _),
    // Mann–Whitney U rank-sum test, promo vs non-promo (§2 #288)
    "q_mann_whitney" -> ((s: SparkSession, d: String) => AnalyticsExt.mannWhitney(s, d)),
    // Kendall tau-b of daily order count vs revenue (§2 #337)
    "q_kendall_tau" -> ((s: SparkSession, d: String) => AnalyticsExt.kendallTau(s, d)),
    // Cohen's d / Hedges' g promo-vs-rest effect size (§2 #338)
    "q_cohens_d" -> ((s: SparkSession, d: String) => AnalyticsExt.cohensD(s, d)),
    // Cliff's delta ordinal effect size off the U frame (§2 #339)
    "q_cliffs_delta" -> ((s: SparkSession, d: String) => AnalyticsExt.cliffsDelta(s, d)),
    // One-way ANOVA F across order priorities (§2 #340)
    "q_anova_f" -> ((s: SparkSession, d: String) => AnalyticsExt.anovaF(s, d)),
    // Brown-Forsythe Levene variance-homogeneity test (§2 #341)
    "q_levene" -> ((s: SparkSession, d: String) => AnalyticsExt.levene(s, d)),
    // Ljung-Box portmanteau whiteness test, lags 1..10 (§2 #342)
    "q_ljung_box" -> ((s: SparkSession, d: String) => AnalyticsExt.ljungBox(s, d)),
    // Wald–Wolfowitz runs test on daily revenue (§2 #289)
    "q_runs_test" -> (AnalyticsExt.runsTest _),
    // Day-of-week seasonality profile (§2 #290)
    "q_dow_seasonality" -> (AnalyticsExt.dowSeasonality _),
    // Flesch readability components (§2 #291)
    "text_readability" -> (TextOps.readability _),
    // Holt-Winters additive triple smoothing (§2 #292)
    "q_holt_winters" -> (AnalyticsExt.holtWinters _),
    // ABC class migration matrix (§2 #293)
    "q_abc_migration" -> ((s: SparkSession, d: String) => AnalyticsExt.abcMigration(s, d)),
    // Vintage revenue ramp by part age (§2 #294)
    "q_vintage_ramp" -> (AnalyticsExt.vintageRamp _),
    // Monthly p25/p50/p75 daily-revenue bands (§2 #295)
    "q_monthly_bands" -> (AnalyticsExt.monthlyBands _),
    // Cell-bounded corpus k-NN graph (§2 #296)
    "ann_knn_graph" -> ((s: SparkSession, d: String) => Similarity.knnGraph(s, d)),
    // LSH band/row S-curve tuning table (§2 #298)
    "dedup_scurve" -> ((s: SparkSession, _: String) => Dedup.scurveTable(s)),
    // Seasonal/trend strength F-statistics (§2 #299)
    "q_seasonal_strength" -> (AnalyticsExt.seasonalStrength _),
    // Economic order quantity (§2 #300)
    "q_eoq" -> ((s: SparkSession, d: String) => AnalyticsExt.eoq(s, d)),
    // Nelson-Aalen cumulative hazard (§2 #301)
    "q_nelson_aalen" -> ((s: SparkSession, d: String) => AnalyticsExt.nelsonAalen(s, d)),
    // Log-rank two-sample survival test (§2 #302)
    "q_logrank" -> ((s: SparkSession, d: String) => AnalyticsExt.logRank(s, d)),
    // Lift / cumulative-gains table (§2 #303)
    "q_lift_table" -> ((s: SparkSession, d: String) => AnalyticsExt.liftTable(s, d)),
    // Brand-partition modularity of the co-purchase graph (§2 #304)
    "q_modularity" -> ((s: SparkSession, d: String) => AnalyticsExt.modularity(s, d)),
    // Discount elasticity OLS per brand (§2 #305)
    "q_discount_elasticity" ->
      ((s: SparkSession, d: String) => AnalyticsExt.discountElasticity(s, d)),
    // Frequent 3-itemsets from basket combinations (§2 #306)
    "q_itemsets3" -> ((s: SparkSession, d: String) => AnalyticsExt.itemsets3(s, d)),
    // Simpson lexical diversity per source (§2 #307)
    "text_simpson" -> ((s: SparkSession, d: String) => TextStats.simpson(s, d)),
    // Systematic sample over the salted-hash layout (§2 #308)
    "q_systematic_sample" -> ((s: SparkSession, d: String) => Sampling.systematicSample(s, d)),
    // Kruskal-Wallis k-sample rank test (§2 #309)
    "q_kruskal_wallis" -> ((s: SparkSession, d: String) => AnalyticsExt.kruskalWallis(s, d)),
    // Laspeyres/Paasche/Fisher monthly price indices (§2 #310)
    "q_price_index" -> ((s: SparkSession, d: String) => AnalyticsExt.priceIndex(s, d)),
    // Jensen-Shannon drift per source (§2 #311)
    "text_js_drift" -> (TextStats.jsDrift _),
    // Newsvendor critical-fractile stocking level (§2 #312)
    "q_newsvendor" -> ((s: SparkSession, d: String) => AnalyticsExt.newsvendor(s, d)),
    // Mutual information lang x source (§2 #313)
    "text_mutual_info" -> (TextStats.mutualInfo _),
    // Pairwise Pearson correlation matrix over lineitem measures (§2 #314)
    "q_corr_matrix" -> ((s: SparkSession, d: String) => AnalyticsExt.corrMatrix(s, d)),
    // K-truss edge peeling of the co-purchase graph (§2 #315)
    "q_ktruss" -> ((s: SparkSession, d: String) => AnalyticsExt.ktruss(s, d)),
    // Bloom-filter measured-vs-theory FPR scorecard (§2 #365)
    "q_bloom_fpr" -> ((s: SparkSession, d: String) => Scale.bloomFpr(s, d)),
    // Month-over-month revenue bridge decomposition (§2 #363)
    "q_revenue_bridge" -> ((s: SparkSession, d: String) => AnalyticsExt.revenueBridge(s, d)),
    // Per-label embedding centroid drift (§2 #364)
    "ann_embedding_drift" -> ((s: SparkSession, d: String) => Similarity.embeddingDrift(s, d)),
    // PSI drift monitor per event type x week (§2 #358)
    "q_psi" -> ((s: SparkSession, d: String) => AnalyticsExt.psi(s, d)),
    // LSH recall@k curve vs brute force (§2 #359)
    "ann_recall_curve" -> ((s: SparkSession, d: String) => Similarity.recallCurve(s, d)),
    // Split-balance KS audit across content-hash splits (§2 #360)
    "q_split_balance" -> ((s: SparkSession, d: String) => Sampling.splitBalance(s, d)),
    // Tukey-fence outlier profile per priority (§2 #361)
    "q_tukey_fences" -> ((s: SparkSession, d: String) => AnalyticsExt.tukeyFences(s, d)),
    // Supplier return-rate Wilson lower-bound ranking (§2 #352)
    "q_return_wilson" -> ((s: SparkSession, d: String) => Warehouse.returnWilson(s, d)),
    // Changelog hot-key audit (§2 #353)
    "cdc_hot_keys" -> ((s: SparkSession, d: String) => Cdc.hotKeys(s, d)),
    // Inter-arrival percentiles per event type (§2 #354)
    "q_interarrival" -> ((s: SparkSession, d: String) => AnalyticsExt.interarrival(s, d)),
    // Split-leakage audit over near-dup pairs (§2 #355)
    "dedup_split_leakage" -> ((s: SparkSession, d: String) => Dedup.splitLeakage(s, d)),
    // Payload byte-entropy screen (§2 #356)
    "mm_byte_entropy" -> ((s: SparkSession, d: String) => Multimodal.byteEntropy(s, d)),
    "mm_cdc_chunks" -> ((s: SparkSession, d: String) => Multimodal.cdcChunks(s, d)),
    // Decision-stump Gini split gain (§2 #357)
    "q_split_gain" -> ((s: SparkSession, d: String) => AnalyticsExt.splitGain(s, d)),
    // Degree distribution by octave + power-law ratio (§2 #348)
    "q_degree_dist" -> ((s: SparkSession, d: String) => AnalyticsExt.degreeDist(s, d)),
    // EWMA control chart with exact dyadic limits (§2 #349)
    "q_ewma_chart" -> ((s: SparkSession, d: String) => AnalyticsExt.ewmaChart(s, d)),
    // Sampled-source truncated-Brandes betweenness (§2 #334)
    "q_betweenness" -> ((s: SparkSession, d: String) => AnalyticsExt.betweenness(s, d)),
    // Betweenness estimator scorecard vs a denser reference (§2 #335)
    "q_betweenness_eval" -> ((s: SparkSession, d: String) => AnalyticsExt.betweennessEval(s, d)),
    // Sampled harmonic closeness from the same BFS (§2 #336)
    "q_closeness" -> ((s: SparkSession, d: String) => AnalyticsExt.closeness(s, d)),
    // Croston intermittent-demand smoothing per part (§2 #316)
    "q_croston" -> ((s: SparkSession, d: String) => AnalyticsExt.croston(s, d)),
    // Link-prediction precision@K backtest on a time split (§2 #317)
    "q_linkpred_backtest" -> ((s: SparkSession, d: String) => AnalyticsExt.linkPredBacktest(s, d)),
    // Theil T inequality index decomposed by nation (§2 #318)
    "q_theil" -> ((s: SparkSession, d: String) => AnalyticsExt.theil(s, d)),
    // Propensity-stratified treatment effect (§2 #319)
    "q_propensity_strata" -> ((s: SparkSession, d: String) => AnalyticsExt.propensityStrata(s, d)),
    // Welch unequal-variance t-test, squared form (§2 #320)
    "q_welch_t" -> ((s: SparkSession, d: String) => AnalyticsExt.welchT(s, d)),
    // Cohen's kappa of the language-ID heuristic (§2 #321)
    "text_lang_kappa" -> (TextStats.langKappa _),
    // Order-vs-lineitem reconciliation audit (§2 #322)
    "q_order_reconciliation" ->
      ((s: SparkSession, d: String) => AnalyticsExt.orderReconciliation(s, d)),
    // Brier score + Murphy decomposition on a calendar holdout (§2 #323)
    "q_brier_decomp" -> ((s: SparkSession, d: String) => AnalyticsExt.brierDecomp(s, d)),
    // ACF-based dominant-period detection (§2 #324)
    "q_period_detect" -> ((s: SparkSession, d: String) => AnalyticsExt.periodDetect(s, d)),
    // Seasonal Mann-Kendall trend test (§2 #326)
    "q_seasonal_mk" -> ((s: SparkSession, d: String) => AnalyticsExt.seasonalMannKendall(s, d)),
    // Cramer's V effect size for the status x priority table (§2 #327)
    "q_cramers_v" -> ((s: SparkSession, d: String) => AnalyticsExt.cramersV(s, d)),
    // Church-Gale term burstiness over top-df terms (§2 #328)
    "text_burstiness" -> ((s: SparkSession, d: String) => TextStats.termBurstiness(s, d)),
    // Bigram conditional entropy of the corpus LM (§2 #329)
    "text_cond_entropy" -> (TextStats.condEntropy _),
    // Odds / risk ratio of the 2x2 promo x completion table (§2 #330)
    "q_odds_ratio" -> ((s: SparkSession, d: String) => AnalyticsExt.oddsRatio(s, d)),
    // Page-Hinkley self-calibrating drift chart (§2 #331)
    "q_page_hinkley" -> ((s: SparkSession, d: String) => AnalyticsExt.pageHinkley(s, d)),
    // Month-over-month assortment turnover (§2 #332)
    "q_assortment_turnover" ->
      ((s: SparkSession, d: String) => AnalyticsExt.assortmentTurnover(s, d)),
    // Per-part supplier concentration / single-source risk (§2 #333)
    "q_supplier_hhi" -> ((s: SparkSession, d: String) => AnalyticsExt.supplierConcentration(s, d))
  )

  /** The #314 oracle, GENERATED from the same variable/pair list as
    * the Spark operator (`AnalyticsExt.CorrMatrixVars`) — adding a
    * variable changes both sides or neither (kcoreOracle precedent).
    */
  private def corrMatrixOracle: String = {
    val vs = operators.AnalyticsExt.CorrMatrixVars
    val names = vs.map(_._1)
    val grids = vs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val sums = names.map(v => s"CAST(sum($v) AS BIGINT) AS s_$v") ++
      (for { i <- names.indices; j <- i until names.length } yield {
        val (a, b) = (names(i), names(j))
        s"sum(CAST($a AS HUGEINT) * $b) AS s_${a}_${b}"
      })
    val pairSelects = (for {
      i <- names.indices
      j <- (i + 1) until names.length
    } yield {
      val (a, b) = (names(i), names(j))
      s"""SELECT '$a' AS var_x, '$b' AS var_y, n,
            CAST(n AS HUGEINT) * s_${a}_${b} - CAST(s_$a AS HUGEINT) * s_$b AS num,
            CAST(n AS HUGEINT) * s_${a}_${a} - CAST(s_$a AS HUGEINT) * s_$a AS den_x,
            CAST(n AS HUGEINT) * s_${b}_${b} - CAST(s_$b AS HUGEINT) * s_$b AS den_y
          FROM m"""
    }).mkString("\n          UNION ALL\n          ")
    s"""WITH base AS (SELECT $grids FROM lineitem),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n, ${sums.mkString(", ")} FROM base),
         pairs AS (
          $pairSelects)
         SELECT var_x, var_y, n,
           CASE WHEN den_x > 0 AND den_y > 0 THEN
             CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
               ((abs(num) * 1000 // den_x)
                * (abs(num) * 1000 // den_y)) AS BIGINT)
           ELSE NULL END AS r2_signed_e6
         FROM pairs"""
  }

  /** The minhash universal-hash family as a DuckDB list expression:
    * sig = [min over shingle hashes h of (aᵢ·(h mod P) + bᵢ) mod P]
    * with the SAME (aᵢ, bᵢ, P) constants the `minhash_sig` kernel uses
    * (graft.functions.MinHashSig) — signatures are bit-identical
    * across engines, which is what lets the LSH dedup chain be
    * hash-compared instead of rows-only checked.
    */
  private def minhashFamilySql: String = {
    val p = graft.functions.MinHashSig.P
    (0 until 32)
      .map(i =>
        s"list_min([(${graft.functions.MinHashSig.a(i)}*(h % $p) + " +
          s"${graft.functions.MinHashSig.b(i)}) % $p for h in hs])")
      .mkString("[", ", ", "]")
  }

  /** Shared CTE prefix of the near-dup dedup oracles: the duplicated
    * corpus (every 5th doc truncated to 80% of tokens, ids offset by
    * 1M), 3-token shingles, the engine-portable 60-bit md5 hash
    * (`Dedup.hash60` ↔ `('0x' || substr(md5(s),1,15))::BIGINT`),
    * minhash signatures, and banded candidate pairs (8 bands × 4 rows,
    * pair survives iff some band slice matches exactly).
    */
  private def minhashCandidatesCte(recursive: Boolean): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$kw toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS sh
           FROM corpus),
         hsets AS (
           SELECT doc_id, [('0x' || substr(md5(s), 1, 15))::BIGINT for s in sh] AS hs
           FROM sh),
         sigs AS (
           SELECT doc_id, $minhashFamilySql AS sig, hs FROM hsets),
         cand AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig AS sig_a, b.sig AS sig_b, a.hs AS hs_a, b.hs AS hs_b,
             CAST(len([bb for bb in range(8)
                       if a.sig[bb*4+1:bb*4+4] = b.sig[bb*4+1:bb*4+4]]) AS BIGINT)
               AS n_shared_bands
           FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)"""
  }

  /** Shared CTE block of the hyperplane-LSH oracles — the exact
    * relational replay of `Similarity.hyperplaneBucket`: derived bit
    * count (smallest b with TargetBucket·2^b ≥ n, integer-exact on
    * both engines), the md5-parity Rademacher sign matrix
    * (`Similarity.lshSign`), 1e6 fixed-point embedding elements,
    * integer hyperplane dots (order-independent — integer sums are
    * exact), and the per-(table, vector) bucket id. `corpus` must
    * expose (vec_id, embedding); `countExpr` is a scalar subquery
    * yielding the n that `numPlanes` is derived from.
    */
  private def lshBucketsCte(
      corpus: String,
      countExpr: String,
      tables: Int = graft.operators.Similarity.NumTables): String = {
    val tb = graft.operators.Similarity.TargetBucket
    val nt = tables
    s"""params AS (
          SELECT least(24, greatest(4, coalesce(
            (SELECT min(b) FROM range(25) rb(b)
             WHERE ($tb::BIGINT << b) >= ($countExpr)), 24))) AS bits),
        sgn AS (
          SELECT t, p, i,
            CASE WHEN ('0x' || substr(md5('graft-lsh:' || t || ':' || p || ':' || i),
                       1, 15))::BIGINT % 2 = 0
                 THEN 1 ELSE -1 END AS s
          FROM range($nt) r1(t), range(24) r2(p), range(64) r3(i), params
          WHERE p < bits),
        el AS (
          SELECT vec_id,
            unnest([{'i': i - 1,
                     'qx': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)}
                    for i in generate_series(1, 64)]) AS e
          FROM $corpus),
        dots AS (
          SELECT el.vec_id, sgn.t, sgn.p, sum(sgn.s * el.e.qx) AS dot
          FROM el JOIN sgn ON el.e.i = sgn.i
          GROUP BY el.vec_id, sgn.t, sgn.p),
        bk AS (
          SELECT vec_id, t,
            CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, t)"""
  }

  /** Product-quantization replay shared by `ann_pq_codes` and
    * `ann_pq_search`: e4 fixed-point subvectors, seed codebooks from
    * the 16 lowest vec_ids, two unrolled Lloyd rounds on integer
    * squared-L2 (code tiebreak), integer-grid codeword means — every
    * sum is over BIGINTs, so the whole train lands bit-identical in
    * any engine (see Similarity.quantE4). `af` is the final code
    * assignment under the round-2 codebook `c2`.
    */
  /** Two-stage PQ ADC search replay body over a `pfx`-prefixed
    * training CTE chain: query distance tables off the round-2
    * codebook, ADC via code joins, top-100 shortlist, exact
    * integer-L2 re-rank; final CTE `${pfx}res` holds the top-10.
    */
  private def pqSearchBody(pfx: String): String =
    s"""${pfx}qsub AS (SELECT vec_id AS query_id, s, sv FROM ${pfx}sub WHERE vec_id < 10),
         ${pfx}dt AS (
           SELECT u.query_id, u.s, c.code,
             CAST(list_sum([ (u.sv[i] - c.cw[i]) * (u.sv[i] - c.cw[i])
                             for i in generate_series(1, 16) ]) AS BIGINT) AS d
           FROM ${pfx}qsub u JOIN ${pfx}c2 c USING (s)),
         ${pfx}adc AS (
           SELECT dt.query_id, af.vec_id, CAST(sum(dt.d) AS BIGINT) AS adc_e8
           FROM ${pfx}af af JOIN ${pfx}dt dt ON af.s = dt.s AND af.code = dt.code
           GROUP BY dt.query_id, af.vec_id),
         ${pfx}cand AS (
           SELECT query_id, vec_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_e8, vec_id) AS crank
             FROM ${pfx}adc WHERE vec_id <> query_id)
           WHERE crank <= 100),
         ${pfx}ex AS (
           SELECT c.query_id, c.vec_id,
             CAST(list_sum([ (e.eq[i] - q.eq[i]) * (e.eq[i] - q.eq[i])
                             for i in generate_series(1, 64) ]) AS BIGINT) AS dist_e8
           FROM ${pfx}cand c JOIN ${pfx}eq e ON e.vec_id = c.vec_id
                       JOIN ${pfx}eq q ON q.vec_id = c.query_id),
         ${pfx}res AS (
           SELECT query_id, vec_id, dist_e8, rank FROM (
             SELECT query_id, vec_id, dist_e8,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY dist_e8, vec_id) AS BIGINT) AS rank
             FROM ${pfx}ex)
           WHERE rank <= 10)"""

  private def pqSearchOracle(ctes: String): String =
    s"""WITH $ctes,
         ${pqSearchBody("")}
         SELECT query_id, vec_id, dist_e8, rank FROM res"""

  /** q_ind_discovery oracle — GENERATED from Profile.indCandidates so
    * the oracle's candidate list can never drift from the operator's
    * (the kcoreOracle shared-constant precedent).
    */
  private def indDiscoveryOracle: String =
    Profile.indCandidates
      .map { case (lt, lc, rt, rc) =>
        s"""SELECT '$lt.$lc' AS lhs, '$rt.$rc' AS rhs, n_lhs_values, n_missing,
              CAST((n_lhs_values - n_missing) * 1000000 // n_lhs_values AS BIGINT)
                AS coverage_e6,
              CAST(n_missing = 0 AS BIGINT) AS holds
            FROM (
              SELECT
                (SELECT CAST(count(DISTINCT $lc) AS BIGINT) FROM $lt
                 WHERE $lc IS NOT NULL) AS n_lhs_values,
                (SELECT CAST(count(*) AS BIGINT)
                 FROM (SELECT DISTINCT $lc AS v FROM $lt WHERE $lc IS NOT NULL) t
                 WHERE NOT EXISTS (SELECT 1 FROM $rt WHERE $rc = t.v)) AS n_missing)"""
      }
      .mkString("\n UNION ALL \n")

  private def plainEqList: String =
    """[CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
           for i in generate_series(1, 64)]"""

  private def pqCtes: String = pqCtesWith(plainEqList)

  /** A rotated-quantized list for one OPQ candidate: slot j reads dim
    * perm(j) with sign(j) — the SAME Scala-computed constants the
    * Spark expression inlines, so both engines evaluate a
    * literal-identical float op per element.
    */
  private def opqEqList(salt: Int): String = {
    val (perm, sign) = graft.operators.Similarity.opqPermSign(salt)
    (0 until 64)
      .map { j =>
        val p = perm(j) + 1
        val sgn = if (sign(j) > 0) "1.0" else "-1.0"
        s"CAST(floor(CAST(embedding[$p] AS DOUBLE) * $sgn * 10000.0 + 0.5) AS BIGINT)"
      }
      .mkString("[", ", ", "]")
  }

  /** The OPQ rotation-selection replay: train + search under every
    * candidate (identity first, then the fixed salts), count each
    * candidate's recall hits against the brute-force exact-L2 truth,
    * and emit the winner's rows — `ORDER BY hits DESC, tag` replays
    * Spark's first-max-wins argmax (identity wins ties).
    */
  private def opqSearchOracle: String = {
    val salts = graft.operators.Similarity.OpqSalts
    val tags = "i" +: salts.indices.map(k => ('a' + k).toChar.toString)
    val eqs = plainEqList +: salts.map(opqEqList)
    val chains = tags.zip(eqs).map { case (t, eq) =>
      s"${pqCtesWith(eq, s"${t}_")}, ${pqSearchBody(s"${t}_")}"
    }
    val scores = tags.zipWithIndex
      .map { case (t, k) =>
        s"""SELECT '${k}_$t' AS tag, (SELECT count(*) FROM ${t}_res r
             JOIN truth t ON r.query_id = t.query_id AND r.vec_id = t.vec_id) AS c"""
      }
      .mkString(" UNION ALL ")
    val pick = tags.zipWithIndex
      .map { case (t, k) =>
        s"""SELECT query_id, vec_id, dist_e8, rank FROM ${t}_res
            WHERE (SELECT tag FROM win) = '${k}_$t'"""
      }
      .mkString(" UNION ALL ")
    s"""WITH ${chains.mkString(",\n")},
        truth AS (SELECT query_id, vec_id FROM (
          SELECT q.vec_id AS query_id, e.vec_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY list_sum([ (e.eq[i] - q.eq[i]) * (e.eq[i] - q.eq[i])
                                  for i in generate_series(1, 64) ]), e.vec_id) AS rn
          FROM i_eq e JOIN i_eq q ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE rn <= 10),
        sc AS ($scores),
        win AS (SELECT tag FROM sc ORDER BY c DESC, tag LIMIT 1)
        $pick"""
  }

  private def pqCtesWith(eqList: String, pfx: String = ""): String = {
    val meanTerms = (1 to graft.operators.Similarity.PqSubDim)
      .map(i => s"CAST(floor(avg(sv[$i]) + 0.5) AS BIGINT)")
      .mkString(", ")
    val distList =
      "list_sum([ (u.sv[i] - c.cw[i]) * (u.sv[i] - c.cw[i]) for i in generate_series(1, 16) ])"
    def assign(cents: String, out: String) =
      s"""$out AS (SELECT vec_id, s, sv, code, dist FROM (
            SELECT u.vec_id, u.s, u.sv, c.code,
              CAST($distList AS BIGINT) AS dist,
              row_number() OVER (PARTITION BY u.vec_id, u.s
                ORDER BY $distList, c.code) AS rn
            FROM ${pfx}sub u JOIN $cents c USING (s)) WHERE rn = 1)"""
    def means(asg: String, out: String) =
      s"$out AS (SELECT s, code, [$meanTerms] AS cw FROM $asg GROUP BY s, code)"
    s"""${pfx}eq AS (SELECT vec_id, $eqList AS eq
        FROM embeddings),
      ${pfx}sub AS (SELECT vec_id, CAST(r.s AS INT) AS s, eq[(r.s*16+1):(r.s*16+16)] AS sv
              FROM ${pfx}eq, (SELECT unnest(range(0, 4)) AS s) r),
      ${pfx}s0 AS (SELECT s,
               CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INT) AS code,
               sv AS cw
             FROM ${pfx}sub
             WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      ${assign(s"${pfx}s0", s"${pfx}a1")}, ${means(s"${pfx}a1", s"${pfx}c1")},
      ${assign(s"${pfx}c1", s"${pfx}a2")}, ${means(s"${pfx}a2", s"${pfx}c2")},
      ${assign(s"${pfx}c2", s"${pfx}af")}"""
  }

  /** Two-stage projected-search replay, shared by `ann_project_search`
    * and `ann_project_indexed` (bit-identical by construction):
    * identical float projection, 6dp projected cosine ranking with
    * vec_id tiebreak, exact re-score of the top-150 survivors.
    */
  private def projectSearchOracle: String = {
    val k = 32
    val rows = (0 until k).map { j =>
      (0 until 64)
        .map(i =>
          s"${if (graft.operators.Similarity.rpSign(i, j) > 0) "+" else "-"} CAST(embedding[${i + 1}] AS DOUBLE)")
        .mkString(" ")
    }
    val ys = rows.map(t => s"CAST((0.0 $t) / sqrt(CAST($k AS DOUBLE)) AS FLOAT)").mkString(", ")
    s"""WITH pv AS (SELECT vec_id, embedding, [$ys] AS pvec FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS q_emb, pvec AS q_pvec
              FROM pv WHERE vec_id < 10),
        cand AS (
          SELECT query_id, vec_id, embedding, q_emb,
            row_number() OVER (PARTITION BY query_id
              ORDER BY round(list_cosine_similarity(
                pvec::DOUBLE[], q_pvec::DOUBLE[]), 6) DESC, vec_id) AS crank
          FROM pv, q WHERE vec_id <> query_id)
        SELECT query_id, vec_id, cos, rank FROM (
          SELECT query_id, vec_id,
            round(list_cosine_similarity(embedding::DOUBLE[], q_emb::DOUBLE[]), 6) AS cos,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(list_cosine_similarity(
                embedding::DOUBLE[], q_emb::DOUBLE[]), 6) DESC, vec_id) AS BIGINT) AS rank
          FROM cand WHERE crank <= 150)
        WHERE rank <= 10"""
  }

  /** Lang-ID replay (stopword-marker argmax with the same (score,
    * lang) tiebreak), shared by `text_lang_id` and the confusion
    * audit that aggregates it.
    */
  private def langIdOracle: String = {
    val markers = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
      "en" -> Seq("the", "a", "of", "and", "is", "to"),
      "es" -> Seq("el", "la", "los", "y", "es", "de"),
      "fr" -> Seq("le", "la", "les", "et", "est", "de"),
      "zh" -> Seq("的", "了", "是", "在", "和", "有"))
    val structs = markers
      .map { case (l, ws) =>
        val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
        s"struct_pack(lang := '$l', score := len(list_filter(toks, w -> list_contains($list, w))))"
      }
      .mkString(",\n             ")
    s"""WITH t AS (SELECT doc_id, lang AS label_lang,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
         FROM documents),
       s AS (SELECT doc_id, label_lang, u.s.lang AS lang, u.s.score AS score
             FROM t, UNNEST([
           $structs
         ]) AS u(s))
       SELECT doc_id, label_lang,
         CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang,
         CAST(score AS BIGINT) AS marker_hits
       FROM (SELECT *, row_number() OVER
               (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM s)
       WHERE rn = 1"""
  }

  /** Shared IVFADC replay: 3-round e4-cosine IVF train (as ann_ivf),
    * exact BIGINT residuals, 2-round integer PQ train on residuals,
    * per-probed-cell ADC, exact integer-L2 re-rank of the top-100.
    * `ann_ivfadc` and `ann_ivfadc_indexed` are bit-identical by
    * construction, so both entries use this text.
    */
  private def ivfAdcOracle: String = {
    val meanTerms64 = (1 to 64)
        .map(i => s"CAST(floor(avg(CAST(embedding[$i] AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS FLOAT)")
        .mkString(", ")
      def iassign(cents: String, out: String) =
        s"""$out AS (SELECT vec_id, embedding, cell FROM (
              SELECT u.vec_id, u.embedding, c.cell,
                row_number() OVER (PARTITION BY u.vec_id
                  ORDER BY floor(list_cosine_similarity(
                    u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM u, $cents c) WHERE rn = 1)"""
      def imeans(asg: String, out: String) =
        s"$out AS (SELECT cell, [$meanTerms64] AS centroid FROM $asg GROUP BY cell)"
      val pqMeanTerms = (1 to 16)
        .map(i => s"CAST(floor(avg(sv[$i]) + 0.5) AS BIGINT)")
        .mkString(", ")
      val pdist =
        "list_sum([ (u.sv[i] - c.cw[i]) * (u.sv[i] - c.cw[i]) for i in generate_series(1, 16) ])"
      def passign(cents: String, out: String) =
        s"""$out AS (SELECT vec_id, cell, s, sv, code FROM (
              SELECT u.vec_id, u.cell, u.s, u.sv, c.code,
                row_number() OVER (PARTITION BY u.vec_id, u.s
                  ORDER BY $pdist, c.code) AS rn
              FROM rsub u JOIN $cents c USING (s)) WHERE rn = 1)"""
      def pmeans(asg: String, out: String) =
        s"$out AS (SELECT s, code, [$pqMeanTerms] AS cw FROM $asg GROUP BY s, code)"
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings),
         s0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                  embedding AS centroid
                FROM embeddings ORDER BY vec_id LIMIT 16),
         ${iassign("s0", "ia1")}, ${imeans("ia1", "ic1")},
         ${iassign("ic1", "ia2")}, ${imeans("ia2", "ic2")},
         ${iassign("ic2", "ia3")}, ${imeans("ia3", "ic3")},
         ${iassign("ic3", "acorp")},
         eq AS (SELECT vec_id,
                  [CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
                   for i in generate_series(1, 64)] AS eq
                FROM embeddings),
         ceq AS (SELECT cell,
                   [CAST(floor(CAST(centroid[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
                    for i in generate_series(1, 64)] AS ceq
                 FROM ic3),
         res AS (SELECT a.vec_id, a.cell,
                   [e.eq[i] - c.ceq[i] for i in generate_series(1, 64)] AS req
                 FROM acorp a JOIN eq e USING (vec_id) JOIN ceq c USING (cell)),
         rsub AS (SELECT vec_id, cell, CAST(r.s AS INT) AS s,
                    req[(r.s*16+1):(r.s*16+16)] AS sv
                  FROM res, (SELECT unnest(range(0, 4)) AS s) r),
         ps0 AS (SELECT s,
                   CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INT) AS code,
                   sv AS cw
                 FROM rsub
                 WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
         ${passign("ps0", "pa1")}, ${pmeans("pa1", "pc1")},
         ${passign("pc1", "pa2")}, ${pmeans("pa2", "pc2")},
         ${passign("pc2", "paf")},
         q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 10),
         qc AS (SELECT query_id, cell FROM (
             SELECT q.query_id, c.cell,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY floor(list_cosine_similarity(
                   q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                   DESC, c.cell) AS rn
             FROM q, ic3 c) WHERE rn <= 2),
         qres AS (SELECT qc.query_id, qc.cell,
                    [e.eq[i] - c.ceq[i] for i in generate_series(1, 64)] AS qreq
                  FROM qc JOIN eq e ON e.vec_id = qc.query_id JOIN ceq c USING (cell)),
         qsub AS (SELECT query_id, cell, CAST(r.s AS INT) AS s,
                    qreq[(r.s*16+1):(r.s*16+16)] AS sv
                  FROM qres, (SELECT unnest(range(0, 4)) AS s) r),
         dt AS (SELECT u.query_id, u.cell, u.s, c.code,
                  CAST(list_sum([ (u.sv[i] - c.cw[i]) * (u.sv[i] - c.cw[i])
                                  for i in generate_series(1, 16) ]) AS BIGINT) AS d
                FROM qsub u JOIN pc2 c USING (s)),
         adc AS (SELECT dt.query_id, paf.vec_id, CAST(sum(dt.d) AS BIGINT) AS adc_e8
                 FROM paf JOIN dt ON paf.cell = dt.cell AND paf.s = dt.s
                                 AND paf.code = dt.code
                 GROUP BY dt.query_id, paf.vec_id),
         cand AS (SELECT query_id, vec_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_e8, vec_id) AS crank
             FROM adc WHERE vec_id <> query_id) WHERE crank <= 100),
         ex AS (SELECT c.query_id, c.vec_id,
                  CAST(list_sum([ (e.eq[i] - qe.eq[i]) * (e.eq[i] - qe.eq[i])
                                  for i in generate_series(1, 64) ]) AS BIGINT) AS dist_e8
                FROM cand c JOIN eq e ON e.vec_id = c.vec_id
                            JOIN eq qe ON qe.vec_id = c.query_id)
         SELECT query_id, vec_id, dist_e8, rank FROM (
           SELECT query_id, vec_id, dist_e8,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist_e8, vec_id) AS BIGINT) AS rank
           FROM ex)
         WHERE rank <= 10"""
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // Sketch queries (#20, #46, #59): the sketch estimate is engine-
    // specific, so each emits exact values the oracle reproduces plus
    // a flag asserting the sketch's error contract — the oracle's
    // constant-1 flags make an out-of-bounds sketch a hash FAIL.
    // Bloom join pruning (#144): the bloom filter admits false
    // positives only, so the pruned-then-joined result is
    // bit-identical to the plain join — the oracle IS the plain join.
    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderpriority""",
    "q_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users_exact,
           CAST(1 AS INTEGER) AS within_3rsd
         FROM events GROUP BY event_type""",
    // Count-min sketch (#147): all-integer md5-parity hashes, so the
    // oracle replays the ESTIMATE itself — counters, min-lookup,
    // realized overcount — not just a contract flag.
    "q_cms_counts" ->
      """WITH ev AS (SELECT user_id FROM events),
         pos AS MATERIALIZED (
           SELECT user_id, d,
             ('0x' || substr(md5('graft-cms-' || d || ':' || user_id), 1, 15))::BIGINT
               % 256 AS b
           FROM ev, range(3) r(d)),
         counters AS MATERIALIZED (
           SELECT d, b, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY d, b),
         exact AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact FROM ev GROUP BY user_id),
         est AS (
           SELECT up.user_id, min(co.c) AS n_cms
           FROM (SELECT DISTINCT user_id, d, b FROM pos) up
           JOIN counters co USING (d, b)
           GROUP BY up.user_id)
         SELECT e.user_id, e.n_exact, s.n_cms, s.n_cms - e.n_exact AS overcount
         FROM exact e JOIN est s USING (user_id)""",
    "q_approx_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(1 AS INTEGER) AS ok50, CAST(1 AS INTEGER) AS ok90,
           CAST(1 AS INTEGER) AS ok99
         FROM lineitem GROUP BY l_returnflag""",
    "q_freq_items" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(1 AS INTEGER) AS in_sketch
         FROM events GROUP BY event_type
         HAVING count(*) > 0.1 * (SELECT count(*) FROM events)""",
    "cdc_classify" ->
      """SELECT event_id, epoch_us(ts) AS ts, user_id,
         CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE'
              ELSE 'UPDATE' END AS op,
         round(value, 2) AS value
         FROM events""",
    "cdc_history" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events)
         SELECT event_id, ts, user_id, op AS change_type, value,
           last_value(CASE WHEN op = 'INSERT' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS original_value
         FROM c""",
    "cdc_current" ->
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "cdc_stats" ->
      """SELECT user_id, count(*) AS n_changes,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_inserts,
           count(CASE WHEN event_type NOT IN ('signup','error') THEN 1 END) AS n_updates,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_deletes,
           epoch_us(min(ts)) AS first_ts, epoch_us(max(ts)) AS last_ts,
           round(sum(round(value, 2)), 2) AS total_value
         FROM events GROUP BY user_id""",
    "cdc_dedup_redelivery" ->
      """WITH redelivered AS (
           SELECT event_id, ts, user_id, event_type, value FROM events
           UNION ALL
           SELECT event_id, ts, user_id, event_type, value FROM events
           WHERE event_id % 10 = 0)
         SELECT event_id, epoch_us(ts) AS ts, user_id, event_type,
           round(min(value), 2) AS value, count(*) AS n_deliveries
         FROM redelivered GROUP BY event_id, ts, user_id, event_type""",
    "cdc_scd2" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events)
         SELECT user_id, event_id, op AS change_type, value,
           ts AS valid_from,
           lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AND op <> 'DELETE' AS INT) AS is_current
         FROM c""",
    "cdc_compact" ->
      """SELECT user_id,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS net_op,
           event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",
    "cdc_envelope_parse" ->
      """WITH c AS (
           SELECT event_id AS id, user_id, props AS account,
             epoch_us(ts) AS registered_at,
             CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
           FROM events)
         SELECT id, user_id, account, registered_at,
           CASE WHEN __deleted = 'true' THEN 'DELETE'
                WHEN rn = 1 THEN 'INSERT' ELSE 'UPDATE' END AS op
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id, (__deleted = 'true')
                  ORDER BY registered_at, id) AS rn
               FROM c)""",
    // Avro path: wire format is invisible to the oracle — DuckDB
    // replays the SEMANTICS (same SQL as cdc_envelope_parse), so a
    // hash match proves the Avro binary round trip lossless
    "cdc_avro_parse" ->
      """WITH c AS (
           SELECT event_id AS id, user_id, props AS account,
             epoch_us(ts) AS registered_at,
             CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
           FROM events)
         SELECT id, user_id, account, registered_at,
           CASE WHEN __deleted = 'true' THEN 'DELETE'
                WHEN rn = 1 THEN 'INSERT' ELSE 'UPDATE' END AS op
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id, (__deleted = 'true')
                  ORDER BY registered_at, id) AS rn
               FROM c)""",
    "cdc_maxwell_parse" ->
      """SELECT event_id AS id, user_id, props AS account,
           (epoch_us(ts) // 1000000) * 1000000 AS registered_at,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS op
         FROM events""",
    "cdc_snapshot_diff" ->
      """WITH snap_before AS (
           SELECT user_id, event_id AS old_event_id, round(value, 2) AS old_value
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE event_id < 5000)
           WHERE rn = 1 AND event_type <> 'error'),
         snap_after AS (
           SELECT user_id, event_id AS new_event_id, round(value, 2) AS new_value
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events)
           WHERE rn = 1 AND event_type <> 'error')
         SELECT coalesce(b.user_id, a.user_id) AS user_id,
           CASE WHEN b.old_event_id IS NULL THEN 'ADDED'
                WHEN a.new_event_id IS NULL THEN 'REMOVED'
                WHEN b.old_event_id <> a.new_event_id THEN 'CHANGED'
                ELSE 'UNCHANGED' END AS diff,
           b.old_event_id, a.new_event_id, b.old_value, a.new_value
         FROM snap_before b FULL OUTER JOIN snap_after a ON b.user_id = a.user_id""",
    "q_json_extract" ->
      """SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type""",
    "q_filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice, 2) AS l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
           AND l_quantity < 25""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_top_orders" ->
      """SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
           AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         GROUP BY r_name, n_name""",
    "q_top_parts_per_brand" ->
      """SELECT p_brand, rn, p_partkey, p_name,
           round(p_retailprice, 2) AS p_retailprice
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
               FROM part)
         WHERE rn <= 3""",
    "q_customer_ltv" ->
      """SELECT o_custkey, c_name, n_orders, ltv
         FROM (SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS ltv
               FROM orders GROUP BY o_custkey)
         JOIN customer ON o_custkey = c_custkey
         WHERE ltv >= 3000000.0""",
    "q_rollup_orders" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
         flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
         FROM sess GROUP BY user_id, session_id""",
    "q_running_totals" ->
      """SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM orders""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
         s AS (SELECT user_id, min(ts) AS signup_ts FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
         en AS (SELECT e.user_id, min(e.ts) AS engage_ts FROM e
                JOIN s ON e.user_id = s.user_id
                WHERE e.event_type IN ('click','view') AND e.ts > s.signup_ts
                GROUP BY e.user_id),
         c AS (SELECT e.user_id, min(e.ts) AS convert_ts FROM e
               JOIN en ON e.user_id = en.user_id
               WHERE e.event_type = 'purchase' AND e.ts > en.engage_ts
               GROUP BY e.user_id)
         SELECT (SELECT count(*) FROM s) AS n_signup,
                (SELECT count(*) FROM en) AS n_engaged,
                (SELECT count(*) FROM c) AS n_converted""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND CAST(o_orderdate AS DATE) >= DATE '2001-01-01')""",
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(1) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "q_trailing_7d" ->
      """SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing_7d_spend
         FROM orders""",
    "q_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
    "q_split_assign" ->
      """SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 100 AS bucket
               FROM documents)""",
    "q_hash_sample" ->
      """SELECT doc_id, md5('graft-sample-1' || text) AS h
         FROM documents ORDER BY h, doc_id LIMIT 100""",
    "q_shuffle_order" ->
      """WITH t AS (
           SELECT doc_id,
             ('0x' || substr(md5('graft-shuffle-epoch0:' || doc_id), 1, 15))::BIGINT AS ord
           FROM documents)
         SELECT doc_id, ord % 8 AS shard,
           row_number() OVER (PARTITION BY ord % 8 ORDER BY ord, doc_id) - 1 AS pos
         FROM t""",
    "q_epoch_shuffle" ->
      // fresh permutation per epoch (seed carries the epoch); epoch 0
      // is bit-identical to q_shuffle_order
      """WITH d AS (SELECT doc_id, unnest(range(0, 3)) AS epoch FROM documents),
         h AS (
           SELECT doc_id, epoch,
             ('0x' || substr(md5('graft-shuffle-epoch' || epoch || ':'
               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM d)
         SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, ord % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY epoch, ord % 8
             ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
         FROM h""",
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5('graft-strat-1' || text), 1, 15))::BIGINT % 10000 <
           CASE lang WHEN 'en' THEN 2500
                     WHEN 'de' THEN 10000 WHEN 'fr' THEN 10000
                     WHEN 'es' THEN 10000 WHEN 'zh' THEN 10000 ELSE 0 END""",
    "q_neyman_alloc" ->
      // Neyman n_h ∝ N_h·S_h with HUGEINT moments, exact integer sqrt
      // (double sqrt + one-ulp CASE clamps), Hamilton largest-remainder
      // apportionment, md5 hash-rank realization
      """WITH rows0 AS (
           SELECT o_orderpriority AS stratum, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         mom AS (
           SELECT stratum, CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(cents) AS BIGINT) AS sy,
             sum(CAST(cents AS HUGEINT) * cents) AS syy
           FROM rows0 GROUP BY 1),
         varc AS (
           SELECT stratum, n_pop,
             CAST((CAST(n_pop AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                  // (CAST(n_pop AS HUGEINT) * n_pop) AS BIGINT) AS var_c2
           FROM mom),
         sq AS (
           SELECT stratum, n_pop, var_c2,
             CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT) AS s0
           FROM varc),
         sstd AS (
           SELECT stratum, n_pop,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c2 THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > var_c2 THEN 1 ELSE 0 END) AS s_cents
           FROM sq),
         wts AS (
           SELECT stratum, n_pop, s_cents, n_pop * s_cents AS w FROM sstd),
         tot AS (SELECT sum(w) AS wt FROM wts),
         based AS (
           SELECT stratum, n_pop, s_cents, w,
             (CAST(1000 AS BIGINT) * w) // wt AS base,
             (CAST(1000 AS BIGINT) * w) % wt AS rem
           FROM wts, tot),
         alloc AS (
           SELECT stratum, n_pop, s_cents,
             base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, stratum)
                          <= 1000 - (SELECT sum(base) FROM based)
                     THEN 1 ELSE 0 END) AS alloc_n
           FROM based),
         ranked AS (
           SELECT stratum, cents,
             row_number() OVER (PARTITION BY stratum ORDER BY
               ('0x' || substr(md5('graft-ney-1:' || o_orderkey), 1, 15))::BIGINT,
               o_orderkey) AS rn
           FROM rows0),
         samp AS (
           SELECT r.stratum, CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(sum(r.cents) AS BIGINT) AS sampled_cents
           FROM ranked r JOIN alloc a ON a.stratum = r.stratum
           WHERE r.rn <= a.alloc_n GROUP BY 1)
         SELECT a.stratum, a.n_pop, a.s_cents, CAST(a.alloc_n AS BIGINT) AS alloc_n,
           s.n_sampled, s.sampled_cents
         FROM alloc a JOIN samp s ON s.stratum = a.stratum""",
    "q_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_off
           FROM t)
         SELECT doc_id, lang, n_tokens, start_off,
           CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq_first,
           CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS seq_last,
           CAST(CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) <>
                CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS INT)
             AS crosses_boundary
         FROM o""",
    "q_pack_composite" ->
      """WITH t AS (
           SELECT doc_id, lang, source,
             CAST(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT doc_id, lang, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_off
           FROM t)
         SELECT doc_id, lang, source, n_tokens, start_off,
           CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq_first,
           CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS seq_last,
           CAST(CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) <>
                CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS INT)
             AS crosses_boundary
         FROM o""",
    "q_source_cap" ->
      """SELECT doc_id, source, rank_in_source FROM (
           SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5('graft-cap-1' || text), doc_id) AS BIGINT) AS rank_in_source
           FROM documents)
         WHERE rank_in_source <= 10""",
    "q_value_histogram" ->
      """SELECT event_type, bucket, round(bucket * 25.0, 2) AS bucket_start, n, lo, hi
         FROM (
           SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bucket,
             count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
           FROM events GROUP BY 1, 2)""",
    "q_copurchase" ->
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
         JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_orders DESC, part_a, part_b LIMIT 25""",
    "q_mad_outliers" ->
      """WITH m AS (
           SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
           FROM events GROUP BY event_type),
         d AS (
           SELECT event_id, e.event_type, value, med, abs(value - med) AS adev
           FROM events e JOIN m USING (event_type)),
         md AS (
           SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
           FROM d GROUP BY event_type),
         s AS (
           SELECT event_id, d.event_type, round(value, 2) AS value,
             CASE WHEN mad = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(0.6745 * (value - med) / mad * 10000 + 0.5) AS BIGINT) END AS rscore_e4
           FROM d JOIN md USING (event_type))
         SELECT event_id, event_type, value, rscore_e4,
           CAST(abs(rscore_e4) > 35000 AS INT) AS is_outlier
         FROM s""",
    "q_cohort_retention" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) // CAST(604800000000 AS BIGINT) AS week FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
         a AS (SELECT cohort_week, week - cohort_week AS week_offset,
                 count(DISTINCT e.user_id) AS n_users
               FROM e JOIN c USING (user_id) GROUP BY 1, 2),
         s AS (SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY 1)
         SELECT cohort_week, week_offset, n_users, cohort_size,
           round(CAST(n_users AS DOUBLE) / cohort_size, 4) AS retention
         FROM a JOIN s USING (cohort_week)""",
    "q_neg_sample" ->
      """WITH d AS (
           SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx FROM documents),
         n AS (SELECT count(*) AS n_docs FROM documents),
         a AS (SELECT doc_id AS anchor_id, unnest(range(1, 5)) AS j
               FROM documents WHERE doc_id % 11 = 0),
         h AS (SELECT anchor_id, j,
                 ('0x' || substr(md5('neg-1:' || anchor_id || '-' || j), 1, 15))::BIGINT
                   % n_docs AS idx
               FROM a, n)
         SELECT anchor_id, CAST(j AS BIGINT) AS j, d.doc_id AS neg_id
         FROM h JOIN d USING (idx) WHERE d.doc_id <> anchor_id""",
    "mm_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, CAST(strlen(text) // 4 AS BIGINT) AS n_frames,
             CAST(25 + (doc_id % 2) * 5 AS BIGINT) AS fps
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames, fps, CAST(f AS BIGINT) AS frame_idx,
           round(CAST(f AS DOUBLE) / fps, 2) AS ts_sec
         FROM v CROSS JOIN LATERAL
           (SELECT unnest(range(0, n_frames, fps * 2)) AS f) r""",
    // Token-budget apportionment (#150): Hamilton largest-remainder,
    // all-integer — quotas telescope to exactly the budget.
    "q_token_budget" ->
      """WITH t AS (
           SELECT source,
             CAST(sum(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         b AS (
           SELECT source, n_tokens,
             (n_tokens * 1000000) // (SELECT sum(n_tokens) FROM t) AS base,
             (n_tokens * 1000000) % (SELECT sum(n_tokens) FROM t) AS rem
           FROM t),
         s AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS r FROM b)
         SELECT source, n_tokens, CAST(base AS BIGINT) AS base,
           CAST(rem AS BIGINT) AS rem,
           CAST(base + CAST(row_number() OVER (ORDER BY rem DESC, source)
                 <= (SELECT r FROM s) AS BIGINT) AS BIGINT) AS quota
         FROM b""",
    "q_length_batching" ->
      // 16-token length buckets, shard-major hash order within each,
      // batches of 8, per-batch padding accounting
      """WITH d AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS len,
             ('0x' || substr(md5('graft-batch-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM documents),
         r AS (
           SELECT (len + 15) // 16 AS bucket_id, len,
             row_number() OVER (PARTITION BY (len + 15) // 16
               ORDER BY ord % 8, ord, doc_id) AS rn
           FROM d),
         b AS (
           SELECT bucket_id, CAST((rn - 1) // 8 AS BIGINT) AS batch_idx, len FROM r)
         SELECT bucket_id, batch_idx, count(*) AS n_docs,
           CAST(max(len) AS BIGINT) AS max_len, CAST(sum(len) AS BIGINT) AS sum_len,
           CAST(count(*) * max(len) - sum(len) AS BIGINT) AS waste
         FROM b GROUP BY 1, 2""",
    "q_quota_fill" ->
      // Hamilton quotas on budget = total_tokens // 4, then per source
      // take docs in shard-major salted-hash order until the running
      // token total first reaches the quota (crossing doc included)
      """WITH tok AS (
           SELECT source, doc_id,
             CAST(len(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok
           FROM documents),
         tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_total FROM tok),
         per AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
         bs AS (
           SELECT source, n_tokens,
             (n_tokens * (SELECT n_total // 4 FROM tot)) // (SELECT sum(n_tokens) FROM per) AS base,
             (n_tokens * (SELECT n_total // 4 FROM tot)) % (SELECT sum(n_tokens) FROM per) AS rem
           FROM per),
         sp AS (SELECT (SELECT n_total // 4 FROM tot) - sum(base) AS r FROM bs),
         q AS (
           SELECT source,
             base + CAST(row_number() OVER (ORDER BY rem DESC, source)
                     <= (SELECT r FROM sp) AS BIGINT) AS quota
           FROM bs),
         o AS (
           SELECT source, doc_id, n_tok,
             ('0x' || substr(md5('graft-quota-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM tok),
         c AS (
           SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
               ORDER BY ord % 8, ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM o)
         SELECT c.source, doc_id, n_tok, CAST(cum AS BIGINT) AS cum,
           CAST(quota AS BIGINT) AS quota
         FROM c JOIN q ON c.source = q.source
         WHERE cum - n_tok < quota""",
    "q_priority_sample" ->
      // DLT priority sampling on the 2^20 fixed-point grid: u from the
      // md5-parity hash60 kernel, prio = (w<<20) div u, top-16 per
      // source, tau = 17th priority, est = max(w<<20, tau) — all-BIGINT
      """WITH d AS (
           SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
             ('0x' || substr(md5('graft-priority-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1048576 + 1 AS u
           FROM documents),
         r AS (
           SELECT source, doc_id, w, (w * 1048576) // u AS prio,
             row_number() OVER (PARTITION BY source
               ORDER BY (w * 1048576) // u DESC, doc_id) AS rn
           FROM d),
         t AS (
           SELECT source,
             coalesce(max(CASE WHEN rn = 17 THEN prio END), 0) AS tau
           FROM r WHERE rn <= 17 GROUP BY source)
         SELECT r.source, doc_id, w, prio, tau,
           greatest(w * 1048576, tau) AS est_scaled
         FROM r JOIN t ON r.source = t.source
         WHERE rn <= 16""",
    "q_mixture_weights" ->
      """WITH t AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source)
         SELECT source, n_docs, n_tokens,
           round(pow(CAST(n_tokens AS DOUBLE), 0.7) /
                 (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) FROM t), 6) AS weight
         FROM t""",
    "text_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         tri AS (
           SELECT doc_id, len(tok) AS n_tok,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS tri
           FROM t),
         base AS (
           SELECT doc_id, n_tok, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM tri),
         top AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, token, count(*) AS c
             FROM (SELECT doc_id, unnest(tok) AS token FROM t) GROUP BY doc_id, token)
           GROUP BY doc_id)
         SELECT b.doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           round(1.0 - CAST(n_uniq AS DOUBLE) / n_tri, 4) AS dup_trigram_frac,
           round(CAST(topc AS DOUBLE) / n_tok, 4) AS top_token_ratio,
           CAST((1.0 - CAST(n_uniq AS DOUBLE) / n_tri) > 0.2
                OR (CAST(topc AS DOUBLE) / n_tok) > 0.2 AS INT) AS is_repetitive
         FROM base b JOIN top USING (doc_id)""",
    // KMV overlap (#148): integer k-th-min thetas + integer-division
    // estimators — the estimates replay bit-exactly beside the exact
    // values they approximate.
    "text_kmv_overlap" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM t),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         a AS MATERIALIZED (SELECT DISTINCT h FROM e WHERE doc_id % 97 <> 0),
         b AS MATERIALIZED (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         ku AS MATERIALIZED (
           SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
           ORDER BY h LIMIT 64),
         vals AS (SELECT
           (SELECT max(h) FROM (SELECT h FROM a ORDER BY h LIMIT 64)) AS theta_a,
           (SELECT max(h) FROM (SELECT h FROM b ORDER BY h LIMIT 64)) AS theta_b,
           (SELECT CAST(count(*) AS BIGINT) FROM ku
             WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS rho,
           (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_distinct_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_distinct_b,
           (SELECT CAST(count(*) AS BIGINT) FROM a
             WHERE h IN (SELECT h FROM b)) AS exact_overlap)
         SELECT CAST(64 AS BIGINT) AS k, theta_a, theta_b,
           CAST((1152921504606846976 // theta_a) * 63 AS BIGINT) AS est_distinct_a,
           CAST((1152921504606846976 // theta_b) * 63 AS BIGINT) AS est_distinct_b,
           exact_distinct_a, exact_distinct_b, rho,
           CAST((rho * 10000) // 64 AS BIGINT) AS jaccard_est_bp,
           exact_overlap,
           CAST((exact_overlap * 10000) //
                (exact_distinct_a + exact_distinct_b - exact_overlap) AS BIGINT)
             AS jaccard_exact_bp
         FROM vals""",
    "text_contamination" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM t),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         bench AS (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         hits AS (SELECT e.doc_id, count(*) AS n_hits
                  FROM e JOIN bench USING (h) GROUP BY e.doc_id)
         SELECT s.doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_contaminated,
           round(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs), 4) AS contamination_frac,
           CAST(s.doc_id % 97 = 0 AS INT) AS is_benchmark,
           CAST(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs) >= 0.5 AS INT) AS is_contaminated
         FROM sh s LEFT JOIN hits USING (doc_id)""",
    "text_pii" ->
      """WITH p AS (
           SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' host 10.0.' || (doc_id % 256) || '.17' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' call +49-555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  ELSE '' END AS planted
           FROM documents),
         c AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(planted, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
               AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(planted, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
               AS BIGINT) AS n_ips,
             CAST(len(regexp_extract_all(planted, '\+\d{2}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
             regexp_replace(regexp_replace(regexp_replace(planted,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+\d{2}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
           FROM p)
         SELECT doc_id, n_emails, n_ips, n_phones, redacted,
           CAST(n_emails + n_ips + n_phones > 0 AS INT) AS has_pii
         FROM c""",
    "text_unigram_lp" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS w
           FROM documents),
         v AS (SELECT w, count(*) AS c FROM t GROUP BY w),
         n AS (SELECT sum(c) AS n_total FROM v),
         d AS (SELECT doc_id, count(*) AS n_tokens, avg(log2(c)) AS alc
               FROM t JOIN v USING (w) GROUP BY doc_id)
         SELECT doc_id, n_tokens,
           round(log2(n_total) - alc, 4) AS avg_surprisal,
           CAST(round(log2(n_total) - alc, 4) > 8.0 AS INT) AS is_tail
         FROM d, n""",
    "q_winsorize" ->
      """WITH b AS (
           SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
           FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, round(value, 2) AS value,
           round(greatest(lo, least(hi, value)), 2) AS value_w,
           CAST(value < lo OR value > hi AS INT) AS clipped
         FROM events e JOIN b USING (event_type)""",
    "q_curve_compare" -> {
      // morton mirrors Scale.morton; the hilbert walk is the same
      // 8-round xy2d fold UNROLLED as a CTE chain (s = 128..1), each
      // step's (x, y, d) computed from the previous step's columns
      val mortonSql = (0 until 8)
        .map(i =>
          s"((ca >> $i) & 1) * ${1L << (2 * i + 1)} + ((cb >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      val hilbertSteps = (7 to 0 by -1)
        .map { k =>
          val s = 1L << k
          val prev = if (k == 7) "z" else s"l${k + 1}"
          val (px, py) = if (k == 7) ("ca", "cb") else ("x", "y")
          val pd = if (k == 7) "0" else "d"
          s"""l$k AS (SELECT o_orderkey, ca, cb, zval,
              CASE WHEN ($py & $s) > 0 THEN $px
                   WHEN ($px & $s) > 0 THEN 255 - $py ELSE $py END AS x,
              CASE WHEN ($py & $s) > 0 THEN $py
                   WHEN ($px & $s) > 0 THEN 255 - $px ELSE $px END AS y,
              $pd + ${s * s} * (CASE WHEN ($px & $s) = 0 AND ($py & $s) = 0 THEN 0
                   WHEN ($px & $s) = 0 THEN 1
                   WHEN ($py & $s) > 0 THEN 2 ELSE 3 END) AS d
            FROM $prev)"""
        }
        .mkString(",\n         ")
      s"""WITH b AS (
           SELECT o_orderkey,
             CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS ca,
             CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cb
           FROM orders),
         z AS (SELECT o_orderkey, ca, cb, CAST($mortonSql AS BIGINT) AS zval FROM b),
         $hilbertSteps,
         fz AS (SELECT 'zorder' AS layout, ca, cb,
                  CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS BIGINT) AS file_id
                FROM l0),
         fh AS (SELECT 'hilbert' AS layout, ca, cb,
                  CAST(ntile(32) OVER (ORDER BY d, o_orderkey) AS BIGINT) AS file_id
                FROM l0),
         qs AS (SELECT * FROM (VALUES
                  ('box32', 64, 95, 64, 95),
                  ('box64', 128, 191, 128, 191),
                  ('stripe_ca', 32, 47, 0, 255),
                  ('stripe_cb', 0, 255, 200, 215)) AS t(query, alo, ahi, blo, bhi))
         SELECT layout, query,
           CAST(count(*) AS BIGINT) AS rows_matched,
           CAST(count(DISTINCT file_id) AS BIGINT) AS files_touched,
           CAST(32 AS BIGINT) AS total_files,
           CAST((32 - count(DISTINCT file_id)) * 1000000 // 32 AS BIGINT)
             AS prune_ratio_e6
         FROM (SELECT * FROM fz UNION ALL SELECT * FROM fh) f, qs
         WHERE ca BETWEEN alo AND ahi AND cb BETWEEN blo AND bhi
         GROUP BY layout, query"""
    },
    "q_zorder_stats" -> {
      // 16 interleave terms generated to mirror Scale.morton exactly
      val mortonSql = (0 until 8)
        .map(i =>
          s"((ca >> $i) & 1) * ${1L << (2 * i + 1)} + ((cb >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      s"""WITH b AS (
           SELECT o_orderkey,
             CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS ca,
             CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cb
           FROM orders),
         z AS (SELECT o_orderkey, ca, cb, CAST($mortonSql AS BIGINT) AS zval FROM b),
         f AS (SELECT ca, cb,
                 CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS BIGINT) AS file_id
               FROM z)
         SELECT file_id, count(*) AS n_rows,
           min(ca) AS min_cust_b, max(ca) AS max_cust_b,
           min(cb) AS min_price_b, max(cb) AS max_price_b
         FROM f GROUP BY file_id"""
    },
    "dedup_spans" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         b AS (
           SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(tok[(i*8+1):(i*8+8)], ' ') AS block
           FROM t CROSS JOIN LATERAL
             (SELECT unnest(range(0, (len(tok)+7)//8)) AS i) r),
         h AS (
           SELECT doc_id, idx, block,
             len(string_split(block, ' ')) >= 3 AS participates,
             ('0x' || substr(md5(block), 1, 15))::BIGINT AS h
           FROM b),
         k AS (
           SELECT doc_id, idx, block,
             (NOT participates) OR
               (row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1) AS keep
           FROM h)
         SELECT doc_id, count(*) AS n_blocks,
           CAST(sum(CAST(keep AS INT)) AS BIGINT) AS n_kept,
           coalesce(string_agg(block, ' ' ORDER BY idx) FILTER (WHERE keep), '')
             AS cleaned_text
         FROM k GROUP BY doc_id""",
    "dedup_substring" ->
      // stride-1 rolling 10-token windows + first-occurrence ranking +
      // gaps-and-islands maximal-run merge; the planted copies are
      // offset-shifted (source offset 5, copy offset 3) behind
      // doc-unique junk so no aligned 8-block ever matches them
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM t
           UNION ALL
           SELECT doc_id + 6000000,
             list_concat(['zzq' || doc_id || 'a', 'zzq' || doc_id || 'b', 'zzq' || doc_id || 'c'],
                         tok[6 : len(tok) - 5])
           FROM t WHERE doc_id % 6 = 0 AND len(tok) >= 25),
         wins AS (
           SELECT doc_id, CAST(i AS BIGINT) AS start,
             ('0x' || substr(md5(array_to_string(tok[(i+1):(i+10)], ' ')), 1, 15))::BIGINT AS h
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(0, len(tok) - 9)) AS i) r
           WHERE len(tok) >= 10),
         dup AS (
           SELECT doc_id, start FROM (
             SELECT doc_id, start,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
             FROM wins) WHERE rn > 1),
         isl AS (
           SELECT doc_id, start,
             sum(CASE WHEN prev IS NULL OR start - prev > 10 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start) AS g
           FROM (SELECT doc_id, start,
                   lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
                 FROM dup))
         SELECT doc_id, min(start) AS span_start, max(start) + 9 AS span_end,
           max(start) + 9 - min(start) + 1 AS span_len,
           CAST(count(*) AS BIGINT) AS n_windows
         FROM isl GROUP BY doc_id, g""",
    "dedup_substring_rewrite" ->
      // same corpus + flagged-window front half as dedup_substring;
      // then: covered = union of flagged [start, start+9] position
      // ranges, survivor = any position not covered, reassembled in
      // order; fully-covered docs surface as n_kept=0 / empty text
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM t
           UNION ALL
           SELECT doc_id + 6000000,
             list_concat(['zzq' || doc_id || 'a', 'zzq' || doc_id || 'b', 'zzq' || doc_id || 'c'],
                         tok[6 : len(tok) - 5])
           FROM t WHERE doc_id % 6 = 0 AND len(tok) >= 25),
         wins AS (
           SELECT doc_id, CAST(i AS BIGINT) AS start,
             ('0x' || substr(md5(array_to_string(tok[(i+1):(i+10)], ' ')), 1, 15))::BIGINT AS h
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(0, len(tok) - 9)) AS i) r
           WHERE len(tok) >= 10),
         dup AS (
           SELECT doc_id, start FROM (
             SELECT doc_id, start,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
             FROM wins) WHERE rn > 1),
         covered AS (
           SELECT DISTINCT doc_id, CAST(start + o AS BIGINT) AS p
           FROM dup CROSS JOIN LATERAL (SELECT unnest(range(0, 10)) AS o) r),
         pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, tok[i] AS tk
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(1, len(tok) + 1)) AS i) r),
         kept AS (
           SELECT pos.doc_id, pos.p, pos.tk
           FROM pos LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
           WHERE c.p IS NULL),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tk, ' ' ORDER BY p) AS cleaned_text
           FROM kept GROUP BY doc_id)
         SELECT corpus.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
           coalesce(n_kept, 0) AS n_kept,
           coalesce(cleaned_text, '') AS cleaned_text
         FROM corpus LEFT JOIN agg ON agg.doc_id = corpus.doc_id""",
    "q_salted_join" ->
      """SELECT c_nationkey, count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_nationkey""",
    "q_key_skew" ->
      """WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
         hist AS (SELECT c, count(*) AS n_keys FROM per GROUP BY c),
         t AS (SELECT count(*) AS n_keys_total, sum(c) AS n_rows_total, max(c) AS max_c
               FROM per)
         SELECT c, n_keys, round(c * n_keys / n_rows_total, 6) AS row_share,
           n_keys_total,
           round(max_c * n_keys_total / CAST(n_rows_total AS DOUBLE), 4) AS skew_ratio
         FROM hist, t""",
    "q_join_size_est" ->
      // AMS inner product over 2^16 hash buckets vs the exact key-
      // histogram product; overcount-only contract + e4 ratio
      """WITH s1 AS (
           SELECT ('0x' || substr(md5('graft-js-1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             % 65536 AS b, count(*) AS c1
           FROM events GROUP BY 1),
         s2 AS (
           SELECT ('0x' || substr(md5('graft-js-1:' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
             % 65536 AS b, count(*) AS c2
           FROM orders GROUP BY 1),
         est AS (
           SELECT CAST(sum(c1 * c2) AS BIGINT) AS est_rows FROM s1 JOIN s2 USING (b)),
         ex AS (
           SELECT CAST(sum(n1 * n2) AS BIGINT) AS exact_rows FROM
             (SELECT user_id, count(*) AS n1 FROM events GROUP BY 1) e
             JOIN (SELECT o_custkey, count(*) AS n2 FROM orders GROUP BY 1) o
             ON e.user_id = o.o_custkey)
         SELECT exact_rows, est_rows,
           CAST(est_rows >= exact_rows AS BIGINT) AS overcount_only,
           (est_rows * 10000) // exact_rows AS ratio_e4
         FROM ex, est""",
    "q_shard_rendezvous" ->
      // HRW argmax over md5-parity hashes for S=8 and S=9; first-max
      // argmax via list_position == Spark array_position
      """WITH d AS (
           SELECT doc_id,
             [('0x' || substr(md5('graft-hrw-1:' || s || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              for s in range(0, 8)] AS h8,
             [('0x' || substr(md5('graft-hrw-1:' || s || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              for s in range(0, 9)] AS h9
           FROM documents)
         SELECT doc_id,
           CAST(list_position(h8, list_max(h8)) - 1 AS BIGINT) AS shard_a,
           CAST(list_position(h9, list_max(h9)) - 1 AS BIGINT) AS shard_b,
           CAST(list_position(h8, list_max(h8)) <> list_position(h9, list_max(h9))
             AS BIGINT) AS moved
         FROM d""",
    "cdc_merge_incremental" ->
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "q_resample_daily" ->
      """WITH ev AS (
           SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
           FROM events),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         users AS (SELECT DISTINCT user_id FROM ev),
         cal AS (SELECT user_id,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
                 FROM users, bounds),
         agg AS (SELECT user_id, day, count(*) AS n, round(sum(value), 2) AS tv
                 FROM ev GROUP BY user_id, day)
         SELECT cal.user_id, strftime(cal.day, '%Y-%m-%d') AS day,
           coalesce(agg.n, 0) AS n_events, coalesce(agg.tv, 0.0) AS total_value
         FROM cal LEFT JOIN agg ON cal.user_id = agg.user_id AND cal.day = agg.day""",
    "q_asof_join" ->
      """WITH ord AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
             SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1)
         SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts,
           o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
         FROM events e ASOF LEFT JOIN ord o
           ON e.user_id = o.o_custkey
          AND epoch_us(e.ts) >= epoch_us(o.o_orderdate)""",
    "q_range_join" ->
      """SELECT p.event_id AS p_event_id, p.user_id,
           count(c.e_ts) AS n_prior_engagements
         FROM (SELECT event_id, user_id, epoch_us(ts) AS p_ts FROM events
               WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT user_id, epoch_us(ts) AS e_ts FROM events
               WHERE event_type IN ('click','view')) c
           ON c.user_id = p.user_id
          AND c.e_ts >= p.p_ts - 1800000000 AND c.e_ts <= p.p_ts
         GROUP BY p.event_id, p.user_id""",
    "q_percentiles" ->
      """SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 2) AS p50_acctbal,
           round(quantile_cont(c_acctbal, 0.9), 2) AS p90_acctbal
         FROM customer GROUP BY c_mktsegment""",
    "q_cube_orders" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q_pivot_orders" ->
      """SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority""",
    "q_ntile_customers" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
         FROM customer""",
    "q_moment_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 2) AS sd_qty,
           round(var_samp(l_quantity), 2) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
         FROM lineitem GROUP BY l_returnflag""",
    "dedup_exact" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0)
         SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_md5,
           min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM corpus GROUP BY 1""",
    "dedup_minhash" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b, n_shared_bands,
           round(CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) AS DOUBLE) / 32, 4)
             AS est_jaccard
         FROM cand WHERE n_shared_bands >= 1""",
    "dedup_incremental" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b, n_shared_bands,
           round(CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) AS DOUBLE) / 32, 4)
             AS est_jaccard
         FROM cand
         WHERE n_shared_bands >= 1 AND doc_a < 1000000 AND doc_b >= 1000000""",
    "dedup_jaccard" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT * FROM (
           SELECT doc_a, doc_b,
             round(CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
               / len(list_distinct(hs_a || hs_b)), 4) AS jaccard
           FROM cand WHERE n_shared_bands >= 1)
         WHERE jaccard >= 0.3""",
    "dedup_prefix_join" ->
      // prefix-filter exact Jaccard >= 3/5 join: rarity-ordered
      // prefixes, candidates share a prefix token, integer verify
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS sh
           FROM corpus),
         sets AS (SELECT doc_id, list_distinct(sh) AS ts FROM sh),
         e AS (SELECT doc_id, unnest(ts) AS tok FROM sets),
         dft AS (SELECT tok, count(*) AS df FROM e GROUP BY tok),
         srt AS (
           SELECT e.doc_id, list(e.tok ORDER BY dft.df, e.tok) AS stoks
           FROM e JOIN dft USING (tok) GROUP BY e.doc_id),
         pref AS (
           SELECT doc_id,
             unnest(stoks[1 : len(stoks) - (3 * len(stoks) + 4) // 5 + 1]) AS tok
           FROM srt),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id),
         v AS (
           SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_inter,
             CAST(len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_union
           FROM cand JOIN sets sa ON sa.doc_id = cand.doc_a
                     JOIN sets sb ON sb.doc_id = cand.doc_b)
         SELECT doc_a, doc_b, n_inter, n_union,
           (n_inter * 10000) // n_union AS jaccard_e4
         FROM v WHERE 5 * n_inter >= 3 * n_union""",
    "dedup_cluster_eval" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         planted AS (SELECT doc_id AS a, doc_id + 1000000 AS b
                     FROM documents WHERE doc_id % 5 = 0),
         rec AS (
           SELECT CAST(count(*) AS BIGINT) AS n_planted,
             CAST(sum(CASE WHEN la.cluster_id = lb.cluster_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_recovered
           FROM planted p
           JOIN labels la ON la.doc_id = p.a
           JOIN labels lb ON lb.doc_id = p.b),
         sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
                   FROM labels GROUP BY 1),
         cp AS (SELECT CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_cluster_pairs,
                  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_clusters
                FROM sizes)
         SELECT n_planted, n_recovered,
           CAST(n_recovered * 1000000 // n_planted AS BIGINT) AS recall_e6,
           n_cluster_pairs, n_multi_clusters,
           CASE WHEN n_cluster_pairs > 0
             THEN CAST(n_recovered * 1000000 // n_cluster_pairs AS BIGINT)
             ELSE NULL END AS precision_e6
         FROM rec, cp""",
    "dedup_clusters" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a)
         SELECT a AS doc_id, min(b) AS cluster_id,
           CAST(min(b) = a AS INT) AS keep
         FROM walk GROUP BY a""",
    "dedup_apply" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
         SELECT l.doc_id, l.cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(cluster_size - 1 AS BIGINT) AS n_dropped
         FROM labels l JOIN sizes USING (cluster_id)
         WHERE l.doc_id = l.cluster_id""",
    "dedup_report" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         src AS (SELECT doc_id, source FROM documents
                 UNION ALL
                 SELECT doc_id + 1000000, source FROM documents WHERE doc_id % 5 = 0)
         SELECT s.source, count(*) AS n_docs,
           CAST(sum(CAST(l.doc_id <> l.cluster_id AS INT)) AS BIGINT) AS n_dups,
           round(CAST(sum(CAST(l.doc_id <> l.cluster_id AS INT)) AS DOUBLE) / count(*), 4)
             AS dup_rate
         FROM labels l JOIN src s USING (doc_id)
         GROUP BY s.source""",
    "dedup_source_matrix" ->
      // per-cluster source counts, then within-cluster source pairs:
      // off-diagonal n_a*n_b, diagonal C(n,2); positive so // == div
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         src AS (SELECT doc_id, source FROM documents
                 UNION ALL
                 SELECT doc_id + 1000000, source FROM documents WHERE doc_id % 5 = 0),
         cs AS (SELECT l.cluster_id, s.source, CAST(count(*) AS BIGINT) AS n
                FROM labels l JOIN src s USING (doc_id) GROUP BY 1, 2),
         pairs AS (
           SELECT a.source AS source_a, b.source AS source_b, a.n * b.n AS pairs
           FROM cs a JOIN cs b
             ON b.cluster_id = a.cluster_id AND a.source < b.source
           UNION ALL
           SELECT source, source, n * (n - 1) // 2 FROM cs WHERE n >= 2)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(pairs) AS BIGINT) AS dup_pairs
         FROM pairs GROUP BY 1, 2""",
    "dedup_simhash" ->
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         thash AS (
           SELECT doc_id, [('0x' || substr(md5(t), 1, 15))::BIGINT for t in tok] AS hs
           FROM corpus),
         -- per-bit majority vote; the 60-bit md5 hash never sets bits
         -- 60-63, so range(60) covers every bit that can win the vote
         ssig AS (
           SELECT doc_id,
             CAST(list_sum([CASE WHEN 2 * list_sum([(h >> bb) & 1 for h in hs]) > len(hs)
                                 THEN (1::BIGINT << bb) ELSE 0::BIGINT END
                            for bb in range(60)]) AS BIGINT) AS sig
           FROM thash),
         spair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
           FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
           WHERE len([c for c in range(4)
                      if ((a.sig >> (c*16)) & 65535) = ((b.sig >> (c*16)) & 65535)]) >= 1)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
         FROM spair WHERE bit_count(xor(sig_a, sig_b)) <= 6""",
    "dedup_simhash_idf" ->
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         tokocc AS (SELECT doc_id, unnest(tok) AS token FROM corpus),
         df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tokocc GROUP BY token),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM corpus),
         -- integer-quantized IDF weights: votes sum exactly, any order
         wtok AS (
           SELECT t.doc_id,
             ('0x' || substr(md5(t.token), 1, 15))::BIGINT AS h,
             round(ln(n.n_docs / d.df) * 1000) + 10 AS w
           FROM tokocc t JOIN df d ON t.token = d.token CROSS JOIN n),
         votes AS (
           SELECT doc_id, bb,
             sum(CASE WHEN (h >> bb) & 1 = 1 THEN w ELSE -w END) AS v
           FROM wtok CROSS JOIN (SELECT unnest(range(60)) AS bb)
           GROUP BY doc_id, bb),
         ssig AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bb) ELSE 0::BIGINT END) AS BIGINT) AS sig
           FROM votes GROUP BY doc_id),
         spair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
           FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
           WHERE len([c for c in range(4)
                      if ((a.sig >> (c*16)) & 65535) = ((b.sig >> (c*16)) & 65535)]) >= 1)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
         FROM spair WHERE bit_count(xor(sig_a, sig_b)) <= 6""",
    "text_fingerprint" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
             len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_tok
           FROM documents)
         SELECT doc_id, md5(norm) AS fp_md5,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n_tok < 3 THEN 1 ELSE n_tok - 2 END AS BIGINT) AS n_shingles
         FROM t""",
    "text_chunks" ->
      // sliding win=32/stride=24 token windows; starts = multiples of
      // stride below the token count, final window may be short,
      // empty doc -> one empty chunk row
      """WITH t AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS tok
           FROM documents),
         s AS (
           SELECT doc_id, tok,
             unnest(range(0, greatest(len(tok), 1), 24)) AS start_tok
           FROM t)
         SELECT doc_id,
           CAST(start_tok // 24 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(tok[start_tok + 1 : start_tok + 32]) AS BIGINT) AS n_tok,
           array_to_string(tok[start_tok + 1 : start_tok + 32], ' ') AS chunk
         FROM s""",
    "text_tokens" ->
      """SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(lower(trim(text)), '\s+')) END AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual
         FROM documents""",
    // Curriculum ordering (#151): exact quality deciles on the e4
    // grid + salted-hash shuffle within each decile.
    "text_curriculum" ->
      """WITH t AS (
           SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents),
         q AS (
           SELECT doc_id,
             CAST(floor(least(1.0, len(toks) / 100.0) *
               (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END) *
               10000.0 + 0.5) AS BIGINT) AS q_e4
           FROM t),
         r AS (
           SELECT doc_id, q_e4,
             row_number() OVER (ORDER BY q_e4, doc_id) AS rk,
             ('0x' || substr(md5('graft-curr-1:' || doc_id), 1, 15))::BIGINT AS ord
           FROM q)
         SELECT doc_id, q_e4,
           CAST(((rk - 1) * 10) // (SELECT count(*) FROM q) AS BIGINT) AS decile,
           CAST(ord % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY ((rk - 1) * 10) // (SELECT count(*) FROM q), ord % 8
             ORDER BY ord, doc_id) AS BIGINT) AS pos
         FROM r""",
    "text_quality" ->
      """WITH t AS (
           SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END, 4) AS punct_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                   ['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
                   / len(toks) END, 4) AS stopword_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks) END, 4)
             AS avg_token_len,
           round(least(1.0, len(toks) / 100.0) *
                 (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END), 4)
             AS quality_score
         FROM t""",
    "text_filter_pipeline" -> {
      // The composed filter stack: each signal CTE is the SAME SQL as
      // its standalone oracle (quality, repetition, contamination,
      // lang-id), joined into the one keep/reason verdict.
      val markers = Seq(
        "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
        "en" -> Seq("the", "a", "of", "and", "is", "to"),
        "es" -> Seq("el", "la", "los", "y", "es", "de"),
        "fr" -> Seq("le", "la", "les", "et", "est", "de"),
        "zh" -> Seq("的", "了", "是", "在", "和", "有"))
      val structs = markers
        .map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
          s"struct_pack(lang := '$l', score := len(list_filter(toks, w -> list_contains($list, w))))"
        }
        .mkString(",\n             ")
      s"""WITH qt AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents),
         q AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(least(1.0, len(toks) / 100.0) *
                   (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END), 4)
               AS quality_score
           FROM qt),
         rt AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         tri AS (
           SELECT doc_id, len(tok) AS n_tok,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS tri
           FROM rt),
         rbase AS (
           SELECT doc_id, n_tok, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM tri),
         rtop AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, token, count(*) AS c
             FROM (SELECT doc_id, unnest(tok) AS token FROM rt) GROUP BY doc_id, token)
           GROUP BY doc_id),
         r AS (
           SELECT b.doc_id,
             CAST((1.0 - CAST(n_uniq AS DOUBLE) / n_tri) > 0.2
                  OR (CAST(topc AS DOUBLE) / n_tok) > 0.2 AS INT) AS is_repetitive
           FROM rbase b JOIN rtop USING (doc_id)),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM rt),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         bench AS (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         hits AS (SELECT e.doc_id, count(*) AS n_hits
                  FROM e JOIN bench USING (h) GROUP BY e.doc_id),
         con AS (
           SELECT s.doc_id,
             CAST(s.doc_id % 97 = 0 AS INT) AS is_benchmark,
             CAST(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs) >= 0.5 AS INT) AS is_contaminated
           FROM sh s LEFT JOIN hits USING (doc_id)),
         ls AS (SELECT doc_id, u.s.lang AS lang, u.s.score AS score
               FROM qt, UNNEST([
             $structs
           ]) AS u(s)),
         lang AS (
           SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM ls)
           WHERE rn = 1)
         SELECT q.doc_id, n_tokens, quality_score, is_repetitive, is_contaminated,
           is_benchmark, pred_lang,
           CASE WHEN is_benchmark = 1 THEN 'benchmark'
                WHEN is_contaminated = 1 THEN 'contaminated'
                WHEN n_tokens < 15 THEN 'too_short'
                WHEN quality_score < 0.2 THEN 'low_quality'
                WHEN is_repetitive = 1 THEN 'repetitive'
                WHEN pred_lang = 'und' THEN 'lang_unknown'
                ELSE 'keep' END AS reason,
           CAST(is_benchmark = 0 AND is_contaminated = 0 AND n_tokens >= 15
                AND quality_score >= 0.2 AND is_repetitive = 0
                AND pred_lang <> 'und' AS INT) AS keep
         FROM q JOIN r USING (doc_id) JOIN con USING (doc_id) JOIN lang USING (doc_id)"""
    },
    "ann_centroid_assign" -> {
      // 64 per-dimension avg terms, float-cast to mirror the Spark
      // side's float centroid arrays bit-for-bit
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH c AS (SELECT label, [$terms] AS centroid
                     FROM embeddings GROUP BY label)
          SELECT vec_id, label, assigned_label, cos FROM (
            SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
              CAST(c.label AS BIGINT) AS assigned_label,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) AS cos,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY round(list_cosine_similarity(
                  e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) DESC, c.label) AS rn
            FROM embeddings e, c)
          WHERE rn = 1"""
    },
    "ann_project" -> {
      // Same ±1 literals in the same textual order as the Spark plan
      // (both derived from Similarity.rpSign's public md5 parity), so
      // the signed double sums round identically.
      val k = 16
      val rows = (0 until k).map { j =>
        (0 until 64)
          .map(i =>
            s"${if (graft.operators.Similarity.rpSign(i, j) > 0) "+" else "-"} CAST(embedding[${i + 1}] AS DOUBLE)")
          .mkString(" ")
      }
      val ys = rows.map(t => s"round((0.0 $t) / sqrt(CAST($k AS DOUBLE)), 6)").mkString(", ")
      val poss = (0 until k).map(_.toString).mkString(", ")
      s"""SELECT vec_id, CAST(unnest([$poss]) AS BIGINT) AS pos,
            unnest([$ys]) AS y
          FROM embeddings"""
    },
    "ann_project_search" -> projectSearchOracle,
    // the materialized-index variant is bit-identical by construction
    // (same projection floats, same two-stage ranking) — same oracle
    "ann_project_indexed" -> projectSearchOracle,
    "dedup_semantic" -> {
      // Replays the whole SemDeDup pipeline: planted perturbed copies
      // (same float arithmetic — double multiply then FLOAT cast),
      // per-label mean centroids, nearest-centroid assignment, and the
      // keep-the-outlier prune, all on 6dp-rounded cosines.
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH p AS (
            SELECT vec_id + 1000000 AS vec_id,
              [CAST(embedding[i]*(1.0 + 0.002*(((i-1)%5)-2)) AS FLOAT)
               for i in generate_series(1,64)] AS embedding
            FROM embeddings WHERE vec_id % 4 = 0),
          u AS (SELECT vec_id, embedding FROM embeddings
                UNION ALL SELECT vec_id, embedding FROM p),
          c AS (SELECT label, [$terms] AS centroid
                FROM embeddings GROUP BY label),
          a AS (SELECT vec_id, embedding, cell, ccos_e4 FROM (
              SELECT u.vec_id, u.embedding, c.label AS cell,
                CAST(floor(list_cosine_similarity(
                  u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5) AS BIGINT)
                  AS ccos_e4,
                row_number() OVER (PARTITION BY u.vec_id
                  ORDER BY CAST(floor(list_cosine_similarity(
                    u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5) AS BIGINT)
                    DESC, c.label) AS rn
              FROM u, c) WHERE rn = 1),
          d AS (SELECT DISTINCT x.vec_id
                FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id <> y.vec_id
                WHERE floor(list_cosine_similarity(
                    x.embedding::DOUBLE[], y.embedding::DOUBLE[]) * 10000 + 0.5) >= 9900
                  AND (y.ccos_e4 < x.ccos_e4
                       OR (y.ccos_e4 = x.ccos_e4 AND y.vec_id < x.vec_id)))
          SELECT a.vec_id, CAST(cell AS BIGINT) AS cell, ccos_e4,
            CAST(d.vec_id IS NULL AS INT) AS keep
          FROM a LEFT JOIN d USING (vec_id)"""
    },
    "q2_min_cost_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 6) AS unit_price
           FROM lineitem GROUP BY l_partkey, l_suppkey)
         SELECT p.p_partkey, p.p_brand, ps.l_suppkey AS s_suppkey, ps.unit_price
         FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
         WHERE p.p_size <= 10
           AND ps.unit_price = (SELECT min(ps2.unit_price) FROM ps ps2
                                WHERE ps2.l_partkey = p.p_partkey)""",
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand = 'Brand#1'
           AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)""",
    "q21_waiting_suppliers" ->
      """SELECT s.s_name, count(*) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
         GROUP BY s.s_name
         ORDER BY numwait DESC, s.s_name
         LIMIT 20""",
    "cdc_ooo_repair" -> {
      // planted late delivery replayed with the same three windows;
      // delay interpolated from the shared OooDelayOffsets constant
      s"""WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value,
             event_id + CASE WHEN event_id % 7 = 3
                             THEN $OooDelayOffsets ELSE 0 END AS arrival_seq
           FROM events),
         w AS (
           SELECT *,
             row_number() OVER (PARTITION BY user_id
               ORDER BY arrival_seq DESC, event_id DESC) AS rn_arrival,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn_ts,
             lag(ts) OVER (PARTITION BY user_id
               ORDER BY arrival_seq, event_id) AS prev_ts
           FROM c),
         a AS (
           SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_changes,
             CAST(sum(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
             max(CASE WHEN rn_arrival = 1 THEN event_id END) AS naive_event_id,
             max(CASE WHEN rn_arrival = 1 THEN op END) AS naive_op,
             max(CASE WHEN rn_arrival = 1 THEN value END) AS naive_value,
             max(CASE WHEN rn_ts = 1 THEN event_id END) AS repaired_event_id,
             max(CASE WHEN rn_ts = 1 THEN op END) AS repaired_op,
             max(CASE WHEN rn_ts = 1 THEN value END) AS repaired_value
           FROM w GROUP BY user_id)
         SELECT * FROM a WHERE naive_event_id <> repaired_event_id"""
    },
    "ann_mmr" -> mmrOracle(k = 10, poolK = 50),
    "ann_binary_quant" ->
      // 1-bit lane packing, Hamming shortlist, exact-cosine rerank
      """WITH binbits AS (
            SELECT vec_id,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i <= 32
                   THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS w_lo,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i > 32
                   THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS w_hi
            FROM embeddings, generate_series(1, 64) AS g(i) GROUP BY 1),
          binq AS (SELECT vec_id AS query_id, w_lo AS q_lo, w_hi AS q_hi
                   FROM binbits WHERE vec_id < 10),
          binqe AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10),
          binham AS (
            SELECT q.query_id, b.vec_id,
              CAST(bit_count(xor(b.w_lo, q.q_lo)) + bit_count(xor(b.w_hi, q.q_hi)) AS BIGINT)
                AS hamming
            FROM binbits b, binq q WHERE b.vec_id <> q.query_id),
          binshort AS (
            SELECT query_id, vec_id, hamming FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY hamming, vec_id) AS hr
              FROM binham)
            WHERE hr <= 50),
          binrr AS (
            SELECT s.query_id, s.vec_id, s.hamming,
              round(list_cosine_similarity(e.embedding::DOUBLE[], qe.q_emb::DOUBLE[]), 6) AS cos
            FROM binshort s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN binqe qe ON qe.query_id = s.query_id),
          bintop AS (
            SELECT query_id, vec_id, hamming, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM binrr)
          SELECT query_id, vec_id, hamming, cos, rank
          FROM bintop WHERE rank <= 10""",
    "ann_binary_recall" ->
      // the #346 pipeline vs the brute-force truth, one left join
      """WITH binbits AS (
            SELECT vec_id,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i <= 32
                   THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS w_lo,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i > 32
                   THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS w_hi
            FROM embeddings, generate_series(1, 64) AS g(i) GROUP BY 1),
          binq AS (SELECT vec_id AS query_id, w_lo AS q_lo, w_hi AS q_hi
                   FROM binbits WHERE vec_id < 10),
          binqe AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10),
          binham AS (
            SELECT q.query_id, b.vec_id,
              CAST(bit_count(xor(b.w_lo, q.q_lo)) + bit_count(xor(b.w_hi, q.q_hi)) AS BIGINT)
                AS hamming
            FROM binbits b, binq q WHERE b.vec_id <> q.query_id),
          binshort AS (
            SELECT query_id, vec_id, hamming FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY hamming, vec_id) AS hr
              FROM binham)
            WHERE hr <= 50),
          binrr AS (
            SELECT s.query_id, s.vec_id, s.hamming,
              round(list_cosine_similarity(e.embedding::DOUBLE[], qe.q_emb::DOUBLE[]), 6) AS cos
            FROM binshort s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN binqe qe ON qe.query_id = s.query_id),
          bintop AS (
            SELECT query_id, vec_id, hamming, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM binrr),
          bq AS (SELECT query_id, vec_id, rank AS brank FROM bintop WHERE rank <= 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, binqe q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10)
          SELECT bf.query_id,
            CAST(count(bq.brank) AS BIGINT) AS n_hits10,
            CAST(count(bq.brank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
            CAST(max(CASE WHEN bf.rank = 1
                 THEN coalesce(1000000 // bq.brank, 0) END) AS BIGINT) AS rr_e6
          FROM bf LEFT JOIN bq
            ON bq.query_id = bf.query_id AND bq.vec_id = bf.vec_id
          GROUP BY bf.query_id""",
    "ann_recall_curve" -> {
      // the composed bf+lsh replay of ann_eval_recall, read at every
      // cutoff k = 1..10
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          hits AS (SELECT bf.query_id, bf.rank, ls.lrank
                   FROM bf JOIN ls ON ls.query_id = bf.query_id AND ls.vec_id = bf.vec_id),
          nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_q FROM bf),
          ks AS (SELECT unnest(range(1, 11)) AS k)
          SELECT k, CAST(count(h.query_id) AS BIGINT) AS n_hits,
            CAST(count(h.query_id) * 1000000 // (k * n_q) AS BIGINT) AS recall_e6
          FROM ks LEFT JOIN hits h ON h.rank <= ks.k AND h.lrank <= ks.k, nq
          GROUP BY k, n_q"""
    },
    "ann_eval_recall" -> {
      // lsh candidates + ranks and the brute-force ground truth, both
      // replayed as in their own oracles, compared with one left join
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10)
          SELECT bf.query_id,
            CAST(count(ls.lrank) AS BIGINT) AS n_hits10,
            CAST(count(ls.lrank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
            CAST(max(CASE WHEN bf.rank = 1
                 THEN coalesce(1000000 // ls.lrank, 0) END) AS BIGINT) AS rr_e6
          FROM bf LEFT JOIN ls
            ON ls.query_id = bf.query_id AND ls.vec_id = bf.vec_id
          GROUP BY bf.query_id"""
    },
    "ann_ivf_nprobe_curve" -> {
      // shared ivfTrainCtes quantizer replay; ONE probe join at
      // max(nprobe) keeping each candidate's min probed-cell rank, so
      // every sweep point is a min_rn slice — same sweep list as
      // Similarity.NprobePoints
      val pvals = Similarity.NprobePoints.map(p => s"($p)").mkString(", ")
      val maxP = Similarity.NprobePoints.max
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, cell, rn FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= $maxP),
          cand AS (
            SELECT qc.query_id, a.vec_id, CAST(min(qc.rn) AS BIGINT) AS min_rn
            FROM acorp a JOIN qc ON a.cell = qc.cell
            WHERE a.vec_id <> qc.query_id
            GROUP BY 1, 2),
          scored AS (
            SELECT cand.query_id, cand.vec_id, cand.min_rn,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          bf AS (
            SELECT query_id, vec_id FROM (
              SELECT q.query_id, e.vec_id,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS rank
              FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES $pvals) v(p)),
          ranked AS (
            SELECT ps.p, s.query_id, s.vec_id,
              row_number() OVER (PARTITION BY ps.p, s.query_id
                ORDER BY s.cos DESC, s.vec_id) AS rank
            FROM scored s, ps WHERE s.min_rn <= ps.p),
          hits AS (
            SELECT r.p, CAST(count(*) AS BIGINT) AS n_hits
            FROM ranked r
            JOIN bf ON bf.query_id = r.query_id AND bf.vec_id = r.vec_id
            WHERE r.rank <= 10 GROUP BY 1),
          cn AS (SELECT ps.p, CAST(count(*) AS BIGINT) AS n_candidates
                 FROM scored s, ps WHERE s.min_rn <= ps.p GROUP BY 1),
          nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
          SELECT cn.p AS nprobe, nq.n_queries, cn.n_candidates,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            CAST(coalesce(h.n_hits, 0) * 1000000 // (nq.n_queries * 10) AS BIGINT)
              AS recall10_e6
          FROM cn LEFT JOIN hits h ON h.p = cn.p, nq"""
    },
    "ann_sq_recall" ->
      // the #52 int8 replay, exact-integer dot ranking (list products
      // of ints <= 127 are exact in DOUBLE), float brute-force truth
      """WITH n AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x * x AS DOUBLE)))) AS nrm
           FROM embeddings),
         qv AS (
           SELECT vec_id,
             [CAST(round(CASE WHEN nrm = 0 THEN 0
                  ELSE CAST(x AS DOUBLE) / nrm * 127 END) AS INT) for x in embedding]
               AS q
           FROM n),
         qq AS (SELECT vec_id AS query_id, q AS qvec FROM qv WHERE vec_id < 10),
         sq AS (
           SELECT query_id, vec_id, srank FROM (
             SELECT qq.query_id, qv.vec_id,
               CAST(row_number() OVER (PARTITION BY qq.query_id
                 ORDER BY CAST(list_dot_product(qv.q::DOUBLE[], qq.qvec::DOUBLE[])
                               AS BIGINT) DESC, qv.vec_id) AS BIGINT) AS srank
             FROM qv, qq WHERE qv.vec_id <> qq.query_id)
           WHERE srank <= 10),
         q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 10),
         bf AS (
           SELECT query_id, vec_id, rank FROM (
             SELECT q.query_id, e.vec_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                 AS BIGINT) AS rank
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rank <= 10)
         SELECT bf.query_id,
           CAST(count(sq.srank) AS BIGINT) AS n_hits10,
           CAST(count(sq.srank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
           CAST(max(CASE WHEN bf.rank = 1
                THEN coalesce(1000000 // sq.srank, 0) END) AS BIGINT) AS rr_e6,
           CAST(max(CASE WHEN bf.rank = 1 AND sq.srank = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS top1_match
         FROM bf LEFT JOIN sq
           ON sq.query_id = bf.query_id AND sq.vec_id = bf.vec_id
         GROUP BY bf.query_id""",
    "ann_eval_ndcg" -> {
      // same composed bf+lsh replay as ann_eval_recall, discounted by
      // the shared NdcgWeightsE6 constants as a VALUES table; IDCG is
      // derived from the same constants, never restated
      val wvals = NdcgWeightsE6.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }
        .mkString(", ")
      val idcg = NdcgWeightsE6.zipWithIndex.map { case (w, i) => (10L - i) * w }.sum
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          wt(lrank, w) AS (VALUES $wvals)
          SELECT ls.query_id,
            CAST(count(bf.rank) AS BIGINT) AS n_relevant,
            CAST(sum(coalesce(11 - bf.rank, 0) * wt.w) AS BIGINT) AS dcg_e6,
            CAST(sum(coalesce(11 - bf.rank, 0) * wt.w) * 1000000 // $idcg AS BIGINT)
              AS ndcg_e6
          FROM ls
          LEFT JOIN bf ON bf.query_id = ls.query_id AND bf.vec_id = ls.vec_id
          JOIN wt ON wt.lrank = ls.lrank
          GROUP BY ls.query_id"""
    },
    "ann_rrf_fusion" -> {
      // compose the #28 and #72 replays (renamed CTEs), then the pure
      // integer fusion 1e6 // (60 + rank)
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          lcand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lrank AS (SELECT query_id, vec_id, rank FROM (
              SELECT s.query_id, s.vec_id,
                CAST(row_number() OVER (PARTITION BY s.query_id
                  ORDER BY s.cos DESC, s.vec_id) AS BIGINT) AS rank
              FROM (SELECT lcand.query_id, lcand.vec_id,
                      round(list_cosine_similarity(
                        e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
                    FROM lcand JOIN embeddings e ON e.vec_id = lcand.vec_id
                               JOIN embeddings eq ON eq.vec_id = lcand.query_id) s)
            WHERE rank <= 10),
          ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          iqc AS (SELECT query_id, cell FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          icand AS (
            SELECT DISTINCT iqc.query_id, a.vec_id
            FROM acorp a JOIN iqc ON a.cell = iqc.cell
            WHERE a.vec_id <> iqc.query_id),
          irank AS (SELECT query_id, vec_id, rank FROM (
              SELECT s.query_id, s.vec_id,
                CAST(row_number() OVER (PARTITION BY s.query_id
                  ORDER BY s.cos DESC, s.vec_id) AS BIGINT) AS rank
              FROM (SELECT icand.query_id, icand.vec_id,
                      round(list_cosine_similarity(
                        e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
                    FROM icand JOIN embeddings e ON e.vec_id = icand.vec_id
                               JOIN embeddings eq ON eq.vec_id = icand.query_id) s)
            WHERE rank <= 10),
          fused AS (
            SELECT query_id, vec_id,
              CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_e6,
              CAST(count(*) AS BIGINT) AS n_rankers
            FROM (SELECT * FROM lrank UNION ALL SELECT * FROM irank)
            GROUP BY query_id, vec_id)
          SELECT query_id, vec_id, rrf_e6, n_rankers, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf_e6 DESC, vec_id) AS BIGINT) AS rank FROM fused)
          WHERE rank <= 10"""
    },
    "ann_lsh" -> {
      // candidate set from the replayed buckets; scoring/ranking as in
      // ann_bruteforce (6dp cosine, vec_id tiebreak)
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          scored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          SELECT query_id, vec_id, cos, rank FROM (
            SELECT query_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM scored)
          WHERE rank <= 10"""
    },
    "ann_lsh_multiprobe" -> {
      // queries probe their own bucket plus the `bits` one-bit flips
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id < 10),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id <> qb.query_id),
          scored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          SELECT query_id, vec_id, cos, rank FROM (
            SELECT query_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM scored)
          WHERE rank <= 10"""
    },
    "ann_range_search" -> {
      // multiprobe bucket replay, threshold instead of rank
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id < 10),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id <> qb.query_id)
          SELECT query_id, vec_id, cos FROM (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          WHERE cos >= 0.2"""
    },
    "ann_triplets" -> {
      // planted pos/neg corpus, multiprobe bucket replay, 4dp cosine
      // banding, deterministic per-anchor selection
      def jit(amp: String, offset: Long) =
        s"""SELECT vec_id + $offset AS vec_id,
              [CAST(embedding[i] * (1.0 + $amp * ((((i-1) % 11) - 5) / 5.0)) AS FLOAT)
               for i in generate_series(1, 64)] AS embedding
            FROM embeddings WHERE vec_id % 10 = 0"""
      s"""WITH corpus AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL ${jit("0.06", 1000000L)}
            UNION ALL ${jit("0.25", 2000000L)}),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 12) // 10 FROM embeddings")},
          pb AS MATERIALIZED (
            SELECT vec_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params),
          cand AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS anchor_id, c.vec_id AS cand_id
            FROM bk a JOIN pb c ON a.t = c.t AND a.bucket = c.bucket
            WHERE a.vec_id % 10 = 0 AND a.vec_id < 1000000
              AND a.vec_id <> c.vec_id),
          sc AS MATERIALIZED (
            SELECT cand.anchor_id, cand.cand_id,
              round(list_cosine_similarity(
                ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
            FROM cand JOIN corpus ca ON ca.vec_id = cand.anchor_id
                      JOIN corpus cb ON cb.vec_id = cand.cand_id),
          pos AS (
            SELECT anchor_id, cand_id AS pos_id, cos AS cos_pos FROM (
              SELECT anchor_id, cand_id, cos,
                row_number() OVER (PARTITION BY anchor_id ORDER BY cand_id) AS rn
              FROM sc WHERE cos >= 0.998) WHERE rn = 1),
          neg AS (
            SELECT anchor_id, cand_id AS neg_id, cos AS cos_neg FROM (
              SELECT anchor_id, cand_id, cos,
                row_number() OVER (PARTITION BY anchor_id
                  ORDER BY cos DESC, cand_id) AS rn
              FROM sc WHERE cos >= 0.97 AND cos < 0.998) WHERE rn = 1)
          SELECT pos.anchor_id, pos_id, cos_pos, neg_id, cos_neg
          FROM pos JOIN neg USING (anchor_id)"""
    },
    "ann_dbscan" -> {
      // full replay: planted-density corpus (family anti-jitter pairs
      // + sub-threshold pairs, identical float arithmetic), multiprobe
      // LSH candidate edges, 4dp cosine eps, degrees, roles, and the
      // three unrolled core-core min-label rounds
      def jit(sign: String, offset: Long, mod: Int) =
        s"""SELECT vec_id + $offset AS vec_id,
              [CAST(embedding[i] * (1.0 $sign ${graft.operators.Similarity.DbscanAmp} *
                    ((((i-1) % 11) - 5) / 5.0)) AS FLOAT)
               for i in generate_series(1, 64)] AS embedding
            FROM embeddings WHERE vec_id % 10 = $mod"""
      def lround(prev: String, out: String) =
        s"""$out AS MATERIALIZED (
              SELECT l.vec_id,
                least(min(l.label), coalesce(min(n.label), min(l.label))) AS label
              FROM $prev l
              LEFT JOIN ce ON ce.vec_a = l.vec_id
              LEFT JOIN $prev n ON n.vec_id = ce.vec_b
              GROUP BY l.vec_id)"""
      s"""WITH corpus AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL ${jit("+", 1000000L, 0)}
            UNION ALL ${jit("-", 2000000L, 0)}
            UNION ALL ${jit("+", 3000000L, 5)}),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 13) // 10 FROM embeddings")},
          pb AS MATERIALIZED (
            SELECT vec_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params),
          cand AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
            FROM bk a JOIN pb c ON a.t = c.t AND a.bucket = c.bucket
            WHERE a.vec_id < c.vec_id),
          ed AS MATERIALIZED (
            SELECT vec_a, vec_b FROM (
              SELECT cand.vec_a, cand.vec_b,
                round(list_cosine_similarity(
                  ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
              FROM cand JOIN corpus ca ON ca.vec_id = cand.vec_a
                        JOIN corpus cb ON cb.vec_id = cand.vec_b)
            WHERE cos >= ${graft.operators.Similarity.DbscanEps}),
          sym AS MATERIALIZED (SELECT vec_a, vec_b FROM ed
                  UNION ALL SELECT vec_b, vec_a FROM ed),
          dg AS MATERIALIZED (
            SELECT c.vec_id, coalesce(d.degree, CAST(0 AS BIGINT)) AS degree
            FROM corpus c LEFT JOIN (
              SELECT vec_a AS vec_id, CAST(count(*) AS BIGINT) AS degree
              FROM sym GROUP BY 1) d USING (vec_id)),
          core AS MATERIALIZED (SELECT vec_id FROM dg WHERE degree >= 2),
          ce AS MATERIALIZED (SELECT s.vec_a, s.vec_b FROM sym s
                 JOIN core a ON s.vec_a = a.vec_id
                 JOIN core b ON s.vec_b = b.vec_id),
          l0 AS MATERIALIZED (SELECT vec_id, vec_id AS label FROM core),
          ${lround("l0", "l1")}, ${lround("l1", "l2")}, ${lround("l2", "l3")},
          bo AS MATERIALIZED (
            SELECT s.vec_a AS vec_id, min(l.label) AS cluster_id
            FROM sym s JOIN core c ON s.vec_b = c.vec_id
                       JOIN l3 l ON l.vec_id = s.vec_b
            WHERE s.vec_a NOT IN (SELECT vec_id FROM core)
            GROUP BY s.vec_a)
          SELECT dg.vec_id, 'core' AS role, l3.label AS cluster_id, dg.degree
          FROM dg JOIN l3 ON l3.vec_id = dg.vec_id
          UNION ALL
          SELECT bo.vec_id, 'border', bo.cluster_id, dg.degree
          FROM bo JOIN dg USING (vec_id)
          UNION ALL
          SELECT dg.vec_id, 'noise', CAST(-1 AS BIGINT), dg.degree
          FROM dg
          WHERE dg.vec_id NOT IN (SELECT vec_id FROM l3)
            AND dg.vec_id NOT IN (SELECT vec_id FROM bo)"""
    },
    "dedup_embedding" -> {
      // planted perturbed corpus (same float arithmetic as the Spark
      // side: double multiply then FLOAT cast), replayed buckets, and
      // the ≥0.99 prune at 4dp
      s"""WITH pert AS (
            SELECT vec_id + 1000000 AS vec_id,
              [CAST(embedding[i]*(1.0 + 0.002*(((i-1)%5)-2)) AS FLOAT)
               for i in generate_series(1,64)] AS embedding
            FROM embeddings WHERE vec_id % 4 = 0),
          corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id, embedding FROM pert),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 5) // 4 FROM embeddings")},
          pairs AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
            WHERE a.vec_id < b.vec_id)
          SELECT DISTINCT vec_a, vec_b, cos FROM (
            SELECT p.vec_a, p.vec_b,
              round(list_cosine_similarity(
                ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
            FROM pairs p JOIN corpus ca ON ca.vec_id = p.vec_a
                         JOIN corpus cb ON cb.vec_id = p.vec_b)
          WHERE cos >= 0.99"""
    },
    "ann_ivf" -> {
      // Full replay of the 3-round Lloyd train (e4-quantized means and
      // assignment cosines — see Similarity.trainCentroids), the
      // corpus cell assignment, the nprobe=2 query probe, and the
      // final 6dp-cosine rank.
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, cell FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          cand AS (
            SELECT DISTINCT qc.query_id, a.vec_id
            FROM acorp a JOIN qc ON a.cell = qc.cell
            WHERE a.vec_id <> qc.query_id),
          scored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          SELECT query_id, vec_id, cos, rank FROM (
            SELECT query_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM scored)
          WHERE rank <= 10"""
    },
    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10)
         SELECT query_id, vec_id, cos, rank FROM (
           SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6)
               AS cos,
             CAST(row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(
                 e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
               AS BIGINT) AS rank
           FROM embeddings e, q WHERE e.vec_id <> q.query_id)
         WHERE rank <= 10""",
    "ann_matryoshka_recall" -> {
      // one top-10 CTE per truncation dim, all scored against the
      // full-dim truth — mirror of the Spark sweep
      def top10(name: String, d: Int) =
        s"""$name AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding[1:$d]::DOUBLE[], q.q_emb[1:$d]::DOUBLE[]), 6) DESC,
                 e.vec_id) AS rank
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rank <= 10)"""
      val dims = Seq(64, 32, 16, 8)
      val ctes = dims.map(d => top10(s"d$d", d)).mkString(",\n         ")
      val rows = dims
        .map(d => s"""SELECT CAST($d AS BIGINT) AS dim,
             (SELECT CAST(count(*) AS BIGINT) FROM d64) AS n_truth,
             (SELECT CAST(count(*) AS BIGINT) FROM d$d t
              JOIN d64 USING (query_id, vec_id)) AS n_hits,
             (SELECT CAST(count(*) AS BIGINT) FROM d$d t
              JOIN d64 USING (query_id, vec_id)) * 1000000
               // (SELECT count(*) FROM d64) AS recall_e6""")
        .mkString("\n         UNION ALL\n         ")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                     FROM embeddings WHERE vec_id < 10),
         $ctes
         $rows"""
    },
    "ann_exact_knn_graph" ->
      """SELECT src, dst, cos, rank FROM (
           SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6)
               AS cos,
             CAST(row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                 b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) DESC, b.vec_id)
               AS BIGINT) AS rank
           FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id)
         WHERE rank <= 10""",
    // unrolled 4-hop greedy walk over the exact k-NN graph: beam_h =
    // top-10 of (beam ∪ out-neighbors) by rounded cosine; result =
    // top-10 of everything visited, self excluded — the Spark loop's
    // exact replay
    "ann_nsw_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
               FROM embeddings WHERE vec_id < 10),
         g AS (SELECT src, dst FROM (
                 SELECT a.vec_id AS src, b.vec_id AS dst,
                   row_number() OVER (PARTITION BY a.vec_id
                     ORDER BY round(list_cosine_similarity(b.emb, a.emb), 6) DESC,
                       b.vec_id) AS rnk
                 FROM e a, e b WHERE a.vec_id <> b.vec_id)
               WHERE rnk <= 10),
         entry AS (SELECT min(vec_id) AS vec_id FROM e),
         b0 AS (SELECT q.query_id, entry.vec_id FROM q, entry),
         v0 AS (SELECT query_id, vec_id FROM b0),
         c1 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b0
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b0 b JOIN g ON g.src = b.vec_id)),
         s1 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c1 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b1 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s1)
                WHERE rnk <= 10),
         v1 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v0
                 UNION ALL SELECT query_id, vec_id FROM c1)),
         c2 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b1
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b1 b JOIN g ON g.src = b.vec_id)),
         s2 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c2 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b2 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s2)
                WHERE rnk <= 10),
         v2 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v1
                 UNION ALL SELECT query_id, vec_id FROM c2)),
         c3 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b2
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b2 b JOIN g ON g.src = b.vec_id)),
         s3 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c3 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b3 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s3)
                WHERE rnk <= 10),
         v3 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v2
                 UNION ALL SELECT query_id, vec_id FROM c3)),
         c4 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b3
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b3 b JOIN g ON g.src = b.vec_id)),
         v4 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v3
                 UNION ALL SELECT query_id, vec_id FROM c4))
         SELECT query_id, vec_id, cos, rank FROM (
           SELECT f.query_id, f.vec_id,
             round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY f.query_id
               ORDER BY round(list_cosine_similarity(e.emb, q.q_emb), 6) DESC, f.vec_id)
               AS BIGINT) AS rank
           FROM v4 f JOIN e ON e.vec_id = f.vec_id
                     JOIN q ON q.query_id = f.query_id
           WHERE f.vec_id <> f.query_id)
         WHERE rank <= 10""",
    "text_top_terms" ->
      """WITH td AS (
           SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS term
           FROM documents)
         SELECT term, doc_freq, rank FROM (
           SELECT term, count(*) AS doc_freq,
             CAST(row_number() OVER (ORDER BY count(*) DESC, term) AS BIGINT) AS rank
           FROM td GROUP BY term)
         WHERE rank <= 25""",
    // quantile normalization: within-source rank mapped to the pooled
    // rank grid, single-doc sources to the pooled median index
    "text_qnorm" ->
      """WITH pool AS (
           SELECT n_chars AS pooled_value,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS gidx
           FROM documents),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM documents),
         src AS (
           SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
           FROM documents)
         SELECT doc_id, source, n_chars, pooled_value AS qnorm_chars
         FROM (SELECT doc_id, source, n_chars,
                 CASE WHEN n_src = 1 THEN (n_pool + 1) // 2
                      ELSE 1 + (rn - 1) * (n_pool - 1) // (n_src - 1) END AS gidx
               FROM src, n) m
         JOIN pool USING (gidx)""",
    // BM25 k1=1.2 b=0.75: per-term double of integer inputs,
    // e6-floored per term then summed; query = df-ranks 11..13
    "text_bm25" ->
      """WITH td AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM td GROUP BY doc_id, term),
         dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM td GROUP BY doc_id),
         df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         q AS (SELECT term, df FROM (
                 SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS r
                 FROM df) WHERE r BETWEEN 11 AND 13),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         sc AS (
           SELECT tf.doc_id,
             CAST(floor(
               ln((n_docs - q.df + 0.5) / (q.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 0.3 + 0.9 * CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM tf JOIN q USING (term) JOIN dl USING (doc_id), tot)
         SELECT doc_id, score_e6, n_terms_hit, rank FROM (
           SELECT doc_id, CAST(sum(term_e6) AS BIGINT) AS score_e6,
             CAST(count(*) AS BIGINT) AS n_terms_hit,
             CAST(row_number() OVER (ORDER BY sum(term_e6) DESC, doc_id) AS BIGINT)
               AS rank
           FROM sc GROUP BY doc_id)
         WHERE rank <= 25""",
    "text_tfidf" ->
      """WITH td AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM td GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT doc_id, rank, term, tfidf FROM (
           SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf,
             CAST(row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) DESC, tf.term)
               AS BIGINT) AS rank
           FROM tf JOIN df USING (term), n)
         WHERE rank <= 3""",
    "text_bigrams" ->
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         b AS (SELECT unnest(list_transform(range(1, len(tk)),
                 i -> tk[i] || ' ' || tk[i + 1])) AS bigram FROM t)
         SELECT bigram, n, rank FROM (
           SELECT bigram, count(*) AS n,
             CAST(row_number() OVER (ORDER BY count(*) DESC, bigram) AS BIGINT) AS rank
           FROM b GROUP BY bigram)
         WHERE rank <= 25""",
    "text_phrase_search" ->
      // positional-index phrase replay: top-3 trigram queries, word-
      // level join proposing start = p - idx, hit iff all 3 distinct
      // idx arrived (repeat-word-safe)
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         tris AS (
           SELECT unnest(list_transform(range(1, len(tk) - 1),
             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS phrase
           FROM t WHERE len(tk) >= 3),
         topq AS (
           SELECT phrase FROM (
             SELECT phrase, row_number() OVER (ORDER BY count(*) DESC, phrase) AS rk
             FROM tris GROUP BY phrase)
           WHERE rk <= 3),
         pw AS (
           SELECT phrase, CAST(i - 1 AS BIGINT) AS idx, string_split(phrase, ' ')[i] AS w
           FROM topq CROSS JOIN LATERAL (SELECT unnest(range(1, 4)) AS i) r),
         pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, tk[i] AS w
           FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r),
         hits AS (
           SELECT pw.phrase, pos.doc_id, pos.p - pw.idx AS start
           FROM pos JOIN pw ON pw.w = pos.w
           GROUP BY 1, 2, 3 HAVING count(DISTINCT pw.idx) = 3)
         SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(start) AS BIGINT) AS first_start
         FROM hits GROUP BY 1, 2""",
    "text_collocations" ->
      // Dice-ranked bigrams on the e6 integer grid, min count 5
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         uc AS (
           SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM t) GROUP BY w),
         pc AS (
           SELECT p.a AS a, p.b AS b, count(*) AS c_ab
           FROM (SELECT unnest(list_transform(range(1, len(tk)),
                   i -> {'a': tk[i], 'b': tk[i + 1]})) AS p FROM t)
           GROUP BY 1, 2 HAVING count(*) >= 5),
         d AS (
           SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
             (2 * c_ab * 1000000) // (ua.c + ub.c) AS dice_e6
           FROM pc JOIN uc ua ON pc.a = ua.w JOIN uc ub ON pc.b = ub.w)
         SELECT rank, a, b, c_ab, c_a, c_b, dice_e6 FROM (
           SELECT CAST(row_number() OVER (ORDER BY dice_e6 DESC, a, b) AS BIGINT) AS rank, *
           FROM d) WHERE rank <= 25""",
    "q_theil_sen" ->
      // median of pairwise e4 slopes, discrete lower median at rank
      // ceil(m/2) with (slope, k1, k2) tiebreak
      """WITH p AS (
           SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           FROM orders),
         pr AS (
           SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
             ((b.y - a.y) * 10000) // (b.x - a.x) AS slope_e4
           FROM p a JOIN p b ON a.o_custkey = b.o_custkey AND b.x > a.x),
         r AS (
           SELECT o_custkey, slope_e4,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY slope_e4, k1, k2) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS m
           FROM pr)
         SELECT o_custkey, CAST(m AS BIGINT) AS m,
           CAST(slope_e4 AS BIGINT) AS ts_slope_e4
         FROM r WHERE rn = (m + 1) // 2""",
    "q_weighted_percentile" ->
      // discrete quantity-weighted price percentiles: winner = the row
      // whose running-qty interval (cum-w, cum] contains the integer
      // threshold ceil(num*W/den)
      """WITH b AS (
           SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
         c AS (
           SELECT *,
             CAST(sum(qty) OVER (PARTITION BY l_returnflag
               ORDER BY price_c, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) AS wtot
           FROM b),
         pp AS (
           SELECT unnest([{'num': 1, 'den': 4}, {'num': 1, 'den': 2},
                          {'num': 3, 'den': 4}, {'num': 9, 'den': 10}]) AS pr)
         SELECT l_returnflag, CAST(pr.num AS DOUBLE) / pr.den AS p, price_c
         FROM c, pp
         WHERE cum - qty < (pr.num * wtot + pr.den - 1) // pr.den
           AND (pr.num * wtot + pr.den - 1) // pr.den <= cum""",
    "q_ols_trend" ->
      // closed-form OLS per customer: integer day index x cents, e4
      // slope/intercept by toward-zero integer division
      """WITH p AS (
           SELECT o_custkey,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           FROM orders),
         a AS (
           SELECT o_custkey, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
           FROM p GROUP BY o_custkey)
         SELECT o_custkey, n,
           CAST(((n * sxy - sx * sy) * 10000) // (n * sxx - sx * sx) AS BIGINT) AS slope_e4,
           CAST((sy * 10000 - (((n * sxy - sx * sy) * 10000) // (n * sxx - sx * sx)) * sx) // n
             AS BIGINT) AS intercept_e4
         FROM a
         WHERE n >= 2 AND n * sxx - sx * sx > 0""",
    "q_equidepth_hist" ->
      // rank-defined B=8 bins: bin = ((rn-1)*8) div n + 1 under the
      // (value, event_id) total order -- populations equal +-1
      """WITH r AS (
           SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, CAST((rn - 1) * 8 // n AS BIGINT) + 1 AS bin,
           count(*) AS n_rows, round(min(value), 2) AS lo, round(max(value), 2) AS hi
         FROM r GROUP BY 1, 2""",
    "dedup_fuzzy" ->
      """WITH d AS (
           SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
           FROM documents),
         t AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
                 array_to_string(list_slice(regexp_split_to_array(norm, ' '), 1,
                   greatest(1, CAST(floor(len(regexp_split_to_array(norm, ' ')) * 0.8) AS INT))),
                   ' ') AS norm_b
               FROM d WHERE doc_id % 5 = 0)
         SELECT t.doc_a, t.doc_b,
           CAST(levenshtein(d.norm, t.norm_b) AS BIGINT) AS edit_dist,
           round(1.0 - CAST(levenshtein(d.norm, t.norm_b) AS DOUBLE) /
             greatest(length(d.norm), length(t.norm_b)), 4) AS edit_sim
         FROM t JOIN d ON t.doc_a = d.doc_id""",
    "q_profile_customer" ->
      """SELECT 'c_custkey' AS "column",
           count(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_value,
           CAST(max(c_custkey) AS VARCHAR) AS max_value FROM customer
         UNION ALL
         SELECT 'c_name', count(CASE WHEN c_name IS NULL THEN 1 END),
           count(DISTINCT c_name), CAST(min(c_name) AS VARCHAR),
           CAST(max(c_name) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_nationkey', count(CASE WHEN c_nationkey IS NULL THEN 1 END),
           count(DISTINCT c_nationkey), CAST(min(c_nationkey) AS VARCHAR),
           CAST(max(c_nationkey) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_acctbal', count(CASE WHEN c_acctbal IS NULL THEN 1 END),
           count(DISTINCT c_acctbal), CAST(min(c_acctbal) AS VARCHAR),
           CAST(max(c_acctbal) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_mktsegment', count(CASE WHEN c_mktsegment IS NULL THEN 1 END),
           count(DISTINCT c_mktsegment), CAST(min(c_mktsegment) AS VARCHAR),
           CAST(max(c_mktsegment) AS VARCHAR) FROM customer""",
    "text_lang_id" -> langIdOracle,
    "text_lang_confusion" ->
      // one aggregation over the (nested) lang-id replay
      s"""SELECT label_lang, pred_lang, count(*) AS n_docs,
            CAST(label_lang = pred_lang AS INT) AS is_correct
          FROM ($langIdOracle) GROUP BY label_lang, pred_lang""",
    "text_lang_kappa" ->
      // all-integer chance-corrected agreement over the same replayed
      // confusion frame: kappa = (N*D - E)/(N^2 - E) in HUGEINT
      s"""WITH conf AS (
           SELECT label_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM ($langIdOracle) GROUP BY 1, 2),
         rm AS (SELECT label_lang AS l, CAST(sum(n_docs) AS BIGINT) AS r FROM conf GROUP BY 1),
         cm AS (SELECT pred_lang AS l, CAST(sum(n_docs) AS BIGINT) AS c FROM conf GROUP BY 1),
         e AS (SELECT coalesce(sum(CAST(r AS HUGEINT) * c), 0) AS e_sum
               FROM rm JOIN cm USING (l)),
         d AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS diag
               FROM conf WHERE label_lang = pred_lang),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_cells FROM conf)
         SELECT n_docs, n_cells, diag AS n_agree,
           CAST(CAST(diag AS HUGEINT) * 1000000 // n_docs AS BIGINT) AS po_e6,
           CAST(e_sum * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_e6,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs - e_sum > 0 THEN
             CAST((CASE WHEN CAST(n_docs AS HUGEINT) * diag - e_sum < 0 THEN -1 ELSE 1 END)
               * (abs(CAST(n_docs AS HUGEINT) * diag - e_sum) * 1000000
                  // (CAST(n_docs AS HUGEINT) * n_docs - e_sum)) AS BIGINT)
           ELSE NULL END AS kappa_e6
         FROM t, d, e""",
    "q20_dominant_supplier" ->
      """SELECT s.s_suppkey, s.s_name
         FROM supplier s
         WHERE s.s_suppkey IN (
           SELECT l.l_suppkey
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_type = 'PROMO'
           GROUP BY l.l_partkey, l.l_suppkey
           HAVING sum(l.l_quantity) > 0.15 * (SELECT sum(l2.l_quantity)
                                              FROM lineitem l2
                                              WHERE l2.l_partkey = l.l_partkey))
         ORDER BY s.s_suppkey""",
    "q_event_gaps" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events),
         g AS (SELECT user_id,
                 lag(event_id) OVER w AS prev_event_id,
                 lag(ts) OVER w AS prev_ts,
                 event_id, ts
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, prev_event_id, event_id,
           (ts - prev_ts) // 1000000000 AS gap_sec
         FROM g
         WHERE prev_ts IS NOT NULL
           AND (ts - prev_ts) // 1000000000 >= 86400""",
    "q_rolling_median" ->
      """SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
             ORDER BY epoch_ns(ts)
             RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW), 6) AS med_7d
         FROM events""",
    "q_asof_nearest" ->
      """WITH ord AS (
           SELECT o_custkey, epoch_us(o_orderdate) AS o_ts, o_orderkey FROM (
             SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1),
         e AS (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events),
         c AS (
           SELECT e.event_id, e.user_id, e.ts,
             max(CASE WHEN o.o_ts <= e.ts THEN o.o_ts END) AS b_t,
             min(CASE WHEN o.o_ts > e.ts THEN o.o_ts END) AS f_t
           FROM e LEFT JOIN ord o ON o.o_custkey = e.user_id
           GROUP BY e.event_id, e.user_id, e.ts),
         n AS (
           SELECT *,
             CASE WHEN b_t IS NULL AND f_t IS NULL THEN NULL
                  WHEN f_t IS NULL THEN 'b'
                  WHEN b_t IS NULL THEN 'f'
                  WHEN ts - b_t <= f_t - ts THEN 'b' ELSE 'f' END AS direction,
             CASE WHEN b_t IS NULL AND f_t IS NULL THEN NULL
                  WHEN f_t IS NULL THEN b_t
                  WHEN b_t IS NULL THEN f_t
                  WHEN ts - b_t <= f_t - ts THEN b_t ELSE f_t END AS n_t
           FROM c)
         SELECT n.event_id, n.user_id, n.ts, o.o_orderkey, n.direction,
           n.ts - n.n_t AS delta
         FROM n LEFT JOIN ord o
           ON o.o_custkey = n.user_id AND o.o_ts = n.n_t""",
    "q_percentile_disc" ->
      """WITH r AS (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, p, round(value, 2) AS value
         FROM r, unnest([0.25, 0.5, 0.75, 0.95]) AS u(p)
         WHERE rn = ceil(p * n)""",
    "mm_manifest" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
         FROM documents""",
    // stubDecode replica: acc[i % 8] += byte[i]; f = (acc % 1000) / 1000
    // computed in FLOAT to mirror the Spark side bit-for-bit (documents
    // are ASCII, so ord(char) == utf-8 byte)
    "mm_features" ->
      """WITH idx AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents),
         acc AS (
           SELECT doc_id, (i - 1) % 8 AS pos,
             sum(ord(substr(text, CAST(i AS INT), 1))) AS s
           FROM idx GROUP BY 1, 2)
         SELECT a.doc_id,
           CASE WHEN a.doc_id % 3 = 0 THEN 'image'
                WHEN a.doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(length(d.text) AS BIGINT) AS n_bytes,
           CAST(a.pos AS BIGINT) AS pos,
           round(CAST(CAST(s % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS DOUBLE), 4) AS f
         FROM acc a JOIN documents d USING (doc_id)""",
    "mm_feature_stats" ->
      """WITH idx AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents),
         acc AS (
           SELECT doc_id, (i - 1) % 8 AS pos,
             sum(ord(substr(text, CAST(i AS INT), 1))) AS s
           FROM idx GROUP BY 1, 2),
         f AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             pos,
             CAST(CAST(s % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS DOUBLE) AS x
           FROM acc)
         SELECT modality, count(DISTINCT doc_id) AS n_docs,
           CAST(pos AS BIGINT) AS pos, round(avg(x), 4) AS mu
         FROM f GROUP BY modality, pos""",
    "ann_quantize" ->
      """WITH n AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x * x AS DOUBLE)))) AS nrm
           FROM embeddings)
         SELECT vec_id, label, round(nrm, 6) AS l2_norm,
           unnest(range(len(embedding))) AS pos,
           CAST(round(CASE WHEN nrm = 0 THEN 0
                ELSE CAST(unnest(embedding) AS DOUBLE) / nrm * 127 END) AS INT) AS q
         FROM n""",
    "q4_late_priority" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority""",
    "q11_important_stock" ->
      """SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
         FROM lineitem
         GROUP BY l_partkey
         HAVING sum(l_quantity) > (SELECT 1.5 * sum(l_quantity)
                                          / count(DISTINCT l_partkey)
                                   FROM lineitem)
         ORDER BY total_qty DESC, l_partkey""",
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c
           LEFT OUTER JOIN orders o
             ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey)
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_c
           FROM lineitem GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name, rev.revenue_c
         FROM supplier s JOIN rev ON rev.l_suppkey = s.s_suppkey
         WHERE rev.revenue_c = (SELECT max(revenue_c) FROM rev)
         ORDER BY s.s_suppkey""",
    "q19_disjunctive_revenue" ->
      """SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_c
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 20)
            OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
                AND l.l_quantity BETWEEN 10 AND 40)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
                AND l.l_quantity BETWEEN 20 AND 50)""",
    "q22_idle_customers" ->
      """SELECT c.c_mktsegment, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
         FROM customer c
         WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
           AND c.c_acctbal > (SELECT round(avg(c2.c_acctbal), 4)
                              FROM customer c2 WHERE c2.c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-07-01')
         GROUP BY c.c_mktsegment
         ORDER BY c.c_mktsegment""",
    "text_boilerplate" ->
      // the dedup_spans block CTE at blockLen=6 plus a distinct-doc df
      // table; boiler = participating block present in ≥3 docs
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         b AS (
           SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(tok[(i*6+1):(i*6+6)], ' ') AS block
           FROM t CROSS JOIN LATERAL
             (SELECT unnest(range(0, (len(tok)+5)//6)) AS i) r),
         h AS (
           SELECT doc_id, idx, block,
             len(string_split(block, ' ')) >= 3 AS participates,
             ('0x' || substr(md5(block), 1, 15))::BIGINT AS h
           FROM b),
         df AS (
           SELECT h, count(DISTINCT doc_id) FILTER (WHERE participates) AS df
           FROM h GROUP BY h),
         k AS (
           SELECT x.doc_id, x.idx, x.block,
             x.participates AND df.df >= 3 AS boiler
           FROM h x JOIN df USING (h))
         SELECT doc_id, count(*) AS n_blocks,
           CAST(sum(CAST(boiler AS INT)) AS BIGINT) AS n_boiler,
           coalesce(string_agg(block, ' ' ORDER BY idx) FILTER (WHERE NOT boiler), '')
             AS cleaned_text
         FROM k GROUP BY doc_id""",
    "q_pps_sample" ->
      // hierarchical cumsum replay: per-shard running sums + shard
      // offsets; integer grid-jump picks telescope to exactly k=100
      """WITH d AS (
           SELECT doc_id, n_chars AS w,
             ('0x' || substr(md5('graft-pps-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM documents),
         s AS (SELECT *, ord % 8 AS shard FROM d),
         l AS (
           SELECT *,
             CAST(sum(w) OVER (PARTITION BY shard ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_local
           FROM s),
         st AS (SELECT shard, CAST(sum(w) AS BIGINT) AS shard_w FROM s GROUP BY shard),
         o AS (
           SELECT shard,
             CAST(coalesce(sum(shard_w) OVER (ORDER BY shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           FROM st),
         t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM s)
         SELECT doc_id, shard, w, cum, n_picks FROM (
           SELECT l.doc_id, l.shard, l.w, l.cum_local + o.off AS cum,
             (l.cum_local + o.off) * 100 // t.w_total
               - (l.cum_local + o.off - l.w) * 100 // t.w_total AS n_picks
           FROM l JOIN o USING (shard), t)
         WHERE n_picks > 0""",
    "text_kl_drift" ->
      // per-term e6-quantized KL contributions summed as integers —
      // order-free, so the per-source drift is exact cross-engine
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         cont AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY source, w),
         bysrc AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM cont GROUP BY source),
         bytok AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM cont GROUP BY w),
         t AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n_total FROM cont),
         terms AS (
           SELECT c.source, b.n_s,
             CAST(floor((CAST(c.c_sw AS DOUBLE) / b.n_s)
               * log2((CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
                      / (CAST(b.n_s AS DOUBLE) * CAST(x.c_w AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS term_e6
           FROM cont c JOIN bysrc b USING (source) JOIN bytok x USING (w), t)
         SELECT source, n_s AS n_tokens, count(*) AS n_terms,
           CAST(sum(term_e6) AS BIGINT) / 1000000.0 AS kl_bits
         FROM terms GROUP BY source, n_s""",
    "text_js_drift" ->
      // present-pair float terms on the shared integer-product ratios
      // (e6-quantized per term), absent-token tail as the exact
      // closed-form quotient (n_total - cov) / (2 n_total)
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         cont AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw FROM tok GROUP BY source, w),
         bysrc AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM cont GROUP BY source),
         bytok AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM cont GROUP BY w),
         t AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n_total FROM cont),
         terms AS (
           SELECT c.source, b.n_s, t.n_total, x.c_w,
             CAST(floor((
               (CAST(c.c_sw AS DOUBLE) / b.n_s)
                 * log2((2.0 * CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
                        / (CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                           + CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE)))
               + (CAST(x.c_w AS DOUBLE) / t.n_total)
                 * log2((2.0 * CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE))
                        / (CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                           + CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE)))
             ) * 1000000 + 0.5) AS BIGINT) AS term_e6
           FROM cont c JOIN bysrc b USING (source) JOIN bytok x USING (w), t)
         SELECT source, n_s AS n_tokens, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(CAST(sum(c_w) AS HUGEINT) * 1000000 // n_total AS BIGINT) AS coverage_e6,
           CAST(CAST(sum(term_e6) AS BIGINT) // 2
             + CAST(n_total - sum(c_w) AS HUGEINT) * 1000000 // (2 * n_total)
             AS BIGINT) AS js_e6
         FROM terms GROUP BY source, n_s, n_total""",
    "ann_pq_codes" ->
      s"""WITH $pqCtes
         SELECT vec_id, CAST(s AS BIGINT) AS s, CAST(code AS BIGINT) AS code,
           dist AS dist_e8
         FROM af""",
    "ann_pq_distortion" ->
      // <= M-row rollup over the same replayed assignment frame
      s"""WITH $pqCtes
         SELECT CAST(s AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(dist) // count(*) AS BIGINT) AS mean_dist_e8,
           CAST(max(dist) AS BIGINT) AS max_dist_e8,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used
         FROM af GROUP BY 1""",
    "q_catalog_breadth" ->
      // complete month frame then cumsum; zero-new months inherit
      """WITH mp AS (
           SELECT DISTINCT
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
               + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             l.l_partkey
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         act AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active_parts
                 FROM mp GROUP BY 1),
         fs AS (SELECT l_partkey, min(m) AS m FROM mp GROUP BY 1),
         nw AS (SELECT m, CAST(count(*) AS BIGINT) AS n_new_parts FROM fs GROUP BY 1),
         filled AS (
           SELECT act.m, act.n_active_parts,
             CAST(coalesce(nw.n_new_parts, 0) AS BIGINT) AS n_new_parts
           FROM act LEFT JOIN nw ON nw.m = act.m)
         SELECT m AS month, n_active_parts, n_new_parts,
           CAST(sum(n_new_parts) OVER (ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_catalog
         FROM filled""",
    "q_ship_delay" ->
      // rank-defined discrete p50/p90 per priority + the >60d share
      """WITH d AS (
           SELECT o.o_orderpriority AS priority, l.l_orderkey, l.l_linenumber,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         r AS (
           SELECT priority, delay,
             CAST(row_number() OVER (PARTITION BY priority
               ORDER BY delay, l_orderkey, l_linenumber) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n
           FROM d)
         SELECT priority, max(n) AS n_lines,
           max(CASE WHEN rn = (n + 1) // 2 THEN delay END) AS p50_days,
           max(CASE WHEN rn = ((n * 9) + 9) // 10 THEN delay END) AS p90_days,
           CAST(sum(CASE WHEN delay > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN delay > 60 THEN 1 ELSE 0 END) * 1000000
             // max(n) AS BIGINT) AS late_share_e6
         FROM r GROUP BY 1""",
    "q_link_prediction" ->
      // hub-excluded common-neighbor wedges, Jaccard e6 on uncapped
      // endpoint degrees, anti-join existing edges, total-order top-k
      s"""WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa, pb FROM pr WHERE n >= ${AnalyticsExt.LinkPredMinOrders}),
         d AS (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         adjc AS (
           SELECT adj.u, adj.v FROM adj
           JOIN d ON d.node = adj.u AND d.deg <= ${AnalyticsExt.LinkPredMaxCenterDeg}),
         cn AS (
           SELECT a.v AS pa, b.v AS pb, CAST(count(*) AS BIGINT) AS cn
           FROM adjc a JOIN adjc b ON a.u = b.u AND a.v < b.v
           GROUP BY 1, 2),
         cand AS (
           SELECT cn.pa, cn.pb, cn.cn FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = cn.pa AND e.pb = cn.pb))
         SELECT cand.pa, cand.pb, cand.cn, da.deg AS deg_a, db.deg AS deg_b,
           CAST(cand.cn * 1000000 // (da.deg + db.deg - cand.cn) AS BIGINT) AS jaccard_e6
         FROM cand JOIN d da ON da.node = cand.pa JOIN d db ON db.node = cand.pb
         ORDER BY jaccard_e6 DESC, cand.cn DESC, cand.pa, cand.pb
         LIMIT ${AnalyticsExt.LinkPredTopK}""",
    "q_cusum" ->
      // closed-form one-sided CUSUM: C+ = S - running min(S, 0),
      // C- = running max(S, 0) - S; sigma via one-ulp-clamp isqrt
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   sum(CAST(x AS HUGEINT) * x) AS sxx FROM byday),
         mu AS (SELECT sx // n AS mu,
                  (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                    // (CAST(n AS HUGEINT) * n) AS var_c
                FROM tot),
         sg AS (SELECT mu, CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS HUGEINT) AS s0, var_c
                FROM mu),
         sig AS (SELECT mu,
                   CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                           - (CASE WHEN s0 * s0 > var_c THEN 1 ELSE 0 END) AS BIGINT) AS sigma
                 FROM sg),
         s AS (SELECT d, x, sigma,
                 CAST(sum(x - mu) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
               FROM byday, sig),
         m AS (SELECT d, x, s, sigma,
                 least(CAST(min(s) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS min_s,
                 greatest(CAST(max(s) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS max_s
               FROM s)
         SELECT d AS day, x AS rev_cents, s - min_s AS c_plus, max_s - s AS c_minus,
           CAST(4 * sigma AS BIGINT) AS h_cents,
           CAST(CASE WHEN s - min_s > 4 * sigma THEN 1 ELSE 0 END AS BIGINT) AS alarm_high,
           CAST(CASE WHEN max_s - s > 4 * sigma THEN 1 ELSE 0 END AS BIGINT) AS alarm_low
         FROM m""",
    "q_lorenz" ->
      // rank-defined deciles ((i-1)*10) div n, cumulative share in
      // HUGEINT (cum_cents * 1e6 exceeds 2^63 at corpus scale)
      """WITH per AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS total_cents FROM per),
         r AS (SELECT x,
                 CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
               FROM per),
         dec AS (SELECT ((i - 1) * 10) // n AS decile,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(x) AS BIGINT) AS decile_cents
                 FROM r, tot GROUP BY 1)
         SELECT decile, n_customers, decile_cents,
           CAST(sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
           CAST(CAST(sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * 1000000
             // CAST(total_cents AS HUGEINT) AS BIGINT) AS cum_share_e6
         FROM dec, tot""",
    "q_did" ->
      // 2x2 diff-in-differences on the cents grid, data-derived
      // midpoint split, floor-division means
      """WITH dd AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day
           FROM orders),
         split AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM dd),
         lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS treated,
             CAST(CAST(date_diff('day', DATE '1970-01-01',
               CAST(o.o_orderdate AS DATE)) AS BIGINT) >= split.mid AS BIGINT) AS period,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN part p ON p.p_partkey = l.l_partkey, split),
         agg AS (
           SELECT
             CAST(count(CASE WHEN treated = 1 AND period = 0 THEN 1 END) AS BIGINT) AS n_t0,
             CAST(count(CASE WHEN treated = 1 AND period = 1 THEN 1 END) AS BIGINT) AS n_t1,
             CAST(count(CASE WHEN treated = 0 AND period = 0 THEN 1 END) AS BIGINT) AS n_c0,
             CAST(count(CASE WHEN treated = 0 AND period = 1 THEN 1 END) AS BIGINT) AS n_c1,
             CAST(sum(CASE WHEN treated = 1 AND period = 0 THEN c END) AS BIGINT) AS s_t0,
             CAST(sum(CASE WHEN treated = 1 AND period = 1 THEN c END) AS BIGINT) AS s_t1,
             CAST(sum(CASE WHEN treated = 0 AND period = 0 THEN c END) AS BIGINT) AS s_c0,
             CAST(sum(CASE WHEN treated = 0 AND period = 1 THEN c END) AS BIGINT) AS s_c1
           FROM lines)
         SELECT n_t0, n_t1, n_c0, n_c1,
           s_t0 // n_t0 AS mean_t0_cents, s_t1 // n_t1 AS mean_t1_cents,
           s_c0 // n_c0 AS mean_c0_cents, s_c1 // n_c1 AS mean_c1_cents,
           (s_t1 // n_t1 - s_t0 // n_t0) - (s_c1 // n_c1 - s_c0 // n_c0) AS did_cents
         FROM agg""",
    "q_ind_discovery" -> indDiscoveryOracle,
    "q_mann_whitney" ->
      // doubled-midrank grid (2*midrank = 2*cum_below + t + 1), tie-
      // corrected variance in HUGEINT, one-ulp-clamp isqrt, sign
      // extracted before the div
      """WITH lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         bv AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(t) AS BIGINT) AS cnt1
                FROM lines GROUP BY 1),
         cu AS (SELECT c, cnt, cnt1,
                  CAST(coalesce(sum(cnt) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
                FROM bv),
         agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(cnt1) AS BIGINT) AS n1,
                   CAST(sum(cnt1 * (2 * cum + cnt + 1)) AS BIGINT) AS r1_2x,
                   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
                 FROM cu),
         st AS (SELECT n1, n - n1 AS n2, n, r1_2x - n1 * (n1 + 1) AS u1_2x, tie_t FROM agg),
         vv AS (SELECT *, (CAST(n1 AS HUGEINT) * (n - n1)
                   * (CAST(n + 1 AS HUGEINT) * n * (n - 1) - tie_t))
                   // (12 * CAST(n AS HUGEINT) * (n - 1)) AS var_u
                FROM st),
         sg AS (SELECT *, CAST(floor(sqrt(CAST(var_u AS DOUBLE))) AS HUGEINT) AS s0 FROM vv),
         si AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_u THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > var_u THEN 1 ELSE 0 END) AS sigma
                FROM sg)
         SELECT n1, n2, u1_2x,
           CAST(CAST(u1_2x AS HUGEINT) * 1000000
             // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS cl_e6,
           CAST((CASE WHEN u1_2x >= n1 * n2 THEN 1 ELSE -1 END)
             * (abs(CAST(u1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * n2) * 1000000
                // (2 * sigma)) AS BIGINT) AS z_e6
         FROM si""",
    "q_bloom_fpr" ->
      // the hash60 bit array replayed as a distinct-position set;
      // a probe is a false positive iff all k of its rows hit
      """WITH dim AS (SELECT c_custkey AS key FROM customer
                      WHERE c_mktsegment = 'BUILDING'),
         nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM dim),
         setbits AS (
           SELECT DISTINCT
             ('0x' || substr(md5('graft-bloom-' || i || ':' || CAST(key AS VARCHAR)), 1, 15))
               ::BIGINT % 16384 AS pos
           FROM dim, range(1, 4) AS r(i)),
         probes AS (SELECT -(i + 1) AS key FROM range(100000) AS t(i)),
         pp AS (
           SELECT p.key,
             ('0x' || substr(md5('graft-bloom-' || i || ':' || CAST(p.key AS VARCHAR)), 1, 15))
               ::BIGINT % 16384 AS pos
           FROM probes p, range(1, 4) AS r(i)),
         hits AS (SELECT key, CAST(count(*) AS BIGINT) AS nhit
                  FROM pp WHERE pos IN (SELECT pos FROM setbits) GROUP BY 1),
         fp AS (SELECT CAST(count(*) AS BIGINT) AS n_false_pos FROM hits WHERE nhit = 3)
         SELECT CAST(16384 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k, n_keys,
           CAST(100000 AS BIGINT) AS n_probes, n_false_pos,
           CAST(n_false_pos * 1000000 // 100000 AS BIGINT) AS fpr_e6,
           CAST(floor(power(1.0 - exp(-CAST(3 * n_keys AS DOUBLE) / 16384), 3)
             * 1000000 + 0.5) AS BIGINT) AS theory_e6
         FROM nk, fp""",
    "q_revenue_bridge" ->
      // p = rev div qty reconstructed grid; the waterfall identity
      // telescopes exactly on it (algebra, no rounding slack)
      """WITH pm AS (
           SELECT l_partkey,
             CAST(year(CAST(l_shipdate AS DATE)) * 12
                + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
           FROM lineitem GROUP BY 1, 2),
         pp AS (SELECT l_partkey, m, q, r // q AS p FROM pm WHERE q >= 1),
         months AS (SELECT DISTINCT m FROM pp),
         valid AS (SELECT m FROM months WHERE m - 1 IN (SELECT m FROM months)),
         j AS (
           SELECT coalesce(c.m, pv.m + 1) AS m,
             c.q AS q1, c.p AS p1, pv.q AS q0, pv.p AS p0
           FROM pp c FULL OUTER JOIN pp pv
             ON pv.l_partkey = c.l_partkey AND pv.m = c.m - 1)
         SELECT m AS month,
           CAST(sum(coalesce(p1 * q1, 0)) - sum(coalesce(p0 * q0, 0)) AS BIGINT)
             AS total_delta_cents,
           CAST(sum(CASE WHEN q0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN q0 IS NULL THEN p1 * q1 ELSE 0 END) AS BIGINT) AS new_rev,
           CAST(sum(CASE WHEN q1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(sum(CASE WHEN q1 IS NULL THEN p0 * q0 ELSE 0 END) AS BIGINT) AS churned_rev,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (p1 - p0) * q0 ELSE 0 END) AS BIGINT) AS price_effect,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (q1 - q0) * p0 ELSE 0 END) AS BIGINT) AS volume_effect,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (p1 - p0) * (q1 - q0) ELSE 0 END) AS BIGINT) AS cross_effect
         FROM j WHERE m IN (SELECT m FROM valid)
         GROUP BY 1""",
    "ann_embedding_drift" ->
      // e6-quantize BEFORE summation (order-free integer sums); the
      // per-dim mean is SIGN-FACTORED (negative sums: Spark div
      // truncates, DuckDB // floors)
      """WITH cells AS (
           SELECT label, vec_id % 2 AS side, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v_e6
           FROM embeddings, generate_series(1, 64) AS g(i)),
         dims AS (SELECT label, side, pos, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(v_e6) AS BIGINT) AS s
                  FROM cells GROUP BY 1, 2, 3),
         d2 AS (SELECT label, side, pos, n,
                  CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS m
                FROM dims),
         pr AS (SELECT a.label, a.pos, a.n AS n_a, a.m AS ma, b.n AS n_b, b.m AS mb
                FROM d2 a JOIN d2 b ON b.label = a.label AND b.pos = a.pos
                WHERE a.side = 0 AND b.side = 1)
         SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(sum(CAST(ma - mb AS HUGEINT) * (ma - mb)) AS BIGINT) AS shift_l2sq_e12,
           CASE WHEN sum(CAST(ma AS HUGEINT) * ma) > 0
                 AND sum(CAST(mb AS HUGEINT) * mb) > 0 THEN
             CAST((CASE WHEN sum(CAST(ma AS HUGEINT) * mb) < 0 THEN -1 ELSE 1 END)
               * ((abs(sum(CAST(ma AS HUGEINT) * mb)) * 1000
                   // sum(CAST(ma AS HUGEINT) * ma))
                  * (abs(sum(CAST(ma AS HUGEINT) * mb)) * 1000
                     // sum(CAST(mb AS HUGEINT) * mb))) AS BIGINT)
           ELSE NULL END AS cos2_signed_e6
         FROM pr GROUP BY 1""",
    "q_psi" ->
      // first-week baseline, add-half-count smoothing as integer
      // ratios (2c+1)/(2n+B), e6-quantized float terms
      """WITH ev AS (SELECT event_type, epoch_ns(ts) // 604800000000000 AS week,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
         b AS (SELECT min(c) AS lo, max(c) AS hi, min(week) AS w0 FROM ev),
         binned AS (SELECT event_type, week - w0 AS week_idx,
                      ((c - lo) * 10) // (hi - lo + 1) AS bin FROM ev, b),
         cells AS (SELECT event_type, week_idx, bin, CAST(count(*) AS BIGINT) AS cnt
                   FROM binned GROUP BY 1, 2, 3),
         wt AS (SELECT event_type, week_idx, CAST(sum(cnt) AS BIGINT) AS n_w
                FROM cells GROUP BY 1, 2),
         grid AS (
           SELECT wt.event_type, wt.week_idx, g.bin, coalesce(c.cnt, 0) AS cnt, wt.n_w
           FROM wt CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
           LEFT JOIN cells c ON c.event_type = wt.event_type
             AND c.week_idx = wt.week_idx AND c.bin = g.bin),
         base AS (SELECT event_type, bin, cnt AS cnt0, n_w AS n_0
                  FROM grid WHERE week_idx = 0),
         terms AS (
           SELECT g.event_type, g.week_idx, g.n_w,
             CAST(floor((
                 (CAST(g.cnt * 2 + 1 AS DOUBLE) / (g.n_w * 2 + 10))
               - (CAST(b2.cnt0 * 2 + 1 AS DOUBLE) / (b2.n_0 * 2 + 10)))
               * ln((CAST(g.cnt * 2 + 1 AS DOUBLE) / (g.n_w * 2 + 10))
                    / (CAST(b2.cnt0 * 2 + 1 AS DOUBLE) / (b2.n_0 * 2 + 10)))
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM grid g JOIN base b2 ON b2.event_type = g.event_type AND b2.bin = g.bin
           WHERE g.week_idx > 0)
         SELECT event_type, week_idx, CAST(max(n_w) AS BIGINT) AS n_events,
           CAST(sum(term_e6) AS BIGINT) AS psi_e6,
           CAST(sum(term_e6) > 100000 AS BIGINT) AS flag_watch,
           CAST(sum(term_e6) > 250000 AS BIGINT) AS flag_act
         FROM terms GROUP BY 1, 2""",
    "q_split_balance" ->
      // pairwise KS on the #190 cross-multiplied integer grid, split
      // buckets = #54's raw-text md5 rule
      """WITH sp AS (
           SELECT doc_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
                   CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 100 AS b
                 FROM documents)),
         d AS (SELECT sp.split, CAST(n_chars AS BIGINT) AS len
               FROM sp JOIN documents USING (doc_id)),
         pairs(pair, pa, pb) AS (VALUES ('train|val', 'train', 'val'),
           ('train|test', 'train', 'test'), ('val|test', 'val', 'test')),
         tagged AS (SELECT p.pair, CAST(d.split = p.pa AS BIGINT) AS is_a, d.len
                    FROM pairs p JOIN d ON d.split = p.pa OR d.split = p.pb),
         bl AS (SELECT pair, len, CAST(sum(is_a) AS BIGINT) AS ca,
                  CAST(sum(1 - is_a) AS BIGINT) AS cb
                FROM tagged GROUP BY 1, 2),
         tot AS (SELECT pair, CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
                 FROM bl GROUP BY 1),
         cum AS (SELECT pair, len,
                   CAST(sum(ca) OVER (PARTITION BY pair ORDER BY len) AS BIGINT) AS cum_a,
                   CAST(sum(cb) OVER (PARTITION BY pair ORDER BY len) AS BIGINT) AS cum_b
                 FROM bl),
         dm AS (SELECT c.pair, t.n_a, t.n_b,
                  CAST(max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT) AS d_max
                FROM cum c JOIN tot t USING (pair) GROUP BY 1, 2, 3)
         SELECT pair, n_a, n_b,
           CAST(CAST(d_max AS HUGEINT) * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS ks_e6
         FROM dm""",
    "q_tukey_fences" ->
      """WITH vals AS (SELECT o_orderpriority AS g, o_orderkey,
                         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
         r AS (SELECT g, c,
                 CAST(row_number() OVER (PARTITION BY g ORDER BY c, o_orderkey) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nn
               FROM vals),
         q AS (SELECT g, CAST(max(nn) AS BIGINT) AS n,
                 max(CASE WHEN rn = (nn + 3) // 4 THEN c END) AS q1,
                 max(CASE WHEN rn = (3 * nn + 3) // 4 THEN c END) AS q3
               FROM r GROUP BY 1),
         f AS (SELECT g, n, q1, q3, q3 - q1 AS iqr,
                 q1 - (3 * (q3 - q1)) // 2 AS lo_fence,
                 q3 + (3 * (q3 - q1)) // 2 AS hi_fence
               FROM q)
         SELECT f.g AS priority, f.n, f.q1, f.q3, f.iqr, f.lo_fence, f.hi_fence,
           CAST(sum(CASE WHEN v.c < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN v.c > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST((sum(CASE WHEN v.c < f.lo_fence THEN 1 ELSE 0 END)
                 + sum(CASE WHEN v.c > f.hi_fence THEN 1 ELSE 0 END)) * 1000000 // f.n
             AS BIGINT) AS outlier_rate_e6
         FROM vals v JOIN f ON f.g = v.g
         GROUP BY 1, 2, 3, 4, 5, 6, 7""",
    "q_return_wilson" ->
      // z^2=4 Wilson lower bound, isqrt on the e6 grid (e3 precision)
      """WITH per AS (
           SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
           FROM lineitem GROUP BY 1),
         sc AS (SELECT *, CAST(n_returns AS HUGEINT) * (n_lines - n_returns) * 1000000
                  // n_lines + 1000000 AS inner_e6 FROM per),
         s1 AS (SELECT *, CAST(floor(sqrt(CAST(inner_e6 AS DOUBLE))) AS HUGEINT) AS s0 FROM sc),
         s2 AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= inner_e6 THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > inner_e6 THEN 1 ELSE 0 END) AS sq_e3 FROM s1),
         s3 AS (SELECT suppkey, n_lines, n_returns,
                  CAST(n_returns * 1000000 // n_lines AS BIGINT) AS rate_e6,
                  CAST(((n_returns + 2) * 1000000 - 2 * sq_e3 * 1000) // (n_lines + 4) AS BIGINT)
                    AS wilson_lb_e6
                FROM s2)
         SELECT rank, suppkey, n_lines, n_returns, rate_e6, wilson_lb_e6 FROM (
           SELECT *, CAST(row_number() OVER (ORDER BY wilson_lb_e6 DESC, suppkey) AS BIGINT)
             AS rank FROM s3)
         WHERE rank <= 25""",
    "cdc_hot_keys" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes
                      FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n_changes) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS n_keys FROM per),
         rk AS (SELECT *, CAST(row_number() OVER (ORDER BY n_changes DESC, user_id) AS BIGINT)
                  AS rank FROM per)
         SELECT rank, user_id, n_changes,
           CAST(n_changes * 1000000 // n_total AS BIGINT) AS share_e6,
           CAST(sum(n_changes) OVER (ORDER BY rank) * 1000000 // n_total AS BIGINT)
             AS cum_share_e6,
           n_keys, n_total
         FROM rk, tot WHERE rank <= 10""",
    "q_interarrival" ->
      // per-(user,type) lag gaps; equal-ts runs yield the same gap
      // multiset under any stable order, so percentiles are exact
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         g AS (SELECT event_type,
                 ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                   ORDER BY ts_us, user_id) AS gap_us
               FROM ev),
         g2 AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
         r AS (SELECT event_type, gap_us,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY gap_us, event_type) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
               FROM g2)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(sum(gap_us) // max(n) AS BIGINT) AS mean_us,
           max(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS p50_us,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS p90_us,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_us END) AS p99_us
         FROM r GROUP BY 1""",
    "dedup_split_leakage" ->
      // the #23 banded candidates; split buckets = #54's md5 rule on
      // the CANONICAL text (array_to_string of the normalized tokens)
      s"""${minhashCandidatesCte(recursive = false)},
         pairs AS (SELECT DISTINCT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sp AS (
           SELECT doc_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(tok, ' ')), 1, 4))::BIGINT % 100 AS b
                 FROM corpus)),
         cells AS (
           SELECT least(a.split, b.split) AS split_lo, greatest(a.split, b.split) AS split_hi,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs
           JOIN sp a ON a.doc_id = pairs.doc_a
           JOIN sp b ON b.doc_id = pairs.doc_b
           GROUP BY 1, 2),
         c2 AS (SELECT *, CAST(split_lo <> split_hi AS BIGINT) AS is_leak FROM cells),
         tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_pairs_total,
                   CAST(coalesce(sum(CASE WHEN is_leak = 1 THEN n_pairs END), 0) AS BIGINT)
                     AS n_leaked
                 FROM c2)
         SELECT split_lo, split_hi, n_pairs, is_leak, n_pairs_total, n_leaked,
           CAST(n_leaked * 1000000 // n_pairs_total AS BIGINT) AS leak_rate_e6
         FROM c2, tot""",
    // rolling-hash chunking replay: byte values from hex pairs, the
    // W=8 window hash as a list dot product (double-exact < 2^53),
    // boundaries where hash % 64 = 0, chunk fingerprints md5 of the
    // hex slice — identical content rule to the Spark side
    "mm_cdc_chunks" ->
      """WITH pay AS (
           SELECT doc_id, hex(text) AS hx,
             CAST(length(hex(text)) // 2 AS BIGINT) AS n
           FROM documents WHERE length(hex(text)) >= 2),
         pows AS (SELECT [1,33,1089,35937,1185921,39135393,1291467969,42618442977]::BIGINT[] AS pw),
         b AS (
           SELECT doc_id, hx, n,
             [ (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
               for i in range(1, CAST(n AS INT) + 1) ]::BIGINT[] AS bs
           FROM pay),
         cu AS (
           SELECT doc_id, hx, n,
             list_append(
               [ i for i in range(8, CAST(n AS INT))
                 if CAST(list_dot_product(bs[i-7:i]::DOUBLE[], pw::DOUBLE[]) AS BIGINT)
                    % 64 = 0 ],
               n) AS cuts
           FROM b, pows),
         se AS (
           SELECT doc_id, hx,
             list_prepend(CAST(1 AS BIGINT),
               [ CAST(cuts[i] + 1 AS BIGINT) for i in range(1, len(cuts)) ]) AS starts,
             cuts AS ends
           FROM cu),
         ch AS (SELECT doc_id, unnest(starts) AS s, unnest(ends) AS e, hx FROM se),
         fp AS (
           SELECT doc_id,
             md5(substr(hx, CAST(2*s - 1 AS INT), CAST(2*(e - s + 1) AS INT))) AS fp,
             e - s + 1 AS nb
           FROM ch),
         tot AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS total_chunks,
             CAST(count(DISTINCT fp) AS BIGINT) AS distinct_chunks,
             CAST(sum(nb) AS BIGINT) AS total_bytes
           FROM fp),
         uq AS (
           SELECT CAST(sum(nb) AS BIGINT) AS unique_bytes
           FROM (SELECT fp, max(nb) AS nb FROM fp GROUP BY fp))
         SELECT n_docs, total_chunks, distinct_chunks, total_bytes, unique_bytes,
           CAST((total_chunks - distinct_chunks) * 1000000 // total_chunks AS BIGINT)
             AS dup_chunk_ratio_e6,
           CAST((total_bytes - unique_bytes) * 1000000 // total_bytes AS BIGINT)
             AS savings_e6,
           CAST(total_bytes * 100 // total_chunks AS BIGINT) AS avg_chunk_bytes_e2
         FROM tot, uq""",
    "mm_byte_entropy" ->
      // hex-pair byte explosion (case-insensitive by construction:
      // byte VALUES never reach the output, only their counts)
      """WITH pay AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             hex(text) AS hx
           FROM documents),
         bytes AS (
           SELECT doc_id, modality,
             unnest([substr(hx, i * 2 + 1, 2)
                     for i in range(0, CAST(length(hx) // 2 AS BIGINT))]) AS b
           FROM pay),
         pc AS (SELECT doc_id, modality, b, CAST(count(*) AS BIGINT) AS cnt
                FROM bytes GROUP BY 1, 2, 3),
         pd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY 1),
         terms AS (
           SELECT pc.doc_id, pc.modality, n,
             CAST(floor(CAST(cnt AS DOUBLE)
               * log2(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS term_e6
           FROM pc JOIN pd USING (doc_id))
         SELECT doc_id, modality, CAST(max(n) AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_distinct_bytes,
           CAST(sum(term_e6) // max(n) AS BIGINT) AS h_bits_e6,
           CAST(sum(term_e6) // max(n) < 500000 AS BIGINT) AS flag_degenerate,
           CAST(sum(term_e6) // max(n) > 7500000 AS BIGINT) AS flag_high_entropy
         FROM terms GROUP BY 1, 2""",
    "q_split_gain" ->
      // equal-width bins, prefix counts, one truncation per Gini side
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
                      CAST(o_orderstatus = 'F' AS BIGINT) AS y FROM orders),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM o),
         bins AS (SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin,
                    CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b
                  FROM o, b GROUP BY 1),
         tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(pos_b) AS BIGINT) AS pos
                 FROM bins),
         cum AS (SELECT bin, CAST(sum(n_b) OVER (ORDER BY bin) AS BIGINT) AS nl,
                   CAST(sum(pos_b) OVER (ORDER BY bin) AS BIGINT) AS pl FROM bins),
         g AS (SELECT bin AS threshold_bin, nl, pl, n - nl AS nr, pos - pl AS pr, n, pos
               FROM cum, tot WHERE bin < 9),
         sc AS (SELECT threshold_bin, nl AS n_left, pl AS pos_left, nr AS n_right,
                  pr AS pos_right,
                  (1000000 - CAST((CAST(pos AS HUGEINT) * pos
                       + CAST(n - pos AS HUGEINT) * (n - pos)) * 1000000
                     // (CAST(n AS HUGEINT) * n) AS BIGINT)) AS gini_parent_e6,
                  CAST((CAST(nl AS HUGEINT) * (CASE WHEN nl > 0 THEN
                          1000000 - CAST((CAST(pl AS HUGEINT) * pl
                              + CAST(nl - pl AS HUGEINT) * (nl - pl)) * 1000000
                            // (CAST(nl AS HUGEINT) * nl) AS BIGINT) ELSE 0 END)
                      + CAST(nr AS HUGEINT) * (CASE WHEN nr > 0 THEN
                          1000000 - CAST((CAST(pr AS HUGEINT) * pr
                              + CAST(nr - pr AS HUGEINT) * (nr - pr)) * 1000000
                            // (CAST(nr AS HUGEINT) * nr) AS BIGINT) ELSE 0 END))
                    // n AS BIGINT) AS gini_split_e6
                FROM g)
         SELECT threshold_bin, n_left, pos_left, n_right, pos_right,
           gini_parent_e6, gini_split_e6,
           CAST(gini_parent_e6 - gini_split_e6 AS BIGINT) AS gain_e6,
           CAST(row_number() OVER (ORDER BY gini_parent_e6 - gini_split_e6 DESC, threshold_bin)
             = 1 AS BIGINT) AS is_best
         FROM sc""",
    "text_bigram_ppl" ->
      // self-trained add-one bigram LM; per-bigram surprisal
      // e6-quantized before the order-free per-doc sum
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         db2 AS (
           SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
           FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                 FROM t WHERE len(tk) >= 2)),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM db2 GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
               FROM (SELECT unnest(tk) AS w FROM t)),
         terms AS (
           SELECT d.doc_id,
             CAST(floor(log2(CAST(c1.c1 + v.v AS DOUBLE) / CAST(c12.c12 + 1 AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM db2 d JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(term_e6) // count(*) AS BIGINT) AS h_bits_e6
         FROM terms GROUP BY 1""",
    "text_char_entropy" ->
      // per-char cnt*log2(n/cnt) e6-quantized terms, one div per doc
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '')) AS ch
           FROM documents),
         pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
                FROM ch WHERE ch <> '' GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY 1),
         terms AS (
           SELECT pc.doc_id, n,
             CAST(floor(CAST(cnt AS DOUBLE)
               * log2(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS term_e6
           FROM pc JOIN pd USING (doc_id))
         SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(sum(term_e6) // max(n) AS BIGINT) AS h_bits_e6
         FROM terms GROUP BY 1""",
    "text_msttr" ->
      // full 25-token segments; distinct counts inside the array
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                 CAST(len(tk) // 25 AS BIGINT) AS n_segments, tk
               FROM t WHERE len(tk) >= 25),
         segs AS (SELECT doc_id, n_tokens, n_segments,
                    unnest(range(0, n_segments)) AS seg, tk FROM d),
         dc AS (SELECT doc_id, n_tokens, n_segments,
                  CAST(len(list_distinct(tk[seg * 25 + 1 : seg * 25 + 25])) AS BIGINT)
                    AS d_cnt
                FROM segs)
         SELECT doc_id, n_tokens, n_segments,
           CAST(sum(d_cnt) * 1000000 // (25 * n_segments) AS BIGINT) AS msttr_e6
         FROM dc GROUP BY 1, 2, 3""",
    "q_degree_dist" ->
      // octave = len(bin(deg)) - 1, pure integer in both engines
      """WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                 FROM (SELECT pa AS node FROM pairs UNION ALL SELECT pb FROM pairs)
                 GROUP BY 1),
         o AS (SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS octave,
                 CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(min(deg) AS BIGINT) AS min_deg, CAST(max(deg) AS BIGINT) AS max_deg
               FROM deg GROUP BY 1)
         SELECT octave, n_nodes, min_deg, max_deg,
           CASE WHEN lag(n_nodes) OVER (ORDER BY octave) IS NULL THEN NULL
                ELSE CAST(n_nodes * 1000000 // lag(n_nodes) OVER (ORDER BY octave) AS BIGINT)
           END AS ratio_prev_e6
         FROM o""",
    "q_ewma_chart" ->
      // the #196 dyadic cover join on the global day series; limits
      // sqrt(3*Var) via the one-ulp isqrt (lambda/(2-lambda) = 1/3)
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         m0 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                  sum(CAST(x AS HUGEINT) * x) AS sxx FROM byday),
         m1 AS (SELECT sx // n AS mu,
                  3 * ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                       // (CAST(n AS HUGEINT) * n)) AS v3 FROM m0),
         m2 AS (SELECT mu, v3, CAST(floor(sqrt(CAST(v3 AS DOUBLE))) AS HUGEINT) AS s0 FROM m1),
         m3 AS (SELECT mu, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v3 THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > v3 THEN 1 ELSE 0 END) AS lim FROM m2),
         cov AS (SELECT b.day AS src, b.x, unnest(range(b.day, b.day + 16)) AS t FROM byday b),
         agg AS (SELECT t,
                   CAST(sum(1::BIGINT << CAST(15 - (t - src) AS INT)) AS BIGINT) AS den,
                   CAST(sum(x * (1::BIGINT << CAST(15 - (t - src) AS INT))) AS BIGINT) AS num
                 FROM cov GROUP BY 1)
         SELECT a.t AS day, b.x AS cents, CAST(num // den AS BIGINT) AS ewma_cents,
           CAST(mu AS BIGINT) AS mu_cents, CAST(lim AS BIGINT) AS limit_cents,
           CAST(abs(num // den - mu) > lim AS BIGINT) AS alarm
         FROM agg a JOIN byday b ON b.day = a.t, m3""",
    "q_kendall_tau" ->
      // day-pair sign sweep; tau-b with both tie margins, one-ulp
      // isqrt denominator, sign factored before the div
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         p AS (SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sx,
                 CAST(sign(b.y - a.y) AS BIGINT) AS sy
               FROM byday a JOIN byday b ON a.day < b.day),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n0,
                   CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                   CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
                   CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                   CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
                 FROM p),
         d2 AS (SELECT *, CAST(n0 - tx AS HUGEINT) * (n0 - ty) AS den2 FROM agg),
         d3 AS (SELECT *, CAST(floor(sqrt(CAST(den2 AS DOUBLE))) AS HUGEINT) AS s0 FROM d2),
         d4 AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= den2 THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > den2 THEN 1 ELSE 0 END) AS den FROM d3)
         SELECT n0, n_c, n_d, tx AS ties_x, ty AS ties_y,
           CASE WHEN den > 0 THEN
             CAST((CASE WHEN n_c >= n_d THEN 1 ELSE -1 END)
               * (abs(CAST(n_c AS HUGEINT) - n_d) * 1000000 // den) AS BIGINT)
           ELSE NULL END AS tau_b_e6
         FROM d4""",
    "q_cohens_d" ->
      // staged HUGEINT quotients: per-group (n-1)s^2 with one
      // truncation each, pooled variance, one-ulp isqrt, exact
      // mean-gap numerator, Hedges correction on the grid
      """WITH lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         m AS (SELECT
             CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN t = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
             sum(CASE WHEN t = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q1,
             CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN t = 0 THEN c ELSE 0 END) AS BIGINT) AS s2,
             sum(CASE WHEN t = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q2
           FROM lines),
         v AS (SELECT *,
             (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
               // (CAST(n1 AS HUGEINT) * (n1 + n2 - 2)) AS v1,
             (CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
               // (CAST(n2 AS HUGEINT) * (n1 + n2 - 2)) AS v2
           FROM m),
         sp2 AS (SELECT *, v1 + v2 AS sp2 FROM v),
         sg AS (SELECT *, CAST(floor(sqrt(CAST(sp2 AS DOUBLE))) AS HUGEINT) AS s0 FROM sp2),
         si AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= sp2 THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > sp2 THEN 1 ELSE 0 END) AS sp
                FROM sg),
         dd AS (SELECT *,
             CASE WHEN sp > 0 THEN
               CAST((CASE WHEN CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 < 0
                      THEN -1 ELSE 1 END)
                 * (abs(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1) * 1000000
                    // (CAST(n1 AS HUGEINT) * n2 * sp)) AS BIGINT)
             ELSE NULL END AS d_e6
           FROM si)
         SELECT n1, n2, CAST(sp AS BIGINT) AS pooled_sd_cents, d_e6,
           CAST(d_e6 - (3 * d_e6) // (4 * (n1 + n2) - 9) AS BIGINT) AS g_e6
         FROM dd""",
    "q_cliffs_delta" ->
      // the Mann-Whitney doubled-midrank frame, finished as the
      // ordinal effect size with Romano magnitude bands
      """WITH lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         bv AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(t) AS BIGINT) AS cnt1
                FROM lines GROUP BY 1),
         cu AS (SELECT c, cnt, cnt1,
                  CAST(coalesce(sum(cnt) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
                FROM bv),
         agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(cnt1) AS BIGINT) AS n1,
                   CAST(sum(cnt1 * (2 * cum + cnt + 1)) AS BIGINT) AS r1_2x
                 FROM cu),
         st AS (SELECT n1, n - n1 AS n2, r1_2x - n1 * (n1 + 1) AS u1_2x FROM agg),
         de AS (SELECT *,
             CAST((CASE WHEN u1_2x >= CAST(n1 AS HUGEINT) * n2 THEN 1 ELSE -1 END)
               * (abs(CAST(u1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * n2) * 1000000
                  // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT) AS delta_e6
           FROM st)
         SELECT n1, n2, u1_2x, delta_e6,
           CASE WHEN abs(delta_e6) < 147000 THEN 'negligible'
                WHEN abs(delta_e6) < 330000 THEN 'small'
                WHEN abs(delta_e6) < 474000 THEN 'medium'
                ELSE 'large' END AS magnitude
         FROM de""",
    "q_anova_f" ->
      // one truncation per group (S_g^2 // n_g), staged F quotient;
      // whole-dollar grid (cents-grid bsum crosses 2^63 at sf0.01)
      """WITH per AS (
           SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS s_g,
             sum(CAST(CAST(floor(o_totalprice + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS q_g
           FROM orders GROUP BY 1),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
                   CAST(sum(s_g) AS BIGINT) AS s, sum(q_g) AS q,
                   sum(CAST(s_g AS HUGEINT) * s_g // n_g) AS bsum
                 FROM per)
         SELECT k, n,
           CAST(bsum - CAST(s AS HUGEINT) * s // n AS BIGINT) AS ssb_d2,
           CAST(q - bsum AS BIGINT) AS ssw_d2,
           CASE WHEN q - bsum >= 1 THEN
             CAST((bsum - CAST(s AS HUGEINT) * s // n) * (n - k) * 1000000
               // ((q - bsum) * (k - 1)) AS BIGINT)
           ELSE NULL END AS f_e6
         FROM agg""",
    "q_levene" ->
      // per-group rank-defined lower median, |x - med_g|, then the
      // same one-truncation-per-group F machinery on the deviations
      """WITH vals AS (
           SELECT o_orderpriority AS g, o_orderkey,
             CAST(floor(o_totalprice + 0.5) AS BIGINT) AS c
           FROM orders),
         r AS (SELECT g, c,
                 CAST(row_number() OVER (PARTITION BY g ORDER BY c, o_orderkey) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nn
               FROM vals),
         med AS (SELECT g, max(CASE WHEN rn = (nn + 1) // 2 THEN c END) AS med
                 FROM r GROUP BY 1),
         per AS (SELECT v.g, CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(abs(v.c - med.med)) AS BIGINT) AS s_g,
                   sum(CAST(abs(v.c - med.med) AS HUGEINT) * abs(v.c - med.med)) AS q_g
                 FROM vals v JOIN med ON med.g = v.g GROUP BY 1),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
                   CAST(sum(s_g) AS BIGINT) AS s, sum(q_g) AS q,
                   sum(CAST(s_g AS HUGEINT) * s_g // n_g) AS bsum
                 FROM per)
         SELECT k, n,
           CAST(bsum - CAST(s AS HUGEINT) * s // n AS BIGINT) AS ssb_z2,
           CAST(q - bsum AS BIGINT) AS ssw_z2,
           CASE WHEN q - bsum >= 1 THEN
             CAST((bsum - CAST(s AS HUGEINT) * s // n) * (n - k) * 1000000
               // ((q - bsum) * (k - 1)) AS BIGINT)
           ELSE NULL END AS w_e6
         FROM agg""",
    "q_ljung_box" ->
      // per-lag pairwise-complete r^2 via the factored e3*e3 quotient
      // (the q_period_detect construction), one truncation per lag
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
         lags AS (SELECT unnest(generate_series(1, 10)) AS lag),
         pairs AS (
           SELECT l.lag, a.x AS x, b.x AS y
           FROM lags l CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag),
         pl AS (SELECT lag, CAST(count(*) AS BIGINT) AS m,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  sum(CAST(x AS HUGEINT) * y) AS sxy,
                  sum(CAST(x AS HUGEINT) * x) AS sxx,
                  sum(CAST(y AS HUGEINT) * y) AS syy
                FROM pairs GROUP BY 1),
         rr AS (SELECT CAST(lag AS BIGINT) AS lag,
                  CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
                  CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
                  CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
                FROM pl),
         r2 AS (SELECT lag,
                  (abs(num) * 1000 // den_x) * (abs(num) * 1000 // den_y) AS r2_e6
                FROM rr WHERE den_x > 0 AND den_y > 0),
         terms AS (SELECT n, r2_e6 // (n - lag) AS term FROM r2, nn),
         agg AS (SELECT n, CAST(count(*) AS BIGINT) AS n_lags,
                   CAST(sum(term) AS BIGINT) AS tsum
                 FROM terms GROUP BY 1)
         SELECT n AS n_days, n_lags,
           CAST(CAST(n AS HUGEINT) * (n + 2) * tsum AS BIGINT) AS q_e6,
           CAST(18307000 AS BIGINT) AS chi2_crit_e6,
           CAST(CAST(n AS HUGEINT) * (n + 2) * tsum > 18307000 AS BIGINT) AS significant
         FROM agg""",
    "q_runs_test" ->
      // rank-defined lower median, equal days dropped, R = sign
      // changes + 1 via lag; z = N div isqrt(A div B) (the n^2 in
      // Var's denominator cancels into N)
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, d) AS BIGINT) AS rn,
                 CAST(count(*) OVER () AS BIGINT) AS nn
               FROM byday),
         med AS (SELECT max(CASE WHEN rn = (nn + 1) // 2 THEN x END) AS med FROM r),
         s AS (SELECT d, CAST(x > med AS BIGINT) AS s FROM byday, med WHERE x <> med),
         ch AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                    OR lag(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS chg
                FROM s),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS n1,
                   CAST(sum(chg) AS BIGINT) AS runs FROM ch),
         q AS (SELECT *, 2 * n1 * (n - n1) * (2 * n1 * (n - n1) - n) // (n - 1) AS qv
               FROM agg),
         sg AS (SELECT *, CAST(floor(sqrt(CAST(qv AS DOUBLE))) AS BIGINT) AS s0 FROM q),
         si AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= qv THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > qv THEN 1 ELSE 0 END) AS sigma
                FROM sg)
         SELECT n AS n_days_used, n1 AS n_above, n - n1 AS n_below,
           (SELECT med FROM med) AS median_cents, runs,
           CAST(1000000 + 2 * n1 * (n - n1) * 1000000 // n AS BIGINT) AS mu_e6,
           CAST((CASE WHEN runs * n - n - 2 * n1 * (n - n1) >= 0 THEN 1 ELSE -1 END)
             * (abs(runs * n - n - 2 * n1 * (n - n1)) * 1000000 // sigma) AS BIGINT) AS z_e6
         FROM si""",
    "q_dow_seasonality" ->
      // weekday from epoch-day arithmetic ((d+3) % 7, 0 = Monday) —
      // no engine dayofweek() convention involved
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         bd AS (SELECT (d + 3) % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(x) AS BIGINT) AS dow_cents
                FROM daily GROUP BY 1),
         tot AS (SELECT CAST(sum(n_days) AS BIGINT) AS td,
                   CAST(sum(dow_cents) AS BIGINT) AS tc FROM bd)
         SELECT dow, n_days, dow_cents, dow_cents // n_days AS mean_cents,
           CAST(CAST(dow_cents // n_days AS HUGEINT) * 1000000
             // (tc // td) AS BIGINT) AS index_e6
         FROM bd, tot""",
    "dedup_scurve" -> {
      // GENERATED from Dedup's own (b, r, grid) constants — truncating
      // e6 powers replayed verbatim (DuckDB // on positives ≡ div)
      def powSql(base: String, p: Int): String =
        (2 to p).foldLeft(base)((acc, _) => s"(($acc) * ($base) // 1000000)")
      val step = 1000000L / Dedup.ScurvePoints
      s"""WITH g AS (
            SELECT CAST(unnest(generate_series(0, ${Dedup.ScurvePoints})) * $step AS BIGINT)
              AS s_e6),
          p AS (SELECT s_e6,
                  CAST(${powSql("s_e6", Dedup.MinhashRowsPerBand)} AS BIGINT) AS p_band_e6
                FROM g)
          SELECT s_e6, p_band_e6,
            CAST(1000000 - ${powSql("(1000000 - p_band_e6)", Dedup.MinhashBands)} AS BIGINT)
              AS p_candidate_e6
          FROM p"""
    },
    "q_seasonal_strength" ->
      // shared decomposition kernel, then the two F-ratios on raw
      // moment forms (shared n cancels), HUGEINT cross products
      s"""${seasonalKernelSql},
         frame AS (
           SELECT k.event_type, k.det AS det, k.c - sc.seasonal AS des,
             k.det - sc.seasonal AS rem
           FROM kept k JOIN sc ON sc.event_type = k.event_type AND sc.dow = k.dow),
         agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(det) AS BIGINT) AS sd, sum(CAST(det AS HUGEINT) * det) AS sdd,
             CAST(sum(des) AS BIGINT) AS ss, sum(CAST(des AS HUGEINT) * des) AS sss,
             CAST(sum(rem) AS BIGINT) AS sr, sum(CAST(rem AS HUGEINT) * rem) AS srr
           FROM frame GROUP BY 1),
         v AS (SELECT event_type, n_days,
             greatest(CAST(n_days AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd, 1) AS vd,
             greatest(CAST(n_days AS HUGEINT) * sss - CAST(ss AS HUGEINT) * ss, 1) AS vs,
             CAST(n_days AS HUGEINT) * srr - CAST(sr AS HUGEINT) * sr AS vr
           FROM agg)
         SELECT event_type, n_days,
           CAST(greatest(0, (vd - vr) * 1000000 // vd) AS BIGINT) AS f_seasonal_e6,
           CAST(greatest(0, (vs - vr) * 1000000 // vs) AS BIGINT) AS f_trend_e6
         FROM v""",
    "ann_knn_graph" ->
      // shared ivfTrainCtes quantizer replay, then within-cell
      // pairwise 6dp cosine, top-5 per vector
      s"""WITH ${ivfTrainCtes}
         SELECT vec_id, nbr_id, cos, rank FROM (
           SELECT a.vec_id, b.vec_id AS nbr_id,
             round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                 a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
               b.vec_id) AS BIGINT) AS rank
           FROM acorp a JOIN acorp b
             ON a.cell = b.cell AND a.vec_id <> b.vec_id)
         WHERE rank <= 5""",
    "q_holt_winters" ->
      // identical dyadic sign-factored HW trajectory as a recursive
      // CTE with a 7-slot seasonal list (shared hwCtes helper)
      s"""WITH ${hwCtes}
         SELECT event_type, day, y AS cents, l AS level_c, b AS trend_c,
           s[CAST(day % 7 AS INT) + 1] AS season_c,
           l + b + s[CAST((day + 1) % 7 AS INT) + 1] AS forecast_next_c
         FROM rec""",
    "q_abc_migration" ->
      // per-period 80/95 cumulative-share classes, '-' for unsold,
      // full-outer at part grain, <=16-row rollup
      """WITH dd AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day
           FROM orders),
         split AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM dd),
         lines AS (
           SELECT l.l_partkey,
             CAST(CAST(date_diff('day', DATE '1970-01-01',
               CAST(o.o_orderdate AS DATE)) AS BIGINT) >= split.mid AS BIGINT) AS period,
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)) AS BIGINT) AS r
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey, split),
         r0 AS (SELECT l_partkey, CAST(sum(r) AS BIGINT) AS rev
                FROM lines WHERE period = 0 GROUP BY 1),
         r1 AS (SELECT l_partkey, CAST(sum(r) AS BIGINT) AS rev
                FROM lines WHERE period = 1 GROUP BY 1),
         c0 AS (SELECT l_partkey, rev,
                  CASE WHEN share_e6 <= 800000 THEN 'A'
                       WHEN share_e6 <= 950000 THEN 'B' ELSE 'C' END AS cls
                FROM (SELECT l_partkey, rev,
                        CAST(CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
                          * 1000000 // (sum(rev) OVER ()) AS BIGINT) AS share_e6
                      FROM r0)),
         c1 AS (SELECT l_partkey, rev,
                  CASE WHEN share_e6 <= 800000 THEN 'A'
                       WHEN share_e6 <= 950000 THEN 'B' ELSE 'C' END AS cls
                FROM (SELECT l_partkey, rev,
                        CAST(CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
                          * 1000000 // (sum(rev) OVER ()) AS BIGINT) AS share_e6
                      FROM r1))
         SELECT coalesce(c0.cls, '-') AS class_before,
           coalesce(c1.cls, '-') AS class_after,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(coalesce(c1.rev, 0)) AS BIGINT) AS after_revenue_usd
         FROM c0 FULL OUTER JOIN c1 ON c0.l_partkey = c1.l_partkey
         GROUP BY 1, 2""",
    "q_vintage_ramp" ->
      // first-sale month per part, rollup by months-since-first
      """WITH pm AS (
           SELECT l.l_partkey,
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
               + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)) AS BIGINT))
               AS BIGINT) AS rev
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
         f AS (SELECT l_partkey, min(m) AS m0 FROM pm GROUP BY 1)
         SELECT pm.m - f.m0 AS age_months, CAST(count(*) AS BIGINT) AS n_part_months,
           CAST(sum(pm.rev) AS BIGINT) AS revenue_usd,
           CAST(sum(pm.rev) // count(*) AS BIGINT) AS mean_usd
         FROM pm JOIN f ON f.l_partkey = pm.l_partkey GROUP BY 1""",
    "q_monthly_bands" ->
      // rank-defined lower p25/p50/p75 of daily revenue per month
      """WITH daily AS (
           SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS month,
             CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1, 2),
         r AS (SELECT month, x,
                 CAST(row_number() OVER (PARTITION BY month ORDER BY x, day) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY month) AS BIGINT) AS n
               FROM daily)
         SELECT month, max(n) AS n_days,
           max(CASE WHEN rn = (n + 3) // 4 THEN x END) AS p25_cents,
           max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS p50_cents,
           max(CASE WHEN rn = (3 * n + 3) // 4 THEN x END) AS p75_cents
         FROM r GROUP BY 1""",
    "text_readability" ->
      // #30's whitespace-token convention + the #79 regexp_count <->
      // len(regexp_extract_all) parity; e3 Flesch grid
      """WITH base AS (
           SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(lower(trim(text)), '\s+')) END AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
             CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT)
               AS n_syllables
           FROM documents)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           n_words * 1000 // n_sentences AS wps_e3,
           n_syllables * 1000 // greatest(n_words, 1) AS spw_e3,
           206835 - 1015 * n_words // n_sentences
             - 84600 * n_syllables // greatest(n_words, 1) AS flesch_e3
         FROM base""",
    "ann_pq_search" -> pqSearchOracle(pqCtes),
    "ann_opq_search" -> opqSearchOracle,
    "q_locf_fill" ->
      """WITH ev AS (
           SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
           FROM events),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         users AS (SELECT DISTINCT user_id FROM ev),
         cal AS (SELECT user_id,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
                 FROM users, bounds),
         agg AS (SELECT user_id, day, round(sum(value), 2) AS tv
                 FROM ev GROUP BY user_id, day)
         SELECT user_id, strftime(day, '%Y-%m-%d') AS day, observed,
           coalesce(last_value(tv IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             AS filled_value
         FROM (SELECT cal.user_id, cal.day, agg.tv,
                 CAST(agg.tv IS NOT NULL AS INT) AS observed
               FROM cal LEFT JOIN agg
                 ON cal.user_id = agg.user_id AND cal.day = agg.day)""",
    "q_dq_audit" ->
      """WITH o AS (
           SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nk,
             count(*) FILTER (WHERE o_totalprice <= 0) AS bad_price,
             count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                                 OR o_orderdate >= TIMESTAMP '2030-01-01') AS bad_date,
             count(*) FILTER (WHERE o_custkey IS NULL) AS null_cust
           FROM orders),
         l AS (
           SELECT count(*) AS n,
             (SELECT count(*) FROM
               (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS nk,
             count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS bad_qty,
             count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS bad_disc
           FROM lineitem),
         c AS (SELECT count(*) AS n, count(DISTINCT c_custkey) AS nk FROM customer),
         e AS (
           SELECT count(*) AS n,
             count(*) FILTER (WHERE event_type NOT IN
               ('signup','click','view','purchase','error')) AS bad_type
           FROM events),
         fo AS (SELECT count(*) AS v FROM orders o2
                WHERE NOT EXISTS (SELECT 1 FROM customer c2
                                  WHERE c2.c_custkey = o2.o_custkey)),
         fl AS (SELECT count(*) AS v FROM lineitem l2
                WHERE NOT EXISTS (SELECT 1 FROM orders o3
                                  WHERE o3.o_orderkey = l2.l_orderkey))
         SELECT table_name, rule, n_checked, n_violations,
           CAST(n_violations = 0 AS INT) AS pass
         FROM (
           SELECT 'orders' AS table_name, 'pk_unique:o_orderkey' AS rule,
             n AS n_checked, n - nk AS n_violations FROM o
           UNION ALL SELECT 'orders', 'fk:o_custkey->customer', o.n, fo.v FROM o, fo
           UNION ALL SELECT 'orders', 'not_null:o_custkey', n, null_cust FROM o
           UNION ALL SELECT 'orders', 'range:o_totalprice>0', n, bad_price FROM o
           UNION ALL SELECT 'orders', 'range:o_orderdate in [1990,2030)', n, bad_date FROM o
           UNION ALL SELECT 'lineitem', 'pk_unique:(l_orderkey,l_linenumber)', n, n - nk FROM l
           UNION ALL SELECT 'lineitem', 'fk:l_orderkey->orders', l.n, fl.v FROM l, fl
           UNION ALL SELECT 'lineitem', 'range:l_quantity in [1,50]', n, bad_qty FROM l
           UNION ALL SELECT 'lineitem', 'range:l_discount in [0,1]', n, bad_disc FROM l
           UNION ALL SELECT 'customer', 'pk_unique:c_custkey', n, n - nk FROM c
           UNION ALL SELECT 'events', 'domain:event_type', n, bad_type FROM e)""",
    "q_components" -> componentsOracle(maxRounds = 12),
    // the incremental fold's contract IS batch equality — shared oracle
    // (the #103/#138 pattern)
    "q_components_incremental" -> componentsOracle(maxRounds = 12),
    "q_ppr" -> {
      // PPR: teleport lands only on seed nodes (part % 100 = 0), the
      // vector keeps zero-rank nodes via the left join; all-nonneg
      // integer so // ≡ div
      def round(prev: String, out: String) =
        s"""$out AS MATERIALIZED (
              SELECT a.part,
                CAST((CASE WHEN a.part % 100 = 0
                      THEN 15 * 100000000 // (100 * ns.n_seeds) ELSE 0 END)
                     + (85 * coalesce(c.cs, 0)) // 100 AS BIGINT) AS r
              FROM nodes a
              LEFT JOIN (
                SELECT e.dst AS part, sum(r.r * e.w // o.wout) AS cs
                FROM edges e
                JOIN outw o ON o.src = e.src
                JOIN $prev r ON r.part = e.src
                GROUP BY e.dst) c ON c.part = a.part, ns)"""
      s"""WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS w
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         edges AS (SELECT part_a AS src, part_b AS dst, w FROM pairs
                   UNION ALL SELECT part_b, part_a, w FROM pairs),
         outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src),
         nodes AS (SELECT src AS part FROM outw),
         ns AS (SELECT count(*) AS n_seeds FROM nodes WHERE part % 100 = 0),
         r0 AS MATERIALIZED (
           SELECT part, CAST(CASE WHEN part % 100 = 0
             THEN 100000000 // ns.n_seeds ELSE 0 END AS BIGINT) AS r
           FROM nodes, ns),
         ${round("r0", "r1")}, ${round("r1", "r2")}, ${round("r2", "r3")}
         SELECT part, ppr_e8, rank FROM (
           SELECT part, r AS ppr_e8,
             CAST(row_number() OVER (ORDER BY r DESC, part) AS BIGINT) AS rank
           FROM r3)
         WHERE rank <= 50"""
    },
    "q_hits" -> {
      // two unrolled HITS iterations; each half-step is an exact
      // BIGINT weighted sum + e6 max-normalization with floor
      // division (nonneg, so // ≡ div)
      def authStep(hPrev: String, out: String) =
        s"""${out}r AS (SELECT e.part, sum(h.h * e.w) AS ar
                        FROM edges e JOIN $hPrev h ON h.cust = e.cust
                        GROUP BY e.part),
            $out AS (SELECT part,
                       CAST(ar * 1000000 // (SELECT max(ar) FROM ${out}r) AS BIGINT) AS a
                     FROM ${out}r)"""
      def hubStep(aPrev: String, out: String) =
        s"""${out}r AS (SELECT e.cust, sum(a.a * e.w) AS hr
                        FROM edges e JOIN $aPrev a ON a.part = e.part
                        GROUP BY e.cust),
            $out AS (SELECT cust,
                       CAST(hr * 1000000 // (SELECT max(hr) FROM ${out}r) AS BIGINT) AS h
                     FROM ${out}r)"""
      s"""WITH edges AS (
           SELECT o_custkey AS cust, l_partkey AS part, count(*) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS h FROM edges),
         ${authStep("h0", "a1")}, ${hubStep("a1", "h1")},
         ${authStep("h1", "a2")}, ${hubStep("a2", "h2")},
         topa AS (SELECT 'authority' AS kind, part AS node, a AS score_e6,
                    CAST(row_number() OVER (ORDER BY a DESC, part) AS BIGINT) AS rank
                  FROM a2),
         toph AS (SELECT 'hub' AS kind, cust AS node, h AS score_e6,
                    CAST(row_number() OVER (ORDER BY h DESC, cust) AS BIGINT) AS rank
                  FROM h2)
         SELECT kind, node, score_e6, rank FROM topa WHERE rank <= 20
         UNION ALL
         SELECT kind, node, score_e6, rank FROM toph WHERE rank <= 20""".stripMargin
    },
    "q_assortativity" ->
      // edge-level endpoint-degree Pearson moments in HUGEINT; the
      // r2 quotient is the factored e3×e3 form (each factor ≤ 1000 by
      // Cauchy-Schwarz, so no overflow where num² would)
      """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS w
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2
           HAVING count(*) >= 2),
         edges AS (SELECT part_a AS src, part_b AS dst FROM pairs
                   UNION ALL SELECT part_b, part_a FROM pairs),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
         xy AS (SELECT ds.deg AS x, dd.deg AS y
                FROM edges e
                JOIN deg ds ON ds.src = e.src
                JOIN deg dd ON dd.src = e.dst),
         mom AS (SELECT count(*) AS m,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy
                 FROM xy)
         SELECT m,
           CAST(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             ((abs(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
               // (CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx))
              * (abs(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
                 // (CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)))
           AS BIGINT) AS r2_signed_e6
         FROM mom""",
    "q_pagerank" -> {
      // three unrolled integer power iterations; `//` is floor division
      // on nonnegative ints = Spark's `div`
      def round(prev: String, out: String) =
        s"""$out AS (
              SELECT e.dst AS part,
                CAST(15 * 100000000 // (100 * n.n_nodes)
                     + (85 * sum(r.r * e.w // o.wout)) // 100 AS BIGINT) AS r
              FROM edges e
              JOIN outw o ON o.src = e.src
              JOIN $prev r ON r.part = e.src, n
              GROUP BY e.dst, n.n_nodes)"""
      s"""WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS w
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         edges AS (SELECT part_a AS src, part_b AS dst, w FROM pairs
                   UNION ALL SELECT part_b, part_a, w FROM pairs),
         outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src),
         n AS (SELECT count(*) AS n_nodes FROM outw),
         r0 AS (SELECT src AS part, CAST(100000000 // n_nodes AS BIGINT) AS r
                FROM outw, n),
         ${round("r0", "r1")}, ${round("r1", "r2")}, ${round("r2", "r3")}
         SELECT part, pr_e8, rank FROM (
           SELECT part, r AS pr_e8,
             CAST(row_number() OVER (ORDER BY r DESC, part) AS BIGINT) AS rank
           FROM r3)
         WHERE rank <= 50"""
    },
    "ann_ivfadc" -> ivfAdcOracle,
    "ann_ivfadc_indexed" -> ivfAdcOracle,
    "q_zorder_recluster" -> {
      // frozen-boundary delta routing replayed relationally; same
      // generated Morton terms as q_zorder_stats
      val mortonSql = (0 until 8)
        .map(i =>
          s"((ca >> $i) & 1) * ${1L << (2 * i + 1)} + ((cb >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      s"""WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                        WHERE o_orderkey % 10 <> 0),
         delta AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                   WHERE o_orderkey % 10 = 0),
         b AS (SELECT *,
                 CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS ca,
                 CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cb
               FROM base),
         z AS (SELECT *, CAST($mortonSql AS BIGINT) AS zval FROM b),
         zf AS (SELECT *, CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS BIGINT) AS file_id
                FROM z),
         cab AS (SELECT bv, bok FROM (
                   SELECT o_custkey AS bv, o_orderkey AS bok,
                     row_number() OVER (PARTITION BY ca
                       ORDER BY o_custkey DESC, o_orderkey DESC) AS rn
                   FROM b) WHERE rn = 1),
         cbb AS (SELECT bv, bok FROM (
                   SELECT o_totalprice AS bv, o_orderkey AS bok,
                     row_number() OVER (PARTITION BY cb
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
                   FROM b) WHERE rn = 1),
         fb AS (SELECT bz, bok FROM (
                  SELECT zval AS bz, o_orderkey AS bok,
                    row_number() OVER (PARTITION BY file_id
                      ORDER BY zval DESC, o_orderkey DESC) AS rn
                  FROM zf) WHERE rn = 1),
         dca AS (SELECT d.o_orderkey, least(count(c.bv), 255) AS ca
                 FROM delta d LEFT JOIN cab c
                   ON c.bv < d.o_custkey OR (c.bv = d.o_custkey AND c.bok < d.o_orderkey)
                 GROUP BY d.o_orderkey),
         dcb AS (SELECT d.o_orderkey, least(count(c.bv), 255) AS cb
                 FROM delta d LEFT JOIN cbb c
                   ON c.bv < d.o_totalprice OR (c.bv = d.o_totalprice AND c.bok < d.o_orderkey)
                 GROUP BY d.o_orderkey),
         dz AS (SELECT d.o_orderkey, dca.ca, dcb.cb, CAST($mortonSql AS BIGINT) AS zval
                FROM delta d JOIN dca USING (o_orderkey) JOIN dcb USING (o_orderkey)),
         df AS (SELECT z.o_orderkey, z.ca, z.cb, z.zval,
                  least(count(f.bz) + 1, 32) AS file_id
                FROM dz z LEFT JOIN fb f
                  ON f.bz < z.zval OR (f.bz = z.zval AND f.bok < z.o_orderkey)
                GROUP BY z.o_orderkey, z.ca, z.cb, z.zval),
         tagged AS (SELECT file_id, ca, cb, 0 AS is_delta FROM zf
                    UNION ALL SELECT file_id, ca, cb, 1 AS is_delta FROM df),
         nb AS (SELECT count(*) AS n_base_total FROM base)
         SELECT file_id,
           CAST(sum(1 - is_delta) AS BIGINT) AS n_base,
           CAST(sum(is_delta) AS BIGINT) AS n_delta,
           count(*) AS n_total,
           min(ca) AS min_cust_b, max(ca) AS max_cust_b,
           min(cb) AS min_price_b, max(cb) AS max_price_b,
           CAST(count(*) > (3 * ((n_base_total + 31) // 32)) // 2 AS INT) AS needs_rewrite
         FROM tagged, nb
         GROUP BY file_id, n_base_total"""
    },
    "cdc_scd3" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         w AS (
           SELECT *,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM c)
         SELECT user_id, value AS current_value, prev_value,
           ts AS last_ts, event_id AS last_event_id
         FROM w WHERE rn = 1 AND op <> 'DELETE'""",
    "cdc_scd2_lookup" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         sd AS (
           SELECT user_id, valid_from, event_id, change_type, value FROM (
             SELECT user_id, ts AS valid_from, event_id, op AS change_type, value,
               row_number() OVER (PARTITION BY user_id, ts
                 ORDER BY event_id DESC) AS rn
             FROM c) WHERE rn = 1),
         o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_ts FROM orders)
         SELECT o.o_orderkey, o.o_custkey, o.o_ts,
           sd.event_id AS dim_event_id, sd.change_type AS dim_change_type,
           sd.value AS dim_value
         FROM o ASOF LEFT JOIN sd
           ON sd.user_id = o.o_custkey AND o.o_ts >= sd.valid_from""",
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_c
         FROM lineitem l
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3')
         GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
         ORDER BY supp_nation, cust_nation, l_year""",
    "q8_market_share" ->
      """SELECT o_year,
           round(CAST(nation_rev_c AS DOUBLE) / total_rev_c, 4) AS mkt_share
         FROM (
           SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
               THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_rev_c,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS total_rev_c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = n2.n_regionkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
           WHERE r.r_name = 'ASIA'
           GROUP BY year(o.o_orderdate))
         ORDER BY o_year""",
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_c
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
         WHERE l.l_returnflag = 'R'
           AND o.o_orderdate >= TIMESTAMP '1997-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-07-01'
         GROUP BY c.c_custkey, c.c_name, n.n_name
         ORDER BY revenue_c DESC, c.c_custkey
         LIMIT 20""",
    "q12_ship_priority" ->
      """SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
         GROUP BY l.l_returnflag
         ORDER BY l.l_returnflag""",
    "q14_promo_share" ->
      """SELECT round(100.0 * CAST(promo_c AS DOUBLE) / total_c, 4) AS promo_share
         FROM (
           SELECT
             CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS promo_c,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS total_c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
             AND l.l_shipdate < TIMESTAMP '1999-01-01')""",
    "q16_supplier_relationship" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand <> 'Brand#1'
           AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
           AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_suppkey % 10 = 0)
         GROUP BY p.p_brand, p.p_type, p.p_size
         ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
         LIMIT 20""",
    "q6_forecast_revenue" ->
      """SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_c
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q9_product_profit" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                  - CAST(floor(p.p_retailprice * l.l_quantity * 0.8 * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS profit_c
         FROM lineitem l
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_type IN ('ECONOMY', 'STANDARD')
         GROUP BY n.n_name, year(o.o_orderdate)
         ORDER BY nation, o_year""",
    "q18_large_volume" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2
                                GROUP BY l2.l_orderkey
                                HAVING sum(l2.l_quantity) > 300)
         GROUP BY c.c_custkey, c.c_name, o.o_orderkey
         ORDER BY total_qty DESC, o.o_orderkey
         LIMIT 20""",
    "q_weighted_median" ->
      // order-count-weighted lower median of customer balance per
      // nation: winner row's running-weight interval (cum-w, cum]
      // contains T = ceil(W/2)
      """WITH w AS (SELECT o_custkey, count(*) AS w FROM orders GROUP BY 1),
         b AS (
           SELECT c_nationkey, c_custkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c, w.w
           FROM customer JOIN w ON c_custkey = o_custkey),
         c AS (
           SELECT *,
             CAST(sum(w) OVER (PARTITION BY c_nationkey
               ORDER BY bal_c, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(w) OVER (PARTITION BY c_nationkey) AS BIGINT) AS wtot
           FROM b)
         SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, wtot AS w_total,
           bal_c AS median_bal_c
         FROM c
         WHERE cum - w < (wtot + 1) // 2 AND (wtot + 1) // 2 <= cum""",
    "text_heavy_hitters" ->
      // batch Misra-Gries merge replay: per-shard top-16 counters each
      // reduced by the shard's 17th count, summed, reduced once more by
      // the merged 17th — the oracle replays the merged counters
      // bit-exactly and emits the constant-1 contract flag the theorem
      // demands (Spark emits the measured check)
      """WITH tok AS (
           SELECT doc_id % 4 AS shard,
             unnest(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         ps AS (SELECT shard, term, count(*) AS c FROM tok GROUP BY 1, 2),
         rk AS (SELECT *, row_number() OVER (PARTITION BY shard
                  ORDER BY c DESC, term) AS rk FROM ps),
         dec AS (SELECT shard, c AS dec FROM rk WHERE rk = 17),
         summ AS (
           SELECT r.shard, r.term, r.c - coalesce(d.dec, 0) AS cnt
           FROM rk r LEFT JOIN dec d ON r.shard = d.shard
           WHERE r.rk <= 16 AND r.c - coalesce(d.dec, 0) > 0),
         m0 AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS m FROM summ GROUP BY 1),
         mr AS (SELECT *, row_number() OVER (ORDER BY m DESC, term) AS rk FROM m0),
         mdec AS (SELECT coalesce(max(m), 0) AS mdec FROM mr WHERE rk = 17),
         mf AS (SELECT term, m - mdec AS mg FROM mr, mdec
                WHERE rk <= 16 AND m - mdec > 0),
         ex AS (SELECT term, count(*) AS n_exact FROM tok GROUP BY 1),
         nt AS (SELECT count(*) AS n_total FROM tok),
         t10 AS (
           SELECT term, n_exact,
             CAST(row_number() OVER (ORDER BY n_exact DESC, term) AS BIGINT) AS rank
           FROM ex QUALIFY rank <= 10)
         SELECT rank, t10.term, n_exact, coalesce(mf.mg, 0) AS mg_count,
           CAST(n_exact * 17 > n_total AS INT) AS guaranteed,
           1 AS mg_ok
         FROM t10 LEFT JOIN mf ON t10.term = mf.term, nt""",
    "dedup_snm" ->
      // sorted-neighborhood replay: global rank under the 24-char
      // normalized-prefix key, window pairs at rank distance 1..4,
      // shingle-hash Jaccard >= 0.3 (the hierarchical Spark rank is
      // identical to the plain row_number by construction)
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         keyed AS (
           SELECT doc_id,
             substr(array_to_string(tok, ' '), 1, 24) AS k,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS sh
           FROM corpus),
         hs AS (
           SELECT doc_id, k,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in sh]) AS hs
           FROM keyed),
         rk AS (
           SELECT *, CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rn
           FROM hs),
         pairs AS (
           SELECT a.doc_id AS id_l, b.doc_id AS id_r, d.d AS dist,
             a.hs AS hs_l, b.hs AS hs_r
           FROM rk a
           CROSS JOIN range(1, 5) d(d)
           JOIN rk b ON b.rn = a.rn + d.d)
         SELECT * FROM (
           SELECT least(id_l, id_r) AS doc_a, greatest(id_l, id_r) AS doc_b,
             dist,
             round(CAST(len(list_intersect(hs_l, hs_r)) AS DOUBLE)
               / len(list_distinct(hs_l || hs_r)), 4) AS jaccard
           FROM pairs)
         WHERE jaccard >= 0.3""",
    "text_sparse_sim" ->
      // inverted-index cosine replay: integer tf dot products over the
      // df-pruned 3-token shingle vocabulary, one sqrt on the exact
      // integer norm product, rank on the raw double with
      // (doc_a, doc_b) tiebreak
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         td AS (
           SELECT doc_id,
             unnest(CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]
                    END) AS term
           FROM toks0),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM td GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         kept AS (
           SELECT tf.doc_id, tf.term, tf.tf
           FROM tf JOIN df ON tf.term = df.term
           WHERE df.df BETWEEN 2 AND 100),
         norms AS (
           SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nrm2
           FROM kept GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot, count(*) AS n_shared
           FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         c AS (
           SELECT doc_a, doc_b, n_shared, dot,
             dot / sqrt(CAST(na.nrm2 * nb.nrm2 AS DOUBLE)) AS cr
           FROM pairs
           JOIN norms na ON doc_a = na.doc_id
           JOIN norms nb ON doc_b = nb.doc_id)
         SELECT doc_a, doc_b, n_shared, dot, round(cr, 6) AS cosine
         FROM c
         QUALIFY row_number() OVER (ORDER BY cr DESC, doc_a, doc_b) <= 50""",
    "q_top_p_select" ->
      // nucleus selection replay: e4 quality ordering per source,
      // integer token cumsum, cut at T = ceil(0.9 * W)
      """WITH t AS (
           SELECT doc_id, source, text,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents),
         q AS (
           SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS ntok,
             CAST(floor(least(1.0, len(toks) / 100.0) *
               (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END) *
               10000.0 + 0.5) AS BIGINT) AS q_e4
           FROM t),
         c AS (
           SELECT *,
             CAST(sum(ntok) OVER (PARTITION BY source
               ORDER BY q_e4 DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(ntok) OVER (PARTITION BY source) AS BIGINT) AS wtot,
             count(*) OVER (PARTITION BY source) AS ndocs
           FROM q)
         SELECT source, CAST(max(ndocs) AS BIGINT) AS n_docs, count(*) AS n_sel,
           max(wtot) AS tok_total, CAST(sum(ntok) AS BIGINT) AS tok_sel,
           min(q_e4) AS cut_q_e4
         FROM c
         WHERE cum - ntok < (9 * wtot + 9) // 10
         GROUP BY source""",
    "q_event_transitions" ->
      // first-order Markov transitions per user timeline; p on the e6
      // integer grid by integer division
      """WITH e AS (
           SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n_trans
           FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         f AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
               FROM t GROUP BY 1)
         SELECT from_type, to_type, n_trans, n_from,
           CAST((n_trans * 1000000) // n_from AS BIGINT) AS p_e6
         FROM t JOIN f USING (from_type)""",
    "q_source_diversity" ->
      // Simpson on the e6 integer grid; Shannon via e6-quantized
      // per-source contributions summed as integers (the #119
      // discipline)
      """WITH per AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, count(*) AS s FROM per),
         terms AS (
           SELECT per.n_s, tot.n, tot.s,
             CAST(floor((CAST(n_s AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / n_s) * 1000000 + 0.5) AS BIGINT) AS h_e6,
             n_s * (n_s - 1) AS st
           FROM per, tot)
         SELECT n AS n_docs, s AS n_sources,
           CAST((CAST(sum(st) AS BIGINT) * 1000000) // (max(n) * (max(n) - 1)) AS BIGINT)
             AS simpson_e6,
           CAST(sum(h_e6) AS BIGINT) / 1000000.0 AS shannon_bits
         FROM terms GROUP BY n, s""",
    "q_triangles" ->
      // degree-oriented node-iterator replay: basket pairs -> edges at
      // co-occurrence >= 2 -> (deg, id) orientation -> wedges from a
      // common source -> equi-close on the ordered pair; EXISTS keeps
      // wedge multiplicity (wedge rows carry their source u)
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa, pb FROM pr WHERE n >= 2),
         d AS (
           SELECT node, count(*) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         oe AS (
           SELECT CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pa ELSE pb END AS u,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pb ELSE pa END AS v,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN db.deg ELSE da.deg END AS dv
           FROM e JOIN d da ON da.node = e.pa JOIN d db ON db.node = e.pb),
         w AS (
           SELECT a.u,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN a.v ELSE b.v END AS lo,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN b.v ELSE a.v END AS hi
           FROM oe a JOIN oe b ON a.u = b.u AND a.v < b.v),
         tri AS (
           SELECT count(*) AS n_triangles FROM w
           WHERE EXISTS (SELECT 1 FROM oe WHERE oe.u = w.lo AND oe.v = w.hi)),
         dd AS (
           SELECT count(*) AS n_nodes,
             CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS open_wedges
           FROM d),
         ee AS (SELECT count(*) AS n_edges FROM e),
         ww AS (SELECT count(*) AS n_wedges FROM w)
         SELECT n_nodes, n_edges, open_wedges, n_wedges, n_triangles,
           CAST((3 * n_triangles * 1000000) // greatest(open_wedges, 1) AS BIGINT) AS cc_e6
         FROM dd, ee, ww, tri""",
    "q_rfm" ->
      // within-nation quintile scores via rank-defined banding
      // ((rn-1)*5) div n + 1 — no percentile interpolation anywhere
      """WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders),
         per AS (
           SELECT o_custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_c
           FROM orders GROUP BY 1),
         base AS (
           SELECT p.o_custkey AS c_custkey,
             CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
             CAST(date_diff('day', p.last_order, ref.ref) AS BIGINT) AS recency_days,
             p.frequency, p.monetary_c
           FROM per p JOIN customer c ON c.c_custkey = p.o_custkey, ref),
         r AS (
           SELECT *,
             count(*) OVER (PARTITION BY c_nationkey) AS n_nat,
             CAST(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY recency_days DESC, c_custkey) AS BIGINT) AS rn_r,
             CAST(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY frequency, c_custkey) AS BIGINT) AS rn_f,
             CAST(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY monetary_c, c_custkey) AS BIGINT) AS rn_m
           FROM base)
         SELECT c_custkey, c_nationkey, recency_days, frequency, monetary_c,
           ((rn_r - 1) * 5) // n_nat + 1 AS r_score,
           ((rn_f - 1) * 5) // n_nat + 1 AS f_score,
           ((rn_m - 1) * 5) // n_nat + 1 AS m_score,
           (((rn_r - 1) * 5) // n_nat + 1) * 100
             + (((rn_f - 1) * 5) // n_nat + 1) * 10
             + (((rn_m - 1) * 5) // n_nat + 1) AS rfm_code
         FROM r""",
    "q_attribution" ->
      // U-shape position credit in exact basis points: 40/20/40 with
      // the middle share Hamilton-apportioned so each conversion
      // telescopes to exactly 10000
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
         conv AS (
           SELECT user_id, ts_us AS conv_us, event_id AS conv_id
           FROM ev WHERE event_type = 'purchase'),
         j AS (
           SELECT conv.conv_id, t.event_id, t.event_type, t.ts_us
           FROM conv JOIN ev t
             ON t.user_id = conv.user_id AND t.event_type <> 'purchase'
           WHERE t.ts_us >= conv.conv_us - 86400000000 AND t.ts_us < conv.conv_us),
         r AS (
           SELECT *,
             CAST(row_number() OVER (PARTITION BY conv_id
               ORDER BY ts_us, event_id) AS BIGINT) AS rn,
             count(*) OVER (PARTITION BY conv_id) AS n
           FROM j),
         c AS (
           SELECT event_type, conv_id,
             CASE WHEN n = 1 THEN 10000
                  WHEN n = 2 THEN 5000
                  WHEN rn = 1 OR rn = n THEN 4000
                  ELSE 2000 // (n - 2)
                       + (CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END)
             END AS bp
           FROM r)
         SELECT event_type, count(*) AS n_touch,
           count(DISTINCT conv_id) AS n_conversions,
           CAST(sum(bp) AS BIGINT) AS credit_bp
         FROM c GROUP BY 1""",
    "q_basket_lift" ->
      // market-basket rule metrics on the e6 integer grid; top-25 by
      // (lift, pair)
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM bp),
         ic AS (SELECT l_partkey, count(*) AS c_item FROM bp GROUP BY 1),
         pr AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_ab
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         m AS (
           SELECT part_a, part_b, c_ab, ca.c_item AS c_a, cb.c_item AS c_b,
             (c_ab * 1000000) // n_baskets AS support_e6,
             (c_ab * 1000000) // ca.c_item AS conf_ab_e6,
             (c_ab * 1000000) // cb.c_item AS conf_ba_e6,
             (c_ab * n_baskets * 1000000) // (ca.c_item * cb.c_item) AS lift_e6
           FROM pr
           JOIN ic ca ON ca.l_partkey = pr.part_a
           JOIN ic cb ON cb.l_partkey = pr.part_b, n
           WHERE c_ab >= 2)
         SELECT part_a, part_b, c_ab, c_a, c_b,
           support_e6, conf_ab_e6, conf_ba_e6, lift_e6
         FROM m
         QUALIFY row_number() OVER (ORDER BY lift_e6 DESC, part_a, part_b) <= 25""",
    "q_gini" ->
      // sorted-rank Gini identity on whole-dollar spend; the e6 scale
      // runs through HUGEINT (Spark side: DECIMAL(38,0)) — exact both
      """WITH per AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         r AS (
           SELECT x,
             CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
           FROM per),
         a AS (
           SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(i * x) AS BIGINT) AS six, max(x) AS mx
           FROM r)
         SELECT n AS n_customers, sx AS total_usd,
           CAST((CAST(2 * six - (n + 1) * sx AS HUGEINT) * 1000000)
             // CAST(n * sx AS HUGEINT) AS BIGINT) AS gini_e6,
           CAST((mx * 1000000) // sx AS BIGINT) AS top1_share_e6
         FROM a""",
    "text_novelty" ->
      // corpus-unique shingle fraction per document on the e6 grid
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]
               END)) AS s
           FROM toks0),
         df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
         SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
             AS novelty_e6
         FROM sh JOIN df ON sh.s = df.s
         GROUP BY doc_id""",
    "q_changepoint" ->
      // division-free CUSUM: trajectory scaled by n preserves the
      // argmax; changepoint = (|S| desc, day asc) winner per type
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, CAST(sum(c) AS BIGINT) AS t, count(*) AS n_days
           FROM daily GROUP BY 1),
         s AS (
           SELECT d.event_type, d.day, t.n_days, t.t,
             CAST(sum(t.n_days * d.c - t.t) OVER (PARTITION BY d.event_type
               ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
           FROM daily d JOIN t USING (event_type))
         SELECT event_type, n_days, t AS total_events, day AS cp_day_idx,
           s AS s_at_cp, abs(s) AS s_abs
         FROM s
         QUALIFY row_number() OVER (PARTITION BY event_type
           ORDER BY abs(s) DESC, day) = 1""",
    "cdc_sequence_audit" ->
      // liveness via the integer marker trick: last INSERT/DELETE row's
      // rn*2+isInsert, max over preceding rows, parity = live
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rn
           FROM c),
         m AS (
           SELECT *, max(CASE WHEN op <> 'UPDATE'
               THEN rn * 2 + CASE WHEN op = 'INSERT' THEN 1 ELSE 0 END END)
             OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lm
           FROM r)
         SELECT op,
           CASE WHEN op = 'INSERT' AND lm IS NOT NULL AND lm % 2 = 1
                  THEN 'double_insert'
                WHEN op = 'UPDATE' AND (lm IS NULL OR lm % 2 = 0)
                  THEN 'update_while_absent'
                WHEN op = 'DELETE' AND (lm IS NULL OR lm % 2 = 0)
                  THEN 'delete_while_absent'
                ELSE 'ok' END AS violation,
           count(*) AS n, count(DISTINCT user_id) AS n_keys
         FROM m GROUP BY 1, 2""",
    "cdc_ivm_agg" ->
      // the INDEPENDENT from-scratch recompute: a hash-MATCH against
      // the Spark side's base+delta maintenance IS the IVM theorem
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         s AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rk
           FROM c)
         SELECT user_id % 16 AS bucket, count(*) AS n_live,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
         FROM s WHERE rk = 1 AND op <> 'DELETE'
         GROUP BY 1""",
    "q_zonemap_prune" -> {
      // per-file [min,max] envelopes vs a 90-day window; a file is
      // scanned iff the envelope intersects — the parquet row-group test
      def layout(name: String, fileExpr: String) =
        s"""SELECT '$name' AS layout, count(*) AS n_files,
              CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN 1 ELSE 0 END) AS BIGINT)
                AS files_scanned,
              CAST(sum(n_rows) AS BIGINT) AS rows_total,
              CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN n_rows ELSE 0 END) AS BIGINT)
                AS rows_scanned,
              CAST(sum(n_match) AS BIGINT) AS rows_matched
            FROM (
              SELECT $fileExpr AS file_id, min(d) AS mn, max(d) AS mx,
                count(*) AS n_rows,
                CAST(sum(CASE WHEN d >= lo AND d < hi THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_match,
                any_value(lo) AS lo, any_value(hi) AS hi
              FROM r GROUP BY 1)"""
      s"""WITH o AS (
           SELECT o_orderkey,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d
           FROM orders),
         b AS (SELECT min(d) AS d0, min(d) + 400 AS lo, min(d) + 490 AS hi FROM o),
         r AS (SELECT * FROM o, b)
         ${layout("insert_order", "o_orderkey // 4096")}
         UNION ALL
         ${layout("date_clustered", "(d - d0) // 32")}"""
    },
    "cdc_state_ttl" ->
      """WITH lastk AS (
           SELECT user_id, max(epoch_us(ts)) AS last_ts, count(*) AS n_changes
           FROM events GROUP BY user_id),
         h AS (SELECT max(last_ts) AS head_ts FROM lastk),
         x AS (
           SELECT hd.horizon_days,
             CASE WHEN last_ts >= head_ts - hd.horizon_days * 86400000000
               THEN 1 ELSE 0 END AS retained,
             n_changes
           FROM lastk, h, (VALUES (7), (30), (90)) hd(horizon_days))
         SELECT CAST(horizon_days AS BIGINT) AS horizon_days,
           CAST(sum(retained) AS BIGINT) AS n_keys_retained,
           CAST(sum(1 - retained) AS BIGINT) AS n_keys_expired,
           CAST(sum(retained * n_changes) AS BIGINT) AS n_changes_retained
         FROM x GROUP BY 1""",
    "cdc_watermark_lateness" ->
      // the flat global prefix-max over the planted-jitter arrival
      // order: the Spark side's sharded hierarchy must equal this
      // exactly
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts FROM events),
         a AS (
           SELECT *, ts + ('0x' || substr(md5('graft-wm:' || event_id), 1, 15))::BIGINT
             % 7200000001 AS arr
           FROM e),
         p AS (
           SELECT ts, max(ts) OVER (ORDER BY arr, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
           FROM a),
         l AS (
           SELECT CASE WHEN prior IS NULL OR prior <= ts THEN 0
                       ELSE prior - ts END AS lat
           FROM p)
         SELECT CASE WHEN lat = 0 THEN 'on_time'
                     WHEN lat <= 60000000 THEN 'under_1m'
                     WHEN lat <= 3600000000 THEN 'under_1h'
                     WHEN lat <= 86400000000 THEN 'under_1d'
                     ELSE 'over_1d' END AS bucket,
           count(*) AS n_events, CAST(max(lat) AS BIGINT) AS max_lateness_us
         FROM l GROUP BY 1""",
    "q_chi2_assoc" ->
      // HUGEINT replay of the DECIMAL(38,0) floor divisions (the
      // q_gini discipline): (n*O - R*C)^2 * 1e6 // (n*R*C) per cell
      """WITH cells AS (
           SELECT o_orderstatus, o_orderpriority, count(*) AS o
           FROM orders GROUP BY 1, 2),
         rm AS (SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS r
                FROM cells GROUP BY 1),
         cm AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS c
                FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         x AS (
           SELECT cells.o_orderstatus, cells.o_orderpriority, o AS n_cell,
             CAST((CAST(r AS HUGEINT) * c * 1000000) // CAST(n AS HUGEINT)
               AS BIGINT) AS expected_e6,
             CAST((CAST(n * o - r * c AS HUGEINT) * CAST(n * o - r * c AS HUGEINT)
                   * 1000000)
               // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS contrib_e6
           FROM cells JOIN rm USING (o_orderstatus)
             JOIN cm USING (o_orderpriority), t)
         SELECT o_orderstatus, o_orderpriority, n_cell, expected_e6, contrib_e6,
           CAST(sum(contrib_e6) OVER () AS BIGINT) AS chi2_total_e6
         FROM x""",
    // KS per source (the #190 grid) -> truncated Kolmogorov p (3
    // signed e6-floored terms, clamped) -> BH step-up with the
    // threshold compare cross-multiplied to exact integers
    "text_bh_fdr" ->
      """WITH cont AS (
           SELECT source, n_chars AS len, count(*) AS c_sl
           FROM documents GROUP BY 1, 2),
         bylen AS (SELECT len, CAST(sum(c_sl) AS BIGINT) AS c_l FROM cont GROUP BY 1),
         bysrc AS (SELECT source, CAST(sum(c_sl) AS BIGINT) AS n_s FROM cont GROUP BY 1),
         tot AS (SELECT CAST(sum(c_sl) AS BIGINT) AS n FROM cont),
         grid AS (
           SELECT s.source, l.len, s.n_s, l.c_l, COALESCE(c.c_sl, 0) AS c_sl
           FROM bysrc s CROSS JOIN bylen l
           LEFT JOIN cont c ON c.source = s.source AND c.len = l.len),
         cum AS (
           SELECT source, len, n_s,
             sum(c_sl) OVER (PARTITION BY source ORDER BY len) AS ca,
             sum(c_l) OVER (PARTITION BY source ORDER BY len) AS c_all
           FROM grid),
         scored AS (
           SELECT source, len, n_s, n - n_s AS nb,
             abs(CAST(ca AS HUGEINT) * (n - n_s)
                 - CAST(c_all - ca AS HUGEINT) * n_s) AS num
           FROM cum, tot),
         ks AS (
           SELECT source, n_s AS n_docs,
             CAST((num * 1000000) // (CAST(n_s AS HUGEINT) * nb) AS BIGINT) AS ks_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY num DESC, len) AS rk FROM scored)
           WHERE rk = 1),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ks),
         withp AS (
           SELECT source, n_docs, ks_e6,
             greatest(0, least(1000000,
                 CAST(floor(2 * exp(-2.0 * lam2) * 1e6 + 0.5) AS BIGINT)
               - CAST(floor(2 * exp(-8.0 * lam2) * 1e6 + 0.5) AS BIGINT)
               + CAST(floor(2 * exp(-18.0 * lam2) * 1e6 + 0.5) AS BIGINT))) AS p_e6
           FROM (SELECT source, n_docs, ks_e6,
                   (CAST(ks_e6 AS DOUBLE) / 1e6) * (CAST(ks_e6 AS DOUBLE) / 1e6)
                   * (CAST(n_docs AS DOUBLE) * (n - n_docs) / n) AS lam2
                 FROM ks, tot)),
         ranked AS (
           SELECT *, CAST(row_number() OVER (ORDER BY p_e6, source) AS BIGINT) AS bh_rank,
             CASE WHEN p_e6 * m <= CAST(row_number() OVER (ORDER BY p_e6, source) AS BIGINT)
                       * 50000 THEN 1 ELSE 0 END AS passes
           FROM withp, mm)
         SELECT source, n_docs, ks_e6, p_e6, bh_rank,
           CAST(bh_rank <= max(CASE WHEN passes = 1 THEN bh_rank ELSE 0 END) OVER ()
             AS BIGINT) AS rejected
         FROM ranked""",
    "text_ks_drift" ->
      // Cross-multiplied two-sample KS on the (source × distinct
      // length) grid; HUGEINT replays the DECIMAL(38,0) floor div.
      """WITH cont AS (
           SELECT source, n_chars AS len, count(*) AS c_sl
           FROM documents GROUP BY 1, 2),
         bylen AS (SELECT len, CAST(sum(c_sl) AS BIGINT) AS c_l FROM cont GROUP BY 1),
         bysrc AS (SELECT source, CAST(sum(c_sl) AS BIGINT) AS n_s FROM cont GROUP BY 1),
         tot AS (SELECT CAST(sum(c_sl) AS BIGINT) AS n FROM cont),
         grid AS (
           SELECT s.source, l.len, s.n_s, l.c_l, COALESCE(c.c_sl, 0) AS c_sl
           FROM bysrc s CROSS JOIN bylen l
           LEFT JOIN cont c ON c.source = s.source AND c.len = l.len),
         cum AS (
           SELECT source, len, n_s,
             sum(c_sl) OVER (PARTITION BY source ORDER BY len) AS ca,
             sum(c_l) OVER (PARTITION BY source ORDER BY len) AS c_all
           FROM grid),
         scored AS (
           SELECT source, len, n_s, n - n_s AS nb,
             abs(CAST(ca AS HUGEINT) * (n - n_s)
                 - CAST(c_all - ca AS HUGEINT) * n_s) AS num
           FROM cum, tot),
         best AS (
           SELECT source, len, n_s, nb, num,
             row_number() OVER (PARTITION BY source ORDER BY num DESC, len) AS rk
           FROM scored)
         SELECT source, n_s AS n_docs,
           CAST((num * 1000000) // (CAST(n_s AS HUGEINT) * nb) AS BIGINT) AS ks_e6,
           len AS at_len
         FROM best WHERE rk = 1""",
    "q_abc_pareto" ->
      // FLAT global-window replay of the hierarchical rank/cumsum —
      // the hash-MATCH proves the shard decomposition.
      """WITH rev AS (
           SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)) AS BIGINT))
               AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM rev),
         ranked AS (
           SELECT rev, sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
           FROM rev),
         classed AS (
           SELECT rev,
             CASE
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 800000
                 THEN 'A'
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 950000
                 THEN 'B'
               ELSE 'C' END AS abc_class
           FROM ranked, t)
         SELECT abc_class, count(*) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS class_revenue_usd,
           CAST((CAST(sum(rev) AS HUGEINT) * 1000000) // max(t) AS BIGINT)
             AS class_share_e6
         FROM classed, t GROUP BY 1""",
    "q_skyline" ->
      // Quadratic NOT-EXISTS dominance replay of the grid-pruned
      // staircase plan — the hash-MATCH proves the pruning is lossless.
      """WITH pts AS (
           SELECT p_partkey,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS p_size
           FROM part)
         SELECT p.p_partkey, p.price_c, p.p_size
         FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.price_c <= p.price_c AND q.p_size <= p.p_size
             AND (q.price_c < p.price_c OR q.p_size < p.p_size))""",
    "q_rolling_mau" ->
      // Self-join-per-day replay of the bounded 7-way cover explode.
      """WITH pres AS (
           SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
           FROM events),
         days AS (SELECT DISTINCT day AS target_day FROM pres)
         SELECT d.target_day,
           count(DISTINCT p.user_id) AS n_active_7d
         FROM days d
         JOIN pres p ON p.day BETWEEN d.target_day - 6 AND d.target_day
         GROUP BY 1""",
    "cdc_scd2_align" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         h AS (SELECT max(ts) + 1 AS h FROM ch),
         va AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             value AS acct_value
           FROM ch
           WHERE op = 'INSERT' OR (op = 'UPDATE' AND event_id % 2 = 0)),
         vb AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             value AS engagement_value
           FROM ch WHERE op = 'UPDATE' AND event_id % 2 = 1)
         SELECT a.user_id,
           greatest(a.valid_from, b.valid_from) AS seg_from,
           least(a.valid_to, b.valid_to) AS seg_to,
           a.acct_value, b.engagement_value
         FROM va a
         JOIN vb b ON a.user_id = b.user_id
           AND a.valid_from < b.valid_to AND b.valid_from < a.valid_to""",
    "q_event_regex" ->
      """WITH seqs AS (
           SELECT user_id,
             string_agg(
               CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
                    WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
                    ELSE 'e' END,
               '' ORDER BY ts, event_id) AS seq
           FROM events GROUP BY 1)
         SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT)
             AS n_browse_to_buy
         FROM seqs""",
    "q_ewma" ->
      // Flat band-join replay of the cover-explode; all-positive cents,
      // so DuckDB // and Spark div agree on the quotient.
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
         SELECT a.event_type, a.day,
           CAST(sum(b.c * (CAST(1 AS BIGINT) << CAST(15 - (a.day - b.day) AS INT)))
             AS BIGINT) AS num,
           CAST(sum(CAST(1 AS BIGINT) << CAST(15 - (a.day - b.day) AS INT))
             AS BIGINT) AS den,
           CAST(sum(b.c * (CAST(1 AS BIGINT) << CAST(15 - (a.day - b.day) AS INT)))
             // sum(CAST(1 AS BIGINT) << CAST(15 - (a.day - b.day) AS INT))
             AS BIGINT) AS ewma_cents
         FROM daily a
         JOIN daily b ON b.event_type = a.event_type
           AND b.day BETWEEN a.day - 15 AND a.day
         GROUP BY 1, 2""",
    "text_hapax" ->
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, count(*) AS c FROM td GROUP BY 1, 2)
         SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
           CAST(count(*) FILTER (c = 2) AS BIGINT) AS n_dis,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST((count(*) FILTER (c = 1)) * 1000000 // count(*) AS BIGINT)
             AS hapax_rate_e6
         FROM tc GROUP BY 1""",
    "q_corpus_checksum" ->
      """WITH d AS (
           SELECT source, n_chars,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
           FROM documents),
         per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(h & 1073741823) AS BIGINT) AS digest_lo,
             CAST(sum(h >> 30) AS BIGINT) AS digest_hi
           FROM d GROUP BY 1)
         SELECT source, n_docs, total_chars, digest_lo, digest_hi FROM per
         UNION ALL
         SELECT '__all__', CAST(sum(n_docs) AS BIGINT),
           CAST(sum(total_chars) AS BIGINT), CAST(sum(digest_lo) AS BIGINT),
           CAST(sum(digest_hi) AS BIGINT)
         FROM per""",
    "mm_phash_neardup" ->
      // Full relational replay of the block-hash → band → Hamming plan.
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 3000000,
             list_concat(['reenc0'], tok[2:len(tok)])
           FROM toks0 WHERE doc_id % 6 = 0),
         ph AS (
           SELECT doc_id,
             CAST(list_sum([
               CASE WHEN ((i+1) * len(tok)) // 15 - (i * len(tok)) // 15 = 0 THEN 0
                 ELSE (('0x' || substr(md5('graft-ph:' || array_to_string(
                        tok[(i * len(tok)) // 15 + 1:((i+1) * len(tok)) // 15], ' ')),
                        1, 15))::BIGINT
                       & 15) * (CAST(1 AS BIGINT) << (i * 4))
               END for i in range(0, 15)]) AS BIGINT) AS ph
           FROM corpus),
         bands AS (
           SELECT doc_id, ph, r.b,
             (ph // (CAST(1 AS BIGINT) << (r.b * 15))) % 32768 AS v
           FROM ph, (SELECT unnest(range(0, 4)) AS b) r),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ph AS ph_a, b.ph AS ph_b
           FROM bands a
           JOIN bands b ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 12""",
    "q_kcore" -> kcoreOracle(k = 3, maxRounds = 16),
    "q_ktruss" -> ktrussOracle(k = 3, maxRounds = 8),
    "q_betweenness" -> betweennessOracle(seedMod = 250, depth = 3, topK = 100),
    "q_betweenness_eval" ->
      betweennessEvalOracle(seedMod = 250, depth = 3, refSeedMod = 50, refDepth = 4),
    "q_closeness" -> closenessOracle(seedMod = 250, depth = 3, topK = 100),
    "q_croston" -> {
      // identical sign-factored dyadic two-track trajectory as a
      // per-part recursive CTE (the q_holt replay shape)
      def tq(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) // 4) ELSE ($a) // 4 END)"
      s"""WITH dd AS (
           SELECT l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM lineitem GROUP BY 1, 2),
         idx AS (
           SELECT l_partkey, day, y,
             CAST(row_number() OVER (PARTITION BY l_partkey ORDER BY day) AS BIGINT) AS i
           FROM dd),
         rec AS (
           WITH RECURSIVE h(l_partkey, i, day, q, z, p) AS (
             SELECT l_partkey, i, day, y, y, CAST(1 AS BIGINT) FROM idx WHERE i = 1
             UNION ALL
             SELECT s.l_partkey, s.i, s.day, s.y,
               h.z + ${tq("s.y - h.z")},
               h.p + ${tq("(s.day - h.day) - h.p")}
             FROM idx s JOIN h ON s.l_partkey = h.l_partkey AND s.i = h.i + 1)
           SELECT * FROM h)
         SELECT l_partkey, day, q AS demand_qty, z AS z_size, p AS p_interval,
           CAST(CAST(z AS HUGEINT) * 1000 // p AS BIGINT) AS rate_e3
         FROM rec"""
    },
    "q_linkpred_backtest" ->
      // #283's scorer replayed on the train half of the #286 calendar
      // split; precision@K vs pairs newly co-occurring in test
      s"""WITH od AS (
           SELECT o_orderkey AS l_orderkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS day
           FROM orders),
         m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM od),
         li AS (SELECT l.l_orderkey, l.l_partkey, od.day
                FROM lineitem l JOIN od USING (l_orderkey)),
         bptr AS (SELECT DISTINCT l_orderkey, l_partkey FROM li, m WHERE day < mid),
         prtr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bptr a JOIN bptr b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS MATERIALIZED (
           SELECT pa, pb FROM prtr WHERE n >= ${AnalyticsExt.LinkPredMinOrders}),
         bpte AS (SELECT DISTINCT l_orderkey, l_partkey FROM li, m WHERE day >= mid),
         prte AS (
           SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           FROM bpte a JOIN bpte b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         testnew AS MATERIALIZED (
           SELECT pa, pb FROM prte p
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = p.pa AND e.pb = p.pb)),
         d AS (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         adjc AS (
           SELECT adj.u, adj.v FROM adj
           JOIN d ON d.node = adj.u AND d.deg <= ${AnalyticsExt.LinkPredMaxCenterDeg}),
         cnw AS (
           SELECT a.v AS pa, b.v AS pb, CAST(count(*) AS BIGINT) AS cn
           FROM adjc a JOIN adjc b ON a.u = b.u AND a.v < b.v
           GROUP BY 1, 2),
         cand AS MATERIALIZED (
           SELECT c.pa, c.pb, c.cn,
             CAST(c.cn * 1000000 // (da.deg + db.deg - c.cn) AS BIGINT) AS jaccard_e6,
             CASE WHEN EXISTS (SELECT 1 FROM testnew t
                               WHERE t.pa = c.pa AND t.pb = c.pb)
               THEN 1 ELSE 0 END AS is_new
           FROM cnw c
           JOIN d da ON da.node = c.pa
           JOIN d db ON db.node = c.pb
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = c.pa AND e.pb = c.pb)),
         top AS (
           SELECT * FROM cand
           ORDER BY jaccard_e6 DESC, cn DESC, pa, pb
           LIMIT ${AnalyticsExt.LinkPredTopK}),
         ta AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                  CAST(coalesce(sum(is_new), 0) AS BIGINT) AS topk_hits FROM top),
         ca AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates,
                  CAST(coalesce(sum(is_new), 0) AS BIGINT) AS base_hits FROM cand),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS n_train_edges FROM e),
         te AS (SELECT CAST(count(*) AS BIGINT) AS n_test_new FROM testnew)
         SELECT n_train_edges, n_test_new, n_candidates, base_hits, k_used, topk_hits,
           CASE WHEN k_used > 0
             THEN CAST(topk_hits * 1000000 // k_used AS BIGINT)
             ELSE NULL END AS precision_e6,
           CASE WHEN base_hits > 0 AND k_used > 0 THEN
             CAST(CAST(topk_hits AS HUGEINT) * n_candidates * 1000000
               // (CAST(k_used AS HUGEINT) * base_hits) AS BIGINT)
           ELSE NULL END AS lift_e6
         FROM ta, ca, tr, te""",
    "q_theil" ->
      // per-customer e6-quantized Theil terms (nats) on integer
      // ratios; shares exact; between-component per nation
      """WITH cu AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         cn AS (
           SELECT n.n_name, cu.x
           FROM cu JOIN customer c ON c.c_custkey = cu.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
           WHERE cu.x >= 1),
         g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(x) AS BIGINT) AS x_g
               FROM cn GROUP BY 1),
         t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(x_g) AS BIGINT) AS xt FROM g),
         terms AS (
           SELECT cn.n_name, g.n_g, g.x_g, t.n, t.xt,
             CAST(floor((CAST(cn.x AS DOUBLE) / t.xt)
               * ln(CAST(cn.x AS DOUBLE) * t.n / t.xt) * 1000000 + 0.5) AS BIGINT)
               AS t_term_e6,
             CAST(floor((CAST(cn.x AS DOUBLE) / g.x_g)
               * ln(CAST(cn.x AS DOUBLE) * g.n_g / g.x_g) * 1000000 + 0.5) AS BIGINT)
               AS w_term_e6
           FROM cn JOIN g USING (n_name), t),
         bn AS (SELECT n_name, n_g, x_g, n, xt,
                  CAST(sum(t_term_e6) AS BIGINT) AS t_part_e6,
                  CAST(sum(w_term_e6) AS BIGINT) AS t_within_e6
                FROM terms GROUP BY 1, 2, 3, 4, 5),
         tt AS (SELECT CAST(sum(t_part_e6) AS BIGINT) AS t_total_e6 FROM bn)
         SELECT n_name, n_g AS n_cust, x_g AS revenue_cents,
           CAST(CAST(x_g AS HUGEINT) * 1000000 // xt AS BIGINT) AS share_e6,
           t_within_e6,
           CAST(floor((CAST(x_g AS DOUBLE) / xt)
             * ln(CAST(x_g AS DOUBLE) * n / (CAST(xt AS DOUBLE) * n_g))
             * 1000000 + 0.5) AS BIGINT) AS between_e6,
           t_total_e6
         FROM bn, tt""",
    "q_propensity_strata" ->
      // equal-width order-value strata, per-stratum arm rates,
      // common-support flag, integer-weighted ATE over supported
      """WITH tr AS (
           SELECT DISTINCT l_orderkey AS o_orderkey
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')),
         cu AS (
           SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS bal,
             CAST(o.o_orderstatus = 'F' AS BIGINT) AS rep,
             CASE WHEN o.o_orderkey IN (SELECT o_orderkey FROM tr) THEN 1 ELSE 0 END AS treated
           FROM orders o),
         b AS (SELECT min(bal) AS lo, max(bal) AS hi FROM cu),
         st AS (SELECT ((bal - lo) * 10) // (hi - lo + 1) AS stratum, treated, rep
                FROM cu, b),
         g AS (
           SELECT stratum,
             CAST(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN treated = 1 THEN rep ELSE 0 END) AS BIGINT) AS y_t,
             CAST(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN treated = 0 THEN rep ELSE 0 END) AS BIGINT) AS y_c
           FROM st GROUP BY 1),
         gg AS (
           SELECT *, CAST(n_t >= 1 AND n_c >= 1 AS BIGINT) AS in_support,
             CASE WHEN n_t > 0 THEN CAST(y_t * 1000000 // n_t AS BIGINT) ELSE NULL END
               AS rate_t_e6,
             CASE WHEN n_c > 0 THEN CAST(y_c * 1000000 // n_c AS BIGINT) ELSE NULL END
               AS rate_c_e6
           FROM g),
         g3 AS (SELECT *, CASE WHEN in_support = 1 THEN rate_t_e6 - rate_c_e6 ELSE NULL END
                  AS diff_e6
                FROM gg),
         a AS (
           SELECT CAST(sum(n_t + n_c) AS BIGINT) AS n_supported,
             CAST(sum((n_t + n_c) * diff_e6) AS BIGINT) AS wsum
           FROM g3 WHERE in_support = 1)
         SELECT stratum, n_t, y_t, n_c, y_c, in_support, rate_t_e6, rate_c_e6, diff_e6,
           n_supported,
           CAST((CASE WHEN wsum < 0 THEN -1 ELSE 1 END)
             * (abs(CAST(wsum AS HUGEINT)) // n_supported) AS BIGINT) AS ate_e6
         FROM g3, a""",
    "q_welch_t" ->
      // staged HUGEINT quotients: a_i = s_i^2/n_i in one division,
      // t^2 on the e6 grid (squared statistic, no sqrt), W-S df e3
      """WITH j AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         m AS (
           SELECT
             CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN t = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
             sum(CASE WHEN t = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q1,
             CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN t = 0 THEN c ELSE 0 END) AS BIGINT) AS s2,
             sum(CASE WHEN t = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q2
           FROM j),
         aa AS (
           SELECT *,
             (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
               // (CAST(n1 AS HUGEINT) * n1 * (n1 - 1)) AS a1,
             (CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
               // (CAST(n2 AS HUGEINT) * n2 * (n2 - 1)) AS a2,
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 < 0
                     THEN -1 ELSE 1 END)
               * (abs(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1)
                  // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT) AS d_cents
           FROM m)
         SELECT n1, n2, s1 // n1 AS mean1_cents, s2 // n2 AS mean2_cents, d_cents,
           CAST(a1 AS BIGINT) AS se2_1_c2, CAST(a2 AS BIGINT) AS se2_2_c2,
           CASE WHEN a1 + a2 >= 1 THEN
             CAST(CAST(d_cents AS HUGEINT) * d_cents * 1000000 // (a1 + a2) AS BIGINT)
           ELSE NULL END AS t2_e6,
           CASE WHEN a1 * a1 // (n1 - 1) + a2 * a2 // (n2 - 1) >= 1 THEN
             CAST((a1 + a2) * (a1 + a2) * 1000
               // (a1 * a1 // (n1 - 1) + a2 * a2 // (n2 - 1)) AS BIGINT)
           ELSE NULL END AS df_e3
         FROM aa""",
    "q_order_reconciliation" ->
      // header vs recomputed line totals; exact rank-defined error
      // percentiles over the per-VALUE frame
      """WITH rc AS (
           SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)
               AS BIGINT)) AS BIGINT) AS recomputed
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total, rc.recomputed
           FROM orders o LEFT JOIN rc ON rc.l_orderkey = o.o_orderkey),
         summ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN recomputed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lineless,
             CAST(sum(CASE WHEN recomputed = total THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
             CAST(sum(CASE WHEN recomputed IS NOT NULL THEN recomputed - total ELSE 0 END)
               AS BIGINT) AS net_drift_cents
           FROM j),
         errs AS (
           SELECT abs(recomputed - total) * 1000000 // total AS rel_e6
           FROM j WHERE recomputed IS NOT NULL AND total >= 1),
         bv AS (SELECT rel_e6, CAST(count(*) AS BIGINT) AS cnt FROM errs GROUP BY 1),
         cu AS (
           SELECT rel_e6, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY rel_e6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) + 1
               AS first_rank
           FROM bv),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_errs FROM bv),
         tg AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
                  AS t(pctl, num, den)),
         rk AS (SELECT pctl, CAST((n_errs * num + den - 1) // den AS BIGINT) AS rank
                FROM tg, tot)
         SELECT rk.pctl, rk.rank, cu.rel_e6 AS rel_err_e6,
           s.n_orders, s.n_lineless, s.n_exact, s.net_drift_cents
         FROM rk
         JOIN cu ON rk.rank >= cu.first_rank AND rk.rank < cu.first_rank + cu.cnt, summ s""",
    "q_brier_decomp" ->
      // train-half bin rates as e6 forecasts; Brier/REL/RES masses
      // expanded exactly on the e12 grid, one div N each
      """WITH o AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
           FROM orders),
         m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM o),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM o),
         binned AS (
           SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, y,
             CASE WHEN day < mid THEN 1 ELSE 0 END AS is_train
           FROM o, m, b),
         tr AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_train,
                  CAST(sum(y) AS BIGINT) AS y_train
                FROM binned WHERE is_train = 1 GROUP BY 1),
         tr2 AS (SELECT bin, n_train,
                   CAST(y_train * 1000000 // n_train AS BIGINT) AS p_e6 FROM tr),
         te AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS o_b
                FROM binned WHERE is_train = 0 GROUP BY 1),
         te2 AS (SELECT bin, n_b, o_b,
                   CAST(o_b * 1000000 // n_b AS BIGINT) AS obar_b_e6 FROM te),
         bb AS (SELECT te2.*, tr2.n_train, tr2.p_e6 FROM te2 JOIN tr2 USING (bin)),
         tt AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_test,
                  CAST(sum(o_b) AS BIGINT) AS o_test FROM bb),
         wt AS (SELECT bb.*, n_test,
                  CAST(o_test * 1000000 // n_test AS BIGINT) AS obar_e6 FROM bb, tt),
         g AS (
           SELECT max(n_test) AS n_test, max(obar_e6) AS obar_e6,
             CAST(sum(CAST(o_b AS HUGEINT) * (1000000 - p_e6) * (1000000 - p_e6)
                  + CAST(n_b - o_b AS HUGEINT) * p_e6 * p_e6)
               // max(n_test) AS BIGINT) AS brier_e12,
             CAST(sum(CAST(n_b AS HUGEINT) * (p_e6 - obar_b_e6) * (p_e6 - obar_b_e6))
               // max(n_test) AS BIGINT) AS rel_e12,
             CAST(sum(CAST(n_b AS HUGEINT) * (obar_b_e6 - obar_e6) * (obar_b_e6 - obar_e6))
               // max(n_test) AS BIGINT) AS res_e12,
             CAST(CAST(max(obar_e6) AS HUGEINT) * (1000000 - max(obar_e6)) AS BIGINT)
               AS unc_e12
           FROM wt),
         dr AS (
           SELECT CAST(count(*) AS BIGINT) AS dropped_bins,
             CAST(coalesce(sum(n_b), 0) AS BIGINT) AS dropped_rows
           FROM te2 WHERE bin NOT IN (SELECT bin FROM tr2))
         SELECT wt.bin, wt.n_train, wt.p_e6, wt.n_b, wt.o_b, wt.obar_b_e6,
           g.n_test, g.obar_e6, g.brier_e12, g.rel_e12, g.res_e12, g.unc_e12,
           dr.dropped_bins, dr.dropped_rows
         FROM wt, g, dr""",
    "q_period_detect" ->
      // paired-series ACF per lag, sign-factored e3*e3 r^2, squared
      // white-noise band r^2*m > 4e6, (r^2 desc, lag) winner
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         lags AS (SELECT unnest(generate_series(2, 14)) AS lag),
         pairs AS (
           SELECT l.lag, a.x AS x, b.x AS y
           FROM lags l CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag),
         pl AS (
           SELECT lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM pairs GROUP BY 1),
         rr AS (
           SELECT CAST(lag AS BIGINT) AS lag, m,
             CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
             CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
             CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
           FROM pl),
         r2 AS (
           SELECT lag, m,
             CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
               * ((abs(num) * 1000 // den_x) * (abs(num) * 1000 // den_y)) AS BIGINT)
               AS r2_signed_e6
           FROM rr WHERE den_x > 0 AND den_y > 0),
         r3 AS (SELECT *, CAST(abs(r2_signed_e6) * m > 4000000 AS BIGINT) AS significant
                FROM r2),
         best AS (SELECT lag AS best_lag, r2_signed_e6 AS best_r2_e6
                  FROM r3 ORDER BY r2_signed_e6 DESC, lag LIMIT 1)
         SELECT r3.lag, r3.m, r3.r2_signed_e6, r3.significant, best.best_lag, best.best_r2_e6
         FROM r3, best""",
    "q_seasonal_mk" ->
      // within-season pairwise sign sweeps + per-season tie-corrected
      // var18, both summed across the 7 day-of-week seasons
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         dd AS (SELECT *, day % 7 AS season FROM daily),
         s AS (
           SELECT a.event_type,
             CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_total,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM dd a JOIN dd b
             ON a.event_type = b.event_type AND a.season = b.season AND a.day < b.day
           GROUP BY 1),
         t AS (SELECT event_type, season, c, CAST(count(*) AS BIGINT) AS t
               FROM dd GROUP BY 1, 2, 3),
         ps AS (
           SELECT event_type, season,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
             CAST(sum(t) AS BIGINT) AS nd
           FROM t GROUP BY 1, 2),
         ties AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(nd) AS BIGINT) AS n_days,
             CAST(sum(nd * (nd - 1) * (2 * nd + 5) - tie_term) AS BIGINT) AS var18_total
           FROM ps GROUP BY 1)
         SELECT s.event_type, n_days, n_seasons, n_pairs, s_total, var18_total
         FROM s JOIN ties ON s.event_type = ties.event_type""",
    "q_cramers_v" ->
      // #189's per-cell e6 chi2 summed; V^2 e12 one further quotient;
      // V e6 via the one-ulp-clamp exact isqrt
      """WITH cells AS (
           SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS o
           FROM orders GROUP BY 1, 2),
         rm AS (SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         cm AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_cols
               FROM cells),
         x AS (
           SELECT n, n_rows, n_cols,
             CAST(sum((CAST(n * o - r * c AS HUGEINT) * CAST(n * o - r * c AS HUGEINT)
                       * 1000000)
                  // (CAST(n AS HUGEINT) * r * c)) AS BIGINT) AS chi2_e6
           FROM cells JOIN rm USING (o_orderstatus) JOIN cm USING (o_orderpriority), t
           GROUP BY 1, 2, 3),
         v AS (
           SELECT *, CAST(CAST(chi2_e6 AS HUGEINT) * 1000000
                  // (CAST(n AS HUGEINT) * (least(n_rows, n_cols) - 1)) AS BIGINT) AS v2_e12
           FROM x),
         sq AS (SELECT *, CAST(floor(sqrt(CAST(v2_e12 AS DOUBLE))) AS HUGEINT) AS s0 FROM v)
         SELECT n, n_rows, n_cols, chi2_e6, v2_e12,
           CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v2_e12 THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > v2_e12 THEN 1 ELSE 0 END) AS BIGINT) AS v_e6
         FROM sq""",
    "text_burstiness" ->
      // per-doc counts; VMR over ALL docs (zeros via N only) as one
      // truncating e6 HUGEINT quotient; (df desc, term) top-20
      """WITH tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         pd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         st AS (
           SELECT w AS term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS total_count,
             sum(CAST(c AS HUGEINT) * c) AS q
           FROM pd GROUP BY 1)
         SELECT term, n_docs, df, total_count,
           CAST((CAST(n_docs AS HUGEINT) * q
                 - CAST(total_count AS HUGEINT) * total_count) * 1000000
             // (CAST(n_docs AS HUGEINT) * total_count) AS BIGINT) AS vmr_e6
         FROM st, nd
         ORDER BY df DESC, term
         LIMIT 20""",
    "text_cond_entropy" ->
      // e6-quantized entropy terms over unigram and bigram grids;
      // conditional = the exact difference on the published grid
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         uni AS (SELECT unnest(tk) AS g FROM t),
         uc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
         un AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
         uh AS (
           SELECT max(n) AS n_tokens, CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_unigram_e6
           FROM uc, un),
         bi AS (SELECT unnest(list_transform(range(1, len(tk)),
                  i -> tk[i] || ' ' || tk[i + 1])) AS g FROM t),
         bc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
         bn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bc),
         bh AS (
           SELECT max(n) AS n_bigrams, CAST(count(*) AS BIGINT) AS distinct_bigrams,
             CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_bigram_e6
           FROM bc, bn)
         SELECT n_tokens, vocab, h_unigram_e6, n_bigrams, distinct_bigrams, h_bigram_e6,
           h_bigram_e6 - h_unigram_e6 AS h_cond_e6
         FROM uh, bh""",
    "q_odds_ratio" ->
      // 2x2 cells from the promo-order semi-join; each effect size
      // one truncating e6 HUGEINT quotient, zero margins -> NULL
      """WITH tr AS (
           SELECT DISTINCT l_orderkey AS o_orderkey
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')),
         j AS (
           SELECT CAST(o.o_orderstatus = 'F' AS BIGINT) AS y,
             CASE WHEN o.o_orderkey IN (SELECT o_orderkey FROM tr) THEN 1 ELSE 0 END AS t
           FROM orders o),
         m AS (
           SELECT
             CAST(sum(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM j)
         SELECT a, b, c, d,
           CASE WHEN b > 0 AND c > 0 THEN
             CAST(CAST(a AS HUGEINT) * d * 1000000 // (CAST(b AS HUGEINT) * c) AS BIGINT)
           ELSE NULL END AS odds_ratio_e6,
           CASE WHEN a + b > 0 AND c > 0 THEN
             CAST(CAST(a AS HUGEINT) * (c + d) * 1000000
               // (CAST(c AS HUGEINT) * (a + b)) AS BIGINT)
           ELSE NULL END AS risk_ratio_e6,
           CASE WHEN a + b > 0 AND c + d > 0 THEN
             CAST(a * 1000000 // (a + b) - c * 1000000 // (c + d) AS BIGINT)
           ELSE NULL END AS risk_diff_e6
         FROM m""",
    "q_page_hinkley" ->
      // running-mean deviations, prefix-extrema closed forms, 4-sigma
      // threshold via the one-ulp-clamp exact isqrt
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   sum(CAST(x AS HUGEINT) * x) AS sxx FROM byday),
         vv AS (SELECT (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                   // (CAST(n AS HUGEINT) * n) AS var_c FROM tot),
         sg AS (SELECT var_c, CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS HUGEINT) AS s0
                FROM vv),
         sig AS (SELECT CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                      - (CASE WHEN s0 * s0 > var_c THEN 1 ELSE 0 END) AS BIGINT) AS sigma
                 FROM sg),
         w AS (
           SELECT d, x,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             CAST(sum(x) OVER win AS BIGINT) AS s_pre
           FROM byday
           WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         w2 AS (SELECT *, x - s_pre // i AS dev FROM w),
         w3 AS (SELECT *, CAST(sum(dev) OVER win AS BIGINT) AS m FROM w2
                WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         w4 AS (SELECT *, CAST(min(m) OVER win AS BIGINT) AS m_min,
                  CAST(max(m) OVER win AS BIGINT) AS m_max
                FROM w3
                WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT d AS day, x AS cents, s_pre // i AS mean_so_far, m,
           m - m_min AS ph_plus, m_max - m AS ph_minus,
           4 * sigma AS lambda_c,
           CAST(m - m_min > 4 * sigma AS BIGINT) AS alarm_up,
           CAST(m_max - m > 4 * sigma AS BIGINT) AS alarm_down
         FROM w4, sig""",
    "q_assortment_turnover" ->
      // distinct (month, part) actives; adjacent-month equi-join
      // intersection; Jaccard one truncating e6 quotient
      """WITH mp AS (
           SELECT DISTINCT
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
                + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             l.l_partkey
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         sz AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active FROM mp GROUP BY 1),
         iv AS (
           SELECT a.m, CAST(count(*) AS BIGINT) AS n_common
           FROM mp a JOIN mp b ON b.m = a.m + 1 AND b.l_partkey = a.l_partkey
           GROUP BY 1)
         SELECT s.m AS month, s.m + 1 AS next_month, s.n_active,
           t.n_active AS n_next,
           coalesce(iv.n_common, 0) AS n_common,
           t.n_active - coalesce(iv.n_common, 0) AS n_added,
           s.n_active - coalesce(iv.n_common, 0) AS n_dropped,
           CAST(coalesce(iv.n_common, 0) * 1000000
             // (s.n_active + t.n_active - coalesce(iv.n_common, 0)) AS BIGINT) AS jaccard_e6
         FROM sz s JOIN sz t ON t.m = s.m + 1
         LEFT JOIN iv ON iv.m = s.m""",
    "q_supplier_hhi" ->
      // e4-truncated supplier shares squared to e8; (hhi desc, part)
      // top-25 among multi-supplier parts; sole-source set counted
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qs
           FROM lineitem GROUP BY 1, 2),
         pp AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(qs) AS BIGINT) AS q_tot
           FROM ps GROUP BY 1),
         h AS (
           SELECT ps.l_partkey, pp.n_suppliers, pp.q_tot,
             CAST(sum((ps.qs * 10000 // pp.q_tot) * (ps.qs * 10000 // pp.q_tot)) AS BIGINT)
               AS hhi_e8
           FROM ps JOIN pp USING (l_partkey)
           WHERE pp.q_tot >= 1
           GROUP BY 1, 2, 3),
         ss AS (
           SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sole_source
           FROM h)
         SELECT h.l_partkey, h.n_suppliers, h.q_tot, h.hhi_e8, ss.n_parts, ss.n_sole_source
         FROM h, ss
         WHERE h.n_suppliers >= 2
         ORDER BY h.hhi_e8 DESC, h.l_partkey
         LIMIT 25""",
    "q_bootstrap_ci" -> bootstrapCiOracle(b = BootstrapB),
    "text_zipf" ->
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, count(*) AS c FROM td GROUP BY 1, 2),
         rk AS (
           SELECT source, term, c,
             row_number() OVER (PARTITION BY source ORDER BY c DESC, term) AS r
           FROM tc),
         oct AS (
           SELECT source, c, r, CAST(log2(r) AS BIGINT) AS octave
           FROM rk WHERE (r & (r - 1)) = 0)
         SELECT source, octave, CAST(r AS BIGINT) AS rank, CAST(c AS BIGINT) AS freq,
           (c * 1000000) // (lag(c) OVER (PARTITION BY source ORDER BY r))
             AS octave_ratio_e6
         FROM oct""",
    "dedup_containment" ->
      // ALL-PAIRS ground truth (no prefix filter): the hash-MATCH
      // proves the asymmetric prefix filter lossless, not just fast.
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 4000000,
             tok[CAST(floor(len(tok) * 0.2) AS INT) + 1 :
                 CAST(floor(len(tok) * 0.2) AS INT) +
                 greatest(1, CAST(floor(len(tok) * 0.5) AS INT)
                             - CAST(floor(len(tok) * 0.2) AS INT))]
           FROM toks0 WHERE doc_id % 8 = 0),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ')
                        for i in range(1, len(tok) - 1)] END AS s
           FROM corpus),
         hs AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(x), 1, 15))::BIGINT for x in s]) AS hs
           FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(a.hs) AS BIGINT) AS n_shingles_a,
             CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter
           FROM hs a JOIN hs b ON a.doc_id != b.doc_id)
         SELECT doc_a, doc_b, n_shingles_a, inter,
           (inter * 1000000) // n_shingles_a AS containment_e6
         FROM pairs
         WHERE (inter * 1000000) // n_shingles_a >= 800000""",
    "q_conversion_lag" ->
      // FLAT global-window replay of the hierarchical lag rank.
      """WITH fv AS (
           SELECT user_id, min(epoch_us(ts)) AS v
           FROM events WHERE event_type = 'view' GROUP BY 1),
         fp AS (
           SELECT e.user_id, fv.v, min(epoch_us(e.ts)) AS p
           FROM events e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.v
           GROUP BY 1, 2),
         lags AS (SELECT user_id, p - v AS lag_us FROM fp),
         r AS (
           SELECT lag_us,
             row_number() OVER (ORDER BY lag_us, user_id) AS rk
           FROM lags),
         n AS (SELECT count(*) AS n FROM lags),
         t AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                                     ('p99', 99, 100)) AS v(pctl, num, den))
         SELECT t.pctl,
           CAST((n.n * t.num + t.den - 1) // t.den AS BIGINT) AS rank,
           r.lag_us, CAST(n.n AS BIGINT) AS n_converted
         FROM t, n, r
         WHERE r.rk = (n.n * t.num + t.den - 1) // t.den""",
    "mm_crossmodal_topk" -> {
      // image-modality queries probe audio-modality buckets under the
      // shared hyperplane family; bits from the audio corpus size
      s"""WITH ${lshBucketsCte(
        "embeddings",
        "SELECT count(*) FROM embeddings WHERE vec_id % 3 = 1")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id % 3 = 0),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id % 3 = 1),
          scored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          SELECT query_id, vec_id, cos, rank FROM (
            SELECT query_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM scored)
          WHERE rank <= 3"""
    },
    "cdc_restatement" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value,
             epoch_us(ts) +
               (('0x' || substr(md5('graft-rst:' || event_id), 1, 15))::BIGINT
                % 7200000001) AS arr
           FROM events),
         h AS (SELECT max(ts) + 1 AS h FROM ch),
         v AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             arr AS dim_arr, value AS dim_value
           FROM ch
           WHERE op = 'INSERT' OR (op = 'UPDATE' AND event_id % 2 = 0)),
         f AS (
           SELECT user_id, ts AS fact_ts, arr AS fact_arr, event_id AS fact_id
           FROM ch WHERE op = 'UPDATE' AND event_id % 2 = 1)
         SELECT f.fact_id, f.user_id, f.fact_ts, v.dim_value,
           v.dim_arr - f.fact_arr AS arrived_late_by_us
         FROM f JOIN v ON v.user_id = f.user_id
           AND v.valid_from <= f.fact_ts AND f.fact_ts < v.valid_to
         WHERE v.dim_arr > f.fact_arr""",
    "cdc_balance_curve" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             CAST(floor(round(value, 2) * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         st AS (
           SELECT ts, user_id, event_id,
             CASE WHEN op = 'DELETE' THEN 0 ELSE cents END AS stored
           FROM ch),
         d AS (
           SELECT ts // 86400000000 AS day,
             stored - coalesce(lag(stored) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), 0) AS delta
           FROM st),
         daily AS (
           SELECT day, CAST(sum(delta) AS BIGINT) AS net_delta_cents
           FROM d GROUP BY 1)
         SELECT day, net_delta_cents,
           CAST(sum(net_delta_cents) OVER (ORDER BY day) AS BIGINT)
             AS balance_cents
         FROM daily""",
    "q_benford" ->
      """WITH exp6(digit, expected_e6) AS (
           SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
             (9, 45757)) AS v),
         c AS (
           SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n_orders
           FROM orders GROUP BY 1),
         n AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM c)
         SELECT CAST(e.digit AS BIGINT) AS digit,
           CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders,
           CAST((coalesce(c.n_orders, 0) * 1000000) // n.n AS BIGINT)
             AS observed_e6,
           CAST(e.expected_e6 AS BIGINT) AS expected_e6,
           CAST(abs((coalesce(c.n_orders, 0) * 1000000) // n.n - e.expected_e6)
             AS BIGINT) AS abs_dev_e6
         FROM exp6 e LEFT JOIN c ON c.digit = e.digit, n""",
    "q_fifo_allocation" ->
      """WITH li AS (
           SELECT l_partkey, l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
         rin AS (
           SELECT l_partkey, l_orderkey AS in_order, l_linenumber AS in_line,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS in_to,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) - qty AS in_from
           FROM li WHERE l_orderkey % 2 = 0),
         rout AS (
           SELECT l_partkey, l_orderkey AS out_order, l_linenumber AS out_line,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS out_to,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) - qty AS out_from
           FROM li WHERE l_orderkey % 2 = 1)
         SELECT i.l_partkey, i.in_order, i.in_line, o.out_order, o.out_line,
           CAST(least(i.in_to, o.out_to) - greatest(i.in_from, o.out_from)
             AS BIGINT) AS qty_matched
         FROM rin i JOIN rout o ON o.l_partkey = i.l_partkey
           AND i.in_from < o.out_to AND o.out_from < i.in_to""",
    "q_eventually_follows" ->
      """WITH spans AS (
           SELECT user_id, event_type,
             min(epoch_us(ts)) AS first_ts, max(epoch_us(ts)) AS last_ts
           FROM events GROUP BY 1, 2)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users_both,
           CAST(sum(CASE WHEN a.first_ts < b.last_ts THEN 1 ELSE 0 END)
             AS BIGINT) AS n_follows,
           CAST((sum(CASE WHEN a.first_ts < b.last_ts THEN 1 ELSE 0 END)
             * 1000000) // count(*) AS BIGINT) AS follow_rate_e6
         FROM spans a JOIN spans b
           ON a.user_id = b.user_id AND a.event_type != b.event_type
         GROUP BY 1, 2""",
    "cdc_scd2_compact" ->
      """WITH live AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CAST(floor(round(value, 2) / 10) AS BIGINT) AS band
           FROM events WHERE event_type != 'error'),
         h AS (SELECT max(ts) + 1 AS h FROM live),
         runs AS (
           SELECT user_id, ts, event_id, band,
             CASE WHEN lag(band) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
                    OR lag(band) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) != band
                  THEN 1 ELSE 0 END AS run_start
           FROM live),
         runid AS (
           SELECT user_id, ts, band,
             CAST(sum(run_start) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS run_id
           FROM runs),
         merged AS (
           SELECT user_id, run_id, min(ts) AS valid_from,
             min(band) AS value_band,
             CAST(count(*) AS BIGINT) AS n_versions_merged
           FROM runid GROUP BY 1, 2)
         SELECT user_id, run_id, value_band, valid_from,
           coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id),
                    (SELECT h FROM h)) AS valid_to,
           n_versions_merged
         FROM merged""",
    "ann_gram_matrix" ->
      // the Spark side is dimension-agnostic (driven by size(embedding));
      // the oracle's series bound comes from EmbeddingDim so a testdata
      // dimension change fails the dim-guard in `Similarity.gramMatrix`'s
      // spec loudly instead of silently truncating the oracle
      s"""WITH q AS (
           SELECT [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
                   for i in generate_series(1, $EmbeddingDim)] AS q
           FROM embeddings),
         cells AS (
           SELECT i.i - 1 AS i, j.j - 1 AS j, q[i.i] * q[j.j] AS p
           FROM q, generate_series(1, $EmbeddingDim) i(i),
                   generate_series(1, $EmbeddingDim) j(j)
           WHERE j.j >= i.i)
         SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(sum(p) AS BIGINT) AS sum_e12,
           CAST(count(*) AS BIGINT) AS n_vecs
         FROM cells GROUP BY 1, 2""",
    "q_ltv_curve" ->
      """WITH o AS (
           SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1),
         aged AS (
           SELECT f.cohort_m, o.m - f.cohort_m AS age_months,
             o.o_custkey, o.cents
           FROM o JOIN f ON f.o_custkey = o.o_custkey),
         cells AS (
           SELECT cohort_m, age_months,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
             CAST(sum(cents) AS BIGINT) AS rev_cents
           FROM aged GROUP BY 1, 2)
         SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
           CAST(age_months AS BIGINT) AS age_months, n_active, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age_months)
             AS BIGINT) AS cum_rev_cents
         FROM cells""",
    "cdc_tombstone_gc" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         r AS (
           SELECT user_id, op, ts,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rk
           FROM ch),
         lastc AS (
           SELECT user_id, ts AS last_ts, op = 'DELETE' AS dead
           FROM r WHERE rk = 1),
         cnt AS (SELECT user_id, count(*) AS n_rows FROM ch GROUP BY 1),
         mx AS (SELECT max(ts) AS mx FROM ch)
         SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
           CAST(sum(CASE WHEN dead AND last_ts < mx - h.horizon_days * 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_reclaimable,
           CAST(sum(CASE WHEN dead AND last_ts < mx - h.horizon_days * 86400000000
                    THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_reclaimed,
           CAST(sum(CASE WHEN dead AND NOT (last_ts < mx - h.horizon_days * 86400000000)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones_retained
         FROM lastc JOIN cnt USING (user_id), mx,
           (SELECT unnest([7, 30, 90]) AS horizon_days) h
         GROUP BY 1""",
    "text_rake" ->
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         pos AS (
           SELECT doc_id, e.p, e.w,
             e.w IN ('the','a','of','and','to','in','is','it','that','for')
               AS is_stop
           FROM (SELECT doc_id,
                   unnest([{'p': i - 1, 'w': tok[i]}
                           for i in generate_series(1, len(tok))]) AS e
                 FROM toks0)),
         runs AS (
           SELECT doc_id, p, w, is_stop,
             CASE WHEN NOT is_stop AND coalesce(
                    lag(is_stop) OVER (PARTITION BY doc_id ORDER BY p), true)
                  THEN 1 ELSE 0 END AS run_start
           FROM pos),
         runid AS (
           SELECT doc_id, p, w, is_stop,
             CAST(sum(run_start) OVER (PARTITION BY doc_id ORDER BY p)
               AS BIGINT) AS run_id
           FROM runs),
         nr AS (SELECT doc_id, p, w, run_id FROM runid WHERE NOT is_stop),
         ph AS (
           SELECT doc_id, run_id, string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(count(*) AS BIGINT) AS len
           FROM nr GROUP BY 1, 2),
         ws AS (
           SELECT w,
             (CAST(sum(len) AS BIGINT) * 1000000) // count(*) AS wscore_e6
           FROM nr JOIN ph USING (doc_id, run_id) GROUP BY 1),
         psc AS (
           SELECT doc_id, run_id, CAST(sum(wscore_e6) AS BIGINT) AS score_e6
           FROM nr JOIN ws USING (w) GROUP BY 1, 2)
         SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           min(len) AS n_words, CAST(min(score_e6) AS BIGINT) AS score_e6
         FROM ph JOIN psc USING (doc_id, run_id)
         GROUP BY 1 ORDER BY score_e6 DESC, phrase LIMIT 10""",
    "q_quantile_norm" ->
      // FLAT global-window replay of the hierarchical global rank —
      // the hash-MATCH proves the shard decomposition (#191 pattern).
      """WITH d AS (SELECT doc_id, source, n_chars AS len FROM documents),
         g AS (SELECT len AS g_len,
                 row_number() OVER (ORDER BY len, doc_id) AS grank
               FROM d),
         t AS (SELECT count(*) AS n FROM d),
         s AS (SELECT doc_id, source, len,
                 row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
                   AS srank,
                 count(*) OVER (PARTITION BY source) AS n_s
               FROM d)
         SELECT s.doc_id, s.source, s.len, g.g_len AS norm_len
         FROM s, t, g
         WHERE g.grank = (s.srank * t.n + s.n_s - 1) // s.n_s""",
    "q_seasonal_decomp" ->
      s"""$seasonalKernelSql
         SELECT k.event_type, CAST(k.day AS BIGINT) AS day,
           CAST(k.dow AS BIGINT) AS dow, k.c AS cents,
           CAST(k.trend AS BIGINT) AS trend_cents,
           CAST(sc.seasonal AS BIGINT) AS seasonal_cents,
           CAST(k.det - sc.seasonal AS BIGINT) AS remainder_cents
         FROM kept k JOIN sc ON sc.event_type = k.event_type AND sc.dow = k.dow""",
    "q_anomaly_flags" ->
      // seasonal-remainder MAD flags: lower discrete medians via
      // row_number at rank (n+1)//2 under the (value, day) total
      // order — zero interpolation; 3×MAD threshold, strict >
      s"""$seasonalKernelSql,
         rem AS (
           SELECT k.event_type, k.day, CAST(k.det - sc.seasonal AS BIGINT) AS rem
           FROM kept k JOIN sc ON sc.event_type = k.event_type AND sc.dow = k.dow),
         medr AS (
           SELECT event_type, rem AS med FROM (
             SELECT event_type, rem, day,
               row_number() OVER (PARTITION BY event_type ORDER BY rem, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM rem)
           WHERE rn = (n + 1) // 2),
         dev AS (
           SELECT r.event_type, r.day, r.rem, m.med, abs(r.rem - m.med) AS adev
           FROM rem r JOIN medr m ON m.event_type = r.event_type),
         madr AS (
           SELECT event_type, adev AS mad FROM (
             SELECT event_type, adev, day,
               row_number() OVER (PARTITION BY event_type ORDER BY adev, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM dev)
           WHERE rn = (n + 1) // 2)
         SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.rem AS remainder_cents,
           d.med AS med_cents, m.mad AS mad_cents,
           CAST(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         FROM dev d JOIN madr m ON m.event_type = d.event_type""",
    "q_interval_union" ->
      // gaps-and-islands sweep replayed with the same per-supplier
      // windows; endpoints least/greatest-normalized (the synthetic
      // corpus ships some lines before the order date)
      """WITH iv AS (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             least(epoch_us(o_orderdate), epoch_us(l_shipdate)) // 86400000000 AS s,
             greatest(epoch_us(o_orderdate), epoch_us(l_shipdate)) // 86400000000 AS e
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         w AS (
           SELECT *, max(e) OVER (PARTITION BY l_suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
           FROM iv),
         flg AS (
           SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                          THEN 1 ELSE 0 END AS is_new
           FROM w),
         isl AS (
           SELECT *, sum(is_new) OVER (PARTITION BY l_suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM flg),
         mi AS (SELECT l_suppkey, island, min(s) AS is_, max(e) AS ie
                FROM isl GROUP BY 1, 2)
         SELECT l_suppkey AS suppkey,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(ie - is_ + 1) AS BIGINT) AS covered_days,
           min(is_) AS first_day, max(ie) AS last_day
         FROM mi GROUP BY 1""",
    "q_auc" ->
      // per-distinct-score counts + global negatives-below prefix;
      // 2U keeps the half-tie term integer; HUGEINT quotient
      """WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         bv AS (
           SELECT v, CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
           FROM s GROUP BY v),
         cum AS (
           SELECT v, n_pos, n_neg,
             CAST(coalesce(sum(n_neg) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnb
           FROM bv),
         agg AS (
           SELECT CAST(sum(n_pos) AS BIGINT) AS n1, CAST(sum(n_neg) AS BIGINT) AS n0,
             sum(CAST(n_pos AS HUGEINT) * (2 * cnb + n_neg)) AS u2,
             CAST(sum(CASE WHEN n_pos > 0 AND n_neg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nt
           FROM cum)
         SELECT n1 AS n_pos, n0 AS n_neg, nt AS n_tied_scores,
           CAST((u2 * 1000000) // (2 * CAST(n1 AS HUGEINT) * n0) AS BIGINT) AS auc_e6
         FROM agg""",
    "q_calibration" ->
      // equal-width cents bins via min/max scalars; e6 rate and floor
      // mean quotients — nonneg, // ≡ div
      """WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
         binned AS (SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, v, pos FROM s, b),
         agg AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(v) AS BIGINT) AS sv
           FROM binned GROUP BY bin)
         SELECT bin, n, n_pos,
           CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_e6,
           CAST(sv // n AS BIGINT) AS mean_cents
         FROM agg""",
    "q_kaplan_meier" ->
      // identical integer survival trajectory replayed as a recursive
      // CTE: S_t = S_{t-1} * (n_t - d_t) // n_t from S = 1e6; censor
      // horizon interpolated from the same KmCensorMonths constant
      s"""WITH bycust AS (
           SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m0,
             max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m1
           FROM orders GROUP BY o_custkey),
         mm AS (SELECT max(m1) AS mmax FROM bycust),
         lifes AS (
           SELECT CAST(m1 - m0 AS BIGINT) AS t,
             CASE WHEN m1 < mmax - $KmCensorMonths THEN 1 ELSE 0 END AS death
           FROM bycust, mm),
         byt AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(death) AS BIGINT) AS d
                 FROM lifes GROUP BY t),
         risk AS (
           SELECT t, d,
             CAST(sum(cnt) OVER (ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
           FROM byt),
         km AS (
           WITH RECURSIVE rec(i, t, n, d, surv) AS (
             SELECT i, t, n, d, CAST(1000000 * (n - d) // n AS BIGINT)
             FROM risk WHERE i = 1
             UNION ALL
             SELECT s.i, s.t, s.n, s.d, CAST(k.surv * (s.n - s.d) // s.n AS BIGINT)
             FROM risk s JOIN rec k ON s.i = k.i + 1)
           SELECT * FROM rec)
         SELECT t, n AS n_risk, d, surv AS surv_e6 FROM km""",
    "q_sax_motifs" ->
      // quartile symbols under the (value, day) total order; 3-day
      // contiguous words; top-1 per series with (count, word) tiebreak
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         sym AS (
           SELECT event_type, day,
             CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY c, day) AS BIGINT) AS s
           FROM daily),
         ld AS (
           SELECT event_type, day, s,
             lead(s, 1) OVER w AS s2, lead(s, 2) OVER w AS s3,
             lead(day, 1) OVER w AS d2, lead(day, 2) OVER w AS d3
           FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         words AS (
           SELECT event_type, s * 100 + s2 * 10 + s3 AS word
           FROM ld
           WHERE s3 IS NOT NULL AND d2 = day + 1 AND d3 = day + 2),
         counts AS (
           SELECT event_type, word, CAST(count(*) AS BIGINT) AS n_occurrences
           FROM words GROUP BY 1, 2),
         totals AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_words FROM words GROUP BY 1),
         ranked AS (
           SELECT event_type, word, n_occurrences,
             row_number() OVER (PARTITION BY event_type
               ORDER BY n_occurrences DESC, word) AS rk
           FROM counts)
         SELECT r.event_type, r.word AS motif, r.n_occurrences, t.n_words
         FROM ranked r JOIN totals t ON t.event_type = r.event_type
         WHERE r.rk = 1""",
    "q_funnel_windowed" -> {
      // greedy earliest-chain with step windows (µs) interpolated
      // from the same FunnelWindowDays constant as the Spark call
      val usW = FunnelWindowDays * 86400000000L
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
         signup AS (SELECT user_id, min(ts) AS signup_ts FROM ev
                    WHERE event_type = 'signup' GROUP BY user_id),
         engaged AS (
           SELECT e.user_id, min(e.ts) AS engage_ts
           FROM ev e JOIN signup s ON s.user_id = e.user_id
           WHERE e.event_type IN ('click', 'view')
             AND e.ts > s.signup_ts AND e.ts <= s.signup_ts + $usW
           GROUP BY e.user_id),
         converted AS (
           SELECT e.user_id, min(e.ts) AS convert_ts
           FROM ev e JOIN engaged g ON g.user_id = e.user_id
           WHERE e.event_type = 'purchase'
             AND e.ts > g.engage_ts AND e.ts <= g.engage_ts + $usW
           GROUP BY e.user_id)
         SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM signup) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM engaged) AS n_engaged_7d,
           (SELECT CAST(count(*) AS BIGINT) FROM converted) AS n_converted_7d"""
    },
    "q_crosscorr" ->
      // off-diagonal lagged Pearson family; same HUGEINT moment and
      // factored-r2 discipline as q_autocorr
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, 3)),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             a.c AS x, b.c AS y
           FROM daily a
           CROSS JOIN lags l
           JOIN daily b ON a.event_type < b.event_type AND b.day = a.day + l.lag),
         agg AS (
           SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY 1, 2, 3)
         SELECT type_a, type_b, lag, m,
           CAST(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             ((abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
               // CAST(m * sxx - sx * sx AS HUGEINT))
              * (abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
                 // CAST(m * syy - sy * sy AS HUGEINT)))
             AS BIGINT) AS r2_signed_e6
         FROM agg""",
    "q_autocorr" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.event_type, a.c AS x, b.c AS y
           FROM daily a
           JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + 1),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY 1)
         SELECT event_type, m,
           CAST(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             ((abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
               // CAST(m * sxx - sx * sx AS HUGEINT))
              * (abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
                 // CAST(m * syy - sy * sy AS HUGEINT)))
             AS BIGINT) AS r2_signed_e6
         FROM agg""",
    "q_clustering_coeff" ->
      // #176's degree-oriented replay + a 3-way corner explode of the
      // closed-wedge frame; lcc = 2*tri*1e6 div (deg*(deg-1)), 0 at
      // deg < 2; nodes in no triangle kept via left join
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa, pb FROM pr WHERE n >= 2),
         d AS (
           SELECT node, count(*) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         oe AS (
           SELECT CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pa ELSE pb END AS u,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pb ELSE pa END AS v,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN db.deg ELSE da.deg END AS dv
           FROM e JOIN d da ON da.node = e.pa JOIN d db ON db.node = e.pb),
         w AS (
           SELECT a.u,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN a.v ELSE b.v END AS lo,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN b.v ELSE a.v END AS hi
           FROM oe a JOIN oe b ON a.u = b.u AND a.v < b.v),
         tri AS (
           SELECT u, lo, hi FROM w
           WHERE EXISTS (SELECT 1 FROM oe WHERE oe.u = w.lo AND oe.v = w.hi)),
         corners AS (
           SELECT u AS node FROM tri
           UNION ALL SELECT lo FROM tri
           UNION ALL SELECT hi FROM tri),
         pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1)
         SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
           coalesce(pn.n_tri, 0) AS n_tri,
           CASE WHEN d.deg < 2 THEN 0
                ELSE CAST((2 * coalesce(pn.n_tri, 0) * 1000000)
                     // (d.deg * (d.deg - 1)) AS BIGINT) END AS lcc_e6
         FROM d LEFT JOIN pn ON pn.node = d.node""",
    "q_growth_accounting" ->
      // per-user lag over distinct activity days; churned(d) =
      // active(d-1) - retained(d) via a day -> day-1 self-join
      """WITH ud AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         f AS (
           SELECT day,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) = day - 1
                  THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) < day - 1
                  THEN 1 ELSE 0 END AS is_resurrected
           FROM ud),
         daily AS (
           SELECT day, CAST(count(*) AS BIGINT) AS active,
             CAST(sum(is_new) AS BIGINT) AS new_users,
             CAST(sum(is_retained) AS BIGINT) AS retained,
             CAST(sum(is_resurrected) AS BIGINT) AS resurrected
           FROM f GROUP BY 1)
         SELECT d.day, d.active, d.new_users, d.retained, d.resurrected,
           CAST(coalesce(p.active, 0) - d.retained AS BIGINT) AS churned
         FROM daily d LEFT JOIN daily p ON p.day = d.day - 1""",
    "q_pr_curve" ->
      // distinct-score grid with prefix sums; a threshold row is the
      // first rank of its equi-depth bin; tp = tot_pos - pos_below
      // since predicted-positive means v >= threshold; bin count
      // interpolated from the shared PrCurveBins constant
      s"""WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         bv AS (
           SELECT v, CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
           FROM s GROUP BY v),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n_pos) AS BIGINT) AS tot_pos,
             CAST(sum(n_neg) AS BIGINT) AS tot_neg
           FROM bv),
         r AS (
           SELECT v, n_pos, n_neg,
             CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rank,
             CAST(coalesce(sum(n_pos) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS pos_below,
             CAST(coalesce(sum(n_neg) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS neg_below
           FROM bv)
         SELECT ((rank - 1) * $PrCurveBins) // nd AS bin, v AS threshold_cents,
           tot_pos - pos_below AS tp, tot_neg - neg_below AS fp,
           pos_below AS fn,
           CAST((tot_pos - pos_below) * 1000000
             // greatest(tot_pos - pos_below + tot_neg - neg_below, 1) AS BIGINT)
             AS precision_e6,
           CAST((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1) AS BIGINT)
             AS recall_e6,
           CAST((2 * ((tot_pos - pos_below) * 1000000
                 // greatest(tot_pos - pos_below + tot_neg - neg_below, 1))
               * ((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1)))
             // greatest(((tot_pos - pos_below) * 1000000
                 // greatest(tot_pos - pos_below + tot_neg - neg_below, 1))
               + ((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1)), 1) AS BIGINT)
             AS f1_e6
         FROM r, tot
         WHERE rank = 1 OR ((rank - 1) * $PrCurveBins) // nd > ((rank - 2) * $PrCurveBins) // nd""",
    "q_mann_kendall" ->
      // calendar-bounded pairwise sign sweep per type + tie-corrected
      // variance numerator var18 = n(n-1)(2n+5) - sum t(t-1)(2t+5)
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
             CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         t AS (
           SELECT event_type, c, count(*) AS t FROM daily GROUP BY 1, 2),
         ties AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
             CAST(sum(t) AS BIGINT) AS n_days
           FROM t GROUP BY 1)
         SELECT s.event_type, n_days, n_pairs, s_stat, n_distinct,
           CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT) AS var18
         FROM s JOIN ties ON s.event_type = ties.event_type""",
    "q_spearman" ->
      // doubled tie-average ranks rank2 = 2*below + cnt + 1 on each
      // variable's distinct grid; HUGEINT moments; factored e3*e3
      // signed rho^2 (the #202 discipline)
      """WITH base AS (
           SELECT c.c_custkey,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
             CAST(coalesce(o.y, 0) AS BIGINT) AS y
           FROM customer c LEFT JOIN (
             SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
         rx AS (
           SELECT v, 2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
             + cnt + 1 AS rank2
           FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1)),
         ry AS (
           SELECT v, 2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
             + cnt + 1 AS rank2
           FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1)),
         ranked AS (
           SELECT rx.rank2 AS r2x, ry.rank2 AS r2y
           FROM base JOIN rx ON rx.v = base.x JOIN ry ON ry.v = base.y),
         agg AS (
           SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(r2x) AS HUGEINT) AS sx, CAST(sum(r2y) AS HUGEINT) AS sy,
             sum(CAST(r2x AS HUGEINT) * r2y) AS sxy,
             sum(CAST(r2x AS HUGEINT) * r2x) AS sxx,
             sum(CAST(r2y AS HUGEINT) * r2y) AS syy
           FROM ranked),
         mom AS (
           SELECT CAST(m AS BIGINT) AS n_customers,
             m * sxy - sx * sy AS num,
             m * sxx - sx * sx AS den_x,
             m * syy - sy * sy AS den_y
           FROM agg)
         SELECT n_customers,
           CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
             ((abs(num) * 1000 // den_x) * (abs(num) * 1000 // den_y)) AS BIGINT)
             AS rho2_signed_e6
         FROM mom""",
    "dedup_eval" -> {
      // the #23 estimate and the #25 exact statistic from the same
      // replayed candidate rows, both on the e6 grid, plus the error
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b,
           CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) * 1000000 // 32
             AS BIGINT) AS est_e6,
           CAST(len(list_intersect(hs_a, hs_b)) * 1000000
             // len(list_distinct(hs_a || hs_b)) AS BIGINT) AS exact_e6,
           CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) * 1000000 // 32
             - len(list_intersect(hs_a, hs_b)) * 1000000
               // len(list_distinct(hs_a || hs_b)) AS BIGINT) AS err_signed_e6
         FROM cand WHERE n_shared_bands >= 1"""
    },
    "q_hhi" ->
      // single-quotient HHI: (sum rev_i^2)*1e6 // (sum rev_i)^2 in
      // HUGEINT - shares never materialized, no per-supplier rounding
      """WITH bysupp AS (
           SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
           FROM lineitem GROUP BY 1),
         bynat AS (
           SELECT s.s_nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(rev) AS BIGINT) AS total_cents,
             sum(CAST(rev AS HUGEINT) * rev) AS sq,
             CAST(max(rev) AS BIGINT) AS max_rev
           FROM bysupp b JOIN supplier s ON s.s_suppkey = b.l_suppkey
           GROUP BY 1)
         SELECT CAST(b.s_nationkey AS BIGINT) AS nationkey, n.n_name,
           n_suppliers, total_cents,
           CAST((sq * 1000000) // (CAST(total_cents AS HUGEINT) * total_cents)
             AS BIGINT) AS hhi_e6,
           CAST((max_rev * 1000000) // total_cents AS BIGINT) AS cr1_e6
         FROM bynat b JOIN nation n ON n.n_nationkey = b.s_nationkey""",
    "text_textrank" ->
      // window-2 co-occurrence graph + the #124 integer e8 trajectory
      // unrolled 2 rounds; vertices = edge endpoints; top-20
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         pos AS (
           SELECT doc_id, e.p, e.w
           FROM (SELECT doc_id,
                   unnest([{'p': i - 1, 'w': tok[i]}
                           for i in generate_series(1, len(tok))]) AS e
                 FROM toks0)
           WHERE e.w NOT IN ('the','a','of','and','to','in','is','it','that','for')),
         pc AS (
           SELECT least(a.w, b.w) AS w_lo, greatest(a.w, b.w) AS w_hi,
             CAST(count(*) AS BIGINT) AS cw
           FROM pos a JOIN pos b
             ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
               AND a.w <> b.w
           GROUP BY 1, 2),
         e AS (
           SELECT w_lo AS src, w_hi AS dst, cw FROM pc
           UNION ALL SELECT w_hi, w_lo, cw FROM pc),
         ow AS (SELECT src, CAST(sum(cw) AS BIGINT) AS wout FROM e GROUP BY 1),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ow),
         r0 AS (SELECT src AS word, CAST(100000000 // n AS BIGINT) AS r FROM ow, nn),
         r1 AS (
           SELECT e.dst AS word,
             CAST(15 * 100000000 // (100 * n) + (85 * sum(r0.r * e.cw // ow.wout)) // 100
               AS BIGINT) AS r
           FROM e JOIN ow ON ow.src = e.src JOIN r0 ON r0.word = e.src, nn
           GROUP BY 1, n),
         r2 AS (
           SELECT e.dst AS word,
             CAST(15 * 100000000 // (100 * n) + (85 * sum(r1.r * e.cw // ow.wout)) // 100
               AS BIGINT) AS r
           FROM e JOIN ow ON ow.src = e.src JOIN r1 ON r1.word = e.src, nn
           GROUP BY 1, n)
         SELECT word, r AS tr_e8,
           CAST(row_number() OVER (ORDER BY r DESC, word) AS BIGINT) AS rank
         FROM r2 QUALIFY rank <= 20""",
    "mm_shard_pack" ->
      // sequential tar-writer assignment: shard = cum-bytes-before
      // div budget (shared MmShardBudgetBytes constant), then the
      // per-shard manifest aggregate
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents),
         cum AS (
           SELECT modality, doc_id, byte_len,
             CAST(coalesce(sum(byte_len) OVER (PARTITION BY modality ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
           FROM m)
         SELECT modality, cum_before // $MmShardBudgetBytes AS shard_file,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(byte_len) AS BIGINT) AS shard_bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM cum GROUP BY 1, 2""",
    "mm_shard_balance" ->
      // the packer replay rolled up per modality; moment-form CV2 and
      // straggler/fill quotients in HUGEINT
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents),
         cum AS (
           SELECT modality, doc_id, byte_len,
             CAST(coalesce(sum(byte_len) OVER (PARTITION BY modality ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
           FROM m),
         sh AS (
           SELECT modality, cum_before // $MmShardBudgetBytes AS shard_file,
             CAST(sum(byte_len) AS BIGINT) AS shard_bytes
           FROM cum GROUP BY 1, 2),
         agg AS (
           SELECT modality, CAST(count(*) AS BIGINT) AS n_shards,
             CAST(sum(shard_bytes) AS BIGINT) AS total_bytes,
             CAST(min(shard_bytes) AS BIGINT) AS min_bytes,
             CAST(max(shard_bytes) AS BIGINT) AS max_bytes,
             sum(CAST(shard_bytes AS HUGEINT) * shard_bytes) AS sb2
           FROM sh GROUP BY 1)
         SELECT modality, n_shards, total_bytes, min_bytes, max_bytes,
           CAST((n_shards * sb2 - CAST(total_bytes AS HUGEINT) * total_bytes)
                * 1000000 // (CAST(total_bytes AS HUGEINT) * total_bytes)
             AS BIGINT) AS cv2_e6,
           CAST(CAST(max_bytes AS HUGEINT) * n_shards * 1000000 // total_bytes
             AS BIGINT) AS straggler_e6,
           CAST(CAST(total_bytes AS HUGEINT) * 1000000
                // (n_shards * $MmShardBudgetBytes) AS BIGINT) AS fill_e6
         FROM agg""",
    "q_mix_shift" ->
      // Laspeyres-mix / current-weight-rate split on the e4 grid;
      // sign-factored single divisions of DECIMAL(38)/HUGEINT products
      """WITH cm AS (
           SELECT c.c_mktsegment AS segment,
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
                  + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2),
         tot AS (SELECT m, CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(s) AS BIGINT) AS st
                 FROM cm GROUP BY 1),
         valid AS (SELECT m FROM tot WHERE m + 1 IN (SELECT m FROM tot)),
         j AS (
           SELECT coalesce(c0.m, n1.m) AS m, coalesce(c0.segment, n1.segment) AS segment,
             coalesce(c0.n, 0) AS n0, coalesce(c0.s, 0) AS s0,
             coalesce(n1.n1, 0) AS n1, coalesce(n1.s1, 0) AS s1
           FROM cm c0
           FULL OUTER JOIN (SELECT segment, m - 1 AS m, n AS n1, s AS s1 FROM cm) n1
             ON n1.segment = c0.segment AND n1.m = c0.m),
         e AS (
           SELECT j.m, j.segment, j.n0, j.n1, j.s0, j.s1,
             t0.nt AS nt0, t1.nt AS nt1
           FROM j
           JOIN tot t0 ON t0.m = j.m
           JOIN tot t1 ON t1.m = j.m + 1
           WHERE j.m IN (SELECT m FROM valid))
         SELECT m, segment, n0, n1, s0 AS s0_c, s1 AS s1_c,
           CASE WHEN n0 > 0 AND n1 > 0 THEN 'both'
                WHEN n0 = 0 THEN 'new' ELSE 'gone' END AS status,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN (CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0 < 0
                   THEN -1 ELSE 1 END)
                * (abs((CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1 * n0)) AS BIGINT)
           END AS mix_e4,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1) * 10000
                   // (CAST(nt1 AS HUGEINT) * n0)) AS BIGINT)
           END AS rate_e4,
           CAST((CASE WHEN CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1 < 0
                 THEN -1 ELSE 1 END)
              * (abs(CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1) * 10000
                 // (CAST(nt0 AS HUGEINT) * nt1)) AS BIGINT) AS dcontrib_e4,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1))
              - (CASE WHEN (CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0 < 0
                   THEN -1 ELSE 1 END)
                * (abs((CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1 * n0))
              - (CASE WHEN CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1) * 10000
                   // (CAST(nt1 AS HUGEINT) * n0)) AS BIGINT)
           END AS resid_e4
         FROM e""",
    "cdc_erasure_audit" ->
      // per-key change-type census + final-op filter + 1-row corpus
      // clock; horizon interpolated from ErasureHorizonDays
      s"""WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         lastop AS (
           SELECT user_id, op AS final_op FROM (
             SELECT user_id, op, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM c)
           WHERE rn = 1),
         agg AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_history_rows,
             CAST(count(CASE WHEN op = 'INSERT' THEN 1 END) AS BIGINT) AS n_inserts,
             CAST(count(CASE WHEN op = 'UPDATE' THEN 1 END) AS BIGINT) AS n_updates,
             CAST(count(CASE WHEN op = 'DELETE' THEN 1 END) AS BIGINT) AS n_deletes,
             min(ts) AS first_ts, max(ts) AS last_ts
           FROM c GROUP BY 1),
         clock AS (SELECT max(ts) AS now_ts FROM c)
         SELECT a.user_id, n_history_rows, n_inserts, n_updates, n_deletes,
           first_ts, last_ts,
           (now_ts - last_ts) // 86400000000 AS tombstone_age_days,
           CAST(now_ts - last_ts >= $ErasureHorizonDays * CAST(86400000000 AS BIGINT)
             AS BIGINT) AS purge_eligible
         FROM agg a JOIN lastop l ON l.user_id = a.user_id, clock
         WHERE l.final_op = 'DELETE'""",
    "q_holt" ->
      // identical sign-factored dyadic trajectory as a recursive CTE
      // (shared holtCtes helper)
      s"""WITH ${holtCtes}
         SELECT event_type, day, y AS cents, l AS level_c, b AS trend_c,
           l + b AS forecast_next_c
         FROM rec""",
    "q_top_paths" ->
      // #16's sessionization + first-3 rank filter + path assembly +
      // alphabet-bounded top-10 with (count desc, path) tiebreak
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts, event_id, event_type
           FROM events),
         gaps AS (
           SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > 30 * 60 * 1000 * 1000
                     THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
           FROM gaps),
         steps AS (
           SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS step
           FROM sess QUALIFY step <= 3),
         paths AS (
           SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY step) AS path,
             CAST(count(*) AS BIGINT) AS n_steps
           FROM steps GROUP BY 1, 2),
         counts AS (
           SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
             min(n_steps) AS n_steps
           FROM paths GROUP BY 1)
         SELECT path, n_sessions, n_steps,
           CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
         FROM counts QUALIFY rank <= 10""",
    "q_ab_test" ->
      // the staged-quotient two-proportion z^2 replayed verbatim:
      // q1 = d^2 // (n1 n2), then q1 * N * 1e6 // (C (N - C))
      """WITH j AS (
           SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm_a,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
         arms AS (
           SELECT arm_a, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
           FROM j GROUP BY 1),
         w AS (
           SELECT max(CASE WHEN arm_a = 1 THEN n END) AS n1,
             max(CASE WHEN arm_a = 1 THEN c END) AS c1,
             max(CASE WHEN arm_a = 0 THEN n END) AS n2,
             max(CASE WHEN arm_a = 0 THEN c END) AS c2
           FROM arms)
         SELECT n1, c1, n2, c2,
           CAST(c1 * 1000000 // n1 AS BIGINT) AS rate_a_e6,
           CAST(c2 * 1000000 // n2 AS BIGINT) AS rate_b_e6,
           CAST(CASE WHEN c1 * n2 - c2 * n1 < 0 THEN -1 ELSE 1 END AS BIGINT) AS direction,
           CAST(((CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
               * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
               // (CAST(n1 AS HUGEINT) * n2))
               * (n1 + n2) * 1000000
             // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2 - c1 - c2)) AS BIGINT) AS z2_e6
         FROM w""",
    "q_markov_stationary" ->
      // #174's counts + 3 unrolled power-iteration rounds on the e6
      // grid; zero-mass states kept by the left join each round
      """WITH seq AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM t GROUP BY 1),
         st AS (SELECT DISTINCT state FROM
                (SELECT from_type AS state FROM t UNION ALL SELECT to_type FROM t)),
         kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
         p0 AS (SELECT state, CAST(1000000 // k AS BIGINT) AS pi FROM st, kk),
         p1 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p0.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p0 ON p0.state = t.from_type
             GROUP BY 1) x USING (state)),
         p2 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p1.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p1 ON p1.state = t.from_type
             GROUP BY 1) x USING (state)),
         p3 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p2.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p2 ON p2.state = t.from_type
             GROUP BY 1) x USING (state))
         SELECT state, pi AS pi_e6 FROM p3""",
    "q_control_chart" ->
      // squared 3-sigma inequality on the integer grid - no sqrt:
      // flag iff (c_d*T - C*n_d)^2 > 9*C*(T-C)*n_d
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_d
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS t, CAST(sum(c_d) AS BIGINT) AS ctot
                 FROM byday)
         SELECT day, n_d, c_d,
           CAST(c_d * 1000000 // n_d AS BIGINT) AS rate_e6,
           CAST((CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                  * (CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                > 9 * CAST(ctot AS HUGEINT) * (t - ctot) * n_d AS BIGINT)
             AS out_of_control,
           CAST((CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                  * (CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d) * 1000000
                // (9 * CAST(ctot AS HUGEINT) * (t - ctot) * n_d) AS BIGINT)
             AS dev_ratio_e6
         FROM byday, tot""",
    "ann_fps" -> fpsOracle(FpsK),
    "q_safety_stock" ->
      // weekly-demand moments + HUGEINT variance + the #226 one-ulp
      // isqrt clamp of 8*var (z^2 * L = 4 * 2)
      """WITH wd AS (
           SELECT l.l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS BIGINT) // 7 AS week,
             CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qw
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
         m AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(qw) AS BIGINT) AS sq,
             sum(CAST(qw AS HUGEINT) * qw) AS sqq
           FROM wd GROUP BY 1),
         v AS (
           SELECT l_partkey, n_weeks, sq,
             CAST((CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
               // (CAST(n_weeks AS HUGEINT) * (n_weeks - 1)) AS BIGINT) AS var_q,
             sq // n_weeks AS mean_w
           FROM m WHERE n_weeks >= 2),
         r AS (
           SELECT *, CAST(floor(sqrt(CAST(8 * var_q AS DOUBLE))) AS BIGINT) AS s0
           FROM v),
         c AS (
           SELECT l_partkey, n_weeks, sq, var_q, mean_w,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= 8 * var_q THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > 8 * var_q THEN 1 ELSE 0 END) AS ss
           FROM r)
         SELECT l_partkey, n_weeks, sq AS total_qty, mean_w AS mean_weekly_qty,
           var_q, ss AS safety_stock, 2 * mean_w + ss AS reorder_point
         FROM c""",
    "q_xyz_matrix" ->
      // #191's flat share replay crossed with the single-quotient
      // cv^2 classes; n_weeks = 1 parts are Z by convention
      """WITH rev AS (
           SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)) AS BIGINT))
               AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM rev),
         ranked AS (
           SELECT l_partkey, rev, sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
           FROM rev),
         classed AS (
           SELECT l_partkey, rev,
             CASE
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 800000
                 THEN 'A'
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 950000
                 THEN 'B'
               ELSE 'C' END AS abc_class
           FROM ranked, t),
         wd AS (
           SELECT l.l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS BIGINT) // 7 AS week,
             CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qw
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
         m AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(qw) AS BIGINT) AS sq,
             sum(CAST(qw AS HUGEINT) * qw) AS sqq
           FROM wd GROUP BY 1),
         xyz AS (
           SELECT l_partkey,
             CASE WHEN n_weeks < 2 THEN 'Z'
               WHEN (CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
                    * n_weeks * 1000000
                    // ((CAST(n_weeks AS HUGEINT) - 1) * CAST(sq AS HUGEINT) * sq)
                    < 250000 THEN 'X'
               WHEN (CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
                    * n_weeks * 1000000
                    // ((CAST(n_weeks AS HUGEINT) - 1) * CAST(sq AS HUGEINT) * sq)
                    < 1000000 THEN 'Y'
               ELSE 'Z' END AS xyz_class
           FROM m)
         SELECT c.abc_class, x.xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(c.rev) AS BIGINT) AS cell_revenue_usd,
           CAST((CAST(sum(c.rev) AS HUGEINT) * 1000000) // max(t.t) AS BIGINT)
             AS cell_share_e6
         FROM classed c JOIN xyz x ON x.l_partkey = c.l_partkey, t
         GROUP BY 1, 2""",
    "q_nation_similarity" ->
      // inverted-index pairing on the part key; union by
      // inclusion-exclusion; e6 integer Jaccard
      """WITH np AS (
           SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS nation, l.l_partkey
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey),
         sizes AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_parts
                   FROM np GROUP BY 1),
         inter AS (
           SELECT a.nation AS nation_a, b.nation AS nation_b,
             CAST(count(*) AS BIGINT) AS n_common
           FROM np a JOIN np b
             ON a.l_partkey = b.l_partkey AND a.nation < b.nation
           GROUP BY 1, 2)
         SELECT nation_a, nation_b, sa.n_parts AS na, sb.n_parts AS nb, n_common,
           CAST(n_common * 1000000 // (sa.n_parts + sb.n_parts - n_common) AS BIGINT)
             AS jaccard_e6
         FROM inter
         JOIN sizes sa ON sa.nation = inter.nation_a
         JOIN sizes sb ON sb.nation = inter.nation_b""",
    "q_discounted_ltv" ->
      // dyadic half-life decay: cents // 2^age, age from the 1-row
      // corpus clock, shift capped at 62
      """WITH o AS (
           SELECT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         clock AS (SELECT max(m) AS mmax FROM o)
         SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS raw_cents,
           CAST(sum(cents // CAST(pow(2, least(mmax - m, 62)) AS BIGINT)) AS BIGINT)
             AS discounted_cents
         FROM o, clock GROUP BY 1""",
    "q_burstiness" ->
      // single-quotient Fano factor: the n denominators cancel so no
      // intermediate division truncates
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS n_events,
             sum(CAST(c AS HUGEINT) * c) AS scc
           FROM daily GROUP BY 1)
         SELECT event_type, n_days, n_events,
           CAST((CAST(n_days AS HUGEINT) * scc
                 - CAST(n_events AS HUGEINT) * n_events) * 1000000
                // (CAST(n_days - 1 AS HUGEINT) * n_events) AS BIGINT) AS fano_e6
         FROM m WHERE n_days >= 2""",
    "q_fd_check" ->
      // per-candidate groupBy(lhs) + exact distinct-rhs counts; a
      // zero violation count is a contract, never an estimate
      """WITH
         f1 AS (
           SELECT 'nation' AS table_name, 'n_nationkey' AS lhs, 'n_regionkey' AS rhs,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
             CAST(max(nr) AS BIGINT) AS max_rhs_per_key
           FROM (SELECT CAST(n_nationkey AS VARCHAR) AS l,
                   count(DISTINCT CAST(n_regionkey AS VARCHAR)) AS nr
                 FROM nation GROUP BY 1)),
         f2 AS (
           SELECT 'part', 'p_brand', 'p_type',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(max(nr) AS BIGINT)
           FROM (SELECT p_brand AS l, count(DISTINCT p_type) AS nr
                 FROM part GROUP BY 1)),
         f3 AS (
           SELECT 'documents', 'source', 'lang',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(max(nr) AS BIGINT)
           FROM (SELECT source AS l, count(DISTINCT lang) AS nr
                 FROM documents GROUP BY 1)),
         f4 AS (
           SELECT 'events', 'user_id', 'event_type',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(max(nr) AS BIGINT)
           FROM (SELECT CAST(user_id AS VARCHAR) AS l,
                   count(DISTINCT event_type) AS nr
                 FROM events GROUP BY 1)),
         f5 AS (
           SELECT 'lineitem', 'l_partkey', 'l_suppkey',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(max(nr) AS BIGINT)
           FROM (SELECT CAST(l_partkey AS VARCHAR) AS l,
                   count(DISTINCT CAST(l_suppkey AS VARCHAR)) AS nr
                 FROM lineitem GROUP BY 1)),
         u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
               UNION ALL SELECT * FROM f4 UNION ALL SELECT * FROM f5)
         SELECT *, CAST(n_violating_keys = 0 AS BIGINT) AS holds FROM u""",
    "q_heatmap_2d" ->
      // twice-applied #233 integer binning from 1-row min/max scalars
      """WITH per AS (
           SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(floor(any_value(o.o_totalprice) * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1),
         b AS (SELECT min(v) AS xlo, max(v) AS xhi,
                 min(n_lines) AS ylo, max(n_lines) AS yhi FROM per)
         SELECT ((v - xlo) * 8) // (xhi - xlo + 1) AS xbin,
           ((n_lines - ylo) * 8) // (yhi - ylo + 1) AS ybin,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(v) AS BIGINT) AS cell_cents
         FROM per, b GROUP BY 1, 2""",
    "q_forecast_backtest" ->
      // the shared Holt trajectory + one per-series lag pass scoring
      // one-step-ahead Holt vs naive forecasts
      s"""WITH ${holtCtes},
         f AS (
           SELECT event_type, day, y,
             lag(l + b) OVER (PARTITION BY event_type ORDER BY day) AS prev_forecast,
             lag(y) OVER (PARTITION BY event_type ORDER BY day) AS prev_y
           FROM rec)
         SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_evaluated,
           CAST(sum(abs(y - prev_forecast)) AS BIGINT) AS holt_sae_c,
           CAST(sum(abs(y - prev_y)) AS BIGINT) AS naive_sae_c,
           CAST(sum(abs(y - prev_forecast)) // count(*) AS BIGINT) AS holt_mae_c,
           CAST(sum(abs(y - prev_y)) // count(*) AS BIGINT) AS naive_mae_c,
           CAST(sum(abs(y - prev_forecast)) < sum(abs(y - prev_y)) AS BIGINT) AS holt_wins
         FROM f WHERE prev_forecast IS NOT NULL
         GROUP BY 1""",
    "q_interpolate_gaps" ->
      // generate_series gap fill with the sign-factored interpolation
      // quotient; observed days pass through flagged 0
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         nx AS (
           SELECT event_type, day, c,
             lead(day) OVER (PARTITION BY event_type ORDER BY day) AS next_day,
             lead(c) OVER (PARTITION BY event_type ORDER BY day) AS next_c
           FROM daily),
         obs AS (
           SELECT event_type, day, c AS cents, CAST(0 AS BIGINT) AS is_interpolated
           FROM nx),
         g0 AS (
           SELECT event_type, day, c, next_day, next_c,
             unnest(range(day + 1, next_day)) AS d
           FROM nx WHERE next_day IS NOT NULL AND next_day > day + 1),
         gaps AS (
           SELECT event_type, d AS day,
             c + (CASE WHEN (next_c - c) * (d - day) < 0
                  THEN -((-((next_c - c) * (d - day))) // (next_day - day))
                  ELSE ((next_c - c) * (d - day)) // (next_day - day) END) AS cents,
             CAST(1 AS BIGINT) AS is_interpolated
           FROM g0)
         SELECT * FROM obs UNION ALL SELECT * FROM gaps""",
    "q_power_analysis" ->
      // (z_a/2 + z_b)^2 derived from the shared PowerZsumE3 constant;
      // ceil-div with cleared denominators in HUGEINT
      s"""WITH tot AS (
           SELECT CAST(count(*) AS BIGINT) AS t,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c
           FROM orders),
         mdes AS (SELECT CAST(unnest(range(1, 11)) * 50 AS BIGINT) AS mde_bp)
         SELECT mde_bp,
           CAST(c * 1000000 // t AS BIGINT) AS baseline_rate_e6,
           CAST((2 * CAST(c AS HUGEINT) * (t - c) * ${PowerZsumE3 * PowerZsumE3} * 100000000
                 + (CAST(t AS HUGEINT) * t * mde_bp * mde_bp * 1000000) - 1)
               // (CAST(t AS HUGEINT) * t * mde_bp * mde_bp * 1000000) AS BIGINT)
             AS n_per_arm
         FROM mdes, tot""",
    "q_peak_concurrency" ->
      // sessionize -> half-open +1/-1 endpoint sweep; FLAT global
      // order replay of the hierarchical day-carry construction
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
         gaps AS (
           SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > 30 * 60 * 1000 * 1000
                     THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id,
             ts
           FROM gaps),
         iv AS (SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
                FROM sess GROUP BY 1, 2),
         ep AS (
           SELECT s AS ts, CAST(1 AS BIGINT) AS delta FROM iv
           UNION ALL SELECT e + 1, CAST(-1 AS BIGINT) FROM iv),
         sweep AS (
           SELECT ts, delta, ts // 86400000000 AS day,
             CAST(sum(delta) OVER (ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
           FROM ep)
         SELECT day, conc AS peak_concurrency, ts AS peak_first_ts
         FROM (SELECT day, conc, ts,
                 row_number() OVER (PARTITION BY day ORDER BY conc DESC, ts) AS rn
               FROM sweep)
         WHERE rn = 1""",
    "q_partition_skew" ->
      // md5-parity hash60 bucket replay + <= P-row rollup
      """WITH per AS (
           SELECT ('0x' || substr(md5('graft-ps-1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 32 AS bucket,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY user_id),
         byb AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows
           FROM per GROUP BY 1),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t, CAST(max(n_rows) AS BIGINT) AS mx,
                 CAST(count(*) AS BIGINT) AS nb FROM byb)
         SELECT bucket, n_keys, n_rows,
           CAST(n_rows * 1000000 // t AS BIGINT) AS row_share_e6,
           CAST((mx * nb * 1000000) // t AS BIGINT) AS max_over_mean_e6
         FROM byb, t""",
    "q_new_vs_repeat" ->
      // whole-first-month-is-new convention; exact integer months/cents
      """WITH o AS (
           SELECT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1),
         j AS (
           SELECT o.m, o.cents, CASE WHEN o.m = f.m0 THEN 1 ELSE 0 END AS is_new
           FROM o JOIN f ON f.o_custkey = o.o_custkey)
         SELECT m AS month, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(is_new) AS BIGINT) AS n_new_orders,
           CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT) AS new_cents,
           CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT) AS repeat_cents,
           CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END) * 1000000
             // greatest(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END)
                        + sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END), 1) AS BIGINT)
             AS repeat_share_e6
         FROM j GROUP BY 1""",
    "q_stickiness" ->
      // dau over the #193 explode-covered trailing-7d distinct
      """WITH pres AS (
           SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
         dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
                 FROM pres GROUP BY 1),
         days AS (SELECT DISTINCT day AS target_day FROM pres),
         cov AS (
           SELECT unnest(range(day, day + 7)) AS target_day, user_id FROM pres),
         wau AS (
           SELECT c.target_day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau_7d
           FROM cov c JOIN days d ON d.target_day = c.target_day
           GROUP BY 1)
         SELECT dau.day, dau.dau, wau.wau_7d,
           CAST(dau * 1000000 // wau_7d AS BIGINT) AS stickiness_e6
         FROM dau JOIN wau ON wau.target_day = dau.day""",
    "q_repurchase_cycle" ->
      // per-customer lag gaps + lower discrete median at (g+1) div 2
      // under the (gap, orderkey) total order + the date-latest gap
      """WITH o AS (
           SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS d
           FROM orders),
         g AS (
           SELECT o_custkey, o_orderkey, d,
             d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
           FROM o QUALIFY gap IS NOT NULL),
         r AS (
           SELECT o_custkey, gap,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY gap, o_orderkey) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS gg
           FROM g),
         med AS (
           SELECT o_custkey, gg AS n_gaps, gap AS median_gap_days
           FROM r WHERE rn = (gg + 1) // 2),
         lastg AS (
           SELECT o_custkey, gap AS last_gap_days
           FROM (SELECT o_custkey, gap,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY d DESC, o_orderkey DESC) AS rl
                 FROM g)
           WHERE rl = 1)
         SELECT m.o_custkey, n_gaps, median_gap_days, last_gap_days,
           CAST(last_gap_days * 1000000 // greatest(median_gap_days, 1) AS BIGINT)
             AS overdue_ratio_e6
         FROM med m JOIN lastg l ON l.o_custkey = m.o_custkey""",
    "text_heaps" ->
      // FLAT global doc-rank replay of the hierarchical build; the
      // doubling checkpoints derive from the corpus count
      """WITH docs AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM docs),
         cps AS (
           SELECT DISTINCT CAST(CASE WHEN pow(2, i) < c THEN pow(2, i) ELSE c END
             AS BIGINT) AS n_docs
           FROM generate_series(1, 40) g(i), n),
         rk AS (
           SELECT doc_id,
             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rank,
             CAST(len(tok) AS BIGINT) AS n_tok
           FROM docs),
         fo AS (
           SELECT t.term, min(r.rank) AS first_rank
           FROM (SELECT doc_id, unnest(list_distinct(tok)) AS term FROM docs) t
           JOIN rk r ON r.doc_id = t.doc_id GROUP BY 1),
         v AS (
           SELECT n_docs, CAST(count(*) AS BIGINT) AS vocab_size
           FROM cps, fo WHERE first_rank <= n_docs GROUP BY 1),
         tk AS (
           SELECT n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM cps, rk WHERE rank <= n_docs GROUP BY 1)
         SELECT v.n_docs, tk.n_tokens, v.vocab_size
         FROM v JOIN tk ON tk.n_docs = v.n_docs""",
    "text_clumping" ->
      // per-(term, doc) counts -> per-term (cf, df); top-25 by
      // (clump desc, term)
      """WITH pd AS (
           SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
                 FROM documents)
           GROUP BY 1, 2),
         t AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS cf, CAST(max(c) AS BIGINT) AS max_in_doc
           FROM pd GROUP BY 1)
         SELECT term, df, cf, max_in_doc,
           (cf * 1000000) // df AS clump_e6,
           CAST(row_number() OVER (ORDER BY (cf * 1000000) // df DESC, term)
             AS BIGINT) AS rank
         FROM t WHERE df >= 5
         QUALIFY rank <= 25""",
    "q_dup_payments" ->
      // planted mod-499 resubmissions (the #5 precedent) + exact-cents
      // triple grouping; at-risk counts copies beyond one
      """WITH o AS (
           SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_date,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         aug AS (
           SELECT * FROM o
           UNION ALL SELECT * FROM o WHERE o_orderkey % 499 = 0)
         SELECT o_custkey, o_date, cents,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST((count(*) - 1) * cents AS BIGINT) AS at_risk_cents
         FROM aug GROUP BY 1, 2, 3 HAVING count(*) > 1""",
    "q_structuring" ->
      // planted mod-977 quarter-splits + self-calibrating p90
      // threshold via the flat rank replay; same-day rollup
      """WITH base AS (
           SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_date,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         pl AS (
           SELECT o_custkey,
             o_orderkey * 10 + i + 100000000 AS o_orderkey, o_date,
             CASE WHEN i < 4 THEN cents // 4 ELSE cents - 3 * (cents // 4) END AS cents
           FROM base, unnest(range(1, 5)) r(i)
           WHERE o_orderkey % 977 = 0),
         o AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
         r AS (
           SELECT cents AS v,
             CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rn
           FROM o),
         thr AS (
           SELECT min(v) AS threshold_cents
           FROM r, n WHERE rn >= ((n + 1) * 9) // 10)
         SELECT o_custkey, o_date, threshold_cents,
           CAST(count(*) AS BIGINT) AS n_small_orders,
           CAST(sum(cents) AS BIGINT) AS day_total_cents
         FROM o, thr WHERE cents < threshold_cents
         GROUP BY 1, 2, 3
         HAVING count(*) >= 3 AND sum(cents) >= max(threshold_cents)""",
    "ann_cell_balance" -> {
      // composed #29 assignment replay + <= k-row balance rollup
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH c AS (SELECT label, [$terms] AS centroid
                     FROM embeddings GROUP BY label),
          a AS (
            SELECT vec_id, label, assigned_label FROM (
              SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
                CAST(c.label AS BIGINT) AS assigned_label,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) DESC, c.label) AS rn
              FROM embeddings e, c)
            WHERE rn = 1),
          byc AS (
            SELECT assigned_label AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(sum(CASE WHEN label = assigned_label THEN 1 ELSE 0 END) AS BIGINT)
                AS n_pure
            FROM a GROUP BY 1),
          t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t, CAST(max(n_vecs) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS nc FROM byc)
          SELECT cell, n_vecs,
            CAST(n_vecs * 1000000 // t AS BIGINT) AS share_e6,
            CAST(n_pure * 1000000 // n_vecs AS BIGINT) AS purity_e6,
            CAST((mx * nc * 1000000) // t AS BIGINT) AS max_over_mean_e6
          FROM byc, t"""
    },
    "q_lag_features" ->
      // past-only lags and trailing frames per series
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, y,
           lag(y, 1) OVER w AS lag1,
           lag(y, 7) OVER w AS lag7,
           CAST(coalesce(sum(y) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail7_sum,
           ((day % 7) + 7) % 7 AS dow
         FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)""",
    "q_target_encoding" ->
      // leave-one-out smoothed rate; prior precomputed once on the
      // e6 grid; m = 20
      """WITH o AS (
           SELECT o.o_orderkey, c.c_mktsegment,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
         seg AS (
           SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(y) AS BIGINT) AS c_seg
           FROM o GROUP BY 1),
         p AS (SELECT CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS prior_e6 FROM o)
         SELECT o.o_orderkey, o.c_mktsegment, CAST(o.y AS BIGINT) AS y,
           CAST(((c_seg - y) * 1000000 + prior_e6 * 20)
             // (n_seg - 1 + 20) AS BIGINT) AS enc_e6
         FROM o JOIN seg USING (c_mktsegment), p""",
    "q_hash_collisions" ->
      // md5-parity hash60 placement over the distinct category set at
      // three widths
      """WITH cats AS (
           SELECT DISTINCT p_brand || '|' || p_type AS cat FROM part),
         w AS (SELECT CAST(unnest([256, 1024, 4096]) AS BIGINT) AS width),
         b AS (
           SELECT width,
             ('0x' || substr(md5('graft-fh-1:' || cat), 1, 15))::BIGINT % width AS b
           FROM cats, w),
         occ AS (
           SELECT width, b, CAST(count(*) AS BIGINT) AS n_in_bucket
           FROM b GROUP BY 1, 2)
         SELECT width, CAST(sum(n_in_bucket) AS BIGINT) AS n_categories,
           CAST(count(*) AS BIGINT) AS n_occupied,
           CAST(sum(CASE WHEN n_in_bucket > 1 THEN n_in_bucket ELSE 0 END) AS BIGINT)
             AS n_colliding,
           CAST(sum(CASE WHEN n_in_bucket > 1 THEN n_in_bucket ELSE 0 END) * 1000000
             // sum(n_in_bucket) AS BIGINT) AS collision_rate_e6
         FROM occ GROUP BY 1""",
    "q_eoq" ->
      // Wilson lot size on the integer grid: x = (2*D*S) // h with
      // S = 10000 cents, then the #226 one-ulp isqrt clamp
      """WITH d AS (
           SELECT l_partkey,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS demand_qty
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT d.l_partkey, d.demand_qty,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS h_cents
           FROM d JOIN part p ON p.p_partkey = d.l_partkey
           WHERE CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) >= 1
             AND d.demand_qty >= 1),
         x AS (
           SELECT *, CAST((2 * CAST(demand_qty AS HUGEINT) * 10000) // h_cents AS BIGINT) AS x
           FROM j),
         r AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS s0 FROM x),
         c AS (
           SELECT l_partkey, demand_qty, h_cents,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END) AS eoq_qty
           FROM r)
         SELECT l_partkey, demand_qty, h_cents, eoq_qty,
           CASE WHEN eoq_qty > 0 THEN demand_qty // eoq_qty ELSE NULL END AS n_orders_implied
         FROM c""",
    "q_nelson_aalen" ->
      // #234's step table + e9-truncated per-step hazard increments
      """WITH bc AS (
           SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m0,
             max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m1
           FROM orders GROUP BY 1),
         mx AS (SELECT max(m1) AS mmax FROM bc),
         lf AS (
           SELECT CAST(m1 - m0 AS BIGINT) AS t,
             CASE WHEN m1 < mmax - 2 THEN 1 ELSE 0 END AS death
           FROM bc, mx),
         bt AS (
           SELECT t, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(death) AS BIGINT) AS d
           FROM lf GROUP BY 1),
         wr AS (
           SELECT t, d,
             CAST(sum(cnt) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
           FROM bt)
         SELECT t, n AS n_risk, d,
           (d * 1000000000) // n AS hazard_e9,
           CAST(sum((d * 1000000000) // n) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_hazard_e9
         FROM wr""",
    "q_logrank" ->
      // per-step hypergeometric E and V as e9-truncated HUGEINT
      // quotients; chi2 on the e6 grid from the summed integer terms
      """WITH bc AS (
           SELECT o.o_custkey,
             min(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1) AS m0,
             max(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1) AS m1,
             max(c.c_mktsegment) AS seg
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1),
         mx AS (SELECT max(m1) AS mmax FROM bc),
         lf AS (
           SELECT CAST(m1 - m0 AS BIGINT) AS t,
             CASE WHEN m1 < mmax - 2 THEN 1 ELSE 0 END AS death,
             CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END AS is_a
           FROM bc, mx),
         bt AS (
           SELECT t,
             CAST(sum(is_a) AS BIGINT) AS cnt_a,
             CAST(count(*) - sum(is_a) AS BIGINT) AS cnt_b,
             CAST(sum(death * is_a) AS BIGINT) AS d_a,
             CAST(sum(death * (1 - is_a)) AS BIGINT) AS d_b
           FROM lf GROUP BY 1),
         sfx AS (
           SELECT *,
             CAST(sum(cnt_a) OVER w AS BIGINT) AS n_a,
             CAST(sum(cnt_b) OVER w AS BIGINT) AS n_b
           FROM bt
           WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         st AS (SELECT *, d_a + d_b AS dd, n_a + n_b AS nn FROM sfx),
         terms AS (
           SELECT *,
             CASE WHEN dd > 0 AND nn > 1
               THEN CAST((CAST(dd AS HUGEINT) * n_a * 1000000000) // nn AS BIGINT)
               ELSE 0 END AS e_a_e9,
             CASE WHEN dd > 0 AND nn > 1
               THEN CAST((CAST(dd AS HUGEINT) * n_a * n_b * (nn - dd) * 1000000000)
                    // (CAST(nn AS HUGEINT) * nn * (nn - 1)) AS BIGINT)
               ELSE 0 END AS v_e9
           FROM st),
         agg AS (
           SELECT CAST(sum(cnt_a) AS BIGINT) AS n_cust_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_cust_b,
             CAST(sum(d_a) AS BIGINT) AS o_a, CAST(sum(d_b) AS BIGINT) AS o_b,
             CAST(sum(e_a_e9) AS BIGINT) AS e_a_e9, CAST(sum(v_e9) AS BIGINT) AS v_e9
           FROM terms)
         SELECT n_cust_a, n_cust_b, o_a, o_b, e_a_e9, v_e9,
           CASE WHEN v_e9 > 0 THEN
             CAST((CAST(o_a AS HUGEINT) * 1000000000 - e_a_e9)
                  * (CAST(o_a AS HUGEINT) * 1000000000 - e_a_e9) // v_e9 // 1000 AS BIGINT)
           ELSE NULL END AS chi2_e6
         FROM agg""",
    "q_lift_table" ->
      // #232's hierarchical strictly-above prefix (desc), tie-block
      // deciles, e6 rates/lifts through HUGEINT
      """WITH bv AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
           FROM orders GROUP BY 1),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM bv),
         sh AS (SELECT bv.*, ((hi - v) * 8) // (hi - lo + 1) AS shard FROM bv, b),
         loc AS (
           SELECT *, COALESCE(sum(n_rows) OVER (PARTITION BY shard ORDER BY v DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS local_above
           FROM sh),
         osh AS (SELECT shard, sum(n_rows) AS c FROM sh GROUP BY 1),
         ofs AS (
           SELECT shard, COALESCE(sum(c) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM osh),
         tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS nt,
                   CAST(sum(n_pos) AS BIGINT) AS pt FROM bv),
         dec AS (
           SELECT ((off + local_above) * 10) // nt AS decile, l.n_rows, l.n_pos
           FROM loc l JOIN ofs USING (shard), tot),
         g AS (SELECT decile, CAST(sum(n_rows) AS BIGINT) AS n,
                 CAST(sum(n_pos) AS BIGINT) AS n_pos
               FROM dec GROUP BY 1),
         cum AS (
           SELECT *, CAST(sum(n) OVER w AS BIGINT) AS cum_n,
             CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos
           FROM g WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
           CAST(n_pos * 1000000 // n AS BIGINT) AS rate_e6,
           CAST((CAST(n_pos AS HUGEINT) * nt * 1000000)
             // (CAST(n AS HUGEINT) * pt) AS BIGINT) AS lift_e6,
           CAST(cum_pos * 1000000 // pt AS BIGINT) AS cum_gain_e6,
           CAST((CAST(cum_pos AS HUGEINT) * nt * 1000000)
             // (CAST(cum_n AS HUGEINT) * pt) AS BIGINT) AS cum_lift_e6
         FROM cum, tot""",
    "q_modularity" ->
      // distinct basket edges, brand labels, per-brand Newman
      // contribution (4m*m_c - deg_c^2) with the sign-factored e6 div
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS part_a, b.l_partkey AS part_b
           FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
           JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         lab AS (
           SELECT e.part_a, e.part_b, pa.p_brand AS brand_a, pb.p_brand AS brand_b
           FROM e JOIN part pa ON pa.p_partkey = e.part_a
                  JOIN part pb ON pb.p_partkey = e.part_b),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
         intra AS (
           SELECT brand_a AS p_brand, CAST(count(*) AS BIGINT) AS intra_edges
           FROM lab WHERE brand_a = brand_b GROUP BY 1),
         ends AS (
           SELECT part_a AS node, brand_a AS p_brand FROM lab
           UNION ALL
           SELECT part_b AS node, brand_b AS p_brand FROM lab),
         deg AS (
           SELECT p_brand, CAST(count(*) AS BIGINT) AS deg_sum,
             CAST(count(DISTINCT node) AS BIGINT) AS n_parts
           FROM ends GROUP BY 1)
         SELECT d.p_brand, d.n_parts,
           CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges, d.deg_sum,
           CAST(4 * CAST(m.m AS HUGEINT) * COALESCE(i.intra_edges, 0)
                - CAST(d.deg_sum AS HUGEINT) * d.deg_sum AS BIGINT) AS contrib_num,
           CAST((CASE WHEN 4 * CAST(m.m AS HUGEINT) * COALESCE(i.intra_edges, 0)
                           - CAST(d.deg_sum AS HUGEINT) * d.deg_sum < 0 THEN -1 ELSE 1 END)
                * (abs(4 * CAST(m.m AS HUGEINT) * COALESCE(i.intra_edges, 0)
                       - CAST(d.deg_sum AS HUGEINT) * d.deg_sum) * 1000000
                   // (4 * CAST(m.m AS HUGEINT) * m.m)) AS BIGINT) AS contrib_e6
         FROM deg d LEFT JOIN intra i ON i.p_brand = d.p_brand, m""",
    // 4 unrolled synchronous LPA rounds over the support-2 weighted
    // graph — shared CTE prefix with q_label_prop_eval
    "q_label_prop" -> labelPropOracle,
    "q_label_prop_eval" -> labelPropEvalOracle,
    "q_adamic_adar" ->
      // same wedge/cap contract as q_link_prediction, scored with the
      // per-center e6 term floor(1e6/ln(deg)+0.5); ln of an exact
      // integer degree, quantized per term then summed
      """WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         adj AS (
           SELECT x.u, x.v,
             CAST(floor(1000000.0 / ln(CAST(d.deg AS DOUBLE)) + 0.5) AS BIGINT) AS term_e6
           FROM (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e) x
           JOIN deg d ON d.node = x.u
           WHERE d.deg <= 64),
         sc AS (
           SELECT a1.v AS pa, a2.v AS pb, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(a1.term_e6) AS BIGINT) AS aa_e6
           FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
           GROUP BY 1, 2)
         SELECT pa, pb, cn, aa_e6 FROM sc
         WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = sc.pa AND e.pb = sc.pb)
         ORDER BY aa_e6 DESC, cn DESC, pa, pb LIMIT 100""",
    // binary-segmentation first split: prefix sums only (the Σx²
    // terms cancel), each Σ²/n one truncating HUGEINT division,
    // gain floored at 0 before the //10000 rescale (negative operands
    // would split div-toward-zero from floor-//)
    // Knuth multiplicative-hash high-bit relabelings, exact
    // centi-cent mean diffs, p on the e6 grid over the bit-identical
    // null distribution
    "q_permutation_test" ->
      """WITH base AS (
           SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
           FROM orders JOIN customer ON c_custkey = o_custkey),
         obs AS (
           SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             abs(CAST(sum(CASE WHEN g = 1 THEN c END) * 100
                   // sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               - CAST(sum(CASE WHEN g = 0 THEN c END) * 100
                   // sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)) AS observed_diff
           FROM base),
         nulls AS (
           SELECT bi,
             abs(CAST(sum(CASE WHEN gb = 1 THEN c END) * 100
                   // nullif(sum(CASE WHEN gb = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
               - CAST(sum(CASE WHEN gb = 0 THEN c END) * 100
                   // nullif(sum(CASE WHEN gb = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)) AS diff
           FROM (SELECT b.o_orderkey, b.c, bi,
                   CASE WHEN (b.o_orderkey * 2654435761 + bi * 2246822519)
                             % 4294967296 >= 2147483648
                        THEN 1 ELSE 0 END AS gb
                 FROM base b, (SELECT unnest(range(0, 200)) AS bi))
           GROUP BY bi
           HAVING sum(CASE WHEN gb = 1 THEN 1 ELSE 0 END) > 0
              AND sum(CASE WHEN gb = 0 THEN 1 ELSE 0 END) > 0)
         SELECT obs.n1 AS n_building, obs.n0 AS n_rest,
           obs.observed_diff AS observed_diff_cc,
           CAST(count(*) AS BIGINT) AS b_valid,
           CAST(sum(CASE WHEN diff >= observed_diff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ge,
           CAST((1 + sum(CASE WHEN diff >= observed_diff THEN 1 ELSE 0 END)) * 1000000
             // (count(*) + 1) AS BIGINT) AS p_e6
         FROM nulls, obs
         GROUP BY obs.n1, obs.n0, obs.observed_diff""",
    // ML chain argmax per state + global-majority baseline, both
    // scored over the log's transition counts
    "q_markov_prediction" ->
      """WITH tr AS (
           SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
           FROM events),
         c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM tr
               WHERE b IS NOT NULL GROUP BY a, b),
         pred AS (SELECT a, b AS predicted_next FROM (
                   SELECT a, b, row_number() OVER (PARTITION BY a
                     ORDER BY n DESC, b) AS rn FROM c) WHERE rn = 1),
         g AS (SELECT b AS baseline_next FROM (
                 SELECT b, sum(n) AS nb FROM c GROUP BY b
                 ORDER BY nb DESC, b LIMIT 1))
         SELECT c.a AS state, pred.predicted_next,
           CAST(sum(c.n) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN c.b = pred.predicted_next THEN c.n ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(sum(CASE WHEN c.b = pred.predicted_next THEN c.n ELSE 0 END) * 1000000
             // sum(c.n) AS BIGINT) AS accuracy_e6,
           g.baseline_next,
           CAST(sum(CASE WHEN c.b = g.baseline_next THEN c.n ELSE 0 END) AS BIGINT)
             AS n_baseline_correct,
           CAST(sum(CASE WHEN c.b = g.baseline_next THEN c.n ELSE 0 END) * 1000000
             // sum(c.n) AS BIGINT) AS baseline_acc_e6
         FROM c JOIN pred USING (a), g
         GROUP BY c.a, pred.predicted_next, g.baseline_next""",
    // WOE/IV: doubles of exact count ratios, e6-quantized per bin;
    // zero-class bins NULL WOE / 0 IV (strict, no smoothing)
    "q_woe_iv" ->
      """WITH base AS (
           SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END AS pos,
             c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nat
           FROM orders JOIN customer ON c_custkey = o_custkey),
         stacked AS (
           SELECT 'mktsegment' AS feature, seg AS bin, pos FROM base
           UNION ALL SELECT 'nation', nat, pos FROM base),
         tot AS (SELECT CAST(sum(pos) AS BIGINT) AS total_pos,
                   CAST(count(*) - sum(pos) AS BIGINT) AS total_neg FROM base)
         SELECT feature, bin, n_pos, n_neg,
           CAST(n_pos * 1000000 // total_pos AS BIGINT) AS pct_pos_e6,
           CAST(n_neg * 1000000 // total_neg AS BIGINT) AS pct_neg_e6,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(floor(ln((CAST(n_pos AS DOUBLE) * total_neg)
                          / (CAST(n_neg AS DOUBLE) * total_pos)) * 1e6 + 0.5) AS BIGINT)
           END AS woe_e6,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(floor((CAST(n_pos AS DOUBLE) / total_pos
                       - CAST(n_neg AS DOUBLE) / total_neg)
                      * ln((CAST(n_pos AS DOUBLE) * total_neg)
                          / (CAST(n_neg AS DOUBLE) * total_pos)) * 1e6 + 0.5) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS iv_term_e6
         FROM (SELECT feature, bin, CAST(sum(pos) AS BIGINT) AS n_pos,
                 CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
               FROM stacked GROUP BY feature, bin), tot""",
    "q_binseg_gain" ->
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         pre AS (
           SELECT day, CAST(count(*) OVER (ORDER BY day) AS BIGINT) AS nl,
             CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS sxl
           FROM byday),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
                 FROM byday),
         cand AS (
           SELECT day AS split_day, nl AS n_left, n - nl AS n_right,
             CAST(sxl // nl AS BIGINT) AS mean_left_cents,
             CAST((sx - sxl) // (n - nl) AS BIGINT) AS mean_right_cents,
             CAST(greatest(
                 ((sxl // 1000)::HUGEINT * (sxl // 1000)) // nl
               + (((sx - sxl) // 1000)::HUGEINT * ((sx - sxl) // 1000)) // (n - nl)
               - ((sx // 1000)::HUGEINT * (sx // 1000)) // n, 0) AS BIGINT) AS gain_kc2
           FROM pre, tot WHERE nl < n)
         SELECT split_day, n_left, n_right, mean_left_cents, mean_right_cents, gain_kc2, rank
         FROM (SELECT *, CAST(row_number() OVER (ORDER BY gain_kc2 DESC, split_day)
                 AS BIGINT) AS rank FROM cand)
         WHERE rank <= 5""",
    "q_imr_chart" ->
      // cross-multiplied I-MR limits: |x*n - Sx|*1128*n1 > 3000*Smr*n
      // and mr*1000*n1 > 3267*Smr, HUGEINT products
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         mr AS (SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS mr FROM byday),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                  CAST(count(mr) AS BIGINT) AS n1, CAST(sum(mr) AS BIGINT) AS smr
                FROM mr)
         SELECT day, x AS x_c, CAST(mr AS BIGINT) AS mr_c, n AS n_days,
           CAST(CASE WHEN abs(CAST(x AS HUGEINT) * n - sx) * 1128 * n1
                          > 3000 * CAST(smr AS HUGEINT) * n
                THEN 1 ELSE 0 END AS BIGINT) AS x_ooc,
           CAST(CASE WHEN mr IS NOT NULL
                          AND CAST(mr AS HUGEINT) * 1000 * n1
                              > 3267 * CAST(smr AS HUGEINT)
                THEN 1 ELSE 0 END AS BIGINT) AS mr_ooc
         FROM mr, st""",
    "q_xbar_r" ->
      // cross-multiplied X̄-R limits on the weekly sums (n=7 subgroup
      // constants A2/D3/D4 as exact rationals): |s*W - Ss|*1000 >
      // 2933*Sr, r*1000*W >< 1924/76*Sr; HUGEINT products
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         wk AS (
           SELECT day // 7 AS week, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(x) AS BIGINT) AS s, CAST(max(x) - min(x) AS BIGINT) AS r
           FROM byday GROUP BY 1 HAVING count(*) = 7),
         st AS (SELECT CAST(count(*) AS BIGINT) AS w, CAST(sum(s) AS BIGINT) AS ss,
                  CAST(sum(r) AS BIGINT) AS sr
                FROM wk)
         SELECT week, s AS s_c, r AS r_c, w AS n_weeks,
           CAST(CASE WHEN abs(CAST(s AS HUGEINT) * w - ss) * 1000
                          > 2933 * CAST(sr AS HUGEINT)
                THEN 1 ELSE 0 END AS BIGINT) AS xbar_ooc,
           CAST(CASE WHEN CAST(r AS HUGEINT) * 1000 * w > 1924 * CAST(sr AS HUGEINT)
                THEN 1 ELSE 0 END AS BIGINT) AS r_high_ooc,
           CAST(CASE WHEN CAST(r AS HUGEINT) * 1000 * w < 76 * CAST(sr AS HUGEINT)
                THEN 1 ELSE 0 END AS BIGINT) AS r_low_ooc
         FROM wk, st""",
    "q_nrr" ->
      // base-month cohort revenue re-measured in m+1; e6 ratios by
      // truncating division (all magnitudes positive so // == div)
      """WITH cm AS (
           SELECT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev0
           FROM orders GROUP BY 1, 2),
         months AS (SELECT DISTINCT m FROM cm),
         valid AS (SELECT m FROM months
                   WHERE m + 1 IN (SELECT m FROM months)),
         j AS (
           SELECT coalesce(c.o_custkey, n.o_custkey) AS cust,
             coalesce(c.m, n.m) AS m, c.rev0, n.rev1
           FROM cm c
           FULL OUTER JOIN (SELECT o_custkey, m - 1 AS m, rev0 AS rev1 FROM cm) n
             ON n.o_custkey = c.o_custkey AND n.m = c.m),
         f AS (
           SELECT m, CAST(count(rev0) AS BIGINT) AS n_base,
             CAST(count(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                             THEN 1 END) AS BIGINT) AS n_retained,
             CAST(coalesce(sum(rev0), 0) AS BIGINT) AS base_c,
             CAST(coalesce(sum(CASE WHEN rev0 IS NOT NULL THEN rev1 END), 0)
                  AS BIGINT) AS retained_c,
             CAST(coalesce(sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                                    THEN least(rev0, rev1) END), 0)
                  AS BIGINT) AS min_c,
             CAST(coalesce(sum(CASE WHEN rev0 IS NULL THEN rev1 END), 0)
                  AS BIGINT) AS new_c
           FROM j WHERE m IN (SELECT m FROM valid) GROUP BY 1)
         SELECT m, n_base, n_retained, base_c, retained_c, min_c, new_c,
           CAST(CAST(retained_c AS HUGEINT) * 1000000 // base_c AS BIGINT) AS nrr_e6,
           CAST(CAST(min_c AS HUGEINT) * 1000000 // base_c AS BIGINT) AS grr_e6
         FROM f""",
    "q_hm_dependency" ->
      // directly-follows counts + the mirrored full-outer join; dep on
      // the e6 grid sign-factored (magnitude division only)
      """WITH e AS (
           SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS a, next_type AS b, CAST(count(*) AS BIGINT) AS n_ab
           FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         j AS (
           SELECT coalesce(t.a, r.a) AS a, coalesce(t.b, r.b) AS b,
             coalesce(t.n_ab, 0) AS n_ab, coalesce(r.n_ba, 0) AS n_ba
           FROM t
           FULL OUTER JOIN (SELECT b AS a, a AS b, n_ab AS n_ba FROM t) r
             ON r.a = t.a AND r.b = t.b)
         SELECT a AS from_type, b AS to_type, n_ab, n_ba,
           CAST(CASE WHEN a = b THEN n_ab * 1000000 // (n_ab + 1)
                ELSE (CASE WHEN n_ab < n_ba THEN -1 ELSE 1 END)
                     * (abs(n_ab - n_ba) * 1000000 // (n_ab + n_ba + 1))
                END AS BIGINT) AS dep_e6
         FROM j""",
    "q_key_discovery" ->
      // fixed combo list mirrored from Profile.KeyCombos; dup factor a
      // truncating e6 quotient (positive so // == div)
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
         c AS (
           SELECT 'o_orderkey' AS combo,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
           UNION ALL SELECT 'o_custkey',
             CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
           UNION ALL SELECT 'o_orderdate',
             CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
           UNION ALL SELECT 'o_custkey,o_orderdate',
             CAST(count(DISTINCT (o_custkey, o_orderdate)) AS BIGINT) FROM orders
           UNION ALL SELECT 'o_custkey,o_orderdate,o_totalprice',
             CAST(count(DISTINCT (o_custkey, o_orderdate, o_totalprice)) AS BIGINT)
             FROM orders
           UNION ALL SELECT 'o_orderstatus,o_orderpriority',
             CAST(count(DISTINCT (o_orderstatus, o_orderpriority)) AS BIGINT)
             FROM orders)
         SELECT combo, n_rows, n_distinct,
           CAST(n_rows = n_distinct AS BIGINT) AS is_key,
           CAST(n_rows * 1000000 // n_distinct AS BIGINT) AS dup_factor_e6
         FROM c, n""",
    "q_markov_entropy" ->
      // next-event Shannon entropy per state: -p*log2(p) terms of
      // integer ratios, e6-quantized before the order-free sum
      """WITH e AS (
           SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS from_type, next_type,
             CAST(count(*) AS BIGINT) AS n_ab
           FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         m AS (
           SELECT from_type, n_ab,
             CAST(sum(n_ab) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
           FROM t),
         terms AS (
           SELECT from_type, n_from,
             CAST(floor(-(CAST(n_ab AS DOUBLE) / n_from)
                        * log2(CAST(n_ab AS DOUBLE) / n_from) * 1000000 + 0.5)
               AS BIGINT) AS term_e6
           FROM m)
         SELECT from_type, n_from, CAST(count(*) AS BIGINT) AS n_next_types,
           CAST(sum(term_e6) AS BIGINT) AS h_e6,
           CAST(floor(log2(CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             AS hmax_e6
         FROM terms GROUP BY 1, 2""",
    "q_alpha_footprint" ->
      // completed alphabet x alphabet grid of ordering relations
      """WITH e AS (
           SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS a, next_type AS b, CAST(count(*) AS BIGINT) AS n
           FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         al AS (SELECT DISTINCT event_type AS x FROM events),
         g AS (SELECT a.x AS a, b.x AS b FROM al a, al b)
         SELECT g.a AS from_type, g.b AS to_type,
           CAST(coalesce(f.n, 0) AS BIGINT) AS n_ab,
           CAST(coalesce(r.n, 0) AS BIGINT) AS n_ba,
           CASE WHEN coalesce(f.n, 0) > 0 AND coalesce(r.n, 0) = 0 THEN 'causal'
                WHEN coalesce(f.n, 0) = 0 AND coalesce(r.n, 0) > 0 THEN 'rev_causal'
                WHEN coalesce(f.n, 0) > 0 AND coalesce(r.n, 0) > 0 THEN 'parallel'
                ELSE 'choice' END AS rel
         FROM g
         LEFT JOIN t f ON f.a = g.a AND f.b = g.b
         LEFT JOIN t r ON r.a = g.b AND r.b = g.a""",
    "q_hill_tail" -> {
      // top-(k+1) order statistics, e6-quantized ln terms (nonneg:
      // rev >= thr), truncating H and alpha quotients
      val k = AnalyticsExt.HillK
      s"""WITH rev AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
           FROM orders GROUP BY 1),
         top AS (
           SELECT * FROM (
             SELECT rev,
               CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
                 AS rank
             FROM rev) WHERE rank <= ${k + 1}),
         thr AS (SELECT rev AS thr FROM top WHERE rank = ${k + 1}),
         t AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(max(thr.thr) AS BIGINT) AS thr_c,
             CAST(sum(CAST(floor(ln(CAST(top.rev AS DOUBLE) / thr.thr) * 1000000
                                 + 0.5) AS BIGINT)) AS BIGINT) AS sum_e6
           FROM top, thr WHERE top.rank <= $k)
         SELECT k, thr_c, CAST(sum_e6 // k AS BIGINT) AS hill_e6,
           CAST(CASE WHEN sum_e6 // k > 0
                THEN 1000000000000 // (sum_e6 // k) ELSE 0 END AS BIGINT)
             AS alpha_e6
         FROM t"""
    },
    // dependency-threshold model mined from the log, then per-variant
    // replay: a step conforms iff its (a,b) clears dep >= 0.5 (self
    // loops n/(n+1)); 1-event traces carry no transitions and drop
    "q_footprint_conformance" ->
      """WITH tr AS (
           SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
           FROM events),
         t AS (SELECT user_id, a, b FROM tr WHERE b IS NOT NULL),
         c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM t GROUP BY a, b),
         model AS (
           SELECT f.a, f.b FROM c f
           LEFT JOIN c r ON r.a = f.b AND r.b = f.a
           WHERE CASE WHEN f.a = f.b THEN f.n_ab * 1000 // (f.n_ab + 1)
                      ELSE (f.n_ab - coalesce(r.n_ab, 0)) * 1000
                           // (f.n_ab + coalesce(r.n_ab, 0) + 1) END >= 500),
         pu AS (
           SELECT t.user_id, CAST(count(*) AS BIGINT) AS steps,
             CAST(sum(CASE WHEN m.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ok_steps
           FROM t LEFT JOIN model m ON m.a = t.a AND m.b = t.b
           GROUP BY t.user_id),
         v AS (
           SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS variant
           FROM events GROUP BY user_id)
         SELECT variant, n_traces, n_steps, n_conforming,
           CAST(n_conforming * 1000000 // n_steps AS BIGINT) AS fitness_e6
         FROM (SELECT v.variant, CAST(count(*) AS BIGINT) AS n_traces,
                 CAST(sum(pu.steps) AS BIGINT) AS n_steps,
                 CAST(sum(pu.ok_steps) AS BIGINT) AS n_conforming
               FROM v JOIN pu USING (user_id) GROUP BY v.variant)
         ORDER BY n_traces DESC, variant LIMIT 25""",
    "q_trace_variants" ->
      // whole-journey variant strings on the (ts, event_id) total order
      """WITH v AS (
           SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS variant,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY user_id)
         SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
           CAST(max(n_events) AS BIGINT) AS max_events
         FROM v GROUP BY variant
         ORDER BY n_users DESC, variant LIMIT 25""",
    "q_cr_concentration" ->
      // month-partitioned top-8 rank + one total fold; e6 shares via
      // HUGEINT (all positive so // == div)
      """WITH cm AS (
           SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12
                       + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
           FROM orders GROUP BY 1, 2),
         top AS (
           SELECT m,
             CAST(sum(CASE WHEN rank <= 4 THEN rev ELSE 0 END) AS BIGINT) AS top4_c,
             CAST(sum(rev) AS BIGINT) AS top8_c
           FROM (SELECT m, rev,
                   row_number() OVER (PARTITION BY m
                     ORDER BY rev DESC, o_custkey) AS rank
                 FROM cm)
           WHERE rank <= 8 GROUP BY 1),
         tot AS (SELECT m, CAST(sum(rev) AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n_cust
                 FROM cm GROUP BY 1)
         SELECT tot.m, n_cust, total_c, top4_c, top8_c,
           CAST(CAST(top4_c AS HUGEINT) * 1000000 // total_c AS BIGINT) AS cr4_e6,
           CAST(CAST(top8_c AS HUGEINT) * 1000000 // total_c AS BIGINT) AS cr8_e6
         FROM tot JOIN top USING (m)""",
    "q_purchase_streaks" ->
      // gaps-and-islands: island = month - dense_rank per customer
      """WITH cm AS (
           SELECT DISTINCT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m
           FROM orders),
         i AS (SELECT o_custkey,
                 m - dense_rank() OVER (PARTITION BY o_custkey ORDER BY m)
                   AS island
               FROM cm),
         s AS (SELECT o_custkey, island, CAST(count(*) AS BIGINT) AS len
               FROM i GROUP BY 1, 2),
         l AS (SELECT o_custkey, CAST(max(len) AS BIGINT) AS longest
               FROM s GROUP BY 1)
         SELECT longest AS streak_months, CAST(count(*) AS BIGINT) AS n_customers
         FROM l GROUP BY 1""",
    // full coalition enumeration over the bitmask-encoded touchsets;
    // factorial weights keep phi as an exact integer over n!
    "q_shapley_attribution" ->
      """WITH t0 AS (
           SELECT user_id, list(event_type ORDER BY ts, event_id) AS t0
           FROM events GROUP BY user_id),
         conv AS (
           SELECT list_sort(list_distinct(t0[1 : list_position(t0, 'purchase') - 1]))
             AS touchset
           FROM t0 WHERE coalesce(list_position(t0, 'purchase'), 0) > 0),
         ch AS (SELECT event_type AS channel,
                  CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS r
                FROM (SELECT DISTINCT event_type FROM events
                      WHERE event_type <> 'purchase')),
         ncc AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM ch),
         tm AS (SELECT touchset,
                  coalesce((SELECT CAST(sum(1 << ch.r) AS BIGINT) FROM ch
                            WHERE list_contains(t.touchset, ch.channel)), 0) AS tmask
                FROM (SELECT DISTINCT touchset FROM conv) t),
         tc AS (SELECT tmask, CAST(count(*) AS BIGINT) AS cnt
                FROM conv JOIN tm USING (touchset) GROUP BY tmask),
         masks AS (SELECT CAST(unnest(range(0, (SELECT 1 << nc FROM ncc))) AS BIGINT) AS m),
         v AS (SELECT m, coalesce((SELECT CAST(sum(cnt) AS BIGINT) FROM tc
                                   WHERE (tc.tmask & masks.m) = tc.tmask), 0) AS v
               FROM masks),
         terms AS (
           SELECT ch.channel, ncc.nc,
             CAST(factorial(CAST(list_sum([(v1.m >> j) & 1
                for j in range(0, CAST(ncc.nc AS INT))]) AS INT)) AS BIGINT)
             * CAST(factorial(CAST(ncc.nc - 1 - list_sum([(v1.m >> j) & 1
                for j in range(0, CAST(ncc.nc AS INT))]) AS INT)) AS BIGINT)
             * (v2.v - v1.v) AS term
           FROM ch, ncc, v v1, v v2
           WHERE (v1.m >> ch.r) % 2 = 0 AND v2.m = v1.m + (1 << ch.r)),
         phi AS (SELECT channel, nc, CAST(sum(term) AS BIGINT) AS phi_num
                 FROM terms GROUP BY channel, nc)
         SELECT channel, phi_num,
           CAST(factorial(CAST(nc AS INT)) AS BIGINT) AS denom,
           CAST(phi_num * 1000 // factorial(CAST(nc AS INT)) AS BIGINT)
             AS shapley_journeys_e3,
           CASE WHEN (SELECT sum(phi_num) FROM phi) > 0
                THEN CAST(phi_num * 1000000
                       // (SELECT CAST(sum(phi_num) AS BIGINT) FROM phi) AS BIGINT)
                ELSE 0 END AS share_e6
         FROM phi""",
    "q_markov_attribution" -> markovAttrOracle,
    "ann_lsh_tables_curve" -> {
      // buckets built once at max(tables); each candidate keeps its
      // min table index, so "T tables" is the min_t < T slice — same
      // sweep list as Similarity.TablesPoints
      val tvals = Similarity.TablesPoints.map(t => s"($t)").mkString(", ")
      val maxT = Similarity.TablesPoints.max
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings", maxT)},
          cand AS (
            SELECT q.vec_id AS query_id, c.vec_id, CAST(min(c.t) AS BIGINT) AS min_t
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
            GROUP BY 1, 2),
          scored AS (
            SELECT cand.query_id, cand.vec_id, cand.min_t,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id FROM (
              SELECT q.query_id, e.vec_id,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS rank
              FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          ts AS (SELECT CAST(tc AS BIGINT) AS tc FROM (VALUES $tvals) v(tc)),
          ranked AS (
            SELECT ts.tc, s.query_id, s.vec_id,
              row_number() OVER (PARTITION BY ts.tc, s.query_id
                ORDER BY s.cos DESC, s.vec_id) AS rank
            FROM scored s, ts WHERE s.min_t < ts.tc),
          hits AS (
            SELECT r.tc, CAST(count(*) AS BIGINT) AS n_hits
            FROM ranked r
            JOIN bf ON bf.query_id = r.query_id AND bf.vec_id = r.vec_id
            WHERE r.rank <= 10 GROUP BY 1),
          cn AS (SELECT ts.tc, CAST(count(*) AS BIGINT) AS n_candidates
                 FROM scored s, ts WHERE s.min_t < ts.tc GROUP BY 1),
          nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
          SELECT cn.tc AS n_tables, nq.n_queries, cn.n_candidates,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            CAST(coalesce(h.n_hits, 0) * 1000000 // (nq.n_queries * 10) AS BIGINT)
              AS recall10_e6
          FROM cn LEFT JOIN hits h ON h.tc = cn.tc, nq"""
    },
    "dedup_banding_advisor" -> {
      // the #298 truncating-e6 powers per (b, r) factorization; areas
      // and the min-key pick replayed as pure integer folds
      def powSql(base: String, p: Int): String =
        (2 to p).foldLeft(base)((acc, _) => s"(($acc) * ($base) // 1000000)")
      val step = 1000000L / Dedup.ScurvePoints
      val tau = Dedup.BandingTauE6
      val curves = Dedup.BandingConfigs
        .map { case (b, r) =>
          s"""SELECT b, r, s_e6,
                CAST(1000000 - (${powSql("pb", b)}) AS BIGINT) AS p_cand_e6
              FROM (SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r, s_e6,
                      CAST(1000000 - (${powSql("s_e6", r)}) AS BIGINT) AS pb
                    FROM g)"""
        }
        .mkString("\n          UNION ALL\n          ")
      s"""WITH g AS (
            SELECT CAST(unnest(generate_series(0, ${Dedup.ScurvePoints})) * $step
              AS BIGINT) AS s_e6),
          curves AS ($curves),
          a AS (
            SELECT b, r,
              CAST(max(CASE WHEN s_e6 = $tau THEN p_cand_e6 END) AS BIGINT)
                AS p_at_tau_e6,
              CAST(sum(CASE WHEN s_e6 < $tau THEN p_cand_e6 * $step ELSE 0 END)
                   // 1000000 AS BIGINT) AS fp_area_e6,
              CAST(sum(CASE WHEN s_e6 >= $tau THEN (1000000 - p_cand_e6) * $step
                            ELSE 0 END) // 1000000 AS BIGINT) AS fn_area_e6
            FROM curves GROUP BY 1, 2),
          t AS (SELECT a.*, CAST(fp_area_e6 + fn_area_e6 AS BIGINT) AS total_e6 FROM a),
          bk2 AS (SELECT min(total_e6 * 64 + b) AS best_key FROM t)
          SELECT b, r, p_at_tau_e6, fp_area_e6, fn_area_e6, total_e6,
            CAST(total_e6 * 64 + b = best_key AS BIGINT) AS is_best
          FROM t, bk2"""
    },
    "q_otif" -> {
      // all-lines-within-SLA conjunction per order, monthly e6 rate
      val sla = Warehouse.OtifSlaDays
      s"""WITH po AS (
           SELECT l.l_orderkey, o.m,
             CAST(min(CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) <= $sla AS INT))
               AS BIGINT) AS all_ok,
             CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem l
           JOIN (SELECT o_orderkey, o_orderdate,
                   CAST(year(CAST(o_orderdate AS DATE)) * 12
                        + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m
                 FROM orders) o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2)
         SELECT m, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(all_ok) AS BIGINT) AS n_otif,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(all_ok) * 1000000 // count(*) AS BIGINT) AS otif_e6
         FROM po GROUP BY m"""
    },
    "q_backlog_aging" ->
      // open orders bucketed by integer month age at the as-of month
      """WITH o AS (
           SELECT o_orderstatus,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
           FROM orders),
         ao AS (SELECT CAST(max(m) AS BIGINT) AS asof_m FROM o)
         SELECT o_orderstatus,
           CASE WHEN asof_m - m < 6 THEN '0-5'
                WHEN asof_m - m < 12 THEN '6-11'
                WHEN asof_m - m < 24 THEN '12-23'
                ELSE '24+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(c) AS BIGINT) AS open_value_c
         FROM o, ao WHERE o_orderstatus <> 'F'
         GROUP BY 1, 2""",
    "q_whale_dependency" ->
      // all-time top-10 customers' share of each month's revenue
      """WITH o AS (
           SELECT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
           FROM orders),
         whales AS (
           SELECT o_custkey FROM (
             SELECT o_custkey,
               row_number() OVER (ORDER BY sum(c) DESC, o_custkey) AS rank
             FROM o GROUP BY o_custkey) WHERE rank <= 10),
         wm AS (
           SELECT m, CAST(count(*) AS BIGINT) AS n_whale_orders,
             CAST(sum(c) AS BIGINT) AS whale_c
           FROM o WHERE o_custkey IN (SELECT o_custkey FROM whales)
           GROUP BY 1),
         tm AS (SELECT m, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(c) AS BIGINT) AS total_c
                FROM o GROUP BY 1)
         SELECT tm.m, tm.n_orders, tm.total_c,
           CAST(coalesce(wm.n_whale_orders, 0) AS BIGINT) AS n_whale_orders,
           CAST(coalesce(wm.whale_c, 0) AS BIGINT) AS whale_c,
           CAST(CAST(coalesce(wm.whale_c, 0) AS HUGEINT) * 1000000 // tm.total_c
             AS BIGINT) AS whale_share_e6
         FROM tm LEFT JOIN wm ON wm.m = tm.m""",
    "q_alpha_mixture" -> {
      // n_max-relative pow ratios e6-quantized per source, then pure
      // integer weight/effective-count quotients; same alpha sweep as
      // Sampling.AlphaPointsE1
      val avals = Sampling.AlphaPointsE1.map(a => s"($a)").mkString(", ")
      s"""WITH t AS (
           SELECT source,
             CAST(sum(len(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         mx AS (SELECT CAST(max(n_tokens) AS BIGINT) AS n_max FROM t),
         al AS (SELECT CAST(a AS BIGINT) AS alpha_e1 FROM (VALUES $avals) v(a)),
         r AS (
           SELECT al.alpha_e1, t.source, t.n_tokens,
             CAST(floor(pow(CAST(t.n_tokens AS DOUBLE) / mx.n_max,
                            CAST(al.alpha_e1 AS DOUBLE) / 10) * 1000000 + 0.5)
               AS BIGINT) AS r_e6
           FROM t, mx, al),
         tot AS (
           SELECT alpha_e1, CAST(sum(r_e6) AS BIGINT) AS sum_r,
             CAST(CAST(sum(r_e6) AS HUGEINT) * sum(r_e6) * 1000000
                  // sum(CAST(r_e6 AS HUGEINT) * r_e6) AS BIGINT) AS eff_sources_e6
           FROM r GROUP BY 1)
         SELECT r.alpha_e1, r.source, r.n_tokens, r.r_e6,
           CAST(CAST(r.r_e6 AS HUGEINT) * 1000000 // tot.sum_r AS BIGINT)
             AS weight_e6,
           tot.eff_sources_e6
         FROM r JOIN tot USING (alpha_e1)"""
    },
    "q_demand_classes" ->
      // SBC quadrants via cross-multiplied ADI/CV2 cutoffs, HUGEINT
      """WITH daily AS (
           SELECT l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS BIGINT) AS day,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
           FROM lineitem GROUP BY 1, 2),
         per AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             CAST(max(day) - min(day) AS BIGINT) AS span,
             CAST(sum(q) AS BIGINT) AS s,
             sum(CAST(q AS HUGEINT) * q) AS sq2
           FROM daily GROUP BY 1),
         cls AS (
           SELECT s,
             CASE WHEN n < 2 THEN 'single_day'
                  WHEN CAST(span AS HUGEINT) * 100 < 132 * (n - 1) THEN
                    CASE WHEN (n * sq2 - CAST(s AS HUGEINT) * s) * 100
                              < 49 * CAST(s AS HUGEINT) * s
                         THEN 'smooth' ELSE 'erratic' END
                  ELSE
                    CASE WHEN (n * sq2 - CAST(s AS HUGEINT) * s) * 100
                              < 49 * CAST(s AS HUGEINT) * s
                         THEN 'intermittent' ELSE 'lumpy' END END AS quadrant
           FROM per)
         SELECT quadrant, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(s) AS BIGINT) AS total_qty
         FROM cls GROUP BY 1""",
    "q_edge_embeddedness" ->
      // common neighbors of ADJACENT pairs via the oriented wedge
      // join; Jaccard over the endpoint-excluded union, e6 truncating
      """WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         cn AS (
           SELECT x.v AS pa, y.v AS pb, CAST(count(*) AS BIGINT) AS cn
           FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
           JOIN e ON e.pa = x.v AND e.pb = y.v
           GROUP BY 1, 2)
         SELECT e.pa, e.pb, da.deg AS deg_a, db.deg AS deg_b,
           CAST(coalesce(cn.cn, 0) AS BIGINT) AS cn,
           CAST(CASE WHEN da.deg + db.deg - 2 - coalesce(cn.cn, 0) > 0
                THEN coalesce(cn.cn, 0) * 1000000
                     // (da.deg + db.deg - 2 - coalesce(cn.cn, 0))
                ELSE 0 END AS BIGINT) AS emb_e6
         FROM e
         LEFT JOIN cn ON cn.pa = e.pa AND cn.pb = e.pb
         JOIN deg da ON da.u = e.pa
         JOIN deg db ON db.u = e.pb
         ORDER BY emb_e6 DESC, e.pa, e.pb LIMIT 100""",
    "q_discount_elasticity" ->
      // per-brand OLS slope of qty on the e2 discount grid; HUGEINT
      // moments, sign-factored truncating e6 quotient
      """WITH pts AS (
           SELECT p.p_brand,
             CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         m AS (
           SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * x) AS sxx
           FROM pts GROUP BY 1),
         nd AS (
           SELECT p_brand, n,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den
           FROM m)
         SELECT p_brand, n, num, den,
           CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                * (abs(CAST(num AS HUGEINT)) * 1000000 // den) AS BIGINT) AS slope_e6
         FROM nd WHERE den > 0""",
    "q_itemsets3" ->
      // 3-way distinct-basket join with the full-key tiebreak
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, c.l_partkey AS part_c,
           CAST(count(*) AS BIGINT) AS support
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
         JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
           ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
         JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) c
           ON c.l_orderkey = a.l_orderkey AND c.l_partkey > b.l_partkey
         GROUP BY 1, 2, 3
         ORDER BY support DESC, part_a, part_b, part_c LIMIT 25""",
    "text_simpson" ->
      // #197's per-source term counts; both quotients single HUGEINT
      // divisions
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM td GROUP BY 1, 2),
         ag AS (
           SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS rep
           FROM tc GROUP BY 1)
         SELECT source, vocab_size, n_tokens, CAST(rep AS BIGINT) AS repeat_pairs,
           CAST((rep * 1000000000)
             // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT) AS simpson_e9,
           CASE WHEN rep > 0 THEN
             CAST((CAST(n_tokens AS HUGEINT) * (n_tokens - 1) * 1000) // rep AS BIGINT)
           ELSE NULL END AS inv_simpson_e3
         FROM ag WHERE n_tokens > 1""",
    "q_systematic_sample" ->
      // #95's layout (salted md5-hash order, shard + offset carry),
      // every stride-th global index
      """WITH t AS (
           SELECT doc_id,
             ('0x' || substr(md5('graft-systematic-1:' || doc_id), 1, 15))::BIGINT AS ord
           FROM documents),
         laid AS (
           SELECT doc_id, ord % 8 AS shard,
             row_number() OVER (PARTITION BY ord % 8 ORDER BY ord, doc_id) - 1 AS pos
           FROM t),
         osh AS (SELECT shard, CAST(count(*) AS BIGINT) AS c FROM laid GROUP BY 1),
         ofs AS (
           SELECT shard, COALESCE(sum(c) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM osh),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM osh)
         SELECT l.doc_id, CAST(off + pos AS BIGINT) AS idx,
           CAST(greatest(1, n // 200) AS BIGINT) AS stride
         FROM laid l JOIN ofs USING (shard), tot
         WHERE (off + pos) % greatest(1, n // 200) = 0""",
    "q_kruskal_wallis" ->
      // #288's doubled-midrank grid generalized to k groups: per-group
      // e6-truncated H terms 3*dev_2x^2/(n_g*n*(n+1)) in HUGEINT, tie
      // correction as a second exact quotient
      """WITH lines AS (
           SELECT split_part(p.p_type, ' ', 1) AS type_family,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         bv AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM lines GROUP BY 1),
         cu AS (SELECT c, cnt,
                  CAST(coalesce(sum(cnt) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
                FROM bv),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
                 FROM bv),
         pg AS (SELECT type_family, CAST(sum(g.cnt_g) AS BIGINT) AS n_g,
                  CAST(sum(g.cnt_g * (2 * cu.cum + cu.cnt + 1)) AS BIGINT) AS r_2x
                FROM (SELECT type_family, c, CAST(count(*) AS BIGINT) AS cnt_g
                      FROM lines GROUP BY 1, 2) g
                JOIN cu USING (c) GROUP BY 1),
         kk AS (SELECT CAST(count(*) AS BIGINT) AS k_groups FROM pg),
         terms AS (
           SELECT pg.*, n, tie_t, k_groups,
             r_2x - n_g * (n + 1) AS dev_2x,
             CAST((3 * CAST(r_2x - n_g * (n + 1) AS HUGEINT)
                     * (r_2x - n_g * (n + 1)) * 1000000)
               // (CAST(n_g AS HUGEINT) * n * (n + 1)) AS BIGINT) AS term_e6
           FROM pg, tot, kk),
         h AS (
           SELECT CAST(sum(term_e6) AS BIGINT) AS h_e6,
             CASE WHEN CAST(max(n) AS HUGEINT) * max(n) * max(n) - max(n) - max(tie_t) > 0 THEN
               CAST(CAST(sum(term_e6) AS HUGEINT)
                      * (CAST(max(n) AS HUGEINT) * max(n) * max(n) - max(n))
                 // (CAST(max(n) AS HUGEINT) * max(n) * max(n) - max(n) - max(tie_t))
                 AS BIGINT)
             ELSE NULL END AS h_tie_e6
           FROM terms)
         SELECT type_family, n_g, r_2x,
           CAST(CAST(r_2x AS HUGEINT) * 1000000 // (2 * n_g) AS BIGINT) AS mean_rank_e6,
           term_e6, k_groups, n, h_e6, h_tie_e6
         FROM terms, h""",
    "q_price_index" ->
      // unit price = rev cents // qty per (part, month); base-month
      // common basket; Fisher via one-ulp-clamp isqrt of the e12
      // product
      """WITH pm AS (
           SELECT l_partkey,
             CAST(year(CAST(l_shipdate AS DATE)) * 12
                + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem GROUP BY 1, 2),
         pp AS (SELECT l_partkey, m, qty, rev // qty AS p FROM pm WHERE qty >= 1),
         m0 AS (SELECT min(m) AS m0 FROM pp),
         base AS (SELECT l_partkey, p AS p0, qty AS q0 FROM pp, m0 WHERE m = m0),
         j AS (
           SELECT pp.m, CAST(count(*) AS BIGINT) AS n_parts,
             sum(CAST(pp.p AS HUGEINT) * b.q0) AS l_num,
             sum(CAST(b.p0 AS HUGEINT) * b.q0) AS l_den,
             sum(CAST(pp.p AS HUGEINT) * pp.qty) AS p_num,
             sum(CAST(b.p0 AS HUGEINT) * pp.qty) AS p_den
           FROM pp JOIN base b USING (l_partkey) GROUP BY 1),
         ix AS (
           SELECT m, n_parts,
             CAST(l_num * 1000000 // l_den AS BIGINT) AS laspeyres_e6,
             CAST(p_num * 1000000 // p_den AS BIGINT) AS paasche_e6
           FROM j),
         sq AS (
           SELECT *, CAST(laspeyres_e6 AS HUGEINT) * paasche_e6 AS x,
             CAST(floor(sqrt(CAST(CAST(laspeyres_e6 AS HUGEINT) * paasche_e6 AS DOUBLE)))
               AS HUGEINT) AS s0
           FROM ix)
         SELECT m, n_parts, laspeyres_e6, paasche_e6,
           CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END) AS BIGINT) AS fisher_e6
         FROM sq""",
    "q_newsvendor" ->
      // rank formula generated from the NewsvendorCu/Co constants:
      // q* = the ceil(cu*n/(cu+co))-th order statistic per part
      s"""WITH daily AS (
           SELECT l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qd
           FROM lineitem GROUP BY 1, 2),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY l_partkey ORDER BY qd, d)
                 AS BIGINT) AS rn
               FROM daily),
         st AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(qd) AS BIGINT) AS total_qty
                FROM daily GROUP BY 1)
         SELECT r.l_partkey, n_days, total_qty, qd AS q_star, rn AS rank_at
         FROM r JOIN st USING (l_partkey)
         WHERE rn = (${operators.AnalyticsExt.NewsvendorCu} * n_days
             + ${operators.AnalyticsExt.NewsvendorCu + operators.AnalyticsExt.NewsvendorCo - 1})
           // ${operators.AnalyticsExt.NewsvendorCu + operators.AnalyticsExt.NewsvendorCo}""",
    "text_mutual_info" ->
      // per-cell e6-quantized MI terms on integer-product ratios;
      // marginal entropies likewise; NMI as a sign-factored quotient
      """WITH cont AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS c_ij
           FROM documents GROUP BY 1, 2),
         bl AS (SELECT lang, CAST(sum(c_ij) AS BIGINT) AS r_i FROM cont GROUP BY 1),
         bs AS (SELECT source, CAST(sum(c_ij) AS BIGINT) AS c_j FROM cont GROUP BY 1),
         t AS (SELECT CAST(sum(c_ij) AS BIGINT) AS n_docs FROM cont),
         mi AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells, max(t.n_docs) AS n_docs,
             CAST(sum(CAST(floor(
               (CAST(c.c_ij AS DOUBLE) / t.n_docs)
                 * log2((CAST(c.c_ij AS DOUBLE) * CAST(t.n_docs AS DOUBLE))
                        / (CAST(bl.r_i AS DOUBLE) * CAST(bs.c_j AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_e6
           FROM cont c JOIN bl USING (lang) JOIN bs USING (source), t),
         hl AS (
           SELECT CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(CAST(floor(
               (CAST(r_i AS DOUBLE) / n_docs)
                 * log2(CAST(n_docs AS DOUBLE) / CAST(r_i AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_lang_e6
           FROM bl, t),
         hs AS (
           SELECT CAST(count(*) AS BIGINT) AS n_sources,
             CAST(sum(CAST(floor(
               (CAST(c_j AS DOUBLE) / n_docs)
                 * log2(CAST(n_docs AS DOUBLE) / CAST(c_j AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_source_e6
           FROM bs, t)
         SELECT n_docs, n_langs, n_sources, n_cells, mi_e6, h_lang_e6, h_source_e6,
           CASE WHEN least(h_lang_e6, h_source_e6) > 0 THEN
             CAST((CASE WHEN mi_e6 < 0 THEN -1 ELSE 1 END)
               * (abs(CAST(mi_e6 AS HUGEINT)) * 1000000
                  // least(h_lang_e6, h_source_e6)) AS BIGINT)
           ELSE NULL END AS nmi_e6
         FROM mi, hl, hs""",
    "q_corr_matrix" -> corrMatrixOracle
  )

  /** Shared CTE prefix for the classical-decomposition oracles
    * (`q_seasonal_decomp`, `q_anomaly_flags`): full gap-free centered
    * 7-day frames only; seasonal quotient sign-factored (DuckDB //
    * floors on negatives, Spark div truncates — magnitudes divided,
    * sign re-applied).
    */
  private val seasonalKernelSql: String =
    """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         tw AS (
           SELECT event_type, day, c,
             sum(c) OVER w AS wsum, count(*) OVER w AS wcnt,
             min(day) OVER w AS wmin, max(day) OVER w AS wmax
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         kept AS (
           SELECT event_type, day, c, wsum // 7 AS trend,
             c - wsum // 7 AS det, day % 7 AS dow
           FROM tw WHERE wcnt = 7 AND wmax - wmin = 6),
         seas AS (
           SELECT event_type, dow, sum(det) AS snum, count(*) AS sn
           FROM kept GROUP BY 1, 2),
         sc AS (
           SELECT event_type, dow,
             CASE WHEN snum < 0 THEN -(abs(snum) // sn) ELSE snum // sn END AS seasonal
           FROM seas)"""

  /** Replica count for `q_bootstrap_ci` — single source of truth for
    * BOTH the Spark call and the generated oracle, so changing B can
    * never silently break hash parity (the kcoreOracle(k, rounds)
    * precedent).
    */
  private val BootstrapB = 100

  /** KM right-censor horizon (months) and funnel step window (days) —
    * the Spark calls and the DuckDB oracles derive from these same
    * constants (the BootstrapB precedent: changing one cannot
    * silently break hash parity).
    */
  private val KmCensorMonths = 2
  private val FunnelWindowDays = 7

  /** Equi-depth threshold count for `q_pr_curve` — same
    * single-source-of-truth discipline as BootstrapB.
    */
  private val PrCurveBins = 10

  /** Shard byte budget for `mm_shard_pack` and retention horizon for
    * `cdc_erasure_audit` — shared Spark-call/oracle constants (the
    * BootstrapB discipline).
    */
  private val MmShardBudgetBytes = 262144L
  private val ErasureHorizonDays = 7

  /** (z_{α/2} + z_β)·10³ at α=5%, power=80% for `q_power_analysis` —
    * shared by the Spark call and the generated oracle (which squares
    * it), the BootstrapB discipline.
    */
  private val PowerZsumE3 = 1960L + 842L

  /** Landmark count for `ann_fps` — shared by the Spark call and the
    * generated oracle (the BootstrapB discipline).
    */
  private val FpsK = 8

  /** Shared Holt trajectory CTE chain (daily, idx, rec) — generated
    * once, reused verbatim by the q_holt and q_forecast_backtest
    * oracles so the two can never drift apart.
    */
  private def holtCtes: String = {
    // sign-factored truncating quarter (both engines agree)
    def tq(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) // 4) ELSE ($a) // 4 END)"
    val newl = tq("s.y + 3 * (h.l + h.b)")
    s"""daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, day, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
           FROM daily),
         rec AS (
           WITH RECURSIVE h(event_type, i, day, y, l, b) AS (
             SELECT event_type, i, day, y, y, CAST(0 AS BIGINT) FROM idx WHERE i = 1
             UNION ALL
             SELECT s.event_type, s.i, s.day, s.y,
               $newl,
               ${tq(s"($newl - h.l) + 3 * h.b")}
             FROM idx s JOIN h ON s.event_type = h.event_type AND s.i = h.i + 1)
           SELECT * FROM h)"""
  }

  /** The 3-round e4-quantized Lloyd train + corpus cell assignment as
    * CTEs (u, s0, a1..c3, acorp) — shared by the ann_ivf and
    * ann_knn_graph oracles so the replayed quantizer can never drift
    * between them. String-identical to the block ann_ivf carried
    * before the extraction.
    */
  private def ivfTrainCtes: String = {
    val meanTerms = (1 to 64)
      .map(i => s"CAST(floor(avg(CAST(embedding[$i] AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS FLOAT)")
      .mkString(", ")
    def assign(cents: String, out: String) =
      s"""$out AS (SELECT vec_id, embedding, cell FROM (
            SELECT u.vec_id, u.embedding, c.cell,
              row_number() OVER (PARTITION BY u.vec_id
                ORDER BY floor(list_cosine_similarity(
                  u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                  DESC, c.cell) AS rn
            FROM u, $cents c) WHERE rn = 1)"""
    def means(asg: String, out: String) =
      s"$out AS (SELECT cell, [$meanTerms] AS centroid FROM $asg GROUP BY cell)"
    s"""u AS (SELECT vec_id, embedding FROM embeddings),
          s0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
                 FROM embeddings ORDER BY vec_id LIMIT 16),
          ${assign("s0", "a1")}, ${means("a1", "c1")},
          ${assign("c1", "a2")}, ${means("a2", "c2")},
          ${assign("c2", "a3")}, ${means("a3", "c3")},
          ${assign("c3", "acorp")}"""
  }

  /** Holt–Winters recursive-CTE trajectory (the holtCtes pattern plus
    * a 7-slot seasonal LIST rebuilt by slice concatenation, slot
    * indexed by calendar day-of-week) — same dyadic sign-factored
    * quarters as the Spark fold.
    */
  private def hwCtes: String = {
    def tq(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) // 4) ELSE ($a) // 4 END)"
    val sOld = "h.s[CAST(s.day % 7 AS INT) + 1]"
    val newl = tq(s"(s.y - $sOld) + 3 * (h.l + h.b)")
    val newb = tq(s"($newl - h.l) + 3 * h.b")
    val slot = tq(s"(s.y - $newl) + 3 * $sOld")
    s"""daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, day, y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
           FROM daily),
         rec AS (
           WITH RECURSIVE h(event_type, i, day, y, l, b, s) AS (
             SELECT event_type, i, day, y, y, CAST(0 AS BIGINT),
               [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] FROM idx WHERE i = 1
             UNION ALL
             SELECT s.event_type, s.i, s.day, s.y,
               $newl,
               $newb,
               h.s[1:CAST(s.day % 7 AS INT)] || [$slot]
                 || h.s[CAST(s.day % 7 AS INT) + 2:]
             FROM idx s JOIN h ON s.event_type = h.event_type AND s.i = h.i + 1)
           SELECT * FROM h)"""
  }

  /** Generated farthest-point-sampling replay: k−1 unrolled greedy
    * rounds, each picking the minimum max-cosine vector (vec_id
    * tiebreak) against every previously selected landmark via scalar
    * subqueries — derived from the SAME FpsK constant as the Spark
    * call.
    */
  /** Generated unrolled MMR replay for `ann_mmr`: the top-`poolK`
    * pool and its pairwise e6 sims once, then k−1 greedy rounds —
    * each a tuple anti-filter, a max over sims into the selected set,
    * and a rank-1 pick per query — the same integer score
    * 7·rel − 3·maxsim Spark selects on. Every round CTE MATERIALIZED
    * (each references the previous selection twice).
    */
  private def mmrOracle(k: Int, poolK: Int): String = {
    val rounds = new StringBuilder
    for (r <- 2 to k) {
      rounds.append(s""",
          p$r AS MATERIALIZED (
            SELECT query_id, vec_id, rel_e6, mx,
              7 * rel_e6 - 3 * mx AS score,
              row_number() OVER (PARTITION BY query_id
                ORDER BY 7 * rel_e6 - 3 * mx DESC, vec_id) AS rn
            FROM (
              SELECT p.query_id, p.vec_id, p.rel_e6, max(s.sim_e6) AS mx
              FROM pool p
              JOIN sims s ON s.query_id = p.query_id AND s.va = p.vec_id
              JOIN sel${r - 1} t ON t.query_id = s.query_id AND t.vec_id = s.vb
              WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} z
                WHERE z.query_id = p.query_id AND z.vec_id = p.vec_id)
              GROUP BY 1, 2, 3)),
          pick$r AS MATERIALIZED (
            SELECT query_id, vec_id, rel_e6, mx AS maxsim_e6, score AS mmr_score,
              CAST($r AS BIGINT) AS rank
            FROM p$r WHERE rn = 1),
          sel$r AS MATERIALIZED (
            SELECT query_id, vec_id FROM sel${r - 1}
            UNION ALL SELECT query_id, vec_id FROM pick$r)""")
    }
    val out = (1 to k)
      .map(r =>
        if (r == 1) "SELECT * FROM pick1"
        else s"SELECT * FROM pick$r")
      .mkString("\n          UNION ALL ")
    s"""WITH qe AS MATERIALIZED (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
            FROM embeddings WHERE vec_id < 10),
          pool AS MATERIALIZED (
            SELECT query_id, vec_id, emb,
              CAST(floor(cos * 1000000 + 0.5) AS BIGINT) AS rel_e6
            FROM (
              SELECT q.query_id, e.vec_id, e.embedding::DOUBLE[] AS emb,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6)
                    DESC, e.vec_id) AS pr
              FROM embeddings e, qe q WHERE e.vec_id <> q.query_id)
            WHERE pr <= $poolK),
          sims AS MATERIALIZED (
            SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
              CAST(floor(round(list_cosine_similarity(a.emb, b.emb), 6) * 1000000 + 0.5)
                AS BIGINT) AS sim_e6
            FROM pool a JOIN pool b
              ON b.query_id = a.query_id AND b.vec_id <> a.vec_id),
          pick1 AS MATERIALIZED (
            SELECT query_id, vec_id, rel_e6, CAST(0 AS BIGINT) AS maxsim_e6,
              7 * rel_e6 AS mmr_score, CAST(1 AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rel_e6 DESC, vec_id) AS rn FROM pool)
            WHERE rn = 1),
          sel1 AS MATERIALIZED (SELECT query_id, vec_id FROM pick1)${rounds.toString}
          $out"""
  }

  private def fpsOracle(k: Int): String = {
    val rounds = new StringBuilder
    for (r <- 2 to k) {
      val prevUnion =
        (1 until r).map(i => s"SELECT id FROM s$i").mkString(" UNION ALL ")
      rounds.append(
        s""",
          c$r AS MATERIALIZED ($prevUnion),
          m$r AS MATERIALIZED (
            SELECT a.vec_id,
              max(round(list_cosine_similarity(a.emb, b.emb), 6)) AS mx
            FROM e a, e b
            WHERE b.vec_id IN (SELECT id FROM c$r)
              AND a.vec_id NOT IN (SELECT id FROM c$r)
            GROUP BY 1),
          s$r AS MATERIALIZED (
            SELECT vec_id AS id, mx FROM m$r ORDER BY mx, vec_id LIMIT 1)""")
    }
    val out = (1 to k).map { r =>
      if (r == 1) s"SELECT CAST(1 AS BIGINT) AS rank, (SELECT id FROM s1) AS vec_id, 1.0 AS cov_cos"
      else s"SELECT CAST($r AS BIGINT), (SELECT id FROM s$r), (SELECT mx FROM s$r)"
    }.mkString("\n          UNION ALL ")
    s"""WITH e AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          s1 AS MATERIALIZED (SELECT min(vec_id) AS id FROM e)${rounds.toString}
          $out"""
  }

  /** NDCG position discounts w_i = ⌊10⁶/log₂(i+1)⌋, i = 1..10 — the
    * #211 precomputed-constants pattern (no engine-side log₂); single
    * source of truth for the Spark call and the generated oracle.
    * IDCG = Σ (11−i)·w_i = 29,966,086 is derived, never restated.
    */
  private val NdcgWeightsE6: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L, 315464L, 301029L,
      289064L)

  /** Planted late-delivery offset shift for cdc_ooo_repair — shared
    * by the Spark call and the oracle SQL.
    */
  private val OooDelayOffsets = 1000L

  /** Embedding dimensionality of the driver's `embeddings.parquet`
    * (`TESTDATA.md`). Single source of truth for every oracle whose
    * SQL must enumerate the dimensions (DuckDB has no dynamic
    * `size(array)` inside a comprehension bound); the gram-matrix
    * spec asserts the testdata actually has this dim.
    */
  val EmbeddingDim = 64

  /** Generated replay of the md5-quantized Poisson bootstrap for
    * `q_bootstrap_ci`: `range(0, b)` replicas and the discrete
    * 2.5%/97.5% ranks derived from the SAME formulas as
    * `Scale.bootstrapCi` (lowIdx = max(1, ⌈b·0.025⌉), hiIdx =
    * ⌈b·0.975⌉). Positive sums so div and // agree on every quotient.
    */
  private def bootstrapCiOracle(b: Int): String = {
    val lowIdx = math.max(1, math.ceil(b * 0.025).toInt)
    val hiIdx = math.ceil(b * 0.975).toInt
    s"""WITH rows0 AS (
           SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         wt AS (
           SELECT o_orderkey, cents, r.rep,
             (('0x' || substr(md5('graft-boot:' || o_orderkey || ':' || (r.rep // 6)),
                              1, 15))::BIGINT >> ((r.rep % 6) * 10)) & 1023 AS h
           FROM rows0, (SELECT unnest(range(0, $b)) AS rep) r),
         ww AS (
           SELECT rep, cents,
             CASE WHEN h < 377 THEN 0 WHEN h < 754 THEN 1
                  WHEN h < 942 THEN 2 WHEN h < 1004 THEN 3 ELSE 4 END AS w
           FROM wt),
         reps AS (
           SELECT rep,
             CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
           FROM ww GROUP BY 1),
         ranked AS (
           SELECT rep, mean_cents,
             row_number() OVER (ORDER BY mean_cents, rep) AS rk
           FROM reps)
         SELECT CAST(count(*) AS BIGINT) AS n_replicas,
           min(CASE WHEN rk = $lowIdx THEN mean_cents END) AS ci_lo_cents,
           min(CASE WHEN rk = $hiIdx THEN mean_cents END) AS ci_hi_cents,
           CAST(sum(mean_cents) // count(*) AS BIGINT) AS boot_mean_cents
         FROM ranked"""
  }

  /** Generated capped-round peeling replay for `q_kcore`: `maxRounds`
    * degree/keep/restrict CTE triples — bit-identical to the Spark
    * loop whether or not the peel converged early (the restriction is
    * idempotent at the fixpoint). `converged` replays the Spark
    * loop's convergence scalar: peeling only removes edges, so
    * last-two-rounds edge-count equality ⟺ fixpoint within the cap.
    */
  /** Generated unrolled edge-peel replay for `q_ktruss`: per round a
    * wedge+closure triangle CTE, a per-edge support CTE, and the
    * filtered edge CTE — idempotent at the fixpoint, so the full
    * unroll compares bit-exactly to Spark's early-exited loop. Every
    * CTE MATERIALIZED (each round reads the previous edge set three
    * times; default inlining would grow the plan exponentially).
    */
  private def ktrussOracle(k: Int, maxRounds: Int): String = {
    def supportCtes(i: Int, edges: String) =
      s"""tri$i AS MATERIALIZED (
            SELECT w.a, w.b, w.c
            FROM (SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
                  FROM $edges ab JOIN $edges bc ON ab.pb = bc.pa) w
            WHERE EXISTS (SELECT 1 FROM $edges x WHERE x.pa = w.a AND x.pb = w.c)),
          s$i AS MATERIALIZED (
            SELECT pa, pb, CAST(count(*) AS BIGINT) AS sup FROM (
              SELECT a AS pa, b AS pb FROM tri$i
              UNION ALL SELECT b, c FROM tri$i
              UNION ALL SELECT a, c FROM tri$i)
            GROUP BY 1, 2)"""
    val iters = (0 until maxRounds)
      .map { i =>
        s"""${supportCtes(i, s"e$i")},
           e${i + 1} AS MATERIALIZED (
             SELECT e.pa, e.pb FROM e$i e JOIN s$i s USING (pa, pb)
             WHERE s.sup >= ${k - 2})"""
      }
      .mkString(",\n         ")
    s"""WITH bp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e0 AS MATERIALIZED (SELECT pa, pb FROM pr WHERE n >= 2),
         $iters,
         ${supportCtes(maxRounds, s"e$maxRounds")},
         conv AS (SELECT CAST((SELECT count(*) FROM e${maxRounds - 1})
                            = (SELECT count(*) FROM e$maxRounds) AS BIGINT) AS converged)
         SELECT e.pa, e.pb, s.sup AS support, converged
         FROM e$maxRounds e JOIN s$maxRounds s USING (pa, pb), conv"""
  }

  /** Shared graph CTEs for the sampled-BFS centrality oracles: the
    * support-2 symmetric co-purchase edge list (`sym`).
    */
  private def symGraphCtes: String =
    s"""po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (SELECT part_a AS src, part_b AS dst FROM pairs
                 UNION ALL SELECT part_b, part_a FROM pairs)"""

  /** Unrolled sampled-BFS level CTEs `${p}l0..${p}l$depth` (σ path
    * counts as exact BIGINT sums, each level NOT-EXISTS-filtered
    * against the visited set). Every CTE MATERIALIZED — levels are
    * referenced by the next BFS round and (for Brandes) two dependency
    * rounds.
    */
  private def bfsCtes(p: String, seedMod: Int, depth: Int): String = {
    val bfs = (1 to depth)
      .map { r =>
        s"""${p}l$r AS MATERIALIZED (
              SELECT q.s, e.dst AS v, CAST(sum(q.sigma) AS BIGINT) AS sigma
              FROM ${p}l${r - 1} q JOIN sym e ON e.src = q.v
              WHERE NOT EXISTS (SELECT 1 FROM ${p}vis${r - 1} x WHERE x.s = q.s AND x.v = e.dst)
              GROUP BY 1, 2),
            ${p}vis$r AS MATERIALIZED (
              SELECT s, v FROM ${p}vis${r - 1} UNION ALL SELECT s, v FROM ${p}l$r)"""
      }
      .mkString(",\n         ")
    s"""${p}l0 AS MATERIALIZED (
           SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma
           FROM (SELECT DISTINCT src AS v FROM sym) WHERE v % $seedMod = 1),
         ${p}vis0 AS MATERIALIZED (SELECT s, v FROM ${p}l0),
         $bfs"""
  }

  /** Truncated-Brandes core: BFS levels + `depth−1` dependency CTEs
    * downward, each edge term the σ(v)·(10⁶+δ(w)) // σ(w) truncating
    * HUGEINT quotient Spark computes in DECIMAL(38,0); δ = 0 at the
    * truncation depth, v = s rows never enter. Emits `${p}bc(part,
    * bc_e6)`.
    */
  private def brandesCtes(p: String, seedMod: Int, depth: Int): String = {
    val dep = ((depth - 1) to 1 by -1)
      .map { r =>
        s"""${p}d$r AS MATERIALIZED (
              SELECT l.s, l.v,
                CAST(coalesce(sum(CAST(l.sigma AS HUGEINT) * (1000000 + d.delta) // w.sigma), 0)
                  AS BIGINT) AS delta
              FROM ${p}l$r l
              LEFT JOIN sym e ON e.src = l.v
              LEFT JOIN ${p}l${r + 1} w ON w.s = l.s AND w.v = e.dst
              LEFT JOIN ${p}d${r + 1} d ON d.s = w.s AND d.v = w.v
              GROUP BY 1, 2)"""
      }
      .mkString(",\n         ")
    val union = ((depth - 1) to 1 by -1)
      .map(r => s"SELECT v, delta FROM ${p}d$r")
      .mkString(" UNION ALL ")
    s"""${bfsCtes(p, seedMod, depth)},
         ${p}d$depth AS MATERIALIZED (SELECT s, v, CAST(0 AS BIGINT) AS delta FROM ${p}l$depth),
         $dep,
         ${p}bc AS (SELECT v AS part, CAST(sum(CAST(delta AS HUGEINT)) AS BIGINT) AS bc_e6
                FROM ($union) GROUP BY 1)"""
  }

  private def betweennessOracle(seedMod: Int, depth: Int, topK: Int): String =
    s"""WITH $symGraphCtes,
         ${brandesCtes("", seedMod, depth)}
         SELECT part, bc_e6, rank FROM (
           SELECT part, bc_e6,
             CAST(row_number() OVER (ORDER BY bc_e6 DESC, part) AS BIGINT) AS rank
           FROM bc)
         WHERE rank <= $topK"""

  /** Scorecard for `q_betweenness` (the approximation-ships-with-its-
    * scorecard invariant, §15.4): the production estimator's top-k
    * sets vs a DENSER reference (5× the seeds, one hop deeper) —
    * top-20/top-50 overlap counts + recall_e6, 1 row.
    */
  private def betweennessEvalOracle(
      seedMod: Int,
      depth: Int,
      refSeedMod: Int,
      refDepth: Int): String = {
    def top(p: String, k: Int, name: String) =
      s"""$name AS (SELECT part FROM (
            SELECT part, CAST(row_number() OVER (ORDER BY bc_e6 DESC, part) AS BIGINT) AS rank
            FROM ${p}bc) WHERE rank <= $k)"""
    s"""WITH $symGraphCtes,
         ${brandesCtes("a", seedMod, depth)},
         ${brandesCtes("b", refSeedMod, refDepth)},
         ${top("a", 20, "a20")}, ${top("a", 50, "a50")},
         ${top("b", 20, "b20")}, ${top("b", 50, "b50")}
         SELECT
           CAST((SELECT count(*) FROM a20 JOIN b20 USING (part)) AS BIGINT) AS overlap_20,
           CAST((SELECT count(*) FROM a50 JOIN b50 USING (part)) AS BIGINT) AS overlap_50,
           CAST((SELECT count(*) FROM a20 JOIN b20 USING (part)) * 1000000 // 20 AS BIGINT)
             AS recall20_e6,
           CAST((SELECT count(*) FROM a50 JOIN b50 USING (part)) * 1000000 // 50 AS BIGINT)
             AS recall50_e6,
           CAST((SELECT count(*) FROM abc) AS BIGINT) AS n_scored,
           CAST((SELECT count(*) FROM bbc) AS BIGINT) AS n_scored_ref"""
  }

  /** Sampled harmonic closeness from the same BFS levels: for each
    * node, Σ over seeds reached of 10⁶ // d(s, v) (harmonic — the
    * unreachable-safe closeness), d from the level index. Top-k by
    * (harmonic desc, part).
    */
  private def closenessOracle(seedMod: Int, depth: Int, topK: Int): String = {
    val union = (1 to depth)
      .map(r => s"SELECT v, $r AS d FROM l$r")
      .mkString(" UNION ALL ")
    s"""WITH $symGraphCtes,
         ${bfsCtes("", seedMod, depth)},
         harm AS (
           SELECT v AS part,
             CAST(sum(1000000 // d) AS BIGINT) AS harmonic_e6,
             CAST(count(*) AS BIGINT) AS n_seeds_reached
           FROM ($union) GROUP BY 1)
         SELECT part, harmonic_e6, n_seeds_reached, rank FROM (
           SELECT part, harmonic_e6, n_seeds_reached,
             CAST(row_number() OVER (ORDER BY harmonic_e6 DESC, part) AS BIGINT) AS rank
           FROM harm)
         WHERE rank <= $topK"""
  }

  private def kcoreOracle(k: Int, maxRounds: Int): String = {
    // every CTE MATERIALIZED: each e_i references e_{i-1} three times,
    // so default inlining would expand the base scan 3^rounds times
    val iters = (0 until maxRounds)
      .map { i =>
        s"""d$i AS MATERIALIZED (SELECT node, count(*) AS deg
             FROM (SELECT pa AS node FROM e$i UNION ALL SELECT pb FROM e$i)
             GROUP BY 1),
           k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
           e${i + 1} AS MATERIALIZED (SELECT pa, pb FROM e$i
             WHERE pa IN (SELECT node FROM k$i)
               AND pb IN (SELECT node FROM k$i))"""
      }
      .mkString(",\n         ")
    s"""WITH bp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e0 AS MATERIALIZED (SELECT pa, pb FROM pr WHERE n >= 2),
         $iters,
         conv AS (SELECT CAST((SELECT count(*) FROM e${maxRounds - 1})
                            = (SELECT count(*) FROM e$maxRounds) AS BIGINT) AS converged)
         SELECT node, CAST(count(*) AS BIGINT) AS core_deg, converged
         FROM (SELECT pa AS node FROM e$maxRounds UNION ALL SELECT pb FROM e$maxRounds), conv
         GROUP BY 1, 3"""
  }

  /** Generated capped-round short-cutting label-propagation replay
    * for `q_components`: each round is a neighbor-min hop CTE (tᵢ)
    * then a pointer-jump CTE (lᵢ = t(t)) — bit-identical to the
    * Spark loop whether or not it early-exited (both steps are
    * idempotent at the fixpoint). Every round references the
    * previous one more than once, so every CTE is MATERIALIZED —
    * default inlining would blow the plan up exponentially in
    * `maxRounds`.
    */
  private def componentsOracle(maxRounds: Int): String = {
    def round(prev: String, i: Int) =
      s"""t$i AS MATERIALIZED (
            SELECT l.part, least(l.label, coalesce(mn.m, l.label)) AS label
            FROM $prev l LEFT JOIN (
              SELECT e.src AS part, min(l2.label) AS m
              FROM sym e JOIN $prev l2 ON l2.part = e.dst GROUP BY e.src) mn
            USING (part)),
          l$i AS MATERIALIZED (
            SELECT h.part, j.label AS label
            FROM t$i h JOIN t$i j ON j.part = h.label)"""
    val iters = (1 to maxRounds).map(i => round(s"l${i - 1}", i)).mkString(",\n         ")
    s"""WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS w
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (SELECT part_a AS src, part_b AS dst FROM pairs
                 UNION ALL SELECT part_b, part_a FROM pairs),
         l0 AS MATERIALIZED (SELECT DISTINCT l_partkey AS part, l_partkey AS label FROM po),
         $iters,
         conv AS (
           SELECT CAST(NOT EXISTS (
             SELECT 1 FROM l$maxRounds a JOIN l${maxRounds - 1} b USING (part)
             WHERE a.label <> b.label) AS BIGINT) AS converged),
         sizes AS (SELECT label, count(*) AS comp_size FROM l$maxRounds GROUP BY label)
         SELECT part, l$maxRounds.label AS component, comp_size, converged
         FROM l$maxRounds JOIN sizes USING (label), conv"""
  }

  /** Shared CTE prefix for the q_label_prop / q_label_prop_eval
    * oracles: the support-filtered weighted co-purchase graph and
    * [[graft.operators.AnalyticsExt.LabelPropRounds]] unrolled
    * synchronous LPA rounds (argmax-weight relabel, ties to the
    * smallest label), ending at `r{R}` — the same single source of
    * truth the operator's constants come from, so the replay can't
    * drift from the Spark loop.
    */
  private def labelPropCtes: String = {
    val minSupport = graft.operators.AnalyticsExt.LabelPropMinSupport
    def round(i: Int) =
      s"""g$i AS (
            SELECT s.src AS part, l.label AS nl, CAST(sum(s.w) AS BIGINT) AS tw
            FROM sym s JOIN r${i - 1} l ON l.part = s.dst GROUP BY 1, 2),
          b$i AS (
            SELECT part, nl FROM (
              SELECT part, nl,
                row_number() OVER (PARTITION BY part ORDER BY tw DESC, nl) AS rn
              FROM g$i) WHERE rn = 1),
          r$i AS MATERIALIZED (
            SELECT r.part, COALESCE(b.nl, r.label) AS label
            FROM r${i - 1} r LEFT JOIN b$i b USING (part))"""
    val iters =
      (1 to graft.operators.AnalyticsExt.LabelPropRounds).map(round).mkString(",\n         ")
    s"""po AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS w
           FROM po a JOIN po b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= $minSupport),
         sym AS MATERIALIZED (SELECT pa AS src, pb AS dst, w FROM pairs
                UNION ALL SELECT pb, pa, w FROM pairs),
         r0 AS MATERIALIZED (
           SELECT DISTINCT l_partkey AS part, l_partkey AS label FROM po),
         $iters"""
  }

  private def labelPropOracle: String = {
    val r = s"r${graft.operators.AnalyticsExt.LabelPropRounds}"
    s"""WITH $labelPropCtes,
         sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS comm_size
                   FROM $r GROUP BY label)
         SELECT $r.part, $r.label AS community, comm_size
         FROM $r JOIN sizes USING (label)"""
  }

  /** Modularity fold of the LPA partition vs the brand partition on
    * the same support-filtered edge set; the sign-factored e6
    * quotient mirrors the Spark DECIMAL(38,0) algebra in HUGEINT.
    */
  private def labelPropEvalOracle: String = {
    val r = s"r${graft.operators.AnalyticsExt.LabelPropRounds}"
    s"""WITH $labelPropCtes,
         el AS (SELECT la.label AS ca, lb.label AS cb
                FROM pairs e JOIN $r la ON la.part = e.pa
                             JOIN $r lb ON lb.part = e.pb),
         ml AS (SELECT CAST(count(*) AS BIGINT) AS m FROM el),
         il AS (SELECT ca AS comm, CAST(count(*) AS BIGINT) AS mc
                FROM el WHERE ca = cb GROUP BY 1),
         dl AS (SELECT comm, CAST(count(*) AS BIGINT) AS degc
                FROM (SELECT ca AS comm FROM el UNION ALL SELECT cb FROM el)
                GROUP BY 1),
         fl AS (SELECT CAST(count(*) AS BIGINT) AS n_comms,
                  CAST(sum(COALESCE(i.mc, 0)) AS HUGEINT) AS sum_mc,
                  sum(CAST(d.degc AS HUGEINT) * d.degc) AS sum_deg2
                FROM dl d LEFT JOIN il i ON i.comm = d.comm),
         eb AS (SELECT pa.p_brand AS ca, pb.p_brand AS cb
                FROM pairs e JOIN part pa ON pa.p_partkey = e.pa
                             JOIN part pb ON pb.p_partkey = e.pb),
         ib AS (SELECT ca AS comm, CAST(count(*) AS BIGINT) AS mc
                FROM eb WHERE ca = cb GROUP BY 1),
         db AS (SELECT comm, CAST(count(*) AS BIGINT) AS degc
                FROM (SELECT ca AS comm FROM eb UNION ALL SELECT cb FROM eb)
                GROUP BY 1),
         fb AS (SELECT CAST(count(*) AS BIGINT) AS n_comms,
                  CAST(sum(COALESCE(i.mc, 0)) AS HUGEINT) AS sum_mc,
                  sum(CAST(d.degc AS HUGEINT) * d.degc) AS sum_deg2
                FROM db d LEFT JOIN ib i ON i.comm = d.comm)
         SELECT ml.m, fl.n_comms AS n_comms_lpa, fb.n_comms AS n_comms_brand,
           CAST((CASE WHEN 4 * CAST(ml.m AS HUGEINT) * fl.sum_mc - fl.sum_deg2 < 0
                      THEN -1 ELSE 1 END)
                * (abs(4 * CAST(ml.m AS HUGEINT) * fl.sum_mc - fl.sum_deg2) * 1000000
                   // (4 * CAST(ml.m AS HUGEINT) * ml.m)) AS BIGINT) AS q_lpa_e6,
           CAST((CASE WHEN 4 * CAST(ml.m AS HUGEINT) * fb.sum_mc - fb.sum_deg2 < 0
                      THEN -1 ELSE 1 END)
                * (abs(4 * CAST(ml.m AS HUGEINT) * fb.sum_mc - fb.sum_deg2) * 1000000
                   // (4 * CAST(ml.m AS HUGEINT) * ml.m)) AS BIGINT) AS q_brand_e6,
           CAST(4 * CAST(ml.m AS HUGEINT) * fl.sum_mc - fl.sum_deg2
                > 4 * CAST(ml.m AS HUGEINT) * fb.sum_mc - fb.sum_deg2 AS BIGINT)
             AS lpa_wins
         FROM ml, fl, fb"""
  }

  /** Generated Markov-attribution replay: journey truncation + START/
    * NULL framing per user, scenario edge redirection, and exactly
    * [[graft.operators.AnalyticsExt.MarkovAttrRounds]] unrolled
    * propagation rounds of the quantized trajectory mass·n // n_from
    * — the same integer steps the Spark loop takes.
    */
  private def markovAttrOracle: String = {
    val rounds = graft.operators.AnalyticsExt.MarkovAttrRounds
    val roundCtes = (1 to rounds)
      .map { i =>
        val prev = s"m${i - 1}"
        s"""m$i AS MATERIALIZED (
           SELECT se.scenario, se.b AS state,
             CAST(sum(p.mass * se.n // se.n_from) AS BIGINT) AS mass
           FROM se JOIN $prev p ON p.scenario = se.scenario AND p.state = se.a
           GROUP BY 1, 2)"""
      }
      .mkString(",\n         ")
    s"""WITH seqs AS (
           SELECT list(event_type ORDER BY ts, event_id) AS t0
           FROM events GROUP BY user_id),
         j1 AS (SELECT CASE WHEN list_position(t0, 'purchase') IS NOT NULL
                        THEN t0[1:list_position(t0, 'purchase')] ELSE t0 END AS t1
                FROM seqs),
         j2 AS (SELECT ['START'] || t1 ||
                  (CASE WHEN t1[-1] <> 'purchase' THEN ['NULL']
                        ELSE CAST([] AS VARCHAR[]) END) AS t
                FROM j1),
         tr AS (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b FROM j2),
         e AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
         ch AS (SELECT DISTINCT s AS removed
                FROM (SELECT a AS s FROM e UNION ALL SELECT b FROM e)
                WHERE s NOT IN ('START', 'NULL', 'purchase')),
         sc AS (SELECT removed FROM ch UNION ALL SELECT 'base'),
         se0 AS (
           SELECT sc.removed AS scenario, e.a,
             CASE WHEN e.b = sc.removed THEN 'NULL' ELSE e.b END AS b, e.n
           FROM e, sc WHERE e.a <> sc.removed),
         se1 AS (SELECT scenario, a, b, CAST(sum(n) AS BIGINT) AS n
                 FROM se0 GROUP BY 1, 2, 3
                 UNION ALL
                 SELECT sc.removed, s.st, s.st, CAST(1 AS BIGINT)
                 FROM sc, (VALUES ('purchase'), ('NULL')) s(st)),
         se AS (SELECT scenario, a, b, n,
                  CAST(sum(n) OVER (PARTITION BY scenario, a) AS BIGINT) AS n_from
                FROM se1),
         m0 AS (SELECT removed AS scenario, 'START' AS state,
                  CAST(1000000 AS BIGINT) AS mass FROM sc),
         $roundCtes,
         conv AS (SELECT sc.removed AS scenario,
                    CAST(coalesce(m.mass, 0) AS BIGINT) AS conv_e6
                  FROM sc LEFT JOIN m$rounds m
                    ON m.scenario = sc.removed AND m.state = 'purchase'),
         base AS (SELECT conv_e6 AS base_conv_e6 FROM conv WHERE scenario = 'base'),
         eff AS (SELECT c.scenario AS channel, b.base_conv_e6,
                   c.conv_e6 AS removed_conv_e6,
                   CAST(b.base_conv_e6 - c.conv_e6 AS BIGINT) AS effect_e6
                 FROM conv c, base b WHERE c.scenario <> 'base'),
         tot AS (SELECT CAST(sum(effect_e6) AS BIGINT) AS sum_eff FROM eff)
         SELECT channel, base_conv_e6, removed_conv_e6, effect_e6,
           CAST(CASE WHEN sum_eff > 0 THEN effect_e6 * 1000000 // sum_eff
                ELSE 0 END AS BIGINT) AS attribution_e6
         FROM eff, tot"""
  }
}
