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
object SparkEntry extends SparkEntryOracleHelpers
    with OracleAnn with OracleCdc with OracleDedup with OracleMm with OracleText with OracleWarehouseA with OracleWarehouseB with OracleWarehouseC
    with OracleWarehouseD with OracleWarehouseE {

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
    // HST hash-split density outliers + planted scorecard (§2 #426/#427)
    "q_hst_outliers" -> ((s: SparkSession, d: String) => Scale.hstOutliers(s, d)),
    "q_hst_eval" -> ((s: SparkSession, d: String) => Scale.hstOutlierEval(s, d)),
    // Scale techniques (§2 #43-46)
    "q_salted_join" -> (Scale.saltedJoin(_, _)),
    // Skew-salting advisor: per-key salt factors under the fair share (§2 #443)
    "q_salt_advisor" -> ((s: SparkSession, d: String) => Scale.saltAdvisor(s, d)),
    // Salted aggregate consuming the advisor end-to-end (§2 #451)
    "q_salted_agg" -> ((s: SparkSession, d: String) => Scale.saltedAgg(s, d)),
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
    // Fellegi-Sunter m/u-weight linkage over the blocked pairs (§2 #423)
    "dedup_fs_linkage" -> ((s: SparkSession, d: String) => Dedup.fsLinkage(s, d)),
    // FS decision scorecard vs the planted truth (§2 #424)
    "dedup_fs_eval" -> ((s: SparkSession, d: String) => Dedup.fsLinkageEval(s, d)),
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
    // HNSW layering over the NSW graph (§2 #414-415)
    "ann_hnsw_search" -> ((s, d) => Similarity.hnswSearch(s, d)),
    "ann_hnsw_recall" -> ((s, d) => Similarity.hnswRecallCurve(s, d)),
    // NN-Descent linear-cost graph build + convergence curve (§2 #416-417)
    "ann_nndescent" -> ((s, d) => Similarity.nnDescent(s, d)),
    "ann_nndescent_recall" -> ((s, d) => Similarity.nnDescentRecall(s, d)),
    // incremental k-NN graph fold + per-kind recall (§2 #419-420)
    "ann_graph_insert" -> ((s, d) => Similarity.graphInsert(s, d)),
    "ann_graph_insert_eval" -> ((s, d) => Similarity.graphInsertEval(s, d)),
    // cell-bounded (n^1.5) layer-0 variants of the graph-ANN builds (§2 #448-450)
    "ann_nsw_scalable" -> ((s, d) => Similarity.nswSearchScalable(s, d)),
    "ann_hnsw_scalable" -> ((s, d) => Similarity.hnswSearchScalable(s, d)),
    "ann_graph_insert_scalable" -> ((s, d) => Similarity.graphInsertScalable(s, d)),
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
    // Label-filtered IVF search + pre/post strategy scorecard (§2 #435/#436)
    "ann_filtered" -> ((s, d) => FilteredAnn.filteredSearch(s, d)),
    "ann_filtered_recall" -> ((s, d) => FilteredAnn.filteredEval(s, d)),
    // k-means|| scalable seeding + seeding-cost scorecard (§2 #437/#438)
    "ann_kmeanspar" -> ((s, d) => KmeansPar.seeds(s, d)),
    "ann_kmeanspar_eval" -> ((s, d) => KmeansPar.seedingEval(s, d)),
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
    // quality-filter scorecard on planted degenerates (§2 #421)
    "text_filter_eval" -> ((s: SparkSession, d: String) => TextOps.filterEval(s, d)),
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
    // Value-mask pattern profiling (§2 #433)
    "q_value_mask" -> ((s: SparkSession, d: String) => Profile.valueMask(s, d)),
    // Payload schema-drift audit over a planted-evolution feed (§2 #434)
    "cdc_schema_drift" -> ((s: SparkSession, d: String) => Cdc.schemaDrift(s, d)),
    // Structured Streaming operators driven to completion on the
    // file-backed changelog — the former spec-only rows #84/#108/
    // #143/#164/#205 as full driver-checkable entries
    "cdc_stream_sessions" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.sessionsFinal(s, d)),
    "cdc_stream_dedup" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.dedupFinal(s, d)),
    "cdc_stream_interval_join" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.intervalJoinFinal(s, d)),
    "cdc_stream_enrich" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.enrichFinal(s, d)),
    "cdc_stream_rolling_mau" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.rollingDistinctFinal(s, d)),
    "cdc_stream_current" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.currentStateFinal(s, d)),
    "cdc_stream_cms" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.cmsFinal(s, d)),
    "cdc_stream_throttle" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.throttleFinal(s, d)),
    "cdc_stream_holt" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.holtFinal(s, d)),
    "cdc_stream_cusum" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.cusumFinal(s, d)),
    "cdc_stream_ph" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.phFinal(s, d)),
    "cdc_stream_ewma" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.ewmaFinal(s, d)),
    "cdc_stream_croston" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.crostonFinal(s, d)),
    "cdc_stream_imr" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.imrFinal(s, d)),
    "cdc_stream_hh" ->
      ((s: SparkSession, d: String) => streaming.StreamDriver.hhFinal(s, d)),
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
    // Sensitivity-sampling lightweight coreset (§2 #425)
    "ann_coreset" -> ((s: SparkSession, d: String) => Similarity.coreset(s, d)),
    // Vamana alpha-pruned navigable graph + search scorecard (§2 #428/#429)
    "ann_vamana" -> ((s: SparkSession, d: String) => Similarity.vamana(s, d)),
    "ann_vamana_recall" -> ((s: SparkSession, d: String) => Similarity.vamanaRecall(s, d)),
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
    "q_peak_concurrency" -> ((s: SparkSession, d: String) => AnalyticsExt.peakConcurrency(s, d)),
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
    "q_catalog_breadth" -> ((s: SparkSession, d: String) => AnalyticsExt.catalogBreadth(s, d)),
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
    // k-anonymity / l-diversity privacy audit (§2 #418)
    "q_k_anonymity" -> (Profile.kAnonymity _),
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
    // Token-replay conformance: four-counter fitness vs the filtered DFG (§2 #422)
    "q_token_replay" -> ((s: SparkSession, d: String) => AnalyticsExt.tokenReplay(s, d)),
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
    // Wilcoxon signed-rank paired test (§2 #430)
    "q_wilcoxon" -> ((s: SparkSession, d: String) => AnalyticsExt.wilcoxonSignedRank(s, d)),
    // CUPED pre-period variance reduction (§2 #431)
    "q_cuped" -> ((s: SparkSession, d: String) => AnalyticsExt.cuped(s, d)),
    // Yule-Walker AR(2) fit + one-step backtest (§2 #432)
    "q_ar2_forecast" -> ((s: SparkSession, d: String) => AnalyticsExt.ar2Forecast(s, d)),
    // Split-conformal prediction interval + honest coverage (§2 #439)
    "q_conformal" -> ((s: SparkSession, d: String) => AnalyticsExt.conformal(s, d)),
    // Isotonic calibration via the minimax closed form (§2 #440)
    "q_isotonic" -> ((s: SparkSession, d: String) => AnalyticsExt.isotonic(s, d)),
    // Cochran-Armitage ordered trend test (§2 #441)
    "q_trend_test" -> ((s: SparkSession, d: String) => AnalyticsExt.trendTest(s, d)),
    // G-test of independence on the #189 contingency table (§2 #447)
    "q_g_test" -> ((s: SparkSession, d: String) => AnalyticsExt.gTest(s, d)),
    // Jarque-Bera normality test per daily series (§2 #455)
    "q_jarque_bera" -> ((s: SparkSession, d: String) => AnalyticsExt.jarqueBera(s, d)),
    // Durbin-Watson serial-correlation test on detrended residuals (§2 #456)
    "q_durbin_watson" -> ((s: SparkSession, d: String) => AnalyticsExt.durbinWatson(s, d)),
    // Dickey-Fuller unit-root test per daily series (§2 #457)
    "q_adf_test" -> ((s: SparkSession, d: String) => AnalyticsExt.adfTest(s, d)),
    // Partial autocorrelation lags 1-3, Durbin-Levinson (§2 #458)
    "q_pacf" -> ((s: SparkSession, d: String) => AnalyticsExt.pacf(s, d)),
    // Empirical-Bayes pseudo-count rate shrinkage, top movers (§2 #459)
    "q_eb_shrinkage" -> ((s: SparkSession, d: String) => AnalyticsExt.ebShrinkage(s, d)),
    // Restricted mean survival time over the KM curve (§2 #460)
    "q_rmst" -> ((s: SparkSession, d: String) => AnalyticsExt.rmst(s, d)),
    // Good-Turing frequency spectrum + unseen mass (§2 #461)
    "text_good_turing" -> (TextStats.goodTuring _),
    // Log-log OLS price elasticity per brand (§2 #462)
    "q_price_elasticity" -> ((s: SparkSession, d: String) => AnalyticsExt.priceElasticity(s, d)),
    // Gumbel block-maxima fit + return levels (§2 #463)
    "q_gumbel" -> ((s: SparkSession, d: String) => AnalyticsExt.gumbelFit(s, d)),
    // Transition handoff waiting-time profile (§2 #464)
    "q_handoff" -> ((s: SparkSession, d: String) => AnalyticsExt.handoffTimes(s, d)),
    // Aspect-ratio bucketing plan for image batches (§2 #465)
    "mm_aspect_bucket" -> ((s: SparkSession, d: String) => Multimodal.aspectBucket(s, d)),
    // Landmark-BFS reach profile / diameter lower bound (§2 #466)
    "q_graph_diameter" -> ((s: SparkSession, d: String) => AnalyticsExt.landmarkBfs(s, d)),
    // McNemar paired-binary test (§2 #467)
    "q_mcnemar" -> ((s: SparkSession, d: String) => AnalyticsExt.mcnemar(s, d)),
    // Negative-binomial overdispersion fit (§2 #468)
    "q_negbin_fit" -> ((s: SparkSession, d: String) => AnalyticsExt.negbinFit(s, d)),
    // Friedman k-sample paired rank test on quarters (§2 #469)
    "q_friedman" -> ((s: SparkSession, d: String) => AnalyticsExt.friedman(s, d)),
    // Bass diffusion OLS fit on first-order adopters (§2 #470)
    "q_bass_diffusion" -> ((s: SparkSession, d: String) => AnalyticsExt.bassDiffusion(s, d)),
    // Universe/coordinated sampling: join-consistent pilot queries (§2 #471)
    "q_universe_sample" -> ((s: SparkSession, d: String) => Sampling.universeSample(s, d)),
    // Kneser-Ney bigram cross-entropy vs MLE (§2 #472)
    "text_kn_ppl" -> (TextStats.knBigramEntropy _),
    // Hurst exponent by rescaled range (§2 #473)
    "q_hurst" -> ((s: SparkSession, d: String) => AnalyticsExt.hurstRs(s, d)),
    // Wald SPRT sequential A/B walk (§2 #474)
    "q_sprt" -> ((s: SparkSession, d: String) => AnalyticsExt.sprt(s, d)),
    // Chapman capture-recapture corpus-size estimate (§2 #442)
    "dedup_capture" -> ((s: SparkSession, d: String) => AnalyticsExt.captureRecapture(s, d)),
    // Discrete-Laplace DP noisy counts at three epsilon tiers (§2 #444)
    "q_dp_counts" -> ((s: SparkSession, d: String) => Profile.dpCounts(s, d)),
    // Two-stage residual vector quantization + family scorecard (§2 #445/#446)
    "ann_rvq_codes" -> ((s, d) => Rvq.rvqCodes(s, d)),
    "ann_rvq_eval" -> ((s, d) => Rvq.rvqEval(s, d)),
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

  /** Assembled from the per-domain Oracle* traits (the r10/r12
    * file-size splits); one entry per oracle-checkable query in
    * [[queries]] — the count is pinned by the driver's per-round
    * CORRECTNESS gate, not here.
    */
  def oracleSql: Map[String, String] = oracleAnn ++ oracleCdc ++ oracleDedup ++ oracleMm ++ oracleText ++ oracleWarehouseA ++ oracleWarehouseB ++ oracleWarehouseC ++ oracleWarehouseD ++ oracleWarehouseE
}
