package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.util.Sessions

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and §7
  * (build plan). One `queries` entry per implemented operator; `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL for hash-comparison (omitted only
  * for ops that are not ANSI-SQL-expressible, e.g. MinHash LSH).
  *
  * Determinism rules applied throughout (SURVEY §2 preamble): total-order
  * sort on a unique key; money sums as DECIMAL(18,2) (associative, partition-
  * order independent); doubles rounded to 4 decimals; `events.ts` (parquet
  * TIMESTAMP(NANOS)) surfaced as epoch-µs BIGINT on both engines; ISO
  * day-of-week; explicit NULLS FIRST in every oracle ORDER BY.
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shaped grouped aggregation, SURVEY §7.2) on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    Relational.aggGroup(spark, "/root/testdata/sf0.001")
  }

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Sessions.tune(s), dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core relational tier (SURVEY §2.1 ops 1, 2, 11, 14, 15 + §2.2 completions)
    "q_scan_project"      -> q(Relational.scanProject),
    "q_filter_predicate"  -> q(Relational.filterPredicate),
    "q_agg_group"         -> q(Relational.aggGroup),
    "q_join_inner_equi"   -> q(Relational.joinInnerEqui),
    "q_join_left_outer"   -> q(Relational.joinLeftOuter),
    "q_join_right_outer"  -> q(Relational.joinRightOuter),
    "q_join_full_outer"   -> q(Relational.joinFullOuter),
    "q_cross_join"        -> q(Relational.crossJoinDims),
    "q_salted_join"       -> q(Relational.saltedJoinAgg), // skew path, oracle-identical to plain join
    "q_join_semi"         -> q(Relational.joinSemi),
    "q_join_anti"         -> q(Relational.joinAnti),
    "q_distinct"          -> q(Relational.distinctKeys),
    "q_topk"              -> q(Relational.topK),
    "q_set_ops"           -> q(Relational.setOps),
    "q_intersect"         -> q(Relational.intersectOp),
    "q_rollup"            -> q(Relational.rollupAgg),
    "q_cube"              -> q(Relational.cubeAgg),
    "q_grouping_sets"     -> q(Relational.groupingSets),
    "q_pivot"             -> q(Relational.pivotCounts),
    "q_unpivot"           -> q(Relational.unpivotMeasures),
    "q_asof_join"         -> q(TimeJoins.asofJoin),
    "q_asof_join_native"  -> q(TimeJoins.asofJoinNative), // custom AsofJoinExec; same oracle as q_asof_join → operator proven exact
    "q_asof_tolerance"    -> q(TimeJoins.asofJoinTolerance(_, _, 604800000000L)),
    "q_interval_join"     -> q(RangeJoins.intervalJoin),
    "q_range_band_join"   -> q(RangeJoins.rangeBandJoin),
    "q_window_ranks"      -> q(Windows.windowRanks),
    "q_window_cume"       -> q(Windows.windowCume),
    "q_rolling_median"    -> q(Windows.rollingMedian),
    "q_topk_per_group"    -> q(Relational.topkPerGroup(_, _, 3)),
    "q_scalar_string_funcs" -> q(Enrichment.scalarStringFuncs),
    "q_approx_sketches"   -> q(Relational.approxSketches), // no-oracle: sketch internals engine-specific

    // warehouse tier (ops 3-5, 12, 13, 16, 18, 21, 22)
    "q_watermark_max"     -> q(Warehouse.watermarkMax),
    "q_coalesce_default"  -> q(Warehouse.coalesceDefault),
    "q_incr_range_filter" -> q(Warehouse.incrRangeFilter),
    "q_scd_insert_new"    -> q(Warehouse.scdInsertNew),
    "q_merge_upsert"      -> q(Warehouse.mergeUpsertQ),
    "q_mark_processed"    -> q(Warehouse.markProcessed),
    "q_cdc_changes"       -> q(Warehouse.cdcChanges),
    "q_date_dim_generate" -> q(Warehouse.dateDimGenerate),
    "q_scd2_versions"     -> q(Warehouse.scd2Versions),
    "q_scd2_asof"         -> q(Warehouse.scd2AsOf(_, _, 1705276800000000L)),
    "q_late_arriving"     -> q(Warehouse.lateArrivingDim),
    "q_surrogate_key"     -> q(Warehouse.surrogateKeys), // oracle = global row_number → two-phase ≡ window proven by hash
    "q_star_join"         -> q(Relational.starJoinRevenue),
    "q_percentile_disc"   -> q(Relational.percentileDisc),
    "q_winsorize"         -> q(Quality.winsorize(_, _, 0.05, 0.95)),
    "q_collocations"      -> q(Text.collocations(_, _, 5)),
    "q_seasonal_anomaly"  -> q(Quality.seasonalAnomaly(_, _, 2.0)),
    "q_gap_fill_locf"     -> q(Windows.gapFillLocf),
    "q_media_chunk"       -> q(Multimodal.mediaChunk(_, _, 30000L, 25000L)),
    "q_incr_agg_merge"    -> q(Warehouse.incrAggMerge), // oracle = full recompute → merge ≡ recompute proven by hash
    "q_funnel"            -> q(Windows.funnel),
    "q_retention"         -> q(Windows.retentionCohorts),
    // data-quality tier (ops 8, 9, 10, 17)
    "q_dedup_rownum"      -> q(Quality.dedupRownum),
    "q_impute_avg"        -> q(Quality.imputeAvg),
    "q_outlier_zscore"    -> q(Quality.outlierZscore),
    "q_update_conditional"-> q(Quality.updateConditional),
    "q_dq_profile"        -> q(Quality.dqProfile),
    "q_dq_rules"          -> q(DqRules.ordersRuleReport), // declarative rule engine: row-level rules fold to ONE aggregate
    "q_histogram"         -> q(Quality.histogram(_, _, 11000.0, 10)),
    "q_corr_agg"          -> q(Relational.corrAgg),
    "q_regr_agg"          -> q(Relational.regrAgg),
    "q_percent_total"     -> q(Relational.percentTotal),
    "q_gaps_islands"      -> q(Windows.gapsIslands),
    "q_quantiles_exact"   -> q(Relational.quantilesExact),
    "q_mode_agg"          -> q(Relational.modeAgg),
    "q_group_concat"      -> q(Relational.groupConcat),
    "q_outlier_mad"       -> q(Quality.outlierMad),
    "q_argmax"            -> q(Relational.argmaxPerGroup),
    "q_bloom_join"        -> q(Relational.bloomPrunedJoin), // bloom prune, oracle-identical to plain join
    // enrichment tier (ops 6, 7, 19, 20)
    "q_arrays_zip_explode"-> q(Enrichment.arraysZipExplode),
    "q_json_extract"      -> q(Enrichment.jsonExtract),
    "q_json_staging"      -> q(Enrichment.jsonStaging),
    "q_scalar_date_funcs" -> q(Enrichment.scalarDateFuncs),
    "q_scalar_math_funcs" -> q(Enrichment.scalarMathFuncs),
    "q_null_semantics"    -> q(Enrichment.nullSemantics),
    "q_window_range_frame"-> q(Enrichment.windowRangeFrame),
    // event-time windowing tier (§2.3)
    "q_window_tumbling"   -> q(Windows.tumbling),
    "q_session_gaps"      -> q(Windows.sessionGaps),
    "q_window_frame"      -> q(Windows.windowFrame),
    "q_window_values"     -> q(Windows.windowValues),
    // text-analysis tier (LLM-data north star)
    "q_text_stats"        -> q(Text.textStats),
    "q_token_count"       -> q(Text.tokenCount),
    "q_seq_pack"          -> q(Text.seqPack(_, _)),
    "q_corpus_mix"        -> q(Text.corpusMixQ),
    "q_embed_norm"        -> q(Similarity.embedNorms),
    "q_quality_score"     -> q(Text.qualityScore),
    "q_lang_id"           -> q(Text.langId),
    "q_doc_fingerprint"   -> q(Text.docFingerprint),
    "q_doc_dedup_exact"   -> q(Text.docDedupExact),
    "q_split_assign"      -> q(Text.splitAssign),
    "q_incr_dedup"        -> q(Text.incrDedup),
    "q_ngram_jaccard"     -> q(Text.ngramJaccard),
    "q_sample_weighted"   -> q(Text.sampleWeighted(_, _, 3)),
    "q_doc_chunk"         -> q(Text.docChunk(_, _, 100, 80)),
    "q_vocab_topk"        -> q(Text.vocabTopK(_, _, 100)),
    "q_pii_scrub"         -> q(Text.piiScrub),
    "q_contamination"     -> q(Text.contamination(_, _, 97, 0.5)),
    "q_repetition"        -> q(Text.repetition),
    "q_tfidf"             -> q(Text.tfidf(_, _, 3)),
    "q_token_entropy"     -> q(Text.tokenEntropy),
    "q_quality_band"      -> q(Text.qualityBand(_, _, 0.1, 0.9)),
    "q_ngram_lm"          -> q(Text.ngramLm(_, _, 5, 3)),
    "q_domain_cap"        -> q(Text.domainCap(_, _, 10)), // two-phase per-source quota; oracle = window
    "q_embed_centroid"    -> q(Similarity.embedCentroid), // fixed-point exact vector mean under the hash gate
    // round-6 relational/analytic completions
    "q_exists_subquery"   -> q(Relational.existsSubquery),
    "q_scalar_subquery"   -> q(Relational.scalarSubquery),
    "q_lateral_topn"      -> q(Relational.lateralTopN),
    "q_conditional_agg"   -> q(Relational.conditionalAgg),
    "q_crosstab_dense"    -> q(Relational.denseCrosstab),
    "q_resample_weekly"   -> q(Warehouse.resampleWeekly),
    "q_role_playing_dim"  -> q(Warehouse.rolePlayingDim),
    "q_benford"           -> q(Relational.benfordProfile),
    "q_perplexity_filter" -> q(Text.perplexityFilter(_, _, 8.0)),
    "q_wma"               -> q(Windows.wma),
    "q_ewma"              -> q(Windows.ewma), // dyadic α=1/2: exponential weights as exact powers of two
    "q_abtest"            -> q(Relational.abTest(_, _, 250.0)),
    "q_markov_transitions"-> q(Windows.markovTransitions),
    "q_yoy_delta"         -> q(Windows.yoyDelta),
    "q_bpe_merges"        -> q(Text.bpeMerges(_, _, 20)),
    "q_bpe_train"         -> q(Text.bpeTrain), // 5-round iterated BPE merge loop; unrolled oracle fold
    "q_bpe_apply"         -> q(Text.bpeApply), // tokenize the corpus with the learned merges; per-doc compression
    // round-5 insight tier: BI/statistics over the star schema
    "q_assoc_rules"       -> q(Insights.assocRules),
    "q_rfm"               -> q(Insights.rfmSegments), // exact NTILE via two-phase distributed rank
    "q_attribution"       -> q(Insights.attributionLastTouch),
    "q_pareto_front"      -> q(Insights.paretoFront), // skyline via price-collapsed cummax, not O(n²)
    "q_equi_depth_hist"   -> q(Insights.equiDepthHist),
    "q_stratified_sample" -> q(Insights.stratifiedSample(_, _, 20)),
    "q_ks_test"           -> q(Insights.ksTest),
    "q_gini"              -> q(Insights.giniByNation),
    "q_chi2"              -> q(Insights.chi2Independence),
    "q_curriculum"        -> q(Insights.curriculumPhases),
    "q_bm25"              -> q(Text.bm25(_, _, 20)),
    "q_triangles"         -> q(Insights.triangles(_, _, 5)),
    "q_pagerank"          -> q(Insights.pageRank), // fixed-point 5-round link analysis vs unrolled oracle
    "q_shortest_path"     -> q(Insights.shortestPath), // 4-round Bellman-Ford vs unrolled relaxation oracle
    "q_jaccard_prefix_join" -> q(Text.jaccardPrefixJoin(_, _)), // lossless PPJoin prefix prune vs NAIVE oracle join
    "q_dup_spans"         -> q(Text.dupSpans(_, _, 100)), // corpus-wide repeated 3-gram spans, top-k by doc frequency
    "q_dedup_exact_substr" -> q(Text.dedupExactSubstr), // ExactSubstr span-granular removal: cross-doc duplicated 3-gram spans cut out of every doc
    "q_containment_join"  -> q(Text.containmentJoin(_, _, 4, 5)), // asymmetric |A∩B|/|A| >= 4/5 vs NAIVE oracle join
    "q_sliding_distinct"  -> q(Windows.slidingDistinct),
    "q_hierarchy"         -> q(Warehouse.hierarchyFlatten), // log-round pointer jumping vs WITH RECURSIVE oracle
    "q_cusum"             -> q(Quality.cusumChangepoint),
    "q_moments"           -> q(Quality.momentsProfile),
    "q_sessionize_typed"  -> q(Windows.sessionizeTyped), // typed flatMapGroups ≡ window gaps-and-islands, proven by hash
    "q_division"          -> q(Relational.relationalDivision),
    "q_not_in_nulls"      -> q(Relational.notInNulls), // 3VL: NOT IN vs NOT EXISTS under subquery NULLs
    "q_agg_of_agg"        -> q(Relational.aggOfAgg),
    "q_oov_rate"          -> q(Text.oovRate(_, _, 200)),
    "q_embed_quantize"    -> q(Similarity.embedQuantize), // int8 vector compression, checksum-gated
    "q_except_all"        -> q(Relational.exceptAll), // bag semantics: multiplicity-preserving difference
    "q_ref_integrity"     -> q(Relational.refIntegrity),
    "q_mult_means"        -> q(Relational.multMeans), // geometric + harmonic means, decimal-folded Σs
    "q_outlier_iqr"       -> q(Quality.outlierIqr),
    "q_cms_heavyhitters"  -> q(Text.cmsHeavyHitters(_, _, 20)), // no-oracle: sketch hash layout engine-specific; bounds spec-checked
    "q_nth_value_bool"    -> q(Windows.nthValueBoolAgg),
    "q_seqlen_percentiles"-> q(Text.seqlenPercentiles),
    "q_dedup_savings"     -> q(Text.dedupSavings),
    "q_first_touch"       -> q(Insights.attributionFirstTouch),
    "q_incr_join_merge"   -> q(Warehouse.incrJoinMerge), // join-delta algebra ≡ full recompute, proven by hash
    "q_decile_lift"       -> q(Insights.decileLift),
    "q_abc_class"         -> q(Insights.abcClassification),
    "q_explode_outer"     -> q(Enrichment.explodeOuter), // generator null contract ≡ LEFT JOIN, proven by hash
    // near-dup + similarity tier (no-oracle: signatures not SQL-expressible)
    "q_doc_dedup_minhash" -> q(Dedup.minhashPairs(_, _, 20)),
    "q_doc_dedup_minhash_udaf" -> q(Dedup.minhashPairsUdaf(_, _, 20)), // typed Aggregator path, same output
    "q_doc_dedup_components" -> q(Dedup.dedupComponents(_, _, 0.8)), // pairs → clusters → canonical ids
    "q_doc_dedup_embed"   -> q(Similarity.dedupEmbed(_, _, 0.95)), // embedding-cosine near-dup clusters
    "q_doc_dedup_simhash" -> q(Dedup.simhashPairs(_, _, 20)),
    "q_dedup_simhash_gated" -> q(Dedup.simhashGatedPairs(_, _, 20)), // md5-hashed twin: full pair path under the hash gate
    "q_doc_dedup_minhash_gated" -> q(Dedup.minhashGatedPairs(_, _, 20)), // Carter-Wegman twin: full minhash path under the hash gate
    "q_cms_gated"         -> q(Text.cmsGated(_, _, 20)), // count-min mechanism under the hash gate (portable cell hashes)
    "q_hll_gated"         -> q(Text.hllGated), // HLL mechanism under the hash gate (transcendental-free raw estimator)
    "q_near_dup_editdist" -> q(Dedup.editDistPairs(_, _, 40, 8)), // blocked+thresholded Levenshtein — the oracled dedup modality
    "q_dedup_components_editdist" -> q(Dedup.dedupComponentsEditdist), // CC tail under the hash gate (recursive-CTE oracle)
    "q_embed_cosine_topk" -> q(Similarity.cosineTopK(_, _, 10)),
    "q_ann_batch"         -> q(Similarity.cosineTopKBatch(_, _, 8, 5)),
    "q_knn_classify"      -> q(Similarity.knnClassify(_, _, 8, 5)),
    "q_ann_lsh"           -> q(Similarity.annLshPairs(_, _, 20)),
    "q_ann_lsh_gated"     -> q(Similarity.annLshGatedPairs(_, _, 20)), // md5-plane twin: full LSH path under the hash gate
    "q_ann_ivf"           -> q(Ivf.ivfTopK(_, _, 10, 16, 8)), // no-oracle: k-means internals engine-specific
    "q_ann_ivf_quantized" -> q(Ivf.ivfTopKQuantized(_, _, 10, 16, 8)), // int8-scored shortlist + full-precision re-rank; no-oracle, recall spec
    "q_ann_ivf_gated"     -> q(Ivf.ivfGatedTopK(_, _, 10, 16, 4)), // integer-L2 k-means twin: sample/init/Lloyd's/lists/probe under the hash gate
    "q_kcore"             -> q(Insights.kcore), // 3-round degree peeling, data-derived k, vs unrolled oracle
    "q_incr_dedup_minhash" -> q(Dedup.incrMinhashGated), // batch-vs-corpus band-index probe, linear in the batch
    "q_lsh_recall"        -> q(Dedup.lshRecallGated(_, _, 1, 2)), // measured recall of banded minhash vs exact J>=1/2 truth
    "q_semantic_dedup"    -> q(Ivf.semanticDedupGated(_, _, 16, 130000000L)), // cluster-then-compare embedding dedup, keep-lowest-id
    "q_semantic_dedup_mp" -> q(Ivf.semanticDedupMultiprobe(_, _, 16, 130000000L)), // 2-nearest-cell multi-probe: closes the cross-cell recall gap
    "q_semantic_dedup_hier" -> q(Ivf.semanticDedupHier(_, _, 4, 4, 130000000L)), // two-level fit AND routing: sample×(3√k·3+√k·5) fit, corpus×2√k routing
    "q_mannwhitney"       -> q(Insights.mannWhitney), // rank-sum test, tie-averaged doubled-integer ranks via distributed prefix sum
    "q_skew_report"       -> q(Insights.skewReport), // join-key concentration profile: the salting decision input
    "q_bridge_alloc"      -> q(Warehouse.bridgeAllocation), // Kimball M:N bridge with integer-exact allocation factors
    "q_ann_join"          -> q(Ivf.annJoinGated(_, _, 16, 130000000L)), // cross-corpus ANN join: B-owned index, per-A argmin, honest misses
    "q_psi_drift"         -> q(Quality.psiDrift(_, _, 10)), // population stability index: integer bins, fixed-point ln terms
    "q_spearman"          -> q(Insights.spearman), // rank correlation: tie-averaged doubled ranks, decimal moment sums
    // multimodal plumbing tier
    "q_multimodal_meta"   -> q(Multimodal.multimodalMeta),
    "q_frame_sample"      -> q(Multimodal.frameSample(_, _, 5)),
    "q_media_resize"      -> q(Multimodal.mediaResize(_, _, 224)),
    "q_media_embed_stub"  -> q(Multimodal.mediaEmbedStub(_, _, 16)),
    // round-8b additions: corpus-novelty, graph-structure and time-series tier
    "q_ngram_novelty"     -> q(Text.ngramNovelty), // per-doc first-occurrence shingle fraction: marginal corpus contribution
    "q_clustering_coeff"  -> q(Insights.clusteringCoeff(_, _, 5)), // per-node lcc over the brand graph, wedge-closure counting
    "q_degree_dist"       -> q(Insights.degreeDist), // log2-binned co-purchase degree histogram via integer bit length
    "q_autocorr"          -> q(Insights.autocorr(_, _, 3)), // lag-1..3 ACF of daily revenue, aggregate-first + decimal moments
    "q_mk_trend"          -> q(Insights.mkTrend), // Mann-Kendall monotone trend per segment, calendar-bounded pair join
    "q_hhi"               -> q(Insights.hhi), // Herfindahl supplier concentration per nation, decimal-exact shares
    "q_rank_biserial"     -> q(Insights.rankBiserial), // effect size from mannwhitney's exact doubled-U
    "q_time_weighted_avg" -> q(Windows.timeWeightedAvg), // irregular-sampling interval-weighted mean per user
    "q_kendall_tau"       -> q(Insights.kendallTau), // tau-b concordance on calendar-bounded monthly pairs
    "q_cramers_v"         -> q(Insights.cramersV), // 0..1 association strength companion to q_chi2
    "q_anova_f"           -> q(Insights.anovaF), // one-way k-sample mean test, decimal moments + chi2-style term sums
    "q_cohens_d"          -> q(Insights.cohensD), // standardized mean difference, one conditional-agg pass
    "q_dup_cluster_hist"  -> q(Dedup.dupClusterHist), // near-dup cluster size histogram over the oracled editdist CC
    "q_assortativity"     -> q(Insights.assortativity), // degree-degree Pearson over edges, d38 moments
    "q_burstiness"        -> q(Insights.burstiness), // Fano factor + Goh-Barabasi B of daily arrivals per type
    "q_new_vs_returning"  -> q(Windows.newVsReturning), // daily acquisition/retention split, windowless
    "q_gopher_rules"      -> q(Text.gopherRules), // published composite quality filter with per-rule flags
    "q_heaps_law"         -> q(Text.heapsLaw), // vocabulary growth curve via distributed prefix sum
    // round-8c additions (Kimball fact-grain completions + stats/graph/corpus)
    "q_scd3"              -> q(Warehouse.scd3CurrentPrior), // current+prior attribute per key, one window + one agg
    "q_periodic_snapshot" -> q(Warehouse.periodicSnapshot), // dense monthly balance per supplier, in-plan calendar spine
    "q_accumulating_snapshot" -> q(Warehouse.accumulatingSnapshot), // order milestone fact with lag measures
    "q_welch_t"           -> q(Insights.welchT), // unequal-variance two-sample t + Satterthwaite df, one conditional agg
    "q_theil_sen"         -> q(Insights.theilSen), // robust trend slope: exact lower-median of calendar-bounded pair slopes
    "q_adamic_adar"       -> q(Insights.adamicAdar(_, _, 2)), // common-neighbor link prediction, wedge-bounded candidates
    "q_js_divergence"     -> q(Text.jsDivergence), // per-source lexical drift vs the corpus blend, vocab-bounded grid
    "q_zipf_slope"        -> q(Text.zipfSlope), // rank-frequency OLS slope via distributed ranks, 1-row output
    // round-8d additions (communities, decomposition, lifecycle, weighted selection)
    "q_label_prop"        -> q(Insights.labelProp(_, _, 5, 3)), // synchronous LPA communities, bounded supersteps, all-integer
    "q_seasonal_decompose"-> q(Insights.seasonalDecompose), // additive trend/seasonal/residual split, calendar-bounded windows
    "q_churn"             -> q(Windows.churnMonthly), // monthly active/churned/rate, windowless shifted self-join
    "q_weighted_median"   -> q(Insights.weightedMedian), // exact weight-mass selection via offset prefix sums
    "q_tokenizer_fertility" -> q(Text.tokenizerFertility), // bytes/token + tokens/word per lang, one agg pass
    // round-8e additions (paths, survival, cohort economics)
    "q_event_trigrams"    -> q(Windows.eventTrigrams), // three-step journey counts, one window exchange for both leads
    "q_survival_km"       -> q(Insights.survivalKm(_, _, 90)), // Kaplan-Meier with honest censoring, duration-grain prefix sums
    "q_cohort_ltv"        -> q(Insights.cohortLtv), // cohort x month-age cumulative revenue per head
    // round-8f additions (bands, risk, strength, metadata QA, scale percentiles)
    "q_bollinger"         -> q(Insights.bollingerBands(_, _, 20, 2.0)), // rolling mean +/- 2 sigma envelope, dual decimal moments
    "q_drawdown"          -> q(Insights.drawdown), // running-peak dip series, decimal cummax
    "q_seasonal_strength" -> q(Insights.seasonalStrength), // Hyndman F_seasonal/F_trend over the decompose components
    "q_langid_confusion"  -> q(Text.langIdConfusion), // declared-vs-predicted language matrix with per-lang shares
    "q_percentile_cont"   -> q(Relational.percentileContDistributed), // interpolated percentiles via value-grain prefix ranges
    // round-8g additions (conversion latency, topic drift, multi-touch credit)
    "q_funnel_time"       -> q(Windows.funnelTime), // signup->purchase lag quartiles + conversion rate, user-grain state
    "q_emerging_terms"    -> q(Text.emergingTerms(_, _, 50)), // steepest early->late frequency growth, smoothed ratio top-k
    "q_attribution_decay" -> q(Insights.attributionTimeDecay(_, _, 7)), // exp-decay multi-touch credit, share-normalized per conversion
    // round-8h additions (level shifts, inventory matrix, elasticity, stream disorder)
    "q_changepoint"       -> q(Insights.changepoint), // binary-segmentation mean-shift split via one prefix-sum pass
    "q_abc_xyz"           -> q(Insights.abcXyz), // revenue importance x demand variability 9-cell matrix
    "q_price_elasticity"  -> q(Insights.priceElasticity), // ln-ln OLS slope per brand, decimal term sums
    "q_disorder_rate"     -> q(Windows.disorderRate), // arrival-order time inversions + lateness percentiles
    // round-8i additions (dup concentration, cadence, filter economics, vocab sizing)
    "q_dup_by_source"     -> q(Dedup.dupBySource), // per-source near-dup drop rates over the oracled CC
    "q_interpurchase"     -> q(Windows.interPurchase), // purchase-cadence gap stats per segment
    "q_filter_budget"     -> q(Text.filterBudget), // per-rule doc/token cost of the Gopher filter
    "q_vocab_coverage"    -> q(Text.vocabCoverage(_, _, Seq(5, 10, 20, 50))), // top-k token coverage curve
    // round-8j additions (uncertainty-aware rates, SLAs, profiling, threshold curves)
    "q_return_rate_ci"    -> q(Insights.returnRateCi), // Wilson 95% interval per brand, mirrored double chain
    "q_leadtime_percentiles" -> q(Insights.leadtimePercentiles), // order->ship lag p50/p90/max per nation
    "q_basket_size_hist"  -> q(Relational.basketSizeHist), // order line-count histogram, fan-out sizing input
    "q_dedup_threshold_curve" -> q(Text.dedupThresholdCurve(_, _, Seq(50, 60, 70, 80, 90))), // exact-Jaccard pairs per threshold
    // round-8k additions (seasonal trend test, extreme-value test, long memory)
    "q_seasonal_mk"       -> q(Insights.seasonalMk), // Hirsch-Slack seasonal MK: per-season S + total z, calendar-bounded pairs
    "q_grubbs"            -> q(Insights.grubbs), // max-deviation outlier statistic with the day it names
    "q_hurst"             -> q(Insights.hurstExponent(_, _, Seq(8, 16, 32, 64))), // R/S long-memory exponent from 4-point log-log fit
    // round-8l additions (k-sample ranks, normality, randomness, variance homogeneity)
    "q_kruskal_wallis"    -> q(Insights.kruskalWallis), // k-sample rank test via the value-histogram rank machinery
    "q_jarque_bera"       -> q(Insights.jarqueBera), // anchored-deviation moment normality test on daily revenue
    "q_runs_test"         -> q(Insights.runsTest), // above/below-median run clustering with exact null moments
    "q_levene"            -> q(Insights.leveneBrownForsythe), // Brown-Forsythe spread homogeneity on the quantity histogram
    // round-8m additions (interval algebra + directed-graph mutuality)
    "q_concurrent_sessions" -> q(Windows.concurrentSessions), // per-day peak live-session count via the +-1 boundary sweep
    "q_interval_coverage" -> q(Windows.intervalCoverage), // per-user union length of overlapping activity intervals
    "q_reciprocity"       -> q(Insights.reciprocity), // directed co-purchase mutuality, count- and flow-weighted
    // round-8n additions (information-theory tier)
    "q_mutual_info"       -> q(Insights.mutualInfo), // lang-source MI + NMI in nats via exact c-ln-c entropy sums
    "q_entropy_rate"      -> q(Text.entropyRate), // bigram conditional entropy H(w2|w1) of the token stream
    "q_theil_index"       -> q(Insights.theilIndex), // decomposable entropy inequality (T and L) over customer revenue
    // round-8o additions (stationarity, tail risk, blocked ranks)
    "q_adf"               -> q(Insights.adfTest), // Dickey-Fuller unit-root gamma + t-stat, anchored OLS moments
    "q_var_es"            -> q(Insights.varEs), // historical VaR + expected shortfall of daily log-returns
    "q_friedman"          -> q(Insights.friedman), // blocked rank test: month blocks x priority treatments
    // round-9 additions (judge worklist: span dedup, BPE loop, run report)
    "q_etl_run_report"    -> q(graft.pipeline.CorpusPrep.runReport), // per-stage yield table of the curation chain, one lazy plan
    // round-9c additions (Kimball completions: hybrid SCD, audit dimension)
    "q_scd6"              -> q(Warehouse.scd6Hybrid), // type 1+2+3 hybrid: versions + current overwrite + prior column
    "q_audit_dim"         -> q(Warehouse.auditDim), // per-load-batch audit row: counts, key range, money total, portable checksum
    // round-9d additions (time-series + paired-test tier)
    "q_pacf"              -> q(Insights.pacf), // Durbin-Levinson partial autocorrelation lags 1-3, exact ACF moments
    "q_cross_corr"        -> q(Insights.crossCorr), // lead-lag Pearson cross-correlation revenue vs shipped quantity
    "q_mcnemar"           -> q(Insights.mcnemar), // paired binary McNemar test, continuity-corrected, discordant cells
    "q_readability"       -> q(Text.readability), // Flesch reading ease with vowel-run syllable proxy
    // round-9e additions (embedding geometry)
    "q_embed_pca_power"   -> q(Similarity.embedPcaPower), // top principal component via exact fixed-point power iteration
    "q_embed_outliers"    -> q(Similarity.embedOutliers(_, _, 20)), // exact centroid-distance outlier screen, n-multiplied centering
    // round-9f additions (growth, experimentation, causal tier)
    "q_growth_accounting" -> q(Insights.growthAccounting), // monthly new/retained/resurrected/churned MAU ledger
    "q_cochran_q"         -> q(Insights.cochranQ), // k=3 correlated binary treatments, exact integer totals
    "q_partial_corr"      -> q(Insights.partialCorr), // revenue~quantity controlling discount, one wide moment agg
    "q_did"               -> q(Insights.did), // difference-in-differences: BUILDING segment x 1998 cutoff
    "q_srm"               -> q(Insights.srmCheck), // sample-ratio mismatch: observed vs designed 80/10/10 split
    // round-9g additions (survival + regression-diagnostics tier)
    "q_logrank"           -> q(Insights.logrank(_, _, 90)), // two-group log-rank survival test, DECIMAL-accumulated e1/v terms
    "q_nelson_aalen"      -> q(Insights.nelsonAalen(_, _, 90)), // cumulative hazard + Fleming-Harrington survival, same KM grain
    "q_durbin_watson"     -> q(Insights.durbinWatson), // DW first-order residual autocorrelation on the daily-revenue OLS
    "q_ljung_box"         -> q(Insights.ljungBox(_, _, 5)), // portmanteau white-noise test, exact integer ACF, lags 1-5
    "q_ols_multi"         -> q(Insights.olsMulti), // two-predictor OLS via exact-moment normal equations + R2
    "q_bh_fdr"            -> q(Insights.bhFdr(_, _, 500)), // Benjamini-Hochberg step-up over per-brand z-tests, A&S erfc p-values
    // round-9h additions (LLM corpus-operations tier)
    "q_par_dedup"         -> q(Text.parDedup(_, _, 20)), // CCNet paragraph-level dedup with in-order reassembly, digest-grain shuffle
    "q_boilerplate"       -> q(Text.boilerplateReport(_, _, 20)), // per-source within-site repeated-paragraph profile
    "q_token_budget_mix"  -> q(Text.tokenBudgetMix(_, _, 50000L)), // greedy utility-ranked waterfill of a token budget over sources
    "q_cos_sim_hist"      -> q(Similarity.cosSimHist(_, _, Seq(1, 17, 257))), // stride-paired cosine calibration histogram
    // round-9i additions (temporal warehouse + distribution tests)
    "q_scd2_timeline_join" -> q(Warehouse.scd2TimelineJoin), // interval-intersection alignment of two SCD2 attribute timelines
    "q_agg_rewrite"       -> q(Warehouse.aggRewrite), // yearly rollup answered FROM the monthly aggregate; oracle hits base facts
    "q_moods_median"      -> q(Insights.moodsMedian), // two-group median test, PrefixSum exact median, integer 2x2 chi2
    "q_bartlett"          -> q(Insights.bartlett), // k-group variance homogeneity, DECIMAL-accumulated ln terms
    "q_kpss"              -> q(Insights.kpss), // KPSS level-stationarity, integer partial sums, lag-0 lrv
    "q_granger"           -> q(Insights.granger), // lag-1 Granger F-test from one wide exact-moment aggregate
    // round-9j additions (graph structure + forecasting + agreement)
    "q_modularity"        -> q(Insights.modularity(_, _, 2, 3)), // Newman-Girvan Q of a 3-round LPA partition on the part graph
    "q_rich_club"         -> q(Insights.richClub(_, _, Seq(50, 75, 90, 95))), // hub-subgraph density at exact degree quantiles
    "q_forecast_acc"      -> q(Insights.forecastAcc), // seasonal-naive baseline: MAE/MAPE/sMAPE/MASE, decimal-safe rationals
    "q_ar2_yw"            -> q(Insights.ar2Yw), // Yule-Walker AR(2) fit from the exact ACF + innovation variance ratio
    "q_gtest"             -> q(Insights.gtest), // likelihood-ratio G-test on priority x status, decimal ln terms
    "q_cohens_kappa"      -> q(Text.cohensKappa), // chance-corrected lang-id vs gold agreement from four exact cells
    // round-9k additions (retrieval eval, leakage, sampling, power)
    "q_split_leakage"     -> q(Text.splitLeakage(_, _, 20)), // cross-split paragraph contamination audit, digest joins only
    "q_ndcg"              -> q(Text.ndcgAt(_, _, 20)), // nDCG/P/R@20 of the BM25 ranking vs contains-all-terms truth
    "q_distinctive_terms" -> q(Text.distinctiveTerms(_, _, 3)), // per-source term lift top-3 (c-TF-IDF degenerates here, documented)
    "q_ks_normal"         -> q(Insights.ksNormal), // one-sample KS vs fitted normal, PrefixSum CDF + A&S erfc Phi
    "q_power_analysis"    -> q(Insights.powerAnalysis), // two-proportion A/B sample-size calculator from exact event counts
    "q_uniform_sample_k"  -> q(Insights.uniformSampleK(_, _, 100)), // reproducible hash-ranked k-sample, TakeOrdered plan
    // round-9l additions (embedding health, calibration, migration, activity, collocations)
    "q_emb_dim_var"       -> q(Similarity.embedDimVar), // per-dimension mean/variance/share: dead-dim and dominance report
    "q_calibration_bins"  -> q(Text.calibrationBins), // decile reliability table for the lang-id evidence score
    "q_llr_collocations"  -> q(Text.llrCollocations(_, _, 20)), // Dunning log-likelihood-ratio bigrams, 2x2 G per pair
    "q_customer_migration" -> q(Insights.customerMigration), // Kimball class-migration matrix, consecutive active months
    "q_hourly_profile"    -> q(Insights.hourlyProfile), // hour x dow heatmap with chi2 independence residuals
    // round-9m additions (scalable resampling, ordered alternatives, snapshot audit)
    "q_poisson_bootstrap" -> q(Insights.poissonBootstrap(_, _, 100)), // hash-deterministic Poisson bootstrap CI, one fan-out + hash-agg. b=100 is PINNED to the oracle (its generate_series/ceil-rank literals are 100); change both together
    "q_page_trend"        -> q(Insights.pageTrend), // Page's L for ordered alternatives, complete year blocks, exact ranks
    "q_snapshot_reconcile" -> q(Warehouse.snapshotReconcile(_, _, 1704844800000000L, 1705276800000000L)), // SCD2 as-of t1 vs t2 audit
    // round-9n additions (regression diagnostics + robust statistics)
    "q_cooks_distance"    -> q(Insights.cooksDistance(_, _, 10)), // top-10 influential days, closed-form leverage, no refits
    "q_prediction_interval" -> q(Insights.predictionInterval), // one-step-ahead OLS forecast with honest interval
    "q_trimmed_mean"      -> q(Insights.trimmedMean), // exact 5% two-sided trim per group via PrefixSum rank clamping
    "q_cliffs_delta"      -> q(Insights.cliffsDelta), // ordinal effect size from the mannwhitney doubled-rank machinery
    // round-9o additions (ML feature engineering + relationship profiling)
    "q_pit_features"      -> q(Insights.pitFeatures), // leakage-free point-in-time features: strictly-prior expanding window
    "q_target_encoding"   -> q(Insights.targetEncodingLoo), // leave-one-out categorical target encoding, agg + join-back
    "q_fk_cardinality"    -> q(Relational.fkCardinality), // per-edge children-per-parent profile + childless counts
    // round-9p additions (attribution game theory, survey weighting, concentration)
    "q_shapley_attribution" -> q(Insights.shapleyAttribution), // exact Shapley credit over the 16-coalition exposure lattice
    "q_raking_ipf"        -> q(Insights.rakingIpf(_, _, 3)), // iterative proportional fitting to uniform margins, 3 unrolled rounds
    "q_lorenz_points"     -> q(Insights.lorenzPoints), // decile Lorenz curve via PrefixSum, exact revenue shares
    // round-9b additions (directed-graph ranking tier)
    "q_hits"              -> q(Insights.hits), // HITS hubs/authorities, 3 normalized rounds, Long fixed-point, unrolled oracle
    "q_link_pred_jaccard" -> q(Insights.linkPredJaccard(_, _, 2, 50)), // neighbor-set Jaccard link prediction for non-adjacent pairs
    // round-8p additions (Kimball dimensional completions)
    "q_scd4_minidim"      -> q(Warehouse.scd4MiniDim), // rapidly-changing attrs split to a bounded mini-dimension
    "q_factless_coverage" -> q(Warehouse.factlessCoverage), // eligibility spine vs activity: the what-didn't-happen fact
    "q_junk_dim"          -> q(Warehouse.junkDim), // low-cardinality flags + fact-derived flag as one junk dimension
    // round-10a additions (robust model fitting)
    "q_ransac_line"       -> q(Insights.ransacLine(_, _, 32)), // hash-deterministic RANSAC on the daily count-vs-revenue scatter, 32 candidates
    "q_esd_outliers"      -> q(Insights.esdOutliers), // generalized ESD, 3 unrolled re-fitting rounds on daily revenue
    "q_tukey_hsd"         -> q(Insights.tukeyHsd), // Tukey-Kramer post-hoc pairwise q statistics over market segments
    "q_des_forecast"      -> q(Insights.desForecast), // Brown's double exponential smoothing, 5-tap integer kernel, level+trend+forecast
    // round-10b additions (spectral + motif series analysis)
    "q_periodogram"       -> q(Insights.periodogram(_, _, 14)), // square-wave (Walsh) periodogram, exact integer correlations
    "q_ts_motif"          -> q(Insights.tsMotif(_, _, 7)), // most similar non-overlapping 7-day window pair, d2 = 2w(1-r) from exact sums
    "q_ts_discord"        -> q(Insights.tsDiscord(_, _, 7)), // window farthest from its nearest neighbor (matrix-profile anomaly)
    "q_bipartite_projection" -> q(Insights.bipartiteProjection(_, _, 30)), // part-part co-purchase graph, cosine-normalized edges
    // round-10c additions (corpus estimation)
    "q_good_turing"       -> q(Text.goodTuring), // Good-Turing unseen mass + Chao1 richness per language over 5-gram types
    "q_capture_recapture" -> q(Text.captureRecapture), // Chapman capture-recapture corpus-size estimate from two md5 samples
    "q_dsir_weights"      -> q(Text.dsirWeights(_, _, 20)), // DSIR importance weights: target-vs-source unigram LM log-ratio, quantized
    // round-10d additions (bitemporal warehouse + windowed funnel)
    "q_bitemporal_asof"   -> q(Warehouse.bitemporalAsOf), // valid-time x transaction-time as-of read at two system times, corrected flag
    "q_window_funnel"     -> q(Windows.windowFunnel(_, _, 7)), // ClickHouse-style windowed funnel depth histogram, 7-day deadline
    // round-10e additions (resampling inference, count models, RAG re-rank, Data Vault)
    "q_permutation_test"  -> q(Insights.permutationTest(_, _, 100)), // hash-deterministic randomization test, two priority contrasts. b=100 PINNED to the oracle literals
    "q_overdispersion"    -> q(Insights.overdispersion), // dispersion index + NB method-of-moments fit per segment, zero-order customers included
    "q_mmr_diversity"     -> q(Similarity.mmrDiversity(_, _, 5, 0.7)), // MMR diversity re-rank of the BM25 top-20, unrolled greedy rounds. k=5, lambda=0.7 PINNED to the oracle
    "q_data_vault"        -> q(Warehouse.dataVault), // Data Vault 2.0 hub/link/satellite load profile with md5 hash keys + hashdiff
    // round-10f additions (embedding-training data ops on the native dot_q kernel)
    "q_hard_negatives"    -> q(Similarity.hardNegatives), // hardest negative + hardest positive + margin per anchor, exact-integer cosine
    "q_knn_label_noise"   -> q(Similarity.knnLabelNoise(_, _, 5)), // kNN majority-vote label-noise screen, per-label noise rates
    // round-10h additions (model-eval metrics over the embedding space)
    "q_auc_roc"           -> q(Similarity.aucRoc), // one-vs-rest centroid-score AUC per class, exact-integer midrank rank-sum
    "q_pr_curve"          -> q(Similarity.prCurve), // precision/recall/F1 at decile cuts of the label-0 centroid score
    // round-10g additions (sequence/pattern analytics — the MATCH_RECOGNIZE family)
    "q_match_vshape"      -> q(Windows.matchVShape(_, _, 30, 3)), // dip>=30% then recovery within 3 days, integer cross-multiplied drop test
    "q_rising_streaks"    -> q(Windows.risingStreaks), // longest strictly-rising monthly streak per segment via gaps-and-islands
    "q_peak_detection"    -> q(Windows.peakDetection(_, _, 3, 20)), // strict local maxima with 20% prominence guard over +-3 weeks
  )

  /** DuckDB-runnable ANSI SQL twin per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        | floor(l_extendedprice * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_quantity, floor(l_extendedprice * 10000.0 + 0.5) / 10000.0""".stripMargin,

    "q_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | l_returnflag, l_linestatus, l_quantity
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, l_linestatus, l_quantity""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_base_price,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_disc_price,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        | floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_inner_equi" ->
      """SELECT p_brand,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_salted_join" ->
      """SELECT p_brand,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full_outer" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_name FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey AS custkey, count(*) AS n_big_orders
        |      FROM orders WHERE o_totalprice > 450000.0 GROUP BY 1)
        |SELECT coalesce(c.custkey, o.custkey) AS custkey, c_name, n_big_orders
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
        |ORDER BY 1""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | o_orderpriority
        |FROM orders
        |ORDER BY floor(o_totalprice * 10000.0 + 0.5) / 10000.0 DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0)
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY c_custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, measure, value
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'qty' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'disc' AS measure, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'tax' AS measure, l_tax AS value FROM lineitem) u
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, measure, value""".stripMargin,

    "q_asof_join" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       s.ts_us AS signup_ts_us, s.event_id AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    // identical oracle on purpose: the hash gate then proves the custom
    // physical operator (AsofJoinExec) ≡ the compositional window form
    "q_asof_join_native" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       s.ts_us AS signup_ts_us, s.event_id AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       CASE WHEN p.ts_us - s.ts_us <= 604800000000 THEN s.ts_us END AS signup_ts_us,
        |       CASE WHEN p.ts_us - s.ts_us <= 604800000000 THEN s.event_id END AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    "q_interval_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(o_orderdate AS DATE) AS o_date,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        |  AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 90
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         o_date, ship_date""".stripMargin,

    "q_range_band_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b,
        | epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1000000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_window_ranks" ->
      """SELECT o_orderkey, o_orderpriority,
        | floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank
        |FROM orders WHERE o_totalprice > 450000.0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q_window_cume" ->
      """SELECT o_orderkey, o_custkey,
        | floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | floor(cume_dist() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_totalprice, o_orderkey)
        |       * 10000.0 + 0.5) / 10000.0 AS cume
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rolling_median" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |           FROM events)
        |SELECT event_id, user_id, ts_us,
        | floor(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |       * 10000.0 + 0.5) / 10000.0 AS med7
        |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_topk_per_group" ->
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem)
        |SELECT l_suppkey, CAST(rk AS BIGINT) AS rk, l_orderkey, l_linenumber,
        | floor(l_extendedprice * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
        |FROM r WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "q_scalar_string_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS upper_name,
        | CAST(length(c_name) AS INT) AS name_len,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cust_code,
        | substr(c_mktsegment, 1, 3) AS seg3,
        | split_part(c_name, '#', 2) AS num_part,
        | replace(c_name, 'Customer', 'Cust') AS short_name,
        | concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | count(*) AS n_rows,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_customers,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_watermark_max" ->
      """SELECT max(CAST(o_orderdate AS DATE)) AS max_date FROM orders
        |WHERE o_custkey = (SELECT c_custkey FROM customer
        |                   WHERE c_name = 'Customer#000000042')""".stripMargin,

    "q_coalesce_default" ->
      """SELECT coalesce(max(CAST(o_orderdate AS DATE)), DATE '2000-01-01') AS since_date
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_name = 'Customer#NOSUCH')""".stripMargin,

    "q_incr_range_filter" ->
      """SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_date,
        | max(CAST(o_orderdate AS DATE)) + 1 AS start_date,
        | DATE '2000-06-01' AS end_date
        |FROM orders GROUP BY o_custkey
        |HAVING max(CAST(o_orderdate AS DATE)) + 1 <= DATE '2000-06-01'
        |ORDER BY o_custkey""".stripMargin,

    "q_scd_insert_new" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey < 100
        |UNION ALL
        |SELECT DISTINCT o_custkey AS c_custkey, NULL AS c_name, NULL AS c_mktsegment
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        |ORDER BY c_custkey""".stripMargin,

    "q_merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS o_totalprice,
        |         CAST(o_orderdate AS DATE) AS o_orderdate
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'),
        |s AS (
        |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
        |         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4)) AS o_totalprice,
        |         CAST(o_orderdate AS DATE) AS o_orderdate
        |  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01')
        |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |       floor(CAST(coalesce(s.o_totalprice, t.o_totalprice) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        |       coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
        |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
        |       coalesce(s.o_orderdate, t.o_orderdate) AS o_orderdate
        |FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        |ORDER BY 1""".stripMargin,

    "q_mark_processed" ->
      """SELECT event_id, user_id, event_type, TRUE AS is_processed
        |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_changes" ->
      """WITH o_old AS (
        |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-06-01'),
        |o_new AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority <> '3-MEDIUM'),
        |d AS (
        |  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |         floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS new_price,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |              WHEN n.o_orderkey IS NULL THEN 'delete'
        |              WHEN o.p <> n.p THEN 'update'
        |              ELSE 'unchanged' END AS change_type
        |  FROM o_new n FULL OUTER JOIN o_old o ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, new_price, change_type FROM d
        |WHERE change_type <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    "q_date_dim_generate" ->
      """SELECT CAST(g AS DATE) AS d,
        | CAST(year(CAST(g AS DATE)) AS INT) AS yr,
        | CAST(quarter(CAST(g AS DATE)) AS INT) AS qtr,
        | CAST(month(CAST(g AS DATE)) AS INT) AS mo,
        | CAST(day(CAST(g AS DATE)) AS INT) AS dom,
        | CAST(isodow(CAST(g AS DATE)) AS INT) AS dow_iso,
        | isodow(CAST(g AS DATE)) >= 6 AS is_weekend
        |FROM generate_series(DATE '2000-01-01', DATE '2002-12-31', INTERVAL 1 DAY) t(g)
        |ORDER BY d""".stripMargin,

    "q_scd2_versions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup')
        |SELECT user_id, event_id, ts_us AS valid_from_us,
        |       lead(ts_us) OVER w AS valid_to_us,
        |       lead(ts_us) OVER w IS NULL AS is_current
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    "q_scd2_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT * FROM v
        |WHERE valid_from_us <= 1705276800000000
        |  AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
        |ORDER BY user_id""".stripMargin,

    "q_late_arriving" ->
      """WITH dim AS (SELECT c_custkey, c_name, c_nationkey FROM customer
        |             WHERE c_custkey % 10 <> 0),
        |inf AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |        WHERE o_custkey NOT IN (SELECT c_custkey FROM dim))
        |SELECT c_custkey, c_name, c_nationkey, 0 AS is_inferred FROM dim
        |UNION ALL
        |SELECT c_custkey, 'UNKNOWN#' || c_custkey AS c_name,
        |       CAST(-1 AS INTEGER) AS c_nationkey, 1 AS is_inferred FROM inf
        |ORDER BY c_custkey""".stripMargin,

    "q_surrogate_key" ->
      """SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS sk
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_gap_fill_locf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
        |           FROM events),
        |daily AS (SELECT user_id, day,
        |            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |          FROM e GROUP BY user_id, day),
        |spine AS (SELECT user_id,
        |            unnest(generate_series(min(day), max(day))) AS day
        |          FROM daily GROUP BY user_id),
        |j AS (SELECT s.user_id, s.day, d.v
        |      FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day,
        | floor((last_value(v IGNORE NULLS) OVER (
        |          PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |       * 10000.0 + 0.5) / 10000.0 AS v_filled,
        | CAST(v IS NULL AS INT) AS is_filled
        |FROM j ORDER BY user_id, day""".stripMargin,

    "q_seasonal_anomaly" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour
        |           FROM events),
        |s AS (SELECT event_type, hour,
        |        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mu,
        |        stddev_samp(value) AS sigma
        |      FROM e GROUP BY event_type, hour)
        |SELECT event_id, e.event_type, e.hour,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value,
        | floor(mu * 10000.0 + 0.5) / 10000.0 AS mu
        |FROM e JOIN s USING (event_type, hour)
        |WHERE sigma IS NOT NULL AND sigma > 0
        |  AND abs(value - mu) > 2.0 * sigma
        |ORDER BY event_id""".stripMargin,

    "q_media_chunk" ->
      """WITH m AS (SELECT doc_id, 1000 + (doc_id * 7919) % 600000 AS duration_ms
        |           FROM documents),
        |c AS (SELECT doc_id, duration_ms,
        |        unnest(generate_series(0, duration_ms - 1, 25000)) AS chunk_start
        |      FROM m)
        |SELECT doc_id, duration_ms, chunk_start // 25000 AS chunk_idx,
        |       chunk_start,
        |       least(chunk_start + 30000, duration_ms) AS chunk_end
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_winsorize" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |edges AS (SELECT event_type,
        |            quantile_cont(value, 0.05) AS p_lo,
        |            quantile_cont(value, 0.95) AS p_hi
        |          FROM e GROUP BY event_type)
        |SELECT event_id, e.event_type,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value,
        | floor((CASE WHEN value < p_lo THEN p_lo
        |             WHEN value > p_hi THEN p_hi
        |             ELSE value END) * 10000.0 + 0.5) / 10000.0 AS value_w
        |FROM e JOIN edges ON e.event_type = edges.event_type
        |ORDER BY event_id""".stripMargin,

    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2 FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |tw AS (SELECT sum(c) AS w_total FROM uni),
        |tb AS (SELECT count(*) AS b_total FROM pairs),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs
        |        GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.c_xy,
        | floor(ln((CAST(b.c_xy AS DOUBLE) * w_total * w_total)
        |          / (CAST(b_total AS DOUBLE) * u1.c * u2.c)) * 10000.0 + 0.5) / 10000.0 AS pmi
        |FROM big b
        |JOIN uni u1 ON b.w1 = u1.word
        |JOIN uni u2 ON b.w2 = u2.word, tw, tb
        |ORDER BY w1, w2""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_percentile_disc" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal, c_custkey) AS rn,
        |         count(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer)
        |SELECT c_nationkey, max(n) AS n,
        | floor(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN c_acctbal END) * 10000.0 + 0.5) / 10000.0 AS p50_disc,
        | floor(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN c_acctbal END) * 10000.0 + 0.5) / 10000.0 AS p90_disc
        |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_incr_agg_merge" ->
      """SELECT o_custkey,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS total_spend,
        | count(*) AS n_orders
        |FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |v0 AS (SELECT e.user_id, t_signup, min(ts_us) AS t_view
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'view' AND ts_us > t_signup
        |       GROUP BY e.user_id, t_signup),
        |p0 AS (SELECT e.user_id, t_signup, t_view, min(ts_us) AS t_purchase
        |       FROM e JOIN v0 ON e.user_id = v0.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t_view
        |       GROUP BY e.user_id, t_signup, t_view)
        |SELECT user_id, t_signup, t_view, t_purchase FROM p0
        |ORDER BY user_id""".stripMargin,

    "q_retention" ->
      """WITH ue AS (
        |  SELECT DISTINCT user_id,
        |    year(make_timestamp(epoch_us(ts))) * 12 + month(make_timestamp(epoch_us(ts))) AS ym
        |  FROM events),
        |c AS (SELECT user_id, min(ym) AS cohort_ym FROM ue GROUP BY user_id)
        |SELECT cohort_ym, ym - cohort_ym AS month_offset,
        | count(DISTINCT ue.user_id) AS n_users
        |FROM ue JOIN c ON ue.user_id = c.user_id
        |GROUP BY cohort_ym, ym - cohort_ym
        |ORDER BY cohort_ym, month_offset""".stripMargin,

    "q_dedup_rownum" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value
        |FROM e WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_impute_avg" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
        |         CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS mo,
        |         CASE WHEN l_linenumber <> 3 THEN l_quantity END AS m1,
        |         CASE WHEN l_linenumber <> 4 THEN l_discount END AS m2
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, mo,
        |         CAST(sum(CAST(m1 AS DECIMAL(18,2))) AS DOUBLE) / count(m1) AS a1,
        |         CAST(sum(CAST(m2 AS DECIMAL(18,2))) AS DOUBLE) / count(m2) AS a2
        |  FROM li GROUP BY l_returnflag, mo)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, mo,
        | floor((CASE WHEN m1 IS NULL OR m2 IS NULL THEN a1 ELSE m1 END) * 10000.0 + 0.5) / 10000.0 AS m1_filled,
        | floor((CASE WHEN m1 IS NULL OR m2 IS NULL THEN a2 ELSE m2 END) * 10000.0 + 0.5) / 10000.0 AS m2_filled
        |FROM li JOIN g USING (l_returnflag, mo)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, mo, m1_filled, m2_filled""".stripMargin,

    "q_outlier_zscore" ->
      """WITH s AS (SELECT event_type,
        |                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mu,
        |                  stddev_samp(value) AS sigma
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        | floor((CASE WHEN s.sigma IS NULL OR s.sigma = 0
        |                  OR abs(e.value - s.mu) / s.sigma <= 3
        |             THEN e.value ELSE s.mu END) * 10000.0 + 0.5) / 10000.0 AS value_capped
        |FROM events e JOIN s USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_dq_profile" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS column_name, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT column_name, count(*) AS n_rows,
        | count(*) - count(v) AS n_nulls,
        | floor(min(v) * 10000.0 + 0.5) / 10000.0 AS min_v,
        | floor(max(v) * 10000.0 + 0.5) / 10000.0 AS max_v,
        | count(DISTINCT v) AS n_distinct
        |FROM u GROUP BY column_name ORDER BY column_name""".stripMargin,

    "q_dq_rules" ->
      """WITH nr AS (SELECT count(*) AS n_rows FROM orders),
        |rep AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL SELECT 'not_null(o_orderdate)',
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'in_range(o_totalprice)',
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |                   AND (o_totalprice < 0.0 OR o_totalprice > 1000000.0)
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'in_set(o_orderstatus)',
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |                   AND o_orderstatus NOT IN ('F', 'O', 'P')
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'matches_regex(o_orderpriority)',
        |    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |                   AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'date_in_epoch',
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'ref_integrity(o_custkey)',
        |    CAST((SELECT count(*) FROM orders o
        |          LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |          WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT)
        |  UNION ALL SELECT 'k_anonymity(o_orderstatus,o_orderpriority,2)',
        |    CAST(coalesce((SELECT sum(n) FROM (
        |            SELECT count(*) AS n FROM orders
        |            GROUP BY o_orderstatus, o_orderpriority) g
        |          WHERE n < 2), 0) AS BIGINT))
        |SELECT rule, n_violations, (SELECT n_rows FROM nr) AS n_rows,
        |       n_violations = 0 AS pass
        |FROM rep ORDER BY rule""".stripMargin,

    "q_group_concat" ->
      """WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |SELECT o_orderpriority,
        | string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_mode_agg" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |                ORDER BY n DESC, o_orderstatus ASC) AS rn FROM c)
        |SELECT o_orderpriority, o_orderstatus AS mode_status, n AS n_mode
        |FROM r WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,

    "q_quantiles_exact" ->
      """SELECT o_orderpriority, count(*) AS n,
        | floor(quantile_cont(o_totalprice, 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
        | floor(quantile_cont(o_totalprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        | floor(quantile_cont(o_totalprice, 0.75) * 10000.0 + 0.5) / 10000.0 AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(9, floor(l_extendedprice / 11000.0)) AS INT) AS bucket,
        | count(*) AS n_rows,
        | floor(min(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS min_price,
        | floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_corr_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | floor((n * sxy - sx * sy) /
        |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS corr_disc_qty
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_regr_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000.0 + 0.5) / 10000.0 AS slope,
        | floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |       ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 10000.0 + 0.5) / 10000.0 AS r2
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_percent_total" ->
      """WITH cell AS (
        |  SELECT l_returnflag, l_linestatus,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_d
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |tot AS (SELECT l_returnflag, sum(rev_d) AS tot_d
        |        FROM cell GROUP BY l_returnflag)
        |SELECT cell.l_returnflag, cell.l_linestatus,
        | floor(CAST(rev_d AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_d AS DOUBLE) / CAST(tot_d AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cell JOIN tot ON cell.l_returnflag = tot.l_returnflag
        |ORDER BY cell.l_returnflag, cell.l_linestatus""".stripMargin,

    "q_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |                   AS INTEGER) AS grp
        |      FROM d)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |       count(*) AS n_days
        |FROM g GROUP BY user_id, grp ORDER BY user_id, start_day""".stripMargin,

    "q_update_conditional" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
        | CASE WHEN l_returnflag = 'R' AND l_quantity > 30
        |      THEN CAST(30.0 AS DOUBLE) ELSE l_quantity END AS qty_capped
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, qty_capped""".stripMargin,

    "q_arrays_zip_explode" ->
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        | floor(CAST(v AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS v
        |FROM (SELECT vec_id, unnest(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings WHERE vec_id < 8) u
        |ORDER BY vec_id, pos""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
        |ORDER BY event_id""".stripMargin,

    "q_json_staging" ->
      """WITH staged AS (
        |  SELECT event_id,
        |         '{"meta":' || props || ',"ids":[' || event_id || ',' || user_id || ']}' AS payload
        |  FROM events)
        |SELECT event_id,
        | CAST(json_extract_string(payload, '$.meta.k') AS INT) AS k,
        | CAST(json_extract_string(payload, '$.ids[1]') AS BIGINT) AS second_id,
        | CAST(json_array_length(payload, '$.ids') AS BIGINT) AS n_ids
        |FROM staged
        |WHERE CAST(json_extract_string(payload, '$.meta.k') AS INT) >= 10
        |  AND CAST(json_extract_string(payload, '$.meta.k') AS INT) < 90
        |ORDER BY event_id""".stripMargin,

    "q_scalar_date_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        | CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
        | CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mo,
        | CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS dow_iso,
        | CASE WHEN month(CAST(o_orderdate AS DATE)) IN (12,1,2) THEN 'winter'
        |      WHEN month(CAST(o_orderdate AS DATE)) IN (3,4,5) THEN 'spring'
        |      WHEN month(CAST(o_orderdate AS DATE)) IN (6,7,8) THEN 'summer'
        |      ELSE 'autumn' END AS season
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_scalar_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS net_price,
        | floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0 + 0.5) / 10000.0 AS charged,
        | floor(abs(l_discount - l_tax) * 10000.0 + 0.5) / 10000.0 AS abs_disc_tax_gap,
        | floor((CASE WHEN l_quantity <> 0.0 THEN l_extendedprice / l_quantity END) * 10000.0 + 0.5) / 10000.0 AS unit_price,
        | CASE WHEN l_discount >= 0.05 THEN 'high' ELSE 'low' END AS disc_band
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         net_price, charged, abs_disc_tax_gap, unit_price, disc_band""".stripMargin,

    "q_null_semantics" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CASE WHEN l_linenumber <> 3 THEN l_quantity END AS m,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) IS NOT DISTINCT FROM NULL AS nseq_null,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) IS NOT DISTINCT FROM 30.0 AS nseq_30,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) = 30.0 AS eq_30,
        | nullif(l_quantity, 30.0) AS qty_nullif_30,
        | coalesce(CASE WHEN l_linenumber <> 3 THEN l_quantity END, -1.0) AS m_defaulted
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, m NULLS FIRST""".stripMargin,

    "q_window_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | count(*) OVER w AS n_last_30m,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_last_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_window_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        | count(*) AS n_events,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_session_gaps" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |                     ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_window_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |       / count(*) OVER w * 10000.0 + 0.5) / 10000.0 AS mavg4
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_window_values" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | lag(event_type, 1) OVER w AS prev_type,
        | floor(lag(value, 1) OVER w * 10000.0 + 0.5) / 10000.0 AS prev_value,
        | first_value(event_id) OVER wg AS first_event,
        | nth_value(event_id, 3) OVER wg AS third_event,
        | last_value(event_id) OVER wf AS last_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |       wg AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars,
        | floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_words
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_start,
        |       tok_start // 2048 AS seq_id,
        |       tok_start % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_corpus_mix" ->
      """WITH rates(lang, rate_m) AS (
        |  VALUES ('en', 500), ('fr', 800), ('es', 900), ('de', 1000), ('zh', 1000))
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE (d.doc_id * 48271 + 11) % 1000 < r.rate_m
        |ORDER BY d.doc_id""".stripMargin,

    "q_embed_norm" ->
      """SELECT vec_id,
        | floor(sqrt(list_aggregate(
        |   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |   'sum')) * 10000.0 + 0.5) / 10000.0 AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents)
        |SELECT doc_id, n_chars,
        | floor(alpha / n * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
        | floor((n - spaces) / (spaces + 1.0) * 10000.0 + 0.5) / 10000.0 AS avg_word_len,
        | CAST(stops AS BIGINT) AS stopword_hits,
        | floor((0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |        + 0.2 * least(1.0, stops / 10.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST((length(text) - length(replace(text, 'th', ''))) // 2 AS BIGINT) AS th_bigrams,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS BIGINT) AS en_stopwords,
        |    CAST(length(text) AS DOUBLE) AS n
        |  FROM documents)
        |SELECT doc_id, lang, th_bigrams, en_stopwords,
        | floor(CAST(th_bigrams + en_stopwords AS DOUBLE) * 100.0 / n * 10000.0 + 0.5) / 10000.0 AS evidence_per_100,
        | CASE WHEN CAST(th_bigrams + en_stopwords AS DOUBLE) * 100.0 / n >= 3.0
        |      THEN 'en' ELSE 'other' END AS lang_pred
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        | substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 8) AS fp_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """SELECT doc_id, lang, doc_id % 10 AS bucket,
        | CASE WHEN doc_id % 10 < 8 THEN 'train'
        |      WHEN doc_id % 10 = 8 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_incr_dedup" ->
      """WITH f AS (SELECT doc_id, doc_id % 5 AS m,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        | FROM documents)
        |SELECT b.doc_id, b.fingerprint FROM f b
        |WHERE b.m = 4 AND NOT EXISTS
        |  (SELECT 1 FROM f s WHERE s.m <> 4 AND s.fingerprint = b.fingerprint)
        |ORDER BY b.doc_id""".stripMargin,

    "q_etl_run_report" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS dg
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, dg,
        |         ((n_words >= 20 AND n_words <= 1000)
        |          AND (CAST(length(text) - (n_words - 1) AS DOUBLE)
        |               / CAST(n_words AS DOUBLE) >= 3.0
        |               AND CAST(length(text) - (n_words - 1) AS DOUBLE)
        |                   / CAST(n_words AS DOUBLE) <= 10.0)
        |          AND (n_alpha * 5 >= n_words * 4) AND (n_stops >= 2)) AS g,
        |         (doc_id % 10 < 8) AS tr
        |  FROM d),
        |cn AS (SELECT dg, min(doc_id) AS mn FROM f WHERE g GROUP BY dg),
        |fl AS (SELECT f.g, (f.g AND f.doc_id = cn.mn) AS c, f.tr
        |       FROM f LEFT JOIN cn USING (dg)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN c AND tr THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |      FROM fl),
        |s AS (
        |  SELECT 1 AS stage_id, 'ingest' AS stage, n0 AS rows_in, n0 AS rows_out FROM a
        |  UNION ALL SELECT 2, 'gopher_quality', n0, n1 FROM a
        |  UNION ALL SELECT 3, 'exact_dedup', n1, n2 FROM a
        |  UNION ALL SELECT 4, 'train_split', n2, n3 FROM a)
        |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, rows_in, rows_out,
        |       rows_in - rows_out AS rows_dropped,
        |       floor(CAST(rows_in - rows_out AS DOUBLE) / CAST(rows_in AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS drop_pct
        |FROM s ORDER BY stage_id""".stripMargin,

    "q_doc_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_key,
        | min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,

    "q_doc_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, w, n,
        |        unnest(generate_series(0, n - 1, 80)) AS start
        |      FROM d)
        |SELECT doc_id, start // 80 AS chunk_id,
        | array_to_string(w[start + 1 : start + 100], ' ') AS chunk_text,
        | CAST(least(100, n - start) AS BIGINT) AS n_words
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_vocab_topk" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
        | regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                '[0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' '))) AS s
        |       FROM d),
        |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0),
        |sz AS (SELECT doc_id, len(s) AS nsh FROM sh),
        |ov AS (SELECT e.doc_id, count(*) AS overlap FROM e JOIN bench USING (g) GROUP BY 1)
        |SELECT sz.doc_id, CAST(nsh AS BIGINT) AS n_shingles,
        | CAST(coalesce(overlap, 0) AS BIGINT) AS overlap,
        | floor(CAST(coalesce(overlap, 0) AS DOUBLE) / CAST(nsh AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS overlap_ratio,
        | CAST(coalesce(overlap, 0) AS DOUBLE) >= 0.5 * CAST(nsh AS DOUBLE) AS is_contaminated
        |FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
        |WHERE nsh > 0
        |ORDER BY sz.doc_id""".stripMargin,

    "q_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, len(w) AS n_words,
        |        len(list_distinct(list_transform(range(1, len(w) - 1),
        |             i -> array_to_string(w[i:i+2], ' ')))) AS n_distinct_sh
        |      FROM d)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        | CAST(n_distinct_sh AS BIGINT) AS n_distinct_sh,
        | floor((1.0 - CAST(n_distinct_sh AS DOUBLE) / CAST(n_words - 2 AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS repetition_ratio
        |FROM s WHERE n_words >= 3 ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln(CAST((doc_id * 2654435761) % 1000003 + 1 AS DOUBLE) / 1000004.0)
        |      / CAST(n_chars AS DOUBLE) AS skey
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_chars,
        |        CAST(row_number() OVER (PARTITION BY lang
        |             ORDER BY skey DESC, doc_id ASC) AS BIGINT) AS rn
        |      FROM s)
        |SELECT lang, doc_id, n_chars, rn FROM r WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, n_chars // 200 AS blk, string_split(text, ' ') AS w
        |           FROM documents WHERE lang = 'fr'),
        |sarr AS (SELECT doc_id, blk,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, blk, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.blk = b.blk AND a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh + zb.nsh - c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin,

    "q_embed_cosine_topk" ->
      """WITH p AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS pv,
        |                  generate_subscripts(embedding, 1) AS i
        |           FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS cv,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings),
        |d AS (SELECT c.vec_id, sum(c.cv * p.pv) AS dp,
        |             sqrt(sum(c.cv * c.cv)) AS cn, sqrt(sum(p.pv * p.pv)) AS pn
        |      FROM c JOIN p USING (i) GROUP BY c.vec_id)
        |SELECT vec_id, floor(dp / (cn * pn) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |FROM d WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_batch" ->
      """WITH p AS (SELECT vec_id AS probe_id, CAST(unnest(embedding) AS DOUBLE) AS pv,
        |                  generate_subscripts(embedding, 1) AS i
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS cv,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings),
        |d AS (SELECT p.probe_id, c.vec_id, sum(c.cv * p.pv) AS dp,
        |             sqrt(sum(c.cv * c.cv)) AS cn, sqrt(sum(p.pv * p.pv)) AS pn
        |      FROM c JOIN p ON c.i = p.i AND c.vec_id <> p.probe_id
        |      GROUP BY p.probe_id, c.vec_id),
        |r AS (SELECT probe_id, vec_id,
        |             floor(dp / (cn * pn) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |      FROM d),
        |k AS (SELECT probe_id, vec_id, cos_sim,
        |             row_number() OVER (PARTITION BY probe_id
        |                                ORDER BY cos_sim DESC, vec_id) AS rk
        |      FROM r)
        |SELECT probe_id, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk
        |FROM k WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    "q_knn_classify" ->
      """WITH p AS (SELECT vec_id AS probe_id, CAST(unnest(embedding) AS DOUBLE) AS pv,
        |                  generate_subscripts(embedding, 1) AS i
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS cv,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings),
        |d AS (SELECT p.probe_id, c.vec_id, sum(c.cv * p.pv) AS dp,
        |             sqrt(sum(c.cv * c.cv)) AS cn, sqrt(sum(p.pv * p.pv)) AS pn
        |      FROM c JOIN p ON c.i = p.i AND c.vec_id <> p.probe_id
        |      GROUP BY p.probe_id, c.vec_id),
        |r AS (SELECT probe_id, vec_id,
        |             floor(dp / (cn * pn) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |      FROM d),
        |k AS (SELECT probe_id, vec_id,
        |             row_number() OVER (PARTITION BY probe_id
        |                                ORDER BY cos_sim DESC, vec_id) AS rk
        |      FROM r),
        |v AS (SELECT k.probe_id, e.label, count(*) AS votes
        |      FROM k JOIN embeddings e ON k.vec_id = e.vec_id
        |      WHERE k.rk <= 5 GROUP BY k.probe_id, e.label),
        |best AS (SELECT probe_id, label AS predicted, votes,
        |                row_number() OVER (PARTITION BY probe_id
        |                                   ORDER BY votes DESC, label) AS rn
        |         FROM v)
        |SELECT b.probe_id, b.predicted, CAST(b.votes AS BIGINT) AS votes,
        |       e.label AS true_label
        |FROM best b JOIN embeddings e ON b.probe_id = e.vec_id
        |WHERE b.rn = 1 ORDER BY b.probe_id""".stripMargin,

    "q_frame_sample" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 30 AS n_frames FROM documents),
        |f AS (SELECT doc_id, n_frames,
        |        unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
        |      FROM m)
        |SELECT doc_id, n_frames, frame_idx,
        | floor(CAST((doc_id * 31 + frame_idx * 7) % 256 AS DOUBLE) / 255.0 * 10000.0 + 0.5) / 10000.0 AS luma_stub
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q_media_resize" ->
      """WITH m AS (SELECT doc_id,
        |             64 + (doc_id * 2654435761) % 512 AS width,
        |             64 + (doc_id * 40503) % 512 AS height
        |           FROM documents)
        |SELECT doc_id, width, height,
        | CAST(greatest(1, floor(width * least(1.0, least(224.0 / width, 224.0 / height)))) AS BIGINT) AS out_w,
        | CAST(greatest(1, floor(height * least(1.0, least(224.0 / width, 224.0 / height)))) AS BIGINT) AS out_h
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_media_embed_stub" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents),
        |f AS (SELECT doc_id,
        |        (len * 131) % 1000 AS i0,
        |        list_sum(list_transform(range(0, 16),
        |          j -> ((len * 131 + 37 * j) % 1000) * ((len * 131 + 37 * j) % 1000))) AS ss
        |      FROM m)
        |SELECT doc_id, 16 AS dim,
        | floor(CAST(i0 AS DOUBLE) / 1000.0 * 10000.0 + 0.5) / 10000.0 AS feat_0,
        | floor(sqrt(CAST(ss AS DOUBLE)) / 1000.0 * 10000.0 + 0.5) / 10000.0 AS l2
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |      ELSE 'webp' END AS media_format,
        | 64 + (doc_id * 2654435761) % 512 AS width,
        | 64 + (doc_id * 40503) % 512 AS height,
        | 1 + doc_id % 30 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, term, tf, df,
        |             CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        |           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, tf, df, tfidf,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
        |           FROM scored)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df,
        | floor(tfidf * 10000.0 + 0.5) / 10000.0 AS tfidf
        |FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "q_token_entropy" ->
      """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT lang, term, count(*) AS c FROM toks WHERE term <> '' GROUP BY 1, 2),
        |agg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_terms,
        |          sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sclogc
        |        FROM cnt GROUP BY 1)
        |SELECT lang, n_tokens, n_terms,
        | floor((ln(CAST(n_tokens AS DOUBLE)) - CAST(sclogc AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS entropy_nats
        |FROM agg ORDER BY lang""".stripMargin,

    "q_quality_band" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |        0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |          + 0.2 * least(1.0, stops / 10.0) AS q
        |      FROM f),
        |th AS (SELECT quantile_cont(q, 0.1) AS p_lo, quantile_cont(q, 0.9) AS p_hi FROM s)
        |SELECT doc_id, lang, floor(q * 10000.0 + 0.5) / 10000.0 AS quality_score
        |FROM s CROSS JOIN th
        |WHERE q >= p_lo AND q <= p_hi
        |ORDER BY doc_id""".stripMargin,

    "q_outlier_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM ev GROUP BY 1),
        |dev AS (SELECT event_type, med, abs(value - med) AS adev
        |        FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT event_type, count(*) AS n,
        | floor(min(med) * 10000.0 + 0.5) / 10000.0 AS med,
        | floor(min(mad) * 10000.0 + 0.5) / 10000.0 AS mad,
        | CAST(sum(CASE WHEN adev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_argmax" ->
      """WITH j AS (SELECT n_name, c_custkey, c_acctbal
        |           FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |r AS (SELECT n_name, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
        |        count(*) OVER (PARTITION BY n_name) AS n_members
        |      FROM j)
        |SELECT n_name, c_custkey AS top_custkey,
        | floor(c_acctbal * 10000.0 + 0.5) / 10000.0 AS top_acctbal, n_members
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,

    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_near_dup_editdist" ->
      """WITH d AS (SELECT doc_id, lang, n_chars // 8 AS blk,
        |                  substr(text, 1, 40) AS head
        |           FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 8
        |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_components_editdist" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars // 8 AS blk,
        |                            substr(text, 1, 40) AS head
        |                     FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |      FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk
        |                       AND a.doc_id < b.doc_id
        |      WHERE levenshtein(a.head, b.head) <= 8),
        |e AS (SELECT a_id AS src, b_id AS dst FROM p
        |      UNION SELECT b_id, a_id FROM p),
        |reach AS (
        |  SELECT src AS node, dst AS label FROM e
        |  UNION
        |  SELECT r.node, e2.dst FROM reach r JOIN e e2 ON r.label = e2.src),
        |comp AS (SELECT node, least(node, min(label)) AS component_id
        |         FROM reach GROUP BY node)
        |SELECT doc.doc_id,
        |       coalesce(c.component_id, doc.doc_id) AS component_id,
        |       doc.doc_id = coalesce(c.component_id, doc.doc_id) AS is_canonical
        |FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
        |ORDER BY doc.doc_id""".stripMargin,

    "q_ann_ivf_gated" -> {
      // 5 unrolled Lloyd's iterations in long (vec_id, i, qv) form — the
      // same fixed-point offset arithmetic the Spark builder inlines
      val iters = (1 to 5).map { i =>
        s"""|a$i AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |        FROM slong l JOIN c${i - 1} c ON c.i = l.i GROUP BY 1, 2),
        |b$i AS (SELECT vec_id, cid FROM (
        |          SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |          FROM a$i) WHERE rk = 1),
        |m$i AS (SELECT b.cid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM b$i b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2),
        |c$i AS (SELECT c.cid, c.i, COALESCE(m.qv, c.qv) AS qv
        |        FROM c${i - 1} c LEFT JOIN m$i m ON m.cid = c.cid AND m.i = c.i),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) + 16384 AS qv
        |  FROM embeddings),
        |sample AS (SELECT vec_id FROM embeddings
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20000),
        |slong AS (SELECT q.* FROM q JOIN sample USING (vec_id)),
        |tiles AS (SELECT vec_id, ntile(16) OVER (ORDER BY vec_id) AS t FROM sample),
        |chosen AS (SELECT t, min(vec_id) AS v FROM tiles GROUP BY t),
        |c0 AS (SELECT t - 1 AS cid, l.i, l.qv
        |       FROM chosen JOIN slong l ON l.vec_id = chosen.v),
        |$iters
        |af AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |       FROM q l JOIN c5 c ON c.i = l.i GROUP BY 1, 2),
        |bf AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |         FROM af) WHERE rk = 1),
        |pq AS (SELECT i, qv FROM q WHERE vec_id = 0),
        |pd AS (SELECT c.cid, sum((c.qv - p.qv) * (c.qv - p.qv)) AS d
        |       FROM c5 c JOIN pq p ON p.i = c.i GROUP BY 1),
        |pl AS (SELECT cid FROM pd ORDER BY d, cid LIMIT 4),
        |cand AS (SELECT bf.vec_id FROM bf JOIN pl USING (cid) WHERE bf.vec_id <> 0),
        |cd AS (SELECT q.vec_id, CAST(sum((q.qv - p.qv) * (q.qv - p.qv)) AS BIGINT) AS l2q
        |       FROM q JOIN cand USING (vec_id) JOIN pq p ON p.i = q.i GROUP BY 1)
        |SELECT vec_id, l2q FROM cd ORDER BY l2q, vec_id LIMIT 10""".stripMargin
    },

    "q_hll_gated" ->
      """WITH tw AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS word FROM lineitem),
        |hw AS (
        |  SELECT DISTINCT word FROM tw),
        |hh AS (
        |  SELECT word,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) AS h
        |  FROM hw),
        |regs AS (
        |  SELECT h % 1024 AS idx,
        |         max(CASE WHEN h // 1024 > 0 THEN 39 - length(bin(h // 1024))
        |                  ELSE 39 END) AS mj
        |  FROM hh GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS occ,
        |         sum(1.0 / (CAST(1 AS BIGINT) << mj)) AS hsum
        |  FROM regs),
        |ex AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS exact_distinct FROM tw)
        |SELECT exact_distinct,
        |       1024 - occ AS empty_registers,
        |       floor((0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
        |             (hsum + CAST(1024 - occ AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |         AS hll_est
        |FROM ex, agg""".stripMargin,

    "q_cms_gated" -> {
      val P = 2147483647L
      def slotSql(h: String): String = {
        val aCase = (0 until 4).map(d =>
          s"WHEN $d THEN ${operators.Dedup.cwCoef("cmsa", d, P - 1, 1L)}").mkString(" ")
        val bCase = (0 until 4).map(d =>
          s"WHEN $d THEN ${operators.Dedup.cwCoef("cmsb", d, P, 0L)}").mkString(" ")
        s"((CASE d $aCase END) * $h + (CASE d $bCase END)) % $P % 1024"
      }
      s"""WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tw AS (SELECT word FROM toks WHERE word <> ''),
        |hw AS (
        |  SELECT word,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) % $P AS h
        |  FROM tw),
        |cells AS (
        |  SELECT d, ${slotSql("h")} AS slot, CAST(count(*) AS BIGINT) AS cell
        |  FROM hw, (SELECT unnest([0, 1, 2, 3]) AS d)
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS exact_n
        |  FROM tw GROUP BY word ORDER BY exact_n DESC, word LIMIT 20),
        |eh AS (
        |  SELECT word, exact_n,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) % $P AS h
        |  FROM exact),
        |es AS (
        |  SELECT word, exact_n, d, ${slotSql("h")} AS slot
        |  FROM eh, (SELECT unnest([0, 1, 2, 3]) AS d))
        |SELECT word, exact_n, min(cell) AS cms_est
        |FROM es JOIN cells USING (d, slot)
        |GROUP BY word, exact_n ORDER BY word""".stripMargin
    },

    "q_doc_dedup_minhash_gated" -> {
      // 32 Carter–Wegman minima + 8 band keys, generated once with the
      // SAME md5-derived coefficients the Spark builder inlines
      val P = 2147483647L
      val mins = (0 until 32).map { j =>
        val a = operators.Dedup.cwCoef("a", j, P - 1, 1L)
        val b = operators.Dedup.cwCoef("b", j, P, 0L)
        s"min(($a * h + $b) % $P) AS h$j"
      }.mkString(",\n        |         ")
      val bandCases = (0 until 8).map { bnd =>
        val key = (bnd * 4 until (bnd + 1) * 4)
          .map(j => s"CAST(h$j AS VARCHAR)").mkString(" || '_' || ")
        s"WHEN b = $bnd THEN $key"
      }.mkString("\n        |             ")
      val carryA = (0 until 32).map(j => s"a.h$j AS a_h$j").mkString(", ")
      val carryB = (0 until 32).map(j => s"b.h$j AS b_h$j").mkString(", ")
      val matches = (0 until 32)
        .map(j => s"CASE WHEN a_h$j = b_h$j THEN 1 ELSE 0 END")
        .mkString(" +\n        |        ")
      s"""WITH sh0 AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text) - 2)) AS i
        |  FROM documents WHERE length(text) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 3) AS s
        |  FROM sh0),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) % $P AS h
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id,
        |         ${mins}
        |  FROM hs GROUP BY doc_id),
        |bands AS (
        |  SELECT sig.*, b AS band_id,
        |         CASE $bandCases
        |         END AS bkey
        |  FROM sig, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS b)),
        |stats AS (
        |  SELECT band_id, bkey, count(*) AS bn, min(doc_id) AS anchor
        |  FROM bands GROUP BY 1, 2),
        |bs AS (
        |  SELECT bands.*, stats.bn, stats.anchor
        |  FROM bands JOIN stats USING (band_id, bkey)),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, $carryA, $carryB
        |  FROM bs a JOIN bs b
        |    ON a.band_id = b.band_id AND a.bkey = b.bkey
        |   AND a.doc_id < b.doc_id
        |  WHERE a.bn <= 64
        |  UNION
        |  SELECT a.doc_id, b.doc_id, $carryA, $carryB
        |  FROM bs a JOIN bs b
        |    ON a.band_id = b.band_id AND a.bkey = b.bkey
        |  WHERE a.bn > 64 AND a.doc_id = a.anchor AND b.doc_id <> b.anchor)
        |SELECT a_id, b_id,
        |       floor(($matches) / 32.0 * 10000.0 + 0.5) / 10000.0 AS jaccard_est
        |FROM pairs
        |ORDER BY jaccard_est DESC, a_id, b_id LIMIT 20""".stripMargin
    },

    "q_dedup_simhash_gated" -> {
      // 48 sign-sum bit columns + the bit-pack, generated once — the same
      // loop the Spark builder (Dedup.simhashGatedPairs) runs
      val bitSums = (0 until 48).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
        .mkString(",\n        |         ")
      val pack = (0 until 48).map(b =>
        s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" +\n        |         ")
      s"""WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |hw AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h
        |  FROM words WHERE w <> ''),
        |sums AS (
        |  SELECT doc_id,
        |         $bitSums
        |  FROM hw GROUP BY doc_id),
        |sigs AS (
        |  SELECT doc_id,
        |         $pack AS sig
        |  FROM sums),
        |chunked AS (
        |  SELECT doc_id, sig, c AS chunk_id, (sig >> (c * 12)) & 4095 AS chunk
        |  FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS c)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |                  a.sig AS a_sig, b.sig AS b_sig
        |  FROM chunked a JOIN chunked b
        |    ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
        |   AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        |       CAST(bit_count(xor(a_sig, b_sig)) AS BIGINT) AS hamming
        |FROM pairs
        |ORDER BY hamming, a_id, b_id LIMIT 20""".stripMargin
    },

    "q_ann_lsh_gated" ->
      """WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |                       AS BIGINT) AS qv
        |           FROM embeddings),
        |pl AS (SELECT p.p, d.d,
        |              CASE WHEN CAST(('0x' || substr(md5(CAST(p.p AS VARCHAR) || '_' ||
        |                                              CAST(d.d AS VARCHAR)), 1, 12))
        |                        AS BIGINT) % 2 = 1
        |                   THEN 1 ELSE -1 END AS sg
        |       FROM range(0, 32) p(p) CROSS JOIN range(1, 129) d(d)),
        |dots AS (SELECT q.vec_id, pl.p, sum(q.qv * pl.sg) AS dot
        |         FROM q JOIN pl ON q.d = pl.d GROUP BY 1, 2),
        |bands AS (SELECT vec_id, p // 8 AS band_id,
        |                 sum(CASE WHEN dot > 0 THEN 1 << (p % 8) ELSE 0 END) AS band_hash
        |          FROM dots GROUP BY 1, 2),
        |pairs AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |          FROM bands a JOIN bands b
        |            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
        |           AND a.vec_id < b.vec_id),
        |e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |             generate_subscripts(embedding, 1) AS i FROM embeddings),
        |d2 AS (SELECT pr.a_id, pr.b_id, sum(x.v * y.v) AS dp,
        |              sqrt(sum(x.v * x.v)) AS an, sqrt(sum(y.v * y.v)) AS bn
        |       FROM pairs pr JOIN e x ON x.vec_id = pr.a_id
        |                     JOIN e y ON y.vec_id = pr.b_id AND y.i = x.i
        |       GROUP BY 1, 2)
        |SELECT a_id, b_id, floor(dp / (an * bn) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |FROM d2 ORDER BY cos_sim DESC, a_id, b_id LIMIT 20""".stripMargin,

    "q_ngram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2 FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs
        |        GROUP BY w1, w2 HAVING count(*) >= 5),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c_xy,
        |         CAST(b.c_xy + 1 AS DOUBLE) / CAST(u.c + v.v AS DOUBLE) AS p_smooth
        |  FROM big b JOIN uni u ON b.w1 = u.word, v),
        |ranked AS (
        |  SELECT w1, w2, c_xy, p_smooth,
        |         row_number() OVER (PARTITION BY w1
        |                            ORDER BY p_smooth DESC, w2) AS rk
        |  FROM scored)
        |SELECT w1, CAST(rk AS BIGINT) AS rk, w2, c_xy,
        | floor(p_smooth * 10000.0 + 0.5) / 10000.0 AS p_smooth
        |FROM ranked WHERE rk <= 3 ORDER BY w1, rk""".stripMargin,

    "q_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source
        |                     ORDER BY n_chars DESC, doc_id) AS rk
        | FROM documents)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
        |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    "q_embed_pca_power" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
        |  FROM embeddings),
        |st AS MATERIALIZED (SELECT pos, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(q) AS BIGINT) AS s FROM ex GROUP BY pos),
        |cx AS MATERIALIZED (SELECT vec_id, pos, n * q - s AS cx FROM ex JOIN st USING (pos)),
        |cov AS MATERIALIZED (
        |  SELECT a.pos AS i, b.pos AS j,
        |         CAST(sum(CAST(a.cx AS DECIMAL(19,0)) * CAST(b.cx AS DECIMAL(19,0)))
        |              AS DECIMAL(38,0)) AS m
        |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |dims AS MATERIALIZED (SELECT DISTINCT i AS j FROM cov),
        |v0 AS MATERIALIZED (SELECT j,
        |       CAST(1000000 // (SELECT count(*) FROM dims) AS BIGINT) AS v FROM dims),
        |mv1 AS MATERIALIZED (SELECT i, sum(CAST(m AS HUGEINT) * v) AS mv
        |       FROM cov JOIN v0 ON cov.j = v0.j GROUP BY i),
        |l1 AS (SELECT sum(abs(mv)) AS l FROM mv1),
        |v1 AS MATERIALIZED (
        |  SELECT i AS j,
        |         CAST(CASE WHEN mv < 0 THEN -1 WHEN mv > 0 THEN 1 ELSE 0 END AS BIGINT)
        |         * CAST(CAST(abs(mv) AS HUGEINT)
        |                // greatest(CAST(1 AS HUGEINT), CAST(l AS HUGEINT) // 1000000)
        |                AS BIGINT) AS v
        |  FROM mv1 CROSS JOIN l1),
        |mv2 AS MATERIALIZED (SELECT i, sum(CAST(m AS HUGEINT) * v) AS mv
        |       FROM cov JOIN v1 ON cov.j = v1.j GROUP BY i),
        |l2 AS (SELECT sum(abs(mv)) AS l FROM mv2),
        |v2 AS MATERIALIZED (
        |  SELECT i AS j,
        |         CAST(CASE WHEN mv < 0 THEN -1 WHEN mv > 0 THEN 1 ELSE 0 END AS BIGINT)
        |         * CAST(CAST(abs(mv) AS HUGEINT)
        |                // greatest(CAST(1 AS HUGEINT), CAST(l AS HUGEINT) // 1000000)
        |                AS BIGINT) AS v
        |  FROM mv2 CROSS JOIN l2),
        |mv3 AS MATERIALIZED (SELECT i, sum(CAST(m AS HUGEINT) * v) AS mv
        |       FROM cov JOIN v2 ON cov.j = v2.j GROUP BY i),
        |l3 AS (SELECT sum(abs(mv)) AS l FROM mv3),
        |v3 AS MATERIALIZED (
        |  SELECT i AS j,
        |         CAST(CASE WHEN mv < 0 THEN -1 WHEN mv > 0 THEN 1 ELSE 0 END AS BIGINT)
        |         * CAST(CAST(abs(mv) AS HUGEINT)
        |                // greatest(CAST(1 AS HUGEINT), CAST(l AS HUGEINT) // 1000000)
        |                AS BIGINT) AS v
        |  FROM mv3 CROSS JOIN l3)
        |SELECT j AS dim_idx, v AS loading_fp FROM v3 ORDER BY dim_idx""".stripMargin,

    "q_embed_centroid" ->
      """WITH ex AS (
        |  SELECT label,
        |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings)
        |SELECT label, pos, count(*) AS n,
        | floor(CAST(sum(q) AS DOUBLE) / 10000.0 / count(*) * 10000.0 + 0.5) / 10000.0
        |   AS centroid_val
        |FROM ex GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_conditional_agg" ->
      """SELECT l_returnflag,
        | count(*) AS n_rows,
        | count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        | count(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted,
        | floor(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |              FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS disc_revenue,
        | floor(max(l_quantity) FILTER (WHERE l_tax > 0.04) * 10000.0 + 0.5) / 10000.0
        |   AS max_taxed_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_crosstab_dense" ->
      """WITH grid AS (
        |  SELECT r_regionkey, r_name, o_orderpriority
        |  FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)),
        |cells AS (
        |  SELECT n_regionkey AS r_regionkey, o_orderpriority,
        |         count(*) AS n_orders_raw,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT g.r_name, g.o_orderpriority,
        | coalesce(c.n_orders_raw, 0) AS n_orders,
        | floor(coalesce(CAST(c.rev_dec AS DOUBLE), 0.0) * 10000.0 + 0.5) / 10000.0
        |   AS revenue
        |FROM grid g LEFT JOIN cells c
        |  ON g.r_regionkey = c.r_regionkey AND g.o_orderpriority = c.o_orderpriority
        |ORDER BY g.r_name, g.o_orderpriority""".stripMargin,

    "q_resample_weekly" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
        | o_orderstatus, count(*) AS n_orders,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS max_price
        |FROM orders
        |GROUP BY 1, 2 ORDER BY week_start, o_orderstatus""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  CAST((SELECT max(o_orderdate) FROM orders
        |        WHERE o_custkey = c_custkey) AS DATE) AS last_order,
        |  coalesce((SELECT count(*) FROM orders
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_lateral_topn" ->
      """SELECT n_name, ln.c_custkey,
        |       floor(ln.c_acctbal * 10000.0 + 0.5) / 10000.0 AS c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) ln
        |ORDER BY n_name, c_custkey""".stripMargin,

    "q_benford" ->
      """WITH counted AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS n
        |  FROM orders WHERE o_totalprice > 0.0
        |  GROUP BY 1),
        |total AS (SELECT sum(n) AS total FROM counted)
        |SELECT digit, n,
        | floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS obs_ratio,
        | floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 10000.0 + 0.5) / 10000.0 AS exp_ratio
        |FROM counted, total
        |ORDER BY digit""".stripMargin,

    "q_role_playing_dim" ->
      """WITH dd AS (
        |  SELECT CAST(g AS DATE) AS d,
        |         CAST(year(CAST(g AS DATE)) AS INT) AS yr,
        |         CAST(quarter(CAST(g AS DATE)) AS INT) AS qtr
        |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY) t(g))
        |SELECT od.yr AS order_yr, od.qtr AS order_qtr,
        |       sd.yr AS ship_yr, sd.qtr AS ship_qtr,
        |       count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN dd od ON CAST(o_orderdate AS DATE) = od.d
        |JOIN dd sd ON CAST(l_shipdate AS DATE) = sd.d
        |GROUP BY 1, 2, 3, 4
        |ORDER BY order_yr, order_qtr, ship_yr, ship_qtr""".stripMargin,

    "q_perplexity_filter" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, w1, w2 FROM (
        |    SELECT doc_id, word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY w1, w2),
        |scored AS (
        |  SELECT p.doc_id,
        |         CAST(floor(-ln(CAST(b.c_xy + 1 AS DOUBLE)
        |                        / CAST(u.c + v.v AS DOUBLE)) * 1000000.0 + 0.5)
        |              AS BIGINT) AS nll_q
        |  FROM pairs p
        |  JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
        |  JOIN uni u ON p.w1 = u.word, v)
        |SELECT doc_id, count(*) AS n_bigrams,
        | floor(CAST(sum(nll_q) AS DOUBLE) / 1000000.0 / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_nll,
        | sum(nll_q) < 8000000 * count(*) AS is_kept
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_abtest" ->
      """WITH per_user AS (
        |  SELECT user_id % 2 = 0 AS is_a,
        |         max(CASE WHEN value > 250.0 THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
        |         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
        |         sum(CASE WHEN is_a THEN converted ELSE 0 END) AS conv_a,
        |         sum(CASE WHEN NOT is_a THEN converted ELSE 0 END) AS conv_b
        |  FROM per_user)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        | CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
        | floor(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS rate_a,
        | floor(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS rate_b,
        | CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE
        | floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |              * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 END AS z_score,
        | CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE
        | abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |     / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |            * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96
        |   END AS significant
        |FROM t""".stripMargin,

    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |trans AS (SELECT cur, nxt, count(*) AS n FROM seq
        |          WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |outgoing AS (SELECT cur, sum(n) AS n_out FROM trans GROUP BY cur)
        |SELECT t.cur, t.nxt, t.n,
        | floor(CAST(t.n AS DOUBLE) / CAST(o.n_out AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS p
        |FROM trans t JOIN outgoing o ON t.cur = o.cur
        |ORDER BY t.cur, t.nxt""".stripMargin,

    "q_yoy_delta" ->
      """WITH yearly AS (
        |  SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS yr,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT c_mktsegment, yr, rev_dec,
        |         lag(rev_dec) OVER (PARTITION BY c_mktsegment ORDER BY yr) AS prev_dec
        |  FROM yearly)
        |SELECT c_mktsegment, yr,
        | floor(CAST(rev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_dec - prev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS delta,
        | floor(CAST(rev_dec - prev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS pct_change
        |FROM lagged ORDER BY c_mktsegment, yr""".stripMargin,

    "q_bpe_apply" ->
      """WITH w0 AS (
        |  SELECT count(*) AS wc, regexp_replace(word, '(.)', '(\1)', 'g') AS repr
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{2,}$')
        |  GROUP BY word),
        |c1 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w0),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM c1 ORDER BY n DESC, a, b LIMIT 1),
        |w1 AS (SELECT wc, replace(repr, '(' || b1.a || ')(' || b1.b || ')',
        |                          '(' || b1.a || b1.b || ')') AS repr FROM w0, b1),
        |c2 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w1),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM c2 ORDER BY n DESC, a, b LIMIT 1),
        |w2 AS (SELECT wc, replace(repr, '(' || b2.a || ')(' || b2.b || ')',
        |                          '(' || b2.a || b2.b || ')') AS repr FROM w1, b2),
        |c3 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w2),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b3 AS (SELECT a, b, n FROM c3 ORDER BY n DESC, a, b LIMIT 1),
        |w3 AS (SELECT wc, replace(repr, '(' || b3.a || ')(' || b3.b || ')',
        |                          '(' || b3.a || b3.b || ')') AS repr FROM w2, b3),
        |c4 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w3),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b4 AS (SELECT a, b, n FROM c4 ORDER BY n DESC, a, b LIMIT 1),
        |w4 AS (SELECT wc, replace(repr, '(' || b4.a || ')(' || b4.b || ')',
        |                          '(' || b4.a || b4.b || ')') AS repr FROM w3, b4),
        |c5 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w4),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b5 AS (SELECT a, b, n FROM c5 ORDER BY n DESC, a, b LIMIT 1),
        |rules AS (SELECT max(CASE WHEN r = 1 THEN a END) AS a1, max(CASE WHEN r = 1 THEN b END) AS b1, max(CASE WHEN r = 2 THEN a END) AS a2, max(CASE WHEN r = 2 THEN b END) AS b2, max(CASE WHEN r = 3 THEN a END) AS a3, max(CASE WHEN r = 3 THEN b END) AS b3, max(CASE WHEN r = 4 THEN a END) AS a4, max(CASE WHEN r = 4 THEN b END) AS b4, max(CASE WHEN r = 5 THEN a END) AS a5, max(CASE WHEN r = 5 THEN b END) AS b5
        |          FROM (SELECT 1 AS r, a, b FROM b1 UNION ALL SELECT 2 AS r, a, b FROM b2 UNION ALL SELECT 3 AS r, a, b FROM b3 UNION ALL SELECT 4 AS r, a, b FROM b4 UNION ALL SELECT 5 AS r, a, b FROM b5)),
        |tok AS (SELECT doc_id, word FROM (
        |          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |          FROM documents)
        |        WHERE regexp_matches(word, '^[a-z]{2,}$')),
        |ap AS (SELECT doc_id, CAST(length(word) AS BIGINT) AS n_chars,
        |         CAST(len(regexp_extract_all(
        |           replace(replace(replace(replace(replace(regexp_replace(word, '(.)', '(\1)', 'g'), '(' || a1 || ')(' || b1 || ')', '(' || a1 || b1 || ')'), '(' || a2 || ')(' || b2 || ')', '(' || a2 || b2 || ')'), '(' || a3 || ')(' || b3 || ')', '(' || a3 || b3 || ')'), '(' || a4 || ')(' || b4 || ')', '(' || a4 || b4 || ')'), '(' || a5 || ')(' || b5 || ')', '(' || a5 || b5 || ')'),
        |           '\(')) AS BIGINT) AS n_sym
        |       FROM tok CROSS JOIN rules)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_alpha_words,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars_tokens,
        |       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
        |       floor(CAST(sum(n_sym) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS compression
        |FROM ap GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bpe_train" ->
      """WITH w0 AS (
        |  SELECT count(*) AS wc, regexp_replace(word, '(.)', '(\1)', 'g') AS repr
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{2,}$')
        |  GROUP BY word),
        |c1 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w0),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM c1 ORDER BY n DESC, a, b LIMIT 1),
        |w1 AS (SELECT wc, replace(repr, '(' || b1.a || ')(' || b1.b || ')',
        |                          '(' || b1.a || b1.b || ')') AS repr FROM w0, b1),
        |c2 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w1),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM c2 ORDER BY n DESC, a, b LIMIT 1),
        |w2 AS (SELECT wc, replace(repr, '(' || b2.a || ')(' || b2.b || ')',
        |                          '(' || b2.a || b2.b || ')') AS repr FROM w1, b2),
        |c3 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w2),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b3 AS (SELECT a, b, n FROM c3 ORDER BY n DESC, a, b LIMIT 1),
        |w3 AS (SELECT wc, replace(repr, '(' || b3.a || ')(' || b3.b || ')',
        |                          '(' || b3.a || b3.b || ')') AS repr FROM w2, b3),
        |c4 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w3),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b4 AS (SELECT a, b, n FROM c4 ORDER BY n DESC, a, b LIMIT 1),
        |w4 AS (SELECT wc, replace(repr, '(' || b4.a || ')(' || b4.b || ')',
        |                          '(' || b4.a || b4.b || ')') AS repr FROM w3, b4),
        |c5 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w4),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b5 AS (SELECT a, b, n FROM c5 ORDER BY n DESC, a, b LIMIT 1)
        |SELECT CAST(r AS BIGINT) AS merge_round, a, b, a || b AS merged, n
        |FROM (SELECT 1 AS r, * FROM b1 UNION ALL SELECT 2, * FROM b2
        |      UNION ALL SELECT 3, * FROM b3 UNION ALL SELECT 4, * FROM b4
        |      UNION ALL SELECT 5, * FROM b5)
        |ORDER BY merge_round""".stripMargin,

    "q_bpe_merges" ->
      """WITH words AS (
        |  SELECT word, count(*) AS wc FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE length(word) >= 2 GROUP BY word),
        |pairs AS (
        |  SELECT substr(word, CAST(i AS INT), 2) AS pair, wc
        |  FROM words, LATERAL unnest(generate_series(1, length(word) - 1)) t(i))
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    "q_wma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS q,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id, a.ts_us,
        | floor(CAST(sum(b.q * (5 - (a.rn - b.rn))) AS DOUBLE) / 10000.0
        |       / CAST(sum(5 - (a.rn - b.rn)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS wma5
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |                 AND a.rn - b.rn >= 0 AND a.rn - b.rn < 5
        |GROUP BY a.user_id, a.event_id, a.ts_us
        |ORDER BY a.user_id, a.ts_us, a.event_id""".stripMargin,

    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS q,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id, a.ts_us,
        | floor(CAST(sum(b.q * (16 >> (a.rn - b.rn))) AS DOUBLE) / 10000.0
        |       / CAST(sum(16 >> (a.rn - b.rn)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS ewma5
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |                 AND a.rn - b.rn >= 0 AND a.rn - b.rn < 5
        |GROUP BY a.user_id, a.event_id, a.ts_us
        |ORDER BY a.user_id, a.ts_us, a.event_id""".stripMargin,

    "q_join_right_outer" ->
      """SELECT p_partkey, count(l_orderkey) AS n_lineitems,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS total_qty
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,

    "q_cross_join" ->
      """SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name,
        |       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_member
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_regionkey, n.n_nationkey""".stripMargin,

    "q_curriculum" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    floor((0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |           + 0.2 * least(1.0, stops / 10.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
        |  FROM f)
        |SELECT doc_id, quality_score,
        |       NTILE(4) OVER (ORDER BY quality_score, doc_id) AS phase
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_decile_lift" ->
      """WITH spend AS (
        |  SELECT o_custkey AS ck, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1),
        |r AS (SELECT ck, m, NTILE(10) OVER (ORDER BY m DESC, ck) AS decile FROM spend),
        |pd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |              sum(m) AS rev_dec FROM r GROUP BY 1),
        |tt AS (SELECT sum(rev_dec) AS total_dec FROM pd),
        |cc AS (SELECT pd.decile, pd.n_customers, pd.rev_dec, tt.total_dec,
        |              sum(pd.rev_dec) OVER (ORDER BY pd.decile
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
        |       FROM pd CROSS JOIN tt)
        |SELECT decile, n_customers,
        | floor(CAST(rev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS pct_of_total,
        | floor(CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_pct
        |FROM cc ORDER BY decile""".stripMargin,

    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT pk, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, pk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(rev) OVER () AS total
        |  FROM rev)
        |SELECT pk AS p_partkey,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_share,
        | CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |      WHEN cum * 100 <= total * 95 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |FROM c ORDER BY pk""".stripMargin,

    "q_explode_outer" ->
      """SELECT o.o_orderkey, l.l_linenumber AS item
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.09) l
        |ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey, item NULLS FIRST""".stripMargin,

    "q_incr_join_merge" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_seqlen_percentiles" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | floor(quantile_cont(n_tokens, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        | floor(quantile_cont(n_tokens, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
        | floor(quantile_cont(n_tokens, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99,
        | max(n_tokens) AS max_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_savings" ->
      """WITH c AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_key,
        |         count(*) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sum(sz - 1) AS BIGINT) AS docs_removed
        |FROM c GROUP BY sz ORDER BY sz""".stripMargin,

    "q_first_touch" ->
      """WITH s AS (
        |  SELECT user_id, event_type, value,
        |         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                     IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(direct)') AS channel, count(*) AS conversions,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM s WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_nth_value_bool" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type
        |  FROM events),
        |w AS (
        |  SELECT *, nth_value(value, 3) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        | floor(min(third_value) * 10000.0 + 0.5) / 10000.0 AS third_value,
        | CAST(min(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS INT) AS all_positive,
        | CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS any_error
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_outlier_iqr" ->
      """WITH f AS (
        |  SELECT c_mktsegment,
        |         quantile_cont(c_acctbal, 0.25) AS q1,
        |         quantile_cont(c_acctbal, 0.75) AS q3
        |  FROM customer GROUP BY c_mktsegment),
        |fe AS (
        |  SELECT c_mktsegment,
        |         q1 - 1.5 * (q3 - q1) AS lo,
        |         q3 + 1.5 * (q3 - q1) AS hi
        |  FROM f)
        |SELECT c.c_mktsegment, c.c_custkey,
        | floor(c.c_acctbal * 10000.0 + 0.5) / 10000.0 AS c_acctbal,
        | floor(fe.lo * 10000.0 + 0.5) / 10000.0 AS fence_lo,
        | floor(fe.hi * 10000.0 + 0.5) / 10000.0 AS fence_hi,
        | CASE WHEN c.c_acctbal < fe.lo THEN 'low' ELSE 'high' END AS side
        |FROM customer c JOIN fe ON c.c_mktsegment = fe.c_mktsegment
        |WHERE c.c_acctbal < fe.lo OR c.c_acctbal > fe.hi
        |ORDER BY c.c_mktsegment, c.c_custkey""".stripMargin,

    "q_mult_means" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | floor(exp(CAST(sum(CAST(ln(x) AS DECIMAL(28,8))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS geo_mean,
        | floor(CAST(count(*) AS DOUBLE)
        |       / CAST(sum(CAST(1.0 / x AS DECIMAL(28,8))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS harmonic_mean
        |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_except_all" ->
      """WITH d AS (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_orderpriority, count(*) AS surplus
        |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_ref_integrity" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_dup_pk
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey -> part',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
        |    (SELECT count(*) - count(DISTINCT p_partkey) FROM part)
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey -> supplier',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
        |    (SELECT count(*) - count(DISTINCT s_suppkey) FROM supplier)
        |  UNION ALL
        |  SELECT 'orders.o_custkey -> customer',
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
        |  UNION ALL
        |  SELECT 'customer.c_nationkey -> nation',
        |    (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |    (SELECT count(*) - count(DISTINCT n_nationkey) FROM nation)
        |  UNION ALL
        |  SELECT 'nation.n_regionkey -> region',
        |    (SELECT count(*) FROM nation n WHERE n.n_regionkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
        |    (SELECT count(*) - count(DISTINCT r_regionkey) FROM region)
        |) t ORDER BY fk_edge""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |    FROM documents) u
        |  WHERE word <> ''),
        |vocab AS (
        |  SELECT word, 1 AS in_vocab FROM (
        |    SELECT word, count(*) AS n FROM toks GROUP BY word
        |    ORDER BY n DESC, word ASC LIMIT 200) v)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(count(vocab.in_vocab) AS BIGINT) AS n_in_vocab,
        | floor((1.0 - CAST(count(vocab.in_vocab) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS oov_rate
        |FROM toks t LEFT JOIN vocab ON t.word = vocab.word
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id,
        |         list_aggregate(list_transform(embedding,
        |           x -> abs(CAST(x AS DOUBLE))), 'max') AS scale,
        |         embedding
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127.0 + 0.5) AS BIGINT)) AS qv
        |  FROM s WHERE scale > 0)
        |SELECT vec_id,
        | floor(scale * 10000.0 + 0.5) / 10000.0 AS scale,
        | CAST(list_aggregate(qv, 'sum') AS BIGINT) AS checksum,
        | CAST(len(list_filter(qv, v -> v <> 0)) AS BIGINT) AS nnz
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_division" ->
      """WITH wanted AS (
        |  SELECT p_partkey, p_brand FROM part WHERE p_brand LIKE 'Brand#1%'),
        |divisor AS (SELECT count(DISTINCT p_brand) AS n_brands FROM wanted),
        |dividend AS (
        |  SELECT DISTINCT o.o_custkey AS custkey, w.p_brand
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN wanted w ON l.l_partkey = w.p_partkey)
        |SELECT custkey, CAST(count(DISTINCT p_brand) AS BIGINT) AS n_bought
        |FROM dividend CROSS JOIN divisor
        |GROUP BY custkey, divisor.n_brands
        |HAVING count(DISTINCT p_brand) = divisor.n_brands
        |ORDER BY custkey""".stripMargin,

    "q_not_in_nulls" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_totalprice > 450000.0 THEN o_custkey END
        |      FROM orders)) AS n_not_in,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |   WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o
        |      WHERE o.o_totalprice > 450000.0
        |        AND o.o_custkey = c.c_custkey)) AS n_not_exists""".stripMargin,

    "q_agg_of_agg" ->
      """WITH pc AS (
        |  SELECT c_mktsegment, o_custkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        | floor(CAST(sum(spend) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS avg_clv,
        | floor(CAST(min(spend) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS min_clv,
        | floor(CAST(max(spend) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS max_clv
        |FROM pc GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_sessionize_typed" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |                     ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE h AS (
        |  SELECT p_partkey AS node, p_partkey AS cur, CAST(0 AS BIGINT) AS depth
        |  FROM part
        |  UNION ALL
        |  SELECT node, cur // 10, depth + 1 FROM h WHERE cur >= 10)
        |SELECT node AS p_partkey, cur AS root_key, depth
        |FROM h WHERE cur < 10 ORDER BY node""".stripMargin,

    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS HUGEINT) AS cents
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT d, cents,
        |         sum(cents) OVER (ORDER BY d
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |  FROM daily),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(cents) AS total FROM daily),
        |s AS (SELECT c.d, c.cents, (t.n * c.prefix - c.i * t.total) AS dev, t.n
        |      FROM c CROSS JOIN t),
        |p AS (SELECT max(abs(dev)) AS peak_dev FROM s)
        |SELECT s.d,
        | floor(CAST(s.cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(s.dev AS DOUBLE) / (100.0 * CAST(s.n AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS cusum,
        | CASE WHEN abs(s.dev) = p.peak_dev THEN 1 ELSE 0 END AS is_peak
        |FROM s CROSS JOIN p ORDER BY s.d""".stripMargin,

    "q_moments" ->
      """WITH b AS (
        |  SELECT c_mktsegment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM customer),
        |s AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(x AS HUGEINT)) AS s1,
        |         sum(CAST(x AS HUGEINT) * x) AS s2,
        |         sum(CAST(x AS HUGEINT) * x * x) AS s3,
        |         sum(CAST(x AS HUGEINT) * x * x * x) AS s4
        |  FROM b GROUP BY 1),
        |m AS (
        |  SELECT c_mktsegment, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS a3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS a4
        |  FROM s),
        |k AS (
        |  SELECT c_mktsegment, n, mu,
        |    a2 - mu * mu AS m2,
        |    a3 - 3.0 * mu * a2 + 2.0 * mu * mu * mu AS m3,
        |    a4 - 4.0 * mu * a3 + 6.0 * mu * mu * a2 - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT c_mktsegment, n,
        | floor(mu / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean,
        | CASE WHEN m2 > 0 THEN floor(m3 / (m2 * sqrt(m2)) * 10000.0 + 0.5) / 10000.0 END AS skewness,
        | CASE WHEN m2 > 0 THEN floor(m4 / (m2 * m2) * 10000.0 + 0.5) / 10000.0 END AS kurtosis
        |FROM k ORDER BY c_mktsegment""".stripMargin,

    "q_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id, text,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
        |  FROM documents),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM dl),
        |tf AS (
        |  SELECT doc_id, len, term, count(*) AS tf FROM (
        |    SELECT doc_id, len, unnest(string_split(lower(text), ' ')) AS term FROM dl) u
        |  WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, len, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
        |              / (CAST(dfq.df AS DOUBLE) + 0.5))
        |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.len AS DOUBLE)
        |         / (CAST(st.sum_len AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))) AS sc
        |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st)
        |SELECT doc_id,
        | floor(CAST(sum(CAST(sc AS DECIMAL(28,8))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS bm25
        |FROM s GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q_triangles" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT e1.a AS brand_a, e1.b AS brand_b, e2.b AS brand_c
        |FROM e e1
        |JOIN e e2 ON e1.b = e2.a
        |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY brand_a, brand_b, brand_c""".stripMargin,

    "q_growth_accounting" ->
      """WITH um AS (SELECT DISTINCT o_custkey AS c,
        |                   CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |            FROM orders),
        |f AS (SELECT c, m, lag(m) OVER w AS prev_m, lead(m) OVER w AS next_m
        |      FROM um WINDOW w AS (PARTITION BY c ORDER BY m)),
        |cls AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active,
        |         CAST(sum(CASE WHEN prev_m IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_new,
        |         CAST(sum(CASE WHEN prev_m = m - INTERVAL 1 MONTH
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |         CAST(sum(CASE WHEN prev_m IS NOT NULL
        |                        AND prev_m < m - INTERVAL 1 MONTH
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |        FROM f GROUP BY m),
        |ch AS (SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m,
        |              CAST(count(*) AS BIGINT) AS n_churned
        |       FROM f WHERE next_m IS NULL OR next_m > m + INTERVAL 1 MONTH
        |       GROUP BY 1)
        |SELECT cls.m AS month, n_active, n_new, n_retained, n_resurrected,
        |       COALESCE(n_churned, 0) AS n_churned
        |FROM cls LEFT JOIN ch ON ch.m = cls.m ORDER BY month""".stripMargin,

    "q_cochran_q" ->
      """WITH flags AS (SELECT o_custkey,
        |  max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x1,
        |  max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS x2,
        |  max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS x3
        | FROM orders GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(x1) AS BIGINT) AS t1, CAST(sum(x2) AS BIGINT) AS t2,
        |  CAST(sum(x3) AS BIGINT) AS t3,
        |  CAST(sum(x1 + x2 + x3) AS BIGINT) AS sr,
        |  CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
        | FROM flags)
        |SELECT n_blocks, t1, t2, t3,
        | floor(cast(2 * (3 * (t1 * t1 + t2 * t2 + t3 * t3)
        |            - (t1 + t2 + t3) * (t1 + t2 + t3)) as double)
        |       / cast(3 * sr - sr2 as double) * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM m""".stripMargin,

    "q_partial_corr" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y,
        |    CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS z
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz
        | FROM per),
        |r AS (SELECT n,
        |  (cast(n as double) * cast(sxy as double)
        |   - cast(sx as double) * cast(sy as double))
        |  / sqrt((cast(n as double) * cast(sxx as double)
        |          - cast(sx as double) * cast(sx as double))
        |         * (cast(n as double) * cast(syy as double)
        |            - cast(sy as double) * cast(sy as double))) AS rxy,
        |  (cast(n as double) * cast(sxz as double)
        |   - cast(sx as double) * cast(sz as double))
        |  / sqrt((cast(n as double) * cast(sxx as double)
        |          - cast(sx as double) * cast(sx as double))
        |         * (cast(n as double) * cast(szz as double)
        |            - cast(sz as double) * cast(sz as double))) AS rxz,
        |  (cast(n as double) * cast(syz as double)
        |   - cast(sy as double) * cast(sz as double))
        |  / sqrt((cast(n as double) * cast(syy as double)
        |          - cast(sy as double) * cast(sy as double))
        |         * (cast(n as double) * cast(szz as double)
        |            - cast(sz as double) * cast(sz as double))) AS ryz
        | FROM m)
        |SELECT n AS n_orders,
        | floor(rxy * 10000.0 + 0.5) / 10000.0 AS r_xy,
        | floor(rxz * 10000.0 + 0.5) / 10000.0 AS r_xz,
        | floor(ryz * 10000.0 + 0.5) / 10000.0 AS r_yz,
        | floor((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        |       * 10000.0 + 0.5) / 10000.0 AS r_xy_given_z
        |FROM r""".stripMargin,

    "q_did" ->
      """WITH g AS (
        |  SELECT (c_mktsegment = 'BUILDING') AS treated,
        |         (CAST(o_orderdate AS DATE) >= DATE '1998-01-01') AS post,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |a AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n, sum(tp) AS s
        |      FROM g GROUP BY 1, 2),
        |w AS (SELECT
        |  max(CASE WHEN treated AND post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tp1,
        |  max(CASE WHEN treated AND NOT post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tp0,
        |  max(CASE WHEN NOT treated AND post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cp1,
        |  max(CASE WHEN NOT treated AND NOT post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cp0
        | FROM a)
        |SELECT floor(tp0 * 10000.0 + 0.5) / 10000.0 AS treated_pre,
        |       floor(tp1 * 10000.0 + 0.5) / 10000.0 AS treated_post,
        |       floor(cp0 * 10000.0 + 0.5) / 10000.0 AS control_pre,
        |       floor(cp1 * 10000.0 + 0.5) / 10000.0 AS control_post,
        |       floor(((tp1 - tp0) - (cp1 - cp0)) * 10000.0 + 0.5) / 10000.0 AS did
        |FROM w""".stripMargin,

    "q_srm" ->
      """WITH sp AS (SELECT doc_id,
        |        CASE WHEN doc_id % 10 < 8 THEN 'train'
        |             WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split
        |      FROM documents),
        |obs AS (SELECT split, CAST(count(*) AS BIGINT) AS observed
        |        FROM sp GROUP BY 1),
        |alloc(split, permille) AS (VALUES ('train', 800), ('val', 100), ('test', 100)),
        |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM obs)
        |SELECT split, observed,
        | floor(cast(total * permille as double) / 1000.0 * 10000.0 + 0.5) / 10000.0
        |   AS expected,
        | floor((cast(observed as double) - cast(total * permille as double) / 1000.0)
        |       * (cast(observed as double) - cast(total * permille as double) / 1000.0)
        |       / (cast(total * permille as double) / 1000.0)
        |       * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
        |FROM obs CROSS JOIN tot JOIN alloc USING (split)
        |ORDER BY split""".stripMargin,

    "q_logrank" ->
      """WITH pc AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |                   max(CAST(o_orderdate AS DATE)) AS l
        |            FROM orders GROUP BY 1),
        |seg AS (SELECT c_custkey,
        |               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        |        FROM customer),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t, g1,
        |               CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |        FROM pc JOIN seg ON o_custkey = c_custkey CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev * g1) AS BIGINT) AS d1,
        |                 CAST(sum(ev * (1 - g1)) AS BIGINT) AS d2,
        |                 CAST(sum(g1) AS BIGINT) AS c1,
        |                 CAST(sum(1 - g1) AS BIGINT) AS c2
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS nt1,
        |               CAST(sum(c2) AS BIGINT) AS nt2 FROM grain),
        |curve AS (SELECT t, d1, d2, nt1, nt2,
        |  nt1 - COALESCE(sum(c1) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |  nt2 - COALESCE(sum(c2) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
        |  FROM grain CROSS JOIN tot),
        |ev AS (SELECT nt1, nt2, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n
        |       FROM curve WHERE d1 + d2 > 0),
        |terms AS (SELECT nt1, nt2, d1, d2,
        |  CAST(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
        |       AS DECIMAL(28,8)) AS e1,
        |  CASE WHEN n > 1 THEN
        |    CAST(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         * CAST(n - d AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
        |         AS DECIMAL(28,8))
        |  ELSE CAST(0 AS DECIMAL(28,8)) END AS v
        |  FROM ev)
        |SELECT max(nt1) AS n_group1, max(nt2) AS n_group2,
        | CAST(sum(d1) AS BIGINT) AS observed1,
        | floor(CAST(sum(e1) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS expected1,
        | CAST(sum(d2) AS BIGINT) AS observed2,
        | floor((CAST(sum(d1) AS DOUBLE) - CAST(sum(e1) AS DOUBLE))
        |       * (CAST(sum(d1) AS DOUBLE) - CAST(sum(e1) AS DOUBLE))
        |       / CAST(sum(v) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM terms""".stripMargin,

    "q_nelson_aalen" ->
      """WITH pc AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |                   max(CAST(o_orderdate AS DATE)) AS l
        |            FROM orders GROUP BY 1),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
        |               CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |        FROM pc CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |                 CAST(count(*) AS BIGINT) AS c
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM grain),
        |curve AS (SELECT t, d, c,
        |  n_total - COALESCE(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM grain CROSS JOIN tot),
        |acc AS (SELECT t, d, n_risk,
        |  sum(CAST(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS DECIMAL(28,8)))
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS h
        |  FROM curve)
        |SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk, d AS deaths,
        | floor(CAST(h AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS cum_hazard,
        | floor(exp(-CAST(h AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS fh_survival
        |FROM acc WHERE d > 0 ORDER BY duration_days""".stripMargin,

    "q_durbin_watson" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx FROM m),
        |resid AS (SELECT x, n,
        |  CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)) AS e
        |  FROM pts CROSS JOIN fit),
        |led AS (SELECT n, e, lag(e, 1) OVER (ORDER BY x ASC) AS ep FROM resid)
        |SELECT max(n) AS n_days,
        | floor(CAST(sum(CASE WHEN ep IS NOT NULL
        |                     THEN CAST((e - ep) * (e - ep) AS DECIMAL(38,8))
        |                     ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
        |       / CAST(sum(CAST(e * e AS DECIMAL(38,8))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS dw
        |FROM led""".stripMargin,

    "q_ljung_box" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |led AS (SELECT n, z,
        |  lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2,
        |  lag(z, 3) OVER w AS z3, lag(z, 4) OVER w AS z4,
        |  lag(z, 5) OVER w AS z5
        | FROM z WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT max(n) AS n,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c0,
        |  CAST(sum(CASE WHEN z1 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c1,
        |  CAST(sum(CASE WHEN z2 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c2,
        |  CAST(sum(CASE WHEN z3 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z3 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c3,
        |  CAST(sum(CASE WHEN z4 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z4 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c4,
        |  CAST(sum(CASE WHEN z5 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z5 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c5
        | FROM led),
        |lags AS (
        |  SELECT n, 1 AS lg, CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS rk FROM m
        |  UNION ALL SELECT n, 2, CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 3, CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 4, CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 5, CAST(c5 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m),
        |acc AS (SELECT n, lg, rk,
        |  sum(CAST(rk * rk / CAST(n - lg AS DOUBLE) AS DECIMAL(38,18)))
        |    OVER (ORDER BY lg ROWS UNBOUNDED PRECEDING) AS qsum
        | FROM lags)
        |SELECT CAST(lg AS BIGINT) AS lag_k,
        | floor(rk * 10000.0 + 0.5) / 10000.0 AS acf,
        | floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * CAST(qsum AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM acc ORDER BY lag_k""".stripMargin,

    "q_ols_multi" ->
      """WITH li AS (SELECT
        |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
        |  CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS z
        | FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz
        | FROM li),
        |cent AS (SELECT n,
        |  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
        |  CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz,
        |  CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS cxz,
        |  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
        |  CAST(n AS DOUBLE) * CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) AS czy,
        |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS mz,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        | FROM m),
        |fit AS (SELECT n, mx, mz, my, cxy, czy, cyy,
        |  (czz * cxy - cxz * czy) / (cxx * czz - cxz * cxz) AS b1,
        |  (cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz) AS b2
        | FROM cent)
        |SELECT n AS n_lines,
        | floor((my - b1 * mx - b2 * mz) * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(b1 * 10000.0 + 0.5) / 10000.0 AS b_quantity,
        | floor(b2 * 10000.0 + 0.5) / 10000.0 AS b_discount,
        | floor((b1 * cxy + b2 * czy) / cyy * 10000.0 + 0.5) / 10000.0 AS r2
        |FROM fit""".stripMargin,

    "q_bh_fdr" ->
      """WITH li AS (SELECT p_brand,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS ng,
        |             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg
        |      FROM li GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        | FROM li),
        |zs AS (SELECT p_brand, ng,
        |  (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - mu)
        |    * sqrt(CAST(ng AS DOUBLE)) / sigma AS z
        | FROM (SELECT p_brand, ng, sg,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |         sqrt((CAST(s2 AS DOUBLE)
        |               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |              / CAST(n AS DOUBLE)) AS sigma
        |       FROM g CROSS JOIN tot)),
        |pv AS (SELECT p_brand, ng, z,
        |  (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        |     - 0.284496736) * tt + 0.254829592) * tt) * exp(-az * az) AS p
        | FROM (SELECT p_brand, ng, z, az, 1.0 / (1.0 + 0.3275911 * az) AS tt
        |       FROM (SELECT p_brand, ng, z, abs(z) / sqrt(2.0) AS az FROM zs))),
        |mc AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
        |rk AS (SELECT pv.*, m,
        |         row_number() OVER (ORDER BY p ASC, p_brand ASC) AS i
        |       FROM pv CROSS JOIN mc),
        |qv AS (SELECT *,
        |  min(CAST(m AS DOUBLE) * p / CAST(i AS DOUBLE))
        |    OVER (ORDER BY p DESC, p_brand DESC ROWS UNBOUNDED PRECEDING) AS q,
        |  CASE WHEN p <= CAST(i AS DOUBLE) * 0.05 / CAST(m AS DOUBLE)
        |       THEN 1 ELSE 0 END AS pass
        | FROM rk),
        |fin AS (SELECT *, max(pass) OVER (ORDER BY i ASC
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS disc
        |        FROM qv)
        |SELECT p_brand, ng AS n_lines,
        | floor(z * 10000.0 + 0.5) / 10000.0 AS z,
        | floor(p * 10000.0 + 0.5) / 10000.0 AS p_value,
        | floor(q * 10000.0 + 0.5) / 10000.0 AS q_value,
        | disc = 1 AS discovery
        |FROM fin ORDER BY p_brand""".stripMargin,

    "q_par_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |par AS (SELECT doc_id, CAST(i // 20 AS BIGINT) AS par_idx,
        |               array_to_string(ws[(i + 1):(i + 20)], ' ') AS pt
        |        FROM st),
        |keep AS (SELECT doc_id, par_idx,
        |         row_number() OVER (PARTITION BY pt
        |                            ORDER BY doc_id, par_idx) AS rn
        |         FROM par),
        |kept AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |                string_agg(p.pt, ' ' ORDER BY p.par_idx) AS kt
        |         FROM par p JOIN keep k USING (doc_id, par_idx)
        |         WHERE k.rn = 1 GROUP BY p.doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pars
        |        FROM par GROUP BY 1)
        |SELECT t.doc_id, t.n_pars,
        | CAST(t.n_pars - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed,
        | COALESCE(kept.kt, '') AS kept_text
        |FROM tot t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |           FROM documents),
        |st AS (SELECT doc_id, source, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |par AS (SELECT doc_id, source,
        |               array_to_string(ws[(i + 1):(i + 20)], ' ') AS pt
        |        FROM st),
        |pp AS (SELECT source, pt, CAST(count(*) AS BIGINT) AS n_inst,
        |              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM par GROUP BY 1, 2)
        |SELECT source,
        | CAST(sum(n_inst) AS BIGINT) AS n_par_instances,
        | CAST(count(*) AS BIGINT) AS n_distinct_pars,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_boilerplate,
        | floor(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |   AS boilerplate_ratio
        |FROM pp GROUP BY source ORDER BY source""".stripMargin,

    "q_token_budget_mix" ->
      """WITH per AS (SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |  CAST(sum(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS dtoks
        | FROM documents GROUP BY 1),
        |u AS (SELECT source, toks, dtoks,
        |        CAST(dtoks AS DOUBLE) / CAST(toks AS DOUBLE) AS util
        |      FROM per),
        |rk AS (SELECT *,
        |  CAST(row_number() OVER (ORDER BY util DESC, source ASC) AS BIGINT) AS rank,
        |  COALESCE(sum(toks) OVER (ORDER BY util DESC, source ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        | FROM u),
        |al AS (SELECT *,
        |  greatest(0, least(toks, 50000 - cum_before)) AS alloc FROM rk)
        |SELECT source, rank, toks AS tokens_available,
        | floor(util * 10000.0 + 0.5) / 10000.0 AS utility,
        | CAST(alloc AS BIGINT) AS tokens_allocated,
        | floor(CAST(alloc AS DOUBLE) / CAST(toks AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS fill_frac
        |FROM al ORDER BY source""".stripMargin,

    "q_scd2_timeline_join" ->
      """WITH pa AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
        |                   min(o_orderpriority) AS priority
        |            FROM orders GROUP BY 1, 2),
        |a AS (SELECT ck, d AS fa,
        |             lead(d, 1) OVER (PARTITION BY ck ORDER BY d ASC) AS ta,
        |             priority
        |      FROM pa),
        |pb AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
        |              min(o_orderstatus) AS status
        |       FROM orders GROUP BY 1, 2),
        |b AS (SELECT ck, d AS fb,
        |             lead(d, 1) OVER (PARTITION BY ck ORDER BY d ASC) AS tb,
        |             status
        |      FROM pb)
        |SELECT a.ck AS c_custkey,
        | greatest(a.fa, b.fb) AS valid_from,
        | CASE WHEN COALESCE(a.ta, DATE '9999-12-31')
        |           <= COALESCE(b.tb, DATE '9999-12-31')
        |      THEN a.ta ELSE b.tb END AS valid_to,
        | a.priority, b.status
        |FROM a JOIN b ON a.ck = b.ck
        |WHERE a.fa < COALESCE(b.tb, DATE '9999-12-31')
        |  AND b.fb < COALESCE(a.ta, DATE '9999-12-31')
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "q_agg_rewrite" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, yr""".stripMargin,

    "q_moods_median" ->
      """WITH v AS (SELECT (o_orderpriority = '1-URGENT') AS g1,
        |                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |           FROM orders),
        |grain AS (SELECT v.v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grain),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |med AS (SELECT min(v) AS med FROM ps CROSS JOIN tot
        |        WHERE cum0 + c >= (n + 1) // 2),
        |cells AS (SELECT g1,
        |  CAST(sum(CASE WHEN v.v > med THEN 1 ELSE 0 END) AS BIGINT) AS above,
        |  CAST(sum(CASE WHEN v.v <= med THEN 1 ELSE 0 END) AS BIGINT) AS at_below
        | FROM v CROSS JOIN med GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN g1 THEN above END) AS a,
        |  max(CASE WHEN g1 THEN at_below END) AS b,
        |  max(CASE WHEN NOT g1 THEN above END) AS c,
        |  max(CASE WHEN NOT g1 THEN at_below END) AS d
        | FROM cells)
        |SELECT
        | floor(CAST(med AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS median_value,
        | a AS g1_above, b AS g1_at_below, c AS g2_above, d AS g2_at_below,
        | floor(CAST(a + b + c + d AS DOUBLE)
        |       * CAST(a * d - b * c AS DOUBLE)
        |       * CAST(a * d - b * c AS DOUBLE)
        |       / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
        |          * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM w CROSS JOIN med""".stripMargin,

    "q_bartlett" ->
      """WITH g AS (SELECT l_returnflag AS grp,
        |  CAST(count(*) AS BIGINT) AS ng,
        |  CAST(sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg,
        |  CAST(sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS DECIMAL(19,0))
        |                * CAST(floor(l_quantity * 100.0 + 0.5) AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2g
        | FROM lineitem GROUP BY 1),
        |si AS (SELECT grp, ng,
        |  (CAST(ng AS DOUBLE) * CAST(s2g AS DOUBLE)
        |   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |  / (CAST(ng AS DOUBLE) * CAST(ng - 1 AS DOUBLE)) AS si2
        | FROM g),
        |m AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS k,
        |  sum(CAST(CAST(ng - 1 AS DOUBLE) * si2 AS DECIMAL(28,8))) AS sv,
        |  sum(CAST(CAST(ng - 1 AS DOUBLE) * ln(si2) AS DECIMAL(28,8))) AS slog,
        |  sum(CAST(1.0 / CAST(ng - 1 AS DOUBLE) AS DECIMAL(38,18))) AS srec
        | FROM si)
        |SELECT n AS n_total, k AS n_groups,
        | floor(CAST(sv AS DOUBLE) / CAST(n - k AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS pooled_var,
        | floor(((CAST(n - k AS DOUBLE)
        |         * ln(CAST(sv AS DOUBLE) / CAST(n - k AS DOUBLE))
        |         - CAST(slog AS DOUBLE)))
        |       / (1.0 + (CAST(srec AS DOUBLE) - 1.0 / CAST(n - k AS DOUBLE))
        |                / (3.0 * CAST(k - 1 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM m""".stripMargin,

    "q_kpss" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |st AS (SELECT n, z,
        |         sum(z) OVER (ORDER BY d ASC ROWS UNBOUNDED PRECEDING) AS st
        |       FROM z)
        |SELECT max(n) AS n_days,
        | floor(CAST(sum(CAST(CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0))
        |                     AS DECIMAL(38,0))) AS DOUBLE)
        |       / (CAST(max(n) AS DOUBLE)
        |          * CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                          AS DECIMAL(38,0))) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS kpss_stat
        |FROM st""".stripMargin,

    "q_granger" ->
      """WITH rev AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
        | FROM orders GROUP BY 1),
        |qty AS (SELECT CAST(l_shipdate AS DATE) AS d,
        |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
        | FROM lineitem GROUP BY 1),
        |lg AS (SELECT d, y,
        |         lag(y, 1) OVER w AS yl, lag(x, 1) OVER w AS xl
        |       FROM rev JOIN qty USING (d) WINDOW w AS (ORDER BY d ASC)),
        |lagged AS (SELECT * FROM lg WHERE yl IS NOT NULL AND xl IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(yl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
        |  CAST(sum(CAST(xl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1y,
        |  CAST(sum(CAST(CAST(xl AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2y,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(xl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s12,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(yl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s11,
        |  CAST(sum(CAST(CAST(xl AS DECIMAL(19,0)) * CAST(xl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s22,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
        | FROM lagged),
        |cent AS (SELECT n,
        |  CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
        |  CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
        |  CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
        |  CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
        |  CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
        |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
        | FROM m),
        |fit AS (SELECT n, c1y, c2y, cyy, c11,
        |  (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
        |  (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
        | FROM cent),
        |rss AS (SELECT n, b1, b2,
        |  cyy - b1 * c1y - b2 * c2y AS rss_u,
        |  cyy - c1y * c1y / c11 AS rss_r
        | FROM fit)
        |SELECT n AS n_days,
        | floor(b1 * 10000.0 + 0.5) / 10000.0 AS b_rev_lag,
        | floor(b2 * 10000.0 + 0.5) / 10000.0 AS b_qty_lag,
        | floor((rss_r - rss_u) / (rss_u / CAST(n - 3 AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS f_stat
        |FROM rss""".stripMargin,

    "q_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem),
        |e AS (
        |  SELECT x.pk AS a, y.pk AS b FROM items x JOIN items y
        |  ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS lab FROM adj),
        |n1 AS (SELECT adj.v, l0.lab, count(*) AS cnt FROM adj JOIN l0 ON l0.v = adj.u GROUP BY 1, 2),
        |l1 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n1)
        |       WHERE cnt = mc GROUP BY v),
        |n2 AS (SELECT adj.v, l1.lab, count(*) AS cnt FROM adj JOIN l1 ON l1.v = adj.u GROUP BY 1, 2),
        |l2 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n2)
        |       WHERE cnt = mc GROUP BY v),
        |n3 AS (SELECT adj.v, l2.lab, count(*) AS cnt FROM adj JOIN l2 ON l2.v = adj.u GROUP BY 1, 2),
        |l3 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n3)
        |       WHERE cnt = mc GROUP BY v),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |intra AS (SELECT la.lab AS community, CAST(count(*) AS BIGINT) AS e_c
        |          FROM e JOIN l3 la ON la.v = e.a JOIN l3 lb ON lb.v = e.b
        |          WHERE la.lab = lb.lab GROUP BY 1),
        |degc AS (SELECT l3.lab AS community, CAST(count(*) AS BIGINT) AS n_nodes,
        |                CAST(sum(dg) AS BIGINT) AS d_c
        |         FROM l3 JOIN deg ON deg.v = l3.v GROUP BY 1)
        |SELECT community, n_nodes,
        | CAST(COALESCE(e_c, 0) AS BIGINT) AS intra_edges, d_c,
        | floor((CAST(COALESCE(e_c, 0) AS DOUBLE) / CAST(m AS DOUBLE)
        |        - (CAST(d_c AS DOUBLE) / CAST(m * 2 AS DOUBLE))
        |          * (CAST(d_c AS DOUBLE) / CAST(m * 2 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS q_contrib
        |FROM degc LEFT JOIN intra USING (community) CROSS JOIN mm
        |ORDER BY community""".stripMargin,

    "q_rich_club" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem),
        |e AS (SELECT a.pk AS src, b.pk AS dst
        |      FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
        |      GROUP BY 1, 2),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY 1),
        |grain AS (SELECT dg, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |cum AS (SELECT dg, sum(c) OVER (ORDER BY dg ASC
        |          ROWS UNBOUNDED PRECEDING) AS cc FROM grain),
        |pg(pct) AS (VALUES (50), (75), (90), (95)),
        |ks AS (SELECT pct, CAST(min(dg) AS BIGINT) AS k
        |       FROM cum CROSS JOIN tot CROSS JOIN pg
        |       WHERE cc * 100 >= pct * n GROUP BY pct),
        |und AS (SELECT e.src, e.dst, ds.dg AS ds, dd.dg AS dd
        |        FROM e JOIN deg ds ON ds.src = e.src
        |               JOIN deg dd ON dd.src = e.dst
        |        WHERE e.src < e.dst),
        |nk AS (SELECT pct, k,
        |         CAST(sum(CASE WHEN dg > k THEN 1 ELSE 0 END) AS BIGINT) AS n_k
        |       FROM deg CROSS JOIN ks GROUP BY 1, 2),
        |ek AS (SELECT pct, k,
        |         CAST(sum(CASE WHEN least(ds, dd) > k THEN 1 ELSE 0 END) AS BIGINT) AS e_k
        |       FROM und CROSS JOIN ks GROUP BY 1, 2)
        |SELECT CAST(pct AS BIGINT) AS pct, k, n_k, e_k,
        | CASE WHEN n_k >= 2
        |      THEN floor(CAST(e_k * 2 AS DOUBLE) / CAST(n_k * (n_k - 1) AS DOUBLE)
        |                 * 10000.0 + 0.5) / 10000.0 END AS phi
        |FROM nk JOIN ek USING (pct, k) ORDER BY pct""".stripMargin,

    "q_forecast_acc" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |lg AS (SELECT y, lag(y, 7) OVER w AS f7, lag(y, 1) OVER w AS f1
        |       FROM daily WINDOW w AS (ORDER BY d ASC))
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        | CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_forecast,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL THEN abs(y - f7) ELSE 0 END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS mae,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL
        |   THEN CAST(CAST(abs(y - f7) AS DOUBLE) / CAST(y AS DOUBLE) AS DECIMAL(38,18))
        |   ELSE CAST(0 AS DECIMAL(38,18)) END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS mape,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL
        |   THEN CAST(CAST(abs(y - f7) * 2 AS DOUBLE) / CAST(y + f7 AS DOUBLE) AS DECIMAL(38,18))
        |   ELSE CAST(0 AS DECIMAL(38,18)) END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS smape,
        | floor((CAST(sum(CASE WHEN f7 IS NOT NULL THEN abs(y - f7) ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE))
        |       / (CAST(sum(CASE WHEN f1 IS NOT NULL THEN abs(y - f1) ELSE 0 END) AS DOUBLE)
        |          / CAST(sum(CASE WHEN f1 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS mase
        |FROM lg""".stripMargin,

    "q_ar2_yw" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |lg AS (SELECT n, z, lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2
        |       FROM z WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT max(n) AS n_days,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c0,
        |  CAST(sum(CASE WHEN z1 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c1,
        |  CAST(sum(CASE WHEN z2 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c2
        | FROM lg),
        |r AS (SELECT n_days,
        |        CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
        |        CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2 FROM m),
        |f AS (SELECT n_days, r1, r2,
        |        r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
        |        (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2 FROM r)
        |SELECT n_days,
        | floor(r1 * 10000.0 + 0.5) / 10000.0 AS acf1,
        | floor(r2 * 10000.0 + 0.5) / 10000.0 AS acf2,
        | floor(phi1 * 10000.0 + 0.5) / 10000.0 AS phi1,
        | floor(phi2 * 10000.0 + 0.5) / 10000.0 AS phi2,
        | floor((1.0 - phi1 * r1 - phi2 * r2) * 10000.0 + 0.5) / 10000.0
        |   AS innov_var_ratio
        |FROM f""".stripMargin,

    "q_gtest" ->
      """WITH o AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |                  CAST(count(*) AS BIGINT) AS obs
        |           FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, CAST(sum(obs) AS BIGINT) AS rn FROM o GROUP BY 1),
        |ct AS (SELECT st, CAST(sum(obs) AS BIGINT) AS cn FROM o GROUP BY 1),
        |nn AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
        |              CAST(count(DISTINCT pr) AS BIGINT) AS npr,
        |              CAST(count(DISTINCT st) AS BIGINT) AS nst FROM o),
        |terms AS (SELECT n, npr, nst,
        |  CASE WHEN obs > 0
        |       THEN CAST(CAST(obs AS DOUBLE)
        |                 * ln(CAST(obs AS DOUBLE) * CAST(n AS DOUBLE)
        |                      / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)))
        |                 AS DECIMAL(28,8))
        |       ELSE CAST(0 AS DECIMAL(28,8)) END AS term
        | FROM o JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN nn)
        |SELECT n AS n_total, (npr - 1) * (nst - 1) AS dof,
        | floor(CAST(sum(term) AS DOUBLE) * 2.0 * 10000.0 + 0.5) / 10000.0 AS g_stat
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "q_split_leakage" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |fp AS (SELECT doc_id,
        |  array_to_string(ws[(i + 1):(i + 20)], ' ') AS fp,
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  CASE WHEN doc_id % 10 < 8 THEN 0
        |       WHEN doc_id % 10 = 8 THEN 1 ELSE 2 END AS rk
        | FROM st),
        |sets AS (SELECT DISTINCT fp, split, rk FROM fp),
        |pairs AS (SELECT a.fp, a.split AS split_a, b.split AS split_b
        |          FROM sets a JOIN sets b ON a.fp = b.fp AND a.rk < b.rk),
        |shared AS (SELECT split_a, split_b,
        |                  CAST(count(DISTINCT fp) AS BIGINT) AS n_shared_fps
        |           FROM pairs GROUP BY 1, 2),
        |leaked AS (SELECT a.split AS split_a, d.split AS split_b,
        |                  CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_leaked_docs
        |           FROM fp d JOIN sets a ON a.fp = d.fp AND a.rk < d.rk
        |           GROUP BY 1, 2)
        |SELECT split_a, split_b,
        | COALESCE(n_shared_fps, 0) AS n_shared_fps,
        | COALESCE(n_leaked_docs, 0) AS n_leaked_docs
        |FROM shared FULL OUTER JOIN leaked USING (split_a, split_b)
        |ORDER BY split_a, split_b""".stripMargin,

    "q_ndcg" ->
      """WITH wl AS (SELECT doc_id, text,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
        | FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(len) AS BIGINT) AS sum_len FROM wl),
        |tf AS (SELECT doc_id, len, t AS term, CAST(count(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, len, unnest(string_split(lower(text), ' ')) AS t
        |             FROM wl)
        |       WHERE t IN ('join', 'hash', 'scan') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |  floor(CAST(sum(CAST(
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |             / (CAST(df AS DOUBLE) + 0.5))
        |    * (CAST(tf AS DOUBLE) * 2.2)
        |    / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE)
        |         / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |    AS DECIMAL(28,8))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS bm25
        | FROM tf JOIN dfreq USING (term) CROSS JOIN st GROUP BY doc_id),
        |topk AS (SELECT doc_id, bm25,
        |           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS i
        |         FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT 20),
        |rel AS (SELECT doc_id,
        |  (len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) >= 3
        |   AND len(list_filter(string_split(lower(text), ' '), x -> x = 'hash')) >= 3
        |   AND len(list_filter(string_split(lower(text), ' '), x -> x = 'scan')) >= 3)
        |    AS relevant
        | FROM documents),
        |tot AS (SELECT CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS r
        |        FROM rel),
        |scored AS (SELECT
        |  sum(CASE WHEN relevant
        |       THEN CAST(1.0 / log2(CAST(i AS DOUBLE) + 1.0) AS DECIMAL(28,8))
        |       ELSE CAST(0 AS DECIMAL(28,8)) END) AS dcg,
        |  CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS hits
        | FROM topk JOIN rel USING (doc_id)),
        |ig AS (SELECT r, unnest(generate_series(1, least(20, CAST(r AS INT)))) AS i
        |       FROM tot),
        |idcg AS (SELECT r,
        |  sum(CAST(1.0 / log2(CAST(i AS DOUBLE) + 1.0) AS DECIMAL(28,8))) AS idcg
        | FROM ig GROUP BY r)
        |SELECT CAST(20 AS BIGINT) AS k, r AS n_relevant_total,
        | hits AS n_relevant_topk,
        | floor(CAST(dcg AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS dcg,
        | floor(CAST(idcg AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS idcg,
        | floor(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS ndcg,
        | floor(CAST(hits AS DOUBLE) / 20.0 * 10000.0 + 0.5) / 10000.0
        |   AS precision_k,
        | floor(CAST(hits AS DOUBLE) / CAST(r AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS recall_k
        |FROM scored CROSS JOIN idcg""".stripMargin,

    "q_distinctive_terms" ->
      """WITH cells AS (SELECT source, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |totals AS (SELECT source, CAST(sum(tf) AS BIGINT) AS total
        |           FROM cells GROUP BY 1),
        |tfc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM cells GROUP BY 1),
        |grand AS (SELECT CAST(sum(tf) AS BIGINT) AS g FROM cells),
        |scored AS (SELECT source, term, tf,
        |  floor((CAST(tf AS DOUBLE) / CAST(total AS DOUBLE))
        |        / (CAST(ctf AS DOUBLE) / CAST(g AS DOUBLE)) * 10000.0 + 0.5)
        |    / 10000.0 AS lift
        | FROM cells JOIN totals USING (source) JOIN tfc USING (term)
        |      CROSS JOIN grand),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
        |         ORDER BY lift DESC, term ASC) AS BIGINT) AS rank
        |       FROM scored)
        |SELECT source, rank, term, tf, lift FROM rk
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,

    "q_ks_normal" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |           FROM orders),
        |grain AS (SELECT v.v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(CAST(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        | FROM v),
        |mu AS (SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |  sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |       / CAST(n AS DOUBLE)) AS sigma FROM m),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |gaps AS (SELECT n, mu, sigma,
        |  CAST(cum0 + c AS DOUBLE) / CAST(n AS DOUBLE) AS fhi,
        |  CAST(cum0 AS DOUBLE) / CAST(n AS DOUBLE) AS flo,
        |  CASE WHEN z >= 0.0 THEN 1.0 - 0.5 * tail ELSE 0.5 * tail END AS phi
        | FROM (SELECT *,
        |   (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        |      - 0.284496736) * tt + 0.254829592) * tt) * exp(-az * az) AS tail
        |  FROM (SELECT *, 1.0 / (1.0 + 0.3275911 * az) AS tt
        |   FROM (SELECT ps.*, n, mu, sigma,
        |           (CAST(v AS DOUBLE) - mu) / sigma AS z,
        |           abs((CAST(v AS DOUBLE) - mu) / sigma) / sqrt(2.0) AS az
        |         FROM ps CROSS JOIN mu))))
        |SELECT max(n) AS n_orders,
        | floor(max(mu) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_value,
        | floor(max(sigma) / 100.0 * 10000.0 + 0.5) / 10000.0 AS sd_value,
        | floor(max(greatest(abs(fhi - phi), abs(flo - phi)))
        |       * 10000.0 + 0.5) / 10000.0 AS d_stat,
        | floor(sqrt(CAST(max(n) AS DOUBLE))
        |       * max(greatest(abs(fhi - phi), abs(flo - phi)))
        |       * 10000.0 + 0.5) / 10000.0 AS sqrt_n_d
        |FROM gaps""".stripMargin,

    "q_power_analysis" ->
      """WITH c AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        | FROM events),
        |p AS (SELECT n_events, purchases,
        |        CAST(purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS p1
        |      FROM c),
        |x AS (SELECT *, p1 * 1.1 AS p2, (p1 + p1 * 1.1) / 2.0 AS pbar FROM p),
        |nr AS (SELECT *,
        |  pow(1.959963985 * sqrt(2.0 * pbar * (1.0 - pbar))
        |      + 0.8416212336 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
        |  / ((p2 - p1) * (p2 - p1)) AS nraw
        | FROM x)
        |SELECT n_events, purchases AS n_purchases,
        | floor(p1 * 10000.0 + 0.5) / 10000.0 AS baseline_rate,
        | floor(p2 * 10000.0 + 0.5) / 10000.0 AS target_rate,
        | CAST(ceil(nraw) AS BIGINT) AS n_per_arm,
        | CAST(ceil(nraw) * 2 AS BIGINT) AS n_total
        |FROM nr""".stripMargin,

    "q_emb_dim_var" ->
      """WITH ex AS (
        |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim_idx,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings),
        |per AS (SELECT dim_idx, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(CAST(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        | FROM ex GROUP BY 1),
        |v AS (SELECT dim_idx, n, s,
        |  (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS varq
        | FROM per),
        |tot AS (SELECT sum(CAST(varq AS DECIMAL(28,8))) AS tv FROM v)
        |SELECT dim_idx,
        | floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 * 10000.0 + 0.5)
        |   / 10000.0 AS mean,
        | floor(varq / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS variance,
        | floor(varq / CAST(tv AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS var_share
        |FROM v CROSS JOIN tot ORDER BY dim_idx""".stripMargin,

    "q_calibration_bins" ->
      """WITH f AS (
        |  SELECT (lang = 'en') AS truth_en,
        |    least(1.0,
        |      CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |           + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b'))
        |           AS DOUBLE)
        |      * 100.0 / CAST(length(text) AS DOUBLE) / 6.0) AS p_hat
        |  FROM documents),
        |b AS (SELECT least(9, CAST(floor(p_hat * 10.0) AS BIGINT)) AS bin,
        |             p_hat, truth_en
        |      FROM f)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        | floor(CAST(sum(CAST(p_hat AS DECIMAL(38,18))) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg_score,
        | floor(CAST(sum(CASE WHEN truth_en THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS obs_rate,
        | floor(abs(CAST(sum(CAST(p_hat AS DECIMAL(38,18))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE)
        |           - CAST(sum(CASE WHEN truth_en THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS gap
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_llr_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, t.w AS word, t.pos
        |  FROM (SELECT doc_id,
        |          unnest(string_split(lower(text), ' ')) AS w,
        |          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |        FROM documents) t(doc_id, w, pos)),
        |pairs AS (
        |  SELECT word AS w1,
        |         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM toks),
        |pp AS (SELECT w1, w2 FROM pairs
        |       WHERE length(w1) > 0 AND w2 IS NOT NULL AND length(w2) > 0),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
        |        FROM pp GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(count(*) AS BIGINT) AS r1 FROM pp GROUP BY 1),
        |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS c1 FROM pp GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pp),
        |cells AS (SELECT w1, w2, k11, r1, c1, nn,
        |            r1 - k11 AS k12, c1 - k11 AS k21,
        |            nn - r1 - c1 + k11 AS k22
        |          FROM big JOIN lft USING (w1) JOIN rgt USING (w2)
        |          CROSS JOIN tot),
        |scored AS (SELECT w1, w2, k11,
        |  (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)
        |     * ln(CAST(k11 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)
        |     * ln(CAST(k12 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)
        |     * ln(CAST(k21 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)
        |     * ln(CAST(k22 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END)
        |  * 2.0 AS llr
        | FROM cells)
        |SELECT w1, w2, k11 AS n_pair,
        | floor(llr * 10000.0 + 0.5) / 10000.0 AS llr
        |FROM scored
        |ORDER BY floor(llr * 10000.0 + 0.5) / 10000.0 DESC, w1 ASC, w2 ASC
        |LIMIT 20""".stripMargin,

    "q_customer_migration" ->
      """WITH cm AS (
        |  SELECT o_custkey AS ck,
        |         year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |         CASE WHEN count(*) >= 3 THEN 'heavy'
        |              WHEN count(*) = 2 THEN 'regular' ELSE 'light' END AS cls
        |  FROM orders GROUP BY 1, 2),
        |tr AS (SELECT cls,
        |         lead(mi, 1) OVER w AS mi_next,
        |         lead(cls, 1) OVER w AS cls_next, mi
        |       FROM cm WINDOW w AS (PARTITION BY ck ORDER BY mi ASC))
        |SELECT cls AS class_from, cls_next AS class_to,
        | CAST(count(*) AS BIGINT) AS n_transitions
        |FROM tr WHERE mi_next = mi + 1
        |GROUP BY 1, 2 ORDER BY class_from, class_to""".stripMargin,

    "q_hourly_profile" ->
      """WITH ev AS (
        |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
        |         ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow
        |  FROM events),
        |o AS (SELECT dow, hour, CAST(count(*) AS BIGINT) AS n
        |      FROM ev GROUP BY 1, 2),
        |rt AS (SELECT dow, CAST(sum(n) AS BIGINT) AS rn FROM o GROUP BY 1),
        |ct AS (SELECT hour, CAST(sum(n) AS BIGINT) AS cn FROM o GROUP BY 1),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
        | floor(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(total AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS expected,
        | floor((CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
        |          / CAST(total AS DOUBLE))
        |       * (CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
        |          / CAST(total AS DOUBLE))
        |       / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(total AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
        |FROM o JOIN rt USING (dow) JOIN ct USING (hour) CROSS JOIN nn
        |ORDER BY dow, hour""".stripMargin,

    "q_poisson_bootstrap" ->
      """WITH rows_ AS (SELECT o_orderkey AS k,
        |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        | FROM orders),
        |full_ AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |                 CAST(count(*) AS BIGINT) AS n FROM rows_),
        |reps AS (SELECT unnest(generate_series(0, 100 - 1)) AS rep),
        |wts AS (SELECT rep,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.9196986029286058 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       ELSE 5 END AS w, x
        | FROM (SELECT rep, x,
        |         CAST(((k % 1048576) * 489905 + rep * 40503 + 7) % 1048576
        |              AS DOUBLE) / 1048576.0 AS u
        |       FROM rows_ CROSS JOIN reps)),
        |rm AS (SELECT rep,
        |         CAST(sum(w * x) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
        |       FROM wts GROUP BY rep),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m ASC, rep ASC) AS i FROM rm),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |  sum(CAST(m AS DECIMAL(38,18))) AS sm,
        |  sum(CAST(m * m AS DECIMAL(38,18))) AS sm2 FROM rm),
        |ci AS (SELECT min(m) AS lo, max(m) AS hi FROM rk
        |       WHERE i IN (CAST(ceil(0.025 * 100) AS BIGINT),
        |                   CAST(ceil(0.975 * 100) AS BIGINT)))
        |SELECT nb AS n_replicates,
        | floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS mean_value,
        | floor(lo / 100.0 * 10000.0 + 0.5) / 10000.0 AS ci_lo,
        | floor(hi / 100.0 * 10000.0 + 0.5) / 10000.0 AS ci_hi,
        | floor(sqrt((CAST(sm2 AS DOUBLE)
        |             - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE))
        |            / CAST(nb - 1 AS DOUBLE)) / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS se
        |FROM ci CROSS JOIN st CROSS JOIN full_""".stripMargin,

    "q_page_trend" ->
      """WITH cells AS (
        |  SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS q,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |complete AS (SELECT yr FROM cells GROUP BY yr HAVING count(*) = 4),
        |ranked AS (SELECT c.yr, c.q,
        |  CAST(row_number() OVER (PARTITION BY c.yr
        |         ORDER BY c.rev ASC, c.q ASC) AS BIGINT) AS rk
        | FROM cells c JOIN complete USING (yr)),
        |rsums AS (SELECT q, CAST(sum(rk) AS BIGINT) AS rj,
        |                 CAST(count(*) AS BIGINT) AS nb
        |          FROM ranked GROUP BY q),
        |agg AS (SELECT max(nb) AS b, CAST(count(*) AS BIGINT) AS k,
        |               CAST(sum(q * rj) AS BIGINT) AS l
        |        FROM rsums)
        |SELECT b AS n_blocks, k AS k_treatments, l AS l_stat,
        | floor((12.0 * CAST(l AS DOUBLE)
        |        - 3.0 * CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
        |          * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE))
        |       / sqrt(CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
        |              * CAST(k + 1 AS DOUBLE)
        |              * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))
        |       * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_snapshot_reconcile" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS f,
        |             lead(ts_us) OVER w AS t
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |a AS (SELECT user_id, event_id AS v1 FROM v
        |      WHERE f <= 1704844800000000
        |        AND (t IS NULL OR t > 1704844800000000)),
        |b AS (SELECT user_id, event_id AS v2 FROM v
        |      WHERE f <= 1705276800000000
        |        AND (t IS NULL OR t > 1705276800000000))
        |SELECT
        | CAST(sum(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        | CAST(sum(CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t2,
        | CAST(sum(CASE WHEN v1 IS NULL AND v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        | CAST(sum(CASE WHEN v1 IS NOT NULL AND v2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | CAST(sum(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL AND v1 <> v2
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        | CAST(sum(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM a FULL OUTER JOIN b USING (user_id)""".stripMargin,

    "q_cooks_distance" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT d, CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxxc
        | FROM m),
        |resid AS (SELECT d, y, n,
        |  CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)) AS e,
        |  1.0 / CAST(n AS DOUBLE)
        |    + (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) / sxxc AS h
        | FROM pts CROSS JOIN fit),
        |s2 AS (SELECT CAST(sum(CAST(e * e AS DECIMAL(38,8))) AS DOUBLE)
        |              / CAST(max(n) - 2 AS DOUBLE) AS s2 FROM resid)
        |SELECT d AS day,
        | floor(CAST(y AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(e / 100.0 * 10000.0 + 0.5) / 10000.0 AS residual,
        | floor(h * 10000.0 + 0.5) / 10000.0 AS leverage,
        | floor(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
        |       * 10000.0 + 0.5) / 10000.0 AS cooks_d
        |FROM resid CROSS JOIN s2
        |ORDER BY floor(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
        |               * 10000.0 + 0.5) / 10000.0 DESC, day ASC
        |LIMIT 10""".stripMargin,

    "q_prediction_interval" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, max(x) AS xmax,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n, xmax,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxxc
        | FROM m),
        |sse AS (SELECT CAST(sum(CAST(
        |    (CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)))
        |    * (CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)))
        |    AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sse
        | FROM pts CROSS JOIN fit),
        |fin AS (SELECT n, xmax, b, my, mx, sxxc,
        |  CAST(xmax + 1 AS DOUBLE) AS x0,
        |  sqrt(CAST(sse AS DOUBLE) / CAST(n - 2 AS DOUBLE)) AS s
        | FROM fit CROSS JOIN sse),
        |o AS (SELECT n, xmax,
        |  my + b * (x0 - mx) AS yhat,
        |  s * sqrt(1.0 + 1.0 / CAST(n AS DOUBLE) + (x0 - mx) * (x0 - mx) / sxxc) AS sep
        | FROM fin)
        |SELECT n AS n_days, CAST(xmax + 1 AS BIGINT) AS x0_day,
        | floor(yhat / 100.0 * 10000.0 + 0.5) / 10000.0 AS forecast,
        | floor((yhat - 1.959963985 * sep) / 100.0 * 10000.0 + 0.5) / 10000.0 AS pi_lo,
        | floor((yhat + 1.959963985 * sep) / 100.0 * 10000.0 + 0.5) / 10000.0 AS pi_hi
        |FROM o""".stripMargin,

    "q_trimmed_mean" ->
      """WITH grain AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |ps AS (SELECT grp, v, c,
        |         COALESCE(sum(c) OVER (PARTITION BY grp ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |       FROM grain),
        |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM grain GROUP BY 1),
        |eff AS (SELECT ps.grp, v, n, n // 20 AS g,
        |          greatest(least(lo + c, n - n // 20) - greatest(lo, n // 20), 0)
        |            AS ceff
        |        FROM ps JOIN tot ON ps.grp = tot.grp)
        |SELECT grp AS l_returnflag, max(n) AS n,
        | CAST(max(g) AS BIGINT) AS n_trimmed_each,
        | floor(CAST(sum(ceff * v) AS DOUBLE) / CAST(sum(ceff) AS DOUBLE)
        |       / 100.0 * 10000.0 + 0.5) / 10000.0 AS trimmed_mean
        |FROM eff GROUP BY grp ORDER BY l_returnflag""".stripMargin,

    "q_cliffs_delta" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        |  FROM orders),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(ga) AS BIGINT) AS cnta
        |         FROM o GROUP BY v),
        |cum AS (SELECT v, cnt, cnta,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |agg AS (SELECT sum(cnta) AS na, sum(cnt) AS n,
        |               sum(cnta * (2 * cumb + cnt + 1)) AS w2a
        |        FROM cum),
        |d AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |        CAST(w2a - na * (na + 1) AS DOUBLE)
        |          / (CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)) - 1.0 AS delta
        |      FROM agg)
        |SELECT n_a, n_b,
        | floor(delta * 10000.0 + 0.5) / 10000.0 AS cliffs_delta,
        | CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |      WHEN abs(delta) < 0.33 THEN 'small'
        |      WHEN abs(delta) < 0.474 THEN 'medium'
        |      ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,

    "q_pit_features" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |                  CAST(o_orderdate AS DATE) AS d,
        |                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT o_orderkey, o_custkey,
        | CAST(COALESCE(count(*) OVER wp, 0) AS BIGINT) AS prior_n_orders,
        | floor(CAST(COALESCE(sum(cents) OVER wp, 0) AS DOUBLE) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS prior_revenue,
        | CAST(date_diff('day', lag(d, 1) OVER wo, d) AS BIGINT) AS days_since_prev
        |FROM o
        |WINDOW wo AS (PARTITION BY o_custkey ORDER BY d ASC, o_orderkey ASC),
        |       wp AS (PARTITION BY o_custkey ORDER BY d ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_target_encoding" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |         p_brand,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_brand, CAST(sum(x) AS BIGINT) AS sg,
        |             CAST(count(*) AS BIGINT) AS ng
        |      FROM li GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS s,
        |               CAST(count(*) AS BIGINT) AS n FROM li)
        |SELECT l_orderkey, l_linenumber, p_brand,
        | floor(CAST(x AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS quantity,
        | floor(CASE WHEN ng > 1
        |            THEN CAST(sg - x AS DOUBLE) / CAST(ng - 1 AS DOUBLE)
        |            ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END
        |       / 100.0 * 10000.0 + 0.5) / 10000.0 AS loo_encoding
        |FROM li JOIN g USING (p_brand) CROSS JOIN tot
        |WHERE l_orderkey % 97 = 0
        |ORDER BY l_orderkey, l_linenumber, p_brand, quantity""".stripMargin,

    "q_fk_cardinality" ->
      """WITH e1 AS (
        |  SELECT 'lineitem -> orders' AS fk_edge,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_parents,
        |    CAST(count(*) AS BIGINT) AS n_parents_with_children,
        |    CAST(sum(nc) AS BIGINT) AS n_children,
        |    CAST(min(nc) AS BIGINT) AS min_children,
        |    CAST(max(nc) AS BIGINT) AS max_children
        |  FROM (SELECT l_orderkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e2 AS (
        |  SELECT 'lineitem -> part',
        |    (SELECT CAST(count(*) AS BIGINT) FROM part),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT l_partkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e3 AS (
        |  SELECT 'lineitem -> supplier',
        |    (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT l_suppkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e4 AS (
        |  SELECT 'orders -> customer',
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT o_custkey, count(*) AS nc FROM orders GROUP BY 1)),
        |e5 AS (
        |  SELECT 'customer -> nation',
        |    (SELECT CAST(count(*) AS BIGINT) FROM nation),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT c_nationkey, count(*) AS nc FROM customer GROUP BY 1)),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |      UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
        |      UNION ALL SELECT * FROM e5)
        |SELECT fk_edge, n_parents, n_parents_with_children,
        | CAST(n_parents - n_parents_with_children AS BIGINT) AS n_childless,
        | n_children, min_children, max_children,
        | floor(CAST(n_children AS DOUBLE) / CAST(n_parents_with_children AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS avg_children
        |FROM u ORDER BY fk_edge""".stripMargin,

    "q_shapley_attribution" ->
      """WITH users AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |pm AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS nconv
        |       FROM users GROUP BY mask),
        |lat AS (SELECT unnest(generate_series(0, 15)) AS s),
        |v AS (SELECT s, CAST(COALESCE(sum(nconv), 0) AS BIGINT) AS v
        |      FROM lat LEFT JOIN pm ON (pm.mask & lat.s) = pm.mask
        |      GROUP BY s),
        |ch(channel, bit) AS (VALUES ('view', 1), ('click', 2),
        |                            ('signup', 4), ('error', 8)),
        |pairs AS (SELECT channel, v0.s AS s, v0.v AS v_s, v1.v AS v_s1,
        |            CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |                 WHEN 2 THEN 2 ELSE 6 END AS w24
        |          FROM ch CROSS JOIN v v0
        |          JOIN v v1 ON v1.s = v0.s + bit
        |          WHERE (v0.s & bit) = 0),
        |tot AS (SELECT
        |  (SELECT v FROM v WHERE s = 15) AS v_full,
        |  (SELECT v FROM v WHERE s = 0) AS v_empty)
        |SELECT channel,
        | floor(CAST(sum(w24 * (v_s1 - v_s)) AS DOUBLE) / 24.0
        |       * 10000.0 + 0.5) / 10000.0 AS shapley_conversions,
        | floor(CAST(sum(w24 * (v_s1 - v_s)) AS DOUBLE) / 24.0
        |       / CAST(v_full - v_empty AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |   AS credit_share
        |FROM pairs CROSS JOIN tot
        |GROUP BY channel, v_full, v_empty ORDER BY channel""".stripMargin,

    "q_raking_ipf" ->
      """WITH cells AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |                      CAST(count(*) AS BIGINT) AS obs
        |               FROM orders GROUP BY 1, 2),
        |dims AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
        |                CAST(count(DISTINCT pr) AS BIGINT) AS npr,
        |                CAST(count(DISTINCT st) AS BIGINT) AS nst FROM cells),
        |w0 AS (SELECT pr, st, obs, n, npr, nst, CAST(obs AS DOUBLE) AS w
        |       FROM cells CROSS JOIN dims),
        |r1 AS (SELECT w0.*, w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM w0),
        |c1 AS (SELECT r1.* EXCLUDE (w, w1), w1 AS wx,
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r1),
        |r2 AS (SELECT c1.* EXCLUDE (wx), w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM c1),
        |c2 AS (SELECT r2.* EXCLUDE (w, w1),
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r2),
        |r3 AS (SELECT c2.*, w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM c2),
        |c3 AS (SELECT r3.* EXCLUDE (w, w1),
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r3)
        |SELECT pr, st, obs,
        | floor(w * 10000.0 + 0.5) / 10000.0 AS raked_weight,
        | floor(w / CAST(obs AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS weight_ratio
        |FROM c3 ORDER BY pr, st""".stripMargin,

    "q_lorenz_points" ->
      """WITH per AS (SELECT o_custkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        | FROM orders GROUP BY 1),
        |grain AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s
        |        FROM per),
        |dec_ AS (SELECT n, s, unnest(generate_series(1, 10)) AS decile FROM tot),
        |dk AS (SELECT decile, n, s, (decile * n) // 10 AS k FROM dec_)
        |SELECT decile, CAST(k AS BIGINT) AS n_customers,
        | floor(CAST(sum(least(c, k - cum0) * v) AS DOUBLE) / CAST(s AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_revenue_share
        |FROM dk JOIN ps ON cum0 < k
        |GROUP BY decile, k, s ORDER BY decile""".stripMargin,

    "q_uniform_sample_k" ->
      """SELECT doc_id, lang, source,
        | CAST((doc_id * 48271 + 11) % 1000003 AS BIGINT) AS h
        |FROM documents
        |ORDER BY h ASC, doc_id ASC LIMIT 100""".stripMargin,

    "q_cohens_kappa" ->
      """WITH f AS (
        |  SELECT (lang = 'en') AS truth_en,
        |    (CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |          + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS DOUBLE)
        |     * 100.0 / CAST(length(text) AS DOUBLE) >= 3.0) AS pred_en
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN truth_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN NOT truth_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |  CAST(sum(CASE WHEN truth_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |  CAST(sum(CASE WHEN NOT truth_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n00
        | FROM f)
        |SELECT n AS n_docs, n11 AS both_en, n01 AS pred_only,
        | n10 AS truth_only, n00 AS both_other,
        | floor(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS p_observed,
        | floor((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |        + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 10000.0 + 0.5)
        |   / 10000.0 AS p_expected,
        | floor((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |           + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |       / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |                 + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS kappa
        |FROM c""".stripMargin,

    "q_cos_sim_hist" ->
      """WITH o(ofs) AS (VALUES (1), (17), (257)),
        |a AS (SELECT vec_id,
        |             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
        |                        + 0.5) AS BIGINT) AS qv,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings),
        |aa AS (SELECT a.vec_id AS a_id, o.ofs, a.vec_id + o.ofs AS b_id,
        |              a.i, a.qv AS qa
        |       FROM a CROSS JOIN o),
        |p AS (SELECT aa.a_id, aa.ofs, aa.qa, b.qv AS qb
        |      FROM aa JOIN a b ON b.vec_id = aa.b_id AND b.i = aa.i),
        |d AS (SELECT a_id, ofs, CAST(sum(qa * qb) AS BIGINT) AS dp,
        |             CAST(sum(qa * qa) AS BIGINT) AS na2,
        |             CAST(sum(qb * qb) AS BIGINT) AS nb2
        |      FROM p GROUP BY 1, 2),
        |c AS (SELECT ofs,
        |        floor(floor(CAST(dp AS DOUBLE)
        |                    / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
        |                    * 10000.0 + 0.5) / 10000.0
        |              * 10.0 + 10.0) AS bin
        |      FROM d)
        |SELECT CAST(ofs AS BIGINT) AS ofs, CAST(bin AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM c GROUP BY 1, 2 ORDER BY ofs, bin""".stripMargin,

    "q_embed_outliers" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings),
        |st AS (SELECT pos, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s
        |       FROM ex GROUP BY pos),
        |d AS (SELECT vec_id,
        |        CAST(sum(CAST(CAST(n * q - s AS DECIMAL(19,0))
        |                      * CAST(n * q - s AS DECIMAL(19,0))
        |                      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n2d2,
        |        max(n) AS n
        |      FROM ex JOIN st USING (pos) GROUP BY vec_id)
        |SELECT vec_id,
        | floor(CAST(n2d2 AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
        |       / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS dist_sq
        |FROM d ORDER BY n2d2 DESC, vec_id LIMIT 20""".stripMargin,

    "q_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        |       FROM daily),
        |cx AS (SELECT d, CAST(n * cents - s AS DECIMAL(19,0)) AS cx
        |       FROM daily CROSS JOIN st),
        |led AS (SELECT cx,
        |          lead(cx, 1) OVER w AS c1, lead(cx, 2) OVER w AS c2,
        |          lead(cx, 3) OVER w AS c3
        |        FROM cx WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT CAST(sum(CAST(cx * cx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS den,
        |             CAST(sum(CAST(cx * c1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n1,
        |             CAST(sum(CAST(cx * c2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n2,
        |             CAST(sum(CAST(cx * c3 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n3
        |      FROM led),
        |r AS (SELECT CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
        |             CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
        |             CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
        |      FROM m),
        |p2 AS (SELECT r1, r2, r3, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM r),
        |p3 AS (SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM p2)
        |SELECT floor(r1 * 10000.0 + 0.5) / 10000.0 AS acf1,
        |       floor(r2 * 10000.0 + 0.5) / 10000.0 AS acf2,
        |       floor(r3 * 10000.0 + 0.5) / 10000.0 AS acf3,
        |       floor(r1 * 10000.0 + 0.5) / 10000.0 AS pacf1,
        |       floor(p22 * 10000.0 + 0.5) / 10000.0 AS pacf2,
        |       floor((r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
        |             * 10000.0 + 0.5) / 10000.0 AS pacf3
        |FROM p3""".stripMargin,

    "q_cross_corr" ->
      """WITH xs AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        |  FROM orders GROUP BY 1),
        |ys AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d2,
        |         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS yc
        |  FROM lineitem GROUP BY 1),
        |paired AS (
        |  SELECT lag, xc, yc FROM (
        |    SELECT d, xc, unnest(generate_series(-3, 3)) AS lag FROM xs) x
        |  JOIN ys ON ys.d2 = x.d + CAST(x.lag AS INTEGER)),
        |m AS (
        |  SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |         CAST(sum(CAST(yc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |         CAST(sum(CAST(CAST(xc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |         CAST(sum(CAST(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |         CAST(sum(CAST(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
        |  FROM paired GROUP BY 1)
        |SELECT lag, n_days,
        | floor((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |              * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS xcorr
        |FROM m ORDER BY lag""".stripMargin,

    "q_mcnemar" ->
      """WITH flags AS (
        |  SELECT o_custkey,
        |         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS b
        |  FROM orders GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |             CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
        |             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
        |             CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        |      FROM flags)
        |SELECT n_pairs, n_both, a_only, b_only, n_neither,
        | floor(CAST((abs(a_only - b_only) - 1) * (abs(a_only - b_only) - 1) AS DOUBLE)
        |       / CAST(a_only + b_only AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chi2_cc
        |FROM c""".stripMargin,

    "q_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         greatest(CAST(1 AS BIGINT),
        |                  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
        |           AS n_sentences,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |           AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        | floor((206.835
        |        - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |        - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS flesch
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_scd6" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'signup')
        |SELECT user_id,
        | CAST(row_number() OVER w AS BIGINT) AS version_n,
        | ts_us AS valid_from_us,
        | lead(ts_us) OVER w AS valid_to_us,
        | cents,
        | lag(cents) OVER w AS prior_cents,
        | last_value(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS current_cents,
        | (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version_n""".stripMargin,

    "q_audit_dim" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS batch_month,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS total_price,
        | CAST(sum((o_orderkey * 1000003 + o_custkey) % 2147483647) AS BIGINT)
        |   AS content_checksum
        |FROM orders GROUP BY 1 ORDER BY batch_month""".stripMargin,

    "q_hits" ->
      """WITH nx AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
        |  FROM lineitem),
        |e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |      FROM nx WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2),
        |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |h0 AS MATERIALIZED (SELECT node, 1000000000000 // n AS h FROM nodes CROSS JOIN nn),
        |ar1 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h0 JOIN e ON h0.node = e.src GROUP BY dst),
        |sa1 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar1),
        |a1 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa1 LEFT JOIN ar1 ON ar1.dst = node),
        |hr1 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a1 JOIN e ON a1.node = e.dst GROUP BY src),
        |sh1 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr1),
        |h1 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh1 LEFT JOIN hr1 ON hr1.src = node),
        |ar2 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h1 JOIN e ON h1.node = e.src GROUP BY dst),
        |sa2 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar2),
        |a2 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa2 LEFT JOIN ar2 ON ar2.dst = node),
        |hr2 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a2 JOIN e ON a2.node = e.dst GROUP BY src),
        |sh2 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr2),
        |h2 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh2 LEFT JOIN hr2 ON hr2.src = node),
        |ar3 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h2 JOIN e ON h2.node = e.src GROUP BY dst),
        |sa3 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar3),
        |a3 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa3 LEFT JOIN ar3 ON ar3.dst = node),
        |hr3 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a3 JOIN e ON a3.node = e.dst GROUP BY src),
        |sh3 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr3),
        |h3 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh3 LEFT JOIN hr3 ON hr3.src = node)
        |SELECT a3.node AS part_id, a AS auth_fp, h AS hub_fp
        |FROM a3 JOIN h3 ON a3.node = h3.node ORDER BY part_id""".stripMargin,

    "q_link_pred_jaccard" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ed AS (SELECT a.l_partkey AS a, b.l_partkey AS b
        |       FROM items a JOIN items b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM ed UNION ALL SELECT b, a FROM ed),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |wg AS (SELECT x.u AS x, y.u AS y
        |       FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u),
        |cm AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_common
        |       FROM wg GROUP BY 1, 2),
        |nonadj AS (SELECT cm.x, cm.y, cm.n_common FROM cm
        |           LEFT JOIN ed ON ed.a = cm.x AND ed.b = cm.y
        |           WHERE ed.a IS NULL)
        |SELECT x AS part_a, y AS part_b, n_common,
        | floor(CAST(n_common AS DOUBLE)
        |       / CAST(dx.deg + dy.deg - n_common AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM nonadj JOIN deg dx ON dx.v = x JOIN deg dy ON dy.v = y
        |ORDER BY jaccard DESC, part_a, part_b LIMIT 50""".stripMargin,

    "q_pagerank" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY 1, 2),
        |wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM edges GROUP BY 1),
        |e AS (SELECT edges.src, dst, w, w_out FROM edges JOIN wout USING (src)),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
        |base AS (SELECT (15 * (1000000000000 // n)) // 100 AS b FROM nn),
        |r1 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r0 JOIN e ON r0.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r2 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r1 JOIN e ON r1.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r3 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r2 JOIN e ON r2.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r4 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r3 JOIN e ON r3.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r5 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r4 JOIN e ON r4.node = e.src GROUP BY dst) t
        |         ON t.dst = node)
        |SELECT node AS part_id, r AS rank_fp FROM r5 ORDER BY part_id""".stripMargin,

    "q_shortest_path" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY 1, 2),
        |e AS (SELECT src, dst, 1 + (1000 // (w + 1)) AS cost FROM edges),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |sn AS (SELECT min(node) AS src_node FROM nodes),
        |d0 AS (SELECT node, CAST(CASE WHEN node = src_node THEN 0
        |                         ELSE 1000000000000000 END AS BIGINT) AS dist
        |       FROM nodes CROSS JOIN sn),
        |d1 AS (SELECT d0.node, least(d0.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d0 LEFT JOIN (SELECT dst, min(d0.dist + cost) AS nd
        |                          FROM d0 JOIN e ON d0.node = e.src GROUP BY dst) c
        |         ON c.dst = d0.node),
        |d2 AS (SELECT d1.node, least(d1.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d1 LEFT JOIN (SELECT dst, min(d1.dist + cost) AS nd
        |                          FROM d1 JOIN e ON d1.node = e.src GROUP BY dst) c
        |         ON c.dst = d1.node),
        |d3 AS (SELECT d2.node, least(d2.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d2 LEFT JOIN (SELECT dst, min(d2.dist + cost) AS nd
        |                          FROM d2 JOIN e ON d2.node = e.src GROUP BY dst) c
        |         ON c.dst = d2.node),
        |d4 AS (SELECT d3.node, least(d3.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d3 LEFT JOIN (SELECT dst, min(d3.dist + cost) AS nd
        |                          FROM d3 JOIN e ON d3.node = e.src GROUP BY dst) c
        |         ON c.dst = d3.node)
        |SELECT node AS part_id, CAST(dist AS BIGINT) AS dist_fp
        |FROM d4 WHERE dist < 1000000000000000 ORDER BY part_id""".stripMargin,

    "q_kcore" -> {
      // 3 unrolled peel rounds — same fixed fold the Spark builder runs
      val rounds = (1 to 3).map { r =>
        s"""|d$r AS (SELECT src, count(*) AS dg FROM e${r - 1} GROUP BY src),
        |n$r AS (SELECT src FROM d$r, kv WHERE dg >= k),
        |e$r AS (SELECT e.src, e.dst FROM e${r - 1} e
        |        JOIN n$r a ON e.src = a.src JOIN n$r b ON e.dst = b.src),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
        |          FROM items a JOIN items b
        |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |e0 AS (SELECT DISTINCT src, dst FROM pairs),
        |kv AS (SELECT CAST((sum(dg) * 3) // (count(*) * 4) AS BIGINT) AS k
        |       FROM (SELECT src, count(*) AS dg FROM e0 GROUP BY src)),
        |${rounds.stripSuffix(",")}
        |SELECT src AS part_id, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY src ORDER BY part_id""".stripMargin
    },

    "q_incr_dedup_minhash" -> {
      // same Carter–Wegman chain as q_doc_dedup_minhash_gated, then the
      // batch-vs-corpus band-index probe
      val P = 2147483647L
      val mins = (0 until 32).map { j =>
        val a = operators.Dedup.cwCoef("a", j, P - 1, 1L)
        val b = operators.Dedup.cwCoef("b", j, P, 0L)
        s"min(($a * h + $b) % $P) AS h$j"
      }.mkString(",\n        |         ")
      val bandCases = (0 until 8).map { bnd =>
        val key = (bnd * 4 until (bnd + 1) * 4)
          .map(j => s"CAST(h$j AS VARCHAR)").mkString(" || '_' || ")
        s"WHEN b = $bnd THEN $key"
      }.mkString("\n        |             ")
      val matches = (0 until 32)
        .map(j => s"CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END")
        .mkString(" +\n        |               ")
      s"""WITH sh0 AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text) - 2)) AS i
        |  FROM documents WHERE length(text) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 3) AS s
        |  FROM sh0),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) % $P AS h
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id,
        |         ${mins}
        |  FROM hs GROUP BY doc_id),
        |bands AS (
        |  SELECT sig.*, b AS band_id,
        |         CASE $bandCases
        |         END AS bkey
        |  FROM sig, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS b)),
        |corp AS (SELECT * FROM bands WHERE doc_id % 10 <> 0),
        |newb AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
        |stats AS (SELECT band_id, bkey, min(doc_id) AS first_id
        |          FROM corp GROUP BY 1, 2),
        |hits AS (SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_hit_bands,
        |                min(s.first_id) AS first_match
        |         FROM newb n JOIN stats s
        |           ON n.band_id = s.band_id AND n.bkey = s.bkey
        |         GROUP BY 1),
        |est AS (SELECT h.doc_id, h.n_hit_bands, h.first_match,
        |               ($matches) AS m
        |        FROM hits h JOIN sig a ON a.doc_id = h.doc_id
        |                    JOIN sig b ON b.doc_id = h.first_match),
        |ids AS (SELECT DISTINCT doc_id FROM sig WHERE doc_id % 10 = 0)
        |SELECT ids.doc_id AS new_id,
        |       est.doc_id IS NOT NULL AS is_dup,
        |       COALESCE(est.n_hit_bands, 0) AS n_hit_bands,
        |       est.first_match,
        |       CASE WHEN est.doc_id IS NOT NULL
        |            THEN floor(m / 32.0 * 10000.0 + 0.5) / 10000.0 END AS first_est
        |FROM ids LEFT JOIN est ON est.doc_id = ids.doc_id
        |ORDER BY new_id""".stripMargin
    },

    "q_lsh_recall" -> {
      // truth = the NAIVE word-shingle inverted-index join (as for
      // q_jaccard_prefix_join); candidates = the CW minhash band chain on
      // the SAME word shingles, hot-bucket star cap included
      val P = 2147483647L
      val mins = (0 until 32).map { j =>
        val a = operators.Dedup.cwCoef("a", j, P - 1, 1L)
        val b = operators.Dedup.cwCoef("b", j, P, 0L)
        s"min(($a * h + $b) % $P) AS h$j"
      }.mkString(",\n        |         ")
      val bandCases = (0 until 8).map { bnd =>
        val key = (bnd * 4 until (bnd + 1) * 4)
          .map(j => s"CAST(h$j AS VARCHAR)").mkString(" || '_' || ")
        s"WHEN b = $bnd THEN $key"
      }.mkString("\n        |             ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sarr AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |truth AS (SELECT doc_a, doc_b FROM p
        |          JOIN sz za ON za.doc_id = doc_a
        |          JOIN sz zb ON zb.doc_id = doc_b
        |          WHERE c * 3 >= za.nsh + zb.nsh),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) % $P AS h
        |  FROM e),
        |sig AS (
        |  SELECT doc_id,
        |         ${mins}
        |  FROM hs GROUP BY doc_id),
        |bands AS (
        |  SELECT sig.*, b AS band_id,
        |         CASE $bandCases
        |         END AS bkey
        |  FROM sig, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS b)),
        |stats AS (
        |  SELECT band_id, bkey, count(*) AS bn, min(doc_id) AS anchor
        |  FROM bands GROUP BY 1, 2),
        |bs AS (
        |  SELECT bands.*, stats.bn, stats.anchor
        |  FROM bands JOIN stats USING (band_id, bkey)),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bs a JOIN bs b
        |    ON a.band_id = b.band_id AND a.bkey = b.bkey
        |   AND a.doc_id < b.doc_id
        |  WHERE a.bn <= 64
        |  UNION
        |  SELECT a.doc_id, b.doc_id
        |  FROM bs a JOIN bs b
        |    ON a.band_id = b.band_id AND a.bkey = b.bkey
        |  WHERE a.bn > 64 AND a.doc_id = a.anchor AND b.doc_id <> b.anchor),
        |tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
        |cn AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
        |hn AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
        |       FROM truth t JOIN cand c ON t.doc_a = c.a_id AND t.doc_b = c.b_id)
        |SELECT n_truth, n_cand, n_hit,
        |       floor(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS recall
        |FROM tn, cn, hn""".stripMargin
    },

    "q_bridge_alloc" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS lr
        |  FROM lineitem GROUP BY 1, 2),
        |orv AS (SELECT l_orderkey, sum(lr) AS orv FROM li GROUP BY 1),
        |otp AS (SELECT o_orderkey,
        |               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS otp_c
        |        FROM orders),
        |al AS (SELECT li.l_partkey,
        |              (otp_c * CAST(lr * 10000 AS BIGINT))
        |                // CAST(orv * 10000 AS BIGINT) AS ac
        |       FROM li JOIN orv USING (l_orderkey)
        |            JOIN otp ON o_orderkey = l_orderkey)
        |SELECT l_partkey AS part_id, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(ac) AS BIGINT) AS alloc_cents,
        |       floor(CAST(sum(ac) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |         AS alloc_rev
        |FROM al GROUP BY 1 ORDER BY part_id""".stripMargin,

    "q_mannwhitney" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        |  FROM orders),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(ga) AS BIGINT) AS cnta
        |         FROM o GROUP BY v),
        |cum AS (SELECT v, cnt, cnta,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |agg AS (SELECT sum(cnta) AS na, sum(cnt) AS n,
        |               sum(cnta * (2 * cumb + cnt + 1)) AS w2a,
        |               sum(cnt * cnt * cnt - cnt) AS ties
        |        FROM cum)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |       CAST(w2a AS BIGINT) AS w2_a,
        |       CAST(w2a - na * (na + 1) AS BIGINT) AS u2_a,
        |       CAST(ties AS BIGINT) AS tie_sum,
        |       floor((CAST(w2a - na * (na + 1) AS DOUBLE) / 2.0
        |              - CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 2.0)
        |             / sqrt(CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 12.0
        |                    * ((CAST(n AS DOUBLE) + 1.0)
        |                       - CAST(ties AS DOUBLE)
        |                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
        |             * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_skew_report" ->
      """WITH cnts AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_partkey),
        |top20 AS (SELECT CAST(sum(cnt) AS BIGINT) AS top20_rows FROM (
        |            SELECT cnt FROM cnts ORDER BY cnt DESC, l_partkey LIMIT 20)),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |             CAST(sum(cnt) AS BIGINT) AS n_rows,
        |             CAST(max(cnt) AS BIGINT) AS max_cnt
        |      FROM cnts)
        |SELECT n_keys, n_rows, max_cnt,
        |       floor(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_cnt,
        |       floor(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |             / CAST(n_rows AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS skew_ratio,
        |       floor(CAST(top20_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS top20_share
        |FROM g, top20""".stripMargin,

    "q_spearman" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x,
        |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |hx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY x),
        |rx AS (SELECT x,
        |              2 * COALESCE(sum(cnt) OVER (ORDER BY x
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              + cnt + 1 AS r_x
        |       FROM hx),
        |hy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY y),
        |ry AS (SELECT y,
        |              2 * COALESCE(sum(cnt) OVER (ORDER BY y
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              + cnt + 1 AS r_y
        |       FROM hy),
        |wr AS (SELECT r_x, r_y FROM b JOIN rx USING (x) JOIN ry USING (y)),
        |agg AS (SELECT count(*) AS n, sum(r_x) AS sa, sum(r_y) AS sb,
        |               sum(r_x * r_x) AS saa, sum(r_y * r_y) AS sbb,
        |               sum(r_x * r_y) AS sab
        |        FROM wr)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |       floor(CAST(n * sab - sa * sb AS DOUBLE)
        |             / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
        |                    * CAST(n * sbb - sb * sb AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS rho
        |FROM agg""".stripMargin,

    "q_psi_drift" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS vc,
        |         year(o_orderdate) <= 1997 AS is_base
        |  FROM orders),
        |rng AS (SELECT min(vc) AS mn, max(vc) AS mx FROM o),
        |cnts AS (
        |  SELECT least(9, ((vc - mn) * 10) // (mx - mn + 1)) AS bin,
        |         CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_base,
        |         CAST(sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_curr
        |  FROM o, rng GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |               CAST(sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS nc
        |        FROM o),
        |ab AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS bin),
        |terms AS (
        |  SELECT ab.bin,
        |         COALESCE(c_base, 0) AS c_base, COALESCE(c_curr, 0) AS c_curr,
        |         CAST(floor((CAST(COALESCE(c_base, 0) + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)
        |                     - CAST(COALESCE(c_curr, 0) + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE))
        |                    * ln((CAST(COALESCE(c_base, 0) + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))
        |                         / (CAST(COALESCE(c_curr, 0) + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)))
        |                    * 1000000.0 + 0.5) AS BIGINT) AS psi_term_fp
        |  FROM ab LEFT JOIN cnts ON cnts.bin = ab.bin, tot)
        |SELECT bin, c_base, c_curr, psi_term_fp,
        |       (SELECT CAST(sum(psi_term_fp) AS BIGINT) FROM terms) AS psi_total_fp
        |FROM terms ORDER BY bin""".stripMargin,

    "q_ann_join" -> {
      // k-means fit on the EVEN (reference) side only; both sides assigned,
      // per-A-vector argmin by (d2, b_id), misses stay NULL
      val iters = (1 to 5).map { i =>
        s"""|a$i AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |        FROM slong l JOIN c${i - 1} c ON c.i = l.i GROUP BY 1, 2),
        |b$i AS (SELECT vec_id, cid FROM (
        |          SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |          FROM a$i) WHERE rk = 1),
        |m$i AS (SELECT b.cid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM b$i b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2),
        |c$i AS (SELECT c.cid, c.i, COALESCE(m.qv, c.qv) AS qv
        |        FROM c${i - 1} c LEFT JOIN m$i m ON m.cid = c.cid AND m.i = c.i),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) + 16384 AS qv
        |  FROM embeddings),
        |sample AS (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20000),
        |slong AS (SELECT q.* FROM q JOIN sample USING (vec_id)),
        |tiles AS (SELECT vec_id, ntile(16) OVER (ORDER BY vec_id) AS t FROM sample),
        |chosen AS (SELECT t, min(vec_id) AS v FROM tiles GROUP BY t),
        |c0 AS (SELECT t - 1 AS cid, l.i, l.qv
        |       FROM chosen JOIN slong l ON l.vec_id = chosen.v),
        |$iters
        |af AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |       FROM q l JOIN c5 c ON c.i = l.i GROUP BY 1, 2),
        |bf AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |         FROM af) WHERE rk = 1),
        |aa AS (SELECT vec_id, cid FROM bf WHERE vec_id % 2 = 1),
        |bb AS (SELECT vec_id, cid FROM bf WHERE vec_id % 2 = 0),
        |pd AS (SELECT aa.vec_id AS a_id, bb.vec_id AS b_id,
        |              sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS d2
        |       FROM aa JOIN bb ON aa.cid = bb.cid
        |            JOIN q qa ON qa.vec_id = aa.vec_id
        |            JOIN q qb ON qb.vec_id = bb.vec_id AND qb.i = qa.i
        |       GROUP BY 1, 2),
        |best AS (SELECT a_id, b_id AS match_id, CAST(d2 AS BIGINT) AS match_d2
        |         FROM (SELECT a_id, b_id, d2,
        |                      row_number() OVER (PARTITION BY a_id
        |                        ORDER BY d2, b_id) AS rk
        |               FROM pd) WHERE rk = 1 AND d2 <= 130000000)
        |SELECT aa.vec_id, CAST(aa.cid AS BIGINT) AS cell_id,
        |       best.match_id IS NOT NULL AS is_match,
        |       best.match_id, best.match_d2
        |FROM aa LEFT JOIN best ON best.a_id = aa.vec_id
        |ORDER BY vec_id""".stripMargin
    },

    "q_semantic_dedup_mp" -> {
      // same unrolled integer k-means; assignment keeps the TOP-2 cells
      // (row_number <= 2), pairs form in any shared cell
      val iters = (1 to 5).map { i =>
        s"""|a$i AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |        FROM slong l JOIN c${i - 1} c ON c.i = l.i GROUP BY 1, 2),
        |b$i AS (SELECT vec_id, cid FROM (
        |          SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |          FROM a$i) WHERE rk = 1),
        |m$i AS (SELECT b.cid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM b$i b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2),
        |c$i AS (SELECT c.cid, c.i, COALESCE(m.qv, c.qv) AS qv
        |        FROM c${i - 1} c LEFT JOIN m$i m ON m.cid = c.cid AND m.i = c.i),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) + 16384 AS qv
        |  FROM embeddings),
        |sample AS (SELECT vec_id FROM embeddings
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20000),
        |slong AS (SELECT q.* FROM q JOIN sample USING (vec_id)),
        |tiles AS (SELECT vec_id, ntile(16) OVER (ORDER BY vec_id) AS t FROM sample),
        |chosen AS (SELECT t, min(vec_id) AS v FROM tiles GROUP BY t),
        |c0 AS (SELECT t - 1 AS cid, l.i, l.qv
        |       FROM chosen JOIN slong l ON l.vec_id = chosen.v),
        |$iters
        |af AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |       FROM q l JOIN c5 c ON c.i = l.i GROUP BY 1, 2),
        |bf2 AS (SELECT vec_id, cid, rk FROM (
        |          SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |          FROM af) WHERE rk <= 2),
        |prim AS (SELECT vec_id, cid FROM bf2 WHERE rk = 1),
        |pr AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |       FROM bf2 a JOIN bf2 b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |pd AS (SELECT pr.a_id, pr.b_id, sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS d2
        |       FROM pr JOIN q qa ON qa.vec_id = pr.a_id
        |               JOIN q qb ON qb.vec_id = pr.b_id AND qb.i = qa.i
        |       GROUP BY 1, 2),
        |du AS (SELECT b_id, min(a_id) AS dup_of, CAST(min(d2) AS BIGINT) AS min_d2
        |       FROM pd WHERE d2 <= 130000000 GROUP BY 1)
        |SELECT prim.vec_id, CAST(prim.cid AS BIGINT) AS cluster_id,
        |       du.b_id IS NOT NULL AS is_dup, du.dup_of, du.min_d2
        |FROM prim LEFT JOIN du ON du.b_id = prim.vec_id
        |ORDER BY vec_id""".stripMargin
    },

    "q_semantic_dedup_hier" -> {
      // FULLY hierarchical quantizer unrolled: 3 coarse Lloyd's rounds
      // over the md5-sampled corpus, the sample routed once to its coarse
      // group, then 5 GROUPED fine Lloyd's rounds (every per-group fit in
      // the same CTEs, keyed by gid), live-group corpus routing
      // coarse-then-fine, cells = gid·kPerGroup + fcid, and the
      // q_semantic_dedup pair-scan + keep-lowest-id tail.
      // MATERIALIZED on the multiply-referenced CTEs (q/slong/rb/rounds):
      // plain CTE inlining re-expands the doubled Lloyd's lineage per
      // reference — a 2^R blowup that exhausted DuckDB's file handles.
      // drop-empty Lloyd's at BOTH levels (no carry join): each round's
      // centroids are exactly the means of its non-empty cells — the same
      // linear-lineage variant the Spark side runs
      val coarseIters = (1 to 3).map { r =>
        s"""|ga$r AS (SELECT l.vec_id, g.gid, sum((l.qv - g.qv) * (l.qv - g.qv)) AS d
        |        FROM slong l JOIN gc${r - 1} g ON g.i = l.i GROUP BY 1, 2),
        |gb$r AS (SELECT vec_id, gid FROM (
        |          SELECT vec_id, gid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, gid) AS rk
        |          FROM ga$r) WHERE rk = 1),
        |gc$r AS MATERIALIZED (SELECT b.gid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM gb$r b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      val fineIters = (1 to 5).map { r =>
        s"""|fa$r AS (SELECT rb.gid, l.vec_id, c.fcid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |        FROM slong l JOIN rb ON rb.vec_id = l.vec_id
        |                     JOIN f${r - 1} c ON c.gid = rb.gid AND c.i = l.i
        |        GROUP BY 1, 2, 3),
        |fb$r AS (SELECT gid, vec_id, fcid FROM (
        |          SELECT gid, vec_id, fcid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, fcid) AS rk
        |          FROM fa$r) WHERE rk = 1),
        |f$r AS MATERIALIZED (SELECT b.gid, b.fcid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM fb$r b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2, 3),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH q AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) + 16384 AS qv
        |  FROM embeddings),
        |sample AS (SELECT vec_id FROM embeddings
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20000),
        |slong AS MATERIALIZED (SELECT q.* FROM q JOIN sample USING (vec_id)),
        |tiles AS (SELECT vec_id, ntile(4) OVER (ORDER BY vec_id) AS t FROM sample),
        |chosen AS (SELECT t, min(vec_id) AS v FROM tiles GROUP BY t),
        |gc0 AS (SELECT t - 1 AS gid, l.i, l.qv
        |        FROM chosen JOIN slong l ON l.vec_id = chosen.v),
        |$coarseIters
        |ra AS (SELECT l.vec_id, g.gid, sum((l.qv - g.qv) * (l.qv - g.qv)) AS d
        |       FROM slong l JOIN gc3 g ON g.i = l.i GROUP BY 1, 2),
        |rb AS MATERIALIZED (SELECT vec_id, gid FROM (
        |        SELECT vec_id, gid,
        |               row_number() OVER (PARTITION BY vec_id ORDER BY d, gid) AS rk
        |        FROM ra) WHERE rk = 1),
        |ftile AS (SELECT vec_id, gid,
        |            ntile(4) OVER (PARTITION BY gid ORDER BY vec_id) AS t
        |          FROM rb),
        |fch AS (SELECT gid, t, min(vec_id) AS v FROM ftile GROUP BY 1, 2),
        |f0 AS (SELECT fch.gid, fch.t - 1 AS fcid, l.i, l.qv
        |       FROM fch JOIN slong l ON l.vec_id = fch.v),
        |$fineIters
        |glive AS (SELECT g.* FROM gc3 g
        |          WHERE g.gid IN (SELECT DISTINCT gid FROM f5)),
        |ca AS (SELECT l.vec_id, g.gid, sum((l.qv - g.qv) * (l.qv - g.qv)) AS d
        |       FROM q l JOIN glive g ON g.i = l.i GROUP BY 1, 2),
        |cb AS MATERIALIZED (SELECT vec_id, gid FROM (
        |        SELECT vec_id, gid,
        |               row_number() OVER (PARTITION BY vec_id ORDER BY d, gid) AS rk
        |        FROM ca) WHERE rk = 1),
        |ha AS (SELECT l.vec_id, c.fcid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |       FROM q l JOIN cb ON cb.vec_id = l.vec_id
        |              JOIN f5 c ON c.gid = cb.gid AND c.i = l.i
        |       GROUP BY 1, 2),
        |hb AS (SELECT vec_id, fcid FROM (
        |         SELECT vec_id, fcid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, fcid) AS rk
        |         FROM ha) WHERE rk = 1),
        |cells AS MATERIALIZED (
        |  SELECT hb.vec_id, CAST(cb.gid AS BIGINT) * 4 + hb.fcid AS cid
        |  FROM hb JOIN cb USING (vec_id)),
        |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |       FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |pd AS (SELECT pr.a_id, pr.b_id, sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS d2
        |       FROM pr JOIN q qa ON qa.vec_id = pr.a_id
        |               JOIN q qb ON qb.vec_id = pr.b_id AND qb.i = qa.i
        |       GROUP BY 1, 2),
        |du AS (SELECT b_id, min(a_id) AS dup_of, CAST(min(d2) AS BIGINT) AS min_d2
        |       FROM pd WHERE d2 <= 130000000 GROUP BY 1)
        |SELECT cells.vec_id, cells.cid AS cluster_id,
        |       du.b_id IS NOT NULL AS is_dup, du.dup_of, du.min_d2
        |FROM cells LEFT JOIN du ON du.b_id = cells.vec_id
        |ORDER BY vec_id""".stripMargin
    },

    "q_semantic_dedup" -> {
      // same unrolled integer k-means as q_ann_ivf_gated, then the
      // within-cell pair scan and keep-lowest-id dup marking
      val iters = (1 to 5).map { i =>
        s"""|a$i AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |        FROM slong l JOIN c${i - 1} c ON c.i = l.i GROUP BY 1, 2),
        |b$i AS (SELECT vec_id, cid FROM (
        |          SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |          FROM a$i) WHERE rk = 1),
        |m$i AS (SELECT b.cid, l.i, CAST(sum(l.qv) // count(*) AS BIGINT) AS qv
        |        FROM b$i b JOIN slong l ON l.vec_id = b.vec_id GROUP BY 1, 2),
        |c$i AS (SELECT c.cid, c.i, COALESCE(m.qv, c.qv) AS qv
        |        FROM c${i - 1} c LEFT JOIN m$i m ON m.cid = c.cid AND m.i = c.i),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
        |              AS BIGINT) + 16384 AS qv
        |  FROM embeddings),
        |sample AS (SELECT vec_id FROM embeddings
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20000),
        |slong AS (SELECT q.* FROM q JOIN sample USING (vec_id)),
        |tiles AS (SELECT vec_id, ntile(16) OVER (ORDER BY vec_id) AS t FROM sample),
        |chosen AS (SELECT t, min(vec_id) AS v FROM tiles GROUP BY t),
        |c0 AS (SELECT t - 1 AS cid, l.i, l.qv
        |       FROM chosen JOIN slong l ON l.vec_id = chosen.v),
        |$iters
        |af AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qv) * (l.qv - c.qv)) AS d
        |       FROM q l JOIN c5 c ON c.i = l.i GROUP BY 1, 2),
        |bf AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |         FROM af) WHERE rk = 1),
        |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |       FROM bf a JOIN bf b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |pd AS (SELECT pr.a_id, pr.b_id, sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS d2
        |       FROM pr JOIN q qa ON qa.vec_id = pr.a_id
        |               JOIN q qb ON qb.vec_id = pr.b_id AND qb.i = qa.i
        |       GROUP BY 1, 2),
        |du AS (SELECT b_id, min(a_id) AS dup_of, CAST(min(d2) AS BIGINT) AS min_d2
        |       FROM pd WHERE d2 <= 130000000 GROUP BY 1)
        |SELECT bf.vec_id, CAST(bf.cid AS BIGINT) AS cluster_id,
        |       du.b_id IS NOT NULL AS is_dup, du.dup_of, du.min_d2
        |FROM bf LEFT JOIN du ON du.b_id = bf.vec_id
        |ORDER BY vec_id""".stripMargin
    },

    // NAIVE formulation on purpose: full inverted-index self-join with no
    // prefix pruning — the gate proves the Spark-side PPJoin prune is lossless
    "q_jaccard_prefix_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sarr AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh + zb.nsh - c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b
        |WHERE c * 3 >= za.nsh + zb.nsh
        |ORDER BY doc_a, doc_b""".stripMargin,

    // NAIVE formulation on purpose (as for q_jaccard_prefix_join): the gate
    // proves the containment prefix prune lossless
    "q_containment_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sarr AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id <> b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS containment
        |FROM p JOIN sz za ON za.doc_id = doc_a
        |WHERE c * 5 >= za.nsh * 4
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_exact_substr" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w
        |        FROM d),
        |toks AS (SELECT doc_id, pos, w[pos] AS word FROM tok),
        |sp AS (SELECT doc_id, pos, array_to_string(w[pos:pos+2], ' ') AS s
        |       FROM tok WHERE pos + 2 <= len(w)),
        |dup AS (SELECT s FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT sp.doc_id, sp.pos + k.k AS cpos
        |        FROM sp JOIN dup USING (s),
        |             LATERAL unnest(generate_series(0, 2)) k(k)),
        |kept AS (SELECT t.doc_id, t.pos, t.word
        |         FROM toks t LEFT JOIN cov c
        |           ON c.doc_id = t.doc_id AND c.cpos = t.pos
        |         WHERE c.doc_id IS NULL),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |              string_agg(word, ' ' ORDER BY pos) AS kept_text
        |       FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
        |       CAST(len(d.w) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        |       coalesce(ka.kept_text, '') AS kept_text
        |FROM d LEFT JOIN ka USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d)
        |SELECT s, count(*) AS n_docs,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM sh GROUP BY s HAVING count(*) >= 2
        |ORDER BY n_docs DESC, s ASC LIMIT 100""".stripMargin,

    "q_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |ds AS (SELECT DISTINCT d AS anchor FROM ud)
        |SELECT ds.anchor, count(DISTINCT ud.user_id) AS active_7d
        |FROM ds JOIN ud ON ud.d >= ds.anchor - 6 AND ud.d <= ds.anchor
        |GROUP BY ds.anchor ORDER BY ds.anchor""".stripMargin,

    "q_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ic AS (SELECT br, count(*) AS c FROM b GROUP BY br),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        |pr AS (
        |  SELECT a.br AS brand_a, c.br AS brand_b, count(*) AS pair_n
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.br < c.br
        |  GROUP BY 1, 2)
        |SELECT pr.brand_a, pr.brand_b, pr.pair_n,
        | floor(CAST(pr.pair_n AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS support,
        | floor(CAST(pr.pair_n AS DOUBLE) / CAST(ia.c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS confidence,
        | floor(CAST(pr.pair_n * n.n_orders AS DOUBLE)
        |       / CAST(ia.c * ib.c AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lift
        |FROM pr
        |JOIN ic ia ON pr.brand_a = ia.br
        |JOIN ic ib ON pr.brand_b = ib.br
        |CROSS JOIN n
        |ORDER BY pr.brand_a, pr.brand_b""".stripMargin,

    "q_rfm" ->
      """WITH c0 AS (
        |  SELECT o_custkey AS custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
        |         count(*) AS f, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT custkey,
        |         NTILE(5) OVER (ORDER BY last_d, custkey) AS r_score,
        |         NTILE(5) OVER (ORDER BY f, custkey) AS f_score,
        |         NTILE(5) OVER (ORDER BY m, custkey) AS m_score
        |  FROM c0)
        |SELECT custkey, r_score, f_score, m_score,
        |       r_score * 100 + f_score * 10 + m_score AS rfm
        |FROM s ORDER BY custkey""".stripMargin,

    "q_attribution" ->
      """WITH s AS (
        |  SELECT user_id, event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                    IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(direct)') AS channel, count(*) AS conversions,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM s WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pareto_front" ->
      """WITH pp AS (
        |  SELECT p_retailprice AS pr, max(p_size) AS meq FROM part GROUP BY 1),
        |f AS (
        |  SELECT pr, meq,
        |         max(meq) OVER (ORDER BY pr
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
        |  FROM pp)
        |SELECT p.p_partkey, p.p_name,
        |       floor(p.p_retailprice * 10000.0 + 0.5) / 10000.0 AS price, p.p_size
        |FROM part p JOIN f ON p.p_retailprice = f.pr AND p.p_size = f.meq
        |WHERE f.mprev IS NULL OR f.meq > f.mprev
        |ORDER BY p.p_partkey""".stripMargin,

    "q_equi_depth_hist" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS p,
        |         NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |                         l_linenumber) AS bucket
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n,
        | floor(min(p) * 10000.0 + 0.5) / 10000.0 AS lo,
        | floor(max(p) * 10000.0 + 0.5) / 10000.0 AS hi,
        | floor(CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS amount
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_stratified_sample" ->
      """SELECT c_mktsegment, rn, c_custkey, c_name FROM (
        |  SELECT c_mktsegment, c_custkey, c_name,
        |         row_number() OVER (
        |           PARTITION BY c_mktsegment
        |           ORDER BY ((c_custkey % 1000000007) * 2654435761) % 1000000007, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 20
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_ks_test" ->
      """WITH v AS (
        |  SELECT c_acctbal AS val,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS gb
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |d AS (SELECT val, sum(ga) AS ca, sum(gb) AS cb FROM v GROUP BY val),
        |c AS (
        |  SELECT val,
        |         sum(ca) OVER (ORDER BY val
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |         sum(cb) OVER (ORDER BY val
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM d),
        |t AS (SELECT CAST(sum(ga) AS BIGINT) AS n1,
        |             CAST(sum(gb) AS BIGINT) AS n2 FROM v)
        |SELECT t.n1, t.n2,
        | floor(max(abs(CAST(c.cuma AS DOUBLE) / CAST(t.n1 AS DOUBLE)
        |             - CAST(c.cumb AS DOUBLE) / CAST(t.n2 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS ks_d
        |FROM c CROSS JOIN t GROUP BY t.n1, t.n2""".stripMargin,

    "q_gini" ->
      """WITH spend AS (
        |  SELECT n.n_name, o.o_custkey AS ck,
        |         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, o.o_custkey),
        |ranked AS (
        |  SELECT n_name, cents,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY cents, ck) AS i
        |  FROM spend)
        |SELECT n_name, count(*) AS n,
        | floor((2.0 * CAST(sum(i * cents) AS DOUBLE)
        |        / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |      - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS gini
        |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_chi2" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pr, o_orderstatus AS st, count(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, sum(obs) AS r FROM o GROUP BY pr),
        |ct AS (SELECT st, sum(obs) AS c FROM o GROUP BY st),
        |n AS (SELECT sum(obs) AS nn FROM o),
        |k AS (
        |  SELECT o.pr, o.st, o.obs,
        |         CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE) AS ex,
        |         (CAST(o.obs AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE))
        |         * (CAST(o.obs AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE))
        |         / (CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE)) AS contrib
        |  FROM o JOIN rt ON o.pr = rt.pr JOIN ct ON o.st = ct.st CROSS JOIN n),
        |t AS (SELECT CAST(sum(CAST(contrib AS DECIMAL(28,8))) AS DOUBLE) AS chi2 FROM k)
        |SELECT k.pr AS o_orderpriority, k.st AS o_orderstatus, k.obs,
        |       floor(k.ex * 10000.0 + 0.5) / 10000.0 AS expected,
        |       floor(k.contrib * 10000.0 + 0.5) / 10000.0 AS contrib,
        |       floor(t.chi2 * 10000.0 + 0.5) / 10000.0 AS chi2_total
        |FROM k CROSS JOIN t
        |ORDER BY k.pr, k.st""".stripMargin,

    "q_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        | CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel,
        | floor(CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS novelty_ratio
        |FROM sh JOIN f USING (s)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    "q_clustering_coeff" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |tri AS (SELECT w1.v, CAST(count(*) AS BIGINT) AS n_tri
        |        FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
        |        JOIN e ON e.a = w1.u AND e.b = w2.u
        |        GROUP BY w1.v)
        |SELECT deg.v AS brand, deg.deg, COALESCE(tri.n_tri, 0) AS n_tri,
        | CASE WHEN deg.deg < 2 THEN 0.0 ELSE
        |   floor(2.0 * CAST(COALESCE(tri.n_tri, 0) AS DOUBLE)
        |         / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
        |         * 10000.0 + 0.5) / 10000.0 END AS lcc
        |FROM deg LEFT JOIN tri ON deg.v = tri.v
        |ORDER BY brand""".stripMargin,

    "q_degree_dist" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM pairs GROUP BY src)
        |SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS bucket,
        | count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |lagd AS (
        |  SELECT rev,
        |         lead(rev, 1) OVER (ORDER BY d) AS rev_1,
        |         lead(rev, 2) OVER (ORDER BY d) AS rev_2,
        |         lead(rev, 3) OVER (ORDER BY d) AS rev_3
        |  FROM daily),
        |m AS (
        |  SELECT 1 AS lag, count(*) AS n,
        |         CAST(sum(rev) AS DOUBLE) AS sx, CAST(sum(rev_1) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(rev * rev_1 AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(rev_1 * rev_1 AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM lagd WHERE rev_1 IS NOT NULL
        |  UNION ALL
        |  SELECT 2, count(*),
        |         CAST(sum(rev) AS DOUBLE), CAST(sum(rev_2) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev_2 AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev_2 * rev_2 AS DECIMAL(38,4))) AS DOUBLE)
        |  FROM lagd WHERE rev_2 IS NOT NULL
        |  UNION ALL
        |  SELECT 3, count(*),
        |         CAST(sum(rev) AS DOUBLE), CAST(sum(rev_3) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev_3 AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev_3 * rev_3 AS DECIMAL(38,4))) AS DOUBLE)
        |  FROM lagd WHERE rev_3 IS NOT NULL)
        |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
        | floor((n * sxy - sx * sy) /
        |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS acf
        |FROM m ORDER BY lag""".stripMargin,

    "q_mk_trend" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT a.grp,
        |             CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.m < b.m
        |      GROUP BY a.grp),
        |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_periods FROM monthly GROUP BY grp),
        |ties AS (SELECT grp, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |         FROM (SELECT grp, v, CAST(count(*) AS BIGINT) AS t
        |               FROM monthly GROUP BY grp, v)
        |         GROUP BY grp),
        |j AS (SELECT n.grp, n.n_periods, s.s,
        |             n.n_periods * (n.n_periods - 1) * (2 * n.n_periods + 5) - ties.tsum AS var18
        |      FROM n JOIN s ON n.grp = s.grp JOIN ties ON n.grp = ties.grp)
        |SELECT grp AS l_returnflag, n_periods, s, CAST(var18 AS BIGINT) AS var18,
        | floor((CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS z
        |FROM j ORDER BY l_returnflag""".stripMargin,

    "q_hhi" ->
      """WITH rev AS (
        |  SELECT n.n_name, l.l_suppkey,
        |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
        | CAST(sum(rev) AS DOUBLE) AS total_rev,
        | floor(10000.0 * CAST(sum(CAST(CAST(rev AS DECIMAL(19,2)) * rev AS DECIMAL(38,4))) AS DOUBLE)
        |       / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS hhi
        |FROM rev GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_rank_biserial" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        |  FROM orders),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(ga) AS BIGINT) AS cnta
        |         FROM o GROUP BY v),
        |cum AS (SELECT v, cnt, cnta,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |agg AS (SELECT sum(cnta) AS na, sum(cnt) AS n,
        |               sum(cnta * (2 * cumb + cnt + 1)) AS w2a
        |        FROM cum)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |       CAST(w2a - na * (na + 1) AS BIGINT) AS u2_a,
        |       floor((1.0 - CAST(w2a - na * (na + 1) AS DOUBLE)
        |              / (CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)))
        |             * 10000.0 + 0.5) / 10000.0 AS r_rb
        |FROM agg""".stripMargin,

    "q_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |iv AS (
        |  SELECT user_id, vc,
        |         lead(ts_us) OVER (PARTITION BY user_id
        |                           ORDER BY ts_us, event_id) - ts_us AS dur
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        | CAST(sum(dur) AS BIGINT) AS total_us,
        | floor(CAST(sum(CAST(vc AS DECIMAL(18,0)) * CAST(dur AS DECIMAL(18,0))) AS DOUBLE)
        |       / CAST(sum(dur) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS twa
        |FROM iv WHERE dur IS NOT NULL
        |GROUP BY user_id HAVING sum(dur) > 0
        |ORDER BY user_id""".stripMargin,

    "q_kendall_tau" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS x,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT a.grp,
        |             CAST(sum((CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |                    * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.m < b.m
        |      GROUP BY a.grp),
        |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_periods FROM monthly GROUP BY grp),
        |tx AS (SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS tx2
        |       FROM (SELECT grp, x, CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY grp, x)
        |       GROUP BY grp),
        |ty AS (SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS ty2
        |       FROM (SELECT grp, y, CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY grp, y)
        |       GROUP BY grp)
        |SELECT n.grp AS l_returnflag, n.n_periods, s.s,
        | tx.tx2 // 2 AS n1, ty.ty2 // 2 AS n2,
        | floor(CAST(s.s AS DOUBLE) /
        |       sqrt(CAST(n.n_periods * (n.n_periods - 1) - tx.tx2 AS DOUBLE)
        |            * CAST(n.n_periods * (n.n_periods - 1) - ty.ty2 AS DOUBLE) / 4.0)
        |       * 10000.0 + 0.5) / 10000.0 AS tau_b
        |FROM n JOIN s ON n.grp = s.grp JOIN tx ON n.grp = tx.grp JOIN ty ON n.grp = ty.grp
        |ORDER BY l_returnflag""".stripMargin,

    "q_cramers_v" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pr, o_orderstatus AS st, count(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, sum(obs) AS r FROM o GROUP BY pr),
        |ct AS (SELECT st, sum(obs) AS c FROM o GROUP BY st),
        |dims AS (SELECT CAST(count(DISTINCT pr) AS BIGINT) AS n_rows_dim,
        |                CAST(count(DISTINCT st) AS BIGINT) AS n_cols_dim,
        |                CAST(sum(obs) AS BIGINT) AS n
        |         FROM o),
        |k AS (SELECT o.obs, CAST(rt.r * ct.c AS DOUBLE) / CAST(d.n AS DOUBLE) AS ex
        |      FROM o JOIN rt ON o.pr = rt.pr JOIN ct ON o.st = ct.st CROSS JOIN dims d),
        |c2 AS (SELECT CAST(sum(CAST((CAST(obs AS DOUBLE) - ex) * (CAST(obs AS DOUBLE) - ex) / ex
        |                            AS DECIMAL(28,8))) AS DOUBLE) AS chi2
        |       FROM k)
        |SELECT d.n_rows_dim, d.n_cols_dim, d.n,
        | floor(c2.chi2 * 10000.0 + 0.5) / 10000.0 AS chi2,
        | floor(sqrt(c2.chi2 / (CAST(d.n AS DOUBLE)
        |                       * CAST(least(d.n_rows_dim - 1, d.n_cols_dim - 1) AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS cramers_v
        |FROM dims d CROSS JOIN c2""".stripMargin,

    "q_anova_f" ->
      """WITH g AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS ng,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sg,
        |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS ssg
        |  FROM lineitem GROUP BY 1),
        |terms AS (SELECT ng, ssg, sg,
        |          CAST(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
        |               AS DECIMAL(28,8)) AS sq_over_n
        |          FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |             CAST(sum(sg) AS DOUBLE) AS sx,
        |             CAST(sum(sq_over_n) AS DOUBLE) AS sqn,
        |             CAST(sum(CAST(ssg AS DECIMAL(28,8))) AS DOUBLE) AS ssq
        |      FROM terms)
        |SELECT k, n,
        | floor((sqn - sx * sx / CAST(n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS ssb,
        | floor((ssq - sqn) * 10000.0 + 0.5) / 10000.0 AS ssw,
        | floor(((sqn - sx * sx / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |       / ((ssq - sqn) / CAST(n - k AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS f
        |FROM a""".stripMargin,

    "q_cohens_d" ->
      """WITH a AS (
        |  SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssb
        |  FROM orders)
        |SELECT n_a, n_b,
        | floor((sa / CAST(n_a AS DOUBLE) - sb / CAST(n_b AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_diff,
        | floor((sa / CAST(n_a AS DOUBLE) - sb / CAST(n_b AS DOUBLE))
        |       / sqrt(((CAST(n_a AS DOUBLE) - 1.0)
        |               * ((ssa - sa * sa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |              + (CAST(n_b AS DOUBLE) - 1.0)
        |               * ((ssb - sb * sb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)))
        |              / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))
        |       * 10000.0 + 0.5) / 10000.0 AS cohens_d
        |FROM a""".stripMargin,

    "q_dup_cluster_hist" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars // 8 AS blk,
        |                            substr(text, 1, 40) AS head
        |                     FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |      FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk
        |                       AND a.doc_id < b.doc_id
        |      WHERE levenshtein(a.head, b.head) <= 8),
        |e AS (SELECT a_id AS src, b_id AS dst FROM p
        |      UNION SELECT b_id, a_id FROM p),
        |reach AS (
        |  SELECT src AS node, dst AS label FROM e
        |  UNION
        |  SELECT r.node, e2.dst FROM reach r JOIN e e2 ON r.label = e2.src),
        |comp AS (SELECT node, least(node, min(label)) AS component_id
        |         FROM reach GROUP BY node),
        |assign AS (SELECT doc.doc_id,
        |                  coalesce(c.component_id, doc.doc_id) AS component_id
        |           FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node),
        |sz AS (SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM assign GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters,
        |       min(component_id) AS example_component
        |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "q_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0)) * CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0)) * CAST(da.deg AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(db.deg AS DECIMAL(38,0)) * CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS syy
        |  FROM e JOIN deg da ON e.src = da.src JOIN deg db ON e.dst = db.src)
        |SELECT n_edges,
        | floor((n_edges * sxy - sx * sy) /
        |       (sqrt(n_edges * sxx - sx * sx) * sqrt(n_edges * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS assortativity
        |FROM g""".stripMargin,

    "q_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(c) AS BIGINT) AS sc,
        |         CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS scc
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sc AS n_events,
        | floor(((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |        / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |       / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS fano,
        | floor((sqrt((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |             / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |        - CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       / (sqrt((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |               / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |          + CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS burstiness
        |FROM g ORDER BY event_type""".stripMargin,

    "q_new_vs_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
        |SELECT ud.day, count(*) AS active_users,
        | CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        | count(*) - CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
        |FROM ud JOIN f USING (user_id)
        |GROUP BY ud.day ORDER BY ud.day""".stripMargin,

    "q_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_words, n_alpha, CAST(n_stops AS BIGINT) AS n_stopwords,
        |         CAST(length(text) - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mwl
        |  FROM d)
        |SELECT doc_id, n_words,
        | floor(mwl * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
        | n_alpha AS n_alpha_words, n_stopwords,
        | (n_words >= 20 AND n_words <= 1000) AS r_word_count,
        | (mwl >= 3.0 AND mwl <= 10.0) AS r_mean_word_len,
        | (n_alpha * 5 >= n_words * 4) AS r_alpha_ratio,
        | (n_stopwords >= 2) AS r_stopwords,
        | ((n_words >= 20 AND n_words <= 1000) AND (mwl >= 3.0 AND mwl <= 10.0)
        |  AND (n_alpha * 5 >= n_words * 4) AND (n_stopwords >= 2)) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_heaps_law" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s),
        |novel AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |         CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel
        |  FROM sh JOIN f USING (s) GROUP BY sh.doc_id)
        |SELECT doc_id, n_shingles, novel,
        | CAST(sum(novel) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |FROM novel ORDER BY doc_id""".stripMargin,

    "q_scd3" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'signup')
        |SELECT user_id,
        | max(CASE WHEN rn = 1 THEN cents END) AS cur_cents,
        | max(CASE WHEN rn = 2 THEN cents END) AS prior_cents,
        | max(CASE WHEN rn = 1 THEN ts_us END) AS changed_at_us,
        | CAST(count(*) AS BIGINT) AS n_versions
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_periodic_snapshot" ->
      """WITH monthly AS (
        |  SELECT l_suppkey AS s_suppkey,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(date_trunc('month', min(l_shipdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', max(l_shipdate)) AS DATE) AS hi
        |  FROM lineitem),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM bounds),
        |grid AS (SELECT s.s_suppkey, sp.m FROM supplier s CROSS JOIN spine sp),
        |filled AS (
        |  SELECT g.s_suppkey, g.m,
        |         COALESCE(mo.qty, CAST(0 AS DECIMAL(18,2))) AS q
        |  FROM grid g LEFT JOIN monthly mo
        |    ON g.s_suppkey = mo.s_suppkey AND g.m = mo.m)
        |SELECT s_suppkey, m, CAST(q AS DOUBLE) AS qty_shipped,
        | CAST(sum(q) OVER (PARTITION BY s_suppkey ORDER BY m
        |                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS balance
        |FROM filled ORDER BY s_suppkey, m""".stripMargin,

    "q_accumulating_snapshot" ->
      """WITH ms AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         min(CAST(l_shipdate AS DATE)) AS first_ship,
        |         max(CAST(l_shipdate AS DATE)) AS last_ship,
        |         CAST(count(*) AS BIGINT) AS n_lines,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS placed,
        | ms.first_ship, ms.last_ship, ms.n_lines,
        | CAST(ms.qty AS DOUBLE) AS total_qty,
        | CAST(date_diff('day', CAST(o.o_orderdate AS DATE), ms.first_ship) AS BIGINT) AS days_to_first_ship,
        | CAST(date_diff('day', ms.first_ship, ms.last_ship) AS BIGINT) AS ship_span_days
        |FROM orders o JOIN ms ON o.o_orderkey = ms.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_welch_t" ->
      """WITH agg AS (
        |  SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssb
        |  FROM orders),
        |m AS (
        |  SELECT n_a, n_b, sa, sb, ssa, ssb,
        |         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd
        |  FROM agg),
        |v AS (
        |  SELECT n_a, n_b, nad, nbd, sa / nad AS ma, sb / nbd AS mb,
        |         ((ssa - sa * sa / nad) / (nad - 1.0)) / nad AS sea,
        |         ((ssb - sb * sb / nbd) / (nbd - 1.0)) / nbd AS seb
        |  FROM m)
        |SELECT n_a, n_b,
        | floor(ma * 10000.0 + 0.5) / 10000.0 AS mean_a,
        | floor(mb * 10000.0 + 0.5) / 10000.0 AS mean_b,
        | floor(((ma - mb) / sqrt(sea + seb)) * 10000.0 + 0.5) / 10000.0 AS t,
        | floor(((sea + seb) * (sea + seb)
        |        / (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0))) * 10000.0 + 0.5) / 10000.0 AS df
        |FROM v""".stripMargin,

    "q_theil_sen" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         year(l_shipdate) * 12 + month(l_shipdate) AS mi,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.grp, a.mi, b.mi AS mj,
        |         CAST(b.v - a.v AS DOUBLE) / CAST(b.mi - a.mi AS DOUBLE) AS slope
        |  FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.mi < b.mi),
        |ranked AS (
        |  SELECT grp, slope,
        |         row_number() OVER (PARTITION BY grp ORDER BY slope, mi, mj) AS rn,
        |         count(*) OVER (PARTITION BY grp) AS k
        |  FROM pairs)
        |SELECT grp AS l_returnflag, CAST(k AS BIGINT) AS n_pairs,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS sen_slope
        |FROM ranked WHERE rn * 2 = k OR rn * 2 = k + 1
        |ORDER BY l_returnflag""".stripMargin,

    "q_adamic_adar" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM items x JOIN items y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |sc AS (
        |  SELECT w1.u AS x, w2.u AS y, CAST(count(*) AS BIGINT) AS n_common,
        |         sum(CAST(1.0 / ln(CAST(deg.deg AS DOUBLE)) AS DECIMAL(28,8))) AS aa_sum
        |  FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
        |  JOIN deg ON deg.v = w1.v
        |  GROUP BY 1, 2)
        |SELECT sc.x AS part_a, sc.y AS part_b, sc.n_common,
        | floor(CAST(aa_sum AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS aa_score
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = sc.x AND e.b = sc.y)
        |ORDER BY part_a, part_b""".stripMargin,

    "q_js_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |cs AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cs
        |       FROM tok WHERE term <> '' GROUP BY 1, 2),
        |vocab AS (SELECT term, CAST(sum(cs) AS BIGINT) AS cg FROM cs GROUP BY term),
        |st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM cs GROUP BY source),
        |ngt AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM vocab),
        |grid AS (
        |  SELECT st.source, st.ns,
        |         CAST(COALESCE(c2.cs, 0) AS DOUBLE) AS csd,
        |         CAST(v.cg AS DOUBLE) AS cgd,
        |         CAST(ngt.ng AS DOUBLE) AS ngd
        |  FROM st CROSS JOIN vocab v CROSS JOIN ngt
        |  LEFT JOIN cs c2 ON c2.source = st.source AND c2.term = v.term),
        |terms AS (
        |  SELECT source, ns,
        |    CAST(CASE WHEN csd > 0 THEN (csd / CAST(ns AS DOUBLE))
        |         * ln((csd / CAST(ns AS DOUBLE))
        |              / (((csd / CAST(ns AS DOUBLE)) + (cgd / ngd)) / 2.0))
        |         ELSE 0.0 END AS DECIMAL(28,8)) AS tp,
        |    CAST((cgd / ngd)
        |         * ln((cgd / ngd)
        |              / (((csd / CAST(ns AS DOUBLE)) + (cgd / ngd)) / 2.0))
        |         AS DECIMAL(28,8)) AS tq
        |  FROM grid)
        |SELECT source, max(ns) AS n_tokens,
        | floor(0.5 * (CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS js_nats
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    "q_zipf_slope" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |         FROM tok WHERE term <> '' GROUP BY term),
        |ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM freq),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) AS DECIMAL(28,8))) AS sxx
        |  FROM ranked),
        |sl AS (
        |  SELECT n_terms,
        |         CAST(n_terms AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |         CAST(sy AS DOUBLE) AS syd,
        |         (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM agg)
        |SELECT n_terms,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS zipf_slope,
        | floor(((syd - slope * sxd) / nd) * 10000.0 + 0.5) / 10000.0 AS intercept
        |FROM sl""".stripMargin,

    "q_label_prop" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS lab FROM adj),
        |n1 AS (SELECT adj.v, l0.lab, count(*) AS cnt FROM adj JOIN l0 ON l0.v = adj.u GROUP BY 1, 2),
        |l1 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n1)
        |       WHERE cnt = mc GROUP BY v),
        |n2 AS (SELECT adj.v, l1.lab, count(*) AS cnt FROM adj JOIN l1 ON l1.v = adj.u GROUP BY 1, 2),
        |l2 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n2)
        |       WHERE cnt = mc GROUP BY v),
        |n3 AS (SELECT adj.v, l2.lab, count(*) AS cnt FROM adj JOIN l2 ON l2.v = adj.u GROUP BY 1, 2),
        |l3 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n3)
        |       WHERE cnt = mc GROUP BY v)
        |SELECT v AS brand, lab AS community FROM l3 ORDER BY brand""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT m, rev,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS s1,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS c1,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS s2,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS c2
        |  FROM monthly),
        |dt AS (
        |  SELECT m, rev,
        |         CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS trend
        |  FROM tr),
        |dt2 AS (SELECT m, rev, trend, CAST(rev AS DOUBLE) - trend AS det FROM dt),
        |sidx AS (
        |  SELECT month(m) AS moy,
        |         CAST(sum(CAST(det AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS raw
        |  FROM dt2 WHERE det IS NOT NULL GROUP BY 1),
        |m0 AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS m0 FROM sidx),
        |season AS (SELECT moy, raw - m0.m0 AS seasonal FROM sidx CROSS JOIN m0)
        |SELECT dt2.m,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
        | floor(seasonal * 10000.0 + 0.5) / 10000.0 AS seasonal,
        | floor((det - seasonal) * 10000.0 + 0.5) / 10000.0 AS resid
        |FROM dt2 LEFT JOIN season ON month(dt2.m) = season.moy
        |ORDER BY dt2.m""".stripMargin,

    "q_churn" ->
      """WITH cm AS (
        |  SELECT DISTINCT o_custkey AS ck,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |  FROM orders),
        |nxt AS (SELECT ck, CAST(m - INTERVAL 1 MONTH AS DATE) AS m, 1 AS nx FROM cm),
        |j AS (
        |  SELECT cm.m, count(*) AS active,
        |         CAST(sum(CASE WHEN nxt.nx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS churned
        |  FROM cm LEFT JOIN nxt ON cm.ck = nxt.ck AND cm.m = nxt.m
        |  GROUP BY cm.m),
        |mx AS (SELECT max(m) AS max_m FROM cm)
        |SELECT m, active, churned,
        | floor((CAST(churned AS DOUBLE) / CAST(active AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS churn_rate
        |FROM j CROSS JOIN mx WHERE m < max_m ORDER BY m""".stripMargin,

    "q_weighted_median" ->
      """WITH grain AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT grp, v, w,
        |         sum(w) OVER (PARTITION BY grp ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
        |         sum(w) OVER (PARTITION BY grp) AS tw
        |  FROM grain)
        |SELECT grp AS l_returnflag, CAST(max(tw) AS BIGINT) AS total_weight,
        | floor((CAST(min(v) AS DOUBLE) / 100.0) * 10000.0 + 0.5) / 10000.0 AS weighted_median
        |FROM c WHERE 2 * cw >= tw GROUP BY grp ORDER BY grp""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang, CAST(strlen(text) AS BIGINT) AS nb,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(nb) AS BIGINT) AS total_bytes,
        | CAST(sum(ws) AS BIGINT) AS ws_tokens,
        | CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        | floor((CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS fertility,
        | floor((CAST(sum(nb) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS bytes_per_token
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_event_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |tri AS (
        |  SELECT event_type AS e1,
        |         lead(event_type, 1) OVER w AS e2,
        |         lead(event_type, 2) OVER w AS e3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |c AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |      FROM tri WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(n) AS n_total FROM c)
        |SELECT e1, e2, e3, n,
        | floor((CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM c CROSS JOIN tot ORDER BY e1, e2, e3""".stripMargin,

    "q_survival_km" ->
      """WITH pc AS (
        |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |         max(CAST(o_orderdate AS DATE)) AS l
        |  FROM orders GROUP BY 1),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (
        |  SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
        |         CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |  FROM pc CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM grain),
        |curve AS (
        |  SELECT t, d, c,
        |         n_total - COALESCE(sum(c) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM grain CROSS JOIN tot),
        |terms AS (
        |  SELECT t, d, n_risk,
        |         CASE WHEN d > 0 AND n_risk > d
        |              THEN CAST(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS DECIMAL(28,8))
        |              ELSE CAST(0 AS DECIMAL(28,8)) END AS term,
        |         CASE WHEN n_risk = d THEN 1 ELSE 0 END AS z0
        |  FROM curve),
        |acc AS (
        |  SELECT t, d, n_risk,
        |         max(z0) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zero,
        |         sum(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum
        |  FROM terms)
        |SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
        | d AS deaths,
        | CASE WHEN zero = 1 THEN 0.0
        |      ELSE floor(exp(CAST(lnsum AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 END AS survival
        |FROM acc WHERE d > 0 ORDER BY duration_days""".stripMargin,

    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck, year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |first AS (SELECT ck, min(mi) AS cohort FROM o GROUP BY ck),
        |cells AS (
        |  SELECT f.cohort, o.mi - f.cohort AS age, sum(o.v) AS rev
        |  FROM o JOIN first f ON o.ck = f.ck GROUP BY 1, 2),
        |sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
        |          FROM first GROUP BY cohort)
        |SELECT CAST(c.cohort AS BIGINT) AS cohort, CAST(c.age AS BIGINT) AS age,
        | s.n_customers,
        | CAST(c.rev AS DOUBLE) AS revenue,
        | CAST(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
        |        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue,
        | floor((CAST(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(s.n_customers AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS ltv_per_customer
        |FROM cells c JOIN sizes s ON c.cohort = s.cohort
        |ORDER BY cohort, age""".stripMargin,

    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d, rc,
        |         sum(rc) OVER win AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) OVER win AS ss,
        |         count(*) OVER win AS c
        |  FROM daily WINDOW win AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT d, rc,
        |         CAST(s AS DOUBLE) / 20.0 / 100.0 AS mean,
        |         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 20.0) / 20.0) / 100.0 AS sd
        |  FROM w WHERE c = 20)
        |SELECT d,
        | floor(CAST(rc AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(mean * 10000.0 + 0.5) / 10000.0 AS mid,
        | floor((mean + 2.0 * sd) * 10000.0 + 0.5) / 10000.0 AS upper,
        | floor((mean - 2.0 * sd) * 10000.0 + 0.5) / 10000.0 AS lower,
        | (CAST(rc AS DOUBLE) / 100.0 > mean + 2.0 * sd OR CAST(rc AS DOUBLE) / 100.0 < mean - 2.0 * sd) AS breakout
        |FROM m ORDER BY d""".stripMargin,

    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT d, rev,
        |         max(rev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM daily)
        |SELECT d,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(peak AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS peak,
        | floor((CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS drawdown
        |FROM p ORDER BY d""".stripMargin,

    "q_seasonal_strength" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT m, rev,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS s1,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS c1,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS s2,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS c2
        |  FROM monthly),
        |dt2 AS (
        |  SELECT m, rev,
        |         CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS trend,
        |         CAST(rev AS DOUBLE) - CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS det
        |  FROM tr),
        |sidx AS (
        |  SELECT month(m) AS moy,
        |         CAST(sum(CAST(det AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS raw
        |  FROM dt2 WHERE det IS NOT NULL GROUP BY 1),
        |m0 AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS m0 FROM sidx),
        |comp AS (
        |  SELECT floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
        |         floor((raw - m0.m0) * 10000.0 + 0.5) / 10000.0 AS seasonal,
        |         floor((det - (raw - m0.m0)) * 10000.0 + 0.5) / 10000.0 AS resid
        |  FROM dt2 LEFT JOIN sidx ON month(dt2.m) = sidx.moy CROSS JOIN m0
        |  WHERE det IS NOT NULL AND sidx.raw IS NOT NULL),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_months,
        |         sum(CAST(resid AS DECIMAL(28,8))) AS r_s,
        |         sum(CAST(resid * resid AS DECIMAL(28,8))) AS r_ss,
        |         sum(CAST(seasonal + resid AS DECIMAL(28,8))) AS sr_s,
        |         sum(CAST((seasonal + resid) * (seasonal + resid) AS DECIMAL(28,8))) AS sr_ss,
        |         sum(CAST(trend + resid AS DECIMAL(28,8))) AS tr_s,
        |         sum(CAST((trend + resid) * (trend + resid) AS DECIMAL(28,8))) AS tr_ss
        |  FROM comp)
        |SELECT n_months,
        | floor(greatest(0.0, 1.0 -
        |   ((CAST(r_ss AS DOUBLE) - CAST(r_s AS DOUBLE) * CAST(r_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE))
        |   / ((CAST(sr_ss AS DOUBLE) - CAST(sr_s AS DOUBLE) * CAST(sr_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE)))
        |   * 10000.0 + 0.5) / 10000.0 AS f_seasonal,
        | floor(greatest(0.0, 1.0 -
        |   ((CAST(r_ss AS DOUBLE) - CAST(r_s AS DOUBLE) * CAST(r_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE))
        |   / ((CAST(tr_ss AS DOUBLE) - CAST(tr_s AS DOUBLE) * CAST(tr_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE)))
        |   * 10000.0 + 0.5) / 10000.0 AS f_trend
        |FROM mo""".stripMargin,

    "q_langid_confusion" ->
      """WITH f AS (
        |  SELECT lang,
        |    CASE WHEN CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |              + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS DOUBLE)
        |              * 100.0 / CAST(length(text) AS DOUBLE) >= 3.0
        |         THEN 'en' ELSE 'other' END AS lang_pred
        |  FROM documents),
        |cells AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        |          FROM f GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(n) AS n_lang FROM cells GROUP BY lang)
        |SELECT c.lang, c.lang_pred, c.n,
        | floor((CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cells c JOIN tot t ON c.lang = t.lang
        |ORDER BY c.lang, c.lang_pred""".stripMargin,

    "q_percentile_cont" ->
      """WITH grain AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |ps AS (
        |  SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0,
        |         sum(c) OVER () AS n
        |  FROM grain),
        |pp AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p),
        |j AS (
        |  SELECT ps.*, pp.p,
        |         CAST(n - 1 AS DOUBLE) * p AS h,
        |         CAST(floor(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) AS k
        |  FROM ps CROSS JOIN pp),
        |j2 AS (
        |  SELECT *, least(k + 1, n - 1) AS k2,
        |         (cum0 <= k AND k < cum0 + c) AS in_k,
        |         (cum0 <= least(k + 1, n - 1) AND least(k + 1, n - 1) < cum0 + c) AS in_k2
        |  FROM j),
        |sel AS (
        |  SELECT p, CAST(max(n) AS BIGINT) AS n, max(h) AS h,
        |         min(CASE WHEN in_k THEN v END) AS vlo,
        |         min(CASE WHEN in_k2 THEN v END) AS vhi
        |  FROM j2 WHERE in_k OR in_k2 GROUP BY p)
        |SELECT p, n,
        | floor((CAST(vlo AS DOUBLE) / 100.0
        |        + (h - floor(h)) * (CAST(vhi AS DOUBLE) / 100.0 - CAST(vlo AS DOUBLE) / 100.0))
        |       * 10000.0 + 0.5) / 10000.0 AS value
        |FROM sel ORDER BY p""".stripMargin,

    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t_signup
        |       FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |p0 AS (
        |  SELECT e.user_id, s0.t_signup, min(e.ts_us) AS t_purchase
        |  FROM e JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s0.t_signup
        |  GROUP BY e.user_id, s0.t_signup),
        |lags AS (SELECT t_purchase - t_signup AS lag_us FROM p0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |         floor(quantile_cont(lag_us, 0.25) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p25_minutes,
        |         floor(quantile_cont(lag_us, 0.5) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p50_minutes,
        |         floor(quantile_cont(lag_us, 0.75) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p75_minutes,
        |         floor(quantile_cont(lag_us, 0.9) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p90_minutes
        |  FROM lags),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM s0)
        |SELECT n_signup, n_converted,
        | floor((CAST(n_converted AS DOUBLE) / CAST(n_signup AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS conv_rate,
        | p25_minutes, p50_minutes, p75_minutes, p90_minutes
        |FROM agg CROSS JOIN ns""".stripMargin,

    "q_emerging_terms" ->
      """WITH mid AS (SELECT quantile_cont(doc_id, 0.5) AS mid FROM documents),
        |tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term, doc_id <= mid.mid AS early
        |  FROM documents CROSS JOIN mid),
        |counts AS (
        |  SELECT term,
        |         CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS early_n,
        |         CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS late_n
        |  FROM tok WHERE term <> '' GROUP BY term)
        |SELECT term, early_n, late_n,
        | floor((CAST(late_n + 1 AS DOUBLE) / CAST(early_n + 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS growth
        |FROM counts
        |ORDER BY CAST(late_n + 1 AS DOUBLE) / CAST(early_n + 1 AS DOUBLE) DESC, term
        |LIMIT 50""".stripMargin,

    "q_attribution_decay" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
        |conv AS (
        |  SELECT user_id, ts_us AS tc, event_id AS cid,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM e WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, ts_us AS tt, event_type AS channel
        |  FROM e WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT conv.user_id, conv.cid, conv.vc, touch.channel,
        |         exp(CAST(touch.tt - conv.tc AS DOUBLE) / 86400000000.0) AS w
        |  FROM conv JOIN touch ON conv.user_id = touch.user_id
        |  WHERE touch.tt < conv.tc AND conv.tc - touch.tt <= 604800000000),
        |ct AS (
        |  SELECT user_id, cid, vc, channel,
        |         sum(CAST(w AS DECIMAL(28,8))) AS wt,
        |         CAST(count(*) AS BIGINT) AS n_touches
        |  FROM j GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT user_id, cid, sum(wt) AS wtot FROM ct GROUP BY 1, 2),
        |credit AS (
        |  SELECT ct.channel, ct.n_touches,
        |         CAST(CAST(ct.wt AS DOUBLE) / CAST(tot.wtot AS DOUBLE)
        |              * (CAST(ct.vc AS DOUBLE) / 100.0) AS DECIMAL(28,8)) AS cr
        |  FROM ct JOIN tot ON ct.user_id = tot.user_id AND ct.cid = tot.cid)
        |SELECT channel, CAST(sum(n_touches) AS BIGINT) AS n_touches,
        | CAST(count(*) AS BIGINT) AS n_conversion_links,
        | floor(CAST(sum(cr) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS credited_revenue
        |FROM credit GROUP BY channel ORDER BY channel""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT d,
        |         count(*) OVER w AS i,
        |         sum(rc) OVER w AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) OVER w AS q
        |  FROM daily WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT max(i) AS n, max(s) AS st, max(q) AS qt FROM pre),
        |cand AS (
        |  SELECT d, i, s, n, st, qt,
        |         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(i AS DOUBLE))
        |         + ((CAST(qt AS DOUBLE) - CAST(q AS DOUBLE))
        |            - (CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) * (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))
        |              / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) AS cost
        |  FROM pre CROSS JOIN tot WHERE i < n)
        |SELECT d AS split_after, CAST(i AS BIGINT) AS n_left,
        | CAST(n - i AS BIGINT) AS n_right,
        | floor(CAST(s AS DOUBLE) / CAST(i AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_left,
        | floor((CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS mean_right,
        | floor((((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) - cost)
        |        / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS improvement_ratio
        |FROM cand ORDER BY cost, d LIMIT 1""".stripMargin,

    "q_abc_xyz" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT pk, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, pk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(rev) OVER () AS total
        |  FROM rev),
        |abc AS (
        |  SELECT pk,
        |         floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |         CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |              WHEN cum * 100 <= total * 95 THEN 'B'
        |              ELSE 'C' END AS abc_class
        |  FROM c),
        |monthly AS (
        |  SELECT l_partkey AS pk, CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qc
        |  FROM lineitem GROUP BY 1, 2),
        |stats AS (
        |  SELECT pk, CAST(count(*) AS BIGINT) AS nm,
        |         CAST(sum(qc) AS BIGINT) AS sq,
        |         sum(CAST(CAST(qc AS DECIMAL(19,0)) * qc AS DECIMAL(38,0))) AS qq
        |  FROM monthly GROUP BY pk),
        |xyz AS (
        |  SELECT pk,
        |         CASE WHEN nm < 2 THEN 'Z'
        |              WHEN sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE))
        |                        / (CAST(nm AS DOUBLE) - 1.0))
        |                   / (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)) < 0.5 THEN 'X'
        |              WHEN sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE))
        |                        / (CAST(nm AS DOUBLE) - 1.0))
        |                   / (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)) < 1.0 THEN 'Y'
        |              ELSE 'Z' END AS xyz_class
        |  FROM stats)
        |SELECT abc.abc_class, xyz.xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
        | floor(CAST(sum(CAST(abc.revenue AS DECIMAL(18,4))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM abc JOIN xyz ON abc.pk = xyz.pk
        |GROUP BY 1, 2 ORDER BY abc_class, xyz_class""".stripMargin,

    "q_price_elasticity" ->
      """WITH li AS (
        |  SELECT p_brand,
        |         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT) AS upc,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(CAST(qc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) * ln(CAST(qc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) * ln(CAST(upc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sxx
        |  FROM li GROUP BY 1),
        |sl AS (
        |  SELECT p_brand, n,
        |         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM g)
        |SELECT p_brand, n,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS elasticity,
        | floor(((syd - slope * sxd) / nd) * 10000.0 + 0.5) / 10000.0 AS intercept
        |FROM sl ORDER BY p_brand""".stripMargin,

    "q_disorder_rate" ->
      """WITH p AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderkey) AS prev_d
        |  FROM orders),
        |pairs AS (
        |  SELECT CASE WHEN d < prev_d
        |              THEN CAST(date_diff('day', d, prev_d) AS BIGINT) END AS late_days
        |  FROM p WHERE prev_d IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(count(late_days) AS BIGINT) AS n_inversions,
        | floor((CAST(count(late_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS disorder_rate,
        | max(late_days) AS max_late_days,
        | floor(quantile_cont(late_days, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99_late_days
        |FROM pairs""".stripMargin,

    "q_dup_by_source" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars // 8 AS blk,
        |                            substr(text, 1, 40) AS head
        |                     FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |      FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk
        |                       AND a.doc_id < b.doc_id
        |      WHERE levenshtein(a.head, b.head) <= 8),
        |e AS (SELECT a_id AS src, b_id AS dst FROM p
        |      UNION SELECT b_id, a_id FROM p),
        |reach AS (
        |  SELECT src AS node, dst AS label FROM e
        |  UNION
        |  SELECT r.node, e2.dst FROM reach r JOIN e e2 ON r.label = e2.src),
        |comp AS (SELECT node, least(node, min(label)) AS component_id
        |         FROM reach GROUP BY node),
        |assign AS (
        |  SELECT doc.doc_id, doc.source,
        |         coalesce(c.component_id, doc.doc_id) AS component_id,
        |         doc.doc_id = coalesce(c.component_id, doc.doc_id) AS is_canonical
        |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node),
        |sizes AS (SELECT component_id, count(*) AS csize FROM assign GROUP BY 1)
        |SELECT a.source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN s.csize >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
        | CAST(sum(CASE WHEN NOT a.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        | floor((CAST(sum(CASE WHEN NOT a.is_canonical THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS drop_rate
        |FROM assign a JOIN sizes s ON a.component_id = s.component_id
        |GROUP BY a.source ORDER BY a.source""".stripMargin,

    "q_interpurchase" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day',
        |           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |             ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders),
        |gg AS (SELECT o_custkey, gap_days FROM g WHERE gap_days IS NOT NULL)
        |SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
        | floor((CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_gap_days,
        | floor(quantile_cont(gap_days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_gap_days,
        | floor(quantile_cont(gap_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_gap_days
        |FROM gg JOIN customer c ON gg.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "q_filter_budget" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops,
        |         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mwl
        |  FROM documents),
        |f AS (
        |  SELECT n_words,
        |         (n_words >= 20 AND n_words <= 1000) AS r_wc,
        |         (mwl >= 3.0 AND mwl <= 10.0) AS r_mwl,
        |         (n_alpha * 5 >= n_words * 4) AS r_ar,
        |         (n_stops >= 2) AS r_sw
        |  FROM d),
        |agg AS (
        |  SELECT CAST(sum(n_words) AS BIGINT) AS total_tokens,
        |         CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS d_wc,
        |         CAST(sum(CASE WHEN NOT r_wc THEN n_words ELSE 0 END) AS BIGINT) AS t_wc,
        |         CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS d_mwl,
        |         CAST(sum(CASE WHEN NOT r_mwl THEN n_words ELSE 0 END) AS BIGINT) AS t_mwl,
        |         CAST(sum(CASE WHEN NOT r_ar THEN 1 ELSE 0 END) AS BIGINT) AS d_ar,
        |         CAST(sum(CASE WHEN NOT r_ar THEN n_words ELSE 0 END) AS BIGINT) AS t_ar,
        |         CAST(sum(CASE WHEN NOT r_sw THEN 1 ELSE 0 END) AS BIGINT) AS d_sw,
        |         CAST(sum(CASE WHEN NOT r_sw THEN n_words ELSE 0 END) AS BIGINT) AS t_sw,
        |         CAST(sum(CASE WHEN NOT (r_wc AND r_mwl AND r_ar AND r_sw) THEN 1 ELSE 0 END) AS BIGINT) AS d_all,
        |         CAST(sum(CASE WHEN NOT (r_wc AND r_mwl AND r_ar AND r_sw) THEN n_words ELSE 0 END) AS BIGINT) AS t_all
        |  FROM f),
        |rows_ AS (
        |  SELECT 'alpha_ratio' AS rule, d_ar AS n_docs_failing, t_ar AS tokens_removed, total_tokens FROM agg
        |  UNION ALL SELECT 'composite', d_all, t_all, total_tokens FROM agg
        |  UNION ALL SELECT 'mean_word_len', d_mwl, t_mwl, total_tokens FROM agg
        |  UNION ALL SELECT 'stopwords', d_sw, t_sw, total_tokens FROM agg
        |  UNION ALL SELECT 'word_count', d_wc, t_wc, total_tokens FROM agg)
        |SELECT rule, n_docs_failing, tokens_removed, total_tokens,
        | floor((CAST(tokens_removed AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS pct_tokens
        |FROM rows_ ORDER BY rule""".stripMargin,

    "q_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |         FROM tok WHERE term <> '' GROUP BY term),
        |r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r,
        |         sum(c) OVER (ORDER BY c DESC, term ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(c) OVER () AS total
        |  FROM freq),
        |n AS (SELECT CAST(max(r) AS BIGINT) AS n_terms FROM r),
        |kk AS (
        |  SELECT k, least(CAST(k AS BIGINT), n_terms) AS r
        |  FROM (SELECT unnest([5, 10, 20, 50]) AS k) CROSS JOIN n)
        |SELECT CAST(kk.k AS INTEGER) AS k, kk.r AS vocab_used,
        | floor((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS coverage
        |FROM r JOIN kk ON r.r = kk.r ORDER BY k""".stripMargin,

    "q_return_rate_ci" ->
      """WITH g AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |w AS (
        |  SELECT p_brand, n, k,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |         1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE) AS denom
        |  FROM g)
        |SELECT p_brand, n, k AS returns,
        | floor(p * 10000.0 + 0.5) / 10000.0 AS return_rate,
        | floor((((p + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom)
        |        - (1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
        |                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / denom))
        |       * 10000.0 + 0.5) / 10000.0 AS wilson_lo,
        | floor((((p + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom)
        |        + (1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
        |                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / denom))
        |       * 10000.0 + 0.5) / 10000.0 AS wilson_hi
        |FROM w ORDER BY p_brand""".stripMargin,

    "q_leadtime_percentiles" ->
      """WITH lags AS (
        |  SELECT l_suppkey,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_lines,
        | floor((CAST(sum(lag_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_days,
        | floor(quantile_cont(lag_days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_days,
        | floor(quantile_cont(lag_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_days,
        | max(lag_days) AS max_days
        |FROM lags
        |JOIN supplier s ON lags.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_basket_size_hist" ->
      """WITH sizes AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders_total FROM sizes)
        |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
        | floor((CAST(count(*) AS DOUBLE) / CAST(n_orders_total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM sizes CROSS JOIN tot GROUP BY n_lines, n_orders_total
        |ORDER BY n_lines""".stripMargin,

    "q_dedup_threshold_curve" ->
      """WITH d AS (SELECT doc_id, lang, n_chars // 200 AS blk, string_split(text, ' ') AS w
        |           FROM documents),
        |sarr AS (SELECT doc_id, lang, blk,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, lang, blk, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
        |      FROM e a JOIN e b ON a.lang = b.lang AND a.blk = b.blk AND a.s = b.s
        |                        AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b, c, CAST(za.nsh + zb.nsh - c AS BIGINT) AS u
        |  FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b),
        |th AS (SELECT unnest([50, 60, 70, 80, 90]) AS threshold_pct)
        |SELECT CAST(th.threshold_pct AS INTEGER) AS threshold_pct,
        | CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(count(DISTINCT doc_b) AS BIGINT) AS n_droppable
        |FROM pairs CROSS JOIN th
        |WHERE c * 100 >= th.threshold_pct * u
        |GROUP BY th.threshold_pct ORDER BY threshold_pct""".stripMargin,

    "q_seasonal_mk" ->
      """WITH monthly AS (
        |  SELECT month(o_orderdate) AS moy, year(o_orderdate) AS yr,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT a.moy,
        |             CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.moy = b.moy AND a.yr < b.yr
        |      GROUP BY a.moy),
        |n AS (SELECT moy, CAST(count(*) AS BIGINT) AS n_years FROM monthly GROUP BY moy),
        |ties AS (SELECT moy, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |         FROM (SELECT moy, v, CAST(count(*) AS BIGINT) AS t
        |               FROM monthly GROUP BY moy, v)
        |         GROUP BY moy),
        |per AS (
        |  SELECT n.moy, n.n_years, s.s,
        |         CAST(n.n_years * (n.n_years - 1) * (2 * n.n_years + 5) - ties.tsum AS BIGINT) AS var18
        |  FROM n JOIN s ON n.moy = s.moy JOIN ties ON n.moy = ties.moy),
        |tot AS (
        |  SELECT 0 AS moy, CAST(sum(n_years) AS BIGINT) AS n_years,
        |         CAST(sum(s) AS BIGINT) AS s, CAST(sum(var18) AS BIGINT) AS var18
        |  FROM per)
        |SELECT CAST(moy AS BIGINT) AS moy, n_years, s, var18, CAST(NULL AS DOUBLE) AS z FROM per
        |UNION ALL
        |SELECT CAST(moy AS BIGINT), n_years, s, var18,
        | floor((CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
        |FROM tot ORDER BY moy""".stripMargin,

    "q_grubbs" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rc) AS BIGINT) AS s,
        |             sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) AS ss
        |      FROM daily),
        |sc AS (
        |  SELECT d, rc, n, s, ss,
        |         abs(CAST(rc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS dev,
        |         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |              / (CAST(n AS DOUBLE) - 1.0)) AS sd,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
        |  FROM daily CROSS JOIN m)
        |SELECT n AS n_days,
        | floor(mean / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_rev,
        | floor(sd / 100.0 * 10000.0 + 0.5) / 10000.0 AS sd_rev,
        | d AS outlier_day,
        | floor(CAST(rc AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS outlier_rev,
        | floor((dev / sd) * 10000.0 + 0.5) / 10000.0 AS g
        |FROM sc ORDER BY -dev, d LIMIT 1""".stripMargin,

    "q_hurst" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT rc, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM daily),
        |sizes AS (SELECT unnest([8, 16, 32, 64]) AS bn),
        |blk AS (
        |  SELECT s.bn, (i - 1) // s.bn AS b, i, rc FROM idx CROSS JOIN sizes s),
        |full_ AS (
        |  SELECT bn, b, i, rc,
        |         count(*) OVER (PARTITION BY bn, b) AS cnt,
        |         sum(rc) OVER (PARTITION BY bn, b) AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0)))
        |           OVER (PARTITION BY bn, b) AS ss,
        |         sum(rc) OVER (PARTITION BY bn, b ORDER BY i ROWS UNBOUNDED PRECEDING) AS cum,
        |         count(*) OVER (PARTITION BY bn, b ORDER BY i ROWS UNBOUNDED PRECEDING) AS k
        |  FROM blk),
        |z AS (
        |  SELECT bn, b, s, ss,
        |         CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(bn AS DOUBLE)) AS zv
        |  FROM full_ WHERE cnt = bn),
        |rs AS (
        |  SELECT bn,
        |         (max(zv) - min(zv))
        |         / sqrt((CAST(max(ss) AS DOUBLE) - CAST(max(s) AS DOUBLE) * CAST(max(s) AS DOUBLE)
        |                 / CAST(bn AS DOUBLE)) / CAST(bn AS DOUBLE)) AS rsv
        |  FROM z GROUP BY bn, b),
        |per AS (
        |  SELECT bn AS block_n, CAST(count(*) AS BIGINT) AS n_blocks,
        |         CAST(sum(CAST(rsv AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_rs
        |  FROM rs WHERE rsv IS NOT NULL GROUP BY bn),
        |fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(mean_rs) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) * ln(mean_rs) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) * ln(CAST(block_n AS DOUBLE)) AS DECIMAL(28,8))) AS sxx
        |  FROM per)
        |SELECT CAST(per.block_n AS INTEGER) AS block_n, per.n_blocks,
        | floor(per.mean_rs * 10000.0 + 0.5) / 10000.0 AS mean_rs,
        | floor(((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS hurst
        |FROM per CROSS JOIN fit ORDER BY block_n""".stripMargin,

    "q_kruskal_wallis" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         o_orderpriority AS grp
        |  FROM orders),
        |gv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cgv FROM o GROUP BY 1, 2),
        |vals AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS cnt FROM gv GROUP BY v),
        |cum AS (SELECT v, cnt,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |per AS (SELECT grp, CAST(sum(cgv) AS BIGINT) AS nj,
        |               sum(cgv * (2 * cumb + cnt + 1)) AS r2j
        |        FROM gv JOIN cum USING (v) GROUP BY grp),
        |ties AS (SELECT sum(cnt * cnt * cnt - cnt) AS tie3 FROM cum),
        |tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
        |               CAST(sum(CAST(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)
        |                             / 4.0 / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS rsum
        |        FROM per)
        |SELECT grp AS o_orderpriority, nj AS n,
        |       floor(CAST(r2j AS DOUBLE) / (2.0 * CAST(nj AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS mean_rank,
        |       CAST(NULL AS DOUBLE) AS h, CAST(NULL AS DOUBLE) AS h_tie
        |FROM per
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS DOUBLE),
        |       floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rsum
        |              - 3.0 * (CAST(n AS DOUBLE) + 1.0)) * 10000.0 + 0.5) / 10000.0,
        |       floor(((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rsum
        |               - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |              / (1.0 - CAST(tie3 AS DOUBLE)
        |                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |                    - CAST(n AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0
        |FROM tot CROSS JOIN ties
        |ORDER BY o_orderpriority""".stripMargin,

    "q_jarque_bera" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |anchor AS (SELECT CAST(sum(rc) // count(*) AS BIGINT) AS a FROM daily),
        |xs AS (SELECT CAST(rc - a AS DOUBLE) / 1000000.0 AS x
        |       FROM daily CROSS JOIN anchor),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(x AS DECIMAL(38,8))) AS s1,
        |             sum(CAST(x * x AS DECIMAL(38,8))) AS s2,
        |             sum(CAST(x * x * x AS DECIMAL(38,8))) AS s3,
        |             sum(CAST(x * x * x * x AS DECIMAL(38,8))) AS s4
        |      FROM xs),
        |c AS (SELECT n,
        |             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS dl,
        |             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |      FROM m),
        |cm AS (SELECT n,
        |              r2 - dl * dl AS m2,
        |              r3 - 3.0 * dl * r2 + 2.0 * dl * dl * dl AS m3,
        |              r4 - 4.0 * dl * r3 + 6.0 * dl * dl * r2
        |                 - 3.0 * dl * dl * dl * dl AS m4
        |       FROM c),
        |sk AS (SELECT n, m3 / (m2 * sqrt(m2)) AS skew,
        |              m4 / (m2 * m2) - 3.0 AS kx
        |       FROM cm)
        |SELECT n AS n_days,
        | floor(skew * 10000.0 + 0.5) / 10000.0 AS skewness,
        | floor(kx * 10000.0 + 0.5) / 10000.0 AS kurtosis_excess,
        | floor(CAST(n AS DOUBLE) / 6.0 * (skew * skew + kx * kx / 4.0)
        |       * 10000.0 + 0.5) / 10000.0 AS jb
        |FROM sk""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT rc, d,
        |                  CAST(row_number() OVER (ORDER BY rc, d) AS BIGINT) AS rn,
        |                  count(*) OVER () AS nn
        |           FROM daily),
        |med AS (SELECT rc AS med FROM ranked
        |        WHERE (rn * 2 = nn OR rn * 2 = nn + 1) AND rn * 2 <= nn + 1),
        |signs AS (SELECT d, CASE WHEN rc > med THEN 1 ELSE 0 END AS sg
        |          FROM daily CROSS JOIN med WHERE rc <> med),
        |brk AS (SELECT sg,
        |               CASE WHEN lag(sg) OVER (ORDER BY d) IS NULL
        |                      OR lag(sg) OVER (ORDER BY d) <> sg
        |                    THEN 1 ELSE 0 END AS b
        |        FROM signs),
        |agg AS (SELECT CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |               CAST(sum(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |               CAST(sum(b) AS BIGINT) AS runs
        |        FROM brk)
        |SELECT n_above, n_below, runs,
        | floor((CAST(runs AS DOUBLE)
        |        - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |           / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)) + 1.0))
        |       / sqrt(2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |              * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |                 - (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)))
        |              / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |                 * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |                 * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) - 1.0)))
        |       * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_levene" ->
      """WITH hist AS (
        |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS qv,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |wc AS (SELECT grp, qv, c,
        |              sum(c) OVER (PARTITION BY grp ORDER BY qv
        |                ROWS UNBOUNDED PRECEDING) AS cum,
        |              sum(c) OVER (PARTITION BY grp) AS ng
        |       FROM hist),
        |meds AS (SELECT grp, min(qv) AS med FROM wc WHERE cum * 2 >= ng GROUP BY grp),
        |zc AS (SELECT h.grp, c, abs(qv - med) AS z
        |       FROM hist h JOIN meds USING (grp)),
        |per AS (SELECT grp, CAST(sum(c) AS BIGINT) AS nj,
        |               CAST(sum(c * z) AS BIGINT) AS sz,
        |               sum(CAST(c AS HUGEINT) * z * z) AS szz
        |        FROM zc GROUP BY grp),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(nj) AS BIGINT) AS n,
        |               CAST(sum(sz) AS BIGINT) AS sz_all,
        |               CAST(sum(CAST(CAST(szz AS DOUBLE)
        |                             - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |                               / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS ssw,
        |               CAST(sum(CAST(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |                             / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS sb
        |        FROM per)
        |SELECT per.grp AS l_returnflag, per.nj AS n, meds.med AS median_qty,
        |       floor(CAST(per.sz AS DOUBLE) / CAST(per.nj AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_absdev,
        |       CAST(NULL AS DOUBLE) AS f
        |FROM per JOIN meds ON per.grp = meds.grp
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |       floor(((sb - CAST(sz_all AS DOUBLE) * CAST(sz_all AS DOUBLE)
        |                    / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
        |             / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |             * 10000.0 + 0.5) / 10000.0
        |FROM tot
        |ORDER BY l_returnflag""".stripMargin,

    "q_concurrent_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |                 ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM g),
        |sess AS (SELECT user_id, session_id, min(ts_us) AS st, max(ts_us) AS en
        |         FROM s GROUP BY 1, 2),
        |bounds AS (
        |  SELECT st AS bts, CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL
        |  SELECT en + 1, CAST(-1 AS BIGINT) FROM sess
        |  UNION ALL
        |  SELECT epoch_us(CAST(d AS TIMESTAMP)), CAST(0 AS BIGINT)
        |  FROM (SELECT unnest(generate_series(
        |                 CAST(make_timestamp(st) AS DATE) + 1,
        |                 CAST(make_timestamp(en) AS DATE),
        |                 INTERVAL 1 DAY)) AS d
        |        FROM sess
        |        WHERE CAST(make_timestamp(en) AS DATE)
        |              > CAST(make_timestamp(st) AS DATE))),
        |run AS (SELECT bts, delta,
        |               CAST(sum(delta) OVER (ORDER BY bts, delta DESC
        |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |        FROM bounds)
        |SELECT CAST(make_timestamp(bts) AS DATE) AS day,
        |       CAST(max(run) AS BIGINT) AS peak_concurrency,
        |       CAST(sum(CASE WHEN delta <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_boundaries
        |FROM run GROUP BY 1 ORDER BY day""".stripMargin,

    "q_interval_coverage" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |                   epoch_us(ts) + 600000000 AS e
        |            FROM events),
        |marked AS (
        |  SELECT user_id, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |                OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS new_island,
        |         event_id
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |               sum(new_island) OVER (PARTITION BY user_id
        |                 ORDER BY s, event_id ROWS UNBOUNDED PRECEDING) AS island
        |        FROM marked),
        |islands AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_ev,
        |                   min(s) AS i_s, max(e) AS i_e
        |            FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |       CAST(count(*) AS BIGINT) AS n_islands,
        |       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
        |       CAST(max(n_ev) AS BIGINT) AS max_island_events
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_reciprocity" ->
      """WITH seq AS (
        |  SELECT l_partkey AS a,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey) AS b
        |  FROM lineitem),
        |edges AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w
        |          FROM seq WHERE b IS NOT NULL AND b <> a GROUP BY 1, 2),
        |j AS (SELECT e.w, r.w AS wr
        |      FROM edges e LEFT JOIN edges r ON e.a = r.b AND e.b = r.a)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |       CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_recip,
        |       CAST(sum(w) AS BIGINT) AS total_w,
        |       CAST(sum(least(w, COALESCE(wr, 0))) AS BIGINT) AS recip_w,
        |       floor(CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS reciprocity,
        |       floor(CAST(sum(least(w, COALESCE(wr, 0))) AS DOUBLE)
        |             / CAST(sum(w) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS weighted_reciprocity
        |FROM j""".stripMargin,

    "q_mutual_info" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |               FROM documents GROUP BY 1, 2),
        |joint AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |                 sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slj
        |          FROM cells),
        |lm AS (SELECT sum(CAST(CAST(cl AS DOUBLE) * ln(CAST(cl AS DOUBLE))
        |                       AS DECIMAL(28,8))) AS sll
        |       FROM (SELECT sum(c) AS cl FROM cells GROUP BY lang)),
        |sm AS (SELECT sum(CAST(CAST(cs AS DOUBLE) * ln(CAST(cs AS DOUBLE))
        |                       AS DECIMAL(28,8))) AS sls
        |       FROM (SELECT sum(c) AS cs FROM cells GROUP BY source)),
        |h AS (SELECT n,
        |             ln(CAST(n AS DOUBLE)) - CAST(sll AS DOUBLE) / CAST(n AS DOUBLE) AS hl,
        |             ln(CAST(n AS DOUBLE)) - CAST(sls AS DOUBLE) / CAST(n AS DOUBLE) AS hs,
        |             ln(CAST(n AS DOUBLE)) - CAST(slj AS DOUBLE) / CAST(n AS DOUBLE) AS hj
        |      FROM joint CROSS JOIN lm CROSS JOIN sm)
        |SELECT n AS n_docs,
        | floor(hl * 10000.0 + 0.5) / 10000.0 AS h_lang,
        | floor(hs * 10000.0 + 0.5) / 10000.0 AS h_source,
        | floor(hj * 10000.0 + 0.5) / 10000.0 AS h_joint,
        | floor((hl + hs - hj) * 10000.0 + 0.5) / 10000.0 AS mi_nats,
        | floor((hl + hs - hj) / sqrt(hl * hs) * 10000.0 + 0.5) / 10000.0 AS nmi
        |FROM h""".stripMargin,

    "q_entropy_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0 GROUP BY 1, 2),
        |joint AS (SELECT CAST(sum(c) AS BIGINT) AS b,
        |                 CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |                 sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slj
        |          FROM pairs),
        |first_ AS (SELECT sum(CAST(CAST(cf AS DOUBLE) * ln(CAST(cf AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slf
        |           FROM (SELECT sum(c) AS cf FROM pairs GROUP BY w1)),
        |h AS (SELECT b, n_distinct_bigrams,
        |             ln(CAST(b AS DOUBLE)) - CAST(slj AS DOUBLE) / CAST(b AS DOUBLE) AS hj,
        |             ln(CAST(b AS DOUBLE)) - CAST(slf AS DOUBLE) / CAST(b AS DOUBLE) AS hf
        |      FROM joint CROSS JOIN first_)
        |SELECT b AS n_bigrams, n_distinct_bigrams,
        | floor(hj * 10000.0 + 0.5) / 10000.0 AS h_joint,
        | floor(hf * 10000.0 + 0.5) / 10000.0 AS h_first,
        | floor((hj - hf) * 10000.0 + 0.5) / 10000.0 AS h_cond
        |FROM h""".stripMargin,

    "q_theil_index" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
        |               sum(CAST(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))
        |                        AS DECIMAL(28,8))) AS sxlx,
        |               sum(CAST(ln(CAST(x AS DOUBLE)) AS DECIMAL(28,8))) AS slx
        |        FROM cust)
        |SELECT n AS n_customers,
        | floor((CAST(sxlx AS DOUBLE) / CAST(s AS DOUBLE)
        |        - ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) * 10000.0 + 0.5)
        |   / 10000.0 AS theil_t,
        | floor((ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        - CAST(slx AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0 + 0.5)
        |   / 10000.0 AS theil_l
        |FROM agg""".stripMargin,

    "q_adf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |anchor AS (SELECT CAST(sum(rc) // count(*) AS BIGINT) AS a FROM daily),
        |pairs AS (
        |  SELECT prev - a AS x, rc - prev AS y
        |  FROM (SELECT rc, lag(rc) OVER (ORDER BY d) AS prev FROM daily)
        |       CROSS JOIN anchor
        |  WHERE prev IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM pairs),
        |c AS (SELECT n,
        |             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS sxxc,
        |             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS sxyc,
        |             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS syyc
        |      FROM m),
        |g AS (SELECT n, sxyc / sxxc AS gamma,
        |             sqrt((syyc - (sxyc / sxxc) * sxyc)
        |                  / (CAST(n AS DOUBLE) - 2.0) / sxxc) AS se
        |      FROM c)
        |SELECT n AS n_pairs,
        | floor(gamma * 10000.0 + 0.5) / 10000.0 AS gamma,
        | floor(se * 10000.0 + 0.5) / 10000.0 AS se,
        | floor(gamma / se * 10000.0 + 0.5) / 10000.0 AS t_stat
        |FROM g""".stripMargin,

    "q_var_es" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |rets AS (
        |  SELECT d, ln(CAST(rc AS DOUBLE) / CAST(prev AS DOUBLE)) AS r
        |  FROM (SELECT d, rc, lag(rc) OVER (ORDER BY d) AS prev FROM daily)
        |  WHERE prev IS NOT NULL),
        |ranked AS (
        |  SELECT r, CAST(row_number() OVER (ORDER BY r, d) AS BIGINT) AS rn,
        |         count(*) OVER () AS nn,
        |         CAST(ceil(count(*) OVER () * 0.05) AS BIGINT) AS k
        |  FROM rets),
        |v AS (SELECT r AS var5, nn, k FROM ranked WHERE rn = k),
        |tail AS (SELECT CAST(sum(CAST(r AS DECIMAL(28,8))) AS DOUBLE) AS tsum,
        |                CAST(count(*) AS BIGINT) AS tc
        |         FROM ranked WHERE rn <= k)
        |SELECT CAST(nn AS BIGINT) AS n_returns, k AS n_tail,
        | floor(var5 * 10000.0 + 0.5) / 10000.0 AS var_5,
        | floor(tsum / CAST(tc AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS es_5
        |FROM v CROSS JOIN tail""".stripMargin,

    "q_friedman" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS blk,
        |         o_orderpriority AS trt,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM monthly),
        |complete AS (
        |  SELECT m.* FROM monthly m CROSS JOIN kk
        |  QUALIFY count(*) OVER (PARTITION BY blk) = k),
        |ranked AS (
        |  SELECT trt,
        |         2 * rank() OVER (PARTITION BY blk ORDER BY v)
        |           + count(*) OVER (PARTITION BY blk, v) - 1 AS r2
        |  FROM complete),
        |per AS (SELECT trt, CAST(count(*) AS BIGINT) AS n_blocks,
        |               CAST(sum(r2) AS BIGINT) AS r2j
        |        FROM ranked GROUP BY trt),
        |tot AS (SELECT CAST(max(n_blocks) AS BIGINT) AS n,
        |               CAST(count(*) AS BIGINT) AS kk2,
        |               CAST(sum(CAST(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE) / 4.0
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS rsum
        |        FROM per)
        |SELECT trt AS o_orderpriority, n_blocks,
        |       floor(CAST(r2j AS DOUBLE) / (2.0 * CAST(n_blocks AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS mean_rank,
        |       CAST(NULL AS DOUBLE) AS chi2_f
        |FROM per
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS DOUBLE),
        |       floor((12.0 / (CAST(n AS DOUBLE) * CAST(kk2 AS DOUBLE)
        |                      * (CAST(kk2 AS DOUBLE) + 1.0)) * rsum
        |              - 3.0 * CAST(n AS DOUBLE) * (CAST(kk2 AS DOUBLE) + 1.0))
        |             * 10000.0 + 0.5) / 10000.0
        |FROM tot
        |ORDER BY o_orderpriority""".stripMargin,

    "q_scd4_minidim" ->
      """WITH combos AS (
        |  SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |         c_mktsegment AS segment,
        |         CAST(count(*) AS BIGINT) AS n_customers
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(row_number() OVER (ORDER BY bal_band, segment) AS BIGINT) AS mini_key,
        |       bal_band, segment, n_customers
        |FROM combos ORDER BY mini_key""".stripMargin,

    "q_factless_coverage" ->
      """WITH cm AS (
        |  SELECT DISTINCT o_custkey AS ck,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |  FROM orders),
        |spine AS (
        |  SELECT ck, CAST(unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM (SELECT ck, min(m) AS m0, max(m) AS m1 FROM cm GROUP BY ck)),
        |j AS (SELECT s.m, CASE WHEN cm.ck IS NULL THEN 0 ELSE 1 END AS active
        |      FROM spine s LEFT JOIN cm ON s.ck = cm.ck AND s.m = cm.m)
        |SELECT m, CAST(count(*) AS BIGINT) AS n_eligible,
        |       CAST(sum(active) AS BIGINT) AS n_active,
        |       CAST(count(*) - sum(active) AS BIGINT) AS n_silent,
        |       floor(CAST(count(*) - sum(active) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS silent_rate
        |FROM j GROUP BY m ORDER BY m""".stripMargin,

    "q_junk_dim" ->
      """WITH hr AS (
        |  SELECT l_orderkey,
        |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_returns
        |  FROM lineitem GROUP BY 1),
        |flags AS (
        |  SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |         CAST(COALESCE(hr.has_returns, 0) AS BIGINT) AS has_returns,
        |         o_totalprice
        |  FROM orders LEFT JOIN hr ON o_orderkey = hr.l_orderkey),
        |combos AS (
        |  SELECT status, priority, has_returns,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM flags GROUP BY 1, 2, 3)
        |SELECT CAST(row_number() OVER (ORDER BY status, priority, has_returns)
        |            AS BIGINT) AS junk_key,
        |       status, priority, has_returns, n_orders,
        |       floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM combos ORDER BY junk_key""".stripMargin,

    "q_ransac_line" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS qx,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS qy
        |  FROM orders GROUP BY 1),
        |sample_ AS (SELECT CAST(row_number() OVER (ORDER BY d ASC) - 1 AS BIGINT)
        |              AS k, qx, qy
        |            FROM daily),
        |cands AS (SELECT unnest(generate_series(0, 31)) AS cand),
        |hs AS (SELECT cand, k, qx, qy,
        |         ((k % 1048576) * 489905
        |          + CAST(cand AS BIGINT) * 40503 + 17) % 1048576 AS h
        |       FROM sample_ CROSS JOIN cands),
        |sup AS (SELECT cand, qx, qy,
        |          row_number() OVER (PARTITION BY cand
        |            ORDER BY h ASC, k ASC) AS rn
        |        FROM hs),
        |lines AS (SELECT cand,
        |    max(CASE WHEN rn = 1 THEN qx END) AS x1,
        |    max(CASE WHEN rn = 1 THEN qy END) AS y1,
        |    max(CASE WHEN rn = 2 THEN qx END) AS x2,
        |    max(CASE WHEN rn = 2 THEN qy END) AS y2
        |  FROM sup WHERE rn <= 2 GROUP BY cand),
        |ln2 AS (SELECT cand,
        |          CAST(y2 - y1 AS DOUBLE) / CAST(x2 - x1 AS DOUBLE) AS m, x1, y1
        |        FROM lines WHERE x1 <> x2),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sample FROM sample_),
        |sc AS (SELECT cand, m, x1, y1, CAST(count(*) AS BIGINT) AS n_inliers
        |       FROM sample_ CROSS JOIN ln2
        |       WHERE abs(CAST(qy AS DOUBLE)
        |                 - (m * CAST(qx - x1 AS DOUBLE) + CAST(y1 AS DOUBLE)))
        |             <= 20000000.0
        |       GROUP BY 1, 2, 3, 4),
        |rk AS (SELECT cand, m, x1, y1, n_inliers,
        |         CAST(row_number() OVER (ORDER BY n_inliers DESC, cand ASC)
        |              AS BIGINT) AS rank
        |       FROM sc)
        |SELECT rank, CAST(cand AS BIGINT) AS cand, n_inliers, n_sample,
        | floor(m / 100.0 * 10000.0 + 0.5) / 10000.0 AS slope,
        | floor((CAST(y1 AS DOUBLE) - m * CAST(x1 AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(CAST(n_inliers AS DOUBLE) / CAST(n_sample AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS consensus
        |FROM rk CROSS JOIN ns WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "q_esd_outliers" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s1_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM daily),
        |r1 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM daily CROSS JOIN s1_),
        |t1_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r1)
        |        WHERE rn = 1),
        |rem1 AS (SELECT daily.* FROM daily WHERE d NOT IN (SELECT d FROM t1_)),
        |s2_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM rem1),
        |r2 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM rem1 CROSS JOIN s2_),
        |t2_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r2)
        |        WHERE rn = 1),
        |rem2 AS (SELECT rem1.* FROM rem1 WHERE d NOT IN (SELECT d FROM t2_)),
        |s3_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM rem2),
        |r3 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM rem2 CROSS JOIN s3_),
        |t3_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r3)
        |        WHERE rn = 1),
        |u AS (SELECT CAST(1 AS BIGINT) AS round, d AS outlier_day, cents,
        |             n AS n_remaining, r_stat FROM t1_
        |      UNION ALL
        |      SELECT CAST(2 AS BIGINT), d, cents, n, r_stat FROM t2_
        |      UNION ALL
        |      SELECT CAST(3 AS BIGINT), d, cents, n, r_stat FROM t3_)
        |SELECT round, outlier_day,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | n_remaining, r_stat
        |FROM u ORDER BY round""".stripMargin,

    "q_tukey_hsd" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s,
        |    CAST(sum(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS s2
        |  FROM (SELECT c_mktsegment,
        |          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |        FROM orders JOIN customer ON o_custkey = c_custkey)
        |  GROUP BY 1),
        |mse AS (SELECT
        |    CAST(sum(CAST(CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |                  AS DECIMAL(38,8))) AS DOUBLE)
        |      / CAST(sum(n) - count(*) AS DOUBLE) AS mse
        |  FROM g)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        | floor((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
        |        - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS mean_diff,
        | floor(abs(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
        |           - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
        |       / sqrt(mse / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
        |                           + 1.0 / CAST(b.n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM g a CROSS JOIN g b CROSS JOIN mse
        |WHERE a.seg < b.seg ORDER BY seg_a, seg_b""".stripMargin,

    "q_des_forecast" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT d, cents, row_number() OVER (ORDER BY d ASC) AS rn,
        |    cents * 16 + lag(cents, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(cents, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(cents, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(cents, 4) OVER (ORDER BY d ASC) * 1 AS a_num
        |  FROM daily),
        |s2 AS (SELECT d, cents, rn, a_num,
        |    a_num * 16 + lag(a_num, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(a_num, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(a_num, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(a_num, 4) OVER (ORDER BY d ASC) * 1 AS b_num
        |  FROM s1),
        |last10 AS (SELECT * FROM (SELECT d, cents, a_num, b_num,
        |    row_number() OVER (ORDER BY d DESC) AS rk
        |  FROM s2 WHERE rn >= 9) WHERE rk <= 10)
        |SELECT d,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(a_num AS DOUBLE) / 31.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS s1,
        | floor(CAST(b_num AS DOUBLE) / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS s2,
        | floor((2.0 * CAST(a_num AS DOUBLE) * 31.0 - CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS level,
        | floor((CAST(a_num AS DOUBLE) * 31.0 - CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS trend,
        | floor((93.0 * CAST(a_num AS DOUBLE) - 2.0 * CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS forecast_next
        |FROM last10 ORDER BY d""".stripMargin,

    "q_periodogram" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        |       FROM daily),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t,
        |          CAST(n * cents - s AS DECIMAL(19,0)) AS cx, n
        |        FROM daily CROSS JOIN st),
        |p_ AS (SELECT unnest(generate_series(2, 14)) AS p),
        |c AS (SELECT p, n,
        |        CAST(sum((CASE WHEN (t % p) * 2 < p THEN 1 ELSE -1 END) * cx)
        |             AS DECIMAL(38,0)) AS swc,
        |        CAST(sum(CAST(cx * cx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS scx2
        |      FROM idx CROSS JOIN p_ GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS period,
        | floor(CAST(CAST(swc * swc AS DECIMAL(38,0)) AS DOUBLE)
        |       / (CAST(scx2 AS DOUBLE) * CAST(n AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS power_share
        |FROM c ORDER BY period""".stripMargin,

    "q_ts_motif" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t, d,
        |               cents // 10000 AS x
        |        FROM daily),
        |vec AS (SELECT t, d, x AS x0,
        |    lead(x, 1) OVER (ORDER BY t ASC) AS x1,
        |    lead(x, 2) OVER (ORDER BY t ASC) AS x2,
        |    lead(x, 3) OVER (ORDER BY t ASC) AS x3,
        |    lead(x, 4) OVER (ORDER BY t ASC) AS x4,
        |    lead(x, 5) OVER (ORDER BY t ASC) AS x5,
        |    lead(x, 6) OVER (ORDER BY t ASC) AS x6
        |  FROM idx),
        |st AS (SELECT t, d,
        |    x0 + x1 + x2 + x3 + x4 + x5 + x6 AS sx,
        |    x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6 AS sxx,
        |    x0, x1, x2, x3, x4, x5, x6
        |  FROM vec WHERE x6 IS NOT NULL),
        |pr AS (SELECT a.t AS t1, b.t AS t2, a.d AS d1, b.d AS d2,
        |         CAST(7 * (a.x0*b.x0 + a.x1*b.x1 + a.x2*b.x2 + a.x3*b.x3
        |                   + a.x4*b.x4 + a.x5*b.x5 + a.x6*b.x6)
        |              - a.sx * b.sx AS DOUBLE)
        |         / sqrt(CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE)
        |                * CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE)) AS r
        |       FROM st a JOIN st b ON b.t - a.t >= 7
        |       WHERE CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE) > 0
        |         AND CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE) > 0),
        |sc AS (SELECT t1, t2, d1, d2,
        |         floor(r * 10000.0 + 0.5) / 10000.0 AS r,
        |         floor(14.0 * (1.0 - r) * 10000.0 + 0.5) / 10000.0 AS d2z
        |       FROM pr)
        |SELECT CAST(row_number() OVER (ORDER BY d2z ASC, t1 ASC, t2 ASC)
        |            AS BIGINT) AS rank, d1, d2, r, d2z
        |FROM sc ORDER BY d2z ASC, t1 ASC, t2 ASC LIMIT 5""".stripMargin,

    "q_ts_discord" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t, d,
        |               cents // 10000 AS x
        |        FROM daily),
        |vec AS (SELECT t, d, x AS x0,
        |    lead(x, 1) OVER (ORDER BY t ASC) AS x1,
        |    lead(x, 2) OVER (ORDER BY t ASC) AS x2,
        |    lead(x, 3) OVER (ORDER BY t ASC) AS x3,
        |    lead(x, 4) OVER (ORDER BY t ASC) AS x4,
        |    lead(x, 5) OVER (ORDER BY t ASC) AS x5,
        |    lead(x, 6) OVER (ORDER BY t ASC) AS x6
        |  FROM idx),
        |st AS (SELECT t, d,
        |    x0 + x1 + x2 + x3 + x4 + x5 + x6 AS sx,
        |    x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6 AS sxx,
        |    x0, x1, x2, x3, x4, x5, x6
        |  FROM vec WHERE x6 IS NOT NULL),
        |pr AS (SELECT a.t AS t1, b.t AS t2, a.d AS d1, b.d AS d2,
        |         CAST(7 * (a.x0*b.x0 + a.x1*b.x1 + a.x2*b.x2 + a.x3*b.x3
        |                   + a.x4*b.x4 + a.x5*b.x5 + a.x6*b.x6)
        |              - a.sx * b.sx AS DOUBLE)
        |         / sqrt(CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE)
        |                * CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE)) AS r
        |       FROM st a JOIN st b ON b.t - a.t >= 7
        |       WHERE CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE) > 0
        |         AND CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE) > 0),
        |sc AS (SELECT t1, t2, d1, d2,
        |         floor(14.0 * (1.0 - r) * 10000.0 + 0.5) / 10000.0 AS d2z
        |       FROM pr),
        |sym AS (SELECT t1 AS t, d1 AS d, d2 AS nn_d, d2z FROM sc
        |        UNION ALL
        |        SELECT t2 AS t, d2 AS d, d1 AS nn_d, d2z FROM sc),
        |nn AS (SELECT t, d, nn_d, d2z AS nn_d2z
        |       FROM (SELECT *, row_number() OVER (PARTITION BY t
        |               ORDER BY d2z ASC, nn_d ASC) AS rn FROM sym)
        |       WHERE rn = 1)
        |SELECT CAST(row_number() OVER (ORDER BY nn_d2z DESC, d ASC) AS BIGINT)
        |         AS rank, d, nn_d, nn_d2z
        |FROM nn ORDER BY nn_d2z DESC, d ASC LIMIT 5""".stripMargin,

    "q_good_turing" ->
      """WITH d AS (SELECT lang, string_split(lower(text), ' ') AS wd
        |           FROM documents),
        |tok AS (SELECT lang,
        |          unnest(list_transform(range(1, len(wd) - 3),
        |                 i -> array_to_string(wd[i:i+4], ' '))) AS w
        |        FROM d WHERE len(wd) >= 5),
        |ty AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY 1, 2),
        |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS v_types,
        |          CAST(sum(c) AS BIGINT) AS n_tokens,
        |          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |          CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |        FROM ty GROUP BY 1)
        |SELECT lang, v_types, n_tokens, n1, n2,
        | floor(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS p_unseen,
        | floor((1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS coverage,
        | floor((CAST(v_types AS DOUBLE)
        |        + CAST(n1 * (n1 - 1) AS DOUBLE) / (2.0 * CAST(n2 + 1 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS chao1
        |FROM agg ORDER BY lang""".stripMargin,

    "q_capture_recapture" ->
      """WITH d AS (SELECT lang,
        |    CASE WHEN CAST(('0x' || substr(md5('cr1_' || CAST(doc_id AS VARCHAR)),
        |                                   1, 12)) AS BIGINT) % 8 = 0
        |         THEN 1 ELSE 0 END AS s1,
        |    CASE WHEN CAST(('0x' || substr(md5('cr2_' || CAST(doc_id AS VARCHAR)),
        |                                   1, 12)) AS BIGINT) % 8 = 0
        |         THEN 1 ELSE 0 END AS s2
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS true_n,
        | CAST(sum(s1) AS BIGINT) AS n1, CAST(sum(s2) AS BIGINT) AS n2,
        | CAST(sum(s1 * s2) AS BIGINT) AS m,
        | floor((CAST(sum(s1) + 1 AS DOUBLE) * CAST(sum(s2) + 1 AS DOUBLE)
        |        / CAST(sum(s1 * s2) + 1 AS DOUBLE) - 1.0) * 10000.0 + 0.5)
        |   / 10000.0 AS n_hat
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang, w
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(lower(text), ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0),
        |src AS (SELECT w, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY 1),
        |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct
        |        FROM tok WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ns,
        |               (SELECT CAST(count(*) AS BIGINT) FROM src) AS v,
        |               (SELECT CAST(count(*) AS BIGINT) FROM tok
        |                WHERE lang = 'en') AS nt),
        |lm AS (SELECT w,
        |    CAST(floor((ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
        |                   / CAST(nt + v AS DOUBLE))
        |                - ln(CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE)))
        |               * 1000000.0 + 0.5) AS BIGINT) AS lr_q
        |  FROM src LEFT JOIN tgt USING (w) CROSS JOIN tot),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |         CAST(sum(lr_q) AS BIGINT) AS slr
        |       FROM tok JOIN lm USING (w) GROUP BY 1, 2),
        |rk AS (SELECT doc_id, lang, n_tokens,
        |    floor(CAST(slr AS DOUBLE) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS logw
        |  FROM sc)
        |SELECT CAST(row_number() OVER (ORDER BY logw DESC, doc_id ASC) AS BIGINT)
        |         AS rank,
        |       doc_id, lang, n_tokens, logw
        |FROM rk ORDER BY logw DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q_bipartite_projection" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_orders
        |        FROM op GROUP BY 1),
        |co AS (SELECT a.pk AS part_a, b.pk AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_co
        |       FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2),
        |sc AS (SELECT part_a, part_b, n_co,
        |         da.n_orders AS na, db.n_orders AS nb,
        |         floor(CAST(n_co AS DOUBLE)
        |               / sqrt(CAST(da.n_orders AS DOUBLE)
        |                      * CAST(db.n_orders AS DOUBLE))
        |               * 10000.0 + 0.5) / 10000.0 AS cosine
        |       FROM co
        |       JOIN deg da ON co.part_a = da.pk
        |       JOIN deg db ON co.part_b = db.pk)
        |SELECT part_a, part_b, n_co, na, nb, cosine,
        |       CAST(row_number() OVER (ORDER BY cosine DESC, part_a ASC,
        |                               part_b ASC) AS BIGINT) AS rank
        |FROM sc ORDER BY cosine DESC, part_a ASC, part_b ASC LIMIT 30""".stripMargin,

    "q_bitemporal_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 86400000000 - event_id % 3 AS valid_day,
        |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |b AS (SELECT min(valid_day) AS d0 FROM e),
        |q1 AS (SELECT user_id, valid_day, ts_us, event_id, vq
        |       FROM e CROSS JOIN b
        |       WHERE valid_day <= d0 + 15 AND ts_us < (d0 + 16) * 86400000000),
        |q2 AS (SELECT user_id, valid_day, ts_us, event_id, vq
        |       FROM e CROSS JOIN b
        |       WHERE valid_day <= d0 + 15 AND ts_us < (d0 + 41) * 86400000000),
        |a1 AS (SELECT user_id, valid_day AS valid_day_t1, event_id AS event_id_t1,
        |         floor(CAST(vq AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0
        |           AS value_t1
        |       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |               ORDER BY valid_day DESC, ts_us DESC, event_id DESC) AS rn
        |             FROM q1) WHERE rn = 1),
        |a2 AS (SELECT user_id, valid_day AS valid_day_t2, event_id AS event_id_t2,
        |         floor(CAST(vq AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0
        |           AS value_t2
        |       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |               ORDER BY valid_day DESC, ts_us DESC, event_id DESC) AS rn
        |             FROM q2) WHERE rn = 1)
        |SELECT COALESCE(a1.user_id, a2.user_id) AS user_id,
        |       valid_day_t1, event_id_t1, value_t1,
        |       valid_day_t2, event_id_t2, value_t2,
        |       COALESCE(event_id_t1, -1) <> COALESCE(event_id_t2, -1) AS corrected
        |FROM a1 FULL OUTER JOIN a2 ON a1.user_id = a2.user_id
        |ORDER BY user_id""".stripMargin,

    "q_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |v0 AS (SELECT e.user_id, s0.t1, min(e.ts_us) AS t2
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'view' AND e.ts_us > s0.t1
        |         AND e.ts_us <= s0.t1 + 604800000000
        |       GROUP BY 1, 2),
        |p0 AS (SELECT e.user_id, min(e.ts_us) AS t3
        |       FROM e JOIN v0 ON e.user_id = v0.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_us > v0.t2
        |         AND e.ts_us <= v0.t1 + 604800000000
        |       GROUP BY 1),
        |depth AS (SELECT s0.user_id,
        |    CAST(1 + (CASE WHEN v0.user_id IS NULL THEN 0 ELSE 1 END)
        |           + (CASE WHEN p0.user_id IS NULL THEN 0 ELSE 1 END)
        |         AS BIGINT) AS depth
        |  FROM s0
        |  LEFT JOIN v0 ON s0.user_id = v0.user_id
        |  LEFT JOIN p0 ON s0.user_id = p0.user_id),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_entered FROM depth)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_users, n_entered,
        | floor(CAST(count(*) AS DOUBLE) / CAST(n_entered AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS share
        |FROM depth CROSS JOIN tot GROUP BY depth, n_entered
        |ORDER BY depth""".stripMargin,

    "q_permutation_test" ->
      """WITH reps AS (SELECT unnest(generate_series(0, 100 - 1)) AS rep),
        |r1 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_t,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |       FROM orders
        |       WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |o1 AS (SELECT CAST(sum(is_t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(is_t * x) AS BIGINT) AS st,
        |         CAST(sum((1 - is_t) * x) AS BIGINT) AS sc
        |       FROM r1),
        |ob1 AS (SELECT nt, n,
        |          CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |          - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) AS obs_diff
        |        FROM o1),
        |n1 AS (SELECT rep,
        |         CAST(sum(pt * x) AS DOUBLE) / CAST(sum(pt) AS DOUBLE)
        |         - CAST(sum((1 - pt) * x) AS DOUBLE)
        |           / CAST(sum(1 - pt) AS DOUBLE) AS d
        |       FROM (SELECT rep, x,
        |               CASE WHEN ((k % 1048576) * 489905 + rep * 40503 + 29)
        |                      % 1048576 * n < nt * 1048576
        |                    THEN 1 ELSE 0 END AS pt
        |             FROM r1 CROSS JOIN reps CROSS JOIN ob1)
        |       GROUP BY rep
        |       HAVING sum(pt) > 0 AND sum(1 - pt) > 0),
        |c1 AS (SELECT CAST(1 AS BIGINT) AS contrast_id,
        |         '1-URGENT vs 5-LOW' AS contrast, nt AS n_treat,
        |         n - nt AS n_ctrl,
        |         floor(obs_diff / 100.0 * 10000.0 + 0.5) / 10000.0 AS obs_diff,
        |         CAST(count(*) AS BIGINT) AS n_reps,
        |         CAST(sum(CASE WHEN floor(abs(d) * 10000.0 + 0.5) / 10000.0
        |                        >= floor(abs(ob1.obs_diff) * 10000.0 + 0.5) / 10000.0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |       FROM n1 CROSS JOIN ob1
        |       GROUP BY nt, n, ob1.obs_diff),
        |r2 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |         CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_t,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |       FROM orders
        |       WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')),
        |o2 AS (SELECT CAST(sum(is_t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(is_t * x) AS BIGINT) AS st,
        |         CAST(sum((1 - is_t) * x) AS BIGINT) AS sc
        |       FROM r2),
        |ob2 AS (SELECT nt, n,
        |          CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |          - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) AS obs_diff
        |        FROM o2),
        |n2 AS (SELECT rep,
        |         CAST(sum(pt * x) AS DOUBLE) / CAST(sum(pt) AS DOUBLE)
        |         - CAST(sum((1 - pt) * x) AS DOUBLE)
        |           / CAST(sum(1 - pt) AS DOUBLE) AS d
        |       FROM (SELECT rep, x,
        |               CASE WHEN ((k % 1048576) * 489905 + rep * 40503 + 29)
        |                      % 1048576 * n < nt * 1048576
        |                    THEN 1 ELSE 0 END AS pt
        |             FROM r2 CROSS JOIN reps CROSS JOIN ob2)
        |       GROUP BY rep
        |       HAVING sum(pt) > 0 AND sum(1 - pt) > 0),
        |c2 AS (SELECT CAST(2 AS BIGINT) AS contrast_id,
        |         '2-HIGH vs 3-MEDIUM' AS contrast, nt AS n_treat,
        |         n - nt AS n_ctrl,
        |         floor(obs_diff / 100.0 * 10000.0 + 0.5) / 10000.0 AS obs_diff,
        |         CAST(count(*) AS BIGINT) AS n_reps,
        |         CAST(sum(CASE WHEN floor(abs(d) * 10000.0 + 0.5) / 10000.0
        |                        >= floor(abs(ob2.obs_diff) * 10000.0 + 0.5) / 10000.0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |       FROM n2 CROSS JOIN ob2
        |       GROUP BY nt, n, ob2.obs_diff),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
        |SELECT contrast_id, contrast, n_treat, n_ctrl, obs_diff, n_reps,
        |       n_extreme,
        |       floor(CAST(n_extreme + 1 AS DOUBLE) / CAST(n_reps + 1 AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS p_value
        |FROM u ORDER BY contrast_id""".stripMargin,

    "q_overdispersion" ->
      """WITH pc AS (SELECT c.c_mktsegment AS seg, COALESCE(o.k, 0) AS k
        |  FROM customer c
        |  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
        |             FROM orders GROUP BY 1) o
        |    ON c.c_custkey = o.o_custkey),
        |a AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(k) AS BIGINT) AS s, CAST(sum(k * k) AS BIGINT) AS s2
        |      FROM pc GROUP BY 1),
        |m AS (SELECT seg, n, s, s2,
        |        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |        (CAST(s2 AS DOUBLE)
        |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n - 1 AS DOUBLE) AS v
        |      FROM a)
        |SELECT seg, n AS n_customers,
        | floor(mu * 10000.0 + 0.5) / 10000.0 AS mean_orders,
        | floor(v * 10000.0 + 0.5) / 10000.0 AS var_orders,
        | floor(v / mu * 10000.0 + 0.5) / 10000.0 AS dispersion,
        | CASE WHEN v > mu
        |      THEN floor(mu * mu / (v - mu) * 10000.0 + 0.5) / 10000.0 END AS nb_r,
        | CASE WHEN v > mu
        |      THEN floor(mu / v * 10000.0 + 0.5) / 10000.0 END AS nb_p
        |FROM m ORDER BY seg""".stripMargin,

    "q_mmr_diversity" ->
      """WITH dl AS (
        |  SELECT doc_id, text,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
        |  FROM documents),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM dl),
        |tf AS (
        |  SELECT doc_id, len, term, count(*) AS tf FROM (
        |    SELECT doc_id, len, unnest(string_split(lower(text), ' ')) AS term FROM dl) u
        |  WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, len, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
        |              / (CAST(dfq.df AS DOUBLE) + 0.5))
        |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.len AS DOUBLE)
        |         / (CAST(st.sum_len AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))) AS sc
        |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st),
        |rel AS (SELECT doc_id,
        |          floor(CAST(sum(CAST(sc AS DECIMAL(28,8))) AS DOUBLE)
        |                * 10000.0 + 0.5) / 10000.0 AS rel
        |        FROM s GROUP BY doc_id
        |        ORDER BY rel DESC, doc_id ASC LIMIT 20),
        |qv AS (SELECT vec_id,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |              AS BIGINT) AS q,
        |         generate_subscripts(embedding, 1) AS i
        |       FROM embeddings JOIN rel ON vec_id = rel.doc_id),
        |nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
        |        FROM qv GROUP BY 1),
        |dp AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dp
        |       FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       GROUP BY 1, 2),
        |sim AS (SELECT a_id, b_id,
        |          floor(CAST(dp AS DOUBLE)
        |                / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
        |                * 10000.0 + 0.5) / 10000.0 AS sim
        |        FROM dp JOIN nrm x ON a_id = x.vec_id JOIN nrm y ON b_id = y.vec_id),
        |s1 AS (SELECT doc_id, rel FROM rel ORDER BY rel DESC, doc_id ASC LIMIT 1),
        |c2 AS (SELECT r.doc_id, r.rel, max(s.sim) AS maxsim
        |       FROM rel r JOIN sim s ON s.a_id = r.doc_id
        |       WHERE s.b_id IN (SELECT doc_id FROM s1)
        |         AND r.doc_id NOT IN (SELECT doc_id FROM s1)
        |       GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, rel, maxsim,
        |         floor((0.7 * rel - (1.0 - 0.7) * maxsim) * 10000.0 + 0.5)
        |           / 10000.0 AS sc
        |       FROM c2 ORDER BY sc DESC, doc_id ASC LIMIT 1),
        |sel2 AS (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2),
        |c3 AS (SELECT r.doc_id, r.rel, max(s.sim) AS maxsim
        |       FROM rel r JOIN sim s ON s.a_id = r.doc_id
        |       WHERE s.b_id IN (SELECT doc_id FROM sel2)
        |         AND r.doc_id NOT IN (SELECT doc_id FROM sel2)
        |       GROUP BY 1, 2),
        |s3 AS (SELECT doc_id, rel, maxsim,
        |         floor((0.7 * rel - (1.0 - 0.7) * maxsim) * 10000.0 + 0.5)
        |           / 10000.0 AS sc
        |       FROM c3 ORDER BY sc DESC, doc_id ASC LIMIT 1),
        |sel3 AS (SELECT doc_id FROM sel2 UNION ALL SELECT doc_id FROM s3),
        |c4 AS (SELECT r.doc_id, r.rel, max(s.sim) AS maxsim
        |       FROM rel r JOIN sim s ON s.a_id = r.doc_id
        |       WHERE s.b_id IN (SELECT doc_id FROM sel3)
        |         AND r.doc_id NOT IN (SELECT doc_id FROM sel3)
        |       GROUP BY 1, 2),
        |s4 AS (SELECT doc_id, rel, maxsim,
        |         floor((0.7 * rel - (1.0 - 0.7) * maxsim) * 10000.0 + 0.5)
        |           / 10000.0 AS sc
        |       FROM c4 ORDER BY sc DESC, doc_id ASC LIMIT 1),
        |sel4 AS (SELECT doc_id FROM sel3 UNION ALL SELECT doc_id FROM s4),
        |c5 AS (SELECT r.doc_id, r.rel, max(s.sim) AS maxsim
        |       FROM rel r JOIN sim s ON s.a_id = r.doc_id
        |       WHERE s.b_id IN (SELECT doc_id FROM sel4)
        |         AND r.doc_id NOT IN (SELECT doc_id FROM sel4)
        |       GROUP BY 1, 2),
        |s5 AS (SELECT doc_id, rel, maxsim,
        |         floor((0.7 * rel - (1.0 - 0.7) * maxsim) * 10000.0 + 0.5)
        |           / 10000.0 AS sc
        |       FROM c5 ORDER BY sc DESC, doc_id ASC LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS rank, doc_id, rel, 0.0 AS maxsim,
        |       floor(0.7 * rel * 10000.0 + 0.5) / 10000.0 AS mmr_score
        |FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), doc_id, rel, maxsim, sc FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), doc_id, rel, maxsim, sc FROM s3
        |UNION ALL SELECT CAST(4 AS BIGINT), doc_id, rel, maxsim, sc FROM s4
        |UNION ALL SELECT CAST(5 AS BIGINT), doc_id, rel, maxsim, sc FROM s5
        |ORDER BY rank""".stripMargin,

    "q_data_vault" ->
      """WITH hc AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer),
        |ho AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders),
        |lo AS (SELECT md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
        |                            CAST(o_custkey AS VARCHAR))) AS hk
        |       FROM orders),
        |so AS (SELECT md5(concat_ws('|', CAST(o_orderkey AS VARCHAR))) AS hk,
        |         md5(concat_ws('|', o_orderstatus,
        |             CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
        |                  AS VARCHAR),
        |             CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
        |             o_orderpriority)) AS hashdiff
        |       FROM orders),
        |u AS (
        |  SELECT 'hub_customer' AS vault_table, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT hk) AS BIGINT) AS n_distinct_hk,
        |    CAST(count(DISTINCT hk) AS BIGINT) AS n_distinct_payload,
        |    min(hk) AS min_hk, max(hk) AS max_hk
        |  FROM hc
        |  UNION ALL
        |  SELECT 'hub_order', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT), min(hk), max(hk)
        |  FROM ho
        |  UNION ALL
        |  SELECT 'link_order_customer', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT), min(hk), max(hk)
        |  FROM lo
        |  UNION ALL
        |  SELECT 'sat_order', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hashdiff) AS BIGINT), min(hk), max(hk)
        |  FROM so)
        |SELECT * FROM u ORDER BY vault_table""".stripMargin,

    "q_hard_negatives" ->
      """WITH qv AS (SELECT vec_id,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |         AS BIGINT) AS q,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
        |        FROM qv GROUP BY 1),
        |dp AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dp
        |       FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       GROUP BY 1, 2),
        |sc AS (SELECT a_id, la.label AS a_label, b_id, lb.label AS b_label,
        |         floor(CAST(dp AS DOUBLE)
        |               / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
        |               * 10000.0 + 0.5) / 10000.0 AS cos
        |       FROM dp JOIN nrm x ON a_id = x.vec_id
        |       JOIN nrm y ON b_id = y.vec_id
        |       JOIN lab la ON a_id = la.vec_id
        |       JOIN lab lb ON b_id = lb.vec_id),
        |hn AS (SELECT a_id, a_label, b_id, b_label, cos
        |       FROM (SELECT *, row_number() OVER (PARTITION BY a_id
        |               ORDER BY cos DESC, b_id ASC) AS rn
        |             FROM sc WHERE a_label <> b_label)
        |       WHERE rn = 1),
        |hp AS (SELECT a_id, b_id, cos
        |       FROM (SELECT *, row_number() OVER (PARTITION BY a_id
        |               ORDER BY cos ASC, b_id ASC) AS rn
        |             FROM sc WHERE a_label = b_label)
        |       WHERE rn = 1)
        |SELECT hn.a_id AS vec_id, hn.a_label AS label,
        |       hn.b_id AS hard_neg_id, hn.b_label AS hard_neg_label,
        |       hn.cos AS hard_neg_cos,
        |       hp.b_id AS hard_pos_id, hp.cos AS hard_pos_cos,
        |       floor((hn.cos - hp.cos) * 10000.0 + 0.5) / 10000.0 AS margin
        |FROM hn JOIN hp ON hn.a_id = hp.a_id
        |WHERE hn.a_id % 17 = 0 ORDER BY vec_id""".stripMargin,

    "q_knn_label_noise" ->
      """WITH qv AS (SELECT vec_id,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |         AS BIGINT) AS q,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
        |        FROM qv GROUP BY 1),
        |dp AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dp
        |       FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       GROUP BY 1, 2),
        |sc AS (SELECT a_id, la.label AS a_label, b_id, lb.label AS b_label,
        |         floor(CAST(dp AS DOUBLE)
        |               / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
        |               * 10000.0 + 0.5) / 10000.0 AS cos
        |       FROM dp JOIN nrm x ON a_id = x.vec_id
        |       JOIN nrm y ON b_id = y.vec_id
        |       JOIN lab la ON a_id = la.vec_id
        |       JOIN lab lb ON b_id = lb.vec_id),
        |knn AS (SELECT a_id, a_label, b_label
        |        FROM (SELECT *, row_number() OVER (PARTITION BY a_id
        |                ORDER BY cos DESC, b_id ASC) AS rk
        |              FROM sc)
        |        WHERE rk <= 5),
        |votes AS (SELECT a_id, a_label, b_label,
        |            CAST(count(*) AS BIGINT) AS v
        |          FROM knn GROUP BY 1, 2, 3),
        |maj AS (SELECT a_id, a_label, b_label AS knn_label
        |        FROM (SELECT *, row_number() OVER (PARTITION BY a_id
        |                ORDER BY v DESC, b_label ASC) AS rn
        |              FROM votes)
        |        WHERE rn = 1)
        |SELECT a_label AS label, CAST(count(*) AS BIGINT) AS n_vectors,
        | CAST(sum(CASE WHEN knn_label <> a_label THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_flagged,
        | floor(CAST(sum(CASE WHEN knn_label <> a_label THEN 1 ELSE 0 END)
        |            AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS noise_rate
        |FROM maj GROUP BY a_label ORDER BY label""".stripMargin,

    "q_match_vshape" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |taps AS (SELECT d, cents,
        |    lag(cents, 1) OVER w AS prev,
        |    COALESCE(
        |      CASE WHEN lead(cents, 1) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(1 AS BIGINT) END,
        |      CASE WHEN lead(cents, 2) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(2 AS BIGINT) END,
        |      CASE WHEN lead(cents, 3) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(3 AS BIGINT) END) AS rec_day
        |  FROM daily WINDOW w AS (ORDER BY d ASC))
        |SELECT d AS dip_day,
        | floor(CAST(prev AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS pre_drop_revenue,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS dip_revenue,
        | floor((1.0 - CAST(cents AS DOUBLE) / CAST(prev AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS drop_frac,
        | rec_day AS days_to_recovery
        |FROM taps
        |WHERE prev IS NOT NULL AND cents * 100 < prev * (100 - 30)
        |ORDER BY dip_day""".stripMargin,

    "q_rising_streaks" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |flagged AS (SELECT seg, m, cents,
        |    CASE WHEN cents > lag(cents, 1) OVER ws THEN 1
        |         WHEN lag(cents, 1) OVER ws IS NULL THEN NULL ELSE 0 END AS rise
        |  FROM monthly WINDOW ws AS (PARTITION BY seg ORDER BY m ASC)),
        |isl AS (SELECT seg, m, cents, rise,
        |    sum(CAST(1 - rise AS BIGINT)) OVER (PARTITION BY seg ORDER BY m ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged WHERE rise IS NOT NULL),
        |streaks AS (SELECT seg, island, CAST(count(*) AS BIGINT) AS len,
        |    min(m) AS start_m, max(m) AS end_m,
        |    max(cents) - min(cents) AS climb_cents
        |  FROM isl WHERE rise = 1 GROUP BY 1, 2),
        |best AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY seg
        |      ORDER BY len DESC, start_m ASC) AS rn FROM streaks)
        |  WHERE rn = 1)
        |SELECT seg, len AS streak_months, start_m, end_m,
        | floor(CAST(climb_cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS climb
        |FROM best ORDER BY seg""".stripMargin,

    "q_peak_detection" ->
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT wk, cents,
        |    sum(cents) OVER nb AS nb_sum,
        |    count(cents) OVER nb AS nb_cnt,
        |    greatest(lag(cents, 3) OVER w, lag(cents, 2) OVER w,
        |             lag(cents, 1) OVER w, lead(cents, 1) OVER w,
        |             lead(cents, 2) OVER w, lead(cents, 3) OVER w) AS max_other
        |  FROM weekly
        |  WINDOW w AS (ORDER BY wk ASC),
        |         nb AS (ORDER BY wk ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT wk AS peak_week,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS revenue,
        | floor((CAST(cents AS DOUBLE) * CAST(nb_cnt - 1 AS DOUBLE)
        |        / CAST(nb_sum - cents AS DOUBLE) - 1.0) * 10000.0 + 0.5)
        |   / 10000.0 AS prominence
        |FROM st
        |WHERE nb_cnt = 7 AND cents > max_other
        |  AND cents * (nb_cnt - 1) * 100 > (nb_sum - cents) * (100 + 20)
        |ORDER BY peak_week""".stripMargin,

    "q_auc_roc" ->
      """WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |         AS BIGINT) AS q
        |  FROM embeddings),
        |cents AS (SELECT label AS label_c, pos, CAST(sum(q) AS BIGINT) AS s
        |          FROM ex GROUP BY 1, 2),
        |cn AS (SELECT label_c,
        |         CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS cn2
        |       FROM cents GROUP BY 1),
        |per AS (SELECT e.vec_id, e.label, c.label_c,
        |    CAST(sum(CAST(e.q AS DECIMAL(38,0)) * c.s) AS DECIMAL(38,0)) AS dp,
        |    CAST(sum(CAST(e.q AS DECIMAL(38,0)) * e.q) AS DECIMAL(38,0)) AS n2
        |  FROM ex e JOIN cents c ON e.pos = c.pos GROUP BY 1, 2, 3),
        |sc AS (SELECT label_c,
        |    CASE WHEN label = label_c THEN 1 ELSE 0 END AS is_pos,
        |    floor(CAST(dp AS DOUBLE)
        |          / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
        |          * 10000.0 + 0.5) / 10000.0 AS score
        |  FROM per JOIN cn USING (label_c)),
        |rk AS (SELECT label_c, is_pos,
        |    2 * rank() OVER (PARTITION BY label_c ORDER BY score ASC)
        |      + count(*) OVER (PARTITION BY label_c, score) - 1 AS r2
        |  FROM sc)
        |SELECT label_c AS label, CAST(sum(is_pos) AS BIGINT) AS n_pos,
        | CAST(sum(1 - is_pos) AS BIGINT) AS n_neg,
        | floor(CAST(sum(is_pos * r2) - sum(is_pos) * (sum(is_pos) + 1)
        |            AS DOUBLE)
        |       / (2.0 * CAST(sum(is_pos) AS DOUBLE)
        |          * CAST(sum(1 - is_pos) AS DOUBLE)) * 10000.0 + 0.5)
        |   / 10000.0 AS auc
        |FROM rk GROUP BY 1 ORDER BY label""".stripMargin,

    "q_pr_curve" ->
      """WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |         AS BIGINT) AS q
        |  FROM embeddings),
        |c0 AS (SELECT pos, CAST(sum(q) AS BIGINT) AS s
        |       FROM ex WHERE label = 0 GROUP BY 1),
        |cn AS (SELECT
        |    CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS cn2
        |  FROM c0),
        |per AS (SELECT e.vec_id, max(e.label) AS label,
        |    CAST(sum(CAST(e.q AS DECIMAL(38,0)) * c.s) AS DECIMAL(38,0)) AS dp,
        |    CAST(sum(CAST(e.q AS DECIMAL(38,0)) * e.q) AS DECIMAL(38,0)) AS n2
        |  FROM ex e JOIN c0 c ON e.pos = c.pos GROUP BY e.vec_id),
        |sc AS (SELECT vec_id,
        |    CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_pos,
        |    floor(CAST(dp AS DOUBLE)
        |          / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
        |          * 10000.0 + 0.5) / 10000.0 AS score
        |  FROM per CROSS JOIN cn),
        |cum AS (SELECT vec_id, is_pos, score,
        |    CAST(row_number() OVER wd AS BIGINT) AS rk,
        |    CAST(sum(is_pos) OVER (ORDER BY score DESC, vec_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_pos
        |  FROM sc WINDOW wd AS (ORDER BY score DESC, vec_id ASC)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(is_pos) AS BIGINT) AS np FROM sc),
        |cuts AS (SELECT CAST(k AS BIGINT) AS decile, k * n // 10 AS rk, np
        |         FROM generate_series(1, 10) t(k) CROSS JOIN tot)
        |SELECT decile, cum.rk AS n_kept, cum_pos AS n_pos_kept,
        | floor(CAST(cum_pos AS DOUBLE) / CAST(cum.rk AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS precision,
        | floor(CAST(cum_pos AS DOUBLE) / CAST(np AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS recall,
        | floor(2.0 * CAST(cum_pos AS DOUBLE) / CAST(cum.rk + np AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS f1
        |FROM cum JOIN cuts ON cum.rk = cuts.rk
        |ORDER BY decile""".stripMargin,
  )
}
