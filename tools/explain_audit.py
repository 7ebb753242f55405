"""Generate EXPLAIN.md: the formatted physical plan of each headline
query with a one-line audit note — the "is this the plan I'd want at
100 TB" artifact. Regenerate after plan-affecting changes:

    python tools/explain_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# query -> what the plan must show (the audit claim)
HEADLINERS = {
    "topk_similarity": "broadcast query side; corpus streams; no pair sort",
    "minhash_lsh": "candidates from (band_id, band_sig) equi-join, no crossJoin",
    "dedup_clusters": "small-graph route: one bounded take, driver union-find",
    "range_join_binned": "hash equi-join on (key, bin) - no BroadcastNestedLoopJoin",
    "rollup_timeseries": "hour/day re-aggregate minute partials, raw scanned once",
    "winnow_fingerprint": "two Window nodes, ONE per-doc sort, no Python",
    "join_revenue_by_nation": "dim side broadcast, fact scans filtered+pruned",
    "star_join_revenue": "5-way star: dims broadcast, date/returnflag pushed to scans",
    "pricing_summary": "partial+final hash agg (map-side combine)",
    "funnel_conversion": "all stages keyed on user_id (exchange reuse)",
    "scoring_e2e": "two Arrow-batched Python stages (chunker, LLM), joins native",
    "bucketed_join": "SortMergeJoin, NO shuffle Exchange (bucketed storage; "
    "broadcast disabled here because at this toy SF the planner would "
    "broadcast the dim - at scale both sides exceed the threshold)",
    "stream_attribution_join": "time-bounded join condition (watermark-evictable)",
    "stream_view_conversion": "LEFT OUTER interval join on the user equi-key "
    "(SortMergeJoin, range as join condition — no nested loop); in stream "
    "mode the NULL-match row is watermark state eviction",
    "media_ihdr_histogram": "fixed-offset big-endian IHDR parse as a narrow "
    "hex projection (no UDF, no join); ONE exchange for the bounded "
    "dimension-histogram rollup",
    "media_ext_quarantine": "extension route + magic detect both per-row on "
    "one scan; ONE exchange for the bounded (route x detected) rollup",
    "pipeline_e2e": "dedup window + embed + partial-top-k in ONE plan, one scan",
    "decontaminate": "distinct benchmark gram set broadcast; train side streams",
    "pq_topk": "ADC rank = broadcast m*k distance table equi-join on "
    "(subspace, code) + map-side sum; no raw vector in the ranking join",
    "ivf_pq_topk": "coarse routing prunes candidates to probed partitions "
    "BEFORE the ADC join; broadcast sides are <=nlist / <=m*k rows; "
    "fused fit (coarse + all m codebooks in ONE grouped Lloyd pass), "
    "corpus encoded cid+codes in ONE literal-argmin projection",
    "stream_ann_dedup_gate": "arriving side computes its bucket "
    "signature NARROWLY; static index broadcast into the bucket "
    "equi-join; top-1 a struct-min hash agg (streaming-safe, no rank "
    "window)",
    "media_magic_dispatch": "narrow hex-prefix dispatch pushed to the "
    "scan; only the (declared x detected)-bounded rollup shuffles",
    "cms_heavy_hitters": "sketch build is map-side combined (<=d*w cells per "
    "partition cross the wire); probes join the broadcast sketch",
    "bloom_contamination": "bloom bitset broadcast; probe side streams "
    "through an equi-join on the bit position",
    "repetition_filter": "ONE tokenization, tagged explode, two hash aggs, "
    "zero joins, zero Python",
    "corpus_shuffle": "global positions via bucket-offset rank: data windows "
    "partitioned by bucket; only the <=256-row offset table is single-partition",
    "pagerank_neardup": "edge list checkpointed once; each iteration one "
    "equi-join + map-side-combined sum; the linear rank chain runs as "
    "ONE job (r11 dropped the per-round eager checkpoints, 2x)",
    "semdedup": "pair scan is a cid equi-join over the persisted Lloyd "
    "assignment (InMemoryTableScan on both sides, fit runs once); only "
    "the <=8-row centroid table is nested-loop-broadcast",
    "ngram_lm_score": "three vocab-sized hash-agg LM tables; scoring = "
    "hash equi-joins on (w1,w2)/w1/w2 + ONE single-row broadcast total; "
    "per-doc mean is a map-side-combined hash agg, no window",
    "line_dedup": "keep-first decision = ONE window hash-partitioned by "
    "chunk text (partition size = chunk frequency); reassembly a per-doc "
    "hash agg; no joins wider than the doc_id left join",
    "dsir_weights": "<=4096-row bucket LM ratio table broadcast into the "
    "scoring join; per-doc mean map-side combined; only scalars cross "
    "as single-row broadcasts",
    "weighted_sample": "per-row key projection, TakeOrderedAndProject "
    "partial top-n; the rank window touches only the n selected rows",
    "bm25_rank": "per-doc tf from native array ops (no explode); corpus "
    "stats ONE single-row broadcast; top-k = TakeOrderedAndProject",
    "rrf_hybrid": "each ranker cut to its pool by TakeOrderedAndProject "
    "BEFORE the global row_number; fusion join sees <=2*pool rows",
    "substring_dedup": "posting list linear in tokens; dup-gram filter a "
    "map-side-combined count-distinct; posting joins back on the gram "
    "hash (1:1, no pairwise blow-up); islands window per-doc only",
    "hard_negatives": "label filter pre-aggregation; argmin a "
    "min(struct) hash agg with map-side partial combine",
    "pmi_collocations": "map-side-combined gram counts; vocab-sized "
    "unigram equi-joins; totals ONE single-row broadcast; top-k = "
    "TakeOrderedAndProject",
    "quality_classifier": "256-row model table broadcast into the "
    "bucket equi-join; per-doc mean map-side combined; no "
    "corpus-wide shuffle beyond the per-doc agg",
    "embedding_outliers": "labels*dims centroid table broadcast; "
    "per-vector sum and per-label moments map-side-combined hash "
    "aggs; no window, no pairwise join",
    "skew_salted_join": "ShuffledHashJoin on (key, _salt): each hot "
    "key spreads over 8 reducers; dim replicated 8x, never broadcast "
    "(which would hide the skew at toy SF)",
    "substring_remove": "ONE persisted (id, pos, tok) stream feeds "
    "gram build, owner reduction, AND reassembly (single tokenization "
    "pass); drop set bounded by dup positions x k; removal an "
    "anti-join; reassembly a per-doc hash agg",
    "ewma_smoothing": "4 lag() taps share ONE per-user window sort; "
    "fixed 5-term fold, no long float sums, no state",
    "regression_stats": "regression moments decompose like sum/count: "
    "one map-side-combined hash agg, pricing_summary's scale story",
    "rerank_e2e": "recall (BM25+dense RRF) cuts to a 20-row pool "
    "BEFORE the rerank scorer touches text — rerank cost independent "
    "of corpus size",
    "session_window_agg": "engine-managed MergingSessions node (the "
    "streaming-safe sessionizer; UpdatingSessions in stream mode) — "
    "one per-user sort, no lag/running-sum windows",
    "kruskal_wallis": "global tie-averaged ranks WITHOUT a fact-sized "
    "window: distinct-value grain + global_prefix bucket-offset scan; "
    "per-(seg,value) counts equi-join the rank grain",
    "holt_linear_forecast": "reduce-then-fold: one day-grain cents "
    "hash agg, the sequential recursion a single-row JVM aggregate() "
    "fold — no iterative joins, no window, no driver loop",
    "isotonic_calibration": "ONE fact scan to the 10-cell bin agg; "
    "the bins²/bins³ minimax joins run on broadcast constant-sized "
    "frames — the 'cubic' PAV formula costs nothing",
    "rmst": "kaplan_meier's lifetable chain: user-grain agg, 1-row "
    "horizon broadcast, every window on the calendar-bounded "
    "event-time grain, 1-row integral reduction",
    "graph_triangles": "compact-forward: triangles from TWO hash "
    "equi-joins over the a<b edge list — never a neighborhood "
    "crossJoin; only two single-row summaries broadcast",
    "ann_recall_eval": "LSH and exact rankings in ONE plan; recall "
    "comparison an equi-join on (query, vec), no collect",
    "winsorize_stats": "two scans: bounded bucket histogram locates "
    "p01/p99 (window over bucket rows only), clip+re-agg; NO "
    "per-group sort of raw values anywhere",
    "approx_stats": "sketches, exact count-distinct, and exact "
    "percentiles in THREE independent aggs joined broadcast on the "
    "3-row flag key — one combined agg makes the distinct-Expand "
    "carry a percentile buffer per (flag, orderkey) partial group "
    "(measured 209 s vs ~1 s at sf0.1); exact side: two-phase "
    "distinct + the bounded bucket-histogram percentile plan",
    "simhash_neardup": "fingerprint pipeline persisted across both "
    "self-join sides (InMemoryTableScan x2); md5 runs per DISTINCT "
    "(doc, token) with count weighting; candidates from the "
    "(band_id, band_val) equi-join, popcount verify in-bucket",
    "containment_neardup": "shared-shingle equi-join candidates "
    "(posting list persisted across both sides); intersection a "
    "map-side-combined count per pair; sizes join back by id",
    "hll_distinct": "register build is ONE map-side-combined max-agg "
    "(<= 2^p rows per group cross the wire); estimate an exact "
    "scaled-integer sum per group",
    "psi_drift": "one explode + one map-side-combined token agg; "
    "only the <=top-N vocabulary and a single broadcast totals row "
    "survive the agg",
    "gap_fill_daily": "grid inherits the bounds agg's user_id "
    "partitioning, so the LOCF window adds NO Exchange of its own; "
    "observed days join in (broadcast at this SF, user_id equi-join "
    "at scale); grid rows generated by sequence(), never shuffled",
    "embedding_whiten": "per-dim stats ONE map-side-combined agg; "
    "transform a zip_with against literal arrays — pure projection, "
    "no join-back, no second shuffle",
    "temperature_mixture": "group counts one hash agg (bounded "
    "collect); admission the deterministic hash-rank window on the "
    "group key with a broadcast target dim",
    "pca_top_component": "Gram matrix from per-Arrow-batch C'C "
    "partials (ArrowEvalPython/mapInPandas stage, <= d^2 rows per "
    "batch shuffled); projection a codegen'd fold against literal "
    "arrays",
    "media_binary_neardup": "byte grams from ONE native hex() + "
    "substring transform (no Python, no decode); same persisted "
    "fingerprint + (band_id, band_val) equi-join core as text "
    "SimHash",
    "bpe_encode_stats": "encoding is a BROADCAST word-type lookup "
    "join — the corpus word stream never re-merges per occurrence; "
    "per-doc fertility a map-side-combined hash agg",
    "term_frequency": "top-N vocab cut = TakeOrderedAndProject over "
    "map-side-combined token counts; rank from the bounded-array "
    "posexplode — NO Window node (r5 sorted the whole vocabulary in "
    "one partition)",
    "mllib_lsh_agreement": "MLlib candidates from the exploded "
    "hash-table equi-join; exact distances recomputed via bounded id "
    "joins so the oracle fold matches bit-for-bit",
    "cohort_retention": "first-activity and active-week aggs both "
    "keyed on user_id; cohort-size dim |weeks|-bounded broadcast; "
    "no windows anywhere",
    "wilson_ranking": "one source-keyed hash agg; rank over the "
    "|sources|-bounded array fold, no unbounded window",
    "seasonal_adjust": "raw events collapse to the daily grain "
    "FIRST; dow and overall dims (7 x types, types) broadcast back",
    "benford_dq": "one 9-bucket map-side-combined hash agg + a "
    "single-row broadcast total; digit dim is a local 9-row range",
    "negative_sampling": "integer CDF over the bounded vocab; draws "
    "equi-join the BROADCAST bin table (binned-range-join pattern) — "
    "never a draws x vocab nested loop",
    "margin_bitext": "bounded source side broadcast into the scoring "
    "join; neighborhood means are partitioned rank windows + keyed "
    "hash aggs; best-pair pick a per-source window",
    "ngram_diversity": "pre-aggregated to (source, bigram, n) first "
    "(map-side combined) then rolled up — no multi-distinct Expand "
    "doubling the exploded stream",
    "rolling_anomaly": "events collapse to the daily grain before "
    "the window; trailing frame runs over day-grain rows partitioned "
    "by event_type; moments are exact integer window sums",
    "inverted_index": "df cut = TakeOrderedAndProject; posting "
    "assembly joins the BROADCAST 20-term dim against the distinct "
    "(doc, token) stream",
    "align_uniformity": "bounded-sample (asserted) broadcast pair "
    "base; both metrics map-side-combined aggs over the pair stream; "
    "summaries cross as single rows",
    "keyword_tag": "small dict: literal array_intersect projection — "
    "NO join, NO shuffle; large dict: broadcast-join route (pinned "
    "by test_keyword_tag_routes_by_dictionary_size)",
    "skill_coverage": "matched sets from the no-join literal route, "
    "persisted once across df/idf/per-doc consumers; idf dims "
    "dictionary-bounded broadcasts",
    "quantile_normalize": "both CDFs on bucket histograms (source "
    "window partitioned by source over bucket rows); pooled "
    "inverse-CDF a 20-row broadcast map; docs join by (source, "
    "bucket) equi-join — no global sort, no percent_rank over rows",
    "bootstrap_ci": "all 32 resamples live in ONE map-side-combined "
    "hash agg (64 partial sums per group); replicate means a bounded "
    "array sort — the corpus is never scanned or resampled B times",
    "event_transitions": "ONE per-user window sort; transition counts "
    "and row normalizer are |types|^2-bounded hash aggs + a broadcast "
    "dim join",
    # -- round 7 --
    "market_basket": "ONE groupBy(order) collect_set basket build "
    "(doubles as the (order, brand) distinct); pairs generated "
    "expression-side from the sorted arrays (per-order fanout "
    "bounded by line count, never corpus x corpus, no self-join "
    "shuffle); part dim + brand counts + order total all broadcast",
    "ngram_jaccard": "capped route: per-shingle doc baskets from ONE "
    "groupBy (the df cap is the basket-size filter), pairs generated "
    "expression-side from sorted <=max_df arrays — no posting "
    "self-join shuffle; sizes re-explode the SAME capped baskets",
    "sequence_packing": "one token-count projection, ONE bucketed "
    "prefix shuffle (exact BIGINT accumulation), 1-row summary agg; "
    "the per-bin grain never materializes",
    "abc_pareto": "global rank/cumshare via the two-phase prefix scan "
    "(operators/prefix.py): monotone width_bucket assignment + window "
    "PARTITIONED BY _bkt; the ONLY unpartitioned window covers "
    "n_buckets summary rows, never the part dimension; integer-cents "
    "running sums",
    "gini_concentration": "ascending spend rank from the same "
    "distributed prefix scan; final Gini a 1-row agg of exact "
    "integer products",
    "rfm_segments": "customer grain ONE hash agg; quartile boundaries "
    "a 1-row percentile agg broadcast back — no ntile window over "
    "customers",
    "chi2_independence": "one fact-sized hash agg; dims completion + "
    "marginals all |nations| x |segments|-bounded broadcasts",
    "level_shift": "events collapse to (type, day) integer-sum grain "
    "BEFORE any window; both trailing frames run over calendar-"
    "bounded rows",
    "time_weighted_avg": "ONE partitioned lead() window; weighted sum "
    "is exact integer (decimal-accumulated) arithmetic",
    "sax_symbolize": "day-grain agg -> segment agg -> 8-element "
    "arrays; mean/variance fold in explicit textual order (engine-"
    "portable float determinism)",
    "readability_ari": "pure per-row projection, whole-stage codegen, "
    "no shuffle",
    "boilerplate_ngrams": "df >= 2 pre-filter bounds the vocabulary "
    "BEFORE the per-source top-k window (term_frequency lesson)",
    "fd_check": "per-FD two-phase countDistinct hash aggs reduced to "
    "1-row summaries; union of n_candidates rows",
    "keyword_tag_broadcast": "forced large-dictionary route: exploded "
    "candidates equi-join the BROADCAST dictionary; corpus never "
    "re-scanned per term",
    "heaps_law": "ONE scan, ONE explode: rollup(source, doc_id) over "
    "the token stream yields per-doc fit points (gid 0) AND "
    "per-source totals (gid 1) from one localCheckpointed bounded "
    "output; OLS regr_* over per-DOCUMENT points, 1-row fit "
    "broadcast back",
    "ensemble_neardup": "ONE exploded+counted token grain persisted, "
    "feeding BOTH MinHash signatures and SimHash weights; three "
    "banded/bucketed candidate paths, vote agg on the union",
    # -- round 8 --
    "vocab_overlap": "pair intersection is a token-keyed self-EQUI-"
    "join of the DISTINCT (source, token) grain — no doc x doc or "
    "source x source cross join; size dims broadcast",
    "entity_resolution": "candidate generation is a plain equi-join "
    "on the 4-digit block key — never a name x name cross join; "
    "min-distance pick windowed PER dirty record",
    "equi_depth_histogram": "ntile replay on the prefix scan with "
    "sampled equal-height bounds (one extra approx-percentile agg); "
    "window PARTITIONED BY _bkt, unpartitioned window only over "
    "n_buckets summary rows",
    "snapshot_diff": "ONE full-outer shuffle join on the snapshot "
    "key + 4-group hash agg; both versions derived from one scan",
    "ks_test": "both ECDF counters ride ONE multi-sum prefix scan "
    "(one bucketed shuffle of the distinct-cents grain); sup taken "
    "on exact decimal(38,0) integer cross-multiples",
    "kaplan_meier": "fact -> user grain -> LIFETIME-day grain before "
    "any window; risk-set + survival windows run over the calendar-"
    "bounded grain only",
    "acf_daily": "day-grain integer-cents agg, then a calendar-key "
    "equi-join fanned by a 7-element literal explode — day x lags "
    "rows, no window at all",
    "stream_drift_monitor": "two fact-sized bucket-count hash aggs; "
    "PSI finalize joins only bounded pre-aggregates with the "
    "baseline broadcast (streaming run keeps windows x types x 10 "
    "buckets of state)",
    "welch_ttest": "ONE conditional aggregate computes all six "
    "sufficient statistics map-side combined; everything after is "
    "scalar arithmetic on a 1-row frame",
    "ratio_metric_delta": "user-grain hash agg, then a 2-row per-arm "
    "moment agg carrying the covariance — no per-event variance "
    "shortcut",
    "cuped_adjustment": "user-grain conditional agg, 1-row pooled "
    "theta broadcast back, per-arm finalize — three bounded shuffles, "
    "fact touched once",
    "srm_check": "distinct users -> 10-cell hash agg -> 1-row "
    "moment-expansion chi2; empty cells need no completion join",
    "jackknife_ratio_ci": "one (arm,bucket)-grain agg over the fact "
    "(64 cells), broadcast totals join, O(1) finalize — resample "
    "grain bounded at 32 regardless of user count",
    "zone_map_pruning": "1-row bounds agg broadcast, two fact "
    "projections unioned into a 128-cell (layout,file) agg, O(1) "
    "finalize — no window",
    "user_streaks": "distinct (user,day), then window + both aggs "
    "all partitioned by user_id — one exchange reused end-to-end",
    "forecast_backtest": "fact collapses to the day grain before any "
    "window; the only unpartitioned window covers the bounded "
    "calendar (~2.5k rows)",
    "mde_power": "user-grain hash agg then one 1-row conditional "
    "aggregate — O(1) after the user agg",
    "qte_deciles": "user-grain agg, then the bucket-histogram exact "
    "percentile plan per arm; melt/pivot on 18 rows",
    "compaction_plan": "bucketed prefix-scan shuffle (no "
    "single-partition window) then a bin-grain agg",
    "join_plan_advisor": "per join one build count + one probe "
    "per-key agg summarized map-side to 1 row; three bounded frames "
    "unioned",
    "roc_auc": "value-grain agg then the bucketed prefix scan over "
    "distinct scores — AUC ranks values, not rows; 1-row finalize",
    "calibration_eval": "1-row moments broadcast, one 10-cell hash "
    "agg over the fact — no window, no join",
    "pareto_frontier": "day-grain max, suffix running max on the "
    "bounded day summary, broadcast join back — no dominance "
    "self-join, no fact-sized sort",
    "k_anonymity": "one QI-grain hash agg (distinct inside the same "
    "grouping), 1-row finalize — no window, no join",
    "dp_noisy_counts": "one dimension-grain hash agg then scalar "
    "seeded-hash Laplace arithmetic per group — no second pass",
    "theil_sen_trend": "day-grain collapse first; calendar-bounded "
    "broadcast self-pairing; slope median via sketch-guided exact "
    "selection — only the ~4% bracket slice is ever sorted",
    "mann_kendall": "same calendar-bounded pair base; S and the tie "
    "census are integer hash aggs, 1-row finalize",
    "cusum_changepoint": "day-grain collapse, 1-row totals broadcast, "
    "cusum window over the bounded calendar summary only",
    "stl_decompose": "calendar-filled day grain; MA7/rank windows over "
    "the bounded calendar; seasonal joins are 7-row broadcasts",
    "diff_in_did": "ONE conditional hash agg over the fact after a "
    "1-row cutoff broadcast — no window, 4-group finalize",
    "zipf_fit": "token hash agg, global top-k via TakeOrdered (never "
    "a vocab-sized window), 1-row fit/coverage finalize",
    "llr_keyness": "token df-filter BEFORE the per-source window; "
    "source/grand totals broadcast; window over the pruned grain",
    "hurst_exponent": "day-grain collapse, one calendar-bounded "
    "(day x blocks) hash agg, |blocks|-row variance table, 1-row OLS "
    "— no window",
    "cramers_v": "the chi2_independence plan (dimension-bounded "
    "cells, broadcast marginals) plus a 1-row scalar finalize",
    "effective_sources": "ONE source-grain hash agg over the corpus, "
    "scalar entropy arithmetic on |sources| rows",
    # -- round 9: curation / governance family --
    "ngram_contamination": "train grams collapse to DISTINCT before the "
    "probe; eval-vs-train is ONE hash equi-join on the gram key — no "
    "pair enumeration, no window",
    "intradoc_repetition": "non-distinct bigram explode -> (doc, gram) "
    "map-side-combined hash agg -> doc-grain agg; zero joins, zero "
    "windows, zero Python",
    "unigram_logprob_quality": "(doc, token) grain rebuilt per "
    "consumer from the pruned scan (no fact-sized cache); vocab "
    "checkpointed; per-doc NLL checkpointed once as the pipeline's "
    "own product; 1-row totals/moments broadcast",
    "neyman_allocation": "one dim-table hash agg to |nations| rows "
    "with exact-integer moments; 1-row total broadcast; projection out",
    "imr_control_chart": "fact -> day grain; ONE calendar-bounded lag "
    "window; 1-row limits broadcast back over the day grain",
    "permutation_entropy": "day grain -> bounded lead window -> <=6-row "
    "pattern agg; entropy and top pattern on that 6-row frame",
    "spearman_daily_corr": "rank windows run over the calendar-bounded "
    "day grain only; 1-row corr finalize",
    "sort_key_advisor": "physical rank via the bucketed prefix scan "
    "(no single-partition fact window); blocks collapse to n/4096 "
    "summary rows; 1-row global range broadcast; 3-row unpivot",
    "obrien_fleming_monitor": "fact filter -> (arm, look) hash agg "
    "(<=10 rows out); cumulative window PARTITIONED BY arm over <=5 "
    "rows; 5-row output",
    "benjamini_hochberg": "two dim-table hash aggs (global + segment "
    "moments, exact integers); rank window and step-up max over "
    "|nations| rows only",
    # -- round 9 batch 2: maintenance / graph / sketch ops --
    "incremental_agg_merge": "two map-side-combined partial aggs "
    "(old, delta) merged at the |priorities| grain; 1-row cutoff "
    "broadcast — the stored-summary + delta plan",
    "changelog_apply": "ONE window partitioned by key over <=3 ops "
    "per key; filter; |priorities|-row agg — the MERGE-compaction "
    "plan",
    "link_prediction_jaccard": "ONE groupBy(part) collect_set basket "
    "build (doubles as edge dedup); df cap = basket-size filter; "
    "pairs generated expression-side from sorted <=cap arrays "
    "(C(25,2) per part, never a self-join shuffle, never "
    "customers^2); degrees broadcast back; top-k = "
    "TakeOrderedAndProject",
    "degree_assortativity": "posting-list plan: ONE shuffle by part "
    "(collect_set), explode, ONE shuffle by supp folding closed-form "
    "decimal(38,0) corr moments; zero joins, zero checkpoints, 1-row "
    "finalize — no pair enumeration",
    "theta_sketch_setops": "every pairwise step joins <=k-row "
    "sketches (KMV rank window per type); exact companion one "
    "distinct + user-keyed self-join",
    "lsh_param_planner": "literal 5-row frame, pure projection + a "
    "5-row rank window — touches no data",
    "event_paths_top": "ONE per-user window produces both leads; "
    "path grain |types|^3-bounded; rank/top-k on that bounded frame",
    "anomaly_mad_daily": "day-grain collapse; median/MAD percentiles "
    "over the calendar-bounded grain; 1-row limits broadcast; 1-row "
    "out",
    "elasticity_by_brand": "broadcast dim join + ONE map-side-"
    "combined regression-moment hash agg per brand; no window",
    "funnel_time_to_convert": "user-grain aggs + one user-keyed "
    "equi-join; percentiles over the converted-user grain; 1-row out",
    "cross_source_leakage": "the dedup family's banded equi-join "
    "candidates + doc-keyed source joins; |sources|^2-bounded matrix "
    "agg",
    # -- round 10 --
    "lead_lag_ccf": "fact collapses to the calendar-bounded day grain "
    "FIRST; the lag sweep is a 15-row broadcast over that grain; "
    "exact-integer moments, 15-row out",
    "multitouch_attribution": "purchase-touch pairs from a user-keyed "
    "equi-join with a time band (never user^2); purchase-partitioned "
    "rank windows; three models read ONE pair frame",
    "ips_policy_eval": "one (segment x action) hash agg (15 cells), "
    "segment rollup broadcast back, 1-row finalize - no per-event "
    "weight column",
    "entropy_l_diversity": "two nested dimension-bounded hash aggs "
    "(QI x sensitive, then QI); entropy a closed form of exact cell "
    "counts - no window, no join",
    "join_cardinality_qerror": "estimates from 16-row histograms; "
    "EXACT cardinality from key-grain aggs joined key-to-key - no "
    "joined row ever materialized",
    "term_dispersion": "(term x source) hash agg; top-k = "
    "TakeOrderedAndProject bounds the dispersion grain; absent cells "
    "folded algebraically, never materialized",
    "matryoshka_eval": "consecutive-id equi self-join (LINEAR pair "
    "generator); all three cosines fold in one projection; 2-row "
    "moment finalize",
    "session_overlap_join": "bin-replicated interval join: explode to "
    "covered bins, hash equi-join on bin, first-shared-bin predicate "
    "dedups pairs WITHOUT a distinct shuffle",
    "encoding_advisor": "per-column runs from (orderkey)-partitioned "
    "lag windows (order-bounded, never global); 4-row union of "
    "1-row profiles",
    "nelson_aalen": "kaplan_meier's lifetable shape: user-grain agg, "
    "calendar-bounded lifetime grain, cumulative windows only over "
    "that bounded grain",
    "woe_iv": "order-grain label by key equi-join + hash agg; 5-row "
    "category grain; totals and IV are 1-row broadcasts",
    "pr_auc": "value-grain agg + ONE distributed prefix scan over "
    "distinct scores descending (global_prefix multi-sum, negated "
    "key); no per-row global rank; 1-row finalize",
    "cohens_kappa": "order-grain label join + ONE map-side-combined "
    "2x2 confusion agg; closed-form 1-row finalize",
    "t_closeness": "|classes| x |buckets| bounded spine (broadcast); "
    "cumulative windows partitioned BY CLASS; absent buckets filled "
    "by left join, never enumerated row-wise",
    "cramer_von_mises": "ks_test's dual-ECDF shape: value-grain agg, "
    "both cumulative counters on ONE global_prefix scan, exact "
    "integer ECDF gaps, 1-row finalize",
    "lorenz_curve": "customer-grain spend agg; rank + cumulative "
    "spend on ONE height-mode prefix scan (power-law key); decile "
    "rollup - no single-partition window",
    "mcnemar_test": "order-grain label join + ONE discordant-cell "
    "agg; 1-row closed form",
    # -- round 11, structure family --
    "hits_scores": "fact collapses ONCE to the distinct edge grain; "
    "M = EtE from one user-keyed self-join hash agg; the iteration "
    "runs on the collected |types|^2-bounded exact integers — no "
    "per-round job over the user grain",
    "label_propagation": "banded LSH candidates, then the cost-routed "
    "trajectory: bounded take() routes small graphs to the driver "
    "loop; distributed path is one edge-label equi-join + two "
    "map-side-combinable aggs per round, no collect_list",
    "shard_rendezvous": "linear explode to doc x (shards+1), ONE "
    "max_by(struct) hash agg per doc (no window), 16-row final agg",
    "conformal_interval": "order statistic from the bucket-histogram "
    "rank selection (no raw-score sort, no percentile buffer, no "
    "generic prefix machinery); predictor means a 5-row broadcast; "
    "scalars 1-row broadcasts",
    "bcubed_eval": "metric runs on the (pred x gold) CELL grain — "
    "bounded by cluster counts; labels from the cost-routed cc over "
    "banded candidates; fixed-point integer algebra end to end",
    "doremi_reweight": "token stream pre-aggregated to (source, tok) "
    "BEFORE the vocab join (grouped-grain equi-join, never raw "
    "occurrences); |sources|-bounded algebra after",
    "shapley_attribution": "fact collapses to per-user touchset "
    "bitmasks (one bit_or agg), then the <=2^n (mask, conversions) "
    "census; the coalition enumeration runs driver-side on that "
    "bounded census, guarded at n<=20 channels",
    "burstiness_fano": "ONE (type, day) hash agg; zero-fill grid is "
    "|types| x calendar-bounded days; moment agg per type — no "
    "windows, exact integer moments",
}


def main() -> None:
    from resume_jd_matcher_spark import queries as Q
    from resume_jd_matcher_spark.session import get_spark

    spark = get_spark("explain-audit")
    out = [
        "# EXPLAIN — headline-query physical plans (sf0.001, local)",
        "",
        "Generated by `python tools/explain_audit.py`. Each section states",
        "the plan property the query is DESIGNED around, then the formatted",
        "physical plan that exhibits it. Plan-shape regressions are pinned",
        "by `tests/test_plans.py`; this file is the human-readable audit.",
        "",
    ]
    for name, claim in HEADLINERS.items():
        import contextlib
        import io

        no_bcast = name == "bucketed_join"
        if no_bcast:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            df = Q._REGISTRY[name].fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        finally:
            if no_bcast:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        # keep the node tree, drop the verbose per-node details
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"**Audit claim:** {claim}", "", "```"]
        out += [tree, "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
