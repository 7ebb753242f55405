"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine path;
``oracle_sql`` is the equivalent ANSI SQL the driver runs on DuckDB
over the same parquet tables (views: region nation customer supplier
part orders lineitem events documents embeddings). None → rows-only
check (non-SQL-expressible op).

Contract shared by every pair (FIXTURES.md oracle-harness notes):
- every computed column aliased identically on both sides;
- floats rounded in-query where exposed;
- timestamps exposed as epoch BIGINT or formatted strings, never raw
  (parquet ms/ns precision + dialect formatting differ);
- deterministic tie-breaks on every top-k / limit;
- float arrays cast to DOUBLE before arithmetic on both sides, folded
  left-to-right (bit-compatible accumulation).

Half-up rounding nudge (``round(x + 1e-9, k)``) — tie-distance audit
(r12, census in tools/nudge_audit.py). The nudge itself is never the
risk; the question is whether the value reaching ``round`` can DIFFER
between engines. Three classes:

1. **Bit-identical by exactness** (the majority): a single float
   division of exactly-transported integers — counts, integer cents
   (``round(value*100)``; the fixtures are integer-cents by
   construction), token counts. Same two integers divided → same
   float64 on both engines → identical rounding regardless of tie
   distance. Additionally the tie-distance lemma
   |a/b − (2m+1)/(2·10^k)| ≥ 1/(2·10^k·b) means such a quotient
   cannot even land within 1e-9 of a round-half boundary unless
   exactly ON it (which the nudge resolves identically). Sums of
   integers below 2^53 are exact in float64, so order-independence
   extends to avg/sum of integer-valued doubles.
2. **Bit-identical by contract**: float folds with pinned evaluation
   order (left-to-right array aggregates, identical scalar
   expression trees over identical inputs).
3. **Order-dependent watch class**: unordered float aggregates over
   genuinely fractional values (sum/avg/corr of transcendental
   per-row terms). Engines can diverge by ~1 ulp per merge; a hash
   flip needs the true value within that radius of a boundary —
   generic values make this ~(n·2^-52)/10^-k per readout, negligible
   at fixture scales UNLESS the algebra subtracts near-equal large
   moments (catastrophic cancellation), which amplifies the
   divergence into the exposed digits. That cancellation-amplified
   subclass is the CAN-TIE class and is kept at ZERO: every moment
   ratio (beta, theta, corr, slope) is computed from exact
   DECIMAL(38,0) integer moments and composed in DOUBLE after
   aggregation — rolling_beta (r11), regression_stats and
   cuped_adjustment (r12). New single-row moment-ratio readouts MUST
   use this discipline (or scaled-integer exposures like beta_e4 /
   matthews_mcc / authority_e9) rather than native float
   corr/regr_*/var_pop.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class QueryDef(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle is not None}


# Each module registers its queries on import; _DRIVER_PRIORITY below
# then fixes the order the driver sees (it samples the first 50).
from resume_jd_matcher_spark.queries import vector_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import relational_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import text_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import scoring_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import stream_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import advanced_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import sampling_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import corpus_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import retrieval_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import analytics_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import mining_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import evalops_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import curation_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import ops_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import evalplan_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import inference_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import structure_q  # noqa: E402,F401

# The driver records correctness for the first 50 registered queries
# per round. Rotation policy: never-driver-checked > second
# confirmation > multiply-confirmed anchors. Full rotation history
# lives in git; per-round full-registry results (all queries, not
# just the window) are committed as SELFCHECK_r{N}.json by
# tools/driver_sim.py — diff those instead of reading rotation
# comments.
#
# Round 12 window (the driver samples the first 50) — r11 verdict
# task 2 verbatim:
# 1) the 8 r11 structure debuts lead (zero driver rows so far;
#    conformal_interval and shapley_attribution additionally carry
#    this round's percentile-clamp / overflow-guard reworks, so their
#    rows double as re-confirmations);
# 2) the five r10 names displaced from r11's window (queued for this
#    exact slot by the r11 rotation comment);
# 3) the r8/r9 tail that hasn't had a driver row since its debut
#    round — the round-9 cohort's second confirmations, the r10
#    rework batch (link_prediction_jaccard, decontaminate, ...,
#    whose code changed after their last row), and the r8 names
#    whose second confirmation never fit a window (mde_power ...).
# r12 debuts (streaming/multimodal additions) queue immediately
# below the boundary to lead r13.
_DRIVER_PRIORITY = [
    # -- r11 structure debuts: first driver rows --
    "bcubed_eval",
    "burstiness_fano",
    "conformal_interval",
    "doremi_reweight",
    "hits_scores",
    "label_propagation",
    "shapley_attribution",
    "shard_rendezvous",
    # -- r10 debuts displaced from r11's window --
    "matthews_mcc",
    "theil_index",
    "hhi_concentration",
    "cohens_kappa",
    "mcnemar_test",
    # -- rotate-forward: one driver row only (r8) --
    "effective_sources",
    # -- reworked in round 10 (code changed; must re-confirm) --
    "link_prediction_jaccard",
    "degree_assortativity",
    "decontaminate",
    "join_theta_band",
    # -- reworked in round 10 batch 2 (persisted-ledger cache path) --
    "zipf_fit",
    "llr_keyness",
    "theil_sen_trend",
    "approx_stats",
    "exact_percentiles",
    "qte_deciles",
    # -- round-9 cohort: second confirmations --
    "anomaly_mad_daily",
    "elasticity_by_brand",
    "funnel_time_to_convert",
    "incremental_agg_merge",
    "changelog_apply",
    "theta_sketch_setops",
    "lsh_param_planner",
    "event_paths_top",
    "ngram_contamination",
    "intradoc_repetition",
    "unigram_logprob_quality",
    "neyman_allocation",
    "imr_control_chart",
    "permutation_entropy",
    "spearman_daily_corr",
    "sort_key_advisor",
    "obrien_fleming_monitor",
    "benjamini_hochberg",
    "kaplan_meier",
    # -- r8 names whose second confirmation never fit a window --
    "mde_power",
    "join_plan_advisor",
    "calibration_eval",
    "pareto_frontier",
    "k_anonymity",
    "dp_noisy_counts",
    "mann_kendall",
    # ---- window boundary (50) ----
    # -- r12 debuts: queue to lead r13's window --
    "stream_session_dedup",
    "stream_ann_dedup_gate",
    "stream_topk_trending",
    "media_magic_dispatch",
    "media_payload_entropy",
    "sequence_packing",
    # -- remaining r8 second confirmations --
    "cusum_changepoint",
    "stl_decompose",
    "diff_in_did",
    "hurst_exponent",
    "silhouette_score",
    # -- r11 window (confirmed in CORRECTNESS_r11, 50/50 green) --
    "rolling_beta",
    "rmst",
    "markov_attribution",
    "stream_tumbling_counts",
    "stream_attribution_join",
    "stream_drift_monitor",
    "session_window_agg",
    "cross_source_leakage",
    "gaussian_mixture_em",
    "periodogram",
    "hosmer_lemeshow",
    "isotonic_calibration",
    "k_core_graph",
    "log_rank_test",
    "price_index_fisher",
    "tukey_hsd",
    "cooks_distance",
    "embedding_effective_rank",
    "mann_whitney_u",
    "friedman_test",
    "breusch_pagan",
    "gumbel_maxima",
    "good_turing",
    "jsd_drift",
    "textrank_keywords",
    "jarque_bera",
    "anova_oneway",
    "kruskal_wallis",
    "levene_test",
    "ljung_box",
    "durbin_watson",
    "holt_linear_forecast",
    "brier_logloss",
    "grubbs_test",
    "local_clustering",
    "lead_lag_ccf",
    "multitouch_attribution",
    "ips_policy_eval",
    "entropy_l_diversity",
    "join_cardinality_qerror",
    "term_dispersion",
    "matryoshka_eval",
    "session_overlap_join",
    "encoding_advisor",
    "nelson_aalen",
    "woe_iv",
    "pr_auc",
    "t_closeness",
    "cramer_von_mises",
    "lorenz_curve",
    # -- r7/r6 cohorts: third confirmations (fill past the window;
    #    kept explicit so the window stays fully rotation-determined)
    "market_basket",
    "rfm_segments",
    "level_shift",
    "time_weighted_avg",
    "sax_symbolize",
    "readability_ari",
    "boilerplate_ngrams",
    "fd_check",
    "keyword_tag_broadcast",
    "weighted_median",
    "kfold_assign",
    "heaps_law",
    # -- confirmed twice+ (latest in r9's window); keep explicit --
    "cramers_v",
    "chi2_independence",
    "snapshot_diff",
    "abc_pareto",
    "gini_concentration",
    "equi_depth_histogram",
    "token_budget_curriculum",
    "compaction_plan",
    "ks_test",
    "roc_auc",
    "ab_test_ztest",
    "mutual_information",
    "entity_resolution",
    "ndcg_eval",
    "vocab_overlap",
    "acf_daily",
    "welch_ttest",
    "ratio_metric_delta",
    "cuped_adjustment",
    "srm_check",
    "jackknife_ratio_ci",
    "zone_map_pruning",
    "user_streaks",
    "forecast_backtest",
    "ensemble_neardup",
    "mllib_lsh_agreement",
    "keyword_tag",
    "skill_coverage",
    "cohort_retention",
    "wilson_ranking",
    "seasonal_adjust",
    "benford_dq",
    "negative_sampling",
    "margin_bitext",
    "ngram_diversity",
    "rolling_anomaly",
    "inverted_index",
    "align_uniformity",
    "quantile_normalize",
    "bootstrap_ci",
    "stream_static_enrich",
    "event_transitions",
    "ann_multiprobe_topk",
    "corpus_health_scorecard",
    "gap_fill_interpolate",
    "key_skew_profile",
    "mine_triplets",
    "quality_aware_dedup",
    "score_deciles",
    "skew_salted_join",
    "tfidf_cosine_pairs",
    # -- multiply-confirmed anchors --
    "topk_similarity",
    "pricing_summary",
    "pipeline_e2e",
    "dedup_exact",
]


def _apply_driver_order() -> None:
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY}
    ordered.update((n, qd) for n, qd in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


_apply_driver_order()

# Flagship entry point re-export (used by __spark_entry__.entry()).
from resume_jd_matcher_spark.queries.vector_q import q_topk_similarity  # noqa: E402,F401
