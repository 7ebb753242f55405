"""Physical-plan shape assertions (SURVEY.md §4): broadcasts happen,
filters reach the parquet scan, UDF stages stay out of native paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from resume_jd_matcher_spark.plans.optimize import (
    assert_broadcast,
    assert_pushed_filter,
    physical_plan,
)
from resume_jd_matcher_spark.queries.relational_q import (
    q_join_revenue_by_nation,
    q_pricing_summary,
)
from resume_jd_matcher_spark.queries.vector_q import q_topk_similarity
from resume_jd_matcher_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_nation_join_broadcasts(spark):
    assert_broadcast(q_join_revenue_by_nation(spark, SF))


def test_filter_pushed_to_scan(spark):
    df = load_table(spark, SF, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    assert_pushed_filter(df, "c_acctbal")


def test_scan_prunes_columns(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    assert "l_orderkey" in plan and "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_pricing_summary_is_native(spark):
    # No Python evaluation anywhere in the aggregate plan.
    plan = physical_plan(q_pricing_summary(spark, SF))
    assert "Python" not in plan and "HashAggregate" in plan


def test_topk_shuffles_only_partials(spark):
    # The BLAS top-k emits ≤ k rows per (query, partition) before the
    # final rank — the plan must show the mapInPandas stage feeding a
    # window, not a crossJoin of the corpus.
    plan = physical_plan(q_topk_similarity(spark, SF))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_choose_similarity_strategy(spark):
    from resume_jd_matcher_spark.plans.optimize import choose_similarity_strategy

    emb = load_table(spark, SF, "embeddings")
    small = emb.limit(10)
    assert choose_similarity_strategy(small, small) == "exact"
    assert (
        choose_similarity_strategy(emb, emb, max_exact_pairs=1000) == "lsh"
    )


def test_similarity_join_auto_routes_to_lsh(spark):
    """Above the pair-count threshold the router must engage the
    LSH-bucketed route: equi-join on the bucket id (no crossJoin, no
    MapInPandas), and every emitted pair must be a true under-threshold
    pair (precision 1.0 — LSH trades recall, never correctness)."""
    from resume_jd_matcher_spark.operators.similarity import (
        similarity_join_auto,
    )
    from resume_jd_matcher_spark.plans.optimize import (
        choose_similarity_strategy,
    )

    emb = load_table(spark, SF, "embeddings")
    left = emb.select(
        F.col("vec_id").alias("left_id"),
        F.col("embedding").alias("left_embedding"),
    )
    right = emb.select(
        F.col("vec_id").alias("right_id"),
        F.col("embedding").alias("right_embedding"),
    )
    assert choose_similarity_strategy(left, right, max_exact_pairs=100) == "lsh"

    routed = similarity_join_auto(
        left, right, threshold=1.2, dedup_pairs=True, max_exact_pairs=100
    )
    plan = physical_plan(routed)
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan  # not the BLAS route

    exact = similarity_join_auto(left, right, threshold=1.2, dedup_pairs=True)
    assert "MapInPandas" in physical_plan(exact)  # default: BLAS route

    got = {(r.left_id, r.right_id) for r in routed.collect()}
    want = {(r.left_id, r.right_id) for r in exact.collect()}
    assert got <= want          # no false pairs
    assert len(got) > 0         # buckets do surface near pairs


def test_range_join_binned_is_hash_join(spark):
    """The binned rewrite must execute as a hash/sort-merge equi-join —
    never the BroadcastNestedLoopJoin a raw theta band predicate gets."""
    from resume_jd_matcher_spark.queries.relational_q import q_range_join_binned

    plan = physical_plan(q_range_join_binned(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_winnow_single_window_sort(spark):
    """lead() k-gram assembly and the window-min share one partition
    spec: two Window nodes, ONE per-doc sort, no extra count() pass."""
    import re

    from resume_jd_matcher_spark.operators.textstats import winnow_fingerprints

    plan = physical_plan(
        winnow_fingerprints(load_table(spark, SF, "documents"))
    )
    assert len(re.findall(r"\bWindow \[", plan)) == 2
    assert len(re.findall(r"\bSort \[", plan)) == 1
    assert "BatchEvalPython" not in plan


def test_heavy_hitters_broadcasts_total(spark):
    from resume_jd_matcher_spark.queries.text_q import q_heavy_hitters

    plan = physical_plan(q_heavy_hitters(spark, SF))
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


def test_registry_wide_no_cartesian_products(spark):
    """Sweep EVERY registered query's physical plan: a CartesianProduct
    (both sides non-broadcast) is never acceptable; a
    BroadcastNestedLoopJoin is acceptable only where the design
    broadcasts a bounded side (similarity crossJoins, single-row
    totals) — pinned by whitelist so an accidental theta join in a new
    query fails here."""
    from resume_jd_matcher_spark import queries as Q

    bnlj_by_design = {
        # bounded broadcast side by construction:
        "topk_similarity", "cosine_topk", "similarity_join", "knn_per_label",
        "shortlist_e2e", "neardup_embedding", "ann_lsh_topk", "ann_ivf_topk",
        "mllib_lsh_join", "kmeans_ivf_topk", "pipeline_e2e",
        # coarse Lloyd fit/routing: crossJoin against a broadcast
        # centroid table of <= nlist (=4) rows, same shape as
        # kmeans_ivf_topk (the PQ half is pure equi-joins):
        "ivf_pq_topk",
        # Lloyd fit (<=8-row broadcast centroids) feeding the
        # within-cluster pair scan, which itself is a cid equi-join:
        "semdedup",
        # single-row broadcast total (unigram mass) crossed into the
        # per-bigram scorer:
        "ngram_lm_score",
        # single-row broadcast corpus/target totals crossed into the
        # <=4096-row bucket ratio table:
        "dsir_weights",
        # single-row broadcast scalars:
        "heavy_hitters", "tfidf_topterms", "scalar_suite", "scoring_e2e",
        "llm_feedback", "llm_explain", "prompt_assembly", "mean_score",
        "score_parse", "sections_map", "section_chunk", "header_canon",
        "embed_documents", "stats_moments",
        # distinct-value all-pairs over a ~5-row dim (typo-dedup):
        "fuzzy_match",
        # 6-row (4-row for approx_stats' exact verifier) literal
        # percentile-target table crossed into the bucket histogram
        # (operators/percentiles.py):
        "exact_percentiles", "approx_stats",
        # single-row scalar CTEs (max-ts, watermark cutoff) crossed in:
        "stream_late_data",
        # single-row broadcast corpus stats (N, avgdl, per-term df)
        # crossed into the per-doc scorer; rrf adds a single-row
        # broadcast query vector:
        "bm25_rank", "rrf_hybrid",
        # 5-row broadcast query set crossed into the corpus scan
        # (same shape as knn_per_label):
        "hard_negatives",
        # 8-row broadcast anchor set crossed into the corpus stream
        # feeding two min(struct) argmins:
        "mine_triplets",
        # single-row broadcast bigram/unigram totals crossed into the
        # collocation scorer:
        "pmi_collocations",
        # single-row broadcast slice totals crossed into the <=100-row
        # vocabulary table:
        "psi_drift",
        # two single-row broadcast summaries (totals, hottest key)
        # crossed into the <=64-row histogram:
        "key_skew_profile",
        # single-row broadcast total crossed into the <=1001-row
        # bucket-CDF table:
        "score_deciles",
        # inherits bm25's single-row stats broadcast + a single-row
        # broadcast query-token set into the 20-row rerank pool:
        "rerank_e2e",
        # two single-row summaries (degree census x triangle count)
        # crossed for the final one-row output:
        "graph_triangles",
        # single-row broadcast digit total crossed into the 9-row
        # digit dim:
        "benford_dq",
        # single-row broadcast idf normalizer crossed into the per-doc
        # base (the idf table itself is a dictionary-bounded equi-join):
        "skill_coverage",
        # bounded (max_src_id) broadcast source side crossed into the
        # target-group scan — the standard similarity crossJoin shape:
        "margin_bitext",
        # single-row broadcast Heaps fit crossed onto the
        # |sources|-bounded table:
        "heaps_law",
        # bounded (<=1024 asserted) broadcast sample side for the
        # pairwise base + a single-row uniformity summary crossed in:
        "align_uniformity",
        # bounded bucketx20 theta join building the pooled 20-row
        # inverse-CDF map + a single-row total crossed in:
        "quantile_normalize",
        # -- round 7 --
        # single-row broadcast n_orders total crossed into the
        # |brands|^2-bounded pair table:
        "market_basket",
        # single-row broadcast quartile-boundary row crossed into the
        # customer grain (replaces the ntile window):
        "rfm_segments",
        # global_prefix's single-row (min,max) bucket-stats broadcast
        # + the single-row revenue total crossed into the ranked grain:
        "abc_pareto",
        # same global_prefix single-row stats broadcast:
        "gini_concentration",
        # single-row broadcast grand total crossed into the
        # |nations|x|segments|-bounded cell table:
        "chi2_independence",
        # -- round 8 --
        # single-row broadcast n/ss totals crossed into the
        # calendar-bounded day grain:
        "acf_daily",
        # global_prefix single-row equal-height bounds broadcast +
        # single-row n_orders total for the ntile arithmetic:
        "equi_depth_histogram",
        # single-row broadcast (max date, n_users) crossed into the
        # user grain, then the lifetime-day grain:
        "kaplan_meier",
        # global_prefix single-row bucket-stats broadcast + single-row
        # (n_a, n_b) totals crossed into the distinct-cents grain:
        "ks_test",
        # single-row broadcast grand total + entropies crossed into
        # dimension-bounded cell/marginal tables:
        "mutual_information",
        # 3-row broadcast query side crossed into the corpus for the
        # exact ground-truth ranking (the standard similarity shape):
        "ndcg_eval",
        # single-row broadcast character-budget total crossed into the
        # ranked document grain:
        "token_budget_curriculum",
        # single-row broadcast pooled-moment agg (theta) crossed into
        # the per-user grain before the per-arm finalize:
        "cuped_adjustment",
        # single-row broadcast (n_pos, n_neg) totals crossed into the
        # global_prefix-ranked score grain for the rank-sum AUC:
        "roc_auc",
        # same prefix-scan shape as roc_auc on the negated score key
        # (global_prefix's 1-row bucket-stats broadcast):
        "pr_auc",
        # single-row broadcast moment agg crossed into the event
        # grain, then the 10-cell bin table:
        "calibration_eval",
        # per-arm quantile boundary row (2-row broadcast) crossed into
        # the event grain for decile assignment:
        "qte_deciles",
        # global_prefix single-row bucket-stats broadcast + single-row
        # byte-budget total crossed into the file-grain plan:
        "compaction_plan",
        # single-row broadcast probe_stats summary crossed into the
        # <=|keys|-bounded build-side census:
        "join_plan_advisor",
        # single-row broadcast global (min,max) bounds crossed into
        # the event grain for zone assignment:
        "zone_map_pruning",
        # calendar-bounded broadcast day-grain self-pairing (days^2
        # pairs independent of fact rows) + the percentile operator's
        # single-row broadcasts:
        "theil_sen_trend",
        # same calendar-bounded day-grain self-pairing + 1-row
        # S/n/tie-census summaries crossed together:
        "mann_kendall",
        # single-row totals broadcast crossed into the bounded day
        # grain before the calendar-sized cusum window:
        "cusum_changepoint",
        # 1-row calendar bounds + 1-row/7-row seasonal summaries
        # crossed back onto the bounded day grain:
        "stl_decompose",
        # single-row calendar-midpoint cutoff broadcast crossed into
        # the fact before the 4-group conditional agg:
        "diff_in_did",
        # two 1-row summaries (OLS fit, corpus mass) crossed with the
        # 1-row top-k mass agg:
        "zipf_fit",
        # single-row broadcast grand-total crossed into the
        # df-filtered (source, token) grain:
        "llr_keyness",
        # chi2_independence's dims cross join (two bounded distinct
        # dimension lists) + the single-row total broadcast:
        "cramers_v",
        # single-row total broadcast crossed into the
        # |sources|-bounded share table:
        "effective_sources",
        # -- round 9 --
        # corpus z-moments (1-row broadcast) crossed into the per-doc
        # NLL grain; LM totals a second 1-row broadcast:
        "unigram_logprob_quality",
        # single-row (n_total, weight_total) broadcast crossed into
        # the |nations|-bounded stratum table:
        "neyman_allocation",
        # single-row control-limits row broadcast back over the
        # calendar-bounded day grain:
        "imr_control_chart",
        # 1-row window total + 1-row top-pattern row crossed with the
        # <=6-row pattern census:
        "permutation_entropy",
        # global_prefix single-row bucket-stats broadcast + 1-row
        # global column ranges crossed into the block-summary grain:
        "sort_key_advisor",
        # 1-row calendar-span broadcast assigning looks, then the
        # <=2x5-row spine/pivot frames crossed together:
        "obrien_fleming_monitor",
        # 1-row global moments + 1-row step-up k* crossed into the
        # |nations|-bounded test table:
        "benjamini_hochberg",
        # 1-row cutoff broadcast tagging old/delta partials:
        "incremental_agg_merge",
        # |types|-bounded type pairs (<=5x5 crossJoin, both sides
        # broadcastable) + per-pair theta rows — every side <=k rows:
        "theta_sketch_setops",
        # 1-row path total broadcast crossed into the
        # |types|^3-bounded path grain:
        "event_paths_top",
        # 1-row median/MAD/limits + 1-row top-day broadcast crossed
        # over the calendar-bounded day grain:
        "anomaly_mad_daily",
        # 1-row signup-base count broadcast crossed into the
        # converted-user grain:
        "funnel_time_to_convert",
        # -- round 10 --
        # 1-row span-derived train/bench cutoff broadcast crossed
        # into the gram stream (replaces the fixed id window that
        # went vacuous at sf0.1):
        "decontaminate",
        # 15-row lag spine broadcast crossed into the calendar-bounded
        # day grain (the shifted join itself is an equi-join):
        "lead_lag_ccf",
        # per relation: 1-row histogram estimate crossed with the
        # 1-row exact cardinality:
        "join_cardinality_qerror",
        # 1-row corpus token total crossed into the top-k x |sources|
        # bounded dispersion grain:
        "term_dispersion",
        # 1-row (corpus max date, n_users) broadcast crossed into the
        # user grain — same lifetable shape as kaplan_meier:
        "nelson_aalen",
        # 1-row class totals + 1-row IV sum crossed into the 5-row
        # priority grain:
        "woe_iv",
        # |classes| x |buckets| spine (both dimension-bounded,
        # buckets broadcast) + 1-row global-total/bucket-count
        # broadcasts:
        "t_closeness",
        # ks_test's dual-ECDF prefix-scan shape: 1-row (n_a, n_b)
        # totals broadcast + global_prefix's 1-row stats broadcast:
        "cramer_von_mises",
        # 1-row (n, total) broadcast over the prefix-ranked customer
        # grain + global_prefix's height-mode stats broadcast:
        "lorenz_curve",
        # -- round 10, inference family --
        # 1-row (mu, sd) scorer-moment broadcast crossed into the fact
        # before the single global agg (the calibration_eval shape):
        "brier_logloss",
        # same 1-row (mu, sd) broadcast before the 4-cell confusion agg:
        "matthews_mcc",
        # 1-row (sum, n) mean broadcast into the calendar-bounded day
        # grain + the 1-row Σdev² broadcast into the lag frame
        # (acf_daily's exact shape):
        "ljung_box",
        # 1-row OLS-fit broadcast back over the calendar-bounded day
        # grain to form residuals:
        "durbin_watson",
        # 1-row tie-mass census crossed with the 1-row H sufficient
        # stats + global_prefix's 1-row bucket-stats broadcast:
        "kruskal_wallis",
        # 1-row (n, Σx, Σx·lnx) grand total crossed into the
        # |nations|-bounded group grain:
        "theil_index",
        # 1-row (total cents, n_brands) broadcast crossed into the
        # |brands|-bounded share grain:
        "hhi_concentration",
        # kruskal_wallis's exact shape on two segments: 1-row tie
        # census + 1-row U sufficient stats + global_prefix's 1-row
        # bucket-stats broadcast:
        "mann_whitney_u",
        # 1-row |segments| count broadcast crossed into the
        # |nations|-bounded block census:
        "friedman_test",
        # 1-row OLS-fit broadcast back over the calendar-bounded day
        # grain (durbin_watson's residual shape):
        "breusch_pagan",
        # 1-row (N, n1) token totals broadcast crossed into the
        # <=max-count-bounded frequency-of-frequencies grain:
        "good_turing",
        # 1-row (ta, tb, |V|) totals broadcast crossed into the
        # vocab grain before the single reduction:
        "jsd_drift",
        # 1-row censor-horizon broadcast into the user lifetable, the
        # calendar-bounded (event-times x 2-row arm census) risk grid,
        # and the 1-row O/E/V reduction crossed with the arm census
        # (kaplan_meier's shape + a scalar join):
        "log_rank_test",
        # 1-row (y0, y1) span broadcast into the scan filter + the
        # 1-row basket reduction over the part-grain period join:
        "price_index_fisher",
        # |segments|² inequality self-join (both sides 5 rows,
        # broadcast) + the 1-row MSW broadcast:
        "tukey_hsd",
        # 1-row OLS-fit + 1-row MSE broadcasts over the
        # calendar-bounded day grain (the durbin_watson family):
        "cooks_distance",
        # kaplan_meier's lifetable shape: 1-row censor horizon +
        # 1-row tau + 1-row first-segment/area scalars crossed over
        # the calendar-bounded event-time grain:
        "rmst",
        # calibration_eval's 1-row (mu, sd) scorer-moment broadcast
        # before the 10-cell hash agg:
        "hosmer_lemeshow",
        # same 1-row moment broadcast + the <=10-row bins²/bins³
        # minimax joins (inequality joins on broadcast bin frames):
        "isotonic_calibration",
        # per EM iteration: the 1-row ROUNDED params broadcast
        # crossed into the fact before the sufficient-statistic agg:
        "gaussian_mixture_em",
        # 1-row mean + 1-row spectral-total broadcasts over the
        # calendar-bounded (day grain x 16-frequency spine):
        "periodogram",
        # -- round 11, structure family --
        # 1-row (n_calib, k) + 1-row q-hat + 1-row coverage scalars
        # crossed around the value-grain prefix and the eval agg:
        "conformal_interval",
        # 1-row corpus total crossed into the per-cluster fixed-point
        # terms, then the 1-row precision x 1-row recall cross for F1:
        "bcubed_eval",
        # 1-row global-mean-frequency + 1-row weight-total broadcasts
        # crossed into the |sources|-bounded grain:
        "doremi_reweight",
        # calendar-bounded day spine broadcast crossed into the
        # |event_types| dim to build the zero-fill grid:
        "burstiness_fano",
        # -- round 12 --
        # global_prefix's 1-row (min, max) bucket-stats broadcast
        # crossed into the token-count projection (the abc_pareto /
        # mann_whitney_u shape):
        "sequence_packing",
    }
    offenders, bnlj_unexpected = [], []
    for name, qd in sorted(Q._REGISTRY.items()):
        try:
            plan = physical_plan(qd.fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            offenders.append(f"{name}: PLAN_ERROR {e}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_by_design:
            bnlj_unexpected.append(name)
    assert not offenders, offenders
    assert not bnlj_unexpected, (
        f"unexpected BroadcastNestedLoopJoin in {bnlj_unexpected}; "
        "broadcast a bounded side or rewrite as an equi-join"
    )


def test_salted_join_spreads_hot_keys(spark):
    """The skew join must (a) shuffle-hash join on (key, _salt) — not
    broadcast, which would hide the skew problem at toy SF — and (b)
    return row-identical results to the plain join."""
    from resume_jd_matcher_spark.queries.relational_q import q_skew_salted_join

    df = q_skew_salted_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "_salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_join_matches_plain_join(spark):
    from resume_jd_matcher_spark.operators.relational import salted_join

    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(200)],
        "id long, k string, v double",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, attr int")
    got = sorted(
        salted_join(fact, dim, "k", n_salts=4).collect(),
        key=lambda r: r["id"],
    )
    want = sorted(fact.join(dim, "k").collect(), key=lambda r: r["id"])
    assert [tuple(sorted(r.asDict().items())) for r in got] == [
        tuple(sorted(r.asDict().items())) for r in want
    ]


def test_term_frequency_no_global_window(spark):
    """Top-N vocab cut must lower to TakeOrderedAndProject; rank comes
    from the bounded-array posexplode — NO Window node anywhere (the
    r5 version sorted the whole vocabulary in one partition)."""
    from resume_jd_matcher_spark.operators.textstats import term_frequency

    plan = physical_plan(term_frequency(load_table(spark, SF, "documents")))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_negative_sampling_is_binned_equi_join(spark):
    """CDF inversion must be the binned-range equi-join (broadcast bin
    table), never a draws x vocab nested loop."""
    from resume_jd_matcher_spark.operators.sampling import negative_sampling

    plan = physical_plan(
        negative_sampling(load_table(spark, SF, "documents"), k=2, vocab_size=50)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_keyword_tag_routes_by_dictionary_size(spark):
    """Small dictionary → the literal array_intersect projection (no
    join, no shuffle at all); large dictionary → the broadcast-join
    route over the exploded candidate stream."""
    from resume_jd_matcher_spark.operators.tagging import keyword_tag

    d = load_table(spark, SF, "documents")
    small = physical_plan(keyword_tag(d, ["hash join", "spark"]))
    # no join anywhere; the only Exchange allowed is the
    # ensure_parallelism round-robin repartition of the scan
    assert "Join" not in small
    assert "hashpartitioning" not in small
    big = physical_plan(keyword_tag(d, [f"kw{i}" for i in range(400)]))
    assert "BroadcastHashJoin" in big
    assert "CartesianProduct" not in big


def test_view_conversion_outer_is_equi_join(spark):
    """The LEFT OUTER interval join must plan as a SortMergeJoin on
    the user equi-key (range predicate as join condition), never a
    BroadcastNestedLoopJoin — the property that keeps it
    shuffle-bounded at 100 TB."""
    from resume_jd_matcher_spark.queries.stream_q import (
        q_stream_view_conversion,
    )

    plan = physical_plan(q_stream_view_conversion(spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # equi-key hash-family join; at toy SF the planner broadcasts the
    # purchase side, at scale both sides shuffle on the user key
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_media_ihdr_is_scan_plus_single_agg(spark):
    """IHDR parse is a narrow per-row projection: exactly one
    exchange (the bounded histogram rollup), no joins, no windows."""
    from resume_jd_matcher_spark.queries.stream_q import (
        q_media_ihdr_histogram,
    )

    plan = physical_plan(q_media_ihdr_histogram(spark, SF))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1


def test_media_ext_quarantine_is_scan_plus_single_agg(spark):
    """Extension route + magic detect are per-row; the only exchange
    is the bounded (route x detected) rollup."""
    from resume_jd_matcher_spark.queries.stream_q import (
        q_media_ext_quarantine,
    )

    plan = physical_plan(q_media_ext_quarantine(spark, SF))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1
