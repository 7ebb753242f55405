"""Round-9 corpus-curation & governance layer: invariants of the
curation_q queries — n-gram contamination, intra-doc repetition,
unigram-LM quality, Neyman allocation, I-MR control chart,
permutation entropy, Spearman rank correlation, sort-key advice,
O'Brien-Fleming monitoring, and Benjamini-Hochberg FDR."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows], _DOC_SCHEMA
    )


def _daily_orders(spark, revs, start=dt.datetime(2024, 1, 1)):
    """One order per day with the given total prices."""
    rows = [
        (i, 1, "O", float(v), start + dt.timedelta(days=i), "1-URGENT")
        for i, v in enumerate(revs)
    ]
    return spark.createDataFrame(rows, _ORD_SCHEMA)


class TestNgramContamination:
    def test_copy_is_dirty_disjoint_is_clean(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        train_text = "a b c d e f g h i j"
        docs = _docs(
            spark,
            [
                (1, train_text),                       # train
                (2, "k l m n o p q r s t"),            # train, disjoint
                (5, train_text),                       # eval: verbatim copy
                (10, "u v w x y z aa bb cc dd"),       # eval: disjoint
            ],
        )
        monkeypatch.setattr(curation_q, "load_table", lambda *a: docs)
        out = {
            r["doc_id"]: r
            for r in curation_q.q_ngram_contamination(spark, SF).collect()
        }
        assert set(out) == {5, 10}
        assert out[5]["contamination"] == pytest.approx(1.0)
        assert out[5]["verdict"] == "dirty"
        assert out[10]["contamination"] == pytest.approx(0.0)
        assert out[10]["verdict"] == "clean"
        # 10 tokens -> 6 distinct 5-gram positions
        assert out[5]["n_shingles"] == 6

    def test_short_eval_docs_are_excluded(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        docs = _docs(spark, [(1, "a b c d e f"), (5, "a b")])
        monkeypatch.setattr(curation_q, "load_table", lambda *a: docs)
        assert curation_q.q_ngram_contamination(spark, SF).count() == 0

    def test_fixture_has_rows(self, spark, sf_dir):
        """Non-vacuous on the driver fixtures: every fixture doc is
        long enough to shingle, so eval rows exist at every sf (the
        r8 kaplan_meier lesson — assert the signal is real)."""
        from resume_jd_matcher_spark.queries import curation_q

        assert curation_q.q_ngram_contamination(spark, sf_dir).count() > 0


class TestIntradocRepetition:
    def test_repeated_word_doc_is_dropped(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        docs = _docs(
            spark,
            [
                (1, "spam spam spam spam spam"),  # 4 bigrams, 1 distinct
                (2, "a b c d e"),                 # 4 bigrams, all distinct
            ],
        )
        monkeypatch.setattr(curation_q, "load_table", lambda *a: docs)
        out = {
            r["doc_id"]: r
            for r in curation_q.q_intradoc_repetition(spark, SF).collect()
        }
        assert out[1]["n_bigrams"] == 4 and out[1]["n_distinct"] == 1
        assert out[1]["dup_ratio"] == pytest.approx(0.75)
        assert out[1]["top_share"] == pytest.approx(1.0)
        assert out[1]["verdict"] == "drop"
        assert out[2]["dup_ratio"] == pytest.approx(0.0)
        # top_share 1/4 = 0.25 > 0.18: the top-share gate fires even
        # on an all-distinct short doc — document the threshold edge
        assert out[2]["verdict"] == "drop"

    def test_long_diverse_doc_is_kept(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        text = " ".join(f"w{i}" for i in range(40))
        docs = _docs(spark, [(1, text)])
        monkeypatch.setattr(curation_q, "load_table", lambda *a: docs)
        r = curation_q.q_intradoc_repetition(spark, SF).collect()[0]
        assert r["verdict"] == "keep"
        assert r["dup_ratio"] == pytest.approx(0.0)


class TestUnigramLogprobQuality:
    def test_rare_token_doc_scores_worse(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        common = "the the the the the the the the"
        docs = _docs(
            spark,
            [(i, common) for i in range(8)] + [(8, "qq zz xx vv ww yy uu tt")],
        )
        monkeypatch.setattr(curation_q, "load_table", lambda *a: docs)
        out = {
            r["doc_id"]: r
            for r in curation_q.q_unigram_logprob_quality(spark, SF).collect()
        }
        assert out[8]["nll"] > out[0]["nll"]
        assert out[8]["z"] > out[0]["z"]
        # the lexically-typical docs band clean; the outlier does not
        assert out[0]["band"] == "clean"
        assert out[8]["band"] in ("suspect", "junk")

    def test_fixture_bands_cover_and_z_centers(self, spark, sf_dir):
        from resume_jd_matcher_spark.queries import curation_q

        rows = curation_q.q_unigram_logprob_quality(spark, sf_dir).collect()
        assert len(rows) > 0
        zs = [r["z"] for r in rows]
        # z-scores of a standardized column: mean ~ 0
        assert abs(sum(zs) / len(zs)) < 0.05
        assert {r["band"] for r in rows} <= {"clean", "suspect", "junk"}


class TestNeymanAllocation:
    def test_variable_stratum_gets_the_budget(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        rows = []
        # nation 1: high variance (0 / 200 split), nation 2: constant
        for i in range(4):
            rows.append((i, f"c{i}", 1, 0.0 if i % 2 == 0 else 200.0, "A"))
        for i in range(4, 8):
            rows.append((i, f"c{i}", 2, 50.0, "A"))
        cust = spark.createDataFrame(rows, _CUST_SCHEMA)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: cust)
        out = {
            r["c_nationkey"]: r
            for r in curation_q.q_neyman_allocation(spark, SF).collect()
        }
        # sd of {0,0,200,200} = 115.47; sd of constant stratum = 0
        assert out[1]["sd_acctbal"] == pytest.approx(115.47, abs=0.01)
        assert out[2]["sd_acctbal"] == pytest.approx(0.0)
        assert out[1]["alloc_neyman"] == 1000
        assert out[2]["alloc_neyman"] == 0
        # proportional ignores variance: 500/500
        assert out[1]["alloc_proportional"] == 500
        assert out[2]["alloc_proportional"] == 500

    def test_fixture_allocations_sum_near_budget(self, spark, sf_dir):
        from resume_jd_matcher_spark.queries import curation_q

        rows = curation_q.q_neyman_allocation(spark, sf_dir).collect()
        total = sum(r["alloc_neyman"] for r in rows)
        # floor(+0.5) rounding drifts by at most 1 per stratum
        assert abs(total - 1000) <= len(rows)


class TestImrControlChart:
    def test_constant_series_never_flags(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        o = _daily_orders(spark, [100.0] * 20)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: o)
        r = curation_q.q_imr_control_chart(spark, SF).collect()[0]
        assert r["n_days"] == 20
        assert r["spread_dollars"] == pytest.approx(0.0)
        assert r["n_out_hi"] == 0 and r["n_out_lo"] == 0

    def test_single_spike_is_flagged_high(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        revs = [100.0] * 30 + [10000.0] + [100.0] * 30
        o = _daily_orders(spark, revs)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: o)
        r = curation_q.q_imr_control_chart(spark, SF).collect()[0]
        # mr_bar = 2*9900/60 = 330; spread = 3*330/1.128 ~ 877.66;
        # center ~ 262.3 -> only the spike day exceeds UCL
        assert r["n_out_hi"] == 1
        assert r["n_out_lo"] == 0


class TestPermutationEntropy:
    def test_monotone_series_has_zero_entropy(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        o = _daily_orders(spark, [float(100 + i) for i in range(30)])
        monkeypatch.setattr(curation_q, "load_table", lambda *a: o)
        r = curation_q.q_permutation_entropy(spark, SF).collect()[0]
        assert r["n_windows"] == 28
        assert r["n_patterns"] == 1
        assert r["h_norm"] == pytest.approx(0.0)
        assert r["top_code"] == 7  # y1>y0, y2>y0, y2>y1
        assert r["top_share"] == pytest.approx(1.0)

    def test_alternating_series_uses_two_patterns(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        o = _daily_orders(
            spark, [100.0 if i % 2 == 0 else 300.0 for i in range(30)]
        )
        monkeypatch.setattr(curation_q, "load_table", lambda *a: o)
        r = curation_q.q_permutation_entropy(spark, SF).collect()[0]
        # up-down (code 1) and down-up (code 6) alternate evenly
        assert r["n_patterns"] == 2
        assert r["h_norm"] == pytest.approx(0.3869, abs=1e-3)  # ln2/ln6


class TestSpearmanDailyCorr:
    def test_monotone_nonlinear_gives_spearman_one(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        # revenue grows cubically while order count grows linearly:
        # perfectly monotone (spearman 1) but curved (pearson < 1)
        start = dt.datetime(2024, 1, 1)
        rows = []
        k = 0
        for day in range(1, 25):
            n = day  # n_orders
            price = float(day * day * day) / n
            for _ in range(n):
                rows.append(
                    (k, 1, "O", price, start + dt.timedelta(days=day), "x")
                )
                k += 1
        o = spark.createDataFrame(rows, _ORD_SCHEMA)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: o)
        r = curation_q.q_spearman_daily_corr(spark, SF).collect()[0]
        assert r["spearman"] == pytest.approx(1.0)
        assert r["pearson"] < 0.95


class TestSortKeyAdvisor:
    def test_layout_ordered_column_is_clustered(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        # physical order = l_orderkey; shipdate follows it exactly
        # (clustered), partkey is a scrambled permutation (scattered)
        n = 40_000
        base = dt.datetime(2020, 1, 1)
        li = spark.range(n).select(
            F.col("id").alias("l_orderkey"),
            F.lit(1).alias("l_linenumber"),
            F.lit(1).alias("l_suppkey"),
            F.lit(1.0).alias("l_quantity"),
            (((F.col("id") * 48271) % n)).alias("l_partkey"),
            F.lit(100.0).alias("l_extendedprice"),
            F.lit(0.0).alias("l_discount"),
            F.lit(0.0).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            (
                F.lit(base)
                + F.make_interval(days=(F.col("id") / 100).cast("int"))
            ).alias("l_shipdate"),
        )
        monkeypatch.setattr(curation_q, "load_table", lambda *a: li)
        out = {
            r["col"]: r
            for r in curation_q.q_sort_key_advisor(spark, SF).collect()
        }
        assert out["l_shipdate"]["verdict"] == "clustered"
        assert out["l_partkey"]["verdict"] == "scattered"
        # 4096-row blocks over a 400-day span -> ~0.10 per block
        assert out["l_shipdate"]["avg_span"] <= 0.15
        assert out["l_partkey"]["avg_span"] > 0.8
        # constant column: zero global range folds to span 0
        assert out["l_extendedprice"]["avg_span"] == pytest.approx(0.0)


class TestObrienFleming:
    def test_boundary_shape_and_no_cross_on_null(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        # both arms identical -> z ~ 0 at every look, nothing crosses
        base = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(200):
            for d in range(10):
                rows.append(
                    (
                        u * 10 + d,
                        base + dt.timedelta(days=d, hours=1),
                        u,
                        "purchase",
                        50.0 + (u + d) % 7,
                        "{}",
                    )
                )
        ev = spark.createDataFrame(rows, _EV_SCHEMA)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: ev)
        out = sorted(
            curation_q.q_obrien_fleming_monitor(spark, SF).collect(),
            key=lambda r: r["look"],
        )
        assert [r["look"] for r in out] == [1, 2, 3, 4, 5]
        bounds = [r["boundary"] for r in out]
        # O'Brien-Fleming: strictly decreasing, ends at c = 2.04
        assert all(a > b for a, b in zip(bounds, bounds[1:]))
        assert bounds[-1] == pytest.approx(2.04)
        assert bounds[0] == pytest.approx(2.04 * (5 ** 0.5), abs=1e-3)
        assert not any(r["crossed"] for r in out)
        # looks accumulate: risk-set sizes are non-decreasing
        assert all(
            a["n_a"] <= b["n_a"] and a["n_b"] <= b["n_b"]
            for a, b in zip(out, out[1:])
        )


class TestBenjaminiHochberg:
    def test_planted_outlier_is_rejected_first(self, spark, monkeypatch):
        from resume_jd_matcher_spark.queries import curation_q

        rows = []
        k = 0
        # 9 null nations around 100, one nation offset far away
        for nat in range(10):
            off = 500.0 if nat == 9 else 0.0
            for i in range(50):
                rows.append(
                    (k, f"c{k}", nat, 100.0 + (i % 11) - 5 + off, "A")
                )
                k += 1
        cust = spark.createDataFrame(rows, _CUST_SCHEMA)
        monkeypatch.setattr(curation_q, "load_table", lambda *a: cust)
        out = {
            r["c_nationkey"]: r
            for r in curation_q.q_benjamini_hochberg(spark, SF).collect()
        }
        assert out[9]["rnk"] == 1 and out[9]["reject"]

    def test_reject_set_is_a_rank_prefix(self, spark, sf_dir):
        from resume_jd_matcher_spark.queries import curation_q

        rows = sorted(
            curation_q.q_benjamini_hochberg(spark, sf_dir).collect(),
            key=lambda r: r["rnk"],
        )
        flags = [r["reject"] for r in rows]
        # BH step-up rejects exactly ranks 1..k* — once False, always
        assert flags == sorted(flags, reverse=True)
        # p is non-decreasing in rank
        ps = [r["p_value"] for r in rows]
        assert all(a <= b for a, b in zip(ps, ps[1:]))


class TestCrossSourceLeakageCacheHygiene:
    def test_cache_manager_empty_right_after_action(self, spark, sf_dir):
        """r10 advice residual: the MinHash signature frame must not
        lean on the sweep-level release_persisted() — with
        persist=False the query enrolls NOTHING in the CacheManager,
        so it is empty immediately after the action with no hook."""
        from resume_jd_matcher_spark.operators import dedup
        from resume_jd_matcher_spark.queries import curation_q

        spark.catalog.clearCache()
        ledger_before = len(dedup._PERSISTED)
        curation_q.q_cross_source_leakage(spark, sf_dir).collect()
        assert len(dedup._PERSISTED) == ledger_before
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
