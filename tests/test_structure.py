"""Unit tests for the round-11 structure family
(queries/structure_q.py): hand-computed fixtures for HITS, LPA,
rendezvous sharding, conformal intervals, B-cubed, and the
multiplicative-weights reweighting — plus the exact-integer
discipline checks (every exposed column is integral)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(rows):
    return [(i, t, "en", s, len(t)) for i, t, s in rows]


def _hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


class TestHitsScores:
    def test_symmetric_bipartite_equal_authorities(self, spark, monkeypatch):
        """Complete 2x2 bipartite graph: both event types must get
        exactly half the authority mass at every iteration."""
        import datetime as dt

        from resume_jd_matcher_spark.queries import structure_q as sq

        ts = dt.datetime(2024, 1, 1)
        rows = [
            (i, ts, u, t, 1.0, "{}")
            for i, (u, t) in enumerate(
                [(1, "A"), (1, "B"), (2, "A"), (2, "B")]
            )
        ]
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: e)
        out = {r["event_type"]: r for r in sq.q_hits_scores(spark, SF).collect()}
        assert out["A"]["authority_e9"] == 500_000_000
        assert out["B"]["authority_e9"] == 500_000_000
        assert out["A"]["n_users"] == 2

    def test_broader_type_dominates(self, spark, monkeypatch):
        """Type A touched by both users, B by one: A's authority must
        exceed B's, and the pair must sum to ~1e9 (L1 normalized)."""
        import datetime as dt

        from resume_jd_matcher_spark.queries import structure_q as sq

        ts = dt.datetime(2024, 1, 1)
        rows = [
            (i, ts, u, t, 1.0, "{}")
            for i, (u, t) in enumerate([(1, "A"), (1, "B"), (2, "A")])
        ]
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: e)
        out = {r["event_type"]: r for r in sq.q_hits_scores(spark, SF).collect()}
        assert out["A"]["authority_e9"] > out["B"]["authority_e9"]
        assert (
            abs(out["A"]["authority_e9"] + out["B"]["authority_e9"] - 10**9)
            <= 1
        )


class TestLabelPropagation:
    def _lpa(self, spark, edges, n_iter=4):
        from resume_jd_matcher_spark.operators.cluster import (
            label_propagation_sync,
        )

        sym = spark.createDataFrame(
            [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
            "a long, b long",
        )
        return {
            r["node"]: r["community"]
            for r in label_propagation_sync(sym, n_iter=n_iter).collect()
        }

    def test_triangle_converges_to_min_label(self, spark):
        out = self._lpa(spark, [(1, 2), (2, 3), (1, 3)])
        assert out == {1: 1, 2: 1, 3: 1}

    def test_pair_stabilizes_via_self_vote(self, spark):
        """Without the self-vote a 2-clique oscillates; with it both
        nodes settle on the min label."""
        out = self._lpa(spark, [(4, 5)])
        assert out == {4: 4, 5: 4}

    def test_two_cliques_stay_separate(self, spark):
        out = self._lpa(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
        assert out[1] == out[2] == out[3] == 1
        assert out[10] == out[11] == out[12] == 10

    def test_distributed_path_matches_local(self, spark):
        """Force the DataFrame loop (threshold 0) and compare labels
        with the driver path on the same graph."""
        from resume_jd_matcher_spark.operators.cluster import (
            label_propagation_sync,
        )

        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)]
        sym = spark.createDataFrame(
            [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
            "a long, b long",
        )
        local = {
            r["node"]: r["community"]
            for r in label_propagation_sync(sym, n_iter=4).collect()
        }
        dist = {
            r["node"]: r["community"]
            for r in label_propagation_sync(
                sym, n_iter=4, local_threshold=0
            ).collect()
        }
        assert local == dist


class TestShardRendezvous:
    def test_assignment_matches_python_hrw(self, spark, monkeypatch):
        """Exact per-shard counts against a pure-python HRW replay of
        the shared hash32 family."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        docs = spark.createDataFrame(
            _docs([(i, f"text {i}", "web") for i in range(50)]), _DOC_SCHEMA
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: docs)
        out = {r["shard"]: r for r in sq.q_shard_rendezvous(spark, SF).collect()}

        exp_docs: dict[int, int] = {}
        exp_moved: dict[int, int] = {}
        for i in range(50):
            hv16 = [(_hash32(f"{i}#{s}"), -s) for s in range(16)]
            hv17 = [(_hash32(f"{i}#{s}"), -s) for s in range(17)]
            s16 = -max(hv16)[1]
            s17 = -max(hv17)[1]
            exp_docs[s16] = exp_docs.get(s16, 0) + 1
            if s17 != s16:
                exp_moved[s16] = exp_moved.get(s16, 0) + 1
        for shard, r in out.items():
            assert r["n_docs"] == exp_docs.get(shard, 0)
            assert r["n_moved"] == exp_moved.get(shard, 0)
        assert sum(r["n_docs"] for r in out.values()) == 50

    def test_moves_are_minority(self, spark, sf_dir):
        """HRW resize property: adding one shard to 16 moves roughly
        1/17 of docs — assert well under half move."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        rows = sq.q_shard_rendezvous(spark, sf_dir).collect()
        total = sum(r["n_docs"] for r in rows)
        moved = sum(r["n_moved"] for r in rows)
        assert 0 <= moved < total / 2


class TestConformalInterval:
    def test_matches_python_replay(self, spark, monkeypatch):
        """Full python mirror of the spec on a controlled orders
        table: same hash split, same floor-mean predictor, same
        order-statistic q-hat, same coverage ratio."""
        import datetime as dt
        import math

        from resume_jd_matcher_spark.queries import structure_q as sq

        ts = dt.datetime(2024, 1, 1)
        prices = [100.0 + 7 * (i % 13) for i in range(60)]
        o = spark.createDataFrame(
            [(i, 1, "O", prices[i], ts, "1-URGENT") for i in range(60)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: o)
        [r] = sq.q_conformal_interval(spark, SF).collect()

        cents = [math.floor(p * 100 + 0.5) for p in prices]
        sp = [_hash32(f"{i}#split") % 10 for i in range(60)]
        cal_c = [c for c, s in zip(cents, sp) if s < 5]
        ev_c = [c for c, s in zip(cents, sp) if s >= 5]
        yhat = sum(cal_c) // len(cal_c)
        scores = sorted(abs(c - yhat) for c in cal_c)
        k = (90 * (len(cal_c) + 1) + 99) // 100
        qhat = scores[k - 1]
        cov = sum(1 for c in ev_c if abs(c - yhat) <= qhat)
        assert r["n_calib"] == len(cal_c)
        assert r["n_eval"] == len(ev_c)
        assert r["qhat_cents"] == qhat
        assert r["n_covered"] == cov
        assert r["coverage_e6"] == (cov * 2_000_000 + len(ev_c)) // (
            2 * len(ev_c)
        )

    def test_tiny_calibration_engine_oracle_parity(self, spark, tmp_path):
        """r12 ADVICE: the Spark side clamps k to [1, n] but the
        registered DuckDB oracle used the raw ceil(0.9*(n+1)) rank —
        for n_calib < 9 the oracle returned NULL qhat / 0 covered
        while the engine returned the max order statistic. Both sides
        must now select the same clamped order statistic. 12 orders →
        n_calib = 6 (hash split), k = ceil(0.9*7) = 7 > 6 → clamp."""
        import datetime as dt

        import duckdb

        from resume_jd_matcher_spark.queries import structure_q as sq

        ts = dt.datetime(2024, 1, 1)
        prices = [100.0 + 7 * (i % 13) for i in range(12)]
        o = spark.createDataFrame(
            [(i, 1, "O", prices[i], ts, "1-URGENT") for i in range(12)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        o.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "orders.parquet")
        )
        [r] = sq.q_conformal_interval(spark, str(tmp_path)).collect()
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW orders AS SELECT * FROM "
            f"'{tmp_path}/orders.parquet/*.parquet'"
        )
        from resume_jd_matcher_spark import queries as Q

        [d] = con.sql(Q._REGISTRY["conformal_interval"].oracle).fetchall()
        con.close()
        duck = dict(zip(["n_calib", "n_eval", "qhat_cents", "n_covered", "coverage_e6"], d))
        assert r["n_calib"] < 9, "fixture must exercise the clamp"
        assert r["qhat_cents"] is not None and duck["qhat_cents"] is not None
        for col in ("n_calib", "n_eval", "qhat_cents", "n_covered", "coverage_e6"):
            assert r[col] == duck[col], col


class TestBcubedEval:
    def test_perfect_clustering_scores_one(self, spark, monkeypatch):
        """Exact-dup groups == near-dup groups (identical texts,
        wildly distinct otherwise): P = R = F1 = 1e9 exactly."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        dup_a = "alpha bravo charlie delta echo foxtrot golf hotel"
        dup_b = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
        rows = _docs(
            [
                (0, dup_a, "web"),
                (1, dup_a, "web"),
                (2, dup_b, "web"),
                (3, dup_b, "web"),
                (4, "zulu yankee xray whiskey victor uniform", "web"),
            ]
        )
        docs = spark.createDataFrame(rows, _DOC_SCHEMA)
        monkeypatch.setattr(sq, "load_table", lambda *a: docs)
        [r] = sq.q_bcubed_eval(spark, SF).collect()
        assert r["n_docs"] == 5
        assert r["precision_e9"] == 10**9
        assert r["recall_e9"] == 10**9
        assert r["f1_e9"] == 10**9

    def test_all_integral_columns(self, spark, sf_dir):
        from resume_jd_matcher_spark.queries import structure_q as sq

        df = sq.q_bcubed_eval(spark, sf_dir)
        assert all(f.dataType.simpleString() == "bigint" for f in df.schema)


class TestDoremiReweight:
    def test_hand_computed_two_sources(self, spark, monkeypatch):
        """A: 'a a a' (3 common tokens), B: 'b' (1 rare token) —
        every fixed-point step checked by hand."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        docs = spark.createDataFrame(
            _docs([(0, "a a a", "A"), (1, "b", "B")]), _DOC_SCHEMA
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: docs)
        out = {r["source"]: r for r in sq.q_doremi_reweight(spark, SF).collect()}
        a, b = out["A"], out["B"]
        assert (a["n_tokens"], b["n_tokens"]) == (3, 1)
        assert a["mean_freq_e6"] == 3_000_000  # every token seen 3x
        assert b["mean_freq_e6"] == 1_000_000
        # global mean freq = (9 + 1) / 4 = 2.5
        assert a["excess_e6"] == 0
        assert b["excess_e6"] == 1_500_000
        # wraw: A = 3 * 1e6, B = 1 * 2.5e6; shares of 5.5e6
        assert a["weight_e6"] == (3_000_000 * 2_000_000 + 5_500_000) // (
            2 * 5_500_000
        )
        assert b["weight_e6"] == (2_500_000 * 2_000_000 + 5_500_000) // (
            2 * 5_500_000
        )

    def test_weights_sum_to_one(self, spark, sf_dir):
        from resume_jd_matcher_spark.queries import structure_q as sq

        rows = sq.q_doremi_reweight(spark, sf_dir).collect()
        total = sum(r["weight_e6"] for r in rows)
        assert abs(total - 10**6) <= len(rows)  # half-up per share


class TestShapleyAttribution:
    def test_hand_computed_two_channels(self, spark, monkeypatch):
        """u1: A -> purchase; u2: B (no conversion); u3: A,B ->
        purchase. v(0)=0, v(A)=1, v(B)=0, v(AB)=2 — phi.2! = (3, 1)."""
        import datetime as dt

        from resume_jd_matcher_spark.queries import structure_q as sq

        t0 = dt.datetime(2024, 1, 1)

        def ev(i, u, typ, minute):
            return (i, t0 + dt.timedelta(minutes=minute), u, typ, 1.0, "{}")

        rows = [
            ev(0, 1, "A", 0), ev(1, 1, "purchase", 1),
            ev(2, 2, "B", 0),
            ev(3, 3, "A", 0), ev(4, 3, "B", 1), ev(5, 3, "purchase", 2),
        ]
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: e)
        out = {
            r["channel"]: r
            for r in sq.q_shapley_attribution(spark, SF).collect()
        }
        assert out["A"]["phi_scaled"] == 3
        assert out["B"]["phi_scaled"] == 1
        assert out["A"]["share_e6"] == 750_000
        assert out["B"]["share_e6"] == 250_000

    def test_efficiency_property(self, spark, sf_dir):
        """Sum of scaled phis equals n!.(v(N) - v(0)) — shares sum
        to ~1e6."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        rows = sq.q_shapley_attribution(spark, sf_dir).collect()
        total = sum(r["share_e6"] for r in rows)
        assert abs(total - 10**6) <= len(rows)

    def test_overflow_guard_bounds_bigint(self, spark, monkeypatch):
        """phi_scaled's BIGINT exposure caps at n! * v(N) by the
        efficiency axiom; the guard must keep every reachable product
        inside int64 (r11 ADVICE: the old n<=20 admitted 20!*4 >
        2^63). The static cap itself must be safe for a plausible
        conversion count, and the runtime assert must fire on an
        exact-product breach."""
        import math

        from resume_jd_matcher_spark.queries import structure_q as sq

        # static cap sanity: 1e6 conversions at the cap stays in int64
        assert math.factorial(sq._SHAP_MAX_CH) * 10**6 < 2**63

        # runtime breach: 3 channels, forced v_full past the bound
        monkeypatch.setattr(sq, "_SHAP_MAX_CH", 3)
        big = 2**61
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0, 1, "A", 0.0, None),
            (1, t0, 1, "B", 0.0, None),
            (2, t0, 1, "C", 0.0, None),
            (3, t0 + dt.timedelta(hours=1), 1, "purchase", 0.0, None),
        ]
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: e)
        real_factorial = math.factorial
        monkeypatch.setattr(
            math, "factorial", lambda k: real_factorial(k) * big
        )
        with pytest.raises(ValueError, match="overflows"):
            sq.q_shapley_attribution(spark, SF)


class TestBurstinessFano:
    def test_hand_computed_counts(self, spark, monkeypatch):
        """Daily counts (2, 0, 4) over a 3-day spine: Fano = 2.0,
        CV^2 = 1.0 — both exact fixed-point."""
        import datetime as dt

        from resume_jd_matcher_spark.queries import structure_q as sq

        t0 = dt.datetime(2024, 1, 1, 12)
        rows = []
        eid = 0
        for day, cnt in ((0, 2), (2, 4)):
            for _ in range(cnt):
                rows.append(
                    (eid, t0 + dt.timedelta(days=day), 1, "view", 1.0, "{}")
                )
                eid += 1
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        monkeypatch.setattr(sq, "load_table", lambda *a: e)
        [r] = sq.q_burstiness_fano(spark, SF).collect()
        assert r["n_days"] == 3 and r["n_events"] == 6
        assert r["fano_e6"] == 2_000_000
        assert r["cv2_e6"] == 1_000_000

    def test_poisson_ish_near_one(self, spark, sf_dir):
        """On the fixture, every type's Fano is positive and finite;
        constant-rate types sit near 1."""
        from resume_jd_matcher_spark.queries import structure_q as sq

        rows = sq.q_burstiness_fano(spark, sf_dir).collect()
        assert rows and all(r["fano_e6"] >= 0 for r in rows)
