"""Semantics tests for the retrieval family (BM25, RRF fusion,
hard negatives) and exact-substring span dedup — hand-built inputs
with known answers, independent of the DuckDB differential harness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resume_jd_matcher_spark.operators import retrieval
from resume_jd_matcher_spark.operators.dedup import duplicated_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_term_frequency_raises_score(self, spark):
        df = _docs(
            spark,
            [
                (1, "alpha beta gamma delta"),
                (2, "alpha alpha alpha beta"),
                (3, "gamma delta epsilon zeta"),
            ],
        )
        out = {
            r["doc_id"]: r["bm25"]
            for r in retrieval.bm25_scores(df, ("alpha",)).collect()
        }
        assert out[2] > out[1] > 0.0
        assert out[3] == 0.0

    def test_length_normalization_prefers_shorter(self, spark):
        # same tf, different doc length -> shorter doc scores higher
        df = _docs(
            spark,
            [
                (1, "alpha beta"),
                (2, "alpha beta gamma delta epsilon zeta eta theta"),
            ],
        )
        out = {
            r["doc_id"]: r["bm25"]
            for r in retrieval.bm25_scores(df, ("alpha",)).collect()
        }
        assert out[1] > out[2] > 0.0

    def test_topk_deterministic_tiebreak(self, spark):
        df = _docs(spark, [(i, "alpha beta") for i in range(10)])
        got = [r["doc_id"] for r in retrieval.bm25_topk(df, ("alpha",), k=3).collect()]
        assert got == [0, 1, 2]  # equal scores -> id ascending


class TestRRF:
    def test_fuses_both_rankers(self, spark):
        lex = spark.createDataFrame(
            [(1, 10.0), (2, 5.0), (3, 1.0)], "doc_id long, bm25 double"
        )
        den = spark.createDataFrame(
            [(3, 0.9), (2, 0.5), (4, 0.4)], "doc_id long, cos_sim double"
        )
        rows = {r["doc_id"]: r for r in retrieval.rrf_fuse(lex, den, k=10).collect()}
        assert set(rows) == {1, 2, 3, 4}
        # 1/63 + 1/61 (doc 3, ranks 3&1) > 2/62 (doc 2, ranks 2&2)
        best = max(rows.values(), key=lambda r: (r["rrf"], -r["doc_id"]))
        assert best["doc_id"] == 3
        assert rows[3]["rrf"] > rows[2]["rrf"] > rows[1]["rrf"]
        # one-sided docs carry a NULL rank on the missing side
        assert rows[1]["dense_rank"] is None and rows[4]["lex_rank"] is None
        assert rows[1]["rrf"] == pytest.approx(1.0 / 61.0, abs=1e-8)

    def test_pool_truncation(self, spark):
        lex = spark.createDataFrame(
            [(i, float(100 - i)) for i in range(50)], "doc_id long, bm25 double"
        )
        den = spark.createDataFrame([(99, 1.0)], "doc_id long, cos_sim double")
        out = retrieval.rrf_fuse(lex, den, pool=5, k=100).collect()
        # only the top-5 lexical docs (0..4) plus the dense-only doc survive
        assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4, 99]


class TestHardNegatives:
    def test_nearest_other_label(self, spark):
        corpus = spark.createDataFrame(
            [
                (0, 0, [0.0, 0.0]),
                (1, 0, [0.1, 0.0]),  # same label: never a negative
                (2, 1, [0.2, 0.0]),  # nearest other-label
                (3, 1, [5.0, 0.0]),
            ],
            "vec_id long, label int, embedding array<float>",
        )
        queries = corpus.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("query_embedding"),
        )
        [r] = retrieval.hard_negatives(corpus, queries).collect()
        assert r["neg_id"] == 2 and r["neg_label"] == 1
        assert r["dist"] == pytest.approx(0.04, abs=1e-6)


class TestDuplicatedSpans:
    def test_shared_run_recovered_exactly(self, spark):
        shared = "one two three four five six seven eight nine ten"  # 10 tokens
        df = _docs(
            spark,
            [
                (1, f"{shared} tail1 tailX"),
                (2, f"head2a head2b {shared}"),
                (3, "entirely different words with no overlap at all here ok"),
            ],
        )
        rows = {
            r["doc_id"]: r
            for r in duplicated_spans(df, k=8).collect()
        }
        assert set(rows) == {1, 2}
        # doc 1: run at tokens 1..10 -> 3 grams (positions 1,2,3)
        assert (rows[1]["span_start"], rows[1]["span_end"]) == (1, 10)
        assert rows[1]["span_tokens"] == 10 and rows[1]["n_grams"] == 3
        # doc 2: same run shifted to tokens 3..12
        assert (rows[2]["span_start"], rows[2]["span_end"]) == (3, 12)
        assert rows[2]["span_tokens"] == 10

    def test_runs_shorter_than_k_invisible(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c d e f g X p q r s t u v"),
                (2, "a b c d e f g Y p q r s t u v"),  # shared runs of 7 only
            ],
        )
        assert duplicated_spans(df, k=8).count() == 0

    def test_two_disjoint_spans_stay_separate(self, spark):
        run1 = "r1a r1b r1c r1d r1e r1f r1g r1h"
        run2 = "r2a r2b r2c r2d r2e r2f r2g r2h"
        df = _docs(
            spark,
            [
                (1, f"{run1} gapA gapB gapC {run2}"),
                (2, f"{run2} other1 other2 other3 {run1}"),
            ],
        )
        out = duplicated_spans(df, k=8)
        assert out.filter(F.col("doc_id") == 1).count() == 2
        assert out.filter(F.col("doc_id") == 2).count() == 2


class TestRemoveDuplicatedSpans:
    def test_owner_keeps_others_lose(self, spark):
        from resume_jd_matcher_spark.operators.dedup import remove_duplicated_spans

        shared = "one two three four five six seven eight"  # exactly 8 tokens
        df = _docs(
            spark,
            [
                (1, f"{shared} tailA tailB"),
                (2, f"headX {shared} tailC"),
                (3, "no overlap in this document at all whatsoever here"),
            ],
        )
        rows = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=8).collect()}
        # doc 1 is the lowest id holding the gram -> keeps everything
        assert rows[1]["clean_text"] == f"{shared} taila tailb"
        assert rows[1]["n_tokens_after"] == rows[1]["n_tokens_before"] == 10
        # doc 2 loses the 8 shared tokens, keeps its unique ones
        assert rows[2]["clean_text"] == "headx tailc"
        assert rows[2]["n_tokens_after"] == 2
        # untouched doc passes through verbatim (lowercased tokens)
        assert rows[3]["n_tokens_after"] == rows[3]["n_tokens_before"]

    def test_fully_duplicated_doc_empties(self, spark):
        from resume_jd_matcher_spark.operators.dedup import remove_duplicated_spans

        text = "a1 a2 a3 a4 a5 a6 a7 a8"
        df = _docs(spark, [(1, text), (2, text)])
        rows = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=8).collect()}
        assert rows[1]["clean_text"] == text  # canonical copy survives
        assert rows[2]["clean_text"] == "" and rows[2]["n_tokens_after"] == 0

    def test_overlapping_grams_compose(self, spark):
        from resume_jd_matcher_spark.operators.dedup import remove_duplicated_spans

        # 10-token shared run -> 3 overlapping dup grams in doc 2; the
        # union of their covered positions (1..10) must be removed once.
        run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        df = _docs(spark, [(1, f"{run} uniq1"), (2, f"{run} uniq2")])
        rows = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=8).collect()}
        assert rows[2]["clean_text"] == "uniq2"
        assert rows[2]["n_tokens_after"] == 1


class TestMMR:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_diversifies_across_clusters(self, spark):
        """Query points at cluster A; plain top-3 would take all three
        A members, MMR must interleave the B cluster by rank 3."""
        # query at 0°; A cluster (3 identical vectors) at 30°; B at
        # −45°. Plain top-3 = A,A,A. At rank 2: A2 scores
        # 0.7·cos30 − 0.3·1 ≈ 0.306, B scores
        # 0.7·cos45 − 0.3·cos75 ≈ 0.417 → MMR must pick B second.
        a = [0.8660254, 0.5, 0.0]
        b = [0.70710678, -0.70710678, 0.0]
        rows = [(0, a), (1, a), (2, a), (3, b)]
        emb = self._emb(spark, rows)
        qv = spark.createDataFrame(
            [([1.0, 0.0, 0.0],)], "query_embedding array<float>"
        )
        out = retrieval.mmr_topk(emb, qv, k=3, pool=4).collect()
        picked = [r["vec_id"] for r in out]
        assert picked[0] == 0  # pure relevance first (lowest id of A)
        assert picked[1] == 3, f"MMR did not diversify to B: {picked}"

    def test_rank1_is_relevance_argmax_and_k_caps(self, spark):
        rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
        emb = self._emb(spark, rows)
        qv = spark.createDataFrame(
            [([0.0, 1.0, 0.0, 0.0],)], "query_embedding array<float>"
        )
        out = retrieval.mmr_topk(emb, qv, k=10, pool=3).collect()
        assert len(out) == 3  # k caps at pool size
        assert out[0]["vec_id"] == 1
        assert out[0]["relevance"] == out[0]["mmr_score"]


class TestTfidfCosine:
    def test_topical_pair_beats_disjoint(self, spark):
        """Docs sharing rare terms pair high; docs sharing only a
        ubiquitous (df-capped or low-idf) term pair low or not at
        all."""
        from resume_jd_matcher_spark.operators.retrieval import (
            tfidf_cosine_pairs,
        )

        rows = [
            (1, "spark shuffle partition codegen tungsten"),
            (2, "spark shuffle partition codegen catalyst"),
            (3, "gardening tulips roses compost watering"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["left_id"], r["right_id"]): r["cos_sim"]
            for r in tfidf_cosine_pairs(df, min_cosine=0.0).collect()
        }
        # df=2 terms carry idf ln(4/3)≈0.29 vs the unique terms'
        # ln(2)≈0.69, so the shared mass is ~0.41 of the norm product
        assert got[(1, 2)] > 0.3
        assert (1, 3) not in got  # zero shared vocabulary -> no pair


class TestTriplets:
    def test_positive_same_label_negative_other_margin(self, spark):
        from resume_jd_matcher_spark.operators.retrieval import mine_triplets

        corpus = spark.createDataFrame(
            [
                (0, 0, [0.0, 0.0]),
                (1, 0, [0.3, 0.0]),   # nearest same-label -> positive
                (2, 0, [2.0, 0.0]),
                (3, 1, [0.5, 0.0]),   # nearest other-label -> negative
                (4, 1, [9.0, 0.0]),
                (5, 2, [7.0, 0.0]),   # label with one member: no positive
            ],
            "vec_id long, label int, embedding array<float>",
        )
        queries = corpus.filter("vec_id in (0, 5)").select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("query_embedding"),
        )
        rows = {r["query_id"]: r for r in mine_triplets(corpus, queries).collect()}
        assert set(rows) == {0}  # anchor 5 has no positive -> dropped
        r = rows[0]
        assert r["pos_id"] == 1 and r["neg_id"] == 3
        assert r["pos_dist"] == pytest.approx(0.09, abs=1e-6)
        assert r["neg_dist"] == pytest.approx(0.25, abs=1e-6)
        assert r["margin"] == pytest.approx(0.16, abs=1e-6)
