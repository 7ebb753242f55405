"""Dedup operators on crafted duplicates/near-duplicates."""

from __future__ import annotations

import pytest

from resume_jd_matcher_spark.operators import dedup


@pytest.fixture(scope="module")
def crafted(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark sql engines and parquet files"
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, "  THE  quick brown fox jumps over the lazy dog near the river bank today "),  # normalized dup
        (4, near),                      # near-dup of 1
        (5, far),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(crafted):
    out = {r.rep_doc_id: r.n_dups for r in dedup.dedup_exact(crafted).collect()}
    assert out[1] == 3  # 1, 2, and whitespace/case-normalized 3
    assert out[4] == 1
    assert out[5] == 1


def test_minhash_estimates_near_dup_high(crafted):
    got = {
        (r.left_id, r.right_id): r.est_jaccard
        for r in dedup.minhash_lsh_candidates(crafted, n_hashes=16, rows_per_band=4).collect()
    }
    assert got[(1, 2)] == 1.0
    # near-dup pair should be surfaced as a candidate with high estimate
    assert (1, 4) in got and got[(1, 4)] >= 0.5
    assert (1, 5) not in got


def test_simhash_identical_docs_equal(crafted):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(crafted).collect()}
    assert sh[1] == sh[2]
    assert sh[1] != sh[5]


def test_simhash_neardup_pairs(crafted):
    pairs = {
        (r.left_id, r.right_id): r.hamming
        for r in dedup.simhash_neardup(crafted, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) in pairs  # near-dup within small hamming distance


def test_ngram_jaccard_ground_truth(crafted):
    got = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup.ngram_jaccard_join(crafted, n=3).collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.5 < got[(1, 4)] < 1.0
    assert (1, 5) not in got or got[(1, 5)] < 0.1


def test_simhash_neardup_banded_equals_allpairs(spark):
    """The banded equi-join must produce EXACTLY the all-pairs answer
    (pigeonhole: hamming <= r pairs match in >= 1 of r+1 bands) — and
    its physical plan must contain no cross join."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.plans.optimize import physical_plan
    from resume_jd_matcher_spark.sources.io import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    banded = dedup.simhash_neardup(d, max_hamming=3, n_bits=16)

    plan = physical_plan(banded)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # all-pairs spec, computed inline
    sh = dedup.simhash(d, n_bits=16)
    a = sh.select(F.col("doc_id").alias("left_id"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("right_id"), F.col("simhash").alias("sh_b"))
    spec = (
        a.crossJoin(b)
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("left_id", "right_id", "hamming")
    )
    got = {(r.left_id, r.right_id, r.hamming) for r in banded.collect()}
    want = {(r.left_id, r.right_id, r.hamming) for r in spec.collect()}
    assert got == want and len(want) > 0


def test_ngram_jaccard_pruned_no_crossjoin(spark):
    """Shared-shingle candidate pruning: no cross join in the plan."""
    from resume_jd_matcher_spark.plans.optimize import physical_plan
    from resume_jd_matcher_spark.sources.io import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = physical_plan(dedup.ngram_jaccard_join(d, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_df_cap_shrinks_candidates_keeps_recall(spark):
    """A df-capped shingle universe must kill the freq² candidate
    blow-up from boilerplate shingles without losing real near-dups.
    40 docs share one boilerplate sentence (df=40 shingles → 780
    all-pairs candidates); one genuine near-dup pair shares only rare
    shingles (df=2)."""
    boiler = "standard corporate disclaimer applies to every document in this corpus"
    rows = [
        (i, f"{boiler} unique{i} filler{i} content{i} words{i} tail{i}")
        for i in range(40)
    ]
    near = "wildly specific shared passage about spark shuffle partition tuning"
    rows += [(100, near + " alpha"), (101, near + " beta")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = dedup.ngram_jaccard_join(d, n=3).count()
    capped_rows = dedup.ngram_jaccard_join(d, n=3, max_df=10).collect()
    capped = {(r.left_id, r.right_id): r.jaccard for r in capped_rows}

    # boilerplate-only pairs are gone: candidate volume collapses
    assert uncapped >= 780  # every boilerplate pair shares >= 1 shingle
    assert len(capped) < uncapped / 10
    # ...but the genuine near-dup pair survives with its exact jaccard
    # (its shingles are all below the cap, so the value is unchanged)
    full = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup.ngram_jaccard_join(d, n=3).collect()
    }
    assert (100, 101) in capped
    assert capped[(100, 101)] == full[(100, 101)] >= 0.5


def test_ngram_jaccard_cap_inactive_equals_uncapped(crafted):
    """When no shingle exceeds the cap, capped == uncapped exactly
    (the registered query's regime at test scale factors)."""
    want = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup.ngram_jaccard_join(crafted, n=3).collect()
    }
    got = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup.ngram_jaccard_join(crafted, n=3, max_df=50).collect()
    }
    assert got == want and len(want) > 0


def test_semdedup_drops_lower_id_duplicates(spark):
    # 8 seed vectors (the Lloyd seeds are the 8 lowest ids), plus two
    # vectors colinear with seed 0: one exact copy, one scaled copy
    # (cosine 1.0). Both land in seed 0's cluster and both have a
    # lower-id near-dup mate -> dropped; everything else kept.
    import math

    def basis(i, dim=8, scale=1.0):
        v = [0.0] * dim
        v[i % dim] = scale
        v[(i + 3) % dim] = 0.25 * scale * ((-1) ** i)
        return v

    rows = [(i, basis(i)) for i in range(8)]
    rows.append((100, basis(0)))            # exact copy of vec 0
    rows.append((101, basis(0, scale=2.0)))  # colinear: cosine == 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: (r.cid, r.is_kept)
        for r in dedup.semdedup(emb, n_clusters=8, n_iter=1, tau=0.9).collect()
    }
    assert len(out) == 10  # corpus-sized output, one row per vector
    assert out[100][1] == 0 and out[101][1] == 0
    assert all(out[i][1] == 1 for i in range(8))
    # the duplicates share vec 0's cluster
    assert out[100][0] == out[0][0] == out[101][0]


def test_semdedup_threshold_boundary(spark):
    # cosine rounded to 4 dp before comparing: a pair at exactly tau
    # is dropped, just below survives.
    a = [1.0, 0.0]
    b = [1.0, 1.0]  # cos(a,b) = 0.7071
    emb = spark.createDataFrame(
        [(0, a), (1, b)], ["vec_id", "embedding"]
    )
    dropped = dedup.semdedup(emb, n_clusters=1, n_iter=1, tau=0.7071)
    assert {r.vec_id: r.is_kept for r in dropped.collect()} == {0: 1, 1: 0}
    kept = dedup.semdedup(emb, n_clusters=1, n_iter=1, tau=0.7072)
    assert {r.vec_id: r.is_kept for r in kept.collect()} == {0: 1, 1: 1}


def test_line_dedup_keeps_first_occurrence(spark):
    """C4 semantics: a chunk repeated across docs survives only at its
    first (doc_id, pos); unique text is untouched; a doc that is all
    repeats comes back empty but present."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-tok chunk
    rows = [
        (1, shared + " unique one two three four five six"),
        (2, shared),                         # chunk already seen in doc 1
        (3, "totally different words here live in this doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.line_dedup(docs, chunk_tokens=8).collect()}
    assert len(out) == 3
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[1].clean_text == shared + " unique one two three four five six"
    assert out[2].n_chunks == 1 and out[2].n_kept == 0 and out[2].clean_text == ""
    assert out[3].n_kept == 1 and out[3].clean_text.startswith("totally")


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A short doc pasted inside a much longer one: containment ~1.0
    (every shingle of the short doc is in the long one) while Jaccard
    stays small (union dominated by the long doc)."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, short), (2, filler + " " + short + " " + filler.upper())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    cont = dedup.ngram_containment_join(df, n=3, min_containment=0.9).collect()
    assert len(cont) == 1
    assert cont[0]["containment"] == 1.0

    jac = dedup.ngram_jaccard_join(df, n=3, min_jaccard=0.0).collect()
    assert jac[0]["jaccard"] < 0.1  # symmetric measure misses it


def test_quality_aware_dedup_keeps_longest_member(spark, monkeypatch):
    """The keep flag lands on the longest cluster member, not the
    lowest id (the policy difference vs min-id reps)."""
    from resume_jd_matcher_spark.queries.text_q import q_quality_aware_dedup
    import resume_jd_matcher_spark.queries.text_q as tq

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),              # near-dup of 1 (same token set)
        (1, base + " " + base),  # same set, double length -> keeper
        (2, "unrelated text entirely about something else altogether"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(tq, "load_table", lambda s, d, n: df)
    out = {r["doc_id"]: r for r in q_quality_aware_dedup(spark, "ignored").collect()}
    cluster = {d: r for d, r in out.items() if r["cluster_size"] > 1}
    assert set(cluster) == {0, 1}
    assert out[1]["keep"] == 1 and out[0]["keep"] == 0  # longest wins, not min id
