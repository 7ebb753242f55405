"""T4 parser degradation semantics + T2 canonicalization + T3/A1
(reference rag_model.py:83-98 contract)."""

from __future__ import annotations

from resume_jd_matcher_spark.functions.parsing import (
    canonical_section,
    mean_score,
    parse_scores,
)


def _parse(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "response"])
    out = parse_scores(df)
    return {(r.doc_id, r.section): r.score for r in out.collect()}


def test_happy_path(spark):
    got = _parse(spark, [(1, "SCORES:\nsummary: 7\nskills: 9")])
    assert got == {(1, "summary"): 7, (1, "skills"): 9}


def test_missing_scores_header_drops_doc(spark):
    assert _parse(spark, [(1, "summary: 7\nskills: 9")]) == {}


def test_any_bad_int_voids_whole_doc(spark):
    got = _parse(spark, [(1, "SCORES:\nsummary: 7\nskills: N/A")])
    assert got == {}


def test_junk_lines_without_colon_skipped(spark):
    got = _parse(spark, [(1, "SCORES:\nsummary: 7\nthis line has no separator\nskills: 3")])
    assert got == {(1, "summary"): 7, (1, "skills"): 3}


def test_whitespace_tolerated(spark):
    got = _parse(spark, [(1, "SCORES:\n  summary :  7  ")])
    assert got == {(1, "summary"): 7}


def test_per_doc_isolation(spark):
    got = _parse(
        spark,
        [(1, "SCORES:\nsummary: 7"), (2, "SCORES:\nsummary: bad"), (3, "garbage")],
    )
    assert got == {(1, "summary"): 7}


def test_mean_score_rounding(spark):
    df = spark.createDataFrame(
        [(1, "a", 7), (1, "b", 8), (2, "a", 1)], ["doc_id", "section", "score"]
    )
    out = {r.doc_id: r.final_score for r in mean_score(df).collect()}
    assert out == {1: 7.5, 2: 1.0}


def test_canonical_section(spark):
    df = spark.createDataFrame(
        [("Work History",), ("TECHNOLOGIES",), ("about me",), ("hobbies",)], ["raw"]
    )
    got = [r[0] for r in df.select(canonical_section("raw")).collect()]
    assert got == ["experience", "skills", "summary", None]
