"""Dictionary keyword tagging and coverage scoring (SURVEY.md §2.H U5
[EXT]; reference analog: the skill/section vocabulary matching implied
by JD↔resume comparison, reference constants.py:116-124's fixed
section vocabulary and the skills-block prompt assembly
rag_model.py:67-79).

FlashText-style (Singh 2017, arXiv:1711.00046) keyword extraction as
pure dataflow, with two routes picked by dictionary size:

- small dictionary (≤ ``LITERAL_DICT_MAX`` terms — the JD/skill-list
  case): per-arity ``array_intersect`` against LITERAL keyword arrays.
  One codegen'd projection per document, no explode, no join, no
  shuffle — strictly cheaper than exploding the corpus token stream.
- large dictionary (1e3-1e6 terms): the dictionary is a BROADCAST
  dimension table and the corpus's distinct token/shingle stream
  equi-joins it — O(len) per doc regardless of dictionary size
  (FlashText's trie argument, relationally), never a per-row
  N-alternation regex.

Multi-word keywords match against word n-gram shingles of the same
arity, so "hash join" matches as one keyword, not two.

100 TB: both routes shuffle nothing for the match itself; the per-doc
rollup is one map-side-combinable hash agg keyed on the document id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import shingles, tokens

# Above this the literal-array expression stops being the cheap route
# (expression size / codegen limits) and the broadcast join takes over.
LITERAL_DICT_MAX = 256


def _by_arity(keywords: list[str]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for k in sorted(set(k.lower() for k in keywords)):
        out.setdefault(len(k.split()), []).append(k)
    return out


def matched_keyword_array(
    df: DataFrame, keywords: list[str], id_col: str, text_col: str
) -> DataFrame:
    """(id, matched ARRAY<STRING> sorted) — the per-document matched
    keyword SET, via the size-appropriate route."""
    from resume_jd_matcher_spark.plans.optimize import ensure_parallelism

    # the tokenize+shingle projection is the cost; don't let a
    # single-file scan serialize it onto one core
    df = ensure_parallelism(df)
    groups = _by_arity(keywords)
    toks = tokens(text_col)
    if sum(len(v) for v in groups.values()) <= LITERAL_DICT_MAX:
        # seed with an empty array (not None) so an EMPTY dictionary
        # yields zero matches instead of array_sort(None) TypeError,
        # and coalesce at the end so NULL text (NULL tokens → NULL
        # intersect → NULL union) degrades to zero matches like the
        # broadcast route's left-join coalesce
        matched: Column = F.array().cast("array<string>")
        for n, kws in sorted(groups.items()):
            lit = F.array(*[F.lit(k) for k in kws])
            arr = F.array_distinct(toks) if n == 1 else shingles(toks, n)
            matched = F.array_union(matched, F.array_intersect(arr, lit))
        matched = F.coalesce(matched, F.array().cast("array<string>"))
        return df.select(F.col(id_col), F.array_sort(matched).alias("matched"))
    # large-dictionary route: explode distinct candidates, broadcast join
    spark = df.sparkSession
    dic = spark.createDataFrame(
        [(k,) for ks in groups.values() for k in ks], "cand string"
    )
    streams = []
    for n in sorted(groups):
        arr = F.array_distinct(toks) if n == 1 else shingles(toks, n)
        streams.append(df.select(F.col(id_col), F.explode(arr).alias("cand")))
    cands = streams[0]
    for s in streams[1:]:
        cands = cands.unionByName(s)
    hits = (
        cands.join(F.broadcast(dic), "cand")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("cand")).alias("matched"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("matched", F.array().cast("array<string>")).alias(
                "matched"
            ),
        )
    )


def keyword_tag(
    df: DataFrame,
    keywords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tag each document with the dictionary keywords it contains.

    Output: (id, n_matched INT, matched_keywords STRING) — the matched
    set sorted and comma-joined (a string, not an array, so the
    driver's pandas canonicalization hashes it; the approx_stats
    ARRAY-column lesson). Documents matching nothing still appear with
    n_matched = 0.
    """
    m = matched_keyword_array(df, keywords, id_col, text_col)
    return m.select(
        id_col,
        F.size("matched").cast("int").alias("n_matched"),
        F.array_join("matched", ",").alias("matched_keywords"),
    )


def skill_coverage(
    df: DataFrame,
    jd_keywords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Coverage of a JD's keyword set by each document — the
    shortlist-style score the reference computes via LLM prompting
    (rag_model.py:67-98), grounded in exact dictionary evidence:

        coverage     = |doc ∩ jd| / |jd|
        idf_coverage = Σ_{k ∈ doc∩jd} idf(k) / Σ_{k ∈ jd} idf(k)

    with idf(k) = ln((N+1)/(df(k)+1)) from the corpus itself, so a
    rare skill counts for more than one every document mentions —
    plain coverage treats "sql" and "verilog" the same; idf coverage
    doesn't. Output: (id, n_matched, coverage, idf_coverage, band)
    with the reference's score banding (≥0.8 high / ≥0.5 medium /
    low, templates/bulk_result.html:34-40) applied to coverage.

    Scale shape: the matched sets come from the no-join literal route
    (dictionary-bounded); df(k) is one hash agg over the EXPLODED
    MATCHED sets (≤ |dict| values per doc, usually ≪ doc length — the
    stream the r6 rewrite stopped exploding was the full corpus token
    stream); idf and its Σ are dictionary-bounded broadcasts. The
    matched-set projection is computed once and persisted across the
    df-count and per-doc consumers."""
    jd = sorted(set(k.lower() for k in jd_keywords))
    n_jd = len(jd)

    m = matched_keyword_array(df, jd, id_col, text_col).persist()
    try:
        n_docs = m.count()  # one scalar job; also materializes the cache
        matches = m.select(F.col(id_col), F.explode("matched").alias("cand"))
        idf = (
            matches.groupBy("cand")
            .agg(F.count("*").alias("df"))
            .select(
                "cand",
                F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)).alias("idf"),
            )
        )
        # dictionary terms absent from the corpus still carry idf mass.
        # (broadcast the RIGHT side: the left of a left-outer join
        # can't be the broadcast build side)
        dic = df.sparkSession.createDataFrame([(k,) for k in jd], "cand string")
        idf_full = dic.join(F.broadcast(idf), "cand", "left").select(
            "cand",
            F.coalesce("idf", F.log(F.lit(float(n_docs + 1)))).alias("idf"),
        )
        total = idf_full.agg(F.sum("idf").alias("idf_total"))
        per_doc = (
            matches.join(F.broadcast(idf_full), "cand")
            .groupBy(id_col)
            .agg(
                F.count("*").cast("int").alias("n_matched"),
                F.sum("idf").alias("idf_sum"),
            )
        )
        base = m.select(F.col(id_col)).crossJoin(F.broadcast(total))
        cov = F.round(F.coalesce("n_matched", F.lit(0)) / F.lit(float(n_jd)), 4)
        out = base.join(per_doc, id_col, "left").select(
            id_col,
            F.coalesce("n_matched", F.lit(0)).cast("int").alias("n_matched"),
            cov.alias("coverage"),
            F.round(
                F.coalesce("idf_sum", F.lit(0.0)) / F.col("idf_total")
                + F.lit(1e-9),  # mirror the oracle's representation nudge
                4,
            ).alias("idf_coverage"),
            F.when(cov >= 0.8, F.lit("high"))
            .when(cov >= 0.5, F.lit("medium"))
            .otherwise(F.lit("low"))
            .alias("band"),
        )
        return out
    finally:
        # release tracked by the shared registry; the returned plan
        # recomputes lazily if materialized after release
        from resume_jd_matcher_spark.operators.dedup import _PERSISTED

        _PERSISTED.append(m)
