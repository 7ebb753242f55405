"""One-pass deterministic bootstrap confidence intervals (SURVEY.md
§2.D A4 [EXT] — the uncertainty layer for pipeline statistics).

Online bootstrap (Oza & Russell 2001 online bagging): instead of
resampling the dataset B times (B shuffles at corpus scale), give
every row a PER-REPLICATE integer weight drawn from Poisson(1) —
the multinomial resample's limit — and accumulate all B weighted
sums in ONE map-side-combined aggregate pass. The replicate means
then live in a B-sized array; quantiles over B values are a local
array sort.

Weights are hash-deterministic (inverse-CDF of Poisson(1) applied to
the portable hash32 uniform), so reruns and the DuckDB oracle
reproduce the exact resamples — no RNG, no seed state.

100 TB: the pass shuffles 2·B partial sums per group per partition
(map-side combined), nothing else; B is a constant (default 32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import hash32

# Poisson(1) CDF thresholds for w = 0,1,2,3,4 (4 absorbs the tail).
# P(0)=.36788, P(<=1)=.73576, P(<=2)=.91970, P(<=3)=.98101
_POIS_T = (0.36788, 0.73576, 0.91970, 0.98101)


def _poisson1_from_u(u: Column) -> Column:
    return (
        F.when(u < _POIS_T[0], F.lit(0))
        .when(u < _POIS_T[1], F.lit(1))
        .when(u < _POIS_T[2], F.lit(2))
        .when(u < _POIS_T[3], F.lit(3))
        .otherwise(F.lit(4))
        .cast("bigint")
    )


def poisson1_weight(key: Column, replicate: int) -> Column:
    """Deterministic Poisson(1) draw for (row key, replicate index).

    One md5 feeds FOUR replicates (md5 has 32 hex chars = four
    independent 8-hex 32-bit uniforms), so B replicates cost B/4
    hashes per row, not B — the md5 per row-group is materialized once
    in a projection before the aggregate (see bootstrap_mean_ci)."""
    g, lane = divmod(replicate, 4)
    h = F.md5(F.concat(key.cast("string"), F.lit(f":h{g}")))
    u = F.conv(F.substring(h, 1 + 8 * lane, 8), 16, 10).cast("long") / F.lit(
        4294967296.0
    )
    return _poisson1_from_u(u)


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    n_replicates: int = 32,
    lo_rank: int = 1,
    hi_rank: int = 31,
) -> DataFrame:
    """Per-group mean with a bootstrap CI from ``n_replicates``
    deterministic Poisson-weighted resamples, all in one aggregate
    pass.

    CI bounds are the ``lo_rank``-th / ``hi_rank``-th order statistics
    of the sorted replicate means (1-indexed; defaults ≈ the 3rd/97th
    percentile at B=32). Output: (group, n, mean, ci_lo, ci_hi,
    n_replicates) with floats rounded to 4.
    """
    assert n_replicates <= 64, "replicate count is a constant, not data-sized"
    from resume_jd_matcher_spark.plans.optimize import ensure_parallelism

    # the per-row hash work is the cost; don't let a single-file scan
    # serialize it onto one core
    df = ensure_parallelism(df)
    key = F.col(key_col)
    v = F.col(value_col).cast("double")
    # materialize the B/4 md5 digests ONCE per row in a projection (a
    # dedicated column per digest — inlining the hash into each of the
    # four lanes' aggregate inputs would recompute it per lane)
    n_groups = (n_replicates + 3) // 4
    hashed = df.select(
        F.col(group_col),
        v.alias("_v"),
        *[
            F.expr(f"md5(concat(CAST(`{key_col}` AS STRING), ':h{g}'))").alias(
                f"_h{g}"
            )
            for g in range(n_groups)
        ],
    )
    # r13: the 2·B weighted-sum aggregates are built as parsed SQL
    # strings — the Column-API loop constructed ~10 operator nodes per
    # replicate at ~2-12 ms of py4j latency each (>1.3 s of pure
    # driver time per call at B=32, measured); one F.expr parse per
    # aggregate builds the identical tree (same conv/substring
    # uniform, same Poisson(1) CASE thresholds, same arithmetic) in
    # microseconds.
    # each weight is projected ONCE per row (a dedicated column) so
    # the paired sum(_v·w)/sum(w) aggregates share the conv+CASE
    # evaluation instead of each re-deriving it from the digest
    weight_cols = []
    for b in range(n_replicates):
        grp, lane = divmod(b, 4)
        u = (
            f"(CAST(conv(substring(_h{grp}, {1 + 8 * lane}, 8), 16, 10) "
            "AS BIGINT) / 4294967296.0D)"
        )
        weight_cols.append(
            F.expr(
                f"CAST(CASE WHEN {u} < {_POIS_T[0]!r}D THEN 0"
                f" WHEN {u} < {_POIS_T[1]!r}D THEN 1"
                f" WHEN {u} < {_POIS_T[2]!r}D THEN 2"
                f" WHEN {u} < {_POIS_T[3]!r}D THEN 3"
                " ELSE 4 END AS BIGINT)"
            ).alias(f"_pw{b}")
        )
    weighted = hashed.select(F.col(group_col), F.col("_v"), *weight_cols)
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("_v")).alias("_sv"),
    ]
    for b in range(n_replicates):
        aggs.append(F.expr(f"sum(_v * _pw{b})").alias(f"_wv{b}"))
        aggs.append(F.expr(f"sum(_pw{b})").alias(f"_w{b}"))
    g = weighted.groupBy(group_col).agg(*aggs)
    # replicate means as a bounded array; a replicate whose total
    # weight is 0 (vanishingly rare beyond tiny groups) is dropped
    # from the order statistics via filter()
    means = F.expr(
        "filter(array("
        + ",".join(
            f"CASE WHEN _w{b} > 0 THEN _wv{b} / CAST(_w{b} AS DOUBLE) END"
            for b in range(n_replicates)
        )
        + "), x -> x IS NOT NULL)"
    )
    sorted_means = F.array_sort(means)
    # clamp the order-statistic indices to the surviving replicate
    # count (element_at past the end throws under ANSI); when EVERY
    # replicate drew weight 0 (possible only for 1-2-row groups) the
    # means array is empty and element_at(arr, 0) ALWAYS throws in
    # Spark (indices are 1-based) — guard to NULL, matching the
    # DuckDB oracle's out-of-range NULL
    lo_idx = F.least(F.lit(lo_rank), F.size(means))
    hi_idx = F.least(F.lit(hi_rank), F.size(means))
    eps = F.lit(1e-9)

    def _ci(idx):
        return F.when(
            F.size(means) > 0, F.round(F.element_at(sorted_means, idx) + eps, 4)
        )

    return g.select(
        group_col,
        "n",
        F.round(F.col("_sv") / F.col("n").cast("double") + eps, 4).alias("mean"),
        _ci(lo_idx).alias("ci_lo"),
        _ci(hi_idx).alias("ci_hi"),
        F.size(means).cast("int").alias("n_replicates"),
    )
