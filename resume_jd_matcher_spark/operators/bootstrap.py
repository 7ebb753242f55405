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


def poisson1_weight(key: Column, replicate: int) -> Column:
    """Deterministic Poisson(1) draw for (row key, replicate index)."""
    u = hash32(
        F.concat(key.cast("string"), F.lit(f":b{replicate}"))
    ) / F.lit(4294967296.0)
    return (
        F.when(u < _POIS_T[0], F.lit(0))
        .when(u < _POIS_T[1], F.lit(1))
        .when(u < _POIS_T[2], F.lit(2))
        .when(u < _POIS_T[3], F.lit(3))
        .otherwise(F.lit(4))
        .cast("bigint")
    )


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
    key = F.col(key_col)
    v = F.col(value_col).cast("double")
    aggs = [
        F.count("*").alias("n"),
        F.sum(v).alias("_sv"),
    ]
    for b in range(n_replicates):
        w = poisson1_weight(key, b)
        aggs.append(F.sum(v * w).alias(f"_wv{b}"))
        aggs.append(F.sum(w).alias(f"_w{b}"))
    g = df.groupBy(group_col).agg(*aggs)
    # replicate means as a bounded array; a replicate whose total
    # weight is 0 (vanishingly rare beyond tiny groups) is dropped
    # from the order statistics via filter()
    means = F.filter(
        F.array(
            *[
                F.when(
                    F.col(f"_w{b}") > 0,
                    F.col(f"_wv{b}") / F.col(f"_w{b}").cast("double"),
                )
                for b in range(n_replicates)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    sorted_means = F.array_sort(means)
    # clamp the order-statistic indices to the surviving replicate
    # count (element_at past the end throws under ANSI)
    lo_idx = F.least(F.lit(lo_rank), F.size(means))
    hi_idx = F.least(F.lit(hi_rank), F.size(means))
    eps = F.lit(1e-9)
    return g.select(
        group_col,
        "n",
        F.round(F.col("_sv") / F.col("n").cast("double") + eps, 4).alias("mean"),
        F.round(F.element_at(sorted_means, lo_idx) + eps, 4).alias("ci_lo"),
        F.round(F.element_at(sorted_means, hi_idx) + eps, 4).alias("ci_hi"),
        F.size(means).cast("int").alias("n_replicates"),
    )
