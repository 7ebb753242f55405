"""Exact per-group interpolated percentiles via the two-scan
bucket-histogram plan — the scale-safe replacement for
``percentile()``'s ObjectHashAggregate, which buffers every group
value in executor memory (~20M doubles per group at sf10, OOM at
100 TB).

Scan 1 builds a bounded histogram on integer buckets
``floor(value)`` (map-side combined; histogram size is capped by the
value domain — for unbounded domains widen to ``floor(value/width)``),
then a tiny per-group cumulative-count window over buckets locates,
for each percentile target rank t = p*(n-1)+1, the bucket holding
ranks floor(t) and ceil(t) plus the rank offset inside that bucket.
Scan 2 broadcast-semi-joins the input down to just those ≤2·|pcts|
buckets per group, ranks the handful of surviving rows, and picks the
bracketing values; interpolation follows quantile_cont semantics
(v = v_lo + frac*(v_hi - v_lo)).

No stage ever holds a group's raw values: peak state is the bucket
histogram (bounded) and the bracketing-bucket row slice. Extracted in
round 7 from queries/advanced_q.q_exact_percentiles so approx_stats'
in-engine exact verifier shares the same scale-safe plan (its first
r7 spelling put ``percentile()`` in the same aggregate as a
``countDistinct`` — the distinct-agg Expand rewrite then carried a
full percentile buffer per (group, distinct-key) partial group, a
209 s pathology at sf0.1).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: Sequence[tuple[str, float]],
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per
    ``group_col``: one output row per group with one column per
    ``(tag, p)`` in ``pcts`` (quantile_cont / percentile() semantics,
    unrounded). See module docstring for the two-scan plan."""
    spark = df.sparkSession
    # quantile_cont / percentile() skip NULLs; without this filter a
    # NULL value lands in a NULL bucket that sorts FIRST in the
    # cumulative window and shifts every rank. A group whose values
    # are ALL NULL must still appear in the output (with NULL
    # percentiles, as quantile_cont emits it) — the group universe is
    # re-joined at the end.
    all_groups = df.select(group_col).distinct()
    l = df.filter(F.col(value_col).isNotNull()).select(
        group_col, value_col, F.floor(value_col).alias("_b")
    )
    hist = l.groupBy(group_col, "_b").agg(F.count("*").alias("_cnt"))
    totals = hist.groupBy(group_col).agg(F.sum("_cnt").alias("_n"))
    wb = Window.partitionBy(group_col).orderBy("_b")
    whist = hist.join(F.broadcast(totals), group_col).withColumn(
        "_cum", F.sum("_cnt").over(wb)
    )
    targets = spark.createDataFrame(
        [(tag, p, kind) for tag, p in pcts for kind in ("lo", "hi")],
        "_tag string, _p double, _kind string",
    )
    # Bucket with cumulative count `_cum` covers integer ranks
    # (_cum-_cnt, _cum]; rank k lives in it iff _cum >= k > _cum-_cnt.
    spec = (
        whist.crossJoin(F.broadcast(targets))
        .withColumn("_t", F.col("_p") * (F.col("_n") - 1) + 1)
        .withColumn(
            "_k",
            F.when(F.col("_kind") == "lo", F.floor("_t")).otherwise(
                F.ceil("_t")
            ),
        )
        .filter(
            (F.col("_cum") >= F.col("_k"))
            & (F.col("_cum") - F.col("_cnt") < F.col("_k"))
        )
        .select(
            group_col,
            "_b",
            (F.col("_k") - F.col("_cum") + F.col("_cnt")).alias("_kb"),
            F.concat("_tag", F.lit("_"), "_kind").alias("_slot"),
        )
        # ≤ 2·|pcts|·|groups| rows; persisted so the two broadcast
        # consumers below don't each re-run the histogram job (and its
        # input scan).
        .persist()
    )
    buckets = spec.select(group_col, "_b").distinct()
    wr = Window.partitionBy(group_col, "_b").orderBy(value_col)
    picked = (
        l.join(F.broadcast(buckets), [group_col, "_b"])
        .withColumn("_rn", F.row_number().over(wr))
        .join(
            F.broadcast(spec).withColumnRenamed("_kb", "_rn"),
            [group_col, "_b", "_rn"],
        )
    )
    slot_aggs = [
        F.max(
            F.when(F.col("_slot") == f"{tag}_{kind}", F.col(value_col))
        ).alias(f"_{tag}_{kind}")
        for tag, _ in pcts
        for kind in ("lo", "hi")
    ]
    out = picked.groupBy(group_col).agg(*slot_aggs).join(
        F.broadcast(totals), group_col
    )
    out_cols = [F.col(group_col)]
    for tag, p in pcts:
        t = F.lit(p) * (F.col("_n") - 1) + 1
        frac = t - F.floor(t)
        out_cols.append(
            (
                F.col(f"_{tag}_lo")
                + frac * (F.col(f"_{tag}_hi") - F.col(f"_{tag}_lo"))
            ).alias(tag)
        )
    # Enroll the spec cache in the engine-wide release ledger
    # (dedup._PERSISTED — the same list cluster.py uses) so the sweep
    # hooks (driver_sim / bench release_persisted() after every
    # query) reclaim it deterministically. The r10 driver_sim
    # cache-leak gate caught the bare persist in all three callers
    # (approx_stats / exact_percentiles / qte_deciles). A lazy
    # registered persist — NOT an eager localCheckpoint — keeps the
    # full subplan visible to the plan audits (explain_audit, the
    # registry-wide cartesian sweep), which a construction-time
    # checkpoint would blind behind a Scan ExistingRDD node.
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    _PERSISTED.append(spec)
    return all_groups.join(out.select(*out_cols), group_col, "left")


def global_median_exact(df: DataFrame, value_col: str) -> DataFrame:
    """EXACT interpolated global median of ``value_col`` as a 1-row
    DataFrame ``(med DOUBLE, n BIGINT)`` — bucket-histogram selection
    (group_percentiles_exact's two-scan plan, globalized; replaced the
    r10/r11a percentile_approx-bracket spelling, whose GK sketch and
    generic global-prefix machinery were each ~2 s of fixed cost at
    sf0.1 while this plan's three jobs total well under 1 s):

    1. one pass pins n / min / max (merge-order-invariant, so the
       eager pin can never diverge from a recompute);
    2. one pass histograms every row into 65536 equal-width buckets
       (map-side-combined; the cumulative count over the bounded
       bucket grain runs as ONE single-partition window — 64k rows,
       not data) and the bucket(s) covering the two middle ranks
       k = floor/ceil(0.5·(n-1)+1) fall out with their EXACT
       rank offsets — no sketch, no probabilistic bracket;
    3. one final pass keeps only rows in those ≤2 target buckets
       (~n/65536 rows + tie mass), collapses them to the value grain,
       ranks that tiny grain with another single-partition cumulative
       window, and interpolates (quantile_cont semantics).

    NULLs are skipped (quantile semantics). Heavy tie mass AT the
    median lands in one bucket but collapses to one (value, count)
    row at the value grain, so no stage ever sees the tie mass
    row-wise (rank-within-tie was the one thing no bucket scheme
    could parallelize, and the median never needed it). A degenerate
    min==max domain routes every row to bucket 1 and interpolation
    returns that single value. The only single-partition windows run
    over the 64k-bounded bucket grain and the ≤2-bucket value grain —
    never over data.
    """
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    n_buckets = 65_536
    # NULLs skipped (quantile semantics); non-finite values skipped
    # too — a NaN passes isNotNull but width_buckets to a NULL bucket
    # that sorts FIRST in the cumulative window (shifting every rank),
    # and an infinite min/max makes width_bucket NULL for all rows
    # (r11 ADVICE; latent — current callers feed integer cents /
    # day-denominated slopes, which cannot produce NaN/Inf).
    x = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v")
    ).filter(~F.isnan("_v") & (F.abs("_v") != F.lit(float("inf"))))
    # r13: the 1-row stats pin and the bounded cumulative histogram
    # are registered lazy persists, not eager localCheckpoints — each
    # eager pin was a BLOCKING driver job (~1 s of pure latency per
    # call at sf0.1, x2 pins, measured), while a persist computes the
    # identical values once inside the caller's single action (min/
    # max/count and the coalesce(1) cumulative sum are merge-order-
    # invariant, so even a recompute-on-eviction cannot diverge).
    s = x.agg(
        F.count("*").cast("bigint").alias("_n"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
    ).persist()
    _PERSISTED.append(s)
    xb = x.crossJoin(F.broadcast(s))
    bkt = F.when(F.col("_hi") == F.col("_lo"), F.lit(1)).otherwise(
        F.width_bucket("_v", "_lo", "_hi", F.lit(n_buckets))
    )
    hist = (
        xb.groupBy(bkt.alias("_b"))
        .agg(F.count("*").cast("bigint").alias("_bc"))
        # bounded: <= n_buckets+1 rows; ONE partition so the
        # cumulative window below needs no global machinery
        .coalesce(1)
    )
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    # bucket _b covers global ranks (_cum - _bc, _cum]
    ch = hist.withColumn("_cum", F.sum("_bc").over(wb)).persist()
    _PERSISTED.append(ch)
    t = F.lit(0.5) * (F.col("_n") - 1) + 1
    k_lo, k_hi = F.floor(t), F.ceil(t)
    tb = ch.crossJoin(F.broadcast(s)).filter(
        (
            (F.col("_cum") >= k_lo)
            & (F.col("_cum") - F.col("_bc") < k_lo)
        )
        | (
            (F.col("_cum") >= k_hi)
            & (F.col("_cum") - F.col("_bc") < k_hi)
        )
    )
    # <= 2 rows; the slice's global rank offset is the cumulative
    # count before its FIRST target bucket
    off = tb.agg(
        F.coalesce(F.min(F.col("_cum") - F.col("_bc")), F.lit(0))
        .cast("bigint")
        .alias("_c_below")
    )
    vc = (
        xb.join(F.broadcast(tb.select("_b").distinct()), bkt == F.col("_b"))
        .groupBy("_v")
        .agg(F.count("*").cast("bigint").alias("_cnt"))
        .coalesce(1)
        .persist()
    )
    _PERSISTED.append(vc)
    wv = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vc.withColumn("cum_sum", F.sum("_cnt").over(wv))
    # A value row covers slice-local ranks (cum_sum - _cnt, cum_sum];
    # shift by _c_below to global ranks and keep the row(s) covering
    # the two middle ranks.
    kl = F.floor(t) - F.col("_c_below")
    kh = F.ceil(t) - F.col("_c_below")
    mid = (
        ranked.crossJoin(F.broadcast(off))
        .crossJoin(F.broadcast(s.select("_n")))
        .filter(
            (
                (F.col("cum_sum") >= kl)
                & (F.col("cum_sum") - F.col("_cnt") < kl)
            )
            | (
                (F.col("cum_sum") >= kh)
                & (F.col("cum_sum") - F.col("_cnt") < kh)
            )
        )
    )
    return mid.agg(
        (
            F.min("_v")
            + (
                F.lit(0.5) * (F.max("_n") - 1)
                + 1
                - F.floor(F.lit(0.5) * (F.max("_n") - 1) + 1)
            )
            * (F.max("_v") - F.min("_v"))
        ).alias("med"),
        F.coalesce(F.max("_n"), F.lit(0)).cast("bigint").alias("n"),
    )


def global_value_at_rank(
    df: DataFrame,
    value_col: str,
    rank_expr: str,
    n_buckets: int = 65_536,
) -> DataFrame:
    """EXACT value at a data-dependent global rank as a 1-row
    DataFrame ``(val DOUBLE, n BIGINT)`` — the order-statistic sibling
    of ``global_median_exact``, same bucket-histogram selection plan
    (min/max pin, equal-width histogram with exact cumulative ranks,
    rank the single target bucket's value grain).

    ``rank_expr`` is a SQL expression over the pinned count column
    ``_n`` producing the 1-based target rank k as an integer, e.g.
    ``"(9 * (_n + 1) + 9) div 10"`` for the split-conformal
    ceil(0.9·(n+1)) order statistic — integer arithmetic keeps the
    rank exact on both engines. The rank is CLAMPED to [1, _n]
    before selection: conformal's ceil(0.9·(n+1)) exceeds n whenever
    n < 9, and an unclamped k would match no bucket, returning
    (val=NULL, n=0) while the caller's oracle still reports the true
    n (r11 ADVICE). Returns the SMALLEST value whose cumulative count
    reaches the clamped k (the strict order statistic, no
    interpolation). NULL and non-finite values are skipped —
    width_bucket maps NaN to a NULL bucket that sorts first in the
    cumulative window and shifts every rank, and an infinite min/max
    voids the whole histogram (r11 ADVICE).
    """
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    x = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v")
    ).filter(~F.isnan("_v") & (F.abs("_v") != F.lit(float("inf"))))
    # r13: lazy registered persists instead of eager localCheckpoints
    # — same rationale and invariance argument as global_median_exact.
    s = x.agg(
        F.count("*").cast("bigint").alias("_n"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
    ).persist()
    _PERSISTED.append(s)
    xb = x.crossJoin(F.broadcast(s))
    bkt = F.when(F.col("_hi") == F.col("_lo"), F.lit(1)).otherwise(
        F.width_bucket("_v", "_lo", "_hi", F.lit(n_buckets))
    )
    hist = (
        xb.groupBy(bkt.alias("_b"))
        .agg(F.count("*").cast("bigint").alias("_bc"))
        .coalesce(1)
    )
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    ch = hist.withColumn("_cum", F.sum("_bc").over(wb)).persist()
    _PERSISTED.append(ch)
    # clamp: rank expressions like ceil(0.9*(n+1)) exceed n on tiny
    # inputs; an out-of-range k must select the extreme order
    # statistic, not an empty bucket set.
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.least(F.expr(rank_expr).cast("bigint"), F.col("_n")),
    )
    tb = ch.crossJoin(F.broadcast(s)).filter(
        (F.col("_cum") >= k) & (F.col("_cum") - F.col("_bc") < k)
    )
    off = tb.agg(
        F.coalesce(F.min(F.col("_cum") - F.col("_bc")), F.lit(0))
        .cast("bigint")
        .alias("_c_below")
    )
    vc = (
        xb.join(F.broadcast(tb.select("_b").distinct()), bkt == F.col("_b"))
        .groupBy("_v")
        .agg(F.count("*").cast("bigint").alias("_cnt"))
        .coalesce(1)
        .persist()
    )
    _PERSISTED.append(vc)
    wv = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vc.withColumn("cum_sum", F.sum("_cnt").over(wv))
    return (
        ranked.crossJoin(F.broadcast(off))
        .crossJoin(F.broadcast(s.select("_n")))
        .filter(F.col("_c_below") + F.col("cum_sum") >= k)
        .agg(
            F.min("_v").alias("val"),
            F.coalesce(F.max("_n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )
