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
    DataFrame ``(med DOUBLE, n BIGINT)`` — sketch-guided selection:

    1. one pass computes n and an approx [49.4%, 50.6%] value bracket
       (``percentile_approx``, accuracy 500 → Greenwald-Khanna rank
       error ≤ n/500 = 0.2%·n, 3x smaller than the 0.6%·n bracket
       margin, so the true middle ranks k = floor/ceil(0.5·(n-1)+1)
       always land inside; accuracy 500 measured ~30% cheaper than
       2000 on a 2.9M-row input with the same guarantee structure);
    2. ONE fused second pass zones every row against the bracket
       (below / inside / above) and collapses it to the zone×value
       grain in a single map-side-combined aggregate — the below-rank
       offset and the bracket slice's value histogram come out of the
       same scan (r10 spelled these as two separate passes over the
       input plus an unbounded 4% slice; at sf0.1 theil_sen's 2.9M
       pair space spent ~3 of its 4 s re-scanning for them).
    3. the slice histogram is ranked with a tiny global prefix and
       the two middle ranks interpolate (quantile_cont semantics).

    Inputs of ≤ 100k rows skip the bracket (the when() collapses it
    to ±infinity, every row zones inside) and rank everything — below
    that size the sketch's rank guarantee has no room and a full sort
    is free anyway.

    This is the selection-by-sampling classic (Floyd-Rivest style)
    rephrased as two declarative scans: unlike ``percentile()`` it
    never buffers all values in one aggregate, and unlike a global
    rank (operators/prefix.py) it never sorts the full input — the
    only sort covers the ~1.2% bracket slice's value grain. NULLs are
    skipped (quantile semantics). Heavy tie mass AT the median widens
    the slice (every tied row falls inside the bracket) but never
    breaks correctness — ties collapse to one (value, count) row in
    the zone grain, so no stage ever sees the tie mass row-wise
    (rank-within-tie was the one thing no bucket scheme could
    parallelize, and the median never needed it).

    The 1-row stats frame is pinned eagerly for the same reason
    prefix.py pins its height-mode bounds: ``percentile_approx`` is
    merge-order-sensitive and ``s`` is embedded in the zone keys —
    a divergent recompute would zone rows against a different
    bracket than the ranks assume, corrupting the selection. One
    row: pinning is free. The zone grain (≤ slice-distinct + 2 rows)
    is persisted and enrolled in the engine-wide release ledger so
    the prefix machinery and the below-offset both read the one
    materialization instead of re-scanning the input.
    """
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    small_n = 100_000
    x = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v")
    )
    s = x.agg(
        F.count("*").cast("bigint").alias("_n"),
        F.percentile_approx(
            "_v", F.array(F.lit(0.494), F.lit(0.506)), F.lit(500)
        ).alias("_br"),
    ).localCheckpoint(eager=True)
    lo = F.when(F.col("_n") <= small_n, F.lit(float("-inf"))).otherwise(
        F.col("_br")[0]
    )
    hi = F.when(F.col("_n") <= small_n, F.lit(float("inf"))).otherwise(
        F.col("_br")[1]
    )
    xb = x.crossJoin(F.broadcast(s)).select(
        "_v", "_n", lo.alias("_lo"), hi.alias("_hi")
    )
    # Fused zone pass: -1 below the bracket, 0 inside (keyed by
    # value), +1 above. Out-of-bracket rows keep a NULL value key so
    # the whole scan collapses to ≤ |slice distinct| + 2 rows.
    zone = (
        F.when(F.col("_v") < F.col("_lo"), F.lit(-1))
        .when(F.col("_v") > F.col("_hi"), F.lit(1))
        .otherwise(F.lit(0))
    )
    zg = (
        xb.select(
            zone.alias("_z"),
            F.when(zone == 0, F.col("_v")).alias("_vv"),
        )
        .groupBy("_z", "_vv")
        .agg(F.count("*").cast("bigint").alias("_cnt"))
        .persist()
    )
    _PERSISTED.append(zg)
    below = zg.agg(
        F.coalesce(
            F.sum(F.when(F.col("_z") == -1, F.col("_cnt"))), F.lit(0)
        )
        .cast("bigint")
        .alias("_c_below")
    )
    t = F.lit(0.5) * (F.col("_n") - 1) + 1
    vc = zg.filter(F.col("_z") == 0).select(
        F.col("_vv").alias("_v"), "_cnt"
    )
    # checkpoint=False: vc is a filter over the persisted zone grain —
    # each internal consumer reads the cache, not the input.
    ranked = global_prefix(
        vc, ["_v"], sum_col="_cnt", sum_type="bigint", checkpoint=False
    )
    # A value row covers slice-local ranks (cum_sum-_cnt, cum_sum];
    # shift by _c_below to global ranks and keep the row(s) covering
    # the two middle ranks.
    k_lo = F.floor(t) - F.col("_c_below")
    k_hi = F.ceil(t) - F.col("_c_below")
    mid = (
        ranked.crossJoin(F.broadcast(below))
        .crossJoin(F.broadcast(s.select("_n")))
        .filter(
            (
                (F.col("cum_sum") >= k_lo)
                & (F.col("cum_sum") - F.col("_cnt") < k_lo)
            )
            | (
                (F.col("cum_sum") >= k_hi)
                & (F.col("cum_sum") - F.col("_cnt") < k_hi)
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
