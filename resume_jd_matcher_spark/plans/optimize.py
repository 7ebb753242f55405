"""Physical-plan helpers (SURVEY.md §4).

Catalyst already provides pushdown, pruning, broadcast selection, AQE
— these helpers cover the few places the engine must shape the plan
itself: making sure a cross-join's streamed side has enough partitions
to use every core (a small parquet file arrives as ONE partition, and
BroadcastNestedLoopJoin inherits the streamed side's parallelism), and
plan-inspection utilities used by tests/bench to assert the plan shape
(broadcast happened, filter pushed down) rather than guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism if it
    currently has fewer partitions.

    Intended for the *streamed* side of a broadcast cross join whose
    source is a handful of small files: the O(N·M) pair computation
    inherits the scan's partitioning, so one input split = one core.
    At real scale the scan already yields hundreds of splits and this
    is a no-op (the partition check avoids a gratuitous shuffle).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def parallel_checkpoint(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """``repartition(n).localCheckpoint()`` — a checkpoint that keeps
    its parallelism.

    ``ensure_parallelism`` inspects the PRE-AQE partition count, which
    is right for already-materialized inputs (scans, prior checkpoints)
    but blind to what AQE will do: a shuffle feeding a bare
    ``localCheckpoint`` gets coalesced to a handful of partitions at
    runtime and the checkpoint pins that, so every downstream consumer
    runs on ~3 cores (r9 ``degree_assortativity``: 5.9x at 10x traced
    to exactly this). An explicit user ``repartition(n)`` is exempt
    from AQE coalescing by contract (REPARTITION_BY_NUM), so the
    checkpointed blocks land n-wide by construction. Costs one extra
    shuffle of the frame — only worth it when multiple non-trivial
    consumers follow.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    return df.repartition(target).localCheckpoint()


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def assert_broadcast(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "Broadcast" in plan, f"expected a broadcast join in plan:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r} in plan:\n{plan}"
    )


def estimated_rows(df: DataFrame) -> int | None:
    """Catalyst's row-count estimate for a plan (None if unknown).
    Cheap — reads optimizer statistics, runs nothing."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        opt = stats.rowCount()
        if opt.isDefined():
            return int(str(opt.get()))
        size = int(str(stats.sizeInBytes()))
        # fall back to size / rough-row-width
        return max(size // 256, 1)
    except Exception:  # noqa: BLE001 — stats are advisory
        return None


def choose_similarity_strategy(
    left: DataFrame,
    right: DataFrame,
    max_exact_pairs: int = 50_000_000,
) -> str:
    """Cost-based routing for similarity joins: 'exact' (BLAS
    brute-force) while the estimated pair count is tractable, else
    'lsh' (bucketed candidates, operators/ann.py). The estimate comes
    from Catalyst plan statistics — no job runs to decide.

    This is the engine-level stand-in for the optional custom Catalyst
    rewrite rule (SURVEY.md §4): same decision, made at operator-
    construction time where it's observable and testable.
    """
    nl, nr = estimated_rows(left), estimated_rows(right)
    if nl is None or nr is None:
        return "exact"
    return "exact" if nl * nr <= max_exact_pairs else "lsh"


def materialize_and_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Eagerly compute a BOUNDED result frame, then unpersist the
    caches that fed it.

    Queries that ``persist()`` a shared intermediate (pair spaces,
    vocab grains) would otherwise leave cached blocks alive for the
    whole session — across a 230-query selfcheck/bench sweep those
    accumulate and lean on LRU eviction under memory pressure (r8
    advisor note). ``localCheckpoint(eager=True)`` runs the job NOW
    and pins only the (small) result partitions; the upstream caches
    are then released deterministically instead of at session end.

    Only call this with a dimension-bounded / scalar result — the
    checkpoint materializes it on executors.
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
