"""Relational scale helpers (SURVEY.md §4: "salting for skew",
"persist embeddings; incremental append").

Most relational operators ARE the DataFrame API (the queries use it
directly); what lives here are the patterns that need deliberate
plan-shaping at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: salt → partial agg
    on (key, salt) → final agg on key. The hot key's rows spread over
    ``n_salts`` reducers in phase one, so no single task owns the whole
    key. Only algebraic aggregates (sum/count/min/max) decompose this
    way; avg = sum/count composed by the caller.

    ``aggs``: {column: 'sum'|'count'|'min'|'max'} → output column
    ``{fn}_{column}``.

    AQE's skew handling covers sort-merge JOINS automatically; explicit
    salting remains the tool for skewed AGGREGATES and broadcast-
    ineligible skewed joins.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[
            getattr(F, fn)(c).alias(f"_p_{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
    merge = {
        "sum": F.sum,
        "count": F.sum,  # counts add up
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*key_cols).agg(
        *[
            merge[fn](f"_p_{fn}_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def incremental_append(
    existing: DataFrame,
    incoming: DataFrame,
    key_col: str,
) -> DataFrame:
    """Incremental upsert-shape append: keep every existing row, add
    only incoming rows whose key is unseen (left-anti). This is the
    engine fix for the reference's per-request full re-embedding
    (app.py:86,160): embed once, persist, append the delta.
    """
    fresh = incoming.join(existing, key_col, "left_anti")
    return existing.unionByName(fresh)
