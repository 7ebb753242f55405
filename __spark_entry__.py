"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``resume_jd_matcher_spark/`` — this module is
the thin registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from resume_jd_matcher_spark import queries as _q  # noqa: E402
from resume_jd_matcher_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: V5 top-k similarity
    shortlist (the reference's bulk /shortlist lifecycle,
    rag_model_mass.py:17-47, re-expressed as broadcast-crossJoin →
    codegen'd squared-L2 → per-query top-k)."""
    tune(spark)
    return _q.q_topk_similarity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Each
    callable applies the engine's runtime session defaults (UTC, AQE)
    to the driver-provided session before building its plan."""

    def _tuned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(tune(spark), sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _tuned(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return _q.oracle_sql()
