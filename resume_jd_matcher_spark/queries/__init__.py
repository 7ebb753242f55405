"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine path;
``oracle_sql`` is the equivalent ANSI SQL the driver runs on DuckDB
over the same parquet tables (views: region nation customer supplier
part orders lineitem events documents embeddings). None → rows-only
check (non-SQL-expressible op).

Contract shared by every pair (FIXTURES.md oracle-harness notes):
- every computed column aliased identically on both sides;
- floats rounded in-query where exposed;
- timestamps exposed as epoch BIGINT or formatted strings, never raw
  (parquet ms/ns precision + dialect formatting differ);
- deterministic tie-breaks on every top-k / limit;
- float arrays cast to DOUBLE before arithmetic on both sides, folded
  left-to-right (bit-compatible accumulation).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class QueryDef(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle is not None}


# Import order = registration order; each module registers its queries.
from resume_jd_matcher_spark.queries import vector_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import relational_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import text_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import scoring_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import stream_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import advanced_q  # noqa: E402,F401
from resume_jd_matcher_spark.queries import sampling_q  # noqa: E402,F401

# Flagship entry point re-export (used by __spark_entry__.entry()).
from resume_jd_matcher_spark.queries.vector_q import q_topk_similarity  # noqa: E402,F401
