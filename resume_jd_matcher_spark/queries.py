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
from pyspark.sql import functions as F
from pyspark.sql import Window

from resume_jd_matcher_spark.sources.io import load_table
from resume_jd_matcher_spark.operators import similarity


class QueryDef(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle is not None}


# ---------------------------------------------------------------------------
# V5 flagship: top-k similarity search with scores
# (reference: rag_model_mass.py:17-47 — FAISS flat-index search, k=top_n,
#  distance → round(10/(1+d), 2) score)
# ---------------------------------------------------------------------------

# Oracle-side squared L2 over DOUBLE[] — same left-to-right fold as the
# engine's zip_with/aggregate (functions/vector.py).
_SQL_SQL2 = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"
)


@register(
    "topk_similarity",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 3
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
), d AS (
  SELECT query_id, vec_id, {_SQL_SQL2.format(a='qe', b='ce')} AS dist
  FROM c, q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
  FROM d
)
SELECT query_id, vec_id,
       round(dist, 4) AS dist,
       round(10.0/(1.0+dist), 2) AS score
FROM r WHERE rn <= 5
""",
)
def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    return similarity.topk_similarity(
        emb.select("vec_id", "embedding"), queries_df, k=5
    )


# ---------------------------------------------------------------------------
# A4: TPC-H Q1-style pricing summary (hash aggregate suite)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
