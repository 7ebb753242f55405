"""Physical-plan shape assertions (SURVEY.md §4): broadcasts happen,
filters reach the parquet scan, UDF stages stay out of native paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from resume_jd_matcher_spark.plans.optimize import (
    assert_broadcast,
    assert_pushed_filter,
    physical_plan,
)
from resume_jd_matcher_spark.queries.relational_q import (
    q_join_revenue_by_nation,
    q_pricing_summary,
)
from resume_jd_matcher_spark.queries.vector_q import q_topk_similarity
from resume_jd_matcher_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_nation_join_broadcasts(spark):
    assert_broadcast(q_join_revenue_by_nation(spark, SF))


def test_filter_pushed_to_scan(spark):
    df = load_table(spark, SF, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    assert_pushed_filter(df, "c_acctbal")


def test_scan_prunes_columns(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    assert "l_orderkey" in plan and "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_pricing_summary_is_native(spark):
    # No Python evaluation anywhere in the aggregate plan.
    plan = physical_plan(q_pricing_summary(spark, SF))
    assert "Python" not in plan and "HashAggregate" in plan


def test_topk_shuffles_only_partials(spark):
    # The BLAS top-k emits ≤ k rows per (query, partition) before the
    # final rank — the plan must show the mapInPandas stage feeding a
    # window, not a crossJoin of the corpus.
    plan = physical_plan(q_topk_similarity(spark, SF))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_choose_similarity_strategy(spark):
    from resume_jd_matcher_spark.plans.optimize import choose_similarity_strategy

    emb = load_table(spark, SF, "embeddings")
    small = emb.limit(10)
    assert choose_similarity_strategy(small, small) == "exact"
    assert (
        choose_similarity_strategy(emb, emb, max_exact_pairs=1000) == "lsh"
    )
