"""Salted aggregation equivalence + incremental embedding append."""

from __future__ import annotations

from pyspark.sql import functions as F

from resume_jd_matcher_spark.operators.embedding import embed_documents
from resume_jd_matcher_spark.operators.relational import (
    incremental_append,
    salted_aggregate,
)
from resume_jd_matcher_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain(spark):
    l = load_table(spark, SF, "lineitem")
    salted = salted_aggregate(
        l,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        n_salts=8,
    )
    plain = l.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_orderkey"),
        F.max("l_extendedprice").alias("max_l_extendedprice"),
    )
    got = {r.l_returnflag: (round(r.sum_l_quantity, 6), r.count_l_orderkey, r.max_l_extendedprice) for r in salted.collect()}
    want = {r.l_returnflag: (round(r.sum_l_quantity, 6), r.count_l_orderkey, r.max_l_extendedprice) for r in plain.collect()}
    assert got == want


def test_incremental_append_embeds_only_delta(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("embstore") / "embeddings")
    docs = load_table(spark, SF, "documents")

    first = docs.filter(F.col("doc_id") < 300)
    embed_documents(first, backend="hash", dim=8).write.parquet(store)

    existing = spark.read.parquet(store)
    incoming = embed_documents(
        docs.filter(F.col("doc_id") < 400), backend="hash", dim=8
    )
    merged = incremental_append(existing, incoming, "doc_id")

    assert merged.count() == 400
    assert merged.select("doc_id").distinct().count() == 400
    # idempotent: appending the same delta again adds nothing
    again = incremental_append(merged, incoming, "doc_id")
    assert again.count() == 400


def test_observe_metrics_single_pass(spark, sf_dir):
    """Production jobs need row counts / quality metrics WITHOUT a
    second scan: Observation attaches aggregates to the one pass the
    job already makes (vs .count() + .agg() re-scans)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.operators.textstats import text_quality
    from resume_jd_matcher_spark.sources.io import load_table

    obs = Observation("clean_metrics")
    scored = text_quality(load_table(spark, sf_dir, "documents")).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("quality").alias("mean_quality"),
        F.sum(F.col("quality").isNull().cast("int")).alias("null_quality"),
    )
    scored.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_docs"] == 500
    assert 0.0 < m["mean_quality"] <= 1.0
    assert m["null_quality"] == 0
