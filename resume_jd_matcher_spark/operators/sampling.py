"""Training-data sampling / splitting / packing operators — the
data-prep surface a 100 TB LLM pipeline needs around the corpus
(north-star [EXT]; complements dedup + text analysis).

Everything is deterministic (hash- or order-based, never RNG) so runs
are reproducible and the DuckDB oracle can replay each step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import hash32, tokens


def train_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 8,
    val_pct: int = 1,
) -> DataFrame:
    """Deterministic hash split: bucket = hash32(id) % 10 →
    train/val/test at train_pct/val_pct/rest. Hash-based (not row
    order) so membership is stable under repartitioning and appends —
    the property that matters when the corpus grows between runs.
    """
    bucket = hash32(F.col(id_col).cast("string")) % 10
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Data balancing: keep at most ``cap`` rows per group, chosen by a
    deterministic order (not sampling) — rank window per group, one
    shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing shape: running token count per group (ordered
    by id) assigns each document to a training bin of ~``budget``
    tokens. Cumsum window per group — the standard greedy packer's
    distributed approximation."""
    n_tok = F.size(tokens(text_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(n_tok).over(w)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        n_tok.cast("int").alias("n_tokens"),
        ((running - 1) / budget).cast("long").alias("bin_id"),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII hygiene: count and redact emails/URLs (the two reliably
    regex-able classes) with typed placeholder tokens. At scale this
    runs in the same scan as quality filtering — pure codegen'd
    regexps, no Python."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(c, F.lit(URL_RE)).cast("int").alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ).alias("redacted"),
    )
