"""Distributed global prefix aggregation (rank + running sum) WITHOUT
a single-partition window.

The naive Spark spelling of "global running total ordered by X" is
``Window.orderBy(X)`` with no partitionBy — Spark funnels the ENTIRE
dataset through one task, the canonical scale-killer this repo's plan
audit hunts for. This module uses the bucket-offset pattern instead
(the same shape as queries' corpus_shuffle, and what every MPP engine
does for global ORDER BY + RANK):

1. one 1-row (min, max) agg over the leading order key, broadcast;
2. a MONOTONE bucket id per row via width_bucket against that range —
   a pure projection, so bucket assignment costs no shuffle and is
   trivially deterministic (unlike sampled range partitioning);
3. per-bucket (count, sum) totals — a map-side-combined hash agg
   whose shuffle is n_buckets rows;
4. prefix-scan the totals (the ONLY unpartitioned window, over
   n_buckets rows — bounded by configuration, not data);
5. one window PARTITIONED BY bucket over the data, plus the broadcast
   offsets: global rank = bucket offset + intra-bucket row_number,
   global running sum likewise.

Net data movement: ONE hash shuffle of the input (the per-bucket
window's Exchange). The input is localCheckpointed because three
consumers (stats, totals, final) would otherwise recompute its
lineage — callers pass an already-aggregated grain (parts, customers),
so the materialization is dimension-sized, not fact-sized.

Monotone-bucket caveat: width_bucket is equal-WIDTH, not
equal-height; a skewed key distribution (or mass ties on one value)
concentrates rows in few buckets, degrading parallelism but never
correctness — every row of an order-key tie lands in the same bucket,
which is exactly what a prefix over a total order requires.

Determinism: callers must pass a TOTAL order (include a unique id as
the last order column) so rank is reproducible run-to-run and across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Matches the repo-wide shuffle-partition default (session.tune).
DEFAULT_BUCKETS = 64


def global_prefix(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    ascending: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
    sum_type: str = "double",
) -> DataFrame:
    """Append exact global ``rank`` (1-based) and ``cum_sum``
    (inclusive running total of ``sum_col``) under the total order
    given by ``order_cols``. The leading order column drives the
    bucketing and must be numeric and non-null.

    Output: input columns + (rank BIGINT, cum_sum of ``sum_type``).

    Pass ``sum_type="bigint"`` with an integer-valued column (e.g.
    prices pre-converted to cents) when the caller needs
    bit-deterministic accumulation: float running sums depend on
    association order (bucket offsets here vs strict left-to-right in
    a SQL oracle), integer sums do not.
    """
    cols = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    lead = F.col(order_cols[0]).cast("double")
    # Three consumers below; freeze the (dimension-sized) grain once.
    grain = df.localCheckpoint()
    stats = grain.agg(
        F.min(lead).alias("_lo"), F.max(lead).alias("_hi")
    )
    bucketed = grain.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(1)).otherwise(
            F.width_bucket(lead, "_lo", "_hi", F.lit(n_buckets))
        ),
    )
    per_bucket = bucketed.groupBy("_bkt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(sum_col).cast(sum_type)).alias("_s"),
    )
    # The ONLY unpartitioned window: n_buckets rows.
    bkt_order = F.col("_bkt").asc() if ascending else F.col("_bkt").desc()
    w = Window.orderBy(bkt_order).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bkt",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_off_n"),
        F.coalesce(F.sum("_s").over(w), F.lit(0).cast(sum_type)).alias(
            "_off_s"
        ),
    )
    intra = Window.partitionBy("_bkt").orderBy(*cols)
    intra_run = intra.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        bucketed.join(F.broadcast(offsets), "_bkt")
        .select(
            *df.columns,
            (F.col("_off_n") + F.row_number().over(intra)).alias("rank"),
            (
                F.col("_off_s")
                + F.sum(F.col(sum_col).cast(sum_type)).over(intra_run)
            ).alias("cum_sum"),
        )
    )
