"""As-of (point-in-time) join — a J4-class operator Spark has no
native node for (SURVEY.md §2.F; guide: "as-of / range join").

For each left row, find the most recent right row with right.ts ≤
left.ts within the same key. The scalable Spark shape is NOT a
merge_asof per group (that would funnel each key through one pandas
worker); it's the union + last_value(ignoreNulls) carry-forward:

  union(left tagged, right tagged)
  → window per key ordered by (ts, tag)
  → last(right_payload, ignoreNulls) over rows-unbounded-preceding
  → keep left rows, now annotated with the latest right row at-or-
    before their timestamp.

One shuffle on the key, one sort within partitions — the same cost
profile as any windowed analytic, and AQE handles key skew.
DuckDB twin: native ``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: per key, the latest right row with ts ≤
    left.ts (``direction='backward'``, the default) or the earliest
    right row with ts ≥ left.ts (``direction='forward'`` — the
    "next event" lookup).

    ``right_cols`` are the right-side payload columns to carry; they
    appear with ``suffix``. Left rows with no matching right row keep
    NULLs (left-outer semantics, matching DuckDB ASOF LEFT JOIN with
    the corresponding inequality). Both directions are the same
    one-shuffle union + window carry; forward just flips the carry to
    first_value over the FOLLOWING frame (and the tie order, so a
    right row AT the left timestamp is visible either way).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    lt = left.withColumn("_tag", F.lit(1))
    # Right payload columns go ONLY into the _payload struct — never as
    # top-level union columns — so a right_cols name that also exists on
    # the left can't be merged/clobbered by unionByName.
    rt = (
        right.select(
            F.col(on),
            F.col(ts_col),
            F.struct(
                F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols]
            ).alias("_payload"),
        )
        .withColumn("_tag", F.lit(0))
    )
    lt = lt.withColumn("_payload", F.lit(None).cast(rt.schema["_payload"].dataType))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    if direction == "backward":
        # Right rows sort before left rows at equal ts (_tag 0 < 1), so
        # a right row AT the left timestamp is visible (ts >= semantics).
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = F.last("_payload", ignorenulls=True).over(w)
    else:
        # Forward: left rows sort before right rows at equal ts, so the
        # following-frame first_value sees a right row AT the left ts.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col("_tag").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = F.first("_payload", ignorenulls=True).over(w)
    carried = unioned.withColumn("_last", carry)
    out = carried.filter(F.col("_tag") == 1).drop("_tag", "_payload")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_last.{c}"))
    return out.withColumn(f"{ts_col}{suffix}", F.col("_last._rts")).drop("_last")
