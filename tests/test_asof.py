"""As-of join semantics on crafted timelines."""

from __future__ import annotations

import datetime as dt

from resume_jd_matcher_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, _ts(5), "L5"), (2, _ts(3), "L3")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 100), (1, _ts(10), 200), (1, _ts(11), 300), (2, _ts(9), 400)],
        ["k", "ts", "rv"],
    )
    out = asof_join(left, right, on="k", ts_col="ts", right_cols=("rv",))
    got = {(r.k, r.lv): (r.rv_asof) for r in out.collect()}
    assert got[(1, "L5")] == 100       # latest right at ts<=5 is ts=4
    assert got[(1, "L10")] == 200      # ties (ts == 10) are visible
    assert got[(2, "L3")] is None      # no prior right row → NULL


def test_asof_right_col_name_collision_keeps_left(spark):
    """A right payload column whose name also exists on the left must
    not clobber the left data: left's `v` survives, right's arrives as
    `v_asof`."""
    left = spark.createDataFrame(
        [(1, _ts(10), "left-v")], ["k", "ts", "v"]
    )
    right = spark.createDataFrame(
        [(1, _ts(4), "right-v")], ["k", "ts", "v"]
    )
    out = asof_join(left, right, on="k", ts_col="ts", right_cols=("v",))
    row = out.collect()[0]
    assert row.v == "left-v"
    assert row.v_asof == "right-v"


def test_asof_forward_direction(spark):
    """direction='forward': the EARLIEST right row at-or-after each
    left ts; equal-ts right rows are visible; nothing after -> NULL."""
    left = spark.createDataFrame(
        [(1, _ts(5), "L5"), (1, _ts(10), "L10"), (1, _ts(12), "L12")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 100), (1, _ts(10), 200), (1, _ts(11), 300)],
        ["k", "ts", "rv"],
    )
    out = asof_join(
        left, right, on="k", ts_col="ts", right_cols=("rv",),
        direction="forward",
    )
    got = {r.lv: r.rv_asof for r in out.collect()}
    assert got["L5"] == 200   # next right at ts>=5 is ts=10
    assert got["L10"] == 200  # equal-ts right visible forward too
    assert got["L12"] is None # nothing at-or-after -> NULL
