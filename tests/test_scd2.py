"""SCD2 merge emulation (anti-join + union, no lakehouse MERGE)."""

from __future__ import annotations

import datetime as dt

from resume_jd_matcher_spark.operators.relational import scd2_merge


def _ts(d):
    return dt.datetime(2024, 1, d)


def test_scd2_merge(spark):
    current = spark.createDataFrame(
        [
            # key, tracked attr, effective_ts, end_ts(None=open)
            (1, "gold", _ts(1), None),
            (2, "silver", _ts(1), None),
            (3, "bronze", _ts(1), None),
            (1, "silver", _ts(0 + 1), _ts(1)),  # already-closed history row
        ],
        ["cust_id", "tier", "effective_ts", "end_ts"],
    )
    updates = spark.createDataFrame(
        [
            (1, "platinum", _ts(5)),  # change → close + new version
            (2, "silver", _ts(5)),    # no change → untouched
        ],
        ["cust_id", "tier", "effective_ts"],
    )
    out = scd2_merge(current, updates, "cust_id", ["tier"])
    rows = {(r.cust_id, r.tier, r.end_ts) for r in out.collect()}

    assert (1, "gold", _ts(5)) in rows          # closed at update ts
    assert (1, "platinum", None) in rows        # new open version
    assert (2, "silver", None) in rows          # unchanged stays open
    assert (3, "bronze", None) in rows          # no update row
    assert (1, "silver", _ts(1)) in rows        # history preserved
    assert out.count() == 5
    # exactly one open row per key
    opens = out.filter("end_ts IS NULL").groupBy("cust_id").count().collect()
    assert all(r["count"] == 1 for r in opens)
