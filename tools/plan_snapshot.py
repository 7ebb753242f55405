"""Snapshot coarse plan-shape features of every registered query to
PLAN_SNAPSHOT.json — join strategies, exchange count, Python stages,
window count. Diffing snapshots across rounds catches silent plan
regressions (a broadcast that became a shuffle, a new Python stage in
a native path) that timing noise would hide.

    python tools/plan_snapshot.py            # write snapshot
    python tools/plan_snapshot.py --diff     # compare current vs saved
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "PLAN_SNAPSHOT.json")

FEATURES = {
    "broadcast_hash_join": r"BroadcastHashJoin",
    "sort_merge_join": r"SortMergeJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "bnl_join": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "exchange": r"\bExchange\b",
    "python_stage": r"MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas",
    "window": r"\bWindow \[",
    "sort": r"\bSort \[",
    "take_ordered": r"TakeOrderedAndProject",
}


def snapshot() -> dict:
    from resume_jd_matcher_spark import queries as Q
    from resume_jd_matcher_spark.session import get_spark

    spark = get_spark("plan-snapshot")
    shapes: dict[str, dict[str, int]] = {}
    for name, qd in sorted(Q._REGISTRY.items()):
        try:
            plan = (
                qd.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as e:  # noqa: BLE001
            shapes[name] = {"error": 1, "msg": str(e)[:100]}
            continue
        shapes[name] = {
            k: len(re.findall(pat, plan)) for k, pat in FEATURES.items()
        }
    spark.stop()
    return shapes


def main() -> None:
    cur = snapshot()
    if "--diff" in sys.argv:
        with open(OUT) as f:
            old = json.load(f)
        changed = {
            n: {"was": old.get(n), "now": cur[n]}
            for n in cur
            if old.get(n) != cur[n]
        }
        gone = sorted(set(old) - set(cur))
        print(json.dumps({"changed": changed, "removed": gone}, indent=2))
        sys.exit(1 if changed or gone else 0)
    with open(OUT, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
    print(f"wrote PLAN_SNAPSHOT.json ({len(cur)} queries)")


if __name__ == "__main__":
    main()
