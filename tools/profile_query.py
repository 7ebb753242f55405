"""Profile registered queries: planning vs execution split, Spark job
count, and stage count — the "where does this query's wall-clock go"
companion to tools/time_query.py (guide §1: measure first).

Usage: python tools/profile_query.py [--sf DIR] [--n N] name [name...]

For each query reports (best attempt of N):
  build_s  - Python DataFrame-construction time (driver-side, no JVM jobs)
  plan_s   - analysis + optimization + physical planning (executedPlan force)
  exec_s   - noop-sink execution (includes AQE re-planning + all jobs)
  jobs     - number of Spark jobs the execution launched
  stages   - number of stages across those jobs
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from resume_jd_matcher_spark.session import get_spark
    from resume_jd_matcher_spark import queries as Q
    from resume_jd_matcher_spark.operators import dedup
    from resume_jd_matcher_spark.sources import io as src_io

    spark = get_spark("profile-query")
    sc = spark.sparkContext
    src_io.enable_scan_cache()
    src_io.warm_scan_cache(spark, args.sf)
    tracker = sc.statusTracker()

    print(f"{'query':<32} {'build_s':>8} {'plan_s':>8} {'exec_s':>8} {'total':>8} {'jobs':>5} {'stages':>7}")
    for name in args.names:
        fn = Q._REGISTRY[name].fn
        best = None
        for attempt in range(args.n):
            group = f"prof-{name}-{attempt}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            # Force analysis/optimization/physical planning only.
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            job_ids = tracker.getJobIdsForGroup(group)
            stages = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    stages += len(ji.stageIds)
            dedup.release_persisted()
            row = (t1 - t0, t2 - t1, t3 - t2, t3 - t0, len(job_ids), stages)
            if best is None or row[3] < best[3]:
                best = row
        b, p, e, t, j, s = best
        print(f"{name:<32} {b:8.3f} {p:8.3f} {e:8.3f} {t:8.3f} {j:5d} {s:7d}")
    spark.stop()


if __name__ == "__main__":
    main()
