"""Time one or more registered queries at a given sf dir (best of N).

Usage: python tools/time_query.py [--sf DIR] [--n N] name [name...]

Same measurement discipline as bench.py (noop sink, scan cache warmed,
release_persisted between runs) but scoped to a handful of queries so
plan experiments iterate in seconds, not the full 250-query sweep.
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

    spark = get_spark("time-query")
    src_io.enable_scan_cache()
    src_io.warm_scan_cache(spark, args.sf)

    for name in args.names:
        fn = Q._REGISTRY[name].fn
        best = float("inf")
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            dedup.release_persisted()
            best = min(best, dt)
            print(f"  {name}: {dt:.2f} s")
        print(f"{name}: best {best:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
