"""Dump .explain("formatted") of registered queries to files — the
before/after plan artifacts for optimization rounds (plans/r{N}/).

Usage: python tools/dump_plan.py --out plans/r13 --suffix _before [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from resume_jd_matcher_spark.session import get_spark
    from resume_jd_matcher_spark import queries as Q
    from resume_jd_matcher_spark.operators import dedup
    from resume_jd_matcher_spark.sources import io as src_io

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("dump-plan")
    for name in args.names:
        df = Q._REGISTRY[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        dedup.release_persisted()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
