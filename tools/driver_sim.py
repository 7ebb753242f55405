"""Simulate the driver's verify pass against the public contract:

1. smoke: ``entry(spark)`` on sf0.001 → rows >= 0, stable schema
2. correctness: every ``queries()[name]`` at sf0.01 vs ``oracle_sql()[name]``
   on DuckDB (row-count + schema + order-insensitive value compare)
3. prints a CORRECTNESS-style JSON summary

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])  # optional query-name filter: run just these
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_match(s, d) -> str | None:
    if len(s) != len(d):
        return f"rowcount {len(s)} != {len(d)}"
    if sorted(s.columns) != sorted(d.columns):
        return f"columns {sorted(s.columns)} != {sorted(d.columns)}"
    s, d = canon(s), canon(d)
    for c in s.columns:
        for i, (a, b) in enumerate(zip(s[c].tolist(), d[c].tolist())):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                    return f"col {c} row {i}: {a!r} != {b!r}"
            elif str(a) != str(b):
                return f"col {c} row {i}: {a!r} != {b!r}"
    return None


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from resume_jd_matcher_spark.operators import dedup
    from resume_jd_matcher_spark.session import get_spark

    spark = get_spark("driver-sim")

    def cache_leak() -> bool:
        """True if any explicit DataFrame persist is still live.

        Explicit ``persist()`` goes through the session CacheManager;
        ``localCheckpoint`` does not (RDD-level, cleaned asynchronously
        by the ContextCleaner once the Python ref dies) — so
        CacheManager emptiness is exactly the sweep invariant the r9
        verdict asked to pin: no query leaves cached blocks behind
        after its action + the release call every sweep owes
        (bench.py has always made it; this sim now matches)."""
        return not spark._jsparkSession.sharedState().cacheManager().isEmpty()

    smoke = entrymod.entry(spark)
    smoke_rows = smoke.count()
    print(f"smoke: entry() rows={smoke_rows} schema={smoke.schema.simpleString()}")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, str] = {}
    leakers: list[str] = []
    for name, fn in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK_ERROR: {e}"
            continue
        finally:
            # Every query owes its caches back after its action.
            dedup.release_persisted()
            if cache_leak():
                leakers.append(name)
                spark.catalog.clearCache()  # don't double-bill the next query
        if name not in oracles:
            results[name] = f"rows_only: {len(spark_pdf)} rows"
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        err = values_match(spark_pdf, duck_pdf)
        # embed the row count: a MATCH on the EMPTY set certifies
        # nothing (the r8 kaplan_meier lesson) — the registry-ledger
        # invariant needs per-query row evidence, so artifacts built
        # from this output carry "MATCH: N rows", not a bare verdict.
        results[name] = (
            f"MATCH: {len(spark_pdf)} rows"
            if err is None
            else f"MISMATCH: {err}"
        )

    n_match = sum(1 for v in results.values() if v.startswith("MATCH"))
    n_bad = sum(1 for v in results.values() if v.startswith(("MISMATCH", "SPARK_ERROR", "ORACLE_ERROR")))
    print(json.dumps(results, indent=2))
    if leakers:
        print(f"CACHE_LEAK: {len(leakers)} queries left explicit persists behind: {leakers}")
    print(f"TOTAL: {len(results)} queries, {n_match} oracle-match, {n_bad} failing")
    spark.stop()
    sys.exit(1 if (n_bad or leakers) else 0)


if __name__ == "__main__":
    main()
