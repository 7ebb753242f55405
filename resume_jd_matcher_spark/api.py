"""User-facing SQL surface: register the fixture tables as temp views
so the whole engine is reachable from ``spark.sql`` as well as the
DataFrame operators (SURVEY.md goal: DataFrame / SQL parity).

Example::

    from resume_jd_matcher_spark.api import register_tables
    register_tables(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT lang, count(*) FROM documents GROUP BY lang")

Views are plain parquet scans — every Catalyst optimization (pushdown,
pruning, AQE) applies to SQL exactly as to the DataFrame API; the two
front-ends share one plan space.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from resume_jd_matcher_spark.sources.io import TABLES, load_table


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every fixture table as a (optionally prefixed) temp
    view. Returns the view names registered."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
