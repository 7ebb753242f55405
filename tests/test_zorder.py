"""Z-order layout (plans/layout.py): curve correctness and the
two-dimensional file-pruning property the layout exists for."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from resume_jd_matcher_spark.plans.layout import zorder_write, zvalue
from resume_jd_matcher_spark.sources.io import load_table

SF = "/root/testdata/sf0.01"


def test_zvalue_interleaves_bits(spark):
    """Hand-checked Morton codes: z(x, y) interleaves x at even and y
    at odd bit positions."""
    rows = spark.range(1).select(
        zvalue(F.lit(0), F.lit(0)).alias("z00"),
        zvalue(F.lit(1), F.lit(0)).alias("z10"),
        zvalue(F.lit(0), F.lit(1)).alias("z01"),
        zvalue(F.lit(3), F.lit(5)).alias("z35"),
        zvalue(F.lit(65535), F.lit(65535)).alias("zmax"),
    ).collect()[0]
    assert rows["z00"] == 0
    assert rows["z10"] == 1
    assert rows["z01"] == 2
    # x=3 (011) -> bits 0,2; y=5 (101) -> bits 1,5 => 0b100111 = 39
    assert rows["z35"] == 0b100111
    assert rows["zmax"] == (1 << 32) - 1


def _file_spans(path: str, col_expr: str) -> list[tuple[float, float]]:
    import glob

    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        lo, hi = duckdb.sql(
            f"SELECT min({col_expr}), max({col_expr}) FROM '{f}'"
        ).fetchone()
        spans.append((float(lo), float(hi)))
    return spans


def test_zorder_prunes_both_dims(spark, tmp_path):
    """Z-order files cover compact RECTANGLES: the mean per-file span
    on the secondary dimension collapses vs a lexicographic
    (user_id, value) sort, while the primary dimension stays bounded
    too — the property that lets parquet min/max stats prune a
    selective scan on EITHER column."""
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "lex")
    n_files = 16
    zorder_write(ev, zpath, "user_id", "value", n_files=n_files)
    (
        ev.repartitionByRange(n_files, "user_id", "value")
        .sortWithinPartitions("user_id", "value")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def mean_span(spans):
        return sum(hi - lo for lo, hi in spans) / len(spans)

    z_y = mean_span(_file_spans(zpath, "floor(value)"))
    l_y = mean_span(_file_spans(lpath, "floor(value)"))
    z_x = mean_span(_file_spans(zpath, "user_id"))
    # lexicographic: each file spans nearly the full value range;
    # z-order: a fraction of it.
    assert z_y < 0.5 * l_y, (z_y, l_y)
    # the primary dim stays far below the full 0..149 user range.
    assert z_x < 100, z_x

    # and the data survives the layout unchanged
    assert (
        spark.read.parquet(zpath).count()
        == ev.count()
        == spark.read.parquet(lpath).count()
    )
