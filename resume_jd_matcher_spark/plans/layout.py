"""Multi-dimensional data layout: Z-order (Morton) clustering.

A range-partitioned sort gives perfect file-level min/max pruning on
its leading column and none on the others; the standard fix for
two-dimensional selective scans (Delta/Iceberg ``ZORDER BY`` /
``sort_order(z...)``) is to sort by an interleaved-bit Morton code so
every file covers a small RECTANGLE of the key space and parquet
min/max stats prune on BOTH dimensions. The curve computation is one
codegen'd integer expression; the layout write is an ordinary
``repartitionByRange(zval)`` + ``sortWithinPartitions`` — no custom
partitioner, no UDF, identical at 100 TB (the range exchange samples
its bounds, every file stays bounded in both dims).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints, ``bits`` bits each:
    bit i of x lands at position 2i, bit i of y at 2i+1. Built as
    2×bits masked shifts OR-folded into one BIGINT — all JVM-side
    integer ops inside whole-stage codegen."""
    mask = (1 << bits) - 1
    xm = x.cast("bigint").bitwiseAND(F.lit(mask))
    ym = y.cast("bigint").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton code as ANSI SQL (DuckDB oracle twin) —
    generated from the same term list so the engines can't drift."""
    mask = (1 << bits) - 1
    xs = f"({x}::BIGINT & {mask})"
    ys = f"({y}::BIGINT & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the (x, y) Z-curve: files
    cover compact rectangles, so a selective scan on EITHER column
    prunes most files from footer stats alone (vs a lexicographic sort,
    which prunes only on its leading column)."""
    (
        df.withColumn("_z", zvalue(F.col(x_col), F.col(y_col), bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
