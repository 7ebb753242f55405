"""SRC1-SRC8: file scans, format dispatch, page concat, parquet sink."""

from __future__ import annotations

import os

from resume_jd_matcher_spark.sources.io import (
    concat_pages,
    format_dispatch,
    scan_binary_files,
    scan_text_files,
    write_parquet,
)


def test_text_scan_whole_files(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("txts")
    (d / "a.txt").write_text("hello\nworld")
    (d / "b.txt").write_text("resume body")
    df = scan_text_files(spark, str(d))
    rows = {os.path.basename(r.path): r.text for r in df.collect()}
    assert rows["a.txt"] == "hello\nworld"
    assert rows["b.txt"] == "resume body"


def test_binary_scan(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    (d / "x.pdf").write_bytes(b"%PDF-1.4 fake")
    df = scan_binary_files(spark, str(d))
    row = df.collect()[0]
    assert bytes(row.content).startswith(b"%PDF")
    assert row.length == len(b"%PDF-1.4 fake")


def test_format_dispatch_quarantines_unknown(spark):
    df = spark.createDataFrame(
        [("a/r1.PDF",), ("b/r2.docx",), ("c/r3.txt",), ("d/r4.exe",), ("e/noext",)],
        ["path"],
    )
    got = {r.path: r.route for r in format_dispatch(df).collect()}
    assert got == {
        "a/r1.PDF": "pdf",
        "b/r2.docx": "docx",
        "c/r3.txt": "txt",
        "d/r4.exe": "quarantine",
        "e/noext": "quarantine",
    }


def test_concat_pages_restores_order(spark):
    pages = spark.createDataFrame(
        [(1, 2, "second"), (1, 1, "first"), (1, 3, "third"), (2, 1, "solo")],
        ["doc_id", "page", "text"],
    )
    got = {r.doc_id: r.text for r in concat_pages(pages).collect()}
    assert got == {1: "first\nsecond\nthird", 2: "solo"}


def test_parquet_sink_roundtrip(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sink") / "out")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    write_parquet(df, d, partition_by=["v"])
    back = spark.read.parquet(d)
    assert sorted(map(tuple, back.select("k", "v").collect())) == [(1, "a"), (2, "b")]
