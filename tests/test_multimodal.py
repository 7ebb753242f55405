"""U6 multimodal plumbing: schema, determinism, stubbed codecs."""

from __future__ import annotations

import pytest

from resume_jd_matcher_spark.operators.multimodal import (
    attach_media,
    decode_features,
    sample_frames,
)
from resume_jd_matcher_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_media_schema(spark):
    m = attach_media(load_table(spark, SF, "documents"))
    assert dict(m.dtypes)["media"] == "binary"
    assert "struct" in dict(m.dtypes)["meta"]


def test_decode_deterministic(spark):
    m = attach_media(load_table(spark, SF, "documents"))
    a = sorted(map(tuple, decode_features(m).collect()))
    b = sorted(map(tuple, decode_features(m).collect()))
    assert a == b
    row = a[0]
    assert row[2] > 0  # byte_len
    assert 16 <= row[4] < 80  # width in range


def test_real_codec_is_stubbed(spark):
    m = attach_media(load_table(spark, SF, "documents"))
    with pytest.raises(NotImplementedError):
        decode_features(m, codec="pillow")


def test_sample_frames_lineage(spark):
    m = attach_media(load_table(spark, SF, "documents"))
    f = sample_frames(m, every=64)
    assert f.filter("byte_offset % 64 != 0").count() == 0
    assert f.select("doc_id").distinct().count() == m.count()


def test_media_binary_neardup_pairs_near_identical_blobs(spark):
    """Two payloads differing by one byte in the middle pair at a tiny
    hamming distance; an unrelated payload pairs with neither."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.operators.multimodal import (
        media_simhash_neardup,
    )

    base = bytes(range(200)) * 4
    near = bytearray(base)
    near[400] = 0xFF
    other = bytes(reversed(range(256))) * 3
    df = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, other)],
        "doc_id long, media binary",
    )
    got = media_simhash_neardup(df, max_hamming=3).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in got}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
