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
