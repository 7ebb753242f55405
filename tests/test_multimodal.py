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


class TestMagicDispatch:
    def _media(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_known_signatures_detected(self, spark):
        """Hand-built payloads: PNG at offset 0, RIFF at offset 0,
        ftyp at offset 4, and a headerless blob -> unknown."""
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            MAGIC_HEX,
            magic_dispatch,
        )

        rows = [
            (1, "image", bytes.fromhex(MAGIC_HEX["image"]) + b"x"),
            (2, "audio", bytes.fromhex(MAGIC_HEX["audio"]) + b"yy"),
            (3, "video", bytes.fromhex(MAGIC_HEX["video"]) + b"zzz"),
            (4, "image", b"plain text, no header"),
        ]
        df = spark.createDataFrame(
            [(i, payload, m) for i, m, payload in rows],
            "doc_id long, media binary, modality string",
        ).select(
            "doc_id",
            "media",
            F.struct(
                F.col("modality").alias("modality"),
                F.lit("raw").alias("codec"),
                F.lit("t").alias("source"),
            ).alias("meta"),
        )
        got = {
            (r["declared"], r["detected"]): r
            for r in magic_dispatch(df).collect()
        }
        assert got[("image", "png")]["mismatch"] is False
        assert got[("audio", "riff")]["mismatch"] is False
        assert got[("video", "mp4")]["mismatch"] is False
        assert got[("image", "unknown")]["mismatch"] is True
        assert got[("image", "png")]["avg_bytes"] == 9.0

    def test_attach_media_encoded_headerless_every_7th(self, spark):
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            attach_media_encoded,
        )
        from resume_jd_matcher_spark.sources.io import load_table

        d = load_table(spark, SF, "documents").limit(30)
        m = attach_media_encoded(d)
        hdr = m.select(
            "doc_id", F.hex(F.col("media")).alias("hx")
        ).collect()
        for r in hdr:
            if r["doc_id"] % 7 == 0:
                assert not r["hx"].startswith("89504E47")
                assert not r["hx"].startswith("52494646")


class TestPayloadEntropy:
    def test_uniform_vs_constant_bytes(self, spark):
        """256 distinct bytes -> exactly 8 bits; a constant blob ->
        exactly 0 bits."""
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            payload_entropy,
        )

        rows = [
            (1, "image", bytes(range(256))),
            (2, "audio", b"\x00" * 100),
        ]
        df = spark.createDataFrame(
            [(i, payload, m) for i, m, payload in rows],
            "doc_id long, media binary, modality string",
        ).select(
            "doc_id",
            "media",
            F.struct(
                F.col("modality").alias("modality"),
                F.lit("raw").alias("codec"),
                F.lit("t").alias("source"),
            ).alias("meta"),
        )
        got = {r["modality"]: r for r in payload_entropy(df).collect()}
        assert got["image"]["avg_entropy_bits"] == 8.0
        assert got["audio"]["avg_entropy_bits"] == 0.0
        assert got["image"]["n_docs"] == 1

    def test_empty_payload_emits_no_byte_rows(self, spark):
        """r12 ADVICE: sequence(1, 0) counts DOWN in Spark, so an
        empty blob used to emit two bogus empty-substring byte rows
        (the oracle's generate_series(1, 0) is empty). An empty
        payload must contribute no rows at all — same as DuckDB."""
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            payload_entropy,
        )

        rows = [
            (1, "image", b""),
            (2, "image", bytes(range(16))),
        ]
        df = spark.createDataFrame(
            [(i, payload, m) for i, m, payload in rows],
            "doc_id long, media binary, modality string",
        ).select(
            "doc_id",
            "media",
            F.struct(
                F.col("modality").alias("modality"),
                F.lit("raw").alias("codec"),
                F.lit("t").alias("source"),
            ).alias("meta"),
        )
        got = {r["modality"]: r for r in payload_entropy(df).collect()}
        # the empty doc drops out entirely: n_docs counts only doc 2
        assert got["image"]["n_docs"] == 1
        assert got["image"]["avg_entropy_bits"] == 4.0


class TestIhdrDimensions:
    def _docs(self, spark, ids):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            [(i, f"text body {i}", "s") for i in ids],
            "doc_id long, text string, source string",
        )

    def test_golden_png_header_parse(self, spark):
        """Hand-built IHDR bytes: width 0x0102 = 258, height 0x30 =
        48 — the parse must decode multi-byte big-endian exactly."""
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            ihdr_dimensions,
        )

        blob = bytes.fromhex(
            "89504E470D0A1A0A"  # signature
            "0000000D" "49484452"  # len, 'IHDR'
            "00000102" "00000030"  # width 258, height 48
            "0806000000" "00000000"
        ) + b"payload"
        df = spark.createDataFrame(
            [(1, blob)], "doc_id long, media binary"
        ).select(
            "doc_id",
            "media",
            F.struct(
                F.lit("image").alias("modality"),
                F.lit("raw").alias("codec"),
                F.lit("t").alias("source"),
            ).alias("meta"),
        )
        [r] = ihdr_dimensions(df).collect()
        assert (r["width"], r["height"]) == (258, 48)

    def test_attach_parse_roundtrip_and_census(self, spark):
        """attach_media_with_ihdr → ihdr_dimensions must recover the
        doc_id arithmetic exactly; non-image and headerless docs drop."""
        from resume_jd_matcher_spark.operators.multimodal import (
            attach_media_with_ihdr,
            ihdr_dimensions,
        )

        ids = list(range(50))
        got = {
            r["doc_id"]: (r["width"], r["height"])
            for r in ihdr_dimensions(
                attach_media_with_ihdr(self._docs(spark, ids))
            ).collect()
        }
        want = {
            i: (16 * (1 + i % 40), 16 * (1 + i % 30))
            for i in ids
            if i % 3 == 0 and i % 7 != 0
        }
        assert got == want


class TestExtMagicQuarantine:
    def test_planted_defect_classes(self, spark):
        """All three planted classes must be quarantined: unsupported
        ext (%11), renamed file (%13, supported ext + wrong magic),
        headerless payload (%7 → unknown); clean rows pass."""
        from resume_jd_matcher_spark.operators.multimodal import (
            attach_media_encoded,
            attach_media_paths,
            ext_magic_quarantine,
        )

        docs = spark.createDataFrame(
            [(i, f"text {i}", "s") for i in range(1, 400)],
            "doc_id long, text string, source string",
        )
        rows = ext_magic_quarantine(
            attach_media_paths(attach_media_encoded(docs))
        ).collect()
        by_key = {(r["route"], r["detected"]): r for r in rows}
        # clean rows: ext agrees with magic, not quarantined
        for route, det in (("png", "png"), ("wav", "riff"), ("mp4", "mp4")):
            assert not by_key[(route, det)]["quarantined"]
        # every other (route, detected) combination is quarantined
        for (route, det), r in by_key.items():
            if (route, det) not in (
                ("png", "png"),
                ("wav", "riff"),
                ("mp4", "mp4"),
            ):
                assert r["quarantined"], (route, det)
        # the unsupported-ext arm routed to quarantine
        assert any(r["route"] == "quarantine" for r in rows)
        # the renamed-file arm: supported route, mismatched container
        assert any(
            r["route"] in ("png", "wav", "mp4")
            and r["detected"] in ("png", "riff", "mp4")
            and r["quarantined"]
            for r in rows
        )
        # totals preserved
        assert sum(r["n"] for r in rows) == 399

    def test_property_bigendian_roundtrip(self, spark):
        """Hypothesis: for arbitrary PNG dimensions (1..2^31-1,
        including values whose high bytes are non-zero), hand-built
        IHDR bytes parse back to exactly (width, height) — the
        4-byte big-endian decode is total, not just correct on the
        fixture's 16..640 range."""
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.operators.multimodal import (
            ihdr_dimensions,
        )

        @settings(max_examples=8, deadline=None)
        @given(
            w=st.integers(min_value=1, max_value=2**31 - 1),
            h=st.integers(min_value=1, max_value=2**31 - 1),
        )
        def check(w, h):
            blob = bytes.fromhex(
                "89504E470D0A1A0A"
                "0000000D" "49484452"
                + format(w, "08X")
                + format(h, "08X")
                + "0806000000" "00000000"
            )
            df = spark.createDataFrame(
                [(1, blob)], "doc_id long, media binary"
            ).select(
                "doc_id",
                "media",
                F.struct(
                    F.lit("image").alias("modality"),
                    F.lit("raw").alias("codec"),
                    F.lit("t").alias("source"),
                ).alias("meta"),
            )
            [r] = ihdr_dimensions(df).collect()
            assert (r["width"], r["height"]) == (w, h)

        check()


class TestWavFmtFields:
    def _wrap(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "doc_id long, media binary"
        ).select(
            "doc_id",
            "media",
            F.struct(
                F.lit("audio").alias("modality"),
                F.lit("raw").alias("codec"),
                F.lit("t").alias("source"),
            ).alias("meta"),
        )

    def test_golden_le_parse_and_consistency_verdict(self, spark):
        """Hand-built fmt chunk: stereo 44100 Hz 16-bit (all fields
        multi-byte LE) parses exactly; a doctored byte_rate flips
        rate_consistent to False."""
        from resume_jd_matcher_spark.operators.multimodal import (
            wav_fmt_fields,
        )

        def wav(byte_rate):
            return bytes.fromhex(
                "52494646" + "24000000" + "57415645" + "666D7420"
                + "10000000" + "0100"
                + "0200"              # channels 2, LE
                + "44AC0000"          # 44100 Hz, LE
                + byte_rate           # byte rate, LE
                + "0400"              # block align 4
                + "1000"              # bits 16
            ) + b"data"

        good = wav("10B10200")  # 44100*4 = 176400 = 0x02B110
        bad = wav("11B10200")   # off by one
        rows = wav_fmt_fields(
            self._wrap(spark, [(1, good), (2, bad)])
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        for i in (1, 2):
            assert by_id[i]["channels"] == 2
            assert by_id[i]["sample_rate_hz"] == 44100
            assert by_id[i]["bits"] == 16
        assert by_id[1]["rate_consistent"] is True
        assert by_id[2]["rate_consistent"] is False

    def test_attach_parse_roundtrip_census(self, spark):
        """attach_media_with_wav_fmt → wav_fmt_fields recovers the
        doc_id arithmetic exactly; non-audio and headerless drop."""
        from resume_jd_matcher_spark.operators.multimodal import (
            attach_media_with_wav_fmt,
            wav_fmt_fields,
        )

        docs = spark.createDataFrame(
            [(i, f"text {i}", "s") for i in range(60)],
            "doc_id long, text string, source string",
        )
        got = {
            r["doc_id"]: (
                r["channels"],
                r["sample_rate_hz"],
                r["bits"],
                r["rate_consistent"],
            )
            for r in wav_fmt_fields(attach_media_with_wav_fmt(docs)).collect()
        }
        want = {
            i: (1 + i % 2, 8000 * (1 + i % 5), 8 * (1 + i % 2), True)
            for i in range(60)
            if i % 3 == 1 and i % 7 != 0
        }
        assert got == want
