"""Multimodal columns (SURVEY.md §2.H U6; north-star multimodal ops).

Media (image/audio/video) live as opaque BINARY columns beside typed
metadata in the same table — the engine treats decode / feature
extraction / resize / frame-sampling as ``mapInPandas`` stages over
Arrow-batched bytes. The Spark-side plumbing (schema, batch shape,
partitioning) is real and tested; the codec itself is pluggable:

- ``bytestats``: dependency-free deterministic decoder (byte-level
  features) — used by tests and the oracle-checked query.
- ``pillow`` / ``soundfile`` etc.: real decoders, import-gated because
  the media libraries are not in this environment. Calling them here
  raises NotImplementedError by design (STUB, clearly marked).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("codec", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an encoded media payload, with typed metadata.
    (Real ingestion: ``spark.read.format('binaryFile')`` →
    sources/io.py scan_binary_files.)"""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            modality.alias("modality"),
            F.lit("raw").alias("codec"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_bytestats(pdf: pd.DataFrame) -> pd.DataFrame:
    blobs = pdf["media"]
    byte_len = blobs.map(len)
    first = blobs.map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "byte_len": byte_len.astype("int64"),
            "first_byte": first.astype("int32"),
            "width": (16 + byte_len % 64).astype("int32"),
            "height": (16 + (byte_len * 7) % 64).astype("int32"),
            "n_frames": (1 + first % 8).astype("int32"),
        }
    )


def decode_features(df: DataFrame, codec: str = "bytestats") -> DataFrame:
    """Decode/feature-extract stage over BINARY media. Arrow batches of
    raw bytes in, typed feature rows out; one decoder instance per
    worker. Unknown/real codecs are import-gated stubs."""
    if codec != "bytestats":
        raise NotImplementedError(
            f"codec {codec!r} requires media libraries not present in this "
            "environment; the bytestats decoder exercises the identical "
            "Spark plumbing (STUB by design)"
        )

    flat = df.select("doc_id", "media", F.col("meta.modality").alias("modality"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_bytestats(pdf)

    return flat.mapInPandas(gen, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every: int = 64) -> DataFrame:
    """Frame-sampling plumbing demo: explode each media blob into
    chunk offsets (one row per sampled "frame"), keeping lineage to
    the source row. Real video codecs plug into the same shape."""
    n = F.floor(F.length("media") / every).cast("int")
    return df.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias(
            "frame_idx", "offset_mult"
        ),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("offset_mult") * every).cast("long").alias("byte_offset"),
    )


# container magic numbers (public file-format signatures): PNG's
# 8-byte signature, RIFF's 4CC, and ISO-BMFF's 'ftyp' brand at byte
# offset 4 — enough to exercise offset-0 and offset-4 dispatch
MAGIC_HEX = {
    "image": "89504E470D0A1A0A",  # PNG
    "audio": "52494646",  # RIFF (WAV container)
    "video": "0000001866747970",  # MP4 ftyp box header
}


def attach_media_encoded(df: DataFrame, text_col: str = "text") -> DataFrame:
    """attach_media variant whose payloads carry REAL container magic
    bytes: each blob is the modality's magic prefix + the text bytes,
    except every 7th doc which ships headerless (a truncated/corrupt
    upload) so the dispatcher's 'unknown' arm is non-vacuous."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    magic = (
        F.when(F.col("doc_id") % 7 == 0, F.unhex(F.lit("")))
        .when(F.col("doc_id") % 3 == 0, F.unhex(F.lit(MAGIC_HEX["image"])))
        .when(F.col("doc_id") % 3 == 1, F.unhex(F.lit(MAGIC_HEX["audio"])))
        .otherwise(F.unhex(F.lit(MAGIC_HEX["video"])))
    )
    return df.select(
        "doc_id",
        F.concat(magic, F.encode(F.col(text_col), "utf-8")).alias("media"),
        F.struct(
            modality.alias("modality"),
            F.lit("raw").alias("codec"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def magic_dispatch(media_df: DataFrame) -> DataFrame:
    """U6/SRC4: container dispatch by MAGIC BYTES, not by declared
    metadata — the binary-column extension of the filename-extension
    dispatcher (sources/io.py format_dispatch): detect the container
    from the payload's leading bytes (PNG signature, RIFF 4CC, the
    ISO-BMFF 'ftyp' brand at offset 4) and reconcile against the
    declared modality. A declared/detected mismatch is the corrupt /
    mislabeled-upload signal ingest quarantines on.

    Pure narrow projection (one hex + prefix compares per row) — at
    100 TB this pushes down to the scan with zero shuffles before the
    tiny (|declared| x |detected|)-bounded rollup.
    Output: (declared, detected, n, avg_bytes, mismatch)."""
    hx = F.hex(F.col("media"))
    detected = (
        F.when(hx.startswith("89504E470D0A1A0A"), "png")
        .when(hx.startswith("52494646"), "riff")
        .when(F.substring(hx, 9, 8) == "66747970", "mp4")
        .otherwise("unknown")
    )
    return (
        media_df.select(
            F.col("meta.modality").alias("declared"),
            detected.alias("detected"),
            (F.length(hx) / 2).cast("bigint").alias("_bytes"),
        )
        .groupBy("declared", "detected")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("_bytes") + F.lit(1e-9), 2).alias("avg_bytes"),
        )
        .withColumn(
            "mismatch",
            (F.col("detected") == "unknown")
            | (
                F.col("declared")
                != F.when(F.col("detected") == "png", "image")
                .when(F.col("detected") == "riff", "audio")
                .otherwise("video")
            ),
        )
    )


def payload_entropy(media_df: DataFrame) -> DataFrame:
    """U6 [EXT]: byte-level Shannon entropy per modality — the
    decode-free compressed/encrypted-vs-plain screen multimodal
    ingest runs (plain text ~4-5 bits/byte, compressed media ~8;
    an 'image' blob at text entropy is a mislabel). Per doc: hex the
    payload once, explode to one row per BYTE (hex pair), one
    (doc, byte) hash agg, entropy = log2(n) - sum(c*log2(c))/n per
    doc, then the per-modality rollup. Linear in payload bytes, two
    bounded hash aggs, no joins.
    Output: (modality, n_docs, avg_entropy_bits)."""
    from resume_jd_matcher_spark.plans.optimize import ensure_parallelism

    # the per-BYTE explode multiplies rows ~300x; the documents scan
    # is a handful of splits at test sfs, which would pin the explode
    # and the (doc, byte) agg to as many cores (at real scale the scan
    # has hundreds of splits and this is a no-op)
    hexed = ensure_parallelism(
        media_df.select(
            "doc_id",
            F.col("meta.modality").alias("modality"),
            F.hex(F.col("media")).alias("_hx"),
        )
    )
    bytes_long = hexed.select(
        "doc_id",
        "modality",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.length("_hx") / 2).cast("int")),
                lambda i: F.col("_hx").substr((i - 1) * 2 + 1, F.lit(2)),
            )
        ).alias("_b"),
    )
    counts = bytes_long.groupBy("doc_id", "modality", "_b").agg(
        F.count("*").cast("double").alias("_c")
    )
    per_doc = counts.groupBy("doc_id", "modality").agg(
        (
            F.log2(F.sum("_c"))
            - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
        ).alias("_h")
    )
    return (
        per_doc.groupBy("modality")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg("_h") + F.lit(1e-9), 4).alias("avg_entropy_bits"),
        )
    )


def media_simhash_neardup(
    media_df: DataFrame,
    gram_bytes: int = 4,
    max_hamming: int = 3,
    n_bits: int = 16,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Byte-level fuzzy near-dup over BINARY media columns — the
    decode-free first-pass dedup multimodal pipelines run (the ssdeep/
    fuzzy-hash role): SimHash over sliding byte 4-grams of the raw
    payload, so re-encoded-but-mostly-identical blobs pair without any
    media library in the loop.

    The blob is hexed once (native, codegen'd) and grams are substring
    slices of the hex string; fingerprinting and the banded candidate
    join reuse the text SimHash core (operators/dedup.py:
    simhash_from_tokens / simhash_pairs) — identical scale shape:
    per-(doc, gram) md5 with count weighting, map-side-combined
    bitsums, (band_id, band_val) equi-join candidates, popcount
    verify. Output: (left_id, right_id, hamming).
    """
    from resume_jd_matcher_spark.operators.dedup import (
        simhash_from_tokens,
        simhash_pairs,
    )
    from resume_jd_matcher_spark.operators import dedup as _dedup

    hexed = media_df.select(
        F.col(id_col), F.hex(F.col(media_col)).alias("hx")
    )
    width = 2 * gram_bytes
    n_grams = (F.length("hx") - width) / 2 + 1  # sliding by one byte
    grams = hexed.select(
        id_col,
        F.explode(
            F.when(
                F.length("hx") >= width,
                F.transform(
                    F.sequence(F.lit(0), n_grams.cast("int") - 1),
                    lambda i: F.col("hx").substr(i * 2 + 1, F.lit(width)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("tok"),
    )
    sh = simhash_from_tokens(grams, n_bits, id_col).persist()
    _dedup._PERSISTED.append(sh)
    return simhash_pairs(sh, max_hamming, n_bits, id_col)
