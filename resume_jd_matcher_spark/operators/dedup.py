"""Deduplication operators (SURVEY.md §2.C V8; north-star dedup suite):
exact, MinHash+LSH, SimHash, n-gram Jaccard. Embedding-distance
near-dup lives in operators/similarity*.py (it shares the vector path).

All hashing uses the portable md5-derived ``hash32`` so every stage is
reproducible in the DuckDB oracle — no RNG, no JVM-specific hashes.

Scale notes:
- exact dedup: one hash-aggregate on the fingerprint — the cheapest
  possible shuffle key (32 hex chars), map-side combined.
- MinHash/LSH: signatures are a groupBy over (doc, seed) partials;
  candidate generation is an equi-join on (band_id, band_sig) —
  Catalyst hash-partitions it, so candidate volume (not corpus²)
  drives cost. This is the textbook replacement for the O(N²)
  Jaccard join.
- SimHash: one groupBy per (doc, bit) then a bit-packed aggregate;
  near-dup = self-join with popcount(xor) ≤ r, bounded via banding
  on the high bits if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import (
    fingerprint_md5,
    seeded_hash32,
    tokens,
)

# DataFrames persisted by operators in this module (MinHash signatures
# feed three consumers, so they cache). Long-lived sessions — bench
# loops, services — call release_persisted() after materializing a
# result so storage memory doesn't accumulate across queries.
_PERSISTED: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist every DataFrame this module cached. Safe to call at
    any time; lazily-recomputed plans stay correct (just slower)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """V8 exact: group by normalized-text fingerprint; keep the lowest
    id as representative (deterministic), count members.

    Output: (fingerprint, rep_doc_id, n_dups).
    """
    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(f"rep_{id_col}"),
            F.count("*").alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Long-form MinHash signatures over distinct word tokens:
    (id, seed, mh) with mh = min over tokens of hash32(token '#' seed).

    Long form keeps the whole computation as two narrow shuffles
    (explode → groupBy) instead of a per-row Python loop.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    )
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return (
        toks.select(id_col, "tok", F.explode(seeds).alias("seed"))
        .select(
            id_col,
            "seed",
            seeded_hash32(F.col("tok"), F.col("seed")).alias("hv"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("hv").alias("mh"))
    )


def lsh_bands(
    sigs: DataFrame, rows_per_band: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Fold signature rows into per-band keys: band_sig = '-'-joined
    minhashes of the band's seeds (ordered by seed)."""
    return (
        sigs.withColumn("band_id", F.expr(f"seed div {rows_per_band}"))
        .groupBy(id_col, "band_id")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup candidates with estimated Jaccard:
    same-band pairs (id1 < id2), est_jaccard = fraction of equal
    signature components. Output: (left_id, right_id, est_jaccard).
    """
    # Signatures feed three consumers (banding + both sides of the
    # estimate join); persist so the explode→groupBy runs once, not 3×.
    # Tracked in _PERSISTED for explicit release by long-lived callers.
    sigs = minhash_signatures(df, n_hashes, id_col, text_col).persist()
    _PERSISTED.append(sigs)
    bands = lsh_bands(sigs, rows_per_band, id_col)

    a = bands.select(
        F.col(id_col).alias("left_id"), "band_id", "band_sig"
    )
    b = bands.select(
        F.col(id_col).alias("right_id"), "band_id", "band_sig"
    )
    cand = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )

    sa = sigs.select(
        F.col(id_col).alias("left_id"), F.col("seed"), F.col("mh").alias("mh_a")
    )
    sb = sigs.select(
        F.col(id_col).alias("right_id"), F.col("seed"), F.col("mh").alias("mh_b")
    )
    return (
        cand.join(sa, "left_id")
        .join(sb, ["right_id", "seed"])
        .groupBy("left_id", "right_id")
        .agg(
            F.round(
                F.avg(F.when(F.col("mh_a") == F.col("mh_b"), 1.0).otherwise(0.0)), 4
            ).alias("est_jaccard")
        )
    )


def simhash(
    df: DataFrame,
    n_bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash fingerprint: per token occurrence, hash32 → each of
    n_bits contributes +1/-1; fingerprint bit = sign of the sum.
    Output: (id, simhash BIGINT).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hv = toks.select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("hv"),
    )
    bits = hv.select(
        id_col,
        "hv",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
    ).select(
        id_col,
        "bit",
        F.when(F.expr("(hv >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
    )
    per_bit = bits.groupBy(id_col, "bit").agg(F.sum("s").alias("bitsum"))
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("bitsum") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_neardup(
    df: DataFrame,
    max_hamming: int = 3,
    n_bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: popcount(xor) ≤ max_hamming, id1 < id2.
    Output: (left_id, right_id, hamming INT)."""
    sh = simhash(df, n_bits, id_col, text_col)
    a = sh.select(F.col(id_col).alias("left_id"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("right_id"), F.col("simhash").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("left_id") < F.col("right_id"))
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def ngram_jaccard_join(
    df: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-shingle Jaccard over all pairs (id1 < id2) — the
    ground-truth near-dup measure MinHash approximates. O(N²); bound
    the input or use minhash_lsh_candidates at scale.
    Output: (left_id, right_id, jaccard)."""
    from resume_jd_matcher_spark.functions.text import shingles

    sh = df.select(
        F.col(id_col),
        shingles(tokens(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col(id_col).alias("left_id"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("right_id"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("left_id") < F.col("right_id"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.select(
            "left_id",
            "right_id",
            F.round(inter.cast("double") / union.cast("double"), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") > min_jaccard)
    )
