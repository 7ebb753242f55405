"""Repetition-based quality filters (north-star text-analysis ops;
the Gopher/MassiveText repetition rules, Rae et al. 2021 §A1.1).

A large crawl corpus contains degenerate documents — boilerplate
loops, keyword stuffing, templated spam — whose n-gram statistics are
wildly repetitive even when exact/near dedup passes them (repetition
is INTRA-document; dedup is INTER-document). The standard filters
measure, per document, (a) the coverage of the single most frequent
n-gram and (b) the coverage of all n-grams that occur more than once,
and drop documents past fixed thresholds.

All native expressions: token n-grams come from one
``transform(sequence(...))`` over the token array, counts from an
explode → (doc, gram) hash agg (map-side combined — the shuffle
carries one row per distinct gram per partition, never raw text).
Parallelism is per-document; nothing in the plan holds more than one
document's grams in a single aggregation buffer, so the plan scales
to 100 TB corpora unchanged.

Deviation from the paper, documented: the paper measures CHARACTER
coverage; we measure TOKEN coverage (count × n / n_tokens). Token
coverage is tokenizer-stable and avoids the ambiguity of overlapping
character spans, and thresholds translate 1:1 for whitespace tokens.
The duplicate-coverage stat sums count × n over grams with count ≥ 2
(overlap-unaware, like the paper's duplicate-n-gram rule), so values
above 1.0 are possible for pathologically repetitive documents — the
filter only cares about the threshold crossing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import tokens

# Gopher's published thresholds for the two rules we expose
# (top 2-gram char fraction > 0.20 → drop; dup 3-gram char
# fraction > 0.18 → drop in the paper's family of rules).
TOP_BIGRAM_MAX = 0.20
DUP_TRIGRAM_MAX = 0.18


def _grams(tok_arr: Column, n: int) -> Column:
    """All (overlapping) space-joined token n-grams, NOT distinct —
    repetition stats need multiplicities, unlike dedup shingles."""

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(tok_arr, i + j) for j in range(n)])

    idx = F.sequence(F.lit(1), F.size(tok_arr) - (n - 1))
    # sequence(1, 0) counts DOWN in Spark — guard docs shorter than n.
    return F.when(F.size(tok_arr) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigram_max: float = TOP_BIGRAM_MAX,
    dup_trigram_max: float = DUP_TRIGRAM_MAX,
) -> DataFrame:
    """Per-document repetition features + keep/drop verdict.

    Output: (id, n_tokens, top_bigram_cnt, top_bigram_frac,
    dup_trigram_frac, keep) where

    - ``top_bigram_frac``  = max-count 2-gram's token coverage
      (cnt × 2 / n_tokens),
    - ``dup_trigram_frac`` = token coverage of 3-grams with count ≥ 2
      (Σ cnt × 3 / n_tokens),
    - ``keep`` = 1 iff both are at or under their thresholds.

    Single-pass plan: the corpus is tokenized ONCE into a projected
    column, bigrams and trigrams are built from that shared array and
    exploded together (tagged with their n), and both stats come out
    of one (id, n, gram) hash agg followed by one per-id conditional
    agg — no joins, no second tokenization (the round-4 version
    re-tokenized per gram pass and was 4× slower). ``explode_outer``
    keeps gram-less (short/empty) documents alive; their ratios
    degrade to NULL (→ drop) rather than dividing by zero under ANSI
    mode.
    """
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    tagged = F.concat(
        F.transform(
            _grams(F.col("_toks"), 2),
            lambda g: F.struct(F.lit(2).alias("gn"), g.alias("gram")),
        ),
        F.transform(
            _grams(F.col("_toks"), 3),
            lambda g: F.struct(F.lit(3).alias("gn"), g.alias("gram")),
        ),
    )
    exploded = toks.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.explode_outer(tagged).alias("_g"),
    )
    cnts = exploded.groupBy(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("_g.gn").alias("gn"),
        F.col("_g.gram").alias("gram"),
    ).agg(F.count("*").alias("cnt"))
    stats = cnts.groupBy(id_col, "n_tokens").agg(
        F.max(F.when(F.col("gn") == 2, F.col("cnt"))).alias("top_bigram_cnt"),
        F.sum(
            F.when((F.col("gn") == 3) & (F.col("cnt") >= 2), F.col("cnt") * 3)
        ).alias("dup_tri_toks"),
    )
    safe_n = F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0))
    eps = F.lit(1e-9)  # same .5-boundary nudge as text_quality
    # coalesce BEFORE the ratio: a doc with <2 tokens has no bigram
    # count at all, and a NULL fraction would poison `keep` to NULL.
    top_frac = F.round(
        F.coalesce(F.col("top_bigram_cnt"), F.lit(0)) * 2 / safe_n + eps, 4
    )
    dup_frac = F.round(
        F.coalesce(F.col("dup_tri_toks"), F.lit(0)) / safe_n + eps, 4
    )
    return (
        stats.select(
            F.col(id_col),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("top_bigram_cnt"), F.lit(0))
            .cast("int")
            .alias("top_bigram_cnt"),
            top_frac.alias("top_bigram_frac"),
            dup_frac.alias("dup_trigram_frac"),
            (
                (top_frac <= top_bigram_max) & (dup_frac <= dup_trigram_max)
            )
            .cast("int")
            .alias("keep"),
        )
    )
