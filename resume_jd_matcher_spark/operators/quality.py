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


def classifier_weights(spark, n_buckets: int = 256) -> DataFrame:
    """Deterministic hashed-feature weight table for the linear
    quality classifier: bucket j -> weight in [-1, 1] derived from the
    portable hash (stands in for trained fastText/logistic weights —
    the CONTRACT under test is the scoring dataflow, not accuracy,
    exactly like language_id's marker heuristic). n_buckets rows —
    always broadcastable; a real trained model loads the same shape.
    """
    from resume_jd_matcher_spark.functions.text import hash32

    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (
            ((hash32(F.concat(F.lit("qw#"), F.col("id").cast("string"))) % 2001)
             - F.lit(1000)).cast("double")
            / F.lit(1000.0)
        ).alias("weight"),
    )


def quality_classifier(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 256,
    bias: float = -0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style hashed bag-of-words linear quality classifier
    (the model-based quality filter of the GPT-3/LLaMA data pipelines,
    public papers): tokens hash into ``n_buckets`` feature buckets,
    the document logit is bias + mean bucket weight, probability is
    the logistic sigmoid.

    Scale shape: one explode → broadcast equi-join on the bucket id
    (the model table is tiny by construction) → ONE map-side-combined
    per-doc mean. No corpus-wide shuffle beyond the per-doc agg; a
    384-dim trained model swaps in by replacing the weights table.

    Output: (id, n_tokens, logit, prob, keep) — floats rounded
    in-query; keep = prob > 0.5.
    """
    from resume_jd_matcher_spark.functions.text import hash32, tokens

    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).select(id_col, (hash32(F.col("tok")) % n_buckets).cast("int").alias("bucket"))
    scored = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            (F.sum("weight") / F.count("*") + F.lit(bias)).alias("logit_raw"),
        )
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit_raw")))
    eps = F.lit(1e-9)
    return scored.select(
        id_col,
        "n_tokens",
        F.round(F.col("logit_raw") + eps, 6).alias("logit"),
        F.round(prob + eps, 6).alias("prob"),
        (prob > 0.5).cast("int").alias("keep"),
    )


def embedding_outliers(
    df: DataFrame,
    z_threshold: float = 2.0,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier screen: per-label centroid, per-vector
    squared distance to its centroid, per-label z-score of that
    distance, flag |z| beyond the threshold — the cheap "mislabeled /
    garbage embedding" detector run before ANN index builds.

    Determinism contract: centroid dim-means are rounded (6 dp) BEFORE
    the distance computation and distances rounded (4 dp) before the
    z-score, so cross-engine float-sum ordering differences are
    quenched at each stage boundary (same staging mirrored in the
    oracle).

    Scale shape: long-form explode → (label, dim) hash agg for
    centroids (shuffle = labels × dims compact rows); the centroid
    table broadcasts into the dim-stream equi-join; per-vector sum and
    per-label moments are map-side-combined hash aggs. No window, no
    pairwise join.
    """
    dims = df.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )
    cents = dims.groupBy(label_col, "dim").agg(
        F.round(F.avg("x") + F.lit(1e-12), 6).alias("m")
    )
    d2 = (
        dims.join(F.broadcast(cents), [label_col, "dim"])
        .groupBy(id_col, label_col)
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))
                + F.lit(1e-9),
                4,
            ).alias("d2")
        )
    )
    stats = d2.groupBy(label_col).agg(
        F.avg("d2").alias("mu"), F.stddev_samp("d2").alias("sd")
    )
    z = (F.col("d2") - F.col("mu")) / F.col("sd")
    return (
        d2.join(F.broadcast(stats), label_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            F.col("d2"),
            F.round(z + F.lit(1e-9), 3).alias("z"),
            (F.abs(z) > F.lit(z_threshold)).cast("int").alias("is_outlier"),
        )
    )
