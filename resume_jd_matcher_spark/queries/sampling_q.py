"""Training-data prep queries (north-star [EXT]): deterministic
splits, balancing, packing, PII redaction over `documents`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resume_jd_matcher_spark.operators import sampling
from resume_jd_matcher_spark.queries import register
from resume_jd_matcher_spark.queries.text_q import SQL_HASH32, SQL_TOKS
from resume_jd_matcher_spark.sources.io import load_table


@register(
    "train_test_split",
    f"""
WITH s AS (
  SELECT lang,
         CASE WHEN {SQL_HASH32.format(c='doc_id::VARCHAR')} % 10 < 8 THEN 'train'
              WHEN {SQL_HASH32.format(c='doc_id::VARCHAR')} % 10 < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split, count(*)::BIGINT AS n_docs
FROM s GROUP BY lang, split
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (stable under
    repartitioning and corpus appends), summarized per language."""
    d = sampling.train_test_split(load_table(spark, sf_dir, "documents"))
    return d.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))


@register(
    "cap_per_source",
    """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 10
""",
)
def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data balancing: keep at most 10 documents per source
    (deterministic order, not sampling)."""
    return sampling.cap_per_group(
        load_table(spark, sf_dir, "documents"), group_col="source", cap=10
    ).select("doc_id", "source")


@register(
    "pack_token_budget",
    f"""
WITH t AS (
  SELECT doc_id, lang, len({SQL_TOKS.format(c='text')}) AS n_tokens
  FROM documents
), r AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM t
)
SELECT doc_id, lang, n_tokens::INT AS n_tokens,
       ((running - 1) // 2000)::BIGINT AS bin_id
FROM r
""",
)
def q_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: running per-language token cumsum assigns each
    document to a ~2000-token training bin."""
    return sampling.pack_token_budget(
        load_table(spark, sf_dir, "documents"), budget=2000
    )


@register(
    "pii_redact",
    """
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id
                   || '@example.com or https://docs.example.com/d/' || doc_id
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT AS n_emails,
       len(regexp_extract_all(text, 'https?://[^\\s]+'))::INT AS n_urls,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         'https?://[^\\s]+', '<URL>', 'g') AS redacted
FROM seeded
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene: deterministic email/URL injection on every 5th doc
    (fixture text contains none), then codegen'd regex count + redact."""
    d = load_table(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or https://docs.example.com/d/"),
                F.col("doc_id"),
            ),
        ).otherwise(F.col("text")),
    )
    return sampling.redact_pii(seeded)


@register(
    "corpus_clean_pipeline",
    f"""
WITH t AS (
  SELECT doc_id, lang, text,
         {SQL_TOKS.format(c='text')} AS toks,
         length(text) AS nc,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), scored AS (
  SELECT doc_id, lang, fp,
         len(toks) AS ntok,
         len(list_filter(toks, x -> x IN ('a','the','and','of','to','in','is')))::DOUBLE
           / nullif(len(toks), 0) AS stop_r,
         len(regexp_extract_all(text, '[0-9]'))::DOUBLE / nullif(nc, 0) AS digit_r
  FROM t
), quality AS (
  SELECT doc_id, lang, fp, ntok,
         0.5 * least(ntok::DOUBLE / 100.0, 1.0)
       + 0.3 * (1.0 - least(stop_r * 2.0, 1.0))
       + 0.2 * (1.0 - least(digit_r * 10.0, 1.0)) AS q
  FROM scored
), deduped AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS dup_rn
  FROM quality
), kept AS (
  SELECT * FROM deduped
  WHERE dup_rn = 1 AND q >= 0.5 AND ntok BETWEEN 20 AND 1000
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(ntok)::BIGINT AS total_tokens,
       round(avg(q) + 1e-9, 4) AS avg_quality
FROM kept GROUP BY lang
""",
)
def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleaning pipeline in one declarative plan:
    quality scoring → exact dedup (keep lowest id per fingerprint) →
    quality/length filters → per-language corpus stats. One scan, two
    shuffles (fingerprint window + final agg) — the shape a 100 TB
    cleaning job wants: no intermediate materialization, Catalyst
    fuses the whole thing."""
    from resume_jd_matcher_spark.functions.text import fingerprint_md5, tokens as toks_fn
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = toks_fn("text")
    ntok = F.size(toks)
    stop_r = F.size(
        F.filter(toks, lambda t: t.isin("a", "the", "and", "of", "to", "in", "is"))
    ).cast("double") / F.nullif(ntok.cast("double"), F.lit(0.0))
    digit_r = F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("double") / F.nullif(
        F.length("text").cast("double"), F.lit(0.0)
    )
    q = (
        F.lit(0.5) * F.least(ntok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(stop_r * 2.0, F.lit(1.0)))
        + F.lit(0.2) * (F.lit(1.0) - F.least(digit_r * 10.0, F.lit(1.0)))
    )
    scored = d.select(
        "doc_id",
        "lang",
        fingerprint_md5("text").alias("fp"),
        ntok.alias("ntok"),
        q.alias("q"),
    )
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    kept = (
        scored.withColumn("dup_rn", F.row_number().over(w))
        .filter(
            (F.col("dup_rn") == 1)
            & (F.col("q") >= 0.5)
            & F.col("ntok").between(20, 1000)
        )
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ntok").alias("total_tokens"),
        F.round(F.avg("q") + 1e-9, 4).alias("avg_quality"),
    )


@register(
    "stratified_sample",
    f"""
SELECT doc_id, lang
FROM documents
WHERE ({SQL_HASH32.format(c="doc_id::VARCHAR")}) % 1000 <
      CASE lang
        WHEN 'en' THEN 600 WHEN 'de' THEN 400 WHEN 'es' THEN 300
        WHEN 'fr' THEN 200 ELSE 100 END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic stratified sampling: per-language keep
    fraction applied via the portable hash32 of the doc id — the
    reproducible, cluster-stable analog of ``sampleBy`` (no RNG, no
    row-order dependence; re-runs and retries select the same rows).
    Pure filter on the scan: no shuffle at all."""
    from resume_jd_matcher_spark.functions.text import hash32

    frac = (
        F.when(F.col("lang") == "en", 600)
        .when(F.col("lang") == "de", 400)
        .when(F.col("lang") == "es", 300)
        .when(F.col("lang") == "fr", 200)
        .otherwise(100)
    )
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        (hash32(F.col("doc_id").cast("string")) % 1000) < frac
    ).select("doc_id", "lang")


@register(
    "chunk_sliding",
    f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents
), chunks AS (
  SELECT doc_id,
         ((i - 1) / 96)::INT AS chunk_id,
         array_to_string(toks[i : i + 127], ' ') AS chunk_text,
         least(len(toks) - i + 1, 128)::INT AS n_tokens
  FROM t, unnest(generate_series(1, len(toks), 96)) AS s(i)
  WHERE len(toks) > 0
)
SELECT doc_id, chunk_id, chunk_text, n_tokens FROM chunks
""",
)
def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] context-window chunking for training: fixed 128-token
    windows with stride 96 (32-token overlap so no span is split
    across a boundary unseen). Entirely native sequence/slice
    expressions — per-doc narrow work, zero shuffle; the 100 TB shape
    is embarrassingly parallel map work."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(96))
    return (
        d.filter(F.size(toks) > 0)
        .select(
            "doc_id",
            F.size(toks).alias("n_toks"),
            F.explode(starts).alias("i"),
            toks.alias("toks"),
        )
        .select(
            "doc_id",
            (((F.col("i") - 1) / 96).cast("int")).alias("chunk_id"),
            F.concat_ws(" ", F.slice("toks", F.col("i"), 128)).alias("chunk_text"),
            F.least(F.col("n_toks") - F.col("i") + 1, F.lit(128))
            .cast("int")
            .alias("n_tokens"),
        )
    )


from resume_jd_matcher_spark.queries.text_q import _MINHASH_EST_CTE  # noqa: E402


@register(
    "leakage_safe_split",
    f"""
WITH RECURSIVE {_MINHASH_EST_CTE},
edges AS (
  SELECT left_id AS a, right_id AS b FROM est WHERE est_jaccard >= 0.95
  UNION ALL
  SELECT right_id AS a, left_id AS b FROM est WHERE est_jaccard >= 0.95
), reach AS (
  SELECT DISTINCT a AS node, a AS r FROM edges
  UNION
  SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
), labels AS (
  SELECT node, min(r) AS cluster_rep FROM reach GROUP BY node
), base AS (
  SELECT doc_id FROM documents WHERE doc_id < 200
), keyed AS (
  SELECT b.doc_id, coalesce(l.cluster_rep, b.doc_id) AS group_key
  FROM base b LEFT JOIN labels l ON l.node = b.doc_id
)
SELECT doc_id, group_key,
       CASE WHEN {SQL_HASH32.format(c="group_key::VARCHAR")} % 10 < 8 THEN 'train'
            WHEN {SQL_HASH32.format(c="group_key::VARCHAR")} % 10 < 9 THEN 'val'
            ELSE 'test' END AS split
FROM keyed
""",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] near-dup-leakage-safe train/val/test split: the split key
    is the near-dup CLUSTER representative, not the doc id — every
    member of a near-duplicate cluster lands in the same split, so the
    eval set can never contain a near-copy of a training document (the
    classic contamination bug a naive per-doc split causes). Docs with
    no near-dup candidate split by their own id. Composition:
    MinHash-LSH candidates → connected components → hash-stable split
    on the cluster key."""
    from resume_jd_matcher_spark.functions.text import hash32
    from resume_jd_matcher_spark.operators import cluster as clusterop
    from resume_jd_matcher_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    edges = dedup.minhash_lsh_candidates(d, n_hashes=16, rows_per_band=4).filter(
        F.col("est_jaccard") >= 0.95
    )
    clusters = clusterop.dedup_clusters(edges).select(
        F.col("doc_id").alias("c_doc_id"), "cluster_rep"
    )
    keyed = d.select("doc_id").join(
        clusters, F.col("doc_id") == F.col("c_doc_id"), "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_rep", "doc_id").alias("group_key"),
    )
    h = hash32(F.col("group_key").cast("string")) % 10
    return keyed.select(
        "doc_id",
        "group_key",
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test").alias("split"),
    )


@register(
    "mixture_sample",
    f"""
WITH d AS (
  SELECT doc_id, 'd' || (substr(source, 4)::INT % 3) AS domain
  FROM documents
), w(domain, target) AS (VALUES ('d0', 100), ('d1', 60), ('d2', 40)),
r AS (
  SELECT doc_id, domain,
         row_number() OVER (
           PARTITION BY domain
           ORDER BY {SQL_HASH32.format(c='doc_id::VARCHAR')}, doc_id
         ) AS rn
  FROM d
)
SELECT r.doc_id, r.domain FROM r JOIN w USING (domain) WHERE rn <= target
""",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] domain-mixture resampling: sources fold into 3 domains,
    a 50/30/20 weight vector over a 200-doc budget picks hash-ordered
    representatives per domain — the deterministic version of
    pretraining data-mixture reweighting."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("d"), F.expr("substring(source, 4)").cast("int") % 3
        ).alias("domain"),
    )
    return sampling.mixture_sample(
        d, weights={"d0": 0.5, "d1": 0.3, "d2": 0.2}, total=200
    ).select("doc_id", "domain")


@register(
    "corpus_shuffle",
    f"""
SELECT row_number() OVER (
         ORDER BY {SQL_HASH32.format(c="'s42:' || doc_id::VARCHAR")}, doc_id
       )::BIGINT AS pos,
       doc_id
FROM documents
""",
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] seeded deterministic corpus shuffle with global positions,
    computed with the distributed bucket-offset rank (no full-corpus
    single-partition window) — training-order randomization that is
    bit-reproducible across runs and engines."""
    return sampling.seeded_shuffle(
        load_table(spark, sf_dir, "documents"), seed="s42"
    )


@register(
    "length_buckets",
    f"""
WITH t AS (
  SELECT CASE
           WHEN len({SQL_TOKS.format(c='text')}) <= 16 THEN 16
           WHEN len({SQL_TOKS.format(c='text')}) <= 64 THEN 64
           WHEN len({SQL_TOKS.format(c='text')}) <= 256 THEN 256
           WHEN len({SQL_TOKS.format(c='text')}) <= 1024 THEN 1024
           WHEN len({SQL_TOKS.format(c='text')}) <= 4096 THEN 4096
           ELSE -1
         END AS pad_to,
         len({SQL_TOKS.format(c='text')}) AS n
  FROM documents
), a AS (
  SELECT pad_to, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS total_tokens
  FROM t GROUP BY pad_to
)
SELECT pad_to::INT AS pad_to, n_docs, total_tokens,
       (CASE WHEN pad_to > 0 THEN n_docs * pad_to ELSE total_tokens END)::BIGINT
         AS padded_tokens,
       round((CASE WHEN pad_to > 0 THEN n_docs * pad_to ELSE total_tokens END
              - total_tokens)
             / (CASE WHEN pad_to > 0 THEN n_docs * pad_to
                     ELSE total_tokens END)::DOUBLE, 4) AS waste_frac
FROM a
""",
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] length-bucketed batching stats: per padding bucket, the
    token waste a pad-to-boundary batch layout costs — the diagnostic
    for choosing sequence-length buckets before packing."""
    return sampling.length_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "mixture_token_budget",
    f"""
WITH d AS (
  SELECT doc_id,
         'd' || (substr(source, 4)::INT % 3) AS domain,
         len({SQL_TOKS.format(c='text')}) AS n_tokens
  FROM documents
), w(domain, target) AS (VALUES ('d0', 10000), ('d1', 6000), ('d2', 4000)),
r AS (
  SELECT doc_id, domain, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY domain
           ORDER BY {SQL_HASH32.format(c='doc_id::VARCHAR')}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running
  FROM d
)
SELECT r.doc_id, r.domain, r.n_tokens::INT AS n_tokens
FROM r JOIN w USING (domain) WHERE running <= target
""",
)
def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] token-weighted domain mixture: a 50/30/20 split of a
    20k-token budget admits hash-ordered documents per domain until
    each domain's running token count hits its share — mixtures
    specified in tokens (the pretraining unit), not documents
    (operators/sampling.py:mixture_token_budget)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("d"), F.expr("substring(source, 4)").cast("int") % 3
        ).alias("domain"),
    )
    return sampling.mixture_token_budget(
        d, weights={"d0": 0.5, "d1": 0.3, "d2": 0.2}, total_tokens=20000
    )


@register(
    "curriculum_order",
    f"""
WITH t AS (
  SELECT doc_id, text, {SQL_TOKS.format(c='text')} AS toks,
         length(text) AS nc
  FROM documents
), r AS (
  SELECT doc_id,
         len(toks) AS ntok,
         len(list_filter(toks, x -> x IN ('a','the','and','of','to','in','is')))::DOUBLE
           / nullif(len(toks), 0) AS stop_r,
         len(regexp_extract_all(text, '[0-9]'))::DOUBLE / nullif(nc, 0) AS digit_r
  FROM t
), q AS (
  SELECT doc_id,
         round(0.5 * least(ntok::DOUBLE / 100.0, 1.0)
             + 0.3 * (1.0 - least(stop_r * 2.0, 1.0))
             + 0.2 * (1.0 - least(digit_r * 10.0, 1.0)) + 1e-9, 4) AS quality
  FROM r
), b AS (
  SELECT doc_id, quality,
         CASE WHEN quality >= 0.8 THEN 0
              WHEN quality >= 0.6 THEN 1
              WHEN quality >= 0.4 THEN 2
              ELSE 3 END AS band
  FROM q
)
SELECT doc_id, band::INT AS band,
       row_number() OVER (
         PARTITION BY band
         ORDER BY {SQL_HASH32.format(c='doc_id::VARCHAR')}, doc_id
       )::BIGINT AS band_pos,
       quality
FROM b
""",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] curriculum schedule: fixed quality-threshold bands
    (0 = cleanest first — no global ntile sort, so banding is one
    scan) with a deterministic hash shuffle inside each band
    (operators/sampling.py:curriculum_order)."""
    return sampling.curriculum_order(load_table(spark, sf_dir, "documents"))


@register(
    "dsir_weights",
    f"""
WITH t AS (
  SELECT doc_id, lang, {SQL_TOKS.format(c='text')} AS toks FROM documents
), big AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         ({SQL_HASH32.format(c="toks[i] || ' ' || toks[i+1]")}) % 4096 AS bucket
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS s(i)
  WHERE len(toks) >= 2
), cc AS (
  SELECT bucket, count(*)::DOUBLE AS c_corpus,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::DOUBLE AS c_target
  FROM big GROUP BY bucket
), tot AS (
  SELECT sum(c_corpus) AS n_corpus, sum(c_target) AS n_target FROM cc
), ratio AS (
  SELECT bucket,
         ln((c_target + 0.5) / (n_target + 0.5 * 4096.0))
       - ln((c_corpus + 0.5) / (n_corpus + 0.5 * 4096.0)) AS lr
  FROM cc, tot
)
SELECT b.doc_id, count(*)::INT AS n_bigrams,
       round(avg(r.lr) + 1e-9, 4) AS dsir_logweight
FROM big b JOIN ratio r ON b.bucket = r.bucket
GROUP BY b.doc_id
""",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DSIR importance weights (Xie et al. 2023): per-document
    target-domain log-likelihood ratio over hashed-bigram LM features
    (bucket = hash32(bigram) % 4096, additive 0.5 smoothing), target =
    English docs. Both LM tables are ≤4096-row hash aggs broadcast
    into the scoring join — corpus-size-independent ratio table, one
    map-side-combined per-doc mean. High weight = resample into the
    training mixture."""
    return sampling.dsir_weights(
        load_table(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


@register(
    "weighted_sample",
    f"""
WITH k AS (
  SELECT doc_id,
         round(len({SQL_TOKS.format(c='text')})::DOUBLE, 4) AS weight
  FROM documents
), s AS (
  SELECT doc_id, weight,
         round(ln(({SQL_HASH32.format(c='doc_id::VARCHAR')} + 0.5) / 4294967296.0)
               / weight + 1e-9, 6) AS es_key
  FROM k WHERE weight > 0
), r AS (
  SELECT doc_id, weight, es_key,
         row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS rank
  FROM s
)
SELECT doc_id, weight, es_key, rank::INT AS rank FROM r WHERE rank <= 100
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic PPS sampling (Efraimidis–Spirakis A-ES):
    top-100 documents by key ln(u)/w with u from the portable hash32
    and w = token count — longer documents proportionally likelier,
    bit-reproducible across engines/runs. Per-row key projection +
    TakeOrderedAndProject partial top-n; the rank window touches only
    the 100 selected rows."""
    docs = load_table(spark, sf_dir, "documents")
    from resume_jd_matcher_spark.functions.text import tokens

    return sampling.weighted_sample(
        docs, F.size(tokens("text")), n=100
    )


@register(
    "temperature_mixture",
    f"""
WITH sz AS (
  SELECT source AS g, count(*)::BIGINT AS n FROM documents GROUP BY 1
), tot AS (
  SELECT list_sum(list(sqrt(n::DOUBLE) ORDER BY g)) AS tp FROM sz
), tgt AS (
  SELECT g, floor((300 * sqrt(n::DOUBLE)) / tp)::INT AS target
  FROM sz, tot
), rk AS (
  SELECT doc_id, source AS g,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {SQL_HASH32.format(c='doc_id::VARCHAR')}, doc_id
         ) AS rn
  FROM documents
)
SELECT r.doc_id, r.g AS source FROM rk r JOIN tgt t USING (g)
WHERE r.rn <= t.target
""",
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] temperature-scaled mixture (mT5/UniMax α-sampling,
    α=0.5): admission shares derive from per-source corpus counts —
    w_g ∝ √n_g — up-sampling small sources without a hand-written
    weight table (mixture_sample's data-driven sibling). Shares fold
    left-to-right over name-sorted groups on both engines; admission
    is the deterministic hash-rank window
    (operators/sampling.py:temperature_mixture)."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mixture(
        d, alpha=0.5, total=300, group_col="source"
    ).select("doc_id", "source")


_NS_HASH = SQL_HASH32.format(
    c="doc_id::VARCHAR || ':' || j::VARCHAR || '#7'"
)


@register(
    "negative_sampling",
    f"""
WITH tokstream AS (
  SELECT unnest({SQL_TOKS.format(c='text')}) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*)::BIGINT AS cnt FROM tokstream GROUP BY tok
  ORDER BY cnt DESC, tok LIMIT 200
), wts AS (
  SELECT tok, cnt, round(pow(cnt, 0.75) * 1000)::BIGINT AS wt FROM vocab
), cdf AS (
  SELECT tok, wt,
         (sum(wt) OVER (ORDER BY cnt DESC, tok ROWS UNBOUNDED PRECEDING))::BIGINT AS hi
  FROM wts
), iv AS (SELECT tok, hi - wt AS lo, hi FROM cdf),
tot AS (SELECT max(hi) AS w FROM iv),
draws AS (
  SELECT doc_id, j, ({_NS_HASH}) % t.w AS r
  FROM documents, (SELECT unnest(generate_series(1, 4)) AS j) js, tot t
)
SELECT d.doc_id, d.j::INT AS j, i.tok AS neg_token
FROM draws d JOIN iv i ON d.r >= i.lo AND d.r < i.hi
""",
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] word2vec-style unigram^0.75 negative sampling
    (operators/sampling.py negative_sampling): k=4 deterministic
    hash draws per document from the integer CDF over the top-200
    vocabulary, inverted via the binned-range equi-join. The oracle
    replays the identical integer CDF with a plain interval join
    (correctness side doesn't need the bin optimization)."""
    from resume_jd_matcher_spark.operators.sampling import negative_sampling

    d = load_table(spark, sf_dir, "documents")
    return negative_sampling(d, k=4, vocab_size=200, seed=7)


_PACK_LEN = 512


@register(
    "sequence_packing",
    f"""
WITH t AS (
  SELECT doc_id, len({SQL_TOKS.format(c='text')})::BIGINT AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok,
         sum(tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t
), f AS (
  SELECT doc_id, tok, cum, cum - tok AS strt,
         (cum - tok) // {_PACK_LEN} AS bin_start,
         (cum - 1) // {_PACK_LEN} AS bin_end
  FROM c
), s AS (
  SELECT count(*)::HUGEINT AS n_docs,
         sum(tok)::HUGEINT AS total_tokens,
         ((sum(tok) + {_PACK_LEN} - 1) // {_PACK_LEN})::HUGEINT AS n_bins,
         sum(CASE WHEN bin_end > bin_start THEN 1 ELSE 0 END)::HUGEINT
           AS n_crossing,
         sum(bin_end - bin_start + 1)::HUGEINT AS n_fragments
  FROM f
)
SELECT n_docs::BIGINT AS n_docs, total_tokens::BIGINT AS total_tokens,
       n_bins::BIGINT AS n_bins, n_crossing::BIGINT AS n_crossing,
       n_fragments::BIGINT AS n_fragments,
       ((n_fragments * 2000000 + n_bins) // (2 * n_bins))::BIGINT
         AS frags_per_bin_e6,
       (n_bins * {_PACK_LEN} - total_tokens)::BIGINT AS pad_tokens,
       (((n_bins * {_PACK_LEN} - total_tokens) * 2000000
         + n_bins * {_PACK_LEN})
        // (2 * n_bins * {_PACK_LEN}))::BIGINT AS pad_pct_e6
FROM s
""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] sequence-packing profile for LLM pretraining: concatenate
    the corpus in doc_id order and cut every {L} tokens (the standard
    concat-with-EOS packing), then report how the documents land —
    bins, boundary-crossing documents, fragments per bin, and padding
    waste (only the final bin pads, by construction of the cut). The
    capacity-planning readout run before a packing job: fragments/bin
    drives attention-mask fragmentation, crossing share drives
    document-truncation loss terms.

    Determinism: token counts and the running total are exact BIGINTs
    (global_prefix with sum_type='bigint' — bit-deterministic
    bucketed accumulation, no float running sum); every exposed ratio
    is a half-up scaled-integer division replayed in HUGEINT by the
    oracle.

    Scale shape: one narrow token-count projection, ONE bucketed
    prefix shuffle (operators/prefix.global_prefix — no
    single-partition window over data), one 1-row summary agg. The
    per-bin grain is never materialized; everything reduces on the
    document grain.""".format(L=_PACK_LEN)
    from resume_jd_matcher_spark.functions.text import tokens
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("tok")
    )
    c = global_prefix(
        d, ["doc_id"], "tok", sum_type="bigint", checkpoint=False
    )
    L = F.lit(_PACK_LEN)
    f = c.select(
        "tok",
        F.expr(f"(cum_sum - tok) div {_PACK_LEN}").alias("bin_start"),
        F.expr(f"(cum_sum - 1) div {_PACK_LEN}").alias("bin_end"),
    )
    s = f.agg(
        F.count("*").cast("decimal(38,0)").alias("n_docs"),
        F.sum("tok").cast("decimal(38,0)").alias("total_tokens"),
        F.sum(
            F.when(F.col("bin_end") > F.col("bin_start"), 1).otherwise(0)
        ).cast("decimal(38,0)").alias("n_crossing"),
        F.sum(F.col("bin_end") - F.col("bin_start") + 1)
        .cast("decimal(38,0)")
        .alias("n_fragments"),
    ).withColumn(
        "n_bins",
        F.expr(f"(total_tokens + {_PACK_LEN} - 1) div {_PACK_LEN}").cast(
            "decimal(38,0)"
        ),
    )
    halfup = (
        lambda num, den: F.expr(f"({num} * 2000000 + {den}) div (2 * {den})")
        .cast("bigint")
    )
    return s.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("n_bins").cast("bigint").alias("n_bins"),
        F.col("n_crossing").cast("bigint").alias("n_crossing"),
        F.col("n_fragments").cast("bigint").alias("n_fragments"),
        halfup("n_fragments", "n_bins").alias("frags_per_bin_e6"),
        (F.col("n_bins") * L - F.col("total_tokens"))
        .cast("bigint")
        .alias("pad_tokens"),
        F.expr(
            f"((n_bins * {_PACK_LEN} - total_tokens) * 2000000"
            f" + n_bins * {_PACK_LEN})"
            f" div (2 * n_bins * {_PACK_LEN})"
        ).cast("bigint").alias("pad_pct_e6"),
    )
