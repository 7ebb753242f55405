"""Lexical/hybrid retrieval + exact-substring dedup queries
(SURVEY.md §2.H U5 retrieval family; north-star training-data ops).

Engine paths: operators/retrieval.py, operators/dedup.py
(duplicated_spans). Oracles mirror the exact fold order and
tie-breaks (FIXTURES.md contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resume_jd_matcher_spark.operators import retrieval
from resume_jd_matcher_spark.operators.dedup import duplicated_spans
from resume_jd_matcher_spark.queries import register
from resume_jd_matcher_spark.sources.io import load_table

SQL_TOKS = "string_split_regex(trim(lower({c})), '\\s+')"
SQL_HASH32 = "('0x' || substr(md5({c}), 1, 8))::BIGINT"
SQL_DOT = "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]*{b}[i]))"
SQL_NORM = (
    "sqrt(list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]*{a}[i])))"
)

# Fixed query-term set for the lexical ranker (all in the synthetic
# corpus vocabulary; order is the score fold order on BOTH sides).
BM25_TERMS = ("hash", "vector", "stream", "merge")

# DuckDB twin of operators/retrieval.bm25_scores — same left-to-right
# per-term fold, same (1 - 0.75 + 0.75*dl/avgdl) association, avgdl as
# exact-integer sum(dl)/N.
_SQL_BM25_SCORED = f"""
base AS (
  SELECT doc_id, len(toks)::BIGINT AS dl,
         {", ".join(f"len(list_filter(toks, t -> t = '{t}'))::BIGINT AS tf_{i}" for i, t in enumerate(BM25_TERMS))}
  FROM (SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents)
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
         {", ".join(f"sum((tf_{i} > 0)::BIGINT)::BIGINT AS df_{i}" for i in range(len(BM25_TERMS)))}
  FROM base
), scored AS (
  SELECT doc_id, dl,
         0.0 {" ".join(
             f"+ ln(1.0 + (n_docs::DOUBLE - df_{i}::DOUBLE + 0.5) / (df_{i}::DOUBLE + 0.5))"
             f" * tf_{i}::DOUBLE * 2.2"
             f" / (tf_{i}::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE)))"
             for i in range(len(BM25_TERMS))
         )} AS bm25
  FROM base, stats
)"""


@register(
    "bm25_rank",
    f"""
WITH {_SQL_BM25_SCORED}
SELECT doc_id, dl, round(bm25 + 1e-9, 6) AS bm25
FROM scored
ORDER BY scored.bm25 DESC, doc_id
LIMIT 20
""",
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 retrieval: Okapi BM25 top-20 over the corpus for a fixed
    term set — the lexical ranker the reference's dense-only search
    (vectorDB.py:38) lacks. Two scans, zero wide shuffles: per-doc
    term frequencies are native array ops in one projection, corpus
    stats reduce to one broadcast scalar row, top-k lowers to
    TakeOrderedAndProject."""
    return retrieval.bm25_topk(
        load_table(spark, sf_dir, "documents"), BM25_TERMS, k=20
    )


@register(
    "rrf_hybrid",
    f"""
WITH {_SQL_BM25_SCORED},
lex_top AS (
  SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 100
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM lex_top
), q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS ce FROM embeddings
), dsc AS (
  SELECT doc_id,
         {SQL_DOT.format(a='ce', b='qe')}
           / ({SQL_NORM.format(a='ce')} * {SQL_NORM.format(a='qe')}) AS cos_sim
  FROM c, q
), den_top AS (
  SELECT doc_id, cos_sim FROM dsc ORDER BY cos_sim DESC, doc_id LIMIT 100
), den AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS dense_rank
  FROM den_top
), fused AS (
  SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
         lex_rank, dense_rank,
         coalesce(1.0 / (60.0 + lex_rank), 0.0)
           + coalesce(1.0 / (60.0 + dense_rank), 0.0) AS rrf_raw
  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
)
SELECT doc_id, lex_rank::INT AS lex_rank, dense_rank::INT AS dense_rank,
       round(rrf_raw + 1e-12, 8) AS rrf
FROM fused
ORDER BY rrf_raw DESC, doc_id
LIMIT 20
""",
)
def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 retrieval: hybrid search — BM25 lexical ∪ dense cosine
    against embedding of vec_id 0, fused by reciprocal rank
    (Cormack et al. SIGIR'09, 1/(60+rank)). Each ranker is cut to its
    top-100 pool with TakeOrderedAndProject BEFORE any global
    row_number, so the single-partition window sees ≤ 200 rows at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lexical = retrieval.bm25_scores(docs, BM25_TERMS)
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_embedding")
    )
    dense = retrieval.dense_cosine_scores(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        qvec,
        id_col="doc_id",
    )
    return retrieval.rrf_fuse(lexical, dense, pool=100, k=20)


@register(
    "hard_negatives",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
), d AS (
  SELECT query_id, query_label, vec_id, c.label AS neg_label,
         list_sum(list_transform(generate_series(1, len(qe)),
                                 i -> (qe[i]-ce[i])*(qe[i]-ce[i]))) AS dist
  FROM c, q
  WHERE c.label <> q.query_label
), r AS (
  SELECT query_id, query_label, vec_id, neg_label, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
  FROM d
)
SELECT query_id, query_label, vec_id AS neg_id, neg_label,
       round(dist, 4) AS dist,
       round(10.0 / (1.0 + dist), 2) AS score
FROM r WHERE rn = 1
""",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 training-data op: contrastive hard-negative mining — for
    each of 5 query vectors, the nearest corpus vector with a
    different label. Hash-aggregate argmin (min(struct)) with
    map-side combine; label filter applied pre-aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_embedding"),
    )
    return retrieval.hard_negatives(
        emb.select("vec_id", "label", "embedding"), queries
    )


@register(
    "substring_dedup",
    f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents
), pos AS (
  SELECT doc_id, i,
         {SQL_HASH32.format(c="array_to_string(toks[i:i+7], ' ')")} AS h
  FROM t, unnest(generate_series(1, len(toks) - 7)) AS s(i)
  WHERE len(toks) >= 8
), dup AS (
  SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), dp AS (
  SELECT doc_id, i FROM pos JOIN dup USING (h)
), isl AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM dp
)
SELECT doc_id, min(i)::INT AS span_start, (max(i) + 7)::INT AS span_end,
       (max(i) + 7 - min(i) + 1)::INT AS span_tokens,
       count(*)::INT AS n_grams
FROM isl GROUP BY doc_id, grp
""",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8 dedup: exact duplicated-substring spans (ExactSubstr of Lee
    et al. 2021) via positional 8-gram posting lists + islands merge —
    suffix-array parity for cross-document runs ≥ 8 tokens without a
    global suffix sort."""
    return duplicated_spans(load_table(spark, sf_dir, "documents"), k=8)


@register(
    "substring_remove",
    f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents
), pos AS (
  SELECT doc_id, i,
         {SQL_HASH32.format(c="array_to_string(toks[i:i+7], ' ')")} AS h
  FROM t, unnest(generate_series(1, len(toks) - 7)) AS s(i)
  WHERE len(toks) >= 8
), own AS (
  SELECT h, min(doc_id) AS owner
  FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), dp AS (
  SELECT DISTINCT pos.doc_id, i + j AS p
  FROM pos JOIN own USING (h), unnest(generate_series(0, 7)) AS g(j)
  WHERE pos.doc_id <> own.owner
), tokpos AS (
  SELECT doc_id, i AS p, toks[i] AS tok
  FROM t, unnest(generate_series(1, len(toks))) AS s(i)
), kept AS (
  SELECT tokpos.doc_id, tokpos.p, tokpos.tok
  FROM tokpos ANTI JOIN dp ON tokpos.doc_id = dp.doc_id AND tokpos.p = dp.p
), reasm AS (
  SELECT doc_id, count(*)::INT AS n_tokens_after,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(toks)::INT AS n_tokens_before,
       coalesce(n_tokens_after, 0)::INT AS n_tokens_after,
       coalesce(clean_text, '') AS clean_text
FROM t LEFT JOIN reasm ON t.doc_id = reasm.doc_id
""",
)
def q_substring_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8 dedup (removal half of ExactSubstr, Lee et al. 2021): every
    cross-document duplicated 8-gram keeps ONE canonical copy (lowest
    doc id) and is cut from every other document; tokens re-assemble
    per doc. Posting-list + anti-join shape — bounded by duplicated
    positions × k, never corpus²."""
    from resume_jd_matcher_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(load_table(spark, sf_dir, "documents"), k=8)


@register(
    "rerank_e2e",
    f"""
WITH {_SQL_BM25_SCORED},
lex_top AS (
  SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 100
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM lex_top
), q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS ce FROM embeddings
), dsc AS (
  SELECT doc_id,
         {SQL_DOT.format(a='ce', b='qe')}
           / ({SQL_NORM.format(a='ce')} * {SQL_NORM.format(a='qe')}) AS cos_sim
  FROM c, q
), den_top AS (
  SELECT doc_id, cos_sim FROM dsc ORDER BY cos_sim DESC, doc_id LIMIT 100
), den AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS dense_rank
  FROM den_top
), fused AS (
  SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
         coalesce(1.0 / (60.0 + lex_rank), 0.0)
           + coalesce(1.0 / (60.0 + dense_rank), 0.0) AS rrf_raw
  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
), pool AS (
  SELECT doc_id, round(rrf_raw + 1e-12, 8) AS rrf
  FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT 20
), qtoks AS (
  SELECT list_distinct({SQL_TOKS.format(c='text')}) AS qt
  FROM documents WHERE doc_id = 0
)
SELECT p.doc_id,
       least(10, len(list_intersect(
         list_distinct({SQL_TOKS.format(c='d.text')}), qt)))::INT AS rerank_score,
       p.rrf
FROM pool p JOIN documents d ON p.doc_id = d.doc_id, qtoks
ORDER BY rerank_score DESC, p.rrf DESC, p.doc_id
LIMIT 10
""",
)
def q_rerank_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full modern retrieval pipeline in ONE plan: hybrid recall
    (BM25 ∪ dense cosine, RRF-fused, top-20 pool) → precision rerank
    with the reference's capped token-overlap scorer (the stub LLM
    scorer's exact semantics, operators/scoring.py:31-41 — the seam a
    cross-encoder swaps into) → final top-10. The rerank only ever
    touches the 20-row pool, so the expensive scorer's cost is
    independent of corpus size — the architecture cross-encoder
    deployments rely on."""
    from resume_jd_matcher_spark.functions.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    pool = q_rrf_hybrid(spark, sf_dir).select("doc_id", "rrf")
    qtoks = docs.filter(F.col("doc_id") == 0).select(
        F.array_distinct(_toks("text")).alias("qt")
    )
    return (
        pool.join(docs.select("doc_id", "text"), "doc_id")
        .crossJoin(F.broadcast(qtoks))
        .select(
            "doc_id",
            F.least(
                F.lit(10),
                F.size(F.array_intersect(F.array_distinct(_toks("text")), F.col("qt"))),
            )
            .cast("int")
            .alias("rerank_score"),
            "rrf",
        )
        .orderBy(
            F.col("rerank_score").desc(), F.col("rrf").desc(), F.col("doc_id").asc()
        )
        .limit(10)
    )


def _mmr_oracle(k: int = 10, pool: int = 50) -> str:
    """Unrolled-greedy MMR oracle: step i picks the argmax of
    0.7·qsim − 0.3·max(sim to already-picked) over the remaining pool
    (ties → smallest vec_id), accumulated across k chained CTEs — the
    same sequential algorithm the engine runs, in pure SQL."""
    dot_qc = SQL_DOT.format(a="qe", b="ce")
    nq = SQL_NORM.format(a="qe")
    nc = SQL_NORM.format(a="ce")
    dot_ab = SQL_DOT.format(a="a.ce", b="b.ce")
    na = SQL_NORM.format(a="a.ce")
    nb = SQL_NORM.format(a="b.ce")
    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
), c AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
), scored AS (
  SELECT vec_id, {dot_qc} / ({nq} * {nc}) AS qsim FROM c, q
), pool AS MATERIALIZED (
  SELECT vec_id, qsim FROM scored ORDER BY qsim DESC, vec_id LIMIT {pool}
), pe AS MATERIALIZED (
  SELECT p.vec_id, c.ce FROM pool p JOIN c ON p.vec_id = c.vec_id
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS ida, b.vec_id AS idb, {dot_ab} / ({na} * {nb}) AS sim
  FROM pe a, pe b WHERE a.vec_id <> b.vec_id
), acc1 AS MATERIALIZED (
  SELECT 1 AS rank, vec_id, qsim, qsim AS mmr
  FROM pool ORDER BY qsim DESC, vec_id LIMIT 1
)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""", sel{i} AS MATERIALIZED (
  SELECT {i} AS rank, p.vec_id, p.qsim,
         0.7 * p.qsim - 0.3 * (SELECT max(pr.sim) FROM pairs pr
                               WHERE pr.ida = p.vec_id
                                 AND pr.idb IN (SELECT vec_id FROM acc{i - 1}))
           AS mmr
  FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM acc{i - 1})
  ORDER BY mmr DESC, p.vec_id LIMIT 1
), acc{i} AS MATERIALIZED (
  SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM sel{i}
)"""
        )
    parts.append(
        f"""
SELECT rank, vec_id, round(qsim, 6) AS relevance, round(mmr, 6) AS mmr_score
FROM acc{k}"""
    )
    return "".join(parts)


@register("mmr_diversify", _mmr_oracle())
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 retrieval [EXT]: maximal-marginal-relevance diversified
    top-10 (Carbonell & Goldstein, SIGIR'98) over the embeddings table
    for query vec_id=0 — the diversity re-rank that keeps dense top-k
    from filling with near-duplicates. The corpus scoring + pool-50
    cut is distributed (TakeOrderedAndProject); the inherently
    sequential greedy tail runs over the bounded pool with every
    double Spark-computed, so the unrolled-CTE oracle replays it
    exactly (operators/retrieval.py:mmr_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_embedding")
    )
    return retrieval.mmr_topk(
        emb.select("vec_id", "embedding"), qv, k=10, pool=50
    )


@register(
    "mine_triplets",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
), d AS (
  SELECT query_id, query_label, vec_id, c.label,
         list_sum(list_transform(generate_series(1, len(qe)),
                                 i -> (qe[i]-ce[i])*(qe[i]-ce[i]))) AS dist
  FROM c, q
), pos AS (
  SELECT query_id, query_label, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
  FROM d WHERE label = query_label AND vec_id <> query_id
), neg AS (
  SELECT query_id, vec_id, label, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
  FROM d WHERE label <> query_label
)
SELECT p.query_id, p.query_label,
       p.vec_id AS pos_id, round(p.dist, 4) AS pos_dist,
       n.vec_id AS neg_id, n.label AS neg_label,
       round(n.dist, 4) AS neg_dist,
       round(n.dist - p.dist, 4) AS margin
FROM pos p JOIN neg n ON p.query_id = n.query_id
WHERE p.rn = 1 AND n.rn = 1
""",
)
def q_mine_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 training-data op: full triplet mining for contrastive
    embedding training — per anchor the nearest same-label positive
    (self excluded) and the nearest other-label hard negative, with
    the margin a triplet-loss trainer filters on. Two map-side-
    combined min(struct) argmins over one broadcast-anchor corpus
    stream (operators/retrieval.py:mine_triplets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_embedding"),
    )
    return retrieval.mine_triplets(
        emb.select("vec_id", "label", "embedding"), queries
    )


@register(
    "margin_bitext",
    f"""
WITH src AS (
  SELECT vec_id AS src_id, embedding::DOUBLE[] AS se
  FROM embeddings WHERE label = 0 AND vec_id < 200
), tgt AS (
  SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS te
  FROM embeddings WHERE label = 1
), sims AS (
  SELECT src_id, tgt_id,
         ({SQL_DOT.format(a='se', b='te')})
           / (({SQL_NORM.format(a='se')}) * ({SQL_NORM.format(a='te')})) AS cos
  FROM src, tgt
), ranked AS (
  SELECT src_id, tgt_id, cos,
         row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS rx,
         row_number() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS ry
  FROM sims WHERE cos IS NOT NULL
), xn AS (
  SELECT src_id, avg(cos) AS xn FROM ranked WHERE rx <= 4 GROUP BY src_id
), yn AS (
  SELECT tgt_id, avg(cos) AS yn FROM ranked WHERE ry <= 4 GROUP BY tgt_id
), margined AS (
  SELECT s.src_id, s.tgt_id, s.cos,
         s.cos / ((x.xn + y.yn) / 2) AS margin
  FROM sims s JOIN xn x USING (src_id) JOIN yn y USING (tgt_id)
  WHERE s.cos IS NOT NULL
), best AS (
  SELECT src_id, tgt_id, cos, margin,
         row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rb
  FROM margined
)
SELECT src_id, tgt_id,
       round(cos + 1e-9, 6) AS cos,
       round(margin + 1e-9, 6) AS margin
FROM best WHERE rb = 1 AND margin > 1.0
""",
)
def q_margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] margin-based parallel-pair mining (Artetxe & Schwenk 2019;
    operators/retrieval.margin_bitext_mine): best cross-group match
    per source vector by RATIO margin — cosine divided by the mean of
    both sides' top-4 neighborhood cosines, canceling hubness. Labels
    0/1 stand in for the two languages."""
    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval.margin_bitext_mine(
        emb, src_label=0, tgt_label=1, nbr_k=4, min_margin=1.0, max_src_id=200
    )
