"""Vectorized (Arrow + BLAS) implementations of the similarity
operators — the performance path for exact vector search at scale.

Why this exists: the expression-based distances in
``operators/similarity.py`` (``zip_with``/``aggregate``) are declarative
and oracle-transparent, but Spark evaluates higher-order array
functions interpreted — outside whole-stage codegen — so every
candidate pair pays an expression-tree walk. For N×Q pair volumes the
arithmetic belongs in a BLAS kernel.

Shape (the idiomatic Spark pattern for brute-force vector search):

  bounded side (queries / dedup probes) → driver pandas → a Q×d
  float64 matrix closed over by the UDF (broadcast to executors);
  corpus → ``mapInPandas`` — per Arrow batch, one B×d @ d×Q matmul,
  emit only survivors (top-k candidates or under-threshold pairs).

The corpus is never paired row-by-row, nothing is shuffled except
final survivors, and executors stream batches at Arrow speed. At
100 TB: corpus splits scan in parallel, each task does dense GEMMs,
the reduce side only sees k rows per (query, partition).

Numerics: matrices are cast to float64 before arithmetic;
``||a-b||² = ||a||² + ||b||² − 2·a·b`` (clamped at 0) agrees with the
sequential-fold oracle well within the exposed 1e-4 rounding.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resume_jd_matcher_spark.functions.vector import faiss_score
from resume_jd_matcher_spark.plans.optimize import ensure_parallelism


def _query_matrix(queries_pdf: pd.DataFrame, id_col: str, vec_col: str):
    qids = queries_pdf[id_col].to_numpy()
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    return qids, qmat


def _sq_l2(batch: np.ndarray, qmat: np.ndarray) -> np.ndarray:
    d2 = (
        (batch * batch).sum(axis=1)[:, None]
        + (qmat * qmat).sum(axis=1)[None, :]
        - 2.0 * (batch @ qmat.T)
    )
    return np.maximum(d2, 0.0)


def similarity_join_blas(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_vec: str = "left_embedding",
    right_vec: str = "right_embedding",
    dedup_pairs: bool = False,
) -> DataFrame:
    """V6/V8 fast path: all (left, right) pairs with squared-L2
    distance < threshold. ``left`` must be the bounded side (it is
    materialized once and closed over, the moral equivalent of
    ``F.broadcast``); ``right`` streams through mapInPandas.
    """
    left_pdf = left.select(left_id, left_vec).toPandas()
    qids, qmat = _query_matrix(left_pdf, left_id, left_vec)

    out_schema = T.StructType(
        [
            T.StructField(left_id, T.LongType()),
            T.StructField(right_id, T.LongType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rmat = np.stack(pdf[right_vec].to_numpy()).astype(np.float64)
            rids = pdf[right_id].to_numpy()
            d2 = np.round(_sq_l2(rmat, qmat), 4)
            mask = d2 < threshold
            if dedup_pairs:
                mask &= qids[None, :] < rids[:, None]
            ri, qi = np.nonzero(mask)
            if not len(ri):
                continue
            yield pd.DataFrame(
                {
                    left_id: qids[qi],
                    right_id: rids[ri],
                    "dist": d2[ri, qi],
                }
            )

    return ensure_parallelism(right.select(right_id, right_vec)).mapInPandas(
        gen, out_schema
    )


def topk_similarity_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_embedding",
) -> DataFrame:
    """V5 fast path: per-partition partial top-k (BLAS distances, numpy
    argpartition) → global top-k per query. The shuffle carries at most
    k rows per (query, partition) instead of the full N×Q pair set.
    """
    queries_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids, qmat = _query_matrix(queries_pdf, query_id_col, query_vec_col)

    out_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rids = pdf[id_col].to_numpy()
            d2 = _sq_l2(rmat, qmat)  # B×Q
            kk = min(k, d2.shape[0])
            # Partial top-k per query within this batch, KEEPING boundary
            # ties: emit every row with dist <= the kth-smallest distance
            # so equidistant candidates survive to the global (dist, id)
            # tie-break window. (argpartition alone would drop an
            # arbitrary one of the tied rows.)
            kth = np.partition(d2, kk - 1, axis=0)[kk - 1, :]  # per-query kth dist
            ri, qi = np.nonzero(d2 <= kth[None, :])
            yield pd.DataFrame(
                {
                    query_id_col: qids[qi],
                    id_col: rids[ri],
                    "dist": d2[ri, qi],
                }
            )

    partial = ensure_parallelism(corpus.select(id_col, vec_col)).mapInPandas(
        gen, out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("dist", 4).alias("dist"),
            faiss_score(F.col("dist")).alias("score"),
        )
    )
