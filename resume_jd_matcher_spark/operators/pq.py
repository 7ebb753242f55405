"""Product quantization (PQ) for embedding columns — the memory-side
ANN scale path beyond scalar int8 quantization (Jégou et al., TPAMI
2011; the FAISS ``IVF,PQ`` compression half).

Splits each d-dim vector into ``m`` subvectors, learns a tiny
codebook per subspace (here: the deterministic fixed-iteration Lloyd
twin from ``operators/ann.py``, so the whole trajectory is
oracle-reproducible), and stores each vector as ``m`` small codes —
64 dims × 4 bytes → 4 codes ≈ 64× compression. Query-time ranking is
asymmetric distance computation (ADC): the query precomputes its
distance to every subspace centroid (an m × k lookup table, broadcast
— it IS the query's representation), and a vector's approximate
distance is the sum of ``m`` table lookups on its codes. No
full-width vector ever moves through the ranking join.

Scale shape: codebook fit is sample-bounded (fit on a sample, encode
the full corpus — same discipline as ``lloyd_kmeans_partition``);
encoding is m broadcast-argmin passes; ADC ranking is a broadcast
equi-join on (subspace, code) followed by a map-side-combined sum —
never a crossJoin against raw vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.vector import squared_l2
from resume_jd_matcher_spark.operators.ann import (
    assign_to_centroids_grouped,
    lloyd_kmeans_grouped,
)


def pq_fit_encode(
    corpus: DataFrame,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    fit_sample_rows: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Fit ``m`` subspace codebooks on a bounded sample, encode the
    full corpus.

    Returns (codes, codebooks):
    - codes: (id, code_0..code_{m-1}) — one small int per subspace;
    - codebooks: (subspace, code, centroid) — m × k rows, broadcast-
      sized by construction.

    Subspace s covers dims [s·d/m, (s+1)·d/m); each codebook is the
    deterministic Lloyd twin (lowest-id seeds, per-iteration rounding
    to ``round_dp``) run on that slice, so a SQL oracle can replay the
    exact trajectory per subspace.

    The fit scans only the ``fit_sample_rows`` lowest-id vectors (a
    deterministic prefix sample — the Lloyd seeds are the lowest ids
    anyway, so whenever the corpus fits inside the cap the trajectory
    is bit-identical to a full-corpus fit and the SQL oracle needs no
    sample clause). All ``m`` subspace codebooks are fitted in ONE
    grouped Lloyd pass (``lloyd_kmeans_grouped`` keyed by subspace):
    each iteration is a single scan of the long-form sample, not one
    scan per subspace. Encoding the full corpus is one grouped
    broadcast-argmin against the fitted m×k centroid table — at
    100 TB the Lloyd iterations cost sample-sized shuffles, never
    full-corpus ones, and every join in the plan is an equi-join.
    """
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    def long_form(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("subspace"),
                            F.slice(vec_col, s * sub + 1, sub).alias("_sv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("_e"),
        ).select(
            F.col(id_col),
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_sv"),
        )

    fit = corpus.select(id_col, vec_col).orderBy(id_col).limit(fit_sample_rows)
    cents = lloyd_kmeans_grouped(
        long_form(fit),
        n_clusters=k,
        n_iter=n_iter,
        group_col="subspace",
        id_col=id_col,
        vec_col="_sv",
        round_dp=round_dp,
    )
    corpus_long = long_form(corpus).select(
        "subspace",
        F.col(id_col),
        F.transform("_sv", lambda x: x.cast("double")).alias("_v"),
    )
    enc = assign_to_centroids_grouped(
        corpus_long,
        cents,
        group_col="subspace",
        id_col=id_col,
        vec_col="_v",
        # m subspaces × k codes × (dim/m) values = k·dim, known
        # plan-side — zero-job budget probe
        known_total_vals=k * dim,
    )
    codes = enc.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("subspace") == s, F.col("_cid")))
            .cast("int")
            .alias(f"code_{s}")
            for s in range(m)
        ]
    )
    codebooks = cents.select(
        "subspace", F.col("_cid").alias("code"), "centroid"
    )
    return codes, codebooks


def ivf_pq_fit_encode(
    corpus: DataFrame,
    n_lists: int = 4,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str = "cid",
    round_dp: int = 6,
    fit_sample_rows: int = 100_000,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fused IVF+PQ fit-and-encode: the coarse quantizer and all m
    subspace codebooks learn in ONE grouped Lloyd pass, and the full
    corpus is encoded in ONE projection.

    Group -1 carries the full-width coarse geometry (n_lists
    centroids); groups 0..m-1 the PQ subspaces (k codes each) — per
    group the trajectory is bit-identical to running
    ``lloyd_kmeans_partition`` / ``pq_fit_encode`` separately (same
    lowest-id seeds, per-iteration rounding, argmin tie-break;
    groups are independent in grouped Lloyd), so the oracle replay
    is unchanged. The fusion halves the fit's materialization jobs
    (one seed + n_iter centroid checkpoints instead of two of each)
    and, when the fitted table fits the literal-argmin budget, the
    corpus encode emits cid AND code_0..code_{m-1} in one narrow
    shuffle-free projection (no long-form explode, no pivot agg).
    At 100 TB: one sample-bounded fit pass instead of two, one
    corpus pass instead of two.

    Returns (encoded, coarse_cents, codebooks): encoded =
    corpus columns + part_col + code_0..code_{m-1};
    coarse_cents = (part_col, centroid); codebooks =
    (subspace, code, centroid).
    """
    from resume_jd_matcher_spark.operators.ann import (
        _LIT_ASSIGN_MAX_VALUES,
        _argmin_literal,
        lloyd_kmeans_grouped,
    )

    first = corpus.select(vec_col).first()
    dim = len(first[0]) if first is not None and first[0] is not None else 0
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    def long_form(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(-1).alias("subspace"),
                        F.col(vec_col).alias("_sv"),
                    ),
                    *[
                        F.struct(
                            F.lit(s).alias("subspace"),
                            F.slice(vec_col, s * sub + 1, sub).alias("_sv"),
                        )
                        for s in range(m)
                    ],
                )
            ).alias("_e"),
        ).select(
            F.col(id_col),
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_sv"),
        )

    fit = corpus.select(id_col, vec_col).orderBy(id_col).limit(fit_sample_rows)
    cents = lloyd_kmeans_grouped(
        long_form(fit),
        n_clusters=k,
        n_iter=n_iter,
        group_col="subspace",
        id_col=id_col,
        vec_col="_sv",
        round_dp=round_dp,
        n_clusters_by_group={-1: n_lists},
    )
    coarse_cents = cents.filter(F.col("subspace") == -1).select(
        F.col("_cid").alias(part_col), "centroid"
    )
    codebooks = cents.filter(F.col("subspace") >= 0).select(
        "subspace", F.col("_cid").alias("code"), "centroid"
    )
    total_vals = n_lists * dim + m * k * sub
    if 0 < total_vals <= _LIT_ASSIGN_MAX_VALUES:
        # cents is checkpointed — the collect reads the materialized
        # table, bounded at (n_lists + m*k) rows
        by_group: dict = {}
        for r in cents.collect():
            by_group.setdefault(r["subspace"], []).append(
                (r["_cid"], list(r["centroid"]))
            )
        by_group = {g: sorted(cl) for g, cl in by_group.items()}
        dbl = f"transform(`{vec_col}`, x -> double(x))"
        encoded = corpus.select(
            "*",
            _argmin_literal(dbl, by_group[-1]).alias(part_col),
            *[
                _argmin_literal(
                    f"slice({dbl}, {s * sub + 1}, {sub})", by_group[s]
                )
                .cast("int")
                .alias(f"code_{s}")
                for s in range(m)
            ],
        )
        return encoded, coarse_cents, codebooks
    # at-scale route: broadcast-join encode over the long form, then
    # one pivot back to the wide code row
    from resume_jd_matcher_spark.operators.ann import (
        assign_to_centroids_grouped,
    )

    corpus_long = long_form(corpus).select(
        "subspace",
        F.col(id_col),
        F.transform("_sv", lambda x: x.cast("double")).alias("_v"),
    )
    enc = assign_to_centroids_grouped(
        corpus_long,
        cents,
        group_col="subspace",
        id_col=id_col,
        vec_col="_v",
        # total_vals is already known to exceed the literal budget on
        # this branch — skip the collectable probe entirely so the
        # centroid table is never materialized driver-side (r12
        # ADVICE: the default probe collected e.g. 65536×768 coarse
        # centroids before the budget check)
        collectable=False,
    )
    wide = enc.groupBy(id_col).agg(
        F.max(F.when(F.col("subspace") == -1, F.col("_cid")))
        .cast("int")
        .alias(part_col),
        *[
            F.max(F.when(F.col("subspace") == s, F.col("_cid")))
            .cast("int")
            .alias(f"code_{s}")
            for s in range(m)
        ],
    )
    return corpus.join(wide, id_col), coarse_cents, codebooks


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    round_dp: int = 6,
) -> DataFrame:
    """ADC top-k: rank encoded vectors against raw queries.

    Builds the per-query distance table (query × subspace × code —
    |Q| · m · k rows, broadcast), then one equi-join per subspace on
    the vector's code and a row-local sum. Approximate by
    construction (quantization error), deterministic given the
    codebooks; ``dist ≈ Σ_s ||q_s − c_s(code_s)||²`` with the same
    rounding contract as the codebook fit.

    Output: (query_id, id, dist, rn) — ``rn`` the dense top-k rank
    with (dist, id) tie-break.
    """
    dtab = _adc_distance_table(
        queries, codebooks, m, query_id_col, query_vec_col, round_dp
    )
    long_codes = _long_codes(codes, m, id_col)
    summed = (
        long_codes.join(F.broadcast(dtab), ["subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_d"), round_dp).alias("dist"))
    )
    return _rank_topk(summed, k_top, id_col, query_id_col)


def _adc_distance_table(
    queries: DataFrame,
    codebooks: DataFrame,
    m: int,
    query_id_col: str,
    query_vec_col: str,
    round_dp: int,
) -> DataFrame:
    """(query_id, subspace, code, _d): the query's distance to every
    subspace centroid — |Q| · m · k rows, broadcast-sized. This IS the
    query's PQ representation."""
    dim_expr = F.size(query_vec_col)
    q_sub = queries.select(
        query_id_col,
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        F.col(query_vec_col).alias("_qv"),
        (dim_expr / m).cast("int").alias("_sub"),
    ).select(
        query_id_col,
        "subspace",
        F.slice(
            "_qv", F.col("subspace") * F.col("_sub") + 1, F.col("_sub")
        ).alias("_qs"),
    )
    return q_sub.join(F.broadcast(codebooks), "subspace").select(
        query_id_col,
        "subspace",
        "code",
        F.round(squared_l2(F.col("_qs"), F.col("centroid")), round_dp).alias(
            "_d"
        ),
    )


def _long_codes(codes: DataFrame, m: int, id_col: str) -> DataFrame:
    """Wide (id, code_0..code_{m-1}) → long (id, subspace, code); the
    shape the (subspace, code) equi-join ranks on. Nothing
    vector-width survives past this point."""
    return codes.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.sequence(F.lit(0), F.lit(m - 1)).alias("subspace"),
                F.array(*[F.col(f"code_{s}") for s in range(m)]).alias("code"),
            )
        ).alias("_sc"),
    ).select(
        id_col,
        F.col("_sc.subspace").alias("subspace"),
        F.col("_sc.code").alias("code"),
    )


def _rank_topk(
    summed: DataFrame, k_top: int, id_col: str, query_id_col: str
) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy("dist", id_col)
    return (
        summed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_top)
        .select(query_id_col, id_col, "dist", F.col("rn").cast("int").alias("rn"))
    )


def ivf_pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    parted: DataFrame,
    coarse_cents: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    n_probe: int = 2,
    m: int = 4,
    id_col: str = "vec_id",
    part_col: str = "cid",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    round_dp: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """IVF-PQ (the FAISS ``IVFx,PQy`` serving composition): a learned
    coarse quantizer routes each query to its ``n_probe`` nearest
    partitions, and only vectors in those partitions are ADC-ranked
    against the query's broadcast distance table.

    The candidate set is ~N · n_probe / n_lists rows instead of N —
    the IVF pruning — and each candidate costs m code lookups instead
    of a d-dim distance — the PQ compression. Join chain: queries ×
    broadcast coarse centroids (≤n_lists rows) → top-n_probe
    partitions; routed (query, partition) equi-joins the partition
    assignment; candidates equi-join their codes and the broadcast
    distance table; one map-side-combined (query, id) sum. No raw
    corpus vector is touched after the (offline) encode.

    Returns (topk, routed) — routed exposed for tests/diagnostics.
    Deviation from FAISS, documented: codes are fitted on raw vectors,
    not per-partition residuals, keeping every trajectory
    oracle-replayable; recall at equal m suffers slightly, the plan
    shape is identical.
    """
    from pyspark.sql import Window

    q = queries.select(
        query_id_col,
        F.col(query_vec_col),
        F.transform(F.col(query_vec_col), lambda x: x.cast("double")).alias(
            "_qv"
        ),
    )
    cand_cents = q.crossJoin(
        F.broadcast(coarse_cents.select(F.col(part_col), "centroid"))
    )
    d = squared_l2(F.col("_qv"), F.col("centroid"))
    w = Window.partitionBy(query_id_col).orderBy("_d", part_col)
    routed = (
        cand_cents.select(query_id_col, F.col(part_col), d.alias("_d"))
        .withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n_probe)
        .select(query_id_col, part_col)
    )
    cand = routed.join(
        parted.select(F.col(id_col), part_col), part_col
    ).select(query_id_col, id_col)
    dtab = _adc_distance_table(
        queries, codebooks, m, query_id_col, query_vec_col, round_dp
    )
    summed = (
        _long_codes(codes, m, id_col)
        .join(cand, id_col)
        .join(F.broadcast(dtab), [query_id_col, "subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_d"), round_dp).alias("dist"))
    )
    return _rank_topk(summed, k_top, id_col, query_id_col), routed
