"""Round-11 family: graph structure, shard assignment, and
calibration governance over the fixture tables.

Eight operators a 100-TB training-data platform needs beyond the r10
inventory: HITS hub/authority centrality (the eigenvector-family
member pagerank_neardup doesn't cover), synchronous label-propagation
communities (modularity structure, not connectivity — cc/k-core see
components, LPA sees dense sub-groups), rendezvous (HRW) shard
routing with a resize-movement audit, split-conformal prediction
intervals (finite-sample coverage guarantee for any point predictor),
B-cubed cluster-quality evaluation of the dedup clustering, a
multiplicative-weights domain-reweighting pass (DoReMi-style
excess-difficulty upweighting with a frequency-rarity proxy), exact
Shapley-value conversion attribution (the axiomatic member of the
attribution trio), and a Fano-factor burstiness profile of the event
stream.

Determinism discipline (the r11 rolling_beta lesson, applied from
birth): every exposed number in this module is an exact integer or a
fixed-point scaled integer (``*_e6`` / ``*_e9``) computed with
integer half-away-from-zero division — ``(num*2*scale + den) div
(2*den)`` on nonnegative operands — in decimal(38,0) on the Spark
side and HUGEINT in the DuckDB oracle. No float ever reaches the
driver's value hash, so there is no rounding boundary to land on.

Reference parity note: the reference (ShekharK23/resume_jd_matcher)
has no analog for any of these — they are [EXT] operators mandated by
the north star's training-data-pipeline surface (BASELINE.json), in
the same sense as the dedup/eval families (SURVEY.md §2 legend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from resume_jd_matcher_spark.functions.text import seeded_hash32
from resume_jd_matcher_spark.queries import register
from resume_jd_matcher_spark.queries.text_q import (
    SQL_HASH32,
    SQL_TOKS,
    _MINHASH_EST_CTE,
)
from resume_jd_matcher_spark.sources.io import load_table

_DEC = "decimal(38,0)"


def _halfup_div(num: str, den: str, scale: int) -> str:
    """SQL/Spark-shared integer half-up scaled division expression:
    round(scale * num / den) for nonnegative exact-integer operands,
    as pure integer arithmetic (Spark ``div`` truncates toward zero,
    DuckDB ``//`` floors — identical on nonnegative values)."""
    return f"(({num}) * {2 * scale} + ({den})) div (2 * ({den}))"


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the user -> event_type bipartite graph
# ---------------------------------------------------------------------------

_HITS_ITER = 3


def _hits_sql(n_iter: int = _HITS_ITER) -> str:
    """Unrolled HITS authority iteration in HUGEINT fixed-point on
    the compacted co-occurrence matrix M = EᵀE (hub normalization is
    a scalar multiple, so it cancels inside the next authority L1
    normalization — deferring it collapses the user-grain half-step
    entirely; M is |event_types|²-bounded). Each normalization is
    the shared integer half-up division — zero float steps."""
    head = """WITH e AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events
), m AS MATERIALIZED (
  SELECT a.event_type AS t1, b.event_type AS t2, count(*)::HUGEINT AS m
  FROM e a JOIN e b USING (user_id) GROUP BY 1, 2
), a0 AS MATERIALIZED (
  SELECT DISTINCT t1 AS event_type, 1000000000::HUGEINT AS a FROM m
)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(
            f""", a{i}r AS MATERIALIZED (
  SELECT m.t1 AS event_type, sum(m.m * p.a)::HUGEINT AS ar
  FROM m JOIN a{i - 1} p ON p.event_type = m.t2 GROUP BY 1
), a{i} AS MATERIALIZED (
  SELECT event_type,
         ((ar * 2000000000 + t.ta) // (2 * t.ta))::HUGEINT AS a
  FROM a{i}r, (SELECT sum(ar)::HUGEINT AS ta FROM a{i}r) t
)"""
        )
    tail = f"""
SELECT d.event_type, d.n_users, a{n_iter}.a::BIGINT AS authority_e9
FROM (SELECT event_type, count(*)::BIGINT AS n_users FROM e GROUP BY 1) d
JOIN a{n_iter} USING (event_type)
"""
    return head + "".join(its) + tail


@register("hits_scores", _hits_sql())
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A4 [EXT]: HITS (Kleinberg 1999, JACM 46(5)) on the
    user->event_type bipartite graph — users are hubs, event types
    are authorities; {n}-step mutual-reinforcement iteration with L1
    normalization. The eigenvector-centrality member of the graph
    family that pagerank_neardup (random-walk, symmetric graph)
    doesn't cover: HITS separates "broad-activity users" from
    "activity-defining event types" on a DIRECTED bipartite shape.

    Determinism AND scale shape share one trick: hub L1
    normalization is a scalar multiple, so deferring it makes the
    authority recurrence a_k+1 = normalize(M a_k) with M = EᵀE the
    co-occurrence matrix — |event_types|²-bounded BY CONSTRUCTION.
    The fact collapses once to the distinct edge grain, M comes from
    ONE user-keyed self-join hash agg, and the iteration runs
    driver-side on the collected ≤|types|² exact integers (the
    markov_attribution precedent for bounded-grain trajectories);
    every normalization is the integer half-up e9 division, so the
    oracle's unrolled CTEs replay it bit-for-bit. No per-iteration
    job over the user grain at any scale."""
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .persist()
    )
    _PERSISTED.append(e)
    eb = e.select(F.col("user_id"), F.col("event_type").alias("t2"))
    m = (
        e.join(eb, "user_id")
        .groupBy(F.col("event_type").alias("t1"), "t2")
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    # bounded: |event_types|^2 rows
    mm = [(r["t1"], r["t2"], r["m"]) for r in m.collect()]
    deg_rows = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }
    types = sorted(deg_rows)
    a = {t: 10**9 for t in types}
    for _ in range(_HITS_ITER):
        raw = {t: 0 for t in types}
        for t1, t2, cnt in mm:
            raw[t1] += cnt * a[t2]
        tot = sum(raw.values())
        a = {t: (raw[t] * 2 * 10**9 + tot) // (2 * tot) for t in types}
    return spark.createDataFrame(
        [(t, deg_rows[t], a[t]) for t in types],
        "event_type string, n_users bigint, authority_e9 bigint",
    )


# ---------------------------------------------------------------------------
# Synchronous label propagation on the near-dup graph
# ---------------------------------------------------------------------------

_LPA_ITER = 4


def _lpa_sql(n_iter: int = _LPA_ITER, thresh: float = 0.5) -> str:
    """MinHash-LSH edge CTEs + unrolled synchronous label propagation:
    each round every node adopts its neighbors' most frequent label,
    ties broken by the smallest label — all-integer, so the unrolled
    replay is exact."""
    head = f"""WITH {_MINHASH_EST_CTE},
sym AS MATERIALIZED (
  SELECT left_id AS a, right_id AS b FROM est WHERE est_jaccard >= {thresh}
  UNION ALL
  SELECT right_id AS a, left_id AS b FROM est WHERE est_jaccard >= {thresh}
), edges AS MATERIALIZED (
  -- self-loop per node: each node votes for its own current label,
  -- the standard stabilizer against synchronous LPA's 2-cycle on
  -- symmetric pairs (without it a 2-clique oscillates forever)
  SELECT a, b FROM sym
  UNION ALL
  SELECT DISTINCT a, a FROM sym
), l0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, a AS lbl FROM edges
)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(
            f""", v{i} AS (
  SELECT e.a AS node, l.lbl, count(*)::BIGINT AS c
  FROM edges e JOIN l{i - 1} l ON l.node = e.b
  GROUP BY 1, 2
), l{i} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM v{i}
  ) WHERE rn = 1
)"""
        )
    tail = f"""
SELECT l.node AS doc_id, l.lbl AS community, s.community_size
FROM l{n_iter} l
JOIN (SELECT lbl, count(*)::BIGINT AS community_size
      FROM l{n_iter} GROUP BY lbl) s USING (lbl)
"""
    return head + "".join(its) + tail


@register("label_propagation", _lpa_sql())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8 [EXT]: synchronous label-propagation communities (Raghavan
    et al. 2007, Phys. Rev. E 76) on the MinHash near-dup graph (same
    doc_id < 200 slice and est >= 0.5 edges as local_clustering /
    k_core). Connected components answer "what is transitively
    linked"; LPA answers "what forms a densely self-similar block
    INSIDE the linkage" — the community, not the component, is the
    template-family a curation pass reviews as one unit. Fixed
    {n} synchronized rounds, most-frequent label over neighbors PLUS
    a self-vote (the standard stabilizer — without it a symmetric
    pair 2-cycles forever), min-label tie-break: fully integer, so
    the oracle's unrolled CTEs replay the trajectory exactly (the
    pagerank/kmeans discipline without even a rounding step).

    Scale shape: candidates from the banded LSH equi-join (never
    corpus²), then operators/cluster.label_propagation_sync — the
    cost-routed trajectory (driver loop under the edge threshold,
    else per round ONE edge⋈label equi-join + a (node, label) hash
    agg + a max_by top-1 agg; no neighborhood collect_list, so hub
    nodes cost rows, not array width). The size readout is a bounded
    self-agg on the node-grain labels.""".format(n=_LPA_ITER)
    from resume_jd_matcher_spark.operators import dedup
    from resume_jd_matcher_spark.operators.cluster import (
        label_propagation_sync,
    )
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.minhash_lsh_candidates(
        d, n_hashes=16, rows_per_band=4
    ).filter(F.col("est_jaccard") >= 0.5)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("left_id").alias("a"),
                    F.col("right_id").alias("b"),
                ),
                F.struct(
                    F.col("right_id").alias("a"),
                    F.col("left_id").alias("b"),
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    labels = label_propagation_sync(sym, n_iter=_LPA_ITER).persist()
    _PERSISTED.append(labels)
    sizes = labels.groupBy("community").agg(
        F.count("*").cast("bigint").alias("community_size")
    )
    return labels.join(sizes, "community").select(
        F.col("node").alias("doc_id"),
        "community",
        "community_size",
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) shard routing + resize movement audit
# ---------------------------------------------------------------------------

_HRW_SHARDS = 16


@register(
    "shard_rendezvous",
    f"""
WITH h AS (
  SELECT d.doc_id, s.s,
         {SQL_HASH32.format(c="d.doc_id::VARCHAR || '#' || s.s::VARCHAR")} AS hv
  FROM documents d,
       (SELECT unnest(generate_series(0, {_HRW_SHARDS})) AS s) s
), a16 AS (
  SELECT doc_id, s AS shard16 FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id ORDER BY hv DESC, s) AS rn
    FROM h WHERE s < {_HRW_SHARDS}
  ) WHERE rn = 1
), a17 AS (
  SELECT doc_id, s AS shard17 FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id ORDER BY hv DESC, s) AS rn
    FROM h
  ) WHERE rn = 1
)
SELECT a16.shard16 AS shard, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN a17.shard17 <> a16.shard16 THEN 1 ELSE 0 END)::BIGINT
         AS n_moved
FROM a16 JOIN a17 USING (doc_id)
GROUP BY 1
""",
)
def q_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/A4 [EXT]: rendezvous / highest-random-weight sharding
    (Thaler & Ravishankar 1998, IEEE/ACM ToN 6(1)) — every doc routes
    to argmax over shards of hash(doc, shard), which is stateless,
    coordination-free, and minimally disruptive under resize: adding
    shard {n} relocates ONLY docs whose new hash wins (~1/(n+1) of
    the corpus), which this query audits directly by computing the
    {n}-shard and {n}+1-shard assignments side by side and counting
    per-shard departures. The routing layer a 100-TB ingest needs
    under elastic shard counts; complements zorder_curve (locality)
    and skew_salted_join (hot keys).

    Scale shape: linear explode to the doc x (shards+1) grain, ONE
    map-side-combinable max_by aggregation per doc (lexicographic
    (hv, -s) struct max = max hash with min-shard tie-break — no
    window, no shuffle beyond the doc-grain agg), then a
    {n}-row-bounded hash agg. All-integer output.""".format(
        n=_HRW_SHARDS
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_HRW_SHARDS))).alias("s"),
    ).select(
        "doc_id",
        "s",
        seeded_hash32(F.col("doc_id").cast("string"), F.col("s")).alias("hv"),
    )
    pick = F.struct(F.col("hv"), (-F.col("s")).alias("ns"))
    agg = h.groupBy("doc_id").agg(
        F.max(F.when(F.col("s") < _HRW_SHARDS, pick)).alias("m16"),
        F.max(pick).alias("m17"),
    )
    per = agg.select(
        (-F.col("m16.ns")).alias("shard16"),
        (-F.col("m17.ns")).alias("shard17"),
    )
    return per.groupBy(F.col("shard16").alias("shard")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("shard17") != F.col("shard16"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_moved"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval for order totals
# ---------------------------------------------------------------------------

_CONF_ALPHA_PCT = 10  # alpha = 0.10 -> 90% target coverage


@register(
    "conformal_interval",
    f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
         {SQL_HASH32.format(c="o_orderkey::VARCHAR || '#split'")} % 10 AS sp
  FROM orders
), g AS (
  SELECT o_orderpriority, (sum(cents)::HUGEINT // count(*))::BIGINT AS yhat
  FROM o WHERE sp < 5 GROUP BY 1
), cal AS (
  SELECT abs(o.cents - g.yhat) AS s
  FROM o JOIN g USING (o_orderpriority) WHERE o.sp < 5
), k AS (
  SELECT count(*)::BIGINT AS n_calib,
         greatest(1, least(
           ({100 - _CONF_ALPHA_PCT} * (count(*) + 1) + 99) // 100,
           count(*)))::BIGINT AS k
  FROM cal
), cum AS (
  SELECT s, sum(c) OVER (ORDER BY s) AS cum
  FROM (SELECT s, count(*)::BIGINT AS c FROM cal GROUP BY s)
), q AS (
  SELECT min(s)::BIGINT AS qhat_cents FROM cum, k WHERE cum.cum >= k.k
), ev AS (
  SELECT abs(o.cents - g.yhat) AS s
  FROM o JOIN g USING (o_orderpriority) WHERE o.sp >= 5
), st AS (
  SELECT count(*)::BIGINT AS n_eval,
         sum(CASE WHEN ev.s <= q.qhat_cents THEN 1 ELSE 0 END)::BIGINT
           AS n_covered
  FROM ev, q
)
SELECT k.n_calib, st.n_eval, q.qhat_cents, st.n_covered,
       ((st.n_covered::HUGEINT * 2000000 + st.n_eval)
        // (2 * st.n_eval))::BIGINT AS coverage_e6
FROM k, q, st
""",
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: split-conformal prediction interval (Vovk et al.
    2005; Lei et al. 2018 JASA) for order totals under the
    group-mean predictor — hash-split orders into calibration/eval
    halves, q-hat = the ceil((n+1)(1-alpha))-th smallest calibration
    nonconformity |y - yhat| (the EXACT finite-sample order
    statistic, not an interpolated quantile — the coverage guarantee
    lives in that rank), then audit empirical coverage of
    yhat ± q-hat on the held-out half. The distribution-free
    uncertainty wrapper every production scorer should carry;
    completes calibration_eval (probability calibration) with
    interval calibration.

    Determinism: predictor means use integer floor-division on exact
    cents, nonconformities are exact integers, the order statistic is
    a rank lookup, and coverage is the integer half-up e6 ratio — no
    floats anywhere.

    Scale shape: one fact pass builds split + cents; group means are
    a 5-row broadcast; the order statistic comes from a value-grain
    bucket-histogram rank selection (never a full sort of raw
    scores, never a percentile buffer); the eval pass is one
    conditional hash agg with the 1-row q-hat broadcast."""
    from resume_jd_matcher_spark.operators.percentiles import (
        global_value_at_rank,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.pmod(
            seeded_hash32(F.col("o_orderkey").cast("string"), F.lit("split")),
            F.lit(10),
        ).alias("sp"),
    )
    cal_rows = o.filter(F.col("sp") < 5)
    g = cal_rows.groupBy("o_orderpriority").agg(
        F.expr("sum(cents) div count(*)").cast("bigint").alias("yhat")
    )
    cal = cal_rows.join(F.broadcast(g), "o_orderpriority").select(
        F.abs(F.col("cents") - F.col("yhat")).alias("s")
    )
    # order statistic via the shared bucket-histogram rank selection
    # (operators/percentiles.global_value_at_rank) — the first r11
    # spelling ran the generic global_prefix over the ~70k-row score
    # value grain, ~3 stages of pure latency this replaces with one
    # histogram job + one single-bucket rank
    kq = global_value_at_rank(
        cal,
        "s",
        f"({100 - _CONF_ALPHA_PCT} * (_n + 1) + 99) div 100",
    )
    k = kq.select(
        F.col("n").alias("n_calib"),
    )
    q = kq.select(F.col("val").cast("bigint").alias("qhat_cents"))
    ev = (
        o.filter(F.col("sp") >= 5)
        .join(F.broadcast(g), "o_orderpriority")
        .select(F.abs(F.col("cents") - F.col("yhat")).alias("s"))
    )
    st = ev.crossJoin(F.broadcast(q)).agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum(F.when(F.col("s") <= F.col("qhat_cents"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_covered"),
    )
    return (
        k.select("n_calib")
        .crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(q))
        .select(
            "n_calib",
            "n_eval",
            "qhat_cents",
            "n_covered",
            F.expr(_halfup_div("n_covered", "n_eval", 10**6))
            .cast("bigint")
            .alias("coverage_e6"),
        )
    )


# ---------------------------------------------------------------------------
# B-cubed precision/recall of the near-dup clustering vs exact-dup gold
# ---------------------------------------------------------------------------

@register(
    "bcubed_eval",
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
), lab AS (
  SELECT node, min(r) AS pl FROM reach GROUP BY node
), pred AS (
  SELECT d.doc_id, coalesce(lab.pl, d.doc_id) AS p
  FROM docs d LEFT JOIN lab ON lab.node = d.doc_id
), gold AS (
  SELECT doc_id,
         min(doc_id) OVER (
           PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
         ) AS g
  FROM documents WHERE doc_id < 200
), cell AS MATERIALIZED (
  SELECT pred.p, gold.g, count(*)::HUGEINT AS npg
  FROM pred JOIN gold USING (doc_id) GROUP BY 1, 2
), tp AS (
  SELECT c.p,
         ((sum(c.npg * c.npg)::HUGEINT * 2000000000 + np.n_p)
          // (2 * np.n_p))::HUGEINT AS t
  FROM cell c
  JOIN (SELECT p, sum(npg)::HUGEINT AS n_p FROM cell GROUP BY p) np
    USING (p)
  GROUP BY c.p, np.n_p
), tg AS (
  SELECT c.g,
         ((sum(c.npg * c.npg)::HUGEINT * 2000000000 + ng.n_g)
          // (2 * ng.n_g))::HUGEINT AS t
  FROM cell c
  JOIN (SELECT g, sum(npg)::HUGEINT AS n_g FROM cell GROUP BY g) ng
    USING (g)
  GROUP BY c.g, ng.n_g
), nn AS (SELECT sum(npg)::HUGEINT AS n FROM cell),
pr AS (
  SELECT ((sum(t) * 2 + nn.n) // (2 * nn.n))::HUGEINT AS p_e9
  FROM tp, nn GROUP BY nn.n
), rc AS (
  SELECT ((sum(t) * 2 + nn.n) // (2 * nn.n))::HUGEINT AS r_e9
  FROM tg, nn GROUP BY nn.n
)
SELECT nn.n::BIGINT AS n_docs,
       pr.p_e9::BIGINT AS precision_e9,
       rc.r_e9::BIGINT AS recall_e9,
       (CASE WHEN pr.p_e9 + rc.r_e9 = 0 THEN 0
             ELSE (2 * pr.p_e9 * rc.r_e9 * 2 + (pr.p_e9 + rc.r_e9))
                  // (2 * (pr.p_e9 + rc.r_e9)) END)::BIGINT AS f1_e9
FROM nn, pr, rc
""",
)
def q_bcubed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8-eval [EXT]: B-cubed precision/recall/F1 (Bagga & Baldwin
    1998; Amigo et al. 2009's recommended clustering metric) of the
    MinHash near-dup clustering (est >= 0.95 connected components,
    exactly dedup_clusters' labels, singletons kept) against the
    exact-duplicate gold partition (normalized-text fingerprint,
    dedup_exact's key). Per-item precision = |pred-cluster ∩
    gold-cluster| / |pred-cluster|, recall mirrors over the gold
    cluster; item averages reduce to cell algebra: P = (1/N) Σ_p
    (Σ_g n_pg²)/n_p. Completes minhash_pr_eval (pairwise P/R) with
    the cluster-grain metric that punishes giant merged clusters the
    pairwise view under-weights.

    Determinism: cell counts are exact integers; each per-cluster
    term is the integer half-up e9 division, their mean and the F1
    harmonic mean the same — the oracle replays the identical
    fixed-point algebra in HUGEINT, so the metric is bit-stable (the
    e9 per-cluster rounding is part of the metric's definition here,
    documented, error < |clusters|·5e-10).

    Scale shape: labels from the star-contraction components on
    banded candidates (never corpus²); gold labels one fingerprint
    window; the metric itself runs entirely on the (pred x gold)
    CELL grain — bounded by cluster counts, not documents."""
    from resume_jd_matcher_spark.functions.text import fingerprint_md5
    from resume_jd_matcher_spark.operators import cluster as clusterop
    from resume_jd_matcher_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.minhash_lsh_candidates(
        d, n_hashes=16, rows_per_band=4
    ).filter(F.col("est_jaccard") >= 0.95)
    lab = clusterop.dedup_clusters(pairs).select("doc_id", "cluster_rep")
    pred = d.select("doc_id").join(lab, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_rep", "doc_id").alias("p")
    )
    wg = Window.partitionBy(fingerprint_md5(F.col("text")))
    gold = d.select("doc_id", F.min("doc_id").over(wg).alias("g"))
    cell = (
        pred.join(gold, "doc_id")
        .groupBy("p", "g")
        .agg(F.count("*").cast(_DEC).alias("npg"))
    )
    np_ = cell.groupBy("p").agg(F.sum("npg").cast(_DEC).alias("n_p"))
    ng_ = cell.groupBy("g").agg(F.sum("npg").cast(_DEC).alias("n_g"))
    tp = (
        cell.join(np_, "p")
        .groupBy("p", "n_p")
        .agg(F.sum(F.col("npg") * F.col("npg")).cast(_DEC).alias("s2"))
        .select(
            F.expr(_halfup_div("s2", "n_p", 10**9)).cast(_DEC).alias("t")
        )
    )
    tg = (
        cell.join(ng_, "g")
        .groupBy("g", "n_g")
        .agg(F.sum(F.col("npg") * F.col("npg")).cast(_DEC).alias("s2"))
        .select(
            F.expr(_halfup_div("s2", "n_g", 10**9)).cast(_DEC).alias("t")
        )
    )
    nn = cell.agg(F.sum("npg").cast(_DEC).alias("n"))
    pr = (
        tp.crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(F.sum("t").cast(_DEC).alias("st"))
        .select(
            "n", F.expr(_halfup_div("st", "n", 1)).cast(_DEC).alias("p_e9")
        )
    )
    rc = (
        tg.crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(F.sum("t").cast(_DEC).alias("st"))
        .select(F.expr(_halfup_div("st", "n", 1)).cast(_DEC).alias("r_e9"))
    )
    return (
        pr.crossJoin(F.broadcast(rc))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            F.col("p_e9").cast("bigint").alias("precision_e9"),
            F.col("r_e9").cast("bigint").alias("recall_e9"),
            F.when(F.col("p_e9") + F.col("r_e9") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "(2 * p_e9 * r_e9 * 2 + (p_e9 + r_e9))"
                    " div (2 * (p_e9 + r_e9))"
                ).cast("bigint")
            )
            .alias("f1_e9"),
        )
    )


# ---------------------------------------------------------------------------
# Multiplicative-weights domain reweighting (DoReMi-style, rarity proxy)
# ---------------------------------------------------------------------------

@register(
    "doremi_reweight",
    f"""
WITH tok AS (
  SELECT source, unnest({SQL_TOKS.format(c='text')}) AS tok FROM documents
), grp AS (
  SELECT source, tok, count(*)::HUGEINT AS c FROM tok GROUP BY 1, 2
), vocab AS (
  SELECT tok, sum(c)::HUGEINT AS f FROM grp GROUP BY tok
), st AS (
  SELECT g.source, sum(g.c)::HUGEINT AS n_tok,
         sum(g.c * v.f)::HUGEINT AS wf
  FROM grp g JOIN vocab v USING (tok) GROUP BY 1
), gl AS (
  SELECT ((sum(wf) * 2000000 + sum(n_tok)) // (2 * sum(n_tok)))::HUGEINT
           AS gf_e6
  FROM st
), m AS (
  SELECT st.source, st.n_tok,
         ((st.wf * 2000000 + st.n_tok) // (2 * st.n_tok))::HUGEINT AS mf_e6,
         greatest(gl.gf_e6
                  - (st.wf * 2000000 + st.n_tok) // (2 * st.n_tok),
                  0)::HUGEINT AS excess_e6
  FROM st, gl
), w AS (
  SELECT source, n_tok, mf_e6, excess_e6,
         n_tok * (1000000 + excess_e6) AS wraw
  FROM m
)
SELECT source, n_tok::BIGINT AS n_tokens, mf_e6::BIGINT AS mean_freq_e6,
       excess_e6::BIGINT AS excess_e6,
       ((wraw * 2000000 + t.tw) // (2 * t.tw))::BIGINT AS weight_e6
FROM w, (SELECT sum(wraw)::HUGEINT AS tw FROM w) t
""",
)
def q_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/A4 [EXT]: multiplicative-weights domain reweighting — the
    DoReMi recipe (Xie et al. 2023, NeurIPS) of upweighting domains
    with EXCESS difficulty, with token-frequency rarity as the
    difficulty proxy (a source whose tokens are globally rarer is
    harder for a reference unigram model; ln-free, so the whole pass
    stays in exact integers — the exp() Hedge update is linearized to
    the classic (1 + eta*excess) MW step, eta = 1). Output: per-source
    token mass, mean global token frequency (e6 fixed-point), excess
    difficulty, and the renormalized mixture weight. Completes the
    mixture family: dsir_weights matches a TARGET distribution,
    temperature_mixture flattens counts, this one chases excess loss.

    Scale shape: one explode to token occurrences, (source, token)
    hash agg, vocabulary self-join at the token grain (both sides
    grouped — never a raw-occurrence join), then |sources|-bounded
    algebra; every ratio is the shared integer half-up division
    (decimal(38,0) / HUGEINT), so sums of billions of counts stay
    exact."""
    from resume_jd_matcher_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    grp = tok.groupBy("source", "tok").agg(
        F.count("*").cast(_DEC).alias("c")
    )
    vocab = grp.groupBy("tok").agg(F.sum("c").cast(_DEC).alias("f"))
    st = (
        grp.join(vocab, "tok")
        .groupBy("source")
        .agg(
            F.sum("c").cast(_DEC).alias("n_tok"),
            F.sum(F.col("c") * F.col("f")).cast(_DEC).alias("wf"),
        )
    )
    gl = st.agg(
        F.expr(_halfup_div("sum(wf)", "sum(n_tok)", 10**6))
        .cast(_DEC)
        .alias("gf_e6")
    )
    m = st.crossJoin(F.broadcast(gl)).select(
        "source",
        "n_tok",
        F.expr(_halfup_div("wf", "n_tok", 10**6)).cast(_DEC).alias("mf_e6"),
        F.greatest(
            F.col("gf_e6")
            - F.expr(_halfup_div("wf", "n_tok", 10**6)).cast(_DEC),
            F.lit(0).cast(_DEC),
        ).alias("excess_e6"),
    )
    w = m.select(
        "source",
        "n_tok",
        "mf_e6",
        "excess_e6",
        (
            F.col("n_tok")
            * (F.lit(10**6).cast(_DEC) + F.col("excess_e6"))
        ).alias("wraw"),
    )
    tw = w.agg(F.sum("wraw").cast(_DEC).alias("tw"))
    return w.crossJoin(F.broadcast(tw)).select(
        "source",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        F.col("mf_e6").cast("bigint").alias("mean_freq_e6"),
        F.col("excess_e6").cast("bigint").alias("excess_e6"),
        F.expr(_halfup_div("wraw", "tw", 10**6))
        .cast("bigint")
        .alias("weight_e6"),
    )


# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over conversion journeys
# ---------------------------------------------------------------------------

# 2^n coalition enumeration guard. 15, not 20: phi_scaled is the
# n!-scaled credit, and by efficiency sum(phi) = n! * v(N), so any
# single channel's credit can reach n! * total_conversions — at n=20
# that overflows BIGINT with as few as 4 conversions (20!*4 > 2^63;
# r11 ADVICE). 15! ~ 1.3e12 keeps ~7e6 conversions inside int64, and
# a runtime assert below re-checks the exact product per input.
_SHAP_MAX_CH = 15


def _shapley_sql() -> str:
    # factorial via ln/exp is float-unsafe; build it as a self-join
    # product of a small literal spine instead (n <= _SHAP_MAX_CH)
    return """WITH fp AS (
  SELECT user_id, min(ts) AS pts FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), journey AS (
  SELECT e.user_id, e.event_type,
         CASE WHEN fp.pts IS NOT NULL THEN 1 ELSE 0 END AS conv
  FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
  WHERE (fp.pts IS NULL OR e.ts <= fp.pts)
    AND e.event_type <> 'purchase'
), ch AS MATERIALIZED (
  SELECT event_type,
         (row_number() OVER (ORDER BY event_type) - 1)::BIGINT AS idx
  FROM (SELECT DISTINCT event_type FROM journey)
), n AS (SELECT count(*)::BIGINT AS n FROM ch),
um AS (
  SELECT j.user_id, sum(DISTINCT (1::BIGINT << ch.idx))::BIGINT AS mask,
         max(j.conv) AS conv
  FROM journey j JOIN ch USING (event_type)
  GROUP BY j.user_id
), msk AS MATERIALIZED (
  SELECT mask, sum(conv)::HUGEINT AS n_conv FROM um GROUP BY mask
), subsets AS MATERIALIZED (
  SELECT s.s AS smask,
         len(replace(bin(s.s::UBIGINT), '0', ''))::BIGINT AS sz
  FROM (SELECT unnest(generate_series(0::BIGINT,
               ((1::BIGINT << (SELECT n FROM n)) - 1)::BIGINT)) AS s) s
), v AS MATERIALIZED (
  SELECT s.smask, s.sz, coalesce(sum(m.n_conv), 0)::HUGEINT AS v
  FROM subsets s LEFT JOIN msk m ON (m.mask & ~s.smask) = 0
  GROUP BY s.smask, s.sz
), fact AS MATERIALIZED (
  SELECT a.k,
         coalesce((SELECT product(b.k::DOUBLE) FROM
                   (SELECT unnest(generate_series(1, a.k)) AS k) b),
                  1)::HUGEINT AS f
  FROM (SELECT unnest(generate_series(0, (SELECT n FROM n))) AS k) a
), phi AS (
  SELECT ch.event_type,
         sum(fs.f * fns.f * (vi.v - vs.v))::HUGEINT AS phi_scaled
  FROM ch
  JOIN v vs ON (vs.smask & (1::BIGINT << ch.idx)) = 0
  JOIN v vi ON vi.smask = (vs.smask | (1::BIGINT << ch.idx))
  JOIN fact fs ON fs.k = vs.sz
  JOIN fact fns ON fns.k = (SELECT n FROM n) - 1 - vs.sz
  GROUP BY ch.event_type
), tot AS (SELECT sum(phi_scaled)::HUGEINT AS t FROM phi)
SELECT phi.event_type AS channel, phi.phi_scaled::BIGINT AS phi_scaled,
       CASE WHEN tot.t = 0 THEN 0
            ELSE ((phi.phi_scaled * 2000000 + tot.t) // (2 * tot.t))
       END::BIGINT AS share_e6
FROM phi, tot
"""


@register("shapley_attribution", _shapley_sql())
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: exact Shapley-value attribution (Shapley 1953;
    Zhao et al. 2018 for the marketing formulation) — channels are
    players, v(S) = conversions among users whose pre-conversion
    touchset is contained in coalition S, and each channel's credit
    is its exact Shapley sum. The AXIOMATIC member of the attribution
    trio: multitouch divides by position, markov_attribution asks the
    counterfactual, Shapley is the unique efficient/symmetric/
    additive split. phi is exposed scaled by n! (every coalition
    weight |S|!(n-1-|S|)! is then an integer) plus the e6 share —
    exact integers end to end.

    Scale shape: the fact collapses to per-user touchset BITMASKS
    (one conditional agg per user), then to the <= 2^n-bounded
    (mask, conversions) grain; the 2^n coalition enumeration and the
    Shapley sum run driver-side on that bounded census (the
    markov/HITS precedent), guarded at n <= {n} channels. The oracle
    replays the identical enumeration with DuckDB bit algebra.""".format(
        n=_SHAP_MAX_CH
    )
    e = load_table(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    j = (
        e.join(fp, "user_id", "left")
        .filter(
            (F.col("pts").isNull() | (F.col("ts") <= F.col("pts")))
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            F.when(F.col("pts").isNotNull(), 1).otherwise(0).alias("conv"),
        )
    )
    # bounded: |channels| rows
    channels = sorted(
        r["event_type"]
        for r in j.select("event_type").distinct().collect()
    )
    n = len(channels)
    if n > _SHAP_MAX_CH:
        raise ValueError(
            f"shapley_attribution: {n} channels exceeds the 2^n "
            f"enumeration guard ({_SHAP_MAX_CH}); bucket channels first"
        )
    idx = {c: i for i, c in enumerate(channels)}
    idx_map = F.create_map(
        *[x for c, i in idx.items() for x in (F.lit(c), F.lit(i))]
    )
    # per-user DISTINCT bit set via bit_or (a sum would
    # double-count repeated touches of the same channel)
    um = (
        j.select(
            "user_id",
            F.element_at(idx_map, F.col("event_type")).alias("idx"),
            "conv",
        )
        .select(
            "user_id",
            F.expr("shiftleft(cast(1 as bigint), idx)").alias("bit"),
            "conv",
        )
        .groupBy("user_id")
        .agg(
            F.expr("bit_or(bit)").alias("mask"),
            F.max("conv").alias("conv"),
        )
    )
    # bounded: <= 2^n rows
    msk = [
        (r["mask"], r["nc"])
        for r in um.groupBy("mask")
        .agg(F.sum("conv").cast("bigint").alias("nc"))
        .collect()
    ]
    # driver-side exact enumeration (bounded census)
    full = 1 << n
    v = [0] * full
    for mask, nc in msk:
        # add nc to every superset of mask: iterate supersets directly
        s = mask
        while True:
            v[s] += nc
            if s == full - 1:
                break
            s = (s + 1) | mask
    import math

    # exact overflow re-check: sum(phi) = n! * v(N), so the largest
    # possible phi_scaled is factorial(n) * v_full; both the oracle's
    # HUGEINT::BIGINT cast and Spark's bigint schema need it in int64.
    if math.factorial(n) * v[full - 1] >= 2**63:
        raise ValueError(
            f"shapley_attribution: n!*v(N) = {n}! * {v[full - 1]} "
            "overflows the BIGINT phi_scaled exposure; bucket channels "
            "or pre-aggregate conversions first"
        )
    phi = {}
    for c in channels:
        bit = 1 << idx[c]
        acc = 0
        for s in range(full):
            if s & bit:
                continue
            sz = bin(s).count("1")
            w = math.factorial(sz) * math.factorial(n - 1 - sz)
            acc += w * (v[s | bit] - v[s])
        phi[c] = acc
    tot = sum(phi.values())
    rows = [
        (
            c,
            phi[c],
            (phi[c] * 2 * 10**6 + tot) // (2 * tot) if tot else 0,
        )
        for c in channels
    ]
    return spark.createDataFrame(
        rows, "channel string, phi_scaled bigint, share_e6 bigint"
    )


# ---------------------------------------------------------------------------
# Burstiness profile: Fano factor + CV^2 of daily event counts
# ---------------------------------------------------------------------------

@register(
    "burstiness_fano",
    """
WITH d AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                INTERVAL 1 DAY))::DATE AS day
  FROM span
), grid AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM events) t, spine s
), g AS (
  SELECT grid.event_type, coalesce(d.c, 0)::HUGEINT AS c
  FROM grid LEFT JOIN d USING (event_type, day)
), st AS (
  SELECT event_type, count(*)::HUGEINT AS n,
         sum(c)::HUGEINT AS s1, sum(c * c)::HUGEINT AS s2
  FROM g GROUP BY 1
)
SELECT event_type, n::BIGINT AS n_days, s1::BIGINT AS n_events,
       (((n * s2 - s1 * s1) * 2000000 + (n - 1) * s1)
        // nullif(2 * (n - 1) * s1, 0))::BIGINT AS fano_e6,
       ((n * (n * s2 - s1 * s1) * 2000000 + (n - 1) * s1 * s1)
        // nullif(2 * (n - 1) * s1 * s1, 0))::BIGINT AS cv2_e6
FROM st
""",
)
def q_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: burstiness profile of the event stream — Fano
    factor (variance-to-mean ratio of daily counts, 1 under Poisson)
    and the squared coefficient of variation per event type, on the
    zero-filled calendar spine so quiet days count. The
    dispersion-side companion of imr_control_chart (level) and
    permutation_entropy (order): Fano >> 1 flags bursty arrivals that
    break per-day capacity planning and Poisson-assuming samplers.
    Both readouts are pure integer ratios of exact count moments —
    n·Σc² − (Σc)² over scaled denominators — so the fixed-point e6
    exposures are bit-stable.

    Scale shape: ONE (type, day) hash agg over the fact, a
    |types| x |days| calendar-bounded zero-fill grid, one moment agg
    per type; no windows, no joins wider than the bounded grid."""
    e = load_table(spark, sf_dir, "events")
    d = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    span = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    g = grid.join(d, ["event_type", "day"], "left").select(
        "event_type", F.coalesce("c", F.lit(0)).cast(_DEC).alias("c")
    )
    st = g.groupBy("event_type").agg(
        F.count("*").cast(_DEC).alias("n"),
        F.sum("c").cast(_DEC).alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast(_DEC).alias("s2"),
    )
    return st.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s1").cast("bigint").alias("n_events"),
        F.expr(
            "((n * s2 - s1 * s1) * 2000000 + (n - 1) * s1)"
            " div nullif(2 * (n - 1) * s1, cast(0 as decimal(38,0)))"
        )
        .cast("bigint")
        .alias("fano_e6"),
        F.expr(
            "(n * (n * s2 - s1 * s1) * 2000000 + (n - 1) * s1 * s1)"
            " div nullif(2 * (n - 1) * s1 * s1, cast(0 as decimal(38,0)))"
        )
        .cast("bigint")
        .alias("cv2_e6"),
    )
