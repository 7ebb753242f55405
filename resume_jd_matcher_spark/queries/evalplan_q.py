"""Round-10 family: offline evaluation & physical-planning ops.

Closes the remaining analytics gaps a training-data platform runs
beside the curation/ops families: lead-lag cross-correlation and
multi-touch attribution over the event log, counterfactual policy
evaluation (IPS/SNIPS, Horvitz-Thompson 1952 / Dudik et al. 2011),
per-class entropy l-diversity (Machanavajjhala et al. 2007 — the
per-class readout behind k_anonymity's 1-row gate), a histogram join
-cardinality estimator graded by q-error (Moerkotte et al. 2009),
corpus term dispersion (Gries 2008), matryoshka truncation fidelity
(Kusupati et al. 2022), a bin-replicated interval-overlap join, a
columnar encoding advisor (RLE/dict, Abadi et al. 2006), the
Nelson-Aalen cumulative hazard (Aalen 1978 — kaplan_meier's
companion), and WOE/information value (Siddiqi 2006).

All [EXT] per the north star; same engineering contract as the r8/r9
families: identical aliases in Spark and DuckDB, in-query rounding
(+1e-9), exact integer accumulation at decision points, no data-sized
unpartitioned windows, every crossJoin a bounded broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from resume_jd_matcher_spark.queries import register
from resume_jd_matcher_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# Lead-lag cross-correlation of daily view/purchase counts
# ---------------------------------------------------------------------------

_CCF_MAX_LAG = 7


@register(
    "lead_lag_ccf",
    f"""
WITH d AS (
  SELECT ts::DATE AS day,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS v,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS p
  FROM events GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG})) AS lag
), m AS (
  SELECT l.lag, count(*)::BIGINT AS n,
         sum(a.v::HUGEINT) AS sx, sum(b.p::HUGEINT) AS sy,
         sum(a.v::HUGEINT * a.v) AS sxx, sum(b.p::HUGEINT * b.p) AS syy,
         sum(a.v::HUGEINT * b.p) AS sxy
  FROM lags l
  CROSS JOIN d a
  JOIN d b ON b.day = a.day + l.lag::INT
  GROUP BY l.lag
)
SELECT lag::INT AS lag, n AS n_days,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx)::DOUBLE
                              * (n * syy - sy * sy)::DOUBLE) + 1e-9, 4)
            END AS ccf
FROM m
""",
)
def q_lead_lag_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 [EXT]: lead-lag cross-correlation — Pearson r between the
    daily 'view' count and the daily 'purchase' count shifted by
    lag in [-{_CCF_MAX_LAG}, {_CCF_MAX_LAG}] days. The classic
    does-browsing-lead-buying readout (cross-correlation function;
    Box & Jenkins 1970); spearman_daily_corr is its contemporaneous
    rank cousin, this one sweeps the lag axis.

    Scale shape: the fact table collapses to the DAY grain first (one
    map-side-combined hash agg, calendar-bounded), so the lag sweep
    is a |days| x |lags| broadcast join over ~30 rows — the CCF costs
    one fact scan regardless of lag count. Moments accumulate exactly
    in decimal(38,0) / HUGEINT (second-order sums pass bigint around
    ~1e10-count days); the only doubles are the final ratio. A
    zero-variance side yields NULL ccf through the same guarded CASE
    on both engines."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
    )
    lags = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = d.select(F.col("day").alias("a_day"), "v")
    b = d.select(F.col("day").alias("b_day"), "p")
    # second-order moments in decimal(38,0) (the r8 exact-variance
    # discipline): at 100 TB a daily count reaches ~1e9-1e10, so v*v
    # sums to ~1e22 — past bigint — but sits comfortably in 38
    # digits; DuckDB's HUGEINT sums mirror it.
    dec = "decimal(38,0)"
    m = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("b_day") == F.date_add(F.col("a_day"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("v").cast(dec)).alias("sx"),
            F.sum(F.col("p").cast(dec)).alias("sy"),
            F.sum(F.col("v").cast(dec) * F.col("v")).alias("sxx"),
            F.sum(F.col("p").cast(dec) * F.col("p")).alias("syy"),
            F.sum(F.col("v").cast(dec) * F.col("p")).alias("sxy"),
        )
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "lag",
        F.col("n").alias("n_days"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                num.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double"))
                + F.lit(1e-9),
                4,
            ),
        ).alias("ccf"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (last / first / linear)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7


@register(
    "multitouch_attribution",
    f"""
WITH p AS (
  SELECT event_id AS pid, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT event_id AS tid, user_id, ts, event_type
  FROM events WHERE event_type IN ('view', 'click')
), pt AS (
  SELECT p.pid, p.value, t.tid, t.event_type,
         row_number() OVER (PARTITION BY p.pid
                            ORDER BY t.ts DESC, t.tid DESC) AS rn_last,
         row_number() OVER (PARTITION BY p.pid
                            ORDER BY t.ts ASC, t.tid ASC) AS rn_first,
         count(*) OVER (PARTITION BY p.pid) AS n_touches
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.ts <= p.ts
   AND t.ts > p.ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
), credits AS (
  SELECT 'last_touch' AS model, event_type, value AS credit
  FROM pt WHERE rn_last = 1
  UNION ALL
  SELECT 'first_touch', event_type, value FROM pt WHERE rn_first = 1
  UNION ALL
  SELECT 'linear', event_type, value / n_touches FROM pt
)
SELECT model, event_type,
       count(*)::BIGINT AS n_credits,
       round(sum(credit) + 1e-9, 2) AS credited_value
FROM credits GROUP BY model, event_type
""",
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/J2 [EXT]: multi-touch attribution — credit each purchase's
    value to the view/click touches of the same user in the
    {_ATTR_WINDOW_DAYS} days before it, under the three standard
    models (last-touch, first-touch, linear), per touch type. The
    batch counterpart of stream_attribution_join's last-touch-only
    streaming enrich.

    Scale shape: the purchase-touch pair space is a per-user
    time-banded equi-join (user key + time range — never a cross
    product; the band bounds per-user fanout by activity, not corpus
    size), ranked by purchase-partitioned windows (purchase-grain
    partitions, no global window). The three models read the SAME
    pair frame — one scan, one union, one hash agg. Ties inside a
    purchase break on (ts, event_id) identically in both engines.
    Bot-grade skew route (a user whose purchases x touches go
    quadratic): salt the join key to (user, week-of-ts) — the 7-day
    band means a purchase only needs its own and the previous week's
    touches, so the salted join stays exact with 2 replicas."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    pt = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (
            F.col("t_ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAY")
        ),
    )
    w_last = Window.partitionBy("pid").orderBy(
        F.col("t_ts").desc(), F.col("tid").desc()
    )
    w_first = Window.partitionBy("pid").orderBy(
        F.col("t_ts").asc(), F.col("tid").asc()
    )
    w_n = Window.partitionBy("pid")
    pt = pt.select(
        "pid",
        "value",
        "event_type",
        F.row_number().over(w_last).alias("rn_last"),
        F.row_number().over(w_first).alias("rn_first"),
        F.count("*").over(w_n).alias("n_touches"),
    )
    credits = (
        pt.filter(F.col("rn_last") == 1)
        .select(
            F.lit("last_touch").alias("model"),
            "event_type",
            F.col("value").alias("credit"),
        )
        .unionAll(
            pt.filter(F.col("rn_first") == 1).select(
                F.lit("first_touch").alias("model"),
                "event_type",
                F.col("value").alias("credit"),
            )
        )
        .unionAll(
            pt.select(
                F.lit("linear").alias("model"),
                "event_type",
                (F.col("value") / F.col("n_touches")).alias("credit"),
            )
        )
    )
    return credits.groupBy("model", "event_type").agg(
        F.count("*").cast("bigint").alias("n_credits"),
        F.round(F.sum("credit") + F.lit(1e-9), 2).alias("credited_value"),
    )


# ---------------------------------------------------------------------------
# Counterfactual policy evaluation (IPS / SNIPS)
# ---------------------------------------------------------------------------

_IPS_SEGMENTS = 3


@register(
    "ips_policy_eval",
    f"""
WITH logs AS (
  SELECT user_id % {_IPS_SEGMENTS} AS seg, event_type AS act, value AS r
  FROM events
), sa AS (
  SELECT seg, act, count(*)::BIGINT AS n_sa, sum(r) AS r_sa
  FROM logs GROUP BY seg, act
), s AS (
  SELECT seg, sum(n_sa)::BIGINT AS n_s, count(*)::BIGINT AS k_s
  FROM sa GROUP BY seg
), w AS (
  SELECT sa.seg, sa.act, sa.n_sa, sa.r_sa,
         s.n_s::DOUBLE / (s.k_s * sa.n_sa)::DOUBLE AS wgt
  FROM sa JOIN s USING (seg)
), tot AS (
  SELECT sum(n_sa)::BIGINT AS n,
         sum(r_sa) AS sum_r,
         sum(wgt * r_sa) AS sum_wr,
         sum(wgt * n_sa) AS sum_w
  FROM w
)
SELECT 'logged_mean' AS estimator, round(sum_r / n + 1e-9, 4) AS value
FROM tot
UNION ALL
SELECT 'ips', round(sum_wr / n + 1e-9, 4) FROM tot
UNION ALL
SELECT 'snips', round(sum_wr / sum_w + 1e-9, 4) FROM tot
""",
)
def q_ips_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: counterfactual (off-policy) evaluation — estimate the
    value of a UNIFORM target policy from the logged event stream via
    inverse propensity scoring (Horvitz & Thompson 1952) and its
    self-normalized variant SNIPS (Swaminathan & Joachims 2015; Dudik
    et al. 2011). Contexts are user segments (user_id mod
    {_IPS_SEGMENTS}), actions are event types, rewards the event
    value; the behavior policy's propensities are the empirical
    per-segment action frequencies, so the IPS weight is the exact
    integer ratio n_s / (k_s * n_sa) — the evaluator every
    logged-bandit pipeline runs before an online test.

    Scale shape: one (segment x action) hash agg over the fact table
    (15 cells), a segment-grain rollup, and a 1-row finalize — the
    estimators are sufficient-statistic reductions; no per-event
    weight column is ever materialized. The 3-row readout unpivots
    via a bounded union."""
    e = load_table(spark, sf_dir, "events")
    sa = e.select(
        F.pmod(F.col("user_id"), F.lit(_IPS_SEGMENTS)).alias("seg"),
        F.col("event_type").alias("act"),
        F.col("value").alias("r"),
    ).groupBy("seg", "act").agg(
        F.count("*").cast("bigint").alias("n_sa"),
        F.sum("r").alias("r_sa"),
    )
    s = sa.groupBy("seg").agg(
        F.sum("n_sa").cast("bigint").alias("n_s"),
        F.count("*").cast("bigint").alias("k_s"),
    )
    w = sa.join(F.broadcast(s), "seg").withColumn(
        "wgt",
        F.col("n_s").cast("double")
        / (F.col("k_s") * F.col("n_sa")).cast("double"),
    )
    tot = w.agg(
        F.sum("n_sa").cast("bigint").alias("n"),
        F.sum("r_sa").alias("sum_r"),
        F.sum(F.col("wgt") * F.col("r_sa")).alias("sum_wr"),
        F.sum(F.col("wgt") * F.col("n_sa")).alias("sum_w"),
    )
    return (
        tot.select(
            F.lit("logged_mean").alias("estimator"),
            F.round(F.col("sum_r") / F.col("n") + F.lit(1e-9), 4).alias(
                "value"
            ),
        )
        .unionAll(
            tot.select(
                F.lit("ips").alias("estimator"),
                F.round(F.col("sum_wr") / F.col("n") + F.lit(1e-9), 4),
            )
        )
        .unionAll(
            tot.select(
                F.lit("snips").alias("estimator"),
                F.round(F.col("sum_wr") / F.col("sum_w") + F.lit(1e-9), 4),
            )
        )
    )


# ---------------------------------------------------------------------------
# Entropy l-diversity per equivalence class
# ---------------------------------------------------------------------------


@register(
    "entropy_l_diversity",
    """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000)::BIGINT AS sens,
         count(*)::BIGINT AS c
  FROM customer GROUP BY 1, 2, 3
), cls AS (
  SELECT c_nationkey, c_mktsegment,
         sum(c)::BIGINT AS k_size,
         count(*)::BIGINT AS l_distinct,
         exp(ln(sum(c)) - sum(c * ln(c)) / sum(c)) AS ent_l
  FROM cells GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, k_size, l_distinct,
       round(ent_l + 1e-9, 4) AS entropy_l,
       ent_l < 2.0 AS at_risk
FROM cls
""",
)
def q_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: per-class entropy l-diversity of the customer table
    under the (nation, market segment) quasi-identifier with the
    $1000-bucketed balance as the sensitive attribute — the per-class
    drill-down behind k_anonymity's 1-row release gate (same QI and
    sensitive bucketing, cited there; Machanavajjhala et al. 2007
    define entropy l-diversity as exp(H(sensitive | class)) >= l).
    Classes below exp-entropy 2.0 are the ones an adversary cracks
    with one background fact.

    Scale shape: one (QI x sensitive)-grain hash agg (map-side
    combined), then a QI-grain rollup — both dimension-bounded. The
    entropy folds as exp(ln k - sum(c ln c)/k) from exact integer
    cell counts, the same closed form on both engines (one exp/ln
    round-trip, no per-row probabilities)."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    cls = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("k_size"),
        F.count("*").cast("bigint").alias("l_distinct"),
        F.exp(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double")
        ).alias("ent_l"),
    )
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "k_size",
        "l_distinct",
        F.round(F.col("ent_l") + F.lit(1e-9), 4).alias("entropy_l"),
        (F.col("ent_l") < 2.0).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# Histogram join-cardinality estimator, graded by q-error
# ---------------------------------------------------------------------------

_QERR_BUCKETS = 16


def _qerror_one(
    spark: SparkSession,
    sf_dir: str,
    rel: str,
    left: str,
    lkey: str,
    right: str,
    rkey: str,
) -> DataFrame:
    l = load_table(spark, sf_dir, left).select(F.col(lkey).alias("k"))
    r = load_table(spark, sf_dir, right).select(F.col(rkey).alias("k"))

    def hist(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.pmod(F.col("k"), F.lit(_QERR_BUCKETS)).alias("b")
        ).agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("k").cast("bigint").alias("d"),
        )

    est = (
        hist(l)
        .alias("hl")
        .join(hist(r).alias("hr"), "b")
        .agg(
            F.sum(
                F.col("hl.n").cast("double")
                * F.col("hr.n").cast("double")
                / F.greatest(F.col("hl.d"), F.col("hr.d")).cast("double")
            ).alias("est_rows")
        )
    )
    actual = (
        l.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("nl"))
        .join(r.groupBy("k").agg(F.count("*").cast("bigint").alias("nr")), "k")
        .agg(F.sum(F.col("nl") * F.col("nr")).cast("bigint").alias("actual_rows"))
    )
    j = est.crossJoin(F.broadcast(actual)).select(
        F.lit(rel).alias("relation"),
        # round BEFORE the q-error so both engines grade the same
        # (published) estimate — the oracle's outer SELECT recomputes
        # q from the rounded est_rows column.
        F.round(F.col("est_rows") + F.lit(1e-9), 2).alias("est_rows"),
        "actual_rows",
    )
    q = F.greatest(
        F.col("est_rows") / F.col("actual_rows").cast("double"),
        F.col("actual_rows").cast("double") / F.col("est_rows"),
    )
    return j.select(
        "relation",
        "est_rows",
        "actual_rows",
        F.round(q + F.lit(1e-9), 4).alias("q_error"),
    )


_QERR_SQL_ONE = """
SELECT '{rel}' AS relation,
       round((SELECT sum(hl.n::DOUBLE * hr.n::DOUBLE
                         / greatest(hl.d, hr.d)::DOUBLE)
              FROM (SELECT {lkey} % {nb} AS b, count(*)::BIGINT AS n,
                           count(DISTINCT {lkey})::BIGINT AS d
                    FROM {left} GROUP BY 1) hl
              JOIN (SELECT {rkey} % {nb} AS b, count(*)::BIGINT AS n,
                           count(DISTINCT {rkey})::BIGINT AS d
                    FROM {right} GROUP BY 1) hr USING (b)) + 1e-9, 2)
         AS est_rows,
       (SELECT sum(nl * nr)::BIGINT
        FROM (SELECT {lkey} AS k, count(*)::BIGINT AS nl
              FROM {left} GROUP BY 1) gl
        JOIN (SELECT {rkey} AS k, count(*)::BIGINT AS nr
              FROM {right} GROUP BY 1) gr USING (k)) AS actual_rows
"""


@register(
    "join_cardinality_qerror",
    "SELECT relation, est_rows, actual_rows, "
    "round(greatest(est_rows / actual_rows::DOUBLE, "
    "actual_rows::DOUBLE / est_rows) + 1e-9, 4) AS q_error FROM (\n"
    + "\nUNION ALL\n".join(
        _QERR_SQL_ONE.format(
            rel=rel,
            left=left,
            lkey=lkey,
            right=right,
            rkey=rkey,
            nb=_QERR_BUCKETS,
        )
        for rel, left, lkey, right, rkey in [
            ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
            (
                "lineitem_supplier",
                "lineitem",
                "l_suppkey",
                "supplier",
                "s_suppkey",
            ),
            ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ]
    )
    + "\n)",
)
def q_join_cardinality_qerror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A4 [EXT]: histogram join-cardinality estimation graded by
    q-error (Moerkotte et al. 2009) — for three FK joins, estimate the
    join output size from {_QERR_BUCKETS}-bucket per-side histograms
    (per bucket: rows n and distinct keys d; est = sum n1*n2/max(d1,
    d2), the containment assumption every System-R descendant makes),
    then compare against the EXACT size and report q = max(est/
    actual, actual/est). The planner-quality readout behind
    join_plan_advisor's cost ranks: q-error near 1 means the stats
    the advisor plans from are trustworthy.

    Scale shape: per relation, two {_QERR_BUCKETS}-row histogram aggs
    and — for the exact count — two KEY-GRAIN aggs joined key-to-key
    (sum of n1*n2 products in exact BIGINT), so the true cardinality
    is computed WITHOUT materializing a single joined row. The final
    assembly is three 1-row frames unioned."""
    parts = [
        _qerror_one(
            spark, sf_dir, "lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"
        ),
        _qerror_one(
            spark,
            sf_dir,
            "lineitem_supplier",
            "lineitem",
            "l_suppkey",
            "supplier",
            "s_suppkey",
        ),
        _qerror_one(
            spark,
            sf_dir,
            "orders_customer",
            "orders",
            "o_custkey",
            "customer",
            "c_custkey",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Corpus term dispersion (Gries' DP)
# ---------------------------------------------------------------------------

_DISP_TOP_TERMS = 50


@register(
    "term_dispersion",
    f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), st AS (
  SELECT source, count(*)::BIGINT AS n_src FROM toks GROUP BY source
), tot AS (
  SELECT sum(n_src)::BIGINT AS n_tot FROM st
), tf AS (
  SELECT term, source, count(*)::BIGINT AS f FROM toks GROUP BY term, source
), tt AS (
  SELECT term, sum(f)::BIGINT AS f_tot FROM tf GROUP BY term
), top AS (
  SELECT term, f_tot FROM tt ORDER BY f_tot DESC, term LIMIT {_DISP_TOP_TERMS}
), parts AS (
  SELECT top.term, top.f_tot,
         sum(abs(tf.f::DOUBLE / top.f_tot - st.n_src::DOUBLE / tot.n_tot)
             - st.n_src::DOUBLE / tot.n_tot) AS adj
  FROM top
  JOIN tf USING (term)
  JOIN st USING (source)
  CROSS JOIN tot
  GROUP BY top.term, top.f_tot
)
SELECT term, f_tot AS total_freq,
       round(0.5 * (adj + 1.0) + 1e-9, 4) AS dp
FROM parts
""",
)
def q_term_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 [EXT]: corpus term dispersion — Gries' DP (Gries 2008) for
    the top {_DISP_TOP_TERMS} terms: DP = 0.5 * sum_i |p_i - s_i|,
    where p_i is the share of the term's occurrences in source i and
    s_i is source i's share of the whole corpus. DP near 0 = the term
    is spread like the corpus (topical vocabulary); DP near 1 = it
    clumps in one source (boilerplate / source-specific artifacts —
    the curation signal zipf_fit and llr_keyness don't measure).

    Scale shape: one (term x source) hash agg over the token stream,
    a vocab-grain rollup, and a top-k (TakeOrderedAndProject) that
    bounds everything downstream to {_DISP_TOP_TERMS} terms x
    |sources| rows. Sources absent for a term contribute |0 - s_i| =
    s_i, folded algebraically as DP = 0.5*(1 + sum_present(|p-s| -
    s)) so absent cells are NEVER materialized — the identity that
    keeps the pair space posting-list-bounded at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    st = toks.groupBy("source").agg(F.count("*").cast("bigint").alias("n_src"))
    tot = st.agg(F.sum("n_src").cast("bigint").alias("n_tot"))
    tf = toks.groupBy("term", "source").agg(
        F.count("*").cast("bigint").alias("f")
    )
    tt = tf.groupBy("term").agg(F.sum("f").cast("bigint").alias("f_tot"))
    top = tt.orderBy(F.col("f_tot").desc(), F.col("term").asc()).limit(
        _DISP_TOP_TERMS
    )
    s_share = F.col("n_src").cast("double") / F.col("n_tot").cast("double")
    p_share = F.col("f").cast("double") / F.col("f_tot").cast("double")
    parts = (
        tf.join(F.broadcast(top), "term")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("term", "f_tot")
        .agg(F.sum(F.abs(p_share - s_share) - s_share).alias("adj"))
    )
    return parts.select(
        "term",
        F.col("f_tot").alias("total_freq"),
        F.round(
            F.lit(0.5) * (F.col("adj") + F.lit(1.0)) + F.lit(1e-9), 4
        ).alias("dp"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation fidelity
# ---------------------------------------------------------------------------

_MRL_DIMS = (16, 32)

_MRL_SQL_DOT = (
    "list_sum(list_transform(generate_series(1, {d}), "
    "i -> {a}[i]*{b}[i]))"
)


def _mrl_cos_sql(a: str, b: str, d: str) -> str:
    # sqrt(na) * sqrt(nb), NOT sqrt(na*nb): mirrors the engine's
    # functions/vector.cosine (l2_norm(a) * l2_norm(b)) to the ulp so
    # a 4-decimal rounding can never flip between engines.
    dot = _MRL_SQL_DOT.format(a=a, b=b, d=d)
    na = _MRL_SQL_DOT.format(a=a, b=a, d=d)
    nb = _MRL_SQL_DOT.format(a=b, b=b, d=d)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


@register(
    "matryoshka_eval",
    f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings
), pairs AS (
  SELECT a.vec_id,
         {_mrl_cos_sql('a.v', 'b.v', 'len(a.v)')} AS cf,
         {_mrl_cos_sql('a.v', 'b.v', str(_MRL_DIMS[0]))} AS c16,
         {_mrl_cos_sql('a.v', 'b.v', str(_MRL_DIMS[1]))} AS c32
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
), l AS (
  SELECT {_MRL_DIMS[0]} AS trunc_dim, cf, c16 AS ct FROM pairs
  UNION ALL
  SELECT {_MRL_DIMS[1]}, cf, c32 FROM pairs
), m AS (
  SELECT trunc_dim, count(*)::BIGINT AS n,
         sum(ct) AS sx, sum(cf) AS sy, sum(ct * ct) AS sxx,
         sum(cf * cf) AS syy, sum(ct * cf) AS sxy,
         sum(abs(ct - cf)) AS sae
  FROM l GROUP BY trunc_dim
)
SELECT trunc_dim::INT AS trunc_dim, n AS n_pairs,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) + 1e-9, 4)
         AS pearson_r,
       round(sae / n + 1e-9, 4) AS mae
FROM m
""",
)
def q_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 [EXT]: matryoshka truncation fidelity (Kusupati et al. 2022)
    — how well do the first 16/32 dimensions
    of the embedding preserve full-dimension cosine similarity? Over
    consecutive-id vector pairs, computes the truncated and full
    cosines, then reports per truncation width the Pearson agreement
    and the mean absolute error. The readout an embedding platform
    checks before serving truncated vectors from an ANN index tier.

    Scale shape: the pair generator is a consecutive-id self-join
    (equi-join on vec_id+1 — LINEAR in the corpus, never quadratic
    sampling), all three cosines fold per pair in one projection
    (same left-to-right double fold as the oracle's list_transform),
    and the correlation reduces to exact running moments in one hash
    agg per truncation width (a 2-row finalize)."""
    from resume_jd_matcher_spark.functions.vector import cosine

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = e.select(F.col("vec_id"), F.col("embedding").alias("va"))
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, "vec_id").select(
        "vec_id",
        cosine(F.col("va"), F.col("vb")).alias("cf"),
        *[
            cosine(
                F.slice(F.col("va"), 1, d), F.slice(F.col("vb"), 1, d)
            ).alias(f"c{d}")
            for d in _MRL_DIMS
        ],
    )
    stacked = None
    for d in _MRL_DIMS:
        part = pairs.select(
            F.lit(d).alias("trunc_dim"),
            F.col("cf"),
            F.col(f"c{d}").alias("ct"),
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    m = stacked.groupBy("trunc_dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("ct").alias("sx"),
        F.sum("cf").alias("sy"),
        F.sum(F.col("ct") * F.col("ct")).alias("sxx"),
        F.sum(F.col("cf") * F.col("cf")).alias("syy"),
        F.sum(F.col("ct") * F.col("cf")).alias("sxy"),
        F.sum(F.abs(F.col("ct") - F.col("cf"))).alias("sae"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # nullif: a degenerate slice (constant cosines) has no defined
    # correlation; DuckDB's x/0 yields NULL, ANSI Spark would abort.
    den = F.nullif(
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        F.lit(0.0),
    )
    return m.select(
        F.col("trunc_dim").cast("int").alias("trunc_dim"),
        F.col("n").alias("n_pairs"),
        F.round(num / den + F.lit(1e-9), 4).alias("pearson_r"),
        F.round(F.col("sae") / F.col("n") + F.lit(1e-9), 4).alias("mae"),
    )


# ---------------------------------------------------------------------------
# Bin-replicated interval-overlap join over user sessions
# ---------------------------------------------------------------------------

_SESS_GAP_S = 3600
_SESS_PAD_S = 300
_SESS_BIN_S = 600


@register(
    "session_overlap_join",
    f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         floor(epoch(ts))::BIGINT AS sec
  FROM events
), s AS (
  SELECT user_id, ts, event_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL
                OR sec - lag(sec) OVER w > {_SESS_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, sec,
         sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS sid
  FROM s
), sess AS (
  SELECT user_id, sid,
         min(sec) - {_SESS_PAD_S} AS st,
         max(sec) + {_SESS_PAD_S} AS en
  FROM g GROUP BY user_id, sid
), ov AS (
  SELECT greatest(a.st, b.st) AS ov_start
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en
)
SELECT strftime(make_timestamp(ov_start * 1000000::BIGINT),
                '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n_pairs
FROM ov GROUP BY 1
""",
)
def q_session_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 [EXT]: interval x interval overlap join — count co-active
    session pairs across DIFFERENT users per day (sessions are the
    1-hour-gap kind, padded +/-{_SESS_PAD_S}s so "co-active" means
    within 5 minutes of each other; gap convention shared with
    sessionize). range_join_binned joins points to bands; this is the
    genuinely two-sided interval case (Chawda et al. 2014's
    bin-replicate scheme).

    Scale shape: each padded interval is replicated to the
    {_SESS_BIN_S}-second bins it covers (a ~2-3 bin sequence at this
    session length — bin width should track the median interval
    span), pairs meet in an EQUI-join on the bin, and each
    overlapping pair is counted exactly once WITHOUT a distinct
    shuffle: the pair is kept only in the bin containing the later
    interval's start (`bin == (greatest(a.st, b.st)) div bin_s` —
    overlap guarantees both intervals cover that bin). No all-pairs
    path exists at any scale; per-bin fanout is bounded by
    co-activity density, not corpus size.

    The oracle joins the raw interval predicate directly (DuckDB's
    IEJoin handles it); the engine plan is the bin-replicated one."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    brk = F.when(
        F.lag("sec").over(w).isNull()
        | ((F.col("sec") - F.lag("sec").over(w)) > _SESS_GAP_S),
        F.lit(1),
    ).otherwise(F.lit(0))
    g = e.withColumn("brk", brk).withColumn(
        "sid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = g.groupBy("user_id", "sid").agg(
        (F.min("sec") - _SESS_PAD_S).alias("st"),
        (F.max("sec") + _SESS_PAD_S).alias("en"),
    )
    binned = sess.select(
        "user_id",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.expr(f"st div {_SESS_BIN_S}"),
                F.expr(f"en div {_SESS_BIN_S}"),
            )
        ).alias("bin"),
    ).persist()
    # r13 (guide §2.4): both self-join sides are (differently aliased)
    # projections of this frame, so without the registered persist the
    # whole sessionize window + session agg ran twice — the two sides'
    # exchanges differ by projection, so ReuseExchange cannot dedup
    # them. Session-grain rows, bounded by session count, not events.
    from resume_jd_matcher_spark.operators.dedup import _PERSISTED

    _PERSISTED.append(binned)
    a = binned.select(
        F.col("user_id").alias("a_user"),
        F.col("st").alias("a_st"),
        F.col("en").alias("a_en"),
        "bin",
    )
    b = binned.select(
        F.col("user_id").alias("b_user"),
        F.col("st").alias("b_st"),
        F.col("en").alias("b_en"),
        "bin",
    )
    ov = a.join(b, "bin").filter(
        (F.col("a_user") < F.col("b_user"))
        & (F.col("a_st") < F.col("b_en"))
        & (F.col("b_st") < F.col("a_en"))
        & (
            F.col("bin")
            == F.expr(f"(greatest(a_st, b_st)) div {_SESS_BIN_S}")
        )
    )
    # day as an ISO STRING, not DateType: Spark dates arrive in pandas
    # as objects ('2024-01-03') while DuckDB DATEs arrive as
    # datetime64 ('2024-01-03 00:00:00') — the driver's stringified
    # compare would mismatch on representation alone.
    return ov.select(
        F.date_format(
            F.timestamp_seconds(F.greatest("a_st", "b_st")), "yyyy-MM-dd"
        ).alias("day")
    ).groupBy("day").agg(F.count("*").cast("bigint").alias("n_pairs"))


# ---------------------------------------------------------------------------
# Columnar encoding advisor (RLE / DICT / PLAIN)
# ---------------------------------------------------------------------------

_ENC_COLS = ("l_returnflag", "l_linestatus", "l_quantity", "l_partkey")
_ENC_RLE_MIN_RUN = 1.5
_ENC_DICT_MAX_RATIO = 0.001

_ENC_SQL_ONE = """
SELECT '{col}' AS column_name, count(*)::BIGINT AS n_rows,
       count(DISTINCT {col})::BIGINT AS n_distinct,
       sum(CASE WHEN prev IS NULL OR prev <> {col}::VARCHAR
                THEN 1 ELSE 0 END)::BIGINT AS n_runs
FROM (
  SELECT {col},
         lag({col}::VARCHAR) OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber,
                                            {col}::VARCHAR) AS prev
  FROM lineitem
)
"""


@register(
    "encoding_advisor",
    f"""
WITH stats AS (
{"UNION ALL".join(_ENC_SQL_ONE.format(col=c) for c in _ENC_COLS)}
)
SELECT column_name, n_rows, n_distinct, n_runs,
       round(n_rows / n_runs::DOUBLE + 1e-9, 4) AS avg_run_len,
       CASE WHEN n_rows / n_runs::DOUBLE >= {_ENC_RLE_MIN_RUN} THEN 'RLE'
            WHEN n_distinct / n_rows::DOUBLE <= {_ENC_DICT_MAX_RATIO}
              THEN 'DICT'
            ELSE 'PLAIN' END AS advice
FROM stats
""",
)
def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: columnar encoding advisor (the C-Store/Parquet
    encoding-selection rule, Abadi et al. 2006) — for each candidate
    lineitem column, measure rows, distinct values, and value RUNS
    under the table's natural (orderkey, linenumber) order, then
    recommend RLE when the average run is >= {_ENC_RLE_MIN_RUN},
    dictionary when the distinct ratio is <= {_ENC_DICT_MAX_RATIO},
    else plain. The physical-design companion to sort_key_advisor
    (which picks the order; this picks the encoding under it).

    Scale shape: runs are counted inside (orderkey)-partitioned lag
    windows — the natural order's partition key — so the window is
    order-bounded, never global; each column's profile is one
    windowed scan + one hash agg, and the per-column frames union
    into a 4-row readout. Run boundaries at order
    boundaries count once per order on both engines (lag NULL opens
    a run). Decisions derive from exact integer (rows, runs,
    distinct) triples."""
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for c in _ENC_COLS:
        v = F.col(c).cast("string")
        # (orderkey, linenumber) is NOT unique in this corpus — the
        # value itself is the final tie-break so the lag order (and
        # therefore the run count) is deterministic on both engines;
        # equal values sorting together cannot split a run.
        w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", v)
        runs = li.select(
            v.alias("val"), F.lag(v).over(w).alias("prev")
        ).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("val").cast("bigint").alias("n_distinct"),
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("prev") != F.col("val")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
        ).select(F.lit(c).alias("column_name"), "*")
        out = runs if out is None else out.unionAll(runs)
    # nullif: an empty table still emits one agg row per column with
    # 0/0 ratios — NULL on DuckDB, an ANSI abort on Spark unguarded.
    avg_run = F.col("n_rows").cast("double") / F.nullif(
        F.col("n_runs").cast("double"), F.lit(0.0)
    )
    ratio = F.col("n_distinct").cast("double") / F.nullif(
        F.col("n_rows").cast("double"), F.lit(0.0)
    )
    return out.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        F.round(avg_run + F.lit(1e-9), 4).alias("avg_run_len"),
        F.when(avg_run >= _ENC_RLE_MIN_RUN, F.lit("RLE"))
        .when(ratio <= _ENC_DICT_MAX_RATIO, F.lit("DICT"))
        .otherwise(F.lit("PLAIN"))
        .alias("advice"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (kaplan_meier's companion)
# ---------------------------------------------------------------------------

_NA_VALUE_CUTOFF = 90.0  # same conversion event as kaplan_meier


@register(
    "nelson_aalen",
    f"""
WITH u AS (
  SELECT user_id, min(ts::DATE) AS fd, max(ts::DATE) AS ld,
         min(CASE WHEN event_type = 'purchase'
                   AND value >= {_NA_VALUE_CUTOFF}
              THEN ts::DATE END) AS dd
  FROM events GROUP BY user_id
), m AS (
  SELECT max(ld) AS mx, count(*)::BIGINT AS n_users FROM u
), l AS (
  SELECT CASE WHEN dd IS NOT NULL THEN date_diff('day', fd, dd)
              ELSE date_diff('day', fd, m.mx) END AS t,
         CASE WHEN dd IS NOT NULL THEN 1 ELSE 0 END AS death
  FROM u CROSS JOIN m
), g AS (
  SELECT t, sum(death)::BIGINT AS d, sum(1 - death)::BIGINT AS c
  FROM l GROUP BY t
), r AS (
  SELECT t, d,
         (SELECT n_users FROM m)
         - coalesce(sum(d + c) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM g
), s AS (
  SELECT t, d, n_risk,
         sum(d / n_risk::DOUBLE) OVER (ORDER BY t) AS haz,
         sum(d / (n_risk::DOUBLE * n_risk::DOUBLE)) OVER (ORDER BY t) AS var
  FROM r
)
SELECT t::INT AS t_days, n_risk::BIGINT AS n_risk, d AS d_events,
       round(haz + 1e-9, 6) AS cum_hazard,
       round(var + 1e-9, 8) AS hazard_var
FROM s WHERE d > 0
""",
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: Nelson-Aalen cumulative hazard of time-to-
    conversion (Aalen 1978) — H(t) = sum_(t_i <= t) d_i / n_i with
    its standard variance sum d_i / n_i^2, over the SAME span-derived
    time-to-first-high-value-purchase frame as kaplan_meier (value >=
    {_NA_VALUE_CUTOFF}, right-censoring at corpus end, deaths-before-
    censorings tie convention — cited there; KM estimates survival
    multiplicatively, NA estimates hazard additively, and the pair is
    the standard cross-check since exp(-H) ~ S).

    Scale shape: identical to kaplan_meier — fact to user grain (one
    hash agg), user grain to lifetime-day grain (calendar-bounded),
    cumulative windows only over that bounded grain; the corpus max
    date is a 1-row broadcast."""
    e = load_table(spark, sf_dir, "events")
    converted = (F.col("event_type") == "purchase") & (
        F.col("value") >= _NA_VALUE_CUTOFF
    )
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.max(F.to_date("ts")).alias("ld"),
        F.min(F.when(converted, F.to_date("ts"))).alias("dd"),
    )
    m = u.agg(
        F.max("ld").alias("mx"), F.count("*").cast("bigint").alias("n_users")
    )
    life = u.crossJoin(F.broadcast(m)).select(
        F.when(F.col("dd").isNotNull(), F.datediff("dd", "fd"))
        .otherwise(F.datediff("mx", "fd"))
        .alias("t"),
        F.when(F.col("dd").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("death"),
        "n_users",
    )
    g = life.groupBy("t", "n_users").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("death")).cast("bigint").alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.withColumn(
        "n_risk",
        F.col("n_users")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    nd = F.col("n_risk").cast("double")
    s = r.withColumn(
        "haz", F.sum(F.col("d") / nd).over(w_run)
    ).withColumn("var", F.sum(F.col("d") / (nd * nd)).over(w_run))
    return s.filter(F.col("d") > 0).select(
        F.col("t").cast("int").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.round(F.col("haz") + F.lit(1e-9), 6).alias("cum_hazard"),
        F.round(F.col("var") + F.lit(1e-9), 8).alias("hazard_var"),
    )


# ---------------------------------------------------------------------------
# Weight of evidence / information value
# ---------------------------------------------------------------------------


@register(
    "woe_iv",
    """
WITH ord AS (
  SELECT o.o_orderkey, o.o_orderpriority AS prio,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority
), g AS (
  SELECT prio, count(*)::BIGINT AS n_orders,
         sum(bad)::BIGINT AS n_bad,
         sum(1 - bad)::BIGINT AS n_good
  FROM ord GROUP BY prio
), tot AS (
  SELECT sum(n_bad)::BIGINT AS tb, sum(n_good)::BIGINT AS tg FROM g
), w AS (
  SELECT g.prio, g.n_orders, g.n_bad, g.n_good,
         CASE WHEN g.n_good > 0 AND g.n_bad > 0
              THEN ln((g.n_good::DOUBLE / tot.tg)
                      / (g.n_bad::DOUBLE / tot.tb)) END AS woe,
         CASE WHEN g.n_good > 0 AND g.n_bad > 0
              THEN (g.n_good::DOUBLE / tot.tg - g.n_bad::DOUBLE / tot.tb)
                   * ln((g.n_good::DOUBLE / tot.tg)
                        / (g.n_bad::DOUBLE / tot.tb)) END AS ivp
  FROM g CROSS JOIN tot
)
SELECT prio, n_orders, n_bad, n_good,
       round(woe + 1e-9, 4) AS woe,
       round((SELECT sum(ivp) FROM w) + 1e-9, 4) AS iv
FROM w
""",
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: weight of evidence / information value (the credit-
    scoring feature screen, Siddiqi 2006) — does order priority
    predict whether an order has a returned line? Per category:
    WOE = ln((good_share)/(bad_share)); the single-number IV =
    sum (good_share - bad_share) * WOE repeats on every row (IV < 0.02
    = useless feature, > 0.3 = strong). The feature-screening cousin
    of mutual_information (bits, symmetric) and cramers_v (effect
    size): WOE is signed and per-category, which is why scorecards
    use it.

    Scale shape: the order-grain label is one key equi-join + hash
    agg (max over lines); categories are a 5-row grain; the totals
    and the IV are 1-row broadcasts. All shares derive from exact
    BIGINT counts; ln only at the readout. A zero cell (a category
    with no good or no bad orders — absent at this corpus's ~75%
    order-return rate, but data-dependent) yields NULL WOE through
    the SAME guarded CASE on both engines (unguarded, Spark's ANSI
    division would abort on zero bad and DuckDB's ln(0) is a hard
    error on zero good); the IV sum skips NULL categories."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    ord_ = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("bad")
        )
    )
    g = ord_.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("bad").cast("bigint").alias("n_bad"),
        F.sum(F.lit(1) - F.col("bad")).cast("bigint").alias("n_good"),
    )
    tot = g.agg(
        F.sum("n_bad").cast("bigint").alias("tb"),
        F.sum("n_good").cast("bigint").alias("tg"),
    )
    gs = F.col("n_good").cast("double") / F.col("tg").cast("double")
    bs = F.col("n_bad").cast("double") / F.col("tb").cast("double")
    # zero-cell guard (both engines spell the same CASE): a category
    # with no bad orders would divide by zero (ANSI abort) and one
    # with no good orders would ln(0) (a hard DuckDB error) — WOE is
    # undefined there; emit NULL and let the IV sum skip it.
    both = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    w = g.crossJoin(F.broadcast(tot)).select(
        "prio",
        "n_orders",
        "n_bad",
        "n_good",
        F.when(both, F.log(gs / bs)).alias("woe"),
        F.when(both, (gs - bs) * F.log(gs / bs)).alias("ivp"),
    )
    iv = w.agg(F.sum("ivp").alias("iv_sum"))
    return w.crossJoin(F.broadcast(iv)).select(
        "prio",
        "n_orders",
        "n_bad",
        "n_good",
        F.round(F.col("woe") + F.lit(1e-9), 4).alias("woe"),
        F.round(F.col("iv_sum") + F.lit(1e-9), 4).alias("iv"),
    )


# ---------------------------------------------------------------------------
# Tie-aware PR-AUC / average precision (roc_auc's companion)
# ---------------------------------------------------------------------------


@register(
    "pr_auc",
    """
WITH e AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), v AS (
  SELECT value,
         sum(label)::BIGINT AS np_v,
         count(*)::BIGINT AS nt_v
  FROM e GROUP BY value
), p AS (
  SELECT np_v,
         sum(np_v) OVER (ORDER BY value DESC
                         ROWS UNBOUNDED PRECEDING) AS cum_np,
         sum(nt_v) OVER (ORDER BY value DESC
                         ROWS UNBOUNDED PRECEDING) AS cum_nt
  FROM v
), s AS (
  SELECT sum(np_v)::BIGINT AS n_pos,
         sum(np_v * (cum_np::DOUBLE / cum_nt)) AS ap_num
  FROM p
), n AS (
  SELECT count(*)::BIGINT AS n_total FROM e
)
SELECT s.n_pos, n.n_total,
       round(s.ap_num / s.n_pos + 1e-9, 6) AS avg_precision,
       round(s.n_pos::DOUBLE / n.n_total + 1e-9, 6) AS prevalence
FROM s CROSS JOIN n
""",
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: tie-aware PR-AUC / average precision of the event
    value predicting a purchase — roc_auc's companion on the SAME
    label/score frame (cited there); AP is the metric that moves when
    the positive class is rare, which ROC hides (Davis & Goadrich
    2006). Ties share a score block: each block contributes its
    positives times the precision AT THE BLOCK BOUNDARY
    (cum_pos/cum_total in descending-score order) — the deterministic
    block convention, identical on both engines; the prevalence row
    is AP's no-skill baseline.

    Scale shape: same as roc_auc — fact to VALUE-GRAIN agg (map-side
    combined), ONE distributed prefix scan over distinct scores
    descending (operators/prefix.global_prefix multi-sum on the
    negated key; no per-row global rank, no single-partition window),
    1-row finalize. bounds="width" for the same near-uniform-score
    reason as roc_auc."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    e = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    v = e.groupBy("value").agg(
        F.sum("label").cast("bigint").alias("np_v"),
        F.count("*").cast("bigint").alias("nt_v"),
    )
    # descending score order == ascending order of the negated key
    vd = v.select((-F.col("value")).alias("neg_value"), "np_v", "nt_v")
    p = global_prefix(vd, ["neg_value"], ["np_v", "nt_v"], sum_type="bigint")
    s = p.agg(
        F.sum("np_v").cast("bigint").alias("n_pos"),
        F.sum(
            F.col("np_v")
            * (F.col("cum_np_v").cast("double") / F.col("cum_nt_v"))
        ).alias("ap_num"),
        F.sum("nt_v").cast("bigint").alias("n_total"),
    )
    # nullif: a slice with zero positives has no defined AP; DuckDB's
    # x/0 yields NULL, ANSI Spark would abort — match the oracle.
    return s.select(
        "n_pos",
        "n_total",
        F.round(
            F.col("ap_num") / F.nullif(F.col("n_pos").cast("double"), F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("avg_precision"),
        F.round(
            F.col("n_pos").cast("double")
            / F.nullif(F.col("n_total").cast("double"), F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("prevalence"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two derived raters
# ---------------------------------------------------------------------------

_KAPPA_PRICE_CUT = 250_000.0


@register(
    "cohens_kappa",
    f"""
WITH ord AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_totalprice >= {_KAPPA_PRICE_CUT} THEN 1 ELSE 0 END
           AS r1,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
), m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END)::BIGINT AS d
  FROM ord
)
SELECT n, a, b, c, d,
       round((a + d)::DOUBLE / n + 1e-9, 6) AS p_o,
       round(((a + b)::DOUBLE * (a + c) + (c + d)::DOUBLE * (b + d))
             / (n::DOUBLE * n) + 1e-9, 6) AS p_e,
       round(((a + d)::DOUBLE / n
              - ((a + b)::DOUBLE * (a + c) + (c + d)::DOUBLE * (b + d))
                / (n::DOUBLE * n))
             / (1.0 - ((a + b)::DOUBLE * (a + c)
                       + (c + d)::DOUBLE * (b + d)) / (n::DOUBLE * n))
             + 1e-9, 6) AS kappa
FROM m
""",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: Cohen's kappa (Cohen 1960) — chance-corrected
    agreement between two derived binary raters of an order:
    "high-value" (total price >= {_KAPPA_PRICE_CUT}) and "had a
    return" (any line returnflag R). The inter-annotator-agreement
    readout every labeling pipeline reports before trusting a rater
    pool; near-zero here is the honest answer (price and returns are
    independent in this corpus — kappa corrects away the 50%/75%
    marginal agreement raw accuracy would claim).

    Scale shape: order-grain label via one key equi-join + hash agg,
    then the 2x2 confusion matrix in ONE map-side-combined agg and a
    1-row closed-form finalize from exact BIGINT cells."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    ord_ = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("r2")
        )
        .select(
            F.when(F.col("o_totalprice") >= _KAPPA_PRICE_CUT, 1)
            .otherwise(0)
            .alias("r1"),
            "r2",
        )
    )
    m = ord_.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    nd = F.col("n").cast("double")
    p_o = (F.col("a") + F.col("d")).cast("double") / nd
    p_e = (
        (F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c"))
        + (F.col("c") + F.col("d")).cast("double") * (F.col("b") + F.col("d"))
    ) / (nd * nd)
    return m.select(
        "n",
        "a",
        "b",
        "c",
        "d",
        F.round(p_o + F.lit(1e-9), 6).alias("p_o"),
        F.round(p_e + F.lit(1e-9), 6).alias("p_e"),
        # nullif: degenerate margins make p_e exactly 1 (kappa is
        # undefined); DuckDB's x/0 yields NULL, ANSI Spark would
        # abort — match the oracle's NULL.
        F.round(
            (p_o - p_e) / F.nullif(F.lit(1.0) - p_e, F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# t-closeness per equivalence class (ordered-EMD)
# ---------------------------------------------------------------------------


@register(
    "t_closeness",
    """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000)::BIGINT AS sens,
         count(*)::BIGINT AS c
  FROM customer GROUP BY 1, 2, 3
), buckets AS (
  SELECT DISTINCT sens FROM cells
), nb AS (
  SELECT count(*)::BIGINT AS n_buckets FROM buckets
), gdist AS (
  SELECT sens, sum(c)::BIGINT AS gc FROM cells GROUP BY sens
), gtot AS (
  SELECT sum(gc)::BIGINT AS gn FROM gdist
), classes AS (
  SELECT c_nationkey, c_mktsegment, sum(c)::BIGINT AS k_size
  FROM cells GROUP BY 1, 2
), spine AS (
  SELECT cl.c_nationkey, cl.c_mktsegment, cl.k_size, b.sens,
         coalesce(ce.c, 0) AS c, g.gc
  FROM classes cl
  CROSS JOIN buckets b
  JOIN gdist g ON g.sens = b.sens
  LEFT JOIN cells ce
    ON ce.c_nationkey = cl.c_nationkey
   AND ce.c_mktsegment = cl.c_mktsegment
   AND ce.sens = b.sens
), cum AS (
  SELECT c_nationkey, c_mktsegment, k_size,
         sum(c) OVER w AS cum_c,
         sum(gc) OVER w AS cum_g
  FROM spine CROSS JOIN gtot
  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY sens
               ROWS UNBOUNDED PRECEDING)
)
SELECT c_nationkey, c_mktsegment, k_size,
       round(sum(abs(cum_c::DOUBLE / k_size
                     - cum_g::DOUBLE / (SELECT gn FROM gtot)))
             / ((SELECT n_buckets FROM nb) - 1) + 1e-9, 6) AS t_dist,
       (sum(abs(cum_c::DOUBLE / k_size
                - cum_g::DOUBLE / (SELECT gn FROM gtot)))
        / ((SELECT n_buckets FROM nb) - 1)) > 0.2 AS breach
FROM cum
GROUP BY c_nationkey, c_mktsegment, k_size
""",
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: t-closeness (Li, Li & Venkatasubramanian 2007) — per
    (nation, segment) equivalence class, the ordered-attribute Earth
    Mover's Distance between the class's $1000-bucketed balance
    distribution and the GLOBAL one, normalized by (buckets - 1):
    EMD over an ordered domain is the mean absolute cumulative-share
    gap. Completes the governance triptych with k_anonymity (class
    size) and entropy_l_diversity (within-class diversity): a class
    can be large AND diverse yet still leak by SKEW toward one end of
    the sensitive range — exactly what t-closeness catches (breach at
    t > 0.2, the paper's working threshold).

    Scale shape: one (QI x sensitive) hash agg; the class x bucket
    spine is a dimension-bounded crossJoin (|classes| x |buckets|,
    both broadcastable) so ABSENT buckets contribute their cumulative
    gap — a left join against the cell counts fills zeros; cumulative
    windows partition BY CLASS over the <=|buckets| rows inside. All
    shares derive from exact BIGINT counts."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    buckets = cells.select("sens").distinct()
    nb = buckets.agg(F.count("*").cast("bigint").alias("n_buckets"))
    glob = cells.groupBy("sens").agg(F.sum("c").cast("bigint").alias("gc"))
    gtot = glob.agg(F.sum("gc").cast("bigint").alias("gn"))
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("k_size")
    )
    spine = (
        classes.crossJoin(F.broadcast(buckets))
        .join(F.broadcast(glob), "sens")
        .join(
            cells.withColumnRenamed("c", "cell_c"),
            ["c_nationkey", "c_mktsegment", "sens"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k_size",
            "sens",
            F.coalesce(F.col("cell_c"), F.lit(0)).alias("c"),
            "gc",
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        spine.crossJoin(F.broadcast(gtot))
        .crossJoin(F.broadcast(nb))
        .withColumn("cum_c", F.sum("c").over(w))
        .withColumn("cum_g", F.sum("gc").over(w))
    )
    gap = F.abs(
        F.col("cum_c").cast("double") / F.col("k_size")
        - F.col("cum_g").cast("double") / F.col("gn")
    )
    t = F.sum(gap) / (F.first("n_buckets") - F.lit(1)).cast("double")
    return cum.groupBy("c_nationkey", "c_mktsegment", "k_size").agg(
        F.round(t + F.lit(1e-9), 6).alias("t_dist"),
        (t > 0.2).alias("breach"),
    )


# ---------------------------------------------------------------------------
# Two-sample Cramer-von Mises drift test (ks_test's L2 companion)
# ---------------------------------------------------------------------------

_CVM_CRIT_05 = 0.461  # asymptotic 5% critical value (Anderson 1962)


@register(
    "cramer_von_mises",
    f"""
WITH g AS (
  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
         sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c_a,
         sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c_b
  FROM orders GROUP BY 1
), t AS (
  SELECT sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b FROM g
), e AS (
  SELECT c_a + c_b AS w,
         sum(c_a) OVER (ORDER BY cents)::HUGEINT AS ca,
         sum(c_b) OVER (ORDER BY cents)::HUGEINT AS cb
  FROM g
), s AS (
  SELECT sum(w * ((ca * t.n_b - cb * t.n_a)::DOUBLE
                  * (ca * t.n_b - cb * t.n_a)::DOUBLE)) AS num,
         t.n_a, t.n_b
  FROM e CROSS JOIN t GROUP BY t.n_a, t.n_b
), f AS (
  SELECT n_a, n_b,
         num / (n_a::DOUBLE * n_b
                * (n_a + n_b)::DOUBLE * (n_a + n_b)) AS t_stat
  FROM s
)
SELECT n_a, n_b, round(t_stat + 1e-9, 6) AS t_stat,
       (round(t_stat + 1e-9, 6) > {_CVM_CRIT_05}) AS reject
FROM f
""",
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: exact two-sample Cramer-von Mises test between the
    even- and odd-orderkey halves of the order-price distribution —
    ks_test's L2 companion on the SAME dual-ECDF machinery (cited
    there): KS takes the sup of |F_a - F_b| (sensitive to one big
    gap), CvM integrates (F_a - F_b)^2 over the pooled sample
    (sensitive to many small ones — the drift shape PSI-style bin
    tests blur). T = n_a*n_b/(n_a+n_b)^2 * sum_pooled (F_a - F_b)^2;
    reject at the asymptotic 5% critical value {_CVM_CRIT_05}
    (Anderson 1962), compared AFTER rounding on both engines.

    Scale shape: identical to ks_test — counts per DISTINCT cents
    value in one map-side-combined hash agg, both cumulative counters
    on ONE global_prefix bucketed scan, 1-row finalize. The ECDF gap
    is built in EXACT integer cross-multiples (decimal(38,0) /
    HUGEINT); only the square is folded in double (the gap can reach
    n_a*n_b ~ 1e24 at 100 TB, whose square no fixed decimal holds —
    at a 6-decimal readout the 1e-16-relative double error is
    invisible)."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    o = load_table(spark, sf_dir, "orders")
    g = (
        o.select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderkey") % 2).alias("arm"),
        )
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("c_b"),
        )
    )
    t = g.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    e = global_prefix(g, ["cents"], ["c_a", "c_b"], sum_type="bigint")
    dec = "decimal(38,0)"
    gap = (
        F.col("cum_c_a").cast(dec) * F.col("n_b")
        - F.col("cum_c_b").cast(dec) * F.col("n_a")
    ).cast("double")
    s = (
        e.crossJoin(F.broadcast(t))
        .agg(
            F.sum((F.col("c_a") + F.col("c_b")) * gap * gap).alias("num"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    nsum = (F.col("n_a") + F.col("n_b")).cast("double")
    t_stat = F.col("num") / (
        F.col("n_a").cast("double") * F.col("n_b") * nsum * nsum
    )
    rounded = F.round(t_stat + F.lit(1e-9), 6)
    return s.select(
        "n_a",
        "n_b",
        rounded.alias("t_stat"),
        (rounded > _CVM_CRIT_05).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve coordinates (decile cumulative spend shares)
# ---------------------------------------------------------------------------


@register(
    "lorenz_curve",
    """
WITH s AS (
  SELECT c.c_custkey,
         coalesce(sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT), 0)
           AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), t AS (
  SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS total FROM s
), r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, c_custkey) AS rk,
         sum(cents) OVER (ORDER BY cents, c_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM s
), d AS (
  SELECT ((rk - 1) * 10) // t.n AS decile,
         count(*)::BIGINT AS n_cust,
         max(rk) AS max_rk, max(cum) AS max_cum
  FROM r CROSS JOIN t GROUP BY 1, t.n
)
SELECT decile::INT AS decile, n_cust,
       round(max_rk::DOUBLE / t.n + 1e-9, 6) AS pop_share,
       round(max_cum::DOUBLE / t.total + 1e-9, 6) AS spend_share
FROM d CROSS JOIN t
""",
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: Lorenz curve coordinates of customer spend —
    customers ranked by total spend ascending, cut into ten
    equal-population slices, each reporting its cumulative population
    and spend shares (the (x, y) points whose sag below the diagonal
    IS the Gini that gini_concentration reports as one number; Lorenz
    1905). The readout behind "the top decile drives X% of revenue"
    concentration dashboards, and the whale-risk profile a training-
    data mixture planner reads before capping a dominant source.

    Scale shape: spend collapses to the CUSTOMER grain (key equi-join
    + hash agg; zero-order customers kept via the left join), then
    rank and cumulative spend ride ONE distributed prefix scan
    (operators/prefix.global_prefix — no single-partition window over
    the customer grain). bounds="height" deliberately: spend is the
    canonical power-law key, where equal-width buckets funnel most
    customers into one bucket (the SCALE.md skewed-key curve row).
    Exact integer cents throughout; doubles only at the share
    readout. Deciles derive from exact integer division of the rank."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    s = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("cents"))
    )
    t = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    r = global_prefix(
        s, ["cents", "c_custkey"], sum_col="cents", sum_type="bigint",
        bounds="height",
    )
    d = (
        r.crossJoin(F.broadcast(t))
        .groupBy(F.expr("((rank - 1) * 10) div n").alias("decile"), "n", "total")
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.max("rank").alias("max_rk"),
            F.max("cum_sum").alias("max_cum"),
        )
    )
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        "n_cust",
        F.round(
            F.col("max_rk").cast("double") / F.col("n") + F.lit(1e-9), 6
        ).alias("pop_share"),
        F.round(
            F.col("max_cum").cast("double") / F.col("total") + F.lit(1e-9), 6
        ).alias("spend_share"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test (cohens_kappa's significance companion)
# ---------------------------------------------------------------------------

_MCNEMAR_CRIT_05 = 3.841  # chi-square df=1, 5%


@register(
    "mcnemar_test",
    f"""
WITH ord AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_totalprice >= {_KAPPA_PRICE_CUT} THEN 1 ELSE 0 END
           AS r1,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
), m AS (
  SELECT sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c
  FROM ord
)
SELECT b, c,
       round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c) + 1e-9, 6)
         AS chi2,
       (round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c) + 1e-9, 6)
        > {_MCNEMAR_CRIT_05}) AS reject
FROM m
""",
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: McNemar's paired test (McNemar 1947, with Edwards'
    continuity correction) on the SAME two derived raters as
    cohens_kappa (cited there — high-value vs had-a-return): kappa
    measures how much the raters AGREE; McNemar tests whether their
    DISAGREEMENTS are systematically one-sided (b = high-value-only
    vs c = return-only discordant cells; chi2 = (|b-c|-1)^2/(b+c),
    df=1, reject above {_MCNEMAR_CRIT_05}). The marginal-homogeneity
    check a labeling pipeline runs when swapping one rater for
    another — agreement can stay flat while one rater silently
    inflates a class.

    Scale shape: order-grain label join + ONE map-side-combined
    discordant-cell agg + a 1-row closed form from exact BIGINTs.
    Zero discordant pairs -> 0/0 -> NULL chi2/reject identically on
    both engines (DuckDB x/0 is NULL; Spark guards with nullif)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    ord_ = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("r2")
        )
        .select(
            F.when(F.col("o_totalprice") >= _KAPPA_PRICE_CUT, 1)
            .otherwise(0)
            .alias("r1"),
            "r2",
        )
    )
    m = ord_.agg(
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    dev = F.abs(F.col("b") - F.col("c")).cast("double") - F.lit(1.0)
    chi2 = F.round(
        dev * dev / F.nullif((F.col("b") + F.col("c")).cast("double"), F.lit(0.0))
        + F.lit(1e-9),
        6,
    )
    return m.select(
        "b", "c", chi2.alias("chi2"), (chi2 > _MCNEMAR_CRIT_05).alias("reject")
    )
