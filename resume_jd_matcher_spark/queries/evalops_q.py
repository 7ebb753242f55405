"""Evaluation & data-ops queries (round 8, SURVEY.md §2.D/§2.F [EXT]
— the experiment-evaluation and dataset-lifecycle layer a
training-data pipeline runs beside its profiling side): cross-source
vocabulary overlap, hash-armed A/B two-proportion z-test, mutual
information between categorical columns, blocked fuzzy entity
resolution, exact equi-depth histograms, snapshot diffing between
table versions, curriculum ordering by cumulative token budget,
graded nDCG evaluation of the ANN index against exact ground truth,
an EXACT distributed two-sample Kolmogorov-Smirnov test, Kaplan-Meier
churn survival, and daily-revenue autocorrelation.

Reuses `operators/prefix.global_prefix` (the distributed prefix scan,
here with the r8 ``bounds="height"`` sampled equal-height buckets) for
the two global-order queries, and the deterministic LSH building
blocks from `operators/ann` for the retrieval-eval query.

Portability contracts shared with the oracles (FIXTURES.md):
- portable hash = first 8 hex chars of md5 as BIGINT (functions/
  text.hash32; DuckDB twin ``('0x' || substr(md5(x),1,8))::BIGINT``);
- money folded to integer cents before arithmetic;
- every exposed float rounded in-query on both sides (+1e-9 dodge);
- deterministic tie-breaks on every rank/min pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from resume_jd_matcher_spark.queries import register
from resume_jd_matcher_spark.sources.io import load_table

# Oracle-side macros IMPORTED from their canonical modules (vector_q
# for squared-L2 / LSH signature, text_q for the portable 32-bit
# hash) so every oracle shares ONE spelling that stays in lockstep
# with functions/vector.squared_l2, operators/ann.lsh_signature and
# functions/text.hash32 — this module previously carried verbatim
# copies, the third for the hash macro.
from resume_jd_matcher_spark.queries.text_q import SQL_HASH32 as _SQL_H32_C
from resume_jd_matcher_spark.queries.vector_q import (
    SQL_SQL2 as _SQL_SQL2,
)
from resume_jd_matcher_spark.queries.vector_q import (
    _SQL_LSH_SIG,  # noqa: F401  (same package; shared oracle macro)
)

# local placeholder name is {x}; the canonical macro uses {c}
_SQL_H32 = _SQL_H32_C.replace("{c}", "{x}")


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap
# ---------------------------------------------------------------------------

@register(
    "vocab_overlap",
    """
WITH v AS (
  SELECT DISTINCT source, tok
  FROM (
    SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE tok != ''
), sz AS (
  SELECT source, count(*)::BIGINT AS vocab FROM v GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS n_common
  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
       i.n_common,
       round(i.n_common
             / (sa.vocab + sb.vocab - i.n_common)::DOUBLE + 1e-9, 6) AS jaccard
FROM inter i
JOIN sz sa ON sa.source = i.source_a
JOIN sz sb ON sb.source = i.source_b
""",
)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/A4 [EXT]: cross-source vocabulary overlap matrix — pairwise
    Jaccard between each source's distinct-token vocabulary, the
    source-redundancy screen a data-mixing run consults before
    weighting corpora (near-identical vocabularies = overlapping
    crawls; disjoint = genuinely new domain).

    Scale shape: one tokenize+explode pass reduced to the DISTINCT
    (source, token) grain (vocabulary-sized, not corpus-sized); the
    pair intersection is a token-keyed self-EQUI-join of that grain —
    never a doc×doc or source×source cross join — and the output is
    bounded by |sources|² rows. Per-token fan-out of the join is
    |sources per token| ≤ |sources| (a constant), so candidate pairs
    stay linear in vocabulary size."""
    from resume_jd_matcher_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    v = (
        d.select(
            "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count("*").cast("bigint").alias("vocab"))
    a = v.select(F.col("source").alias("source_a"), "tok")
    b = v.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sz.select(
        F.col("source").alias("source_a"), F.col("vocab").alias("vocab_a")
    )
    sb = sz.select(
        F.col("source").alias("source_b"), F.col("vocab").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
                ).cast("double")
                + F.lit(1e-9),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# A/B test: two-proportion z
# ---------------------------------------------------------------------------

@register(
    "ab_test_ztest",
    f"""
WITH u AS (
  SELECT user_id,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > count(*) THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), s AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS conv_a,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS conv_b
  FROM u
)
, t AS (
  SELECT n_a, n_b, conv_a, conv_b,
         conv_a / nullif(n_a, 0)::DOUBLE AS p_a,
         conv_b / nullif(n_b, 0)::DOUBLE AS p_b,
         sqrt(((conv_a + conv_b) / (n_a + n_b)::DOUBLE)
              * (1.0 - (conv_a + conv_b) / (n_a + n_b)::DOUBLE)
              * (1.0 / nullif(n_a, 0) + 1.0 / nullif(n_b, 0))) AS se
  FROM s
)
SELECT n_a, n_b, conv_a, conv_b,
       round(p_a + 1e-9, 4) AS rate_a,
       round(p_b + 1e-9, 4) AS rate_b,
       round((p_a - p_b) / nullif(se, 0.0) + 1e-9, 4) AS z,
       coalesce(abs(round((p_a - p_b) / nullif(se, 0.0) + 1e-9, 4)) > 1.96,
                false) AS significant
FROM t
""",
)
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: two-proportion z-test between hash-assigned
    experiment arms — the standard A/B readout. The per-user metric is
    "purchase share above the uniform 1/5 expectation" (compared in
    integers: 5·purchases > total), which stays non-degenerate at
    every sf — a did-user-ever-X metric saturates to 100% on dense
    fixtures, collapsing the pooled variance to zero. Arm assignment
    is the portable md5-prefix hash of user_id, so the split is
    reproducible across engines, runs and cluster sizes (no RNG
    state); `significant` compares the ROUNDED z against 1.96 on both
    sides (coalesced to FALSE when variance is zero) so the boolean
    can't flip on a last-bit float diff.

    Scale shape: one user-grain hash agg over events (map-side
    combined), then a single 1-row conditional aggregate — no pivot,
    no second shuffle; everything after the user agg is O(1)."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(
            F.when(
                5
                * F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                > F.count("*"),
                1,
            )
            .otherwise(0)
            .alias("conv")
        )
        .withColumn(
            "arm",
            hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab")))
            % 2,
        )
    )
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    # nullif guards on every divisor (one-sided splits, zero-variance
    # pooled rate) — division by NULL is NULL on both engines, while a
    # bare /0 aborts under Spark ANSI and skews DuckDB to inf.
    p_a = F.col("conv_a") / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
    p_b = F.col("conv_b") / F.nullif(F.col("n_b"), F.lit(0)).cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.nullif(F.col("n_a"), F.lit(0))
            + F.lit(1.0) / F.nullif(F.col("n_b"), F.lit(0))
        )
    )
    z = F.round(
        (p_a - p_b) / F.nullif(se, F.lit(0.0)) + F.lit(1e-9), 4
    )
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a + F.lit(1e-9), 4).alias("rate_a"),
        F.round(p_b + F.lit(1e-9), 4).alias("rate_b"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(1.96), F.lit(False)).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# Mutual information between categorical columns
# ---------------------------------------------------------------------------

@register(
    "mutual_information",
    """
WITH cells AS (
  SELECT c_nationkey AS x, c_mktsegment AS y, count(*)::BIGINT AS nij
  FROM customer GROUP BY 1, 2
), n AS (SELECT sum(nij)::BIGINT AS n FROM cells),
rx AS (SELECT x, sum(nij)::BIGINT AS ri FROM cells GROUP BY x),
cy AS (SELECT y, sum(nij)::BIGINT AS cj FROM cells GROUP BY y),
mi AS (
  SELECT sum((nij / n.n::DOUBLE)
             * ln((nij::DOUBLE * n.n) / (ri::DOUBLE * cj))) AS mi_nats
  FROM cells JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN n
),
hx AS (SELECT -sum((ri / n.n::DOUBLE) * ln(ri / n.n::DOUBLE)) AS h
       FROM rx CROSS JOIN n),
hy AS (SELECT -sum((cj / n.n::DOUBLE) * ln(cj / n.n::DOUBLE)) AS h
       FROM cy CROSS JOIN n)
SELECT round(mi.mi_nats + 1e-9, 6) AS mi_nats,
       round(mi.mi_nats / least(hx.h, hy.h) + 1e-9, 6) AS nmi,
       n.n AS n_rows
FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN n
""",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: mutual information I(nation; segment) in nats plus
    min-entropy-normalized NMI — the magnitude companion to
    `chi2_independence` (chi² answers "is there dependence?", MI
    answers "how much?"). Only observed cells contribute (0·ln0 = 0),
    so no zero-cell completion is needed.

    Scale shape: one (x, y) hash agg over the fact table; marginals,
    entropies and the MI sum all run on dimension-bounded
    intermediates with broadcast joins. The log ratio is computed in
    DOUBLE on both sides so nij·n never overflows int64 at any sf."""
    c = load_table(spark, sf_dir, "customer")
    cells = (
        c.groupBy(
            F.col("c_nationkey").alias("x"), F.col("c_mktsegment").alias("y")
        )
        .agg(F.count("*").alias("nij"))
    )
    n = cells.agg(F.sum("nij").cast("bigint").alias("n"))
    rx = cells.groupBy("x").agg(F.sum("nij").cast("bigint").alias("ri"))
    cy = cells.groupBy("y").agg(F.sum("nij").cast("bigint").alias("cj"))
    mi = (
        cells.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (F.col("nij") / F.col("n").cast("double"))
                * F.log(
                    (F.col("nij").cast("double") * F.col("n"))
                    / (F.col("ri").cast("double") * F.col("cj"))
                )
            ).alias("mi_nats")
        )
    )
    hx = rx.crossJoin(F.broadcast(n)).agg(
        (-F.sum(
            (F.col("ri") / F.col("n").cast("double"))
            * F.log(F.col("ri") / F.col("n").cast("double"))
        )).alias("h_x")
    )
    hy = cy.crossJoin(F.broadcast(n)).agg(
        (-F.sum(
            (F.col("cj") / F.col("n").cast("double"))
            * F.log(F.col("cj") / F.col("n").cast("double"))
        )).alias("h_y")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n))
        .select(
            F.round(F.col("mi_nats") + F.lit(1e-9), 6).alias("mi_nats"),
            F.round(
                F.col("mi_nats") / F.least("h_x", "h_y") + F.lit(1e-9), 6
            ).alias("nmi"),
            F.col("n").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution
# ---------------------------------------------------------------------------

@register(
    "entity_resolution",
    """
WITH clean AS (
  SELECT c_custkey, c_name, substr(c_name, 15, 4) AS blk FROM customer
), dirty AS (
  SELECT c_custkey AS true_key,
         regexp_replace(c_name, '^Customer', 'Custmer') AS dirty_name,
         substr(c_name, 15, 4) AS blk
  FROM customer
), cand AS (
  SELECT d.true_key, c.c_custkey,
         levenshtein(d.dirty_name, c.c_name) AS dist
  FROM dirty d JOIN clean c USING (blk)
), best AS (
  SELECT true_key, c_custkey AS matched_key, dist,
         row_number() OVER (PARTITION BY true_key
                            ORDER BY dist, c_custkey) AS rn
  FROM cand
)
SELECT true_key, matched_key, dist::INT AS dist,
       (matched_key = true_key) AS correct
FROM best WHERE rn = 1
""",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J4 [EXT]: blocked fuzzy record linkage — a deterministically
    typo'd copy of every customer name ('Customer' → 'Custmer', edit
    distance 1) is matched back to the clean registry by minimum
    Levenshtein within equi-join blocks keyed on the stable digit
    suffix; `correct` verifies each match recovered its source row.
    The typo'd side is derived in-query so the oracle replays it
    exactly (same pattern as keyword_tag_broadcast's deterministic
    pad).

    Scale shape: candidate generation is a plain equi-join on the
    block key — NEVER a name×name cross join; the min-distance pick
    is a window over each dirty record's candidates (bounded by block
    size). Blocking-key granularity must grow with the corpus
    (standard ER practice — here 4 suffix digits = 10k blocks, so
    candidate pairs are ~n²/10⁴; a production run over n≫10⁶ keys
    widens the suffix or blocks on a phonetic key to keep per-block
    size O(1))."""
    c = load_table(spark, sf_dir, "customer")
    clean = c.select(
        "c_custkey", "c_name", F.substring("c_name", 15, 4).alias("blk")
    )
    dirty = c.select(
        F.col("c_custkey").alias("true_key"),
        F.regexp_replace("c_name", "^Customer", "Custmer").alias(
            "dirty_name"
        ),
        F.substring("c_name", 15, 4).alias("blk"),
    )
    cand = dirty.join(clean, "blk").select(
        "true_key",
        "c_custkey",
        F.levenshtein("dirty_name", "c_name").alias("dist"),
    )
    w = Window.partitionBy("true_key").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "true_key",
            F.col("c_custkey").alias("matched_key"),
            F.col("dist").cast("int").alias("dist"),
            (F.col("c_custkey") == F.col("true_key")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Exact equi-depth histogram (distributed prefix scan)
# ---------------------------------------------------------------------------

_EQD_BINS = 16


@register(
    "equi_depth_histogram",
    f"""
WITH r AS (
  SELECT o_totalprice,
         ntile({_EQD_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin::INT AS bin, count(*)::BIGINT AS n_rows,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM r GROUP BY bin
""",
)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: EXACT equi-depth (equal-frequency) histogram of
    order prices — the profiling primitive behind range-partition
    bounds, CBO statistics and drift baselines. Bin membership
    replays SQL ntile() semantics exactly (first n%k bins take the
    extra row) on top of the distributed global rank.

    Scale shape: the global rank comes from operators/prefix.
    global_prefix with equal-WIDTH bucket bounds: o_totalprice is a
    sum of independent line amounts — bell-shaped, not power-law —
    so width_bucket load balance is fine and the plan drops the
    height mode's percentile-approx job + eager checkpoint (r13:
    measured 1.8 s → 0.7 s warm at sf0.1; the skewed-grain callers
    in mining_q/evalops_q keep bounds="height", and the skew curve
    in SCALE.md still certifies that path). One bucketed shuffle of
    the fact, the only unpartitioned window over n_buckets summary
    rows; the ntile arithmetic is a pure projection against one
    broadcast 1-row count. checkpoint=False: the input is a bare
    2-column scan projection, so re-reading the pruned parquet scan
    per internal consumer beats materializing the fact on executors
    at large sf."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # sum_col=None: only the rank is consumed — no reason to carry a
    # fact-sized running price total through the bucket windows
    ranked = global_prefix(
        o,
        ["o_totalprice", "o_orderkey"],
        None,
        bounds="width",
        checkpoint=False,
    )
    n = o.agg(F.count("*").alias("_n"))
    size = F.floor(F.col("_n") / _EQD_BINS)
    rem = F.col("_n") % _EQD_BINS
    # ntile: ranks 1..rem*(size+1) fill the first rem bins (size+1
    # rows each); the rest fill bins rem+1..k (size rows each). The
    # greatest() guard only matters when n < k (size = 0), where the
    # first branch already covers every rank.
    binned = ranked.crossJoin(F.broadcast(n)).withColumn(
        "bin",
        (
            F.when(
                F.col("rank") <= rem * (size + 1),
                F.floor((F.col("rank") - 1) / (size + 1)),
            ).otherwise(
                rem
                + F.floor(
                    (F.col("rank") - 1 - rem * (size + 1))
                    / F.greatest(size, F.lit(1))
                )
            )
            + 1
        ).cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff between table versions
# ---------------------------------------------------------------------------

@register(
    "snapshot_diff",
    """
WITH base AS (
  SELECT o_orderkey,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
  FROM orders
), v_old AS (
  SELECT * FROM base WHERE o_orderkey % 1000 != 0
), v_new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN (cents * 11) // 10
              ELSE cents END AS cents
  FROM base WHERE o_orderkey % 997 != 0
), diff AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.cents != n.cents THEN 'changed'
              ELSE 'unchanged' END AS status,
         coalesce(o.cents, 0) AS old_cents,
         coalesce(n.cents, 0) AS new_cents
  FROM v_old o FULL OUTER JOIN v_new n ON o.o_orderkey = n.o_orderkey
)
SELECT status, count(*)::BIGINT AS n_rows,
       sum(old_cents)::BIGINT AS sum_old_cents,
       sum(new_cents)::BIGINT AS sum_new_cents
FROM diff GROUP BY status
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A4 [EXT]: added/removed/changed/unchanged reconciliation
    between two snapshot versions of a keyed table — the audit query
    behind every CDC pipeline and dataset-version release note. The
    two versions are derived deterministically from orders in-query
    (v_old drops keys ≡0 mod 1000 → those appear 'added'; v_new
    bumps prices on keys ≡0 mod 7 by exactly 10% in integer cents →
    'changed'; v_new drops keys ≡0 mod 997 → 'removed') so the
    oracle replays both sides bit-for-bit.

    Scale shape: ONE full-outer shuffle join on the snapshot key —
    the canonical diff plan — followed by a 4-group hash agg; change
    detection compares integer cents, so no float-equality trap."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    v_old = base.filter(F.col("o_orderkey") % 1000 != 0)
    v_new = base.filter(F.col("o_orderkey") % 997 != 0).select(
        "o_orderkey",
        # integer DIV, not floor(x*11/10.0): the double spelling only
        # matches the oracle's exact // while cents*11 < 2^53 — DIV on
        # bigint is exact for the whole int64 domain.
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.expr("CAST((cents * 11) DIV 10 AS BIGINT)"),
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    o = v_old.select(
        F.col("o_orderkey").alias("ok"), F.col("cents").alias("old_cents")
    )
    nn = v_new.select(
        F.col("o_orderkey").alias("nk"), F.col("cents").alias("new_cents")
    )
    diff = o.join(nn, o.ok == nn.nk, "full_outer").select(
        F.when(F.col("ok").isNull(), F.lit("added"))
        .when(F.col("nk").isNull(), F.lit("removed"))
        .when(F.col("old_cents") != F.col("new_cents"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.coalesce("old_cents", F.lit(0)).alias("old_cents"),
        F.coalesce("new_cents", F.lit(0)).alias("new_cents"),
    )
    return diff.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("old_cents").cast("bigint").alias("sum_old_cents"),
        F.sum("new_cents").cast("bigint").alias("sum_new_cents"),
    )


# ---------------------------------------------------------------------------
# Token-budget curriculum phases (distributed prefix scan)
# ---------------------------------------------------------------------------

@register(
    "token_budget_curriculum",
    """
WITH d AS (SELECT doc_id, n_chars FROM documents),
t AS (SELECT sum(n_chars)::BIGINT AS total FROM d),
r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rank,
         sum(n_chars) OVER (ORDER BY n_chars, doc_id
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_chars
  FROM d
)
SELECT r.doc_id, r.n_chars, r.rank::BIGINT AS rank,
       round(r.cum_chars / t.total::DOUBLE + 1e-9, 6) AS cum_share,
       CASE WHEN r.cum_chars / t.total::DOUBLE <= 0.10 THEN 'warmup'
            WHEN r.cum_chars / t.total::DOUBLE <= 0.70 THEN 'core'
            ELSE 'polish' END AS phase
FROM r CROSS JOIN t
""",
)
def q_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling/W3 [EXT]: curriculum ordering — documents ranked
    easiest-first (length proxy, doc_id tie-break) with each doc's
    cumulative share of the total character budget and a
    warmup/core/polish phase cut at 10%/70% of CUMULATIVE budget (a
    token-budget-aware curriculum: phases are sized by what the
    model will consume, not by doc counts).

    Scale shape: the global rank AND running character total come
    from one operators/prefix.global_prefix pass (bucketed shuffle,
    no single-partition window); the total is one broadcast 1-row
    agg. Phase cuts compare the same exact-integer ratio on both
    engines, so the boundary assignment can't drift.
    bounds="height": document lengths are heavy-tailed (the
    spend/length power-law case the measured skew curve favors
    equal-height for); checkpoint=False: the input is a bare
    2-column scan projection — re-reading the pruned scan beats
    materializing the fact (see operators/prefix docstring)."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_prefix(
        d,
        ["n_chars", "doc_id"],
        "n_chars",
        sum_type="bigint",
        bounds="height",
        checkpoint=False,
    )
    t = d.agg(F.sum("n_chars").cast("bigint").alias("total"))
    share = F.col("cum_sum") / F.col("total").cast("double")
    return ranked.crossJoin(F.broadcast(t)).select(
        "doc_id",
        "n_chars",
        F.col("rank").cast("bigint").alias("rank"),
        F.round(share + F.lit(1e-9), 6).alias("cum_share"),
        F.when(share <= 0.10, F.lit("warmup"))
        .when(share <= 0.70, F.lit("core"))
        .otherwise(F.lit("polish"))
        .alias("phase"),
    )


# ---------------------------------------------------------------------------
# Graded nDCG evaluation of the ANN index
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_PLANES = 8


@register(
    "ndcg_eval",
    f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), c AS (
  SELECT vec_id, e AS ce,
         {_SQL_LSH_SIG.format(a='e', planes=_NDCG_PLANES)} AS bucket
  FROM e0
), q AS (
  SELECT vec_id AS query_id, e AS qe,
         {_SQL_LSH_SIG.format(a='e', planes=_NDCG_PLANES)} AS qbucket
  FROM e0 WHERE vec_id < 3
), d AS (
  SELECT q.query_id, c.vec_id,
         {_SQL_SQL2.format(a='qe', b='ce')} AS dist
  FROM c JOIN q ON c.bucket = q.qbucket
), lsh AS (
  SELECT query_id, vec_id, rn AS lrank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM d) WHERE rn <= {_NDCG_K}
), xd AS (
  SELECT q.query_id, c0.vec_id,
         {_SQL_SQL2.format(a='qe', b='ce')} AS dist
  FROM (SELECT vec_id, e AS ce FROM e0) c0, q
), ex AS (
  SELECT query_id, vec_id, rn AS xrank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM xd) WHERE rn <= {_NDCG_K}
), dcg AS (
  SELECT l.query_id,
         sum(coalesce({_NDCG_K + 1} - ex.xrank, 0)
             / log2(l.lrank + 1.0)) AS dcg
  FROM lsh l LEFT JOIN ex
    ON l.query_id = ex.query_id AND l.vec_id = ex.vec_id
  GROUP BY l.query_id
), idcg AS (
  SELECT query_id,
         sum(({_NDCG_K + 1} - xrank) / log2(xrank + 1.0)) AS idcg
  FROM ex GROUP BY query_id
)
SELECT i.query_id,
       round(coalesce(d.dcg, 0) + 1e-9, 6) AS dcg,
       round(i.idcg + 1e-9, 6) AS idcg,
       round(coalesce(d.dcg, 0) / i.idcg + 1e-9, 6) AS ndcg
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id
""",
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3/V5 [EXT]: graded nDCG@10 of the deterministic-LSH index
    against exact brute-force ground truth, per query — the ranked
    companion to `ann_recall_eval` (recall says WHETHER the truth
    showed up; nDCG says WHERE it landed). Relevance is graded by
    exact rank (best neighbor = 10 … 10th = 1, absent = 0); IDCG is
    the exact list's own DCG, so ndcg = 1.0 means the index ordered
    the true top-10 perfectly.

    Scale shape: the LSH list comes from a bucket EQUI-join (corpus
    hash-partitioned on bucket id, broadcast query side); the exact
    list is a broadcast-bounded crossJoin (|queries| rows). Both
    rankings use UNROUNDED distances with the (dist, vec_id)
    tie-break, and both engines fold the distance sums
    left-to-right, so ranks are bit-reproducible. The DCG/IDCG
    reduction is a per-query agg over ≤10 rows."""
    from resume_jd_matcher_spark.operators.ann import lsh_signature
    from resume_jd_matcher_spark.functions.vector import squared_l2

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select(
        "vec_id",
        F.col("embedding").alias("ce"),
        lsh_signature(F.col("embedding"), _NDCG_PLANES).alias("bucket"),
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        lsh_signature(F.col("embedding"), _NDCG_PLANES).alias("qbucket"),
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    lsh = (
        c.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "query_id",
            "vec_id",
            squared_l2(F.col("ce"), F.col("qe")).alias("dist"),
        )
        .withColumn("lrank", F.row_number().over(w))
        .filter(F.col("lrank") <= _NDCG_K)
        .select("query_id", "vec_id", "lrank")
    )
    ex = (
        c.select("vec_id", "ce")
        .crossJoin(F.broadcast(q.select("query_id", "qe")))
        .select(
            "query_id",
            "vec_id",
            squared_l2(F.col("ce"), F.col("qe")).alias("dist"),
        )
        .withColumn("xrank", F.row_number().over(w))
        .filter(F.col("xrank") <= _NDCG_K)
        .select("query_id", "vec_id", "xrank")
    )
    dcg = (
        lsh.join(ex, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.coalesce(F.lit(_NDCG_K + 1) - F.col("xrank"), F.lit(0))
                / F.log2(F.col("lrank") + F.lit(1.0))
            ).alias("dcg")
        )
    )
    idcg = ex.groupBy("query_id").agg(
        F.sum(
            (F.lit(_NDCG_K + 1) - F.col("xrank"))
            / F.log2(F.col("xrank") + F.lit(1.0))
        ).alias("idcg")
    )
    return idcg.join(dcg, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) + F.lit(1e-9), 6).alias(
            "dcg"
        ),
        F.round(F.col("idcg") + F.lit(1e-9), 6).alias("idcg"),
        F.round(
            F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            + F.lit(1e-9),
            6,
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov (distributed dual-ECDF scan)
# ---------------------------------------------------------------------------

@register(
    "ks_test",
    """
WITH g AS (
  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
         sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c_a,
         sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c_b
  FROM orders GROUP BY 1
), t AS (
  SELECT sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b FROM g
), e AS (
  SELECT sum(c_a) OVER (ORDER BY cents)::HUGEINT AS ca,
         sum(c_b) OVER (ORDER BY cents)::HUGEINT AS cb
  FROM g
), d AS (
  SELECT max(abs(ca * t.n_b - cb * t.n_a))::DOUBLE
         / (t.n_a::DOUBLE * t.n_b) AS d_stat,
         t.n_a, t.n_b
  FROM e CROSS JOIN t GROUP BY t.n_a, t.n_b
)
SELECT n_a, n_b, round(d_stat + 1e-9, 6) AS d_stat,
       round(least(1.0, 2 * exp(-2.0 * (n_a::DOUBLE * n_b / (n_a + n_b))
                                * d_stat * d_stat)) + 1e-9, 6) AS p_approx,
       (round(least(1.0, 2 * exp(-2.0 * (n_a::DOUBLE * n_b / (n_a + n_b))
                                 * d_stat * d_stat)) + 1e-9, 6)
        < 0.05) AS reject
FROM d
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: EXACT two-sample Kolmogorov-Smirnov test between
    the even- and odd-orderkey halves of the order-price distribution
    — the drift gate a dataset release runs between snapshots (PSI's
    binned cousin `psi_drift` is approximate; KS is the exact
    sup-norm ECDF distance). The p-value is the standard one-term
    asymptotic bound 2·exp(−2·m·D²) (m = harmonic sample size),
    clamped to 1 and compared AFTER rounding on both engines so the
    reject boolean cannot flip on a last-bit float diff.

    Scale shape: the sup of |F_a − F_b| is taken over the DISTINCT
    value grain (cents), where both ECDFs jump — counts per value are
    one map-side-combined hash agg over the fact; both cumulative
    counters then ride ONE `operators/prefix.global_prefix` bucketed
    scan (the r8 multi-sum extension — one shuffle for both ECDFs, no
    single-partition window). The ECDF difference is compared in
    EXACT integer cross-multiples (cum_a·n_b − cum_b·n_a in
    decimal(38,0) ≡ DuckDB HUGEINT — no float ties at any sf; the
    products reach ~1e24 at 100 TB, past int64 but inside decimal38),
    divided once at the end. bounds="width" deliberately: the order
    key is the distinct cents of o_totalprice — a bell-shaped (sum of
    line items) value domain, not power-law — so equal-width buckets
    stay balanced without the height mode's extra percentile pass."""
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
    d = (
        e.crossJoin(F.broadcast(t))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_c_a").cast(dec) * F.col("n_b")
                    - F.col("cum_c_b").cast(dec) * F.col("n_a")
                )
            ).alias("num"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .select(
            "n_a",
            "n_b",
            (
                F.col("num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("d_stat"),
        )
    )
    m = F.col("n_a").cast("double") * F.col("n_b") / (
        F.col("n_a") + F.col("n_b")
    )
    p = F.round(
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(F.lit(-2.0) * m * F.col("d_stat") * F.col("d_stat")),
        )
        + F.lit(1e-9),
        6,
    )
    return d.select(
        "n_a",
        "n_b",
        F.round(F.col("d_stat") + F.lit(1e-9), 6).alias("d_stat"),
        p.alias("p_approx"),
        (p < 0.05).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier churn survival
# ---------------------------------------------------------------------------

# A "conversion" (the KM death event) is the user's first purchase at
# or above this value. The r8 spec ("churn" = last event >= 7 days
# before corpus end) was VACUOUS on the fixtures — the 30-day events
# span keeps every user active to the end, so both engines returned
# the empty set at every sf and the green driver rows certified
# nothing (r8 verdict, What's wrong #1). Time-to-first-high-value-
# purchase gives real deaths AND real right-censoring at every sf
# (sf0.001: 12 deaths / 3 censored; sf0.01: 127/23; sf0.1: 1341/159).
_KM_VALUE_CUTOFF = 90.0


@register(
    "kaplan_meier",
    f"""
WITH u AS (
  SELECT user_id, min(ts::DATE) AS fd, max(ts::DATE) AS ld,
         min(CASE WHEN event_type = 'purchase'
                   AND value >= {_KM_VALUE_CUTOFF}
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
         exp(sum(ln(greatest(1.0 - d / n_risk::DOUBLE, 1e-300)))
             OVER (ORDER BY t)) AS surv
  FROM r
)
SELECT t::INT AS t_days, n_risk::BIGINT AS n_risk, d AS d_deaths,
       round(surv + 1e-9, 6) AS survival
FROM s WHERE d > 0
""",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: Kaplan-Meier survival curve of time-to-conversion
    — days from a user's first event to their first high-value
    purchase (value >= {_KM_VALUE_CUTOFF}); users who never convert
    are right-CENSORED at the corpus end (Kaplan & Meier 1958). The
    standard time-to-event readout behind conversion funnels and
    churn dashboards. Censored users leave the risk set after their
    time without contributing a death factor; ties at the same t
    follow the KM convention (deaths before censorings — a user
    censored at t is still at risk for the deaths at t); rows are
    emitted at death times only. The product is computed as
    exp(Σ ln(1 − d/n)) with a 1e-300 floor so a terminal
    everyone-dies time yields survival 0 instead of ln(0) divergence
    — the same spelling on both engines.

    Scale shape: the fact table collapses to the user grain (one
    map-side-combined hash agg), then to the LIFETIME-DAY grain —
    bounded by the calendar span of the corpus, not its row count —
    before any window; the cumulative risk-set and product windows
    run over that bounded grain (same day-grain-first discipline as
    level_shift/time_weighted_avg). The corpus max date is one
    broadcast 1-row agg."""
    e = load_table(spark, sf_dir, "events")
    converted = (F.col("event_type") == "purchase") & (
        F.col("value") >= _KM_VALUE_CUTOFF
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
    # Bounded unpartitioned windows: the grain is one row per distinct
    # LIFETIME (calendar-span-bounded), never per user/event.
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.withColumn(
        "n_risk",
        F.col("n_users")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    s = r.withColumn(
        "surv",
        F.exp(
            F.sum(
                F.log(
                    F.greatest(
                        F.lit(1.0)
                        - F.col("d") / F.col("n_risk").cast("double"),
                        F.lit(1e-300),
                    )
                )
            ).over(w_run)
        ),
    )
    return s.filter(F.col("d") > 0).select(
        F.col("t").cast("int").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_deaths"),
        F.round(F.col("surv") + F.lit(1e-9), 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Daily-revenue autocorrelation (ACF lags 1..7)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@register(
    "acf_daily",
    f"""
WITH g AS (
  SELECT o_orderdate::DATE AS day,
         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1
), t AS (
  SELECT sum(rev)::BIGINT AS s, count(*)::BIGINT AS n FROM g
), d AS (
  SELECT day, rev - s / n::DOUBLE AS dev FROM g CROSS JOIN t
), ss AS (
  SELECT sum(dev * dev) AS ss FROM d
), p AS (
  SELECT k.k, count(*)::BIGINT AS n_pairs, sum(a.dev * b.dev) AS sp
  FROM d a
  CROSS JOIN (SELECT unnest(generate_series(1, {_ACF_MAX_LAG}))::INTEGER
              AS k) k
  JOIN d b ON b.day = a.day + k.k
  GROUP BY k.k
)
SELECT k::INT AS lag_days, n_pairs, round(sp / ss.ss + 1e-9, 6) AS acf
FROM p CROSS JOIN ss
""",
)
def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/A4 [EXT]: autocorrelation of the daily-revenue series at
    lags 1..{_ACF_MAX_LAG} days — the seasonality detector run before
    choosing a forecast model or a seasonal-adjustment window (a
    weekly cycle shows as a lag-7 peak). Pairs are matched on
    CALENDAR day (day + k), so missing days shorten n_pairs rather
    than silently misaligning the series; the denominator is the full
    series sum of squared deviations (the standard ACF normalization,
    Box & Jenkins), making acf comparable across lags.

    Scale shape: the fact collapses to the DAY grain (integer-cents
    hash agg) before anything else; the mean is one broadcast 1-row
    agg, and each lag is a calendar-key EQUI-join of the day grain
    with itself fanned out by a {_ACF_MAX_LAG}-element literal
    explode — day-grain × lags rows total, never fact-sized, no
    window at all."""
    o = load_table(spark, sf_dir, "orders")
    g = (
        o.select(
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    t = g.agg(
        F.sum("rev").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    d = g.crossJoin(F.broadcast(t)).select(
        "day",
        (F.col("rev") - F.col("s") / F.col("n").cast("double")).alias("dev"),
    )
    ss = d.agg(F.sum(F.col("dev") * F.col("dev")).alias("ss"))
    lags = d.select(
        "day",
        F.col("dev").alias("dev_a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, _ACF_MAX_LAG + 1)])
        ).alias("k"),
    ).withColumn("day_b", F.date_add("day", F.col("k")))
    b = d.select(F.col("day").alias("day_b"), F.col("dev").alias("dev_b"))
    p = (
        lags.join(b, "day_b")
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.col("dev_a") * F.col("dev_b")).alias("sp"),
        )
    )
    return p.crossJoin(F.broadcast(ss)).select(
        F.col("k").cast("int").alias("lag_days"),
        "n_pairs",
        F.round(F.col("sp") / F.col("ss") + F.lit(1e-9), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Welch's t-test (continuous-metric A/B companion)
# ---------------------------------------------------------------------------

@register(
    "welch_ttest",
    f"""
WITH a AS (
  SELECT value,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm
  FROM events
), s AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 0 THEN value ELSE 0 END) AS sx_a,
         sum(CASE WHEN arm = 1 THEN value ELSE 0 END) AS sx_b,
         sum(CASE WHEN arm = 0 THEN value * value ELSE 0 END) AS sxx_a,
         sum(CASE WHEN arm = 1 THEN value * value ELSE 0 END) AS sxx_b
  FROM a
), t AS (
  SELECT n_a, n_b,
         sx_a / nullif(n_a, 0) AS m_a, sx_b / nullif(n_b, 0) AS m_b,
         (sxx_a - sx_a * sx_a / nullif(n_a, 0))
           / nullif(n_a - 1, 0) AS v_a,
         (sxx_b - sx_b * sx_b / nullif(n_b, 0))
           / nullif(n_b - 1, 0) AS v_b
  FROM s
), w AS (
  SELECT n_a, n_b, m_a, m_b, v_a, v_b,
         v_a / nullif(n_a, 0) + v_b / nullif(n_b, 0) AS se2
  FROM t
)
SELECT n_a, n_b,
       round(m_a + 1e-9, 4) AS mean_a,
       round(m_b + 1e-9, 4) AS mean_b,
       round((m_a - m_b) / sqrt(nullif(se2, 0.0)) + 1e-9, 4) AS t_stat,
       round(se2 * se2
             / nullif(v_a * v_a / (n_a * n_a * (n_a - 1.0))
                      + v_b * v_b / (n_b * n_b * (n_b - 1.0)), 0.0)
             + 1e-9, 1) AS df,
       round((m_a - m_b)
             / sqrt(nullif(((n_a - 1) * v_a + (n_b - 1) * v_b)
                           / nullif(n_a + n_b - 2.0, 0.0), 0.0))
             + 1e-9, 4) AS cohens_d,
       coalesce(abs(round((m_a - m_b) / sqrt(nullif(se2, 0.0)) + 1e-9, 4))
                  > 1.96,
                false) AS significant
FROM w
""",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: Welch's unequal-variance t-test on the continuous
    event value between the same portable-hash experiment arms as
    `ab_test_ztest` (proportions there, means here — the two standard
    A/B readouts), plus Welch-Satterthwaite degrees of freedom and
    pooled-SD Cohen's d effect size. `significant` uses the
    large-sample 1.96 cut on the ROUNDED t (df is ~n at any real sf,
    where t is normal), coalesced FALSE for degenerate variance.

    Scale shape: ONE conditional aggregate over the fact computes all
    six sufficient statistics (n, Σx, Σx² per arm) map-side combined;
    everything after is scalar arithmetic on a 1-row frame. The
    moment formulation's cancellation is benign here (value ≥ 0,
    mean ≫ 0); values are summed as doubles on both engines and every
    exposed stat is rounded in-query."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events").select(
        "value",
        (
            hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab")))
            % 2
        ).alias("arm"),
    )
    s = e.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("value")).otherwise(0.0)).alias(
            "sx_a"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("value")).otherwise(0.0)).alias(
            "sx_b"
        ),
        F.sum(
            F.when(F.col("arm") == 0, F.col("value") * F.col("value"))
            .otherwise(0.0)
        ).alias("sxx_a"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("value") * F.col("value"))
            .otherwise(0.0)
        ).alias("sxx_b"),
    )
    # one-sided / single-user splits: every divisor nullif-guarded so
    # both engines yield NULL instead of Spark aborting under ANSI
    # divide-by-zero while DuckDB floats run to inf/NaN (the
    # ab_test_ztest discipline, previously missing here)
    na = F.nullif(F.col("n_a"), F.lit(0))
    nb = F.nullif(F.col("n_b"), F.lit(0))
    m_a = F.col("sx_a") / na
    m_b = F.col("sx_b") / nb
    v_a = (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / na) / F.nullif(
        F.col("n_a") - 1, F.lit(0)
    )
    v_b = (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / nb) / F.nullif(
        F.col("n_b") - 1, F.lit(0)
    )
    w = s.select("n_a", "n_b", m_a.alias("m_a"), m_b.alias("m_b"),
                 v_a.alias("v_a"), v_b.alias("v_b"),
                 (v_a / na + v_b / nb).alias("se2"))
    t_stat = F.round(
        (F.col("m_a") - F.col("m_b"))
        / F.sqrt(F.nullif(F.col("se2"), F.lit(0.0)))
        + F.lit(1e-9),
        4,
    )
    df = F.round(
        F.col("se2") * F.col("se2")
        / F.nullif(
            F.col("v_a") * F.col("v_a")
            / (F.col("n_a") * F.col("n_a") * (F.col("n_a") - F.lit(1.0)))
            + F.col("v_b") * F.col("v_b")
            / (F.col("n_b") * F.col("n_b") * (F.col("n_b") - F.lit(1.0))),
            F.lit(0.0),
        )
        + F.lit(1e-9),
        1,
    )
    cohens = F.round(
        (F.col("m_a") - F.col("m_b"))
        / F.sqrt(
            F.nullif(
                (
                    (F.col("n_a") - 1) * F.col("v_a")
                    + (F.col("n_b") - 1) * F.col("v_b")
                )
                / F.nullif(
                    F.col("n_a") + F.col("n_b") - F.lit(2.0), F.lit(0.0)
                ),
                F.lit(0.0),
            )
        )
        + F.lit(1e-9),
        4,
    )
    return w.select(
        "n_a",
        "n_b",
        F.round(F.col("m_a") + F.lit(1e-9), 4).alias("mean_a"),
        F.round(F.col("m_b") + F.lit(1e-9), 4).alias("mean_b"),
        t_stat.alias("t_stat"),
        df.alias("df"),
        cohens.alias("cohens_d"),
        F.coalesce(F.abs(t_stat) > F.lit(1.96), F.lit(False)).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# Ratio-metric delta-method CI (revenue per event, per arm)
# ---------------------------------------------------------------------------

@register(
    "ratio_metric_delta",
    f"""
WITH u AS (
  SELECT user_id,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         sum(value) AS y, count(*)::BIGINT AS x
  FROM events GROUP BY user_id
), s AS (
  SELECT arm, count(*)::BIGINT AS n,
         avg(y) AS my, avg(x::DOUBLE) AS mx,
         sum(y * y) / count(*) - avg(y) * avg(y) AS vy,
         sum(x::DOUBLE * x) / count(*) - avg(x::DOUBLE) * avg(x::DOUBLE)
           AS vx,
         sum(y * x) / count(*) - avg(y) * avg(x::DOUBLE) AS cxy
  FROM u GROUP BY arm
)
SELECT arm::INT AS arm, n,
       round(my / mx + 1e-9, 4) AS ratio,
       round(sqrt(greatest(
               (vy - 2 * (my / mx) * cxy + (my / mx) * (my / mx) * vx)
               / (mx * mx * n), 0.0)) + 1e-9, 6) AS se,
       round(my / mx - 1.96 * sqrt(greatest(
               (vy - 2 * (my / mx) * cxy + (my / mx) * (my / mx) * vx)
               / (mx * mx * n), 0.0)) + 1e-9, 4) AS ci_lo,
       round(my / mx + 1.96 * sqrt(greatest(
               (vy - 2 * (my / mx) * cxy + (my / mx) * (my / mx) * vx)
               / (mx * mx * n), 0.0)) + 1e-9, 4) AS ci_hi
FROM s
""",
)
def q_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: delta-method standard error for a RATIO metric
    (revenue per event = Σvalue/Σevents) per experiment arm — the
    correct treatment when the randomization unit (user) differs from
    the metric denominator (events), where a naive per-event variance
    understates the CI (Deng et al., KDD 2018 practice). Var(Y̅/X̅) ≈
    (v_y − 2r·c_xy + r²·v_x)/(x̄²·n) over per-USER aggregates; the
    1.96 normal CI uses the same rounded arithmetic on both engines
    (population moments via Σ/n so the two engines' spellings agree;
    greatest(·,0) guards the tiny-negative float case).

    Scale shape: one user-grain hash agg over the fact, then a 2-row
    per-arm moment agg — identical shape to ab_test_ztest with the
    covariance added; everything after the user agg is O(1)."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum("value").alias("y"),
        F.count("*").cast("bigint").alias("x"),
    ).withColumn(
        "arm",
        hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))) % 2,
    )
    xd = F.col("x").cast("double")
    s = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("y").alias("my"),
        F.avg(xd).alias("mx"),
        (F.sum(F.col("y") * F.col("y")) / F.count("*")
         - F.avg("y") * F.avg("y")).alias("vy"),
        (F.sum(xd * xd) / F.count("*") - F.avg(xd) * F.avg(xd)).alias("vx"),
        (F.sum(F.col("y") * xd) / F.count("*")
         - F.avg("y") * F.avg(xd)).alias("cxy"),
    )
    r = F.col("my") / F.col("mx")
    var = (
        F.col("vy") - 2 * r * F.col("cxy") + r * r * F.col("vx")
    ) / (F.col("mx") * F.col("mx") * F.col("n"))
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    return s.select(
        F.col("arm").cast("int").alias("arm"),
        "n",
        F.round(r + F.lit(1e-9), 4).alias("ratio"),
        F.round(se + F.lit(1e-9), 6).alias("se"),
        F.round(r - F.lit(1.96) * se + F.lit(1e-9), 4).alias("ci_lo"),
        F.round(r + F.lit(1.96) * se + F.lit(1e-9), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------

@register(
    "cuped_adjustment",
    f"""
WITH u AS (
  SELECT user_id,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         sum(CASE WHEN ts <  TIMESTAMP '2024-01-16'
                  THEN round(value * 100)::HUGEINT ELSE 0::HUGEINT END) AS xc,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN round(value * 100)::HUGEINT ELSE 0::HUGEINT END) AS yc
  FROM events GROUP BY user_id
), g AS (
  SELECT count(*)::HUGEINT AS n0, sum(xc) AS sx0, sum(yc) AS sy0,
         sum(xc * xc) AS sxx0, sum(xc * yc) AS sxy0
  FROM u
), t AS (
  SELECT sx0::DOUBLE / n0::DOUBLE AS mxc,
         CASE WHEN (n0 * sxx0 - sx0 * sx0)::DOUBLE
                   / (n0 * n0)::DOUBLE / 1e4 > 1e-9
              THEN (n0 * sxy0 - sx0 * sy0)::DOUBLE
                   / (n0 * sxx0 - sx0 * sx0)::DOUBLE
              ELSE 0.0 END AS theta
  FROM g
), a AS (
  SELECT arm, count(*)::HUGEINT AS n, sum(xc) AS sx, sum(yc) AS sy,
         sum(xc * xc) AS sxx, sum(xc * yc) AS sxy, sum(yc * yc) AS syy
  FROM u GROUP BY arm
)
SELECT arm::INT AS arm, n::BIGINT AS n,
       round(sy::DOUBLE / n::DOUBLE / 100 + 1e-9, 4) AS mean_y,
       round((sy::DOUBLE / n::DOUBLE
              - t.theta * (sx::DOUBLE / n::DOUBLE - t.mxc)) / 100
             + 1e-9, 4) AS mean_cuped,
       round(t.theta + 1e-9, 6) AS theta,
       round(CASE WHEN (n * syy - sy * sy)::DOUBLE
                       / (n * n)::DOUBLE / 1e4 > 1e-9
                  THEN (2 * t.theta * (n * sxy - sx * sy)::DOUBLE
                        - t.theta * t.theta * (n * sxx - sx * sx)::DOUBLE)
                       / (n * syy - sy * sy)::DOUBLE
                  ELSE 0.0 END + 1e-9, 4) AS var_reduction
FROM a, t
""",
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: CUPED (Controlled-experiment Using Pre-Experiment
    Data, Deng et al. WSDM 2013) — the standard variance-reduction
    readout: per-user pre-period covariate x (value sum before the
    experiment midpoint) adjusts the in-experiment metric y as
    y' = y - theta*(x - x_bar) with theta = cov(x,y)/var(x) pooled
    across arms. Reports per-arm raw vs adjusted means and the
    realized per-arm variance reduction. theta falls back to 0 (no
    adjustment) when var(x) <= 1e-9 — a threshold, not a float
    equality, so a degenerate covariate can't blow up the ratio on a
    last-bit difference between engines.

    r12 rewrite (the rolling_beta discipline, from the tie-distance
    audit): theta = cov(x,y)/var(x) from float moments subtracts
    near-equal large values — cancellation amplifies engine-order
    accumulation noise into the 6-dp exposure, the exact class that
    made rolling_beta hash-red in r10. Instead: per-user sums as
    exact integer CENTS, all pooled/per-arm moments as exact
    DECIMAL(38,0) sums (order-independent by exactness), and every
    readout — theta, the adjusted mean (algebraically mean_y -
    theta*(mean_x - mx), not a row-wise float sum), and the variance
    reduction (identity: (2*theta*cov - theta^2*varx)/vary, the n^2
    denominators cancel) — composed in DOUBLE from those exact
    scalars with the identical formula on both engines.

    Scale shape: one user-grain conditional hash agg over events,
    one 1-row pooled-moment agg broadcast back, one per-arm agg —
    three shuffles, all on bounded or user-grain data; everything
    after the user agg is O(users)."""
    from resume_jd_matcher_spark.functions.text import hash32

    dec = "decimal(38,0)"
    split = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast(dec)
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < split, cents).otherwise(F.lit(0).cast(dec))
        ).cast(dec).alias("xc"),
        F.sum(
            F.when(F.col("ts") >= split, cents).otherwise(F.lit(0).cast(dec))
        ).cast(dec).alias("yc"),
    ).withColumn(
        "arm",
        hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))) % 2,
    )
    d = lambda c: c.cast("double")  # noqa: E731
    g = u.agg(
        F.count("*").cast(dec).alias("n0"),
        F.sum("xc").cast(dec).alias("sx0"),
        F.sum("yc").cast(dec).alias("sy0"),
        F.sum(F.col("xc") * F.col("xc")).cast(dec).alias("sxx0"),
        F.sum(F.col("xc") * F.col("yc")).cast(dec).alias("sxy0"),
    )
    vx0 = d(F.col("n0") * F.col("sxx0") - F.col("sx0") * F.col("sx0"))
    t = g.select(
        (d(F.col("sx0")) / d(F.col("n0"))).alias("mxc"),
        F.when(
            vx0 / d(F.col("n0") * F.col("n0")) / F.lit(1e4) > F.lit(1e-9),
            d(F.col("n0") * F.col("sxy0") - F.col("sx0") * F.col("sy0"))
            / vx0,
        ).otherwise(F.lit(0.0)).alias("theta"),
    )
    a = u.groupBy("arm").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("xc").cast(dec).alias("sx"),
        F.sum("yc").cast(dec).alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).cast(dec).alias("sxx"),
        F.sum(F.col("xc") * F.col("yc")).cast(dec).alias("sxy"),
        F.sum(F.col("yc") * F.col("yc")).cast(dec).alias("syy"),
    )
    eps = F.lit(1e-9)
    cov = d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    varx = d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vary = d(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return a.crossJoin(F.broadcast(t)).select(
        F.col("arm").cast("int").alias("arm"),
        F.col("n").cast("bigint").alias("n"),
        F.round(d(F.col("sy")) / d(F.col("n")) / 100 + eps, 4).alias(
            "mean_y"
        ),
        F.round(
            (d(F.col("sy")) / d(F.col("n"))
             - F.col("theta")
             * (d(F.col("sx")) / d(F.col("n")) - F.col("mxc"))) / 100
            + eps,
            4,
        ).alias("mean_cuped"),
        F.round(F.col("theta") + eps, 6).alias("theta"),
        F.round(
            F.when(
                vary / d(F.col("n") * F.col("n")) / F.lit(1e4) > eps,
                (F.lit(2.0) * F.col("theta") * cov
                 - F.col("theta") * F.col("theta") * varx) / vary,
            ).otherwise(F.lit(0.0))
            + eps,
            4,
        ).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch check
# ---------------------------------------------------------------------------

@register(
    "srm_check",
    f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), b AS (
  SELECT {_SQL_H32.format(x="user_id::VARCHAR || '#srm'")} % 10 AS bkt,
         count(*)::BIGINT AS c
  FROM u GROUP BY 1
), s AS (
  SELECT sum(c)::BIGINT AS n_users, count(*)::BIGINT AS n_buckets_observed,
         round(10.0 * sum(c * c) / sum(c) - sum(c) + 1e-9, 3) AS chi2
  FROM b
)
SELECT n_users, n_buckets_observed, chi2, chi2 > 27.877 AS srm_detected
FROM s
""",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: sample-ratio-mismatch guardrail — chi-square
    goodness-of-fit of the hash-bucketed assignment (10 buckets,
    '#srm' salt) against the uniform expectation, the first sanity
    gate every experimentation platform runs before reading a metric.
    chi2 = 10*sum(c^2)/n - n (the expansion of sum((c-n/10)^2/(n/10))
    over all 10 cells — empty buckets contribute exactly their
    expectation through the -n term, so the algebra needs no zero-cell
    completion join). Detection compares the ROUNDED chi2 against the
    df=9, alpha=0.001 critical value 27.877 (SRM practice uses a
    conservative alpha), so the boolean can't flip on a last-bit
    float difference.

    Scale shape: distinct user scan -> 10-row hash agg -> 1-row
    finalize; O(1) after the user dedup."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events")
    b = (
        e.select("user_id").distinct()
        .withColumn(
            "bkt",
            hash32(
                F.concat(F.col("user_id").cast("string"), F.lit("#srm"))
            ) % 10,
        )
        .groupBy("bkt")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    s = b.agg(
        F.sum("c").cast("bigint").alias("n_users"),
        F.count("*").cast("bigint").alias("n_buckets_observed"),
        F.round(
            F.lit(10.0) * F.sum(F.col("c") * F.col("c")) / F.sum("c")
            - F.sum("c")
            + F.lit(1e-9),
            3,
        ).alias("chi2"),
    )
    return s.select(
        "n_users", "n_buckets_observed", "chi2",
        (F.col("chi2") > F.lit(27.877)).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# Leave-one-bucket-out jackknife CI for the ratio metric
# ---------------------------------------------------------------------------

@register(
    "jackknife_ratio_ci",
    f"""
WITH b AS (
  SELECT {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         {_SQL_H32.format(x="user_id::VARCHAR || '#jk'")} % 32 AS bkt,
         sum(value) AS yb, count(*)::DOUBLE AS xb
  FROM events GROUP BY 1, 2
), t AS (
  SELECT arm, sum(yb) AS ty, sum(xb) AS tx, count(*)::BIGINT AS nb
  FROM b GROUP BY arm
), r AS (
  SELECT b.arm, t.ty, t.tx, t.nb,
         (t.ty - b.yb) / nullif(t.tx - b.xb, 0.0) AS rb
  FROM b JOIN t ON b.arm = t.arm
)
SELECT arm::INT AS arm, any_value(nb) AS n_buckets,
       round(any_value(ty) / any_value(tx) + 1e-9, 4) AS ratio,
       round(sqrt(greatest(
           (any_value(nb) - 1.0) / any_value(nb)
           * (sum(rb * rb) - sum(rb) * sum(rb) / any_value(nb)), 0.0))
         + 1e-9, 6) AS se_jk,
       round(any_value(ty) / any_value(tx) - 1.96 * sqrt(greatest(
           (any_value(nb) - 1.0) / any_value(nb)
           * (sum(rb * rb) - sum(rb) * sum(rb) / any_value(nb)), 0.0))
         + 1e-9, 4) AS ci_lo,
       round(any_value(ty) / any_value(tx) + 1.96 * sqrt(greatest(
           (any_value(nb) - 1.0) / any_value(nb)
           * (sum(rb * rb) - sum(rb) * sum(rb) / any_value(nb)), 0.0))
         + 1e-9, 4) AS ci_hi
FROM r GROUP BY arm
""",
)
def q_jackknife_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: leave-one-bucket-out (delete-a-group) jackknife CI
    for the per-arm revenue-per-event ratio — the non-parametric
    companion to ratio_metric_delta's closed-form delta method, and
    the variance estimator large experimentation systems actually
    deploy (buckets, not users, so the resample grain is bounded at
    32 regardless of user count; users never straddle buckets because
    the bucket is a user-hash). r_b = (Y - y_b)/(X - x_b) per held-out
    bucket; Var_jk = (B-1)/B * sum((r_b - r_bar)^2) via the moment
    expansion so one agg computes it without a second pass.

    Scale shape: one (arm, bucket)-grain hash agg over events (64
    cells), then O(1) joins/aggs on the bounded cells — the fact
    table is touched exactly once."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    b = (
        e.withColumn("arm", hash32(F.concat(uid, F.lit("#ab"))) % 2)
        .withColumn("bkt", hash32(F.concat(uid, F.lit("#jk"))) % 32)
        .groupBy("arm", "bkt")
        .agg(
            F.sum("value").alias("yb"),
            F.count("*").cast("double").alias("xb"),
        )
    )
    t = b.groupBy("arm").agg(
        F.sum("yb").alias("ty"),
        F.sum("xb").alias("tx"),
        F.count("*").cast("bigint").alias("nb"),
    )
    r = b.join(F.broadcast(t), "arm").withColumn(
        "rb",
        (F.col("ty") - F.col("yb"))
        / F.nullif(F.col("tx") - F.col("xb"), F.lit(0.0)),
    )
    g = r.groupBy("arm").agg(
        F.first("nb").alias("nb"),
        F.first("ty").alias("ty"),
        F.first("tx").alias("tx"),
        F.sum("rb").alias("s1"),
        F.sum(F.col("rb") * F.col("rb")).alias("s2"),
    )
    ratio = F.col("ty") / F.col("tx")
    var = (
        (F.col("nb") - F.lit(1.0)) / F.col("nb")
        * (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nb"))
    )
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    return g.select(
        F.col("arm").cast("int").alias("arm"),
        F.col("nb").alias("n_buckets"),
        F.round(ratio + F.lit(1e-9), 4).alias("ratio"),
        F.round(se + F.lit(1e-9), 6).alias("se_jk"),
        F.round(ratio - F.lit(1.96) * se + F.lit(1e-9), 4).alias("ci_lo"),
        F.round(ratio + F.lit(1.96) * se + F.lit(1e-9), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Zone-map pruning effectiveness (data-layout advisor)
# ---------------------------------------------------------------------------

@register(
    "zone_map_pruning",
    """
WITH l AS (
  SELECT l_orderkey AS ok,
         date_diff('day', DATE '1970-01-01', l_shipdate::DATE) AS day
  FROM lineitem
), g AS (
  SELECT min(ok) AS min_ok, max(ok) AS max_ok,
         min(day) AS min_day, max(day) AS max_day
  FROM l
), f AS (
  SELECT 'natural' AS layout,
         ((ok - g.min_ok) * 64 // (g.max_ok - g.min_ok + 1))
           AS file_id,
         day
  FROM l, g
  UNION ALL
  SELECT 'clustered' AS layout,
         ((day - g.min_day) * 64 // (g.max_day - g.min_day + 1))
           AS file_id,
         day
  FROM l, g
), z AS (
  SELECT layout, file_id, min(day) AS zmin, max(day) AS zmax,
         count(*)::BIGINT AS n_rows,
         sum(CASE WHEN day BETWEEN
               date_diff('day', DATE '1970-01-01', DATE '1998-06-01')
               AND date_diff('day', DATE '1970-01-01', DATE '1998-08-31')
             THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM f GROUP BY layout, file_id
)
SELECT layout, count(*)::BIGINT AS n_files,
       sum(CASE WHEN zmax >= date_diff('day', DATE '1970-01-01',
                                       DATE '1998-06-01')
                 AND zmin <= date_diff('day', DATE '1970-01-01',
                                       DATE '1998-08-31')
            THEN 1 ELSE 0 END)::BIGINT AS files_hit,
       round(1.0 - sum(CASE WHEN zmax >= date_diff('day',
                                DATE '1970-01-01', DATE '1998-06-01')
                             AND zmin <= date_diff('day',
                                DATE '1970-01-01', DATE '1998-08-31')
                        THEN 1 ELSE 0 END)::DOUBLE / count(*)
             + 1e-9, 4) AS skip_ratio,
       sum(CASE WHEN zmax >= date_diff('day', DATE '1970-01-01',
                                       DATE '1998-06-01')
                 AND zmin <= date_diff('day', DATE '1970-01-01',
                                       DATE '1998-08-31')
            THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned,
       sum(n_match)::BIGINT AS rows_matched,
       round(sum(CASE WHEN zmax >= date_diff('day', DATE '1970-01-01',
                                             DATE '1998-06-01')
                       AND zmin <= date_diff('day', DATE '1970-01-01',
                                             DATE '1998-08-31')
                  THEN n_rows ELSE 0 END)::DOUBLE
             / nullif(sum(n_match), 0) + 1e-9, 2) AS read_amp
FROM z GROUP BY layout
""",
)
def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC8/A4 [EXT]: zone-map (min/max file statistics) pruning
    effectiveness under two physical layouts — the quantitative
    data-layout advisor every lakehouse table needs before choosing a
    clustering key. 'natural' files are contiguous orderkey ranges
    (insertion order, shipdate scattered -> zone maps nearly useless);
    'clustered' files are contiguous shipdate ranges (the layout
    OPTIMIZE/Z-ORDER would produce -> a 3-month predicate touches
    ~1/24 of files). Reports files hit, skip ratio and the read
    amplification rows_scanned/rows_matched for a fixed mid-range
    shipdate predicate; file = floor((key - min) * 64 / span) keeps
    both engines in exact integer agreement.

    Scale shape: one 1-row global-bounds agg broadcast back, one
    (layout, file)-grain agg over a 2x fact union (a single fact
    pass per layout, map-side combined to 128 cells), then an O(1)
    finalize — no window, no join wider than the broadcast."""
    e = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).alias("day"),
    )
    g = e.agg(
        F.min("ok").alias("min_ok"), F.max("ok").alias("max_ok"),
        F.min("day").alias("min_day"), F.max("day").alias("max_day"),
    )
    d_lo = F.datediff(F.lit("1998-06-01"), F.lit("1970-01-01"))
    d_hi = F.datediff(F.lit("1998-08-31"), F.lit("1970-01-01"))
    w = e.crossJoin(F.broadcast(g))
    nat = w.select(
        F.lit("natural").alias("layout"),
        F.floor(
            (F.col("ok") - F.col("min_ok")) * 64
            / (F.col("max_ok") - F.col("min_ok") + 1)
        ).cast("bigint").alias("file_id"),
        "day",
    )
    clu = w.select(
        F.lit("clustered").alias("layout"),
        F.floor(
            (F.col("day") - F.col("min_day")) * 64
            / (F.col("max_day") - F.col("min_day") + 1)
        ).cast("bigint").alias("file_id"),
        "day",
    )
    z = nat.unionByName(clu).groupBy("layout", "file_id").agg(
        F.min("day").alias("zmin"),
        F.max("day").alias("zmax"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("day").between(d_lo, d_hi), 1).otherwise(0)
        ).cast("bigint").alias("n_match"),
    )
    hit = (F.col("zmax") >= d_lo) & (F.col("zmin") <= d_hi)
    return z.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("files_hit"),
        F.round(
            F.lit(1.0)
            - F.sum(F.when(hit, 1).otherwise(0)).cast("double")
            / F.count("*")
            + F.lit(1e-9),
            4,
        ).alias("skip_ratio"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("bigint").alias("rows_scanned"),
        F.sum("n_match").cast("bigint").alias("rows_matched"),
        F.round(
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("double")
            / F.nullif(F.sum("n_match"), F.lit(0))
            + F.lit(1e-9),
            2,
        ).alias("read_amp"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest (seasonal-naive vs moving average)
# ---------------------------------------------------------------------------

@register(
    "forecast_backtest",
    """
WITH o AS (
  SELECT date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS day,
         sum(round(o_totalprice * 100)::BIGINT) AS rev
  FROM orders GROUP BY 1
), g AS (
  SELECT min(day) AS lo, max(day) AS hi FROM o
), cal AS (
  SELECT unnest(generate_series(g.lo, g.hi)) AS day FROM g
), d AS (
  SELECT cal.day, coalesce(o.rev, 0) AS rev
  FROM cal LEFT JOIN o ON o.day = cal.day
), w AS (
  SELECT day, rev,
         row_number() OVER (ORDER BY day) AS rn,
         lag(rev, 7) OVER (ORDER BY day) AS pred_naive7,
         sum(rev) OVER (ORDER BY day
                        ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING) / 28.0
           AS pred_ma28
  FROM d
), e AS (
  SELECT 'naive7' AS method, rev, pred_naive7::DOUBLE AS pred
  FROM w WHERE rn > 28
  UNION ALL
  SELECT 'ma28' AS method, rev, pred_ma28 AS pred FROM w WHERE rn > 28
)
SELECT method, count(*)::BIGINT AS n_eval_days,
       round(avg(abs(pred - rev)) + 1e-9, 2) AS mae_cents,
       round(avg(2.0 * abs(pred - rev)
                 / nullif(abs(pred) + abs(rev), 0.0)) + 1e-9, 4) AS smape
FROM e GROUP BY method
""",
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/A4 [EXT]: walk-forward forecast backtest of daily revenue —
    seasonal-naive (value 7 days earlier) vs 28-day trailing moving
    average, scored by MAE and symmetric MAPE over every day with a
    full 28-day history. The day grain is CALENDAR-FILLED first
    (sequence + left join), so 'lag 7 rows' is 'lag 7 days' even on
    sparse fixtures; revenue folded to integer cents before any
    arithmetic. sMAPE's denominator is nullif-guarded: a both-zero
    day contributes no term (avg skips NULL on both engines).

    Scale shape: fact collapses to the day grain (map-side combined)
    before any window; the only unpartitioned window covers the
    bounded calendar (~2.5k rows for 7 years), the same
    day-grain-summary pattern as level_shift/acf_daily."""
    o = load_table(spark, sf_dir, "orders").groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev")
    )
    g = o.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = g.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    d = cal.join(o, "day", "left").select(
        "day", F.coalesce(F.col("rev"), F.lit(0)).alias("rev")
    )
    w = Window.orderBy("day")
    wf = d.select(
        "day",
        "rev",
        F.row_number().over(w).alias("rn"),
        F.lag("rev", 7).over(w).cast("double").alias("pred_naive7"),
        (
            F.sum("rev").over(w.rowsBetween(-28, -1)) / F.lit(28.0)
        ).alias("pred_ma28"),
    ).filter(F.col("rn") > 28)
    e = wf.select(
        "rev",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive7").alias("method"),
                    F.col("pred_naive7").alias("pred"),
                ),
                F.struct(
                    F.lit("ma28").alias("method"),
                    F.col("pred_ma28").alias("pred"),
                ),
            )
        ).alias("m"),
    ).select("rev", F.col("m.method").alias("method"), F.col("m.pred").alias("pred"))
    return e.groupBy("method").agg(
        F.count("*").cast("bigint").alias("n_eval_days"),
        F.round(
            F.avg(F.abs(F.col("pred") - F.col("rev"))) + F.lit(1e-9), 2
        ).alias("mae_cents"),
        F.round(
            F.avg(
                F.lit(2.0)
                * F.abs(F.col("pred") - F.col("rev"))
                / F.nullif(
                    F.abs(F.col("pred")) + F.abs(F.col("rev")), F.lit(0.0)
                )
            )
            + F.lit(1e-9),
            4,
        ).alias("smape"),
    )


# ---------------------------------------------------------------------------
# Minimum detectable effect / power analysis
# ---------------------------------------------------------------------------

@register(
    "mde_power",
    f"""
WITH u AS (
  SELECT user_id,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         sum(value) AS y
  FROM events GROUP BY user_id
), s AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END)
           / nullif(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0)
           AS mean_control,
         sum(y * y) / count(*) - avg(y) * avg(y) AS v_pool
  FROM u
)
SELECT n_a, n_b,
       round(mean_control + 1e-9, 4) AS mean_control,
       round(sqrt(greatest(v_pool, 0.0)) + 1e-9, 4) AS sd_pooled,
       round((1.959964 + 0.841621) * sqrt(greatest(v_pool, 0.0))
             * sqrt(1.0 / n_a + 1.0 / n_b) + 1e-9, 4) AS mde_abs,
       round((1.959964 + 0.841621) * sqrt(greatest(v_pool, 0.0))
             * sqrt(1.0 / n_a + 1.0 / n_b)
             / nullif(mean_control, 0.0) + 1e-9, 4) AS mde_rel
FROM s
""",
)
def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: power analysis for the per-user revenue metric —
    the minimum detectable effect at alpha=0.05 (two-sided) and 80%
    power: MDE = (z_{{0.975}} + z_{{0.80}}) * sd * sqrt(1/n_a + 1/n_b)
    with the pooled population sd, i.e. the sizing arithmetic every
    experiment design review runs BEFORE launch. Constants 1.959964 /
    0.841621 are normal quantiles as literals (neither engine has an
    inverse normal CDF builtin — literals keep the two sides exactly
    aligned). greatest(v,0) guards the tiny-negative moment-expansion
    variance; nullif guards the one-sided-split and zero-mean edges.

    Scale shape: one user-grain hash agg, then a single 1-row
    conditional aggregate — O(1) after the user agg."""
    from resume_jd_matcher_spark.functions.text import hash32

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.sum("value").alias("y")).withColumn(
        "arm",
        hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))) % 2,
    )
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
        (
            F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0.0))
            / F.nullif(
                F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)), F.lit(0)
            )
        ).alias("mean_control"),
        (
            F.sum(F.col("y") * F.col("y")) / F.count("*")
            - F.avg("y") * F.avg("y")
        ).alias("v_pool"),
    )
    sd = F.sqrt(F.greatest(F.col("v_pool"), F.lit(0.0)))
    mde = (
        F.lit(1.959964 + 0.841621)
        * sd
        * F.sqrt(F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(F.col("mean_control") + F.lit(1e-9), 4).alias("mean_control"),
        F.round(sd + F.lit(1e-9), 4).alias("sd_pooled"),
        F.round(mde + F.lit(1e-9), 4).alias("mde_abs"),
        F.round(
            mde / F.nullif(F.col("mean_control"), F.lit(0.0)) + F.lit(1e-9), 4
        ).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects (per-arm user-revenue deciles)
# ---------------------------------------------------------------------------

@register(
    "qte_deciles",
    f"""
WITH u AS (
  SELECT user_id,
         {_SQL_H32.format(x="user_id::VARCHAR || '#ab'")} % 2 AS arm,
         round(sum(value) * 100)::BIGINT AS y
  FROM events GROUP BY user_id
), q AS (
  SELECT arm,
         quantile_cont(y, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           AS qs
  FROM u GROUP BY arm
), e AS (
  SELECT arm, i, qs[i] AS q
  FROM q CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS i) t
)
SELECT 'p' || (i * 10)::VARCHAR AS decile,
       round(max(CASE WHEN arm = 0 THEN q END) + 1e-9, 2) AS q_control,
       round(max(CASE WHEN arm = 1 THEN q END) + 1e-9, 2) AS q_treat,
       round(max(CASE WHEN arm = 1 THEN q END)
             - max(CASE WHEN arm = 0 THEN q END) + 1e-9, 2) AS qte
FROM e GROUP BY i
""",
)
def q_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 [EXT]: quantile treatment effects — per-arm deciles of
    user revenue (integer cents) and their treatment-minus-control
    gaps, the distributional readout that catches effects a mean
    comparison hides (heavy-tail lift, median-only movement).
    Percentiles come from operators/percentiles.group_percentiles_exact
    — the bounded bucket-histogram exact-percentile plan (quantile_cont
    semantics, never an ObjectHashAggregate value buffer), with arm as
    the group key; the 2x9 result is melted and pivoted on bounded
    rows only.

    Scale shape: one user-grain hash agg, then the two-scan
    bucket-histogram percentile plan on the user grain; everything
    after is O(1) on 18 rows."""
    from resume_jd_matcher_spark.functions.text import hash32
    from resume_jd_matcher_spark.operators.percentiles import (
        group_percentiles_exact,
    )

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.round(F.sum("value") * 100).cast("bigint").alias("y")
    ).withColumn(
        "arm",
        hash32(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))) % 2,
    )
    tags = [(f"p{i * 10}", i / 10.0) for i in range(1, 10)]
    p = group_percentiles_exact(u, "arm", "y", tags)
    melted = p.select(
        "arm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tag).alias("decile"), F.col(tag).alias("q")
                    )
                    for tag, _ in tags
                ]
            )
        ).alias("m"),
    ).select("arm", F.col("m.decile").alias("decile"), F.col("m.q").alias("q"))
    return melted.groupBy("decile").agg(
        F.round(
            F.max(F.when(F.col("arm") == 0, F.col("q"))) + F.lit(1e-9), 2
        ).alias("q_control"),
        F.round(
            F.max(F.when(F.col("arm") == 1, F.col("q"))) + F.lit(1e-9), 2
        ).alias("q_treat"),
        F.round(
            F.max(F.when(F.col("arm") == 1, F.col("q")))
            - F.max(F.when(F.col("arm") == 0, F.col("q")))
            + F.lit(1e-9),
            2,
        ).alias("qte"),
    )


# ---------------------------------------------------------------------------
# Compaction planning (contiguous bin packing by cumulative size)
# ---------------------------------------------------------------------------

@register(
    "compaction_plan",
    """
WITH p AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
), b AS (
  SELECT ((cum - n_chars) // 100000)::BIGINT AS bin, doc_id, n_chars
  FROM p
)
SELECT bin, count(*)::BIGINT AS n_files,
       sum(n_chars)::BIGINT AS total_chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       round(sum(n_chars) / 100000.0 + 1e-9, 4) AS fill_ratio
FROM b GROUP BY bin
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC8 [EXT]: small-file compaction planning — assign documents
    (stand-ins for data files, sized by n_chars) to contiguous output
    groups of ~100k chars by bucketing the EXCLUSIVE running total:
    bin = floor(cum_before / target). Contiguity preserves the
    doc_id sort order inside every output group (the property that
    keeps downstream zone maps tight — see zone_map_pruning), which
    is why this is a prefix-scan problem and not a bin-packing
    heuristic. The running total comes from operators/prefix.
    global_prefix with bigint accumulation — distributed, no
    single-partition window, bit-deterministic.

    Scale shape: the bucketed prefix-scan shuffle (data partitioned
    by range bucket, one n_buckets-row offsets broadcast), then a
    bin-grain agg — both linear, no global window over data rows.
    bounds="width" deliberately: the order key is doc_id, a dense
    UNIFORM surrogate key — equal-width buckets are already balanced
    and skip the height mode's extra percentile pass (the skew curve
    only favors height for power-law keys); checkpoint=False: bare
    2-column scan projection, re-read beats materializing."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    p = global_prefix(
        d, ["doc_id"], "n_chars", sum_type="bigint", checkpoint=False
    )
    b = p.select(
        F.floor(
            (F.col("cum_sum") - F.col("n_chars")) / F.lit(100000)
        ).alias("bin"),
        "doc_id",
        "n_chars",
    )
    return b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.round(
            F.sum("n_chars") / F.lit(100000.0) + F.lit(1e-9), 4
        ).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# Join-strategy advisor
# ---------------------------------------------------------------------------

_ADVISOR_BROADCAST_ROWS = 20000
_ADVISOR_SKEW_SHARE = 0.01

@register(
    "join_plan_advisor",
    f"""
WITH
c_b AS (SELECT count(*)::BIGINT AS build_rows FROM customer),
c_p AS (
  SELECT sum(c)::BIGINT AS probe_rows, count(*)::BIGINT AS probe_ndv,
         max(c)::BIGINT AS top
  FROM (SELECT o_custkey, count(*)::BIGINT AS c FROM orders GROUP BY 1)
),
p_b AS (SELECT count(*)::BIGINT AS build_rows FROM part),
p_p AS (
  SELECT sum(c)::BIGINT AS probe_rows, count(*)::BIGINT AS probe_ndv,
         max(c)::BIGINT AS top
  FROM (SELECT l_partkey, count(*)::BIGINT AS c FROM lineitem GROUP BY 1)
),
o_b AS (SELECT count(*)::BIGINT AS build_rows FROM orders),
o_p AS (
  SELECT sum(c)::BIGINT AS probe_rows, count(*)::BIGINT AS probe_ndv,
         max(c)::BIGINT AS top
  FROM (SELECT l_orderkey, count(*)::BIGINT AS c FROM lineitem GROUP BY 1)
),
all_j AS (
  SELECT 'orders_customer' AS join_name, c_b.build_rows, c_p.probe_rows,
         c_p.probe_ndv, c_p.top FROM c_b, c_p
  UNION ALL
  SELECT 'lineitem_part', p_b.build_rows, p_p.probe_rows, p_p.probe_ndv,
         p_p.top FROM p_b, p_p
  UNION ALL
  SELECT 'lineitem_orders', o_b.build_rows, o_p.probe_rows, o_p.probe_ndv,
         o_p.top FROM o_b, o_p
)
SELECT join_name, build_rows, probe_rows, probe_ndv,
       round(top / probe_rows::DOUBLE + 1e-9, 6) AS top_key_share,
       CASE WHEN build_rows <= {_ADVISOR_BROADCAST_ROWS} THEN 'broadcast'
            WHEN round(top / probe_rows::DOUBLE + 1e-9, 6)
                 > {_ADVISOR_SKEW_SHARE} THEN 'salted-smj'
            ELSE 'sort-merge' END AS strategy
FROM all_j
""",
)
def q_join_plan_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 [EXT]: join-strategy advisor — the statistics pass a
    100 TB planner (or a human reviewing one) runs before picking a
    physical join: build-side cardinality, probe-side cardinality /
    key NDV, and the top-key share (the skew signal). Emits the
    decision the engine itself would make: 'broadcast' when the build
    side fits the broadcast threshold, 'salted-smj' when one probe
    key holds > 1% of rows (AQE skew-split territory), else plain
    sort-merge. The decision compares the ROUNDED share so the label
    can't flip on a last-bit float difference; thresholds are module
    constants so tests can reference them.

    Scale shape: per join, one build-side count and one probe-side
    per-key agg summarized to 1 row (map-side combined) — three
    bounded 1-row frames unioned; no join of fact-sized inputs
    anywhere."""
    def probe_stats(df: DataFrame, key: str) -> DataFrame:
        per = df.groupBy(key).agg(F.count("*").cast("bigint").alias("c"))
        return per.agg(
            F.sum("c").cast("bigint").alias("probe_rows"),
            F.count("*").cast("bigint").alias("probe_ndv"),
            F.max("c").cast("bigint").alias("top"),
        )

    def one(name: str, build: DataFrame, probe: DataFrame, key: str) -> DataFrame:
        b = build.agg(F.count("*").cast("bigint").alias("build_rows"))
        return (
            b.crossJoin(F.broadcast(probe_stats(probe, key)))
            .select(
                F.lit(name).alias("join_name"),
                "build_rows",
                "probe_rows",
                "probe_ndv",
                F.round(
                    F.col("top") / F.col("probe_rows").cast("double")
                    + F.lit(1e-9),
                    6,
                ).alias("top_key_share"),
            )
            .withColumn(
                "strategy",
                F.when(
                    F.col("build_rows") <= F.lit(_ADVISOR_BROADCAST_ROWS),
                    F.lit("broadcast"),
                )
                .when(
                    F.col("top_key_share") > F.lit(_ADVISOR_SKEW_SHARE),
                    F.lit("salted-smj"),
                )
                .otherwise(F.lit("sort-merge")),
            )
        )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        one("orders_customer", customer, orders, "o_custkey")
        .unionByName(one("lineitem_part", part, lineitem, "l_partkey"))
        .unionByName(one("lineitem_orders", orders, lineitem, "l_orderkey"))
    )


# ---------------------------------------------------------------------------
# Exact tie-aware ROC AUC (Mann-Whitney via the multi-sum prefix scan)
# ---------------------------------------------------------------------------

@register(
    "roc_auc",
    """
WITH e AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), v AS (
  SELECT value,
         sum(label)::BIGINT AS np_v,
         sum(1 - label)::BIGINT AS nn_v
  FROM e GROUP BY value
), p AS (
  SELECT np_v, nn_v,
         sum(nn_v) OVER (ORDER BY value
                         ROWS UNBOUNDED PRECEDING) AS cum_nn
  FROM v
), s AS (
  SELECT sum(np_v)::BIGINT AS n_pos, sum(nn_v)::BIGINT AS n_neg,
         sum(np_v * (cum_nn::DOUBLE - nn_v + nn_v / 2.0)) AS num
  FROM p
)
SELECT n_pos, n_neg,
       round(num / nullif(n_pos::DOUBLE * n_neg, 0.0) + 1e-9, 6) AS auc,
       round(2.0 * num / nullif(n_pos::DOUBLE * n_neg, 0.0) - 1.0
             + 1e-9, 6) AS gini
FROM s
""",
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 [EXT]: exact tie-aware ROC AUC of the event value
    predicting a purchase — the Mann-Whitney identity AUC =
    P(score_pos > score_neg) + P(tie)/2, computed on the VALUE GRAIN:
    group scores, then one distributed prefix scan
    (operators/prefix.global_prefix, multi-sum) accumulates the
    negative-count ECDF, and each value contributes
    np_v * (cum_neg_below + nn_v/2). No per-row global rank, no
    single-partition window — the same plan at 100 TB ranks ~distinct
    score values, not rows. Gini = 2*AUC - 1 alongside.

    Scale shape: fact -> value-grain agg (map-side combined), the
    bucketed prefix-scan shuffle over distinct values, then a 1-row
    finalize. bounds="width" deliberately: the order key is the
    distinct event value — near-uniform over its range in this
    domain, so equal-width buckets are balanced without the height
    mode's extra percentile pass."""
    from resume_jd_matcher_spark.operators.prefix import global_prefix

    e = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    v = e.groupBy("value").agg(
        F.sum("label").cast("bigint").alias("np_v"),
        F.sum(1 - F.col("label")).cast("bigint").alias("nn_v"),
    )
    p = global_prefix(v, ["value"], ["np_v", "nn_v"], sum_type="bigint")
    s = p.agg(
        F.sum("np_v").cast("bigint").alias("n_pos"),
        F.sum("nn_v").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("np_v")
            * (
                F.col("cum_nn_v").cast("double")
                - F.col("nn_v")
                + F.col("nn_v") / F.lit(2.0)
            )
        ).alias("num"),
    )
    denom = F.nullif(
        F.col("n_pos").cast("double") * F.col("n_neg"), F.lit(0.0)
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.round(F.col("num") / denom + F.lit(1e-9), 6).alias("auc"),
        F.round(
            F.lit(2.0) * F.col("num") / denom - F.lit(1.0) + F.lit(1e-9), 6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Calibration / reliability bins
# ---------------------------------------------------------------------------

@register(
    "calibration_eval",
    """
WITH e AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), g AS (
  SELECT avg(value) AS mu,
         sqrt(greatest(sum(value * value) / count(*)
                       - avg(value) * avg(value), 1e-12)) AS sd
  FROM e
), p AS (
  SELECT label,
         round(1.0 / (1.0 + exp(-(value - g.mu) / g.sd)), 9) AS p_hat
  FROM e, g
), b AS (
  SELECT least(floor(p_hat * 10), 9)::INT AS bin, label, p_hat FROM p
)
SELECT bin, count(*)::BIGINT AS n,
       round(avg(p_hat) + 1e-9, 4) AS mean_pred,
       round(avg(label::DOUBLE) + 1e-9, 4) AS obs_rate,
       round(abs(avg(p_hat) - avg(label::DOUBLE)) + 1e-9, 4) AS abs_gap
FROM b GROUP BY bin
""",
)
def q_calibration_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: calibration / reliability diagram of a deterministic
    logistic score (sigmoid of the standardized event value) against
    the purchase label — per-decile-of-prediction bins with mean
    predicted probability, observed rate, and the absolute gap (the
    per-bin term of Expected Calibration Error). The score is a fixed
    closed form on both engines (one 1-row moment agg broadcast
    back), so the oracle replays it exactly; sd is floored at 1e-12
    to keep the degenerate constant-value case finite, and bin 10
    (p_hat == 1.0) folds into bin 9 via least().

    Scale shape: 1-row moments agg broadcast, then one 10-cell hash
    agg over the fact — map-side combined, no window, no join."""
    e = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    g = e.agg(
        F.avg("value").alias("mu"),
        F.sqrt(
            F.greatest(
                F.sum(F.col("value") * F.col("value")) / F.count("*")
                - F.avg("value") * F.avg("value"),
                F.lit(1e-12),
            )
        ).alias("sd"),
    )
    # p_hat is rounded to 9 dp BEFORE the discrete bin cut: mu/sd come
    # from parallel double summation whose accumulation order differs
    # between engines, and floor(raw_p_hat * 10) is the one discrete
    # key in the family computed from raw floats — a row whose score
    # sits ulps from a decile edge would otherwise bin differently on
    # the two engines.
    p = e.crossJoin(F.broadcast(g)).select(
        "label",
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-(F.col("value") - F.col("mu")) / F.col("sd"))
            ),
            9,
        ).alias("p_hat"),
    )
    b = p.select(
        F.least(F.floor(F.col("p_hat") * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
        "label",
        "p_hat",
    )
    return b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("p_hat") + F.lit(1e-9), 4).alias("mean_pred"),
        F.round(F.avg(F.col("label").cast("double")) + F.lit(1e-9), 4).alias(
            "obs_rate"
        ),
        F.round(
            F.abs(F.avg("p_hat") - F.avg(F.col("label").cast("double")))
            + F.lit(1e-9),
            4,
        ).alias("abs_gap"),
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity profile
# ---------------------------------------------------------------------------

@register(
    "k_anonymity",
    """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         count(*)::BIGINT AS sz,
         count(DISTINCT floor(c_acctbal / 1000))::BIGINT AS l_div
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT count(*)::BIGINT AS n_groups,
       min(sz)::BIGINT AS k_min,
       min(l_div)::BIGINT AS l_min,
       sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT AS rows_below_k,
       round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)
             / sum(sz)::DOUBLE + 1e-9, 4) AS pct_below_k,
       min(sz) >= 5 AND min(l_div) >= 2 AS anonymity_ok
FROM g
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: k-anonymity / l-diversity profile of the customer
    table under the quasi-identifier (nation, market segment) with
    the $1000-bucketed account balance as the sensitive attribute —
    the governance gate a dataset passes before external release
    (Sweeney 2002; Machanavajjhala et al. 2007). Reports the smallest
    equivalence class (k_min), the least-diverse class (l_min), the
    row mass in classes below k=5, and the release verdict
    k_min >= 5 AND l_min >= 2. Integer floor-buckets keep the
    sensitive-distinct count identical across engines.

    Scale shape: one QI-grain hash agg (map-side combined; the
    distinct runs inside the same grouping) then a 1-row finalize —
    the QI grain is dimension-bounded (nations x segments)."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("sz"),
        F.countDistinct(F.floor(F.col("c_acctbal") / 1000))
        .cast("bigint")
        .alias("l_div"),
    )
    return g.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.min("sz").cast("bigint").alias("k_min"),
        F.min("l_div").cast("bigint").alias("l_min"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
        F.round(
            F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
            / F.sum("sz").cast("double")
            + F.lit(1e-9),
            4,
        ).alias("pct_below_k"),
        ((F.min("sz") >= 5) & (F.min("l_div") >= 2)).alias("anonymity_ok"),
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (deterministic seeded Laplace)
# ---------------------------------------------------------------------------

@register(
    "dp_noisy_counts",
    f"""
WITH c AS (
  SELECT c_nationkey, count(*)::BIGINT AS true_count
  FROM customer GROUP BY c_nationkey
), u AS (
  SELECT c_nationkey, true_count,
         ({_SQL_H32.format(x="c_nationkey::VARCHAR || '#dp'")} % 100000
          + 0.5) / 100000.0 AS unif
  FROM c
)
SELECT c_nationkey, true_count,
       round(true_count
             - sign(unif - 0.5) * ln(1.0 - 2.0 * abs(unif - 0.5))
             + 1e-9, 3) AS noisy_count,
       1.0 AS epsilon
FROM u
""",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: per-nation customer counts released under
    epsilon=1.0 differential privacy — Laplace(1/eps) noise via the
    inverse-CDF transform x = -b*sign(u-1/2)*ln(1-2|u-1/2|) on a
    SEEDED portable-hash uniform (Dwork et al. 2006). The seeded
    hash replaces an RNG so the release is reproducible across
    engines, runs and cluster sizes — the property an auditable DP
    pipeline needs (per-release salt rotation is the deployment
    knob); u in (0,1) strictly by the +0.5/100000 offset, so the log
    argument never reaches 0. true_count is emitted alongside ONLY
    because this fixture is synthetic — a production release drops
    the column; the test asserts the noise law, not secrecy.

    Scale shape: one dimension-grain hash agg then scalar arithmetic
    per group — O(groups) after the fact scan."""
    from resume_jd_matcher_spark.functions.text import hash32

    c = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    u = c.withColumn(
        "unif",
        (
            hash32(
                F.concat(F.col("c_nationkey").cast("string"), F.lit("#dp"))
            )
            % 100000
            + F.lit(0.5)
        )
        / F.lit(100000.0),
    )
    lap = -F.signum(F.col("unif") - 0.5) * F.log(
        F.lit(1.0) - 2.0 * F.abs(F.col("unif") - 0.5)
    )
    return u.select(
        "c_nationkey",
        "true_count",
        F.round(F.col("true_count") + lap + F.lit(1e-9), 3).alias(
            "noisy_count"
        ),
        F.lit(1.0).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences (2x2 pre/post x control/treatment)
# ---------------------------------------------------------------------------

@register(
    "diff_in_did",
    f"""
WITH e AS (
  SELECT {_SQL_H32.format(x="user_id::VARCHAR || '#did'")} % 2 AS arm,
         floor(epoch(ts) / 86400)::BIGINT AS day,
         floor(value * 1000000 + 0.5)::BIGINT AS micros
  FROM events
), b AS (
  SELECT (min(day) + max(day)) // 2 AS cutoff FROM e
), c AS (
  SELECT arm, CASE WHEN day >= b.cutoff THEN 1 ELSE 0 END AS post,
         count(*)::BIGINT AS n, sum(micros)::HUGEINT AS s,
         sum(micros::HUGEINT * micros::HUGEINT)::HUGEINT AS ss
  FROM e CROSS JOIN b GROUP BY 1, 2
), m AS (
  SELECT arm, post, n, s::DOUBLE / n / 1e6 AS mean,
         (ss * n - s * s)::DOUBLE
           / nullif(n::DOUBLE * n * (n - 1), 0.0) / 1e12 AS var_mean
  FROM c
), f AS (
  SELECT
    max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
    max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
    max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
    max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
    max(CASE WHEN arm = 0 AND post = 0 THEN mean END) AS m_c_pre,
    max(CASE WHEN arm = 0 AND post = 1 THEN mean END) AS m_c_post,
    max(CASE WHEN arm = 1 AND post = 0 THEN mean END) AS m_t_pre,
    max(CASE WHEN arm = 1 AND post = 1 THEN mean END) AS m_t_post,
    sum(var_mean) AS var_sum
  FROM m
)
SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       round(m_c_pre + 1e-9, 4) AS mean_c_pre,
       round(m_c_post + 1e-9, 4) AS mean_c_post,
       round(m_t_pre + 1e-9, 4) AS mean_t_pre,
       round(m_t_post + 1e-9, 4) AS mean_t_post,
       round((m_t_post - m_t_pre) - (m_c_post - m_c_pre) + 1e-9, 4) AS did,
       round(sqrt(var_sum) + 1e-9, 4) AS se,
       round(((m_t_post - m_t_pre) - (m_c_post - m_c_pre))
             / nullif(sqrt(var_sum), 0.0) + 1e-9, 4) AS z
FROM f
""",
)
def q_diff_in_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [EXT]: difference-in-differences estimator on the events
    stream — portable-hash arms (the ab_test_ztest convention), the
    pre/post boundary at the calendar midpoint, and the 2x2
    cell-mean contrast (t_post - t_pre) - (c_post - c_pre) with the
    independent-cells standard error sqrt(sum var(cell mean))
    (Card & Krueger 1994 two-period design). Cell sums/sumsq stay in
    exact integer micros, so the four means are bit-identical across
    engines before the one rounded contrast.

    Scale shape: ONE conditional hash agg over the fact (map-side
    combined, 4 groups) after a 1-row min/max broadcast for the
    cutoff — no window, no join wider than the broadcast, the
    flagship 100 TB shape."""
    from resume_jd_matcher_spark.functions.text import hash32

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (
            hash32(F.concat(F.col("user_id").cast("string"), F.lit("#did")))
            % 2
        ).alias("arm"),
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("micros"),
    )
    b = e.agg(
        F.floor((F.min("day") + F.max("day")) / 2)
        .cast("bigint")
        .alias("cutoff")
    )
    c = (
        e.crossJoin(F.broadcast(b))
        .groupBy(
            "arm",
            F.when(F.col("day") >= F.col("cutoff"), 1)
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("micros").cast("decimal(38,0)")).alias("s"),
            F.sum(
                F.col("micros").cast("decimal(38,0)")
                * F.col("micros").cast("decimal(38,0)")
            ).alias("ss"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n") / 1e6
    # var(cell mean) from the EXACT integer identity (n*ss - s^2) /
    # (n^2 (n-1)): the ss/n - mean^2 spelling cancels catastrophically
    # once ss::DOUBLE rounds past 2^53 and can go (tiny) negative on a
    # near-constant cell — sqrt then aborts the DuckDB oracle and NaNs
    # the Spark side. n*ss >= s^2 holds exactly in decimal/HUGEINT
    # (Cauchy-Schwarz), so the numerator is provably non-negative.
    var_mean = (
        (F.col("ss") * F.col("n") - F.col("s") * F.col("s")).cast("double")
        / F.nullif(
            F.col("n").cast("double") * F.col("n") * (F.col("n") - 1),
            F.lit(0.0),
        )
        / 1e12
    )
    m = c.select("arm", "post", "n", mean.alias("mean"), var_mean.alias("var_mean"))

    def cell(a, p, col):
        return F.max(
            F.when((F.col("arm") == a) & (F.col("post") == p), F.col(col))
        )

    f = m.agg(
        cell(0, 0, "n").alias("n_c_pre"),
        cell(0, 1, "n").alias("n_c_post"),
        cell(1, 0, "n").alias("n_t_pre"),
        cell(1, 1, "n").alias("n_t_post"),
        cell(0, 0, "mean").alias("m_c_pre"),
        cell(0, 1, "mean").alias("m_c_post"),
        cell(1, 0, "mean").alias("m_t_pre"),
        cell(1, 1, "mean").alias("m_t_post"),
        F.sum("var_mean").alias("var_sum"),
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (
        F.col("m_c_post") - F.col("m_c_pre")
    )
    return f.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        F.round(F.col("m_c_pre") + F.lit(1e-9), 4).alias("mean_c_pre"),
        F.round(F.col("m_c_post") + F.lit(1e-9), 4).alias("mean_c_post"),
        F.round(F.col("m_t_pre") + F.lit(1e-9), 4).alias("mean_t_pre"),
        F.round(F.col("m_t_post") + F.lit(1e-9), 4).alias("mean_t_post"),
        F.round(did + F.lit(1e-9), 4).alias("did"),
        F.round(F.sqrt("var_sum") + F.lit(1e-9), 4).alias("se"),
        F.round(
            did / F.nullif(F.sqrt("var_sum"), F.lit(0.0)) + F.lit(1e-9), 4
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert (signup -> purchase latency percentiles)
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    """
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS fs
  FROM events GROUP BY user_id
), conv AS (
  SELECT u.user_id, u.fs,
         min(e.ts) AS fp
  FROM u JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase'
   AND e.ts >= u.fs
  WHERE u.fs IS NOT NULL
  GROUP BY u.user_id, u.fs
), base AS (
  SELECT count(*)::BIGINT AS n_signup FROM u WHERE fs IS NOT NULL
), d AS (
  SELECT epoch(fp) - epoch(fs) AS delay_s FROM conv
)
SELECT base.n_signup,
       count(*)::BIGINT AS n_converted,
       round(count(*) / base.n_signup::DOUBLE + 1e-9, 4) AS conv_rate,
       round(quantile_disc(delay_s, 0.5) / 3600.0 + 1e-9, 3) AS p50_hours,
       round(quantile_disc(delay_s, 0.9) / 3600.0 + 1e-9, 3) AS p90_hours
FROM d CROSS JOIN base
GROUP BY base.n_signup
""",
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/J2 [EXT]: funnel latency — time from a user's first signup
    to their first subsequent purchase, with the conversion rate and
    p50/p90 latency (the funnel-health readout next to
    funnel_conversion's stage counts and kaplan_meier's censored
    curve: this is the converting cohort's latency distribution).
    The conversion join requires purchase AT OR AFTER the signup, so
    pre-signup purchases never produce a negative delay.

    Scale shape: user-grain signup agg (map-side combined), one
    user-keyed equi-join filtered to purchases, a second user-grain
    min-agg, then percentiles over the converted-user grain and a
    1-row output. Delays are exact integer seconds and the
    percentiles are DISCRETE (percentile_disc ≡ quantile_disc,
    verified identical boundary semantics) so both engines divide
    the SAME integer by 3600 — the interpolated spelling lost a
    last-ulp rounding flip at sf0.001 (lo+g·(hi−lo) vs
    (1−g)·lo+g·hi)."""
    e = load_table(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("fs")
        )
        .filter(F.col("fs").isNotNull())
        .localCheckpoint()  # user grain; feeds base count + the join
    )
    conv = (
        u.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .filter(F.col("pts") >= F.col("fs"))
        .groupBy("user_id", "fs")
        .agg(F.min("pts").alias("fp"))
    )
    base = u.agg(F.count("*").cast("bigint").alias("n_signup"))
    d = conv.select(
        (
            F.unix_timestamp("fp") - F.unix_timestamp("fs")
        ).alias("delay_s")
    )
    return (
        d.crossJoin(F.broadcast(base))
        .groupBy("n_signup")
        .agg(
            F.count("*").cast("bigint").alias("n_converted"),
            F.round(
                F.count("*") / F.col("n_signup").cast("double") + F.lit(1e-9),
                4,
            ).alias("conv_rate"),
            F.round(
                F.expr(
                    "percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_s)"
                )
                / 3600.0
                + F.lit(1e-9),
                3,
            ).alias("p50_hours"),
            F.round(
                F.expr(
                    "percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_s)"
                )
                / 3600.0
                + F.lit(1e-9),
                3,
            ).alias("p90_hours"),
        )
        .select("n_signup", "n_converted", "conv_rate", "p50_hours", "p90_hours")
    )
