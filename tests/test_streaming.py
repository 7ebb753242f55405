"""§2.G: streamed result == batch twin on the same finite data."""

from __future__ import annotations

import pytest

from resume_jd_matcher_spark.queries.stream_q import (
    q_stream_sliding_counts,
    q_stream_tumbling_counts,
)
from resume_jd_matcher_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_stream_to_memory,
    sliding_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.slow
def test_tumbling_stream_equals_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF))
    got = run_stream_to_memory(stream, "t_tumbling", output_mode="complete")
    want = q_stream_tumbling_counts(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_sliding_stream_equals_batch(spark):
    stream = sliding_counts(read_events_stream(spark, SF))
    got = run_stream_to_memory(stream, "t_sliding", output_mode="complete")
    want = q_stream_sliding_counts(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_stream_dedup_within_watermark(spark):
    stream = dedup_within_watermark(read_events_stream(spark, SF))
    got = run_stream_to_memory(stream, "t_dedup", output_mode="append")
    n = got.count()
    from resume_jd_matcher_spark.sources.io import load_table

    assert n == load_table(spark, SF, "events").select("event_id").distinct().count()


@pytest.mark.slow
def test_sessionize_matches_native_session_window(spark):
    """The lag+cumsum sessionizer agrees with Spark's native
    session_window on session count and per-session event counts
    (fixture gaps never land exactly on the 1h boundary, where the
    two definitions differ by open/closed interval)."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.queries.stream_q import q_sessionize
    from resume_jd_matcher_spark.sources.io import load_table

    ours = q_sessionize(spark, SF)
    e = load_table(spark, SF, "events")
    native = (
        e.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    a = sorted(map(tuple, ours.select("user_id", "n_events").collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b


@pytest.mark.slow
def test_late_data_stream_equals_batch_twin(spark):
    """Two availableNow runs sharing a checkpoint: the watermark
    carried across the restart must discard the replayed stragglers,
    and the appended output must equal the registered batch twin."""
    import os
    import shutil
    import tempfile

    from resume_jd_matcher_spark.queries.stream_q import q_stream_late_data
    from resume_jd_matcher_spark.streaming.events import (
        run_phased_stream,
        stage_events_phased,
        tumbling_counts,
    )

    root = tempfile.mkdtemp(prefix="late_stream_")
    try:
        stage = os.path.join(root, "stage")
        stage_events_phased(spark, SF, stage)
        got = run_phased_stream(
            spark,
            stage,
            tumbling_counts,
            os.path.join(root, "out"),
            os.path.join(root, "ckpt"),
        )
        assert _rows(got) == _rows(q_stream_late_data(spark, SF))
        # the drop is real: fewer aggregated rows than the full table
        from pyspark.sql import functions as F

        from resume_jd_matcher_spark.sources.io import load_table

        n_aggregated = got.agg(F.sum("n")).collect()[0][0]
        assert n_aggregated < load_table(spark, SF, "events").count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.slow
def test_duplicate_replay_emits_each_event_once(spark):
    """mode='duplicate' phased replay: the second micro-batch re-sends
    every 5th pre-cutoff event verbatim. dropDuplicates within the
    checkpointed watermark must emit each event exactly once — replays
    still inside the watermark horizon hit retained dedup state, and
    replays beyond it are discarded as late; neither path duplicates
    output."""
    import os
    import shutil
    import tempfile

    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        run_phased_stream,
        stage_events_phased,
    )

    root = tempfile.mkdtemp(prefix="dup_stream_")
    try:
        stage = os.path.join(root, "stage")
        ontime, late = stage_events_phased(spark, SF, stage, mode="duplicate")
        # the replay is real: late file re-sends pre-cutoff event_ids
        on_ids = {r.event_id for r in spark.read.parquet(ontime).collect()}
        late_ids = {r.event_id for r in spark.read.parquet(late).collect()}
        assert on_ids & late_ids
        got = run_phased_stream(
            spark,
            stage,
            dedup_within_watermark,
            os.path.join(root, "out"),
            os.path.join(root, "ckpt"),
        )
        n_distinct_input = (
            load_table(spark, SF, "events").select("event_id").distinct().count()
        )
        assert got.count() == n_distinct_input
        assert got.select("event_id").distinct().count() == got.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.slow
def test_stream_stream_join_equals_batch(spark):
    from resume_jd_matcher_spark.queries.stream_q import (
        q_stream_attribution_join,
    )
    from resume_jd_matcher_spark.streaming.events import stream_stream_join

    stream = stream_stream_join(read_events_stream(spark, SF))
    got = run_stream_to_memory(stream, "t_ssjoin", output_mode="append")
    want = q_stream_attribution_join(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_session_window_stream_equals_batch(spark):
    """Native session_window produces IDENTICAL sessions in streaming
    (state-store UpdatingSessions under a watermark) and batch
    (MergingSessions) — the engine's §2.G sessionizer contract."""
    from resume_jd_matcher_spark.queries.stream_q import q_session_window_agg
    from resume_jd_matcher_spark.streaming.events import session_window_counts

    stream = session_window_counts(
        read_events_stream(spark, SF).withWatermark("ts", "2 hours")
    )
    got = run_stream_to_memory(stream, "t_session_window", output_mode="complete")
    want = q_session_window_agg(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_hll_sketch_streams_equal_batch(spark):
    """The HLL register sketch is a pure max-aggregate, so it runs
    unchanged as a streaming aggregation (complete mode): registers
    after consuming the whole stream must equal the batch sketch —
    the merge-by-max law that makes it a streaming/distributed
    aggregate."""
    from resume_jd_matcher_spark.operators.textstats import hll_sketch
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, SF)
    got = run_stream_to_memory(
        hll_sketch(stream, "event_type", "user_id"),
        "hll_stream",
        output_mode="complete",
    )
    want = hll_sketch(load_table(spark, SF, "events"), "event_type", "user_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.slow
def test_cms_sketch_streams_equal_batch(spark):
    """The count-min sketch is a pure sum-aggregate over (seed, col)
    cells, so it runs unchanged as a streaming aggregation (complete
    mode): cells after consuming the whole stream equal the batch
    sketch — merge-by-sum, CMS's streaming law (HLL's max-merge
    sibling test above)."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.operators.textstats import cms_sketch
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, SF).select(
        F.col("event_type").alias("text")
    )
    got = run_stream_to_memory(
        cms_sketch(stream, d=4, w=32), "cms_stream", output_mode="complete"
    )
    want = cms_sketch(
        load_table(spark, SF, "events").select(
            F.col("event_type").alias("text")
        ),
        d=4,
        w=32,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stream_static_enrich_equals_batch(spark):
    """Stream-static enrichment: the static tier dim is computed once
    in batch; the streamed run over the replayed file source must
    produce exactly the batch twin's rows."""
    from resume_jd_matcher_spark.queries.stream_q import q_stream_static_enrich
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stream_static_enrich,
        user_tier_dim,
    )

    sf = "/root/testdata/sf0.001"
    dim = user_tier_dim(load_table(spark, sf, "events"))
    stream = stream_static_enrich(read_events_stream(spark, sf), dim)
    got = run_stream_to_memory(stream, "t_static_enrich", output_mode="complete")
    want = q_stream_static_enrich(spark, sf)
    key = lambda r: (r["day_epoch"], r["tier"], r["event_type"], r["n"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_stream_drift_monitor_equals_batch(spark):
    """Streaming PSI drift: ONE bounded streaming agg (window x type x
    bucket counts) + stateless batch finalize must equal the batch
    twin rows exactly."""
    from resume_jd_matcher_spark.queries.stream_q import q_stream_drift_monitor
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.drift import (
        baseline_dist,
        psi_finalize,
        stream_bucket_counts,
    )
    from resume_jd_matcher_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    base = baseline_dist(load_table(spark, sf, "events"))
    counts = run_stream_to_memory(
        stream_bucket_counts(read_events_stream(spark, sf)),
        "t_drift_counts",
        output_mode="complete",
    )
    got = psi_finalize(counts, base)
    want = q_stream_drift_monitor(spark, sf)
    assert _rows(got) == _rows(want)
    # PSI of a window against a baseline is >= 0 up to the eps floor
    assert all(r["psi"] >= -1e-6 for r in got.collect())


def test_drift_bucket_clamped_both_ends(spark):
    """Negative values must clamp into bucket 0 (not a phantom
    bucket < 0 outside the completed grid): a drift INTO negative
    values has to contribute PSI mass, and bucket shares must keep
    summing to 1."""
    import datetime

    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.streaming.drift import (
        N_BUCKETS,
        baseline_dist,
        value_bucket,
    )

    vals = spark.createDataFrame(
        [(-1000.0,), (-0.01,), (0.0,), (24.9,), (25.0,), (9999.0,)],
        "value double",
    )
    got = [r[0] for r in vals.select(value_bucket(F.col("value"))).collect()]
    assert got == [0, 0, 0, 0, 1, N_BUCKETS - 1]

    # all-negative batch: every row lands in bucket 0, so the grid's
    # p_base sums to ~1 (+ the 9 EPS floors), never < 1 from leakage
    neg = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "click", -5.0, "{}")] * 40,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    base = {r["bkt"]: r["p_base"] for r in baseline_dist(neg).collect()}
    assert base[0] == pytest.approx(1.0)
    assert sum(base.values()) == pytest.approx(1.0 + 9e-4, abs=1e-6)


@pytest.mark.slow
def test_session_type_dedup_stream_equals_batch(spark):
    """Session-gap dedup: keyed (user, type) session_window collapses
    same-type bursts identically in streaming (state-store sessions
    under a watermark) and batch."""
    from resume_jd_matcher_spark.queries.stream_q import q_stream_session_dedup
    from resume_jd_matcher_spark.streaming.events import session_type_dedup

    stream = session_type_dedup(
        read_events_stream(spark, SF).withWatermark("ts", "2 hours")
    )
    got = run_stream_to_memory(stream, "t_session_dedup", output_mode="complete")
    want = q_stream_session_dedup(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_session_dedup_collapses_duplicate_replay(spark):
    """A verbatim replay of in-session events must not create new
    session rows — duplicates land in the SAME (user, type) session
    and only inflate n_dupes. Compares the deduped session count on
    the original data vs data + replay (batch semantics twin of the stream
    guarantee)."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import session_type_dedup

    e = load_table(spark, SF, "events")
    replayed = e.unionByName(e.filter(F.col("event_id") % 5 == 0))
    base = session_type_dedup(e)
    with_dupes = session_type_dedup(replayed)
    assert base.count() == with_dupes.count()
    # the replay is visible only in multiplicities
    assert (
        with_dupes.agg(F.sum("n_dupes")).collect()[0][0]
        > base.agg(F.sum("n_dupes")).collect()[0][0]
    )


@pytest.mark.slow
def test_ann_dedup_gate_stream_equals_batch(spark):
    """Stream-static ANN gate: arriving embeddings replayed through a
    file source, LSH-bucket-joined to the broadcast static index with
    a struct-min top-1 — streamed rows must equal the batch twin."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.queries.stream_q import q_stream_ann_dedup_gate
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        ann_dedup_gate,
        read_embeddings_stream,
    )

    static_index = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") % 4 != 3
    )
    stream = ann_dedup_gate(
        read_embeddings_stream(spark, SF), static_index, threshold=1.5
    )
    got = run_stream_to_memory(stream, "t_ann_gate", output_mode="complete")
    want = q_stream_ann_dedup_gate(spark, SF)
    assert _rows(got) == _rows(want)
    # the gate is non-vacuous: both verdicts appear
    verdicts = {r.is_dup for r in got.collect()}
    assert verdicts == {True, False}


@pytest.mark.slow
def test_topk_trending_stream_plus_finalize_equals_batch(spark):
    """Tumbling pre-aggregate streamed, rank applied as a stateless
    batch finalize (rank windows can't run in-stream) — must equal
    the registered batch twin."""
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.queries.stream_q import q_stream_topk_trending
    from resume_jd_matcher_spark.streaming.events import (
        trending_finalize,
        tumbling_counts,
    )

    stream = tumbling_counts(read_events_stream(spark, SF))
    pre = run_stream_to_memory(stream, "t_trending_pre", output_mode="complete")
    got = trending_finalize(pre.select("day_epoch", "event_type", "n"), k=3)
    want = q_stream_topk_trending(spark, SF)
    assert _rows(got) == _rows(want)


@pytest.mark.slow
def test_view_conversion_outer_stream_equals_batch_on_closed_cohort(spark):
    """LEFT OUTER stream-stream interval join: matched pairs emit
    immediately, NULL (no-conversion) rows emit only when the
    purchase watermark passes view_ts + 1h — so equality with the
    batch twin holds on the WATERMARK-CLOSED cohort (views at least
    window + delay = 2h before stream end); tail views may lack
    their NULL row when the run terminates."""
    import datetime

    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.queries.stream_q import (
        q_stream_view_conversion,
    )
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.events import (
        view_conversion_outer,
    )

    stream = view_conversion_outer(read_events_stream(spark, SF))
    got = run_stream_to_memory(stream, "t_view_conv", output_mode="append")
    want = q_stream_view_conversion(spark, SF)

    max_ts = load_table(spark, SF, "events").agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(hours=2)
    closed = (
        load_table(spark, SF, "events")
        .filter((F.col("event_type") == "view") & (F.col("ts") <= F.lit(cutoff)))
        .select(F.col("event_id").alias("view_id"))
    )
    got_closed = got.join(closed, "view_id")
    want_closed = want.join(closed, "view_id")
    assert _rows(got_closed) == _rows(want_closed)
    # the closed cohort must include genuine NULL-match rows, or the
    # outer arm is vacuous
    assert want_closed.filter("purchase_id = -1").count() > 0
    # matched pairs (emitted immediately) agree on the FULL stream
    assert _rows(got.filter("purchase_id >= 0")) == _rows(
        want.filter("purchase_id >= 0")
    )
