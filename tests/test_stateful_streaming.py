"""§2.G stateful ops: explicit group state + foreachBatch scoring."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resume_jd_matcher_spark.sources.io import load_table
from resume_jd_matcher_spark.streaming.events import read_events_stream
from resume_jd_matcher_spark.streaming.stateful import (
    foreach_batch_scorer,
    running_user_totals,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_stateful_running_totals_match_batch(spark):
    stream = running_user_totals(read_events_stream(spark, SF))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            # keep the LAST emitted state per user (update mode re-emits)
            "SELECT user_id, n_events, total_value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn"
            "  FROM t_state) WHERE rn = 1"
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_foreach_batch_scorer(spark):
    docs_dir = tempfile.mkdtemp(prefix="docs_stream_")
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    os.symlink(f"{SF}/documents.parquet", f"{docs_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_schema).format("parquet").load(docs_dir)

    from resume_jd_matcher_spark.streaming.stateful import list_sink

    sink: list = []
    q = foreach_batch_scorer(stream, "spark table data query", list_sink(sink))
    q.awaitTermination()
    assert len(sink) == 5  # top-5 of the single micro-batch
    assert all(0.0 <= r.score <= 10.0 for r in sink)
    assert [r.dist for r in sink] == sorted(r.dist for r in sink)


@pytest.mark.slow
def test_foreach_batch_scorer_default_parquet_sink(spark, tmp_path):
    """With no writer, the scorer lands scored batches in the
    exactly-once batch_id-partitioned parquet sink — no driver-side
    collect anywhere on the default path."""
    docs_dir = tempfile.mkdtemp(prefix="docs_stream_")
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    os.symlink(f"{SF}/documents.parquet", f"{docs_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_schema).format("parquet").load(docs_dir)

    out = str(tmp_path / "scored")
    q = foreach_batch_scorer(stream, "spark table data query", out_dir=out)
    q.awaitTermination()
    scored = spark.read.parquet(out)
    assert scored.count() == 5
    assert {"batch_id", "score", "dist"} <= set(scored.columns)


@pytest.mark.slow
def test_foreach_batch_sink_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch (at-least-once delivery after failure)
    must not duplicate rows: the batch_id-partitioned dynamic
    overwrite rewrites the replayed batch's own partition."""
    from resume_jd_matcher_spark.sources.io import load_table
    from resume_jd_matcher_spark.streaming.stateful import idempotent_batch_sink

    out = str(tmp_path / "sink")
    write = idempotent_batch_sink(out)
    batch = load_table(spark, SF, "events").limit(100)

    write(batch, 0)
    first = spark.read.parquet(out).count()
    write(batch, 0)  # replay of the SAME batch id
    replayed = spark.read.parquet(out).count()
    assert first == replayed == 100

    write(batch, 1)  # a genuinely new batch appends its own partition
    assert spark.read.parquet(out).count() == 200


@pytest.mark.slow
def test_streaming_neardup_first_seen_wins(spark, tmp_path):
    """Incremental MinHash dedup across micro-batches equals the batch
    rule "drop the right side of every qualifying pair" when docs
    arrive in id order: a near-dup of an already-DROPPED document is
    still rejected (the store keeps every seen doc), and intra-batch
    pairs keep the lower id."""
    import glob
    import shutil

    from resume_jd_matcher_spark.operators.dedup import minhash_lsh_candidates
    from resume_jd_matcher_spark.streaming.stateful import foreach_batch_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    uniq1 = "one two three four five six seven eight nine ten eleven twelve"
    uniq2 = "red orange yellow green blue indigo violet cyan magenta teal pink gray"
    batch0 = [
        (1, base),
        (2, base.replace("mu", "nu")),      # near-dup of 1 -> dropped
        (3, uniq1),
    ]
    batch1 = [
        (4, base.replace("mu", "nu").replace("alpha", "beta2")),
        # ^ near-dup of DROPPED 2 -> still rejected (store keeps 2)
        (5, uniq2),
        (6, uniq2.replace("gray", "grey")),  # intra-batch dup of 5
    ]

    src = tmp_path / "docs_src"
    src.mkdir()
    for i, rows in enumerate((batch0, batch1)):
        stage = str(tmp_path / f"_stage{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = str(src / f"{i:02d}_batch.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = foreach_batch_neardup(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "admitted"),
        threshold=0.5,
    )
    q.awaitTermination()

    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "admitted")).collect()}

    full = spark.createDataFrame(batch0 + batch1, "doc_id long, text string")
    drop = {
        r["right_id"]
        for r in minhash_lsh_candidates(full)
        .filter(F.col("est_jaccard") >= 0.5)
        .collect()
    }
    want = {i for i, _ in batch0 + batch1 if i not in drop}
    assert got == want
    assert got == {1, 3, 5}  # sanity: every crafted dup was caught


@pytest.mark.slow
def test_stateful_sessionizer_matches_batch_closed_sessions(spark):
    """The applyInPandasWithState sessionizer equals the batch
    sessionizer: gap-closed sessions emit on detection, and the
    event-time timeout flushes each user's final session when the
    watermark passes end-of-input — so the streamed output covers ALL
    sessions."""
    from resume_jd_matcher_spark.queries.stream_q import q_sessionize
    from resume_jd_matcher_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )
    from resume_jd_matcher_spark.streaming.stateful import sessionize_stateful

    stream = sessionize_stateful(read_events_stream(spark, SF), gap_s=3600)
    got = run_stream_to_memory(stream, "t_sess_state", output_mode="append")
    got_rows = {
        (r["user_id"], r["session_start_us"] // 1_000_000, r["n_events"],
         round(r["total_value"], 2))
        for r in got.collect()
    }

    batch = q_sessionize(spark, SF)
    want_rows = {
        (r["user_id"], r["session_start"], r["n_events"],
         round(r["total_value"], 2))
        for r in batch.collect()
    }
    # Sessions whose last event lies within watermark(1h) + gap(1h) of
    # end-of-input cannot time out before the stream finishes — they
    # correctly stay in state. Everything else must match exactly.
    ev = load_table(spark, SF, "events")
    max_ts = ev.agg(F.max(F.col("ts").cast("long"))).collect()[0][0]
    w2 = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    gap = F.col("ts").cast("long") - F.lag("ts").over(w2).cast("long")
    sess_last = (
        ev.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 3600), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "sid", F.sum("is_new").over(w2.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("session_start"),
            F.max(F.col("ts").cast("long")).alias("last_ts"),
        )
    )
    unflushable = {
        (r["user_id"], r["session_start"])
        for r in sess_last.filter(
            F.col("last_ts") > max_ts - 2 * 3600
        ).collect()
    }
    missing = want_rows - got_rows
    assert got_rows <= want_rows
    assert all((u, st) in unflushable for (u, st, _, _) in missing)
    assert got_rows  # and the bulk of sessions did stream out
