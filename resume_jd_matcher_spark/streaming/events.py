"""Structured Streaming surface (SURVEY.md §2.G — [EXT], no reference
analog: the reference is strictly request/response).

"New documents arriving for matching" is the streaming shape of the
reference's bulk route (app.py:133-180); here the `events` fixture
replays through a file source. Each streaming query has a BATCH TWIN
with identical transformation logic — the correctness gate is
stream-result == batch-result on the same data (DuckDB can't run a
stream, so the twin is what the oracle checks; tests assert the
equivalence).

All aggregations use event-time windows + watermarks so state is
bounded: at scale, watermark lag — not stream length — caps state
size. `dropDuplicates` within the watermark dedups replayed events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (parquet TIMESTAMP_NS)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events fixture (one parquet = one
    micro-batch; real deployments swap in kafka here).

    The file stream source requires a *directory*, and the fixture dir
    mixes all tables — so the events file is staged (symlinked) into a
    scratch directory once per (session, sf_dir).
    """
    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Stable digest (not Python's salted hash()) so every run of the
    # same fixture reuses ONE staging dir instead of leaking a new
    # /tmp/events_stream_* per process.
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{digest}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(os.path.join(sf_dir, "events.parquet"), link)
        except FileExistsError:
            pass  # concurrent stager won the race — same target
    raw = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(stage)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Tumbling event-time window counts per event_type, 1h watermark.

    Output: (day_epoch, event_type, n, total_value) — window start
    exposed as epoch seconds so the batch twin / oracle compare
    exactly.
    """
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("day_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding windows (1 day width, 12h slide) per event_type."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_epoch"),
            "event_type",
            "n",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Exactly-once-ish replay hygiene: drop duplicate event_ids within
    the watermark horizon."""
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming query to completion against the (finite) file
    source and return the materialized result — the test harness for
    stream/batch equivalence."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
