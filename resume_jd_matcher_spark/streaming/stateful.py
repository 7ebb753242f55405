"""Custom stateful streaming operators (SURVEY.md §2.G):
``applyInPandasWithState`` for arbitrary per-key state, and a
``foreachBatch`` scorer that matches each micro-batch of arriving
documents against a static JD — the streaming shape of the reference's
bulk route (app.py:133-180: "new resumes arrive, score them now").
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit
    group state across micro-batches; emits the updated totals for
    users seen in each batch.

    State is two numbers per user — bounded by cardinality, not stream
    length; pair with a timeout for expiring idle users at scale.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        stateStructType="n LONG, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def list_sink(sink: list):
    """TEST-ONLY writer: collects scored rows to a driver-side list.
    Never use on a data path — the collect() pulls every scored row to
    the driver. Exists so assertions can see small fixture batches."""

    def write(scored_df: DataFrame, batch_id: int) -> None:
        sink.extend(scored_df.collect())

    return write


def foreach_batch_scorer(
    docs_stream: DataFrame,
    jd_text: str,
    writer=None,
    out_dir: str | None = None,
) -> Any:
    """foreachBatch: embed each arriving micro-batch of documents and
    score it against the static JD (stub embedder), handing the scored
    top-k DataFrame to ``writer(scored_df, batch_id)``.

    The default writer is the production-shaped exactly-once parquet
    sink (``idempotent_batch_sink(out_dir)`` — batch_id-partitioned
    dynamic overwrite, so checkpoint replays rewrite their own
    partition); pass ``list_sink(some_list)`` in tests when the
    assertion needs driver-side rows. Returns the started
    StreamingQuery."""
    from resume_jd_matcher_spark.operators.embedding import (
        embed_documents,
        embed_query,
    )
    from resume_jd_matcher_spark.operators.similarity_blas import (
        topk_similarity_blas,
    )

    if writer is None:
        if out_dir is None:
            raise ValueError("provide writer= or out_dir= for the default sink")
        writer = idempotent_batch_sink(out_dir)

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        corpus = embed_documents(batch_df, backend="hash", dim=8)
        q = embed_query(spark, jd_text, backend="hash", dim=8)
        topk = topk_similarity_blas(
            corpus, q, k=5, id_col="doc_id", query_id_col="query_id"
        )
        writer(topk, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .start()
    )


def idempotent_batch_sink(out_dir: str):
    """Exactly-once foreachBatch sink: write each micro-batch into a
    ``batch_id=N`` partition with DYNAMIC partition overwrite. A
    replayed batch (failure → checkpoint replay) overwrites ITS OWN
    partition instead of appending duplicates — Spark's documented
    recipe for idempotent file sinks under at-least-once foreachBatch
    delivery. Returns the (batch_df, batch_id) -> None writer.
    """
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write


def foreach_batch_neardup(
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    n_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Any:
    """Incremental streaming near-dedup (the §2.G shape of V8): each
    arriving micro-batch of documents is MinHash-banded and admitted
    only if it near-matches neither a lower-id document in its own
    batch nor ANY previously-seen document (first-seen wins — the
    store keeps every seen document's bands/signatures, admitted or
    not, so a duplicate-of-a-duplicate is still caught, exactly like
    the batch rule "drop the right side of every qualifying pair").

    Per batch the work is: one signature pass over the BATCH only,
    then equi-joins of the batch's bands against the band store — the
    store is never re-signatured, and the join key (band_id,
    band_sig) is what a production deployment would bucket the store
    on, so per-batch cost is O(batch + matching store buckets), not
    O(corpus). Candidate pairs are verified with the same
    est-Jaccard-≥-threshold rule as the registered ``minhash_lsh``
    batch twin.

    Both the store and the admitted-docs sink are batch_id-partitioned
    with dynamic overwrite (``idempotent_batch_sink`` discipline), and
    store reads exclude partitions ≥ the current batch_id — a
    checkpoint-replayed batch recomputes against exactly the store it
    saw the first time, so the whole operator is exactly-once under
    at-least-once foreachBatch delivery.

    Returns the started StreamingQuery; admitted rows land in
    ``out_dir`` (original columns + batch_id).
    """
    from pyspark.sql import functions as F

    from resume_jd_matcher_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
    )

    def _est_jaccard_dups(pairs, sigs_new, sigs_old):
        """Ids (new side) whose candidate pair verifies at/over the
        threshold. pairs: (new_id, old_id); sigs: long-form (id, seed,
        mh)."""
        sn = sigs_new.select(
            F.col(id_col).alias("new_id"), "seed", F.col("mh").alias("mh_n")
        )
        so = sigs_old.select(
            F.col(id_col).alias("old_id"), "seed", F.col("mh").alias("mh_o")
        )
        est = (
            pairs.join(sn, "new_id")
            .join(so, ["old_id", "seed"])
            .groupBy("new_id", "old_id")
            .agg(
                F.avg(
                    F.when(F.col("mh_n") == F.col("mh_o"), 1.0).otherwise(0.0)
                ).alias("est_j")
            )
        )
        return est.filter(F.col("est_j") >= threshold).select("new_id").distinct()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        sigs = minhash_signatures(batch_df, n_hashes, id_col, text_col).persist()
        bands = lsh_bands(sigs, rows_per_band, id_col).persist()
        try:
            dup_ids = None
            # --- cross-batch: batch bands vs the store of earlier batches
            try:
                seen_bands = spark.read.parquet(f"{store_dir}/bands").filter(
                    F.col("batch_id") < batch_id
                )
                seen_sigs = spark.read.parquet(f"{store_dir}/sigs").filter(
                    F.col("batch_id") < batch_id
                )
            except Exception:  # noqa: BLE001  first batch: no store yet
                seen_bands = seen_sigs = None
            if seen_bands is not None:
                cross_pairs = (
                    bands.select(
                        F.col(id_col).alias("new_id"), "band_id", "band_sig"
                    )
                    .join(
                        seen_bands.select(
                            F.col(id_col).alias("old_id"), "band_id", "band_sig"
                        ),
                        ["band_id", "band_sig"],
                    )
                    .select("new_id", "old_id")
                    .distinct()
                )
                dup_ids = _est_jaccard_dups(cross_pairs, sigs, seen_sigs)
            # --- intra-batch: lower id wins
            intra_pairs = (
                bands.select(F.col(id_col).alias("old_id"), "band_id", "band_sig")
                .join(
                    bands.select(
                        F.col(id_col).alias("new_id"), "band_id", "band_sig"
                    ),
                    ["band_id", "band_sig"],
                )
                .filter(F.col("old_id") < F.col("new_id"))
                .select("new_id", "old_id")
                .distinct()
            )
            intra_dups = _est_jaccard_dups(intra_pairs, sigs, sigs)
            dup_ids = (
                intra_dups
                if dup_ids is None
                else dup_ids.unionByName(intra_dups).distinct()
            )
            admitted = batch_df.join(
                dup_ids.select(F.col("new_id").alias(id_col)), id_col, "left_anti"
            )
            # --- persist this batch's bands+sigs (ALL docs) and the
            # admitted rows, each into its own batch_id partition
            for df, path in (
                (bands, f"{store_dir}/bands"),
                (sigs, f"{store_dir}/sigs"),
                (admitted, out_dir),
            ):
                (
                    df.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(path)
                )
        finally:
            sigs.unpersist()
            bands.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stateful(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Custom stateful sessionizer (the applyInPandasWithState analog
    of ``session_window``): per-user state holds the OPEN session
    (start, last_ts, n, total); a gap > ``gap_s`` closes it and emits
    the closed session. An event-time timeout (watermark-driven)
    flushes sessions idle past the gap, so state stays bounded by
    active users — the hand-rolled shape for session logic
    ``session_window`` can't express (custom close conditions,
    side outputs, per-session enrichments).

    Emits CLOSED sessions only; the session still open at end of
    input remains in state (on a live stream the timeout eventually
    flushes it).
    """
    from pyspark.sql import functions as F

    ev = events.withWatermark("ts", "1 hour").select("user_id", "ts", "value")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        out: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            out.append((key[0], start_us, n, total))
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts")
            ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns -> us
            vals = rows["value"].tolist()
            if state.exists:
                start_us, last_us, n, total = state.get
            else:
                start_us, last_us, n, total = ts_us[0], ts_us[0], 0, 0.0
            for t, v in zip(ts_us, vals):
                if t - last_us > gap_s * 1_000_000:
                    out.append((key[0], start_us, n, total))
                    start_us, n, total = t, 0, 0.0
                last_us = t
                n += 1
                total += float(v)
            state.update((start_us, last_us, n, float(total)))
            state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start_us", "n_events", "total_value"],
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id LONG, session_start_us LONG, n_events LONG, total_value DOUBLE"
        ),
        stateStructType="start_us LONG, last_us LONG, n LONG, total DOUBLE",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
