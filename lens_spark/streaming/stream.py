"""Streaming variants.

The reference's "streaming" is a batch queue (engine/queue/queue.go): a
single accumulator thread flushing every 5 s or `batchSize` items — i.e.
micro-batching with atomic visibility per flush. Structured Streaming's
foreachBatch IS that semantic at cluster scale: each micro-batch runs the
extraction pipeline and commits one table snapshot (exactly-once per
doc_id via the MERGE).

`windowed_event_counts` is the watermark/window pattern (not in the
reference — part of the engine's analytics surface) exposed both as a
batch expression (oracle-checkable) and a streaming transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT


def stream_extract(
    spark,
    source_dir: str,
    out_table,
    ckpt_table,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT,
    trigger_once: bool = True,
    quarantine_table=None,
):
    """Streaming extraction: parquet-dir source → foreachBatch(extract +
    MERGE + lineage [+ quarantine]). `trigger_once` processes available
    data and stops (test/backfill mode); otherwise runs continuously at a
    5 s trigger — the reference queue's default flush rate
    (queue.go:58-60)."""
    from lens_spark.operators.resume import lineage_rows
    from lens_spark.pipeline import extract
    from lens_spark.schema import DOCUMENTS

    src = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from lens_spark.operators.resume import quarantine_merge
        from lens_spark.operators.search import prepare_search_index

        if batch_df.isEmpty():
            return
        res = extract(batch_df, cfg)
        # one extraction per micro-batch: spans cache feeds both the
        # extracted MERGE and the quarantine append (see
        # resume.run_resumable — same ADVICE r2 fix); tokens are
        # materialized at write time so facade searches skip re-analysis
        spans = res.spans_flat.cache()
        result = prepare_search_index(res.extracted).cache()
        result.count()
        out_table.merge_upsert(result, "doc_id")
        ckpt_table.append(lineage_rows(result, f"stream-batch-{batch_id}", cfg))
        if quarantine_table is not None:
            q = res.quarantine.withColumn(
                "input_snapshot_id", F.lit(f"stream-batch-{batch_id}")
            )
            if not q.isEmpty():
                # same idempotent doc_id:offset MERGE as run_resumable —
                # one schema for batch- and stream-written quarantine
                # stores, and a redelivered batch updates rather than
                # duplicates
                quarantine_merge(quarantine_table, q)
        spans.unpersist()
        result.unpersist()

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def first_seen_filter(
    stream_df: DataFrame,
    key_col: str,
    order_col: str,
    output_schema,
):
    """Custom stateful streaming operator: emit each key's FIRST row,
    drop every later duplicate — streaming exact-dedup via
    ``applyInPandasWithState`` (Arrow-batched per-key state, the Spark
    primitive for operators the built-in window/watermark model can't
    express).

    Semantics: the first micro-batch in which a key appears wins; within
    that batch the row with the smallest ``order_col`` is emitted
    (deterministic). State per key is a single boolean — O(distinct keys)
    state, no row retention (contrast ``dropDuplicates`` on a stream,
    which is the same idea but built-in; this operator exists as the
    extension point for richer state, e.g. content fingerprints or
    per-key counters).

    At 10^12 docs the state store is the constraint: use RocksDB state
    store (``spark.sql.streaming.stateStore.providerClass``) and a
    watermark-based state TTL if keys are time-bounded.

    ``output_schema``: the stream's schema (StructType or DDL string) —
    output rows are input rows, unchanged."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:  # drain: key already emitted in a prior batch
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_col).iloc[[0]]
            if first is None or (
                cand[order_col].iloc[0] < first[order_col].iloc[0]
            ):
                first = cand
        state.update((True,))
        if first is not None:
            yield first

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window per-type event counts + value sum.

    Batch mode runs the identical expression without the watermark (late
    data is a streaming-only concept); output columns are stable across
    both so downstream code doesn't care which mode produced them."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(
            F.window("ts", window).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionized_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Per-user session windows: events merge into one session while each
    arrives within ``gap`` of the session's current end — INCLUSIVE: an
    event landing exactly on prev_ts + gap still merges (measured,
    pinned by the gap-semantics test); the session ends at
    last_event + gap. Identical to the SQL gaps-and-islands formulation
    with "new island when ts > prev_ts + gap".

    Batch and streaming share the expression (watermark only when
    streaming — required there because session windows are unbounded
    state otherwise; the watermark closes sessions whose end falls
    behind it). State is per live session per user — O(active users),
    the same RocksDB-backed story as the first-seen dedup operator."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def stream_rollup(
    spark,
    source_dir: str,
    table,
    checkpoint_dir: str,
    schema,
    ts_col: str = "ts",
    every_seconds: int = 3600,
    by: list[str] | None = None,
    measure: str = "value",
    trigger_once: bool = True,
    prepare=None,
):
    """Streaming continuous aggregate: parquet-dir source →
    foreachBatch(rollup_increment + rollup_maintain) — the hypertable
    pattern fed by a stream (operators/rollup.py owns the fold).

    ``prepare`` (optional) is a DataFrame→DataFrame transform applied
    to every micro-batch before the fold (e.g. rollup_job's --cents
    quantization). Applying it HERE instead of re-staging a
    transformed copy of the source keeps the file-stream checkpoint
    stable: a re-staged overwrite mints fresh part-file names every
    run, which the checkpoint has never seen, so each rerun re-reads
    the full history as new batches with new batch ids — past the hwm
    guard and straight into the non-idempotent fold (ADVICE r5, high).

    rollup folds are NOT idempotent (re-folding double-counts — the
    module contract), and foreachBatch REDELIVERS a batch after a
    mid-batch failure. The guard is a batch-id high-water mark stored
    next to the table (`_rollup_hwm` — single-writer, same trust
    model as the stream's own checkpoint dir): a redelivered batch_id
    ≤ hwm is skipped. KNOWN WINDOW (ADVICE r5, medium): the hwm is
    written in a separate file write AFTER the MERGE commits; a crash
    BETWEEN the two redelivers the batch with the hwm still at its old
    value, and the re-fold double-counts — the guard bounds
    redelivery to at-most-once-per-committed-hwm, it does NOT make the
    fold exactly-once. Converting it would require committing the
    batch id atomically inside the LensTable snapshot manifest (the
    Delta txn-version pattern); operators needing stronger semantics
    key their increments (M3's queue contract)."""
    import os as _os

    from lens_spark.operators.rollup import (
        rollup_increment, rollup_maintain,
    )

    by = by or []
    hwm_path = _os.path.join(table.path, "_rollup_hwm")

    def _hwm() -> int:
        try:
            with open(hwm_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _hwm() or batch_df.isEmpty():
            return
        if prepare is not None:
            batch_df = prepare(batch_df)
        rollup_maintain(
            table,
            rollup_increment(
                batch_df, ts_col, every_seconds, by, measure
            ),
            by,
        )
        with open(hwm_path, "w") as f:
            f.write(str(batch_id))

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()
