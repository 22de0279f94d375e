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
):
    """Streaming extraction: parquet-dir source → foreachBatch(extract +
    MERGE + lineage). `trigger_once` processes available data and stops
    (test/backfill mode); otherwise runs continuously at a 5 s trigger —
    the reference queue's default flush rate (queue.go:58-60)."""
    from lens_spark.operators.resume import lineage_rows
    from lens_spark.pipeline import extract
    from lens_spark.schema import DOCUMENTS

    src = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = extract(batch_df, cfg)
        result = res.extracted.cache()
        out_table.merge_upsert(result, "doc_id")
        ckpt_table.append(lineage_rows(result, f"stream-batch-{batch_id}", cfg))
        result.unpersist()

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


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
