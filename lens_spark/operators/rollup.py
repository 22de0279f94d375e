"""Continuous-aggregate rollup — the hypertable pattern on the
LensTable layer.

"Events/metrics at 10^12 rows, dashboards ask hourly/daily" is the
other classic shape Spark has no first-class story for: a GROUP BY
over the raw table re-scans everything per question, and a
materialized result goes stale on every ingest.  Timescale/ClickHouse
answer with CONTINUOUS AGGREGATES: a stored rollup keyed on
(time bucket, dims) that each ingest increment UPDATES incrementally.

This module is that, Spark-first, on the repo's own snapshot table:

- :func:`rollup_increment` turns an event increment into PARTIAL
  aggregates per (bucket, dims): count / sum / min / max — the
  mergeable set (avg, rate etc. are read-time divisions; quantiles
  need the sketch tier, operators/sketch.py).  One map-side-combined
  groupBy: the increment collapses to ≤ |touched cells| rows before
  the shuffle.
- :func:`rollup_maintain` folds partials into the stored rollup:
  read ONLY the buckets the increment touches
  (``LensTable.read_for_keys`` — the merge_upsert pruning exposed as
  a read), re-combine (sum+sum, min+min, max+max — pure re-aggregate
  over stored ∪ increment partials), MERGE back.  Cost is
  O(increment + touched cells), never O(rollup), never O(raw events)
  — and every commit is a readable snapshot (time travel over rollup
  history for free).

Delivery contract: increments must arrive EXACTLY ONCE (the
streaming tier's foreachBatch/epoch guarantee) — re-folding the same
increment double-counts, by design; idempotent redelivery is the
queue's job (M3), not the aggregate's.

Measure columns must be EXACT types (ints / decimals — quantize
floats first, the repo-wide convention): float partial sums would
drift by combine order and break both the oracle and cross-engine
merges.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["rollup_increment", "rollup_maintain", "ROLLUP_KEY"]

ROLLUP_KEY = "rk"
_SEP = "\x01"  # key-part separator: never appears in numeric dims


def _bucket_start(ts_col: str, every_seconds: int):
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    step = int(every_seconds) * 1_000_000
    return (F.floor(us / F.lit(step)) * F.lit(every_seconds)).cast(
        "long"
    )


def rollup_increment(
    events: DataFrame,
    ts_col: str,
    every_seconds: int,
    by: list[str],
    measure: str,
) -> DataFrame:
    """Partial aggregates of one ingest increment:
    ``(rk, window_start, by…, n, sum_m, min_m, max_m)`` with
    ``window_start`` = epoch seconds of the bucket and ``rk`` the
    single-column merge key (bucket + dims, \\x01-joined — LensTable
    keys on one column)."""
    ws = _bucket_start(ts_col, every_seconds).alias("window_start")
    rows = events.select(
        ws, *[F.col(c) for c in by], F.col(measure).alias("__m")
    )
    rk = F.concat_ws(
        _SEP,
        F.col("window_start").cast("string"),
        *[F.col(c).cast("string") for c in by],
    )
    return (
        rows.groupBy("window_start", *by)
        .agg(
            F.count("*").alias("n"),
            F.sum("__m").alias("sum_m"),
            F.min("__m").alias("min_m"),
            F.max("__m").alias("max_m"),
        )
        .select(rk.alias(ROLLUP_KEY), "*")
    )


def rollup_maintain(
    table,
    increment: DataFrame,
    by: list[str],
) -> str:
    """Fold an increment's partials (:func:`rollup_increment` output)
    into the stored rollup table; returns the committed snapshot.

    Scale shape: ``read_for_keys`` scans only the buckets the
    increment touches; the combine is one groupBy over
    (touched stored cells ∪ increment partials) — both sides already
    cell-granular, so the shuffle moves O(touched cells) rows; the
    MERGE rewrites only those same buckets."""
    spark: SparkSession = increment.sparkSession
    cols = [ROLLUP_KEY, "window_start", *by, "n", "sum_m", "min_m",
            "max_m"]
    inc = increment.select(*cols)
    stored = table.read_for_keys(
        spark, inc.select(ROLLUP_KEY), ROLLUP_KEY
    )
    if stored is not None:
        # only touched cells need re-combining; the untouched rows in
        # the pruned buckets ride along through merge_upsert unchanged
        touched = stored.join(
            inc.select(ROLLUP_KEY).distinct(), ROLLUP_KEY, "left_semi"
        ).select(*cols)
        inc = (
            touched.unionByName(inc)
            .groupBy(ROLLUP_KEY, "window_start", *by)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_m").alias("sum_m"),
                F.min("min_m").alias("min_m"),
                F.max("max_m").alias("max_m"),
            )
        ).select(*cols)
    return table.merge_upsert(inc, ROLLUP_KEY)
