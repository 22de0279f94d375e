"""spark-submit entrypoint for the continuous-aggregate tier
(operators/rollup.py): maintain a stored time-bucket rollup from event
increments — batch folds or a Structured Streaming feed.

    spark-submit --py-files lens_spark.zip jobs/rollup_job.py \
        <events_parquet_or_dir> <rollup_table_dir> \
        [--every 3600] [--by user_id[,dim2...]] [--measure value] \
        [--ts-col ts] [--cents] [--stream]

- batch mode (default): the input is ONE ingest increment; the job
  folds its partials into the table (bucket-pruned read_for_keys +
  MERGE — O(increment + touched cells)) and prints the fold report.
  Run it per increment; deliver each increment exactly once (the
  rollup contract).
- ``--stream``: the input is a parquet DIRECTORY watched by
  Structured Streaming; every micro-batch folds through the same
  path with the batch-id high-water-mark replay guard
  (streaming/stream.py stream_rollup). availableNow semantics: the
  job drains what exists and exits — cron it, or drop the trigger
  for a resident 5 s loop (edit: trigger_once=False).
- ``--cents``: quantize a float measure to integer cents
  (floor(m*100+0.5)) before folding — partial sums must be exact
  types (module contract; float sums drift by combine order).

Prints one line:
``ROLLUP_OK mode=M cells=C total_n=N snapshot=S``
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(
    spark,
    src: str,
    out: str,
    every: int = 3600,
    by: list[str] | None = None,
    measure: str = "value",
    ts_col: str = "ts",
    cents: bool = False,
    stream: bool = False,
) -> dict:
    from lens_spark.operators.rollup import (
        rollup_increment, rollup_maintain,
    )
    from lens_spark.sources.tables import LensTable

    by = by or ["user_id"]
    table = LensTable(os.path.join(out, "rollup"))

    def prep(df):
        if cents:
            df = df.withColumn(
                measure,
                F.floor(F.col(measure) * 100 + F.lit(0.5)).cast(
                    "long"
                ),
            )
        return df

    if stream:
        from lens_spark.streaming.stream import stream_rollup

        schema = spark.read.parquet(src).schema
        if cents:
            # quantize at the source: stage a cents view the stream
            # reads (stream_rollup folds the measure column as-is)
            staged = os.path.join(out, "_staged_src")
            prep(spark.read.parquet(src)).write.mode(
                "overwrite"
            ).parquet(staged)
            src = staged
            schema = spark.read.parquet(src).schema
        q = stream_rollup(
            spark, src, table,
            os.path.join(out, "checkpoint"), schema,
            ts_col=ts_col, every_seconds=every, by=by,
            measure=measure,
        )
        q.awaitTermination()
        mode = "stream"
    else:
        inc = prep(spark.read.parquet(src))
        rollup_maintain(
            table,
            rollup_increment(inc, ts_col, every, by, measure),
            by,
        )
        mode = "batch"

    stored = table.read(spark)
    agg = stored.agg(
        F.count("*").alias("cells"), F.sum("n").alias("total_n")
    ).collect()[0]
    return {
        "mode": mode,
        "cells": int(agg["cells"]),
        "total_n": int(agg["total_n"]),
        "snapshot": table.current_snapshot(),
    }


def main() -> None:
    argv = sys.argv[1:]

    def opt(name, default=None):
        if name in argv:
            return argv[argv.index(name) + 1]
        return default

    flags = {a for a in argv if a.startswith("--")}
    vals = {opt("--every", "3600"), opt("--by"), opt("--measure"),
            opt("--ts-col")} - {None}
    pos = [a for a in argv if not a.startswith("--") and a not in vals]
    src, out = pos[0], pos[1]
    spark = SparkSession.builder.appName("lens-rollup").getOrCreate()
    r = run(
        spark, src, out,
        every=int(opt("--every", "3600")),
        by=(opt("--by") or "user_id").split(","),
        measure=opt("--measure", "value"),
        ts_col=opt("--ts-col", "ts"),
        cents="--cents" in flags,
        stream="--stream" in flags,
    )
    print(
        "ROLLUP_OK mode={mode} cells={cells} total_n={total_n} "
        "snapshot={snapshot}".format(**r)
    )
    spark.stop()


if __name__ == "__main__":
    main()
