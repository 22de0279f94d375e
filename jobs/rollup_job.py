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
        # --cents quantizes INSIDE each micro-batch (stream_rollup's
        # `prepare` hook). The old approach — re-staging a quantized
        # copy under out/_staged_src with mode=overwrite — minted fresh
        # part-file names on every invocation, so each cron rerun
        # re-read the ENTIRE history as new batches with new batch ids
        # (past the hwm guard) and double-counted it into the
        # non-idempotent fold (ADVICE r5, high).
        q = stream_rollup(
            spark, src, table,
            os.path.join(out, "checkpoint"), schema,
            ts_col=ts_col, every_seconds=every, by=by,
            measure=measure,
            prepare=prep if cents else None,
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

    # index-based parse (ADVICE r5, low): the old value-set exclusion
    # dropped any positional that happened to EQUAL a flag value (or
    # the literal '3600' even with --every absent)
    VALUE_FLAGS = ("--every", "--by", "--measure", "--ts-col")
    BOOL_FLAGS = ("--cents", "--stream")
    pos: list[str] = []
    opts: dict[str, str] = {}
    flags: set[str] = set()
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in VALUE_FLAGS:
            opts[a] = argv[i + 1]
            i += 2
        elif a in BOOL_FLAGS:
            flags.add(a)
            i += 1
        else:
            pos.append(a)
            i += 1

    def opt(name, default=None):
        return opts.get(name, default)

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
