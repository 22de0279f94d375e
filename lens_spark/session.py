"""SparkSession builder with the engine's scale-tuned defaults.

Local sandbox runs use local[N]; on a real cluster the same conf applies —
only master/executor sizing changes (spark-submit --py-files lens_spark.zip).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lens-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(32, 2 * cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        # AQE: runtime partition coalescing + skew-join splitting. The
        # explicit salt in operators/explode.py handles UDF-stage skew that
        # AQE cannot see (skew inside mapInPandas, not a join).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere — pandas UDFs are the only Python in hot paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8192-row batches: fewer JVM↔Python crossings (extract A/B r06:
        # 4.19 s → 3.76 s at sf1.0, −8 user-cpu-s). Safe for fat payload
        # rows because Spark 4's arrow.maxBytesPerBatch (default 64 MiB)
        # bounds the batch by BYTES regardless of the record cap, and
        # the extract UDF re-batches by cfg.max_batch_bytes besides.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # 128 MiB input splits: good parquet scan granularity at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("LENS_DRIVER_MEM", "8g"))
        # Throughput GC: G1's concurrent marking burns ~6-10% extra
        # user-cpu at 32 threads on this workload (measured A/B, 4
        # alternating pairs: wall 16.0 vs 17.9 s calm / 21.4 vs 31.5 s
        # stormy, user 359 vs 358-402 cpu-s; neutral at 8 cores). A
        # batch pipeline has no pause-time SLO, so the stop-the-world
        # parallel collector is strictly better here; on a real cluster
        # apply to executors too.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # pre-fork heavy imports into every python worker (COW) — at high
        # core counts per-worker import cost dominates UDF-stage spin-up
        .config("spark.python.daemon.module", "lens_spark.worker_daemon")
    )
    # ad-hoc overrides without code edits (perf A/B, cluster tuning):
    # LENS_EXTRA_CONF="spark.shuffle.compress=false;spark.foo=bar"
    extra = os.environ.get("LENS_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
