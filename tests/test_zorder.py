"""Z-order clustering (operators/zorder.py): Morton key vs a Python
reference, and the layout actually tightens min-max spans on EVERY
dimension at once."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.zorder import zorder_by, zorder_key


def ref_morton(vals, bits):
    out = 0
    n = len(vals)
    for i in range(bits):
        for d, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + d)
    return out


def test_key_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(256), rng.randrange(256),
             rng.randrange(256)) for i in range(500)]
    df = spark.createDataFrame(rows, "i long, a long, b long, c long")
    got = {
        r.i: r.z
        for r in df.select(
            "i", zorder_key(["a", "b", "c"], bits=8).alias("z")
        ).collect()
    }
    for i, a, b, c in rows:
        assert got[i] == ref_morton([a, b, c], 8)


def test_key_rejects_overflow(spark):
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_zorder_by_tightens_both_dims(spark):
    """Range-partitioning on the Morton key keeps per-partition
    min-max spans small on BOTH dims — a single-column sort would
    leave the other dim at full span in every partition."""
    rng = random.Random(9)
    rows = [(rng.randrange(10_000), rng.randrange(10_000))
            for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    laid = zorder_by(df, ["x", "y"], bits=6, n_files=16)
    assert "zkey" in laid.columns
    spans = (
        laid.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    # weight by rows; empty/near-empty partitions are noise
    tot = sum(r.n for r in spans)
    avg_sx = sum(r.sx * r.n for r in spans) / tot
    avg_sy = sum(r.sy * r.n for r in spans) / tot
    assert avg_sx < 5_000 and avg_sy < 5_000  # both < half full span
    # sanity: the data itself spans ~the full range
    assert max(r.sx for r in spans) <= 10_000


def test_zorder_by_key_is_morton_of_ranks(spark):
    """zkey values stay within the bits*dims budget and the layout is
    deterministic across two runs."""
    rows = [(i % 97, (i * 7) % 89) for i in range(2000)]
    df = spark.createDataFrame(rows, "x long, y long")
    a = sorted(r.zkey for r in zorder_by(df, ["x", "y"],
                                         bits=6, n_files=4).collect())
    b = sorted(r.zkey for r in zorder_by(df, ["x", "y"],
                                         bits=6, n_files=4).collect())
    assert a == b
    assert 0 <= a[0] and a[-1] < (1 << 12)
