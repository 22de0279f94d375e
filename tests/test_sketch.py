"""Engine-portable HyperLogLog (operators/sketch.py)."""
from __future__ import annotations

import hashlib

from lens_spark.operators.sketch import (
    M,
    RHO_CAP,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def ref_registers(keys):
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:3], 16)
        w = int(h[3:16], 16)
        if w == 0:
            rho = RHO_CAP
        else:
            rho = ((w & -w).bit_length() - 1) + 1  # trailing zeros + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_python_reference(spark):
    keys = [f"k{i}" for i in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r.bucket: r.rho
           for r in hll_registers(df, "key").collect()}
    assert got == ref_registers(keys)


def test_estimate_accuracy(spark):
    n = 20_000
    df = spark.createDataFrame(
        [(f"id-{i}",) for i in range(n)], "key string")
    est = hll_estimate(hll_registers(df, "key"))
    # p=12 -> relative error ~1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - n) / n < 0.065


def test_small_range_linear_counting(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(50)],
                               "key string")
    est = hll_estimate(hll_registers(df, "key"))
    assert abs(est - 50) / 50 < 0.2


def test_duplicates_do_not_move_the_sketch(spark):
    a = spark.createDataFrame([(f"k{i % 100}",) for i in range(5000)],
                              "key string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(100)],
                              "key string")
    ra = {r.bucket: r.rho for r in hll_registers(a, "key").collect()}
    rb = {r.bucket: r.rho for r in hll_registers(b, "key").collect()}
    assert ra == rb


def test_merge_equals_union_sketch(spark):
    x = spark.createDataFrame([(f"a{i}",) for i in range(500)],
                              "key string")
    y = spark.createDataFrame([(f"b{i}",) for i in range(500)],
                              "key string")
    both = x.unionByName(y)
    merged = {r.bucket: r.rho for r in hll_merge(
        hll_registers(x, "key"), hll_registers(y, "key")).collect()}
    direct = {r.bucket: r.rho
              for r in hll_registers(both, "key").collect()}
    assert merged == direct
    assert len(direct) <= M


def test_plan_is_one_partial_agg_shuffle(spark):
    df = spark.createDataFrame([("k",)], "key string")
    plan = hll_registers(
        df, "key")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan  # map-side combine before the shuffle
