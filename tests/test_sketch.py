"""Engine-portable HyperLogLog + Count-Min (operators/sketch.py)."""
from __future__ import annotations

import hashlib
from collections import Counter

from lens_spark.operators.sketch import (
    CMS_DEPTH,
    M,
    RHO_CAP,
    cms_lookup,
    cms_merge,
    cms_registers,
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


# --------------------------------------------------------- Count-Min ----

def cms_ref(keys, depth=CMS_DEPTH):
    """Single-threaded reference: dict of (d, bucket) -> count."""
    cells = Counter()
    for k in keys:
        for d in range(depth):
            h = hashlib.md5(f"{d}:{k}".encode()).hexdigest()
            cells[(d, int(h[:3], 16))] += 1
    return dict(cells)


def test_cms_registers_match_python_reference(spark):
    keys = [f"g{i % 137}" for i in range(4000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r.d, r.bucket): r.cnt
           for r in cms_registers(df, "key").collect()}
    assert got == cms_ref(keys)


def test_cms_lookup_never_underestimates(spark):
    keys = [f"w{i % 211}" for i in range(5000)]
    exact = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    regs = cms_registers(df, "key")
    qdf = spark.createDataFrame(
        [(k,) for k in sorted(exact)], "key string")
    est = {r.key: r.est for r in cms_lookup(regs, qdf, "key").collect()}
    assert set(est) == set(exact)
    n = len(keys)
    for k, true in exact.items():
        assert est[k] >= true  # CMS one-sided guarantee
        # ε = e/4096 per row; min over 4 rows — generous determinism-
        # friendly slack on a 5000-insert sketch
        assert est[k] <= true + (3 * n) // 4096 + 1


def test_cms_merge_is_exact_linearity(spark):
    a = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(700)], "key string")
    b = spark.createDataFrame(
        [(f"k{i % 80}",) for i in range(500)], "key string")
    merged = {(r.d, r.bucket): r.cnt for r in cms_merge(
        cms_registers(a, "key"), cms_registers(b, "key")).collect()}
    direct = {(r.d, r.bucket): r.cnt
              for r in cms_registers(a.unionByName(b), "key").collect()}
    assert merged == direct


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("x", 3), ("x", 4), ("y", 5)], "key string, w int")
    regs = cms_registers(df, "key", weight_col="w")
    qdf = spark.createDataFrame([("x",), ("y",), ("z",)], "key string")
    est = {r.key: r.est for r in cms_lookup(regs, qdf, "key").collect()}
    assert est["x"] >= 7 and est["y"] >= 5
    # unseen key: 0 unless all 4 of its cells collide with real keys
    assert est["z"] <= 12


def test_cms_plans(spark):
    df = spark.createDataFrame([("k",)], "key string")
    plan = cms_registers(
        df, "key")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan  # map-side combine before the shuffle
    regs = cms_registers(df, "key")
    lp = cms_lookup(regs, df, "key")
    lp.collect()  # AQE finalizes the join strategy at execution
    final = lp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
