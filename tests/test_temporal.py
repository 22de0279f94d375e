"""asof_join (operators/temporal.py): semantics vs pandas.merge_asof,
tie/tolerance/forward behavior, and the one-shuffle no-join plan."""
from __future__ import annotations

import pandas as pd
import pytest

from lens_spark.operators.temporal import asof_join


def test_backward_inclusive_basic(spark):
    left = spark.createDataFrame(
        [("u", 10, "e1"), ("u", 20, "e2"), ("u", 5, "e0"),
         ("v", 10, "e3")],
        "k string, ts long, ev string")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 15, 2.0), ("v", 99, 9.0)],
        "k string, ts long, val double")
    got = {r.ev: r for r in asof_join(
        left, right, on="ts", by=["k"]).collect()}
    assert got["e0"].val_r is None and got["e0"].ts_r is None
    assert got["e1"].val_r == 1.0 and got["e1"].ts_r == 10  # inclusive
    assert got["e2"].val_r == 2.0 and got["e2"].ts_r == 15
    assert got["e3"].val_r is None  # v's only snapshot is later


def test_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u", 10, "e1"), ("u", 30, "e2")], "k string, ts long, ev string")
    right = spark.createDataFrame(
        [("u", 12, 1.0), ("u", 100, 2.0)], "k string, ts long, val double")
    fwd = {r.ev: r for r in asof_join(
        left, right, on="ts", by=["k"], direction="forward").collect()}
    assert fwd["e1"].val_r == 1.0 and fwd["e1"].ts_r == 12
    assert fwd["e2"].val_r == 2.0
    tol = {r.ev: r for r in asof_join(
        left, right, on="ts", by=["k"], direction="forward",
        tolerance=5).collect()}
    assert tol["e1"].val_r == 1.0
    assert tol["e2"].val_r is None  # 100 - 30 > 5


def test_matches_pandas_merge_asof_fuzz(spark):
    import random

    rng = random.Random(7)
    lrows = [(f"k{rng.randrange(5)}", rng.randrange(1000), i)
             for i in range(400)]
    rrows = []
    seen = set()
    for j in range(200):
        k, t = f"k{rng.randrange(5)}", rng.randrange(1000)
        if (k, t) in seen:  # keep right side time-unique per key
            continue
        seen.add((k, t))
        rrows.append((k, t, float(j)))
    left = spark.createDataFrame(lrows, "k string, ts long, lid long")
    right = spark.createDataFrame(rrows, "k string, ts long, val double")
    got = (
        asof_join(left, right, on="ts", by=["k"])
        .orderBy("lid").toPandas()
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]) \
        .sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "val"]) \
        .sort_values("ts", kind="mergesort")
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward",
        suffixes=("", "_r"),
    ).sort_values("lid").reset_index(drop=True)
    assert list(got["lid"]) == list(want["lid"])
    for a, b in zip(got["val_r"], want["val"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_requires_by_keys(spark):
    df = spark.createDataFrame([("a", 1)], "k string, ts long")
    with pytest.raises(ValueError, match="by"):
        asof_join(df, df, on="ts", by=[])


def test_plan_is_one_shuffle_no_join(spark):
    left = spark.createDataFrame(
        [("u", 1, "e")], "k string, ts long, ev string")
    right = spark.createDataFrame(
        [("u", 1, 1.0)], "k string, ts long, val double")
    plan = asof_join(left, right, on="ts", by=["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no join node at all — union + window
    assert "Window" in plan


# ------------------------------------------------------------ range_join
def test_range_join_matches_brute_force(spark):
    import random

    from lens_spark.operators.temporal import range_join

    rng = random.Random(11)
    pts = [(f"k{rng.randrange(3)}", rng.randrange(1000), i)
           for i in range(300)]
    ivs = []
    for j in range(60):
        s = rng.randrange(1000)
        ivs.append((f"k{rng.randrange(3)}", s, s + rng.randrange(1, 120), j))
    p = spark.createDataFrame(pts, "k string, ts long, pid long")
    i = spark.createDataFrame(ivs, "k string, start long, end long, iid long")
    got = {(r.pid, r.iid_r) for r in range_join(
        p, i, on="ts", by=["k"], bucket=50).collect()}
    want = {(pid, iid)
            for (pk, ts, pid) in pts
            for (ik, s, e, iid) in ivs
            if pk == ik and s <= ts <= e}
    assert got == want
    assert want  # non-vacuous


def test_range_join_inclusive_ends_and_no_bnlj(spark):
    from lens_spark.operators.temporal import range_join

    p = spark.createDataFrame(
        [("k", 10, 0), ("k", 20, 1), ("k", 21, 2)],
        "k string, ts long, pid long")
    i = spark.createDataFrame(
        [("k", 10, 20, 7)], "k string, start long, end long, iid long")
    rj = range_join(p, i, on="ts", by=["k"], bucket=5)
    assert {(r.pid, r.iid_r) for r in rj.collect()} == {(0, 7), (1, 7)}
    plan = rj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)  # a real EQUI-join
