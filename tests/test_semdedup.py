"""Pin lens_spark.operators.semdedup against pure-Python references:
the integer-grid Lloyd's iteration, the triangular SemDeDup rule, the
max_cluster cap (complete output + metered drops), and null handling."""

import hashlib
import math

import pytest
from pyspark.sql import Observation

from lens_spark.operators.semdedup import (
    embedding_kmeans,
    embedding_kmeans_model,
    semdedup,
)


def _quant(vec, scale=1_000_000):
    return [math.floor(x * scale + 0.5) for x in vec]


def _py_kmeans(rows, k, iters):
    """Reference Lloyd's on the integer grid: md5 hash-order seeds,
    exact integer distances (ties -> lowest index), round-half-up
    integer centroid update, empty clusters keep their centroid."""
    pts = {i: _quant(v) for i, v in rows}
    seeds = sorted(pts, key=lambda i: (hashlib.md5(
        str(i).encode()).hexdigest(), i))[:k]
    cents = [list(pts[i]) for i in seeds]

    def assign():
        out = {}
        for i, q in pts.items():
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(q, c)), ci)
                for ci, c in enumerate(cents)
            ]
            out[i] = min(dists)[1]
        return out

    for _ in range(iters):
        asg = assign()
        for ci in range(len(cents)):
            members = [pts[i] for i, c in asg.items() if c == ci]
            if not members:
                continue
            n = len(members)
            cents[ci] = [
                (2 * sum(m[d] for m in members) + n) // (2 * n)
                for d in range(len(cents[ci]))
            ]
    return assign()


def _mkvecs(n, dim=8):
    rows = []
    for i in range(n):
        h = hashlib.md5(f"v:{i}".encode()).digest()
        rows.append((i, [((h[d % 16] + 7 * i * d) % 200 - 100) / 250.0
                         for d in range(dim)]))
    return rows


def test_kmeans_matches_python_reference(spark):
    rows = _mkvecs(60)
    df = spark.createDataFrame(
        rows, "id long, vec array<double>")
    for k, iters in ((3, 0), (4, 2), (5, 3)):
        got = {
            r["id"]: r["cluster"]
            for r in embedding_kmeans(
                df, "id", "vec", k=k, iters=iters).collect()
        }
        assert got == _py_kmeans(rows, k, iters), (k, iters)


def test_kmeans_null_vectors_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None), (3, [0.3, -0.1])],
        "id long, vec array<double>",
    )
    got = {r["id"] for r in embedding_kmeans(
        df, "id", "vec", k=2, iters=1).collect()}
    assert got == {1, 3}
    with pytest.raises(ValueError):
        embedding_kmeans(df, "id", "vec", k=0)


def _py_semdedup(rows, asg, tau):
    """Triangular rule on exact rationals: drop i if a smaller same-
    cluster id j has cos(q_i, q_j) >= tau."""
    pts = {i: _quant(v) for i, v in rows}
    tau_q = round(tau * 10_000)
    kept = {}
    for i in sorted(pts):
        dropped = False
        for j in sorted(pts):
            if j >= i or asg[j] != asg[i]:
                continue
            a, b = pts[i], pts[j]
            dot = sum(x * y for x, y in zip(a, b))
            qa = sum(x * x for x in a)
            qb = sum(x * x for x in b)
            if dot > 0 and tau_q * tau_q * qa * qb <= 10**8 * dot * dot:
                dropped = True
                break
        kept[i] = 0 if dropped else 1
    return kept


def test_semdedup_matches_python_reference(spark):
    rows = _mkvecs(40)
    # inject near-dups: copies with one perturbed coordinate
    for base in (3, 17):
        v = list(rows[base][1])
        v[0] += 0.001
        rows.append((100 + base, v))
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    asg = _py_kmeans(rows, 3, 1)
    got = {
        r["id"]: r["kept"]
        for r in semdedup(df, "id", "vec", k=3, iters=1,
                          tau=0.95).collect()
    }
    want = _py_semdedup(rows, asg, 0.95)
    assert got == want
    assert 0 in got.values()  # the injected dups actually dropped


def test_semdedup_cap_autokeeps_and_meters(spark):
    # one tight bundle of 6 near-identical vectors -> same cluster;
    # max_cluster=3 caps the triangular test to the 3 lowest ids
    rows = [(i, [1.0, 0.0, 0.0001 * i]) for i in range(6)]
    rows += [(10 + i, [-1.0, 0.5 * i, 0.3]) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    obs = Observation("cap")
    out = semdedup(df, "id", "vec", k=2, iters=1, tau=0.99,
                   max_cluster=3, observation=obs)
    got = {r["id"]: r["kept"] for r in out.collect()}
    # every input id present exactly once
    assert set(got) == {0, 1, 2, 3, 4, 5, 10, 11, 12}
    # inside the cap: 0 kept, 1 and 2 dropped (cos ~ 1.0)
    assert got[0] == 1 and got[1] == 0 and got[2] == 0
    # beyond the cap: auto-kept even though they are dups
    assert got[3] == 1 and got[4] == 1 and got[5] == 1
    from lens_spark.operators.dedup import cap_metrics

    m = cap_metrics(obs)
    assert m is not None and m["semdedup_rows_in_overcap_groups"] >= 1
    assert m["semdedup_max_group_size"] == 6


def test_kmeans_model_returns_grid_centroids(spark):
    rows = _mkvecs(20, dim=4)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    _, cents = embedding_kmeans_model(df, "id", "vec", k=2, iters=2)
    assert len(cents) == 2 and all(len(c) == 4 for c in cents)
    assert all(isinstance(v, int) for c in cents for v in c)


def test_empty_input_graceful(spark):
    # zero non-null vectors (e.g. an empty survivor set in curate())
    # -> schema-stable empty results, never an error
    df = spark.createDataFrame(
        [(1, None)], "id long, vec array<double>")
    km = embedding_kmeans(df, "id", "vec", k=4, iters=2)
    assert km.columns == ["id", "cluster"] and km.count() == 0
    sd = semdedup(df, "id", "vec", k=4, iters=2)
    assert sd.columns == ["id", "cluster", "kept"] and sd.count() == 0
