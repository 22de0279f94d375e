"""Link-graph operators (operators/graph.py): integer-exact PageRank
vs a pure-Python reference, degree stats, edge cases."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.graph import MASS, degree_stats, pagerank


def ref_pagerank(edges, iters=3, dn=85, dd=100, mass=MASS):
    """Single-threaded reference with the exact integer rules the
    operator documents."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    deg = {x: 0 for x in nodes}
    for u, _ in e:
        deg[u] += 1
    r = {x: mass // n for x in nodes}
    tele = (dd - dn) * mass // n
    for _ in range(iters):
        dang = sum(r[x] for x in nodes if deg[x] == 0)
        share = dang // n
        inm = {x: 0 for x in nodes}
        for u, v in e:
            inm[v] += r[u] // deg[u]
        r = {x: (tele + dn * (inm[x] + share)) // dd for x in nodes}
    return r


@pytest.fixture()
def chain_edges():
    # a chain with a dangling sink, a hub, duplicate edges, a self-loop
    return [
        (1, 2), (2, 3), (3, 4),          # chain; 4 dangles
        (1, 3), (2, 1),
        (5, 3), (5, 3),                  # duplicate edge
        (6, 6),                          # self-loop
        (1, 6),
    ]


def test_matches_python_reference(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src long, dst long")
    got = {r.node: r.rank
           for r in pagerank(df, "src", "dst", iters=3).collect()}
    assert got == ref_pagerank(chain_edges, iters=3)


def test_zero_iters_is_uniform(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src long, dst long")
    got = {r.node: r.rank
           for r in pagerank(df, "src", "dst", iters=0).collect()}
    n = len({u for u, _ in chain_edges} | {v for _, v in chain_edges})
    assert set(got.values()) == {MASS // n}


def test_mass_is_conserved_up_to_floor_dust(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src long, dst long")
    total = (
        pagerank(df, "src", "dst", iters=4)
        .agg(F.sum("rank")).collect()[0][0]
    )
    n = len({u for u, _ in chain_edges} | {v for _, v in chain_edges})
    # every floor loses < 1 unit per node per round
    assert MASS - 5 * n * 4 <= total <= MASS


def test_sink_accumulates_more_than_source(spark):
    # star into a sink: the sink must outrank the leaves
    edges = [(i, 99) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank
           for r in pagerank(df, "src", "dst", iters=3).collect()}
    assert got[99] > got[1]
    assert got == ref_pagerank(edges, iters=3)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, "src", "dst").count() == 0


def test_degree_stats(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src long, dst long")
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_stats(df, "src", "dst").collect()}
    # multi-edges count in degree stats (5->3 twice)
    assert got[5] == (2, 0)
    assert got[3] == (1, 4)
    assert got[4] == (0, 1)
    assert got[6] == (1, 2)


def test_round_plan_shuffle_budget(spark, chain_edges):
    """One iteration adds a bounded number of exchanges (edge join +
    contrib groupBy + rank join-back) — no cartesian, no window."""
    df = spark.createDataFrame(chain_edges, "src long, dst long")
    plan = pagerank(
        df, "src", "dst", iters=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "Window" not in plan
