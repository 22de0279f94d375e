"""Connected components (operators/cluster.py) — ground-truth graphs.

The chain graph is the adversarial case for star algorithms (it needs
multiple alternating rounds, where a clique converges in one); the
random-graph case cross-checks against an in-process union-find, the
same independent-implementation discipline as the DuckDB oracles.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.cluster import connected_components, dedup_keep


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final minima
    return {x: find(x) for x in parent}


def test_chain_collapses_to_single_min(spark):
    # 0-1-2-...-19: worst case for propagation; must all label to 0
    edges = [(i, i + 1) for i in range(19)]
    labels = _labels(spark, edges)
    assert labels == {i: 0 for i in range(20)}


def test_disjoint_cliques(spark):
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12)]
    labels = _labels(spark, tri1 + tri2)
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_duplicate_and_reversed_edges(spark):
    labels = _labels(spark, [(5, 4), (4, 5), (5, 4), (4, 3)])
    assert labels == {3: 3, 4: 3, 5: 3}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _labels(spark, edges) == _union_find(edges)


def test_dedup_keep_covers_isolated_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, body string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_keep(docs, pairs, "doc_id").collect()
    }
    assert rows == {
        0: (0, 1), 3: (0, 0), 5: (0, 0),   # one transitive cluster
        1: (1, 1), 2: (2, 1), 4: (4, 1),   # singletons keep themselves
    }


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
