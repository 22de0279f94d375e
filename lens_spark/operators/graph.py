"""Link-graph corpus signals: integer-exact PageRank + degree stats.

Web-scale corpora rank pages by link structure before (or alongside)
content quality — CommonCrawl publishes per-host rank tables computed
from its own crawl graph, and crawl-frontier/quality pipelines consume
them as a per-document signal.  This module computes that signal from
an edge table (e.g. hrefs pulled out of extracted HTML) with Spark
DataFrame power iteration.

**Engine-reproducible arithmetic** (the embedding_kmeans convention,
operators/semdedup.py): ranks live on an INTEGER mass grid — total
mass ``S`` (default 10^9) split as ``floor(S/N)`` per node, each
round's contribution floored per edge — so the driver's DuckDB oracle
UNROLLS the same rounds and matches hash-exactly; no float summation
order can flip a bit.

Per round (classic PageRank, damping ``d`` as the rational ``dn/dd``):

    contrib(u→v) = floor(rank(u) / outdeg(u))
    dangling     = sum of rank(u) over nodes with outdeg 0
    teleport     = floor((dd-dn)·S / N)        (scalar, once)
    share        = floor(dangling / N)         (scalar, per round)
    rank'(v)     = floor((teleport + dn·(Σ contrib + share)) / dd)

100 TB shape: each round is ONE equi-join of the rank table with the
edge table on src (sort-merge/AQE; edges dominate and stay partitioned
by src across rounds via the initial repartition) + one map-side-
combined groupBy on dst + a two-row driver reduce for the dangling
mass; rounds are a fixed small count (the published signal uses a
handful of iterations), so total cost is O(iters · edges) with 2
shuffles per round — the standard Pregel-free DataFrame formulation.

The reference has no link tier (documents arrive as content-addressed
blobs, v2.go) — training-data layer; PageRank per Page et al. 1999
(public).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "degree_stats"]

MASS = 1_000_000_000


def degree_stats(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-node (out_degree, in_degree) — one groupBy per side + one
    outer join, all map-side-combinable."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    mass: int = MASS,
) -> DataFrame:
    """Integer-exact PageRank over ``edges``; returns ``(node, rank)``
    with ``rank`` on the ``mass`` grid (Σ rank ≈ mass up to floor
    dust).  Nodes = every id appearing as src or dst; duplicate edges
    count once (the link exists) — dedup'd up front, mirroring the
    oracle.  See module docstring for the exact per-round rule."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # partition edges by src once; every round's join reuses the layout
    e = e.repartition("src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("deg", F.lit(0)).alias("deg"))
    base = base.localCheckpoint(eager=False)

    init = mass // n_nodes
    ranks = base.select("node", F.lit(init).cast("long").alias("rank"))
    teleport = (damping_den - damping_num) * mass // n_nodes

    for _ in range(iters):
        state = base.join(ranks, "node")
        dangling = (
            state.filter(F.col("deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        contrib = (
            e.join(
                state.filter(F.col("deg") > 0)
                .withColumnRenamed("node", "src"),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        share = int(dangling) // n_nodes
        ranks = (
            base.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                F.floor(
                    (
                        F.lit(teleport)
                        + F.lit(damping_num)
                        * (F.coalesce("in_mass", F.lit(0))
                           + F.lit(share))
                    )
                    / F.lit(damping_den)
                ).cast("long").alias("rank"),
            )
        )
        # pin each round: the lineage would otherwise grow a join tree
        # per iteration and re-execute all prior rounds on every action
        # (the cluster.py alternating-star precedent)
        ranks = ranks.localCheckpoint(eager=False)
    return ranks