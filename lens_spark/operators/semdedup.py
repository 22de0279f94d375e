"""Semantic deduplication: k-means over embeddings + SemDeDup.

Implements the SemDeDup pipeline (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"):
cluster the embedding space with k-means, then inside each cluster drop
every document whose cosine similarity to an EARLIER document of the
same cluster exceeds a threshold (the paper's upper-triangular
pairwise-similarity rule — a doc is dropped when any lower-ranked doc
is ε-close, independent of whether that doc itself survived).

Engine-independence (the repo's oracle-parity discipline): all
similarity math runs on an exact integer grid —

- embeddings are quantized up front with ``floor(x·scale + 0.5)``
  (the IEEE-stable rounding used by quantize_int8, similarity.py),
- k-means distances are exact BIGINT sums of squared integer diffs,
- centroid updates round to the same grid (round-half-up of the exact
  rational mean: ``(2·S + N) // (2·N)`` in integers), so centroids stay
  engine-reproducible instead of drifting on float summation order,
- the SemDeDup threshold test ``cos(a,b) ≥ τ`` is evaluated as
  ``τq²·(a·a)·(b·b) ≤ 10^8·(a·b)²  AND  a·b > 0`` with τq =
  round(τ·10⁴), in DECIMAL(38,0) — no sqrt, no float, no ulp boundary.

Outputs carry only integers (ids, cluster indices, 0/1 flags), so the
driver's value-hash comparison is exact by construction.

Scale shape (100 TB):

- k-means is the classic Spark formulation: per iteration ONE scan of
  the quantized vectors (pinned with a lazy localCheckpoint so the
  parquet decode + quantize runs once, not once per iteration),
  assignment entirely in JVM expressions, and a map-side-combined
  groupBy(cluster, dim) whose result — k·dim rows — is collected to
  the driver (bounded by the model size, never the corpus; the same
  justified-collect class as IVF training, similarity.py).
- SemDeDup's within-cluster pass is the paper's own design point: k is
  chosen so clusters fit a worker (they use 50k clusters for 600M
  docs). Clusters are collected per-key (sort by id, cap at
  ``max_cluster``, drops metered via the no-silent-caps Observation
  convention) and the O(c²) triangular test runs as nested Catalyst
  lambdas — no self-join, no shuffle beyond the one cluster groupBy.
  Docs beyond the cap are auto-kept (recall trade, never a lost row:
  the final left join re-attaches every input doc).

The reference engine (RTradeLtd/Lens) has no embedding tier; this
module is part of the training-data extension the survey scopes in
(SURVEY.md §2, LLM-pipeline operators).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

from lens_spark.functions.hof import (
    aggregate_u,
    exists_u,
    transform_u,
    zip_with_u,
)
from lens_spark.operators.dedup import observe_cap_drops

GRID_SCALE = 1_000_000


def quantize_grid(vec: Column, scale: int = GRID_SCALE) -> Column:
    """float embedding → exact integer grid: ``floor(x·scale + 0.5)``
    per element, as BIGINT. floor(x+0.5) instead of round() for the
    same reason as quantize_int8: HALF_UP vs half-to-even would
    disagree between engines on exact .5 products."""
    return transform_u(
        vec,
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast(
            "long"
        ),
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Exact squared L2 between two integer-grid vectors (BIGINT).
    Bounded by dim·(2·scale·|x|max)² — ~1e15 for unit-ish embeddings
    at the default grid, far inside int64."""
    return aggregate_u(
        zip_with_u(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _dot_long(a: Column, b: Column) -> Column:
    return aggregate_u(
        zip_with_u(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(qcol: Column, centroids: list[list[int]]) -> Column:
    """Nearest-centroid index: exact integer distances, ties to the
    lowest index (array_min on struct(dist, idx) is lexicographic)."""
    alts = []
    for i, cent in enumerate(centroids):
        carr = F.array(*[F.lit(int(v)).cast("long") for v in cent])
        alts.append(
            F.struct(
                _sqdist(qcol, carr).alias("d"), F.lit(i).alias("i")
            )
        )
    return F.array_min(F.array(*alts))["i"]


def kmeans_seed_order(id_val: str) -> str:
    """Seed ranking key (plain Python twin of the plan expression):
    md5 of the id's decimal string — deterministic, engine-independent
    (the DuckDB oracle ranks by the same md5(id::varchar))."""
    return hashlib.md5(id_val.encode()).hexdigest()


def embedding_kmeans_model(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = GRID_SCALE,
    pin: bool = True,
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd's k-means on the integer grid; returns
    ``(quantized_base, final_centroids)`` where ``quantized_base`` is
    the pinned ``(id, q)`` frame (reusable by :func:`semdedup` — the
    expensive decode+quantize scan is shared, the jaccard/connected-
    components localCheckpoint pattern and its non-reliable-storage
    trade, dedup.py) and ``final_centroids`` is the k×dim int list
    after ``iters`` assign+update rounds.

    Init: the k rows ranked lowest by (md5(id), id) — a deterministic
    hash-order sample (the hash_sample convention) computable by any
    engine. Clusters that lose every member keep their previous
    centroid (documented Lloyd edge case, mirrored in the oracle).

    Each round costs one scan + one map-side-combined shuffle of
    k·dim partial sums; the driver collect is k·dim rows (model-sized,
    not corpus-sized)."""
    if k < 1 or iters < 0:
        raise ValueError("k must be >= 1 and iters >= 0")
    base = df.select(
        F.col(id_col).alias("id"),
        quantize_grid(F.col(vec_col), scale).alias("q"),
    ).filter(F.col("q").isNotNull())
    if pin:
        base = base.localCheckpoint(eager=False)

    seed_rows = (
        base.select(
            "id", F.md5(F.col("id").cast("string")).alias("__h"), "q"
        )
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    )
    # zero non-null vectors (e.g. an empty survivor set upstream in
    # curate()) is a graceful no-op, not an error: base is empty, the
    # callers produce empty/all-kept outputs from it
    centroids = [list(r["q"]) for r in seed_rows]
    if not centroids:
        return base, []

    for _ in range(iters):
        rows = (
            base.select(_assign(F.col("q"), centroids).alias("__c"), "q")
            .select("__c", F.posexplode("q").alias("pos", "val"))
            .groupBy("__c", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in centroids]
        for r in rows:
            s, n = int(r["s"]), int(r["n"])
            # round-half-up of the exact rational mean S/N, in pure
            # integer arithmetic (Python // floors for any sign)
            new_cents[r["__c"]][r["pos"]] = (2 * s + n) // (2 * n)
        centroids = new_cents
    return base, centroids


def embedding_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = GRID_SCALE,
    pin: bool = True,
) -> DataFrame:
    """Final k-means assignment: ``(id, cluster)`` for every row with a
    non-null vector, integers only (hash-parity safe by construction).
    See :func:`embedding_kmeans_model` for semantics and scale shape."""
    base, centroids = embedding_kmeans_model(
        df, id_col, vec_col, k, iters, scale, pin
    )
    if not centroids:  # empty input — schema-stable empty result
        return base.select(
            F.col("id").alias(id_col),
            F.lit(None).cast("int").alias("cluster"),
        )
    return base.select(
        F.col("id").alias(id_col),
        _assign(F.col("q"), centroids).cast("int").alias("cluster"),
    )


def _eps_close(qa: Column, qb: Column, tau_q: int,
               qq_a: Column | None = None,
               qq_b: Column | None = None) -> Column:
    """Exact ``cos(a,b) ≥ τq/10⁴``: τq²·(a·a)·(b·b) ≤ 10⁸·(a·b)² with
    a·b > 0, in DECIMAL(38,0) (dots ≤ ~2.5e12 → products ≤ ~6e32,
    inside both DECIMAL(38) and DuckDB HUGEINT). Zero vectors are never
    ε-close to anything (a·b = 0 fails the sign guard).

    ``qq_a`` / ``qq_b``: optionally pass the precomputed self-dots —
    they are per-ELEMENT invariants, and recomputing them per PAIR
    tripled the triangular stage's dot-product work (r06)."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dot = _dot_long(qa, qb)
    if qq_a is None:
        qq_a = _dot_long(qa, qa)
    if qq_b is None:
        qq_b = _dot_long(qb, qb)
    return (dot > 0) & (
        dec(F.lit(tau_q * tau_q)) * dec(qq_a) * dec(qq_b)
        <= dec(F.lit(10**8)) * dec(dot) * dec(dot)
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.96,
    scale: int = GRID_SCALE,
    max_cluster: int = 2000,
    observation=None,
) -> DataFrame:
    """SemDeDup flag table: ``(id, cluster, kept)`` for EVERY input row
    with a non-null vector. ``kept = 0`` iff some same-cluster doc with
    a smaller id is ε-close (cos ≥ ``tau``) — the paper's triangular
    rule with id order as the deterministic ranking.

    ``max_cluster`` caps how many (lowest-id) docs per cluster enter
    the O(c²) test; overflow docs are auto-kept and the dropped
    candidate volume is metered through ``observation``
    (observe_cap_drops, prefix ``semdedup``) — the no-silent-caps
    convention. Size k so clusters stay under the cap (the paper's own
    operating point; c² work per cluster is the design trade)."""
    tau_q = int(round(tau * 10_000))
    base, centroids = embedding_kmeans_model(
        df, id_col, vec_col, k, iters, scale, pin=True
    )
    if not centroids:  # empty input — schema-stable empty result
        return base.select(
            F.col("id").alias(id_col),
            F.lit(None).cast("int").alias("cluster"),
            F.lit(1).alias("kept"),
        )
    assigned = base.select(
        "id", "q", _assign(F.col("q"), centroids).cast("int").alias(
            "cluster"
        )
    )
    # self-dot computed ONCE per row here; the triangular test below
    # reads it per pair (struct field order keeps id leading, so the
    # array_sort order — and every output value — is unchanged)
    clusters = assigned.select(
        "id", "q", "cluster", _dot_long(F.col("q"), F.col("q")).alias("qq")
    ).groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("id"), F.col("q"), F.col("qq"))
            )
        ).alias("arr"),
        F.count(F.lit(1)).alias("csize"),
    )
    clusters = observe_cap_drops(
        clusters, "csize", max_cluster, observation, "semdedup"
    )
    # materialize the capped array as a COLUMN first (r06): the lambdas
    # below reference it per element and per pair, and a naked
    # slice-subtree there is re-evaluated (re-copying up to max_cluster
    # structs of k-dim vectors) on every reference — HOF lambdas get no
    # CSE, so the triangular test degraded to O(c³·dim) per cluster
    # (measured: the kmeans_semdedup row alone was 55 s of the sf0.1
    # sweep; ~2 s after). The inner exists walks indices j < i instead
    # of a sliced copy of the prefix for the same reason. Values are
    # bit-identical — evaluation strategy only.
    carr = F.col("carr")
    n = F.size(carr)
    flags = clusters.select(
        "cluster", F.slice(F.col("arr"), 1, max_cluster).alias("carr")
    ).select(
        "cluster",
        F.explode(
            transform_u(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.struct(
                    F.element_at(carr, i)["id"].alias("id"),
                    F.when(i == 1, F.lit(1))
                    .otherwise(
                        (
                            ~exists_u(
                                # i >= 2 here (the i==1 branch above),
                                # so sequence(1, i-1) ascends
                                F.sequence(F.lit(1), i - 1),
                                lambda j, i=i: _eps_close(
                                    F.element_at(carr, i)["q"],
                                    F.element_at(carr, j)["q"],
                                    tau_q,
                                    qq_a=F.element_at(carr, i)["qq"],
                                    qq_b=F.element_at(carr, j)["qq"],
                                ),
                            )
                        ).cast("int")
                    )
                    .alias("kept"),
                ),
            )
        ).alias("e"),
    ).select("cluster", F.col("e.id").alias("id"), F.col("e.kept"))
    # re-attach capped-away docs (auto-kept): every input id lands in
    # the output exactly once
    out = (
        assigned.select("id", "cluster")
        .join(flags.select("id", "kept"), on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(F.col("kept"), F.lit(1)).alias("kept"),
        )
    )
    return out
