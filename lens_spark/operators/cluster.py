"""Connected components over near-duplicate pair graphs.

Pair emission (minhash / simhash / jaccard / embedding near-dup) is only
half of deduplication: a real pipeline must close the pairs transitively
(a~b, b~c => {a, b, c} is ONE duplicate cluster) and keep a single
representative per cluster. At 100 TB the pair graph itself is
distributed, so this is the alternating Large-Star / Small-Star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): O(log^2 n) rounds, each round two groupBy shuffles of
pure DataFrame algebra — no driver-side graph state, no O(diameter)
propagation (a chain a-b-c-...-z collapses in logarithmic, not linear,
rounds). GraphX/GraphFrames implement the same idea behind a Pregel API;
carrying that dependency for one algorithm is worse than ~40 lines of
DataFrame code the optimizer can see through.

The reference engine has no clustering (it stops at per-document
indexing); this is target-side training-data capability, same tier as
the pair operators in operators/dedup.py.

Fault tolerance: each round materializes via eager ``localCheckpoint``
to truncate the otherwise-exponential iterative lineage. Executor-local
checkpoint blocks are NOT recoverable after executor loss — at warehouse
scale prefer ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``
(reliable storage) by passing ``reliable=True``, the same documented
trade as ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set canonicalized to (u > v), self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u}).

    Emits (v, m) for v ∈ N(u), v > u — strictly-larger nodes re-point at
    the locally smallest node. groupBy + collect_set keeps the reduce
    associative (map-side partial aggregation applies); the explode is
    bounded by the true degree, never materializing pairs."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    g = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    return (
        g.select(
            "u",
            F.least(F.col("u"), F.array_min("nbrs")).alias("m"),
            F.explode("nbrs").alias("v"),
        )
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor (and u itself) to the
    minimum of the down-neighborhood."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    g = directed.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    return (
        g.select(
            "u",
            F.array_min("nbrs").alias("m"),  # nbrs all ≤ u, so min ≤ u
            F.explode(
                F.array_union("nbrs", F.array(F.col("u")))
            ).alias("v"),
        )
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Pair rows → (node, cluster_id) labels, cluster_id = component min.

    Deterministic regardless of round count or partitioning (the label is
    a graph property, not an execution artifact), so results are
    oracle-comparable. Convergence is detected by an order-independent
    edge-set signature (count + sum of xxhash64) — one tiny action per
    round on an already-checkpointed frame. ``max_iter`` is a backstop
    ~2x the theoretical O(log^2 n) bound for any realistic corpus; hitting
    it warns rather than looping forever.

    Returns distinct (node, cluster_id); isolated documents never seen in
    ``pairs`` are absent — union them back as singleton clusters at the
    call site if the downstream wants total coverage (``dedup_keep``)."""
    edges = _canon(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    )
    spark = pairs.sparkSession

    def _pin(df: DataFrame) -> DataFrame:
        # lazy local checkpoint: the round's single signature action
        # below materializes the truncated-lineage RDD, so each round is
        # ONE job, not a checkpoint job plus an agg job. Reliable mode
        # stays eager (Spark's reliable checkpoint() always is).
        return df.checkpoint() if reliable else df.localCheckpoint(
            eager=False
        )

    def _sig(df: DataFrame) -> tuple:
        # order-independent signature; xor-fold (not sum) because ANSI
        # mode makes a 64-bit sum of hashes an arithmetic-overflow error
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    # pin the input edge set BEFORE iterating: large-star's symmetric
    # union would otherwise evaluate the (potentially expensive)
    # upstream pair plan once per union side — Spark 4.1 never reuses
    # exchanges across DeduplicateRelations'd self-union branches
    edges = _pin(edges)
    prev_sig = _sig(edges)
    for _ in range(max_iter):
        edges = _pin(_canon(_small_star(_large_star(edges))))
        sig = _sig(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        warnings.warn(
            f"connected_components: no fixpoint in {max_iter} rounds "
            "(pathological graph?) — labels may be non-minimal",
            stacklevel=2,
        )
    # At the two-star fixpoint the graph is a union of stars rooted at
    # component minima: every edge is (member, root).
    members = edges.select(
        F.col("u").alias("node"), F.col("v").alias("cluster_id")
    )
    roots = edges.select(
        F.col("v").alias("node"), F.col("v").alias("cluster_id")
    )
    _ = spark  # session kept for symmetry with reliable-checkpoint setup
    return members.unionByName(roots).distinct()


def dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Docs + duplicate pairs → docs annotated (cluster_id, keep).

    The label side is orders of magnitude smaller than the corpus (only
    documents that appeared in a pair), so the join back is labels-sized
    — broadcastable in the common case, and AQE picks that up from the
    runtime size without a hint being forced here. ``keep`` selects the
    cluster-minimum representative; singletons keep themselves."""
    labels = connected_components(pairs, a_col, b_col)
    out = docs.join(
        labels.withColumnRenamed("node", id_col), on=id_col, how="left"
    )
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return out.withColumn("cluster_id", cluster).withColumn(
        "keep", (F.col(id_col) == F.col("cluster_id")).cast("int")
    )
