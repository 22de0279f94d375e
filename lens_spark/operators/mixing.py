"""Data-mixing operators for training-corpus assembly.

When a corpus is assembled from heterogeneous sources (Common-Crawl-like
web text, code, books, per-language slices), training pipelines do not
sample it uniformly: low-resource groups are upsampled and dominant
groups downsampled by **temperature scaling** — the exponential
smoothing rule published for multilingual pretraining (XLM-R /
mBERT-style: p_s ∝ n_s^alpha with alpha≈0.3-0.7) and used for source
mixing in LLM data recipes (GPT-3 / The Pile report per-source epoch
weights chosen the same way).

:func:`mixture_weights` computes those per-group sampling weights from
the corpus itself. :func:`bpe_pair_counts` is the other
corpus-assembly statistic: adjacent-token-pair frequencies — one merge
step of byte-pair-encoding tokenizer training (Sennrich et al. 2016),
and the standard smell test for corpus composition drift.

Scale shape (the 100 TB contract):

- ``mixture_weights``: one map-side-combinable groupBy over the corpus
  (partial aggregation pushes the sum to the scan side), then the
  power/normalize arithmetic runs on the **aggregated** table — one row
  per group (languages/sources: tens, not billions). The total is a
  single-partition window over that tiny table, never over the corpus.
- ``bpe_pair_counts``: tokenize + adjacent-pair explode is map-only;
  the count is one groupBy (map-side combine collapses repeated pairs
  inside each partition before the shuffle); top-k is
  TakeOrderedAndProject, no global sort.

Reference parity: the reference engine has no mixing tier (it indexes
each doc once, engine/engine.go:144-150); this module is part of the
training-data tier the repo adds beyond the reference (SURVEY §2 "LLM
pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from lens_spark.functions.text import ws_tokens


def mixture_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    size_col: Column | None = None,
) -> DataFrame:
    """Per-group temperature-scaled sampling weights.

    Returns one row per group: ``(group, n_docs, group_size, weight)``
    where ``weight = size^alpha / Σ_g size^alpha`` (quantized to 1e-6 by
    the repo's float-compare convention). ``alpha=1`` is proportional
    (natural) sampling, ``alpha=0`` uniform over groups; the published
    multilingual recipes sit in between.

    ``size_col`` is the per-document size expression to weight by
    (default: whitespace token count of ``text`` — the "tokens seen in
    one epoch" measure the recipes use).
    """
    if size_col is None:
        size_col = F.size(ws_tokens(F.col("text"))).cast("long")
    per_group = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("long").alias("group_size"),
    )
    # post-agg table is one row per group — the empty-frame window's
    # single-partition exchange moves that tiny relation, not the corpus
    total = F.sum(F.pow(F.col("group_size").cast("double"), alpha)).over(
        Window.partitionBy()
    )
    return per_group.select(
        group_col,
        "n_docs",
        "group_size",
        F.round(
            F.pow(F.col("group_size").cast("double"), alpha) / total, 6
        ).alias("weight"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    tokens: Column | None = None,
) -> DataFrame:
    """Most frequent adjacent token pairs — one BPE merge step.

    Returns the ``top_k`` rows ``(pair, pair_count)`` ordered by count
    desc then pair asc (deterministic tie-break). ``tokens`` overrides
    the tokenizer (default: whitespace tokens of ``text_col``).

    The pair stream is built JVM-side: ``transform(sequence(1, len-1),
    i -> tk[i] || ' ' || tk[i+1])`` then ``explode`` — no Python in the
    hot path, and the groupBy count gets map-side partial aggregation.
    """
    tk = tokens if tokens is not None else ws_tokens(F.col(text_col))
    from lens_spark.functions.hof import transform_u

    pairs = F.when(
        F.size(tk) >= 2,
        transform_u(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat(
                F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_k)
    )


def sample_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_tokens: int,
    alpha: float = 0.5,
    size_col: Column | None = None,
) -> DataFrame:
    """Materialize a temperature-scaled mixture: deterministically
    sample each group at the rate that yields ``weight_g ×
    target_tokens`` expected tokens from group g (capped at the whole
    group), with weights from :func:`mixture_weights`.

    Sampling is the reproducible hash-bucket rule (md5 of the stable id,
    never rand() — re-runs and engines agree row-for-row): keep a row
    iff ``md5_bucket(id) < floor(rate_g × 1e6)`` over a 1e6 bucket
    space. Returns the sampled rows with their group's ``rate_q``
    (= floor(rate×1e6), the integer actually compared) attached for
    audit.

    100 TB shape: one aggregation scan for the per-group table (tens of
    rows), then one map-only pass — the rate table is a GENUINE
    broadcast (one row per group), the keep test is a pushable filter,
    no shuffle of corpus rows at all.
    """
    w = mixture_weights(df, group_col, alpha=alpha, size_col=size_col)
    rate = F.least(
        F.lit(1.0),
        F.col("weight") * F.lit(float(target_tokens))
        / F.col("group_size").cast("double"),
    )
    rates = w.select(
        group_col,
        F.floor(rate * F.lit(1000000.0)).cast("long").alias("rate_q"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
            16, 10,
        ).cast("long")
        % 1000000
    )
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(bucket < F.col("rate_q"))
    )


def _md5_bucket(id_col: str, space: int = 1_000_000) -> Column:
    """Deterministic per-row bucket in [0, space): the sample_mixture
    hash rule (md5 of the stable id — never rand())."""
    return (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
            16, 10,
        ).cast("long")
        % space
    )


def upsample_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_tokens: int,
    alpha: float = 0.5,
    size_col: Column | None = None,
) -> DataFrame:
    """Mixture materialization WITH upsampling: where
    :func:`sample_mixture` caps every group at one epoch (rate ≤ 1),
    this emits ``rate > 1`` groups multiple times — the published
    recipes upsample low-resource groups by fractional epoch counts
    (The Pile's per-source epochs, XLM-R's temperature upsampling).

    Each row is emitted ``floor(rate)`` times unconditionally plus one
    more iff ``md5_bucket(id) < frac(rate)·1e6`` — expected copies =
    rate, deterministic row-for-row. Output adds ``epoch`` (0-based
    copy index, so downstream shuffles can keep copies apart) and the
    group's ``rate_q`` (floor(rate·1e6)) for audit.

    100 TB shape: identical to sample_mixture — one aggregation for the
    tiny per-group rate table (genuine broadcast), then a map-only
    sequence-explode; no corpus shuffle. Guard: sequence(0, n-1) is
    only built when n ≥ 1 (ANSI sequence descends on inverted bounds).
    """
    w = mixture_weights(df, group_col, alpha=alpha, size_col=size_col)
    rate = (
        F.col("weight") * F.lit(float(target_tokens))
        / F.col("group_size").cast("double")
    )
    rates = w.select(
        group_col,
        F.floor(rate * F.lit(1000000.0)).cast("long").alias("rate_q"),
    )
    n_copies = (F.col("rate_q") / 1000000).cast("long") + F.when(
        _md5_bucket(id_col) < F.col("rate_q") % 1000000, 1
    ).otherwise(0)
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0).cast("long"), n_copies - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.join(F.broadcast(rates), on=group_col)
        .withColumn("epoch", F.explode(copies))
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    oversample: int = 16,
) -> DataFrame:
    """EXACT-k deterministic sample per group: the k rows with the
    smallest (md5_bucket, id) key in each group — reproducible across
    runs, engines, and executor counts (no rand(), no partition-order
    dependence).

    100 TB shape — two-phase so the per-group window never sorts a
    whole group: (1) one tiny groupBy for group sizes; (2) a MAP-ONLY
    hash pre-filter keeping ≈ ``oversample × k`` expected rows per
    group (skipped where the group is already ≤ oversample·k); (3) the
    row_number window then runs over the pre-filtered sliver. The
    pre-filter is exact-preserving when the group's k-th smallest
    bucket clears the threshold — P[failure] ≤ exp(−(oversample−1)²k/
    (2·oversample)) ≈ 1e-8 at the default; raise ``oversample`` for
    stronger guarantees, or pass ``oversample=None``-like behavior by
    setting it ≥ 1e6/k (threshold saturates and the filter keeps all)."""
    from pyspark.sql import Window

    sizes = df.groupBy(group_col).agg(F.count("*").alias("__n_g"))
    thresh = F.least(
        F.lit(1_000_000).cast("long"),
        F.ceil(
            F.lit(float(oversample * k)) * F.lit(1000000.0)
            / F.col("__n_g").cast("double")
        ).cast("long"),
    )
    thr = sizes.select(group_col, thresh.alias("__thr_q"))
    bucket = _md5_bucket(id_col)
    win = Window.partitionBy(group_col).orderBy(
        bucket.asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(thr), on=group_col)
        .filter(bucket < F.col("__thr_q"))
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__thr_q", "__rn")
    )


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "0",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the last step before
    handing a corpus to a trainer. Every doc gets a (shard, pos)
    address from md5(seed ':' id): uniformly mixed (adjacent corpus
    rows land in unrelated shards), reproducible across runs, engines,
    and executor counts (no rand(), no partition-order dependence),
    and re-keyable per epoch by changing ``seed``.

    Scale shape: shard = top md5 bits mod n_shards — ONE hash shuffle;
    pos = row_number within shard ordered by (key, id) — the sort runs
    per shard (corpus/n_shards rows), never globally. A writer follows
    with repartition("shard") + sortWithinPartitions("pos"), so the
    physical plan is exactly one exchange + one in-partition sort at
    any corpus size. Salting is unnecessary: md5 output is uniform by
    construction, so shards balance to ±O(sqrt(n/n_shards)).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    win = Window.partitionBy("shard").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(win))
        .drop("__key")
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int,
    bucket_scale: int = 10_000,
) -> DataFrame:
    """Fill a token budget with the best-scoring documents: keep every
    doc whose running token total — in (``score_col`` desc, ``id_col``
    asc) order — is still below ``budget`` when the doc starts. This is
    the final "take the top N tokens" cut of quality-ranked data
    selection (the selection rule DSIR/ask-llm-style pipelines apply
    after scoring); the crossing doc is included, so output token mass
    is the smallest prefix ≥ budget (or the whole corpus if lighter).

    100 TB shape — the naive form is a GLOBAL sort + running sum
    (one total-order exchange over the corpus: a scale-killer). This
    runs in three bounded steps instead:

    1. quantize scores into ``floor(score·bucket_scale)`` buckets and
       aggregate per-bucket token mass — one map-side-combinable
       groupBy; the result is ≤ a few thousand rows for scores in
       [0, 1] (size ``bucket_scale`` to the score range, not the
       corpus);
    2. a running sum over that TINY bucket table (single-partition
       window — bounded by distinct buckets, never corpus rows) splits
       buckets into fully-kept (cum_before + mass < budget), dropped
       (cum_before ≥ budget), and THE one boundary bucket;
    3. only the boundary bucket's sliver gets a row-level window
       (exact score desc, id asc) to place the cut — the global sort
       never happens.

    Rows with a NULL score or NULL token count are dropped up front
    (they have no place in a total order; filter/flag upstream).
    Quantization is order-consistent (floor is monotone), so the
    result is exactly the naive global rule."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    src = df.filter(
        F.col(score_col).isNotNull() & F.col(tokens_col).isNotNull()
    )
    bucket = F.floor(F.col(score_col) * bucket_scale).cast("long")
    per = src.withColumn("__b", bucket)
    sizes = per.groupBy("__b").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__bt")
    )
    wb = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = sizes.withColumn(
        "__cum0", F.coalesce(F.sum("__bt").over(wb), F.lit(0).cast("long"))
    )
    joined = per.join(F.broadcast(cum), "__b")
    full = joined.filter(F.col("__cum0") + F.col("__bt") < budget)
    boundary = joined.filter(
        (F.col("__cum0") < budget)
        & (F.col("__cum0") + F.col("__bt") >= budget)
    )
    wr = Window.partitionBy("__b").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    cut = boundary.withColumn(
        "__cumr",
        F.col("__cum0")
        + F.coalesce(
            F.sum(F.col(tokens_col).cast("long")).over(wr),
            F.lit(0).cast("long"),
        ),
    ).filter(F.col("__cumr") < budget)
    keep_cols = src.columns
    return full.select(*keep_cols).unionByName(cut.select(*keep_cols))


def quantile_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
    bin_col: str = "qbin",
) -> DataFrame:
    """Exact equal-frequency (quantile) binning WITHOUT a global sort:
    the curriculum / CCNet-style head-middle-tail split generalized to
    n bins. Row's bin = ``floor(rank0 · n_bins / N)`` where ``rank0``
    is the number of rows with a strictly smaller score — so ties
    always share a bin and bins are as equal as ties allow (the
    deterministic twin of pandas ``qcut``).

    The naive formulation is a global ORDER BY (ntile) — one
    total-order exchange over the corpus, the scale-killer
    lm.py:171-173 documents having to dodge with approx_percentile.
    This runs exact in three bounded steps (the token_budget_select
    decomposition):

    1. scores quantize to ``floor(x·scale + 0.5)`` grid cells (the
       engine-independent rounding); one map-side-combinable groupBy
       builds the grid histogram — rows bounded by DISTINCT grid
       cells, not corpus size (size ``scale`` to the score range);
    2. running + total counts over that TINY table (single-partition
       window, bounded by distinct cells) give every cell its exact
       global ``rank0`` and thus its bin, with pure integer arithmetic
       (rank0·n_bins ≤ N·n_bins, inside 2^53 up to ~10^13 rows per
       hundred bins — document the bound, never round);
    3. the (cell → bin) map broadcast-joins back onto the corpus —
       map-only assignment, zero row-level windows anywhere.

    Scores that differ by less than the grid resolution share a cell
    and therefore a bin (the documented quantization contract). NULL
    scores pass through with a NULL bin — never dropped. Output = input
    columns + ``bin_col`` (int, 0..n_bins-1)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    cell = F.when(
        F.col(score_col).isNotNull(),
        F.floor(F.col(score_col).cast("double") * scale + F.lit(0.5))
        .cast("long"),
    )
    src = df.withColumn("__cell", cell)
    hist = (
        src.filter(F.col("__cell").isNotNull())
        .groupBy("__cell")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_before = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    binned = hist.select(
        "__cell",
        F.floor(
            F.coalesce(F.sum("__n").over(w_before), F.lit(0))
            * n_bins
            / F.sum("__n").over(w_all)
        )
        .cast("int")
        .alias("__bin"),
    )
    return (
        src.join(F.broadcast(binned), on="__cell", how="left")
        .select(*df.columns, F.col("__bin").alias(bin_col))
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    k: int,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-group top-k by score: keep each group's k best rows
    (score desc, ``id_col`` asc tie-break) — the "N best documents per
    domain/language" selection rule applied with per-source quality
    caps. NULL scores never qualify.

    The naive form is a rank window partitioned by group — fine for
    many small groups, but one giant group (the web-crawl "other"
    bucket) serializes onto a single partition's sort. This runs the
    token_budget_select/quantile_bins decomposition per group instead:

    1. quantize scores to grid cells; count rows per (group, cell) —
       one map-side-combinable groupBy, output bounded by
       groups × occupied cells;
    2. a per-group running sum DESC over that aggregated table finds
       each group's boundary cell (cells strictly above it are fully
       kept); the window partitions by group over CELL rows — bounded
       by a group's occupied cells, never its row count;
    3. rows in cells above the boundary pass with no further work
       (map-only after a broadcast join of the tiny cell table); ONLY
       the boundary cell's sliver gets the exact row-level window, and
       that window is bounded by the boundary cell's own population
       (ties at one grid value), not the group.

    Quantization is order-consistent, so the result equals the naive
    global rule exactly."""
    if k < 1:
        raise ValueError("k must be >= 1")
    src = df.filter(F.col(score_col).isNotNull())
    cell = F.floor(
        F.col(score_col).cast("double") * scale + F.lit(0.5)
    ).cast("long")
    per = src.withColumn("__cell", cell)
    sizes = per.groupBy(group_col, "__cell").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wb = Window.partitionBy(group_col).orderBy(
        F.col("__cell").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    cum = sizes.withColumn(
        "__above", F.coalesce(F.sum("__n").over(wb), F.lit(0))
    )
    # NO forced broadcast: the cell table is groups × occupied cells —
    # tiny for few groups but potentially large at web-domain
    # cardinality; AQE picks broadcast from runtime size when it fits
    # (the curate()/dedup_keep convention, ADVICE r4)
    joined = per.join(
        cum.select(group_col, "__cell", "__above", "__n"),
        on=[group_col, "__cell"],
    )
    full = joined.filter(F.col("__above") + F.col("__n") <= k)
    boundary = joined.filter(
        (F.col("__above") < k) & (F.col("__above") + F.col("__n") > k)
    )
    wr = Window.partitionBy(group_col, "__cell").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    cut = boundary.withColumn(
        "__r", F.row_number().over(wr)
    ).filter(F.col("__above") + F.col("__r") <= k)
    keep_cols = src.columns
    return full.select(*keep_cols).unionByName(cut.select(*keep_cols))
