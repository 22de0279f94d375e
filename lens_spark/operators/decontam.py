"""Test-set decontamination: flag corpus documents that share word
n-grams with a benchmark/evaluation set.

The standard pre-training hygiene step (GPT-3 App. C, PaLM §6.1 — both
public — use 8-13-gram overlap): any training document containing an
n-gram that also appears in an evaluation set must be dropped or
audited, otherwise eval scores measure memorization.

Scale shape: the benchmark side is tiny (evals are thousands of
documents; the corpus is billions), so its distinct n-gram set is
broadcast and the corpus side never shuffles — the explode feeds a
broadcast hash join and hits are aggregated per doc (the only exchange
moves HIT rows, not corpus rows). A corpus document with zero overlap
costs one scan and one in-memory hash probe per gram.

The hit table joins back WITHOUT a broadcast hint (ADVICE r4): a single
ubiquitous benchmark gram (boilerplate, a license header in the eval
set) can flag a large fraction of a billion-doc corpus, and a forced
broadcast of that hit table would blow the driver limit at exactly the
scale this module targets. AQE picks broadcast from the hit table's
RUNTIME size when it fits. For the same failure mode, ``max_gram_df``
optionally drops benchmark grams matching more than that many corpus
docs before aggregation — boilerplate, not contamination signal — with
the drop metered through the repo's no-silent-caps convention
(dedup.observe_cap_drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.operators.dedup import observe_cap_drops, word_shingles


def _gram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k=n)).alias("gram"),
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_gram_df: int | None = None,
    observation=None,
) -> DataFrame:
    """Docs WITH overlap only → (id, n_hits) — the small table a caller
    joins back however fits its plan (curate() left-joins it onto the
    annotated frame; :func:`contamination_flags` completes it to a
    full-corpus flag table). ``n_hits`` counts DISTINCT overlapping
    n-grams (word_shingles already dedups within a doc). Documents
    shorter than ``n`` words contribute their whole text as one gram
    (word_shingles' short-doc convention), so a verbatim copy of a
    short benchmark doc still hits.

    ``max_gram_df`` (default None = exact) drops benchmark grams that
    match MORE than that many corpus documents — an eval-set
    boilerplate gram, not memorization evidence. The extra pass runs
    over HIT rows only (pinned with a lazy localCheckpoint so the
    corpus is scanned once — the jaccard/connected-components sharing
    pattern and its non-reliable-storage trade, dedup.py); the dropped
    volume is metered via ``observation`` (dedup.observe_cap_drops,
    prefix ``decontam``)."""
    bench_grams = (
        _gram_rows(benchmark, id_col, text_col, n)
        .select("gram")
        .distinct()
    )
    hit_rows = _gram_rows(corpus, id_col, text_col, n).join(
        F.broadcast(bench_grams), on="gram", how="inner"
    )
    if max_gram_df is not None:
        # hit rows are small relative to the corpus (contamination is
        # rare); pin them so gram-df counting and per-doc aggregation
        # share one evaluation of the corpus scan
        hit_rows = hit_rows.localCheckpoint(eager=False)
        gram_df = hit_rows.groupBy("gram").agg(
            F.count("*").cast("long").alias("__gram_df")
        )
        gram_df = observe_cap_drops(
            gram_df, "__gram_df", max_gram_df, observation, "decontam"
        )
        keep_grams = gram_df.filter(
            F.col("__gram_df") <= max_gram_df
        ).select("gram")
        # keep_grams ⊆ the already-broadcast benchmark gram set — the
        # one side in this operator that is GENUINELY broadcast-safe
        hit_rows = hit_rows.join(
            F.broadcast(keep_grams), on="gram", how="inner"
        )
    return hit_rows.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_hits")
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_gram_df: int | None = None,
    observation=None,
) -> DataFrame:
    """Corpus docs → (id, n_hits, contaminated): the full-corpus flag
    view of :func:`contamination_hits` (see there for semantics and the
    ``max_gram_df`` cap)."""
    hits = contamination_hits(
        corpus, benchmark, id_col, text_col, n,
        max_gram_df=max_gram_df, observation=observation,
    )
    return (
        corpus.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias(
                "n_hits"
            ),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


# ------------------------------------------------- fuzzy (MinHash) layer
def _sig_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_id: str,
    sig_name: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    hash_fn: str,
) -> DataFrame:
    """(out_id, sig array<string>, band_no, bucket) rows — the exact
    min/band construction of dedup.minhash_lsh_pairs (each band hashed
    from only its own seeds; mins materialized as plain columns first so
    nothing re-evaluates through lambdas), with the full signature
    carried alongside for verification."""
    from lens_spark.functions.hof import transform_u
    from lens_spark.operators.dedup import word_shingles

    rows_per_band = num_hashes // bands
    if hash_fn == "md5":
        def h1(h, s):
            return F.md5(F.concat(F.lit(f"{h}:"), s))

        band_hash = F.md5
    else:
        def h1(h, s):
            return F.xxhash64(F.concat(F.lit(f"{h}:"), s))

        band_hash = F.xxhash64
    shingled = df.select(
        F.col(id_col).alias(out_id),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    mins = shingled.select(
        out_id,
        *[
            F.array_min(
                transform_u(F.col("shingles"), lambda s, h=h: h1(h, s))
            ).alias(f"m_{h}")
            for h in range(num_hashes)
        ],
    )
    band_cols = [
        band_hash(
            F.array_join(
                F.array(
                    *[F.col(f"m_{h}") for h in
                      range(b * rows_per_band, (b + 1) * rows_per_band)]
                ).cast("array<string>"),
                "|",
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    sig = F.array(
        *[F.col(f"m_{h}").cast("string") for h in range(num_hashes)]
    )
    with_sig = mins.select(out_id, sig.alias(sig_name), *band_cols)
    return with_sig.selectExpr(
        out_id,
        sig_name,
        "stack({}, {}) as (band_no, bucket)".format(
            bands, ", ".join(f"{b}, band_{b}" for b in range(bands))
        ),
    )


def _fuzzy_best(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    hash_fn: str,
) -> DataFrame:
    """Per-corpus-doc best benchmark match over band-collision
    candidates: (id, n_agree, match_id) — max agreeing components, ties
    to the lowest bench id. Only docs with ≥1 band collision appear."""
    from lens_spark.functions.hof import aggregate_u, zip_with_u
    from lens_spark.operators.dedup import ensure_parallelism

    cb = _sig_band_rows(
        ensure_parallelism(corpus), id_col, text_col, "id", "sig",
        num_hashes, bands, shingle_k, hash_fn,
    )
    bb = _sig_band_rows(
        benchmark, id_col, text_col, "bench_id", "bench_sig",
        num_hashes, bands, shingle_k, hash_fn,
    )
    cand = cb.join(F.broadcast(bb), on=["band_no", "bucket"], how="inner")
    agree = aggregate_u(
        zip_with_u(
            F.col("sig"), F.col("bench_sig"),
            lambda x, y: (x == y).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = cand.select("id", "bench_id", agree.alias("n_agree"))
    return (
        scored.groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_agree")).alias("neg"),
                    F.col("bench_id").alias("bid"),
                )
            ).alias("b")
        )
        .select(
            "id",
            (-F.col("b.neg")).alias("n_agree"),
            F.col("b.bid").alias("match_id"),
        )
    )


def minhash_contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Flagged docs ONLY → (id_col, n_agree, fuzzy_match_id) — the small
    table a caller joins back however fits its plan (curate()'s fuzzy
    stage left-joins it; :func:`minhash_contamination` completes it to a
    full-corpus view). Same semantics as there."""
    import math

    min_agree = int(math.ceil(threshold * num_hashes))
    return (
        _fuzzy_best(
            corpus, benchmark, id_col, text_col,
            num_hashes, bands, shingle_k, hash_fn,
        )
        .filter(F.col("n_agree") >= min_agree)
        .select(
            F.col("id").alias(id_col),
            "n_agree",
            F.col("match_id").alias("fuzzy_match_id"),
        )
    )


def minhash_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """FUZZY test-set decontamination: flag corpus docs whose MinHash
    signature agrees with some benchmark doc's on ≥ ``threshold`` of
    the ``num_hashes`` components (the unbiased MinHash estimator of
    shingle-Jaccard — the fuzzy complement of the exact n-gram rule in
    :func:`contamination_flags`; near-verbatim eval copies with light
    paraphrase slip exact n-gram overlap but not MinHash agreement).

    Returns one row per corpus doc: (id_col, n_agree, fuzzy_match_id,
    fuzzy_contaminated) — n_agree = the best benchmark doc's agreeing
    component count (0 if no band collision; band recall applies:
    a pair sharing no full band is never scored, the standard
    LSH-candidate contract), fuzzy_match_id = that doc (ties to the
    lowest id; -1 sentinel when none — nullable ints poison pandas
    round-trips), fuzzy_contaminated = n_agree ≥ ceil(threshold ×
    num_hashes).

    100 TB shape: the benchmark side is tiny (evals are thousands of
    docs) so its band table is a GENUINE broadcast — the corpus side
    computes signatures map-only and never shuffles; the only exchanges
    move candidate rows (band collisions) for the per-doc max and the
    final annotate join-back, which is AQE-decided (no forced broadcast
    — on a contaminated-heavy corpus the best-match table is large;
    ADVICE r4 rule).
    """
    import math

    min_agree = int(math.ceil(threshold * num_hashes))
    best = _fuzzy_best(
        corpus, benchmark, id_col, text_col,
        num_hashes, bands, shingle_k, hash_fn,
    )
    out = (
        corpus.select(F.col(id_col).alias("id"))
        .join(best, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_agree"), F.lit(0)).cast("int")
            .alias("n_agree"),
            F.coalesce(F.col("match_id"), F.lit(-1)).cast("long")
            .alias("fuzzy_match_id"),
            (F.coalesce(F.col("n_agree"), F.lit(0)) >= min_agree)
            .cast("int")
            .alias("fuzzy_contaminated"),
        )
    )
    return out
