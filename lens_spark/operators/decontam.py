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
