"""Test-set decontamination: flag corpus documents that share word
n-grams with a benchmark/evaluation set.

The standard pre-training hygiene step (GPT-3 App. C, PaLM §6.1 — both
public — use 8-13-gram overlap): any training document containing an
n-gram that also appears in an evaluation set must be dropped or
audited, otherwise eval scores measure memorization.

Scale shape: the benchmark side is tiny (evals are thousands of
documents; the corpus is billions), so its distinct n-gram set is
broadcast and the corpus side never shuffles — the explode feeds a
broadcast hash join, hits are aggregated per doc (the only exchange
moves HIT rows, not corpus rows), and the hit table joins back
broadcast. A corpus document with zero overlap costs one scan and one
in-memory hash probe per gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.operators.dedup import word_shingles


def _gram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k=n)).alias("gram"),
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Corpus docs → (id, n_hits, contaminated).

    ``n_hits`` counts DISTINCT overlapping n-grams (word_shingles
    already dedups within a doc); ``contaminated`` is the drop flag.
    Documents shorter than ``n`` words contribute their whole text as
    one gram (word_shingles' short-doc convention), so a verbatim copy
    of a short benchmark doc still hits."""
    bench_grams = (
        _gram_rows(benchmark, id_col, text_col, n)
        .select("gram")
        .distinct()
    )
    hits = (
        _gram_rows(corpus, id_col, text_col, n)
        .join(F.broadcast(bench_grams), on="gram", how="inner")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(F.broadcast(hits), on=id_col, how="left")
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
