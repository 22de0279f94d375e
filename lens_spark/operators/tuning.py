"""LSH banding tuner: measured precision/recall per (bands, rows)
config on a deterministic corpus sample.

Every MinHash-LSH deployment must pick its banding: b bands of r rows
trade recall (more bands → catch lower-similarity pairs) against
candidate volume (more bands → more false candidates to verify).  The
S-curve formula ``P(candidate) = 1-(1-s^r)^b`` gives the theory; this
operator gives the MEASURED numbers on YOUR corpus — exact Jaccard vs
band collisions over a hash sample — which is how the banding is
actually chosen before a 100 TB dedup run is launched.

Determinism contract: the sample is the ``sample_k`` lowest
``(md5(id), id)`` rows (the hash-order sample convention —
embedding_kmeans seeding, hash_sample); signatures reuse
:func:`~lens_spark.operators.dedup.minhash_signature` md5 seeds;
Jaccard and precision/recall are exact integers in basis points.  The
DuckDB driver oracle recomputes the whole report hash-exactly.

Scale shape: the O(sample_k²) pair comparison is DELIBERATE and
bounded — ``sample_k`` defaults to 150 (≤ 11k pairs, one task's
work); the corpus-sized stages are a TakeOrderedAndProject sample and
map-only signatures.  This is a tuning probe, not a dedup pass: the
quadratic term never sees the corpus, only the fixed-size sample.  All
band configs are evaluated from ONE signature array in ONE aggregate
pass (sample-sized, so the no-CSE-through-lambdas inlining that rules
out signature slicing on the full corpus — see minhash_band_rows — is
irrelevant here and slicing keeps the plan single-pass).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.operators.dedup import minhash_signature, word_shingles

__all__ = ["lsh_tuning_report"]

SCALE = 10_000


def lsh_tuning_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_configs: tuple[int, ...] = (1, 2, 4, 8),
    shingle_k: int = 3,
    sample_k: int = 150,
    tau_bp: int = 3500,
    hash_fn: str = "md5",
) -> DataFrame:
    """One row per banding config: ``(bands, rows_per_band, n_pairs,
    candidates, dups, caught, precision_bp, recall_bp)`` where ``dups``
    counts sample pairs with exact Jaccard ≥ ``tau_bp`` basis points
    and ``caught`` the dups that would collide in ≥1 band."""
    for b in band_configs:
        if num_hashes % b:
            raise ValueError(f"bands={b} does not divide {num_hashes}")
    sample = (
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_k).alias("sh"),
        )
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(sample_k)
    )
    sample = sample.select(
        "id", "sh",
        minhash_signature(F.col("sh"), num_hashes, hash_fn).alias("sig"),
    )
    a, b_ = sample.alias("a"), sample.alias("b")
    pairs = a.join(b_, F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union == 0, F.lit(SCALE)).otherwise(
        F.floor(inter * SCALE / union)
    )
    dup = (jac >= tau_bp).cast("int")

    def cand(bands: int):
        r = num_hashes // bands
        hit = F.lit(False)
        for i in range(bands):
            hit = hit | (
                F.slice(F.col("a.sig"), i * r + 1, r)
                == F.slice(F.col("b.sig"), i * r + 1, r)
            )
        return hit.cast("int")

    aggs = [F.count(F.lit(1)).alias("n_pairs"), F.sum(dup).alias("dups")]
    for bands in band_configs:
        c = cand(bands)
        aggs.append(F.sum(c).alias(f"cand_{bands}"))
        aggs.append(F.sum(c * dup).alias(f"caught_{bands}"))
    row = pairs.agg(*aggs)

    stacked = row.selectExpr(
        "n_pairs", "dups",
        "stack({}, {}) as (bands, candidates, caught)".format(
            len(band_configs),
            ", ".join(
                f"{b}, cand_{b}, caught_{b}" for b in band_configs
            ),
        ),
    )
    return stacked.select(
        "bands",
        F.lit(num_hashes).cast("int").alias("num_hashes"),
        (F.lit(num_hashes) / F.col("bands")).cast("int").alias(
            "rows_per_band"),
        "n_pairs",
        "candidates",
        "dups",
        "caught",
        F.floor(
            F.col("caught") * SCALE / F.greatest("candidates", F.lit(1))
        ).cast("long").alias("precision_bp"),
        F.floor(
            F.col("caught") * SCALE / F.greatest("dups", F.lit(1))
        ).cast("long").alias("recall_bp"),
    ).orderBy("bands")
