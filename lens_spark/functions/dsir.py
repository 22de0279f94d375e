"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): select raw-corpus documents that look like a small
target domain by importance weights under hashed-n-gram bag models.

    features:  unigrams + bigrams of the normalized whitespace tokens,
               hashed into ``dim`` buckets (the paper's hashed n-gram
               parametrization, §3.2)
    models:    two bucket-multinomials with add-α smoothing — p̂ fit on
               the TARGET corpus, q̂ fit on the RAW corpus
    weight:    log w(x) = Σ_occurrences [log p̂(b) − log q̂(b)]
    resample:  Gumbel top-k — keep the k docs maximizing
               log w(x) + Gumbel(0,1), the standard exp-weighted
               sampling-without-replacement trick (Vieira 2014); DSIR's
               §3.3 "sample without replacement ∝ w" step

Engine-parity design (the repo's exact-integer convention,
functions/classifier.py): bucket counts are exact integers both
engines (md5 buckets over identically-normalized tokens); the ONLY
transcendentals are one ``ln`` per bucket (log-ratio table, computed
DRIVER-side in Python from collected integer counts — glibc, the same
libm DuckDB calls) and the two ``ln`` of the Gumbel perturbation
(JVM-side, identical operation order + floor(x·scale + 0.5)
quantization both sides — the classifier sigmoid precedent). Per-doc
log-weights are integer sums of the quantized log-ratios: exact,
order-independent, executor-count-independent.

100 TB shape: fitting = one groupBy over at most ``dim`` buckets per
corpus (tiny shuffle) + a bounded ``dim``-row collect; scoring = the
log-ratio table rides into the plan as a literal array, so the weight
pass is MAP-ONLY (zero shuffle, zero joins — plan-asserted); the
resample is a TakeOrderedAndProject top-k. The reference engine has no
data-selection tier (it indexes everything, engine/engine.go) — this
is part of the training-data layer this repo adds.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from lens_spark.functions.classifier import hash_bucket
from lens_spark.functions.hof import aggregate_u, transform_u, zip_with_u
from lens_spark.functions.text import ws_tokens

LOG_SCALE = 1_000_000  # log-ratio quantization (floor(x*SCALE + 0.5))
GUMBEL_SCALE = 10_000  # Gumbel quantization — coarser: 2 JVM lns/doc


def ngram_buckets(col: Column, dim: int = 512) -> Column:
    """array<long> of hashed n-gram buckets (unigrams then bigrams) of
    the normalized tokens of ``col`` — one entry PER OCCURRENCE, the
    multiset the bag-multinomial counts. Normalization = lowercase +
    Greek final-sigma fold (the classifier/analyzer-v3 rule, so md5
    buckets are engine-identical). NULL/empty text → empty array.

    The token array is let-bound (hof.let_u, r06) so the tokenizer runs
    once per row instead of once per reference (four references here;
    HOF-containing expressions are interpreted with no CSE)."""
    from lens_spark.functions.hof import let_u

    def _buckets(toks):
        unis = transform_u(toks, lambda t: hash_bucket(t, dim))
        n = F.size(toks)
        # slice guards: slice(toks, 2, n-1) with n < 2 would ask for a
        # negative length (ANSI error) — gate on n >= 2
        bis = F.when(
            n >= 2,
            transform_u(
                zip_with_u(
                    F.slice(toks, 1, n - 1),
                    F.slice(toks, 2, n - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
                lambda g: hash_bucket(g, dim),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(unis, bis)

    return F.when(
        col.isNull(), F.array().cast("array<bigint>")
    ).otherwise(
        let_u(ws_tokens(F.translate(F.lower(col), "ς", "σ")), _buckets)
    )


def _bucket_counts(
    df: DataFrame, text_col: str, dim: int
) -> tuple[list[int], int]:
    """(per-bucket occurrence counts, total occurrences) — exact ints.
    One explode + groupBy on ≤ dim keys; the collect is ≤ dim rows
    (bounded by construction — dim is a model constant, not data)."""
    rows = (
        df.select(
            F.explode(ngram_buckets(F.col(text_col), dim)).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    counts = [0] * dim
    for r in rows:
        counts[int(r["b"])] = int(r["c"])
    return counts, sum(counts)


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    dim: int = 512,
    alpha: int = 1,
) -> list[int]:
    """Quantized per-bucket log importance ratios:
    floor(SCALE · ln[((ct_b+α)·(Q+α·dim)) / ((cq_b+α)·(T+α·dim))] + ½)
    with ct/T from the target fit and cq/Q from the raw fit — the add-α
    smoothed multinomial MLEs, algebraically collapsed to ONE ln per
    bucket on an exactly-representable integer rational (products stay
    < 2^53 up to ~10^8-token fits; beyond that the int→double rounding
    is the standard float budget). α is an int so both engines form the
    identical rational."""
    ct, t_tot = _bucket_counts(target, text_col, dim)
    cq, q_tot = _bucket_counts(raw, text_col, dim)
    out = []
    for b in range(dim):
        num = (ct[b] + alpha) * (q_tot + alpha * dim)
        den = (cq[b] + alpha) * (t_tot + alpha * dim)
        out.append(math.floor(LOG_SCALE * math.log(num / den) + 0.5))
    return out


def dsir_log_weight(
    col: Column, log_ratios: list[int], dim: int = 512
) -> Column:
    """bigint: Σ over n-gram occurrences of the quantized log-ratio of
    the occurrence's bucket — the doc's log importance weight scaled by
    LOG_SCALE. Exact integer sum (order-free); empty/NULL text → 0.
    Map-only: the ratio table is a literal array, no join."""
    if len(log_ratios) != dim:
        raise ValueError(f"log_ratios has {len(log_ratios)}, dim={dim}")
    lr = F.array(*[F.lit(int(x)).cast("long") for x in log_ratios])
    return F.coalesce(
        aggregate_u(
            ngram_buckets(col, dim),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(lr, (b + 1).cast("int")),
        ),
        F.lit(0).cast("long"),
    )


def gumbel_key(id_col: Column, logw_q: Column, seed: str) -> Column:
    """bigint resampling key, LOG_SCALE-scaled: logw_q + SCALE·g where
    g = −ln(−ln(u)) and u ∈ (0,1) is the md5-uniform of (seed, id) —
    deterministic Gumbel(0,1) noise, so top-k by this key IS sampling
    without replacement ∝ exp(log w) (Gumbel-max). g is quantized at
    GUMBEL_SCALE with the identical op order both engines (classifier
    sigmoid precedent: floor(x·scale + ½), JVM-vs-glibc ln ulp drift
    bounded by the coarse quantum)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.lit(":"), id_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967297.0)
    gq = F.floor(
        F.lit(float(GUMBEL_SCALE)) * (-F.log(-F.log(u))) + F.lit(0.5)
    ).cast("long")
    return logw_q + gq * (LOG_SCALE // GUMBEL_SCALE)


def dsir_resample(
    df: DataFrame,
    log_ratios: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 512,
    k: int = 100,
    seed: str = "dsir-v1",
) -> DataFrame:
    """Top-``k`` Gumbel-resampled docs: (id_col, logw_q, key_q) ordered
    by key_q desc, id asc (the tiebreak makes equal-key rows stable).
    Plan: map-only scoring → TakeOrderedAndProject — no shuffle, no
    join, the same shape at 10^12 docs."""
    logw = dsir_log_weight(F.col(text_col), log_ratios, dim)
    scored = df.select(
        F.col(id_col),
        logw.alias("logw_q"),
    ).withColumn(
        "key_q", gumbel_key(F.col(id_col).cast("string"),
                            F.col("logw_q"), seed)
    )
    return scored.orderBy(
        F.col("key_q").desc(), F.col(id_col).asc()
    ).limit(k)
