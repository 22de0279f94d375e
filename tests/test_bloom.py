"""Bloom digest index: no false negatives ever, bounded false-positive
rate, idempotent incremental merge, and a single-threaded Python
reference reproducing the exact bit math (the oracle-parity guarantee
the driver row relies on)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.bloom import (
    bloom_build, bloom_merge, bloom_params, bloom_probe,
)


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _ref_positions(text: str, m_bits: int, k: int) -> list[int]:
    fp = hashlib.md5(_norm(text).encode()).hexdigest()
    return [
        int(hashlib.md5(f"{fp}:{j}".encode()).hexdigest()[:15], 16) % m_bits
        for j in range(k)
    ]


def _ref_bloom(texts: list[str], m_bits: int, k: int) -> set[int]:
    bits: set[int] = set()
    for t in texts:
        bits.update(_ref_positions(t, m_bits, k))
    return bits


M, K = 4096, 5


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc {i} body word{i % 37} tail {i * 7 % 113}")
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_params_shape():
    m, k = bloom_params(1_000_000, fpr=0.01)
    assert m % 64 == 0
    assert 9 * 1_000_000 <= m <= 11 * 1_000_000   # ~9.6 bits/doc at 1%
    assert k in (6, 7)
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, fpr=1.5)


def test_no_false_negatives(spark, corpus):
    bloom = bloom_build(corpus, "text", M, K)
    # every inserted doc (re-probed verbatim, plus a whitespace/case
    # variant — the normalize_text contract) must hit
    variants = corpus.select(
        "doc_id", F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text")
    )
    hits = bloom_probe(variants, bloom, "doc_id", "text", M, K)
    assert hits.filter(F.col("bloom_hit") == 0).count() == 0


def test_fpr_bounded(spark, corpus):
    bloom = bloom_build(corpus, "text", M, K)
    fresh = spark.createDataFrame(
        [(i, f"unseen {i} zzq {i * 13 % 997}") for i in range(1000, 1500)],
        "doc_id long, text string",
    )
    got = bloom_probe(fresh, bloom, "doc_id", "text", M, K)
    fp = got.filter(F.col("bloom_hit") == 1).count()
    n, m, k = 300, M, K
    expected = (1 - math.exp(-k * n / m)) ** k
    # generous ceiling: 3× the analytic rate + slack for small samples
    assert fp / 500 <= 3 * expected + 0.02


def test_matches_reference_bit_math(spark, corpus):
    """The Spark filter table IS the reference bitset — word-for-word."""
    bloom = bloom_build(corpus, "text", M, K).collect()
    texts = [r.text for r in corpus.collect()]
    ref_bits = _ref_bloom(texts, M, K)
    ref_words: dict[int, int] = {}
    for p in ref_bits:
        ref_words[p // 64] = ref_words.get(p // 64, 0) | (1 << (p % 64))
    # two's complement fold to signed 64-bit (Spark longs are signed)
    ref_signed = {
        w: v - (1 << 64) if v >= (1 << 63) else v
        for w, v in ref_words.items()
    }
    assert {r.word_idx: r.bits for r in bloom} == ref_signed


def test_incremental_merge(spark, corpus):
    half_a = corpus.filter(F.col("doc_id") < 150)
    half_b = corpus.filter(F.col("doc_id") >= 150)
    merged = bloom_merge(
        bloom_build(half_a, "text", M, K),
        bloom_build(half_b, "text", M, K),
    )
    whole = bloom_build(corpus, "text", M, K)
    a = {(r.word_idx, r.bits) for r in merged.collect()}
    b = {(r.word_idx, r.bits) for r in whole.collect()}
    assert a == b


def test_probe_plan_shape(spark, corpus):
    """Probe stays JVM-side: no Python evals anywhere, and AQE picks a
    broadcast join for the small filter side at runtime (no forced
    hint — at 10^12-doc m the word table outgrows broadcast and must
    be allowed to shuffle-join on word_idx)."""
    bloom = bloom_build(corpus, "text", M, K)
    probe = bloom_probe(corpus, bloom, "doc_id", "text", M, K)
    probe.collect()  # materialize so AQE finalizes the join strategy
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan";
    # only the final plan reflects what actually executed
    final = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in final
    assert "ArrowEvalPython" not in final
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
