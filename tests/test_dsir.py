"""DSIR importance resampling (functions/dsir.py) vs single-process
reference implementations — featurization, fit, weights, Gumbel keys."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from lens_spark.functions.dsir import (
    GUMBEL_SCALE,
    LOG_SCALE,
    dsir_log_ratios,
    dsir_log_weight,
    dsir_resample,
    gumbel_key,
    ngram_buckets,
)

DIM = 64


def _bucket(tok: str) -> int:
    t = tok.lower().replace("ς", "σ")
    return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % DIM


def _py_buckets(text: str | None) -> list[int]:
    if text is None:
        return []
    toks = [t for t in text.lower().replace("ς", "σ").split() if t]
    grams = toks + [
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ]
    return [_bucket(g) for g in grams]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog ate the cat food"),
        (3, "one"),
        (4, ""),
        (5, None),
        (6, "alpha beta gamma alpha beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_buckets_matches_reference(spark, docs):
    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", ngram_buckets(F.col("text"), DIM).alias("b")
        ).collect()
    }
    rows = docs.collect()
    for r in rows:
        want = _py_buckets(r["text"])
        assert got[r["doc_id"]] == want, r["doc_id"]
    assert got[3] == [_bucket("one")]  # 1 token: no bigrams, no error
    assert got[4] == [] and got[5] == []


def test_log_ratios_match_reference(spark, docs):
    target = docs.filter(F.col("doc_id") <= 2)
    lr = dsir_log_ratios(target, docs, dim=DIM)
    # single-process refit
    ct, cq = [0] * DIM, [0] * DIM
    for r in docs.collect():
        for b in _py_buckets(r["text"]):
            cq[b] += 1
            if r["doc_id"] <= 2:
                ct[b] += 1
    t_tot, q_tot = sum(ct), sum(cq)
    for b in range(DIM):
        num = (ct[b] + 1) * (q_tot + DIM)
        den = (cq[b] + 1) * (t_tot + DIM)
        assert lr[b] == math.floor(
            LOG_SCALE * math.log(num / den) + 0.5
        ), b
    # unseen-everywhere buckets get the smoothing-only ratio (>0 when
    # the raw fit has more mass to redistribute)
    assert any(x != 0 for x in lr)


def test_log_weight_is_exact_sum(spark, docs):
    lr = dsir_log_ratios(docs.filter(F.col("doc_id") <= 2), docs,
                         dim=DIM)
    got = {
        r["doc_id"]: r["w"]
        for r in docs.select(
            "doc_id",
            dsir_log_weight(F.col("text"), lr, DIM).alias("w"),
        ).collect()
    }
    for r in docs.collect():
        want = sum(lr[b] for b in _py_buckets(r["text"]))
        assert got[r["doc_id"]] == want
    assert got[4] == 0 and got[5] == 0  # empty/null → 0


def test_gumbel_key_parity_and_determinism(spark):
    # JVM ln vs glibc ln at the GUMBEL_SCALE quantum: probe 500 ids —
    # the classifier-sigmoid precedent says identical op order + coarse
    # floor(x*scale + 0.5) absorbs the ulp drift
    ids = spark.range(500).select(
        F.col("id").cast("string").alias("s")
    )
    got = {
        r["s"]: r["k"]
        for r in ids.select(
            "s",
            gumbel_key(F.col("s"), F.lit(0).cast("long"),
                       "seed-x").alias("k"),
        ).collect()
    }
    for i in range(500):
        u = (
            int(hashlib.md5(f"seed-x:{i}".encode()).hexdigest()[:8], 16)
            + 1
        ) / 4294967297.0
        g = math.floor(
            GUMBEL_SCALE * (-math.log(-math.log(u))) + 0.5
        )
        assert got[str(i)] == g * (LOG_SCALE // GUMBEL_SCALE), i


def test_resample_is_weighted_topk(spark, docs):
    lr = dsir_log_ratios(docs.filter(F.col("doc_id") <= 2), docs,
                         dim=DIM)
    out = dsir_resample(
        docs, lr, dim=DIM, k=3, seed="s"
    ).collect()
    assert len(out) == 3
    # keys strictly ordered desc; key = logw + scaled gumbel
    keys = [r["key_q"] for r in out]
    assert keys == sorted(keys, reverse=True)
    # deterministic across runs
    out2 = dsir_resample(docs, lr, dim=DIM, k=3, seed="s").collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in out2]
    # python reference selection
    full = {
        r["doc_id"]: (r["key_q"], r["doc_id"])
        for r in dsir_resample(docs, lr, dim=DIM, k=100,
                               seed="s").collect()
    }
    want = sorted(full, key=lambda d: (-full[d][0], d))[:3]
    assert [r["doc_id"] for r in out] == want


def test_weight_pass_is_map_only(spark, docs):
    # 100 TB shape: scoring must be zero-shuffle, zero-join (the ratio
    # table is a literal, not a joined relation)
    lr = [0] * DIM
    plan = (
        docs.select(
            dsir_log_weight(F.col("text"), lr, DIM).alias("w")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
