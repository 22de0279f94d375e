"""Ground-truth tests for every multi-lambda Catalyst expression.

Spark 4.1's PySpark names every single-arg lambda variable 'x'
(functions/builtin.py _create_lambda) and the analyzer mis-renames when
many sibling lambdas share a projection — silently producing wrong,
run-to-run-unstable values (we hit this in minhash: none of 16 signature
mins matched a Python md5 reference, and two identical plans disagreed).

lens_spark.functions.hof generates unique variable names instead. These
tests pin every hash/aggregate expression to an independent pure-Python
reference so any regression — ours or Spark's — fails loudly.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "der hund ist nicht der gleiche und das ist gut"),
    (6, "completely different content about spark shuffles and partitions"),
]


def _py_shingles(text: str, k: int = 3) -> list[str]:
    toks = " ".join(text.lower().split()).split(" ")
    if len(toks) >= k:
        sh = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    else:
        sh = [" ".join(toks)]
    return sorted(set(sh))


def _py_minhash(shingles: list[str], n: int) -> list[str]:
    return [
        min(hashlib.md5(f"{h}:{s}".encode()).hexdigest() for s in shingles)
        for h in range(n)
    ]


def _py_simhash(text: str) -> int:
    toks = " ".join(text.lower().split()).split(" ")
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    out = 0
    for i in range(60):
        ones = sum((h >> i) & 1 for h in hs)
        if ones * 2 > len(hs):
            out |= 1 << i
    return out


def test_minhash_signature_matches_python(spark):
    from lens_spark.operators.dedup import minhash_signature, word_shingles

    df = spark.createDataFrame(DOCS, "id int, text string")
    shingled = df.select(
        "id", word_shingles(F.col("text"), 3).alias("sh")
    )
    got = {
        r["id"]: (list(r["sh"]), list(r["sig"]))
        for r in shingled.select(
            "id", "sh",
            minhash_signature(F.col("sh"), 16, "md5").alias("sig"),
        ).collect()
    }
    for i, text in DOCS:
        exp_sh = _py_shingles(text)
        assert got[i][0] == exp_sh, f"shingles mismatch id={i}"
        assert got[i][1] == _py_minhash(exp_sh, 16), f"minhash mismatch id={i}"


def test_minhash_stable_across_plan_constructions(spark):
    from lens_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(DOCS, "id int, text string")

    def run():
        return sorted(
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(df, "id", "text").collect()
        )

    assert run() == run() == run()


def test_simhash_matches_python(spark):
    from lens_spark.operators.dedup import simhash64

    df = spark.createDataFrame(DOCS, "id int, text string")
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", simhash64(F.col("text")).alias("sh"))
        .collect()
    }
    for i, text in DOCS:
        assert got[i] == _py_simhash(text), f"simhash mismatch id={i}"


def test_cosine_matches_python(spark):
    from lens_spark.operators.similarity import cosine

    a = [0.3, -1.2, 0.7, 2.0]
    b = [1.0, 0.4, -0.2, 0.5]
    df = spark.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    dot = sum(x * y for x, y in zip(a, b))
    exp = dot / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b)))
    assert got == pytest.approx(exp, abs=1e-12)


def test_lsh_bucket_matches_python(spark):
    from lens_spark.operators.similarity import hyperplane_signs, lsh_bucket

    vec = [0.5, -0.25, 1.5, -2.0, 0.1, 0.0, 3.0, -1.0]
    planes = [hyperplane_signs(p, len(vec)) for p in range(6)]
    exp = 0
    for i, p in enumerate(planes):
        if sum(x * s for x, s in zip(vec, p)) > 0:
            exp |= 1 << i
    df = spark.createDataFrame([(vec,)], "v array<float>")
    got = df.select(lsh_bucket(F.col("v"), planes).alias("b")).collect()[0]["b"]
    assert got == exp


def test_lang_id_sibling_filters_match_python(spark):
    from lens_spark.functions.text import LANG_MARKERS, lang_id

    df = spark.createDataFrame(DOCS, "id int, text string")
    got = {
        r["id"]: r["lang"]
        for r in df.select("id", lang_id(F.col("text")).alias("lang"))
        .collect()
    }
    for i, text in DOCS:
        toks = text.lower().split()
        best = max(
            (sum(t in m for t in toks), code)
            for code, m in sorted(LANG_MARKERS.items())
        )
        exp = best[1] if best[0] > 0 else "und"
        assert got[i] == exp, f"lang mismatch id={i}"


def test_raw_spark_transform_sibling_bug_documented(spark):
    """Canary: if a Spark upgrade fixes the sibling-lambda collision this
    starts XPASSing — then hof.py can be retired. Until then it documents
    the exact failure mode we guard against."""
    df = spark.range(1).select(F.array(F.lit("aa"), F.lit("bb")).alias("arr"))
    cols = [
        F.array_min(
            F.transform(
                F.col("arr"),
                lambda s, h=h: F.md5(F.concat(F.lit(f"{h}:"), s)),
            )
        )
        for h in range(8)
    ]
    got = list(df.select(F.array(*cols).alias("sig")).collect()[0]["sig"])
    truth = [
        min(hashlib.md5(f"{h}:{s}".encode()).hexdigest() for s in ["aa", "bb"])
        for h in range(8)
    ]
    if got == truth:
        pytest.xfail("Spark fixed the sibling-lambda collision — "
                     "hof.py workaround can be retired")
