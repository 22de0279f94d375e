"""Model-based quality scoring: a fastText-style linear text classifier
as pure Catalyst expressions.

Real curation pipelines pair the rules-based filters (Gopher, C4 — see
``functions/text.py``) with a learned quality classifier: hashed
bag-of-words features through a linear model (fastText's architecture;
the CCNet / LLaMA "looks-like-a-wiki-reference" filter is exactly this).
This module implements that scoring head JVM-side:

    token → md5 hash-bucket (hashing trick, ``dim`` buckets)
    → integer weight lookup → exact integer sum over the document
    → mean-pooled logit → sigmoid probability

Weights are INTEGERS (scaled by 1e3) so the document aggregation is
exact and order-independent — bit-identical across Spark, DuckDB, and
any executor count; only the final sigmoid touches floating point (and
the driver row quantizes it). The default weight vector is derived
deterministically from md5 — a stand-in with the real model's exact
execution shape. Production wiring: train/export a fastText or
scikit-learn linear model, quantize its weights to the same 1e3 scale,
and pass them as ``weights``; ``load_fasttext_weights`` gates the
import of the real fasttext package (absent in this sandbox, like the
ONNX classifier hook in extractors/ocr_stub.py).

The reference engine has no learned filtering (it indexes everything,
engine/engine.go) — training-data tier.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

from lens_spark.functions.hof import aggregate_u, transform_u
from lens_spark.functions.text import ws_tokens

WEIGHT_SCALE = 1000  # weights are ints = round(w * WEIGHT_SCALE)


def linear_weights(dim: int = 256, seed: str = "quality-v1") -> list[int]:
    """Deterministic stand-in weight vector: ints in [-1000, 1000],
    derived from md5 (same literals embeddable in oracle SQL — the
    _query_vec pattern)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        v = int.from_bytes(h[:4], "big") % (2 * WEIGHT_SCALE + 1)
        out.append(v - WEIGHT_SCALE)
    return out


def hash_bucket(tok: Column, dim: int) -> Column:
    """Hashing-trick bucket: first 8 hex chars of md5 → [0, dim).
    md5 (not xxhash64) so the oracle SQL computes the identical bucket
    (DuckDB: ('0x' || substr(md5(t),1,8))::bigint % dim)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim
    )


def classifier_features(
    col: Column, dim: int = 256, weights: list[int] | None = None
) -> Column:
    """struct(sum_w bigint, n_tok int): exact integer sum of the
    hashed-bucket weights over the lowercased whitespace tokens, plus
    the token count. Everything downstream (logit, sigmoid, a trained
    bias) is derived from these two exact numbers."""
    w = weights if weights is not None else linear_weights(dim)
    if len(w) != dim:
        raise ValueError(f"weights has {len(w)} entries, dim={dim}")
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    # fold Greek final sigma after lowercasing — JVM toLowerCase applies
    # SpecialCasing's contextual ς where DuckDB/Go use simple σ; the
    # fold makes the md5 buckets engine-identical (analyzer v3 rule,
    # operators/search.py:143)
    toks = ws_tokens(F.translate(F.lower(col), "ς", "σ"))
    wsum = aggregate_u(
        transform_u(toks, lambda t: hash_bucket(t, dim)),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(warr, (b + 1).cast("int")),
    )
    return F.struct(
        F.coalesce(wsum, F.lit(0).cast("long")).alias("sum_w"),
        F.coalesce(F.size(toks), F.lit(0)).alias("n_tok"),
    )


def classifier_score(
    col: Column,
    dim: int = 256,
    weights: list[int] | None = None,
    bias: float = 0.0,
) -> Column:
    """Sigmoid of the mean-pooled logit (fastText's mean-of-embeddings
    head, collapsed to 1-d): sigmoid(bias + sum_w / (SCALE · max(n,1))).
    Mean pooling removes document-length bias; an empty document scores
    sigmoid(bias). The only floating-point step — feed the exact
    ``classifier_features`` to a quantizer when bit-stable comparison
    matters (the driver row does)."""
    f = classifier_features(col, dim, weights)
    logit = F.lit(float(bias)) + f["sum_w"] / (
        F.lit(float(WEIGHT_SCALE)) * F.greatest(f["n_tok"], F.lit(1))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def py_hash_bucket(tok: str, dim: int) -> int:
    """Driver-side twin of :func:`hash_bucket` (same md5 prefix → same
    bucket), applied to an ALREADY-normalized token. Used by the weight
    loader so trained vocabulary lands in the buckets scoring reads."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % dim


def load_fasttext_weights(path: str, dim: int = 256) -> list[int]:
    """Production hook: load a trained fastText supervised model and
    fold each vocabulary word's logit contribution into the bucket that
    :func:`hash_bucket` assigns it at scoring time (ADVICE r4: folding
    by matrix row index would score tokens with unrelated weights).

    For each vocab word w, its contribution to the positive-label
    pre-sigmoid logit is input_vector(w) · output_row(label 0) — the
    exact linear term fastText adds for that token before mean pooling.
    The word is normalized the way ``classifier_features`` normalizes
    tokens (lowercase + Greek final-sigma fold) before bucketing, so
    scoring-time md5 buckets hit the folded weights. Colliding vocab
    words sum — the hashing trick's standard additive collision; the
    fold is lossless when every bucket holds ≤ 1 vocab word. Gated on
    the real library (absent in this sandbox — the module-level
    stand-in weights keep the execution shape testable, the same
    convention as the ONNX hook in extractors/ocr_stub.py)."""
    try:
        import fasttext  # noqa: F401
    except ImportError as e:  # pragma: no cover - sandbox has no fasttext
        raise NotImplementedError(
            "fasttext is not installed; install it and re-call, or pass "
            "quantized weights directly to classifier_features(weights=...)"
        ) from e
    model = fasttext.load_model(path)  # pragma: no cover
    import numpy as np  # pragma: no cover

    out_pos = np.asarray(model.get_output_matrix())[0]  # pragma: no cover
    folded = np.zeros(dim)  # pragma: no cover
    for word in model.get_words():  # pragma: no cover
        tok = word.lower().replace("ς", "σ")
        contrib = float(
            np.asarray(model.get_word_vector(word)) @ out_pos
        )
        folded[py_hash_bucket(tok, dim)] += contrib
    return [int(round(x * WEIGHT_SCALE)) for x in folded]  # pragma: no cover
