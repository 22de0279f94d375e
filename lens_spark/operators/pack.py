"""Sequence packing: fill fixed token-budget training sequences.

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
pack documents back-to-back into a token budget (T5's "packing",
GPT-style document concatenation). This operator implements
deterministic **next-fit** packing: within each group, documents are
taken in id order and appended to the current sequence until the budget
would overflow, then a new sequence starts. Next-fit (vs first-fit-
decreasing) is the variant real pipelines use because it is one
sequential pass, order-stable, and never reorders documents within a
shard — and determinism is what makes the run reproducible and
oracle-checkable.

Scale shape: packing is inherently sequential *within* a sequence
stream, so the unit of parallelism is the ``group_col`` (a shard / file
/ source id). ``applyInPandas`` shuffles once on the group key and each
group packs independently in one Arrow batch — at 100 TB you choose a
group granularity whose documents fit executor memory (e.g. input file
id — the natural shard of a crawl), giving thousands-way parallelism
with zero coordination. A global total-order pack would serialize the
pipeline and is deliberately not offered.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

PACK_SCHEMA = (
    "group string, id long, n_tokens int, seq_id long, seq_pos int"
)


def _pack_group(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
    seq_ids, seq_pos = [], []
    seq, acc, pos = 0, 0, 0
    for tok in pdf["n_tokens"]:
        tok = int(tok)
        if acc > 0 and acc + tok > max_tokens:
            seq, acc, pos = seq + 1, 0, 0
        seq_ids.append(seq)
        seq_pos.append(pos)
        acc += tok
        pos += 1
    pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
    pdf["seq_pos"] = pd.Series(seq_pos, dtype="int32")
    return pdf


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    tokens_col: str,
    max_tokens: int,
) -> DataFrame:
    """(id, group, n_tokens) rows → (group, id, n_tokens, seq_id,
    seq_pos) with next-fit packing per group, id-ordered.

    A document longer than ``max_tokens`` still gets its own sequence
    (the downstream truncates or splits it — packing never drops data).
    ``seq_id`` is per-group; a globally unique sequence key is
    (group, seq_id)."""
    slim = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(id_col).cast("long").alias("id"),
        F.col(tokens_col).cast("int").alias("n_tokens"),
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_group(pdf, max_tokens)

    return slim.groupBy("group").applyInPandas(apply, schema=PACK_SCHEMA)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into ≤ ``max_tokens``-token chunks with
    ``overlap`` shared tokens between consecutive chunks — the standard
    long-document counterpart to :func:`pack_sequences` (pack joins
    short docs, chunk splits long ones; real pretraining/RAG pipelines
    run both).

    Chunk ``j`` covers token positions ``1 + j·stride`` …
    ``min(1 + j·stride + max_tokens − 1, n)`` with
    ``stride = max_tokens − overlap``; the chunk count is
    ``1 + ceil((n − max_tokens) / stride)`` (clamped at 1), so the last
    chunk ends exactly at the document's final token and no chunk is
    ever fully contained in its predecessor. Zero-token documents emit
    zero chunks (deterministic; count them upstream if needed).

    Returns ``(id_col, chunk_id, n_tokens, chunk_text)`` — whitespace
    tokens re-joined with single spaces, same convention as
    ``remove_duplicate_spans``.

    Scale shape: map-only pure Catalyst (``transform`` over a chunk-index
    ``sequence`` + ``posexplode``) — NO shuffle at all; chunking
    parallelism is the scan's. The reference engine has no notion of
    token budgets (it indexes whole extracted documents,
    engine/engine.go); this belongs to the training-data tier.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be ≥ 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 ≤ overlap < max_tokens")
    stride = max_tokens - overlap
    from lens_spark.functions.hof import transform_u
    from lens_spark.functions.text import ws_tokens

    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= max_tokens, F.lit(1)).otherwise(
            (F.floor((n - F.lit(max_tokens + 1)) / F.lit(stride)) + 2)
            .cast("int")
        )
    )
    chunks = F.when(
        n_chunks >= 1,
        transform_u(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.slice(toks, j * stride + 1, max_tokens),
        ),
    ).otherwise(F.expr("CAST(array() AS array<array<string>>)"))
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("_c").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c")).alias("chunk_text"),
    )
