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

    # let-bind the token array (r06): the chunk lambda slices it per
    # chunk, and a naked ws_tokens subtree there re-ran the tokenizer
    # per chunk (no CSE inside HOF lambdas). Identical output.
    from lens_spark.functions.hof import let_u

    def _chunks(toks):
        n = F.size(toks)
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            F.when(n <= max_tokens, F.lit(1)).otherwise(
                (F.floor((n - F.lit(max_tokens + 1)) / F.lit(stride)) + 2)
                .cast("int")
            )
        )
        return F.when(
            n_chunks >= 1,
            transform_u(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda j: F.slice(toks, j * stride + 1, max_tokens),
            ),
        ).otherwise(F.expr("CAST(array() AS array<array<string>>)"))

    chunks = let_u(ws_tokens(F.col(text_col)), _chunks)
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("_c").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c")).alias("chunk_text"),
    )


# ------------------------------------------------- interleaved packing
MEDIA_PLACEHOLDER = "<|media|>"

INTERLEAVED_SCHEMA = (
    "doc_id string, chunk_id int, n_tokens int, n_media int, "
    "text string, media_refs array<string>"
)


def pack_interleaved_rows(
    doc_id,
    spans,
    max_tokens: int,
    media_cost: int = 1,
) -> list[tuple]:
    """Per-doc interleaved packing — a PURE function shared by the
    distributed batches and the Spark-free oracle freezer
    (scripts/freeze_interleaved_oracle.py, the image_feature_row
    convention).

    Walk the doc's spans IN ORDER; text spans cost their whitespace
    token count and may be SPLIT at token boundaries, media spans cost
    ``media_cost`` and are ATOMIC (a multimodal trainer cannot attend
    to half an image); cut a new chunk whenever the budget would
    overflow. Chunk text re-joins tokens with single spaces
    (chunk_documents' convention) with ``<|media|>`` placeholders at
    media positions, refs carried per chunk in order."""
    chunks: list[tuple] = []
    toks: list[str] = []
    refs: list[str] = []
    acc = 0
    n_media = 0

    def flush():
        nonlocal toks, refs, acc, n_media
        if acc > 0:
            chunks.append((
                doc_id, len(chunks), acc, n_media,
                " ".join(toks), refs,
            ))
        toks, refs, acc, n_media = [], [], 0, 0

    # not `spans or []`: Arrow hands the array column over as a numpy
    # array, whose truthiness raises
    for span in (spans if spans is not None else []):
        kind = span["kind"]
        if kind == "media":
            if span["media_ref"] is None:
                continue
            if acc + media_cost > max_tokens and acc > 0:
                flush()
            toks.append(MEDIA_PLACEHOLDER)
            refs.append(span["media_ref"])
            acc += media_cost
            n_media += 1
            continue
        text = span["text"]
        if text is None:
            continue
        for w in str(text).split():
            if acc + 1 > max_tokens and acc > 0:
                flush()
            toks.append(w)
            acc += 1
    flush()
    return chunks


def pack_interleaved(
    extracted: DataFrame,
    max_tokens: int = 512,
    media_cost: int = 1,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Pack EXTRACTED interleaved documents (the repo's core data
    model: ordered (kind, text, media_ref) spans) into ≤ ``max_tokens``
    multimodal trainer chunks — text splittable, media atomic,
    original span order preserved.

    Returns ``(doc_id, chunk_id, n_tokens, n_media, text,
    media_refs)``; ``text`` carries ``<|media|>`` placeholders aligned
    with ``media_refs``.

    100 TB shape: map-only Arrow ``mapInPandas`` — the walk is
    sequential only WITHIN one document (the order dependency is
    intrinsic: a chunk boundary depends on every span before it), so
    parallelism is the scan's; no shuffle, no window. Cross-doc
    sequence FILLING afterwards is :func:`pack_sequences` on the chunk
    table (group-parallel next-fit) — the two compose."""
    if max_tokens < 1 or media_cost < 1 or media_cost > max_tokens:
        raise ValueError(
            "need max_tokens >= 1 and 1 <= media_cost <= max_tokens"
        )

    def batches(it):
        cols = ["doc_id", "chunk_id", "n_tokens", "n_media",
                "text", "media_refs"]
        for b in it:
            rows: list[tuple] = []
            for did, spans in zip(b[id_col], b[spans_col]):
                rows.extend(
                    pack_interleaved_rows(
                        did, spans, max_tokens, media_cost)
                )
            yield pd.DataFrame(rows, columns=cols)

    return extracted.select(id_col, spans_col).mapInPandas(
        batches, INTERLEAVED_SCHEMA
    )
