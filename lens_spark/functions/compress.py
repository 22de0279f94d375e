"""Compression-ratio quality signal.

How well a document compresses is a classic cheap proxy for repetition
and boilerplate (Dolma and Gopher-family pipelines ship a
"gzip/zlib compression ratio" tagger: machine-generated or template
text compresses far better than natural prose; random/binary junk
barely compresses).  DEFLATE is fully deterministic for a fixed level
and library, so the signal is reproducible and hash-comparable.

Integer contract (the repo's float-free hash-parity convention):
``ratio_q = floor(comp_len * 10000 / raw_len)`` — basis points, exact
integer division; ``raw_len == 0`` (empty or NULL text) yields the
``-1`` sentinel instead of NULL (the nullable-int rule).

100 TB shape: map-only Arrow-batched ``mapInPandas`` — zero shuffles,
bounded per-row memory (DEFLATE streams), ~100 MB/s/core of zlib
throughput: the scan dominates.  There is deliberately no pure-Catalyst
path — Spark has no compression expression, and the signal's whole
value is the real DEFLATE model.

Driver-row oracle: the expected table is FROZEN by a Spark-free
single-threaded pass over the same input
(scripts/freeze_compress_oracle.py — the extract_full pattern), so the
correctness row pins the Arrow plumbing against a local computation,
and determinism across zlib builds is pinned by a literal golden value
in tests.
"""
from __future__ import annotations

import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = ["compression_row", "compression_signals"]

LEVEL = 6
SCALE = 10_000


def compression_row(doc_id, text, level: int = LEVEL) -> tuple:
    """Per-row signal logic — a PURE function shared by the distributed
    batches and the Spark-free oracle freezer (the image_feature_row
    convention, operators/multimodal.py)."""
    if text is None:
        return (doc_id, 0, 0, -1)
    raw = str(text).encode("utf-8")
    if not raw:
        return (doc_id, 0, 0, -1)
    comp = zlib.compress(raw, level)
    return (
        doc_id,
        len(raw),
        len(comp),
        len(comp) * SCALE // len(raw),
    )


def compression_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    level: int = LEVEL,
) -> DataFrame:
    """``(id, raw_len, comp_len, ratio_q)`` per document (see module
    docstring for the exact integer contract)."""
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("raw_len", LongType()),
        StructField("comp_len", LongType()),
        StructField("ratio_q", LongType()),
    ])
    cols = [f.name for f in schema.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows: list[tuple[Any, ...]] = [
                compression_row(i, t, level)
                for i, t in zip(b[id_col], b[text_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(batches, schema)
