"""Derive interleaved spans corpora from the driver-provisioned flat
``documents`` table (TESTDATA.md) — deterministically, with no external
data, per the north rule ("synthesise it deterministically at small scale
for tests and benchmarks").

Two derivations:

- :func:`derive_spans_sqlparity` — pure Catalyst expressions, so the exact
  same derivation is expressible in DuckDB SQL for the correctness oracle
  (used by ``__spark_entry__``'s explode/reassemble query).
- :func:`derive_spans` — the rich corpus for the flagship query and the
  benchmark: real PDF/PNG/HTML payloads built per doc inside an
  Arrow-batched ``mapInPandas`` (seeded by doc_id — same rows every run,
  distributed generation, no driver-side materialization).
"""

from __future__ import annotations

import base64
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lens_spark.corpus import make_html, make_pdf
from lens_spark.functions.hof import transform_u
from lens_spark.extractors.ocr_stub import make_png
from lens_spark.schema import DOCUMENTS


def derive_spans_sqlparity(flat_docs: DataFrame) -> DataFrame:
    """(doc_id:int64, text, ...) → (doc_id, spans) with 1 + doc_id%3
    spans; span g is media when (doc_id+g)%4==0 else a 7-char text slice.
    Every expression has a 1:1 DuckDB equivalent."""
    k = F.lit(1) + (F.col("doc_id") % 3).cast("int")
    spans = transform_u(
        F.sequence(F.lit(1), k),
        lambda g: F.struct(
            F.when((F.col("doc_id") + g) % 4 == 0, F.lit("media"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.when(
                (F.col("doc_id") + g) % 4 != 0,
                F.substring(
                    F.col("text"), F.lit(1) + 7 * (g - 1), F.lit(7)
                ),
            ).alias("text"),
            F.when(
                (F.col("doc_id") + g) % 4 == 0,
                F.concat(F.lit("ref-"), F.col("doc_id").cast("string"),
                         F.lit("-"), g.cast("string")),
            ).alias("media_ref"),
            g.cast("int").alias("offset"),
        ),
    )
    return flat_docs.select("doc_id", spans.alias("spans"))


def _build_spans(doc_id: int, text: str, heavy: bool = False) -> list[tuple]:
    """heavy=True produces realistic document weights (multi-page PDFs,
    long multi-block HTML, KB-scale text) so benchmark runs are
    compute-dominated — the light profile is for fast correctness tests."""
    rng = random.Random(doc_id)  # seeded by doc_id only → deterministic
    n_spans = 1 + rng.randint(0, 5)
    words = text.split() or ["word"]
    spans = []
    offset = 0
    for i in range(n_spans):
        offset += rng.randint(1, 4)
        kind = rng.choices(
            ["text", "html", "pdf", "image", "media"],
            weights=[45, 20, 12, 10, 13],
        )[0]
        payload, media_ref = None, None
        tw = rng.randint(150, 700) if heavy else rng.randint(6, 40)
        piece = " ".join(rng.choice(words) for _ in range(tw))
        if kind == "text":
            payload = piece
        elif kind == "html":
            n_paras = rng.randint(20, 60) if heavy else rng.randint(1, 3)
            payload, _ = make_html(rng, n_paras=n_paras)
        elif kind == "pdf":
            n_pages = rng.randint(4, 12) if heavy else rng.randint(1, 2)
            lines_pp = rng.randint(5, 10) if heavy else 1
            pages = []
            for _ in range(n_pages):
                if rng.random() < 0.3:
                    pages.append({"caption": " ".join(words[:5])})
                else:
                    pages.append({
                        "lines": [
                            " ".join(rng.choice(words) for _ in range(8))
                            for _ in range(lines_pp)
                        ]
                    })
            payload = base64.b64encode(make_pdf(pages)).decode("ascii")
        elif kind == "image":
            cap = " ".join(words[:4]).upper() if rng.random() > 0.15 else None
            payload = base64.b64encode(make_png(caption=cap)).decode("ascii")
        else:
            media_ref = f"ref-{doc_id}-{i}"
        spans.append((kind, payload, media_ref, offset))
    return spans


def derive_spans(flat_docs: DataFrame, heavy: bool = False) -> DataFrame:
    """Rich interleaved corpus: distributed, Arrow-batched, seeded by
    doc_id. Output uses the authoritative DOCUMENTS schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                rows.append(
                    (f"doc-{int(doc_id):09d}",
                     _build_spans(int(doc_id), text or "", heavy))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return flat_docs.select("doc_id", "text").mapInPandas(
        batches, schema=DOCUMENTS
    )
