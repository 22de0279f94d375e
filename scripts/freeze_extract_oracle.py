"""Freeze the pure-Python oracle's rich-extract output to a parquet
fixture for the driver correctness gate.

The Go reference binary is not runnable in-sandbox, so the committed
fixture produced by ``lens_spark.oracle`` (single-threaded reference
semantics, every constant cited back to the Go source) stands in for the
reference's extracted output (SURVEY.md §7.3). The ``extract_full``
entry in ``__spark_entry__.queries()`` runs the REAL distributed pipeline
over the same deterministic corpus and the driver value-hashes both
against this file via DuckDB ``read_parquet``.

Regenerate only when extraction semantics intentionally change:
    python scripts/freeze_extract_oracle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from lens_spark.corpus import gen_docs
from lens_spark.oracle import extract_corpus

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "extract_full_expected.parquet",
)

N_DOCS = 200
SEED = 42


def main() -> None:
    rows = []
    for doc in extract_corpus(gen_docs(N_DOCS, seed=SEED)):
        if not doc["indexed"]:
            continue  # failed magnify is never indexed (v2_util.go:62-65)
        tags_joined = "|".join(doc["tags"])
        for kind, text, media_ref, order in doc["spans"]:
            rows.append({
                "doc_id": doc["doc_id"],
                "ord": order,
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "mime_type": doc["mime_type"],
                "category": doc["category"],
                "tags_joined": tags_joined,
            })
    df = pd.DataFrame(rows).astype({"ord": "int32"})
    df = df.sort_values(["doc_id", "ord"]).reset_index(drop=True)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    df.to_parquet(FIXTURE, index=False)
    print(f"wrote {FIXTURE}: {len(df)} span rows, "
          f"{df.doc_id.nunique()} docs")


if __name__ == "__main__":
    main()
