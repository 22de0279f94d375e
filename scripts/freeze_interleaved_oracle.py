"""Freeze the expected interleaved-pack table for the driver gate.

Input is the ALREADY-FROZEN extract oracle fixture
(extract_full_expected.parquet — reference-semantics spans, pure
Python, scripts/freeze_extract_oracle.py), so this freezer never runs
Spark: group the flattened span rows back per doc (ord order), run the
pure ``pack_interleaved_rows``, write the expected chunks.

    python scripts/freeze_interleaved_oracle.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pandas as pd

from lens_spark.operators.pack import pack_interleaved_rows

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
MAX_TOKENS = 64
MEDIA_COST = 1


def main() -> None:
    src = pd.read_parquet(
        os.path.join(FIXDIR, "extract_full_expected.parquet")
    )
    rows = []
    for doc_id, g in src.sort_values(["doc_id", "ord"]).groupby(
        "doc_id", sort=True
    ):
        spans = [
            {
                "kind": k,
                # parquet nulls surface as NaN in pandas; the Spark
                # side sees real Nones — normalize
                "text": t if pd.notnull(t) else None,
                "media_ref": m if pd.notnull(m) else None,
            }
            for k, t, m in zip(g["kind"], g["text"], g["media_ref"])
        ]
        for (did, cid, n_tok, n_med, text, refs) in \
                pack_interleaved_rows(doc_id, spans, MAX_TOKENS,
                                      MEDIA_COST):
            rows.append({
                "doc_id": did,
                "chunk_id": cid,
                "n_tokens": n_tok,
                "n_media": n_med,
                "text": text,
                "refs_joined": "|".join(refs),
            })
    df = pd.DataFrame(rows).sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)
    for c in ("chunk_id", "n_tokens", "n_media"):
        df[c] = df[c].astype("int64")
    out = os.path.join(FIXDIR, "interleaved_pack_expected.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
