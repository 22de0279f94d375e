"""Freeze the expected compression-signal table for the driver
correctness gate: a Spark-free single-threaded pass of
``compression_row`` over the sf0.01 documents table (the
freeze_ivf_index precedent for fixtures derived from the driver
testdata; regenerate if TESTDATA.md says the corpus changed):

    python scripts/freeze_compress_oracle.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pandas as pd

from lens_spark.functions.compress import compression_row

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
SRC = "/root/testdata/sf0.01/documents.parquet"


def main() -> None:
    docs = pd.read_parquet(SRC, columns=["doc_id", "text"])
    rows = [
        compression_row(int(i), t)
        for i, t in zip(docs["doc_id"], docs["text"])
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "raw_len", "comp_len", "ratio_q"]
    ).sort_values("doc_id").reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    out = os.path.join(FIXDIR, "compress_expected.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
