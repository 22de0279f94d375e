"""Freeze the expected BPE outputs (merge table + per-doc tokenization
digest) to parquet fixtures for the driver correctness gate — the
extract_full / multimodal pattern: the expected values come from the
single-process reference twins (py_learn_bpe / py_apply_bpe, pure
Python, no Spark), the driver rows run the REAL distributed operators
(vocab-table merge loop, Arrow-batched application) on the same corpus.
A value-hash match proves the distributed formulation reproduces the
sequential algorithm exactly.

Corpus = /root/testdata/sf0.01/documents.parquet (the scale the driver
compares at), N_MERGES = 40, min_count = 2.

Regenerate only when the corpus or the BPE semantics intentionally
change:  python scripts/freeze_bpe_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pandas as pd

from lens_spark.operators.bpe import py_apply_bpe, py_learn_bpe

SF_DOCS = "/root/testdata/sf0.01/documents.parquet"
FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
N_MERGES = 40
MIN_COUNT = 2


def main() -> None:
    docs = pd.read_parquet(SF_DOCS, columns=["doc_id", "text"])
    merges = py_learn_bpe(
        docs["text"].tolist(), n_merges=N_MERGES, min_count=MIN_COUNT
    )
    pd.DataFrame(
        {
            "rank": range(len(merges)),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "freq": [m[2] for m in merges],
        }
    ).to_parquet(os.path.join(FIXDIR, "bpe_merges_expected.parquet"))

    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = py_apply_bpe(text, merges)
        rows.append(
            {
                "doc_id": int(doc_id),
                "n_tok": len(toks),
                "toks_md5": hashlib.md5(
                    "|".join(toks).encode("utf-8")
                ).hexdigest(),
            }
        )
    pd.DataFrame(rows).to_parquet(
        os.path.join(FIXDIR, "bpe_tokens_expected.parquet")
    )
    print(f"froze {len(merges)} merges + {len(rows)} doc digests")


if __name__ == "__main__":
    main()
