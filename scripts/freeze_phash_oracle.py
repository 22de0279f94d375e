"""Freeze the expected outputs of the perceptual-hash (dHash) operators
to parquet fixtures for the driver correctness gate — the
freeze_multimodal_oracle.py pattern: expected values come from the pure
per-row functions single-threaded (no Spark), and the BRUTE-FORCE
all-pairs Hamming scan is the ground truth the banded distributed
operator must reproduce exactly (pigeonhole banding is full-recall, so
any divergence is a bug, not sampling noise).

Regenerate only when the fixture corpus or the hash intentionally
changes:  python scripts/freeze_phash_oracle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from lens_spark.corpus import gen_phash_media
from lens_spark.operators.multimodal import LONG_MASK, phash_row

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

N_MEDIA = 36
SEED = 11
MAX_HAMMING = 2


def main() -> None:
    rows = [phash_row(r["media_id"], r["payload"])
            for r in gen_phash_media(N_MEDIA, seed=SEED)]
    ph = pd.DataFrame(rows, columns=["media_id", "phash", "error"])
    ph.to_parquet(os.path.join(FIXDIR, "phash_expected.parquet"),
                  index=False)

    ok = [(m, h) for m, h, e in rows if e is None]
    pairs = []
    for i in range(len(ok)):
        for j in range(i + 1, len(ok)):
            (a, ha), (b, hb) = ok[i], ok[j]
            d = bin((ha ^ hb) & LONG_MASK).count("1")
            if d <= MAX_HAMMING:
                lo, hi = sorted((a, b))
                pairs.append((lo, hi, d))
    pp = pd.DataFrame(sorted(pairs), columns=["id_a", "id_b", "hamming"])
    pp["hamming"] = pp["hamming"].astype("int32")
    pp.to_parquet(os.path.join(FIXDIR, "phash_pairs_expected.parquet"),
                  index=False)
    n_err = sum(1 for _, _, e in rows if e is not None)
    print(f"froze {len(ph)} hashes ({n_err} errored), "
          f"{len(pp)} pairs at hamming<={MAX_HAMMING}")


if __name__ == "__main__":
    main()
