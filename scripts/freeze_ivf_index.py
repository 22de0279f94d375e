"""Freeze a small on-disk IVF index fixture (VERDICT r3 #6).

Writes ``tests/fixtures/ivf_index/list_id=K/part-0.parquet`` — the
hive-partitioned layout ``write_ivf_index`` produces — from the sf0.01
embeddings using the SPARK-FREE twin of the trainer
(``ivf_centroids_from_parquet``) and a numpy argmin assignment, so the
fixture is reproducible without a Spark session. The driver row
``ann_ivf_topk_stored`` then exercises the stored-index READ path
(partition-pruned scan + cosine + top-k) in both engines over this one
fixture; the Catalyst assignment path itself is covered by the live
``ann_ivf_topk`` row and tests/test_training_ops.py.

Deterministic: same parquet + same nlist/sample → identical centroids
(rounded literals), identical assignments (ties to lowest index),
id-sorted rows within each list.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_spark.operators.similarity import ivf_centroids_from_parquet

SRC = "/root/testdata/sf0.01/embeddings.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ivf_index",
)
NLIST, SAMPLE = 8, 256


def main() -> None:
    cents = np.array(
        ivf_centroids_from_parquet(SRC, nlist=NLIST, sample=SAMPLE),
        dtype="float64",
    )
    pdf = pd.read_parquet(SRC, columns=["vec_id", "embedding"]).sort_values(
        "vec_id"
    )
    X = np.array([list(v) for v in pdf["embedding"]], dtype="float64")
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # ties → lowest index, like ivf_list_id

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    total = 0
    for k in range(NLIST):
        members = pdf[assign == k]
        part_dir = os.path.join(OUT, f"list_id={k}")
        os.makedirs(part_dir, exist_ok=True)
        members.rename(
            columns={"vec_id": "id", "embedding": "vec"}
        ).to_parquet(os.path.join(part_dir, "part-0.parquet"), index=False)
        total += len(members)
        print(f"list {k}: {len(members)} vectors")
    print(f"wrote {OUT}: {total} vectors in {NLIST} lists")


if __name__ == "__main__":
    main()
