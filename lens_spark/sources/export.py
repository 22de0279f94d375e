"""Trainer-facing corpus export: sharded JSONL(.gz) + manifest.

Curated training data leaves Spark through a data loader, not a search
index — the lingua franca is sharded JSON-lines (WebDataset/HuggingFace
`load_dataset("json", ...)`-style): one JSON object per line, shards
sized for loader-side parallelism, plus a manifest the loader (and the
audit trail) can trust without re-listing the bucket.

Spark-first design:

- serialization is ``to_json(struct(...))`` — JVM-side, whole-stage
  codegen, no Python in the row path;
- sharding uses the writer's ``maxRecordsPerFile`` (no repartition —
  the task layout is whatever the upstream plan produced; a shard
  boundary is a file roll, not a shuffle);
- the manifest is built from the driver-side file listing (names,
  byte sizes) plus an ``observe`` row count collected DURING the write
  — no post-hoc re-scan of what was just written (at 100 TB a
  verification re-read is a deliberate, separate job, not a tax every
  export pays).

The reference engine has no export tier (its output is the search
index, engine/engine.go) — training-data layer.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, functions as F


def export_jsonl(
    df: DataFrame,
    out_dir: str,
    rows_per_shard: int = 100_000,
    compression: str | None = "gzip",
    columns: list[str] | None = None,
) -> dict:
    """Write ``df`` as sharded JSONL under ``out_dir`` and return the
    manifest dict (also written to ``out_dir/MANIFEST.json``).

    ``rows_per_shard`` bounds shard size via ``maxRecordsPerFile``;
    ``columns`` selects/orders the exported fields (default: all, in
    schema order). Deterministic field order = schema order (``to_json``
    of the struct)."""
    cols = columns if columns is not None else df.columns
    obs = Observation("export_rows")
    out = (
        df.select(
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    writer = (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
    )
    if compression:
        writer = writer.option("compression", compression)
    data_dir = os.path.join(out_dir, "data")
    writer.text(data_dir)
    n_rows = int(obs.get["n"])

    shards = []
    for name in sorted(os.listdir(data_dir)):
        if name.startswith(("_", ".")):
            continue
        p = os.path.join(data_dir, name)
        shards.append({"file": name, "bytes": os.path.getsize(p)})
    manifest = {
        "format": "jsonl",
        "compression": compression or "none",
        "columns": cols,
        "rows": n_rows,
        "rows_per_shard": rows_per_shard,
        "n_shards": len(shards),
        "shards": shards,
        "created_unix": int(time.time()),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
