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


def export_webdataset(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
    n_shards: int = 8,
    seed: str = "0",
    meta_cols: list[str] | None = None,
) -> dict:
    """Write ``df`` as WebDataset-style tar shards (the other trainer
    lingua franca: one ``<key>.txt`` + ``<key>.json`` member pair per
    sample, keys zero-padded so tar order is sample order) and return
    the manifest dict (also written to ``out_dir/MANIFEST.json``).

    Built on :func:`~lens_spark.operators.mixing.corpus_shuffle`, so
    shard membership and intra-shard order are md5-deterministic:
    re-running the export produces BYTE-IDENTICAL tars (tar metadata is
    pinned — mtime 0, uid/gid 0 — and the sample JSON is sort_keys).

    Scale shape: one repartition on ``shard`` + sortWithinPartitions
    ((shard, pos)) + one mapInPandas that STREAMS Arrow batches into
    per-shard tar files opened lazily — a shard is never materialized
    in memory, so shard size is bounded by disk, not RAM (hash
    collisions may route two shards through one task; each still gets
    its own tar, still in pos order). Size ``n_shards`` to the loader
    convention (~1 GB/tar at 100 TB ⇒ ~100k shards). Writes land on
    executor-visible storage: ``out_dir`` must be shared (object store
    / NFS) on a real cluster; the manifest rows come back through the
    plan (n_shards rows, bounded), never a re-scan."""
    import hashlib
    import tarfile

    import pandas as pd

    from lens_spark.operators.mixing import corpus_shuffle

    meta_cols = meta_cols or []
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    addressed = (
        corpus_shuffle(df, id_col, n_shards, seed)
        .select(id_col, text_col, *meta_cols, "shard", "pos")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )

    manifest_schema = (
        "shard int, file string, n_docs long, bytes long, md5 string"
    )

    def write_tars(batches):
        open_tars: dict[int, dict] = {}

        def close_shard(s: int):
            st = open_tars.pop(s)
            st["tar"].close()
            h = hashlib.md5()
            with open(st["path"], "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            return (s, os.path.basename(st["path"]), st["n"],
                    os.path.getsize(st["path"]), h.hexdigest())

        def add(tar, name: str, payload: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            import io

            tar.addfile(info, io.BytesIO(payload))

        done = []
        for b in batches:
            # to_dict (not itertuples): itertuples positional-renames
            # any column that isn't a valid Python identifier
            for d in b.to_dict("records"):
                s = int(d["shard"])
                if s not in open_tars:
                    path = os.path.join(
                        data_dir, f"shard-{s:05d}.tar")
                    open_tars[s] = {
                        "tar": tarfile.open(path, "w"),
                        "path": path, "n": 0,
                    }
                key = f"{d['pos']:09d}"
                text = d[text_col]

                def _py(v):
                    # numpy scalars → native (json.dumps can't take
                    # np.int64, and default=str would stringify ids)
                    return v.item() if hasattr(v, "item") else v

                meta = {"__id__": _py(d[id_col])}
                meta.update({c: _py(d[c]) for c in meta_cols})
                add(open_tars[s]["tar"], f"{key}.txt",
                    ("" if text is None else str(text)).encode())
                add(open_tars[s]["tar"], f"{key}.json",
                    json.dumps(meta, sort_keys=True,
                               ensure_ascii=False, default=str).encode())
                open_tars[s]["n"] += 1
        for s in sorted(open_tars):
            done.append(close_shard(s))
        if done:
            yield pd.DataFrame(
                done, columns=["shard", "file", "n_docs", "bytes", "md5"])

    shard_rows = sorted(
        (r.asDict() for r in
         addressed.mapInPandas(write_tars, manifest_schema).collect()),
        key=lambda r: r["shard"],
    )
    manifest = {
        "format": "webdataset",
        "columns": [id_col, text_col, *meta_cols],
        "rows": int(sum(r["n_docs"] for r in shard_rows)),
        "n_shards_requested": n_shards,
        "n_shards": len(shard_rows),
        "seed": seed,
        "shards": shard_rows,
        "created_unix": int(time.time()),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
