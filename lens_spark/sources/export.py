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


# --------------------------------------------------------------- MDS
# MosaicML streaming's MDS v2 shard layout (public format,
# mosaicml/streaming base/format/mds):
#   shard file = u32le num_samples
#              | u32le offsets[num_samples+1]   (absolute file positions;
#                offsets[0] = 4 + 4*(n+1))
#              | sample bytes
#   sample     = u32le sizes[variable-size columns, in column order]
#              | datum bytes per column, columns sorted by name
# index.json = {"shards": [per-shard config], "version": 2}
MDS_ENCODERS = {
    "str": lambda v: ("" if v is None else str(v)).encode("utf-8"),
    "bytes": lambda v: b"" if v is None else bytes(v),
    "int": lambda v: int(0 if v is None else v).to_bytes(
        8, "little", signed=True),
}
MDS_SIZES = {"str": None, "bytes": None, "int": 8}


def mds_decode_shard(data: bytes, names, encodings) -> list[dict]:
    """Decode one MDS shard (the reader side of the layout above) —
    used by tests and by the gated real-loader parity check."""
    import struct

    (n,) = struct.unpack_from("<I", data, 0)
    offsets = struct.unpack_from(f"<{n + 1}I", data, 4)
    out = []
    for i in range(n):
        sample = data[offsets[i]:offsets[i + 1]]
        n_var = sum(1 for e in encodings if MDS_SIZES[e] is None)
        sizes = list(struct.unpack_from(f"<{n_var}I", sample, 0))
        pos = 4 * n_var
        row = {}
        for name, enc in zip(names, encodings):
            ln = MDS_SIZES[enc] if MDS_SIZES[enc] is not None \
                else sizes.pop(0)
            datum = sample[pos:pos + ln]
            pos += ln
            if enc == "str":
                row[name] = datum.decode("utf-8")
            elif enc == "int":
                row[name] = int.from_bytes(datum, "little", signed=True)
            else:
                row[name] = datum
        out.append(row)
    return out


def export_mds(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    columns: dict[str, str],
    n_shards: int = 8,
    seed: str = "0",
) -> dict:
    """Write ``df`` as MDS shards + ``index.json`` (the MosaicML
    streaming trainer format, third exporter next to JSONL and
    WebDataset) and return the manifest dict.

    ``columns`` maps exported column → MDS encoding (``str`` /
    ``bytes`` / ``int``); column order in the shard is sorted by name
    (the MDSWriter convention).  Sharding and intra-shard order reuse
    :func:`~lens_spark.operators.mixing.corpus_shuffle`'s md5 rule, so
    re-runs produce BYTE-IDENTICAL shards (no timestamps inside shard
    bytes or index.json; the run stamp lives in our MANIFEST.json
    only).

    Scale shape: one repartition on ``shard`` + sortWithinPartitions
    + one mapInPandas.  A shard's encoded samples are buffered in
    memory before the write because the offset table precedes the data
    — the SAME trade the reference MDSWriter makes — so memory is
    bounded by one shard; size ``n_shards`` for ~1 GB shards at the
    target scale.  The real ``streaming`` loader is pinned by a gated
    test (tests/test_gated_production.py pattern) since the package
    isn't in this container; the layout itself is round-trip-tested by
    our own reader."""
    import hashlib
    import struct

    import pandas as pd

    from lens_spark.operators.mixing import corpus_shuffle

    names = sorted(columns)
    encodings = [columns[c] for c in names]
    for e in encodings:
        if e not in MDS_ENCODERS:
            raise ValueError(f"unsupported MDS encoding: {e}")
    # shards live NEXT TO index.json with plain basenames — the layout
    # the real streaming loader resolves
    data_dir = out_dir
    os.makedirs(data_dir, exist_ok=True)

    addressed = (
        corpus_shuffle(df, id_col, n_shards, seed)
        .select(*names, "shard", "pos")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )

    def write_shards(batches):
        samples: dict[int, list[bytes]] = {}

        def encode(d) -> bytes:
            sizes, data = [], []
            for name, enc in zip(names, encodings):
                v = d[name]
                datum = MDS_ENCODERS[enc](
                    v.item() if hasattr(v, "item") else v
                )
                if MDS_SIZES[enc] is None:
                    sizes.append(len(datum))
                data.append(datum)
            return struct.pack(f"<{len(sizes)}I", *sizes) + b"".join(data)

        def flush(s: int):
            enc_samples = samples.pop(s)
            n = len(enc_samples)
            lens = [len(b) for b in enc_samples]
            first = 4 + 4 * (n + 1)
            offs = [first]
            for ln in lens:
                offs.append(offs[-1] + ln)
            blob = (
                struct.pack("<I", n)
                + struct.pack(f"<{n + 1}I", *offs)
                + b"".join(enc_samples)
            )
            base = f"shard.{s:05d}.mds"
            path = os.path.join(data_dir, base)
            with open(path, "wb") as f:
                f.write(blob)
            return (s, base, n, len(blob),
                    hashlib.md5(blob).hexdigest())

        done = []
        for b in batches:
            for d in b.to_dict("records"):
                samples.setdefault(int(d["shard"]), []).append(encode(d))
        for s in sorted(samples):
            done.append(flush(s))
        if done:
            yield pd.DataFrame(
                done,
                columns=["shard", "file", "samples", "bytes", "md5"],
            )

    shard_rows = sorted(
        (r.asDict() for r in addressed.mapInPandas(
            write_shards,
            "shard int, file string, samples long, bytes long, "
            "md5 string",
        ).collect()),
        key=lambda r: r["shard"],
    )
    sizes = [MDS_SIZES[e] for e in encodings]
    index = {
        "shards": [
            {
                "column_encodings": encodings,
                "column_names": names,
                "column_sizes": sizes,
                "compression": None,
                "format": "mds",
                "hashes": [],
                "raw_data": {
                    "basename": r["file"],
                    "bytes": int(r["bytes"]),
                    "hashes": {},
                },
                "samples": int(r["samples"]),
                "size_limit": None,
                "version": 2,
                "zip_data": None,
            }
            for r in shard_rows
        ],
        "version": 2,
    }
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f, sort_keys=True)
    manifest = {
        "format": "mds",
        "columns": names,
        "encodings": encodings,
        "rows": int(sum(r["samples"] for r in shard_rows)),
        "n_shards_requested": n_shards,
        "n_shards": len(shard_rows),
        "seed": seed,
        "shards": shard_rows,
        "created_unix": int(time.time()),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
