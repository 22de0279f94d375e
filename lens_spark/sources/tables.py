"""Parquet-backed table layer with Iceberg-style commit semantics.

The production design is an Iceberg catalog (``df.writeTo(...).append()``,
``MERGE INTO`` keyed on doc_id, snapshot ids for lineage) — the semantic
the reference's batch queue provides is *atomic visible commits* (a bleve
batch flush, engine/engine.go:72-87) and *exactly-once per key* (the
IsIndexed guard, engine.go:124-126). No Iceberg runtime jar ships in this
sandbox, so :class:`LensTable` reproduces those semantics over plain
parquet:

- **atomic commit**: writes land in a new ``snap-<n>`` directory; a
  ``_current`` pointer file is replaced via atomic ``os.replace`` — readers
  never observe a half-written snapshot (Iceberg's metadata-pointer swap,
  scaled down).
- **merge_upsert** (M1/M5): new rows win over existing rows with the same
  key (reference Reindex/last-write-wins, engine_test.go:69-78).
- **delete** (M2/S5): drop rows by key (queue.Item{Val: nil} semantics,
  engine/queue/queue.go:42-44).

The full-rewrite MERGE is the sandbox stand-in; on Iceberg these are
metadata-only/row-delta operations. The interface is what the engine
codes against, so swapping in a real catalog touches only this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class LensTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ---- snapshot pointer -------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def _snap_dir(self, snap: str) -> str:
        return os.path.join(self.path, snap)

    def _commit(self, snap: str) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._pointer())  # atomic visibility flip

    def _next_snap(self) -> str:
        cur = self.current_snapshot()
        n = int(cur.split("-")[1]) + 1 if cur else 0
        return f"snap-{n}"

    # ---- operations -------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        snap = self.current_snapshot()
        if snap is None:
            return None
        return spark.read.parquet(self._snap_dir(snap))

    def overwrite(self, df: DataFrame) -> str:
        snap = self._next_snap()
        df.write.mode("overwrite").parquet(self._snap_dir(snap))
        self._commit(snap)
        return snap

    def append(self, df: DataFrame) -> str:
        cur = self.read(df.sparkSession)
        return self.overwrite(cur.unionByName(df) if cur is not None else df)

    def merge_upsert(self, df: DataFrame, key: str) -> str:
        """MERGE: WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT —
        new rows win (last-write-wins reindex, engine.go:124-126)."""
        cur = self.read(df.sparkSession)
        if cur is None:
            return self.overwrite(df)
        keep = cur.join(df.select(key).distinct(), key, "left_anti")
        return self.overwrite(keep.unionByName(df))

    def delete(self, spark: SparkSession, key: str, keys: list) -> str:
        """Row-level delete by key (queue Val==nil → b.Delete,
        engine.go:82-83)."""
        cur = self.read(spark)
        if cur is None:
            return self.current_snapshot() or self.overwrite(
                spark.createDataFrame([], "doc_id string")
            )
        kdf = spark.createDataFrame([(k,) for k in keys], f"{key} string")
        return self.overwrite(cur.join(kdf, key, "left_anti"))
