"""Parquet-backed table layer with Iceberg-style commit semantics.

The production design is an Iceberg catalog (``df.writeTo(...).append()``,
``MERGE INTO`` keyed on doc_id, snapshot ids for lineage) — the semantic
the reference's batch queue provides is *atomic visible commits* (a bleve
batch flush, engine/engine.go:72-87) and *exactly-once per key* (the
IsIndexed guard, engine.go:124-126). No Iceberg runtime jar ships in this
sandbox, so :class:`LensTable` reproduces those semantics over plain
parquet the way Iceberg itself does — **metadata manifests over immutable
data files**:

- **snapshot = manifest**: a ``snap-<n>.json`` file listing the data
  directories that make up the table; the ``_current`` pointer file is
  replaced via atomic ``os.replace`` — readers never observe a
  half-written snapshot (Iceberg's metadata-pointer swap, scaled down).
- **hash-bucketed layout**: keyed tables are stored in ``num_buckets``
  directories by ``pmod(xxhash64(key), B)``. A MERGE or DELETE touching K
  keys rewrites ONLY the buckets containing those keys and re-references
  every other bucket's existing files in the new manifest — an increment
  is O(table/B * affected_buckets), not O(table) (the round-1 version
  rewrote the whole table per commit: O(N²/K) for a backfill in K-doc
  batches). This mirrors Iceberg's partition-pruned copy-on-write MERGE
  and the reference queue's batched flush (engine/queue/queue.go:98-151).
- **append** (lineage/metrics tables): a new data dir is added to the
  manifest — O(increment), no rewrite at all.
- **merge_upsert** (M1/M5): new rows win over existing rows with the same
  key (reference Reindex/last-write-wins, engine_test.go:69-78).
- **delete** (M2/S5): drop rows by key (queue.Item{Val: nil} semantics,
  engine/queue/queue.go:42-44), bucket-pruned like MERGE.
- **GC**: commit-time GC is retention-bounded — data roots referenced by
  the newest ``retain_snapshots`` (default 2: current + previous)
  survive, so in-flight readers of the previous snapshot never lose
  files mid-job; deeper cleanup is the explicit
  :meth:`LensTable.expire_snapshots` admin call (Iceberg's
  ``expire_snapshots`` model: retention-bounded, never a per-commit
  side effect). Single-writer assumption — the reference's index writer
  is single-threaded too (queue.go:46).

When a real Iceberg catalog is configured on the session, use
:func:`iceberg_available` / :class:`IcebergTable` (same interface, backed
by ``writeTo``/``MERGE INTO``) — see the bottom of this module.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def bucket_expr(key: str, num_buckets: int) -> Column:
    """Stable storage bucket of a key value: pmod(xxhash64(str(key)), B).
    Computed by Spark on both the write path and the key-pruning path so
    the mapping is one implementation, never reimplemented driver-side."""
    return F.pmod(
        F.xxhash64(F.col(key).cast("string")), F.lit(num_buckets)
    ).cast("int")


class LensTable:
    def __init__(self, path: str, num_buckets: int = 16,
                 retain_snapshots: int = 2):
        self.path = path
        self.num_buckets = num_buckets
        # snapshots whose data roots survive commit-time GC. 2 = current
        # + previous: an in-flight reader (or a lazily re-evaluated
        # DataFrame derived pre-commit, e.g. run_resumable's
        # done→pending→lineage chain after its own MERGE) still scans
        # the previous snapshot's files; deleting them at commit time
        # (round-2 behavior, ADVICE r2) hands that reader a
        # FileNotFoundException mid-job. Deeper cleanup is an explicit
        # admin op: expire_snapshots() — Iceberg's model exactly.
        self.retain_snapshots = max(1, retain_snapshots)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # ---- snapshot pointer ---------------------------------------------
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

    def _manifest(self, snapshot: str | None = None) -> dict | None:
        snap = snapshot if snapshot is not None else (
            self.current_snapshot()
        )
        if snap is None:
            return None
        try:
            with open(os.path.join(self.path, f"{snap}.json")) as f:
                man = json.load(f)
        except FileNotFoundError:
            if snapshot is None:
                raise  # a dangling _current pointer is corruption
            raise ValueError(
                f"snapshot {snapshot!r} does not exist (retained: "
                f"{self.snapshots()})"
            ) from None
        # adopt the stored bucket count — a table's bucket mapping is a
        # physical property; reopening with a different constructor arg
        # must not silently mis-prune
        self.num_buckets = man["num_buckets"]
        return man

    def snapshots(self) -> list[str]:
        """READABLE snapshot ids, oldest first (Iceberg's snapshot log,
        bounded by ``retain_snapshots``). Manifests older than the data-
        retention window may still exist on disk (commit-time GC keeps
        manifests, drops data roots) but their data is gone — they are
        excluded here."""
        cur = self.current_snapshot()
        if cur is None:
            return []
        seq = int(cur.split("-")[1])
        oldest = max(0, seq - self.retain_snapshots + 1)
        return [
            f"snap-{s}" for s in range(oldest, seq + 1)
            if os.path.exists(os.path.join(self.path, f"snap-{s}.json"))
        ]

    def _next_seq(self) -> int:
        cur = self.current_snapshot()
        return int(cur.split("-")[1]) + 1 if cur else 0

    def _commit(self, manifest: dict) -> str:
        """Write the manifest, atomically flip the pointer, GC data roots
        past the retention window. Returns the snapshot id."""
        snap = f"snap-{manifest['seq']}"
        with open(os.path.join(self.path, f"{snap}.json"), "w") as f:
            json.dump(manifest, f)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._pointer())  # atomic visibility flip
        # commit-time GC is retention-bounded (keeps the last
        # `retain_snapshots` snapshots readable) and never touches
        # manifest files — see expire_snapshots for the admin cleanup
        self._expire(self.retain_snapshots, drop_manifests=False)
        return snap

    def expire_snapshots(self, retain_last: int = 1) -> None:
        """Explicit retention-bounded GC (Iceberg ``expire_snapshots``):
        delete data roots referenced ONLY by snapshots older than the
        newest ``retain_last``, and drop those snapshots' manifest files.
        An admin/maintenance call — never run implicitly per commit, so
        readers of recent snapshots don't lose files mid-job."""
        self._expire(max(1, retain_last), drop_manifests=True)

    def _expire(self, retain: int, drop_manifests: bool) -> None:
        cur = self.current_snapshot()
        if cur is None:
            return
        seq = int(cur.split("-")[1])
        oldest_kept = seq - retain + 1
        referenced: set[str] = set()
        for s in range(max(0, oldest_kept), seq + 1):
            p = os.path.join(self.path, f"snap-{s}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                man = json.load(f)
            referenced |= {
                rel.split("/")[1]
                for rel in list(man["buckets"].values()) + man["extra"]
            }
        data = os.path.join(self.path, "data")
        for root in os.listdir(data):
            if root not in referenced:
                shutil.rmtree(os.path.join(data, root),
                              ignore_errors=True)
        if drop_manifests:
            for fn in os.listdir(self.path):
                if fn.startswith("snap-") and fn.endswith(".json"):
                    if int(fn[5:-5]) < oldest_kept:
                        os.remove(os.path.join(self.path, fn))

    # ---- helpers -------------------------------------------------------
    def _abs(self, rel: str) -> str:
        return os.path.join(self.path, rel)

    def _dirs(self, manifest: dict) -> list[str]:
        return [self._abs(r)
                for r in list(manifest["buckets"].values())
                + manifest["extra"]]

    def _new_manifest(self, buckets: dict, extra: list) -> dict:
        return {
            "seq": self._next_seq(),
            "num_buckets": self.num_buckets,
            "buckets": buckets,
            "extra": extra,
        }

    def _write_plain(self, df: DataFrame) -> str:
        rel = f"data/a{self._next_seq()}-{uuid.uuid4().hex[:8]}"
        df.write.parquet(self._abs(rel))
        return rel

    def _write_bucketed(self, df: DataFrame, key: str) -> dict[str, str]:
        """Write df partitioned by storage bucket; returns {bucket: rel}.
        Reading a single ``_bucket=k`` subdir yields the original schema
        (the partition column lives in the path, not the files)."""
        root = f"data/m{self._next_seq()}-{uuid.uuid4().hex[:8]}"
        (df.withColumn("_bucket", bucket_expr(key, self.num_buckets))
         .write.partitionBy("_bucket").parquet(self._abs(root)))
        out = {}
        for entry in os.listdir(self._abs(root)):
            if entry.startswith("_bucket="):
                out[entry.split("=")[1]] = f"{root}/{entry}"
        return out

    def _affected_buckets(self, keys_df: DataFrame, key: str) -> list[int]:
        rows = (keys_df.select(bucket_expr(key, self.num_buckets)
                               .alias("b")).distinct().collect())
        return sorted(r["b"] for r in rows)

    # ---- operations ----------------------------------------------------
    def read(self, spark: SparkSession,
             snapshot: str | None = None) -> DataFrame | None:
        """Scan the table. ``snapshot`` (e.g. ``"snap-3"``) time-travels
        to a retained older snapshot — Iceberg's ``VERSION AS OF``: a
        manifest is immutable once written and its data roots survive
        for ``retain_snapshots`` commits, so the previous version stays
        readable mid-migration (the in-flight-reader guarantee, now a
        first-class read surface). Unknown/expired ids raise with the
        retained list; see :meth:`snapshots`."""
        if snapshot is not None and snapshot not in self.snapshots():
            # a manifest may still exist past the data-retention window
            # (commit GC keeps manifests, drops data roots) — reading it
            # would be a partial scan, so refuse loudly
            raise ValueError(
                f"snapshot {snapshot!r} is not readable (retained: "
                f"{self.snapshots()})"
            )
        man = self._manifest(snapshot)
        if man is None:
            return None
        dirs = self._dirs(man)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_bucket_dirs(self) -> int:
        """Number of live data directories (test/diagnostic surface)."""
        man = self._manifest()
        return 0 if man is None else len(self._dirs(man))

    def read_for_keys(self, spark: SparkSession, keys_df: DataFrame,
                      key: str) -> DataFrame | None:
        """Bucket-pruned point read: scan ONLY the data dirs whose
        bucket can contain one of ``keys_df[key]`` (plus any
        unbucketed ``extra`` dirs from overwrite/append history).
        Rows are NOT filtered to the keys — callers join/filter as
        their plan needs; the win is skipping the other buckets'
        FILES entirely (the merge_upsert pruning, exposed as a read
        surface — what an incremental rollup/maintenance job needs to
        stay O(increment))."""
        man = self._manifest()
        if man is None:
            return None
        affected = set(self._affected_buckets(keys_df, key))
        dirs = [self._abs(r) for b, r in man["buckets"].items()
                if int(b) in affected]
        dirs += [self._abs(r) for r in man["extra"]]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def overwrite(self, df: DataFrame) -> str:
        return self._commit(self._new_manifest({}, [self._write_plain(df)]))

    def append(self, df: DataFrame) -> str:
        """O(increment): add a data dir, re-reference everything else."""
        man = self._manifest()
        buckets = dict(man["buckets"]) if man else {}
        extra = list(man["extra"]) if man else []
        extra.append(self._write_plain(df))
        return self._commit(self._new_manifest(buckets, extra))

    def merge_upsert(self, df: DataFrame, key: str) -> str:
        """MERGE: WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT —
        new rows win (last-write-wins reindex, engine.go:124-126).
        Bucket-pruned: only buckets containing incoming keys are read and
        rewritten; all other buckets are carried by reference."""
        spark = df.sparkSession
        man = self._manifest()
        if man is None:
            return self._commit(
                self._new_manifest(self._write_bucketed(df, key), [])
            )
        if man["extra"]:
            # unbucketed data present (overwrite()/append() history):
            # one-time compaction into the bucketed layout, then all
            # subsequent increments prune
            cur = spark.read.parquet(*self._dirs(man))
            keep = cur.join(df.select(key).distinct(), key, "left_anti")
            return self._commit(self._new_manifest(
                self._write_bucketed(keep.unionByName(df), key), []
            ))
        affected = self._affected_buckets(df, key)
        old_dirs = [man["buckets"][str(b)] for b in affected
                    if str(b) in man["buckets"]]
        if old_dirs:
            old = spark.read.parquet(*[self._abs(r) for r in old_dirs])
            keep = old.join(df.select(key).distinct(), key, "left_anti")
            merged = keep.unionByName(df)
        else:
            merged = df
        written = self._write_bucketed(merged, key)
        buckets = {b: rel for b, rel in man["buckets"].items()
                   if int(b) not in set(affected)}
        buckets.update(written)
        return self._commit(self._new_manifest(buckets, []))

    def delete(self, spark: SparkSession, key: str, keys: list) -> str:
        """Row-level delete by key (queue Val==nil → b.Delete,
        engine.go:82-83) — bucket-pruned like merge_upsert."""
        man = self._manifest()
        if man is None:
            return self.overwrite(
                spark.createDataFrame([], f"{key} string")
            )
        kdf = spark.createDataFrame([(k,) for k in keys], f"{key} string")
        if man["extra"]:
            cur = spark.read.parquet(*self._dirs(man))
            remaining = cur.join(kdf, key, "left_anti")
            return self._commit(self._new_manifest(
                self._write_bucketed(remaining, key), []
            ))
        affected = self._affected_buckets(kdf, key)
        old_dirs = [man["buckets"][str(b)] for b in affected
                    if str(b) in man["buckets"]]
        buckets = {b: rel for b, rel in man["buckets"].items()
                   if int(b) not in set(affected)}
        if old_dirs:
            old = spark.read.parquet(*[self._abs(r) for r in old_dirs])
            remaining = old.join(kdf, key, "left_anti")
            buckets.update(self._write_bucketed(remaining, key))
        return self._commit(self._new_manifest(buckets, []))

    def compact(self, spark: SparkSession, key: str | None = None,
                target_partitions: int | None = None) -> str | None:
        """Maintenance: rewrite the table's live data into one fresh
        layout and commit it as a new snapshot — Iceberg's
        ``rewrite_data_files`` (bin-packing compaction). An append-heavy
        table accumulates one data dir per increment (each with its own
        small files); at scan time that is many tiny parquet footers and
        row groups — the classic small-files tax. Row-identical by
        construction; the previous snapshot stays readable under the
        retention GC, so in-flight readers are undisturbed
        (single-writer assumption, same as every other commit here).

        ``key`` rewrites into the hash-bucketed layout (subsequent
        merge/delete increments prune); otherwise a plain layout,
        coalesced to ``target_partitions`` files when given.
        """
        man = self._manifest()
        if man is None:
            return None
        cur = spark.read.parquet(*self._dirs(man))
        if key is not None:
            return self._commit(
                self._new_manifest(self._write_bucketed(cur, key), [])
            )
        if target_partitions is not None:
            cur = cur.repartition(target_partitions)
        return self._commit(self._new_manifest({}, [self._write_plain(cur)]))


# --------------------------------------------------------------- Iceberg
def iceberg_available(spark: SparkSession,
                      catalog: str = "lens") -> bool:
    """True when an Iceberg catalog named `catalog` is configured on the
    session (the runtime jar + catalog conf are present). The sandbox
    ships no Iceberg jar, so this is False here and the parquet
    LensTable is used; on a production session with
    ``spark.sql.catalog.lens = org.apache.iceberg.spark.SparkCatalog``
    the IcebergTable below takes over — same interface, real MERGE."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:  # the conf may be set while the jar is absent — probe the class
        spark._jvm.java.lang.Class.forName(impl)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


class IcebergTable:
    """LensTable interface over a real Iceberg catalog table.

    merge_upsert → ``MERGE INTO`` (row-delta, metadata-pruned by Iceberg
    itself); append → ``writeTo().append()``; delete → SQL DELETE;
    snapshot ids come from the table's Iceberg metadata. Only constructed
    when :func:`iceberg_available` — tests exercise the statement
    construction; execution requires the runtime jar
    (tests/test_resume.py::test_iceberg_gate)."""

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.identifier)

    def current_snapshot(self) -> str | None:
        if not self.exists():
            return None
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0]) if row else None

    def read(self, spark: SparkSession,
             snapshot: str | None = None) -> DataFrame | None:
        """Scan; ``snapshot`` (an Iceberg snapshot id string) time-
        travels via the DSv2 ``snapshot-id`` read option — the real
        ``VERSION AS OF``, mirroring LensTable.read(snapshot=)."""
        if not self.exists():
            return None
        if snapshot is not None:
            return (
                spark.read.format("iceberg")
                .option("snapshot-id", snapshot)
                .load(self.identifier)
            )
        return spark.read.table(self.identifier)

    def overwrite(self, df: DataFrame) -> str | None:
        df.writeTo(self.identifier).createOrReplace()
        return self.current_snapshot()

    def append(self, df: DataFrame) -> str | None:
        if not self.exists():
            return self.overwrite(df)
        df.writeTo(self.identifier).append()
        return self.current_snapshot()

    @staticmethod
    def merge_sql(identifier: str, key: str, cols: list[str],
                  source_view: str) -> str:
        """The MERGE statement (exposed for jar-less testing)."""
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols)
        names = ", ".join(cols)
        vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {identifier} t USING {source_view} s "
            f"ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"
        )

    def merge_upsert(self, df: DataFrame, key: str) -> str | None:
        if not self.exists():
            return self.overwrite(df)
        view = f"_lens_merge_src_{uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                self.merge_sql(self.identifier, key, df.columns, view)
            )
        finally:
            self.spark.catalog.dropTempView(view)
        return self.current_snapshot()

    @staticmethod
    def _sql_str(v: str) -> str:
        """SQL string literal with quotes escaped — doc_ids are arbitrary
        non-whitespace strings under the default key contract, so an
        unescaped quote would break (or inject into) the statement."""
        return "'" + str(v).replace("'", "''") + "'"

    def delete(self, spark: SparkSession, key: str, keys: list
               ) -> str | None:
        in_list = ", ".join(self._sql_str(k) for k in keys)
        spark.sql(
            f"DELETE FROM {self.identifier} WHERE {key} IN ({in_list})"
        )
        return self.current_snapshot()

    @staticmethod
    def compact_sql(identifier: str) -> str:
        """The rewrite_data_files CALL (exposed for jar-less testing):
        Iceberg's bin-packing small-file compaction procedure."""
        catalog, table = identifier.split(".", 1)
        return (
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{table}')"
        )

    def compact(self, spark: SparkSession, key: str | None = None,
                target_partitions: int | None = None) -> str | None:
        """Iceberg-native compaction via the rewrite_data_files
        procedure (``key``/``target_partitions`` are LensTable-layout
        knobs with no Iceberg analogue here — binning is the
        procedure's own job)."""
        spark.sql(self.compact_sql(self.identifier))
        return self.current_snapshot()


def open_table(spark: SparkSession, path_or_identifier: str,
               num_buckets: int = 16):
    """S6 open-or-create dispatch: IcebergTable when a catalog is live,
    parquet LensTable otherwise (engine/engine.go:47-63 analogue)."""
    if "." in path_or_identifier and iceberg_available(
        spark, path_or_identifier.split(".")[0]
    ):
        return IcebergTable(spark, path_or_identifier)
    return LensTable(path_or_identifier, num_buckets=num_buckets)
