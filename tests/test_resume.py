"""Checkpoint/lineage/resume (FIXTURES.md F6): kill after partial write,
rerun, assert exact same final table — no dupes, no gaps. Plus table-layer
MERGE/delete semantics (reference queue flush + IsIndexed/Reindex)."""

from __future__ import annotations

import pytest

from lens_spark.corpus import docs_to_spark, gen_docs
from lens_spark.operators.resume import filter_pending, run_resumable
from lens_spark.sources.tables import LensTable


@pytest.fixture()
def tables(tmp_path):
    return (LensTable(str(tmp_path / "out")),
            LensTable(str(tmp_path / "ckpt")))


def test_kill_and_resume_no_dupes_no_gaps(spark, tables, tmp_path):
    out, ckpt = tables
    rows = gen_docs(30, seed=7, with_edge_rows=False)
    docs = docs_to_spark(spark, rows)

    # clean full run → ground truth
    truth_out = LensTable(str(tmp_path / "truth"))
    run_resumable(spark, docs, truth_out, LensTable(str(tmp_path / "tc")),
                  "snap-in-0")
    truth = {
        r["doc_id"]: r["spans"]
        for r in truth_out.read(spark).collect()
    }

    # "failure": only half the input got processed before the crash
    half = docs_to_spark(spark, rows[:15])
    n1 = run_resumable(spark, half, out, ckpt, "snap-in-0")
    assert n1 == 15

    # resume with the FULL input: anti-join extracts only the missing docs
    n2 = run_resumable(spark, docs, out, ckpt, "snap-in-0")
    assert n2 == 15

    final = {r["doc_id"]: r["spans"] for r in out.read(spark).collect()}
    assert final.keys() == truth.keys()          # no gaps
    assert len(out.read(spark).collect()) == 30  # no dupes
    for k in truth:
        assert final[k] == truth[k]

    # third run: nothing pending, no-op
    assert run_resumable(spark, docs, out, ckpt, "snap-in-0") == 0

    # lineage recorded per increment with row counts + version
    lin = ckpt.read(spark).collect()
    assert sum(r["doc_count"] for r in lin) == 30
    assert all(r["extractor_version"] for r in lin)
    assert all(r["input_snapshot_id"] == "snap-in-0" for r in lin)


def test_reindex_bypasses_guard(spark, tables):
    out, ckpt = tables
    docs = docs_to_spark(spark, gen_docs(5, seed=9, with_edge_rows=False))
    run_resumable(spark, docs, out, ckpt, "s0")
    # guard skips all (engine.go:124-126)
    assert filter_pending(docs, out.read(spark)).count() == 0
    # reindex=True bypasses; MERGE keeps table at 5 rows (last write wins)
    n = run_resumable(spark, docs, out, ckpt, "s1", reindex=True)
    assert n == 5
    assert out.read(spark).count() == 5


def test_poison_doc_quarantined_once_then_skipped(spark, tmp_path):
    """A doc whose spans ALL fail is never written to the output table;
    without the quarantine anti-join it would re-extract every increment
    (VERDICT r3 #3 — a fixed per-increment tax at 10^12 docs). It must be
    extracted once, skipped on rerun, and retried only under
    reindex=True."""
    out = LensTable(str(tmp_path / "out"))
    ckpt = LensTable(str(tmp_path / "ckpt"))
    quar = LensTable(str(tmp_path / "quar"))
    rows = gen_docs(6, seed=11, with_edge_rows=False)
    poison = {
        "doc_id": "doc-poison",
        # payload sniffs as audio/ogg → unsupported for indexing
        "spans": [{"kind": "audio",
                   "text": "T2dnUwACAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
                           "AAAAAAAAAAAAAAAAAA==",
                   "media_ref": None, "offset": 1}],
    }
    docs = docs_to_spark(spark, rows + [poison])

    n1 = run_resumable(spark, docs, out, ckpt, "s0",
                       quarantine_table=quar)
    assert n1 == 6  # poison doc yields no good spans → not indexed
    q1 = quar.read(spark).collect()
    assert {r["doc_id"] for r in q1} == {"doc-poison"}

    # rerun: poison doc is anti-joined out via the quarantine table —
    # nothing pending, nothing re-extracted, quarantine unchanged
    assert run_resumable(spark, docs, out, ckpt, "s0",
                         quarantine_table=quar) == 0
    assert quar.read(spark).count() == len(q1)

    # reindex=True is the retry override: the poison doc re-extracts
    # (still fails, still quarantined exactly once via the MERGE key)
    n3 = run_resumable(spark, docs, out, ckpt, "s1", reindex=True,
                       quarantine_table=quar)
    assert n3 == 6
    assert quar.read(spark).count() == len(q1)
    assert out.read(spark).count() == 6


def test_table_delete(spark, tmp_path):
    t = LensTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "doc_id string, v int"
    )
    t.overwrite(df)
    t.delete(spark, "doc_id", ["b"])  # queue Val==nil → b.Delete semantics
    assert {r["doc_id"] for r in t.read(spark).collect()} == {"a", "c"}


def test_snapshot_atomicity(spark, tmp_path):
    t = LensTable(str(tmp_path / "t"))
    df1 = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    s1 = t.overwrite(df1)
    df2 = spark.createDataFrame([("a", 2)], "doc_id string, v int")
    s2 = t.overwrite(df2)
    assert s1 != s2 and t.current_snapshot() == s2
    assert t.read(spark).collect()[0]["v"] == 2


def test_merge_is_bucket_pruned(spark, tmp_path):
    """Round-2 scale fix: an increment of K docs rewrites only the
    buckets containing those keys — NOT the whole table (round 1 rewrote
    all N rows per commit)."""
    import json
    import os

    t = LensTable(str(tmp_path / "t"), num_buckets=8)
    base = spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(200)], "doc_id string, v int"
    )
    t.merge_upsert(base, "doc_id")
    man1 = t._manifest()
    assert man1["extra"] == [] and len(man1["buckets"]) == 8
    before = dict(man1["buckets"])

    # single-key increment: at most 1 bucket rewritten, >=7 carried
    # forward by reference (same data dir path in the new manifest)
    t.merge_upsert(
        spark.createDataFrame([("doc-3", 999)], "doc_id string, v int"),
        "doc_id",
    )
    man2 = t._manifest()
    carried = [b for b in man2["buckets"]
               if man2["buckets"][b] == before.get(b)]
    rewritten = [b for b in man2["buckets"]
                 if man2["buckets"][b] != before.get(b)]
    assert len(rewritten) == 1, f"rewrote {rewritten}"
    assert len(carried) == 7

    # contents: last-write-wins, nothing lost
    rows = {r["doc_id"]: r["v"] for r in t.read(spark).collect()}
    assert len(rows) == 200 and rows["doc-3"] == 999

    # GC: commit-time GC keeps the retention window (current+previous);
    # the explicit expire_snapshots admin call reduces to live roots only
    t.expire_snapshots(retain_last=1)
    live_roots = {rel.split("/")[1]
                  for rel in man2["buckets"].values()}
    on_disk = set(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    assert on_disk == live_roots

    # bucket count is a physical property: reopening with a different
    # constructor arg adopts the stored layout
    t2 = LensTable(str(tmp_path / "t"), num_buckets=64)
    assert t2._manifest()["num_buckets"] == 8
    assert t2.read(spark).count() == 200


def test_delete_is_bucket_pruned(spark, tmp_path):
    t = LensTable(str(tmp_path / "t"), num_buckets=8)
    base = spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(100)], "doc_id string, v int"
    )
    t.merge_upsert(base, "doc_id")
    before = dict(t._manifest()["buckets"])
    t.delete(spark, "doc_id", ["doc-7"])
    man = t._manifest()
    rewritten = [b for b in man["buckets"]
                 if man["buckets"][b] != before.get(b)]
    assert len(rewritten) <= 1
    assert t.read(spark).count() == 99


def test_append_is_o_increment_and_compacts_on_merge(spark, tmp_path):
    """append() adds one data dir (no rewrite); a later merge compacts
    the unbucketed history once, after which increments prune."""
    t = LensTable(str(tmp_path / "t"), num_buckets=4)
    df = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    t.append(df)
    t.append(spark.createDataFrame([("b", 2)], "doc_id string, v int"))
    man = t._manifest()
    assert len(man["extra"]) == 2 and not man["buckets"]
    t.merge_upsert(
        spark.createDataFrame([("b", 9)], "doc_id string, v int"),
        "doc_id",
    )
    man2 = t._manifest()
    assert man2["extra"] == []  # compacted to bucketed layout
    rows = {r["doc_id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {"a": 1, "b": 9}


def test_gc_retains_previous_snapshot_for_readers(spark, tmp_path):
    """ADVICE r2: a commit must NOT delete the files an in-flight reader
    of the previous snapshot is scanning. Retention (default 2) keeps
    the previous snapshot's data roots alive through the next commit;
    expire_snapshots(1) is the explicit cleanup."""
    import os

    t = LensTable(str(tmp_path / "t"), num_buckets=4)
    t.merge_upsert(
        spark.createDataFrame([(f"d{i}", i) for i in range(20)],
                              "doc_id string, v int"),
        "doc_id",
    )
    reader = t.read(spark)  # lazily bound to snapshot 0's files
    t.merge_upsert(
        spark.createDataFrame([("d3", 999)], "doc_id string, v int"),
        "doc_id",
    )
    # the pre-commit DataFrame still evaluates — no FileNotFoundException
    assert reader.count() == 20
    # explicit expire reclaims everything outside the newest snapshot
    t.expire_snapshots(retain_last=1)
    man = t._manifest()
    live = {rel.split("/")[1] for rel in man["buckets"].values()}
    on_disk = set(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    assert on_disk == live
    # old manifest metadata removed too, current still readable
    assert not os.path.exists(
        os.path.join(str(tmp_path / "t"), "snap-0.json"))
    assert t.read(spark).count() == 20


def test_iceberg_sql_escaping():
    """Keys containing quotes must not break (or inject into) the
    DELETE statement (ADVICE r2)."""
    from lens_spark.sources.tables import IcebergTable

    assert IcebergTable._sql_str("a'b; DROP TABLE x--") == \
        "'a''b; DROP TABLE x--'"
    assert IcebergTable._sql_str("plain") == "'plain'"


def test_iceberg_gate(spark, tmp_path):
    """No Iceberg jar in the sandbox: the gate must report unavailable
    and open_table must fall back to the parquet LensTable; the MERGE
    statement builder is exercised jar-free."""
    from lens_spark.sources.tables import (
        IcebergTable, iceberg_available, open_table,
    )

    assert not iceberg_available(spark)
    t = open_table(spark, str(tmp_path / "t"))
    assert isinstance(t, LensTable)
    sql = IcebergTable.merge_sql(
        "lens.db.extracted", "doc_id", ["doc_id", "v"], "src"
    )
    assert "MERGE INTO lens.db.extracted t USING src s" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.doc_id = s.doc_id, t.v = s.v" in sql
    assert "WHEN NOT MATCHED THEN INSERT (doc_id, v) VALUES (s.doc_id, s.v)" in sql


def test_compact_plain_preserves_rows(spark, tmp_path):
    """compact(): the rewrite_data_files analogue — N append increments
    collapse to one data dir in a NEW snapshot, rows identical, and the
    previous snapshot's files survive the retention GC (in-flight
    readers undisturbed)."""
    import glob

    t = LensTable(str(tmp_path / "t"))
    for i in range(4):
        t.append(spark.createDataFrame(
            [(f"d{i}-{j}", i) for j in range(3)], "doc_id string, v int"))
    assert t.read_bucket_dirs() == 4
    before = sorted(r["doc_id"] for r in t.read(spark).collect())
    prev_files = t._dirs(t._manifest())
    snap_before = t.current_snapshot()

    snap = t.compact(spark, target_partitions=1)
    assert snap != snap_before
    assert t.read_bucket_dirs() == 1
    after = sorted(r["doc_id"] for r in t.read(spark).collect())
    assert after == before
    # single output file (+ _SUCCESS) — the small-files tax is gone
    new_dir = t._dirs(t._manifest())[0]
    assert len(glob.glob(f"{new_dir}/part-*.parquet")) == 1
    # previous snapshot's data retained (retain_snapshots=2 default)
    for d in prev_files:
        assert glob.glob(f"{d}/part-*.parquet")


def test_compact_bucketed_enables_pruned_merge(spark, tmp_path):
    t = LensTable(str(tmp_path / "t"), num_buckets=8)
    for i in range(3):
        t.append(spark.createDataFrame(
            [(f"d{i}-{j}", i) for j in range(4)], "doc_id string, v int"))
    t.compact(spark, key="doc_id")
    man = t._manifest()
    assert man["extra"] == [] and man["buckets"]
    before = {r["doc_id"]: r["v"] for r in t.read(spark).collect()}
    # a 1-key merge now rewrites only that key's bucket
    dirs_before = dict(man["buckets"])
    t.merge_upsert(
        spark.createDataFrame([("d0-0", 99)], "doc_id string, v int"),
        "doc_id",
    )
    man2 = t._manifest()
    untouched = sum(
        1 for b, rel in man2["buckets"].items()
        if dirs_before.get(b) == rel
    )
    assert untouched >= len(dirs_before) - 1
    after = {r["doc_id"]: r["v"] for r in t.read(spark).collect()}
    before["d0-0"] = 99
    assert after == before


def test_iceberg_compact_sql_shape():
    from lens_spark.sources.tables import IcebergTable

    sql = IcebergTable.compact_sql("lens.db.extracted")
    assert sql == ("CALL lens.system.rewrite_data_files("
                   "table => 'db.extracted')")


def test_time_travel_read(spark, tmp_path):
    """VERSION AS OF over the manifest log: the previous snapshot stays
    byte-readable for retain_snapshots commits; expired ids raise with
    the retained list."""
    t = LensTable(str(tmp_path / "tt"), retain_snapshots=2)
    s0 = t.overwrite(spark.createDataFrame(
        [(1, "a")], "doc_id long, v string"))
    s1 = t.merge_upsert(spark.createDataFrame(
        [(1, "b"), (2, "c")], "doc_id long, v string"), key="doc_id")
    assert t.snapshots() == [s0, s1]
    # current: merged; time travel: the pre-merge version, data intact
    assert {(r.doc_id, r.v) for r in t.read(spark).collect()} == {
        (1, "b"), (2, "c")}
    assert {(r.doc_id, r.v) for r in t.read(spark, snapshot=s0)
            .collect()} == {(1, "a")}
    # a third commit expires s0's data (retention 2) — listed no more,
    # and asking for it raises rather than returning a partial scan
    s2 = t.merge_upsert(spark.createDataFrame(
        [(3, "d")], "doc_id long, v string"), key="doc_id")
    assert t.snapshots() == [s1, s2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="snap-0"):
        t.read(spark, snapshot=s0)
