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
