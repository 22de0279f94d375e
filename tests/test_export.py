"""JSONL trainer export (sources/export.py): roundtrip, sharding,
manifest integrity."""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"text {i}", None if i % 7 == 0 else f"src{i % 3}")
        for i in range(250)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_roundtrip_and_manifest(spark, docs, tmp_path):
    from lens_spark.sources.export import export_jsonl

    out = str(tmp_path / "exp")
    man = export_jsonl(docs, out, rows_per_shard=60)
    assert man["rows"] == 250
    assert man["columns"] == ["doc_id", "text", "source"]
    # manifest matches the filesystem
    files = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{out}/data/*")
        if not os.path.basename(p).startswith(("_", "."))
    )
    assert [s["file"] for s in man["shards"]] == files
    for s in man["shards"]:
        assert s["bytes"] == os.path.getsize(f"{out}/data/{s['file']}")
    assert json.load(open(f"{out}/MANIFEST.json"))["rows"] == 250
    # every row round-trips through an independent JSON reader (duckdb
    # reads .gz transparently); to_json drops null fields -> source
    # comes back NULL for the i%7 rows
    got = duckdb.sql(
        f"select doc_id, text, source from read_json('{out}/data/*.gz',"
        " format='newline_delimited',"
        " columns={'doc_id':'bigint','text':'varchar','source':'varchar'})"
        " order by doc_id"
    ).fetchall()
    want = sorted(
        (r["doc_id"], r["text"], r["source"]) for r in docs.collect()
    )
    assert got == [tuple(w) for w in want]


def test_shard_size_bound(spark, docs, tmp_path):
    from lens_spark.sources.export import export_jsonl

    out = str(tmp_path / "exp2")
    man = export_jsonl(docs, out, rows_per_shard=60, compression=None)
    # no shard exceeds the bound (files may be smaller: task boundaries
    # also roll shards)
    for s in man["shards"]:
        n = sum(1 for _ in open(f"{out}/data/{s['file']}"))
        assert n <= 60
    total = sum(
        sum(1 for _ in open(f"{out}/data/{s['file']}"))
        for s in man["shards"]
    )
    assert total == 250


def test_column_subset(spark, docs, tmp_path):
    from lens_spark.sources.export import export_jsonl

    out = str(tmp_path / "exp3")
    man = export_jsonl(
        docs, out, rows_per_shard=1000, compression=None,
        columns=["doc_id", "source"],
    )
    assert man["columns"] == ["doc_id", "source"]
    line = open(
        f"{out}/data/{man['shards'][0]['file']}"
    ).readline()
    obj = json.loads(line)
    assert set(obj) <= {"doc_id", "source"} and "text" not in obj
