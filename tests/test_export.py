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


class TestWebdataset:
    def test_roundtrip(self, spark, docs, tmp_path):
        import tarfile

        from lens_spark.sources.export import export_webdataset

        out = str(tmp_path / "wds")
        man = export_webdataset(
            docs, out, "doc_id", "text", n_shards=4,
            meta_cols=["source"],
        )
        assert man["rows"] == 250
        assert man["n_shards"] == 4
        seen = {}
        for s in man["shards"]:
            p = os.path.join(out, "data", s["file"])
            assert os.path.getsize(p) == s["bytes"]
            with tarfile.open(p) as t:
                names = t.getnames()
                # member pairs, tar order == pos order
                keys = [n[:-4] for n in names if n.endswith(".txt")]
                assert keys == sorted(keys)
                assert len(names) == 2 * s["n_docs"]
                for k in keys:
                    txt = t.extractfile(f"{k}.txt").read().decode()
                    meta = json.loads(
                        t.extractfile(f"{k}.json").read())
                    seen[meta["__id__"]] = (txt, meta.get("source"))
        assert len(seen) == 250
        assert seen[3] == ("text 3", "src0")
        assert seen[7] == ("text 7", None)  # null meta survives

    def test_byte_identical_reruns(self, spark, docs, tmp_path):
        from lens_spark.sources.export import export_webdataset

        m1 = export_webdataset(
            docs, str(tmp_path / "a"), "doc_id", "text", n_shards=4)
        m2 = export_webdataset(
            docs, str(tmp_path / "b"), "doc_id", "text", n_shards=4)
        assert [s["md5"] for s in m1["shards"]] == \
            [s["md5"] for s in m2["shards"]]
        # a different seed reshuffles (different bytes, same rows)
        m3 = export_webdataset(
            docs, str(tmp_path / "c"), "doc_id", "text",
            n_shards=4, seed="epoch1")
        assert m3["rows"] == m1["rows"]
        assert [s["md5"] for s in m3["shards"]] != \
            [s["md5"] for s in m1["shards"]]
