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


class TestMDS:
    def test_roundtrip(self, spark, docs, tmp_path):
        from lens_spark.sources.export import export_mds, mds_decode_shard

        out = str(tmp_path / "mds")
        man = export_mds(
            docs, out, "doc_id",
            {"doc_id": "int", "text": "str", "source": "str"},
            n_shards=4,
        )
        assert man["rows"] == 250
        assert man["columns"] == ["doc_id", "source", "text"]  # sorted
        idx = json.loads(open(os.path.join(out, "index.json")).read())
        assert idx["version"] == 2
        assert len(idx["shards"]) == man["n_shards"]
        seen = {}
        for s, cfg in zip(man["shards"], idx["shards"]):
            assert cfg["raw_data"]["basename"] == s["file"]
            assert cfg["samples"] == s["samples"]
            p = os.path.join(out, s["file"])
            data = open(p, "rb").read()
            assert len(data) == s["bytes"] == cfg["raw_data"]["bytes"]
            rows = mds_decode_shard(
                data, cfg["column_names"], cfg["column_encodings"])
            assert len(rows) == s["samples"]
            for r in rows:
                seen[r["doc_id"]] = (r["text"], r["source"])
        assert len(seen) == 250
        assert seen[3] == ("text 3", "src0")
        assert seen[7] == ("text 7", "")  # None str -> empty (mds has
        # no null; the encoder documents the sentinel)

    def test_byte_identical_reruns(self, spark, docs, tmp_path):
        from lens_spark.sources.export import export_mds

        cols = {"doc_id": "int", "text": "str"}
        m1 = export_mds(docs, str(tmp_path / "a"), "doc_id", cols,
                        n_shards=4)
        m2 = export_mds(docs, str(tmp_path / "b"), "doc_id", cols,
                        n_shards=4)
        assert [s["md5"] for s in m1["shards"]] == \
            [s["md5"] for s in m2["shards"]]
        ia = open(os.path.join(str(tmp_path / "a"), "index.json")).read()
        ib = open(os.path.join(str(tmp_path / "b"), "index.json")).read()
        assert ia == ib

    def test_layout_offsets(self, spark, docs, tmp_path):
        """Pin the exact byte layout: u32le count, u32le (n+1) absolute
        offsets starting at 4+4*(n+1), samples = u32le var sizes +
        datum bytes in sorted-column order."""
        import struct

        from lens_spark.sources.export import export_mds

        out = str(tmp_path / "one")
        df = spark.createDataFrame(
            [(1, "ab"), (2, "c")], "doc_id long, text string")
        man = export_mds(df, out, "doc_id",
                         {"doc_id": "int", "text": "str"}, n_shards=1)
        data = open(os.path.join(out, man["shards"][0]["file"]),
                    "rb").read()
        (n,) = struct.unpack_from("<I", data, 0)
        assert n == 2
        offs = struct.unpack_from("<3I", data, 4)
        assert offs[0] == 4 + 4 * 3
        assert offs[2] == len(data)
        s0 = data[offs[0]:offs[1]]
        # one variable column (text) -> one u32 size, then int64 doc_id
        # (columns sorted: doc_id first), then text bytes
        (tlen,) = struct.unpack_from("<I", s0, 0)
        did = int.from_bytes(s0[4:12], "little", signed=True)
        assert s0[12:12 + tlen].decode() in ("ab", "c")
        assert did in (1, 2)

    def test_bad_encoding_rejected(self, spark, docs, tmp_path):
        from lens_spark.sources.export import export_mds

        with pytest.raises(ValueError, match="unsupported MDS"):
            export_mds(docs, str(tmp_path / "x"), "doc_id",
                       {"doc_id": "float"}, n_shards=1)
