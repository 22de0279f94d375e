"""WARC container source: writer↔parser ground-truth round trip, the
distributed mapInPandas path, the binaryFile reader, quarantine
behavior, and the crawl→extract chain."""
from __future__ import annotations

import gzip
import os

import pandas as pd
import pytest

from lens_spark.sources.warc import (
    expected_warc_rows_df,
    gen_warc,
    iter_warc_records,
    make_warc,
    read_warc,
    warc_records,
    warc_to_documents,
)


def _parse_all(files):
    got = []
    for name, data in files:
        for rec in iter_warc_records(data):
            rec["warc_file"] = name
            got.append(rec)
    return got


def test_parser_matches_writer_ground_truth():
    """Every field of every record — including the deliberate
    truncated-record quarantine row — matches the WRITER's specs, which
    never touch the parser."""
    files, expected = gen_warc(3, 24, 13)
    got = _parse_all(files)
    gdf = (
        expected_warc_rows_df(got)
        .sort_values(["warc_file", "record_offset"])
        .reset_index(drop=True)
    )
    edf = (
        expected_warc_rows_df(expected)
        .sort_values(["warc_file", "record_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gdf, edf)


def test_gzip_member_offsets_are_compressed_offsets():
    """Per-record-gzip offsets follow the CDX convention: the
    COMPRESSED byte position of the record's member, so an
    index-directed reader can range-read one record."""
    files, expected = gen_warc(2, 8, 5)
    name, data = files[1]  # gzip file
    offs = [r["record_offset"] for r in expected if r["warc_file"] == name]
    for off in offs:
        assert data[off:off + 2] == b"\x1f\x8b"
        # a single member starting at the offset decodes to one record
        with gzip.GzipFile(fileobj=__import__("io").BytesIO(data[off:])) \
                as gz:
            plain = gz.read()
        assert plain.startswith(b"WARC/1.1\r\n")


def test_quarantine_resyncs_at_next_member():
    """A corrupt member quarantines ONE row; later members still
    parse (the per-record-gzip recovery property)."""
    specs = [
        {
            "record_type": "resource",
            "record_id": f"<urn:uuid:q-{i}>",
            "warc_date": "2026-01-01T00:00:00Z",
            "target_uri": f"https://x.example/{i}",
            "warc_content_type": "application/octet-stream",
            "block": bytes([i]) * 10,
        }
        for i in range(3)
    ]
    data, offsets, _lengths = make_warc(specs, per_record_gzip=True)
    # corrupt the MIDDLE member's deflate stream (past its header)
    bad = bytearray(data)
    for p in range(offsets[1] + 12, offsets[2] - 9):
        bad[p] ^= 0xFF
    recs = list(iter_warc_records(bytes(bad)))
    types = [r["record_type"] for r in recs]
    assert types.count("resource") >= 1
    assert "invalid" in types
    assert recs[0]["record_type"] == "resource"
    assert any(r["error"] for r in recs)


def test_warc_records_spark_matches_frozen_fixture(spark):
    """The distributed path (Arrow batches, binary transfer, output
    re-batching) reproduces the writer-derived frozen oracle."""
    from pyspark.sql import functions as F

    files, _ = gen_warc(3, 24, 13)
    df = spark.createDataFrame(files, "path string, content binary")
    out = (
        warc_records(df)
        .select(
            "warc_file", "record_offset", "record_length", "record_type",
            F.coalesce("record_id", F.lit("")).alias("record_id"),
            F.coalesce("target_uri", F.lit("")).alias("target_uri"),
            F.coalesce("warc_date", F.lit("")).alias("warc_date"),
            F.coalesce("content_length", F.lit(-1)).alias(
                "content_length"),
            F.coalesce("http_status", F.lit(-1)).cast("long").alias(
                "http_status"),
            F.coalesce("http_content_type", F.lit("")).alias(
                "http_content_type"),
            F.coalesce(F.md5("payload"), F.lit("")).alias("payload_md5"),
            F.coalesce(F.octet_length("payload"), F.lit(-1)).cast(
                "long").alias("payload_len"),
            F.coalesce("error", F.lit("")).alias("error"),
        )
        .orderBy("warc_file", "record_offset")
        .toPandas()
    )
    fix = pd.read_parquet(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "warc_records_expected.parquet")
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), fix.reset_index(drop=True),
        check_dtype=False,
    )


def test_read_warc_binaryfile(spark, tmp_path):
    files, expected = gen_warc(2, 10, 3)
    for name, data in files:
        (tmp_path / name).write_bytes(data)
    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == len(expected)
    by_type = {}
    for r in out:
        by_type[r.record_type] = by_type.get(r.record_type, 0) + 1
    assert by_type.get("warcinfo") == 2
    assert "invalid" in by_type  # the truncated fixture record


def test_cdx_index_and_fetch_roundtrip(spark, tmp_path):
    """The scale lookup path: build the CDX index while parsing, then
    range-read single records back by (file, offset, length) — payload
    digests must match the full parse, and the fetch must read record
    extents, never whole archives."""
    from pyspark.sql import functions as F

    from lens_spark.sources.warc import cdx_index, fetch_warc_records

    files, _ = gen_warc(2, 12, 21)
    for name, data in files:
        (tmp_path / name).write_bytes(data)
    recs = read_warc(spark, str(tmp_path))
    idx = cdx_index(recs)
    idx_rows = idx.collect()
    assert idx_rows and all(
        r.surt and ")" in r.surt and r.record_length > 0
        for r in idx_rows
    )
    fetched = (
        fetch_warc_records(idx)
        .select("record_id", F.md5("payload").alias("digest"))
        .collect()
    )
    want = {
        (r.target_uri, r.payload_digest) for r in idx_rows
    }
    got_ids = {r.record_id for r in fetched}
    full = {
        r.record_id: r for r in recs.filter(
            "record_type = 'response'").collect()
    }
    assert got_ids == set(full)
    digs = {r.record_id: r.digest for r in fetched}
    import hashlib
    for rid, row in full.items():
        assert digs[rid] == hashlib.md5(bytes(row.payload)).hexdigest()
    assert len(want) == len(idx_rows)


def test_warc_to_extract_chain(spark):
    """Crawl → documents(doc_id, spans) → the real extract pipeline:
    html responses get boilerplate-stripped like any table-sourced
    doc."""
    from lens_spark.pipeline import extract

    files, expected = gen_warc(2, 12, 9)
    df = spark.createDataFrame(files, "path string, content binary")
    docs = warc_to_documents(warc_records(df))
    n_ok = sum(
        1 for r in expected
        if r["record_type"] == "response" and r["http_status"] == 200
    )
    assert docs.count() == n_ok
    res = extract(docs)
    rows = res.extracted.collect()
    assert len(rows) == n_ok
    assert all(r.spans and r.spans[0].kind in ("text", "html")
               for r in rows)


def test_warc_to_documents_plan_is_map_only(spark):
    """The adapter fuses into the parse stage: no exchange anywhere."""
    files, _ = gen_warc(1, 6, 2)
    df = spark.createDataFrame(files, "path string, content binary")
    plan = warc_to_documents(
        warc_records(df)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ingest_job_run(spark, tmp_path):
    """The crawl-ingest job end-to-end in-process: CDX + quarantine
    parquet, robots honored from captures INSIDE the crawl, documents
    LensTable upserts on re-ingest."""
    import importlib.util

    from lens_spark.sources.warc import _http_block, make_warc

    spec = importlib.util.spec_from_file_location(
        "ingest_job",
        os.path.join(os.path.dirname(__file__), "..", "jobs",
                     "ingest_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    robots_body = b"User-agent: *\nDisallow: /blocked/\n"
    specs = []

    def resp(i, uri, body, ctype="text/html"):
        specs.append({
            "record_type": "response",
            "record_id": f"<urn:uuid:ing-{i}>",
            "warc_date": "2026-02-01T00:00:00Z",
            "target_uri": uri,
            "warc_content_type": "application/http;msgtype=response",
            "block": _http_block(200, ctype, body),
        })

    resp(0, "https://s.example/robots.txt", robots_body, "text/plain")
    resp(1, "https://s.example/blocked/a", b"<html>a</html>")
    resp(2, "https://s.example/ok/b", b"<html>b</html>")
    resp(3, "https://other.example/c", b"<html>c</html>")
    data, _offs, _lens = make_warc(specs, per_record_gzip=True)
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "c-000.warc.gz").write_bytes(data)

    out = str(tmp_path / "store")
    r = job.run(spark, str(crawl), out, agent="anybot")
    # robots.txt capture itself is a 200 response under /robots.txt —
    # not under /blocked/ — so only record 1 is robots-blocked
    assert r["files"] == 1 and r["records"] == 4
    assert r["robots_blocked"] == 1
    assert r["docs"] == 3  # robots.txt doc + /ok/b + /c
    assert r["quarantined"] == 0
    # re-ingest: upsert, not duplicate; snapshot advances
    r2 = job.run(spark, str(crawl), out, agent="anybot")
    assert r2["docs"] == 3 and r2["snapshot"] != r["snapshot"]
    cdx = spark.read.parquet(f"{out}/cdx")
    assert cdx.count() == 4
    assert {x.surt for x in cdx.collect()} == {
        "example,s)/robots.txt", "example,s)/blocked/a",
        "example,s)/ok/b", "example,other)/c",
    }


# ------------------------------------------------------------- WET export
def test_export_wet_roundtrip_and_determinism(spark, tmp_path):
    """export_wet → read_warc round-trips exactly (ids, uris, text,
    byte lengths), and a re-export is byte-identical (shard md5s)."""
    from lens_spark.sources.warc import export_wet, wet_record_id

    rows = [
        (1, "hello wet world", "https://a.example/x"),
        (2, "", "https://b.example/y"),
        (3, "héllo ünïcode", None),
        (4, None, "https://d.example/z"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, uri string")
    m1 = export_wet(df, str(tmp_path / "one"), "doc_id", "text",
                    uri_col="uri", n_shards=2, seed="7")
    m2 = export_wet(df, str(tmp_path / "two"), "doc_id", "text",
                    uri_col="uri", n_shards=2, seed="7")
    assert m1["rows"] == 4
    assert [s["md5"] for s in m1["shards"]] == [
        s["md5"] for s in m2["shards"]]

    rec = {
        r.record_id: r
        for r in read_warc(
            spark, str(tmp_path / "one" / "data")).collect()
    }
    assert len(rec) == 4
    for doc_id, text, uri in rows:
        rid = wet_record_id(doc_id, "wet:7")
        r = rec[rid]
        assert r.record_type == "conversion"
        want = ("" if text is None else text).encode()
        assert bytes(r.payload) == want
        assert r.content_length == len(want)
        assert r.target_uri == (uri or f"urn:lens:doc:{doc_id}")
        assert r.error is None


def test_export_wet_records_are_cdx_range_readable(spark, tmp_path):
    """WET shards carry CDX-compatible member extents: a single record
    fetched by (file, offset, length) matches the full parse."""
    from pyspark.sql import functions as F

    from lens_spark.sources.warc import cdx_index, fetch_warc_records

    df = spark.createDataFrame(
        [(i, f"doc number {i} body", f"https://h{i % 3}.example/p{i}")
         for i in range(12)],
        "doc_id long, text string, uri string")
    export_wet_dir = str(tmp_path / "wet")
    from lens_spark.sources.warc import export_wet

    export_wet(df, export_wet_dir, "doc_id", "text", uri_col="uri",
               n_shards=2, seed="3")
    recs = read_warc(spark, export_wet_dir + "/data")
    idx = cdx_index(recs.withColumn(
        "record_type", F.lit("response")))  # cdx keeps response rows
    fetched = fetch_warc_records(idx).select("record_id").collect()
    assert {r.record_id for r in fetched} == {
        r.record_id for r in recs.collect()}


def test_cdx_diff_statuses_and_latest_capture(spark):
    from lens_spark.sources.warc import cdx_diff

    cols = "surt string, warc_date string, payload_digest string, " \
           "target_uri string"
    old = spark.createDataFrame([
        ("a", "2026-01-01", "g1", "ua"),      # unchanged
        ("b", "2026-01-01", "g2", "ub"),      # changed
        ("c", "2026-01-01", "g3", "uc"),      # removed
        ("d", "2025-12-01", "stale", "ud"),   # multi-capture: stale…
        ("d", "2026-01-01", "g4", "ud"),      # …latest wins → unchanged
    ], cols)
    new = spark.createDataFrame([
        ("a", "2026-02-01", "g1", "ua"),
        ("b", "2026-02-01", "g2x", "ub"),
        ("d", "2026-02-01", "g4", "ud"),
        ("e", "2026-02-01", "g5", "ue"),      # added
    ], cols)
    got = {r.surt: r for r in cdx_diff(old, new).collect()}
    assert {k: v.status for k, v in got.items()} == {
        "a": "unchanged", "b": "changed", "c": "removed",
        "d": "unchanged", "e": "added"}
    assert got["c"].new_digest == "" and got["e"].old_digest == ""
    assert got["d"].old_digest == "g4"  # latest capture, not the stale
    assert got["e"].target_uri == "ue" and got["c"].target_uri == "uc"


def test_cdx_diff_plan_reuses_key_partitioning(spark):
    """Two groupBys on the key + a full-outer join on the same key:
    exactly 2 shuffles — the join reuses the aggregates' partitioning
    (full outer can never broadcast, so this is the scale shape)."""
    from lens_spark.sources.warc import cdx_diff

    cols = "surt string, warc_date string, payload_digest string, " \
           "target_uri string"
    df = spark.createDataFrame([("a", "d", "g", "u")], cols)
    plan = cdx_diff(df, df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_ingest_job_incremental_since(spark, tmp_path):
    """--since <prior cdx>: a re-crawl where most pages are unchanged
    only MERGEs the added/changed delta; the skip is metered."""
    import importlib.util
    import shutil

    from lens_spark.sources.warc import _http_block, make_warc

    spec = importlib.util.spec_from_file_location(
        "ingest_job2",
        os.path.join(os.path.dirname(__file__), "..", "jobs",
                     "ingest_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    def crawl_bytes(pages):
        specs = []
        for i, (uri, body) in enumerate(pages):
            specs.append({
                "record_type": "response",
                "record_id": f"<urn:uuid:inc-{uri.rsplit('/', 1)[1]}>",
                "warc_date": f"2026-0{i % 2 + 1}-01T00:00:00Z",
                "target_uri": uri,
                "warc_content_type":
                    "application/http;msgtype=response",
                "block": _http_block(200, "text/html", body),
            })
        data, _o, _l = make_warc(specs, per_record_gzip=True)
        return data

    out = str(tmp_path / "store")
    c1 = tmp_path / "crawl1"
    c1.mkdir()
    (c1 / "c.warc.gz").write_bytes(crawl_bytes([
        ("https://s.example/a", b"<html>a</html>"),
        ("https://s.example/b", b"<html>b</html>"),
        ("https://s.example/c", b"<html>c</html>"),
    ]))
    r1 = job.run(spark, str(c1), out, use_robots=False)
    assert r1["docs"] == 3 and r1["unchanged_skipped"] == 0

    prev_cdx = str(tmp_path / "cdx_prev")
    shutil.copytree(f"{out}/cdx", prev_cdx)

    c2 = tmp_path / "crawl2"
    c2.mkdir()
    (c2 / "c.warc.gz").write_bytes(crawl_bytes([
        ("https://s.example/a", b"<html>a</html>"),       # unchanged
        ("https://s.example/b", b"<html>b CHANGED</html>"),
        ("https://s.example/c", b"<html>c</html>"),       # unchanged
        ("https://s.example/d", b"<html>d new</html>"),   # added
    ]))
    r2 = job.run(spark, str(c2), out, use_robots=False, since=prev_cdx)
    assert r2["unchanged_skipped"] == 2          # a and c
    assert r2["docs"] == 4                       # b upserted, d added
    assert r2["snapshot"] != r1["snapshot"]
    # the changed page's new body actually landed
    from lens_spark.sources.tables import LensTable

    t = LensTable(f"{out}/documents").read(spark)
    b = t.filter("doc_id = '<urn:uuid:inc-b>'").collect()[0]
    assert "CHANGED" in b.spans[0].text
