"""WARC (ISO 28500) container source — the canonical web-scale
extraction input (CommonCrawl ships ~64-72k ``.warc.gz`` files per
crawl, one gzip member per record).

The Lens reference ingests content by content-hash only
(v2.go:104-143 pulls one payload per request); a corpus-scale
extraction tier needs the container format those payloads arrive in.
This module turns raw WARC bytes into the repo's document-table shape
so the extract pipeline (operators/extract.py) can run downstream of a
crawl, not only downstream of a pre-split table.

Layout notes for 100 TB:

- Parallelism is PER FILE: ``read_warc`` uses Spark's ``binaryFile``
  source (one row per file, one task per file). A CommonCrawl crawl is
  ~64k files of ~1 GB — file count >> executor count, so task-level
  parallelism is already ample without splitting inside a file.
- Per-record gzip members are NOT splittable mid-file without an
  external index; ``record_offset`` is reported as the COMPRESSED byte
  offset of the record's gzip member (the CDX index convention), so an
  index-directed range reader can later fetch single records without
  this limitation.
- The parser is pure Python but runs Arrow-batched inside
  ``mapInPandas`` with BYTE-BOUNDED output batching (the
  operators/extract.py ``_rebatch`` convention): a 1 GB input file
  never materializes as one giant Arrow batch.
- Malformed records QUARANTINE (``error`` column), never crash the
  job; in per-record-gzip files parsing resynchronizes at the next
  gzip member, so one corrupt record costs one row, not the file.
"""
from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_RECORDS = StructType([
    StructField("warc_file", StringType()),
    StructField("record_offset", LongType()),
    # stored size of the record at its offset: the compressed gzip
    # member length for .warc.gz, the raw record span for plain WARC —
    # together with record_offset this is exactly what a CDX index
    # stores and what fetch_warc_records range-reads
    StructField("record_length", LongType()),
    StructField("record_type", StringType()),
    StructField("record_id", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_length", LongType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("error", StringType()),
])

_COLS = [f.name for f in WARC_RECORDS.fields]

# output batches flush at this many payload bytes (extract.py keeps the
# same bound on its input side)
MAX_BATCH_BYTES = 32 << 20

_GZIP_MAGIC = b"\x1f\x8b"
_HDR_END = b"\r\n\r\n"


class WarcError(ValueError):
    pass


# --------------------------------------------------------------- parse
def _split_gzip_members(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield ``(compressed_offset, decompressed_bytes)`` per gzip
    member.  CommonCrawl writes one WARC record per member; the offset
    is what its CDX index records."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            plain = d.decompress(data[pos:])
            while not d.eof and d.unconsumed_tail:
                plain += d.decompress(d.unconsumed_tail)
        except zlib.error as e:
            raise WarcError(f"corrupt gzip member at {pos}: {e}") from e
        if not d.eof:
            raise WarcError(f"truncated gzip member at {pos}")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: no forward progress
            raise WarcError(f"zero-length gzip member at {pos}")
        yield pos, consumed, plain
        pos += consumed


def _parse_headers(raw: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in raw.split(b"\r\n"):
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:60]!r}")
        headers[name.strip().decode("latin-1").lower()] = (
            value.strip().decode("latin-1")
        )
    return headers


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an ``application/http`` block into (status, content-type,
    payload).  A block without the header terminator is passed through
    whole (CommonCrawl practice — better a raw payload than a dropped
    record)."""
    end = block.find(_HDR_END)
    if end < 0:
        return None, None, block
    head = block[:end].split(b"\r\n")
    status: int | None = None
    ctype: str | None = None
    first = head[0] if head else b""
    if first[:5] == b"HTTP/":
        parts = first.split(None, 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in head[1:]:
        name, sep, value = line.partition(b":")
        if sep and name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
            break
    return status, ctype, block[end + len(_HDR_END):]


def _parse_one(buf: bytes, pos: int) -> tuple[dict[str, Any], int]:
    """Parse one WARC record starting at ``pos``; returns the record
    fields (offset NOT set — the caller knows the external offset) and
    the position just past the record's trailing CRLFs."""
    if buf[pos:pos + 5] != b"WARC/":
        raise WarcError(f"no WARC version line at {pos}")
    hdr_end = buf.find(_HDR_END, pos)
    if hdr_end < 0:
        raise WarcError("unterminated WARC header block")
    version_end = buf.find(b"\r\n", pos)
    headers = _parse_headers(buf[version_end + 2:hdr_end])
    if "content-length" not in headers:
        raise WarcError("missing Content-Length")
    length = int(headers["content-length"])
    body_start = hdr_end + len(_HDR_END)
    block = buf[body_start:body_start + length]
    if len(block) < length:
        raise WarcError(
            f"truncated block: {len(block)} of {length} bytes"
        )
    rtype = headers.get("warc-type", "unknown")
    status: int | None = None
    ctype: str | None = None
    payload = block
    if headers.get("content-type", "").startswith("application/http"):
        status, ctype, payload = _split_http(block)
    rec = {
        "record_type": rtype,
        "record_id": headers.get("warc-record-id"),
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "content_length": length,
        "http_status": status,
        "http_content_type": ctype,
        "payload": payload,
        "error": None,
    }
    nxt = body_start + length
    while buf[nxt:nxt + 2] == b"\r\n":
        nxt += 2
    return rec, nxt


def _quarantine(
    offset: int, err: Exception, length: int | None = None
) -> dict[str, Any]:
    return {
        "record_offset": offset,
        "record_length": length,
        "record_type": "invalid",
        "record_id": None,
        "target_uri": None,
        "warc_date": None,
        "content_length": None,
        "http_status": None,
        "http_content_type": None,
        "payload": None,
        "error": str(err),
    }


def iter_warc_records(data: bytes) -> Iterator[dict[str, Any]]:
    """Pure-Python record iterator over one WARC file's bytes (plain or
    gzip / per-record gzip).  Shared by the distributed path and the
    Spark-free oracle freezer (the image_feature_row convention,
    operators/multimodal.py) so the driver row verifies the Arrow
    plumbing reproduces the local parse byte-for-byte."""
    if data[:2] == _GZIP_MAGIC:
        try:
            for offset, length, plain in _split_gzip_members(data):
                pos = 0
                try:
                    while pos < len(plain):
                        rec, pos = _parse_one(plain, pos)
                        rec["record_offset"] = offset
                        # CDX semantics: the member's compressed length
                        rec["record_length"] = length
                        yield rec
                except WarcError as e:
                    # resync at the next gzip member
                    yield _quarantine(offset, e, length)
        except WarcError as e:
            yield _quarantine(0, e)
        return
    pos = 0
    while pos < len(data):
        start = pos
        try:
            rec, pos = _parse_one(data, pos)
        except WarcError as e:
            # plain concatenation cannot resync reliably — quarantine
            # the tail once and stop
            yield _quarantine(start, e)
            return
        rec["record_offset"] = start
        rec["record_length"] = pos - start
        yield rec


# --------------------------------------------------------------- spark
def warc_records(
    files: DataFrame,
    file_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Explode a binary-files table (one row per WARC file) into the
    :data:`WARC_RECORDS` table.  Arrow-batched; output batches flush at
    :data:`MAX_BATCH_BYTES` so a 1 GB archive never becomes one Arrow
    allocation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict[str, Any]] = []
        acc = 0
        for b in it:
            for name, blob in zip(b[file_col], b[content_col]):
                if blob is None:
                    continue
                for rec in iter_warc_records(bytes(blob)):
                    rec["warc_file"] = name
                    rows.append(rec)
                    acc += len(rec["payload"] or b"")
                    if acc >= MAX_BATCH_BYTES:
                        yield pd.DataFrame(rows, columns=_COLS)
                        rows, acc = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=_COLS)

    return files.select(
        F.col(file_col), F.col(content_col)
    ).mapInPandas(batches, WARC_RECORDS)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc`` / ``*.warc.gz`` files under ``path`` into the
    records table.  One task per file (binaryFile source) — see the
    module docstring for why that is the right granularity at crawl
    scale."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return warc_records(files)


def surt_key(uri) -> F.Column:
    """SURT-style sort key for a URI column (the public CDX(J)
    convention: host labels reversed and comma-joined, then the path) —
    pure Catalyst, reusing functions/urls.py's parser."""
    from lens_spark.functions.urls import url_parse

    p = url_parse(F.col(uri) if isinstance(uri, str) else uri)
    host_rev = F.array_join(
        F.reverse(F.split(F.lower(p["host"]), r"\.")), ","
    )
    return F.concat(host_rev, F.lit(")"), F.lower(p["path"]))


def cdx_index(records: DataFrame) -> DataFrame:
    """Build the CDX-style capture index from a parsed records table:
    ``(surt, warc_date, target_uri, http_status, http_content_type,
    payload_digest, warc_file, record_offset, record_length)`` — the
    exact tuple the public CDXJ format stores per capture, and the
    exact inputs :func:`fetch_warc_records` needs to range-read one
    record out of a 1 GB archive.

    100 TB shape: pure-Catalyst projection over the parse (fuses into
    the same stage — building the index while reading the crawl costs
    zero extra passes); callers typically write it sorted by ``surt``
    so lookups partition-prune."""
    ok = records.filter(
        F.col("error").isNull() & (F.col("record_type") == "response")
    )
    return ok.select(
        surt_key("target_uri").alias("surt"),
        "warc_date",
        "target_uri",
        "http_status",
        "http_content_type",
        F.md5("payload").alias("payload_digest"),
        "warc_file",
        "record_offset",
        "record_length",
    )


def fetch_warc_records(index: DataFrame) -> DataFrame:
    """Index-directed record fetch: given rows carrying ``(warc_file,
    record_offset, record_length)`` (a :func:`cdx_index` selection),
    range-read and parse ONLY those records — never the surrounding
    archive.  This is the lookup path the module docstring promises:
    gzip members are independently decodable, so offset+length is all
    a reader needs.

    100 TB shape: each fetch reads ``record_length`` bytes (KBs), so a
    point lookup over a crawl costs O(selected records), not O(archive
    bytes); rows are pre-sorted within partitions by (file, offset) so
    per-file handles are opened once and seeks are forward-only.  Local
    and ``file:`` paths are supported in-sandbox; on a cluster the same
    open/seek contract is served by the distributed filesystem client.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict[str, Any]] = []
        handle = None
        handle_name: str | None = None
        try:
            for b in it:
                for name, off, ln in zip(
                    b["warc_file"], b["record_offset"],
                    b["record_length"],
                ):
                    path = str(name)
                    if path.startswith("file:"):
                        path = path[5:]
                        while path.startswith("//"):
                            path = path[1:]
                    if handle is None or handle_name != path:
                        if handle is not None:
                            handle.close()
                        handle = open(path, "rb")
                        handle_name = path
                    handle.seek(int(off))
                    chunk = handle.read(int(ln))
                    for rec in iter_warc_records(chunk):
                        # offsets inside the slice are slice-relative;
                        # report archive coordinates
                        rec["record_offset"] = int(off)
                        rec["record_length"] = int(ln)
                        rec["warc_file"] = str(name)
                        rows.append(rec)
                if rows:
                    yield pd.DataFrame(rows, columns=_COLS)
                    rows = []
        finally:
            if handle is not None:
                handle.close()

    return (
        index.select("warc_file", "record_offset", "record_length")
        .sortWithinPartitions("warc_file", "record_offset")
        .mapInPandas(batches, WARC_RECORDS)
    )


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Project parsed WARC records into the authoritative
    ``documents(doc_id, spans)`` input shape (lens_spark/schema.py,
    BASELINE ``input_hint``) so the extract pipeline runs directly
    downstream of a crawl.

    Only successful HTTP response records carry indexable content.
    Span kind follows the served content type: ``text/html`` → html,
    ``application/pdf`` → pdf (base64 text, the IN_SPAN convention),
    ``image/*`` → image (base64), anything else → text with the
    lossless latin-1 decode (the Go ``string(contents)`` semantics,
    operators/extract.py E5).

    100 TB shape: pure Catalyst, map-only, zero shuffles — runs fused
    into the same stage as the WARC parse."""
    ctype = F.coalesce(F.col("http_content_type"), F.lit(""))
    kind = (
        F.when(ctype.startswith("text/html"), F.lit("html"))
        .when(ctype.startswith("application/pdf"), F.lit("pdf"))
        .when(ctype.startswith("image/"), F.lit("image"))
        .otherwise(F.lit("text"))
    )
    text = (
        F.when(kind.isin("pdf", "image"), F.base64("payload"))
        .otherwise(F.decode("payload", "ISO-8859-1"))
    )
    span = F.struct(
        kind.alias("kind"),
        text.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return (
        records.filter(
            (F.col("record_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("error").isNull()
        )
        .select(
            F.col("record_id").alias("doc_id"),
            F.array(span).alias("spans"),
        )
    )


# ----------------------------------------------------- writer/fixtures
def _warc_headers(rec: dict[str, Any], block: bytes) -> bytes:
    out = b"WARC/1.1\r\n"
    pairs = [
        ("WARC-Type", rec["record_type"]),
        ("WARC-Record-ID", rec["record_id"]),
        ("WARC-Date", rec["warc_date"]),
    ]
    if rec.get("target_uri"):
        pairs.append(("WARC-Target-URI", rec["target_uri"]))
    if rec.get("warc_content_type"):
        pairs.append(("Content-Type", rec["warc_content_type"]))
    pairs.append(("Content-Length", str(len(block))))
    for k, v in pairs:
        out += f"{k}: {v}\r\n".encode("latin-1")
    return out + b"\r\n"


def make_warc(
    records: list[dict[str, Any]], per_record_gzip: bool
) -> tuple[bytes, list[int], list[int]]:
    """Serialize records to WARC bytes; returns ``(bytes, offsets,
    lengths)`` with each record's offset/length as the reader reports
    them (compressed member extent when gzipped).  ``records`` entries
    carry ``record_type record_id warc_date [target_uri]
    [warc_content_type] block`` — ``block`` is the full record block
    (HTTP headers included for response records)."""
    out = b""
    offsets: list[int] = []
    lengths: list[int] = []
    for rec in records:
        body = _warc_headers(rec, rec["block"]) + rec["block"] + _HDR_END
        offsets.append(len(out))
        if per_record_gzip:
            buf = io.BytesIO()
            # fixed mtime/filename → deterministic bytes
            with gzip.GzipFile(
                fileobj=buf, mode="wb", mtime=0
            ) as gz:
                gz.write(body)
            out += buf.getvalue()
        else:
            out += body
        lengths.append(len(out) - offsets[-1])
    return out, offsets, lengths


def _http_block(
    status: int, ctype: str, payload: bytes
) -> bytes:
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("latin-1")
    return head + payload


def gen_warc(
    n_files: int = 3, recs_per_file: int = 24, seed: int = 13
) -> tuple[list[tuple[str, bytes]], list[dict[str, Any]]]:
    """Deterministic WARC fixture corpus: returns ``(files,
    expected_rows)`` where the expected rows are derived from the
    WRITER's record specs and offsets — independent of the parser — so
    the driver row pins the full read path against ground truth, not
    against itself.  File 0 is plain WARC, the rest per-record gzip;
    the last gzip file carries one deliberately TRUNCATED record whose
    expected row is the quarantine row."""
    import random

    rng = random.Random(seed)
    files: list[tuple[str, bytes]] = []
    expected: list[dict[str, Any]] = []
    for fi in range(n_files):
        name = f"crawl-{fi:03d}.warc" + ("" if fi == 0 else ".gz")
        specs: list[dict[str, Any]] = []
        rows: list[dict[str, Any]] = []
        info = f"software: lens-spark-fixture/{fi}\r\n".encode()
        specs.append({
            "record_type": "warcinfo",
            "record_id": f"<urn:uuid:{fi:08d}-0000>",
            "warc_date": "2026-01-01T00:00:00Z",
            "warc_content_type": "application/warc-fields",
            "block": info,
        })
        rows.append({
            "record_type": "warcinfo",
            "record_id": f"<urn:uuid:{fi:08d}-0000>",
            "target_uri": None,
            "warc_date": "2026-01-01T00:00:00Z",
            "content_length": len(info),
            "http_status": None,
            "http_content_type": None,
            "payload": info,
            "error": None,
        })
        for ri in range(1, recs_per_file):
            uri = f"https://site-{rng.randrange(40)}.example/p/{ri}"
            date = f"2026-01-{1 + ri % 27:02d}T0{ri % 10}:00:00Z"
            rid = f"<urn:uuid:{fi:08d}-{ri:04d}>"
            kind = rng.randrange(5)
            if kind <= 2:  # response (the common case)
                body = (
                    "<html><body>"
                    + " ".join(
                        f"w{rng.randrange(500)}"
                        for _ in range(rng.randrange(5, 60))
                    )
                    + "</body></html>"
                ).encode()
                status = rng.choice([200, 200, 200, 404, 301])
                block = _http_block(status, "text/html", body)
                specs.append({
                    "record_type": "response", "record_id": rid,
                    "warc_date": date, "target_uri": uri,
                    "warc_content_type":
                        "application/http;msgtype=response",
                    "block": block,
                })
                rows.append({
                    "record_type": "response", "record_id": rid,
                    "target_uri": uri, "warc_date": date,
                    "content_length": len(block),
                    "http_status": status,
                    "http_content_type": "text/html",
                    "payload": body, "error": None,
                })
            elif kind == 3:  # request
                block = (
                    f"GET /p/{ri} HTTP/1.1\r\nHost: x\r\n\r\n"
                ).encode()
                specs.append({
                    "record_type": "request", "record_id": rid,
                    "warc_date": date, "target_uri": uri,
                    "warc_content_type":
                        "application/http;msgtype=request",
                    "block": block,
                })
                rows.append({
                    "record_type": "request", "record_id": rid,
                    "target_uri": uri, "warc_date": date,
                    "content_length": len(block),
                    "http_status": None, "http_content_type": None,
                    "payload": b"", "error": None,
                })
            else:  # resource (opaque binary)
                blob = bytes(
                    rng.randrange(256)
                    for _ in range(rng.randrange(16, 128))
                )
                specs.append({
                    "record_type": "resource", "record_id": rid,
                    "warc_date": date, "target_uri": uri,
                    "warc_content_type": "application/octet-stream",
                    "block": blob,
                })
                rows.append({
                    "record_type": "resource", "record_id": rid,
                    "target_uri": uri, "warc_date": date,
                    "content_length": len(blob),
                    "http_status": None, "http_content_type": None,
                    "payload": blob, "error": None,
                })
        data, offsets, lengths = make_warc(specs, per_record_gzip=fi > 0)
        for row, off, ln in zip(rows, offsets, lengths):
            row["record_offset"] = off
            row["record_length"] = ln
            row["warc_file"] = name
        if fi == n_files - 1:
            # append a truncated record: claim more bytes than we write
            bad = _warc_headers(
                {
                    "record_type": "response",
                    "record_id": f"<urn:uuid:{fi:08d}-bad>",
                    "warc_date": "2026-01-01T00:00:00Z",
                    "target_uri": "https://bad.example/",
                    "warc_content_type":
                        "application/http;msgtype=response",
                    "block": b"x" * 999,
                },
                b"x" * 999,
            ) + b"short"
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bad)
            rows.append({
                "warc_file": name, "record_offset": len(data),
                "record_length": len(buf.getvalue()),
                "record_type": "invalid", "record_id": None,
                "target_uri": None, "warc_date": None,
                "content_length": None, "http_status": None,
                "http_content_type": None, "payload": None,
                "error": "truncated block: 5 of 999 bytes",
            })
            data += buf.getvalue()
        files.append((name, data))
        expected.extend(rows)
    return files, expected


def expected_warc_rows_df(rows: list[dict[str, Any]]) -> pd.DataFrame:
    """Project expected rows to the hashable scalar shape the driver
    row uses (payload → md5 + length; -1 / '' sentinels instead of
    NULLs — the multimodal-freezer convention: nullable ints
    round-trip as float64+NaN through pandas/DuckDB and would break
    the stringified value hash)."""
    out = []
    for r in rows:
        p = r["payload"]
        out.append({
            "warc_file": r["warc_file"],
            "record_offset": int(r["record_offset"]),
            "record_length": (
                -1 if r.get("record_length") is None
                else int(r["record_length"])
            ),
            "record_type": r["record_type"],
            "record_id": r["record_id"] or "",
            "target_uri": r["target_uri"] or "",
            "warc_date": r["warc_date"] or "",
            "content_length": (
                -1 if r["content_length"] is None
                else int(r["content_length"])
            ),
            "http_status": (
                -1 if r["http_status"] is None else int(r["http_status"])
            ),
            "http_content_type": r["http_content_type"] or "",
            "payload_md5": (
                "" if p is None else hashlib.md5(p).hexdigest()
            ),
            "payload_len": -1 if p is None else len(p),
            "error": r["error"] or "",
        })
    df = pd.DataFrame(out)
    for c in ("record_offset", "record_length", "content_length",
              "http_status", "payload_len"):
        df[c] = df[c].astype("int64")
    return df


# ------------------------------------------------------------- WET export
def wet_record_id(doc_id, seed: str = "wet") -> str:
    """Deterministic WET record id: md5(seed || ':' || id) formatted as
    ``urn:uuid:…`` — engine-portable (the DuckDB oracle reproduces it
    from the same md5), so a re-export is byte-identical and a record
    is traceable back to its document id without a custom header."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def export_wet(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
    uri_col: str | None = None,
    n_shards: int = 4,
    seed: str = "0",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> dict:
    """Write extracted text as WET shards (CommonCrawl's conversion
    format: ``WARC-Type: conversion`` records, text/plain payload, one
    gzip member per record) and return the manifest dict (also written
    to ``out_dir/MANIFEST.json``).  Closes the crawl-format loop: what
    :func:`read_warc` ingests, the extract tier can hand back in the
    same container family, and THIS module's own reader round-trips it
    (record offsets/lengths come back CDX-compatible, so
    :func:`fetch_warc_records` can range-read single WET records).

    Determinism: shard membership / order via ``corpus_shuffle`` (md5,
    ``seed``), record ids via :func:`wet_record_id`, gzip members
    mtime-0 (``make_warc``), ``warc_date`` a pinned literal — the
    caller stamps real dates; a re-export is byte-identical.

    Scale shape (the export_webdataset pattern): one repartition on
    shard + sortWithinPartitions + one mapInPandas that APPENDS each
    record's gzip member to its shard file — a shard never
    materializes in memory, and the manifest rows come back through
    the plan (≤ n_shards rows), never a re-scan."""
    from lens_spark.operators.mixing import corpus_shuffle

    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    cols = [id_col, text_col] + ([uri_col] if uri_col else [])
    addressed = (
        corpus_shuffle(df, id_col, n_shards, seed)
        .select(*cols, "shard", "pos")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )
    manifest_schema = (
        "shard int, file string, n_docs long, bytes long, md5 string"
    )
    rid_seed = f"wet:{seed}"

    def write_shards(batches: Iterator[pd.DataFrame]):
        open_files: dict[int, dict] = {}

        def close_shard(s: int):
            st = open_files.pop(s)
            st["f"].close()
            h = hashlib.md5()
            with open(st["path"], "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            return (s, os.path.basename(st["path"]), st["n"],
                    os.path.getsize(st["path"]), h.hexdigest())

        done = []
        for b in batches:
            for d in b.to_dict("records"):
                s = int(d["shard"])
                if s not in open_files:
                    path = os.path.join(
                        data_dir, f"shard-{s:05d}.warc.wet.gz")
                    open_files[s] = {
                        "f": open(path, "wb"), "path": path, "n": 0,
                    }
                text = d[text_col]
                block = ("" if text is None else str(text)).encode()
                uri = (
                    str(d[uri_col]) if uri_col and d[uri_col] is not None
                    else f"urn:lens:doc:{d[id_col]}"
                )
                member, _, _ = make_warc([{
                    "record_type": "conversion",
                    "record_id": wet_record_id(d[id_col], rid_seed),
                    "warc_date": warc_date,
                    "target_uri": uri,
                    "warc_content_type": "text/plain",
                    "block": block,
                }], per_record_gzip=True)
                open_files[s]["f"].write(member)
                open_files[s]["n"] += 1
        for s in sorted(open_files):
            done.append(close_shard(s))
        if done:
            yield pd.DataFrame(
                done, columns=["shard", "file", "n_docs", "bytes", "md5"])

    shard_rows = sorted(
        (r.asDict() for r in
         addressed.mapInPandas(write_shards, manifest_schema).collect()),
        key=lambda r: r["shard"],
    )
    import json as _json
    import time as _time

    manifest = {
        "format": "wet",
        "columns": cols,
        "rows": int(sum(r["n_docs"] for r in shard_rows)),
        "n_shards_requested": n_shards,
        "n_shards": len(shard_rows),
        "seed": seed,
        "warc_date": warc_date,
        "shards": shard_rows,
        "created_unix": int(_time.time()),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        _json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def cdx_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "surt",
    digest_col: str = "payload_digest",
    date_col: str = "warc_date",
    uri_col: str = "target_uri",
) -> DataFrame:
    """Crawl-to-crawl incremental diff over two CDX capture tables:
    one row per ``key_col`` with ``status`` ∈ added / changed /
    unchanged / removed, plus the latest digest on each side (``''``
    when the side lacks the key — the sentinel convention).  This is
    the CommonCrawl-style "what actually changed since the last crawl"
    question, the input to incremental re-extraction (feed the
    added+changed keys to fetch_warc_records → extract, skip the
    unchanged mass — at 100 TB the unchanged mass is most of the
    crawl, and THIS table is what makes skipping it safe).

    Each side may carry multiple captures per key (a URL is often
    captured more than once per crawl); the diff compares the LATEST
    capture per side — max(struct(date, digest)), deterministic on
    date ties.

    100 TB shape: one map-side-combined groupBy per side, then a join
    ON THE SAME KEY — the aggregate's output partitioning is reused,
    so the join adds no third exchange (plan-asserted in
    tests/test_warc.py).  Both sides bucketed by ``key_col`` at write
    time make the whole diff shuffle-free."""
    def latest(df: DataFrame, side: str) -> DataFrame:
        return (
            df.groupBy(F.col(key_col).alias(key_col))
            .agg(
                F.max(
                    F.struct(
                        F.col(date_col).alias("d"),
                        F.col(digest_col).alias("g"),
                        F.col(uri_col).alias("u"),
                    )
                ).alias("x")
            )
            .select(
                key_col,
                F.col("x.g").alias(f"{side}_digest"),
                F.col("x.u").alias(f"{side}_uri"),
                F.lit(1).alias(f"{side}_present"),
            )
        )

    j = latest(old, "old").join(latest(new, "new"), [key_col], "full")
    status = (
        F.when(F.col("old_present").isNull(), F.lit("added"))
        .when(F.col("new_present").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest") == F.col("new_digest"),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        key_col,
        status.alias("status"),
        F.coalesce("old_digest", F.lit("")).alias("old_digest"),
        F.coalesce("new_digest", F.lit("")).alias("new_digest"),
        F.coalesce("new_uri", "old_uri").alias(uri_col),
    )
