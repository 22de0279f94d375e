"""Mime-sniff unit table (reference v2_util.go:42-71 semantics via Go
http.DetectContentType; fixtures per FIXTURES.md F3)."""

from __future__ import annotations

import pandas as pd
import pytest

from lens_spark.functions.mime import sniff_bytes, sniff_series

CASES = [
    (b"%PDF-1.4 blah", "application/pdf"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"GIF89a....", "image/gif"),
    (b"GIF87a....", "image/gif"),
    (b"BM....", "image/bmp"),
    (b"<!DOCTYPE html><html>", "text/html; charset=utf-8"),
    (b"  \t\n<html><body>", "text/html; charset=utf-8"),
    (b"<HTML>...", "text/html; charset=utf-8"),
    (b"<p>para", "text/html; charset=utf-8"),
    (b"<P CLASS=x>", "text/html; charset=utf-8"),
    (b"<!-- comment -->", "text/html; charset=utf-8"),
    (b"<?xml version='1.0'?>", "text/xml; charset=utf-8"),
    (b"plain old text", "text/plain; charset=utf-8"),
    (b"", "text/plain; charset=utf-8"),
    (b"\xef\xbb\xbfBOM text", "text/plain; charset=utf-8"),
    (b"\xfe\xff\x00T", "text/plain; charset=utf-16be"),
    (b"\xff\xfeT\x00", "text/plain; charset=utf-16le"),
    (b"OggS\x00\x02", "application/ogg"),
    (b"ID3\x03\x00", "audio/mpeg"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt", "audio/wave"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "video/avi"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8", "image/webp"),
    (b"\x1f\x8b\x08gz", "application/x-gzip"),
    (b"PK\x03\x04zip", "application/zip"),
    (b"\x00\x00\x01\x00ico", "image/x-icon"),
    (b"\x1aE\xdf\xa3webm", "video/webm"),
    (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
    (b"\x00\x01\x02\x03binary\x00garbage", "application/octet-stream"),
    # not-quite-HTML: sig without ' ' or '>' terminator falls through
    (b"<htmlx>", "text/plain; charset=utf-8"),
]


@pytest.mark.parametrize("content,expected", CASES)
def test_sniff_scalar(content, expected):
    assert sniff_bytes(content) == expected


def test_sniff_vectorized_matches_scalar():
    heads = pd.Series([c[: 512].decode("latin-1") for c, _ in CASES])
    got = sniff_series(heads).tolist()
    assert got == [e for _, e in CASES]


def test_charset_split_semantics():
    # reference splits on ';' then '/' (v2_util.go:52,68)
    mime = sniff_bytes(b"hello world")
    assert mime.split(";")[0].strip() == "text/plain"
    assert mime.split(";")[0].split("/")[0] == "text"
