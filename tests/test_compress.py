"""Compression-ratio quality signal (functions/compress.py)."""
from __future__ import annotations

from lens_spark.functions.compress import (
    compression_row,
    compression_signals,
)


def test_golden_values_pin_zlib_build():
    """Literal DEFLATE outputs — if a zlib upgrade ever changes these,
    the frozen driver fixture must be regenerated too."""
    did, raw, comp, q = compression_row(1, "a" * 30)
    assert (raw, comp, q) == (30, 11, 11 * 10000 // 30)
    _, raw, comp, q = compression_row(
        2, "the quick brown fox jumps over the lazy dog. " * 4)
    assert (raw, comp, q) == (180, 55, 55 * 10000 // 180)


def test_sentinels_and_ordering():
    assert compression_row(1, None) == (1, 0, 0, -1)
    assert compression_row(2, "") == (2, 0, 0, -1)
    # repetitive text compresses (q < 10000), random-ish text doesn't
    rep = compression_row(3, "spam " * 200)[3]
    import random

    rng = random.Random(7)
    junk = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(1000))
    assert rep < 1000 < compression_row(4, junk)[3]


def test_distributed_matches_pure(spark):
    rows = [(i, None if i % 9 == 0 else f"doc {i} " * (i % 17))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.raw_len, r.comp_len, r.ratio_q)
        for r in compression_signals(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        assert got[i] == compression_row(i, t)[1:]


def test_utf8_byte_lengths(spark):
    df = spark.createDataFrame(
        [(1, "héllo wörld ✓" * 10)], "doc_id long, text string")
    r = compression_signals(df, "doc_id", "text").collect()[0]
    assert r.raw_len == len(("héllo wörld ✓" * 10).encode("utf-8"))
    assert 0 < r.ratio_q
