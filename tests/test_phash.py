"""Perceptual-hash (dHash) image dedup: decoder round-trip, pure-row /
distributed parity, brute-force full-recall pairing, error lane, and
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_spark.corpus import gen_phash_media, media_to_spark
from lens_spark.extractors.ocr_stub import make_png
from lens_spark.operators.multimodal import (
    LONG_MASK, decode_gray, dhash64, image_phash, phash_pairs, phash_row,
)


def test_decode_gray_roundtrip():
    pixels = [bytes((x * 17 + y * 3) % 256 for x in range(12))
              for y in range(7)]
    png = make_png(pixels=pixels)
    assert decode_gray(png) == pixels


def test_dhash_known_gradient():
    # strictly increasing rows → every left<right → all bits 0
    inc = [bytes(range(0, 160, 10)) for _ in range(16)]
    assert dhash64(make_png(pixels=inc)) == 0
    # strictly decreasing → all 64 bits set → signed -1
    dec = [bytes(range(160, 0, -10)) for _ in range(16)]
    assert dhash64(make_png(pixels=dec)) == -1


def test_corrupt_payload_error_lane():
    mid, ph, err = phash_row("x", b"\x00corrupt\x89PN")
    assert (mid, ph) == ("x", -1)
    assert err


def test_distributed_matches_pure_rows(spark):
    fixture = gen_phash_media(36, seed=11)
    got = {
        r.media_id: (r.phash, r.error is not None)
        for r in image_phash(media_to_spark(spark, fixture)).collect()
    }
    want = {}
    for r in fixture:
        mid, ph, err = phash_row(r["media_id"], r["payload"])
        want[mid] = (ph, err is not None)
    assert got == want
    assert sum(1 for _, e in got.values() if e) == 3


def test_pairs_full_recall_vs_bruteforce(spark):
    fixture = gen_phash_media(36, seed=11)
    hashes = image_phash(media_to_spark(spark, fixture))
    got = {(r.id_a, r.id_b, r.hamming)
           for r in phash_pairs(hashes, max_hamming=2).collect()}
    ok = [(r["media_id"], phash_row(r["media_id"], r["payload"])[1])
          for r in fixture
          if phash_row(r["media_id"], r["payload"])[2] is None]
    want = set()
    for i in range(len(ok)):
        for j in range(i + 1, len(ok)):
            d = bin((ok[i][1] ^ ok[j][1]) & LONG_MASK).count("1")
            if d <= 2:
                lo, hi = sorted((ok[i][0], ok[j][0]))
                want.add((lo, hi, d))
    assert got == want
    assert {d for _, _, d in want} == {0, 1, 2}  # fixture spans radii


def test_plan_shape(spark):
    fixture = gen_phash_media(36, seed=11)
    hashes = image_phash(media_to_spark(spark, fixture))
    plan = hashes._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    pairs = phash_pairs(hashes, max_hamming=2)
    pplan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in pplan  # join-free bucket pairing
