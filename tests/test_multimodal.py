"""Multimodal plumbing: image decode (real PNG byte parsing), stubbed
audio/video with the deterministic fixture container, frame sampling."""

from __future__ import annotations

import pytest

from lens_spark.extractors.ocr_stub import make_png
from lens_spark.operators.multimodal import (
    MEDIA, decode_audio, frame_sample, image_features, make_av_container,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img-1", "image", make_png(caption="hello caption", width=3,
                                    height=2), "ref-1"),
        ("img-2", "image", make_png(caption=None), "ref-2"),
        ("img-bad", "image", b"not a png at all", "ref-3"),
        ("vid-1", "video",
         make_av_container("video", [b"f0", b"f1", b"f2", b"f3", b"f4"]),
         "ref-4"),
        ("vid-bad", "video", b"\x00\x00real mp4 we cannot decode", "ref-5"),
        ("aud-1", "audio", make_av_container("audio", [b"s0", b"s1"]),
         "ref-6"),
    ]
    return spark.createDataFrame(rows, schema=MEDIA)


def test_image_features(media):
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    ok = rows["img-1"]
    assert (ok["width"], ok["height"]) == (3, 2)
    assert ok["caption"] == "hello caption"
    assert len(ok["embedding"]) == 64 and ok["error"] is None
    assert rows["img-2"]["caption"] is None
    assert rows["img-bad"]["error"] is not None  # quarantined, not crashed
    # embedding is deterministic across runs
    again = {r["media_id"]: r for r in image_features(media).collect()}
    assert again["img-1"]["embedding"] == ok["embedding"]


def test_frame_sample(media):
    rows = frame_sample(media, every=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    got = sorted((r["frame_no"], bytes(r["frame"]))
                 for r in by_id["vid-1"])
    assert got == [(0, b"f0"), (2, b"f2"), (4, b"f4")]
    # undecodable real-world container → clearly-marked stub error
    assert "requires pyav/ffmpeg" in by_id["vid-bad"][0]["error"]


def test_audio_stub():
    assert decode_audio(make_av_container("audio", [b"x"])) == [b"x"]
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVEfmt real wav")
