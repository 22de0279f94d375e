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


def test_inception_preprocessing_math():
    """E10 preprocessing (reference tensorflow.go:160-183) verified
    without any model: bilinear resize semantics (TF legacy scaling),
    mean-117 normalization, batch shape."""
    import numpy as np

    from lens_spark.extractors.ocr_stub import (
        INCEPTION_HW, INCEPTION_MEAN, preprocess_inception, resize_bilinear,
    )

    # identity resize: 224x224 in == out (scale 1, zero fractional weight)
    img = np.arange(224 * 224 * 3, dtype="uint8").reshape(224, 224, 3)
    out = resize_bilinear(img, 224, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    assert np.array_equal(out, img.astype("float32"))

    # 2x2 -> 4x4 upscale, TF align_corners=False: src = dst * (2/4);
    # row 0: src_y=0; row 1: src_y=0.5 -> halfway between input rows
    tiny = np.array([[[0.0], [10.0]], [[20.0], [30.0]]], dtype="float32")
    up = resize_bilinear(tiny, 4, 4)
    assert up[0, 0, 0] == 0.0
    assert up[0, 1, 0] == 5.0          # x=0.5 between 0 and 10
    assert up[1, 0, 0] == 10.0         # y=0.5 between 0 and 20
    assert up[1, 1, 0] == 15.0         # center of the 2x2 quad
    # edge clamp: last row/col maps past the end -> clamped neighbor
    assert up[3, 3, 0] == 30.0

    # normalization: a constant-117 image becomes exactly zero
    const = np.full((10, 10, 3), int(INCEPTION_MEAN), dtype="uint8")
    batch = preprocess_inception(const)
    assert batch.shape == (1, INCEPTION_HW, INCEPTION_HW, 3)
    assert np.all(batch == 0.0)
    # and a 200-valued image becomes 83 everywhere ((200-117)/1)
    batch2 = preprocess_inception(np.full((7, 13, 3), 200, dtype="uint8"))
    assert np.all(batch2 == 83.0)


def test_classifier_stub_and_gate(monkeypatch):
    """Without the ML stack the classifier is the deterministic md5 pick;
    the real-model gate activates only when LENS_INCEPTION_ONNX exists."""
    from lens_spark.extractors import ocr_stub

    png = ocr_stub.make_png(caption="x")
    a = ocr_stub.classify_image(png)
    assert a in ocr_stub.LABELS
    assert ocr_stub.classify_image(png) == a  # stable across calls
    # pointing the env var at a missing file keeps the stub path
    monkeypatch.setenv("LENS_INCEPTION_ONNX", "/nonexistent/model.onnx")
    assert ocr_stub.classify_image(png) == a


def test_resize_images(spark):
    """Resize plumbing: binary in/out Arrow batches; the stand-in emits
    a decodable PNG at the target dims with the caption preserved, and
    corrupt payloads land as quarantine rows."""
    from lens_spark.corpus import gen_media, media_to_spark
    from lens_spark.operators.multimodal import decode_image, resize_images

    media = media_to_spark(spark, gen_media(24, seed=7))
    out = resize_images(media, width=32, height=24).collect()
    n_img = media.filter("kind = 'image'").count()
    assert len(out) == n_img > 0
    ok = [r for r in out if r["error"] is None]
    bad = [r for r in out if r["error"] is not None]
    assert ok and bad  # gen_media plants corrupt payloads
    for r in ok:
        assert (r["width"], r["height"]) == (32, 24)
        d = decode_image(bytes(r["payload"]))  # round-trips
        assert (d["width"], d["height"]) == (32, 24)
    # caption survives the stand-in resize on at least one image
    srcs = {r["media_id"]: r for r in media.collect()}
    from lens_spark.extractors.ocr_stub import png_text_chunks
    kept_caps = 0
    for r in ok:
        src_cap = png_text_chunks(
            bytes(srcs[r["media_id"]]["payload"])).get("caption")
        got_cap = decode_image(bytes(r["payload"]))["caption"]
        assert got_cap == src_cap
        kept_caps += got_cap is not None
    assert kept_caps > 0
    for r in bad:
        assert r["payload"] is None and r["width"] is None


def test_audio_chunks(spark):
    from lens_spark.corpus import gen_media, media_to_spark
    from lens_spark.operators.multimodal import audio_chunks

    media = media_to_spark(spark, gen_media(24, seed=7))
    out = audio_chunks(media).collect()
    ok = [r for r in out if r["error"] is None]
    bad = [r for r in out if r["error"] is not None]
    assert ok and bad  # corrupt audio payloads quarantine
    assert all(r["frame"] is not None and r["frame_no"] >= 0 for r in ok)
    # chunk order is per-media contiguous from 0
    by_m = {}
    for r in sorted(ok, key=lambda r: (r["media_id"], r["frame_no"])):
        by_m.setdefault(r["media_id"], []).append(r["frame_no"])
    assert all(nos == list(range(len(nos))) for nos in by_m.values())
