"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is real and tested — schemas, Arrow batch
shapes, partitioning — while the codec-level decode is gated exactly like
OCR (extractors/ocr_stub.py): real libraries (PIL/torchaudio/av) slot in
on a production image; in-sandbox the image path does REAL byte-level work
(PNG IHDR/tEXt chunk parsing), and audio/video decoding raises a
clearly-marked NotImplementedError unless payloads use the deterministic
fixture container below.

Fixture A/V container (deterministic stand-in, documented):
    b"LENSAV1" + kind(1B: 'A'|'V') + u32 n_frames + frames…
each frame: u32 length + payload. `frame_sample` walks it for real.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType,
    StructField, StructType,
)

from lens_spark.extractors.ocr_stub import png_text_chunks

MEDIA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField("media_ref", StringType()),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("caption", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("error", StringType()),
    ]
)

FRAMES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("error", StringType()),
    ]
)

EMBED_DIM = 64


def _png_dims(b: bytes) -> tuple[int, int]:
    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", b[16:24])  # IHDR is always first
    return int(w), int(h)


def _stub_embedding(b: bytes) -> list[float]:
    """Deterministic unit vector from the payload digest — the stand-in
    for a real image encoder (production: ONNX/CLIP via predict_batch_udf).
    """
    seed = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(EMBED_DIM)
    return (v / np.linalg.norm(v)).astype("float32").tolist()


def decode_image(payload: bytes) -> dict:
    """Gated decode: PIL when available, else byte-level PNG parse.
    BOTH branches read the ``caption`` tEXt metadata (PIL exposes PNG
    text chunks as ``img.text``) so a production image and this sandbox
    produce the same row for the same payload."""
    try:  # pragma: no cover - not installed in this sandbox
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        caption = getattr(img, "text", {}).get("caption")
        return {"width": img.width, "height": img.height,
                "caption": caption}
    except ImportError:
        pass
    w, h = _png_dims(payload)
    caption = png_text_chunks(payload).get("caption")
    return {"width": w, "height": h, "caption": caption}


# int16 PCM samples per decoded audio chunk (mono): the real-decode
# twin of the fixture container's frame granularity
AUDIO_CHUNK_SAMPLES = 4096


def decode_audio(payload: bytes) -> list[bytes]:
    """Decode an audio payload into fixed-size chunks of mono int16 PCM
    bytes. Fixture-container payloads (LENSAV1A) unpack
    deterministically in-sandbox; anything else takes the GATED real
    path — torchaudio when installed (load → mean-downmix →
    int16 PCM → AUDIO_CHUNK_SAMPLES-sample chunks), else
    NotImplementedError (this container has no torchaudio/ffmpeg)."""
    if payload.startswith(b"LENSAV1A"):
        return list(_walk_frames(payload))
    try:  # pragma: no cover - not installed in this sandbox
        import io

        import torch
        import torchaudio
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires torchaudio/ffmpeg "
            "(not in this container)"
        ) from e
    wav, _sr = torchaudio.load(io.BytesIO(payload))  # pragma: no cover
    mono = wav.mean(dim=0)  # pragma: no cover
    pcm = (  # pragma: no cover
        (mono.clamp(-1.0, 1.0) * 32767.0)
        .to(torch.int16).numpy().tobytes()
    )
    step = AUDIO_CHUNK_SAMPLES * 2  # pragma: no cover
    return [pcm[i:i + step]  # pragma: no cover
            for i in range(0, len(pcm), step)]


def _walk_frames(payload: bytes) -> Iterator[bytes]:
    (n,) = struct.unpack(">I", payload[8:12])
    pos = 12
    for _ in range(n):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        yield payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln


def make_av_container(kind: str, frames: list[bytes]) -> bytes:
    out = b"LENSAV1" + (b"A" if kind == "audio" else b"V")
    out += struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f)) + f
    return out


def image_feature_row(media_id, payload) -> tuple:
    """Per-row image decode/feature logic — a PURE function shared by the
    distributed ``image_features`` batches and the Spark-free oracle
    freezer (scripts/freeze_multimodal_oracle.py), so the driver's
    correctness row verifies that the Arrow/mapInPandas plumbing
    reproduces the local computation byte-for-byte."""
    try:
        p = bytes(payload)
        d = decode_image(p)
        return (media_id, d["width"], d["height"], d["caption"],
                _stub_embedding(p), None)
    except Exception as e:  # noqa: BLE001 - quarantine, not crash
        return (media_id, None, None, None, None, str(e))


def frame_sample_rows(media_id, payload, every: int = 2) -> list[tuple]:
    """Per-row frame-sampling logic (pure; see image_feature_row)."""
    try:
        p = bytes(payload)
        if not p.startswith(b"LENSAV1V"):
            raise NotImplementedError(
                "video decode requires pyav/ffmpeg "
                "(not in this container)"
            )
        return [(media_id, i, fr, None)
                for i, fr in enumerate(_walk_frames(p)) if i % every == 0]
    except Exception as e:  # noqa: BLE001
        return [(media_id, None, None, str(e))]


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract image payloads (Arrow-batched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = [image_feature_row(mid, payload)
                    for mid, payload in zip(b["media_id"], b["payload"])]
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES]
            )

    return media.filter("kind = 'image'").select(
        "media_id", "payload"
    ).mapInPandas(batches, IMAGE_FEATURES)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Sample every `every`-th frame from video payloads (batch UDF over
    the fixture container; production: pyav keyframe iteration)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                rows.extend(frame_sample_rows(mid, payload, every))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES])

    return media.filter("kind = 'video'").select(
        "media_id", "payload"
    ).mapInPandas(batches, FRAMES)


RESIZED = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


def resize_image_row(media_id, payload, width: int, height: int) -> tuple:
    """Per-row resize logic (pure; see image_feature_row). Real path:
    PIL resize + PNG re-encode (gated — PIL is absent in this sandbox).
    Fallback: validate the PNG, then rebuild a byte-valid PNG at the
    target dimensions with the caption tEXt chunk preserved — a
    deterministic stand-in with the real path's exact shape (binary in,
    binary out, dims changed, metadata carried), so the Spark plumbing
    and the decode round-trip (decode_image reads back the new dims and
    caption) are fully testable without a codec."""
    try:
        p = bytes(payload)
        try:  # pragma: no cover - PIL not installed in this sandbox
            import io

            from PIL import Image
            from PIL.PngImagePlugin import PngInfo

            img = Image.open(io.BytesIO(p))
            # carry the caption tEXt chunk through the re-encode, same
            # as the sandbox fallback — dropping metadata on resize
            # would make prod and sandbox disagree on a round-trip
            caption = getattr(img, "text", {}).get("caption")
            img = img.resize((width, height))
            buf = io.BytesIO()
            info = PngInfo()
            if caption is not None:
                info.add_text("caption", caption)
            img.save(buf, format="PNG", pnginfo=info)
            return (media_id, width, height, buf.getvalue(), None)
        except ImportError:
            pass
        _png_dims(p)  # raises on non-PNG → quarantine row
        from lens_spark.extractors.ocr_stub import make_png

        cap = png_text_chunks(p).get("caption")
        out = make_png(caption=cap, width=width, height=height)
        return (media_id, width, height, out, None)
    except Exception as e:  # noqa: BLE001 - quarantine, not crash
        return (media_id, None, None, None, str(e))


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize image payloads to (width, height) — Arrow-batched binary
    in/out, the third multimodal primitive (decode/feature-extract,
    frame-sample, resize). Failed decodes become (nulls, error) rows,
    the quarantine convention."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = [resize_image_row(mid, payload, width, height)
                    for mid, payload in zip(b["media_id"], b["payload"])]
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED])

    return media.filter("kind = 'image'").select(
        "media_id", "payload"
    ).mapInPandas(batches, RESIZED)


def audio_chunk_rows(media_id, payload) -> list[tuple]:
    """Per-row audio chunking (pure; see image_feature_row): unpack the
    decoded audio stream into its chunks. decode_audio carries the
    gating — real decode needs torchaudio/ffmpeg; the LENSAV1A fixture
    container unpacks deterministically in-sandbox."""
    try:
        return [
            (media_id, i, ch, None)
            for i, ch in enumerate(decode_audio(bytes(payload)))
        ]
    except Exception as e:  # noqa: BLE001
        return [(media_id, None, None, str(e))]


def audio_chunks(media: DataFrame) -> DataFrame:
    """Chunk audio payloads (Arrow-batched; FRAMES schema — a chunk is
    a frame of samples). Completes the modality matrix: image decode /
    features / resize, video frame-sample, audio chunk-decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                rows.extend(audio_chunk_rows(mid, payload))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES])

    return media.filter("kind = 'audio'").select(
        "media_id", "payload"
    ).mapInPandas(batches, FRAMES)
