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
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
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


# ------------------------------------------------------- perceptual hash
# dHash (difference hash): 9x8 box-downsample of the grayscale image,
# bit = 1 iff cell(x) > cell(x+1) row-wise — 64 bits. Near-identical
# images (recompression, tiny edits, resizes) land within a small
# Hamming radius; the standard cheap image near-dup key (the pHash
# family; dHash is the gradient variant). Decode is gated like
# everything else in this module: PIL convert("L") in production, an
# in-sandbox minimal PNG decoder (8-bit grayscale, filters 0-2) that
# REALLY inflates and unfilters the fixture scanlines.

LONG_MASK = (1 << 64) - 1


def _to_signed64(v: int) -> int:
    v &= LONG_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_gray(payload: bytes) -> list[bytes]:
    """Grayscale pixel rows of an image payload. PIL when installed
    (any format, mean-luma), else the minimal PNG path: IHDR must be
    8-bit grayscale, IDAT zlib-inflated, per-scanline filters
    None/Sub/Up undone byte-for-byte."""
    try:  # pragma: no cover - not installed in this sandbox
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L")
        raw = img.tobytes()
        w, h = img.size
        return [raw[y * w:(y + 1) * w] for y in range(h)]
    except ImportError:
        pass
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    pos, idat, w, h, depth, color = 8, b"", 0, 0, 0, 0
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if depth != 8 or color != 0:
        raise ValueError(
            f"sandbox PNG decoder supports 8-bit grayscale only "
            f"(got depth={depth} color={color})"
        )
    raw = zlib.decompress(idat)
    stride = w + 1
    rows: list[bytes] = []
    prev = bytes(w)
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        ftype, scan = line[0], bytearray(line[1:])
        if ftype == 1:          # Sub
            for x in range(1, w):
                scan[x] = (scan[x] + scan[x - 1]) & 0xFF
        elif ftype == 2:        # Up
            for x in range(w):
                scan[x] = (scan[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        prev = bytes(scan)
        rows.append(prev)
    return rows


def dhash64(payload: bytes) -> int:
    """64-bit dHash as a SIGNED long (Spark/parquet int64 fold)."""
    rows = decode_gray(payload)
    h, w = len(rows), len(rows[0]) if rows else 0
    if h < 1 or w < 2:
        raise ValueError("image too small for dHash")
    # 9x8 box-average grid (boundaries by integer split, cells >= 1px)
    grid = []
    for gy in range(8):
        y0, y1 = gy * h // 8, max(gy * h // 8 + 1, (gy + 1) * h // 8)
        row = []
        for gx in range(9):
            x0 = gx * w // 9
            x1 = max(x0 + 1, (gx + 1) * w // 9)
            s = sum(rows[y][x] for y in range(y0, y1)
                    for x in range(x0, x1))
            row.append(s / ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    bits = 0
    for gy in range(8):
        for gx in range(8):
            if grid[gy][gx] > grid[gy][gx + 1]:
                bits |= 1 << (gy * 8 + gx)
    return _to_signed64(bits)


PHASH = StructType(
    [
        StructField("media_id", StringType()),
        StructField("phash", LongType()),
        StructField("error", StringType()),
    ]
)


def phash_row(media_id, payload) -> tuple:
    """Per-row dHash (pure; shared with the Spark-free oracle freezer,
    the image_feature_row pattern). Errors → phash -1 sentinel + error
    string (nullable-long cells break the driver's value hash)."""
    try:
        return (media_id, dhash64(bytes(payload)), None)
    except Exception as e:  # noqa: BLE001 - quarantine, not crash
        return (media_id, -1, str(e))


def image_phash(media: DataFrame) -> DataFrame:
    """dHash every image payload (Arrow-batched mapInPandas, binary in
    / one long out — the cheapest per-image map in the tier)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = [phash_row(mid, payload)
                    for mid, payload in zip(b["media_id"], b["payload"])]
            yield pd.DataFrame(rows, columns=[f.name for f in PHASH])

    return media.filter("kind = 'image'").select(
        "media_id", "payload"
    ).mapInPandas(batches, PHASH)


def phash_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    max_bucket: int = 200,
) -> DataFrame:
    """Image near-dup pairs with Hamming(dHash) ≤ max_hamming —
    EXHAUSTIVE pigeonhole banding over the 64-bit hash (simhash_bands:
    max_hamming+1 bands ⇒ a qualifying pair is bit-identical in ≥ 1
    band), join-free bucket pairing, hot buckets capped (over-cap keys
    are walls of identical images — exact dedup's job). Input: the
    `image_phash` output (errored rows, phash −1, are excluded).
    Returns (id_a, id_b, hamming); one groupBy exchange + distinct."""
    from pyspark.sql import Window, functions as F

    from lens_spark.operators.dedup import pair_structs, simhash_bands

    layout = simhash_bands(max_hamming, bits=64)
    ok = hashes.filter(F.col("error").isNull()).select(
        F.col("media_id").alias("id"), F.col("phash").alias("ph")
    )
    banded = ok.select(
        "id", "ph",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band_no"),
                F.call_function("shiftright", F.col("ph"), F.lit(off))
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            )
            for i, (off, width) in enumerate(layout)
        ])).alias("band"),
    ).select("id", "ph", "band.band_no", "band.key")
    w = Window.partitionBy("band_no", "key")
    sized = (
        banded.withColumn("n", F.count("*").over(w))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .drop("n")
    )
    buckets = sized.groupBy("band_no", "key").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("id"), F.col("ph")))
        ).alias("members")
    )
    p = F.col("p")
    ham = F.bit_count(p.a.ph.bitwiseXOR(p.b.ph))
    return (
        buckets.select(F.explode(pair_structs(F.col("members"))).alias("p"))
        .select(
            p.a.id.alias("id_a"),
            p.b.id.alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
