"""Freeze the expected outputs of the multimodal operators to parquet
fixtures for the driver correctness gate (VERDICT r2 "What's missing"
#4: image_features / frame_sample had pytest-only coverage).

The expected values are computed on the SPARK-FREE path — the pure
per-row functions (`image_feature_row`, `frame_sample_rows`) over the
deterministic `gen_media` corpus, single-threaded pandas, no Arrow, no
executors — and the driver's ``image_features`` / ``frame_sample``
queries run the REAL distributed operators (mapInPandas over binary
columns) on the same corpus. A value-hash match proves the Spark
plumbing (schema, Arrow batch transfer of binary payloads, filtering,
ordering) reproduces the local computation exactly, the same pattern as
``extract_full`` (scripts/freeze_extract_oracle.py).

Embeddings are projected to quantized ints (floor(x * 10000) on the
float64-widened value) on BOTH sides so the comparison never depends on
float-to-string formatting; frames are projected to (md5, length).
Numeric columns use -1 / [] sentinels on errored rows instead of NULL —
a nullable int column round-trips as float64+NaN through pandas/DuckDB
and would break the stringified value hash.

Regenerate only when the fixture corpus or the decode semantics
intentionally change:
    python scripts/freeze_multimodal_oracle.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from lens_spark.corpus import gen_media
from lens_spark.operators.multimodal import (
    audio_chunk_rows, frame_sample_rows, image_feature_row,
    resize_image_row,
)

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

N_MEDIA = 48
SEED = 7


def quantize(vec, head: int = 8) -> list[int] | None:
    """floor(float64(x) * 10000) over the first `head` dims — the same
    widen-then-floor both engines apply, immune to float formatting."""
    if vec is None:
        return None
    return [math.floor(float(v) * 10000) for v in vec[:head]]


def main() -> None:
    media = gen_media(N_MEDIA, seed=SEED)

    feat_rows = []
    for r in media:
        if r["kind"] != "image":
            continue
        mid, w, h, cap, emb, err = image_feature_row(
            r["media_id"], r["payload"])
        feat_rows.append({
            "media_id": mid,
            "width": -1 if w is None else w,
            "height": -1 if h is None else h,
            "caption": cap,
            "emb_q": quantize(emb) if emb is not None else [],
            "error": err,
        })
    feats = pd.DataFrame(feat_rows).sort_values("media_id")
    feats["width"] = feats["width"].astype("int32")
    feats["height"] = feats["height"].astype("int32")

    frame_rows = []
    for r in media:
        if r["kind"] != "video":
            continue
        for mid, no, fr, err in frame_sample_rows(
                r["media_id"], r["payload"], every=2):
            frame_rows.append({
                "media_id": mid,
                "frame_no": -1 if no is None else no,
                "frame_md5": (hashlib.md5(fr).hexdigest()
                              if fr is not None else None),
                "frame_len": len(fr) if fr is not None else -1,
                "error": err,
            })
    frames = pd.DataFrame(frame_rows).sort_values(
        ["media_id", "frame_no"])
    frames["frame_no"] = frames["frame_no"].astype("int32")
    frames["frame_len"] = frames["frame_len"].astype("int32")

    os.makedirs(FIXDIR, exist_ok=True)
    fp = os.path.join(FIXDIR, "image_features_expected.parquet")
    feats.to_parquet(fp, index=False)
    print(f"wrote {fp}: {len(feats)} rows "
          f"({feats.error.notna().sum()} errored)")
    fp = os.path.join(FIXDIR, "frame_sample_expected.parquet")
    frames.to_parquet(fp, index=False)
    print(f"wrote {fp}: {len(frames)} rows "
          f"({frames.error.notna().sum()} errored)")

    resize_rows = []
    for r in media:
        if r["kind"] != "image":
            continue
        mid, w, h, out, err = resize_image_row(
            r["media_id"], r["payload"], 32, 24)
        resize_rows.append({
            "media_id": mid,
            "width": -1 if w is None else w,
            "height": -1 if h is None else h,
            "out_md5": (hashlib.md5(out).hexdigest()
                        if out is not None else None),
            "out_len": len(out) if out is not None else -1,
            "error": err,
        })
    resized = pd.DataFrame(resize_rows).sort_values("media_id")
    for c in ("width", "height", "out_len"):
        resized[c] = resized[c].astype("int32")
    fp = os.path.join(FIXDIR, "image_resize_expected.parquet")
    resized.to_parquet(fp, index=False)
    print(f"wrote {fp}: {len(resized)} rows "
          f"({resized.error.notna().sum()} errored)")

    audio_rows = []
    for r in media:
        if r["kind"] != "audio":
            continue
        for mid, no, ch, err in audio_chunk_rows(
                r["media_id"], r["payload"]):
            audio_rows.append({
                "media_id": mid,
                "chunk_no": -1 if no is None else no,
                "chunk_md5": (hashlib.md5(ch).hexdigest()
                              if ch is not None else None),
                "chunk_len": len(ch) if ch is not None else -1,
                "error": err,
            })
    audio = pd.DataFrame(audio_rows).sort_values(["media_id", "chunk_no"])
    for c in ("chunk_no", "chunk_len"):
        audio[c] = audio[c].astype("int32")
    fp = os.path.join(FIXDIR, "audio_chunks_expected.parquet")
    audio.to_parquet(fp, index=False)
    print(f"wrote {fp}: {len(audio)} rows "
          f"({audio.error.notna().sum()} errored)")


if __name__ == "__main__":
    main()
