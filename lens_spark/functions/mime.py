"""Content-type sniffing — vectorized reimplementation of the WHATWG
mime-sniffing algorithm as implemented by Go's ``http.DetectContentType``
(the reference calls it at v2_util.go:42 on the first bytes of fetched
content). Matching the Go behavior matters because the reference stores the
*full* sniffed string — including any ``; charset=`` suffix — as
``MetaDataV2.MimeType`` (v2_util.go:100), and dispatches on it
(v2_util.go:52-96).

Implementation notes:
- ``sniff_series`` is pure pandas (vectorized ``.str`` ops over a Series of
  byte-heads decoded latin-1) so the Spark integration is a zero-copy
  pandas UDF over ``substring(unbase64(payload), 1, 512)`` — the 512-byte
  cap mirrors Go's ``sniffLen``.
- Only the first 512 bytes ever cross into Python; payload decode and
  slicing stay JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

SNIFF_LEN = 512
_WS = "\t\n\x0c\r "

# HTML signatures: case-insensitive, must be followed by ' ' or '>'
# (WHATWG §7.1 / Go net/http sniff.go htmlSig table).
_HTML_SIGS = (
    "<!DOCTYPE HTML", "<HTML", "<HEAD", "<SCRIPT", "<IFRAME", "<H1", "<DIV",
    "<FONT", "<TABLE", "<A", "<STYLE", "<TITLE", "<B", "<BODY", "<BR", "<P",
    "<!--",
)

# exact leading-byte signatures, checked in order (latin-1 text domain)
_EXACT_SIGS = (
    ("%PDF-", "application/pdf"),
    ("%!PS-Adobe-", "application/postscript"),
    ("GIF87a", "image/gif"),
    ("GIF89a", "image/gif"),
    ("\x89PNG\r\n\x1a\n", "image/png"),
    ("\xff\xd8\xff", "image/jpeg"),
    ("BM", "image/bmp"),
    ("\x00\x00\x01\x00", "image/x-icon"),
    ("\x00\x00\x02\x00", "image/x-icon"),
    ("ID3", "audio/mpeg"),
    ("OggS\x00", "application/ogg"),
    ("MThd\x00\x00\x00\x06", "audio/midi"),
    ("\x1aE\xdf\xa3", "video/webm"),
    ("\x1f\x8b\x08", "application/x-gzip"),
    ("PK\x03\x04", "application/zip"),
    ("Rar!\x1a\x07\x00", "application/x-rar-compressed"),
    ("Rar!\x1a\x07\x01\x00", "application/x-rar-compressed"),
    ("\x00asm", "application/wasm"),
    ("FORM", None),  # placeholder; AIFF handled in RIFF-style block below
)

_BINARY_RE = r"[\x00-\x08\x0b\x0e-\x1a\x1c-\x1f]"


def sniff_series(heads: pd.Series) -> pd.Series:
    """Sniff content types for a Series of leading-byte strings.

    ``heads`` holds the first ≤512 payload bytes decoded as latin-1 (a
    lossless byte↔str mapping), or None/NaN for absent payloads.

    Returns the full content-type string exactly as Go's
    ``http.DetectContentType`` would (including charset suffixes).
    """
    s = heads.fillna("").astype(str)
    out = pd.Series(np.full(len(s), "application/octet-stream", dtype=object),
                    index=s.index)

    stripped = s.str.lstrip(_WS)
    upper = stripped.str.upper()

    # --- text fallback first (lowest priority; later assignments override)
    is_texty = ~s.str.contains(_BINARY_RE, regex=True, na=False)
    out[is_texty] = "text/plain; charset=utf-8"

    # --- BOMs (masked sigs; mask FF FF 00 00 family)
    out[s.str.startswith("\xfe\xff")] = "text/plain; charset=utf-16be"
    out[s.str.startswith("\xff\xfe")] = "text/plain; charset=utf-16le"
    out[s.str.startswith("\xef\xbb\xbf")] = "text/plain; charset=utf-8"

    # --- RIFF container family (masked)
    riff = s.str.startswith("RIFF")
    fourcc = s.str.slice(8, 12)
    out[riff & (fourcc == "WAVE")] = "audio/wave"
    out[riff & (fourcc.str.startswith("AVI"))] = "video/avi"
    out[riff & (fourcc == "WEBP")] = "image/webp"
    form = s.str.startswith("FORM")
    out[form & (fourcc == "AIFF")] = "audio/aiff"
    out[s.str.startswith(".snd")] = "audio/basic"

    # --- MP4: box-size multiple of 4, 'ftyp' at [4:8), an 'mp4' brand
    ftyp = s.str.slice(4, 8) == "ftyp"
    brand = s.str.slice(8, 11)
    out[ftyp & (brand == "mp4")] = "video/mp4"

    # --- exact signatures
    for sig, mime in _EXACT_SIGS:
        if mime is None:
            continue
        out[s.str.startswith(sig)] = mime

    # --- XML (whitespace-skipped, masked)
    out[stripped.str.startswith("<?xml")] = "text/xml; charset=utf-8"

    # --- HTML (whitespace-skipped, case-insensitive, terminator ' ' or '>')
    html_hit = pd.Series(False, index=s.index)
    for sig in _HTML_SIGS:
        # Go requires the byte after the sig to be ' ' or '>' for every
        # entry, including "<!--" (net/http sniff.go htmlSig.match).
        html_hit |= upper.str.startswith(sig + " ")
        html_hit |= upper.str.startswith(sig + ">")
    out[html_hit] = "text/html; charset=utf-8"

    out[s.eq("")] = "text/plain; charset=utf-8"  # Go: empty sniffs as text
    return out


def sniff_bytes(content: bytes) -> str:
    """Scalar convenience wrapper (tests, oracle generator)."""
    head = content[:SNIFF_LEN].decode("latin-1")
    return sniff_series(pd.Series([head])).iloc[0]


@F.pandas_udf(StringType())
def sniff_udf(heads: pd.Series) -> pd.Series:
    """Pandas UDF: head-bytes (latin-1 string) → full content type."""
    return sniff_series(heads)


def sniff_col(payload_bin: Column) -> Column:
    """Sniff a binary payload column. Slice stays JVM-side; only ≤512
    bytes per row cross the Arrow boundary."""
    head = F.decode(F.substring(payload_bin, 1, SNIFF_LEN), "ISO-8859-1")
    return sniff_udf(head)


def mime_parse(mime: Column) -> Column:
    """Strip the charset suffix: split on ';' take field 0, trimmed
    (reference v2_util.go:52-55 strings.FieldsFunc on ';')."""
    return F.trim(F.split(mime, ";").getItem(0))


def mime_family(mime: Column) -> Column:
    """Top-level family: split on '/' take field 0
    (reference v2_util.go:67-71)."""
    return F.split(mime_parse(mime), "/").getItem(0)


def category_for(mime: Column) -> Column:
    """Category mapping (reference v2_util.go:58-96 + models/mime.go:6-16):
    application/pdf → 'pdf'; text/* → 'document'; image/* → 'image';
    anything else → 'unknown' (the engine also defaults empties to
    'unknown' at index time, engine/engine.go:130-137)."""
    parsed = mime_parse(mime)
    family = F.split(parsed, "/").getItem(0)
    return (
        F.when(parsed == "application/pdf", F.lit("pdf"))
        .when(family == "text", F.lit("document"))
        .when(family == "image", F.lit("image"))
        .otherwise(F.lit("unknown"))
    )
