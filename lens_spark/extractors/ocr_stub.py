"""OCR + image classification — gated behind import-try with
deterministic in-sandbox stand-ins.

Reference behavior being modeled:
- OCR: Tesseract per image (analyzer/ocr/ocr.go:107-135). Production path:
  ``pytesseract.image_to_string`` inside the Arrow batch (client reuse per
  batch amortizes what the reference pays per call, ocr.go:114).
- Classifier: Inception-v5h TF graph → keyword
  (analyzer/images/tensorflow.go:119-185). The reference's own service
  tests stub it to return a constant (v2_test.go:131); production path is
  an ONNX/Keras model in a pandas UDF.

Neither tesseract nor an image stack exists in this container, so the
deterministic stand-ins are:
- OCR: parse the PNG ``tEXt`` chunk (keyword ``caption``) that the fixture
  generator embeds — real PNG chunk-walking over real bytes, so the Spark
  plumbing (binary column → batch UDF → text out) is genuinely exercised;
  a PNG without a caption raises :class:`OcrError` exactly where real OCR
  would fail.
- Classifier: keyword = deterministic pick from a small label list by
  md5 of the image bytes (stable across runs/processes).
"""

from __future__ import annotations

import hashlib
import struct
import zlib


class OcrError(Exception):
    """OCR failure. For images the caller falls back to the classifier
    keyword (reference v2_util.go:85-91); for PDF pages it quarantines the
    doc (ocr.go:89-92)."""


# stand-in label space (production: 1000-line imagenet label file,
# analyzer/images/models/imagenet_comp_graph_label_strings.txt)
LABELS = (
    "ostrich", "kit fox", "tiger shark", "sea lion", "container ship",
    "sports car", "espresso", "volcano", "parachute", "banjo",
    "lighthouse", "snowplow", "umbrella", "violin", "wall clock", "zebra",
)


def png_text_chunks(content: bytes) -> dict[str, str]:
    """Walk PNG chunks, return tEXt keyword→value pairs."""
    if not content.startswith(b"\x89PNG\r\n\x1a\n"):
        raise OcrError("not a PNG")
    out: dict[str, str] = {}
    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if ctype == b"tEXt" and b"\x00" in data:
            k, v = data.split(b"\x00", 1)
            out[k.decode("latin-1")] = v.decode("latin-1")
        if ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    return out


def ocr_image(content: bytes) -> str:
    """Extract text from an image. Gated: pytesseract if available."""
    if not content:
        raise OcrError("invalid asset provided")  # reference ocr.go:35-37
    try:  # pragma: no cover - not installed in this sandbox
        import io

        import pytesseract
        from PIL import Image

        return pytesseract.image_to_string(Image.open(io.BytesIO(content)))
    except ImportError:
        pass
    chunks = png_text_chunks(content)
    if "caption" not in chunks:
        raise OcrError("failed to convert image to text")
    return chunks["caption"]


def classify_image(content: bytes) -> str:
    """Deterministic classifier keyword for an image payload."""
    if not content:
        raise OcrError("invalid asset provided")
    digest = hashlib.md5(content).digest()
    return LABELS[digest[0] % len(LABELS)]


def make_png(caption: str | None = None, width: int = 1, height: int = 1) -> bytes:
    """Build a real (decodable) PNG, optionally with a tEXt caption chunk.

    Used by the fixture/bench corpus generator; kept here with the chunk
    parser so writer and reader stay in sync.
    """

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # grayscale
    raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if caption is not None:
        png += chunk(b"tEXt", b"caption\x00" + caption.encode("latin-1"))
    png += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return png
