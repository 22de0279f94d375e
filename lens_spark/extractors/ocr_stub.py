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


_TESSERACT = None  # None = unresolved, False = absent, (mod, Image) else


def _tesseract_mod():
    """Memoized pytesseract+PIL resolution — same rationale as
    pdf_mini._pdfium_mod: Python re-runs the whole finder chain for
    every FAILED import, which a per-payload gate turns into the hot
    path's dominant cost."""
    global _TESSERACT
    if _TESSERACT is None:
        try:  # pragma: no cover - not installed in this sandbox
            import pytesseract
            from PIL import Image

            _TESSERACT = (pytesseract, Image)
        except ImportError:
            _TESSERACT = False
    return _TESSERACT


def ocr_image(content: bytes) -> str:
    """Extract text from an image. Gated: pytesseract if available."""
    if not content:
        raise OcrError("invalid asset provided")  # reference ocr.go:35-37
    gate = _tesseract_mod()
    if gate:  # pragma: no cover - not installed in this sandbox
        import io

        pytesseract, Image = gate
        return pytesseract.image_to_string(Image.open(io.BytesIO(content)))
    chunks = png_text_chunks(content)
    if "caption" not in chunks:
        raise OcrError("failed to convert image to text")
    return chunks["caption"]


def resize_bilinear(img, out_h: int = 224, out_w: int = 224):
    """TF ``ResizeBilinear`` with the legacy scaling the reference graph
    uses (align_corners=False: src = dst * in/out, clamp at the edge) —
    implemented from scratch in numpy so the preprocessing math is
    testable without any ML stack (reference
    analyzer/images/tensorflow.go:160-183 builds the same op graph).

    img: (H, W, C) array; returns (out_h, out_w, C) float32."""
    import numpy as np

    img = np.asarray(img, dtype="float32")
    in_h, in_w = img.shape[:2]
    ys = np.arange(out_h) * (in_h / out_h)
    xs = np.arange(out_w) * (in_w / out_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype("float32")


# Inception-v5h input constants — reference tensorflow.go:160-164:
# 224x224, (value - Mean) / Scale with Mean=117, Scale=1
INCEPTION_HW = 224
INCEPTION_MEAN = 117.0
INCEPTION_SCALE = 1.0


def preprocess_inception(img):
    """(H, W, 3) uint8 image → (1, 224, 224, 3) float32 tensor exactly as
    the reference graph feeds the Inception model: bilinear resize, then
    (x - 117) / 1, then a batch dim (tensorflow.go:171-183)."""
    r = resize_bilinear(img, INCEPTION_HW, INCEPTION_HW)
    return ((r - INCEPTION_MEAN) / INCEPTION_SCALE)[None, ...]


def _classify_real(content: bytes) -> str | None:
    """Import-gated real-model path (reference runs an Inception-v5h TF
    graph, tensorflow.go:72-91): decode → preprocess_inception → forward
    pass → argmax → label line. Activates when onnxruntime + PIL are
    installed AND ``LENS_INCEPTION_ONNX`` points at an exported model
    (``LENS_INCEPTION_LABELS`` at the 1000-line label file, reference
    analyzer/images/models/imagenet_comp_graph_label_strings.txt).
    Returns None when the stack is absent — caller falls back to the
    deterministic stub."""
    import os

    model_path = os.environ.get("LENS_INCEPTION_ONNX")
    labels_path = os.environ.get("LENS_INCEPTION_LABELS")
    if not model_path or not os.path.exists(model_path):
        return None
    try:  # pragma: no cover - ML stack not installed in this sandbox
        import io

        import numpy as np
        import onnxruntime
        from PIL import Image
    except ImportError:
        return None
    img = np.asarray(  # pragma: no cover
        Image.open(io.BytesIO(content)).convert("RGB"))
    batch = preprocess_inception(img).astype("float32")  # pragma: no cover
    sess = onnxruntime.InferenceSession(model_path)  # pragma: no cover
    probs = sess.run(  # pragma: no cover
        None, {sess.get_inputs()[0].name: batch})[0][0]
    best = int(probs.argmax())  # pragma: no cover (tensorflow.go:88-101)
    if labels_path and os.path.exists(labels_path):  # pragma: no cover
        with open(labels_path) as f:
            labels = [ln.rstrip("\n") for ln in f]
        if best < len(labels):
            return labels[best]
    return LABELS[best % len(LABELS)]  # pragma: no cover


def classify_image(content: bytes) -> str:
    """Classifier keyword for an image payload (reference E10,
    v2_util.go:78): real model when available (:func:`_classify_real`),
    else a deterministic md5-pick stub — the reference's own service
    tests stub this exact seam to a constant (v2_test.go:131)."""
    if not content:
        raise OcrError("invalid asset provided")
    real = _classify_real(content)
    if real is not None:
        return real
    digest = hashlib.md5(content).digest()
    return LABELS[digest[0] % len(LABELS)]


def make_png(
    caption: str | None = None,
    width: int = 1,
    height: int = 1,
    pixels: list[bytes] | None = None,
) -> bytes:
    """Build a real (decodable) PNG, optionally with a tEXt caption chunk.

    Used by the fixture/bench corpus generator; kept here with the chunk
    parser so writer and reader stay in sync. ``pixels`` (rows of
    grayscale bytes, all same width) overrides the default flat-0x80
    fill — the perceptual-hash fixtures need real image content; the
    default path is byte-identical to the pre-pixels version (frozen
    oracles depend on it).
    """

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    if pixels is not None:
        height = len(pixels)
        width = len(pixels[0])
        raw = b"".join(b"\x00" + bytes(r) for r in pixels)
    else:
        raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # grayscale
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if caption is not None:
        png += chunk(b"tEXt", b"caption\x00" + caption.encode("latin-1"))
    png += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return png
