"""Minimal PDF text-layer extraction.

The reference pulls the text layer per page with MuPDF (go-fitz
``doc.Text(i)``, analyzer/ocr/ocr.go:66-74) and falls back to
render-page→OCR when a page's text layer is ≤ 10 chars (ocr.go:41,71,78-96).

In this environment no PDF library is installed, so extraction is gated:

1. if ``pypdfium2`` is importable, use it (production path on a real
   cluster image);
2. otherwise fall back to :func:`parse_pdf_mini`, a from-scratch parser for
   the uncompressed-content-stream subset of PDF that our deterministic
   fixture corpus emits (``lens_spark.corpus.make_pdf``). It resolves the
   page tree (Catalog → Pages → Kids order), pulls ``Tj``/``TJ`` text
   runs per page, and surfaces each page's image XObject bytes for the
   OCR fallback.

Either way the *semantics* applied by the caller are the reference's:
threshold-10 text-vs-OCR choice and the ``" " + page`` join (ocr.go:71-94).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class PdfError(Exception):
    """Raised when a document cannot be parsed — the caller converts this
    into a quarantine row (the reference errors the whole RPC,
    ocr.go:59,84,92; a Spark job must not die per bad row)."""


@dataclass
class PdfPage:
    text: str = ""
    image: bytes | None = None  # page image XObject (OCR fallback input)


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+\d+\s+R")
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\[\]\\]|\\.)*\]\s*TJ")
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    if b"\\" not in raw:  # escape-free fast path — the common case; the
        return raw        # per-byte loop below only pays when needed
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return bytes(out)


# hot-path patterns precompiled once: building `rb"/" + key + ...` per
# call costs a re-cache dict probe per PDF object (profiled)
_REF_RES = {
    key: re.compile(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R")
    for key in (b"Pages", b"Contents")
}
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_KID_ID_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_XOBJ_RE = re.compile(rb"/XObject\s*<<\s*/\w+\s+(\d+)\s+\d+\s+R")


def _ref(body: bytes, key: bytes) -> int | None:
    pat = _REF_RES.get(key)
    if pat is None:
        pat = re.compile(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R")
    m = pat.search(body)
    return int(m.group(1)) if m else None


def parse_pdf_mini(content: bytes) -> list[PdfPage]:
    """Parse the fixture-subset of PDF into ordered pages."""
    if not content.startswith(b"%PDF-"):
        raise PdfError("failed to analyze PDF")  # ocr.go:59
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(content):
        objs[int(m.group(1))] = m.group(2)

    pages_obj = None
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            ref = _ref(body, b"Pages")
            if ref is not None:
                pages_obj = objs.get(ref)
            break
    if pages_obj is None:
        raise PdfError("failed to analyze PDF")  # ocr.go:59

    kids_m = _KIDS_RE.search(pages_obj)
    if not kids_m:
        raise PdfError("failed to analyze PDF")  # ocr.go:59
    kid_ids = [int(g) for g in _KID_ID_RE.findall(kids_m.group(1))]

    pages: list[PdfPage] = []
    for kid in kid_ids:
        body = objs.get(kid)
        if body is None:
            raise PdfError("failed to analyze PDF")  # ocr.go:59
        page = PdfPage()
        cref = _ref(body, b"Contents")
        if cref is not None and cref in objs:
            sm = _STREAM_RE.search(objs[cref])
            if sm:
                page.text = _extract_text_runs(sm.group(1))
        # page image XObject (the scanned-page payload for OCR fallback)
        xm = _XOBJ_RE.search(body)
        if xm and int(xm.group(1)) in objs:
            im = _STREAM_RE.search(objs[int(xm.group(1))])
            if im:
                page.image = im.group(1)
        pages.append(page)
    return pages


def _extract_text_runs(stream: bytes) -> str:
    """Pull text-showing operators (Tj / TJ) from a content stream.

    Runs are joined with newlines, approximating a text-layer reader's
    per-line output. The fixture corpus emits one Tj per visual line, so
    this is exact for our goldens.
    """
    runs: list[str] = []
    append = runs.append
    for m in _TJ_RE.finditer(stream):
        # findall (no groups → whole-match strings) skips ~20 Match
        # objects per page vs finditer — this loop is the parser's
        # hottest line (profiled on the bench corpus)
        for s in _STR_RE.findall(m.group(0)):
            append(_unescape(s[1:-1]).decode("latin-1"))
    return "\n".join(runs)


_PDFIUM = None  # None = unresolved, False = absent, module when present


def _pdfium_mod():
    """Resolve pypdfium2 once per interpreter. Python does NOT cache
    FAILED imports — a per-call try/except ImportError re-runs the full
    sys.path finder machinery on every payload (measured: the import
    machinery was ~58% of the extract UDF's CPU on the seed-corpus
    payload mix), so the absence is memoized in a module global. Spark's
    reused python workers then pay the lookup once per executor."""
    global _PDFIUM
    if _PDFIUM is None:
        try:  # pragma: no cover - not installed in this sandbox
            import pypdfium2 as pdfium

            _PDFIUM = pdfium
        except ImportError:
            _PDFIUM = False
    return _PDFIUM


def pdf_pages(content: bytes) -> list[PdfPage]:
    """Gated entry: real library if present, else the mini parser."""
    pdfium = _pdfium_mod()
    if pdfium:  # pragma: no cover - not installed in this sandbox
        doc = pdfium.PdfDocument(content)
        out = []
        for p in doc:
            tp = p.get_textpage()
            out.append(PdfPage(text=tp.get_text_bounded()))
        return out
    return parse_pdf_mini(content)
