"""Single-threaded pure-Python oracle — reference semantics end-to-end.

Reimplements the magnify→store flow (reference v2_util.go:22-116) per span
over the interleaved data model, with no Spark involvement: plain loops in
document/offset order. The distributed pipeline's output must match this
row-for-row on (kind, text, media_ref, order) — the per-row invariant from
BASELINE.json input_hint.

The Go binary is not runnable in-sandbox, so goldens frozen from this
oracle stand in for the reference's extracted output (documented
SURVEY.md §7.3); every constant it applies (threshold 10, " "+page join,
keyword fallback, unknown-defaulting) carries a file:line citation back to
the Go source in the modules it calls.
"""

from __future__ import annotations

import base64

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.extractors.html_strip import strip_html
from lens_spark.extractors.ocr_stub import OcrError, classify_image, ocr_image
from lens_spark.extractors.pdf_mini import PdfError, pdf_pages
from lens_spark.functions.mime import sniff_bytes


def _payload_bytes(kind: str, text: str | None) -> bytes | None:
    if kind == "media":
        return None
    if text is None:
        return None
    if kind in ("text", "html"):
        return text.encode("utf-8")
    try:
        return base64.b64decode(text, validate=True)
    except Exception:
        return None


def _extract_pdf(payload: bytes, cfg: ExtractConfig) -> str:
    text = ""
    for i, page in enumerate(pdf_pages(payload)):
        if len(page.text) > cfg.pdf_text_threshold:  # ocr.go:71
            text += cfg.page_join_prefix + page.text  # ocr.go:73
            continue
        if page.image is not None:
            try:
                ocr = ocr_image(page.image)
            except OcrError:
                raise PdfError(f"failed to analyze page {i} of document")
            if ocr != "":
                text += cfg.page_join_prefix + ocr  # ocr.go:94
    return text


def extract_doc(doc: dict, cfg: ExtractConfig = DEFAULT) -> dict:
    """One document → {doc_id, spans, mime_type, category, tags,
    quarantine:[(offset, kind, error)]}."""
    out_spans, tags, quar = [], [], []
    first_mime = None
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        kind_in, text_in = span["kind"], span["text"]
        offset, media_ref = span["offset"], span["media_ref"]
        if kind_in == "media":
            out_spans.append(("media", None, media_ref, offset))
            continue
        payload = _payload_bytes(kind_in, text_in)
        if payload is None:
            quar.append((offset, kind_in, "failed to find content"))
            continue
        mime = sniff_bytes(payload)  # v2_util.go:42
        parsed = mime.split(";")[0].strip()  # v2_util.go:52
        family = parsed.split("/")[0]  # v2_util.go:68
        try:
            if parsed == "application/pdf":
                kind, text = "pdf", _extract_pdf(payload, cfg)
            elif parsed == "text/html":
                # target-only capability (north_star); reference would
                # pass text/* through verbatim (v2_util.go:73-75)
                kind = "html"
                text = strip_html(
                    payload.decode("utf-8", errors="replace"),
                    cfg.html_min_text_chars,
                    cfg.html_link_density_max,
                )
            elif family == "text":
                kind = "text"
                if kind_in in ("text", "html"):
                    # string-stored span: the payload was never bytes, so
                    # this is an identity passthrough (pipeline._norm_text,
                    # dispatch `is_plain_text`) — NOT a decode of the
                    # utf-8 re-encoding (which would mojibake non-ASCII).
                    text = text_in
                else:
                    # binary-stored payload sniffing as text: Go
                    # string(contents) byte-passthrough → lossless latin-1
                    # (v2_util.go:74-75), mirroring operators/extract.py
                    text = payload.decode("latin-1")
            elif family == "image":
                kind = "image"
                keyword = classify_image(payload)
                try:
                    text = ocr_image(payload)
                except OcrError:
                    text = keyword  # v2_util.go:88
                tags.append(keyword)  # v2_util.go:92
            else:
                quar.append(
                    (offset, kind_in, "unsupported content type for indexing")
                )
                continue
        except PdfError as e:
            quar.append((offset, kind_in, str(e) or "failed to analyze PDF"))
            continue
        except OcrError:
            quar.append((offset, kind_in, "failed to categorize image"))
            continue
        if first_mime is None:
            first_mime = mime
        out_spans.append((kind, text, media_ref, offset))

    mime_type = first_mime if first_mime is not None else "unknown"
    parsed = mime_type.split(";")[0].strip()
    family = parsed.split("/")[0]
    if parsed == "application/pdf":
        category = "pdf"
    elif family == "text":
        category = "document"
    elif family == "image":
        category = "image"
    else:
        category = "unknown"  # engine.go:130-137
    return {
        "doc_id": doc["doc_id"],
        "spans": out_spans,
        "mime_type": mime_type,
        "category": category,
        "tags": tags,
        "quarantine": quar,
        # a doc appears in the output iff at least one span succeeded, or
        # it had no spans at all (vacuous success). A doc whose every span
        # failed is never indexed — reference magnify error semantics
        # (v2_util.go:62-65,94).
        "indexed": bool(out_spans) or len(doc["spans"]) == 0,
    }


def extract_corpus(rows: list[dict], cfg: ExtractConfig = DEFAULT) -> list[dict]:
    return [extract_doc(r, cfg) for r in rows]
