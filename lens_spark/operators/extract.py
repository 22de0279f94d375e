"""Type dispatch + per-kind extraction (reference v2_util.go:58-96).

Branch layout over the exploded/sniffed span relation (one shared
exchange, filters above it):

- **media**      → column-only passthrough (north_star E13): text NULL,
                   stable media_ref.
- **text/plain** (textual-stored) → column-only identity projection
                   (reference `content = string(contents)`, v2_util.go:74-75).
- **text/html**  → HTML main-content sub-pipeline (operators/html_ops.py).
- **application/pdf**, **image/***, plus binary-stored payloads sniffing
  as text → ONE Arrow-batched ``mapInPandas`` (this module): PDF
  text-layer with threshold-10 OCR fallback and the ``" " + page`` join
  (reference ocr.go:41-94); image OCR with classifier-keyword fallback and
  keyword→tags (reference v2_util.go:78-92).
- anything else → quarantine row ("unsupported content type for
  indexing", reference v2_util.go:94 — per-row, never job failure).

The UDF is iterator-of-DataFrames so one Python worker amortizes library
setup across batches, and re-chunks each incoming Arrow batch by
cumulative payload bytes (cfg.max_batch_bytes) so a batch of 4-MB PDFs
can't blow executor memory even if Arrow handed us 4096 rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.extractors.ocr_stub import OcrError, classify_image, ocr_image
from lens_spark.extractors.pdf_mini import PdfError, pdf_pages

# normalized branch-output schema (pre-union, pre-reassembly)
SPAN_OUT = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("display_name", StringType()),
        StructField("offset", IntegerType()),
        StructField("kind", StringType()),       # detected branch
        StructField("text", StringType()),       # extracted content
        StructField("media_ref", StringType()),
        StructField("mime", StringType()),       # full sniffed type
        StructField("keyword", StringType()),    # image classifier keyword
        StructField("error", StringType()),      # non-null ⇒ quarantine
    ]
)

ERR_UNSUPPORTED = "unsupported content type for indexing"  # v2_util.go:94
ERR_NO_CONTENT = "failed to find content"                  # v2_util.go:40
ERR_IMAGE_CLASSIFY = "failed to categorize image"          # v2_util.go:81


def _extract_pdf(payload: bytes, cfg: ExtractConfig) -> str:
    """Reference pdfToText semantics (ocr.go:47-105): per page take the
    text layer iff len > threshold, else OCR the page image; every
    accepted piece is appended as `" " + piece`."""
    if not payload:
        raise PdfError("invalid asset provided")  # ocr.go:35-37
    text = ""
    for i, page in enumerate(pdf_pages(payload)):
        if len(page.text) > cfg.pdf_text_threshold:
            text += cfg.page_join_prefix + page.text
            continue
        if page.image is not None:
            try:
                ocr = ocr_image(page.image)
            except OcrError:
                # reference aborts the whole doc on a page OCR failure
                # (ocr.go:89-92)
                raise PdfError(f"failed to analyze page {i} of document")
            if ocr != "":
                text += cfg.page_join_prefix + ocr
    return text


def _extract_image(payload: bytes) -> tuple[str, str]:
    """Reference image path (v2_util.go:76-92): classifier keyword is
    mandatory (its failure errors the doc); OCR text is the content with
    keyword fallback; keyword is appended to tags."""
    keyword = classify_image(payload)  # raises OcrError → quarantine
    try:
        content = ocr_image(payload)
    except OcrError:
        content = keyword
    return content, keyword


def _rebatch(pdf: pd.DataFrame, max_bytes: int) -> Iterator[pd.DataFrame]:
    """Split an Arrow batch so cumulative payload bytes stay bounded."""
    sizes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
    if sizes.sum() <= max_bytes or len(pdf) <= 1:
        yield pdf
        return
    start, acc = 0, 0
    for i, n in enumerate(sizes):
        if acc + n > max_bytes and i > start:
            yield pdf.iloc[start:i]
            start, acc = i, 0
        acc += int(n)
    yield pdf.iloc[start:]


def make_extract_udf(cfg: ExtractConfig = DEFAULT):
    def extract_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for arrow_batch in it:
            for pdf_batch in _rebatch(arrow_batch, cfg.max_batch_bytes):
                yield _extract_one(pdf_batch, cfg)

    return extract_batches


def _extract_one(b: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    out: dict[str, list[Any]] = {k: [] for k in
                                 ("kind", "text", "keyword", "error")}
    for payload, parsed, family, kind_hint in zip(
        b["payload"], b["parsed"], b["family"], b["kind_hint"]
    ):
        kind, text, keyword, error = None, None, None, None
        try:
            if payload is None:
                error = ERR_NO_CONTENT
            elif parsed == "application/pdf":
                kind = "pdf"
                text = _extract_pdf(bytes(payload), cfg)
            elif family == "image":
                kind = "image"
                text, keyword = _extract_image(bytes(payload))
            elif family == "text":
                # binary-stored payload that sniffs as text: Go
                # string(contents) is a byte-preserving conversion even
                # for invalid UTF-8 (v2_util.go:74-75); latin-1 is the
                # lossless Python analogue (every byte round-trips),
                # where utf-8/replace would destroy non-UTF-8 bytes.
                # Pinned by tests/test_pipeline.py (non-UTF-8 fixture).
                kind = "text"
                text = bytes(payload).decode("latin-1")
            else:
                error = ERR_UNSUPPORTED
        except PdfError as e:
            kind, text, error = None, None, str(e) or "failed to analyze PDF"
        except OcrError:
            kind, text, error = None, None, ERR_IMAGE_CLASSIFY
        if error is not None:
            kind = kind_hint  # quarantine rows report the declared kind
        out["kind"].append(kind)
        out["text"].append(text)
        out["keyword"].append(keyword)
        out["error"].append(error)
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"].values,
            "display_name": b["display_name"].values,
            "offset": b["offset"].values,
            "kind": out["kind"],
            "text": out["text"],
            "media_ref": b["media_ref"].values,
            "mime": b["mime"].values,
            "keyword": out["keyword"],
            "error": out["error"],
        }
    )


# ------------------------------------------------------- single-pass UDF
def _span_one(b: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """One Arrow batch of lean exploded spans → SPAN_OUT rows.

    Replicates the branch semantics of :func:`dispatch` + the four
    normalizers row-for-row (pinned by tests/test_pipeline.py and the
    extract_full fixture oracle), but in ONE pass: sniff is computed
    once per span (vectorized ``sniff_series``), HTML main-content uses
    the reference-spec ``strip_html`` (bit-identical to the
    html_ops DataFrame formulation — tests/test_html.py), and
    pdf/image/binary payloads run the same ``_extract_*`` helpers as
    the branch UDF."""
    from lens_spark.extractors.html_strip import strip_html
    from lens_spark.functions.mime import SNIFF_LEN, sniff_series

    payloads = list(b["payload"])
    kinds = list(b["kind"])
    offsets = list(b["offset"])
    heads = pd.Series(
        [p[:SNIFF_LEN].decode("latin-1") if p is not None else None
         for p in payloads],
        dtype=object,
    )
    mimes = sniff_series(heads)

    out_kind: list = []
    out_text: list = []
    out_mime: list = []
    out_kw: list = []
    out_err: list = []
    for i, (payload, kind_hint, offset) in enumerate(
        zip(payloads, kinds, offsets)
    ):
        if offset is None or offset != offset:  # NaN-safe null probe:
            # posexplode_outer sentinel for zero-span docs (arrow hands
            # nullable ints to pandas as float64 NaN)
            out_kind.append("__empty__")
            out_text.append(None)
            out_mime.append(None)
            out_kw.append(None)
            out_err.append(None)
            continue
        if kind_hint == "media":
            out_kind.append("media")
            out_text.append(None)
            out_mime.append(None)
            out_kw.append(None)
            out_err.append(None)
            continue
        mime = mimes.iat[i] if payload is not None else None
        parsed = mime.split(";", 1)[0].strip() if mime is not None else None
        family = parsed.split("/", 1)[0] if parsed is not None else None
        kind, text, keyword, error = None, None, None, None
        if (
            family == "text"
            and parsed != "text/html"
            and kind_hint in ("text", "html")
        ):
            # textual-stored passthrough: payload is the UTF-8 encoding
            # of the original string, so strict decode round-trips it
            kind, text = "text", bytes(payload).decode("utf-8")
        elif parsed == "text/html":
            kind = "html"
            text = strip_html(
                bytes(payload).decode("utf-8", errors="replace"),
                cfg.html_min_text_chars,
                cfg.html_link_density_max,
            )
        else:
            try:
                if payload is None:
                    error = ERR_NO_CONTENT
                elif parsed == "application/pdf":
                    kind = "pdf"
                    text = _extract_pdf(bytes(payload), cfg)
                elif family == "image":
                    kind = "image"
                    text, keyword = _extract_image(bytes(payload))
                elif family == "text":
                    # binary-stored payload sniffing as text: lossless
                    # latin-1 (Go string(contents) parity, v2_util.go:74)
                    kind = "text"
                    text = bytes(payload).decode("latin-1")
                else:
                    error = ERR_UNSUPPORTED
            except PdfError as e:
                kind, text = None, None
                error = str(e) or "failed to analyze PDF"
            except OcrError:
                kind, text, error = None, None, ERR_IMAGE_CLASSIFY
            if error is not None:
                kind = kind_hint  # quarantine rows report the stored kind
        out_kind.append(kind)
        out_text.append(text)
        out_mime.append(mime)
        out_kw.append(keyword)
        out_err.append(error)
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"].values,
            "display_name": b["display_name"].values,
            "offset": b["offset"].values,
            "kind": out_kind,
            "text": out_text,
            "media_ref": b["media_ref"].values,
            "mime": out_mime,
            "keyword": out_kw,
            "error": out_err,
        }
    )


def make_span_udf(cfg: ExtractConfig = DEFAULT):
    def span_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for arrow_batch in it:
            for pdf_batch in _rebatch(arrow_batch, cfg.max_batch_bytes):
                yield _span_one(pdf_batch, cfg)

    return span_batches


def run_span_extract(exploded_lean: DataFrame,
                     cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """Single-pass extraction: lean exploded spans (see
    ``explode_spans_lean``) → SPAN_OUT via ONE ``mapInPandas`` stage.

    One scan, one exchange, one Python crossing — versus the branch
    formulation's five filtered subtrees, whose per-branch pushed-down
    filters defeat exchange/stage reuse (measured on Spark 4.1: five
    parquet scans, six sniff evaluations, zero ReusedExchange at
    runtime)."""
    return exploded_lean.mapInPandas(make_span_udf(cfg), schema=SPAN_OUT)


def dispatch(exploded: DataFrame, cfg: ExtractConfig = DEFAULT) -> dict:
    """Split the exploded relation into branch DataFrames.

    Returns dict of branch name → DataFrame (column sets differ; the
    pipeline normalizes each to SPAN_OUT)."""
    has_span = F.col("offset").isNotNull()
    is_empty = F.col("offset").isNull()  # posexplode_outer sentinel
    is_media = F.col("kind") == "media"
    is_html = F.col("parsed") == "text/html"
    is_plain_text = (
        (F.col("family") == "text")
        & ~is_html
        & F.col("kind").isin("text", "html")  # textual-stored: zero-copy
    )
    needs_udf = (
        F.col("payload").isNull()
        | (F.col("parsed") == "application/pdf")
        | (F.col("family") == "image")
        | ((F.col("family") == "text") & ~is_html
           & ~F.col("kind").isin("text", "html"))
        | (~F.col("family").isin("text", "image")
           & (F.col("parsed") != "application/pdf"))
    ) & ~is_media

    return {
        "empty": exploded.filter(is_empty),
        "media": exploded.filter(has_span & is_media),
        "text": exploded.filter(has_span & ~is_media & is_plain_text),
        "html": exploded.filter(has_span & ~is_media & is_html),
        "udf": exploded.filter(has_span & needs_udf),
    }


def run_extract_udf(branch: DataFrame, cfg: ExtractConfig = DEFAULT) -> DataFrame:
    cols = ["doc_id", "display_name", "offset", "payload", "parsed",
            "family", "media_ref", "mime", F.col("kind").alias("kind_hint")]
    return branch.select(*cols).mapInPandas(
        make_extract_udf(cfg), schema=SPAN_OUT
    )
