"""PDF extraction semantics (reference analyzer/ocr/ocr.go:47-105):
threshold-10 text-vs-OCR per page, " "+page join, per-doc error on page
OCR failure. Fixtures model ocr_test.go:23-49 (text.pdf / scan.pdf)."""

from __future__ import annotations

import pytest

from lens_spark.config import DEFAULT
from lens_spark.corpus import make_pdf
from lens_spark.extractors.ocr_stub import make_png, png_text_chunks
from lens_spark.extractors.pdf_mini import PdfError, parse_pdf_mini
from lens_spark.operators.extract import _extract_pdf


def test_parse_text_pages_in_order():
    pdf = make_pdf([
        {"lines": ["A Simple PDF File", "first page body"]},
        {"lines": ["continued from page 1"]},
    ])
    pages = parse_pdf_mini(pdf)
    assert len(pages) == 2
    assert pages[0].text == "A Simple PDF File\nfirst page body"
    assert pages[1].text == "continued from page 1"
    assert pages[0].image is None


def test_parse_escapes():
    pdf = make_pdf([{"lines": ["parens (nested) and \\ backslash"]}])
    assert parse_pdf_mini(pdf)[0].text == "parens (nested) and \\ backslash"


def test_scanned_page_carries_image():
    pdf = make_pdf([{"caption": "Dear Pete"}])
    pages = parse_pdf_mini(pdf)
    assert len(pages[0].text) <= 10  # below reference threshold, ocr.go:41
    assert pages[0].image is not None
    assert png_text_chunks(pages[0].image)["caption"] == "Dear Pete"


def test_extract_text_path_join_rule():
    # each accepted page appended as " " + page (ocr.go:73) → leading space
    pdf = make_pdf([
        {"lines": ["A Simple PDF File"]},
        {"lines": ["continued from page 1"]},
    ])
    got = _extract_pdf(pdf, DEFAULT)
    assert got == " A Simple PDF File continued from page 1"


def test_extract_ocr_fallback_path():
    pdf = make_pdf([
        {"lines": ["A text layer long enough to keep"]},
        {"caption": "Probably you have seen this"},
    ])
    got = _extract_pdf(pdf, DEFAULT)
    assert got == (" A text layer long enough to keep"
                   " Probably you have seen this")


def test_threshold_boundary():
    # len(page) > 10 keeps text (strict >, ocr.go:71): 10 chars → OCR path;
    # page has no image → nothing appended for it
    pdf = make_pdf([{"lines": ["exactly10!"]}])
    assert _extract_pdf(pdf, DEFAULT) == ""
    pdf11 = make_pdf([{"lines": ["exactly11!!"]}])
    assert _extract_pdf(pdf11, DEFAULT) == " exactly11!!"


def test_empty_and_garbage_error():
    with pytest.raises(PdfError):
        _extract_pdf(b"", DEFAULT)  # ocr.go:35-37
    with pytest.raises(PdfError):
        parse_pdf_mini(b"%PDF-1.4\nnot really")


def test_ocr_failure_aborts_doc():
    # scanned page whose embedded PNG has no caption → OCR fails →
    # per-doc error (ocr.go:89-92)
    png = make_png(caption=None)
    body = make_pdf([{"caption": "x"}])
    broken = body.replace(make_png(caption="x"), png)
    with pytest.raises(PdfError, match="failed to analyze page 0"):
        _extract_pdf(broken, DEFAULT)
