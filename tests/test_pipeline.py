"""End-to-end: distributed pipeline output must equal the single-threaded
oracle on the per-row invariant (kind, text, media_ref, order) — BASELINE
input_hint — plus doc-level metadata and quarantine semantics."""

from __future__ import annotations

from lens_spark.corpus import docs_to_spark, gen_docs
from lens_spark.oracle import extract_corpus
from lens_spark.pipeline import extract


def _run(spark, rows):
    res = extract(docs_to_spark(spark, rows))
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in res.extracted.collect()
    }
    quar = {
        (r["doc_id"], r["offset"]): r["error"]
        for r in res.quarantine.collect()
    }
    return got, quar


def test_span_sequence_equality(spark):
    rows = gen_docs(60, seed=42, with_edge_rows=True)
    expected = extract_corpus(rows)
    got, quar = _run(spark, rows)

    assert set(got) == {e["doc_id"] for e in expected if e["indexed"]}
    for e in expected:
        if not e["indexed"]:
            for off, kind, err in e["quarantine"]:
                assert quar.get((e["doc_id"], off)) == err
            continue
        g = got[e["doc_id"]]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in g["spans"]
        ]
        assert got_spans == e["spans"], f"span mismatch for {e['doc_id']}"
        assert g["mime_type"] == e["mime_type"], e["doc_id"]
        assert g["category"] == e["category"], e["doc_id"]
        assert g["tags"] == e["tags"], e["doc_id"]
        for off, kind, err in e["quarantine"]:
            assert quar.get((e["doc_id"], off)) == err


def test_binary_stored_text_is_byte_preserving(spark):
    """Go string(contents) keeps raw bytes even when they are invalid
    UTF-8 (v2_util.go:74-75). The Python analogue is a lossless latin-1
    decode: every input byte must survive into the extracted text —
    utf-8/replace would turn 0xE9 into U+FFFD (VERDICT r3 #4)."""
    import base64

    payload = b"caf\xe9 au lait \xff\xfe raw bytes"  # invalid UTF-8
    rows = [{
        "doc_id": "doc-raw-bytes",
        "spans": [{"kind": "blob",
                   "text": base64.b64encode(payload).decode("ascii"),
                   "media_ref": None, "offset": 1}],
    }]
    expected = extract_corpus(rows)[0]
    got, quar = _run(spark, rows)

    text = got["doc-raw-bytes"]["spans"][0]["text"]
    # exact pinned output: each byte mapped to its Unicode codepoint
    assert text == payload.decode("latin-1")
    assert text.encode("latin-1") == payload  # round-trips, lossless
    assert "�" not in text
    # oracle and pipeline agree
    assert expected["spans"][0][1] == text
    assert not quar


def test_edge_rows(spark):
    rows = gen_docs(0, with_edge_rows=True)
    got, quar = _run(spark, rows)

    empty = got["doc-edge-empty"]
    assert empty["spans"] == [] and empty["category"] == "unknown"
    assert empty["mime_type"] == "unknown"  # engine.go:130-137 defaulting

    solo = got["doc-edge-media-only"]
    assert solo["spans"] == [
        {"kind": "media", "text": None, "media_ref": "ref-solo", "order": 1}
    ]
    assert solo["category"] == "unknown"

    assert quar[("doc-edge-unsupported", 1)] == (
        "unsupported content type for indexing"  # v2_util.go:94
    )
    # every span failed → never indexed (magnify error semantics)
    assert "doc-edge-unsupported" not in got
    # empty string payload sniffs as text/plain → passthrough "" (Go
    # DetectContentType of empty input)
    ep = got["doc-edge-empty-payload"]
    assert ep["spans"][0]["text"] == "" and ep["category"] == "document"
