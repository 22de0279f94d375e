"""Property-based check of the per-row invariant (BASELINE input_hint):
for ANY interleaved document — adversarial unicode, random binary
payloads wearing magic-number prefixes, duplicate-free random offsets —
the distributed pipeline's (kind, text, media_ref, order) sequence,
doc-level metadata, and quarantine rows equal the single-threaded
reference-semantics oracle's.

Each hypothesis example is one whole corpus run through ONE Spark job
(per-doc examples would pay JVM latency 100x); shrinking still works at
corpus granularity. Examples are capped (Spark jobs are ~seconds each);
the fixed seed corpus in test_pipeline.py remains the broad-coverage
gate, this adds the adversarial tail.
"""

from __future__ import annotations

import base64

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from lens_spark.corpus import docs_to_spark
from lens_spark.oracle import extract_corpus
from lens_spark.pipeline import extract

# payload prefixes that steer the sniffer into every dispatch branch:
# text, HTML, PDF, PNG, OGG (unsupported), and raw noise
_MAGIC = [
    b"",
    b"<!DOCTYPE html><html><body><p>",
    b"%PDF-",
    b"\x89PNG\r\n\x1a\n",
    b"GIF87a",
    b"OggS\x00\x02",
    b"\x00\x01\x02\x03",
]

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


_binary_payload = st.builds(
    lambda prefix, body: _b64(prefix + body),
    st.sampled_from(_MAGIC),
    st.binary(max_size=60),
)

_span = st.one_of(
    # textual-stored span
    st.builds(
        lambda t: {"kind": "text", "text": t, "media_ref": None},
        _text,
    ),
    # media span
    st.builds(
        lambda ref: {"kind": "media", "text": None, "media_ref": ref},
        st.text(alphabet="abcdef0123456789", min_size=1, max_size=12),
    ),
    # binary-stored span under a random declared kind
    st.builds(
        lambda kind, payload: {"kind": kind, "text": payload,
                               "media_ref": None},
        st.sampled_from(["blob", "pdf", "image", "audio", "bin"]),
        _binary_payload,
    ),
    # declared binary kind with garbage (non-base64) text → no-content
    st.builds(
        lambda t: {"kind": "blob", "text": t + "!!not-base64!!",
                   "media_ref": None},
        _text,
    ),
)


@st.composite
def _doc(draw, doc_no: int = 0):
    spans = draw(st.lists(_span, max_size=5))
    offsets = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=len(spans), max_size=len(spans), unique=True,
        )
    )
    return {
        "doc_id": draw(
            st.text(alphabet="abcdefghijklmnop0123456789-",
                    min_size=1, max_size=24)
        ),
        "spans": [
            {**s, "offset": off} for s, off in zip(spans, offsets)
        ],
    }


_corpus = st.lists(_doc(), min_size=1, max_size=12).map(
    # unique doc_ids (duplicate input ids are out of contract — the
    # table MERGE dedups them, but the raw pipeline is per-row)
    lambda docs: list({d["doc_id"]: d for d in docs}.values())
)


# Analyzer-parity fuzz domain: codepoints below U+0870 (Latin, Greek,
# Cyrillic, Hebrew, core Arabic) minus surrogates, marks, and format
# chars. Rationale: Java 17 carries Unicode 13 and Python 3.11 Unicode
# 14, so codepoints (re)classified between those versions — first batch
# at U+0870 — would make \p{L} itself disagree; and combining marks /
# ZWJ are the documented residual divergence (analyze() docstring). The
# contextual final-sigma mapping IS in range — the fold keeps it equal.
_analyzer_text = st.text(
    alphabet=st.characters(
        max_codepoint=0x086F,
        blacklist_categories=("Cs", "Mn", "Mc", "Me", "Cf"),
    ),
    max_size=60,
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_analyzer_text, min_size=1, max_size=60))
def test_analyzer_jvm_matches_python(spark, texts):
    """Content-side (JVM Catalyst) and query-side (Python re) analyzers
    must tokenize identically — any asymmetry silently breaks matching.
    One Spark job per example (per-string jobs would pay JVM latency)."""
    from pyspark.sql import functions as F

    from lens_spark.operators.search import _analyze_py, analyze

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, t string"
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", analyze(F.col("t")).alias("toks")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _analyze_py(t), repr(t)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_corpus)
def test_pipeline_equals_oracle_on_random_corpora(spark, rows):
    expected = extract_corpus(rows)
    res = extract(docs_to_spark(spark, rows))
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in res.extracted.collect()
    }
    quar = {
        (r["doc_id"], r["offset"]): r["error"]
        for r in res.quarantine.collect()
    }

    assert set(got) == {e["doc_id"] for e in expected if e["indexed"]}
    for e in expected:
        for off, _kind, err in e["quarantine"]:
            assert quar.get((e["doc_id"], off)) == err, (
                f"quarantine mismatch for {e['doc_id']}@{off}"
            )
        if not e["indexed"]:
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


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abc"), max_size=25).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    keep_first=st.booleans(),
)
def test_duplicate_spans_equals_bruteforce(spark, texts, keep_first):
    """duplicate_spans over a tiny vocabulary (dense window collisions,
    heavy overlap/adjacency merging — the hard paths) must equal the
    pure-Python sliding-window oracle, in both marking modes."""
    from lens_spark.operators.dedup import duplicate_spans

    from tests.test_training_ops import (
        _duplicate_spans_bruteforce, _spans_set,
    )

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "id int, text string")
    got = _spans_set(
        duplicate_spans(df, "id", "text", k=3, keep_first=keep_first)
    )
    want = _duplicate_spans_bruteforce(corpus, k=3, keep_first=keep_first)
    assert got == want, (texts, keep_first)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), max_size=40).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    max_tokens=st.integers(min_value=2, max_value=9),
    overlap=st.integers(min_value=0, max_value=8),
)
def test_chunk_documents_coverage_and_bounds(
    spark, texts, max_tokens, overlap
):
    """chunk_documents invariants on random docs: equals the pure-Python
    slicer; every chunk ≤ max_tokens; consecutive chunks share exactly
    `overlap` tokens except the clamped last; concatenating chunks minus
    their overlaps reproduces the document."""
    hypothesis.assume(overlap < max_tokens)
    from lens_spark.operators.pack import chunk_documents

    from tests.test_training_ops import _chunks_bruteforce

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "id int, text string")
    rows = chunk_documents(
        df, "id", "text", max_tokens=max_tokens, overlap=overlap
    ).collect()
    got = {
        (r["id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in rows
    }
    assert got == _chunks_bruteforce(corpus, max_tokens, overlap)
    stride = max_tokens - overlap
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["chunk_id"])):
        assert 1 <= r["n_tokens"] <= max_tokens
        ts = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(ts) == r["n_tokens"]
        by_doc.setdefault(r["id"], []).append(ts)
    for i, txt in corpus:
        want = [t for t in txt.split(" ") if t]
        chunks = by_doc.get(i, [])
        if not want:
            assert chunks == []
            continue
        # chunk j starts at j*stride — rebuild positionally, asserting
        # overlapping regions agree token-for-token
        rebuilt = {}
        for j, c in enumerate(chunks):
            for o, t in enumerate(c):
                pos = j * stride + o
                assert rebuilt.get(pos, t) == t  # overlaps agree
                rebuilt[pos] = t
        assert [rebuilt[p] for p in sorted(rebuilt)] == want


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.just(""),
            st.text(alphabet="ab .\n", max_size=60),
            st.lists(
                st.sampled_from(["the quick fox runs.", "lorem ipsum",
                                 "a { brace", "and that was all of it."]),
                min_size=1, max_size=8,
            ).map("\n".join),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_curate_invariants_on_random_corpora(spark, texts):
    """curate() structural invariants on arbitrary junk: annotated keeps
    every input row (annotate-don't-drop), curated ⊆ kept, and the
    report's stage counts partition the input exactly."""
    from lens_spark.curate import curate, curation_report

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(df, exactsubstr_k=3, classifier_min=0.4)
    ann = res.annotated.select("doc_id", "kept").collect()
    assert len(ann) == len(rows)
    kept_ids = {r["doc_id"] for r in ann if r["kept"] == 1}
    cur = res.curated.select("doc_id").collect()
    assert {r["doc_id"] for r in cur} == kept_ids
    rep = curation_report(res.annotated)
    assert rep["input_docs"] == len(rows)
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_classifier"] + rep["dropped_exact_dup"]
        + rep["dropped_near_dup"] + rep["kept_docs"]
    ) == rep["input_docs"]


def _dedup_lines_py(corpus, keep_first=True, min_line_chars=1):
    """Single-threaded reference for dedup_lines: global first = min
    (id, pos); returns {id: (clean_text_or_None, n_removed)}."""
    from collections import Counter

    lines = []
    for i, t in corpus:
        if t is None:
            continue
        for p, ln in enumerate(t.split("\n")):
            lines.append((i, p, ln))
    cnt = Counter(ln for _, _, ln in lines)
    first = {}
    for i, p, ln in sorted(lines):
        first.setdefault(ln, (i, p))
    out = {}
    for i, t in corpus:
        if t is None:
            out[i] = (None, 0)
            continue
        kept, removed = [], 0
        for p, ln in enumerate(t.split("\n")):
            dup = len(ln) >= min_line_chars and cnt[ln] >= 2
            rm = dup and (not keep_first or first[ln] != (i, p))
            if rm:
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), removed)
    return out


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(["", "x", "aa bb", "cc dd", "ee"]),
                max_size=6,
            ).map("\n".join),
        ),
        min_size=1,
        max_size=8,
    ),
    keep_first=st.booleans(),
)
def test_dedup_lines_equals_python_oracle(spark, texts, keep_first):
    """dedup_lines over a tiny line vocabulary (dense cross-document
    collisions, empty lines, null docs) must equal the single-threaded
    reference in both modes."""
    from lens_spark.operators.dedup import dedup_lines

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "id int, text string")
    got = {
        r["id"]: (r["text"], r["n_removed_lines"])
        for r in dedup_lines(df, "id", "text",
                             keep_first=keep_first).collect()
    }
    want = _dedup_lines_py(corpus, keep_first=keep_first)
    assert got == want, (texts, keep_first)


# ----------------------- selection ops vs naive global rules (fuzzed)
_score = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    st.none(),
)
_sel_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _score,
              st.integers(0, 50), st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=120, unique_by=lambda t: t[0],
)


def _cell(x, scale=1_000_000):
    import math

    return math.floor(x * scale + 0.5)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_sel_rows, budget=st.integers(1, 2000),
       k=st.integers(1, 30), n_bins=st.integers(1, 12))
def test_selection_ops_match_naive_rules(spark, rows, budget, k, n_bins):
    """token_budget_select / quantile_bins / top_k_per_group equal
    their naive global formulations on adversarial inputs: negative
    scores (negative grid cells), heavy ties, nulls, degenerate
    single-row groups. One Spark job per op per example."""
    from lens_spark.operators.mixing import (
        quantile_bins, token_budget_select, top_k_per_group,
    )

    df = spark.createDataFrame(
        rows, "id long, score double, tok long, grp string")

    # token budget: keep while running total BEFORE the doc < budget
    kept, cum = set(), 0
    for i, s, t, _ in sorted(
        (r for r in rows if r[1] is not None),
        key=lambda r: (-r[1], r[0]),
    ):
        if cum < budget:
            kept.add(i)
        cum += t
    got = {r["id"] for r in token_budget_select(
        df, "id", "score", "tok", budget).collect()}
    assert got == kept

    # quantile bins: floor(rank0 * n / N) on the quantized grid
    vals = sorted(_cell(s) for _, s, _, _ in rows if s is not None)
    want_bins = {}
    for i, s, _, _ in rows:
        if s is None:
            want_bins[i] = None
        else:
            rank0 = sum(1 for v in vals if v < _cell(s))
            want_bins[i] = (rank0 * n_bins) // len(vals)
    got_bins = {r["id"]: r["qbin"] for r in quantile_bins(
        df, "score", n_bins=n_bins).collect()}
    assert got_bins == want_bins

    # per-group top-k: score desc, id asc, first k per group
    want_top = set()
    for g in {r[3] for r in rows}:
        members = sorted(
            ((i, s) for i, s, _, gg in rows
             if gg == g and s is not None),
            key=lambda t: (-t[1], t[0]),
        )
        want_top |= {i for i, _ in members[:k]}
    got_top = {r["id"] for r in top_k_per_group(
        df, "grp", "score", k, "id").collect()}
    assert got_top == want_top
