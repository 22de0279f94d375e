"""BPE training/application (operators/bpe.py) vs the single-process
reference twins — merge order, greedy rewrite, application memo."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.bpe import (
    apply_bpe,
    learn_bpe,
    py_apply_bpe,
    py_learn_bpe,
    word_freqs,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [
        (90, None),
        (91, ""),
        (92, "  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_freqs(spark, docs):
    got = {r["word"]: r["n"] for r in word_freqs(docs, "text").collect()}
    assert got == {
        "low": 5, "lower": 2, "newest": 6, "wider": 3, "new": 2,
    }


def test_learn_matches_reference(spark, docs):
    want = py_learn_bpe(CORPUS + [None, "", "  "], n_merges=12)
    got = learn_bpe(docs, "text", n_merges=12)
    assert got == want
    # the classic Sennrich example: 'es' ('e','s') fuses early — newest
    # dominates; every merge has freq >= 2 and ranks are deterministic
    assert all(c >= 2 for _, _, c in got)
    assert len(got) == 12 or len(got) == len(want)


def test_learn_early_stop(spark):
    # all-distinct hapax corpus: no pair reaches freq 2 after the
    # within-word fuses are exhausted → loop stops before n_merges
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    got = learn_bpe(df, "text", n_merges=50)
    assert got == py_learn_bpe(["ab cd ef"], n_merges=50)
    assert len(got) < 50


def test_apply_matches_reference(spark, docs):
    merges = py_learn_bpe(CORPUS, n_merges=10)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, merges, "text").collect()
    }
    for r in docs.collect():
        assert out[r["doc_id"]] == py_apply_bpe(r["text"], merges), (
            r["doc_id"]
        )
    assert out[90] == [] and out[91] == [] and out[92] == []


def test_apply_roundtrip(spark, docs):
    # join('') + strip </w> markers recovers the concatenated words
    merges = py_learn_bpe(CORPUS, n_merges=8)
    rows = apply_bpe(docs, merges, "text").select(
        "doc_id",
        F.array_join("bpe_tokens", "").alias("j"),
        "text",
    ).collect()
    for r in rows:
        want = "".join((r["text"] or "").split())
        assert r["j"].replace("</w>", "") == want


def test_greedy_even_run_semantics():
    # 'aaaa' with merge (a,a): left-to-right greedy gives [aa, aa</w>]?
    # init = [a, a, a, a</w>]; fuse (a,a) -> [aa, aa, END-carrier…]
    merges = [("a", "a", 9)]
    # init [a,a,a,a</w>]: greedy fuses 0-1; position 3 carries </w> so
    # the tail stays — the classic even-run pin
    assert py_apply_bpe("aaaa", merges) == ["aa", "a", "a</w>"]
    assert py_apply_bpe("aaaaa", merges) == ["aa", "aa", "a</w>"]


@pytest.mark.parametrize("text", ["héllo wörld", "北京 大学 北京"])
def test_unicode_words(text):
    merges = py_learn_bpe([text, text], n_merges=6)
    assert py_apply_bpe(text, merges)  # no crash, non-empty


def test_unicode_parity_spark(spark):
    # code-point init parity (the (?<=.) split): CJK + accented chars
    texts = ["北京 大学 北京 大学", "héllo héllo wörld"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert learn_bpe(df, "text", n_merges=6) == py_learn_bpe(
        texts, n_merges=6
    )


def test_wordfreq_plan_single_shuffle(spark, docs):
    plan = (
        word_freqs(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange") <= 2  # partial agg + final (AQE pair)
    assert "Join" not in plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _corpus = st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFFF
                ),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=12,
    )

    @given(texts=_corpus)
    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_learn_and_apply_parity(spark, texts):
        """Random unicode corpora (incl. astral plane): distributed
        learn == reference learn, and distributed apply == reference
        apply under the learned table. One Spark job per example."""
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        want = py_learn_bpe(texts, n_merges=5)
        got = learn_bpe(df, "text", n_merges=5)
        assert got == want
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in apply_bpe(df, want, "text").collect()
        }
        for i, t in enumerate(texts):
            assert out[i] == py_apply_bpe(t, want), (i, t)
except ImportError:  # pragma: no cover
    pass
