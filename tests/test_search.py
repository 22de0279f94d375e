"""Search-tier behavioral spec: the reference's 14-case query matrix
(engine/engine_test.go:151-229) over an indexed test object, plus the
empty-query / no-results / remove semantics (v2.go, engine.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.search import (
    EmptyQueryError, NoResultsError, Query, search, search_or_raise, tokenize,
)
from lens_spark.schema import EXTRACTED

TEST_CONTENT = (
    "You are currently using an enterprise storage solution powered by\n"
    "\t\t\tTemporal, an API built for the Interplanetary File System. This platform\n"
    "\t\t\tshowcases the outstanding features that decentralized storage technologies\n"
    "\t\t\tcan offer you."
)


STAMP = __import__("datetime").datetime(2026, 1, 2, 3, 4, 5)


@pytest.fixture(scope="module")
def indexed(spark):
    # the analogue of the indexed testObj (engine_test.go:115-129)
    rows = [
        (
            "abcde",
            [("text", TEST_CONTENT, None, 1)],
            "text",
            "amazing startup",
            ["test", "object"],
            "my test object!",
            STAMP,
            "lens-spark-test",
        ),
        (
            "other",
            [("text", "completely unrelated words here", None, 1)],
            "application/pdf",
            "pdf",
            ["misc"],
            "other doc",
            STAMP,
            "lens-spark-test",
        ),
    ]
    return spark.createDataFrame(rows, schema=EXTRACTED)


# the 14-case matrix: (name, query, want_hit)
MATRIX = [
    ("hash filter ok",
     Query(text="Interplanetary File System", hashes=["abcde"]), True),
    ("hash filter wrong",
     Query(text="Interplanetary File System", hashes=["not_my_hash"]), False),
    ("subtext", Query(text="Interplanetary File System"), True),
    ("exact text", Query(text=TEST_CONTENT), True),
    ("wrong text", Query(text="robert is the best!"), False),
    ("required", Query(required=["Interplanetary"]), True),
    ("required separated",
     Query(required=[" API   ", "Interplanetary    File   System",
                     "outstanding features", "   "]), True),
    ("required missing", Query(required=["ubc launch pad"]), False),
    ("mime ok", Query(mime_types=["text"]), True),
    ("mime wrong", Query(mime_types=["unknown"]), False),
    ("category ok", Query(categories=["amazing startup"]), True),
    ("category partial must not match", Query(categories=["amazing"]), False),
    ("tag ok", Query(tags=["test"]), True),
    ("tag wrong", Query(tags=["kfc"]), False),
]


@pytest.mark.parametrize("name,q,want", MATRIX, ids=[m[0] for m in MATRIX])
def test_matrix(indexed, name, q, want):
    hits = [r["doc_id"] for r in search(indexed, q).collect()]
    assert ("abcde" in hits) == want, f"{name}: hits={hits}"


def test_metadata_projection(indexed):
    # Q8: all metadata fields except content (engine.go:177)
    row = search(indexed, Query(tags=["test"])).collect()[0]
    assert row["display_name"] == "my test object!"
    assert row["mime_type"] == "text"
    assert row["category"] == "amazing startup"
    assert row["tags"] == ["test", "object"]
    # properties.indexed projected like the reference's field list
    # (engine/index.go:20-26 includes properties.indexed)
    assert row["indexed"] == STAMP
    assert "content" not in row.asDict()
    assert "extractor_version" not in row.asDict()  # not a search field


def test_empty_query_rejected(indexed):
    with pytest.raises(EmptyQueryError):
        search(indexed, Query())  # v2.go:150-158


def test_no_results_error(indexed):
    with pytest.raises(NoResultsError):
        search_or_raise(indexed, Query(text="zzz qqq www"))


def test_required_scoring(indexed):
    # any-of semantics: both docs hit one of {storage, words}; scores are
    # positive and deterministic (tf normalized by doc length, ×100 boost
    # — query.go:52; like bleve's fieldNorm, shorter docs rank higher
    # per-hit)
    rows = search(indexed, Query(required=["storage words"])).collect()
    assert {r["doc_id"] for r in rows} == {"abcde", "other"}
    assert all(r["score"] > 0 for r in rows)
    rerun = search(indexed, Query(required=["storage words"])).collect()
    assert [(r["doc_id"], r["score"]) for r in rerun] == [
        (r["doc_id"], r["score"]) for r in rows
    ]


def test_tokenizer_semantics(spark):
    # Q6: split on ' ', drop len<=1, lowercase (query.go:80-99)
    df = spark.range(1).select(
        tokenize(F.lit("A Big  x Dog I")).alias("t")
    )
    assert df.collect()[0]["t"] == ["big", "dog"]


def test_tfidf_scoring_matches_hand_computed_lucene(spark):
    """scoring='tfidf' implements Lucene classic similarity (the bleve
    term scorer formula): sqrt(tf)·idf²·queryNorm·fieldNorm with
    idf = 1 + ln(N/(df+1)). Hand-computed on a 3-doc corpus."""
    import math

    from lens_spark.config import SearchConfig

    rows = [
        ("d1", [("text", "spark spark shuffle", None, 1)],
         "text/plain", "document", [], "d1", STAMP, "v"),
        ("d2", [("text", "spark merge", None, 1)],
         "text/plain", "document", [], "d2", STAMP, "v"),
        ("d3", [("text", "other words here", None, 1)],
         "text/plain", "document", [], "d3", STAMP, "v"),
    ]
    df = spark.createDataFrame(rows, schema=EXTRACTED)
    cfg = SearchConfig(scoring="tfidf")
    got = {r["doc_id"]: r["score"]
           for r in search(df, Query(required=["spark"]), cfg).collect()}

    n, df_spark = 3, 2
    idf = 1.0 + math.log(n / (df_spark + 1))      # = 1.0
    qnorm = 1.0 / math.sqrt(idf ** 2)             # = 1.0
    want_d1 = math.sqrt(2) * idf ** 2 * qnorm * 100 / math.sqrt(3)
    want_d2 = math.sqrt(1) * idf ** 2 * qnorm * 100 / math.sqrt(2)
    assert set(got) == {"d1", "d2"}
    assert abs(got["d1"] - want_d1) < 1e-9
    assert abs(got["d2"] - want_d2) < 1e-9
    assert got["d1"] > got["d2"]  # higher tf, longer doc — tf wins here

    # rare terms outrank common ones at equal tf on the same doc (the
    # property 'tf' scoring lacks): on d2, 'merge' (df=1) must outscore
    # 'spark' (df=2) — both appear once in the same 2-token doc
    merge = {r["doc_id"]: r["score"] for r in search(
        df, Query(required=["merge"]), cfg).collect()}
    idf_m = 1.0 + math.log(3 / 2)
    want = idf_m ** 2 * (1 / math.sqrt(idf_m ** 2)) * 100 / math.sqrt(2)
    assert abs(merge["d2"] - want) < 1e-9
    assert merge["d2"] > got["d2"]  # rarer term scores higher


def test_bm25_scoring_matches_hand_computed(spark):
    """scoring='bm25' implements Okapi BM25 with the Lucene-6+ idf
    variant: idf = ln(1+(N−df+0.5)/(df+0.5)), score = Σ idf·tf·(k1+1)/
    (tf + k1·(1−b+b·dl/avgdl)). Hand-computed on a 3-doc corpus, plus
    the two ranking properties BM25 exists for: tf saturation and doc-
    length normalization."""
    import math

    from lens_spark.config import SearchConfig

    rows = [
        ("d1", [("text", "spark spark spark spark shuffle", None, 1)],
         "text/plain", "document", [], "d1", STAMP, "v"),
        ("d2", [("text", "spark merge", None, 1)],
         "text/plain", "document", [], "d2", STAMP, "v"),
        ("d3", [("text", "other words here", None, 1)],
         "text/plain", "document", [], "d3", STAMP, "v"),
    ]
    df = spark.createDataFrame(rows, schema=EXTRACTED)
    cfg = SearchConfig(scoring="bm25")
    got = {r["doc_id"]: r["score"]
           for r in search(df, Query(required=["spark"]), cfg).collect()}

    n, df_t, k1, b = 3, 2, 1.2, 0.75
    avgdl = (5 + 2 + 3) / 3
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))

    def bm25(tf, dl):
        return (idf * 100) * (tf * (k1 + 1.0)) / (
            tf + k1 * ((1.0 - b) + (b / avgdl) * dl)
        )

    assert set(got) == {"d1", "d2"}
    assert abs(got["d1"] - bm25(4, 5)) < 1e-9
    assert abs(got["d2"] - bm25(1, 2)) < 1e-9

    # tf saturation: 4 occurrences score well under 4x one occurrence
    # at equal length — the k1 asymptote (classic tf has no such bound)
    assert got["d1"] < 4 * bm25(1, 5)
    # length normalization: same tf in a longer doc scores lower
    assert bm25(1, 5) < bm25(1, 2)

    # rare-term property: on d2, 'merge' (df=1) outranks 'spark' (df=2)
    merge = {r["doc_id"]: r["score"] for r in search(
        df, Query(required=["merge"]), cfg).collect()}
    assert merge["d2"] > got["d2"]


def test_analyzer_unicode_parity(spark):
    """ADVICE r2: the analyzer is Unicode on BOTH sides — non-ASCII
    letters are word characters ('café' stays whole, not 'caf'), and
    the JVM class, the Python query-side class, and the DuckDB oracle
    class tokenize identically."""
    import duckdb

    from lens_spark.operators.search import _analyze_py, analyze

    samples = ["Café über STRASSE 北京 a_b i18n", "naïve mañana-e2e",
               "", "___", "a-b.c"]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    jvm = [r[0] for r in
           sdf.select(analyze(F.col("text")).alias("t")).collect()]
    py = [_analyze_py(s) for s in samples]
    ddb = [duckdb.sql(
        "select list_filter(string_split_regex(lower(" + repr(s)
        + r"), '[^\p{L}\p{N}]+'), t -> len(t) > 0)").fetchone()[0]
        for s in samples]
    assert jvm == py == ddb
    assert jvm[0] == ["café", "über", "strasse", "北京", "a", "b", "i18n"]


def test_analyzer_sigma_folding(spark):
    """Greek capital sigma: JVM/Python lowercase contextually (word-final
    Σ → ς) while DuckDB/Go use the simple mapping (σ) — the analyzer
    folds every form to σ (analyzer v3, Lucene GreekLowerCaseFilter
    semantics) so all engines emit identical tokens."""
    import duckdb

    from lens_spark.operators.search import _analyze_py, analyze

    samples = ["ΑΣ ΣΟΦΟΣ", "ήδη σοφός ΉΔΗ", "τις ΤΙΣ τίς"]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    jvm = [r[0] for r in
           sdf.select(analyze(F.col("text")).alias("t")).collect()]
    py = [_analyze_py(s) for s in samples]
    ddb = [duckdb.sql(
        "select list_filter(string_split_regex(replace(lower(" + repr(s)
        + r"), 'ς', 'σ'), '[^\p{L}\p{N}]+'), t -> len(t) > 0)"
    ).fetchone()[0] for s in samples]
    assert jvm == py == ddb
    assert jvm[0] == ["ασ", "σοφοσ"]  # folded, no final-sigma form


def test_driver_phrase_query_survives_empty_docs(spark, tmp_path):
    """ADVICE r1: under ANSI mode (Spark 4 default) element_at on an
    out-of-range index kills the job; a 0- or 1-token document must not
    abort q_search_phrase ('bad rows never kill the job')."""
    import __spark_entry__ as entry

    rows = [(1, ""), (2, "word"), (3, "the fast fox"), (4, "   ")]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(
        f"{d}/documents.parquet")
    got = entry.queries()["search_phrase"](spark, d).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_stop_word_analyzer(spark):
    """bleve's standard analyzer drops Lucene's English stop set at index
    time (engine/index.go:44); the opt-in flag reproduces that on both
    content and query side."""
    from lens_spark.operators.search import (
        STOP_WORDS_EN, _analyze_py, analyze,
    )

    txt = "The quick fox and the lazy dog are not at home"
    toks = spark.range(1).select(
        analyze(F.lit(txt), remove_stop_words=True).alias("t")
    ).collect()[0]["t"]
    assert toks == ["quick", "fox", "lazy", "dog", "home"]
    assert _analyze_py(txt, remove_stop_words=True) == toks
    assert "the" in STOP_WORDS_EN and "with" in STOP_WORDS_EN


def test_ranking_order_matches_hand_computed_tf(spark):
    """Q7 ranking against a hand-computed tf fixture: score =
    boost * hits / n_tokens (query.go:52 boost x100); expected order
    derived by hand, not by re-running the engine."""
    from lens_spark.schema import EXTRACTED

    def doc(doc_id, text):
        return (doc_id, [("text", text, None, 1)], "text/plain",
                "document", [], None, STAMP, "v")

    # hits/len: a=2/4=0.5, b=1/2=0.5, c=1/4=0.25, d=0 (filtered out)
    rows = [
        doc("a", "spark spark shuffle join"),
        doc("b", "spark shuffle"),
        doc("c", "spark alpha beta gamma"),
        doc("d", "nothing relevant here either"),
    ]
    ext = spark.createDataFrame(rows, schema=EXTRACTED)
    got = search(ext, Query(required=["spark"])).collect()
    # a and b tie at 0.5 -> doc_id ascending tie-break; c third
    assert [r["doc_id"] for r in got] == ["a", "b", "c"]
    assert got[0]["score"] == pytest.approx(100 * 0.5)
    assert got[1]["score"] == pytest.approx(100 * 0.5)
    assert got[2]["score"] == pytest.approx(100 * 0.25)


def test_max_score_normalization(indexed):
    """MaxScore tracking (engine.go:190): normalized scores divide by the
    set's max — top hit is exactly 1.0, order unchanged."""
    from lens_spark.config import SearchConfig

    cfg = SearchConfig(normalize_max_score=True)
    rows = search(indexed, Query(required=["storage words"]), cfg).collect()
    plain = search(indexed, Query(required=["storage words"])).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in plain]
    assert rows[0]["score"] == pytest.approx(1.0)
    assert all(0 < r["score"] <= 1.0 for r in rows)


def test_search_deadline(indexed):
    """engine.go:196-198: the 30 s context deadline — a deadline shorter
    than any Spark job cancels the job group and raises."""
    from lens_spark.config import SearchConfig
    from lens_spark.operators.search import SearchDeadlineError

    cfg = SearchConfig(deadline_s=0.001)
    with pytest.raises(SearchDeadlineError):
        search_or_raise(indexed, Query(tags=["test"]), cfg)
    # and the engine default (engine.go:178): top_k pinned at 1000
    assert SearchConfig().top_k == 1000
    assert SearchConfig().deadline_s == 30


def test_prepared_index_skips_reanalysis(spark, indexed, tmp_path):
    """Write-time token materialization: identical results, and the
    search plan over a STORED prepared index contains no tokenizer split
    (the analysis happened at index time, like bleve)."""
    from lens_spark.operators.search import prepare_search_index
    from lens_spark.plans.inspect import formatted_plan

    path = str(tmp_path / "prepared")
    prepare_search_index(indexed).write.parquet(path)
    prepared = spark.read.parquet(path)
    q = Query(required=["storage words"])
    a = [(r["doc_id"], r["score"]) for r in search(indexed, q).collect()]
    b = [(r["doc_id"], r["score"]) for r in search(prepared, q).collect()]
    assert a == b
    plan = formatted_plan(search(prepared, q))
    assert "regexp_extract_all(" not in plan  # no re-tokenization at query time


def test_analyzer_version_guard(spark, indexed, tmp_path):
    """ADVICE r3: stored tokens are trusted only when their
    analyzer_version stamp matches the engine; a stale or missing stamp
    falls back to re-analysis (with a warning) instead of silently
    comparing differently-tokenized streams."""
    from lens_spark.operators.search import (
        ANALYZER_VERSION, prepare_search_index,
    )
    from lens_spark.plans.inspect import formatted_plan

    path = str(tmp_path / "stamped")
    prepare_search_index(indexed).write.parquet(path)
    stored = spark.read.parquet(path)
    assert stored.select("analyzer_version").first()[0] == ANALYZER_VERSION
    q = Query(required=["storage words"])
    assert "regexp_extract_all(" not in formatted_plan(search(stored, q))

    # stale stamp → re-analyzed (tokenizer back in the plan) + warning
    stale = stored.withColumn("analyzer_version", F.lit(1))
    with pytest.warns(UserWarning, match="analyzer"):
        plan_stale = formatted_plan(search(stale, q))
    assert "regexp_extract_all(" in plan_stale
    with pytest.warns(UserWarning):
        a = [r["doc_id"] for r in search(stale, q).collect()]
    assert a == [r["doc_id"] for r in search(indexed, q).collect()]

    # tokens column without any stamp (pre-stamp table, unknown
    # analyzer) → also re-analyzed
    legacy = stored.drop("analyzer_version")
    with pytest.warns(UserWarning, match="analyzer"):
        plan_legacy = formatted_plan(search(legacy, q))
    assert "regexp_extract_all(" in plan_legacy


def test_export_postings_tf_df_and_cap(spark):
    """Flat postings export: tf multiplicity, df per token, and the
    k-cap keeps highest-tf docs (tf desc, doc asc ties)."""
    from lens_spark.operators.search import export_postings

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana"),
            (3, "apple cherry"),
        ],
        "doc_id long, text string",
    )
    full = {(r.token, r.doc_id): (r.tf, r.df)
            for r in export_postings(docs).collect()}
    assert full[("apple", 1)] == (2, 3)
    assert full[("banana", 2)] == (2, 2)
    assert full[("cherry", 3)] == (1, 1)

    capped = export_postings(docs, k=2)
    apple = sorted(
        (r.doc_id, r.tf) for r in capped.filter(
            "token = 'apple'").collect())
    # apple tf: doc1=2, doc2=1, doc3=1 -> cap 2 keeps doc1 + doc2 (tie
    # at tf=1 broken by doc asc)
    assert apple == [(1, 2), (2, 1)]
