"""End-to-end curate() pipeline: a crafted corpus where each document
dies at exactly one known stage (or survives), asserted via the
annotated flags, the curated output, and the one-pass report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.curate import curate, curation_report

# A Gopher-passing base line: 10 words incl. stop words, terminal
# punctuation, mean word length in range. Repeated 6x = 60 words ≥ 50.
_LINE = "the quick brown fox jumps over that lazy sleepy dog."
_GOOD = "\n".join([_LINE] * 6)


def _corpus(spark):
    rows = [
        # 1: survives everything
        (1, _GOOD),
        # 2: near-identical to 1 (one word differs) → minhash near-dup,
        # loses to the smaller id
        (2, _GOOD.replace("sleepy dog", "drowsy dog", 1)),
        # 3: exact duplicate of 1 (post-redaction bytes equal) → exact
        # dedup drops it before the near-dup leg ever sees it
        (3, _GOOD),
        # 4: C4 kills it (lorem ipsum flag)
        (4, _GOOD + "\nlorem ipsum dolor sit amet."),
        # 5: C4 line rules leave nothing (no terminal punctuation)
        (5, "no punctuation here at all\nstill none"),
        # 6: passes C4, fails Gopher (only 10 words < 50)
        (6, _LINE),
        # 7: survives, with PII to redact (distinct base text so the
        # near-dup leg cannot cluster it with doc 1)
        (7, "\n".join(
            ["a big shiny table sits with the warm lamp tonight."] * 6
        ).replace("warm lamp", "lamp bob@mail.example.org", 1)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def result(spark):
    res = curate(_corpus(spark))
    flags = {
        r["doc_id"]: r
        for r in res.annotated.select(
            "doc_id", "c4_keep", "gopher_keep", "exact_keeper",
            "neardup_keep", "kept",
        ).collect()
    }
    curated = {r["doc_id"]: r for r in res.curated.collect()}
    report = curation_report(res.annotated)
    return flags, curated, report


def test_stage_attribution(result):
    flags, _, _ = result
    assert flags[1]["kept"] == 1
    assert flags[2]["neardup_keep"] == 0 and flags[2]["c4_keep"] == 1
    assert flags[3]["exact_keeper"] == 0
    assert flags[4]["c4_keep"] == 0
    assert flags[5]["c4_keep"] == 0
    assert flags[6]["c4_keep"] == 1 and flags[6]["gopher_keep"] == 0
    assert flags[7]["kept"] == 1


def test_curated_output(result):
    _, curated, _ = result
    assert set(curated) == {1, 7}
    assert curated[7]["n_email"] == 1
    assert "<EMAIL>" in curated[7]["text"]
    assert curated[1]["lang"] == "en"
    assert 0.0 <= curated[1]["quality"] <= 1.0


def test_report_accounting(result):
    _, _, rep = result
    assert rep["input_docs"] == 7
    assert rep["dropped_c4"] == 2          # docs 4, 5
    assert rep["dropped_gopher"] == 1      # doc 6
    assert rep["dropped_exact_dup"] == 1   # doc 3
    assert rep["dropped_near_dup"] == 1    # doc 2
    assert rep["kept_docs"] == 2           # docs 1, 7
    assert rep["emails_redacted"] == 1
    # stage counts partition the input exactly
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_exact_dup"] + rep["dropped_near_dup"]
        + rep["kept_docs"]
    ) == rep["input_docs"]


def test_exact_keeper_prefers_surviving_copy(spark):
    """A c4-dropped doc with the SMALLER id must not win the exact-dedup
    keeper slot from its surviving twin — the survivor keeps, otherwise
    the content would vanish entirely (dropped copy dies at c4, kept
    copy dies as 'exact dup')."""
    rows = [
        # doc 1: _GOOD plus a brace line → identical clean/redacted text
        # to doc 2, but has_brace kills it at the c4 stage
        (1, _GOOD + "\nconfig = { }"),
        (2, _GOOD),
    ]
    res = curate(spark.createDataFrame(rows, "doc_id long, text string"))
    flags = {
        r["doc_id"]: r
        for r in res.annotated.select(
            "doc_id", "c4_keep", "exact_keeper", "kept"
        ).collect()
    }
    assert flags[1]["c4_keep"] == 0
    assert flags[2]["exact_keeper"] == 1 and flags[2]["kept"] == 1
    rep = curation_report(res.annotated)
    assert rep["kept_docs"] == 1 and rep["dropped_exact_dup"] == 0


def test_exactsubstr_stage(spark):
    """exactsubstr_k appends leave-one-copy substring deletion over the
    kept docs: doc-level survivors sharing a long substring keep exactly
    one copy of it, no document is dropped, untouched docs report 0."""
    shared = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima."
    )
    # Gopher-passing bodies (≥50 words, stop words, terminal punct);
    # line templates keep every intra-doc common run under k=12 tokens
    # and the two docs share no vocabulary beyond the planted sentence,
    # so minhash never flags them as whole-doc near-dups
    body10 = "\n".join(
        f"the people said that water was near the {w} mountain today."
        for w in ("amber", "coral", "onyx", "jade", "slate", "flint")
    )
    body20 = "\n".join(
        f"a curious child found some bright {w} stones and kept {w} "
        "near the river."
        for w in ("red", "blue", "green", "white", "black", "golden")
    )
    rows = [
        (1, _GOOD),
        (10, shared + "\n" + body10),
        (20, shared + "\n" + body20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(df, exactsubstr_k=12)
    out = {r["doc_id"]: r for r in res.curated.collect()}
    assert set(out) == {1, 10, 20}
    # _GOOD is the same 10-token line repeated 6x — periodic text, so
    # every k-window past the first period is an intra-doc repeat and
    # keep_first leaves exactly the first 10 tokens (60 − 10 = 50
    # removed): substring dedup catches within-doc repetition that
    # whole-doc dedup structurally cannot
    assert out[1]["n_removed_tokens"] == 50
    # doc 10 (first occurrence) keeps the shared sentence; doc 20 loses
    # its 12 tokens
    assert out[10]["n_removed_tokens"] == 0
    assert out[20]["n_removed_tokens"] == 12
    assert "alpha bravo" in out[10]["text"]
    assert "alpha bravo" not in out[20]["text"]
    assert "curious child" in out[20]["text"]
    # off by default: no n_removed_tokens column, identical behavior
    assert "n_removed_tokens" not in curate(df).curated.columns


def test_curate_job_run(spark, tmp_path):
    """The spark-submit job logic end-to-end in-process: writes
    curated/ + annotated/ parquet and returns the attrition report."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curate_job",
        os.path.join(os.path.dirname(__file__), "..", "jobs",
                     "curate_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    rows = [
        (1, _GOOD),
        (2, _GOOD),  # exact dup → dropped
        (3, "no punct no stops"),  # c4 kills every line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "cur")
    report = job.run(spark, df, out, chunk=(8, 2))
    assert report["input_docs"] == 3
    assert report["kept_docs"] == 1
    assert report["dropped_exact_dup"] == 1
    assert report["chunked"] is True
    chunks = spark.read.parquet(f"{out}/curated")
    assert chunks.columns == ["doc_id", "chunk_id", "n_tokens",
                              "chunk_text"]
    assert chunks.filter(F.col("n_tokens") > 8).count() == 0
    assert report["output_rows"] == chunks.count() > 0
    ann = spark.read.parquet(f"{out}/annotated")
    assert ann.count() == 3 and "kept" in ann.columns


def test_classifier_stage(spark):
    """classifier_min inserts the model-based quality gate: with
    all-positive weights every doc scores > 0.5 (all kept); with
    all-negative weights every doc scores < 0.5 (all dropped at the
    classifier stage, attributed there in the report)."""
    df = spark.createDataFrame(
        [(1, _GOOD), (2, _GOOD.replace("sleepy", "sleepy cat", 1))],
        "doc_id long, text string",
    )
    pos = [1000] * 64
    res_keep = curate(
        df, classifier_min=0.5, classifier_dim=64, classifier_weights=pos
    )
    rep = curation_report(res_keep.annotated)
    assert rep["dropped_classifier"] == 0
    assert rep["kept_docs"] >= 1
    neg = [-1000] * 64
    res_drop = curate(
        df, classifier_min=0.5, classifier_dim=64, classifier_weights=neg
    )
    rep2 = curation_report(res_drop.annotated)
    assert rep2["kept_docs"] == 0
    assert rep2["dropped_classifier"] == 2
    assert res_drop.curated.count() == 0
    # partition invariant holds with the new stage in the sum
    assert (
        rep2["dropped_c4"] + rep2["dropped_gopher"]
        + rep2["dropped_classifier"] + rep2["dropped_exact_dup"]
        + rep2["dropped_near_dup"] + rep2["kept_docs"]
    ) == rep2["input_docs"]
    # stage off by default: clf_keep constant 1, key present and zero
    rep3 = curation_report(curate(df).annotated)
    assert rep3["dropped_classifier"] == 0


def test_extract_then_curate_product_flow(spark, tmp_path):
    """The two deployment surfaces compose: extract a corpus, feed the
    extracted table's content column straight into the curation job."""
    import importlib.util
    import os

    from lens_spark.corpus import docs_to_spark, gen_docs
    from lens_spark.operators.resume import run_resumable
    from lens_spark.sources.tables import LensTable

    docs = docs_to_spark(spark, gen_docs(40, seed=11))
    out_t = LensTable(str(tmp_path / "extracted"))
    ckpt = LensTable(str(tmp_path / "checkpoint"))
    run_resumable(spark, docs, out_t, ckpt, input_snapshot_id="t")
    extracted = out_t.read(spark)
    assert "content" in extracted.columns and "doc_id" in extracted.columns

    spec = importlib.util.spec_from_file_location(
        "curate_job2",
        os.path.join(os.path.dirname(__file__), "..", "jobs",
                     "curate_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)
    report = job.run(
        spark, extracted, str(tmp_path / "cur"),
        id_col="doc_id", text_col="content", exactsubstr_k=10,
    )
    assert report["input_docs"] == extracted.count() > 0
    cur = spark.read.parquet(str(tmp_path / "cur" / "curated"))
    assert "content" in cur.columns and "n_removed_tokens" in cur.columns


def test_null_text_lands_in_report_bucket(spark):
    """ADVICE r4: a NULL-text doc must land in exactly one report bucket
    (dropped_c4), not vanish from the accounting — stage flags are
    coalesced to 0, never NULL."""
    rows = [(1, _GOOD), (2, None), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(docs)
    flags = {r["doc_id"]: r for r in res.annotated.collect()}
    for d in (2, 3):
        assert flags[d]["c4_keep"] == 0
        assert flags[d]["kept"] == 0
    rep = curation_report(res.annotated)
    assert rep["input_docs"] == 3
    assert rep["dropped_c4"] == 2
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_exact_dup"] + rep["dropped_near_dup"]
        + rep["kept_docs"]
    ) == rep["input_docs"]


def test_decontam_stage(spark):
    """benchmark= inserts test-set decontamination: a doc sharing an
    8-gram of CLEANED text with the eval set dies with
    decontam_keep=0, lands in dropped_decontam, and the report still
    partitions the input."""
    leak = ("the secret holdout answer is forty two exactly and "
            "nothing else matters here tonight.")
    rows = [
        (1, _GOOD),
        # passes c4+gopher, then contains the benchmark sentence
        (2, _GOOD.replace(_LINE, _LINE + " " + leak, 1)),
        # fails c4 first (lorem) AND contains the leak → must be
        # counted in dropped_c4, not dropped_decontam (conditioning)
        (3, "lorem ipsum dolor sit amet. " + leak),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, leak)], "doc_id long, text string"
    )
    res = curate(docs, benchmark=bench)
    flags = {r["doc_id"]: r for r in res.annotated.collect()}
    assert flags[1]["decontam_keep"] == 1 and flags[1]["kept"] == 1
    assert flags[2]["decontam_keep"] == 0 and flags[2]["kept"] == 0
    assert flags[3]["c4_keep"] == 0
    rep = curation_report(res.annotated)
    assert rep["dropped_decontam"] == 1
    assert rep["dropped_c4"] == 1
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_classifier"] + rep["dropped_decontam"]
        + rep["dropped_exact_dup"] + rep["dropped_near_dup"]
        + rep["kept_docs"]
    ) == rep["input_docs"] == 3
    # stage off → flag constant 1, bucket zero
    rep_off = curation_report(curate(docs).annotated)
    assert rep_off["dropped_decontam"] == 0


def test_lm_perplexity_stage(spark):
    """lm_ppl_max= inserts the CCNet stage: against a reference-trained
    bigram LM, an out-of-domain doc (all bigrams unseen) dies with
    lm_keep=0 in dropped_lm; an in-domain doc survives; a doc that
    fails c4 first is counted there (conditioning)."""
    # gopher-passing but vocabulary disjoint from the reference corpus
    alien = "\n".join(
        ["a big shiny table sits with the warm lamp tonight."] * 6
    )
    rows = [
        (1, _GOOD),                                   # in-domain
        (2, alien),                                   # out-of-domain
        (3, "lorem ipsum dolor sit amet. " + alien),  # dies at c4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = spark.createDataFrame([(100, _GOOD)], "doc_id long, text string")

    res = curate(docs, lm_ppl_max=5.0, lm_train=ref)
    flags = {r["doc_id"]: r for r in res.annotated.collect()}
    assert flags[1]["lm_keep"] == 1 and flags[1]["kept"] == 1
    assert flags[2]["lm_keep"] == 0 and flags[2]["kept"] == 0
    assert flags[3]["c4_keep"] == 0

    rep = curation_report(res.annotated)
    assert rep["dropped_lm"] == 1
    assert rep["dropped_c4"] == 1
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_classifier"] + rep["dropped_lm"]
        + rep["dropped_decontam"] + rep["dropped_exact_dup"]
        + rep["dropped_near_dup"] + rep["kept_docs"]
    ) == rep["input_docs"] == 3

    # self-trained (no lm_train): the repeated in-domain text dominates
    # the model, so doc 1 must still outrank doc 2 under any threshold
    # between their perplexities; stage off → bucket zero
    rep_off = curation_report(curate(docs).annotated)
    assert rep_off["dropped_lm"] == 0


def test_fuzzy_decontam_stage(spark):
    """fuzzy_benchmark= inserts MinHash decontamination: a doc whose
    cleaned text fuzzily matches an eval doc dies with fuzzy_keep=0,
    lands in dropped_fuzzy_decontam, and the report still partitions
    the input. md5 hash_fn so the check is engine-shape-independent."""
    benchy = "\n".join(
        ["a calm evening ship sails with the quiet wind tonight."] * 6
    )
    rows = [
        (1, _GOOD),
        (2, benchy),                                  # fuzzy eval copy
        (3, "lorem ipsum dolor sit amet. " + benchy),  # dies at c4 first
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, benchy)], "doc_id long, text string"
    )
    res = curate(docs, fuzzy_benchmark=bench, fuzzy_hash_fn="md5")
    flags = {r["doc_id"]: r for r in res.annotated.collect()}
    assert flags[1]["fuzzy_keep"] == 1 and flags[1]["kept"] == 1
    assert flags[2]["fuzzy_keep"] == 0 and flags[2]["kept"] == 0
    assert flags[3]["c4_keep"] == 0
    rep = curation_report(res.annotated)
    assert rep["dropped_fuzzy_decontam"] == 1
    assert rep["dropped_c4"] == 1
    assert (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_classifier"] + rep["dropped_lm"]
        + rep["dropped_decontam"] + rep["dropped_fuzzy_decontam"]
        + rep["dropped_exact_dup"] + rep["dropped_near_dup"]
        + rep["kept_docs"]
    ) == rep["input_docs"] == 3
    # stage off → flag constant 1, bucket zero
    rep_off = curation_report(curate(docs).annotated)
    assert rep_off["dropped_fuzzy_decontam"] == 0


def test_semantic_stage(spark):
    # docs 1 and 7 survive the base chain; give them near-identical
    # embeddings so SemDeDup drops the larger id. Doc 11 survives the
    # chain but has NO embedding row -> unjudgeable, auto-kept.
    docs = _corpus(spark).union(
        spark.createDataFrame(
            [(11, "\n".join(
                ["green river stones hum with the cold night sky tonight."] * 6
            ))],
            "doc_id long, text string",
        )
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.01]),
            (2, [1.0, 0.0, 0.011]),   # near-dup of 1 — but doc 2 is
            (3, [1.0, 0.0, 0.012]),   # already minhash/exact-dropped,
            (7, [1.0, 0.001, 0.01]),  # so only 7 can die here
            (4, [-1.0, 0.5, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    res = curate(docs, embeddings=emb, semantic_tau=0.99,
                 semantic_k=1, semantic_iters=1)
    flags = {
        r["doc_id"]: (r["semantic_keep"], r["kept"])
        for r in res.annotated.select(
            "doc_id", "semantic_keep", "kept").collect()
    }
    assert flags[1] == (1, 1)   # lowest id in the ε-ball wins
    assert flags[7] == (0, 0)   # semantically dup of 1 → dropped HERE
    assert flags[11] == (1, 1)  # no embedding row → auto-kept
    # already-dead docs are not judged semantically (survivor-only set)
    assert flags[2][0] == 1 and flags[3][0] == 1
    rep = curation_report(res.annotated)
    assert rep["dropped_semantic"] == 1
    assert rep["kept_docs"] == 2  # docs 1 and 11
    # the stage off -> column defaults to 1 and the bucket reads 0
    rep_off = curation_report(curate(docs).annotated)
    assert rep_off["dropped_semantic"] == 0


def test_lexicon_stage(spark):
    """lexicon_words/phrases insert the C4-style lexicon screen after
    the classifier: a blocked token or phrase in otherwise-good text
    drops the doc, attributed to dropped_lexicon, and the report still
    partitions the input."""
    blocked = _GOOD.replace("sleepy", "verboten", 1)
    phrased = _GOOD.replace("sleepy", "strictly forbidden", 1)
    df = spark.createDataFrame(
        [(1, _GOOD), (2, blocked), (3, phrased)],
        "doc_id long, text string",
    )
    res = curate(
        df,
        lexicon_words=["VERBOTEN"],           # case-folded match
        lexicon_phrases=["strictly forbidden"],
    )
    rep = curation_report(res.annotated)
    assert rep["dropped_lexicon"] == 2
    assert rep["kept_docs"] == 1
    kept_ids = [r.doc_id for r in res.curated.collect()]
    assert kept_ids == [1]
    total = (
        rep["dropped_c4"] + rep["dropped_gopher"]
        + rep["dropped_classifier"] + rep["dropped_lexicon"]
        + rep["dropped_lm"] + rep["dropped_decontam"]
        + rep["dropped_fuzzy_decontam"] + rep["dropped_exact_dup"]
        + rep["dropped_near_dup"] + rep["dropped_semantic"]
        + rep["kept_docs"]
    )
    assert total == rep["input_docs"] == 3
    # stage off by default: lex_keep constant 1, bucket zero (the
    # three docs are near-dups of each other, so the minhash stage
    # may collapse them — only the lexicon attribution must be 0)
    rep_off = curation_report(curate(df).annotated)
    assert rep_off["dropped_lexicon"] == 0
    assert rep_off["kept_docs"] + rep_off["dropped_near_dup"] == 3
